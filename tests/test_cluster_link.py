"""cluster + link_resolve operator tests (reference: cluster.py, link_resolve.py).

Deterministic embeddings / similarities so asserts are exact, mirroring
the reference's shape/cardinality assertions in
tests/basic/test_cluster_and_sample.py recast with golden values.
"""

import json

import numpy as np
from pyspark.sql import functions as F

from docetl_spark.operators import cluster, cluster_blocked, link_resolve
from docetl_spark.operators.cluster_ops import ward_tree


def test_ward_tree_merges_tight_pairs_first():
    x = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 0.0], [10.1, 0.0]])
    children, dists = ward_tree(x)
    # first two merges join the two tight pairs (distance 0.1 each),
    # the final merge joins the pair-clusters at a much larger distance
    assert sorted(map(tuple, children[:2].tolist())) == [(0, 1), (2, 3)]
    assert np.allclose(sorted(dists[:2]), [0.1, 0.1])
    assert dists[2] > 5.0
    # last merge combines the two internal nodes (ids n..2n-2 = 4,5)
    assert sorted(children[2].tolist()) == [4, 5]


def test_cluster_annotates_leaves_with_ancestor_paths(spark):
    rows = [
        ("a1", [0.0, 0.0]), ("a2", [0.1, 0.0]),
        ("b1", [10.0, 0.0]), ("b2", [10.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "name string, emb array<double>")
    out = cluster(df, "emb").collect()
    by_name = {r["name"]: r["clusters"] for r in out}
    # every leaf: nearest ancestor (its tight pair, size 2) first, root (size 4) last
    for name, path in by_name.items():
        sizes = [json.loads(p)["size"] for p in path]
        assert sizes == [2, 4]
    # pair members share their nearest ancestor; cross-pair rows don't
    assert by_name["a1"][0] == by_name["a2"][0]
    assert by_name["b1"][0] == by_name["b2"][0]
    assert by_name["a1"][0] != by_name["b1"][0]
    assert by_name["a1"][1] == by_name["b1"][1]  # shared root


def test_cluster_collapse_flattens_tight_subtrees(spark):
    # offsets are powers of two so both groups are float-exact mirror
    # images and the distance-gap quantile is symmetric
    rows = [
        ("a1", [0.0, 0.0]), ("a2", [0.125, 0.0]), ("a3", [0.25, 0.0]),
        ("b1", [1024.0, 0.0]), ("b2", [1024.125, 0.0]), ("b3", [1024.25, 0.0]),
    ]
    df = spark.createDataFrame(rows, "name string, emb array<double>")
    full_depths = {r["name"]: len(r["clusters"]) for r in cluster(df, "emb").collect()}
    out = cluster(df, "emb", collapse=0.9).collect()
    depths = {r["name"]: len(r["clusters"]) for r in out}
    # collapse flattens: strictly shallower somewhere, never deeper, and
    # every leaf still reaches the size-6 root
    assert all(depths[n] <= full_depths[n] for n in depths)
    assert min(depths.values()) < max(full_depths.values())
    for r in out:
        assert json.loads(r["clusters"][-1])["size"] == 6


def test_cluster_single_row_gets_empty_path(spark):
    df = spark.createDataFrame([("only", [1.0, 2.0])], "name string, emb array<double>")
    out = cluster(df, "emb").collect()
    assert out[0]["clusters"] == []


def test_cluster_blocked_runs_per_group(spark):
    rows = []
    for g in ("g1", "g2"):
        base = 0.0 if g == "g1" else 100.0
        rows += [(g, f"{g}-{i}", [base + i * 0.1, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, name string, emb array<double>")
    out = cluster_blocked(df, ["grp"], "emb").collect()
    assert len(out) == 8
    for r in out:
        sizes = [json.loads(p)["size"] for p in r["clusters"]]
        assert sizes[-1] == 4  # each block's root covers only its block


def test_link_resolve_repairs_dangling_links(spark):
    df = spark.createDataFrame(
        [
            ("apache spark", ["delta lake", "apache flink"]),
            ("apache flink", ["apache spark engine"]),  # dangling, fuzzy
            ("delta lake", []),
        ],
        "title string, related_to array<string>",
    )
    out = {r["title"]: r["related_to"] for r in link_resolve(
        df, id_key="title", link_key="related_to", blocking_threshold=0.5
    ).collect()}
    # exact matches untouched
    assert out["apache spark"] == ["delta lake", "apache flink"]
    # 'apache spark engine' (jaccard 2/3 vs 'apache spark') repaired
    assert out["apache flink"] == ["apache spark"]
    # empty arrays pass through
    assert out["delta lake"] == []


def test_link_resolve_below_threshold_keeps_value(spark):
    df = spark.createDataFrame(
        [("alpha", ["totally unrelated thing"]), ("beta", ["alpha"])],
        "title string, related_to array<string>",
    )
    out = {r["title"]: r["related_to"] for r in link_resolve(
        df, id_key="title", link_key="related_to", blocking_threshold=0.5
    ).collect()}
    assert out["alpha"] == ["totally unrelated thing"]
    assert out["beta"] == ["alpha"]


def test_link_resolve_preserves_array_order(spark):
    df = spark.createDataFrame(
        [
            ("n1", ["n3 node", "n2", "n3"]),
            ("n2", []),
            ("n3", []),
        ],
        "title string, related_to array<string>",
    )
    out = {r["title"]: r["related_to"] for r in link_resolve(
        df, id_key="title", link_key="related_to", blocking_threshold=0.4
    ).collect()}
    assert out["n1"] == ["n3", "n2", "n3"]
