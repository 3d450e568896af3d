"""North-rule deployment mode as a test: the engine zipped and driven via
``spark-submit --py-files`` in a fresh JVM (the exact shape a cluster
runs), exercising CDC resume/fence + sha256 state parity end to end.
Mirrors .claude/skills/verify flows 1-3 so the deployment contract is
part of the suite, not only the manual verify recipe."""

import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import tempfile, os
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .appName("e2e").getOrCreate())

from docetl_spark.cdc import create_cdc_table, replay_events, read_state
from docetl_spark.cdc.merge import merge_apply
from docetl_spark.lake.table import LakeTable
from docetl_spark.sources.testgen import gen_change_events, final_state_oracle

wh = tempfile.mkdtemp(prefix="e2e_lake_")
ev = gen_change_events(spark, n_events=6000, n_keys=900, batch_size=2000, seed=5)
ev = ev.localCheckpoint(eager=True)
tbl = create_cdc_table(os.path.join(wh, "t"), key_cols=("repo", "path", "commit"), num_buckets=4)
replay_events(spark, tbl, ev.filter(F.col("batch_id") < 1))
m2 = replay_events(spark, tbl, ev, coalesce_batches=2)  # resume, coalesced
assert sorted(m.batch_id for m in m2) == [2], [m.batch_id for m in m2]

h = lambda df: sorted(tuple(r) for r in df.select(
    "repo", "path", "commit",
    F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)).collect())
assert h(read_state(spark, tbl)) == h(final_state_oracle(ev)), "state mismatch"

tbl2 = LakeTable(os.path.join(wh, "t"))  # reopen = fresh process analogue
assert merge_apply(spark, tbl2, ev.filter(F.col("batch_id") == 0), 0).skipped
print("E2E_VERDICT: OK")
"""


def test_spark_submit_py_files_e2e(tmp_path):
    zip_path = str(tmp_path / "docetl_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "docetl_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER)
    res = subprocess.run(
        ["spark-submit", "--py-files", zip_path, driver],
        capture_output=True, text=True, cwd=str(tmp_path),
        timeout=600,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert "E2E_VERDICT: OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
