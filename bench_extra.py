"""Round-6 measurement harness (guide §1: measure first) — NOT the driver
bench. ``bench.py`` is frozen for measurement; this file exists so the
optimization round can (a) time individual queries with the noop sink at
any SF / master / repeat count without paying the replay preamble, and
(b) capture ``.explain("formatted")`` plans into ``plans/r06/``.

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 --repeats 3 [q ...]
    python bench_extra.py --explain before [q ...]   # plans/r06/<q>_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import time

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))


def _median(ts: list[float]) -> float:
    s = sorted(ts)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="SUFFIX",
                    help="capture plans/r06/<q>_<SUFFIX>.txt instead of timing")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import HEADLINE, _materialize
    from docetl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = args.master or f"local[{cpus}]"
    shuffle = args.shuffle or cpus
    spark = get_spark(master=master, shuffle_partitions=shuffle, app_name="bench_extra")
    qs = entrymod.queries()
    names = args.queries or [n for n in HEADLINE if n in qs]

    if args.explain:
        out_dir = os.path.join(BENCH_DIR, "plans", "r06")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{args.explain}.txt ({plan.count('Exchange')} Exchange refs)")
        return

    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra r{r}: {name}")
            t0 = time.time()
            _materialize(qs[name](spark, args.sf))
            samples[name].append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    meds = {n: round(_median(ts), 3) for n, ts in samples.items()}
    print(json.dumps({"sf": args.sf, "master": master, "shuffle": shuffle,
                      "medians": meds, "samples": samples,
                      "total_median_sec": round(sum(meds.values()), 2)}))


if __name__ == "__main__":
    main()
