"""CLI: ``spark-submit --py-files docetl_spark.zip`` + this module, or
``python -m docetl_spark.plans.cli pipeline.yaml [--intermediate-dir D]``.
The reference analogue is ``docetl run pipeline.yaml`` (docetl/cli.py:202).
"""

from __future__ import annotations

import argparse

from docetl_spark.plans.pipeline import run_pipeline
from docetl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description="Run a docetl_spark YAML pipeline")
    ap.add_argument("pipeline")
    ap.add_argument("--intermediate-dir", default=None,
                    help="step-checkpoint dir (config-prefix-hash keyed reuse)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark(master=args.master, app_name="docetl_spark_pipeline")
    out = run_pipeline(spark, args.pipeline, intermediate_dir=args.intermediate_dir)
    n = out.count()
    print(f"pipeline complete: {n} rows, columns={out.columns}")


if __name__ == "__main__":
    main()
