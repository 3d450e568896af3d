"""CLI: ``spark-submit --py-files docetl_spark.zip`` + this module, or
``python -m docetl_spark.plans.cli run pipeline.yaml [--intermediate-dir D]``.
The reference analogues are ``docetl run pipeline.yaml`` (docetl/cli.py:202)
and ``docetl build pipeline.yaml`` (docetl/cli.py:73) — ``build`` here is
the DETERMINISTIC rewrite pass: it expands every macro op — ``chunked_map``
(split -> gather -> [sample] -> map -> reduce), ``chunked_topk``
(split -> topk -> reduce [-> code_filter]), ``cascade_filter``
(pre-filters -> filter), ``hierarchical_reduce`` ([map ->] fine reduce ->
rollup reduce) — into its composed sequence (plans/macros.py) and writes
the optimized YAML, no LLM plan search.

A bare ``cli.py pipeline.yaml`` (no verb) still runs — the pre-r4 form.
"""

from __future__ import annotations

import argparse
import os

from docetl_spark.plans.pipeline import run_pipeline


def _build(pipeline_path: str, output_path: str | None) -> None:
    import yaml

    from docetl_spark.plans.macros import _MACRO_FNS, expand_macros

    with open(pipeline_path) as f:
        cfg = yaml.safe_load(f)
    n_rewritten = 0
    for step in cfg.get("steps", []):
        ops = step.get("operations", [])
        if any(op.get("op") in _MACRO_FNS for op in ops):
            n_rewritten += sum(1 for op in ops if op.get("op") in _MACRO_FNS)
            step["operations"] = expand_macros(ops)
    if output_path:
        out = output_path
    else:
        base, ext = os.path.splitext(pipeline_path)
        out = f"{base}_opt{ext or '.yaml'}"
    if os.path.abspath(out) == os.path.abspath(pipeline_path):
        # never clobber the source pipeline (e.g. -o pointing back at it)
        raise SystemExit(f"build: refusing to overwrite the input pipeline {pipeline_path!r}; pass -o")
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print(f"build complete: {n_rewritten} macro op(s) expanded -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser(description="docetl_spark pipeline CLI")
    ap.add_argument("verb_or_pipeline",
                    help="'run' | 'build' | a pipeline.yaml (implies run)")
    ap.add_argument("pipeline", nargs="?", default=None)
    ap.add_argument("--intermediate-dir", default=None,
                    help="step-checkpoint dir (config-prefix-hash keyed reuse)")
    ap.add_argument("--master", default=None)
    ap.add_argument("-o", "--output", default=None,
                    help="build: where to write the expanded YAML")
    args = ap.parse_args()

    if args.verb_or_pipeline == "build":
        if not args.pipeline:
            ap.error("build needs a pipeline.yaml")
        _build(args.pipeline, args.output)
        return
    pipeline = args.pipeline if args.verb_or_pipeline == "run" else args.verb_or_pipeline
    if not pipeline:
        ap.error("run needs a pipeline.yaml")

    from docetl_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="docetl_spark_pipeline")
    out = run_pipeline(spark, pipeline, intermediate_dir=args.intermediate_dir)
    n = out.count()
    print(f"pipeline complete: {n} rows, columns={out.columns}")


if __name__ == "__main__":
    main()
