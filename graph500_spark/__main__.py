"""CLI mirroring the reference's benchmark invocation
(/root/reference/run-benchmark.py and mpi/main.cc:211: SCALE and
edgefactor as arguments, 64-root BFS phase, TEPS statistics printed at
the end):

    python -m graph500_spark --scale 16 --edgefactor 16 --roots 64
    python -m graph500_spark --scale 16 --roots 16 --root-batch 8 \
        --results-path /tmp/g500_results

A user of the reference runs the same benchmark here with the same
knobs; --results-path enables the reference's resume semantics
(re-running skips completed roots), --root-batch trades spec-strict
per-root timing for batched multi-source traversal throughput, and
--no-validation skips the five spec checks (they run by default, as
in the reference's mode without SKIP_VALIDATION).
"""

from __future__ import annotations

import argparse
import json
import sys


def _corpus_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(
        prog="graph500_spark corpus",
        description="Staged training-corpus pipeline with resume"
        " (plans/corpus_runner.py): stats -> annotations -> clean ->"
        " dup-spans -> split -> pack, each a parquet stage; rerunning"
        " redoes only unfinished stages.",
    )
    p.add_argument("--docs", required=True,
                   help="input document parquet (doc_id, text, lang,"
                        " source, n_chars)")
    p.add_argument("--out", required=True, help="output stage directory")
    p.add_argument("--min-quality", type=float, default=None,
                   help="quality-gate threshold (default: library value)")
    p.add_argument("--pack-budget", type=int, default=512,
                   help="tokens per packed training chunk")
    args = p.parse_args(argv)

    from graph500_spark.operators.corpus import MIN_QUALITY
    from graph500_spark.plans.corpus_runner import run_corpus_pipeline
    from graph500_spark.session import get_spark

    spark = get_spark(app_name="graph500-spark-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.docs)
    result = run_corpus_pipeline(
        spark,
        docs,
        args.out,
        min_quality=(
            MIN_QUALITY if args.min_quality is None else args.min_quality
        ),
        pack_budget=args.pack_budget,
    )
    print(json.dumps({"out_dir": result.out_dir, "stages": result.stages}))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv[:1] == ["corpus"]:
        return _corpus_main(argv[1:])
    p = argparse.ArgumentParser(
        prog="graph500_spark", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("--scale", type=int, required=True,
                   help="log2 of the vertex count (Graph500 SCALE)")
    p.add_argument("--edgefactor", type=int, default=16,
                   help="edges per vertex (default 16, the spec value)")
    p.add_argument("--roots", type=int, default=64,
                   help="number of BFS roots (64 = spec, 16 = test mode)")
    p.add_argument("--root-batch", type=int, default=1,
                   help="roots per batched multi-source BFS traversal"
                        " (1 = spec-strict per-root timing)")
    p.add_argument("--no-validation", action="store_true",
                   help="skip the five spec validation checks")
    p.add_argument("--results-path", default=None,
                   help="parquet results sink enabling resume"
                        " (reruns skip completed roots)")
    args = p.parse_args(argv)

    from graph500_spark.plans.runner import benchmark_statistics, run_benchmark
    from graph500_spark.session import get_spark

    spark = get_spark(app_name=f"graph500-spark-s{args.scale}")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_benchmark(
        spark,
        scale=args.scale,
        edgefactor=args.edgefactor,
        num_roots=args.roots,
        validation=not args.no_validation,
        results_path=args.results_path,
        root_batch=args.root_batch,
    )
    order, teps = benchmark_statistics(spark, result)
    stats_row = teps.collect()[0].asDict()
    print(
        json.dumps(
            {
                "scale": args.scale,
                "edgefactor": args.edgefactor,
                "num_roots": args.roots,
                "completed_runs": len(result.runs),
                "validation": not args.no_validation,
                **{k: float(v) for k, v in stats_row.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
