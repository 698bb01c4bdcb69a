"""CLI — the reference's ``mdf`` entry point (cli.py:41-101) for this engine.

    python -m mega_data_factory_spark run -c pipeline.yaml [--cpus N]
    python -m mega_data_factory_spark validate -c pipeline.yaml [--explain]
    python -m mega_data_factory_spark list-operators
    python -m mega_data_factory_spark list-queries
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mega-data-factory-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a YAML pipeline")
    runp.add_argument("-c", "--config", required=True, help="YAML config path")
    runp.add_argument("--cpus", type=int, default=None)
    runp.add_argument(
        "--max-samples",
        type=int,
        default=None,
        help="override the config's max_samples cap (reference cli.py:181-186)",
    )
    valp = sub.add_parser(
        "validate",
        help="dry-run a YAML config: resolve operators, build the plan, run nothing",
    )
    valp.add_argument("-c", "--config", required=True, help="YAML config path")
    valp.add_argument(
        "--explain", action="store_true", help="also print the physical plan (needs a readable source)"
    )
    valp.add_argument("--cpus", type=int, default=4)
    sub.add_parser("list-operators", help="registered operator names")
    sub.add_parser("list-queries", help="oracle-checked query names")
    repp = sub.add_parser("report", help="HTML report from a metrics path")
    repp.add_argument("-m", "--metrics", required=True, help="metrics parquet base path")
    repp.add_argument("-o", "--out", required=True, help="output HTML file")
    repp.add_argument("--run-id", default=None)
    repp.add_argument("--rejected", default=None, help="rejected-sink path for debug sample tables")
    repp.add_argument("--cpus", type=int, default=4)
    args = p.parse_args(argv)

    if args.cmd == "list-operators":
        from mega_data_factory_spark.registry import OPERATORS

        print("\n".join(OPERATORS.names()))
        return 0
    if args.cmd == "list-queries":
        from mega_data_factory_spark.plans import all_oracles, all_queries

        oracles = all_oracles()
        for name in sorted(all_queries()):
            print(f"{name}\t{'oracle' if name in oracles else 'rows-only'}")
        return 0

    if args.cmd == "validate":
        # Fail-fast config review without touching data: unknown operator
        # names, bad params, and malformed resources blocks all surface at
        # Pipeline construction (eager registry resolution + profile build).
        from mega_data_factory_spark.config import PipelineConfig
        from mega_data_factory_spark.plans.pipeline import Pipeline

        cfg = PipelineConfig.from_yaml(args.config)
        pipe = Pipeline(cfg)
        out = {
            "pipeline": cfg.name,
            "source": {"format": cfg.source.format, "path": cfg.source.path, "table": cfg.source.table},
            "operators": [
                {"stage": stage, "operator": type(op).__name__} for stage, op in pipe._ops
            ],
            "stage_resources": {k: True for k in pipe.stage_profiles},
            "sink": cfg.sink.path if cfg.sink else None,
            "rejected_sink": cfg.rejected_sink.path if cfg.rejected_sink else None,
            "valid": True,
        }
        print(json.dumps(out))
        if args.explain:
            from mega_data_factory_spark.session import get_spark

            print(pipe.explain(get_spark("mdf-spark-cli", cpus=args.cpus)), file=sys.stderr)
        return 0

    if args.cmd == "report":
        from mega_data_factory_spark.metrics.report import write_report
        from mega_data_factory_spark.session import get_spark

        path = write_report(
            get_spark("mdf-spark-cli", cpus=args.cpus),
            args.metrics,
            args.out,
            args.run_id,
            rejected_path=args.rejected,
        )
        print(path)
        return 0

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline
    from mega_data_factory_spark.session import get_spark

    spark = get_spark("mdf-spark-cli", cpus=args.cpus)
    cfg = PipelineConfig.from_yaml(args.config)
    if args.max_samples is not None:
        cfg.max_samples = args.max_samples
    result = Pipeline(cfg).run(spark)
    print(
        json.dumps(
            {
                "run_id": result.run_id,
                "pipeline": result.pipeline,
                "duration_sec": round(result.duration_sec, 3),
                "input_records": result.input_records,
                "output_records": result.output_records,
                "pass_rate": round(result.pass_rate, 3),
                "operators": [
                    {
                        "stage": m.stage,
                        "operator": m.operator,
                        "input": m.input_records,
                        "output": m.output_records,
                        "pass_rate": round(m.pass_rate, 3),
                    }
                    for m in result.operators
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
