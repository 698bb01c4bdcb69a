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
    wdsp = sub.add_parser(
        "export-wds", help="export a parquet table to WebDataset tar shards"
    )
    wdsp.add_argument("-i", "--input", required=True, help="input parquet path")
    wdsp.add_argument("-o", "--out", required=True, help="output shard directory")
    wdsp.add_argument("--key-col", default="doc_id", help="sample key column")
    wdsp.add_argument(
        "--columns",
        default=None,
        help="col=ext[,col=ext...] payload mapping (default: every other column under its own name)",
    )
    wdsp.add_argument("--shards", type=int, default=64)
    wdsp.add_argument("--prefix", default="shard")
    wdsp.add_argument("--cpus", type=int, default=None)
    compp = sub.add_parser(
        "compact-store", help="compact an incremental-dedup key store (offline maintenance)"
    )
    compp.add_argument("-s", "--store", required=True, help="store parquet directory")
    compp.add_argument("--target-files", type=int, default=None)
    compp.add_argument("--cpus", type=int, default=4)
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

    if args.cmd == "export-wds":
        from mega_data_factory_spark.session import get_spark
        from mega_data_factory_spark.sources.webdataset import write_webdataset

        spark = get_spark("mdf-spark-cli", cpus=args.cpus)
        df = spark.read.parquet(args.input)
        cols = None
        if args.columns:
            cols = dict(pair.split("=", 1) for pair in args.columns.split(","))
        manifest = write_webdataset(
            df,
            args.out,
            key_col=args.key_col,
            columns=cols,
            num_shards=args.shards,
            prefix=args.prefix,
        ).collect()
        print(
            json.dumps(
                {
                    "shards": len(manifest),
                    "samples": sum(r.samples for r in manifest),
                    "bytes": sum(r.bytes for r in manifest),
                    "out": args.out,
                }
            )
        )
        return 0

    if args.cmd == "compact-store":
        from mega_data_factory_spark.operators.dedup import compact_store
        from mega_data_factory_spark.session import get_spark

        stats = compact_store(
            get_spark("mdf-spark-cli", cpus=args.cpus), args.store, target_files=args.target_files
        )
        print(json.dumps(stats))
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
