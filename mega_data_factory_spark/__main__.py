"""CLI — the reference's ``mdf`` entry point (cli.py:41-101) for this engine.

    python -m mega_data_factory_spark run -c pipeline.yaml [--cpus N]
    python -m mega_data_factory_spark validate -c pipeline.yaml [--explain]
    python -m mega_data_factory_spark list-operators
    python -m mega_data_factory_spark list-queries
    python -m mega_data_factory_spark fit-bpe -i corpus.parquet -o bpe.json
    python -m mega_data_factory_spark export-tokens -i corpus.parquet -m bpe.json -o shards/
    python -m mega_data_factory_spark export-wds -i table.parquet -o shards/
    python -m mega_data_factory_spark profile-diff -a before.parquet -b after.parquet
    python -m mega_data_factory_spark compact-store -s store/
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
    valp.add_argument(
        "--lint",
        action="store_true",
        help="grade the physical plan (plans/lint.py): exit 1 on row-at-a-time "
        "Python UDFs or cartesian products; report shuffle/Arrow/scan-pushdown counts",
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
    fitp = sub.add_parser(
        "fit-bpe", help="train a BPE tokenizer model from a parquet corpus"
    )
    fitp.add_argument("-i", "--input", required=True, help="input parquet path")
    fitp.add_argument("-o", "--out", required=True, help="model JSON output path")
    fitp.add_argument("--vocab-size", type=int, default=8000)
    fitp.add_argument("--text-col", default="text")
    fitp.add_argument("--max-distinct-words", type=int, default=200_000)
    fitp.add_argument("--cpus", type=int, default=None)
    tokp = sub.add_parser(
        "export-tokens",
        help="encode a corpus with a fitted BPE model and write exact-seq_len "
        "training shards (pack_bucket, seq_id, tokens) as parquet",
    )
    tokp.add_argument("-i", "--input", required=True, help="input parquet path")
    tokp.add_argument("-m", "--model", required=True, help="fitted BPE model JSON (fit-bpe)")
    tokp.add_argument("-o", "--out", required=True, help="output parquet directory")
    tokp.add_argument("--seq-len", type=int, default=2048)
    tokp.add_argument("--buckets", type=int, default=64)
    tokp.add_argument(
        "--eos-id",
        type=int,
        default=None,
        help="append this end-of-document token id to every doc before packing",
    )
    tokp.add_argument("--id-col", default="doc_id")
    tokp.add_argument("--text-col", default="text")
    tokp.add_argument(
        "--spans",
        type=int,
        default=None,
        metavar="SENTINEL_START",
        help="also emit T5 span-corruption input_ids/target_ids per sequence, "
        "sentinels descending from this id (pick >= vocab size + span budget)",
    )
    # default=None so "was the flag passed?" is observable: the
    # require---spans guard must reject ANY explicit flag without --spans,
    # including one that restates the default (a value-comparison guard
    # silently accepted `--noise-density 0.15`). Effective defaults
    # (0.15 / 3.0) are resolved after the check.
    tokp.add_argument("--noise-density", type=float, default=None, help="T5 corruption density (default 0.15; requires --spans)")
    tokp.add_argument("--mean-span", type=float, default=None, help="T5 mean noise-span length (default 3.0; requires --spans)")
    tokp.add_argument("--cpus", type=int, default=None)
    pdp = sub.add_parser(
        "profile-diff",
        help="profile two parquet tables (before/after curation) and print "
        "the per-stat drift report",
    )
    pdp.add_argument("-a", "--before", required=True, help="before parquet path")
    pdp.add_argument("-b", "--after", required=True, help="after parquet path")
    pdp.add_argument("-o", "--out", default=None, help="optional parquet output for the report")
    pdp.add_argument("--exact", action="store_true", help="exact distinct/percentiles (test scale)")
    pdp.add_argument(
        "--sample-bytes",
        type=int,
        default=None,
        help="profile a deterministic fixed-byte FILE sample of each side "
        "(flat cost at any corpus size) instead of the full tables",
    )
    pdp.add_argument("--cpus", type=int, default=None)
    compp = sub.add_parser(
        "compact-store", help="compact an incremental-dedup key store (offline maintenance)"
    )
    compp.add_argument("-s", "--store", required=True, help="store parquet directory")
    compp.add_argument("--target-files", type=int, default=None)
    compp.add_argument(
        "--metrics", default=None, help="metrics base path: also append a 'compaction' row to <metrics>/stores"
    )
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
        if args.explain or args.lint:
            from mega_data_factory_spark.session import get_spark

            plan = pipe.explain(get_spark("mdf-spark-cli", cpus=args.cpus))
            if args.explain:
                print(plan, file=sys.stderr)
            if args.lint:
                from mega_data_factory_spark.plans.lint import lint_plan

                out["lint"] = lint_plan(plan)
                print(json.dumps(out))
                return 0 if out["lint"]["ok"] else 1
        print(json.dumps(out))
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

    if args.cmd == "fit-bpe":
        from mega_data_factory_spark.operators.bpe import BpeTokenizer
        from mega_data_factory_spark.session import get_spark

        spark = get_spark("mdf-spark-cli", cpus=args.cpus)
        tok = BpeTokenizer(
            args.vocab_size,
            text_col=args.text_col,
            max_distinct_words=args.max_distinct_words,
        ).fit(spark.read.parquet(args.input))
        tok.save(args.out)
        print(
            json.dumps(
                {"model": args.out, "merges": len(tok.merges), "vocab": len(tok.vocab())}
            )
        )
        return 0

    if args.cmd == "export-tokens":
        from pyspark.sql import functions as F

        from mega_data_factory_spark.operators.bpe import BpeTokenizer
        from mega_data_factory_spark.operators.packing import SequencePacker
        from mega_data_factory_spark.session import get_spark

        spark = get_spark("mdf-spark-cli", cpus=args.cpus)
        tok = BpeTokenizer.load(args.model, text_col=args.text_col)
        packer = SequencePacker(args.seq_len, buckets=args.buckets, id_col=args.id_col)
        shards = packer.packed_token_ids(
            tok.encode_ids(spark.read.parquet(args.input)), eos_id=args.eos_id
        )
        if args.spans is not None:
            from mega_data_factory_spark.operators.packing import SpanCorruptionBuilder

            # presence-checked flags resolve to their effective defaults
            # only once --spans is confirmed
            if args.noise_density is None:
                args.noise_density = 0.15
            if args.mean_span is None:
                args.mean_span = 3.0
            # validate BEFORE the headroom arithmetic: --mean-span 0 would
            # hit the division below as a raw ZeroDivisionError instead of
            # the builder's clean message
            if args.mean_span < 1:
                p.error(f"--mean-span must be >= 1, got {args.mean_span}")
            if not 0.0 < args.noise_density < 1.0:
                p.error(f"--noise-density must be in (0, 1), got {args.noise_density}")
            # sentinels DESCEND from --spans: the deepest one a full
            # seq_len sequence can emit is spans - (num_spans + 1), so the
            # guard needs the whole span budget clear of the vocab, not
            # just the first id
            need = max(1, round(round(args.seq_len * args.noise_density) / args.mean_span)) + 1
            # the eos delimiter is a token id present in every sequence —
            # sentinels must clear it too, not just the vocab
            id_ceiling = max(len(tok.vocab()), (args.eos_id + 1) if args.eos_id is not None else 0)
            if args.spans - need <= id_ceiling:
                p.error(
                    f"--spans {args.spans} leaves sentinel ids colliding with the "
                    f"shard's token ids (vocab {len(tok.vocab())}"
                    + (f", eos {args.eos_id}" if args.eos_id is not None else "")
                    + f"; up to ~{need} sentinels per {args.seq_len}-token sequence); "
                    f"use --spans >= {id_ceiling + need + 1}"
                )
            shards = SpanCorruptionBuilder(
                sentinel_start=args.spans,
                noise_density=args.noise_density,
                mean_span=args.mean_span,
            ).apply(shards)
        elif args.noise_density is not None or args.mean_span is not None:
            p.error("--noise-density/--mean-span require --spans")
        # one file per pack bucket, sequences in order inside it — the
        # layout a trainer streams shard-by-shard
        (
            shards.repartition(args.buckets, "pack_bucket")
            .sortWithinPartitions("pack_bucket", "seq_id")
            .write.mode("overwrite")
            .parquet(args.out)
        )
        agg = spark.read.parquet(args.out).agg(
            F.count(F.lit(1)).alias("sequences"), F.sum("n_tokens").alias("tokens")
        ).first()
        print(
            json.dumps(
                {
                    "sequences": int(agg["sequences"]),
                    "tokens": int(agg["tokens"] or 0),
                    "seq_len": args.seq_len,
                    "out": args.out,
                }
            )
        )
        return 0

    if args.cmd == "profile-diff":
        from mega_data_factory_spark.operators.profiling import ColumnProfiler, sample_parquet_files
        from mega_data_factory_spark.session import get_spark

        spark = get_spark("mdf-spark-cli", cpus=args.cpus)
        prof = ColumnProfiler(approx=not args.exact)
        if args.sample_bytes:
            # flat-cost drift report at corpus scale: both sides profiled
            # over a deterministic fixed-byte FILE sample (the
            # column_profile_sketch posture) — sampled stats drift a
            # little; the DELTAS between two uniform samples are the
            # signal. small_table_factor=0 disables the small-table
            # auto-route here: a diff needs BOTH sides under the same
            # estimator — one side routed to a full read against one
            # sampled would surface sampling drift as a false delta.
            read = lambda p: sample_parquet_files(  # noqa: E731
                spark, p, byte_budget=args.sample_bytes, small_table_factor=0
            )
        else:
            read = lambda p: spark.read.parquet(p)  # noqa: E731
        report = ColumnProfiler.diff(
            prof.profile(read(args.before)),
            prof.profile(read(args.after)),
        ).orderBy("column", "stat")
        if args.out:
            report.write.mode("overwrite").parquet(args.out)
        for r in report.collect():  # driver-small: stats x columns rows
            print(
                json.dumps(
                    {k: r[k] for k in ("column", "stat", "before", "after", "delta", "rel_change")
                     if r[k] is not None or k in ("column", "stat")}
                )
            )
        return 0

    if args.cmd == "compact-store":
        import uuid

        from mega_data_factory_spark.operators.dedup import compact_store
        from mega_data_factory_spark.session import get_spark

        spark = get_spark("mdf-spark-cli", cpus=args.cpus)
        stats = compact_store(spark, args.store, target_files=args.target_files)
        if args.metrics:
            # compactions land in the same stores metrics table the
            # pipeline's post_update rows append to — one place to watch
            # store growth AND its resets
            from mega_data_factory_spark.metrics import write_store_metrics

            write_store_metrics(
                spark,
                args.metrics,
                run_id=uuid.uuid4().hex[:12],
                pipeline="compact-store",
                operator_name="compact_store",
                store_path=args.store,
                event="compaction",
                rows_before=stats["rows_before"],
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
