"""Sink factory: DataFrame + config -> write action.

Reference writers (SURVEY §2.2): append-only parquet with optional
hive-style partitioning (parquet_writer.py:20-162) and an Iceberg table
sink (iceberg_writer.py). Under Spark both are ``DataFrameWriter`` calls —
task-unique filenames, partitioned layout, and concurrent append come from
the writer/committer, not hand-rolled uuid filenames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mega_data_factory_spark.config import SinkConfig


def write_sink(df: DataFrame, cfg: SinkConfig) -> None:
    fmt = cfg.format.lower()
    try:
        # custom writer contract (reference DataWriterRegistry): SINKS maps
        # a format name to a callable ``(df, cfg) -> None``
        from mega_data_factory_spark.registry import SINKS

        custom = SINKS.get(fmt)
    except KeyError:
        custom = None
    if custom is not None:
        custom(df, cfg)
        return
    if fmt == "iceberg":
        # Requires an Iceberg catalog on the session (spark.sql.catalog.*) —
        # bootstrap with sinks.iceberg.iceberg_catalog_conf().
        # cfg.path is the table identifier, e.g. "local.db.events".
        catalog = cfg.path.split(".", 1)[0] if cfg.path else ""
        spark = df.sparkSession
        if not spark.conf.get(f"spark.sql.catalog.{catalog}", None):
            from mega_data_factory_spark.sinks.iceberg import find_iceberg_jar

            hint = (
                "runtime jar present — create the session with "
                "iceberg_catalog_conf() in extra_conf"
                if find_iceberg_jar()
                else "no iceberg-spark-runtime jar installed (see sinks/iceberg.py)"
            )
            raise RuntimeError(
                f"iceberg sink needs catalog '{catalog}' configured on the session; {hint}"
            )
        writer = df.writeTo(cfg.path)
        if cfg.partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in cfg.partition_by])
        if cfg.mode == "overwrite":
            writer.createOrReplace()
        elif cfg.mode == "overwrite_partitions":
            # Iceberg's native dynamic overwrite: replace exactly the
            # partitions present in this batch (replay-safe re-runs).
            # partition_by is required, as on the hive path: against an
            # unpartitioned table overwritePartitions() degenerates to a
            # silent FULL overwrite — the exact hazard this mode exists
            # to avoid. First write must create (the append precedent).
            if not cfg.partition_by:
                raise ValueError(
                    "overwrite_partitions needs partition_by — against an "
                    "unpartitioned table it degenerates to full overwrite"
                )
            from pyspark.errors import AnalysisException

            try:
                writer.overwritePartitions()
            except AnalysisException as exc:
                if "TABLE_OR_VIEW_NOT_FOUND" not in str(exc):
                    raise
                writer.create()
        else:
            # append must CREATE on first write (the reference writer's
            # create-if-missing, iceberg_writer.py:81-116) — a bare
            # append() fails with TABLE_OR_VIEW_NOT_FOUND on a fresh
            # catalog, making the default mode unusable
            from pyspark.errors import AnalysisException

            try:
                writer.append()
            except AnalysisException as exc:
                if "TABLE_OR_VIEW_NOT_FOUND" not in str(exc):
                    raise
                writer.create()
        return
    if cfg.bucket_by:
        # Bucketed/sorted layout: pre-shuffled-on-write by the join/agg key,
        # so repeated fact-fact joins (the q5 shape) and keyed aggregations
        # read co-located buckets with ZERO exchanges
        # (tests/test_storage_layout.py asserts the plan). Bucket metadata
        # lives in the catalog -> needs a table identifier; an explicit
        # bucket count is required because it must MATCH across the tables
        # that will join (a silent default would quietly break co-location).
        if not cfg.table:
            raise ValueError(
                "bucketed sink needs `table` (bucket metadata lives in the "
                "catalog; use `path` only to pin the external location)"
            )
        if not cfg.buckets:
            raise ValueError(
                "bucketed sink needs an explicit `buckets` count — it must "
                "match across tables that join on the bucket key"
            )
        writer = df.write.format(fmt).mode(cfg.mode).options(**cfg.options)
        if cfg.path:
            writer = writer.option("path", cfg.path)
        if cfg.partition_by:
            writer = writer.partitionBy(*cfg.partition_by)
        writer = writer.bucketBy(cfg.buckets, *cfg.bucket_by)
        if cfg.sort_by:
            writer = writer.sortBy(*cfg.sort_by)
        writer.saveAsTable(cfg.table)
        return
    if cfg.path is None:
        raise ValueError("sink needs a path")
    if cfg.mode == "overwrite_partitions":
        # Dynamic partition overwrite: replace ONLY the hive partitions
        # present in this batch, leave every other partition untouched —
        # the exactly-once lever for replayed/re-run batches the resume
        # docs point at ("pair with dedup or partition-overwrite"): key the
        # partition on the batch/run id (or ingest date) and a re-run
        # REPLACES its own output instead of double-appending. Static
        # overwrite (plain mode=overwrite) would wipe the whole directory.
        if not cfg.partition_by:
            raise ValueError(
                "overwrite_partitions needs partition_by — it replaces "
                "exactly the partitions present in the batch; without a "
                "partition key it degenerates to full overwrite"
            )
        spark = df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, "static")
        spark.conf.set(key, "dynamic")
        try:
            (
                df.write.format(fmt)
                .mode("overwrite")
                .options(**cfg.options)
                .partitionBy(*cfg.partition_by)
                .save(cfg.path)
            )
        finally:
            spark.conf.set(key, prev)
        return
    writer = df.write.format(fmt).mode(cfg.mode).options(**cfg.options)
    if cfg.partition_by:
        writer = writer.partitionBy(*cfg.partition_by)
    writer.save(cfg.path)
