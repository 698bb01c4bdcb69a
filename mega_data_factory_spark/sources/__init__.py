"""Source factory: config -> DataFrame.

The reference's loaders (SURVEY §2.1) are file-lister + record-iterator
pairs; under Spark both collapse into ``spark.read`` with input-split
parallelism. ``max_samples`` caps input like the reference's global cap
(executor.py:253-259). The WARC source lives in sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mega_data_factory_spark.config import SourceConfig

_FORMATS = {"parquet", "json", "csv", "orc", "text"}


def _custom_source(fmt: str):
    """Resolve a registered custom loader (the reference's
    DataLoaderRegistry contract): SOURCES maps a format name to a callable
    ``(spark, path, options=...) -> DataFrame``. Built-ins register at
    import (sources.warc); user code registers its own the same way."""
    from mega_data_factory_spark.registry import SOURCES

    try:
        return SOURCES.get(fmt)
    except KeyError:
        return None


def _register_builtin_sources() -> None:
    from mega_data_factory_spark.registry import SOURCES
    from mega_data_factory_spark.sources.huggingface import read_huggingface
    from mega_data_factory_spark.sources.warc import read_warc

    def read_commoncrawl_source(spark, path, *, options=None):
        # path IS the crawl id (e.g. "CC-MAIN-2024-10"), matching the
        # reference CLI contract (commoncrawl_loader.py:17-36)
        from mega_data_factory_spark.sources.commoncrawl import read_commoncrawl

        opts = dict(options or {})
        kwargs = {}
        if opts.get("base_url"):
            kwargs["base_url"] = opts["base_url"]
        if opts.get("num_files"):
            kwargs["num_files"] = int(opts["num_files"])
        if opts.get("max_samples"):
            kwargs["max_samples"] = int(opts["max_samples"])
        if opts.get("cache_dir"):
            kwargs["cache_dir"] = opts["cache_dir"]
        return read_commoncrawl(spark, opts.get("crawl_id", path), **kwargs)

    def read_webdataset_source(spark, path, *, options=None):
        from mega_data_factory_spark.sources.webdataset import read_webdataset

        opts = dict(options or {})
        kwargs = {}
        if opts.get("extensions"):
            exts = opts["extensions"]
            kwargs["extensions"] = tuple(
                e.strip() for e in (exts.split(",") if isinstance(exts, str) else exts)
            )
        if opts.get("max_samples"):
            kwargs["max_samples"] = int(opts["max_samples"])
        return read_webdataset(spark, path, **kwargs)

    SOURCES.register(read_warc, "warc")
    SOURCES.register(read_huggingface, "huggingface")
    SOURCES.register(read_commoncrawl_source, "commoncrawl")
    SOURCES.register(read_webdataset_source, "webdataset")


_register_builtin_sources()


def read_source(
    spark: SparkSession,
    cfg: SourceConfig,
    *,
    max_samples: int | None = None,
    files: list[str] | None = None,
) -> DataFrame:
    """Build the source DataFrame. ``files`` (from the resume manifest)
    overrides the path with an explicit unprocessed-file list."""
    if cfg.table:
        df = spark.table(cfg.table)
    else:
        if cfg.path is None:
            raise ValueError("source needs a path or table")
        fmt = cfg.format.lower()
        custom = _custom_source(fmt)
        if custom is not None:
            # custom loader contract (reference DataLoaderRegistry,
            # framework/registry.py:13-133): (spark, path, options) -> DataFrame.
            # A resume manifest's pending-file list is passed THROUGH as the
            # path — silently re-globbing cfg.path would re-read (and
            # re-append) already-processed files; loaders that cannot take
            # a file list (e.g. a dataset-repo loader) raise their own
            # clear error rather than breaking exactly-once quietly.
            df = custom(spark, files if files is not None else cfg.path, options=cfg.options)
            return df.limit(max_samples) if max_samples else df
        if fmt not in _FORMATS:
            raise ValueError(f"unsupported source format {cfg.format!r}")
        reader = spark.read.format(fmt).options(**cfg.options)
        if cfg.schema:
            reader = reader.schema(cfg.schema)
        df = reader.load(files if files is not None else cfg.path)
    if max_samples:
        df = df.limit(max_samples)
    return df
