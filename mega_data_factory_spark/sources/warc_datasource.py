"""WARC as a PySpark 4 Python DataSource — the modern loader surface
SURVEY §2.1 maps the reference's ``DataLoader`` ABC onto (file-list +
per-shard iterator, framework/base.py:12-33, loaders/commoncrawl_loader.py).

Where sources/warc.py composes ``binaryFile`` + ``mapInPandas``, this
variant implements the contract natively:

  * ``partitions()`` = the file list, one ``InputPartition`` per WARC file
    — exactly the reference's file→worker sharding (executor.py:237-310),
    except Spark schedules the partitions;
  * ``read(partition)`` = the per-shard record iterator (streamed, the
    whole file is parsed lazily on the executor);
  * registration by a short name, so YAML configs / ``spark.read.format``
    address it like any built-in.

Usage::

    from mega_data_factory_spark.sources.warc_datasource import register
    register(spark)
    df = spark.read.format("warc").option("path", "/crawl").load()
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from mega_data_factory_spark.sources.warc import WARC_SCHEMA, parse_warc_stream


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        self.crawl_id = options.get("crawl_id", "")
        if not self.path:
            raise ValueError("warc datasource needs option('path', ...)")

    def partitions(self):
        # deterministic sorted file list (reference huggingface_loader.py:71)
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            files = sorted(
                p
                for ext in ("*.warc", "*.warc.gz")
                for p in glob.glob(os.path.join(self.path, "**", ext), recursive=True)
            )
        return [WarcFilePartition(p) for p in files]

    def read(self, partition: WarcFilePartition | None):
        # PySpark substitutes [None] for an EMPTY partitions() list
        # (plan_data_source_read.py) — a dir with no WARC files must yield
        # an empty DataFrame, not dereference None.path
        if partition is None:
            return
        import gzip

        opener = gzip.open if partition.path.endswith(".gz") else open
        try:
            # stream, don't slurp: gzip.GzipFile inflates lazily, so peak
            # memory is a read window instead of raw+inflated whole-file
            # copies of a multi-GB WARC
            with opener(partition.path, "rb") as f:
                for rec in parse_warc_stream(f, partition.path, self.crawl_id):
                    yield tuple(rec[c] for c in (
                        "crawl_id", "warc_path", "url", "warc_date", "title", "text", "text_length",
                    ))
        except (OSError, EOFError):
            # truncated gz tail mid-stream: keep the records already
            # yielded, skip the rest (the parse_warc_bytes containment
            # contract, applied streaming)
            return


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return WarcDataSourceReader(schema, self.options)


def register(spark) -> None:
    """Register the 'warc' format on this session (idempotent)."""
    spark.dataSource.register(WarcDataSource)
