"""HuggingFace repo source: real ``hf://`` file listing + split selection.

Mirrors the reference HuggingFaceLoader's two layers
(loaders/huggingface_loader.py:42-74) Spark-first:

  * Layer 1 (driver): ``list_repo_data_files`` — ``HfFileSystem.ls`` over
    ``datasets/{name}/data`` (root fallback), filtered to data extensions,
    optional split selection by the HF shard naming convention
    (``{split}-00000-of-....parquet``), sorted for determinism;
  * Layer 2 (executors): a PySpark Python DataSource whose
    ``partitions()`` IS the file list (one file per input partition — the
    reference's file→worker sharding, executor.py:237-310) and whose
    ``read()`` streams Arrow record batches through fsspec, so no file is
    ever materialized on the driver.

``huggingface_hub`` is import-gated (not in this container): tests inject
a mock filesystem via the ``fs`` option hook; without either, the error
message says exactly what to install. Local snapshot directories bypass
the hub entirely (plain parquet scan — pushdown/pruning intact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DATA_EXTENSIONS = (".parquet", ".arrow", ".csv", ".jsonl")


class InMemoryFs:
    """Minimal fsspec-shaped in-memory filesystem (``ls(detail=True)`` +
    ``open('rb')``) — the DI double for HfFileSystem in tests/examples.
    Lives in the package (not the test module) because executors unpickle
    it inside DataSource partitions; plain-dict state keeps it picklable."""

    def __init__(self, tree: dict[str, bytes]):
        self.tree = tree

    def ls(self, path: str, detail: bool = True):
        entries = [{"name": p} for p in self.tree if p.startswith(path.rstrip("/") + "/")]
        if not entries:
            raise FileNotFoundError(path)
        return entries

    def open(self, path: str, mode: str = "rb"):
        import io

        return io.BytesIO(self.tree[path])

# Test/DI hook: a zero-arg callable returning an fsspec-style filesystem
# (ls(path, detail=True) + open(path, "rb")). Defaults to HfFileSystem.
_FS_FACTORY = None


def _hf_fs():
    if _FS_FACTORY is not None:
        return _FS_FACTORY()
    try:
        from huggingface_hub import HfFileSystem  # type: ignore
    except ImportError as e:  # pragma: no cover - hub not in container
        raise ImportError(
            "reading hf:// datasets requires the huggingface_hub package "
            "(pip install huggingface_hub), or pass a local snapshot directory"
        ) from e
    return HfFileSystem()


def list_repo_data_files(dataset: str, *, split: str | None = None, fs=None) -> list[str]:
    """Sorted data files of a HF dataset repo, optionally narrowed to a
    split by the ``{split}-NNNNN-of-NNNNN`` shard convention. If no file
    matches the split prefix, the full list is returned (repos that don't
    follow the convention — the reference's behavior, which ignores split
    during listing)."""
    fs = fs or _hf_fs()
    repo = f"datasets/{dataset}"
    try:
        entries = fs.ls(f"{repo}/data", detail=True)
    except Exception:
        entries = fs.ls(repo, detail=True)
    names = [e["name"] for e in entries if str(e["name"]).endswith(DATA_EXTENSIONS)]
    if split:
        matched = [n for n in names if os.path.basename(n).startswith(f"{split}-")]
        if matched:
            names = matched
    return sorted(names)


def read_huggingface(spark: SparkSession, path: str, *, options: dict | None = None) -> DataFrame:
    """``huggingface`` source entry (registry contract).

    ``path`` is either a local snapshot directory (plain parquet scan) or
    a dataset repo name (``org/name``); ``options`` may carry ``split``
    and, in tests, ``fs`` (a filesystem instance).
    """
    options = options or {}
    if os.path.isdir(path):
        return spark.read.parquet(path)
    split = options.get("split")
    fs = options.get("fs")
    files = list_repo_data_files(path, split=split, fs=fs)
    if not files:
        raise FileNotFoundError(f"no data files found in hf dataset {path!r} (split={split!r})")
    non_parquet = [f for f in files if not f.endswith((".parquet", ".arrow"))]
    if non_parquet:
        raise NotImplementedError(
            f"hf source streams parquet/arrow shards; found {non_parquet[:3]} — "
            "export the dataset to parquet or extend HfShardReader"
        )
    return _read_shards(spark, files, fs)


# ---------------------------------------------------------- Python DataSource


def _open_fs(fs):
    """Executors reconstruct the filesystem; a mock fs instance (picklable)
    is shipped as-is, otherwise each worker builds its own HfFileSystem."""
    return fs if fs is not None else _hf_fs()


def _shard_reader(handle, path: str):
    """pyarrow reader for one shard: parquet footer, or Arrow IPC for
    ``.arrow`` files (HF ``datasets`` writes the STREAM format; the
    random-access FILE format is tried first, stream as fallback). A
    ``.arrow`` shard used to fall through to ``pq.ParquetFile`` and die
    with an opaque 'Parquet magic bytes not found'."""
    if path.endswith(".arrow"):
        import pyarrow as pa

        try:
            return pa.ipc.open_file(handle)
        except pa.ArrowInvalid:
            handle.seek(0)
            return pa.ipc.open_stream(handle)
    import pyarrow.parquet as pq

    return pq.ParquetFile(handle)


def _reader_schema(reader):
    return reader.schema_arrow if hasattr(reader, "schema_arrow") else reader.schema


def _reader_batches(reader):
    """Record batches, streamed — peak memory is one batch per format."""
    if hasattr(reader, "iter_batches"):  # parquet: row-group batches
        yield from reader.iter_batches()
    elif hasattr(reader, "num_record_batches"):  # IPC file format
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:  # IPC stream format
        yield from reader


def _shard_schema(files: list[str], fs) -> "object":
    """Arrow schema from the first shard's footer (driver-side metadata
    read — bytes are not downloaded)."""
    f = _open_fs(fs).open(files[0], "rb")
    try:
        return _reader_schema(_shard_reader(f, files[0]))
    finally:
        f.close()


def _read_shards(spark: SparkSession, files: list[str], fs) -> DataFrame:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.pandas.types import from_arrow_schema

    arrow_schema = _shard_schema(files, fs)
    schema = from_arrow_schema(arrow_schema)

    class HfShardPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class HfShardReader(DataSourceReader):
        def __init__(self):
            self.files = files
            self.fs = fs

        def partitions(self):
            return [HfShardPartition(p) for p in self.files]

        def read(self, partition):
            handle = _open_fs(self.fs).open(partition.path, "rb")
            try:
                # stream batches — peak memory is one batch, not the
                # shard; at cluster scale each file is one task
                yield from _reader_batches(_shard_reader(handle, partition.path))
            finally:
                handle.close()

    class HfShardDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "hf_shards"

        def schema(self):
            return schema

        def reader(self, schema):
            return HfShardReader()

    spark.dataSource.register(HfShardDataSource)
    return spark.read.format("hf_shards").load()
