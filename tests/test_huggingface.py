"""hf:// HuggingFace source: listing, split selection, and distributed
shard reads through a mock filesystem (huggingface_hub is not installed
in this container; the real path differs only in the fs constructor)."""

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mega_data_factory_spark.sources.huggingface import (
    InMemoryFs as MockHfFs,
)
from mega_data_factory_spark.sources.huggingface import (
    list_repo_data_files,
    read_huggingface,
)


def _parquet_bytes(ids):
    buf = io.BytesIO()
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()), "txt": [f"t{i}" for i in ids]}), buf)
    return buf.getvalue()


@pytest.fixture()
def mock_repo():
    base = "datasets/org/demo/data"
    return MockHfFs(
        {
            f"{base}/train-00000-of-00002.parquet": _parquet_bytes([0, 1, 2]),
            f"{base}/train-00001-of-00002.parquet": _parquet_bytes([3, 4]),
            f"{base}/test-00000-of-00001.parquet": _parquet_bytes([100]),
            f"{base}/README.md": b"not data",
        }
    )


def test_listing_filters_and_sorts(mock_repo):
    files = list_repo_data_files("org/demo", fs=mock_repo)
    assert len(files) == 3 and files == sorted(files)
    assert all(f.endswith(".parquet") for f in files)


def test_split_selection(mock_repo):
    train = list_repo_data_files("org/demo", split="train", fs=mock_repo)
    assert len(train) == 2
    test = list_repo_data_files("org/demo", split="test", fs=mock_repo)
    assert len(test) == 1
    # unknown split -> graceful full list (repos not following the convention)
    other = list_repo_data_files("org/demo", split="validation", fs=mock_repo)
    assert len(other) == 3


def test_root_fallback():
    fs = MockHfFs({"datasets/org/flat/part.parquet": _parquet_bytes([7])})
    assert list_repo_data_files("org/flat", fs=fs) == ["datasets/org/flat/part.parquet"]


def test_read_shards_distributed(spark, mock_repo):
    """Each shard is one input partition; rows stream through Arrow."""
    df = read_huggingface(spark, "org/demo", options={"split": "train", "fs": mock_repo})
    assert df.rdd.getNumPartitions() == 2  # one per shard file
    rows = sorted(r.id for r in df.collect())
    assert rows == [0, 1, 2, 3, 4]
    assert df.columns == ["id", "txt"]


def test_read_source_routes_huggingface(spark, mock_repo, tmp_path):
    from mega_data_factory_spark.config import SourceConfig
    from mega_data_factory_spark.sources import read_source

    cfg = SourceConfig(format="huggingface", path="org/demo", options={"fs": mock_repo})
    df = read_source(spark, cfg, max_samples=3)
    assert df.count() == 3
    # local snapshot dir path still short-circuits to a plain parquet scan
    local = tmp_path / "snap"
    os.makedirs(local)
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), local / "a.parquet")
    cfg2 = SourceConfig(format="huggingface", path=str(local))
    assert read_source(spark, cfg2).count() == 2


def test_missing_hub_has_clear_error():
    with pytest.raises((ImportError, FileNotFoundError)) as e:
        list_repo_data_files("org/none")  # no fs injected, hub not installed
    assert "huggingface_hub" in str(e.value) or "none" in str(e.value)


def _arrow_ipc_bytes(ids, *, stream=True):
    """Arrow IPC shard bytes — STREAM format is what HF `datasets` writes;
    the FILE format is the random-access variant."""
    table = pa.table({"id": pa.array(ids, pa.int64()), "txt": [f"t{i}" for i in ids]})
    buf = io.BytesIO()
    opener = pa.ipc.new_stream if stream else pa.ipc.new_file
    with opener(buf, table.schema) as w:
        w.write_table(table)
    return buf.getvalue()


def test_read_arrow_ipc_shards(spark):
    """.arrow shards (both IPC formats) read through the same DataSource —
    they used to reach pyarrow.parquet and die on 'Parquet magic bytes'."""
    fs = MockHfFs(
        {
            "datasets/org/ipc/data/train-00000.arrow": _arrow_ipc_bytes([1, 2, 3], stream=True),
            "datasets/org/ipc/data/train-00001.arrow": _arrow_ipc_bytes([4, 5], stream=False),
        }
    )
    df = read_huggingface(spark, "org/ipc", options={"fs": fs})
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4, 5]
    assert df.schema.simpleString() == "struct<id:bigint,txt:string>"
