"""WebDataset tar-shard connector: roundtrip fidelity, sample grouping,
corrupt-shard containment, deterministic (byte-identical) writes."""

import hashlib
import io
import os
import tarfile

import pytest


from mega_data_factory_spark.sources.webdataset import (
    parse_tar_bytes,
    read_webdataset,
    write_webdataset,
)


def _make_tar(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_parse_tar_bytes_grouping_and_types():
    """Members sharing a key form one sample; key = basename up to the
    FIRST dot (multi-dot extensions work); unknown extensions and
    extensionless members are skipped; text exts decode, others stay raw."""
    tar = _make_tar(
        [
            ("data/0001.jpg", b"\xff\xd8jpegbytes"),
            ("data/0001.txt", "a captioné".encode()),
            ("data/0001.seg.png", b"\x89PNGseg"),
            ("data/0001.ignore_me", b"zzz"),
            ("data/0002.jpg", b"img2"),
            ("README", b"not a sample"),
        ]
    )
    rows = list(parse_tar_bytes(tar, "s0.tar", ("jpg", "txt", "seg.png")))
    assert [r["__key__"] for r in rows] == ["0001", "0002"]
    a, b = rows
    assert a["jpg"] == b"\xff\xd8jpegbytes" and a["txt"] == "a captioné"
    assert a["seg_png"] == b"\x89PNGseg"
    assert b["jpg"] == b"img2" and b["txt"] is None and b["seg_png"] is None
    assert all(r["__shard__"] == "s0.tar" for r in rows)


def test_parse_tar_corrupt_shard_keeps_prefix():
    """Truncated tar: samples before the corruption survive, the task never
    raises (per-shard containment, the WARC posture)."""
    good = _make_tar([("0001.txt", b"one"), ("0002.txt", b"two")])
    # cut inside the second member's HEADER block (members are 512-byte
    # header + 512-byte payload block here, so header2 starts at 1024)
    rows = list(parse_tar_bytes(good[: 512 * 2 + 100], "bad.tar", ("txt",)))
    assert [r["__key__"] for r in rows] == ["0001"]
    assert rows[0]["txt"] == "one"
    assert list(parse_tar_bytes(b"garbage not a tar", "x.tar", ("txt",))) == []


def test_webdataset_roundtrip(spark, tmp_path):
    """write -> read roundtrip preserves every sample and byte; shard
    membership is deterministic and NULL members are skipped not crashed."""
    rows = [
        (f"{i:04d}", bytes([i % 251]) * (10 + i), f"caption {i}" if i % 7 else None)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "__key__ string, jpg binary, txt string")
    out = str(tmp_path / "shards")
    manifest = write_webdataset(df, out, num_shards=4)
    m = {r.shard: r for r in manifest.collect()}
    assert sum(r.samples for r in m.values()) == 60
    assert all(os.path.exists(r.path) and r.bytes > 0 for r in m.values())
    assert not any(p.endswith(".inprogress") for p in os.listdir(out))

    back = read_webdataset(spark, out, extensions=("jpg", "txt"))
    got = {r["__key__"]: (bytes(r.jpg), r.txt) for r in back.collect()}
    assert len(got) == 60
    for k, jpg, txt in rows:
        assert got[k] == (jpg, txt)
    # __shard__ carries provenance back to the written file
    assert back.select("__shard__").distinct().count() == 4

    # byte-identical rewrite (zeroed tar metadata + stable hash sharding)
    out2 = str(tmp_path / "shards2")
    write_webdataset(df.repartition(7), out2, num_shards=4)
    for f in sorted(os.listdir(out)):
        h1 = hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(out2, f), "rb").read()).hexdigest()
        assert h1 == h2, f"shard {f} not reproducible"


def test_webdataset_read_options(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"k{i}", f"text {i}") for i in range(10)], "__key__ string, txt string"
    )
    out = str(tmp_path / "w")
    write_webdataset(df, out, num_shards=2, prefix="part")
    assert sorted(os.listdir(out)) == ["part-00000.tar", "part-00001.tar"]
    assert read_webdataset(spark, out, extensions=("txt",), max_samples=3).count() == 3
    # a corrupt shard alongside good ones: its samples drop, the read survives
    with open(os.path.join(out, "part-00001.tar"), "r+b") as fh:
        fh.seek(0)
        fh.write(b"\x00" * 200)
    n = read_webdataset(spark, out, extensions=("txt",)).count()
    assert 0 < n < 10


def test_webdataset_null_key_dropped(spark, tmp_path):
    """A NULL sample key cannot name tar members; the row is dropped, the
    write survives (was: int(None) killed the shard task)."""
    df = spark.createDataFrame(
        [("a", "one"), (None, "ghost"), ("b", "two")], "__key__ string, txt string"
    )
    out = str(tmp_path / "nk")
    manifest = write_webdataset(df, out, num_shards=1)
    assert sum(r.samples for r in manifest.collect()) == 2
    back = read_webdataset(spark, out, extensions=("txt",))
    assert {r["__key__"] for r in back.collect()} == {"a", "b"}


def test_webdataset_write_validation(spark, tmp_path):
    df = spark.createDataFrame([("k", "v")], "__key__ string, txt string")
    with pytest.raises(ValueError, match="not in frame"):
        write_webdataset(df, str(tmp_path), columns={"missing": "txt"})
    with pytest.raises(ValueError, match="no payload"):
        write_webdataset(df.select("__key__"), str(tmp_path))


def test_webdataset_yaml_source_registered(spark, tmp_path):
    """The 'webdataset' format resolves through the source registry (YAML
    path), including the comma-separated extensions option."""
    from mega_data_factory_spark.sources import read_source
    from mega_data_factory_spark.config import SourceConfig

    df = spark.createDataFrame(
        [(f"k{i}", f"text {i}") for i in range(6)], "__key__ string, txt string"
    )
    out = str(tmp_path / "y")
    write_webdataset(df, out, num_shards=1)
    cfg = SourceConfig(format="webdataset", path=out, options={"extensions": "txt", "max_samples": "4"})
    got = read_source(spark, cfg)
    assert got.count() == 4 and set(got.columns) == {"__key__", "__shard__", "txt"}


def test_webdataset_read_requires_extensions(spark):
    with pytest.raises(ValueError, match="extension"):
        read_webdataset(spark, "/nonexistent", extensions=())


def test_parse_tar_no_phantom_sample_for_unrequested_keys():
    """A key whose members are ALL unrequested extensions (an auxiliary
    stats.json in a jpg+txt read) must not fabricate an all-NULL sample."""
    tar = _make_tar(
        [
            ("0001.jpg", b"img1"),
            ("stats.json", b"{}"),
            ("0002.jpg", b"img2"),
        ]
    )
    rows = list(parse_tar_bytes(tar, "s.tar", ("jpg", "txt")))
    assert [r["__key__"] for r in rows] == ["0001", "0002"]
    assert all(r["jpg"] is not None for r in rows)
