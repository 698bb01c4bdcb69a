"""Distributed Bloom filter + bloom-pruned incremental dedup.

The bar: the filter NEVER false-negatives (pruning is then provably
semantics-preserving), fpp is in the configured ballpark, build is
deterministic, and the pruned store join is row-for-row identical to the
plain join on every incremental dedup path."""

import warnings

import pytest
from pyspark.sql import functions as F

from mega_data_factory_spark.operators.bloom import BloomFilter, bloom_pruned_left_join


def _keys_df(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    df = _keys_df(spark, 0, 300)
    bf = BloomFilter(fpp=0.01).fit(df, "key")
    assert bf.item_count == 300
    hits = bf.with_hit_col(df, "key").filter(F.col("__bloom_hit")).count()
    assert hits == 300  # every inserted key must probe True


def test_fpr_in_configured_ballpark(spark):
    bf = BloomFilter(fpp=0.01).fit(_keys_df(spark, 0, 500), "key")
    absent = _keys_df(spark, 10_000, 12_000)
    fp = bf.with_hit_col(absent, "key").filter(F.col("__bloom_hit")).count()
    assert fp / 2000 < 0.05  # 5x headroom over the 1% target


def test_build_is_deterministic(spark):
    df = _keys_df(spark, 0, 200).repartition(7)
    a = BloomFilter(fpp=0.01).fit(df, "key")
    b = BloomFilter(fpp=0.01).fit(df.repartition(3), "key")
    assert (a.bits == b.bits).all() and (a.num_bits, a.num_hashes) == (b.num_bits, b.num_hashes)


def test_empty_fit_and_null_keys(spark):
    empty = spark.createDataFrame([], "key string")
    bf = BloomFilter().fit(empty, "key")
    probe = spark.createDataFrame([("a",), (None,)], "key string")
    out = bf.with_hit_col(probe, "key").select("__bloom_hit").collect()
    assert [r["__bloom_hit"] for r in out] == [False, False]
    # NULL keys never enter the filter either
    bf2 = BloomFilter().fit(probe, "key")
    assert bf2.item_count == 1


def test_sizing_validation_and_clamp(spark):
    with pytest.raises(ValueError):
        BloomFilter(fpp=0.0)
    with pytest.raises(ValueError):
        BloomFilter(num_hashes=0)
    bf = BloomFilter(num_bits=100).fit(_keys_df(spark, 0, 10), "key")
    assert bf.num_bits == 128  # rounded up to a word multiple
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        clamped = BloomFilter(fpp=0.001, max_bits=256).fit(_keys_df(spark, 0, 500), "key")
    assert clamped.num_bits == 256
    assert any("clamping" in str(x.message) for x in w)


def test_refit_resizes_from_fpp_not_previous_fit(spark):
    """fit() writes the computed geometry into num_bits/num_hashes for the
    probe; a REFIT on a bigger corpus must size from the original fpp, not
    treat the previous fit as a user pin (which silently kept an
    undersized bitmap with fpp -> 1)."""
    bf = BloomFilter(fpp=0.01)
    bf.fit(_keys_df(spark, 0, 50), "key")
    small = bf.num_bits
    bf.fit(_keys_df(spark, 0, 5000), "key")
    assert bf.num_bits > small * 10  # resized for ~100x keys
    assert bf.with_hit_col(_keys_df(spark, 0, 5000), "key").filter(
        F.col("__bloom_hit")
    ).count() == 5000  # still no false negatives after refit
    # an explicit user pin IS honored across refits
    pinned = BloomFilter(num_bits=1024, num_hashes=3)
    pinned.fit(_keys_df(spark, 0, 50), "key")
    pinned.fit(_keys_df(spark, 0, 500), "key")
    assert pinned.num_bits == 1024 and pinned.num_hashes == 3


def test_pruned_join_rejects_shared_nonkey_columns(spark):
    """The miss-branch union cannot represent the plain join's duplicate
    column output — fail loud instead of nulling left data."""
    left = spark.createDataFrame([("a", 1)], "k string, rep int")
    right = spark.createDataFrame([("a", 2)], "k string, rep int")
    with pytest.raises(ValueError, match="share non-key column"):
        bloom_pruned_left_join(left, right, "k")


def test_save_load_roundtrip(spark, tmp_path):
    df = _keys_df(spark, 0, 100)
    bf = BloomFilter(fpp=0.01).fit(df, "key")
    bf.save(str(tmp_path / "bf"))
    loaded = BloomFilter.load(str(tmp_path / "bf"))
    assert (loaded.bits == bf.bits).all() and loaded.item_count == 100
    assert loaded.with_hit_col(df, "key").filter(F.col("__bloom_hit")).count() == 100


def test_pruned_left_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(str(i), i) for i in range(200)] + [(None, -1)], "k string, lv int"
    )
    right = spark.createDataFrame(
        [(str(i), f"r{i}") for i in range(0, 200, 3)], "k string, rv string"
    )
    # fpp=0.4 forces real false positives through the join branch too
    got = bloom_pruned_left_join(left, right, "k", fpp=0.4)
    want = left.join(right, on="k", how="left")
    key = lambda r: (r["lv"],)
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def _exact_case(spark, tmp_path, fpp):
    from mega_data_factory_spark.operators.dedup import IncrementalExactDeduplicator

    store = str(tmp_path / f"store_{fpp}")
    d = IncrementalExactDeduplicator(store, id_col="doc_id", bloom_fpp=fpp)
    b1 = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(40)], "doc_id long, text string"
    )
    d.update_store(b1)
    b2 = spark.createDataFrame(
        [(100 + i, f"document number {i}") for i in range(0, 40, 2)]  # seen
        + [(500 + i, f"fresh content {i}") for i in range(30)]  # new
        + [(900, "fresh content 0")],  # in-batch dup of 500
        "doc_id long, text string",
    )
    surv = sorted(r.doc_id for r in d.apply(b2).collect())
    reps = sorted(
        (r["doc_id"], r["rep"])
        for r in d.rejected(b2)
        .select("doc_id", F.col("_rejection_details.representative_id").alias("rep"))
        .collect()
    )
    return surv, reps


def test_incremental_exact_bloom_matches_plain(spark, tmp_path):
    """The bloom-pruned store path is OBSERVATIONALLY identical to the plain
    join: same survivors, same representatives — at an fpp high enough that
    both the hit and miss branches carry real traffic."""
    assert _exact_case(spark, tmp_path, 0.3) == _exact_case(spark, tmp_path, None)


def _minhash_case(spark, tmp_path, fpp):
    from mega_data_factory_spark.operators.dedup import IncrementalMinHashDeduplicator

    store = str(tmp_path / f"bands_{fpp}")
    d = IncrementalMinHashDeduplicator(
        store, id_col="doc_id", num_hashes=16, bands=8, bloom_fpp=fpp
    )
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    b1 = spark.createDataFrame(
        [(i, " ".join(words[j % len(words)] for j in range(i, i + 7))) for i in range(20)],
        "doc_id long, text string",
    )
    d.update_store(b1)
    b2 = spark.createDataFrame(
        [(100 + i, " ".join(words[j % len(words)] for j in range(i, i + 7))) for i in range(0, 20, 2)]
        + [(500 + i, f"utterly unrelated text {i} with its own private tokens {i * 7}") for i in range(10)],
        "doc_id long, text string",
    )
    return sorted(r.doc_id for r in d.apply(b2).collect())


def test_incremental_minhash_bloom_matches_plain(spark, tmp_path):
    assert _minhash_case(spark, tmp_path, 0.3) == _minhash_case(spark, tmp_path, None)


def test_bloom_via_yaml_streaming_restart(spark, tmp_path):
    """bloom_fpp flows from YAML params through the registry into the
    streaming runner: the store persists per micro-batch, a restart builds
    a FRESH filter from the grown store (no stale-filter false negatives),
    and cross-run duplicates are rejected exactly as without bloom."""
    import json

    from mega_data_factory_spark.config import PipelineConfig, SinkConfig
    from mega_data_factory_spark.streaming import StreamingPipeline

    src = tmp_path / "docs_in"
    src.mkdir(parents=True, exist_ok=True)
    with open(src / "a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "an essay that will repeat verbatim later"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": "independent first-run content"}) + "\n")
    cfg = PipelineConfig.from_dict(
        {
            "pipeline": {
                "name": "stream_bloom",
                "id_col": "doc_id",
                "source": {"table": "unused"},
                "stages": [
                    {
                        "name": "dedup",
                        "operators": [
                            {
                                "name": "IncrementalExactDeduplicator",
                                "params": {
                                    "store_path": str(tmp_path / "seen"),
                                    "id_col": "doc_id",
                                    "bloom_fpp": 0.3,
                                },
                            }
                        ],
                    }
                ],
            }
        }
    )
    cfg.sink = SinkConfig(path=str(tmp_path / "passed"))
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    StreamingPipeline(cfg, checkpoint_dir=ckpt).start(stream).awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "passed")).count() == 2

    with open(src / "b.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": "an essay that will repeat verbatim later"}) + "\n")
        f.write(json.dumps({"doc_id": 11, "text": "genuinely new second-run content"}) + "\n")
    stream2 = spark.readStream.schema("doc_id long, text string").json(str(src))
    StreamingPipeline(cfg, checkpoint_dir=ckpt).start(stream2).awaitTermination(120)
    ids = sorted(r.doc_id for r in spark.read.parquet(str(tmp_path / "passed")).collect())
    assert ids == [1, 2, 11]  # 10 rejected against the run-1 store through the bloom path


def test_bad_bloom_fpp_rejected(tmp_path):
    from mega_data_factory_spark.operators.dedup import (
        IncrementalExactDeduplicator,
        IncrementalMinHashDeduplicator,
    )

    with pytest.raises(ValueError):
        IncrementalExactDeduplicator(str(tmp_path / "s"), id_col="doc_id", bloom_fpp=1.5)
    with pytest.raises(ValueError):
        IncrementalMinHashDeduplicator(str(tmp_path / "s"), id_col="doc_id", bloom_fpp=0.0)
