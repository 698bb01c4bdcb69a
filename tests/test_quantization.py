"""ProductQuantizer: recall vs the exact ranking, reconstruction sanity,
determinism, containment. PQ training is iterative k-means — not
SQL-oracle-expressible — so this differential bar (exact brute-force
cosine as the oracle) is the correctness gate, mirroring
tests/test_clustering.py's treatment of IVF."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mega_data_factory_spark.operators.quantization import ProductQuantizer
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _exact_topk_ids(df, qv, k):
    from mega_data_factory_spark.functions.vectors import cosine_to_query_udf

    cos = cosine_to_query_udf(qv, round_to=6)
    rows = (
        df.select("vec_id", cos(F.col("embedding")).alias("c"))
        .filter(F.col("c").isNotNull())
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(k)
        .collect()
    )
    return [r.vec_id for r in rows]


def test_pq_adc_recall_vs_exact(spark, emb):
    """recall@10 of the 32x-compressed ADC ranking vs exact cosine. The
    corpus is L2-normalized before encoding so inner-product ADC
    approximates cosine (the standard IVF-PQ setup)."""
    from mega_data_factory_spark.operators.similarity import normalized

    base = normalized(emb.filter(F.col("vec_id") != 0), "embedding")
    pq = ProductQuantizer(m=8, sample_rows=20_000, seed=7).fit(base)
    encoded = base.select("vec_id", "embedding").transform(pq.encode).cache()
    qv_raw = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    qv = np.asarray(qv_raw, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)

    k = 10
    exact = _exact_topk_ids(base, list(qv), k)
    # over-fetch 3k candidates from ADC, judge recall of the exact top-k —
    # the standard PQ evaluation (ADC is a candidate generator; the final
    # re-rank against raw vectors is the caller's refinement step)
    adc = pq.adc_topk(encoded, qv, k=3 * k, metric="ip")
    got = {r.vec_id for r in adc.collect()}
    recall = len(set(exact) & got) / k
    assert recall >= 0.7, f"recall@{k} too low: {recall} (exact={exact}, adc~{sorted(got)[:15]})"
    encoded.unpersist()


def test_pq_reconstruction_beats_zero_baseline(spark, emb):
    """Reconstruction MSE of the codec must be well under the corpus
    variance (the zero-codebook baseline) — codes carry real signal."""
    base = emb.filter(F.col("embedding").isNotNull())
    pq = ProductQuantizer(m=8, seed=3).fit(base)
    x = np.array([r[0] for r in base.select("embedding").limit(200).collect()], dtype=np.float64)
    enc = base.limit(200).transform(pq.encode).select("pq_code").collect()
    codes = np.frombuffer(b"".join(r[0] for r in enc), dtype=np.uint8).reshape(-1, pq.m)
    recon = pq.decode_np(codes)
    mse = ((x - recon) ** 2).mean()
    var = ((x - x.mean(0)) ** 2).mean()
    assert mse < 0.25 * var, f"codec mse {mse} vs corpus var {var}"


def test_pq_deterministic_and_null_contained(spark):
    """Same seed -> identical codebooks and codes; NULL / ragged vectors
    get NULL codes and never reach the ADC ranking."""
    rows = [(i, [float((i * 7 + j) % 13) for j in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows + [(90, None), (91, [1.0, 2.0])], "vec_id long, embedding array<float>")
    a = ProductQuantizer(m=4, sample_rows=100, seed=11).fit(df)
    b = ProductQuantizer(m=4, sample_rows=100, seed=11).fit(df)
    assert np.array_equal(a.codebooks, b.codebooks)
    ca = {r.vec_id: r.pq_code for r in a.encode(df).collect()}
    cb = {r.vec_id: r.pq_code for r in b.encode(df).collect()}
    assert ca == cb
    assert ca[90] is None and ca[91] is None  # NULL + ragged contained
    assert all(v is not None and len(v) == 4 for i, v in ca.items() if i < 50)
    top = a.adc_topk(a.encode(df), np.zeros(16), k=60, metric="l2")
    ids = [r.vec_id for r in top.collect()]
    assert 90 not in ids and 91 not in ids and len(ids) == 50


def test_pq_validation_errors(spark):
    df = spark.createDataFrame([(1, [1.0] * 10)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="divisible"):
        ProductQuantizer(m=4).fit(df)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="nbits"):
        ProductQuantizer(m=2, nbits=9)
    with pytest.raises(ValueError, match="no non-NULL"):
        ProductQuantizer(m=2).fit(
            spark.createDataFrame([(1, None)], "vec_id long, embedding array<float>")
        )
    pq = ProductQuantizer(m=2).fit(df)
    with pytest.raises(ValueError, match="query dim"):
        pq.adc_topk(pq.encode(df), np.zeros(4))
    with pytest.raises(ValueError, match="metric"):
        pq.adc_topk(pq.encode(df), np.zeros(10), metric="cosine")


def test_ivf_pq_composition(spark, emb):
    """IVF-PQ end-to-end: coarse k-means routing (KMeansIndex) + ADC scan
    of only the probed cells — the compressed-domain scale path. The
    planted exact-duplicate of the query vector must surface."""
    from mega_data_factory_spark.operators.clustering import KMeansIndex
    from mega_data_factory_spark.operators.similarity import normalized

    base = normalized(emb.filter(F.col("embedding").isNotNull()), "embedding").cache()
    qv = np.asarray(base.filter(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64)
    corpus = base.filter(F.col("vec_id") != 0)
    idx = KMeansIndex(k=8, max_iter=10, init_mode="random", seed=5).fit(corpus)
    pq = ProductQuantizer(m=8, seed=5).fit(corpus)
    encoded = pq.encode(idx.assign(corpus)).cache()

    # route the query to its 3 nearest centroids (same rule as ivf_topk)
    cents = np.array(idx._centers(), dtype=np.float64)
    cn = np.linalg.norm(cents, axis=1)
    cn[cn == 0] = 1.0
    sims = (cents / cn[:, None]) @ (qv / np.linalg.norm(qv))
    probe = [int(c) for c in np.argsort(-sims)[:3]]

    cands = encoded.filter(F.col("cluster").isin(probe))
    top = pq.adc_topk(cands, qv, k=10, metric="ip")
    ids = [r.vec_id for r in top.collect()]
    exact = _exact_topk_ids(corpus, list(qv), 5)
    # the nearest exact neighbor (a near-duplicate by construction of the
    # testdata's planted pairs) must be in the ADC top-10
    assert exact[0] in ids
    assert len(set(ids) & set(exact)) >= 2
    encoded.unpersist()
    base.unpersist()


def test_pq_save_load_roundtrip(spark, tmp_path):
    """Persisted codebooks encode new batches against the SAME distance
    model: identical codes before/after a save/load cycle."""
    rows = [(i, [float((i * 3 + j) % 17) for j in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = ProductQuantizer(m=4, seed=2).fit(df)
    p = str(tmp_path / "pq" / "model.npz")
    a.save(p)
    b = ProductQuantizer.load(p)
    assert (b.m, b.nbits, b.dim) == (a.m, a.nbits, a.dim)
    assert np.array_equal(a.codebooks, b.codebooks)
    ca = {r.vec_id: r.pq_code for r in a.encode(df).collect()}
    cb = {r.vec_id: r.pq_code for r in b.encode(df).collect()}
    assert ca == cb
    with pytest.raises(ValueError, match="fit"):
        ProductQuantizer(m=2).save(str(tmp_path / "x.npz"))


def test_pq_fit_full_corpus_when_unbounded(spark):
    """sample_rows=None trains on the full input (no TypeError on the
    unbounded path)."""
    rows = [(i, [float((i + j) % 11) for j in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pq = ProductQuantizer(m=2, sample_rows=None, seed=1).fit(df)
    assert pq.dim == 8 and pq.codebooks.shape == (2, 256, 4)


def test_pq_fit_layout_independent(spark):
    """The bounded training sample is selected by a value-hash threshold,
    so codebooks are identical across input partition layouts (df.sample +
    limit depended on arrival order)."""
    rows = [(i, [float((i * 5 + j) % 23) for j in range(8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = ProductQuantizer(m=2, sample_rows=100, seed=9).fit(df)
    b = ProductQuantizer(m=2, sample_rows=100, seed=9).fit(df.repartition(17))
    assert np.array_equal(a.codebooks, b.codebooks)
