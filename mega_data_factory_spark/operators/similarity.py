"""Similarity search over embedding columns (array<float>).

Two strategies, per the build brief:
  * ``BruteForceKNN`` — exact cosine top-k: broadcast the query vector(s),
    score every row, TakeOrderedAndProject. The correctness baseline, and
    at 100 TB still the right plan for a *single* query vector (one narrow
    pass over the data, no shuffle; the top-k merge is per-partition then
    driver).
  * ``RandomProjectionLSH`` — sign-bucket ANN: b deterministic hyperplanes
    derived from the vector's own coordinate differences (index arithmetic,
    no RNG — reproducible everywhere including ANSI SQL); candidates are
    restricted to the query's bucket. At scale the bucket id becomes the
    shuffle/bucketing key, collapsing the candidate set by ~2^b; multi-probe
    (flipping low-margin bits) trades recall for fan-out.

IVF (k-means-partitioned) search is the third tier: cluster with
``pyspark.ml.clustering.KMeans``, route queries to the nearest centroids,
and search only those partitions — the plumbing is the same as
RandomProjectionLSH with cluster-id as the bucket key.

A vectorized Arrow/numpy path (mapInPandas over batched query sets) is the
escape hatch when the Catalyst higher-order-function math dominates; for
single-query top-k the expression form keeps everything in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mega_data_factory_spark.functions.vectors import cosine_similarity, l2_norm


class BruteForceKNN:
    """Exact top-k by cosine against a single query vector (itself a row of
    a one-row DataFrame — never collected to the driver)."""

    def __init__(self, *, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 10, round_to: int = 6):
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k
        self.round_to = round_to

    def topk(self, df: DataFrame, query: DataFrame, *, vectorized: bool = True) -> DataFrame:
        """``query`` must have one row with column ``qv array<float>``.

        Returns (id_col, cosine) of the k nearest by cosine, ties broken by
        id. Scoring is a narrow pass; ordering+limit compiles to
        TakeOrderedAndProject (per-partition top-k, no global sort).

        ``vectorized=True`` (default) scores each Arrow batch with one
        numpy matmul against the (single-row, driver-fetched) query —
        ~100x the interpreted expression form; ``False`` keeps the pure
        Catalyst higher-order-function path (bit-identical sequential
        folds) for oracle work.
        """
        if vectorized:
            from mega_data_factory_spark.functions.vectors import cosine_to_query_udf

            qv = query.first()["qv"]
            cos = cosine_to_query_udf(qv, round_to=self.round_to)
            scored = df.withColumn("cosine", cos(F.col(self.vec_col))).filter(F.col("cosine").isNotNull())
        else:
            scored = (
                df.crossJoin(F.broadcast(query))
                .withColumn("cosine", F.round(cosine_similarity(self.vec_col, "qv"), self.round_to))
                .filter(F.col("cosine").isNotNull())
            )
        return (
            scored.select(self.id_col, "cosine")
            .orderBy(F.col("cosine").desc(), F.col(self.id_col))
            .limit(self.k)
        )


def sign_bucket(vec_col: Column | str, *, bits: int = 8, stride: int = 32) -> Column:
    """Deterministic sign-LSH bucket id in [0, 2^bits): bit i is the sign of
    ``v[i+1] - v[i+1+stride]`` (1-based element_at). Coordinate-difference
    hyperplanes are data-independent, reproducible in SQL, and orthogonal-ish
    for embedding-type vectors; swap in seeded random hyperplanes via
    ``hash64_from_md5`` when coordinates are correlated."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    terms = []
    for i in range(bits):
        diff = F.element_at(v, i + 1).cast("double") - F.element_at(v, i + 1 + stride).cast("double")
        bit = F.when(diff > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        terms.append(F.shiftleft(bit, i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


class RandomProjectionLSH:
    """Sign-bucketed approximate nearest neighbors."""

    def __init__(
        self,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        bits: int = 8,
        stride: int = 32,
        k: int = 5,
        round_to: int = 6,
    ):
        self.vec_col = vec_col
        self.id_col = id_col
        self.bits = bits
        self.stride = stride
        self.k = k
        self.round_to = round_to

    def _clamped(self, df: DataFrame) -> tuple[int, int]:
        """bits/stride fitted to the ACTUAL vector dimension. sign_bucket
        reads element_at(v, bits + stride): on shorter vectors Spark 4's
        default ANSI mode throws INVALID_ARRAY_INDEX on every row, and
        non-ANSI silently zeroes the high bits — collapsing 2^bits buckets
        to a few and reinstating the near-full scan the LSH exists to
        avoid. Same guard contract as EmbeddingCosineDeduplicator's
        auto-bucket path (operators/dedup.py)."""
        dim = df.select(F.size(self.vec_col).alias("__d")).first()
        dim = dim["__d"] if dim is not None else None
        if dim is None or dim < 2:
            raise ValueError(
                f"cannot sign-bucket {dim}-dim vectors: need >= 2 dims for "
                "coordinate-difference hyperplanes"
            )
        bits = min(self.bits, dim - 1)
        stride = min(self.stride, dim - bits)
        if (bits, stride) != (self.bits, self.stride):
            import warnings

            warnings.warn(
                f"RandomProjectionLSH: clamped to bits={bits}, stride={stride} for "
                f"dim={dim} vectors (requested bits={self.bits}, stride={self.stride} "
                "would index past the array end)",
                stacklevel=3,
            )
        return bits, stride

    def with_bucket(self, df: DataFrame) -> DataFrame:
        bits, stride = self._clamped(df)
        return df.withColumn("bucket", sign_bucket(self.vec_col, bits=bits, stride=stride))

    def topk(self, df: DataFrame, query: DataFrame, *, nprobe: int = 1) -> DataFrame:
        """Top-k within the query's bucket(s). ``query``: one row, ``qv``
        array<float>. Returns (id, bucket, cosine).

        ``nprobe`` > 1 enables multi-probe: also search the ``nprobe - 1``
        buckets reachable by flipping one hyperplane bit each, lowest bit
        first (a standard recall/fan-out trade — a near neighbor that falls
        on the other side of one hyperplane is recovered without doubling
        the table's bucket count). Candidate volume grows ~linearly with
        nprobe while a full scan grows with 2^bits.
        """
        bits, stride = self._clamped(df)  # query and table MUST share the clamp
        q = query.select(
            F.col("qv"), sign_bucket("qv", bits=bits, stride=stride).alias("qbucket")
        )
        if nprobe > 1:
            flips = [F.col("qbucket")] + [
                F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(min(nprobe - 1, bits))
            ]
            q = q.withColumn("probe", F.explode(F.array(*flips)))
            match = F.col("bucket") == F.col("probe")
        else:
            match = F.col("bucket") == F.col("qbucket")
        scored = (
            df.withColumn("bucket", sign_bucket(self.vec_col, bits=bits, stride=stride))
            .crossJoin(F.broadcast(q))
            .filter(match)
            .withColumn("cosine", F.round(cosine_similarity(self.vec_col, "qv"), self.round_to))
            .filter(F.col("cosine").isNotNull())
        )
        return (
            scored.select(self.id_col, "bucket", "cosine")
            .orderBy(F.col("cosine").desc(), F.col(self.id_col))
            .limit(self.k)
        )


def normalized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors so cosine becomes a dot product — do this once
    before repeated similarity queries (column lineage reuse, the reference's
    embedding-precompute pattern). Zero-vector convention lives in ONE place:
    ``functions.vectors.l2_normalize``."""
    from mega_data_factory_spark.functions.vectors import l2_normalize

    return df.withColumn(vec_col, l2_normalize(vec_col))
