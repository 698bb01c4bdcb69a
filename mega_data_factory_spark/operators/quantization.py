"""Product quantization (PQ) for embedding columns: 4*dim-byte float
vectors become ``m``-byte codes (for the test corpus's 64-dim float32,
m=8 is a 32x compression), searchable without decompression via
asymmetric-distance (ADC) lookup tables.

This is the memory half of the 100 TB ANN story the clustering module's
IVF routing leaves open: IVF prunes WHICH vectors a query scans, PQ
shrinks WHAT each scanned vector costs (8-16 bytes instead of 256), so a
shard's candidate lists stay in executor memory and the scan is table
lookups + adds, never float dot products against raw vectors. The two
compose exactly like FAISS's IVF-PQ: coarse-assign with
``KMeansIndex.assign`` (cluster id = the shuffle/bucket key), encode
once with :meth:`ProductQuantizer.encode`, then per query route to
``nprobe`` cells and :meth:`adc_topk` only the candidates.

Reference parity: the reference stores raw ``pa.list_(pa.float32())``
embeddings (operators/refiners/image_clip_embedding.py:171-179) and has
no quantized search path — this operator is part of the build brief's
similarity-search mandate (an IVF/LSH-bucketed scale path beyond the
brute-force baseline), not a port.

Spark-first shape:
  * ``fit`` trains ``m`` independent 2**nbits-centroid codebooks with a
    deterministic seeded numpy Lloyd's loop on a BOUNDED driver sample
    (the FAISS training discipline — codebooks need representative
    points, not the corpus; 256 centroids saturate well under 100k
    samples). The fitted codebooks are a (m, 256, dim/m) float array —
    a few hundred KB — broadcast to every task.
  * ``encode`` is one Arrow-batched pandas UDF: per batch, ``m`` argmin
    matmuls against the broadcast codebooks, emitting a ``binary`` code
    column. Narrow map, no shuffle; at 100 TB this runs once at ingest
    and the codes column (plus the coarse cluster id) is what gets
    stored/scanned thereafter.
  * ``adc_topk`` builds the query's (m, 256) lookup table ONCE on the
    driver, broadcasts it, and scores codes with numpy fancy-indexing
    sums per Arrow batch — then Spark's TakeOrderedAndProject finishes
    the top-k without a global sort.

Not SQL-oracle-expressible (iterative k-means training); the test suite
holds the real bar: recall@k against the exact brute-force ranking,
reconstruction-error sanity, determinism, and NULL/ragged containment
(tests/test_quantization.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans_1sub(x: np.ndarray, k: int, *, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Seeded Lloyd's on one subspace sample ``x (n, d)`` -> (k, d) centroids.

    Plain numpy (the sample is driver-local and small by contract); empty
    clusters are reseeded from the points farthest from their centroid so
    all 2**nbits codes stay usable."""
    n = len(x)
    if n >= k:
        cents = x[rng.choice(n, size=k, replace=False)].copy()
    else:
        # fewer sample points than codes: duplicate-pad; surplus codes are
        # simply never emitted by argmin (harmless, keeps shapes fixed)
        cents = x[rng.integers(0, n, size=k)].copy()
    for _ in range(iters):
        # (n, k) squared L2 via the expansion trick; argmin per row
        d2 = ((x**2).sum(1)[:, None] - 2 * x @ cents.T) + (cents**2).sum(1)[None, :]
        assign = d2.argmin(1)
        empties = []
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(0)
            else:
                empties.append(j)
        if empties and n > k:
            # reseed each empty cluster from a DISTINCT worst-fit point —
            # one shared argmax would create duplicate centroids of which
            # argmin can only ever pick one, permanently wasting codes
            worst = np.argsort(-d2.min(1))[: len(empties)]
            for j, p in zip(empties, worst):
                cents[j] = x[p]
    return cents


class ProductQuantizer:
    """Train-once / encode-anywhere PQ codec over an ``array<float>`` column.

    ``m`` subspaces x ``nbits``-bit codes; the vector dim must be divisible
    by ``m`` (pad embeddings at ingest if not — silent zero-padding here
    would corrupt the distance model for every consumer)."""

    def __init__(
        self,
        m: int = 8,
        nbits: int = 8,
        *,
        vec_col: str = "embedding",
        sample_rows: int = 100_000,
        iters: int = 15,
        seed: int = 42,
    ):
        if nbits < 1 or nbits > 8:
            # one code byte per subspace: nbits>8 would silently truncate
            # in the binary packing; FAISS's sweet spot is 8
            raise ValueError(f"nbits must be in [1, 8], got {nbits}")
        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        self.m = m
        self.nbits = nbits
        self.k = 1 << nbits
        self.vec_col = vec_col
        self.sample_rows = sample_rows
        self.iters = iters
        self.seed = seed
        self.codebooks: np.ndarray | None = None  # (m, k, sub_dim) float64
        self.dim: int | None = None
        self._bc = None  # cached codebook broadcast (one per session)

    def _codebook_bc(self, df: DataFrame):
        """Broadcast the codebooks ONCE and reuse: a fresh broadcast per
        encode() call would accumulate in driver/executor memory for the
        session lifetime under the continuous-ingestion posture (one call
        per micro-batch)."""
        sc = df.sparkSession.sparkContext
        if self._bc is None:
            self._bc = sc.broadcast(self.codebooks)
        return self._bc

    def fit(self, df: DataFrame) -> "ProductQuantizer":
        vc = self.vec_col
        base = df.select(vc).filter(F.col(vc).isNotNull())
        n = base.count()
        if n == 0:
            raise ValueError("ProductQuantizer.fit: no non-NULL vectors to train on")
        # sample_rows=None = train on everything (caller promises it fits
        # on the driver); the bound is the default, not an obligation.
        # The sample is selected by a VALUE hash threshold, not
        # df.sample(): Bernoulli sampling seeds per partition and limit()
        # takes arrival order, so the training set — and every code — would
        # depend on the input layout; the engine's determinism bar is
        # layout-independence. xxhash64 over the vector is one codegen
        # pass; the orderBy ranks only the ~1.1x-cap filtered subset.
        if self.sample_rows is not None and n > self.sample_rows:
            h = F.pmod(F.xxhash64(F.col(vc), F.lit(self.seed)), F.lit(1_000_000))
            thr = max(1, int(1_000_000 * min(1.0, 1.1 * self.sample_rows / n)))
            # tie-break on an independent hash, not the array itself:
            # comparing 64-float arrays in the sort costs more than the
            # whole filter; two DIFFERENT vectors colliding on both hashes
            # is ~n^2/2^128 — not a realistic nondeterminism source
            h2 = F.xxhash64(F.col(vc), F.lit(self.seed + 1))
            base = (
                base.withColumn("__h", h)
                .filter(F.col("__h") < thr)
                .orderBy("__h", h2)
                .limit(self.sample_rows)
                .drop("__h")
            )
        rows = [r[0] for r in base.collect()]
        # containment parity with encode(): a few ragged crawl vectors must
        # not abort training — fit on the MODAL length (deterministic given
        # the seeded sample; ties break to the larger dim) and let encode()
        # NULL out the stragglers
        lengths: dict[int, int] = {}
        for v in rows:
            lengths[len(v)] = lengths.get(len(v), 0) + 1
        modal = max(lengths, key=lambda d: (lengths[d], d))
        if len(lengths) > 1:
            import warnings

            dropped = sum(c for d, c in lengths.items() if d != modal)
            warnings.warn(
                f"ProductQuantizer.fit: {dropped} training vectors with "
                f"non-modal lengths {sorted(d for d in lengths if d != modal)} "
                f"ignored (fitting dim={modal})",
                stacklevel=2,
            )
        sample = np.array([v for v in rows if len(v) == modal], dtype=np.float64)
        self.dim = int(modal)
        if self.dim % self.m:
            raise ValueError(
                f"vector dim {self.dim} is not divisible by m={self.m}; pad "
                f"embeddings at ingest or pick m from the divisors of {self.dim}"
            )
        sub = self.dim // self.m
        rng = np.random.default_rng(self.seed)
        # a re-fit must invalidate the cached broadcast or encode() would
        # silently keep coding against the PREVIOUS model while save()
        # persists the new one
        self._bc = None
        self.codebooks = np.stack(
            [
                _kmeans_1sub(sample[:, j * sub : (j + 1) * sub], self.k, iters=self.iters, rng=rng)
                for j in range(self.m)
            ]
        )
        return self

    def _require_fit(self):
        if self.codebooks is None:
            raise ValueError("call fit() first")

    def save(self, path: str) -> None:
        """Persist the fitted codebooks (train-once / apply-later, the
        QualityClassifier posture): a single .npz with the codec params
        embedded, so a later job encodes new batches against the SAME
        distance model — re-fitting per batch would silently make codes
        from different runs incomparable."""
        self._require_fit()
        import io as _io
        import os as _os

        buf = _io.BytesIO()
        np.savez(
            buf,
            codebooks=self.codebooks,
            params=np.array([self.m, self.nbits, self.dim], dtype=np.int64),
        )
        _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(buf.getvalue())
        _os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, *, vec_col: str = "embedding") -> "ProductQuantizer":
        with open(path, "rb") as fh:
            data = np.load(fh)
            m, nbits, dim = (int(x) for x in data["params"])
            pq = cls(m=m, nbits=nbits, vec_col=vec_col)
            pq.codebooks = data["codebooks"]
            pq.dim = dim
        return pq

    def encode(self, df: DataFrame, *, code_col: str = "pq_code") -> DataFrame:
        """Adds ``code_col binary`` (m bytes/row). NULL or wrong-dim vectors
        get a NULL code (containment mirrors the dedup family: one ragged
        crawl vector must not fail the task)."""
        self._require_fit()
        from pyspark.sql.functions import pandas_udf

        m, dim, k = self.m, self.dim, self.k
        sub = dim // m
        bc = self._codebook_bc(df)

        @pandas_udf("binary")
        def pq_encode(vs: pd.Series) -> pd.Series:
            cb = bc.value  # (m, k, sub)
            vals = vs.to_numpy(dtype=object)
            good = np.array([v is not None and len(v) == dim for v in vals])
            out = np.full(len(vals), None, dtype=object)
            if good.any():
                x = np.array(list(vals[good]), dtype=np.float64)  # (g, dim)
                codes = np.empty((len(x), m), dtype=np.uint8)
                for j in range(m):
                    xj = x[:, j * sub : (j + 1) * sub]
                    cj = cb[j]
                    d2 = ((xj**2).sum(1)[:, None] - 2 * xj @ cj.T) + (cj**2).sum(1)[None, :]
                    codes[:, j] = d2.argmin(1).astype(np.uint8)
                packed = [c.tobytes() for c in codes]
                out[good] = packed
            return pd.Series(list(out))

        return df.withColumn(code_col, pq_encode(F.col(self.vec_col)))

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        """(n, m) uint8 codes -> (n, dim) reconstructed vectors (test/debug
        surface; production search never decodes — that is the point)."""
        self._require_fit()
        sub = self.dim // self.m
        out = np.empty((len(codes), self.dim), dtype=np.float64)
        for j in range(self.m):
            out[:, j * sub : (j + 1) * sub] = self.codebooks[j][codes[:, j]]
        return out

    def adc_topk(
        self,
        df: DataFrame,
        query_vec,
        *,
        k: int = 10,
        code_col: str = "pq_code",
        metric: str = "ip",
        score_col: str = "adc_score",
        round_to: int = 6,
        id_col: str | None = None,
    ) -> DataFrame:
        """Asymmetric-distance top-k over an ENCODED frame: the raw query is
        scored against code approximations via a broadcast (m, 2**nbits)
        lookup table — ``ip`` (inner product; cosine when the corpus was
        normalized before encoding) or ``l2`` (negated squared distance, so
        larger is always better and one ordering serves both metrics)."""
        self._require_fit()
        if metric not in ("ip", "l2"):
            raise ValueError(f"metric must be 'ip' or 'l2', got {metric!r}")
        from pyspark.sql.functions import pandas_udf

        q = np.asarray(query_vec, dtype=np.float64)
        if q.shape != (self.dim,):
            raise ValueError(f"query dim {q.shape} != fitted dim ({self.dim},)")
        m, sub = self.m, self.dim // self.m
        qs = q.reshape(m, sub)  # (m, sub)
        if metric == "ip":
            lut = np.einsum("ms,mks->mk", qs, self.codebooks)
        else:
            diff = qs[:, None, :] - self.codebooks  # (m, k, sub)
            lut = -((diff**2).sum(-1))
        bc = df.sparkSession.sparkContext.broadcast(lut)

        @pandas_udf("double")
        def adc(codes: pd.Series) -> pd.Series:
            t = bc.value  # (m, k)
            vals = codes.to_numpy(dtype=object)
            good = np.array([c is not None and len(c) == m for c in vals])
            # object array of None (NOT np.nan): NaN is a VALUE to Spark —
            # the isNotNull guard downstream would keep NaN rows and rank
            # them; None converts to a true SQL NULL through Arrow
            out = np.full(len(vals), None, dtype=object)
            if good.any():
                cm = np.frombuffer(b"".join(vals[good]), dtype=np.uint8).reshape(-1, m)
                out[good] = t[np.arange(m)[None, :], cm].sum(1)
            return pd.Series(list(out))

        scored = df.withColumn(score_col, F.round(adc(F.col(code_col)), round_to)).filter(
            F.col(score_col).isNotNull()
        )
        # score ties are STRUCTURAL in PQ (duplicate vectors share codes,
        # rounding collapses more) — break them on the id so top-k
        # membership is deterministic, the similarity.py convention
        tie = id_col or ("vec_id" if "vec_id" in df.columns else None)
        order = [F.col(score_col).desc()] + ([F.col(tie)] if tie else [])
        return scored.orderBy(*order).limit(k)
