"""Distributed Bloom filter: store-membership pre-filter for incremental dedup.

The incremental dedup family (`IncrementalExactDeduplicator`,
`IncrementalMinHashDeduplicator`, `IncrementalKeyDeduplicator` —
operators/dedup.py) checks every batch row against a persisted seen-keys
store with a hash join: correct, but at 100 TB the join shuffles the ENTIRE
batch on the key even though, on a steady-state crawl, the overwhelming
majority of rows are new and match nothing. A Bloom filter built from the
store keys gives each row a no-false-negative membership test BEFORE the
join: "definitely new" rows skip the store join entirely, and only the
possibly-seen sliver (true hits + the configured false-positive rate) pays
the shuffle. This is the classic bloom-pruned semi-join reduction the
reference's in-memory seen-set actors get implicitly by holding state in
RAM (framework/backend.py:21-47); here it is explicit, bounded, and
persisted-state-compatible.

Spark-first shape — BOTH sides stay JVM-side, no Python in any hot path:

* **Build** is one aggregation over the store keys: each key contributes its
  ``num_hashes`` (word index, bit mask) pairs via a codegen'd
  ``explode(array(...))``, a ``groupBy(word).agg(bit_or(mask))`` collapses
  them (compact shuffle: ~12 bytes x num_hashes per key, at most
  ``num_bits/64`` groups), and the resulting sparse words land in a driver
  numpy bitmap. Spark's own runtime-filter BloomFilterAggregate is not
  exposed to the SQL/Python surface, so the aggregation is restated with
  public primitives.
* **Probe** is pure Column arithmetic: the bitmap rides into the plan as a
  single-row broadcast (one ``array<long>`` cell, broadcast-nested-loop
  against the batch = zero shuffle), and each row tests
  ``element_at(bits, word) & mask != 0`` for its ``num_hashes`` positions —
  whole-stage-codegen'd, identical xxhash64 expressions as the build, so
  build/probe hash consistency is by construction, not by re-implementing
  the hash in two languages.

Scale bounds, stated: the bitmap costs ``num_bits/8`` bytes on the driver
and once per executor as a broadcast — 10^8 store keys at 1% fpp is
~120 MB, 10^9 is ~1.2 GB; ``max_bits`` (default 2^33 = 1 GiB) caps the
allocation and degrades fpp (with a warning) instead of OOMing the driver.
Past that, shard the store and run one filter per shard, or fall back to
the plain join (``bloom_fpp=None`` — the default — keeps the old path).

NULL keys never enter the filter (``fit`` drops them) and always probe
False ("definitely new"): a SQL left join on a NULL key matches nothing,
so pruned and unpruned paths agree on NULL by construction.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def _shiftleft(one: Column, bits: Column) -> Column:
    """Variable-distance shiftleft (the PySpark wrapper only takes a literal
    distance; the SQL function accepts a column)."""
    return F.call_function("shiftleft", one, bits.cast("int"))


class BloomFilter:
    """A fitted Bloom filter over a string key column.

    ``fit`` sizes the filter from the key count and ``fpp`` using the
    standard formulas (m = -n ln p / ln^2 2, k = m/n ln 2, k clamped to
    [1, 16]) unless ``num_bits``/``num_hashes`` are pinned. The fitted
    state is a numpy int64 bitmap + the two integers — picklable,
    persistable (``save``/``load``), and engine-independent given the same
    xxhash64 positions.
    """

    def __init__(
        self,
        *,
        fpp: float = 0.01,
        num_bits: int | None = None,
        num_hashes: int | None = None,
        max_bits: int = 1 << 33,
    ):
        if not 0.0 < fpp < 1.0:
            raise ValueError(f"fpp must be in (0, 1), got {fpp}")
        if num_bits is not None and num_bits < 1:
            raise ValueError(f"num_bits must be >= 1, got {num_bits}")
        if num_hashes is not None and not 1 <= num_hashes <= 16:
            raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")
        self.fpp = fpp
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.max_bits = max_bits
        self.bits = None  # numpy int64[num_bits // 64], set by fit/load
        self.item_count: int | None = None

    # -- sizing -----------------------------------------------------------

    @staticmethod
    def _round_words(bits: int) -> int:
        return max(64, ((bits + 63) // 64) * 64)

    def _size_for(self, n: int) -> tuple[int, int]:
        """(num_bits, num_hashes) for n items at self.fpp, honoring pins."""
        if self.num_bits is not None:
            m = self._round_words(self.num_bits)
        elif n == 0:
            m = 64
        else:
            m = self._round_words(int(math.ceil(-n * math.log(self.fpp) / (_LN2 * _LN2))))
        if m > self.max_bits:
            eff = math.exp(-(self.max_bits / max(n, 1)) * _LN2 * _LN2)
            warnings.warn(
                f"BloomFilter: sizing for n={n} at fpp={self.fpp} needs {m} bits; "
                f"clamping to max_bits={self.max_bits} (effective fpp ~{eff:.3g}). "
                "Shard the store or raise max_bits if that is too lossy."
            )
            m = self._round_words(self.max_bits)
        if self.num_hashes is not None:
            k = self.num_hashes
        else:
            k = max(1, min(16, int(round((m / max(n, 1)) * _LN2))))
        return m, k

    # -- build ------------------------------------------------------------

    def _positions(self, key: Column, m: int, k: int) -> list[tuple[Column, Column]]:
        """k (word index, bit mask) Column pairs for a key. The hash family
        is xxhash64(key, i) — the seed column makes the k hashes
        independent; pmod keeps positions non-negative."""
        out = []
        for i in range(k):
            pos = F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(m))
            word = F.shiftright(pos, 6)  # // 64 (m is a multiple of 64)
            mask = _shiftleft(F.lit(1).cast("long"), pos.bitwiseAND(F.lit(63)))
            out.append((word, mask))
        return out

    def fit(self, df: DataFrame, key: Column | str) -> "BloomFilter":
        """Build the bitmap from ``df``'s key column. Two small jobs: a
        count (sizing) and the word-level bit_or aggregation (collects at
        most num_bits/64 sparse rows). NULL keys are dropped."""
        import numpy as np

        key = F.col(key) if isinstance(key, str) else key
        keys = df.select(key.alias("__bf_key")).filter(F.col("__bf_key").isNotNull())
        n = keys.count()
        m, k = self._size_for(n)
        contribs = keys.select(
            F.explode(
                F.array(
                    *[
                        F.struct(w.alias("word"), b.alias("mask"))
                        for w, b in self._positions(F.col("__bf_key"), m, k)
                    ]
                )
            ).alias("c")
        ).select("c.word", "c.mask")
        rows = contribs.groupBy("word").agg(F.bit_or("mask").alias("mask")).collect()
        arr = np.zeros(m // 64, dtype=np.int64)
        for r in rows:
            arr[r["word"]] = r["mask"]
        self.bits = arr
        self.num_bits, self.num_hashes, self.item_count = m, k, n
        return self

    # -- probe ------------------------------------------------------------

    def _require_fitted(self) -> None:
        if self.bits is None:
            raise ValueError("BloomFilter is not fitted (call fit() or load())")

    def _bitmap_df(self, spark: SparkSession) -> DataFrame:
        self._require_fitted()
        return spark.createDataFrame([(self.bits.tolist(),)], "__bf_bits array<long>")

    def contains_expr(self, key: Column | str) -> Column:
        """Membership test against a plan-side ``__bf_bits`` array column
        (attach it with ``with_hit_col``). NULL key -> False (never in the
        filter). Pure codegen — no UDF, no shuffle."""
        self._require_fitted()
        key = F.col(key) if isinstance(key, str) else key
        test = F.lit(True)
        for word, mask in self._positions(key, self.num_bits, self.num_hashes):
            hit = F.element_at(F.col("__bf_bits"), (word + 1).cast("int")).bitwiseAND(mask) != 0
            test = test & hit
        return F.when(key.isNull(), F.lit(False)).otherwise(test)

    def with_hit_col(self, df: DataFrame, key: Column | str, out_col: str = "__bloom_hit") -> DataFrame:
        """``df`` plus a boolean membership column. The bitmap joins in as a
        broadcast single-row frame (one array cell shipped once per
        executor), tested with codegen'd bit arithmetic, then dropped."""
        bm = self._bitmap_df(df.sparkSession)
        return (
            df.crossJoin(F.broadcast(bm))
            .withColumn(out_col, self.contains_expr(key))
            .drop("__bf_bits")
        )

    # -- persistence (train-once, apply-later — the PQ/classifier posture) -

    def save(self, path: str) -> None:
        import numpy as np

        self._require_fitted()
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            bits=self.bits,
            meta=np.array([self.num_bits, self.num_hashes, self.item_count or 0], dtype=np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        import numpy as np

        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            bits, meta = z["bits"], z["meta"]
        bf = cls(num_bits=int(meta[0]), num_hashes=int(meta[1]))
        bf.bits = bits.astype(np.int64)
        bf.item_count = int(meta[2])
        return bf


def bloom_pruned_left_join(
    left: DataFrame, right: DataFrame, on: str, *, fpp: float = 0.01
) -> DataFrame:
    """``left.join(right, on=on, how="left")`` with a Bloom pre-filter built
    from ``right``'s keys: rows the filter rejects are DEFINITELY unmatched
    (no false negatives), so they bypass the join with NULL right-side
    columns; only bloom hits shuffle. Result is row-for-row equal to the
    plain left join whenever ``right`` is unique on ``on`` (the incremental
    stores are — both call sites collapse duplicates first).

    Cost model: the build scans ``right`` twice more (count + bit_or agg) —
    right is the compact key store, ~0.1-0.5% of the corpus — to remove the
    full-batch shuffle on ``left``, which dominates at scale. The pruned
    plan shuffles ``hits`` only: true duplicates plus an fpp-sized sliver.
    """
    bf = BloomFilter(fpp=fpp).fit(right, on)
    marked = bf.with_hit_col(left, on, "__bloom_hit")
    hits = marked.filter(F.col("__bloom_hit")).drop("__bloom_hit").join(right, on=on, how="left")
    null_right = {
        c: F.lit(None).cast(right.schema[c].dataType) for c in right.columns if c != on
    }
    misses = marked.filter(~F.col("__bloom_hit")).drop("__bloom_hit").withColumns(null_right)
    return hits.unionByName(misses)
