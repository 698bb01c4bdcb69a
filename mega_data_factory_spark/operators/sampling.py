"""Deterministic sampling / dataset-split operators.

Training-data pipelines need REPRODUCIBLE selection: the same document must
land in the same split (or survive the same mixing ratio) on every run, on
any cluster, regardless of partitioning — which rules out ``df.sample()``
/ ``rand()`` (partition- and seed-layout-dependent). The standard trick is
a stable content/id hash compared against the ratio: pure Column
arithmetic, zero shuffle, and — because the hash here is the engine's
md5-derived 60-bit integer (``functions/hashing.hash64_from_md5``) — the
selection is reproducible in ANSI SQL, so both operators are
oracle-differential-tested (tests/test_curation.py).

Beyond the reference's surface — first-class per the build brief's
training-data-pipeline mandate. At 100 TB both operators are narrow maps
that fuse into the scan stage under whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mega_data_factory_spark.functions.hashing import hash64_from_md5
from mega_data_factory_spark.operators.base import Filter, Refiner

BUCKETS = 10_000


def stable_bucket(col: Column | str, *, buckets: int = BUCKETS, salt: str | None = None) -> Column:
    """Deterministic bucket in [0, buckets) from the md5-derived 60-bit hash
    of the column's string form. ``salt`` yields an independent assignment
    (e.g. a fresh split epoch) — mirrored in SQL by appending ``#salt``
    before hashing (the minhash seed convention)."""
    c = F.col(col) if isinstance(col, str) else col
    return hash64_from_md5(c.cast("string"), seed=salt) % F.lit(buckets)


class DatasetSplitRefiner(Refiner):
    """Adds a ``split`` column ('train'/'val'/'test' by default) assigned by
    stable id hash: reproducible, partition-independent, join-free. Ratios
    are cumulative in declaration order; the last split absorbs rounding
    remainder (every bucket maps to exactly one split). NULL ids get a
    NULL split (they carry no stable identity — the previous fall-through
    silently piled them into the LAST declared split, contaminating the
    eval set).

    Default ``salt`` is "split" — DISTINCT from the sampler's "mix". With
    a shared salt (both used to default to None) the two operators'
    buckets are the SAME number, so sampling at weight w then splitting
    makes every survivor land in the first ceil(w * total)-bucket splits:
    a 0.3-weight source put 100% of survivors in train and left val/test
    empty. Pass explicit salts to intentionally correlate (or decorrelate
    epochs)."""

    def __init__(
        self,
        ratios: dict[str, float] | None = None,
        *,
        id_col: str = "doc_id",
        buckets: int = BUCKETS,
        salt: str | None = "split",
        name: str | None = None,
    ):
        super().__init__(name)
        self.ratios = dict(ratios or {"train": 0.9, "val": 0.05, "test": 0.05})
        total = sum(self.ratios.values())
        if not 0.999 <= total <= 1.001:
            raise ValueError(f"split ratios must sum to 1, got {total}")
        self.id_col = id_col
        self.buckets = buckets
        self.salt = salt

    def thresholds(self) -> list[tuple[str, int]]:
        """(split, exclusive upper bucket bound) in declaration order."""
        out, acc = [], 0.0
        names = list(self.ratios)
        for s in names[:-1]:
            acc += self.ratios[s]
            out.append((s, int(round(acc * self.buckets))))
        out.append((names[-1], self.buckets))  # absorbs rounding remainder
        return out

    def columns(self, df: DataFrame) -> dict[str, Column]:
        b = stable_bucket(self.id_col, buckets=self.buckets, salt=self.salt)
        ths = self.thresholds()
        expr = F.lit(ths[-1][0])
        for s, hi in reversed(ths[:-1]):
            expr = F.when(b < hi, F.lit(s)).otherwise(expr)
        return {"split": F.when(F.col(self.id_col).isNotNull(), expr)}


class WeightedSourceSampler(Filter):
    """Per-source deterministic downsampling — the dataset-MIXING knob
    (e.g. keep 100% of books, 30% of common-crawl): a row survives iff its
    stable id bucket falls below ``weight[source] * buckets``. Unlisted
    sources keep ``default_weight``. Reproducible across runs and engines;
    rejection accounting flows through the normal Filter tagging. NULL ids
    are rejected (no stable identity -> NULL bucket -> keep() coalesces to
    False). Default ``salt`` "mix" is DISTINCT from the split refiner's
    "split" — see DatasetSplitRefiner on why a shared salt corrupts
    composed sample+split flows."""

    def __init__(
        self,
        weights: dict[str, float],
        *,
        default_weight: float = 1.0,
        source_col: str = "source",
        id_col: str = "doc_id",
        buckets: int = BUCKETS,
        salt: str | None = "mix",
        name: str | None = None,
    ):
        super().__init__(name)
        for s, w in {**weights, "__default__": default_weight}.items():
            if not 0.0 <= w <= 1.0:
                raise ValueError(f"sampling weight for {s!r} must be in [0, 1], got {w}")
        self.weights = dict(weights)
        self.default_weight = default_weight
        self.source_col = source_col
        self.id_col = id_col
        self.buckets = buckets
        self.salt = salt

    def predicate(self, df: DataFrame) -> Column:
        b = stable_bucket(self.id_col, buckets=self.buckets, salt=self.salt)
        thr = F.lit(int(round(self.default_weight * self.buckets)))
        for s, w in self.weights.items():
            thr = F.when(F.col(self.source_col) == s, F.lit(int(round(w * self.buckets)))).otherwise(thr)
        return b < thr
