"""Diagnostic: bloom-pruned vs plain incremental-store join at volume.

The claim under test (operators/bloom.py): on a mostly-new batch the Bloom
pre-filter removes the full-batch shuffle into the seen-keys store join —
definitely-new rows bypass the join, only true hits plus an fpp sliver
shuffle — and the probe itself is shuffle-free (broadcast single-row
bitmap + codegen bit tests; the plan must show BroadcastNestedLoopJoin and
NO Exchange on the probe side).

Synthetic shape mirrors a steady-state crawl: BATCH_N batch keys against a
STORE_N-key historical store TOO BIG TO BROADCAST (the regime the filter
exists for — while the store fits the broadcast threshold, AQE already
makes the plain join shuffle-free and bloom is pure overhead; measured
0.36x at a 500k-row store), OVERLAP fraction of the batch already seen. Prints min-of-2
walls for both paths plus the probe-plan exchange audit.

Run: python scripts/diag_bloom.py  (writes stdout; redirect to
scripts/diag_bloom.out for the artifact)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mega_data_factory_spark.operators.bloom import BloomFilter, bloom_pruned_left_join
from mega_data_factory_spark.session import get_spark

BATCH_N = 5_000_000
STORE_N = 30_000_000
OVERLAP = 0.02  # 2% of the batch is already in the store

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("WARN")

# store: keys s0..s{STORE_N}; batch: OVERLAP from the store key space,
# the rest disjoint
store = (
    spark.range(STORE_N)
    .select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("k"),
        F.col("id").cast("string").alias("rep"),
    )
    .cache()
)
seen_cut = int(BATCH_N * OVERLAP)
batch = (
    spark.range(BATCH_N)
    .select(
        F.when(
            F.col("id") < seen_cut, F.concat(F.lit("s"), (F.col("id") % STORE_N).cast("string"))
        )
        .otherwise(F.concat(F.lit("n"), F.col("id").cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    .cache()
)
print(f"batch={batch.count():,} store={store.count():,} overlap={OVERLAP:.0%}")


def timed(label, fn):
    walls = []
    for _ in range(3):  # warm + 2
        t0 = time.time()
        n = fn()
        walls.append(time.time() - t0)
    print(f"{label}: {min(walls[1:]):.3f}s (matched rows: {n:,})")
    return min(walls[1:])


plain = timed(
    "plain left join         ",
    lambda: batch.join(store, on="k", how="left").filter(F.col("rep").isNotNull()).count(),
)
# fit and probe+join timed separately: in the operator the fit runs once
# per batch apply, the join once — report both and the sum
# min-of-2 like every other wall here (the first fit pays worker/JIT warmup)
fit_walls = []
for _ in range(2):
    t0 = time.time()
    bf0 = BloomFilter(fpp=0.01).fit(store, "k")
    fit_walls.append(time.time() - t0)
fit_wall = min(fit_walls)
print(f"bloom fit (store scan)  : {fit_wall:.3f}s ({bf0.num_bits / 8 / 1e6:.1f} MB bitmap, k={bf0.num_hashes})")


def _pruned_count():
    marked = bf0.with_hit_col(batch, "k", "__bloom_hit")
    hit_rows = marked.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    pruned_store = store.join(F.broadcast(hit_rows.select("k").distinct()), on="k", how="left_semi")
    return hit_rows.join(F.broadcast(pruned_store), on="k", how="left").filter(
        F.col("rep").isNotNull()
    ).count()


pruned = timed("bloom probe + slim joins", _pruned_count)
total = fit_wall + pruned
print(f"pruned total (fit+probe+join): {total:.3f}s -> vs plain: {plain / total:.2f}x")
print(f"probe-only (fit amortized across micro-batches): {plain / pruned:.2f}x")

# Plan audit — the 100 TB evidence. Wall time above is LOCAL-mode honest:
# local[32] shuffles through RAM, so the plain join's two full-side
# exchanges cost almost nothing here. On a cluster those exchanges are
# network+disk over the full batch AND the full store; the pruned
# geometry removes BOTH (probe = broadcast bitmap; store is semi-reduced
# by the broadcast hit-key sliver and STREAMS; the left-outer then
# broadcasts the pruned store) — the only exchange left is the hit-key
# distinct at sliver cardinality.
def shuffle_exchanges(df):
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.count("Exchange hashpartitioning")


from mega_data_factory_spark.operators.bloom import bloom_pruned_left_join as bplj

plain_df = batch.join(store, on="k", how="left").filter(F.col("rep").isNotNull())
pruned_df = bplj(batch, store, "k", fpp=0.01).filter(F.col("rep").isNotNull())
marked = bf0.with_hit_col(batch, "k")
print(f"plain-join shuffle exchanges: {shuffle_exchanges(plain_df)} "
      "(full batch + full store staged to shuffle)")
print(f"bloom probe shuffle exchanges: {shuffle_exchanges(marked)} "
      f"(BroadcastNestedLoopJoin={'BroadcastNestedLoopJoin' in marked._jdf.queryExecution().executedPlan().toString()})")
print(f"pruned-join shuffle exchanges: {shuffle_exchanges(pruned_df)} "
      "(expected 1: the hit-key distinct — compact keys at sliver cardinality;")
print("  neither the 5M-row batch nor the 30M-row store is ever hash-redistributed)")
print()
print("verdict: enable bloom_fpp on CLUSTER deployments where the store has")
print("outgrown the broadcast threshold and shuffle is network/disk-bound —")
print("it converts two O(data) exchanges into an O(store) scan plus O(hits)")
print("broadcasts. On local[*] RAM-shuffle the plain join is faster; that is")
print("why the knob defaults to None.")
