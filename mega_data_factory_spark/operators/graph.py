"""Distributed connected components + duplicate-cluster policies.

Every near-dedup operator in this engine emits PAIRS (operators/dedup.py
``_dup_pairs``: loser -> representative). Pairwise first-wins is the
reference's only policy (min-id representative, framework/backend.py); at
100 TB the stronger policy is CLUSTER-level: resolve the transitive
closure of the pair graph, then keep the BEST document per duplicate
cluster (highest quality score), not merely the smallest id. That needs
connected components at data scale.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round is
two grouped-min shuffles over the CURRENT edge set (which only shrinks
toward star form), and the round count is O(log^2 n) — in practice 2-4
rounds for dedup graphs, whose clusters are band-join near-cliques. This
is the Spark-idiomatic shape: no vertex programs, no driver-side
union-find, just groupBy/join on compact (node, node) pairs.

Iterative plans MUST truncate lineage or the round-N plan re-executes all
prior rounds (and the optimizer re-analyzes an exponentially growing
tree): each round ends in an eager ``localCheckpoint``. On a cluster with
a configured checkpoint dir, ``df.checkpoint()`` is the durable
alternative; localCheckpoint (executor memory/disk) is the right default
for a bounded iteration count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mega_data_factory_spark.operators.base import JoinDeduplicator


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected edge list (u, v): self-loops dropped, one row
    per unordered pair."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m(u) = min(N(u) + {u})."""
    bidir = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        bidir.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge high->low, then connect every low neighbor (and the
    center) to the minimum low neighbor."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Resolve the pair graph to ``(id, component)`` where ``component`` is
    the minimum node id in each connected component. Isolated nodes never
    appear in ``edges`` and so are absent here — callers left-join and
    coalesce to the node's own id (``assign_components`` does).

    Convergence is detected by an (edge-count, edge-hash-sum) checksum:
    star edge sets are fixed points of both phases, so two identical
    consecutive checksums mean every node points at its component root.
    ``max_iter`` is a guard, not a tuning knob — the alternating algorithm
    needs O(log^2 n) rounds (SoCC 2014, Thm 2); hitting the guard raises
    rather than silently returning a partial closure.
    """
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    prev: tuple[int, int] | None = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-space sum: 64-bit hash values overflow a long sum
            # under ANSI mode; decimal(38,0) holds ~2^63 * 10^18 terms
            F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
        ).first()
        check = (row["n"], str(row["h"]))
        if check == prev:
            break
        prev = check
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: every edge is (node, root); roots appear only on the right
    return e.select(F.col("u").alias("id"), F.col("v").alias("component")).unionByName(
        e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    ).distinct()


def assign_components(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "src",
    dst: str = "dst",
    component_col: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """Attach a duplicate-cluster id to every row: members of a pair-graph
    component share its min id; rows not in any pair keep their own id as
    a singleton component."""
    cc = connected_components(pairs, src, dst, max_iter=max_iter).select(
        F.col("id").alias("__cc_id"), F.col("component").alias("__cc_comp")
    )
    joined = df.join(cc, df[id_col] == F.col("__cc_id"), "left")
    return joined.withColumn(
        component_col, F.coalesce(F.col("__cc_comp"), F.col(id_col))
    ).drop("__cc_id", "__cc_comp")


def keep_best_per_component(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str | Column,
    *,
    id_col: str = "doc_id",
    src: str = "src",
    dst: str = "dst",
    descending: bool = True,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster-level dedup policy: ONE survivor per duplicate cluster — the
    row with the best ``quality_col`` (ties broken by min id, making the
    selection total and deterministic). Strictly stronger than pairwise
    first-wins: a transitive chain a~b, b~c collapses to a single best
    representative even when a and c were never directly paired.

    One extra shuffle over first-wins (the per-component window); the
    window keys are the compact component ids, so the shuffle payload is
    rows, never pair lists.
    """
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    tagged = assign_components(
        df, pairs, id_col=id_col, src=src, dst=dst, component_col="__component", max_iter=max_iter
    )
    order = [q.desc() if descending else q.asc(), F.col(id_col).asc()]
    w = Window.partitionBy("__component").orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__component")
    )


class ClusterDeduplicator(JoinDeduplicator):
    """Keep-best-per-cluster dedup as a pipeline operator: wraps ANY
    pair-emitting deduplicator from the registry (MinHash LSH, SimHash,
    n-gram Jaccard, shared-span, embedding cosine, ...), resolves its
    pairs to connected components, and keeps the member with the best
    ``quality_col`` per cluster (ties -> min id). YAML-constructible:

    .. code-block:: yaml

        - name: ClusterDeduplicator
          params:
            base: MinHashLSHDeduplicator
            base_params: {num_hashes: 16, bands: 4}
            quality_col: quality_score

    Cost over the base operator: the component resolution (2-4 bounded
    rounds of compact-pair shuffles) plus one per-component window over
    cluster MEMBERS only (non-duplicated rows never enter the closure).
    ``representative_id`` on rejected rows is the best member's id, so
    downstream "which doc replaced mine" audits keep working.
    """

    rejection_reason = "duplicate"

    def __init__(
        self,
        base,
        quality_col: str,
        *,
        base_params: dict | None = None,
        descending: bool = True,
        id_col: str = "doc_id",
        max_iter: int = 25,
        name: str | None = None,
    ):
        super().__init__(name, order_col=id_col, id_col=id_col)
        if isinstance(base, str):
            from mega_data_factory_spark.registry import OPERATORS, _register_builtins

            _register_builtins()
            params = dict(base_params or {})
            params.setdefault("id_col", id_col)
            base = OPERATORS.create(base, params)
        if not hasattr(base, "_dup_pairs"):
            raise ValueError(
                f"ClusterDeduplicator needs a pair-emitting deduplicator, got {type(base).__name__}"
            )
        # the closure treats __rep as a DOCUMENT ID edge endpoint; bases
        # with a different _dup_pairs contract (DecontaminationFilter's
        # __rep is a shared-span COUNT) would silently merge id nodes with
        # count values into garbage components
        if getattr(base, "rejection_reason", "duplicate") != "duplicate":
            raise ValueError(
                f"ClusterDeduplicator needs a duplicate-pair base whose __rep is a "
                f"representative id; {type(base).__name__} emits "
                f"rejection_reason={getattr(base, 'rejection_reason', None)!r}"
            )
        self.base = base
        self.quality_col = quality_col
        self.descending = descending
        self.max_iter = max_iter

    def _dup_pairs(self, df: DataFrame) -> DataFrame:
        edges = self.base._dup_pairs(df).select(
            F.col(self.id_col).alias("src"), F.col("__rep").alias("dst")
        )
        cc = connected_components(edges, max_iter=self.max_iter).select(
            F.col("id").alias("__cc_id"), F.col("component").alias("__component")
        )
        members = df.join(cc, df[self.id_col] == F.col("__cc_id")).select(
            F.col(self.id_col).alias("__id"), F.col("__component"), F.col(self.quality_col).alias("__q")
        )
        order = [
            F.col("__q").desc() if self.descending else F.col("__q").asc(),
            F.col("__id").asc(),
        ]
        w = Window.partitionBy("__component").orderBy(*order)
        ranked = members.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__best", F.first("__id").over(w)
        )
        return ranked.filter(F.col("__rn") > 1).select(
            F.col("__id").alias(self.id_col), F.col("__best").alias("__rep")
        )

