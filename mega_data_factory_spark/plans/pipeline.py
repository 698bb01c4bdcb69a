"""Config-driven pipeline execution — the reference's primary entry point
(``mdf run -c config.yaml``, SURVEY §3.1) re-expressed as ONE Catalyst plan.

Single-pass rejection tagging: instead of splitting passed/rejected per
stage (which would re-scan the source once per side output — the reference
writes rejected rows mid-pipeline from each worker, framework/worker.py:
113-117), every row carries a nullable ``_rejection_details`` struct:

  * a Filter fills it for failing rows that are still alive;
  * a Refiner computes its columns for alive rows only (rejected rows get
    NULL — model UDFs never run on dead rows);
  * a single-key Deduplicator ranks *alive* rows per key — dead rows get a
    unique sentinel key so they can't absorb or become representatives;
  * join-based near-dedup operators tag via a left join against their
    duplicate-pairs frame computed over alive rows.

The tagged frame is persisted once; the passed sink, rejected sink
(partitioned by rejecting operator, reference executor.py:100-124) and the
metrics aggregation are then three cheap actions over the cached plan.
Per-operator input/output counts are reconstructed from ONE aggregation of
rejection counts by operator (no per-stage count() scans).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mega_data_factory_spark.config import PipelineConfig
from mega_data_factory_spark.operators.base import (
    REJECTION_DETAILS_COL,
    Deduplicator,
    Filter,
    Operator,
    Refiner,
    rejection_details,
)
from mega_data_factory_spark.registry import OPERATORS
from mega_data_factory_spark.sinks import write_sink
from mega_data_factory_spark.sources import read_source

_R = REJECTION_DETAILS_COL


@dataclass
class OperatorMetrics:
    stage: str
    operator: str
    input_records: int
    output_records: int

    @property
    def pass_rate(self) -> float:
        return 100.0 * self.output_records / self.input_records if self.input_records else 100.0


@dataclass
class PipelineResult:
    run_id: str
    pipeline: str
    duration_sec: float
    input_records: int
    output_records: int
    operators: list[OperatorMetrics] = field(default_factory=list)

    @property
    def pass_rate(self) -> float:
        return 100.0 * self.output_records / self.input_records if self.input_records else 100.0

    @property
    def throughput_rps(self) -> float:
        """End-to-end records/sec (reference run metrics' avg throughput,
        metrics/collector.py:75-104)."""
        return self.input_records / self.duration_sec if self.duration_sec > 0 else 0.0


class Pipeline:
    def __init__(self, config: PipelineConfig):
        from mega_data_factory_spark.resources import build_task_profile

        self.config = config
        self._ops: list[tuple[str, Operator]] = []  # (stage, instance) in order
        # frames persisted mid-plan by _apply_join_dedup; released by the
        # runner (run() / StreamingPipeline) after its actions complete
        self._mid_cached: list[DataFrame] = []
        # (op id, input-columns tuple) -> reusable unresolved Column
        # expression. Filter predicates and the key-dedup tag expression
        # are pure name-based Column builders (they consult df only for
        # its column list, which IS the cache key), so rebuilding them per
        # micro-batch under the streaming runner was pure py4j latency —
        # ~0.2 s/trigger on the bench stream. Unresolved Columns bind at
        # analysis time, so one expression serves every batch of the same
        # schema. The purity contract is stated on the Filter/Deduplicator
        # base classes; custom operators that violate it opt out via
        # cacheable_predicate=False and are rebuilt per frame.
        self._expr_cache: dict[tuple, Column] = {}
        # per-stage ResourceProfiles (GPU stage placement, resources.py);
        # built eagerly so a bad resources block fails at construction
        self.stage_profiles = {
            s.name: p for s in config.stages if (p := build_task_profile(s.resources)) is not None
        }
        for stage in config.stages:
            for oc in stage.operators:
                if not oc.enabled:
                    continue
                self._ops.append((stage.name, OPERATORS.create(oc.name, oc.params)))

    # ------------------------------------------------------------- building

    def _alive(self) -> Column:
        return F.col(_R).isNull()

    def release_intermediates(self) -> None:
        """Unpersist the mid-plan caches from the last build (idempotent)."""
        for f in self._mid_cached:
            f.unpersist()
        self._mid_cached = []

    def close(self) -> None:
        """Full teardown: mid-plan caches AND operator-held model frames
        (any op exposing ``unpersist()``, e.g. NgramPerplexityScorer's
        loaded bigrams/contexts). Distinct from ``release_intermediates``,
        which the streaming runner calls per micro-batch — evicting models
        there would force a reload every batch; call ``close`` once when a
        long-lived session is done with the pipeline."""
        self.release_intermediates()
        for _stage, op in self._ops:
            release = getattr(op, "unpersist", None)
            if callable(release):
                release()

    def build(self, spark: SparkSession, files: list[str] | None = None) -> DataFrame:
        """Source -> tagged DataFrame (one logical plan, no actions — except
        that join-dedup inputs are registered for caching; call
        ``release_intermediates`` after the consuming action)."""
        self.release_intermediates()
        df = read_source(spark, self.config.source, max_samples=self.config.max_samples, files=files)
        return self.apply_ops(df)

    def apply_ops(self, df: DataFrame) -> DataFrame:
        """Tag column + every operator + stage resource profiles — the ONE
        operator loop, shared by batch build() and the streaming runner
        (a duplicated loop in the runner had already drifted: it skipped
        the stage resource tagging, silently dropping GPU scheduling for
        streamed model stages)."""
        from mega_data_factory_spark.operators.base import REJECTION_STRUCT_DDL

        if _R not in df.columns:
            df = df.withColumn(_R, F.lit(None).cast(REJECTION_STRUCT_DDL))
        tagged: set[str] = set()
        for stage_name, op in self._ops:
            # first operator of a resource-carrying stage: tag the Spark
            # stage boundary so the fused model UDFs that follow schedule on
            # the requested CPU/GPU amounts (no-op on local masters)
            if stage_name in self.stage_profiles and stage_name not in tagged:
                from mega_data_factory_spark.resources import tag_stage_resources

                df = tag_stage_resources(df, self.stage_profiles[stage_name])
                tagged.add(stage_name)
            df = self._apply(df, op)
        return df

    def _apply(self, df: DataFrame, op: Operator) -> DataFrame:
        alive = self._alive()
        if isinstance(op, Filter):
            # cache gated on the base-class purity contract: a custom
            # Filter whose predicate consults data/mutable state opts out
            # with cacheable_predicate=False and is rebuilt per frame
            ck = (id(op), tuple(df.columns), "filter")
            tag = self._expr_cache.get(ck) if op.cacheable_predicate else None
            if tag is None:
                # SQL-text fast path (round 12): filters exposing
                # predicate_sql get the whole tag — alive gate, keep
                # coalesce, rejection struct — parsed in ONE py4j round
                # trip instead of ~20-45 composed Column calls per cold
                # plan build. Identical analyzed tree, pinned per filter
                # class in tests/test_refiner_expr_parity.py.
                psql = op.predicate_sql(df)
                if psql is not None:
                    from mega_data_factory_spark.operators.base import rejection_details_sql

                    tag = F.expr(
                        f"CASE WHEN ((`{_R}` IS NULL) AND (NOT coalesce({psql}, false))) "
                        f"THEN {rejection_details_sql('filtered', op.name)} ELSE `{_R}` END"
                    )
                else:
                    tag = F.when(
                        alive & ~op.keep(df), rejection_details("filtered", op.name)
                    ).otherwise(F.col(_R))
                if op.cacheable_predicate:
                    self._expr_cache[ck] = tag
            return df.withColumn(_R, tag)
        if isinstance(op, Deduplicator):
            if hasattr(op, "_dup_pairs"):
                return self._apply_join_dedup(df, op)
            return self._apply_key_dedup(df, op)
        if isinstance(op, Refiner):
            if getattr(op, "pipeline_full_frame", False):
                # refiner modes that are full-frame transforms (e.g. the
                # linear-aggregation repetition stats) — apply() preserves
                # the tag column; the alive gate is the operator's concern
                return op.apply(df)
            texts = op.columns_sql_text(df)
            if (
                texts is not None
                and not (set(texts) & set(df.columns))  # selectExpr('*', x AS c)
                # cannot REPLACE an existing column the way withColumns does
                and all("`" not in k for k in texts)
            ):
                # SQL-text fast path (round 12): the whole projection —
                # alive gate included — in ONE selectExpr round trip
                # instead of 2-3 py4j calls per output column. Identical
                # analyzed tree (withColumns over all-new names IS
                # Project [*, aliases]), pinned per refiner in
                # tests/test_refiner_expr_parity.py.
                out = df.selectExpr(
                    "*",
                    *[
                        f"CASE WHEN (`{_R}` IS NULL) THEN {sql} END AS `{k}`"
                        for k, sql in texts.items()
                    ],
                )
                keys = texts
            else:
                cols = op.columns(df)
                out = df.withColumns({k: F.when(alive, v) for k, v in cols.items()})
                keys = cols
            derived = op.derived_columns(out)
            if derived:
                out = out.withColumns({k: F.when(alive, v) for k, v in derived.items()})
            # '__'-prefixed columns() keys are refiner-private intermediates
            # (the struct-once geometry — see Refiner docstring): feed
            # derived_columns, then drop
            tmp = [k for k in keys if k.startswith("__")]
            return out.drop(*tmp) if tmp else out
        # generic operator: full-frame transform (must preserve the tag col)
        return op.apply(df)

    def _apply_key_dedup(self, df: DataFrame, op: Deduplicator) -> DataFrame:
        alive = self._alive()
        if not op.wide_payload and op.cacheable_predicate:
            ck = (id(op), tuple(df.columns), "key_dedup")
            cached = self._expr_cache.get(ck)
            if cached is not None:
                return df.withColumn(_R, cached)
            # SQL-text fast path (round 12): the whole tag — dead-row key
            # sentinel, effective key, both window functions, rejection
            # struct — parsed in ONE py4j round trip instead of ~50
            # composed Column calls per cold plan build. Identical
            # analyzed tree (window frames, double casts and all), pinned
            # per dedup class in tests/test_refiner_expr_parity.py.
            tag = self._key_dedup_tag_sql(op, df)
            if tag is not None:
                self._expr_cache[ck] = tag
                return df.withColumn(_R, tag)
        # _effective_key, not key(): the null_keys="distinct" contract
        # (rows with no dedup identity each survive) must hold on the
        # pipeline path too — op.key() alone would collapse every NULL-key
        # row into one window partition and mass-reject all but one
        # concat_ws, never NULL: a bare concat made a dead NULL-id row's
        # sentinel NULL, landing it in the alive NULL-key window partition
        # where it (sorting NULLS FIRST on order_col) absorbed every alive
        # NULL-key row as a "duplicate" of a dead representative
        key = F.when(alive, op._effective_key(df).cast("string")).otherwise(
            F.concat_ws("", F.lit("\x00D\x1f"), F.coalesce(F.col(op.id_col).cast("string"), F.lit("")))
        )
        if op.wide_payload:
            # winner election on a NARROW projection (the base.apply
            # geometry): the full-row window below would shuffle the heavy
            # payload bytes the flag exists to keep out of the exchange.
            # Losers (order value + representative id) join back on the
            # unique order_col — AQE broadcasts the loser set when small.
            # __jk: NULL-safe join key — groupBy treats NULL keys as one
            # group but the equi-join back would never match them, silently
            # letting every NULL-key duplicate survive (base.Deduplicator's
            # _NULL_GROUP rationale); __dk keeps the REAL key for the tag
            keyed = df.withColumn("__dk", key).withColumn(
                "__jk", F.coalesce(F.col("__dk"), F.lit(Deduplicator._NULL_GROUP))
            )
            narrow = keyed.select("__jk", F.col("__dk"), F.col(op.order_col).alias("__o"), F.col(op.id_col).alias("__i"))
            win = narrow.groupBy("__jk").agg(
                F.min("__o").alias("__win_o"), F.min_by("__i", "__o").alias("__win_rep")
            )
            losers = (
                narrow.join(win, on="__jk")
                .filter(F.col("__o") != F.col("__win_o"))
                .select(F.col("__o").alias(op.order_col), "__dk", F.col("__win_rep").alias("__rep"))
            )
            out = df.join(losers, on=op.order_col, how="left")  # losers carry __dk for the tag
            tagged = out.withColumn(
                _R,
                F.when(
                    self._alive() & F.col("__rep").isNotNull(),
                    rejection_details("duplicate", op.name, F.col("__dk"), F.col("__rep").cast("string")),
                ).otherwise(F.col(_R)),
            )
            return tagged.drop("__dk", "__rep")
        # ONE projection, window expressions inline: the earlier temp-column
        # form (__dk/__rn/__rep across four withColumns + a drop) re-ran
        # plan analysis per frame — pure driver latency that multiplies by
        # micro-batch count under the streaming runner (measured ~0.2 s of
        # the per-trigger floor). Both window functions share one
        # WindowSpec, so the physical plan is a single Window node either
        # way; the key expression is reused verbatim in the partition spec
        # and the rejection struct.
        w = Window.partitionBy(key).orderBy(F.col(op.order_col))
        tag = F.when(
            self._alive() & (F.row_number().over(w) > 1),
            rejection_details(
                "duplicate", op.name, key, F.first(F.col(op.id_col)).over(w).cast("string")
            ),
        ).otherwise(F.col(_R))
        if op.cacheable_predicate:
            self._expr_cache[(id(op), tuple(df.columns), "key_dedup")] = tag
        return df.withColumn(_R, tag)

    @staticmethod
    def _key_dedup_tag_sql(op: Deduplicator, df: DataFrame) -> Column | None:
        """One-expr spelling of the window dedup tag below, or None when
        the operator/key has no faithful SQL twin (the composed path then
        builds the identical tree Column by Column)."""
        from mega_data_factory_spark.functions.text import sql_plain_column, sql_string_literal

        esql = op.effective_key_sql(df)
        ic = sql_plain_column(op.id_col)
        oc = sql_plain_column(op.order_col)
        if esql is None or ic is None or oc is None:
            return None
        key = (
            f"CASE WHEN (`{_R}` IS NULL) THEN cast({esql} as string) "
            f"ELSE concat_ws('', '\\0D\x1f', coalesce(cast({ic} as string), '')) END"
        )
        over = f"OVER (PARTITION BY {key} ORDER BY {oc})"
        name = sql_string_literal(op.name)
        return F.expr(
            f"CASE WHEN ((`{_R}` IS NULL) AND (row_number() {over} > 1)) "
            f"THEN struct(cast('duplicate' as string) AS reason, "
            f"cast({name} as string) AS operator, "
            f"cast({key} as string) AS dedup_key, "
            f"cast(cast(first({ic}) {over} as string) as string) AS representative_id) "
            f"ELSE `{_R}` END"
        )

    def _apply_join_dedup(self, df: DataFrame, op: Deduplicator) -> DataFrame:
        # The pairs side embeds the full upstream plan (scan + every prior
        # operator) a SECOND time, and the filter(alive) difference defeats
        # ReusedExchange — K join-dedups would re-execute the upstream
        # (model-UDF refiners included) K extra times per action. Persist
        # the shared input once; the runner releases it after its action.
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        self._mid_cached.append(df)
        # No broadcast hint: the dup-pairs frame is O(duplicates) — tiny on
        # a clean corpus but O(n) on a near-dup-heavy one, where a forced
        # broadcast OOMs the driver at scale. AQE sees the real size at
        # runtime and picks broadcast itself whenever the frame is small.
        pairs = op._dup_pairs(df.filter(self._alive())).withColumnRenamed(op.id_col, "__dup_id")
        joined = df.join(
            pairs,
            df[op.id_col] == F.col("__dup_id"),
            "left",
        )
        tagged = joined.withColumn(
            _R,
            F.when(
                self._alive() & F.col("__dup_id").isNotNull(),
                rejection_details(
                    # join-rejectors that aren't dedups (DecontaminationFilter)
                    # carry their own reason
                    getattr(op, "rejection_reason", "duplicate"),
                    op.name,
                    F.lit(None),
                    F.col("__rep").cast("string"),
                ),
            ).otherwise(F.col(_R)),
        )
        return tagged.drop("__dup_id", "__rep")

    def explain(self, spark: SparkSession, mode: str = "formatted") -> str:
        """Physical plan of the built pipeline (one Catalyst plan for all
        stages) — the audit surface for pushdown/fusion/shuffle review."""
        df = self.build(spark)
        try:
            return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
        finally:
            self.release_intermediates()

    # -------------------------------------------------------------- running

    def run(self, spark: SparkSession) -> PipelineResult:
        t0 = time.time()
        run_id = uuid.uuid4().hex[:12]
        src = self.config.source
        pending: list[str] | None = None
        if src.resume_manifest and src.path and not src.table:
            from mega_data_factory_spark.sources.manifest import unprocessed_files

            pending = unprocessed_files(src.path, src.resume_manifest, src.format.lower())
            if not pending:  # fully resumed — nothing left to process
                return PipelineResult(run_id, self.config.name, time.time() - t0, 0, 0, [])
        tagged = self.build(spark, files=pending).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # Free-rider metrics: an Observation on the tagged frame is
            # populated by whichever action runs first (the passed-sink
            # write), so per-operator counts cost NO extra scan when a sink
            # exists (SURVEY §2.6: reference per-operator stats ->
            # df.observe). Without a sink, one aggregation over the cache.
            from pyspark.sql import Observation

            obs = Observation("pipeline_metrics")
            # rejection tags carry the operator NAME; if two instances share
            # a name, attribute their (merged) count to the first instance
            # rather than counting the same rows twice
            seen_names: set[str] = set()
            obs_exprs = [F.count(F.lit(1)).alias("total")]
            for i, (_s, op) in enumerate(self._ops):
                expr = (
                    F.sum(F.when(F.col(f"{_R}.operator") == op.name, 1).otherwise(0))
                    if op.name not in seen_names
                    else F.max(F.lit(0))
                )
                seen_names.add(op.name)
                obs_exprs.append(expr.alias(f"rej_{i}"))
            # input may already carry tags (chained recipes re-running over
            # a tagged table): rows rejected by an operator NOT in this run
            # would otherwise count in total but in no rej_i, inflating
            # output_records past what the passed sink writes. (A pre-tag
            # whose operator name collides with one of this run's ops is
            # attributed to that op — accepted.)
            obs_exprs.append(
                F.sum(
                    F.when(
                        F.col(f"{_R}.operator").isNotNull()
                        & ~F.col(f"{_R}.operator").isin([o.name for _s2, o in self._ops]),
                        1,
                    ).otherwise(0)
                ).alias("pre_rejected")
            )
            observed = tagged.observe(obs, *obs_exprs)
            passed = observed.filter(self._alive()).drop(_R)

            def _write_passed() -> None:
                if self.config.sink:
                    write_sink(passed, self.config.sink)
                else:
                    passed.count()  # populate the observation

            def _write_rejected() -> None:
                import dataclasses

                rejected = (
                    tagged.filter(~self._alive())
                    .withColumn("operator", F.col(f"{_R}.operator"))
                    # run provenance: the sink is append-mode, so without
                    # this a shared path mixes runs and the report's
                    # rejected-sample tables cannot scope to one run
                    .withColumn("run_id", F.lit(run_id))
                )
                # local copy — mutating the caller's SinkConfig in place
                # would leak partition_by=['operator'] into any later reuse
                # of that instance (reference layout, executor.py:100-124)
                rej_cfg = dataclasses.replace(
                    self.config.rejected_sink,
                    partition_by=self.config.rejected_sink.partition_by or ["operator"],
                )
                # REBALANCE on the partition columns before the hive-
                # partitioned write (guide: coalesce-on-write): without it
                # every cached task writes one file per partition value it
                # holds — measured round 12 at bench scale: 514 files /
                # ~1.0s for a ~2.5k-row rejected side vs 18 files / ~0.39s
                # rebalanced. AQE both coalesces small partitions AND
                # splits a skewed partition value across tasks, so the
                # shape is safe when one operator rejects most of a
                # 100 TB corpus (a plain repartition(cols) would funnel
                # that operator through one task).
                write_sink(rejected.hint("rebalance", *rej_cfg.partition_by), rej_cfg)

            if self.config.sink and self.config.rejected_sink:
                # Overlap the two sink writes on two driver threads (guide
                # §2.6; the streaming runner's parallel_sinks posture,
                # always-on here): both actions read the SAME persisted
                # tagged frame, the block-level cache write locks make
                # concurrent first computation compute-once, and the
                # Observation rides whichever action touches the observed
                # plan (the passed write). The batch then pays
                # ~max(write, write) instead of their sum — the rejected
                # write is commit-latency-bound, not throughput-bound, and
                # the cluster is otherwise idle during its commits.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as ex:
                    for fut in [ex.submit(_write_passed), ex.submit(_write_rejected)]:
                        fut.result()
            else:
                _write_passed()
                if self.config.rejected_sink:
                    _write_rejected()

            got = obs.get
            total = got["total"]
            rejected_by_idx = [got[f"rej_{i}"] or 0 for i in range(len(self._ops))]
            pre_rejected = got["pre_rejected"] or 0
            passed_n = total - sum(rejected_by_idx) - pre_rejected
            ops_metrics: list[OperatorMetrics] = []
            # the funnel starts from the rows THIS run could pass
            remaining = total - pre_rejected
            for (stage, op), rejected_here in zip(self._ops, rejected_by_idx):
                ops_metrics.append(OperatorMetrics(stage, op.name, remaining, remaining - rejected_here))
                remaining -= rejected_here
            result = PipelineResult(
                run_id=run_id,
                pipeline=self.config.name,
                duration_sec=time.time() - t0,
                input_records=total,
                output_records=passed_n,
                operators=ops_metrics,
            )
            if self.config.metrics_path:
                from mega_data_factory_spark.metrics import write_metrics

                write_metrics(spark, result, self.config.metrics_path)
            if self.config.profile_path:
                # data-shape profile of the shipped output: ONE sketch-mode
                # aggregate over the already-cached tagged frame
                # (operators/profiling.py), long-form parquet
                from mega_data_factory_spark.operators.profiling import ColumnProfiler

                ColumnProfiler().profile(passed).write.mode("overwrite").parquet(
                    self.config.profile_path
                )
            # incremental dedup stores persist AFTER the sinks land (same
            # at-least-once posture as the resume manifest) — without this
            # a config-driven IncrementalExactDeduplicator would dedup
            # within the run but never remember it across runs. Guarded on
            # the PASSED sink specifically: survivor keys only ever ship
            # through it, so a sink-less (or rejected-only audit) run must
            # not remember docs as seen — a later real run would reject
            # them as duplicates of representatives that never landed.
            if self.config.sink:
                for _stage, op in self._ops:
                    if hasattr(op, "update_store"):
                        # from the cached tagged frame, not the observed
                        # plan (a second action must not refire the
                        # Observation)
                        op.update_store(tagged.filter(self._alive()).drop(_R), survivors=True)
                        if self.config.metrics_path and getattr(op, "store_path", None):
                            # store growth is monitorable from the metrics
                            # table (event=post_update; footer/listing
                            # stats, no data scan)
                            from mega_data_factory_spark.metrics import write_store_metrics

                            write_store_metrics(
                                spark,
                                self.config.metrics_path,
                                run_id=run_id,
                                pipeline=self.config.name,
                                operator_name=op.name,
                                store_path=op.store_path,
                            )
            if pending is not None and self.config.sink and self.config.max_samples is None:
                # checkpoint ONLY when every record of the pending files
                # could have durably landed: needs the PASSED sink (a
                # rejected-only audit ships survivors nowhere — marking
                # its files processed would lose them the same way a
                # metrics-only preview would) and no max_samples cap (a
                # truncated read marking whole files processed would drop
                # every record past the sample from all future runs)
                from mega_data_factory_spark.sources.manifest import mark_processed

                mark_processed(src.resume_manifest, pending, run_id)
            return result
        finally:
            tagged.unpersist()
            self.release_intermediates()


def run_yaml(spark: SparkSession, yaml_path_or_text: str) -> PipelineResult:
    """``mdf run -c config.yaml`` equivalent."""
    return Pipeline(PipelineConfig.from_yaml(yaml_path_or_text)).run(spark)
