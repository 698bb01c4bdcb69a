"""Pipeline configuration: the reference's YAML contract as dataclasses.

Mirrors the reference's config surface (framework/config.py:141-214):
a pipeline is ``source -> [stage]* -> sink`` where each stage is an ordered
operator list with ``name`` / ``params`` / ``enabled``; a legacy flat
``operators:`` list is rewritten into a single stage (config.py:163-182).
Executor-tuning knobs of the reference (worker counts, batch sizes,
max_in_flight) have no meaning under Spark's scheduler and are accepted but
ignored (recorded in ``extras`` for diagnostics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class OperatorConfig:
    name: str
    params: dict[str, Any] = field(default_factory=dict)
    enabled: bool = True

    @classmethod
    def from_dict(cls, d: dict[str, Any] | str) -> OperatorConfig:
        if isinstance(d, str):
            return cls(name=d)
        return cls(name=d["name"], params=d.get("params", {}) or {}, enabled=d.get("enabled", True))


@dataclass
class StageConfig:
    name: str
    operators: list[OperatorConfig] = field(default_factory=list)
    # per-stage task resources (reference framework/config.py:41-44:
    # fractional gpu/cpu per worker) -> Spark stage-level scheduling; see
    # mega_data_factory_spark/resources.py
    resources: dict[str, float] | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any], idx: int) -> StageConfig:
        ops = [OperatorConfig.from_dict(o) for o in d.get("operators", [])]
        return cls(name=d.get("name", f"stage_{idx}"), operators=ops, resources=d.get("resources"))


@dataclass
class SourceConfig:
    """Data source: format + path (+ reader options). ``table`` reads a
    registered temp view instead of a path (programmatic pipelines)."""

    format: str = "parquet"
    path: str | None = None
    table: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    schema: str | None = None  # DDL string for schema-on-read sources
    resume_manifest: str | None = None  # processed-file manifest (batch resume)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> SourceConfig:
        return cls(
            format=d.get("format", d.get("type", "parquet")),
            path=d.get("path"),
            table=d.get("table"),
            options=d.get("options", {}) or {},
            schema=d.get("schema"),
            resume_manifest=d.get("resume_manifest"),
        )


@dataclass
class SinkConfig:
    format: str = "parquet"
    path: str | None = None
    mode: str = "append"  # reference writers are append-only (parquet_writer.py:144-158)
    partition_by: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)
    # Bucketed/sorted layout (the fact-fact join lever at 100 TB: two
    # tables bucketed by the join key into the same bucket count join with
    # ZERO exchanges — tests/test_storage_layout.py). Bucket metadata lives
    # in the catalog, so bucketing requires ``table`` (saveAsTable); ``path``
    # then controls the external location.
    table: str | None = None
    bucket_by: list[str] = field(default_factory=list)
    buckets: int | None = None
    sort_by: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> SinkConfig:
        def _cols(key: str) -> list[str]:
            v = d.get(key) or []
            return [v] if isinstance(v, str) else v

        return cls(
            format=d.get("format", d.get("type", "parquet")),
            path=d.get("path"),
            mode=d.get("mode", "append"),
            partition_by=_cols("partition_by"),
            options=d.get("options", {}) or {},
            table=d.get("table"),
            bucket_by=_cols("bucket_by"),
            buckets=d.get("buckets"),
            sort_by=_cols("sort_by"),
        )


@dataclass
class PipelineConfig:
    name: str
    source: SourceConfig
    stages: list[StageConfig]
    sink: SinkConfig | None = None
    rejected_sink: SinkConfig | None = None  # reference executor.py:100-124
    metrics_path: str | None = None
    # optional data-shape profile of the PASSED output (operators/profiling
    # sketch mode), written as long-form parquet next to the run's sinks
    profile_path: str | None = None
    max_samples: int | None = None  # global input cap (executor.py:253-259)
    id_col: str = "doc_id"
    extras: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> PipelineConfig:
        pipe = d.get("pipeline", d)
        stages_raw = pipe.get("stages")
        if stages_raw is None and "operators" in pipe:
            # legacy flat operator list -> one stage (reference config.py:163-182)
            stages_raw = [{"name": "stage_0", "operators": pipe["operators"]}]
        stages = [StageConfig.from_dict(s, i) for i, s in enumerate(stages_raw or [])]
        known = {"name", "source", "stages", "operators", "sink", "rejected_sink", "metrics_path", "profile_path", "max_samples", "id_col"}
        return cls(
            name=pipe.get("name", "pipeline"),
            source=SourceConfig.from_dict(pipe.get("source", {})),
            stages=stages,
            sink=SinkConfig.from_dict(pipe["sink"]) if pipe.get("sink") else None,
            rejected_sink=SinkConfig.from_dict(pipe["rejected_sink"]) if pipe.get("rejected_sink") else None,
            metrics_path=pipe.get("metrics_path"),
            profile_path=pipe.get("profile_path"),
            max_samples=pipe.get("max_samples"),
            id_col=pipe.get("id_col", "doc_id"),
            extras={k: v for k, v in pipe.items() if k not in known},
        )

    @classmethod
    def from_yaml(cls, path_or_text: str) -> PipelineConfig:
        """Accepts a YAML file path or inline YAML text."""
        import os

        if "\n" not in path_or_text and os.path.exists(path_or_text):
            with open(path_or_text) as f:
                path_or_text = f.read()
        return cls.from_dict(yaml.safe_load(path_or_text))
