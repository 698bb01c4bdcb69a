"""Stage-level GPU/CPU placement — the reference's per-stage Ray resources
(framework/config.py:41-44: ``cpu``/``gpu`` floats per stage, e.g. 0.2-0.25
GPU per worker, consumed by framework/executor.py:186-207 and
configs/z_image.yaml:79-104) re-expressed as Spark stage-level scheduling.

Spark mapping (SURVEY §4 "Heterogeneous (GPU) stage placement"): a
``ResourceProfile`` with ``TaskResourceRequests`` carries the per-task
CPU/GPU amounts; attaching it to the Arrow-batched hop that starts a stage
(``mapInPandas(..., profile=...)``) schedules THAT stage's tasks on
executors holding the requested resources. Because narrow transformations
fuse into one Spark stage, tagging the stage boundary with an identity
``mapInPandas`` carrying the profile places every fused model-refiner UDF
that follows it (the reference's "GPU stage" = CLIP/SigLIP/aesthetic/AIGC
heads) without rewriting the refiners themselves.

Stage-level scheduling needs a real cluster manager (standalone/YARN/K8s
with dynamic allocation, SPARK-27495); on ``local[*]`` masters the profile
is buildable but not schedulable, so application is a documented no-op —
the config surface, profile construction, and plumbing are real and
tested, the placement takes effect when the same pipeline runs on a
cluster. (This container has no GPU; per the reference's own test
philosophy, glue not weights.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def build_task_profile(resources: dict[str, float] | None):
    """``{cpus: N, gpus: M}`` (reference stage-resource shape) ->
    ``ResourceProfile`` or None when no placement is requested.

    ``gpus`` maps to the canonical ``gpu`` task resource (fractional
    amounts supported — 0.25 packs 4 tasks per GPU, the reference's
    z_image.yaml sharing pattern)."""
    if not resources:
        return None
    cpus = resources.get("cpus", resources.get("cpu"))
    gpus = resources.get("gpus", resources.get("gpu"))
    if not cpus and not gpus:
        return None
    from pyspark.resource import ResourceProfileBuilder, TaskResourceRequests

    treq = TaskResourceRequests()
    if cpus:
        # Spark task-cpu requests are whole cores; a fractional value (legal
        # in the reference's Ray shape) would silently truncate — 0.5 ->
        # cpus(0), a zero-cpu task request. Fail at construction instead
        # (Pipeline.__init__ builds profiles eagerly for exactly this).
        if float(cpus) != int(cpus) or int(cpus) < 1:
            raise ValueError(
                f"task cpus must be a whole number >= 1, got {cpus!r}: Spark "
                "schedules whole cores per task (fractional sharing is a Ray "
                "concept; express GPU sharing via fractional gpus instead)"
            )
        treq = treq.cpus(int(cpus))
    if gpus:
        treq = treq.resource("gpu", float(gpus))
    return ResourceProfileBuilder().require(treq).build


def supports_stage_level_scheduling(spark: SparkSession) -> bool:
    """Stage-level scheduling requires a cluster manager; local masters
    accept profile objects but cannot schedule them (SPARK-27495)."""
    master = spark.conf.get("spark.master", "")
    return bool(master) and not master.startswith("local")


def tag_stage_resources(df: DataFrame, profile) -> DataFrame:
    """Attach ``profile`` to the Spark stage the next transformations fuse
    into, via an identity Arrow pass (``mapInPandas`` with a profile). Rows
    stream through unchanged; the hop costs one Arrow serialization — only
    used for stages that carry model UDFs, where that crossing happens
    anyway. No-op when ``profile`` is None or the session can't schedule it
    (local mode)."""
    if profile is None or not supports_stage_level_scheduling(df.sparkSession):
        return df

    def _identity(batches):
        yield from batches

    return df.mapInPandas(_identity, df.schema, profile=profile)
