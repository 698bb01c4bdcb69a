"""mega_data_factory_spark — a PySpark-native data-curation & analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
``duoan/mega-data-factory`` reference (config-driven curation pipelines for
foundation-model training data: sources -> refiners/filters/dedup -> sinks),
plus the large-scale training-data operators such a pipeline needs at 100 TB
(near-dedup families, similarity search, multimodal columns, text analysis).

Design stance (see SURVEY.md):
  * operators are declarative DataFrame transforms — Catalyst/Tungsten do the
    physical planning (pushdown, pruning, codegen, AQE);
  * Python only where semantics genuinely require it, always Arrow-batched
    (pandas UDF / mapInPandas), never row-at-a-time;
  * dedup is a shuffle-partitioned window (first-seen-wins with a
    deterministic ``min(id)`` tie-break — a strengthening of the reference's
    arrival-order semantics, see reference framework/backend.py:39-47);
  * side outputs (rejected rows) carry a typed ``_rejection_details`` struct
    (reference framework/operator.py:258-263).
"""

from mega_data_factory_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
