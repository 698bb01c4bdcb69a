"""Driver-parity sweep: run every registered query on a DEFAULT session.

Round 7 shipped a red CORRECTNESS row (`bloom_pruned_join`) because the
engine's own `get_spark()` (tests/conftest.py) enables Arrow for
`createDataFrame`, while the driver's correctness gate runs a
default-config SparkSession where Arrow is OFF and `createDataFrame`
takes the pickled `_createFromLocal` path with its strict type verifier.
An env-dependent code path was green in pytest and red in the gate.

This script is the missing test class: it builds a session EXACTLY the
way the driver does — `SparkSession.builder.master(...).getOrCreate()`
with no engine configs at all (default Arrow=off, default shuffle
partitions, default timezone) — and runs every query in
`plans.all_queries()` plus `plans.retired_queries()` to completion
(collect, i.e. full plan execution including final projections that a
count() would prune). Rows-only is the bar here by design: the
hash-vs-oracle bar stays on the tuned session (conftest
`assert_query_matches_oracle`); THIS sweep exists so a query can never
again depend on session configuration to run at all.

Run in a FRESH process (tests/test_driver_parity.py does this via
subprocess) — an in-process sweep would inherit the tuned session.

Usage: python scripts/driver_parity_sweep.py [sf_dir] [only_csv]
Prints one JSON line per query and a final summary line
{"failures": {...}, "ran": N}; exit code 1 if any query failed.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    # Deliberately NO engine configs: this must mirror the driver's own
    # session (Arrow off -> pickled createDataFrame verifier, default
    # shuffle partitions, default session timezone). local[8] only bounds
    # core usage; it does not alter any semantics under test.
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
        .appName("driver-parity-sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from mega_data_factory_spark.plans import all_queries, retired_queries

    qs = {**all_queries(), **retired_queries()}
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    failures: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        try:
            rows = fn(spark, sf_dir).collect()
            print(json.dumps({"query": name, "rows": len(rows)}), flush=True)
        except Exception:
            tb = traceback.format_exc()
            failures[name] = tb[-800:]
            print(json.dumps({"query": name, "error": tb.splitlines()[-1][:300]}), flush=True)

    # The shipped YAML recipes, end to end through Pipeline.run on the SAME
    # default session (VERDICT r8 #7): pytest runs them only under the tuned
    # session; a recipe stage depending on session config (Arrow path,
    # shuffle width, timezone) would pass there and fail on the driver.
    import shutil
    import tempfile

    from mega_data_factory_spark.config import PipelineConfig, SinkConfig
    from mega_data_factory_spark.plans.pipeline import Pipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recipes = ["gopher_style_recipe.yaml", "fineweb_style_recipe.yaml"]
    recipes_ran = 0
    for yaml_name in recipes if only is None else []:
        key = f"recipe:{yaml_name}"
        tmp = tempfile.mkdtemp(prefix="mdf_parity_recipe_")
        try:
            with open(os.path.join(repo, "configs", yaml_name)) as f:
                cfg = PipelineConfig.from_yaml(f.read())
            cfg.source.path = f"{sf_dir}/documents.parquet"
            cfg.sink = SinkConfig(path=os.path.join(tmp, "out"), mode="overwrite")
            cfg.rejected_sink = SinkConfig(path=os.path.join(tmp, "rej"), mode="overwrite")
            cfg.metrics_path = os.path.join(tmp, "metrics")
            res = Pipeline(cfg).run(spark)
            recipes_ran += 1
            print(
                json.dumps({"query": key, "rows": res.output_records, "input": res.input_records}),
                flush=True,
            )
        except Exception:
            tb = traceback.format_exc()
            failures[key] = tb[-800:]
            print(json.dumps({"query": key, "error": tb.splitlines()[-1][:300]}), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"failures": failures, "ran": len(qs), "recipes_ran": recipes_ran}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
