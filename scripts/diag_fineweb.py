"""Stage-attribute the fineweb_recipe_pipeline 100x slope (round-9 verdict
Wrong #3: the 8.33x slope was the steepest non-export line and lacked the
per-stage attribution the Gopher line got).

Method: run the bench-copy recipe (same relaxations as bench.py's
_relax_fineweb, so stages carry full volume on the scaled corpora)
CUMULATIVELY truncated after each stage at sf0.1 and sf10; the per-stage
cost is the delta between consecutive cumulative walls (each leg min-of-2,
same steady-state discipline as bench.py). The per-stage 100x slope then
names which stage dominates the whole-pipeline slope.

Run ISOLATED (tmux, pgrep -x java clean) like every timed artifact:
    python scripts/diag_fineweb.py | tee scripts/diag_fineweb.out
"""

from __future__ import annotations

import copy
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.config import PipelineConfig, SinkConfig
from mega_data_factory_spark.plans.pipeline import Pipeline
from mega_data_factory_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf10": os.path.join(REPO, ".localdata", "sf10"),
}


def relax_fineweb(recipe_cfg) -> None:
    """Bench-copy thresholds — keep in sync with bench.py _relax_fineweb."""
    for st in recipe_cfg.stages:
        for oc in st.operators:
            nm = oc.params.get("name")
            if nm == "LanguageCut" or (st.name == "language" and oc.name == "NumericRangeFilter"):
                oc.params = {**oc.params, "lo": 0}
            elif nm == "QualityScoreCut":
                oc.params = {**oc.params, "lo": 0}
            elif nm == "GopherRepetitionCut":
                oc.params = {**oc.params, "hi": 1.0}


def run_truncated(spark, base_cfg, n_stages: int, src: str) -> float:
    cfg = copy.deepcopy(base_cfg)
    cfg.stages = cfg.stages[:n_stages]
    tmp = tempfile.mkdtemp(prefix="diag_fineweb_")
    try:
        cfg.source.path = src
        cfg.sink = SinkConfig(path=os.path.join(tmp, "out"), mode="overwrite")
        cfg.rejected_sink = SinkConfig(path=os.path.join(tmp, "rej"), mode="overwrite")
        cfg.metrics_path = os.path.join(tmp, "metrics")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            Pipeline(cfg).run(spark)
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark("diag-fineweb", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    with open(os.path.join(REPO, "configs", "fineweb_style_recipe.yaml")) as f:
        base_cfg = PipelineConfig.from_yaml(f.read())
    relax_fineweb(base_cfg)
    names = [st.name for st in base_cfg.stages]
    walls: dict[str, list[float]] = {}
    for scale, sf_dir in SCALES.items():
        src = f"{sf_dir}/documents.parquet"
        if not os.path.exists(src):
            print(f"{scale}: {src} missing — run scripts/make_scaled_sf.py first")
            continue
        cum = []
        for k in range(1, len(names) + 1):
            w = run_truncated(spark, base_cfg, k, src)
            cum.append(w)
            print(f"{scale} stages[:{k}] ({'+'.join(names[:k])}): {w:.2f}s", flush=True)
        walls[scale] = cum

    if len(walls) == 2:
        print("\n== per-stage deltas and 100x slopes ==")
        a, b = walls["sf0.1"], walls["sf10"]
        prev_a = prev_b = 0.0
        rows = []
        for i, name in enumerate(names):
            da, db = max(a[i] - prev_a, 0.005), max(b[i] - prev_b, 0.005)
            rows.append((name, da, db, db / da))
            prev_a, prev_b = a[i], b[i]
            print(f"{name:14s} sf0.1 {da:6.2f}s   sf10 {db:7.2f}s   slope {db/da:6.2f}x")
        dom = max(rows, key=lambda r: r[2])
        print(
            f"\ndominant sf10 stage: {dom[0]} ({dom[2]:.1f}s of {b[-1]:.1f}s total, "
            f"slope {dom[3]:.2f}x)"
        )


if __name__ == "__main__":
    main()
