"""Residual plan-build latency attribution AFTER the twin refactor.

twin_ab.out showed the six struct builders at 230 ms summed, but whole
recipe plan builds still cost fineweb ~1050 ms / gopher ~730 ms. This
script splits Pipeline.build per operator (monkeypatched _apply timer)
plus read_source, over N reps, per-op minima — so the next translation
target is measured, not guessed (guide §1).

Usage: python scripts/diag_r12_planbuild2.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-planbuild2", cpus=cpus)
    spark.range(1).count()

    from mega_data_factory_spark.config import PipelineConfig
    from mega_data_factory_spark.plans import pipeline as plmod
    from mega_data_factory_spark.plans.pipeline import Pipeline

    orig_apply = Pipeline._apply
    orig_read = plmod.read_source
    times: dict[str, list[float]] = defaultdict(list)

    def timed_apply(self, df, op):
        t0 = time.perf_counter()
        out = orig_apply(self, df, op)
        times[f"{type(op).__name__}:{op.name}"].append(time.perf_counter() - t0)
        return out

    def timed_read(spark_, source, **kw):
        t0 = time.perf_counter()
        out = orig_read(spark_, source, **kw)
        times["read_source"].append(time.perf_counter() - t0)
        return out

    Pipeline._apply = timed_apply
    plmod.read_source = timed_read

    try:
        for yaml_name in ("fineweb_style_recipe.yaml", "gopher_style_recipe.yaml"):
            times.clear()
            path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", yaml_name)
            totals = []
            for _ in range(reps):
                pipe = Pipeline(PipelineConfig.from_yaml(path))
                t0 = time.perf_counter()
                pipe.build(spark)
                totals.append(time.perf_counter() - t0)
                pipe.release_intermediates()
            print(f"\n=== {yaml_name}: build total min {min(totals)*1000:.1f} ms (reps={reps}) ===")
            rows = sorted(times.items(), key=lambda kv: -min(kv[1]))
            acct = 0.0
            for name, ts in rows:
                per_build = min(ts[i] for i in range(len(ts)))  # min over all calls
                # per-build cost: sum the per-rep slices (ops called once per build)
                n_per = len(ts) // reps
                per_rep = [sum(ts[i * n_per : (i + 1) * n_per]) for i in range(reps)] if n_per else [0.0]
                m = min(per_rep)
                acct += m
                print(f"  {name:55s} min {m*1000:7.1f} ms  (x{n_per}/build)")
            print(f"  {'ACCOUNTED':55s}     {acct*1000:7.1f} ms")
    finally:
        Pipeline._apply = orig_apply
        plmod.read_source = orig_read


if __name__ == "__main__":
    main()
