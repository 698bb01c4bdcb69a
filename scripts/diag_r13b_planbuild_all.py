"""r13 session-2 diag: per-declared-query plan-BUILD latency (no execution).

Times fn(spark, sf) for every declared query — pure driver-side Column/
py4j + analysis cost, the residue the r12 twin batches attacked on the
recipe path. Ranks the remainder so any further twin work is measurement-
driven. min of N builds per query, interleaved rounds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from mega_data_factory_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = e.queries()
    best: dict[str, float] = {}
    for _ in range(3):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sf)
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: BUILD ERROR {ex}")
                continue
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    total = sum(best.values())
    print(f"== plan-build min-of-3 per declared query; total {total:.2f}s")
    for name, dt in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"{name:38s} {dt*1000:8.1f} ms")


if __name__ == "__main__":
    main()
