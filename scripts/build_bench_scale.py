"""Compose BENCH_SCALE.json from three bench.py runs (sf0.1 / sf1 / sf10).

Usage:
    python scripts/build_bench_scale.py sf01.json sf1.json sf10.json

Reads the three single-line bench JSONs (produced by `python bench.py --sf
0.1`, `--sf /root/repo/.localdata/sf1`, `--sf /root/repo/.localdata/sf10`
after `scripts/make_scaled_sf.py 10|100`), computes per-query and total
wall-time slopes, and writes BENCH_SCALE.json preserving the correctness
sections (which come from scripts/oracle_gate.py runs, recorded separately).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    p01, p1, p10 = sys.argv[1:4]
    sf01 = json.load(open(p01))
    sf1 = json.load(open(p1))
    sf10 = json.load(open(p10))

    def slopes(base, other):
        return {
            k: round(other["queries"][k] / base["queries"][k], 2)
            for k in other["queries"]
            if k in base["queries"] and base["queries"][k] > 0
        }

    try:
        old = json.load(open("BENCH_SCALE.json"))
    except FileNotFoundError:
        old = {}

    out = {
        "note": old.get("note", ""),
        "sf0.1": sf01,
        "sf1": sf1,
        "slope_10x": slopes(sf01, sf1),
        "total_slope_10x": round(sf1["value"] / sf01["value"], 2),
        "correctness_at_10x": old.get("correctness_at_10x"),
        "sf10": sf10,
        "slope_100x": slopes(sf01, sf10),
        "total_slope_100x": round(sf10["value"] / sf01["value"], 2),
        "note_100x": old.get("note_100x", ""),
        "correctness_at_100x": old.get("correctness_at_100x"),
    }
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("total slopes: 10x =", out["total_slope_10x"], "100x =", out["total_slope_100x"])
    worst = sorted(out["slope_100x"].items(), key=lambda kv: -kv[1])[:5]
    print("steepest at 100x:", worst)


if __name__ == "__main__":
    main()
