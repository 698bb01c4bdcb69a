"""Compose BENCH_SCALE.json from bench.py runs (sf0.1 / sf1 / sf10 legs).

Usage:
    python scripts/build_bench_scale.py sf01.json sf1.json sf10.json [sf10b.json ...]

Reads the single-line bench JSONs (produced by `python bench.py --sf
0.1`, `--sf /root/repo/.localdata/sf1`, `--sf /root/repo/.localdata/sf10`
after `scripts/make_scaled_sf.py 10|100`), computes per-query and total
wall-time slopes, and writes BENCH_SCALE.json preserving the correctness
sections (which come from scripts/oracle_gate.py runs, recorded separately).

When MORE THAN ONE sf10 leg is given, the sf10 point is the per-line MIN
across the legs, annotated with a `legs_merged` provenance field (round-9
methodology: this host's episodic slow mode moves CPU-heavy lines ±40%
between otherwise-clean runs — scripts/diag_episodic.out — and min across
clean legs exposes the algorithmic cost the slope artifact measures; keep
every raw leg in scripts/evidence_r{N}/).
"""

from __future__ import annotations

import json
import sys


def _min_merge(paths: list[str]) -> dict:
    legs = [json.load(open(p)) for p in paths]
    if len(legs) == 1:
        return legs[0]
    merged = dict(legs[0])
    queries: dict[str, float] = {}
    for leg in legs:
        for k, v in leg["queries"].items():
            queries[k] = min(queries.get(k, v), v)
    merged["queries"] = queries
    merged["value"] = round(sum(queries.values()), 4)
    merged["legs_merged"] = (
        f"per-line min of {len(legs)} isolated sf10 legs ({', '.join(paths)}) — "
        "see BENCH_SCALE note_100x"
    )
    return merged


def main() -> None:
    p01, p1 = sys.argv[1:3]
    sf01 = json.load(open(p01))
    sf1 = json.load(open(p1))
    sf10 = _min_merge(sys.argv[3:])

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
