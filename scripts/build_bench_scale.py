"""Compose BENCH_SCALE.json from bench.py runs (sf0.1 / sf1 / sf10 legs).

Usage:
    python scripts/build_bench_scale.py SF01 SF1 SF10
    # each arg is one leg file or a comma-separated group of legs:
    python scripts/build_bench_scale.py sf01a.json,sf01b.json \
        sf1a.json,sf1b.json sf10a.json,sf10b.json

Reads the single-line bench JSONs (produced by `python bench.py --sf
0.1`, `--sf /root/repo/.localdata/sf1`, `--sf /root/repo/.localdata/sf10`
after `scripts/make_scaled_sf.py 10|100`), computes per-query and total
wall-time slopes, and writes BENCH_SCALE.json preserving the correctness
sections (which come from scripts/oracle_gate.py runs, recorded separately).

Multi-leg points are the per-line MIN across legs (round-9 methodology:
this host's episodic slow mode moves CPU-heavy lines ±40% between
otherwise-clean runs — scripts/diag_episodic.out — and min across clean
legs exposes the algorithmic cost the slope artifact measures). Round-10
advice applied:
  * run the SAME leg count at every scale so the slope numerator and
    denominator are built by the same estimator (the sweep script passes
    2 legs per scale; this tool accepts any count per point);
  * a merged point keeps ONLY {metric, unit, sf, queries, value} plus
    `legs_merged` provenance and each raw leg's total (`leg_totals`), so
    ancillary per-leg diagnostics (spreads, reruns, host_state) cannot be
    misattributed across legs — read the raw leg JSONs in
    scripts/evidence_r{N}/ for those.
"""

from __future__ import annotations

import json
import sys


def _load_point(arg: str) -> dict:
    paths = [p for p in arg.split(",") if p]
    legs = [json.load(open(p)) for p in paths]
    if len(legs) == 1:
        return legs[0]
    queries: dict[str, float] = {}
    for leg in legs:
        for k, v in leg["queries"].items():
            queries[k] = min(queries.get(k, v), v)
    return {
        # only the identity fields every leg shares — no leg-0 ancillary
        # diagnostics (spreads/reruns/host_state) that the other legs
        # didn't produce
        "metric": legs[0].get("metric"),
        "unit": legs[0].get("unit"),
        "sf": legs[0].get("sf"),
        "queries": queries,
        "value": round(sum(queries.values()), 4),
        "legs_merged": (
            f"per-line min of {len(legs)} isolated legs ({', '.join(paths)}) — "
            "raw legs carry the per-run diagnostics"
        ),
        "leg_totals": [round(float(leg["value"]), 4) for leg in legs],
    }


def main() -> None:
    sf01 = _load_point(sys.argv[1])
    sf1 = _load_point(sys.argv[2])
    sf10 = _load_point(sys.argv[3])

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
