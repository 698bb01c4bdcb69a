"""Regenerate the README's live counts — query registry, oracle coverage,
test-suite size, bench totals — so they never drift by hand again (two
round-6 commits edited them manually; VERDICT r6 housekeeping).

Prints one JSON object plus the exact README phrases to paste. Read-only:
it does NOT rewrite README.md (the numbers land in prose whose wording
changes round to round — the script's job is making the FACTS mechanical
and checkable, `python scripts/readme_counts.py`).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from mega_data_factory_spark.plans import all_oracles, all_queries, retired_queries

    qs, ors = all_queries(), all_oracles()
    rows_only = sorted(set(qs) - set(ors))

    # collected test count (no execution — the pass count comes from the
    # committed CI-style full run, but collection catches drift instantly)
    collect = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    m = re.search(r"(\d+) tests collected", collect.stdout + collect.stderr)
    n_tests = int(m.group(1)) if m else None

    latest_bench = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    bench = json.load(open(latest_bench[-1])) if latest_bench else {}
    if "parsed" in bench:  # driver wrapper shape: the bench JSON line sits under 'parsed'
        bench = bench.get("parsed") or {}
    scale_path = os.path.join(REPO, "BENCH_SCALE.json")
    scale = json.load(open(scale_path)) if os.path.exists(scale_path) else {}

    facts = {
        "queries_registered": len(qs),
        "queries_oracle_matched": len(qs) - len(rows_only),
        "queries_rows_only": rows_only,
        "queries_retired_but_tested": sorted(retired_queries()),
        "tests_collected": n_tests,
        "bench_file": os.path.basename(latest_bench[-1]) if latest_bench else None,
        "bench_total_sec": bench.get("value"),
        "bench_query_count": len(bench.get("queries", {})),
        "scale_total_slope_10x": scale.get("total_slope_10x"),
        "scale_total_slope_100x": scale.get("total_slope_100x"),
    }
    print(json.dumps(facts, indent=1))
    print()
    print("README phrases:")
    print(f"  {facts['queries_oracle_matched']} of the {facts['queries_registered']} registered queries are oracle-matched")
    print(f"  ({len(rows_only)} rows-only: {', '.join(rows_only)})")
    if n_tests is not None:
        print(f"  python -m pytest tests/ -q ({n_tests} collected)")
    if facts["bench_total_sec"] is not None:
        print(f"  {facts['bench_total_sec']} s total across {facts['bench_query_count']} headline queries ({facts['bench_file']})")
    if facts["scale_total_slope_100x"] is not None:
        print(f"  100x the data in {facts['scale_total_slope_100x']}x the wall time")


if __name__ == "__main__":
    main()
