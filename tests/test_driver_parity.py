"""Driver-parity session sweep — the round-7 lesson, mechanized.

The engine's own session (tests/conftest get_spark) enables Arrow for
createDataFrame; the driver's correctness gate runs a DEFAULT session
where Arrow is OFF and createDataFrame takes the pickled
`_createFromLocal` path with its strict type verifier. Round 7's
`bloom_pruned_join` regression (operators/bloom.py `_bitmap_df` feeding
numpy.int64 into an array<long> cell) was green in pytest and red in
CORRECTNESS for exactly that reason.

This test runs scripts/driver_parity_sweep.py in a FRESH subprocess — a
SparkSession built exactly the way the driver builds one (no Arrow, no
engine configs) — and requires every registered + retired query to run
to completion (collect). Rows-only by design: the hash-vs-oracle bar
stays on the tuned session; this bar is "no query may depend on session
configuration to run at all".

Reverting the bloom fix makes this test fail (verified during round 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "scripts", "driver_parity_sweep.py")
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_all_queries_run_on_default_session():
    proc = subprocess.run(
        [sys.executable, SWEEP, SF_DIR],
        capture_output=True,
        text=True,
        timeout=880,
        cwd=REPO,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"sweep produced no output; stderr tail:\n{proc.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    assert summary.get("failures") == {}, (
        f"queries failed on the driver-default (Arrow-off) session: "
        f"{json.dumps(summary['failures'], indent=2)[:4000]}"
    )
    assert proc.returncode == 0
    # the sweep must actually cover the registry — guard against a silent
    # import failure reducing it to a no-op
    assert summary.get("ran", 0) >= 50
    # ...and both shipped YAML recipes must have run Pipeline.run to
    # completion on the same default session (round-9 extension)
    assert summary.get("recipes_ran", 0) == 2


def test_createdataframe_nested_numpy_sites_are_safe():
    """Pin the audit of createDataFrame(pandas) call sites: object-dtype
    cells holding numpy integer arrays break the Arrow-off fallback path
    (the r7 bloom bug). bloom._bitmap_df now converts at the boundary;
    dsir/profiling pass flat dtypes or Python values. This unit check
    exercises the exact conversion bloom does, without Spark."""
    import numpy as np

    from mega_data_factory_spark.operators.bloom import BloomFilter

    bf = BloomFilter(num_bits=128, num_hashes=2)
    bf.bits = np.array([1, 2], dtype=np.int64)
    cell = bf.bits.tolist()
    assert all(type(x) is int for x in cell)
