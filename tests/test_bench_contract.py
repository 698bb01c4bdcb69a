"""Import-level contract checks for bench.py — the driver's second runtime
surface. These run no Spark jobs: they pin the invariants a refactor could
silently break (the round-12 block-runner rewrite is exactly the kind of
change these guard), so a broken bench fails in pytest instead of erroring
half-way through a 6-leg evidence sweep.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 - module import must be side-effect free (no SparkSession)


def test_headline_names_resolve_in_the_registry():
    """Every HEADLINE name must exist in the registered-or-retired query
    set — the bench loop silently skips unknown names (fn is None), so a
    registry rename would quietly drop a published line."""
    from mega_data_factory_spark.plans import all_queries, retired_queries

    known = set(all_queries()) | set(retired_queries())
    missing = [n for n in bench.HEADLINE if n not in known]
    assert not missing, f"HEADLINE names not in the registry: {missing}"


def test_reference_timings_env_override(tmp_path, monkeypatch):
    """SPARK_GRAFT_SCALE_REF points the contention yardstick at any JSON
    (how the post-run re-measure sweep is exercised deterministically);
    a missing/garbage file must degrade to an empty yardstick, never
    crash the bench."""
    ref = tmp_path / "scale.json"
    ref.write_text(json.dumps({"sf0.1": {"queries": {"q1_pricing_summary": 0.5}}}))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_REF", str(ref))
    assert bench._reference_timings() == {"q1_pricing_summary": 0.5}
    monkeypatch.setenv("SPARK_GRAFT_SCALE_REF", str(tmp_path / "nope.json"))
    assert bench._reference_timings() == {}


def test_wait_quiet_is_bounded():
    """A zero budget returns immediately regardless of host load — the
    drain gates (startup + post-run) must never hang a bench run."""
    assert bench._wait_quiet(0.0) == 0.0


def test_shipped_yardstick_covers_the_headline_surface():
    """The committed BENCH_SCALE.json must carry an sf0.1 timing for every
    headline-loop line, or the contention guard silently stops watching
    that line (flags fire only for names present in the yardstick)."""
    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_SCALE.json")
    if not os.path.exists(path):
        pytest.skip("no committed BENCH_SCALE.json in this checkout")
    with open(path) as f:
        yardstick = json.load(f)["sf0.1"]["queries"]
    missing = [n for n in bench.HEADLINE if n not in yardstick]
    assert not missing, f"yardstick missing headline lines: {missing}"


def test_wait_probe_nominal_is_bounded():
    """The round-13 escalated drain polls the multi-core probe; a zero
    budget must return after at most one probe (no sleep loop), so the
    episode gate can never hang a bench run."""
    waited, probe = bench._wait_probe_nominal(0.0)
    assert waited == 0.0
    assert probe > 0.0  # one real probe reading was taken
