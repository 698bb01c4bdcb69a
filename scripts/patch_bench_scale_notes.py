"""BENCH_SCALE note/correctness refresh (run after build_bench_scale).

Usage: python scripts/patch_bench_scale_notes.py <gate10.json> <gate100.json>
Each argument is the --json-out file written by scripts/oracle_gate.py, so
the correctness fields in BENCH_SCALE.json are MACHINE-DERIVED from the gate
run (ok/bad/skipped counts parsed from the artifact), never hand-typed. The
gate's own one-line summary rides along as a human-readable note.
"""

from __future__ import annotations

import json
import sys

NOTE = (
    "wall-time scaling at 10x/100x data volume (sf0.1 -> replicated sf1/sf10, "
    "scripts/make_scaled_sf.py; key-offset replication preserves join fanout, documents "
    "perturbed per-replica so shingle DF distribution is scale-invariant; every scaled "
    "table lands as >=32 hash-balanced parquet part files). slope = t(sfN)/t(sf0.1); "
    "10*N = linear on fixed cores, 1.0 = flat. local[32], min-of-2 timing. Round-9 "
    "additions: fineweb_recipe_pipeline (the second shipped recipe — URL/cleanup/PII/"
    "two-dedup heavy mix — end to end through Pipeline.run, lint-gated like the Gopher "
    "line) and gopher_recipe_published (sf0.1 only: the Gopher recipe with the "
    "published Rae et al. thresholds EXACTLY as shipped, zero overrides). The "
    "cross-scale recipe lines run with corpus-shaped thresholds; EVERY delta vs the "
    "shipped YAML is machine-recorded per line in BENCH_DETAIL.json "
    "recipe_threshold_deltas — gopher: GopherQualityFilter(min_words=10, "
    "min_stopwords=0), DupWordCut hi=1.0, TopBigramCut hi=1.0, LanguageCut lo=0; "
    "fineweb: language NumericRangeFilter lo=0, QualityScoreCut lo=0, "
    "GopherRepetitionCut hi=1.0 (the synthetic corpus is stopword-free soup and the "
    "scaled fixtures replica-suffix every word, erasing the statistics those cuts key "
    "on; unrelaxed, stage 1-2 would cut ~100% and later stages would measure empty "
    "input). bench.py now also contention-guards itself: pre/post host_state "
    "(loadavg + foreign-JVM scan), automatic extra passes for lines >1.5x their "
    "isolated counterpart here, and a contended flag in the compact artifact "
    "(scripts/diag_classifier.out: an orphaned bench JVM is exactly what made the r7 "
    "quality_classifier_1m sweep legs read 13 s against a ~5 s idle-host baseline). "
    "Each scale measured in isolation, pgrep-verified; fixed-size workload lines "
    "(text_pipeline_1m, pq_ann_500k, image_pipeline_100k) bound residual drift."
)

NOTE_100X = (
    "sf10 = 100x rows via key-offset replication, 100 part files per table; "
    "quadratic-oracle dedup rows excluded from the gate (their DuckDB mirrors are "
    "all-pairs by construction), their SPARK plans run in the bench above — the "
    "inverted-index/banded families stay flat-to-sublinear. Attributed steep slopes: "
    "span_corruption_export/token_shard_export are super-linear WORK (tokens/doc rises "
    "with the replication salt); the q5 family is the suite's one fact-fact join "
    "(linear join work on fixed cores; the shipped bucketed layout keeps its ~1.5-1.9x "
    "per-join advantage at sf10); column_profile is the honest full-scan mode beside "
    "column_profile_sketch's flat fixed-byte sample; the recipe lines do linear "
    "whole-pipeline work on 100x docs (per-record throughput RISES with scale as "
    "fixed costs amortize). Both recipe bench copies run relaxed thresholds at every "
    "scale for slope comparability — the full per-line delta list is in "
    "BENCH_DETAIL.json recipe_threshold_deltas and the NOTE above; the published "
    "thresholds stay in the shipped YAMLs (pytest funnels) and are timed as shipped "
    "by the sf0.1-only gopher_recipe_published line. Round-9 sf10 methodology: the "
    "sf10 point is the per-line MIN across the sf10 legs passed to "
    "build_bench_scale.py (two in round 9, both pgrep-clean with nominal cpu probes) "
    "— this host shows an episodic slow mode (scripts/diag_episodic.out) that moves "
    "CPU-heavy lines ±40% between otherwise-clean runs (leg A: semantic_dedup 23.1 s "
    "vs leg B 14.4 s; leg B: gopher_recipe 43.2 s vs leg A 27.7 s); per-line min "
    "across clean legs exposes the algorithmic cost the slope artifact exists to "
    "measure, the merged leg carries a legs_merged provenance field, and every raw "
    "leg JSON ships in scripts/evidence_r9/. bench.py host_state also records a "
    "fixed-work single-thread CPU probe (~0.17 s nominal here) at start/end and "
    "beside any stuck-slow line, so a reader can tell a host episode from a plan "
    "regression without re-running. fineweb_recipe_pipeline's steep slope is "
    "fixed-cost amortization, not super-linear work: per-record throughput RISES "
    "~12x from sf0.1 (5k docs, overhead-dominated) to sf10 (500k docs)."
)


def _gate_block(json_path: str) -> dict:
    """Parse an oracle_gate --json-out artifact into the BENCH_SCALE
    correctness block: counts are machine-derived; the gate's command line
    and summary string are carried as provenance."""
    with open(json_path) as f:
        g = json.load(f)
    return {
        "gate": g["gate_cmd"],
        "ok": g["ok"],
        "bad": g["bad"],
        "skipped": g["skipped"],
        "result": g["summary"],
        "failing": sorted(
            name
            for name, status in g.get("per_query", {}).items()
            if status not in ("OK",) and not status.startswith("SKIP")
        ),
    }


def main() -> None:
    with open("BENCH_SCALE.json") as f:
        d = json.load(f)
    d["note"] = NOTE
    d["note_100x"] = NOTE_100X
    if len(sys.argv) > 1:
        d["correctness_at_10x"] = _gate_block(sys.argv[1])
    if len(sys.argv) > 2:
        d["correctness_at_100x"] = _gate_block(sys.argv[2])
    with open("BENCH_SCALE.json", "w") as f:
        json.dump(d, f, indent=1)
    print("patched")


if __name__ == "__main__":
    main()
