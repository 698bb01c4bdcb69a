"""Physical-plan lint — the audit the scale posture is built on, runnable
on any config before it touches a cluster.

Every rule here encodes a measured lesson from this repo's own plan
reviews (README "Scale design"): row-at-a-time Python UDFs are the 10-100x
slow path vs Arrow (`BatchEvalPython` must never appear — a pytest sweep
already asserts it for every registered query; this makes the same check
available for USER configs), `CartesianProduct` means a join lost its
equi-condition, and shuffle/Arrow-crossing counts are the first numbers a
plan review asks for. Scans are summarized with their pushed filters and
read-schema width so an un-pruned 30-column read for a 3-column pipeline
is visible at a glance.

Informational, not a straitjacket: `failures` (lint fails) is reserved for
the two always-wrong shapes; everything else lands in `counts`/`scans`
for human judgment.
"""

from __future__ import annotations

import re


def lint_plan(plan: str) -> dict:
    """Grade a formatted physical plan string (``df.explain("formatted")``
    / ``Pipeline.explain``). Returns ``{ok, failures, counts, scans}``."""
    failures = []
    if "BatchEvalPython" in plan:
        failures.append(
            "row-at-a-time Python UDF (BatchEvalPython): use built-in Columns or an "
            "Arrow-batched pandas_udf/mapInPandas — 10-100x the throughput"
        )
    if "CartesianProduct" in plan:
        failures.append(
            "CartesianProduct: a join lost its equi-condition (O(n*m) at scale); "
            "add the key equality or an explicit broadcast"
        )
    counts = {
        # regexes whose PATTERN leads with a consuming boundary
        # alternation ('(^|[^...])word...') force Java's engine to attempt
        # the boundary at every text position — measured 22-151 s over
        # 500k docs where the literal-led lookaround / tokenize-once forms
        # run in ~1 s (the round-8 gopher-stopword and C4-badword fixes).
        # Informational: plan strings embed the pattern literals, so a
        # reintroduction shows up here in any `validate --lint` run.
        "leading_boundary_regexes": len(re.findall(r"\(\?\:\^\|\[|\(\^\|\[", plan)),
        # broadcast exchanges are usually the GOOD kind — split them out
        "shuffle_exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcast_exchanges": len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)),
        "arrow_python_crossings": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        # simple mode prints "WholeStageCodegen (N)" wrappers; formatted
        # mode tags operators with "[codegen id : N]" — count either.
        # Best-effort: under AQE a PRE-execution formatted plan carries no
        # codegen annotations at all (they appear once stages compile), so
        # 0 here means "not annotated", not "interpreted"
        "whole_stage_codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"codegen id : (\d+)", plan))
        ),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        # expression-tree duplication canary (round-10 fineweb lesson): a
        # pushed-down filter inlines the authored column tree into an
        # interpreted predicate when the surrounding Project holds HOFs
        # (CodegenFallback — no subexpression elimination), so every
        # internal copy of split/regexp_replace re-scans the text per row
        # (measured 127.6s -> 10.4s on the fineweb quality stage at sf10
        # after binding base signals once as lambda variables,
        # operators/refiners.py). Informational: a climbing count in a
        # recipe plan means an operator reintroduced a nested authored
        # tree.
        "regexp_replace_sites": plan.count("regexp_replace"),
    }
    scans = []
    # formatted-mode scan blocks: "(1) Scan parquet ..." followed by
    # indented attribute lines until the next "(n)" header
    for m in re.finditer(r"\(\d+\) Scan (\w+)([\s\S]*?)(?=\n\(\d+\)|\Z)", plan):
        fmt, block = m.group(1), m.group(2)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        n_cols = len([c for c in (schema.group(1).split(",") if schema else []) if c.strip()])
        scans.append(
            {
                "format": fmt,
                "pushed_filters": (pushed.group(1).strip() if pushed else ""),
                "read_columns": n_cols,
            }
        )
    return {"ok": not failures, "failures": failures, "counts": counts, "scans": scans}
