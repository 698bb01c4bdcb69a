"""Spot-proof for the twin batches' 'executed plans unchanged' claim:
regenerate explain('formatted') for EVERY declared query at HEAD and
diff it against the committed plans/r12/<q>_after.txt modulo expression
ids (#123), cached-plan ids and AQE plan_ids — the same normalization
the round's plan-diff notes use. Prints per-query OK/DRIFT and a
summary; exits nonzero on any drift.

Usage: python scripts/diag_r12_plan_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mega_data_factory_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ID = re.compile(r"#\d+")
PLAN_ID = re.compile(r"plan_id=\d+")
CTE_ID = re.compile(r"CTERelationDef \d+|CTERelationRef \d+")
SUBQ = re.compile(r"(Subquery|subquery)#?\d*")
RESULT_ID = re.compile(r"\[id=#?\d+\]")
# pyspark's _create_lambda appends a fresh per-session suffix to binder
# names (x_51); the binder NAME is display-only (references resolve by
# id) — same fold as tests/test_refiner_expr_parity.py's normalizer
LAMBDA = re.compile(r"lambda ([a-z]+)_\d+")
RDD_ID = re.compile(r"RDD\[\d+\]")


def norm(s: str) -> str:
    s = ID.sub("#", s)
    s = PLAN_ID.sub("plan_id=", s)
    s = CTE_ID.sub(lambda m: m.group(0).split()[0] + " N", s)
    s = SUBQ.sub(lambda m: m.group(0).rstrip("0123456789#") , s)
    s = RESULT_ID.sub("[id=#]", s)
    s = LAMBDA.sub(r"lambda \1", s)
    s = RDD_ID.sub("RDD[N]", s)
    return s


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("diag-plan-drift", cpus=cpus)
    spark.range(1).count()

    import __spark_entry__ as e

    jvm = spark.sparkContext._jvm
    drift = []
    for name, fn in e.queries().items():
        path = os.path.join(REPO, "plans", "r12", f"{name}_after.txt")
        if not os.path.exists(path):
            print(f"{name:34s} NO_FILE")
            drift.append(name)
            continue
        df = fn(spark, sf)
        now = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(path) as f:
            committed = f.read()
        a, b = norm(now).strip(), norm(committed).strip()
        if a == b:
            print(f"{name:34s} OK")
        else:
            print(f"{name:34s} DRIFT")
            la, lb = a.splitlines(), b.splitlines()
            shown = 0
            for x, y in zip(la, lb):
                if x != y and shown < 6:
                    print(f"  now:       {x[:150]}")
                    print(f"  committed: {y[:150]}")
                    shown += 1
            if len(la) != len(lb):
                print(f"  line counts differ: now {len(la)} vs committed {len(lb)}")
            drift.append(name)
    print(f"\n{len(drift)} drifted of {len(e.queries())}: {drift}")
    sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
