"""Iteration helper (exec'd inside a live REPL): reload text/refiners and
diff fast-vs-composed analyzed plans for every twin refiner. Not a test —
tests/test_refiner_expr_parity.py is the committed bar."""

import difflib
import importlib
import re

import mega_data_factory_spark.functions.text as T
import mega_data_factory_spark.operators.refiners as R

importlib.reload(T)
importlib.reload(R)

ROWS = [
    (0, "the cat and the hat el la de que der die und das le les et des"),
    (1, "repeat line\nrepeat line\nrepeat line\nunique tail line here"),
    (2, "it's a 'quoted' back\\slash c++ a.b [set] (paren) #tag ..."),
    (3, "• bullet one\n- bullet two\nends with ellipsis...\nplain line."),
    (4, "Tür tür TÜR déjà vu … naïve"),
    (5, "word " * 50 + "word"),
    (6, ""),
    (7, None),
]

from pyspark.sql import functions as F  # noqa: E402

df = spark.createDataFrame(ROWS, "doc_id long, text string").withColumn(  # noqa: F821
    "n_chars", F.when(F.col("doc_id") % 2 == 0, F.length("text"))
)

MAKERS = [
    ("TextStats", lambda: R.TextStatsRefiner()),
    ("TextStats-lencol", lambda: R.TextStatsRefiner(length_col="n_chars")),
    ("LanguageId", lambda: R.LanguageIdRefiner()),
    ("QualityScore", lambda: R.QualityScoreRefiner()),
    ("Gopher", lambda: R.GopherQualityRefiner()),
    ("RepetitionStats", lambda: R.RepetitionStatsRefiner()),
    ("IntraDocDedup", lambda: R.IntraDocDedupRefiner()),
    ("IntraDocDedup-sep", lambda: R.IntraDocDedupRefiner(sep=". ", min_unit_chars=4, out_col="td")),
]


def _analyzed(d):
    return d._jdf.queryExecution().analyzed().toString()


def _norm(plan):
    plan = re.sub(r"#\d+", "#N", plan)
    return re.sub(r"lambda ([xyz])_\d+", r"lambda \1", plan)


for name, make in MAKERS:
    if not hasattr(make(), "_columns_sql"):
        print(f"{name}: NO TWIN YET")
        continue
    fast = make().apply(df)
    orig = R.sql_plain_column
    R.sql_plain_column = lambda c: None
    try:
        slow = make().apply(df)
    finally:
        R.sql_plain_column = orig
    a, b = _norm(_analyzed(fast)), _norm(_analyzed(slow))
    if a == b:
        vf = [tuple(str(v) for v in r) for r in fast.orderBy("doc_id").collect()]
        vs = [tuple(str(v) for v in r) for r in slow.orderBy("doc_id").collect()]
        print(f"{name}: TREE OK, values {'OK' if vf == vs else 'MISMATCH'}")
        if vf != vs:
            for x, y in zip(vf, vs):
                if x != y:
                    print("  fast:", x)
                    print("  slow:", y)
    else:
        print(f"{name}: TREE DIFF")
        for line in difflib.unified_diff(
            b.splitlines(), a.splitlines(), "slow", "fast", lineterm="", n=1
        ):
            print("  " + line)
print("DONE")
