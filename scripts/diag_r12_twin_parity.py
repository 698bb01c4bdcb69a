"""One-off check: does the LanguageIdRefiner SQL-text twin analyze to the
same tree as the composed-Column path (modulo expression ids)?"""

from __future__ import annotations

import re

from mega_data_factory_spark.session import get_spark

spark = get_spark("diag-twin-parity", cpus=4)

import mega_data_factory_spark.functions.text as T
import mega_data_factory_spark.operators.refiners as R

df = spark.createDataFrame([(1, "the cat el la der le")], "id long, text string")


def analyzed(sel):
    return sel._jdf.queryExecution().analyzed().toString()


def norm(s: str) -> str:
    s = re.sub(r"#\d+", "#N", s)
    return s


ref = R.LanguageIdRefiner(text_col="text")
fast_cols = ref.columns(df)
sel_fast = df.select(*[c.alias(k) for k, c in fast_cols.items()])

# force the composed path by disabling the plain-column detector
orig = R.sql_plain_column
R.sql_plain_column = lambda c: None
try:
    slow_cols = ref.columns(df)
finally:
    R.sql_plain_column = orig
sel_slow = df.select(*[c.alias(k) for k, c in slow_cols.items()])

a, b = norm(analyzed(sel_fast)), norm(analyzed(sel_slow))
print("FAST == SLOW (analyzed, ids stripped):", a == b)
if a != b:
    import difflib

    for line in difflib.unified_diff(b.splitlines(), a.splitlines(), "slow", "fast", lineterm=""):
        print(line)

# value parity too
print("fast rows:", sel_fast.collect())
print("slow rows:", sel_slow.collect())
spark.stop()
