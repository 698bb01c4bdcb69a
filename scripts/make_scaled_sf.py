"""Replicate the sf0.1 test tables N-fold with key offsets into a local
scale dir, preserving join integrity, so bench.py can produce a larger-SF
datapoint (`python bench.py --sf /root/repo/.localdata/sf1`).

Replication semantics (documented because they shape the workload):
  * region/nation are fixed-cardinality dims — copied once;
  * customer/supplier/part/orders/lineitem get their primary AND foreign
    keys offset by replica*OFF, so every join fans out exactly as a real
    10x corpus would (no cross-replica key collisions, no dangling fks);
  * events keeps user_id UNCHANGED — 10x events per user makes the Zipfian
    user keys hotter, which is precisely the skew the salted aggregation
    is meant to absorb at scale;
  * documents suffix every word with the replica id, so each replica is a
    DISTINCT corpus whose shingle document-frequency distribution matches
    replica 0's (shingles never cross replicas) — the n-gram/minhash
    workload scales 10x in volume without degenerating (exact copies would
    push every shingle past any DF cap and erase the candidate join);
  * embeddings offset only their ids: replica vectors are exact duplicates
    (cosine 1.0) — the realistic re-scrape shape for the cosine dedup path.

File layout (round-7 fix): each replicated table is written as a DIRECTORY
`{table}.parquet/` of >=32 part files, one COPY per (replica, shard). A
single-file layout caps Spark's scan parallelism at the file's row-group
split count (measured: 15 splits on sf10 documents -> 2.7x slower scans
than a 32-file layout, scripts/diag_scan_parallelism.out), which mispriced
url_filter_full / text_exact_dedup in the 100x sweep. Any real 10 TB corpus
arrives as thousands of files — multi-file is the honest shape, and it is
the reference's own sharding model (framework/executor.py:237-310: work is
split file-per-worker). Spark reads the directory natively; DuckDB oracles
read `{table}.parquet/*.parquet` (scripts/oracle_gate.py handles both).

Usage: python scripts/make_scaled_sf.py [factor] [out_dir]
"""

from __future__ import annotations

import math
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
MIN_FILES = 32  # match local[32]; a real corpus has far more

COPY_ONCE = ["region", "nation"]

# table -> list of (column, is_key) where keys get + r*OFF
KEYED = {
    "customer": [("c_custkey", True), ("c_name", False), ("c_nationkey", False), ("c_acctbal", False), ("c_mktsegment", False)],
    "supplier": [("s_suppkey", True), ("s_name", False), ("s_nationkey", False), ("s_acctbal", False)],
    "part": [("p_partkey", True), ("p_name", False), ("p_brand", False), ("p_type", False), ("p_size", False), ("p_retailprice", False)],
    "orders": [("o_orderkey", True), ("o_custkey", True), ("o_orderstatus", False), ("o_totalprice", False), ("o_orderdate", False), ("o_orderpriority", False)],
    "lineitem": [("l_orderkey", True), ("l_partkey", True), ("l_suppkey", True), ("l_linenumber", False), ("l_quantity", False), ("l_extendedprice", False), ("l_discount", False), ("l_tax", False), ("l_returnflag", False), ("l_linestatus", False), ("l_shipdate", False)],
    "events": [("event_id", True), ("ts", False), ("user_id", False), ("event_type", False), ("value", False), ("props", False)],
    "documents": [("doc_id", True), ("text", False), ("lang", False), ("source", False), ("n_chars", False)],
    "embeddings": [("vec_id", True), ("embedding", False), ("label", False)],
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    # shards per replica so every table lands with >= MIN_FILES part files;
    # the shard predicate hashes the primary key, so part files are
    # hash-balanced (no skewed stragglers at scan time).
    shards = max(1, math.ceil(MIN_FILES / factor))
    for t, cols in KEYED.items():
        pk = cols[0][0]
        proj = ", ".join(f"{c} + r * {OFF} AS {c}" if k else c for c, k in cols)
        if t == "documents":
            proj = proj.replace(
                "text,",
                "regexp_replace(text, '([A-Za-z0-9]+)', '\\1' || r, 'g') AS text,",
            )
        dst = f"{out}/{t}.parquet"
        if os.path.isfile(dst):
            os.remove(dst)  # replace any old single-file layout
        elif os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(dst)
        for r in range(factor):
            for s in range(shards):
                shard_pred = f" WHERE hash({pk}) % {shards} = {s}" if shards > 1 else ""
                con.execute(
                    f"COPY (SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet'), "
                    f"range({r}, {r + 1}) _r(r){shard_pred}) "
                    f"TO '{dst}/part-{r:04d}-{s:02d}.parquet' (FORMAT PARQUET)"
                )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/*.parquet')").fetchone()[0]
        print(t, f"x{factor} -> {n} rows in {factor * shards} files")


if __name__ == "__main__":
    main()
