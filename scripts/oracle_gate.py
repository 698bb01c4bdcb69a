"""Driver-style correctness gate, runnable at any scale dir.

Mirrors the round driver's CORRECTNESS check: every `queries()` entry runs
on Spark, its `oracle_sql()` twin on DuckDB over the same parquet views,
compared on sorted column names + stringified sorted rows.

    python scripts/oracle_gate.py                      # sf0.01, all queries
    python scripts/oracle_gate.py --sf /root/repo/.localdata/sf1 \
        --only q1_pricing_summary,events_type_stats
    python scripts/oracle_gate.py --sf ... --skip-quadratic

--skip-quadratic drops the oracles that are all-pairs SQL by construction
(near-dedup families): their DuckDB side is O(n^2) and intentionally sized
for the sf0.01 driver gate, not for scale dirs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# all-pairs (or otherwise superlinear) DuckDB formulations — driver-gate-sized
QUADRATIC_ORACLES = {
    "minhash_lsh_dedup",
    "simhash_near_dedup",
    "ngram_jaccard_dedup",
    "embedding_cosine_dedup",
    "parts_price_range_join",
    # the Spark plan is broadcast-matmul (linear); only the DuckDB mirror
    # is an all-pairs cross join
    "semantic_decontamination",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip-quadratic", action="store_true")
    ap.add_argument(
        "--json-out",
        default=None,
        help="write a machine-readable {sf, ok, bad, skipped, per_query} summary "
        "(consumed by scripts/patch_bench_scale_notes.py so BENCH_SCALE "
        "correctness fields are gate-derived, not hand-transcribed)",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from mega_data_factory_spark.session import TABLES, get_spark

    spark = get_spark("mdf-oracle-gate", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.isdir(path):
            # multi-file layout from make_scaled_sf.py: a directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')")
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, osql = e.queries(), e.oracle_sql()
    if args.only:
        # --only may name queries rotated out of the 50-row driver window
        # (plans.retired_queries keep their oracle bar — e.g. the sf10
        # decimal-family list pins cube_status_priority, retired in wave 6)
        from mega_data_factory_spark.plans import retired_oracles, retired_queries

        qs = {**qs, **retired_queries()}
        osql = {**osql, **retired_oracles()}
    names = args.only.split(",") if args.only else list(qs)
    bad = ok = skipped = 0
    per_query: dict[str, str] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: unknown query", file=sys.stderr)
            bad += 1
            per_query[name] = "UNKNOWN"
            continue
        if name not in osql:
            skipped += 1
            per_query[name] = "SKIP(no_oracle)"
            continue
        if args.skip_quadratic and name in QUADRATIC_ORACLES:
            skipped += 1
            per_query[name] = "SKIP(quadratic)"
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(str(r[c]) for c in scols) for r in sdf.collect())
            res = con.execute(osql[name])
            dcols_raw = [d[0] for d in res.description]
            order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            drows = sorted(tuple(str(row[i]) for i in order) for row in res.fetchall())
            good = scols == [dcols_raw[i] for i in order] and srows == drows
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:200], flush=True)
            bad += 1
            per_query[name] = f"ERROR({type(exc).__name__})"
            continue
        if good:
            ok += 1
            per_query[name] = "OK"
            print(f"{name}: OK ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)
        else:
            bad += 1
            per_query[name] = f"MISMATCH({len(srows)}v{len(drows)})"
            print(f"{name}: MISMATCH ({len(srows)} vs {len(drows)} rows)", flush=True)
    summary = f"gate @ {args.sf}: {ok} OK, {bad} bad, {skipped} skipped (rows-only/quadratic)"
    print(summary)
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "sf": args.sf,
                    "gate_cmd": " ".join(sys.argv),
                    "ok": ok,
                    "bad": bad,
                    "skipped": skipped,
                    "summary": summary,
                    "per_query": per_query,
                },
                f,
                indent=1,
            )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
