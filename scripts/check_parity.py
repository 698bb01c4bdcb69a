"""Strict driver-mimicking correctness check.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, converts BOTH results to pandas exactly like the driver does
(``DataFrame.toPandas()`` vs ``duckdb .df()``), sorts columns by name, and
compares row count, column names, *pandas dtypes*, and a canonical
value-hash that is representation-sensitive (decimal.Decimal("1.000000")
!= 1.0) — the failure mode the round-1 driver exposed that our tolerant
pytest oracle check missed.

Usage:  python scripts/check_parity.py [query ...]   (default: all)
Env:    SPARK_GRAFT_PARITY_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_cell(v):
    """Canonical, representation-sensitive string for one cell.

    Mirrors the evidence from CORRECTNESS_r01: the driver's hash treats
    int32 == int64 and datetime64[ns] == datetime64[us] as equal (str-like
    canonicalization) but decimal.Decimal("1.000000") != 1.0 and 3 != 3.0
    (DuckDB HUGEINT -> float64) as different.
    """
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, (np.integer,)):
        return f"int:{int(v)}"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return f"bool:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "<nan>" if f != f else f"float:{f!r}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, decimal.Decimal):
        return f"Decimal:{v}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "arr:[" + ",".join(canon_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v!r}"


def frame_hash(df: pd.DataFrame) -> tuple[str, list[str], list[str]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False, name=None):
        rows.append("|".join(canon_cell(v) for v in row))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return h, cols, [str(df[c].dtype) for c in cols]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    from mega_data_factory_spark.plans import all_oracles, all_queries
    from mega_data_factory_spark.session import TABLES, get_spark

    spark = get_spark("parity-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs, oracles = all_queries(), all_oracles()

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dkdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sh, scols, sdt = frame_hash(spdf)
        dh, dcols, ddt = frame_hash(dkdf)
        probs = []
        if len(spdf) != len(dkdf):
            probs.append(f"rows {len(spdf)} vs {len(dkdf)}")
        if scols != dcols:
            probs.append(f"cols {scols} vs {dcols}")
        if sh != dh and not probs:
            probs.append(f"dtypes {[z for z in zip(scols, sdt, ddt) if z[1] != z[2]]}")
            # find first differing cell for the report
            detail = ""
            srows = sorted("|".join(canon_cell(v) for v in r) for r in spdf[scols].itertuples(index=False, name=None))
            drows = sorted("|".join(canon_cell(v) for v in r) for r in dkdf[dcols].itertuples(index=False, name=None))
            for a, b in zip(srows, drows):
                if a != b:
                    detail = f" first-diff spark={a[:160]} duck={b[:160]}"
                    break
            probs.append(f"hash {sh} vs {dh}{detail}")
        if probs:
            print(f"FAIL {name}: {'; '.join(probs)}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(spdf)} rows hash={sh} ({time.time()-t0:.1f}s)")

    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
