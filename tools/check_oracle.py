"""Local twin of the driver's correctness gate: runs each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compares row count + column names + order-
insensitive values.  Usage:  python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from srag_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "as_py"):
        v = v.as_py()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if v.__class__.__name__ == "Decimal":
        return float(v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(normalize(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        s_ms, s_c = rows_to_multiset(scols, srows)
        d_ms, d_c = rows_to_multiset(dcols, drows)
        if s_c != d_c:
            failures.append(name)
            print(f"FAIL {name}: columns spark={s_c} duck={d_c}")
        elif len(s_ms) != len(d_ms):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_ms)} duck={len(d_ms)}")
            for a in s_ms[:3]:
                print("   spark:", a)
            for b in d_ms[:3]:
                print("   duck :", b)
        elif s_ms != d_ms:
            failures.append(name)
            diff = [(a, b) for a, b in zip(s_ms, d_ms) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for a, b in diff:
                print("   spark:", a)
                print("   duck :", b)
        else:
            print(f"OK   {name}: {len(s_ms)} rows")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
