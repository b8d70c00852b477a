"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).
Floats compared by repr of the exact double — i.e. as strict as any hash.

Usage: python tests/driver_parity.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import duckdb

    import __spark_entry__ as entry
    from mahout_spark.session import get_spark

    spark = get_spark(cpus=8, app_name="driver_parity", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} ROWS-ONLY  rows={len(srows)}")
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        sc, sr = _norm_rows(scols, [tuple(r) for r in srows])
        dc, dr = _norm_rows(dcols, drows)
        ok = True
        if sc != dc:
            print(f"{name:28s} SCHEMA MISMATCH spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [
                (a, b) for a, b in zip(sr, dr) if a != b
            ][:3]
            print(f"{name:28s} VALUE MISMATCH ({len([1 for a,b in zip(sr,dr) if a!=b])} rows) e.g. {diffs}")
            ok = False
        if ok:
            print(f"{name:28s} MATCH      rows={len(sr)}")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:2] or [])))
