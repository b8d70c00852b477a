"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value multiset.

Faithful to the DRIVER's canonicalization path (round-1 lesson): both
sides go through **pandas** — DuckDB via ``cur.df()`` (HUGEINT becomes
float64 there, which is exactly the dtype mismatch that broke 8 hashes in
round 1) and Spark via ``toPandas()`` — then columns sorted by name, rows
sorted with ``sort_values`` (which throws on unhashable list cells, the
round-1 ``err`` mechanism), and cells rendered dtype-sensitively (int64
``840`` != float64 ``840.0``). A query that passes here passes the
driver's hash gate.

Usage: python tests/driver_parity.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)  # float64 840.0 -> '840.0', distinct from int '840'
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def _canon(pdf):
    """Driver-shaped canonicalization: name-sorted columns, sort_values
    over all columns (raises TypeError on list cells, like the driver),
    dtype-sensitive cell rendering."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    cols = list(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def main(sf_dir: str = "/root/testdata/sf0.01", only: list | None = None) -> int:
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
    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        qs = {n: qs[n] for n in only}
    oracles = entry.oracle_sql()
    failures = 0
    cost: dict[str, float] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            sc, sr = _canon(spdf)
        except Exception as e:  # the driver records this as err
            cost[name] = round(time.time() - t0, 3)
            print(f"{name:28s} SPARK/CANON ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        cost[name] = round(time.time() - t0, 3)
        if name not in oracles:
            print(f"{name:28s} ROWS-ONLY  rows={len(sr)}")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dc, dr = _canon(dpdf)
        except Exception as e:
            print(f"{name:28s} ORACLE/CANON ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        ok = True
        if sc != dc:
            print(f"{name:28s} SCHEMA MISMATCH spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            n_bad = len([1 for a, b in zip(sr, dr) if a != b])
            print(f"{name:28s} VALUE MISMATCH ({n_bad} rows) e.g. {diffs}")
            ok = False
        if ok:
            print(f"{name:28s} MATCH      rows={len(sr)}")
        else:
            failures += 1
    print(f"\n{failures} failures")
    if not only:
        # contract self-timing: per-query Spark-side wall seconds, so a
        # contract-cost regression is visible before the driver hits it
        # (round 4's 62 hermetic builds starved the driver's budget and
        # produced an empty CORRECTNESS artifact).
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "CONTRACT_COST.json"), "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total_sec": round(time.time() - t_all, 1),
                    "n_queries": len(qs),
                    "per_query_sec": cost,
                },
                f, indent=1, sort_keys=True,
            )
    return failures


if __name__ == "__main__":
    # usage: driver_parity.py [sf_dir] [query_name ...]
    argv = sys.argv[1:]
    sf = argv.pop(0) if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    sys.exit(main(sf, only=argv or None))
