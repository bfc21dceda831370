"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from annotation_service_spark.session import get_session


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracle literals (IVF centroids, embedding dim)
    # must come from the SAME sf dir the Spark side reads, or the
    # comparison is between two different queries
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        orel = con.sql(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"COLS spark={sorted(scols)} duck={sorted(ocols)}")
        if not status:
            a = norm_rows(scols, [[r[c] for c in scols] for r in srows])
            b = norm_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES differ, first diffs: {diff}")
        if status:
            failures += 1
            print(f"{name}: FAIL  {' | '.join(status)}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
