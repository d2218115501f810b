"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and an order-insensitive value hash (values stringified with
float rounding, columns sorted by name).

Usage: python tools/compare_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(v) -> str:
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8", "replace"))
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # "--all" = explicit no-filter (the default); any other unknown name is
    # an ERROR, not an empty no-op run that exits 0 looking green
    only = {a for a in sys.argv[2:] if a != "--all"}

    import __spark_entry__ as entrymod
    from data_warehouse_etl_spark.session import get_spark

    spark = get_spark(app_name="compare_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # the FULL surface, including driver-retired entries (the driver checks
    # only the 50 queries() emits; this local gate checks everything)
    queries = getattr(entrymod, "all_queries", entrymod.queries)()
    oracles = getattr(entrymod, "all_oracle_sql", entrymod.oracle_sql)()
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"OK?   {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            dtypes = [str(d[1]) for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        problems = []
        # DuckDB promotes SUM(int) to HUGEINT (int128); the driver's hasher
        # serializes that differently from Spark's BIGINT even when the
        # values are equal. Treat any HUGEINT output column as a failure so
        # the local gate matches the driver's (round-1 lesson: a2/a8/w3/d8).
        huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t.upper()]
        if huge:
            problems.append(f"HUGEINT oracle column(s) {huge} — CAST(... AS BIGINT)")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            hs, hd = value_hash(srows, scols), value_hash(drows, dcols)
            if hs != hd:
                problems.append(f"valuehash spark={hs} duckdb={hd}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: rows={len(srows)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
