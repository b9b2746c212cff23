"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, sorted column names, and an order-insensitive value
hash.

The value hash is computed over Arrow-materialized values with TYPE TAGS
(int / float / Decimal / bool / str are distinct), which is how r01's 7
driver-only hash misses slipped past the old 10-sig-fig replica: DuckDB
``SUM(int)`` yields HUGEINT (-> float64/decimal128 through pandas/Arrow)
while Spark yields int64 — numerically equal, representationally not.
Oracles must CAST aggregates to BIGINT / matching types explicitly.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(value):
    if value is None:
        return "<null>"
    if isinstance(value, bool):
        return "b:true" if value else "b:false"
    if isinstance(value, int):
        return f"i:{value}"
    if isinstance(value, float):
        if math.isnan(value):
            return "f:nan"
        if value == int(value) and abs(value) < 1e15:
            return f"f:{int(value)}.0"
        return f"f:{value!r}"
    if isinstance(value, decimal.Decimal):
        return f"d:{value}"
    if isinstance(value, bytes):
        return "x:" + value.hex()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ",".join(
            f"{k}={canon(v)}" for k, v in sorted(value.items())) + "}"
    return f"s:{value}"


def table_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canon(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return digest, lines


def arrow_rows(table):
    """Arrow table -> list of row tuples of plain Python values."""
    cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
    return list(zip(*cols)) if cols else [], table.column_names


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # accept "--only a,b" / bare names / comma lists; an unknown name
    # must FAIL, not silently select nothing (a vacuous "all match")
    only = {n for a in sys.argv[2:] if a != "--only"
            for n in a.split(",") if n}

    import duckdb

    import __spark_entry__ as entry
    from spark_schema_guard.session import build_session

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_session(app_name="oracle-check", cores=8, shuffle_partitions=8)

    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        sys.exit(f"unknown query names: {sorted(unknown)}")
    failures = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            srows, scols = arrow_rows(sdf.toArrow())
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            orows, ocols = arrow_rows(rel.arrow())
        except Exception as exc:
            failures.append((name, f"ORACLE ERROR: {exc}"))
            print(f"FAIL  {name}: oracle error {exc}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh, slines = table_hash(srows, scols)
            oh, olines = table_hash(orows, ocols)
            if sh != oh:
                sset, oset = set(slines), set(olines)
                example = (sorted(sset - oset)[:1], sorted(oset - sset)[:1])
                problems.append(f"value hash {sh} vs {oh}; diff {example}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        sys.exit(1)
    print(f"all {n_checked} checked queries match their oracles")


if __name__ == "__main__":
    main()
