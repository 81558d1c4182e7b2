"""Local emulation of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry at sf0.01 on Spark and its
``oracle_sql()`` twin on DuckDB, compares row count + order-insensitive
value content (columns sorted by name, rows sorted, values stringified
with float rounding). Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from sonata_neo4j_loader_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_signature(cols: list[str], rows: list[tuple]) -> tuple[int, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    return len(rows), canon_rows


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows")
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, ssig = frame_signature(scols, [tuple(r) for r in srows])
        dn, dsig = frame_signature(dcols, drows)
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns differ: {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
        elif sn != dn:
            print(f"FAIL  {name}: row count {sn} vs {dn}")
            failures += 1
        elif ssig != dsig:
            diff = [(a, b) for a, b in zip(ssig, dsig, strict=True) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
        else:
            print(f"OK    {name}: {sn} rows match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
