"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
on DuckDB over the same parquet, compares row count + column names +
order-insensitive values.  Usage: python scripts/check_oracles.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from gorilla_stream_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "item"):
        return norm_cell(v.item())
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            if len(srows) == 0 and name != "q20_validate":
                failures.append((name, "0 rows"))
            continue
        ora = con.execute(oracles[name])
        ocols = [d[0] for d in ora.description]
        orows = ora.fetchall()
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema {sorted(scols)} != {sorted(ocols)}"))
            print(f"FAIL  {name}: schema mismatch {sorted(scols)} vs {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"count {len(srows)} != {len(orows)}"))
            print(f"FAIL  {name}: count {len(srows)} != {len(orows)}")
            continue
        a = norm_rows(scols, [[r[c] for c in scols] for r in srows])
        b = norm_rows(ocols, orows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ e.g. {diff}")
            continue
        print(f"OK    {name}: {len(srows)} rows match")
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
