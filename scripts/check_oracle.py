"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row counts + column names + order-insensitive values."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main(sf_dir: str, only: list[str]):
    spark = get_spark("oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # the recursive-CTE oracles at sf0.1 exceed DuckDB's conservative
    # default memory limit when Spark shares the box; give the oracle room
    con.execute("SET memory_limit='40GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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
            print(f"{name}: rows-only, spark rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"{name}: ORACLE SQL ERROR: {exc}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        a = norm_rows(scols, [[r[c] for c in scols] for r in srows])
        b = norm_rows(dcols, drows)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{name}: {status} cols_ok={ok_cols} rows {len(a)} vs {len(b)}")
            if not ok_cols:
                print("  spark cols:", scols, " duck cols:", dcols)
            for x, y in list(zip(a, b))[:3]:
                if x != y:
                    print("  spark:", x)
                    print("  duck :", y)
            onlya = [r for r in a if r not in set(map(tuple, b))][:2]
            onlyb = [r for r in b if r not in set(map(tuple, a))][:2]
            if onlya:
                print("  only-spark:", onlya)
            if onlyb:
                print("  only-duck :", onlyb)
        else:
            print(f"{name}: OK ({len(a)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    main(sf, sys.argv[2:])
