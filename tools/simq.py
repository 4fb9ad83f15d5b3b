"""Single-query driver simulation: run the named registry queries vs
their DuckDB oracles at a given SF dir, exactly like the round driver
(.claude/skills/verify recipe, step 1). Usage:

    python tools/simq.py name [name ...] [--sf /root/testdata/sf0.01]
"""
import datetime as dt
import importlib
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def norm(v):
    if isinstance(v, float):
        return 0.0 if v == 0 else round(
            v, 9 - int(math.floor(math.log10(abs(v)))) - 1
        )
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    mod = importlib.import_module("__spark_entry__")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    fails = []
    for name in args:
        sdf = qs[name](spark, sf)
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(norm(r[c]) for c in scols) for r in sdf.collect()], key=repr
        )
        if name not in oracles:
            print(f"  {name}: rows-only {len(srows)}")
            continue
        r = con.execute(oracles[name])
        cols = [d[0] for d in r.description]
        dcols = sorted(cols)
        idx = [cols.index(c) for c in dcols]
        drows = sorted(
            [tuple(norm(row[i]) for i in idx) for row in r.fetchall()], key=repr
        )
        if scols == dcols and srows == drows:
            print(f"  {name}: OK ({len(srows)} rows)")
        else:
            fails.append(name)
            print(f"  FAIL {name} cols {scols} vs {dcols} "
                  f"rows {len(srows)} vs {len(drows)}")
            for a, b in list(zip(srows, drows))[:5]:
                if a != b:
                    print(f"    spark  {a}\n    oracle {b}")
    print("FAILS:", fails or "none")
    spark.stop()
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
