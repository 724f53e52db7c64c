"""Local replica of the driver's correctness gate: run each queries()
entry on Spark at sf0.01 and its oracle_sql() in DuckDB over the same
parquet, compare row-count + schema-width + order-insensitive value
multiset. Usage: python scripts/check_contract.py [sf_dir] [names...]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime as dt
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return str(v)
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # driver memory is a knob: the replica collects both engines' full
    # result sets, and at the 10x sweep (scripts/gen_sf1.py) a default-1g
    # driver OOMs on the 2M-row validate_lineitem collect
    dmem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", dmem)
             .config("spark.sql.session.timeZone", "UTC")
             .appName("contract-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time as _time
    t_start = _time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t_q = _time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only)")
            continue
        try:
            od = con.sql(oracles[name])
            orows = od.fetchall()
            ocols = od.columns
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failures += 1
            continue
        ms = row_multiset([tuple(r) for r in srows], [c.lower() for c in scols])
        mo = row_multiset(orows, [c.lower() for c in ocols])
        if ms != mo:
            diff_s = [r for r in ms if r not in set(mo)][:3]
            diff_o = [r for r in mo if r not in set(ms)][:3]
            print(f"FAIL  {name}: value mismatch; spark-only={diff_s} "
                  f"oracle-only={diff_o}")
            failures += 1
            continue
        print(f"OK    {name}: {len(srows)} rows match "
              f"[{_time.time() - t_q:.2f}s]")
    print(f"TOTAL {_time.time() - t_start:.1f}s")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
