"""Deterministic sf1-scale tables for the 10x-above-gate contract sweep
(round-3 VERDICT item 7): each fact table is the sf0.1 table replicated
10x with its integer keys shifted by i*100M per copy, so key-uniqueness
and referential profiles scale instead of collapsing into one giant
duplicate group. Dimension tables (region, nation) and the quadratic
comparison target (embeddings) stay at 1 copy — the brute-force oracles
are O(n^2) in DuckDB and scale evidence targets the fact-table plans.

Pure DuckDB (no Spark): byte-deterministic given the input tables.

    python scripts/gen_sf1.py [out_dir]     # default /tmp/pv_sf1
    python scripts/check_contract.py /tmp/pv_sf1 <sql-oracle query names>
"""

import os
import sys

SRC = "/root/testdata/sf0.1"
COPIES = 10
DELTA = 100_000_000

SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY_ONCE = ["region", "nation", "embeddings"]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pv_sf1"
    os.makedirs(out, exist_ok=True)
    import duckdb
    con = duckdb.connect()
    for t in COPY_ONCE:
        con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: 1 copy")
    for t, keys in SHIFT.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + i.i * {DELTA} AS {c}" if c in keys else c for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"generate_series(0, {COPIES - 1}) AS i(i) ORDER BY i.i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM "
                    f"read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
