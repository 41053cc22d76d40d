#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql against Verify output.

Mimics the driver's t2 gate: for each query result parquet written by
graft.Verify, run the oracle SQL in DuckDB over views of the same
scale-factor tables, sort columns by name, sort rows, and compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, then rows; return list of tuples + dtypes."""
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]

    def key(row):
        return tuple((v is None, str(v)) for v in row)

    return sorted(rows, key=key), {c: str(t) for c, t in df.dtypes.items()}


def values_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            grows, gtypes = canon(got)
            wrows, wtypes = canon(want)
            if sorted(got.columns) != sorted(want.columns):
                print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
                n_fail += 1
                continue
            if gtypes != wtypes:
                print(f"WARN {name}: dtypes {gtypes} vs {wtypes}")
            if len(grows) != len(wrows):
                print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}")
                n_fail += 1
                continue
            bad = None
            for i, (gr, wr) in enumerate(zip(grows, wrows)):
                if not all(values_eq(a, b) for a, b in zip(gr, wr)):
                    bad = (i, gr, wr)
                    break
            if bad:
                print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(grows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
