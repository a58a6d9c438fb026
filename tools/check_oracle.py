#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Replicates (approximately) the driver's t2 gate: for each query result
parquet under <verifyOutDir>/<name>/, run the matching SQL from
oracle_sql.json in DuckDB against the sfDir tables, sort columns by name,
sort rows, and compare values. Dev tool only — NOT part of the library.
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if got.dtypes.tolist() != want.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} != {want.dtypes.tolist()}")
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        if g.equals(w):
            print(f"OK   {name} ({len(g)} rows)")
        else:
            diff = (g != w) & ~(g.isna() & w.isna())
            ndiff = int(diff.any(axis=1).sum())
            print(f"FAIL {name}: {ndiff}/{len(g)} rows differ")
            bad = diff.any(axis=1)
            print("  got :", g[bad].head(3).to_dict("records"))
            print("  want:", w[bad].head(3).to_dict("records"))
            failures += 1
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
