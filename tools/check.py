#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<query>/ parquet written by graft.Verify plus
<outDir>/oracle_sql.json, runs each oracle in DuckDB against the sfDir
parquet tables, and compares: column set (sorted by name), row count,
and cell values (rows sorted by all columns).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr-ish canonical form
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else f"{v:.6f}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:  # written by graft.Verify: queries that THREW, with the reason
        verify_errors = json.load(open(f"{out_dir}/verify_errors.json"))
    except Exception:
        verify_errors = {}
    failed = []
    for name, sql in sorted(oracles.items()):
        if name in verify_errors:
            print(f"FAIL {name}: spark query threw: {verify_errors[name]}")
            failed.append(name); continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); failed.append(name); continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); failed.append(name); continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            failed.append(name); continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
            failed.append(name); continue
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first:")
            for i in idx:
                print("  spark:", dict(g.loc[i]))
                print("  duck :", dict(e.loc[i]))
            failed.append(name); continue
        print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracles)-len(failed)}/{len(oracles)} passed")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
