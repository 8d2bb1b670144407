#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL, column-name-sorted, value-level.
Usage: localcheck.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: ints -> int64, floats stay, decimals -> float
    for c in df.columns:
        if df[c].dtype == object:
            try:
                import decimal
                if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = df[c].astype(float)
            except Exception:
                pass
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v): row.append("NaN")
                else: row.append(f"{v!r}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    rows.sort()
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, x = canon(got), canon(exp)
        if g == x:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(g)} rows vs oracle {len(x)} rows")
            sg, sx = set(g), set(x)
            for r in list(sg - sx)[:3]: print(f"   spark-only: {r}")
            for r in list(sx - sg)[:3]: print(f"  oracle-only: {r}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
