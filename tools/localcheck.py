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

def testdata_fingerprint(con, sf_dir):
    """Schema + row-count fingerprint of the testdata a gate run read.

    Recorded so a "full gate green locally" claim is verifiable against
    the data it actually ran on: round 8's events.ts flipped physical
    encoding (TIMESTAMP(NANOS) -> TIMESTAMP_NTZ) minutes after a green
    local run, and the stale green was cited as current. Any docs/SCALE.md
    gate claim should quote this fingerprint.
    """
    fp = {}
    for t in TABLES:
        try:
            desc = con.sql(f"DESCRIBE SELECT * FROM '{sf_dir}/{t}.parquet'").df()
            n = con.sql(f"SELECT count(*) FROM '{sf_dir}/{t}.parquet'").fetchone()[0]
            fp[t] = {"rows": int(n),
                     "schema": {r["column_name"]: r["column_type"]
                                for _, r in desc.iterrows()}}
        except Exception as e:
            fp[t] = {"error": str(e)}
    return fp

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass
    fp = testdata_fingerprint(con, sf_dir)
    with open(f"{out_dir}/_TESTDATA_FP.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "tables": fp}, f, indent=1)
    ev = fp.get("events", {})
    print(f"testdata fingerprint: events.ts={ev.get('schema', {}).get('ts')} "
          f"rows={ev.get('rows')} (full record: {out_dir}/_TESTDATA_FP.json)")
    # the gate-omission tripwire artifact Verify.scala writes ({} = clean)
    try:
        errors = json.load(open(f"{out_dir}/_ERRORS.json"))
        if errors:
            print(f"VERIFY ERRORS ({len(errors)}):")
            for k, v in sorted(errors.items()):
                print(f"  {k}: {v[:200]}")
    except Exception:
        print("WARNING: no _ERRORS.json in dump dir (old Verify build?)")
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
