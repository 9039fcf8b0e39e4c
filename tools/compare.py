#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <outDir> <sfDir>

Reads <outDir>/<name>/ parquet (Spark results) and <outDir>/oracle_sql.json,
runs each SQL in DuckDB with views over <sfDir>/*.parquet, and compares:
columns sorted by name, rows sorted by all columns, values hashed.

NOT THE GATE (r12 lesson): this tool is dtype-TOLERANT and exists only
to diagnose whether a compare_strict.py failure is a value bug or a
dtype (HUGEINT-class) bug.  A PASS here does NOT predict the driver's
hash gate — q226/q229 passed here and failed the r12 driver gate.
Use tools/compare_strict.py for every pass claim.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: numeric → float/int, timestamps → utc-naive
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try: df[c] = df[c].dt.tz_localize(None)
            except Exception: pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            odf = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} != {list(odf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} != {len(odf)}"); n_fail += 1; continue
        # value compare, exact
        try:
            eq = sdf.reset_index(drop=True).equals(odf.reset_index(drop=True))
            if not eq:
                # dtype-tolerant elementwise compare
                bad = []
                for c in sdf.columns:
                    a, b = sdf[c], odf[c]
                    try:
                        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                            ok = ((a.astype(float) == b.astype(float)) |
                                  (a.isna() & b.isna())).all()
                        else:
                            ok = (a.astype(str) == b.astype(str)).all()
                    except Exception:
                        ok = False
                    if not ok: bad.append(c)
                if bad:
                    print(f"FAIL {name}: mismatched cols {bad}")
                    for c in bad[:3]:
                        m = (sdf[c].astype(str) != odf[c].astype(str))
                        i = m[m].index[:3]
                        print(f"  {c}: spark={sdf[c][i].tolist()} oracle={odf[c][i].tolist()}")
                    n_fail += 1; continue
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1; continue
        print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
