#!/usr/bin/env python3
"""Strict local stand-in for the driver's hash gate.

Usage: python3 tools/compare_strict.py <outDir> <sfDir>

Same protocol as compare.py (columns sorted by name, rows sorted, values
compared) but ALSO fails when the canonicalized dtypes differ — the
driver hashes canonicalized values, so a DuckDB HUGEINT (-> float64 /
object in pandas) against a Spark BIGINT (int64) is a hash mismatch
even when every value is equal.  compare.py tolerates that; this tool
reproduces the driver's stricter behavior.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
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
        dt_bad = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                  for c in sdf.columns if str(sdf[c].dtype) != str(odf[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1; continue
        bad = []
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            try:
                if pd.api.types.is_float_dtype(a):
                    ok = ((a == b) | (a.isna() & b.isna())).all()
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
        print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
