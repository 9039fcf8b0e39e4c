#!/usr/bin/env python3
"""Mechanical oracle-dtype audit (VERDICT r12 #2).

Usage: python3 tools/lint_oracle_dtypes.py <oracle_sql.json> <sfDir>

DuckDB promotes integer SUM()/arithmetic to HUGEINT; pandas renders
HUGEINT as float64/object while Spark emits int64 — equal values,
different canonicalized dtypes, driver hash mismatch (the q226/q229
r12 gate escape).  Dtypes are data-independent, so a static DESCRIBE
over every declared oracle catches the class at authoring time, for
every SF at once, without running Spark or the full compare.

Fails (exit 1) if any declared oracle column DESCRIBEs to a type
outside the Spark-expressible set (HUGEINT/UHUGEINT/INT128 are the
known offenders; unbounded DECIMAL sums are flagged too since Spark
parquet writes them as fixed-precision and the compare casts to
double on both sides by convention).
"""
import sys, json, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
BAD = ("HUGEINT", "UHUGEINT", "INT128")

def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}"); n_bad += 1; continue
        hits = [(c, t) for (c, t, *_) in desc
                if any(b in t.upper() for b in BAD)]
        if hits:
            print(f"FAIL {name}: non-Spark dtypes {hits}"); n_bad += 1
    print(f"\n{len(oracle)} oracles audited, {n_bad} with dtype hazards")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
