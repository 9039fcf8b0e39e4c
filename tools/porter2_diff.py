#!/usr/bin/env python3
"""Differential test: the Porter2 SQL mirror (DuckDB) vs the Scala
implementation. Usage: porter2_diff.py <dump-prefix>  (expects
<prefix>.csv with token,stem and <prefix>.sql with the expression
over a column named `token`, both written by tools.Porter2Dump)."""
import sys

import duckdb

prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/porter2_dump"
expr = open(prefix + ".sql").read()
con = duckdb.connect()
con.execute(
    f"""CREATE TABLE t AS
        SELECT token, stem AS scala_stem
        FROM read_csv('{prefix}.csv', header=true,
                      columns={{'token':'VARCHAR','stem':'VARCHAR'}})""")
bad = con.execute(
    f"""SELECT token, scala_stem, {expr} AS sql_stem
        FROM t WHERE sql_stem IS DISTINCT FROM scala_stem
        LIMIT 50""").fetchall()
n = con.execute("SELECT count(*) FROM t").fetchone()[0]
if bad:
    print(f"MISMATCH {len(bad)}+ of {n}:")
    for row in bad:
        print("  token=%r scala=%r sql=%r" % row)
    sys.exit(1)
print(f"OK: {n} tokens agree")
