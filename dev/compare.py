#!/usr/bin/env python3
"""Dev-loop twin of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet, compare with the Verify parquet dump
(columns sorted by name, rows sorted, values hashed).

IMPORTANT: the Spark side is read with pandas/pyarrow (NOT through DuckDB) —
that matches the driver. Reading it through DuckDB launders decimal columns
to float64 and masks trailing-zero mismatches (Decimal('138014.00') vs
138014.0) that the real gate catches."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pd.read_parquet(files) if files else None
    if name not in oracle:
        n = 0 if got is None else len(got)
        print(f"{name:22s} rows-only ({n} rows)")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:22s} ORACLE-ERROR {str(e)[:150]}")
        fail += 1
        continue
    # driver-style compare: sort columns by name, stringify, sort rows.
    # Midnight suffix stripped: pyarrow date32 → datetime.date ('1995-01-01')
    # while duckdb DATE → datetime64 ('1995-01-01 00:00:00'); the real driver
    # treats these as equal (date queries hash-matched in r1).
    def sv(v):
        s = str(v)
        if s in ("NaT", "nan", "<NA>", "None"):
            return "None"
        return s[:-9] if s.endswith(" 00:00:00") else s
    def norm(df):
        df = df[sorted(df.columns)]
        return sorted(tuple(sv(v) for v in row) for row in df.itertuples(index=False))
    g, e = norm(got), norm(exp)
    if list(got.columns.sort_values()) != list(exp.columns.sort_values()):
        print(f"{name:22s} SCHEMA-MISMATCH spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        fail += 1
    elif g == e:
        print(f"{name:22s} OK ({len(g)} rows)")
        ok += 1
    else:
        print(f"{name:22s} MISMATCH rows {len(g)} vs {len(e)}")
        diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
        for a, b in diffs:
            print(f"    spark: {a}\n    duck : {b}")
        if len(g) != len(e):
            sg, se = set(g), set(e)
            onlyg = list(sg - se)[:2]; onlye = list(se - sg)[:2]
            print(f"    only-spark: {onlyg}\n    only-duck : {onlye}")
        fail += 1
print(f"\n{ok} OK, {fail} FAIL, {len(oracle)} oracled")
