#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare schema + sorted rows against the Spark parquet output.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
(assumes Verify has already written <verifyOutDir>)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            st = pq.read_table(files[0])
            dt = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        s_cols = sorted(st.column_names)
        d_cols = sorted(dt.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}"); n_fail += 1; continue
        sp = st.select(s_cols).to_pylist()
        dp = dt.select(d_cols).to_pylist()
        if len(sp) != len(dp):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(dp)}"); n_fail += 1; continue
        srows = [tuple(norm(r[c]) for c in s_cols) for r in sp]
        drows = [tuple(norm(r[c]) for c in d_cols) for r in dp]
        # exact written order AND sorted compare — report both
        ordered = srows == drows
        sorted_eq = sorted(map(repr, srows)) == sorted(map(repr, drows))
        # schema type check (loose: arrow type equality)
        s_schema = {f.name: str(st.schema.field(f.name).type) for f in st.schema}
        d_schema = {f.name: str(dt.schema.field(f.name).type) for f in dt.schema}
        type_mismatch = {c: (s_schema[c], d_schema[c]) for c in s_cols
                         if s_schema[c] != d_schema[c]}
        if sorted_eq and not type_mismatch:
            flag = "" if ordered else " (order differs)"
            print(f"PASS {name}: {len(sp)} rows{flag}"); n_pass += 1
        else:
            n_fail += 1
            if type_mismatch:
                print(f"FAIL {name}: type mismatch {type_mismatch}")
            else:
                diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
