#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables, load the Spark result parquet, sort
columns by name + rows by value, and compare schema/rows/values exactly.
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact — the driver hashes, so isn't enough
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark parquet output"); n_fail += 1; continue
            tbl = pq.read_table(files[0])
            s_cols = tbl.column_names
            s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            sc, sr = canon(s_rows, s_cols)
            oc, orr = canon(o_rows, o_cols)
            if sc != oc:
                print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}"); n_fail += 1; continue
            if len(sr) != len(orr):
                print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}"); n_fail += 1; continue
            bad = None
            for i, (a, b) in enumerate(zip(sr, orr)):
                if not all(eq(x, y) for x, y in zip(a, b)):
                    bad = (i, a, b); break
            if bad:
                print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}"); n_fail += 1; continue
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
