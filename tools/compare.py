#!/usr/bin/env python3
"""Local dev harness: compare Verify parquet dumps against the DuckDB oracle.

Strict mode: after sorting columns by name and rows by all columns, every
value must match exactly (floats bit-for-bit; NaN==NaN; None==None).
Any sane driver comparison is implied by passing this.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(norm_cell(x) for x in v)
    return (type(v).__name__, str(v))

def frame_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]
    rows.sort()
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Large-SF sweeps: bound DuckDB's memory and let it spill instead of
    # taking down the box (the sf1 exact-Jaccard oracles otherwise grow
    # >100 GB RSS). GRAFT_DUCKDB_MEM e.g. "48GB".
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        # informational: arrow-level type alignment (a strict driver compare
        # could reject e.g. int32 vs int64 even when values match)
        try:
            spark_t = {f.name: str(pq.read_schema(
                next(p for p in __import__("glob").glob(f"{out_dir}/{name}/*.parquet"))
            ).field(f.name).type) for f in pq.read_schema(
                next(p for p in __import__("glob").glob(f"{out_dir}/{name}/*.parquet")))}
            duck_t = {f.name: str(f.type) for f in con.execute(sql).arrow().schema}
            mism = {c: (spark_t.get(c), duck_t.get(c)) for c in duck_t
                    if c in spark_t and spark_t[c] != duck_t[c]}
            if mism:
                print(f"NOTE {name}: arrow type mismatch {mism}")
        except Exception:
            pass
        gc, gr = frame_key(got)
        ec, er = frame_key(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first at {i}:")
            print(f"  spark : {a}")
            print(f"  duckdb: {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
