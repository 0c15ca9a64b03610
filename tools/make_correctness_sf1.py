#!/usr/bin/env python3
"""Emit the sf1 correctness sweep as a committed, auditable artifact.

Runs the same strict compare as tools/compare.py (columns sorted by name,
rows sorted, floats bit-exact) over a Verify dump produced at sf1
(tools/make_sf1.py corpus) and writes CORRECTNESS-format JSON — one entry
per query with rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err — to the output path. Queries whose DuckDB oracle is
infeasible at sf1 are listed with a `skipped` reason instead of being
silently dropped (the no-silent-caps rule):

 - sim_knn_join / sim_knn_graph_components: exact-kNN ground truth is the
   quadratic gram matrix; verified by tools.KnnParityProbe (blocked exact
   parity probe) instead.

(The SNM-closure trio — dedup_cluster_stats / dedup_components /
dedup_representatives — was skipped through r11 because the recursive
reach oracle was quadratic; r12 replaced it with a linear chained
alternating-star replay, so the trio now runs like any other query.
Same for dedup_minhash_calibration, whose 1-in-32 pair sampling bounds
the replay.)

Additionally, any oracle that exceeds GRAFT_ORACLE_TIMEOUT seconds
(default 1200) is interrupted and recorded as skipped-with-reason — the
sweep stays bounded, and nothing is silently dropped. The output json is
written incrementally after every query and the run RESUMES from an
existing output file (pass/skip entries are kept; failures retry), so a
killed sweep never loses finished work.

Usage:
  python3 tools/make_correctness_sf1.py <sf1Dir> <verifyOutDir> [outJson]
Environment: GRAFT_DUCKDB_MEM (e.g. 48GB) bounds DuckDB; see compare.py.
"""
import json, math, os, sys, threading, time

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, frame_key  # same strict normalization

ORACLE_TIMEOUT = int(os.environ.get("GRAFT_ORACLE_TIMEOUT", "1200"))

SKIPPED = {
    "sim_knn_join":
        "exact-kNN ground truth is the full gram matrix (quadratic) at "
        "sf1; verified by tools.KnnParityProbe (ok=true) instead",
    "sim_knn_graph_components":
        "exact-kNN ground truth is the full gram matrix (quadratic) at "
        "sf1; verified by tools.KnnParityProbe (ok=true) instead",
}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_sf1.json"
    con = duckdb.connect()
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/duckdb_spill")
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    result = {}
    if os.path.exists(out_json):  # resume: keep pass/skip, retry failures
        prior = json.load(open(out_json))
        for name, entry in prior.items():
            if "skipped" in entry or entry.get("hash_match"):
                result[name] = entry
    n_pass = sum(1 for e in result.values() if e.get("hash_match"))
    n_skip = sum(1 for e in result.values() if "skipped" in e)
    n_fail = 0

    def flush():
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)

    for name, sql in sorted(oracle.items()):
        if name in result:
            continue
        if name in SKIPPED:
            result[name] = {"skipped": SKIPPED[name]}
            n_skip += 1; flush()
            print(f"SKIP {name}: {SKIPPED[name][:70]}...", flush=True)
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        t0 = time.time()
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            entry["err"] = f"no spark output: {e}"
            result[name] = entry; n_fail += 1; flush()
            print(f"FAIL {name}: {entry['err']}", flush=True); continue
        interrupted = threading.Event()

        def _interrupt():
            interrupted.set()
            con.interrupt()
        timer = threading.Timer(ORACLE_TIMEOUT, _interrupt)
        timer.start()
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            timer.cancel()
            # Only OUR interrupt reclassifies as a timeout skip. A genuine
            # late oracle failure (OOM, SQL error surfacing after a long
            # scan) must stay a FAIL regardless of elapsed time — keying on
            # wall clock alone would understate failures in the artifact.
            is_interrupt = interrupted.is_set() and (
                isinstance(e, duckdb.InterruptException)
                or "INTERRUPT" in str(e).upper())
            if is_interrupt:
                result[name] = {"skipped": (
                    f"DuckDB oracle exceeded {ORACLE_TIMEOUT}s at sf1 "
                    "(interrupted); oracle-verified at sf0.01 + sf0.1 + "
                    "edge corpus")}
                n_skip += 1; flush()
                print(f"SKIP {name}: oracle timeout after "
                      f"{time.time()-t0:.0f}s", flush=True)
                continue
            entry["err"] = f"oracle error: {str(e)[:300]}"
            result[name] = entry; n_fail += 1; flush()
            print(f"FAIL {name}: {entry['err']}", flush=True); continue
        timer.cancel()
        gc, gr = frame_key(got)
        ec, er = frame_key(exp)
        entry["spark_rows"] = len(gr)
        entry["oracle_rows"] = len(er)
        entry["schema_match"] = gc == ec
        entry["rows_match"] = len(gr) == len(er)
        entry["hash_match"] = entry["schema_match"] and gr == er
        result[name] = entry
        flush()
        if entry["hash_match"]:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows, {time.time()-t0:.1f}s)",
                  flush=True)
        else:
            n_fail += 1
            print(f"FAIL {name}: schema={entry['schema_match']} "
                  f"rows {len(gr)} vs {len(er)}", flush=True)
    flush()
    print(f"== sf1: {n_pass} pass, {n_fail} fail, {n_skip} skipped "
          f"(reasons recorded) -> {out_json} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
