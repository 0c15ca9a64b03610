#!/usr/bin/env python3
"""Local baseline: the REFERENCE's stack (eager pandas, single process)
running the same headline workloads on the same parquet, for a concrete
throughput comparison point. Dev/measurement tooling only — the engine
itself is pure Scala Spark.

Usage: python3 tools/baseline_pandas.py [sfDir]
"""
import hashlib, sys, time
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

def timed(name, f):
    t0 = time.time()
    r = f()
    dt = time.time() - t0
    print(f"{name:24s} {dt:7.3f}s  (n={r})")
    return name, dt

def q1_agg():
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])
    g = li.assign(disc_price=li.l_extendedprice * (1 - li.l_discount)) \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .agg(sum_qty=("l_quantity", "sum"),
             sum_base=("l_extendedprice", "sum"),
             sum_disc=("disc_price", "sum"),
             avg_qty=("l_quantity", "mean"),
             n=("l_quantity", "size"))
    return len(g)

def j1_join():
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    o = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{sf}/nation.parquet")
    r = pd.read_parquet(f"{sf}/region.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
          .merge(c, left_on="o_custkey", right_on="c_custkey") \
          .merge(n, left_on="c_nationkey", right_on="n_nationkey") \
          .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    g = m.assign(rev=m.l_extendedprice * (1 - m.l_discount)) \
         .groupby(["r_name", "n_name"]).agg(n=("rev", "size"), rev=("rev", "sum"))
    return len(g)

def dedup_exact():
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    dig = d.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    g = d.assign(digest=dig).groupby("digest").agg(
        keep=("doc_id", "min"), n=("doc_id", "size"))
    return len(g)

def dedup_minhash():
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    P = 2147483647
    def sig(t):
        words = t.lower().split()
        sh = {" ".join(words[i:i+3]) for i in range(max(1, len(words) - 2))}
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P for s in sh]
        return [min(((1103515245 * (j + 1) + 12345) % P | 1) * h % P for h in hs)
                for j in range(4)]
    return len(d.text.map(sig))

def text_profile():
    d = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    stop = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"}
    def prof(t):
        toks = t.lower().split()
        hits = sum(1 for w in toks if w in stop)
        return (len(t), len(toks), hits)
    return len(d.text.map(prof))

def sim_brute():
    e = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.stack(e.embedding.to_numpy()).astype(np.float64)
    q = m[:5]
    sims = (q @ m.T) / (np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(m, axis=1)[None, :])
    top = np.argsort(-sims, axis=1)[:, :10]
    return top.size

results = [timed(*x) for x in [
    ("q1_agg", q1_agg), ("j1_multiway_join", j1_join),
    ("dedup_exact", dedup_exact), ("dedup_minhash", dedup_minhash),
    ("text_profile", text_profile), ("sim_brute_topk", sim_brute)]]
print(f"{'TOTAL':24s} {sum(t for _, t in results):7.3f}s  sf={sf}")
