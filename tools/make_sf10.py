#!/usr/bin/env python3
"""Build an sf10-equivalent corpus (10x sf1, 100x sf0.1) for the scale
probe one notch past the sf1 sweep.

Same derivation contract as make_sf1.py (see its docstring), applied to
an sf1 directory produced by that script:

- dims unchanged; fact keys shifted by a per-replica stride with FKs
  shifted by the SAME stride (join semantics preserved per replica);
- replica separator token is 'qzs<r>' (distinct from make_sf1's
  'qzr<r>'), so shingle sets stay disjoint across BOTH replication
  levels and near-dup pair counts stay linear in scale;
- embeddings: replica 0 verbatim, replicas 1.. fresh seeded normals
  (seed space 20_000+r, disjoint from make_sf1's 10_000+r).

Usage: python3 tools/make_sf10.py [sf1_dir] [out_dir]
       (defaults: /tmp/sf1 -> /tmp/sf10; run tools/make_sf1.py first)
"""
import os, sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
R = 10
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")

def stride(table, key):
    return con.execute(f"SELECT MAX({key}) + 1 FROM {table}").fetchone()[0]

KC = stride("customer", "c_custkey")
KS = stride("supplier", "s_suppkey")
KP = stride("part", "p_partkey")
KO = stride("orders", "o_orderkey")
KE = stride("events", "event_id")
KU = stride("events", "user_id")
KD = stride("documents", "doc_id")

def copy(sql, name):
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows", flush=True)

copy("SELECT * FROM region", "region")
copy("SELECT * FROM nation", "nation")

copy(f"""SELECT c_custkey + r * {KC} AS c_custkey, c_name,
  c_nationkey, c_acctbal, c_mktsegment
  FROM customer CROSS JOIN range({R}) t(r)""", "customer")

copy(f"""SELECT s_suppkey + r * {KS} AS s_suppkey, s_name,
  s_nationkey, s_acctbal
  FROM supplier CROSS JOIN range({R}) t(r)""", "supplier")

copy(f"""SELECT p_partkey + r * {KP} AS p_partkey, p_name, p_brand,
  p_type, p_size, p_retailprice
  FROM part CROSS JOIN range({R}) t(r)""", "part")

copy(f"""SELECT o_orderkey + r * {KO} AS o_orderkey,
  o_custkey + r * {KC} AS o_custkey, o_orderstatus, o_totalprice,
  o_orderdate, o_orderpriority
  FROM orders CROSS JOIN range({R}) t(r)""", "orders")

copy(f"""SELECT l_orderkey + r * {KO} AS l_orderkey,
  l_partkey + r * {KP} AS l_partkey, l_suppkey + r * {KS} AS l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate
  FROM lineitem CROSS JOIN range({R}) t(r)""", "lineitem")

copy(f"""SELECT event_id + r * {KE} AS event_id, ts,
  user_id + r * {KU} AS user_id, event_type, value, props
  FROM events CROSS JOIN range({R}) t(r)""", "events")

copy(f"""SELECT doc_id + r * {KD} AS doc_id,
  CASE WHEN r = 0 THEN text
       ELSE replace(text, ' ', ' qzs' || CAST(r AS VARCHAR) || ' ') END AS text,
  lang, source, n_chars
  FROM documents CROSS JOIN range({R}) t(r)""", "documents")

emb = pq.read_table(f"{src}/embeddings.parquet")
vec_ids = emb.column("vec_id").to_numpy()
labels = emb.column("label").to_numpy()
dim = len(emb.column("embedding")[0])
n = len(vec_ids)
KV = int(vec_ids.max()) + 1
writer = pq.ParquetWriter(f"{out}/embeddings.parquet", emb.schema)
writer.write_table(emb)
for r in range(1, R):
    rng = np.random.default_rng(20_000 + r)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    writer.write_table(pa.table({
        "vec_id": pa.array(vec_ids + r * KV, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.field("element", pa.float32()))),
        "label": pa.array(labels, pa.int32()),
    }).cast(emb.schema))
writer.close()
print(f"embeddings: {n * R} rows", flush=True)
