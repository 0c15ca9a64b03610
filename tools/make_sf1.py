#!/usr/bin/env python3
"""Build an sf1-equivalent test corpus (10x sf0.1) for the scale probe.

The driver only ships sf0.001/0.01/0.1; the remaining risk class is plans
that only work small (integer-width bounds, hot-key skew, pivot width,
shuffle sizing). This derives a 10x corpus from sf0.1 with the properties
the probe needs:

- dims (region, nation) stay fixed — replicating them would break FK
  semantics;
- every fact table gets 10 replicas with keys shifted by a stride larger
  than the source max, and FK columns shifted by the SAME replica stride,
  so join fan-outs and integrity are preserved per replica;
- document text inserts a replica-specific separator token between every
  pair of tokens (replica 0 keeps the original): original tokens (and so
  language/stopword statistics) survive, but every k>=2 shingle contains
  the replica token, making shingle sets DISJOINT across replicas — the
  near-dup pair count grows linearly with scale instead of quadratically
  (pure replication would turn every near-dup family into a 10x clique);
- embeddings are freshly seeded normal vectors per replica (scaling or
  shifting source vectors would create degenerate cosine structure);
  labels replicate.

Usage: python3 tools/make_sf1.py [src_dir] [out_dir]
"""
import os, sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
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
KL = stride("lineitem", "l_orderkey")   # same stride as orders
KE = stride("events", "event_id")
KU = stride("events", "user_id")
KD = stride("documents", "doc_id")
KV = stride("documents", "doc_id")      # embeddings share doc ids

def copy(sql, name):
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")

# dims unchanged
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

# replica 0 verbatim; replicas 1.. insert ' qzr<r> ' between tokens
copy(f"""SELECT doc_id + r * {KD} AS doc_id,
  CASE WHEN r = 0 THEN text
       ELSE replace(text, ' ', ' qzr' || CAST(r AS VARCHAR) || ' ') END AS text,
  lang, source, n_chars
  FROM documents CROSS JOIN range({R}) t(r)""", "documents")

# embeddings: replica 0 verbatim (original bytes), replicas 1.. fresh
# normal vectors seeded per replica; labels replicate.
emb = pq.read_table(f"{src}/embeddings.parquet")
vec_ids = emb.column("vec_id").to_numpy()
labels = emb.column("label").to_numpy()
dim = len(emb.column("embedding")[0])
n = len(vec_ids)
parts = [emb]
for r in range(1, R):
    rng = np.random.default_rng(10_000 + r)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    parts.append(pa.table({
        "vec_id": pa.array(vec_ids + r * KV, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.field("element", pa.float32()))),
        "label": pa.array(labels, pa.int32()),
    }).cast(emb.schema))
pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
print(f"embeddings: {n * R} rows")
