#!/usr/bin/env python3
"""Build the HANDOFF pre-round edge corpus: a scale-factor dir whose
documents.parquet is replaced with degenerate rows (empty / whitespace /
NULL text, 1-2 word docs, exact dups, punctuation soup), every other table
symlinked from a real sf dir. Running the full Verify + compare harness
over it exercises the totality branches (shingle short-doc, empty-token
guards, null media payloads) that uniform synthetic text never hits.

Usage: python3 tools/make_edge_corpus.py [realSfDir] [outDir]
  then: sbt "runMain graft.Verify <outDir> /tmp/verify_edge"
        python3 tools/compare.py <outDir> /tmp/verify_edge
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

real = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_corpus"

os.makedirs(out, exist_ok=True)
for f in os.listdir(real):
    if not f.endswith(".parquet") or f in ("documents.parquet",
                                           "embeddings.parquet"):
        continue
    dst = os.path.join(out, f)
    if os.path.lexists(dst):
        os.remove(dst)
    os.symlink(os.path.join(real, f), dst)


def write_table(tbl, name):
    """NEVER write through a pre-existing path: a stale symlink from an
    older run would redirect the write onto the REAL testdata (this
    exact accident corrupted sf0.01/embeddings.parquet once — unlink
    first, always).
    """
    dst = os.path.join(out, name)
    if os.path.lexists(dst):
        os.remove(dst)
    pq.write_table(tbl, dst)

rows = [
    (0, "", "en", "src0"),                       # empty
    (1, "   ", "en", "src0"),                    # whitespace-only
    (2, None, "en", "src1"),                     # NULL text
    (3, "word", "en", "src1"),                   # single word (short-doc shingle)
    (4, "two words", "en", "src1"),              # exactly 2 words
    (5, "three little words", "en", "src2"),     # exactly 3 words
    (6, "word", "en", "src2"),                   # exact dup of 3 (and 1-word pair)
    (7, "two words", "en", "src2"),              # exact dup of 4
    (8, "  leading and trailing   spaces  ", "en", "src3"),
    (9, "!!! ??? ... ,,, ;;;", "und", "src3"),   # punctuation soup
    (10, "the the the the the the", "en", "src3"),  # stopword-only repeat
    (11, "der und die das ist nicht", "de", "src4"),
    (12, "\tmixed\twhitespace\n runs  here", "en", "src4"),
    (13, "a b a b a b", "en", "src4"),           # tiny vocab, repeated bigrams
    (14, "unique closing document with several plain words", "en", "src5"),
]
tbl = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "text": pa.array([r[1] for r in rows], pa.string()),
    "lang": pa.array([r[2] for r in rows], pa.string()),
    "source": pa.array([r[3] for r in rows], pa.string()),
    "n_chars": pa.array([len(r[1]) if r[1] is not None else 0 for r in rows],
                        pa.int64()),
})
write_table(tbl, "documents.parquet")

# Degenerate embeddings: exercises the similarity kernel's and the
# guarded oracles' (dotSql/distSql) null/zero/ragged branches. vec_id < 5
# is the query set of sim_brute/sim_lsh/sim_ivf; ids 0-15 are the IVF
# centroid prefix — degenerates land in both roles.
import numpy as np
rng = np.random.default_rng(42)
DIM = 64
def vec(seed_row):
    return rng.standard_normal(DIM).astype(np.float32).tolist()
emb_rows = []
for i in range(30):
    if i == 2 or i == 21:
        v = [0.0] * DIM                      # zero norm -> NULL cosine
    elif i == 3 or i == 20:
        v = None                             # NULL vector
    elif i == 22:
        v = rng.standard_normal(DIM // 2).astype(np.float32).tolist()  # ragged
    elif i == 23:
        v = rng.standard_normal(DIM).astype(np.float32).tolist()
        v[7] = None                          # NULL element
    elif i == 5:
        base = np.array(emb_rows[0][1], dtype=np.float32)
        v = (base * 2.0).astype(np.float32).tolist()  # collinear with id 0
    elif i == 6:
        base = np.array(emb_rows[0][1], dtype=np.float32)
        v = (-base).astype(np.float32).tolist()       # opposite of id 0
    else:
        v = vec(i)
    emb_rows.append((i, v, i % 4))
emb = pa.table({
    "vec_id": pa.array([r[0] for r in emb_rows], pa.int64()),
    "embedding": pa.array([r[1] for r in emb_rows], pa.list_(pa.float32())),
    "label": pa.array([r[2] for r in emb_rows], pa.int32()),
})
write_table(emb, "embeddings.parquet")
print(f"edge corpus at {out} ({len(rows)} degenerate docs, "
      f"{len(emb_rows)} degenerate embeddings, rest symlinked from {real})")
