"""Deterministic scale-up of the driver's sf0.1 corpus tables for
scale-shape benchmarking (VERDICT r3 next-item 4): derives sfK directories
(K x rows) under /tmp from /root/testdata/sf0.1 WITHOUT inventing new data
distributions.

Replication discipline — the point is that per-query cost must grow
LINEARLY, so the scale-up must not manufacture super-linear work:

- documents: replica k remaps every word through a rotation of the corpus'
  own (tiny) vocabulary. Within a replica, every pairwise Jaccard /
  MinHash / SimHash / segment-hash relation of the original corpus is
  preserved EXACTLY (a vocab bijection is shingle-set-cardinality- and
  overlap-preserving), so dup clusters scale in COUNT (x K), not in size.
  Across replicas the guarantee differs by op family — measured at K=30:
  SHINGLE-SET ops (Jaccard, MinHash, segment hashes) see cross-replica
  pairs as pure noise because rotated shingles land in disjoint regions of
  shingle space (q26 emitted 7653 pairs = 29.9x its 1x 256 — exact); but
  SimHash keys on the word-FREQUENCY profile over the shared, fixed vocab,
  so cross-replica signatures stay correlated and hamming<=3 pairs grow
  super-linearly (q27: 100510 at 30x vs 14880 expected within-replica) —
  realistic, in fact, for real corpora whose vocab grows sublinearly, and
  handled by q27's banding (its WALL stays sub-linear, 0.34x/unit at 30x).
  doc_id offset = k * (max_id+1); source/lang carried over (source totals
  scale x K, preserving the mixture/packing axis).
- embeddings: replica k rolls the component order by k (norm- and
  within-replica-dot-product-preserving), vec_id offset likewise.

Usage: python tools/scale_up.py [K] [out_dir]  (default K=10 -> /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_UP_SRC", "/root/testdata/sf0.1")


def write_chunked(t: pa.Table, dst: str, rows_per_file: int = 1024) -> None:
    """Write as a many-file directory (cluster-realistic layout).

    One file = one row group = one atomic scan unit: a single-file,
    single-row-group table serializes every scan+project stage onto one
    task regardless of cores, which is a fixture artifact — at real scale
    tables are thousands of files with many row groups each. K x the data
    must come with K x the scan granularity or the 'scale-up' measures a
    lengthening serial stage, not the engine."""
    import math
    import shutil

    if os.path.exists(dst):
        shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
    os.makedirs(dst)
    n_files = max(1, math.ceil(t.num_rows / rows_per_file))
    step = math.ceil(t.num_rows / n_files)
    for i in range(n_files):
        pq.write_table(t.slice(i * step, step), os.path.join(dst, f"part-{i:05d}.parquet"))


def scale_documents(out_dir: str, k_reps: int, src: str = SRC) -> int:
    con = duckdb.connect()
    tbl = con.sql(f"SELECT * FROM '{src}/documents.parquet' ORDER BY doc_id")
    rows = tbl.fetchall()
    cols = [d[0] for d in tbl.description]
    i_id, i_text = cols.index("doc_id"), cols.index("text")
    vocab = sorted(
        {w for r in rows for w in r[i_text].split(" ") if w}
    )
    stride = max(r[i_id] for r in rows) + 1
    out_rows = []
    for k in range(k_reps):
        rot = {w: vocab[(i + k) % len(vocab)] for i, w in enumerate(vocab)}
        for r in rows:
            r = list(r)
            r[i_id] = r[i_id] + k * stride
            if k:  # replica 0 is the original corpus byte-for-byte
                # rot.get: vocab excludes '' but split(' ') can yield it for
                # leading/trailing/double spaces — pass such tokens through
                # unchanged instead of KeyError (r4 ADVICE)
                r[i_text] = " ".join(rot.get(w, w) for w in r[i_text].split(" "))
            out_rows.append(tuple(r))
    arrs = list(zip(*out_rows))
    schema = tbl.arrow().schema
    t = pa.table(
        {c: pa.array(arrs[i], type=schema.field(c).type) for i, c in enumerate(cols)}
    )
    write_chunked(t, os.path.join(out_dir, "documents.parquet"))
    return len(out_rows)


def scale_embeddings(out_dir: str, k_reps: int, src: str = SRC) -> int:
    t = pq.read_table(f"{src}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    stride = int(ids.max()) + 1
    all_ids, all_emb = [], []
    for k in range(k_reps):
        all_ids.append(ids + k * stride)
        all_emb.append(np.roll(emb, k, axis=1))
    ids_o = np.concatenate(all_ids)
    emb_o = np.concatenate(all_emb)
    out = pa.table(
        {
            "vec_id": pa.array(ids_o, type=t.schema.field("vec_id").type),
            "embedding": pa.array(
                [row.tolist() for row in emb_o],
                type=t.schema.field("embedding").type,
            ),
        }
    )
    write_chunked(out, os.path.join(out_dir, "embeddings.parquet"))
    return len(ids_o)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    nd = scale_documents(out_dir, k)
    ne = scale_embeddings(out_dir, k)
    print(f"{out_dir}: documents={nd} embeddings={ne} (K={k})")


if __name__ == "__main__":
    main()
