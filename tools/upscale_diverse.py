#!/usr/bin/env python3
"""Bench-only DIVERSE corpus upscaler for the candidate-join families.

`upscale.py` replicates content verbatim — a deliberate duplicate-group
stress where every near-dup clique grows by the replication factor. That
is the right second decade for the cluster pipeline, but a poor third
decade for candidate GENERATION: at 100x verbatim replication every
band bucket is a 100x collision cluster, the BandCap/PostingCap guards
(correctly) drop them all, and the measurement collapses into the guard
path instead of the n-scaling of the joins.

This variant replicates documents/embeddings REP times with content
DECORRELATED per replica, so the corpus grows with ~REP-x distinct
shingle/signature universes — duplicate structure stays per-replica
(REP independent copies of the original cluster layout), which is how
a genuinely larger crawl behaves (duplication is local; boilerplate is
what the caps are for):

- documents: every token gets a replica-unique prefix (r<i>_), so
  replica i shares no shingles with replica j — n-gram/minhash
  candidates scale with corpus size, not clique size.
- embeddings: replica i's vector is the base vector ROTATED by i mod 64
  dims, sign-flipped for i >= 64 (128 distinct isometries >= any REP
  used here) — norms preserved, cross-replica cosines ~random.

Only documents + embeddings are written (Tables reads lazily; the
dd_* family touches nothing else).

The optional 4th arg picks the document decorrelation:

- mode "prefix" (default): the r<i>_ token prefix above. Grows every
  token by ~3-4 BYTES, which also grows every md5/shingle input — a
  confound when attributing a decade ratio to n-scaling vs per-row
  kernel cost.
- mode "perm": LENGTH-PRESERVING decorrelation — replica i applies a
  seeded random permutation of [a-z] (mirrored onto [A-Z], digits
  rotated by i) via translate(), so every document keeps its exact
  byte length and token lengths while replica vocabularies are
  pairwise ~disjoint. This is the control run for the md5-input-length
  artifact: under "perm" a linear kernel must show ~linear decades.

- mode "cluster": documents as in "prefix", but embeddings are a
  seeded mixture of Gaussians instead of replica isometries — the
  CLUSTERED corpus the rotate/flip modes deliberately avoid (those
  are the isotropic IVF worst case). 64 unit-norm centers, POWER-LAW
  cluster sizes (the big head cluster is the skewed-cell stress), and
  per-vector Gaussian noise at sigma = 0.5 of the center norm
  (within-cluster cosine ~0.89, cross-cluster ~0 +/- 1/8). This is the
  regime the fixed-probe ANN budget and the semdedup core collapse
  are designed for; the recall study runs it as the structured-data
  counterpoint to the isotropic decades.

Usage: python3 tools/upscale_diverse.py [src] [dst] [rep] [prefix|perm|cluster]
"""
import os
import random
import string
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdiv10"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "prefix"
    assert mode in ("prefix", "perm", "cluster"), mode

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    clustered = mode == "cluster"
    if clustered:
        mode = "prefix"  # documents keep the prefix decorrelation
    if mode == "perm":
        # one seeded alphabet permutation per replica (i = 0 stays
        # identity); case-mirrored, digits rotated — pure ASCII->ASCII,
        # so byte lengths are untouched
        lower = string.ascii_lowercase
        digits = string.digits
        arms = []
        for i in range(rep):
            if i == 0:
                arms.append("WHEN i = 0 THEN text")
                continue
            p = list(lower)
            random.Random(i).shuffle(p)
            perm = "".join(p)
            to = perm + perm.upper() + digits[i % 10:] + digits[:i % 10]
            frm = lower + lower.upper() + digits
            arms.append(f"WHEN i = {i} THEN translate(text, '{frm}', '{to}')")
        text_expr = "CASE " + " ".join(arms) + " END"
    else:
        text_expr = (
            "CASE WHEN i = 0 THEN text"
            " ELSE regexp_replace(text, '([^ ]+)', 'r' || i || '_\\1', 'g')"
            " END")

    dk = con.sql(f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
    copy(
        f"SELECT doc_id + i * {dk} AS doc_id,"
        f" {text_expr} AS text,"
        f" lang, source, n_chars"
        f" FROM '{src}/documents.parquet', range({rep}) t(i)", "documents")

    if clustered:
        write_cluster_embeddings(con, src, dst, rep)
        n = con.sql(
            f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
        print(f"embeddings: {n} rows (mixture-of-Gaussians)")
        return

    vk = con.sql(f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    copy(
        f"SELECT vec_id + i * {vk} AS vec_id,"
        f" list_transform(range(1, 65), j ->"
        f"   (embedding[1 + ((j - 1 + i) % 64)]"
        f"    * CASE WHEN i >= 64 THEN -1.0 ELSE 1.0 END)::FLOAT"
        f" ) AS embedding,"
        f" label"
        f" FROM '{src}/embeddings.parquet', range({rep}) t(i)", "embeddings")


def write_cluster_embeddings(con, src: str, dst: str, rep: int) -> None:
    """Seeded mixture of Gaussians: 64 unit centers, power-law cluster
    sizes (head cluster ~21 % of the corpus = the skewed-cell stress),
    per-vector noise sigma = 0.5, unit-normalized float32 output —
    same (vec_id BIGINT, embedding FLOAT[], label INT) schema, n =
    rep x the source corpus.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_n = con.sql(
        f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    n, dims, n_clusters, sigma = base_n * rep, 64, 64, 0.5
    rng = np.random.RandomState(9)
    centers = rng.standard_normal((n_clusters, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sizes = 1.0 / np.arange(1, n_clusters + 1)
    cid = rng.choice(n_clusters, size=n, p=sizes / sizes.sum())
    v = centers[cid] + rng.standard_normal((n, dims)) * (sigma / np.sqrt(dims))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dims, dims, dtype=np.int32)),
            pa.array(v.reshape(-1))),
        "label": pa.array(cid.astype(np.int32)),
    })
    pq.write_table(table, f"{dst}/embeddings.parquet")


if __name__ == "__main__":
    main()
