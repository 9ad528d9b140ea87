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

Usage: python3 tools/upscale_diverse.py [src] [dst] [rep] [prefix|perm]
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
    assert mode in ("prefix", "perm"), mode

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

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

    vk = con.sql(f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    copy(
        f"SELECT vec_id + i * {vk} AS vec_id,"
        f" list_transform(range(1, 65), j ->"
        f"   (embedding[1 + ((j - 1 + i) % 64)]"
        f"    * CASE WHEN i >= 64 THEN -1.0 ELSE 1.0 END)::FLOAT"
        f" ) AS embedding,"
        f" label"
        f" FROM '{src}/embeddings.parquet', range({rep}) t(i)", "embeddings")


if __name__ == "__main__":
    main()
