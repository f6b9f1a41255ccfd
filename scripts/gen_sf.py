#!/usr/bin/env python
"""Deterministic synthetic-table generator for out-of-driver scale factors.

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only). The r4
verdict's top ask is an sf1 scale soak — 10x sf0.1 — so this script
synthesizes `documents` and `embeddings` parquet with the SAME shape and
marginals as the driver tables (measured from sf0.1 with DuckDB):

* documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
  n_chars BIGINT): text = 10..100 uniform draws from the same 30-word
  vocabulary; lang ~ {en:.41, zh/es/fr/de:~.148}; source = src{doc_id%20};
  ~0.16% of docs are exact duplicates of their predecessor (sf0.1 has 8
  dup pairs per 5000 docs — the dedup operators need a realistic, not
  replicated, duplicate structure at 10x); the rare token 'dup' appears at
  its sf0.1 rate (~0.09% of tokens).
* embeddings(vec_id BIGINT, embedding FLOAT[64], label INT): unit-norm
  Gaussian vectors, labels uniform 0..9.

Seed-fixed (42): identical output on every run. No external data.

Usage: python scripts/gen_sf.py <out_dir> <sf>     # e.g. out/testdata_sf1 1.0
"""

from __future__ import annotations

import math
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
DUP_RATE = 8 / 5000  # exact-duplicate pair rate measured at sf0.1
DUP_TOKEN_RATE = 255 / 270_000  # 'dup' token rate measured at sf0.1


def gen_documents(n: int, seed: int = 42):
    rng = random.Random(seed)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    prev_text = None
    for i in range(n):
        if prev_text is not None and rng.random() < DUP_RATE:
            text = prev_text  # exact duplicate of the predecessor
        else:
            wc = rng.randint(10, 100)
            words = rng.choices(VOCAB, k=wc)
            for j in range(wc):
                if rng.random() < DUP_TOKEN_RATE:
                    words[j] = "dup"
            text = " ".join(words)
        prev_text = text
        ids.append(i)
        texts.append(text)
        langs.append(rng.choices(LANGS, LANG_W)[0])
        sources.append(f"src{i % 20}")
        n_chars.append(len(text))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 43):
    rng = random.Random(seed)
    vec_ids, vecs, labels = [], [], []
    for i in range(n):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        vec_ids.append(i)
        vecs.append([x / nrm for x in v])
        labels.append(rng.randrange(10))
    return pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def main() -> None:
    out_dir = sys.argv[1]
    sf = float(sys.argv[2])
    n_docs = int(50_000 * sf / 1.0)
    n_emb = int(20_000 * sf / 1.0)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(gen_documents(n_docs), f"{out_dir}/documents.parquet")
    pq.write_table(gen_embeddings(n_emb), f"{out_dir}/embeddings.parquet")
    print(f"wrote {out_dir}: documents={n_docs} embeddings={n_emb}")


if __name__ == "__main__":
    main()
