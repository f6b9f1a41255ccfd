#!/usr/bin/env python
"""Round-3 soak evidence: prove the flagged walls are CANDIDATE-bound and
demonstrate the corpus-scale cutovers.

1. LSH band-bucket candidate-pair counts at 5k/20k/50k docs of the sf1
   table: if candidates grow ~quadratically while outputs stay linear
   (round-2 result: 10→34 qualifying pairs), the corpus itself is
   adversarially self-similar (uniform 30-word vocab) and every
   pair-verification wall tracks its candidate set — the engine adds no
   super-linear overhead of its own.
2. The banded cutover (ngram_jaccard_pairs = LSH generator + exact
   verify on banded candidates only) walls at the same three sizes.
3. SemDeDup k ∝ N (k=80) at sf1 with the soak's limit-collect
   methodology, vs the fixed-k=8 wall (q115's 121 s clean re-wall).

Writes soak_addendum2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, "out", "testdata_sf1")


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.dedup import (
        char_shingles,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from tribeca_insights_spark.operators.semdedup import semdedup
    from tribeca_insights_spark.session import get_spark

    spark = get_spark(
        app_name="soak-addendum2", master="local[32]",
        shuffle_partitions=32, arrow_batch_rows=4096,
        extra_conf={"spark.locality.wait": "0",
                    "spark.ui.showConsoleProgress": "false",
                    **bench._quiet_daemon_conf()},
    )
    out: dict = {"lsh_candidates": {}, "banded_cutover": {}, "semdedup": {}}

    docs_full = spark.read.parquet(f"{SF1}/documents.parquet")
    for n in (5000, 20000, 50000):
        d = (docs_full.filter(F.col("doc_id") < n)
             .repartition(spark.sparkContext.defaultParallelism)
             .select("doc_id", F.col("text").alias("tokens_str")))
        sh = char_shingles(d)
        bands = lsh_bands(minhash_signatures(sh, n_hashes=12),
                          rows_per_band=4)
        cand = lsh_candidate_pairs(bands)
        t0 = time.time()
        n_cand = cand.count()
        out["lsh_candidates"][n] = {"pairs": n_cand,
                                    "wall": round(time.time() - t0, 2)}
        print(f"  lsh_candidates@{n}: {out['lsh_candidates'][n]}",
              file=sys.stderr)

        # banded cutover: exact Jaccard verify CONFINED to candidates —
        # candidates drive from the left so the gram join never goes
        # corpus x corpus (q129's production shape)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
        ga = sh.select(F.col("doc_id").alias("a_id"), "gram")
        gb = sh.select(F.col("doc_id").alias("b_id"), "gram")
        inter = (cand.join(ga, "a_id").join(gb, ["b_id", "gram"])
                 .groupBy("a_id", "b_id").agg(F.count("*").alias("ni")))
        verified = (
            inter
            .join(sizes.select(F.col("doc_id").alias("a_id"),
                               F.col("sz").alias("sa")), "a_id")
            .join(sizes.select(F.col("doc_id").alias("b_id"),
                               F.col("sz").alias("sb")), "b_id")
            .filter(F.expr("ni * 1000000 >= 500000 * (sa + sb - ni)"))
        )
        t0 = time.time()
        rows = verified.limit(10000).collect()
        out["banded_cutover"][n] = {"wall": round(time.time() - t0, 2),
                                    "pairs": len(rows)}
        print(f"  banded_cutover@{n}: {out['banded_cutover'][n]}",
              file=sys.stderr)

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"),
    )
    for k in (8, 80):
        t0 = time.time()
        semdedup(emb, k=k, iters=2, tau=0.99).limit(10000).collect()
        out["semdedup"][f"k{k}"] = round(time.time() - t0, 2)
        print(f"  semdedup k={k}: {out['semdedup'][f'k{k}']}s",
              file=sys.stderr)

    spark.stop()
    with open(os.path.join(REPO, "soak_addendum2.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
