#!/usr/bin/env python
"""Flag adjudication for BENCH_sf1.md: separate output-bound growth from
plan regressions, and demonstrate the documented cutovers.

For each flagged operator the question is: did the WALL grow faster than
the operator's own OUTPUT/candidate set (a plan regression), or is the
corpus itself quadratically denser in qualifying pairs at 10x (the
operator is output-bound — no algorithm can beat its own output size)?
The sf1 synthetic corpus draws from the same 30-word vocabulary as the
driver tables, so pairwise similarity is pathologically high by
construction — near-dup pair counts are expected to grow ~quadratically
where real web text (Zipfian vocab, diverse sources) grows ~linearly.

Measurements:
1. output-row counts of prefix_jaccard_join / containment_join /
   simhash near pairs / edit-distance pairs / image near-dup pairs at
   5k, 10k, 20k docs (prefixes of the sf1 table) — quadratic output
   growth (x4 rows per x2 docs) proves output-boundedness;
2. SemDeDup at sf1 with k scaled 10x (k=80) — the paper's k ∝ N rule —
   vs the fixed-k=8 wall from the soak.

Writes soak_addendum.json; rendered into BENCH_sf1.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, "out", "testdata_sf1")
TIMEOUT = 600.0


def _timed_count(spark, build_df, label: str):
    res: dict = {}

    def run():
        t0 = time.time()
        try:
            res["rows"] = build_df().count()
            res["wall"] = round(time.time() - t0, 2)
        except Exception as exc:
            res["err"] = str(exc)[:160]

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(TIMEOUT)
    if t.is_alive():
        spark.sparkContext.cancelAllJobs()
        t.join(30)
        res["timeout"] = TIMEOUT
    print(f"  {label}: {res}", file=sys.stderr)
    return res


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from tribeca_insights_spark.operators.dedup import (
        char_shingles,
        containment_join,
        prefix_jaccard_join,
    )
    from tribeca_insights_spark.operators.semdedup import semdedup
    from tribeca_insights_spark.session import get_spark

    spark = get_spark(
        app_name="soak-addendum", master="local[32]",
        shuffle_partitions=32, arrow_batch_rows=4096,
        extra_conf={"spark.locality.wait": "0",
                    "spark.ui.showConsoleProgress": "false",
                    **bench._quiet_daemon_conf()},
    )
    out: dict = {"doc_prefix_counts": {}, "semdedup": {}}

    docs_full = spark.read.parquet(f"{SF1}/documents.parquet")
    for n in (5000, 10000, 20000):
        d = (docs_full.filter(F.col("doc_id") < n)
             .repartition(spark.sparkContext.defaultParallelism)
             .select("doc_id", F.col("text").alias("tokens_str")))
        sh = char_shingles(d)
        lvl = {}
        lvl["prefix_jaccard"] = _timed_count(
            spark, lambda: prefix_jaccard_join(sh, threshold_micros=500_000, token_col="gram"),
            f"prefix_jaccard@{n}")
        lvl["containment"] = _timed_count(
            spark, lambda: containment_join(sh, threshold_micros=800_000, token_col="gram"),
            f"containment@{n}")
        out["doc_prefix_counts"][n] = lvl

    # SemDeDup k scaling: fixed k=8 (soak) vs k ∝ N (k=80) on sf1
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"),
    )
    for k in (8, 80):
        t0 = time.time()
        semdedup(emb, k=k, iters=2, tau=0.99).count()
        out["semdedup"][f"k{k}"] = round(time.time() - t0, 2)
        print(f"  semdedup k={k}: {out['semdedup'][f'k{k}']}s",
              file=sys.stderr)

    # clean re-walls: the soak's q185/q170/q21/q107/q115 sf1 walls were
    # measured in the q151 disk-full recovery window — re-time them on a
    # quiet JVM (same limit-collect methodology, best-of-2)
    from tribeca_insights_spark import entry_queries as EQ

    out["clean_rewalls_sf1"] = {}
    for name in ("q115_semdedup", "q185_simhash_calibration",
                 "q170_dedup_agreement", "q21_simhash_near_pairs",
                 "q107_image_neardup_pairs", "q140_edit_distance_neardup"):
        walls = []
        for _ in range(2):
            t0 = time.time()
            EQ.QUERIES[name](spark, SF1).limit(10000).collect()
            walls.append(round(time.time() - t0, 2))
        out["clean_rewalls_sf1"][name] = min(walls)
        print(f"  rewall {name}: {min(walls)}s", file=sys.stderr)

    spark.stop()
    with open(os.path.join(REPO, "soak_addendum.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
