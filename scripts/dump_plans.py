#!/usr/bin/env python
"""Generate EXPLAIN.md — formatted physical plans for the headline pipelines.

Evidence artifact: shows predicate pushdown / column pruning reaching the
parquet scans, ArrowEvalPython (vectorized, not per-row) for extraction,
partial+final hash aggregation around the single TF shuffle, broadcast
joins for small dims, and WholeStageCodegen coverage on the native paths.

Usage: python scripts/dump_plans.py [out_path]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_str(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "EXPLAIN.md")

    from pyspark.sql import functions as F

    from tribeca_insights_spark import entry_queries as EQ
    from tribeca_insights_spark.operators import tf as tfops
    from tribeca_insights_spark.operators.extract import (
        extract_pages,
        extract_token_strings,
    )
    from tribeca_insights_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[4]",
                      shuffle_partitions=8)

    docs = EQ.documents_as_pages(spark, SF_DIR)

    sections = [
        (
            "Extraction (full page_data)",
            "Scan → ArrowEvalPython → Project. No Exchange: extraction is "
            "embarrassingly parallel; partitioning is inherited from the "
            "url-hash-bucketed source scan.",
            extract_pages(docs),
        ),
        (
            "Corpus TF (salted two-stage)",
            "ArrowEvalPython ships ONE tokens_str per page; JVM literal "
            "split+explode; partial HashAggregate on (word, salt) before the "
            "only shuffle, tiny final combine after. Salt spreads Zipf-head "
            "words across reducers.",
            tfops.corpus_tf(extract_token_strings(docs), n_salts=8),
        ),
        (
            "Per-domain top-k keywords (window after salted agg)",
            "Window partition key (domain) is applied AFTER aggregation has "
            "collapsed rows to |domain × word|, so the skewed raw token "
            "stream never hits the window sort.",
            tfops.domain_top_keywords(
                extract_pages(docs, tokens=True), k=10, n_salts=8
            ),
        ),
        (
            "Pricing summary (q12): pushdown + pruning",
            "PushedFilters carries the shipdate predicate into the parquet "
            "scan; ReadSchema lists only the 5 referenced columns of 16.",
            EQ.QUERIES["q12_pricing_summary"](spark, SF_DIR),
        ),
        (
            "Top customers (q13): broadcast join",
            "customer broadcast to the orders side — no shuffle of the fact "
            "table for the join; only the aggregation exchanges.",
            EQ.QUERIES["q13_top_customers"](spark, SF_DIR),
        ),
        (
            "Resume anti-join (q10)",
            "Pending work = docs LEFT ANTI completed-log. Plans as a real "
            "(broadcast/shuffled-hash) anti join, never nested-loop.",
            EQ.QUERIES["q10_resume_pending"](spark, SF_DIR),
        ),
        (
            "LSH candidate pairs (q18): bucket equi-join",
            "Near-dup candidates come from an equi-join on (band, band_key) "
            "buckets — the 10^12-doc-safe alternative to any pairwise "
            "comparison.",
            EQ.QUERIES["q18_lsh_candidate_pairs"](spark, SF_DIR),
        ),
        (
            "TF-IDF (q42): broadcast df-dim join",
            "The |vocab|-sized document-frequency table broadcasts back onto "
            "per-doc TF — the big TF table never reshuffles for the join.",
            EQ.QUERIES["q42_tf_idf"](spark, SF_DIR),
        ),
        (
            "Readability main content (q44)",
            "Second extractor, same shuffle-free ArrowEvalPython shape as "
            "the parity extractor.",
            EQ.QUERIES["q44_main_content"](spark, SF_DIR),
        ),
        (
            "PII redaction (q71): shuffle-free narrow transform",
            "regexp_replace/extract_all chains codegen into the scan "
            "projection — zero Exchange, zero Python.",
            EQ.QUERIES["q71_pii_redaction"](spark, SF_DIR),
        ),
        (
            "DSIR importance (q72): broadcast weight dim",
            "One wide shuffle to (doc,bucket) counts; the <=1024-row "
            "LLR-weight dimension derives from it and BROADCASTS back — "
            "the corpus-sized side never reshuffles for the scoring join.",
            EQ.QUERIES["q72_dsir_importance"](spark, SF_DIR),
        ),
        (
            "Bigram-LM scoring (q73): LM-as-dataflow joins",
            "The 'model' is two aggregated count tables joined back onto "
            "the bigram stream (equi-joins, AQE-broadcastable); "
            "micro-quantized log-probs make the final sum order-free.",
            EQ.QUERIES["q73_bigram_lm_score"](spark, SF_DIR),
        ),
        (
            "Mixture sampling (q74): broadcast rate dim over the scan",
            "Per-source keep-rates broadcast; the md5-bucket filter sits "
            "directly above the scan — changing the mix never reshuffles "
            "the corpus.",
            EQ.QUERIES["q74_mixture_sample"](spark, SF_DIR),
        ),
        (
            "Keep-best retention (q75): partial-agg argmax, no window",
            "Survivor per duplicate cluster via groupBy + max(struct) — "
            "map-side combine reduces even a 10^6-copy boilerplate cluster "
            "to one candidate per input partition before the single "
            "shuffle; a window would sort every member.",
            EQ.QUERIES["q75_dedup_keep_best"](spark, SF_DIR),
        ),
        (
            "Token-budget allocation (q76): in-dataflow totals",
            "Both water-filling totals (weight sum, surplus pool) are "
            "1-row aggregates broadcast back — no driver round-trip; all "
            "arithmetic integer `div`, exact past 2^53.",
            EQ.QUERIES["q76_token_budget"](spark, SF_DIR),
        ),
        (
            "Hashed linear classifier (q77): zero-Exchange scoring",
            "The dot product runs inside F.aggregate over the token array "
            "— a narrow map directly above the scan. A trained model swaps "
            "the closed-form weight for a broadcast vector; plan shape "
            "unchanged.",
            EQ.QUERIES["q77_hashed_classifier"](spark, SF_DIR),
        ),
        (
            "Domain report card (q79): hash-window + partial-agg rollup",
            "Narrow per-doc features; duplicate flag from a count over the "
            "fixed-width md5 window; final rollup partial-aggregates on "
            "the domain key.",
            EQ.QUERIES["q79_domain_stats"](spark, SF_DIR),
        ),
        (
            "PageRank (q83): integer-exact rank propagation",
            "Per round: edges ⋈ ranks on src (one reused partitioning) → "
            "partial+final HashAggregate of integer contributions on dst "
            "→ left join back to nodes. No CartesianProduct, no driver "
            "graph; floor-div micros keep every round bit-exact.",
            EQ.QUERIES["q83_host_pagerank"](spark, SF_DIR),
        ),
        (
            "Anchor-text aggregation (q85): hash pair-count first",
            "ArrowEvalPython anchor parse → explode → codegen href "
            "resolution → HashAggregate on (target, anchor) pairs (count "
            "buffer only — min(string) would drop the raw stream onto "
            "SortAggregate) → tiny per-target rollup.",
            EQ.QUERIES["q85_anchor_texts"](spark, SF_DIR),
        ),
        (
            "Domain blocklist (q86): suffix-explode broadcast equi-join",
            "Host explodes into ≤ label-depth suffixes; broadcast hash "
            "join against the blocklist; per-doc min-entry groupBy. The "
            "LIKE/endswith nested-loop alternative never appears.",
            EQ.QUERIES["q86_domain_blocklist"](spark, SF_DIR),
        ),
        (
            "Boilerplate removal (q87): zero-shuffle block classification",
            "Scan → ArrowEvalPython (block segmenter) → Project — the "
            "block array never explodes; link-density/length "
            "classification and document-order re-join are "
            "filter/transform/array_join codegen. No Exchange anywhere.",
            EQ.QUERIES["q87_main_content"](spark, SF_DIR),
        ),
        (
            "Snapshot diff (q82): co-partitionable full-outer SMJ",
            "Both snapshots hash-partition on the page key; status is a "
            "codegen CASE over the joined fingerprints.",
            EQ.QUERIES["q82_snapshot_diff"](spark, SF_DIR),
        ),
    ]

    lines = [
        "# EXPLAIN — physical plans of the headline pipelines",
        "",
        f"Generated by `python scripts/dump_plans.py` at `{SF_DIR}` "
        "(plans are data-size-independent apart from AQE runtime choices; "
        "`isFinalPlan=false` marks pre-execution AQE plans).",
        "",
    ]
    for title, note, df in sections:
        lines += [f"## {title}", "", note, "", "```", plan_str(df).rstrip(), "```", ""]

    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
