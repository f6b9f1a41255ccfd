"""BPE-style adjacent-pair counting — tokenizer training, step one.

Beyond-reference capability (task brief: LLM-data-pipeline operators).
Byte-pair-encoding tokenizer training repeats one primitive at corpus
scale: count adjacent symbol pairs weighted by word frequency, merge
the argmax.  This operator is that primitive as DataFrame algebra; the
merge loop itself is a driver-side iteration over a |V|-sized table
(vocabulary, not corpus), so the corpus is touched exactly once.

Scale shape (10^12 docs):

- the ONE corpus-sized operation is the word-frequency groupBy (same
  partial-agg shuffle as corpus TF, map-side combined — identical to
  operators/tf.py:61's proven shape);
- everything after operates on the DISTINCT-WORD table (|V| rows —
  millions, not trillions): position explode × pair substring ×
  weighted count is |V|·avg_len work, trivially parallel;
- top-k plans as TakeOrderedAndProject, never a global sort.

Pairs are adjacent CHARACTER bigrams within a word (no end-of-word
marker — documented simplification; adding one is a concat before the
explode and changes no plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bpe_pair_counts(
    docs: DataFrame,
    topk: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(pair, pair_count, n_words): top-``topk`` adjacent character
    pairs across the corpus, weighted by word occurrence count.

    ``pair_count`` sums the word frequency over every position the
    pair occurs at (a pair appearing twice inside one word counts
    twice per occurrence — standard BPE accounting); ``n_words`` is
    the number of distinct vocabulary words containing the pair.
    Ties at the k boundary break on pair ascending.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    # corpus-sized shuffle #1 and only: word frequencies (|V|-row output)
    vocab = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    # |V|-sized from here on: explode positions, cut 2-char substrings
    pos = vocab.filter(F.length("word") > 1).select(
        "word",
        "freq",
        F.explode(
            F.sequence(F.lit(1), F.length("word") - 1)
        ).alias("i"),
    )
    pairs = pos.select(
        F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"),
        "word",
        "freq",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").alias("pair_count"),
        F.countDistinct("word").alias("n_words"),
    )
    return agg.orderBy(F.desc("pair_count"), F.asc("pair")).limit(topk)
