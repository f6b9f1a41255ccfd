"""Text analysis operators for training-data pipelines.

Beyond-reference capability (task brief): language-ID (marker-word
heuristic), quality scoring (length / lexical-diversity / stopword ratios),
token counting, and document fingerprinting. Everything is expressible in
closed-form SQL (DuckDB oracles) and deterministic across engines: counts
and integer arithmetic, doubles only at final rounded ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Marker function words per language (tiny on purpose — broadcastable,
# closed-form; a production langid swaps in bigger tables, same plumbing).
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "this", "that", "with"),
    "es": ("que", "la", "de", "los", "las", "una"),
    "pt": ("que", "de", "não", "uma", "os", "das"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
}

# Stopword list used for the quality stopword-ratio signal (extended EN).
_QUALITY_STOPS = (
    "the", "a", "and", "of", "is", "this", "that", "to", "in", "it",
)


def _ws_words(text_col):
    """Whitespace tokens of a raw text column (split on single spaces after
    collapse is NOT applied — counting semantics: chunks between spaces)."""
    return F.filter(F.split(text_col, " ", -1), lambda w: F.length(w) > 0)


def lang_guess(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, lang_guess, best_score): argmax of marker-word hits per language,
    ties broken by language code ascending ('none' when zero hits)."""
    words = df.select(
        F.col(id_col), F.explode(_ws_words(F.lower(F.col(text_col)))).alias("w")
    )
    scores = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("w").isin(*LANG_MARKERS[lang]), 1).otherwise(0)
            ).alias(f"s_{lang}")
            for lang in sorted(LANG_MARKERS)
        ]
    )
    langs = sorted(LANG_MARKERS)
    pairs = F.array(
        *[F.struct(F.col(f"s_{lg}").alias("s"), F.lit(lg).alias("lg")) for lg in langs]
    )
    best = F.array_sort(
        pairs, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1)
        .when(a["lg"] < b["lg"], -1).when(a["lg"] > b["lg"], 1).otherwise(0)
    )[0]
    return scores.select(
        F.col(id_col),
        F.when(best["s"] > 0, best["lg"]).otherwise(F.lit("none")).alias("lang_guess"),
        best["s"].cast("bigint").alias("best_score"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_words, n_distinct_words, type_token_ratio,
    stopword_ratio, mean_word_len, quality_ok) — standard pre-training
    quality gates (C4-style thresholds, closed-form)."""
    words = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.explode(_ws_words(F.lower(F.col(text_col)))).alias("w"),
    )
    agg = words.groupBy(id_col, "n_chars").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("n_distinct_words"),
        F.sum(F.when(F.col("w").isin(*_QUALITY_STOPS), 1).otherwise(0)).alias("n_stop"),
        F.sum(F.length("w")).alias("sum_len"),
    )
    return agg.select(
        F.col(id_col),
        "n_chars",
        "n_words",
        "n_distinct_words",
        F.round(F.col("n_distinct_words") / F.col("n_words").cast("double"), 4).alias(
            "type_token_ratio"
        ),
        F.round(F.col("n_stop") / F.col("n_words").cast("double"), 4).alias(
            "stopword_ratio"
        ),
        F.round(F.col("sum_len") / F.col("n_words").cast("double"), 4).alias(
            "mean_word_len"
        ),
        (
            (F.col("n_words") >= 10)
            & (F.col("n_distinct_words") / F.col("n_words").cast("double") >= 0.2)
        ).alias("quality_ok"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_word_tokens): raw char count, whitespace
    chunks, and letter-run tokens (the BPE-ish pre-token count — letter runs
    approximate merge input units)."""
    ws = _ws_words(F.col(text_col))
    # letter runs via the same keep-class split as the tokenizer
    runs = F.filter(
        F.split(F.col(text_col), "[^A-Za-zÀ-ÿ]+", -1), lambda w: F.length(w) > 0
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(ws).alias("n_ws_tokens"),
        F.size(runs).alias("n_word_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 16) -> DataFrame:
    """(id, content_md5, min_gram_hash): full-content hash plus the minimum
    md5 over character k-grams of the lowercased text — a 1-hash minhash
    usable as a cheap near-dup fingerprint (winnowing-lite)."""
    norm = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("s"))
    grams = norm.select(
        F.col(id_col), "s",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("s") - (k - 1), F.lit(1)))
        ).alias("i"),
    ).select(
        F.col(id_col),
        F.md5(F.encode(F.substring(F.col("s"), F.col("i"), k), "UTF-8")).alias("gh"),
    )
    mins = grams.groupBy(id_col).agg(F.min("gh").alias("min_gram_hash"))
    full = norm.select(
        F.col(id_col), F.md5(F.encode(F.col("s"), "UTF-8")).alias("content_md5")
    )
    return full.join(mins, id_col)
