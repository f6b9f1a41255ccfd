"""Text normalization — control/zero-width stripping + whitespace collapse.

Beyond-reference capability (task brief): raw web text carries C0 control
bytes, zero-width joiners, and BOMs that survive HTML extraction and
poison tokenizers and dedup hashes downstream (two byte-different copies
of the same page must hash equal AFTER normalization). The reference only
ever collapses whitespace (extractor.py's ``' '.join(split())``); this is
the fuller cleanup every pre-training pipeline runs first.

Pure Column expressions (two ``regexp_replace`` + ``trim`` — narrow,
codegen'd, shuffle-free). The character classes are written in both Java
regex (Spark) and RE2 (DuckDB oracle) forms; keep them in sync:

  strip:  C0 controls except \\t \\n \\r, DEL, U+200B..U+200D, U+FEFF
  collapse: runs of ``\\s`` to one space, then trim
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Java-regex (Spark) form
CONTROL_CLASS = (
    "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u007F"
    "\\u200B-\\u200D\\uFEFF]"
)
# RE2 (DuckDB) form of the same class — for oracle SQL
CONTROL_CLASS_RE2 = (
    r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]"
)


def strip_controls(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, CONTROL_CLASS, "")


def normalize_text_col(col) -> Column:
    """Strip junk characters, collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(strip_controls(col), r"\s+", " "))


def with_normalized_text(df, text_col: str = "text",
                         out_col: str = "norm_text"):
    """Adds ``out_col`` plus ``n_junk_chars`` (how many characters the
    control/zero-width strip removed — a cheap corruption signal worth
    keeping as a quality feature)."""
    c = F.col(text_col)
    return df.withColumn(out_col, normalize_text_col(c)).withColumn(
        "n_junk_chars",
        (F.length(c) - F.length(strip_controls(c))).cast("long"),
    )


# --- Unicode NFC normalization (Arrow-batched; stdlib unicodedata) ----------

def _nfc_batch(texts):
    import unicodedata

    import pandas as pd

    return pd.Series(
        [
            unicodedata.normalize("NFC", t) if t is not None else None
            for t in texts
        ]
    )


def nfc_udf():
    """Pandas UDF computing Unicode NFC — built lazily so importing this
    module never requires an active SparkSession."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    return pandas_udf(_nfc_batch, StringType())


def with_nfc_text(df, text_col: str = "text", out_col: str = "nfc_text"):
    """Adds ``out_col`` = NFC(text) plus ``nfc_changed`` — canonical
    composition (combining marks fold into precomposed codepoints) so
    hash-based dedup and token matching treat 'e'+U+0301 and 'é' as the
    SAME text. Web corpora mix both forms (editor/OS dependent); skipping
    this step silently splits duplicate clusters. Arrow-batched stdlib
    ``unicodedata`` — the canonical tables themselves, not a
    reimplementation; the q101 oracle cross-checks against DuckDB's
    independent ``nfc_normalize`` implementation."""
    c = F.col(text_col)
    out = df.withColumn(out_col, nfc_udf()(c))
    return out.withColumn("nfc_changed", F.col(out_col) != c)
