"""Frozen, hermetic stopword provider.

The reference loads NLTK stopword corpora at runtime with a network
download and falls back to small built-in sets when the corpus is
unavailable (tribeca_insights/text_utils.py:44-48, 75-96). A distributed
engine cannot depend on per-executor downloads, so we vendor the lists as
repo data and broadcast them.

Three profiles:

* ``compat`` (default) — exactly the reference's hermetic behavior: its
  ``FALLBACK_STOPWORDS`` sets for english/spanish/portuguese
  (text_utils.py:44-48) and the empty set otherwise. This is what the
  reference CLI produces in an offline environment and is the profile the
  golden-parity tests and most DuckDB oracles pin.
* ``nltk`` — the reference's PRIMARY path (corpora present): full
  per-language NLTK Stopwords Corpus lists, vendored under
  ``tribeca_insights_spark/data/stopwords/`` (public corpus data; the
  copies ship inside Apache Spark's MLlib jar with the NLTK corpus README —
  Snowball-derived, English augmented per nltk/nltk_data#22, identical
  content to ``nltk.corpus.stopwords.words(lang)``). With the explicit
  opt-in ``TRIBECA_SPARK_NLTK_RUNTIME=1``, a real NLTK data directory
  (``$NLTK_DATA`` or ``~/nltk_data``) takes precedence, giving exact
  parity with whatever corpus version the environment installed — opt-in
  only, because per-executor nltk_data installs can differ from the
  driver's and would silently skew tokenization vs driver-built oracles. Languages with
  no list (chinese/japanese/arabic here) degrade exactly like the offline
  reference: fallback set if one exists, else empty
  (text_utils.py:84-96).
* ``extended`` — a fuller English function-word list used by the
  training-data quality/lang-id operators, where richer filtering beats
  strict reference parity. Makes no NLTK-equivalence claim.

CLI language codes map per text_utils.py:24-35.
"""

from __future__ import annotations

import os
from functools import lru_cache
from importlib import resources
from typing import Dict, FrozenSet

LANGUAGE_MAP: Dict[str, str] = {
    "en": "english",
    "pt-br": "portuguese",
    "pt": "portuguese",
    "es": "spanish",
    "fr": "french",
    "it": "italian",
    "de": "german",
    "zh-cn": "chinese",
    "zh": "chinese",
    "ja": "japanese",
    "ru": "russian",
    "ar": "arabic",
}

PROFILES = ("compat", "nltk", "extended")

# Reference FALLBACK_STOPWORDS, text_utils.py:44-48 — normative for `compat`
# and the degraded path of `nltk`.
COMPAT_STOPWORDS: Dict[str, FrozenSet[str]] = {
    "english": frozenset({"the", "a", "and", "of", "is", "this"}),
    "spanish": frozenset({"y", "de", "la", "que"}),
    "portuguese": frozenset({"e", "de", "que", "o"}),
}

# Extended English function words (common-knowledge list, not NLTK-pinned).
EXTENDED_EN = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own same she should so some such than that the their
    theirs them themselves then there these they this those through to too
    under until up very was we were what when where which while who whom why
    will with you your yours yourself yourselves""".split()
)

EXTENDED_STOPWORDS: Dict[str, FrozenSet[str]] = dict(COMPAT_STOPWORDS)
EXTENDED_STOPWORDS["english"] = EXTENDED_EN


def _nltk_data_file(lang_key: str) -> str | None:
    """Path to a real NLTK corpus file for ``lang_key`` — ONLY when the
    runtime override is explicitly enabled via
    ``TRIBECA_SPARK_NLTK_RUNTIME=1`` (``$NLTK_DATA`` dirs, then
    ``~/nltk_data``), else None.

    Gated because in a multi-node cluster each executor evaluates this
    independently: an executor with a different (or absent) nltk_data
    install than the driver would silently tokenize with a different
    stopword set than driver-built oracle literals. Default = the vendored
    package copy, which ships identically to every executor via
    ``--py-files``, so driver and executors always agree."""
    if os.environ.get("TRIBECA_SPARK_NLTK_RUNTIME", "") != "1":
        return None
    candidates = [
        p for p in os.environ.get("NLTK_DATA", "").split(os.pathsep) if p
    ]
    candidates.append(os.path.join(os.path.expanduser("~"), "nltk_data"))
    for base in candidates:
        path = os.path.join(base, "corpora", "stopwords", lang_key)
        if os.path.isfile(path):
            return path
    return None


@lru_cache(maxsize=None)
def _load_full_list(lang_key: str) -> FrozenSet[str] | None:
    """Full stopword list for an NLTK language key: runtime NLTK corpus if
    installed, else the vendored copy; None when neither exists."""
    runtime = _nltk_data_file(lang_key)
    if runtime is not None:
        with open(runtime, encoding="utf-8") as fh:
            return frozenset(w for w in (ln.strip() for ln in fh) if w)
    ref = resources.files("tribeca_insights_spark").joinpath(
        "data", "stopwords", f"{lang_key}.txt"
    )
    try:
        text = ref.read_text(encoding="utf-8")
    except FileNotFoundError:
        return None
    return frozenset(w for w in (ln.strip() for ln in text.splitlines()) if w)


@lru_cache(maxsize=None)
def get_stopwords(language: str, profile: str = "compat") -> FrozenSet[str]:
    """Stopword set for a CLI language code (mirrors text_utils.py:75-96:
    unknown codes pass through the map unchanged; ``nltk`` profile degrades
    corpus → fallback set → empty exactly like the reference)."""
    if profile not in PROFILES:
        raise ValueError(f"unknown stopword profile {profile!r}")
    lang_key = LANGUAGE_MAP.get(language, language)
    if profile == "nltk":
        full = _load_full_list(lang_key)
        if full is not None:
            return full
        return COMPAT_STOPWORDS.get(lang_key, frozenset())
    table = COMPAT_STOPWORDS if profile == "compat" else EXTENDED_STOPWORDS
    return table.get(lang_key, frozenset())
