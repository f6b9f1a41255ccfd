"""Frozen, hermetic stopword provider.

The reference loads NLTK stopword corpora at runtime with a network
download and falls back to small built-in sets when the corpus is
unavailable (tribeca_insights/text_utils.py:44-48, 75-96). A distributed
engine cannot depend on per-executor downloads, so we vendor the lists as
repo data and broadcast them.

Two profiles:

* ``compat`` (default) — exactly the reference's hermetic behavior: its
  ``FALLBACK_STOPWORDS`` sets for english/spanish/portuguese
  (text_utils.py:44-48) and the empty set otherwise. This is what the
  reference CLI produces in an offline environment and is the profile the
  golden-parity tests and the DuckDB oracles pin.
* ``extended`` — a fuller English function-word list used by the
  training-data quality/lang-id operators, where richer filtering beats
  strict reference parity. Makes no NLTK-equivalence claim.

CLI language codes map per text_utils.py:24-35.
"""

from __future__ import annotations

from functools import lru_cache
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

# Reference FALLBACK_STOPWORDS, text_utils.py:44-48 — normative for `compat`.
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


@lru_cache(maxsize=None)
def get_stopwords(language: str, profile: str = "compat") -> FrozenSet[str]:
    """Stopword set for a CLI language code (mirrors text_utils.py:75-96:
    unknown codes pass through the map unchanged, missing corpora → empty)."""
    lang_key = LANGUAGE_MAP.get(language, language)
    table = COMPAT_STOPWORDS if profile == "compat" else EXTENDED_STOPWORDS
    return table.get(lang_key, frozenset())
