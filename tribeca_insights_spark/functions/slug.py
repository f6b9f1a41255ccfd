"""URL-path slug derivation — reference ``slugify(urlparse(url).path or
"home")`` (crawler.py:77, 145; storage.py:129).

Reimplements the subset of python-slugify semantics the reference exercises
(URL paths): NFKD-decompose and drop combining marks (ASCII transliteration
of Latin accents), lowercase, every run of non-alphanumerics → single ``-``,
trim ``-``. Empty path → ``"home"`` before slugging; a bare ``"/"`` path
slugifies to ``""`` (edge preserved, SURVEY.md §2.2 O10).
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import urlparse

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def slugify(value: str) -> str:
    value = unicodedata.normalize("NFKD", value)
    value = "".join(c for c in value if not unicodedata.combining(c))
    value = value.encode("ascii", "ignore").decode("ascii").lower()
    return _NON_ALNUM.sub("-", value).strip("-")


def url_slug(url: str) -> str:
    """crawler.py:77 — ``slugify(urlparse(url).path or "home")``."""
    return slugify(urlparse(url).path or "home")
