"""Deterministic synthetic web-page corpus (seed-fixed, no external data).

Generates Common-Crawl-style rows matching the input_hint schema
``(url, warc_ts, html binary, text, lang)`` plus a golden-oracle record per
page computed by the same pure-Python extraction core the tests pin against
the reference's behavior. The corpus is intentionally nasty: entities,
comments, unclosed tags, nested nav/header, CJK/Cyrillic text, skewed
domains (one domain carries ~40% of pages to make salting observable —
SURVEY.md §7.3).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Dict, List

VOCAB = (
    "widget gadget catalog quality premium grande seleção coração ação "
    "melhor cidade onde comprar precio calidad mejor ciudad donde acheter "
    "qualité meilleur ville kaufen qualität beste stadt data table query "
    "spark engine extract crawl index report keyword frequency domain page "
    "analytics insight tribeca search optimize content meta title heading"
).split()

CJK = "日本語テキスト処理"
CYR = "привет мир данные"

LANGS = ["en", "pt-br", "es", "fr", "de"]

DOMAINS = (
    ["hot-domain.com"] * 8  # skewed: ~40% of pages
    + ["alpha.example.com", "beta.example.org", "gamma.example.net",
       "delta.shop", "epsilon.blog", "zeta.io", "eta.dev", "theta.store",
       "iota.news", "kappa.site", "lambda.app", "mu.page"]
)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(n))


def make_html(rng: random.Random, i: int, domain: str, lang: str) -> Dict[str, str]:
    """One synthetic page; returns dict(url, html)."""
    path = f"/{rng.choice(['products', 'blog', 'docs', 'about'])}/" + "-".join(
        rng.sample(VOCAB, 2)
    ) + f"/{i}"
    url = f"https://{domain}{path}"
    title = _words(rng, rng.randint(2, 5)).title()
    meta = _words(rng, rng.randint(4, 10))
    n_paras = rng.randint(1, 6)
    paras = []
    for _ in range(n_paras):
        body = _words(rng, rng.randint(10, 60))
        if rng.random() < 0.15:
            body += " " + CJK
        if rng.random() < 0.15:
            body += " " + CYR
        if rng.random() < 0.3:
            body += " AT&amp;T R&amp;D"
        if rng.random() < 0.2:
            body += f" Price: {rng.randint(1, 999)},99"
        paras.append(f"<p>{body}</p>")
    headings = "".join(
        "<h{l}>{t}</h{l}>".format(l=rng.randint(1, 3), t=_words(rng, rng.randint(1, 4)).title())
        for _ in range(rng.randint(0, 3))
    )
    nav_links = "".join(
        f'<a href="/nav/{w}">{w}</a>' for w in rng.sample(VOCAB, 3)
    )
    ext = "".join(
        f'<a href="https://{rng.choice(["ref.partner.net", "cdn.assets.io", "social.example"])}/{w}">{w}</a>'
        for w in rng.sample(VOCAB, rng.randint(0, 3))
    )
    internal = "".join(
        f'<a href="https://{domain}/{w}">{w}</a>' for w in rng.sample(VOCAB, 2)
    )
    imgs = "".join(
        f'<img src="/img/{w}.png" alt="{w} picture">' for w in rng.sample(VOCAB, rng.randint(0, 2))
    )
    nasty = ""
    r = rng.random()
    if r < 0.1:
        nasty = "<div><b>unclosed bold <p>and paragraph"
    elif r < 0.2:
        nasty = "<!-- comment with <fake> tags --><nav><header>double</nav>"
    elif r < 0.25:
        nasty = "<script>var x = '<p>not text</p>';</script>"
    html = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f'<meta name="description" content="{meta}">'
        f"<style>body {{margin:0}}</style></head>"
        f"<body><header>Site header {domain}</header><nav>{nav_links}</nav>"
        f"{headings}{paras and ''.join(paras)}{imgs}{internal}{ext}{nasty}"
        f"<footer>© 2026 {domain}</footer></body></html>"
    )
    return {"url": url, "html": html}


def gen_corpus(n: int, seed: int = 42) -> List[dict]:
    """n synthetic pages → list of input rows (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n):
        domain = rng.choice(DOMAINS)
        lang = rng.choice(LANGS)
        page = make_html(rng, i, domain, lang)
        rows.append(
            {
                "url": page["url"],
                "warc_ts": (t0 + timedelta(seconds=i)).replace(tzinfo=None),
                "html": page["html"].encode("utf-8"),
                "text": "",  # recomputed by the engine; CC-wet text unused
                "lang": lang,
            }
        )
    return rows


def corpus_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    from .schemas import DOCS_SCHEMA

    df = spark.createDataFrame(gen_corpus(n, seed), DOCS_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def golden_records(rows: List[dict], profile: str = "compat") -> List[dict]:
    """Oracle: run the pure-Python extraction core (pinned to the reference
    by tests/test_extractor.py) over the corpus single-process, the way the
    reference CLI would — one page at a time."""
    from collections import Counter

    from .functions.slug import url_slug
    from .functions.tokenize import clean_and_tokenize
    from .htmlx.extractor import (
        external_links,
        internal_links,
        page_hash,
        parse_page,
        url_domain,
    )

    out = []
    for r in rows:
        p = parse_page(r["html"].decode("utf-8"))
        dom = url_domain(r["url"])
        toks = clean_and_tokenize(p.text, r["lang"], profile)
        out.append(
            {
                "url": r["url"],
                "text": p.text,
                "title": p.title,
                "meta_description": p.meta_description,
                "headings": p.headings,
                "images": p.images,
                "external_links": external_links(p.links, dom),
                "internal_links": internal_links(p.links, r["url"], dom),
                "slug": url_slug(r["url"]),
                "page_hash": page_hash(p.text),
                "tokens": toks,
                "word_count": len(toks),
                "word_frequency": dict(Counter(toks)),
            }
        )
    return out
