"""Closed-form fixtures for the classical LM smoothing tables:
interpolated Kneser-Ney bigrams and Good-Turing count-of-counts
(operators/lm.py; registered as q257/q258)."""

import math

from pyspark.sql import functions as F

from tribeca_insights_spark.operators.lm import (
    good_turing_counts,
    kneser_ney_bigram,
)


def _kn_expected(c12, c1, n1p_fwd, n1p_bwd, b, d=0.75):
    # EXACT expression the operator evaluates (same association order)
    return math.floor(1e6 * ((c12 - d) / c1 + d * n1p_fwd / c1 * n1p_bwd / b))


def test_kneser_ney_closed_form(spark):
    # one doc "a b a b a c": bigrams ab x2, ba x2, ac x1
    docs = spark.createDataFrame(
        [(1, "a b a b a c", "en"), (2, "z z z", "xx")],
        "doc_id long, text string, lang string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigram(docs, F.col("lang") == "en").collect()
    }
    # training slice excludes the lang='xx' doc entirely
    assert set(out) == {("a", "b"), ("b", "a"), ("a", "c")}
    ab, ba, ac = out[("a", "b")], out[("b", "a")], out[("a", "c")]
    # raw counts and marginals
    assert (ab["c12"], ab["c1"], ab["n1p_fwd"], ab["n1p_bwd"]) == (2, 3, 2, 1)
    assert (ba["c12"], ba["c1"], ba["n1p_fwd"], ba["n1p_bwd"]) == (2, 2, 1, 1)
    assert (ac["c12"], ac["c1"], ac["n1p_fwd"], ac["n1p_bwd"]) == (1, 3, 2, 1)
    b = 3  # distinct bigram types
    assert ab["kn_prob_micros"] == _kn_expected(2, 3, 2, 1, b)
    assert ba["kn_prob_micros"] == _kn_expected(2, 2, 1, 1, b)
    assert ac["kn_prob_micros"] == _kn_expected(1, 3, 2, 1, b)
    # discounted mass is strictly below ML estimate; KN interpolation
    # keeps each observed bigram's probability positive
    assert 0 < ab["kn_prob_micros"] < math.floor(1e6 * 2 / 3)


def test_kneser_ney_rows_sum_below_one_per_context(spark):
    # per-context observed-bigram mass must stay < 1 (the discount
    # reserves mass for unseen continuations)
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(
            ["the cat sat", "the cat ran", "a cat sat on the mat"]
        )],
        "doc_id long, text string, lang string",
    )
    rows = kneser_ney_bigram(docs, F.col("lang") == "en").collect()
    per_ctx = {}
    for r in rows:
        per_ctx.setdefault(r["w1"], 0)
        per_ctx[r["w1"]] += r["kn_prob_micros"]
    for w1, total in per_ctx.items():
        assert total < 1_000_000, (w1, total)


def test_good_turing_closed_form(spark):
    # counts: a=3, b=2, c=1  ->  N_1=N_2=N_3=1
    docs = spark.createDataFrame(
        [(1, "a a a b b c", "en"), (2, "q q q q", "xx")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["r"]: r
        for r in good_turing_counts(docs, F.col("lang") == "en").collect()
    }
    assert set(out) == {1, 2, 3}
    assert all(out[r]["n_types"] == 1 for r in (1, 2, 3))
    # r* = (r+1) * N_{r+1} / N_r
    assert out[1]["r_star_micros"] == 2_000_000
    assert out[2]["r_star_micros"] == 3_000_000
    # no types observed 4 times -> simple GT reports 0 (documented gap)
    assert out[3]["r_star_micros"] == 0


def test_good_turing_unseen_mass(spark):
    # N_1 / N is the standard unseen-probability estimate; the r=1 row
    # carries exactly the ingredients
    docs = spark.createDataFrame(
        [(1, "x y z x", "en")], "doc_id long, text string, lang string"
    )
    out = {r["r"]: r for r in
           good_turing_counts(docs, F.col("lang") == "en").collect()}
    assert out[1]["n_types"] == 2  # y, z
    assert out[2]["n_types"] == 1  # x


def test_extraction_eval_multiset(spark):
    from tribeca_insights_spark.operators.boilerplate import extraction_eval

    ext = spark.createDataFrame(
        [(1, "a a b"), (2, "")], "doc_id long, text string"
    )
    gold = spark.createDataFrame(
        [(1, "a b b c"), (2, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in extraction_eval(ext, gold).collect()}
    r1 = out[1]
    # multiset intersection: min(2,1) for 'a' + min(1,2) for 'b' = 2
    assert (r1["n_ext"], r1["n_gold"], r1["n_inter"]) == (3, 4, 2)
    assert r1["p_micros"] == 666666      # floor(1e6 * 2/3)
    assert r1["r_micros"] == 500000
    assert r1["f1_micros"] == 571428     # floor(2e6 * 2/7)
    # empty extraction: zero scores by convention, never NULL
    r2 = out[2]
    assert (r2["n_ext"], r2["n_gold"], r2["n_inter"]) == (0, 1, 0)
    assert (r2["p_micros"], r2["r_micros"], r2["f1_micros"]) == (0, 0, 0)


def test_extraction_eval_perfect(spark):
    from tribeca_insights_spark.operators.boilerplate import extraction_eval

    d = spark.createDataFrame([(7, "x y z")], "doc_id long, text string")
    r = extraction_eval(d, d).collect()[0]
    assert r["p_micros"] == r["r_micros"] == r["f1_micros"] == 1_000_000


def test_anchor_expansion_routing(spark):
    from tribeca_insights_spark.operators.linkgraph import anchor_expansion

    body = spark.createDataFrame(
        [(1, "cats purr"), (2, "dogs bark")], "doc_id long, text string"
    )
    # two inbound anchors for doc 1, one repeating a body term
    anchors = spark.createDataFrame(
        [(1, "cats photos"), (1, "photos"), (2, "")],
        "doc_id long, anchor string",
    )
    out = {(r["doc_id"], r["term"]): r
           for r in anchor_expansion(body, anchors, 2).collect()}
    # body+anchor overlap: tf_expanded = tf_body + 2*tf_anchor
    assert out[(1, "cats")]["tf_expanded"] == 1 + 2 * 1
    # anchor-only term appears in the target's index (the expansion)
    assert out[(1, "photos")]["tf_body"] == 0
    assert out[(1, "photos")]["tf_anchor"] == 2
    assert out[(1, "photos")]["tf_expanded"] == 4
    # body-only term untouched; empty anchor contributes nothing
    assert out[(2, "dogs")]["tf_expanded"] == 1
    assert (2, "") not in out


def test_text_tiling_boundary_at_topic_shift(spark):
    from tribeca_insights_spark.operators.textstats import text_tiling

    # two homogeneous topics of 2 blocks each (k=4): high cohesion
    # inside topics, zero-overlap valley at the topic shift (gap 1)
    text = ("cat cat dog dog cat cat dog dog "
            "car car bus bus car car bus bus")
    docs = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    )
    rows = {r["gap_idx"]: r
            for r in text_tiling(docs, block_tokens=4).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["sim_micros"] == 1_000_000
    assert rows[1]["sim_micros"] == 0
    assert rows[2]["sim_micros"] == 1_000_000
    # only the valley is a boundary
    assert [rows[i]["is_boundary"] for i in (0, 1, 2)] == [0, 1, 0]


def test_text_tiling_uniform_doc_no_boundary(spark):
    from tribeca_insights_spark.operators.textstats import text_tiling

    docs = spark.createDataFrame(
        [(1, "a b a b a b a b a b a b"), (2, "tiny")],
        "doc_id long, text string",
    )
    out = text_tiling(docs, block_tokens=4).collect()
    # constant similarity -> zero variance -> no gap qualifies
    assert all(r["is_boundary"] == 0 for r in out)
    # single-block doc emits nothing
    assert all(r["doc_id"] == 1 for r in out)


def test_text_tiling_multiset_dice(spark):
    from tribeca_insights_spark.operators.textstats import text_tiling

    # blocks of 2: L=[x,x], R=[x,y] -> I=min(2,1)=1, dice=2*1/4
    docs = spark.createDataFrame(
        [(1, "x x x y")], "doc_id long, text string"
    )
    r = text_tiling(docs, block_tokens=2).collect()[0]
    assert r["sim_micros"] == 500_000


def _tree_rows(spark, html):
    from tribeca_insights_spark.operators.sections import section_tree

    docs = spark.createDataFrame(
        [(1, html.encode())], "doc_id long, html binary"
    )
    return section_tree(docs).collect()


def test_section_tree_nesting_and_sibling_replacement(spark):
    rows = _tree_rows(
        spark,
        "<html><body><p>preamble</p><h1>A</h1><p>one</p>"
        "<h2>B</h2><p>two</p><h3>C</h3><p>three</p>"
        "<h2>D</h2><p>four</p><h1>E</h1><p>five</p></body></html>",
    )
    got = {r["text"]: (r["depth"], r["section_path"]) for r in rows}
    assert got["preamble"] == (0, "")          # root content
    assert got["one"] == (1, "A")
    assert got["two"] == (2, "A > B")
    assert got["three"] == (3, "A > B > C")
    # sibling h2 pops B AND C
    assert got["four"] == (2, "A > D")
    # new h1 resets the whole stack
    assert got["five"] == (1, "E")


def test_section_tree_skipped_levels_and_idx(spark):
    # h3 directly under h1 (authors skip levels constantly)
    rows = _tree_rows(
        spark,
        "<html><body><h1>T</h1><h3>S</h3><p>deep</p></body></html>",
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["depth"], r["section_path"], r["text"]) == (2, "T > S", "deep")
    # block_idx counts ALL walker blocks (headings included): h1=0, h3=1
    assert r["block_idx"] == 2


def test_frame_sample_anchors_stco_and_co64(spark):
    from tribeca_insights_spark.mediax import make_mp4_with_chunks
    from tribeca_insights_spark.operators.multimodal import (
        frame_sample_anchors,
    )

    big = 5 << 33  # only representable in co64
    media = spark.createDataFrame(
        [
            (1, make_mp4_with_chunks(1000, [10, 26, 42, 58, 74])),
            (2, make_mp4_with_chunks(1000, [big, big + 16],
                                     use_co64=True)),
            (3, b"not an mp4"),
        ],
        "media_id long, payload binary",
    )
    rows = frame_sample_anchors(media, every_n=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(
            (r["frame_idx"], r["chunk_offset"])
        )
    assert got[1] == [(0, 10), (1, 42), (2, 74)]   # every 2nd chunk
    assert got[2] == [(0, big)]                    # 64-bit offsets intact
    assert 3 not in got                            # undecodable: no rows


def _burst_rows(spark):
    rows = []
    for t in range(8):
        rows += [("bg", t)] * 20      # majority background term
        rows += [("x", t)] * 2        # minority steady
    rows += [("x", 3)] * 8 + [("x", 4)] * 8
    return rows


def test_kleinberg_burst_on_spike(spark):
    from tribeca_insights_spark.operators.stats import kleinberg_bursts

    ev = spark.createDataFrame(_burst_rows(spark), "term string, t long")
    out = {(r["term"], r["t"]): r for r in kleinberg_bursts(ev).collect()}
    # full grid: both terms x 8 windows
    assert len(out) == 16
    x_flags = [out[("x", t)]["burst"] for t in range(8)]
    assert x_flags == [0, 0, 0, 1, 1, 0, 0, 0]
    # counts ride along (zero-fill applies to missing cells)
    assert out[("x", 3)]["n"] == 10
    # the majority term never bursts (its rate DROPS during x's spike)
    assert all(out[("bg", t)]["burst"] == 0 for t in range(8))


def test_kleinberg_gamma_suppresses_one_window_noise(spark):
    from tribeca_insights_spark.operators.stats import kleinberg_bursts

    rows = []
    for t in range(8):
        rows += [("bg", t)] * 20
        rows += [("x", t)] * 2
    rows += [("x", 5)] * 3  # one mild single-window wiggle
    ev = spark.createDataFrame(rows, "term string, t long")
    # entry toll high enough that a 1-window wiggle can't pay for it
    out = kleinberg_bursts(ev, gamma_micros=20_000_000).collect()
    assert all(r["burst"] == 0 for r in out)


def test_google_robots_tie_allow_wins_and_group_select(spark):
    from tribeca_insights_spark.sources.robots import (
        google_robots_rules,
        google_robots_verdict,
    )
    from pyspark.sql import functions as F

    txt = (
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: tribeca\n"
        "Allow: /p/x\n"         # len 4: ties with the disallow below
        "Disallow: /p/*\n"      # len 4
        "Disallow: /q\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    robots = spark.createDataFrame(
        [(1, txt)], "doc_id long, robots_txt string"
    )
    rules = google_robots_rules(robots, user_agent="tribeca")
    got = {(r["allow"], r["pattern"]) for r in rules.collect()}
    # specific group replaces '*' and 'other'; keeps allow AND disallow
    assert got == {(True, "/p/x"), (False, "/p/*"), (False, "/q")}

    urls = spark.createDataFrame(
        [(1, "/p/x"), (1, "/p/y"), (1, "/q/z"), (1, "/r")],
        "doc_id long, path string",
    )
    v = {r["path"]: (r["allowed"], r["spec"])
         for r in google_robots_verdict(urls, rules).collect()}
    assert v["/p/x"] == (1, 4)   # equal specificity: Allow wins
    assert v["/p/y"] == (0, 4)   # wildcard disallow
    assert v["/q/z"] == (0, 2)   # prefix disallow
    assert v["/r"] == (1, 0)     # no rule: default allow


def test_sitemap_index_resolution_edges(spark):
    from tribeca_insights_spark.sources.sitemap import resolve_sitemap_tree

    idx = ("<sitemapindex><sitemap><loc>https://h/child.xml</loc>"
           "</sitemap><sitemap><loc>https://h/missing.xml</loc>"
           "</sitemap></sitemapindex>")
    child = "<urlset><url><loc>https://h/page1</loc></url></urlset>"
    nested = ("<sitemapindex><sitemap><loc>https://h/child.xml</loc>"
              "</sitemap></sitemapindex>")
    sm = spark.createDataFrame(
        [
            ("h", "https://h/smi.xml", idx),
            ("h", "https://h/child.xml", child),
            ("h", "https://h/nested.xml", nested),
        ],
        "host string, sitemap_url string, sitemap_xml string",
    )
    rows = {(r["url"], r["via"])
            for r in resolve_sitemap_tree(sm).collect()}
    # direct tier: only the urlset body's page
    # index tier: child resolved; missing.xml has no body -> silently
    # absent; nested index resolves one level (its child IS in the
    # table) but is never recursed further
    assert rows == {
        ("https://h/page1", "direct"),
        ("https://h/page1", "index"),
    }


def test_meta_tags_attr_order_and_quotes(spark):
    from tribeca_insights_spark.operators.meta import (
        jsonld_entities,
        meta_tags,
        robots_meta_flags,
    )

    html = (
        "<html><head>"
        "<meta content=\"noindex , NOFOLLOW\" name='robots'>"
        '<meta property="og:title" content="T">'
        "<meta charset=\"utf-8\">"  # no name/property: dropped
        '<script type="application/ld+json">'
        '{"@type":"Person","name":"Ada"}</script>'
        "</head></html>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    tags = {(r["kind"], r["key"], r["content"])
            for r in meta_tags(docs).collect()}
    assert ("name", "robots", "noindex , NOFOLLOW") in tags
    assert ("property", "og:title", "T") in tags
    assert len(tags) == 2  # charset meta has neither key kind

    f = robots_meta_flags(docs).collect()[0]
    # token splitting trims spaces and lowercases
    assert (f["noindex"], f["nofollow"], f["indexable"]) == (1, 1, 0)

    e = jsonld_entities(docs).collect()[0]
    assert (e["entity_type"], e["entity_name"]) == ("Person", "Ada")


def test_rel_anchor_pairs_semantics(spark):
    from tribeca_insights_spark.operators.linkgraph import rel_anchor_pairs

    html = (
        '<a href="https://x/a">plain</a>'
        '<a href="https://x/b" rel="NoFollow">nf</a>'
        '<a href="https://x/c" rel="me noopener">benign rel</a>'
        '<a rel="sponsored" href="https://x/d">ad</a>'
        "<a>no href</a>"
    )
    docs = spark.createDataFrame(
        [("https://h/p", html)], "url string, html string"
    )
    got = {r["target"]: r["followed"]
           for r in rel_anchor_pairs(docs).collect()}
    assert got == {
        "https://x/a": 1,
        "https://x/b": 0,   # rel matching is case-insensitive
        "https://x/c": 1,   # non-triad rel tokens don't demote
        "https://x/d": 0,
    }


def test_canonical_resolve_chain_and_cycle_free(spark):
    from tribeca_insights_spark.operators.meta import canonical_resolve

    def pg(url, canon=None):
        link = (f'<link rel="canonical" href="{canon}">' if canon else "")
        return (url, f"<html><head>{link}</head></html>")

    pages = spark.createDataFrame(
        [
            pg("a"), pg("b", "a"), pg("c", "b"), pg("d", "c"),
            pg("e", "c"),
        ],
        "url string, html string",
    )
    out = {r["url"]: (r["canonical"], r["hops"])
           for r in canonical_resolve(pages, max_hops=2).collect()}
    assert out["a"] == ("a", 0)
    assert out["b"] == ("a", 1)
    assert out["c"] == ("a", 2)
    assert out["d"] == ("a", 3)   # 3-link chain closes in 2 doublings
    assert out["e"] == ("a", 3)


def test_hreflang_reciprocity_edges(spark):
    from tribeca_insights_spark.operators.meta import hreflang_reciprocity

    def pg(url, *alts):
        links = "".join(
            f'<link rel="alternate" hreflang="{l}" href="{h}">'
            for l, h in alts
        )
        return (url, f"<html><head>{links}</head></html>")

    pages = spark.createDataFrame(
        [pg("A", ("fr", "B")), pg("B", ("en", "A"), ("de", "C")),
         pg("C")],
        "url string, html string",
    )
    got = {(r["url"], r["alt_url"]): r["reciprocal"]
           for r in hreflang_reciprocity(pages).collect()}
    assert got == {("A", "B"): 1, ("B", "A"): 1, ("B", "C"): 0}


def test_image_sources_lazyload_and_srcset(spark):
    from tribeca_insights_spark.operators.meta import image_sources

    html = (
        '<img src="p.jpg">'
        '<img data-src="real.jpg" src="ph.gif" '
        'srcset="a.jpg 2x, b.jpg 640w, c.jpg 1280w">'
        "<img srcset='only.jpg 10w'>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = {r["img_idx"]: r for r in image_sources(docs).collect()}
    assert out[0]["effective_src"] == "p.jpg"
    assert out[0]["widest_src"] is None
    r1 = out[1]
    # data-src wins; x-descriptor ranks 0 so widest is the 1280w url
    assert (r1["effective_src"], r1["n_variants"], r1["widest_src"]) == (
        "real.jpg", 3, "c.jpg")
    # srcset-only img: no src at all, variant still parsed
    assert (out[2]["src"], out[2]["widest_src"]) == ("", "only.jpg")


def test_feed_enclosures_and_opml(spark):
    from tribeca_insights_spark.sources.feeds import (
        feed_enclosures,
        opml_feeds,
    )

    xml = (
        "<rss><channel>"
        '<item><enclosure url="https://c/a.mp3" length="123" '
        'type="audio/MPEG"></item>'
        "<item><enclosure type='video/mp4' length='junk' "
        "url='https://c/b.mp4'/></item>"
        '<item><enclosure length="5" type="audio/ogg"></item>'
        "</channel></rss>"
    )
    feeds = spark.createDataFrame([(1, xml)], "fid long, feed_xml string")
    rows = {r["enclosure_url"]: (r["mime"], r["n_bytes"])
            for r in feed_enclosures(feeds, keep_cols=("fid",)).collect()}
    assert rows == {
        "https://c/a.mp3": ("audio/mpeg", 123),  # mime lowercased
        "https://c/b.mp4": ("video/mp4", -1),    # junk length -> -1
    }  # url-less enclosure dropped

    opml = spark.createDataFrame(
        [(1, '<opml><body><outline text="News">'
             '<outline text="A" xmlUrl="https://a/f" htmlUrl="https://a"/>'
             "</outline></body></opml>")],
        "fid long, opml_xml string",
    )
    o = opml_feeds(opml, keep_cols=("fid",)).collect()
    assert len(o) == 1  # folder outline dropped
    assert (o[0]["feed_url"], o[0]["site_url"], o[0]["title"]) == (
        "https://a/f", "https://a", "A")


def test_inline_image_dhash_roundtrip(spark):
    import base64
    from tribeca_insights_spark.imagex import make_png
    from tribeca_insights_spark.operators.multimodal import (
        inline_image_dhash,
    )

    png = make_png(16, 16, seed=3)
    b64 = base64.b64encode(png).decode()
    html = (
        f'<img src="data:image/png;base64,{b64}">'
        '<img src="https://x/u.png">'
        '<img src="data:image/png;base64,@@bad@@">'
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = {r["img_idx"]: r for r in inline_image_dhash(docs).collect()}
    assert set(rows) == {0, 2}  # url img filtered, bad payload kept
    assert rows[0]["mime"] == "image/png"
    assert rows[0]["dhash64"] is not None and len(rows[0]["dhash64"]) == 16
    assert rows[2]["dhash64"] is None  # undecodable -> NULL fingerprint


def test_license_signals_variants(spark):
    from tribeca_insights_spark.operators.governance import license_signals

    html = (
        '<a href="https://creativecommons.org/licenses/by-sa/4.0/">l</a>'
        '<link rel="license" '
        'href="http://creativecommons.org/publicdomain/zero/1.0/">'
        "<pre>SPDX-License-Identifier: Apache-2.0</pre>"
        "<pre>SPDX-License-Identifier: Apache-2.0</pre>"
        '<a href="https://example.org/licenses/by/4.0/">decoy</a>'
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = {(r["license"], r["via"])
           for r in license_signals(docs).collect()}
    assert got == {
        ("cc-by-sa-4.0", "link"),
        ("cc-zero-1.0", "link"),
        ("Apache-2.0", "spdx"),
    }


def test_ai_optout_defaults_and_tokens(spark):
    from tribeca_insights_spark.operators.governance import ai_optout_flags

    docs = spark.createDataFrame(
        [
            (1, '<meta name="robots" content="NOAI">'),
            (2, '<meta name="tdm-reservation" content="0">'),
            (3, "<html>no meta at all</html>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: (r["noai"], r["noimageai"], r["tdm_reserved"])
           for r in ai_optout_flags(docs).collect()}
    assert out[1] == (1, 0, 0)   # case-insensitive token
    assert out[2] == (0, 0, 0)   # content=0 is NOT a reservation
    assert out[3] == (0, 0, 0)   # absent -> defaults


def test_param_significance_mixed_evidence(spark):
    from tribeca_insights_spark.functions.urlnorm import param_significance

    rows = [
        # sess neutral in one group, content-changing in another
        ("https://h/a?sess=1", "X"),
        ("https://h/a?sess=2", "X"),
        ("https://h/b?sess=1", "Y"),
        ("https://h/b?sess=2", "Z"),
        # id always changes content
        ("https://h/c?id=1", "P"),
        ("https://h/c?id=2", "Q"),
        # single-value param: no evidence group at all
        ("https://h/d?lone=1", "R"),
    ]
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    out = {r["param"]: r for r in param_significance(pages).collect()}
    assert set(out) == {"sess", "id"}  # 'lone' has no >=2-value group
    s = out["sess"]
    assert (s["n_groups"], s["n_neutral_groups"], s["neutral"]) == (2, 1, 0)
    assert out["id"]["neutral"] == 0


def test_table_column_profile_majority_and_ties(spark):
    from tribeca_insights_spark.operators.tables import (
        table_column_profile,
        table_rows,
    )

    html = (
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>x</td></tr>"
        "<tr><td>2.5</td><td>y</td></tr>"
        "</table>"
    ).encode()
    docs = spark.createDataFrame([(1, html)], "doc_id long, html binary")
    out = {r["col_idx"]: r
           for r in table_column_profile(table_rows(docs)).collect()}
    # 1-1 int/float tie -> lexicographically larger type name wins
    assert out[0]["col_type"] == "int"
    assert out[1]["col_type"] == "string"
    assert out[0]["header"] == "a"
    assert out[0]["n_values"] == 2


def test_cache_policy_precedence(spark):
    from tribeca_insights_spark.plans.frontier import cache_policy

    rows = [
        ("u1", 100, "public, max-age=0", None, "", ""),
        ("u2", 100, "private, no-cache, max-age=50", None, "", ""),
        ("u3", 100, "max-age=30", 999, "", ""),   # max-age beats Expires
        ("u4", 100, "", -5, "", ""),              # stale Expires -> default
        ("u5", 100, "maxi-age=77", None, "", 'etag-only'),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, fetch_ts long, cache_control string, "
        "expires_delta_s long, last_modified string, etag string",
    )
    out = {r["url"]: r for r in cache_policy(df).collect()}
    assert out["u1"]["ttl_s"] == 0       # max-age=0 is a revalidate order
    assert out["u2"]["ttl_s"] == 0       # no-cache beats its own max-age
    assert out["u3"]["ttl_s"] == 30
    assert out["u3"]["recrawl_after"] == 130
    assert out["u4"]["ttl_s"] == 86400
    # 'maxi-age' must NOT match the max-age token regex
    assert out["u5"]["ttl_s"] == 86400
    assert out["u5"]["has_validator"] == 1


def test_pii_pseudonyms_stability_and_salt(spark):
    from tribeca_insights_spark.operators.redact import pii_pseudonyms

    docs = spark.createDataFrame(
        [(1, "mail A@X.com now"), (2, "a@x.com again"),
         (3, "no pii here")],
        "doc_id long, text string",
    )
    p1 = {r["doc_id"]: r["pseudonym"]
          for r in pii_pseudonyms(docs, salt="k1").collect()}
    # case-insensitive: A@X.com and a@x.com share a pseudonym
    assert p1[1] == p1[2]
    assert 3 not in p1
    p2 = {r["doc_id"]: r["pseudonym"]
          for r in pii_pseudonyms(docs, salt="k2").collect()}
    # salt rotation rotates every pseudonym
    assert p2[1] != p1[1]


def test_crawl_trap_score_thresholds(spark):
    from tribeca_insights_spark.functions.urlnorm import crawl_trap_score

    rows = []
    for i in range(12):   # trap: 12 urls, 1 hash
        rows.append((f"https://h/cal/{i}", "same"))
    for i in range(12):   # healthy: 12 urls, 12 hashes
        rows.append((f"https://h/art/{i}", f"h{i}"))
    for i in range(4):    # too few urls to call, even if samey
        rows.append((f"https://h/tag/{i}", "same"))
    pages = spark.createDataFrame(rows, "url string, content_hash string")
    out = {r["template"]: r["trap"]
           for r in crawl_trap_score(pages).collect()}
    assert out == {"/cal/N": 1, "/art/N": 0, "/tag/N": 0}


def test_k_anonymize_levels(spark):
    from tribeca_insights_spark.operators.governance import (
        k_anonymize_hosts,
    )

    hosts = (
        ["big.com"] * 6          # host-level release
        + ["a.net", "b.net", "c.net", "d.net", "e.net"]  # pool to tld
        + ["x.qq", "y.zz"]       # residual '*'
    )
    docs = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = {(r["release_key"], r["level"]): r["n_docs"]
           for r in k_anonymize_hosts(docs, k=5).collect()}
    assert out == {
        ("big.com", "host"): 6,
        ("net", "tld"): 5,
        ("*", "any"): 2,
    }
    # every published row except the residual aggregates >= k
    assert all(n >= 5 for (key, lvl), n in out.items() if key != "*")


def test_contrastive_triplets_shape(spark):
    from tribeca_insights_spark.operators.chunking import (
        contrastive_triplets,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g"), (2, "h i"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in contrastive_triplets(docs).collect()}
    # doc 3 has 1 token: no second view, so (a) it emits no triplet
    # and (b) doc 1 — whose arithmetic negative IS doc 3 — drops too:
    # the negative join only accepts eligible documents
    assert set(out) == {0, 2}
    assert out[0]["anchor"] == "a b"
    assert out[0]["positive"] == "c d"
    assert out[0]["neg_id"] == 2 and out[0]["negative"] == "h"
    assert out[2]["anchor"] == "h"       # floor split: 1 | 1
    assert out[2]["positive"] == "i"
    assert out[2]["neg_id"] == 0 and out[2]["negative"] == "a b"


def test_sitemap_url_meta_block_isolation(spark):
    from tribeca_insights_spark.sources.sitemap import sitemap_url_meta

    xml = (
        "<urlset>"
        "<url><loc>/a</loc>\n<lastmod>2024-02-01</lastmod>"
        "<priority>0.8</priority></url>"
        "<url><loc>/b</loc></url>"  # bare: must NOT inherit /a's fields
        "<url><lastmod>2024-03-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    sm = spark.createDataFrame([(1, xml)], "sid long, sitemap_xml string")
    out = {r["url"]: r
           for r in sitemap_url_meta(sm, keep_cols=("sid",)).collect()}
    assert set(out) == {"/a", "/b"}
    assert out["/a"]["lastmod"] == "2024-02-01"
    assert out["/a"]["priority_micros"] == 800000
    assert (out["/b"]["lastmod"], out["/b"]["priority_micros"]) == ("", -1)


def test_read_warc_meta_relation(spark, tmp_path):
    from tribeca_insights_spark.sources.warc import make_warc, read_warc_meta

    blob = make_warc([
        ("https://a", "<p>hello</p>", "utf-8"),
        ("https://b", "nope", "utf-8", 404),
    ])
    (tmp_path / "f.warc").write_bytes(blob)
    rows = {r["url"]: r
            for r in read_warc_meta(spark, str(tmp_path)).collect()}
    assert rows["https://a"]["status"] == 200
    assert rows["https://a"]["content_type"] == "text/html"
    assert rows["https://a"]["n_bytes"] == len(b"<p>hello</p>")
    assert rows["https://b"]["status"] == 404


def test_base_href_first_wins_and_relative_base_ignored(spark):
    from tribeca_insights_spark.operators.linkgraph import (
        anchor_pairs_base_aware,
    )

    html = (
        '<head><base href="https://b1.com/x/">'
        '<base href="https://b2.com/"></head>'
        '<body><a href="/p">p</a></body>'
    )
    html_rel_base = '<base href="/only/relative"><a href="/q">q</a>'
    docs = spark.createDataFrame(
        [("https://page.com/a", html),
         ("https://page.com/b", html_rel_base)],
        "url string, html string",
    )
    got = {r["url"]: r for r in anchor_pairs_base_aware(docs).collect()}
    # first base wins per spec
    assert got["https://page.com/a"]["target"] == "https://b1.com/p"
    # a non-absolute base is ignored: resolution falls back to the page
    assert got["https://page.com/b"]["target"] == "https://page.com/q"


def test_client_redirects_microsyntax(spark):
    from tribeca_insights_spark.operators.meta import client_redirects

    html = (
        '<META HTTP-EQUIV="refresh" content="5; URL=\'https://x/a\'">'
        '<meta http-equiv="refresh" content="junk;url=https://x/b">'
        '<meta http-equiv="refresh" content="0">'  # no url: dropped
        "<script>location.href=\"https://x/c\";</script>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = {(r["kind"], r["target"]): r["delay_s"]
           for r in client_redirects(docs).collect()}
    assert got == {
        ("meta", "https://x/a"): 5,    # case-insensitive, quoted url
        ("meta", "https://x/b"): 0,    # junk delay -> 0
        ("js", "https://x/c"): 0,
    }


def test_a11y_audit_outline_rules(spark):
    from tribeca_insights_spark.operators.meta import a11y_audit

    html = (
        "<h2>leading non-h1</h2>"       # root-level skip
        "<h1>a</h1><h2>b</h2><h4>c</h4>"  # h2 -> h4 skip
        "<img src='x'><img src='y' alt=''>"
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = a11y_audit(docs).collect()[0]
    assert r["n_images"] == 2
    assert r["n_missing_alt"] == 1      # empty alt still PRESENT
    assert r["n_h1"] == 1
    assert r["n_level_skips"] == 2      # leading h2 + the h2->h4 jump


def test_third_party_census_distinct_pages(spark):
    from tribeca_insights_spark.operators.meta import third_party_census

    html = (
        '<script src="https://cdn.x/a.js"></script>'
        '<script src="https://cdn.x/b.js"></script>'
        '<img src="/relative.png">'
    )
    pages = spark.createDataFrame(
        [("https://site.a/1", html), ("https://site.a/2", html)],
        "url string, html string",
    )
    rows = third_party_census(pages).collect()
    assert len(rows) == 1
    assert (rows[0]["site_host"], rows[0]["third_party_host"],
            rows[0]["n_pages"]) == ("site.a", "cdn.x", 2)


def test_int8_quant_exact_cases(spark):
    from tribeca_insights_spark.operators.similarity import (
        int8_quantization_audit,
    )

    embs = spark.createDataFrame(
        [
            (1, [127.0, -127.0, 0.0]),   # exactly representable
            (2, [0.0, 0.0]),             # zero vector: lossless
            (3, [1.0, 0.5]),             # 0.5/ (1/127) = 63.5 -> 64
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r
           for r in int8_quantization_audit(embs).collect()}
    assert out[1]["scale_micros"] == 1_000_000
    assert out[1]["max_abs_err_micros"] == 0
    assert out[1]["mse_micros"] == 0
    assert out[2] is not None and out[2]["scale_micros"] == 0
    assert out[2]["mse_micros"] == 0
    r3 = out[3]
    # scale = 1/127; q(0.5) = floor(63.5+0.5) = 64 -> recon 64/127
    expected_err = abs(64 / 127 - 0.5)
    assert abs(r3["max_abs_err_micros"] / 1e6 - expected_err) < 1e-6


def test_isotonic_calibration_pools_violators(spark):
    from tribeca_insights_spark.operators.classifier import (
        isotonic_calibration,
    )

    # rates: 0.2, 0.8, 0.4  -> bins 1,2 violate; pool to (8+4)/(10+10)
    bins = spark.createDataFrame(
        [("g", 0, 2, 10), ("g", 1, 8, 10), ("g", 2, 4, 10),
         ("h", 0, 1, 10), ("h", 1, 9, 10)],  # already monotone
        "grp string, bin_idx long, n_pos long, n_tot long",
    )
    out = {(r["grp"], r["bin_idx"]): r["p_hat_micros"]
           for r in isotonic_calibration(bins).collect()}
    assert out[("g", 0)] == 200_000
    assert out[("g", 1)] == 600_000   # pooled (8+4)/20
    assert out[("g", 2)] == 600_000
    # untouched monotone group passes through
    assert out[("h", 0)] == 100_000
    assert out[("h", 1)] == 900_000
    # global invariant: monotone non-decreasing within every group
    for g in ("g", "h"):
        vals = [v for (gg, _), v in sorted(out.items()) if gg == g]
        assert vals == sorted(vals)


def test_survivor_enrichment_folding(spark):
    from tribeca_insights_spark.operators.dedup import survivor_enrichment

    members = spark.createDataFrame(
        [
            (10, 11, 2000, 500_000, 3),
            (10, 12, 1000, 900_000, 4),   # later id, better quality
            (20, 20, 5000, 100_000, 0),   # singleton
        ],
        "cluster long, doc_id long, ts_epoch long, "
        "quality_micros long, inlinks long",
    )
    out = {r["cluster"]: r
           for r in survivor_enrichment(members).collect()}
    c = out[10]
    assert (c["survivor_id"], c["n_members"]) == (11, 2)
    assert c["earliest_ts_epoch"] == 1000
    assert c["max_quality_micros"] == 900_000  # loser's best survives
    assert c["total_inlinks"] == 7
    assert c["weight_micros"] == 500_000
    s = out[20]
    assert (s["survivor_id"], s["weight_micros"]) == (20, 1_000_000)



def test_bidi_invisible_audit_classes(spark):
    from tribeca_insights_spark.operators.textstats import (
        bidi_invisible_audit,
    )

    docs = spark.createDataFrame(
        [
            (1, "plain text\twith tab\nand newline\r"),  # allowed ws
            (2, "evil \u202e tseT"),                       # RLO
            (3, "a\u200bb\u200dc\u2060d\ufeffe"),       # zero-widths
            (4, "bell\u0007 and del\u007f"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bidi_invisible_audit(docs).collect()}
    assert out[1]["clean"] == 1  # tab/newline/CR are NOT violations
    assert out[2]["n_bidi"] == 1 and out[2]["clean"] == 0
    assert out[3]["n_zero_width"] == 4
    assert out[4]["n_other_ctrl"] == 2


def test_csp_directives_parsing(spark):
    from tribeca_insights_spark.operators.meta import csp_directives

    html = (
        '<meta http-equiv="Content-Security-Policy" content='
        '"default-src  \'self\'  https://a ; ; img-src *;'
        ' upgrade-insecure-requests">'
    )
    docs = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = {(r["directive"], r["source"])
           for r in csp_directives(docs).collect()}
    assert got == {
        ("default-src", "'self'"),
        ("default-src", "https://a"),
        ("img-src", "*"),
        ("upgrade-insecure-requests", ""),
    }  # double spaces collapse; empty segment between ;; dropped
