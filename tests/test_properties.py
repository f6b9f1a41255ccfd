"""Property-based tests (hypothesis) over the pure-python cores: codec
round-trips and tokenizer invariants hold for arbitrary inputs, not just
the golden corpus."""

from hypothesis import given, settings, strategies as st

from tribeca_insights_spark.functions.stopwords import get_stopwords
from tribeca_insights_spark.functions.tokenize import (
    clean_and_tokenize,
    legacy_clean_and_tokenize,
)
from tribeca_insights_spark.imagex import decode_png, encode_png, make_png
from tribeca_insights_spark.mediax import make_wav, parse_wav


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    seed=st.integers(0, 2**31),
    ctype=st.sampled_from([0, 2]),
)
def test_png_roundtrip_property(w, h, seed, ctype):
    b = make_png(w, h, seed=seed, color_type=ctype)
    dw, dh, ch, px = decode_png(b)
    assert (dw, dh) == (w, h)
    assert len(px) == w * h * ch
    # re-encode → identical pixels
    assert decode_png(encode_png(px, w, h, ch))[3] == px
    # greyscale size formula (the oracle's closed form)
    if ctype == 0:
        assert len(b) == 68 + h * (w + 1)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_property(n, rate, ch, seed):
    b = make_wav(n, rate=rate, channels=ch, seed=seed)
    assert len(b) == 44 + n * ch * 2
    cont, dur, r, c = parse_wav(b)
    assert (cont, r, c) == ("wav", rate, ch)
    assert dur == n * 1000 // rate


_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(s=_TEXT, lang=st.sampled_from(["en", "es", "pt-br", "zz"]))
def test_package_tokenizer_invariants(s, lang):
    toks = clean_and_tokenize(s, lang)
    stops = get_stopwords(lang)
    for t in toks:
        assert len(t) >= 2
        assert t == t.lower()
        assert t not in stops
        # every char is in the keep class [A-Za-zÀ-ÿ] (post-lower image)
        assert all(
            ("a" <= c <= "z") or ("À" <= c <= "ÿ") for c in t
        )
    # idempotent over its own join (tokens contain no separators)
    assert clean_and_tokenize(" ".join(toks), "zz") == toks


@settings(max_examples=200, deadline=None)
@given(s=_TEXT)
def test_legacy_tokenizer_invariants(s):
    toks = legacy_clean_and_tokenize(s)
    stops = get_stopwords("english", "nltk")
    for t in toks:
        assert len(t) > 2
        assert t not in stops
        assert all("a" <= c <= "z" for c in t)  # ASCII letters only


# --- span walker invariants ---------------------------------------------------

_tag_words = st.lists(
    st.text(alphabet="abcdefgh XYZ09", min_size=1, max_size=12),
    min_size=0, max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from(["p", "div", "h1", "li", "footer"]),
            st.text(alphabet="abc def\n\t", min_size=0, max_size=30),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_span_slices_reproduce_block_text(parts):
    """For charref-free markup, the raw slice html[start:end] must
    whitespace-collapse to exactly the block's reported text, and the
    span/text block streams must agree with the span-free walker."""
    import re

    from tribeca_insights_spark.htmlx.blocks import (
        segment_blocks,
        segment_blocks_with_spans,
    )

    html = "".join(f"<{t}>{txt}</{t}>" for t, txt in parts)
    pairs = segment_blocks_with_spans(html)
    assert [b.text for b, _ in pairs] == [
        b.text for b in segment_blocks(html)
    ]
    for b, (s, e) in pairs:
        assert s is not None and 0 <= s < e <= len(html)
        raw = html[s:e]
        assert raw == raw.strip()
        assert re.sub(r"\s+", " ", raw) == re.sub(r"\s+", " ", b.text)


@settings(max_examples=60, deadline=None)
@given(junk=st.text(alphabet="<>/ab c='\"&;!-", min_size=0, max_size=80))
def test_walkers_never_raise_on_garbage(junk):
    from tribeca_insights_spark.htmlx.blocks import (
        segment_blocks_with_spans,
    )
    from tribeca_insights_spark.htmlx.tables import extract_tables

    for b, (s, e) in segment_blocks_with_spans(junk):
        if s is not None:
            assert 0 <= s <= e <= len(junk)
    extract_tables(junk)  # must not raise


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(_tag_words, min_size=0, max_size=5),
)
def test_table_walker_roundtrips_wellformed(rows):
    from tribeca_insights_spark.htmlx.tables import extract_tables

    html = "<table>" + "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
    ) + "</table>"
    got = extract_tables(html)
    # every <tr> yields a row (empty ones included); cell text is the
    # edge-stripped source text (internal whitespace preserved, same
    # contract as block text), '' for whitespace-only cells
    want = [[c.strip() for c in r] for r in rows]
    assert got == [want]
