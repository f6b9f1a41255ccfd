"""Tokenizer pins — reference tests/test_text_utils.py:75-95 plus the
executed-regex quirks documented in SURVEY.md §2.2 O2."""

from tribeca_insights_spark.functions.slug import slugify, url_slug
from tribeca_insights_spark.functions.stopwords import get_stopwords
from tribeca_insights_spark.functions.tokenize import clean_and_tokenize


def test_reference_pins():
    toks = clean_and_tokenize("This is a test. Testing, one, two, three!", "en")
    assert "test" in toks and "this" not in toks
    assert clean_and_tokenize("Numbers 123 and symbols! #$%", "en") == [
        "numbers",
        "symbols",
    ]
    assert clean_and_tokenize("Mixed CASE and StopWords of the", "en") == [
        "mixed",
        "case",
        "stopwords",
    ]


def test_quirks():
    # digits split tokens
    assert clean_and_tokenize("test42case", "de") == ["test", "case"]
    # × (U+00D7) and ÷ (U+00F7) sit inside the kept À-ÿ range
    assert clean_and_tokenize("a×b ÷x", "de") == ["a×b", "÷x"]
    # chars ≥ U+0100 dropped entirely
    assert clean_and_tokenize("Привет мир", "ru") == []
    assert clean_and_tokenize("日本語テキスト", "ja") == []
    # accented Latin-1 kept, lowercased after cleaning
    assert clean_and_tokenize("Ação CORAÇÃO", "de") == ["ação", "coração"]
    # min length 2
    assert clean_and_tokenize("a b cd", "de") == ["cd"]


def test_stopword_profiles():
    assert get_stopwords("en") == frozenset({"the", "a", "and", "of", "is", "this"})
    assert "y" in get_stopwords("es")
    assert "e" in get_stopwords("pt-br")
    assert get_stopwords("zh-cn") == frozenset()
    assert "because" in get_stopwords("en", "extended")


def test_nltk_profile_full_lists():
    """`nltk` profile = reference's corpora-present path (text_utils.py:
    75-96): full per-language NLTK Stopwords Corpus lists (vendored), with
    the reference's degraded corpus→fallback→empty rule for languages that
    have no list."""
    en = get_stopwords("en", "nltk")
    assert len(en) > 150  # full corpus list, not the 6-word fallback
    assert {"i", "me", "myself", "wouldn't", "the", "of"} <= en
    # every compat fallback word is in the full list too (en augmentation)
    assert get_stopwords("en") <= en
    for lang, probe in [("de", "und"), ("fr", "les"), ("es", "los"),
                        ("pt-br", "não"), ("ru", "не"), ("it", "della")]:
        assert probe in get_stopwords(lang, "nltk"), lang
    # no corpus list AND no fallback → empty (reference text_utils.py:84-96)
    assert get_stopwords("zh", "nltk") == frozenset()
    assert get_stopwords("ja", "nltk") == frozenset()
    # tokenizer actually honors the profile
    toks = clean_and_tokenize("I me myself the spark engine", "en", "nltk")
    assert toks == ["spark", "engine"]


def test_nltk_data_dir_override(tmp_path, monkeypatch):
    """$NLTK_DATA takes precedence over the vendored lists ONLY behind the
    explicit TRIBECA_SPARK_NLTK_RUNTIME=1 opt-in — by default every node
    uses the package copy, so executors can never silently diverge from a
    driver-built stopword list when their nltk_data installs differ."""
    from tribeca_insights_spark.functions import stopwords as sw

    d = tmp_path / "corpora" / "stopwords"
    d.mkdir(parents=True)
    (d / "english").write_text("zzonlyword\n", encoding="utf-8")
    monkeypatch.setenv("NLTK_DATA", str(tmp_path))
    sw._load_full_list.cache_clear()
    sw.get_stopwords.cache_clear()
    try:
        # default: the env dir is IGNORED — vendored corpus list wins
        vendored = sw.get_stopwords("en", "nltk")
        assert "zzonlyword" not in vendored and "the" in vendored
        # explicit opt-in: runtime corpus takes precedence
        monkeypatch.setenv("TRIBECA_SPARK_NLTK_RUNTIME", "1")
        sw._load_full_list.cache_clear()
        sw.get_stopwords.cache_clear()
        assert sw.get_stopwords("en", "nltk") == frozenset({"zzonlyword"})
    finally:
        monkeypatch.delenv("NLTK_DATA")
        monkeypatch.delenv("TRIBECA_SPARK_NLTK_RUNTIME", raising=False)
        sw._load_full_list.cache_clear()
        sw.get_stopwords.cache_clear()


def test_slug():
    assert url_slug("https://mysite.com/path") == "path"
    assert url_slug("https://mysite.com") == "home"  # empty path → "home"
    assert url_slug("https://mysite.com/") == ""  # "/" edge preserved
    assert url_slug("https://m.com/About-Us/Team_2024/") == "about-us-team-2024"
    assert slugify("Ação & Reação") == "acao-reacao"


def test_second_sub_redundant():
    """Reference text_utils.py:107-110 does clean-sub → \\s+-sub → strip →
    lower → split; the middle sub+strip are no-ops before split() because the
    clean pattern already swallows every whitespace run. Pin equality."""
    import random
    import re

    clean = re.compile(r"[^A-Za-zÀ-ÿ]+")
    ws = re.compile(r"\s+")
    rng = random.Random(2)
    pool = "abc ÀÿZz09 \t\n\xa0　日ç×÷.,!-"
    for _ in range(20000):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 25)))
        full = ws.sub(" ", clean.sub(" ", s)).strip().lower().split()
        fast = clean.sub(" ", s).lower().split()
        assert full == fast, repr(s)


def test_legacy_tokenizer_pins():
    """scripts/main.py:91-97 semantics, pinned including the three
    divergences from the package tokenizer."""
    from tribeca_insights_spark.functions.tokenize import (
        clean_and_tokenize as pkg_tok,
        legacy_clean_and_tokenize as leg,
    )

    # non-letters DELETED in place → fragments join (package splits them,
    # leaving 1-char fragments that fall to the length filter)
    assert leg("don't a1b2c3 stop-word") == ["dont", "abc", "stopword"]
    assert pkg_tok("don't a1b2c3", "xx") == ["don"]
    # accented letters vanish (package keeps À-ÿ); 'here' is an NLTK
    # english stopword, 'ao' falls to len>2
    assert leg("Ação coração here") == ["corao"]
    # len > 2, not >= 2
    assert leg("ab abc") == ["abc"]
    # english NLTK stopwords always (script ignores the CLI language)
    assert leg("the quick brown fox itself") == ["quick", "brown", "fox"]


def test_legacy_tokens_col_matches_python(spark):
    from pyspark.sql import functions as F

    from tribeca_insights_spark.functions.stopwords import get_stopwords
    from tribeca_insights_spark.functions.tokenize import (
        legacy_clean_and_tokenize,
        legacy_tokens_col,
    )

    texts = [
        "The quick brown fox", "don't a1b2c3", "Ação coração here",
        "", "   ", "...!!!", "itself was having a herself-day",
    ]
    stops = F.array(
        *[F.lit(w) for w in sorted(get_stopwords("english", "nltk"))]
    )
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["toks"]
        for r in df.select(
            legacy_tokens_col(F.col("text"), stops).alias("toks")
        ).collect()
    ]
    assert got == [legacy_clean_and_tokenize(t) for t in texts]
