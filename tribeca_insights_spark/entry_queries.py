"""Driver-contract queries and their DuckDB oracle SQL.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]``
is ANSI SQL DuckDB runs over the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings). Column
names/aliases match exactly; all floating aggregates are rounded after
deterministic (decimal or order-identical) computation so the driver's
order-insensitive value-hash is stable across engines.

The extraction queries (q01/q02/q08/q09) synthesize an HTML page per
``documents`` row *inside the query* with pure string concatenation — the
identical construction is expressible in SQL, so DuckDB can state the
expected extractor output in closed form. This makes the pandas-UDF
extraction path itself driver-verifiable, not just pytest-verifiable.
"""

from __future__ import annotations

from datetime import timezone as _tz

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_utc = _tz.utc

from .functions.tokenize import with_tokens
from .operators import tf as tfops
from .operators.extract import extract_pages

# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → Common-Crawl-style docs table with deterministic HTML.

    Page layout (keep in sync with the oracle fragments below):
    title "Doc {id}", meta description "{source} document", header+nav
    (boilerplate, stripped), h1 "Heading {id}", body text, internal link
    "/about/{id}" (anchor text "about"), external link
    "https://ext{id%5}.example.org/page" (anchor text "ext"), an image,
    a footer.
    """
    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"), sid
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), sid,
        F.lit('</title><meta name="description" content="'),
        F.col("source"), F.lit(' document"></head><body>'),
        F.lit("<header>site header</header>"),
        F.lit('<nav><a href="https://nav.example.net/x">navlink</a></nav>'),
        F.lit("<h1>Heading "), sid, F.lit("</h1><p>"),
        F.col("text"), F.lit("</p>"),
        F.lit('<a href="/about/'), sid, F.lit('">about</a>'),
        F.lit('<a href="https://ext'), (F.col("doc_id") % 5).cast("string"),
        F.lit('.example.org/page">ext</a>'),
        F.lit('<img src="/img/'), sid, F.lit('.png" alt="img '), sid, F.lit('">'),
        F.lit("<footer>footer</footer></body></html>"),
    )
    return d.select(
        F.col("doc_id"),
        url.alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )


# Oracle fragment: the tokenizer over documents(text, lang), compat stopwords
# (reference hermetic fallback sets — see functions/stopwords.py).
_TOKENS_CTE = """
WITH toks AS (
  SELECT doc_id, source, lang,
         unnest(string_split(lower(trim(regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' ')) AS word
  FROM documents
), words AS (
  SELECT doc_id, source, lang, word FROM toks
  WHERE length(word) >= 2
    AND NOT (lang = 'en' AND word IN ('the','a','and','of','is','this'))
    AND NOT (lang = 'es' AND word IN ('y','de','la','que'))
    AND NOT (lang IN ('pt','pt-br') AND word IN ('e','de','que','o'))
)
"""

# Oracle fragment: expected extractor output for the synthesized page.
# Visible text node order: title, h1, <p> body, "about", "ext"; header/nav/
# footer are decomposed; whitespace collapsed and trimmed.
_EXPECTED_TEXT = (
    "trim(regexp_replace('Doc ' || doc_id || ' Heading ' || doc_id || ' ' "
    "|| text || ' about ext', '\\s+', ' ', 'g'))"
)


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_as_pages(spark, sf_dir)
    return extract_pages(docs, tokens=False)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

QUERIES = {}
ORACLE = {}


def q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return reg


# --- extraction over synthesized HTML (SURVEY §2.2 O1, O4-O11) -------------

@q(
    "q01_extract_seo",
    f"""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || doc_id AS url,
           'Doc ' || doc_id AS title,
           source || ' document' AS meta_description,
           '# Heading ' || doc_id AS headings_str,
           'docs-' || doc_id AS slug,
           2 AS n_external,
           1 AS n_internal,
           1 AS n_images
    FROM documents
    """,
)
def q01_extract_seo(spark, sf_dir):
    ex = _extracted(spark, sf_dir)
    return ex.select(
        F.regexp_extract("url", r"/docs/(\d+)$", 1).cast("bigint").alias("doc_id"),
        "url",
        "title",
        "meta_description",
        F.concat_ws("\n", "headings").alias("headings_str"),
        "slug",
        F.size("external_links").alias("n_external"),
        F.size("internal_links").alias("n_internal"),
        F.size("images").alias("n_images"),
    )


@q(
    "q02_extract_text_hash",
    f"""
    SELECT doc_id,
           {_EXPECTED_TEXT} AS extracted_text,
           sha256({_EXPECTED_TEXT}) AS page_hash
    FROM documents
    """,
)
def q02_extract_text_hash(spark, sf_dir):
    ex = _extracted(spark, sf_dir)
    return ex.select(
        F.regexp_extract("url", r"/docs/(\d+)$", 1).cast("bigint").alias("doc_id"),
        F.col("text").alias("extracted_text"),
        "page_hash",
    )


@q(
    "q08_external_urls",
    """
    SELECT DISTINCT ext_url FROM (
      SELECT 'https://ext' || (doc_id % 5) || '.example.org/page' AS ext_url
      FROM documents
      UNION ALL
      SELECT 'https://nav.example.net/x' FROM documents
    ) ORDER BY ext_url
    """,
)
def q08_external_urls(spark, sf_dir):
    return tfops.external_urls_global(_extracted(spark, sf_dir))


@q(
    "q09_index_entries",
    """
    SELECT 'docs-' || doc_id AS slug,
           'Doc ' || doc_id AS title,
           'docs-' || doc_id || '.md' AS md_filename
    FROM documents
    """,
)
def q09_index_entries(spark, sf_dir):
    return tfops.index_entries(_extracted(spark, sf_dir))


# --- tokenization / TF over documents.text (SURVEY §2.3 R3-R7) -------------


def _tokens_df(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return with_tokens(d).withColumnRenamed("doc_id", "doc_id")


@q(
    "q03_corpus_tf",
    _TOKENS_CTE
    + "SELECT word, count(*) AS freq FROM words GROUP BY word ORDER BY freq DESC, word",
)
def q03_corpus_tf(spark, sf_dir):
    t = _tokens_df(spark, sf_dir)
    return (
        t.select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
    )


@q(
    "q04_doc_frequency",
    _TOKENS_CTE
    + """
    SELECT word, count(DISTINCT doc_id) AS n_docs
    FROM words GROUP BY word ORDER BY n_docs DESC, word
    """,
)
def q04_doc_frequency(spark, sf_dir):
    t = _tokens_df(spark, sf_dir)
    return (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .dropDuplicates(["doc_id", "word"])
        .groupBy("word")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "word")
    )


@q(
    "q05_word_count_per_doc",
    _TOKENS_CTE
    + """
    SELECT d.doc_id, count(w.word) AS word_count
    FROM documents d LEFT JOIN words w ON d.doc_id = w.doc_id
    GROUP BY d.doc_id
    """,
)
def q05_word_count_per_doc(spark, sf_dir):
    t = _tokens_df(spark, sf_dir)
    return t.select("doc_id", F.size("tokens").cast("bigint").alias("word_count"))


@q(
    "q06_top5_words_per_doc",
    _TOKENS_CTE
    + """
    , tf AS (
      SELECT doc_id, word, count(*) AS freq FROM words GROUP BY doc_id, word
    )
    SELECT doc_id, word, freq, rank FROM (
      SELECT doc_id, word, freq,
             row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, word) AS rank
      FROM tf
    ) WHERE rank <= 5
    """,
)
def q06_top5_words_per_doc(spark, sf_dir):
    t = _tokens_df(spark, sf_dir)
    tf = (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("freq"), "word")
    return (
        tf.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    )


@q(
    "q07_source_top_keywords",
    _TOKENS_CTE
    + """
    , tf AS (
      SELECT source, word, count(*) AS freq FROM words GROUP BY source, word
    )
    SELECT source, word, freq, rank FROM (
      SELECT source, word, freq,
             row_number() OVER (PARTITION BY source ORDER BY freq DESC, word) AS rank
      FROM tf
    ) WHERE rank <= 10
    """,
)
def q07_source_top_keywords(spark, sf_dir):
    """Per-'domain' keyword report with explicit two-stage salted
    aggregation (north_star skew handling; salted ≡ unsalted is tested)."""
    t = _tokens_df(spark, sf_dir)
    words = t.select("doc_id", "source", F.explode("tokens").alias("word"))
    counts = (
        words.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
        .groupBy("source", "word", "_salt")
        .agg(F.count("*").alias("_pf"))
        .groupBy("source", "word")
        .agg(F.sum("_pf").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), "word")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# --- state / resume (SURVEY §1.2, §2.3 R1, R9, R11) -------------------------

@q(
    "q10_resume_pending",
    """
    WITH state AS (
      SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS status
      FROM documents
    )
    SELECT d.doc_id FROM documents d
    LEFT JOIN (SELECT doc_id FROM state WHERE status = 1) done
      ON d.doc_id = done.doc_id
    WHERE done.doc_id IS NULL
    """,
)
def q10_resume_pending(spark, sf_dir):
    """visited_urls Status==2 scan re-expressed as a left-anti join
    (crawler.py:215 → SURVEY §1.2). State synthesized: doc_id%3==0 done."""
    d = _read(spark, sf_dir, "documents")
    state = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit(1)).otherwise(F.lit(2)).alias("status"),
    )
    done = state.filter(F.col("status") == 1).select("doc_id")
    return d.join(done, "doc_id", "left_anti").select("doc_id")


@q(
    "q11_merge_last_wins",
    """
    SELECT slug, doc_id AS kept_doc_id FROM (
      SELECT source AS slug, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY doc_id DESC) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q11_merge_last_wins(spark, sf_dir):
    """Project-JSON merge-by-slug last-wins (exporters/json.py:197-201) as a
    window dedup; 'slug' synthesized from source, recency from doc_id."""
    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("slug").orderBy(F.desc("doc_id"))
    return (
        d.select(F.col("source").alias("slug"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("slug", F.col("doc_id").alias("kept_doc_id"))
    )


# --- relational breadth on TPC-H-ish tables ---------------------------------

@q(
    "q12_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q12_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-side filter pushdown + partial/final hash agg.
    Decimal sums (exact, order-independent) cast to double for the compare."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "q13_top_customers",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY total_spent DESC, c_custkey
    LIMIT 100
    """,
)
def q13_top_customers(spark, sf_dir):
    """Broadcast join (customer ≪ orders) + agg + deterministic top-k."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(100)
    )


@q(
    "q14_recent_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q14_recent_orders_per_customer(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@q(
    "q15_event_type_stats",
    """
    SELECT event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q15_event_type_stats(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .orderBy("event_type")
    )


# --- training-data pipeline: dedup / similarity / textstats / multimodal ----
# (beyond-reference capability per task brief; SURVEY.md §2.4 extensions)

# DuckDB fragment: ordered token string per doc (same tokens, same order as
# the engine's tokenizer — list ops preserve order).
_TOKSTR_CTE = """
WITH base AS (
  SELECT doc_id, source, lang,
    array_to_string(
      list_filter(
        string_split(lower(trim(regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
        w -> length(w) >= 2
             AND NOT (lang = 'en' AND w IN ('the','a','and','of','is','this'))
             AND NOT (lang = 'es' AND w IN ('y','de','la','que'))
             AND NOT (lang IN ('pt','pt-br') AND w IN ('e','de','que','o'))
      ), ' ') AS tok_str
  FROM documents
)
"""

_MINHASH_CTES = _TOKSTR_CTE + """
, sh AS (
  SELECT DISTINCT doc_id, substr(tok_str, i, 12) AS gram
  FROM (
    SELECT doc_id, tok_str,
           unnest(range(1, greatest(length(tok_str) - 11, 1) + 1)) AS i
    FROM base WHERE length(tok_str) > 0
  )
), hsh AS (
  -- Kirsch–Mitzenmacher double hashing: one md5 per shingle, two 32-bit
  -- halves, h_s = (a + s·b) mod 2^32 (matches operators/dedup.py)
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT AS a,
         ('0x' || substr(md5(gram), 9, 8))::BIGINT AS b
  FROM sh
), mh AS (
  SELECT doc_id, seed, min((a + seed * b) % 4294967296) AS mhv
  FROM hsh CROSS JOIN (SELECT unnest(range(0, 12)) AS seed)
  GROUP BY doc_id, seed
), bands AS (
  SELECT doc_id, CAST(seed // 3 AS INT) AS band,
         string_agg(lower(lpad(hex(mhv), 8, '0')), '' ORDER BY seed) AS band_key
  FROM mh GROUP BY doc_id, CAST(seed // 3 AS INT)
)
"""


def _tokstr_df(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return with_tokens(d).select(
        "doc_id", "source", "lang",
        F.concat_ws(" ", "tokens").alias("tok_str"),
    )


@q(
    "q16_dedup_exact",
    """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 < 2 THEN 'duplicate content block' ELSE text END AS text
      FROM documents
    )
    SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_id,
           count(*) - 1 AS n_dups
    FROM d GROUP BY sha256(text)
    """,
)
def q16_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash; dup group synthesized deterministically
    (doc_id%7<2 → shared payload) so the group semantics are exercised."""
    from .operators.dedup import exact_dedup

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 < 2, F.lit("duplicate content block"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return exact_dedup(d)


@q(
    "q17_minhash_bands",
    _MINHASH_CTES + "SELECT doc_id, band, band_key FROM bands",
)
def q17_minhash_bands(spark, sf_dir):
    """MinHash signatures (12 hashes, md5 double-hash family) banded 4×3
    for LSH."""
    from .operators.dedup import char_shingles, lsh_bands, minhash_signatures

    t = _tokstr_df(spark, sf_dir)
    sh = char_shingles(t, text_col="tok_str", k=12)
    return lsh_bands(minhash_signatures(sh, n_hashes=12), rows_per_band=3)


@q(
    "q18_lsh_candidate_pairs",
    _MINHASH_CTES
    + """
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def q18_lsh_candidate_pairs(spark, sf_dir):
    """LSH candidate pairs: equi-join on band buckets — the 10^12-doc-safe
    candidate generator (never a cross join)."""
    from .operators.dedup import (
        char_shingles,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    t = _tokstr_df(spark, sf_dir)
    bands = lsh_bands(
        minhash_signatures(char_shingles(t, text_col="tok_str", k=12), n_hashes=12),
        rows_per_band=3,
    )
    return lsh_candidate_pairs(bands)


@q(
    "q19_ngram_jaccard",
    _MINHASH_CTES.replace("WHERE length(tok_str) > 0",
                          "WHERE length(tok_str) > 0 AND doc_id < 100")
    + """
    , sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
    , inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.2
    """,
)
def q19_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over char-12-gram shingle sets (bounded sample:
    doc_id<100 — at scale this runs on LSH candidates, not all pairs)."""
    from .operators.dedup import char_shingles, ngram_jaccard_pairs

    t = _tokstr_df(spark, sf_dir).filter(F.col("doc_id") < 100)
    sh = char_shingles(t, text_col="tok_str", k=12)
    return ngram_jaccard_pairs(sh, min_jaccard=0.2)


_SIMHASH_CTES = _TOKENS_CTE + """
, tc AS (SELECT doc_id, word, count(*) AS cnt FROM words GROUP BY doc_id, word)
, hx AS (SELECT doc_id, cnt, substr(md5(word), 1, 8) AS h8 FROM tc)
, bits AS (
  SELECT doc_id, j,
         sum(cnt * (2 * (((strpos('0123456789abcdef', substr(h8, CAST(j // 4 AS INT) + 1, 1)) - 1)
                          // CAST(power(2, 3 - j % 4) AS INT)) % 2) - 1)) AS s
  FROM hx CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
  GROUP BY doc_id, j
), simhashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN power(2, j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
"""


@q("q20_simhash", _SIMHASH_CTES + "SELECT doc_id, simhash FROM simhashes")
def q20_simhash(spark, sf_dir):
    """32-bit weighted SimHash per document (md5-hex bit family)."""
    from .operators.dedup import simhash32

    t = _tokens_df(spark, sf_dir)
    tc = (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    return simhash32(tc)


@q(
    "q21_simhash_near_pairs",
    _SIMHASH_CTES
    + """
    , bands AS (
      SELECT doc_id, simhash, j AS band,
             (simhash // CAST(power(2, j * 8) AS BIGINT)) % 256 AS band_val
      FROM simhashes CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def q21_simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs: banded pigeonhole candidates (4×8 bits)
    verified by Hamming distance ≤ 6."""
    from .operators.dedup import simhash32, simhash_near_pairs

    t = _tokens_df(spark, sf_dir)
    tc = (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    return simhash_near_pairs(simhash32(tc), max_hamming=6)


@q(
    "q22_ann_bruteforce",
    """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 20),
    scored AS (
      SELECT qs.query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(qs.qv, b.v), 4) AS sim
      FROM base b, qs WHERE b.vec_id != qs.query_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 5
    """,
)
def q22_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for 20 query vectors (brute force baseline)."""
    from .operators.similarity import ann_bruteforce_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ann_bruteforce_topk(emb, range(20), k=5).select(
        "query_id", "neighbor_id", "sim", "rank"
    )


@q(
    "q23_ann_signlsh",
    """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
           + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
           + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
           + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
           + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, v AS qv, bucket FROM base WHERE vec_id < 20),
    scored AS (
      SELECT qs.query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(qs.qv, b.v), 4) AS sim
      FROM base b JOIN qs USING (bucket) WHERE b.vec_id != qs.query_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
)
def q23_ann_signlsh(spark, sf_dir):
    """Sign-LSH bucketed ANN: candidates share an 8-bit sign bucket —
    bucket equi-join instead of a cross join (the scale path)."""
    from .operators.similarity import ann_bucketed_topk

    emb = _read(spark, sf_dir, "embeddings")
    # NOTE: bucket computed on RAW float sign — identical to double sign
    return ann_bucketed_topk(emb, range(20), k=3, bits=8).select(
        "query_id", "neighbor_id", "sim", "rank"
    )


@q(
    "q24_embedding_near_dups",
    """
    WITH orig AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dups AS (
      SELECT vec_id + 10000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
      FROM orig WHERE vec_id < 50
    ),
    allv AS (SELECT * FROM orig UNION ALL SELECT * FROM dups),
    a AS (SELECT vec_id AS a_id, v AS va FROM allv WHERE a_id < 200),
    pairs AS (
      SELECT a.a_id, b.vec_id AS b_id,
             round(list_cosine_similarity(a.va, b.v), 4) AS sim
      FROM a, allv b WHERE a.a_id < b.vec_id
    )
    SELECT a_id, b_id, sim FROM pairs WHERE sim >= 0.99
    """,
)
def q24_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs; 50 deterministic near-duplicates
    synthesized (v×1.001 at vec_id+10000) so the detector provably fires."""
    from .operators.similarity import embedding_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dups = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    allv = emb.unionByName(dups)
    return embedding_near_dup_pairs(allv, threshold=0.99, max_left_id=200)


@q(
    "q25_lang_guess",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                        w -> length(w) > 0)) AS w
      FROM documents
    ), scores AS (
      SELECT doc_id,
        sum(CASE WHEN w IN ('der','die','und','das','ein','nicht') THEN 1 ELSE 0 END) AS s_de,
        sum(CASE WHEN w IN ('the','and','of','is','this','that','with') THEN 1 ELSE 0 END) AS s_en,
        sum(CASE WHEN w IN ('que','la','de','los','las','una') THEN 1 ELSE 0 END) AS s_es,
        sum(CASE WHEN w IN ('le','la','et','les','des','une') THEN 1 ELSE 0 END) AS s_fr,
        sum(CASE WHEN w IN ('que','de','não','uma','os','das') THEN 1 ELSE 0 END) AS s_pt
      FROM words GROUP BY doc_id
    ), unp AS (
      SELECT doc_id, 'de' AS lg, s_de AS s FROM scores UNION ALL
      SELECT doc_id, 'en', s_en FROM scores UNION ALL
      SELECT doc_id, 'es', s_es FROM scores UNION ALL
      SELECT doc_id, 'fr', s_fr FROM scores UNION ALL
      SELECT doc_id, 'pt', s_pt FROM scores
    )
    SELECT doc_id,
           CASE WHEN s > 0 THEN lg ELSE 'none' END AS lang_guess,
           CAST(s AS BIGINT) AS best_score
    FROM (
      SELECT doc_id, lg, s,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lg) AS rn
      FROM unp
    ) WHERE rn = 1
    """,
)
def q25_lang_guess(spark, sf_dir):
    """Marker-word language ID (argmax with lang-asc tie-break)."""
    from .operators.textstats import lang_guess

    return lang_guess(_read(spark, sf_dir, "documents"))


@q(
    "q26_quality_scores",
    """
    WITH words AS (
      SELECT doc_id, length(text) AS n_chars,
             unnest(list_filter(string_split(lower(text), ' '),
                                w -> length(w) > 0)) AS w
      FROM documents
    )
    SELECT doc_id, n_chars, count(*) AS n_words,
           count(DISTINCT w) AS n_distinct_words,
           round(count(DISTINCT w) / CAST(count(*) AS DOUBLE), 4) AS type_token_ratio,
           round(sum(CASE WHEN w IN ('the','a','and','of','is','this','that','to','in','it')
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS stopword_ratio,
           round(sum(length(w)) / CAST(count(*) AS DOUBLE), 4) AS mean_word_len,
           CAST(count(*) >= 10 AND count(DISTINCT w) / CAST(count(*) AS DOUBLE) >= 0.2
                AS INT) AS quality_ok
    FROM words GROUP BY doc_id, n_chars
    """,
)
def q26_quality_scores(spark, sf_dir):
    """Pre-training quality gates: length, lexical diversity, stopword
    ratio, mean word length, boolean gate."""
    from .operators.textstats import quality_scores

    return quality_scores(_read(spark, sf_dir, "documents")).withColumn(
        "quality_ok", F.col("quality_ok").cast("int")
    )


@q(
    "q27_token_counts",
    """
    SELECT doc_id, length(text) AS n_chars,
           len(list_filter(string_split(text, ' '), w -> length(w) > 0)) AS n_ws_tokens,
           len(list_filter(string_split_regex(text, '[^A-Za-zÀ-ÿ]+'),
                           w -> length(w) > 0)) AS n_word_tokens
    FROM documents
    """,
)
def q27_token_counts(spark, sf_dir):
    """Whitespace-chunk and letter-run token counts + char count."""
    from .operators.textstats import token_counts

    return token_counts(_read(spark, sf_dir, "documents"))


@q(
    "q28_fingerprints",
    """
    WITH norm AS (SELECT doc_id, lower(text) AS s FROM documents),
    grams AS (
      SELECT doc_id, md5(substr(s, i, 16)) AS gh
      FROM (SELECT doc_id, s,
                   unnest(range(1, greatest(length(s) - 15, 1) + 1)) AS i
            FROM norm)
    )
    SELECT n.doc_id, md5(n.s) AS content_md5, m.min_gram_hash
    FROM norm n JOIN (SELECT doc_id, min(gh) AS min_gram_hash
                      FROM grams GROUP BY doc_id) m USING (doc_id)
    """,
)
def q28_fingerprints(spark, sf_dir):
    """Content md5 + min char-16-gram hash fingerprint (winnowing-lite)."""
    from .operators.textstats import fingerprints

    return fingerprints(_read(spark, sf_dir, "documents"), k=16)


@q(
    "q29_multimodal_meta",
    """
    WITH dims AS (
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 64 AS INT) AS width,
             CAST(16 + (doc_id * 7) % 64 AS INT) AS height
      FROM documents
    )
    SELECT media_id,
           CAST(68 + height * (width + 1) AS BIGINT) AS n_bytes,
           'png' AS format_guess, width, height
    FROM dims
    """,
)
def q29_multimodal_meta(spark, sf_dir):
    """Opaque binary payload → typed metadata via mapInPandas, with REAL
    decoding: valid PNGs are synthesized per doc (imagex.make_png —
    stored-block zlib, so the exact byte size is closed-form
    68 + h*(w+1)) and the metadata pass parses actual IHDR headers
    (imagex.sniff_image). The oracle states format/dims/size without ever
    seeing the bytes — only a real parser can match it."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .imagex import make_png
    from .operators.multimodal import media_metadata

    def _png_batch(doc_id):
        # (module uses `from __future__ import annotations`, so type-hint
        # inference is unavailable — classic pandas_udf form instead)
        return pd.Series(
            [
                make_png(16 + int(i) % 64, 16 + (int(i) * 7) % 64,
                         seed=int(i))
                for i in doc_id
            ]
        )

    png_udf = pandas_udf(_png_batch, BinaryType())

    media = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        png_udf(F.col("doc_id")).alias("payload"),
    )
    return media_metadata(media, deterministic_fake=False).select(
        "media_id", "n_bytes", "format_guess", "width", "height"
    )


# --- TF merge + rollup (SURVEY §2.3 R5; §2.4 grouping-sets extension) -------

@q(
    "q37_merge_tf",
    _TOKENS_CTE
    + """
    , a AS (SELECT word, count(*) AS freq FROM words WHERE doc_id % 2 = 0 GROUP BY word)
    , b AS (SELECT word, count(*) AS freq FROM words WHERE doc_id % 2 = 1 GROUP BY word)
    SELECT word, CAST(sum(freq) AS BIGINT) AS freq FROM (
      SELECT * FROM a UNION ALL SELECT * FROM b
    ) GROUP BY word ORDER BY freq DESC, word
    """,
)
def q37_merge_tf(spark, sf_dir):
    """Legacy Counter-union TF merge (scripts/main.py:436-445): two runs'
    keyword tables unioned and re-summed — the incremental-crawl TF update."""
    t = _tokens_df(spark, sf_dir).withColumn("url", F.col("doc_id").cast("string"))
    a = tfops.corpus_tf(t.filter(F.col("doc_id") % 2 == 0))
    b = tfops.corpus_tf(t.filter(F.col("doc_id") % 2 == 1))
    return tfops.merge_tf(a, b)


@q(
    "q38_token_rollup",
    _TOKENS_CTE
    + """
    SELECT coalesce(source, '(all)') AS source, coalesce(lang, '(all)') AS lang,
           count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
    FROM words GROUP BY ROLLUP(source, lang)
    """,
)
def q38_token_rollup(spark, sf_dir):
    """domain×lang token rollup with subtotals (SURVEY §2.4: grouping-sets
    extension for corpus composition reports). Subtotal NULL keys coalesced
    to '(all)' so the cross-engine value-hash has no NULL ordering issues."""
    words = _tokens_df(spark, sf_dir).select(
        "source", "lang", F.explode("tokens").alias("word")
    )
    return (
        words.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct"),
        )
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_tokens",
            "n_distinct",
        )
    )


# --- report sinks (SURVEY §2.1 S7-S14) — byte-layout parity, driver-checked -

def documents_as_simple_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal closed-form page per documents row: the full report layout
    (top-50 incl. Counter tie order, previews, truncation markers) is
    SQL-expressible, so DuckDB can state the EXACT report bytes."""
    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"), sid
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), sid,
        F.lit("</title></head><body><h1>Heading "), sid,
        F.lit('</h1><p>alpha alpha beta gamma</p>'),
        F.lit('<a href="https://ext.example.org/p">ext</a>'),
        F.lit('<img src="/i.png" alt="pic"></body></html>'),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


_SIMPLE_HTML_SQL = (
    "'<html><head><title>Doc ' || doc_id || '</title></head><body>"
    "<h1>Heading ' || doc_id || '</h1><p>alpha alpha beta gamma</p>"
    '<a href="https://ext.example.org/p">ext</a>'
    "<img src=\"/i.png\" alt=\"pic\"></body></html>'"
)
_SIMPLE_TEXT_SQL = (
    "'Doc ' || doc_id || ' Heading ' || doc_id || ' alpha alpha beta gamma ext'"
)


@q(
    "q31_page_markdown",
    f"""
    SELECT doc_id,
      '# `https://' || source || '.example.com/docs/' || doc_id || e'`\\n\\n'
      || '**Title**: Doc ' || doc_id || e'\\n\\n'
      || e'**Meta Description**: \\n\\n'
      || e'## Headings\\n- # Heading ' || doc_id || e'\\n\\n'
      || e'## Word Frequency (Top 50)\\n'
      || e'- **alpha**: 2\\n- **doc**: 1\\n- **heading**: 1\\n'
      || e'- **beta**: 1\\n- **gamma**: 1\\n- **ext**: 1\\n\\n'
      || e'## External Links\\n- https://ext.example.org/p\\n\\n'
      || e'## Images with ALT\\n- `src`: /i.png\\n  - alt: pic\\n'
      || e'## Cleaned Text\\n```\\n' || {_SIMPLE_TEXT_SQL} || e'...\\n```\\n\\n'
      || e'## Raw HTML\\n```html\\n' || {_SIMPLE_HTML_SQL}
      || e'\\n... (truncated)\\n```\\n\\n'
      || e'---\\n_Total words analyzed: 7_\\n' AS md_doc
    FROM documents
    """,
)
def q31_page_markdown(spark, sf_dir):
    """Per-page Markdown report (markdown.py:34-128 layout) rendered by an
    Arrow-batched pandas UDF; byte-exact vs the closed-form oracle."""
    from .operators.sinks import page_markdown_udf

    docs = documents_as_simple_pages(spark, sf_dir)
    return docs.select(
        "doc_id", page_markdown_udf(F.col("url"), F.col("html")).alias("md_doc")
    )


@q(
    "q32_page_json",
    f"""
    SELECT doc_id,
      e'{{\\n  "url": "https://' || source || '.example.com/docs/' || doc_id
      || e'",\\n  "slug": "docs-' || doc_id
      || e'",\\n  "title": "Doc ' || doc_id
      || e'",\\n  "meta_description": "",\\n  "headings": [\\n    "# Heading '
      || doc_id || e'"\\n  ],\\n  "word_count": 7,\\n  "word_frequency": {{'
      || e'\\n    "doc": 1,\\n    "heading": 1,\\n    "alpha": 2,'
      || e'\\n    "beta": 1,\\n    "gamma": 1,\\n    "ext": 1\\n  }},'
      || e'\\n  "images": [\\n    {{\\n      "src": "/i.png",\\n      "alt": "pic"\\n    }}\\n  ],'
      || e'\\n  "external_links": [\\n    "https://ext.example.org/p"\\n  ],'
      || e'\\n  "page_hash": "' || sha256({_SIMPLE_TEXT_SQL})
      || e'",\\n  "md_filename": "docs-' || doc_id || e'.md"\\n}}' AS page_json
    FROM documents
    """,
)
def q32_page_json(spark, sf_dir):
    """pages_json/<slug>.json body (json.py:24-37: indent=2, key order =
    crawler.py:163-175, word_frequency = first-occurrence order)."""
    from .operators.sinks import page_json_udf

    docs = documents_as_simple_pages(spark, sf_dir)
    return docs.select(
        "doc_id",
        page_json_udf(F.col("url"), F.col("html"), F.col("lang")).alias(
            "page_json"
        ),
    )


@q(
    "q33_visited_rows",
    """
    SELECT 'https://' || source || '.example.com/docs/' || doc_id AS "URL",
           1 AS "Status",
           '2026-01-01' AS "Data",
           'docs-' || doc_id || '.md' AS "MD File",
           'docs-' || doc_id || '.json' AS "JSON File"
    FROM documents
    """,
)
def q33_visited_rows(spark, sf_dir):
    """visited_urls state rows in the reference CSV shape (storage.py:65,
    crawler.py:253-260: Status=1, Data=%Y-%m-%d)."""
    from .operators.sinks import visited_urls_rows

    return visited_urls_rows(_extracted(spark, sf_dir))


@q(
    "q34_keyword_csv_lines",
    _TOKENS_CTE
    + """
    SELECT word, count(*) AS freq, word || ',' || count(*) AS line
    FROM words GROUP BY word
    """,
)
def q34_keyword_csv_lines(spark, sf_dir):
    """keyword_frequency CSV body lines (csv.py:40-53)."""
    from .operators.sinks import keyword_frequency_csv_lines

    return keyword_frequency_csv_lines(
        tfops.corpus_tf(
            _tokens_df(spark, sf_dir).withColumn(
                "url", F.col("doc_id").cast("string")
            )
        )
    )


@q(
    "q35_index_md_lines",
    """
    SELECT DISTINCT 'docs-' || doc_id AS slug,
           '- [Docs ' || doc_id || '](pages_md/docs-' || doc_id || '.md)' AS line
    FROM documents
    """,
)
def q35_index_md_lines(spark, sf_dir):
    """index.md link lines (markdown.py:131-154: slug title-cased, glob
    order = slug sort)."""
    from .operators.sinks import index_markdown_lines

    return index_markdown_lines(_extracted(spark, sf_dir))


@q(
    "q36_external_urls_md_doc",
    """
    WITH ext AS (
      SELECT DISTINCT 'https://ext' || (doc_id % 5) || '.example.org/page' AS u
      FROM documents
      UNION
      SELECT DISTINCT 'https://nav.example.net/x' FROM documents
    )
    SELECT '# External URLs' || chr(10) || chr(10)
           || string_agg('- ' || u, chr(10) ORDER BY u) || chr(10) AS doc
    FROM ext
    """,
)
def q36_external_urls_md_doc(spark, sf_dir):
    """Complete external_urls.md document (csv.py:60-83 + MD_HEADER)."""
    from .operators.sinks import external_urls_markdown_doc

    return external_urls_markdown_doc(_extracted(spark, sf_dir))


# --- sitemap seeding (SURVEY §2.1 S3) + event sessionization (§2.4 ext) ----

@q(
    "q39_sitemap_seed",
    """
    SELECT 'https://' || source || '.example.com/docs/' || doc_id AS "URL",
           1 AS "Status"
    FROM documents
    UNION ALL
    SELECT 'https://' || source || '.example.com/new/' || doc_id, 2
    FROM documents
    """,
)
def q39_sitemap_seed(spark, sf_dir):
    """Sitemap URL-universe seeding (storage.py:85-117): parse <loc> from
    synthesized sitemap XML (half with namespace prefixes + padding, to
    exercise trim/prefix handling), anti-join against the state table,
    append unseen urls as Status=2."""
    from .sources.sitemap import seed_urls, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    base = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
    plain = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>  '),
        base, F.lit("/docs/"), sid,
        F.lit("</loc></url><url><loc>"),
        base, F.lit("/new/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    prefixed = F.concat(
        F.lit("<sm:urlset><sm:url><sm:loc>"),
        base, F.lit("/docs/"), sid,
        F.lit("</sm:loc></sm:url><sm:url><sm:loc> "),
        base, F.lit("/new/"), sid,
        F.lit(" </sm:loc></sm:url></sm:urlset>"),
    )
    sitemaps = d.select(
        F.when(F.col("doc_id") % 2 == 1, prefixed).otherwise(plain).alias(
            "sitemap_xml"
        )
    )
    state = d.select(
        F.concat(base, F.lit("/docs/"), sid).alias("URL"),
        F.lit(1).alias("Status"),
        F.lit("2026-01-01").alias("Data"),
        F.concat(F.lit("docs-"), sid, F.lit(".md")).alias("MD File"),
        F.concat(F.lit("docs-"), sid, F.lit(".json")).alias("JSON File"),
    )
    return seed_urls(sitemap_locs(sitemaps), state).select("URL", "Status")


@q(
    "q40_user_sessions",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM e
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
             AS duration_sec
    FROM s GROUP BY user_id, session_idx
    """,
)
def q40_user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the batch form of streaming session windows (SURVEY §2.4: window-fn
    coverage beyond the reference)."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagts = F.lag("ts").over(w)
    new_s = F.when(
        lagts.isNull()
        | ((F.col("ts") - lagts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    s = e.select("user_id", "ts", "event_id").withColumn(
        "session_idx",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_sec"),
    )


@q(
    "q42_tf_idf",
    _TOKENS_CTE
    + """
    , tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word)
    , dfr AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word)
    , n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
    SELECT tf.doc_id, tf.word, tf.tf, dfr.df,
           round(tf.tf * ln(n.n / CAST(dfr.df AS DOUBLE)), 6) AS tf_idf
    FROM tf JOIN dfr USING (word) CROSS JOIN n
    """,
)
def q42_tf_idf(spark, sf_dir):
    """Per-document TF-IDF (tf × ln(N/df)) — broadcast df-dim join, the
    big TF table never reshuffles."""
    t = _tokens_df(spark, sf_dir).withColumn("url", F.col("doc_id"))
    out = tfops.tf_idf(t)
    return out.select(
        F.col("url").alias("doc_id"), "word", "tf", "df",
        F.round("tf_idf", 6).alias("tf_idf"),
    )


@q(
    "q43_bigram_tf",
    """
    WITH base AS (
      SELECT doc_id,
        list_filter(
          string_split(lower(trim(regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
          w -> length(w) >= 2
               AND NOT (lang = 'en' AND w IN ('the','a','and','of','is','this'))
               AND NOT (lang = 'es' AND w IN ('y','de','la','que'))
               AND NOT (lang IN ('pt','pt-br') AND w IN ('e','de','que','o'))
        ) AS toks
      FROM documents
    )
    SELECT toks[i] || ' ' || toks[i + 1] AS bigram, count(*) AS freq
    FROM (
      SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i FROM base
    )
    GROUP BY bigram ORDER BY freq DESC, bigram
    """,
)
def q43_bigram_tf(spark, sf_dir):
    """Corpus bigram counts — per-row zip_with(tokens, tail) so n-gram
    construction never shuffles; only the final count aggregates."""
    t = _tokens_df(spark, sf_dir).withColumn("url", F.col("doc_id"))
    return tfops.bigram_tf(t)


@q(
    "q44_main_content",
    """
    SELECT doc_id,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS main_text,
           'div' AS node_tag,
           'article-content' AS node_hint,
           CAST(0.0 AS DOUBLE) AS link_density
    FROM documents
    """,
)
def q44_main_content(spark, sf_dir):
    """Readability-style main-content extraction (north_star: DOM-tree
    link/text-density scoring). Page synthesized with nav/footer
    boilerplate around an article div; the classifier must pick the
    article body — whose text is closed-form — every time."""
    from .operators.readability import extract_main

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><nav class="nav"><a href="/a">Home</a>'
              '<a href="/b">About</a><a href="/c">Contact</a></nav>'
              '<div class="sidebar"><a href="/x">one link</a>'
              '<a href="/y">two link</a></div>'
              '<div class="article-content"><p>'),
        F.col("text"),
        F.lit('</p></div><footer class="footer">(c) example</footer>'
              "</body></html>"),
    )
    docs = d.select(
        F.col("doc_id"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/r/"), sid).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return extract_main(docs).select(
        F.regexp_extract("url", r"/r/(\d+)$", 1).cast("bigint").alias("doc_id"),
        "main_text", "node_tag", "node_hint", "link_density",
    )


@q(
    "q41_url_canonical",
    """
    SELECT doc_id,
      CASE doc_id % 3
        WHEN 0 THEN 'https://' || lower(source) || '.example.com/P/' || doc_id
        WHEN 1 THEN 'http://' || lower(source) || '.example.com/Docs/' || doc_id
                    || '?a=' || (doc_id % 5) || '&b=2'
        ELSE 'http://' || lower(source) || '.example.com/q/' || doc_id
      END AS canon_url
    FROM documents
    """,
)
def q41_url_canonical(spark, sf_dir):
    """URL canonicalization (native Column ops): case-insensitive
    scheme/host, default-port strip, fragment drop, empty-query drop,
    query-param sort. Messy variants synthesized per doc; oracle states
    the canonical form in closed form."""
    from .functions.urlnorm import canonical_url

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    messy = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("HTTPS://"), F.upper("source"),
                     F.lit(".EXAMPLE.com:443/P/"), sid, F.lit("#sec")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("http://"), F.col("source"),
                     F.lit(".Example.COM:80/Docs/"), sid,
                     F.lit("?b=2&a="), (F.col("doc_id") % 5).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("HTTP://"), F.col("source"),
                     F.lit(".example.com/q/"), sid, F.lit("?")),
        )
    )
    return d.select(
        "doc_id", canonical_url(messy).alias("canon_url")
    )


@q(
    "q46_gopher_flags",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                        w -> length(w) > 0)) AS w
      FROM documents
    ), pw AS (
      SELECT doc_id, count(*) AS n_words,
             round(avg(length(w)), 4) AS mean_word_len,
             sum(CASE WHEN regexp_matches(w, '[A-Za-zÀ-ÿ]') THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN w IN ('#','...','…') THEN 1 ELSE 0 END) AS ns
      FROM words GROUP BY doc_id
    ), ln AS (
      SELECT doc_id, count(*) AS nl,
             sum(CASE WHEN line LIKE '%...' OR line LIKE '%…' THEN 1 ELSE 0 END) AS ne
      FROM (SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                                              l -> length(l) > 0)) AS line
            FROM documents) GROUP BY doc_id
    )
    SELECT pw.doc_id, n_words, mean_word_len,
           round(na / CAST(n_words AS DOUBLE), 4) AS alpha_word_ratio,
           round(ns / CAST(n_words AS DOUBLE), 4) AS symbol_word_ratio,
           round(coalesce(ne, 0) / CAST(coalesce(nl, 1) AS DOUBLE), 4) AS ellipsis_line_ratio,
           n_words BETWEEN 50 AND 100000 AS ok_word_count,
           mean_word_len BETWEEN 3 AND 10 AS ok_mean_word_len,
           na / CAST(n_words AS DOUBLE) >= 0.8 AS ok_alpha_ratio,
           ns / CAST(n_words AS DOUBLE) <= 0.1 AS ok_symbol_ratio,
           coalesce(ne, 0) / CAST(coalesce(nl, 1) AS DOUBLE) <= 0.3 AS ok_ellipsis,
           (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
             AND na / CAST(n_words AS DOUBLE) >= 0.8
             AND ns / CAST(n_words AS DOUBLE) <= 0.1
             AND coalesce(ne, 0) / CAST(coalesce(nl, 1) AS DOUBLE) <= 0.3 AS gopher_ok
    FROM pw LEFT JOIN ln ON pw.doc_id = ln.doc_id
    """,
)
def q46_gopher_flags(spark, sf_dir):
    """Gopher-style quality rules (word-count window, mean word length,
    alpha/symbol ratios, ellipsis lines) — each inspectable + conjunction."""
    from .operators.textstats import gopher_quality_flags

    return gopher_quality_flags(_read(spark, sf_dir, "documents"))


@q(
    "q47_repetition",
    """
    WITH base AS (
      SELECT doc_id,
             text || chr(10) || 'Alpha Beta' || chr(10) || 'Alpha Beta' AS t
      FROM documents
    ), lines AS (
      SELECT doc_id, unnest(list_filter(string_split(t, chr(10)),
                                        l -> length(trim(l)) > 0)) AS line
      FROM base
    ), ls AS (
      SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS n_dup
      FROM (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line)
      GROUP BY doc_id
    ), toks AS (
      SELECT doc_id, list_filter(string_split(lower(t), ' '),
                                 w -> length(w) > 0) AS ws
      FROM base
    ), bgs AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
      FROM (SELECT doc_id, ws, unnest(range(1, greatest(len(ws), 1))) AS i
            FROM toks)
    ), bs AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top
      FROM (SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY doc_id, bg)
      GROUP BY doc_id
    )
    SELECT ls.doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           round(n_dup / CAST(n_lines AS DOUBLE), 4) AS dup_line_ratio,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(top / CAST(n_bigrams AS DOUBLE), 4) AS top_bigram_ratio
    FROM ls JOIN bs ON ls.doc_id = bs.doc_id
    """,
)
def q47_repetition(spark, sf_dir):
    """Duplicate-line and top-bigram repetition signals (C4/Gopher family);
    duplicate lines synthesized deterministically so the detector provably
    fires (dup_line_ratio = 1/3 per doc)."""
    from .operators.textstats import repetition_stats

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\nAlpha Beta\nAlpha Beta")
        ).alias("text"),
    )
    return repetition_stats(d)


@q(
    "q48_pdf_roundtrip",
    """
    SELECT doc_id, text || chr(10) || 'Page ' || doc_id AS pdf_text
    FROM documents
    """,
)
def q48_pdf_roundtrip(spark, sf_dir):
    """PDF parse (north_rule "PDF/layout parse"): deterministic PDFs built
    per doc (FlateDecode for odd ids), text re-extracted by the pure-python
    parser — round trip must equal the source text exactly."""
    from .operators.pdf import extract_pdf_pages, make_pdf_udf

    d = _read(spark, sf_dir, "documents")
    pdfs = d.select(
        "doc_id",
        make_pdf_udf(
            F.concat(F.col("text"), F.lit("\nPage "),
                     F.col("doc_id").cast("string")),
            (F.col("doc_id") % 2 == 1),
        ).alias("pdf"),
    )
    return extract_pdf_pages(pdfs).select("doc_id", "pdf_text")


@q(
    "q49_robots_delay",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 9.0
                ELSE CAST(doc_id % 7 AS DOUBLE) END AS crawl_delay
    FROM documents
    """,
)
def q49_robots_delay(spark, sf_dir):
    """robots.txt crawl-delay parse (config.py:31-47 semantics: specific
    UA group over '*' fallback). robots bodies synthesized: every domain
    sets '*' delay = doc_id%7; even ids add a specific 'tribeca' group with
    delay 9 — the engine, asked for UA 'tribeca', must prefer it."""
    from .sources.robots import crawl_delays

    d = _read(spark, sf_dir, "documents")
    txt = F.concat(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("User-agent: tribeca\nCrawl-delay: 9\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nCrawl-delay: "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\nDisallow: /private\n"),
    )
    return crawl_delays(
        d.select("doc_id", txt.alias("robots_txt")), user_agent="tribeca"
    ).select("doc_id", "crawl_delay")


@q(
    "q50_dedup_clusters",
    """
    SELECT doc_id, doc_id - doc_id % 4 AS rep,
           doc_id % 4 = 0 AS is_keeper
    FROM documents
    """,
)
def q50_dedup_clusters(spark, sf_dir):
    """Connected components over near-dup pairs → duplicate clusters with
    min-id representatives (iterative min-label propagation, all joins).
    Edge list synthesized as chains of 4 consecutive ids, so the expected
    labeling is closed-form."""
    from .operators.dedup import dedup_clusters

    d = _read(spark, sf_dir, "documents")
    nxt = d.select((F.col("doc_id") - 1).alias("doc_id"))
    pairs = (
        d.filter(F.col("doc_id") % 4 != 3)
        .join(nxt, "doc_id", "left_semi")  # (id, id+1) only when id+1 exists
        .select(
            F.col("doc_id").alias("a_id"),
            (F.col("doc_id") + 1).alias("b_id"),
        )
    )
    return dedup_clusters(pairs, d)


@q(
    "q45_ann_ivf",
    """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, v AS qv, cell FROM base WHERE vec_id < 10),
    probes AS (
      SELECT query_id, qv,
             unnest([cell, xor(cell, 1), xor(cell, 2),
                     xor(cell, 4), xor(cell, 8)]) AS cell
      FROM qs
    ),
    scored AS (
      SELECT p.query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(p.qv, b.v), 4) AS sim
      FROM base b JOIN probes p USING (cell) WHERE b.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 5
    """,
)
def q45_ann_ivf(spark, sf_dir):
    """IVF ANN, closed-form coarse quantizer (sign-bit grid cells,
    Hamming-1 multi-probe, exact cosine re-rank) — same search skeleton as
    the KMeans IVF (``ann_ivf_topk``), whose trained-quantizer path stays
    pinned by recall tests in tests/test_dedup_similarity.py (KMeans isn't
    DuckDB-expressible)."""
    from .operators.similarity import ann_ivf_grid_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ann_ivf_grid_topk(emb, range(10), k=5, bits=4, hamming=1).select(
        "query_id", "neighbor_id", "sim", "rank"
    )


# --- resumable pipeline (north_rule) — rows-only check (filesystem state
# and run wall-clock are not SQL-expressible; pytest covers exact semantics
# in tests/test_state_resume.py) ---------------------------------------------

@q(
    "q30_pipeline_run_metrics",
    """
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
             || '</title><meta name="description" content="' || source
             || ' document"></head><body>'
             || '<header>site header</header>'
             || '<nav><a href="https://nav.example.net/x">navlink</a></nav>'
             || '<h1>Heading ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
             || text || '</p>'
             || '<a href="/about/' || CAST(doc_id AS VARCHAR) || '">about</a>'
             || '<a href="https://ext' || CAST(doc_id % 5 AS VARCHAR)
             || '.example.org/page">ext</a>'
             || '<img src="/img/' || CAST(doc_id AS VARCHAR)
             || '.png" alt="img ' || CAST(doc_id AS VARCHAR) || '">'
             || '<footer>footer</footer></body></html>' AS html
      FROM documents
    )
    SELECT CAST(doc_id % 16 AS INT) AS bucket,
           count(*) AS n_docs,
           CAST(0 AS BIGINT) AS n_empty,
           CAST(sum(octet_length(encode(html))) AS BIGINT) AS bytes_in
    FROM pages GROUP BY 1
    """,
)
def q30_pipeline_run_metrics(spark, sf_dir):
    """Run the checkpointed extraction pipeline twice over synthesized pages
    (second run must be a no-op) and return per-url-hash-bucket lineage
    metrics (n_docs, n_empty, bytes_in). The bucket is a closed-form id
    bucket for this query so the oracle can state the exact per-bucket
    aggregates; production uses pmod(xxhash64(url), n_buckets). The
    per-partition wall_ms/url-range lineage table is asserted non-empty and
    stays covered by tests/test_plans.py."""
    import tempfile

    from .plans import state as st
    from .plans.pipeline import run_extraction

    docs = documents_as_pages(spark, sf_dir)
    bucket = F.regexp_extract("url", r"/docs/(\d+)$", 1).cast("long") % 16
    with tempfile.TemporaryDirectory() as root:
        run_extraction(spark, docs.drop("doc_id"), root, run_id="r1",
                       n_buckets=16, repartition_by_bucket=True,
                       bucket_expr=bucket)
        s2 = run_extraction(spark, docs.drop("doc_id"), root, run_id="r2",
                            n_buckets=16, repartition_by_bucket=True,
                            bucket_expr=bucket)
        assert s2["n_processed"] == 0, "resume must skip completed urls"
        assert st.read_metrics(spark, root).count() > 0, "lineage missing"
        m = (
            st.read_extracted(spark, root)
            .groupBy(F.col("bucket").cast("int").alias("bucket"))
            .agg(
                F.count("*").alias("n_docs"),
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.length("text") == 0) & (F.col("bytes_in") > 0),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("long").alias("n_empty"),
                F.sum("bytes_in").cast("long").alias("bytes_in"),
            )
        )
        m = m.cache()
        m.count()  # materialize before the tempdir vanishes
        return m


def _sql_quoted_stoplist(lang: str, profile: str = "nltk") -> str:
    """SQL-quoted stopword IN-list from the SAME vendored stopword data
    the engine broadcasts — the oracle states the full-list semantics, not
    a copy of engine code."""
    from .functions.stopwords import get_stopwords

    return ",".join(
        "'" + w.replace("'", "''") + "'"
        for w in sorted(get_stopwords(lang, profile))
    )


def _sql_stop_clause(cli_lang: str, profile: str = "nltk") -> str:
    """``AND NOT (lang = '<l>' AND word IN (...))`` filter for the oracle."""
    quoted = _sql_quoted_stoplist(cli_lang, profile)
    if not quoted:
        return ""
    return f"AND NOT (lang = '{cli_lang}' AND word IN ({quoted}))\n"


@q(
    "q51_corpus_tf_full_stopwords",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(trim(regexp_replace({_EXPECTED_TEXT},
                    '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' ')) AS word
      FROM documents
    ), words AS (
      SELECT word FROM toks
      WHERE length(word) >= 2
      {_sql_stop_clause('en')}{_sql_stop_clause('es')}{_sql_stop_clause('fr')}{_sql_stop_clause('de')}{_sql_stop_clause('zh')}
    )
    SELECT word, count(*) AS freq FROM words
    GROUP BY word ORDER BY freq DESC, word
    """,
)
def q51_corpus_tf_full_stopwords(spark, sf_dir):
    """Corpus TF through the extraction UDF with the ``nltk`` stopword
    profile (full vendored per-language NLTK corpus lists — the reference's
    corpora-present primary path, text_utils.py:75-96), exercising the
    profile threading end-to-end: parse → tokenize(profile) → explode →
    count. Languages without a list (zh) degrade to the reference's
    fallback-or-empty rule."""
    from .operators.extract import extract_token_strings

    docs = documents_as_pages(spark, sf_dir)
    t = extract_token_strings(docs, profile="nltk")
    words = t.select(
        F.explode(F.split("tokens_str", " ", -1)).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
    )


@q(
    "q52_legacy_tf",
    f"""
    WITH words AS (
      SELECT unnest(list_filter(
        string_split(lower(trim(regexp_replace(
          regexp_replace(text, '[^a-zA-Z\\s]', '', 'g'), '\\s+', ' ', 'g'
        ))), ' '),
        w -> length(w) > 2
             AND w NOT IN ({_sql_quoted_stoplist('english')}))) AS word
      FROM documents
    )
    SELECT word, count(*) AS freq FROM words
    GROUP BY word ORDER BY freq DESC, word
    """,
)
def q52_legacy_tf(spark, sf_dir):
    """Corpus TF under the LEGACY tokenizer profile (scripts/main.py:91-97:
    non-letters deleted in place so fragments join, len>2, english NLTK
    stopword list for every doc) — completes the SURVEY §2.5 tokenizer
    surface. Fully JVM-side: regexp chain + higher-order filter against an
    inline stopword array literal."""
    from .functions.stopwords import get_stopwords
    from .functions.tokenize import legacy_tokens_col

    stops = F.array(
        *[F.lit(w) for w in sorted(get_stopwords("english", "nltk"))]
    )
    d = _read(spark, sf_dir, "documents")
    words = d.select(
        F.explode(legacy_tokens_col(F.col("text"), stops)).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
    )


@q(
    "q53_av_metadata",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(44 + (100 + doc_id % 400) * 2 AS BIGINT)
                ELSE CAST(140 AS BIGINT) END AS n_bytes,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
           CASE WHEN doc_id % 2 = 0
                THEN CAST((100 + doc_id % 400) * 1000 // 8000 AS BIGINT)
                ELSE CAST(1000 + (doc_id * 3) % 5000 AS BIGINT)
           END AS duration_ms,
           CASE WHEN doc_id % 2 = 0 THEN CAST(8000 AS INT)
                ELSE CAST(NULL AS INT) END AS sample_rate,
           CASE WHEN doc_id % 2 = 0 THEN CAST(1 AS INT)
                ELSE CAST(NULL AS INT) END AS channels
    FROM documents
    """,
)
def q53_av_metadata(spark, sf_dir):
    """Audio/video metadata over REAL synthesized containers: even ids get
    a valid PCM WAV (mediax.make_wav — closed-form size 44 + n·2, exact
    duration from fmt/data chunks), odd ids a valid MP4 ftyp+mvhd skeleton
    (fixed 140 bytes, duration from the mvhd box). The engine must parse
    actual RIFF chunks / ISO-BMFF boxes to match the oracle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .mediax import make_mp4, make_wav
    from .operators.multimodal import av_metadata

    def _av_batch(doc_id):
        out = []
        for i in doc_id:
            i = int(i)
            if i % 2 == 0:
                out.append(make_wav(100 + i % 400, rate=8000, channels=1,
                                    seed=i))
            else:
                out.append(make_mp4(1000 + (i * 3) % 5000))
        return pd.Series(out)

    av_udf = pandas_udf(_av_batch, BinaryType())
    media = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        av_udf(F.col("doc_id")).alias("payload"),
    )
    return av_metadata(media)


@q(
    "q54_cdx_seed",
    """
    -- expected pending fetch list, stated closed-form: per url the LATEST
    -- valid (html, 200) capture wins — capture B (day 2) unless B is
    -- non-html (doc_id%5=0) or non-200 (doc_id%7=0), then capture A;
    -- urls already done (doc_id%3=0) are excluded
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 5 != 0 AND doc_id % 7 != 0
                THEN 'sha1:B' ELSE 'sha1:A' END
             || CAST(doc_id AS VARCHAR) AS digest,
           'crawl-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS filename,
           CAST(CASE WHEN doc_id % 5 != 0 AND doc_id % 7 != 0
                     THEN doc_id * 1000 + 500 ELSE doc_id * 1000 END
                AS BIGINT) AS "offset",
           CAST(500 + doc_id % 100 AS BIGINT) AS length
    FROM documents WHERE doc_id % 3 != 0
    """,
)
def q54_cdx_seed(spark, sf_dir):
    """Common-Crawl CDXJ index → pending fetch list: the engine builds raw
    CDXJ text lines (two captures per url; the newer one sometimes non-html
    or non-200), then must regex-split them, parse the JSON blobs, filter
    to (html, 200), keep the latest capture per url, and anti-join the done
    set — all native column ops (sources/cdx.py). The oracle states the
    final fetch list closed-form; only a correct parse+plan matches it."""
    from .sources.cdx import parse_cdxj, seed_fetch_list, split_cdxj

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), sid)
    surt = F.concat(F.lit("com,example)/docs/"), sid)

    def blob(ts_lit, digest_prefix, mime, status, offset):
        return F.concat(
            surt, F.lit(" "), F.lit(ts_lit), F.lit(' {"url": "'), url,
            F.lit('", "mime": "'), mime,
            F.lit('", "status": "'), status,
            F.lit('", "digest": "'), F.lit(digest_prefix), sid,
            F.lit('", "length": "'), (F.lit(500) + F.col("doc_id") % 100).cast("string"),
            F.lit('", "offset": "'), offset.cast("string"),
            F.lit('", "filename": "crawl-'), (F.col("doc_id") % 10).cast("string"),
            F.lit('.warc.gz"}'),
        )

    line_a = blob("20260101000000", "sha1:A", F.lit("text/html"),
                  F.lit("200"), F.col("doc_id") * 1000)
    line_b = blob(
        "20260102000000", "sha1:B",
        F.when(F.col("doc_id") % 5 == 0, "application/pdf").otherwise("text/html"),
        F.when(F.col("doc_id") % 7 == 0, "404").otherwise("200"),
        F.col("doc_id") * 1000 + 500,
    )
    lines = d.select(line_a.alias("value")).unionByName(
        d.select(line_b.alias("value"))
    )
    captures = parse_cdxj(split_cdxj(lines))
    done = d.filter(F.col("doc_id") % 3 == 0).select(url.alias("url"))
    return seed_fetch_list(captures, done).select(
        "url", "digest", "filename", "offset", "length"
    )


@q(
    "q55_embedding_near_dups_lsh",
    """
    WITH orig AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dups AS (
      SELECT vec_id + 10000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
      FROM orig WHERE vec_id < 50
    ),
    allv AS (SELECT * FROM orig UNION ALL SELECT * FROM dups),
    bk AS (
      SELECT vec_id, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
           + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
           + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
           + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END)
           + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM allv
    ),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_cosine_similarity(a.v, b.v), 4) AS sim
      FROM bk a JOIN bk b USING (bucket) WHERE a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, sim FROM pairs WHERE sim >= 0.99
    """,
)
def q55_embedding_near_dups_lsh(spark, sf_dir):
    """Embedding near-dup detection, SCALE path: sign-LSH bucket equi-join
    candidates → exact cosine verify (no bounded side, no cross join) —
    the composition q24's verifier is meant to sit behind at 10^12 rows.
    Same synthesized near-duplicates as q24; the LSH path must find them
    all (scaled vectors keep their sign pattern → same bucket)."""
    from .operators.similarity import embedding_near_dup_pairs_lsh

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dups = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    allv = emb.unionByName(dups)
    return embedding_near_dup_pairs_lsh(allv, threshold=0.99, bits=8)


@q(
    "q56_paragraph_dedup",
    """
    WITH base AS (
      SELECT doc_id,
             text || chr(10) || 'Shared boilerplate paragraph'
                  || chr(10) || 'Unique ' || CAST(doc_id AS VARCHAR) AS t
      FROM documents
    ), paras AS (
      SELECT doc_id, i AS pos, ps[i] AS para
      FROM (SELECT doc_id, string_split(t, chr(10)) AS ps,
                   unnest(range(1, len(string_split(t, chr(10))) + 1)) AS i
            FROM base)
      WHERE length(trim(ps[i])) > 0
    ), pc AS (
      SELECT para, count(DISTINCT doc_id) AS nd FROM paras GROUP BY para
    ), marked AS (
      SELECT p.doc_id, p.pos, p.para, (pc.nd > 1) AS dup
      FROM paras p JOIN pc USING (para)
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN NOT dup THEN para END,
                               chr(10) ORDER BY pos), '') AS kept_text,
           count(*) AS n_paras,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM marked GROUP BY doc_id
    """,
)
def q56_paragraph_dedup(spark, sf_dir):
    """C4-style corpus-wide paragraph dedup: a boilerplate paragraph is
    appended to EVERY doc (so it provably occurs in >1 doc and is dropped
    everywhere) plus a per-doc unique paragraph (provably kept). Keys, not
    paragraph texts, cross the shuffle; reassembly is position-sorted."""
    from .operators.dedup import paragraph_dedup

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\nShared boilerplate paragraph\nUnique "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return paragraph_dedup(d)


@q(
    "q57_decontaminate",
    """
    WITH corpus AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS t
      FROM documents
    ), bench AS (SELECT * FROM corpus WHERE doc_id % 100 = 3),
    cg AS (
      SELECT DISTINCT doc_id AS corpus_id,
             array_to_string(t[i:i+12], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 11)) AS i
            FROM corpus WHERE len(t) >= 13)
    ), bg AS (
      SELECT DISTINCT doc_id AS benchmark_id,
             array_to_string(t[i:i+12], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 11)) AS i
            FROM bench WHERE len(t) >= 13)
    )
    SELECT corpus_id, benchmark_id, count(*) AS n_shared
    FROM cg JOIN bg USING (g)
    GROUP BY corpus_id, benchmark_id
    """,
)
def q57_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the public 13-gram rule): flag corpus
    docs sharing any word 13-gram with an eval set — here the eval set is
    a slice of the corpus itself (doc_id%100=3), simulating leakage, so
    at minimum every leaked doc flags itself. Equi-join on gram hashes;
    benchmark side broadcasts; docs under 13 tokens have no grams."""
    from .operators.dedup import decontaminate

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(
                F.split("text", " "), lambda w: F.length(w) > 0
            ),
        ).alias("tokens_str"),
    )
    bench = d.filter(F.col("doc_id") % 100 == 3)
    return decontaminate(d, bench, n=13)


@q(
    "q58_robots_rules",
    """
    -- effective Disallow prefixes for UA 'tribeca': the specific group
    -- (even ids) REPLACES '*' per robots group semantics; odd ids fall
    -- back to the '*' group. Sitemap directives surface for all ids.
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0
                THEN '/secret/' || CAST(doc_id AS VARCHAR)
                ELSE '/private/' || CAST(doc_id AS VARCHAR) END AS path_prefix,
           'https://s' || CAST(doc_id % 4 AS VARCHAR)
             || '.example.com/sitemap.xml' AS sitemap_url
    FROM documents
    """,
)
def q58_robots_rules(spark, sf_dir):
    """robots.txt Disallow-rule + Sitemap-directive extraction (stdlib
    RobotFileParser group semantics — a specific UA group replaces '*',
    it does not merge). Bodies synthesized: '*' disallows /private/{id};
    even ids add a 'tribeca' group disallowing /secret/{id}; every body
    carries a Sitemap: directive. Asked for UA 'tribeca', even ids must
    yield the specific group's rule only."""
    from .sources.robots import disallow_rules, sitemaps_from_robots

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    txt = F.concat(
        F.lit("Sitemap: https://s"), (F.col("doc_id") % 4).cast("string"),
        F.lit(".example.com/sitemap.xml\n"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("User-agent: tribeca\nDisallow: /secret/"), sid,
                     F.lit("\n\n")),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/"), sid, F.lit("\n"),
    )
    robots = d.select("doc_id", txt.alias("robots_txt"))
    rules = disallow_rules(robots, user_agent="tribeca")
    maps = sitemaps_from_robots(robots)
    return rules.join(maps, "doc_id").select(
        "doc_id", "path_prefix", "sitemap_url"
    )


@q(
    "q59_politeness_schedule",
    """
    WITH f AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) AS url,
             source || '.example.com' AS domain,
             CAST(length(source) % 5 AS DOUBLE) AS crawl_delay
      FROM documents
    )
    SELECT url, domain, fetch_rank,
           CAST((fetch_rank - 1) * crawl_delay AS DOUBLE)
             AS scheduled_offset_sec
    FROM (
      SELECT url, domain, crawl_delay,
             CAST(row_number() OVER (PARTITION BY domain ORDER BY url)
                  AS INT) AS fetch_rank
      FROM f
    )
    """,
)
def q59_politeness_schedule(spark, sf_dir):
    """Distributed politeness: each domain's pending urls get slot
    (rank−1)×crawl_delay so concurrent executors never exceed one request
    per delay interval per domain (the dataflow form of the reference's
    sequential sleep, crawler.py:142). Window over the pending set +
    broadcast delay dim."""
    from .plans.frontier import schedule_fetches

    d = _read(spark, sf_dir, "documents")
    frontier = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    delays = d.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain"),
        (F.length("source") % 5).cast("double").alias("crawl_delay"),
    ).distinct()
    return schedule_fetches(frontier, delays).select(
        "url", "domain",
        F.col("fetch_rank").cast("int").alias("fetch_rank"),
        "scheduled_offset_sec",
    )


@q(
    "q60_asof_join",
    """
    SELECT e.event_id, e.user_id,
           m.event_id AS last_signup_id,
           CAST(floor(epoch(e.ts)) - floor(epoch(m.ts)) AS BIGINT)
             AS secs_since_signup
    FROM events e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') m
      ON e.user_id = m.user_id AND e.ts >= m.ts
    """,
)
def q60_asof_join(spark, sf_dir):
    """As-of join (SURVEY §2.4 join-surface gap): every event gets the
    most recent signup at-or-before it per user. Implemented the scalable
    way — NOT a range join: union the two streams, one window per user
    ordered by (ts, is-mark-first), ``last(mark, ignorenulls)`` carries
    the latest mark forward. One shuffle on user_id, zero row inflation —
    the shape that survives 10^12 events. Oracle: DuckDB's native ASOF
    JOIN."""
    e = _read(spark, sf_dir, "events")
    marks = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("mark_id"),
        F.col("ts").alias("mark_ts"),
    )
    evs = e.select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("mark_id"),
        F.lit(None).cast("timestamp").alias("mark_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = marks.unionByName(evs).select(
        "user_id", "ts", "event_id", "kind",
        F.last("mark_id", ignorenulls=True).over(w).alias("last_signup_id"),
        F.last("mark_ts", ignorenulls=True).over(w).alias("_mts"),
    )
    return tagged.filter(F.col("kind") == 1).select(
        "event_id", "user_id", "last_signup_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp("_mts")
        ).alias("secs_since_signup"),
    )


@q(
    "q61_set_ops",
    _TOKENS_CTE
    + """
    SELECT 'both' AS which, word FROM (
      SELECT DISTINCT word FROM words WHERE lang = 'en'
      INTERSECT
      SELECT DISTINCT word FROM words WHERE lang = 'de'
    )
    UNION ALL
    SELECT 'en_only', word FROM (
      SELECT DISTINCT word FROM words WHERE lang = 'en'
      EXCEPT
      SELECT DISTINCT word FROM words WHERE lang = 'de'
    )
    ORDER BY which, word
    """,
)
def q61_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT surface (SURVEY §2.4 set-op gap): vocabulary
    shared by the en and de sub-corpora, and en-exclusive vocabulary."""
    words = _tokens_df(spark, sf_dir).select(
        "lang", F.explode("tokens").alias("word")
    )
    en = words.filter(F.col("lang") == "en").select("word").distinct()
    de = words.filter(F.col("lang") == "de").select("word").distinct()
    both = en.intersect(de).select(F.lit("both").alias("which"), "word")
    only = en.subtract(de).select(F.lit("en_only").alias("which"), "word")
    return both.unionByName(only).orderBy("which", "word")


@q(
    "q62_interval_join",
    """
    WITH w AS (
      SELECT event_id AS signup_id, user_id, ts AS start_ts,
             ts + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE event_type = 'signup'
    )
    SELECT w.signup_id, count(e.event_id) AS n_events_2h
    FROM w LEFT JOIN events e
      ON e.user_id = w.user_id
     AND e.ts >= w.start_ts AND e.ts < w.end_ts
    GROUP BY w.signup_id
    """,
)
def q62_interval_join(spark, sf_dir):
    """Range/interval join (SURVEY §2.4 join-surface gap): events within
    2 h of each signup, per user — via the bucketed equi-join rewrite
    (operators/joins.py), never Catalyst's nested-loop plan for theta
    joins. Windows with zero matches are impossible here (a signup falls
    in its own window), so the inner bucket join suffices for the count."""
    from .operators.joins import bucketed_interval_join

    e = _read(spark, sf_dir, "events")
    w = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    joined = bucketed_interval_join(
        e.select("user_id", "ts", "event_id"), w, keys=["user_id"],
        bucket_secs=3600,
    )
    return joined.groupBy("signup_id").agg(
        F.count("event_id").alias("n_events_2h")
    )


@q(
    "q63_token_cube",
    _TOKENS_CTE
    + """
    SELECT coalesce(source, '(all)') AS source, coalesce(lang, '(all)') AS lang,
           count(*) AS n_tokens
    FROM words GROUP BY CUBE(source, lang)
    """,
)
def q63_token_cube(spark, sf_dir):
    """source×lang token CUBE — all four grouping sets (completes the
    §2.4 grouping-sets surface next to q38's ROLLUP). NULL subtotal keys
    coalesced so the cross-engine hash sees no NULL-ordering issues."""
    words = _tokens_df(spark, sf_dir).select(
        "source", "lang", F.explode("tokens").alias("word")
    )
    return (
        words.cube("source", "lang")
        .agg(F.count("*").alias("n_tokens"))
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            "n_tokens",
        )
    )


@q(
    "q64_warc_roundtrip",
    """
    SELECT doc_id,
           'https://w.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600 AS BIGINT) AS ts_epoch,
           '<html><body><p>café ' || CAST(doc_id AS VARCHAR)
             || '</p></body></html>' AS html_text
    FROM documents
    """,
)
def q64_warc_roundtrip(spark, sf_dir):
    """WARC record round trip (S1-equivalent data layer, driver-checked):
    a valid WARC/1.0 response record is built per doc — gzipped for odd
    ids, charset latin-1 for ids ≡ 1 (mod 2) — then parsed back by the
    engine's WARC parser (header walk, HTTP split, charset detection,
    utf-8 transcoding). The 'café' byte differs between latin-1 (0xE9)
    and utf-8 — skipping the transcode would corrupt it, so the oracle
    only matches a correct parse."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .sources.warc import make_warc, parse_warc

    out_t = StructType(
        [
            StructField("url", StringType()),
            StructField("ts_epoch", LongType()),
            StructField("html_text", StringType()),
        ]
    )

    def _rt(doc_id):
        urls, eps, texts = [], [], []
        for i in doc_id:
            i = int(i)
            url = f"https://w.example.com/docs/{i}"
            html = f"<html><body><p>café {i}</p></body></html>"
            charset = "latin-1" if i % 2 else "utf-8"
            blob = make_warc([(url, html, charset)], gzip_file=bool(i % 2),
                             ts="2026-01-01T00:00:00Z")
            recs = parse_warc(blob)
            (r,) = recs
            payload = r["html"]
            if r["charset"] not in ("utf-8", "utf8", "ascii", "us-ascii"):
                payload = payload.decode(r["charset"], "replace").encode()
            urls.append(r["url"])
            # WARC-Date is UTC by spec; the parsed datetime is naive, so
            # pin UTC before .timestamp() (host-TZ independence)
            eps.append(int(r["warc_ts"].replace(tzinfo=_utc).timestamp()))
            texts.append(payload.decode("utf-8"))
        return pd.DataFrame({"url": urls, "ts_epoch": eps,
                             "html_text": texts})

    udf = pandas_udf(_rt, out_t)
    d = _read(spark, sf_dir, "documents")
    e = d.withColumn("_r", udf(F.col("doc_id")))
    return e.select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.ts_epoch").alias("ts_epoch"),
        F.col("_r.html_text").alias("html_text"),
    )


@q(
    "q65_streaming_extract",
    f"""
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           {_EXPECTED_TEXT} AS text,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           sha256({_EXPECTED_TEXT}) AS page_hash
    FROM documents
    """,
)
def q65_streaming_extract(spark, sf_dir):
    """Structured Streaming extraction, driver-checked: the synthesized
    pages flow through readStream → extraction UDF → checkpointed parquet
    sink under Trigger.AvailableNow (bounded drain; the same code runs
    unbounded), and the sink's contents must equal the batch extractor's
    closed-form output — streaming and batch share one extraction core."""
    import tempfile

    from .streaming.stream_extract import stream_extract

    docs = documents_as_pages(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        docs.write.mode("overwrite").parquet(f"{root}/src")
        qry = stream_extract(spark, f"{root}/src", f"{root}/out",
                             f"{root}/ckpt", available_now=True)
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("streaming extraction drain exceeded 300s")
        out = spark.read.parquet(f"{root}/out").select(
            "url", "text", "title", "page_hash"
        )
        out = out.cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q66_reconcile_lost_outputs",
    """
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url
    FROM documents WHERE doc_id % 16 = 0
    """,
)
def q66_reconcile_lost_outputs(spark, sf_dir):
    """Crash-recovery reconcile, driver-checked (reference storage.py:
    120-150 semantics; R12 was pytest-only in round 1): run the pipeline,
    DELETE one url-hash bucket's output files (simulating a lost/corrupt
    partition), reconcile — the done-but-missing urls must be re-pended,
    and the pending set must be exactly that bucket's urls."""
    import shutil
    import tempfile

    from .plans import state as st
    from .plans.pipeline import run_extraction

    docs = documents_as_pages(spark, sf_dir)
    bucket = F.regexp_extract("url", r"/docs/(\d+)$", 1).cast("long") % 16
    with tempfile.TemporaryDirectory() as root:
        run_extraction(spark, docs.drop("doc_id"), root, run_id="r1",
                       n_buckets=16, repartition_by_bucket=True,
                       bucket_expr=bucket)
        shutil.rmtree(f"{root}/extracted/bucket=0")
        st.reconcile(spark, root)
        pend = st.pending(docs.drop("doc_id"), spark, root).select("url")
        pend = pend.cache()
        pend.count()  # materialize before the tempdir vanishes
        return pend


@q(
    "q67_streaming_first_seen",
    """
    SELECT 'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) AS url,
           CAST(1767225600 + doc_id % 3600 AS BIGINT) AS first_epoch,
           CAST(1 AS BIGINT) AS n_batch_dups
    FROM documents
    """,
)
def q67_streaming_first_seen(spark, sf_dir):
    """Custom stateful streaming operator, driver-checked
    (applyInPandasWithState first-seen dedup; pytest-only in round 1):
    every url is streamed TWICE with different timestamps (later one
    first in file order), drained under Trigger.AvailableNow into a
    checkpointed sink — exactly one row per url must come out, carrying
    the MIN warc_ts and the duplicate count."""
    import tempfile

    from .streaming.stateful import dedup_first_seen
    from .streaming.stream_extract import read_docs_stream

    d = _read(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    # timestamps built FROM the epoch literal the oracle states —
    # session-timezone independent (a to_timestamp string literal would
    # shift under a non-UTC harness session)
    early = F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id") % 3600)
    late = F.timestamp_seconds(
        F.lit(1767225600) + F.col("doc_id") % 3600 + 7200
    )

    def docs_with(ts):
        return d.select(
            url.alias("url"),
            ts.alias("warc_ts"),
            F.encode(F.lit("<html></html>"), "UTF-8").alias("html"),
            F.lit("").alias("text"),
            F.col("lang"),
        )

    with tempfile.TemporaryDirectory() as root:
        # late copy written first — arrival order within the batch must
        # not matter. coalesce(1): ONE source file ⇒ the file source
        # admits everything in a single micro-batch, which is the scope
        # of the operator's min/dup-count guarantee (see stateful.py —
        # across batches, first-arriving wins; append sinks can't retract)
        docs_with(late).unionByName(docs_with(early)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/src")
        stream = dedup_first_seen(read_docs_stream(spark, f"{root}/src"))
        qry = (
            stream.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("stateful dedup drain exceeded 300s")
        out = spark.read.parquet(f"{root}/out").select(
            "url",
            F.unix_timestamp("first_ts").alias("first_epoch"),
            "n_batch_dups",
        )
        out = out.cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q68_wet_roundtrip",
    """
    SELECT doc_id,
           'https://w.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url,
           text AS wet_text
    FROM documents
    """,
)
def q68_wet_roundtrip(spark, sf_dir):
    """WET (Common Crawl extracted-text) record round trip: a conversion
    record is built per doc from its text — gzipped for odd ids — and
    parsed back by the engine's WET parser. The documents text contains
    multi-byte UTF-8 (zh/de rows), so a byte-length/charset mistake in the
    record framing breaks the content-length walk and the oracle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
    )

    from .sources.warc import make_wet, parse_wet

    out_t = StructType(
        [
            StructField("url", StringType()),
            StructField("wet_text", StringType()),
        ]
    )

    def _rt(doc_id, text):
        urls, texts = [], []
        for i, t in zip(doc_id, text):
            i = int(i)
            url = f"https://w.example.com/docs/{i}"
            blob = make_wet([(url, t)], gzip_file=bool(i % 2))
            (r,) = parse_wet(blob)
            urls.append(r["url"])
            texts.append(r["text"])
        return pd.DataFrame({"url": urls, "wet_text": texts})

    udf = pandas_udf(_rt, out_t)
    d = _read(spark, sf_dir, "documents")
    e = d.withColumn("_r", udf(F.col("doc_id"), F.col("text")))
    return e.select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.wet_text").alias("wet_text"),
    )


@q(
    "q69_robots_url_filter",
    """
    -- urls surviving the per-UA Disallow rules: ONE robots.txt per
    -- domain. Every domain's '*' group disallows /private/; domains with
    -- even-length source names add a specific 'tribeca' group disallowing
    -- only /secret/ (which REPLACES '*' for our UA and never matches
    -- these urls). Url path is /private/<id> for id % 3 = 0, else
    -- /docs/<id> — so blocked = multiples of 3 on odd-length domains.
    SELECT doc_id,
           'https://' || source || '.example.com'
             || CASE WHEN doc_id % 3 = 0
                     THEN '/private/' || CAST(doc_id AS VARCHAR)
                     ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS url
    FROM documents
    WHERE NOT (doc_id % 3 = 0 AND length(source) % 2 = 1)
    """,
)
def q69_robots_url_filter(spark, sf_dir):
    """Frontier politeness filter: urls anti-joined against the effective
    Disallow prefixes for the crawler's UA (sources/robots.disallow_rules).
    ONE robots body per DOMAIN (the real data shape — the rules dim is
    |domains|-sized and broadcasts; the frontier join stays linear), then
    path-startswith, then anti-join back. Even-length domains' specific
    'tribeca' group (/secret/) replaces '*' and never matches; odd-length
    domains' '*' group (/private/) blocks exactly the id%3==0 urls."""
    from .sources.robots import disallow_rules

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    domain = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("/private/"), sid)
    ).otherwise(F.concat(F.lit("/docs/"), sid))
    frontier = d.select(
        "doc_id",
        domain.alias("domain"),
        F.concat(F.lit("https://"), domain, path).alias("url"),
        path.alias("path"),
    )
    txt = F.concat(
        F.when(
            F.length("source") % 2 == 0,
            F.lit("User-agent: tribeca\nDisallow: /secret/\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/\n"),
    )
    robots = d.select(
        domain.alias("domain"), txt.alias("robots_txt")
    ).dropDuplicates(["domain"])
    rules = disallow_rules(robots, user_agent="tribeca")
    blocked = (
        frontier.join(F.broadcast(rules), "domain")
        .filter(F.col("path").startswith(F.col("path_prefix")))
        .select("url")
        .distinct()
    )
    return frontier.join(blocked, "url", "left_anti").select("doc_id", "url")


def documents_as_seo_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → pages whose <head> carries the full SEO extension tag
    set (canonical, og:*, robots, twitter:*, hreflang alternates) with
    closed-form values, so a SQL oracle can state every extracted field.
    Separate from :func:`documents_as_pages` to leave the q01/q02 golden
    byte-contracts untouched."""
    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"), sid
    )
    robots_val = F.when(
        F.col("doc_id") % 2 == 0, F.lit("index,follow")
    ).otherwise(F.lit("noindex"))
    html = F.concat(
        F.lit("<html><head><title>Doc "), sid, F.lit("</title>"),
        F.lit('<link rel="canonical" href="'), url, F.lit('">'),
        F.lit('<meta property="og:title" content="OG Doc '), sid,
        F.lit('"><meta property="og:description" content="'),
        F.col("source"), F.lit(' og">'),
        F.lit('<meta property="og:image" content="https://img.example.com/og/'),
        sid, F.lit('.png">'),
        F.lit('<meta name="robots" content="'), robots_val, F.lit('">'),
        F.lit('<meta name="twitter:title" content="TW Doc '), sid,
        F.lit('">'),
        F.lit('<link rel="alternate" hreflang="en" href="'), url,
        F.lit('?hl=en">'),
        F.lit('<link rel="alternate" hreflang="pt-br" href="'), url,
        F.lit('?hl=pt">'),
        # decoys the extractor must ignore: rss alternate (no hreflang),
        # second canonical (first wins), second og:title (first wins)
        F.lit('<link rel="alternate" type="application/rss+xml" href="/f">'),
        F.lit('<link rel="canonical" href="https://wrong.example.com/">'),
        F.lit('<meta property="og:title" content="IGNORED">'),
        F.lit("</head><body><p>"), F.col("text"), F.lit("</p></body></html>"),
    )
    return d.select(
        F.col("doc_id"),
        url.alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )


@q(
    "q70_seo_extended",
    """
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || doc_id
             AS canonical,
           'OG Doc ' || doc_id AS og_title,
           source || ' og' AS og_description,
           'https://img.example.com/og/' || doc_id || '.png' AS og_image,
           CASE WHEN doc_id % 2 = 0 THEN 'index,follow' ELSE 'noindex' END
             AS meta_robots,
           'TW Doc ' || doc_id AS twitter_title,
           2 AS n_hreflang,
           'en' AS hreflang_first,
           'https://' || source || '.example.com/docs/' || doc_id ||
             '?hl=pt' AS hreflang_last_href
    FROM documents
    """,
)
def q70_seo_extended(spark, sf_dir):
    """SEO extension extraction (canonical / og:* / meta robots /
    twitter:* / hreflang): the reference's project-JSON template ships
    these keys but never computes them
    (docs/examples/project_DOMAIN_template.json:17-60); here they come out
    of the same single-pass tag walk as title/meta, first-occurrence-wins,
    with decoy tags proving the selection rules."""
    docs = documents_as_seo_pages(spark, sf_dir)
    ex = extract_pages(docs, tokens=False)
    return ex.select(
        F.regexp_extract("url", r"/docs/(\d+)$", 1).cast("bigint")
        .alias("doc_id"),
        F.col("seo.canonical").alias("canonical"),
        F.col("seo.og_title").alias("og_title"),
        F.col("seo.og_description").alias("og_description"),
        F.col("seo.og_image").alias("og_image"),
        F.col("seo.meta_robots").alias("meta_robots"),
        F.col("seo.twitter_title").alias("twitter_title"),
        F.size("seo.hreflang").alias("n_hreflang"),
        F.col("seo.hreflang")[0]["hreflang"].alias("hreflang_first"),
        F.element_at(F.col("seo.hreflang"), -1)["href"]
        .alias("hreflang_last_href"),
    )


# --- LLM-pipeline extensions: PII redaction + DSIR selection ----------------

from .operators.redact import (  # noqa: E402 — grouped with their queries
    EMAIL_RE,
    EMAIL_TOKEN,
    IPV4_RE,
    IPV4_TOKEN,
    PHONE_RE,
    PHONE_TOKEN,
    redact_pii,
)


@q(
    "q71_pii_redaction",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' Contact user' || doc_id || '@mail.example.com or 10.'
                  || (doc_id % 256) || '.0.1 or call 415-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
               AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
             '{IPV4_RE}', '{IPV4_TOKEN}', 'g'),
             '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS redacted_text,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT)
             AS n_phones
    FROM aug
    """,
)
def q71_pii_redaction(spark, sf_dir):
    """PII redaction (operators/redact.py): deterministic email/IP/phone
    strings are spliced into every document, then masked + counted with
    Java-regex/RE2-portable patterns. Shuffle-free narrow transform —
    the oracle replays the identical construction and replacement chain."""
    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" Contact user"), sid,
            F.lit("@mail.example.com or 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 or call 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("."),
        ).alias("text"),
    )
    out = redact_pii(aug)
    return out.select(
        "doc_id",
        "redacted_text",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_ips").cast("long").alias("n_ips"),
        F.col("n_phones").cast("long").alias("n_phones"),
    )


@q(
    "q72_dsir_importance",
    """
    WITH words AS (
      SELECT doc_id, lang = 'en' AS is_t,
             unnest(list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS w
      FROM documents
    ),
    pdb AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS b,
             count(*) AS cnt
      FROM words GROUP BY doc_id, is_t, b
    ),
    bt AS (
      SELECT b, CAST(sum(cnt) AS BIGINT) AS r_cnt,
             CAST(sum(CASE WHEN is_t THEN cnt ELSE 0 END) AS BIGINT)
               AS t_cnt
      FROM pdb GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(r_cnt) AS BIGINT) AS R_, CAST(sum(t_cnt) AS BIGINT)
               AS T_
      FROM bt
    ),
    wts AS (
      SELECT b, CAST(floor(1e6 * (ln(t_cnt + 1) - ln(T_ + 1024)
                                  - ln(r_cnt + 1) + ln(R_ + 1024)))
                     AS BIGINT) AS w_micros
      FROM bt, tot
    )
    SELECT pdb.doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(sum(cnt * w_micros) AS BIGINT) AS dsir_score_micros
    FROM pdb JOIN wts USING (b)
    GROUP BY pdb.doc_id
    """,
)
def q72_dsir_importance(spark, sf_dir):
    """DSIR importance scoring (operators/dsir.py; Xie et al. 2023):
    hashed-unigram log-likelihood ratio of the lang='en' target slice vs
    the whole corpus, per-bucket weights quantized to integer micros so
    the per-doc sum is aggregation-order-independent and the DuckDB
    oracle matches bit-for-bit."""
    from .operators.dsir import dsir_importance

    docs = _read(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en", n_buckets=1024)


# q73's oracle, as a constant so q84's CCNet bucket oracle can reuse it
# as a subquery without drift.
_Q73_SQL = """
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t,
             list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    big AS (
      SELECT doc_id, is_t, l[i] AS w1, l[i + 1] AS w2
      FROM (SELECT doc_id, is_t, l, unnest(range(1, len(l))) AS i
            FROM toks)
    ),
    uni AS (SELECT doc_id, is_t, unnest(l) AS w FROM toks),
    c1 AS (
      SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1
      FROM uni WHERE is_t GROUP BY w
    ),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM big WHERE is_t GROUP BY w1, w2
    ),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz
          FROM uni WHERE is_t)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CAST(floor(1e6 * (ln(coalesce(c12, 0) + 1)
                                      - ln(coalesce(c1, 0) + vsz)))
                         AS BIGINT)) AS BIGINT) AS lm_logprob_micros
    FROM big b
    LEFT JOIN c12 USING (w1, w2)
    LEFT JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY b.doc_id
    """


@q("q73_bigram_lm_score", _Q73_SQL)
def q73_bigram_lm_score(spark, sf_dir):
    """CCNet-style LM quality scoring (operators/lm.py; Wenzek et al.
    2020): Laplace-smoothed bigram LM fit on the lang='en' slice scores
    every document's total log-probability; per-bigram log-probs are
    micro-quantized so the sum is order-independent and oracle-exact."""
    from .operators.lm import bigram_lm_score

    docs = _read(spark, sf_dir, "documents")
    return bigram_lm_score(docs, F.col("lang") == "en")


@q(
    "q74_mixture_sample",
    """
    WITH rates AS (
      SELECT source,
             CAST(200000 + ('0x' || substr(md5(source), 1, 8))::BIGINT
                           % 600000 AS BIGINT) AS rate_micros
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.doc_id, d.source, r.rate_micros,
           CAST(1000000.0 AS DOUBLE) / r.rate_micros AS sample_weight
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 1000000 < r.rate_micros
    """,
)
def q74_mixture_sample(spark, sf_dir):
    """Deterministic training-mix sampling (operators/mixing.py):
    per-source keep-rates (themselves hash-derived here so the oracle can
    state them) select documents via md5-bucket < rate — reproducible
    membership with inverse-probability weights, no RNG state."""
    from .operators.mixing import mixture_sample

    docs = _read(spark, sf_dir, "documents")
    rates = docs.select("source").distinct().select(
        "source",
        (
            F.lit(200000)
            + F.conv(F.substring(F.md5("source"), 1, 8), 16, 10)
            .cast("long")
            % 600000
        ).alias("rate_micros"),
    )
    return mixture_sample(docs, rates).select(
        "doc_id", "source", "rate_micros", "sample_weight"
    )


# --- LLM-pipeline extensions (round 3 cont.): retention, budgets, ---------
# --- classifier scoring, normalization, domain rollup, url hygiene ---------


@q(
    "q75_dedup_keep_best",
    """
    WITH d AS (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               AS cluster_key,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT cluster_key, keeper_doc_id, n_chars, cluster_size FROM (
      SELECT cluster_key, doc_id AS keeper_doc_id, n_chars,
             CAST(count(*) OVER (PARTITION BY cluster_key) AS BIGINT)
               AS cluster_size,
             row_number() OVER (
               PARTITION BY cluster_key ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM d
    ) WHERE rk = 1
    """,
)
def q75_dedup_keep_best(spark, sf_dir):
    """Duplicate-cluster retention (operators/dedup.py keep_best): cluster
    on the case/punctuation-insensitive content key, keep the longest copy
    (lowest doc_id on ties). groupBy+max(struct) — map-side combine, so a
    10^6-copy boilerplate cluster reduces before the shuffle; the oracle
    states the same argmax with a window."""
    from .operators.dedup import keep_best

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), "[^a-z]", "")).alias(
            "cluster_key"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )
    return keep_best(d, "cluster_key", "doc_id", "n_chars")


_Q76_TOKENS = (
    "list_filter(string_split(trim(regexp_replace("
    "text, '[^A-Za-zÀ-ÿ]+', ' ', 'g')), ' '), w -> length(w) > 0)"
)


@q(
    "q76_token_budget",
    f"""
    WITH dt AS (
      SELECT source,
             CAST(sum(len({_Q76_TOKENS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source,
             CAST(100000 + ('0x' || substr(md5(source), 1, 8))::BIGINT
                           % 900000 AS BIGINT) AS weight_micros
      FROM dt
    ),
    j AS (
      SELECT dt.source, n_tokens, weight_micros FROM dt JOIN w USING (source)
    ),
    tot AS (SELECT CAST(sum(weight_micros) AS BIGINT) AS w_total FROM j),
    r1 AS (
      SELECT source, n_tokens, weight_micros,
             (15000 * weight_micros) // w_total AS desired1
      FROM j, tot
    ),
    pool AS (
      SELECT CAST(coalesce(sum(CASE WHEN desired1 >= n_tokens
                                    THEN desired1 - n_tokens END), 0)
                  AS BIGINT) AS surplus,
             CAST(coalesce(sum(CASE WHEN desired1 < n_tokens
                                    THEN weight_micros END), 0)
                  AS BIGINT) AS w_uncapped
      FROM r1
    ),
    r2 AS (
      SELECT source, n_tokens,
             CASE WHEN desired1 >= n_tokens THEN desired1
                  ELSE desired1 + CASE WHEN w_uncapped > 0
                       THEN (surplus * weight_micros) // w_uncapped
                       ELSE 0 END
             END AS desired_tokens
      FROM r1, pool
    )
    SELECT source, n_tokens, desired_tokens,
           least(desired_tokens, n_tokens) AS kept_tokens,
           CASE WHEN n_tokens > 0
                THEN (1000000 * least(desired_tokens, n_tokens)) // n_tokens
                ELSE 0 END AS rate_micros
    FROM r2
    """,
)
def q76_token_budget(spark, sf_dir):
    """Token-budget mixture allocation (operators/mixing.py
    token_budget_rates): per-source keep-rates for a 15k-token budget
    under hash-derived mixture weights, one water-filling redistribution
    round for sources too small to fill their share. All integer
    floor-div micros — engine-exact; totals broadcast in-dataflow."""
    from .operators.mixing import token_budget_rates

    docs = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.regexp_replace("text", "[^A-Za-zÀ-ÿ]+", " ")),
                " ", -1),
        lambda w: F.length(w) > 0,
    )
    dt = docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("n_tokens")
    )
    w = dt.select(
        "source",
        (
            F.lit(100000)
            + F.conv(F.substring(F.md5("source"), 1, 8), 16, 10)
            .cast("long") % 900000
        ).alias("weight_micros"),
    )
    return token_budget_rates(dt, w, budget=15000)


@q(
    "q77_hashed_classifier",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    sc AS (
      SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(coalesce(list_sum(list_transform(l, w ->
               (((('0x' || substr(md5(w), 1, 8))::BIGINT % 1048576)
                 * 2654435761) % 2000001) - 1000000)), 0) AS BIGINT)
               AS score_micros
      FROM toks
    )
    SELECT doc_id, n_tokens, score_micros,
           CASE WHEN n_tokens > 0
                THEN round(score_micros / 1e6 / n_tokens, 6) END
             AS mean_weight,
           CASE WHEN n_tokens > 0
                THEN round(CAST(1.0 AS DOUBLE)
                           / (CAST(1.0 AS DOUBLE)
                              + exp(-(score_micros / 1e6 / n_tokens))), 6)
                END AS prob
    FROM sc
    """,
)
def q77_hashed_classifier(spark, sf_dir):
    """fastText-style hashed linear quality classifier
    (operators/classifier.py): bucket = md5(token) % 2^20, closed-form
    micro-weights, per-doc dot product inside F.aggregate over the token
    array — zero Exchange, narrow map above the scan; a trained model
    swaps the closed form for a broadcast weight vector with the same
    plan."""
    from .operators.classifier import hashed_linear_score

    return hashed_linear_score(_read(spark, sf_dir, "documents"))


@q(
    "q78_normalize_text",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' ' || chr(1) || 'x' || repeat(chr(8203),
               CAST(doc_id % 3 AS INT) + 1) || ' tail' || chr(127)
               || '  end' AS t
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(t,
             '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]',
             '', 'g'), '\s+', ' ', 'g')) AS norm_text,
           CAST(3 + doc_id % 3 AS BIGINT) AS n_junk_chars
    FROM aug
    """,
)
def q78_normalize_text(spark, sf_dir):
    """Text normalization (functions/normalize.py): control chars,
    zero-width codepoints and BOMs spliced into every document are
    stripped and whitespace-collapsed; n_junk_chars counts exactly the
    characters the strip removed (chr(1), chr(127), and doc_id%3+1
    zero-width spaces = 3 + doc_id%3). Two codegen'd regexp_replace —
    shuffle-free."""
    from .functions.normalize import with_normalized_text

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" \x01x"),
            F.repeat(F.lit("\u200b"), (F.col("doc_id") % 3).cast("int") + 1),
            F.lit(" tail\x7f  end"),
        ).alias("text"),
    )
    return with_normalized_text(aug).select(
        "doc_id", "norm_text", "n_junk_chars"
    )


@q(
    "q79_domain_stats",
    f"""
    WITH per AS (
      SELECT source, doc_id, lang,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len({_Q76_TOKENS}) AS BIGINT) AS n_word_tokens,
             md5(text) AS h
      FROM documents
    ),
    fl AS (
      SELECT *, count(*) OVER (PARTITION BY h) > 1 AS is_dup FROM per
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_word_tokens) AS BIGINT) AS total_word_tokens,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(sum(n_chars) / CAST(count(*) AS DOUBLE), 4) AS avg_chars
    FROM fl GROUP BY source
    """,
)
def q79_domain_stats(spark, sf_dir):
    """Per-domain corpus report card (operators/textstats.py
    domain_stats): size, language spread, token supply, duplicate-farm
    rate, mean length — the rollup a curation run reads before setting
    mixture weights. Narrow per-doc pass → hash-window dup flag →
    partial-agg rollup on the domain key."""
    from .operators.textstats import domain_stats

    return domain_stats(_read(spark, sf_dir, "documents"))


@q(
    "q80_url_tracking_strip",
    """
    SELECT doc_id,
           'HTTP://' || source || '.Example.COM:80/Docs/' || doc_id ||
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN '?utm_source=feed&b=2&a=1'
               WHEN 1 THEN '?gclid=' || doc_id || '&z=9'
               ELSE '?utm_campaign=x&fbclid=y' END
             || '#frag' || doc_id AS url,
           'http://' || source || '.example.com/Docs/' || doc_id ||
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN '?a=1&b=2'
               WHEN 1 THEN '?z=9'
               ELSE '' END AS canon
    FROM documents
    """,
)
def q80_url_tracking_strip(spark, sf_dir):
    """URL hygiene for frontier/dedup keys (functions/urlnorm.py with
    strip_tracking=True): lowercase scheme+host, drop default port and
    fragment, strip utm_*/gclid/fbclid-class params, sort the rest. The
    oracle states the expected canonical form in closed form per
    doc_id%3 case — including the all-params-stripped empty-query case."""
    from .functions.urlnorm import canonical_url

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTP://"), F.col("source"), F.lit(".Example.COM:80/Docs/"),
        sid,
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("?gclid="), sid, F.lit("&z=9")))
        .otherwise(F.lit("?utm_campaign=x&fbclid=y")),
        F.lit("#frag"), sid,
    )
    return d.select(
        "doc_id", url.alias("url"),
        canonical_url(url, strip_tracking=True).alias("canon"),
    )


# --- round-3 cont.: distribution stats, recrawl diff, link graph, ---------
# --- CCNet buckets, anchor aggregation, blocklist curation -----------------


@q(
    "q81_length_percentiles",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99
    FROM documents GROUP BY lang
    """,
)
def q81_length_percentiles(spark, sf_dir):
    """Per-language document-length distribution
    (operators/textstats.py length_percentiles): exact interpolated
    p50/p90/p99 — the report a mixture/length-filter decision reads
    first. Exact `percentile` matches DuckDB's quantile_cont definition;
    the 10^12-row path swaps in the mergeable KLL sketch
    (percentile_approx) with the same call shape."""
    from .operators.textstats import length_percentiles

    return length_percentiles(_read(spark, sf_dir, "documents"))


@q(
    "q82_snapshot_diff",
    """
    WITH a AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
    ),
    b AS (
      SELECT doc_id,
             md5(text || CASE WHEN doc_id % 3 = 0 THEN ' v2' ELSE '' END)
               AS h
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.h IS NULL THEN 'added'
                WHEN b.h IS NULL THEN 'removed'
                WHEN a.h = b.h THEN 'unchanged'
                ELSE 'changed' END AS status,
           a.h AS old_fingerprint, b.h AS new_fingerprint
    FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    """,
)
def q82_snapshot_diff(spark, sf_dir):
    """Recrawl snapshot diff (plans/snapshot.py): two synthesized crawls
    (old = doc_id%7!=0; new = doc_id%5!=0, with doc_id%3==0 pages
    re-rendered) full-outer-joined on the page key comparing content
    fingerprints → added/removed/changed/unchanged. Co-partitioned
    sort-merge join under url-hash bucketing; status in codegen."""
    from .plans.snapshot import snapshot_diff

    d = _read(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5(F.col("text")).alias("page_hash")
    )
    new = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 3 == 0, F.lit(" v2"))
                .otherwise(F.lit("")),
            )
        ).alias("page_hash"),
    )
    return snapshot_diff(old, new, key="doc_id", fingerprint="page_hash")


@q(
    "q83_host_pagerank",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS s
           FROM documents),
    c1 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
    r1 AS (SELECT d.doc_id AS node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM documents d LEFT JOIN c1 ON d.doc_id = c1.dst),
    c2 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
    r2 AS (SELECT d.doc_id AS node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM documents d LEFT JOIN c2 ON d.doc_id = c2.dst),
    c3 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r2 ON e.src = r2.node GROUP BY dst),
    r3 AS (SELECT d.doc_id AS node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM documents d LEFT JOIN c3 ON d.doc_id = c3.dst)
    SELECT node, s AS rank_micros FROM r3
    """,
)
def q83_host_pagerank(spark, sf_dir):
    """PageRank over a synthesized page graph (operators/linkgraph.py
    pagerank_micros): each page links to (7·id+3)%N and (13·id+5)%N, 3
    damped iterations. Ranks are INTEGER MICROS with floor division at
    every step, so partial-sum order cannot perturb the result and the
    oracle's unrolled recurrence matches bit-for-bit — float PageRank
    can't make that promise. Joins + groupBy per round, src-partitioning
    reused, no driver-side graph."""
    from .operators.linkgraph import pagerank_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return pagerank_micros(edges, n_iter=3)


@q(
    "q84_perplexity_buckets",
    f"""
    WITH scored AS ({_Q73_SQL}),
    a AS (
      SELECT doc_id, n_bigrams, lm_logprob_micros,
             CAST(lm_logprob_micros AS DOUBLE)
               / CAST(n_bigrams AS DOUBLE) AS ar
      FROM scored
    ),
    th AS (
      SELECT quantile_disc(ar, 1.0 / 3.0) AS t_lo,
             quantile_disc(ar, 2.0 / 3.0) AS t_hi
      FROM a
    )
    SELECT doc_id, n_bigrams, lm_logprob_micros,
           round(ar, 6) AS avg_logprob,
           CAST(CASE WHEN ar > t_hi THEN 1
                     WHEN ar > t_lo THEN 2 ELSE 3 END AS BIGINT)
             AS ppl_bucket,
           CASE WHEN ar > t_hi THEN 'head'
                WHEN ar > t_lo THEN 'middle' ELSE 'tail' END
             AS bucket_label
    FROM a, th
    """,
)
def q84_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail split (operators/lm.py perplexity_buckets;
    Wenzek et al. 2020 §4.3), scale-safe threshold form: one
    percentile_approx aggregation yields the 1/3 and 2/3 quantiles of
    mean per-bigram log-prob under the lang='en' LM (in the exact
    regime the data value at rank ceil(p*n) — identical to DuckDB
    quantile_disc), the 1-row threshold frame is broadcast, buckets are
    two comparisons on the raw IEEE ratio. No window, no global sort —
    replaces r3's single-partition NTILE (VERDICT r3 #1); the NTILE
    reference lives on in tests as perplexity_buckets_ntile."""
    from .operators.lm import bigram_lm_score, perplexity_buckets

    docs = _read(spark, sf_dir, "documents")
    return perplexity_buckets(
        bigram_lm_score(docs, F.col("lang") == "en")
    )


@q(
    "q85_anchor_texts",
    """
    WITH pairs AS (
      SELECT 'https://nav.example.net/x' AS target, 'navlink' AS anchor
      FROM documents
      UNION ALL
      SELECT 'https://' || source || '.example.com/about/' || doc_id,
             'about' FROM documents
      UNION ALL
      SELECT 'https://ext' || (doc_id % 5) || '.example.org/page', 'ext'
      FROM documents
    )
    SELECT target, CAST(count(*) AS BIGINT) AS n_refs,
           CAST(count(DISTINCT anchor) AS BIGINT) AS n_distinct_anchors,
           min(anchor) AS first_anchor
    FROM pairs GROUP BY target
    """,
)
def q85_anchor_texts(spark, sf_dir):
    """Anchor-text aggregation (operators/linkgraph.py anchor_pairs →
    anchor_text_stats): Arrow-batched anchor parse (htmlx/anchors.py, a
    standalone walker — the byte-parity extractor is untouched), codegen
    href resolution, groupBy(target) with partial-aggregable outputs.
    The oracle states the synthesized pages' full link inventory
    (nav/about/ext) in closed form."""
    from .operators.linkgraph import anchor_pairs, anchor_text_stats

    docs = documents_as_pages(spark, sf_dir)
    return anchor_text_stats(anchor_pairs(docs))


@q(
    "q86_domain_blocklist",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN 'cdn.' || source || '.example.com'
                ELSE source || '.example.com' END AS host,
           source IN ('src3', 'src7') AS blocked,
           CASE WHEN source IN ('src3', 'src7')
                THEN source || '.example.com' END AS matched_entry
    FROM documents
    """,
)
def q86_domain_blocklist(spark, sf_dir):
    """UT1-style domain blocklist (operators/blocklist.py): entry blocks
    the domain and every subdomain. Hosts (¼ behind a cdn. subdomain)
    explode into their dot-suffixes and EQUI-join the broadcast
    blocklist — never a LIKE nested loop. Oracle states the expected
    flags in closed form (src3/src7 blocked, cdn.src3 via suffix)."""
    from .operators.blocklist import domain_block_flags

    d = _read(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("cdn."), F.col("source"), F.lit(".example.com")),
        )
        .otherwise(F.concat(F.col("source"), F.lit(".example.com")))
        .alias("host"),
    )
    bl = spark.createDataFrame(
        [("src3.example.com",), ("src7.example.com",),
         ("nav.example.net",)],
        "entry string",
    )
    return domain_block_flags(docs, bl)


@q(
    "q87_main_content",
    """
    SELECT doc_id,
           'Heading ' || doc_id ||
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN ' ' || text ELSE '' END AS main_text,
           CAST(7 AS INT) AS n_blocks,
           CAST(CASE WHEN len(string_split(text, ' ')) >= 3
                     THEN 2 ELSE 1 END AS INT) AS n_content_blocks
    FROM documents
    """,
)
def q87_main_content(spark, sf_dir):
    """Boilerplate removal / main-content extraction
    (operators/boilerplate.py, jusText-lite): block segmentation
    (htmlx/blocks.py) in one Arrow pass, then link-density + length
    classification and document-order re-join as pure array-expression
    codegen — zero shuffle, no explode (plan pinned in test_plan_shapes).
    The reference keeps whole-page text (crawler.py:163); this is the
    content tier a training pipeline runs instead. Oracle: the synthesized
    page's 7 blocks classify in closed form — h1 is content (heading
    exemption), body text iff >= 3 words; title/header/nav/links/footer
    are boilerplate (short or link-dense)."""
    from .operators.boilerplate import main_content

    docs = documents_as_pages(spark, sf_dir)
    return main_content(docs).select(
        "doc_id", "main_text", "n_blocks", "n_content_blocks"
    )


@q(
    "q88_boilerplate_stats",
    """
    WITH w AS (
      SELECT doc_id, len(string_split(text, ' ')) AS pw FROM documents
    )
    SELECT doc_id,
           CAST(7 AS INT) AS n_blocks,
           CAST(CASE WHEN pw >= 3 THEN 2 ELSE 1 END AS INT)
             AS n_content_blocks,
           CAST(10 + pw AS INT) AS n_words_total,
           CAST(10 + pw - 2 - CASE WHEN pw >= 3 THEN pw ELSE 0 END AS INT)
             AS n_words_boiler,
           round(CAST(10 + pw - 2 - CASE WHEN pw >= 3 THEN pw ELSE 0 END
                      AS DOUBLE) / CAST(10 + pw AS DOUBLE), 4)
             AS boiler_word_ratio
    FROM w
    """,
)
def q88_boilerplate_stats(spark, sf_dir):
    """Per-page boilerplate profile (operators/boilerplate.py
    boilerplate_stats): block/word counts and the boilerplate word share —
    the measurement a content-extraction threshold decision reads. Same
    zero-shuffle array-codegen shape as q87. Oracle: closed-form word
    accounting over the synthesized 7-block page (10 chrome words + the
    body text; h1's 2 words + body text are content when >= 3 words)."""
    from .operators.boilerplate import boilerplate_stats

    docs = documents_as_pages(spark, sf_dir)
    return boilerplate_stats(docs).select(
        "doc_id", "n_blocks", "n_content_blocks", "n_words_total",
        "n_words_boiler", "boiler_word_ratio",
    )


@q(
    "q89_khop_reachable",
    """
    WITH RECURSIVE nn AS (SELECT CAST(count(*) AS BIGINT) AS N
                          FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    walk(node, dist) AS (
      SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
      WHERE w.dist < 3
    )
    SELECT node, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY node
    """,
)
def q89_khop_reachable(spark, sf_dir):
    """Multi-source k-hop BFS over the q83 page graph (operators/
    linkgraph.py bfs_min_dist): every page within 3 hops of the seed set
    (doc_id % 97 == 0) with its minimum hop distance — the frontier-
    expansion query behind "crawl everything within k clicks of the
    seeds". Level-synchronous joins + anti-joins, zero driver-side graph,
    zero actions in the loop. Oracle: DuckDB recursive CTE walking the
    same (7·id+3)%N / (13·id+5)%N edges with min(dist)."""
    from .operators.linkgraph import bfs_min_dist

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    seeds = d.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("node")
    )
    return bfs_min_dist(edges, seeds, k=3, materialize=True)


@q(
    "q90_content_spans",
    """
    WITH base AS (
      SELECT doc_id, text,
             length('<html><head><title>Doc ' || doc_id ||
                    '</title><meta name="description" content="' ||
                    source || ' document"></head><body>' ||
                    '<header>site header</header>' ||
                    '<nav><a href="https://nav.example.net/x">navlink' ||
                    '</a></nav>' || '<h1>') AS h1_start
      FROM documents
    )
    SELECT doc_id, CAST(3 AS INT) AS block_idx, 'h1' AS tag,
           CAST(h1_start AS INT) AS span_start,
           CAST(h1_start + length('Heading ' || doc_id) AS INT)
             AS span_end,
           'Heading ' || doc_id AS span_text
    FROM base
    UNION ALL
    SELECT doc_id, CAST(4 AS INT), 'p',
           CAST(h1_start + length('Heading ' || doc_id)
                + length('</h1><p>')
                + (length(text) - length(ltrim(text))) AS INT),
           CAST(h1_start + length('Heading ' || doc_id)
                + length('</h1><p>') + length(rtrim(text)) AS INT),
           trim(text)
    FROM base
    WHERE len(string_split(text, ' ')) >= 3
    """,
)
def q90_content_spans(spark, sf_dir):
    """Content-block source SPANS (operators/boilerplate.py
    content_spans): per content block, the [start, end) character range
    in the decoded page whose raw slice is the block's visible text, plus
    the slice itself re-cut JVM-side — the north_rule's "extracted
    text/spans per document" as an addressable provenance layer. Offsets
    come from the single-feed span walker (htmlx/blocks.py _SpanWalker);
    only 2 ints per block cross Arrow beyond the block facts. Oracle:
    offsets computed closed-form by length arithmetic over the
    reconstructed synthetic page (h1 block always content; p block iff
    >= 3 words, leading/trailing whitespace trimmed)."""
    from .operators.boilerplate import content_spans

    docs = documents_as_pages(spark, sf_dir)
    return content_spans(docs).select(
        "doc_id", "block_idx", "tag", "span_start", "span_end",
        "span_text",
    )


# q91's oracle states the SAME fixed-literal mojibake arithmetic the
# operator runs, generated from the one shared constant so the two can
# never drift. Injection: every 7th doc gets a double-encoding signature,
# every 13th a U+FFFD — identically on both sides.
from .operators.textstats import MOJIBAKE_SEQS as _MOJI  # noqa: E402

_MOJI_SUM_SQL = " + ".join(
    f"CAST((length(t) - length(replace(t, '{s}', ''))) // {len(s)} AS INT)"
    for s in _MOJI
)


@q(
    "q91_encoding_quality",
    f"""
    WITH inj AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' franÃ§ais Ã©cole' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' ' || chr(65533) ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS INT) AS n_chars,
           CAST(length(t) - length(replace(t, chr(65533), '')) AS INT)
             AS n_replacement,
           {_MOJI_SUM_SQL} AS mojibake_hits,
           CAST(length(t)
                - length(regexp_replace(t, '[^\\x00-\\x7F]', '', 'g'))
             AS INT) AS n_non_ascii,
           round(CAST(length(regexp_replace(t, '[^\\x00-\\x7F]', '', 'g'))
                      AS DOUBLE)
                 / CAST(greatest(length(t), 1) AS DOUBLE), 4)
             AS ascii_ratio,
           (length(t) - length(replace(t, chr(65533), '')) > 0
            OR {_MOJI_SUM_SQL} > 0) AS encoding_suspect
    FROM inj
    """,
)
def q91_encoding_quality(spark, sf_dir):
    """Encoding-quality audit (operators/textstats.py encoding_quality):
    replacement-char damage, Latin-1-misdecoded-UTF-8 signatures, and
    non-ASCII share per document — the gate that catches wrong-charset
    pages the reference's inherited requests guess never audits
    (crawler.py:137-138). Deterministic corruption injected in-dataflow
    (doc_id % 7 → mojibake, % 13 → U+FFFD) so both engines score the same
    strings; all metrics are fixed-literal replace/length arithmetic —
    native columnar, zero shuffle."""
    from .operators.textstats import encoding_quality

    d = _read(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit(" franÃ§ais Ã©cole")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0,
                   F.lit(" �")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return encoding_quality(injected)


@q(
    "q92_table_extract",
    """
    SELECT doc_id, CAST(0 AS INT) AS table_idx,
           CAST(0 AS INT) AS row_idx, 'key|value' AS cells_joined
    FROM documents
    UNION ALL
    SELECT doc_id, 0, 1, 'id|' || doc_id FROM documents
    UNION ALL
    SELECT doc_id, 0, 2, 'lang|' || lang FROM documents
    """,
)
def q92_table_extract(spark, sf_dir):
    """HTML table extraction (operators/tables.py table_rows): each
    ``<table>`` recovered as ordered rows of cell texts — the relational
    structure the reference's flat get_text flattens into word soup
    (crawler.py:163). One Arrow-batched walker pass, JVM-side explode, no
    shuffle. Pages synthesized with a 3-row key/value spec table per doc;
    oracle states the three rows closed-form (cells pipe-joined so the
    value hash is array-representation-independent)."""
    from .operators.tables import table_rows

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><h1>Spec "), sid, F.lit("</h1>"),
        F.lit("<table><tr><th>key</th><th>value</th></tr>"),
        F.lit("<tr><td>id</td><td>"), sid, F.lit("</td></tr>"),
        F.lit("<tr><td>lang</td><td>"), F.col("lang"),
        F.lit("</td></tr></table></body></html>"),
    )
    pages = d.select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    return table_rows(pages).select(
        "doc_id", "table_idx", "row_idx",
        F.array_join("cells", "|").alias("cells_joined"),
    )


@q(
    "q93_pdf_layout",
    """
    SELECT doc_id,
           'Alpha ' || doc_id || chr(10) ||
           'Bravo ' || source || chr(10) ||
           'Charlie ' || lang || chr(10) ||
           'Delta ' || (doc_id % 7) AS pdf_layout_text
    FROM documents
    """,
)
def q93_pdf_layout(spark, sf_dir):
    """Multi-column PDF LAYOUT parse (north_rule "PDF/layout parse",
    htmlx/pdfx.py extract_pdf_text_layout): two-column PDFs whose content
    stream emits runs ROW-major (interleaved A1,C1,B1,D1) must read back
    COLUMN-major (A,B then C,D) via Tm-position clustering — stream order
    alone cannot pass this oracle (q48 covers that tier). FlateDecode for
    odd ids exercises both raw and compressed streams. Same Arrow-batched
    Scan → ArrowEvalPython shape as every extractor."""
    from .operators.pdf import extract_pdf_layout_pages, make_pdf_columns_udf

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    pdfs = d.select(
        "doc_id",
        make_pdf_columns_udf(
            F.concat(F.lit("Alpha "), sid, F.lit("\nBravo "),
                     F.col("source")),
            F.concat(F.lit("Charlie "), F.col("lang"), F.lit("\nDelta "),
                     (F.col("doc_id") % 7).cast("string")),
            (F.col("doc_id") % 2 == 1),
        ).alias("pdf"),
    )
    return extract_pdf_layout_pages(pdfs).select("doc_id", "pdf_layout_text")


@q(
    "q94_template_blocks",
    """
    WITH p AS (SELECT doc_id, source || '.example.com' AS host, text
               FROM documents),
    np AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages
           FROM p GROUP BY host),
    b AS (
      SELECT host, doc_id, 'Doc ' || doc_id AS block_text FROM p
      UNION ALL SELECT host, doc_id, 'site header' FROM p
      UNION ALL SELECT host, doc_id, 'navlink' FROM p
      UNION ALL SELECT host, doc_id, 'Heading ' || doc_id FROM p
      UNION ALL SELECT host, doc_id, trim(text) FROM p
                WHERE trim(text) <> ''
      UNION ALL SELECT host, doc_id, 'about ext' FROM p
      UNION ALL SELECT host, doc_id, 'footer' FROM p
    ),
    d AS (SELECT DISTINCT host, doc_id, block_text FROM b),
    c AS (SELECT host, block_text,
                 CAST(count(*) AS BIGINT) AS n_pages_with_block
          FROM d GROUP BY host, block_text)
    SELECT c.host, c.block_text, c.n_pages_with_block, np.n_pages,
           round(CAST(c.n_pages_with_block AS DOUBLE)
                 / CAST(np.n_pages AS DOUBLE), 4) AS frac_pages
    FROM c JOIN np ON c.host = np.host
    WHERE c.n_pages_with_block * 1000000 >= 500000 * np.n_pages
    """,
)
def q94_template_blocks(spark, sf_dir):
    """SITE-LEVEL template detection (operators/boilerplate.py
    template_blocks): blocks recurring on >= 50% of a host's pages are
    that host's template — the cross-page frequency tier that catches
    link-light chrome the per-page jusText rule (q87) cannot. Host parsed
    from the url natively; one Arrow segmentation pass → distinct →
    partial-agg count → broadcast page-count dim; integer-micros
    threshold so both engines agree at the boundary. Oracle enumerates
    the synthesized page's 7 blocks and runs the same counting."""
    from .operators.boilerplate import template_blocks

    docs = documents_as_pages(spark, sf_dir).withColumn(
        "host", F.regexp_extract("url", r"^https://([^/]+)/", 1)
    )
    return template_blocks(docs, host_col="host", page_col="url")


@q(
    "q95_recrawl_priority",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 = 0 OR doc_id % 4 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_changes,
           CAST(2 AS INT) AS n_observations,
           CASE CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 = 0 OR doc_id % 4 = 0
                       THEN 1 ELSE 0 END
                WHEN 0 THEN '30d' WHEN 1 THEN '7d' ELSE '1d' END
             AS recrawl_interval
    FROM documents
    """,
)
def q95_recrawl_priority(spark, sf_dir):
    """Change-rate recrawl scheduling (plans/snapshot.py
    recrawl_priority): three synthesized snapshots (v2 touches doc_id%3,
    v3 touches doc_id%4), two snapshot_diff passes unioned, churn counted
    per page, interval bucketed 0→30d / 1→7d / 2+→1d — the freshness
    planner a recrawl frontier reads (Cho & Garcia-Molina 2003). One
    partial-agg groupBy + codegen CASE. Oracle: churn is closed-form in
    doc_id (diff(1,2) changes iff %3; diff(2,3) iff %3 or %4 — the
    appended version suffixes differ)."""
    from .plans.snapshot import recrawl_priority, snapshot_diff

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")

    def snap(suffix_cond, suffix):
        return d.select(
            "doc_id",
            F.md5(
                F.concat(
                    F.col("text"),
                    F.when(suffix_cond, F.lit(suffix)).otherwise(F.lit("")),
                ).cast("binary")
            ).alias("page_hash"),
        )

    s1 = snap(F.lit(False), "")
    s2 = snap(F.col("doc_id") % 3 == 0, " v2")
    s3 = snap(F.col("doc_id") % 4 == 0, " v3")
    diffs = snapshot_diff(s1, s2, key="doc_id").unionByName(
        snapshot_diff(s2, s3, key="doc_id")
    ).select("doc_id", "status")
    return recrawl_priority(diffs, key="doc_id")


@q(
    "q96_site_aware_content",
    """
    WITH p AS (SELECT doc_id, source, trim(text) AS t,
                      len(string_split(text, ' ')) AS pw
               FROM documents),
    np AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM p GROUP BY source),
    tc AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
           FROM p GROUP BY source, t)
    SELECT p.doc_id,
           trim('Heading ' || p.doc_id
                || CASE WHEN np.n < 2
                        THEN ' © ' || p.source || ' widgets est 1999'
                        ELSE '' END
                || CASE WHEN p.pw >= 3
                             AND NOT (tc.c >= 2 AND 2 * tc.c >= np.n)
                        THEN ' ' || p.t ELSE '' END) AS main_text,
           CAST(CASE WHEN length(p.t) > 0 THEN 4 ELSE 3 END AS INT)
             AS n_blocks,
           CAST(1 + (CASE WHEN np.n < 2 THEN 1 ELSE 0 END)
                + (CASE WHEN p.pw >= 3
                             AND NOT (tc.c >= 2 AND 2 * tc.c >= np.n)
                        THEN 1 ELSE 0 END) AS INT) AS n_content_blocks
    FROM p
    JOIN np ON np.source = p.source
    JOIN tc ON tc.source = p.source AND tc.t = p.t
    """,
)
def q96_site_aware_content(spark, sf_dir):
    """Two-tier main content (operators/boilerplate.py
    main_content_site_aware): per-page jusText-lite rule MINUS host
    templates. The synthesized page carries a link-light 5-word tagline
    ("© {source} widgets est 1999") on EVERY host page: the per-page
    rule (q87 tier) calls it content; only the cross-page frequency tier
    removes it. Oracle computes both tiers closed-form with the
    min_template_pages=2 repeat guard (ADVICE r3): the unique h1 can
    never be template (c=1), the tagline survives only on 1-page hosts,
    and duplicate body text is template iff c >= 2 AND 2c >= n. The ©
    guard: corpus text is letters+spaces only (verified), so tagline /
    footer literals cannot collide with body text at >= 3 words."""
    from .operators.boilerplate import main_content_site_aware

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><h1>Heading "), sid, F.lit("</h1>"),
        F.lit("<p>© "), F.col("source"), F.lit(" widgets est 1999</p>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<footer>footer</footer></body></html>"),
    )
    pages = d.select(
        "doc_id",
        F.col("source").alias("host"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/docs/"), sid).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return main_content_site_aware(pages).select(
        "doc_id", "main_text", "n_blocks", "n_content_blocks"
    )


@q(
    "q97_exact_substring_dedup",
    """
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(trim(text), ' '),
                                  w -> w <> '') AS tk
               FROM documents),
    g AS (SELECT doc_id, i AS start,
                 array_to_string(tk[i:i+7], ' ') AS gram
          FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk) - 7))
                           AS i)
          WHERE len(tk) >= 8),
    o AS (SELECT doc_id, start,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, start) AS rn,
                 count(*) OVER (PARTITION BY gram) AS c
          FROM g),
    cov AS (SELECT DISTINCT doc_id, p
            FROM o, LATERAL (SELECT unnest(generate_series(start,
                                                           start + 7))
                             AS p)
            WHERE c > 1 AND rn > 1),
    tokpos AS (SELECT doc_id, p, tk[p] AS w
               FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)))
                                AS p)),
    kept AS (SELECT tp.doc_id, tp.p, tp.w
             FROM tokpos tp
             LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.p = tp.p
             WHERE cov.p IS NULL),
    reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS txt,
                   count(*) AS nk
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(reb.txt, '') AS deduped_text,
           CAST(len(t.tk) AS INT) AS n_tokens,
           CAST(len(t.tk) - coalesce(reb.nk, 0) AS INT) AS n_removed
    FROM t LEFT JOIN reb ON reb.doc_id = t.doc_id
    """,
)
def q97_exact_substring_dedup(spark, sf_dir):
    """Exact substring deduplication at 8-gram granularity
    (operators/dedup.py dedup_exact_substring; Lee et al. 2022 /
    RefinedWeb span-level tier): every duplicated 8-token span is excised
    from all occurrences except the corpus-first, documents re-assembled
    from surviving tokens. The corpus carries ~1000 naturally duplicated
    8-grams at sf0.01, so the oracle COMPUTES the same keep-first
    coverage (window rank ≡ the operator's partial-agg min-struct pick)
    rather than assuming injected duplicates. Canonical pick is a
    mergeable MIN — no corpus-wide sort; all joins key on (gram) or
    (doc_id, p)."""
    from .operators.dedup import dedup_exact_substring

    d = _read(spark, sf_dir, "documents")
    return dedup_exact_substring(d, k=8)


@q(
    "q98_page_markdown",
    """
    SELECT doc_id,
           'site header' || chr(10) || chr(10) ||
           '[navlink](https://nav.example.net/x)' || chr(10) || chr(10) ||
           '# Heading ' || doc_id ||
           CASE WHEN trim(text) <> ''
                THEN chr(10) || chr(10) || trim(text) ELSE '' END ||
           chr(10) || chr(10) ||
           '[about](/about/' || doc_id || ') ' ||
           '[ext](https://ext' || (doc_id % 5) ||
           '.example.org/page) ' ||
           '![img ' || doc_id || '](/img/' || doc_id || '.png)' ||
           chr(10) || chr(10) || 'footer' AS markdown
    FROM documents
    """,
)
def q98_page_markdown(spark, sf_dir):
    """HTML → Markdown conversion (htmlx/markdown.py via
    operators/markdown.pages_to_markdown): headings, links, and images
    preserved as structure instead of flattening to word soup — the
    training-data format a structure-aware corpus keeps. head/meta
    dropped (the title line the flat extractor emits is absent on
    purpose). Oracle states the full converted document byte-for-byte,
    including the conditional body paragraph and inline image token."""
    from .operators.markdown import pages_to_markdown

    docs = documents_as_pages(spark, sf_dir)
    return pages_to_markdown(docs).select("doc_id", "markdown")


@q(
    "q99_reading_ease",
    """
    WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
    m AS (
      SELECT doc_id,
             CASE WHEN trim(lt) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lt), '\\s+')) END
               AS n_words,
             CAST(length(regexp_replace(lt, '[aeiouy]+', '#', 'g'))
                  - length(replace(regexp_replace(lt, '[aeiouy]+', '#',
                                                  'g'), '#', ''))
               AS INT) AS n_syllables,
             greatest(CAST(length(regexp_replace(lt, '[.!?]+', '#', 'g'))
                           - length(replace(regexp_replace(lt, '[.!?]+',
                                                           '#', 'g'),
                                            '#', '')) AS INT), 1)
               AS n_sentences
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           n_syllables,
           CAST(n_sentences AS INT) AS n_sentences,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / CAST(greatest(n_words, 1) AS DOUBLE)), 4)
             AS flesch_score
    FROM m
    """,
)
def q99_reading_ease(spark, sf_dir):
    """Flesch reading-ease (operators/textstats.reading_ease) — the
    readability signal education-quality filters threshold on. Proxy
    syllables = vowel-group runs; sentences = [.!?]+ runs floored at 1.
    Oracle counts the same runs via replace-length arithmetic (a regex
    shape Java and RE2 treat identically) and states the same rounded
    formula. Native columnar, zero shuffle."""
    from .operators.textstats import reading_ease

    return reading_ease(_read(spark, sf_dir, "documents"))


@q(
    "q100_curation_verdict",
    f"""
    WITH inj AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0 THEN ' Ã©cole' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' ' || chr(65533) ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' ' || repeat('0123456789 ', 40) ELSE '' END
               AS t
      FROM documents
    ),
    m AS (
      SELECT doc_id, t,
             CASE WHEN trim(t) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(t), '\\s+')) END
               AS n_words,
             length(t) - length(replace(t, chr(65533), '')) AS n_repl,
             {_MOJI_SUM_SQL} AS moji,
             length(regexp_replace(t, '\\s+', '', 'g')) AS nonspace,
             length(t) - length(regexp_replace(t, '\\p{{L}}', '', 'g'))
               AS alpha
      FROM inj
    ),
    g AS (
      SELECT doc_id, n_words,
             round(CAST(alpha AS DOUBLE)
                   / CAST(greatest(nonspace, 1) AS DOUBLE), 4)
               AS alpha_ratio,
             n_repl, moji
      FROM m
    )
    SELECT doc_id, CAST(n_words AS INT) AS n_words, alpha_ratio,
           (concat_ws(',',
              CASE WHEN n_words < 5 THEN 'too_short' END,
              CASE WHEN n_words > 100000 THEN 'too_long' END,
              CASE WHEN n_repl > 0 OR moji > 0 THEN 'encoding' END,
              CASE WHEN alpha_ratio < 0.6 THEN 'low_alpha' END) = '')
             AS keep,
           concat_ws(',',
              CASE WHEN n_words < 5 THEN 'too_short' END,
              CASE WHEN n_words > 100000 THEN 'too_long' END,
              CASE WHEN n_repl > 0 OR moji > 0 THEN 'encoding' END,
              CASE WHEN alpha_ratio < 0.6 THEN 'low_alpha' END)
             AS reasons_csv
    FROM g
    """,
)
def q100_curation_verdict(spark, sf_dir):
    """Composite curation verdict (operators/textstats.curation_verdict):
    keep/drop + ordered failed-gate reasons — the audit record ablations
    and appeal queues read. Deterministic corruption injected in-dataflow
    (mojibake %7, replacement char %13, digit spam %11 — the last drives
    alpha_ratio below 0.6) so every gate fires somewhere in the corpus;
    the oracle recomputes every gate from the same injected strings with
    the same fixed-literal arithmetic and rounded-ratio compare. Native
    per-row columnar; reasons as a fixed-order CSV so the verdict
    hash-compares across engines."""
    from .operators.textstats import curation_verdict

    d = _read(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit(" Ã©cole")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0,
                   F.lit(" �")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit(" "),
                            F.expr("repeat('0123456789 ', 40)")))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return curation_verdict(injected)


@q(
    "q101_nfc_normalize",
    """
    WITH inj AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 6 = 0
                          THEN ' cafe' || chr(769) ELSE '' END
                  || CASE WHEN doc_id % 9 = 0
                          THEN ' A' || chr(778) || chr(769) ELSE '' END
               AS t
      FROM documents
    )
    SELECT doc_id,
           nfc_normalize(t) AS nfc_text,
           nfc_normalize(t) <> t AS nfc_changed,
           CAST(length(t) AS INT) AS n_chars_before,
           CAST(length(nfc_normalize(t)) AS INT) AS n_chars_after
    FROM inj
    """,
)
def q101_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization (functions/normalize.with_nfc_text):
    combining marks fold into precomposed codepoints so hash dedup and
    token matching treat 'e'+U+0301 and 'é' as the same text — web
    corpora mix both forms. Injection: %6 docs get a decomposed é
    (composes, length shrinks by 1); %9 docs get A + ring + acute
    (composes to Ǻ via the two-step canonical ordering + composition —
    a genuinely multi-mark case). Cross-engine proof: Spark runs stdlib
    unicodedata, the oracle runs DuckDB's INDEPENDENT utf8proc-based
    nfc_normalize — hash equality means two implementations of the
    Unicode standard agree byte-for-byte."""
    from .functions.normalize import with_nfc_text

    d = _read(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 6 == 0,
                   F.lit(" cafe\u0301")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 0,
                   F.lit(" A\u030a\u0301")).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = with_nfc_text(injected)
    return out.select(
        "doc_id",
        "nfc_text",
        "nfc_changed",
        F.length("text").cast("int").alias("n_chars_before"),
        F.length("nfc_text").cast("int").alias("n_chars_after"),
    )


@q(
    "q102_stream_windowed_tf",
    _TOKENS_CTE
    + """
    SELECT strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + (doc_id % 3) * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           word, CAST(count(*) AS BIGINT) AS freq
    FROM words GROUP BY 1, 2
    """,
)
def q102_stream_windowed_tf(spark, sf_dir):
    """Watermarked event-time WINDOWED corpus TF, driver-checked
    (streaming/stream_extract.stream_windowed_doc_tf): documents arrive
    as a stream with warc_ts spread across three hours (doc_id % 3), a
    2-hour watermark bounds late data, and hourly tumbling windows
    aggregate token counts — the "watermarks + windowed aggs" streaming
    tier. Drained complete-mode to a memory sink under
    Trigger.AvailableNow so the bounded result is deterministic; the
    oracle computes the same per-window counts closed-form (window start
    = the synthesized hour, windows align to the hour grid). Window
    starts compared as formatted strings so timezone normalization
    cannot perturb the hash."""
    import uuid

    from .streaming.stream_extract import stream_windowed_doc_tf

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "timestamp'2026-01-01 00:00:00'"
            " + (doc_id % 3) * INTERVAL 1 HOUR"
        ).alias("warc_ts"),
        "text",
        "lang",
    )
    import tempfile

    qname = "q102mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        d.write.mode("overwrite").parquet(f"{root}/src")
        agg = stream_windowed_doc_tf(spark, f"{root}/src")
        qry = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("windowed-TF drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()  # materialize before the tempdir vanishes
        return out


@q(
    "q103_stream_session_windows",
    """
    WITH d AS (SELECT doc_id, doc_id % 8 AS m FROM documents),
    s AS (SELECT 'h' || (m % 4) AS host,
                 CASE WHEN m < 4 THEN m ELSE 120 + m END AS off_min,
                 count(*) AS n_pages
          FROM d GROUP BY 1, 2)
    SELECT host,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + off_min * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + (off_min + 30) * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(n_pages AS BIGINT) AS n_pages
    FROM s
    """,
)
def q103_stream_session_windows(spark, sf_dir):
    """Streaming SESSION windows per host (streaming/stream_extract
    .stream_session_windows): gap-based crawl-burst sessions — the third
    windowing mode after tumbling (q102) and the stateful first-seen map
    (q67). Fixture: each host gets two event-time clusters 124 minutes
    apart, far beyond the 30-minute gap, so every host closes exactly two
    sessions whose bounds and page counts are closed-form. Complete-mode
    AvailableNow drain to a memory sink; session bounds compared as
    formatted strings."""
    import tempfile
    import uuid

    from .streaming.stream_extract import stream_session_windows

    d = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 4).cast("string")).alias(
            "host"
        ),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + (CASE WHEN doc_id % 8 < 4"
            " THEN doc_id % 8 ELSE 120 + doc_id % 8 END)"
            " * INTERVAL 1 MINUTE"
        ).alias("warc_ts"),
    )
    qname = "q103mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        d.write.mode("overwrite").parquet(f"{root}/src")
        agg = stream_session_windows(spark, f"{root}/src")
        qry = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("session-window drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


@q(
    "q104_stratified_sample",
    """
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= 10
    """,
)
def q104_stratified_sample(spark, sf_dir):
    """Exact-k stratified sampling (operators/mixing.
    stratified_topk_sample): exactly 10 documents per language, ranked by
    md5(doc_id) — a deterministic, engine-portable pseudo-random order
    with no RNG state, so the probe/eval carve is rerun-stable and
    reproducible from the id alone. Complements q74's rate-based mixture
    sampling (target fraction vs target count). Stratum-partitioned
    window only — never a global sort."""
    from .operators.mixing import stratified_topk_sample

    d = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_topk_sample(d, stratum_col="lang", k=10).select(
        "doc_id", "lang", F.col("sample_rank").cast("int").alias(
            "sample_rank"
        )
    )


@q(
    "q105_image_dhash",
    """
    WITH p AS (SELECT doc_id,
                      17 + doc_id % 97 AS a,
                      5 + doc_id % 31 AS b
               FROM documents),
    b AS (
      SELECT doc_id, y.i AS y, x.i AS x,
             CASE WHEN (2 * x.i * a + 2 * y.i * b) % 256
                     > (2 * (x.i + 1) * a + 2 * y.i * b) % 256
                  THEN 1 ELSE 0 END AS bit
      FROM p,
           (SELECT unnest(range(8)) AS i) y,
           (SELECT unnest(range(8)) AS i) x
    ),
    h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN y * 8 + x < 32
                           THEN bit * (CAST(1 AS BIGINT)
                                       << (31 - (y * 8 + x)))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN y * 8 + x >= 32
                           THEN bit * (CAST(1 AS BIGINT)
                                       << (63 - (y * 8 + x)))
                           ELSE 0 END) AS BIGINT) AS lo
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, printf('%08x%08x', hi, lo) AS dhash FROM h
    """,
)
def q105_image_dhash(spark, sf_dir):
    """Perceptual image fingerprint (operators/multimodal.image_dhash —
    REAL PNG decode + grey + 9×8 nearest-neighbor downscale + dHash, not
    a stub): 64-bit difference hash per image, the standard near-dup key
    for image corpora; Hamming banding composes with the SimHash
    machinery for corpus-scale candidate pairs. Fixture: 18×16 greys
    with px(x,y) = (x·a + y·b) mod 256, per-doc multipliers — wrap-rich,
    471 distinct hashes over 500 docs — and the 9×8 downscale sampling
    every second pixel (sx = 2x, sy = 2y by resize_nearest's floor-div
    mapping) keeps all 64 comparison bits closed-form. Only a real
    decoder + downscaler reproduces the hex."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .imagex import encode_png
    from .operators.multimodal import image_dhash

    def _png_batch(doc_id):
        out = []
        for i in doc_id:
            a, b = 17 + int(i) % 97, 5 + int(i) % 31
            px = bytes(
                (x * a + y * b) % 256
                for y in range(16)
                for x in range(18)
            )
            out.append(encode_png(px, 18, 16, 1))
        return pd.Series(out)

    png_udf = pandas_udf(_png_batch, BinaryType())
    media = _read(spark, sf_dir, "documents").select(
        "doc_id", png_udf(F.col("doc_id")).alias("payload")
    )
    return image_dhash(media).select("doc_id", "dhash")


@q(
    "q107_image_neardup_pairs",
    """
    WITH p AS (SELECT doc_id,
                      17 + doc_id % 97 AS a,
                      5 + doc_id % 31 AS b
               FROM documents),
    b AS (
      SELECT doc_id, y.i AS y, x.i AS x,
             CASE WHEN (2 * x.i * a + 2 * y.i * b) % 256
                     > (2 * (x.i + 1) * a + 2 * y.i * b) % 256
                  THEN 1 ELSE 0 END AS bit
      FROM p,
           (SELECT unnest(range(8)) AS i) y,
           (SELECT unnest(range(8)) AS i) x
    ),
    h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN y * 8 + x < 32
                           THEN bit * (CAST(1 AS BIGINT)
                                       << (31 - (y * 8 + x)))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN y * 8 + x >= 32
                           THEN bit * (CAST(1 AS BIGINT)
                                       << (63 - (y * 8 + x)))
                           ELSE 0 END) AS BIGINT) AS lo
      FROM b GROUP BY doc_id
    ),
    -- both renditions of a doc (original 18x16 and the re-encoded 2x
    -- upscale) share the SAME closed-form hash: the 9x8 downscale of
    -- the 36x32 upscale samples source pixel (4x)//2 = 2x, (4y)//2 = 2y
    -- -- exactly the original's samples (resize_nearest floor-div map)
    m AS (SELECT doc_id * 2 + v.m AS media_id,
                 printf('%08x%08x', hi, lo) AS dhash, hi, lo
          FROM h, (SELECT unnest([0, 1]) AS m) v),
    bands AS (
      SELECT media_id, hi, lo, band,
             CASE band WHEN 0 THEN substr(dhash, 1, 6)
                       WHEN 1 THEN substr(dhash, 7, 5)
                       ELSE substr(dhash, 12, 5) END AS band_sub
      FROM m, (SELECT unnest(range(3)) AS band)
    ),
    pr AS (
      SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id,
             CAST(bit_count(xor(x.hi, y.hi))
                  + bit_count(xor(x.lo, y.lo)) AS INT) AS hamming
      FROM bands x
      JOIN bands y ON x.band = y.band AND x.band_sub = y.band_sub
                   AND x.media_id < y.media_id
    )
    SELECT a_id, b_id, hamming FROM pr WHERE hamming <= 2
    """,
)
def q107_image_neardup_pairs(spark, sf_dir):
    """Image near-duplicate pairs via dHash Hamming banding (VERDICT r3
    #5 / Next #5: the end-to-end composition q105 only described):
    every doc contributes its original 18×16 PNG and a re-encoded 2×
    nearest-neighbor upscale; operators/dedup.dhash_near_pairs bands
    the 64-bit perceptual hashes pigeonhole-style (3 hex substrings for
    max_hamming=2) and equi-joins — never all-pairs — then verifies
    exact Hamming on the 32-bit halves. Guaranteed pairs: each doc's
    two renditions (upscale invariance is closed-form, see oracle
    comment) plus natural cross-doc hash collisions; the oracle states
    all of them from the same bit formula as q105."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from .imagex import encode_png, resize_nearest
    from .operators.dedup import dhash_near_pairs
    from .operators.multimodal import image_dhash

    import numpy as np

    _xs = np.arange(18, dtype=np.int64)
    _ys = np.arange(16, dtype=np.int64)

    def _png_batch(media_id):
        out = []
        for mid in media_id:
            d, m = divmod(int(mid), 2)
            a, b = 17 + d % 97, 5 + d % 31
            px = (
                (np.add.outer(_ys * b, _xs * a) % 256)
                .astype(np.uint8)
                .tobytes()
            )
            if m:
                out.append(
                    encode_png(
                        resize_nearest(px, 18, 16, 1, 36, 32), 36, 32, 1
                    )
                )
            else:
                out.append(encode_png(px, 18, 16, 1))
        return pd.Series(out)

    png_udf = pandas_udf(_png_batch, BinaryType())
    media = (
        _read(spark, sf_dir, "documents")
        .select(
            F.explode(F.array(F.lit(0), F.lit(1))).alias("m"), "doc_id"
        )
        .select((F.col("doc_id") * 2 + F.col("m")).alias("media_id"))
        .select("media_id", png_udf(F.col("media_id")).alias("payload"))
    )
    # the fingerprint table feeds BOTH sides of the banding self-join —
    # persist it so the image encode/decode/dHash Arrow pipeline runs
    # once, not once per side (at corpus scale you materialize exactly
    # this index: id + 16 hex chars per image)
    hashes = (
        image_dhash(media, payload_col="payload")
        .select("media_id", "dhash")
        .persist()
    )
    return dhash_near_pairs(hashes, max_hamming=2)


@q(
    "q108_ccnet_per_lang",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    big AS (
      SELECT doc_id, lang, l[i] AS w1, l[i + 1] AS w2
      FROM (SELECT doc_id, lang, l, unnest(range(1, len(l))) AS i
            FROM toks)
    ),
    uni AS (SELECT doc_id, lang, unnest(l) AS w FROM toks),
    c1 AS (
      SELECT lang, w AS w1, CAST(count(*) AS BIGINT) AS c1
      FROM uni GROUP BY lang, w
    ),
    c12 AS (
      SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM big GROUP BY lang, w1, w2
    ),
    v AS (SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS vsz
          FROM uni GROUP BY lang),
    scored AS (
      SELECT b.doc_id, b.lang, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(floor(1e6 * (ln(coalesce(c12, 0) + 1)
                                        - ln(coalesce(c1, 0) + vsz)))
                           AS BIGINT)) AS BIGINT) AS lm_logprob_micros
      FROM big b
      LEFT JOIN c12 USING (lang, w1, w2)
      LEFT JOIN c1 USING (lang, w1)
      JOIN v USING (lang)
      GROUP BY b.doc_id, b.lang
    ),
    a AS (
      SELECT doc_id, lang, n_bigrams, lm_logprob_micros,
             CAST(lm_logprob_micros AS DOUBLE)
               / CAST(n_bigrams AS DOUBLE) AS ar
      FROM scored
    ),
    th AS (
      SELECT lang, quantile_disc(ar, 1.0 / 3.0) AS t_lo,
             quantile_disc(ar, 2.0 / 3.0) AS t_hi
      FROM a GROUP BY lang
    )
    SELECT a.doc_id, a.lang, n_bigrams, lm_logprob_micros,
           round(ar, 6) AS avg_logprob,
           CAST(CASE WHEN ar > t_hi THEN 1
                     WHEN ar > t_lo THEN 2 ELSE 3 END AS BIGINT)
             AS ppl_bucket,
           CASE WHEN ar > t_hi THEN 'head'
                WHEN ar > t_lo THEN 'middle' ELSE 'tail' END
             AS bucket_label
    FROM a JOIN th USING (lang)
    """,
)
def q108_ccnet_per_lang(spark, sf_dir):
    """CCNet at its TRUE granularity (operators/lm.py
    bigram_lm_score_grouped + perplexity_buckets(group_col) — Wenzek et
    al. 2020 train one LM per language and bucket per language): each
    language's bigram LM is fit on that language's documents
    (self-perplexity), every doc scores against its own language's
    model, and head/middle/tail cut points are per-language
    percentile_approx sketches broadcast back. No window, no global
    sort anywhere; count tables carry the lang key through the same
    joins as q73, and the threshold dim is |languages| rows."""
    from .operators.lm import bigram_lm_score_grouped, perplexity_buckets

    docs = _read(spark, sf_dir, "documents")
    return perplexity_buckets(
        bigram_lm_score_grouped(docs, group_col="lang"),
        group_col="lang",
    )


# words chosen to dodge every stopword profile list so the injected
# payload tokenizes identically for every lang — cross-run duplicates
# then match regardless of the doc's language tag
_Q106_PAYLOAD = (
    "shared corpus payload repeated across runs with plenty distinct "
    "words to shingle hash deterministically"
)

# the full MinHash band chain from _MINHASH_CTES, fed by an injected
# corpus: docs with doc_id % 10 = 0 share _Q106_PAYLOAD, so run 2
# (doc_id % 3 = 0) provably contains cross-run duplicates of run 1.
# Substitution order matters: retarget base's FROM first (single
# occurrence), then prepend the inj CTE.
_Q106_CTES = _MINHASH_CTES.replace("FROM documents", "FROM inj").replace(
    "WITH base AS (",
    "WITH inj AS (\n"
    "  SELECT doc_id, source, lang,\n"
    f"         CASE WHEN doc_id % 10 = 0 THEN '{_Q106_PAYLOAD}'\n"
    "              ELSE text END AS text\n"
    "  FROM documents\n"
    "), base AS (",
)


@q(
    "q106_incremental_dedup",
    _Q106_CTES
    + """
    , idx AS (SELECT doc_id, band, band_key FROM bands
              WHERE doc_id % 3 <> 0)
    , newb AS (SELECT doc_id, band, band_key FROM bands
               WHERE doc_id % 3 = 0)
    , hits AS (SELECT n.doc_id, min(i.doc_id) AS matched_old_id
               FROM newb n
               JOIN idx i ON i.band = n.band AND i.band_key = n.band_key
               GROUP BY n.doc_id)
    SELECT nd.doc_id,
           h.matched_old_id IS NOT NULL AS is_dup,
           h.matched_old_id
    FROM (SELECT DISTINCT doc_id FROM newb) nd
    LEFT JOIN hits h USING (doc_id)
    """,
)
def q106_incremental_dedup(spark, sf_dir):
    """Incremental cross-run dedup (operators/dedup.py
    dedup_against_index; VERDICT r3 #4 — the RefinedWeb/FineWeb
    production shape): run 1 (doc_id % 3 <> 0) persists its MinHash
    band index; run 2 (doc_id % 3 = 0) is deduped by ONE equi-join of
    its bands against that index — run-1 text is never re-read (pinned
    by a parquet-plan test in tests/test_dedup_similarity.py). The
    injected shared payload (doc_id % 10 = 0) guarantees cross-run
    duplicates; the oracle computes both runs' bands closed-form with
    the same md5 double-hash family and states the verdict per new
    doc."""
    from .operators.dedup import (
        char_shingles,
        dedup_against_index,
        lsh_bands,
        minhash_signatures,
    )

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.when(F.col("doc_id") % 10 == 0, F.lit(_Q106_PAYLOAD))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t = with_tokens(d).select(
        "doc_id", F.concat_ws(" ", "tokens").alias("tok_str")
    )
    bands = lsh_bands(
        minhash_signatures(
            char_shingles(t, text_col="tok_str", k=12), n_hashes=12
        ),
        rows_per_band=3,
    )
    idx = bands.filter(F.col("doc_id") % 3 != 0)
    newb = bands.filter(F.col("doc_id") % 3 == 0)
    return dedup_against_index(newb, idx)


@q(
    "q109_bloom_decontaminate",
    """
    WITH corpus AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS t
      FROM documents
    ), bench AS (SELECT * FROM corpus WHERE doc_id % 100 = 3),
    cg AS (
      SELECT DISTINCT doc_id AS corpus_id,
             array_to_string(t[i:i+12], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 11)) AS i
            FROM corpus WHERE len(t) >= 13)
    ), bg AS (
      SELECT DISTINCT doc_id AS benchmark_id,
             array_to_string(t[i:i+12], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 11)) AS i
            FROM bench WHERE len(t) >= 13)
    )
    SELECT corpus_id, benchmark_id, count(*) AS n_shared
    FROM cg JOIN bg USING (g)
    GROUP BY corpus_id, benchmark_id
    """,
)
def q109_bloom_decontaminate(spark, sf_dir):
    """q57's 13-gram decontamination with a Bloom pre-filter on the
    corpus side (operators/bloom.py): the benchmark's gram set becomes
    a broadcast BITMAP and non-candidate corpus grams are dropped
    map-side BEFORE the corpus distinct() shuffle — the 100-TB shape
    when the index is too large to broadcast as rows. The exact verify
    join removes Bloom false positives, so the oracle is q57's exact
    closed form, unchanged — same rows, same hashes."""
    from .operators.bloom import bloom_decontaminate

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.filter(
                F.split("text", " "), lambda w: F.length(w) > 0
            ),
        ).alias("tokens_str"),
    )
    bench = d.filter(F.col("doc_id") % 100 == 3)
    return bloom_decontaminate(d, bench, n=13)


@q(
    "q110_split_assign",
    """
    SELECT doc_id, source,
           ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
             ::BIGINT % 1000000 AS split_bucket,
           CASE
             WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 1000000 < 980000
               THEN 'train'
             WHEN ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 1000000 < 990000
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q110_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (operators/mixing.py
    split_assign): salted md5-bucket of the stable doc key cut into
    contiguous ranges — a narrow no-shuffle projection whose membership
    survives re-sharding, re-ordering, and incremental corpus growth.
    The oracle states the same salted bucket arithmetic closed-form."""
    from .operators.mixing import split_assign

    d = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return split_assign(d, key_col="doc_id", salt="split",
                        train_micros=980_000, val_micros=10_000)


@q(
    "q111_script_profile",
    """
    WITH base AS (
      SELECT doc_id,
             text || ' ' ||
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'привет мир'
               WHEN 1 THEN 'γειά σου κόσμε'
               WHEN 2 THEN '你好世界'
               ELSE 'مرحبا بالعالم'
             END || ' 2026' AS t0
      FROM documents
    ), stripped AS (
      SELECT doc_id, regexp_replace(t0, '\\s', '', 'g') AS t FROM base
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars,
           (length(t) - length(regexp_replace(t, '\\p{Latin}', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS latin_micros,
           (length(t) - length(regexp_replace(t, '\\p{Cyrillic}', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS cyrillic_micros,
           (length(t) - length(regexp_replace(t, '\\p{Greek}', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS greek_micros,
           (length(t) - length(regexp_replace(t, '\\p{Han}', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS han_micros,
           (length(t) - length(regexp_replace(t, '\\p{Arabic}', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS arabic_micros,
           (length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))
             * 1000000 // greatest(length(t), 1) AS digit_micros
    FROM stripped
    """,
)
def q111_script_profile(spark, sf_dir):
    """Unicode script mix per document (operators/textstats.py
    script_profile): integer-micros fractions of Latin / Cyrillic /
    Greek / Han / Arabic / digit characters — pure per-row JVM regex
    codegen, no shuffle. A non-Latin snippet is injected per doc_id%4
    so every script class is provably exercised; the oracle computes
    the identical arithmetic with RE2's \\p{Script} classes (Java
    spells them \\p{IsScript} — same Unicode tables)."""
    from .operators.textstats import script_profile

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "),
            F.when(F.col("doc_id") % 4 == 0, F.lit("привет мир"))
            .when(F.col("doc_id") % 4 == 1, F.lit("γειά σου κόσμε"))
            .when(F.col("doc_id") % 4 == 2, F.lit("你好世界"))
            .otherwise(F.lit("مرحبا بالعالم")),
            F.lit(" 2026"),
        ).alias("text"),
    )
    return script_profile(d)


def _kmeans_oracle_sql(k: int = 4, iters: int = 2,
                       src: str = "embeddings",
                       prefix: str = "") -> str:
    """Closed-form DuckDB SQL for kmeans_assign: md5-rank seeds, then
    ``iters`` Lloyd rounds (argmin assignment + truncating-integer-mean
    update) in exact integer-micros arithmetic, then the final
    assignment. Generated because the rounds are mechanical CTE
    repetitions; the emitted SQL is static per (k, iters). ``src`` lets
    callers train over a derived (vec_id, embedding) relation — q115's
    SemDeDup oracle injects the corpus-plus-synthesized-duplicates
    union here. ``prefix`` renames every CTE so several independent
    chains can share one WITH clause — q121's product quantizer trains
    one chain per subspace."""
    p = prefix

    def assign(src_cents, tag):
        return f"""
    {p}a{tag}p AS (
      SELECT b.vec_id, b.v, s.cid,
             CAST(list_sum(list_transform(range(1, len(b.v) + 1),
                  i -> (b.v[i] - s.c[i]) * (b.v[i] - s.c[i])))
                  AS BIGINT) AS d2
      FROM {p}base b CROSS JOIN {src_cents} s
    ),
    {p}a{tag} AS (
      SELECT vec_id, v, cid, d2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cid) AS rn
        FROM {p}a{tag}p) WHERE rn = 1
    )"""

    def update(tag):
        return f"""
    {p}c{tag} AS (
      SELECT cid, list(sm ORDER BY pos) AS c FROM (
        SELECT cid, pos,
               CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS sm
        FROM (SELECT cid, i AS pos, v[i] AS x
              FROM (SELECT cid, v, unnest(range(1, len(v) + 1)) AS i
                    FROM {p}a{tag}))
        GROUP BY cid, pos) GROUP BY cid
    )"""

    ctes = [f"""
    {p}base AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                      AS BIGINT)) AS v
      FROM {src}
    ),
    {p}c0 AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                vec_id) - 1 AS cid, v AS c
      FROM {p}base
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    )"""]
    cents = f"{p}c0"
    for r in range(1, iters + 1):
        ctes.append(assign(cents, str(r)))
        ctes.append(update(str(r)))
        cents = f"{p}c{r}"
    ctes.append(assign(cents, "f"))
    return "WITH " + ",".join(ctes), cents


def _kmeans_assign_oracle(k: int = 4, iters: int = 2) -> str:
    ctes, _ = _kmeans_oracle_sql(k=k, iters=iters)
    return ctes + "\n    SELECT vec_id, cid, d2 AS dist2 FROM af"


def _ivf_trained_oracle(k_cells: int = 4, iters: int = 2,
                        query_ids=(1, 2, 3, 5, 8), n_probe: int = 2,
                        topk: int = 5) -> str:
    """Trained-IVF search replayed closed-form on top of the k-means
    CTEs: probe = n_probe nearest trained cells per query, candidates =
    cell equi-join against the final assignment, rank by exact integer
    squared-L2 (ties on neighbor_id)."""
    ctes, cents = _kmeans_oracle_sql(k=k_cells, iters=iters)
    ids = ", ".join(str(i) for i in query_ids)
    return ctes + f""",
    qv AS (SELECT vec_id AS query_id, v AS qv FROM base
           WHERE vec_id IN ({ids})),
    qc AS (
      SELECT query_id, qv, s.cid,
             CAST(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> (qv[i] - s.c[i]) * (qv[i] - s.c[i])))
                  AS BIGINT) AS cd2
      FROM qv CROSS JOIN {cents} s
    ),
    probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cd2, cid) AS rn
        FROM qc) WHERE rn <= {n_probe}
    ),
    cands AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, len(p.qv) + 1),
                  i -> (p.qv[i] - a.v[i]) * (p.qv[i] - a.v[i])))
                  AS BIGINT) AS dist2
      FROM probes p JOIN af a USING (cid)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, rank, dist2 FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist2, neighbor_id) AS rank
      FROM cands) WHERE rank <= {topk}
    """


@q("q112_kmeans_assign", _kmeans_assign_oracle(k=4, iters=2))
def q112_kmeans_assign(spark, sf_dir):
    """IVF coarse-quantizer training (operators/kmeans.py): 2 Lloyd
    rounds from md5-rank seeds over integer-micros vectors, then the
    final argmin assignment. Assignment is a zero-shuffle broadcast
    map (array_min over a packed centroid row); each update is one
    partial-agg shuffle of k×d sums. Engine-exact: the oracle replays
    both rounds closed-form in the same integer arithmetic."""
    from .operators.kmeans import kmeans_assign

    emb = _read(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=4, iters=2)


@q("q113_ann_ivf_trained", _ivf_trained_oracle())
def q113_ann_ivf_trained(spark, sf_dir):
    """IVF ANN over a TRAINED coarse quantizer (operators/kmeans.py
    ann_ivf_trained_topk): q112's deterministic Lloyd training feeds the
    cell index; queries probe their 2 nearest cells and candidates come
    from the cell equi-join — never all-pairs. Unlike q45's MLlib twin,
    the ENTIRE pipeline (training included) is replayed closed-form by
    the oracle in exact integer-micros arithmetic."""
    from .operators.kmeans import ann_ivf_trained_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ann_ivf_trained_topk(emb, query_ids=[1, 2, 3, 5, 8], k=5,
                                n_cells=4, iters=2, n_probe=2)


@q(
    "q114_bm25_topk",
    """
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS t
      FROM documents
    ), totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(len(t)) AS BIGINT) AS sumdl
      FROM base
    ), hits AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
             unnest(list_filter(t, w -> w IN ('dup', 'join', 'window')))
               AS term
      FROM base
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
             min(dl) AS dl
      FROM hits GROUP BY doc_id, term
    ), dft AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM hits GROUP BY term
    ), contrib AS (
      SELECT doc_id, dl,
             CAST(floor(1e6 * (
               ln((n - df + 0.5) / (df + 0.5) + 1.0)
               * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75
                    * (CAST(dl AS DOUBLE)
                       / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             )) AS BIGINT) AS c
      FROM tf JOIN dft USING (term), totals
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micros,
           CAST(count(*) AS BIGINT) AS n_terms_hit, min(dl) AS dl
    FROM contrib GROUP BY doc_id
    ORDER BY score_micros DESC, doc_id LIMIT 20
    """,
)
def q114_bm25_topk(spark, sf_dir):
    """Okapi BM25 ranked retrieval (operators/retrieval.py) for the
    3-term query (dup, join, window) — 'dup' is ~35× rarer than 'join'
    in the synthetic vocabulary, so the idf spread is real. Tokens are
    filtered to the query terms before the explode (hit stream ≪ token
    stream); corpus stats and DF are broadcast 1-row / |terms|-row
    dims; top-k plans as TakeOrderedAndProject, never a global sort.
    Per-(doc,term) contributions quantized to integer micros (the q72
    LLR idiom) so the BIGINT per-doc sum is aggregation-order-free."""
    from .operators.retrieval import bm25_topk

    docs = _read(spark, sf_dir, "documents")
    return bm25_topk(docs, ["dup", "join", "window"], topk=20)


def _semdedup_oracle(k: int = 8, iters: int = 2, tau: float = 0.99) -> str:
    """SemDeDup replayed closed-form: the k-means CTEs run over the
    corpus ∪ synthesized duplicates union, then within-cluster pairs,
    IEEE-exact cosine (BIGINT dot/norms over integer micros, then three
    correctly-rounded double ops), keep-min-id verdicts."""
    src = """(SELECT vec_id, list_transform(embedding,
                       x -> CAST(x AS DOUBLE)) AS embedding
              FROM embeddings
              UNION ALL
              SELECT vec_id + 10000 AS vec_id,
                     list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * 1.001) AS embedding
              FROM embeddings WHERE vec_id < 50)"""
    ctes, _ = _kmeans_oracle_sql(k=k, iters=iters, src=src)
    return ctes + f""",
    pr AS (
      SELECT b.vec_id AS b_id,
             CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                  i -> a.v[i] * b.v[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                  i -> a.v[i] * a.v[i])) AS BIGINT) AS n2a,
             CAST(list_sum(list_transform(range(1, len(b.v) + 1),
                  i -> b.v[i] * b.v[i])) AS BIGINT) AS n2b
      FROM af a JOIN af b USING (cid) WHERE a.vec_id < b.vec_id
    ),
    dp AS (
      SELECT b_id, CAST(dot AS DOUBLE)
                     / (sqrt(CAST(n2a AS DOUBLE))
                        * sqrt(CAST(n2b AS DOUBLE))) AS cos
      FROM pr
      WHERE CAST(dot AS DOUBLE)
              / (sqrt(CAST(n2a AS DOUBLE))
                 * sqrt(CAST(n2b AS DOUBLE))) >= {tau}
    ),
    w AS (
      SELECT b_id, CAST(count(*) AS BIGINT) AS n_dup_smaller,
             CAST(floor(1e6 * max(cos)) AS BIGINT) AS max_cos_micros
      FROM dp GROUP BY b_id
    )
    SELECT af.vec_id, af.cid, (w.b_id IS NULL) AS keep,
           coalesce(w.n_dup_smaller, CAST(0 AS BIGINT)) AS n_dup_smaller,
           w.max_cos_micros
    FROM af LEFT JOIN w ON af.vec_id = w.b_id
    """


@q("q115_semdedup", _semdedup_oracle(k=8, iters=2, tau=0.99))
def q115_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023; operators/semdedup.py): deterministic
    Lloyd k-means confines candidate pairs to clusters (the equi-join on
    cid IS the scale bound — production picks k ≈ √n), cosine is exact
    integer-micros arithmetic plus three IEEE-rounded double ops, and
    keep-min-id drops every vector with a smaller near-identical
    neighbor. 50 synthesized duplicates (v×1.001 at vec_id+10000) make
    the detector provably fire; the oracle replays the ENTIRE pipeline —
    training included — closed-form."""
    from .operators.semdedup import semdedup

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    dups = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    allv = emb.unionByName(dups)
    return semdedup(allv, k=8, iters=2, tau=0.99)


@q(
    "q116_chunk_documents",
    """
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS t
      FROM documents
    ), b2 AS (
      SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
             1 + CAST(floor((greatest(0, CAST(len(t) AS BIGINT) - 32)
                             + 23) / 24.0) AS BIGINT) AS nc
      FROM base WHERE len(t) > 0
    ), e AS (
      SELECT doc_id, t, n, unnest(range(0, nc)) AS ci FROM b2
    )
    SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
           CAST(1 + ci * 24 AS BIGINT) AS start_token,
           CAST(least(32, n - ci * 24) AS BIGINT) AS n_tokens,
           array_to_string(
             t[CAST(1 + ci * 24 AS BIGINT)
               :CAST(ci * 24 + least(32, n - ci * 24) AS BIGINT)],
             ' ') AS chunk_text
    FROM e
    """,
)
def q116_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunks (operators/chunking.py) — RAG /
    embedding prep: 32-token chunks, stride 24 (8-token overlap).
    Map-only plan: tokenize + slice + explode inside one codegen
    Project, zero Exchange (the extraction-stage scale shape). The
    oracle replays chunk boundaries closed-form with DuckDB list
    slicing."""
    from .operators.chunking import chunk_documents

    return chunk_documents(
        _read(spark, sf_dir, "documents"), chunk=32, stride=24
    )


@q(
    "q117_pack_sequences",
    """
    WITH base AS (
      SELECT doc_id, source AS "group",
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT)
               AS n_tokens
      FROM documents
    ), o AS (
      SELECT doc_id, "group", n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY "group" ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS stream_offset
      FROM base WHERE n_tokens > 0
    )
    SELECT doc_id, "group", n_tokens, stream_offset,
           CAST(floor(stream_offset / 256.0) AS BIGINT) AS start_seq,
           CAST(floor((stream_offset + n_tokens - 1) / 256.0) AS BIGINT)
             AS end_seq,
           CAST(floor((stream_offset + n_tokens - 1) / 256.0)
                - floor(stream_offset / 256.0) + 1 AS BIGINT)
             AS n_seqs_spanned,
           stream_offset % 256 AS offset_in_seq
    FROM o
    """,
)
def q117_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing (operators/chunking.py): per-source
    token streams cut into 256-token training sequences; each doc
    reports its stream offset and the sequence span it lands in. The
    cumulative sum is a window partitioned by source — never a global
    unpartitioned window (the q84 lesson); one hash Exchange on the
    group key, per-partition sorts only."""
    from .operators.chunking import pack_sequences

    return pack_sequences(
        _read(spark, sf_dir, "documents"), ctx=256, group_col="source"
    )


@q(
    "q118_bpe_pair_counts",
    """
    WITH v AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> length(x) > 0)) AS w
            FROM documents)
      GROUP BY 1
    ), pos AS (
      SELECT word, freq, unnest(range(1, length(word))) AS i
      FROM v WHERE length(word) > 1
    ), p AS (
      SELECT substring(word, CAST(i AS INT), 2) AS pair, word, freq
      FROM pos
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM p GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 30
    """,
)
def q118_bpe_pair_counts(spark, sf_dir):
    """BPE tokenizer-training primitive (operators/bpe.py): corpus-
    weighted adjacent character-pair counts. One corpus-sized shuffle
    (the word-frequency groupBy, map-side combined); the pair explode
    runs over the |V|-row vocabulary table only; top-k plans as
    TakeOrderedAndProject."""
    from .operators.bpe import bpe_pair_counts

    return bpe_pair_counts(_read(spark, sf_dir, "documents"), topk=30)


@q(
    "q119_inverted_index",
    """
    WITH h AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          w -> length(w) > 0)) AS term
        FROM documents)
    ), g AS (
      SELECT term, CAST(floor(doc_id / 100.0) AS BIGINT) AS block,
             list(doc_id ORDER BY doc_id) AS postings
      FROM h GROUP BY 1, 2
    )
    SELECT term, block, CAST(len(postings) AS BIGINT) AS df_block,
           postings,
           list_transform(range(1, len(postings) + 1),
             i -> postings[i]
                  - CASE WHEN i = 1 THEN 0 ELSE postings[i - 1] END)
             AS gaps
    FROM g
    """,
)
def q119_inverted_index(spark, sf_dir):
    """Blocked inverted index with gap-encoded postings
    (operators/retrieval.py:inverted_index): posting lists sharded by
    doc-id range so hot terms never funnel into one reducer; deltas in
    the compressor-ready form. Two keyed shuffles, no window."""
    from .operators.retrieval import inverted_index

    return inverted_index(
        _read(spark, sf_dir, "documents"), block_size=100
    )


@q(
    "q120_stream_stream_join",
    """
    WITH d AS (SELECT doc_id, doc_id % 3 AS h FROM documents
               WHERE doc_id % 2 = 0)
    SELECT doc_id,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + h * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS fetch_ts,
           strftime(TIMESTAMP '2026-01-01 00:00:00'
                    + h * INTERVAL 1 HOUR + 10 * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS score_ts,
           CAST(10 AS BIGINT) AS lag_min,
           CAST(doc_id % 7 AS BIGINT) AS score
    FROM d
    """,
)
def q120_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join (streaming/stream_extract
    .stream_stream_join), driver-checked: a fetch stream meets an
    asynchronous quality-score stream; the time-range predicate
    (score within 1 hour of the fetch) bounds join state AND the
    result. Fixture: even doc_ids are scored 10 minutes after fetch
    (inside the bound → join), odd ones 90 minutes after (outside →
    dropped by construction), so the joined set is closed-form.
    Append-mode AvailableNow drain to a memory sink."""
    import tempfile
    import uuid

    from .streaming.stream_extract import stream_stream_join

    base = "timestamp'2026-01-01 00:00:00'"
    d = _read(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.expr(f"{base} + (doc_id % 3) * INTERVAL 1 HOUR").alias(
            "fetch_ts"
        ),
    )
    annots = d.select(
        "doc_id",
        F.expr(
            f"{base} + (doc_id % 3) * INTERVAL 1 HOUR"
            " + (CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 90 END)"
            " * INTERVAL 1 MINUTE"
        ).alias("score_ts"),
        (F.col("doc_id") % 7).cast("long").alias("score"),
    )
    qname = "q120mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        pages.write.mode("overwrite").parquet(f"{root}/pages")
        annots.write.mode("overwrite").parquet(f"{root}/annots")
        j = stream_stream_join(
            spark, f"{root}/pages", f"{root}/annots", max_lag="1 hour"
        )
        qry = (
            j.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("stream-stream-join drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


def _pq_oracle(m: int = 4, k: int = 4, iters: int = 1,
               dim: int = 64) -> str:
    """Product quantization replayed closed-form: one prefixed k-means
    CTE chain per subspace (each trained over its slice of the
    embedding), then the per-subspace argmin codes and summed exact
    quantization error joined on vec_id."""
    sub = dim // m
    chains = []
    for s in range(m):
        src = (
            f"(SELECT vec_id, embedding[{s * sub + 1}:{(s + 1) * sub}]"
            " AS embedding FROM embeddings)"
        )
        ctes, _ = _kmeans_oracle_sql(
            k=k, iters=iters, src=src, prefix=f"p{s}"
        )
        chains.append(ctes if s == 0 else ctes[len("WITH "):])
    codes = ", ".join(f"s{s}.cid" for s in range(m))
    err = " + ".join(f"s{s}.d2" for s in range(m))
    joins = " ".join(
        f"JOIN p{s}af s{s} USING (vec_id)" for s in range(1, m)
    )
    return ",".join(chains) + f"""
    SELECT s0.vec_id, [{codes}] AS codes,
           CAST({err} AS BIGINT) AS recon_err
    FROM p0af s0 {joins}
    """


@q("q121_pq_codes", _pq_oracle(m=4, k=4, iters=1, dim=64))
def q121_pq_codes(spark, sf_dir):
    """Product-quantization codes (operators/kmeans.py:pq_codes): the
    64-dim embedding splits into 4 subvectors, each with its own
    deterministic-Lloyd 4-centroid codebook; the vector compresses to
    4 code ids plus an exact integer reconstruction error. Training is
    the q112 zero-shuffle-assignment machinery per slice; the pivot
    back to one row per vector is a single groupBy(vec_id) over slim
    (vec_id, sub, cid) rows — never m self-joins. The oracle replays
    all four trainings closed-form in one WITH clause."""
    from .operators.kmeans import pq_codes

    return pq_codes(
        _read(spark, sf_dir, "embeddings"), m=4, k=4, iters=1
    )


@q(
    "q122_train_classifier",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 200 THEN 1 ELSE -1 END AS y,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    f AS (
      SELECT doc_id, y, b, CAST(count(*) AS BIGINT) AS x
      FROM (SELECT doc_id, y,
                   unnest(list_transform(l, w ->
                     ('0x' || substr(md5(w), 1, 8))::BIGINT % 64)) AS b
            FROM toks)
      GROUP BY 1, 2, 3
    ),
    d1 AS (
      SELECT b, CAST(sum(y * x) AS BIGINT) AS dw
      FROM f WHERE y = 1 GROUP BY b
    ),
    w1 AS (
      SELECT b, CAST(coalesce(dw, 0) AS BIGINT) AS w
      FROM (SELECT DISTINCT b FROM f) LEFT JOIN d1 USING (b)
    ),
    m2 AS (
      SELECT doc_id, y, CAST(sum(x * w) AS BIGINT) AS margin
      FROM f JOIN w1 USING (b) GROUP BY 1, 2
    ),
    mis2 AS (
      SELECT doc_id FROM m2
      WHERE (CASE WHEN margin > 0 THEN 1 ELSE -1 END) <> y
    ),
    d2 AS (
      SELECT b, CAST(sum(y * x) AS BIGINT) AS dw
      FROM f JOIN mis2 USING (doc_id) GROUP BY b
    )
    SELECT w1.b AS bucket, CAST(w1.w + coalesce(d2.dw, 0) AS BIGINT)
             AS weight
    FROM w1 LEFT JOIN d2 ON w1.b = d2.b
    """,
)
def q122_train_classifier(spark, sf_dir):
    """Full-batch perceptron training for the hashed linear classifier
    (operators/classifier.py:train_hashed_classifier) — distills a
    rule-based curation prior (label = +1 iff n_chars >= 200) into a
    64-bucket fastText-style model. Round 1 from zero weights reduces
    to the positive-class feature sum; round 2 is a genuine
    misclassified-set update — the oracle replays both rounds in exact
    integer arithmetic. Features built once (one corpus shuffle,
    persisted); each round = two keyed shuffles of slim feature rows +
    a broadcast K-row weight table; no actions in the loop."""
    from .operators.classifier import train_hashed_classifier

    d = _read(spark, sf_dir, "documents")
    return train_hashed_classifier(
        d,
        label=F.when(F.col("n_chars") >= 200, F.lit(1)).otherwise(
            F.lit(-1)
        ),
        n_buckets=64,
        rounds=2,
    )


def _hll_register_cte(p: int = 6, where: str = "") -> str:
    """Shared CTEs: token keys → (register, max_rho) — the exact HLL
    sketch replay. bits(rem) is the static sum of power-of-two
    comparisons, the same expression shape the Spark operator uses.
    ``where`` optionally restricts the document shard (q166's
    cross-shard merge proof)."""
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    return f"""
    k AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS key
      FROM documents {where}
    ),
    h AS (
      SELECT ('0x' || substr(md5(key), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(key), 9, 8))::BIGINT AS lo
      FROM k
    ),
    r AS (
      SELECT CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             (hi % {div}) * 4294967296 + lo AS rem
      FROM h
    ),
    sk AS (
      SELECT register,
             CAST(max({width} - ({bits}) + 1) AS BIGINT) AS max_rho
      FROM r GROUP BY register
    )"""


@q(
    "q123_hll_registers",
    "WITH" + _hll_register_cte(p=6) + """
    SELECT register, max_rho FROM sk
    """,
)
def q123_hll_registers(spark, sf_dir):
    """HyperLogLog register table (operators/sketches.py): the exact
    integer sketch of the corpus' distinct-token cardinality — 2^6
    registers, md5-derived 64-bit hash, leading-zero rho via static
    power-of-two comparisons (no float log anywhere). One map-combined
    m-row groupBy above a narrow hash projection; sketches union across
    shards by element-wise max (hll_merge). The oracle replays the hash
    split, register extraction, and rho bit-math identically."""
    from .operators.sketches import hll_registers

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key")
    )
    return hll_registers(toks, "key", p=6)


def _hll_estimate_oracle(p: int = 6) -> str:
    from .operators.sketches import _alpha

    m = 1 << p
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)
    return "WITH" + _hll_register_cte(p=p) + f"""
    , a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_hi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_lo
      FROM sk
    )
    SELECT CAST({m} AS BIGINT) AS m, n_hit AS n_registers_hit,
           harmonic_hi, harmonic_lo,
           CAST(floor({num!r} / (CAST(harmonic_hi AS DOUBLE)
                       * 4294967296.0
                     + CAST(harmonic_lo AS DOUBLE)
                     + CAST({m} - n_hit AS DOUBLE)
                       * 2305843009213693952.0)) AS BIGINT)
             AS estimate_micros
    FROM a
    """


@q("q124_hll_estimate", _hll_estimate_oracle(p=6))
def q124_hll_estimate(spark, sf_dir):
    """Raw HLL cardinality estimate from q123's sketch: the harmonic
    sum stays an EXACT BIGINT in units of 2^-61 (empty registers enter
    only at the final division), so the single float division is the
    only IEEE op — micro-quantized and engine-identical. At 10^12 docs
    this one row replaces a corpus-sized distinct() shuffle."""
    from .operators.sketches import hll_estimate, hll_registers

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key")
    )
    return hll_estimate(hll_registers(toks, "key", p=6), p=6)


_CMS_CTES = """
    k AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS key
      FROM documents
    ),
    cms AS (
      SELECT CAST(r.row AS BIGINT) AS row,
             ('0x' || substr(md5(r.row || ':' || key), 1, 8))::BIGINT
               % 64 AS col,
             CAST(count(*) AS BIGINT) AS cnt
      FROM k, (VALUES (0), (1), (2), (3)) AS r(row)
      GROUP BY 1, 2
    )"""


@q(
    "q125_cms_build",
    "WITH" + _CMS_CTES + """
    SELECT row, col, cnt FROM cms
    """,
)
def q125_cms_build(spark, sf_dir):
    """Count-min sketch build (operators/sketches.py:cms_build): 4×64
    counters summarize the corpus token-frequency distribution — the
    heavy-hitter companion to q123's HLL. The d per-row cells ride one
    posexplode (no extra corpus shuffle); output is ONE map-combined
    groupBy of ≤ d·w rows; shards merge by cell-wise sum."""
    from .operators.sketches import cms_build

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key")
    )
    return cms_build(toks, "key", depth=4, width=64)


@q(
    "q126_cms_point_estimates",
    "WITH" + _CMS_CTES + """,
    p AS (SELECT DISTINCT key FROM k),
    w AS (
      SELECT key, CAST(r.row AS BIGINT) AS row,
             ('0x' || substr(md5(r.row || ':' || key), 1, 8))::BIGINT
               % 64 AS col
      FROM p, (VALUES (0), (1), (2), (3)) AS r(row)
    ),
    hit AS (
      SELECT key, coalesce(cnt, CAST(0 AS BIGINT)) AS c
      FROM w LEFT JOIN cms USING (row, col)
    )
    SELECT key, CAST(min(c) AS BIGINT) AS est_count
    FROM hit GROUP BY key
    """,
)
def q126_cms_point_estimates(spark, sf_dir):
    """Count-min point queries over the whole vocabulary
    (operators/sketches.py:cms_point_estimates): min over each row's
    counter at the key's column — never an underestimate, collisions
    bound the overestimate. The probe set is a dim against the
    d·w-row sketch; nothing corpus-sized moves."""
    from .operators.sketches import cms_build, cms_point_estimates

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key")
    )
    cms = cms_build(toks, "key", depth=4, width=64)
    probes = toks.distinct()
    return cms_point_estimates(cms, probes, "key", depth=4, width=64)


@q(
    "q127_hits_scores",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    h0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS s
           FROM documents),
    ar1 AS (SELECT dst, CAST(sum(s) AS BIGINT) AS raw
            FROM e JOIN h0 ON e.src = h0.node GROUP BY dst),
    am1 AS (SELECT greatest(max(raw), 1) AS mx FROM ar1),
    a1 AS (SELECT d.doc_id AS node,
                  CAST((coalesce(raw, 0) * 1000000) // mx AS BIGINT) AS s
           FROM documents d LEFT JOIN ar1 ON d.doc_id = ar1.dst, am1),
    hr1 AS (SELECT src, CAST(sum(s) AS BIGINT) AS raw
            FROM e JOIN a1 ON e.dst = a1.node GROUP BY src),
    hm1 AS (SELECT greatest(max(raw), 1) AS mx FROM hr1),
    h1 AS (SELECT d.doc_id AS node,
                  CAST((coalesce(raw, 0) * 1000000) // mx AS BIGINT) AS s
           FROM documents d LEFT JOIN hr1 ON d.doc_id = hr1.src, hm1),
    ar2 AS (SELECT dst, CAST(sum(s) AS BIGINT) AS raw
            FROM e JOIN h1 ON e.src = h1.node GROUP BY dst),
    am2 AS (SELECT greatest(max(raw), 1) AS mx FROM ar2),
    a2 AS (SELECT d.doc_id AS node,
                  CAST((coalesce(raw, 0) * 1000000) // mx AS BIGINT) AS s
           FROM documents d LEFT JOIN ar2 ON d.doc_id = ar2.dst, am2),
    hr2 AS (SELECT src, CAST(sum(s) AS BIGINT) AS raw
            FROM e JOIN a2 ON e.dst = a2.node GROUP BY src),
    hm2 AS (SELECT greatest(max(raw), 1) AS mx FROM hr2),
    h2 AS (SELECT d.doc_id AS node,
                  CAST((coalesce(raw, 0) * 1000000) // mx AS BIGINT) AS s
           FROM documents d LEFT JOIN hr2 ON d.doc_id = hr2.src, hm2)
    SELECT a2.node, a2.s AS auth_micros, h2.s AS hub_micros
    FROM a2 JOIN h2 ON a2.node = h2.node
    """,
)
def q127_hits_scores(spark, sf_dir):
    """HITS hubs/authorities (operators/linkgraph.py:hits_micros) over
    the q83 synthetic page graph (each page → (7·id+3)%N and
    (13·id+5)%N), 2 iterations. All-BIGINT mutual recursion with
    max-normalization, so the oracle unrolls the identical arithmetic —
    the frontier-prioritization complement of PageRank (hub pages find
    new content; authority pages anchor quality signals). Two groupBys
    per round + 1-row broadcast maxima; no window, no global sort."""
    from .operators.linkgraph import hits_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return hits_micros(edges, n_iter=2, materialize=True)


@q(
    "q128_priority_sample",
    """
    WITH w AS (
      SELECT doc_id, source,
             CAST(length(list_filter(string_split(text, ' '),
                                     t -> length(t) > 0)) AS BIGINT)
               AS weight,
             CAST(('0x' || substr(md5('prio' || doc_id), 1, 8))::BIGINT
                  % 1000000 + 1 AS BIGINT) AS u_micros
      FROM documents
    ),
    p AS (
      SELECT *, CAST((weight * 1000000000000) // u_micros AS BIGINT)
               AS priority
      FROM w
    ),
    t1 AS (SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT 51),
    tau AS (SELECT CASE WHEN count(*) > 50 THEN min(priority)
                        ELSE 0 END AS tau FROM t1),
    s AS (SELECT * FROM t1 ORDER BY priority DESC, doc_id LIMIT 50)
    SELECT doc_id, source, weight, u_micros, priority,
           CAST(greatest(weight * 1000000, tau) AS BIGINT)
             AS est_weight_micros
    FROM s, tau
    """,
)
def q128_priority_sample(spark, sf_dir):
    """Weight-proportional exact-k sample with unbiased estimators
    (operators/mixing.py:priority_sample; Duffield-Lund-Thorup priority
    sampling, JACM 2007): k=50 docs weighted by token count. Priorities
    are BIGINT w·1e12 div u with deterministic md5 uniforms, winners via
    TakeOrderedAndProject (per-partition heaps, never a global sort),
    τ = the 51st priority broadcast from a 1-row aggregate. Σ
    est_weight over the sample unbiasedly estimates corpus tokens."""
    from .operators.mixing import priority_sample

    d = _read(spark, sf_dir, "documents")
    weighted = d.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
        ).cast("long").alias("weight"),
    )
    return priority_sample(weighted, "weight", k=50).select(
        "doc_id", "source", "weight", "u_micros", "priority",
        "est_weight_micros",
    )


@q(
    "q129_prefix_jaccard_join",
    """
    WITH g AS (
      SELECT DISTINCT doc_id, substr(text, i, 12) AS gram
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text) - 11, 1) + 1))
                     AS i
            FROM documents WHERE length(text) > 0)
    ),
    s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
    i AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_inter,
           CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
           CAST((n_inter * 1000000) // (sa.n + sb.n - n_inter)
                AS BIGINT) AS jaccard_micros
    FROM i JOIN s sa ON i.a_id = sa.doc_id
           JOIN s sb ON i.b_id = sb.doc_id
    WHERE n_inter * 1000000 >= 500000 * (sa.n + sb.n - n_inter)
    """,
)
def q129_prefix_jaccard_join(spark, sf_dir):
    """EXACT set-similarity self-join without MinHash
    (operators/dedup.py:prefix_jaccard_join; Bayardo All-Pairs WWW'07 /
    PPJoin): every doc pair with char-12-gram Jaccard ≥ 0.5. Prefix
    filtering under a rarest-first global token order makes candidate
    keys maximally skew-resistant (hot shingles never become join
    keys); completeness holds by the ceil-superadditive t/(1+t) prefix
    bound, all arithmetic BIGINT. The ORACLE verifies against the
    brute-force all-pairs join — the driver hash-matching proves the
    prefix filter dropped no qualifying pair on this corpus."""
    from .operators.dedup import char_shingles, prefix_jaccard_join

    # one-row-group scan = one task; spread rows before the heavy
    # row-local 12-gram shingling (all downstream aggs order-free)
    d = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = char_shingles(d, text_col="text", k=12)
    return prefix_jaccard_join(
        grams, threshold_micros=500_000, token_col="gram",
        materialize=True,
    )


@q(
    "q130_triangle_counts",
    """
    WITH n AS (SELECT count(*) AS N FROM documents),
    e AS (
      SELECT doc_id AS s, (doc_id + 1) % N AS d FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id + 2) % N FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id * 7 + 3) % N FROM documents, n
    ),
    und AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM e WHERE s <> d
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT unnest([x, y, z]) AS node FROM tri)
    GROUP BY node
    """,
)
def q130_triangle_counts(spark, sf_dir):
    """Per-node triangle counts over a synthesized host graph
    (operators/linkgraph.py:triangle_counts; Suri-Vassilvitskii
    degree-oriented wedges). Each page links to (id+1)%N, (id+2)%N and
    (7id+3)%N — the two ring families guarantee a dense triangle
    population. The ORACLE is the brute-force x<y<z 3-way self-join;
    the engine path never enumerates unoriented wedges: edges are
    oriented low→high under the (degree, node) total order so each
    triangle is produced exactly once from its lowest-order vertex,
    which is what bounds wedge inflation on celebrity nodes at corpus
    scale."""
    from .operators.linkgraph import triangle_counts

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = None
    for expr in (
        (F.col("doc_id") + 1) % F.col("N"),
        (F.col("doc_id") + 2) % F.col("N"),
        (F.col("doc_id") * 7 + 3) % F.col("N"),
    ):
        part = base.select(
            F.col("doc_id").alias("src"), expr.alias("dst")
        )
        edges = part if edges is None else edges.unionByName(part)
    return triangle_counts(edges)


@q(
    "q131_scd2_history",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    c AS (SELECT * FROM o WHERE prev IS NULL OR event_type <> prev)
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM c
    """,
)
def q131_scd2_history(spark, sf_dir):
    """Type-2 SCD history of each user's event_type runs
    (plans/snapshot.py:scd2_history): run-length collapse + lead()
    validity intervals, every window partitioned by the key — ONE hash
    Exchange total, reused by all three window steps (the
    answers-at-time-t companion to the reference's last-wins visited
    view, storage.py:65-80). Ties on (user_id, ts) break on event_id,
    so the history is replay-deterministic."""
    from .plans.snapshot import scd2_history

    ev = _read(spark, sf_dir, "events")
    return scd2_history(
        ev, ["user_id"], "event_type", ts_col="ts",
        tiebreak_col="event_id",
    )


@q(
    "q132_salted_skew_join",
    """
    WITH dim AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs,
             CAST(sum(n_chars) AS BIGINT) AS lang_chars
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.source, dim.lang_docs, dim.lang_chars
    FROM documents d JOIN dim USING (lang)
    """,
)
def q132_salted_skew_join(spark, sf_dir):
    """Hot-key-salted equi-join (operators/joins.py:salted_skew_join):
    documents joined to a per-lang dim where 'en' holds ~40% of all
    rows. Hot keys (count >= 150) are detected by a map-combined
    groupBy, big-side rows spread across 4 deterministic crc32 salt
    buckets, dim rows replicated per salt — the join result is
    PROVABLY identical to the plain join (the oracle IS the plain
    join), while no reducer owns a hot key's full row set. The
    pre-emptive complement to AQE skew splitting, for dims too big to
    broadcast at corpus scale."""
    from .operators.joins import salted_skew_join

    d = _read(spark, sf_dir, "documents")
    dim = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("lang_docs"),
        F.sum("n_chars").cast("bigint").alias("lang_chars"),
    )
    return salted_skew_join(
        d, dim, "lang", salt_source="doc_id", n_salts=4,
        hot_threshold=150,
    ).select("doc_id", "lang", "source", "lang_docs", "lang_chars")


@q(
    "q133_bpe_train_merges",
    """
    WITH vocab AS (
      SELECT word, count(*) AS freq
      FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0 GROUP BY word
    ),
    v0 AS (
      SELECT regexp_replace(word, '(.)', chr(31) || '\\1' || chr(30),
                            'g') AS sym, freq
      FROM vocab
    ),
    p1 AS (
      SELECT l[i] AS a, l[i + 1] AS b, freq
      FROM (SELECT str_split(substr(sym, 2, length(sym) - 2),
                             chr(30) || chr(31)) AS l, freq FROM v0),
           unnest(range(1, len(l))) AS t(i)
    ),
    m1 AS (
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p1
      GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    ),
    v1 AS (
      SELECT replace(sym,
               chr(31) || a || chr(30) || chr(31) || b || chr(30),
               chr(31) || a || b || chr(30)) AS sym, freq
      FROM v0, m1
    ),
    p2 AS (
      SELECT l[i] AS a, l[i + 1] AS b, freq
      FROM (SELECT str_split(substr(sym, 2, length(sym) - 2),
                             chr(30) || chr(31)) AS l, freq FROM v1),
           unnest(range(1, len(l))) AS t(i)
    ),
    m2 AS (
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p2
      GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    ),
    v2 AS (
      SELECT replace(sym,
               chr(31) || a || chr(30) || chr(31) || b || chr(30),
               chr(31) || a || b || chr(30)) AS sym, freq
      FROM v1, m2
    ),
    p3 AS (
      SELECT l[i] AS a, l[i + 1] AS b, freq
      FROM (SELECT str_split(substr(sym, 2, length(sym) - 2),
                             chr(30) || chr(31)) AS l, freq FROM v2),
           unnest(range(1, len(l))) AS t(i)
    ),
    m3 AS (
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p3
      GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
    )
    SELECT 1 AS step, a AS "left", b AS "right", cnt AS pair_count
    FROM m1
    UNION ALL
    SELECT 2, a, b, cnt FROM m2
    UNION ALL
    SELECT 3, a, b, cnt FROM m3
    """,
)
def q133_bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING, first 3 merges learned greedily with
    each merge applied before the next count
    (operators/bpe.py:bpe_train_merges). One corpus-sized shuffle
    total (word frequencies); each round is |V|-sized pair counting +
    a TakeOrderedAndProject top-1 argmax cross-joined back as a
    broadcast 1-row table — NO driver action inside the loop, the
    whole recurrence is one lazy plan. Merges are literal replaces on
    a sentinel-delimited symbol string, boundary-safe by construction
    and identically non-overlapping left-to-right in Spark, DuckDB and
    Python (pinned against a pure-Python BPE in tests). The ORACLE
    unrolls the identical 3-round recurrence in SQL."""
    from .operators.bpe import bpe_train_merges

    return bpe_train_merges(
        _read(spark, sf_dir, "documents"), n_merges=3
    )


@q(
    "q134_compaction_plan",
    """
    WITH plan AS (
      SELECT source, doc_id, n_chars,
             CAST((sum(n_chars) OVER
                     (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n_chars) // 2000
                  AS BIGINT) AS group_id
      FROM documents
    )
    SELECT source, group_id, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_chars) AS BIGINT) AS group_bytes
    FROM plan GROUP BY source, group_id
    """,
)
def q134_compaction_plan(spark, sf_dir):
    """Small-file compaction work-list
    (plans/compaction.py:compaction_plan + compaction_summary):
    documents stand in for the per-partition file manifest (file =
    doc, bytes = n_chars, table partition = source, target = 2000).
    Streaming next-fit in manifest order — group_id = exclusive
    running sum div target, ONE window partitioned by the table
    partition (never global), zero data files read. The maintenance
    pass that keeps a per-partition-checkpointed 10^12-doc ingest from
    drowning in small files; summary rows are the compactor's output
    files."""
    from .plans.compaction import compaction_plan, compaction_summary

    d = _read(spark, sf_dir, "documents")
    plan = compaction_plan(
        d.select("source", "doc_id", "n_chars"),
        ["source"], size_col="n_chars", file_col="doc_id",
        target_bytes=2000,
    )
    return compaction_summary(plan, ["source"], size_col="n_chars")


@q(
    "q135_label_propagation",
    """
    WITH n AS (SELECT count(*) AS N FROM documents),
    e0 AS (
      SELECT doc_id AS s, (doc_id + 1) % N AS d FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id + 2) % N FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id * 7 + 3) % N FROM documents, n
    ),
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT s AS u, d AS v FROM e0 WHERE s <> d
        UNION ALL
        SELECT d AS u, s AS v FROM e0 WHERE s <> d
      )
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    l0 AS (SELECT node, node AS label FROM nodes),
    r1 AS (
      SELECT s.u AS node, l.label, count(*) AS cnt
      FROM sym s JOIN l0 l ON l.node = s.v GROUP BY 1, 2
    ),
    b1 AS (
      SELECT node, label FROM (
        SELECT node, label, row_number() OVER
          (PARTITION BY node ORDER BY cnt DESC, label) AS rn
        FROM r1
      ) WHERE rn = 1
    ),
    l1 AS (
      SELECT nodes.node, coalesce(b1.label, nodes.node) AS label
      FROM nodes LEFT JOIN b1 USING (node)
    ),
    r2 AS (
      SELECT s.u AS node, l.label, count(*) AS cnt
      FROM sym s JOIN l1 l ON l.node = s.v GROUP BY 1, 2
    ),
    b2 AS (
      SELECT node, label FROM (
        SELECT node, label, row_number() OVER
          (PARTITION BY node ORDER BY cnt DESC, label) AS rn
        FROM r2
      ) WHERE rn = 1
    )
    SELECT nodes.node, coalesce(b2.label, nodes.node) AS label
    FROM nodes LEFT JOIN b2 USING (node)
    """,
)
def q135_label_propagation(spark, sf_dir):
    """Synchronous label-propagation communities, 2 rounds, on the
    same ring+hash host graph as q130
    (operators/linkgraph.py:label_propagation). Deterministic
    GraphX-style LPA: adopt the most frequent neighbor label from the
    PREVIOUS round, ties to the smallest label. The engine's per-node
    argmax is min(struct(-count, label)) — a plain HashAggregate, no
    window and no driver action inside the loop; the ORACLE replays
    both rounds with window row_number argmax, proving the
    aggregate-only form equivalent."""
    from .operators.linkgraph import label_propagation

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = None
    for expr in (
        (F.col("doc_id") + 1) % F.col("N"),
        (F.col("doc_id") + 2) % F.col("N"),
        (F.col("doc_id") * 7 + 3) % F.col("N"),
    ):
        part = base.select(
            F.col("doc_id").alias("src"), expr.alias("dst")
        )
        edges = part if edges is None else edges.unionByName(part)
    return label_propagation(edges, n_iter=2)


@q(
    "q136_funnel_stages",
    """
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      GROUP BY e.user_id
    )
    SELECT t1.user_id, t1.t1, t2.t2, t3.t3,
           CAST(1 + (CASE WHEN t2.t2 IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN t3.t3 IS NULL THEN 0 ELSE 1 END)
                AS INT) AS stage_reached
    FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
)
def q136_funnel_stages(spark, sf_dir):
    """Ordered view→click→purchase funnel per user
    (operators/funnel.py:funnel_stages): t_i = earliest step-i event
    STRICTLY AFTER t_{i-1}. Chained conditional-min aggregates joined
    back on the user key — each stage is one keyed shuffle of slim
    (user, ts) rows, no window over the raw stream, no per-user event
    arrays, so a 10^6-event power user costs min() and nothing
    more."""
    from .operators.funnel import funnel_stages

    return funnel_stages(
        _read(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@q(
    "q137_retention_cohorts",
    """
    WITH first AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT cohort_date,
           CAST(date_diff('day', cohort_date, CAST(ts AS DATE))
                AS INT) AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def q137_retention_cohorts(spark, sf_dir):
    """Cohort-retention matrix (operators/funnel.py:retention_cohorts):
    users cohorted by first-event DATE, counted active at each day
    offset. User-keyed first-event aggregate → same-key join →
    (cohort, offset) partial-agg distinct count; every intermediate
    beyond the first map-side combine is user-count-sized, never
    event-count-sized."""
    from .operators.funnel import retention_cohorts

    return retention_cohorts(_read(spark, sf_dir, "events"))


@q(
    "q138_grouped_ols",
    """
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(floor(value * 1000000) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM d GROUP BY event_type
    ),
    k AS (
      SELECT *, (n * sxy - sx * sy) AS num,
             (n * sxx - sx * sx) AS den
      FROM s
    ),
    sl AS (
      SELECT *, CASE WHEN den > 0 THEN
               (num - ((num % den + den) % den)) // den END AS slope
      FROM k
    )
    SELECT event_type, n,
           CAST(slope AS BIGINT) AS slope_micros,
           CAST(CASE WHEN den > 0 THEN
                  ((sy - slope * sx)
                   - (((sy - slope * sx) % n + n) % n)) // n
                END AS BIGINT) AS intercept_micros
    FROM sl
    """,
)
def q138_grouped_ols(spark, sf_dir):
    """Exact-integer least-squares trend per event_type
    (operators/stats.py:grouped_ols): y = event value in micros, x =
    day offset from 2024-01-01. One partial-agg groupBy collects the
    five sufficient statistics as BIGINTs (bit-stable under any
    partitioning — what float regr_slope cannot promise at 10^12
    rows); slope/intercept are pmod-adjusted floor divisions, so
    engine `div` and oracle `//` agree by construction."""
    from .operators.stats import grouped_ols

    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint").alias("x"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"),
    )
    return grouped_ols(ev, ["event_type"], "x", "y")


@q(
    "q139_stupid_backoff",
    """
    WITH toks AS (
      SELECT doc_id, lang = 'en' AS is_t,
             list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    tri AS (
      SELECT doc_id, is_t, l[i] AS w1, l[i + 1] AS w2, l[i + 2] AS w3
      FROM (SELECT doc_id, is_t, l, unnest(range(1, len(l) - 1)) AS i
            FROM toks WHERE len(l) >= 3)
    ),
    big AS (
      SELECT doc_id, is_t, l[i] AS w1, l[i + 1] AS w2
      FROM (SELECT doc_id, is_t, l, unnest(range(1, len(l))) AS i
            FROM toks)
    ),
    uni AS (SELECT doc_id, is_t, unnest(l) AS w FROM toks),
    c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri
             WHERE is_t GROUP BY 1, 2, 3),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM big
            WHERE is_t GROUP BY 1, 2),
    c23 AS (SELECT w1 AS w2, w2 AS w3, count(*) AS c23 FROM big
            WHERE is_t GROUP BY 1, 2),
    c2 AS (SELECT w AS w2, count(*) AS c2 FROM uni
           WHERE is_t GROUP BY 1),
    c3 AS (SELECT w AS w3, count(*) AS c3 FROM uni
           WHERE is_t GROUP BY 1),
    nt AS (SELECT count(*) AS N FROM uni WHERE is_t)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CAST(floor(1e6 * (
             CASE
               WHEN c123.c123 IS NOT NULL
                 THEN ln(c123.c123 / c12.c12)
               WHEN c23.c23 IS NOT NULL
                 THEN ln(0.4) + ln(c23.c23 / c2.c2)
               ELSE ln(0.4) + ln(0.4)
                    + ln(greatest(coalesce(c3.c3, 0), 1) / N)
             END)) AS BIGINT)) AS BIGINT) AS sb_logprob_micros
    FROM tri t
    LEFT JOIN c123 USING (w1, w2, w3)
    LEFT JOIN c12 USING (w1, w2)
    LEFT JOIN c23 USING (w2, w3)
    LEFT JOIN c2 USING (w2)
    LEFT JOIN c3 USING (w3)
    CROSS JOIN nt
    GROUP BY t.doc_id
    """,
)
def q139_stupid_backoff(spark, sf_dir):
    """Trigram Stupid-Backoff quality score
    (operators/lm.py:stupid_backoff_score; Brants EMNLP'07 — the LM
    scheme DESIGNED for MapReduce scale): relative frequencies + fixed
    0.4 backoff, no normalization pass, the model is just count tables
    living in the dataflow. English slice trains; every doc scores via
    three LEFT equi-joins against vocabulary-bounded counts + a
    broadcast 1-row N. Per-trigram logs floor to integer micros BEFORE
    the doc sum — aggregation-order-free, hence hash-oracle-able."""
    from .operators.lm import stupid_backoff_score

    d = _read(spark, sf_dir, "documents")
    return stupid_backoff_score(d, F.col("lang") == "en")


@q(
    "q140_edit_distance_neardup",
    _SIMHASH_CTES.replace(
        "FROM documents", "FROM documents WHERE doc_id % 2 = 0", 1
    )
    + """
    , bands AS (
      SELECT doc_id, simhash, j AS band,
             (simhash // CAST(power(2, j * 8) AS BIGINT)) % 256
               AS band_val
      FROM simhashes CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    lv AS (
      SELECT c.a_id, c.b_id, c.hamming,
             CAST(levenshtein(da.text, db.text) AS INT) AS lev,
             greatest(length(da.text), length(db.text)) AS mx
      FROM cand c
      JOIN documents da ON da.doc_id = c.a_id
      JOIN documents db ON db.doc_id = c.b_id
    )
    SELECT a_id, b_id, hamming, lev,
           CAST(CASE WHEN mx = 0 THEN 1000000
                     ELSE ((mx - lev) * 1000000) // mx END
                AS BIGINT) AS edit_sim_micros
    FROM lv
    WHERE (CASE WHEN mx = 0 THEN 1000000
                ELSE ((mx - lev) * 1000000) // mx END) >= 500000
    """,
)
def q140_edit_distance_neardup(spark, sf_dir):
    """Edit-distance-verified near-duplicates on the doc_id%2 audit
    slice (operators/dedup.py:edit_distance_verify composed behind
    simhash_near_pairs): SimHash banded candidates (Hamming ≤ 3)
    verified by exact Levenshtein, kept at ≥ 50% character edit
    similarity. Three cost bounds stack: banded candidates (never
    corpus pairs), a length gate (lev ≥ |len gap| kills the DP before
    it runs), and Spark's THRESHOLDED banded levenshtein
    (O(k·min(n,m)) early exit, −1 past the band) — the full-corpus
    unbounded form measured 956 s at sf0.1; this shape is seconds."""
    from .operators.dedup import (
        edit_distance_verify,
        simhash32,
        simhash_near_pairs,
    )

    # spread the one-row-group scan BEFORE Arrow tokenization so the
    # simhash signature build parallelizes (tokens compute in the scan
    # stage otherwise — one task at bench SFs)
    d0 = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    t = with_tokens(d0).filter(F.col("doc_id") % 2 == 0)
    tc = (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    # materialize the signature table once: its lineage (Arrow-UDF
    # tokenization) would otherwise replay on BOTH sides of the band
    # self-join and again under the verify join — measured 80 s → 17 s
    # at sf0.1. At corpus scale this is a persisted signature table.
    sig = simhash32(tc).localCheckpoint(eager=False)
    pairs = simhash_near_pairs(sig, max_hamming=3)
    d = _read(spark, sf_dir, "documents")
    return edit_distance_verify(pairs, d, min_sim_micros=500_000)


@q(
    "q141_lexical_diversity",
    """
    WITH w AS (
      SELECT lang, unnest(list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               x -> length(x) > 0)) AS w
      FROM documents
    ),
    wc AS (SELECT lang, w, count(*) AS c FROM w GROUP BY lang, w),
    a AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM wc GROUP BY lang
    )
    SELECT lang, n_tokens, n_types, n_hapax,
           CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_micros,
           CAST(n_hapax * 1000000 // n_types AS BIGINT)
             AS hapax_frac_micros
    FROM a
    """,
)
def q141_lexical_diversity(spark, sf_dir):
    """Per-language lexical-diversity profile
    (operators/textstats.py:lexical_diversity): type-token ratio and
    hapax fraction in integer micros. One (lang, word) map-combined
    groupBy (vocabulary-sized output) + a language-sized rollup —
    never countDistinct over the raw token stream, never a window."""
    from .operators.textstats import lexical_diversity

    return lexical_diversity(_read(spark, sf_dir, "documents"))


@q(
    "q142_decayed_activity",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(
             CAST(floor(value * 1000000) AS BIGINT)
             // CAST(power(2, least(greatest(
                  date_diff('day', CAST(ts AS DATE), DATE '2024-01-31'),
                  0), 62)) AS BIGINT)
           ) AS BIGINT) AS decayed_micros
    FROM events GROUP BY user_id
    """,
)
def q142_decayed_activity(spark, sf_dir):
    """Exponentially time-decayed per-user activity
    (operators/stats.py:decayed_activity): half-life 1 day anchored at
    2024-01-31. The decay divisor is a power of two applied as an
    ARITHMETIC RIGHT SHIFT — exact BIGINT per-row, so the per-key sum
    is aggregation-order independent (float exp(-λ·age) cannot
    hash-match an oracle). One map-combined groupBy, decay in
    codegen."""
    from .operators.stats import decayed_activity

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "ts",
        F.floor(F.col("value") * 1_000_000).cast("bigint")
        .alias("value_micros"),
    )
    return decayed_activity(ev, "2024-01-31", half_life_days=1)


@q(
    "q143_skew_report",
    """
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY source
    ),
    t AS (SELECT count(*) AS tot FROM documents),
    r AS (
      SELECT source, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, source) AS rn,
             sum(n_rows) OVER (ORDER BY n_rows DESC, source
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM c
    )
    SELECT source, n_rows,
           CAST(n_rows * 1000000 // tot AS BIGINT) AS share_micros,
           CAST(cum * 1000000 // tot AS BIGINT) AS cum_share_micros
    FROM r, t WHERE rn <= 8
    """,
)
def q143_skew_report(spark, sf_dir):
    """Join/agg skew diagnostics (operators/stats.py:skew_report): the
    top-8 heaviest `source` keys with individual and cumulative row
    share in micros — the broadcast-vs-salt-vs-AQE decision table.
    Key-sized groupBy → TakeOrderedAndProject top-k → array prefix-sum
    in codegen (NO window, not even a k-row one: a global WindowExec
    would log the single-partition WARN this repo bans from bench
    tails). The oracle uses the window form — hash equality proves the
    array form equivalent."""
    from .operators.stats import skew_report

    return skew_report(_read(spark, sf_dir, "documents"), "source",
                       topk=8)


@q(
    "q144_gram_novelty",
    """
    WITH g AS (
      SELECT DISTINCT doc_id,
             md5(list_aggregate(list_slice(t, i, i + 12), 'string_agg',
                                ' ')) AS gkey
      FROM (
        SELECT doc_id,
               list_filter(str_split(text, ' '),
                           w -> length(w) > 0) AS t
        FROM documents
      ), unnest(range(1, len(t) - 11)) AS r(i)
      WHERE len(t) >= 13
    ),
    d AS (SELECT gkey, count(*) AS df FROM g GROUP BY gkey),
    p AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM g JOIN d USING (gkey) GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_shared,
           CAST((n_grams - n_shared) * 1000000 // n_grams AS BIGINT)
             AS novelty_micros
    FROM p
    """,
)
def q144_gram_novelty(spark, sf_dir):
    """Per-document 13-gram novelty score
    (operators/dedup.py:gram_novelty; Lee et al. 2022 memorization-risk
    triage): fraction of a doc's distinct word 13-grams unseen in any
    other document. Distinct (id, gram-md5) explode → gram-df table →
    one partial-agg rollup; the KEEP/WEIGHT companion to q57's
    decontamination and q97's span removal."""
    from .operators.dedup import gram_novelty

    return gram_novelty(_read(spark, sf_dir, "documents"), n=13)


@q(
    "q145_link_reciprocity",
    """
    WITH n AS (SELECT count(*) AS N FROM documents),
    e0 AS (
      SELECT doc_id AS s, (doc_id * 7 + 3) % N AS d FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, n
    ),
    e AS (SELECT DISTINCT s AS u, d AS v FROM e0 WHERE s <> d),
    m AS (
      SELECT a.u, a.v, CASE WHEN b.u IS NULL THEN 0 ELSE 1 END AS back
      FROM e a LEFT JOIN e b ON b.u = a.v AND b.v = a.u
    ),
    g AS (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS n_out,
             CAST(sum(back) AS BIGINT) AS n_recip
      FROM m GROUP BY u
    )
    SELECT node, n_out, n_recip,
           CAST(n_recip * 1000000 // n_out AS BIGINT)
             AS reciprocity_micros
    FROM g
    """,
)
def q145_link_reciprocity(spark, sf_dir):
    """Per-host link reciprocity on the directed 7id+3 / 13id+5 page
    graph (operators/linkgraph.py:link_reciprocity; Becchetti'08
    webspam features): distinct edges LEFT-joined to their own
    reversal + a src-keyed partial agg — no adjacency set
    materialization, integer-micros ratio."""
    from .operators.linkgraph import link_reciprocity

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return link_reciprocity(edges)


@q(
    "q146_keyness_g2",
    """
    WITH w AS (
      SELECT source AS grp, unnest(list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               x -> length(x) > 0)) AS w
      FROM documents
    ),
    a AS (SELECT grp, w, count(*) AS a FROM w GROUP BY grp, w),
    wt AS (SELECT w, sum(a) AS wt FROM a GROUP BY w),
    st AS (SELECT grp, sum(a) AS st FROM a GROUP BY grp),
    n AS (SELECT sum(a) AS N FROM a),
    s AS (
      SELECT grp, w, a, wt - a AS b, wt, st, N,
             CAST(floor(1e6 * (2 * (
               a * ln(CAST(a * N AS DOUBLE) / (wt * st))
               + CASE WHEN wt - a > 0 THEN
                   (wt - a) * ln(CAST((wt - a) * N AS DOUBLE)
                                 / (wt * (N - st)))
                 ELSE 0 END))) AS BIGINT) AS g2_micros
      FROM a JOIN wt USING (w) JOIN st USING (grp) CROSS JOIN n
    ),
    r AS (
      SELECT grp, w, a, b, g2_micros,
             row_number() OVER (PARTITION BY grp
                                ORDER BY g2_micros DESC, w) AS rank
      FROM s
    )
    SELECT grp AS source, w AS word, CAST(a AS BIGINT) AS n_in,
           CAST(b AS BIGINT) AS n_out, g2_micros,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def q146_keyness_g2(spark, sf_dir):
    """Top-5 keyness terms per source by Dunning's log-likelihood G²
    (operators/textstats.py:keyness_g2) — what makes each source
    DIFFERENT from the rest of the corpus, where the reference's raw-TF
    keyword report surfaces corpus-common words. Vocabulary-sized aggs,
    broadcast group totals, per-term micros floored before the
    group-partitioned rank window."""
    from .operators.textstats import keyness_g2

    return keyness_g2(_read(spark, sf_dir, "documents"),
                      group_col="source", topk=5)


@q(
    "q147_embedding_outliers",
    """
    WITH ex AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    cent AS (
      SELECT label, dim,
             (sum(x) - ((sum(x) % count(*) + count(*)) % count(*)))
               // count(*) AS c
      FROM ex GROUP BY label, dim
    ),
    d2 AS (
      SELECT vec_id, ex.label,
             CAST(sum((x - c) * (x - c)) AS BIGINT) AS dist2
      FROM ex JOIN cent USING (label, dim)
      GROUP BY vec_id, ex.label
    ),
    r AS (
      SELECT label, vec_id, dist2,
             row_number() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vec_id) AS rank
      FROM d2
    )
    SELECT label, vec_id, dist2, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def q147_embedding_outliers(spark, sf_dir):
    """Top-5 farthest-from-centroid vectors per label
    (operators/kmeans.py:embedding_outliers) — the audit that catches
    mislabeled/off-topic/encoder-garbage vectors before IVF training
    and dedup. Integer-micros exact: floor-quantized values, pmod-
    adjusted floor-division centroids (negative sums!), vec-keyed
    partial-agg distances, label-partitioned rank window."""
    from .operators.kmeans import embedding_outliers

    return embedding_outliers(_read(spark, sf_dir, "embeddings"))


@q(
    "q148_canonical_url_dedup",
    """
    WITH canon AS (
      SELECT doc_id,
             'http://' || source || '.example.com/Docs/' || doc_id ||
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN '?a=1&b=2'
                 WHEN 1 THEN '?z=9'
                 ELSE '' END AS canon
      FROM documents
    ),
    variants AS (
      SELECT doc_id, canon,
             'HTTP://' || source || '.Example.COM:80/Docs/' || doc_id ||
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
                 WHEN 1 THEN '?gclid=' || doc_id || '&z=9'
                 ELSE '?utm_campaign=x&fbclid=y' END
               || '#frag' || doc_id AS url
      FROM documents JOIN canon USING (doc_id)
      UNION ALL
      SELECT doc_id, canon,
             'http://' || source || '.example.com/Docs/' || doc_id ||
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN '?b=2&a=1'
                 WHEN 1 THEN '?z=9&utm_medium=email'
                 ELSE '' END
               || '#x' AS url
      FROM documents JOIN canon USING (doc_id)
    )
    SELECT canon, min(url) AS keeper_url,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants
    FROM variants GROUP BY canon
    """,
)
def q148_canonical_url_dedup(spark, sf_dir):
    """Frontier URL-cluster dedup
    (functions/urlnorm.py:canonical_url_dedup): two synthesized raw
    variants per page (tracking-laden uppercase-host + clean
    reordered-query) collapse to one canonical fetch key. Per-row
    codegen canonicalization + one map-combined groupBy — the
    exact_dedup plan with the canonical string as the content hash."""
    from .functions.urlnorm import canonical_url_dedup

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    messy = F.concat(
        F.lit("HTTP://"), F.col("source"),
        F.lit(".Example.COM:80/Docs/"), sid,
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("?utm_source=feed&b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("?gclid="), sid, F.lit("&z=9")))
        .otherwise(F.lit("?utm_campaign=x&fbclid=y")),
        F.lit("#frag"), sid,
    )
    clean = F.concat(
        F.lit("http://"), F.col("source"),
        F.lit(".example.com/Docs/"), sid,
        F.when(F.col("doc_id") % 3 == 0, F.lit("?b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?z=9&utm_medium=email"))
        .otherwise(F.lit("")),
        F.lit("#x"),
    )
    urls = d.select(messy.alias("url")).unionByName(
        d.select(clean.alias("url"))
    )
    return canonical_url_dedup(urls, strip_tracking=True)


@q(
    "q149_dedup_eval",
    _MINHASH_CTES.replace(
        "WHERE length(tok_str) > 0",
        "WHERE length(tok_str) > 0 AND doc_id % 5 = 0",
    )
    + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS ca, b.doc_id AS cb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    tr0 AS (
      SELECT a.doc_id AS ta, b.doc_id AS tb, count(*) AS ni
      FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT ta, tb FROM tr0
      JOIN sz sa ON sa.doc_id = ta JOIN sz sb ON sb.doc_id = tb
      WHERE round(ni / CAST(sa.sz + sb.sz - ni AS DOUBLE), 6) >= 0.2
    ),
    j AS (
      SELECT cand.ca, truth.ta
      FROM cand FULL OUTER JOIN truth
        ON cand.ca = truth.ta AND cand.cb = truth.tb
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN ca IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_truth,
             CAST(sum(CASE WHEN ca IS NOT NULL AND ta IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN ca IS NOT NULL AND ta IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN ca IS NULL AND ta IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM j
    )
    SELECT *,
           CASE WHEN n_candidates > 0
                THEN tp * 1000000 // n_candidates END
             AS precision_micros,
           CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth END
             AS recall_micros
    FROM agg
    """,
)
def q149_dedup_eval(spark, sf_dir):
    """Candidate-generator quality evaluation on a labeled slice
    (operators/dedup.py:dedup_eval): MinHash-LSH band candidates vs
    exact 12-gram Jaccard ≥ 0.2 ground truth over the doc_id%5 slice —
    tp/fp/fn + precision/recall micros in ONE full-outer pair join +
    a 1-row aggregate. The measurement loop that makes band/row
    parameter changes an engineering decision instead of a guess; the
    brute-force truth join is slice-bounded by construction."""
    from .operators.dedup import (
        char_shingles,
        dedup_eval,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    t = _tokstr_df(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    sh = char_shingles(t, text_col="tok_str", k=12)
    cand = lsh_candidate_pairs(
        lsh_bands(minhash_signatures(sh, n_hashes=12), rows_per_band=3)
    )
    truth = ngram_jaccard_pairs(sh, min_jaccard=0.2).select(
        "a_id", "b_id"
    )
    return dedup_eval(cand, truth)


@q(
    "q150_gram_accumulation",
    """
    WITH g AS (
      SELECT DISTINCT doc_id % 20 AS bucket,
             md5(array_to_string(list_slice(t, i, i + 12), ' '))
               AS gkey
      FROM (
        SELECT doc_id,
               list_filter(str_split(text, ' '),
                           w -> length(w) > 0) AS t
        FROM documents
      ), unnest(range(1, len(t) - 11)) AS r(i)
      WHERE len(t) >= 13
    ),
    f AS (SELECT gkey, min(bucket) AS bucket FROM g GROUP BY gkey),
    p AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_grams
      FROM f GROUP BY bucket
    )
    SELECT CAST(bucket AS INT) AS bucket, n_new_grams,
           CAST(sum(n_new_grams) OVER (ORDER BY bucket
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_new_grams
    FROM p
    """,
)
def q150_gram_accumulation(spark, sf_dir):
    """Novel-text accumulation curve
    (operators/dedup.py:gram_accumulation_curve): 13-gram first-
    introduction counts over 20 doc-id buckets + cumulative total —
    the is-this-source-exhausted diagnostic for data scaling. Gram-df
    shaped aggs; the cumulative sum uses the q143 array-prefix-sum
    idiom (no WindowExec even over 20 rows); the ORACLE's window form
    hash-matching proves the array form."""
    from .operators.dedup import gram_accumulation_curve

    return gram_accumulation_curve(
        _read(spark, sf_dir, "documents"), n=13, n_buckets=20
    )


@q(
    "q151_containment_join",
    """
    WITH g AS (
      SELECT DISTINCT doc_id, substr(text, i, 12) AS gram
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text) - 11, 1) + 1))
                     AS i
            FROM documents WHERE length(text) > 0)
    ),
    s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
          FROM g GROUP BY doc_id),
    i AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_inter, s.n AS n_a,
           CAST((n_inter * 1000000) // s.n AS BIGINT)
             AS containment_micros
    FROM i JOIN s ON i.a_id = s.doc_id
    WHERE n_inter * 1000000 >= 800000 * s.n
    """,
)
def q151_containment_join(spark, sf_dir):
    """EXACT directed set-CONTAINMENT self-join
    (operators/dedup.py:containment_join; set-containment-join
    literature — Melnik & Garcia-Molina TODS'03 — under the All-Pairs
    prefix discipline): every ordered doc pair with char-12-gram
    containment |A∩B|/|A| ≥ 0.8. Asymmetric: catches quote-inclusion
    and snippet-vs-article duplication invisible to Jaccard (q129).
    Prefix filter applies to the contained side only; the containing
    side's postings are semi-join-pruned to A-prefix (rare) tokens so
    corpus stopword grams never become join keys. The ORACLE is the
    brute-force directed all-pairs join — hash-matching proves the
    prefix+semi-join pruning dropped no qualifying pair."""
    from .operators.dedup import char_shingles, containment_join

    # spread the one-row-group scan before row-local shingling
    d = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = char_shingles(d, text_col="text", k=12)
    return containment_join(
        grams, threshold_micros=800_000, token_col="gram",
        materialize=True,
    )


@q(
    "q152_layout_clusters",
    """
    WITH v AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
               THEN 'html>head>title>meta>body>header>nav>a>h1>p>a>a'
                    || '>img>section>h2>p>footer'
               ELSE 'html>head>title>meta>body>header>nav>a>h1>p>a>a'
                    || '>img>footer'
             END AS sig
      FROM documents
    )
    SELECT md5(sig) AS layout_hash,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(min(len(string_split(sig, '>'))) AS INT) AS n_tags,
           CAST(min(doc_id) AS BIGINT) AS min_id
    FROM v GROUP BY 1
    """,
)
def q152_layout_clusters(spark, sf_dir):
    """DOM structural-fingerprint clustering
    (operators/boilerplate.py:layout_clusters): every page reduced to
    its document-order start-tag sequence, md5'd into a layout key, one
    row per distinct skeleton — the template-farm detector, structural
    complement to content SimHash (q20) and block-text template mining
    (q94/q96). Pages here are the deterministic synthetic template with
    an extra <section><h2><p> wing grafted onto every third doc, so the
    corpus has exactly TWO skeletons; the ORACLE restates both tag
    sequences closed-form — hash-matching proves the walker emits the
    canonical start-tag stream from raw bytes. Plan: one Arrow walker
    pass (zero shuffle) + a map-combinable count/min agg on the
    template-cardinality key."""
    from .operators.boilerplate import layout_clusters

    docs = documents_as_pages(spark, sf_dir)
    page = F.decode("html", "UTF-8")
    wing = "<section><h2>More</h2><p>extra</p></section><footer>"
    varied = docs.withColumn(
        "html",
        F.encode(
            F.when(
                (F.col("doc_id") % 3) == 0,
                F.replace(page, F.lit("<footer>"), F.lit(wing)),
            ).otherwise(page),
            "UTF-8",
        ),
    )
    return layout_clusters(varied)


@q(
    "q153_pmi_collocations",
    """
    WITH base AS (
      SELECT doc_id,
        list_filter(
          string_split(lower(trim(regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
          w -> length(w) >= 2
               AND NOT (lang = 'en' AND w IN ('the','a','and','of','is','this'))
               AND NOT (lang = 'es' AND w IN ('y','de','la','que'))
               AND NOT (lang IN ('pt','pt-br') AND w IN ('e','de','que','o'))
        ) AS toks
      FROM documents
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
    ),
    nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
    big AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM (SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i
            FROM base)
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM big)
    SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
           CAST(floor(1000000 * ln((c_ab / n_bi)
                / ((ua.c / n_uni) * (ub.c / n_uni)))) AS BIGINT)
             AS pmi_micros
    FROM big
    JOIN uni ua ON big.w1 = ua.w
    JOIN uni ub ON big.w2 = ub.w
    CROSS JOIN nu CROSS JOIN nb
    ORDER BY pmi_micros DESC, w1, w2
    """,
)
def q153_pmi_collocations(spark, sf_dir):
    """PMI collocation mining (operators/tf.py:pmi_collocations; Church
    & Hanks 1990): every adjacent token pair scored by pointwise mutual
    information, min_count=5 — the boilerplate-collocation / phrase-farm
    detector built on q43's shuffle-free zip_with bigrams. The unigram
    join keys on VOCABULARY-sized tables (Heaps' law ≪ corpus); corpus
    totals ride in as broadcast 1-row scalars; floor(1e6·ln(...)) keeps
    the score integer-exact (the q73 idiom) so the oracle hash-matches
    bit-for-bit."""
    from .operators.tf import pmi_collocations

    return pmi_collocations(_tokens_df(spark, sf_dir), min_count=5)


@q(
    "q154_roc_auc",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    sc AS (
      SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(coalesce(list_sum(list_transform(l, w ->
               (((('0x' || substr(md5(w), 1, 8))::BIGINT % 1048576)
                 * 2654435761) % 2000001) - 1000000)), 0) AS BIGINT)
               AS score_micros
      FROM toks
    ),
    s AS (
      SELECT CASE WHEN n_tokens > 0
                  THEN CAST(floor(score_micros / n_tokens) AS BIGINT)
                  ELSE 0 END AS sv,
             (doc_id % 3 = 0) AS lbl
      FROM sc
    ),
    b AS (
      SELECT CAST(floor(sv / 10000.0) * 10000 AS BIGINT)
               AS threshold_micros,
             CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS BIGINT) AS nn
      FROM s GROUP BY 1
    ),
    c AS (
      SELECT threshold_micros,
             CAST(sum(np) OVER w AS BIGINT) AS tp,
             CAST(sum(nn) OVER w AS BIGINT) AS fp
      FROM b
      WINDOW w AS (ORDER BY threshold_micros DESC
                   ROWS UNBOUNDED PRECEDING)
    ),
    t AS (SELECT CAST(sum(np) AS BIGINT) AS p_tot,
                 CAST(sum(nn) AS BIGINT) AS n_tot FROM b),
    a AS (
      SELECT CAST(sum(term) AS BIGINT) AS s_num FROM (
        SELECT (fp - coalesce(lag(fp) OVER o, 0))
               * (tp + coalesce(lag(tp) OVER o, 0)) AS term
        FROM c WINDOW o AS (ORDER BY threshold_micros DESC)
      )
    )
    SELECT c.threshold_micros, c.tp, c.fp,
           t.p_tot - c.tp AS fn, t.n_tot - c.fp AS tn,
           (c.tp * 1000000) // nullif(t.p_tot, 0) AS tpr_micros,
           (c.fp * 1000000) // nullif(t.n_tot, 0) AS fpr_micros,
           (c.tp * 1000000) // nullif(c.tp + c.fp, 0)
             AS precision_micros,
           (a.s_num * 1000000) // nullif(2 * t.p_tot * t.n_tot, 0)
             AS auc_micros
    FROM c CROSS JOIN t CROSS JOIN a
    """,
)
def q154_roc_auc(spark, sf_dir):
    """ROC threshold sweep + integer-exact AUC over the q77 hashed
    quality classifier (operators/classifier.py:roc_points): scores are
    per-doc mean hashed weights (micros), labels the deterministic
    doc_id%3 split, bucket_width=10^4 → ≤201 threshold rows. The sweep
    runs as ONE bounded-cardinality partial agg + the q143 array-prefix-
    sum idiom — NO WindowExec, nothing corpus-sized past the first agg;
    the ORACLE states the same curve with window cumsums and lag()
    trapezoids, so hash-matching proves the array form computes the
    classical ROC/AUC exactly."""
    from .operators.classifier import hashed_linear_score, roc_points

    sc = hashed_linear_score(_read(spark, sf_dir, "documents"))
    scored = sc.select(
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("score_micros") / F.col("n_tokens")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sv"),
        (F.col("doc_id") % 3 == 0).alias("lbl"),
    )
    return roc_points(
        scored, score_col="sv", label_col="lbl", bucket_width=10_000
    )


@q(
    "q155_line_dedup",
    """
    WITH aug AS (
      SELECT doc_id,
             'promo ' || (doc_id % 4) || chr(10) || substr(text, 1, 40)
             || chr(10) || 'promo ' || (doc_id % 4) || chr(10)
             || 'subscribe' || chr(10) || 'subscribe' AS t
      FROM documents
    ),
    ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM aug),
    e AS (
      SELECT doc_id, l[i] AS line, i, len(l) AS n0
      FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM ls)
    ),
    f AS (
      SELECT doc_id, line, min(i) AS fi, min(n0) AS n0
      FROM e GROUP BY doc_id, line
    )
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY fi) AS text,
           CAST(min(n0) AS INT) AS n_lines,
           CAST(count(*) AS INT) AS n_kept
    FROM f GROUP BY doc_id
    """,
)
def q155_line_dedup(spark, sf_dir):
    """WITHIN-document repeated-line removal, first occurrence kept
    (operators/dedup.py:dedup_lines_within_doc) — the CCNet/RefinedWeb
    page-cleaning step that strips per-page repeated chrome before
    corpus dedup. Every doc gets a deterministic repeated promo line and
    a doubled 'subscribe' footer spliced in; the operator must remove
    exactly the repeats in document order. Pure per-row codegen
    (split → array_distinct → array_join), zero shuffle at any corpus
    size; the ORACLE restates first-occurrence semantics positionally
    (min(i) + ordered string_agg), so hash-matching pins
    array_distinct's keep-first order."""
    from .operators.dedup import dedup_lines_within_doc

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("promo "), (F.col("doc_id") % 4).cast("string")),
            F.substring("text", 1, 40),
            F.concat(F.lit("promo "), (F.col("doc_id") % 4).cast("string")),
            F.lit("subscribe"),
            F.lit("subscribe"),
        ).alias("text"),
    )
    return dedup_lines_within_doc(aug, id_col="doc_id")


# fixed BPE merge list for q156 — rank-ordered, every output symbol
# distinct (the bpe_encode one-pass-per-merge precondition); (a,n)→an
# feeding (an,d)→and exercises merge chaining
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"),
    ("a", "n"), ("an", "d"), ("e", "r"), ("o", "n"),
]


def _bpe_encode_oracle() -> str:
    enc = "regexp_replace(word, '(.)', chr(31) || '\\1' || chr(30), 'g')"
    for a, b in _BPE_MERGES:
        pat = (
            f"chr(31) || '{a}' || chr(30) || chr(31) || '{b}' || chr(30)"
        )
        rep = f"chr(31) || '{a}{b}' || chr(30)"
        enc = f"replace({enc}, {pat}, {rep})"
    return f"""
    WITH w AS (
      SELECT doc_id, unnest(list_filter(str_split(text, ' '),
                                        x -> length(x) > 0)) AS word
      FROM documents
    ),
    e AS (SELECT doc_id, {enc} AS sym FROM w),
    s AS (
      SELECT doc_id,
             unnest(str_split(substr(sym, 2, length(sym) - 2),
                              chr(30) || chr(31))) AS symbol
      FROM e
    )
    SELECT symbol, CAST(count(*) AS BIGINT) AS freq,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM s GROUP BY symbol ORDER BY freq DESC, symbol
    """


@q("q156_bpe_encode", _bpe_encode_oracle())
def q156_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (operators/bpe.py:bpe_encode) — the
    encode half of the q133 train/encode pair: a fixed rank-ordered
    8-merge list applied to every word as a sentinel-delimited
    replace-fold (exact greedy BPE, pure whole-stage codegen, zero
    Python / zero shuffle on the corpus path), then corpus symbol
    frequencies. The ORACLE replays the identical replace chain in
    DuckDB — left-to-right non-overlapping replace is a shared
    contract — so hash-matching proves encoder equivalence symbol by
    symbol."""
    from .operators.bpe import bpe_encode

    be = bpe_encode(_read(spark, sf_dir, "documents"), _BPE_MERGES)
    return (
        be.select("doc_id", F.explode("symbols").alias("symbol"))
        .groupBy("symbol")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("freq"), "symbol")
    )


@q(
    "q157_wilson_quality",
    """
    WITH a AS (
      SELECT source,
             CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS s
      FROM documents
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS successes
      FROM a GROUP BY source
    ),
    p AS (
      SELECT *, CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
             CAST(n AS DOUBLE) AS nd
      FROM g
    )
    SELECT source, n, successes,
           round(ph, 6) AS p_hat,
           round((ph + (1.96 * 1.96) / (2.0 * nd)
                  - 1.96 * sqrt(ph * (1.0 - ph) / nd
                                + (1.96 * 1.96) / (4.0 * nd * nd)))
                 / (1.0 + (1.96 * 1.96) / nd), 6) AS wilson_lo
    FROM p
    """,
)
def q157_wilson_quality(spark, sf_dir):
    """Per-domain quality rate with Wilson-score LOWER bound
    (operators/textstats.py:wilson_bounds; Wilson 1927): success =
    doc length ≥ 200 chars, grouped by source — the statistically
    honest domain-curation gate (a 3/3 host cannot out-rank a 70/100
    host on the lower bound the way raw rates allow). One map-combined
    partial agg on the domain key; the Wilson arithmetic is per-row
    codegen on the group-cardinality result, written as ONE canonical
    double expression (z² stated as 1.96*1.96 on both sides so the
    doubles are bit-identical) and rounded to 6dp."""
    from .operators.textstats import wilson_bounds

    d = _read(spark, sf_dir, "documents").select(
        "source", (F.length("text") >= 200).alias("is_good")
    )
    return wilson_bounds(d, group_col="source", success_col="is_good")


@q(
    "q158_zipf_slope",
    _TOKENS_CTE
    + """
    , f AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
      FROM words GROUP BY lang, word
    ),
    r AS (
      SELECT lang,
             CAST(floor(1000000 * ln(CAST(row_number() OVER (
               PARTITION BY lang ORDER BY freq DESC, word)
               AS DOUBLE))) AS BIGINT) AS x,
             CAST(floor(1000000 * ln(CAST(freq AS DOUBLE)))
               AS BIGINT) AS y
      FROM f
    ),
    s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM r GROUP BY lang
    )
    SELECT lang, n,
           CAST(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             THEN floor(1e6 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             END AS BIGINT) AS slope_micros,
           CAST(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
             THEN floor((CAST(sy AS DOUBLE)
                  - (CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                     THEN floor(1e6 * (CAST(n AS DOUBLE)
                          * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     END) * CAST(sx AS DOUBLE) / 1e6)
                / CAST(n AS DOUBLE))
             END AS BIGINT) AS intercept_micros
    FROM s
    """,
)
def q158_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per language (operators/textstats.py:zipf_slope):
    OLS slope of ln(freq) on ln(rank) over each language's frequency-
    ranked vocabulary — natural text runs ≈ −1·10^6 micros; template
    farms and generated spam flatten it. Sufficient statistics are
    exact BIGINT sums of micro-quantized logs (order-free under any
    partitioning); the rank window partitions BY LANGUAGE over the
    vocabulary-sized table (never a global sort); the final two-ratio
    arithmetic is one canonical double expression replayed verbatim by
    the oracle."""
    from .operators.textstats import zipf_slope

    return zipf_slope(_tokens_df(spark, sf_dir), group_col="lang")


@q(
    "q159_char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    per AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
      FROM ch WHERE c <> '' GROUP BY doc_id, c
    ),
    a AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_distinct_chars,
             CAST(sum(CAST(floor(1e6 * CAST(cnt AS DOUBLE)
                                 * ln(CAST(cnt AS DOUBLE)))
                           AS BIGINT)) AS BIGINT) AS s
      FROM per GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_chars, 0) AS n_chars,
           coalesce(a.n_distinct_chars, 0) AS n_distinct_chars,
           CAST(CASE WHEN a.n_chars > 0 THEN
                  floor(1e6 * ln(CAST(a.n_chars AS DOUBLE))
                        - CAST(a.s AS DOUBLE)
                          / CAST(a.n_chars AS DOUBLE))
                END AS BIGINT) AS entropy_micros
    FROM documents d LEFT JOIN a USING (doc_id)
    """,
)
def q159_char_entropy(spark, sf_dir):
    """Per-document character-distribution Shannon entropy
    (operators/textstats.py:char_entropy) — the base64/binary/minified
    blob detector (natural prose ≈ 2.8-3.1 nats, base64 ≈ ln 64 flat).
    Per-char terms floor(1e6·c·ln c) are quantized BEFORE the sum so
    the per-doc statistic is an order-free BIGINT (q73 discipline);
    only the final ln n − S/n runs in double, replayed canonically by
    the oracle. One (doc, char) map-combined agg + per-doc re-agg;
    empty docs keep a NULL-entropy row via the id-keyed join."""
    from .operators.textstats import char_entropy

    return char_entropy(_read(spark, sf_dir, "documents"))


@q(
    "q160_url_patterns",
    """
    WITH u AS (
      SELECT 'https://h' || (doc_id % 5) || '.example.com' ||
        CASE WHEN doc_id % 7 = 0
               THEN '/archive/' || (2000 + doc_id % 25) || '/'
                    || (doc_id % 12 + 1)
             WHEN doc_id % 3 = 0
               THEN '/blog/' || doc_id || '/comments'
             ELSE '/docs/' || doc_id END AS url
      FROM documents
    )
    SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
             AS host,
           regexp_replace(
             regexp_extract(url,
               '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1),
             '[0-9]+', '{n}', 'g') AS path_template,
           CAST(count(*) AS BIGINT) AS n_urls,
           min(url) AS sample_url
    FROM u GROUP BY 1, 2
    """,
)
def q160_url_patterns(spark, sf_dir):
    """URL path-template mining (functions/urlnorm.py:
    url_path_templates): digit runs masked to {n}, counted per host —
    the calendar/pagination/session-trap detector a crawl frontier
    budgets patterns (not pages) with. URLs are synthesized
    deterministically with three route shapes (/archive/{yyyy}/{n},
    /blog/{id}/comments, /docs/{id}); the oracle replays the same
    regex pair. Two codegen regexps + one map-combined agg on the
    site-structure-sized (host, template) key."""
    from .functions.urlnorm import url_path_templates

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id")
    u = d.select(
        F.concat(
            F.lit("https://h"), (sid % 5).cast("string"),
            F.lit(".example.com"),
            F.when(
                sid % 7 == 0,
                F.concat(
                    F.lit("/archive/"),
                    (sid % 25 + 2000).cast("string"),
                    F.lit("/"),
                    (sid % 12 + 1).cast("string"),
                ),
            )
            .when(
                sid % 3 == 0,
                F.concat(
                    F.lit("/blog/"), sid.cast("string"),
                    F.lit("/comments"),
                ),
            )
            .otherwise(F.concat(F.lit("/docs/"), sid.cast("string"))),
        ).alias("url")
    )
    return url_path_templates(u)


@q(
    "q161_mirror_hosts",
    """
    WITH pages AS (
      SELECT 'h' || (doc_id % 5) || '.example.com' AS host, text
      FROM documents
      UNION ALL
      SELECT 'mirror.example.net', text FROM documents
      WHERE doc_id % 4 = 0
    ),
    a AS (
      SELECT md5(text) AS content_key,
             CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
             string_agg(DISTINCT host, ',' ORDER BY host) AS hosts
      FROM pages GROUP BY 1
    )
    SELECT content_key, n_hosts, n_pages, hosts
    FROM a WHERE n_hosts >= 2
    """,
)
def q161_mirror_hosts(spark, sf_dir):
    """Cross-host mirror detection (operators/dedup.py:mirror_hosts):
    verbatim content on ≥2 distinct hosts, surfaced (not silently
    collapsed) for crawl planning and scraper-farm blocklisting. Every
    doc_id%4==0 document gets a deterministic mirror on a second host;
    the oracle restates the construction and the hash-keyed host
    aggregation closed-form. One content-hash partial agg; text never
    shuffles — only (hash, host) pairs."""
    from .operators.dedup import mirror_hosts

    d = _read(spark, sf_dir, "documents")
    base = d.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        "text",
    )
    mirrored = d.filter(F.col("doc_id") % 4 == 0).select(
        F.lit("mirror.example.net").alias("host"), "text"
    )
    return mirror_hosts(base.unionByName(mirrored))


@q(
    "q162_split_leakage",
    """
    WITH corpus AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         w -> length(w) > 0) AS t
      FROM documents
      UNION ALL
      SELECT doc_id + 100000,
             list_filter(string_split(text, ' '),
                         w -> length(w) > 0)
      FROM documents WHERE doc_id % 10 = 0
    ),
    s AS (
      SELECT doc_id, t,
             CASE WHEN ('0x' || substr(md5('split'
                    || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000000 < 900000 THEN 'train'
                  WHEN ('0x' || substr(md5('split'
                    || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 1000000 < 950000 THEN 'val'
                  ELSE 'test' END AS split
      FROM corpus
    ),
    g AS (
      SELECT DISTINCT doc_id, split,
             array_to_string(t[i:i+12], ' ') AS gr
      FROM (SELECT doc_id, split, t,
                   unnest(range(1, len(t) - 11)) AS i
            FROM s WHERE len(t) >= 13)
    ),
    tr AS (SELECT DISTINCT doc_id AS train_id, gr FROM g
           WHERE split = 'train'),
    ev AS (SELECT doc_id, split, gr FROM g WHERE split <> 'train')
    SELECT ev.doc_id, ev.split,
           CAST(count(DISTINCT ev.gr) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT tr.train_id) AS BIGINT) AS n_train_docs
    FROM ev JOIN tr USING (gr)
    GROUP BY 1, 2
    """,
)
def q162_split_leakage(spark, sf_dir):
    """Train→eval leakage audit over the q110 deterministic split
    (operators/dedup.py:split_leakage): every tenth document gets a
    verbatim copy under a new id, the corpus is split 90/5/5, and any
    val/test doc sharing a 13-gram with ANY train doc is flagged with
    its shared-gram and train-doc counts — the eval-hygiene step that
    makes held-out numbers trustworthy. Unlike q57's broadcast-bench
    decontamination, both sides here are corpus fractions: a plain hash
    equi-join on 8-byte gram-hash prefixes, (id, hash) pairs only."""
    from .operators.dedup import split_leakage
    from .operators.mixing import split_assign

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("tokens_str"),
    )
    copies = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "tokens_str"
    )
    corpus = d.unionByName(copies)
    s = split_assign(
        corpus, key_col="doc_id", salt="split",
        train_micros=900_000, val_micros=50_000,
    )
    return split_leakage(s, n=13)


@q(
    "q163_winnowing",
    """
    WITH g AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(length(text) - 7, 0) + 1),
               i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 8))
                      ::BIGINT) AS hs
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(hs) - 3, 0) + 1),
               j -> struct_pack(
                 j := j,
                 p := list_min(list_transform([0, 1, 2, 3],
                        o -> hs[j + o] * 4 + (3 - o)))))) AS u
      FROM g
    )
    SELECT DISTINCT doc_id,
           CAST(u.j + (3 - u.p % 4) AS INT) AS pos,
           CAST(u.p // 4 AS BIGINT) AS fp
    FROM s
    """,
)
def q163_winnowing(spark, sf_dir):
    """Winnowing fingerprints (operators/textstats.py:
    winnowing_fingerprints; Schleimer-Wilkerson-Aiken SIGMOD'03, the
    MOSS algorithm): char-8-gram hashes, window-4 minimum selection
    with the rightmost-on-ties robust rule — every shared substring of
    length ≥ 11 is guaranteed a shared fingerprint at ~2/5 full-gram
    density. Selection is engine-exact via the hash·w+(w−1−offset)
    integer pack (no struct-comparison semantics to align); the whole
    operator is per-row array codegen, zero shuffle, zero Python. The
    ORACLE replays pack, min, decode, and distinct verbatim."""
    from .operators.textstats import winnowing_fingerprints

    return winnowing_fingerprints(
        _read(spark, sf_dir, "documents"), k=8, w=4
    )


@q(
    "q164_host_dup_rate",
    """
    WITH pages AS (
      SELECT 'h' || (doc_id % 5) || '.example.com' AS host, text
      FROM documents
      UNION ALL
      SELECT 'h' || (doc_id % 5) || '.example.com', text
      FROM documents WHERE doc_id % 3 = 0
    ),
    a AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(DISTINCT md5(text)) AS BIGINT)
               AS n_unique_texts
      FROM pages GROUP BY host
    )
    SELECT host, n_pages, n_unique_texts,
           (n_pages - n_unique_texts) * 1000000 // n_pages
             AS dup_rate_micros
    FROM a
    """,
)
def q164_host_dup_rate(spark, sf_dir):
    """Per-host duplicate-rate report card (operators/dedup.py:
    host_dup_rate): every third document is duplicated within its host,
    and the report prices each host's redundancy — the "cap or drop
    this 90%-duplicated host" decision made BEFORE spending per-doc
    dedup effort. Text reduces to md5 in the scan Project; one distinct
    + one host agg, both map-combined."""
    from .operators.dedup import host_dup_rate

    d = _read(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com"),
    )
    base = d.select(host.alias("host"), "text")
    dups = d.filter(F.col("doc_id") % 3 == 0).select(
        host.alias("host"), "text"
    )
    return host_dup_rate(base.unionByName(dups))


@q(
    "q165_textrank",
    """
    WITH base AS (
      SELECT doc_id,
        list_filter(
          string_split(lower(trim(regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
          w -> length(w) >= 2
               AND NOT (lang = 'en' AND w IN ('the','a','and','of','is','this'))
               AND NOT (lang = 'es' AND w IN ('y','de','la','que'))
               AND NOT (lang IN ('pt','pt-br') AND w IN ('e','de','que','o'))
        ) AS toks
      FROM documents
    ),
    p AS (
      SELECT toks[i] AS a, toks[i + 1] AS b
      FROM (SELECT toks, unnest(range(1, greatest(len(toks), 1))) AS i
            FROM base)
    ),
    e AS (SELECT a AS src, b AS dst FROM p
          UNION ALL SELECT b, a FROM p),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst FROM e),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
    c1 AS (SELECT dst, CAST(sum(s // outdeg) AS BIGINT) AS c
           FROM e JOIN deg USING (src) JOIN r0 ON e.src = r0.node
           GROUP BY dst),
    r1 AS (SELECT n.node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM nodes n LEFT JOIN c1 ON n.node = c1.dst),
    c2 AS (SELECT dst, CAST(sum(s // outdeg) AS BIGINT) AS c
           FROM e JOIN deg USING (src) JOIN r1 ON e.src = r1.node
           GROUP BY dst),
    r2 AS (SELECT n.node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM nodes n LEFT JOIN c2 ON n.node = c2.dst),
    c3 AS (SELECT dst, CAST(sum(s // outdeg) AS BIGINT) AS c
           FROM e JOIN deg USING (src) JOIN r2 ON e.src = r2.node
           GROUP BY dst),
    r3 AS (SELECT n.node,
                  CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                    AS s
           FROM nodes n LEFT JOIN c3 ON n.node = c3.dst)
    SELECT node AS word, s AS rank_micros
    FROM r3 ORDER BY s DESC, word LIMIT 30
    """,
)
def q165_textrank(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the corpus word-adjacency graph (undirected = both directions,
    multi-edges weighted by co-occurrence multiplicity), top-30 words —
    the graph-centrality upgrade of raw-TF keyword reports, composed
    entirely from shipped machinery: q43's shuffle-free zip_with
    bigrams feed operators/linkgraph.py:pagerank_micros' integer-exact
    damped recurrence (floor division each step → bit-stable under any
    partitioning; the ORACLE unrolls the identical 3 rounds). The graph
    is VOCABULARY-sized — joins and aggs never touch corpus-row
    cardinality after the bigram count; top-k plans as
    TakeOrderedAndProject."""
    from .operators.linkgraph import pagerank_micros

    toks = _tokens_df(spark, sf_dir).select("tokens")
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(
                    F.col("tokens"), 1,
                    F.greatest(F.size("tokens") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("tokens"), 2,
                    F.greatest(F.size("tokens") - 1, F.lit(0)),
                ),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = pagerank_micros(edges, n_iter=3)
    return (
        pr.select(F.col("node").alias("word"), "rank_micros")
        .orderBy(F.desc("rank_micros"), "word")
        .limit(30)
    )


def _hll_shard_oracle(p: int = 6) -> str:
    """q166 oracle: per-shard HLL sketches (doc_id parity) plus their
    max-merge, each estimated with the exact q124 arithmetic. The
    'merged' shard is literally UNION ALL + max over register — the
    same algebra as operators/sketches.py:hll_merge."""
    from .operators.sketches import _alpha

    m = 1 << p
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)
    return f"""
    WITH k AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS shard,
             unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS key
      FROM documents
    ),
    h AS (
      SELECT shard,
             ('0x' || substr(md5(key), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(key), 9, 8))::BIGINT AS lo
      FROM k
    ),
    r AS (
      SELECT shard, CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             (hi % {div}) * 4294967296 + lo AS rem
      FROM h
    ),
    sk0 AS (
      SELECT shard, register,
             CAST(max({width} - ({bits}) + 1) AS BIGINT) AS max_rho
      FROM r GROUP BY shard, register
    ),
    sk AS (
      SELECT shard, register, max_rho FROM sk0
      UNION ALL
      SELECT 'merged', register, max(max_rho)
      FROM sk0 GROUP BY register
    ),
    a AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_hi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_lo
      FROM sk GROUP BY shard
    )
    SELECT shard, CAST({m} AS BIGINT) AS m, n_hit AS n_registers_hit,
           CAST(floor({num!r} / (CAST(harmonic_hi AS DOUBLE)
                       * 4294967296.0
                     + CAST(harmonic_lo AS DOUBLE)
                     + CAST({m} - n_hit AS DOUBLE)
                       * 2305843009213693952.0)) AS BIGINT)
             AS estimate_micros
    FROM a
    """


@q("q166_hll_shard_merge", _hll_shard_oracle(p=6))
def q166_hll_shard_merge(spark, sf_dir):
    """Cross-shard HLL mergeability, end-to-end: the corpus is split
    into two shards (doc_id parity), each shard builds its own sketch
    (operators/sketches.py:hll_registers), and hll_merge unions them by
    element-wise register max — the exact algebra that makes HLL the
    production cardinality answer (union across 10^5 parquet shards or
    across RUNS = one m-row max-groupBy, never a re-scan of old data;
    composes with plans/state.py's cross-run log the way q106's
    incremental dedup does). Output: per-shard AND merged raw
    estimates, all integer-exact until the single final division. The
    ORACLE replays both shard sketches and states the merge as
    UNION ALL + max(register) — hash-equality proves merge(sketch_e,
    sketch_o) ≡ sketch(e ∪ o) on this corpus."""
    from .operators.sketches import hll_estimate, hll_merge, hll_registers

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key"),
    )
    even = hll_registers(toks.filter(F.col("doc_id") % 2 == 0), "key", p=6)
    odd = hll_registers(toks.filter(F.col("doc_id") % 2 == 1), "key", p=6)
    merged = hll_merge(even, odd)

    def est(sk, name):
        return hll_estimate(sk, p=6).select(
            F.lit(name).alias("shard"), "m", "n_registers_hit",
            "estimate_micros",
        )

    return (
        est(even, "even")
        .unionByName(est(odd, "odd"))
        .unionByName(est(merged, "merged"))
    )


@q(
    "q167_link_prediction_ra",
    """
    WITH n AS (SELECT count(*) AS N FROM documents),
    e AS (
      SELECT doc_id AS s, (doc_id + 1) % N AS d FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id + 2) % N FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id * 7 + 3) % N FROM documents, n
    ),
    und AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM e WHERE s <> d
    ),
    nb AS (SELECT a AS node, b AS nbr FROM und
           UNION ALL SELECT b, a FROM und),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
            FROM nb GROUP BY node),
    w AS (
      SELECT l.nbr AS x, r.nbr AS y, d.deg
      FROM nb l JOIN deg d ON l.node = d.node
      JOIN nb r ON r.node = l.node
      WHERE l.nbr < r.nbr
    ),
    sc AS (
      SELECT x AS a, y AS b,
             CAST(sum(1000000 // deg) AS BIGINT) AS ra_micros,
             CAST(count(*) AS BIGINT) AS n_common
      FROM w GROUP BY x, y
    )
    SELECT a, b, ra_micros, n_common
    FROM sc
    WHERE NOT EXISTS (SELECT 1 FROM und u
                      WHERE u.a = sc.a AND u.b = sc.b)
    ORDER BY ra_micros DESC, a, b LIMIT 50
    """,
)
def q167_link_prediction_ra(spark, sf_dir):
    """Resource-Allocation link prediction over q130's synthesized host
    graph (operators/linkgraph.py:resource_allocation; Zhou-Lü-Zhang
    2009): for each non-adjacent pair with common neighbors,
    Σ 1e6 div deg(z) — integer-exact Adamic-Adar (1/deg, no float log),
    ranking "likely related but unlinked" hosts for frontier seed
    expansion. The pair generator is the adjacency list self-joined on
    the WEDGE CENTER (equi-join, never all-pairs; Σ deg² cost bounded
    by the max_degree hub cap at corpus scale), existing edges removed
    by one anti-join. Top-50 plans as TakeOrderedAndProject."""
    from .operators.linkgraph import resource_allocation

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = None
    for expr in (
        (F.col("doc_id") + 1) % F.col("N"),
        (F.col("doc_id") + 2) % F.col("N"),
        (F.col("doc_id") * 7 + 3) % F.col("N"),
    ):
        part = base.select(
            F.col("doc_id").alias("src"), expr.alias("dst")
        )
        edges = part if edges is None else edges.unionByName(part)
    ra = resource_allocation(edges)
    return ra.select("a", "b", "ra_micros", "n_common").orderBy(
        F.desc("ra_micros"), "a", "b"
    ).limit(50)


@q(
    "q168_term_burstiness",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS word
      FROM documents
    ),
    pd AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, word
    ),
    pw AS (
      SELECT word, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS cf,
             CAST(sum(c * c) AS BIGINT) AS c2
      FROM pd GROUP BY word
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
    SELECT word, df, cf,
           (1000000 * (nd * c2 - cf * cf)) // (nd * cf)
             AS burstiness_micros
    FROM pw, n WHERE cf >= 2
    ORDER BY burstiness_micros DESC, word LIMIT 30
    """,
)
def q168_term_burstiness(spark, sf_dir):
    """Term burstiness (operators/textstats.py:term_burstiness; Church
    & Gale 1995 Poisson mixtures): Fisher dispersion of each term's
    per-document count, zeros included — integer-exact
    variance-to-mean in micros. Poisson-scattered glue words sit near
    1e6; topical terms and template-stamped phrases score far above —
    a stopword-free keyword prior and boilerplate-flood detector. Two
    map-combined HashAggregates ((doc,word) then (word) carrying Σc and
    Σc²; the per-doc count table never materializes corpus-wide), N
    broadcast as a 1-row scalar. Top-30 plans as
    TakeOrderedAndProject."""
    from .operators.textstats import term_burstiness

    d = _read(spark, sf_dir, "documents")
    return term_burstiness(d, min_cf=2).orderBy(
        F.desc("burstiness_micros"), "word"
    ).limit(30)


@q(
    "q169_calibration_bins",
    """
    WITH toks AS (
      SELECT doc_id, n_chars,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    sc AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS y,
             CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(coalesce(list_sum(list_transform(l, w ->
               (((('0x' || substr(md5(w), 1, 8))::BIGINT % 1048576)
                 * 2654435761) % 2000001) - 1000000)), 0) AS BIGINT)
               AS score_micros
      FROM toks WHERE len(l) > 0
    ),
    b AS (
      SELECT y,
             (score_micros + 1000000 * n_tokens) // n_tokens AS shifted,
             least(9, ((score_micros + 1000000 * n_tokens) // n_tokens)
                      // 200000) AS bin
      FROM sc
    ),
    g AS (
      SELECT CAST(bin AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(shifted) AS BIGINT) AS s
      FROM b GROUP BY bin
    )
    SELECT bin, CAST(bin AS BIGINT) * 200000 - 1000000 AS lo_micros,
           n_docs, n_pos,
           (n_pos * 1000000) // n_docs AS pos_rate_micros,
           (s // n_docs) - 1000000 AS mean_score_micros
    FROM g
    """,
)
def q169_calibration_bins(spark, sf_dir):
    """Reliability diagram for the hashed linear quality classifier
    (operators/classifier.py:calibration_bins): fixed-width mean-score
    bins × observed positive rate (label = the q122 curation prior,
    n_chars ≥ 200) — the calibration check run before classifier
    scores become sampling WEIGHTS in a mixture (uncalibrated scores
    rank fine but skew score-proportional sampling; DCLM/FineWeb-Edu
    bin exactly like this). Bins are fixed ranges — never quantiles
    (that would be a global sort); the +1e6 shift keeps every floor
    division on non-negative BIGINTs so Spark div ≡ DuckDB //. One
    map-combined groupBy over ≤10 keys above the zero-Exchange scoring
    projection."""
    from .operators.classifier import calibration_bins

    d = _read(spark, sf_dir, "documents")
    return calibration_bins(
        d,
        label=F.when(F.col("n_chars") >= 200, F.lit(1)).otherwise(
            F.lit(0)
        ),
        n_bins=10,
    )


@q(
    "q170_dedup_agreement",
    """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 < 2 THEN 'duplicate content block'
                  ELSE text END AS text
      FROM documents
    ),
    fa AS (
      SELECT doc_id,
             CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1
                  THEN 1 ELSE 0 END AS flag
      FROM d
    ),
    sh AS (
      SELECT DISTINCT doc_id, substr(text, i, 12) AS gram
      FROM (
        SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 11, 1) + 1)) AS i
        FROM d WHERE length(text) >= 12
      )
    ),
    hsh AS (
      SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 8))::BIGINT AS ha,
             ('0x' || substr(md5(gram), 9, 8))::BIGINT AS hb
      FROM sh
    ),
    mh AS (
      SELECT doc_id, seed, min((ha + seed * hb) % 4294967296) AS mhv
      FROM hsh CROSS JOIN (SELECT unnest(range(0, 12)) AS seed)
      GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, CAST(seed // 3 AS INT) AS band,
             string_agg(lower(lpad(hex(mhv), 8, '0')), ''
                        ORDER BY seed) AS band_key
      FROM mh GROUP BY doc_id, CAST(seed // 3 AS INT)
    ),
    part AS (
      SELECT DISTINCT x.doc_id
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_key = y.band_key
       AND x.doc_id <> y.doc_id
    ),
    fb AS (
      SELECT d.doc_id,
             CASE WHEN part.doc_id IS NOT NULL THEN 1 ELSE 0 END AS flag
      FROM d LEFT JOIN part ON d.doc_id = part.doc_id
    ),
    j AS (
      SELECT fa.flag AS x, fb.flag AS y
      FROM fa JOIN fb ON fa.doc_id = fb.doc_id
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00,
             CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11
      FROM j
    )
    SELECT n00, n01, n10, n11,
           CASE WHEN n * n - ((n00 + n01) * (n00 + n10)
                  + (n10 + n11) * (n01 + n11)) = 0 THEN NULL
                WHEN n * (n00 + n11) - ((n00 + n01) * (n00 + n10)
                  + (n10 + n11) * (n01 + n11)) >= 0
                THEN (1000000 * (n * (n00 + n11) - ((n00 + n01)
                      * (n00 + n10) + (n10 + n11) * (n01 + n11))))
                     // (n * n - ((n00 + n01) * (n00 + n10)
                      + (n10 + n11) * (n01 + n11)))
                ELSE -((1000000 * (((n00 + n01) * (n00 + n10)
                      + (n10 + n11) * (n01 + n11)) - n * (n00 + n11)))
                     // (n * n - ((n00 + n01) * (n00 + n10)
                      + (n10 + n11) * (n01 + n11))))
           END AS kappa_micros
    FROM c
    """,
)
def q170_dedup_agreement(spark, sf_dir):
    """Cohen's kappa between two dedup methods on the same corpus
    (operators/dedup.py:dedup_agreement): exact content-hash verdicts
    vs MinHash-LSH candidate membership, over q16's synthesized dup
    population (doc_id%7<2 share one payload). Chance-corrected
    agreement is the statistic that decides whether the cheap method
    can replace the expensive one — raw overlap is inflated by the
    "both say unique" mass. Contingency + kappa are four sums and one
    guarded division (|numerator| with the sign re-applied, because
    kappa can be negative and Spark div truncates while DuckDB //
    floors); the flag tables are one hash-groupBy and one band
    equi-join — both corpus-scale-safe shapes already proven by
    q16/q18."""
    from .operators.dedup import (
        char_shingles,
        dedup_agreement,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 < 2, F.lit("duplicate content block")
        ).otherwise(F.col("text")).alias("text"),
    )
    h = d.select("doc_id", F.md5("text").alias("_h"))
    grp = h.groupBy("_h").agg(F.count("*").alias("_n"))
    flags_a = h.join(grp, "_h").select(
        "doc_id",
        F.when(F.col("_n") > 1, F.lit(1)).otherwise(F.lit(0))
        .alias("flag"),
    )
    grams = char_shingles(d, text_col="text", k=12)
    cand = lsh_candidate_pairs(
        lsh_bands(minhash_signatures(grams, n_hashes=12),
                  rows_per_band=3)
    )
    part = (
        cand.select(F.col("a_id").alias("doc_id"))
        .unionByName(cand.select(F.col("b_id").alias("doc_id")))
        .distinct()
        .withColumn("_in", F.lit(1))
    )
    flags_b = d.select("doc_id").join(part, "doc_id", "left").select(
        "doc_id",
        F.coalesce("_in", F.lit(0)).alias("flag"),
    )
    return dedup_agreement(flags_a, flags_b)


@q(
    "q171_vocab_concentration",
    """
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS w
      FROM documents
    ),
    wc AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    ),
    g AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c * c) AS BIGINT) AS c2
      FROM wc GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           (1000000 * c2) // (n_tokens * n_tokens) AS hhi_micros
    FROM g ORDER BY source
    """,
)
def q171_vocab_concentration(spark, sf_dir):
    """Per-source vocabulary concentration (operators/textstats.py:
    vocab_concentration): Simpson/Herfindahl index of each source's
    unigram distribution — the probability two tokens drawn from the
    source are the same type, exact BIGINT. Concentration reacts to
    the HEAD of the distribution (template phrases) where
    lexical_diversity's TTR reacts to the tail — together they price
    a source's redundancy before per-doc dedup spend. Same two
    map-combined HashAggregates as q141; output is group-sized."""
    from .operators.textstats import vocab_concentration

    d = _read(spark, sf_dir, "documents")
    return vocab_concentration(d, group_col="source").orderBy("source")


@q(
    "q172_rake_keywords",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS toks
      FROM documents
    ),
    t AS (
      SELECT doc_id, i AS pos, toks[i] AS w,
             CASE WHEN toks[i] IN ('the','a','and','of','is','this')
                  THEN 1 ELSE 0 END AS st
      FROM (SELECT doc_id, toks,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM base)
    ),
    p AS (
      SELECT doc_id, w, st,
             sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
      FROM t
    ),
    ph AS (
      SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
      FROM p WHERE st = 0 GROUP BY doc_id, pid
    ),
    wr AS (
      SELECT p.w, ph.plen
      FROM p JOIN ph ON p.doc_id = ph.doc_id AND p.pid = ph.pid
      WHERE p.st = 0
    ),
    agg AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
      FROM wr GROUP BY w
    )
    SELECT word, freq, deg, (1000000 * deg) // freq AS rake_micros
    FROM agg ORDER BY rake_micros DESC, word LIMIT 30
    """,
)
def q172_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (operators/textstats.py:rake_keywords;
    Rose et al. 2010): stopword-delimited phrases, word score =
    degree/frequency in integer micros — the one-pass, no-iteration
    cheap sibling of q165's TextRank (same corpus, same tokenizer,
    different centrality notion: phrase-length degree vs graph rank).
    Segmentation is a per-document running stopword count — a window
    PARTITIONED BY doc (never global); phrase lengths join back on the
    (doc, phrase) key; the final agg is vocabulary-sized. Top-30 plans
    as TakeOrderedAndProject."""
    from .operators.textstats import rake_keywords

    d = _read(spark, sf_dir, "documents")
    return rake_keywords(
        d, stopwords=["the", "a", "and", "of", "is", "this"]
    ).orderBy(F.desc("rake_micros"), "word").limit(30)


@q(
    "q173_packing_efficiency",
    """
    WITH base AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(lower(trim(
               regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS BIGINT) AS n
      FROM documents
    ),
    o AS (
      SELECT source, n,
             CAST(coalesce(sum(n) OVER (PARTITION BY source
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
               1 PRECEDING), 0) AS BIGINT) AS off
      FROM base WHERE n > 0
    ),
    s AS (
      SELECT source, n, off // 256 AS s0, (off + n - 1) // 256 AS s1
      FROM o
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_tokens,
             CAST(max(s1) + 1 AS BIGINT) AS n_seqs,
             CAST(sum(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boundary_docs
      FROM s GROUP BY source
    )
    SELECT source, n_docs, total_tokens, n_seqs,
           (total_tokens * 1000000) // (n_seqs * 256) AS fill_micros,
           n_boundary_docs
    FROM g ORDER BY source
    """,
)
def q173_packing_efficiency(spark, sf_dir):
    """Packing-efficiency report (operators/chunking.py:
    packing_efficiency) over q117's GPT-style sequence packing: per
    source, ctx-sequence fill rate and boundary-straddling doc count —
    the numbers that price wasted tail tokens (paid every epoch) and
    decide whether boundary docs need attention-mask resets. Group-
    sized aggregate above pack_sequences' single group-keyed Exchange
    (the cumulative window is partitioned by source, never global)."""
    from .operators.chunking import packing_efficiency

    d = _read(spark, sf_dir, "documents")
    return packing_efficiency(d, ctx=256, group_col="source").orderBy(
        "source"
    )


@q(
    "q174_kwic",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, toks, i
      FROM (SELECT doc_id, toks,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM base)
      WHERE toks[i] = 'join'
    )
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           coalesce(array_to_string(toks[greatest(i - 3, 1):i - 1],
                                    ' '), '') AS left_ctx,
           coalesce(array_to_string(toks[i + 1:i + 3], ' '), '')
             AS right_ctx
    FROM hits
    """,
)
def q174_kwic(spark, sf_dir):
    """Keyword-in-context concordance (operators/textstats.py:
    kwic_concordance): every occurrence of the probe term with ±3
    tokens of context — the corpus-linguistics audit run before
    writing a filter around a term (a blocklist rule reads differently
    against its concordance than against its count). One posexplode
    above the scan; the tokens array rides along in the row so context
    slicing is pure array codegen — no join-back, no window, zero
    shuffle."""
    from .operators.textstats import kwic_concordance

    d = _read(spark, sf_dir, "documents")
    return kwic_concordance(d, probe="join", ctx=3)


@q(
    "q175_minhash_vs_exact",
    _MINHASH_CTES
    + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.a_id, c.b_id,
             (CAST(sum(CASE WHEN x.mhv = y.mhv THEN 1 ELSE 0 END)
                   AS BIGINT) * 1000000) // 12 AS est_micros
      FROM cand c
      JOIN mh x ON x.doc_id = c.a_id
      JOIN mh y ON y.doc_id = c.b_id AND y.seed = x.seed
      GROUP BY c.a_id, c.b_id
    ),
    sizes AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      FROM sh GROUP BY doc_id
    ),
    inter AS (
      SELECT c.a_id, c.b_id, CAST(count(*) AS BIGINT) AS ni
      FROM cand c
      JOIN sh ga ON ga.doc_id = c.a_id
      JOIN sh gb ON gb.doc_id = c.b_id AND gb.gram = ga.gram
      GROUP BY c.a_id, c.b_id
    )
    SELECT e.a_id, e.b_id, e.est_micros,
           coalesce((i.ni * 1000000)
                    // (sa.n + sb.n - i.ni), 0) AS exact_micros
    FROM est e
    JOIN sizes sa ON sa.doc_id = e.a_id
    JOIN sizes sb ON sb.doc_id = e.b_id
    LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
    """,
)
def q175_minhash_vs_exact(spark, sf_dir):
    """Sketch-quality audit (operators/dedup.py:minhash_jaccard_eval):
    MinHash-estimated vs exact shingle Jaccard for every LSH candidate
    pair — the calibration table for banding parameters (estimate ≫
    exact rows are LSH false-positive mass; near-threshold est ≪ exact
    rows are recall losses), measured BEFORE a corpus-scale dedup run.
    The estimate joins signature rows (candidate-set × 12 seeds); the
    exact side is the shared-shingle equi-join restricted to
    candidates — the same verifier-only discipline as q19. Never
    corpus²."""
    from .operators.dedup import char_shingles, minhash_jaccard_eval

    t = _tokstr_df(spark, sf_dir)
    grams = char_shingles(t, text_col="tok_str", k=12)
    return minhash_jaccard_eval(grams, n_hashes=12, rows_per_band=3)


@q(
    "q176_temperature_rates",
    """
    WITH dt AS (
      SELECT source,
             CAST(sum(len(list_filter(string_split(lower(trim(
               regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0))) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    s AS (
      SELECT source, n,
             CAST(floor(sqrt(n * 1000000.0)) AS BIGINT) AS sq
      FROM dt
    ),
    t AS (SELECT CAST(sum(sq) AS BIGINT) AS tot FROM s)
    SELECT source, n AS n_tokens, sq AS sqrt_scale,
           (sq * 1000000) // tot AS rate_micros
    FROM s, t ORDER BY source
    """,
)
def q176_temperature_rates(spark, sf_dir):
    """Temperature-scaled mixture rates at α = 1/2 (operators/
    mixing.py:sqrt_temperature_rates; the mBERT/XLM-R exponent-smooth
    rebalance): sampling share ∝ √(source token count), so head
    sources stop drowning the tail. The ONLY float op is one
    correctly-rounded IEEE sqrt per GROUP (floor(sqrt(n·1e6)) with the
    argument < 2^53) — everything after is BIGINT, which is what lets
    the oracle hash-match a "temperature" computation at all. Input is
    the group-sized token table; total is a broadcast 1-row scalar."""
    from .operators.mixing import sqrt_temperature_rates

    d = _read(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace(F.col("text"),
                                            "[^A-Za-zÀ-ÿ]+", " "))),
            " ", -1,
        ),
        lambda w: F.length(w) > 0,
    )
    dt = d.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("n_tokens")
    )
    return sqrt_temperature_rates(dt, group_col="source").orderBy(
        "source"
    )


@q(
    "q177_cluster_size_histogram",
    """
    WITH keyed AS (
      SELECT CASE WHEN doc_id % 2 = 0
                  THEN 'c' || CAST(doc_id % 50 AS VARCHAR)
                  ELSE 'u' || CAST(doc_id AS VARCHAR) END AS ck
      FROM documents
    ),
    sizes AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS sz
      FROM keyed GROUP BY ck
    ),
    b AS (
      SELECT CAST(length(printf('%b', sz)) - 1 AS INT) AS size_bin, sz
      FROM sizes
    )
    SELECT size_bin,
           CAST(1 AS BIGINT) << size_bin AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz - 1) AS BIGINT) AS n_excess_docs
    FROM b GROUP BY size_bin
    """,
)
def q177_cluster_size_histogram(spark, sf_dir):
    """Log2-binned dup-cluster size histogram (operators/dedup.py:
    cluster_size_histogram): where the duplicate MASS lives — a few
    giant clusters (cap-per-cluster policy) vs millions of pairs
    (pairwise LSH spend). Cluster keys synthesized deterministically
    (even doc_ids fold into 50 clusters, odd stay singletons) so both
    bins are populated at every SF. floor(log2) is
    length(bin(size))−1 — integer string ops, no float log; one
    cluster-count-sized partial agg + a ≤64-key rollup."""
    from .operators.dedup import cluster_size_histogram

    d = _read(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("c"), (F.col("doc_id") % 50).cast("string")),
        ).otherwise(
            F.concat(F.lit("u"), F.col("doc_id").cast("string"))
        ).alias("ck")
    )
    return cluster_size_histogram(d, key_col="ck")


@q(
    "q178_heldout_lm_eval",
    """
    WITH sp AS (
      SELECT doc_id, text,
             CASE
               WHEN ('0x' || substr(md5('split' ||
                 CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
                 < 800000 THEN 'train'
               WHEN ('0x' || substr(md5('split' ||
                 CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
                 < 900000 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    ),
    toks AS (
      SELECT doc_id, split, split = 'train' AS is_t,
             list_filter(string_split(lower(trim(regexp_replace(
               text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM sp
    ),
    big AS (
      SELECT doc_id, split, is_t, l[i] AS w1, l[i + 1] AS w2
      FROM (SELECT doc_id, split, is_t, l,
                   unnest(range(1, len(l))) AS i
            FROM toks)
    ),
    uni AS (SELECT is_t, unnest(l) AS w FROM toks),
    c1 AS (SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1
           FROM uni WHERE is_t GROUP BY w),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM big WHERE is_t GROUP BY w1, w2),
    v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz
          FROM uni WHERE is_t),
    scored AS (
      SELECT b.doc_id, b.split, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(CAST(floor(1e6 * (ln(coalesce(c12, 0) + 1)
                                        - ln(coalesce(c1, 0) + vsz)))
                           AS BIGINT)) AS BIGINT) AS lp
      FROM big b
      LEFT JOIN c12 USING (w1, w2)
      LEFT JOIN c1 USING (w1)
      CROSS JOIN v
      GROUP BY b.doc_id, b.split
    ),
    agg AS (
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nb) AS BIGINT) AS n_bigrams,
             CAST(sum(lp) AS BIGINT) AS lm_logprob_micros
      FROM scored GROUP BY split
    )
    SELECT split, n_docs, n_bigrams, lm_logprob_micros,
           CASE WHEN lm_logprob_micros >= 0
                THEN lm_logprob_micros // n_bigrams
                ELSE -((-lm_logprob_micros) // n_bigrams) END
             AS mean_bigram_micros
    FROM agg
    """,
)
def q178_heldout_lm_eval(spark, sf_dir):
    """Held-out LM evaluation (operators/lm.py:heldout_lm_eval): the
    Laplace bigram LM fits on the TRAIN split only (salted md5 buckets
    — q110's engine-portable split) and every split reports total and
    mean log-probability — eval hygiene for q73 (a model scored on its
    own training slice overstates quality; the train/val gap is the
    memorization signal). Count tables are the q73 plan (vocabulary-
    sized, broadcast V); the rollup is 3 rows; the mean uses
    sign-split floor division (sums are negative — the q170 div-vs-//
    hazard)."""
    from .operators.lm import heldout_lm_eval

    d = _read(spark, sf_dir, "documents")
    return heldout_lm_eval(d, train_micros=800_000,
                           val_micros=100_000)


@q(
    "q179_histogram_quantiles",
    """
    WITH b AS (
      SELECT lang,
             greatest(CAST(length(printf('%b',
               greatest(CAST(n_chars AS BIGINT), 1))) - 1 AS INT), 0)
               AS bin
      FROM documents
    ),
    c AS (
      SELECT lang, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY lang, bin
    ),
    cm AS (
      SELECT lang, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bin)
                  AS BIGINT) AS cum
      FROM c
    ),
    t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n
          FROM c GROUP BY lang),
    qq AS (SELECT unnest([500000, 900000]) AS q_micros)
    SELECT cm.lang, CAST(q_micros AS BIGINT) AS q_micros, t.n,
           CAST(1 AS BIGINT) << min(cm.bin) AS bin_lo
    FROM cm JOIN t ON cm.lang = t.lang CROSS JOIN qq
    WHERE cm.cum * 1000000 >= qq.q_micros * t.n
    GROUP BY cm.lang, qq.q_micros, t.n
    """,
)
def q179_histogram_quantiles(spark, sf_dir):
    """Mergeable histogram quantiles (operators/textstats.py:
    histogram_quantiles): per-language p50/p90 ORDER OF MAGNITUDE of
    document length from a power-of-2 histogram — the shuffle-free,
    engine-replayable, MERGEABLE alternative to a percentile sort
    (shard histograms sum, so cross-run quantiles never rescan old
    data — the same union algebra as q166's HLL merge; Spark's own
    percentile_approx is an opaque unoracle-able sketch). floor(log2)
    via length(bin(v))−1; the cumulative window is partitioned BY
    GROUP over a ≤64-bin table."""
    from .operators.textstats import histogram_quantiles

    d = _read(spark, sf_dir, "documents")
    return histogram_quantiles(d, group_col="lang",
                               value_col="n_chars",
                               qs_micros=(500_000, 900_000))


def _bpe_fertility_oracle() -> str:
    enc = "regexp_replace(word, '(.)', chr(31) || '\\1' || chr(30), 'g')"
    for a, b in _BPE_MERGES:
        pat = (
            f"chr(31) || '{a}' || chr(30) || chr(31) || '{b}' || chr(30)"
        )
        rep = f"chr(31) || '{a}{b}' || chr(30)"
        enc = f"replace({enc}, {pat}, {rep})"
    return f"""
    WITH w AS (
      SELECT lang, unnest(list_filter(str_split(text, ' '),
                                      x -> length(x) > 0)) AS word
      FROM documents
    ),
    e AS (SELECT lang, word, {enc} AS sym FROM w),
    g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(len(str_split(substr(sym, 2, length(sym) - 2),
                                    chr(30) || chr(31)))) AS BIGINT)
               AS n_bpe,
             CAST(sum(length(word)) AS BIGINT) AS n_word_chars
      FROM e GROUP BY lang
    )
    SELECT lang, n_words, n_bpe AS n_bpe_tokens, n_word_chars,
           (n_bpe * 1000000) // n_words AS fertility_micros,
           (n_word_chars * 1000000) // n_bpe
             AS chars_per_token_micros
    FROM g ORDER BY lang
    """


@q("q180_bpe_fertility", _bpe_fertility_oracle())
def q180_bpe_fertility(spark, sf_dir):
    """Per-language tokenizer fertility (operators/bpe.py:
    bpe_fertility; Rust et al. 2021): tokens-per-word and
    chars-per-token under the fixed q156 merge list — the two numbers
    that price a language's context-window and compute cost under a
    tokenizer, the standard input to vocabulary rebalancing. The
    encode is q156's zero-shuffle replace-fold Project; stats ride an
    id-keyed join from the same scan; one group-sized rollup. The
    ORACLE replays encode + counts symbol-exactly."""
    from .operators.bpe import bpe_fertility

    d = _read(spark, sf_dir, "documents")
    return bpe_fertility(d, _BPE_MERGES, group_col="lang").orderBy(
        "lang"
    )


@q(
    "q181_host_lang_entropy",
    """
    WITH d AS (
      SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
               AS host, lang
      FROM documents
    ),
    per AS (
      SELECT host, lang, CAST(count(*) AS BIGINT) AS cnt
      FROM d GROUP BY host, lang
    ),
    g AS (
      SELECT host, CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_labels,
             CAST(sum(CAST(floor(1e6 * cnt * ln(cnt)) AS BIGINT))
                  AS BIGINT) AS s
      FROM per GROUP BY host
    )
    SELECT host, n_docs, n_labels,
           CAST(floor(1e6 * ln(CAST(n_docs AS DOUBLE))
                      - CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE))
                AS BIGINT) AS entropy_micros
    FROM g ORDER BY host
    """,
)
def q181_host_lang_entropy(spark, sf_dir):
    """Per-host language-mix entropy (operators/textstats.py:
    group_label_entropy): monolingual hosts score 0 nats; hosts
    serving machine-translated mirror trees of every language at once
    (the MT-spam farm shape) approach ln k — the site-level curation
    signal that per-doc language ID can't see. Same integer-exact
    entropy decomposition as q159 (per-label terms quantized BEFORE
    the BIGINT sum; one canonical double finish). One (host, lang)
    partial agg + a host rollup — site-count-sized."""
    from .operators.textstats import group_label_entropy

    d = _read(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        "lang",
    )
    return group_label_entropy(d, group_col="host",
                               label_col="lang").orderBy("host")


@q(
    "q182_degree_assortativity",
    """
    WITH n AS (SELECT count(*) AS N FROM documents),
    e AS (
      SELECT doc_id AS s, (doc_id + 1) % N AS d FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id + 2) % N FROM documents, n
      UNION ALL
      SELECT doc_id, (doc_id * 7 + 3) % N FROM documents, n
    ),
    und AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM e WHERE s <> d
    ),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY a),
    p AS (
      SELECT dx.deg AS x, dy.deg AS y
      FROM sym JOIN deg dx ON sym.a = dx.node
      JOIN deg dy ON sym.b = dy.node
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS m_directed,
             CAST(sum(x) AS BIGINT) AS sum_x,
             CAST(sum(x * y) AS BIGINT) AS sum_xy,
             CAST(sum(x * x) AS BIGINT) AS sum_x2
      FROM p
    )
    SELECT m_directed, sum_x, sum_xy, sum_x2,
           CASE WHEN m_directed * sum_x2 - sum_x * sum_x > 0
                THEN CAST(floor(1e6 *
                  (CAST(m_directed AS DOUBLE) * CAST(sum_xy AS DOUBLE)
                   - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                  / (CAST(m_directed AS DOUBLE)
                     * CAST(sum_x2 AS DOUBLE)
                   - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)))
                  AS BIGINT)
           END AS assortativity_micros
    FROM agg
    """,
)
def q182_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the q130 host graph (operators/
    linkgraph.py:degree_assortativity; Newman 2002): Pearson
    correlation of endpoint degrees over the symmetric edge list —
    organic neighborhoods are mildly disassortative, interlinked
    link-farm cores strongly assortative; the one-number structural
    drift check between crawls. Exact BIGINT sufficient statistics
    (the q138 grouped-OLS discipline), one canonical double finish;
    degree table = one groupBy, two id-keyed joins, a single-row agg
    — no windows, no all-pairs."""
    from .operators.linkgraph import degree_assortativity

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = None
    for expr in (
        (F.col("doc_id") + 1) % F.col("N"),
        (F.col("doc_id") + 2) % F.col("N"),
        (F.col("doc_id") * 7 + 3) % F.col("N"),
    ):
        part = base.select(
            F.col("doc_id").alias("src"), expr.alias("dst")
        )
        edges = part if edges is None else edges.unionByName(part)
    return degree_assortativity(edges)


@q(
    "q183_dedup_shift",
    """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 < 2 THEN 'duplicate content block'
                  ELSE text END AS text
      FROM documents
    ),
    t AS (SELECT doc_id, md5(text) AS ck,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM d),
    mx AS (SELECT ck, CAST(max(n_chars) AS BIGINT) AS mc,
                  CAST(count(*) AS BIGINT) AS sz
           FROM t GROUP BY ck),
    keep AS (
      SELECT t.ck, CAST(min(t.doc_id) AS BIGINT) AS keeper,
             CAST(min(mx.mc) AS BIGINT) AS n_chars
      FROM t JOIN mx ON t.ck = mx.ck AND t.n_chars = mx.mc
      GROUP BY t.ck
    ),
    b AS (
      SELECT 'before' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM t
      UNION ALL
      SELECT 'after', CAST(count(*) AS BIGINT),
             CAST(sum(n_chars) AS BIGINT)
      FROM keep
    )
    SELECT stage, n_docs, sum_chars,
           (sum_chars * 1000000) // n_docs AS mean_chars_micros
    FROM b
    """,
)
def q183_dedup_shift(spark, sf_dir):
    """Corpus-shift report around keep-best dedup (operators/dedup.py:
    keep_best): the before/after footprint — doc count, char mass,
    mean length — that says what retention DID to the corpus (dedup
    that silently halves mean document length is a training-mix change,
    not just a size change). Survivor = longest text per exact-hash
    cluster, lowest id on ties — keep_best's max-then-tiebreak plain
    aggregates (never max(struct)/window; see its docstring plan
    notes). Two group-sized aggregates + a 2-row union."""
    from .operators.dedup import keep_best

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 < 2, F.lit("duplicate content block")
        ).otherwise(F.col("text")).alias("text"),
    )
    t = d.select(
        "doc_id", F.md5("text").alias("ck"),
        F.length("text").cast("long").alias("n_chars"),
    )
    kept = keep_best(t, cluster_col="ck", id_col="doc_id",
                     score_col="n_chars")
    before = t.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).select(F.lit("before").alias("stage"), "n_docs", "sum_chars")
    after = kept.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).select(F.lit("after").alias("stage"), "n_docs", "sum_chars")
    return before.unionByName(after).select(
        "stage", "n_docs", "sum_chars",
        F.expr("sum_chars * 1000000L div n_docs")
        .alias("mean_chars_micros"),
    )


@q(
    "q184_ann_recall",
    """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cell
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, v AS qv, cell
           FROM base WHERE vec_id < 10),
    ts AS (
      SELECT qs.query_id, b.vec_id AS nid,
             round(list_cosine_similarity(qs.qv, b.v), 4) AS sim
      FROM base b, qs WHERE b.vec_id != qs.query_id
    ),
    truth AS (
      SELECT query_id, nid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, nid) AS rk
        FROM ts) WHERE rk <= 5
    ),
    probes AS (
      SELECT query_id, qv,
             unnest([cell, xor(cell, 1), xor(cell, 2),
                     xor(cell, 4), xor(cell, 8)]) AS cell
      FROM qs
    ),
    sc AS (
      SELECT p.query_id, b.vec_id AS nid,
             round(list_cosine_similarity(p.qv, b.v), 4) AS sim
      FROM base b JOIN probes p USING (cell)
      WHERE b.vec_id != p.query_id
    ),
    approx AS (
      SELECT query_id, nid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY sim DESC, nid) AS rk
        FROM sc) WHERE rk <= 5
    )
    SELECT t.query_id,
           CAST(count(a.nid) AS BIGINT) AS n_hits,
           (CAST(count(a.nid) AS BIGINT) * 1000000) // 5
             AS recall_micros
    FROM truth t
    LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.nid = t.nid
    GROUP BY t.query_id
    """,
)
def q184_ann_recall(spark, sf_dir):
    """Recall@5 of the IVF grid search vs exact brute force
    (operators/similarity.py:ann_recall_eval): the acceptance gate
    every ANN deployment runs before trading exactness for scale —
    ground truth from the bounded brute-force verifier on a SAMPLED
    query set (recall is per-query, so sampling queries, never corpus
    rows, is the honest protocol; q149 is the dedup sibling). One
    (query, neighbor) equi-join over two top-k tables + a query-sized
    agg. The ORACLE replays truth, multi-probe search, and the
    intersection count."""
    from .operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_grid_topk,
        ann_recall_eval,
    )

    emb = _read(spark, sf_dir, "embeddings")
    truth = ann_bruteforce_topk(emb, range(10), k=5)
    approx = ann_ivf_grid_topk(emb, range(10), k=5, bits=4, hamming=1)
    return ann_recall_eval(truth, approx, k=5)


@q(
    "q185_simhash_calibration",
    _SIMHASH_CTES
    + """
    , bands AS (
      SELECT doc_id, simhash, j AS band,
             (simhash // CAST(power(2, j * 8) AS BIGINT)) % 256
               AS band_val
      FROM simhashes CROSS JOIN (SELECT unnest(range(0, 4)) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT CAST(hamming AS INT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM cand GROUP BY hamming
    """,
)
def q185_simhash_calibration(spark, sf_dir):
    """SimHash banding calibration (q175's sibling for the SimHash
    family): the FULL Hamming-distance histogram of banded candidates
    — no verify cut — so the mass beyond the dedup threshold is
    measured, not assumed (pairs at Hamming 20+ are pure
    band-coincidence cost; a fat far tail says widen the bands, a
    thin near tail says the pigeonhole guarantee is wasting joins).
    Same band equi-join as q21; the histogram is a ≤33-key rollup
    above the distinct candidate set."""
    from .operators.dedup import simhash32, simhash_near_pairs

    t = _tokens_df(spark, sf_dir)
    tc = (
        t.select("doc_id", F.explode("tokens").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = simhash_near_pairs(simhash32(tc), max_hamming=32)
    return pairs.groupBy(
        F.col("hamming").cast("int").alias("hamming")
    ).agg(F.count("*").cast("bigint").alias("n_pairs"))


@q(
    "q186_histogram_shard_merge",
    """
    WITH b AS (
      SELECT lang, doc_id % 2 AS shard,
             greatest(CAST(length(printf('%b',
               greatest(CAST(n_chars AS BIGINT), 1))) - 1 AS INT), 0)
               AS bin
      FROM documents
    ),
    shard_hist AS (
      SELECT shard, lang, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY shard, lang, bin
    ),
    merged AS (
      SELECT lang, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM shard_hist GROUP BY lang, bin
    ),
    cm AS (
      SELECT lang, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bin)
                  AS BIGINT) AS cum
      FROM merged
    ),
    t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n
          FROM merged GROUP BY lang),
    qq AS (SELECT unnest([500000, 900000]) AS q_micros)
    SELECT cm.lang, CAST(q_micros AS BIGINT) AS q_micros, t.n,
           CAST(1 AS BIGINT) << min(cm.bin) AS bin_lo
    FROM cm JOIN t ON cm.lang = t.lang CROSS JOIN qq
    WHERE cm.cum * 1000000 >= qq.q_micros * t.n
    GROUP BY cm.lang, qq.q_micros, t.n
    """,
)
def q186_histogram_shard_merge(spark, sf_dir):
    """Cross-shard histogram-sketch merge (operators/textstats.py:
    histogram_quantiles_from_counts): each doc_id-parity shard builds
    its own (lang, bin) count table, the tables UNION + SUM (the
    entire merge — counts are the sketch), and the merged histogram
    feeds the identical quantile selection as q179 — proving
    union-then-sum ≡ build-on-the-union by hash equality, the same
    cross-run algebra as q166's HLL merge but for QUANTILES. At 10^5
    parquet shards the merge input is (shards × groups × ≤64 bins)
    rows of three integers."""
    from .operators.textstats import histogram_quantiles_from_counts

    d = _read(spark, sf_dir, "documents")
    binned = d.select(
        F.col("lang").alias("grp"),
        (F.col("doc_id") % 2).alias("_shard"),
        F.greatest(
            (F.length(F.bin(F.greatest(F.col("n_chars").cast("long"),
                                       F.lit(1)))) - 1).cast("int"),
            F.lit(0),
        ).alias("bin"),
    )
    shard_hist = binned.groupBy("_shard", "grp", "bin").agg(
        F.count("*").cast("bigint").alias("c")
    )
    even = shard_hist.filter(F.col("_shard") == 0).drop("_shard")
    odd = shard_hist.filter(F.col("_shard") == 1).drop("_shard")
    return histogram_quantiles_from_counts(
        even.unionByName(odd), qs_micros=(500_000, 900_000),
        group_out="lang",
    )


@q(
    "q187_frequency_subsample",
    """
    WITH toks AS (
      SELECT doc_id, i - 1 AS pos, l[i] AS w
      FROM (
        SELECT doc_id,
               list_filter(string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
                 x -> length(x) > 0) AS l,
               unnest(range(1, len(list_filter(string_split(lower(trim(
                 regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))),
                 ' '), x -> length(x) > 0)) + 1)) AS i
        FROM documents
      )
    ),
    cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf
           FROM toks GROUP BY w),
    tot AS (SELECT CAST(sum(cf) AS BIGINT) AS t FROM cf),
    th AS (
      SELECT w, cf,
             least(CAST(1000000 AS BIGINT),
                   CAST(floor(sqrt(CAST((1000 * t * 1000000) // cf
                                        AS DOUBLE))) AS BIGINT))
               AS threshold_micros
      FROM cf, tot
    ),
    m AS (
      SELECT th.w, th.cf, th.threshold_micros,
             CASE WHEN ('0x' || substr(md5(
                    CAST(toks.doc_id AS VARCHAR) || ':' ||
                    CAST(toks.pos AS VARCHAR) || ':' || toks.w),
                    1, 8))::BIGINT % 1000000 < th.threshold_micros
                  THEN 1 ELSE 0 END AS keep
      FROM toks JOIN th ON toks.w = th.w
    )
    SELECT w AS word, cf, threshold_micros,
           CAST(sum(keep) AS BIGINT) AS n_kept
    FROM m GROUP BY w, cf, threshold_micros
    """,
)
def q187_frequency_subsample(spark, sf_dir):
    """word2vec-style frequent-word subsampling (operators/mixing.py:
    frequency_subsample; Mikolov 2013): keep probability √(t/f) per
    occurrence — "the"-class tokens downsampled hard, rare words
    untouched — with BOTH the threshold (one IEEE sqrt of an exact
    BIGINT, the q176 discipline) and every per-occurrence coin
    (md5(doc:pos:word) bucket) fully deterministic, so the sampled
    corpus is rerun- and partition-stable and the ORACLE replays every
    single keep decision. One vocab agg + broadcast total + one more
    token-stream pass against the Heaps-sized vocab dim."""
    from .operators.mixing import frequency_subsample

    d = _read(spark, sf_dir, "documents")
    return frequency_subsample(d, t_micros=1000)


@q(
    "q188_pii_density",
    f"""
    WITH aug AS (
      SELECT source,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' Contact user' || doc_id
                    || '@mail.example.com or 10.' || (doc_id % 256)
                    || '.0.1.'
             ELSE text END AS t
      FROM documents
    ),
    c AS (
      SELECT source,
             CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT)
               AS ne,
             CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS BIGINT)
               AS ni,
             CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT)
               AS np,
             CAST(length(t) AS BIGINT) AS ch
      FROM aug
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_docs_with_pii,
             CAST(sum(ne) AS BIGINT) AS n_emails,
             CAST(sum(ni) AS BIGINT) AS n_ips,
             CAST(sum(np) AS BIGINT) AS n_phones,
             CAST(sum(ch) AS BIGINT) AS chars
      FROM c GROUP BY source
    )
    SELECT source, n_docs, n_docs_with_pii, n_emails, n_ips, n_phones,
           ((n_emails + n_ips + n_phones) * 1000000) // chars
             AS pii_per_mchar
    FROM g ORDER BY source
    """,
)
def q188_pii_density(spark, sf_dir):
    """Per-source PII density audit (operators/redact.py:pii_density):
    matches per million characters plus per-type totals — the release
    audit that finds people-directory / paste-site shards needing
    source-level handling before per-doc masking (deterministic PII is
    spliced into every third document so densities differ by
    construction). The counting projection is redact_pii's
    shuffle-free codegen scan; the rollup is group-sized; all-integer
    output."""
    from .operators.redact import pii_density

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = d.select(
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" Contact user"), sid,
                F.lit("@mail.example.com or 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1."),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return pii_density(aug, group_col="source").orderBy("source")


_Q189_SNAPSHOT_CTE = """
    c1{s} AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
              FROM e{s} JOIN r0 ON e{s}.src = r0.node GROUP BY dst),
    r1{s} AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                     AS s
              FROM documents d LEFT JOIN c1{s} ON d.doc_id = c1{s}.dst),
    c2{s} AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
              FROM e{s} JOIN r1{s} ON e{s}.src = r1{s}.node
              GROUP BY dst),
    r2{s} AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                     AS s
              FROM documents d LEFT JOIN c2{s} ON d.doc_id = c2{s}.dst),
    c3{s} AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
              FROM e{s} JOIN r2{s} ON e{s}.src = r2{s}.node
              GROUP BY dst),
    r3{s} AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT)
                     AS s
              FROM documents d LEFT JOIN c3{s} ON d.doc_id = c3{s}.dst)
"""


@q(
    "q189_pagerank_drift",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    ea AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    eb AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 11 + 5) % N FROM documents, nn
    ),
    r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS s
           FROM documents),
    """
    + _Q189_SNAPSHOT_CTE.format(s="a")
    + ","
    + _Q189_SNAPSHOT_CTE.format(s="b")
    + """
    SELECT ra.node, ra.s AS rank_a_micros, rb.s AS rank_b_micros,
           rb.s - ra.s AS delta_micros
    FROM r3a ra JOIN r3b rb ON ra.node = rb.node
    ORDER BY abs(rb.s - ra.s) DESC, ra.node LIMIT 30
    """,
)
def q189_pagerank_drift(spark, sf_dir):
    """PageRank drift between two crawl snapshots (composes
    operators/linkgraph.py:pagerank_micros twice): snapshot B swaps
    one edge family, and the report ranks the biggest rank movers —
    the per-node complement of q182's one-number structural drift
    (a spam cluster growing between crawls shows up here FIRST, as
    correlated upward deltas on its members). Ranks are integer
    micros with floor division every step, so the DELTA is exact —
    float PageRank deltas at 1e-6 scale would be noise. Two
    independent 3-round join+groupBy recurrences + one id-keyed join;
    top-30 plans as TakeOrderedAndProject."""
    from .operators.linkgraph import pagerank_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))

    def graph(k2):
        return base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
        ).unionByName(
            base.select(
                F.col("doc_id").alias("src"),
                ((F.col("doc_id") * k2 + 5) % F.col("N")).alias("dst"),
            )
        )

    ra = pagerank_micros(graph(13), n_iter=3).select(
        F.col("node"), F.col("rank_micros").alias("rank_a_micros")
    )
    rb = pagerank_micros(graph(11), n_iter=3).select(
        F.col("node"), F.col("rank_micros").alias("rank_b_micros")
    )
    j = ra.join(rb, "node").select(
        "node", "rank_a_micros", "rank_b_micros",
        (F.col("rank_b_micros") - F.col("rank_a_micros"))
        .alias("delta_micros"),
    )
    return j.orderBy(
        F.abs(F.col("delta_micros")).desc(), "node"
    ).limit(30)


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction+TF over synthesized pages at sf0.001 —
    pandas-UDF parse → native tokenize → salted corpus TF."""
    docs = documents_as_pages(spark, "/root/testdata/sf0.001")
    ex = extract_pages(docs)
    return tfops.corpus_tf(ex, n_salts=8).limit(1000)


# ---------------------------------------------------------------------------
# round-4 wave 7: curation gates the FineWeb/C4 recipes still lacked
# ---------------------------------------------------------------------------

_MOJIBAKE_SPLICE_FULL = ' CafÃ© crÃ¨me â€” Ã±oÃ±o â€œ Ã¼ber Â°'

@q(
    "q190_badwords_filter",
    """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN
               text || ' casino viagra jackpot'
             ELSE text END AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id, w
      FROM (SELECT doc_id,
                   unnest(string_split(lower(t), ' ')) AS w
            FROM aug)
      WHERE length(w) > 0
    ),
    g AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN w IN ('casino','viagra','lottery',
                                      'jackpot','betting','pills',
                                      'crypto-giveaway','xxx')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_bad,
           n_bad * 1000000 // n_tokens AS bad_per_mtoken,
           n_bad > 0 AS blocked
    FROM g
    """,
)
def q190_badwords_filter(spark, sf_dir):
    """C4's word-blocklist gate (operators/blocklist.py:badword_stats;
    Raffel et al. 2020 use the LDNOOBW list at this exact point in the
    recipe): any blocklisted token drops the page; the density column
    (integer micros) keeps the threshold tunable. Spam markers are
    spliced into every 5th document so both verdicts occur by
    construction. Plan: the blocklist is a folded codegen IN predicate
    on the exploded token stream -- one partial-agg groupBy on the doc
    key, no join, no broadcast, no second shuffle at any corpus size."""
    from .operators.blocklist import badword_stats

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" casino viagra jackpot")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return badword_stats(aug)


@q(
    "q191_soft404",
    """
    WITH pages AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN '404 Not Found - Doc ' || doc_id
                  ELSE 'Doc ' || doc_id END AS title,
             CASE WHEN doc_id % 11 = 0
                  THEN 'page not found ' || text
                  ELSE text END AS t
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             regexp_matches(lower(title),
               '(404 not found|page not found|error 404|no longer available|page cannot be found)')
               AS title_404,
             regexp_matches(lower(t),
               '(404 not found|page not found|error 404|no longer available|page cannot be found)')
               AS body_404,
             (SELECT count(*) FROM unnest(string_split(t, ' ')) AS u(w)
              WHERE length(w) > 0) < 30 AS thin_content
      FROM pages
    )
    SELECT doc_id, title_404, body_404, thin_content,
           title_404 OR (body_404 AND thin_content) AS soft404
    FROM f
    """,
)
def q191_soft404(spark, sf_dir):
    """Soft-404 detection (operators/textstats.py:soft404_flags): HTTP-200
    error pages ("page not found" served as a real page -- Bar-Yossef et
    al. WWW'04) are near-duplicate junk that dedup alone finds too late;
    the gate is title-phrase OR (body-phrase AND thin), so prose that
    merely MENTIONS a 404 on a long page survives. Synthesized: every 7th
    doc gets an error title, every 11th an error body lead-in; thinness
    falls out of the corpus's own length spread. Plan: three codegen
    predicates on the row -- no shuffle, no UDF, no join."""
    from .operators.textstats import soft404_flags

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    pages = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("404 Not Found - Doc "), sid),
        ).otherwise(F.concat(F.lit("Doc "), sid)).alias("title"),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("page not found "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return soft404_flags(pages)


@q("q192_mojibake_repair", """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN
               text || ' CafÃ© crÃ¨me â€” Ã±oÃ±o â€œ Ã¼ber Â°'
             ELSE text END AS t
      FROM documents
    ),
    chain AS (
      SELECT doc_id, t,
             replace(t, 'â€™', '’') AS t0,
             replace(t0, 'â€œ', '“') AS t1,
             replace(t1, 'â€“', '–') AS t2,
             replace(t2, 'â€”', '—') AS t3,
             replace(t3, 'Ã¡', 'á') AS t4,
             replace(t4, 'Ã©', 'é') AS t5,
             replace(t5, 'Ã­', 'í') AS t6,
             replace(t6, 'Ã³', 'ó') AS t7,
             replace(t7, 'Ãº', 'ú') AS t8,
             replace(t8, 'Ã±', 'ñ') AS t9,
             replace(t9, 'Ã§', 'ç') AS t10,
             replace(t10, 'Ã£', 'ã') AS t11,
             replace(t11, 'Ãµ', 'õ') AS t12,
             replace(t12, 'Ã¢', 'â') AS t13,
             replace(t13, 'Ãª', 'ê') AS t14,
             replace(t14, 'Ã´', 'ô') AS t15,
             replace(t15, 'Ã¼', 'ü') AS t16,
             replace(t16, 'Ã¨', 'è') AS t17,
             replace(t17, 'Â°', '°') AS t18,
             replace(t18, 'Â·', '·') AS t19,
             replace(t19, 'Â ', ' ') AS t20
      FROM aug
    )
    SELECT doc_id, t20 AS repaired_text,
           CAST((length(t) - length(t0)) // 2
               + (length(t0) - length(t1)) // 2
               + (length(t1) - length(t2)) // 2
               + (length(t2) - length(t3)) // 2
               + (length(t3) - length(t4)) // 1
               + (length(t4) - length(t5)) // 1
               + (length(t5) - length(t6)) // 1
               + (length(t6) - length(t7)) // 1
               + (length(t7) - length(t8)) // 1
               + (length(t8) - length(t9)) // 1
               + (length(t9) - length(t10)) // 1
               + (length(t10) - length(t11)) // 1
               + (length(t11) - length(t12)) // 1
               + (length(t12) - length(t13)) // 1
               + (length(t13) - length(t14)) // 1
               + (length(t14) - length(t15)) // 1
               + (length(t15) - length(t16)) // 1
               + (length(t16) - length(t17)) // 1
               + (length(t17) - length(t18)) // 1
               + (length(t18) - length(t19)) // 1
               + (length(t19) - length(t20)) // 1 AS BIGINT) AS n_repairs
    FROM chain
    """)
def q192_mojibake_repair(spark, sf_dir):
    """Mojibake repair (functions/normalize.py:with_repaired_text;
    ftfy's core case as a closed-form table): UTF-8 pages decoded as
    latin-1 upstream leave "A-tilde-copyright"-class digraphs that
    poison tokens, dedup shingles, and embeddings alike. The bounded
    MOJIBAKE_MAP chain repairs the dominant Latin-1 mislabels in pure
    codegen (21 StringReplace nodes in one whole-stage span), and
    n_repairs is exact length-delta arithmetic -- no regex count, no
    second scan, no Python. Mojibake is spliced into every 4th document
    so repairs occur by construction; the oracle replays the identical
    replace chain stepwise and recomputes the same deltas."""
    from .functions.normalize import with_repaired_text

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(_MOJIBAKE_SPLICE_FULL)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return with_repaired_text(aug).select(
        "doc_id", "repaired_text", "n_repairs"
    )


@q(
    "q193_shard_assign",
    """
    WITH s AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 16 AS shard,
             n_chars
      FROM documents
    ),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_weight
      FROM s GROUP BY shard
    ),
    tot AS (SELECT sum(n_docs) AS nd, sum(sum_weight) AS sw FROM per)
    SELECT shard, n_docs, sum_weight,
           n_docs * 1000000 // nd AS docs_share_micros,
           sum_weight * 1000000 // sw AS weight_share_micros
    FROM per, tot
    """,
)
def q193_shard_assign(spark, sf_dir):
    """Deterministic hash-shard layout report (operators/mixing.py:
    shard_assign): md5(key) mod N is the writer's shard function —
    rerun-stable, append-stable across incremental runs — and the report
    surfaces per-shard doc/byte shares in integer micros so a hot shard
    (skewed key) is visible BEFORE a write job hits the straggler. One
    partial-agg groupBy on N groups + a broadcast 1-row total; no
    window, no sort, corpus-size independent."""
    from .operators.mixing import shard_assign

    d = _read(spark, sf_dir, "documents")
    return shard_assign(d, n_shards=16, key_col="doc_id",
                        weight_col="n_chars")


@q(
    "q194_cdc_chunks",
    """
    WITH d AS (
      SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS len
      FROM documents WHERE length(text) > 0
    ),
    pos AS (
      SELECT doc_id, t, len,
             unnest(generate_series(2, CAST(len AS INTEGER) - 3)) AS p
      FROM d
    ),
    cuts AS (
      SELECT doc_id, p FROM pos
      WHERE ('0x' || substr(md5(substr(t, p, 4)), 1, 8))::BIGINT % 64 = 0
    ),
    starts AS (
      SELECT doc_id, 1 AS start FROM d
      UNION ALL
      SELECT doc_id, p AS start FROM cuts
    ),
    spans AS (
      SELECT doc_id, start,
             row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1
               AS chunk_idx,
             lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
      FROM starts
    )
    SELECT sp.doc_id,
           CAST(sp.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(sp.start AS BIGINT) AS start,
           CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1 AS BIGINT)
             AS chunk_len,
           md5(substr(d.t, sp.start,
                      CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1
                           AS INTEGER))) AS chunk_md5
    FROM spans sp JOIN d ON sp.doc_id = d.doc_id
    """,
)
def q194_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (operators/chunking.py:cdc_chunks; LBFS,
    Muthitacharoen SOSP'01): chunk boundaries depend only on the local
    4-gram (md5 mod 64), so an edit shifts only the chunks it touches
    and chunk-hash dedup still matches everything downstream — the dedup
    granularity that survives page revisions, where whole-doc hashes
    (q16) lose the entire document. Cut scan = one Arrow-batched linear
    pass per doc (zero shuffle); chunk cut-out = JVM array codegen + one
    posexplode. The oracle replays the identical rule positionally —
    affordable at test SF only, which is exactly why the operator never
    uses the positional form."""
    from .operators.chunking import cdc_chunks

    d = _read(spark, sf_dir, "documents")
    return cdc_chunks(d, gram=4, mod=64)


@q(
    "q195_zorder_layout",
    """
    WITH k AS (
      SELECT doc_id, n_chars,
             CAST(n_chars AS BIGINT) AS a,
             CAST(doc_id % 65536 AS BIGINT) AS b
      FROM documents
    ),
    z AS (
      SELECT doc_id, n_chars,
             CAST((((a >> 0) & 1) << 0)
               + (((b >> 0) & 1) << 1)
               + (((a >> 1) & 1) << 2)
               + (((b >> 1) & 1) << 3)
               + (((a >> 2) & 1) << 4)
               + (((b >> 2) & 1) << 5)
               + (((a >> 3) & 1) << 6)
               + (((b >> 3) & 1) << 7)
               + (((a >> 4) & 1) << 8)
               + (((b >> 4) & 1) << 9)
               + (((a >> 5) & 1) << 10)
               + (((b >> 5) & 1) << 11)
               + (((a >> 6) & 1) << 12)
               + (((b >> 6) & 1) << 13)
               + (((a >> 7) & 1) << 14)
               + (((b >> 7) & 1) << 15)
               + (((a >> 8) & 1) << 16)
               + (((b >> 8) & 1) << 17)
               + (((a >> 9) & 1) << 18)
               + (((b >> 9) & 1) << 19)
               + (((a >> 10) & 1) << 20)
               + (((b >> 10) & 1) << 21)
               + (((a >> 11) & 1) << 22)
               + (((b >> 11) & 1) << 23)
               + (((a >> 12) & 1) << 24)
               + (((b >> 12) & 1) << 25)
               + (((a >> 13) & 1) << 26)
               + (((b >> 13) & 1) << 27)
               + (((a >> 14) & 1) << 28)
               + (((b >> 14) & 1) << 29)
               + (((a >> 15) & 1) << 30)
               + (((b >> 15) & 1) << 31)
               AS BIGINT) AS zkey
      FROM k
    )
    SELECT doc_id, n_chars, zkey, zkey // 268435457 AS file_idx
    FROM z
    """,
)
def q195_zorder_layout(spark, sf_dir):
    """Z-order clustered layout keys (operators/layout.py: Morton 1966;
    Delta/Iceberg ZORDER BY): bit-interleave (n_chars, doc_id mod 2^16)
    so rows close in EITHER dimension stay close in the linear write
    order and min/max file stats prune scans on both predicates. The key
    is a folded 32-term shift/mask sum — whole-stage codegen on the scan
    path, zero shuffle, bit-identical in any engine; file_idx is the
    closed-form equal-width range slice a clustered writer sorts into
    (append-stable: no quantile drift between runs)."""
    from .operators.layout import zorder_layout

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        (F.col("doc_id") % 65536).alias("_b"),
    )
    out = zorder_layout(d, "n_chars", "_b", bits=16, n_files=16)
    return out.select("doc_id", "n_chars", "zkey", "file_idx")


_Q196_LINES_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN '- bullet point' || chr(10) ||
                       regexp_replace(text || ' tail end.',
                                      '(\\S+ \\S+ \\S+ \\S+ \\S+) ',
                                      '\\1' || chr(10), 'g')
                  ELSE regexp_replace(text || ' tail end.',
                                      '(\\S+ \\S+ \\S+ \\S+ \\S+) ',
                                      '\\1' || chr(10), 'g') END AS t
      FROM documents
"""


@q(
    "q196_line_quality",
    """
    WITH aug AS (""" + _Q196_LINES_SQL + """),
    lines AS (
      SELECT doc_id, l FROM (
        SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM aug
      ) WHERE length(l) > 0
    ),
    g AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l LIKE '- %' OR l LIKE '* %'
                             OR l LIKE '• %' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb,
             CAST(sum(CASE WHEN substr(l, -1, 1) IN ('.', '!', '?', '"')
                           THEN 1 ELSE 0 END) AS BIGINT) AS ne,
             CAST(sum(CASE WHEN length(l) < 30 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ns,
             CAST(sum(length(l)) AS BIGINT) AS ch
      FROM lines GROUP BY doc_id
    )
    SELECT doc_id, n_lines,
           nb * 1000000 // n_lines AS bullet_line_micros,
           ne * 1000000 // n_lines AS end_punct_line_micros,
           ns * 1000000 // n_lines AS short_line_micros,
           ch * 1000000 // n_lines AS mean_line_len_micros
    FROM g
    """,
)
def q196_line_quality(spark, sf_dir):
    """Line-level quality signals (operators/textstats.py:
    line_quality_signals; RefinedWeb/FineWeb recipe, Penedo 2023):
    bullet-line, punctuation-terminated-line, and short-line ratios plus
    mean line length, integer micros -- the list-page/navigation-junk
    half of the quality recipe that the word-level Gopher rules can't
    see. Lines are synthesized deterministically (every 5th space
    becomes a break, every 3rd doc leads with a bullet, every doc ends
    sentence-terminated) so all four signals take non-trivial values by
    construction. Plan: one explode + one partial-agg groupBy on the doc
    key -- the gopher_quality_flags shape, no join, no window."""
    from .operators.textstats import line_quality_signals

    d = _read(spark, sf_dir, "documents")
    base = F.regexp_replace(
        F.concat(F.col("text"), F.lit(" tail end.")),
        r"(\S+ \S+ \S+ \S+ \S+) ",
        "$1\n",
    )
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("- bullet point\n"), base),
        ).otherwise(base).alias("text"),
    )
    return line_quality_signals(aug)


@q(
    "q197_lang_mismatch",
    """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                        w -> length(w) > 0)) AS w
      FROM documents
    ), scores AS (
      SELECT doc_id,
        sum(CASE WHEN w IN ('der','die','und','das','ein','nicht') THEN 1 ELSE 0 END) AS s_de,
        sum(CASE WHEN w IN ('the','and','of','is','this','that','with') THEN 1 ELSE 0 END) AS s_en,
        sum(CASE WHEN w IN ('que','la','de','los','las','una') THEN 1 ELSE 0 END) AS s_es,
        sum(CASE WHEN w IN ('le','la','et','les','des','une') THEN 1 ELSE 0 END) AS s_fr,
        sum(CASE WHEN w IN ('que','de','não','uma','os','das') THEN 1 ELSE 0 END) AS s_pt
      FROM words GROUP BY doc_id
    ), unp AS (
      SELECT doc_id, 'de' AS lg, s_de AS s FROM scores UNION ALL
      SELECT doc_id, 'en', s_en FROM scores UNION ALL
      SELECT doc_id, 'es', s_es FROM scores UNION ALL
      SELECT doc_id, 'fr', s_fr FROM scores UNION ALL
      SELECT doc_id, 'pt', s_pt FROM scores
    ), guess AS (
      SELECT doc_id, CASE WHEN s > 0 THEN lg ELSE 'none' END AS lang_guess
      FROM (
        SELECT doc_id, lg, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lg)
                 AS rn
        FROM unp
      ) WHERE rn = 1
    ),
    j AS (
      SELECT d.source, string_split(d.lang, '-')[1] AS decl, g.lang_guess
      FROM documents d JOIN guess g ON d.doc_id = g.doc_id
    ),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN lang_guess <> 'none' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_guessed,
             CAST(sum(CASE WHEN lang_guess <> 'none'
                             AND lang_guess <> decl THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_mismatch
      FROM j GROUP BY source
    )
    SELECT source, n_docs, n_guessed, n_mismatch,
           CASE WHEN n_guessed > 0
                THEN n_mismatch * 1000000 // n_guessed
                ELSE 0 END AS mismatch_micros
    FROM agg
    """,
)
def q197_lang_mismatch(spark, sf_dir):
    """Declared-vs-detected language audit (operators/textstats.py:
    lang_mismatch_audit): Common-Crawl-style metadata lies (server
    defaults, CMS templates), and per-language curation thresholds
    applied to a mis-routed shard curate the wrong population -- this
    report says, per source, how often content-based lang ID disagrees
    with the declared tag (primary-subtag normalized, abstentions
    excluded). Plan: the q25 marker aggregation + one group-sized
    rollup; no window wider than the doc key, no new shuffle shape."""
    from .operators.textstats import lang_mismatch_audit

    d = _read(spark, sf_dir, "documents")
    return lang_mismatch_audit(d)


@q(
    "q198_tfidf_cosine_pairs",
    """
    WITH aug AS (
      SELECT doc_id,
             text || ' topic' || CAST(doc_id % 100 AS VARCHAR)
                  || ' subtopic' || CAST(doc_id % 40 AS VARCHAR) AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id AS id, w AS term FROM (
        SELECT doc_id, unnest(string_split(lower(t), ' ')) AS w FROM aug
      ) WHERE length(w) > 0
    ),
    tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY id, term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY term),
    nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
           FROM documents),
    kept AS (
      SELECT tf.id, tf.term, tf.tf * (1000 // dfq.df) AS w
      FROM tf JOIN dfq ON tf.term = dfq.term, nn
      WHERE dfq.df * 1000000 <= nn.n * 100000
        AND tf.tf * (1000 // dfq.df) > 0
    ),
    norms AS (SELECT id, CAST(sum(w * w) AS BIGINT) AS n2
              FROM kept GROUP BY id),
    dots AS (
      SELECT a.id AS a_id, b.id AS b_id,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM kept a JOIN kept b ON a.term = b.term AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT d.a_id, d.b_id, d.dot,
           CAST(floor(CAST(d.dot AS DOUBLE) * 1000000.0
                      / (sqrt(CAST(na.n2 AS DOUBLE))
                         * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT)
             AS cos_micros
    FROM dots d
    JOIN norms na ON d.a_id = na.id
    JOIN norms nb ON d.b_id = nb.id
    WHERE CAST(floor(CAST(d.dot AS DOUBLE) * 1000000.0
                     / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT)
          >= 500000
    """,
)
def q198_tfidf_cosine_pairs(spark, sf_dir):
    """Exact sparse tf-idf cosine pairs (operators/similarity.py:
    tfidf_cosine_pairs) -- the LEXICAL near-dup complement to the dense
    q24/q55 embedding paths: template rewrites whose wording overlaps
    are caught with no encoder, via the All-Pairs discipline (df-capped
    term self-join = candidate generation AND exact dot product in one
    equi-join + partial agg; Bayardo WWW'07). Integer tf*(1000 div df)
    weights keep dots/norms exact BIGINTs; the cosine divides by two
    IEEE sqrts (the q176/q187 cross-engine discipline). Rare topic
    tokens are spliced per doc so the df cap leaves a non-trivial
    sparse vocabulary by construction."""
    from .operators.similarity import tfidf_cosine_pairs

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" topic"), (F.col("doc_id") % 100).cast("string"),
            F.lit(" subtopic"), (F.col("doc_id") % 40).cast("string"),
        ).alias("text"),
    )
    return tfidf_cosine_pairs(aug)


@q(
    "q199_bucketed_join",
    """
    WITH stats AS (
      SELECT doc_id, n_chars FROM documents
    ),
    dim AS (
      SELECT doc_id, source, lang FROM documents
    ),
    j AS (
      SELECT d.source, s.n_chars
      FROM stats s JOIN dim d ON s.doc_id = d.doc_id
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM j GROUP BY source
    """,
)
def q199_bucketed_join(spark, sf_dir):
    """Shuffle-amortized co-located join (operators/joins.py:
    bucketed_colocated_join): both sides are written hash-BUCKETED on
    the join key through the catalog, so the equi-join itself plans
    with ZERO Exchange -- the shuffle is paid once at write time and
    amortized over every later join on that key (the 100-TB recipe for
    a fact table that joins the same dimension daily; the
    plans/iceberg.py DDL declares the same bucket(64) layout for the
    real lakehouse path). tests/test_plan_shapes.py pins the
    no-Exchange join plan AND the contrast (plain parquet reads of the
    same data DO shuffle). The oracle states the join result itself --
    layout changes results never."""
    import tempfile

    from .operators.joins import bucketed_colocated_join

    d = _read(spark, sf_dir, "documents")
    stats = d.select("doc_id", "n_chars")
    dim = d.select("doc_id", "source", "lang")
    with tempfile.TemporaryDirectory() as root:
        j = bucketed_colocated_join(
            spark, stats, dim, "doc_id", 8, root,
            names=("q199_stats", "q199_dim"),
        )
        out = j.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        rows = out.collect()  # group-sized; detach before DROP TABLE
        schema = out.schema
        spark.sql("DROP TABLE IF EXISTS q199_stats")
        spark.sql("DROP TABLE IF EXISTS q199_dim")
        return spark.createDataFrame(rows, schema)


@q(
    "q200_curation_funnel",
    """
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 11 = 0 THEN 'page not found ' || text
                  WHEN doc_id % 5 = 0 THEN text || ' casino viagra jackpot'
                  ELSE text END AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(t), ' ')) AS w FROM aug
      ) WHERE length(w) > 0
    ),
    ta AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(length(w)) AS BIGINT) AS sl,
             CAST(sum(CASE WHEN w IN ('casino','viagra','lottery',
                                      'jackpot','betting','pills',
                                      'crypto-giveaway','xxx')
                           THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM toks GROUP BY doc_id
    ),
    gated AS (
      SELECT a.doc_id, a.source, md5(a.t) AS h,
             CASE
               WHEN regexp_matches(lower(a.t),
                 '(404 not found|page not found|error 404|no longer available|page cannot be found)')
                 AND ta.nw < 30 THEN 'soft404'
               WHEN ta.nb > 0 THEN 'badwords'
               WHEN NOT (ta.nw BETWEEN 50 AND 100000
                         AND ta.sl >= 3 * ta.nw
                         AND ta.sl <= 10 * ta.nw) THEN 'gopher'
               ELSE NULL END AS gate
      FROM aug a JOIN ta ON a.doc_id = ta.doc_id
    ),
    canon AS (
      SELECT h, min(doc_id) AS keep FROM gated
      WHERE gate IS NULL GROUP BY h
    ),
    resolved AS (
      SELECT g.doc_id, g.source,
             CASE WHEN g.doc_id = c.keep THEN 'kept'
                  ELSE 'duplicate' END AS verdict
      FROM gated g JOIN canon c ON g.h = c.h
      WHERE g.gate IS NULL
      UNION ALL
      SELECT doc_id, source, gate AS verdict FROM gated
      WHERE gate IS NOT NULL
    ),
    roll AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN verdict = 'soft404' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_soft404,
             CAST(sum(CASE WHEN verdict = 'badwords' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_badwords,
             CAST(sum(CASE WHEN verdict = 'gopher' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_gopher,
             CAST(sum(CASE WHEN verdict = 'duplicate' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_duplicate,
             CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept
      FROM resolved GROUP BY source
    )
    SELECT source, n_docs, n_soft404, n_badwords, n_gopher, n_duplicate,
           n_kept, n_kept * 1000000 // n_docs AS kept_micros
    FROM roll
    """,
)
def q200_curation_funnel(spark, sf_dir):
    """The C4/FineWeb curation recipe end-to-end as ONE declarative plan
    (operators/textstats.py:curation_funnel): soft-404 -> bad-words ->
    Gopher length gates -> exact-dup keep-first, with explicit
    precedence (every doc counted at its FIRST failing gate, dedup only
    among survivors -- the order real pipelines run, because
    deduplicating junk wastes the shuffle). Per-source stage counts +
    final yield micros are the release-review funnel report. Error
    bodies and spam tokens are spliced deterministically (mod 11 / mod
    5) so every stage fires by construction. Plan: ONE token explode +
    doc-key partial agg computes all word gates at once; one
    groupBy(md5) among survivors; one group-sized rollup -- no corpus
    window, no collect."""
    from .operators.textstats import curation_funnel

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("page not found "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" casino viagra jackpot")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return curation_funnel(aug)


def _hll_intersection_oracle(p: int = 6) -> str:
    """q201 oracle: the q166 per-shard sketch replay, pivoted to one
    row, with inclusion-exclusion and the EXACT intersection beside it
    (affordable at test SF only — the whole point of the sketch is that
    production never computes it)."""
    from .operators.sketches import _alpha

    m = 1 << p
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)
    return f"""
    WITH k AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS shard,
             unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS key
      FROM documents
    ),
    h AS (
      SELECT shard,
             ('0x' || substr(md5(key), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(key), 9, 8))::BIGINT AS lo
      FROM k
    ),
    r AS (
      SELECT shard, CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             (hi % {div}) * 4294967296 + lo AS rem
      FROM h
    ),
    sk0 AS (
      SELECT shard, register,
             CAST(max({width} - ({bits}) + 1) AS BIGINT) AS max_rho
      FROM r GROUP BY shard, register
    ),
    sk AS (
      SELECT shard, register, max_rho FROM sk0
      UNION ALL
      SELECT 'merged', register, max(max_rho)
      FROM sk0 GROUP BY register
    ),
    a AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_hi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_lo
      FROM sk GROUP BY shard
    ),
    est AS (
      SELECT shard,
             CAST(floor({num!r} / (CAST(harmonic_hi AS DOUBLE)
                         * 4294967296.0
                       + CAST(harmonic_lo AS DOUBLE)
                       + CAST({m} - n_hit AS DOUBLE)
                         * 2305843009213693952.0)) AS BIGINT) AS e
      FROM a
    ),
    piv AS (
      SELECT max(CASE WHEN shard = 'even' THEN e END) AS est_a_micros,
             max(CASE WHEN shard = 'odd' THEN e END) AS est_b_micros,
             max(CASE WHEN shard = 'merged' THEN e END)
               AS est_union_micros
      FROM est
    ),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
        SELECT DISTINCT key FROM k WHERE shard = 'even'
        INTERSECT
        SELECT DISTINCT key FROM k WHERE shard = 'odd'
      )
    )
    SELECT est_a_micros, est_b_micros, est_union_micros,
           est_a_micros + est_b_micros - est_union_micros
             AS est_intersection_micros,
           exact_intersection
    FROM piv, ex
    """


@q("q201_hll_intersection", _hll_intersection_oracle(p=6))
def q201_hll_intersection(spark, sf_dir):
    """Sketch-only set-overlap estimate (operators/sketches.py:
    hll_intersection_estimate): |A∩B| by inclusion-exclusion over three
    raw HLL estimates, the union via register max-merge -- how two crawl
    snapshots' vocabularies or two runs' URL sets are compared at 10^12
    keys (three m-row sketches move; no data joins, no rescan of either
    side; composes with q166's cross-run merge algebra). The EXACT
    intersection rides along at test SF so the estimate is gradeable --
    production never computes it, which is the point. Signed estimate
    by design: sketch noise can push a near-empty overlap negative, and
    honesty beats clamping."""
    from .operators.sketches import (
        hll_intersection_estimate,
        hll_registers,
    )

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2 == 0).alias("_even"),
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("key"),
    )
    ka = toks.filter("_even").select("key")
    kb = toks.filter("NOT _even").select("key")
    est = hll_intersection_estimate(
        hll_registers(ka, "key", p=6), hll_registers(kb, "key", p=6), p=6
    )
    exact = ka.distinct().intersect(kb.distinct()).agg(
        F.count("*").cast("long").alias("exact_intersection")
    )
    return est.crossJoin(F.broadcast(exact))


@q(
    "q202_semantic_decontam",
    """
    WITH train AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
    bench AS (
      SELECT vec_id + 10000 AS vec_id,
             list_transform(v, x -> x * 1.001) AS v
      FROM train WHERE vec_id < 50
    ),
    bt AS (
      SELECT vec_id, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
           + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
           + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
           + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END)
           + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM train
    ),
    bb AS (
      SELECT vec_id, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
           + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
           + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
           + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
           + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
           + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END)
           + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
      FROM bench
    ),
    hits AS (
      SELECT t.vec_id AS train_id, b.vec_id AS bench_id,
             round(list_cosine_similarity(t.v, b.v), 4) AS sim
      FROM bt t JOIN bb b USING (bucket)
    ),
    f AS (SELECT * FROM hits WHERE sim >= 0.99),
    best AS (
      SELECT train_id, bench_id, sim,
             row_number() OVER (PARTITION BY train_id
                                ORDER BY sim DESC, bench_id DESC) AS rn
      FROM f
    )
    SELECT train_id, bench_id, sim FROM best WHERE rn = 1
    """,
)
def q202_semantic_decontam(spark, sf_dir):
    """Embedding-space benchmark decontamination (operators/similarity.py:
    semantic_decontaminate): the semantic complement of q57's 13-gram
    decontamination -- paraphrased or reformatted eval leakage has zero
    13-gram overlap but cosine ~ 1, so release pipelines run BOTH gates.
    Benchmark vectors are synthesized as scaled copies of 50 training
    vectors (same sign pattern -> same LSH bucket -> all found by
    construction). Plan: bipartite sign-LSH bucket equi-join (never
    train x bench), exact cosine on candidates only, best match per
    contaminated doc via max(struct) -- no window over the corpus."""
    from .operators.similarity import semantic_decontaminate

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"),
    )
    bench = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    return semantic_decontaminate(emb, bench, threshold=0.99, bits=8)


@q("q203_cdc_snapshot_novelty", """
    WITH snapa AS (SELECT doc_id, source, text AS t FROM documents),
    snapb AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 6 = 0 THEN 'UPDATE: ' || text
                  ELSE text END AS t
      FROM documents
    ),
    da AS (
      SELECT doc_id, source, t, CAST(length(t) AS BIGINT) AS len
      FROM snapa WHERE length(t) > 0
    ),
    posa AS (
      SELECT doc_id, t, len,
             unnest(generate_series(2, CAST(len AS INTEGER) - 3)) AS p
      FROM da
    ),
    cutsa AS (
      SELECT doc_id, p FROM posa
      WHERE ('0x' || substr(md5(substr(t, p, 4)), 1, 8))::BIGINT % 64 = 0
    ),
    startsa AS (
      SELECT doc_id, 1 AS start FROM da
      UNION ALL
      SELECT doc_id, p AS start FROM cutsa
    ),
    spansa AS (
      SELECT doc_id, start,
             lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
      FROM startsa
    ),
    cha AS (
      SELECT sp.doc_id, d.source,
             CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1 AS BIGINT)
               AS chunk_len,
             md5(substr(d.t, sp.start,
                        CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1
                             AS INTEGER))) AS chunk_md5
      FROM spansa sp JOIN da d ON sp.doc_id = d.doc_id
    ),
    db AS (
      SELECT doc_id, source, t, CAST(length(t) AS BIGINT) AS len
      FROM snapb WHERE length(t) > 0
    ),
    posb AS (
      SELECT doc_id, t, len,
             unnest(generate_series(2, CAST(len AS INTEGER) - 3)) AS p
      FROM db
    ),
    cutsb AS (
      SELECT doc_id, p FROM posb
      WHERE ('0x' || substr(md5(substr(t, p, 4)), 1, 8))::BIGINT % 64 = 0
    ),
    startsb AS (
      SELECT doc_id, 1 AS start FROM db
      UNION ALL
      SELECT doc_id, p AS start FROM cutsb
    ),
    spansb AS (
      SELECT doc_id, start,
             lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
      FROM startsb
    ),
    chb AS (
      SELECT sp.doc_id, d.source,
             CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1 AS BIGINT)
               AS chunk_len,
             md5(substr(d.t, sp.start,
                        CAST(coalesce(sp.nxt - 1, d.len) - sp.start + 1
                             AS INTEGER))) AS chunk_md5
      FROM spansb sp JOIN db d ON sp.doc_id = d.doc_id
    ),
    seen AS (SELECT DISTINCT chunk_md5 FROM cha),
    nov AS (
      SELECT b.source,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(b.chunk_len) AS BIGINT) AS total_bytes,
             CAST(sum(CASE WHEN s.chunk_md5 IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new_chunks,
             CAST(sum(CASE WHEN s.chunk_md5 IS NULL THEN b.chunk_len
                           ELSE 0 END) AS BIGINT) AS new_bytes
      FROM chb b LEFT JOIN seen s ON b.chunk_md5 = s.chunk_md5
      GROUP BY b.source
    )
    SELECT source, n_chunks, total_bytes, n_new_chunks, new_bytes,
           new_bytes * 1000000 // total_bytes AS new_bytes_micros
    FROM nov
    """)
def q203_cdc_snapshot_novelty(spark, sf_dir):
    """Chunk-level novelty between crawl snapshots (composes
    operators/chunking.py:cdc_chunks with the q82 snapshot-diff
    discipline): snapshot B re-crawls the corpus with every 6th page
    edited, and the report prices EXACTLY the bytes a chunk-store
    (content-addressed, CDC-boundary) would newly persist -- whole-doc
    hashing would re-store every edited page in full; CDC re-stores
    only the head chunks the edit touched, which is the entire point of
    q194's boundaries surviving edits. Plan: two Arrow cut scans (zero
    shuffle), one distinct on snapshot A's chunk hashes, one hash-key
    LEFT anti-style join, group-sized rollup. At 10^12 docs snapshot
    A's chunk index is the persisted table (the q106 incremental
    pattern); only B's chunks move."""
    from .operators.chunking import cdc_chunks

    d = _read(spark, sf_dir, "documents")
    snap_a = d.select("doc_id", "source", F.col("text").alias("text"))
    snap_b = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit("UPDATE: "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    cha = cdc_chunks(snap_a, gram=4, mod=64)
    chb = cdc_chunks(snap_b, gram=4, mod=64)
    src = d.select("doc_id", "source")
    seen = cha.select("chunk_md5").distinct().select(
        F.col("chunk_md5").alias("_seen")
    )
    j = (
        chb.join(src, "doc_id")
        .join(seen, chb["chunk_md5"] == F.col("_seen"), "left")
    )
    agg = j.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_len").alias("total_bytes"),
        F.sum(
            F.when(F.col("_seen").isNull(), 1).otherwise(0)
        ).alias("n_new_chunks"),
        F.sum(
            F.when(F.col("_seen").isNull(), F.col("chunk_len"))
            .otherwise(0)
        ).alias("new_bytes"),
    )
    return agg.select(
        "source",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        F.col("n_new_chunks").cast("long").alias("n_new_chunks"),
        F.col("new_bytes").cast("long").alias("new_bytes"),
        F.expr("new_bytes * 1000000L div total_bytes").alias(
            "new_bytes_micros"
        ),
    )


@q("q204_trustrank_spam_mass", """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    sc AS (SELECT N, CAST((SELECT count(*) FROM documents
                           WHERE doc_id % 10 = 0) AS BIGINT) AS S
           FROM nn),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    o AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
    r0p AS (SELECT d.doc_id AS node, CAST(1000000 AS BIGINT) AS s FROM documents d, sc),
    c1p AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r0p r ON e.src = r.node
              GROUP BY e.dst),
    r1p AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c1p ON d.doc_id = c1p.dst),
    c2p AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r1p r ON e.src = r.node
              GROUP BY e.dst),
    r2p AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c2p ON d.doc_id = c2p.dst),
    c3p AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r2p r ON e.src = r.node
              GROUP BY e.dst),
    r3p AS (SELECT d.doc_id AS node,
                   CAST(150000 + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c3p ON d.doc_id = c3p.dst),
    r0t AS (SELECT d.doc_id AS node, CAST(CASE WHEN d.doc_id % 10 = 0 THEN 1000000 * sc.N // sc.S ELSE 0 END AS BIGINT) AS s FROM documents d, sc),
    c1t AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r0t r ON e.src = r.node
              GROUP BY e.dst),
    r1t AS (SELECT d.doc_id AS node,
                   CAST(CASE WHEN d.doc_id % 10 = 0 THEN 150000 * sc.N // sc.S ELSE 0 END + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c1t ON d.doc_id = c1t.dst),
    c2t AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r1t r ON e.src = r.node
              GROUP BY e.dst),
    r2t AS (SELECT d.doc_id AS node,
                   CAST(CASE WHEN d.doc_id % 10 = 0 THEN 150000 * sc.N // sc.S ELSE 0 END + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c2t ON d.doc_id = c2t.dst),
    c3t AS (SELECT e.dst, CAST(sum(r.s // o.deg) AS BIGINT) AS c
              FROM e JOIN o ON e.src = o.src JOIN r2t r ON e.src = r.node
              GROUP BY e.dst),
    r3t AS (SELECT d.doc_id AS node,
                   CAST(CASE WHEN d.doc_id % 10 = 0 THEN 150000 * sc.N // sc.S ELSE 0 END + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
              FROM documents d CROSS JOIN sc LEFT JOIN c3t ON d.doc_id = c3t.dst)
    SELECT p.node, p.s AS pr_micros, t.s AS trust_micros,
           greatest(0, p.s - t.s) * 1000000 // p.s AS spam_mass_ppm
    FROM r3p p JOIN r3t t ON p.node = t.node
    ORDER BY greatest(0, p.s - t.s) * 1000000 // p.s DESC, p.node
    LIMIT 30
""")
def q204_trustrank_spam_mass(spark, sf_dir):
    """TrustRank spam mass (operators/linkgraph.py:trustrank_micros;
    Gyongyi VLDB'04): PageRank whose teleport is restricted to a trusted
    seed set (every 10th doc), so trust flows outward along links and a
    page's rank DEFICIT vs ordinary PageRank -- spam_mass = (PR-TR)/PR,
    clamped nonnegative so integer division stays floor==truncate on
    every engine -- measures how much of its rank comes from outside the
    trusted web. Both recurrences are fixed 3-round integer unrolls
    (the q189 discipline: micros ranks make the comparison exact, not
    float-noise); teleport scalars N and S are two broadcast 1-row
    counts. Top-30 movers plan as TakeOrderedAndProject."""
    from .operators.linkgraph import pagerank_micros, trustrank_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    seeds = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("node")
    )
    pr = pagerank_micros(edges, n_iter=3).select(
        "node", F.col("rank_micros").alias("pr_micros")
    )
    tr = trustrank_micros(edges, seeds, n_iter=3)
    j = pr.join(tr, "node").select(
        "node",
        "pr_micros",
        "trust_micros",
        F.expr(
            "greatest(0L, pr_micros - trust_micros) * 1000000L"
            " div pr_micros"
        ).alias("spam_mass_ppm"),
    )
    return j.orderBy(F.desc("spam_mass_ppm"), "node").limit(30)


@q("q205_kcore_peeling", """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    eraw AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    e0 AS (
      SELECT src AS a, dst AS b FROM eraw
      UNION ALL
      SELECT dst, src FROM eraw WHERE src <> dst
    ),
    d0 AS (SELECT a, CAST(count(*) AS BIGINT) AS degree
             FROM e0 GROUP BY a),
    k0 AS (SELECT a FROM d0 WHERE degree >= 4),
    e1 AS (
      SELECT e.a, e.b FROM e0 e
      JOIN k0 ka ON e.a = ka.a
      JOIN k0 kb ON e.b = kb.a
    ),
    d1 AS (SELECT a, CAST(count(*) AS BIGINT) AS degree
             FROM e1 GROUP BY a),
    k1 AS (SELECT a FROM d1 WHERE degree >= 4),
    e2 AS (
      SELECT e.a, e.b FROM e1 e
      JOIN k1 ka ON e.a = ka.a
      JOIN k1 kb ON e.b = kb.a
    ),
    d2 AS (SELECT a, CAST(count(*) AS BIGINT) AS degree
             FROM e2 GROUP BY a),
    k2 AS (SELECT a FROM d2 WHERE degree >= 4),
    e3 AS (
      SELECT e.a, e.b FROM e2 e
      JOIN k2 ka ON e.a = ka.a
      JOIN k2 kb ON e.b = kb.a
    )
    SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e3 GROUP BY a
""")
def q205_kcore_peeling(spark, sf_dir):
    """Bounded-round k-core peeling (operators/linkgraph.py:
    kcore_bounded; Seidman 1983): repeatedly drop nodes of undirected
    degree < 4 -- after three rounds what survives is where organic
    community structure lives, while spam constellations and orphan
    pages shed early (the structural complement of q204's trust-flow
    signal). Fixed unroll = the q189/q204 oracle discipline; each round
    is one symmetrized degree groupBy + two semi-joins, and full
    convergence wraps the same round body in the connected-components
    loop with a folded convergence probe. Parallel edges count with
    multiplicity, self-loops once (both replayed by the oracle)."""
    from .operators.linkgraph import kcore_bounded

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return kcore_bounded(edges, k=4, n_rounds=3)


_Q206_CODE_SPLICE = '\ndef compute_fn(x):\n    total_1 = x + 42;\n    arr_y = [1, 2, 3];\n    return myValue + total_1;'


@q("q206_code_detect", """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 0 THEN text || '' || chr(10) || 'def compute_fn(x):' || chr(10) || '    total_1 = x + 42;' || chr(10) || '    arr_y = [1, 2, 3];' || chr(10) || '    return myValue + total_1;'
                  ELSE text END AS t
      FROM documents
    ),
    rowside AS (
      SELECT doc_id,
             CAST(length(t) AS BIGINT) AS nc,
             CAST(length(t) - length(translate(t, '{}[]();=<>', ''))
                  AS BIGINT) AS sym,
             CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
                  AS BIGINT) AS dig
      FROM aug
    ),
    lines AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nl,
             CAST(sum(CASE WHEN l LIKE '    %' OR l LIKE chr(9) || '%'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ind
      FROM (
        SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM aug
      ) WHERE length(l) > 0 GROUP BY doc_id
    ),
    toks AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(CASE WHEN regexp_matches(w, '^[a-z]+[A-Z]')
                             OR contains(w, '_')
                           THEN 1 ELSE 0 END) AS BIGINT) AS camel
      FROM (
        SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM aug
      ) WHERE length(w) > 0 GROUP BY doc_id
    ),
    j AS (
      SELECT r.doc_id, r.nc, r.sym, r.dig, l.nl, l.ind, tk.nw, tk.camel
      FROM rowside r JOIN lines l ON r.doc_id = l.doc_id
      JOIN toks tk ON r.doc_id = tk.doc_id
    )
    SELECT doc_id,
           sym * 1000000 // nc AS symbol_density_micros,
           ind * 1000000 // nl AS indent_line_micros,
           dig * 1000000 // nc AS digit_micros,
           camel * 1000000 // nw AS camel_token_micros,
           (sym * 1000000 // nc >= 30000)
             AND ((ind * 1000000 // nl >= 200000)
                  OR (camel * 1000000 // nw >= 100000))
             AS looks_like_code
    FROM j
""")
def q206_code_detect(spark, sf_dir):
    """Prose-vs-code routing signals (operators/textstats.py:
    code_detect_signals; the split the StarCoder/Stack pipelines make
    before anything else, because prose quality thresholds gut code and
    code dedup granularity is wrong for prose): structural-symbol
    density, indented-line fraction, digit density, camelCase/snake
    token fraction -- all integer micros, with a documented threshold
    conjunction as the verdict. A code block is spliced into every 9th
    document so both verdicts occur. Plan: densities are
    length-difference arithmetic on the row (translate/regexp_replace,
    no explode); line and token fractions reuse the one-explode
    partial-agg shape; one doc-key join ties them."""
    from .operators.textstats import code_detect_signals

    d = _read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit(_Q206_CODE_SPLICE)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return code_detect_signals(aug)


def _q207_oracle(p: int = 6) -> str:
    from .operators.sketches import _alpha

    m = 1 << p
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)
    return f"""
    WITH k AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS key
      FROM documents
    ),
    tc AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM k),
    h AS (
      SELECT ('0x' || substr(md5(key), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(key), 9, 8))::BIGINT AS lo
      FROM k
    ),
    r AS (
      SELECT CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             (hi % {div}) * 4294967296 + lo AS rem
      FROM h
    ),
    sk AS (
      SELECT register,
             CAST(max({width} - ({bits}) + 1) AS BIGINT) AS max_rho
      FROM r GROUP BY register
    ),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS hhi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS hlo
      FROM sk
    ),
    vocab AS (
      SELECT CAST(floor({num!r} / (CAST(hhi AS DOUBLE) * 4294967296.0
                     + CAST(hlo AS DOUBLE)
                     + CAST({m} - n_hit AS DOUBLE)
                       * 2305843009213693952.0)) AS BIGINT)
               AS vocab_estimate_micros
      FROM est
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT string_split(lang, '-')[1]) AS BIGINT)
               AS n_langs,
             CAST(sum(length(text)) AS BIGINT) AS chars
      FROM documents
    ),
    dups AS (
      SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq
      FROM documents
    )
    SELECT n_docs, n_tokens, n_sources, n_langs, vocab_estimate_micros,
           (n_docs - uniq) * 1000000 // n_docs AS exact_dup_micros,
           chars * 1000000 // n_docs AS mean_len_micros
    FROM base, tc, vocab, dups
    """


@q("q207_release_datasheet", _q207_oracle(p=6))
def q207_release_datasheet(spark, sf_dir):
    """The corpus release datasheet in one row (operators/textstats.py:
    release_datasheet; Gebru 2021's "Datasheets for Datasets", the
    numbers section): doc/token/source/lang counts, HLL vocabulary
    estimate (the only feasible distinct-token count at 10^12 docs),
    exact-dup share, mean length -- the sign-off table a release review
    reads, every number integer/micro-quantized so the SHEET ITSELF is
    hash-verifiable (the q188 auditability principle). Plan: one
    token-stream pass shared by the count and the sketch, group-sized
    distincts, broadcast 1-row recombination."""
    from .operators.textstats import release_datasheet

    d = _read(spark, sf_dir, "documents")
    return release_datasheet(d)


_Q208_CIDRS = (
    "10.3.0.0/16", "10.7.0.0/16", "10.11.0.0/16", "172.16.0.0/12",
    "10.42.1.0/24",
)


@q(
    "q208_cidr_blocklist",
    """
    WITH ips AS (
      SELECT doc_id,
             '10.' || CAST(doc_id % 64 AS VARCHAR) || '.'
                   || CAST((doc_id // 64) % 256 AS VARCHAR) || '.'
                   || CAST(doc_id % 254 + 1 AS VARCHAR) AS ip
      FROM documents
    ),
    ipi AS (
      SELECT doc_id, ip,
             CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
           + CAST(string_split(ip, '.')[4] AS BIGINT) AS n
      FROM ips
    ),
    cid AS (
      SELECT cidr,
             CAST(string_split(string_split(cidr, '/')[1], '.')[1]
                  AS BIGINT) * 16777216
           + CAST(string_split(string_split(cidr, '/')[1], '.')[2]
                  AS BIGINT) * 65536
           + CAST(string_split(string_split(cidr, '/')[1], '.')[3]
                  AS BIGINT) * 256
           + CAST(string_split(string_split(cidr, '/')[1], '.')[4]
                  AS BIGINT) AS base,
             CAST(string_split(cidr, '/')[2] AS INT) AS plen
      FROM (VALUES ('10.3.0.0/16'), ('10.7.0.0/16'), ('10.11.0.0/16'),
                   ('172.16.0.0/12'), ('10.42.1.0/24')) AS t(cidr)
    ),
    hits AS (
      SELECT i.doc_id, min(c.cidr) AS matched_cidr
      FROM ipi i JOIN cid c
        ON (i.n >> (32 - c.plen)) = (c.base >> (32 - c.plen))
      GROUP BY i.doc_id
    )
    SELECT i.doc_id, i.ip,
           h.matched_cidr IS NOT NULL AS blocked,
           h.matched_cidr
    FROM ipi i LEFT JOIN hits h ON i.doc_id = h.doc_id
    """,
)
def q208_cidr_blocklist(spark, sf_dir):
    """CIDR/IP-range blocklist (operators/blocklist.py:cidr_block_flags):
    server farms and bulletproof hosters are blocked by NETWORK RANGE,
    not hostname -- the layer the UT1-style domain list (q86) cannot
    see. Containment ip in base/p <=> equal top-p bits becomes an
    EQUI-join by exploding each IP into one (prefix_len, prefix) row
    per length the blocklist uses (bounded <= 33, here 3) against the
    broadcast CIDR dim -- the host_suffixes discipline at the network
    layer; a range predicate at 10^12 x 10^6 would plan as a nested
    loop. IPs are synthesized from doc_id so /16 and /24 blocks each
    fire by construction. The oracle states containment as the raw
    shift-equality over the same VALUES dim (DuckDB plans the tiny dim
    however it likes; results, not plans, are compared)."""
    from pyspark.sql import Row

    from .operators.blocklist import cidr_block_flags

    d = _read(spark, sf_dir, "documents")
    ips = d.select(
        "doc_id",
        F.concat(
            F.lit("10."), (F.col("doc_id") % 64).cast("string"),
            F.lit("."), (F.expr("doc_id div 64") % 256).cast("string"),
            F.lit("."), (F.col("doc_id") % 254 + 1).cast("string"),
        ).alias("ip"),
    )
    cidrs = spark.createDataFrame([Row(cidr=c) for c in _Q208_CIDRS])
    return cidr_block_flags(ips, cidrs, prefix_lens=(12, 16, 24))


def _hyperball_oracle(radius: int = 2, p: int = 4) -> str:
    """Unrolled HyperBall replay: per-node seed registers from the same
    md5 bit-math as _hll_register_cte, then ``radius`` rounds of
    out-neighbor register max-merge, then q124's exact split-BIGINT
    harmonic recombination PER NODE."""
    from .operators.sketches import _alpha

    m = 1 << p
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)
    rounds = []
    prev = "s0"
    for t in range(1, radius + 1):
        rounds.append(f"""
    c{t} AS (
      SELECT e.src AS node, s.register, CAST(max(s.max_rho) AS BIGINT)
               AS max_rho
      FROM e JOIN {prev} s ON e.dst = s.node GROUP BY 1, 2
    ),
    s{t} AS (
      SELECT node, register, CAST(max(max_rho) AS BIGINT) AS max_rho
      FROM (SELECT * FROM {prev} UNION ALL SELECT * FROM c{t})
      GROUP BY 1, 2
    )""")
        prev = f"s{t}"
    return f"""
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    h AS (
      SELECT doc_id AS node,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS hi,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
               AS lo
      FROM documents
    ),
    s0 AS (
      SELECT node, CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             CAST({width} - ({bits}) + 1 AS BIGINT) AS max_rho
      FROM (SELECT node, hi, (hi % {div}) * 4294967296 + lo AS rem
            FROM h)
    ),{",".join(rounds)},
    a AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_registers_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_hi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS harmonic_lo
      FROM {prev} GROUP BY node
    )
    SELECT node, n_registers_hit, harmonic_hi, harmonic_lo,
           CAST(floor({num!r} / (CAST(harmonic_hi AS DOUBLE)
                       * 4294967296.0
                     + CAST(harmonic_lo AS DOUBLE)
                     + CAST({m} - n_registers_hit AS DOUBLE)
                       * 2305843009213693952.0)) AS BIGINT)
             AS ball_estimate_micros
    FROM a
    """


@q("q209_hyperball", _hyperball_oracle(radius=2, p=4))
def q209_hyperball(spark, sf_dir):
    """HyperBall (operators/linkgraph.py:hyperball_estimates; Boldi &
    Vigna WSDM'11) -- per-node estimated size of the distance-<=2
    out-ball on the synthetic two-out-degree link graph. The state is
    <= 16 register rows per node (never the ball itself -- balls are
    corpus-sized at radius 2 on a web graph); each round is ONE
    dst-keyed equi-join + a map-combined groupBy(node, register) max,
    localCheckpointed to stop 2^radius lineage growth. All register
    math is exact integers (the q123 discipline); the single IEEE op
    is the final alpha*m^2/S division, micro-quantized. The oracle
    unrolls both rounds and the per-node harmonic recombination."""
    from .operators.linkgraph import hyperball_estimates

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    return hyperball_estimates(edges, nodes, radius=2, p=4)


def _neighborhood_oracle(max_radius: int = 2, p: int = 4) -> str:
    """q209's CTE chain, reduced to a 1-row (n_nodes, Σ floor-estimate)
    at EVERY radius, then normalized by the last radius' sum."""
    from .operators.sketches import _alpha

    m = 1 << p
    width = 64 - p
    div = 1 << (32 - p)
    bits = " + ".join(
        f"CAST(rem >= {1 << i} AS INT)" for i in range(width)
    )
    num = 1e6 * _alpha(m) * m * m * float(1 << 61)

    def _est(t: int) -> str:
        return f"""
    a{t} AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN max_rho <= 29 THEN
                        CAST(1 AS BIGINT) << CAST(29 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS hhi,
             CAST(sum(CASE WHEN max_rho >= 30 THEN
                        CAST(1 AS BIGINT) << CAST(61 - max_rho AS INT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS hlo
      FROM s{t} GROUP BY node
    ),
    l{t} AS (
      SELECT CAST({t} AS BIGINT) AS radius,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(CAST(floor({num!r} / (CAST(hhi AS DOUBLE)
                       * 4294967296.0 + CAST(hlo AS DOUBLE)
                     + CAST({m} - n_hit AS DOUBLE)
                       * 2305843009213693952.0)) AS BIGINT)) AS BIGINT)
               AS pairs_estimate_micros
      FROM a{t}
    )"""

    rounds = []
    for t in range(1, max_radius + 1):
        rounds.append(f"""
    c{t} AS (
      SELECT e.src AS node, s.register, CAST(max(s.max_rho) AS BIGINT)
               AS max_rho
      FROM e JOIN s{t - 1} s ON e.dst = s.node GROUP BY 1, 2
    ),
    s{t} AS (
      SELECT node, register, CAST(max(max_rho) AS BIGINT) AS max_rho
      FROM (SELECT * FROM s{t - 1} UNION ALL SELECT * FROM c{t})
      GROUP BY 1, 2
    )""")
    ests = ",".join(_est(t) for t in range(max_radius + 1))
    union = " UNION ALL ".join(
        f"SELECT * FROM l{t}" for t in range(max_radius + 1)
    )
    return f"""
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    h AS (
      SELECT doc_id AS node,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS hi,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
               AS lo
      FROM documents
    ),
    s0 AS (
      SELECT node, CAST(floor(hi / {div}.0) AS BIGINT) AS register,
             CAST({width} - ({bits}) + 1 AS BIGINT) AS max_rho
      FROM (SELECT node, hi, (hi % {div}) * 4294967296 + lo AS rem
            FROM h)
    ),{",".join(rounds)},{ests},
    lv AS ({union}),
    mx AS (SELECT pairs_estimate_micros AS nmax FROM l{max_radius})
    SELECT radius, n_nodes, pairs_estimate_micros,
           pairs_estimate_micros * 1000000 // nmax AS pct_of_max_ppm
    FROM lv, mx
    """


@q("q210_neighborhood_function", _neighborhood_oracle(max_radius=2, p=4))
def q210_neighborhood_function(spark, sf_dir):
    """Neighborhood function N(t) (operators/linkgraph.py:
    neighborhood_function) -- the distance-distribution curve HyperBall
    exists to compute: Sum_v |ball(v,t)| for t=0..2, with
    pct_of_max_ppm giving the effective-diameter read-off (first t
    where pct >= x). ONE register-merge loop serves every radius (a
    1-row reduction per level rides the same sketch state -- never a
    per-t recompute); per-node floor estimates are summed as exact
    BIGINTs so the curve is engine-identical. Output is max_radius+1
    rows regardless of corpus size."""
    from .operators.linkgraph import neighborhood_function

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    return neighborhood_function(edges, nodes, max_radius=2, p=4)


@q(
    "q211_stream_dedup_gate",
    _Q106_CTES
    + """
    , idx AS (SELECT doc_id, band, band_key FROM bands
              WHERE doc_id % 3 <> 0)
    , newb AS (SELECT doc_id, band, band_key FROM bands
               WHERE doc_id % 3 = 0)
    , hits AS (SELECT n.doc_id, min(i.doc_id) AS matched_old_id
               FROM newb n
               JOIN idx i ON i.band = n.band AND i.band_key = n.band_key
               GROUP BY n.doc_id)
    SELECT nd.doc_id,
           h.matched_old_id IS NOT NULL AS is_dup,
           h.matched_old_id
    FROM (SELECT DISTINCT doc_id FROM newb) nd
    LEFT JOIN hits h USING (doc_id)
    """,
)
def q211_stream_dedup_gate(spark, sf_dir):
    """q106's incremental dedup running AT INGEST (streaming/
    stream_extract.stream_dedup_gate): run 2's docs arrive as a
    Structured Streaming source and are verdict-ed against run 1's
    persisted band index by a stream-STATIC left equi-join + ONE
    streaming aggregation. Streamability comes from
    operators/dedup.minhash_band_structs -- the whole shingle->
    MinHash->band pipeline as one row-local expression (zero
    Exchange), bit-identical to the batch path (pinned in
    tests/test_stream_dedup_gate.py), so the oracle is EXACTLY q106's:
    same fixture, same band keys, same verdicts -- batch and streaming
    answers provably agree."""
    import tempfile
    import uuid

    from .operators.dedup import minhash_band_structs
    from .streaming.stream_extract import stream_dedup_gate

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.when(F.col("doc_id") % 10 == 0, F.lit(_Q106_PAYLOAD))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # the sf parquet is ONE row group, so the scan is one task — and
    # minhash_band_structs is a heavy row-local expression that would
    # otherwise run serially in that task (38 s of the 67 s bench wall
    # at sf0.1). Spread rows first; every downstream agg is order-free.
    d = d.repartition(spark.sparkContext.defaultParallelism)
    t = with_tokens(d).select(
        "doc_id", F.concat_ws(" ", "tokens").alias("tok_str")
    )
    index = (
        t.filter(F.col("doc_id") % 3 != 0)
        .select(
            "doc_id",
            F.explode(minhash_band_structs("tok_str")).alias("_e"),
        )
        .select("doc_id", F.col("_e.band").alias("band"),
                F.col("_e.band_key").alias("band_key"))
    )
    qname = "q211mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        t.filter(F.col("doc_id") % 3 == 0).write.mode(
            "overwrite"
        ).parquet(f"{root}/src")
        index.write.mode("overwrite").parquet(f"{root}/idx")
        stream = (
            spark.readStream.schema("doc_id bigint, tok_str string")
            .parquet(f"{root}/src")
        )
        gate = stream_dedup_gate(
            stream, spark.read.parquet(f"{root}/idx")
        )
        qry = (
            gate.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("dedup-gate drain exceeded 300s")
        out = spark.table(qname).cache()
        out.count()
        return out


def _bloom_shard_oracle(m_bits: int = 640, k: int = 7) -> str:
    return f"""
    WITH keys AS (
      SELECT doc_id % 8 AS shard, 'url:' || doc_id AS key FROM documents
    ),
    kp AS (
      SELECT shard,
             (('0x' || substr(md5(key), 1, 8))::BIGINT
              + i * ('0x' || substr(md5(key), 9, 8))::BIGINT)
               % {m_bits} AS pos
      FROM keys, range({k}) r(i)
    ),
    idx AS (
      SELECT shard, pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
      FROM kp GROUP BY 1, 2
    ),
    pq AS (
      SELECT 'url:' || doc_id AS key, doc_id % 8 AS true_shard
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT 'miss:' || doc_id, NULL FROM documents WHERE doc_id % 100 = 0
    ),
    pp AS (
      SELECT key,
             (('0x' || substr(md5(key), 1, 8))::BIGINT
              + i * ('0x' || substr(md5(key), 9, 8))::BIGINT)
               % {m_bits} AS pos
      FROM (SELECT DISTINCT key FROM pq), range({k}) r(i)
    ),
    pb AS (
      SELECT key, pos // 32 AS word_idx,
             CAST(1 AS BIGINT) << CAST(pos % 32 AS INT) AS bit
      FROM pp
    ),
    hits AS (
      SELECT pb.key, idx.shard
      FROM pb JOIN idx USING (word_idx)
      WHERE (idx.word & pb.bit) <> 0
      GROUP BY 1, 2
      HAVING count(*) = {k}
    )
    SELECT h.key, h.shard,
           coalesce(h.shard = p.true_shard, FALSE) AS is_true_positive
    FROM hits h
    JOIN (SELECT DISTINCT key, true_shard FROM pq) p ON h.key = p.key
    """


@q("q212_bloom_shard_prune", _bloom_shard_oracle())
def q212_bloom_shard_prune(spark, sf_dir):
    """Bloom data skipping as an explicit, mergeable table
    (operators/bloom.py:bloom_shard_index/_prune -- the
    Parquet/Iceberg bloom pattern): per-shard bitmaps live as
    (shard, word_idx, word) rows of 32-bit words built by a
    map-combined bit_or (m/32 rows per shard no matter how many keys;
    runs merge by bit_or like HLL merges by max), and a point lookup
    scans ONLY shards where all k=7 md5 double-hash probe bits are set.
    False positives are part of the answer here (unlike q109, where an
    exact verify eats them), so the bit math itself is the oracle --
    32-bit words because DuckDB raises on signed 1<<63.
    is_true_positive exposes the fpp honestly. At 10^12 rows this
    replaces reading every file for needle lookups with ~true+fpp of
    them."""
    from .operators.bloom import bloom_shard_index, bloom_shard_prune

    d = _read(spark, sf_dir, "documents")
    keys = d.select(
        (F.col("doc_id") % 8).alias("shard"),
        F.concat(F.lit("url:"), F.col("doc_id")).alias("key"),
    )
    idx = bloom_shard_index(keys, "key", "shard", m_bits=640, k=7)
    pq = d.filter(F.col("doc_id") % 25 == 0).select(
        F.concat(F.lit("url:"), F.col("doc_id")).alias("key"),
        (F.col("doc_id") % 8).alias("true_shard"),
    ).unionByName(
        d.filter(F.col("doc_id") % 100 == 0).select(
            F.concat(F.lit("miss:"), F.col("doc_id")).alias("key"),
            F.lit(None).cast("long").alias("true_shard"),
        )
    )
    hits = bloom_shard_prune(
        idx, pq.select("key").distinct(), m_bits=640, k=7
    )
    truth = pq.select("key", "true_shard").distinct()
    return hits.join(truth, "key").select(
        "key",
        "shard",
        F.coalesce(
            F.col("shard") == F.col("true_shard"), F.lit(False)
        ).alias("is_true_positive"),
    )


_Q213_PAYLOAD = (
    "shared canonical quotation payload tokens alpha bravo charlie "
    "delta echo foxtrot golf"
)


@q(
    "q213_aligned_spans",
    f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(
               CASE WHEN doc_id % 10 = 0
                    THEN text || ' {_Q213_PAYLOAD}' ELSE text END, ' '),
               w -> length(w) > 0) AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(t[i:i+2], ' ') AS gram
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
            FROM d WHERE len(t) >= 3)
    ),
    p AS (
      SELECT a.doc_id AS a_id, a.doc_id + 10 AS b_id
      FROM documents a
      WHERE a.doc_id % 10 = 0
        AND EXISTS (SELECT 1 FROM documents b
                    WHERE b.doc_id = a.doc_id + 10)
    ),
    m AS (
      SELECT p.a_id, p.b_id, ga.pos AS pos_a, gb.pos AS pos_b,
             ga.pos - gb.pos AS diag
      FROM p
      JOIN g ga ON ga.doc_id = p.a_id
      JOIN g gb ON gb.doc_id = p.b_id AND gb.gram = ga.gram
    ),
    isl AS (
      SELECT a_id, b_id, diag, pos_a, pos_b,
             pos_a - row_number() OVER
               (PARTITION BY a_id, b_id, diag ORDER BY pos_a) AS grp
      FROM m
    ),
    runs AS (
      SELECT a_id, b_id, diag, min(pos_a) AS start_a,
             min(pos_b) AS start_b,
             CAST(count(*) + 2 AS BIGINT) AS run_tokens
      FROM isl GROUP BY a_id, b_id, diag, grp
    ),
    best AS (
      SELECT *, row_number() OVER
        (PARTITION BY a_id, b_id
         ORDER BY run_tokens DESC, diag, start_a) AS rn
      FROM runs
    )
    SELECT a_id, b_id, diag, start_a, start_b, run_tokens
    FROM best WHERE rn = 1
    """,
)
def q213_aligned_spans(spark, sf_dir):
    """Aligned shared-span detection (operators/dedup.py:
    aligned_span_pairs) -- the step AFTER candidate generation: LSH
    says two docs overlap, this says WHERE and HOW LONG via the
    classic diagonal method (shared k-gram positions land on one
    diagonal pos_a - pos_b; gaps-and-islands grouping finds the
    longest consecutive run). Every window is partitioned by
    (pair, diagonal) and the gram join is bounded by the candidate
    pair list -- never corpus x corpus. Fixture: every 10th doc gets a
    12-token payload appended, pairs = consecutive payload docs, so
    each pair shares a >= 12-token run whose position differs per doc;
    the oracle replays grams, diagonals, islands, and the
    deterministic tie-break."""
    from .operators.dedup import aligned_span_pairs

    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" " + _Q213_PAYLOAD)),
        ).otherwise(F.col("text")).alias("tok_str"),
    )
    ids = _read(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        ids.filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("a_id"),
                (F.col("doc_id") + 10).alias("b_id"))
        .join(ids.select(F.col("doc_id").alias("b_id")), "b_id")
        .select("a_id", "b_id")
    )
    return aligned_span_pairs(d, pairs, text_col="tok_str", k=3)


@q(
    "q214_shrunk_host_quality",
    """
    WITH d AS (
      SELECT source || '-h' || CAST(doc_id % 7 AS VARCHAR) AS host,
             source AS domain, n_chars
      FROM documents
    ),
    h AS (
      SELECT host, domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS s
      FROM d GROUP BY 1, 2
    ),
    dm AS (
      SELECT domain, sum(s) * 1000000 // sum(n_docs)
               AS domain_mean_micros
      FROM h GROUP BY domain
    )
    SELECT h.host, h.domain, h.n_docs,
           h.s * 1000000 // h.n_docs AS mean_micros,
           dm.domain_mean_micros,
           (h.s * 1000000 + 20 * dm.domain_mean_micros)
             // (h.n_docs + 20) AS shrunk_micros
    FROM h JOIN dm USING (domain)
    """,
)
def q214_shrunk_host_quality(spark, sf_dir):
    """Empirical-Bayes shrunk host quality (operators/textstats.py:
    shrunk_group_quality): a thin host's raw mean is noise, so its
    estimate borrows alpha/(n+alpha) from the registered-domain prior
    -- the standard hierarchical-smoothing fix for host-level curation
    decisions at web scale. ONE corpus pass (partial-agg groupBy
    host); the domain prior is computed FROM host aggregates (never a
    second corpus pass) and broadcast back. Integer micros with
    exactly two floors -- engine-exact."""
    from .operators.textstats import shrunk_group_quality

    d = _read(spark, sf_dir, "documents").select(
        F.concat(
            F.col("source"), F.lit("-h"),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("host"),
        F.col("source").alias("domain"),
        "n_chars",
    )
    return shrunk_group_quality(d, alpha=20)


def _ipf_oracle(iters: int = 2) -> str:
    body = ["""
    WITH c AS (
      SELECT source AS row_key, lang AS col_key,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
    rt AS (
      SELECT row_key,
             CAST(1000000 // (SELECT count(DISTINCT row_key) FROM c)
                  AS BIGINT) AS tgt
      FROM (SELECT DISTINCT row_key FROM c)
    ),
    ct AS (
      SELECT col_key,
             CAST(1000000 // (SELECT count(DISTINCT col_key) FROM c)
                  AS BIGINT) AS tgt
      FROM (SELECT DISTINCT col_key FROM c)
    ),
    w0 AS (
      SELECT row_key, col_key, n, n * 1000000 // t AS nm,
             CAST(1000000 AS BIGINT) AS w
      FROM c, tot
    )"""]
    prev = "w0"
    step = 0
    for _ in range(iters):
        step += 1
        body.append(f""",
    rs{step} AS (SELECT row_key, CAST(sum(nm * w) AS BIGINT) AS s
                 FROM {prev} GROUP BY row_key),
    wr{step} AS (
      SELECT p.row_key, p.col_key, p.n, p.nm,
             CAST(p.w * rt.tgt // greatest(rs{step}.s // 1000000, 1)
                  AS BIGINT) AS w
      FROM {prev} p JOIN rs{step} USING (row_key)
      JOIN rt USING (row_key)
    ),
    cs{step} AS (SELECT col_key, CAST(sum(nm * w) AS BIGINT) AS s
                 FROM wr{step} GROUP BY col_key),
    wc{step} AS (
      SELECT p.row_key, p.col_key, p.n, p.nm,
             CAST(p.w * ct.tgt // greatest(cs{step}.s // 1000000, 1)
                  AS BIGINT) AS w
      FROM wr{step} p JOIN cs{step} USING (col_key)
      JOIN ct USING (col_key)
    )""")
        prev = f"wc{step}"
    body.append(f"""
    SELECT row_key, col_key, n, w AS weight_micros FROM {prev}
    """)
    return "".join(body)


@q("q215_ipf_mixture_raking", _ipf_oracle(iters=2))
def q215_ipf_mixture_raking(spark, sf_dir):
    """Iterative proportional fitting / raking (operators/mixing.py:
    ipf_raking; Deming & Stephan 1940) -- per-cell sampling weights
    that pull the (source x lang) contingency toward uniform source
    AND uniform lang marginals simultaneously, the corpus-rebalance
    primitive behind 'match these per-source and per-language token
    shares'. ONE corpus pass builds the cell counts; both IPF
    iterations run on the group-sized cell table (free at any corpus
    size). Counts are normalized to share micros and the update
    divides mass down before multiplying, so the integer arithmetic
    cannot overflow and the oracle unrolls it exactly."""
    from .operators.mixing import ipf_raking

    d = _read(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.col("source").alias("row_key"), F.col("lang").alias("col_key")
    ).agg(F.count("*").alias("n"))
    rows = counts.select("row_key").distinct()
    rt = rows.crossJoin(
        F.broadcast(rows.agg(F.count("*").alias("_c")))
    ).select("row_key", F.expr("1000000L div _c").alias("target_micros"))
    cols = counts.select("col_key").distinct()
    ct = cols.crossJoin(
        F.broadcast(cols.agg(F.count("*").alias("_c")))
    ).select("col_key", F.expr("1000000L div _c").alias("target_micros"))
    return ipf_raking(counts, rt, ct, iters=2)


@q(
    "q216_outlink_spam_ratio",
    """
    WITH lk AS (
      SELECT doc_id,
             'ext' || CAST((doc_id + j) % 7 AS VARCHAR) ||
               CASE WHEN (doc_id + j) % 2 = 0
                    THEN '.example.org' ELSE '.ads.example.net' END
               AS h
      FROM documents, unnest(range(0, 1 + doc_id % 4)) t(j)
    ),
    bl AS (SELECT unnest(['ext1.example.org', 'ext3.example.org',
                          'ads.example.net']) AS entry),
    hosts AS (SELECT DISTINCT h FROM lk),
    hs AS (
      SELECT h, array_to_string(parts[i:len(parts)], '.') AS suf
      FROM (SELECT h, string_split(h, '.') AS parts FROM hosts),
           unnest(range(1, 8)) r(i)
      WHERE i <= len(parts)
    ),
    bh AS (SELECT DISTINCT hs.h FROM hs JOIN bl ON hs.suf = bl.entry)
    SELECT lk.doc_id,
           CAST(count(*) AS BIGINT) AS n_outlinks,
           CAST(sum(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_blocked,
           sum(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END)
             * 1000000 // count(*) AS blocked_ppm
    FROM lk LEFT JOIN bh ON lk.h = bh.h
    GROUP BY lk.doc_id
    """,
)
def q216_outlink_spam_ratio(spark, sf_dir):
    """Per-page bad-outlink ratio (operators/blocklist.py:
    outlink_spam_ratio): fraction of a page's external-link targets
    whose host hits the UT1-style domain blocklist -- the
    spam-adjacency signal (a page linking mostly at blocked domains is
    itself suspect). The verdict is computed per DISTINCT host (suffix
    explode + broadcast semi-join over |hosts|, not |links| -- on a
    web graph links outnumber hosts ~1000x), links re-join on the
    host key, and one partial-agg groupBy(doc) finishes. Fixture
    synthesizes 1-4 outlinks per doc across 14 host variants, two
    blocked directly and one via the ads.example.net suffix rule (so
    the subdomain-matching path is exercised, not just exact hits)."""
    from pyspark.sql import Row

    from .operators.blocklist import outlink_spam_ratio

    d = _read(spark, sf_dir, "documents").select("doc_id")
    links = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 4).cast("int"))
        ).alias("j"),
    ).select(
        "doc_id",
        F.concat(
            F.lit("ext"),
            ((F.col("doc_id") + F.col("j")) % 7).cast("string"),
            F.when(
                (F.col("doc_id") + F.col("j")) % 2 == 0,
                F.lit(".example.org"),
            ).otherwise(F.lit(".ads.example.net")),
        ).alias("target_host"),
    )
    bl = spark.createDataFrame(
        [Row(entry=e) for e in
         ("ext1.example.org", "ext3.example.org", "ads.example.net")]
    )
    return outlink_spam_ratio(links, bl)


# --- wave: bitext mining / exact harmonic centrality / embedding moments /
#           bottom-k KMV sketches (q217-q220) --------------------------------


@q(
    "q217_bitext_candidates",
    """
    WITH p AS (
      SELECT doc_id, lang, n_chars,
             'https://' || source || '.example.com/' || lang ||
               '/docs/' || CAST(doc_id % 40 AS VARCHAR) AS url
      FROM documents
    ),
    t AS (
      SELECT doc_id, lang, n_chars,
             regexp_replace(url, '/[a-z]{2}([-_][a-zA-Z]{2})?/',
                            '/{L}/', 'g') AS tpl
      FROM p
    )
    SELECT a.tpl,
           a.doc_id AS id_a, a.lang AS lang_a, a.n_chars AS size_a,
           b.doc_id AS id_b, b.lang AS lang_b, b.n_chars AS size_b
    FROM t a JOIN t b ON a.tpl = b.tpl
    WHERE a.lang < b.lang
      AND a.n_chars * 2 <= b.n_chars * 4
      AND b.n_chars * 2 <= a.n_chars * 4
    """,
)
def q217_bitext_candidates(spark, sf_dir):
    """Bitext candidate mining (operators/bitext.py: ParaCrawl/CCMatrix
    stage 1) -- cross-lingual parallel-page pairs from URL structure:
    the language path segment is templated out with ONE JVM
    regexp_replace and pages meet by equi-join on (host, template), so
    the shuffle partitions by site section and no pair crosses hosts.
    A 2:1 length-ratio gate (integer form, no division) drops
    misaligned pairs before any content work. Fixture: each document
    gets a /{lang}/docs/{doc_id%40} URL on its source's host, so
    same-source same-slot docs in different languages pair up; sizes
    come from the real n_chars column so the ratio gate has bite.
    Reference parity: none (single-site, monolingual crawler) -- pure
    scale-path addition."""
    from .operators.bitext import bitext_candidates

    d = _read(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"),
            F.col("lang"), F.lit("/docs/"),
            (F.col("doc_id") % 40).cast("string"),
        ).alias("url"),
    )
    return bitext_candidates(pages)


@q(
    "q218_harmonic_centrality",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    e0 AS (
      SELECT doc_id AS node, (doc_id * 7 + 3) % c AS nb FROM documents, n
      UNION
      SELECT doc_id, (doc_id * 13 + 5) % c FROM documents, n
    ),
    e AS (SELECT DISTINCT node, nb FROM e0 WHERE node != nb),
    h2 AS (
      SELECT DISTINCT a.node, b.nb
      FROM e a JOIN e b ON a.nb = b.node
      WHERE b.nb != a.node
        AND NOT EXISTS (SELECT 1 FROM e x
                        WHERE x.node = a.node AND x.nb = b.nb)
    ),
    c1 AS (SELECT node, count(*) AS n1 FROM e GROUP BY node),
    c2 AS (SELECT node, count(*) AS n2 FROM h2 GROUP BY node)
    SELECT d.doc_id AS node,
           coalesce(c1.n1, 0) AS n1,
           coalesce(c2.n2, 0) AS n2,
           coalesce(c1.n1, 0) * 1000000 + coalesce(c2.n2, 0) * 500000
             AS harmonic_micros
    FROM documents d
    LEFT JOIN c1 ON c1.node = d.doc_id
    LEFT JOIN c2 ON c2.node = d.doc_id
    """,
)
def q218_harmonic_centrality(spark, sf_dir):
    """EXACT radius-2 harmonic centrality (operators/linkgraph.py:
    harmonic_centrality_r2; Boldi & Vigna 2014) on the same synthetic
    two-out-degree graph as q209 -- |N1| + |N2|/2 per node via one
    self-equi-join + distinct + anti-join, all node-keyed, no windows.
    This is the exact small-radius companion the HyperBall estimators
    (q209/q210) are validated against; radius >= 3 on a web graph
    switches to the sketch (the 2-hop frontier blowup is the
    documented cutover). Oracle restates both hop sets closed-form."""
    from .operators.linkgraph import harmonic_centrality_r2

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    nodes = d.select(F.col("doc_id").alias("node"))
    return harmonic_centrality_r2(edges, nodes)


@q(
    "q219_embedding_moments",
    """
    WITH ex AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                  AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    )
    SELECT a.dim AS i, b.dim AS j,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a.xm * b.xm) AS BIGINT) AS sxy,
           CAST(sum(a.xm) AS BIGINT) AS sxi,
           CAST(sum(b.xm) AS BIGINT) AS sxj,
           CAST(floor(
             CAST(count(*) * sum(a.xm * b.xm) - sum(a.xm) * sum(b.xm)
                  AS DOUBLE)
             / CAST(count(*) * count(*) AS DOUBLE)
           ) AS BIGINT) AS cov_micros
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY a.dim, b.dim
    """,
)
def q219_embedding_moments(spark, sf_dir):
    """Exact corpus mean + covariance of the embedding matrix
    (operators/similarity.py: embedding_moments) -- the whitening/PCA
    sufficient statistics SemDeDup-style pipelines compute before
    clustering 10^12 vectors. ONE mapInPandas pass emits batch-local
    integer-milli Gram partials (D(D+1)/2 rows PER BATCH via an int64
    numpy matmul -- never per doc), then a map-combined groupBy(i,j)
    sums them: the shuffle is O(partitions * D^2) regardless of corpus
    size (MLlib's computeGramianMatrix shape, DataFrame-native). The
    single division per output cell runs once on exact integers; the
    oracle replays the quantization and the same floor expression.
    The eigen-solve on the returned 64x64 matrix is driver-side numpy
    on ~2 KB -- deliberately not a Spark job."""
    from .operators.similarity import embedding_moments

    return embedding_moments(_read(spark, sf_dir, "embeddings"))


def _bottomk_cte(k: int = 16) -> str:
    """Shared oracle CTEs for the KMV bottom-k sketch: per-source
    distinct-token hashes, the direct bottom-k, and the two-shard
    (even/odd doc_id) merge path."""
    return f"""
    tok AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS w
      FROM documents
    ),
    hsh AS (
      SELECT DISTINCT source AS grp, doc_id % 2 AS shard,
             ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
      FROM tok
    ),
    direct AS (
      SELECT grp, h, row_number() OVER (
        PARTITION BY grp ORDER BY h
      ) AS rank
      FROM (SELECT DISTINCT grp, h FROM hsh)
    ),
    dk AS (SELECT grp, rank, h FROM direct WHERE rank <= {k}),
    shardk AS (
      SELECT grp, shard, h FROM (
        SELECT grp, shard, h, row_number() OVER (
          PARTITION BY grp, shard ORDER BY h
        ) AS rank
        FROM (SELECT DISTINCT grp, shard, h FROM hsh)
      ) WHERE rank <= {k}
    ),
    merged AS (
      SELECT grp, rank, h FROM (
        SELECT grp, h, row_number() OVER (
          PARTITION BY grp ORDER BY h
        ) AS rank
        FROM (SELECT DISTINCT grp, h FROM shardk)
      ) WHERE rank <= {k}
    ),
    exact AS (
      SELECT grp, CAST(count(DISTINCT h) AS BIGINT) AS exact_distinct
      FROM hsh GROUP BY grp
    )"""


@q(
    "q220_bottomk_sketch",
    "WITH" + _bottomk_cte(k=16) + """
    SELECT dk.grp,
           CAST(count(*) AS BIGINT) AS n_in_sketch,
           CAST(coalesce(max(CASE WHEN dk.rank = 16 THEN dk.h END), 0)
                AS BIGINT) AS kth_hash,
           CAST(CASE
             WHEN max(CASE WHEN dk.rank = 16 THEN dk.h END) IS NULL
               OR max(CASE WHEN dk.rank = 16 THEN dk.h END) = 0
             THEN count(*)
             ELSE 15 * 4294967296 //
                  max(CASE WHEN dk.rank = 16 THEN dk.h END)
           END AS BIGINT) AS est_distinct,
           CAST(max(exact.exact_distinct) AS BIGINT) AS exact_distinct,
           CAST(sum(CASE WHEN merged.h IS NULL OR merged.h != dk.h
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS merge_mismatches
    FROM dk
    JOIN exact ON exact.grp = dk.grp
    LEFT JOIN merged ON merged.grp = dk.grp AND merged.rank = dk.rank
    GROUP BY dk.grp
    """,
)
def q220_bottomk_sketch(spark, sf_dir):
    """Bottom-k (KMV) distinct-value sketch per source
    (operators/sketches.py: bottomk_sketch; Bar-Yossef 2002, Beyer
    SIGMOD'07) -- the k smallest md5-hash values of each source's
    distinct tokens, the sketch family that adds Jaccard/overlap and
    uniform distinct-sampling on top of what HLL (q123) gives. The
    query ALSO proves the shard-merge law on-dataflow: sketches built
    independently on the even/odd doc_id shards, merged by
    union+re-rank (bottomk_merge), must equal the direct single-pass
    sketch row-for-row -- merge_mismatches is 0 for every group, and
    the oracle states the whole equality closed-form. est_distinct is
    the exact-integer KMV estimator (k-1)*2^32 div kth_hash; groups
    with < k distinct keys report exactly. Scale shape: map-combined
    distinct, then a window row_number partitioned BY GROUP (never a
    global sort); the constant-threshold prune documented in the
    operator keeps the per-group sorted set ~k-sized at 10^9 distinct
    keys."""
    from .operators.sketches import (
        bottomk_estimate,
        bottomk_merge,
        bottomk_sketch,
    )

    k = 16
    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("w"),
    )
    direct = bottomk_sketch(toks, "source", "w", k=k)
    sk_even = bottomk_sketch(
        toks.filter(F.col("doc_id") % 2 == 0), "source", "w", k=k
    )
    sk_odd = bottomk_sketch(
        toks.filter(F.col("doc_id") % 2 == 1), "source", "w", k=k
    )
    merged = bottomk_merge(k, sk_even, sk_odd).select(
        "grp", "rank", F.col("h").alias("mh")
    )
    est = bottomk_estimate(direct, k=k)
    exact = (
        toks.select(F.col("source").alias("grp"), "w")
        .distinct()
        .groupBy("grp")
        .agg(F.count("*").cast("long").alias("exact_distinct"))
    )
    mism = (
        direct.join(merged, ["grp", "rank"], "left")
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(
                    F.col("mh").isNull() | (F.col("mh") != F.col("h")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("merge_mismatches")
        )
    )
    return (
        est.join(exact, "grp")
        .join(mism, "grp")
        .select(
            "grp", "n_in_sketch", "kth_hash", "est_distinct",
            "exact_distinct", "merge_mismatches",
        )
    )


# --- wave: bitext margin scoring / JL projection / phrase search /
#           MAD outliers / personalized PageRank / signal correlations
#           (q221-q226) ------------------------------------------------------


_BUCKET8_SQL = """
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
       + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
       + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
       + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
       + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END)
"""


@q(
    "q221_bitext_margin",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {_BUCKET8_SQL} AS bucket,
             vec_id % 2 AS side
      FROM embeddings
    ),
    cand AS (
      SELECT x.vec_id AS id_x, y.vec_id AS id_y,
             round(list_cosine_similarity(x.v, y.v), 4) AS sim
      FROM base x JOIN base y USING (bucket)
      WHERE x.side = 0 AND y.side = 1
    ),
    kx AS (
      SELECT id_x, round(avg(sim), 6) AS avgk_x FROM (
        SELECT id_x, sim, row_number() OVER (
          PARTITION BY id_x ORDER BY sim DESC, id_y
        ) AS r FROM cand
      ) WHERE r <= 4 GROUP BY id_x
    ),
    ky AS (
      SELECT id_y, round(avg(sim), 6) AS avgk_y FROM (
        SELECT id_y, sim, row_number() OVER (
          PARTITION BY id_y ORDER BY sim DESC, id_x
        ) AS r FROM cand
      ) WHERE r <= 4 GROUP BY id_y
    ),
    sc AS (
      SELECT c.id_x, c.id_y, c.sim, kx.avgk_x, ky.avgk_y,
             round(2.0 * c.sim / (kx.avgk_x + ky.avgk_y), 4) AS margin
      FROM cand c JOIN kx USING (id_x) JOIN ky USING (id_y)
    )
    SELECT id_x, id_y, sim, avgk_x, avgk_y, margin FROM (
      SELECT *, row_number() OVER (
        PARTITION BY id_x ORDER BY margin DESC, id_y
      ) AS r FROM sc
    ) WHERE r = 1
    """,
)
def q221_bitext_margin(spark, sf_dir):
    """Margin-based bitext scoring (operators/bitext.py stage 2 --
    Artetxe & Schwenk 2019 ratio margin, the CCMatrix mining
    criterion): candidate cross-lingual pairs come from a sign-LSH
    bucket equi-join (never all-pairs); each candidate cosine is
    normalized by the average of both endpoints' top-4 candidate
    cosines (id-partitioned windows -- key-local, no global sort) and
    each source vector keeps its best partner by margin. Fixture:
    even vec_ids play the source-language pool, odd the target pool.
    Reference parity: none (monolingual crawler) -- scale-path
    addition composing with q217's structural candidates."""
    from .operators.bitext import bitext_margin_scores

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "side", (F.col("vec_id") % 2).cast("int")
    )
    return bitext_margin_scores(emb, k=4, bits=8)


@q(
    "q222_jl_projection",
    """
    WITH ex AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                  AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    pj AS (
      SELECT vec_id, CAST(j AS INTEGER) AS j,
             CAST(sum(xm * (1 - 2 * ((dim * 31 + j * 17) % 2)))
                  AS BIGINT) AS pj
      FROM ex, unnest(range(0, 16)) AS t(j)
      GROUP BY vec_id, j
    ),
    oss AS (
      SELECT vec_id, CAST(sum(xm * xm) AS BIGINT) AS orig_ss
      FROM ex GROUP BY vec_id
    ),
    pss AS (
      SELECT vec_id, CAST(sum(pj * pj) AS BIGINT) AS proj_ss
      FROM pj GROUP BY vec_id
    )
    SELECT p.vec_id, p.j, p.pj, o.orig_ss, s.proj_ss,
           CAST((s.proj_ss * 1000000)
                // (greatest(o.orig_ss, 1) * 16) AS BIGINT)
             AS ratio_micros
    FROM pj p JOIN oss o USING (vec_id) JOIN pss s USING (vec_id)
    """,
)
def q222_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection to 16 dims with a
    deterministic +-1 sign matrix (operators/similarity.py
    jl_random_projection -- Achlioptas 2003): ONE mapInPandas int64
    matmul per Arrow batch, zero shuffle, embarrassingly parallel.
    Inputs quantize to integer millis so every projected coordinate is
    an order-free integer dot product the oracle replays exactly; the
    per-vector ratio_micros column audits norm preservation
    (E[proj_ss] = 16 * orig_ss for +-1 signs). The pre-ANN shrink step
    for 10^12-vector indexes. Reference parity: none."""
    from .operators.similarity import jl_random_projection

    return jl_random_projection(
        _read(spark, sf_dir, "embeddings"), out_dim=16, quant=1000
    )


@q(
    "q223_phrase_search",
    """
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         w -> length(w) > 0) AS w
      FROM documents
    ),
    toks AS (
      SELECT doc_id, w[i] AS term, i - 1 AS pos
      FROM ws, unnest(range(1, len(w) + 1)) AS r(i)
    ),
    p0 AS (SELECT doc_id, pos AS p FROM toks WHERE term = 'value'),
    p1 AS (SELECT doc_id, pos - 1 AS p FROM toks WHERE term = 'table'),
    p2 AS (SELECT doc_id, pos - 2 AS p FROM toks WHERE term = 'part')
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(p) AS BIGINT) AS first_pos
    FROM p0 JOIN p1 USING (doc_id, p) JOIN p2 USING (doc_id, p)
    GROUP BY doc_id
    """,
)
def q223_phrase_search(spark, sf_dir):
    """Exact phrase search ("value table part") via positional-posting
    self-joins (operators/retrieval.py phrase_search -- Manning IR
    2.4): the i-th term's postings join the anchor term's on
    (doc_id, pos + i), so only consecutive-position matches survive.
    Each join side is first cut to ONE term's postings -- at corpus
    scale with a term-partitioned posting table the joins move only
    the phrase terms' rows. Extends q119's doc-level inverted index to
    the positional form search engines actually serve."""
    from .operators.retrieval import phrase_search

    return phrase_search(
        _read(spark, sf_dir, "documents"), "value table part"
    )


@q(
    "q224_robust_outliers",
    """
    WITH med AS (
      SELECT lang AS grp,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
      FROM documents GROUP BY lang
    ),
    mad AS (
      SELECT d.lang AS grp,
             quantile_cont(abs(CAST(d.n_chars AS DOUBLE) - m.med), 0.5)
               AS mad
      FROM documents d JOIN med m ON d.lang = m.grp
      GROUP BY d.lang
    )
    SELECT d.doc_id AS id, d.lang AS grp,
           CAST(d.n_chars AS DOUBLE) AS x, m.med, a.mad,
           CASE WHEN a.mad > 0 THEN
             round(0.6745 * (CAST(d.n_chars AS DOUBLE) - m.med) / a.mad, 4)
           END AS z,
           coalesce(
             CASE WHEN a.mad > 0 THEN
               abs(round(0.6745 * (CAST(d.n_chars AS DOUBLE) - m.med)
                         / a.mad, 4)) > 3.5
             END, false) AS is_outlier
    FROM documents d
    JOIN med m ON d.lang = m.grp
    JOIN mad a ON d.lang = a.grp
    """,
)
def q224_robust_outliers(spark, sf_dir):
    """Per-language robust length-outlier gate via median/MAD modified
    z-score (operators/stats.py robust_outliers_mad -- Iglewicz &
    Hoaglin 1993): mean/stddev are dragged by the very outliers they
    should catch; median and MAD have a 50% breakdown point. TWO
    grouped exact percentile aggregations (partial-agg, never a corpus
    window), per-group 1-row dims broadcast back, z as per-row codegen;
    swap both calls to percentile_approx unchanged at 10^12 rows
    (textstats.length_percentiles' documented KLL path)."""
    from .operators.stats import robust_outliers_mad

    return robust_outliers_mad(
        _read(spark, sf_dir, "documents"), "n_chars", "lang"
    )


@q(
    "q225_personalized_pagerank",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    r0 AS (SELECT doc_id AS node,
                  CAST(CASE WHEN doc_id < 5 THEN 1000000 ELSE 0 END
                       AS BIGINT) AS s
           FROM documents),
    c1 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
    r1 AS (SELECT d.doc_id AS node,
                  CAST((CASE WHEN d.doc_id < 5 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
           FROM documents d LEFT JOIN c1 ON d.doc_id = c1.dst),
    c2 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
    r2 AS (SELECT d.doc_id AS node,
                  CAST((CASE WHEN d.doc_id < 5 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
           FROM documents d LEFT JOIN c2 ON d.doc_id = c2.dst),
    c3 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r2 ON e.src = r2.node GROUP BY dst),
    r3 AS (SELECT d.doc_id AS node,
                  CAST((CASE WHEN d.doc_id < 5 THEN 150000 ELSE 0 END)
                       + (85 * coalesce(c, 0)) // 100 AS BIGINT) AS s
           FROM documents d LEFT JOIN c3 ON d.doc_id = c3.dst)
    SELECT node, s AS rank_micros FROM r3
    """,
)
def q225_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank / random walk with restart to a 5-node
    seed set (operators/linkgraph.py personalized_pagerank_micros) --
    the seed-expansion primitive behind TrustRank propagation and
    topic-conditioned crawl prioritization: teleport mass goes ONLY to
    seeds, so rank concentrates in their neighborhoods. Same
    synthesized 2-out graph and integer-micros floor-division
    discipline as q83 (partial-sum order cannot perturb results; the
    oracle unrolls the identical recurrence); joins + partial-agg
    groupBy per round, seeds broadcast, no actions in the loop."""
    from .operators.linkgraph import personalized_pagerank_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    seeds = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("node")
    )
    return personalized_pagerank_micros(edges, seeds, n_iter=3)


@q(
    "q226_signal_correlations",
    """
    WITH sig AS (
      SELECT source AS grp,
             CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT)
               AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w = 'the')) AS BIGINT) AS n_the
      FROM documents
    ),
    st AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(n_chars) AS sa, sum(n_chars * n_chars) AS saa,
             sum(n_tokens) AS sb, sum(n_tokens * n_tokens) AS sbb,
             sum(n_the) AS sc, sum(n_the * n_the) AS scc,
             sum(n_chars * n_tokens) AS sab,
             sum(n_chars * n_the) AS sac,
             sum(n_tokens * n_the) AS sbc
      FROM sig GROUP BY grp
    )
    SELECT grp, 'n_chars' AS sig_i, 'n_tokens' AS sig_j, n,
           CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
           THEN round(CAST(n * sab - sa * sb AS DOUBLE)
                / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                       * CAST(n * sbb - sb * sb AS DOUBLE)), 4)
           END AS r
    FROM st
    UNION ALL
    SELECT grp, 'n_chars', 'n_the', n,
           CASE WHEN n * saa - sa * sa > 0 AND n * scc - sc * sc > 0
           THEN round(CAST(n * sac - sa * sc AS DOUBLE)
                / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                       * CAST(n * scc - sc * sc AS DOUBLE)), 4)
           END
    FROM st
    UNION ALL
    SELECT grp, 'n_tokens', 'n_the', n,
           CASE WHEN n * sbb - sb * sb > 0 AND n * scc - sc * sc > 0
           THEN round(CAST(n * sbc - sb * sc AS DOUBLE)
                / sqrt(CAST(n * sbb - sb * sb AS DOUBLE)
                       * CAST(n * scc - sc * sc AS DOUBLE)), 4)
           END
    FROM st
    """,
)
def q226_signal_correlations(spark, sf_dir):
    """Per-source Pearson correlation of every quality-signal pair
    (operators/stats.py signal_correlations) -- the redundancy audit
    before combining curation signals into a composite score: two
    signals at r > 0.9 double-count one phenomenon. EXACT integer
    sufficient statistics for all pairs ride ONE partial-agg groupBy
    (order-free bigint sums -- the repo determinism discipline,
    stats.py:1-19); the only float op is the final r expression,
    replayed identically by the oracle. Signals: n_chars, whitespace
    token count, 'the'-count."""
    from .operators.stats import signal_correlations

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        F.col("source").alias("src_grp"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(
            F.filter(F.split("text", " "), lambda w: w == F.lit("the"))
        ).cast("bigint").alias("n_the"),
    )
    return signal_correlations(
        d, ["n_chars", "n_tokens", "n_the"], "src_grp"
    )


# --- wave: KMV pairwise Jaccard / shard-mix KL / banded sentence alignment /
#           categorical NMI (q227-q230) --------------------------------------


@q(
    "q227_kmv_jaccard",
    """
    WITH tok AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS w
      FROM documents
    ),
    hsh AS (
      SELECT DISTINCT source AS grp,
             ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
      FROM tok
    ),
    sk AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (
          PARTITION BY grp ORDER BY h
        ) AS r FROM hsh
      ) WHERE r <= 16
    ),
    g AS (SELECT DISTINCT grp FROM sk),
    pairs AS (
      SELECT a.grp AS ga, b.grp AS gb
      FROM g a JOIN g b ON a.grp < b.grp
    ),
    u AS (
      SELECT DISTINCT ga, gb, h FROM (
        SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.grp = p.ga
        UNION ALL
        SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.grp = p.gb
      )
    ),
    uk AS (
      SELECT ga, gb, h FROM (
        SELECT ga, gb, h, row_number() OVER (
          PARTITION BY ga, gb ORDER BY h
        ) AS r FROM u
      ) WHERE r <= 16
    ),
    tot AS (
      SELECT ga, gb, CAST(count(*) AS BIGINT) AS k_used
      FROM uk GROUP BY ga, gb
    ),
    inter AS (
      SELECT uk.ga, uk.gb, CAST(count(*) AS BIGINT) AS inter_k
      FROM uk
      JOIN sk sa ON sa.grp = uk.ga AND sa.h = uk.h
      JOIN sk sb ON sb.grp = uk.gb AND sb.h = uk.h
      GROUP BY uk.ga, uk.gb
    )
    SELECT t.ga AS grp_a, t.gb AS grp_b, t.k_used,
           coalesce(i.inter_k, 0) AS inter_k,
           coalesce(i.inter_k, 0) * 1000000 // t.k_used
             AS jaccard_micros
    FROM tot t LEFT JOIN inter i ON t.ga = i.ga AND t.gb = i.gb
    """,
)
def q227_kmv_jaccard(spark, sf_dir):
    """Pairwise source-vocabulary Jaccard from bottom-k KMV sketches
    (operators/sketches.py bottomk_jaccard -- Beyer SIGMOD'07 S5 /
    Broder min-wise): |union-bottom-k ∩ skA ∩ skB| / k_used, computed
    ONLY from q220's sketches -- the raw corpus is never re-read, which
    is the whole point at 10^5 shards: the overlap matrix of every
    shard pair moves k·groups sketch rows. Exact integer arithmetic
    end-to-end (hash randomness, not float math); group-pair expansion
    is sketch-sized; union bottom-k is a PAIR-partitioned window."""
    from .operators.sketches import bottomk_jaccard, bottomk_sketch

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("w"),
    )
    return bottomk_jaccard(bottomk_sketch(toks, "source", "w", k=16), k=16)


@q(
    "q228_shard_mix_kl",
    """
    WITH pair AS (
      SELECT doc_id % 8 AS shard, source AS cls,
             CAST(count(*) AS BIGINT) AS n_sc
      FROM documents GROUP BY doc_id % 8, source
    ),
    st AS (SELECT shard, sum(n_sc) AS n_s FROM pair GROUP BY shard),
    ct AS (SELECT cls, sum(n_sc) AS n_c FROM pair GROUP BY cls),
    nn AS (SELECT sum(n_sc) AS n FROM pair),
    kl AS (
      SELECT p.shard, max(s.n_s) AS n_docs,
             CAST(floor(1e6 * sum(
               (CAST(p.n_sc AS DOUBLE) / s.n_s)
               * ln(CAST(p.n_sc AS DOUBLE) * nn.n
                    / (CAST(s.n_s AS DOUBLE) * c.n_c))
             )) AS BIGINT) AS kl_micros
      FROM pair p JOIN st s USING (shard) JOIN ct c USING (cls)
           CROSS JOIN nn
      GROUP BY p.shard
    ),
    dom AS (
      SELECT shard, cls AS max_class,
             n_sc * 1000000 // n_s AS max_class_frac_micros
      FROM (
        SELECT p.shard, p.cls, p.n_sc, s.n_s, row_number() OVER (
          PARTITION BY p.shard ORDER BY p.n_sc DESC, p.cls
        ) AS r
        FROM pair p JOIN st s USING (shard)
      ) WHERE r = 1
    )
    SELECT k.shard, k.n_docs, k.kl_micros, d.max_class,
           CAST(d.max_class_frac_micros AS BIGINT)
             AS max_class_frac_micros
    FROM kl k JOIN dom d USING (shard)
    """,
)
def q228_shard_mix_kl(spark, sf_dir):
    """Per-shard composition audit (operators/mixing.py shard_mix_kl):
    KL divergence of each training shard's source mix from the global
    mix + the dominant class -- the shuffle-quality gate RefinedWeb/
    FineWeb shard specs pin to ~0 (sequentially-streamed shards with
    large KLs = non-stationary training data). Counts ride ONE raw-row
    shuffle (pair groupBy; marginals re-aggregate from pair counts,
    dims broadcast); ln floored to micros per q146's proven
    cross-engine discipline. Shards here: doc_id % 8."""
    from .operators.mixing import shard_mix_kl

    d = _read(spark, sf_dir, "documents").withColumn(
        "shard", F.col("doc_id") % 8
    )
    return shard_mix_kl(d, "shard", "source")


@q(
    "q229_sentence_align",
    """
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         w -> length(w) > 0) AS w
      FROM documents
    ),
    sents AS (
      SELECT doc_id, CAST(i AS BIGINT) AS idx,
             CAST((len(w) + 9) // 10 AS BIGINT) AS n_sents,
             w[(i * 10 + 1):(i * 10 + 10)] AS toks
      FROM ws, unnest(range(0, (len(w) + 9) // 10)) AS r(i)
    ),
    a AS (
      SELECT doc_id AS pair_id, idx AS i, n_sents AS na,
             list_distinct(toks) AS ta
      FROM sents WHERE doc_id < 250
    ),
    b AS (
      SELECT doc_id - 250 AS pair_id, idx AS j, n_sents AS nb,
             list_distinct(toks) AS tb
      FROM sents WHERE doc_id >= 250
    ),
    cand AS (
      SELECT a.pair_id, a.i, b.j,
             CASE WHEN len(list_distinct(list_concat(ta, tb))) > 0
             THEN CAST(len(list_intersect(ta, tb)) AS BIGINT)
                  * 1000000
                  // len(list_distinct(list_concat(ta, tb)))
             ELSE 0 END AS jacc_micros
      FROM a JOIN b USING (pair_id)
      WHERE abs(b.j * a.na - a.i * b.nb) <= 2 * a.na
    )
    SELECT pair_id, i, j, CAST(jacc_micros AS BIGINT) AS jacc_micros
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY pair_id, i ORDER BY jacc_micros DESC, j
      ) AS r FROM cand
    ) WHERE r = 1
    """,
)
def q229_sentence_align(spark, sf_dir):
    """Banded diagonal sentence alignment inside candidate document
    pairs (operators/bitext.py align_sentences_banded -- hunalign /
    Gale-Church's diagonal-corridor insight made relational): sentence
    i of the source may only pair inside |j*na - i*nb| <= band*na (the
    integer cross-multiplied corridor -- no division), scored by exact
    token-set Jaccard in micros. ONE pair-keyed equi-join (shuffle
    partitions by document pair, nothing global) + a (pair, i)-
    partitioned window. Fixture: doc d < 250 pairs with doc d+250;
    sentences are 10-token slices."""
    from .operators.bitext import align_sentences_banded

    d = _read(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        .alias("w"),
    )
    sents = ws.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                ((F.size("w") + 9) / 10).cast("long") - 1,
            )
        ).alias("idx"),
        ((F.size("w") + 9) / 10).cast("long").alias("n_sents"),
        F.col("w"),
    ).select(
        "doc_id",
        "idx",
        "n_sents",
        F.slice(
            "w", (F.col("idx") * 10 + 1).cast("int"), 10
        ).alias("tokens"),
    )
    sent_a = sents.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("pair_id"), "idx", "n_sents", "tokens"
    )
    sent_b = sents.filter(F.col("doc_id") >= 250).select(
        (F.col("doc_id") - 250).alias("pair_id"),
        "idx",
        "n_sents",
        "tokens",
    )
    return align_sentences_banded(sent_a, sent_b, band=2)


@q(
    "q230_categorical_nmi",
    """
    WITH pair AS (
      SELECT lang AS c, source AS t, CAST(count(*) AS BIGINT) AS n_ct
      FROM documents GROUP BY lang, source
    ),
    pc AS (SELECT c, sum(n_ct) AS n_c FROM pair GROUP BY c),
    pt AS (SELECT t, sum(n_ct) AS n_t FROM pair GROUP BY t),
    nn AS (SELECT sum(n_ct) AS n FROM pair),
    mi AS (
      SELECT max(nn.n) AS n,
             CAST(floor(1e6 * sum(
               (CAST(p.n_ct AS DOUBLE) / nn.n)
               * ln(CAST(p.n_ct AS DOUBLE) * nn.n
                    / (CAST(pc.n_c AS DOUBLE) * pt.n_t))
             )) AS BIGINT) AS mi_micros
      FROM pair p JOIN pc USING (c) JOIN pt USING (t) CROSS JOIN nn
    ),
    hc AS (
      SELECT CAST(floor(-1e6 * sum(
               (CAST(n_c AS DOUBLE) / nn.n)
               * ln(CAST(n_c AS DOUBLE) / nn.n)
             )) AS BIGINT) AS h_pred_micros
      FROM pc CROSS JOIN nn
    ),
    ht AS (
      SELECT CAST(floor(-1e6 * sum(
               (CAST(n_t AS DOUBLE) / nn.n)
               * ln(CAST(n_t AS DOUBLE) / nn.n)
             )) AS BIGINT) AS h_truth_micros
      FROM pt CROSS JOIN nn
    )
    SELECT CAST(mi.n AS BIGINT) AS n, hc.h_pred_micros,
           ht.h_truth_micros, mi.mi_micros,
           CASE WHEN hc.h_pred_micros + ht.h_truth_micros > 0
           THEN 2 * mi.mi_micros * 1000000
                // (hc.h_pred_micros + ht.h_truth_micros)
           END AS nmi_micros
    FROM mi CROSS JOIN hc CROSS JOIN ht
    """,
)
def q230_categorical_nmi(spark, sf_dir):
    """Normalized mutual information between two categorical labelings
    (operators/stats.py categorical_nmi) -- the permutation-invariant
    extrinsic score for cluster assignments (dedup clusters vs known
    dup groups; here lang vs source as the on-corpus demo). Exact
    count ratios from ONE pair groupBy (marginals re-aggregate from
    pair counts); entropies/MI floored to micros (q146 ln discipline);
    single-row output, 1-row dims broadcast-crossed."""
    from .operators.stats import categorical_nmi

    return categorical_nmi(
        _read(spark, sf_dir, "documents"), "lang", "source"
    )


# --- wave: contiguous global ids / greedy k-center coreset (q231-q232) -------


@q(
    "q231_contiguous_ids",
    """
    SELECT doc_id, text, lang, source, n_chars,
           CAST(row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR)),
                      CAST(doc_id AS VARCHAR)
           ) - 1 AS BIGINT) AS gid
    FROM documents
    """,
)
def q231_contiguous_ids(spark, sf_dir):
    """Dense contiguous 0..N-1 id assignment WITHOUT a global sort
    (operators/layout.py contiguous_ids): the scale-correct
    replacement for monotonically_increasing_id (not contiguous,
    layout-dependent) and a global row_number window (single-partition
    WindowExec -- this repo's banned scale-killer). Bucket = md5 hex
    nibble; within-bucket ranks from a bucket-PARTITIONED window;
    bucket offsets = a window-free prefix sum over the 16-row count
    table, broadcast back. Result provably equals row_number over
    (md5, key) -- which is exactly what the oracle states -- but the
    biggest sort anywhere is 1/16 of the corpus (3 nibbles = 1/4096 at
    10^12 rows)."""
    from .operators.layout import contiguous_ids

    d = _read(spark, sf_dir, "documents")
    out = contiguous_ids(d, "doc_id", buckets=16)
    return out.select("doc_id", "text", "lang", "source", "n_chars",
                      "gid")


@q(
    "q232_kcenter_coreset",
    """
    WITH ex AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    d1 AS (
      SELECT a.vec_id,
             CAST(sum((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS d
      FROM ex a JOIN ex b ON a.dim = b.dim AND b.vec_id = 0
      GROUP BY a.vec_id
    ),
    s1 AS (SELECT vec_id, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
    d2 AS (
      SELECT a.vec_id,
             CAST(sum((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS d
      FROM ex a JOIN ex b
        ON a.dim = b.dim AND b.vec_id = (SELECT vec_id FROM s1)
      GROUP BY a.vec_id
    ),
    m2 AS (SELECT d1.vec_id, least(d1.d, d2.d) AS d
           FROM d1 JOIN d2 USING (vec_id)),
    s2 AS (SELECT vec_id, d FROM m2 ORDER BY d DESC, vec_id LIMIT 1),
    d3 AS (
      SELECT a.vec_id,
             CAST(sum((a.xm - b.xm) * (a.xm - b.xm)) AS BIGINT) AS d
      FROM ex a JOIN ex b
        ON a.dim = b.dim AND b.vec_id = (SELECT vec_id FROM s2)
      GROUP BY a.vec_id
    ),
    m3 AS (SELECT m2.vec_id, least(m2.d, d3.d) AS d
           FROM m2 JOIN d3 USING (vec_id)),
    s3 AS (SELECT vec_id, d FROM m3 ORDER BY d DESC, vec_id LIMIT 1)
    SELECT CAST(0 AS INTEGER) AS sel_round,
           CAST(0 AS BIGINT) AS center_id,
           CAST(NULL AS BIGINT) AS radius_sq_micros2
    UNION ALL
    SELECT CAST(1 AS INTEGER), vec_id, d FROM s1
    UNION ALL
    SELECT CAST(2 AS INTEGER), vec_id, d FROM s2
    UNION ALL
    SELECT CAST(3 AS INTEGER), vec_id, d FROM s3
    """,
)
def q232_kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset selection (operators/kmeans.py
    kcenter_greedy -- Gonzalez 1985 farthest-point traversal, the
    2-approximation): k=4 centers from vec_id 0, each round adding the
    point FARTHEST from the chosen set. The COVERAGE-guaranteeing
    diversity-sampling primitive (Sener & Savarese 2018) next to
    k-means' density clustering (q112). Integer-micros quantization +
    exact BIGINT squared L2; per round ONE partial-agg
    max(struct(min_dist2, -id)) -- no window, no sort; k bounded
    driver actions (the q50 loop discipline). radius_sq_micros2 is
    the coverage radius-squared at selection time."""
    from .operators.kmeans import kcenter_greedy

    return kcenter_greedy(
        _read(spark, sf_dir, "embeddings"), k=4, start_id=0
    )


# --- wave: deterministic graph walks / OOV vocab curve / Borda rank fusion
#           (q233-q235) -------------------------------------------------------


@q(
    "q233_graph_walks",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    s1 AS (
      SELECT start, nb AS v1 FROM (
        SELECT n.node AS start, e.dst AS nb, row_number() OVER (
          PARTITION BY n.node
          ORDER BY md5(CAST(n.node AS VARCHAR) || '-1-'
                       || CAST(e.dst AS VARCHAR)), e.dst
        ) AS r
        FROM nodes n JOIN e ON e.src = n.node
      ) WHERE r = 1
    ),
    s2 AS (
      SELECT start, nb AS v2 FROM (
        SELECT s1.start, e.dst AS nb, row_number() OVER (
          PARTITION BY s1.start
          ORDER BY md5(CAST(s1.v1 AS VARCHAR) || '-2-'
                       || CAST(e.dst AS VARCHAR)), e.dst
        ) AS r
        FROM s1 JOIN e ON e.src = s1.v1
      ) WHERE r = 1
    )
    SELECT n.node AS start, s1.v1, s2.v2
    FROM nodes n
    LEFT JOIN s1 ON s1.start = n.node
    LEFT JOIN s2 ON s2.start = n.node
    """,
)
def q233_graph_walks(spark, sf_dir):
    """Hash-seeded deterministic random walks (operators/linkgraph.py
    deterministic_walks) -- the DeepWalk/node2vec positive-sample
    generator made REPRODUCIBLE: at step t the walker at v moves to
    the out-neighbor minimizing md5(v-t-nb), so two runs (or engine vs
    oracle) emit identical walks while choices stay hash-random across
    nodes/steps. Per step ONE src-keyed join + a partial-agg
    min(struct(hash, nb)) -- the arg-min rides the aggregation, no
    window, no driver action in the loop. Same synthesized 2-out graph
    as q83; 2 steps."""
    from .operators.linkgraph import deterministic_walks

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return deterministic_walks(edges, steps=2)


@q(
    "q234_oov_rate",
    """
    WITH tok AS (
      SELECT lang AS grp,
             unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS w
      FROM documents
    ),
    tc AS (
      SELECT grp, w, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY grp, w
    ),
    rk AS (
      SELECT grp, w, c, row_number() OVER (
        PARTITION BY grp ORDER BY c DESC, w
      ) AS r FROM tc
    )
    SELECT grp, CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN r <= 100 THEN c ELSE 0 END) AS BIGINT)
             AS top_v_tokens,
           (sum(c) - sum(CASE WHEN r <= 100 THEN c ELSE 0 END))
             * 1000000 // sum(c) AS oov_micros
    FROM rk GROUP BY grp
    """,
)
def q234_oov_rate(spark, sf_dir):
    """Per-language out-of-vocabulary rate at a top-100 frequency
    vocabulary (operators/textstats.py oov_rate) -- the tokenizer-
    design truncation-cost number next to q171's HHI concentration
    and q180's BPE fertility. Term counts ride ONE map-combined
    groupBy; the vocab cut is a window over the TERM table partitioned
    by language (never the corpus); boundary ties rank (count DESC,
    term ASC) so the oracle replays the exact cut. Exact integer
    micros."""
    from .operators.textstats import oov_rate

    return oov_rate(
        _read(spark, sf_dir, "documents"), vocab_size=100
    )


@q(
    "q235_borda_fusion",
    """
    WITH sig AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    rk AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                  AS BIGINT) AS rank_n_chars,
             CAST(row_number() OVER (ORDER BY n_tokens, doc_id)
                  AS BIGINT) AS rank_n_tokens
      FROM sig
    )
    SELECT doc_id, rank_n_chars, rank_n_tokens,
           rank_n_chars + rank_n_tokens AS borda
    FROM rk
    """,
)
def q235_borda_fusion(spark, sf_dir):
    """Borda-count rank fusion of quality signals (operators/layout.py
    borda_fusion over global_rank): signals on incomparable scales
    (chars, tokens, perplexity...) ensemble by summing their GLOBAL
    ranks -- calibration-free and outlier-immune. The oracle states
    two global row_number windows; the operator produces the identical
    ranks via contiguous_ids' bucketed two-stage trick generalized to
    range buckets (score div width) -- the biggest sort anywhere is
    one bucket, never the corpus (the single-partition WindowExec this
    repo bans)."""
    from .operators.layout import borda_fusion

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    return borda_fusion(
        d, ["n_chars", "n_tokens"], "doc_id", [64, 16]
    )


# --- wave: embedding drift / gate agreement kappa / dedup transitivity
#           (q236-q238) -------------------------------------------------------


@q(
    "q236_embedding_drift",
    """
    WITH ex AS (
      SELECT vec_id, CAST(vec_id % 2 AS VARCHAR) AS batch, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                  AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    s AS (
      SELECT batch, dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xm) AS BIGINT) AS sx
      FROM ex GROUP BY batch, dim
    ),
    pair AS (
      SELECT a.batch AS batch_a, b.batch AS batch_b, a.dim,
             a.n AS n_a, b.n AS n_b,
             (a.sx * 1000) // a.n - (b.sx * 1000) // b.n AS diff
      FROM s a JOIN s b ON a.dim = b.dim AND a.batch < b.batch
    )
    SELECT batch_a, batch_b, max(n_a) AS n_a, max(n_b) AS n_b,
           CAST(sum(diff * diff) AS BIGINT) AS dist_sq_milli2,
           array_to_string(
             (list(dim ORDER BY abs(diff) DESC, dim))[1:5], ','
           ) AS top_dims_str
    FROM pair GROUP BY batch_a, batch_b
    """,
)
def q236_embedding_drift(spark, sf_dir):
    """Embedding-space drift between corpus batches (operators/
    similarity.py embedding_drift): exact integer-milli mean vectors
    per batch (ONE map-combined groupBy -- D rows per batch move),
    then squared L2 distance between means + the 5 highest-drift
    dimensions per batch pair -- the covariate-shift monitor run
    before mixing a new crawl into an index (q219's moments are the
    second-moment companion). Floor division uses the grouped_ols
    numerator-adjust idiom so NEGATIVE sums floor identically in both
    engines. Batches here: vec_id % 2."""
    from .operators.similarity import embedding_drift

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "_batch", (F.col("vec_id") % 2).cast("string")
    )
    out = embedding_drift(emb, "_batch", quant=1000, top_dims=5)
    return out.select(
        "batch_a",
        "batch_b",
        "n_a",
        "n_b",
        "dist_sq_milli2",
        F.array_join(
            F.transform(
                "top_drift_dims", lambda d: d.cast("string")
            ),
            ",",
        ).alias("top_dims_str"),
    )


@q(
    "q237_gate_agreement",
    """
    WITH g AS (
      SELECT CASE WHEN n_chars > 400 THEN 1 ELSE 0 END AS g_long,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> length(w) > 0)) > 80
                  THEN 1 ELSE 0 END AS g_many_tokens,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> w = 'the')) >= 5
                  THEN 1 ELSE 0 END AS g_the_heavy
      FROM documents
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g_long) AS BIGINT) AS pa,
             CAST(sum(g_many_tokens) AS BIGINT) AS pb,
             CAST(sum(g_the_heavy) AS BIGINT) AS pc,
             CAST(sum(g_long * g_many_tokens) AS BIGINT) AS nab,
             CAST(sum(g_long * g_the_heavy) AS BIGINT) AS nac,
             CAST(sum(g_many_tokens * g_the_heavy) AS BIGINT) AS nbc
      FROM g
    )
    SELECT 'g_long' AS gate_a, 'g_many_tokens' AS gate_b, n,
           nab AS n11, pa - nab AS n10, pb - nab AS n01,
           n - pa - pb + nab AS n00,
           CASE WHEN nab + (pa - nab) + (pb - nab) > 0
           THEN nab * 1000000 // (nab + (pa - nab) + (pb - nab)) END
             AS jaccard_micros,
           CASE WHEN n * n - (pa * pb + (n - pa) * (n - pb)) > 0
           THEN CAST((1000000 * (n * (nab + n - pa - pb + nab)
                      - (pa * pb + (n - pa) * (n - pb))))
                // (n * n - (pa * pb + (n - pa) * (n - pb)))
                AS BIGINT) END AS kappa_micros
    FROM st
    UNION ALL
    SELECT 'g_long', 'g_the_heavy', n,
           nac, pa - nac, pc - nac, n - pa - pc + nac,
           CASE WHEN nac + (pa - nac) + (pc - nac) > 0
           THEN nac * 1000000 // (nac + (pa - nac) + (pc - nac)) END,
           CASE WHEN n * n - (pa * pc + (n - pa) * (n - pc)) > 0
           THEN CAST((1000000 * (n * (nac + n - pa - pc + nac)
                      - (pa * pc + (n - pa) * (n - pc))))
                // (n * n - (pa * pc + (n - pa) * (n - pc)))
                AS BIGINT) END
    FROM st
    UNION ALL
    SELECT 'g_many_tokens', 'g_the_heavy', n,
           nbc, pb - nbc, pc - nbc, n - pb - pc + nbc,
           CASE WHEN nbc + (pb - nbc) + (pc - nbc) > 0
           THEN nbc * 1000000 // (nbc + (pb - nbc) + (pc - nbc)) END,
           CASE WHEN n * n - (pb * pc + (n - pb) * (n - pc)) > 0
           THEN CAST((1000000 * (n * (nbc + n - pb - pc + nbc)
                      - (pb * pc + (n - pb) * (n - pc))))
                // (n * n - (pb * pc + (n - pb) * (n - pc)))
                AS BIGINT) END
    FROM st
    """,
)
def q237_gate_agreement(spark, sf_dir):
    """Pairwise agreement audit of boolean curation gates
    (operators/stats.py boolean_gate_agreement): 2x2 confusion counts,
    positive-set Jaccard and Cohen's kappa for every gate pair -- the
    filter-redundancy numbers (kappa ~ 1 = duplicate gates) read
    before chaining filters. Kappa's float form is restated as an
    exact integer rational with floor-safe division (grouped_ols
    idiom); ALL pairs ride ONE partial aggregation. Gates here:
    n_chars > 400, tokens > 80, >= 5 'the'."""
    from .operators.stats import boolean_gate_agreement

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        (F.col("n_chars") > 400).alias("g_long"),
        (F.size(toks) > 80).alias("g_many_tokens"),
        (
            F.size(
                F.filter(
                    F.split("text", " "), lambda w: w == F.lit("the")
                )
            )
            >= 5
        ).alias("g_the_heavy"),
    )
    return boolean_gate_agreement(
        d, ["g_long", "g_many_tokens", "g_the_heavy"]
    )


@q(
    "q238_dedup_transitivity",
    """
    WITH p0 AS (
      SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
      WHERE doc_id % 4 IN (0, 1)
        AND doc_id + 1 < (SELECT count(*) FROM documents)
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents
      WHERE doc_id % 8 = 0
        AND doc_id + 2 < (SELECT count(*) FROM documents)
    ),
    canon AS (
      SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
      FROM p0
    ),
    sym AS (
      SELECT u, v FROM canon UNION ALL SELECT v, u FROM canon
    ),
    wedges AS (
      SELECT e1.u AS x, e2.v AS z
      FROM sym e1 JOIN sym e2 ON e1.v = e2.u
      WHERE e1.u < e2.v
    ),
    closed AS (
      SELECT w.x, w.z FROM wedges w
      WHERE EXISTS (SELECT 1 FROM canon c
                    WHERE c.u = w.x AND c.v = w.z)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM canon) AS n_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM closed) AS n_closed,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges)
             - (SELECT CAST(count(*) AS BIGINT) FROM closed)
             AS n_open,
           CASE WHEN (SELECT count(*) FROM wedges) > 0
           THEN (SELECT CAST(count(*) AS BIGINT) FROM closed)
                * 1000000 // (SELECT count(*) FROM wedges)
           END AS closure_micros
    """,
)
def q238_dedup_transitivity(spark, sf_dir):
    """Transitivity audit of a near-duplicate pair relation
    (operators/dedup.py pair_transitivity_audit): connected-components
    dedup (q50) merges x and z whenever (x,y),(y,z) are pairs --
    closure_micros says how often the detector itself backs that leap
    (low closure = threshold chaining, the known LSH failure mode;
    Spacerini/SlimPajama-style audits report exactly this). Wedge
    enumeration = ONE middle-node equi-join of the symmetrized pair
    list (q130 triangle shape, skew bounded by max degree), closure =
    left-semi against canonical pairs. Fixture: chain pairs (d,d+1)
    for d%4 in {0,1} + closing pairs (d,d+2) at d%8=0 -> closure 50%
    by construction."""
    from .operators.dedup import pair_transitivity_audit

    d = _read(spark, sf_dir, "documents")
    n = d.count()
    chains = d.filter(
        (F.col("doc_id") % 4 < 2) & (F.col("doc_id") + 1 < n)
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    )
    closers = d.filter(
        (F.col("doc_id") % 8 == 0) & (F.col("doc_id") + 2 < n)
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 2).alias("id_b"),
    )
    return pair_transitivity_audit(chains.unionByName(closers))


# --- wave: PSI feature drift / gate marginal attribution (q239-q240) ---------


@q(
    "q239_psi_drift",
    """
    WITH binned AS (
      SELECT CAST(doc_id % 2 AS VARCHAR) AS b,
             n_chars // 100 AS bin
      FROM documents
    ),
    counts AS (
      SELECT b, bin, CAST(count(*) AS BIGINT) AS c
      FROM binned GROUP BY b, bin
    ),
    tot AS (SELECT b, sum(c) AS n FROM counts GROUP BY b),
    bins AS (SELECT DISTINCT bin FROM counts),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bins FROM bins),
    pairs AS (
      SELECT a.b AS batch_a, a.n AS n_a, y.b AS batch_b, y.n AS n_b
      FROM tot a JOIN tot y ON a.b < y.b
    ),
    cells AS (
      SELECT p.batch_a, p.batch_b, p.n_a, p.n_b, bins.bin,
             coalesce(ca.c, 0) + 1 AS ca1,
             coalesce(cb.c, 0) + 1 AS cb1,
             nb.n_bins
      FROM pairs p CROSS JOIN bins CROSS JOIN nb
      LEFT JOIN counts ca ON ca.b = p.batch_a AND ca.bin = bins.bin
      LEFT JOIN counts cb ON cb.b = p.batch_b AND cb.bin = bins.bin
    )
    SELECT batch_a, batch_b, max(n_a) AS n_a, max(n_b) AS n_b,
           max(n_bins) AS n_bins,
           CAST(floor(1e6 * sum(
             (CAST(ca1 AS DOUBLE) / (n_a + n_bins)
              - CAST(cb1 AS DOUBLE) / (n_b + n_bins))
             * ln((CAST(ca1 AS DOUBLE) * (n_b + n_bins))
                  / (CAST(cb1 AS DOUBLE) * (n_a + n_bins)))
           )) AS BIGINT) AS psi_micros
    FROM cells GROUP BY batch_a, batch_b
    """,
)
def q239_psi_drift(spark, sf_dir):
    """Population Stability Index of doc length between corpus batches
    (operators/stats.py psi_drift) -- the binned scalar-drift release
    gate (PSI < 0.1 stable / > 0.25 shift) next to q228's shard KL and
    q236's embedding mean drift. Fixed-width VALUE bins (n_chars div
    100 -- reproducible across engines and runs, unlike quantile
    bins); symmetric eps=1 pseudo-counts handle one-sided-empty bins;
    counts ride ONE (batch, bin) partial agg; ln floored to micros
    (q146 discipline). Batches: doc_id % 2."""
    from .operators.stats import psi_drift

    d = _read(spark, sf_dir, "documents").withColumn(
        "_batch", (F.col("doc_id") % 2).cast("string")
    )
    return psi_drift(d, "n_chars", "_batch", bin_width=100)


@q(
    "q240_gate_marginal",
    """
    WITH g AS (
      SELECT CASE WHEN n_chars > 400 THEN 1 ELSE 0 END AS g_long,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> length(w) > 0)) > 80
                  THEN 1 ELSE 0 END AS g_many_tokens,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> w = 'the')) >= 5
                  THEN 1 ELSE 0 END AS g_the_heavy
      FROM documents
    ),
    f AS (
      SELECT g_long, g_many_tokens, g_the_heavy,
             g_long + g_many_tokens + g_the_heavy AS n_failing
      FROM g
    ),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN n_failing > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_killed_total,
             CAST(sum(g_long) AS BIGINT) AS k_a,
             CAST(sum(CASE WHEN g_long = 1 AND n_failing = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS u_a,
             CAST(sum(g_many_tokens) AS BIGINT) AS k_b,
             CAST(sum(CASE WHEN g_many_tokens = 1 AND n_failing = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS u_b,
             CAST(sum(g_the_heavy) AS BIGINT) AS k_c,
             CAST(sum(CASE WHEN g_the_heavy = 1 AND n_failing = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS u_c
      FROM f
    )
    SELECT 'g_long' AS gate, n_docs, n_killed_total, k_a AS n_kills,
           u_a AS n_unique_kills,
           CASE WHEN k_a > 0 THEN u_a * 1000000 // k_a END
             AS unique_share_micros
    FROM st
    UNION ALL
    SELECT 'g_many_tokens', n_docs, n_killed_total, k_b, u_b,
           CASE WHEN k_b > 0 THEN u_b * 1000000 // k_b END
    FROM st
    UNION ALL
    SELECT 'g_the_heavy', n_docs, n_killed_total, k_c, u_c,
           CASE WHEN k_c > 0 THEN u_c * 1000000 // k_c END
    FROM st
    """,
)
def q240_gate_marginal(spark, sf_dir):
    """Marginal kill attribution per curation gate (operators/
    textstats.py gate_marginal_attribution): n_kills vs n_unique_kills
    (docs that come BACK if the gate is dropped) -- the ablation
    bookkeeping next to q200's order-dependent funnel and q237's
    pairwise kappa: a gate with many kills but zero unique kills is
    free to delete. ONE aggregation (per-row n_failing is codegen;
    every gate's counters ride the same partial agg). Same three
    fixture gates as q237."""
    from .operators.textstats import gate_marginal_attribution

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        (F.col("n_chars") > 400).alias("g_long"),
        (F.size(toks) > 80).alias("g_many_tokens"),
        (
            F.size(
                F.filter(
                    F.split("text", " "), lambda w: w == F.lit("the")
                )
            )
            >= 5
        ).alias("g_the_heavy"),
    )
    return gate_marginal_attribution(
        d, ["g_long", "g_many_tokens", "g_the_heavy"]
    )


# --- wave: token-budget shard manifest / ranking metrics / table profile
#           (q241-q243) -------------------------------------------------------


@q(
    "q241_shard_manifest",
    """
    WITH t AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT)
               AS tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, h, tok,
             CAST(coalesce(sum(tok) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum
      FROM t
    ),
    s AS (SELECT doc_id, h, tok, cum // 2000 AS shard_id FROM c)
    SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           arg_min(doc_id, h) AS first_id,
           arg_max(doc_id, h) AS last_id
    FROM s GROUP BY shard_id
    """,
)
def q241_shard_manifest(spark, sf_dir):
    """Token-budget training-shard manifest (operators/layout.py
    token_shard_manifest over global_cumsum): docs stream in md5
    order, each shard fills a 2000-token budget, shard_id = exclusive
    token cumsum div budget. The oracle states the global running sum
    the operator NEVER runs: global_cumsum extends q231/q235's
    bucketed two-stage trick from ranks to SUMS (per-bucket totals
    prefix-summed window-free + a bucket-partitioned running-sum
    window), so the biggest running sum anywhere is one md5-nibble
    bucket. Manifest = one partial-agg groupBy(shard_id)."""
    from .operators.layout import token_shard_manifest

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.size(toks).cast("bigint").alias("n_tokens")
    )
    return token_shard_manifest(d, "n_tokens", "doc_id", budget=2000)


@q(
    "q242_ranking_metrics",
    """
    WITH ranked AS (
      SELECT q, doc_id, rank,
             CASE WHEN doc_id % 7 = q % 7 THEN 1 ELSE 0 END AS rel
      FROM (
        SELECT qs.q, d.doc_id, row_number() OVER (
          PARTITION BY qs.q
          ORDER BY md5(CAST(qs.q AS VARCHAR) || '-'
                       || CAST(d.doc_id AS VARCHAR)), d.doc_id
        ) AS rank
        FROM documents d
        CROSS JOIN (SELECT DISTINCT doc_id AS q FROM documents
                    WHERE doc_id < 8) qs
      ) WHERE rank <= 10
    ),
    base AS (
      SELECT q, CAST(count(*) AS BIGINT) AS n_ranked,
             CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel,
             min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
             CAST(sum(CASE WHEN rank <= 5 AND rel > 0 THEN 1 ELSE 0
                      END) AS BIGINT) AS hits_k,
             CAST(floor(1e6 * sum(
               CASE WHEN rank <= 5
               THEN CAST(rel AS DOUBLE) / ln(rank + 1)
               ELSE 0 END)) AS BIGINT) AS dcg_micros
      FROM ranked GROUP BY q
    ),
    ideal AS (
      SELECT q, CAST(floor(1e6 * sum(
               CAST(rel AS DOUBLE) / ln(ir + 1))) AS BIGINT)
               AS idcg_micros
      FROM (
        SELECT q, rel, row_number() OVER (
          PARTITION BY q ORDER BY rel DESC, rank
        ) AS ir FROM ranked
      ) WHERE ir <= 5 GROUP BY q
    )
    SELECT b.q AS query_id, b.n_ranked, b.n_rel,
           CASE WHEN b.first_rel IS NOT NULL
           THEN CAST(1000000 // b.first_rel AS BIGINT) END
             AS mrr_micros,
           b.hits_k * 1000000 // 5 AS p_at_k_micros,
           b.dcg_micros, i.idcg_micros,
           CASE WHEN i.idcg_micros > 0
           THEN b.dcg_micros * 1000000 // i.idcg_micros END
             AS ndcg_micros
    FROM base b JOIN ideal i ON b.q = i.q
    """,
)
def q242_ranking_metrics(spark, sf_dir):
    """Per-query ranking quality -- MRR, precision@5, nDCG@5
    (operators/retrieval.py ranking_metrics): the offline order-
    quality eval next to q154's ROC-AUC and q184's ANN recall. DCG in
    NATURAL-log units (nDCG's ratio cancels the base, so it equals
    the textbook log2 value while keeping q146's proven ln parity);
    everything floors to micros; zero-relevant queries yield NULL.
    Fixture: 8 queries rank docs by md5 (deterministic pseudo-BM25),
    rel = doc_id % 7 == q % 7, top-10 kept."""
    from .operators.retrieval import ranking_metrics

    d = _read(spark, sf_dir, "documents").select("doc_id")
    qs = d.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("q")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q").orderBy(
        F.md5(
            F.concat_ws(
                "-",
                F.col("q").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ),
        F.col("doc_id"),
    )
    ranked = (
        d.crossJoin(F.broadcast(qs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            F.col("q").alias("query_id"),
            "rank",
            F.when(
                F.col("doc_id") % 7 == F.col("q") % 7, F.lit(1)
            ).otherwise(F.lit(0)).alias("rel"),
        )
    )
    return ranking_metrics(ranked, k=5)


@q(
    "q243_table_profile",
    """
    WITH lc AS (
      SELECT CAST(lang AS VARCHAR) AS v, count(*) AS c
      FROM documents WHERE lang IS NOT NULL GROUP BY 1
    ),
    sc AS (
      SELECT CAST(source AS VARCHAR) AS v, count(*) AS c
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    ),
    nc AS (
      SELECT CAST(n_chars AS VARCHAR) AS v, count(*) AS c
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    )
    SELECT 'lang' AS col_name,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
           (SELECT CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) FROM documents) AS n_null,
           (SELECT CAST(count(*) AS BIGINT) FROM lc) AS n_distinct,
           (SELECT v FROM lc ORDER BY c DESC, v DESC LIMIT 1)
             AS top_value,
           (SELECT CAST(c AS BIGINT) FROM lc
            ORDER BY c DESC, v DESC LIMIT 1) AS top_count
    UNION ALL
    SELECT 'source',
           (SELECT CAST(count(*) AS BIGINT) FROM documents),
           (SELECT CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) FROM documents),
           (SELECT CAST(count(*) AS BIGINT) FROM sc),
           (SELECT v FROM sc ORDER BY c DESC, v DESC LIMIT 1),
           (SELECT CAST(c AS BIGINT) FROM sc
            ORDER BY c DESC, v DESC LIMIT 1)
    UNION ALL
    SELECT 'n_chars',
           (SELECT CAST(count(*) AS BIGINT) FROM documents),
           (SELECT CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0
                            END) AS BIGINT) FROM documents),
           (SELECT CAST(count(*) AS BIGINT) FROM nc),
           (SELECT v FROM nc ORDER BY c DESC, v DESC LIMIT 1),
           (SELECT CAST(c AS BIGINT) FROM nc
            ORDER BY c DESC, v DESC LIMIT 1)
    """,
)
def q243_table_profile(spark, sf_dir):
    """Per-column data-quality profile (operators/stats.py
    table_profile -- the dbt-test/Deequ release audit): null rate,
    exact distinct count, dominant value per column; constant or
    fallback pollution ('', 'unknown') shows up as a top_value with an
    outsized top_count. Per column ONE map-combined value-count
    groupBy + ONE max(struct) argmax (ties documented: largest value);
    approx_count_distinct swap documented for 10^12 rows. Profiled:
    lang, source, n_chars."""
    from .operators.stats import table_profile

    return table_profile(
        _read(spark, sf_dir, "documents"), ["lang", "source", "n_chars"]
    )


# --- wave: RSS/Atom feed source / frontier tick composition (q244-q245) ------


@q(
    "q244_feed_seed",
    """
    -- fixture: one feed per doc — RSS for even doc_id (one <item> with a
    -- text <link> + one decoy item with NO link, dropped), Atom for odd
    -- (one <entry> with href link). Visited = doc_id % 4 = 0, so the
    -- seed set is every unvisited doc's feed url.
    SELECT 'https://' || source || '.example.com/feed-docs/'
             || CAST(doc_id AS VARCHAR) AS URL,
           2 AS Status, '' AS Data,
           '' AS "MD File", '' AS "JSON File"
    FROM documents
    WHERE doc_id % 4 != 0
    """,
)
def q244_feed_seed(spark, sf_dir):
    """RSS/Atom feed source -> frontier seeding (sources/feeds.py
    feed_entries + seed_from_feeds): the freshness channel of the URL
    universe next to the sitemap source (q39; reference
    storage.py:85-117 analog). Both dialects parse in ONE JVM regexp
    pass (blocks first, fields inside blocks -- a missing <title>
    cannot steal the next item's), zero Python, zero shuffle until the
    same left-anti state join sitemap seeding uses, so the two sources
    compose into one frontier union. Fixture: RSS feeds (with a
    link-less decoy item) for even doc_ids, Atom for odd; visited =
    doc_id % 4 = 0."""
    from .sources.feeds import feed_entries, seed_from_feeds

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"),
        F.lit(".example.com/feed-docs/"), sid,
    )
    rss = F.concat(
        F.lit("<rss><channel><item><title>Doc "), sid,
        F.lit("</title><link>"), url,
        F.lit("</link><pubDate>Mon, 01 Jan 2024</pubDate></item>"),
        F.lit("<item><title>decoy no link</title></item>"),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">'),
        F.lit("<entry><title>Doc "), sid,
        F.lit('</title><link rel="alternate" href="'), url,
        F.lit('"/><updated>2024-01-01</updated></entry></feed>'),
    )
    feeds = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom)
        .alias("feed_xml"),
    )
    entries = feed_entries(feeds, keep_cols=("doc_id",))
    visited = d.filter(F.col("doc_id") % 4 == 0).select(
        url.alias("URL")
    )
    return seed_from_feeds(entries, visited)


@q(
    "q245_frontier_tick",
    """
    -- one full frontier tick: candidates minus visited (doc_id % 4 = 0),
    -- minus robots-disallowed (q69's rules: /private/ paths -- i.e.
    -- doc_id % 3 = 0 -- blocked on odd-length-source domains), politely
    -- scheduled per domain (delay = length(source) % 3 seconds, rank by
    -- url) and capped at 5 fetches per domain this tick.
    WITH cand AS (
      SELECT doc_id, source,
             source || '.example.com' AS domain,
             'https://' || source || '.example.com'
               || CASE WHEN doc_id % 3 = 0
                       THEN '/private/' || CAST(doc_id AS VARCHAR)
                       ELSE '/docs/' || CAST(doc_id AS VARCHAR) END
               AS url
      FROM documents
    ),
    surv AS (
      SELECT * FROM cand
      WHERE doc_id % 4 != 0
        AND NOT (doc_id % 3 = 0 AND length(source) % 2 = 1)
    ),
    r AS (
      SELECT domain, url, source, row_number() OVER (
        PARTITION BY domain ORDER BY url
      ) AS fetch_rank
      FROM surv
    )
    SELECT domain, url, CAST(fetch_rank AS INTEGER) AS fetch_rank,
           CAST((fetch_rank - 1) * (length(source) % 3) AS DOUBLE)
             AS scheduled_offset_sec
    FROM r WHERE fetch_rank <= 5
    """,
)
def q245_frontier_tick(spark, sf_dir):
    """ONE declarative frontier tick -- the reference's crawl loop
    (crawler.py queue management) as a single composed plan: sitemap/
    feed candidates -> left-anti visited state (plans/state.py shape)
    -> robots Disallow filter (sources/robots.disallow_rules, q69's
    semantics) -> per-domain politeness schedule (plans/frontier.py
    schedule_fetches) -> 5-per-domain tick cap. Every stage is an
    anti-join, broadcast dim join, or domain-partitioned window; at
    10^12 urls the state/frontier join buckets by url and everything
    else is domain-keyed. Fixture mirrors q69's robots and adds
    visited = doc_id % 4 = 0, delay = length(source) % 3 s."""
    from .plans.frontier import schedule_fetches
    from .sources.robots import disallow_rules

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    domain = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("/private/"), sid)
    ).otherwise(F.concat(F.lit("/docs/"), sid))
    cand = d.select(
        "doc_id",
        "source",
        domain.alias("domain"),
        F.concat(F.lit("https://"), domain, path).alias("url"),
        path.alias("path"),
    )
    visited = d.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("https://"), domain, path).alias("url")
    )
    unvisited = cand.join(visited, "url", "left_anti")
    txt = F.concat(
        F.when(
            F.length("source") % 2 == 0,
            F.lit("User-agent: tribeca\nDisallow: /secret/\n\n"),
        ).otherwise(F.lit("")),
        F.lit("User-agent: *\nDisallow: /private/\n"),
    )
    robots = d.select(
        domain.alias("domain"), txt.alias("robots_txt")
    ).dropDuplicates(["domain"])
    rules = disallow_rules(robots, user_agent="tribeca")
    blocked = (
        unvisited.join(F.broadcast(rules), "domain")
        .filter(F.col("path").startswith(F.col("path_prefix")))
        .select("url")
        .distinct()
    )
    frontier = unvisited.join(blocked, "url", "left_anti").select(
        "source", "url"
    )
    delays = d.select(
        domain.alias("domain"),
        (F.length("source") % 3).cast("double").alias("crawl_delay"),
    ).dropDuplicates(["domain"])
    sched = schedule_fetches(frontier, delays)
    return sched.filter(F.col("fetch_rank") <= 5).select(
        "domain", "url", "fetch_rank", "scheduled_offset_sec"
    )


# --- wave: RRF fusion / filter length-bias PSI (q246-q247) -------------------


@q(
    "q246_rrf_fusion",
    """
    WITH sig AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0)) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    rk AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                  AS BIGINT) AS rank_n_chars,
             CAST(row_number() OVER (ORDER BY n_tokens, doc_id)
                  AS BIGINT) AS rank_n_tokens,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM sig
    )
    SELECT doc_id, rank_n_chars, rank_n_tokens,
           1000000 // (60 + n - rank_n_chars + 1)
             + 1000000 // (60 + n - rank_n_tokens + 1) AS rrf_micros
    FROM rk
    """,
)
def q246_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of quality signals (operators/layout.py
    rrf_fusion -- Cormack 2009, k=60): q235's Borda weights ranks
    uniformly; RRF weights the TOP, so a signal's confident head
    survives two mediocre mid-ranks. Ranks via global_rank (bucketed
    two-stage, no global window -- the oracle states the windows the
    operator avoids); each reciprocal term floors to micros
    independently so the sum is exact-integer and order-free."""
    from .operators.layout import rrf_fusion

    toks = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    return rrf_fusion(
        d, ["n_chars", "n_tokens"], "doc_id", [64, 16], k_rrf=60
    )


@q(
    "q247_filter_bias_psi",
    """
    WITH g AS (
      SELECT n_chars,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> w = 'the')) >= 5
                  THEN 'removed' ELSE 'kept' END AS b
      FROM documents
    ),
    counts AS (
      SELECT b, n_chars // 100 AS bin, CAST(count(*) AS BIGINT) AS c
      FROM g GROUP BY b, n_chars // 100
    ),
    tot AS (SELECT b, sum(c) AS n FROM counts GROUP BY b),
    bins AS (SELECT DISTINCT bin FROM counts),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bins FROM bins),
    pairs AS (
      SELECT a.b AS batch_a, a.n AS n_a, y.b AS batch_b, y.n AS n_b
      FROM tot a JOIN tot y ON a.b < y.b
    ),
    cells AS (
      SELECT p.batch_a, p.batch_b, p.n_a, p.n_b, bins.bin,
             coalesce(ca.c, 0) + 1 AS ca1,
             coalesce(cb.c, 0) + 1 AS cb1,
             nb.n_bins
      FROM pairs p CROSS JOIN bins CROSS JOIN nb
      LEFT JOIN counts ca ON ca.b = p.batch_a AND ca.bin = bins.bin
      LEFT JOIN counts cb ON cb.b = p.batch_b AND cb.bin = bins.bin
    )
    SELECT batch_a, batch_b, max(n_a) AS n_a, max(n_b) AS n_b,
           max(n_bins) AS n_bins,
           CAST(floor(1e6 * sum(
             (CAST(ca1 AS DOUBLE) / (n_a + n_bins)
              - CAST(cb1 AS DOUBLE) / (n_b + n_bins))
             * ln((CAST(ca1 AS DOUBLE) * (n_b + n_bins))
                  / (CAST(cb1 AS DOUBLE) * (n_a + n_bins)))
           )) AS BIGINT) AS psi_micros
    FROM cells GROUP BY batch_a, batch_b
    """,
)
def q247_filter_bias_psi(spark, sf_dir):
    """Filter survivorship-bias audit (psi_drift composed over a
    curation gate): PSI of the LENGTH distribution between the docs a
    CONTENT gate keeps vs removes -- the "what else does this filter
    select on?" check (a 'the'-density gate that also shifts lengths is
    quietly a length filter; RefinedWeb-style ablations report exactly
    this class of side effect). Same operator as q239, batch =
    kept/removed verdict instead of doc_id parity -- operators compose
    because batches are just a column."""
    from .operators.stats import psi_drift

    d = _read(spark, sf_dir, "documents").select(
        "n_chars",
        F.when(
            F.size(
                F.filter(
                    F.split("text", " "), lambda w: w == F.lit("the")
                )
            )
            >= 5,
            F.lit("removed"),
        ).otherwise(F.lit("kept")).alias("_verdict"),
    )
    return psi_drift(d, "n_chars", "_verdict", bin_width=100)


# --- wave: streaming sliding-log rate limiter (q248) -------------------------


@q(
    "q248_stream_rate_limit",
    """
    WITH e AS (
      SELECT event_id, user_id AS host,
             CAST(epoch_us(ts) AS BIGINT) AS tsu
      FROM events
    )
    SELECT event_id, host, tsu,
           CAST(count(*) OVER (
             PARTITION BY host ORDER BY tsu
             RANGE BETWEEN 599999999 PRECEDING AND 1 PRECEDING
           ) AS BIGINT) AS n_recent,
           count(*) OVER (
             PARTITION BY host ORDER BY tsu
             RANGE BETWEEN 599999999 PRECEDING AND 1 PRECEDING
           ) < 3 AS allowed
    FROM e
    """,
)
def q248_stream_rate_limit(spark, sf_dir):
    """Streaming per-host sliding-log rate limiter (streaming/
    stateful.py rate_limit_log, applyInPandasWithState): admit iff
    fewer than 3 same-host requests arrived in the trailing 600 s —
    the crawl-politeness admission gate AT INGEST, joining the
    stateful family (q67 first-seen, q211 dedup gate). The verdict is
    a pure function of the per-host event sequence, so the oracle is a
    batch RANGE window — stream and batch provably agree regardless of
    micro-batching (the q211 equivalence contract). State per host =
    the in-window arrival log, pruned every arrival. Fixture: events
    keyed by user_id, event-time epoch micros."""
    import tempfile
    import uuid

    from .streaming.stateful import rate_limit_log

    src = _read(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("host"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
    )
    qname = "q248mem_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as root:
        src.write.mode("overwrite").parquet(f"{root}/src")
        stream = (
            spark.readStream.schema("event_id bigint, host bigint, tsu bigint")
            .parquet(f"{root}/src")
        )
        out = rate_limit_log(stream, window_us=600_000_000, capacity=3)
        qry = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not qry.awaitTermination(300):
            qry.stop()
            raise TimeoutError("rate-limit drain exceeded 300s")
        res = spark.table(qname).cache()
        res.count()
        return res


# --- wave: in-degree Gini / embedding quality audit (q249-q250) --------------


@q(
    "q249_indegree_gini",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N FROM documents, nn
    ),
    deg AS (
      SELECT dst AS node, CAST(count(*) AS BIGINT) AS indeg
      FROM e GROUP BY dst
    ),
    r AS (
      SELECT node, indeg, CAST(row_number() OVER (
        ORDER BY indeg, node
      ) AS BIGINT) AS rk
      FROM deg
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(indeg) AS BIGINT) AS sx,
             CAST(sum(rk * indeg) AS BIGINT) AS six
      FROM r
    )
    SELECT n, sx AS total_indegree,
           CASE WHEN n * n * sx > 0 THEN
             (1000000 * (2 * six * n - (n + 1) * n * sx))
               // (n * n * sx)
           END AS gini_micros
    FROM s
    """,
)
def q249_indegree_gini(spark, sf_dir):
    """Gini coefficient of the in-degree distribution (operators/
    linkgraph.py indegree_gini) -- the one-number link-concentration
    audit (a jump says link farm / crawler trap). An ORDER STATISTIC
    computed with NO global sort: the rank index comes from
    global_rank's bucketed two-stage machinery (ties by node leave
    the sum invariant since tied degrees are equal); the rest is one
    dst-keyed degree groupBy + one 1-row exact-integer aggregation
    with floor-safe division. Same q83 synthetic graph."""
    from .operators.linkgraph import indegree_gini

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.crossJoin(F.broadcast(n_row))
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return indegree_gini(edges)


@q(
    "q250_embedding_quality",
    """
    WITH ex AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                  AS BIGINT) AS xm
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
    ),
    ssq AS (
      SELECT vec_id, CAST(sum(xm * xm) AS BIGINT) AS ss
      FROM ex GROUP BY vec_id
    ),
    nfq AS (
      SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
             len(list_filter(embedding,
                 x -> isnan(CAST(x AS DOUBLE))
                      OR abs(CAST(x AS DOUBLE)) > 1e300)) AS nf
      FROM embeddings
    ),
    per AS (
      SELECT n.vec_id, n.dim,
             CASE WHEN n.nf > 0 THEN 1 ELSE 0 END AS bad,
             CASE WHEN s.ss = 0 THEN 1 ELSE 0 END AS zero,
             s.ss // 1000000 AS norm_bin
      FROM nfq n JOIN ssq s USING (vec_id)
    ),
    cells AS (
      SELECT dim, norm_bin,
             CAST(count(*) AS BIGINT) AS n_in_bin,
             CAST(sum(bad) AS BIGINT) AS n_nonfinite_in_bin,
             CAST(sum(zero) AS BIGINT) AS n_zero_in_bin
      FROM per GROUP BY dim, norm_bin
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum(bad) AS BIGINT) AS n_nonfinite,
             CAST(sum(zero) AS BIGINT) AS n_zero
      FROM per
    )
    SELECT c.dim, c.norm_bin, c.n_in_bin, c.n_nonfinite_in_bin,
           c.n_zero_in_bin, t.n_vectors, t.n_nonfinite, t.n_zero
    FROM cells c CROSS JOIN tot t
    """,
)
def q250_embedding_quality(spark, sf_dir):
    """Embedding-table data-quality audit (operators/similarity.py
    embedding_quality_audit): NaN/Inf elements, all-zero vectors
    (cosine's classic silent failure), dimension consistency, and the
    quantized norm histogram (bimodal = two encoder versions mixed) --
    the pre-index checks next to q243's generic table profile. One
    codegen pass per row (higher-order array exprs, zero Python), one
    (dim, norm_bin) partial-agg groupBy, corpus totals broadcast onto
    the cell table. Value-determined bins, exact integers."""
    from .operators.similarity import embedding_quality_audit

    return embedding_quality_audit(_read(spark, sf_dir, "embeddings"))


# --- wave: character coverage / dedup threshold sweep (q251-q252) ------------


@q(
    "q251_char_coverage",
    """
    WITH ch AS (
      SELECT lang AS grp, unnest(string_split(text, '')) AS ch
      FROM documents
    ),
    cc AS (
      SELECT grp, ch, CAST(count(*) AS BIGINT) AS c
      FROM ch WHERE length(ch) > 0 GROUP BY grp, ch
    ),
    rk AS (
      SELECT grp, ch, c,
             row_number() OVER (
               PARTITION BY grp ORDER BY c DESC, ch
             ) AS r,
             CAST(sum(c) OVER (
               PARTITION BY grp ORDER BY c DESC, ch
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum
      FROM cc
    ),
    tot AS (
      SELECT grp, CAST(sum(c) AS BIGINT) AS n_chars_total,
             CAST(count(*) AS BIGINT) AS n_distinct_chars
      FROM cc GROUP BY grp
    ),
    hit AS (
      SELECT rk.grp,
             CAST(min(rk.r) AS BIGINT) AS alphabet_size,
             CAST(min_by(rk.cum, rk.r) AS BIGINT) AS cumhit
      FROM rk JOIN tot ON rk.grp = tot.grp
      WHERE rk.cum * 1000000 >= 999500 * tot.n_chars_total
      GROUP BY rk.grp
    )
    SELECT t.grp, t.n_chars_total, t.n_distinct_chars,
           h.alphabet_size,
           h.cumhit * 1000000 // t.n_chars_total AS covered_micros
    FROM tot t JOIN hit h ON t.grp = h.grp
    """,
)
def q251_char_coverage(spark, sf_dir):
    """Per-language character coverage at 0.9995 (operators/
    textstats.py char_coverage -- SentencePiece's character_coverage):
    the alphabet-size budget that separates Latin (dozens of chars)
    from CJK (thousands) and decides byte-fallback per language.
    Chars rank (count DESC, char ASC); the answer is the smallest
    prefix clearing the target in integer cross-multiplied form (no
    division). All windows run over the CHAR-COUNT table partitioned
    by language -- alphabet-sized, never the corpus."""
    from .operators.textstats import char_coverage

    return char_coverage(
        _read(spark, sf_dir, "documents"), coverage_micros=999_500
    )


@q(
    "q252_dedup_threshold_sweep",
    """
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '),
                                       w -> length(w) > 0)) AS toks
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
               * 1000000
               // len(list_distinct(list_concat(a.toks, b.toks)))
               AS jacc_micros
      FROM t a JOIN t b ON b.doc_id = a.doc_id + 250
      WHERE a.doc_id < 250
    ),
    th AS (SELECT unnest([500000, 600000, 700000, 800000, 900000])
             AS threshold_micros)
    SELECT CAST(th.threshold_micros AS BIGINT) AS threshold_micros,
           CAST(count(p.id_a) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT p.id_a)
                + count(DISTINCT p.id_b) AS BIGINT) AS n_docs
    FROM th LEFT JOIN pairs p
      ON p.jacc_micros >= th.threshold_micros
    GROUP BY th.threshold_micros
    """,
)
def q252_dedup_threshold_sweep(spark, sf_dir):
    """Dedup threshold ablation (operators/dedup.py
    jaccard_threshold_sweep): pairs fired and documents touched at
    each candidate Jaccard threshold -- the yield curve read before
    pinning a pipeline threshold (a cliff between thresholds = a
    template family at that similarity; RefinedWeb/SlimPajama
    ablations tabulate this). Runs over CANDIDATE pairs (bounded by
    banding, never the corpus); the oracle's distinct-doc count
    exploits the fixture's disjoint endpoint ranges (id_a < 250 <=
    id_b) so endpoint distincts add. Fixture pairs: doc d with
    d + 250, token-set Jaccard."""
    from .operators.dedup import jaccard_threshold_sweep

    toks = F.array_distinct(
        F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    )
    d = _read(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    a = d.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("id_a"), F.col("toks").alias("ta")
    )
    b = d.select(
        (F.col("doc_id") - 250).alias("id_a"),
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("tb"),
    )
    pairs = (
        a.join(b, "id_a")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb"))
            .cast("bigint")
            .alias("_i"),
            F.size(F.array_union("ta", "tb")).cast("bigint").alias("_u"),
        )
        .select(
            "id_a",
            "id_b",
            F.expr("_i * 1000000L div _u").alias("jacc_micros"),
        )
    )
    return jaccard_threshold_sweep(pairs)


# --- wave: Heaps'-law vocabulary growth (q253) -------------------------------


@q(
    "q253_heaps_law",
    """
    WITH d AS (
      SELECT source AS grp, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY doc_id
             ) AS pos,
             list_filter(string_split(text, ' '),
                         w -> length(w) > 0) AS toks
      FROM documents
    ),
    tok AS (SELECT grp, pos, unnest(toks) AS tok FROM d),
    first AS (
      SELECT grp, tok, min(pos) AS first_pos
      FROM tok GROUP BY grp, tok
    ),
    dl AS (SELECT grp, pos, CAST(len(toks) AS BIGINT) AS dl FROM d),
    nd AS (SELECT grp, max(pos) AS ndocs FROM d GROUP BY grp),
    cps AS (SELECT unnest([8, 16, 32, 64]) AS cp),
    pts AS (
      SELECT f.grp,
             CAST(floor(1e3 * ln(t.T)) AS BIGINT) AS x,
             CAST(floor(1e9 * ln(f.V)) AS BIGINT) AS y
      FROM (
        SELECT first.grp, cps.cp,
               CAST(sum(CASE WHEN first_pos <= cps.cp THEN 1 ELSE 0
                        END) AS BIGINT) AS V
        FROM first CROSS JOIN cps GROUP BY first.grp, cps.cp
      ) f
      JOIN (
        SELECT dl.grp, cps.cp,
               CAST(sum(CASE WHEN pos <= cps.cp THEN dl ELSE 0
                        END) AS BIGINT) AS T
        FROM dl CROSS JOIN cps GROUP BY dl.grp, cps.cp
      ) t ON f.grp = t.grp AND f.cp = t.cp
      JOIN nd ON nd.grp = f.grp AND nd.ndocs >= f.cp
    ),
    st AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM pts GROUP BY grp
    )
    SELECT grp, n AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             (n * sxy - sx * sy) // (n * sxx - sx * sx)
           END AS beta_micros,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             (sy - ((n * sxy - sx * sy) // (n * sxx - sx * sx)) * sx)
               // n
           END AS lnk_nanos
    FROM st
    """,
)
def q253_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit per source (operators/
    textstats.py heaps_law_fit): V(T) ~ K*T^beta -- beta ~ 0.4-0.6 for
    natural text, ~0 for template farms recycling a closed vocabulary,
    ~1 for hash soup; also the "what does 10x more of this source buy"
    planning number. First-occurrence positions (one partial-agg
    groupBy over the exploded stream) turn every checkpoint's V(n)
    into a conditional sum -- no per-checkpoint distincts; the fit is
    grouped_ols' exact-integer OLS on floored logs with asymmetric
    milli/nano scales so the integer slope IS beta in micros. The only
    corpus-facing window ranks DOCS within a source."""
    from .operators.textstats import heaps_law_fit

    return heaps_law_fit(_read(spark, sf_dir, "documents"))


# --- wave: 3-level shrinkage / sitemap coverage audit (q254-q255) ------------


@q(
    "q254_hierarchy_shrinkage",
    """
    -- hosts: source-X-(doc_id % 7); domains: source (q214's shape, one
    -- more level). alpha=20 host->domain, beta=50 domain->global.
    WITH h AS (
      SELECT source || '-' || CAST(doc_id % 7 AS VARCHAR) AS host,
             source AS domain, n_chars
      FROM documents
    ),
    ha AS (
      SELECT host, domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS s
      FROM h GROUP BY host, domain
    ),
    da AS (
      SELECT domain, sum(s) AS ds, sum(n_docs) AS dn
      FROM ha GROUP BY domain
    ),
    g AS (
      SELECT sum(ds) * 1000000 // sum(dn) AS gm FROM da
    ),
    dsh AS (
      SELECT domain,
             (ds * 1000000 + 50 * g.gm) // (dn + 50)
               AS dom_shrunk_micros
      FROM da CROSS JOIN g
    )
    SELECT ha.host, ha.domain, ha.n_docs,
           ha.s * 1000000 // ha.n_docs AS mean_micros,
           CAST(dsh.dom_shrunk_micros AS BIGINT) AS dom_shrunk_micros,
           CAST((ha.s * 1000000 + 20 * dsh.dom_shrunk_micros)
                // (ha.n_docs + 20) AS BIGINT) AS shrunk_micros
    FROM ha JOIN dsh USING (domain)
    """,
)
def q254_hierarchy_shrinkage(spark, sf_dir):
    """THREE-level empirical-Bayes quality (operators/textstats.py
    shrunk_hierarchy_quality -- multilevel partial pooling, Gelman's
    radon model applied to hosts): a thin host borrows from its
    domain, a thin DOMAIN borrows from the corpus -- the behavior
    q214's one-level shrink can't give. ONE corpus pass (host partial
    agg); domain and global levels aggregate host-count rows and
    broadcast back down; integer micros, three floors, engine-exact."""
    from .operators.textstats import shrunk_hierarchy_quality

    d = _read(spark, sf_dir, "documents").select(
        F.concat(
            F.col("source"), F.lit("-"),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("host"),
        F.col("source").alias("domain"),
        "n_chars",
    )
    return shrunk_hierarchy_quality(d, alpha=20, beta=50)


@q(
    "q255_sitemap_coverage",
    """
    -- sitemap lists even doc_ids; crawl visited doc_id % 3 != 0.
    WITH u AS (
      SELECT source || '.example.com' AS host,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) AS url,
             doc_id
      FROM documents
    ),
    j AS (
      SELECT host, url,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS in_s,
             CASE WHEN doc_id % 3 != 0 THEN 1 ELSE 0 END AS in_c
      FROM u
    ),
    a AS (
      SELECT host,
             CAST(sum(in_s) AS BIGINT) AS n_in_sitemap,
             CAST(sum(in_c) AS BIGINT) AS n_crawled,
             CAST(sum(in_s * in_c) AS BIGINT) AS n_both
      FROM j WHERE in_s = 1 OR in_c = 1 GROUP BY host
    )
    SELECT host, n_in_sitemap, n_crawled, n_both,
           n_in_sitemap - n_both AS n_sitemap_only,
           n_crawled - n_both AS n_crawled_only,
           CASE WHEN n_in_sitemap > 0
           THEN n_both * 1000000 // n_in_sitemap END
             AS crawl_coverage_micros,
           CASE WHEN n_crawled > 0
           THEN (n_crawled - n_both) * 1000000 // n_crawled END
             AS orphan_micros
    FROM a
    """,
)
def q255_sitemap_coverage(spark, sf_dir):
    """Per-host sitemap <-> crawl coverage audit (sources/sitemap.py
    sitemap_coverage): sitemap urls never crawled (frontier debt) vs
    crawled orphans absent from the sitemap (stale sitemap) -- the two
    gap lists of every crawl review. Composes sitemap_locs' real
    <loc> parse with the visited set; full-outer join on url (the
    state table's bucket key at scale) + one host partial agg.
    Fixture: sitemaps list even doc_ids, crawl visited doc_id%3!=0."""
    from .sources.sitemap import sitemap_coverage, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/docs/"), sid)
    xml = F.concat(
        F.lit("<urlset><url><loc>"), url, F.lit("</loc></url></urlset>")
    )
    sitemaps = d.filter(F.col("doc_id") % 2 == 0).select(
        host.alias("host"), xml.alias("sitemap_xml")
    )
    locs = sitemap_locs(sitemaps, keep_cols=("host",))
    crawled = d.filter(F.col("doc_id") % 3 != 0).select(
        host.alias("host"), url.alias("url")
    )
    return sitemap_coverage(locs, crawled)


# --- wave: dangling-mass PageRank variant (q256) -----------------------------


@q(
    "q256_pagerank_dangling",
    """
    -- graph with real sinks: only EVEN doc_ids emit edges, so odd
    -- nodes that appear as targets are dangling. 2 rounds with the
    -- classic uniform dangling-mass redistribution.
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    e AS (
      SELECT doc_id AS src, (doc_id * 7 + 3) % N AS dst
      FROM documents, nn WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id * 13 + 5) % N
      FROM documents, nn WHERE doc_id % 2 = 0
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
    c1 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r0 ON e.src = r0.node GROUP BY dst),
    d1 AS (SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS dmass
           FROM r0 WHERE node NOT IN (SELECT DISTINCT src FROM e)),
    r1 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(c, 0)) // 100
                  + (85 * d1.dmass) // (100 * nc.n_nodes)
                  AS BIGINT) AS s
      FROM nodes n LEFT JOIN c1 ON n.node = c1.dst
      CROSS JOIN d1 CROSS JOIN nc
    ),
    c2 AS (SELECT dst, CAST(sum(s // 2) AS BIGINT) AS c
           FROM e JOIN r1 ON e.src = r1.node GROUP BY dst),
    d2 AS (SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS dmass
           FROM r1 WHERE node NOT IN (SELECT DISTINCT src FROM e)),
    r2 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(c, 0)) // 100
                  + (85 * d2.dmass) // (100 * nc.n_nodes)
                  AS BIGINT) AS s
      FROM nodes n LEFT JOIN c2 ON n.node = c2.dst
      CROSS JOIN d2 CROSS JOIN nc
    )
    SELECT node, s AS rank_micros FROM r2
    """,
)
def q256_pagerank_dangling(spark, sf_dir):
    """PageRank WITH dangling-mass redistribution (operators/
    linkgraph.py pagerank_micros redistribute_dangling=True) -- the
    variant real web graphs need: a crawl frontier's unfetched targets
    are all sinks, and without the uniform dangling term their mass
    leaks out of the system every round (rank sums decay; comparisons
    across snapshots break). Fixture: only even doc_ids emit edges, so
    odd targets are genuine sinks. One extra 1-row aggregate +
    broadcast per round (the dangling mass); everything else identical
    to q83's loop -- integer micros, unrolled 2 rounds in the oracle."""
    from .operators.linkgraph import pagerank_micros

    d = _read(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count("*").alias("N"))
    base = d.filter(F.col("doc_id") % 2 == 0).crossJoin(
        F.broadcast(n_row)
    )
    edges = base.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("dst"),
    ).unionByName(
        base.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 5) % F.col("N")).alias("dst"),
        )
    )
    return pagerank_micros(
        edges, n_iter=2, redistribute_dangling=True
    )


# --- wave: classical LM smoothing tables (q257-q258) -------------------------


@q(
    "q257_kneser_ney",
    """
    WITH toks AS (
      SELECT list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents WHERE lang = 'en'
    ),
    big AS (
      SELECT l[i] AS w1, l[i + 1] AS w2
      FROM (SELECT l, unnest(range(1, len(l))) AS i FROM toks)
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1p_fwd
            FROM c12 GROUP BY 1),
    bwd AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd
            FROM c12 GROUP BY 1),
    bt AS (SELECT CAST(count(*) AS BIGINT) AS B FROM c12)
    SELECT c12.w1, c12.w2, c12.c12, ctx.c1, ctx.n1p_fwd, bwd.n1p_bwd,
           CAST(floor(1e6 * ((c12.c12 - CAST(0.75 AS DOUBLE)) / ctx.c1
                + CAST(0.75 AS DOUBLE) * ctx.n1p_fwd / ctx.c1
                  * bwd.n1p_bwd / bt.B))
                AS BIGINT) AS kn_prob_micros
    FROM c12 JOIN ctx USING (w1) JOIN bwd USING (w2) CROSS JOIN bt
    """,
)
def q257_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram model table fit on the English
    slice (operators/lm.py:kneser_ney_bigram; Chen & Goodman 1999 eq.
    4.25) — the smoothing the n-gram-LM quality filters (CCNet/KenLM)
    actually use, completing the LM family next to Laplace (q73) and
    Stupid Backoff (q139). The model lives in the dataflow: one
    corpus-scale bigram-type groupBy, vocabulary-bounded marginal
    re-aggregations (context totals, N1+ forward/backward continuation
    counts), a broadcast 1-row type count, equi-joins only. Per-bigram
    probability floors to integer micros from the identical
    left-associated double expression the oracle states."""
    from .operators.lm import kneser_ney_bigram

    d = _read(spark, sf_dir, "documents")
    return kneser_ney_bigram(d, F.col("lang") == "en")


@q(
    "q258_good_turing",
    """
    WITH toks AS (
      SELECT list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents WHERE lang = 'en'
    ),
    cnt AS (SELECT w, count(*) AS r
            FROM (SELECT unnest(l) AS w FROM toks) GROUP BY 1),
    coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_types
            FROM cnt GROUP BY 1)
    SELECT CAST(a.r AS BIGINT) AS r, a.n_types,
           CAST(floor(1e6 * (a.r + 1) * coalesce(b.n_types, 0)
                      / a.n_types) AS BIGINT) AS r_star_micros
    FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
    """,
)
def q258_good_turing(spark, sf_dir):
    """Good-Turing count-of-counts table over the English slice's
    unigrams (operators/lm.py:good_turing_counts; Good 1953): N_r and
    the Turing-adjusted count r* = (r+1)N_{r+1}/N_r in integer micros.
    The estimator behind unseen-mass estimates (N_1/N) and SGT
    smoothing. Scale shape: corpus groupBy -> vocabulary-bounded
    count-of-counts -> SELF equi-join on r+1 (never a global-ordered
    window), output bounded by |distinct count values|."""
    from .operators.lm import good_turing_counts

    d = _read(spark, sf_dir, "documents")
    return good_turing_counts(d, F.col("lang") == "en")


# --- wave: extraction-quality eval harness (q259) ----------------------------


@q(
    "q259_extraction_eval",
    """
    WITH ext AS (
      SELECT doc_id,
             'Heading ' || doc_id ||
               CASE WHEN len(string_split(text, ' ')) >= 3
                    THEN ' ' || text ELSE '' END AS t
      FROM documents
    ),
    etok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(trim(
               regexp_replace(t, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS w
      FROM ext
    ),
    gtok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(trim(
               regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS w
      FROM documents
    ),
    ec AS (SELECT doc_id, w, count(*) AS c FROM etok GROUP BY 1, 2),
    gc AS (SELECT doc_id, w, count(*) AS c FROM gtok GROUP BY 1, 2),
    et AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ext
           FROM ec GROUP BY 1),
    gt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_gold
           FROM gc GROUP BY 1),
    iv AS (SELECT ec.doc_id,
                  CAST(sum(least(ec.c, gc.c)) AS BIGINT) AS n_inter
           FROM ec JOIN gc ON ec.doc_id = gc.doc_id AND ec.w = gc.w
           GROUP BY 1)
    SELECT d.doc_id,
           coalesce(et.n_ext, 0) AS n_ext,
           coalesce(gt.n_gold, 0) AS n_gold,
           coalesce(iv.n_inter, 0) AS n_inter,
           CASE WHEN coalesce(et.n_ext, 0) > 0
                THEN CAST(floor(1e6 * coalesce(iv.n_inter, 0)
                                / et.n_ext) AS BIGINT)
                ELSE 0 END AS p_micros,
           CASE WHEN coalesce(gt.n_gold, 0) > 0
                THEN CAST(floor(1e6 * coalesce(iv.n_inter, 0)
                                / gt.n_gold) AS BIGINT)
                ELSE 0 END AS r_micros,
           CASE WHEN coalesce(et.n_ext, 0) + coalesce(gt.n_gold, 0) > 0
                THEN CAST(floor(2e6 * coalesce(iv.n_inter, 0)
                                / (coalesce(et.n_ext, 0)
                                   + coalesce(gt.n_gold, 0)))
                          AS BIGINT)
                ELSE 0 END AS f1_micros
    FROM documents d
    LEFT JOIN et USING (doc_id)
    LEFT JOIN gt USING (doc_id)
    LEFT JOIN iv USING (doc_id)
    """,
)
def q259_extraction_eval(spark, sf_dir):
    """Token-level extraction-quality harness (operators/boilerplate.py
    extraction_eval; CleanEval / boilerpipe-style token-bag scoring):
    run the REAL main-content extractor (q87's jusText-lite path) over
    the synthesized pages and grade it against gold = the body text
    alone. The h1 heading the extractor keeps becomes a deliberate
    false-positive token and sub-3-word bodies become false negatives,
    so P/R/F1 vary per document and the oracle states them closed-form
    through the SAME generic multiset-intersection SQL the operator
    implements (min of per-word counts — repeated words can't
    double-credit). This is the eval loop an extraction-threshold
    sweep reads at corpus scale; plan = two token groupBys, one
    (doc, word) equi-join, three doc-keyed joins, no window."""
    from .operators.boilerplate import extraction_eval, main_content

    pages = documents_as_pages(spark, sf_dir)
    extracted = main_content(pages).select(
        "doc_id", F.col("main_text").alias("text")
    )
    gold = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return extraction_eval(extracted, gold)


# --- wave: anchor-text document expansion (q260) ------------------------------


@q(
    "q260_anchor_expansion",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    anch AS (
      SELECT (doc_id * 7 + 3) % N AS doc_id,
             array_to_string(string_split(text, ' ')[1:3], ' ')
               AS anchor
      FROM documents, nn
    ),
    btok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(trim(
               regexp_replace(text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS term
      FROM documents
    ),
    atok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(trim(
               regexp_replace(anchor, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0)) AS term
      FROM anch
    ),
    tb AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf_body
           FROM btok GROUP BY 1, 2),
    ta AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf_anchor
           FROM atok GROUP BY 1, 2)
    SELECT coalesce(tb.doc_id, ta.doc_id) AS doc_id,
           coalesce(tb.term, ta.term) AS term,
           CAST(coalesce(tb.tf_body, 0) AS BIGINT) AS tf_body,
           CAST(coalesce(ta.tf_anchor, 0) AS BIGINT) AS tf_anchor,
           CAST(coalesce(tb.tf_body, 0)
                + 2 * coalesce(ta.tf_anchor, 0) AS BIGINT)
             AS tf_expanded
    FROM tb FULL OUTER JOIN ta
      ON tb.doc_id = ta.doc_id AND tb.term = ta.term
    """,
)
def q260_anchor_expansion(spark, sf_dir):
    """Anchor-text document expansion (operators/linkgraph.py
    anchor_expansion; Craswell et al. 2001 / the anchor field of
    BM25F): inbound anchor terms are routed to the TARGET document and
    merged with its body term index at integer weight 2 — the signal
    that made early web search find sites their own text never names.
    Fixture: doc i links to (i*7+3)%N with anchor = its first three
    words, so every target's expanded index provably mixes two
    documents' vocabularies. Plan: one shuffle of the anchor stream on
    target id, two (doc, term) partial-agg groupBys, one full-outer
    equi-join — mega-indegree skew absorbed by map-side combine."""
    from .operators.linkgraph import anchor_expansion

    d = _read(spark, sf_dir, "documents")
    n_row = d.agg(F.count("*").alias("N"))
    anchors = d.crossJoin(F.broadcast(n_row)).select(
        ((F.col("doc_id") * 7 + 3) % F.col("N")).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ")
        .alias("anchor"),
    )
    return anchor_expansion(
        d.select("doc_id", "text"), anchors, anchor_weight=2
    )


# --- wave: TextTiling topic segmentation (q261) -------------------------------


@q(
    "q261_text_tiling",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    pos AS (
      SELECT doc_id, l[i] AS w, CAST((i - 1) // 8 AS BIGINT) AS blk
      FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
            FROM toks)
    ),
    cnt AS (SELECT doc_id, blk, w, count(*) AS c
            FROM pos GROUP BY 1, 2, 3),
    sz AS (SELECT doc_id, blk, CAST(sum(c) AS BIGINT) AS s
           FROM cnt GROUP BY 1, 2),
    ij AS (
      SELECT a.doc_id, a.blk AS gap,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS i
      FROM cnt a JOIN cnt b
        ON a.doc_id = b.doc_id AND a.w = b.w AND b.blk = a.blk + 1
      GROUP BY 1, 2
    ),
    gaps AS (
      SELECT l.doc_id, l.blk AS gap_idx,
             CAST(floor(2e6 * coalesce(ij.i, 0) / (l.s + r.s))
                  AS BIGINT) AS sim_micros
      FROM sz l JOIN sz r
        ON l.doc_id = r.doc_id AND r.blk = l.blk + 1
      LEFT JOIN ij ON ij.doc_id = l.doc_id AND ij.gap = l.blk
    ),
    st AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(sim_micros) AS BIGINT) AS s,
             CAST(sum(sim_micros * sim_micros) AS BIGINT) AS q
      FROM gaps GROUP BY 1
    )
    SELECT g.doc_id, g.gap_idx, g.sim_micros,
           CAST(CASE WHEN (st.s - st.n * g.sim_micros) > 0
                      AND 4 * (st.s - st.n * g.sim_micros)
                          * (st.s - st.n * g.sim_micros)
                          > st.n * st.q - st.s * st.s
                THEN 1 ELSE 0 END AS INT) AS is_boundary
    FROM gaps g JOIN st USING (doc_id)
    """,
)
def q261_text_tiling(spark, sf_dir):
    """TextTiling topic segmentation (operators/textstats.py
    text_tiling; Hearst 1997): Dice similarity between adjacent
    8-token blocks, boundary where a gap dips half a stddev below the
    document's mean — Hearst's cutoff restated EXACTLY in integers
    (4*(s - n*sim)^2 > n*q - s^2), so no float stddev and no
    aggregation-order sensitivity anywhere. The segmentation a
    long-document chunker (q116) upgrades to when blind fixed windows
    split topics. Plan: doc-keyed groupBys and block+1 self
    equi-joins only — no window, embarrassingly parallel across
    documents."""
    from .operators.textstats import text_tiling

    d = _read(spark, sf_dir, "documents")
    return text_tiling(d, block_tokens=8)


# --- wave: section-tree extraction (q262) -------------------------------------


@q(
    "q262_section_tree",
    """
    SELECT doc_id, CAST(1 AS INT) AS block_idx, CAST(1 AS INT) AS depth,
           'Part ' || doc_id AS section_path,
           'intro ' || string_split(text, ' ')[1] AS text
    FROM documents
    UNION ALL
    SELECT doc_id, 3, 2, 'Part ' || doc_id || ' > Sec A', text
    FROM documents
    UNION ALL
    SELECT doc_id, 5, 2, 'Part ' || doc_id || ' > Sec B',
           'tail ' || lang
    FROM documents
    UNION ALL
    SELECT doc_id, 7, 3, 'Part ' || doc_id || ' > Sec B > Deep',
           'leaf ' || source
    FROM documents
    """,
)
def q262_section_tree(spark, sf_dir):
    """Section-tree extraction (operators/sections.py section_tree):
    every content block attributed to its governing heading breadcrumb
    — h2 opens under h1, a sibling h2 REPLACES it, h3 nests below —
    the outline relation the reference's flat '## text' heading lines
    (crawler.py:73-76) only hint at, and the structure section-aware
    chunkers feed RAG/training pipelines. The heading-stack fold runs
    inside the block walker's existing Arrow pass (zero extra parses);
    plan = Scan -> ArrowEvalPython -> Generate -> Project, no shuffle.
    Fixture: h1/h2/h2-sibling/h3 ladder per page; the oracle states
    all four content rows and their paths closed-form — sibling
    replacement and nesting are both load-bearing."""
    from .operators.sections import section_tree

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><h1>Part "), sid, F.lit("</h1><p>intro "),
        F.split("text", " ")[0],
        F.lit("</p><h2>Sec A</h2><p>"), F.col("text"),
        F.lit("</p><h2>Sec B</h2><p>tail "), F.col("lang"),
        F.lit("</p><h3>Deep</h3><p>leaf "), F.col("source"),
        F.lit("</p></body></html>"),
    )
    pages = d.select("doc_id", F.encode(html, "UTF-8").alias("html"))
    return section_tree(pages)


# --- wave: video frame-sample anchors (q263) ----------------------------------


@q(
    "q263_frame_sample",
    """
    WITH p AS (SELECT doc_id, 5 + doc_id % 3 AS nc FROM documents),
    j AS (SELECT doc_id, nc, unnest(range(0, nc, 2)) AS cj FROM p)
    SELECT doc_id AS media_id,
           CAST(cj // 2 AS INT) AS frame_idx,
           CAST(1000 * doc_id + 16 * cj AS BIGINT) AS chunk_offset
    FROM j
    """,
)
def q263_frame_sample(spark, sf_dir):
    """Video frame-sample anchors (operators/multimodal.py
    frame_sample_anchors over mediax.frame_sample_mp4): REAL MP4
    sample-table parsing — ftyp/moov/trak walked, stco (even ids) and
    co64 (odd ids — the 64-bit box >4 GB web video carries) both
    exercised — emitting every 2nd chunk's byte offset, the positions
    a production sampler range-reads before the (stubbed) ffmpeg
    decode seam. Fixture: each doc becomes an MP4 with 5 + id%3
    chunks at offsets 1000*id + 16*j, so the sampled anchors are pure
    arithmetic the oracle states closed-form. Plan: Scan →
    ArrowEvalPython → posexplode → Project, zero shuffle — payload
    bytes never leave the Arrow batch."""
    from .operators.multimodal import frame_sample_anchors, make_mp4_udf

    d = _read(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        make_mp4_udf(
            F.lit(2000) + F.col("doc_id") % 5,
            (F.lit(5) + F.col("doc_id") % 3).cast("int"),
            (F.col("doc_id") * 1000).cast("bigint"),
            (F.col("doc_id") % 2 == 1),
        ).alias("payload"),
    )
    return frame_sample_anchors(media, every_n=2)


# --- wave: Kleinberg burst detection (q264) -----------------------------------


@q(
    "q264_kleinberg_bursts",
    """
    WITH RECURSIVE ev AS (
      SELECT CASE WHEN date_diff('day', DATE '2024-01-01',
                                 CAST(ts AS DATE)) BETWEEN 10 AND 13
                       AND user_id % 2 = 0
                  THEN 'error' ELSE event_type END AS term,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t
      FROM events
    ),
    nt AS (SELECT t, CAST(count(*) AS BIGINT) AS N FROM ev GROUP BY 1),
    ntt AS (SELECT term, t, CAST(count(*) AS BIGINT) AS n
            FROM ev GROUP BY 1, 2),
    tt AS (SELECT term, CAST(sum(n) AS BIGINT) AS n_tot
           FROM ntt GROUP BY 1),
    gg AS (SELECT CAST(sum(N) AS BIGINT) AS N_tot FROM nt),
    costs AS (
      SELECT tt.term, nt.t, coalesce(ntt.n, 0) AS n, nt.N,
             CAST(-floor(1e6 * (coalesce(ntt.n, 0)
                  * ln(CAST(tt.n_tot AS DOUBLE) / gg.N_tot)
                  + (nt.N - coalesce(ntt.n, 0))
                  * ln(1.0 - CAST(tt.n_tot AS DOUBLE) / gg.N_tot)))
                  AS BIGINT) AS c0,
             CAST(-floor(1e6 * (coalesce(ntt.n, 0)
                  * ln(least(2.0 * (CAST(tt.n_tot AS DOUBLE)
                                    / gg.N_tot), 0.999999))
                  + (nt.N - coalesce(ntt.n, 0))
                  * ln(1.0 - least(2.0 * (CAST(tt.n_tot AS DOUBLE)
                                          / gg.N_tot), 0.999999))))
                  AS BIGINT) AS c1
      FROM tt CROSS JOIN nt
      LEFT JOIN ntt ON ntt.term = tt.term AND ntt.t = nt.t
      CROSS JOIN gg
    ),
    mx AS (SELECT CAST(max(t) AS BIGINT) AS W1 FROM nt),
    fwd AS (
      SELECT term, t, c0 AS f0, c1 + 2000000 AS f1
      FROM costs WHERE t = 0
      UNION ALL
      SELECT c.term, c.t,
             least(f.f0, f.f1) + c.c0,
             least(f.f0 + 2000000, f.f1) + c.c1
      FROM fwd f JOIN costs c ON c.term = f.term AND c.t = f.t + 1
    ),
    bwd AS (
      SELECT term, t, CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1
      FROM costs, mx WHERE t = W1
      UNION ALL
      SELECT c.term, c.t,
             least(cn.c0 + b.b0, 2000000 + cn.c1 + b.b1),
             least(cn.c0 + b.b0, cn.c1 + b.b1)
      FROM bwd b
      JOIN costs c ON c.term = b.term AND c.t = b.t - 1
      JOIN costs cn ON cn.term = b.term AND cn.t = b.t
    )
    SELECT f.term, f.t, c.n,
           CAST(CASE WHEN f.f1 + b.b1 < f.f0 + b.b0
                THEN 1 ELSE 0 END AS INT) AS burst
    FROM fwd f
    JOIN bwd b ON b.term = f.term AND b.t = f.t
    JOIN costs c ON c.term = f.term AND c.t = f.t
    """,
)
def q264_kleinberg_bursts(spark, sf_dir):
    """Kleinberg 2-state burst detection (operators/stats.py
    kleinberg_bursts; KDD 2002) over the events stream bucketed by
    day, with a four-day synthetic 'error' burst injected (days 10-13,
    even user_ids rerouted) so the automaton has a real spike to find
    and every other term sees a matching dip. Binomial state costs
    quantize to integer micros JVM-side from the exact expression the
    oracle states; the Viterbi runs in EXACT integer arithmetic — one
    applyInPandas per term after a single term-key shuffle (W ints
    cross Arrow, never the event stream), mirrored by the oracle's
    recursive-CTE forward/backward DP. Labels = argmin of F+B totals,
    no backtrack plumbing. Counts are two partial-agg groupBys; the
    grid cross join is |terms| x |days|, dim x dim by construction."""
    from .operators.stats import kleinberg_bursts

    ev = _read(spark, sf_dir, "events")
    d = F.datediff(F.col("ts").cast("date"),
                   F.lit("2024-01-01").cast("date"))
    stream = ev.select(
        F.when(d.between(10, 13) & (F.col("user_id") % 2 == 0),
               F.lit("error"))
        .otherwise(F.col("event_type")).alias("term"),
        d.cast("bigint").alias("t"),
    )
    return kleinberg_bursts(stream)


# --- wave: RFC 9309 wildcard robots matching (q265) ---------------------------


@q(
    "q265_google_robots",
    """
    SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN '/private/x'
             WHEN 1 THEN '/private/public'
             WHEN 2 THEN '/a/file.pdf'
             WHEN 3 THEN '/docs/guide'
             WHEN 4 THEN '/docs/tmp/x'
             ELSE '/home' END AS path,
           CAST(CASE doc_id % 6
             WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0
             WHEN 3 THEN 1 WHEN 4 THEN 0 ELSE 1 END AS INT) AS allowed,
           CAST(CASE doc_id % 6
             WHEN 0 THEN 10 WHEN 1 THEN 16 WHEN 2 THEN 7
             WHEN 3 THEN 6 WHEN 4 THEN 9 ELSE 0 END AS BIGINT) AS spec
    FROM documents
    """,
)
def q265_google_robots(spark, sf_dir):
    """RFC 9309 / Google-style robots.txt matching (sources/robots.py
    google_robots_rules + google_robots_verdict): wildcard ``*`` and
    end-anchor ``$`` patterns, BOTH Allow and Disallow lines,
    most-specific (longest) match wins with Allow breaking ties — the
    semantics real crawlers implement and the stdlib RobotFileParser
    (the reference's parser, q49/q58/q69) treats as literal text.
    Rules pre-compile to regexes inside the Arrow parse; the verdict
    is a broadcast join + codegen rlike + one max(struct) partial agg
    — no window, no Python on the url path. Fixture: six path shapes
    per doc against a fixed 6-rule group; the oracle states every
    verdict and winning-rule specificity closed-form (wildcard hit,
    $-anchor exact allow, extension ban, prefix allow, deeper
    disallow override, no-match default)."""
    from .sources.robots import google_robots_rules, google_robots_verdict

    d = _read(spark, sf_dir, "documents")
    robots = d.select(
        "doc_id",
        F.lit(
            "User-agent: *\n"
            "Disallow: /private/*\n"
            "Allow: /private/public$\n"
            "Disallow: /*.pdf$\n"
            "Allow: /docs/\n"
            "Disallow: /docs/tmp\n"
        ).alias("robots_txt"),
    )
    rules = google_robots_rules(robots, user_agent="tribeca")
    urls = d.select(
        "doc_id",
        F.element_at(
            F.array(
                F.lit("/private/x"), F.lit("/private/public"),
                F.lit("/a/file.pdf"), F.lit("/docs/guide"),
                F.lit("/docs/tmp/x"), F.lit("/home"),
            ),
            (F.col("doc_id") % 6 + 1).cast("int"),
        ).alias("path"),
    )
    return google_robots_verdict(urls, rules)


# --- wave: sitemap-index resolution (q266) ------------------------------------


@q(
    "q266_sitemap_index",
    """
    SELECT doc_id, '/p/' || doc_id || '/a' AS url, 'direct' AS via
    FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/b', 'direct' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/c', 'direct' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/a', 'index' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/b', 'index' FROM documents
    UNION ALL
    SELECT doc_id, '/p/' || doc_id || '/c', 'index' FROM documents
    """,
)
def q266_sitemap_index(spark, sf_dir):
    """Sitemap-INDEX resolution (sources/sitemap.py
    resolve_sitemap_tree): the <sitemapindex> tier big sites serve —
    an index at /smi.xml referencing two child urlsets — resolved
    through ONE self equi-join of child <loc>s against the sitemap
    table on its url key (the crawl state store's bucketed key, so the
    hop co-locates at scale); plain urlsets emit via='direct', urls
    reached through the index via='index'. Fixture: per doc an index
    + two urlset bodies (2+1 page urls), so every page url appears
    once per tier and the oracle is a 6-row closed form. Namespace
    prefixes exercised on the index (<sm:loc>)."""
    from .sources.sitemap import resolve_sitemap_tree

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    rows = []
    smi = F.concat(
        F.lit('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
              'sitemap/0.9"><sitemap><sm:loc>https://h'), sid,
        F.lit("/sm1.xml</sm:loc></sitemap><sitemap><sm:loc>https://h"),
        sid, F.lit("/sm2.xml</sm:loc></sitemap></sitemapindex>"),
    )
    sm1 = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("/a</loc></url><url><loc>/p/"), sid,
        F.lit("/b</loc></url></urlset>"),
    )
    sm2 = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("/c</loc></url></urlset>"),
    )
    for url, xml in (
        (F.concat(F.lit("https://h"), sid, F.lit("/smi.xml")), smi),
        (F.concat(F.lit("https://h"), sid, F.lit("/sm1.xml")), sm1),
        (F.concat(F.lit("https://h"), sid, F.lit("/sm2.xml")), sm2),
    ):
        rows.append(d.select(
            "doc_id", url.alias("sitemap_url"), xml.alias("sitemap_xml")
        ))
    sitemaps = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return resolve_sitemap_tree(sitemaps, key_cols=("doc_id",))


# --- wave: head metadata — robots meta / OpenGraph / JSON-LD (q267-q269) ------


def _meta_pages(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    robots_content = F.element_at(
        F.array(F.lit(""), F.lit("noindex"), F.lit("nofollow"),
                F.lit("none")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    # attribute order + quote style vary by parity — both served in the
    # wild, both must parse
    robots_meta = F.when(
        F.col("doc_id") % 4 == 0, F.lit("")
    ).when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit('<meta name="robots" content="'),
                 robots_content, F.lit('">')),
    ).otherwise(
        F.concat(F.lit('<meta content="'), robots_content,
                 F.lit("\" name='robots'>")),
    )
    html = F.concat(
        F.lit("<html><head>"),
        robots_meta,
        F.lit('<meta property="og:title" content="Doc '), sid,
        F.lit('"><meta property="og:type" content="'), F.col("source"),
        F.lit('"><meta name="author" content="crawler">'),
        F.lit('<script type="application/ld+json">'),
        F.lit('{"@type":"Article","name":"Doc '), sid, F.lit('"}'),
        F.lit("</script>"),
        F.lit('<script type="application/ld+json">{oops</script>'),
        F.lit("</head><body>x</body></html>"),
    )
    return d.select("doc_id", html.alias("html"))


@q(
    "q267_robots_meta",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END
                AS INT) AS noindex,
           CAST(CASE WHEN doc_id % 4 IN (2, 3) THEN 1 ELSE 0 END
                AS INT) AS nofollow,
           CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 0 ELSE 1 END
                AS INT) AS indexable
    FROM documents
    """,
)
def q267_robots_meta(spark, sf_dir):
    """Robots-meta directive flags (operators/meta.py
    robots_meta_flags): noindex/nofollow/'none' tokens from
    <meta name=robots> — the page-level half of crawl politeness the
    reference's SEO extractor skips (crawler.py reads only
    meta[name=description]). Attribute ORDER and quote style vary by
    parity in the fixture; 'none' (= noindex,nofollow) exercised;
    absent tag defaults indexable. Entirely JVM regexp + one tiny
    partial-agg groupBy — zero Python, zero corpus shuffle."""
    from .operators.meta import robots_meta_flags

    return robots_meta_flags(_meta_pages(spark, sf_dir))


@q(
    "q268_opengraph",
    """
    SELECT doc_id, 'og:title' AS key, 'Doc ' || doc_id AS content
    FROM documents
    UNION ALL
    SELECT doc_id, 'og:type', source FROM documents
    """,
)
def q268_opengraph(spark, sf_dir):
    """OpenGraph property extraction (operators/meta.py meta_tags —
    the generic name=/property= <meta> relation, filtered to og:*):
    the social-preview surface SEO audits check next to
    title/description. The author name= row proves kind
    discrimination; plan is Scan → regexp explode → Project, no
    shuffle."""
    from .operators.meta import meta_tags

    m = meta_tags(_meta_pages(spark, sf_dir))
    return m.filter(F.col("key").startswith("og:")).select(
        "doc_id", "key", "content"
    )


@q(
    "q269_jsonld",
    """
    SELECT doc_id, CAST(0 AS INT) AS block_idx,
           'Article' AS entity_type, 'Doc ' || doc_id AS entity_name
    FROM documents
    UNION ALL
    SELECT doc_id, 1, NULL, NULL FROM documents
    """,
)
def q269_jsonld(spark, sf_dir):
    """schema.org JSON-LD entity extraction (operators/meta.py
    jsonld_entities): fenced ld+json payloads parsed with JVM
    from_json — valid Article blocks yield (@type, name), the
    deliberately malformed second block yields NULL fields (tolerant
    reader, PERMISSIVE mode) instead of failing the page. Structured
    data is the machine-readable layer modern SEO/KG pipelines
    extract; plan = Scan → regexp posexplode → from_json Project,
    zero Python, zero shuffle."""
    from .operators.meta import jsonld_entities

    return jsonld_entities(_meta_pages(spark, sf_dir))


# --- wave: rel-aware link edges (q270) ----------------------------------------


@q(
    "q270_nofollow_edges",
    """
    SELECT 'https://h' || doc_id || '/page' AS url,
           'https://t.example.org/f/' || doc_id AS target,
           'follow me' AS anchor, CAST(1 AS INT) AS followed
    FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/page',
           'https://t.example.org/n/' || doc_id, 'spam',
           CAST(0 AS INT)
    FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/page',
           'https://t.example.org/s/' || doc_id, 'ad', CAST(0 AS INT)
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def q270_nofollow_edges(spark, sf_dir):
    """rel-aware link-graph edges (operators/linkgraph.py
    rel_anchor_pairs over htmlx/anchors._RelAnchorWalker): nofollow /
    ugc / sponsored (Google's 2019 rel triad) mark an edge
    non-endorsing, the semantics PageRank/TrustRank builders (q83,
    q204) must honor — without it every guestbook-spam link endorses
    its target. ``rel`` is a space-split token LIST per the HTML spec
    ("ugc nofollow" exercised), the sponsored link flips attribute
    order and uses an unquoted value. Same single-parse Arrow regime
    as anchor_pairs; the token check is arrays_overlap codegen after
    the JVM explode."""
    from .operators.linkgraph import rel_anchor_pairs

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><a href="https://t.example.org/f/'), sid,
        F.lit('">follow me</a>'),
        F.lit('<a href="https://t.example.org/n/'), sid,
        F.lit('" rel="ugc nofollow">spam</a>'),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(
                F.lit('<a rel=sponsored href="https://t.example.org/s/'),
                sid, F.lit('">ad</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://h"), sid, F.lit("/page")).alias("url"),
        html.alias("html"),
    )
    return rel_anchor_pairs(pages)


# --- wave: hreflang reciprocity + canonical chains (q271-q272) ----------------


@q(
    "q271_hreflang_audit",
    """
    WITH e AS (
      SELECT 'https://h' || doc_id || '/en' AS url,
             'https://h' || doc_id || '/fr' AS alt_url, 'fr' AS lang,
             1 AS reciprocal
      FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/en',
             'https://h' || doc_id || '/de', 'de', 1 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/fr',
             'https://h' || doc_id || '/en', 'en', 1 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/fr',
             'https://h' || doc_id || '/de', 'de', 0 FROM documents
      UNION ALL
      SELECT 'https://h' || doc_id || '/de',
             'https://h' || doc_id || '/en', 'en', 1 FROM documents
    )
    SELECT url, alt_url, lang, CAST(reciprocal AS INT) AS reciprocal
    FROM e
    """,
)
def q271_hreflang_audit(spark, sf_dir):
    """hreflang return-tag audit (operators/meta.py
    hreflang_reciprocity) — international SEO's classic check: if A
    lists B as an alternate, B must list A back or engines ignore the
    pair. Fixture: per doc a 3-language cluster where de omits its
    return tag to fr, so exactly one of five edges per cluster is
    non-reciprocal. Plan: codegen <link> extraction → ONE self
    equi-join on the reversed (url, alt_url) key (q145's
    symmetric-edge shape), url-keyed so it co-locates with a bucketed
    page store."""
    from .operators.meta import hreflang_reciprocity

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")

    def alt(lang, path):
        return F.concat(
            F.lit('<link rel="alternate" hreflang="' + lang
                  + '" href="https://h'), sid, F.lit(path + '">'),
        )

    def page(path, *alts):
        html = F.concat(
            F.lit("<html><head>"), *alts, F.lit("</head></html>")
        )
        return d.select(
            F.concat(F.lit("https://h"), sid, F.lit(path)).alias("url"),
            html.alias("html"),
        )

    pages = (
        page("/en", alt("fr", "/fr"), alt("de", "/de"))
        .unionByName(page("/fr", alt("en", "/en"), alt("de", "/de")))
        .unionByName(page("/de", alt("en", "/en")))
    )
    return hreflang_reciprocity(pages)


@q(
    "q272_canonical_chains",
    """
    SELECT 'https://h' || doc_id || '/main' AS url,
           'https://h' || doc_id || '/main' AS canonical,
           CAST(0 AS INT) AS hops
    FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/dup1',
           'https://h' || doc_id || '/main', 1 FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/dup2',
           'https://h' || doc_id || '/main', 2 FROM documents
    UNION ALL
    SELECT 'https://h' || doc_id || '/ext',
           'https://other.example.org/x', 1 FROM documents
    """,
)
def q272_canonical_chains(spark, sf_dir):
    """rel=canonical chain resolution (operators/meta.py
    canonical_resolve): pointer jumping — 2 doubling rounds resolve
    chains up to 4 links, the q50 connected-components trick, never a
    per-link loop. hops > 1 is the misconfiguration SEO audits flag
    (engines may ignore multi-hop canonicals); the flattened target is
    what a canonical-dedup pass (q148) keys on. Fixture per doc:
    self-canonical main, a 1-hop dup, a 2-hop chain, and an
    off-corpus canonical that resolves to the external url in one
    hop."""
    from .operators.meta import canonical_resolve

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")

    def page(path, canon):
        html = F.concat(
            F.lit("<html><head>"),
            F.when(
                F.lit(canon is not None),
                F.concat(F.lit('<link rel="canonical" href="'),
                         canon if canon is not None else F.lit(""),
                         F.lit('">')),
            ).otherwise(F.lit("")),
            F.lit("</head></html>"),
        )
        return d.select(
            F.concat(F.lit("https://h"), sid, F.lit(path)).alias("url"),
            html.alias("html"),
        )

    h = F.concat(F.lit("https://h"), sid)
    pages = (
        page("/main", None)
        .unionByName(page("/dup1", F.concat(h, F.lit("/main"))))
        .unionByName(page("/dup2", F.concat(h, F.lit("/dup1"))))
        .unionByName(page("/ext", F.lit("https://other.example.org/x")))
    )
    return canonical_resolve(pages, max_hops=2)


# --- wave: responsive images + mixed content (q273-q274) ----------------------


@q(
    "q273_image_sources",
    """
    SELECT doc_id, CAST(0 AS INT) AS img_idx,
           'https://img.example.org/plain-' || doc_id || '.jpg' AS src,
           'https://img.example.org/plain-' || doc_id || '.jpg'
             AS effective_src,
           CAST(0 AS INT) AS n_variants,
           CAST(NULL AS VARCHAR) AS widest_src
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'data:image/gif;base64,x',
           'https://img.example.org/real-' || doc_id || '.jpg', 2,
           'https://img.example.org/b-' || doc_id || '.jpg'
    FROM documents
    """,
)
def q273_image_sources(spark, sf_dir):
    """Modern image-source inventory (operators/meta.py
    image_sources): lazy-load data-src overriding a data: placeholder
    and responsive srcset width-descriptor parsing with widest-variant
    selection — the reference's src/alt-only inventory
    (crawler.py:86-89) misses every lazy-loaded image on a modern
    page. All codegen (void-element regexp, srcset microsyntax via
    transform + array_max(struct)), zero Python, zero shuffle; oracle
    states both img shapes closed-form."""
    from .operators.meta import image_sources

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><body><img src="https://img.example.org/plain-'),
        sid, F.lit('.jpg" alt="a">'),
        F.lit('<img src="data:image/gif;base64,x" data-src='
              '"https://img.example.org/real-'), sid,
        F.lit('.jpg" srcset="https://img.example.org/s-'), sid,
        F.lit('.jpg 480w, https://img.example.org/b-'), sid,
        F.lit('.jpg 1024w"></body></html>'),
    )
    return image_sources(d.select("doc_id", html.alias("html")))


@q(
    "q274_mixed_content",
    """
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
             || '://h' || doc_id || '/page' AS url,
           CAST(3 AS BIGINT) AS n_resources,
           CAST(2 AS BIGINT) AS n_insecure,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
             AS mixed
    FROM documents
    """,
)
def q274_mixed_content(spark, sf_dir):
    """Mixed-content audit (operators/meta.py mixed_content_audit):
    http:// resources on an https:// page — browser-blocked and
    audit-flagged. Resources = effective img sources (lazy-load
    aware) + srcset widest variants + <link href>s; per-page counts
    via one partial-agg groupBy, page scheme gating the verdict.
    Fixture: every page loads 2 insecure of 3 resources; only the
    https pages (even ids) flag mixed."""
    from .operators.meta import mixed_content_audit

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("https")) \
        .otherwise(F.lit("http"))
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" '
              'href="http://cdn.example.org/s.css"></head><body>'),
        F.lit('<img src="http://cdn.example.org/x-'), sid,
        F.lit('.png"><img src="https://cdn.example.org/y-'), sid,
        F.lit('.png"></body></html>'),
    )
    pages = d.select(
        F.concat(scheme, F.lit("://h"), sid, F.lit("/page"))
        .alias("url"),
        html.alias("html"),
    )
    return mixed_content_audit(pages)


# --- wave: feed enclosures + OPML subscriptions (q275-q276) -------------------


@q(
    "q275_feed_enclosures",
    """
    SELECT doc_id,
           'https://cdn.example.org/ep' || doc_id || '.mp3'
             AS enclosure_url,
           'audio/mpeg' AS mime,
           CAST(1000 + doc_id AS BIGINT) AS n_bytes
    FROM documents
    UNION ALL
    SELECT doc_id, 'https://cdn.example.org/clip' || doc_id || '.mp4',
           'video/mp4', CAST(-1 AS BIGINT)
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q275_feed_enclosures(spark, sf_dir):
    """RSS enclosure extraction (sources/feeds.py feed_enclosures):
    the podcast/video attachment relation a multimodal ingest reads to
    build its fetch list (composes with q29/q53's header sniffers
    downstream). Junk length attributes try_cast to -1 instead of
    failing ANSI; every-3rd doc adds a self-closing video enclosure
    with an EMPTY length and flipped attr order. Codegen end to end,
    zero shuffle."""
    from .sources.feeds import feed_enclosures

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<rss><channel><item><enclosure url='
              '"https://cdn.example.org/ep'), sid,
        F.lit('.mp3" length="'), (F.col("doc_id") + 1000).cast("string"),
        F.lit('" type="audio/MPEG"></item>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<item><enclosure type="video/mp4" length="" '
                      'url="https://cdn.example.org/clip'), sid,
                F.lit('.mp4"/></item>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</channel></rss>"),
    )
    return feed_enclosures(
        d.select("doc_id", xml.alias("feed_xml")),
        keep_cols=("doc_id",),
    )


@q(
    "q276_opml_feeds",
    """
    SELECT doc_id,
           'https://h' || doc_id || '/feed.xml' AS feed_url,
           'https://h' || doc_id || '/' AS site_url,
           'Blog ' || doc_id AS title
    FROM documents
    """,
)
def q276_opml_feeds(spark, sf_dir):
    """OPML subscription-list source (sources/feeds.py opml_feeds):
    the export format feed readers interchange — folder outlines
    (no xmlUrl) are structural and dropped, subscription outlines
    yield the feed-url dimension feed_entries (q244) consumes, so
    OPML → feeds → entries → frontier composes as three codegen
    stages. Fixture: one folder + one subscription per doc."""
    from .sources.feeds import opml_feeds

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit('<opml><body><outline text="Folder"><outline '
              'text="Blog '), sid,
        F.lit('" xmlUrl="https://h'), sid,
        F.lit('/feed.xml" htmlUrl="https://h'), sid,
        F.lit('/"/></outline></body></opml>'),
    )
    return opml_feeds(
        d.select("doc_id", xml.alias("opml_xml")),
        keep_cols=("doc_id",),
    )


# --- wave: inline data-URI image fingerprinting (q277) ------------------------

_B64_STRIPES = (
    "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAAAAAA6mKC9AAABG0lEQVR4AQEQAe/+AAD/"
    "AP8A/wD/AP8A/wD/AP8AAP8A/wD/AP8A/wD/AP8A/wAA/wD/AP8A/wD/AP8A/wD/AAD/"
    "AP8A/wD/AP8A/wD/AP8AAP8A/wD/AP8A/wD/AP8A/wAA/wD/AP8A/wD/AP8A/wD/AAD/"
    "AP8A/wD/AP8A/wD/AP8AAP8A/wD/AP8A/wD/AP8A/wAA/wD/AP8A/wD/AP8A/wD/AAD/"
    "AP8A/wD/AP8A/wD/AP8AAP8A/wD/AP8A/wD/AP8A/wAA/wD/AP8A/wD/AP8A/wD/AAD/"
    "AP8A/wD/AP8A/wD/AP8AAP8A/wD/AP8A/wD/AP8A/wAA/wD/AP8A/wD/AP8A/wD/AAD/"
    "AP8A/wD/AP8A/wD/AP+BPX+BMu2MqQAAAABJRU5ErkJggg=="
)
_B64_HALF = (
    "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAAAAAA6mKC9AAABG0lEQVR4AQEQAe/+AAAA"
    "AAAAAAAA//////////8AAAAAAAAAAAD//////////wAAAAAAAAAAAP//////////AAAA"
    "AAAAAAAA//////////8AAAAAAAAAAAD//////////wAAAAAAAAAAAP//////////AAAA"
    "AAAAAAAA//////////8AAAAAAAAAAAD//////////wAAAAAAAAAAAP//////////AAAA"
    "AAAAAAAA//////////8AAAAAAAAAAAD//////////wAAAAAAAAAAAP//////////AAAA"
    "AAAAAAAA//////////8AAAAAAAAAAAD//////////wAAAAAAAAAAAP//////////AAAA"
    "AAAAAAAA///////////C33+B+hcjGgAAAABJRU5ErkJggg=="
)


@q(
    "q277_inline_image_dhash",
    """
    SELECT doc_id, CAST(0 AS INT) AS img_idx, 'image/png' AS mime,
           CASE WHEN doc_id % 2 = 0 THEN '0808080808080808'
                ELSE '0000000000000000' END AS dhash64
    FROM documents
    """,
)
def q277_inline_image_dhash(spark, sf_dir):
    """Inline data:-URI image fingerprinting (operators/multimodal.py
    inline_image_dhash): the extraction→decode→fingerprint seam wired
    end to end — image_sources finds the data: URI, unbase64 decodes
    it IN CODEGEN (bytes never round-trip through Python strings), and
    the real PNG decoder + dHash (q105's path) fingerprints it. Even
    docs embed a 16x16 vertical-stripe PNG (dhash 0808...), odd docs a
    half-split PNG (dhash 0000...) — both hashes are authoring-time
    constants of REAL decodes, and a trailing url-src img proves the
    data: filter. Template-stamped inline imagery (tracking pixels,
    spacer GIFs) dedups through q107's banding without fetching a
    single asset."""
    from .operators.multimodal import inline_image_dhash

    d = _read(spark, sf_dir, "documents")
    b64 = F.when(F.col("doc_id") % 2 == 0, F.lit(_B64_STRIPES)) \
        .otherwise(F.lit(_B64_HALF))
    html = F.concat(
        F.lit('<html><body><img src="data:image/png;base64,'), b64,
        F.lit('"><img src="https://cdn.example.org/u.png">'
              "</body></html>"),
    )
    return inline_image_dhash(d.select("doc_id", html.alias("html")))


# --- wave: corpus governance — licenses + AI opt-out (q278-q279) --------------


@q(
    "q278_license_signals",
    """
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN 'cc-by-4.0'
             WHEN 1 THEN 'cc-by-nc-sa-3.0'
             ELSE 'cc-zero-1.0' END AS license,
           'link' AS via
    FROM documents WHERE doc_id % 4 IN (0, 1, 2)
    UNION ALL
    SELECT doc_id, 'MIT', 'spdx' FROM documents WHERE doc_id % 4 = 3
    UNION ALL
    SELECT doc_id, 'cc-by-4.0', 'link'
    FROM documents WHERE doc_id % 4 = 3
    """,
)
def q278_license_signals(spark, sf_dir):
    """License-signal detection (operators/governance.py
    license_signals): canonical Creative-Commons deed URLs (incl. the
    CC0 publicdomain/zero path) from ANY href plus
    SPDX-License-Identifier markers in page source — the
    machine-readable license layer responsibly-built corpora filter
    on. Fixture: per doc one of cc-by / cc-by-nc-sa / cc0 via link;
    every 4th doc declares MIT via SPDX AND a cc-by link (multi-signal
    page), with a duplicate link proving the dedup. Codegen regexp
    end to end."""
    from .operators.governance import license_signals

    d = _read(spark, sf_dir, "documents")
    cc_href = F.element_at(
        F.array(
            F.lit("https://creativecommons.org/licenses/by/4.0/"),
            F.lit("https://creativecommons.org/licenses/by-nc-sa/3.0/"),
            F.lit("https://creativecommons.org/publicdomain/zero/1.0/"),
            F.lit("https://creativecommons.org/licenses/by/4.0/"),
        ),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    html = F.concat(
        F.lit('<html><body><a rel="license" href="'), cc_href,
        F.lit('">license</a><a href="'), cc_href,
        F.lit('">again</a>'),
        F.when(
            F.col("doc_id") % 4 == 3,
            F.lit("<pre>SPDX-License-Identifier: MIT</pre>"),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return license_signals(d.select("doc_id", html.alias("html")))


@q(
    "q279_ai_optout",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS INT)
             AS noai,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS INT)
             AS noimageai,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS INT)
             AS tdm_reserved
    FROM documents
    """,
)
def q279_ai_optout(spark, sf_dir):
    """AI-use reservation audit (operators/governance.py
    ai_optout_flags): the noai/noimageai robots-meta tokens and the
    W3C TDM-Reservation-Protocol meta — the consent layer an ethical
    training-data pipeline must read BEFORE ingesting a page; a
    corpus filter is one predicate over this relation. Fixture:
    doc%3==1 serves 'noai, noimageai' (comma-list parsing), doc%3==2
    a tdm-reservation=1 meta, doc%3==0 neither (defaults 0)."""
    from .operators.governance import ai_optout_flags

    d = _read(spark, sf_dir, "documents")
    meta = F.when(
        F.col("doc_id") % 3 == 1,
        F.lit('<meta name="robots" content="noai, noimageai">'),
    ).when(
        F.col("doc_id") % 3 == 2,
        F.lit('<meta name="tdm-reservation" content="1">'),
    ).otherwise(F.lit('<meta name="robots" content="index">'))
    html = F.concat(
        F.lit("<html><head>"), meta, F.lit("</head><body>x</body></html>")
    )
    return ai_optout_flags(d.select("doc_id", html.alias("html")))


# --- wave: URL-parameter significance mining (q280) ---------------------------


@q(
    "q280_param_significance",
    """
    WITH hosts AS (
      SELECT DISTINCT 'h' || (doc_id % 50) AS host FROM documents
    )
    SELECT host, 'page' AS param, CAST(2 AS BIGINT) AS n_groups,
           CAST(0 AS BIGINT) AS n_neutral_groups,
           CAST(0 AS INT) AS neutral
    FROM hosts
    UNION ALL
    SELECT host, 'utm', 2, 2, 1 FROM hosts
    """,
)
def q280_param_significance(spark, sf_dir):
    """URL-parameter significance mining (functions/urlnorm.py
    param_significance): LEARN per-host content-neutral query
    parameters by comparing content hashes across URLs differing only
    in one parameter — the data-driven upgrade over q80's fixed
    utm-blocklist, and the discovered strip-list q41/q148's
    canonicalizers feed on. Fixture: every host serves the page/utm
    cross product where the hash depends only on 'page', so 'utm'
    proves neutral (2/2 groups) and 'page' proves significant (0/2).
    Codegen parsing, two partial-agg groupBys on host-prefixed keys,
    no window."""
    from .functions.urlnorm import param_significance

    d = _read(spark, sf_dir, "documents")
    hid = (F.col("doc_id") % 50).cast("string")
    combos = F.array(
        *[
            F.struct(F.lit(p).alias("pg"), F.lit(u).alias("ut"))
            for p, u in ((1, "a"), (1, "b"), (2, "a"), (2, "b"))
        ]
    )
    rows = d.select(hid.alias("_hid"), F.explode(combos).alias("_c"))
    pages = rows.select(
        F.concat(
            F.lit("https://h"), F.col("_hid"), F.lit("/p?page="),
            F.col("_c.pg").cast("string"), F.lit("&utm="),
            F.col("_c.ut"),
        ).alias("url"),
        F.md5(
            F.concat(F.lit("h"), F.col("_hid"), F.lit("-"),
                     F.col("_c.pg").cast("string"))
        ).alias("content_hash"),
    )
    return param_significance(pages)


# --- wave: IDN homograph audit (q281) -----------------------------------------


@q(
    "q281_host_script_audit",
    """
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'https://example' || doc_id || '.com/p'
               WHEN 1 THEN 'https://exаmple' || doc_id || '.com/p'
               ELSE 'https://xn--80ak6aa92e.com/p' || doc_id END AS url,
             CASE doc_id % 3
               WHEN 0 THEN 'example' || doc_id || '.com'
               WHEN 1 THEN 'exаmple' || doc_id || '.com'
               ELSE 'xn--80ak6aa92e.com' END AS host
      FROM documents
    )
    SELECT url, host,
           CAST(1 AS INT) AS has_latin,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS INT)
             AS has_cyrillic,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS INT)
             AS punycode,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS INT)
             AS suspicious
    FROM u
    """,
)
def q281_host_script_audit(spark, sf_dir):
    """IDN-homograph hostname audit (functions/urlnorm.py
    host_script_audit): mixed Latin+Cyrillic hosts (the classic
    exаmple.com spoof) and raw punycode labels flagged before a
    frontier trusts them — crawler-trap and phishing hygiene for the
    url universe. Pure codegen rlike Project; fixture covers clean /
    homograph / punycode thirds closed-form."""
    from .functions.urlnorm import host_script_audit

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.element_at(
        F.array(
            F.concat(F.lit("https://example"), sid, F.lit(".com/p")),
            F.concat(F.lit("https://exаmple"), sid,
                     F.lit(".com/p")),
            F.concat(F.lit("https://xn--80ak6aa92e.com/p"), sid),
        ),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return host_script_audit(d.select(url.alias("url")))


# --- wave: web-table column profiling (q282) ----------------------------------


@q(
    "q282_table_profile_cols",
    """
    WITH cols AS (
      SELECT * FROM (VALUES
        (0, 'name', 'string'), (1, 'qty', 'int'),
        (2, 'price', 'float'), (3, 'when', 'date')
      ) AS t(col_idx, header, col_type)
    )
    SELECT doc_id, CAST(0 AS INT) AS table_idx,
           CAST(col_idx AS INT) AS col_idx, header, col_type,
           CAST(3 AS BIGINT) AS n_values
    FROM documents CROSS JOIN cols
    """,
)
def q282_table_profile_cols(spark, sf_dir):
    """WebTables-style column profiling (operators/tables.py
    table_column_profile; Cafarella VLDB'08): per extracted table
    column, the header label and MAJORITY value type — the attribute
    statistics that make a web-table corpus queryable (and the schema
    a table-QA training set needs). Fixture: a 4-column table per
    page whose columns type cleanly as string/int/float/date over 3
    data rows (with one dissenting string cell in the int column —
    majority must still say int). Typing is rlike codegen; majority =
    max(struct) partial agg, lexicographic tie-break documented."""
    from .operators.tables import table_column_profile, table_rows

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><table>"
              "<tr><th>name</th><th>qty</th><th>price</th>"
              "<th>when</th></tr>"),
        F.lit("<tr><td>a"), sid, F.lit("</td><td>"), sid,
        F.lit("</td><td>1.25</td><td>2024-01-02</td></tr>"),
        F.lit("<tr><td>b</td><td>7</td><td>"), sid,
        F.lit(".5</td><td>2024-02-03</td></tr>"),
        F.lit("<tr><td>c</td><td>n/a</td><td>2.5</td>"
              "<td>2024-03-04</td></tr>"),
        F.lit("</table></body></html>"),
    )
    pages = d.select(
        "doc_id", F.encode(html, "UTF-8").alias("html")
    )
    return table_column_profile(table_rows(pages))


# --- wave: HTTP cache-policy TTL (q283) ---------------------------------------


@q(
    "q283_cache_policy",
    """
    WITH base AS (
      SELECT doc_id, 1704067200 + doc_id AS fts,
             CASE doc_id % 5
               WHEN 0 THEN 3600 WHEN 1 THEN 0 WHEN 2 THEN 600
               WHEN 3 THEN 120 ELSE 86400 END AS ttl,
             CASE WHEN doc_id % 5 IN (0, 1) THEN 1 ELSE 0 END AS hv
      FROM documents
    )
    SELECT 'https://h' || doc_id || '/p' AS url,
           CAST(ttl AS BIGINT) AS ttl_s,
           CAST(fts + ttl AS BIGINT) AS recrawl_after,
           CAST(hv AS INT) AS has_validator
    FROM base
    """,
)
def q283_cache_policy(spark, sf_dir):
    """HTTP cache-policy TTL for recrawl scheduling (plans/frontier.py
    cache_policy; RFC 9111 precedence): no-store/no-cache/max-age=0
    beat s-maxage beat max-age beat Expires beat the crawler default —
    the server-declared freshness signal q95's recrawl model should
    trust first, with ETag/Last-Modified flagged for cheap 304
    revalidation. Fixture covers all five precedence shapes (incl.
    s-maxage overriding max-age in one header). Pure codegen Project
    on the fetch log."""
    from .plans.frontier import cache_policy

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    cc = F.element_at(
        F.array(F.lit("max-age=3600"), F.lit("no-store"),
                F.lit("s-maxage=600, max-age=60"), F.lit(""),
                F.lit("")),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    headers = d.select(
        F.concat(F.lit("https://h"), sid, F.lit("/p")).alias("url"),
        (F.lit(1704067200) + F.col("doc_id")).cast("long")
        .alias("fetch_ts"),
        cc.alias("cache_control"),
        F.when(F.col("doc_id") % 5 == 3, F.lit(120))
        .otherwise(F.lit(None)).cast("bigint").alias("expires_delta_s"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit('W/"x'), sid, F.lit('"')))
        .otherwise(F.lit("")).alias("etag"),
        F.when(F.col("doc_id") % 5 == 1,
               F.lit("Mon, 01 Jan 2024 00:00:00 GMT"))
        .otherwise(F.lit("")).alias("last_modified"),
    )
    return cache_policy(headers)


# --- wave: crawl traps + PII pseudonyms (q284-q285) ---------------------------


@q(
    "q284_crawl_traps",
    """
    WITH hosts AS (
      SELECT 'h' || (doc_id % 25) AS host,
             CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    )
    SELECT host, '/cal/N' AS template, n AS n_urls,
           CAST(1 AS BIGINT) AS n_hashes,
           CAST(CASE WHEN n >= 8 AND n >= 10 THEN 1 ELSE 0 END AS INT)
             AS trap
    FROM hosts
    UNION ALL
    SELECT host, '/art/N', n, n,
           CAST(CASE WHEN n >= 8 AND n >= 10 * n THEN 1 ELSE 0 END
                AS INT)
    FROM hosts
    """,
)
def q284_crawl_traps(spark, sf_dir):
    """Crawl-trap detection (functions/urlnorm.py crawl_trap_score):
    URL templates that fan out into many URLs with barely any
    distinct content — infinite calendars, session paginators. The
    frontier anti-joins candidates against trap templates BEFORE
    fetching (the only way to win against a trap). Fixture: every
    host serves a /cal/N template whose pages all hash identically
    (trap) and an /art/N template with unique content (healthy); the
    oracle states the verdict as the same n_urls/n_hashes FORMULA so
    it holds at every SF."""
    from .functions.urlnorm import crawl_trap_score

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    hid = (F.col("doc_id") % 25).cast("string")
    pages = d.select(
        F.concat(F.lit("https://h"), hid, F.lit("/cal/"), sid)
        .alias("url"),
        F.md5(F.concat(F.lit("trap-"), hid)).alias("content_hash"),
    ).unionByName(d.select(
        F.concat(F.lit("https://h"), hid, F.lit("/art/"), sid)
        .alias("url"),
        F.md5(F.concat(F.lit("art-"), sid)).alias("content_hash"),
    ))
    return crawl_trap_score(pages)


@q(
    "q285_pii_pseudonyms",
    """
    SELECT doc_id, 'email' AS kind,
           sha256('s3cr3t' || 'u' || (doc_id % 20) || '@x.com')
             AS pseudonym
    FROM documents
    UNION ALL
    SELECT doc_id, 'email',
           sha256('s3cr3t' || 'd' || doc_id || '@y.org')
    FROM documents
    """,
)
def q285_pii_pseudonyms(spark, sf_dir):
    """Keyed PII pseudonymization (operators/redact.py
    pii_pseudonyms): detected emails become stable salted sha-256
    pseudonyms — the SAME address pseudonymizes identically
    corpus-wide (user-level joins/dedup still work) while the raw
    identifier never leaves the projection, and rotating the salt is
    the GDPR-style re-identification kill-switch. q71's redaction
    drops the linkage; this relation carries it. Fixture: one shared
    address per user-bucket (20 users) plus one unique per doc; the
    oracle recomputes both hashes with DuckDB's sha256."""
    from .operators.redact import pii_pseudonyms

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    text = F.concat(
        F.lit("contact u"), (F.col("doc_id") % 20).cast("string"),
        F.lit("@x.com and d"), sid, F.lit("@y.org today"),
    )
    return pii_pseudonyms(
        d.select("doc_id", text.alias("text")), salt="s3cr3t"
    )


# --- wave: contrastive triplets (q286) ----------------------------------------


@q(
    "q286_contrastive_triplets",
    """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
    toks AS (
      SELECT doc_id, list_filter(
               string_split(lower(trim(regexp_replace(
                 text, '[^A-Za-zÀ-ÿ]+', ' ', 'g'))), ' '),
               w -> length(w) > 0) AS l
      FROM documents
    ),
    el AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) >= 2),
    h AS (
      SELECT doc_id,
             array_to_string(l[1:(n // 2)], ' ') AS anchor,
             array_to_string(l[(n // 2 + 1):n], ' ') AS positive
      FROM el
    )
    SELECT a.doc_id, a.anchor, a.positive,
           CAST((a.doc_id + nn.N // 2) % nn.N AS BIGINT) AS neg_id,
           b.anchor AS negative
    FROM h a CROSS JOIN nn
    JOIN h b ON b.doc_id = (a.doc_id + nn.N // 2) % nn.N
    """,
)
def q286_contrastive_triplets(spark, sf_dir):
    """Deterministic contrastive-triplet mining (operators/chunking.py
    contrastive_triplets; the DPR/SimCSE training-data shape): anchor
    and positive are the two halves of one document, the negative is
    the anchor of the document N/2 away — no RNG, so the mined set is
    reproducible and hash-oracle-able; swap the arithmetic negative
    for q114's BM25 top-k to get hard negatives with the same
    relation shape. Halves are slice/array_join codegen; the negative
    lookup is one id-keyed equi-join."""
    from .operators.chunking import contrastive_triplets

    d = _read(spark, sf_dir, "documents")
    return contrastive_triplets(d)


# --- wave: k-anonymity release table (q287) -----------------------------------


@q(
    "q287_k_anonymity",
    """
    WITH d AS (
      SELECT CASE
               WHEN doc_id % 10 < 8 THEN 'big' || (doc_id % 4) || '.com'
               WHEN doc_id % 500 = 7 THEN 'solo' || doc_id || '.qq'
               ELSE 'r' || doc_id || '.net' END AS host
      FROM documents
    ),
    hc AS (SELECT host, CAST(count(*) AS BIGINT) AS n
           FROM d GROUP BY 1),
    rel AS (SELECT host AS release_key, 'host' AS level, n AS n_docs
            FROM hc WHERE n >= 5),
    sup AS (SELECT regexp_extract(host, '\\.([a-z]+)$', 1) AS tld, n
            FROM hc WHERE n < 5),
    tc AS (SELECT tld, CAST(sum(n) AS BIGINT) AS n
           FROM sup GROUP BY 1),
    rel2 AS (SELECT tld AS release_key, 'tld' AS level, n AS n_docs
             FROM tc WHERE n >= 5),
    rest AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_docs
             FROM tc WHERE n < 5)
    SELECT * FROM rel
    UNION ALL SELECT * FROM rel2
    UNION ALL SELECT '*', 'any', n_docs FROM rest WHERE n_docs > 0
    """,
)
def q287_k_anonymity(spark, sf_dir):
    """k-anonymity for released crawl metadata (operators/
    governance.py k_anonymize_hosts): publishing raw per-host counts
    leaks k=1 facts, so small hosts suppress into their TLD and
    still-small TLD pools collapse into one '*' residual — every
    published row aggregates >= k docs. Fixture: four big .com hosts
    (host-level), singleton .net hosts (pool to tld-level), and one
    .qq singleton whose pool stays below k — the '*' row — at the
    gate SF. The oracle restates the ALGORITHM, not constants, so
    verdicts track every SF."""
    from .operators.governance import k_anonymize_hosts

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    host = F.when(
        F.col("doc_id") % 10 < 8,
        F.concat(F.lit("big"), (F.col("doc_id") % 4).cast("string"),
                 F.lit(".com")),
    ).when(
        F.col("doc_id") % 500 == 7,
        F.concat(F.lit("solo"), sid, F.lit(".qq")),
    ).otherwise(F.concat(F.lit("r"), sid, F.lit(".net")))
    return k_anonymize_hosts(d.select(host.alias("host")), k=5)


# --- wave: sitemap freshness metadata (q288) ----------------------------------


@q(
    "q288_sitemap_meta",
    """
    SELECT doc_id, '/p/' || doc_id AS url,
           '2024-01-' || CASE WHEN doc_id % 28 + 1 < 10 THEN '0' ELSE ''
             END || (doc_id % 28 + 1) AS lastmod,
           CAST(CASE WHEN doc_id % 2 = 0
                THEN (doc_id % 10) * 100000 ELSE -1 END AS BIGINT)
             AS priority_micros,
           CASE WHEN doc_id % 3 = 0 THEN 'daily' ELSE '' END
             AS changefreq
    FROM documents
    UNION ALL
    SELECT doc_id, '/q/' || doc_id, '', CAST(-1 AS BIGINT), ''
    FROM documents
    """,
)
def q288_sitemap_meta(spark, sf_dir):
    """Sitemap freshness metadata (sources/sitemap.py
    sitemap_url_meta): lastmod / priority / changefreq per <url>
    block — the publisher-declared change signals a recrawl scheduler
    reads before spending a single fetch (lastmod vs state-table
    last-crawl is the cheapest change detector there is; priority /
    changefreq are priors for q95). Blocks isolate first so missing
    fields can't steal a neighbor's; junk priorities try_cast to -1;
    a bare-loc second entry proves the defaults. Codegen end to
    end."""
    from .sources.sitemap import sitemap_url_meta

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    day = (F.col("doc_id") % 28 + 1).cast("string")
    day2 = F.lpad(day, 2, "0")
    xml = F.concat(
        F.lit("<urlset><url><loc>/p/"), sid,
        F.lit("</loc><lastmod>2024-01-"), day2, F.lit("</lastmod>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("<priority>0."),
                     (F.col("doc_id") % 10).cast("string"),
                     F.lit("</priority>")),
        ).otherwise(F.lit("<priority>junk</priority>")),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("<changefreq>DAILY</changefreq>"))
        .otherwise(F.lit("")),
        F.lit("</url><url><loc>/q/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    return sitemap_url_meta(
        d.select("doc_id", xml.alias("sitemap_xml")),
        keep_cols=("doc_id",),
    )


# --- wave: WARC response metadata (q289) --------------------------------------


@q(
    "q289_warc_meta",
    """
    SELECT doc_id, 'https://w/ok/' || doc_id AS url,
           CAST(200 AS INT) AS status, 'text/html' AS content_type,
           CAST(7 + (doc_id % 7) AS BIGINT) AS n_bytes
    FROM documents
    UNION ALL
    SELECT doc_id, 'https://w/gone/' || doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 404 ELSE 503 END AS INT),
           'text/html', CAST(4 AS BIGINT)
    FROM documents
    """,
)
def q289_warc_meta(spark, sf_dir):
    """WARC response-metadata relation (sources/warc.py parse_warc
    status/content-type/size fields + read_warc_meta): the fetch-log
    view crawl health ops consume WITHOUT shipping payload bytes —
    status-code health per host, soft-404 candidates (q191),
    content-type routing to the right extractor, size anomalies.
    Fixture: per doc a 200 page with id-varying payload length plus a
    404/503 error record; the engine's real WARC parser (header walk,
    HTTP status line, Content-Type split) recovers every field the
    oracle states closed-form."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField,
        StructType,
    )

    from .sources.warc import make_warc, parse_warc

    rec_t = ArrayType(StructType([
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
    ]))

    @pandas_udf(rec_t)
    def _meta(doc_id):
        out = []
        for i in doc_id:
            i = int(i)
            blob = make_warc([
                (f"https://w/ok/{i}", f"<p>{'x' * (i % 7)}</p>",
                 "utf-8"),
                (f"https://w/gone/{i}", "gone", "utf-8",
                 404 if i % 2 == 0 else 503),
            ])
            out.append([
                (r["url"], r["status"], r["content_type"], r["n_bytes"])
                for r in parse_warc(blob)
            ])
        return pd.Series(out)

    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(_meta(F.col("doc_id"))).alias("_r")
    ).select(
        "doc_id",
        F.col("_r.url").alias("url"),
        F.col("_r.status").alias("status"),
        F.col("_r.content_type").alias("content_type"),
        F.col("_r.n_bytes").alias("n_bytes"),
    )


# --- wave: base-href-aware link resolution (q290) -----------------------------


@q(
    "q290_base_href_links",
    """
    SELECT 'https://cdn.example.net/t/' || doc_id || '/page' AS url,
           CASE WHEN doc_id % 2 = 0
                THEN 'https://real' || doc_id || '.com/dir/'
                ELSE 'https://cdn.example.net/t/' || doc_id || '/page'
             END AS base,
           CASE WHEN doc_id % 2 = 0
                THEN 'https://real' || doc_id || '.com/about'
                ELSE 'https://cdn.example.net/about' END AS target,
           'about' AS anchor
    FROM documents
    UNION ALL
    SELECT 'https://cdn.example.net/t/' || doc_id || '/page',
           CASE WHEN doc_id % 2 = 0
                THEN 'https://real' || doc_id || '.com/dir/'
                ELSE 'https://cdn.example.net/t/' || doc_id || '/page'
             END,
           'https://ext.example.org/x', 'ext'
    FROM documents
    """,
)
def q290_base_href_links(spark, sf_dir):
    """<base href>-aware link resolution (operators/linkgraph.py
    anchor_pairs_base_aware): when a page declares a base element,
    relative hrefs resolve against IT, not the page url — the HTML
    rule templated/CDN-hosted sites rely on; ignoring it silently
    corrupts the link graph for every such page. Fixture: even docs
    declare an off-host base so their root-relative '/about' must
    land on the base host; odd docs have no base and resolve against
    the page; an absolute external link must be unaffected either
    way. Base extraction is one codegen regexp; plan stays the
    single-parse zero-shuffle anchor shape."""
    from .operators.linkgraph import anchor_pairs_base_aware

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<base href="https://real'), sid,
                     F.lit('.com/dir/">')),
        ).otherwise(F.lit("")),
        F.lit('</head><body><a href="/about">about</a>'
              '<a href="https://ext.example.org/x">ext</a>'
              "</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://cdn.example.net/t/"), sid,
                 F.lit("/page")).alias("url"),
        html.alias("html"),
    )
    return anchor_pairs_base_aware(pages)


# --- wave: client redirects + SEO health (q291-q292) --------------------------


@q(
    "q291_client_redirects",
    """
    SELECT doc_id, 'meta' AS kind,
           CAST(doc_id % 5 AS INT) AS delay_s,
           'https://t' || doc_id || '.com/new' AS target
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'js', CAST(0 AS INT),
           '/spa/' || doc_id
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q291_client_redirects(spark, sf_dir):
    """Client-side redirect extraction (operators/meta.py
    client_redirects): meta-refresh (with its N;url= delay
    microsyntax) and window.location JS assignments — the redirect
    channels beyond HTTP 3xx a crawler must honor, and the
    cloaking-detection staple (0-delay client redirect on a
    content-bearing page = classic spam signal). Fixture thirds:
    meta-refresh with varying delay / a JS redirect / no redirect at
    all; codegen regexp end to end."""
    from .operators.meta import client_redirects

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(";url=https://t"), sid, F.lit('.com/new">'),
            ),
        ).when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("<script>window.location.href = '/spa/"), sid,
                F.lit("';</script>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"),
    )
    return client_redirects(d.select("doc_id", html.alias("html")))


@q(
    "q292_seo_health",
    """
    WITH p AS (
      SELECT 'h' || (doc_id % 20) AS host,
             CASE WHEN doc_id % 4 = 0 THEN 'Shared Title'
                  ELSE 'Doc ' || doc_id || ' long title' END AS title,
             CASE WHEN doc_id % 5 = 0 THEN ''
                  ELSE 'desc ' || doc_id END AS meta_description
      FROM documents
    ),
    pt AS (SELECT host, title, count(*) AS n FROM p GROUP BY 1, 2),
    dup AS (SELECT host, CAST(sum(n) AS BIGINT) AS n_dup_title_pages
            FROM pt WHERE n > 1 GROUP BY 1)
    SELECT p.host, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(coalesce(any_value(dup.n_dup_title_pages), 0)
                AS BIGINT) AS n_dup_title_pages,
           CAST(sum(CASE WHEN meta_description = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missing_desc,
           CAST(sum(CASE WHEN length(title) < 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_short_title
    FROM p LEFT JOIN dup ON dup.host = p.host
    GROUP BY p.host
    """,
)
def q292_seo_health(spark, sf_dir):
    """Per-host SEO health card (operators/textstats.py
    seo_health_rollup) — the Search-Console-style rollup the
    reference's per-page reports imply but never aggregate: duplicate
    titles (every 4th page shares one), missing descriptions (every
    5th), short titles. Two partial-agg groupBys + a host-keyed left
    join, no window; oracle restates the same grouping algebra."""
    from .operators.textstats import seo_health_rollup

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    pages = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
        .alias("host"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("Shared Title"))
        .otherwise(F.concat(F.lit("Doc "), sid, F.lit(" long title")))
        .alias("title"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("desc "), sid))
        .alias("meta_description"),
    )
    return seo_health_rollup(pages)


# --- wave: accessibility audit + third-party census (q293-q294) ---------------


@q(
    "q293_a11y_audit",
    """
    SELECT doc_id,
           CAST(2 AS INT) AS n_images,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_missing_alt,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT)
             AS n_h1,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_level_skips
    FROM documents
    """,
)
def q293_a11y_audit(spark, sf_dir):
    """Accessibility / outline audit (operators/meta.py a11y_audit):
    alt-less images and broken heading ladders — WCAG findings that
    double as page-quality curation signals. Fixture: two images (one
    losing its alt on even ids), a duplicate h1 every 3rd doc, an
    h1→h3 level skip every 4th. Level-skip detection is zip_with over
    the heading-level array and its shifted self — array codegen, no
    walker, no shuffle."""
    from .operators.meta import a11y_audit

    d = _read(spark, sf_dir, "documents")
    alt2 = F.when(F.col("doc_id") % 2 == 0, F.lit("")) \
        .otherwise(F.lit(' alt="b"'))
    h_tail = F.when(
        F.col("doc_id") % 4 == 0, F.lit("<h3>skip</h3>")
    ).otherwise(F.lit("<h2>ok</h2>"))
    extra_h1 = F.when(
        F.col("doc_id") % 3 == 0, F.lit("<h1>again</h1>")
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body><img src="a.png" alt="a"><img src="b.png"'),
        alt2, F.lit("><h1>T</h1>"), h_tail, extra_h1,
        F.lit("</body></html>"),
    )
    return a11y_audit(d.select("doc_id", html.alias("html")))


@q(
    "q294_third_party_census",
    """
    WITH sites AS (
      SELECT DISTINCT 's' || (doc_id % 10) AS site_host,
             count(*) OVER (PARTITION BY doc_id % 10) AS np
      FROM documents
    ),
    n AS (SELECT 's' || (doc_id % 10) AS site_host,
                 CAST(count(*) AS BIGINT) AS n_pages
          FROM documents GROUP BY 1)
    SELECT site_host, 'cdn.example.org' AS third_party_host, n_pages
    FROM n
    UNION ALL
    SELECT site_host, 'tracker.example.net',
           CAST((SELECT count(*) FROM documents d2
                 WHERE 's' || (d2.doc_id % 10) = n.site_host
                   AND d2.doc_id % 2 = 0) AS BIGINT)
    FROM n
    WHERE EXISTS (SELECT 1 FROM documents d2
                  WHERE 's' || (d2.doc_id % 10) = n.site_host
                    AND d2.doc_id % 2 = 0)
    """,
)
def q294_third_party_census(spark, sf_dir):
    """Third-party dependency census (operators/meta.py
    third_party_census; the WebCensus-style measurement): per (site,
    third-party host) how many DISTINCT pages embed it — tracker
    prevalence, CDN reliance, supply-chain surface. Fixture: every
    page loads one CDN script and a same-site image (must NOT count);
    even pages add a tracker pixel; a duplicate CDN reference per
    page proves the distinct-pages semantics. Codegen extraction, one
    distinct, one partial-agg groupBy."""
    from .operators.meta import third_party_census

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    hid = (F.col("doc_id") % 10).cast("string")
    html = F.concat(
        F.lit('<script src="https://cdn.example.org/a.js"></script>'),
        F.lit('<script src="https://cdn.example.org/b.js"></script>'),
        F.lit('<img src="https://s'), hid, F.lit('/self.png">'),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit('<img src="https://tracker.example.net/px.gif">'),
        ).otherwise(F.lit("")),
    )
    pages = d.select(
        F.concat(F.lit("https://s"), hid, F.lit("/p/"), sid)
        .alias("url"),
        html.alias("html"),
    )
    return third_party_census(pages)


# --- wave: int8 quantization audit (q295) -------------------------------------


@q(
    "q295_int8_quant",
    """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS l
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, l, len(l) AS dim,
             list_max(list_transform(l, x -> abs(x))) / 127.0 AS scale
      FROM v
    ),
    e AS (
      SELECT vec_id, l, dim, scale,
             list_transform(
               l, x -> greatest(-127.0, least(127.0,
                         floor(x / scale + 0.5))) * scale - x
             ) AS err
      FROM s
    )
    SELECT vec_id, CAST(dim AS INT) AS dim,
           CAST(CASE WHEN scale = 0 THEN 0
                ELSE floor(1e6 * scale) END AS BIGINT) AS scale_micros,
           CAST(CASE WHEN scale = 0 THEN 0
                ELSE floor(1e6 * list_max(list_transform(err,
                       x -> abs(x)))) END AS BIGINT)
             AS max_abs_err_micros,
           CAST(CASE WHEN scale = 0 THEN 0
                ELSE floor(1e6 * (list_sum(list_transform(err,
                       x -> x * x)) / dim)) END AS BIGINT)
             AS mse_micros
    FROM e
    """,
)
def q295_int8_quant(spark, sf_dir):
    """Symmetric int8 scalar quantization + reconstruction-error audit
    (operators/similarity.py int8_quantization_audit; FAISS SQ8's
    recipe): scale = max|x|/127, half-up rounding, clamp — and the
    max-abs / MSE error columns you check against the ANN recall
    budget (q184) before flipping an index to SQ8 at 4x memory
    savings. Pure array codegen over the embedding column — zero
    shuffle, zero Python; every fold is the same left-to-right
    expression the oracle states, so integer micros hash-match."""
    from .operators.similarity import int8_quantization_audit

    e = _read(spark, sf_dir, "embeddings")
    return int8_quantization_audit(e)


# --- wave: fragment integrity + sitemap-robots conflict (q296-q297) -----------


@q(
    "q296_broken_fragments",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS INT)
             AS n_fragment_links,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_broken
    FROM documents
    """,
)
def q296_broken_fragments(spark, sf_dir):
    """Broken in-page fragment links (operators/meta.py
    broken_fragment_links): <a href=#x> without a matching id=x /
    <a name=x> — the dead-TOC bug static-site generators introduce
    constantly. Per-row array codegen (regexp_extract_all both sides,
    array_except for the broken set) — no explode, no join, no
    shuffle. Fixture: #top and #sec{id} resolve, evens add a
    #missing{id} that doesn't."""
    from .operators.meta import broken_fragment_links

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<div id="top"></div><a href="#top">up</a>'),
        F.lit('<h2 id="sec'), sid, F.lit('">s</h2>'),
        F.lit('<a href="#sec'), sid, F.lit('">go</a>'),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<a href="#missing'), sid, F.lit('">x</a>')),
        ).otherwise(F.lit("")),
    )
    return broken_fragment_links(d.select("doc_id", html.alias("html")))


@q(
    "q297_sitemap_robots_conflict",
    """
    SELECT doc_id, CAST(2 AS BIGINT) AS n_sitemap_urls,
           CAST(1 AS BIGINT) AS n_disallowed
    FROM documents
    """,
)
def q297_sitemap_robots_conflict(spark, sf_dir):
    """Sitemap-vs-robots conflict audit (composition: q288's
    sitemap_url_meta x q265's google_robots_verdict): urls a site
    ADVERTISES in its sitemap while its robots.txt FORBIDS them — the
    classic crawl-config contradiction Search Console flags, and a
    frontier must resolve (robots wins). Per host: advertised urls
    and how many are disallowed. Operators compose because both
    relations key on the url; the verdict side broadcasts its rule
    dim exactly as in q265."""
    from .sources.robots import google_robots_rules, google_robots_verdict
    from .sources.sitemap import sitemap_url_meta

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://h"), sid,
        F.lit("/pub/"), sid, F.lit("</loc></url><url><loc>https://h"),
        sid, F.lit("/private/"), sid,
        F.lit("</loc></url></urlset>"),
    )
    locs = sitemap_url_meta(
        d.select("doc_id", xml.alias("sitemap_xml")),
        keep_cols=("doc_id",),
    ).select(
        "doc_id",
        F.regexp_extract("url", r"^https?://[^/]+(/.*)$", 1)
        .alias("path"),
    )
    robots = d.select(
        "doc_id",
        F.lit("User-agent: *\nDisallow: /private/*\n")
        .alias("robots_txt"),
    )
    rules = google_robots_rules(robots, user_agent="tribeca")
    verdicts = google_robots_verdict(locs, rules)
    return verdicts.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_sitemap_urls"),
        F.sum(1 - F.col("allowed")).cast("bigint")
        .alias("n_disallowed"),
    )


# --- wave: isotonic calibration (q298) ----------------------------------------


@q(
    "q298_isotonic_calibration",
    """
    WITH b AS (
      SELECT source AS grp, CAST(doc_id % 12 AS BIGINT) AS bin_idx,
             CAST(count(*) AS BIGINT) AS n_tot,
             CAST(sum(CASE WHEN (doc_id * 7 + doc_id % 12) % 3 = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM documents GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT grp, bin_idx FROM b),
    ivr AS (
      SELECT g1.grp, g1.bin_idx AS i, g2.bin_idx AS j,
             CAST(sum(b.n_pos) AS DOUBLE) / sum(b.n_tot) AS r
      FROM keys g1
      JOIN keys g2 ON g1.grp = g2.grp AND g2.bin_idx >= g1.bin_idx
      JOIN b ON b.grp = g1.grp
            AND b.bin_idx BETWEEN g1.bin_idx AND g2.bin_idx
      GROUP BY 1, 2, 3
    ),
    mn AS (
      SELECT ivr.grp, ivr.i, k.bin_idx AS bin_idx, min(ivr.r) AS mr
      FROM ivr JOIN keys k
        ON k.grp = ivr.grp AND ivr.i <= k.bin_idx
       AND ivr.j >= k.bin_idx
      GROUP BY 1, 2, 3
    ),
    mx AS (SELECT grp, bin_idx, max(mr) AS ph FROM mn GROUP BY 1, 2)
    SELECT b.grp, b.bin_idx, b.n_pos, b.n_tot,
           CAST(floor(1e6 * mx.ph) AS BIGINT) AS p_hat_micros
    FROM b JOIN mx ON mx.grp = b.grp AND mx.bin_idx = b.bin_idx
    """,
)
def q298_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAV) calibration over score bins (operators/
    classifier.py isotonic_calibration; Zadrozny & Elkan KDD'02) via
    the minimax characterization p_hat(k) = max_{i<=k} min_{j>=k}
    rate(i..j) — exact, monotone by construction, and restatable as
    nested aggregations over bin INTERVALS (O(bins^2), and bins are
    score buckets, never corpus rows). Spark evaluates the identical
    double divisions over prefix sums in one applyInPandas per group
    (a group ships |bins| integers across Arrow after the single
    group-key shuffle). Fixture: per-source empirical rates made
    deliberately non-monotone so adjacent-violator pooling actually
    pools."""
    from .operators.classifier import isotonic_calibration

    d = _read(spark, sf_dir, "documents")
    bins = d.groupBy(
        F.col("source").alias("grp"),
        (F.col("doc_id") % 12).cast("bigint").alias("bin_idx"),
    ).agg(
        F.count("*").cast("bigint").alias("n_tot"),
        F.sum(
            F.when(
                (F.col("doc_id") * 7 + F.col("doc_id") % 12) % 3 == 0, 1
            ).otherwise(0)
        ).cast("bigint").alias("n_pos"),
    )
    return isotonic_calibration(bins)


# --- wave: survivor enrichment (q299) -----------------------------------------


@q(
    "q299_survivor_enrichment",
    """
    WITH m AS (
      SELECT doc_id - doc_id % 3 AS cluster, doc_id,
             1704067200 + doc_id * 7 AS ts_epoch,
             CAST((doc_id * 13) % 997 AS BIGINT) * 1000
               AS quality_micros,
             CAST(doc_id % 7 AS BIGINT) AS inlinks
      FROM documents
    )
    SELECT cluster,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(ts_epoch) AS BIGINT) AS earliest_ts_epoch,
           CAST(max(quality_micros) AS BIGINT) AS max_quality_micros,
           CAST(sum(inlinks) AS BIGINT) AS total_inlinks,
           CAST(floor(1e6 / count(*)) AS BIGINT) AS weight_micros
    FROM m GROUP BY cluster
    """,
)
def q299_survivor_enrichment(spark, sf_dir):
    """Post-dedup survivor consolidation (operators/dedup.py
    survivor_enrichment): the losers' signals fold onto the kept
    document — earliest timestamp, best quality, total inlinks — plus
    the SoftDeDup-style ``1e6/n_members`` down-weight for pipelines
    that keep every member but normalize the cluster's gradient
    contribution to one document. One map-combinable groupBy on the
    cluster key; composes directly on q50's cluster labels (fixture
    uses closed-form groups of three)."""
    from .operators.dedup import survivor_enrichment

    d = _read(spark, sf_dir, "documents")
    members = d.select(
        (F.col("doc_id") - F.col("doc_id") % 3).alias("cluster"),
        "doc_id",
        (F.lit(1704067200) + F.col("doc_id") * 7).cast("bigint")
        .alias("ts_epoch"),
        ((F.col("doc_id") * 13) % 997 * 1000).cast("bigint")
        .alias("quality_micros"),
        (F.col("doc_id") % 7).cast("bigint").alias("inlinks"),
    )
    return survivor_enrichment(members)


# --- wave: site health card capstone (q300) -----------------------------------


@q(
    "q300_site_health_card",
    """
    WITH p AS (
      SELECT doc_id, 'h' || (doc_id % 20) AS host,
             CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS noindex,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS mixed,
             CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS brokenf,
             CASE WHEN doc_id % 2 = 0 THEN 'Shared Title'
                  ELSE 'T' || doc_id END AS title
      FROM documents
    ),
    pt AS (SELECT host, title, count(*) AS n FROM p GROUP BY 1, 2),
    dup AS (SELECT host, CAST(sum(n) AS BIGINT) AS n_dup_title_pages
            FROM pt WHERE n > 1 GROUP BY 1)
    SELECT p.host, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(noindex) AS BIGINT) AS n_noindex,
           CAST(sum(mixed) AS BIGINT) AS n_mixed,
           CAST(sum(brokenf) AS BIGINT) AS n_broken_frag,
           CAST(coalesce(any_value(dup.n_dup_title_pages), 0)
                AS BIGINT) AS n_dup_title_pages
    FROM p LEFT JOIN dup ON dup.host = p.host
    GROUP BY p.host
    """,
)
def q300_site_health_card(spark, sf_dir):
    """Per-host site health card — the capstone COMPOSITION: four
    independent audit relations (robots-meta indexability q267,
    mixed content q274, fragment integrity q296, duplicate titles
    q292) built from ONE shared page fixture and joined into one card
    in ONE Catalyst plan — the q245-style proof that this engine's
    audits are relations that compose, not reports that concatenate.
    Every component keys on the host/url the page store is bucketed
    by; the plan is four partial-agg branches over one scan lineage
    plus host-keyed joins, no window."""
    from .operators.meta import (
        broken_fragment_links,
        mixed_content_audit,
        robots_meta_flags,
    )
    from .operators.textstats import seo_health_rollup

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    hid = (F.col("doc_id") % 20).cast("string")
    html = F.concat(
        F.lit("<html><head>"),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit('<meta name="robots" content="noindex">'))
        .otherwise(F.lit("")),
        F.lit("</head><body>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<img src="http://cdn.example.org/i.png">'),
        ).otherwise(
            F.lit('<img src="https://cdn.example.org/i.png">')
        ),
        F.lit('<div id="top"></div><a href="#top">up</a>'),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit('<a href="#gone">x</a>')).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    url = F.concat(F.lit("https://h"), hid, F.lit("/p/"), sid)
    pages = d.select(
        "doc_id", F.concat(F.lit("h"), hid).alias("host"),
        url.alias("url"), html.alias("html"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("Shared Title"))
        .otherwise(F.concat(F.lit("T"), sid)).alias("title"),
        F.lit("d").alias("meta_description"),
    )
    host_of = pages.select("doc_id", "host", "url")

    ridx = robots_meta_flags(pages).join(host_of, "doc_id").groupBy(
        "host"
    ).agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum("noindex").cast("bigint").alias("n_noindex"),
    )
    mixed = mixed_content_audit(pages).join(
        host_of.select("url", "host"), "url"
    ).groupBy("host").agg(
        F.sum("mixed").cast("bigint").alias("n_mixed")
    )
    frags = broken_fragment_links(pages).join(host_of, "doc_id") \
        .groupBy("host").agg(
            F.sum(F.when(F.col("n_broken") > 0, 1).otherwise(0))
            .cast("bigint").alias("n_broken_frag")
        )
    seo = seo_health_rollup(pages).select("host", "n_dup_title_pages")
    return (
        ridx.join(mixed, "host")
        .join(frags, "host")
        .join(seo, "host")
        .select("host", "n_pages", "n_noindex", "n_mixed",
                "n_broken_frag", "n_dup_title_pages")
    )



# --- wave: Trojan-Source bidi audit (q301) ------------------------------------


@q(
    "q301_bidi_audit",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS INT)
             AS n_bidi,
           CAST(CASE WHEN doc_id % 4 = 2 THEN 2 ELSE 0 END AS INT)
             AS n_zero_width,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS INT)
             AS n_other_ctrl,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INT)
             AS clean
    FROM documents
    """,
)
def q301_bidi_audit(spark, sf_dir):
    """Trojan-Source / invisible-character audit (operators/
    textstats.py bidi_invisible_audit; CVE-2021-42574): bidi control
    characters that make code READ differently than it parses,
    zero-width characters that smuggle payloads and split dedup keys,
    stray C0/C1 controls — the ingest gate a code corpus runs before
    training. Fixture quarters: clean / one RLO / two ZWSP / one C0
    control, injected as unicode escapes so neither source file nor
    oracle ever contains the raw bytes. Pure codegen Project."""
    from .operators.textstats import bidi_invisible_audit

    d = _read(spark, sf_dir, "documents")
    marker = (
        F.when(F.col("doc_id") % 4 == 1, F.lit("\u202e"))
        .when(F.col("doc_id") % 4 == 2, F.lit("\u200b\u200b"))
        .when(F.col("doc_id") % 4 == 3, F.lit("\u0001"))
        .otherwise(F.lit(""))
    )
    return bidi_invisible_audit(
        d.select("doc_id", F.concat("text", marker).alias("text"))
    )


# --- wave: html lang attribute consistency (q302) -----------------------------


@q(
    "q302_lang_attr_consistency",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN 'fr-ca'
                WHEN doc_id % 7 = 0 THEN ''
                ELSE lang || '-gb' END AS lang_attr,
           CASE WHEN doc_id % 5 = 0 THEN 'fr'
                WHEN doc_id % 7 = 0 THEN ''
                ELSE lang END AS lang_primary,
           lang AS lang_declared,
           CAST(CASE WHEN doc_id % 5 = 0
                       THEN CASE WHEN lang = 'fr' THEN 1 ELSE 0 END
                     WHEN doc_id % 7 = 0 THEN 0
                     ELSE 1 END AS INT) AS attr_matches_declared
    FROM documents
    """,
)
def q302_lang_attr_consistency(spark, sf_dir):
    """<html lang> attribute vs fetch-layer language label
    (operators/meta.py html_lang_attr): the third vertex of the
    language triangle — q197 audits declared-vs-detected, this audits
    DECLARED-vs-ATTRIBUTE, with region subtags stripped (en-GB → en)
    because routing keys on the primary tag. Fixture: every 5th page
    declares fr-CA against a non-fr label (mismatch), every 7th omits
    the attribute (no verdict), the rest carry region-tagged
    agreeing attributes. Codegen regexp on the root element only."""
    from .operators.meta import html_lang_attr

    d = _read(spark, sf_dir, "documents")
    attr = F.when(F.col("doc_id") % 5 == 0, F.lit("fr-CA")) \
        .when(F.col("doc_id") % 7 == 0, F.lit(None)) \
        .otherwise(F.concat(F.col("lang"), F.lit("-GB")))
    html = F.concat(
        F.lit("<html"),
        F.when(attr.isNotNull(),
               F.concat(F.lit(' lang="'), attr, F.lit('"')))
        .otherwise(F.lit("")),
        F.lit("><body>x</body></html>"),
    )
    out = html_lang_attr(d.select("doc_id", html.alias("html"))).join(
        d.select("doc_id", F.col("lang").alias("lang_declared")),
        "doc_id",
    )
    return out.select(
        "doc_id", "lang_attr", "lang_primary", "lang_declared",
        F.when(
            (F.col("lang_primary") != "")
            & (F.col("lang_primary") == F.col("lang_declared")), 1
        ).otherwise(0).cast("int").alias("attr_matches_declared"),
    )


# --- wave: CSP directive relation (q303) --------------------------------------


@q(
    "q303_csp_directives",
    """
    SELECT doc_id, 'default-src' AS directive, '''self''' AS source
    FROM documents
    UNION ALL
    SELECT doc_id, 'script-src', '''self''' FROM documents
    WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'script-src', 'https://cdn.example.org'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'upgrade-insecure-requests', ''
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q303_csp_directives(spark, sf_dir):
    """CSP directive relation (operators/meta.py csp_directives): the
    normalized (directive, source) pairs security-posture rollups
    aggregate — e.g. join script-src whitelists against q294's
    OBSERVED third-party census to catch policy/reality drift. Even
    docs whitelist a CDN for script-src, every 3rd doc carries the
    source-less upgrade-insecure-requests (one row, source '').
    Codegen meta extraction + two-level split/explode."""
    from .operators.meta import csp_directives

    d = _read(spark, sf_dir, "documents")
    policy = F.concat(
        F.lit("default-src 'self'"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("; script-src 'self' https://cdn.example.org"),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("; upgrade-insecure-requests")).otherwise(F.lit("")),
    )
    html = F.concat(
        F.lit('<html><head><meta http-equiv="Content-Security-Policy" '
              'content="'),
        policy, F.lit('"></head><body>y</body></html>'),
    )
    return csp_directives(d.select("doc_id", html.alias("html")))


# --- wave: RTBF tombstone propagation (q304) ----------------------------------


@q(
    "q304_index_tombstones",
    """
    WITH g AS (SELECT doc_id // 10 AS grp, doc_id FROM documents),
    keep AS (
      SELECT grp, doc_id FROM g
      WHERE NOT (grp % 5 = 0) AND NOT (doc_id % 10 = 0)
    ),
    cnt AS (SELECT grp, CAST(count(*) * 2 AS BIGINT) AS n_rows_after
            FROM keep GROUP BY 1)
    SELECT gg.grp, CAST(coalesce(cnt.n_rows_after, 0) AS BIGINT)
             AS n_rows_after,
           CAST(CASE WHEN cnt.grp IS NOT NULL THEN 1 ELSE 0 END
                AS INT) AS still_dup
    FROM (SELECT DISTINCT grp FROM g) gg
    LEFT JOIN cnt ON cnt.grp = gg.grp
    """,
)
def q304_index_tombstones(spark, sf_dir):
    """Right-to-be-forgotten delete propagation (operators/dedup.py
    apply_tombstones): erased documents' rows leave the persisted
    band index via ONE broadcast left-anti join — no rebuild — and a
    probe proves the semantics: key-groups whose members are ALL
    tombstoned (every 5th group, plus partial deletes elsewhere) stop
    matching entirely, everything else keeps deduping. The oracle
    states survivorship as the same keep/count algebra, so verdicts
    track every SF. Composes with q106 (incremental dedup) and q279
    (reservation-driven erasure lists)."""
    from .operators.dedup import apply_tombstones

    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr("doc_id div 10").alias("grp")
    )
    index = d.select(
        "doc_id", "grp",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("band"),
    ).select(
        "doc_id", "grp", "band",
        F.concat(F.lit("k"), F.col("grp").cast("string"),
                 F.lit("-"), F.col("band").cast("string"))
        .alias("band_key"),
    )
    tomb = d.filter(
        (F.col("grp") % 5 == 0) | (F.col("doc_id") % 10 == 0)
    )
    updated = apply_tombstones(index, tomb)
    stats = updated.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_rows_after")
    )
    return (
        d.select("grp").distinct()
        .join(stats, "grp", "left")
        .select(
            "grp",
            F.coalesce("n_rows_after", F.lit(0)).cast("bigint")
            .alias("n_rows_after"),
            F.when(F.col("n_rows_after").isNotNull(), 1).otherwise(0)
            .cast("int").alias("still_dup"),
        )
    )


# --- wave: URL-space layout — SURT keys + PSL registrable domains ------------


@q(
    "q305_surt_keys",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'com,example,ext' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/Docs/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
        WHEN 1 THEN 'uk,co,example,site' || CAST(doc_id % 5 AS VARCHAR)
                 || ',sub)/a/' || CAST(doc_id AS VARCHAR)
        WHEN 2 THEN 'org,example,news' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/' || CAST(doc_id AS VARCHAR) || '?z=9'
        ELSE 'net,example,cdn' || CAST(doc_id % 5 AS VARCHAR)
                 || ')/static/' || CAST(doc_id AS VARCHAR)
      END AS surt,
      CASE doc_id % 4
        WHEN 0 THEN 'com,example'
        WHEN 1 THEN 'uk,co'
        WHEN 2 THEN 'org,example'
        ELSE 'net,example'
      END AS shard_prefix
    FROM documents
    """,
)
def q305_surt_keys(spark, sf_dir):
    """SURT key generation (functions/urlnorm.py surt_key/surt_prefix):
    the sort-friendly URI form CDX indexes key on — host lowercased +
    reversed + comma-joined, www/default-port/fragment dropped, query
    sorted — plus the 2-label range-partition prefix. The fixture
    exercises every normalization: mixed case, :80/:443, www/www2
    prefixes, unsorted query, fragment. The oracle states each
    transform's closed form. At 10^12 captures, sorting the Iceberg
    table by this key is what turns per-site reads into contiguous
    range scans (Common Crawl's own index layout); the whole transform
    is per-row codegen, zero shuffle."""
    from .functions.urlnorm import surt_key, surt_prefix

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    g = (F.col("doc_id") % 5).cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("HTTP://WWW.Ext"), g, F.lit(".Example.COM:80/Docs/"),
            sid, F.lit("?b=2&a=1")))
        .when(m == 1, F.concat(
            F.lit("https://Sub.Site"), g, F.lit(".example.CO.UK:443/a/"),
            sid, F.lit("#frag")))
        .when(m == 2, F.concat(
            F.lit("http://www2.news"), g, F.lit(".example.org/"),
            sid, F.lit("?z=9")))
        .otherwise(F.concat(
            F.lit("https://cdn"), g, F.lit(".example.net/static/"), sid))
    )
    return (
        d.select("doc_id", url.alias("url"))
        .select("doc_id", surt_key("url").alias("surt"))
        .select(
            "doc_id", "surt",
            surt_prefix("surt").alias("shard_prefix"),
        )
    )


@q(
    "q306_registrable_domains",
    """
    WITH h AS (
      SELECT
        CASE doc_id % 6
          WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR)
                   || '.shop.example.co.uk'
          WHEN 1 THEN 'user' || CAST(doc_id % 7 AS VARCHAR)
                   || '.blogspot.com'
          WHEN 2 THEN 'example.com'
          WHEN 3 THEN 'deep.www.example' || CAST(doc_id % 7 AS VARCHAR)
                   || '.com.br'
          WHEN 4 THEN 'site' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.zz'
          ELSE 'co.uk'
        END AS host,
        CASE doc_id % 6
          WHEN 0 THEN 'co.uk' WHEN 1 THEN 'blogspot.com'
          WHEN 2 THEN 'com' WHEN 3 THEN 'com.br'
          WHEN 4 THEN 'zz' ELSE 'co.uk'
        END AS public_suffix,
        CASE doc_id % 6
          WHEN 0 THEN 'example.co.uk'
          WHEN 1 THEN 'user' || CAST(doc_id % 7 AS VARCHAR)
                   || '.blogspot.com'
          WHEN 2 THEN 'example.com'
          WHEN 3 THEN 'example' || CAST(doc_id % 7 AS VARCHAR) || '.com.br'
          WHEN 4 THEN 'example.zz'
          ELSE NULL
        END AS registrable,
        CASE doc_id % 6
          WHEN 0 THEN 'a' || CAST(doc_id % 7 AS VARCHAR) || '.shop'
          WHEN 3 THEN 'deep.www'
          WHEN 4 THEN 'site' || CAST(doc_id % 7 AS VARCHAR)
          ELSE NULL
        END AS subdomain
      FROM documents
    )
    SELECT DISTINCT host, public_suffix, registrable, subdomain FROM h
    """,
)
def q306_registrable_domains(spark, sf_dir):
    """Registrable-domain (eTLD+1) extraction with Public-Suffix-List
    semantics (functions/urlnorm.py registrable_domains): longest
    matching suffix wins (co.uk beats uk), PRIVATE-section platform
    suffixes (blogspot.com) keep user subdomains as separate sites,
    unknown TLDs fall back to the PSL default ``*`` rule, and a host
    that IS a suffix gets registrable NULL. This is the grouping key
    every per-"domain" stage (dedup rate caps, host quality priors,
    politeness budgets) actually needs — naive last-two-labels merges
    all of blogspot into one site and splits co.uk sites in half.
    Shape: distinct hosts → suffix-explode → broadcast PSL join →
    max(struct) partial agg; the page table is never shuffled."""
    from .functions.urlnorm import registrable_domains

    d = _read(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 7).cast("string")
    m = F.col("doc_id") % 6
    host = (
        F.when(m == 0, F.concat(F.lit("a"), g, F.lit(".shop.example.co.uk")))
        .when(m == 1, F.concat(F.lit("user"), g, F.lit(".blogspot.com")))
        .when(m == 2, F.lit("example.com"))
        .when(m == 3, F.concat(F.lit("deep.www.example"), g,
                               F.lit(".com.br")))
        .when(m == 4, F.concat(F.lit("site"), g, F.lit(".example.zz")))
        .otherwise(F.lit("co.uk"))
    )
    return registrable_domains(d.select(host.alias("host")))


# --- wave: form census + microdata (q307-q308) --------------------------------


@q(
    "q307_form_census",
    """
    SELECT doc_id, 1 AS form_idx, '/login' AS action, 'post' AS method,
           3 AS n_inputs, 1 AS n_password, 0 AS n_email, 1 AS n_hidden,
           'login' AS kind
    FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT doc_id, 1, '/search', 'get', 1, 0, 0, 0, 'search'
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    SELECT doc_id, 2, '/fb', 'get', 1, 0, 0, 0, 'other'
    FROM documents WHERE doc_id % 4 = 1
    UNION ALL
    SELECT doc_id, 1, 'https://news.example.org/sub', 'post',
           1, 0, 1, 0, 'newsletter'
    FROM documents WHERE doc_id % 4 = 2
    """,
)
def q307_form_census(spark, sf_dir):
    """HTML form inventory and page-kind classification (operators/
    meta.py form_census): login walls, search shells and newsletter
    capture forms are navigation chrome a training corpus filters and
    a crawl frontier stops behind. Fixture: a 3-input login form with
    hidden CSRF (every 4th doc), a search + feedback form PAIR
    (form_idx ordering proven), a one-field email signup; every rule
    (password→login, search-name→search, lone-email→newsletter,
    default method get) is stated closed-form by the oracle. Codegen
    regexp channels, zero shuffle."""
    from .operators.meta import form_census

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.lit(
            '<html><body><form action="/login" method="POST">'
            '<input type="text" name="user">'
            '<input type="password" name="pw">'
            '<input type="hidden" name="csrf" value="t"></form>'
            "</body></html>"))
        .when(m == 1, F.lit(
            '<html><body><form action="/search">'
            '<input type="search" name="q"></form>'
            '<form action="/fb"><input type="text" name="comment">'
            "</form></body></html>"))
        .when(m == 2, F.lit(
            '<html><body><form action="https://news.example.org/sub" '
            'method="post"><input type="email" name="e"></form>'
            "</body></html>"))
        .otherwise(F.lit("<html><body>no forms</body></html>"))
    )
    return form_census(d.select("doc_id", html.alias("html")))


@q(
    "q308_microdata",
    """
    SELECT doc_id, 'Product' AS itemtype, 'name' AS prop,
           'Widget ' || CAST(doc_id AS VARCHAR) AS value
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'Product', 'price', '9.99'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'Article', 'headline', 'Doc ' || CAST(doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q308_microdata(spark, sf_dir):
    """Schema.org microdata extraction (operators/meta.py
    microdata_items) — the third structured-data channel next to
    JSON-LD (q269) and OpenGraph (q268): flat single-scope
    (id, itemtype, prop, value) rows, content= attribute preferred
    over element text. Fixture: Product pages with a text prop and a
    meta-content price, Article pages with a headline, and prop-less
    pages emitting nothing. Codegen regexp channels, zero shuffle."""
    from .operators.meta import microdata_items

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    html = (
        F.when(m == 0, F.concat(
            F.lit('<html><body><div itemscope '
                  'itemtype="https://schema.org/Product">'
                  '<span itemprop="name">Widget '), sid,
            F.lit('</span><meta itemprop="price" content="9.99">'
                  "</div></body></html>")))
        .when(m == 1, F.concat(
            F.lit('<html><body><article itemscope '
                  'itemtype="https://schema.org/Article">'
                  '<h1 itemprop="headline">Doc '), sid,
            F.lit("</h1></article></body></html>")))
        .otherwise(F.lit("<html><body>plain</body></html>"))
    )
    return microdata_items(d.select("doc_id", html.alias("html")))


# --- wave: publish-date resolution (q309) -------------------------------------


@q(
    "q309_publish_dates",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN make_date(2024, CAST(doc_id % 12 + 1 AS INT), 3)
        WHEN 1 THEN make_date(2023, CAST(doc_id % 12 + 1 AS INT), 11)
        WHEN 2 THEN make_date(2022, CAST(doc_id % 12 + 1 AS INT), 1)
        ELSE NULL
      END AS pub_date,
      CASE doc_id % 4
        WHEN 0 THEN 'meta' WHEN 1 THEN 'jsonld' WHEN 2 THEN 'url'
        ELSE NULL
      END AS channel
    FROM documents
    """,
)
def q309_publish_dates(spark, sf_dir):
    """Publish-date resolution with precedence (operators/meta.py
    publish_dates): OpenGraph article:published_time beats JSON-LD
    datePublished beats the /YYYY/MM/ permalink pattern. The fixture
    proves precedence (meta-channel docs ALSO carry a decoy JSON-LD
    date that must lose), ISO-timestamp truncation, URL month
    resolution to the 1st, and the all-channels-absent NULL row. The
    curation axis: cutoff-aware splits and contamination windows need
    a date per document, and the three channels disagree in the wild —
    the ladder must be explicit. Codegen regexp + to_date/make_date,
    zero shuffle."""
    from .operators.meta import publish_dates

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    mm = F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.concat(
            F.lit('<html><head><meta property="article:published_time" '
                  'content="2024-'), mm,
            F.lit('-03T10:00:00Z"><script type="application/ld+json">'
                  '{"datePublished": "1999-01-01"}</script></head>'
                  "<body>a</body></html>")))
        .when(m == 1, F.concat(
            F.lit('<html><body><script type="application/ld+json">'
                  '{"@type": "NewsArticle", "datePublished": "2023-'), mm,
            F.lit('-11T00:00:00+02:00"}</script></body></html>')))
        .otherwise(F.lit("<html><body>undated</body></html>"))
    )
    url = (
        F.when(m == 2, F.concat(
            F.lit("https://blog.example.com/2022/"), mm,
            F.lit("/post-"), sid))
        .otherwise(F.concat(F.lit("https://a.example.com/p/"), sid))
    )
    return publish_dates(
        d.select("doc_id", url.alias("url"), html.alias("html"))
    )


# --- wave: sentence segmentation + quotation mining (q310-q311) ---------------


@q(
    "q310_sentence_spans",
    """
    SELECT doc_id, 1 AS sent_idx,
           'Alpha ' || CAST(doc_id AS VARCHAR) || '.' AS sentence,
           CAST(7 + length(CAST(doc_id AS VARCHAR)) AS INT) AS n_chars
    FROM documents
    UNION ALL
    SELECT doc_id, 2, 'Beta two!!', 10 FROM documents
    UNION ALL
    SELECT doc_id, 3, 'Gamma three?', 12 FROM documents
    UNION ALL
    SELECT doc_id, 4, 'tail ' || CAST(doc_id AS VARCHAR),
           CAST(5 + length(CAST(doc_id AS VARCHAR)) AS INT)
    FROM documents
    """,
)
def q310_sentence_spans(spark, sf_dir):
    """Deterministic sentence segmentation (operators/textstats.py
    sentence_spans): terminal-punctuation-run boundaries, document
    order preserved, trailing unterminated fragment kept as the final
    sentence. The shared unit under chunking, bitext alignment,
    sentence-level dedup and mean-sentence-length quality gates — the
    fixture exercises single and doubled punctuation, '?' boundaries
    and the tail fragment, and the oracle states every row closed-
    form. Marker-insert + split + posexplode: per-row codegen, zero
    shuffle."""
    from .operators.textstats import sentence_spans

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    text = F.concat(
        F.lit("Alpha "), sid, F.lit(". Beta two!! Gamma three? tail "), sid
    )
    return sentence_spans(d.select("doc_id", text.alias("text")))


@q(
    "q311_shared_quotes",
    """
    SELECT 'unique insight number ' || CAST(doc_id AS VARCHAR)
             || ' from doc' AS quote,
           md5('unique insight number ' || CAST(doc_id AS VARCHAR)
             || ' from doc') AS quote_md5,
           CAST(1 AS BIGINT) AS n_docs,
           CAST(1 AS BIGINT) AS n_occurrences,
           doc_id AS sample_doc_id
    FROM documents
    UNION ALL
    SELECT 'the shared syndicated press release line',
           md5('the shared syndicated press release line'),
           (SELECT count(*) FROM documents WHERE doc_id % 5 = 0),
           (SELECT count(*) FROM documents WHERE doc_id % 5 = 0),
           CAST(0 AS BIGINT)
    """,
)
def q311_shared_quotes(spark, sf_dir):
    """Cross-document quotation mining (operators/dedup.py
    shared_quotes): quoted spans ≥20 chars rolled up by quote —
    syndication/boilerplate detection at SPAN level, invisible to the
    document/paragraph dedup passes. Fixture: every doc carries one
    unique straight-quoted span; every 5th doc also carries one
    CURLY-quoted syndicated line, whose rollup row (n_docs = corpus
    count of that stratum, sample = min id) the oracle states closed-
    form. One map-combined groupBy on the quote key; md5 column is
    the at-scale join key."""
    from .operators.dedup import shared_quotes

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    text = F.concat(
        F.lit('He said "unique insight number '), sid,
        F.lit(' from doc" and '),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("also “the shared syndicated press release line” end"),
        ).otherwise(F.lit("nothing more")),
    )
    return shared_quotes(d.select("doc_id", text.alias("text")))


# --- wave: paragraph-level language segmentation (q312) -----------------------


@q(
    "q312_paragraph_langs",
    """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 2 ELSE 1 END
        AS n_paragraphs,
      CASE doc_id % 4 WHEN 0 THEN 2 WHEN 3 THEN 0 ELSE 1 END AS n_langs,
      CASE doc_id % 4 WHEN 3 THEN 'none' ELSE 'en' END AS dominant_lang,
      CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1
        ELSE 0 END AS n_dominant_paras,
      CASE doc_id % 4 WHEN 0 THEN 1 ELSE 0 END AS is_mixed
    FROM documents
    """,
)
def q312_paragraph_langs(spark, sf_dir):
    """Paragraph-level language segmentation (operators/textstats.py
    paragraph_langs): per-paragraph marker argmax, per-document
    mixed-language flagging — the CCNet/FineWeb-style sub-document
    granularity that catches half-translated pages document-level ID
    (q25) hides. Fixture strata: EN+ES mixed doc (dominant tie broken
    by code ascending), uniform 2-paragraph EN doc, single-paragraph
    EN doc, and a no-marker doc resolving to 'none'/0 langs. Two
    map-combined groupBys + min(struct) dominant pick; no windows."""
    from .operators.textstats import paragraph_langs

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    text = (
        F.when(m == 0,
               F.lit("the cat is this fine\n\nlos gatos las casas una"))
        .when(m == 1,
              F.lit("the first is here\n\nthe second and third of them"))
        .when(m == 2, F.lit("the only paragraph of note"))
        .otherwise(F.lit("zzz qqq xylophone"))
    )
    return paragraph_langs(d.select("doc_id", text.alias("text")))


# --- wave: host co-citation similarity (q313) ---------------------------------


@q(
    "q313_host_cocitation",
    """
    WITH e AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 6 AS VARCHAR) AS src,
                      'd' || CAST(doc_id % 10 AS VARCHAR) AS dst
      FROM documents
      UNION
      SELECT DISTINCT 'h' || CAST(doc_id % 6 AS VARCHAR),
                      'x' || CAST(doc_id % 4 AS VARCHAR)
      FROM documents
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
    p AS (
      SELECT a.src AS host_a, b.src AS host_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT p.host_a, p.host_b, p.n_shared,
           da.d AS n_a, db.d AS n_b,
           CAST(1000000 * p.n_shared // (da.d + db.d - p.n_shared)
                AS BIGINT) AS jaccard_micros
    FROM p
    JOIN deg da ON da.src = p.host_a
    JOIN deg db ON db.src = p.host_b
    """,
)
def q313_host_cocitation(spark, sf_dir):
    """Host co-citation similarity (operators/linkgraph.py
    host_cocitation): outlink-set Jaccard per host pair via the
    inverted-index self-join on destination — the mirror-network and
    link-farm detector that survives text rewrites (composes with
    q161 mirror_hosts and q204 spam mass). The oracle replays the
    identical relational algebra in SQL over the same two synthetic
    edge channels, so every pair/degree/micros value is cross-engine
    checked. Never all-pairs: destinations emit only their actual
    citer pairs, and the max_fanout cap (exercised in pytest) bounds
    hub blowup at corpus scale."""
    from .operators.linkgraph import host_cocitation

    d = _read(spark, sf_dir, "documents")
    s6 = (F.col("doc_id") % 6).cast("string")
    e1 = d.select(
        F.concat(F.lit("h"), s6).alias("src_host"),
        F.concat(F.lit("d"), (F.col("doc_id") % 10).cast("string"))
        .alias("dst_host"),
    )
    e2 = d.select(
        F.concat(F.lit("h"), s6).alias("src_host"),
        F.concat(F.lit("x"), (F.col("doc_id") % 4).cast("string"))
        .alias("dst_host"),
    )
    return host_cocitation(e1.unionByName(e2))


# --- wave: embedded-URL parameter audit (q314) --------------------------------


@q(
    "q314_embedded_url_params",
    """
    SELECT 'https://a.example.com/r?next=https%3A%2F%2Fevil.example.org'
             || '%2Fphish&x=' || CAST(doc_id AS VARCHAR) AS url,
           'next' AS param, 'evil.example.org' AS embedded_host,
           1 AS is_external
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'https://b.example.com/login?return=https://b.example.com/home'
             || CAST(doc_id AS VARCHAR),
           'return', 'b.example.com', 0
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q314_embedded_url_params(spark, sf_dir):
    """Embedded-URL query-parameter audit (functions/urlnorm.py
    embedded_url_params): parameters carrying absolute URLs — plain
    or percent-encoded — surfaced with their decoded target host and
    an internal/external flag. Open-redirect surface + frontier
    hygiene + wrapper-URL dedup noise, three standard crawl-pipeline
    consumers. Fixture: a %-encoded external redirect (decode path
    proven), a plain same-host return URL (is_external 0), and a
    plain-parameter page emitting nothing. Codegen split/regexp,
    zero shuffle."""
    from .functions.urlnorm import embedded_url_params

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://a.example.com/r?next=https%3A%2F%2F"
                  "evil.example.org%2Fphish&x="), sid))
        .when(m == 1, F.concat(
            F.lit("https://b.example.com/login?return="
                  "https://b.example.com/home"), sid))
        .otherwise(F.concat(F.lit("https://c.example.com/p?id="), sid))
    )
    return embedded_url_params(d.select(url.alias("url")))


# --- wave: compression-ratio quality signal (q315) ----------------------------


@q(
    "q315_compression_signal",
    """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 320 WHEN 1 THEN 101 ELSE 78 END
        AS n_bytes,
      CASE doc_id % 3 WHEN 0 THEN 20 WHEN 1 THEN 87 ELSE 77 END
        AS n_compressed,
      CASE doc_id % 3 WHEN 0 THEN CAST(62500 AS BIGINT)
        WHEN 1 THEN CAST(861386 AS BIGINT)
        ELSE CAST(987179 AS BIGINT) END AS ratio_micros
    FROM documents
    """,
)
def q315_compression_signal(spark, sf_dir):
    """DEFLATE compression-ratio quality signal (operators/
    textstats.py compression_signal): the long-range redundancy gate
    char-entropy can't provide — templated spam compresses to ~6% of
    raw, prose to ~86%, random-ish text to ~99%. zlib at a fixed
    level is bit-deterministic, so the oracle states the exact
    byte counts for the three fixture strata (values precomputed from
    the same public zlib): a STRICT oracle for a genuinely
    non-SQL-expressible operator. Arrow-batched pandas_udf; plan is
    Scan → ArrowEvalPython → Project, zero shuffle."""
    from .operators.textstats import compression_signal

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.lit("buy now " * 40))
        .when(m == 1, F.lit(
            "The committee reviewed the annual extraction report and "
            "published its findings for the member states."))
        .otherwise(F.lit(
            "qz7 xv93 kd2m wq8r fy5t bn1c gh6j pl4s mz0w vt8k xr3d "
            "cn9f jb5h wy2g qk7m dz4v"))
    )
    return compression_signal(d.select("doc_id", text.alias("text")))


# --- wave: frontier intake composition (q316) ---------------------------------


@q(
    "q316_frontier_intake",
    """
    WITH g AS (SELECT doc_id, CAST(doc_id % 5 AS VARCHAR) AS gg,
                      CAST(doc_id AS VARCHAR) AS sid, doc_id % 4 AS m
               FROM documents)
    SELECT
      CASE m
        WHEN 0 THEN 'https://WWW.Shop' || gg || '.example.co.uk/p/' || sid
                 || '?utm_source=x&b=2&a=1#f'
        WHEN 1 THEN 'http://spam' || gg || '.badsite.com/x/' || sid
        WHEN 2 THEN 'https://news.example.org/a/' || sid
        ELSE 'https://example.net:443/' || sid
      END AS url,
      CASE m
        WHEN 0 THEN 'https://www.shop' || gg || '.example.co.uk/p/' || sid
                 || '?a=1&b=2'
        WHEN 1 THEN 'http://spam' || gg || '.badsite.com/x/' || sid
        WHEN 2 THEN 'https://news.example.org/a/' || sid
        ELSE 'https://example.net/' || sid
      END AS canon,
      CASE m
        WHEN 0 THEN 'uk,co,example,shop' || gg || ')/p/' || sid
                 || '?a=1&b=2'
        WHEN 1 THEN 'com,badsite,spam' || gg || ')/x/' || sid
        WHEN 2 THEN 'org,example,news)/a/' || sid
        ELSE 'net,example)/' || sid
      END AS surt,
      CASE m
        WHEN 0 THEN 'example.co.uk' WHEN 1 THEN 'badsite.com'
        WHEN 2 THEN 'example.org' ELSE 'example.net'
      END AS registrable,
      CASE m WHEN 1 THEN 1 ELSE 0 END AS blocked
    FROM g
    """,
)
def q316_frontier_intake(spark, sf_dir):
    """Frontier-intake composition capstone: raw URL → canonical form
    (tracking strip + query sort + default-port drop, q41/q80) →
    SURT layout key (q305) → PSL registrable domain (q306) →
    registrable-level blocklist verdict — the exact normalize-and-
    admit relation a crawl scheduler materializes before enqueueing.
    Every stage is an existing audited operator; the composition
    proves they agree on one row (the canonical host feeds both the
    SURT and the PSL lookup, and the blocklist joins on REGISTRABLE,
    so spam subdomains can't dodge the block). Codegen end-to-end;
    the only joins are the broadcast PSL dim and the broadcast
    blocklist."""
    from .functions.urlnorm import (
        canonical_url,
        registrable_domains,
        surt_key,
        surt_prefix,
    )

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    gg = (F.col("doc_id") % 5).cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://WWW.Shop"), gg, F.lit(".example.co.uk/p/"),
            sid, F.lit("?utm_source=x&b=2&a=1#f")))
        .when(m == 1, F.concat(
            F.lit("http://spam"), gg, F.lit(".badsite.com/x/"), sid))
        .when(m == 2, F.concat(
            F.lit("https://news.example.org/a/"), sid))
        .otherwise(F.concat(F.lit("https://example.net:443/"), sid))
    )
    base = d.select(url.alias("url")).select(
        "url",
        canonical_url(F.col("url"), strip_tracking=True).alias("canon"),
    )
    withhost = base.select(
        "url", "canon",
        surt_key("canon", strip_www=True).alias("surt"),
        F.regexp_extract(
            F.col("canon"), r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1
        ).alias("host"),
    )
    regs = registrable_domains(withhost.select("host"))
    block = spark.createDataFrame([("badsite.com",)], "registrable string")
    return (
        withhost
        .join(F.broadcast(regs.select("host", "registrable")), "host")
        .join(
            F.broadcast(block.withColumn("_b", F.lit(1))),
            "registrable", "left",
        )
        .select(
            "url", "canon", "surt", "registrable",
            F.coalesce("_b", F.lit(0)).cast("int").alias("blocked"),
        )
    )


# --- wave: pagination chains + per-domain temporal profile (q317-q318) --------


@q(
    "q317_pagination_audit",
    """
    WITH b AS (SELECT doc_id, 'https://s.example.com/g'
                 || CAST(doc_id AS VARCHAR) || '/p' AS u,
                      doc_id % 5 AS m5 FROM documents)
    SELECT u || '1' AS url, u || '2' AS next_url,
           CAST(NULL AS VARCHAR) AS prev_url,
           CASE WHEN m5 = 0 THEN 0 ELSE 1 END AS next_reciprocal,
           1 AS is_first, 0 AS is_last
    FROM b
    UNION ALL
    SELECT u || '2', u || '3',
           CASE WHEN m5 = 0 THEN NULL ELSE u || '1' END,
           1, CASE WHEN m5 = 0 THEN 1 ELSE 0 END, 0
    FROM b
    UNION ALL
    SELECT u || '3', NULL, u || '2', NULL, 0, 1
    FROM b
    """,
)
def q317_pagination_audit(spark, sf_dir):
    """rel=next/prev pagination audit (operators/meta.py
    pagination_audit): per-page chain pointers, reciprocity verdict
    (next page must declare THIS page as prev), and first/last flags
    — chain roots for fetch-as-one-document logic and broken
    reciprocity as the misdeclared-pagination trap signal. Fixture:
    every doc expands to a 3-page chain; every 5th chain drops page
    2's prev declaration, which must flip page 1's reciprocity to 0
    and make page 2 a spurious second 'first'. link_tags codegen →
    per-page partial agg → one url-keyed self-join; no windows."""
    from .operators.meta import pagination_audit

    d = _read(spark, sf_dir, "documents")
    u = F.concat(F.lit("https://s.example.com/g"),
                 F.col("doc_id").cast("string"), F.lit("/p"))
    m5 = F.col("doc_id") % 5
    p1, p2, p3 = [F.concat(u, F.lit(str(i))) for i in (1, 2, 3)]
    mk = lambda *parts: F.concat(
        F.lit("<html><head>"), *parts, F.lit("</head><body>x</body></html>")
    )
    lnk = lambda rel, href: F.concat(
        F.lit('<link rel="%s" href="' % rel), href, F.lit('">')
    )
    pages = d.select(
        F.explode(
            F.array(
                F.struct(p1.alias("url"), mk(lnk("next", p2)).alias("html")),
                F.struct(
                    p2.alias("url"),
                    F.when(
                        m5 == 0, mk(lnk("next", p3))
                    ).otherwise(
                        mk(lnk("next", p3), lnk("prev", p1))
                    ).alias("html"),
                ),
                F.struct(p3.alias("url"), mk(lnk("prev", p2)).alias("html")),
            )
        ).alias("pg")
    ).select("pg.url", "pg.html")
    return pagination_audit(pages)


@q(
    "q318_domain_temporal_profile",
    """
    SELECT 'alpha.co.uk' AS registrable,
           (SELECT count(*) FROM documents WHERE doc_id % 2 = 0)
             AS n_docs,
           (SELECT count(*) FROM documents
            WHERE doc_id % 2 = 0 AND doc_id % 7 != 0) AS n_dated,
           DATE '2024-01-03' AS min_pub, DATE '2024-11-03' AS max_pub
    UNION ALL
    SELECT 'beta.com',
           (SELECT count(*) FROM documents WHERE doc_id % 2 = 1),
           (SELECT count(*) FROM documents
            WHERE doc_id % 2 = 1 AND doc_id % 7 != 0),
           DATE '2023-02-01', DATE '2023-12-01'
    """,
)
def q318_domain_temporal_profile(spark, sf_dir):
    """Per-registrable-domain temporal profile — the composition of
    publish-date resolution (q309) and PSL registrable-domain
    grouping (q306): ``(registrable, n_docs, n_dated, min_pub,
    max_pub)``. The corpus-datasheet row that answers 'how fresh is
    this site's content, and what share of it is dateable at all' —
    the grouping key is the REGISTRABLE domain, not the host, so
    subdomain farms roll up honestly. Fixture: two registrables, one
    dated via the meta channel, one via the URL channel, every 7th
    doc undated; the oracle states the month-coverage extremes
    closed-form. Shape: codegen date extraction → broadcast PSL host
    dim join → one partial-agg groupBy on the registrable key."""
    from .functions.urlnorm import registrable_domains
    from .operators.meta import publish_dates

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    mm = F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0")
    m2 = F.col("doc_id") % 2
    undated = F.col("doc_id") % 7 == 0
    host = (
        F.when(m2 == 0, F.concat(
            F.lit("b"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".alpha.co.uk")))
        .otherwise(F.concat(
            F.lit("c"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".beta.com")))
    )
    html = F.when(
        (m2 == 0) & ~undated,
        F.concat(
            F.lit('<html><head><meta property="article:published_time" '
                  'content="2024-'), mm,
            F.lit('-03T08:00:00Z"></head><body>x</body></html>')),
    ).otherwise(F.lit("<html><body>x</body></html>"))
    url = F.when(
        (m2 == 1) & ~undated,
        F.concat(F.lit("https://"), host, F.lit("/2023/"), mm,
                 F.lit("/post-"), sid),
    ).otherwise(F.concat(F.lit("https://"), host, F.lit("/p/"), sid))
    pages = d.select(
        "doc_id", host.alias("host"), url.alias("url"), html.alias("html")
    )
    dated = publish_dates(pages).join(
        pages.select("doc_id", "host"), "doc_id"
    )
    regs = registrable_domains(pages.select("host"))
    return (
        dated.join(F.broadcast(regs.select("host", "registrable")), "host")
        .groupBy("registrable")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("pub_date").cast("bigint").alias("n_dated"),
            F.min("pub_date").alias("min_pub"),
            F.max("pub_date").alias("max_pub"),
        )
    )


# --- wave: AMP pairing + template-leak audit (q319-q320) ----------------------


@q(
    "q319_amp_pages",
    """
    WITH b AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS sid,
                      doc_id % 3 AS m FROM documents)
    SELECT
      CASE m
        WHEN 0 THEN 'https://a.example.com/p/' || sid
        WHEN 1 THEN 'https://a.example.com/amp/' || sid
        ELSE 'https://a.example.com/x/' || sid
      END AS url,
      CASE m WHEN 1 THEN 1 ELSE 0 END AS is_amp,
      CASE m WHEN 0 THEN 'https://a.example.com/amp/' || sid
        ELSE NULL END AS amphtml_url,
      CASE m WHEN 1 THEN 'https://a.example.com/p/' || sid
        ELSE NULL END AS canonical_url,
      CASE m
        WHEN 0 THEN 'https://a.example.com/amp/' || sid
        WHEN 1 THEN 'https://a.example.com/p/' || sid
        ELSE NULL
      END AS pair_url
    FROM b
    """,
)
def q319_amp_pages(spark, sf_dir):
    """AMP variant detection and canonical pairing (operators/meta.py
    amp_pages): the mobile web's largest systematic near-duplicate
    family, paired via the spec's two declared pointers (rel=amphtml
    forward, rel=canonical back) plus the <html amp|⚡> attribute.
    pair_url is the dedup key either side — content hashing never
    catches these because the markup differs. Fixture: canonical
    pages pointing at their AMP twin, AMP pages (attribute set)
    pointing back, and unpaired pages all-NULL. Codegen link_tags
    channel + one attribute probe."""
    from .operators.meta import amp_pages

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    url = (
        F.when(m == 0, F.concat(F.lit("https://a.example.com/p/"), sid))
        .when(m == 1, F.concat(F.lit("https://a.example.com/amp/"), sid))
        .otherwise(F.concat(F.lit("https://a.example.com/x/"), sid))
    )
    html = (
        F.when(m == 0, F.concat(
            F.lit('<html><head><link rel="amphtml" '
                  'href="https://a.example.com/amp/'), sid,
            F.lit('"></head><body>c</body></html>')))
        .when(m == 1, F.concat(
            F.lit('<html amp lang="en"><head><link rel="canonical" '
                  'href="https://a.example.com/p/'), sid,
            F.lit('"></head><body>a</body></html>')))
        .otherwise(F.lit("<html><body>plain</body></html>"))
    )
    return amp_pages(d.select(url.alias("url"), html.alias("html")))


@q(
    "q320_template_leaks",
    """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 2 ELSE 0 END AS n_mustache,
      CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS n_erb,
      CASE doc_id % 4 WHEN 0 THEN 1 ELSE 0 END AS n_jinja_tags,
      CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS n_php,
      CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 1 ELSE 0 END AS leaky
    FROM documents
    """,
)
def q320_template_leaks(spark, sf_dir):
    """Unrendered-template artifact audit (operators/textstats.py
    template_leak_audit): mustache/ERB/jinja/PHP syntax in served
    text marks broken renders whose 'prose' is variable names —
    corpus poison, and a site-wide health signal (composes with
    q300's per-host card). Fixture strata carry two {{vars}} plus a
    {% tag %}, one <%= erb %>, one <?php leak, and clean text with
    decoy braces; the oracle states every count closed-form. Four
    codegen regexp counts, zero shuffle."""
    from .operators.textstats import template_leak_audit

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    text = (
        F.when(m == 0, F.lit(
            "Welcome {{ user.name }} to {{ site }} {% if x %} end"))
        .when(m == 1, F.lit("Price: <%= item.price %> dollars"))
        .when(m == 2, F.lit("<?php echo $title; ?> page"))
        .otherwise(F.lit("clean prose with { single } braces"))
    )
    return template_leak_audit(d.select("doc_id", text.alias("text")))


# --- wave: noindex-inlink contradiction + title duplication (q321-q322) -------


@q(
    "q321_noindex_inlinks",
    """
    WITH ind AS (
      SELECT doc_id % 50 AS k, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1
    )
    SELECT 'u' || CAST(d.doc_id AS VARCHAR) AS url,
           CASE WHEN d.doc_id % 4 = 0 THEN 1 ELSE 0 END AS noindex,
           CAST(coalesce(ind.n, 0) AS BIGINT) AS n_inlinks,
           CASE WHEN d.doc_id % 4 = 0 AND coalesce(ind.n, 0) > 0
             THEN 1 ELSE 0 END AS wasted
    FROM documents d LEFT JOIN ind ON ind.k = d.doc_id
    """,
)
def q321_noindex_inlinks(spark, sf_dir):
    """Noindex-but-linked contradiction audit (operators/meta.py
    noindex_inlink_audit): robots directives (q267's channel)
    cross-referenced with link in-degree — link equity into
    unrankable pages is architecture waste, and a frontier can
    deprioritize those families. Fixture: every 4th page noindexed,
    every page linking to the low-id URL family, so exactly the
    noindexed members of that family light up ``wasted``; the oracle
    states in-degree closed-form per id. One in-degree partial agg +
    one url-keyed left join."""
    from .operators.meta import noindex_inlink_audit

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("u"), sid)
    html = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit('<html><head><meta name="robots" content="noindex">'
              "</head><body>x</body></html>"),
    ).otherwise(F.lit("<html><body>x</body></html>"))
    pages = d.select(url.alias("url"), html.alias("html"))
    edges = d.select(
        url.alias("src"),
        F.concat(F.lit("u"), (F.col("doc_id") % 50).cast("string"))
        .alias("dst"),
    )
    return noindex_inlink_audit(pages, edges)


@q(
    "q322_title_duplication",
    """
    WITH p AS (
      SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
             CASE WHEN doc_id % 3 = 0 THEN 'Template Title'
               ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title
      FROM documents
    )
    SELECT host, title, CAST(count(*) AS BIGINT) AS n_pages,
           CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS is_dup
    FROM p GROUP BY host, title
    """,
)
def q322_title_duplication(spark, sf_dir):
    """Per-host duplicate-title clusters (operators/meta.py
    title_duplication): the metadata-level template-farm signal —
    titles duplicate even when body text was spun, complementing
    body-level template detection (q94/q96). Fixture: every 3rd page
    on each of 20 hosts shares one boilerplate title; the oracle
    replays the same (host, title) rollup. One map-combined groupBy
    on a host-prefixed key."""
    from .operators.meta import title_duplication

    d = _read(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 20).cast("string"))
    title = F.when(
        F.col("doc_id") % 3 == 0, F.lit("Template Title")
    ).otherwise(F.concat(F.lit("Doc "), F.col("doc_id").cast("string")))
    return title_duplication(
        d.select(host.alias("host"), title.alias("title"))
    )


# --- wave: article completeness + sentence-level dedup (q323-q324) ------------


@q(
    "q323_article_completeness",
    """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 3 THEN 0 ELSE 1 END AS has_title,
      CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END AS has_date,
      CASE WHEN doc_id % 4 IN (0, 1) THEN 1 ELSE 0 END AS has_author,
      CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 2
        ELSE 0 END AS completeness
    FROM documents
    """,
)
def q323_article_completeness(spark, sf_dir):
    """Article-metadata completeness card (operators/meta.py
    article_completeness): title/date/author presence unified across
    every structured-data channel the engine extracts — og/meta
    (q268), JSON-LD (q269), microdata (q308), the publish-date
    ladder incl. URL permalinks (q309). Fixture strata: fully-bylined
    article (3/3), titled page with a microdata author but no date,
    og-titled page dated only by its /YYYY/MM/ permalink, and a bare
    shell (0/3). Codegen probes on one row; no shuffle."""
    from .operators.meta import article_completeness

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.lit(
            '<html><head><meta property="og:title" content="T">'
            '<meta property="article:published_time" '
            'content="2024-01-03T00:00:00Z">'
            '<meta name="author" content="A"></head>'
            "<body>x</body></html>"))
        .when(m == 1, F.lit(
            "<html><head><title>Doc</title></head><body>"
            '<span itemprop="author">B</span></body></html>'))
        .when(m == 2, F.lit(
            '<html><head><meta property="og:title" content="T2">'
            "</head><body>y</body></html>"))
        .otherwise(F.lit("<html><body>shell</body></html>"))
    )
    url = F.when(
        m == 2, F.concat(F.lit("https://a.example.com/2022/05/p-"), sid)
    ).otherwise(F.concat(F.lit("https://a.example.com/p/"), sid))
    return article_completeness(
        d.select("doc_id", url.alias("url"), html.alias("html"))
    )


@q(
    "q324_sentence_dedup",
    """
    SELECT doc_id,
      CASE WHEN doc_id = 0
        THEN 'Common intro here. Body 0 text.'
        ELSE 'Body ' || CAST(doc_id AS VARCHAR) || ' text.' END
        AS kept_text,
      2 AS n_sentences,
      CASE WHEN doc_id = 0 THEN 2 ELSE 1 END AS n_kept
    FROM documents
    """,
)
def q324_sentence_dedup(spark, sf_dir):
    """Corpus-wide sentence-level dedup, keep-first (operators/
    dedup.py dedup_sentences): every distinct sentence survives only
    in its canonical document (global min (doc, idx) — an
    aggregation, never a corpus sort), documents re-assembled in
    original order. The C4 discipline at linguistic granularity,
    composing the q310 segmentation with the exact-dedup canonical-
    pick machinery. Fixture: every doc opens with one shared intro
    sentence that only doc 0 may keep; the oracle states each
    reassembled text closed-form."""
    from .operators.dedup import dedup_sentences

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    text = F.concat(
        F.lit("Common intro here. Body "), sid, F.lit(" text.")
    )
    return dedup_sentences(d.select("doc_id", text.alias("text")))


# --- wave: unified page-role taxonomy (q325) ----------------------------------


@q(
    "q325_page_roles",
    """
    SELECT 'https://r.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
      CASE doc_id % 5
        WHEN 0 THEN 'redirect-shell'
        WHEN 1 THEN 'amp-variant'
        WHEN 2 THEN 'pagination-continuation'
        WHEN 3 THEN 'noindex'
        ELSE 'content'
      END AS role
    FROM documents
    """,
)
def q325_page_roles(spark, sf_dir):
    """Unified page-role taxonomy capstone (operators/meta.py
    page_roles): one label per page from four audited channels with
    declared precedence — redirect shells (q291) beat AMP variants
    (q319) beat pagination continuations (q317) beat noindex (q267)
    beat content. The single key a scheduler dedups fetches on and a
    corpus builder filters on. The fixture seeds precedence
    violations deliberately (the redirect page ALSO carries the amp
    attribute; the continuation page is ALSO noindexed) so the
    ladder's order is what the oracle checks, not just channel
    presence. Three url-keyed left joins over per-page codegen
    relations."""
    from .operators.meta import page_roles

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 5
    url = F.concat(F.lit("https://r.example.com/p"), sid)
    html = (
        F.when(m == 0, F.lit(
            '<html amp><head><meta http-equiv="refresh" '
            'content="0;url=https://r.example.com/new">'
            "</head><body>moved</body></html>"))
        .when(m == 1, F.concat(
            F.lit('<html amp><head><link rel="canonical" '
                  'href="https://r.example.com/c/'), sid,
            F.lit('"></head><body>a</body></html>')))
        .when(m == 2, F.concat(
            F.lit('<html><head><link rel="prev" '
                  'href="https://r.example.com/p0">'
                  '<meta name="robots" content="noindex"></head>'
                  "<body>page 2</body></html>")))
        .when(m == 3, F.lit(
            '<html><head><meta name="robots" content="noindex">'
            "</head><body>hidden</body></html>"))
        .otherwise(F.lit("<html><body>real content</body></html>"))
    )
    return page_roles(d.select(url.alias("url"), html.alias("html")))


# --- wave: image-sharing similarity + error-leak audit (q326-q327) ------------


@q(
    "q326_host_image_sharing",
    """
    WITH e AS (
      SELECT DISTINCT 'h' || CAST(doc_id % 8 AS VARCHAR) AS src,
             'img' || CAST(doc_id % 16 AS VARCHAR) AS dst
      FROM documents
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
    p AS (
      SELECT a.src AS host_a, b.src AS host_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT p.host_a, p.host_b, p.n_shared, da.d AS n_a, db.d AS n_b,
           CAST(1000000 * p.n_shared // (da.d + db.d - p.n_shared)
                AS BIGINT) AS jaccard_micros
    FROM p
    JOIN deg da ON da.src = p.host_a
    JOIN deg db ON db.src = p.host_b
    """,
)
def q326_host_image_sharing(spark, sf_dir):
    """Host IMAGE-sharing similarity: host_cocitation (q313) applied
    to the (host, image-fingerprint) relation instead of outlink
    edges — hosts serving overlapping image sets are mirrors,
    white-label affiliates or template farms even when their text was
    rewritten AND their outlinks differ. Demonstrates the operator's
    generality: the inverted-index pair join is payload-agnostic
    (dHash values from q105/q277 are the production feed; the fixture
    uses deterministic fingerprint ids). Oracle replays the identical
    algebra."""
    from .operators.linkgraph import host_cocitation

    d = _read(spark, sf_dir, "documents")
    e = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string"))
        .alias("src_host"),
        F.concat(F.lit("img"), (F.col("doc_id") % 16).cast("string"))
        .alias("dst_host"),
    )
    return host_cocitation(e)


@q(
    "q327_error_leaks",
    """
    SELECT doc_id,
      CASE doc_id % 5 WHEN 0 THEN 1 ELSE 0 END AS n_php,
      CASE doc_id % 5 WHEN 1 THEN 2 ELSE 0 END AS n_traceback,
      CASE doc_id % 5 WHEN 2 THEN 2 ELSE 0 END AS n_java,
      CASE doc_id % 5 WHEN 3 THEN 1 ELSE 0 END AS n_sql,
      CASE WHEN doc_id % 5 IN (0, 1, 2, 3) THEN 1 ELSE 0 END AS leaky
    FROM documents
    """,
)
def q327_error_leaks(spark, sf_dir):
    """Server-error leak audit — soft-500 detection (operators/
    textstats.py error_leak_audit): PHP warnings, Python tracebacks,
    JVM stack frames and SQL errors served as page text. The sibling
    of q320 (unrendered templates) and q191 (soft-404): error pages
    return 200 and poison a corpus with path/version strings.
    Fixture strata carry one leak family each (the traceback stratum
    counts both the header and a File line; the Java stratum an
    'at ...' frame plus the thread banner), last stratum clean prose
    with decoy words. Codegen regexp counts, zero shuffle."""
    from .operators.textstats import error_leak_audit

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    text = (
        F.when(m == 0, F.lit(
            "PHP Fatal error: Uncaught Error in /var/www/app.php"))
        .when(m == 1, F.lit(
            'Traceback (most recent call last): File "app.py", line 3'))
        .when(m == 2, F.lit(
            'Exception in thread "main" java.lang.NullPointerException\n'
            "  at com.example.App.run(App.java:42)"))
        .when(m == 3, F.lit(
            "You have an error in your SQL syntax near SELECT"))
        .otherwise(F.lit(
            "a clean page discussing error handling and warnings"))
    )
    return error_leak_audit(d.select("doc_id", text.alias("text")))


# --- wave: change-rate recrawl scheduling (q328) ------------------------------


@q(
    "q328_change_rate_schedule",
    """
    SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
           4 AS n_captures,
           CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END
             AS n_changes,
           CAST(259200 AS BIGINT) AS span_s,
           CASE doc_id % 3 WHEN 0 THEN CAST(1000000 AS BIGINT)
             WHEN 1 THEN CAST(333333 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS lambda_micros_per_day,
           CASE doc_id % 3 WHEN 0 THEN CAST(750000 AS BIGINT)
             WHEN 1 THEN CAST(1500000 AS BIGINT)
             ELSE CAST(3000000 AS BIGINT) END AS revisit_days_micros
    FROM documents
    """,
)
def q328_change_rate_schedule(spark, sf_dir):
    """Change-rate estimation → adaptive revisit scheduling (plans/
    snapshot.py change_rate_schedule; Cho & Garcia-Molina TOIT'03):
    per-url Poisson-rate estimate from the full capture history and a
    proportional revisit period — the observed-behavior side the
    scheduler reconciles against q283's publisher-declared TTLs, and
    the whole-history upgrade of q95's last-delta ranking. Fixture:
    4 daily captures per url with always/once/never-changing hash
    strata; every rate and period stated closed-form in exact integer
    micros. One bounded url-partitioned lag window + one partial-agg
    groupBy."""
    from .plans.snapshot import change_rate_schedule

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    caps = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        m.alias("_m"),
        F.posexplode(
            F.array(*[F.lit(f"2026-01-0{k} 00:00:00") for k in (1, 2, 3, 4)])
        ).alias("_k", "_ts"),
    ).select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        F.when(F.col("_m") == 0, F.concat(F.lit("h"), F.col("_k")))
        .when(F.col("_m") == 1,
              F.when(F.col("_k") < 2, F.lit("h0")).otherwise(F.lit("h1")))
        .otherwise(F.lit("h0")).alias("content_hash"),
    )
    return change_rate_schedule(caps)


# --- wave: BM25F fielded ranking (q329) ---------------------------------------


@q(
    "q329_bm25f_topk",
    """
    WITH d AS (SELECT doc_id, doc_id % 4 AS m FROM documents),
    f AS (
      SELECT doc_id, 'title' AS field,
        CASE m WHEN 0 THEN 'spark shuffle guide'
          WHEN 1 THEN 'cooking tips today'
          WHEN 2 THEN 'spark basics' ELSE 'misc notes' END AS txt,
        2.0 AS w, 0.5 AS b FROM d
      UNION ALL
      SELECT doc_id, 'text',
        CASE m WHEN 0 THEN 'partition notes more'
          WHEN 1 THEN 'shuffle shuffle spark details'
          WHEN 2 THEN 'random words only here'
          ELSE 'spark appears once' END,
        1.0, 0.75 FROM d
    ),
    tok AS (SELECT doc_id, field, w, b,
                   list_filter(string_split(txt, ' '),
                               x -> length(x) > 0) AS t
            FROM f),
    stats AS (SELECT field, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(len(t)) AS BIGINT) AS sumdl
              FROM tok GROUP BY field),
    hits AS (SELECT doc_id, field, w, b, CAST(len(t) AS BIGINT) AS dl,
                    unnest(list_filter(t,
                      x -> x IN ('spark', 'shuffle'))) AS term
             FROM tok),
    tf AS (SELECT doc_id, field, term, any_value(w) AS w,
                  any_value(b) AS b, CAST(count(*) AS BIGINT) AS tf,
                  min(dl) AS dl
           FROM hits GROUP BY doc_id, field, term),
    dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM hits GROUP BY term),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents),
    tft AS (
      SELECT doc_id, term,
             sum((w * CAST(tf AS DOUBLE))
                 / (1.0 - b + b * (CAST(dl AS DOUBLE)
                      / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
               AS tft
      FROM tf JOIN stats USING (field) GROUP BY doc_id, term
    ),
    contrib AS (
      SELECT doc_id,
             CAST(floor(1e6 * ln((ndocs - df + 0.5) / (df + 0.5) + 1.0)
                  * (tft / (1.2 + tft))) AS BIGINT) AS c
      FROM tft JOIN dft USING (term), nd
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micros,
           CAST(count(*) AS BIGINT) AS n_terms_hit
    FROM contrib GROUP BY doc_id
    ORDER BY score_micros DESC, doc_id LIMIT 20
    """,
)
def q329_bm25f_topk(spark, sf_dir):
    """BM25F fielded ranking (operators/retrieval.py bm25f_topk;
    Robertson & Zaragoza simple-BM25F) for query (spark, shuffle)
    over title (w=2, b=0.5) + body (w=1, b=0.75): per-field
    normalized term frequencies SUM into one pseudo-frequency scored
    once per term — a title hit outweighs a body hit without
    double-counting idf, the reason fielded BM25 beats adding two
    BM25s. Fixture strata give title-only, body-heavy, title-partial
    and body-single hits so field weighting visibly reorders the
    ranking vs q114's flat scoring. Oracle replays the full fielded
    pipeline; integer-micros contributions keep per-doc sums
    order-free, top-k plans as TakeOrderedAndProject."""
    from .operators.retrieval import bm25f_topk

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    title = (
        F.when(m == 0, F.lit("spark shuffle guide"))
        .when(m == 1, F.lit("cooking tips today"))
        .when(m == 2, F.lit("spark basics"))
        .otherwise(F.lit("misc notes"))
    )
    body = (
        F.when(m == 0, F.lit("partition notes more"))
        .when(m == 1, F.lit("shuffle shuffle spark details"))
        .when(m == 2, F.lit("random words only here"))
        .otherwise(F.lit("spark appears once"))
    )
    docs = d.select("doc_id", title.alias("title"), body.alias("text"))
    return bm25f_topk(docs, ["spark", "shuffle"])


# --- wave: declared-vs-observed change-rate calibration (q330) ----------------


@q(
    "q330_changefreq_calibration",
    """
    SELECT 'daily' AS changefreq,
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)
             AS n_urls,
           CAST(1000000 AS BIGINT) AS mean_lambda_micros
    UNION ALL
    SELECT 'weekly',
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 1),
           CAST(333333 AS BIGINT)
    UNION ALL
    SELECT 'never',
           (SELECT count(*) FROM documents WHERE doc_id % 3 = 2),
           CAST(0 AS BIGINT)
    """,
)
def q330_changefreq_calibration(spark, sf_dir):
    """Declared-vs-observed change-rate calibration: sitemap
    changefreq declarations (q288's channel) joined against the
    observed Poisson rates from capture history (q328) and rolled up
    per declared class — the data-quality question every adaptive
    scheduler must answer before trusting publisher hints ('do
    daily-declared pages actually change daily?'). Fixture ties each
    declared class to a distinct observed-rate stratum so the
    calibration table is closed-form; in production the interesting
    rows are the miscalibrated ones. One url-keyed join + one
    partial-agg groupBy on the tiny changefreq key."""
    from .plans.snapshot import change_rate_schedule

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    caps = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        m.alias("_m"),
        F.posexplode(
            F.array(*[F.lit(f"2026-01-0{k} 00:00:00") for k in (1, 2, 3, 4)])
        ).alias("_k", "_ts"),
    ).select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        F.when(F.col("_m") == 0, F.concat(F.lit("h"), F.col("_k")))
        .when(F.col("_m") == 1,
              F.when(F.col("_k") < 2, F.lit("h0")).otherwise(F.lit("h1")))
        .otherwise(F.lit("h0")).alias("content_hash"),
    )
    rates = change_rate_schedule(caps)
    declared = d.select(
        F.concat(F.lit("u"), sid).alias("url"),
        F.when(m == 0, "daily").when(m == 1, "weekly")
        .otherwise("never").alias("changefreq"),
    )
    return (
        rates.join(declared, "url")
        .groupBy("changefreq")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.floor(F.avg("lambda_micros_per_day")).cast("bigint")
            .alias("mean_lambda_micros"),
        )
    )


# --- wave: Misra-Gries heavy hitters (q331) -----------------------------------


@q(
    "q331_heavy_hitters",
    """
    WITH t AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                w -> length(w) > 0)) AS item
      FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total_n FROM t),
    c AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM t
          GROUP BY item)
    SELECT item, c.n,
           CAST(1000000 * c.n // total_n AS BIGINT) AS share_micros
    FROM c, tot WHERE 1000000 * c.n > 20000 * total_n
    """,
)
def q331_heavy_hitters(spark, sf_dir):
    """φ-heavy hitters via per-partition Misra-Gries + exact
    verification (operators/sketches.py heavy_hitters_mg; MG'82,
    mergeability per Agarwal PODS'12): all tokens above 2% corpus
    share over the REAL documents token stream. The two-pass shape —
    bounded per-partition summaries (pigeonhole superset guarantee)
    then a broadcast-candidate exact recount — is how heavy hitters
    are actually computed at 10^12 rows where a raw-vocabulary
    groupBy is the bottleneck; the exact second pass is also why the
    oracle is plain closed-form SQL. Deterministic under any
    partitioning by construction (pinned in pytest by comparing
    repartitioned runs)."""
    from .operators.sketches import heavy_hitters_mg

    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        ).alias("token")
    )
    return heavy_hitters_mg(toks, "token", phi_micros=20_000)


# --- wave: non-content families + articleBody cross-check (q332-q333) ---------


@q(
    "q332_noncontent_flags",
    """
    SELECT doc_id,
      CASE doc_id % 5 WHEN 0 THEN 1 ELSE 0 END AS parked,
      CASE doc_id % 5 WHEN 1 THEN 1 ELSE 0 END AS consent_wall,
      CASE doc_id % 5 WHEN 2 THEN 1 ELSE 0 END AS under_construction,
      CASE doc_id % 5 WHEN 3 THEN 1 ELSE 0 END AS paywall_hint,
      CASE WHEN doc_id % 5 IN (0, 1, 2, 3) THEN 1 ELSE 0 END
        AS n_families
    FROM documents
    """,
)
def q332_noncontent_flags(spark, sf_dir):
    """Non-content page-family flags (operators/textstats.py
    noncontent_page_flags): registrar parking landers, cookie-consent
    interstitials, under-construction placeholders, paywall stubs —
    the four remaining systematic junk families after soft-404
    (q191), soft-500 (q327) and template leaks (q320), each a
    production corpus-exclusion rule. Fixture: one family per
    stratum (two phrases of the same family must count ONCE in
    n_families) and clean prose whose lone word 'cookies' must not
    trip the consent pattern. Codegen rlike probes, zero shuffle."""
    from .operators.textstats import noncontent_page_flags

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    text = (
        F.when(m == 0, F.lit(
            "This domain is for sale. Contact the broker today."))
        .when(m == 1, F.lit(
            "We use cookies. Accept all cookies to proceed."))
        .when(m == 2, F.lit("Site under construction, coming soon."))
        .when(m == 3, F.lit("Subscribe to continue reading this story."))
        .otherwise(F.lit(
            "ordinary prose about baking biscuits and cookies recipes"))
    )
    return noncontent_page_flags(d.select("doc_id", text.alias("text")))


@q(
    "q333_articlebody_crosscheck",
    """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 1 THEN 0 ELSE 1 END AS has_articlebody,
      CASE doc_id % 3
        WHEN 0 THEN CAST(length(
          'full article body text with every sentence present here')
          AS INT)
        WHEN 2 THEN CAST(length('teaser only') AS INT)
        ELSE NULL END AS body_len,
      CASE doc_id % 3
        WHEN 0 THEN CAST(length('full article body text') AS INT)
        WHEN 1 THEN CAST(length('standalone extracted text') AS INT)
        ELSE CAST(length(
          'teaser only plus navigation junk appended') AS INT)
      END AS extracted_len,
      CASE doc_id % 3
        WHEN 0 THEN CAST(1000000 * length('full article body text')
          // length(
          'full article body text with every sentence present here')
          AS BIGINT)
        WHEN 2 THEN CAST(1000000 *
          length('teaser only plus navigation junk appended')
          // length('teaser only') AS BIGINT)
        ELSE NULL END AS len_ratio_micros
    FROM documents
    """,
)
def q333_articlebody_crosscheck(spark, sf_dir):
    """JSON-LD articleBody extraction cross-check (operators/meta.py
    jsonld_article_body): publishers who embed the full article text
    in NewsArticle markup supply a per-page reference for the DOM
    extractor — ratio ≪ 1 means over-stripping, ratio ≫ 1 means the
    markup serves a teaser (paywall stub, composing with q332). The
    fixture covers both directions plus the no-markup NULL row, and
    the oracle states lengths/ratios via length() of the same
    literals — no magic numbers. Codegen regexp pull + exact integer
    division."""
    from .operators.meta import jsonld_article_body

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    body = (
        F.when(m == 0, F.lit(
            "full article body text with every sentence present here"))
        .when(m == 2, F.lit("teaser only"))
    )
    html = F.when(
        m != 1,
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type":"NewsArticle","articleBody":"'),
            body, F.lit('"}</script>'),
        ),
    ).otherwise(F.lit("<html><body>no jsonld</body></html>"))
    text = (
        F.when(m == 0, F.lit("full article body text"))
        .when(m == 1, F.lit("standalone extracted text"))
        .otherwise(F.lit("teaser only plus navigation junk appended"))
    )
    return jsonld_article_body(
        d.select("doc_id", html.alias("html"), text.alias("text"))
    )


# --- wave: gzipped sitemap ingestion (q334) -----------------------------------

# deterministic fixture blobs (gzip mtime=0, level 6): a 2-loc gzipped
# sitemap, and a corrupt payload wearing the gzip magic
_GZ_SITEMAP_B64 = (
    "H4sIAAAAAAAAA7Oxr8jNUShLLSrOzM+zVTLUM1Cyt7MpLcopTi0B03Y2OfnJdhkl"
    "JQXFVvr66VV6qRWJuQU5qXrJ+bn6iTb6IFkbfbBCQqqTUFTrQy0BAIJJ2h2CAAAA"
)
_GZ_CORRUPT_B64 = "H4sAY29ycnVwdGVkLXBheWxvYWQ="


@q(
    "q334_gzip_sitemap_locs",
    """
    SELECT doc_id, 'https://gz.example.com/a' AS url
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'https://gz.example.com/b'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'https://plain.example.com/c'
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q334_gzip_sitemap_locs(spark, sf_dir):
    """Gzipped sitemap ingestion (sources/sitemap.py gunzip_text →
    sitemap_locs): real sitemap fleets serve sitemap.xml.gz (the
    sitemaps.org spec allows gzip; Common Crawl seeds arrive
    compressed), so the decompression column is the missing first
    step before the existing codegen <loc> parse. Tolerant-reader
    matrix proven by the oracle: gzipped payloads decode (2 locs),
    plain XML passes through unchanged (1 loc), corrupt bytes
    wearing the gzip magic yield NULL and emit nothing. Blobs enter
    via unbase64 literals — bit-deterministic (gzip mtime=0). Plan:
    Scan → ArrowEvalPython → codegen explode, zero shuffle."""
    from .sources.sitemap import gunzip_text, sitemap_locs

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    blob = (
        F.when(m == 0, F.unbase64(F.lit(_GZ_SITEMAP_B64)))
        .when(m == 1, F.encode(F.lit(
            '<?xml version="1.0"?><urlset><url>'
            "<loc>https://plain.example.com/c</loc></url></urlset>"),
            "UTF-8"))
        .otherwise(F.unbase64(F.lit(_GZ_CORRUPT_B64)))
    )
    sitemaps = d.select(
        "doc_id", gunzip_text(blob).alias("sitemap_xml")
    )
    return sitemap_locs(sitemaps, keep_cols=("doc_id",))


# --- wave: bow-tie decomposition (q335) ---------------------------------------


@q(
    "q335_bowtie",
    """
    WITH b AS (SELECT CAST(doc_id AS VARCHAR) AS g FROM documents)
    SELECT 'c0@' || g AS node, 'core' AS component,
           0 AS fwd_dist, 0 AS bwd_dist FROM b
    UNION ALL SELECT 'c1@' || g, 'core', 1, 2 FROM b
    UNION ALL SELECT 'c2@' || g, 'core', 2, 1 FROM b
    UNION ALL SELECT 'i0@' || g, 'in', NULL, 1 FROM b
    UNION ALL SELECT 'o0@' || g, 'out', 3, NULL FROM b
    UNION ALL SELECT 'd0@' || g, 'disconnected', NULL, NULL FROM b
    UNION ALL SELECT 'd1@' || g, 'disconnected', NULL, NULL FROM b
    """,
)
def q335_bowtie(spark, sf_dir):
    """Bow-tie decomposition of the link graph relative to a seed
    set (operators/linkgraph.py bowtie_decomposition; Broder WWW'00
    — the canonical web macro-structure): CORE / IN / OUT /
    DISCONNECTED with forward and backward hop distances. Pure
    composition of the audited level-synchronous BFS run over the
    edges and their reversal — no new traversal code. Fixture: every
    doc spawns a namespaced 7-node bow-tie (3-cycle core, an
    in-tentacle, an out-tentacle, a detached pair); every label and
    distance is stated closed-form."""
    from .operators.linkgraph import bowtie_decomposition

    d = _read(spark, sf_dir, "documents")
    g = F.col("doc_id").cast("string")

    def n(prefix):
        return F.concat(F.lit(prefix + "@"), g)

    pairs = [("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
             ("i0", "c0"), ("c2", "o0"), ("d0", "d1")]
    edges = d.select(
        F.explode(F.array(*[
            F.struct(n(a).alias("src"), n(b).alias("dst"))
            for a, b in pairs
        ])).alias("e")
    ).select("e.src", "e.dst")
    seeds = d.select(n("c0").alias("node"))
    return bowtie_decomposition(edges, seeds, k=3)


# --- wave: NFKC compatibility normalization (q337) ----------------------------


@q(
    "q337_nfkc_normalize",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'file A42'
        WHEN 1 THEN '1⁄2 x2 VIII'
        WHEN 2 THEN 'café'
        ELSE 'plain ascii'
      END AS nfkc_text,
      CASE doc_id % 4 WHEN 3 THEN 0 ELSE 1 END AS nfkc_changed
    FROM documents
    """,
)
def q337_nfkc_normalize(spark, sf_dir):
    """Unicode NFKC compatibility normalization (functions/
    normalize.py with_nfkc_text): ligatures decompose, fullwidth
    forms fold, fractions/superscripts/roman numerals reduce — the
    tokenizer-facing variant (HF tokenizer pipelines default to
    NFKC) next to q101's canonical-only NFC, which keeps dedup keys
    lossless. Fixture strata: ligature+fullwidth, numeric compat
    forms (½ → 1⁄2 with U+2044), a decomposed e+COMBINING ACUTE that
    NFKC also canonically folds, and unchanged ASCII; outputs stated
    as literals (stdlib unicodedata tables ARE the spec). Arrow-
    batched, zero shuffle."""
    from .functions.normalize import with_nfkc_text

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    text = (
        F.when(m == 0, F.lit("ﬁle Ａ４２"))
        .when(m == 1, F.lit("½ x² Ⅷ"))
        .when(m == 2, F.lit("cafe\u0301"))  # decomposed e+COMBINING ACUTE
        .otherwise(F.lit("plain ascii"))
    )
    return with_nfkc_text(d.select("doc_id", text.alias("text"))).select(
        "doc_id", "nfkc_text",
        F.col("nfkc_changed").cast("int").alias("nfkc_changed"),
    )


# --- wave: one-plan page-curation mart (q336) ---------------------------------


@q(
    "q336_curation_mart",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'content' WHEN 1 THEN 'amp-variant'
        WHEN 2 THEN 'pagination-continuation' ELSE 'noindex'
      END AS role,
      CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END
        AS completeness,
      CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS template_leaky,
      CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS noncontent_families,
      CASE doc_id % 4 WHEN 0 THEN 1 ELSE 0 END AS admit
    FROM documents
    """,
)
def q336_curation_mart(spark, sf_dir):
    """ONE-PLAN page-curation mart: page role (q325) × article
    completeness (q323) × template-leak flag (q320) × non-content
    families (q332) joined into the single wide row a corpus builder
    filters on, plus the composed ``admit`` verdict (content role,
    no leaks, no nuisance family). The point is the PLAN: four
    operator families over one page fixture collapse into one
    Catalyst plan whose only joins are the url/doc-keyed per-page
    relations — proving the audited operators compose without
    re-scanning the corpus per signal. Fixture strata: admissible
    article, AMP variant wearing a consent wall, noindexed paginated
    continuation leaking template syntax, bare noindex shell."""
    from .operators.meta import article_completeness, page_roles
    from .operators.textstats import (
        noncontent_page_flags,
        template_leak_audit,
    )

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    url = F.concat(F.lit("https://m.example.com/p"), sid)
    html = (
        F.when(m == 0, F.lit(
            '<html><head><title>T</title>'
            '<meta property="article:published_time" '
            'content="2024-03-05T00:00:00Z">'
            '<meta name="author" content="A"></head>'
            "<body>real article</body></html>"))
        .when(m == 1, F.concat(
            F.lit('<html amp><head><title>T</title>'
                  '<link rel="canonical" href="https://m.example.com/c/'),
            sid, F.lit('"></head><body>amp</body></html>')))
        .when(m == 2, F.lit(
            '<html><head><link rel="prev" href="https://m.example.com/p0">'
            '<meta name="robots" content="noindex"></head>'
            "<body>page 2</body></html>"))
        .otherwise(F.lit(
            '<html><head><meta name="robots" content="noindex"></head>'
            "<body>hidden</body></html>"))
    )
    text = (
        F.when(m == 1, F.lit("Accept all cookies to continue"))
        .when(m == 2, F.lit("Welcome {{ user.name }} to page two"))
        .otherwise(F.lit("ordinary prose body"))
    )
    pages = d.select(
        "doc_id", url.alias("url"), html.alias("html"), text.alias("text")
    )
    roles = page_roles(pages).withColumnRenamed("url", "_u")
    comp = article_completeness(pages).select("doc_id", "completeness")
    tpl = template_leak_audit(pages).select(
        "doc_id", F.col("leaky").alias("template_leaky")
    )
    non = noncontent_page_flags(pages).select(
        "doc_id", F.col("n_families").alias("noncontent_families")
    )
    base = pages.select("doc_id", F.col("url").alias("_u"))
    mart = (
        base.join(roles, "_u")
        .join(comp, "doc_id")
        .join(tpl, "doc_id")
        .join(non, "doc_id")
    )
    return mart.select(
        "doc_id", "role", "completeness", "template_leaky",
        "noncontent_families",
        F.when(
            (F.col("role") == "content")
            & (F.col("template_leaky") == 0)
            & (F.col("noncontent_families") == 0), 1
        ).otherwise(0).cast("int").alias("admit"),
    )


# --- wave: de-hyphenation repair (q338) ---------------------------------------


@q(
    "q338_dehyphenate",
    """
    SELECT doc_id,
      CASE doc_id % 3
        WHEN 0 THEN 'the extraction of data'
        WHEN 1 THEN 'state-of-the-art systems work'
        ELSE 'plain single line'
      END AS repaired
    FROM documents
    """,
)
def q338_dehyphenate(spark, sf_dir):
    """Line-break de-hyphenation for extracted PDF/columnar text
    (functions/normalize.py dehyphenate_col — the pdfminer/Grobid
    postprocessing convention): hyphen+newline between lowercase
    letters joins the word, remaining newlines become soft-wrap
    spaces, mid-line hyphens (state-of-the-art) are untouched.
    Skipping this splits every column-edge word into two junk tokens
    and corrupts TF/LM/dedup downstream of the q93 layout parse.
    Fixture: a hyphen-broken word across a wrapped line, a compound
    that must survive, a line-break-free control; outputs closed-
    form. Three codegen regexp ops."""
    from .functions.normalize import dehyphenate_col

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.lit("the extrac-\n  tion of\ndata"))
        .when(m == 1, F.lit("state-of-the-art systems\nwork"))
        .otherwise(F.lit("plain single line"))
    )
    return d.select(
        "doc_id",
        dehyphenate_col(text).alias("repaired"),
    )


# --- wave: chunk-stitch roundtrip integrity (q339) ----------------------------


@q(
    "q339_chunk_stitch",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                             w -> length(w) > 0)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(1 + ceil(greatest(n - 8, 0) / 6.0) AS INT) AS n_chunks,
           0 AS n_overlap_mismatches,
           1 AS roundtrip_ok
    FROM t WHERE n > 0
    """,
)
def q339_chunk_stitch(spark, sf_dir):
    """Chunk-stitch ROUNDTRIP integrity (operators/chunking.py
    stitch_chunks — the inverse of q116's chunk_documents):
    reassemble every real document from its overlapping (8,6)
    token windows, verify each overlap equals the previous chunk's
    tail, and check stitched ≡ the whitespace-normalized original.
    The auditability contract for windowed pipelines (RAG stores,
    sliding-window scoring): the oracle states chunk counts from the
    token-count formula and asserts zero mismatches and a perfect
    roundtrip over the REAL corpus text at any SF. One bounded
    groupBy(doc) + a codegen aggregate fold — no windows, no
    Python."""
    from .operators.chunking import chunk_documents, stitch_chunks

    d = _read(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk=8, stride=6)
    st = stitch_chunks(ch, chunk=8, stride=6)
    norm = d.select(
        "doc_id",
        F.array_join(
            F.filter(F.split("text", " "), lambda w: F.length(w) > 0),
            " ",
        ).alias("_norm"),
    )
    return st.join(norm, "doc_id").select(
        "doc_id", "n_chunks", "n_overlap_mismatches",
        F.when(F.col("stitched_text") == F.col("_norm"), 1).otherwise(0)
        .cast("int").alias("roundtrip_ok"),
    )


# --- wave: percent-encoding normalization (q340) ------------------------------


@q(
    "q340_percent_normalize",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'https://a.example.com/~user/' || CAST(doc_id AS VARCHAR)
        WHEN 1 THEN 'https://a.example.com/p?q=a%2Fb%3Fc'
        WHEN 2 THEN 'https://a.example.com/caf%C3%A9/'
                 || CAST(doc_id AS VARCHAR)
        ELSE 'https://a.example.com/plain/' || CAST(doc_id AS VARCHAR)
      END AS normalized
    FROM documents
    """,
)
def q340_percent_normalize(spark, sf_dir):
    """RFC 3986 §6.2.2 percent-encoding normalization (functions/
    urlnorm.py percent_normalize): unreserved escapes decode
    (%7E→~, %41→A), reserved escapes survive with UPPERCASED hex
    (%2f→%2F — decoding them would change the URL's meaning),
    non-ASCII escapes survive uppercased (%c3%a9→%C3%A9). The layer
    canonical_url (q41) doesn't touch, composed before it in the
    q316 intake ladder. Fixture strata exercise all three rules plus
    a no-escape control; outputs closed-form. Arrow-batched UDF
    (per-escape case transforms aren't expressible in Java regex
    replacement), extractor plan shape."""
    from .functions.urlnorm import percent_normalize

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    url = (
        F.when(m == 0, F.concat(
            F.lit("https://a.example.com/%7Euser/"), sid))
        .when(m == 1, F.lit("https://a.example.com/p?q=a%2fb%3fc"))
        .when(m == 2, F.concat(
            F.lit("https://a.example.com/caf%c3%a9/"), sid))
        .otherwise(F.concat(F.lit("https://a.example.com/plain/"), sid))
    )
    return d.select(
        "doc_id", percent_normalize(url).alias("normalized")
    )


# --- wave: JSONL schema-drift audit (q341) ------------------------------------


@q(
    "q341_json_schema_audit",
    """
    WITH d AS (SELECT doc_id, doc_id % 2 AS batch_id, doc_id % 4 AS m
               FROM documents),
    cnt AS (SELECT batch_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN m IN (0, 1, 2) THEN 1 ELSE 0 END)
                        AS BIGINT) AS a_present,
                   CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS b_present,
                   CAST(sum(CASE WHEN m = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS corrupt
            FROM d GROUP BY batch_id)
    SELECT batch_id, 'a' AS field, n_rows, a_present AS n_present,
           CAST(1000000 * a_present // n_rows AS BIGINT)
             AS present_micros
    FROM cnt
    UNION ALL
    SELECT batch_id, 'b', n_rows, b_present,
           CAST(1000000 * b_present // n_rows AS BIGINT) FROM cnt
    UNION ALL
    SELECT batch_id, '_corrupt', n_rows, corrupt,
           CAST(1000000 * corrupt // n_rows AS BIGINT) FROM cnt
    """,
)
def q341_json_schema_audit(spark, sf_dir):
    """JSONL schema-drift audit (sources/jsonl.py json_schema_audit):
    per ingest batch, the presence rate of every expected field plus
    a _corrupt row counting unparseable lines — the monitoring
    relation that catches producer regressions (a field silently
    dropping from 90% to 40% presence) while every job still
    'succeeds'. Fixture strata: complete record, record missing
    field b, record with an extra undeclared field (ignored by
    PERMISSIVE parse), raw-garbage line; two interleaved batches so
    the per-batch rates differ and are stated closed-form. JVM
    Jackson parse + one (batch, field) partial agg."""
    from .sources.jsonl import json_schema_audit

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    line = (
        F.when(m == 0, F.concat(
            F.lit('{"a": '), sid, F.lit(', "b": "x"}')))
        .when(m == 1, F.concat(F.lit('{"a": '), sid, F.lit("}")))
        .when(m == 2, F.concat(
            F.lit('{"a": '), sid, F.lit(', "c": true}')))
        .otherwise(F.lit("not json at all"))
    )
    rows = d.select(
        (F.col("doc_id") % 2).alias("batch_id"), line.alias("line")
    )
    return json_schema_audit(rows, "line", "a long, b string")


# --- wave: citations + math routing (q342-q343) -------------------------------


@q(
    "q342_citation_ids",
    """
    SELECT doc_id, 'doi' AS kind,
           '10.1145/3299869.' || CAST(doc_id AS VARCHAR) AS ident
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'arxiv', '2403.0' || CAST(1000 + doc_id % 9000
             AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'pmid', CAST(7000000 + doc_id AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q342_citation_ids(spark, sf_dir):
    """Scholarly-identifier extraction (operators/textstats.py
    citation_ids): DOIs with trailing-punctuation strip, arXiv new-
    form ids, PMIDs — the peS2o-style academic-corpus router and the
    citation-level decontamination key (a paraphrased abstract still
    cites the same DOI). Fixture: a DOI ending a sentence (the
    trailing period must be stripped), an arXiv+PMID pair on one
    document, and a citation-free stratum emitting nothing; all
    closed-form. Codegen regexp channels + one flatten/explode."""
    from .operators.textstats import citation_ids

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.concat(
            F.lit("As shown in doi:10.1145/3299869."), sid,
            F.lit(". More text follows.")))
        .when(m == 1, F.concat(
            F.lit("See arXiv:2403.0"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            F.lit(" and PMID: "),
            (F.lit(7000000) + F.col("doc_id")).cast("string"),
            F.lit(" for details.")))
        .otherwise(F.lit("no citations in this prose at all"))
    )
    return citation_ids(d.select("doc_id", text.alias("text")))


@q(
    "q343_math_signals",
    """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 2 ELSE 0 END AS n_display,
      CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS n_inline,
      CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS n_environments,
      CASE doc_id % 4 WHEN 2 THEN 6 ELSE 0 END AS n_math_symbols,
      CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 1 ELSE 0 END AS is_mathy
    FROM documents
    """,
)
def q343_math_signals(spark, sf_dir):
    """Math-content detection for corpus routing (operators/
    textstats.py math_content_signals; the Minerva/DeepSeekMath
    recipe — math docs get boosted sampling and must bypass prose
    quality gates): display blocks ($$…$$ and \\[…\\]), inline
    \\(…\\), LaTeX environments, Unicode math-symbol density with
    the ≥5 threshold. Fixture strata: two display blocks, an
    inline+align pair, symbol-dense prose with no LaTeX, plain text
    whose lone '$5' price must not count. Codegen regexp counts."""
    from .operators.textstats import math_content_signals

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    text = (
        F.when(m == 0, F.lit(
            "Consider $$x^2+y^2=r^2$$ and also \\[e^{i\\pi}=-1\\] here."))
        .when(m == 1, F.lit(
            "Inline \\(a+b\\) and \\begin{align} x &= y \\end{align}"))
        .when(m == 2, F.lit("sums ∑ and ∫ with ∂ √ ≤ ≥ bounds"))
        .otherwise(F.lit("the price is $5 and that is all"))
    )
    return math_content_signals(d.select("doc_id", text.alias("text")))


# --- wave: checksum identifiers + Clean-param (q344-q345) ---------------------


@q(
    "q344_checksum_ids",
    """
    SELECT doc_id, 'orcid' AS kind,
           '0000-0002-1825-0097' AS ident, 1 AS valid
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'orcid', '0000-0002-1825-0096', 0
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'isbn13', '978-0-306-40615-7', 1
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'isbn13', '9780306406158', 0
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q344_checksum_ids(spark, sf_dir):
    """Checksum-validated identifier extraction (operators/
    textstats.py checksum_ids): ORCID (ISO 7064 mod 11-2) and
    ISBN-13 (EAN weighted mod 10), with BOTH check digits computed
    in pure codegen aggregate folds over the digit arrays — validity
    turns the pattern-matching false-positive channel into a
    measurable valid=0 row instead of corpus noise. Fixture pairs a
    known-valid and an off-by-one identifier per kind (dashed ISBN
    included); every row closed-form."""
    from .operators.textstats import checksum_ids

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.lit(
            "authors 0000-0002-1825-0097 and 0000-0002-1825-0096 listed"))
        .when(m == 1, F.lit(
            "cite 978-0-306-40615-7 but beware 9780306406158 typo"))
        .otherwise(F.lit("no identifiers here, just prose"))
    )
    return checksum_ids(d.select("doc_id", text.alias("text")))


@q(
    "q345_clean_param_rules",
    """
    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR) AS host,
           p.param AS param,
           CASE doc_id % 2 WHEN 0 THEN '/forum/' ELSE '' END
             AS path_prefix
    FROM documents,
         (SELECT unnest(['ref', 'sid']) AS param) AS p
    WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'h' || CAST(doc_id % 6 AS VARCHAR), 'utm_campaign', ''
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def q345_clean_param_rules(spark, sf_dir):
    """Clean-param directive extraction (sources/robots.py
    clean_param_rules; the Yandex robots.txt extension — the only
    publisher-DECLARED 'these parameters don't change content'
    channel): the third leg of parameter hygiene beside the static
    blocklist (q80) and the data-driven miner (q280), all three
    feeding one frontier strip-list. Fixture: a path-scoped
    two-param directive and an unscoped single-param directive amid
    decoy Disallow lines; closed-form per host. Per-line codegen,
    directive-sized explode."""
    from .sources.robots import clean_param_rules

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 2
    txt = (
        F.when(m == 0, F.lit(
            "User-agent: *\nDisallow: /tmp\n"
            "Clean-param: ref&sid /forum/\n"))
        .otherwise(F.lit(
            "User-agent: *\nclean-param: utm_campaign\n"
            "Disallow: /private\n"))
    )
    robots = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 6).cast("string"))
        .alias("host"),
        txt.alias("robots_txt"),
    )
    return clean_param_rules(robots)


# --- wave: social handles + MIME sniff audit (q346-q347) ----------------------


@q(
    "q346_social_profiles",
    """
    SELECT doc_id, 'github' AS platform,
           'org' || CAST(doc_id % 9 AS VARCHAR) AS handle
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'x', 'handle' || CAST(doc_id % 9 AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'linkedin', 'person-' || CAST(doc_id % 9 AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'mastodon', '@user' || CAST(doc_id % 9 AS VARCHAR)
             || '@fosstodon.org'
    FROM documents WHERE doc_id % 3 = 1
    """,
)
def q346_social_profiles(spark, sf_dir):
    """Social/developer profile-link extraction (operators/meta.py
    social_profile_links): GitHub, X/Twitter (reserved paths like
    /intent/ excluded), LinkedIn /in/ profiles, Mastodon
    @user@host — the author-identity channel whose cross-page handle
    reuse exposes content farms sharing one identity across
    'independent' sites. Fixture: github+x pair (the x link written
    UPPERCASE to prove case folding, plus an /intent/ decoy that
    must not match), linkedin+mastodon pair, linkless stratum.
    Codegen channels, distinct per (id, platform, handle)."""
    from .operators.meta import social_profile_links

    d = _read(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 9).cast("string")
    m = F.col("doc_id") % 3
    html = (
        F.when(m == 0, F.concat(
            F.lit('<a href="https://github.com/org'), g,
            F.lit('/repo">gh</a> <a href="https://x.com/HANDLE'), g,
            F.lit('">x</a> <a href="https://x.com/intent/tweet">no</a>')))
        .when(m == 1, F.concat(
            F.lit('<a href="https://www.linkedin.com/in/person-'), g,
            F.lit('">li</a> follow @user'), g,
            F.lit("@fosstodon.org for updates")))
        .otherwise(F.lit("<p>no profiles here</p>"))
    )
    return social_profile_links(d.select("doc_id", html.alias("html")))


@q(
    "q347_mime_mismatch",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'text/html' WHEN 1 THEN 'text/html'
        WHEN 2 THEN 'image/png' ELSE 'application/pdf'
      END AS declared,
      CASE doc_id % 4
        WHEN 0 THEN 'text/html' WHEN 1 THEN 'application/pdf'
        WHEN 2 THEN 'image/png' ELSE 'application/octet-stream'
      END AS sniffed,
      CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS mismatch
    FROM documents
    """,
)
def q347_mime_mismatch(spark, sf_dir):
    """Declared-vs-sniffed MIME audit (operators/multimodal.py
    mime_sniff_mismatch): magic-prefix sniffing in pure codegen
    against the WARC-declared content type (q289's channel) — a
    text/html response opening with %PDF routes to the wrong
    extractor and produces silent garbage; polyglots are a crawler
    attack surface. Fixture: honest HTML (with charset parameter
    that must strip), PDF smuggled as text/html, honest PNG
    (unbase64 magic bytes), and unknown bytes under a pdf claim
    which must NOT count as mismatch (no evidence). Zero Python —
    the deep imagex/mediax sniffers stay the escalation path."""
    from .operators.multimodal import mime_sniff_mismatch

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, F.encode(F.lit("  <html><body>x</body></html>"),
                                "UTF-8"))
        .when(m == 1, F.encode(F.lit("%PDF-1.7 smuggled"), "UTF-8"))
        .when(m == 2, F.unbase64(F.lit("iVBORw0KGgoAAAANSUhEUg==")))
        .otherwise(F.encode(F.lit("randomopaquebytes"), "UTF-8"))
    )
    declared = (
        F.when(m == 0, F.lit("text/html; charset=utf-8"))
        .when(m == 1, F.lit("text/html"))
        .when(m == 2, F.lit("image/png"))
        .otherwise(F.lit("application/pdf"))
    )
    return mime_sniff_mismatch(
        d.select("doc_id", declared.alias("content_type"),
                 payload.alias("payload"))
    )


# --- wave: semantic regions + hidden text (q348-q349) -------------------------


@q(
    "q348_semantic_census",
    """
    SELECT doc_id,
      CASE doc_id % 4 WHEN 0 THEN 1 ELSE 0 END AS has_main,
      CASE WHEN doc_id % 4 IN (1, 2) THEN 1 ELSE 0 END AS has_article,
      CASE doc_id % 4 WHEN 1 THEN 3 WHEN 2 THEN 1 ELSE 0 END
        AS n_articles,
      CASE doc_id % 4 WHEN 0 THEN 1 ELSE 0 END AS has_nav,
      CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS has_aside,
      CASE doc_id % 4 WHEN 3 THEN 1 ELSE 0 END AS has_header,
      CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS has_footer,
      CASE doc_id % 4 WHEN 0 THEN 'anchored' WHEN 1 THEN 'feed'
        WHEN 2 THEN 'anchored' ELSE 'heuristic' END AS extraction_tier
    FROM documents
    """,
)
def q348_semantic_census(spark, sf_dir):
    """HTML5 semantic-region census and extraction-strategy routing
    (operators/meta.py semantic_region_census): <main>/single-
    <article> pages are 'anchored' (take the subtree, skip scoring),
    multi-article pages are 'feed' (listing — per-article units),
    div-soup is 'heuristic' (q44/q87's full boilerplate scoring).
    Routing by markup tier is how production pipelines confine the
    expensive scoring path to pages that need it. Fixture: all four
    tiers with region flags stated closed-form."""
    from .operators.meta import semantic_region_census

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.lit(
            "<body><nav>menu</nav><main><p>prose</p></main></body>"))
        .when(m == 1, F.lit(
            "<body><article>a</article><article>b</article>"
            "<article>c</article></body>"))
        .when(m == 2, F.lit(
            "<body><article>solo</article><aside>ads</aside>"
            "<footer>f</footer></body>"))
        .otherwise(F.lit(
            '<body><header>h</header><div class="content">soup'
            "</div></body>"))
    )
    return semantic_region_census(d.select("doc_id", html.alias("html")))


@q(
    "q349_hidden_text",
    """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
        AS n_hidden_elements,
      CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 249 ELSE 0 END
        AS n_hidden_chars,
      CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS cloaking_suspect
    FROM documents
    """,
)
def q349_hidden_text(spark, sf_dir):
    """Hidden-text audit (operators/meta.py hidden_text_audit):
    inline display:none / visibility:hidden / font-size:0 elements
    and their immediate text — the extraction-correctness signal
    (renderers hide what extractors keep) and the classic SEO
    cloaking detector (≥200 invisible chars). Fixture: a two-element
    hidden pair (display + visibility channels, 24 trimmed chars), a
    keyword-stuffed 249-char invisible div tripping the suspect
    flag, and a clean page; counts closed-form. Codegen regexp +
    aggregate length fold."""
    from .operators.meta import hidden_text_audit

    d = _read(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    html = (
        F.when(m == 0, F.lit(
            '<div style="display:none">hidden keywords here</div>'
            '<span style="visibility:hidden">more</span>'))
        .when(m == 1, F.lit(
            '<div style="font-size:0;color:red">' + "spam " * 50
            + "</div>"))
        .otherwise(F.lit('<div style="color:blue">visible text</div>'))
    )
    return hidden_text_audit(d.select("doc_id", html.alias("html")))


# --- wave: robots drift + budget apportionment (q350-q351) --------------------


@q(
    "q350_robots_drift",
    """
    SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
      CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS n_added,
      CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 0 END
        AS n_removed,
      CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS tightened,
      CASE WHEN doc_id % 3 IN (1, 2) THEN 1 ELSE 0 END AS loosened
    FROM documents
    """,
)
def q350_robots_drift(spark, sf_dir):
    """Robots-policy drift between crawl snapshots (sources/
    robots.py robots_policy_drift): Disallow-rule set diff per host —
    added rules TIGHTEN policy (frontier re-filter + q304-style
    retro-exclusion), removed rules LOOSEN it (URL space unlocked
    for the next tick). Fixture: unchanged hosts, a swap host (one
    added + one removed — both flags fire), and a host dropping all
    rules. Two host-keyed anti-joins + one rollup; closed-form."""
    from .sources.robots import robots_policy_drift

    d = _read(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), F.col("doc_id").cast("string"))
    m = F.col("doc_id") % 3
    old = d.select(
        host.alias("host"),
        F.lit("User-agent: *\nDisallow: /a\nDisallow: /b\n")
        .alias("robots_txt"),
    )
    new = d.select(
        host.alias("host"),
        F.when(m == 0, F.lit(
            "User-agent: *\nDisallow: /a\nDisallow: /b\n"))
        .when(m == 1, F.lit(
            "User-agent: *\nDisallow: /a\nDisallow: /c\n"))
        .otherwise(F.lit("User-agent: *\n")).alias("robots_txt"),
    )
    return robots_policy_drift(old, new)


@q(
    "q351_budget_apportionment",
    """
    SELECT * FROM (VALUES
      ('h0', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, CAST(2 AS BIGINT)),
      ('h1', 2, 3, 1, 4),
      ('h2', 3, 5, 0, 5),
      ('h3', 4, 7, 0, 7),
      ('h4', 5, 9, 0, 9),
      ('h5', 6, 10, 1, 11),
      ('h6', 7, 12, 1, 13),
      ('h7', 8, 14, 1, 15),
      ('h8', 9, 16, 0, 16),
      ('h9', 10, 18, 0, 18)
    ) AS t(host, weight, quota_floor, extra, budget)
    """,
)
def q351_budget_apportionment(spark, sf_dir):
    """Integer crawl-budget apportionment by the largest-remainder
    (Hamilton) method (plans/frontier.py apportion_budget): 100
    fetch slots split across 10 hosts proportionally to weight
    (e.g. summed q328 change rates), floors + the 5 leftover slots
    to the largest fractional remainders — allocations sum EXACTLY
    to the budget, which naive rounding cannot guarantee. Ranking is
    distributed order statistics (256 remainder range buckets,
    bucket-partitioned row_number, broadcast prefix-sum offsets) —
    no global sort of the host dim. Every quota/remainder/award is
    exact integer arithmetic; the oracle states the full table."""
    from .plans.frontier import apportion_budget

    d = _read(spark, sf_dir, "documents")
    g = F.col("doc_id") % 10
    weights = d.select(
        F.concat(F.lit("h"), g.cast("string")).alias("host"),
        (g + 1).cast("long").alias("weight"),
    ).distinct()
    return apportion_budget(weights, total_budget=100)


# --- wave: rendezvous hashing + dup-pair explanation (q352-q353) --------------


@q(
    "q352_rendezvous_resize",
    """
    WITH k AS (SELECT 'k' || CAST(doc_id AS VARCHAR) AS key
               FROM documents),
    b AS (SELECT key, arg_max(s, md5(key || '|' || s)) AS shard_before
          FROM k, unnest(['s0', 's1', 's2', 's3']) AS t(s)
          GROUP BY key),
    a AS (SELECT key, arg_max(s, md5(key || '|' || s)) AS shard_after
          FROM k, unnest(['s0', 's1', 's2', 's3', 's4']) AS t(s)
          GROUP BY key)
    SELECT b.key, shard_before, shard_after,
           CASE WHEN shard_before != shard_after THEN 1 ELSE 0 END
             AS moved
    FROM b JOIN a USING (key)
    """,
)
def q352_rendezvous_resize(spark, sf_dir):
    """Rendezvous/HRW hashing under a shard-count resize (operators/
    mixing.py rendezvous_assign; Thaler & Ravishankar 1996): md5
    argmax per (key, shard), replayed EXACTLY by the oracle's
    arg_max — the consistent-hashing scheme with cross-engine
    portability (ring/jump hashing need float/LCG loops no SQL
    replays). The resize invariant the fixture exercises 4→5 shards:
    a key moves ONLY to the new shard (expected 1/5 of keys), so
    sharded state (q106 dedup indexes, frontier stores) rebalances
    incrementally instead of mod-N's near-total reshuffle. Per-row
    codegen array_max; no explode, no shuffle."""
    from .operators.mixing import rendezvous_assign

    d = _read(spark, sf_dir, "documents")
    keys = d.select(
        F.concat(F.lit("k"), F.col("doc_id").cast("string")).alias("key")
    )
    before = rendezvous_assign(keys, "key", ["s0", "s1", "s2", "s3"],
                               out_col="shard_before")
    both = rendezvous_assign(before, "key",
                             ["s0", "s1", "s2", "s3", "s4"],
                             out_col="shard_after")
    return both.select(
        "key", "shard_before", "shard_after",
        F.when(F.col("shard_before") != F.col("shard_after"), 1)
        .otherwise(0).cast("int").alias("moved"),
    )


@q(
    "q353_pair_diff_spans",
    """
    WITH d AS (SELECT doc_id, doc_id % 3 AS m,
                      CAST(length(CAST(doc_id AS VARCHAR)) AS INT)
                        AS idlen
               FROM documents)
    SELECT doc_id AS a_id, doc_id AS b_id,
      CAST(4 + idlen AS INT) AS lcp,
      CASE m WHEN 0 THEN 4 ELSE 0 END AS lcs,
      CASE m WHEN 0 THEN 4 ELSE 0 END AS mid_a,
      CASE m WHEN 0 THEN 2 WHEN 2 THEN 5 ELSE 0 END AS mid_b,
      CASE m WHEN 1 THEN 1 ELSE 0 END AS same
    FROM d
    """,
)
def q353_pair_diff_spans(spark, sf_dir):
    """Near-dup PAIR EXPLANATION (operators/dedup.py
    pair_diff_spans): longest common prefix/suffix and the differing
    middles per candidate pair — near-dup detectors (q18/q21/q140)
    say THAT two documents match, this says WHERE they differ (the
    timestamp, the byline, the ad block), which is what threshold
    review and template-hole mining consume. Fixture strata: changed
    middle (lcp/lcs/mids all nonzero), identical pair (suffix capped
    to 0 after the full-prefix match — the documented
    lcp+lcs ≤ shorter rule), and pure extension (mid_a 0, mid_b 5).
    Codegen zip_with + array_position on candidate pairs only."""
    from .operators.dedup import pair_diff_spans

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 3
    ta = (
        F.when(m == 0, F.concat(F.lit("AAAA"), sid, F.lit("MMMMZZZZ")))
        .when(m == 1, F.concat(F.lit("SAME"), sid))
        .otherwise(F.concat(F.lit("PPPP"), sid))
    )
    tb = (
        F.when(m == 0, F.concat(F.lit("AAAA"), sid, F.lit("QQZZZZ")))
        .when(m == 1, F.concat(F.lit("SAME"), sid))
        .otherwise(F.concat(F.lit("PPPP"), sid, F.lit("EXTRA")))
    )
    docs_a = d.select("doc_id", ta.alias("text"))
    docs_b = d.select("doc_id", tb.alias("text"))
    # the two sides enter one docs relation under even/odd ids so the
    # operator's single-table contract applies unchanged
    union_docs = docs_a.select(
        (F.col("doc_id") * 2).alias("doc_id"), "text"
    ).unionByName(
        docs_b.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text")
    )
    pair_ids = d.select(
        (F.col("doc_id") * 2).alias("a_id"),
        (F.col("doc_id") * 2 + 1).alias("b_id"),
    )
    out = pair_diff_spans(pair_ids, union_docs)
    return out.select(
        F.expr("a_id div 2").alias("a_id"),
        F.expr("b_id div 2").alias("b_id"),
        "lcp", "lcs", "mid_a", "mid_b", "same",
    )


# --- wave: canonical dedup-key capstone (q354) --------------------------------


@q(
    "q354_canonical_dedup_key",
    """
    WITH k AS (
      SELECT doc_id,
             'the café extraction report ' || CAST(doc_id // 3 AS VARCHAR)
               AS dedup_key
      FROM documents
    )
    SELECT doc_id, dedup_key, md5(dedup_key) AS dedup_md5,
           (SELECT count(DISTINCT dedup_key) FROM k)
             AS n_distinct_keys
    FROM k
    """,
)
def q354_canonical_dedup_key(spark, sf_dir):
    """Canonical dedup-key capstone (functions/normalize.py
    canonical_dedup_key — dehyphenate ∘ control-strip/whitespace ∘
    NFC ∘ lowercase): three byte-DIFFERENT renderings of one
    document — hyphen-wrapped with a BOM, decomposed-accent with
    doubled spaces, case-mapped clean — collapse to ONE key per
    doc-group, proven by the oracle stating the single canonical
    string (precomposed é, single spaces) and the corpus-wide
    distinct-key count. NFKC deliberately excluded (lossy; q337 is
    tokenizer-side). The md5 column is the q16 groupBy key at
    scale."""
    from .functions.normalize import canonical_dedup_key

    d = _read(spark, sf_dir, "documents")
    g = F.expr("doc_id div 3").cast("string")
    m = F.col("doc_id") % 3
    text = (
        F.when(m == 0, F.concat(
            F.lit("﻿the café extrac-\ntion report "), g))
        .when(m == 1, F.concat(
            # decomposed e+COMBINING ACUTE, written explicitly
            F.lit("The  cafe\u0301  extraction report "), g))
        .otherwise(F.concat(
            F.lit("THE CAFÉ EXTRACTION REPORT "), g))
    )
    keyed = canonical_dedup_key(d.select("doc_id", text.alias("text")))
    n_distinct = keyed.agg(
        F.countDistinct("dedup_key").cast("bigint")
        .alias("n_distinct_keys")
    )
    return keyed.select("doc_id", "dedup_key", "dedup_md5").crossJoin(
        F.broadcast(n_distinct)
    )


# --- wave: domain cap + image-text pairs (q355-q356) --------------------------


@q(
    "q355_domain_cap",
    """
    WITH h AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 < 8 THEN 'big.example.com'
               ELSE 'small' || CAST(doc_id % 10 AS VARCHAR)
                 || '.example.org' END AS registrable
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, registrable,
             row_number() OVER (PARTITION BY registrable
                                ORDER BY md5(CAST(doc_id AS VARCHAR)))
               AS rk
      FROM h
    ),
    kept AS (SELECT registrable, count(*) AS n_kept
             FROM ranked WHERE rk <= 25 GROUP BY registrable)
    SELECT h.registrable,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(k.n_kept) AS BIGINT) AS n_kept,
           CAST(count(*) - min(k.n_kept) AS BIGINT) AS n_capped
    FROM h JOIN kept k ON k.registrable = h.registrable
    GROUP BY h.registrable
    """,
)
def q355_domain_cap(spark, sf_dir):
    """Per-REGISTRABLE document cap — the FineWeb/C4 'limit docs per
    domain' recipe step: one mega-site must not dominate the corpus,
    so each registrable domain (q306's grouping key) keeps at most K
    documents by deterministic md5 rank (q104's exact-k machinery —
    a domain-PARTITIONED window, never global). Fixture: one
    big domain holding 80% of docs (capped hard at 25) beside small
    domains under the cap (kept whole); the rollup states kept vs
    capped per domain and the oracle replays the identical md5
    ranking. The capped share is the datasheet number this emits."""
    from .operators.mixing import stratified_topk_sample

    d = _read(spark, sf_dir, "documents")
    reg = F.when(
        F.col("doc_id") % 10 < 8, F.lit("big.example.com")
    ).otherwise(
        F.concat(F.lit("small"), (F.col("doc_id") % 10).cast("string"),
                 F.lit(".example.org"))
    )
    docs = d.select("doc_id", reg.alias("registrable"))
    kept = stratified_topk_sample(
        docs, stratum_col="registrable", id_col="doc_id", k=25
    )
    n_kept = kept.groupBy("registrable").agg(
        F.count("*").cast("bigint").alias("n_kept")
    )
    return (
        docs.groupBy("registrable")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(n_kept, "registrable")
        .select(
            "registrable", "n_docs", "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("bigint")
            .alias("n_capped"),
        )
    )


@q(
    "q356_image_text_pairs",
    """
    WITH b AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS sid,
                      doc_id % 4 AS m FROM documents)
    SELECT doc_id,
      CASE m
        WHEN 0 THEN 'https://cdn.example.com/og' || sid || '.jpg'
        WHEN 1 THEN 'https://cdn.example.com/tw' || sid || '.jpg'
        ELSE '/img/inline' || sid || '.png'
      END AS image_url,
      CASE m
        WHEN 0 THEN 'OG caption ' || sid
        WHEN 1 THEN 'Doc title ' || sid
        ELSE 'inline alt text ' || sid
      END AS caption,
      CASE m WHEN 0 THEN 'og' WHEN 1 THEN 'twitter' ELSE 'img_alt'
      END AS channel
    FROM b WHERE m IN (0, 1, 2)
    """,
)
def q356_image_text_pairs(spark, sf_dir):
    """IMAGE-TEXT pair candidates — the LAION-style multimodal
    harvest relation: ``(doc_id, image_url, caption, channel)`` with
    a declared caption-quality ladder: ``og:image`` + ``og:
    description`` (editorial caption, best) > ``twitter:image`` +
    page title > first content ``<img>`` with non-empty alt text.
    Pages with none emit nothing. The pair relation feeds CLIP-style
    training and joins q105/q277's fingerprints for image-side
    dedup. Fixture: one stratum per channel (the og stratum ALSO
    carries a decoy inline img that must lose; the alt stratum's
    empty-alt sibling must be skipped); closed-form. Codegen
    meta_tags + img regexp channels, per-row precedence."""
    from .operators.meta import meta_tags

    d = _read(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    html = (
        F.when(m == 0, F.concat(
            F.lit('<meta property="og:image" '
                  'content="https://cdn.example.com/og'), sid,
            F.lit('.jpg"><meta property="og:description" '
                  'content="OG caption '), sid,
            F.lit('"><img src="/img/decoy.png" alt="decoy">')))
        .when(m == 1, F.concat(
            F.lit('<title>Doc title '), sid,
            F.lit('</title><meta name="twitter:image" '
                  'content="https://cdn.example.com/tw'), sid,
            F.lit('.jpg">')))
        .when(m == 2, F.concat(
            F.lit('<img src="/img/skip.png" alt="">'
                  '<img src="/img/inline'), sid,
            F.lit('.png" alt="inline alt text '), sid, F.lit('">')))
        .otherwise(F.lit("<p>no imagery</p>"))
    )
    pages = d.select("doc_id", html.alias("html"))
    h = F.col("html")
    tags = meta_tags(pages)
    metas = tags.groupBy("doc_id").agg(
        F.max(F.when(F.col("key") == "og:image", F.col("content")))
        .alias("_og_img"),
        F.max(F.when(F.col("key") == "og:description", F.col("content")))
        .alias("_og_desc"),
        F.max(F.when(F.col("key") == "twitter:image", F.col("content")))
        .alias("_tw_img"),
    )
    title = F.regexp_extract(h, r"<title[^>]*>\s*([^<]*?)\s*</title>", 1)
    first_img = F.try_element_at(
        F.filter(
            F.transform(
                F.regexp_extract_all(h, F.lit(r"(?s)<img\s[^>]*>"), 0),
                lambda t: F.struct(
                    F.regexp_extract(t, r'src\s*=\s*"([^"]*)"', 1)
                    .alias("src"),
                    F.regexp_extract(t, r'alt\s*=\s*"([^"]*)"', 1)
                    .alias("alt"),
                ),
            ),
            lambda s: (s["src"] != "") & (s["alt"] != ""),
        ),
        F.lit(1),
    )
    base = pages.select(
        "doc_id", title.alias("_title"), first_img.alias("_fi")
    ).join(metas, "doc_id", "left")
    og_ok = (F.col("_og_img").isNotNull() & (F.col("_og_img") != "")
             & F.col("_og_desc").isNotNull() & (F.col("_og_desc") != ""))
    tw_ok = (F.col("_tw_img").isNotNull() & (F.col("_tw_img") != "")
             & (F.col("_title") != ""))
    alt_ok = F.col("_fi").isNotNull()
    return (
        base.select(
            "doc_id",
            F.when(og_ok, F.col("_og_img"))
            .when(tw_ok, F.col("_tw_img"))
            .when(alt_ok, F.col("_fi")["src"]).alias("image_url"),
            F.when(og_ok, F.col("_og_desc"))
            .when(tw_ok, F.col("_title"))
            .when(alt_ok, F.col("_fi")["alt"]).alias("caption"),
            F.when(og_ok, "og").when(tw_ok, "twitter")
            .when(alt_ok, "img_alt").alias("channel"),
        )
        .filter(F.col("channel").isNotNull())
    )
