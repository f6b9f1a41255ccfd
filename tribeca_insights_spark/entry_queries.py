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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction+TF over synthesized pages at sf0.001 —
    pandas-UDF parse → native tokenize → salted corpus TF."""
    docs = documents_as_pages(spark, "/root/testdata/sf0.001")
    ex = extract_pages(docs)
    return tfops.corpus_tf(ex, n_salts=8).limit(1000)
