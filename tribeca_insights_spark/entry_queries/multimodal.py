"""Image/AV metadata, dHash near-dup, image-text pairs, MIME audit.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


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

    from ..imagex import make_png
    from ..operators.multimodal import media_metadata

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

    from ..mediax import make_mp4, make_wav
    from ..operators.multimodal import av_metadata

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

    from ..imagex import encode_png, resize_nearest
    from ..operators.dedup import dhash_near_pairs
    from ..operators.multimodal import image_dhash

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
    from ..operators.meta import image_sources

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
    from ..operators.linkgraph import host_cocitation

    d = _read(spark, sf_dir, "documents")
    e = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 8).cast("string"))
        .alias("src_host"),
        F.concat(F.lit("img"), (F.col("doc_id") % 16).cast("string"))
        .alias("dst_host"),
    )
    return host_cocitation(e)


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
    from ..operators.multimodal import mime_sniff_mismatch

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
    from ..operators.meta import meta_tags

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
