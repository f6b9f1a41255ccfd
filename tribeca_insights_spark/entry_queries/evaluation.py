"""Classifier training/eval, calibration, drift metrics, dedup eval.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


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
    from ..operators.classifier import hashed_linear_score

    return hashed_linear_score(_read(spark, sf_dir, "documents"))


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
    from ..operators.classifier import train_hashed_classifier

    d = _read(spark, sf_dir, "documents")
    return train_hashed_classifier(
        d,
        label=F.when(F.col("n_chars") >= 200, F.lit(1)).otherwise(
            F.lit(-1)
        ),
        n_buckets=64,
        rounds=2,
    )


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
    from ..operators.stats import grouped_ols

    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint").alias("x"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"),
    )
    return grouped_ols(ev, ["event_type"], "x", "y")


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
    from ..operators.classifier import hashed_linear_score, roc_points

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
    from ..operators.classifier import calibration_bins

    d = _read(spark, sf_dir, "documents")
    return calibration_bins(
        d,
        label=F.when(F.col("n_chars") >= 200, F.lit(1)).otherwise(
            F.lit(0)
        ),
        n_bins=10,
    )


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
    from ..operators.stats import signal_correlations

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
    from ..operators.stats import categorical_nmi

    return categorical_nmi(
        _read(spark, sf_dir, "documents"), "lang", "source"
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
    from ..operators.stats import boolean_gate_agreement

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
    from ..operators.stats import psi_drift

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
    from ..operators.textstats import gate_marginal_attribution

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
    from ..operators.retrieval import ranking_metrics

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
    from ..operators.stats import psi_drift

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
    from ..operators.tables import table_column_profile, table_rows

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
    from ..operators.classifier import isotonic_calibration

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
