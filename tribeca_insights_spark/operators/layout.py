"""Data-layout keys: Z-order (Morton) interleaving for multi-column
clustering.

A lakehouse table scanned by BOTH ``host`` and ``length`` predicates
can't be sorted by either alone without wrecking locality for the other.
Z-ORDER (Morton order — bit-interleave the two keys) keeps rows close in
the linear file order whenever they are close in EITHER dimension, so
min/max file statistics prune scans on both predicates (Delta/Iceberg's
``ZORDER BY`` / ``sort_order`` strategies; Morton 1966). The key itself
is pure integer arithmetic — shifts, masks, adds — so it computes as
whole-stage codegen on the scan path and is bit-identical in any engine.

Scale shape: keygen is a narrow projection (zero shuffle). The write
that USES the key does one range-partitioned sort — exactly the shuffle
a clustered layout costs anywhere; after that, every bi-dimensional
scan prunes instead of reading the corpus. At 10^12 rows the win is the
difference between reading files whose (host-bucket, length-bucket)
rectangles intersect the predicate and reading everything.

No reference counterpart (the reference writes flat per-page files:
tribeca_insights/exporters/*.py); this is lakehouse layout infrastructure
the north-rule's Iceberg framing implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton-interleave two non-negative int columns (low ``bits`` bits
    each) into one BIGINT: bit ``i`` of ``a`` lands at position ``2i``,
    bit ``i`` of ``b`` at ``2i+1``. Pure codegen — a folded sum of
    shift/mask terms, no UDF, no shuffle."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = F.col(col_a).cast("long") if isinstance(col_a, str) else col_a
    b = F.col(col_b).cast("long") if isinstance(col_b, str) else col_b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> DataFrame:
    """(id columns..., a, b, zkey, file_idx): the clustered-write plan —
    ``zkey`` is the Morton key, ``file_idx`` buckets the key range into
    ``n_files`` equal-width slices (the range-partition a writer would
    sort into). Equal-WIDTH, not equal-count: the file boundaries are
    closed-form (key div width), so the oracle can restate them exactly
    and an incremental append lands rows in the same file rectangles as
    the first write — no quantile re-estimation drift between runs. Skewed
    occupancy is visible (and acceptable) in the report; a production
    writer that wants equal-count files swaps in range partitioning by
    sampled quantiles at write time."""
    z = zorder_key(col_a, col_b, bits)
    width = (1 << (2 * bits)) // n_files + 1
    return df.select("*", z.alias("zkey")).select(
        "*", F.expr(f"zkey div {width}L").alias("file_idx")
    )


def contiguous_ids(
    df: DataFrame,
    key_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Dense contiguous 0..N−1 id assignment WITHOUT a global sort —
    the scale-correct replacement for both ``monotonically_increasing_
    id`` (not contiguous, partition-layout-dependent) and a global
    ``row_number()`` window (single-partition WindowExec, the
    scale-killer this repo bans). Training pipelines need exactly this
    when materializing doc/sample ids for sharded tensors.

    Two-stage bucketed ranking, all deterministic in VALUES (never in
    partition layout): bucket = first hex nibble(s) of md5(key); ranks
    within a bucket come from a bucket-PARTITIONED window ordered by
    (md5, key); bucket offsets are an exclusive prefix sum over the
    (≤ ``buckets``-row) count table, computed window-free by the
    sorted-array/aggregate trick (skew_report's pattern) and broadcast
    back. Global id = bucket offset + within-bucket rank − 1; the
    result is EXACTLY row_number over (md5(key), key) order — which is
    what the oracle states — but the biggest sort anywhere is one
    bucket (1/``buckets`` of the corpus; raise ``buckets`` with corpus
    size, e.g. 4096 via 3 nibbles at 10^12 rows).

    ``key_col`` should be unique (url, content hash); duplicate keys
    get distinct ids deterministically (md5 ties break by key, then
    arbitrary-but-stable? no — equal keys are equal in both orderings,
    so their relative ids are NOT pinned; dedup first if that
    matters). Output: original columns + ``gid``.
    """
    if buckets not in (16, 256, 4096):
        raise ValueError("buckets must be 16, 256, or 4096 (hex nibbles)")
    nibbles = {16: 1, 256: 2, 4096: 3}[buckets]
    h = F.md5(F.col(key_col).cast("string"))
    d = df.withColumn("_h", h).withColumn(
        "_b", F.substring("_h", 1, nibbles)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_b").orderBy("_h", key_col)
    ranked = d.withColumn("_r", F.row_number().over(w))
    counts = d.groupBy("_b").agg(F.count("*").alias("_n"))
    # exclusive prefix sum over <= `buckets` rows, window-free
    arr = counts.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_b"), F.col("_n")))
        ).alias("a")
    )
    offsets = arr.select(
        F.posexplode(
            F.transform(
                "a",
                lambda s, i: F.struct(
                    s["_b"].alias("_b"),
                    F.aggregate(
                        F.slice("a", F.lit(1), i),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x["_n"],
                    ).alias("_off"),
                ),
            )
        ).alias("_pos", "s")
    ).select(F.col("s._b").alias("_b"), F.col("s._off").alias("_off"))
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn("gid", F.col("_off") + F.col("_r") - 1)
        .drop("_h", "_b", "_r", "_off")
    )


def global_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
    bucket_width: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Global ascending dense 1..N rank of ``score_col`` WITHOUT a
    global sort — :func:`contiguous_ids`' two-stage trick generalized
    to an arbitrary integer sort key: bucket = ``score div
    bucket_width`` (value-determined range buckets), rank within a
    bucket from a bucket-PARTITIONED window ordered by (score, id),
    bucket offsets from a window-free prefix sum over the bucket-count
    table (sorted-array/aggregate codegen, broadcast back). Result ≡
    ``row_number() OVER (ORDER BY score, id)`` — what the oracle
    states — with the biggest sort anywhere being one bucket.

    Pick ``bucket_width`` so the bucket COUNT stays in the thousands
    (the prefix-sum array is O(buckets²) in codegen) and no single
    bucket dwarfs the rest (for Zipf-ish scores, width the buckets in
    the log domain upstream). Ties rank deterministically by id.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if rank_name in ("_b", "_r", "_off"):
        raise ValueError(f"rank_name {rank_name!r} collides with an "
                         "internal column")
    s = F.col(score_col).cast("bigint")
    d = df.withColumn("_b", F.expr(
        f"CAST({score_col} AS BIGINT) div {bucket_width}"
    ))
    from pyspark.sql import Window

    w = Window.partitionBy("_b").orderBy(s.asc(), F.col(id_col).asc())
    ranked = d.withColumn("_r", F.row_number().over(w))
    counts = d.groupBy("_b").agg(F.count("*").alias("_n"))
    arr = counts.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_b"), F.col("_n")))
        ).alias("a")
    )
    offsets = arr.select(
        F.posexplode(
            F.transform(
                "a",
                lambda st, i: F.struct(
                    st["_b"].alias("_b"),
                    F.aggregate(
                        F.slice("a", F.lit(1), i),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x["_n"],
                    ).alias("_off"),
                ),
            )
        ).alias("_pos", "s")
    ).select(F.col("s._b").alias("_b"), F.col("s._off").alias("_off"))
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn(rank_name, F.col("_off") + F.col("_r"))
        .drop("_b", "_r", "_off")
    )


def borda_fusion(
    df: DataFrame,
    signal_cols: list,
    id_col: str,
    bucket_widths: list,
) -> DataFrame:
    """Borda-count rank fusion of multiple quality signals — the
    scale-robust ensemble when signals live on incomparable scales
    (chars vs perplexity vs link count): convert each signal to its
    global rank, sum the ranks. Rank fusion needs no calibration, is
    outlier-immune, and is the standard first ensemble in retrieval
    and data-selection stacks (cf. reciprocal-rank fusion).

    Each signal's rank comes from :func:`global_rank` (bucketed
    two-stage — NEVER a global window); higher signal = better, so
    ranks ascend with the signal and ``borda`` sums them (max = best).
    Output: (id, rank_<sig>…, borda). All integers, oracle-exact.
    """
    if len(signal_cols) != len(bucket_widths):
        raise ValueError("one bucket_width per signal required")
    out = df
    for c, wdt in zip(signal_cols, bucket_widths):
        out = global_rank(out, c, id_col, wdt, rank_name=f"rank_{c}")
    borda = None
    for c in signal_cols:
        r = F.col(f"rank_{c}")
        borda = r if borda is None else borda + r
    return out.select(
        F.col(id_col),
        *[F.col(f"rank_{c}") for c in signal_cols],
        borda.cast("bigint").alias("borda"),
    )


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_hash_col: str,
    id_col: str,
    cum_name: str = "cum",
) -> DataFrame:
    """Global EXCLUSIVE running sum of ``value_col`` in
    (``order_hash_col``, ``id_col``) order — :func:`global_rank`'s
    bucketed two-stage trick extended from ranks to SUMS, because a
    global cumulative sum is otherwise a single-partition WindowExec
    (the banned scale-killer) and ``monotonically_increasing_id`` +
    driver arithmetic is layout-dependent. The primitive behind
    token-budget shard boundaries, byte-offset assignment in packed
    files, and quota waterlines.

    ``order_hash_col`` must be a hex-string ordering key (md5-style —
    contiguous_ids' convention); buckets are its first nibble, so the
    biggest sort AND the biggest running sum anywhere is one bucket.
    Per-bucket value totals prefix-sum window-free (sorted-array
    aggregate codegen, ≤16 rows) and broadcast back; the within-bucket
    running sum is a bucket-partitioned window. Result ≡
    ``sum(value) OVER (ORDER BY hash, id ROWS UNBOUNDED PRECEDING) −
    value`` — what the oracle states.
    """
    from pyspark.sql import Window

    d = df.withColumn("_b", F.substring(F.col(order_hash_col), 1, 1))
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col(order_hash_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("bigint")
    ranked = d.withColumn("_run", F.sum(v).over(w) - v)
    sums = d.groupBy("_b").agg(F.sum(v).alias("_n"))
    arr = sums.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_b"), F.col("_n")))
        ).alias("a")
    )
    offsets = arr.select(
        F.posexplode(
            F.transform(
                "a",
                lambda st, i: F.struct(
                    st["_b"].alias("_b"),
                    F.aggregate(
                        F.slice("a", F.lit(1), i),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x["_n"],
                    ).alias("_off"),
                ),
            )
        ).alias("_pos", "s")
    ).select(F.col("s._b").alias("_b"), F.col("s._off").alias("_off"))
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn(cum_name, F.col("_off") + F.col("_run"))
        .drop("_b", "_run", "_off")
    )


def token_shard_manifest(
    docs: DataFrame,
    tokens_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget training-shard manifest: documents stream in a
    deterministic md5 order; each shard takes consecutive documents
    until its token budget fills; the manifest (one row per shard:
    id range, doc count, token count) is the release artifact next to
    the datasheet (q207). A doc's shard is a pure function of the
    EXCLUSIVE global token cumsum: ``shard_id = cum_before div
    budget`` — the standard offset-bucketing rule (a doc straddling a
    boundary belongs to the shard it started in; shards may overfill
    by at most one document, never underfill).

    The cumsum comes from :func:`global_cumsum` (bucketed two-stage —
    no global window anywhere); the manifest is one partial-agg
    groupBy(shard_id). Output: (shard_id, n_docs, n_tokens, first_id,
    last_id) where first/last are in stream order (min/max of the md5
    hash mapped back to ids via min/max struct).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = docs.withColumn(
        "_h", F.md5(F.col(id_col).cast("string"))
    )
    c = global_cumsum(d, tokens_col, "_h", id_col, cum_name="_cum")
    shards = c.withColumn(
        "shard_id", F.expr("_cum div " + str(int(budget)))
    )
    return (
        shards.groupBy("shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col(tokens_col).cast("bigint")).alias("n_tokens"),
            F.min(F.struct("_h", F.col(id_col).alias("_i")))["_i"]
            .alias("first_id"),
            F.max(F.struct("_h", F.col(id_col).alias("_i")))["_i"]
            .alias("last_id"),
        )
        .select("shard_id", "n_docs", "n_tokens", "first_id", "last_id")
    )


def rrf_fusion(
    df: DataFrame,
    signal_cols: list,
    id_col: str,
    bucket_widths: list,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of quality signals (Cormack et al. 2009)
    — :func:`borda_fusion`'s robust sibling: RRF weights the TOP of
    each ranking (score = Σ 1/(k + rank_from_top)) where Borda weights
    uniformly, so one signal's confident head can't be washed out by
    two mediocre mid-ranks; k=60 is the canonical damping.

    Ranks come from :func:`global_rank` (bucketed two-stage, never a
    global window) and are converted to from-the-top ranks via the
    group size (one broadcast count). Each reciprocal term is floored
    to micros INDEPENDENTLY, so the sum is exact-integer and
    engine-order-free: ``rrf_micros = Σ_s floor(1e6 / (k + r_top_s))``.
    Output: (id, rank_<sig>… [ascending ranks], rrf_micros).
    """
    if len(signal_cols) != len(bucket_widths):
        raise ValueError("one bucket_width per signal required")
    out = df
    for c, w in zip(signal_cols, bucket_widths):
        out = global_rank(out, c, id_col, w, rank_name=f"rank_{c}")
    n = df.agg(F.count("*").cast("bigint").alias("_n")).withColumn(
        "_one", F.lit(1)
    )
    out = out.withColumn("_one", F.lit(1)).join(F.broadcast(n), "_one")
    rrf = None
    for c in signal_cols:
        # higher signal = better: from-top rank = n - rank_asc + 1
        term = F.expr(
            f"1000000 div ({int(k_rrf)} + _n - rank_{c} + 1)"
        )
        rrf = term if rrf is None else rrf + term
    return out.select(
        F.col(id_col),
        *[F.col(f"rank_{c}") for c in signal_cols],
        rrf.cast("bigint").alias("rrf_micros"),
    )
