"""Link-graph analytics: PageRank family, cores, traversal, centralities.

Driver-contract queries (split from the monolithic entry_queries.py in r5);
each function is registered into the shared ``QUERIES``/``ORACLE`` dicts by
the ``@q`` decorator from ``_shared`` at import time.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403


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
    from ..operators.linkgraph import pagerank_micros

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
    from ..operators.linkgraph import bfs_min_dist

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
    from ..operators.linkgraph import hits_micros

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
    from ..operators.linkgraph import triangle_counts

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
    from ..operators.linkgraph import label_propagation

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
    from ..operators.linkgraph import link_reciprocity

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
    from ..operators.linkgraph import resource_allocation

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
    from ..operators.linkgraph import degree_assortativity

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
    from ..operators.linkgraph import pagerank_micros

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
    from ..operators.linkgraph import pagerank_micros, trustrank_micros

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
    from ..operators.linkgraph import kcore_bounded

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
    from ..operators.linkgraph import hyperball_estimates

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
    from ..operators.linkgraph import neighborhood_function

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
    from ..operators.linkgraph import harmonic_centrality_r2

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
    from ..operators.linkgraph import personalized_pagerank_micros

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
    from ..operators.linkgraph import deterministic_walks

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
    from ..operators.linkgraph import indegree_gini

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
    from ..operators.linkgraph import pagerank_micros

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
    from ..operators.linkgraph import host_cocitation

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
    from ..operators.linkgraph import bowtie_decomposition

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
