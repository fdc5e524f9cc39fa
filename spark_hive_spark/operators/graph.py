"""Graph analytics over relational data (SURVEY.md §2B extension):
weighted PageRank and triangle counting / clustering coefficients on
the nation-level trade graph. Connected components (the other classic
iterative graph kernel) lives in
`operators/dedup.py:connected_components` where the dedup pipeline
consumes it.

Scale split: the expensive part of graph analytics on warehouse data
is GRAPH CONSTRUCTION — here a 4-way join pipeline over the fact
table that shuffles lineitem exactly once — while the iteration runs
on the contracted graph (|nations|² edges max), which is broadcast
material. That construction/iteration asymmetry is the common shape
at 100 TB: build edges with one shuffle-heavy declarative pipeline,
checkpoint the small edge list, iterate cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

PR_ITERS = 5
PR_DAMPING = 0.85
PR_N = 25  # nations are the vertex set


def _pagerank_oracle() -> str:
    """Unrolled recursive-free PageRank: DuckDB disallows aggregates
    in a recursive CTE's step term, so the fixed iteration count is
    expanded as chained CTEs — same arithmetic as the Spark loop."""
    base = f"CAST(1.0 AS DOUBLE) / {PR_N}"
    teleport = f"(1.0 - {PR_DAMPING}) / {PR_N}"
    ctes = [
        """
        edges AS (
            SELECT sn.n_nationkey AS src, cn.n_nationkey AS dst,
                   count(*) AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            GROUP BY sn.n_nationkey, cn.n_nationkey
        )""",
        """
        frac AS (
            SELECT src, dst,
                   CAST(w AS DOUBLE)
                   / sum(w) OVER (PARTITION BY src) AS f
            FROM edges
        )""",
        f"""
        pr0 AS (
            SELECT n_nationkey AS node, {base} AS rank FROM nation
        )""",
    ]
    for i in range(PR_ITERS):
        # dangling nations (no out-edges — e.g. no local supplier ever
        # ships) redistribute their rank mass uniformly each round,
        # keeping the ranks a probability vector at every data scale
        ctes.append(
            f"""
        dang{i} AS (
            SELECT coalesce(sum(p.rank), 0.0) AS m
            FROM pr{i} p
            WHERE p.node NOT IN (SELECT src FROM frac)
        )"""
        )
        ctes.append(
            f"""
        pr{i + 1} AS (
            SELECT n.n_nationkey AS node,
                   {teleport} + {PR_DAMPING}
                       * (coalesce(sum(p.rank * e.f), 0.0)
                          + (SELECT m FROM dang{i}) / {PR_N}) AS rank
            FROM nation n
            LEFT JOIN frac e ON e.dst = n.n_nationkey
            LEFT JOIN pr{i} p ON p.node = e.src
            GROUP BY n.n_nationkey
        )"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
        SELECT nn.n_name, round(p.rank, 6) AS pagerank
        FROM pr{PR_ITERS} p JOIN nation nn ON p.node = nn.n_nationkey
        ORDER BY pagerank DESC, nn.n_name
        """
    )


@register(
    "pagerank_nation_trade",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative"),
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the supplier-nation → customer-nation
    trade graph (edge weight = number of lineitems shipped on that
    trade lane), damping 0.85, 5 fixed iterations from a uniform
    prior, with standard dangling-mass redistribution: a nation with
    no out-edges (no local supplier ships anything — common at small
    SF) spreads its rank uniformly each round, so the ranks stay a
    probability vector at every data scale (invariant-tested).

    The edge list comes from one declarative join pipeline (lineitem
    shuffles once; the dimension joins broadcast), is checkpointed
    eagerly, and the rank loop then runs entirely on the contracted
    25-node graph — each iteration a broadcast join + tiny aggregate,
    so iteration cost is independent of fact-table volume. Final
    ranks round to 6dp (repo float policy: iterative double sums are
    order-sensitive in the last bits; 6dp is far above the 1e-15
    noise floor and below any real rank gap)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    frac = edges.select(
        "src",
        "dst",
        (
            F.col("w").cast("double") / F.sum("w").over(W.partitionBy("src"))
        ).alias("f"),
    ).localCheckpoint(eager=True)

    nodes = nation.select(F.col("n_nationkey").alias("node"))
    danglers = nodes.join(
        frac.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).localCheckpoint(eager=True)
    rank = nodes.withColumn("rank", F.lit(1.0 / PR_N))
    teleport = (1.0 - PR_DAMPING) / PR_N
    for _ in range(PR_ITERS):
        contrib = (
            F.broadcast(rank)
            .join(frac, rank.node == frac.src)
            .select("dst", (F.col("rank") * F.col("f")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        # 1-row dangling-mass scalar, attached via broadcast cross
        # join (never a collect)
        dang = rank.join(F.broadcast(danglers), "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        rank = (
            nodes.join(F.broadcast(contrib), nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(PR_DAMPING)
                    * (
                        F.coalesce("in_rank", F.lit(0.0))
                        + F.col("m") / F.lit(float(PR_N))
                    )
                ).alias("rank"),
            )
            # rank feeds both next-round branches (contrib + dangling
            # scalar); without a checkpoint the lineage doubles per
            # iteration — 2^5 plan copies, measured 1.7 s -> 6.1 s at
            # sf0.1. 25 rows: the checkpoint is free.
            .localCheckpoint(eager=True)
        )
    return (
        rank.join(F.broadcast(nation), rank.node == nation.n_nationkey)
        .select("n_name", F.round("rank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "n_name")
    )


_TRI_EDGE_SQL = """
        SELECT DISTINCT least(sn.n_nationkey, cn.n_nationkey) AS u,
                        greatest(sn.n_nationkey, cn.n_nationkey) AS v
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE sn.n_nationkey <> cn.n_nationkey
"""


@register(
    "graph_triangle_clustering",
    oracle=f"""
        WITH edges AS ({_TRI_EDGE_SQL}),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        node_tri AS (
            SELECT node, count(*) AS n_triangles
            FROM (SELECT a AS node FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
            GROUP BY node
        ),
        deg AS (
            SELECT node, count(*) AS degree
            FROM (SELECT u AS node, v FROM edges
                  UNION ALL SELECT v, u FROM edges)
            GROUP BY node
        )
        SELECT n.n_name,
               CAST(d.degree AS BIGINT) AS degree,
               CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
               CASE WHEN d.degree >= 2
                    THEN 2.0 * coalesce(t.n_triangles, 0)
                         / (d.degree * (d.degree - 1))
               END AS clustering_coef
        FROM deg d
        JOIN nation n ON d.node = n.n_nationkey
        LEFT JOIN node_tri t ON d.node = t.node
        ORDER BY n.n_name
    """,
    tags=("graph", "triangles", "clustering-coefficient"),
)
def graph_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    undirected nation trade graph — the second classic graph kernel
    after PageRank/CC. Edges canonicalize to (min, max) so each
    triangle enumerates exactly once via the ordered two-join pattern
    (a<b<c); per-node triangle membership and degree then give the
    local clustering coefficient as one exact-integer division.

    Scale: like PageRank, graph construction dominates (same one-
    shuffle fact pipeline); enumeration joins run on the contracted
    edge list. On graphs where edges DON'T contract (social-scale),
    the same ordered-join pattern applies with degree-based
    orientation (point each edge at the higher-degree endpoint) to
    bound the join fan-out — the standard distributed triangle
    algorithm."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("u"),
            F.greatest("s_nationkey", "c_nationkey").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    node_tri = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.join(F.broadcast(nation), deg.node == nation.n_nationkey)
        .join(F.broadcast(node_tri), "node", "left")
        .select(
            "n_name",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            ).alias("clustering_coef"),
        )
        .orderBy("n_name")
    )


LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Unrolled synchronous label propagation (like the PageRank
    oracle: DuckDB's recursive CTEs can't aggregate in the step term,
    so the fixed iteration count expands as chained CTEs)."""
    ctes = [
        """
        edges0 AS (
            SELECT sn.n_nationkey AS src, cn.n_nationkey AS dst,
                   count(*) AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            WHERE sn.n_nationkey <> cn.n_nationkey
            GROUP BY 1, 2
        )""",
        """
        edges AS (
            SELECT src, dst, sum(w) AS w FROM (
                SELECT src, dst, w FROM edges0
                UNION ALL
                SELECT dst, src, w FROM edges0
            ) GROUP BY src, dst
        )""",
        """
        lab0 AS (
            SELECT n_nationkey AS node,
                   CAST(n_nationkey AS BIGINT) AS label
            FROM nation
        )""",
    ]
    for i in range(LPA_ITERS):
        ctes.append(
            f"""
        votes{i} AS (
            SELECT e.dst AS node, l.label, sum(e.w) AS v
            FROM edges e JOIN lab{i} l ON l.node = e.src
            GROUP BY e.dst, l.label
        )"""
        )
        ctes.append(
            f"""
        pick{i} AS (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY v DESC, label) AS rk
            FROM votes{i}
        )"""
        )
        ctes.append(
            f"""
        lab{i + 1} AS (
            SELECT l.node, coalesce(p.label, l.label) AS label
            FROM lab{i} l
            LEFT JOIN (SELECT node, label FROM pick{i} WHERE rk = 1) p
              ON p.node = l.node
        )"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
        SELECT nn.n_name,
               CAST(l.label AS BIGINT) AS community,
               CAST(count(*) OVER (PARTITION BY l.label) AS BIGINT)
                   AS community_size
        FROM lab{LPA_ITERS} l JOIN nation nn ON l.node = nn.n_nationkey
        ORDER BY community, nn.n_name
        """
    )


@register(
    "graph_label_propagation_communities",
    oracle=_lpa_oracle(),
    tags=("graph", "community-detection", "lpa", "iterative"),
)
def graph_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous weighted LABEL PROPAGATION
    on the (symmetrized, self-loop-free) nation trade graph — the
    third iterative graph kernel next to PageRank and connected
    components: each round every node adopts the label carrying the
    greatest incident edge weight, ties broken by smallest label, so
    the fixed-iteration run is fully deterministic (vanilla LPA's
    random tie-breaking is what makes it non-reproducible; total
    ordering is the production fix).

    Scale: identical construction/iteration asymmetry as PageRank —
    one shuffle-heavy declarative join pipeline builds the contracted
    edge list (checkpointed), then each of the 3 iterations is a
    join + argmax-window on the tiny graph. The oracle unrolls the
    same three rounds as chained CTEs."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")
    directed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = (
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "w",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)  # iterate on the contracted graph
    )
    labels = nation.select(
        F.col("n_nationkey").alias("node"),
        F.col("n_nationkey").cast("bigint").alias("label"),
    )
    wk = W.partitionBy("node").orderBy(F.desc("v"), "label")
    for _ in range(LPA_ITERS):
        votes = (
            edges.join(
                labels.withColumnRenamed("node", "src_node"),
                F.col("src") == F.col("src_node"),
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum("w").alias("v"))
        )
        picked = (
            votes.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(picked, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    wl = W.partitionBy("label")
    return (
        labels.join(
            F.broadcast(nation), labels.node == nation.n_nationkey
        )
        .select(
            "n_name",
            F.col("label").cast("bigint").alias("community"),
            F.count("*").over(wl).cast("bigint").alias("community_size"),
        )
        .orderBy("community", "n_name")
    )


BFS_HUB = "NATION_0"
BFS_MAX_ROUNDS = 25
BFS_TOP_LANES = 2

_BFS_ORACLE = f"""
    WITH RECURSIVE dir AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY src, dst
    ),
    top2 AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM dir
        ) WHERE rn <= {BFS_TOP_LANES}
    ),
    ed AS (
        SELECT src, dst FROM top2
        UNION
        SELECT dst, src FROM top2
    ),
    bfs(node, d) AS (
        SELECT n_nationkey, 0 FROM nation WHERE n_name = '{BFS_HUB}'
        UNION
        SELECT e.dst, b.d + 1
        FROM bfs b JOIN ed e ON e.src = b.node
        WHERE b.d < {BFS_MAX_ROUNDS}
    )
    SELECT n.n_name,
           CAST(coalesce(min(b.d), -1) AS BIGINT) AS hops
    FROM nation n LEFT JOIN bfs b ON b.node = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
"""


@register(
    "graph_bfs_trade_hops",
    oracle=_BFS_ORACLE,
    tags=("graph", "bfs", "iterative"),
)
def graph_bfs_trade_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BFS — minimum hop count from a hub nation over the
    SPARSIFIED trade graph (each nation keeps only its top-2
    heaviest outbound lanes by lineitem count, tie-break dst key;
    then symmetrized). Sparsification makes distances non-trivial —
    the raw nation graph is near-complete at every SF — and mirrors
    how k-NN graphs are built from dense similarity matrices.

    The loop is frontier-expansion BFS: each round joins the frontier
    to the edge list, keeps unseen nodes (broadcast anti-join against
    the settled set), checkpoints, and probes one scalar count for
    convergence — the same bounded-driver-roundtrip contract as
    connected components (operators/dedup.py). Rounds are bounded by
    the node count with a loud guard; unreached nations surface as
    NULL hops. Graph construction reuses the one-shuffle fact
    pipeline of pagerank_nation_trade; the iteration itself runs on
    the contracted 25-node graph, so per-round cost is independent
    of fact volume. Unreached nations report hops = -1 (NULL would
    canonicalize differently across engines). Oracle: DuckDB
    recursive CTE (UNION-distinct keeps the path explosion
    bounded)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation")

    dirw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    top2 = (
        dirw.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("src").orderBy(F.desc("w"), "dst")
            ),
        )
        .filter(F.col("rn") <= BFS_TOP_LANES)
        .select("src", "dst")
    )
    edges = (
        top2.unionAll(top2.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        nation.filter(F.col("n_name") == BFS_HUB)
        .select(F.col("n_nationkey").alias("node"), F.lit(0).alias("d"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(BFS_MAX_ROUNDS):
        nxt = (
            F.broadcast(frontier)
            .join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .join(F.broadcast(dist), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:  # bounded scalar convergence probe
            break
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(
            f"BFS did not settle within {BFS_MAX_ROUNDS} rounds — "
            "graph larger than the node bound implies a bug"
        )
    return (
        nation.join(F.broadcast(dist), nation.n_nationkey == dist.node, "left")
        .select(
            "n_name",
            F.coalesce(F.col("d"), F.lit(-1)).cast("bigint").alias("hops"),
        )
        .orderBy("n_name")
    )


_ASSORT_ORACLE = f"""
    WITH dir AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY src, dst
    ),
    top2 AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM dir
        ) WHERE rn <= {BFS_TOP_LANES}
    ),
    edges AS (
        SELECT least(src, dst) AS u, greatest(src, dst) AS v
        FROM top2 GROUP BY u, v
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v FROM edges)
        GROUP BY node
    ),
    ed AS (
        SELECT da.d AS ju, db.d AS kv
        FROM edges e
        JOIN deg da ON da.node = e.u
        JOIN deg db ON db.node = e.v
    ),
    s AS (
        SELECT count(*) AS m,
               CAST(sum(ju * kv) AS DOUBLE) AS sjk,
               CAST(sum(ju + kv) AS DOUBLE) / 2 AS sh,
               CAST(sum(ju * ju + kv * kv) AS DOUBLE) / 2 AS sh2
        FROM ed
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(m AS BIGINT) AS n_edges,
           round((sjk / m - (sh / m) * (sh / m))
                 / (sh2 / m - (sh / m) * (sh / m)), 6) AS assortativity
    FROM s
"""


@register(
    "graph_degree_assortativity",
    oracle=_ASSORT_ORACLE,
    tags=("graph", "assortativity", "degree-correlation"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the SPARSIFIED nation
    trade graph (the same top-2-lane graph BFS runs on — the raw
    trade graph is near-complete, so its degree variance is zero and
    assortativity is undefined): the Pearson correlation of degrees
    across edge endpoints — positive means hubs link to hubs,
    negative means hub-and-spoke. All sums are exact integers; the
    closed-form correlation is one double expression, identical in
    both engines, rounded 6dp.

    Scale: reuses the canonical one-shuffle trade-edge pipeline; the
    degree join runs on the contracted edge list."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    dirw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    edges = (
        dirw.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("src").orderBy(F.desc("w"), "dst")
            ),
        )
        .filter(F.col("rn") <= BFS_TOP_LANES)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # contracted edge list; 2 consumers
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)  # 25 rows; 3 consumers
    )
    ed = (
        edges.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("d").alias("ju"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("d").alias("kv"))),
            "v",
        )
    )
    s = ed.agg(
        F.count("*").alias("m"),
        F.sum(F.col("ju") * F.col("kv")).cast("double").alias("sjk"),
        (F.sum(F.col("ju") + F.col("kv")).cast("double") / 2).alias("sh"),
        (
            F.sum(F.col("ju") * F.col("ju") + F.col("kv") * F.col("kv")).cast(
                "double"
            )
            / 2
        ).alias("sh2"),
    )
    nn = deg.agg(F.count("*").alias("n_nodes"))
    m = F.col("m")
    mean_h = F.col("sh") / m
    return s.crossJoin(F.broadcast(nn)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        m.cast("bigint").alias("n_edges"),
        F.round(
            (F.col("sjk") / m - mean_h * mean_h)
            / (F.col("sh2") / m - mean_h * mean_h),
            6,
        ).alias("assortativity"),
    )
