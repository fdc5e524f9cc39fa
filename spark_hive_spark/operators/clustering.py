"""Density clustering (DBSCAN) over the embedding space — composed
entirely from the engine's existing distributed primitives: the
blocked all-pairs GEMM of operators/similarity.py generates the
eps-neighbor graph, and the pointer-jumping connected-components
former of operators/dedup.py labels the core subgraph. Nothing new
had to be invented to add a clustering algorithm — which is the point
of building operators as composable dataflows.

Scale posture: the eps-graph generator is the O(N²)-by-algorithm-class
EXACT path (same caveat as neardup_embeddings — at 100 TB you block
through LSH first and feed the same downstream); everything after the
pair table is pair-cardinality. DBSCAN parameters: eps as a cosine
floor, classic fixed minPts = 4 (the fixture vectors are near-
random, so density is threshold-driven; a production corpus would
tune eps from a k-distance plot).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.vector import sql_cosine
from spark_hive_spark.operators.dedup import connected_components
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

DBSCAN_COS = 0.35  # eps, as a cosine-similarity floor (rounded 6dp)
DBSCAN_MINPTS = 4  # classic fixed minPts (near-random fixture vectors)

_DBSCAN_ORACLE = f"""
    WITH RECURSIVE v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    pr AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND round({sql_cosine('a.e', 'b.e')}, 6) >= {DBSCAN_COS}
    ),
    sym AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
    np_ AS (
        SELECT count(*) AS n, {DBSCAN_MINPTS} AS minpts FROM v
    ),
    deg AS (SELECT a AS vec_id, count(*) AS c FROM sym GROUP BY a),
    cores AS (
        SELECT d.vec_id FROM deg d, np_ WHERE d.c >= minpts
    ),
    ce AS (
        SELECT s.a, s.b FROM sym s
        JOIN cores c1 ON c1.vec_id = s.a
        JOIN cores c2 ON c2.vec_id = s.b
    ),
    reach(node, lbl) AS (
        SELECT vec_id, vec_id FROM cores
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN ce e ON e.a = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cid FROM reach GROUP BY node),
    border AS (
        SELECT s.a AS vec_id, min(comp.cid) AS cid
        FROM sym s
        JOIN cores c ON c.vec_id = s.b
        JOIN comp ON comp.node = s.b
        WHERE s.a NOT IN (SELECT vec_id FROM cores)
        GROUP BY s.a
    ),
    clusters AS (
        SELECT cid,
               count(*) AS n_core,
               (SELECT count(*) FROM border b WHERE b.cid = comp.cid)
                   AS n_border
        FROM comp GROUP BY cid
    ),
    noise AS (
        SELECT n - (SELECT count(*) FROM comp)
                 - (SELECT count(*) FROM border) AS n_noise
        FROM np_
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(n_core AS BIGINT) AS n_core,
           CAST(n_border AS BIGINT) AS n_border,
           CAST(n_core + n_border AS BIGINT) AS size
    FROM clusters
    UNION ALL
    SELECT -1, 0, 0, CAST(n_noise AS BIGINT) FROM noise
    ORDER BY cluster_id
"""


@register(
    "dbscan_embedding_clusters",
    oracle=_DBSCAN_ORACLE,
    tags=("clustering", "dbscan", "density"),
)
def dbscan_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over embedding cosine space: eps-neighbors are pairs
    with rounded cosine >= 0.35 (exact blocked-GEMM, 6dp-rounded so
    both engines agree on the edge set), cores have >= minPts
    neighbors, clusters are connected components of the core
    subgraph (min-id labels via the engine's pointer-jumping
    former), borders attach to their minimum core-neighbor cluster,
    everything else is noise (reported as cluster_id −1). The oracle
    recomputes the full algorithm with a recursive CTE."""
    emb = t(spark, sf_dir, "embeddings")
    n_blocks = 8
    v = emb.select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % n_blocks).cast("int").alias("blk"),
    )
    tasks = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba int, bb int",
    )
    side_a = tasks.join(v, v.blk == tasks.ba).select(
        "ba", "bb", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    side_b = tasks.join(v, v.blk == tasks.bb).select(
        "ba", "bb", F.lit(1).alias("side"), "vec_id", "embedding"
    )
    threshold = DBSCAN_COS

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"a": [], "b": []}).astype(
                {"a": "int64", "b": "int64"}
            )
        A = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        B = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        S = np.round(A @ B.T, 6)
        ia, ib = np.nonzero(S >= threshold)
        ids_a = a["vec_id"].to_numpy()[ia]
        ids_b = b["vec_id"].to_numpy()[ib]
        if pdf["ba"].iloc[0] == pdf["bb"].iloc[0]:
            keep = ids_a < ids_b
            lo, hi = ids_a[keep], ids_b[keep]
        else:
            lo = np.minimum(ids_a, ids_b)
            hi = np.maximum(ids_a, ids_b)
        return pd.DataFrame({"a": lo, "b": hi})

    pairs = (
        side_a.unionByName(side_b)
        .groupBy("ba", "bb")
        .applyInPandas(block_pairs, "a long, b long")
        .localCheckpoint(eager=True)  # eps-graph; many consumers
    )
    sym = pairs.unionAll(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    params = emb.agg(
        F.count("*").alias("n"),
        F.lit(DBSCAN_MINPTS).alias("minpts"),
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("c"))
    cores = (
        deg.crossJoin(F.broadcast(params))
        .filter(F.col("c") >= F.col("minpts"))
        .select(F.col("a").alias("vec_id"))
        .localCheckpoint(eager=True)  # core set; several consumers
    )
    ce = (
        pairs.join(cores.withColumnRenamed("vec_id", "a"), "a")
        .join(cores.withColumnRenamed("vec_id", "b"), "b")
        .select("a", "b")
    )
    # isolated cores (no core-core edge) still form singleton
    # clusters: feed them as self-loops so the CC former labels them
    cc_input = ce.unionAll(
        cores.select(F.col("vec_id").alias("a"), F.col("vec_id").alias("b"))
    )
    comp = connected_components(cc_input, "a", "b", "vec_id").select(
        F.col("vec_id").alias("node"), F.col("cluster_id").alias("cid")
    )
    border = (
        sym.join(cores.withColumnRenamed("vec_id", "b"), "b")
        .join(cores.withColumnRenamed("vec_id", "a"), "a", "left_anti")
        .join(comp, F.col("b") == F.col("node"))
        .groupBy("a")
        .agg(F.min("cid").alias("cid"))
    )
    clusters = (
        comp.groupBy("cid")
        .agg(F.count("*").alias("n_core"))
        .join(
            border.groupBy("cid").agg(F.count("*").alias("n_border")),
            "cid",
            "left",
        )
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.col("n_core").cast("bigint").alias("n_core"),
            F.coalesce("n_border", F.lit(0)).cast("bigint").alias("n_border"),
            (F.col("n_core") + F.coalesce("n_border", F.lit(0)))
            .cast("bigint")
            .alias("size"),
        )
    )
    counts = (
        comp.agg(F.count("*").alias("nc"))
        .crossJoin(border.agg(F.count("*").alias("nb")))
        .crossJoin(F.broadcast(params))
    )
    noise = counts.select(
        F.lit(-1).cast("bigint").alias("cluster_id"),
        F.lit(0).cast("bigint").alias("n_core"),
        F.lit(0).cast("bigint").alias("n_border"),
        (F.col("n") - F.col("nc") - F.col("nb")).cast("bigint").alias("size"),
    )
    return clusters.unionAll(noise).orderBy("cluster_id")
