"""Training-data mining operators: contrastive hard-negative mining,
curriculum ordering with language interleaving, and class-balance
weighting — the steps between "curated corpus" and "training batches"
(extends operators/curation.py; embeddings/documents fixtures).

Scale posture:

- Hard negatives: all-pairs scoring via the same blocked-GEMM task
  grid as neardup_embeddings, but DIRECTED (every query block meets
  every candidate block) and with PER-TASK TOP-K REFINEMENT — each
  task emits only its local top-k per query (on the rounded-sim +
  id total order), and the global window then ranks B·k rows per
  query instead of N. The emitted row count is N·k·B, linear in N;
  the N×N score matrix never leaves the tasks. This is the standard
  two-level distributed top-k; it is exact because the global top-k
  is a subset of the union of per-task top-ks under the same total
  order.

- Curriculum / weights: pure window + aggregate pipelines, one
  shuffle each, fully codegen'd.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.vector import sql_cosine
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

HN_TOP_K = 3
HN_BLOCKS = 8

_HN_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               c.label AS neg_label,
               round({sql_cosine('q.e', 'c.e')}, 6) AS cos_sim
        FROM v q, v c
        WHERE q.label <> c.label
    ),
    ranked AS (
        SELECT query_id, neighbor_id, neg_label, cos_sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, neg_label, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {HN_TOP_K}
    ORDER BY query_id, rank
"""


@register(
    "mining_hard_negatives",
    oracle=_HN_ORACLE,
    tags=("mining", "contrastive", "similarity"),
)
def mining_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRASTIVE HARD-NEGATIVE MINING — for EVERY vector, the top-3
    most cosine-similar vectors with a DIFFERENT label: the examples
    a contrastive/metric-learning loss learns most from. Exact, via
    the directed blocked-GEMM grid with per-task top-k refinement
    (module docstring); ranking is on the rounded similarity with id
    tie-break, so both engines pick identical neighbor sets."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        "embedding",
        (F.col("vec_id") % HN_BLOCKS).cast("int").alias("blk"),
    )
    tasks = spark.createDataFrame(
        [(i, j) for i in range(HN_BLOCKS) for j in range(HN_BLOCKS)],
        "bq int, bc int",
    )
    side_q = tasks.join(v, v.blk == tasks.bq).select(
        "bq", "bc", F.lit(0).alias("side"), "vec_id", "label", "embedding"
    )
    side_c = tasks.join(v, v.blk == tasks.bc).select(
        "bq", "bc", F.lit(1).alias("side"), "vec_id", "label", "embedding"
    )
    both = side_q.unionByName(side_c)
    k = HN_TOP_K

    def task_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["side"] == 0]
        c = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "neg_label": pd.Series([], dtype="int32"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(q) == 0 or len(c) == 0:
            return empty
        Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        C = np.stack(c["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        S = np.round(Q @ C.T, 6)
        qlab = q["label"].to_numpy()
        clab = c["label"].to_numpy()
        cids = c["vec_id"].to_numpy()
        qids = q["vec_id"].to_numpy()
        out = []
        for i in range(len(q)):
            mask = clab != qlab[i]
            if not mask.any():
                continue
            sims = S[i, mask]
            ids = cids[mask]
            labs = clab[mask]
            # local top-k under the (sim desc, id asc) total order
            order = np.lexsort((ids, -sims))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(order), qids[i]),
                        "neighbor_id": ids[order],
                        "neg_label": labs[order],
                        "cos_sim": sims[order],
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else empty

    local = both.groupBy("bq", "bc").applyInPandas(
        task_topk,
        "query_id long, neighbor_id long, neg_label int, cos_sim double",
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


CURRICULUM_HEAD = 100

_CURRICULUM_ORACLE = f"""
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS lrank
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, lang, lrank,
               row_number() OVER (ORDER BY lrank, lang, doc_id) AS global_pos
        FROM ranked
    )
    SELECT CAST(global_pos AS BIGINT) AS global_pos, doc_id, lang,
           CAST(lrank AS BIGINT) AS lang_rank
    FROM ordered
    WHERE global_pos <= {CURRICULUM_HEAD}
    ORDER BY global_pos
"""


@register(
    "curriculum_interleaved_order",
    oracle=_CURRICULUM_ORACLE,
    tags=("mining", "curriculum", "ordering"),
)
def curriculum_interleaved_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ORDERING with language interleaving — documents
    rank within their language by a difficulty proxy (n_chars,
    longest first), then the global training order round-robins
    across languages by (lang_rank, lang): every language surfaces
    once per "round" before any language repeats, so early training
    never starves a language. Head of the schedule (first 100
    positions) is the attested output.

    The global row_number is the honest fixture plan; at 100 TB the
    same (lrank, lang) key range-partitions and the rewrite is the
    documented two-phase rank (operators/analytics.py)."""
    ranked = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.row_number()
        .over(W.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id"))
        .alias("lrank"),
    )
    ordered = ranked.withColumn(
        "global_pos",
        F.row_number().over(W.orderBy("lrank", "lang", "doc_id")).cast("bigint"),
    )
    return (
        ordered.filter(F.col("global_pos") <= CURRICULUM_HEAD)
        .select(
            "global_pos", "doc_id", "lang", F.col("lrank").cast("bigint").alias("lang_rank")
        )
        .orderBy("global_pos")
    )


ENS_BETA = 0.999

_WEIGHTS_ORACLE = f"""
    WITH counts AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT sum(n) AS total, count(*) AS n_classes FROM counts
    )
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_docs,
           round(CAST(t.total AS DOUBLE)
                 / (t.n_classes * c.n), 6) AS inv_freq_weight,
           round((1.0 - {ENS_BETA}) / (1.0 - pow({ENS_BETA}, c.n)), 6)
               AS ens_weight
    FROM counts c, tot t
    ORDER BY c.lang
"""


@register(
    "class_balance_weights",
    oracle=_WEIGHTS_ORACLE,
    tags=("mining", "class-balance", "weights"),
)
def class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS-BALANCE WEIGHTS per language: the inverse-frequency
    weight N/(K·n_c) and the effective-number-of-samples weight
    (1−β)/(1−β^n) of Cui et al. (CVPR'19), β = 0.999 — the two
    standard reweighting schemes for imbalanced training mixtures.
    Integer counts feed double formulas written identically in both
    engines (pow of an exact constant and an integer)."""
    counts = (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # class-cardinality; 2 consumers
    )
    tot = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_classes")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(
                F.col("total").cast("double")
                / (F.col("n_classes") * F.col("n")),
                6,
            ).alias("inv_freq_weight"),
            F.round(
                (1.0 - F.lit(ENS_BETA))
                / (1.0 - F.pow(F.lit(ENS_BETA), F.col("n"))),
                6,
            ).alias("ens_weight"),
        )
        .orderBy("lang")
    )
