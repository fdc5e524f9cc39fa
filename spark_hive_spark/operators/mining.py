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
HN_BLOCKS = 8  # grid floor; grows with corpus size (see miner docstring)
HN_BLOCK_ROWS = 4096  # target query rows per GEMM block
HN_CELL_CHUNK = 8192  # query rows per in-task GEMM chunk (ANN path)

_KEY_MASKED = np.iinfo(np.int64).max


def _block_topk(
    S: "np.ndarray",
    qids: "np.ndarray",
    qlab: "np.ndarray",
    cids: "np.ndarray",
    clab: "np.ndarray",
    k: int,
    exclude_self: bool,
) -> pd.DataFrame:
    """Vectorized per-task top-k under the engine-wide
    (round(sim, 6) desc, id asc) total order — no per-row Python
    loop, which was the actual wall-time bottleneck of both miners at
    100k vectors (the GEMM is BLAS; the old per-row lexsort was not).

    Exactness: the rounded similarity is integer-valued at 1e-6, so
    ``key = −rint(sim·1e6)·2^40 + neighbor_id`` is an exact int64
    composite (|sim_int| ≤ 1e6 ⇒ |key| < 1.2e18; requires
    0 ≤ id < 2^40, asserted) whose ASCENDING order IS the
    (sim desc, id asc) contract — no epsilon tricks, no float
    tie-break hazards, and no negation of a sentinel (−int64.min
    overflows). argpartition keeps each row's k smallest keys, a
    k-wide argsort orders them, and masked (same-label / self)
    entries carry the int64 maximum so they can never be selected
    while real candidates remain."""
    n, m = S.shape
    if n == 0 or m == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "neg_label": pd.Series([], dtype="int32"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
    if cids.min() < 0 or cids.max() >= (1 << 40):
        # not an assert: under `python -O` an out-of-range id would
        # silently corrupt the packed composite sort key
        raise ValueError("vec_id beyond int64 key-packing range [0, 2^40)")
    key = -np.rint(S * 1e6).astype(np.int64) * (1 << 40) + cids[None, :]
    mask = qlab[:, None] == clab[None, :]
    if exclude_self:
        mask |= qids[:, None] == cids[None, :]
    key[mask] = _KEY_MASKED
    kk = min(k, m)
    rows = np.arange(n)[:, None]
    top = np.argpartition(key, kk - 1, axis=1)[:, :kk]
    order = np.argsort(key[rows, top], axis=1)
    top = top[rows, order]
    valid = (key[rows, top] != _KEY_MASKED).ravel()
    return pd.DataFrame(
        {
            "query_id": np.repeat(qids.astype(np.int64), kk)[valid],
            "neighbor_id": cids[top].ravel()[valid].astype(np.int64),
            "neg_label": clab[top].ravel()[valid].astype(np.int32),
            "cos_sim": S[rows, top].ravel()[valid],
        }
    )

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
    tie-break, so both engines pick identical neighbor sets.

    The block count ADAPTS to corpus size (≈HN_BLOCK_ROWS query rows
    per block, floor HN_BLOCKS) so per-task score-matrix memory stays
    bounded as N grows — at 100k vectors that means a 25×25 grid of
    ≤4096² matrices (~260 MB/task incl. the int64 key), not an 8×8
    grid of 12.5k² ones; parallelism grows with the data, which is
    exactly the 1000-executor posture. Unchanged at driver scales
    (N ≤ 20k keeps the floor)."""
    emb = t(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    n_blocks = max(HN_BLOCKS, -(-n_vecs // HN_BLOCK_ROWS))
    v = emb.select(
        "vec_id",
        "label",
        "embedding",
        (F.col("vec_id") % n_blocks).cast("int").alias("blk"),
    )
    tasks = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(n_blocks)],
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
        if len(q) == 0 or len(c) == 0:
            return _block_topk(
                np.zeros((0, 0)), *([np.zeros(0, dtype=np.int64)] * 4),
                k, False,
            )
        Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        C = np.stack(c["embedding"].to_numpy()).astype(np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        S = np.round(Q @ C.T, 6)
        # local top-k under the (sim desc, id asc) total order —
        # self-pairs are same-label, so the label mask excludes them
        return _block_topk(
            S,
            q["vec_id"].to_numpy(),
            q["label"].to_numpy(),
            c["vec_id"].to_numpy(),
            c["label"].to_numpy(),
            k,
            exclude_self=False,
        )

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


# Probe fraction is a recall knob: the fixture vectors are near-random
# (the ANN worst case), and the mined targets are rank<=3 *different-
# label* neighbors — deeper in the global similarity order than plain
# top-k, so they spread over more cells. Measured recall vs the exact
# twin: fraction 1/4 -> 0.61, 3/8 -> 0.75, 1/2 -> 0.82-0.88
# (sf0.001..sf5). The miner probes HALF its cells; cells themselves
# come from similarity.ivf_policy (adaptive: ~3k vectors per cell), so
# at 100k vectors this is the (32, 16) setting the SCALE.md sweep
# measured as strictly dominating frozen (16, 8).
HN_ANN_PROBE_FRACTION = 0.5
HN_ANN_NPROBE = 8  # the attested small-corpus setting (= 16 cells / 2)

_HN_ANN_AUDIT_ORACLE = f"""
    WITH counts AS (
        SELECT label, count(*) AS n FROM embeddings GROUP BY label
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT 'hn_ann' AS method,
           (SELECT CAST(sum(c.n * least({HN_TOP_K}, t.total - c.n)) AS BIGINT)
            FROM counts c, tot t) AS n_exact,
           TRUE AS recall_ok,
           CAST(0 AS BIGINT) AS precision_violations
"""


@register(
    "mining_hard_negatives_ann",
    oracle=None,  # ANN candidate set depends on the k-means coarse
    # quantizer (deterministic but not SQL-expressible);
    # mining_hard_negatives_ann_audit is the hash-green gate.
    tags=("mining", "contrastive", "similarity", "ann", "approx"),
)
def mining_hard_negatives_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-BOUNDED HARD-NEGATIVE MINING (VERDICT r7 task 2) — the
    production shape of `mining_hard_negatives`: instead of scoring
    every query against the full corpus (quadratic by definition),
    each vector probes only its nprobe nearest IVF cells (the
    deterministic spherical-k-means quantizer shared with
    `knn_cosine_ivf`) and mines its top-3 different-label negatives
    exactly WITHIN that candidate set.

    Plan: assign cells once (mapInPandas, one matmul per batch);
    probe cells for every vector the same way; then a COGROUPED
    per-cell GEMM (applyInPandas over cogroup) emits each cell's
    local top-k per query, and one global window keeps the true
    top-k of the union — the same two-level top-k argument as the
    exact miner, restricted to probed cells. Cost per query is
    nprobe/cells of the corpus; cells/nprobe now come from
    `similarity.ivf_policy` (adaptive, ~3k vectors per cell at probe
    fraction 1/2 — the policy SCALE.md's crossing sweep measured), so
    growth is ~N·(constant per-cell GEMM), not a constant fraction of
    N² — parallelism = n_cells. In-task GEMMs
    chunk at HN_CELL_CHUNK query rows, so per-task memory is bounded
    regardless of how many queries probe a cell. Ranking is on
    round(sim, 6) with neighbor_id tie-break, identical to the exact
    twin, so the audit's intersection join is well-defined."""
    return mine_hard_negatives_ann(spark, sf_dir)


def mine_hard_negatives_ann(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_cells: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """Parameterized ANN miner. Defaults derive from
    `similarity.ivf_policy` at probe fraction 1/2 (≤ ~48k vectors ⇒
    the attested (16, 8); 100k ⇒ the sweep-winning (32, 16)); explicit
    `n_cells`/`nprobe` are the knobs the crossing-point bench sweeps.
    Semantics and the total order are identical at every setting."""
    from spark_hive_spark.operators.similarity import _ivf_centroids, ivf_policy

    emb = t(spark, sf_dir, "embeddings")
    if n_cells is None or nprobe is None:
        auto_cells, auto_probe = ivf_policy(
            emb.count(), probe_fraction=HN_ANN_PROBE_FRACTION
        )
        n_cells = n_cells if n_cells is not None else auto_cells
        nprobe = nprobe if nprobe is not None else auto_probe
    Cn = _ivf_centroids(emb, n_cells)
    k = HN_TOP_K

    def assign_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "embedding": pdf["embedding"],
                    "cell": (Vn @ Cn.T).argmax(axis=1).astype(np.int32),
                }
            )

    celled = emb.select("vec_id", "label", "embedding").mapInPandas(
        assign_cells, "vec_id long, label int, embedding array<float>, cell int"
    )

    def probe_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            top = np.argsort(-(Vn @ Cn.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(
                        pdf["vec_id"].to_numpy(), nprobe
                    ),
                    "qlabel": np.repeat(
                        pdf["label"].to_numpy(), nprobe
                    ),
                    "qe": [
                        e for e in pdf["embedding"] for _ in range(nprobe)
                    ],
                    "cell": top.ravel().astype(np.int32),
                }
            )

    probes = emb.select("vec_id", "label", "embedding").mapInPandas(
        probe_cells, "query_id long, qlabel int, qe array<float>, cell int"
    )

    def cell_topk(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return _block_topk(
                np.zeros((0, 0)), *([np.zeros(0, dtype=np.int64)] * 4),
                k, True,
            )
        C = np.stack(cpdf["embedding"].to_numpy()).astype(np.float64)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        cids = cpdf["vec_id"].to_numpy()
        clab = cpdf["label"].to_numpy()
        # chunk the query side: a popular cell can be probed by far
        # more queries than it holds vectors, and per-task memory must
        # stay bounded by HN_CELL_CHUNK·|cell| regardless
        parts = []
        for lo in range(0, len(qpdf), HN_CELL_CHUNK):
            qc = qpdf.iloc[lo : lo + HN_CELL_CHUNK]
            Q = np.stack(qc["qe"].to_numpy()).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            S = np.round(Q @ C.T, 6)
            parts.append(
                _block_topk(
                    S,
                    qc["query_id"].to_numpy(),
                    qc["qlabel"].to_numpy(),
                    cids,
                    clab,
                    k,
                    exclude_self=True,
                )
            )
        return pd.concat(parts, ignore_index=True)

    local = probes.groupBy("cell").cogroup(celled.groupBy("cell")).applyInPandas(
        cell_topk,
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


@register(
    "mining_hard_negatives_ann_audit",
    oracle=_HN_ANN_AUDIT_ORACLE,
    tags=("mining", "ann", "audit"),
)
def mining_hard_negatives_ann_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACTNESS BRACKET for the ANN miner (the `ann_recall_audit`
    recipe): recall of `mining_hard_negatives_ann` against the exact
    all-pairs twin must clear the floor, and every (query, neighbor)
    the ANN path returns that the exact path also returns must report
    the identical rounded cosine (reranking is exact — violations
    must be 0). The oracle derives n_exact from first principles in
    DuckDB (sum over labels of n_label * min(k, N - n_label)) and
    pins the booleans, so a silently broken cell assignment or probe
    flips a driver row. Floor 0.75; measured 0.82-0.84 at
    sf0.001/0.01/0.1 with nprobe=8 (see HN_ANN_NPROBE note)."""
    exact = (
        mining_hard_negatives(spark, sf_dir)
        .select("query_id", "neighbor_id", F.col("cos_sim").alias("exact_cos"))
        .localCheckpoint(eager=True)
    )
    ann = (
        mining_hard_negatives_ann(spark, sf_dir)
        .select("query_id", "neighbor_id", "cos_sim")
        .localCheckpoint(eager=True)
    )
    hit = ann.join(exact, ["query_id", "neighbor_id"], "inner").localCheckpoint(
        eager=True
    )
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    n_viol = hit.filter(
        F.abs(F.col("cos_sim") - F.col("exact_cos")) > 1e-6
    ).agg(F.count("*").alias("n_viol"))
    return (
        n_exact.crossJoin(n_hit)
        .crossJoin(n_viol)
        .select(
            F.lit("hn_ann").alias("method"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("n_hit") / F.col("n_exact") >= 0.75).alias("recall_ok"),
            F.col("n_viol").cast("bigint").alias("precision_violations"),
        )
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
