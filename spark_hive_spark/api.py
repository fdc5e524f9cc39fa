"""The engine's operator API — parameterized forms of the primitives
the registered queries are built from (VERDICT r7 task 6).

Queries under ``spark_hive_spark/operators/`` exist to attest
correctness against DuckDB oracles; THIS module is the surface a user
programs against. Everything here is a plain function over DataFrames
— no fixture paths, no registry — and each is exercised by the oracle
sweeps through the query that calls it (zero drift by construction)
plus directly by ``tests/test_api.py`` on hand-checkable inputs.

Two kinds of names live here:

- **Implementations** (defined in this module): :func:`funnel`,
  :func:`knn`, :func:`cosine_pairs`, :func:`minhash_dedupe`,
  :func:`canonical_checksum`. The corresponding registered queries
  call through these.
- **Re-exports** (lazy, PEP 562 — so operator modules can import this
  module without cycles): :func:`asof_join` (backward as-of join),
  :func:`salted_join` / :func:`salted_agg` (skew-safe shuffles),
  :func:`connected_components` (pointer-jumping min-label
  propagation), :func:`quantiles` (exact distributed order
  statistics), and the codegen vector helpers :func:`cosine` /
  :func:`dot` / :func:`norm`.

Determinism contract (shared with the registry): float similarity
scores are rounded to 6 dp before any ranking, and every top-k uses a
total order (score desc, id asc), so results are stable across
partitionings, engines, and runs.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    # implementations
    "funnel",
    "knn",
    "cosine_pairs",
    "minhash_dedupe",
    "canonical_checksum",
    # lazy re-exports
    "asof_join",
    "salted_agg",
    "salted_join",
    "connected_components",
    "quantiles",
    "cosine",
    "dot",
    "norm",
]

_LAZY = {
    "asof_join": ("spark_hive_spark.operators.temporal", "asof_join"),
    "salted_agg": ("spark_hive_spark.operators.scale", "salted_agg"),
    "salted_join": ("spark_hive_spark.operators.scale", "salted_join"),
    "connected_components": (
        "spark_hive_spark.operators.dedup",
        "connected_components",
    ),
    "quantiles": ("spark_hive_spark.functions.stats", "distributed_quantiles"),
    "cosine": ("spark_hive_spark.functions.vector", "cosine"),
    "dot": ("spark_hive_spark.functions.vector", "dot"),
    "norm": ("spark_hive_spark.functions.vector", "norm"),
}


def __getattr__(name: str):
    """Lazy re-exports: operator modules import ``api`` at module
    scope, and ``api`` pulls from operator modules only on first
    attribute access — no import cycle either way."""
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    val = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = val  # cache: subsequent access skips __getattr__
    return val


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel over an event log.

    For each step i, a user converts iff they have a ``steps[i]``
    event STRICTLY after their step-(i-1) conversion time (their
    earliest qualifying step-(i-1) event). Returns one row per step:
    ``(stage_idx, stage, n_users, conv_from_prev)`` where
    ``conv_from_prev`` is n_users / previous stage's n_users (1.0 for
    the first stage, NULL after an empty stage — never a fake 1.0).

    Plan shape: one user-grain ``min(ts)`` aggregation per step,
    chained by ``user_col`` equi-joins — each join input is |users|,
    never |events|, and the per-step ``type_col`` filter pushes down
    to the scan. The lag window runs over the len(steps)-row summary.
    Scales to any event volume: the only fact-sized shuffles are the
    per-step groupBys, which AQE coalesces.

    Example::

        funnel(events, ["view", "click", "purchase"])
        # -> 3 rows: stage_idx 1..3 with user counts and step rates
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    # public entry point: project to exactly the three working columns
    # so a caller frame that already has a `_prev_ts` column can't
    # make the chained `ts > _prev_ts` filter ambiguous (and column
    # pruning reaches the scan regardless of the input's width)
    events = events.select(user_col, ts_col, type_col)
    stage_dfs: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(steps):
        cand = events.filter(F.col(type_col) == etype)
        if prev is not None:
            cand = cand.join(prev, user_col).filter(
                F.col(ts_col) > F.col("_prev_ts")
            )
        cur = cand.groupBy(user_col).agg(F.min(ts_col).alias("_prev_ts"))
        stage_dfs.append(cur)
        prev = cur
    stages = stage_dfs[0].agg(
        F.lit(1).alias("stage_idx"),
        F.lit(steps[0]).alias("stage"),
        F.count("*").alias("n_users"),
    )
    for i, cur in enumerate(stage_dfs[1:], start=2):
        stages = stages.unionByName(
            cur.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(steps[i - 1]).alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    w = W.orderBy("stage_idx")
    prev_n = F.coalesce(F.lag("n_users", 1).over(w), F.col("n_users"))
    return stages.withColumn(
        "conv_from_prev",
        F.try_divide(F.col("n_users").cast("double"), prev_n.cast("double")),
    ).orderBy("stage_idx")


def knn(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of each query vector, brute force.

    ``queries`` must be SMALL (it is collected to the driver and
    broadcast inside the scoring UDF — the standard bounded-query-set
    shape; for query sets that scale with the corpus use an ANN
    index, e.g. the IVF machinery in ``operators/similarity.py``).
    ``corpus`` streams through a mapInPandas GEMM — no shuffle, no
    cross-join row explosion; the |Q|x|batch| score matrix lives only
    inside each task. The only shuffle is the final top-k window.

    Self-pairs (same id on both sides) are excluded. Returns
    ``(query_id, neighbor_id, cos_sim, rank)`` with cos_sim rounded
    to 6 dp and rank 1..k under (cos_sim desc, neighbor_id asc).

    Example::

        knn(embeddings, embeddings.filter("vec_id < 10"), k=5)
    """
    q_rows = queries.select(id_col, vec_col).collect()  # bounded by contract
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            S = Qn @ C.T  # (|Q|, batch)
            n_q, n_c = S.shape
            cand_ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_c),
                    "neighbor_id": np.tile(cand_ids, n_q),
                    "cos_sim": np.round(S.ravel(), 6),
                }
            )

    sims = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, neighbor_id long, cos_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_pairs(
    vectors: DataFrame,
    *,
    threshold: float,
    blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs with cosine similarity >= ``threshold``,
    EXACT, via blocked all-pairs GEMM.

    Vectors hash into ``blocks`` blocks by id; each of the
    blocks·(blocks+1)/2 block-pair tasks receives both blocks'
    vectors (one shuffle on task id) and computes its pair block as a
    single float64 matmul inside applyInPandas. Each vector is
    replicated ``blocks`` times — the standard replication/parallelism
    tradeoff of blocked all-pairs; grow ``blocks`` with cluster size,
    independent of N. All-pairs is O(N^2) by algorithm class: this is
    the exact oracle / small-N path — at 100 TB run LSH blocking
    first (``neardup_embeddings_lsh``) and verify candidates exactly.

    Returns ``(vec_a, vec_b, cos_sim)`` with vec_a < vec_b and
    cos_sim rounded to 6 dp, ordered by (vec_a, vec_b).

    Example::

        cosine_pairs(embeddings, threshold=0.4)
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        (F.col(id_col) % blocks).cast("int").alias("blk"),
    )
    spark = vectors.sparkSession
    tasks = spark.createDataFrame(
        [(i, j) for i in range(blocks) for j in range(i, blocks)],
        "ba int, bb int",
    )
    side_a = tasks.join(v, v.blk == tasks.ba).select(
        "ba", "bb", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    side_b = tasks.join(v, v.blk == tasks.bb).select(
        "ba", "bb", F.lit(1).alias("side"), "vec_id", "embedding"
    )
    both = side_a.unionByName(side_b)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        A = np.stack(a["embedding"].to_numpy()).astype(np.float64)
        B = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        S = A @ B.T
        ia, ib = np.nonzero(S >= threshold)
        ids_a = a["vec_id"].to_numpy()[ia]
        ids_b = b["vec_id"].to_numpy()[ib]
        sims = S[ia, ib]
        if pdf["ba"].iloc[0] == pdf["bb"].iloc[0]:
            # diagonal task: every unordered pair appears twice (+ self)
            keep = ids_a < ids_b
            lo, hi, sims = ids_a[keep], ids_b[keep], sims[keep]
        else:
            # off-diagonal task: pair appears once, id order arbitrary
            lo = np.minimum(ids_a, ids_b)
            hi = np.maximum(ids_a, ids_b)
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cos_sim": np.round(sims, 6)}
        )

    return (
        both.groupBy("ba", "bb")
        .applyInPandas(block_pairs, "vec_a long, vec_b long, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )


def minhash_bands(
    shingles: DataFrame,
    *,
    k: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    shingle_col: str = "s",
) -> DataFrame:
    """The LSH band table for a corpus: distinct ``(id, shingle)``
    pairs -> ``(doc_id, band_idx, band_hash)``, k MinHash components
    (min over per-seed xxhash64 of the shingle) grouped into
    ``bands`` hashed bands. This IS the persistable dedup index — a
    new batch deduplicates against a stored band table by equi-join
    on (band_idx, band_hash) without touching the original corpus
    (see ``dedup_incremental_against_index``); `minhash_dedupe`
    self-joins it for within-corpus pairs."""
    if k % bands != 0:
        raise ValueError(f"k={k} must divide into bands={bands}")
    sh = shingles.select(
        F.col(id_col).alias("doc_id"), F.col(shingle_col).alias("s")
    )
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh_{i}")
        for i in range(k)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    rows_per_band = k // bands
    band_cols = [
        F.xxhash64(
            F.lit(bi),
            *[F.col(f"mh_{bi * rows_per_band + j}") for j in range(rows_per_band)],
        ).alias(f"band_{bi}")
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.col(f"band_{bi}").alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_hash")


def minhash_dedupe(
    shingles: DataFrame,
    *,
    threshold: float = 0.8,
    k: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    shingle_col: str = "s",
) -> DataFrame:
    """Near-duplicate pairs by MinHash + LSH banding with exact
    Jaccard verification — the scalable near-dup plan.

    Input is the DISTINCT ``(id, shingle)`` set (build it however the
    corpus demands — word n-grams, character shingles; hash shingles
    to int64 first so the joins shuffle 8-byte keys). Signatures
    shrink each document to ``k`` ints; banding (``bands`` bands of
    k/bands rows, hashed) turns similarity search into an equi-join
    on band hashes; only CANDIDATE pairs pay the exact verification
    join. Recall of a pair at true similarity s is
    1-(1-s^(k/bands))^bands (~0.9998 at s=0.8 with 32/8); precision
    is exact because candidates are verified.

    Returns verified pairs ``(doc_a, doc_b, jaccard)`` with
    doc_a < doc_b, jaccard >= threshold rounded to 6 dp.

    Example::

        sh = docs.select("doc_id", F.explode(word_3grams).alias("s"))
        minhash_dedupe(sh.distinct(), threshold=0.8)
    """
    bands_long = minhash_bands(
        shingles, k=k, bands=bands, id_col=id_col,
        shingle_col=shingle_col,
    )
    sh = shingles.select(
        F.col(id_col).alias("doc_id"), F.col(shingle_col).alias("s")
    )
    a = bands_long.alias("a")
    b = bands_long.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification of candidates only
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    common = (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.s") == F.col("sb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("x.n") + F.col("y.n") - F.col("c"))
    return (
        common.join(sz.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
        .join(sz.alias("y"), F.col("doc_b") == F.col("y.doc_id"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# Row fingerprint: top 60 bits of md5 mod 1e9+7 — a BIGINT sum over
# any row count stays overflow-free under ANSI arithmetic. DuckDB
# spelling of the same arithmetic:
#   CAST(('0x' || substring(md5(<row>), 1, 15)) AS BIGINT) % 1000000007
_FP_TEMPLATE = (
    "CAST(conv(substring(md5(concat({row})), 1, 15), 16, 10) AS BIGINT)"
    " % 1000000007"
)


def canonical_checksum(
    df: DataFrame, row_expr: str, *, label: str | None = None
) -> DataFrame:
    """Order-independent content fingerprint of a DataFrame — the
    cross-engine validation a migration runs.

    ``row_expr`` is a comma-joined SQL expression list serializing one
    row canonically (integers/strings verbatim, money as exact cents
    via ``CAST(round(x * 100) AS BIGINT)``, timestamps as
    ``unix_micros(...)``, ``'|'`` separators between fields — see
    ``operators/profiling.py`` for the fixture tables' serializations).
    Each row's md5 fingerprint is summed mod 1e9+7: any dropped,
    duplicated, or damaged row flips the sum, and any engine that can
    evaluate the same expression reproduces it bit-for-bit.

    One embarrassingly-parallel scan with a map-side partial sum — no
    shuffle beyond the single-row final aggregate, at any scale.

    Returns one row: ``(table_name?, n_rows, row_checksum)`` —
    ``table_name`` included when ``label`` is given.

    Example::

        canonical_checksum(orders,
            "o_orderkey, '|', o_orderstatus", label="orders")
    """
    fp = F.expr(_FP_TEMPLATE.format(row=row_expr)).alias("fp")
    aggs = [
        F.count("*").alias("n_rows"),
        F.sum("fp").alias("row_checksum"),
    ]
    if label is not None:
        aggs.insert(0, F.lit(label).alias("table_name"))
    return df.select(fp).agg(*aggs)
