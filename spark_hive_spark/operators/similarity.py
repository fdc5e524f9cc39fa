"""Similarity search over the `embeddings` table (SURVEY.md §2B
tier 2 / north star): brute-force cosine top-k (the correctness
baseline), random-hyperplane LSH ANN (the scale path), embedding
near-dup pairs, and norm statistics.

Scale design:
- Brute force is exact and fine when the QUERY set is small: queries
  broadcast, candidates stream, cosine folds inside codegen — cost
  |Q|·|N| but no shuffle of the big side. It is the oracle for ANN.
- LSH buckets each vector into sign-bit buckets of random hyperplanes
  (computed in a vectorized Arrow pandas_udf — one matmul per batch).
  Candidates = bucket collisions in any of the 8 tables: an equi-join
  on (table, bucket), never a cross join. Recall is tunable via
  tables×bits; verification reranks candidates exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hive_spark import api
from spark_hive_spark.functions.vector import as_double, cosine, norm, sql_cosine
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
NEARDUP_COS = 0.4  # fixtures are near-random vectors; 0.4 ≈ top 0.05%

LSH_TABLES = 8
LSH_BITS = 6
LSH_DIM = 64
LSH_SEED = 42

# Near-dup banding is tuned separately: recall at a LOW cosine
# threshold t needs many tables with few bits. With per-bit collision
# p = 1 - acos(t)/pi = 0.631 at t=0.4, a table of b bits collides with
# probability p^b, and L tables give recall 1-(1-p^b)^L:
#   8 tables x 6 bits  -> 1-(1-0.631^6)^8  = 0.41   (the KNN config)
#   32 tables x 4 bits -> 1-(1-0.631^4)^32 = 0.996  (this config)
# The KNN queries keep 8x6 (top-k reranking only needs SOME collision
# among the best neighbors); the near-dup PAIR search must see ~every
# pair >= t once, so it pays more tables.
NEARDUP_LSH_TABLES = 32
NEARDUP_LSH_BITS = 4

# Per-task work bound for the LSH near-dup GEMM: a (tbl, bucket) group
# larger than this is hash-split into ceil(n/cap) chunks and every
# chunk PAIR becomes its own task, so one skewed bucket can never pin
# a single executor to |bucket|^2 work. Output is provably identical
# to the uncapped plan (each unordered vector pair lands in exactly
# one chunk-pair task). 4096^2 = 16.8M float64 dot products per task —
# ~1-2 s of GEMM, a healthy Spark task size.
NEARDUP_LSH_BUCKET_CAP = 4096


@register(
    "knn_cosine_bruteforce",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        c AS (
            SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
            FROM embeddings
        ),
        sims AS (
            SELECT query_id, neighbor_id,
                   round({sql_cosine('qe', 'ce')}, 6) AS cos_sim
            FROM q, c
            WHERE query_id <> neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id ASC
                   ) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, cos_sim, rank
        FROM ranked WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    tags=("similarity", "knn"),
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-K: the bounded query set (10 vectors) ships to
    every partition inside a mapInPandas closure; each Arrow batch of
    candidates scores against ALL queries with one numpy matmul, then
    a window ranks on the ROUNDED similarity (+ id tie-break) so both
    engines select identical neighbor sets.

    Scale shape: candidates stream (no shuffle, no cross-join row
    explosion — the |Q|×|batch| score matrix lives only inside the
    UDF); the only shuffle is the final top-k window over |Q|·|N|
    scored rows. The interpreted array-fold variant measured 6.4 s at
    sf0.1 vs ~1 s for this plan; the gap grows linearly in |Q|·|N|.

    Implementation: `api.knn` (the parameterized form); this query
    pins its fixture instantiation against the SQL oracle."""
    emb = t(spark, sf_dir, "embeddings")
    return api.knn(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=TOP_K
    )


@register(
    "neardup_embeddings",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({sql_cosine('a.e', 'b.e')}, 6) AS cos_sim
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND {sql_cosine('a.e', 'b.e')} >= {NEARDUP_COS}
        ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "dedup"),
)
def neardup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs, EXACT — this is the ORACLE /
    recall baseline for `neardup_embeddings_lsh`, not the 100 TB path
    (all-pairs is O(N^2) by algorithm class; at scale near-dup must go
    through LSH blocking first). Exact cosine >= threshold over
    all pairs, via BLOCKED all-pairs GEMM: vectors hash into B blocks,
    each of the B(B+1)/2 block-pair tasks gets both blocks' vectors
    (one shuffle on task id) and computes its pair block as a single
    numpy matmul inside applyInPandas.

    Why not the pure-SQL cross join + array fold: Spark's higher-order
    array functions are interpreted (not codegen'd) — at sf0.1 (2k
    vectors, 2M pairs) the fold plan measured 196 s vs ~3 s for the
    blocked GEMM, and the gap widens quadratically. Each vector is
    replicated B times (the standard replication/parallelism tradeoff
    of blocked all-pairs); B scales with cluster size independent of
    N. Exactness: float64 matmul agrees with any sane summation order
    to ~1e-15, far inside the 6dp rounding.

    Implementation: `api.cosine_pairs` (the parameterized blocked
    GEMM); this query pins its fixture instantiation against the
    all-pairs SQL oracle."""
    return api.cosine_pairs(
        t(spark, sf_dir, "embeddings"), threshold=NEARDUP_COS, blocks=8
    )


@register(
    "neardup_embeddings_lsh",
    oracle=None,  # LSH-blocked ANN: the candidate set depends on the
    # numpy-seeded hyperplanes. tests/test_invariants.py pins recall
    # against the exact `neardup_embeddings` pairs (same pattern as
    # dedup_minhash_lsh vs dedup_ngram_jaccard).
    tags=("similarity", "dedup", "lsh", "approx"),
)
def neardup_embeddings_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-BLOCKED — the 100 TB production
    path (`neardup_embeddings` is its exact oracle). Vectors bucket by
    random-hyperplane sign bits (32 tables x 4 bits — see the
    NEARDUP_LSH_* recall derivation above); each (table, bucket) group
    GEMMs only ITS OWN vectors and emits pairs with exact cosine >=
    threshold; a final distinct dedups pairs that collide in several
    tables.

    Scale shape: cost sums |bucket|^2 over buckets instead of N^2 —
    with B buckets of even load that is N^2/B per table. Skewed
    buckets are CAPPED: any (table, bucket) group over
    NEARDUP_LSH_BUCKET_CAP rows is hash-split into chunks and every
    chunk PAIR runs as its own task (see _salted_bucket_tasks), so
    per-task pair count is bounded by cap^2 while the emitted pair set
    stays bit-identical to the uncapped plan — no recall is traded for
    the bound. Verification is exact within candidates, so precision
    is 1.0; recall for cos>=t pairs is 1-(1-(1-acos(t)/pi)^4)^32 =
    0.996 at t=0.4 (higher for closer pairs) — and the recall test
    measures it empirically. Tuning note: the fixture threshold 0.4 is
    adversarially LOW (near-random vectors); a production near-dup
    threshold (cos>=0.9, p_bit=0.86) reaches 0.997 recall with just
    8 tables x 8 bits, so the table count here is the price of the
    low threshold, not of the method."""
    emb = t(spark, sf_dir, "embeddings")
    bucketize = lsh_bucket_udf(NEARDUP_LSH_TABLES, NEARDUP_LSH_BITS)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        F.posexplode(bucketize("embedding")).alias("tbl", "bucket"),
    )
    tasks = _salted_bucket_tasks(bucketed, NEARDUP_LSH_BUCKET_CAP)
    return (
        tasks.groupBy("tbl", "bucket", "chunk_a", "chunk_b")
        .applyInPandas(
            _chunk_pair_fn(NEARDUP_COS), "vec_a long, vec_b long, cos_sim double"
        )
        .distinct()  # same pair may collide in several tables
        .orderBy("vec_a", "vec_b")
    )


def _salted_bucket_tasks(bucketed: DataFrame, cap: int) -> DataFrame:
    """Bound per-task GEMM work without losing pairs.

    Each (tbl, bucket) group of n rows is split into
    C = ceil(n / cap) hash chunks; every vector is replicated into the
    C chunk-pair tasks it participates in, keyed
    (tbl, bucket, chunk_a, chunk_b) with chunk_a <= chunk_b. An
    unordered vector pair with chunks (cu, cv) lands in exactly the
    task (min(cu,cv), max(cu,cv)) — so the union of all tasks' pair
    sets equals the uncapped bucket's pair set, each pair exactly once
    per bucket. Per-task row count is ~2n/C <= ~2*cap (one chunk's
    rows for the diagonal, two chunks' for off-diagonal), bounding the
    GEMM at ~cap^2 regardless of bucket skew. For n <= cap, C = 1 and
    the plan degenerates to today's one-task-per-bucket shape with
    zero replication.

    The bucket-size count is one extra groupBy over (tbl, bucket)
    on the CHECKPOINTED bucketized rows — key cardinality
    tables * 2^bits (512 here), so the join back is a broadcast, not
    a shuffle of the big side, and the hyperplane matmul runs once,
    not once per consumer.
    """
    # materialize the bucketized rows once: the sizes aggregate AND the
    # join probe side both consume them, and without a checkpoint each
    # branch re-runs the 32-table hyperplane matmul over every vector
    bucketed = bucketed.localCheckpoint(eager=True)
    sizes = bucketed.groupBy("tbl", "bucket").agg(
        F.ceil(F.count("*") / F.lit(cap)).cast("int").alias("n_chunks")
    )
    return (
        bucketed.join(F.broadcast(sizes), ["tbl", "bucket"])
        .withColumn("chunk", F.pmod(F.xxhash64("vec_id"), F.col("n_chunks")).cast("int"))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)))
        .select(
            "tbl",
            "bucket",
            F.least("chunk", "other").alias("chunk_a"),
            F.greatest("chunk", "other").alias("chunk_b"),
            "chunk",
            "vec_id",
            "embedding",
        )
    )


def _chunk_pair_fn(threshold: float):
    """applyInPandas kernel for one chunk-pair task: diagonal tasks
    (chunk_a == chunk_b) GEMM the chunk against itself; off-diagonal
    tasks GEMM chunk_a's rows against chunk_b's rows. Pairs are
    canonicalized (vec_a < vec_b) so the parent's distinct() only ever
    dedups multi-table collisions, exactly as in the uncapped plan."""

    empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
        {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
    )

    def chunk_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _tbl, _bucket, chunk_a, chunk_b = key
        if len(pdf) < 2:
            return empty
        if chunk_a == chunk_b:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ V.T
            ia, ib = np.nonzero(S >= threshold)
            ids = pdf["vec_id"].to_numpy()
            ids_a, ids_b = ids[ia], ids[ib]
            keep = ids_a < ids_b  # dedup symmetric matrix + self-pairs
            sims = S[ia, ib][keep]
            ids_a, ids_b = ids_a[keep], ids_b[keep]
        else:
            left = pdf[pdf["chunk"] == chunk_a]
            right = pdf[pdf["chunk"] == chunk_b]
            if left.empty or right.empty:
                return empty
            A = np.stack(left["embedding"].to_numpy()).astype(np.float64)
            B = np.stack(right["embedding"].to_numpy()).astype(np.float64)
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            S = A @ B.T
            ia, ib = np.nonzero(S >= threshold)
            la, rb = left["vec_id"].to_numpy()[ia], right["vec_id"].to_numpy()[ib]
            sims = S[ia, ib]
            ids_a, ids_b = np.minimum(la, rb), np.maximum(la, rb)
        return pd.DataFrame(
            {"vec_a": ids_a, "vec_b": ids_b, "cos_sim": np.round(sims, 6)}
        )

    return chunk_pairs


def _lsh_planes(tables: int, bits: int) -> np.ndarray:
    """Deterministic hyperplanes: (tables, bits, dim), seed fixed."""
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((tables, bits, LSH_DIM))


def lsh_bucket_udf(tables: int = LSH_TABLES, bits: int = LSH_BITS):
    """Vectorized bucketing: one Arrow batch in, per-table sign-bit
    bucket ids out (array<int>). One matmul per batch — the Python
    boundary is crossed per-batch, never per-row."""
    planes = _lsh_planes(tables, bits)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bucketize(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy())  # (batch, dim) float32
        sign = (M.astype(np.float64) @ planes.reshape(-1, LSH_DIM).T) > 0
        sign = sign.reshape(len(M), tables, bits)
        weights = 1 << np.arange(bits)
        buckets = (sign * weights).sum(axis=2).astype(np.int32)
        return pd.Series(list(buckets))

    return bucketize


@register(
    "knn_cosine_lsh",
    oracle=None,  # ANN: candidate set depends on LSH planes (numpy-
    # seeded, not SQL-portable). Tests assert recall vs the exact
    # brute-force oracle and determinism across runs.
    tags=("similarity", "knn", "lsh", "approx"),
)
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-K via random-hyperplane LSH (8 tables × 6 bits): bucket
    every vector with a vectorized pandas_udf, equi-join query buckets
    to candidate buckets, then rerank the (small) candidate set with
    exact cosine. Same output contract as `knn_cosine_bruteforce`."""
    emb = t(spark, sf_dir, "embeddings")
    bucketize = lsh_bucket_udf()
    bucketed = emb.select(
        "vec_id", "embedding", bucketize("embedding").alias("buckets")
    )
    longf = bucketed.select(
        "vec_id",
        "embedding",
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    # Broadcast the QUERY side (N_QUERIES x LSH_TABLES rows, no
    # embeddings) — the corpus side streams. Broadcasting the corpus
    # (the round-1 shape) inverts the size relation and OOMs the
    # driver at scale. The distinct() dedups bucket collisions across
    # tables BEFORE the query embedding is re-attached, so the shuffle
    # payload is one corpus embedding per candidate, not two.
    q = longf.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    c = longf.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "tbl",
        "bucket",
    )
    candidates = (
        F.broadcast(q)
        .join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "ce")
        .distinct()
    )
    q_emb = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sims = candidates.join(F.broadcast(q_emb), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_norm_stats",
    oracle="""
        WITH v AS (
            SELECT label,
                   sqrt(list_sum(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> x * x))) AS l2
            FROM embeddings
        )
        SELECT label,
               count(*) AS n_vectors,
               round(avg(l2), 6) AS avg_norm,
               round(min(l2), 6) AS min_norm,
               round(max(l2), 6) AS max_norm
        FROM v
        GROUP BY label
        ORDER BY label
    """,
    tags=("similarity", "array", "aggregate"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm distribution per label — array fold + plain aggregate
    (sanity profile for an embedding corpus: catches unnormalized or
    degenerate batches before they poison ANN)."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select("label", norm(F.col("embedding")).alias("l2"))
    return (
        v.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("l2"), 6).alias("avg_norm"),
            F.round(F.min("l2"), 6).alias("min_norm"),
            F.round(F.max("l2"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


IVF_CELLS = 16  # floor = the historically attested setting
IVF_NPROBE = 4
IVF_TRAIN_SAMPLE = 256 * IVF_CELLS  # FAISS-style: train on a bounded sample
IVF_KMEANS_ITERS = 5

# Adaptive sizing (VERDICT r9 task 2) — the policy SCALE.md's 100k
# knob sweep measured: per-cell size pinned at ~3k vectors (one
# comfortable in-task GEMM), so cells GROW with the corpus instead of
# degenerating to a constant-fraction scan (frozen 16 cells at 100k
# probed 50% of N → cost ~0.5·N², exact's exponent; 32 cells at the
# same probe fraction was 1.6× faster at recall 0.88 vs 0.84).
IVF_TARGET_CELL_SIZE = 3000
IVF_MAX_CELLS = 1 << 16  # 65536 cells ≈ 200M vectors before re-eval


def ivf_policy(n_vectors: int, probe_fraction: float = 0.5) -> tuple[int, int]:
    """(n_cells, nprobe) for a corpus of ``n_vectors``.

    cells = the power of two nearest N/IVF_TARGET_CELL_SIZE (log-space
    rounding), clamped to [IVF_CELLS, IVF_MAX_CELLS]; the floor keeps
    every corpus ≤ ~48k vectors at the attested 16-cell setting, so
    registered small-SF results are bit-identical to the frozen era.
    nprobe = probe_fraction·cells (each caller keeps its historical
    fraction: top-k serving probes 1/4, hard-negative mining 1/2 —
    mined targets sit deeper in the similarity order, see
    mining.HN_ANN_NPROBE). At 100k vectors this yields (32, 16) for
    the miner — exactly SCALE.md's measured sweep winner. Power-of-two
    snapping keeps the derived setting stable under ±10% corpus drift
    (a re-run near a boundary can't flip cells by one and churn every
    assignment)."""
    import math

    raw = max(n_vectors, 1) / IVF_TARGET_CELL_SIZE
    cells = 1 << max(0, math.floor(math.log2(raw) + 0.5))
    cells = max(IVF_CELLS, min(IVF_MAX_CELLS, cells))
    nprobe = max(1, round(cells * probe_fraction))
    return cells, nprobe


def _ivf_centroids(emb, n_cells: int = IVF_CELLS) -> "np.ndarray":
    """Deterministic spherical k-means coarse quantizer (Lloyd's,
    IVF_KMEANS_ITERS iterations, init = first n_cells sample
    vectors by vec_id). Trained on a fixed-size vec_id-ordered sample
    (256·n_cells vectors ≈ FAISS's ~256·k guidance) so training
    cost is O(1) in corpus size — the scale path trains on the sample
    and assigns the full corpus distributedly. Returns L2-normalized
    centroids, stable across runs and partitionings (sample selection
    and ordering are by vec_id, not partition layout). n_cells is the
    knob that grows with the corpus — callers derive it from
    `ivf_policy` (SCALE.md's measured crossing-point policy)."""
    pdf = (
        emb.filter(F.col("vec_id") < 256 * n_cells)
        .select("vec_id", "embedding")
        .toPandas()  # Arrow transfer — row collect pays py4j pickling
        .sort_values("vec_id")
    )
    X = np.stack(
        [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:n_cells].copy()
    for _ in range(IVF_KMEANS_ITERS):
        assign = (Xn @ C.T).argmax(axis=1)
        for j in range(n_cells):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
            # empty cell: keep the previous centroid (deterministic)
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return C


def _stage_centroids(path: str, Cn: "np.ndarray") -> None:
    """Persist the trained (cell, centroid) quantizer as ONE parquet
    file, written driver-side via pyarrow. The artifact is
    O(cells x dim) (~8 KB at 16x64) and already lives on the driver
    after training, so a Spark write job here is pure scheduling +
    commit-protocol overhead (guide §5: the driver should do almost
    no data work — and submitting a cluster job to move 8 KB is the
    inverse mistake). Readers are unchanged: spark.read.parquet
    reconstructs cell int / centroid array<double> exactly — float64
    bits roundtrip through the parquet DOUBLE physical type either
    way, which the persistence audit asserts."""
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    _os.makedirs(path, exist_ok=True)
    tbl = _pa.table({
        "cell": _pa.array(np.arange(len(Cn), dtype=np.int32)),
        "centroid": _pa.array(
            [row.tolist() for row in Cn],
            type=_pa.list_(_pa.float64()),
        ),
    })
    _pq.write_table(tbl, _os.path.join(path, "part-00000.parquet"))


@register(
    "knn_cosine_ivf",
    oracle=None,  # ANN: cell assignment depends on the coarse
    # quantizer; tests assert recall vs brute force + determinism.
    tags=("similarity", "knn", "ivf", "approx"),
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-K via IVF (inverted file) coarse quantization: vectors
    partition into cells by nearest centroid; each query probes only
    its nprobe nearest cells and reranks exactly within them.

    Cells/nprobe come from `ivf_policy` (adaptive: per-cell size
    pinned ~3k vectors, probe fraction 1/4 — this query's historical
    IVF_NPROBE/IVF_CELLS ratio), so the corpus count is read once up
    front (a column-pruned metadata-cheap count) and the probe cost
    stays ~N·√-free sub-quadratic as N grows instead of freezing at a
    constant fraction. Corpora ≤ ~48k vectors resolve to the attested
    (16, 4) setting, so registered results are unchanged.

    Centroids come from a deterministic spherical k-means over a
    bounded vec_id-ordered sample (`_ivf_centroids` — FAISS-style
    sample training, so the quantizer adapts to the data distribution
    while training cost stays O(1) in corpus size). vs LSH: IVF adapts
    to the data and gives tunable probe-vs-recall; cost = |Q| x
    nprobe/cells of the corpus."""
    emb = t(spark, sf_dir, "embeddings")
    n_cells, nprobe = ivf_policy(
        emb.count(), probe_fraction=IVF_NPROBE / IVF_CELLS
    )
    Cn = _ivf_centroids(emb, n_cells)

    def assign_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cells = (Vn @ Cn.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": cells,
                }
            )

    schema = "vec_id long, embedding array<float>, cell int"
    celled = emb.select("vec_id", "embedding").mapInPandas(assign_cells, schema)

    def probe_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = Vn @ Cn.T
            top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                    "qe": [e for e in pdf["embedding"] for _ in range(nprobe)],
                    "cell": top.ravel(),
                }
            )

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    )
    probes = queries.mapInPandas(
        probe_cells, "query_id long, qe array<float>, cell int"
    )
    candidates = probes.join(celled, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    sims = candidates.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_quantize_audit",
    oracle="""
        WITH v AS (
            SELECT label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        scaled AS (
            SELECT label,
                   list_max(list_transform(e, x -> abs(x))) / 127 AS scale,
                   e
            FROM v
        ),
        err AS (
            SELECT label, scale,
                   list_sum(list_transform(
                       e, x -> abs(x - floor(x / scale + 0.5) * scale)
                   )) / len(e) AS mean_err
            FROM scaled
        )
        SELECT label,
               count(*) AS n_vectors,
               round(CAST(sum(CAST(round(mean_err * 1000000000) AS BIGINT))
                          AS DOUBLE) / (1000000000.0 * count(*)), 6)
                   AS avg_abs_err,
               max(round(mean_err, 6)) AS max_abs_err,
               round(CAST(sum(CAST(round(scale * 1000000000) AS BIGINT))
                          AS DOUBLE) / (1000000000.0 * count(*)), 6)
                   AS avg_scale
        FROM err
        GROUP BY label
        ORDER BY label
    """,
    tags=("similarity", "array", "quantization"),
)
def embedding_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric-quantization audit — the compression every
    embedding store applies before ANN serving (4× memory cut): per
    vector, scale = max|x|/127, quantize with floor(x/scale + 0.5)
    (NOT round(): floor(+0.5) is identical IEEE arithmetic in every
    engine, while round()'s half-way rule differs between Spark's
    decimal-string HALF_UP and C-library binary rounding), then
    measure the round-trip error. Per-label aggregates of the
    per-vector mean absolute error and the scales.

    All array math is per-row (interpreted HOFs are fine for linear
    row-local work; the GEMM escape hatch is only for pairwise math).
    Cross-row determinism: per-row doubles are integer-scaled to
    nano-units before the cross-partition sum, so the reduce is exact.
    At 100 TB this is a pure map + one narrow aggregate."""
    emb = t(spark, sf_dir, "embeddings")
    e = as_double(F.col("embedding"))
    scale = (
        F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale")
    v = emb.select("label", e.alias("e"), scale)
    dequant_err = F.aggregate(
        F.transform(
            F.col("e"),
            lambda x: F.abs(
                x - F.floor(x / F.col("scale") + F.lit(0.5)) * F.col("scale")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(F.col("e"))
    err = v.select("label", "scale", dequant_err.alias("mean_err"))
    nano = F.lit(1000000000.0)
    return (
        err.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(
                F.sum(F.round(F.col("mean_err") * nano).cast("bigint")).cast("double")
                / (nano * F.count("*")),
                6,
            ).alias("avg_abs_err"),
            F.max(F.round("mean_err", 6)).alias("max_abs_err"),
            F.round(
                F.sum(F.round(F.col("scale") * nano).cast("bigint")).cast("double")
                / (nano * F.count("*")),
                6,
            ).alias("avg_scale"),
        )
        .orderBy("label")
    )


@register(
    "semdedup_embedding_clusters",
    oracle=f"""
        WITH RECURSIVE v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
              AND {sql_cosine('a.e', 'b.e')} >= {NEARDUP_COS}
        ),
        edges AS (
            SELECT vec_a AS u, vec_b AS w FROM pairs
            UNION ALL
            SELECT vec_b AS u, vec_a AS w FROM pairs
        ),
        reach(u, w) AS (
            SELECT u, w FROM edges
            UNION
            SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u
        ),
        labels AS (
            SELECT u AS vec_id, least(u, min(w)) AS cluster_id
            FROM reach GROUP BY u
        )
        SELECT cluster_id, vec_id,
               (vec_id = cluster_id) AS is_representative,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM labels
        ORDER BY cluster_id, vec_id
    """,
    tags=("similarity", "dedup", "semdedup", "iterative", "llm-pipeline"),
)
def semdedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (the SemDeDup recipe): embeddings whose cosine
    exceeds the near-dup threshold form a similarity graph; connected
    components collapse transitive chains (A~B, B~C => one cluster);
    one representative (min vec_id) survives per cluster. Output is
    the cluster assignment table a curation pipeline anti-joins
    against the corpus to drop semantic duplicates.

    Composition of two attested pieces: exact pair generation
    (`neardup_embeddings` — blocked GEMM; at 100 TB swap in the
    LSH-capped twin, identical pair schema) and the shared
    min-label-propagation component former (`dedup.py
    connected_components` — checkpointed, scalar-sum convergence).
    The DuckDB oracle recomputes components by recursive transitive
    closure, independently of the iterative algorithm."""
    from spark_hive_spark.operators.dedup import connected_components

    pairs = neardup_embeddings(spark, sf_dir).select("vec_a", "vec_b")
    # The fixture threshold (0.4 over near-random vectors) produces a
    # sparse long-chain graph — diameters of dozens, unlike the
    # shallow clusters of real near-dup corpora — so the iteration
    # bound is higher than the document former's 15.
    return connected_components(pairs, "vec_a", "vec_b", "vec_id", max_iters=60)


@register(
    "ann_recall_audit",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM v a, v b
            WHERE a.vec_id < b.vec_id
              AND {sql_cosine('a.e', 'b.e')} >= {NEARDUP_COS}
        )
        SELECT * FROM (
            SELECT 'ivf' AS method,
                   CAST({N_QUERIES} * {TOP_K} AS BIGINT) AS n_exact,
                   TRUE AS recall_ok,
                   CAST(0 AS BIGINT) AS precision_violations
            UNION ALL
            SELECT 'knn' AS method,
                   CAST({N_QUERIES} * {TOP_K} AS BIGINT) AS n_exact,
                   TRUE AS recall_ok,
                   CAST(0 AS BIGINT) AS precision_violations
            UNION ALL
            SELECT 'neardup' AS method,
                   (SELECT count(*) FROM pairs) AS n_exact,
                   TRUE AS recall_ok,
                   CAST(0 AS BIGINT) AS precision_violations
        ) ORDER BY method
    """,
    tags=("similarity", "ann", "audit", "lsh"),
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable quality gate for the seed-dependent ANN pair —
    the exactness-bracket recipe (VERDICT r4 #4) applied to the two
    operators whose raw outputs legitimately cannot have SQL oracles
    (the candidate sets depend on numpy-seeded hyperplanes):

    - `neardup`: recall of `neardup_embeddings_lsh` against the exact
      pair set (banding analysis predicts 0.996; gate at the
      invariant suite's 0.9 floor), and the count of emitted pairs
      NOT in the exact set ignoring threshold-boundary float noise
      (candidate verification is exact, so this must be 0).
    - `knn` / `ivf`: recall@{TOP_K} of `knn_cosine_lsh` /
      `knn_cosine_ivf` against brute force, and the count of returned
      neighbors whose reported cosine disagrees with the brute-force
      cosine for the same pair (reranking is exact: must be 0). Floors
      differ by method: LSH gates at the suite's 0.2 (near-random
      vectors make random-hyperplane top-k recall modest by
      construction); IVF gates at 0.8 — its k-means quantizer adapts
      to the distribution (measured 0.90 @ sf0.01, 0.96 @ sf0.1).

    The oracle reproduces n_exact from first principles in DuckDB and
    pins the booleans/violation counts, so a silently broken LSH path
    (bad banding, wrong verification) flips a driver row, not just a
    pytest."""
    # checkpoint every frame with >1 consumer: the exact GEMM feeds a
    # count + two joins, the LSH pairs feed two joins, and brute-force
    # kNN feeds a count + a join per audited method — without this the
    # expensive applyInPandas stages re-execute per consumer
    exact = (
        neardup_embeddings(spark, sf_dir)
        .select("vec_a", "vec_b")
        .localCheckpoint(eager=True)
    )
    lsh = (
        neardup_embeddings_lsh(spark, sf_dir)
        .select("vec_a", "vec_b", "cos_sim")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.agg(F.count("*").alias("n")).select(
        F.col("n").alias("n_exact")
    )
    hit = lsh.join(exact, ["vec_a", "vec_b"], "inner").agg(
        F.count("*").alias("n_hit")
    )
    # pairs emitted but not exact, excluding threshold-boundary noise
    viol = (
        lsh.join(exact, ["vec_a", "vec_b"], "left_anti")
        .filter(F.abs(F.col("cos_sim") - F.lit(NEARDUP_COS)) > 1e-6)
        .agg(F.count("*").alias("n_viol"))
    )
    neardup_row = (
        n_exact.crossJoin(hit)
        .crossJoin(viol)
        .select(
            F.lit("neardup").alias("method"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("n_hit") / F.col("n_exact") >= 0.9).alias("recall_ok"),
            F.col("n_viol").cast("bigint").alias("precision_violations"),
        )
    )

    brute = (
        knn_cosine_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id", F.col("cos_sim").alias("brute_cos"))
        .localCheckpoint(eager=True)
    )

    def knn_audit_row(label: str, ann: DataFrame, floor: float) -> DataFrame:
        ann = ann.select("query_id", "neighbor_id", "cos_sim")
        k_hit = ann.join(brute, ["query_id", "neighbor_id"], "inner").localCheckpoint(
            eager=True
        )
        k_total = brute.agg(F.count("*").alias("n_exact"))
        k_recall = k_hit.agg(F.count("*").alias("n_hit"))
        k_viol = k_hit.filter(
            F.abs(F.col("cos_sim") - F.col("brute_cos")) > 1e-6
        ).agg(F.count("*").alias("n_viol"))
        return (
            k_total.crossJoin(k_recall)
            .crossJoin(k_viol)
            .select(
                F.lit(label).alias("method"),
                F.col("n_exact").cast("bigint").alias("n_exact"),
                (F.col("n_hit") / F.col("n_exact") >= floor).alias("recall_ok"),
                F.col("n_viol").cast("bigint").alias("precision_violations"),
            )
        )

    knn_row = knn_audit_row("knn", knn_cosine_lsh(spark, sf_dir), 0.2)
    ivf_row = knn_audit_row("ivf", knn_cosine_ivf(spark, sf_dir), 0.8)
    return (
        neardup_row.unionByName(knn_row).unionByName(ivf_row).orderBy("method")
    )


_FUZZY_SQL = """
    WITH names AS (
        SELECT p_name, count(*) AS n_parts
        FROM {part}
        GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a
    JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND abs(length(a.p_name) - length(b.p_name)) <= 3
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY edit_dist, name_a, name_b
"""


@register(
    "fuzzy_levenshtein_part_pairs",
    oracle=_FUZZY_SQL.format(part="part"),
    tags=("fuzzy-join", "levenshtein", "record-linkage"),
)
def fuzzy_levenshtein_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (record linkage): part-name pairs
    within edit distance 3, candidate-generated by a blocking key —
    the name's second token (split_part position 2) — plus a length band (|len_a - len_b| <= d
    is a lower bound on Levenshtein, so the band never loses a true
    pair within a block). The expensive quadratic comparison runs on
    the DISTINCT-name vocabulary, not the row set: the first
    aggregation collapses N part rows to the catalog vocabulary
    (64 names here; bounded by distinct entities, not data volume, at
    100 TB), carries per-name row counts through, and the equi-join on
    the blocking key keeps Catalyst on a hash join — `levenshtein`
    evaluates only on within-block, length-banded survivors.

    Identical SQL runs in both engines (split_part/levenshtein have
    shared semantics), so the oracle is verbatim."""
    part = t(spark, sf_dir, "part")
    return spark.sql(_FUZZY_SQL, part=part)


@register(
    "ann_index_persistence_audit",
    # n_cells re-derives ivf_policy in SQL: power of two nearest
    # N/IVF_TARGET_CELL_SIZE (log-space floor(x+0.5)), floored at
    # IVF_CELLS. Policy boundaries are irrational multiples of 3000,
    # so integer N never lands on a .5 rounding edge in either engine.
    oracle=f"""
        WITH n AS (SELECT count(*) AS n_vectors FROM embeddings)
        SELECT CAST(GREATEST({IVF_CELLS}, LEAST({IVF_MAX_CELLS},
                   power(2, GREATEST(0, FLOOR(log2(
                       GREATEST(n_vectors, 1) / {IVF_TARGET_CELL_SIZE}.0
                   ) + 0.5))))) AS INT) AS n_cells,
               n_vectors,
               TRUE AS centroids_roundtrip_exact,
               TRUE AS assignments_match_after_reload
        FROM n
    """,
    tags=("similarity", "ivf", "index", "persistence"),
)
def ann_index_persistence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index LIFECYCLE for the IVF quantizer — build → persist →
    reload → re-assign, the operational loop a real vector index
    lives by (train once, serve from storage): centroids persist to
    parquet as (cell, array<double>) rows, a fresh read reconstructs
    them, and the corpus is assigned to cells twice — once with the
    in-memory centroids, once with the reloaded ones — comparing
    per-vector cell ids distributedly (a join + mismatch count, no
    collect of assignments). The emitted booleans flip the driver
    hash if parquet damages a single centroid bit (float64 arrays
    roundtrip bit-exact) or any of the vectors lands in a different
    cell after reload.

    Scale: the index artifact is tiny (cells x dim); assignment is
    the same narrow mapInPandas as serving. This is the persistence
    seam where a FAISS/ScaNN index file would slot in — here the
    artifact is plain parquet so the whole lifecycle stays
    engine-native."""
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    emb = t(spark, sf_dir, "embeddings")
    n_cells, _ = ivf_policy(emb.count())
    Cn = _ivf_centroids(emb, n_cells)

    idx_dir = _os.path.join(
        scratch_root(), f"shs_ivf_idx_{_uuid.uuid4().hex}"
    )
    _stage_centroids(idx_dir, Cn)

    back = spark.read.parquet(idx_dir).orderBy("cell").collect()
    Cn2 = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in back])
    roundtrip_exact = bool((Cn2 == Cn).all())

    # both assignments in ONE Arrow pass per partition (the corpus is
    # normalized once, multiplied against both centroid sets, and the
    # mismatch compares locally) — the previous two-mapInPandas + join
    # formulation paid a second full scan, a second worker round-trip,
    # and a vec_id shuffle for what is a row-local comparison
    # (measured 5.1 s -> ~3 s at sf0.1)
    def assign_both(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            c1 = (Vn @ Cn.T).argmax(axis=1).astype(np.int32)
            c2 = (Vn @ Cn2.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell_a": c1, "cell_b": c2}
            )

    both = emb.select("vec_id", "embedding").mapInPandas(
        assign_both, "vec_id long, cell_a int, cell_b int"
    )
    cmp = both.agg(
        F.count("*").alias("n_vectors"),
        F.sum(
            (F.col("cell_a") != F.col("cell_b")).cast("long")
        ).alias("n_mismatch"),
    )
    return cmp.select(
        F.lit(len(Cn)).cast("int").alias("n_cells"),
        "n_vectors",
        F.lit(roundtrip_exact).alias("centroids_roundtrip_exact"),
        (F.col("n_mismatch") == 0).alias("assignments_match_after_reload"),
    )



@register(
    "entity_resolution_name_clusters",
    oracle=f"""
        WITH RECURSIVE names AS (
            SELECT p_name, min(p_partkey) AS name_id
            FROM part GROUP BY p_name
        ),
        fpairs AS (
            SELECT a.name_id AS id_a, b.name_id AS id_b
            FROM names a
            JOIN names b
              ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
             AND abs(length(a.p_name) - length(b.p_name)) <= 3
             AND a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM fpairs
            UNION ALL
            SELECT id_b, id_a FROM fpairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        labels AS (
            SELECT u AS name_id, least(u, min(v)) AS cluster_id
            FROM reach GROUP BY u
        )
        SELECT l.cluster_id, n.p_name,
               (l.name_id = l.cluster_id) AS is_representative,
               count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
        FROM labels l JOIN names n ON l.name_id = n.name_id
        ORDER BY l.cluster_id, n.p_name
    """,
    tags=("entity-resolution", "fuzzy", "graph", "record-linkage"),
)
def entity_resolution_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end — the composite every MDM /
    customer-360 pipeline runs: BLOCK (second-token + length band),
    MATCH (Levenshtein <= 3 over the distinct-name vocabulary),
    CLUSTER (connected components over the match graph, so A~B and
    B~C resolve to ONE entity even when A and C never matched
    directly), ELECT a representative (min stable id). Reuses the
    fuzzy candidate generator and the checkpointed min-label
    propagation from the dedup pipeline; names get stable integer
    node ids (min partkey per name) so the iteration runs on 8-byte
    keys.

    The oracle recomputes the clusters by recursive transitive
    closure — an exact independent check of the iterative
    distributed algorithm, same pattern as dedup_duplicate_clusters."""
    from spark_hive_spark.operators.dedup import connected_components

    part = t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("name_id"))
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (
                F.split_part(F.col("a.p_name"), F.lit(" "), F.lit(2))
                == F.split_part(F.col("b.p_name"), F.lit(" "), F.lit(2))
            )
            & (
                F.abs(
                    F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))
                )
                <= 3
            )
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.name_id").alias("id_a"), F.col("b.name_id").alias("id_b")
        )
    )
    clusters = connected_components(pairs, "id_a", "id_b", "name_id")
    return (
        clusters.join(F.broadcast(names), "name_id")
        .select(
            "cluster_id",
            "p_name",
            "is_representative",
            "cluster_size",
        )
        .orderBy("cluster_id", "p_name")
    )


@register(
    "snm_sorted_neighborhood_pairs",
    oracle="""
        WITH names AS (
            SELECT p_name,
                   array_to_string(list_sort(string_split(p_name, ' ')), ' ')
                       AS snm_key
            FROM (SELECT DISTINCT p_name FROM part)
        ),
        ranked AS (
            SELECT p_name, snm_key,
                   substr(snm_key, 1, 1) AS blk,
                   lead(p_name, 1) OVER w AS next1_name,
                   lead(snm_key, 1) OVER w AS next1_key,
                   lead(p_name, 2) OVER w AS next2_name,
                   lead(snm_key, 2) OVER w AS next2_key
            FROM names
            WINDOW w AS (PARTITION BY substr(snm_key, 1, 1)
                         ORDER BY snm_key, p_name)
        ),
        cands AS (
            SELECT p_name AS name_a, next1_name AS name_b,
                   snm_key AS key_a, next1_key AS key_b
            FROM ranked WHERE next1_name IS NOT NULL
            UNION ALL
            SELECT p_name, next2_name, snm_key, next2_key
            FROM ranked WHERE next2_name IS NOT NULL
        )
        SELECT name_a, name_b,
               CAST(levenshtein(key_a, key_b) AS INT) AS key_dist
        FROM cands
        WHERE levenshtein(key_a, key_b) <= 3
        ORDER BY name_a, name_b
    """,
    tags=("entity-resolution", "blocking", "sorted-neighborhood", "fuzzy"),
)
def snm_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood method (SNM) blocking for record linkage —
    the OTHER classic blocking strategy next to token blocking
    (`entity_resolution_name_clusters`): build a sort key from the
    name's SORTED tokens (so word-order variants land adjacent, a
    family token blocking on positional tokens can miss), sort, and
    compare each record only against its next w=2 neighbors —
    O(n*w) candidates instead of O(n^2). Matches are neighbor pairs
    whose keys sit within Levenshtein 3.

    Scale: the sort is Spark's distributed range-partitioned sort,
    and the neighbor window PARTITIONS BY the key's first character —
    each block's window runs in parallel with no single-partition
    bottleneck (the classic SNM sequential scan, parallelized the
    way production linkage systems do: sort once, slide locally).
    Levenshtein runs JVM-side on w*n candidate pairs only."""
    part = t(spark, sf_dir, "part")
    from pyspark.sql import Window as W

    names = part.select("p_name").distinct().select(
        "p_name",
        F.array_join(F.array_sort(F.split("p_name", " ")), " ").alias(
            "snm_key"
        ),
    )
    w = W.partitionBy(F.substring("snm_key", 1, 1)).orderBy(
        "snm_key", "p_name"
    )
    ranked = names.select(
        "p_name",
        "snm_key",
        F.lead("p_name", 1).over(w).alias("next1_name"),
        F.lead("snm_key", 1).over(w).alias("next1_key"),
        F.lead("p_name", 2).over(w).alias("next2_name"),
        F.lead("snm_key", 2).over(w).alias("next2_key"),
    )
    cands = (
        ranked.filter(F.col("next1_name").isNotNull())
        .select(
            F.col("p_name").alias("name_a"),
            F.col("next1_name").alias("name_b"),
            F.col("snm_key").alias("key_a"),
            F.col("next1_key").alias("key_b"),
        )
        .unionByName(
            ranked.filter(F.col("next2_name").isNotNull()).select(
                F.col("p_name").alias("name_a"),
                F.col("next2_name").alias("name_b"),
                F.col("snm_key").alias("key_a"),
                F.col("next2_key").alias("key_b"),
            )
        )
    )
    dist = F.levenshtein("key_a", "key_b")
    return (
        cands.filter(dist <= 3)
        .select("name_a", "name_b", dist.cast("int").alias("key_dist"))
        .orderBy("name_a", "name_b")
    )


@register(
    "blocking_recall_audit",
    oracle="""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        truth AS (
            SELECT a.p_name AS na, b.p_name AS nb
            FROM names a JOIN names b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        ),
        token_cand AS (
            SELECT a.p_name AS na, b.p_name AS nb
            FROM names a JOIN names b
              ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
             AND abs(length(a.p_name) - length(b.p_name)) <= 3
             AND a.p_name < b.p_name
        ),
        keyed AS (
            SELECT p_name,
                   array_to_string(list_sort(string_split(p_name, ' ')), ' ')
                       AS k
            FROM names
        ),
        ranked AS (
            SELECT p_name, k,
                   lead(p_name, 1) OVER w AS n1,
                   lead(p_name, 2) OVER w AS n2
            FROM keyed
            WINDOW w AS (PARTITION BY substr(k, 1, 1) ORDER BY k, p_name)
        ),
        snm_cand AS (
            SELECT least(p_name, n1) AS na, greatest(p_name, n1) AS nb
            FROM ranked WHERE n1 IS NOT NULL
            UNION
            SELECT least(p_name, n2), greatest(p_name, n2)
            FROM ranked WHERE n2 IS NOT NULL
        )
        SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
               CAST((SELECT count(*) FROM token_cand) AS BIGINT)
                   AS token_candidates,
               CAST((SELECT count(*) FROM truth t
                     JOIN token_cand c ON t.na = c.na AND t.nb = c.nb)
                   AS BIGINT) AS token_hits,
               CAST((SELECT count(*) FROM snm_cand) AS BIGINT)
                   AS snm_candidates,
               CAST((SELECT count(*) FROM truth t
                     JOIN snm_cand c ON t.na = c.na AND t.nb = c.nb)
                   AS BIGINT) AS snm_hits
    """,
    tags=("entity-resolution", "blocking", "recall", "meta-audit"),
)
def blocking_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation RECALL audit for the two record-linkage
    blocking schemes against EXHAUSTIVE ground truth — the evaluation
    every linkage deployment owes its blocking choice: true pairs =
    the full quadratic Levenshtein sweep (affordable here because the
    distinct-name vocabulary is bounded — the same reason production
    audits run on a sample), then each scheme's candidate set scores
    hits and candidate volume. Hits/candidates is the recall/cost
    frontier: token blocking generates more candidates, SNM fewer —
    what each MISSES is the number that matters.

    Scale: ground truth is quadratic ONLY in the deduplicated
    vocabulary; candidates reuse the registered schemes' exact
    blocking predicates; every count is exact."""
    part = t(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    truth = (
        a.join(b, F.col("a.p_name") < F.col("b.p_name"))
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb")
        )
    )
    token_cand = (
        a.join(
            b,
            (
                F.split_part(F.col("a.p_name"), F.lit(" "), F.lit(2))
                == F.split_part(F.col("b.p_name"), F.lit(" "), F.lit(2))
            )
            & (
                F.abs(
                    F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))
                )
                <= 3
            )
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("na"), F.col("b.p_name").alias("nb")
        )
    )
    keyed = names.select(
        "p_name",
        F.array_join(F.array_sort(F.split("p_name", " ")), " ").alias("k"),
    )
    w = W.partitionBy(F.substring("k", 1, 1)).orderBy("k", "p_name")
    ranked = keyed.select(
        "p_name",
        F.lead("p_name", 1).over(w).alias("n1"),
        F.lead("p_name", 2).over(w).alias("n2"),
    )
    snm_cand = (
        ranked.filter(F.col("n1").isNotNull())
        .select(
            F.least("p_name", "n1").alias("na"),
            F.greatest("p_name", "n1").alias("nb"),
        )
        .unionByName(
            ranked.filter(F.col("n2").isNotNull()).select(
                F.least("p_name", "n2").alias("na"),
                F.greatest("p_name", "n2").alias("nb"),
            )
        )
        .distinct()
    )
    truth = truth.localCheckpoint(eager=False)

    def hits(cand):
        return truth.join(cand, ["na", "nb"]).agg(
            F.count("*").alias("h")
        )

    counts = [
        truth.agg(F.count("*").alias("n_true_pairs")),
        token_cand.agg(F.count("*").alias("token_candidates")),
        hits(token_cand).withColumnRenamed("h", "token_hits"),
        snm_cand.agg(F.count("*").alias("snm_candidates")),
        hits(snm_cand).withColumnRenamed("h", "snm_hits"),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(F.broadcast(c))
    return out.select(
        F.col("n_true_pairs").cast("bigint").alias("n_true_pairs"),
        F.col("token_candidates").cast("bigint").alias("token_candidates"),
        F.col("token_hits").cast("bigint").alias("token_hits"),
        F.col("snm_candidates").cast("bigint").alias("snm_candidates"),
        F.col("snm_hits").cast("bigint").alias("snm_hits"),
    )


PCA_ITERS = 8


@register(
    "embedding_pca_power_iteration",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(len(first(embedding)) AS INT) AS dim,
               CAST(1 AS INT) AS unit_norm_ok,
               CAST(1 AS INT) AS lambda_positive,
               CAST(1 AS INT) AS lambda_le_trace,
               CAST(1 AS INT) AS rayleigh_monotone
        FROM embeddings
    """,
    tags=("similarity", "pca", "linear-algebra", "iterative"),
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding matrix by DISTRIBUTED
    POWER ITERATION — the linear-algebra-at-scale pattern: each round
    computes w = Xᵀ(Xv) as per-Arrow-batch partials (a d-vector per
    batch, the only data that leaves the executors), the driver sums
    the bounded partial set and renormalizes, and the d-dim iterate
    broadcasts back inside the next round's closure. No n x n or
    n x d matrix ever materializes off the executors — the same
    dataflow runs at any corpus size with driver traffic
    O(batches x d) per round.

    Exactness-bracket surface (eigenvector floats are not
    SQL-portable): exact corpus geometry (n, dim) plus four pinned
    invariants — unit-norm iterate, positive Rayleigh quotient,
    lambda <= trace(XᵀX), and the power-iteration guarantee that the
    Rayleigh quotient is nondecreasing across rounds. A pytest
    additionally pins the distributed result to a single-node numpy
    run of the identical algorithm (tests/test_invariants.py)."""
    emb = t(spark, sf_dir, "embeddings")
    first = emb.select("embedding").first()
    dim = len(first.embedding)
    n = emb.count()

    def matvec(v):
        def f(batches):
            for pdf in batches:
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                w = X.T @ (X @ v)
                tr = float((X * X).sum())
                yield pd.DataFrame({"w": [w.tolist()], "tr": [tr]})

        return f

    v = np.ones(dim, dtype=np.float64) / np.sqrt(dim)
    lambdas = []
    trace = None
    for _ in range(PCA_ITERS):
        parts = emb.select("embedding").mapInPandas(
            matvec(v), "w array<double>, tr double"
        ).collect()  # bounded: one row per Arrow batch
        w = np.sum([np.asarray(r.w) for r in parts], axis=0)
        trace = float(np.sum([r.tr for r in parts]))
        lam = float(v @ w)  # Rayleigh quotient v^T X^T X v (v unit)
        lambdas.append(lam)
        v = w / np.linalg.norm(w)
    monotone = all(
        b >= a - 1e-6 * abs(b) for a, b in zip(lambdas, lambdas[1:])
    )
    return spark.createDataFrame(
        [
            (
                n,
                dim,
                int(abs(float(np.linalg.norm(v)) - 1.0) < 1e-9),
                int(lambdas[-1] > 0),
                int(lambdas[-1] <= trace * (1 + 1e-9)),
                int(monotone),
            )
        ],
        "n_vectors bigint, dim int, unit_norm_ok int, lambda_positive int,"
        " lambda_le_trace int, rayleigh_monotone int",
    )




# --- Product quantization (PQ) + asymmetric distance (ADC) ---------------

PQ_M = 8  # subspaces (64-dim -> 8 x 8-dim)
PQ_K = 16  # centroids per subspace codebook
PQ_ITERS = 5
PQ_TRAIN_SAMPLE = 64 * PQ_K  # bounded vec_id-ordered training sample
PQ_SHORTLIST_MIN = 100
PQ_SHORTLIST_DIV = 20  # shortlist = max(100, N/20): a ~5% candidate rate
PQ_RECALL_FLOOR = 0.7  # measured 0.98 / 0.88 / 0.80 at sf0.001/0.01/0.1
PQ_MSE_CEIL = 0.75  # measured 0.55-0.60; k-means rate-distortion
# estimate k^(-2/d) = 16^(-1/4) = 0.5 for 16 centroids per 8-dim
# subspace of an isotropic unit vector


def _pq_codebooks(emb) -> "np.ndarray":
    """Deterministic per-subspace Lloyd's k-means (PQ_ITERS rounds,
    init = first PQ_K sample subvectors by vec_id) over a bounded
    vec_id-ordered sample of L2-NORMALIZED vectors — product
    quantization a la Jegou et al., "Product Quantization for
    Nearest Neighbor Search" (TPAMI 2011). Returns (M, K, dim/M)
    float64 codebooks; training cost is O(1) in corpus size (the
    same FAISS-style sample-train/assign-distributed split as
    `_ivf_centroids`)."""
    rows = (
        emb.filter(F.col("vec_id") < PQ_TRAIN_SAMPLE)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = Xn.shape[1]
    sub = dim // PQ_M
    books = []
    for m in range(PQ_M):
        S = Xn[:, m * sub : (m + 1) * sub]
        C = S[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(PQ_K):
                members = S[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
                # empty cell: keep previous centroid (deterministic)
        books.append(C)
    return np.stack(books)


@register(
    "embedding_pq_adc_audit",
    oracle=f"""
        SELECT CAST({PQ_M} AS INT) AS m_subspaces,
               CAST({PQ_K} AS INT) AS codebook_k,
               (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
                   AS n_vectors,
               CAST(GREATEST({PQ_SHORTLIST_MIN},
                    (SELECT count(*) FROM embeddings)
                        // {PQ_SHORTLIST_DIV}) AS INT) AS shortlist,
               CAST({N_QUERIES} * {TOP_K} AS BIGINT) AS n_exact,
               TRUE AS recall_ok,
               CAST(0 AS BIGINT) AS adc_violations,
               CAST(0 AS BIGINT) AS rerank_violations,
               TRUE AS mse_ok,
               CAST(32 AS INT) AS compression_ratio_x
    """,
    tags=("similarity", "pq", "ann", "quantization", "audit"),
)
def embedding_pq_adc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION with ADC shortlist + exact rerank, audited
    hash-green end to end — the memory-bound half of a production
    vector index (IVF-ADC with reranking, Jegou et al. TPAMI 2011):
    64-dim float32 vectors (256 B) compress to 8 byte-aligned 4-bit
    codes (8 B, 32x); queries score the WHOLE corpus from an (M x K)
    inner-product lookup table without decompressing anything, keep a
    shortlist of max({PQ_SHORTLIST_MIN}, N/{PQ_SHORTLIST_DIV})
    candidates, and rerank only the shortlist with exact cosine —
    the standard deployment shape, because on structure-free vectors
    raw ADC rank order is noise (recall@5 of ADC-only measured 0.16
    on this isotropic fixture: quantization error dwarfs the tiny
    cosine gaps between near-orthogonal vectors; the SHORTLIST is
    what PQ can honestly promise there).

    The audit pins, distributedly:
      - recall@{TOP_K}: exact-rerank-of-shortlist vs the exact twin
        (`knn_cosine_bruteforce`) >= {PQ_RECALL_FLOOR} (measured
        0.98/0.88/0.80 at sf0.001/0.01/0.1 — isotropic vectors are
        PQ's worst case, real embedding manifolds quantize far
        better);
      - adc_violations = 0: every batch cross-checks its LUT sums
        against q . x_hat on the reconstructed candidate — the LUT
        decomposition is exact algebra, so any violation is broken
        code/LUT bookkeeping, not approximation error;
      - rerank_violations = 0: reranked cosines must equal the exact
        twin's on every common (query, neighbor) to 1e-6;
      - mse_ok: mean ||x_n - x_hat||^2 <= {PQ_MSE_CEIL} (measured
        0.55-0.60 vs the k^(-2/d) = 0.5 rate-distortion estimate).

    Scale: codebooks are (8 x 16 x 8) floats trained on a bounded
    vec_id-ordered sample; encode+score is ONE narrow mapInPandas
    pass (one argmin + one LUT gather per Arrow batch, per-batch
    local top-shortlist, global window refinement — the engine's
    two-level top-k argument); the rerank touches shortlist rows
    only. Codes travel as 8 small ints — at 100 TB the scored relation
    is 32x smaller than the raw embedding column."""
    emb = t(spark, sf_dir, "embeddings")
    books = _pq_codebooks(emb)  # (M, K, sub)
    sub = books.shape[2]
    n_corpus = emb.count()  # bounded scalar probe (sizes the shortlist)
    shortlist = max(PQ_SHORTLIST_MIN, n_corpus // PQ_SHORTLIST_DIV)

    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_rows.sort(key=lambda r: r.vec_id)
    Q = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    # inner-product LUTs: luts[q, m, k] = q_m . c_{m,k}
    luts = np.einsum("qmd,mkd->qmk", Qn.reshape(len(Qn), PQ_M, sub), books)

    def encode_score(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn.reshape(len(Vn), PQ_M, sub)
            d2 = ((S[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2)  # (B, M)
            adc = luts[:, np.arange(PQ_M)[None, :], codes].sum(axis=2)
            # exactness cross-check: q . x_hat from reconstruction
            xhat = books[np.arange(PQ_M)[None, :], codes]  # (B, M, sub)
            direct = np.einsum("qd,bd->qb", Qn, xhat.reshape(len(Vn), -1))
            viol = int((np.abs(adc - direct) > 1e-9).sum())
            se = (
                (Vn.reshape(len(Vn), -1) - xhat.reshape(len(Vn), -1)) ** 2
            ).sum(axis=1)
            ids = pdf["vec_id"].to_numpy()
            # per-batch local top-shortlist per query (global window
            # refines); batch stats ride a query_id=-1 sentinel row so
            # no batch composition can drop them
            out_q, out_n, out_s = [-1], [-1], [-999.0]
            for qi in range(len(q_ids)):
                mask = ids != q_ids[qi]
                # (score desc, id asc) total order — the engine-wide
                # tie-break contract; plain argsort would make the
                # shortlist cut depend on batch composition when
                # 6-dp-rounded ADC scores tie at the boundary
                order = np.lexsort(
                    (ids[mask], -np.round(adc[qi][mask], 6))
                )[:shortlist]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(ids[mask][order].tolist())
                out_s.extend(np.round(adc[qi][mask][order], 6).tolist())
            pad = [0] * (len(out_q) - 1)
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "adc_sim": pd.Series(out_s, dtype="float64"),
                    "n_rows": pd.Series([len(Vn)] + pad, dtype="int64"),
                    "sum_se": pd.Series(
                        [float(se.sum())] + [0.0] * len(pad),
                        dtype="float64",
                    ),
                    "n_viol": pd.Series([viol] + pad, dtype="int64"),
                }
            )

    scored = (
        emb.select("vec_id", "embedding")
        .mapInPandas(
            encode_score,
            "query_id long, neighbor_id long, adc_sim double,"
            " n_rows long, sum_se double, n_viol long",
        )
        .localCheckpoint(eager=True)
    )

    w_sl = W.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    sl = (
        scored.filter(F.col("query_id") >= 0)
        .withColumn("rank", F.row_number().over(w_sl))
        .filter(F.col("rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact rerank of the shortlist only: join back the raw vectors,
    # score each (query, candidate) with true cosine in one pass
    cand = sl.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )

    def rerank(batches):
        qmap = {int(q_ids[i]): Qn[i] for i in range(len(q_ids))}
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            qs = np.stack([qmap[int(q)] for q in pdf["query_id"]])
            cos = np.round((qs * Vn).sum(axis=1), 6)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cos_sim": cos,
                }
            )

    reranked = cand.mapInPandas(
        rerank, "query_id long, neighbor_id long, cos_sim double"
    )
    w_k = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    pq_topk = (
        reranked.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
        .localCheckpoint(eager=True)
    )

    exact = knn_cosine_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cos_sim").alias("brute_cos")
    ).localCheckpoint(eager=True)
    hit = pq_topk.join(
        exact, ["query_id", "neighbor_id"], "inner"
    ).localCheckpoint(eager=True)
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    n_rr_viol = hit.filter(
        F.abs(F.col("cos_sim") - F.col("brute_cos")) > 1e-6
    ).agg(F.count("*").alias("rr_viol"))
    corpus = scored.agg(
        F.sum("n_rows").alias("n_vectors"),
        F.sum("sum_se").alias("total_se"),
        F.sum("n_viol").alias("adc_viol"),
    )
    return (
        corpus.crossJoin(n_exact)
        .crossJoin(n_hit)
        .crossJoin(n_rr_viol)
        .select(
            F.lit(PQ_M).cast("int").alias("m_subspaces"),
            F.lit(PQ_K).cast("int").alias("codebook_k"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.lit(shortlist).cast("int").alias("shortlist"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("n_hit") / F.col("n_exact") >= PQ_RECALL_FLOOR).alias(
                "recall_ok"
            ),
            F.col("adc_viol").cast("bigint").alias("adc_violations"),
            F.col("rr_viol").cast("bigint").alias("rerank_violations"),
            (F.col("total_se") / F.col("n_vectors") <= PQ_MSE_CEIL).alias(
                "mse_ok"
            ),
            F.lit(32).cast("int").alias("compression_ratio_x"),
        )
    )


def _ivf_assigner(C):
    """mapInPandas factory: assign each vector to its nearest
    centroid (one numpy GEMM per Arrow batch) — shared by the index
    maintenance audits."""
    def assign(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64
            )
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "embedding": pdf["embedding"],
                "cell": (Vn @ C.T).argmax(axis=1).astype(np.int32),
            })
    return assign

@register(
    "ann_incremental_index_audit",
    # n_cells re-derives ivf_policy over the V1 corpus count — the
    # index is sized at build time and NOT re-trained on append
    oracle=f"""
        WITH v1 AS (
            SELECT count(*) AS n FROM embeddings WHERE vec_id % 4 <> 3
        ),
        b AS (
            SELECT count(*) AS n FROM embeddings WHERE vec_id % 4 = 3
        )
        SELECT CAST((SELECT n FROM v1) AS BIGINT) AS n_v1,
               CAST((SELECT n FROM b) AS BIGINT) AS n_batch,
               CAST(GREATEST({IVF_CELLS}, LEAST({IVF_MAX_CELLS},
                   power(2, GREATEST(0, FLOOR(log2(
                       GREATEST((SELECT n FROM v1), 1)
                       / {IVF_TARGET_CELL_SIZE}.0
                   ) + 0.5))))) AS INT) AS n_cells,
               CAST((SELECT n FROM v1) + (SELECT n FROM b) AS BIGINT)
                   AS postings_total,
               TRUE AS centroids_unchanged,
               TRUE AS v1_postings_intact,
               TRUE AS recall_ok,
               CAST(0 AS BIGINT) AS precision_violations
    """,
    tags=("similarity", "ivf", "index", "incremental", "audit"),
)
def ann_incremental_index_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ANN index MAINTENANCE (round 19, r18 verdict #4)
    — the similarity twin of `dedup_incremental_index_update`: the
    persisted IVF index (`ann_index_persistence_audit`) gains an
    APPEND path, so a growing corpus no longer forces a full
    re-index. The production cycle, each step attested:

    - corpus v1 (vec_id % 4 ≠ 3) trains the coarse quantizer
      (`ivf_policy` sized from the V1 count) and writes the index:
      centroids parquet + postings parquet PARTITIONED BY CELL
      (probing reads only the probed cells' directories — partition
      pruning is the serve-path win);
    - the new batch (vec_id % 4 = 3) is assigned to the RELOADED
      centroids — never re-trained — and its postings APPEND into
      the cell directories; ``centroids_unchanged`` re-reads the
      quantizer after the append and compares bit-exact against the
      build-time matrix;
    - ``v1_postings_intact`` snapshots every v1 posting file
      (path + byte size) before the append and verifies the append
      touched none of them — the property that keeps maintenance
      O(batch) at 100 TB where a rewrite would cost the corpus;
    - the recall audit then runs ON THE UPDATED INDEX against brute
      force over the full corpus (exactness-bracket recipe:
      recall@{TOP_K} floor 0.75 + zero reported-cosine disagreements)
      — an append that dropped, duplicated, or mis-assigned batch
      vectors flips recall_ok / postings_total / the violation
      count.

    Scale posture: append cost is one narrow mapInPandas over the
    batch + a partitioned parquet append; serving reads
    |probed cells| directories; the only full-corpus pass is the
    audit's brute-force side — the gate, not the serve path."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tf
    import uuid as _uuid

    emb = t(spark, sf_dir, "embeddings")
    quarter = F.col("vec_id") % 4
    v1 = emb.filter(quarter != 3).select("vec_id", "embedding")
    batch = emb.filter(quarter == 3).select("vec_id", "embedding")

    n_v1 = v1.count()
    # maintenance audits probe at the miner's 1/2 fraction: the
    # quantizer was trained on V1 only and never re-trained, so the
    # serve-time probe knob buys back the recall the stale quantizer
    # costs (measured: 0.94 @ sf0.01, 0.84 @ sf0.1 vs 0.76/0.72 at
    # the 1/4 serving fraction)
    n_cells, nprobe = ivf_policy(n_v1, probe_fraction=0.5)
    Cn = _ivf_centroids(v1, n_cells)

    root = _os.path.join(
        scratch_root(), f"shs_ivf_incr_{_uuid.uuid4().hex}"
    )
    cdir = _os.path.join(root, "centroids")
    pdir = _os.path.join(root, "postings")
    _stage_centroids(cdir, Cn)

    _assigner = _ivf_assigner
    schema = "vec_id long, embedding array<float>, cell int"
    (
        v1.mapInPandas(_assigner(Cn), schema)
        .repartition(F.col("cell"))  # one file per cell directory
        .write.partitionBy("cell").parquet(pdir)
    )

    def _snapshot(d: str) -> dict[str, int]:
        out = {}
        for base, _dirs, names in _os.walk(d):
            for n in names:
                if n.endswith(".parquet"):
                    p = _os.path.join(base, n)
                    out[_os.path.relpath(p, d)] = _os.path.getsize(p)
        return out

    v1_files = _snapshot(pdir)

    # serve-path reload: the batch is assigned with the PERSISTED
    # quantizer, exactly as a separate maintenance job would
    def _load_centroids() -> "np.ndarray":
        rows = spark.read.parquet(cdir).orderBy("cell").collect()
        return np.stack([
            np.asarray(r.centroid, dtype=np.float64) for r in rows
        ])

    C_reloaded = _load_centroids()
    (
        batch.mapInPandas(_assigner(C_reloaded), schema)
        .repartition(F.col("cell"))
        .write.partitionBy("cell").parquet(pdir, mode="append")
    )

    after = _snapshot(pdir)
    v1_postings_intact = all(
        after.get(p) == sz for p, sz in v1_files.items()
    )
    centroids_unchanged = bool((_load_centroids() == Cn).all())

    postings = spark.read.parquet(pdir)

    # ---- recall audit ON THE UPDATED INDEX ----
    Cq = C_reloaded

    def probe_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            top = np.argsort(-(Vn @ Cq.T), axis=1)[:, :nprobe]
            yield pd.DataFrame({
                "query_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                "qe": [e for e in pdf["embedding"]
                       for _ in range(nprobe)],
                "cell": top.ravel().astype(np.int32),
            })

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    )
    probes = queries.mapInPandas(
        probe_cells, "query_id long, qe array<float>, cell int"
    )
    candidates = probes.join(postings, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    sims = candidates.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6)
        .alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    ann = (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
    )
    # brute force and the batch count are independent of the ANN
    # serve path — overlapped (guide §2.6)
    from spark_hive_spark.scratch import run_parallel

    n_batch, brute = run_parallel(
        lambda: batch.count(),
        lambda: knn_cosine_bruteforce(spark, sf_dir).select(
            "query_id", "neighbor_id",
            F.col("cos_sim").alias("brute_cos"),
        ).localCheckpoint(eager=True),  # feeds a count and two joins
    )
    hit = ann.join(
        brute, ["query_id", "neighbor_id"], "inner"
    ).localCheckpoint(eager=True)
    n_exact = brute.agg(F.count("*").alias("n_exact"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    n_viol = hit.filter(
        F.abs(F.col("cos_sim") - F.col("brute_cos")) > 1e-6
    ).agg(F.count("*").alias("n_viol"))
    n_post = postings.agg(F.count("*").alias("n_post"))

    out = (
        n_exact.crossJoin(n_hit).crossJoin(n_viol).crossJoin(n_post)
        .select(
            F.lit(n_v1).cast("bigint").alias("n_v1"),
            F.lit(n_batch).cast("bigint").alias("n_batch"),
            F.lit(n_cells).cast("int").alias("n_cells"),
            F.col("n_post").cast("bigint").alias("postings_total"),
            F.lit(centroids_unchanged).alias("centroids_unchanged"),
            F.lit(v1_postings_intact).alias("v1_postings_intact"),
            # floor 0.75: below the measured 0.84-0.94 band but
            # high enough that a dropped/mis-assigned batch (which
            # zeroes recall for batch-resident neighbors) flips it
            (F.col("n_hit") / F.col("n_exact") >= 0.75)
            .alias("recall_ok"),
            F.col("n_viol").cast("bigint")
            .alias("precision_violations"),
        )
        .localCheckpoint(eager=True)  # 1 row; frees the index dirs
    )
    _shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "ann_index_delete_audit",
    oracle="""
        WITH d AS (
            SELECT count(*) AS nd FROM embeddings WHERE vec_id % 7 = 3
        ),
        n AS (SELECT count(*) AS nv FROM embeddings)
        SELECT CAST((SELECT nv FROM n) AS BIGINT) AS n_vectors,
               CAST((SELECT nd FROM d) AS BIGINT) AS n_deleted,
               CAST((SELECT nv FROM n) - (SELECT nd FROM d)
                    AS BIGINT) AS compacted_postings,
               TRUE AS postings_intact_after_delete,
               CAST(0 AS BIGINT) AS deleted_served,
               TRUE AS recall_ok,
               CAST(0 AS BIGINT) AS precision_violations,
               TRUE AS compaction_equivalent
    """,
    tags=("similarity", "ivf", "index", "delete", "tombstone",
          "audit"),
)
def ann_index_delete_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETES from the persisted IVF index (round 19) — closing the
    index CRUD story after build → persist → append: removal is a
    TOMBSTONE file beside the postings (deleted vec_ids), never a
    posting rewrite; serving anti-joins the broadcast tombstone set
    after the cell probe. The lifecycle then COMPACTS: affected
    cells rewrite without their tombstoned rows and the tombstone
    file retires. Each step attested:

    - ``postings_intact_after_delete``: every posting file
      byte-size-identical after the delete commits (O(deleted)
      write, never O(index));
    - ``deleted_served`` = 0: no tombstoned id appears in any top-k
      (in-plan count over the served result);
    - the recall audit runs against brute force OVER THE LIVE SET
      (`api.knn` on the filtered corpus — deleted vectors must not
      crowd out live neighbors either): floor 0.75, zero
      reported-cosine disagreements;
    - ``compaction_equivalent``: re-serving from the compacted
      index WITHOUT the tombstone filter returns exactly the
      tombstone-filtered result (full-outer mismatch count 0), and
      the compacted posting count is live-exact.

    Scale posture: the tombstone set broadcasts (it is the delete
    batch, not the corpus); compaction rewrites only cells holding
    tombstones; the audit's brute-force side is the gate, not the
    serve path."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tf
    import uuid as _uuid

    emb = t(spark, sf_dir, "embeddings")
    n_vectors = emb.count()
    deleted = F.col("vec_id") % 7 == 3
    n_cells, nprobe = ivf_policy(n_vectors, probe_fraction=0.5)
    Cn = _ivf_centroids(emb, n_cells)

    root = _os.path.join(
        scratch_root(), f"shs_ivf_del_{_uuid.uuid4().hex}"
    )
    pdir = _os.path.join(root, "postings")
    tpath = _os.path.join(root, "tombstones")
    cpdir = _os.path.join(root, "postings_compacted")
    schema = "vec_id long, embedding array<float>, cell int"
    (
        emb.select("vec_id", "embedding")
        .mapInPandas(_ivf_assigner(Cn), schema)
        .repartition(F.col("cell"))  # one file per cell directory
        .write.partitionBy("cell").parquet(pdir)
    )

    def _snapshot(d: str) -> dict[str, int]:
        out = {}
        for base, _dirs, names in _os.walk(d):
            for nm in names:
                if nm.endswith(".parquet"):
                    p = _os.path.join(base, nm)
                    out[_os.path.relpath(p, d)] = _os.path.getsize(p)
        return out

    before = _snapshot(pdir)
    # the DELETE commit: one tombstone file, nothing else touched
    emb.filter(deleted).select("vec_id").coalesce(1) \
        .write.parquet(tpath)
    postings_intact = _snapshot(pdir) == before
    # tombstone cardinality from the parquet footer — no Spark job
    import pyarrow.parquet as _pq

    n_deleted = sum(
        _pq.read_metadata(_os.path.join(base, nm)).num_rows
        for base, _dirs, names in _os.walk(tpath)
        for nm in names if nm.endswith(".parquet")
    )

    postings = spark.read.parquet(pdir)
    tombs = spark.read.parquet(tpath)

    def probe_cells(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64
            )
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            top = np.argsort(-(Vn @ Cn.T), axis=1)[:, :nprobe]
            yield pd.DataFrame({
                "query_id": np.repeat(
                    pdf["vec_id"].to_numpy(), nprobe
                ),
                "qe": [e for e in pdf["embedding"]
                       for _ in range(nprobe)],
                "cell": top.ravel().astype(np.int32),
            })

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    )
    probes = queries.mapInPandas(
        probe_cells, "query_id long, qe array<float>, cell int"
    ).localCheckpoint(eager=True)  # serves both index generations

    def _serve(post: DataFrame, mask_tombstones: bool) -> DataFrame:
        cand = probes.join(post, "cell").filter(
            F.col("query_id") != F.col("vec_id")
        )
        if mask_tombstones:
            cand = cand.join(
                F.broadcast(tombs), "vec_id", "left_anti"
            )
        sims = cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6)
            .alias("cos_sim"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "cos_sim")
        )

    # the tombstone-masked serve and the live-set brute force are
    # independent — overlapped (guide §2.6)
    from spark_hive_spark.scratch import run_parallel

    live = emb.filter(~deleted)
    ann, brute = run_parallel(
        lambda: _serve(postings, mask_tombstones=True)
        .localCheckpoint(eager=True),
        # feeds the brute join, the deleted-served count, and the
        # compaction-equivalence join
        lambda: api.knn(live, queries, k=TOP_K).select(
            "query_id", "neighbor_id",
            F.col("cos_sim").alias("brute_cos"),
        ).localCheckpoint(eager=True),
    )
    hit = ann.join(
        brute, ["query_id", "neighbor_id"], "inner"
    ).localCheckpoint(eager=True)
    n_exact = brute.agg(F.count("*").alias("n_exact"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    n_viol = hit.filter(
        F.abs(F.col("cos_sim") - F.col("brute_cos")) > 1e-6
    ).agg(F.count("*").alias("n_viol"))
    served_deleted = ann.join(
        F.broadcast(tombs),
        ann["neighbor_id"] == tombs["vec_id"], "inner",
    ).agg(F.count("*").alias("n_served_deleted"))

    # ---- COMPACTION: rewrite only cells holding tombstones ----
    affected = sorted(
        r["cell"] for r in postings.join(
            F.broadcast(tombs), "vec_id"
        ).select("cell").distinct().collect()
    )
    (
        postings.filter(F.col("cell").isin(affected))
        .join(F.broadcast(tombs), "vec_id", "left_anti")
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .parquet(cpdir)
    )
    for base, _dirs, names in _os.walk(pdir):
        cell_dir = _os.path.basename(base)
        if cell_dir.startswith("cell=") and int(
            cell_dir.split("=")[1]
        ) not in affected:
            _os.makedirs(_os.path.join(cpdir, cell_dir),
                         exist_ok=True)
            for nm in names:
                _shutil.copy2(
                    _os.path.join(base, nm),
                    _os.path.join(cpdir, cell_dir, nm),
                )
    compacted = spark.read.parquet(cpdir)
    n_compacted = compacted.agg(
        F.count("*").alias("n_compacted")
    )
    ann2 = _serve(compacted, mask_tombstones=False)
    mism = ann.join(
        ann2.withColumnRenamed("cos_sim", "cos2"),
        ["query_id", "neighbor_id"], "full_outer",
    ).filter(
        F.col("cos_sim").isNull() | F.col("cos2").isNull()
        | (F.col("cos_sim") != F.col("cos2"))
    ).agg(F.count("*").alias("n_mismatch"))

    out = (
        n_exact.crossJoin(n_hit).crossJoin(n_viol)
        .crossJoin(served_deleted).crossJoin(n_compacted)
        .crossJoin(mism)
        .select(
            F.lit(n_vectors).cast("bigint").alias("n_vectors"),
            F.lit(n_deleted).cast("bigint").alias("n_deleted"),
            F.col("n_compacted").cast("bigint")
            .alias("compacted_postings"),
            F.lit(bool(postings_intact))
            .alias("postings_intact_after_delete"),
            F.col("n_served_deleted").cast("bigint")
            .alias("deleted_served"),
            (F.col("n_hit") / F.col("n_exact") >= 0.75)
            .alias("recall_ok"),
            F.col("n_viol").cast("bigint")
            .alias("precision_violations"),
            (F.col("n_mismatch") == 0).alias("compaction_equivalent"),
        )
        .localCheckpoint(eager=True)  # 1 row; frees the index dirs
    )
    _shutil.rmtree(root, ignore_errors=True)
    return out
