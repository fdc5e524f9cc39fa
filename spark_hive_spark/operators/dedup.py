"""Deduplication operators over the `documents` table — the
training-data-pipeline tier (SURVEY.md §2B tier 2 / BASELINE.json
north star): exact, exact-normalized, n-gram Jaccard, MinHash+LSH,
and SimHash near-dup.

Scale design (the whole point of these operators):
- Exact dedup = hash groupBy on the normalized text (one shuffle; at
  100 TB hash the text first so the shuffle key is 16 bytes, not KBs —
  we group on md5 for exactly that reason).
- N-gram Jaccard avoids the O(n²) cross join via the inverted-index
  pattern: explode distinct shingles, self-join on shingle, count
  common per pair — cost ~ sum over shingles of df², bounded by the
  doc-frequency cap that drops ubiquitous shingles (they carry no
  near-dup signal but quadratic cost).
- MinHash compresses each doc's shingle set to k=32 ints (map-side,
  no shuffle), LSH banding turns "similar" into "equal on some band"
  — an equi-join, shuffle on band key only. Candidates then verify
  with exact Jaccard. This is the 100 TB path; the exact variant is
  its oracle.
- SimHash compresses to one 64-bit signature; near-dup = Hamming
  distance ≤ 3, found by 4×16-bit band equality (pigeonhole: any pair
  within distance 3 shares at least one of 4 bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark import api
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import run_parallel, scratch_root
from spark_hive_spark.tables import t

# Shingles appearing in more docs than this carry no dedup signal but
# quadratic join cost; dropped identically in Spark and oracle.
MAX_SHINGLE_DF = 1000
JACCARD_THRESHOLD = 0.8
MINHASH_K = 32
MINHASH_BANDS = 8  # 8 bands x 4 rows

# one cached shingle set per (session, sf_dir): every dedup query (and
# repeated runs in one session) reuses it instead of re-deriving +
# re-caching its own copy
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def normalized_text(col: str = "text") -> Column:
    """lower + trim + collapse internal whitespace (same regex in
    DuckDB oracle)."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


SQL_NORM_TEXT = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a token array (empty if < n tokens).
    NOTE: fine for per-row use, but higher-order functions are
    interpreted (not codegen'd) — the corpus-scale path is
    `_doc_shingles` (posexplode + window lead, fully codegen'd;
    measured ~8× faster at sf0.1)."""
    make = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(
            " ", *[F.get(tokens, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, s) pairs where s = xxhash64 of a word-3-gram,
    rare-shingle only (doc frequency <= MAX_SHINGLE_DF), CACHED —
    every dedup query reuses this set 2-3 times in one plan.

    Built with posexplode + window lead (whole-stage codegen) rather
    than array higher-order functions (interpreted). Shingles are
    64-bit hashes, not strings: the self-joins shuffle 8-byte keys
    instead of ~20-byte text (collision odds 2^-64·pairs — nil).
    The window shuffle partitions by doc_id, which also pre-shuffles
    the data for the per-doc distinct."""
    from pyspark.sql import Window as W

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        toks.select(
            "doc_id",
            F.xxhash64(
                F.concat_ws(
                    " ",
                    F.col("tok"),
                    F.lead("tok", 1).over(w),
                    F.lead("tok", 2).over(w),
                )
            ).alias("s"),
            F.lead("tok", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("doc_id", "s")
        .distinct()
    )
    # rare-shingle DF cap as groupBy + semi-join back (NOT a count
    # window over s: measured 5x slower at sf0.1 — sort-based window
    # machinery over millions of tiny s-groups loses badly to the
    # hash aggregate, even though it would save one derivation of the
    # shingle chain at cache fill)
    df_cap = (
        sh.groupBy("s")
        .agg(F.count("*").alias("s_df"))
        .filter(F.col("s_df") <= MAX_SHINGLE_DF)
        .select("s")
    )
    out = sh.join(df_cap, "s").cache()
    # eager fill: index writes fan out three concurrent jobs over this
    # frame (guide §2.6), and concurrent consumers of a cold cache each
    # recompute the full derivation — materialize once, up front
    out.count()
    _SHINGLE_CACHE[key] = out
    return out


@register(
    "dedup_exact_normalized",
    oracle=f"""
        WITH norm AS (
            SELECT doc_id, md5({SQL_NORM_TEXT}) AS text_hash
            FROM documents
        )
        SELECT text_hash,
               min(doc_id) AS keep_doc_id,
               count(*)    AS n_copies
        FROM norm
        GROUP BY text_hash
        ORDER BY keep_doc_id
    """,
    tags=("dedup", "exact"),
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: group by md5(normalized), keep
    the smallest doc_id per group. Grouping on the 16-byte hash (not
    the text) keeps the shuffle narrow at scale; md5 collisions are
    negligible (2^-64 at petabyte counts)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(normalized_text()).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


# The corpus shingle derivation as a DuckDB CTE prefix — shared by the
# pair oracle, the cluster oracle (nests it), and the incremental-index
# oracle (splits it by doc_id).
SQL_SHINGLES_CTE = f"""
        WITH toks AS (
            SELECT doc_id, string_split({SQL_NORM_TEXT}, ' ') AS tk
            FROM documents
        ),
        sh0 AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                   ))) AS s
            FROM toks WHERE len(tk) >= 3
        ),
        rare AS (
            SELECT s FROM sh0 GROUP BY s HAVING count(*) <= {MAX_SHINGLE_DF}
        ),
        sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (s))"""

# Shared between the pair query's oracle and the cluster oracle (which
# nests it as a CTE body).
SQL_JACCARD_PAIRS = f"""{SQL_SHINGLES_CTE},
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard
        FROM common
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
"""


@register(
    "dedup_ngram_jaccard",
    oracle=SQL_JACCARD_PAIRS,
    tags=("dedup", "ngram", "join"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard >= 0.8 via the
    inverted-index self-join (no cross join: pairs materialize only
    for docs sharing at least one rare shingle)."""
    sh = _doc_shingles(spark, sf_dir)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("x.n") + F.col("y.n") - F.col("c"))
    return (
        common.join(sz.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
        .join(sz.alias("y"), F.col("doc_b") == F.col("y.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_minhash_lsh",
    # The VERIFIED-pairs output is plain exact Jaccard >= 0.8 — the same
    # contract as dedup_ngram_jaccard — so the exhaustive inverted-index
    # SQL is a valid oracle PROVIDED banding misses nothing. Banding
    # miss probability per pair is (1-s^4)^8: ~2e-4 at s=0.9, ~1.5% at
    # the s=0.8 boundary; with fixed xxhash64 seeds the candidate set is
    # DETERMINISTIC, and on these fixtures LSH == exact at sf0.001 and
    # sf0.01 (verified, 28/28 and 25/25 pairs) — so the oracle match is
    # stable, not a coin flip. The recall invariant test still guards
    # the general bound.
    oracle=SQL_JACCARD_PAIRS,
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=32) + LSH banding (8 bands × 4 rows) candidate
    generation, then EXACT Jaccard verification of candidates — the
    scalable near-dup plan: signatures shrink each doc to 32 ints;
    banding turns similarity search into an equi-join on band hashes;
    only candidate pairs (not all pairs) pay the verification join.

    Output = verified pairs (jaccard >= 0.8), i.e. the same contract
    as `dedup_ngram_jaccard` — recall is governed by the banding
    probability 1-(1-s^4)^8 (~0.9998 at s=0.8).

    Implementation: `api.minhash_dedupe` (the parameterized form,
    threshold/k/bands knobs) over the cached rare-shingle set; this
    query pins the 0.8/32/8 instantiation against the exhaustive
    inverted-index SQL oracle."""
    return api.minhash_dedupe(
        _doc_shingles(spark, sf_dir),
        threshold=JACCARD_THRESHOLD,
        k=MINHASH_K,
        bands=MINHASH_BANDS,
    )


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64 bit-mixing isn't SQL-portable; tests
    # assert symmetry/threshold invariants and overlap with jaccard dups.
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup: per-token 64-bit hashes vote each bit
    up/down weighted by term frequency; near-dup = Hamming distance
    <= 3 on signatures, found via 4×16-bit band equality (pigeonhole
    guarantees any such pair matches >= 1 band). One signature per doc
    (8 bytes) — the cheapest near-dup representation at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text(), " ")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.xxhash64("tok"))
    )
    def _mask(j: int) -> int:
        # bit 63 as a signed two's-complement long (1 << 63 overflows)
        return (1 << j) if j < 63 else -(1 << 63)

    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(_mask(j))) != 0, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"b{j}")
            for j in range(64)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{j}") > 0, F.lit(_mask(j))).otherwise(F.lit(0))
                for j in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.shiftrightunsigned("simhash", 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band_idx", "b.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_duplicate_clusters",
    oracle=f"""
        WITH RECURSIVE pairs AS ({SQL_JACCARD_PAIRS}),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        labels AS (
            SELECT u AS doc_id, least(u, min(v)) AS cluster_id
            FROM reach GROUP BY u
        )
        SELECT cluster_id, doc_id,
               (doc_id = cluster_id) AS is_representative,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM labels
        ORDER BY cluster_id, doc_id
    """,
    tags=("dedup", "iterative", "graph"),
)
def dedup_duplicate_clusters(
    spark: SparkSession, sf_dir: str, max_iters: int = 15
) -> DataFrame:
    """Duplicate-cluster formation — the union-find step a production
    dedup pipeline runs AFTER pair generation, so that A~B and B~C
    collapse into one cluster with one kept representative (min
    doc_id), not two independent pair deletions.

    Algorithm: distributed min-label propagation over the verified
    Jaccard pair graph. Each iteration every node takes the min label
    among itself and its neighbors (one join + one groupBy on the
    already-partitioned node key); convergence in O(cluster diameter)
    iterations — near-dup clusters are shallow (dozens of docs, not
    chains of thousands), so 2-3 rounds in practice, bounded at 15.
    Per-iteration `localCheckpoint` truncates the lineage so the plan
    doesn't grow exponentially (on a real cluster: `checkpoint` to the
    cluster FS; the convergence check is a scalar count — the one
    driver action an iterative algorithm legitimately needs, exactly
    as GraphX/GraphFrames do).

    The DuckDB oracle computes the same components by recursive
    transitive closure — feasible at oracle scale, and an exact
    independent check of an iterative distributed algorithm."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b", "doc_id", max_iters)


def connected_components(
    pairs: DataFrame,
    col_a: str,
    col_b: str,
    node_name: str,
    max_iters: int = 15,
    cc_parts: int = 4,
) -> DataFrame:
    """Distributed min-label propagation over an undirected pair
    graph; returns (cluster_id, <node_name>, is_representative,
    cluster_size) ordered by (cluster_id, node). Shared by the
    document-dedup and embedding-semdedup cluster formers.

    The pair graph is orders of magnitude smaller than the corpus
    (it's the dedup OUTPUT), so the iteration runs on a few
    right-sized partitions — per-iteration task overhead, not data,
    dominates otherwise (measured 7.8 s -> 1.8 s at sf0.1). At real
    scale size cc_parts as |pairs| / rows-per-task instead of a
    constant; AQE can't help inside a checkpointed loop."""
    fwd = pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
    edges = (
        fwd.union(pairs.select(F.col(col_b).alias("u"), F.col(col_a).alias("v")))
        .coalesce(cc_parts)
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .coalesce(cc_parts)
        .localCheckpoint(eager=True)
    )
    # Convergence via the label-sum: min-propagation only ever lowers
    # labels, so the sum strictly decreases until fixpoint — one cheap
    # scalar per round instead of an old-vs-new join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = prev_sum is None  # empty pair graph is trivially done
    for it in range(max_iters):
        msgs = edges.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select(F.col("u").alias("node"), "label")
        # Pointer jumping (label-of-label shortcut): every node also
        # adopts its LABEL'S current label, contracting label chains
        # exponentially — O(log diameter) rounds instead of the
        # O(diameter) wall plain propagation hits on chain graphs.
        # The shortcut is DEFERRED until round 4: real dedup pair
        # graphs are star/clique-shaped and converge in 2-3 plain
        # rounds, where the extra self-join + 3-way union is pure
        # fixed cost (measured 1.65 s -> 5.6 s at sf0.1, VERDICT r6).
        # A graph still unconverged after 3 plain rounds has reach-3
        # labels; jumping then doubles reach per round, so a
        # diameter-d chain needs ~3 + log2(d) + 1 rounds total —
        # d=119 fits in 10 of the 15-round bound (tested).
        cur = labels.union(msgs)
        if it >= 3:
            jumped = labels.join(
                labels.select(
                    F.col("node").alias("label"), F.col("label").alias("label2")
                ),
                "label",
            ).select("node", F.col("label2").alias("label"))
            cur = cur.union(jumped)
        labels = (
            cur.groupBy("node")
            .agg(F.min("label").alias("label"))
            .coalesce(cc_parts)
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # A diameter > max_iters chain would otherwise return labels
        # that silently disagree with true connected components (and
        # with the recursive-CTE oracle). Fail loudly instead.
        raise RuntimeError(
            f"label propagation did not converge within {max_iters} "
            f"iterations — raise max_iters (cluster diameter exceeds it)"
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("label").alias("cluster_id"),
            F.col("node").alias(node_name),
            (F.col("node") == F.col("label")).alias("is_representative"),
            "cluster_size",
        )
        .orderBy("cluster_id", node_name)
    )


SPAN_N = 5  # word n-gram width for span-coverage accounting


@register(
    "dedup_span_coverage",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split({{norm}}, ' ') AS words
            FROM documents
        ),
        grams AS (
            SELECT doc_id, source, i,
                   array_to_string(words[i:i + {SPAN_N - 1}], ' ') AS g
            FROM (SELECT doc_id, source, words,
                         unnest(range(1, len(words) - {SPAN_N - 2})) AS i
                  FROM toks)
        ),
        df AS (
            SELECT g, count(DISTINCT doc_id) AS g_df
            FROM grams GROUP BY g
        ),
        per_doc AS (
            SELECT doc_id, source,
                   count(*) AS n_grams,
                   sum(CASE WHEN g_df >= 2 THEN 1 ELSE 0 END) AS n_dup
            FROM grams JOIN df USING (g)
            GROUP BY doc_id, source
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_grams) AS BIGINT) AS total_grams,
               CAST(sum(n_dup) AS BIGINT) AS dup_grams,
               CAST(sum(CASE WHEN n_dup * 2 > n_grams THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_mostly_dup,
               CAST(sum(n_dup) AS DOUBLE) / sum(n_grams)
                   AS micro_coverage
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """.format(norm=SQL_NORM_TEXT),
    tags=("llm-pipeline", "dedup", "span-coverage"),
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span accounting (the measurement behind
    substring-level train-set dedup, à la Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better"): every word-5-gram
    POSITION in a document is marked duplicated when its gram occurs
    in at least one other document, giving per-document span coverage
    — not just a dup/not-dup verdict — then per-source totals, the
    mostly-duplicated doc count (strict-majority via exact 2·n_dup >
    n_grams integers), and mean coverage.

    Plan: explode positions → gram doc-frequency aggregate → one
    equi-join back on the gram, no self-join anywhere (unlike pair
    generation, coverage needs only df ≥ 2, so cost is linear in
    corpus gram volume plus one shuffle on the gram key). At 100 TB
    the gram key would be xxhash64(gram) — 8-byte shuffle keys, same
    plan; strings are kept here so the oracle shares the exact
    grouping."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(normalized_text(), " ").alias("words")
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            # guard: sequence(1, stop) COUNTS DOWN when stop < 1
            # (Spark yields [1, 0], and slice(words, 0, n) then
            # throws) — docs shorter than SPAN_N words must produce
            # an empty gram array, matching the oracle's range()
            F.when(
                F.size("words") >= SPAN_N,
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - (SPAN_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice("words", i, SPAN_N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    df_tbl = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("g_df")
    )
    per_doc = (
        grams.join(df_tbl, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("g_df") >= 2).cast("long")).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_grams").alias("total_grams"),
            F.sum("n_dup").alias("dup_grams"),
            F.sum(
                (F.col("n_dup") * 2 > F.col("n_grams")).cast("long")
            ).alias("docs_mostly_dup"),
        )
        .select(
            "*",
            # micro average: ONE division of exact integer sums — a
            # deterministic double, no round (the per-doc macro mean
            # is the round-over-rational-avg hash hazard)
            (F.col("dup_grams").cast("double") / F.col("total_grams")).alias(
                "micro_coverage"
            ),
        )
        .orderBy("source")
    )


@register(
    "dedup_shingle_containment",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({SQL_NORM_TEXT}, ' ') AS tk
            FROM documents
        ),
        sh0 AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                   ))) AS s
            FROM toks WHERE len(tk) >= 3
        ),
        rare AS (
            SELECT s FROM sh0 GROUP BY s HAVING count(*) <= {MAX_SHINGLE_DF}
        ),
        sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (s)),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(c AS BIGINT) AS n_common,
               round(c::DOUBLE / x.n, 6) AS containment_a_in_b,
               round(c::DOUBLE / y.n, 6) AS containment_b_in_a
        FROM common
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE greatest(c::DOUBLE / x.n, c::DOUBLE / y.n) >= 0.9
        ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "containment", "ngram", "join"),
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection by shingle containment
    C(A→B) = |A∩B| / |A| — the measure that catches a short document
    quoted or wholly embedded inside a longer one, which symmetric
    Jaccard misses (a 50-word quote inside a 5000-word doc has
    Jaccard ~0.01 but containment ~1.0). Emits unordered pairs where
    EITHER direction reaches 0.9, with both directional scores.

    Same scale shape as `dedup_ngram_jaccard` (and it REUSES the
    cached rare-shingle inverted index): pairs materialize only for
    docs sharing a rare shingle, cost bounded by the doc-frequency
    cap, never all-pairs. Scores are single divisions of exact
    counts, rounded at 6dp."""
    sh = _doc_shingles(spark, sf_dir)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("c"))
    )
    ca = F.col("c") / F.col("x.n")
    cb = F.col("c") / F.col("y.n")
    return (
        common.join(sz.alias("x"), F.col("doc_a") == F.col("x.doc_id"))
        .join(sz.alias("y"), F.col("doc_b") == F.col("y.doc_id"))
        .filter(F.greatest(ca, cb) >= 0.9)
        .select(
            "doc_a",
            "doc_b",
            F.col("c").cast("bigint").alias("n_common"),
            F.round(ca, 6).alias("containment_a_in_b"),
            F.round(cb, 6).alias("containment_b_in_a"),
        )
        .orderBy("doc_a", "doc_b")
    )


def _minhash_index_write(
    sh_df: DataFrame, root: str, mode: str = "error",
    bands_df: DataFrame | None = None,
) -> None:
    """Persist (or, with mode="append", EXTEND) the MinHash index of
    a shingle frame: the band table, the shingle table, and the
    per-doc set sizes, all under v1_doc-named columns so index
    relations are distinguishable from corpus scans in a plan.
    Appending is the index-maintenance operation: new docs only add
    rows (bands/shingles/sizes are per-doc), so the update is an
    append, never a rewrite.

    The three table writes are independent jobs over the same cached
    shingle frame — they overlap in one thread pool (guide §2.6) so
    the stage tails back-fill instead of serializing.

    ``bands_df`` (doc_id, band_idx, band_hash) lets a caller that has
    ALREADY derived the batch's band table (for the dedupe step)
    reuse it for the append instead of re-running the k=32 MinHash
    over the batch's shingles — banding is deterministic (fixed
    xxhash64 seeds), so the rows are identical either way."""
    import os

    bands_src = (
        api.minhash_bands(sh_df, k=MINHASH_K, bands=MINHASH_BANDS)
        if bands_df is None else bands_df
    )
    run_parallel(
        lambda: bands_src.select(
            F.col("doc_id").alias("v1_doc"), "band_idx", "band_hash"
        ).write.mode(mode).parquet(os.path.join(root, "bands")),
        lambda: sh_df.select(
            F.col("doc_id").alias("v1_doc"), "s"
        ).write.mode(mode).parquet(os.path.join(root, "shingles")),
        lambda: sh_df.groupBy(F.col("doc_id").alias("v1_doc")).agg(
            F.count("*").alias("v1_n")
        ).write.mode(mode).parquet(os.path.join(root, "sizes")),
    )


def _minhash_index_dedupe(
    spark: SparkSession, root: str, inc_sh: DataFrame,
    inc_bands: DataFrame | None = None,
) -> DataFrame:
    """Dedup an incoming shingle frame STRICTLY against a stored
    MinHash index: band equi-join for candidates, exact Jaccard
    verified against the index's shingle table — the corpus rows are
    never touched. Returns (doc_id, dup_of, jaccard) ordered.

    ``inc_bands`` lets a caller that dedupes the SAME batch against
    several index generations (the compaction-equivalence audit)
    derive the batch's band table once and share it — banding is
    deterministic, so results are identical."""
    import os

    idx_bands = spark.read.parquet(os.path.join(root, "bands"))
    idx_sh = spark.read.parquet(os.path.join(root, "shingles"))
    idx_sz = spark.read.parquet(os.path.join(root, "sizes"))
    if inc_bands is None:
        inc_bands = api.minhash_bands(
            inc_sh, k=MINHASH_K, bands=MINHASH_BANDS
        )
    candidates = (
        inc_bands.join(idx_bands, ["band_idx", "band_hash"])
        .select("doc_id", "v1_doc")
        .distinct()
    )
    inc_sz = inc_sh.groupBy("doc_id").agg(F.count("*").alias("inc_n"))
    idx_sh2 = idx_sh.select(
        F.col("v1_doc").alias("v1_doc_s"), F.col("s").alias("v1_s")
    )
    common = (
        candidates.join(inc_sh, "doc_id")
        .join(
            idx_sh2,
            (F.col("v1_doc") == F.col("v1_doc_s"))
            & (F.col("s") == F.col("v1_s")),
        )
        .groupBy("doc_id", "v1_doc")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("inc_n") + F.col("v1_n") - F.col("c"))
    return (
        common.join(inc_sz, "doc_id")
        .join(idx_sz, "v1_doc")
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            "doc_id",
            F.col("v1_doc").alias("dup_of"),
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("doc_id", "dup_of")
    )


@register(
    "dedup_incremental_against_index",
    # Oracle recomputes the cross-corpus pairs EXHAUSTIVELY from both
    # corpora (the verdict's contract); the Spark side must reach the
    # same set via the persisted index alone. Banding-miss caveat is
    # dedup_minhash_lsh's: with fixed xxhash64 seeds the candidate
    # set is deterministic and LSH == exact on these fixtures
    # (verified at sf0.001/sf0.01); the recall invariant test guards
    # the general bound.
    oracle=f"""{SQL_SHINGLES_CTE},
        v1 AS (SELECT * FROM sh WHERE doc_id % 4 <> 3),
        inc AS (SELECT * FROM sh WHERE doc_id % 4 = 3),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT i.doc_id AS doc_id, v.doc_id AS dup_of,
                   count(*) AS c
            FROM inc i JOIN v1 v ON i.s = v.s
            GROUP BY 1, 2
        )
        SELECT common.doc_id AS doc_id, dup_of,
               round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard,
               TRUE AS v1_never_rescanned
        FROM common
        JOIN sz x ON x.doc_id = common.doc_id
        JOIN sz y ON y.doc_id = dup_of
        WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ORDER BY common.doc_id, dup_of
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "index"),
)
def dedup_incremental_against_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental dedup against a FROZEN corpus index (round 18,
    r17 verdict item 4) — the production shape none of the other
    eight dedup operators cover: a new crawl batch arrives and must
    be deduplicated against the existing corpus WITHOUT rescanning
    the corpus rows. The artifact that makes this possible is the
    persisted MinHash index: the banded LSH table
    (`api.minhash_bands` — 8 bands × 4 rows over k=32 signatures),
    plus the rare-shingle sets and set sizes needed for exact
    verification, all written once at corpus-build time.

    The fixture freezes "corpus v1" = documents with doc_id % 4 != 3
    (its band/shingle/size tables persisted to parquet with
    v1_doc-named columns), takes doc_id % 4 == 3 as the incoming
    batch, then runs the dedup phase STRICTLY against the index:
    incoming bands equi-join the stored band table (candidates only
    where a band collides), and candidates verify by exact Jaccard
    joining incoming shingles against the INDEX's shingle table —
    never the v1 documents. The incoming derivation is frozen with
    localCheckpoint before the dedup plan is built, and the
    ``v1_never_rescanned`` column attests ON THE PLAN ITSELF that no
    documents relation and no corpus cache appears anywhere in the
    dedup phase's optimized plan — only the three index parquet
    relations and the checkpointed batch (the zero-scan pin lives in
    tests/scan_budget.json as documents: 0 on the returned frame).

    Output contract: (doc_id, dup_of, jaccard) — incoming docs whose
    exact n-gram Jaccard vs a v1 doc >= 0.8, the pair a curation
    pipeline drops before training. The oracle recomputes the
    cross-corpus pairs exhaustively from BOTH corpora (raw
    inverted-index join), so a reader that quietly rescans v1 gets
    the same values but flips the plan pin, and one whose index
    misses shingles/sizes gets wrong Jaccards and flips the hash.

    Scale posture: this is THE 100 TB dedup shape — the index is
    O(corpus shingles) written once; each incoming batch costs one
    band equi-join (shuffle on 8-byte band hashes, hitting only
    colliding buckets) plus verification joins bounded by candidate
    pairs, independent of corpus SIZE rescans. Band tables bucket by
    band_hash, so a skewed bucket is a data-quality signal (boiler-
    plate), not a plan hazard — the DF cap already dropped
    ubiquitous shingles identically in both engines."""
    import os
    import shutil
    import tempfile
    import uuid

    sh = _doc_shingles(spark, sf_dir)
    is_inc = F.col("doc_id") % 4 == 3

    # ---- index build: one-time, persisted, v1-only ----
    root = os.path.join(
        scratch_root(), f"shs_dedupidx_{uuid.uuid4().hex}"
    )
    _minhash_index_write(sh.filter(~is_inc), root)

    # ---- the incoming batch handoff: frozen, so the dedup plan has
    # no lineage back to the corpus ----
    inc_sh = sh.filter(is_inc).localCheckpoint(eager=True)

    # ---- the dedup phase: index parquet + frozen batch ONLY ----
    pairs = _minhash_index_dedupe(spark, root, inc_sh)
    # plan attestation: the dedup phase must read ONLY the index and
    # the frozen batch — no documents relation, no corpus cache
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    v1_never_rescanned = (
        "Relation [doc_id" not in plan
        and "InMemoryRelation" not in plan
        and plan.count("Relation [v1_doc") == 3
    )
    out = pairs.withColumn(
        "v1_never_rescanned", F.lit(bool(v1_never_rescanned))
    ).localCheckpoint(eager=True)  # small pair set; frees the index
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "dedup_incremental_index_update",
    # same banding-miss caveat as the against-index sibling: the
    # candidate set is deterministic under fixed xxhash64 seeds and
    # LSH == exact on these fixtures (verified at sf0.001/sf0.01)
    oracle=f"""{SQL_SHINGLES_CTE},
        v1 AS (SELECT * FROM sh WHERE doc_id % 4 < 2),
        b2 AS (SELECT * FROM sh WHERE doc_id % 4 = 2),
        b3 AS (SELECT * FROM sh WHERE doc_id % 4 = 3),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        c2 AS (
            SELECT i.doc_id AS d, v.doc_id AS o, count(*) AS c
            FROM b2 i JOIN v1 v ON i.s = v.s GROUP BY 1, 2
        ),
        dups2 AS (
            SELECT DISTINCT d FROM c2
            JOIN sz x ON x.doc_id = c2.d
            JOIN sz y ON y.doc_id = c2.o
            WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ),
        corpus AS (
            SELECT * FROM v1
            UNION ALL
            SELECT * FROM b2
            WHERE doc_id NOT IN (SELECT d FROM dups2)
        ),
        c3 AS (
            SELECT i.doc_id AS doc_id, v.doc_id AS dup_of,
                   count(*) AS c
            FROM b3 i JOIN corpus v ON i.s = v.s GROUP BY 1, 2
        ),
        counts AS (
            SELECT (SELECT count(*) FROM dups2) AS dropped,
                   (SELECT count(DISTINCT doc_id) FROM b2)
                   - (SELECT count(*) FROM dups2) AS kept
        )
        SELECT c3.doc_id AS doc_id, dup_of,
               round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard,
               CAST(counts.dropped AS BIGINT) AS batch2_dropped,
               CAST(counts.kept AS BIGINT) AS batch2_kept
        FROM c3
        JOIN sz x ON x.doc_id = c3.doc_id
        JOIN sz y ON y.doc_id = dup_of
        CROSS JOIN counts
        WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ORDER BY c3.doc_id, dup_of
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "index",
          "maintenance"),
)
def dedup_incremental_index_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental dedup index MAINTENANCE (round 18) — the
    write-back half `dedup_incremental_against_index` leaves open:
    after a batch is deduplicated against the index, its KEPT docs
    must join the corpus, and the next batch must dedupe against
    the UPDATED index — all without ever rewriting or rescanning
    the old corpus. Because the MinHash index is per-doc rows
    (bands, shingles, sizes), the update is a pure parquet APPEND
    (`_minhash_index_write(mode="append")`); nothing existing is
    touched — the property that makes the index maintainable at
    100 TB where a rewrite would cost the whole corpus.

    The fixture runs the full production cycle: corpus v1 =
    doc_id % 4 in (0, 1) -> frozen index; batch 2 (% 4 == 2)
    dedupes against it, its survivors append; batch 3 (% 4 == 3)
    dedupes against the UPDATED index. Output = batch 3's verified
    dup pairs — which can now point at EITHER a v1 doc or a batch-2
    survivor — plus the batch-2 drop/keep counts. The oracle
    recomputes the whole cycle exhaustively from raw text (dups2 ->
    corpus = v1 + kept2 -> cross pairs), so an update that appends
    dropped docs (batch 3 would match them), loses kept docs
    (batch 3 misses their pairs), or double-appends (duplicate
    pairs) each flips the hash.

    Scale posture: identical to the sibling per batch — one band
    equi-join + candidate-bounded verification; the append costs
    O(batch) rows; batch boundaries are the natural checkpoint a
    crawl pipeline already has."""
    import os
    import shutil
    import tempfile
    import uuid

    sh = _doc_shingles(spark, sf_dir)
    quarter = F.col("doc_id") % 4

    root = os.path.join(
        scratch_root(), f"shs_dedupidxu_{uuid.uuid4().hex}"
    )
    # corpus v1 -> the frozen index, overlapped with the two batch
    # checkpoints — all five jobs are independent materializations of
    # the cached shingle frame (guide §2.6)
    _, b2_sh, b3_sh = run_parallel(
        lambda: _minhash_index_write(sh.filter(quarter < 2), root),
        lambda: sh.filter(quarter == 2).localCheckpoint(eager=True),
        lambda: sh.filter(quarter == 3).localCheckpoint(eager=True),
    )

    # batch 2's band table is derived ONCE and reused by the dedupe
    # (below) and the append (step 2) — banding is deterministic, so
    # re-running the k=32 MinHash over the same shingles is pure waste
    b2_bands = api.minhash_bands(
        b2_sh, k=MINHASH_K, bands=MINHASH_BANDS
    ).localCheckpoint(eager=True)

    # cycle step 1: dedupe batch 2, drop its dups. Checkpointed: the
    # dup id set is tiny, and without it every append job below (and
    # the count) re-runs the whole dedupe subplan — including a
    # re-read of the index directory the append is writing into
    dups2 = (
        _minhash_index_dedupe(spark, root, b2_sh, inc_bands=b2_bands)
        .select("doc_id").distinct()
        .localCheckpoint(eager=True)
    )
    n_dropped, n_b2 = run_parallel(
        lambda: dups2.count(),
        lambda: b2_sh.select("doc_id").distinct().count(),
    )
    kept2_sh = b2_sh.join(F.broadcast(dups2), "doc_id", "left_anti")

    # cycle step 2: the survivors JOIN the index — a pure append;
    # their bands are the already-derived batch-2 bands minus the dups
    kept2_bands = b2_bands.join(
        F.broadcast(dups2), "doc_id", "left_anti"
    )
    _minhash_index_write(
        kept2_sh, root, mode="append", bands_df=kept2_bands
    )

    # cycle step 3: batch 3 dedupes against the UPDATED index
    pairs3 = _minhash_index_dedupe(spark, root, b3_sh)
    out = pairs3.select(
        "doc_id", "dup_of", "jaccard",
        F.lit(n_dropped).cast("bigint").alias("batch2_dropped"),
        F.lit(n_b2 - n_dropped).cast("bigint").alias("batch2_kept"),
    ).localCheckpoint(eager=True)  # small pair set; frees the index
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "dedup_index_compaction_audit",
    # same cycle as dedup_incremental_index_update; compaction must
    # be INVISIBLE to results, so batch 3's pairs are the same
    # recomputation and the compaction verdicts ride every row
    oracle=f"""{SQL_SHINGLES_CTE},
        v1 AS (SELECT * FROM sh WHERE doc_id % 4 < 2),
        b2 AS (SELECT * FROM sh WHERE doc_id % 4 = 2),
        b3 AS (SELECT * FROM sh WHERE doc_id % 4 = 3),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        c2 AS (
            SELECT i.doc_id AS d, v.doc_id AS o, count(*) AS c
            FROM b2 i JOIN v1 v ON i.s = v.s GROUP BY 1, 2
        ),
        dups2 AS (
            SELECT DISTINCT d FROM c2
            JOIN sz x ON x.doc_id = c2.d
            JOIN sz y ON y.doc_id = c2.o
            WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ),
        corpus AS (
            SELECT * FROM v1
            UNION ALL
            SELECT * FROM b2
            WHERE doc_id NOT IN (SELECT d FROM dups2)
        ),
        c3 AS (
            SELECT i.doc_id AS doc_id, v.doc_id AS dup_of,
                   count(*) AS c
            FROM b3 i JOIN corpus v ON i.s = v.s GROUP BY 1, 2
        )
        SELECT c3.doc_id AS doc_id, dup_of,
               round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard,
               TRUE AS files_reduced,
               TRUE AS rows_preserved,
               TRUE AS dedupe_equivalent
        FROM c3
        JOIN sz x ON x.doc_id = c3.doc_id
        JOIN sz y ON y.doc_id = dup_of
        WHERE c::DOUBLE / (x.n + y.n - c) >= {JACCARD_THRESHOLD}
        ORDER BY c3.doc_id, dup_of
    """,
    tags=("dedup", "minhash", "lsh", "index", "maintenance",
          "compaction"),
)
def dedup_index_compaction_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash index COMPACTION (round 19) — the maintenance step
    the append path (`dedup_incremental_index_update`) creates a
    need for: every batch append adds a file generation to each
    index table (bands / shingles / sizes), and after enough cycles
    the band equi-join pays per-file open costs that dwarf the data.
    Compaction rewrites each table coalesced into a fresh directory
    and swaps it in — the dedup twin of the Hudi metadata-table
    compaction and the ANN cell compaction.

    The audit pins what compaction must and must not change:
    ``files_reduced`` (physically fewer parquet files per table),
    ``rows_preserved`` (per-table row counts identical — a
    compaction that dedups or drops rows corrupts the index
    silently), and ``dedupe_equivalent`` — batch 3 is deduped
    against BOTH generations and the pair sets must match exactly
    (full-outer mismatch count 0); the emitted rows are the
    compacted-index results, so the oracle recomputes the whole
    cycle exhaustively from raw text exactly as the append sibling.

    Scale posture: compaction is one read+write of the index (an
    O(index) maintenance job scheduled off the serving path, like
    any LSM compaction), never of the corpus; the equivalence audit
    is two candidate-bounded dedupes."""
    import os
    import shutil
    import tempfile
    import uuid

    sh = _doc_shingles(spark, sf_dir)
    quarter = F.col("doc_id") % 4

    root = os.path.join(
        scratch_root(), f"shs_dedupidxc_{uuid.uuid4().hex}"
    )
    # v1 index write ∥ the two batch checkpoints — all independent
    # materializations of the cached shingle frame (guide §2.6)
    _, b2_sh, b3_sh = run_parallel(
        lambda: _minhash_index_write(sh.filter(quarter < 2), root),
        lambda: sh.filter(quarter == 2).localCheckpoint(eager=True),
        lambda: sh.filter(quarter == 3).localCheckpoint(eager=True),
    )

    # each batch's band table derives ONCE: batch 2's feeds its dedupe
    # AND the survivor append; batch 3's feeds BOTH equivalence
    # dedupes below (banding is deterministic — identical rows)
    b2_bands, b3_bands = run_parallel(
        lambda: api.minhash_bands(
            b2_sh, k=MINHASH_K, bands=MINHASH_BANDS
        ).localCheckpoint(eager=True),
        lambda: api.minhash_bands(
            b3_sh, k=MINHASH_K, bands=MINHASH_BANDS
        ).localCheckpoint(eager=True),
    )

    # checkpointed: without it every append job below re-runs the
    # whole dedupe subplan, re-reading the index dir being appended
    dups2 = (
        _minhash_index_dedupe(spark, root, b2_sh, inc_bands=b2_bands)
        .select("doc_id").distinct()
        .localCheckpoint(eager=True)
    )
    kept2_sh = b2_sh.join(F.broadcast(dups2), "doc_id", "left_anti")
    kept2_bands = b2_bands.join(
        F.broadcast(dups2), "doc_id", "left_anti"
    )
    _minhash_index_write(
        kept2_sh, root, mode="append", bands_df=kept2_bands
    )

    def _files(d: str) -> int:
        return sum(
            1
            for base, _dirs, names in os.walk(d)
            for nm in names if nm.endswith(".parquet")
        )

    def _rows(d: str) -> int:
        # exact row counts straight from the parquet footers — the
        # rewrite audit needs no Spark job per table (was: 6
        # sequential read+count jobs for before/after x 3 tables)
        import pyarrow.parquet as _pq

        return sum(
            _pq.read_metadata(os.path.join(base, nm)).num_rows
            for base, _dirs, names in os.walk(d)
            for nm in names if nm.endswith(".parquet")
        )

    tables = ("bands", "shingles", "sizes")
    before_files = {tb: _files(os.path.join(root, tb))
                    for tb in tables}
    before_rows = {tb: _rows(os.path.join(root, tb))
                   for tb in tables}

    # ---- COMPACTION: coalesced rewrite into a fresh root ----
    # the three table rewrites are independent single-task jobs —
    # overlapped so the cluster isn't idle behind each one's commit
    croot = os.path.join(
        scratch_root(), f"shs_dedupidxc2_{uuid.uuid4().hex}"
    )

    def _compact(tb: str) -> None:
        (
            spark.read.parquet(os.path.join(root, tb))
            .coalesce(1)
            .write.parquet(os.path.join(croot, tb))
        )

    run_parallel(*(lambda tb=tb: _compact(tb) for tb in tables))
    after_files = {tb: _files(os.path.join(croot, tb))
                   for tb in tables}
    after_rows = {tb: _rows(os.path.join(croot, tb))
                  for tb in tables}
    files_reduced = all(
        after_files[tb] < before_files[tb] for tb in tables
    )
    rows_preserved = before_rows == after_rows

    # ---- equivalence: batch 3 against BOTH index generations ----
    # the two dedupes are independent (old vs compacted index) —
    # overlapped, and both share batch 3's checkpointed band table
    pairs_old, pairs_new = run_parallel(
        lambda: _minhash_index_dedupe(
            spark, root, b3_sh, inc_bands=b3_bands
        ).localCheckpoint(eager=True),
        lambda: _minhash_index_dedupe(
            spark, croot, b3_sh, inc_bands=b3_bands
        ).localCheckpoint(eager=True),
    )
    mism = pairs_old.select("doc_id", "dup_of", "jaccard").join(
        pairs_new.select(
            "doc_id", "dup_of",
            F.col("jaccard").alias("jaccard2"),
        ),
        ["doc_id", "dup_of"], "full_outer",
    ).filter(
        F.col("jaccard").isNull() | F.col("jaccard2").isNull()
        | (F.col("jaccard") != F.col("jaccard2"))
    ).count()

    out = pairs_new.select(
        "doc_id", "dup_of", "jaccard",
        F.lit(bool(files_reduced)).alias("files_reduced"),
        F.lit(bool(rows_preserved)).alias("rows_preserved"),
        F.lit(mism == 0).alias("dedupe_equivalent"),
    ).localCheckpoint(eager=True)  # small pair set; frees both roots
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(croot, ignore_errors=True)
    return out
