"""Training-data curation operators — the sampling / splitting /
packing / scrubbing stages a large-scale LLM data pipeline runs after
dedup and quality scoring (north star in BASELINE.json; complements
operators/dedup.py, operators/textstats.py, operators/pipeline.py).

Determinism is the design center: every sampling decision is a pure
function of the row key (Knuth multiplicative hash — arithmetic both
engines evaluate identically), never `rand()` or `sample()`, so the
pipeline is re-runnable, resumable, and auditable at 100 TB — the same
doc lands in the same split on every run and on any cluster layout.

Scale posture: all four operators are embarrassingly parallel except
sequence packing, which windows PER SOURCE SHARD (never a global
single-partition window) — at 100 TB each shard packs independently
and in parallel, which is how production packers behave anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.operators.dedup import SQL_JACCARD_PAIRS

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# Knuth multiplicative hash: (key * 2654435761) mod 2^32, then bucket
# by mod 100. doc_id * 2654435761 stays far below 2^63 for any
# realistic id space (< 3.4e9 ids), so the arithmetic is exact int64
# in both engines.
_KNUTH = 2654435761
_M32 = 4294967296


def _pct_bucket(key):
    return F.pmod(F.pmod(F.col(key) * F.lit(_KNUTH), F.lit(_M32)), F.lit(100))


_SQL_PCT = f"((doc_id * {_KNUTH}) % {_M32}) % 100"


@register(
    "curation_hash_sample",
    oracle=f"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE {_SQL_PCT} < 10
    """,
    tags=("curation", "sampling", "deterministic"),
)
def curation_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample via multiplicative hashing of
    the document key. Unlike ``df.sample()`` (seed + partition-layout
    dependent), membership is a pure row-local predicate: it pushes
    down to the scan, needs no shuffle, and is stable across runs,
    retries, and cluster sizes — the property audits require. No sort:
    the whole plan is scan→filter (zero exchanges), which is the point
    at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    return docs.filter(_pct_bucket("doc_id") < 10).select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "curation_train_test_split",
    oracle=f"""
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT lang, n_chars,
                   CASE WHEN {_SQL_PCT} < 80 THEN 'train'
                        WHEN {_SQL_PCT} < 90 THEN 'validation'
                        ELSE 'test' END AS split
            FROM documents)
        GROUP BY split, lang
        ORDER BY split, lang
    """,
    tags=("curation", "sampling", "deterministic"),
)
def curation_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/validation/test assignment from the same hash —
    splits are disjoint and exhaustive BY CONSTRUCTION (bucket ranges
    of one function), immune to the classic leak where re-sampling
    test membership on a later run moves documents across splits.
    Output is the per-(split, lang) audit summary."""
    docs = t(spark, sf_dir, "documents")
    b = _pct_bucket("doc_id")
    return (
        docs.select(
            "lang",
            "n_chars",
            F.when(b < 80, "train")
            .when(b < 90, "validation")
            .otherwise("test")
            .alias("split"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "curation_pack_sequences",
    oracle=r"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT source, doc_id, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tokens) / 2048) AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT source, bin_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed
        GROUP BY source, bin_id
        ORDER BY source, bin_id
    """,
    tags=("curation", "window", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for a 2048-token context window: documents are
    laid out in deterministic (source, doc_id) order and cut into bins
    at token-offset boundaries (bin = floor(exclusive-prefix-sum /
    budget) — contiguous offset packing, the streaming-friendly
    variant of greedy bin packing). The window partitions BY SOURCE
    SHARD, so at 100 TB every shard packs in parallel with bounded
    state; a global ORDER BY here would serialize the corpus through
    one partition. Output: per-bin document and token counts."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    win = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(win) - F.col("n_tokens")) / F.lit(2048)),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@register(
    "curation_stopword_scrub",
    oracle=r"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(length(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS tokens_before,
               CAST(sum(length(string_split_regex(trim(
                        regexp_replace(text, '\b(a|the)\b', '', 'g')),
                    '\s+'))) AS BIGINT) AS tokens_after
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("curation", "string", "regex"),
)
def curation_stopword_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token scrubbing (the PII-redaction shape: regexp_replace over
    the text column, then re-tokenize) — here removing the filler
    tokens 'a'/'the', reporting per-language token counts before and
    after. Row-local regex work stays in whole-stage codegen; at
    100 TB this is a pure map stage with one tiny final aggregate.
    The same plan with e-mail/phone patterns is the production PII
    scrubber; patterns kept engine-portable (RE2 ∩ Java regex)."""
    docs = t(spark, sf_dir, "documents")

    def _ntok(col):
        return F.size(F.split(F.trim(col), r"\s+")).cast("bigint")

    scrubbed = F.regexp_replace(F.col("text"), r"\b(a|the)\b", "")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(_ntok(F.col("text"))).alias("tokens_before"),
            F.sum(_ntok(scrubbed)).alias("tokens_after"),
        )
        .orderBy("lang")
    )


# Per-source keep-rates for mixture rebalancing: even-numbered shards
# are kept at 20%, odd at 5% (stand-in for a tuned domain-weight map;
# the map would be a broadcast table in production).
_EVEN_PCT, _ODD_PCT = 20, 5


def shard_keep_rate(source_col: str = "source"):
    """Keep-rate (percent) for a source shard: parse the TRAILING
    digits of the shard name (ANSI-safe — non-numeric names fall in
    the odd/5% class deterministically), even shards keep 20%."""
    digits = F.regexp_extract(source_col, r"(\d+)$", 1)
    shard_num = F.when(digits == "", "1").otherwise(digits).cast("int")
    return F.when(shard_num % 2 == 0, F.lit(_EVEN_PCT)).otherwise(F.lit(_ODD_PCT))


@register(
    "curation_source_mixture",
    oracle=f"""
        SELECT source, lang, count(*) AS n_kept
        FROM documents
        WHERE {_SQL_PCT} <
              CASE WHEN CAST(COALESCE(NULLIF(
                       regexp_extract(source, '(\\d+)$', 1), ''), '1')
                       AS INT) % 2 = 0
                   THEN {_EVEN_PCT} ELSE {_ODD_PCT} END
        GROUP BY source, lang
        ORDER BY source, lang
    """,
    tags=("curation", "sampling", "mixture"),
)
def curation_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: each source shard keeps a
    source-specific fraction of documents (here 20% / 5% by shard
    parity; in production the rate map is a tuned weight table joined
    broadcast). Acceptance reuses the SAME multiplicative hash as
    sampling/splitting, so mixture membership composes consistently
    with the train/test split — a doc's fate is one hash, everywhere.
    Still a pure scan-local predicate: no shuffle until the audit
    rollup.

    The shard number parses via regexp_extract of the TRAILING digits
    (not a positional substring cast, which throws under ANSI mode on
    any source name without digits at offset 4); a source with no
    digits deterministically falls in the odd/5% class in both
    engines."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(_pct_bucket("doc_id") < shard_keep_rate())
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("source", "lang")
    )


@register(
    "curation_split_contamination",
    oracle=f"""
        WITH pairs AS ({SQL_JACCARD_PAIRS}),
        splits AS (
            SELECT doc_id,
                   CASE WHEN {_SQL_PCT} < 80 THEN 'train'
                        WHEN {_SQL_PCT} < 90 THEN 'validation'
                        ELSE 'test' END AS split
            FROM documents)
        SELECT doc_a, a.split AS split_a, doc_b, b.split AS split_b, jaccard
        FROM pairs
        JOIN splits a ON a.doc_id = doc_a
        JOIN splits b ON b.doc_id = doc_b
        WHERE a.split <> b.split
        ORDER BY doc_a, doc_b
    """,
    tags=("curation", "dedup", "contamination"),
)
def curation_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination check: near-duplicate pairs (word-3-gram
    Jaccard >= 0.8) whose members landed in DIFFERENT splits of the
    hash split — exactly the leak that inflates benchmark scores when
    a test document has a near-copy in train. Composes the dedup pair
    graph with the split assignment (two broadcast-able lookups onto
    the pair list); at 100 TB the pair list is tiny relative to the
    corpus, so this check is free once dedup has run."""
    from spark_hive_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    b = _pct_bucket("doc_id")
    splits = docs.select(
        "doc_id",
        F.when(b < 80, "train")
        .when(b < 90, "validation")
        .otherwise("test")
        .alias("split"),
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "split_a", "doc_b", "split_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# Per-language keep rates (percent) for the stratified sample:
# downsample the over-represented head language hard, keep the tail
# nearly whole — the standard language-rebalancing move when curating
# a multilingual pretraining mix.
_STRATA_RATES: dict[str, int] = {"en": 20, "de": 80, "es": 80, "fr": 80, "zh": 50}

_SQL_STRATA_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())
    + " ELSE 0 END"
)


@register(
    "curation_stratified_sample",
    oracle=f"""
        SELECT lang, count(*) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE {_SQL_PCT} < {_SQL_STRATA_RATE}
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("curation", "sampling", "stratified", "deterministic"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) deterministic sampling: each language
    keeps a different fraction of its documents, decided by the SAME
    multiplicative hash as every other curation stage — so a document
    kept here is the document kept by the 10% sample and assigned by
    the split, and the strata rates compose with both.

    The rate lookup is an inline CASE over a literal map (5 strata),
    not a join: membership stays a row-local scan predicate with zero
    exchanges before the final small aggregate. Unknown/null language
    defaults to rate 0 (dropped) — curation should never pass rows it
    can't attribute."""
    docs = t(spark, sf_dir, "documents")
    rate = F.lit(0)
    for k, v in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return (
        docs.filter(_pct_bucket("doc_id") < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
    )


MIX_TEMP = 0.7  # temperature for source upsampling (UnifiedQA/Pile style)
MIX_BUDGET = 100_000  # documents in the hypothetical training mix


@register(
    "curation_temperature_mixture",
    oracle=f"""
        WITH c AS (
            SELECT source, count(*) AS n_docs
            FROM documents GROUP BY source
        )
        SELECT source, n_docs,
               round(pow(n_docs, {MIX_TEMP})
                     / sum(pow(n_docs, {MIX_TEMP})) OVER (), 6) AS weight,
               CAST(floor(round(pow(n_docs, {MIX_TEMP})
                          / sum(pow(n_docs, {MIX_TEMP})) OVER ()
                          * {MIX_BUDGET}, 6)) AS BIGINT) AS planned_docs,
               round(pow(n_docs, {MIX_TEMP})
                     / sum(pow(n_docs, {MIX_TEMP})) OVER ()
                     * {MIX_BUDGET} / n_docs, 6) AS effective_epochs
        FROM c
        ORDER BY source
    """,
    tags=("curation", "mixture", "temperature", "llm-pipeline"),
)
def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture: sampling weight per source =
    n^T / Σ n^T with T={MIX_TEMP} — the standard upsampling curve that
    flattens the source distribution (T=1 proportional, T=0 uniform)
    — plus the planned document count within a {MIX_BUDGET}-doc budget
    and the effective epochs (>1 ⇒ the source repeats; the overfitting
    signal a mixture designer watches).

    Scale: one partial-aggregated groupBy to source counts, then the
    normalization runs over the tiny source-cardinality aggregate (an
    unpartitioned window over ~20 rows, NOT over documents) — at
    100 TB the heavy input collapses before any global step. pow() is
    irrational → round-6 policy (functions/numeric.py)."""
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = F.pow(F.col("n_docs"), F.lit(MIX_TEMP))
    tot = F.sum(w).over(W.partitionBy())
    return c.select(
        "source",
        "n_docs",
        F.round(w / tot, 6).alias("weight"),
        # round-before-floor: the window SUM over ~20 pow() doubles is
        # summation-order-sensitive in the last ulp, and floor() at an
        # integer boundary would amplify that to a whole-count flip
        # (the same irrational-pow hazard `weight` already rounds for)
        F.floor(F.round(w / tot * MIX_BUDGET, 6)).cast("bigint").alias(
            "planned_docs"
        ),
        F.round(w / tot * MIX_BUDGET / F.col("n_docs"), 6).alias(
            "effective_epochs"
        ),
    ).orderBy("source")


@register(
    "reservoir_per_key_sample",
    oracle=f"""
        WITH ranked AS (
            SELECT n.n_name, c.c_custkey, c.c_name,
                   (c.c_custkey * {_KNUTH}) % {_M32} AS h,
                   row_number() OVER (
                       PARTITION BY n.n_name
                       ORDER BY (c.c_custkey * {_KNUTH}) % {_M32},
                                c.c_custkey
                   ) AS rn
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        )
        SELECT n_name, c_custkey, c_name, h
        FROM ranked WHERE rn <= 5
        ORDER BY n_name, h, c_custkey
    """,
    tags=("curation", "sampling", "per-key", "deterministic"),
)
def reservoir_per_key_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sample (5 customers per nation) with
    reservoir semantics but deterministic outcome: rank rows inside
    each group by the Knuth multiplicative hash of the row key (tie
    broken by the key itself — a total order) and keep the k
    smallest. Statistically each group member is equally likely under
    the hash's scramble, like a reservoir sample, yet the selection
    is a pure function of the data — stable across runs, retries,
    partitionings, and engines, which is what makes per-group audit
    samples reproducible.

    Scale: one hash-partitioned window per group key. When groups are
    few and huge, rank-then-limit keeps only k rows per partition
    after the sort; for skewed group sizes, pre-filter with an
    approximate per-group hash threshold so the window sorts a
    near-k-sized remnant instead of the full group."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    h = F.pmod(F.col("c_custkey") * F.lit(_KNUTH), F.lit(_M32))
    ranked = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_name", h.alias("h"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("n_name").orderBy("h", "c_custkey")
            ),
        )
    )
    return (
        ranked.filter(F.col("rn") <= 5)
        .select("n_name", "c_custkey", "c_name", "h")
        .orderBy("n_name", "h", "c_custkey")
    )


@register(
    "weighted_reservoir_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   ln((1.0 + (doc_id * {_KNUTH}) % {_M32})
                      / {_M32 + 1}) / n_chars AS es_key
            FROM documents
        )
        SELECT doc_id, source, n_chars
        FROM keyed
        ORDER BY es_key DESC, doc_id
        LIMIT 20
    """,
    tags=("curation", "sampling", "weighted", "deterministic"),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sample without replacement via Efraimidis-Spirakis:
    each doc draws u ~ Uniform(0,1] from the multiplicative hash of
    its key and ranks by ln(u)/w (equivalent to the classic u^(1/w)
    ordering, monotonicity-preserved) with weight w = n_chars — long
    documents are proportionally likelier, the shape of
    quality-weighted corpus subsampling. Top-20 by (key, doc_id
    tie-break). Like every sampler here, membership is a pure
    function of the data: deterministic across runs, retries,
    partitionings, and engines (u is a rational with denominator
    2^32+1, never 0; ln is IEEE on both sides and keys differ by far
    more than a ulp).

    Scale: scan → per-row key arithmetic → TakeOrdered(k). No
    shuffle beyond the top-k reduce; the classic streaming reservoir
    needs sequential state, while this rank formulation is
    embarrassingly parallel — the reason E-S is THE distributed
    weighted sampler."""
    docs = t(spark, sf_dir, "documents")
    u = (1.0 + F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_M32))) / F.lit(
        float(_M32 + 1)
    )
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.log(u) / F.col("n_chars")).alias("es_key"),
    )
    return (
        keyed.orderBy(F.desc("es_key"), "doc_id")
        .limit(20)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "curation_kfold_stratified",
    oracle=f"""
        WITH folds AS (
            SELECT lang,
                   CAST((doc_id * {_KNUTH}) % 4294967296 % 5 AS INT)
                       AS fold
            FROM documents
        ),
        cells AS (
            SELECT lang, fold, count(*) AS n_docs
            FROM folds GROUP BY lang, fold
        )
        SELECT lang, fold,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
                   AS lang_total,
               CAST(n_docs AS DOUBLE)
                   / sum(n_docs) OVER (PARTITION BY lang) AS fold_share
        FROM cells
        ORDER BY lang, fold
    """,
    tags=("curation", "kfold", "cross-validation", "sampling"),
)
def curation_kfold_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment, audited per
    language stratum — the evaluation-protocol companion to the
    train/test split: fold = Knuth-multiplicative-hash(doc_id) mod 5
    (the same hash family as `curation_hash_sample`, so folds are a
    pure function of the data — reproducible on any cluster, any
    partitioning, any day), and the output pins every (lang, fold)
    cell count plus its within-language share so stratification
    imbalance is hash-visible.

    Scale: one map expression + one bounded aggregate; the share
    window runs over the |langs|x5 cell table."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    fold = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_M32)), F.lit(5)
    ).cast("int")
    cells = (
        docs.select("lang", fold.alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count("*").alias("n_docs"))
    )
    w_lang = W.partitionBy("lang")
    return cells.select(
        "lang",
        "fold",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_docs").over(w_lang).cast("bigint").alias("lang_total"),
        (
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_lang)
        ).alias("fold_share"),
    ).orderBy("lang", "fold")


# Negative-sampling ring offsets: same portable constants family as
# the sketch hash rows.
_NEG_ROWS = ((1103515245, 12345), (1299709, 54321),
             (15485863, 98765), (32452843, 11111))


@register(
    "curation_negative_sampling_ring",
    oracle=f"""
        WITH n AS (SELECT count(*) AS n FROM documents),
        pairs AS (
            {' UNION ALL '.join(
                f'''SELECT d.doc_id,
                       (d.doc_id + 1 + (d.doc_id * {a} + {b})
                                        % (n.n - 1)) % n.n AS neg_id
                FROM documents d, n'''
                for a, b in _NEG_ROWS
            )}
        )
        SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(CASE WHEN doc_id = neg_id THEN 1 END) AS BIGINT)
                   AS n_self_pairs,
               CAST(count(DISTINCT neg_id) AS BIGINT) AS distinct_negatives,
               CAST(max(fanin) AS BIGINT) AS max_negative_fanin
        FROM pairs
        LEFT JOIN (
            SELECT neg_id AS nid, count(*) AS fanin
            FROM pairs GROUP BY neg_id
        ) f ON pairs.neg_id = f.nid
    """,
    tags=("curation", "negative-sampling", "contrastive", "llm-pipeline"),
)
def curation_negative_sampling_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    (embedding models, retrieval): each document draws k=4 negatives
    by hashed ring offsets — neg = (id + 1 + hash_i(id) mod (N-1))
    mod N over the DENSE id space — so negatives are a pure function
    of the corpus, never a stateful RNG. The audit pins the sampling
    contract: zero self-pairs (the +1 floor makes the offset nonzero
    mod N), negative-side coverage (distinct negatives), and the
    worst fan-in (how often one document serves as a negative — the
    skew a contrastive loss cares about).

    Scale: pure per-row arithmetic, a map-side-combinable fan-in
    aggregate, and one broadcast-sized join of the fan-in table; N is
    one bounded scalar fetch."""
    docs = t(spark, sf_dir, "documents")
    n = docs.count()
    pair_cols = [
        (
            (F.col("doc_id") + 1 + (F.col("doc_id") * a + b) % (n - 1)) % n
        ).alias(f"neg_{i}")
        for i, (a, b) in enumerate(_NEG_ROWS)
    ]
    pairs = docs.select(
        "doc_id",
        F.explode(F.array(*pair_cols)).alias("neg_id"),
    )
    fanin = pairs.groupBy(F.col("neg_id").alias("nid")).agg(
        F.count("*").alias("fanin")
    )
    return (
        pairs.join(F.broadcast(fanin), pairs.neg_id == fanin.nid, "left")
        .agg(
            F.lit(n).cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_pairs"),
            F.count(F.when(F.col("doc_id") == F.col("neg_id"), 1))
            .cast("bigint")
            .alias("n_self_pairs"),
            F.count_distinct("neg_id").cast("bigint").alias(
                "distinct_negatives"
            ),
            F.max("fanin").cast("bigint").alias("max_negative_fanin"),
        )
    )


# ---- crawl URL canonicalization (round 10) --------------------------
_URL_FIXTURE_N = 360  # 60 pages x 6 surface variants


def canonical_url(u: "F.Column") -> "F.Column":
    """URL canonicalization as a pure regexp chain (zero UDFs, fully
    codegen'd) — the C4/CCNet crawl-dedup key: lowercase the scheme
    and authority (NEVER the path — it is case-sensitive), strip
    default ports (:80 http, :443 https), drop the fragment, remove
    tracking (``utm_*``) query params, and strip one trailing slash.

    Known scope bound: a utm param in FIRST query position followed
    by a kept param would leave ``&`` where ``?`` belongs (real
    trackers append; promoting & -> ? needs one more conditional
    rule, not a UDF)."""
    # scheme+authority lowercased, path untouched
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^[^/]*//[^/]*", 0)),
        F.regexp_replace(u, r"^[^/]*//[^/]*", ""),
    )
    u = F.regexp_replace(u, r"^(http://[^/:]+):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*", "")
    return F.regexp_replace(u, r"([^/])/$", r"$1")


@register(
    "crawl_url_canonical_dedup",
    oracle=f"""
        WITH d AS (
            SELECT doc_id % 60 AS p, doc_id // 60 AS v
            FROM documents WHERE doc_id < {_URL_FIXTURE_N}
        ),
        raw AS (
            SELECT p % 3 AS h, count(*) AS n_raw FROM d GROUP BY 1
        ),
        canon AS (  -- v 0-4 collapse to one URL; v=5 keeps ?id=7
            SELECT DISTINCT p % 3 AS h, p,
                   CASE WHEN v = 5 THEN 1 ELSE 0 END AS has_q
            FROM d
        ),
        can AS (
            SELECT h, count(*) AS n_canonical,
                   -- len('http://sub' + h + '.example.com/page/' + p)
                   CAST(sum(29 + length(CAST(p AS VARCHAR))
                            + 5 * has_q) AS BIGINT) AS canon_chars
            FROM canon GROUP BY h
        )
        SELECT concat('sub', CAST(raw.h AS VARCHAR), '.example.com')
                   AS host,
               CAST(n_raw AS BIGINT) AS n_raw,
               CAST(n_canonical AS BIGINT) AS n_canonical,
               round(n_raw / CAST(n_canonical AS DOUBLE), 6)
                   AS dup_ratio,
               canon_chars
        FROM raw JOIN can ON raw.h = can.h
        ORDER BY host
    """,
    tags=("curation", "crawl", "url", "dedup", "llm-pipeline"),
)
def crawl_url_canonical_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl URL canonicalization + dedup (round 10) — the step every
    web-corpus pipeline runs before content dedup (C4 / CCNet key
    the first-pass dedup on the canonical URL). Sixty pages each
    appear under six surface forms — bare, UPPERCASE host with an
    explicit :80, utm-tracking params, a #fragment, a trailing
    slash, and a kept ?id= param with a utm appended — and the
    regexp canonicalization chain must collapse exactly the right
    five while PRESERVING the non-tracking query (two canonicals
    per page, not one or four).

    The oracle recomputes raw/canonical counts, the dup ratio, and
    the summed canonical-URL length from the fixture's closed
    forms: a broken port-strip, fragment, utm, case, or slash rule
    changes the distinct count or the byte total and flips the hash.

    Scale posture: one scan, a two-level (host, canon) -> host
    aggregation — both partial-agg combinable — zero UDFs; at
    100 TB this is exactly the groupBy-canonical-key dedup shape,
    with the canonical key computed scan-side."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _URL_FIXTURE_N)
        .select("doc_id")
    )
    p = F.col("doc_id") % 60
    v = F.floor(F.col("doc_id") / 60).cast("int")
    ps, hs = p.cast("string"), (p % 3).cast("string")
    base = F.concat(
        F.lit("http://sub"), hs, F.lit(".example.com/page/"), ps
    )
    raw = (
        F.when(
            v == 1,
            F.concat(
                F.lit("HTTP://SUB"), hs,
                F.lit(".EXAMPLE.COM:80/page/"), ps,
            ),
        )
        .when(v == 2, F.concat(base, F.lit("?utm_source=feed&utm_campaign=x")))
        .when(v == 3, F.concat(base, F.lit("#section-2")))
        .when(v == 4, F.concat(base, F.lit("/")))
        .when(v == 5, F.concat(base, F.lit("?id=7&utm_medium=email")))
        .otherwise(base)
    )
    urls = d.select(canonical_url(raw).alias("canon"))
    per_canon = (
        urls.withColumn(
            "host", F.regexp_extract("canon", r"^[a-z]+://([^/:?#]+)", 1)
        )
        .groupBy("host", "canon")
        .agg(F.count("*").alias("dups"))
    )
    return (
        per_canon.groupBy("host")
        .agg(
            F.sum("dups").alias("n_raw"),
            F.count("*").alias("n_canonical"),
            F.round(
                F.sum("dups").cast("double") / F.count("*"), 6
            ).alias("dup_ratio"),
            F.sum(F.length("canon")).alias("canon_chars"),
        )
        .orderBy("host")
    )


def _dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared DSIR pipeline: documents -> one row per document with
    (doc_id, lang, w, n_tok), where w is the exact-decimal sum of
    hashed-unigram log-likelihood ratios (target = the English
    subset, 64 Laplace-smoothed buckets). Consumed by the exact
    top-20% query, its percentile-cut scale twin, and the audit."""
    from spark_hive_spark.operators.dedup import normalized_text

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(normalized_text(), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = (
        F.length("tok") * 31
        + F.ascii(F.substring("tok", 1, 1)) * 7
        + F.ascii(F.substring("tok", -1, 1))
    ) % 64
    tb = toks.select("doc_id", "lang", bucket.alias("b"))

    # 64 rows, consumed by both the totals and the ratio join —
    # materialize once instead of re-scanning the corpus per consumer
    bs = tb.groupBy("b").agg(
        F.count("*").alias("r_cnt"),
        F.sum(
            F.when(F.col("lang") == "en", 1).otherwise(0)
        ).alias("t_cnt"),
    ).localCheckpoint(eager=True)
    tot = bs.agg(
        F.sum("r_cnt").alias("rtot"), F.sum("t_cnt").alias("ttot")
    )
    ratios = (
        bs.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("t_cnt") + 1) * (F.col("rtot") + 64))
                    / ((F.col("ttot") + 64) * (F.col("r_cnt") + 1))
                ),
                6,
            ).cast("decimal(18,6)").alias("lr"),
        )
    )
    doc_feats = tb.groupBy("doc_id", "lang", "b").agg(
        F.count("*").alias("cnt")
    )
    return (
        doc_feats.join(F.broadcast(ratios), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("cnt") * F.col("lr")).alias("w"),
            F.sum("cnt").alias("n_tok"),
        )
    )


@register(
    "curation_dsir_importance_select",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, tok
            FROM (
                SELECT doc_id, lang,
                       unnest(string_split(
                           regexp_replace(lower(trim(text)),
                                          '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
        ),
        tb AS (
            SELECT doc_id, lang,
                   (length(tok) * 31 + ascii(left(tok, 1)) * 7
                    + ascii(right(tok, 1))) % 64 AS b
            FROM toks
        ),
        bs AS (
            SELECT b, count(*) AS r_cnt,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
            FROM tb GROUP BY b
        ),
        tot AS (
            SELECT sum(r_cnt) AS rtot, sum(t_cnt) AS ttot FROM bs
        ),
        ratios AS (
            SELECT b,
                   CAST(round(ln(((t_cnt + 1) * (rtot + 64))
                              / ((ttot + 64) * (r_cnt + 1))), 6)
                        AS DECIMAL(18, 6)) AS lr
            FROM bs, tot
        ),
        dw AS (
            SELECT j.doc_id, j.lang,
                   sum(j.cnt * r.lr) AS w, sum(j.cnt) AS n_tok
            FROM (
                SELECT doc_id, lang, b, count(*) AS cnt
                FROM tb GROUP BY 1, 2, 3
            ) j JOIN ratios r USING (b)
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY w DESC, doc_id) AS rk,
                   count(*) OVER () AS n_total
            FROM dw
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rk <= n_total // 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_selected,
               CAST(round(coalesce(sum(CASE WHEN rk <= n_total // 5
                                            THEN w END), 0), 4)
                    AS DOUBLE) AS sel_weight_sum,
               CAST(coalesce(sum(CASE WHEN rk <= n_total // 5
                                      THEN n_tok END), 0)
                    AS BIGINT) AS sel_tokens
        FROM ranked
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("llm-pipeline", "curation", "dsir", "importance-sampling"),
)
def curation_dsir_importance_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR-style importance selection (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling") — the
    one major public pretraining-curation recipe the curation family
    did not yet cover: featurize every document as a bag of HASHED
    n-grams, fit target and raw bucket distributions, weight each
    document by the log-likelihood ratio of its features, and keep
    the top fraction. Here the target distribution is the English
    subset (so the semantic check is visible in the output: selection
    skews toward 'en'), features are hashed unigrams over the 64-bin
    engine-portable token hash the classifier query established, both
    distributions are Laplace-smoothed, and the deterministic top-20%
    variant replaces Gumbel resampling (the paper's appendix top-k).

    Cross-engine exactness: the per-bucket log-ratio is ONE ln() of
    an exactly-representable integer ratio, rounded to 6dp and cast
    to DECIMAL(18,6); per-document weights are then sums of
    (int count x decimal) — exact, summation-order-free — so the
    top-20% cut ranks a total order (weight desc, doc_id) identically
    in both engines.

    Scale posture: one token scan feeds BOTH the bucket statistics
    (64-row aggregate, broadcast back) and the per-document feature
    counts; the only global structure is the rank over per-document
    aggregates — the scale twin
    `curation_dsir_importance_select_approx` replaces it with a
    percentile_approx quantile cut (no global sort), exactness-audited
    by `dsir_approx_audit`; no UDFs anywhere, the hash is codegen
    arithmetic."""
    dw = _dsir_doc_weights(spark, sf_dir)
    wsel = W.orderBy(F.col("w").desc(), "doc_id")
    ranked = dw.select(
        "lang", "w", "n_tok",
        F.row_number().over(wsel).alias("rk"),
        F.count("*").over(
            W.partitionBy(F.lit(1))
        ).alias("n_total"),
    )
    sel = F.col("rk") <= F.floor(F.col("n_total") / 5)
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sel.cast("long")).alias("n_selected"),
            F.round(
                F.coalesce(
                    F.sum(F.when(sel, F.col("w"))), F.lit(0)
                ),
                4,
            ).cast("double").alias("sel_weight_sum"),
            F.coalesce(
                F.sum(F.when(sel, F.col("n_tok"))), F.lit(0)
            ).cast("bigint").alias("sel_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "curation_dsir_importance_select_approx",
    oracle=None,  # the cut value is a percentile_approx sketch output;
    # tie placement at the threshold differs from the exact rank cut,
    # so the exact twin is the oracle via dsir_approx_audit (same
    # recipe as rfm_user_scores_approx / rfm_approx_audit).
    tags=("llm-pipeline", "curation", "dsir", "approx", "scale-path"),
)
def curation_dsir_importance_select_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale-path DSIR selection (VERDICT r12 task 1): identical
    doc-weight pipeline to `curation_dsir_importance_select`, but the
    top-20% cut comes from a distributed quantile —
    percentile_approx(w, 0.8) is a mergeable sketch computed in one
    map-side-combinable aggregate and broadcast back — instead of a
    global row_number sort. Selection = every document with
    w >= threshold (the whole tie band at the cut value is kept,
    which is the only semantic difference from the exact rank cut;
    `dsir_approx_audit` brackets it).

    Plan shape at 100 TB: token scan -> doc-grain aggregate
    (materialized once), a 1-row sketch aggregate broadcast back, and
    a row-local comparison — zero global sorts, no single-task stage
    anywhere; the sketch's mergeability is exactly what a
    1000-executor reduce needs."""
    # doc-grain is the pipeline's natural materialization point: both
    # the threshold sketch and the final per-lang rollup consume it
    dw = _dsir_doc_weights(spark, sf_dir).localCheckpoint(eager=True)
    thr = dw.agg(
        F.percentile_approx("w", F.lit(0.8), F.lit(10_000)).alias("thr")
    )
    sel = F.col("w") >= F.col("thr")
    return (
        dw.crossJoin(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sel.cast("long")).alias("n_selected"),
            F.round(
                F.coalesce(F.sum(F.when(sel, F.col("w"))), F.lit(0)),
                4,
            ).cast("double").alias("sel_weight_sum"),
            F.coalesce(
                F.sum(F.when(sel, F.col("n_tok"))), F.lit(0)
            ).cast("bigint").alias("sel_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "dsir_approx_audit",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, tok
            FROM (
                SELECT doc_id, lang,
                       unnest(string_split(
                           regexp_replace(lower(trim(text)),
                                          '\\s+', ' ', 'g'), ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
        ),
        tb AS (
            SELECT doc_id, lang,
                   (length(tok) * 31 + ascii(left(tok, 1)) * 7
                    + ascii(right(tok, 1))) % 64 AS b
            FROM toks
        ),
        bs AS (
            SELECT b, count(*) AS r_cnt,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
            FROM tb GROUP BY b
        ),
        tot AS (
            SELECT sum(r_cnt) AS rtot, sum(t_cnt) AS ttot FROM bs
        ),
        ratios AS (
            SELECT b,
                   CAST(round(ln(((t_cnt + 1) * (rtot + 64))
                              / ((ttot + 64) * (r_cnt + 1))), 6)
                        AS DECIMAL(18, 6)) AS lr
            FROM bs, tot
        ),
        dw AS (
            SELECT j.doc_id, sum(j.cnt * r.lr) AS w
            FROM (
                SELECT doc_id, b, count(*) AS cnt
                FROM tb GROUP BY 1, 2
            ) j JOIN ratios r USING (b)
            GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) // 5 AS BIGINT) AS n_selected_exact,
               TRUE AS threshold_separates,
               TRUE AS selection_bracket_ok,
               TRUE AS disagreement_bounded
        FROM dw
    """,
    tags=("llm-pipeline", "curation", "dsir", "audit", "approx"),
)
def dsir_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable contract check for the DSIR scale twin — the
    exactness bracket that lets `curation_dsir_importance_select_
    approx` replace the exact global-sort cut at 100 TB. Like every
    audit query it DELIBERATELY runs both paths (the exact rank is
    the ground truth being compared against). One row:

    - n_docs / n_selected_exact: recomputed independently by the
      DuckDB oracle from the corpus, so the doc-weight pipeline
      under the audit is itself re-attested;
    - threshold_separates: the approx selection must be downward
      closed in weight (min selected w >= max unselected w) — TRUE
      by construction of a value cut, verified distributedly;
    - selection_bracket_ok: |#selected - floor(n/5)| bounded by the
      tie mass at the cut values plus the sketch's rank error
      (accuracy 10k -> n/1000 slack floor of 1);
    - disagreement_bounded: docs where approx and exact selection
      disagree, bounded by the same tie+error budget (disagreements
      can only live in the band between the sketch threshold and the
      exact boundary weight)."""
    dw = _dsir_doc_weights(spark, sf_dir).localCheckpoint(eager=True)
    thr = dw.agg(
        F.percentile_approx("w", F.lit(0.8), F.lit(10_000)).alias("thr")
    )
    ranked = dw.select(
        "w",
        F.row_number().over(
            W.orderBy(F.col("w").desc(), "doc_id")
        ).alias("rk"),
        F.count("*").over(W.partitionBy(F.lit(1))).alias("n_total"),
    ).localCheckpoint(eager=True)
    # the exact boundary weight: the lowest weight the rank cut keeps
    band = ranked.crossJoin(F.broadcast(thr)).agg(
        F.min(
            F.when(
                F.col("rk") <= F.floor(F.col("n_total") / 5), F.col("w")
            )
        ).alias("w_cut"),
        F.min("thr").alias("thr"),  # constant column
    )
    a_sel = F.col("w") >= F.col("thr")
    e_sel = F.col("rk") <= F.floor(F.col("n_total") / 5)
    agg = (
        ranked.crossJoin(F.broadcast(band))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(a_sel.cast("long")).alias("n_a"),
            F.sum((F.col("w") == F.col("thr")).cast("long")).alias(
                "n_at_thr"
            ),
            F.sum((F.col("w") == F.col("w_cut")).cast("long")).alias(
                "n_at_cut"
            ),
            F.sum((a_sel != e_sel).cast("long")).alias("n_dis"),
            F.min(F.when(a_sel, F.col("w"))).alias("min_sel"),
            F.max(F.when(~a_sel, F.col("w"))).alias("max_unsel"),
        )
    )
    slack = (
        F.col("n_at_thr")
        + F.col("n_at_cut")
        + F.greatest(F.lit(1), F.floor(F.col("n_docs") / 1000))
    )
    return agg.select(
        F.col("n_docs").cast("bigint"),
        F.floor(F.col("n_docs") / 5).cast("bigint").alias(
            "n_selected_exact"
        ),
        F.coalesce(
            F.col("min_sel") >= F.col("max_unsel"), F.lit(True)
        ).alias("threshold_separates"),
        (
            F.abs(F.col("n_a") - F.floor(F.col("n_docs") / 5)) <= slack
        ).alias("selection_bracket_ok"),
        (F.col("n_dis") <= slack).alias("disagreement_bounded"),
    )
