"""Retrieval operators: BM25 ranking and positional phrase search —
the search-engine workload (RAG retrieval, corpus QA) over the
documents fixture, built on the same tokenization as textstats.

Scale posture: both operators are inverted-index shaped — tokenize
once, aggregate to term/posting cardinality (map-side combinable),
then join QUERY-SIDED relations (a 3-term query set, one phrase)
broadcast against the postings. No all-pairs structure anywhere; the
corpus is scanned a bounded number of times and every reduce key is a
term or a doc id.

Determinism: BM25 per-term scores round to 6dp and sum as exact
DECIMAL(12,6) (3-term double sums would be summation-order sensitive);
idf/tf inputs are exact integer counts. The phrase query's oracle
deliberately uses a DIFFERENT algorithm (padded-substring containment
on the normalized text) than the Spark side (positional self-join on
the token index) — hash equality is a cross-algorithm proof, not a
mirrored computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.operators.dedup import SQL_NORM_TEXT, normalized_text
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_RANKS = (10, 11, 12)  # df-rank of the synthetic query terms
BM25_TOP = 20

_BM25_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split({SQL_NORM_TEXT}, ' ')) AS w
        FROM documents
    ),
    tf AS (
        SELECT doc_id, w, count(*) AS tf
        FROM tok WHERE w <> '' GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM dl
    ),
    df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    qterms AS (
        SELECT w, df FROM (
            SELECT w, df,
                   row_number() OVER (ORDER BY df DESC, w) AS r
            FROM df
        ) WHERE r IN ({", ".join(str(r) for r in BM25_QUERY_RANKS)})
    ),
    scored AS (
        SELECT f.doc_id,
               CAST(round(
                   ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
                   * f.tf * ({BM25_K1} + 1)
                   / (f.tf + {BM25_K1} * (1 - {BM25_B}
                      + {BM25_B} * d.dl / avgdl)),
                   6) AS DECIMAL(12,6)) AS term_score
        FROM tf f
        JOIN qterms q ON f.w = q.w
        JOIN dl d ON d.doc_id = f.doc_id, stats
    ),
    ranked AS (
        SELECT doc_id,
               CAST(sum(term_score) AS DOUBLE) AS score,
               count(*) AS n_terms_hit
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, round(score, 4) AS bm25,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM ranked
    ORDER BY round(score, 4) DESC, doc_id
    LIMIT {BM25_TOP}
"""


@register(
    "search_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("search", "bm25", "retrieval"),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 TOP-K RETRIEVAL — Lucene-form BM25
    (idf = ln((N−df+0.5)/(df+0.5)+1), k1 = 1.2, b = 0.75) for a
    3-term query chosen deterministically inside the query (the
    tokens at document-frequency ranks 10-12 — high-signal,
    corpus-independent), returning the top-20 documents under a
    (rounded score, doc_id) total order. Per-term scores round to
    6dp and sum as exact decimal before the final 4dp display —
    3-term double sums would otherwise be order-sensitive."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("w")
    )
    tf = (
        toks.filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # posting list; 3 consumers
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    qterms = (
        dfreq.withColumn(
            "r", F.row_number().over(W.orderBy(F.desc("df"), "w"))
        )
        .filter(F.col("r").isin(*BM25_QUERY_RANKS))
        .select("w", "df")
    )
    scored = (
        tf.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * (BM25_K1 + 1)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("term_score").cast("double"), 4).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOP)
    )


_PHRASE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split({SQL_NORM_TEXT}, ' ') AS tk
        FROM documents
    ),
    tri AS (
        SELECT unnest(list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ph
        FROM toks WHERE len(tk) >= 3
    ),
    top AS (
        SELECT ph, count(*) AS c FROM tri
        GROUP BY ph ORDER BY c DESC, ph LIMIT 1
    )
    SELECT top.ph AS phrase,
           CAST(top.c AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(sum(DISTINCT d.doc_id) AS BIGINT) AS doc_id_checksum
    FROM documents d, top
    WHERE contains(' ' || {SQL_NORM_TEXT} || ' ', ' ' || top.ph || ' ')
    GROUP BY top.ph, top.c
"""


@register(
    "search_phrase_positional_index",
    oracle=_PHRASE_ORACLE,
    tags=("search", "phrase", "positional-index"),
)
def search_phrase_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL PHRASE SEARCH, cross-algorithm attested: the Spark
    side finds the corpus's most frequent word TRIGRAM and the
    documents containing it via the positional token index (posexplode
    + two leads — the inverted-index adjacency method a search engine
    uses); the ORACLE answers the same question by padded-substring
    containment on the normalized text. On single-space-normalized
    text the two are provably equivalent, so hash equality validates
    the index construction against an independent algorithm rather
    than a mirrored one."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "w"),
    )
    dw = W.partitionBy("doc_id").orderBy("pos")
    tri = (
        toks.withColumn("w2", F.lead("w", 1).over(dw))
        .withColumn("w3", F.lead("w", 2).over(dw))
        .filter(
            (F.col("w") != "")
            & F.col("w2").isNotNull()
            & F.col("w3").isNotNull()
        )
        .select(
            "doc_id",
            F.concat_ws(" ", "w", "w2", "w3").alias("ph"),
        )
        .localCheckpoint(eager=True)  # trigram postings; 2 consumers
    )
    top = (
        tri.groupBy("ph")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "ph")
        .limit(1)
    )
    return (
        tri.join(F.broadcast(top), "ph")
        .groupBy("ph", "c")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum_distinct("doc_id").cast("bigint").alias("doc_id_checksum"),
        )
        .select(
            F.col("ph").alias("phrase"),
            F.col("c").cast("bigint").alias("n_occurrences"),
            "n_docs",
            "doc_id_checksum",
        )
    )
