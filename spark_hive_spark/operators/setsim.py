"""Prefix-filtered set-similarity join (PPJoin-style) — the published
exact algorithm for Jaccard joins at scale (Chaudhuri et al. ICDE'06
primitive; Xiao et al. WWW'08 PPJoin), complementing the heuristic
inverted-index join in operators/dedup.py (which caps shingle document
frequency — recall-traded) with a PROVABLY COMPLETE candidate
generator: if J(x,y) >= t then x and y share a token in each other's
(|x| - ceil(t|x|) + 1)-prefix under any fixed global token order
(proof: J >= t implies |x∩y| >= t|x| — from I(1+t) >= t(|x|+|y|) and
|y| >= I — and the suffix beyond the prefix holds only
ceil(t|x|) - 1 tokens, too few to contain the whole intersection).

Scale posture: tokens order by ASCENDING document frequency (rarest
first), so prefix tokens are the rarest in each document and the
prefix self-join's per-token fan-out is the SMALLEST the data allows —
the frequency-ordered prefix is what makes PPJoin linear-ish where a
full inverted index explodes on stopwords. The verification join
touches candidate pairs only. The threshold is the rational 4/5 and
ALL filter math is integer (alpha = (4L+4) DIV 5; 5·I >= 4·(L1+L2−I)),
so completeness never hinges on IEEE rounding of t·L.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.operators.dedup import SQL_NORM_TEXT, normalized_text
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# Jaccard threshold as an exact rational: T_NUM/T_DEN = 0.8
T_NUM = 4
T_DEN = 5

_PPJOIN_ORACLE = f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, lang, token FROM (
            SELECT doc_id, lang,
                   unnest(string_split({SQL_NORM_TEXT}, ' ')) AS token
            FROM documents
        ) WHERE token <> ''
    ),
    sizes AS (SELECT doc_id, count(*) AS L FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
        FROM tok a
        JOIN tok b ON a.token = b.token AND a.lang = b.lang
                   AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    ,matched AS (
        SELECT p.doc1, p.doc2, p.inter,
               (20 * p.inter) // (sa.L + sb.L - p.inter) AS bucket
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc1
        JOIN sizes sb ON sb.doc_id = p.doc2
        WHERE {T_DEN} * p.inter >= {T_NUM} * (sa.L + sb.L - p.inter)
    )
    SELECT CAST(bucket AS BIGINT) AS jaccard_ventile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(inter) AS BIGINT) AS sum_common,
           CAST(sum(doc1 * 1000003 + doc2) AS BIGINT) AS pair_checksum
    FROM matched
    GROUP BY bucket
    ORDER BY jaccard_ventile
"""


@register(
    "setsim_ppjoin_prefix_filter",
    oracle=_PPJOIN_ORACLE,
    tags=("similarity", "set-join", "prefix-filter"),
)
def setsim_ppjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT JACCARD SELF-JOIN via prefix filtering: word-token sets
    per document, global token order by (document-frequency ASC,
    token ASC), candidates = pairs sharing a token within both
    documents' (L - ceil(0.8·L) + 1)-prefixes, then exact integer
    verification 5·I >= 4·(L1+L2−I). The corpus is heavily templated
    (30k+ matching pairs at sf0.01), so the output contracts the
    pair list to per-Jaccard-ventile rows carrying n_pairs,
    sum_common, and an integer PAIR CHECKSUM — one missed or extra
    candidate pair shifts the checksum, so hash-equality against the
    oracle's EXHAUSTIVE token join is still a proof of candidate
    completeness on this corpus, not just of the verification
    arithmetic (a pytest re-proves it pairwise at smoke scale
    against a Spark-side brute force)."""
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(normalized_text(), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return _ppjoin_ventiles(toks)


def _ppjoin_ventiles(toks: DataFrame) -> DataFrame:
    """Shared PPJoin core over any (doc_id, lang, token) DISTINCT set
    relation: rarest-first global order, prefix index, integer length
    filter, array-intersect verification, ventile contraction. Both
    the word-set and the shingle-set queries instantiate this — the
    element type is what decides the cost curve (see SCALE.md's
    measured-scaling section)."""
    # global frequency order: rarest tokens first
    rank = (
        toks.groupBy("token")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "trank", F.row_number().over(W.orderBy("df", "token"))
        )
        .select("token", "trank")
    )
    # materialize the ranked token index ONCE: it feeds sizes, the
    # prefix index, and the verification arrays — without this the
    # corpus re-tokenizes per consumer (measured 16 logical document
    # scans). This is the standard build-the-inverted-index-then-use
    # materialization every set-similarity system performs.
    ranked = (
        toks.join(rank, "token")
        .select("doc_id", "lang", "trank")
        .localCheckpoint(eager=True)
    )
    sizes = (
        ranked.groupBy("doc_id", "lang")
        .agg(F.count("*").alias("L"))
        .localCheckpoint(eager=True)  # doc-cardinality, 3 consumers
    )
    # 1-based position of each token in the doc's rarest-first order
    pos = ranked.withColumn(
        "rn", F.row_number().over(W.partitionBy("doc_id").orderBy("trank"))
    )
    prefix = (
        pos.join(sizes.drop("lang"), "doc_id")
        # rn <= L - alpha + 1, alpha = ceil(T_NUM*L/T_DEN) exact
        .filter(
            F.col("rn")
            <= F.col("L")
            - F.expr(f"({T_NUM} * L + {T_DEN} - 1) DIV {T_DEN}")
            + 1
        )
        .select("doc_id", "trank")
    )
    pl = prefix.join(sizes, "doc_id")
    cand = (
        pl.alias("a")
        .join(pl.alias("b"), ["trank", "lang"])
        # same-lang blocking (cross-language Jaccard is meaningless
        # and blocking is the standard scale lever), doc1 < doc2,
        # plus the PPJoin length filter: J >= t forces t·L1 <= L2
        # and t·L2 <= L1 (exact rational comparison)
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (T_NUM * F.col("a.L") <= T_DEN * F.col("b.L"))
            & (T_NUM * F.col("b.L") <= T_DEN * F.col("a.L"))
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .distinct()
    )
    # verification: sorted token-rank arrays per doc, intersected
    # JVM-side per candidate pair. The doc-array relation is
    # doc-cardinality (not token-cardinality) and broadcasts at
    # fixture scale — verification then runs map-side over the
    # candidate stream with NO extra shuffle. At 100 TB the same
    # plan drops the broadcast hints and becomes two shuffle joins
    # on doc id — still candidate-bound, never corpus².
    doc_arr = ranked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("trank")).alias("arr"),
        F.count("*").alias("L"),
    )
    a1 = doc_arr.select(
        F.col("doc_id").alias("doc1"),
        F.col("arr").alias("arr1"),
        F.col("L").alias("L1"),
    )
    a2 = doc_arr.select(
        F.col("doc_id").alias("doc2"),
        F.col("arr").alias("arr2"),
        F.col("L").alias("L2"),
    )
    inter = (
        cand.join(F.broadcast(a1), "doc1")
        .join(F.broadcast(a2), "doc2")
        .withColumn(
            "inter", F.size(F.array_intersect("arr1", "arr2")).cast("long")
        )
    )
    return (
        inter.filter(
            T_DEN * F.col("inter")
            >= T_NUM * (F.col("L1") + F.col("L2") - F.col("inter"))
        )
        .withColumn(
            "jaccard_ventile",
            F.expr("(20 * inter) DIV (L1 + L2 - inter)").cast("bigint"),
        )
        .groupBy("jaccard_ventile")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("inter").cast("bigint").alias("sum_common"),
            F.sum(F.col("doc1") * 1000003 + F.col("doc2"))
            .cast("bigint")
            .alias("pair_checksum"),
        )
        .orderBy("jaccard_ventile")
    )


_SHINGLE_W = 3

_PPJOIN_SHINGLE_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, lang,
               list_filter(string_split({SQL_NORM_TEXT}, ' '),
                           x -> x <> '') AS a
        FROM documents
    ),
    tok AS (
        SELECT DISTINCT doc_id, lang,
               a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS token
        FROM (SELECT doc_id, lang, a, unnest(range(1, len(a) - 1)) AS i
              FROM words WHERE len(a) >= {_SHINGLE_W})
    ),
    sizes AS (SELECT doc_id, count(*) AS L FROM tok GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
        FROM tok a
        JOIN tok b ON a.token = b.token AND a.lang = b.lang
                   AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    matched AS (
        SELECT p.doc1, p.doc2, p.inter,
               (20 * p.inter) // (sa.L + sb.L - p.inter) AS bucket
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.doc1
        JOIN sizes sb ON sb.doc_id = p.doc2
        WHERE {T_DEN} * p.inter >= {T_NUM} * (sa.L + sb.L - p.inter)
    )
    SELECT CAST(bucket AS BIGINT) AS jaccard_ventile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(inter) AS BIGINT) AS sum_common,
           CAST(sum(doc1 * 1000003 + doc2) AS BIGINT) AS pair_checksum
    FROM matched
    GROUP BY bucket
    ORDER BY jaccard_ventile
"""


@register(
    "setsim_ppjoin_shingle_join",
    oracle=_PPJOIN_SHINGLE_ORACLE,
    tags=("similarity", "set-join", "prefix-filter", "shingles"),
)
def setsim_ppjoin_shingle_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin in its SCALE-CORRECT configuration: the same exact
    prefix-filtered Jaccard self-join as `setsim_ppjoin_prefix_filter`
    but over word-3-gram SHINGLE sets instead of word
    sets. The element universe now grows with the corpus (O(|V|^w)
    distinct shingles vs a fixed 31-word vocabulary), so shingles are
    RARE, the rarest-first prefix filter regains its published bite,
    and true matches contract to genuinely templated documents —
    measured sf0.1 -> sf1 (10x docs) wall ratio 3.7x vs 41x for the
    word-set configuration on the same corpus (SCALE.md). This pair
    of queries is the engine's worked example that for exact
    set-similarity THE TOKENIZATION is the scale decision, not the
    join algorithm.

    Docs shorter than 3 words have no shingle set and
    drop out (both engines derive this from the same construction).
    At 100 TB the string shingle becomes xxhash64(shingle) — 8-byte
    shuffle keys — with everything else unchanged."""
    words = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.filter(
            F.split(normalized_text(), " "), lambda x: x != ""
        ).alias("a"),
    )
    toks = (
        words.filter(F.size("a") >= _SHINGLE_W)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(a) - {_SHINGLE_W}),"
                    " i -> concat_ws(' ', a[i], a[i+1], a[i+2]))"
                )
            ).alias("token"),
        )
        .distinct()
    )
    return _ppjoin_ventiles(toks)
