"""Text-analysis operators over `documents` (SURVEY.md §2B tier 2 /
north star): token counting, quality scoring, language-ID heuristic,
fingerprinting, n-gram profiles.

Everything is built-in string/regex/array functions — JVM codegen, no
Python UDFs: at 100 TB these run as wide map-only stages (token stats,
quality, langid, fingerprint) or one narrow shuffle (per-lang
aggregates, n-gram counts). Regex patterns are chosen to evaluate
identically under Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.operators.dedup import SQL_NORM_TEXT, normalized_text
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# BPE-ish word tokenizer: letter runs, digit runs, or single non-space
# symbols — the standard pre-tokenization shape.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "fr": ["le", "la", "les", "et", "est", "un"],
}


def _stop_pattern(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


@register(
    "text_token_stats",
    oracle=f"""
        WITH per_doc AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all({SQL_NORM_TEXT},
                       '{TOKEN_RE}')) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6)
                   AS avg_tokens_per_doc,
               round(CAST(sum(n_chars_actual) AS DOUBLE)
                     / sum(n_tokens), 6) AS avg_chars_per_token,
               max(n_tokens) AS max_tokens,
               min(n_tokens) AS min_tokens
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("text", "tokenize", "aggregate"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex pre-tokenizer (letter runs /
    digit runs / single symbols), aggregated per language. Ratios are
    integer-sum divisions — deterministic across engines."""
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all(normalized_text(), F.lit(TOKEN_RE), 0))
    per_doc = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 6
            ).alias("avg_tokens_per_doc"),
            F.round(
                F.sum("n_chars_actual").cast("double") / F.sum("n_tokens"), 6
            ).alias("avg_chars_per_token"),
            F.max("n_tokens").alias("max_tokens"),
            F.min("n_tokens").alias("min_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "text_quality_scores",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang, source,
                   length(text) AS n_chars,
                   len(string_split({SQL_NORM_TEXT}, ' ')) AS n_words,
                   len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                   len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to|in)\\b')) AS n_stop
            FROM documents
        )
        SELECT doc_id, lang, source, n_chars, n_words,
               round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
               round(CAST(n_digits AS DOUBLE) / n_chars, 6) AS digit_ratio,
               round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stopword_ratio,
               round(CAST(n_chars AS DOUBLE) / n_words, 6) AS avg_word_len,
               CASE WHEN n_words >= 10 AND n_chars >= 100
                         AND CAST(n_digits AS DOUBLE) / n_chars < 0.3
                    THEN 1 ELSE 0 END AS passes_quality
        FROM feats
        ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, punctuation/digit/
    stopword ratios, mean word length) + a boolean quality gate — the
    classic pre-training corpus filter shape (Gopher/C4-style rules).
    Pure map stage; ratios are int/int divisions (deterministic)."""
    docs = t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_words = F.size(F.split(normalized_text(), " "))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.,;:!?]"), 0))
    n_digits = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]"), 0))
    n_stop = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(_stop_pattern("en")), 0)
    )
    feats = docs.select(
        "doc_id", "lang", "source",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_stop.alias("n_stop"),
    )
    return (
        feats.select(
            "doc_id", "lang", "source", "n_chars", "n_words",
            F.round(F.col("n_punct").cast("double") / F.col("n_chars"), 6).alias(
                "punct_ratio"
            ),
            F.round(F.col("n_digits").cast("double") / F.col("n_chars"), 6).alias(
                "digit_ratio"
            ),
            F.round(F.col("n_stop").cast("double") / F.col("n_words"), 6).alias(
                "stopword_ratio"
            ),
            F.round(F.col("n_chars").cast("double") / F.col("n_words"), 6).alias(
                "avg_word_len"
            ),
            F.when(
                (F.col("n_words") >= 10)
                & (F.col("n_chars") >= 100)
                & (F.col("n_digits").cast("double") / F.col("n_chars") < 0.3),
                1,
            )
            .otherwise(0)
            .alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


_LANGS = ["en", "de", "es", "fr"]


def _sql_lang_scores() -> str:
    return ",\n".join(
        f"len(regexp_extract_all(lower(text), '{_stop_pattern(lg)}'))"
        f" AS s_{lg}"
        for lg in _LANGS
    )


@register(
    "text_langid_confusion",
    oracle=f"""
        WITH scores AS (
            SELECT doc_id, lang AS actual_lang, {_sql_lang_scores()}
            FROM documents
        ),
        pred AS (
            SELECT actual_lang,
                   CASE
                     WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                     WHEN s_es >= s_fr THEN 'es'
                     ELSE 'fr'
                   END AS predicted_lang
            FROM scores
        )
        SELECT actual_lang, predicted_lang, count(*) AS n_docs
        FROM pred
        GROUP BY actual_lang, predicted_lang
        ORDER BY actual_lang, predicted_lang
    """,
    tags=("text", "langid"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID heuristic (per-language function
    word hit counts, argmax with a fixed tie order) and its confusion
    matrix against the labeled `lang`. Map-only + one tiny shuffle.
    (The fixtures' text is synthetic English-vocab for every label, so
    the matrix mostly shows 'en' — the operator, not the accuracy, is
    the deliverable.)"""
    docs = t(spark, sf_dir, "documents")
    scores = docs.select(
        F.col("lang").alias("actual_lang"),
        *[
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_stop_pattern(lg)), 0
                )
            ).alias(f"s_{lg}")
            for lg in _LANGS
        ],
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANGS}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
        .alias("predicted_lang")
    )
    return (
        scores.select("actual_lang", predicted)
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


@register(
    "text_fingerprints",
    oracle=f"""
        SELECT doc_id,
               md5({SQL_NORM_TEXT}) AS fingerprint,
               substring(md5({SQL_NORM_TEXT}), 1, 8) AS fingerprint_prefix
        FROM documents
        WHERE doc_id < 100
        ORDER BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 over normalized text (identical
    bytes → identical fingerprint in any engine). The join/group key
    for corpus-level exact dedup at scale."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fp = F.md5(normalized_text())
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_prefix"),
    ).orderBy("doc_id")


@register(
    "text_top_bigrams_per_lang",
    oracle=f"""
        WITH toks AS (
            SELECT lang, string_split({SQL_NORM_TEXT}, ' ') AS tk
            FROM documents
        ),
        bigrams AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(tk)),
                       i -> tk[i] || ' ' || tk[i+1])) AS bigram
            FROM toks WHERE len(tk) >= 2
        ),
        counts AS (
            SELECT lang, bigram, count(*) AS n
            FROM bigrams GROUP BY lang, bigram
        ),
        ranked AS (
            SELECT lang, bigram, n,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, bigram ASC
                   ) AS rn
            FROM counts
        )
        SELECT lang, bigram, n, rn FROM ranked
        WHERE rn <= 5
        ORDER BY lang, rn
    """,
    tags=("text", "ngram", "topk"),
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram profile: top-5 bigrams per language (explode →
    count → window top-k). The aggregate runs before the window, so
    the window input is |distinct bigrams|, not |tokens|."""
    docs = t(spark, sf_dir, "documents")
    tk = F.split(normalized_text(), " ")
    bigrams = docs.select(
        "lang",
        F.explode(
            F.when(
                F.size(tk) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(tk) - 2),
                    lambda i: F.concat_ws(
                        " ", F.get(tk, i), F.get(tk, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("lang", "rn")
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({SQL_NORM_TEXT}, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                       AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                   ) AS rn
            FROM scored
        )
        SELECT doc_id, term, tfidf, rn
        FROM ranked WHERE rn <= 3 AND doc_id < 50
        ORDER BY doc_id, rn
    """,
    tags=("text", "tfidf", "topk"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed idf (ln((N+1)/(df+1))+1, sklearn-style),
    top-3 terms per document. Pure DataFrame composition — term
    frequencies, document frequencies (one aggregate each, both
    partial-aggregated map-side), a broadcast of the tiny df table,
    and a window top-k. This is the corpus-statistics shape that at
    100 TB runs as two shuffles (doc-term, term) + one broadcast."""
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dimension: bounded, computed once
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 50))
        .orderBy("doc_id", "rn")
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({SQL_NORM_TEXT}, ' ')) AS term
            FROM documents
        ),
        vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
        scored AS (
            SELECT doc_id,
                   CAST(round(ln(cnt / total) * 1000000) AS BIGINT) AS slp
            FROM toks JOIN vocab USING (term) CROSS JOIN tot
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(CAST(sum(slp) AS DOUBLE) / (1000000.0 * count(*)), 6)
                   AS avg_logprob
        FROM scored GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("text", "quality", "language-model"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score (the classic perplexity proxy used in
    data-quality filtering): per-document mean unigram log-probability
    under the corpus's own term distribution. Two aggregates build the
    model (term counts + total), broadcast back onto the token stream
    — at 100 TB the vocabulary is orders of magnitude smaller than the
    corpus, so the model join stays a broadcast and tokens never
    shuffle except for the per-doc reduce.

    Determinism: per-token log-probs are scaled to integer micro-nats
    (round(ln(p)*1e6) as bigint) BEFORE summing, so the per-doc sum is
    exact integer arithmetic — order-independent on any cluster — and
    only one final division/round produces the double."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("total"))
    scored = (
        toks.join(F.broadcast(vocab), "term")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("cnt") / F.col("total")) * F.lit(1000000.0))
            .cast("bigint")
            .alias("slp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("slp").cast("double") / (F.lit(1000000.0) * F.count("*")), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_repetition_filter",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({SQL_NORM_TEXT}, ' ') AS tk
            FROM documents
        ),
        idx AS (
            -- unnest-in-select-list: DuckDB's generate_series TABLE
            -- function can't take lateral column args, the list form
            -- + unnest can
            SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
            FROM toks
            WHERE len(tk) >= 3
        ),
        grams AS (
            SELECT doc_id, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
            FROM idx
        )
        SELECT doc_id,
               count(*) AS n_grams,
               count(DISTINCT g) AS n_distinct_grams,
               1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*)
                   AS dup_gram_ratio,
               (1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*)) <= 0.2
                   AS keep
        FROM grams
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("text", "quality", "repetition", "filter"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style intra-document repetition filter: the fraction
    of duplicated word-3-grams per document (1 - distinct/total), with
    the standard keep/drop verdict at a 0.2 ceiling. Boilerplate and
    looped generations score high; natural prose scores near 0.

    Plan shape: tokenize -> window lead to form running 3-grams (one
    shuffle, partitioned by doc_id) -> per-doc count/count-distinct on
    the SAME partitioning, so the aggregate is exchange-free after the
    window. Map-only relative to corpus size — no cross-doc state, the
    100 TB case is embarrassingly parallel."""
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ).alias("g"),
            F.lead("tok", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("doc_id", "g")
    )
    # NO round on the ratio: it's a single IEEE division of exact
    # integer counts — bit-identical in any engine — whereas round-6
    # can split on exact decimal halves (k/2^n denominators).
    ratio = F.lit(1.0) - F.count_distinct(F.col("g")).cast("double") / F.count("*")
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_distinct(F.col("g")).alias("n_distinct_grams"),
            ratio.alias("dup_gram_ratio"),
            (ratio <= 0.2).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "approx_topk_tokens",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split({SQL_NORM_TEXT}, ' ')) AS token
            FROM documents
        )
        SELECT token, count(*) AS n
        FROM toks
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
    """,
    tags=("text", "sketch", "approx-top-k"),
)
def approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitters via approx_top_k (Spark 4's mergeable
    top-k sketch). k and maxItemsTracked are set far above the fixture
    vocabulary, so the sketch operates below capacity and is EXACT —
    which is what makes the exhaustive group-by a valid oracle here
    (the same pairing the dedup suite uses: approximate operator,
    exact twin as oracle at test scale). Ties are re-sorted
    (count desc, token asc) after exploding the sketch output, so the
    result order never depends on sketch internals.

    Scale posture: the sketch aggregates map-side and merges in one
    reduce — no full token shuffle, the reason to prefer it over
    group-by count at 100 TB when only the head matters."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(normalized_text(), " ")).alias("token")
    ).filter(F.col("token") != "")
    sk = toks.agg(
        F.expr("approx_top_k(token, 1000, 100000)").alias("tk")
    )
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("token"), F.col("e.count").alias("n"))
        .orderBy(F.col("n").desc(), "token")
    )


# Tiny built-in polarity lexicons (lexicon-based sentiment, the
# pre-neural classic — EDBT'16 "Large Scale Sentiment Analysis with
# Spark" is the pattern reference). Deliberately small and embedded:
# the operator's point is the broadcast-lexicon join shape, not
# lexical coverage.
SENTIMENT_POS = (
    "good", "great", "excellent", "best", "love", "happy",
    "wonderful", "positive", "success", "win",
)
SENTIMENT_NEG = (
    "bad", "poor", "terrible", "worst", "hate", "sad",
    "awful", "negative", "failure", "lose",
)


@register(
    "text_sentiment_lexicon",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       x -> length(x) > 0
                   ) AS ws
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   len(ws) AS n_tokens,
                   len(list_filter(ws, x -> list_contains(
                       {list(SENTIMENT_POS)}, x))) AS n_pos,
                   len(list_filter(ws, x -> list_contains(
                       {list(SENTIMENT_NEG)}, x))) AS n_neg
            FROM toks
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_pos) AS BIGINT) AS total_pos,
               CAST(sum(n_neg) AS BIGINT) AS total_neg,
               count(*) FILTER (WHERE n_pos > n_neg) AS n_positive_docs,
               count(*) FILTER (WHERE n_neg > n_pos) AS n_negative_docs
        FROM scored
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("text", "sentiment", "lexicon", "llm-pipeline"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment at corpus scale: tokenize (lowercase,
    alpha runs), count polarity-lexicon hits per document with
    JVM-side higher-order array functions (the lexicons fold into
    the plan as literals — effectively broadcast), classify by
    majority polarity, aggregate per language.

    Scale shape: pure map + one map-side-combinable aggregate; no
    shuffle of document text, no Python. Token membership against a
    bounded lexicon is exactly the shape where arrays_overlap/filter
    literals beat a join — no dim-table exchange at all."""
    pos = F.array(*[F.lit(w) for w in SENTIMENT_POS])
    neg = F.array(*[F.lit(w) for w in SENTIMENT_NEG])
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) > 0
    )
    docs = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.filter(ws, lambda x: F.array_contains(pos, x))).alias("n_pos"),
        F.size(F.filter(ws, lambda x: F.array_contains(neg, x))).alias("n_neg"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pos").alias("total_pos"),
            F.sum("n_neg").alias("total_neg"),
            F.sum((F.col("n_pos") > F.col("n_neg")).cast("long")).alias(
                "n_positive_docs"
            ),
            F.sum((F.col("n_neg") > F.col("n_pos")).cast("long")).alias(
                "n_negative_docs"
            ),
        )
        .orderBy("lang")
    )


MAD_SIGMAS = 3.0  # robust outlier threshold (in MAD units)


@register(
    "text_mad_outliers",
    oracle=f"""
        WITH med AS (
            SELECT source, median(n_chars) AS med_chars
            FROM documents GROUP BY source
        ),
        dev AS (
            SELECT d.source, d.n_chars, m.med_chars,
                   abs(d.n_chars - m.med_chars) AS adev
            FROM documents d JOIN med m USING (source)
        ),
        mad AS (
            SELECT source, median(adev) AS mad_chars
            FROM dev GROUP BY source
        )
        SELECT dev.source,
               count(*) AS n_docs,
               round(max(med_chars), 1) AS med_chars,
               round(max(mad.mad_chars), 1) AS mad_chars,
               CAST(sum(CASE WHEN adev > {MAD_SIGMAS} * mad.mad_chars
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(CAST(sum(CASE WHEN adev > {MAD_SIGMAS} * mad.mad_chars
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS pct_outliers
        FROM dev JOIN mad USING (source)
        GROUP BY dev.source
        ORDER BY dev.source
    """,
    tags=("text", "quality", "robust-stats", "llm-pipeline"),
)
def text_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier detection per source: median + MAD
    (median absolute deviation) instead of mean/stddev, so a handful
    of giant documents can't drag the threshold — the filter quality
    pipelines use to drop truncated or runaway pages before training.

    Shape: two groupBy aggregates over the same shuffle key plus two
    broadcast joins of the tiny per-source stats back onto documents
    (source cardinality ~20; the per-doc table never re-shuffles).
    Both engines interpolate the continuous median, and n_chars is
    integral, so med/MAD are exactly representable .0/.5 values —
    hash-stable without rounding tricks (displayed at 1dp)."""
    docs = t(spark, sf_dir, "documents").select("source", "n_chars")
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med_chars")
    )
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med_chars"))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_chars")
    )
    out = dev.join(F.broadcast(mad), "source")
    is_out = (F.col("adev") > MAD_SIGMAS * F.col("mad_chars")).cast("long")
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.max("med_chars"), 1).alias("med_chars"),
            F.round(F.max("mad_chars"), 1).alias("mad_chars"),
            F.sum(is_out).alias("n_outliers"),
            F.round(F.sum(is_out).cast("double") / F.count("*"), 6).alias(
                "pct_outliers"
            ),
        )
        .orderBy("source")
    )


# Hashed linear quality classifier: a fasttext-shaped scorer with a
# 64-bin hashed vocabulary and deterministic pseudo-weights, built
# entirely from engine-portable integer arithmetic so the oracle can
# recompute it. The token hash mixes length and boundary characters
# (cheap, codegen-friendly); the weight table is a multiplicative
# scramble of the bin index into [-1, 1] in steps of 1/500.
_CLS_BINS = 64
_CLS_MIX = 2654435761  # Knuth multiplicative constant


@register(
    "quality_hashed_linear_classifier",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split({SQL_NORM_TEXT}, ' ')) AS tok
            FROM documents
        ),
        feats AS (
            SELECT doc_id, source,
                   ((length(tok) * 31 + ascii(left(tok, 1)) * 7
                     + ascii(right(tok, 1))) % {_CLS_BINS} * {_CLS_MIX})
                   % 1001 AS w1001
            FROM toks WHERE tok <> ''
        ),
        scored AS (
            SELECT doc_id, source,
                   count(*) AS n_tok,
                   sum(w1001) AS sw
            FROM feats GROUP BY doc_id, source
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN sw > 500 * n_tok THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_positive,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               (sum(sw) - 500.0 * sum(n_tok)) / (500.0 * sum(n_tok))
                   AS micro_score
        FROM scored
        GROUP BY source
        ORDER BY source
    """,
    tags=("llm-pipeline", "quality", "classifier", "hashing-trick"),
)
def quality_hashed_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier — the shape of a
    fasttext-style corpus filter, with deterministic stand-in weights
    so the whole model is auditable cross-engine: each token hashes
    into one of 64 bins (length/boundary-char mix, pure codegen
    arithmetic — no Python), each bin carries a fixed pseudo-weight
    in [-1, 1], and a document's score is its mean token weight. The
    class decision (score > 0) compares EXACT integers
    (sum(w1001) vs 500·n), so classification counts are
    float-noise-free; only the reported mean score is a rounded
    double.

    Scale: one narrow scan → explode → two hash aggregates; weights
    live in the expression (no join, no broadcast, no UDF). Swapping
    the stand-in weight formula for a learned 2^20-bin table turns
    this into a real fasttext scorer with a broadcast weight join —
    same plan shape."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(normalized_text(), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    w1001 = (
        (
            F.length("tok") * 31
            + F.ascii(F.substring("tok", 1, 1)) * 7
            + F.ascii(F.substring("tok", -1, 1))
        )
        % _CLS_BINS
        * F.lit(_CLS_MIX)
    ) % 1001
    scored = (
        toks.select("doc_id", "source", w1001.alias("w1001"))
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_tok"), F.sum("w1001").alias("sw"))
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("sw") > 500 * F.col("n_tok")).cast("long")
            ).alias("n_positive"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("sw").alias("_sw"),
        )
        .select(
            "source",
            "n_docs",
            "n_positive",
            "total_tokens",
            # micro average: ONE division of exact integer sums — a
            # deterministic double in both engines, no rounding needed
            # (the per-doc macro mean would sum rationals in engine-
            # dependent order; see test_no_round_over_rational_avg)
            (
                (F.col("_sw") - 500.0 * F.col("total_tokens"))
                / (500.0 * F.col("total_tokens"))
            ).alias("micro_score"),
        )
        .orderBy("source")
    )


@register(
    "text_bigram_backoff_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, i AS pos, tk[i] AS term,
                   CASE WHEN i > 1 THEN tk[i - 1] END AS prev
            FROM (
                SELECT doc_id, source,
                       string_split({SQL_NORM_TEXT}, ' ') AS tk
                FROM documents
            ), unnest(range(1, len(tk) + 1)) AS r(i)
        ),
        uni AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
        big AS (
            SELECT prev, term, count(*) AS bc
            FROM toks WHERE prev IS NOT NULL GROUP BY prev, term
        ),
        scored AS (
            SELECT t.doc_id, t.source,
                   CAST(round(ln(
                       CASE WHEN t.prev IS NULL
                            THEN u.cnt / total
                            ELSE 0.7 * b.bc / pu.cnt + 0.3 * u.cnt / total
                       END) * 1000000) AS BIGINT) AS slp
            FROM toks t
            JOIN uni u ON t.term = u.term
            LEFT JOIN uni pu ON t.prev = pu.term
            LEFT JOIN big b ON t.prev = b.prev AND t.term = b.term
            CROSS JOIN tot
        )
        SELECT source,
               count(*) AS n_tokens,
               round(CAST(sum(slp) AS DOUBLE) / (1000000.0 * count(*)), 6)
                   AS avg_logprob
        FROM scored
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "quality", "language-model", "bigram"),
)
def text_bigram_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring — one rung up the
    LM-filter ladder from `text_unigram_logprob`: p(w|prev) = 0.7 ·
    c(prev,w)/c(prev) + 0.3 · c(w)/N, document-initial tokens scored
    by the unigram term. Every observed bigram has a nonzero
    interpolated probability (the unigram floor), so no smoothing
    epsilon is needed. Per-token log-probs scale to integer
    micro-nats before summing (order-independent exact sums, same
    trick as the unigram scorer); one final division per source.

    Scale: the model is two aggregates (unigram + bigram counts); the
    bigram table is the big one — broadcast here, but at 100 TB it
    shuffle-joins on the (prev, term) key, which the token stream
    already carries. Everything else is the unigram plan."""
    from pyspark.sql import Window as W

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "term"),
    ).withColumn(
        "prev",
        F.lag("term").over(W.partitionBy("doc_id").orderBy("pos")),
    )
    uni = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = uni.agg(F.sum("cnt").cast("bigint").alias("total"))
    big = (
        toks.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count("*").alias("bc"))
    )
    pu = uni.select(F.col("term").alias("prev"), F.col("cnt").alias("pcnt"))
    p = F.when(
        F.col("prev").isNull(), F.col("cnt") / F.col("total")
    ).otherwise(
        0.7 * F.col("bc") / F.col("pcnt") + 0.3 * F.col("cnt") / F.col("total")
    )
    scored = (
        toks.join(F.broadcast(uni), "term")
        .join(F.broadcast(pu), "prev", "left")
        .join(F.broadcast(big), ["prev", "term"], "left")
        .join(F.broadcast(total))
        .select(
            "source",
            F.round(F.log(p) * 1000000).cast("bigint").alias("slp"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("slp").cast("double") / (1000000.0 * F.count("*")), 6
            ).alias("avg_logprob"),
        )
        .orderBy("source")
    )


VOCAB_SIZE = 1000  # top-K corpus tokens form the "tokenizer" vocab


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(string_split({SQL_NORM_TEXT}, ' ')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
            GROUP BY tok
        ),
        vocab AS (
            SELECT tok FROM counts
            ORDER BY n DESC, tok
            LIMIT {VOCAB_SIZE}
        )
        SELECT t.source,
               count(*) AS total_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS oov_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        WHERE t.tok <> ''
        GROUP BY t.source
        ORDER BY t.source
    """,
    tags=("llm-pipeline", "tokenizer", "vocab", "oov"),
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit metric: out-of-vocabulary rate per source against
    a fixed vocabulary — here the corpus's own top-{VOCAB_SIZE} tokens
    with a total-order tie-break (count desc, token asc), standing in
    for a trained tokenizer's vocab file. High OOV on a source means
    the tokenizer fragments its text into long byte-fallback
    sequences — THE practical signal for when a tokenizer needs
    retraining before a data mixture changes.

    Plan: token counts (one shuffle) → TakeOrdered vocab → broadcast
    LEFT join back onto the token stream → per-source aggregate; the
    vocab is a k-row broadcast at any corpus size, and the OOV rate
    is one division of exact counts."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(normalized_text(), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(VOCAB_SIZE)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long")).alias(
                "oov_tokens"
            ),
            (
                F.sum(F.col("in_vocab").isNull().cast("long")).cast("double")
                / F.count("*")
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


@register(
    "bpe_pair_merge_stats",
    oracle=f"""
        WITH vocab AS (
            SELECT tok AS word, count(*) AS freq
            FROM (
                SELECT unnest(string_split({SQL_NORM_TEXT}, ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
            GROUP BY tok
        ),
        pairs AS (
            SELECT substr(word, CAST(i AS INT), 2) AS pair,
                   word, freq
            FROM vocab, unnest(range(1, length(word))) AS u(i)
            WHERE length(word) >= 2
        ),
        weighted AS (
            SELECT pair,
                   CAST(sum(freq) AS BIGINT) AS weight,
                   CAST(count(DISTINCT word) AS BIGINT) AS n_words
            FROM pairs GROUP BY pair
        )
        SELECT pair, weight, n_words
        FROM weighted
        ORDER BY weight DESC, pair
        LIMIT 20
    """,
    tags=("text", "bpe", "tokenizer", "llm-pipeline"),
)
def bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE tokenizer training: corpus-weighted
    adjacent character-pair frequencies over the word vocabulary —
    the statistic whose argmax IS the first merge rule, and whose
    top-k preview is what a tokenizer-training pipeline materializes
    each iteration. Pairs are substrings (substr(word, i, 2)) from a
    position explode — no array lambdas, fully codegen'd — weighted
    by the word's corpus frequency; the total order (weight desc,
    pair asc) makes the merge choice deterministic.

    Scale: the corpus collapses to its VOCABULARY first (one token
    aggregate — Zipf makes |vocab| << corpus), pairs explode off the
    bounded vocab, and the weighted count is map-side combinable;
    TakeOrdered fuses the top-20. Each later BPE iteration would
    re-tokenize against the accumulated merges and repeat this exact
    dataflow."""
    docs = t(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(normalized_text(), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = (
        vocab.filter(F.length("word") >= 2)
        .select(
            "word",
            "freq",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
        )
        .select(
            F.expr("substring(word, i, 2)").alias("pair"), "word", "freq"
        )
    )
    weighted = pairs.groupBy("pair").agg(
        F.sum("freq").cast("bigint").alias("weight"),
        F.count_distinct("word").cast("bigint").alias("n_words"),
    )
    return (
        weighted.select("pair", "weight", "n_words")
        .orderBy(F.desc("weight"), "pair")
        .limit(20)
    )


@register(
    "dedup_effective_token_count",
    oracle=f"""
        WITH normed AS (
            SELECT doc_id, lang,
                   md5({SQL_NORM_TEXT}) AS text_hash,
                   len(string_split({SQL_NORM_TEXT}, ' ')) AS n_tokens
            FROM documents
        ),
        reps AS (
            SELECT text_hash, min(doc_id) AS keep_id
            FROM normed GROUP BY text_hash
        )
        SELECT n.lang,
               count(*) AS n_docs,
               CAST(count(r.keep_id) AS BIGINT) AS n_unique_docs,
               CAST(sum(n.n_tokens) AS BIGINT) AS raw_tokens,
               CAST(sum(CASE WHEN r.keep_id IS NOT NULL
                        THEN n.n_tokens END) AS BIGINT) AS unique_tokens,
               1.0 - CAST(sum(CASE WHEN r.keep_id IS NOT NULL
                              THEN n.n_tokens END) AS DOUBLE)
                   / sum(n.n_tokens) AS dedup_savings
        FROM normed n
        LEFT JOIN reps r
          ON n.text_hash = r.text_hash AND n.doc_id = r.keep_id
        GROUP BY n.lang
        ORDER BY n.lang
    """,
    tags=("text", "dedup", "tokens", "llm-pipeline"),
)
def dedup_effective_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budgeting number every pretraining-data plan starts from:
    per language, RAW token count vs the EFFECTIVE token count after
    exact dedup (count each duplicate group's representative once),
    and the savings ratio. Composes the exact-dedup keep-rule
    (min doc_id per normalized-text hash) with token accounting in
    one dataflow; all counts are exact integers, the ratio one
    division.

    Scale: tokens count per row (codegen'd split+size, no explode);
    the dedup rides the 16-byte hash exactly like
    `dedup_exact_normalized`; the representative check is an
    equi-join on (hash, doc_id) against the per-group min — narrow
    keys end to end, one aggregate per side."""
    docs = t(spark, sf_dir, "documents")
    normed = docs.select(
        "doc_id",
        "lang",
        F.md5(normalized_text()).alias("text_hash"),
        F.size(F.split(normalized_text(), " ")).alias("n_tokens"),
    )
    reps = normed.groupBy("text_hash").agg(F.min("doc_id").alias("keep_id"))
    joined = normed.join(
        reps,
        (normed.text_hash == reps.text_hash)
        & (normed.doc_id == reps.keep_id),
        "left",
    )
    uniq_tokens = F.sum(
        F.when(F.col("keep_id").isNotNull(), F.col("n_tokens"))
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("keep_id").cast("bigint").alias("n_unique_docs"),
            F.sum("n_tokens").cast("bigint").alias("raw_tokens"),
            uniq_tokens.cast("bigint").alias("unique_tokens"),
            (
                F.lit(1.0)
                - uniq_tokens.cast("double") / F.sum("n_tokens")
            ).alias("dedup_savings"),
        )
        .orderBy("lang")
    )


@register(
    "text_zipf_fit",
    oracle=f"""
        WITH counts AS (
            SELECT tok, count(*) AS freq
            FROM (
                SELECT unnest(string_split({SQL_NORM_TEXT}, ' ')) AS tok
                FROM documents
            )
            WHERE tok <> ''
            GROUP BY tok
        ),
        ranked AS (
            SELECT freq,
                   row_number() OVER (ORDER BY freq DESC, tok) AS rnk
            FROM counts
        )
        SELECT CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(freq) AS BIGINT) AS total_tokens,
               round(regr_slope(ln(CAST(freq AS DOUBLE)),
                                ln(CAST(rnk AS DOUBLE))), 6)
                   AS zipf_slope,
               round(regr_r2(ln(CAST(freq AS DOUBLE)),
                             ln(CAST(rnk AS DOUBLE))), 6) AS zipf_r2
        FROM ranked
    """,
    tags=("text", "zipf", "statistics", "llm-pipeline"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: regress
    ln(frequency) on ln(rank) over the ranked vocabulary — natural
    text sits near slope −1, and a corpus that drifts far from it
    (template spam: flat; boilerplate dedup failure: steep) fails
    the smell test. Reports vocabulary size, token count, the fitted
    slope, and R².

    Scale: the corpus collapses to its vocabulary (one token
    aggregate), the rank window runs over the vocabulary ordered by
    (freq desc, token) — a total order, so ranks are deterministic —
    and the regression is a single-pass partial-aggregable regr_*
    over the vocab rows. At web scale you'd rank only the head (the
    fit is head-dominated) to keep the window partitioned; here the
    64-word fixture vocab makes that moot."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    counts = (
        docs.select(
            F.explode(F.split(normalized_text(), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    ranked = counts.select(
        "freq",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("freq"), "tok"))
        .alias("rnk"),
    )
    lf = F.log(F.col("freq").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("zipf_r2"),
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   (doc_id * 2654435761) % 4294967296 % 2 = 0 AS is_ref,
                   string_split({SQL_NORM_TEXT}, ' ') AS tk
            FROM documents
        ),
        grams AS (
            SELECT doc_id, is_ref,
                   tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                       || tk[i+3] AS g
            FROM toks, unnest(range(1, len(tk) - 2)) AS u(i)
            WHERE len(tk) >= 4
        ),
        ref AS (SELECT DISTINCT g FROM grams WHERE is_ref),
        new_grams AS (
            SELECT g.g, ref.g IS NOT NULL AS seen
            FROM grams g LEFT JOIN ref ON g.g = ref.g
            WHERE NOT g.is_ref
        )
        SELECT CAST(count(*) AS BIGINT) AS new_grams_total,
               CAST(count(CASE WHEN NOT seen THEN 1 END) AS BIGINT)
                   AS novel_grams,
               CAST(count(CASE WHEN NOT seen THEN 1 END) AS DOUBLE)
                   / count(*) AS novelty_rate,
               CAST((SELECT count(*) FROM ref) AS BIGINT) AS ref_vocab
        FROM new_grams
    """,
    tags=("text", "ngram", "novelty", "contamination", "llm-pipeline"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-4-gram NOVELTY of a held-out half against a reference
    half (hash-split, pure function of doc_id) — the memorization /
    freshness measurement run before adding a new crawl to a
    training mix: a low novelty rate means the candidate data mostly
    repeats what the reference corpus already contains. Token-level
    occurrences (not distinct) are scored on the held-out side, so
    heavily duplicated boilerplate drags the rate down exactly as it
    would dilute training.

    Scale: the reference side collapses to its DISTINCT 4-gram
    vocabulary before the membership join (Zipf: |vocab| << corpus),
    and the join keys on the gram string — at 100 TB you'd hash the
    grams to int64 first (`dedup` module pattern) and bloom-prefilter
    the probe; the declarative shape is the same."""
    docs = t(spark, sf_dir, "documents")
    is_ref = (
        F.pmod(
            F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)),
            F.lit(2),
        )
        == 0
    )
    toks = docs.select(
        "doc_id",
        is_ref.alias("is_ref"),
        F.split(normalized_text(), " ").alias("tk"),
    ).filter(F.size("tk") >= 4)
    grams = toks.select(
        "is_ref",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 4),"
                " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3]))"
            )
        ).alias("g"),
    )
    ref = grams.filter(F.col("is_ref")).select("g").distinct()
    ref_n = ref.agg(F.count("*").alias("ref_vocab"))
    probe = (
        grams.filter(~F.col("is_ref"))
        .join(
            ref.withColumnRenamed("g", "rg"),
            F.col("g") == F.col("rg"),
            "left",
        )
        .agg(
            F.count("*").cast("bigint").alias("new_grams_total"),
            F.count(F.when(F.col("rg").isNull(), 1))
            .cast("bigint")
            .alias("novel_grams"),
            (
                F.count(F.when(F.col("rg").isNull(), 1)).cast("double")
                / F.count("*")
            ).alias("novelty_rate"),
        )
    )
    return probe.crossJoin(F.broadcast(ref_n)).select(
        "new_grams_total",
        "novel_grams",
        "novelty_rate",
        F.col("ref_vocab").cast("bigint").alias("ref_vocab"),
    )


PMI_MIN_COUNT = 20
PMI_TOP = 25

_PMI_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split({SQL_NORM_TEXT}, ' ') AS tk
        FROM documents
    ),
    uni AS (
        SELECT unnest(tk) AS w FROM toks
    ),
    unic AS (
        SELECT w, count(*) AS c FROM uni WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT sum(c) AS n FROM unic),
    big AS (
        SELECT unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1])) AS bg
        FROM toks WHERE len(tk) >= 2
    ),
    bigc AS (
        SELECT string_split(bg, ' ')[1] AS w1,
               string_split(bg, ' ')[2] AS w2,
               count(*) AS cab
        FROM big
        WHERE string_split(bg, ' ')[1] <> '' AND string_split(bg, ' ')[2] <> ''
        GROUP BY w1, w2
        HAVING count(*) >= {PMI_MIN_COUNT}
    ),
    m AS (SELECT sum(cab) AS mm FROM (
        SELECT count(*) AS cab FROM big
        WHERE string_split(bg, ' ')[1] <> '' AND string_split(bg, ' ')[2] <> ''
        GROUP BY bg
    ))
    SELECT b.w1, b.w2,
           CAST(b.cab AS BIGINT) AS n_pair,
           round(ln((CAST(b.cab AS DOUBLE) / mm)
                    / ((CAST(ua.c AS DOUBLE) / n)
                       * (CAST(ub.c AS DOUBLE) / n))), 4) AS pmi
    FROM bigc b
    JOIN unic ua ON ua.w = b.w1
    JOIN unic ub ON ub.w = b.w2, tot, m
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT {PMI_TOP}
"""


@register(
    "text_pmi_collocations",
    oracle=_PMI_ORACLE,
    tags=("text", "pmi", "collocations"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINTWISE MUTUAL INFORMATION collocations — the classic
    distributional-semantics statistic: for adjacent word pairs with
    count >= 20, PMI = ln( p(ab) / (p(a)·p(b)) ) from corpus bigram
    and unigram frequencies; top-25 by (rounded PMI, pair) total
    order. All probabilities are ratios of exact integer counts, so
    the single ln runs on identical doubles in both engines.

    Scale: bigrams generate via posexplode + lead over the per-doc
    position window (codegen'd, the engine's standard n-gram path),
    then everything is two map-side-combinable counts and a
    broadcast-scalar normalization — no joins against fact-sized
    relations."""
    from pyspark.sql import Window as W

    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "w"),
    )
    dw = W.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("w2", F.lead("w").over(dw))
        .filter((F.col("w") != "") & F.col("w2").isNotNull() & (F.col("w2") != ""))
        .select(F.col("w").alias("w1"), "w2")
    )
    # contract to vocab- and bigram-cardinality ONCE (the corpus
    # otherwise re-tokenizes per consumer — measured 5 logical
    # scans): unigram counts feed 3 consumers, bigram counts feed
    # the normalizer m AND the filtered collocation set.
    unic = (
        toks.filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = unic.agg(F.sum("c").alias("n"))
    bigc_all = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cab"))
        .localCheckpoint(eager=True)
    )
    m = bigc_all.agg(F.sum("cab").alias("mm"))
    bigc = bigc_all.filter(F.col("cab") >= PMI_MIN_COUNT)
    ua = unic.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    ub = unic.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    return (
        bigc.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
        .select(
            "w1",
            "w2",
            F.col("cab").cast("bigint").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("cab").cast("double") / F.col("mm"))
                    / (
                        (F.col("ca").cast("double") / F.col("n"))
                        * (F.col("cb").cast("double") / F.col("n"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP)
    )


HEAPS_GRID = 12  # vocab checkpoints at n = k/12 of the token stream

_HEAPS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split({SQL_NORM_TEXT}, ' ')) AS w,
               generate_subscripts(string_split({SQL_NORM_TEXT}, ' '), 1)
                   AS pos
        FROM documents
    ),
    seq AS (
        SELECT w, row_number() OVER (ORDER BY doc_id, pos) AS i
        FROM toks WHERE w <> ''
    ),
    first_seen AS (SELECT w, min(i) AS fs FROM seq GROUP BY w),
    n_tot AS (SELECT count(*) AS n FROM seq),
    grid AS (
        SELECT k,
               greatest(1, (SELECT n FROM n_tot)
                           // CAST(pow(2, {HEAPS_GRID} - k) AS BIGINT)) AS cut
        FROM (SELECT unnest(range(1, {HEAPS_GRID} + 1)) AS k)
    ),
    pts AS (
        SELECT g.k, g.cut,
               (SELECT count(*) FROM first_seen f WHERE f.fs <= g.cut)
                   AS vocab
        FROM grid g
    ),
    fit AS (
        SELECT count(*) AS m,
               sum(ln(CAST(cut AS DOUBLE))) AS sx,
               sum(ln(CAST(vocab AS DOUBLE))) AS sy,
               sum(ln(CAST(cut AS DOUBLE)) * ln(CAST(vocab AS DOUBLE)))
                   AS sxy,
               sum(ln(CAST(cut AS DOUBLE)) * ln(CAST(cut AS DOUBLE))) AS sxx
        FROM pts
    )
    SELECT CAST(p.k AS BIGINT) AS checkpoint,
           CAST(p.cut AS BIGINT) AS n_tokens,
           CAST(p.vocab AS BIGINT) AS vocab,
           round((f.sxy - f.sx * f.sy / f.m)
                 / (f.sxx - f.sx * f.sx / f.m) + 0.0, 4) AS heaps_beta
    FROM pts p, fit f
    ORDER BY checkpoint
"""


@register(
    "text_heaps_law_fit",
    oracle=_HEAPS_ORACLE,
    tags=("text", "heaps-law", "vocabulary"),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS' LAW FIT — vocabulary growth V(n) ≈ K·n^β measured at 12
    GEOMETRIC checkpoints (n/2^11 … n) along the corpus token stream
    — the early doublings are where a templated corpus still grows
    vocabulary; a linear grid saturates to a zero slope (companion to the
    engine's Zipf fit): each token's FIRST-SEEN position (the
    running-distinct rewrite — min over a global sequence index, no
    per-row distinct scan), vocabulary size at each cut by a simple
    first_seen <= cut count, and β by log-log OLS over the
    checkpoints. Counts are exact integers; the ln/OLS arithmetic is
    identical in both engines at 4dp.

    Scale: the global sequence index is the documented two-phase
    range-partition rank; first-seen contracts the stream to
    vocab cardinality before anything else happens."""
    from pyspark.sql import Window as W

    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(normalized_text(), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    seq = toks.withColumn(
        "i", F.row_number().over(W.orderBy("doc_id", "pos"))
    )
    first_seen = seq.groupBy("w").agg(F.min("i").alias("fs")).localCheckpoint(
        eager=True
    )  # vocab-cardinality; grid consumers
    n_tot = seq.agg(F.count("*").alias("n"))
    grid = (
        spark.range(1, HEAPS_GRID + 1)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "k",
            F.greatest(
                F.lit(1),
                F.expr(
                    f"n DIV CAST(pow(2, {HEAPS_GRID} - k) AS BIGINT)"
                ),
            ).alias("cut"),
        )
    )
    pts = (
        first_seen.crossJoin(F.broadcast(grid))
        .filter(F.col("fs") <= F.col("cut"))
        .groupBy("k", "cut")
        .agg(F.count("*").alias("vocab"))
        .localCheckpoint(eager=True)  # 12 rows; fit + output
    )
    lx = F.log(F.col("cut").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    m = F.count("*")
    fit = pts.agg(
        m.alias("m"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").cast("bigint").alias("checkpoint"),
            F.col("cut").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            F.round(
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m"))
                / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m"))
                + 0.0,
                4,
            ).alias("heaps_beta"),
        )
        .orderBy("checkpoint")
    )


_TTR_ORACLE = f"""
    WITH per_doc AS (
        SELECT doc_id, lang,
               len(string_split({SQL_NORM_TEXT}, ' ')) AS n_tok,
               len(list_distinct(string_split({SQL_NORM_TEXT}, ' ')))
                   AS n_types
        FROM documents
    ),
    banded AS (
        SELECT lang,
               CASE WHEN n_tok < 50 THEN 'short'
                    WHEN n_tok < 200 THEN 'medium'
                    ELSE 'long' END AS band,
               n_tok, n_types
        FROM per_doc WHERE n_tok > 0
    )
    SELECT lang, band,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(n_types) AS DOUBLE) / sum(n_tok), 6)
               AS pooled_ttr,
           CAST(min(n_types) AS BIGINT) AS min_types,
           CAST(max(n_tok) AS BIGINT) AS max_tokens
    FROM banded
    GROUP BY lang, band
    ORDER BY lang, band
"""


@register(
    "text_lexical_diversity_ttr",
    oracle=_TTR_ORACLE,
    tags=("text", "lexical-diversity", "ttr"),
)
def text_lexical_diversity_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEXICAL DIVERSITY — pooled type-token ratio per (language,
    length band): the corpus-curation filter that catches keyword
    stuffing and boilerplate (low TTR) without an LM. Pooled
    Σtypes/Σtokens rather than mean-of-ratios, so the statistic is a
    ratio of exact integers (length-band pooling also blunts TTR's
    well-known length bias). Pure map + grouped aggregate — the
    engine's standard corpus-scan shape."""
    per_doc = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.split(normalized_text(), " ")).alias("n_tok"),
        F.size(F.array_distinct(F.split(normalized_text(), " "))).alias(
            "n_types"
        ),
    )
    band = (
        F.when(F.col("n_tok") < 50, "short")
        .when(F.col("n_tok") < 200, "medium")
        .otherwise("long")
    )
    return (
        per_doc.filter(F.col("n_tok") > 0)
        .groupBy("lang", band.alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("n_types").cast("double") / F.sum("n_tok"), 6
            ).alias("pooled_ttr"),
            F.min("n_types").cast("bigint").alias("min_types"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
        )
        .orderBy("lang", "band")
    )


# ---- BPE tokenizer APPLICATION (round 10) ---------------------------
# Applying a SHIPPED merge table is the 100 TB tokenizer operation
# (training is one-time; encoding runs over every document). The
# GPT-2-reference merge step — for each merge in rank order, fuse all
# leftmost non-overlapping occurrences of the pair — is expressed with
# plain string built-ins on a wrapped representation: each token
# rendered as |tok|, so the pair (a, b) is the literal substring
# "|a||b|" and one replace() call IS the merge (the wrapping makes a
# token-boundary-safe pattern: "|a|" cannot match inside "|xa|").
# No UDF anywhere: the whole encode is a codegen'd replace chain.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("t", "i"), ("an", "d"), ("in", "g"), ("e", "s"), ("o", "u"),
    ("a", "l"),
)


def bpe_encode_col(word) -> "Column":
    """Spark Column: BPE-encode an [a-z]+ word with `BPE_MERGES`,
    returning the wrapped token string (each token as ``|tok|``)."""
    s = F.regexp_replace(word, "(.)", r"|$1|")
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return s


def bpe_encode_sql(expr: str) -> str:
    """The identical replace chain as DuckDB SQL over ``expr``."""
    s = f"regexp_replace({expr}, '(.)', '|\\1|', 'g')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '|{a}||{b}|', '|{a}{b}|')"
    return s


@register(
    "text_bpe_tokenize",
    oracle=f"""
        WITH words AS (
            SELECT source,
                   unnest(regexp_extract_all({SQL_NORM_TEXT}, '[a-z]+'))
                       AS w
            FROM documents
        ),
        enc AS (
            SELECT source, w,
                   (length(s) - length(replace(s, '|', ''))) // 2
                       AS n_tok
            FROM (SELECT source, w, {bpe_encode_sql('w')} AS s
                  FROM words)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(length(w)) AS BIGINT) AS n_chars,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN n_tok = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS whole_word_tokens,
               round(CAST(sum(length(w)) AS DOUBLE) / sum(n_tok), 6)
                   AS chars_per_token
        FROM enc
        GROUP BY source
        ORDER BY source
    """,
    tags=("text", "bpe", "tokenizer", "llm-pipeline"),
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION (round 10) — encode every corpus
    word against a pinned 16-rule merge table with the GPT-2
    reference semantics (merges applied in rank order, each fusing
    all leftmost non-overlapping occurrences of its pair), and roll
    up the statistics a data pipeline budgets with: token counts,
    whole-word-token counts (fully merged words), and the
    chars-per-token compression ratio.

    The encode is pure string built-ins — each word is wrapped so
    every token prints as ``|tok|``, making the merge (a, b) the
    literal substring ``|a||b|`` and one ``replace()`` call per rank
    the exact merge step (wrapping is what makes the pattern
    token-boundary-safe). The DuckDB oracle runs the IDENTICAL
    replace chain, so the value hash pins the tokenizer semantics,
    not just the totals.

    Scale posture: zero UDFs — the whole encode chain is
    whole-stage-codegen'd string ops on the exploded words; the
    per-source rollup is a map-side-combinable sum. At 100 TB the
    replace chain grows with the merge-table size; a production
    50k-rule table would move to a trie-based Pandas UDF, but the
    per-rank replace IS the reference semantics this query pins."""
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(
            F.expr(
                "regexp_extract_all(regexp_replace(lower(trim(text)),"
                " '\\\\s+', ' '), '[a-z]+', 0)"
            )
        ).alias("w"),
    )
    enc = words.select(
        "source",
        "w",
        (
            (
                F.length(bpe_encode_col(F.col("w")))
                - F.length(F.replace(bpe_encode_col(F.col("w")), F.lit("|")))
            )
            / 2
        )
        .cast("long")
        .alias("n_tok"),
    )
    return (
        enc.groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum((F.col("n_tok") == 1).cast("long")).alias(
                "whole_word_tokens"
            ),
            F.round(
                F.sum(F.length("w")).cast("double") / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )
