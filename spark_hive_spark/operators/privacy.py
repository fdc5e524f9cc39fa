"""Privacy / PII operators — the scrubbing and disclosure-risk audits
a training-data pipeline runs before a corpus ships (complements
operators/curation.py; SURVEY.md §2B north-star surface).

The fixture text is synthetic word-salad with no real PII, so the
redaction query plants deterministic PII first (doc_id-derived emails
and phone numbers, mirrored exactly in the oracle SQL — the same
"synthesize → process → formula-check" recipe as
multimodal_decode_resize): the regex scrub then has real matches to
find, and a broken pattern or replacement changes counts and lengths
the oracle pins.

Scale posture: both queries are scan → map → one narrow aggregate.
Redaction is row-local (regexp_replace/regexp_count push into
whole-stage codegen, no Python); k-anonymity is one hash aggregate on
the quasi-identifier tuple then a scalar reduce — at 100 TB both are
single-shuffle plans with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# Conservative regex subset (identical semantics in Java regex and
# RE2/DuckDB: character classes, bounded repeats, no lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}"


@register(
    "pii_redaction_stats",
    oracle=f"""
        WITH aug AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || doc_id
                                || '@example.com now'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' call 555-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0')
                                || ' today'
                           ELSE '' END AS text
            FROM documents
        ),
        red AS (
            SELECT source, text,
                   len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
                   regexp_replace(
                       regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                       '{PHONE_RE}', '[PHONE]', 'g') AS clean
            FROM aug
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_email,
               CAST(sum(n_emails) AS BIGINT) AS total_emails,
               CAST(sum(n_phones) AS BIGINT) AS total_phones,
               CAST(sum(length(text) - length(clean)) AS BIGINT)
                   AS chars_redacted
        FROM red
        GROUP BY source
        ORDER BY source
    """,
    tags=("privacy", "pii", "regex", "llm-pipeline"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: plant deterministic emails/phones, redact them
    with regexp_replace, report per-source match and shrinkage counts.
    All string work is built-in JVM expressions (regexp_count /
    regexp_replace) — row-local, codegen'd, zero Python — followed by
    one partial-aggregated groupBy; the 100 TB plan is scan → map →
    single shuffle on `source`."""
    docs = t(spark, sf_dir, "documents")
    aug = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" today"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = aug.select(
        "source",
        "text",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ).alias("clean"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_emails") > 0).cast("long")).alias("docs_with_email"),
            F.sum("n_emails").cast("bigint").alias("total_emails"),
            F.sum("n_phones").cast("bigint").alias("total_phones"),
            F.sum(F.length("text") - F.length("clean"))
            .cast("bigint")
            .alias("chars_redacted"),
        )
        .orderBy("source")
    )


K_THRESHOLD = 5


@register(
    "kanonymity_audit",
    oracle=f"""
        WITH g AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS n
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
        )
        SELECT CAST(min(n) AS BIGINT) AS k_anonymity,
               count(*) AS n_groups,
               CAST(sum(CASE WHEN n < {K_THRESHOLD} THEN 1 ELSE 0 END)
                    AS BIGINT) AS groups_below_k,
               CAST(sum(CASE WHEN n < {K_THRESHOLD} THEN n ELSE 0 END)
                    AS BIGINT) AS rows_at_risk,
               round(CAST(sum(CASE WHEN n < {K_THRESHOLD} THEN n ELSE 0 END)
                          AS DOUBLE) / sum(n), 6) AS pct_rows_at_risk
        FROM g
    """,
    tags=("privacy", "k-anonymity", "audit"),
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the (nation, market-segment) quasi-identifier
    tuple: the dataset's k (smallest equivalence class), plus how many
    classes and rows fall below the k={K_THRESHOLD} disclosure
    threshold — the re-identification audit run before releasing or
    training on user-derived tables. One hash aggregate + one scalar
    reduce; the QI tuple is the shuffle key, so skew is bounded by QI
    cardinality, not row count."""
    cust = t(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    risk = F.sum(
        F.when(F.col("n") < K_THRESHOLD, F.col("n")).otherwise(F.lit(0))
    )
    return g.agg(
        F.min("n").cast("bigint").alias("k_anonymity"),
        F.count("*").alias("n_groups"),
        F.sum((F.col("n") < K_THRESHOLD).cast("long")).alias("groups_below_k"),
        risk.cast("bigint").alias("rows_at_risk"),
        F.round(risk.cast("double") / F.sum("n"), 6).alias("pct_rows_at_risk"),
    )


# Pseudonymization "key" — in production this would be a secret; the
# mechanism (keyed modular hash, join-preserving, collision-free on
# the key domain) is what the query attests.
_PSEUDO_A = 2654435761
_PSEUDO_B = 40503
_PSEUDO_P = 2147483647


@register(
    "privacy_pseudonymized_join",
    oracle="""
        SELECT n.n_name,
               CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    tags=("privacy", "pseudonymization", "join-preserving"),
)
def privacy_pseudonymized_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-PRESERVING PSEUDONYMIZATION — the GDPR-era analytics
    pattern: replace the customer identifier with a keyed hash
    BEFORE the data reaches the analyst, on BOTH tables
    independently, and prove the analytical result is unchanged. The
    query computes per-nation customer/order counts entirely over
    pseudonymized ids; the oracle computes them over the raw ids —
    equality attests the mechanism is deterministic, consistent
    across tables, and collision-free on the key domain (any
    collision merges two customers and flips the count hash).

    The pseudonym is an affine modular hash here; swapping in
    HMAC-SHA256(secret, key) changes nothing structural. Scale: the
    mapping is a row-local expression — no lookup table to join,
    which is exactly why keyed hashing beats tokenization vaults for
    100 TB joins."""
    def pseudo(col):
        return (col % _PSEUDO_P) * _PSEUDO_A % _PSEUDO_P + _PSEUDO_B

    cust = t(spark, sf_dir, "customer").select(
        pseudo(F.col("c_custkey")).alias("pid"), "c_nationkey"
    )
    orders = t(spark, sf_dir, "orders").select(
        pseudo(F.col("o_custkey")).alias("o_pid"), "o_orderkey"
    )
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .join(orders, F.col("pid") == F.col("o_pid"), "left")
        .groupBy("n_name")
        .agg(
            F.count_distinct("pid").cast("bigint").alias("n_customers"),
            F.count("o_orderkey").cast("bigint").alias("n_orders"),
        )
        .orderBy("n_name")
    )
