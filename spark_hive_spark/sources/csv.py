"""CSV source with the reference's exact option set (S1).

`CollegeScorecard.scala:36-41` reads the scorecard CSV with
header=true (column names from row 1), nullValue="NULL" (the literal
string becomes SQL null — load-bearing for the IS NOT NULL filters at
`:105,145`), inferSchema=true, and transparent gzip decompression;
`SparkEnvironment.scala:58-60` is the same reader as a test helper.

Scale note: inferSchema runs an extra full scan before the real job
(`SURVEY.md §3`, entry point 1). Fine for one-off loads; for repeated
100 TB ingestion pass `schema=` and skip inference — both paths are
exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_csv(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    infer_schema: bool = True,
    null_value: str = "NULL",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a (possibly gzipped) CSV the way the reference does."""
    reader = spark.read.format("csv").option("header", header).option(
        "nullValue", null_value
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.load(path)
