from spark_hive_spark.plans.registry import Query, all_queries, register  # noqa: F401
