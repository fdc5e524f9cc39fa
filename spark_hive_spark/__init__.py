"""spark_hive_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query surface of the reference
``agaur05/spark-hive`` (a Spark SQL + Hive-catalog analytics app; see
SURVEY.md), re-expressed Spark-first and extended with the relational
breadth and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, streaming) a 100 TB training-data
pipeline needs.

Design rules (see SURVEY.md §4, §7):
- DataFrame/SQL only; zero custom Catalyst rules; let AQE plan joins.
- Broadcast small dimensions; shuffle on explicit keys; no collect()
  inside operators.
- Python crosses the boundary only via Arrow (pandas_udf /
  applyInPandas / mapInPandas), never row-at-a-time.
"""

__version__ = "0.1.0"

from spark_hive_spark.session import get_spark  # noqa: F401
from spark_hive_spark.tables import TABLES, load_tables  # noqa: F401
