"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in `flink_cdc_fluss_quickstart_spark.plans`
(one QuerySpec per implemented operator from SURVEY.md section 2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.plans import all_oracle_sql, all_queries
from flink_cdc_fluss_quickstart_spark.plans.registry import get


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference revenue-analytics.sql semantics) on sf0.001."""
    return get("revenue_analytics").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
