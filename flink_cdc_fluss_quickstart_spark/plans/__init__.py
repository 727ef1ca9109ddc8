"""Query plans: the engine's declared query inventory (SURVEY.md section 2)."""

from flink_cdc_fluss_quickstart_spark.plans.registry import (
    QuerySpec,
    all_queries,
    all_oracle_sql,
    register,
)

# importing the modules registers their queries
from flink_cdc_fluss_quickstart_spark.plans import relational  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import changelog_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import text_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import similarity_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import temporal_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import multimodal_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import betting_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import pipeline_queries  # noqa: E402,F401
from flink_cdc_fluss_quickstart_spark.plans import tpch_more  # noqa: E402,F401

__all__ = ["QuerySpec", "all_queries", "all_oracle_sql", "register"]
