"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference lakehouse stack (Flink CDC -> Fluss -> Paimon).

The reference (`/root/reference`, francocalvo/flink-cdc-fluss-quickstart)
expresses all processing declaratively in Flink SQL over changelog streams and
primary-key (upsert) tables. This engine re-expresses those capabilities
Spark-first:

- batch + streaming DataFrame/SQL plans optimized by Catalyst/AQE,
- changelog/upsert (PK-table) semantics as first-class operators,
- continuous aggregation ("materialized view") via foreachBatch re-aggregation,
- large-scale data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB / 1000-executor scale.
"""

from flink_cdc_fluss_quickstart_spark.session import get_spark
from flink_cdc_fluss_quickstart_spark.tables import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
