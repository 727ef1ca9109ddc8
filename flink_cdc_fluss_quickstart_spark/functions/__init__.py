from flink_cdc_fluss_quickstart_spark.functions import text, dedup, similarity

__all__ = ["text", "dedup", "similarity"]
