from flink_cdc_fluss_quickstart_spark.operators.changelog import (
    latest_by_key,
    apply_changelog,
    changelog_from_events,
)
from flink_cdc_fluss_quickstart_spark.operators.asof import asof_join

__all__ = ["latest_by_key", "apply_changelog", "changelog_from_events", "asof_join"]
