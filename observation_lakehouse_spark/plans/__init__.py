"""Physical-plan utilities: maintenance jobs and plan inspection."""

from observation_lakehouse_spark.plans.maintenance import compact_sort_partitions
from observation_lakehouse_spark.plans.inspect import explain_str, assert_pushed_filters

__all__ = ["compact_sort_partitions", "explain_str", "assert_pushed_filters"]
