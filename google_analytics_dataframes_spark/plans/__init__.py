"""Plan introspection & audit (SURVEY.md §4): machine-checkable assertions
that the physical plans are the ones a 100 TB deployment needs — filters
pushed to parquet, dims broadcast, rank-limits pushed below windows, codegen
spans wide."""

from google_analytics_dataframes_spark.plans.audit import (
    formatted_plan,
    join_algorithms,
    node_names,
    scan_info,
)

__all__ = ["formatted_plan", "join_algorithms", "node_names", "scan_info"]
