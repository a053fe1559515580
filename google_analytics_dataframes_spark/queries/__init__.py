"""Query modules — importing this package registers every implemented query
from SURVEY.md §2 into the registry (google_analytics_dataframes_spark.registry).
"""

from google_analytics_dataframes_spark.registry import registry as _registry

# Import order mirrors SURVEY.md §7 build order; each import registers its
# queries as a side effect.
from google_analytics_dataframes_spark.queries import scans  # noqa: F401
from google_analytics_dataframes_spark.queries import filters  # noqa: F401
from google_analytics_dataframes_spark.queries import aggregates  # noqa: F401

for _mod in ("joins", "windows", "sorts", "setops", "scalar_fns", "streaming_batch", "udfs", "llm_ops", "report_queries"):
    try:  # modules land incrementally during the build
        __import__(f"google_analytics_dataframes_spark.queries.{_mod}")
    except ImportError:
        pass


def REGISTRY():
    return _registry()
