"""Query modules — importing this package registers every implemented query
from SURVEY.md §2 into the registry (google_analytics_dataframes_spark.registry).

Imports are DELIBERATELY unguarded: a broken query module must fail loudly at
import time, not silently drop its whole family from the registry (the driver
would then report those queries as unimplemented instead of surfacing the real
error).
"""

# Import order mirrors SURVEY.md §7 build order; each import registers its
# queries as a side effect.
from google_analytics_dataframes_spark.queries import scans  # noqa: F401
from google_analytics_dataframes_spark.queries import filters  # noqa: F401
from google_analytics_dataframes_spark.queries import aggregates  # noqa: F401
from google_analytics_dataframes_spark.queries import joins  # noqa: F401
from google_analytics_dataframes_spark.queries import windows  # noqa: F401
from google_analytics_dataframes_spark.queries import sorts  # noqa: F401
from google_analytics_dataframes_spark.queries import setops  # noqa: F401
from google_analytics_dataframes_spark.queries import scalar_fns  # noqa: F401
from google_analytics_dataframes_spark.queries import streaming_batch  # noqa: F401
from google_analytics_dataframes_spark.queries import udfs  # noqa: F401
from google_analytics_dataframes_spark.queries import llm_ops  # noqa: F401
from google_analytics_dataframes_spark.queries import corpus_ops  # noqa: F401
from google_analytics_dataframes_spark.queries import report_queries  # noqa: F401

from google_analytics_dataframes_spark.registry import registry as _registry

# Sweep priority (consumed ONLY by registry.sweep_registry(), which only
# __spark_entry__.py uses — bench/tests/docs iterate the canonical
# registration order).  The external correctness sweep walks the dict in
# order and truncates on a ~50-entry budget (rounds 1 and 2 each recorded
# exactly 50 rows), so this list decides which queries get driver evidence.
#
# Round-4 rotation (VERDICT r3 item #1 + #2): the 24 queries with NO driver
# row after three rounds go first — rb12–rb19, u6/u7, j14, st13, l38–l49 —
# all already local-pass under tools/check.py, so this rotation alone should
# take the registry to 172/172 driver-checked.  New round-4 queries follow
# immediately (first driver evidence this round).  The leftover ~budget
# slots then re-verify round-1-evidenced families whose driver rows are
# three rounds old and predate load_table changes (a658234): the
# hash-fragile representatives first (a9 pivot, a15 collect_list, j11 asof,
# sf1 date parse, s3 json), then one per family.  Broad prefixes after that
# make the full order deterministic for any larger budget.
SWEEP_PRIORITY: list[str] = [
    # the 24 driver-unverified queries (VERDICT r3 "What's missing" #1)
    "rb12", "rb13", "rb14", "rb15", "rb16", "rb17", "rb18", "rb19",
    "u6", "u7", "j14", "st13",
    "l38", "l39", "l40", "l41", "l42", "l43", "l44",
    "l45", "l46", "l47", "l48", "l49",
    # round-4 additions (first driver evidence this round)
    "l50", "l51", "l52", "l53", "l54", "l55", "l56", "l57", "l58", "l59",
    "rb20", "rb21", "rb22", "st14", "l60",
    # re-verification of round-1-evidenced families (VERDICT r3 item #2):
    # hash-fragile representatives first, then one per family.  Entries are
    # underscore-terminated so "s1_" matches only s1 (not s10/s11) etc.
    "a9_", "a15_", "j11_", "sf1_", "s3_",
    "a4_", "w2_", "o3_", "u1_", "f8_", "p2_", "ud3_", "sf9_", "j5_",
    "s1_", "a1_", "w10_", "o5_", "sf14_", "ud6_", "j1_", "f1_", "st1_", "s4_",
    # deterministic tail
    "rb", "l", "j", "a", "f", "s", "p", "w", "o", "u", "sf", "ud", "st",
]


def REGISTRY():
    return _registry()
