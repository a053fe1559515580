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
    # ROUND 10 closes the evidence program (VERDICT r9 items #1/#4): no
    # row anywhere carries a RED, so the head is "changed-this-round
    # first, then oldest evidence", sized to the ~50-row budget:
    #
    # Tier 1 — rows whose code/oracle changed THIS round (stale-evidence
    # tracker demands head placement): the de-pinned sf_dir-parameterized
    # oracles (rb8 pivot winners, s9 read_blob glob), the four
    # centroid-CTE oracles re-rendered through the DECIMAL->STRING->DOUBLE
    # hop (l14 + verbatim twin l81, l38, l47), st19's int64 overflow
    # guard, and the st14/st16 microbatch fixed-cost cuts.
    "rb8_", "s9_", "l14_", "l81_", "l38_", "l47_", "st19_",
    "st14_", "st16_", "l10_",
    # ...plus the three NEW slice-audit twins that let the 10x
    # differential cover the pair-compare family (VERDICT r9 item #5),
    # and the two JPEG rows whose codec gained restart intervals +
    # 4:2:2/4:1:1 for real this round (r9 evidence, byte-identical
    # default path, but the tracker rightly demands re-proof).
    "l60b_", "l69b_", "l75b_", "l67_", "l74_", "l72_", "l68_",
    # Tier 2 — the r03-evidence rotation (VERDICT r9 item #1): every row
    # whose latest driver check is still round 3.  With tier 1's s9/rb8/
    # l10/l14 these cover all 32 listed in the verdict.
    "s11_",
    "l1_", "l3_", "l5_", "l6_", "l8_", "l9_", "l15_", "l16_", "l17_",
    "l18_", "l19_", "l20_", "l21_", "l22_", "l23_", "l25_", "l26_",
    "l28_", "l31_", "l32_", "l35_", "l37_",
    "rb5_", "rb6_", "rb9_", "rb10_", "rb11_",
    # 10 + 28 = 38.  Tier 3 — rows the stale tracker flags for round-8/9
    # code changes that postdate their last driver sweep (r06-r07
    # evidence, local differential green at HEAD): the four append
    # streams' sink switch, the packed-mask Jaccard family, codec
    # adjacency.  Freshest evidence last (l63/l64 hold r07) so the
    # budget cut, if it lands here, bumps the least-stale rows.
    "st9_", "st10_", "st11_", "st12_",
    "l60_", "l7_", "l12_", "l29_", "l33_", "l44_", "l55_",
    "l13_", "l27_", "l63_", "l64_",
    # 38 + 15 = 53: within one row of the observed 50-52 budget; any cut
    # lands on r07-evidence codec rows that re-queue next round.
]

# Staleness rotation: oldest driver evidence first once the head clears.
# After the round-10 head lands, the oldest remaining evidence is the
# r04 tier (s3, p2, f8, a9, a15, j11, o3, u1, sf1).
SWEEP_ROTATION: list[str] = [
    "dg",
    "s3_", "p2_", "f8_", "a9_", "a15_", "j11_", "o3_", "u1_", "sf1_",
]

# Deterministic tail: whatever budget remains walks the families.
SWEEP_TAIL: list[str] = [
    "rb", "l", "j", "a", "f", "s", "p", "w", "o", "u", "sf", "ud", "st", "h",
]

SWEEP_PRIORITY: list[str] = SWEEP_HEAD + SWEEP_ROTATION + SWEEP_TAIL


def REGISTRY():
    return _registry()
