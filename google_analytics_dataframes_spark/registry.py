"""Query registry — the bridge between SURVEY.md §2 rows and the driver
contract (``__spark_entry__.py``).

Each implemented operator registers one named query: a ``(spark, sf_dir) ->
DataFrame`` callable plus (for O-tier rows) the ANSI-SQL oracle string DuckDB
runs over the identical parquet.  The driver compares row-count + schema +
order-insensitive value-hash at sf0.01 (``__spark_entry__.py:3-7``).

Determinism hygiene enforced here by convention (SURVEY.md §5.2 item 4):
* every computed column aliased identically in DataFrame code and oracle SQL;
* float aggregates stabilized — exact decimal accumulation or terminal
  rounding — in BOTH formulations (see helpers in queries/_util.py);
* no reliance on row order (the driver hash is order-insensitive, but LIMIT
  queries pair with total ORDER BY so the selected rowset is deterministic).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL; None => rows-only check
    tier: str  # "O" full oracle | "R" rows-only | "D" design/streaming
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tier: str = "O", doc: str = ""):
    """Decorator: register ``fn`` as query ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tier=tier, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


_PRIORITY: list[str] = []


def set_priority_order(prefixes: list[str]) -> None:
    """Declare the registry iteration order as a prefix priority list.

    External sweeps iterate the registry dict in insertion order and may stop
    on a count/time budget, so the order decides which queries get recorded
    evidence.  Each entry is matched as an exact name first, then as a name
    prefix (longest-prefix wins, so "w10" beats "w1"); unmatched queries keep
    their registration order after all matched ones.
    """
    global _PRIORITY
    _PRIORITY = list(prefixes)


def _ordered(reg: dict[str, Query]) -> dict[str, Query]:
    if not _PRIORITY:
        return dict(reg)

    def rank(name: str) -> tuple[int, int]:
        best = len(_PRIORITY)  # unmatched sorts after every priority bucket
        best_len = -1
        for i, p in enumerate(_PRIORITY):
            if name == p or name.startswith(p):
                if len(p) > best_len:
                    best, best_len = i, len(p)
        return (best, 0)

    indexed = sorted(enumerate(reg), key=lambda t: (rank(t[1]), t[0]))
    return {n: reg[n] for _, n in indexed}


def registry() -> dict[str, Query]:
    """All registered queries (importing the queries package populates it)."""
    import google_analytics_dataframes_spark.queries  # noqa: F401  (side-effect: registration)

    return _ordered(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
