"""Property-based tests (hypothesis): the vocab-adaptive bitmask Jaccard
strategy must be EXACTLY result-equivalent to the inverted-index strategy on
arbitrary corpora — including vocabularies crossing the 64-bit mask-word
boundary — and the GA filter DSL must agree with hand-built predicates."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# vocab > 64 forces multi-word masks; tokens as short strings
_VOCAB = [f"t{i:02d}" for i in range(70)]

_corpus = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12, unique=True),
    min_size=2,
    max_size=12,
)


@given(corpus=_corpus, pct=st.sampled_from([10, 40, 60, 100]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_all_jaccard_strategies_agree(spark, corpus, pct):
    """bitmask, full inverted-index, and prefix-filtered strategies are
    result-identical on arbitrary corpora and thresholds."""
    from google_analytics_dataframes_spark.operators.dedup import (
        _jaccard_pairs_bitmask,
        _jaccard_pairs_index,
        _jaccard_pairs_prefix,
    )

    rows = [(i, item) for i, items in enumerate(corpus) for item in items]
    items = spark.createDataFrame(rows, "doc_id long, item string")
    vocab = sorted({it for _, it in rows})
    results = {
        "bitmask": _jaccard_pairs_bitmask(items, pct, vocab),
        "index": _jaccard_pairs_index(items, pct),
        "prefix": _jaccard_pairs_prefix(items, pct),
    }
    seen = {
        name: {
            (r["doc_a"], r["doc_b"], r["inter"], r["uni"])
            for r in df.collect()
        }
        for name, df in results.items()
    }
    assert seen["bitmask"] == seen["index"] == seen["prefix"]


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


@given(edges=_edges)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_equals_union_find(spark, edges):
    """The iterative min-label propagation must produce exactly the
    components a sequential union-find does on arbitrary graphs — chains,
    stars, cycles, self-dups — with cluster_id = min member id."""
    from google_analytics_dataframes_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    want = {n: min(members) for members in groups.values() for n in members}

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == want


@given(
    lo=st.integers(min_value=0, max_value=200),
    hi=st.integers(min_value=201, max_value=600),
    et=st.sampled_from(["view", "click", "purchase"]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_dsl_equals_handbuilt(spark, lo, hi, et):
    from google_analytics_dataframes_spark.io import load_table
    from google_analytics_dataframes_spark.report import parse_ga_filters
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    dsl = f"value>{lo}.0,event_type=={et};value<={hi}.0"
    got = ev.filter(parse_ga_filters(ev, dsl)).count()
    want = ev.filter(
        ((F.col("value") > float(lo)) | (F.col("event_type") == et))
        & (F.col("value") <= float(hi))
    ).count()
    assert got == want
