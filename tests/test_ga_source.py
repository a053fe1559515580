"""GA connector (s6): request assembly, pagination arithmetic, and the
string-wire -> typed-DataFrame shaping layer, driven with a recorded-style
GA v3 response fixture (SURVEY.md §3.1)."""

from __future__ import annotations

import pytest

from google_analytics_dataframes_spark.sources.ga_api import (
    build_request_params,
    fetch_report,
    next_page_params,
    response_to_dataframe,
)

RESPONSE = {
    "columnHeaders": [
        {"name": "ga:date", "columnType": "DIMENSION", "dataType": "STRING"},
        {"name": "ga:source", "columnType": "DIMENSION", "dataType": "STRING"},
        {"name": "ga:sessions", "columnType": "METRIC", "dataType": "INTEGER"},
        {"name": "ga:bounceRate", "columnType": "METRIC", "dataType": "PERCENT"},
        {"name": "ga:transactionRevenue", "columnType": "METRIC", "dataType": "CURRENCY"},
    ],
    "totalResults": 3,
    "rows": [
        ["20140101", "google", "120", "41.2", "99.95"],
        ["20140102", "direct", "80", "38.0", "0.0"],
        ["20140103", "google", "95", "44.9", "12.5"],
    ],
}


def test_request_params_match_ga_surface():
    p = build_request_params(
        ids="12345",
        start_date="2014-01-01",
        end_date="2014-01-31",
        metrics=["ga:sessions", "ga:users"],
        dimensions=["ga:date", "ga:source"],
        filters="ga:country==US",
        sort=["-ga:sessions"],
        max_results=1000,
    )
    assert p["ids"] == "ga:12345"
    assert p["metrics"] == "ga:sessions,ga:users"
    assert p["dimensions"] == "ga:date,ga:source"
    assert p["sort"] == "-ga:sessions"
    assert p["start-index"] == 1 and p["max-results"] == 1000


def test_pagination_bumps_one_based_index():
    p = build_request_params("ga:1", "a", "b", ["ga:sessions"], max_results=1000)
    p2 = next_page_params(p, total_results=2500)
    assert p2["start-index"] == 1001
    p3 = next_page_params(p2, total_results=2500)
    assert p3["start-index"] == 2001
    assert next_page_params(p3, total_results=2500) is None


def test_response_shaping_types_and_values(spark):
    df = response_to_dataframe(spark, RESPONSE)
    assert dict(df.dtypes) == {
        "date": "date",
        "source": "string",
        "sessions": "bigint",
        "bounceRate": "double",
        "transactionRevenue": "double",
    }
    rows = {(str(r.date), r.source): r for r in df.collect()}
    assert rows[("2014-01-01", "google")].sessions == 120
    assert rows[("2014-01-02", "direct")].bounceRate == 38.0


def test_empty_response_yields_typed_empty_frame(spark):
    empty = {"columnHeaders": RESPONSE["columnHeaders"], "totalResults": 0}
    df = response_to_dataframe(spark, empty)
    assert df.count() == 0 and dict(df.dtypes)["sessions"] == "bigint"


def test_fetch_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        fetch_report(spark, ids="ga:1")


def test_get_report_paginates_and_unions_with_injected_transport(spark):
    """The composed ga.get lifecycle: a canned 3-page transport (5 rows,
    max-results 2) must be called with start-index 1, 3, 5, and the result
    is the typed union of all pages."""
    from google_analytics_dataframes_spark.sources.ga_api import get_report

    headers = [
        {"name": "ga:source", "columnType": "DIMENSION", "dataType": "STRING"},
        {"name": "ga:sessions", "columnType": "METRIC", "dataType": "INTEGER"},
    ]
    all_rows = [[f"s{i}", str(10 * i)] for i in range(5)]
    seen_indices = []

    def transport(params):
        start = params["start-index"]
        seen_indices.append(start)
        page = all_rows[start - 1 : start - 1 + params["max-results"]]
        return {"columnHeaders": headers, "totalResults": 5, "rows": page}

    df = get_report(
        spark,
        transport=transport,
        ids="123",
        start_date="2014-01-01",
        end_date="2014-01-31",
        metrics=["ga:sessions"],
        dimensions=["ga:source"],
        max_results=2,
    )
    assert seen_indices == [1, 3, 5]
    got = {r.source: r.sessions for r in df.collect()}
    assert got == {f"s{i}": 10 * i for i in range(5)}
    assert dict(df.dtypes)["sessions"] == "bigint"


def test_upload_sink_manifest_hides_orphans_and_abort_cleans(spark, tmp_path):
    """The sink's visibility contract: readers trust _MANIFEST.json, so a
    part file from a failed/zombie task (present in the directory, absent
    from the manifest) must be invisible; and abort() must remove exactly
    the files its messages name."""
    import json
    import os

    from google_analytics_dataframes_spark.sources.ga_api import (
        GaUploadSinkDataSource,
        register_upload_sink,
    )

    register_upload_sink(spark)
    d = str(tmp_path)
    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "'view' AS event_type",
        "CAST(id AS DOUBLE) / 4 AS value",
    )
    df.repartition(3).write.format("ga_upload_sink").option("path", d).mode(
        "append"
    ).save()
    with open(os.path.join(d, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 100 and len(manifest["files"]) == 3
    # plant an orphan (a zombie task's leftover): directory listing sees
    # it, the manifest-driven read must not
    orphan = os.path.join(d, "part-orphan.jsonl")
    with open(orphan, "w") as f:
        f.write('{"event_id": 999999, "user_id": 0, "event_type": "view", "value": 0.0}\n')
    schema = "event_id long, user_id long, event_type string, value double"
    back = spark.read.schema(schema).json(
        [os.path.join(d, fn) for fn in manifest["files"]]
    )
    assert back.count() == 100
    assert back.filter("event_id = 999999").count() == 0

    # abort removes exactly the named files
    src = GaUploadSinkDataSource.make()(options={"path": d})
    writer = src.writer(None, overwrite=False)

    class _R:
        def __init__(self, i): self.i = i
        def asDict(self): return {"event_id": self.i}
    msg = writer.write(iter([_R(1), _R(2)]))
    assert os.path.exists(os.path.join(d, msg.fname))
    writer.abort([msg])
    assert not os.path.exists(os.path.join(d, msg.fname))
