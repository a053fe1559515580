"""GA Core Reporting API connector (SURVEY.md §2.1 s6, §3.1) — the
reference's actual client-side job, reproduced Spark-first.

The reference's lifecycle [K] is: build request kwargs -> HTTPS
``data/ga.get`` -> paginate on ``nextLink`` -> coerce ``columnHeaders``
dataTypes -> pandas DataFrame.  Everything network-side is unreachable here
(and GA v3 itself is sunset), so the connector splits into:

* :func:`build_request_params` / :func:`next_page_params` — pure request
  assembly + pagination arithmetic (`start-index` is 1-based, bumps by
  `max-results` while more rows remain) — fully unit-tested offline.
* :func:`response_to_dataframe` — the dtype-coercion layer: GA responses
  carry all cell values as strings with a dynamic declared schema
  (columnHeaders: DIMENSION/METRIC x STRING/INTEGER/FLOAT/CURRENCY/
  PERCENT/TIME); this maps them to a typed Spark DataFrame exactly the way
  the reference maps to pandas dtypes (SURVEY.md §1.2 table).
* :func:`fetch_report` — the network call itself: stubbed with
  NotImplementedError (no OAuth/HTTP in this environment).

At scale the fetch loop is a driver-side page iterator whose pages land as
parquet and union via `unionByName` — the 10k-row GA page cap makes the
network, not Spark, the bottleneck; pages are written out as they arrive so
nothing accumulates on the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

#: GA wire dataType -> (spark cast target) — SURVEY.md §1.2.
_DATATYPE_CAST = {
    "STRING": "string",
    "INTEGER": "long",
    "FLOAT": "double",
    "CURRENCY": "double",
    "PERCENT": "double",
    "TIME": "double",
}


def build_request_params(
    ids: str,
    start_date: str,
    end_date: str,
    metrics: list[str],
    dimensions: list[str] | None = None,
    filters: str | None = None,
    sort: list[str] | None = None,
    max_results: int = 10_000,
    start_index: int = 1,
    sampling_level: str = "HIGHER_PRECISION",
) -> dict[str, Any]:
    """Assemble the exact `ga.get` parameter dict the reference sends [K]."""
    params: dict[str, Any] = {
        "ids": ids if ids.startswith("ga:") else f"ga:{ids}",
        "start-date": start_date,
        "end-date": end_date,
        "metrics": ",".join(metrics),
        "max-results": max_results,
        "start-index": start_index,
        "samplingLevel": sampling_level,
    }
    if dimensions:
        params["dimensions"] = ",".join(dimensions)
    if filters:
        params["filters"] = filters
    if sort:
        params["sort"] = ",".join(sort)
    return params


def next_page_params(
    params: dict[str, Any], total_results: int
) -> dict[str, Any] | None:
    """GA pagination: bump 1-based start-index by max-results; None when the
    next page would start past totalResults."""
    nxt = dict(params)
    nxt["start-index"] = params["start-index"] + params["max-results"]
    return nxt if nxt["start-index"] <= total_results else None


def response_to_dataframe(spark: SparkSession, response: dict[str, Any]) -> DataFrame:
    """GA JSON response -> typed Spark DataFrame.

    Mirrors the reference's shaping step [K]: all wire cells are strings;
    `columnHeaders[].dataType` declares the real type; `ga:date` strings
    (`yyyyMMdd`) become DateType.  Empty `rows` (a valid GA response) yields
    an empty typed frame."""
    headers = response["columnHeaders"]
    names = [h["name"].removeprefix("ga:") for h in headers]
    wire_schema = StructType([StructField(n, StringType()) for n in names])
    df = spark.createDataFrame(response.get("rows", []), schema=wire_schema)
    for h, name in zip(headers, names):
        if h["name"] == "ga:date":
            df = df.withColumn(name, F.to_date(F.col(name), "yyyyMMdd"))
        else:
            df = df.withColumn(
                name, F.col(name).cast(_DATATYPE_CAST[h["dataType"]])
            )
    return df


def fetch_report(spark: SparkSession, **request: Any) -> DataFrame:
    """The network boundary (SURVEY.md §3.1 step 4).  Unreachable here."""
    raise NotImplementedError(
        "GA HTTP transport is stubbed: no network/OAuth in this environment. "
        "Drive response_to_dataframe with a recorded response instead."
    )


def get_report(
    spark: SparkSession,
    transport: Any = None,
    **request: Any,
) -> DataFrame:
    """The reference's full ``ga.get`` lifecycle composed end-to-end:
    build params -> transport -> paginate on totalResults -> coerce each
    page -> union [K].

    ``transport`` is the injected network boundary — a callable taking the
    assembled params dict and returning the decoded JSON response.  ``None``
    falls through to :func:`fetch_report`, which is stubbed in this
    environment; tests drive the loop with a canned-response transport
    (tests/test_ga_source.py), so the pagination arithmetic, per-page
    coercion and page union are all exercised as ONE flow, exactly the
    request loop the reference runs per report.

    Pages union lazily (`unionByName` of typed frames); at scale the loop
    body would write each page to parquet as it lands instead of holding
    plans for thousands of pages (module docstring)."""
    params = build_request_params(**request)
    out: DataFrame | None = None
    while params is not None:
        resp = (
            transport(params) if transport is not None else fetch_report(spark, **params)
        )
        page = response_to_dataframe(spark, resp)
        out = page if out is None else out.unionByName(page)
        params = next_page_params(params, resp.get("totalResults", 0))
    return out


# ---------------------------------------------------------------------------
# PySpark 4 custom Python DataSource (V2): the GA pagination model as a REAL
# Spark source — each API result page becomes one InputPartition, so page
# fetches run in parallel across executors instead of the driver-side loop
# get_report uses.  The fixture generator stands in for the HTTP fetch (same
# no-network seam as fetch_report); everything around it — registration,
# schema, partition planning, per-partition iteration — is the genuine
# DataSource API surface a production connector implements.


class GaReportFixtureDataSource:
    """`spark.read.format("ga_report_fixture")` — a paginated-report source.

    Options: ``n_pages`` (default 32), ``page_size`` (default 100).  Rows
    are deterministic functions of (page, row) so an SQL oracle can
    recompute the whole table: visits = (131p + 17r) mod 1000, pageviews
    = visits + (p + r) mod 50, date = 2024-01-01 + (p + r) mod 30 days.
    Implemented lazily against pyspark.sql.datasource so importing this
    module stays cheap and the class only materializes the API types when
    a session registers it."""

    @staticmethod
    def make():
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceReader,
            InputPartition,
        )

        class _PagePartition(InputPartition):
            def __init__(self, page: int):
                self.page = page

        class _Reader(DataSourceReader):
            def __init__(self, options):
                self.n_pages = int(options.get("n_pages", 32))
                self.page_size = int(options.get("page_size", 100))

            def partitions(self):
                # one partition per API page: the pagination loop becomes
                # cluster parallelism (start-index = page * page_size)
                return [_PagePartition(p) for p in range(self.n_pages)]

            def read(self, partition):
                import datetime

                p = partition.page
                base = datetime.date(2024, 1, 1)
                for r in range(self.page_size):
                    visits = (131 * p + 17 * r) % 1000
                    yield (
                        p,
                        r,
                        visits,
                        visits + (p + r) % 50,
                        (base + datetime.timedelta(days=(p + r) % 30)).isoformat(),
                    )

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return "ga_report_fixture"

            def schema(self):
                return (
                    "page_idx int, row_idx int, visits bigint, "
                    "pageviews bigint, date_s string"
                )

            def reader(self, schema):
                return _Reader(self.options)

        return _Source


def register_fixture_datasource(spark) -> None:
    """Idempotently register the paginated fixture source on a session."""
    spark.dataSource.register(GaReportFixtureDataSource.make())


class GaUploadSinkDataSource:
    """`df.write.format("ga_upload_sink")` — the WRITER half of the Python
    DataSource API (s14 covers the reader half): GA's Data-Import /
    upload direction as a partition-parallel sink with a real two-phase
    commit.

    Each task serializes its partition to a JSON-lines part file under
    ``path`` and returns a WriterCommitMessage naming it; ``commit``
    publishes a `_MANIFEST.json` listing exactly the committed files (the
    atomic-visibility pattern every table format uses — readers trust the
    manifest, never the directory listing, so a straggler/zombie task's
    orphan file is invisible); ``abort`` removes the named files.  Local
    filesystem stands in for the shared store a cluster deployment would
    target — the API surface (writer planning, per-task write, driver
    commit/abort) is the genuine production shape."""

    @staticmethod
    def make():
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceWriter,
            WriterCommitMessage,
        )

        class _Msg(WriterCommitMessage):
            def __init__(self, fname: str, n_rows: int):
                self.fname = fname
                self.n_rows = n_rows

        class _Writer(DataSourceWriter):
            def __init__(self, options):
                self.path = options["path"]

            def write(self, rows):
                import json
                import os
                import uuid

                fname = f"part-{uuid.uuid4().hex}.jsonl"
                n = 0
                with open(os.path.join(self.path, fname), "w") as f:
                    for row in rows:
                        f.write(json.dumps(row.asDict()) + "\n")
                        n += 1
                return _Msg(fname, n)

            def commit(self, messages):
                import json
                import os

                manifest = {
                    "files": sorted(m.fname for m in messages),
                    "rows": sum(m.n_rows for m in messages),
                }
                tmp = os.path.join(self.path, "._MANIFEST.json.tmp")
                with open(tmp, "w") as f:
                    json.dump(manifest, f)
                os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

            def abort(self, messages):
                import os

                # a FAILED task's commit message arrives as None (the
                # DataSourceWriter contract) — only successful tasks'
                # files exist to clean up
                for m in messages:
                    if m is None:
                        continue
                    try:
                        os.remove(os.path.join(self.path, m.fname))
                    except OSError:
                        pass

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return "ga_upload_sink"

            def writer(self, schema, overwrite):
                return _Writer(self.options)

        return _Source


def register_upload_sink(spark) -> None:
    """Idempotently register the upload sink on a session."""
    spark.dataSource.register(GaUploadSinkDataSource.make())
