"""Locate a usable ``google.protobuf`` runtime for transformWithStateInPandas.

The implementation moved into the package when st18 made TWS a REGISTERED
query (the driver harness needs the arming logic without the test tree):
see :mod:`google_analytics_dataframes_spark.streaming.tws_runtime` for the
full story (vendored-runtime discovery, the jar-resource namespace-package
trap, the gencode minor-version gate, and why the driver worker needs an
env-var-at-interpreter-start shim rather than addPyFile).  This module keeps
the historical test-suite import surface.
"""

from __future__ import annotations

from google_analytics_dataframes_spark.streaming.tws_runtime import (  # noqa: F401
    ENV_VAR,
    FALLBACK_RUNTIME_DIRS,
    SITECUSTOMIZE_SRC,
    _candidate_dirs,
    armed_worker_env,
    ensure_protobuf,
    install_worker_shim,
)
