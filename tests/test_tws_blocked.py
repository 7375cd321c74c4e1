"""transformWithStateInPandas (Spark 4's successor to
applyInPandasWithState) — permanently environment-blocked, recorded here
as a pinned skip so the gap is explicit and self-healing.

The API's Python worker talks to the JVM state server over protobuf
(pyspark.sql.streaming.proto imports google.protobuf at call time); this
container has no protobuf wheel and installs are prohibited. The state
semantics (ValueState / ListState / MapState handles, per-key timers)
are demonstrated one-to-one on applyInPandasWithState in
plans/windows.py::stream_state_user_stats and streaming/state.py, whose
batch-parity oracles certify the arbitrary-state contract itself.

If protobuf ever appears in the environment this file FAILS (not
passes) — the signal to promote the semantics onto the first-class API.
"""

import importlib.util

import pytest


def _protobuf_available() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def test_transform_with_state_blocked_by_missing_protobuf():
    if _protobuf_available():
        pytest.fail(
            "google.protobuf is now installed: implement a first-class "
            "transformWithStateInPandas query (mirror "
            "stream_state_user_stats' batch-parity oracle) and retire "
            "this pinned skip."
        )
    pytest.skip(
        "transformWithStateInPandas permanently blocked: no protobuf in "
        "the environment and installs are prohibited; semantics covered "
        "by applyInPandasWithState twins (stream_state_user_stats, "
        "stream_capped_sessionize)."
    )
