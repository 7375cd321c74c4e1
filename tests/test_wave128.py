"""Invariants for wave 128 (streaming capped sessionize parity)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_streaming_matches_batch_twin(spark):
    batch = {
        r.user_id: (r.n_events, r.n_sessions, r.last_session_len)
        for r in REGISTRY["events_capped_sessionize"].fn(spark, SF_SMOKE).collect()
    }
    stream = {
        r.user_id: (r.n_events, r.n_sessions, r.last_session_len)
        for r in REGISTRY["stream_capped_sessionize"].fn(spark, SF_SMOKE).collect()
    }
    assert stream == batch
