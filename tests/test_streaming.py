"""Structured Streaming extension tests (beyond-reference; the
reference supports no streams, README.md:300-304)."""

import json

from snowflake_emulator_spark.streaming import events_stream


def test_windowed_stream_counts(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:00:10", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:00:50", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T00:01:10", "user_id": 2, "event_type": "view", "value": 3.0, "props": "{}"},
    ]
    with open(src / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = events_stream.read_event_stream(spark, str(src))
    assert stream.isStreaming
    agg = events_stream.windowed_counts(stream, window="1 minute", watermark="2 minutes")
    events_stream.run_to_memory_sink(agg, name="t_agg", timeout_s=120)
    out = {(r["window_start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
           for r in spark.sql("SELECT * FROM t_agg").collect()}
    assert out[("2024-01-01T00:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01T00:01:00", "view")] == (1, 3.0)
