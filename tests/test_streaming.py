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


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: state survives across
    triggers; a session closes when a later trigger's events arrive
    past the gap."""
    src = tmp_path / "sess_src"
    src.mkdir()
    # trigger 1: user 1 has two events 30 s apart (one open session)
    with open(src / "b1.json", "w") as f:
        for r in [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "c", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:00:30", "user_id": 1, "event_type": "c", "value": 2.0, "props": "{}"},
        ]:
            f.write(json.dumps(r) + "\n")
    # trigger 2: user 1 comes back two hours later -> closes session A;
    # also a second user with one in-batch gap -> closes one session
    with open(src / "b2.json", "w") as f:
        for r in [
            {"event_id": 3, "ts": "2024-01-01T02:00:00", "user_id": 1, "event_type": "c", "value": 4.0, "props": "{}"},
            {"event_id": 4, "ts": "2024-01-01T02:00:05", "user_id": 2, "event_type": "c", "value": 8.0, "props": "{}"},
            {"event_id": 5, "ts": "2024-01-01T03:30:00", "user_id": 2, "event_type": "c", "value": 16.0, "props": "{}"},
        ]:
            f.write(json.dumps(r) + "\n")

    stream = events_stream.read_event_stream(spark, str(src), max_files_per_trigger=1)
    sessions = events_stream.sessionize_stream(stream, gap_seconds=1800)
    events_stream.run_to_memory_sink(sessions, name="t_sessions", timeout_s=180,
                                     output_mode="append")
    got = {
        (r["user_id"], r["session_start"].isoformat()): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    # user 1's first session (2 events, value 3.0) closed by the
    # 02:00:00 event; user 2's 02:00:05 single-event session closed by
    # the 03:30:00 event
    assert got[(1, "2024-01-01T00:00:00")] == (2, 3.0)
    assert got[(2, "2024-01-01T02:00:05")] == (1, 8.0)


def test_streaming_dedup(spark, tmp_path):
    """Watermarked streaming exact-dedup: duplicates inside the
    watermark horizon are suppressed across triggers; fingerprints
    match the batch dedup recipe."""
    from snowflake_emulator_spark.streaming import dedup_stream

    src = tmp_path / "dedup_src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in [
            {"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": "Hello, World!"},
            {"doc_id": 2, "ts": "2024-01-01T00:00:05", "text": "hello   world"},
            {"doc_id": 3, "ts": "2024-01-01T00:00:10", "text": "something else"},
        ]:
            f.write(json.dumps(r) + "\n")

    stream = dedup_stream.read_doc_stream(spark, str(src))
    deduped = dedup_stream.dedup_stream(stream, watermark="10 minutes")
    q = (deduped.writeStream.format("memory").queryName("t_dedup")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # second trigger: replay doc 1's content + one new doc
        with open(src / "b2.json", "w") as f:
            for r in [
                {"doc_id": 4, "ts": "2024-01-01T00:01:00", "text": "HELLO world"},
                {"doc_id": 5, "ts": "2024-01-01T00:01:30", "text": "fresh content"},
            ]:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT doc_id, fp FROM t_dedup").collect()
    ids = sorted(r["doc_id"] for r in rows)
    # docs 1/2/4 normalize to the same fingerprint -> only the first
    # survives; 3 and 5 are unique
    assert ids == [1, 3, 5]
    fps = {r["doc_id"]: r["fp"] for r in rows}
    assert len(set(fps.values())) == 3


def test_streaming_incremental_dedup_vs_corpus(spark, tmp_path):
    """Stream-static anti join against corpus fingerprints: arriving
    docs whose content already exists in the static corpus never
    emit; within-stream duplicates are still suppressed."""
    from snowflake_emulator_spark.streaming import dedup_stream

    corpus = spark.createDataFrame(
        [(100, "existing corpus document"), (101, "another known one")],
        "doc_id long, text string")
    src = tmp_path / "incdedup_src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in [
            # matches corpus 100 after normalization -> dropped
            {"doc_id": 1, "ts": "2024-01-01T00:00:00",
             "text": "Existing   CORPUS document!"},
            {"doc_id": 2, "ts": "2024-01-01T00:00:05", "text": "brand new"},
            # duplicate of doc 2 within the stream -> dropped
            {"doc_id": 3, "ts": "2024-01-01T00:00:10", "text": "BRAND NEW"},
        ]:
            f.write(json.dumps(r) + "\n")
    stream = dedup_stream.read_doc_stream(spark, str(src))
    fresh = dedup_stream.incremental_dedup_stream(
        stream, corpus, watermark="10 minutes")
    q = (fresh.writeStream.format("memory").queryName("t_incdedup")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        with open(src / "b2.json", "w") as f:
            for r in [
                # corpus hit again in a later trigger -> dropped
                {"doc_id": 4, "ts": "2024-01-01T00:01:00",
                 "text": "another known one"},
                {"doc_id": 5, "ts": "2024-01-01T00:01:10", "text": "also new"},
            ]:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r["doc_id"]
                 for r in spark.sql("SELECT doc_id FROM t_incdedup").collect())
    assert ids == [2, 5]


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks attribute to impressions
    of the same user within the interval; out-of-window and other-user
    impressions are excluded. State bounded by watermark."""
    from snowflake_emulator_spark.streaming import join_stream

    clicks_dir = tmp_path / "clicks"
    imps_dir = tmp_path / "imps"
    clicks_dir.mkdir()
    imps_dir.mkdir()
    clicks = [
        # joins imp at 00:00:10 (40 s gap, within 1 min)
        {"event_id": 1, "ts": "2024-01-01T00:00:50", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        # no impression within the window (imp is 2 min earlier)
        {"event_id": 2, "ts": "2024-01-01T00:05:00", "user_id": 2, "event_type": "click", "value": 2.0, "props": "{}"},
    ]
    imps = [
        {"event_id": 10, "ts": "2024-01-01T00:00:10", "user_id": 1, "event_type": "imp", "value": 0.5, "props": "{}"},
        {"event_id": 11, "ts": "2024-01-01T00:03:00", "user_id": 2, "event_type": "imp", "value": 0.7, "props": "{}"},
        # same window but different user: must not join
        {"event_id": 12, "ts": "2024-01-01T00:00:20", "user_id": 3, "event_type": "imp", "value": 0.9, "props": "{}"},
    ]
    with open(clicks_dir / "c.json", "w") as f:
        for r in clicks:
            f.write(json.dumps(r) + "\n")
    with open(imps_dir / "i.json", "w") as f:
        for r in imps:
            f.write(json.dumps(r) + "\n")

    c = events_stream.read_event_stream(spark, str(clicks_dir))
    i = events_stream.read_event_stream(spark, str(imps_dir))
    joined = join_stream.interval_join(c, i, watermark="10 minutes", within="1 minute")
    assert joined.isStreaming
    events_stream.run_to_memory_sink(joined, name="t_join", timeout_s=120,
                                     output_mode="append")
    rows = [tuple(r) for r in spark.sql(
        "SELECT user_id, click_value, imp_value FROM t_join").collect()]
    assert rows == [(1, 1.0, 0.5)]


def test_streaming_upsert_sink(spark, tmp_path, engine):
    """foreachBatch MERGE sink: a stream of keyed updates continuously
    upserts into an engine table; the latest record per key wins within
    a micro-batch, and later batches update earlier keys."""
    from pyspark.sql import types as T

    from snowflake_emulator_spark.executor import SessionContext
    from snowflake_emulator_spark.streaming import upsert_stream

    ctx = SessionContext()
    engine.execute("CREATE TABLE kv (k INTEGER, v VARCHAR, seq INTEGER)", ctx)

    src = tmp_path / "upsert_src"
    src.mkdir()
    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ])
    # one file = one micro-batch (maxFilesPerTrigger=1):
    # batch 1 carries two versions of k=1 — seq 2 must win
    with open(src / "b1.json", "w") as f:
        f.write('{"k": 1, "v": "old", "seq": 1}\n')
        f.write('{"k": 1, "v": "new", "seq": 2}\n')
        f.write('{"k": 2, "v": "two", "seq": 1}\n')
    with open(src / "b2.json", "w") as f:
        f.write('{"k": 2, "v": "two-upd", "seq": 2}\n')
        f.write('{"k": 3, "v": "three", "seq": 1}\n')

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    upsert_stream.run_upsert_stream(stream, engine, "kv",
                                    key_cols=["k"], order_col="seq")
    res = engine.execute("SELECT k, v, seq FROM kv ORDER BY k", SessionContext())
    assert [tuple(r) for r in res.rows] == [
        (1, "new", 2), (2, "two-upd", 2), (3, "three", 1)]


def test_streaming_pattern_detect(spark, tmp_path):
    """r11: streaming MATCH_RECOGNIZE — the batch matcher over
    watermark-finalized buffered rows in applyInPandasWithState. A
    match emits only once it cannot change (its end precedes the
    finalized frontier); state survives across triggers."""
    import json as _json

    from snowflake_emulator_spark.streaming import events_stream, pattern_stream

    src = tmp_path / "pat_src"
    src.mkdir()
    # trigger 1: user 1 starts a funnel view -> cart -> cart -> buy
    with open(src / "b1.json", "w") as f:
        for r in [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "cart", "value": 1.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T00:20:00", "user_id": 1, "event_type": "cart", "value": 1.0, "props": "{}"},
            {"event_id": 4, "ts": "2024-01-01T00:30:00", "user_id": 1, "event_type": "buy", "value": 1.0, "props": "{}"},
        ]:
            f.write(_json.dumps(r) + "\n")
    # trigger 2: a second funnel for user 1 plus user 2 noise; pushes
    # the watermark past the first funnel
    with open(src / "b2.json", "w") as f:
        for r in [
            {"event_id": 5, "ts": "2024-01-01T02:00:00", "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"},
            {"event_id": 6, "ts": "2024-01-01T02:05:00", "user_id": 1, "event_type": "buy", "value": 1.0, "props": "{}"},
            {"event_id": 7, "ts": "2024-01-01T02:06:00", "user_id": 2, "event_type": "view", "value": 1.0, "props": "{}"},
        ]:
            f.write(_json.dumps(r) + "\n")
    # trigger 3: far-future heartbeat pushes the watermark past batch 2
    with open(src / "b3.json", "w") as f:
        f.write(_json.dumps(
            {"event_id": 8, "ts": "2024-01-01T06:00:00", "user_id": 99,
             "event_type": "view", "value": 1.0, "props": "{}"}) + "\n")

    # file-source trigger order follows modification time; equal mtimes
    # make the order undefined (the far-future heartbeat processed FIRST
    # advances the watermark past the funnel rows) — force a strict order
    import os as _os
    for i, fname in enumerate(["b1.json", "b2.json", "b3.json"]):
        t = 1700000000 + i * 10
        _os.utime(src / fname, (t, t))

    stream = events_stream.read_event_stream(spark, str(src), max_files_per_trigger=1)
    out = pattern_stream.pattern_detect_stream(
        stream, "V C* B",
        {"V": "event_type = 'view'", "C": "event_type = 'cart'",
         "B": "event_type = 'buy'"},
        partition_col="user_id", watermark="10 minutes")
    events_stream.run_to_memory_sink(out, name="t_patterns", timeout_s=240,
                                     output_mode="append")
    got = {(r["user_id"], r["match_number"]):
           (r["start_ts"].isoformat(), r["end_ts"].isoformat(), r["n_rows"])
           for r in spark.sql("SELECT * FROM t_patterns").collect()}
    # funnel 1: view..buy spanning 00:00-00:30 (4 rows incl. two carts);
    # funnel 2: 02:00-02:05 (2 rows). user 2 never completes a pattern.
    assert got[(1, 1)] == ("2024-01-01T00:00:00", "2024-01-01T00:30:00", 4)
    assert got[(1, 2)] == ("2024-01-01T02:00:00", "2024-01-01T02:05:00", 2)
    assert not any(u == 2 for u, _m in got)


def test_streaming_pattern_detect_restrictions(spark):
    import pytest
    from snowflake_emulator_spark.streaming import pattern_stream

    df = spark.readStream.format("rate").load() \
        .selectExpr("value AS user_id", "timestamp AS ts",
                    "'x' AS event_type")
    with pytest.raises(NotImplementedError, match="PRIOR"):
        pattern_stream.pattern_detect_stream(
            df, "A+", {"A": "value > PRIOR value"})
    with pytest.raises(ValueError, match="anchors"):
        pattern_stream.pattern_detect_stream(
            df, "^ A", {"A": "event_type = 'x'"})


def test_streaming_pattern_tied_timestamp_tiebreak(spark, tmp_path):
    """r12 (ADVICE): same-timestamp rows within a partition must order
    by the stable key (event_id) — mirroring batch ORDER BY (ts,
    event_id) — not by symbol mask value. Here 'Y X' only matches when
    the id order (y first) wins over the mask order (x's bit is lower)."""
    import json as _json
    import os as _os

    from snowflake_emulator_spark.streaming import events_stream, pattern_stream

    src = tmp_path / "tie_src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        # SAME timestamp; event_id order is y(1) then x(2). The X symbol
        # is declared first (bit 0 < Y's bit 1), so a mask-ordered sort
        # would flip them and 'Y X' would never match.
        for r in [
            {"event_id": 2, "ts": "2024-01-01T00:00:00", "user_id": 7,
             "event_type": "x", "value": 1.0, "props": "{}"},
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7,
             "event_type": "y", "value": 1.0, "props": "{}"},
        ]:
            f.write(_json.dumps(r) + "\n")
    with open(src / "b2.json", "w") as f:
        # heartbeat far ahead: watermark passes, timeout flushes user 7
        f.write(_json.dumps(
            {"event_id": 9, "ts": "2024-01-01T06:00:00", "user_id": 99,
             "event_type": "y", "value": 1.0, "props": "{}"}) + "\n")
    for i, fname in enumerate(["b1.json", "b2.json"]):
        t = 1710000000 + i * 10
        _os.utime(src / fname, (t, t))

    stream = events_stream.read_event_stream(spark, str(src),
                                             max_files_per_trigger=1)
    out = pattern_stream.pattern_detect_stream(
        stream, "Y X",
        {"X": "event_type = 'x'", "Y": "event_type = 'y'"},
        partition_col="user_id", watermark="10 minutes")
    events_stream.run_to_memory_sink(out, name="t_tiebreak", timeout_s=240,
                                     output_mode="append")
    got = [(r["user_id"], r["n_rows"])
           for r in spark.sql("SELECT * FROM t_tiebreak").collect()]
    assert got == [(7, 2)]
