"""Streaming MATCH_RECOGNIZE-style pattern detection (r11, beyond
reference): detect row-pattern matches over an EVENT STREAM with the
same pattern grammar, candidate-bitmask design and greedy matcher as
the batch operator (``operators/match_recognize.py`` — the AST parser
and ``find_matches`` are reused verbatim, so batch and streaming
semantics cannot drift).

Design (``applyInPandasWithState``, per-partition state):

* DEFINE predicates are ROW-LOCAL and compiled into the JVM-side
  candidate bitmask BEFORE the shuffle (whole-stage codegen; the Python
  state function never evaluates SQL). PRIOR/NEXT navigation is a
  documented streaming restriction — it needs a lag/lead over the
  stream, which is itself a stateful op; compose upstream if needed.
* Each partition buffers (event-time, mask) pairs in its state row.
  Rows at or below the current WATERMARK are FINAL (the watermark
  contract: nothing older can still arrive), so the matcher runs over
  the finalized prefix each trigger.
* A match is emitted only when it cannot change anymore: its end lies
  strictly BEFORE the finalized frontier (a greedy quantifier ending
  exactly at the frontier could still extend with the next row, so
  frontier-ending matches stay pending). Emitted matches consume their
  rows (AFTER MATCH SKIP PAST LAST ROW); everything after the last
  emitted match stays buffered because a future match may start there.
* An event-time TIMEOUT one tick past the newest buffered row flushes
  the partition when the stream goes quiet: the whole buffer is final,
  pending frontier matches emit, state is removed.
* State is bounded: the buffer never exceeds ``max_buffer`` rows (the
  oldest rows are evicted first — they can only be match PREFIXES that
  never completed within the horizon). Watermark + timeout bound it in
  time; ``max_buffer`` bounds adversarial no-watermark-progress cases.

Scale: one shuffle on the partition key; state per key is one Arrow
row of two long arrays. Matching cost per trigger is the batch
matcher's cost over the key's buffer — bounded by ``max_buffer``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.match_recognize import find_matches, parse_pattern

MATCH_SCHEMA_FIELDS = [
    T.StructField("match_number", T.LongType()),
    T.StructField("start_ts", T.TimestampType()),
    T.StructField("end_ts", T.TimestampType()),
    T.StructField("n_rows", T.LongType()),
]

_STATE_SCHEMA = T.StructType([
    T.StructField("ts_us", T.ArrayType(T.LongType()), True),
    T.StructField("masks", T.ArrayType(T.LongType()), True),
    # r12 (ADVICE): stable tiebreak key per buffered row — same-timestamp
    # rows must order exactly like the batch operator's ORDER BY
    # (ts, event_id), not by mask value
    T.StructField("keys", T.ArrayType(T.LongType()), True),
    T.StructField("n_matches", T.LongType(), True),
])


def pattern_detect_stream(
    events: DataFrame,
    pattern: str,
    define: dict[str, str],
    partition_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    max_buffer: int = 10_000,
    order_col: str | None = "event_id",
) -> DataFrame:
    """Emit one row per completed pattern match per partition:
    (partition, match_number, start_ts, end_ts, n_rows).

    ``define`` maps symbol -> row-local SQL boolean over the stream's
    columns; ``pattern`` uses the batch operator's full grammar
    (quantifiers, alternation, PERMUTE, anchors are meaningless on an
    unbounded stream and rejected). AFTER MATCH SKIP PAST LAST ROW.

    ``order_col`` (r12): stable tiebreak for same-timestamp rows within
    a partition, mirroring the batch operator's ORDER BY (ts, event_id);
    falls back to arrival order (lit 0, stable sort) when the stream has
    no such column, and (r13) for NULL or non-castable values within it.

    CHECKPOINT COMPATIBILITY: r12 added the 'keys' array to the state
    schema, changing the applyInPandasWithState state layout — a query
    restored from a pre-r12 checkpoint fails on the state-schema
    mismatch. Discard the old checkpoint directory (start fresh); the
    operator is otherwise drop-in compatible."""
    import re as _re

    for sym, pred in define.items():
        if pred and _re.search(r"\b(PRIOR|NEXT)\b", pred, _re.I):
            raise NotImplementedError(
                "streaming pattern detection: PRIOR/NEXT navigation in "
                f"DEFINE ({sym}) requires a lag/lead over the stream — "
                "compose it upstream (documented restriction)")
    if "^" in pattern or "$" in pattern:
        raise ValueError(
            "^/$ anchors are meaningless on an unbounded stream")

    define_uc = {k.upper(): v for k, v in define.items()}
    symbol_index: dict[str, int] = {s: i for i, s in enumerate(define_uc)}
    ast = parse_pattern(pattern, symbol_index)

    mask = F.lit(0).cast("long")
    for name, i in symbol_index.items():
        pred = define_uc.get(name)
        bit = F.lit(1 << i).cast("long")
        if pred is None:
            mask = mask + bit
        else:
            mask = mask + F.when(
                F.coalesce(F.expr(pred), F.lit(False)), bit
            ).otherwise(F.lit(0).cast("long"))

    part_field = events.schema[partition_col]
    out_schema = T.StructType([part_field] + MATCH_SCHEMA_FIELDS)

    def _emit(key, ts_us, n_matches, matches):
        return pd.DataFrame({
            partition_col: [key] * len(matches),
            "match_number": [n_matches + i + 1 for i in range(len(matches))],
            "start_ts": [pd.Timestamp(ts_us[st], unit="us")
                         for st, _en, _b in matches],
            "end_ts": [pd.Timestamp(ts_us[en - 1], unit="us")
                       for _st, en, _b in matches],
            "n_rows": [en - st for st, en, _b in matches],
        })

    def fn(key, pdfs, state):
        pk = key[0]
        if state.hasTimedOut:
            ts_us, masks, _keys, n_matches = state.get
            state.remove()
            if ts_us:
                # the stream went quiet past the buffer: everything is
                # final, frontier-ending matches included
                matches = find_matches(ast, list(masks))
                if matches:
                    yield _emit(pk, list(ts_us), n_matches, matches)
            return
        buf_ts, buf_mask, buf_key, n_matches = (
            list(state.get[0]), list(state.get[1]), list(state.get[2]),
            state.get[3]) if state.exists else ([], [], [], 0)
        new = pd.concat(list(pdfs))
        if len(new):
            # sort by (ts, key) — the batch operator's ORDER BY; the
            # mask rides along OUTSIDE the sort key (same-ts rows must
            # not order by mask value). Python's sort is stable, so
            # exact (ts, key) ties keep buffer-then-arrival order.
            merged = sorted(
                zip(buf_ts, buf_key, buf_mask),
                key=lambda r: (r[0], r[1])) + sorted(
                zip((new["ts"].astype("int64") // 1000).tolist(),
                    new["__key"].astype("int64").tolist(),
                    new["__mask"].astype("int64").tolist()),
                key=lambda r: (r[0], r[1]))
            merged.sort(key=lambda r: (r[0], r[1]))
            buf_ts = [t for t, _k, _m in merged]
            buf_key = [k for _t, k, _m in merged]
            buf_mask = [m for _t, _k, m in merged]
        if len(buf_ts) > max_buffer:
            buf_ts = buf_ts[-max_buffer:]
            buf_key = buf_key[-max_buffer:]
            buf_mask = buf_mask[-max_buffer:]
        wm_us = state.getCurrentWatermarkMs() * 1000
        n_final = 0
        while n_final < len(buf_ts) and buf_ts[n_final] <= wm_us:
            n_final += 1
        emit = []
        consumed = 0
        if n_final:
            for st, en, bits in find_matches(ast, buf_mask[:n_final]):
                if en < n_final:
                    # cannot extend (a finalized row follows and the
                    # greedy matcher already rejected it) — final
                    emit.append((st, en, bits))
                    consumed = en
                # frontier-ending match: hold; nothing after it can have
                # been consumed either
        if emit:
            out = _emit(pk, buf_ts, n_matches, emit)
            n_matches += len(emit)
            buf_ts = buf_ts[consumed:]
            buf_key = buf_key[consumed:]
            buf_mask = buf_mask[consumed:]
        else:
            out = None
        state.update((buf_ts, buf_mask, buf_key, n_matches))
        if buf_ts:
            # flush when the watermark passes the newest buffered row.
            # Clamped above the CURRENT watermark: when every buffered
            # row is already final (the watermark raced ahead — e.g.
            # another partition's much-newer data advanced it in the
            # same trigger), a timestamp at/below the watermark is an
            # error; wm+1 fires on the next watermark advance instead.
            state.setTimeoutTimestamp(
                max(buf_ts[-1] // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1))
        if out is not None:
            yield out

    # r13 (ADVICE): coalesce the cast — a non-numeric (string) or NULL
    # order column yields SQL NULL, which arrives in pandas as NaN and
    # made astype('int64') raise at runtime; NULL/uncastable values now
    # fall back to 0 (arrival order via the stable sort), matching the
    # column-absent fallback
    key_expr = (F.coalesce(F.col(order_col).cast("long"), F.lit(0))
                if order_col and order_col in events.columns
                else F.lit(0).cast("long"))
    work = (
        events.withWatermark(ts_col, watermark)
        .withColumn("__mask", mask)
        .withColumn("__key", key_expr)
        .select(partition_col, F.col(ts_col).alias("ts"), "__mask", "__key")
    )
    return work.groupBy(partition_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
