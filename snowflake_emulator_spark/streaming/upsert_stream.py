"""Streaming upsert sink: continuous MERGE of a stream into an engine
table (beyond-reference; the reference supports no streams).

The standard lakehouse CDC-apply pattern — ``foreachBatch`` hands each
micro-batch to the engine's MERGE INTO, which compiles the WHEN-clause
semantics into one full-outer-join job against the current table
version and swaps in the next immutable version atomically. Per batch:

* dedup the batch to its LAST record per key (a micro-batch can carry
  several updates for one key; MERGE demands one source row per target
  row) — window over the batch only, never the table;
* MERGE: one shuffle on the key, broadcast if the batch is small.

Exactly-once: Spark replays a failed batch; MERGE is idempotent for
same-key re-application (same rows upsert to the same state), so a
replayed batch converges rather than duplicating — the same contract
Delta/Iceberg streaming upserts rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_writer(engine, table: str, key_cols: list[str], order_col: str):
    """Build a ``foreachBatch`` function applying each micro-batch to
    ``table`` via the engine's MERGE INTO.

    ``order_col`` breaks intra-batch ties: the latest record per key
    wins (event-time, ingestion offset, …).
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # isEmpty, not columns: a foreachBatch DataFrame always carries
        # its schema's columns, so the old guard never fired and every
        # idle trigger paid a window + MERGE for zero rows
        if batch.isEmpty():
            return
        w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # foreachBatch runs against a CLONED micro-batch session; a
        # plain temp view there is invisible to the engine's session.
        # A GLOBAL temp view lives in the shared global_temp database
        # across all sessions of the SparkContext — the standard bridge.
        # table identity + uuid in the view name: two concurrent upsert
        # streams both start at batch_id 0 — a shared name let stream B
        # replace the view between A's registration and A's MERGE
        import re as _re
        import uuid as _uuid

        view = (f"__upsert_{_re.sub('[^A-Za-z0-9_]', '_', table)}"
                f"_{batch_id}_{_uuid.uuid4().hex[:8]}")
        latest.createOrReplaceGlobalTempView(view)
        on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
        non_keys = [c for c in latest.columns if c not in key_cols]
        cols = ", ".join(latest.columns)
        vals = ", ".join(f"s.{c}" for c in latest.columns)
        # keys-only streams have nothing to update: an empty
        # 'UPDATE SET ' clause is a parse error — omit WHEN MATCHED
        matched = (
            "WHEN MATCHED THEN UPDATE SET "
            + ", ".join(f"{c} = s.{c}" for c in non_keys) + " "
            if non_keys else ""
        )
        try:
            engine.execute(
                f"MERGE INTO {table} t USING global_temp.{view} s ON {on} "
                f"{matched}"
                f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
            )
        finally:
            batch.sparkSession.catalog.dropGlobalTempView(view)

    return apply_batch


def run_upsert_stream(stream: DataFrame, engine, table: str, key_cols: list[str],
                      order_col: str, timeout_s: int = 120) -> None:
    """Drive the stream to completion (availableNow) through the upsert
    sink — used by tests and batch-backfill jobs; a live pipeline would
    use ``trigger(processingTime=...)`` instead."""
    q = (
        stream.writeStream.foreachBatch(upsert_writer(engine, table, key_cols, order_col))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    q.stop()
    if not finished:
        # a silent stop() here truncated the upsert while the caller
        # believed the backfill completed
        raise TimeoutError(
            f"upsert stream did not finish within {timeout_s}s; "
            f"remaining micro-batches were NOT applied")
