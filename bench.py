"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowflake_emulator_spark.inventory import REGISTRY  # noqa: E402
from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402

# Python-stage queries (mapInPandas/applyInPandas) run first, directly
# after the worker-fleet warm-up: a Python stage issued after a long
# stretch of JVM-only queries intermittently hits a ~30 s stall on this
# box (worker-pool re-establishment), which is measurement noise, not
# operator cost. Order carries no semantic weight.
HEADLINE = [
    "embed_cosine_topk",
    "embed_near_pairs_lsh",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q10_returned_items",
    "topk_orders",
    "agg_cube",
    "agg_count_distinct",
    "window_row_number_topn",
    "events_hourly_agg",
    "events_sessionize",
    "sf_dateadd_datediff",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "text_language_id",
    # r17 ADDITIONS-ONLY extension (VERDICT r16 item 1): the r16 round
    # optimized ~29 registry entries but only ONE of them was in the
    # benched set above, so the driver bench could not see the work.
    # These six make the optimized heavy families driver-visible:
    # MATCH_RECOGNIZE block execution, trained PQ, simhash pigeonhole,
    # DSIR bigram-LM weights, the LSH->Jaccard dedup pipeline, and the
    # crawl->corpus capstone. Nothing above is removed or renamed; the
    # timing methodology (min-of-3 + adaptive rep, xxhash64 full-output
    # evaluation, interleaved floor probes) is unchanged. The two
    # Python-stage entries lead the block (same rationale as the
    # ordering note above; the warm-up already spun the worker fleet).
    "events_match_recognize_funnel",
    "embed_pq_topk",
    "dedup_simhash_pairs",
    "text_dsir_weights",
    "dedup_lsh_jaccard_pipeline",
    "pipeline_crawl_to_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = build_spark(app_name="snowemu-bench")
    # warm the JVM, codegen paths and parquet footers so the first
    # measured query doesn't pay one-time session costs
    from snowflake_emulator_spark.inventory import load_views

    spark.range(1).count()
    load_views(spark, sf_dir)
    # data warm-up touches the wide columns' data pages (a bare
    # count(*) is answered from parquet footers, leaving the first
    # text/vector-scanning query to absorb all cold-read I/O — a
    # 10-20x swing that measures scan order, not plan quality).
    # max(length(..)) is generic: no measured query computes it.
    spark.sql("SELECT count(*), sum(l_quantity), max(length(l_returnflag)) FROM lineitem").collect()
    spark.sql("SELECT max(length(text)) FROM documents").collect()
    spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
    spark.sql("SELECT max(length(o_orderpriority)) FROM orders").collect()
    spark.sql("SELECT max(length(props)) FROM events").collect()
    # spin up the Python worker fleet + Arrow path once (first pandas
    # UDF otherwise pays ~15s of worker startup inside a measured query)
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s * 1.0, "double")
    spark.range(10000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select(_warm(F.col("id").cast("double"))).count()
    # warm the mapInPandas (Arrow iterator) worker path too — synthetic
    # data, trivial function, nothing a measured query computes
    def _warm_batches(batches):
        for pdf in batches:
            yield pdf

    spark.range(10000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .mapInPandas(_warm_batches, "id long").count()
    # JIT-warm the regexp + md5 intrinsics generically (synthetic data;
    # the first regexp_replace/md5-heavy query otherwise pays several
    # seconds of JVM JIT inside its measured time)
    spark.sql(
        "SELECT max(md5(regexp_replace(CAST(id AS STRING), '[0-9]+', 'x'))) FROM range(100000)"
    ).collect()
    # JIT-warm the interpreted higher-order-function path GENERICALLY
    # (synthetic data + a different fold than any measured query — the
    # bench must not rehearse what it measures)
    spark.sql(
        "SELECT max(aggregate(zip_with(sequence(1, 32), sequence(1, 32), (x, y) -> "
        "CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)) "
        "FROM range(1000)"
    ).collect()
    # Best-of-3 per query: this box shows bursty hypervisor CPU steal
    # (~26% of cumulative user time), which randomly inflates whichever
    # query a throttle burst lands on by 5-15x. The min of three spaced
    # runs measures the plan, not the neighbor; every run executes the
    # full query (no caching between them — these are fresh DataFrames
    # over the same warm OS page cache any run would see).
    times: dict[str, float] = {}

    def evaluate_full(df) -> None:
        # Full-output evaluation (r3 verdict fix): .count() let Catalyst
        # column-prune everything above the count, so a map-only query
        # benched an empty-schema scan (ReadSchema: struct<>). Hashing
        # EVERY output column into one aggregate forces the whole
        # computation to run JVM-side while keeping driver transfer to
        # a single row.
        df.select(F.xxhash64(*df.columns).alias("__h")) \
            .agg(F.bit_xor("__h").alias("__s")).collect()

    def run_once(name: str) -> None:
        fn, _oracle = REGISTRY[name]
        t0 = time.time()
        evaluate_full(fn(spark, sf_dir))
        elapsed = round(time.time() - t0, 3)
        if name not in times or elapsed < times[name]:
            times[name] = elapsed

    # floor probes are INTERLEAVED through the suite (r15, VERDICT
    # order #5): the single up-front min-of-5 probe had ~25% day-to-day
    # spread on this box, and dividing the total by it made the
    # normalized series noisier than the signal (r14 recorded "worst
    # ever" on a raw-flat round). A trivial one-row aggregation over an
    # already-loaded view — job scheduling + task launch + collect, no
    # data-dependent work — sampled throughout the run, summarized by
    # the MEDIAN, with every probe recorded in the JSON.
    floor_probes: list[float] = []

    def probe_floor() -> None:
        t0 = time.time()
        spark.sql("SELECT count(*) AS n FROM region").count()
        floor_probes.append(round(time.time() - t0, 3))

    probe_floor()
    for attempt in range(3):
        for i, name in enumerate(HEADLINE):
            run_once(name)
            if i % 6 == 5:
                probe_floor()
    # adaptive fourth pass: a steal burst can span several timed runs
    # of a query; anything still slow gets one more chance spaced in
    # time (threshold lowered 2.0 -> 1.2 s in r4: under full-output
    # evaluation more queries sit just above the old bar)
    for name in HEADLINE:
        if times[name] > 1.2:
            run_once(name)
    probe_floor()
    total = round(sum(times.values()), 3)
    # secondary scale factor: the same queries at sf0.01 separate the
    # fixed local-mode Spark floor (~0.2-0.5 s/query regardless of data)
    # from data-dependent cost — a query whose sf0.1/sf0.01 ratio is
    # superlinear (>10x) has a scaling bug, one near 1x is floor-bound.
    secondary: dict[str, float] = {}
    sec_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SECONDARY", "/root/testdata/sf0.01")
    if os.path.isdir(sec_dir) and sec_dir != sf_dir:
        load_views(spark, sec_dir)
        for attempt in range(2):
            for name in HEADLINE:
                fn, _oracle = REGISTRY[name]
                t0 = time.time()
                evaluate_full(fn(spark, sec_dir))
                elapsed = round(time.time() - t0, 3)
                if name not in secondary or elapsed < secondary[name]:
                    secondary[name] = elapsed
    import statistics

    floor = round(statistics.median(floor_probes), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "spark_floor_per_query": floor,
        "floor_probes": floor_probes,
        "floor_aggregation":
            f"median of {len(floor_probes)} probes interleaved "
            "through the primary suite",
        # box-noise-invariant round-over-round signal (r8, VERDICT r7
        # item 7): raw totals moved +25% r6->r7 purely because the
        # measured floor moved +29% on a busier box. total / floor is
        # dimensionless "floor units".
        "value_floor_normalized": round(total / floor, 1) if floor else None,
        # r15: the DIVISION amplifies floor noise (totals are compute-
        # bound, the floor is scheduling-latency-bound — they respond
        # to box state differently; r15 quiet triplet: normalized
        # spread 24%, subtracted spread 2.4%). total - n_queries*floor
        # approximates the data-dependent cost; compare THIS across
        # rounds.
        "value_data_dependent":
            round(total - len(HEADLINE) * floor, 3) if floor else None,
        "queries": times,
        "runs_per_query": "3 (+1 adaptive if min > 1.2s)",
        "aggregation": "min",
        # methodology change vs r1-r3 (which timed .count() — Catalyst
        # pruned map-only queries to an empty-schema scan): every query
        # now evaluates its FULL output via xxhash64-of-all-columns bit_xor
        "evaluation": "xxhash64(all columns) -> bit_xor, single-row collect",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "secondary_sf": 0.01,
        "secondary_queries": secondary,
        "secondary_total": round(sum(secondary.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
