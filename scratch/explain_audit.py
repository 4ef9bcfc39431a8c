"""Generate docs/PLANS_r{N}.md: formatted physical plans for headline
queries + automated checks (filter pushdown, broadcast joins, partial
aggregation) — evidence that the declarative plans scale.

A check token prefixed with ``!`` is a NEGATIVE check: the plan must
NOT contain it (e.g. ``!BroadcastNestedLoopJoin`` on blocking-join
paths that would be O(n^2) as a nested loop)."""
import re
import sys

sys.path.insert(0, "/root/repo")

from snowflake_emulator_spark.inventory import REGISTRY  # noqa: E402
from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402

AUDIT = [
    ("q1_pricing_summary", ["PushedFilters", "HashAggregate"]),
    ("q3_shipping_priority", ["BroadcastHashJoin", "PushedFilters", "TakeOrderedAndProject"]),
    ("q5_local_supplier", ["BroadcastHashJoin"]),
    ("q6_revenue_forecast", ["PushedFilters"]),
    ("topk_orders", ["TakeOrderedAndProject"]),
    ("join_left_outer", []),
    ("window_row_number_topn", ["Window"]),
    ("dedup_exact", ["HashAggregate"]),
    # equi-join on (band, hash): AQE broadcasts the small side locally,
    # shuffles it at scale — either way never a nested loop
    ("dedup_minhash_lsh", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # blocking joins must hash/sort-merge, never nested-loop (r1 verdict:
    # the OR-join formulation planned as BroadcastNestedLoopJoin)
    ("dedup_simhash_pairs", ["!BroadcastNestedLoopJoin"]),
    ("embed_near_pairs_lsh", ["!BroadcastNestedLoopJoin"]),
    # deliberate broadcast nested loop: tiny query set x full table
    ("embed_cosine_topk", ["BroadcastNestedLoopJoin"]),
    # multi-dim TPC-H adaptations: dims broadcast around the
    # lineitem/orders backbone, never nested-loop
    ("q7_nation_volume", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    ("q8_market_share", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    ("q9_profit_by_nation", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    ("q14_promo_revenue", ["BroadcastHashJoin", "PushedFilters"]),
    # round-2 additions: date spine joins the PRE-AGGREGATED orders
    # rollup (broadcastable), never raw orders
    ("sf_generator_date_spine", ["BroadcastHashJoin", "HashAggregate"]),
    # chunking is one narrow map stage (orderBy adds only the final
    # presentation sort): explode via Generate, never a join
    ("doc_chunk_windows", ["Generate", "!BroadcastNestedLoopJoin"]),
    # lateral split explodes per-row; must not become a join of any kind
    ("sf_split_to_table", ["Generate", "!BroadcastNestedLoopJoin"]),
    # stratified sample: filter is a map stage feeding partial agg
    ("sample_stratified_hash", ["HashAggregate", "!Exchange hashpartitioning(c_custkey"]),
    # round-2 function batches: scalar batches must stay map-only
    # (pushed scan filter + project, no shuffle beyond the final sort)
    ("sf_codec_hash_funcs", ["PushedFilters", "!BroadcastNestedLoopJoin"]),
    ("sf_bitwise_bool_funcs", ["PushedFilters"]),
    ("sf_datetime_build_funcs", ["PushedFilters"]),
    # regression stats: one partial+final agg pair, no extra shuffle
    ("agg_regression_stats", ["HashAggregate"]),
    # share-of-total: a single window over one partition-key exchange
    ("window_ratio_to_report", ["Window"]),
    ("sf_semistructured_funcs", ["PushedFilters"]),
    # recursion is 25 driver-cheap rows; the customer side joins it
    # broadcast, never shuffling the big table
    ("recursive_cte_buckets", ["BroadcastHashJoin", "!SortMergeJoin"]),
    # TPC-H remainder: subquery decorrelation must plan as hash joins
    # (the correlated scalar in Q2/Q17 becomes an aggregate joined back;
    # EXISTS/NOT EXISTS in Q4/Q21/Q22 become semi/anti hash joins)
    ("q2_min_cost_supplier", ["BroadcastHashJoin", "!CartesianProduct"]),
    ("q4_order_priority", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    ("q11_important_parts", ["HashAggregate", "!CartesianProduct"]),
    ("q13_customer_distribution", ["HashAggregate"]),
    ("q15_top_supplier", ["HashAggregate", "!CartesianProduct"]),
    ("q16_supplier_part_groups", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    ("q17_small_qty_revenue", ["BroadcastHashJoin", "!CartesianProduct"]),
    ("q18_large_volume_customers", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # Q19's OR-of-ANDs must stay an equi-join on partkey with the
    # disjunction as a post-join filter — not degrade to a nested loop
    ("q19_disjunctive_revenue", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    ("q21_waiting_suppliers", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    ("q22_idle_customers", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # decontamination: benchmark gram set broadcast against the corpus
    # gram explosion — never a shuffle of the corpus side for the probe
    ("text_decontaminate", ["BroadcastHashJoin", "!BroadcastNestedLoopJoin"]),
    # multi-resolution rollup: GROUPING SETS must plan as ONE scan +
    # Expand + partial agg + ONE hash exchange (never one job per grain)
    ("events_multires_rollup", ["Expand", "HashAggregate"]),
    # multi-distinct: Expand is DELIBERATE and measured-minimal (one
    # fact scan; shuffle carries only distinct pairs — see the r6 plan
    # note at inventory._AGG_CD; two-pipeline rewrite was 30% slower)
    ("agg_count_distinct", ["Expand", "HashAggregate"]),
    # cohort: first-seen agg joins activity — hash join, no full-table
    # window, no nested loop
    ("events_cohort_retention", ["HashAggregate", "!BroadcastNestedLoopJoin"]),
    # carry-forward gap fill: one Window over one user_id exchange
    ("events_gapfill_carry_forward", ["Window"]),
    # profiler: ONE scan feeding one partial+final aggregate pair
    ("profile_table_columns", ["Aggregate", "Expand"]),
    # lateral flatten: Generate (explode), never a join
    ("sf_lateral_flatten", ["Generate", "!BroadcastNestedLoopJoin"]),
    ("pivot_sql_native", ["HashAggregate", "!BroadcastNestedLoopJoin"]),
    # round-3 additions --------------------------------------------------
    # incremental new-vs-corpus dedup: every tier is an equi-join
    # (digest semi join, band-bucket join, candidate-driven Jaccard) —
    # never a cross/nested-loop anywhere in the plan
    ("dedup_incremental", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # bigram LM scoring: the ~1.4k-row model must come back BROADCAST so
    # the scoring join is map-side against the exploded corpus
    ("text_bigram_logprob", ["BroadcastHashJoin", "!SortMergeJoin"]),
    # centroid distances: centroid + norm tables broadcast; the big
    # exploded vector relation never shuffles for the scoring join
    ("embed_centroid_distances", ["BroadcastHashJoin", "!SortMergeJoin"]),
    # zipf: one (source, tok) agg exchange + one window + final agg
    ("text_zipf_slope", ["Window", "HashAggregate"]),
    # SQL-surface MINHASH agg: k parallel min()s in one partial+final pair
    ("sf_minhash_similarity", ["HashAggregate", "!CartesianProduct"]),
    ("sf_geography_points", ["!CartesianProduct"]),
    # two-level CONDITIONAL_CHANGE_EVENT: both windows share ONE
    # partition-key exchange (lag inner, running sum outer)
    ("sf_conditional_change_event", ["Window"]),
    ("sf_haversine_distance", ["PushedFilters"]),
    ("sf_array_unique_agg_binary", ["Aggregate"]),
    # k-means assignment is a DELIBERATE broadcast cross join (every
    # vector x k centroids, k-row build side — same shape as
    # embed_cosine_topk); must never fall to a non-broadcast cartesian
    ("embed_kmeans_clusters", ["BroadcastNestedLoopJoin", "!SortMergeJoin", "!CartesianProduct"]),
    # sequence packing: ONE window over the shard key + final agg
    ("doc_pack_sequences", ["Window", "HashAggregate"]),
    # incremental-vs-corpus + quality pick composes equi-joins only
    ("dedup_survivors_best_quality", ["!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # BPE token counting stays a map-only projection
    ("text_bpe_token_counts", ["!Exchange hashpartitioning"]),
    ("embed_quantize_int8", ["HashAggregate"]),
    # round-4 corpus family ----------------------------------------------
    # paragraph dedup: segment window + doc reassembly, no joins at all
    ("doc_paragraph_dedup", ["Window", "HashAggregate",
                             "!BroadcastNestedLoopJoin", "!CartesianProduct"]),
    # OOV: the df>=N vocabulary joins the token relation on the token
    # key — hash join (broadcast locally), never nested-loop
    ("text_oov_rate", ["HashAggregate", "!BroadcastNestedLoopJoin",
                       "!CartesianProduct"]),
    # token budget: ONE window over the source partition, map filter
    ("sample_token_budget", ["Window", "!Exchange hashpartitioning(doc_id"]),
    # source overlap: equi-join on the shingle key only
    ("source_overlap_jaccard", ["HashAggregate", "!BroadcastNestedLoopJoin",
                                "!CartesianProduct"]),
    # r10 additions -------------------------------------------------------
    # overlapping-DEFINE MATCH_RECOGNIZE: ONE block Arrow pass
    # (MapInPandas over the partition-key exchange + JVM sort, r16);
    # the bitmask is computed JVM-side, never a join
    ("sql_match_recognize_overlap", ["MapInPandas",
                                     "!BroadcastNestedLoopJoin",
                                     "!CartesianProduct"]),
    # CONNECT BY path/root/prior: recursive CTE — each round joins the
    # child scan to the small frontier, never a cross product
    ("hierarchy_connect_by_path", ["!BroadcastNestedLoopJoin",
                                   "!CartesianProduct"]),
    # r11 additions --------------------------------------------------------
    # exact-substring dedup: anchor df-filter + candidate join are
    # equi-joins on the int64 gram hash; span merge is ONE doc-keyed
    # window; splice is an aggregate HOF projection — no nested loop
    ("doc_substring_dedup", ["Window", "HashAggregate",
                             "!BroadcastNestedLoopJoin",
                             "!CartesianProduct"]),
    # PNG decode: two chained Arrow map passes (encode fixture +
    # decode/features), no join, no shuffle before the final sort
    ("multimodal_png_features", ["MapInPandas",
                                 "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
    # curriculum ordinal (r11 rewrite): the range-partitioned sort is
    # materialized behind a localCheckpoint (monotonic ids + sampled
    # boundaries are only stable on a materialized frame), so the final
    # plan reads the checkpoint RDD — and must contain NO window at all
    # (the pre-r11 shape was a single-partition global Window)
    ("sample_curriculum_interleave", ["Scan ExistingRDD", "!Window",
                                      "!BroadcastNestedLoopJoin"]),
    # skip-to / symbol-measure MATCH_RECOGNIZE: same single block
    # Arrow pass as the overlap entry
    ("sql_match_recognize_skip_to", ["MapInPandas",
                                     "!BroadcastNestedLoopJoin",
                                     "!CartesianProduct"]),
    # r13 additions --------------------------------------------------------
    # SUBSET union symbols: still ONE block Arrow pass — subsets are
    # resolved to bitsets before the kernel ships
    ("sql_match_recognize_subset", ["MapInPandas",
                                    "!BroadcastNestedLoopJoin",
                                    "!CartesianProduct"]),
    # trained PQ: the final plan is encode (broadcast per-sub centroid
    # arrays, per-row argmin — no row multiplication) + ADC broadcast
    # join + window top-k; training ran as separate tiny jobs. Never a
    # cartesian; the corpus-side joins must all be broadcast
    ("embed_pq_topk", ["BroadcastHashJoin", "!CartesianProduct",
                       "!SortMergeJoin", "!BroadcastNestedLoopJoin"]),
    # trained IVF-PQ: coarse assign is one Arrow pass; everything else
    # as embed_pq_topk
    ("embed_ivfpq_topk", ["MapInPandas", "BroadcastHashJoin",
                          "!CartesianProduct", "!SortMergeJoin",
                          "!BroadcastNestedLoopJoin"]),
    # E-S weighted sampling: distributed top-k (per-task heaps), never
    # a corpus-wide hash exchange; the rank window sees only k rows
    ("sample_weighted_topk", ["TakeOrderedAndProject",
                              "!Exchange hashpartitioning"]),
    # r14 additions --------------------------------------------------------
    # per-source top-quantile (r14 rewrite): the range-partitioned sort
    # is materialized behind a localCheckpoint and exact ranks come from
    # a broadcast prefix-offset lookup — the plan must contain NO window
    # at all (the r13 shape was a per-group single-partition sort) and
    # the lookup join must be broadcast
    ("doc_top_quantile_filter", ["Scan ExistingRDD", "BroadcastHashJoin",
                                 "!Window", "!SortMergeJoin"]),
    # JPEG decode: same shape as the PNG path — two chained Arrow map
    # passes (encode fixture + decode/features), no join, no shuffle
    # before the final sort
    ("multimodal_jpeg_features", ["MapInPandas",
                                  "!BroadcastNestedLoopJoin",
                                  "!Exchange hashpartitioning"]),
    # WAV decode: same two-Arrow-map shape as the image paths
    ("multimodal_wav_features", ["MapInPandas",
                                 "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
    # GIF decode: same two-Arrow-map shape
    ("multimodal_gif_features", ["MapInPandas",
                                 "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
    # WARC extraction: two chained Arrow maps (synth + parse), no
    # shuffle before the final sort
    ("warc_extract_records", ["MapInPandas",
                              "!BroadcastNestedLoopJoin",
                              "!Exchange hashpartitioning"]),
    # HTML->text: one pure-JVM codegen projection — NO Python at all
    ("doc_html_extract", ["PushedFilters", "!MapInPandas",
                          "!BatchEvalPython", "!ArrowEvalPython",
                          "!Exchange hashpartitioning"]),
    # TAR extraction: same two-Arrow-map container shape as WARC
    ("tar_extract_members", ["MapInPandas",
                             "!BroadcastNestedLoopJoin",
                             "!Exchange hashpartitioning"]),
    # ingest capstone: Arrow maps (warc synth + parse) feeding pure-JVM
    # extraction/scoring; ONE hash exchange for the per-source rollup,
    # no joins anywhere
    ("pipeline_warc_ingest", ["MapInPandas", "HashAggregate",
                              "!BroadcastNestedLoopJoin",
                              "!SortMergeJoin", "!CartesianProduct"]),
    # temperature resampler: rank machinery = checkpointed range
    # partition (no per-group window sort), factor table broadcast,
    # repeat = Generate. The one BroadcastNestedLoopJoin inside is the
    # DELIBERATE |sources|-row x 1-row totals cross in
    # temperature_weights (both sides tiny aggregates) — so the
    # negative check here is CartesianProduct, not BNLJ
    ("sample_temperature_resample", ["Scan ExistingRDD",
                                     "BroadcastHashJoin", "Generate",
                                     "!Window", "!SortMergeJoin",
                                     "!CartesianProduct"]),
    # r15 mixed-format media: four Arrow-map synth branches UNIONed
    # into one Arrow-map decode kernel — no join, no hash exchange
    # before the final presentation sort
    ("multimodal_mixed_features", ["MapInPandas", "Union",
                                   "!BroadcastNestedLoopJoin",
                                   "!SortMergeJoin",
                                   "!Exchange hashpartitioning"]),
    # r15 full-pipeline capstone: Arrow maps (warc synth/parse) ->
    # JVM extraction -> banded dedup joins -> broadcast rank lookup ->
    # Generate repeat -> one packing window. The rank machinery's
    # localCheckpoint truncates lineage, so the FINAL plan shows Scan
    # ExistingRDD (the upstream Arrow maps are in earlier jobs, not
    # this string); the one BroadcastNestedLoopJoin is the DELIBERATE
    # |sources|-row x 1-row totals cross in temperature_weights (same
    # as sample_temperature_resample's audit note) — so the negative
    # check is CartesianProduct
    ("pipeline_crawl_to_corpus", ["Scan ExistingRDD", "Generate",
                                  "BroadcastHashJoin", "Window",
                                  "!CartesianProduct"]),
    # r16 additions --------------------------------------------------------
    # MPEG header walk: two chained Arrow maps (synth + media_features
    # kernel), no join, no shuffle before the final sort — same shape
    # as the other codec paths
    ("multimodal_mpeg_headers", ["MapInPandas", "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
    # mixed WAV/AU/AIFF kernel: same two-Arrow-map shape
    ("multimodal_audio_containers", ["MapInPandas",
                                     "!BroadcastNestedLoopJoin",
                                     "!Exchange hashpartitioning"]),
    # r16 second half: the five new container kernels share the same
    # two-Arrow-map, shuffle-free shape — embarrassingly parallel per
    # row, the property that makes them 100 TB-safe
    ("multimodal_ico_features", ["MapInPandas", "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
    ("multimodal_mp4_headers", ["MapInPandas", "!BroadcastNestedLoopJoin",
                                "!Exchange hashpartitioning"]),
    ("multimodal_tiff_features", ["MapInPandas", "!BroadcastNestedLoopJoin",
                                  "!Exchange hashpartitioning"]),
    ("multimodal_flac_ogg_headers", ["MapInPandas",
                                     "!BroadcastNestedLoopJoin",
                                     "!Exchange hashpartitioning"]),
    ("multimodal_webp_headers", ["MapInPandas", "!BroadcastNestedLoopJoin",
                                 "!Exchange hashpartitioning"]),
]


def _plan(df) -> str:
    if hasattr(df._sc._jvm, "PythonSQLUtils"):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def audit_benched_plans(spark, sf) -> list[str]:
    """r3 verdict: audit the BENCHED plan — bench.py's
    xxhash64-of-all-columns evaluation — not the raw DataFrame. No
    headline query may column-prune its own computation down to an
    empty-schema scan (.count() did exactly that to map-only queries:
    FileScan parquet [] ReadSchema: struct<>)."""
    from pyspark.sql import functions as F

    import bench

    lines, bad = [], []
    for name in bench.HEADLINE:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf)
        benched = df.select(F.xxhash64(*df.columns).alias("__h")) \
            .agg(F.bit_xor("__h").alias("__s"))
        plan = _plan(benched)
        empty_scan = "ReadSchema: struct<>" in plan
        if empty_scan:
            bad.append(name)
        verdict = "EMPTY-SCHEMA SCAN (output pruned!)" if empty_scan else "OK: full output evaluated"
        lines.append(f"- `{name}`: {verdict}")
        print("benched", name, "|", verdict, flush=True)
    assert not bad, f"benched plans with pruned output: {bad}"
    return lines


def _round_number() -> int:
    """Current round = latest BENCH_r{N}.json + 1 (the audit runs
    before the driver records this round's bench)."""
    import glob
    import re as _re

    ns = [int(_re.search(r"r(\d+)", p).group(1))
          for p in glob.glob("/root/repo/BENCH_r*.json")]
    return (max(ns) + 1) if ns else 1


def main():
    spark = build_spark(app_name="explain-audit", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.1"
    rnd = _round_number()
    out = [f"# Physical plans (sf0.1) — round {rnd} audit\n"]
    out.append("## Benched-plan check (bench.py evaluation shape)\n")
    out.extend(audit_benched_plans(spark, sf))
    out.append("")
    for name, expect in AUDIT:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf)
        plan = _plan(df)
        checks = []
        for token in expect:
            if token.startswith("!"):
                ok = token[1:] not in plan
                checks.append(f"{'OK' if ok else 'VIOLATION'}: absent {token[1:]}")
            else:
                ok = token in plan
                checks.append(f"{'OK' if ok else 'MISSING'}: {token}")
        # trim per-column detail sections for readability
        head = plan.split("\n\n")[0]
        out.append(f"## {name}\n")
        if checks:
            out.append("Checks: " + "; ".join(checks) + "\n")
        out.append("```\n" + head.strip()[:4000] + "\n```\n")
        print(name, "|", "; ".join(checks) if checks else "(no checks)", flush=True)
    with open(f"/root/repo/docs/PLANS_r{rnd}.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
