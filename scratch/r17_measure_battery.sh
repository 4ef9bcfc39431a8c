#!/bin/bash
# r17 end-of-round measurement battery. Waits for quiet box weather
# (scheduling floor < 0.13 s median), then runs: after-sweep of the 16
# touched entries, 2x full extended bench, c8 bench, PQ 100x scale runs.
cd /root/repo

probe_floor() {
python - <<'EOF' 2>/dev/null
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.session_factory import build_spark
spark = build_spark(app_name="floor-probe")
load_views(spark, "/root/testdata/sf0.1")
spark.sql("SELECT count(*) FROM region").count()
xs = []
for i in range(5):
    t0 = time.time(); spark.sql("SELECT count(*) FROM region").count()
    xs.append(time.time()-t0); time.sleep(0.5)
print(round(statistics.median(xs), 3))
spark.stop()
EOF
}

echo "=== waiting for quiet weather ==="
for i in $(seq 1 60); do
  f=$(probe_floor | tail -1)
  echo "$(date +%H:%M:%S) floor_median=$f"
  ok=$(python -c "print(1 if float('$f' or 9) < 0.13 else 0)")
  [ "$ok" = "1" ] && break
  sleep 180
done
echo "=== weather ok (floor $f), starting battery ==="

echo "=== after-sweep (16 touched entries) ==="
python scratch/r17_sweep.py /root/testdata/sf0.1 3 \
  events_match_recognize_funnel embed_pq_topk dedup_simhash_pairs \
  text_dsir_weights dedup_lsh_jaccard_pipeline pipeline_crawl_to_corpus \
  embed_near_pairs embed_lsh_recall embed_semantic_survivors \
  embed_ivfpq_topk dedup_ngram_jaccard dedup_clusters dedup_survivors \
  pipeline_keep_set text_bpe_train_merges text_bpe_encode_counts \
  2>/dev/null > scratch/r17_sweep_after.jsonl
echo "sweep done rc=$?"

echo "=== bench after run 1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py 2>/dev/null | tail -1 > scratch/bench_r17_after1.json
echo "=== bench after run 2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py 2>/dev/null | tail -1 > scratch/bench_r17_after2.json
echo "=== bench after c8 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  python bench.py 2>/dev/null | tail -1 > scratch/bench_r17_after_c8.json

echo "=== PQ 100x scale c32 ==="
SPARK_GRAFT_CPUS=32 python scratch/r17_sweep.py /tmp/r17_scale100 2 \
  embed_pq_topk 2>/dev/null > scratch/r17_scale100_after_c32.jsonl
echo "=== PQ 100x scale c8 ==="
SPARK_GRAFT_CPUS=8 python scratch/r17_sweep.py /tmp/r17_scale100 2 \
  embed_pq_topk 2>/dev/null > scratch/r17_scale100_after_c8.jsonl
echo "=== battery complete ==="
