#!/bin/bash
# r17 FINAL measurement battery (post changes 14-15). Waits for quiet
# box weather (scheduling floor < 0.13 s median), then runs: 2x full
# extended bench at HEAD, plus a bench-methodology sweep of the entries
# whose code changed after the previous battery (the jaccard prefilter
# + incremental checkpoints family).
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
for i in $(seq 1 40); do
  f=$(probe_floor | tail -1)
  echo "$(date +%H:%M:%S) floor_median=$f"
  ok=$(python -c "print(1 if float('$f' or 9) < 0.13 else 0)")
  [ "$ok" = "1" ] && break
  sleep 120
done
echo "=== weather ok (floor $f), starting battery ==="

echo "=== bench final run 2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py 2>/dev/null | tail -1 > scratch/bench_r17_final2.json
echo "=== bench final run 3 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  python bench.py 2>/dev/null | tail -1 > scratch/bench_r17_final3.json

echo "=== changed-entry sweep ==="
python scratch/r17_sweep.py /root/testdata/sf0.1 3 \
  dedup_lsh_jaccard_pipeline dedup_ngram_jaccard dedup_incremental \
  pipeline_crawl_to_corpus dedup_clusters pipeline_keep_set \
  2>/dev/null > scratch/r17_sweep_final.jsonl
echo "=== battery complete ==="
