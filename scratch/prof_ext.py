"""Sequential profiler for extension operators at a given SF dir."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from snowflake_emulator_spark.operators import dedup, similarity  # noqa: E402
from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="prof_ext")
spark.range(1).count()
d = spark.read.parquet(f"{SF}/documents.parquet")
e = spark.read.parquet(f"{SF}/embeddings.parquet")
d.count()
e.count()

t0 = time.time(); dedup.minhash_signatures(d).count()
print("TIMING minhash sig:", round(time.time() - t0, 2), flush=True)
t0 = time.time(); n = dedup.minhash_lsh_pairs(d).count()
print("TIMING lsh pairs:", n, round(time.time() - t0, 2), flush=True)
t0 = time.time(); n = dedup.ngram_jaccard_pairs(d, threshold=0.5).count()
print("TIMING jaccard:", n, round(time.time() - t0, 2), flush=True)
t0 = time.time(); n = dedup.simhash(d).count()
print("TIMING simhash:", n, round(time.time() - t0, 2), flush=True)
t0 = time.time(); n = similarity.cosine_near_pairs(e, 0.55, 64, 4).count()
print("TIMING near_pairs_lsh:", n, round(time.time() - t0, 2), flush=True)
t0 = time.time(); n = similarity.cosine_near_pairs(e, 0.55, 64, 4).count()
print("TIMING near_pairs_lsh 2nd:", n, round(time.time() - t0, 2), flush=True)
spark.stop()
