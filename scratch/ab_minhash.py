"""Interleaved A/B of minhash_lsh_pairs join strategies in one session."""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators.dedup import minhash_signatures, _banded_signature
from snowflake_emulator_spark.session_factory import build_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = build_spark(app_name="ab-minhash")
spark.range(1).count()
load_views(spark, sf_dir)
spark.sql("SELECT max(length(text)) FROM documents").collect()
spark.sql("SELECT max(md5(regexp_replace(CAST(id AS STRING), '[0-9]+', 'x'))) FROM range(100000)").collect()

def pairs_df(strategy):
    d = spark.table("documents")
    sig = minhash_signatures(d, "text", "doc_id", 16, 5)
    banded = _banded_signature(sig, "doc_id", 16, 4)
    left, right = banded.alias("l"), banded.alias("r")
    if strategy == "shuffle_hash":
        right = right.hint("SHUFFLE_HASH")
    elif strategy == "merge":
        right = right.hint("MERGE")
    p = (left.join(right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")))
         .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
         .distinct()).orderBy("id_a", "id_b")
    return p

def run(strategy):
    t0 = time.time()
    df = pairs_df(strategy)
    df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
    return round(time.time() - t0, 3)

res = {s: [] for s in ["broadcast", "shuffle_hash", "merge"]}
for rep in range(5):
    for s in res:
        spark.sparkContext.setJobDescription(f"minhash {s} #{rep}")
        res[s].append(run(s))
for s, ts in res.items():
    print(f"RESULT {s}: min={min(ts)} med={statistics.median(ts)} all={ts}", flush=True)
spark.stop()
