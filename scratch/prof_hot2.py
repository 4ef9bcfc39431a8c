import sys, time
sys.path.insert(0, "/root/repo")
from snowflake_emulator_spark.session_factory import build_spark
from snowflake_emulator_spark.inventory import REGISTRY

spark = build_spark(app_name="prof_hot2")
spark.range(1).count()
SF = "/root/testdata/sf0.1"
for name in ["embed_near_pairs_lsh", "ann_ivf_topk", "embed_cosine_topk", "dedup_minhash_lsh", "text_language_id"]:
    t0=time.time(); n=REGISTRY[name][0](spark, SF).count(); print(f"TIMING {name}:", n, round(time.time()-t0,2), flush=True)
spark.stop()
