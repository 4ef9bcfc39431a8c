import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.session_factory import build_spark
from snowflake_emulator_spark.inventory import REGISTRY
from snowflake_emulator_spark.operators import textstats

spark = build_spark(app_name="prof_hot")
spark.range(1).count()
SF = "/root/testdata/sf0.1"
d = spark.read.parquet(f"{SF}/documents.parquet"); d.count()

# language-id: scores-only vs full
scores = textstats.language_scores(F.col("text"))
proj = d.select("lang", *[sc.alias(f"s_{l}") for l, sc in scores.items()])
t0=time.time(); proj.agg(F.sum("s_en")).collect(); print("TIMING langid scores only:", round(time.time()-t0,2), flush=True)
t0=time.time(); n=REGISTRY["text_language_id"][0](spark, SF).count(); print("TIMING langid full:", round(time.time()-t0,2), flush=True)
for name in ["embed_cosine_topk", "embed_near_pairs", "text_quality_score", "ann_ivf_topk"]:
    t0=time.time(); n=REGISTRY[name][0](spark, SF).count(); print(f"TIMING {name}:", n, round(time.time()-t0,2), flush=True)
spark.stop()
