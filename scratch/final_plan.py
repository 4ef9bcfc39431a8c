import sys
sys.path.insert(0, "/root/repo")
from snowflake_emulator_spark.inventory import REGISTRY
from snowflake_emulator_spark.session_factory import build_spark
from pyspark.sql import functions as F
import time

spark = build_spark(app_name="final-plan")
name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
fn, _ = REGISTRY[name]
df = fn(spark, sf_dir)
t0 = time.time()
df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
print("elapsed", round(time.time() - t0, 3))
print(df._jdf.queryExecution().executedPlan().toString()[:4000])
spark.stop()
