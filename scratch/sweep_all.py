"""Time every REGISTRY entry (Spark side only): 2 reps, min. One line per entry."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from snowflake_emulator_spark.inventory import REGISTRY, load_views
from snowflake_emulator_spark.session_factory import build_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = build_spark(app_name="sweep-all")
spark.range(1).count()
load_views(spark, sf_dir)
spark.sql("SELECT count(*), sum(l_quantity), max(length(l_returnflag)) FROM lineitem").collect()
spark.sql("SELECT max(length(text)) FROM documents").collect()
spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
spark.sql("SELECT max(length(props)) FROM events").collect()
def _wb(b):
    for pdf in b: yield pdf
spark.range(10000).repartition(32).mapInPandas(_wb, "id long").count()
spark.sql("SELECT max(md5(regexp_replace(CAST(id AS STRING), '[0-9]+', 'x'))) FROM range(100000)").collect()

for name in REGISTRY:
    fn, _ = REGISTRY[name]
    best = None
    err = None
    for rep in range(2):
        try:
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()
            el = round(time.time() - t0, 3)
            best = el if best is None or el < best else best
        except Exception as e:
            err = repr(e)[:120]
            break
    if err:
        print(f"TIME {name}: ERROR {err}", flush=True)
    else:
        print(f"TIME {name}: {best}", flush=True)
spark.stop()
