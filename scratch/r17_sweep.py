"""r17 sweep timer: bench-methodology timing (xxhash64 -> bit_xor full-output
evaluation, min of N reps) for a named list of registry entries.

Usage: python scratch/r17_sweep.py <sf_dir> <reps> <entry> [<entry> ...]
Prints one JSON line per entry: {"entry": ..., "reps": [...], "min": ..., "median": ...}
Interleaved floor probes (1-row agg over region) are printed too so box
state is visible alongside every number.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_emulator_spark.inventory import REGISTRY, load_views  # noqa: E402
from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = build_spark(app_name="r17-sweep")
    spark.range(1).count()
    load_views(spark, sf_dir)
    # same warm-ups as bench.py (worker fleet, HOF, regexp/md5 JIT)
    spark.sql("SELECT count(*), sum(l_quantity), max(length(l_returnflag)) FROM lineitem").collect()
    spark.sql("SELECT max(length(text)) FROM documents").collect()
    spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
    spark.sql("SELECT max(length(props)) FROM events").collect()
    _warm = F.pandas_udf(lambda s: s * 1.0, "double")
    spark.range(10000).repartition(32).select(_warm(F.col("id").cast("double"))).count()

    def _warm_batches(batches):
        for pdf in batches:
            yield pdf

    spark.range(10000).repartition(32).mapInPandas(_warm_batches, "id long").count()
    spark.sql("SELECT max(md5(regexp_replace(CAST(id AS STRING), '[0-9]+', 'x'))) FROM range(100000)").collect()
    spark.sql(
        "SELECT max(aggregate(zip_with(sequence(1, 32), sequence(1, 32), (x, y) -> "
        "CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)) FROM range(1000)").collect()

    def probe() -> float:
        t0 = time.time()
        spark.sql("SELECT count(*) AS n FROM region").count()
        return round(time.time() - t0, 3)

    def evaluate_full(df) -> None:
        df.select(F.xxhash64(*df.columns).alias("__h")).agg(
            F.bit_xor("__h").alias("__s")).collect()

    print(json.dumps({"floor_start": probe()}), flush=True)
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"r17sweep:{name}")
        rts = []
        for _ in range(reps):
            t0 = time.time()
            evaluate_full(fn(spark, sf_dir))
            rts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "entry": name, "reps": rts, "min": min(rts),
            "median": round(statistics.median(rts), 3),
            "floor": probe()}), flush=True)
    print(json.dumps({"floor_end": probe()}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
