"""r17 job/stage counting probe (guide §1): how many Spark jobs does each
phase of the iterative operators actually run? Uses job groups + the
status tracker so the counts are the scheduler's own.

Usage: python scratch/r17_jobs.py <sf_dir>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_emulator_spark.inventory import REGISTRY, load_views  # noqa: E402
from snowflake_emulator_spark.session_factory import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = build_spark(app_name="r17-jobs")
    sc = spark.sparkContext
    load_views(spark, sf_dir)
    spark.sql("SELECT max(size(embedding)) FROM embeddings").collect()
    spark.sql("SELECT max(length(text)) FROM documents").collect()

    def run(name: str) -> None:
        fn, _ = REGISTRY[name]
        group = f"jobs:{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        df.select(F.xxhash64(*df.columns).alias("__h")).agg(
            F.bit_xor("__h").alias("__s")).collect()
        t_total = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        n_stages = 0
        for j in jobs:
            info = sc.statusTracker().getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        print(f"{name}: jobs={len(jobs)} stages={n_stages} "
              f"build={t_build:.2f}s total={t_total:.2f}s", flush=True)

    for name in sys.argv[2:]:
        run(name)
    spark.stop()


if __name__ == "__main__":
    main()
