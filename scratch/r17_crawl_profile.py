"""r17 profile: pipeline_crawl_to_corpus stage decomposition (guide §1).
Times cumulative prefixes of the capstone so the per-stage increments
are visible: WARC synth+parse, HTML->text, exact dedup, near-dup
components, quantile filter, resample+pack. Each prefix evaluated
bench-style. Usage: python scratch/r17_crawl_profile.py [reps]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from snowflake_emulator_spark.inventory import (_html_shell, load_views)
from snowflake_emulator_spark.operators import corpus as corpus_ops
from snowflake_emulator_spark.operators import dedup, mixture, textstats
from snowflake_emulator_spark.session_factory import build_spark
from snowflake_emulator_spark.sources import warc as warcmod

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = "/root/testdata/sf0.1"

spark = build_spark(app_name="crawl-profile")
sc = spark.sparkContext
load_views(spark, SF)
spark.sql("SELECT max(length(text)) FROM documents").collect()


def evaluate(df):
    df.select(F.xxhash64(*df.columns).alias("__h")).agg(
        F.bit_xor("__h").alias("__s")).collect()


def stage_frames():
    d = spark.table("documents").filter("doc_id % 7 = 3").select(
        "doc_id", "source", "text")
    files = warcmod.synth_warc_docs(d, _html_shell)
    recs = warcmod.warc_records(files).filter(
        (F.col("warc_type") == "response") & F.col("parse_ok"))
    txt = textstats.html_to_text(F.col("body").cast("string"))
    cdocs = recs.select(
        F.regexp_extract("target_uri", r"\.test/([0-9]+)$", 1)
        .cast("bigint").alias("doc_id"),
        F.regexp_extract("target_uri", r"http://([^.]+)\.test/", 1)
        .alias("source"),
        txt.alias("text"))
    fp_w = Window.partitionBy("fp").orderBy("doc_id")
    exact = (
        cdocs.withColumn("fp", F.md5(dedup.normalized_text(F.col("text"))))
        .withColumn("__rn", F.row_number().over(fp_w))
        .filter(F.col("__rn") == 1).drop("fp", "__rn"))
    comps = dedup.cluster_components(
        exact, num_perm=16, bands=4, shingle=5, threshold=0.5)
    removals = (comps.filter(F.col("node") != F.col("comp"))
                .select(F.col("node").alias("doc_id")).distinct())
    surv = exact.join(removals, "doc_id", "left_anti")
    scored = surv.select(
        "doc_id", "source", "text",
        textstats.quality_score(F.col("text")).alias("q"))
    kept = corpus_ops.top_quantile_per_group(scored, frac=0.5, score_col="q")
    samples = mixture.temperature_resample(
        kept.select("doc_id", "source"), alpha=0.7)
    toks = kept.select(
        "doc_id", textstats.token_count(F.col("text")).alias("ntok"))
    seq = samples.join(toks, "doc_id")
    pk_w = (Window.partitionBy("source").orderBy("doc_id", "copy_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = (seq.withColumn("cum", F.sum("ntok").over(pk_w))
              .withColumn("bin_id",
                          F.floor((F.col("cum") - F.col("ntok"))
                                  / F.lit(2048)).cast("bigint")))
    full = (
        binned.groupBy("source", "bin_id")
        .agg(F.count("*").cast("bigint").alias("n_samples"),
             F.sum("ntok").cast("bigint").alias("n_tokens"),
             F.min("sample_id").alias("first_sample"),
             F.max("sample_id").alias("last_sample"))
        .orderBy("source", "bin_id")
    )
    return {
        "1_warc_parse": recs.select("target_uri", "warc_type"),
        "2_html_to_text": cdocs,
        "3_exact_dedup": exact,
        "4_components": comps,
        "5_quantile_kept": kept.select("doc_id", "source", "q"),
        "6_full": full,
    }


acc = {}
for rep in range(REPS):
    for name, df in stage_frames().items():
        g = f"{name}_{rep}"
        sc.setJobGroup(g, g)
        t0 = time.time()
        evaluate(df)
        dt = round(time.time() - t0, 3)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(g)
        st = sum(len(sc.statusTracker().getJobInfo(j).stageIds)
                 for j in jobs)
        acc.setdefault(name, []).append((dt, len(jobs), st))
    t0 = time.time()
    spark.sql("SELECT count(*) FROM region").count()
    print(f"rep {rep} floor={time.time()-t0:.3f}", flush=True)
for name, vals in acc.items():
    ts = [v[0] for v in vals]
    print(f"{name}: min={min(ts)} med={statistics.median(ts):.3f} "
          f"jobs={vals[-1][1]} stages={vals[-1][2]} {ts}")
spark.stop()
