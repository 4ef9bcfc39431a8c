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
