"""Text-similarity scalar functions missing from Spark's builtin set.

JAROWINKLER_SIMILARITY (Snowflake: case-insensitive, returns an
integer 0-100) has no Spark builtin, so it is registered as an
Arrow-batched pandas UDF — the one non-codegen scalar in the function
surface, vectorized at the batch boundary with a per-row string
kernel (the algorithm is inherently per-pair; at 100 TB the batch
transfer amortizes and the kernel is O(len^2) on short strings).
Standard Jaro-Winkler constants: scaling 0.1, max prefix 4.

The DuckDB oracle is the built-in ``jaro_winkler_similarity`` over
lowercased inputs (DuckDB's is case-sensitive, Snowflake's is not).
"""

from __future__ import annotations

import pandas as pd


def jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler similarity in [0, 1] (public algorithm:
    Winkler 1990; match window max(|s1|,|s2|)/2 - 1, transpositions
    halved, prefix bonus capped at 4 chars, p = 0.1)."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        # empty input scores 0 even against another empty string
        # (DuckDB jaro_winkler_similarity('','') = 0)
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    m1_flags = [False] * n1
    m2_flags = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2_flags[j] and s2[j] == c:
                m1_flags[i] = True
                m2_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars in order, count mismatched pairs
    t = 0
    k = 0
    for i in range(n1):
        if m1_flags[i]:
            while not m2_flags[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0
    # Winkler's prefix bonus only applies above the 0.7 boost
    # threshold (Winkler 1990; DuckDB jaro_winkler_similarity agrees)
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def register_text_similarity(spark) -> None:
    """Idempotently register jarowinkler_similarity on the session."""
    if getattr(spark, "_sf_textsim_registered", False):
        return
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def jarowinkler_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                return None
            # Snowflake's JAROWINKLER_SIMILARITY is case-insensitive
            # and returns an integer percentage
            return int(round(jaro_winkler(str(x).lower(), str(y).lower()) * 100))

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="object")

    spark.udf.register("jarowinkler_similarity", jarowinkler_similarity)
    spark._sf_textsim_registered = True
