"""Differential fuzz: randomized translator expressions vs DuckDB
(r5 verdict item 10). Fixed seed for CI determinism; run
``scratch/fuzz_differential.py`` for open-ended sweeps."""

import os

import duckdb
import pytest

from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.plans.translator import translate

from difffuzz import PROBE_SQL, generate, normalize

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SEED = 20260814
COUNT = 80


@pytest.fixture(scope="module")
def probes(spark):
    load_views(spark, SF_DIR)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield spark, con
    con.close()


def test_differential_fuzz_fixed_seed(probes):
    spark, con = probes
    cases = generate(SEED, COUNT)
    # one batched query per engine per family-batch: run all exprs in a
    # single SELECT to keep this at a handful of Spark jobs, not 80
    failures = []
    batch = 20
    for i in range(0, len(cases), batch):
        chunk = cases[i:i + batch]
        snow_sql = PROBE_SQL.replace(
            "SELECT ",
            "SELECT " + ", ".join(
                f"{s} AS fz_{j}" for j, (_f, s, _d) in enumerate(chunk))
            + ", ", 1)
        duck_sql = PROBE_SQL.replace(
            "SELECT ",
            "SELECT " + ", ".join(
                f"{d} AS fz_{j}" for j, (_f, _s, d) in enumerate(chunk))
            + ", ", 1)
        order = " ORDER BY o_orderkey"
        srows = [tuple(normalize(v) for v in r)
                 for r in spark.sql(translate(snow_sql + order)).collect()]
        drows = [tuple(normalize(v) for v in r)
                 for r in con.sql(duck_sql + order).fetchall()]
        assert len(srows) == len(drows)
        ncols = len(chunk)
        for si, di in zip(srows, drows):
            for j in range(ncols):
                if si[j] != di[j]:
                    fam, s, d = chunk[j]
                    failures.append(
                        f"[{fam}] {s!r}: spark={si[j]!r} duck={di[j]!r}")
                    break
    assert not failures, (
        f"{len(failures)} differential mismatches:\n" + "\n".join(failures[:20]))
