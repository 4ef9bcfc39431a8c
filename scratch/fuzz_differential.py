"""Open-ended differential fuzz runner (r5 verdict item 10).

Usage: python scratch/fuzz_differential.py [seed] [count] [sf_dir]

Generates `count` random Snowflake expressions from the template table
in tests/difffuzz.py, executes them on Spark (through the translator)
and on DuckDB (oracle form), and reports mismatches. The pytest entry
(tests/test_differential_fuzz.py) pins one seed for CI; this runner is
for exploratory sweeps with any seed.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb

from difffuzz import PROBE_SQL, generate, normalize
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.plans.translator import translate
from snowflake_emulator_spark.session_factory import build_spark

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1
COUNT = int(sys.argv[2]) if len(sys.argv) > 2 else 200
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"


def main():
    spark = build_spark(app_name="difffuzz", master="local[8]",
                        shuffle_partitions=8)
    load_views(spark, SF_DIR)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    cases = generate(SEED, COUNT)
    failures = []
    batch = 20
    for i in range(0, len(cases), batch):
        chunk = cases[i:i + batch]
        snow_sql = PROBE_SQL.replace(
            "SELECT ", "SELECT " + ", ".join(
                f"{s} AS fz_{j}" for j, (_f, s, _d) in enumerate(chunk)) + ", ", 1)
        duck_sql = PROBE_SQL.replace(
            "SELECT ", "SELECT " + ", ".join(
                f"{d} AS fz_{j}" for j, (_f, _s, d) in enumerate(chunk)) + ", ", 1)
        order = " ORDER BY o_orderkey"
        try:
            srows = [tuple(normalize(v) for v in r)
                     for r in spark.sql(translate(snow_sql + order)).collect()]
            drows = [tuple(normalize(v) for v in r)
                     for r in con.sql(duck_sql + order).fetchall()]
        except Exception as e:
            failures.append(f"batch {i // batch} ERROR: {e}")
            continue
        for si, di in zip(srows, drows):
            for j in range(len(chunk)):
                if si[j] != di[j]:
                    fam, s, d = chunk[j]
                    failures.append(
                        f"[{fam}] {s!r}: spark={si[j]!r} duck={di[j]!r}")
                    break
        print(f"batch {i // batch + 1}/{(len(cases) + batch - 1) // batch} done",
              flush=True)
    uniq = sorted(set(failures))
    print(f"\nseed={SEED} count={COUNT}: {len(uniq)} unique mismatches")
    for f in uniq[:40]:
        print(" ", f)
    sys.exit(1 if uniq else 0)


if __name__ == "__main__":
    main()
