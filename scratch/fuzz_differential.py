"""Open-ended differential fuzz runner (r5 verdict item 10; r8
families: +window NULL orderings, +variant paths, +ASOF configs).

Usage: python scratch/fuzz_differential.py [seed] [count] [sf_dir]

Generates `count` random Snowflake expressions per probe family from
the template tables in tests/difffuzz.py (plus count//20 full ASOF
join configs), executes them on Spark (through the translator) and on
DuckDB (oracle form), and reports mismatches. The pytest entry
(tests/test_differential_fuzz.py) pins seeds for CI; this runner is
for exploratory sweeps with any seed.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb

from difffuzz import (
    PROBE_AGG_SQL,
    PROBE_EVENTS_SQL,
    PROBE_SQL,
    TEMPLATES_AGG,
    TEMPLATES_DATEFMT,
    TEMPLATES_EVENTS,
    generate,
    generate_asof_cases,
    generate_join_cases,
    generate_nullsem_cases,
    run_asof_cases,
    run_probe_cases,
)
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
    for t in ("customer", "orders", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []
    n_cases = 0

    cases = generate(SEED, COUNT)
    n_cases += len(cases)
    failures += run_probe_cases(spark, con, translate, cases,
                                PROBE_SQL, "o_orderkey")
    print(f"scalar/window sweep: {len(cases)} cases done", flush=True)

    ev_cases = generate(SEED + 1, max(COUNT // 3, 20),
                        templates=TEMPLATES_EVENTS)
    n_cases += len(ev_cases)
    failures += run_probe_cases(spark, con, translate, ev_cases,
                                PROBE_EVENTS_SQL, "event_id")
    print(f"variant sweep: {len(ev_cases)} cases done", flush=True)

    agg_cases = generate(SEED + 3, max(COUNT // 3, 20),
                         templates=TEMPLATES_AGG)
    n_cases += len(agg_cases)
    failures += run_probe_cases(spark, con, translate, agg_cases,
                                PROBE_AGG_SQL, "c_nationkey")
    print(f"aggregate sweep: {len(agg_cases)} cases done", flush=True)

    fmt_cases = generate(SEED + 6, max(COUNT // 5, 20),
                         templates=TEMPLATES_DATEFMT)
    n_cases += len(fmt_cases)
    failures += run_probe_cases(spark, con, translate, fmt_cases,
                                PROBE_SQL, "o_orderkey")
    print(f"datefmt sweep: {len(fmt_cases)} cases done", flush=True)

    asof_cases = generate_asof_cases(SEED + 2, max(COUNT // 20, 4))
    n_cases += len(asof_cases)
    failures += run_asof_cases(spark, con, translate, asof_cases)
    print(f"asof sweep: {len(asof_cases)} cases done", flush=True)

    ns_cases = generate_nullsem_cases(SEED + 4, max(COUNT // 10, 8))
    n_cases += len(ns_cases)
    failures += run_asof_cases(spark, con, translate, ns_cases)
    print(f"null-semantics sweep: {len(ns_cases)} cases done", flush=True)

    join_cases = generate_join_cases(SEED + 5, max(COUNT // 10, 8))
    n_cases += len(join_cases)
    failures += run_asof_cases(spark, con, translate, join_cases)
    print(f"join-type sweep: {len(join_cases)} cases done", flush=True)

    import tempfile

    from snowflake_emulator_spark.engine import Engine

    from difffuzz import generate_mr_cases, run_mr_cases
    eng = Engine(spark, base_dir=tempfile.mkdtemp(prefix="fuzz_mr_wh_"))
    mr_cases = generate_mr_cases(SEED + 7, max(COUNT // 40, 4))
    n_cases += len(mr_cases)
    failures += run_mr_cases(eng.executor, con, mr_cases)
    print(f"match-recognize sweep: {len(mr_cases)} cases done", flush=True)

    from difffuzz import generate_script_cases, run_script_cases
    sc_cases = generate_script_cases(SEED + 8, max(COUNT // 20, 8))
    n_cases += len(sc_cases)
    failures += run_script_cases(eng, sc_cases)
    print(f"scripting sweep: {len(sc_cases)} cases done", flush=True)

    # r10 (VERDICT r9 item 4): MERGE vs pure-Python simulator,
    # UPDATE/DELETE (incl. FROM/USING) vs DuckDB natively
    from difffuzz import (generate_dml_cases, generate_merge_cases,
                          run_dml_cases, run_merge_cases)
    mg_cases = generate_merge_cases(SEED + 9, max(COUNT // 10, 10))
    n_cases += len(mg_cases)
    failures += run_merge_cases(eng, mg_cases)
    print(f"merge-dml sweep: {len(mg_cases)} cases done", flush=True)

    dml_cases = generate_dml_cases(SEED + 10, max(COUNT // 10, 10))
    n_cases += len(dml_cases)
    failures += run_dml_cases(eng, dml_cases)
    print(f"update/delete sweep: {len(dml_cases)} cases done", flush=True)

    # r10 (VERDICT r9 item 5): overlapping-DEFINE MATCH_RECOGNIZE
    from difffuzz import generate_mr_overlap_cases, run_mr_overlap_cases
    mro_cases = generate_mr_overlap_cases(SEED + 11, max(COUNT // 20, 6))
    n_cases += len(mro_cases)
    failures += run_mr_overlap_cases(eng.executor, con, mro_cases)
    print(f"mr-overlap sweep: {len(mro_cases)} cases done", flush=True)

    # r10: CONNECT BY hierarchical configs vs DuckDB recursive CTEs
    from difffuzz import generate_connectby_cases
    con.execute(
        f"CREATE VIEW IF NOT EXISTS nation AS SELECT * FROM '{SF_DIR}/nation.parquet'")
    cb_cases = generate_connectby_cases(SEED + 12, max(COUNT // 20, 6))
    n_cases += len(cb_cases)
    failures += run_asof_cases(spark, con, translate, cb_cases)
    print(f"connect-by sweep: {len(cb_cases)} cases done", flush=True)

    # r10: multi-table INSERT ALL|FIRST vs DuckDB decomposed replay
    from difffuzz import generate_mti_cases, run_mti_cases
    mti_cases = generate_mti_cases(SEED + 13, max(COUNT // 15, 8))
    n_cases += len(mti_cases)
    failures += run_mti_cases(eng, mti_cases)
    print(f"multi-table-insert sweep: {len(mti_cases)} cases done", flush=True)

    # r10: PRIOR-in-DEFINE MATCH_RECOGNIZE vs DuckDB lag replay
    from difffuzz import generate_mr_prior_cases
    mrp_cases = generate_mr_prior_cases(SEED + 14, max(COUNT // 20, 6))
    n_cases += len(mrp_cases)
    failures += run_mr_overlap_cases(eng.executor, con, mrp_cases)
    print(f"mr-prior sweep: {len(mrp_cases)} cases done", flush=True)

    # r10: non-strict MERGE invariants (duplicate actionable matches)
    from difffuzz import (generate_merge_nonstrict_cases,
                          run_merge_nonstrict_cases)
    ns_cases = generate_merge_nonstrict_cases(SEED + 15, max(COUNT // 20, 6))
    n_cases += len(ns_cases)
    failures += run_merge_nonstrict_cases(eng, ns_cases)
    print(f"merge-nonstrict sweep: {len(ns_cases)} cases done", flush=True)

    # r11: exact-substring dedup (planted duplicate spans) vs full
    # DuckDB replay — anchors, df>1, islands merge, cleaned-text splice
    from difffuzz import generate_substr_cases, run_substr_cases
    sb_cases = generate_substr_cases(SEED + 16, max(COUNT // 20, 6))
    n_cases += len(sb_cases)
    failures += run_substr_cases(spark, con, sb_cases)
    print(f"substring-dedup sweep: {len(sb_cases)} cases done", flush=True)

    uniq = sorted(set(failures))
    print(f"\nseed={SEED} cases={n_cases}: {len(uniq)} unique mismatches")
    for f in uniq[:40]:
        print(" ", f)
    sys.exit(1 if uniq else 0)


if __name__ == "__main__":
    main()
