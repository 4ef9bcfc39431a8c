"""Error-bound gate for agg_approx_count_distinct (VERDICT r9 item 3).

The registry entry is rows-only by design — Spark's HLL++ and DuckDB's
HLL produce different sketches, so an exact value-hash compare is
meaningless. This gate is the real correctness contract instead:
per returnflag group, |approx − exact| / exact ≤ 0.05, where the exact
distinct count comes from DuckDB over the same parquet fixtures.
Spark's HLL++ default rsd is 0.05, so a 5% relative bound is the
documented accuracy target, not a loose hand-wave.

Runs at sf0.001 and sf0.01 always; sf0.1 when SPARK_GRAFT_SLOW=1.
"""
import os

import duckdb
import pytest

from snowflake_emulator_spark.inventory import REGISTRY

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
if os.environ.get("SPARK_GRAFT_SLOW") == "1":
    _SF_DIRS.append("/root/testdata/sf0.1")

_REL_TOL = 0.05


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_approx_count_distinct_error_bound(spark, sf_dir):
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
        pytest.skip(f"fixture dir {sf_dir} missing")

    fn, _ = REGISTRY["agg_approx_count_distinct"]
    approx_rows = {
        r["l_returnflag"]: int(r["approx_parts"])
        for r in fn(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    exact_rows = dict(
        con.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
            "GROUP BY l_returnflag"
        ).fetchall()
    )
    con.close()

    assert set(approx_rows) == set(exact_rows)
    for flag, exact in exact_rows.items():
        approx = approx_rows[flag]
        rel_err = abs(approx - exact) / exact
        assert rel_err <= _REL_TOL, (
            f"{sf_dir} group {flag!r}: approx={approx} exact={exact} "
            f"rel_err={rel_err:.4f} > {_REL_TOL}"
        )
