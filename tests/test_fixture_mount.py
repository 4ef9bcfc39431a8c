"""Driver fixtures mounted as engine catalog tables (FIXTURES.md §2):
Snowflake SQL over TEST_DB.PUBLIC.<NAME> end-to-end through the
classifier -> translator -> executor path."""

from snowflake_emulator_spark.executor import SessionContext

SF = "/root/testdata/sf0.001"


def test_mount_and_query_fixtures(engine):
    mounted = engine.mount_fixtures(SF)
    assert "LINEITEM" in mounted and "REGION" in mounted
    ctx = SessionContext()
    res = engine.execute("SELECT count(*) AS n FROM TEST_DB.PUBLIC.LINEITEM", ctx)
    assert res.rows[0][0] == 6000
    # Snowflake function through the translator over a fixture table
    res = engine.execute(
        "SELECT r_name, IFF(r_regionkey < 2, 'low', 'high') AS bucket "
        "FROM region ORDER BY r_regionkey LIMIT 2",
        ctx,
    )
    assert [tuple(r) for r in res.rows] == [("AFRICA", "low"), ("AMERICA", "low")]
    # SHOW TABLES includes the mounted externals
    res = engine.execute("SHOW TABLES", ctx)
    names = {r[0] for r in res.rows}
    assert {"LINEITEM", "ORDERS", "CUSTOMER"} <= names
    # DESCRIBE reflects inferred Snowflake type names
    res = engine.execute("DESCRIBE TABLE lineitem", ctx)
    types = {r[0]: r[1] for r in res.rows}
    assert types["l_orderkey".upper() if "L_ORDERKEY" in types else "l_orderkey"] == "NUMBER"
