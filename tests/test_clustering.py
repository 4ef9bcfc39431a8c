"""CLUSTER BY: metadata recorded (like the reference,
pkg/metadata/repository.go:135-146) AND acted on — writes co-locate and
sort rows by the clustering key."""

from snowflake_emulator_spark.executor import SessionContext


def test_cluster_by_recorded_and_applied(engine):
    ctx = SessionContext()
    engine.execute(
        "CREATE TABLE clustered (k INTEGER, v VARCHAR) CLUSTER BY (k)", ctx
    )
    tm = engine.catalog.get_table("clustered")
    assert tm.clustering_key == "k"
    engine.execute(
        "INSERT INTO clustered VALUES (3,'c'),(1,'a'),(2,'b'),(1,'aa'),(3,'cc')", ctx
    )
    res = engine.execute("SELECT k, v FROM clustered ORDER BY k, v", ctx)
    assert [tuple(r) for r in res.rows] == [
        (1, "a"), (1, "aa"), (2, "b"), (3, "c"), (3, "cc"),
    ]
    # rows sharing a key live in the same partition file
    df = engine.catalog.read_table(tm)
    from pyspark.sql import functions as F

    parts = (
        df.select("k", F.spark_partition_id().alias("pid"))
        .groupBy("k")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .collect()
    )
    assert all(r["n_pids"] == 1 for r in parts)


def test_show_columns_and_recluster(engine):
    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute(
        "CREATE TABLE sc_t (id INTEGER, grp VARCHAR) CLUSTER BY (grp)", ctx)
    engine.execute(
        "INSERT INTO sc_t VALUES (3,'b'),(1,'a'),(2,'b'),(4,'a')", ctx)
    rows = engine.execute("SHOW COLUMNS IN sc_t", ctx).rows
    assert [(r[2], r[3]) for r in rows] == [("ID", "INTEGER"), ("GRP", "VARCHAR")]
    v0 = engine.catalog.get_table("sc_t").version
    engine.execute("ALTER TABLE sc_t RECLUSTER", ctx)
    tm = engine.catalog.get_table("sc_t")
    assert tm.version == v0 + 1  # rewritten into a new clustered version
    res = engine.execute("SELECT id FROM sc_t ORDER BY id", ctx)
    assert [r[0] for r in res.rows] == [1, 2, 3, 4]
    import pytest as _pytest
    engine.execute("CREATE TABLE sc_nok (id INTEGER)", ctx)
    with _pytest.raises(Exception, match="clustering key"):
        engine.execute("ALTER TABLE sc_nok RECLUSTER", ctx)


def test_system_clustering_information(engine):
    import json as _json

    from snowflake_emulator_spark.executor import SessionContext

    ctx = SessionContext()
    engine.execute(
        "CREATE TABLE ci_t (id INTEGER, grp VARCHAR) CLUSTER BY (grp)", ctx)
    engine.execute("INSERT INTO ci_t VALUES (1,'a'),(2,'b')", ctx)
    out = engine.execute(
        "SELECT SYSTEM$CLUSTERING_INFORMATION('ci_t') AS info", ctx).rows[0][0]
    info = _json.loads(out)
    assert info["cluster_by_keys"] == "LINEAR(grp)"
    assert info["total_partition_count"] >= 1
