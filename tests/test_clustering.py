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
