"""Probe Spark-vs-DuckDB value parity for aggregate formulations."""
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("probe")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
D = "/root/testdata/sf0.01"
li = spark.read.parquet(f"{D}/lineitem.parquet"); li.createOrReplaceTempView("lineitem")
con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{D}/lineitem.parquet'")

cases = {
 "raw_double_sum": "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
 "dec_cast_sum": "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
 "dec_mult_sum": "SELECT l_returnflag, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
 "avg_via_dec": "SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
 "round_raw_sum2": "SELECT l_returnflag, round(sum(l_extendedprice), 2) AS s FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
}
for name, sql in cases.items():
    s = [tuple(r) for r in spark.sql(sql).collect()]
    d = con.execute(sql).fetchall()
    match = s == d
    print(f"{name}: match={match}")
    if not match:
        for a,b in zip(s,d):
            if a != b: print("  spark:", a, " duck:", b)

# timestamp parity on events (ns timestamps)
ev = spark.read.parquet(f"{D}/events.parquet"); ev.createOrReplaceTempView("events")
con.execute(f"CREATE VIEW events AS SELECT * FROM '{D}/events.parquet'")
sql = "SELECT event_id, ts FROM events ORDER BY event_id LIMIT 5"
print("spark ts:", [str(r[1]) for r in spark.sql(sql).collect()])
print("duck  ts:", [str(r[1]) for r in con.execute(sql).fetchall()])
# date_trunc parity
sql2 = "SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n FROM events GROUP BY 1 ORDER BY 1 LIMIT 3"
print("spark:", spark.sql(sql2).collect()[:3]); print("duck :", con.execute(sql2).fetchall()[:3])

# md5 + conv hex availability
print("spark md5:", spark.sql("SELECT md5('abc') AS m, conv(substr(md5('abc'),1,15),16,10) AS c").collect())
try:
    print("duck hexcast:", con.execute("SELECT md5('abc'), CAST(concat('0x', substr(md5('abc'),1,15)) AS UBIGINT)").fetchall())
except Exception as e: print("duck hexcast FAIL:", e)
try:
    print("duck listcos:", con.execute("SELECT list_cosine_similarity([1.0,2.0],[2.0,3.0])").fetchall())
except Exception as e: print("cos FAIL:", e)
spark.stop()
