import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[8]").appName("probe2")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
D = "/root/testdata/sf0.01"
# runtime-set nanosAsLong (driver's session won't have it at build time)
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
ev = spark.read.parquet(f"{D}/events.parquet")
ev.printSchema()
ev2 = ev.withColumn("ts", F.timestamp_micros((F.col("ts")/1000).cast("long")))
ev2.createOrReplaceTempView("events")
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{D}/events.parquet'")
sql = "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, count(*) AS n, round(sum(value),2) AS sv FROM events GROUP BY 1 ORDER BY 1 LIMIT 5"
s = [tuple(r) for r in spark.sql(sql).collect()]
d = con.execute(sql).fetchall()
print("events hourly match:", s == d)
if s != d:
    print(s[:3]); print(d[:3])
# json access parity
sqlS = "SELECT event_id, get_json_object(props,'$.k') AS k FROM events ORDER BY event_id LIMIT 5"
sqlD = "SELECT event_id, json_extract_string(props,'$.k') AS k FROM events ORDER BY event_id LIMIT 5"
print("spark json:", [tuple(r) for r in spark.sql(sqlS).collect()])
print("duck  json:", con.execute(sqlD).fetchall())
# duckdb hex cast & cosine
for q in ["SELECT CAST(concat('0x', substr(md5('abc'),1,15)) AS UBIGINT)",
          "SELECT list_cosine_similarity([1.0,2.0],[2.0,3.0])",
          "SELECT string_agg(x, ',' ORDER BY x) FROM (VALUES ('b'),('a')) t(x)"]:
    try: print("duck OK:", q[:60], "=>", con.execute(q).fetchall())
    except Exception as e: print("duck FAIL:", q[:60], "=>", str(e)[:120])
# spark listagg in 4.1?
try: print("spark listagg:", spark.sql("SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a') t(x)").collect())
except Exception as e: print("spark listagg FAIL:", str(e)[:200])
# embeddings: dot product parity double-cast
emb = spark.read.parquet(f"{D}/embeddings.parquet"); emb.createOrReplaceTempView("embeddings")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{D}/embeddings.parquet'")
sS = """SELECT a.vec_id, aggregate(zip_with(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>), (x,y)->x*y), CAST(0.0 AS DOUBLE), (acc,v)->acc+v) AS dot
        FROM embeddings a JOIN embeddings b ON b.vec_id=1 WHERE a.vec_id IN (2,3) ORDER BY a.vec_id"""
sD = """SELECT a.vec_id, list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dot
        FROM embeddings a JOIN embeddings b ON b.vec_id=1 WHERE a.vec_id IN (2,3) ORDER BY a.vec_id"""
s = [tuple(r) for r in spark.sql(sS).collect()]; d = con.execute(sD).fetchall()
print("dot parity:", s == d, s, d)
spark.stop()
