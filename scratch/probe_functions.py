"""Probe candidate Snowflake SQL surfaces against the engine: print
which translate+execute cleanly and which fail (to pick the next
function family to implement). Read-only; never part of CI."""

import sys
import traceback

sys.path.insert(0, "/root/repo")

from snowflake_emulator_spark.engine import Engine
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.session_factory import build_spark

CASES = {
    # bitmap distinct-counting family
    "bitmap_bucket": "SELECT BITMAP_BUCKET_NUMBER(100000) AS b",
    "bitmap_agg": ("SELECT BITMAP_COUNT(BITMAP_CONSTRUCT_AGG("
                   "BITMAP_BIT_POSITION(o_custkey))) AS n FROM orders"),
    # HLL sketch export/combine surface
    "hll_accumulate": "SELECT HLL_ESTIMATE(HLL_ACCUMULATE(o_custkey)) AS n FROM orders",
    "hll_combine": ("SELECT HLL_ESTIMATE(HLL_COMBINE(s)) AS n FROM "
                    "(SELECT HLL_ACCUMULATE(o_custkey) AS s FROM orders GROUP BY o_orderpriority)"),
    # regression / correlation aggregates
    "regr": ("SELECT REGR_SLOPE(l_extendedprice, l_quantity) AS s, "
             "REGR_INTERCEPT(l_extendedprice, l_quantity) AS i, "
             "REGR_R2(l_extendedprice, l_quantity) AS r2, "
             "CORR(l_extendedprice, l_quantity) AS c, "
             "COVAR_POP(l_extendedprice, l_quantity) AS cp FROM lineitem"),
    "regr_rest": ("SELECT REGR_COUNT(l_extendedprice, l_quantity) AS n, "
                  "REGR_AVGX(l_extendedprice, l_quantity) AS ax, "
                  "REGR_AVGY(l_extendedprice, l_quantity) AS ay, "
                  "REGR_SXX(l_extendedprice, l_quantity) AS sxx, "
                  "REGR_SXY(l_extendedprice, l_quantity) AS sxy FROM lineitem"),
    "width_bucket": "SELECT WIDTH_BUCKET(l_quantity, 0, 60, 6) AS b, COUNT(*) FROM lineitem GROUP BY b ORDER BY b",
    "percentile_cont": ("SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS m, "
                        "PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q FROM lineitem"),
    "mode": "SELECT MODE(l_shipmode) AS m FROM lineitem",
    "grouping_id": ("SELECT l_returnflag, l_linestatus, GROUPING_ID(l_returnflag, l_linestatus) AS g "
                    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1,2,3"),
    # array family gaps
    "array_min_max": "SELECT ARRAY_MIN([3,1,2]) AS mn, ARRAY_MAX([3,1,2]) AS mx",
    "array_distinct": "SELECT ARRAY_DISTINCT([1,1,2]) AS d",
    "array_remove": "SELECT ARRAY_REMOVE([1,2,1,3], 1) AS r, ARRAY_REMOVE_AT([1,2,3], 1) AS ra",
    "array_prepend": "SELECT ARRAY_PREPEND([2,3], 1) AS p, ARRAY_APPEND([1,2], 3) AS a",
    "arrays_overlap": "SELECT ARRAYS_OVERLAP([1,2], [2,3]) AS o",
    "arrays_zip": "SELECT ARRAYS_ZIP([1,2], ['a','b']) AS z",
    # vector similarity (Cortex-adjacent; embeddings use-case)
    "vector_cosine": ("SELECT VECTOR_COSINE_SIMILARITY(e1.embedding, e2.embedding) AS s "
                      "FROM embeddings e1, embeddings e2 WHERE e1.vec_id = 0 AND e2.vec_id = 1"),
    "vector_inner": ("SELECT VECTOR_INNER_PRODUCT(e1.embedding, e2.embedding) AS s, "
                     "VECTOR_L2_DISTANCE(e1.embedding, e2.embedding) AS d "
                     "FROM embeddings e1, embeddings e2 WHERE e1.vec_id = 0 AND e2.vec_id = 1"),
    # higher-order functions (Snowflake FILTER/TRANSFORM/REDUCE)
    "hof_filter": "SELECT FILTER([1,2,3,4], x -> x > 2) AS f",
    "hof_transform": "SELECT TRANSFORM([1,2,3], x -> x * 2) AS t",
    "hof_reduce": "SELECT REDUCE([1,2,3], 0, (acc, x) -> acc + x) AS r",
    # misc scalar gaps
    "insert_fn": "SELECT INSERT('abcdef', 2, 3, 'ZW') AS i",
    "translate": "SELECT TRANSLATE('abcba', 'abc', 'xyz') AS t",
    "compress": "SELECT LENGTH(COMPRESS('aaaaaaaaaa', 'zlib')) < 10 AS c",
    "soundex_diff": "SELECT DIFFERENCE('Robert', 'Rupert') AS d",
    "next_day": "SELECT NEXT_DAY('2026-01-01'::DATE, 'Friday') AS n",
    "months_between": "SELECT MONTHS_BETWEEN('2026-03-15'::DATE, '2026-01-15'::DATE) AS m",
    "add_months": "SELECT ADD_MONTHS('2026-01-31'::DATE, 1) AS a",
    "xmlget": "SELECT XMLGET(PARSE_XML('<a><b>1</b></a>'), 'b') AS x",
    "get_ddl": "SELECT GET_DDL('TABLE', 'orders') AS d",
    "seq": "SELECT SEQ4() AS s FROM TABLE(GENERATOR(ROWCOUNT => 3))",
    "regexp_extract_all": "SELECT REGEXP_SUBSTR_ALL('a1b2c3', '[0-9]') AS r",
    "bitmap_count_distinct_2level": (
        "SELECT SUM(cnt) AS n FROM (SELECT BITMAP_BUCKET_NUMBER(o_custkey) AS b, "
        "BITMAP_COUNT(BITMAP_CONSTRUCT_AGG(BITMAP_BIT_POSITION(o_custkey))) AS cnt "
        "FROM orders GROUP BY b)"),
    "object_entries": "SELECT OBJECT_KEYS(PARSE_JSON('{\"a\":1,\"b\":2}')) AS k",
    "map_keys": "SELECT MAP_KEYS({'a': 1, 'b': 2}) AS k",
    "st_dwithin": "SELECT ST_DWITHIN(ST_MAKEPOINT(0,0), ST_MAKEPOINT(0,1), 200000) AS d",
    "search": "SELECT COUNT(*) FROM documents WHERE SEARCH(text, 'data')",
}


def main() -> None:
    spark = build_spark(app_name="probe_functions")
    load_views(spark, "/root/testdata/sf0.001")
    eng = Engine(spark, base_dir="/tmp/probe_wh")
    ok, bad = [], []
    for name, sql in CASES.items():
        try:
            res = eng.execute(sql)
            rows = res.rows[:2]
            ok.append(name)
            print(f"PASS {name}: {rows}")
        except Exception as e:
            bad.append(name)
            msg = str(e).splitlines()[0][:160]
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
    print(f"\n{len(ok)} pass / {len(bad)} fail")
    print("failing:", " ".join(bad))
    spark.stop()


if __name__ == "__main__":
    main()
