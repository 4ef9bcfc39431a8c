"""A/B: match_recognize groupBy().applyInPandas (per-group kernel) vs
repartition+sortWithinPartitions+mapInPandas (block kernel, guide §4.2).

Asserts tuple-identical output on the funnel shape at sf0.1, then
interleaved timing (noop sink).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_emulator_spark.session_factory import build_spark
from snowflake_emulator_spark.inventory import load_views
from snowflake_emulator_spark.operators.match_recognize import (
    match_recognize, parse_pattern, find_matches)

spark = build_spark(app_name="ab-mr")
load_views(spark, "/root/testdata/sf0.1")
e = spark.table("events")
# warm python worker fleet
_warm = F.pandas_udf(lambda s: s * 1.0, "double")
spark.range(10000).repartition(32).select(_warm(F.col("id").cast("double"))).count()

DEFINE = {"V": "event_type = 'view'", "C": "event_type = 'click'",
          "P": "event_type = 'purchase'"}
PATTERN = "V C+ P"
ORDER = ["ts", "event_id"]
PK = "user_id"
MEASURES = ["event_id"]


def variant_b(df):
    symbol_index = {s: i for i, s in enumerate(k.upper() for k in DEFINE)}
    ast = parse_pattern(PATTERN, symbol_index)
    mask = F.lit(0).cast("long")
    for name, i in symbol_index.items():
        pred = {k.upper(): v for k, v in DEFINE.items()}[name]
        bit = F.lit(1 << i).cast("long")
        mask = mask + F.when(F.coalesce(F.expr(pred), F.lit(False)), bit) \
            .otherwise(F.lit(0).cast("long"))
    work = df.withColumn("__mask", mask)
    out_schema = T.StructType([
        df.schema[PK],
        T.StructField("match_number", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("event_id_first", df.schema["event_id"].dataType),
        T.StructField("event_id_last", df.schema["event_id"].dataType),
    ])
    out_names = [f.name for f in out_schema.fields]

    def block(pdf, starts):
        masks_all = pdf["__mask"].to_numpy()
        key_all = pdf[PK].to_numpy()
        marr = {c: pdf[c].to_numpy() for c in MEASURES}
        cols = {nm: [] for nm in out_names}
        ends = np.append(starts[1:], len(pdf))
        for st_g, en_g in zip(starts, ends):
            masks = masks_all[st_g:en_g].tolist()
            for mn, (st, en, bits) in enumerate(
                    find_matches(ast, masks), start=1):
                a, b = st_g + st, st_g + en
                cols[PK].append(key_all[st_g])
                cols["match_number"].append(mn)
                cols["n_rows"].append(en - st)
                for c in MEASURES:
                    cols[f"{c}_first"].append(marr[c][a])
                    cols[f"{c}_last"].append(marr[c][b - 1])
        if not cols[PK]:
            return None
        return pd.DataFrame(cols, columns=out_names)

    def kernel(batches):
        pending = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[PK].to_numpy()
            change = (keys[1:] != keys[:-1]).nonzero()[0] + 1
            if len(change):
                last_start = int(change[-1])
                body = pdf.iloc[:last_start]
                pending = pdf.iloc[last_start:]
                out = block(body, np.concatenate(([0], change[:-1])))
                if out is not None:
                    yield out
            else:
                pending = pdf
        if pending is not None and len(pending):
            out = block(pending.reset_index(drop=True), np.array([0]))
            if out is not None:
                yield out

    srt = (work.repartition(F.col(PK))
           .sortWithinPartitions(PK, *[F.col(c).asc_nulls_last()
                                       for c in ORDER]))
    return srt.mapInPandas(kernel, schema=out_schema)


def variant_a(df):
    return match_recognize(df, PK, ORDER, define=DEFINE, pattern=PATTERN,
                           measure_cols=MEASURES)


# --- equality ---
a = variant_a(e).orderBy(PK, "match_number").collect()
b = variant_b(e).orderBy(PK, "match_number").collect()
assert len(a) == len(b), (len(a), len(b))
for ra, rb in zip(a, b):
    assert tuple(ra) == tuple(rb), (ra, rb)
print(f"IDENTICAL: {len(a)} match rows")

# --- interleaved timing ---
ta, tb = [], []
for rep in range(6):
    t = time.time()
    variant_a(e).write.format("noop").mode("overwrite").save()
    ta.append(time.time() - t)
    t = time.time()
    variant_b(e).write.format("noop").mode("overwrite").save()
    tb.append(time.time() - t)
print("A groupBy.applyInPandas:", [round(x, 3) for x in ta], "min", round(min(ta), 3))
print("B mapInPandas block    :", [round(x, 3) for x in tb], "min", round(min(tb), 3))
