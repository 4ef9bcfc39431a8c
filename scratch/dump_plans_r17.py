"""Dump .explain('formatted') for headline queries to plans/r17/<name>_<tag>.txt."""
import io, os, sys
sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else None

from snowflake_emulator_spark.inventory import REGISTRY
from snowflake_emulator_spark.session_factory import build_spark

HEADLINE = [
    "embed_cosine_topk", "embed_near_pairs_lsh", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier", "q6_revenue_forecast",
    "q10_returned_items", "topk_orders", "agg_cube", "agg_count_distinct",
    "window_row_number_topn", "events_hourly_agg", "events_sessionize",
    "sf_dateadd_datediff", "dedup_exact", "dedup_minhash_lsh",
    "text_quality_score", "text_language_id",
]
spark = build_spark(app_name="plan-dump")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for name in (names or HEADLINE):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = f"/root/repo/plans/r17/{name}_{tag}.txt"
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print(name, "->", out, f"({len(buf.getvalue())} bytes)")
spark.stop()
