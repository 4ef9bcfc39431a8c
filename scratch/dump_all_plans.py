"""Dump .explain('formatted') for EVERY registry entry to plans/r16/all/."""
import io, os, sys
sys.path.insert(0, "/root/repo")
from contextlib import redirect_stdout
from snowflake_emulator_spark.inventory import REGISTRY
from snowflake_emulator_spark.session_factory import build_spark

os.makedirs("/root/repo/plans/r16/all", exist_ok=True)
spark = build_spark(app_name="plan-dump-all")
sf_dir = "/root/testdata/sf0.1"
n_ok = n_err = 0
for name in REGISTRY:
    fn, _ = REGISTRY[name]
    try:
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/r16/all/{name}.txt", "w") as f:
            f.write(buf.getvalue())
        n_ok += 1
    except Exception as e:
        with open(f"/root/repo/plans/r16/all/{name}.txt", "w") as f:
            f.write(f"ERROR building plan: {e!r}\n")
        n_err += 1
        print("ERR", name, repr(e)[:100], flush=True)
print("DONE", n_ok, "ok,", n_err, "errors")
spark.stop()
