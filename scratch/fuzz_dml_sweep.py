"""Open-ended MERGE/UPDATE/DELETE differential sweep (r10 item 4).

Usage: python scratch/fuzz_dml_sweep.py [first_seed] [n_seeds] [per_family]
"""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from difffuzz import (generate_dml_cases, generate_merge_cases,
                      run_dml_cases, run_merge_cases)
from snowflake_emulator_spark.engine import Engine
from snowflake_emulator_spark.session_factory import build_spark

FIRST = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
PER = int(sys.argv[3]) if len(sys.argv) > 3 else 150

spark = build_spark(app_name="dml-sweep", master="local[16]",
                    shuffle_partitions=8)
eng = Engine(spark, base_dir=tempfile.mkdtemp(prefix="dml_sweep_wh_"))
total, fails = 0, []
for seed in range(FIRST, FIRST + N_SEEDS):
    t0 = time.time()
    mc = generate_merge_cases(seed, PER)
    fails += run_merge_cases(eng, mc)
    dc = generate_dml_cases(seed, PER)
    fails += run_dml_cases(eng, dc)
    total += len(mc) + len(dc)
    print(f"seed {seed}: {len(mc)+len(dc)} cases in {time.time()-t0:.0f}s, "
          f"cumulative {total} cases / {len(fails)} failures", flush=True)
uniq = sorted(set(fails))
print(f"\nTOTAL {total} cases, {len(uniq)} unique mismatches")
for f in uniq[:40]:
    print(" ", f)
sys.exit(1 if uniq else 0)
