"""Local oracle-parity harness: runs every REGISTRY query on Spark and
its oracle SQL on DuckDB over the same fixtures, compares sorted rows.

Usage: python scratch/check_parity.py [sf_dir] [name_filter...]
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from snowflake_emulator_spark.inventory import REGISTRY, TABLES
from snowflake_emulator_spark.session_factory import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def run():
    spark = build_spark(app_name="parity", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    passed, failed = [], []
    for name, (fn, oracle) in REGISTRY.items():
        if FILTERS and not any(f in name for f in FILTERS):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            if oracle is None:
                status = f"ROWS-ONLY ({len(srows)} rows)"
                assert len(srows) >= 0
                passed.append(name)
                print(f"PASS {name}: {status} [{time.time()-t0:.1f}s]")
                continue
            res = con.execute(oracle)
            dcols = [d[0].lower() for d in res.description]
            drows = [tuple(norm(v) for v in r) for r in res.fetchall()]
            problems = []
            if scols != dcols:
                problems.append(f"cols spark={scols} duck={dcols}")
            if len(srows) != len(drows):
                problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
            if not problems:
                # order-insensitive compare on column-name-sorted tuples
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                skey = sorted(tuple(str(r[i]) for i in order) for r in srows)
                dkey = sorted(tuple(str(r[i]) for i in order) for r in drows)
                if skey != dkey:
                    diffs = [(a, b) for a, b in zip(skey, dkey) if a != b][:3]
                    problems.append(f"values differ, first diffs: {diffs}")
            if problems:
                failed.append(name)
                print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            else:
                passed.append(name)
                print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        except Exception as e:
            failed.append(name)
            print(f"ERROR {name}: {str(e)[:300]} [{time.time()-t0:.1f}s]")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if failed:
        print("failed:", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(run())
