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


# Coarse type classes: the driver's value hash is type-sensitive (r2's
# q12 red row was DuckDB HUGEINT vs Spark BIGINT over identical values),
# so flag any column whose engine-level types do not land in the same
# class even when stringified values match.
_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
}
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int128", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "uint64",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bin",
}


def _type_class(type_str: str, table: dict) -> str:
    t = type_str.strip()
    up = t.upper()
    if up.startswith("DECIMAL"):
        return "dec:" + up.replace(" ", "")
    if up.startswith(("ARRAY", "LIST")) or "[]" in up:
        return "list"
    if up.startswith(("MAP", "STRUCT")):
        return "nested"
    return table.get(t, table.get(up, f"other:{t}"))


def run():
    spark = build_spark(app_name="parity", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    # r16: cap DuckDB's memory AND disable temp spilling. With a temp
    # dir available, pipeline_keep_set's recursive-closure + NOT IN
    # composition at sf0.1 triggered DuckDB's out-of-core path, which
    # wrote >80 GB of .tmp and filled the disk; with spill disabled the
    # identical query runs in-memory in ~30 s well under the cap. Every
    # registry oracle fits in the cap (verified by the r16 full sf0.1
    # run) — if a future one doesn't, it should error loudly here, not
    # silently eat the disk.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory=''")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    passed, failed = [], []
    for name, (fn, oracle) in REGISTRY.items():
        if FILTERS and not any(f in name for f in FILTERS):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            # Output-shape lint (r4 verdict item 2, extended r6): the
            # driver's canonicalizer (pandas sort_values) cannot hash
            # list/bytearray cells and canonicalizes Decimal differently
            # per engine, so NO registry query may emit
            # array/map/struct/decimal/binary columns — serialize with
            # to_json / CAST DOUBLE-or-VARCHAR / hex on both sides.
            bad_shape = [
                f.name for f in sdf.schema.fields
                if f.dataType.simpleString().startswith(
                    ("array", "map", "struct", "decimal", "binary"))
            ]
            if bad_shape:
                failed.append(name)
                print(f"FAIL {name}: non-canonicalizable output columns {bad_shape}")
                continue
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            if oracle is None:
                status = f"ROWS-ONLY ({len(srows)} rows)"
                assert len(srows) >= 0
                passed.append(name)
                print(f"PASS {name}: {status} [{time.time()-t0:.1f}s]")
                continue
            rel = con.sql(oracle)
            dcols = [c.lower() for c in rel.columns]
            dtypes = [str(t) for t in rel.types]
            drows = [tuple(norm(v) for v in r) for r in rel.fetchall()]
            problems = []
            if scols != dcols:
                problems.append(f"cols spark={scols} duck={dcols}")
            else:
                stypes = [f.dataType.simpleString() for f in sdf.schema.fields]
                for c, st, dt in zip(scols, stypes, dtypes):
                    sc = _type_class(st, _SPARK_CLASS)
                    dc = _type_class(dt, _DUCK_CLASS)
                    if sc != dc:
                        problems.append(
                            f"type-class mismatch {c}: spark {st}({sc}) vs duck {dt}({dc})"
                        )
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
