"""Output-shape lint over the full declared inventory (r4 verdict #2).

The correctness driver canonicalizes query output with pandas
``sort_values`` before hashing; list/dict cells are unhashable there,
so a registry query that emits an ``array``/``map``/``struct`` column
can never carry a green driver row even when its values are correct
(r4's three red rows were exactly this). This test analyzes — does not
execute — every REGISTRY query at sf0.001 and fails if any output
schema contains a complex type, so the class of red row cannot recur:
serialize with ``TO_JSON`` on both the Spark and oracle sides instead.
"""

import os

from snowflake_emulator_spark.inventory import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_COMPLEX = ("array", "map", "struct")


def test_no_complex_output_columns(spark):
    offenders = {}
    for name, (fn, _oracle) in REGISTRY.items():
        try:
            schema = fn(spark, SF_DIR).schema  # analysis only, no job run
        except Exception as e:  # pragma: no cover - surfaced as failure
            offenders[name] = f"analysis error: {e}"
            continue
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if f.dataType.simpleString().startswith(_COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registry queries with driver-unhashable output columns "
        f"(wrap in TO_JSON on both sides): {offenders}"
    )
