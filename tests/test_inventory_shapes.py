"""Output-shape lint over the full declared inventory (r4 verdict #2).

The correctness driver canonicalizes query output with pandas
``sort_values`` before hashing; list/dict cells are unhashable there,
so a registry query that emits an ``array``/``map``/``struct`` column
can never carry a green driver row even when its values are correct
(r4's three red rows were exactly this). DECIMAL and BINARY outputs
are equally hostile (r5's three red rows): DuckDB surfaces BLOB as
``bytearray`` (unhashable) and the two clients canonicalize Decimal
differently, so value-identical results still hash-mismatch. This test
analyzes — does not execute — every REGISTRY query at sf0.001 and
fails if any output schema contains a complex/decimal/binary type, so
the class of red row cannot recur: serialize with ``TO_JSON``
(complex), ``CAST(... AS DOUBLE)`` (decimal ≤15 digits),
``CAST(... AS VARCHAR)`` (wider decimals), or ``HEX_ENCODE`` (binary)
on BOTH the Spark and oracle sides instead.
"""

import os

from snowflake_emulator_spark.inventory import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_HOSTILE = ("array", "map", "struct", "decimal", "binary")


def test_no_canonicalizer_hostile_output_columns(spark):
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
            if f.dataType.simpleString().startswith(_HOSTILE)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registry queries with driver-unhashable output columns "
        "(TO_JSON complex / CAST DOUBLE-or-VARCHAR decimals / "
        f"HEX_ENCODE binary, on both sides): {offenders}"
    )


def test_lint_catches_decimal_and_binary(spark):
    """The lint itself must flag decimal/binary — guard the guard."""
    df = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d, unhex('FF') AS b, 1 AS ok")
    flagged = [
        f.name for f in df.schema.fields
        if f.dataType.simpleString().startswith(_HOSTILE)
    ]
    assert flagged == ["d", "b"]
