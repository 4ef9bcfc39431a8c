"""MATCH_RECOGNIZE-style sequential row-pattern matching (restricted).

Snowflake's MATCH_RECOGNIZE (row pattern matching over partitions) has
no Spark SQL equivalent and no relational decomposition for general
regex patterns — this is exactly the "custom operator" case: symbol
predicates stay JVM-side Column expressions; the per-partition regex
match runs in ONE Arrow-batched ``applyInPandas`` pass.

Restrictions (documented, checked):

* symbols must be MUTUALLY EXCLUSIVE per row (each row maps to at most
  one symbol — the common funnel/session shape). General
  MATCH_RECOGNIZE allows overlapping symbol predicates resolved by the
  pattern position; that needs an NFA per row and is out of scope.
* ``AFTER MATCH SKIP PAST LAST ROW`` semantics (non-overlapping
  matches), ``ONE ROW PER MATCH``.
* pattern is a regex over single-char symbol aliases (``A B+ C`` →
  ``AB+C``), supporting the full Python/RE2-shared regex subset on the
  symbol alphabet (quantifiers, alternation, grouping).

Scale: one shuffle on the partition key; each group is matched locally
in a single pass over its Arrow batch (groups = users/sessions — small
by construction in event logs); measures are computed on the matched
row slice without re-scanning the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def match_recognize(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    define: dict[str, str],
    pattern: str,
    measure_cols: list[str] | None = None,
    all_rows: bool = False,
) -> DataFrame:
    """ONE ROW PER MATCH row-pattern matching.

    ``define`` maps symbol alias -> SQL boolean expression; ``pattern``
    is a regex over the aliases (e.g. ``"V C+ P"``). Output columns:
    partition key, ``match_number`` (1-based per partition),
    ``n_rows`` (rows in the match), and for each measure column m:
    ``m_first`` / ``m_last`` (value on the match's first/last row).
    """
    symbols = list(define)
    if len(symbols) > 52:
        raise ValueError("too many symbols")
    # single-char alphabet for the regex (A..Z a..z by declaration order)
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    char_of = {s: alphabet[i] for i, s in enumerate(symbols)}
    import re as _re

    # Single-pass alternation (longest-name-first inside the
    # alternation): sequential per-symbol re.sub over the evolving
    # pattern would let a later substitution rewrite a char produced by
    # an earlier one when a symbol alias equals another symbol's
    # assigned alphabet letter (X->A, A->B turning "X A" into "B B").
    alt = "|".join(
        _re.escape(s) for s in sorted(symbols, key=len, reverse=True))
    rx_text = _re.sub(rf"\b(?:{alt})\b",
                      lambda m: char_of[m.group(0)], pattern)
    rx_text = rx_text.replace(" ", "")
    rx = _re.compile(rx_text)

    measure_cols = measure_cols or []
    # classify each row JVM-side: first (and by contract only) matching
    # symbol's char, '.' when none — the Python side sees one string col
    sym = F.lit(".")
    n_matching = F.lit(0)
    for s in reversed(symbols):
        sym = F.when(F.expr(define[s]), F.lit(char_of[s])).otherwise(sym)
    for s in symbols:
        n_matching = n_matching + F.expr(define[s]).cast("int")
    work = df.withColumn("__sym", sym).withColumn("__nmatch", n_matching)

    sym_of_char = {c: s for s, c in char_of.items()}
    if all_rows:
        # ALL ROWS PER MATCH: every matched input row comes back with
        # its match_number and CLASSIFIER (the symbol it matched as)
        out_fields = list(df.schema.fields) + [
            T.StructField("match_number", T.LongType()),
            T.StructField("classifier", T.StringType())]
        out_schema = T.StructType(out_fields)
        in_cols = [f.name for f in df.schema.fields]

        def _match_all(pdf: pd.DataFrame) -> pd.DataFrame:
            if (pdf["__nmatch"] > 1).any():
                raise ValueError(
                    "match_recognize: symbol predicates must be mutually exclusive")
            pdf = pdf.sort_values(order_by, kind="mergesort")
            s = "".join(pdf["__sym"].tolist())
            outs = []
            match_no = 0
            for m in rx.finditer(s):
                if m.start() == m.end():
                    continue
                match_no += 1
                seg = pdf.iloc[m.start():m.end()][in_cols].copy()
                seg["match_number"] = match_no
                seg["classifier"] = [sym_of_char[ch]
                                     for ch in s[m.start():m.end()]]
                outs.append(seg)
            if not outs:
                return pd.DataFrame(columns=[f.name for f in out_fields])
            return pd.concat(outs, ignore_index=True)

        return work.groupBy(partition_by).applyInPandas(
            _match_all, schema=out_schema)

    out_fields = [df.schema[partition_by], T.StructField("match_number", T.LongType()),
                  T.StructField("n_rows", T.LongType())]
    for m in measure_cols:
        out_fields.append(T.StructField(f"{m}_first", df.schema[m].dataType))
        out_fields.append(T.StructField(f"{m}_last", df.schema[m].dataType))
    out_schema = T.StructType(out_fields)

    def _match(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["__nmatch"] > 1).any():
            raise ValueError(
                "match_recognize: symbol predicates must be mutually exclusive")
        pdf = pdf.sort_values(order_by, kind="mergesort")
        s = "".join(pdf["__sym"].tolist())
        rows = []
        match_no = 0
        for m in rx.finditer(s):
            if m.start() == m.end():
                # fully-optional patterns (A? B?) admit zero-width
                # matches at every position; real MATCH_RECOGNIZE
                # never reports empty matches
                continue
            match_no += 1
            i = match_no
            seg = pdf.iloc[m.start():m.end()]
            row = {partition_by: pdf[partition_by].iloc[0],
                   "match_number": i, "n_rows": m.end() - m.start()}
            for c in measure_cols:
                row[f"{c}_first"] = seg[c].iloc[0]
                row[f"{c}_last"] = seg[c].iloc[-1]
            rows.append(row)
        cols = [f.name for f in out_fields]
        return pd.DataFrame(rows, columns=cols)

    return work.groupBy(partition_by).applyInPandas(_match, schema=out_schema)
