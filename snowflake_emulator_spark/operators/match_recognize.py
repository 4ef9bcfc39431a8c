"""MATCH_RECOGNIZE-style sequential row-pattern matching.

Snowflake's MATCH_RECOGNIZE (row pattern matching over partitions) has
no Spark SQL equivalent and no relational decomposition for general
regex patterns — this is exactly the "custom operator" case: symbol
predicates stay JVM-side Column expressions; the per-partition pattern
match runs in ONE Arrow-batched ``applyInPandas`` pass.

r10 (VERDICT r9 item 5): the r8 restriction that symbol predicates be
MUTUALLY EXCLUSIVE per row is lifted. Each row now carries a candidate
BITMASK (bit i set when DEFINE predicate i holds), computed JVM-side in
whole-stage codegen, and the Python kernel runs a greedy backtracking
matcher over the mask sequence — the classic NFA-over-character-classes
formulation, with SQL row-pattern preference order (greedy quantifiers,
leftmost alternation, reluctant ``*?``/``+?``/``??`` supported). A
symbol used in PATTERN but absent from DEFINE matches every row
(Snowflake's documented default).

Supported surface:

* ``ONE ROW PER MATCH`` and ``ALL ROWS PER MATCH`` (+ CLASSIFIER).
* ``AFTER MATCH SKIP PAST LAST ROW`` (default),
  ``AFTER MATCH SKIP TO NEXT ROW`` (overlapping matches), and
  ``AFTER MATCH SKIP TO [FIRST|LAST] <symbol>`` (r11: resume at the
  first/last row mapped to the symbol; unbound symbol or resuming at
  the match's own first row raises — SQL:2016 runtime errors).
* Symbol-qualified MEASURES (r11): ``FIRST(SYM.col)``,
  ``LAST(SYM.col)``, ``COUNT(SYM.*)``/``COUNT(SYM.col)`` over the rows
  mapped to SYM, with RUNNING/FINAL semantics in ALL ROWS mode.
* Pattern operators: sequence, alternation ``|``, grouping, ``*``,
  ``+``, ``?``, ``{m}``, ``{m,}``, ``{m,n}``, reluctant variants, and
  ``PERMUTE(...)`` (expanded to the lexicographic alternation of every
  ordering per SQL:2016, ≤ 6 elements), and ``^``/``$`` anchors
  (partition start/end, zero-width).
* DEFINE predicates may use ``PRIOR col`` navigation (r10; semantics
  corrected r11): SQL:2016 PREV / Snowflake LAG-in-DEFINE navigate the
  PARTITION physically — the value is the previous partition row even
  when that row precedes the match start, and is NULL only at the
  partition's first row. Implemented as a JVM-side ``F.lag`` column
  (lag is NULL exactly at partition row 0), so patterns whose first
  symbol uses PRIOR (``PATTERN(DOWN+ UP+)`` with
  ``DOWN AS price < PRIOR price``) match correctly.
* ``NEXT col`` navigation in DEFINE (r11): the symmetric physical
  ``F.lead`` column — NULL only at the partition's last row.

Scale: one shuffle on the partition key; each group is matched locally
in a single pass over its Arrow batch (groups = users/sessions — small
by construction in event logs); measures are computed on the matched
row slice without re-scanning the corpus. Backtracking is bounded by
the pattern size × group length; the quantifier-over-single-symbol hot
path (``B+``, ``C{2,5}``) is matched iteratively with no recursion.

r16 (guide §4.2): the per-group ``groupBy().applyInPandas`` execution
is replaced by ``repartition(key) + sortWithinPartitions(key, order) +
mapInPandas``. Semantics are unchanged (same hash distribution, same
total order per group — the ORDER BY sort moves from a per-group pandas
mergesort into JVM whole-stage codegen), but groups now stream through
large Arrow batches instead of one tiny Arrow batch per group, and the
kernel matches a whole block of groups per call using numpy slices of
the needed columns (no per-group DataFrame construction / concat). A
group that straddles an Arrow batch boundary is carried over to the
next batch, so kernel memory is bounded by batch size + one group
regardless of partition size. Measured at sf0.1 (100k events, 1.5k
groups): 3.41 s -> 0.68 s for the funnel shape, output tuple-identical
(``scratch/ab_match_recognize.py``).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------
# Pattern AST + parser
# ---------------------------------------------------------------------

class _Sym:
    __slots__ = ("idx",)

    def __init__(self, idx: int):
        self.idx = idx


class _Seq:
    __slots__ = ("parts",)

    def __init__(self, parts: list):
        self.parts = parts


class _Alt:
    __slots__ = ("alts",)

    def __init__(self, alts: list):
        self.alts = alts


class _Quant:
    __slots__ = ("node", "lo", "hi", "greedy")

    def __init__(self, node, lo: int, hi: int | None, greedy: bool):
        self.node = node
        self.lo = lo
        self.hi = hi  # None = unbounded
        self.greedy = greedy


class _Anchor:
    """``^`` (partition start) / ``$`` (partition end) — zero-width."""
    __slots__ = ("end",)

    def __init__(self, end: bool):
        self.end = end


class _Excl:
    """``{- pattern -}`` exclusion (SQL:2016): rows matched inside are
    part of the match (navigation/COUNT still see them) but are dropped
    from ALL ROWS PER MATCH output."""
    __slots__ = ("node",)

    def __init__(self, node):
        self.node = node


# classifier entries carry this flag when the row was matched inside a
# {- -} exclusion (bit 62 — symbol indices are capped at 60)
EXCL_FLAG = 1 << 62

_TOKEN_RE = _re.compile(
    r"\s*(?:([A-Za-z_]\w*)|(\{\s*\d+\s*(?:,\s*\d*\s*)?\})"
    r"|(\{-|-\})|([()|*+?^$,]))")


def parse_pattern(text: str, symbol_index: dict[str, int]) -> tuple:
    """Parse a PATTERN body over symbol aliases into an AST.

    ``symbol_index`` maps UPPER-cased symbol name -> bit index; symbols
    encountered in the pattern but absent are ADDED (Snowflake: an
    undefined symbol matches every row). Returns the AST root.
    """
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad PATTERN token at: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.group(1):
            if m.group(1).upper() == "PERMUTE":
                tokens.append(("permute", m.group(1)))
            else:
                tokens.append(("sym", m.group(1)))
        elif m.group(2):
            tokens.append(("rep", m.group(2)))
        elif m.group(3):
            tokens.append((m.group(3), m.group(3)))  # "{-" / "-}"
        else:
            tokens.append((m.group(4), m.group(4)))
    ti = 0

    def peek():
        return tokens[ti][0] if ti < len(tokens) else None

    def parse_alt():
        nonlocal ti
        parts = [parse_seq()]
        while peek() == "|":
            ti += 1
            parts.append(parse_seq())
        return parts[0] if len(parts) == 1 else _Alt(parts)

    def parse_seq():
        nonlocal ti
        atoms = []
        while peek() in ("sym", "(", "permute", "^", "$", "{-"):
            if peek() in ("^", "$"):
                atoms.append(_Anchor(peek() == "$"))
                ti += 1
                continue
            if peek() == "{-":
                ti += 1
                atoms.append(_Excl(parse_alt()))
                if peek() != "-}":
                    raise ValueError("unbalanced {- in PATTERN")
                ti += 1
                continue
            atoms.append(parse_quantified())
        if not atoms:
            raise ValueError("empty PATTERN sequence")
        return atoms[0] if len(atoms) == 1 else _Seq(atoms)

    def parse_permute():
        """PERMUTE(A, B, ...) — lexicographic-preference expansion into
        an alternation of every ordering (SQL:2016 defines PERMUTE as
        exactly this expansion; capped at 6 elements = 720 branches)."""
        nonlocal ti
        ti += 1  # PERMUTE
        if peek() != "(":
            raise ValueError("PERMUTE requires a parenthesized list")
        ti += 1
        elems = [parse_alt()]
        while peek() == ",":
            ti += 1
            elems.append(parse_alt())
        if peek() != ")":
            raise ValueError("unbalanced ( in PERMUTE")
        ti += 1
        if len(elems) > 6:
            raise NotImplementedError(
                "MATCH_RECOGNIZE: PERMUTE supports at most 6 elements")
        import itertools

        alts = [_Seq(list(p)) if len(p) > 1 else p[0]
                for p in itertools.permutations(elems)]
        return alts[0] if len(alts) == 1 else _Alt(alts)

    def parse_quantified():
        nonlocal ti
        kind, val = tokens[ti]
        if kind == "sym":
            ti += 1
            name = val.upper()
            if name not in symbol_index:
                symbol_index[name] = len(symbol_index)
            node = _Sym(symbol_index[name])
        elif kind == "permute":
            node = parse_permute()
        else:  # "("
            ti += 1
            node = parse_alt()
            if peek() != ")":
                raise ValueError("unbalanced ( in PATTERN")
            ti += 1
        while peek() in ("*", "+", "?", "rep"):
            kind2, val2 = tokens[ti]
            ti += 1
            if kind2 == "*":
                lo, hi = 0, None
            elif kind2 == "+":
                lo, hi = 1, None
            elif kind2 == "?":
                lo, hi = 0, 1
            else:
                nums = _re.findall(r"\d+", val2)
                if "," in val2:
                    lo = int(nums[0])
                    hi = int(nums[1]) if len(nums) > 1 else None
                else:
                    lo = hi = int(nums[0])
            greedy = True
            if peek() == "?":  # reluctant suffix
                ti += 1
                greedy = False
            node = _Quant(node, lo, hi, greedy)
        return node

    ast = parse_alt()
    if ti != len(tokens):
        raise ValueError(f"trailing PATTERN tokens: {tokens[ti:]}")
    return ast


# ---------------------------------------------------------------------
# Greedy backtracking matcher over candidate bitmasks
# ---------------------------------------------------------------------

def _gen(node, pos: int, ctx: tuple, cls: list):
    """Yield match end positions in SQL preference order. ``cls`` is a
    shared classifier stack: while a yield is suspended it holds the bit
    index of every row consumed by the current parse, in row order.

    ``masks`` carries each row's candidate bits; PRIOR/NEXT navigation
    is already resolved JVM-side (physical partition lag/lead columns),
    so the mask is position-independent — SQL:2016 PREV/NEXT semantics."""
    masks, excl = ctx

    if isinstance(node, _Sym):
        if pos < len(masks):
            row = masks[pos]
            if (row >> node.idx) & 1:
                cls.append(node.idx | (EXCL_FLAG if excl[0] else 0))
                yield pos + 1
                cls.pop()
        return
    if isinstance(node, _Excl):
        # rows consumed inside the exclusion carry EXCL_FLAG; the
        # counter is decremented while suspended at a yield so symbols
        # matched AFTER the exclusion are not flagged, and re-raised on
        # resume so backtracking INTO the body flags correctly again
        excl[0] += 1
        for q in _gen(node.node, pos, ctx, cls):
            excl[0] -= 1
            yield q
            excl[0] += 1
        excl[0] -= 1
        return
    if isinstance(node, _Anchor):
        # zero-width: ^ holds only at partition start, $ only at its end
        if (pos == len(masks)) if node.end else (pos == 0):
            yield pos
        return
    if isinstance(node, _Seq):
        parts = node.parts

        def rec(i, p):
            if i == len(parts):
                yield p
                return
            for q in _gen(parts[i], p, ctx, cls):
                yield from rec(i + 1, q)

        yield from rec(0, pos)
        return
    if isinstance(node, _Alt):
        for alt in node.alts:
            yield from _gen(alt, pos, ctx, cls)
        return
    # _Quant — iterative fast path for a quantified single symbol (the
    # common B+/C{2,5} shape): run length is precomputed, no recursion
    if isinstance(node.node, _Sym):
        idx = node.node.idx
        run = 0
        p = pos
        limit = node.hi if node.hi is not None else len(masks) - pos
        while p < len(masks) and run < limit:
            if not (masks[p] >> idx) & 1:
                break
            run += 1
            p += 1
        if run < node.lo:
            return
        counts = range(run, node.lo - 1, -1) if node.greedy else \
            range(node.lo, run + 1)
        mark = idx | (EXCL_FLAG if excl[0] else 0)
        for n_rep in counts:
            cls.extend([mark] * n_rep)
            yield pos + n_rep
            if n_rep:
                del cls[-n_rep:]
        return

    def rep(n_done, p):
        can_more = node.hi is None or n_done < node.hi
        done_ok = n_done >= node.lo

        def more():
            for q in _gen(node.node, p, ctx, cls):
                if q == p:  # zero-width repetition guard
                    continue
                yield from rep(n_done + 1, q)

        if node.greedy:
            if can_more:
                yield from more()
            if done_ok:
                yield p
        else:
            if done_ok:
                yield p
            if can_more:
                yield from more()

    yield from rep(0, pos)


def find_matches(ast, masks, skip_to_next_row: bool = False,
                 skip_to: tuple | None = None):
    """Return [(start, end, classifier_bits)] in match order. Zero-width
    matches are skipped (real MATCH_RECOGNIZE never reports empty
    matches). SKIP PAST LAST ROW resumes at ``end``; SKIP TO NEXT ROW
    resumes at ``start + 1`` (overlapping matches).

    ``skip_to`` = ("first"|"last", symbol_bits) implements SQL:2016
    AFTER MATCH SKIP TO FIRST|LAST <symbol>: the scan resumes AT the
    first/last match row mapped to the symbol (that row may start the
    next match). ``symbol_bits`` is a SET of symbol indices — one
    element for a plain symbol, several for a SUBSET union symbol
    (r13: a row is mapped to the subset when its classifier is ANY
    member). Per the standard, resuming at the match's own first
    row would loop forever and raises, as does a match in which the
    symbol was not bound."""
    out = []
    pos, n = 0, len(masks)
    while pos < n:
        cls: list[int] = []
        hit = None
        for e in _gen(ast, pos, (masks, [0]), cls):
            if e > pos:
                hit = (pos, e, cls.copy())
                break
        if hit is None:
            pos += 1
            continue
        out.append(hit)
        if skip_to is not None:
            mode, sym = skip_to
            rows = [i for i, b in enumerate(hit[2])
                    if (b & ~EXCL_FLAG) in sym]
            if not rows:
                raise ValueError(
                    "AFTER MATCH SKIP TO: the symbol was not bound in "
                    "the match (SQL:2016 runtime error)")
            rel = rows[0] if mode == "first" else rows[-1]
            if rel == 0:
                raise ValueError(
                    "AFTER MATCH SKIP TO FIRST/LAST would resume at the "
                    "match's first row (infinite loop — SQL:2016 "
                    "runtime error)")
            pos = hit[0] + rel
        elif skip_to_next_row:
            pos = pos + 1
        else:
            pos = hit[1]
    return out


# ---------------------------------------------------------------------
# Block execution: repartition + JVM sort + mapInPandas (r16)
# ---------------------------------------------------------------------

def _run_blocks(work: DataFrame, partition_by: str, order_by: list[str],
                out_schema: T.StructType, block_fn,
                kernel_cols: list[str] | None = None) -> DataFrame:
    """Execute ``block_fn(pdf, group_starts)`` over key-contiguous blocks.

    Rows are hash-distributed on the partition key (the same exchange a
    ``groupBy`` would plan) and sorted JVM-side by (key, *order_by) —
    ascending, NULLS LAST on the order columns to mirror the pandas
    ``sort_values`` the per-group kernel used. ``block_fn`` receives a
    positionally-indexed DataFrame holding only COMPLETE groups plus the
    array of group start offsets; a group cut by an Arrow batch boundary
    is prepended to the next batch (memory: one batch + one group).

    ``kernel_cols`` (r17, guide §4.1): the columns ``block_fn`` actually
    reads. mapInPandas is opaque to Catalyst, so without an explicit
    projection EVERY input column is transposed into Arrow and shipped
    to the Python worker — profiled at 10M events, a passthrough kernel
    over the full row took 7.2 s wall (114 s cumulative in-kernel feed
    time) before any matching ran. The projection runs AFTER the sort
    (row-order-preserving, no exchange), so order columns are sortable
    and then dropped when the kernel does not read them."""
    srt = (work.repartition(F.col(partition_by))
           .sortWithinPartitions(
               partition_by,
               *[F.col(c).asc_nulls_last() for c in order_by]))
    if kernel_cols is not None:
        srt = srt.select(*kernel_cols)

    def kernel(batches):
        pending = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            keys = pdf[partition_by].to_numpy()
            # null-safe boundary test (r17, ADVICE r16): a nullable
            # numeric key arrives as float NaN and NaN != NaN is True,
            # so the plain comparison would split every null-key row
            # into its own singleton group — groupBy() (the replaced
            # execution) matches the whole null group together. Two
            # adjacent nulls are NOT a boundary; null vs non-null is.
            nulls = pd.isna(keys)
            change = ((keys[1:] != keys[:-1])
                      & ~(nulls[1:] & nulls[:-1])).nonzero()[0] + 1
            if len(change):
                last_start = int(change[-1])
                out = block_fn(pdf.iloc[:last_start],
                               np.concatenate(([0], change[:-1])))
                pending = pdf.iloc[last_start:]
                if out is not None:
                    yield out
            else:
                pending = pdf
        if pending is not None and len(pending):
            out = block_fn(pending.reset_index(drop=True), np.array([0]))
            if out is not None:
                yield out

    return srt.mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------
# The Spark operator
# ---------------------------------------------------------------------

def match_recognize(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    define: dict[str, str],
    pattern: str,
    measure_cols: list[str] | None = None,
    all_rows: bool = False,
    after_match: str = "past_last",
    all_rows_measures: list[tuple] | None = None,
    count_cols: list[str] | None = None,
    skip_to_symbol: tuple | None = None,
    symbol_measures: list[tuple] | None = None,
    subsets: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Row-pattern matching over ``partition_by`` groups.

    ``define`` maps symbol alias -> SQL boolean expression (overlapping
    predicates allowed); ``pattern`` is a row-pattern over the aliases
    (e.g. ``"V C+ P"``). ``after_match``: ``"past_last"`` | ``"next_row"``;
    ``skip_to_symbol`` = ("first"|"last", SYMBOL) implements SQL:2016
    AFTER MATCH SKIP TO FIRST|LAST <symbol> (r11) and overrides
    ``after_match``.
    ONE ROW PER MATCH output: partition key, ``match_number`` (1-based
    per partition), ``n_rows``, ``m_first``/``m_last`` per measure
    column, and ``c_count`` (non-null COUNT(col)) per ``count_cols``
    entry. ALL ROWS PER MATCH output: every matched input row plus
    ``match_number`` and ``classifier``; ``all_rows_measures`` adds
    per-row measure columns as ``(fn, col, outname, final)`` tuples with
    fn in FIRST/LAST/COUNT/MATCH_NUMBER — RUNNING semantics by default
    (SQL:2016's ALL ROWS default: LAST/COUNT see rows up to the current
    one), FINAL when ``final`` is true.
    ``symbol_measures`` (r11) adds SYMBOL-QUALIFIED measures as
    ``(fn, symbol, col, outname, final)`` tuples with fn in
    FIRST/LAST/COUNT — computed over the match rows MAPPED TO that
    symbol (``LAST(UP.price)``, ``COUNT(UP.*)``; col "*" counts rows).
    In ONE ROW output they are final by definition; in ALL ROWS they
    honor running/final like the unqualified forms (a row before the
    symbol's first binding sees NULL / 0).
    ``subsets`` (r13, SQL:2016 SUBSET clause) maps a UNION-symbol name
    to its member symbols (``{"MOVE": ["DOWN", "UP"]}``); a match row
    is mapped to the subset when its CLASSIFIER is any member, i.e.
    the subset is a bitmask-OR over member symbols. Subset names are
    valid wherever a symbol qualifier is: ``symbol_measures``
    (``FIRST(MOVE.value)``, ``COUNT(MOVE.*)``) and
    ``skip_to_symbol`` (``AFTER MATCH SKIP TO LAST MOVE``). They are
    NOT usable inside DEFINE or PATTERN (matching Snowflake's surface).
    """
    define_uc = {k.upper(): v for k, v in define.items()}
    symbol_index: dict[str, int] = {s: i for i, s in enumerate(define_uc)}
    ast = parse_pattern(pattern, symbol_index)
    if len(symbol_index) > 60:
        raise ValueError("too many symbols")
    # r13 SUBSET: resolve union symbols to frozensets of member bits;
    # a plain symbol qualifier resolves to a one-element set, so every
    # downstream mapped-row test is uniformly `classifier_bit in set`
    union_bits: dict[str, frozenset] = {
        s: frozenset((i,)) for s, i in symbol_index.items()}
    for sname, members in (subsets or {}).items():
        s_uc = sname.upper()
        if s_uc in symbol_index:
            raise ValueError(
                f"SUBSET name {sname} collides with a pattern symbol")
        if not members:
            raise ValueError(f"SUBSET {sname} has no member symbols")
        bits = set()
        for mem in members:
            m_uc = mem.upper()
            if m_uc not in symbol_index:
                raise ValueError(
                    f"SUBSET {sname} references undefined symbol {mem}")
            bits.add(symbol_index[m_uc])
        union_bits[s_uc] = frozenset(bits)
    skip_next = {"past_last": False, "next_row": True}[after_match]
    skip_to = None
    if skip_to_symbol is not None:
        mode, sym_name = skip_to_symbol
        if mode not in ("first", "last"):
            raise ValueError(f"skip_to_symbol mode must be first|last: {mode}")
        sym_uc = sym_name.upper()
        if sym_uc not in union_bits:
            raise ValueError(
                f"AFTER MATCH SKIP TO references undefined symbol {sym_name}")
        skip_to = (mode, union_bits[sym_uc])
    symbol_measures = symbol_measures or []
    sym_ms: list[tuple] = []  # (fn, sym_bits, col, outname, final)
    for fn, sym_name, col, outname, final in symbol_measures:
        sym_uc = sym_name.upper()
        if sym_uc not in union_bits:
            raise ValueError(
                f"measure references undefined symbol {sym_name}")
        sym_ms.append((fn.upper(), union_bits[sym_uc], col, outname,
                       bool(final)))

    # JVM-side candidate bitmask: bit i set when DEFINE predicate i holds
    # (NULL -> false); symbols with no DEFINE entry match every row.
    # PRIOR/NEXT navigation inside DEFINE (r10, semantics fixed r11):
    # SQL:2016 PREV/NEXT navigate the PARTITION physically — `PRIOR col`
    # is the previous partition row (NULL only at partition row 0, even
    # when that row precedes the match start) and `NEXT col` is the next
    # partition row (NULL only at the partition's last row). Both are
    # precomputed JVM-side as lag/lead window columns, so the candidate
    # mask is position-independent.
    _PRIOR_DEF_RE = _re.compile(
        r"\bPRIOR\s*\(\s*([\w.\"]+)\s*\)|\bPRIOR\s+([\w.\"]+)", _re.I)
    _NEXT_DEF_RE = _re.compile(
        r"\bNEXT\s*\(\s*([\w.\"]+)\s*\)|\bNEXT\s+([\w.\"]+)", _re.I)
    src = df
    lag_cols: set[str] = set()
    lead_cols: set[str] = set()
    preds_nav: dict[str, str] = {}
    for name, pred in define_uc.items():
        if pred is None:
            continue

        def _sub_lag(m: _re.Match) -> str:
            col = (m.group(1) or m.group(2)).split(".")[-1].strip('"')
            lag_cols.add(col)
            return f"__lag_{col}"

        def _sub_lead(m: _re.Match) -> str:
            col = (m.group(1) or m.group(2)).split(".")[-1].strip('"')
            lead_cols.add(col)
            return f"__lead_{col}"

        pred = _PRIOR_DEF_RE.sub(_sub_lag, pred)
        pred = _NEXT_DEF_RE.sub(_sub_lead, pred)
        preds_nav[name] = pred
    if lag_cols or lead_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(partition_by).orderBy(
            *[F.col(c) for c in order_by])
        for col in sorted(lag_cols):
            src = src.withColumn(f"__lag_{col}", F.lag(F.col(col)).over(w))
        for col in sorted(lead_cols):
            src = src.withColumn(f"__lead_{col}", F.lead(F.col(col)).over(w))

    mask = F.lit(0).cast("long")
    for name, i in symbol_index.items():
        pred = preds_nav.get(name)
        bit = F.lit(1 << i).cast("long")
        if pred is None:
            mask = mask + bit
        else:
            mask = mask + F.when(
                F.coalesce(F.expr(pred), F.lit(False)), bit
            ).otherwise(F.lit(0).cast("long"))
    work = src.withColumn("__mask", mask)

    name_of_bit = {i: name for name, i in symbol_index.items()}
    if all_rows:
        # ALL ROWS PER MATCH: every matched input row comes back with
        # its match_number and CLASSIFIER (the symbol it matched as),
        # plus any requested per-row measures (RUNNING or FINAL)
        ms = all_rows_measures or []
        in_names = {f.name for f in df.schema.fields}
        out_fields = list(df.schema.fields) + [
            T.StructField("match_number", T.LongType()),
            T.StructField("classifier", T.StringType())]
        for fn, col, outname, _final in ms:
            if outname in in_names:
                raise ValueError(
                    f"measure alias {outname!r} collides with an input column")
            if fn in ("COUNT", "MATCH_NUMBER"):
                out_fields.append(T.StructField(outname, T.LongType()))
            else:  # FIRST / LAST carry the column's type
                out_fields.append(T.StructField(outname,
                                                df.schema[col].dataType))
        for fn, _sym, col, outname, _final in sym_ms:
            if outname in in_names:
                raise ValueError(
                    f"measure alias {outname!r} collides with an input column")
            if fn == "COUNT":
                out_fields.append(T.StructField(outname, T.LongType()))
            else:
                out_fields.append(T.StructField(outname,
                                                df.schema[col].dataType))
        out_schema = T.StructType(out_fields)
        in_cols = [f.name for f in df.schema.fields]
        extra_names = [f.name for f in out_fields[len(in_cols):]]
        need_cols = sorted(
            {col for fn, col, _o, _f in ms
             if fn in ("COUNT", "FIRST", "LAST") and col not in (None, "", "*")}
            | {col for fn, _s, col, _o, _f in sym_ms
               if col not in (None, "", "*")})

        def _block_all(pdf: pd.DataFrame, starts) -> pd.DataFrame | None:
            masks_all = pdf["__mask"].to_numpy()
            arrs = {c: pdf[c].to_numpy() for c in need_cols}
            idx_acc: list[int] = []
            extra = {nm: [] for nm in extra_names}
            ends = np.append(starts[1:], len(pdf))
            for st_g, en_g in zip(starts, ends):
                masks = masks_all[st_g:en_g].tolist()
                for match_no, (st, en, bits) in enumerate(
                        find_matches(ast, masks, skip_next, skip_to),
                        start=1):
                    a, b = st_g + st, st_g + en
                    n = en - st
                    vals: dict[str, list] = {
                        "match_number": [match_no] * n,
                        "classifier": [name_of_bit[bb & ~EXCL_FLAG]
                                       for bb in bits]}
                    for fn, col, outname, final in ms:
                        if fn == "MATCH_NUMBER":
                            vals[outname] = [match_no] * n
                        elif fn == "COUNT":
                            # COUNT(*) counts rows; COUNT(col) skips
                            # NULLs (r11 — Snowflake/SQL:2016 semantics)
                            if col in (None, "", "*"):
                                vals[outname] = ([n] * n if final
                                                 else list(range(1, n + 1)))
                            else:
                                nn = ~pd.isna(arrs[col][a:b])
                                vals[outname] = (
                                    [int(nn.sum())] * n if final
                                    else list(nn.cumsum().astype("int64")))
                        elif fn == "FIRST":  # running == final for FIRST
                            vals[outname] = [arrs[col][a]] * n
                        else:  # LAST
                            vals[outname] = (
                                [arrs[col][b - 1]] * n if final
                                else list(arrs[col][a:b]))
                    # symbol-qualified measures (r11): over the rows
                    # MAPPED TO the symbol; running forms see only
                    # bindings at or before the current row
                    for fn, sym, col, outname, final in sym_ms:
                        srows = [i for i, bb in enumerate(bits)
                                 if (bb & ~EXCL_FLAG) in sym]
                        if fn == "COUNT":
                            def _cnt_upto(k):
                                sel = [i for i in srows if i <= k]
                                if col in (None, "", "*"):
                                    return len(sel)
                                return int((~pd.isna(
                                    arrs[col][[a + i for i in sel]])).sum())
                            vals[outname] = (
                                [_cnt_upto(n - 1)] * n if final
                                else [_cnt_upto(k) for k in range(n)])
                        elif fn == "FIRST":
                            v = arrs[col][a + srows[0]] if srows else None
                            if final:
                                vals[outname] = [v] * n
                            else:
                                vals[outname] = [
                                    v if srows and srows[0] <= k else None
                                    for k in range(n)]
                        else:  # LAST
                            if final:
                                vals[outname] = [
                                    arrs[col][a + srows[-1]]
                                    if srows else None] * n
                            else:
                                lv = []
                                for k in range(n):
                                    sel = [i for i in srows if i <= k]
                                    lv.append(arrs[col][a + sel[-1]]
                                              if sel else None)
                                vals[outname] = lv
                    # {- -} exclusion: drop excluded rows from the
                    # OUTPUT only — measures above were computed over
                    # the full match (SQL:2016 exclusion semantics)
                    rows_abs = list(range(a, b))
                    if any(bb & EXCL_FLAG for bb in bits):
                        keep = [not (bb & EXCL_FLAG) for bb in bits]
                        rows_abs = [r for r, k2 in zip(rows_abs, keep)
                                    if k2]
                        for o in vals:
                            vals[o] = [v for v, k2 in zip(vals[o], keep)
                                       if k2]
                    idx_acc.extend(rows_abs)
                    for o in extra_names:
                        extra[o].extend(vals[o])
            if not idx_acc:
                return None
            base = pdf.iloc[idx_acc][in_cols].reset_index(drop=True)
            for o in extra_names:
                base[o] = extra[o]
            return base

        # ALL ROWS returns every input column, so only the JVM-side
        # navigation helpers (__lag_/__lead_) can be projected out of
        # the Arrow boundary (guide §4.1)
        return _run_blocks(work, partition_by, order_by, out_schema,
                           _block_all, kernel_cols=in_cols + ["__mask"])

    measure_cols = measure_cols or []
    count_cols = count_cols or []
    out_fields = [df.schema[partition_by],
                  T.StructField("match_number", T.LongType()),
                  T.StructField("n_rows", T.LongType())]
    for m in measure_cols:
        out_fields.append(T.StructField(f"{m}_first", df.schema[m].dataType))
        out_fields.append(T.StructField(f"{m}_last", df.schema[m].dataType))
    for m in count_cols:
        out_fields.append(T.StructField(f"{m}_count", T.LongType()))
    for fn, _sym, col, outname, _final in sym_ms:
        if fn == "COUNT":
            out_fields.append(T.StructField(outname, T.LongType()))
        else:
            out_fields.append(T.StructField(outname, df.schema[col].dataType))
    out_schema = T.StructType(out_fields)
    out_names = [f.name for f in out_fields]
    need_cols = sorted(
        set(measure_cols) | set(count_cols)
        | {col for fn, _s, col, _o, _f in sym_ms
           if col not in (None, "", "*")})

    def _block_one(pdf: pd.DataFrame, starts) -> pd.DataFrame | None:
        masks_all = pdf["__mask"].to_numpy()
        key_all = pdf[partition_by].to_numpy()
        arrs = {c: pdf[c].to_numpy() for c in need_cols}
        cols: dict[str, list] = {nm: [] for nm in out_names}
        ends = np.append(starts[1:], len(pdf))
        for st_g, en_g in zip(starts, ends):
            masks = masks_all[st_g:en_g].tolist()
            for match_no, (st, en, bits) in enumerate(
                    find_matches(ast, masks, skip_next, skip_to), start=1):
                a, b = st_g + st, st_g + en
                cols[partition_by].append(key_all[st_g])
                cols["match_number"].append(match_no)
                cols["n_rows"].append(en - st)
                for c in measure_cols:
                    cols[f"{c}_first"].append(arrs[c][a])
                    cols[f"{c}_last"].append(arrs[c][b - 1])
                for c in count_cols:
                    # COUNT(col) skips NULLs (r11)
                    cols[f"{c}_count"].append(
                        int((~pd.isna(arrs[c][a:b])).sum()))
                # symbol-qualified measures (r11): rows MAPPED TO the
                # symbol
                for fn, sym, col, outname, _final in sym_ms:
                    srows = [i for i, bb in enumerate(bits)
                             if (bb & ~EXCL_FLAG) in sym]
                    if fn == "COUNT":
                        if col in (None, "", "*"):
                            cols[outname].append(len(srows))
                        else:
                            cols[outname].append(int((~pd.isna(
                                arrs[col][[a + i for i in srows]])).sum()))
                    elif fn == "FIRST":
                        cols[outname].append(
                            arrs[col][a + srows[0]] if srows else None)
                    else:  # LAST
                        cols[outname].append(
                            arrs[col][a + srows[-1]] if srows else None)
        if not cols[partition_by]:
            return None
        return pd.DataFrame(cols, columns=out_names)

    # ONE ROW kernel reads only the key, the mask and the measure
    # columns — project everything else (incl. the order columns, dead
    # after the JVM sort) out of the Arrow boundary (guide §4.1)
    seen: dict[str, None] = {}
    for c in [partition_by, "__mask", *need_cols]:
        seen.setdefault(c)
    return _run_blocks(work, partition_by, order_by, out_schema, _block_one,
                       kernel_cols=list(seen))
