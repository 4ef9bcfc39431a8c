"""Snowflake -> Spark SQL translator.

Plays the same role as the reference's vitess-AST translator
(`/root/reference/pkg/query/translator.go:31-288`), re-expressed for
Spark SQL. The reference rewrites Snowflake-only functions into DuckDB
SQL; we rewrite into Spark SQL. Because Spark already ships ``nvl``,
``nvl2``, ``ifnull``, ``coalesce``, ``listagg`` (4.x), ``if`` and the
date-arithmetic family, our rule set is thinner; the genuinely-needed
rewrites are:

* ``IFF(c,t,f)``             -> ``if(c,t,f)``            (translator.go:33)
* ``OBJECT_CONSTRUCT(k,v,…)``-> ``to_json(named_struct(k,v,…))`` (translator.go:37)
* ``FLATTEN(x)``             -> ``explode(x)``            (translator.go:38)
* ``TO_VARIANT(x)``          -> ``CAST(x AS STRING)``     (translator.go:61-67; VARIANT is JSON text, SURVEY §1.3)
* ``PARSE_JSON(s)``          -> ``CAST(s AS STRING)``     (translator.go:70-75)
* ``DATEADD(part,n,d)``      -> ``timestampadd(PART,n,d)``(translator.go:79-84)
* ``DATEDIFF(part,s,e)``     -> boundary-crossing arithmetic per part
                                (translator.go:86-93; Snowflake/DuckDB
                                date_diff counts boundary crossings,
                                Spark's timestampdiff counts complete
                                intervals — so we expand to explicit
                                arithmetic to preserve semantics)
* ``X::TYPE``                -> ``CAST(X AS TYPE)`` with Snowflake type
                                names mapped (NUMBER->DECIMAL, VARIANT->STRING …)
* ``SQUARE(x)``              -> ``(x)*(x)``

Like the reference, unparseable/unknown constructs are returned
unchanged (graceful degradation, translator.go:121-127): Spark SQL is
the pass-through target exactly as DuckDB is for the reference.
Statements classified as DDL/SHOW/DESCRIBE/EXPLAIN skip translation
(translator.go:108-117) except for EXPLAIN's inner query.
"""

from __future__ import annotations

import re

from ..functions.typemap import snowflake_to_spark_ddl

# Snowflake date-part aliases -> canonical unit
_DATE_PART: dict[str, str] = {}
for _canon, _aliases in {
    "YEAR": ["Y", "YY", "YYY", "YYYY", "YR", "YEAR", "YEARS", "YRS"],
    "QUARTER": ["Q", "QTR", "QTRS", "QUARTER", "QUARTERS"],
    "MONTH": ["MM", "MON", "MONS", "MONTH", "MONTHS"],
    "WEEK": ["W", "WK", "WEEK", "WEEKS", "WEEKOFYEAR", "WOY", "WY"],
    "DAY": ["D", "DD", "DAY", "DAYS", "DAYOFMONTH"],
    "HOUR": ["H", "HH", "HR", "HOUR", "HOURS", "HRS"],
    "MINUTE": ["M", "MI", "MIN", "MINUTE", "MINUTES", "MINS"],
    "SECOND": ["S", "SEC", "SECOND", "SECONDS", "SECS"],
}.items():
    for _a in _aliases:
        _DATE_PART[_a] = _canon

_SECONDS = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1}

_IDENT_CALL_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

# Simple name-for-name function renames (argument lists preserved).


def match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at ``open_idx`` — quote-aware
    (''-escaped literals skipped); -1 when unbalanced. Shared by the
    translator and the scripting engine."""
    depth = 0
    i, n = open_idx, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def normalize_date_part(part: str) -> str | None:
    p = part.strip().strip("'\"").upper()
    return _DATE_PART.get(p)


# Snowflake date-format elements -> Spark (java.time) pattern letters.
# Case-insensitive on the Snowflake side (format elements are
# case-insensitive there; Spark letters are case-significant).
_SF_FMT_RE = re.compile(
    r"YYYY|YY|MON|MM|DY|DD|HH24|HH12|HH|MI|SS|FF[0-9]?|AM|PM|TZH|TZM", re.I
)
_SF_FMT_MAP = {
    "YYYY": "yyyy", "YY": "yy", "MON": "MMM", "MM": "MM", "DY": "EEE",
    "DD": "dd", "HH24": "HH", "HH12": "hh", "HH": "HH", "MI": "mm",
    "SS": "ss", "AM": "a", "PM": "a", "TZH": "x", "TZM": "",
}


def convert_snowflake_datefmt(fmt: str) -> str:
    """Convert a Snowflake format string (possibly a quoted SQL literal)
    to a Spark datetime pattern. Non-element characters pass through."""
    quoted = len(fmt) >= 2 and fmt[0] == "'" and fmt[-1] == "'"
    body = fmt[1:-1] if quoted else fmt

    def sub(m: re.Match) -> str:
        tok = m.group(0).upper()
        if tok.startswith("FF"):
            digits = int(tok[2:]) if len(tok) > 2 else 6
            return "S" * digits
        return _SF_FMT_MAP[tok]

    out = _SF_FMT_RE.sub(sub, body)
    return f"'{out}'" if quoted else out


class Translator:
    """String-level recursive translator with paren/quote awareness."""

    def translate(self, sql: str) -> str:
        s = sql.strip().rstrip(";").strip()
        up = s.upper()
        # DDL / SHOW / DESCRIBE skip translation (translator.go:108-117);
        # EXPLAIN translates its body.
        if up.startswith(("SHOW", "DESCRIBE", "DESC ")):
            return s
        if up.startswith("EXPLAIN"):
            # the body takes the FULL pipeline (QUALIFY, CONNECT BY,
            # SAMPLE, FLATTEN, ... ) — expression-only translation left
            # statement-level Snowflake syntax in place, so EXPLAIN of a
            # query failed where the query itself succeeded
            return s[:7] + " " + self.translate(s[7:])
        if up.startswith(("CREATE", "DROP", "ALTER")):
            return s  # DDL types handled by the catalog layer
        s = self._rewrite_top(s)
        s = self._rewrite_asof_join(s)
        s = self._rewrite_connect_by(s)
        s = self._rewrite_qualify(s)
        s = self._rewrite_sample(s)
        s = self._rewrite_generator(s)
        s = self._rewrite_split_to_table(s)
        s = self._rewrite_lateral_flatten(s)
        s = self._rewrite_listagg_distinct_within_group(s)
        s = self._rewrite_array_agg_within_group(s)
        s = self._rewrite_conditional_true_event(s)
        s = self._rewrite_conditional_change_event(s)
        s = self._rewrite_interval_literals(s)
        # Snowflake allows IGNORE|RESPECT NULLS INSIDE the window
        # function's parens (LAST_VALUE(v IGNORE NULLS)); Spark wants it
        # outside — move it (args without nested parens only: the inner
        # form with complex args still parses via the postfix spelling)
        s = re.sub(
            r"\b(FIRST_VALUE|LAST_VALUE|NTH_VALUE|LAG|LEAD)\s*"
            r"\(([^()']*?)\s+(IGNORE|RESPECT)\s+NULLS\s*\)",
            lambda m: (m.group(0) if s[:m.start()].count("'") % 2 == 1
                       else f"{m.group(1)}({m.group(2)}) {m.group(3)} NULLS"),
            s, flags=re.I)
        # SELECT * EXCLUDE (a, b) -> Spark's * EXCEPT (a, b); Snowflake
        # also allows the parenless single-column form
        s = re.sub(r"(\*\s+)EXCLUDE\s*\(", r"\1EXCEPT (", s, flags=re.I)
        s = re.sub(r"(\*\s+)EXCLUDE\s+([A-Za-z_]\w*)", r"\1EXCEPT (\2)", s, flags=re.I)
        # SELECT * [EXCEPT (...)] RENAME (a AS x[, ...]) — Spark has no
        # star-RENAME: fold the rename sources into the EXCEPT list and
        # append aliased projections. (Snowflake keeps the renamed
        # column's ordinal position; here it moves to the end — the
        # emulator's column-name-sorted comparisons are unaffected.)
        def _star_rename(m: re.Match) -> str:
            existing = [c.strip() for c in (m.group(2) or "").split(",")
                        if c.strip()]
            pairs = []
            for item in m.group(3).split(","):
                rm = re.match(r"^\s*([\w\"$]+)\s+AS\s+([\w\"$]+)\s*$",
                              item, re.I)
                if not rm:
                    return m.group(0)  # unparseable: leave for Spark to report
                pairs.append((rm.group(1), rm.group(2)))
            except_list = existing + [src for src, _ in pairs]
            aliases = ", ".join(f"{src} AS {dst}" for src, dst in pairs)
            return f"* EXCEPT ({', '.join(except_list)}), {aliases}"

        s = re.sub(
            r"\*\s*(EXCEPT\s*\(([^)]*)\)\s*)?RENAME\s*\(([^)]*)\)",
            _star_rename, s, flags=re.I)
        s = re.sub(
            r"\*\s*(EXCEPT\s*\(([^)]*)\)\s*)?RENAME\s+(([\w\"$]+\s+AS\s+[\w\"$]+))",
            _star_rename, s, flags=re.I)
        # expr COLLATE 'spec' (Snowflake quoted specification) -> Spark
        # collation name (unquoted); the COLLATE(expr, 'spec') function
        # form goes through _emit
        s = re.sub(
            r"\bCOLLATE\s+'([^']*)'",
            lambda m: f"COLLATE {_spark_collation(m.group(1))}",
            s, flags=re.I)
        return self.translate_expr(s)

    # -- ASOF JOIN ... MATCH_CONDITION (Snowflake native syntax) ----------
    # Rewritten onto the union + last()-window algorithm of
    # operators/asof.py — ONE shuffle on the ON keys, no range-join
    # blowup (each side is scanned once; the window carries the latest
    # eligible right ROW as a struct). The right side of a left row
    # with no eligible match is a NULL struct (Snowflake's outer
    # semantics). The rewrite exposes each input as a STRUCT column
    # named by its alias, so qualified references (l.a, r.b, l.*)
    # resolve as field accesses in the enclosing query; unqualified
    # column references are not supported (documented restriction).
    _ASOF_RE = re.compile(
        r"([\w.\"$]+)\s+(?:AS\s+)?(\w+)\s+ASOF\s+JOIN\s+"
        r"([\w.\"$]+)\s+(?:AS\s+)?(\w+)\s+MATCH_CONDITION\s*\(",
        re.I,
    )
    _ASOF_ON_RE = re.compile(
        r"^\s*ON\s+(.*?)(?=\s+(?:WHERE|GROUP|HAVING|QUALIFY|ORDER|LIMIT|UNION|INTERSECT|EXCEPT|MINUS)\b|$)",
        re.I | re.S,
    )

    def _rewrite_asof_join(self, s: str) -> str:
        if "ASOF" not in s.upper():
            return s
        m = self._ASOF_RE.search(s)
        if not m:
            return s
        ltab, la, rtab, ra = m.group(1), m.group(2), m.group(3), m.group(4)
        open_idx = m.end() - 1
        close_idx = self._match_paren(s, open_idx)
        cond = s[open_idx + 1:close_idx].strip()
        cm = re.match(
            rf"^{re.escape(la)}\.([\w\"$]+)\s*(>=|<=|>|<)\s*"
            rf"{re.escape(ra)}\.([\w\"$]+)$", cond, re.I)
        if not cm:
            # also accept the reversed spelling r.ts <= l.ts etc.
            cm2 = re.match(
                rf"^{re.escape(ra)}\.([\w\"$]+)\s*(>=|<=|>|<)\s*"
                rf"{re.escape(la)}\.([\w\"$]+)$", cond, re.I)
            if not cm2:
                raise NotImplementedError(
                    "ASOF JOIN MATCH_CONDITION must be a single "
                    "alias-qualified comparison (l.ts >= r.ts)")
            flip = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}
            lcol, op, rcol = cm2.group(3), flip[cm2.group(2)], cm2.group(1)
        else:
            lcol, op, rcol = cm.group(1), cm.group(2), cm.group(3)
        rest = s[close_idx + 1:]
        keys: list[tuple[str, str]] = []
        on_m = self._ASOF_ON_RE.match(rest)
        consumed = close_idx + 1
        if on_m:
            consumed = close_idx + 1 + on_m.end()
            for part in re.split(r"\s+AND\s+", on_m.group(1).strip(), flags=re.I):
                km = re.match(
                    rf"^\s*{re.escape(la)}\.([\w\"$]+)\s*=\s*"
                    rf"{re.escape(ra)}\.([\w\"$]+)\s*$", part, re.I)
                if not km:
                    km2 = re.match(
                        rf"^\s*{re.escape(ra)}\.([\w\"$]+)\s*=\s*"
                        rf"{re.escape(la)}\.([\w\"$]+)\s*$", part, re.I)
                    if not km2:
                        raise NotImplementedError(
                            "ASOF JOIN ON must be an AND of alias-"
                            "qualified equalities")
                    keys.append((km2.group(2), km2.group(1)))
                else:
                    keys.append((km.group(1), km.group(2)))
        # window direction: >=/> look BACKWARD (latest right at-or-
        # before); <=/< look FORWARD (earliest right at-or-after).
        # Ties resolve by ordering the right row before the left one
        # exactly when the comparison is inclusive.
        direction = "ASC" if op in (">=", ">") else "DESC"
        inclusive = op in (">=", "<=")
        tie = ("ASC" if inclusive else "DESC")  # side 0 (right) first when inclusive
        part_by = ""
        if keys:
            part_by = "PARTITION BY " + ", ".join(
                f"__k{i}" for i in range(len(keys))) + " "
        lkeys = ", ".join(f"{la}.{lk} AS __k{i}" for i, (lk, _rk) in enumerate(keys))
        rkeys = ", ".join(f"{ra}.{rk} AS __k{i}" for i, (_lk, rk) in enumerate(keys))
        lk_prefix = f"{lkeys}, " if keys else ""
        rk_prefix = f"{rkeys}, " if keys else ""
        # NULL semantics (Snowflake comparison: NULL >= x is NULL -> no
        # match): right rows whose timestamp or any ON key is NULL can
        # never match, so they are filtered out of the union; left rows
        # with a NULL timestamp sort FIRST regardless of direction so
        # the running last() sees no right row before them.
        r_null_guard = " AND ".join(
            [f"{ra}.{rcol} IS NOT NULL"]
            + [f"{ra}.{rk} IS NOT NULL" for (_lk, rk) in keys])
        derived = (
            f"(SELECT __x.__lrow AS {la}, __x.__m AS {ra} FROM ("
            f"SELECT __side, __lrow, last(__rrow, true) OVER ({part_by}"
            f"ORDER BY __t {direction} NULLS FIRST, __side {tie} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __m "
            f"FROM ("
            f"SELECT {lk_prefix}{la}.{lcol} AS __t, 1 AS __side, "
            f"struct({la}.*) AS __lrow, "
            f"(SELECT first(struct({ra}.*)) FROM {rtab} {ra} WHERE 1=0) AS __rrow "
            f"FROM {ltab} {la} "
            f"UNION ALL "
            f"SELECT {rk_prefix}{ra}.{rcol}, 0, "
            f"(SELECT first(struct({la}.*)) FROM {ltab} {la} WHERE 1=0), "
            f"struct({ra}.*) "
            f"FROM {rtab} {ra} WHERE {r_null_guard}"
            f") __in) __x WHERE __x.__side = 1) __asof"
        )
        out = s[:m.start()] + derived + s[consumed:]
        # a second ASOF JOIN in the same statement recurses
        return self._rewrite_asof_join(out)

    # -- ARRAY_AGG(x) WITHIN GROUP (ORDER BY k [ASC|DESC]) ----------------
    # Spark's array_agg/collect_list rejects WITHIN GROUP (only
    # listagg/percentile accept it), so rebuild the ordered aggregate as
    #   transform(sort_array(collect_list(struct(k, x)), asc), s -> s.v)
    # struct sort is lexicographic on (k, x) — deterministic even on key
    # ties, all JVM-side.
    _ARRAY_AGG_WG_RE = re.compile(
        r"ARRAY_AGG\s*\(([^()]+)\)\s*WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+"
        r"([^()]+?)(\s+ASC|\s+DESC)?(\s+NULLS\s+(?:FIRST|LAST))?\s*\)",
        re.I,
    )

    # -- LISTAGG(DISTINCT x, d) WITHIN GROUP (ORDER BY x) -----------------
    # Spark 4's native ListAgg crashes (ClassCastException in
    # withNewChildrenInternal) when DISTINCT and WITHIN GROUP combine
    # (found by the r8 aggregate fuzz family). Snowflake requires the
    # ORDER BY expression of a DISTINCT LISTAGG to BE the aggregated
    # expression, so the ordered distinct aggregate is exactly
    # array_join(array_sort(collect_set(x)), d) — all JVM-side, one
    # partial-aggregated pass, no Spark ListAgg involved.
    _LISTAGG_DISTINCT_WG_RE = re.compile(
        r"LISTAGG\s*\(\s*DISTINCT\s+([^(),]+?)\s*(?:,\s*('(?:[^']|'')*'))?"
        r"\s*\)\s*WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+[^()]+?"
        r"(\s+ASC|\s+DESC)?\s*\)",
        re.I,
    )

    def _rewrite_listagg_distinct_within_group(self, s: str) -> str:
        if "LISTAGG" not in s.upper() or "WITHIN" not in s.upper():
            return s

        def repl(m: re.Match) -> str:
            expr = m.group(1).strip()
            delim = m.group(2) or "''"
            desc = (m.group(3) or "").strip().upper() == "DESC"
            arr = f"array_sort(collect_set({expr}))"
            if desc:
                arr = f"reverse({arr})"
            return f"array_join({arr}, {delim})"

        return self._LISTAGG_DISTINCT_WG_RE.sub(repl, s)

    def _rewrite_array_agg_within_group(self, s: str) -> str:
        if "WITHIN" not in s.upper() or "ARRAY_AGG" not in s.upper():
            return s

        def repl(m: re.Match) -> str:
            # NULLS FIRST/LAST is consumed OUT of the key expression
            # (folding it into the struct field was a parse error) and
            # honored exactly via a leading null-flag struct field:
            # sorting structs compares fields in order, so (flag, k)
            # places null keys wherever the flag's boolean ordering
            # puts them — all four direction x nulls combinations,
            # including Snowflake's defaults (ASC->NULLS LAST,
            # DESC->NULLS FIRST), which bare struct sorting gets wrong
            expr, key = m.group(1).strip(), m.group(2).strip()
            asc_b = (m.group(3) or "").strip().upper() != "DESC"
            nulls = re.sub(r"\s+", " ", (m.group(4) or "").strip().upper())
            nf_b = (nulls == "NULLS FIRST") if nulls else (not asc_b)
            flag = "IS NULL" if asc_b != nf_b else "IS NOT NULL"
            asc = "true" if asc_b else "false"
            return (f"transform(sort_array(collect_list(struct("
                    f"({key}) {flag} AS n, {key} AS k, {expr} AS v)), "
                    f"{asc}), s -> s.v)")

        return self._ARRAY_AGG_WG_RE.sub(repl, s)

    # -- LATERAL SPLIT_TO_TABLE(x, d) -> lateral posexplode(split(...)) ----
    # Snowflake's SPLIT_TO_TABLE yields (SEQ, INDEX, VALUE); the rewrite
    # exposes 1-based INDEX and VALUE via Spark's lateral correlated
    # subquery over posexplode — fully JVM-side, parallel per input row.
    _KEYWORDS_AFTER_ALIAS = {
        "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "QUALIFY", "HAVING",
        "LEFT", "RIGHT", "INNER", "CROSS", "FULL", "UNION", "INTERSECT", "EXCEPT",
    }

    def _rewrite_split_to_table(self, s: str) -> str:
        if "SPLIT_TO_TABLE" not in s.upper():
            return s
        out: list[str] = []
        i = 0
        while True:
            m = re.search(
                r"(,\s*|\bFROM\s+)(LATERAL\s+|TABLE\s*\(\s*)"
                r"(STRTOK_)?SPLIT_TO_TABLE\s*\(", s[i:], re.I)
            if not m:
                out.append(s[i:])
                break
            # FROM-first form (no preceding table): the split is the sole
            # source, so emit a plain derived table instead of a lateral
            # join — the input expression is necessarily uncorrelated
            from_form = m.group(1).strip().upper() == "FROM"
            out.append(s[i:i + m.start()])
            if from_form:
                out.append(m.group(1))  # keep the FROM keyword
            table_form = m.group(2).strip().upper().startswith("TABLE")
            strtok_form = bool(m.group(3))
            open_idx = i + m.end() - 1
            close_idx = self._match_paren(s, open_idx)
            args = self._split_args(s[open_idx + 1:close_idx])
            j = close_idx + 1
            if table_form:  # consume the TABLE( wrapper's closing paren
                while j < len(s) and s[j].isspace():
                    j += 1
                if j < len(s) and s[j] == ")":
                    j += 1
            alias = "__split"
            am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", s[j:], re.I)
            if am and am.group(1).upper() not in self._KEYWORDS_AFTER_ALIAS:
                alias = am.group(1)
                j += am.end()
            # __SPLIT_RAW__: the delimiter here is ALREADY regex-escaped
            # (_regex_literal / _regex_charclass); the sentinel stops
            # the later SPLIT literal-quoting pass from double-wrapping
            # it. STRTOK_SPLIT_TO_TABLE treats the delimiter as a SET
            # of single characters and DROPS empty tokens (tokeN number
            # reflects the post-drop sequence) — SPLIT_TO_TABLE splits
            # on the whole literal and keeps empties.
            if strtok_form:
                delim = _regex_charclass(args[1]) if len(args) > 1 else "' '"
                tokens = (f"filter(__SPLIT_RAW__({args[0]}, {delim}), "
                          f"x -> x != '')")
            else:
                delim = _regex_literal(args[1]) if len(args) > 1 else "' '"
                tokens = f"__SPLIT_RAW__({args[0]}, {delim})"
            head = "" if from_form else " JOIN LATERAL"
            out.append(
                f"{head} (SELECT pos + 1 AS index, col AS value"
                f" FROM (SELECT posexplode({tokens}))) {alias}")
            i = j
        return "".join(out)

    # -- LATERAL FLATTEN(input => expr) -> lateral posexplode -------------
    # The canonical Snowflake VARIANT-explosion idiom. The alias exposes
    # Snowflake's INDEX (0-based, like Snowflake) and VALUE columns via a
    # correlated lateral subquery over posexplode — executor-parallel
    # per input row, same shape as SPLIT_TO_TABLE. The bare positional
    # form FLATTEN(x) stays on the expression path (-> explode(x)).
    def _rewrite_lateral_flatten(self, s: str) -> str:
        if "FLATTEN" not in s.upper():
            return s
        out: list[str] = []
        i = 0
        while True:
            m = re.search(r",\s*(?:LATERAL\s+|TABLE\s*\(\s*)?FLATTEN\s*\(\s*INPUT\s*=>", s[i:], re.I)
            if not m:
                out.append(s[i:])
                break
            out.append(s[i:i + m.start()])
            table_form = re.search(r"TABLE\s*\(", m.group(0), re.I) is not None
            open_idx = i + m.start() + m.group(0).rindex("(")
            close_idx = self._match_paren(s, open_idx)
            args = self._split_args(s[open_idx + 1:close_idx])
            expr = re.sub(r"^\s*INPUT\s*=>\s*", "", args[0], flags=re.I)
            j = close_idx + 1
            if table_form:  # consume the TABLE( wrapper's closing paren
                while j < len(s) and s[j].isspace():
                    j += 1
                if j < len(s) and s[j] == ")":
                    j += 1
            alias = "__flat"
            am = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", s[j:], re.I)
            if am and am.group(1).upper() not in self._KEYWORDS_AFTER_ALIAS:
                alias = am.group(1)
                j += am.end()
            outer = any(re.match(r"\s*OUTER\s*=>\s*TRUE\s*$", a, re.I) for a in args[1:])
            fn = "posexplode_outer" if outer else "posexplode"
            mode = next(
                (re.search(r"'(\w+)'", a).group(1).upper()
                 for a in args[1:]
                 if re.match(r"\s*MODE\s*=>", a, re.I) and re.search(r"'(\w+)'", a)),
                None,
            )
            if mode == "OBJECT":
                # object flattening: KEY + VALUE from the JSON-object
                # map (Spark explode over a map yields key, value);
                # INDEX is NULL like Snowflake's object mode
                efn = "explode_outer" if outer else "explode"
                out.append(
                    f" JOIN LATERAL (SELECT key, CAST(NULL AS INT) AS index, value"
                    f" FROM (SELECT {efn}(from_json({expr}, 'map<string,string>'))))"
                    f" {alias}")
            else:
                # a VARIANT path input (v:items) translates to
                # get_json_object(...) — a JSON STRING that posexplode
                # rejects; parse it to an array first (scalar-element
                # arrays, the same support level as OBJECT mode's
                # map<string,string>)
                if ":" in expr and re.search(
                        r"[A-Za-z_\"\)]\s*:\s*[A-Za-z_]", expr):
                    expr = f"from_json({expr}, 'array<string>')"
                out.append(
                    f" JOIN LATERAL (SELECT pos AS index, col AS value"
                    f" FROM (SELECT {fn}({expr}))) {alias}")
            i = j
        return "".join(out)

    # -- START WITH ... CONNECT BY PRIOR -> WITH RECURSIVE ----------------
    # Snowflake hierarchical queries onto Spark's native recursive CTE:
    #   SELECT <list> FROM t START WITH <seed> CONNECT BY <cond> [tail]
    # becomes an anchor (seed rows, LEVEL 1) plus a recursive member
    # joining child rows to the frontier; `PRIOR x` references the
    # parent side. LEVEL is exposed as a real column. Each recursion
    # round is one hash join against the (small) frontier — the same
    # shape Spark gives hand-written WITH RECURSIVE.
    # Snowflake interval literals: comma-separated multi-part bodies
    # ('1 day, 2 hours') and abbreviated/short units ('3 h', '90 s',
    # bare quantity = seconds). Spark's parser wants space-separated
    # full unit names.
    _INTERVAL_LIT_RE = re.compile(r"\bINTERVAL\s+'([^']*)'", re.I)
    _INTERVAL_UNITS = {
        "y": "year", "yy": "year", "yyy": "year", "yyyy": "year",
        "yr": "year", "yrs": "years", "year": "year", "years": "years",
        "q": "quarter", "qtr": "quarter", "qtrs": "quarters",
        "quarter": "quarter", "quarters": "quarters",
        "mm": "month", "mon": "month", "mons": "months",
        "month": "month", "months": "months",
        "w": "week", "wk": "week", "weekofyear": "week",
        "week": "week", "weeks": "weeks",
        "d": "day", "dd": "day", "day": "day", "days": "days",
        "h": "hour", "hh": "hour", "hr": "hour", "hrs": "hours",
        "hour": "hour", "hours": "hours",
        "m": "minute", "mi": "minute", "min": "minute", "mins": "minutes",
        "minute": "minute", "minutes": "minutes",
        "s": "second", "sec": "second", "secs": "seconds",
        "second": "second", "seconds": "seconds",
        "ms": "millisecond", "msec": "millisecond",
        "millisecond": "millisecond", "milliseconds": "milliseconds",
        "us": "microsecond", "usec": "microsecond",
        "microsecond": "microsecond", "microseconds": "microseconds",
    }

    def _rewrite_interval_literals(self, s: str) -> str:
        if "INTERVAL" not in s.upper():
            return s

        def repl(m: re.Match) -> str:
            # odd count of quotes before the match = inside a string
            # literal (''-escapes contribute two, preserving parity)
            if s[:m.start()].count("'") % 2 == 1:
                return m.group(0)
            parts_out = []
            for part in m.group(1).split(","):
                part = part.strip()
                if not part:
                    continue
                pm = re.match(r"^(-?\d+(?:\.\d+)?)\s*([A-Za-z]+)?$", part)
                if not pm:
                    return m.group(0)  # not a Snowflake quantity form
                unit = self._INTERVAL_UNITS.get((pm.group(2) or "s").lower())
                if unit is None:
                    return m.group(0)
                parts_out.append(f"{pm.group(1)} {unit}")
            if not parts_out:
                return m.group(0)
            return f"INTERVAL '{' '.join(parts_out)}'"

        return self._INTERVAL_LIT_RE.sub(repl, s)

    def _rewrite_connect_by(self, s: str) -> str:
        up = s.upper()
        if "CONNECT BY" not in up:
            return s
        sw = (self._find_top_level_keyword(s, "START")
              if "START WITH" in up else None)
        cb = self._find_top_level_keyword(s, "CONNECT")
        if cb is None or (sw is not None and cb < sw):
            return s
        swm = re.match(r"START\s+WITH", s[sw:], re.I) if sw is not None else None
        cbm = re.match(r"CONNECT\s+BY", s[cb:], re.I)
        if cbm is None or (sw is not None and swm is None):
            return s
        if sw is not None:
            head = s[:sw].rstrip()
            seed = s[sw + swm.end():cb].strip()
        else:
            # r10: omitted START WITH — every row is a root (Oracle/
            # Snowflake hierarchical-query default)
            head = s[:cb].rstrip()
            seed = "TRUE"
        rest = s[cb + cbm.end():]
        tail_pos = None
        for kw in ("ORDER", "LIMIT", "QUALIFY"):
            p = self._find_top_level_keyword(rest, kw)
            if p is not None and (tail_pos is None or p < tail_pos):
                tail_pos = p
        cond = rest[:tail_pos].strip() if tail_pos is not None else rest.strip()
        tail = (" " + rest[tail_pos:].strip()) if tail_pos is not None else ""
        # r10: WHERE between FROM and START WITH/CONNECT BY filters the
        # RESULT after hierarchy construction (Oracle/Snowflake apply
        # WHERE post-CONNECT BY, unlike join conditions)
        post_where = None
        wm_pos = self._find_top_level_keyword(head, "WHERE")
        if wm_pos is not None:
            post_where = head[wm_pos:].strip()
            pwm = re.match(r"WHERE\s+", post_where, re.I)
            if pwm:
                post_where = post_where[pwm.end():].strip()
                head = head[:wm_pos].rstrip()
            else:
                post_where = None
        fm = re.search(r"\bFROM\s+([\w.\"$]+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s*$",
                       head, re.I)
        if fm is None:
            return s
        table = fm.group(1)
        alias = fm.group(2)
        select_list = head[:fm.start()].strip()  # "SELECT <list>"
        # alias-qualified references: the anchor scans `{table} __t`, so
        # `e.mgr` in START WITH must become `__t.mgr`; the OUTER query
        # re-exposes the original alias on __hier so `SELECT e.name`
        # keeps resolving (dropping the alias broke every aliased query)
        if alias:
            seed = re.sub(rf"\b{re.escape(alias)}\.", "__t.", seed)

        # r10 (VERDICT r9 item 6): SYS_CONNECT_BY_PATH / CONNECT_BY_ROOT /
        # PRIOR in the SELECT list (and ORDER BY tail) become accumulated
        # columns of the recursive CTE: the path concatenates down each
        # frontier round, the root value is carried from the anchor, and
        # PRIOR reads the parent's column. Arguments are restricted to
        # simple column references (documented boundary — arbitrary
        # expressions would be ambiguous between the child/parent scans).
        extras: list[tuple[str, str, str]] = []  # (name, anchor, recursive)
        extra_of: dict[str, str] = {}

        def _add_extra(key: str, anchor_expr: str, rec_expr: str,
                       prefix: str) -> str:
            if key in extra_of:
                return extra_of[key]
            name = f"__{prefix}_{len(extras)}"
            extras.append((name, anchor_expr, rec_expr))
            extra_of[key] = name
            return name

        def _cbcol(raw: str) -> str:
            return raw.strip().split(".")[-1].strip('"')

        _CBP_RE = re.compile(
            r"\bSYS_CONNECT_BY_PATH\s*\(\s*([\w.\"]+)\s*,\s*"
            r"('(?:[^']|'')*')\s*\)", re.I)
        _CBR_PAREN_RE = re.compile(
            r"\bCONNECT_BY_ROOT\s*\(\s*([\w.\"]+)\s*\)", re.I)
        _CBR_BARE_RE = re.compile(r"\bCONNECT_BY_ROOT\s+([\w.\"]+)", re.I)
        _PRIOR_SEL_RE = re.compile(r"\bPRIOR\s+([\w.\"]+)", re.I)

        def _rewrite_hier_fns(text: str) -> str:
            def cbp(m: re.Match) -> str:
                col, sep = _cbcol(m.group(1)), m.group(2)
                return _add_extra(
                    f"cbp:{col}:{sep}",
                    f"CONCAT({sep}, CAST(__t.{col} AS STRING))",
                    f"CONCAT(__p.{{self}}, {sep}, CAST(__c.{col} AS STRING))",
                    "cbpath")

            def cbr(m: re.Match) -> str:
                col = _cbcol(m.group(1))
                return _add_extra(f"cbr:{col}", f"__t.{col}",
                                  "__p.{self}", "cbroot")

            def pri(m: re.Match) -> str:
                col = _cbcol(m.group(1))
                # anchor rows have no parent: NULL, typed via IF so the
                # UNION resolves to the column's real type
                return _add_extra(f"prior:{col}",
                                  f"IF(FALSE, __t.{col}, NULL)",
                                  f"__p.{col}", "cbprior")

            text = _CBP_RE.sub(cbp, text)
            text = _CBR_PAREN_RE.sub(cbr, text)
            text = _CBR_BARE_RE.sub(cbr, text)
            text = _PRIOR_SEL_RE.sub(pri, text)
            return text

        select_list = _rewrite_hier_fns(select_list)
        tail = _rewrite_hier_fns(tail)
        # r11 (ADVICE): the post-hierarchy WHERE may also reference
        # SYS_CONNECT_BY_PATH/CONNECT_BY_ROOT/PRIOR — rewrite it to the
        # same accumulated CTE columns (extras are materialized below,
        # after all three rewrites ran)
        if post_where:
            post_where = _rewrite_hier_fns(post_where)

        _KEYWORD_TOKENS = {"NULL", "TRUE", "FALSE", "AND", "OR", "NOT"}

        # PRIOR x -> parent (frontier) side; bare identifiers -> child.
        # Numeric/keyword/quoted tokens stay literals — qualifying
        # `10000` as `__c.10000` produced unparseable SQL.
        def side(tok: str) -> str:
            tok = tok.strip()
            pm = re.match(r"^PRIOR\s+([\w.]+)$", tok, re.I)
            if pm:
                return f"__p.{pm.group(1).split('.')[-1]}"
            if (not re.fullmatch(r"[\w.]+", tok)
                    or tok[0].isdigit() or tok[0] in "'\""
                    or tok.upper() in _KEYWORD_TOKENS):
                # complex expression: rewrite embedded PRIOR refs to the
                # frontier side and alias-qualified refs to the child
                # (e.g. 'e.a - 1' must become '__c.a - 1', not keep the
                # vanished alias)
                tok = re.sub(r"\bPRIOR\s+(?:[A-Za-z_]\w*\.)?(\w+)",
                             r"__p.\1", tok, flags=re.I)
                if alias:
                    tok = re.sub(rf"\b{re.escape(alias)}\.", "__c.", tok)
                return tok
            return f"__c.{tok.split('.')[-1]}"
        join_terms = []
        # split each term on its COMPARISON operator (>=/<=/!=/<> first
        # so '>=' never splits at the bare '=' leaving '> =' behind);
        # both operand sides get PRIOR/child qualification
        cmp_re = re.compile(r"(>=|<=|!=|<>|=|>|<)")
        for term in re.split(r"\bAND\b", cond, flags=re.I):
            m2 = cmp_re.search(term)
            if m2:
                lhs, op, rhs = (term[:m2.start()], m2.group(1),
                                term[m2.end():])
                join_terms.append(f"{side(lhs)} {op} {side(rhs)}")
            else:
                join_terms.append(term.strip())
        join_cond = " AND ".join(join_terms)
        anchor_extra = "".join(
            f", {a} AS {name}" for name, a, _r in extras)
        rec_extra = "".join(
            f", {r.replace('{self}', name)}" for name, _a, r in extras)
        where_sql = f" WHERE {post_where}" if post_where else ""
        return (
            f"WITH RECURSIVE __hier AS ("
            f"SELECT __t.*, 1 AS level{anchor_extra} "
            f"FROM {table} __t WHERE {seed} "
            f"UNION ALL "
            f"SELECT __c.*, __p.level + 1{rec_extra} FROM {table} __c "
            f"JOIN __hier __p ON {join_cond}) "
            f"{select_list} FROM __hier{' ' + alias if alias else ''}"
            f"{where_sql}{tail}"
        )

    # -- CONDITIONAL_TRUE_EVENT(expr) OVER (...) --------------------------
    # Snowflake's window event counter: increments on each row where
    # expr is true. Equivalent running conditional sum with an explicit
    # growing frame (Spark's default frame for sum() OVER (ORDER BY) is
    # RANGE, which double-counts ties — ROWS is the faithful frame).
    def _rewrite_conditional_true_event(self, s: str) -> str:
        if "CONDITIONAL_TRUE_EVENT" not in s.upper():
            return s
        out: list[str] = []
        i = 0
        while True:
            m = re.search(r"CONDITIONAL_TRUE_EVENT\s*\(", s[i:], re.I)
            if not m:
                out.append(s[i:])
                break
            out.append(s[i:i + m.start()])
            open_idx = i + m.end() - 1
            close_idx = self._match_paren(s, open_idx)
            expr = s[open_idx + 1:close_idx]
            j = close_idx + 1
            om = re.match(r"\s*OVER\s*\(", s[j:], re.I)
            if not om:  # no OVER clause: leave untouched (invalid anyway)
                out.append(s[i + m.start():j])
                i = j
                continue
            oopen = j + om.end() - 1
            oclose = self._match_paren(s, oopen)
            over = s[oopen + 1:oclose]
            out.append(
                f"SUM(CASE WHEN {expr} THEN 1 ELSE 0 END) OVER ({over} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            )
            i = oclose + 1
        return "".join(out)

    # -- CONDITIONAL_CHANGE_EVENT(expr) OVER (...) ------------------------
    # Increments when expr's value differs from the previous row's value
    # (Snowflake: transitions to/from NULL do NOT count). Needs the
    # previous row's value, and windows cannot nest — so the rewrite
    # goes two-level like QUALIFY: lag(expr) is computed in an injected
    # subquery, the running conditional sum in the outer select.
    # Handled shape: a top-level `SELECT <list> FROM <src> [WHERE …]
    # [ORDER BY/LIMIT …]` without GROUP BY; other shapes pass through.
    def _rewrite_conditional_change_event(self, s: str) -> str:
        if "CONDITIONAL_CHANGE_EVENT" not in s.upper():
            return s
        if self._find_top_level_keyword(s, "GROUP") is not None:
            return s
        occurrences: list[tuple[int, int, str, str]] = []  # start, end, expr, over
        i = 0
        while True:
            m = re.search(r"CONDITIONAL_CHANGE_EVENT\s*\(", s[i:], re.I)
            if not m:
                break
            open_idx = i + m.end() - 1
            close_idx = self._match_paren(s, open_idx)
            expr = s[open_idx + 1:close_idx]
            j = close_idx + 1
            om = re.match(r"\s*OVER\s*\(", s[j:], re.I)
            if not om:
                i = j
                continue
            oopen = j + om.end() - 1
            oclose = self._match_paren(s, oopen)
            occurrences.append((i + m.start(), oclose + 1, expr, s[oopen + 1:oclose]))
            i = oclose + 1
        if not occurrences:
            return s
        # outer text: each occurrence -> running sum over the injected
        # __cce_k column; inner: SELECT *, lag(expr) OVER (over) AS …
        out, prev_end, lag_cols = [], 0, []
        for k, (start, end, expr, over) in enumerate(occurrences):
            out.append(s[prev_end:start])
            out.append(
                f"SUM(CASE WHEN __cce_{k} IS NOT NULL AND ({expr}) IS NOT NULL "
                f"AND __cce_{k} <> ({expr}) THEN 1 ELSE 0 END) OVER ({over} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            )
            lag_cols.append(f"lag({expr}) OVER ({over}) AS __cce_{k}")
            prev_end = end
        out.append(s[prev_end:])
        rewritten = "".join(out)
        from_pos = self._find_top_level_keyword(rewritten, "FROM")
        if from_pos is None:
            return s
        # split the source clause from a top-level ORDER BY/LIMIT tail
        rest = rewritten[from_pos:]
        tail_pos = None
        for kw in ("ORDER", "LIMIT"):
            p = self._find_top_level_keyword(rest, kw)
            if p is not None and (tail_pos is None or p < tail_pos):
                tail_pos = p
        src = rest[:tail_pos].strip() if tail_pos is not None else rest.strip()
        tail = (" " + rest[tail_pos:].strip()) if tail_pos is not None else ""
        select_list = rewritten[:from_pos]
        inner = f"SELECT *, {', '.join(lag_cols)} {src}"
        # a bare * PROJECTION ITEM in the outer list would leak the
        # helper columns. Only a '*' standing alone as a select-list
        # item qualifies — a naive \*(?!\w) regex also matched the
        # multiplication operator (price * qty) and COUNT(*)
        hidden = ", ".join(f"__cce_{k}" for k in range(len(occurrences)))
        star = self._bare_star_item_pos(select_list)
        if star is not None:
            select_list = (select_list[:star] + f"* EXCEPT({hidden})"
                           + select_list[star + 1:])
        # re-expose the source's alias (or bare table name) on the
        # wrapping subquery so qualified references (t.city) in the
        # outer select list / ORDER BY keep resolving
        am = re.match(r"FROM\s+([\w.\"$]+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s*$",
                      src.strip(), re.I)
        outer_alias = "__cce_t"
        if am:
            cand = am.group(2) or am.group(1).split(".")[-1].strip('"')
            if cand.upper() not in ("WHERE", "GROUP", "QUALIFY", "HAVING"):
                outer_alias = cand
        return f"{select_list}FROM ({inner}) {outer_alias}{tail}"

    @staticmethod
    def _bare_star_item_pos(select_list: str) -> int | None:
        """Index of a top-level bare-star projection item ('*' alone
        between SELECT/',' and ','/end), or None. Depth- and
        string-aware so ``price * qty`` and ``COUNT(*)`` never match."""
        m = re.match(r"^\s*SELECT\s+(?:DISTINCT\s+)?", select_list, re.I)
        if not m:
            return None
        i, depth, n = m.end(), 0, len(select_list)
        item_start = True
        while i < n:
            c = select_list[i]
            if c == "'":
                j = i + 1
                while j < n:
                    if select_list[j] == "'":
                        if j + 1 < n and select_list[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                i = j + 1
                item_start = False
                continue
            if c in "([":
                depth += 1
                item_start = False
            elif c in ")]":
                depth -= 1
                item_start = False
            elif c == "," and depth == 0:
                item_start = True
            elif c == "*" and depth == 0 and item_start:
                j = i + 1
                while j < n and select_list[j].isspace():
                    j += 1
                if j >= n or select_list[j] == ",":
                    return i
                item_start = False
            elif not c.isspace():
                item_start = False
            i += 1
        return None

    # -- TABLE(GENERATOR(ROWCOUNT => n)) -> range(n) ----------------------
    # Snowflake's row generator maps onto Spark's native range() table
    # function — a parallel, partitioned source (each executor emits its
    # slice; no driver-side row list), so a 10^9-row series scales.
    _GENERATOR_RE = re.compile(
        r"\bTABLE\s*\(\s*GENERATOR\s*\(\s*ROWCOUNT\s*=>\s*(\d+)\s*\)\s*\)", re.I)

    def _rewrite_generator(self, s: str) -> str:
        if "GENERATOR" not in s.upper():
            return s
        out = self._GENERATOR_RE.sub(lambda m: f"range({m.group(1)})", s)
        if out != s:
            # SEQ4()/SEQ8() are the generator's row sequence -> range's id
            out = re.sub(r"\bSEQ[48]\s*\(\s*\)", "id", out, flags=re.I)
        return out

    # -- SAMPLE (n) -> TABLESAMPLE (n PERCENT) ----------------------------

    # SYSTEM/BLOCK sampling emulated as row sampling (the emulator's
    # storage unit is the parquet file, not a Snowflake micro-partition;
    # the sampled FRACTION contract still holds). Bare TABLESAMPLE is a
    # Snowflake synonym of SAMPLE.
    _SAMPLE_ROWS_RE = re.compile(
        r"\b(?:TABLE)?SAMPLE\s*(?:BERNOULLI\s*|ROW\s*|SYSTEM\s*|BLOCK\s*)?"
        r"\(\s*(\d+)\s+ROWS\s*\)", re.I)
    _SAMPLE_RE = re.compile(
        r"\b(?:TABLE)?SAMPLE\s*(?:BERNOULLI\s*|ROW\s*|SYSTEM\s*|BLOCK\s*)?"
        r"\(\s*(\d+(?:\.\d+)?)\s*\)", re.I)
    _SAMPLE_SEED_RE = re.compile(r"\bSEED\s*\(\s*(\d+)\s*\)", re.I)

    def _rewrite_sample(self, s: str) -> str:
        """Snowflake ``SAMPLE (p)`` / ``SAMPLE BERNOULLI (p)`` (percent
        row sampling) -> Spark ``TABLESAMPLE (p PERCENT)``; fixed-size
        ``SAMPLE (n ROWS)`` -> ``TABLESAMPLE (n ROWS)``."""
        s = self._SAMPLE_ROWS_RE.sub(lambda m: f"TABLESAMPLE ({m.group(1)} ROWS)", s)
        s = self._SAMPLE_RE.sub(lambda m: f"TABLESAMPLE ({m.group(1)} PERCENT)", s)
        # Snowflake SEED (n) -> Spark REPEATABLE (n), only after a
        # TABLESAMPLE was produced (bare SEED stays untouched)
        if "TABLESAMPLE" in s.upper():
            s = self._SAMPLE_SEED_RE.sub(lambda m: f"REPEATABLE ({m.group(1)})", s)
        return s

    # -- SELECT TOP n -> LIMIT n ------------------------------------------

    _TOP_RE = re.compile(r"^(\s*SELECT\s+)TOP\s+(\d+)\s+", re.I)

    def _rewrite_top(self, s: str) -> str:
        m = self._TOP_RE.match(s)
        if not m or re.search(r"\bLIMIT\s+\d+\s*$", s, re.I):
            return s
        body = m.group(1) + s[m.end():]
        # TOP binds to ITS branch: appending LIMIT to the whole
        # statement silently limited an entire UNION. Parenthesize the
        # first set-operation branch with its LIMIT instead.
        setpos = None
        for kw in ("UNION", "INTERSECT", "EXCEPT", "MINUS"):
            p = self._find_top_level_keyword(body, kw)
            if p is not None and (setpos is None or p < setpos):
                setpos = p
        if setpos is not None:
            return (f"({body[:setpos].rstrip()} LIMIT {m.group(2)}) "
                    f"{body[setpos:]}")
        return body + f" LIMIT {m.group(2)}"

    # -- QUALIFY -> subquery with computed predicate ----------------------

    def _rewrite_qualify(self, s: str) -> str:
        """Rewrite Snowflake's QUALIFY clause (window-function filter;
        Spark SQL has no QUALIFY):

            SELECT <list> FROM ... [GROUP BY/HAVING] QUALIFY <cond> [tail]
        ->  SELECT * EXCEPT(__qualify) FROM (
              SELECT <list>, (<cond>) AS __qualify FROM ... ) WHERE __qualify [tail]

        The predicate is computed in the subquery because window
        functions are illegal in WHERE."""
        qpos = self._find_top_level_keyword(s, "QUALIFY")
        if qpos is None:
            return s
        base = s[:qpos].rstrip()
        rest = s[qpos + len("QUALIFY"):]
        # condition runs to the next top-level ORDER BY / LIMIT / OFFSET
        tail_pos = None
        for kw in ("ORDER", "LIMIT", "OFFSET"):
            p = self._find_top_level_keyword(rest, kw)
            if p is not None and (tail_pos is None or p < tail_pos):
                tail_pos = p
        cond = rest[:tail_pos].strip() if tail_pos is not None else rest.strip()
        tail = (" " + rest[tail_pos:].strip()) if tail_pos is not None else ""
        from_pos = self._find_top_level_keyword(base, "FROM")
        if from_pos is None:
            return s
        injected = f"{base[:from_pos].rstrip()}, ({cond}) AS __qualify {base[from_pos:]}"
        return (f"SELECT * EXCEPT(__qualify) FROM ({injected}) "
                f"WHERE __qualify{tail}")

    def _find_top_level_keyword(self, s: str, kw: str) -> int | None:
        """Index of the first depth-0 occurrence of keyword ``kw``
        (word-bounded, outside strings/parens)."""
        depth = 0
        i, n = 0, len(s)
        kw_up = kw.upper()
        k = len(kw)
        while i < n:
            c = s[i]
            if c == "'":
                i = self._skip_string(s, i)
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and s[i : i + k].upper() == kw_up:
                before_ok = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
                after_ok = i + k >= n or not (s[i + k].isalnum() or s[i + k] == "_")
                if before_ok and after_ok:
                    return i
            i += 1
        return None

    # -- expression-level translation ------------------------------------

    # words after which a '[' opens an ARRAY CONSTANT rather than a
    # subscript (an expression may start after any of these)
    _KW_BEFORE_LITERAL = {
        "SELECT", "WHERE", "WHEN", "THEN", "ELSE", "AND", "OR", "NOT",
        "IN", "VALUES", "BY", "ON", "HAVING", "SET", "RETURN", "UNION",
        "ALL", "DISTINCT", "CASE", "LIKE", "BETWEEN", "IS", "QUALIFY",
        "COALESCE", "IFF", "ELSEIF", "DO", "LOOP", "USING",
    }

    def _starts_expression(self, s: str, i: int) -> bool:
        """True when position ``i`` is a place an expression can START
        (so a '[' there is an array constant, not a subscript)."""
        j = i - 1
        while j >= 0 and s[j].isspace():
            j -= 1
        if j < 0:
            return True
        c = s[j]
        if c in "(,=<>+-*/%|&:[{":
            return True
        if c.isalnum() or c == "_":
            m = re.search(r"[A-Za-z_][A-Za-z_0-9]*$", s[:j + 1])
            return bool(m) and m.group(0).upper() in self._KW_BEFORE_LITERAL
        return False  # ')', ']', '"', "'" -> subscript position

    def _match_bracket(self, s: str, i: int, op: str, cl: str) -> int:
        """Index of the ``cl`` matching the ``op`` at ``i`` (string- and
        quoted-identifier-aware), or -1 if unbalanced."""
        depth, j, n = 0, i, len(s)
        while j < n:
            c = s[j]
            if c == "'":
                j = self._skip_string(s, j)
                continue
            if c == '"':
                j = self._skip_quoted_ident(s, j)
                continue
            if c == op:
                depth += 1
            elif c == cl:
                depth -= 1
                if depth == 0:
                    return j
            j += 1
        return -1

    def _object_literal(self, content: str) -> str | None:
        """Rewrite the body of a ``{...}`` OBJECT constant onto an
        OBJECT_CONSTRUCT argument list; None when the body does not
        parse as ``key: value, ...`` (leave the braces untouched)."""
        if not content.strip():
            return "OBJECT_CONSTRUCT()"
        parts: list[str] = []
        depth, start, j, n = 0, 0, 0, len(content)
        while j < n:
            c = content[j]
            if c == "'":
                j = self._skip_string(content, j)
                continue
            if c == '"':
                j = self._skip_quoted_ident(content, j)
                continue
            if c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
            elif c == "," and depth == 0:
                parts.append(content[start:j])
                start = j + 1
            j += 1
        parts.append(content[start:])
        kvs: list[str] = []
        for part in parts:
            m = re.match(
                r"\s*(?:'((?:[^']|'')*)'|\"([^\"]*)\"|([A-Za-z_]\w*))"
                r"\s*:(.+)$", part, re.S)
            if not m:
                return None
            key = next(g for g in m.group(1, 2, 3) if g is not None)
            val = self._rewrite_const_literals(m.group(4)).strip()
            kvs.append(f"'{key}', {val}")
        return f"OBJECT_CONSTRUCT({', '.join(kvs)})"

    def _rewrite_const_literals(self, s: str) -> str:
        """Snowflake constant syntax: ``[e1, e2, ...]`` array constants
        -> ``array(...)`` and ``{'k': v, ...}`` object constants ->
        ``OBJECT_CONSTRUCT(...)`` (picked up by the normal call-rewrite
        pass downstream). Subscript access ``expr[i]`` is left alone —
        a '[' only counts as a constant at expression-start positions."""
        if "[" not in s and "{" not in s:
            return s
        out: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = self._skip_string(s, i)
                out.append(s[i:j])
                i = j
                continue
            if c == '"':
                j = self._skip_quoted_ident(s, i)
                out.append(s[i:j])
                i = j
                continue
            if c == "[" and self._starts_expression(s, i):
                j = self._match_bracket(s, i, "[", "]")
                if j != -1:
                    inner = self._rewrite_const_literals(s[i + 1:j])
                    out.append(f"array({inner})")
                    i = j + 1
                    continue
            if c == "{":
                j = self._match_bracket(s, i, "{", "}")
                if j != -1:
                    obj = self._object_literal(s[i + 1:j])
                    if obj is not None:
                        out.append(obj)
                        i = j + 1
                        continue
            out.append(c)
            i += 1
        return "".join(out)

    # VARIANT-producing call heads whose result is JSON text (§1.3), so
    # a '[...]' subscript on them must become a JSON-path probe rather
    # than a native Spark array subscript
    _VARIANT_HEADS = ("PARSE_JSON", "TRY_PARSE_JSON", "OBJECT_CONSTRUCT",
                      "OBJECT_CONSTRUCT_KEEP_NULL", "TO_VARIANT")

    def _rewrite_variant_subscripts(self, s: str) -> str:
        """``PARSE_JSON(x)[0]['k'][2]`` -> ``get_json_object(PARSE_JSON(x),
        '$[0].k[2]')`` — consecutive int-literal / string-literal
        subscripts on a VARIANT-producing call compose into one JSON
        path (Snowflake element access; a native Spark subscript on the
        JSON text would be a type error). Non-literal subscripts fall
        back to the runtime object-then-array probe GET uses."""
        up = s.upper()
        out: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = self._skip_string(s, i)
                out.append(s[i:j]); i = j
                continue
            hit = None
            if c.isalpha() and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
                for h in self._VARIANT_HEADS:
                    if up.startswith(h, i) and not (up.startswith("OBJECT_CONSTRUCT_KEEP_NULL", i) and h == "OBJECT_CONSTRUCT"):
                        k = i + len(h)
                        while k < n and s[k].isspace():
                            k += 1
                        if k < n and s[k] == "(":
                            hit = (h, k)
                            break
            if hit is None:
                out.append(c); i += 1
                continue
            h, op = hit
            cl = self._match_bracket(s, op, "(", ")")
            if cl == -1 or cl + 1 >= n or s[cl + 1] != "[":
                # no subscript: keep scanning INSIDE the argument list
                # (a nested variant subscript may live there)
                out.append(s[i:op + 1])
                i = op + 1
                continue
            call = self._rewrite_variant_subscripts(s[i:cl + 1])
            path, j = [], cl + 1
            while j < n and s[j] == "[":
                e = self._match_bracket(s, j, "[", "]")
                if e == -1:
                    break
                sub = s[j + 1:e].strip()
                if sub.lstrip("+-").isdigit() and not sub.startswith("-"):
                    path.append(f"[{sub}]")
                elif len(sub) >= 2 and sub[0] == "'" and sub[-1] == "'" and "'" not in sub[1:-1]:
                    path.append(f".{sub[1:-1]}")
                else:
                    break
                j = e + 1
            if not path:
                # non-literal subscript: runtime object/array probe
                e = self._match_bracket(s, cl + 1, "[", "]")
                key = self._rewrite_variant_subscripts(s[cl + 2:e])
                out.append(
                    f"coalesce(get_json_object({call}, concat('$.', CAST({key} AS STRING))), "
                    f"get_json_object({call}, concat('$[', CAST({key} AS STRING), ']')))")
                i = e + 1
                continue
            out.append(f"get_json_object({call}, '${''.join(path)}')")
            i = j
        return "".join(out)

    def translate_expr(self, s: str) -> str:
        out = self._rewrite_const_literals(s)
        out = self._rewrite_variant_subscripts(out)
        out = self._rewrite_calls(out)
        out = self._rewrite_variant_paths(out)
        out = self._rewrite_double_colon_casts(out)
        out = self._rewrite_order_by_nulls(out)
        return out

    # sort items end at a clause keyword, a frame spec (inside OVER),
    # or the enclosing paren
    _ORDER_STOP_KWS = ("LIMIT", "OFFSET", "FETCH", "ROWS", "RANGE",
                       "GROUPS", "UNION", "INTERSECT", "EXCEPT", "MINUS",
                       "WINDOW", "QUALIFY", "HAVING", "FOR")

    def _rewrite_order_by_nulls(self, s: str) -> str:
        """Append Snowflake's default null ordering to every ORDER BY
        item that lacks an explicit NULLS clause: ASC sorts NULLS LAST
        and DESC sorts NULLS FIRST (DuckDB/Postgres agree), while
        Spark's defaults are the opposite — without this, a query like
        ``ORDER BY nullable_col LIMIT 10`` returns the nulls first and
        therefore DIFFERENT ROWS than Snowflake would."""
        up = s.upper()
        if "ORDER" not in up:
            return s
        out, i, n = [], 0, len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = self._skip_string(s, i)
                out.append(s[i:j])
                i = j
                continue
            if c == '"':
                j = self._skip_quoted_ident(s, i)
                out.append(s[i:j])
                i = j
                continue
            m = re.match(r"ORDER\s+BY\s+", s[i:], re.I)
            if not (m and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))):
                out.append(c)
                i += 1
                continue
            out.append(s[i:i + m.end()])
            i += m.end()
            # parse comma-separated sort items at this nesting level
            item_start, depth = i, 0
            items: list[str] = []

            def flush(end: int) -> None:
                if s[item_start:end].strip():
                    items.append(s[item_start:end])

            while i < n:
                c = s[i]
                if c == "'":
                    i = self._skip_string(s, i)
                    continue
                if c == '"':
                    # quoted identifier: never a stop keyword, even if
                    # its text equals one (e.g. ORDER BY "FOR")
                    i = self._skip_quoted_ident(s, i)
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif c == "," and depth == 0:
                    flush(i)
                    item_start = i + 1
                elif depth == 0 and c.isalpha():
                    km = re.match(r"[A-Za-z_]+", s[i:])
                    kw = km.group(0).upper()
                    before_ok = not (s[i - 1].isalnum() or s[i - 1] == "_")
                    if before_ok and kw in self._ORDER_STOP_KWS:
                        break
                    i += km.end()
                    continue
                i += 1
            flush(i)

            def fix(item: str) -> str:
                body = item.rstrip()
                trail = item[len(body):]
                if re.search(r"NULLS\s+(FIRST|LAST)\s*$", body, re.I):
                    return item
                if re.search(r"\bDESC\s*$", body, re.I):
                    return f"{body} NULLS FIRST{trail}"
                return f"{body} NULLS LAST{trail}"

            out.append(",".join(fix(it) for it in items))
        return "".join(out)

    # -- VARIANT path access (col:field[.sub] -> get_json_object) ---------

    def _rewrite_variant_paths(self, s: str) -> str:
        """Rewrite Snowflake's ``col:field.sub`` VARIANT access onto
        ``get_json_object(col, '$.field.sub')``.

        Beyond-reference upgrade: the reference's vitess parser cannot
        parse ``:`` paths, so such queries fail there
        (translator.go:121-127 falls through and DuckDB rejects them);
        our VARIANT columns are JSON text (SURVEY §1.3), which Spark's
        get_json_object consumes directly. Positional bindings (``:1``)
        and ``::`` casts are untouched."""
        out: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = self._skip_string(s, i)
                out.append(s[i:j])
                i = j
                continue
            if (
                c == ":"
                and i + 1 < n
                and (s[i + 1].isalpha() or s[i + 1] in '_"')
                and (i + 1 >= n or s[i + 1] != ":")
                and (i == 0 or s[i - 1] != ":")
            ):
                # walk left over the base identifier (possibly qualified)
                k = len(out)
                base_chars: list[str] = []
                while k > 0 and len(out[k - 1]) == 1 and (out[k - 1].isalnum() or out[k - 1] in "_$."):
                    base_chars.insert(0, out[k - 1])
                    k -= 1
                base = "".join(base_chars)
                if base and (base[0].isalpha() or base[0] in "_\"$"):
                    # segment walk: bare identifiers AND "quoted"
                    # segments (props:"a"."b"), with [n] element access
                    # folded INTO the JSON path — leaving the subscript
                    # outside would subscript the STRING that
                    # get_json_object returns (AnalysisException)
                    j = i + 1
                    path = ""
                    while j < n:
                        if s[j] == '"':
                            k2 = s.find('"', j + 1)
                            if k2 < 0:
                                break
                            seg = s[j + 1:k2]
                            j = k2 + 1
                            path += (("." if path else "") + seg
                                     if re.fullmatch(r"[A-Za-z_$][\w$]*", seg)
                                     else f"['{seg}']")
                        else:
                            sm2 = re.match(r"[A-Za-z_$][\w$]*", s[j:])
                            if not sm2:
                                break
                            path += ("." if path else "") + sm2.group(0)
                            j += sm2.end()
                        while j < n and s[j] == "[":
                            im = re.match(r"\[\s*(\d+)\s*\]", s[j:])
                            if not im:
                                break
                            path += f"[{im.group(1)}]"
                            j += im.end()
                        if j < n and s[j] == "." and j + 1 < n and (
                                s[j + 1].isalpha() or s[j + 1] in '_$"'):
                            j += 1
                            continue
                        break
                    if not path:
                        out.append(c)
                        i += 1
                        continue
                    del out[k:]
                    lead = "" if path.startswith("[") else "."
                    # bracket segments carry single quotes — double them
                    # so the emitted SQL string literal stays well-formed
                    lit = f"${lead}{path}".replace("'", "''")
                    out.append(f"get_json_object({base}, '{lit}')")
                    i = j
                    continue
            out.append(c)
            i += 1
        return "".join(out)

    def _rewrite_calls(self, s: str) -> str:
        """Scan for known function calls, rewrite them (recursively
        translating arguments), leave everything else untouched."""
        result: list[str] = []
        i, n = 0, len(s)
        while i < n:
            ch = s[i]
            if ch == "'":
                j = self._skip_string(s, i)
                result.append(s[i:j])
                i = j
                continue
            if ch == '"':
                j = i + 1
                while j < n and s[j] != '"':
                    j += 1
                result.append(s[i : j + 1])
                i = j + 1
                continue
            m = _IDENT_CALL_RE.match(s, i)
            if m:
                name = m.group(0)
                j = m.end()
                # lookahead for '(' (allow whitespace)
                k = j
                while k < n and s[k].isspace():
                    k += 1
                if k < n and s[k] == "(" and name.upper() == "RATIO_TO_REPORT":
                    # RATIO_TO_REPORT(x) OVER (w) -> x / sum(x) OVER (w):
                    # consume the trailing OVER clause too
                    close = self._match_paren(s, k)
                    if close != -1:
                        arg = self._rewrite_calls(
                            s[k + 1 : close].strip())
                        j2 = close + 1
                        while j2 < n and s[j2].isspace():
                            j2 += 1
                        if s[j2 : j2 + 4].upper() == "OVER":
                            j2 += 4
                            while j2 < n and s[j2].isspace():
                                j2 += 1
                            if j2 < n and s[j2] == "(":
                                oc = self._match_paren(s, j2)
                                if oc != -1:
                                    win = self._rewrite_calls(
                                        s[j2 + 1 : oc].strip())
                                    result.append(
                                        f"(CAST({arg} AS DOUBLE) / CAST("
                                        f"nullif(sum({arg}) OVER ({win}), 0)"
                                        f" AS DOUBLE))")
                                    i = oc + 1
                                    continue
                if k < n and s[k] == "(" and name.upper() in _REWRITABLE:
                    close = self._match_paren(s, k)
                    if close != -1:
                        args = self._split_args(s[k + 1 : close])
                        args = [self._rewrite_calls(a.strip()) for a in args]
                        result.append(self._emit(name.upper(), args))
                        i = close + 1
                        continue
                result.append(name)
                i = j
                continue
            result.append(ch)
            i += 1
        return "".join(result)

    @staticmethod
    def _skip_string(s: str, i: int) -> int:
        """Return index one past the end of the single-quoted string at i
        (handles '' escapes)."""
        j = i + 1
        n = len(s)
        while j < n:
            if s[j] == "'":
                if j + 1 < n and s[j + 1] == "'":
                    j += 2
                    continue
                return j + 1
            j += 1
        return n

    @staticmethod
    def _skip_quoted_ident(s: str, i: int) -> int:
        """Return index one past the end of the double-quoted identifier
        at i (handles "" escapes)."""
        j = i + 1
        n = len(s)
        while j < n:
            if s[j] == '"':
                if j + 1 < n and s[j + 1] == '"':
                    j += 2
                    continue
                return j + 1
            j += 1
        return n

    def _match_paren(self, s: str, open_idx: int) -> int:
        return match_paren(s, open_idx)

    def _split_args(self, s: str) -> list[str]:
        """Split a top-level comma-separated argument list, respecting
        nesting and strings (cf. reference translator.go:263-288)."""
        args: list[str] = []
        depth = 0
        buf: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "'":
                j = self._skip_string(s, i)
                buf.append(s[i:j])
                i = j
                continue
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            if c == "," and depth == 0:
                args.append("".join(buf))
                buf = []
            else:
                buf.append(c)
            i += 1
        if buf or args:
            args.append("".join(buf))
        return args

    # -- emitters ---------------------------------------------------------

    @staticmethod
    def _rand_seed(gen: str) -> str | None:
        """Recover the RANDOM([seed]) seed from an already-expanded
        generator argument (UNIFORM/RANDSTR/NORMAL's third arg arrives
        post-RANDOM-rewrite as ``CAST((rand(seed) - 0.5) ...``). A
        seedless rand() or an unrecognized generator expression maps to
        None (session-random, Snowflake's default behavior)."""
        m = re.search(r"\brandn?\((\d*)\)", gen)
        if m and m.group(1):
            return m.group(1)
        return None

    def _emit(self, fname: str, args: list[str]) -> str:
        if fname == "CAST":
            # map Snowflake type names (VARCHAR w/o length, NUMBER,
            # VARIANT, ...) onto Spark DDL types
            m = re.match(r"^(.*)\s+AS\s+([A-Za-z_]\w*(?:\s+PRECISION)?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*$",
                         args[-1].strip(), re.I | re.S)
            if m:
                inner = ", ".join(args[:-1] + [m.group(1)]) if len(args) > 1 else m.group(1)
                return f"CAST({inner} AS {snowflake_to_spark_ddl(m.group(2)).upper()})"
            return f"CAST({', '.join(args)})"
        if fname == "IFF":
            return f"if({', '.join(args)})"
        if fname == "FLATTEN":
            return f"explode({', '.join(args)})"
        if fname == "OBJECT_CONSTRUCT":
            if len(args) == 1 and args[0].strip() == "*":
                # OBJECT_CONSTRUCT(*): one object from all columns.
                # to_json(struct(*)) drops NULL fields like Snowflake's
                # non-KEEP_NULL form; key order follows column order
                # (Snowflake sorts keys — documented divergence)
                return "to_json(struct(*))"
            return f"to_json(named_struct({', '.join(args)}))"
        if fname == "TO_VARIANT" or fname == "PARSE_JSON":
            return f"CAST({args[0]} AS STRING)"
        if fname == "DATEADD":
            return self._emit_dateadd(args)
        if fname == "DATEDIFF":
            return self._emit_datediff(args)
        if fname == "LISTAGG":
            return f"listagg({', '.join(args)})"
        if fname == "CHARINDEX":
            # CHARINDEX(needle, haystack[, start]) -> locate(needle, haystack[, start])
            return f"locate({', '.join(args)})"
        if fname == "LEN":
            return f"length({', '.join(args)})"
        if fname == "SQUARE":
            return f"(({args[0]}) * ({args[0]}))"
        if fname == "TO_NUMBER":
            # 2nd arg may be a numeric-format picture ('99,999.99' —
            # routes to Spark's to_number parser) or precision[, scale]
            if len(args) >= 2 and re.match(r"^\s*'[^']*'\s*$", args[1]):
                prec_scale = (f"DECIMAL({args[2]}, {args[3]})" if len(args) >= 4
                              else f"DECIMAL({args[2]}, 0)" if len(args) == 3
                              else "DECIMAL(38, 0)")
                return f"CAST(to_number({args[0]}, {args[1]}) AS {prec_scale})"
            if len(args) >= 3:
                return f"CAST({args[0]} AS DECIMAL({args[-2]}, {args[-1]}))"
            return f"CAST({args[0]} AS DECIMAL(38, 0))"
        if fname == "TO_DOUBLE":
            return f"CAST({args[0]} AS DOUBLE)"
        if fname in ("TO_VARCHAR", "TO_CHAR"):
            if len(args) == 2:
                # NUMERIC format models (9/0 digit placeholders, $ , .
                # S MI etc.) route to Spark's numeric to_char; anything
                # else is a date/time format picture
                fmt = re.match(r"^\s*'([^']*)'\s*$", args[1])
                if fmt and re.fullmatch(r"[09$,.DGSB#]*(MI)?", fmt.group(1)) \
                        and re.search(r"[09]", fmt.group(1)):
                    # Spark's to_char does NOT round to the picture's
                    # scale — extra decimals overflow to '###' where
                    # Snowflake rounds half-up. Pre-cast to a DECIMAL of
                    # the picture's scale (decimal cast rounds half-up).
                    dm = re.search(r"[.D]([09]+)", fmt.group(1))
                    scale = len(dm.group(1)) if dm else 0
                    return (f"to_char(CAST({args[0]} AS DECIMAL(38, {scale})), "
                            f"{args[1]})")
                return f"date_format({args[0]}, {convert_snowflake_datefmt(args[1])})"
            return f"CAST({args[0]} AS STRING)"
        if fname == "TRY_CAST":
            # same Snowflake-type mapping as CAST, null on failure
            m = re.match(r"^(.*)\s+AS\s+([A-Za-z_]\w*(?:\s+PRECISION)?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*$",
                         args[-1].strip(), re.I | re.S)
            if m:
                return f"try_cast({m.group(1)} AS {snowflake_to_spark_ddl(m.group(2)).upper()})"
            return f"try_cast({', '.join(args)})"
        if fname == "TO_DATE":
            if len(args) == 2:
                return f"to_date({args[0]}, {convert_snowflake_datefmt(args[1])})"
            return f"to_date({args[0]})"
        if fname in ("TO_TIMESTAMP", "TO_TIMESTAMP_NTZ", "TO_TIMESTAMP_LTZ",
                     "TO_TIMESTAMP_TZ"):
            # the session timezone is pinned UTC (protocol semantics),
            # so the NTZ/LTZ/TZ flavors coincide in this engine
            if len(args) == 2:
                return f"to_timestamp({args[0]}, {convert_snowflake_datefmt(args[1])})"
            return f"to_timestamp({args[0]})"
        if fname == "TRY_TO_DATE":
            if len(args) == 2:
                return f"to_date(try_to_timestamp({args[0]}, {convert_snowflake_datefmt(args[1])}))"
            return f"try_cast({args[0]} AS DATE)"
        if fname in ("TRY_TO_TIMESTAMP", "TRY_TO_TIMESTAMP_NTZ",
                     "TRY_TO_TIMESTAMP_LTZ", "TRY_TO_TIMESTAMP_TZ"):
            if len(args) == 2:
                return f"try_to_timestamp({args[0]}, {convert_snowflake_datefmt(args[1])})"
            return f"try_to_timestamp({args[0]})"
        if fname == "TO_ARRAY":
            # Snowflake returns an ARRAY input unchanged (no nesting):
            # recognize the textual array-producing forms; everything
            # else wraps (NULL stays NULL, not [NULL])
            inner = args[0].strip()
            if re.match(r"^(ARRAY_CONSTRUCT|ARRAY|SEQUENCE|SPLIT|COLLECT_LIST|"
                        r"ARRAY_AGG)\s*\(", inner, re.I):
                return inner
            return f"CASE WHEN ({args[0]}) IS NULL THEN NULL ELSE array({args[0]}) END"
        if fname == "ARRAY_SUM":
            return (f"aggregate({args[0]}, CAST(0 AS DOUBLE), "
                    f"(__acc, __v) -> __acc + CAST(__v AS DOUBLE))")
        if fname == "GET":
            # GET(object, 'key') -> JSON path; GET(array, <int literal>)
            # -> 0-based element (Spark element_at is 1-based, Snowflake
            # GET 0-based). A NON-literal key can only be resolved at
            # runtime: treat the container as VARIANT JSON text (the
            # §1.3 storage form) and probe object-field first, then
            # array-index — a genuine Spark-array container with a
            # computed index still needs the literal form.
            key = args[1].strip()
            if len(key) >= 2 and key[0] == "'" and key[-1] == "'":
                return f"get_json_object({args[0]}, '$.{key[1:-1]}')"
            if key.lstrip("+-").isdigit():
                if int(key) < 0:
                    # Snowflake GET returns NULL for out-of-range /
                    # negative indexes; Spark's try_element_at still
                    # raises on index <= 0, so short-circuit
                    return "NULL"
                return f"try_element_at({args[0]}, CAST({key} AS INT) + 1)"
            return (
                f"coalesce("
                f"get_json_object(CAST({args[0]} AS STRING), concat('$.', CAST({key} AS STRING))), "
                f"get_json_object(CAST({args[0]} AS STRING), concat('$[', CAST({key} AS STRING), ']')))"
            )
        if fname == "TRY_PARSE_JSON":
            # VARIANT is JSON text (SURVEY §1.3): pass through when
            # parseable, NULL otherwise (get_json_object('$') probes)
            return (f"CASE WHEN get_json_object({args[0]}, '$') IS NOT NULL "
                    f"THEN CAST({args[0]} AS STRING) END")
        if fname == "CHECK_JSON":
            return (f"CASE WHEN ({args[0]}) IS NULL OR get_json_object({args[0]}, '$') "
                    f"IS NOT NULL THEN NULL ELSE 'invalid JSON' END")
        if fname == "IS_NULL_VALUE":
            return f"(({args[0]}) = 'null')"
        if fname in ("OBJECT_DELETE", "OBJECT_PICK"):
            # JSON-object key filtering over a variant map: values keep
            # their JSON types through map<string,variant> round-trip
            keys = ", ".join(a.strip() for a in args[1:])
            op = "NOT IN" if fname == "OBJECT_DELETE" else "IN"
            return (f"to_json(map_filter(from_json({args[0]}, 'map<string,variant>'), "
                    f"(__k, __v) -> __k {op} ({keys})))")
        if fname == "OBJECT_INSERT":
            # Snowflake: 3-arg raises on an existing key; only the
            # 4-arg updateFlag=TRUE form overwrites. Spark's default
            # mapKeyDedupPolicy=EXCEPTION gives the duplicate-key error
            # for free via plain map_concat.
            k, v = args[1].strip(), args[2].strip()
            base = f"from_json({args[0]}, 'map<string,variant>')"
            newe = f"from_json(to_json(map({k}, {v})), 'map<string,variant>')"
            overwrite = (f"to_json(map_concat("
                         f"map_filter({base}, (__k, __v) -> __k != {k}), {newe}))")
            plain = f"to_json(map_concat({base}, {newe}))"
            if len(args) >= 4:
                flag = args[3].strip().upper()
                if flag == "TRUE":
                    return overwrite
                if flag == "FALSE":
                    return plain
                return f"CASE WHEN ({args[3]}) THEN {overwrite} ELSE {plain} END"
            return plain
        if fname == "SKEW":
            # Snowflake SKEW is the SAMPLE skewness G1; Spark's
            # skewness is the population g1 (verified numerically
            # against DuckDB's sample skewness, r6). Convert:
            # G1 = sqrt(n(n-1))/(n-2) * g1, NULL when n < 3.
            x = args[0]
            n = f"count({x})"
            return (f"(CASE WHEN {n} < 3 THEN NULL ELSE "
                    f"skewness({x}) * sqrt({n} * ({n} - 1.0)) / ({n} - 2.0) "
                    f"END)")
        if fname == "KURTOSIS":
            # Snowflake KURTOSIS is the SAMPLE excess kurtosis G2;
            # Spark's kurtosis is the population excess g2. Convert:
            # G2 = ((n-1)/((n-2)(n-3))) * ((n+1) g2 + 6), NULL if n < 4.
            x = args[0]
            n = f"count({x})"
            return (f"(CASE WHEN {n} < 4 THEN NULL ELSE "
                    f"(({n} - 1.0) / (({n} - 2.0) * ({n} - 3.0))) * "
                    f"(({n} + 1.0) * kurtosis({x}) + 6.0) END)")
        if fname == "OBJECT_AGG":
            # OBJECT_AGG(k, v) -> one JSON object per group; map entries
            # collected JVM-side, serialized once per group
            return (f"to_json(map_from_entries(collect_list("
                    f"struct({args[0]}, {args[1]}))))")
        if fname == "EQUAL_NULL":
            # null-safe equality (EQUAL_NULL(NULL, NULL) is TRUE)
            return f"(({args[0]}) IS NOT DISTINCT FROM ({args[1]}))"
        if fname == "DECODE":
            # DECODE(expr, s1, r1[, s2, r2 ...][, default]) -> CASE with
            # null-safe matching (Snowflake DECODE matches NULLs equal)
            expr = args[0]
            pairs = args[1:]
            default = None
            if len(pairs) % 2 == 1:
                default = pairs[-1]
                pairs = pairs[:-1]
            whens = "".join(
                f" WHEN ({expr}) IS NOT DISTINCT FROM ({pairs[i]}) THEN {pairs[i + 1]}"
                for i in range(0, len(pairs), 2)
            )
            tail = f" ELSE {default}" if default is not None else ""
            return f"(CASE{whens}{tail} END)"
        if fname == "BOOLXOR_AGG":
            # Snowflake: XOR over non-null booleans (true when an odd
            # number are true), NULL when no non-null input
            a = args[0]
            return (f"(CASE WHEN count({a}) = 0 THEN NULL "
                    f"ELSE (count_if({a}) % 2) = 1 END)")
        if fname == "BOOLOR_AGG":
            return f"bool_or({args[0]})"
        if fname == "BOOLAND_AGG":
            return f"bool_and({args[0]})"
        if fname == "RTRIMMED_LENGTH":
            return f"length(rtrim({args[0]}))"
        if fname == "TIME_SLICE":
            # TIME_SLICE(ts, n, 'PART') -> start of the n-PART bucket
            # (epoch origin, matching DuckDB's time_bucket). Fixed-width
            # parts only — month/year slices are calendar-dependent.
            part = normalize_date_part(args[2]) if len(args) >= 3 else "MINUTE"
            secs = {"DAY": 86400, "HOUR": 3600, "MINUTE": 60, "SECOND": 1}.get(part or "")
            if secs is None:
                return f"TIME_SLICE({', '.join(args)})"  # pass through unsupported parts
            width = f"(({args[1]}) * {secs})"
            return (
                f"to_timestamp(floor(unix_timestamp({args[0]}) / {width}) * {width})"
            )
        if fname == "ZEROIFNULL":
            return f"coalesce({args[0]}, 0)"
        if fname == "DIV0":
            return f"if(({args[1]}) = 0, 0, ({args[0]}) / ({args[1]}))"
        if fname == "RANDOM":
            # Snowflake RANDOM([seed]) is a pseudo-random 64-bit
            # INTEGER; Spark rand() is [0,1) double — scale/center.
            # 1.8446e19 multiplier keeps the extreme rand() values
            # inside BIGINT under ANSI mode.
            seed = args[0].strip() if args and args[0].strip() else ""
            return (f"CAST((rand({seed}) - 0.5) "
                    f"* 1.844674407370955e19 AS BIGINT)")
        if fname == "UNIFORM":
            # Snowflake UNIFORM(min, max, gen): integer bounds are
            # INCLUSIVE both ends; Spark's uniform() upper bound is
            # exclusive for integers (verified empirically on 4.1) —
            # bump integer-literal max by one. The gen arg arrives with
            # RANDOM([seed]) already expanded; recover the seed.
            seed = self._rand_seed(args[2]) if len(args) > 2 else None
            lo, hi = args[0].strip(), args[1].strip()
            if re.fullmatch(r"-?\d+", hi):
                hi = str(int(hi) + 1)
            elif re.fullmatch(r"-?\d+", lo):
                # integer bounds as expressions: stay inclusive
                hi = f"({hi}) + 1"
            tail = f", {seed}" if seed is not None else ""
            return f"uniform({lo}, {hi}{tail})"
        if fname == "RANDSTR":
            # RANDSTR(length, gen) -> Spark randstr(length[, seed]):
            # both return mixed-case alphanumerics of that length
            seed = self._rand_seed(args[1]) if len(args) > 1 else None
            tail = f", {seed}" if seed is not None else ""
            return f"randstr({args[0]}{tail})"
        if fname == "NORMAL":
            # NORMAL(mean, stddev, gen) -> mean + stddev * randn(seed)
            seed = self._rand_seed(args[2]) if len(args) > 2 else None
            gen = f"randn({seed})" if seed is not None else "randn()"
            return f"(({args[0]}) + ({args[1]}) * {gen})"
        if fname == "PARSE_URL":
            # Snowflake PARSE_URL returns an OBJECT with the keys
            # fragment/host/parameters/path/port/query/scheme (path has
            # no leading '/', port is a string, parameters is an OBJECT
            # built from the query string, absent parts are null and
            # KEPT in the output). Spark's parse_url extracts parts;
            # port comes off AUTHORITY (no PORT part in Hive's
            # parse_url). Always permissive (Snowflake's 2-arg form;
            # the strict 1-arg form errors on malformed URLs — we
            # return nulls instead, documented divergence). Repeated-
            # key query strings collapse to the last value (Snowflake
            # builds an array; documented divergence).
            u = f"({args[0]})"
            q = f"parse_url({u}, 'QUERY')"
            return (
                "to_json(named_struct("
                f"'fragment', parse_url({u}, 'REF'), "
                f"'host', parse_url({u}, 'HOST'), "
                f"'parameters', if({q} IS NULL, NULL, str_to_map({q}, '&', '=')), "
                f"'path', regexp_replace(parse_url({u}, 'PATH'), '^/', ''), "
                f"'port', nullif(regexp_extract(parse_url({u}, 'AUTHORITY'), ':([0-9]+)$', 1), ''), "
                f"'query', {q}, "
                f"'scheme', parse_url({u}, 'PROTOCOL')"
                "), map('ignoreNullFields', 'false'))"
            )
        if fname == "APPROX_TOP_K":
            # Snowflake returns a VARIANT array of [value, count]
            # pairs, most frequent first. Spark's approx_top_k shares
            # the (expr[, k[, maxItemsTracked]]) signature but returns
            # array<struct<item,count>> — serialize to Snowflake's
            # JSON shape. The named_struct/substr dance JSON-escapes
            # the item without quoting numerics.
            call = f"approx_top_k({', '.join(args)})"
            item_json = ("substr(to_json(named_struct('v', s.item)), 6, "
                         "length(to_json(named_struct('v', s.item))) - 6)")
            return (
                f"concat('[', array_join(transform({call}, "
                f"s -> concat('[', {item_json}, ',', CAST(s.count AS STRING), ']')"
                f"), ','), ']')"
            )
        if fname == "COLLATE":
            # COLLATE(expr, 'spec') function form
            return f"collate({args[0]}, '{_spark_collation(args[1])}')"
        if fname == "DIV0NULL":
            # like DIV0 but also returns 0 for a NULL divisor
            return (f"if(({args[1]}) IS NULL OR ({args[1]}) = 0, 0, "
                    f"({args[0]}) / ({args[1]}))")
        if fname == "YEAROFWEEK":
            return f"extract(YEAROFWEEK FROM {args[0]})"
        if fname == "NULLIFZERO":
            return f"nullif({args[0]}, 0)"
        if fname == "EDITDISTANCE":
            return f"levenshtein({', '.join(args)})"
        if fname in ("REGEXP_LIKE", "RLIKE"):
            # Snowflake REGEXP_LIKE/RLIKE match the ENTIRE subject;
            # Spark's regexp_like/rlike are partial-match — anchor with
            # a non-capturing group so alternations stay scoped. An
            # optional literal parameters arg maps to inline flags
            # (i/m/s; 'c' = case-sensitive is the default).
            flags = ""
            if len(args) == 3:
                pm = re.match(r"^'([icsme]*)'$", args[2].strip(), re.I)
                if not pm:
                    raise NotImplementedError(
                        "REGEXP_LIKE parameters must be a string literal")
                letters = set(pm.group(1).lower()) - {"c", "e"}
                flags = f"(?{''.join(sorted(letters))})" if letters else ""
            return (f"regexp_like({args[0]}, "
                    f"concat('{flags}^(?:', {args[1]}, ')$'))")
        if fname == "REGEXP_COUNT":
            # REGEXP_COUNT(subject, pattern[, position[, parameters]])
            if len(args) > 4:
                raise NotImplementedError(
                    "REGEXP_COUNT supports at most 4 arguments "
                    "(subject, pattern, position, parameters)")
            pat = args[1]
            if len(args) == 4:
                pm = re.match(r"^'([icsme]*)'$", args[3].strip(), re.I)
                if not pm:
                    raise NotImplementedError(
                        "REGEXP_COUNT parameters must be a string literal")
                letters = set(pm.group(1).lower()) - {"c", "e"}
                if letters:
                    pat = f"concat('(?{''.join(sorted(letters))})', {pat})"
            if len(args) >= 3:
                # position arg: count within the suffix starting there
                return f"regexp_count(substr({args[0]}, {args[2]}), {pat})"
            return f"regexp_count({args[0]}, {pat})"
        if fname == "REGEXP_REPLACE":
            # Snowflake's 2-arg form REMOVES matches (replacement
            # defaults to ''); Spark requires 3 args. The 4-arg
            # position offset splices the untouched prefix back on.
            if len(args) == 2:
                return f"regexp_replace({args[0]}, {args[1]}, '')"
            if len(args) == 3:
                return f"regexp_replace({args[0]}, {args[1]}, {args[2]})"
            if len(args) == 4:
                return (f"concat(substr({args[0]}, 1, ({args[3]}) - 1), "
                        f"regexp_replace(substr({args[0]}, {args[3]}), "
                        f"{args[1]}, {args[2]}))")
            if len(args) in (5, 6):
                # occurrence / parameters: full-surface Arrow UDF kernel
                # (cold path — the common forms above stay pure SQL)
                prm = args[5] if len(args) == 6 else "'c'"
                return (f"sf_regexp_replace({args[0]}, {args[1]}, "
                        f"{args[2]}, CAST({args[3]} AS BIGINT), "
                        f"CAST({args[4]} AS BIGINT), {prm})")
            raise NotImplementedError(
                "REGEXP_REPLACE takes at most 6 arguments")
        if fname == "REGEXP_INSTR":
            # REGEXP_INSTR(subject, pattern[, position[, occurrence
            # [, option[, parameters[, group_num]]]]]) — occurrence 1 /
            # option 0 are the Snowflake defaults and fold away; any
            # other value raises rather than silently misexecuting.
            if (len(args) >= 6
                    or (len(args) >= 4 and args[3].strip() != "1")
                    or (len(args) >= 5 and args[4].strip() != "0")):
                # occurrence/option/parameters/group_num: full-surface
                # Arrow UDF kernel (cold path; defaults fold to pure
                # SQL below)
                if len(args) > 7:
                    raise NotImplementedError(
                        "REGEXP_INSTR takes at most 7 arguments")
                pos = args[2] if len(args) >= 3 else "1"
                occ = args[3] if len(args) >= 4 else "1"
                opt = args[4] if len(args) >= 5 else "0"
                prm = args[5] if len(args) >= 6 else "'c'"
                # group_num omitted -> NULL sentinel: the kernel
                # defaults it to 1 when parameters contain 'e'
                # (Snowflake extract semantics), else 0 (r11)
                grp = args[6] if len(args) >= 7 else "NULL"
                return (f"sf_regexp_instr({args[0]}, {args[1]}, "
                        f"CAST({pos} AS BIGINT), CAST({occ} AS BIGINT), "
                        f"CAST({opt} AS BIGINT), {prm}, "
                        f"CAST({grp} AS BIGINT))")
            if len(args) >= 3:
                # position arg: 1-based offset into the original string
                return (f"(CASE WHEN regexp_instr(substr({args[0]}, {args[2]}), {args[1]}) = 0 "
                        f"THEN 0 ELSE regexp_instr(substr({args[0]}, {args[2]}), {args[1]}) "
                        f"+ {args[2]} - 1 END)")
            return f"regexp_instr({args[0]}, {args[1]})"
        if fname == "UNICODE":
            # code point of the first character (Spark ascii() returns
            # the full code point despite its name)
            return f"ascii({args[0]})"
        if fname == "__SPLIT_RAW__":
            # internal sentinel: a split() whose delimiter was already
            # regex-escaped by an earlier rewrite pass
            return f"split({', '.join(args)})"
        if fname == "SPLIT" and len(args) == 2:
            # Snowflake SPLIT's delimiter is a LITERAL string; Spark's
            # split() takes a regex — \Q...\E quotes the delimiter
            # (works for expressions too; the '\\Q' in the emitted SQL
            # is one backslash after Spark's string-literal escaping)
            return f"split({args[0]}, concat('\\\\Q', {args[1]}, '\\\\E'))"
        if fname in ("TRIM", "LTRIM", "RTRIM"):
            if len(args) == 2:
                # Snowflake: TRIM(expr, chars); Spark's deprecated
                # 2-arg form is trim(trimStr, srcStr) — REVERSED — so
                # emit the unambiguous SQL-standard syntax instead
                mode = {"TRIM": "BOTH", "LTRIM": "LEADING",
                        "RTRIM": "TRAILING"}[fname]
                return f"trim({mode} {args[1]} FROM {args[0]})"
            # 1-arg (and the SQL-standard BOTH/LEADING ... FROM form,
            # which parses as a single argument) pass through
            return f"{fname.lower()}({', '.join(args)})"
        if fname == "UUID_STRING":
            return "uuid()"
        if fname == "STRTOK_TO_ARRAY":
            # same delimiter-SET semantics as STRTOK (each char of the
            # delimiter string splits; empty tokens are dropped) — the
            # previous plain split() treated the whole delimiter string
            # as one regex, wrong for multi-char sets and metachars
            s = args[0]
            delim = args[1] if len(args) >= 2 else "' '"
            rx = _regex_charclass(delim)
            return f"filter(split({s}, {rx}), x -> x != '')"
        if fname == "STARTSWITH":
            return f"startswith({', '.join(args)})"
        if fname == "ENDSWITH":
            return f"endswith({', '.join(args)})"
        if fname == "CONTAINS":
            return f"contains({', '.join(args)})"
        if fname == "TRY_TO_NUMBER":
            if len(args) >= 2 and re.match(r"^\s*'[^']*'\s*$", args[1]):
                prec_scale = (f"DECIMAL({args[2]}, {args[3]})" if len(args) >= 4
                              else f"DECIMAL({args[2]}, 0)" if len(args) == 3
                              else "DECIMAL(38, 0)")
                return f"try_cast(try_to_number({args[0]}, {args[1]}) AS {prec_scale})"
            if len(args) >= 3:
                return f"try_cast({args[0]} AS DECIMAL({args[-2]}, {args[-1]}))"
            return f"try_cast({args[0]} AS DECIMAL(38, 0))"
        if fname == "TRY_TO_DOUBLE":
            return f"try_cast({args[0]} AS DOUBLE)"
        if fname == "DAYNAME":
            return f"date_format({args[0]}, 'EEE')"
        if fname == "MONTHNAME":
            return f"date_format({args[0]}, 'MMM')"
        if fname in ("DATE_PART", "EXTRACT"):
            # EXTRACT(part FROM x) arrives as ONE arg; DATE_PART as two
            if fname == "EXTRACT":
                em = re.match(r"^\s*'?(\w+)'?\s+FROM\s+(.+)$", args[0],
                              re.I | re.S)
                if not em:
                    return f"extract({args[0]})"
                pname, expr = em.group(1), em.group(2)
            else:
                pname, expr = args[0], args[1]
            p = pname.strip().strip("'\"").upper()
            # Snowflake-only parts Spark's extract lacks
            if p in ("EPOCH", "EPOCH_SECOND", "EPOCH_SECONDS"):
                return f"unix_seconds(CAST({expr} AS TIMESTAMP))"
            if p in ("EPOCH_MILLISECOND", "EPOCH_MILLISECONDS"):
                return f"unix_millis(CAST({expr} AS TIMESTAMP))"
            if p in ("EPOCH_MICROSECOND", "EPOCH_MICROSECONDS"):
                return f"unix_micros(CAST({expr} AS TIMESTAMP))"
            if p in ("EPOCH_NANOSECOND", "EPOCH_NANOSECONDS"):
                return f"(unix_micros(CAST({expr} AS TIMESTAMP)) * 1000)"
            if p in ("NANOSECOND", "NANOSECONDS", "NS", "NSEC", "NSECONDS",
                     "NANOSECS", "NSECS"):
                return (f"((unix_micros(CAST({expr} AS TIMESTAMP)) % 1000000)"
                        f" * 1000)")
            if p in ("DAYOFYEAR", "YEARDAY", "DOY", "DY"):
                return f"dayofyear({expr})"
            part = normalize_date_part(pname)
            return f"extract({part or pname} FROM {expr})"
        if fname == "DATE_TRUNC":
            # Snowflake allows unquoted part names; Spark needs a string
            p = args[0].strip().strip("'\"")
            return f"date_trunc('{p}', {args[1]})"
        if fname == "REGEXP_SUBSTR":
            # Snowflake: REGEXP_SUBSTR(subject, pattern[, position
            # [, occurrence]]) — position is a 1-based START OFFSET,
            # not a capture-group index (Spark regexp_extract's 3rd
            # arg), so 3-/4-arg forms substring first
            # no-match returns NULL in Snowflake; Spark regexp_extract
            # returns '' — nullif approximates (an actual empty-string
            # match only arises from empty-matching patterns)
            if len(args) == 2:
                return f"nullif(regexp_extract({args[0]}, {args[1]}, 0), '')"
            if len(args) == 3:
                return (f"nullif(regexp_extract(substr({args[0]}, {args[2]}), "
                        f"{args[1]}, 0), '')")
            # 4/5/6-arg: occurrence [, regex_parameters [, group_num]].
            # Flags i/s/m become inline (?ism) prefixes on a literal
            # pattern; 'e' switches extraction to a capture group
            # (default 1, overridden by group_num).
            pattern, group = args[1], "0"
            if len(args) >= 5:
                params = args[4].strip()
                flags = ""
                if params.startswith("'") and params.endswith("'"):
                    fl = "".join(ch for ch in params.strip("'").lower()
                                 if ch in "ism")
                    if fl:
                        flags = f"(?{fl})"
                    if "e" in params.lower():
                        group = "1"
                if flags:
                    if pattern.startswith("'"):
                        pattern = f"'{flags}" + pattern[1:]
                    else:
                        pattern = f"concat('{flags}', {pattern})"
            if len(args) == 6:
                group = args[5]
            return (
                f"try_element_at(regexp_extract_all("
                f"substr({args[0]}, {args[2]}), {pattern}, {group}), {args[3]})"
            )
        if fname == "ARRAY_SIZE":
            return f"size({args[0]})"
        if fname == "ARRAY_CONSTRUCT":
            return f"array({', '.join(args)})"
        if fname == "ARRAY_CONTAINS":
            # Snowflake: ARRAY_CONTAINS(value, array) — Spark swaps args
            return f"array_contains({args[1]}, {args[0]})"
        if fname == "ARRAY_POSITION":
            # Snowflake: ARRAY_POSITION(value, array), 0-based, NULL when
            # absent; Spark: array_position(array, value), 1-based, 0
            # when absent
            return f"(nullif(array_position({args[1]}, {args[0]}), 0) - 1)"
        if fname == "ARRAY_CAT":
            return f"concat({args[0]}, {args[1]})"
        if fname == "ARRAY_TO_STRING":
            # Snowflake stringifies elements AND renders NULL elements
            # as empty strings between separators ('1,,2'); Spark's
            # array_join DROPS nulls ('1,2') — coalesce keeps the slot
            return (
                f"array_join(transform({args[0]}, "
                f"x -> coalesce(CAST(x AS STRING), '')), {args[1]})"
            )
        if fname == "ARRAY_SLICE":
            # Snowflake: 0-based from (inclusive) .. to (exclusive);
            # Spark slice(arr, start_1based, length)
            return f"slice({args[0]}, ({args[1]}) + 1, ({args[2]}) - ({args[1]}))"
        if fname == "TIMESTAMPADD":
            return self._emit_dateadd(args)
        if fname == "TIMEADD":
            return self._emit_dateadd(args)
        # -- string codecs ------------------------------------------------
        if fname == "BASE64_ENCODE":
            return f"base64(CAST({args[0]} AS BINARY))"
        if fname == "BASE64_DECODE_STRING":
            return f"CAST(unbase64({args[0]}) AS STRING)"
        if fname == "HEX_ENCODE":
            # Snowflake defaults to uppercase output (case arg 1)
            if len(args) == 2 and args[1].strip() == "0":
                return f"lower(hex({args[0]}))"
            return f"upper(hex({args[0]}))"
        if fname == "HEX_DECODE_STRING":
            return f"CAST(unhex({args[0]}) AS STRING)"
        if fname == "BASE64_DECODE_BINARY":
            return f"unbase64({args[0]})"
        if fname == "HEX_DECODE_BINARY":
            return f"unhex({args[0]})"
        if fname == "TRY_BASE64_DECODE_STRING":
            return f"CAST(try_to_binary({args[0]}, 'base64') AS STRING)"
        if fname == "TRY_BASE64_DECODE_BINARY":
            return f"try_to_binary({args[0]}, 'base64')"
        if fname == "TRY_HEX_DECODE_STRING":
            return f"CAST(try_to_binary({args[0]}, 'hex') AS STRING)"
        if fname == "TRY_HEX_DECODE_BINARY":
            return f"try_to_binary({args[0]}, 'hex')"
        # -- digests --------------------------------------------------------
        # Snowflake SHA2 family defaults to 256 bits; _HEX aliases return
        # the same hex text as the base form, _BINARY the raw bytes
        if fname in ("SHA2", "SHA2_HEX"):
            return f"sha2({args[0]}, {args[1] if len(args) > 1 else 256})"
        if fname == "SHA1_HEX":
            return f"sha1({args[0]})"
        if fname == "SHA1_BINARY":
            return f"unhex(sha1({args[0]}))"
        if fname == "SHA2_BINARY":
            return f"unhex(sha2({args[0]}, {args[1] if len(args) > 1 else 256}))"
        if fname == "MD5_HEX":
            return f"md5({args[0]})"
        if fname == "MD5_BINARY":
            return f"unhex(md5({args[0]}))"
        if fname == "HASH":
            # Snowflake HASH: stable signed 64-bit, NOT cryptographic and
            # NOT the same values as Snowflake's (unpublished) function —
            # xxhash64 gives the same contract at full 64-bit width
            return f"xxhash64({', '.join(args)})"
        # -- correlation / regression family --------------------------------
        # Two Spark 4 defects, both caught by the r8 differential-fuzz
        # aggregate family and both NULL in Snowflake and DuckDB:
        #   1. ANSI corr() raises DIVIDE_BY_ZERO on zero-variance input.
        #   2. When a DISTINCT aggregate shares the Aggregate node
        #      (Expand rewrite), CentralMomentAgg's merge leaks a tiny
        #      nonzero m2 (~1e-30) for a CONSTANT column, so native
        #      regr_slope/intercept/r2 (and a naive sxy/sxx rebuild)
        #      return garbage like -2.47e17 instead of NULL.
        # Fix: rebuild all four from the pair-filtered regr_* sums with
        # a RELATIVE epsilon snap — a spread below (avg² + 1)·n·1e-12
        # is numerical noise (double eps is 2.2e-16; genuine variance at
        # 1e-6 relative scale stays 4+ orders above the threshold).
        if fname in ("CORR", "REGR_SLOPE", "REGR_INTERCEPT", "REGR_R2"):
            y, x = args[0], args[1]

            def _snap(sum_fn: str, avg_fn: str) -> str:
                s = f"{sum_fn}({y}, {x})"
                a = f"{avg_fn}({y}, {x})"
                return (f"if({s} <= ({a} * {a} + 1d) * "
                        f"regr_count({y}, {x}) * 1e-12d, 0d, {s})")

            gsxx = _snap("regr_sxx", "regr_avgx")
            gsyy = _snap("regr_syy", "regr_avgy")
            sxy = f"regr_sxy({y}, {x})"
            if fname == "CORR":
                return f"try_divide({sxy}, sqrt({gsxx} * {gsyy}))"
            if fname == "REGR_SLOPE":
                return f"try_divide({sxy}, {gsxx})"
            if fname == "REGR_INTERCEPT":
                return (f"(regr_avgy({y}, {x}) - "
                        f"try_divide({sxy}, {gsxx}) * regr_avgx({y}, {x}))")
            # REGR_R2: NULL when x is constant; 1.0 when only y is
            return (f"(CASE WHEN {gsxx} = 0d THEN NULL "
                    f"WHEN {gsyy} = 0d THEN 1.0d "
                    f"ELSE ({sxy} * {sxy}) / ({gsxx} * {gsyy}) END)")
        if fname == "HASH_AGG":
            # order-independent signed-64 aggregate over row hashes:
            # sum in DECIMAL(38,0) (ANSI bigint SUM would overflow),
            # folded back into the signed-63 range
            return (f"CAST(sum(CAST(xxhash64({', '.join(args)}) AS "
                    f"DECIMAL(38,0))) % 9223372036854775808 AS BIGINT)")
        if fname == "STRTOK":
            # STRTOK(s[, delimiters[, part]]) — delimiters is a SET of
            # single chars; empty tokens are skipped (unlike SPLIT_PART)
            s = args[0]
            delim = args[1] if len(args) >= 2 else "' '"
            part = args[2] if len(args) >= 3 else "1"
            rx = _regex_charclass(delim)
            return (
                f"try_element_at(filter(split({s}, {rx}), "
                f"x -> x != ''), {part})"
            )
        if fname == "INSERT":
            # INSERT(base, pos, len, repl): splice repl over len chars at
            # 1-based pos (safe from DML INSERT — classifier routes DML
            # before translation, and 'INSERT INTO' never parses as a call)
            b, p, l, r = args
            return (
                f"concat(substr({b}, 1, ({p}) - 1), {r}, "
                f"substr({b}, ({p}) + ({l})))"
            )
        # -- bitwise / boolean --------------------------------------------
        if fname == "BITAND":
            return f"(({args[0]}) & ({args[1]}))"
        if fname == "BITOR":
            return f"(({args[0]}) | ({args[1]}))"
        if fname == "BITXOR":
            return f"(({args[0]}) ^ ({args[1]}))"
        if fname == "BITNOT":
            return f"(~({args[0]}))"
        if fname == "BITSHIFTLEFT":
            return f"shiftleft({args[0]}, {args[1]})"
        if fname == "BITSHIFTRIGHT":
            return f"shiftright({args[0]}, {args[1]})"
        if fname == "BOOLAND":
            # Kleene logic on "nonzero = true" matches Snowflake's NULL
            # behavior (FALSE wins over NULL for AND, TRUE for OR)
            return f"((({args[0]}) <> 0) AND (({args[1]}) <> 0))"
        if fname == "BOOLOR":
            return f"((({args[0]}) <> 0) OR (({args[1]}) <> 0))"
        if fname == "BOOLXOR":
            return f"((({args[0]}) <> 0) <> (({args[1]}) <> 0))"
        if fname == "BOOLNOT":
            return f"(NOT (({args[0]}) <> 0))"
        if fname == "HAVERSINE":
            # great-circle km; mirrors Snowflake's spherical-earth formula
            lat1, lon1, lat2, lon2 = args
            return (
                f"(2 * 6371 * asin(sqrt("
                f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
            )
        # -- datetime constructors ----------------------------------------
        if fname == "DATE_FROM_PARTS":
            return f"make_date({', '.join(args)})"
        if fname == "TIMESTAMP_FROM_PARTS":
            return f"make_timestamp({', '.join(args[:6])})"
        if fname == "PREVIOUS_DAY":
            # most recent <dow> STRICTLY before d: next_day over the
            # 7-day window ending the day before d
            return f"next_day(date_sub(CAST({args[0]} AS DATE), 8), {args[1]})"
        if fname == "DAYOFWEEKISO":
            return f"(weekday({args[0]}) + 1)"
        if fname == "DAYOFWEEK":
            # Snowflake legacy default (WEEK_START=0): Sunday=0 ..
            # Saturday=6; Spark dayofweek is Sunday=1 .. Saturday=7
            return f"(dayofweek({args[0]}) - 1)"
        if fname in ("WEEK", "WEEKOFYEAR", "WEEKISO"):
            # ISO week number (Snowflake's WEEK_OF_YEAR_POLICY=0
            # default); Spark weekofyear is ISO already
            return f"weekofyear({args[0]})"
        if fname == "LAST_DAY":
            if len(args) == 1:
                return f"last_day({args[0]})"
            part = args[1].strip().strip("'\"").upper()
            # last day of the date part containing d: truncate to the
            # part, advance one part, step back one day. Spark's ANSI
            # interval literals lack WEEK/QUARTER units, so months
            # advance via add_months and weeks via INTERVAL 7 DAY.
            months = {"YEAR": 12, "QUARTER": 3, "MONTH": 1}
            if part in months:
                return (f"(CAST(add_months(date_trunc('{part}', {args[0]}), "
                        f"{months[part]}) AS DATE) - 1)")
            if part == "WEEK":
                return (f"(CAST(date_trunc('WEEK', {args[0]}) "
                        f"+ INTERVAL 7 DAY AS DATE) - 1)")
            raise NotImplementedError(f"LAST_DAY part {part!r} not supported")
        if fname == "CONVERT_TIMEZONE":
            if len(args) == 3:
                return f"convert_timezone({args[0]}, {args[1]}, {args[2]})"
            # 2-arg converts from the session timezone (UTC here)
            return f"convert_timezone('UTC', {args[0]}, {args[1]})"
        # -- semi-structured ----------------------------------------------
        if fname == "OBJECT_KEYS":
            return f"json_object_keys({args[0]})"
        if fname == "GET_PATH":
            m = re.match(r"^\s*'([^']*)'\s*$", args[1])
            if m:
                return f"get_json_object({args[0]}, '$.{m.group(1)}')"
            return f"get_json_object({args[0]}, concat('$.', {args[1]}))"
        if fname == "TYPEOF":
            # VARIANT is a JSON string in this engine: classify by shape
            v = args[0]
            t = f"trim({v})"
            return (
                f"(CASE WHEN {v} IS NULL THEN NULL"
                f" WHEN left({t}, 1) = '{{' THEN 'OBJECT'"
                f" WHEN left({t}, 1) = '[' THEN 'ARRAY'"
                f" WHEN {t} = 'null' THEN 'NULL_VALUE'"
                f" WHEN {t} IN ('true', 'false') THEN 'BOOLEAN'"
                f" WHEN try_cast({t} AS BIGINT) IS NOT NULL THEN 'INTEGER'"
                f" WHEN try_cast({t} AS DOUBLE) IS NOT NULL THEN 'DECIMAL'"
                f" ELSE 'VARCHAR' END)"
            )
        if fname in ("IS_INTEGER", "IS_DECIMAL", "IS_BOOLEAN", "IS_ARRAY",
                     "IS_OBJECT", "IS_VARCHAR"):
            # VARIANT type predicates over the JSON-text storage —
            # same shape classification as TYPEOF
            v = args[0]
            t = f"trim({v})"
            checks = {
                "IS_OBJECT": f"left({t}, 1) = '{{'",
                "IS_ARRAY": f"left({t}, 1) = '['",
                "IS_BOOLEAN": f"{t} IN ('true', 'false')",
                "IS_INTEGER": (f"left({t}, 1) NOT IN ('{{', '[') AND {t} NOT IN "
                               f"('true', 'false') AND try_cast({t} AS BIGINT) IS NOT NULL"),
                "IS_DECIMAL": (f"left({t}, 1) NOT IN ('{{', '[') AND {t} NOT IN "
                               f"('true', 'false') AND try_cast({t} AS DOUBLE) IS NOT NULL"),
                "IS_VARCHAR": (f"left({t}, 1) NOT IN ('{{', '[') AND {t} NOT IN "
                               f"('true', 'false', 'null') AND "
                               f"try_cast({t} AS DOUBLE) IS NULL"),
            }
            return f"(CASE WHEN {v} IS NULL THEN NULL ELSE ({checks[fname]}) END)"
        if fname == "ARRAY_COMPACT":
            return f"filter({args[0]}, x -> x IS NOT NULL)"
        if fname == "ARRAY_EXCEPT":
            return f"array_except({args[0]}, {args[1]})"
        if fname == "ARRAY_INTERSECTION":
            return f"array_intersect({args[0]}, {args[1]})"
        if fname == "ARRAY_INSERT":
            # Snowflake position is 0-based; Spark's is 1-based
            return f"array_insert({args[0]}, ({args[1]}) + 1, {args[2]})"
        if fname == "ARRAY_SORT":
            # Snowflake ARRAY_SORT(a [, sort_asc [, nulls_first]]),
            # defaults (TRUE, FALSE) = ascending with NULLs LAST. Spark
            # primitives pin nulls per direction (array_sort: last;
            # sort_array asc: first, desc: last), so compose all four
            # quadrants; works for non-literal flags too and constant-
            # folds when they are literals:
            #   (asc, nulls_first=T) -> sort_array(a, true)
            #   (asc, nulls_first=F) -> array_sort(a)
            #   (desc, nulls_first=T) -> reverse(array_sort(a))
            #   (desc, nulls_first=F) -> sort_array(a, false)
            if len(args) == 1:
                return f"array_sort({args[0]})"
            a = args[0]
            asc = args[1]
            nf = args[2] if len(args) >= 3 else "false"
            return (f"if({asc}, if({nf}, sort_array({a}, true), "
                    f"array_sort({a})), if({nf}, reverse(array_sort({a})), "
                    f"sort_array({a}, false)))")
        if fname == "ARRAY_GENERATE_RANGE":
            # Snowflake excludes the stop bound; Spark sequence includes it
            if len(args) == 2:
                return f"sequence({args[0]}, ({args[1]}) - 1)"
            return (
                f"sequence({args[0]}, ({args[1]}) - CAST(sign({args[2]}) AS INT), "
                f"{args[2]})"
            )
        if fname == "ARRAY_FLATTEN":
            return f"flatten({args[0]})"
        # r11 array-function batch (public Snowflake semantics):
        if fname == "ARRAY_DISTINCT":
            # first-occurrence order preserved in both engines; one
            # NULL survives (Spark matches Snowflake here)
            return f"array_distinct({args[0]})"
        if fname in ("ARRAY_MAX", "ARRAY_MIN"):
            # NULL elements ignored in both engines
            return f"array_{fname[6:].lower()}({args[0]})"
        if fname == "ARRAY_REMOVE":
            return f"array_remove({args[0]}, {args[1]})"
        if fname == "ARRAY_APPEND":
            return f"array_append({args[0]}, {args[1]})"
        if fname == "ARRAY_PREPEND":
            return f"array_prepend({args[0]}, {args[1]})"
        if fname == "ARRAYS_OVERLAP":
            # Snowflake: TRUE when the arrays share an element, with
            # NULL considered EQUAL to NULL (docs example); Spark's
            # arrays_overlap returns NULL when no non-null overlap
            # exists and either side contains NULL — compose the exact
            # semantics, NULL only when an ARGUMENT is NULL
            a, b = args[0], args[1]
            return (
                f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
                f"ELSE coalesce(arrays_overlap({a}, {b}), false) "
                f"OR (exists({a}, x -> x IS NULL) "
                f"AND exists({b}, x -> x IS NULL)) END)"
            )
        if fname == "ARRAY_REMOVE_AT":
            # 0-based position, negative counts from the end,
            # out-of-range returns the array unchanged (Snowflake docs)
            a, p = args[0], args[1]
            pos = f"(CASE WHEN ({p}) < 0 THEN size({a}) + ({p}) ELSE ({p}) END)"
            return (
                f"(CASE WHEN ({p}) IS NULL THEN NULL "
                f"WHEN {pos} < 0 OR {pos} >= size({a}) THEN {a} "
                f"ELSE concat(slice({a}, 1, {pos}), "
                f"slice({a}, {pos} + 2, size({a}) - {pos} - 1)) END)"
            )
        if fname == "ARRAYS_TO_OBJECT":
            return f"to_json(map_from_arrays({args[0]}, {args[1]}))"
        if fname in ("GREATEST", "LEAST"):
            # Snowflake returns NULL when ANY argument is NULL; Spark's
            # greatest/least skip NULLs
            nulls = " OR ".join(f"({a}) IS NULL" for a in args)
            return (
                f"(CASE WHEN {nulls} THEN NULL "
                f"ELSE {fname.lower()}({', '.join(args)}) END)"
            )
        if fname in ("SYSDATE", "GETDATE", "SYSTIMESTAMP"):
            return "current_timestamp()"
        if fname == "ARRAY_REVERSE":
            return f"reverse({args[0]})"
        if fname in ("TO_BOOLEAN", "TRY_TO_BOOLEAN"):
            # Spark's boolean cast accepts the same literal set as
            # Snowflake (true/false/t/f/y/n/yes/no/on? -> on/off are
            # Snowflake-only; normalize them first)
            norm = (f"CASE WHEN lower(trim(CAST({args[0]} AS STRING))) = 'on' THEN 'true' "
                    f"WHEN lower(trim(CAST({args[0]} AS STRING))) = 'off' THEN 'false' "
                    f"ELSE CAST({args[0]} AS STRING) END")
            cast = "try_cast" if fname.startswith("TRY") else "CAST"
            return f"{cast}({norm} AS BOOLEAN)"
        if fname in ("TO_DECIMAL", "TO_NUMERIC", "TRY_TO_DECIMAL", "TRY_TO_NUMERIC"):
            p = args[1].strip() if len(args) > 1 else "38"
            sc = args[2].strip() if len(args) > 2 else "0"
            cast = "try_cast" if fname.startswith("TRY") else "CAST"
            return f"{cast}({args[0]} AS DECIMAL({p}, {sc}))"
        if fname in ("TO_TIME", "TRY_TO_TIME"):
            # TIME is stored as 'HH:MM:SS' text (§1.3); parse + reformat.
            # Snowflake accepts unpadded fields ('7:5:9') — Spark's 'H:m:s'
            # pattern matches 1-2 digits per field (r8 fix: the former
            # 'HH:mm:ss' parse raised on unpadded input). Full timestamp
            # strings fall back to the default parser (Snowflake TO_TIME
            # of a timestamp takes its time portion); TO_TIME stays
            # strict on garbage via the non-try final branch.
            fn_ts = "try_to_timestamp" if fname.startswith("TRY") else "to_timestamp"
            if len(args) == 2:
                # TO_TIME(s, 'HH24-MI-SS'): Snowflake format picture
                return (f"date_format({fn_ts}({args[0]}, "
                        f"{convert_snowflake_datefmt(args[1])}), 'HH:mm:ss')")
            return (f"date_format(coalesce("
                    f"try_to_timestamp({args[0]}, 'H:m:s'), "
                    f"{fn_ts}({args[0]})), 'HH:mm:ss')")
        if fname in ("TO_BINARY", "TRY_TO_BINARY"):
            # 2nd arg selects codec (HEX default, BASE64, UTF-8)
            fmt = args[1].strip().upper().strip("'") if len(args) > 1 else "HEX"
            expr = {
                "HEX": f"unhex({args[0]})",
                "BASE64": f"unbase64({args[0]})",
                "UTF-8": f"encode({args[0]}, 'UTF-8')",
                "UTF8": f"encode({args[0]}, 'UTF-8')",
            }.get(fmt, f"unhex({args[0]})")
            if fname == "TRY_TO_BINARY":
                return f"try_cast({expr} AS BINARY)"
            return expr
        if fname == "ARRAY_UNIQUE_AGG":
            return f"array_distinct(collect_list({args[0]}))"
        if fname == "ARRAY_UNION_AGG":
            # union of the grouped arrays' elements, one flatten pass
            return f"array_distinct(flatten(collect_list({args[0]})))"
        if fname in ("BITAND_AGG", "BITOR_AGG", "BITXOR_AGG"):
            # Snowflake bitwise aggregates -> Spark bit_and/bit_or/bit_xor
            return f"bit_{fname[3:-4].lower()}({args[0]})"
        if fname == "MAP_CAT":
            return f"map_concat({', '.join(args)})"
        if fname == "REGEXP_SUBSTR_ALL":
            # all matches as an array (Snowflake 2-arg form)
            return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
        if fname in ("MD5_NUMBER_LOWER64", "MD5_NUMBER_UPPER64"):
            # 64-bit halves of the 128-bit md5: hex slice -> decimal.
            # conv() returns the two's-complement BIGINT for values with
            # the top bit set, matching Snowflake's signed NUMBER result.
            lo = 17 if fname.endswith("LOWER64") else 1
            return (f"CAST(conv(substr(md5(CAST({args[0]} AS STRING)), {lo}, 16), 16, 10) "
                    f"AS DECIMAL(20,0))")
        if fname == "MINHASH":
            if not args or not args[0].strip().isdigit():
                # non-literal k cannot unroll into k parallel mins —
                # pass through instead of crashing the translator
                return f"MINHASH({', '.join(args)})"
            # Snowflake's MINHASH(k, expr) aggregate: k-permutation
            # minhash signature of the grouped set. Same deterministic
            # md5-derived permutation family as operators/dedup.py
            # (md5-int mod M31, odd multipliers), emitted as k parallel
            # min() aggregates inside array() — map-side combinable.
            k = int(args[0])
            base = (f"(conv(substr(md5(CAST({args[1]} AS STRING)), 1, 15), 16, 10) "
                    f"% 2147483647)")
            mins = ", ".join(
                f"min(({base} * {2 * i + 1} + {7919 * (i + 1)}) % 2147483647)"
                for i in range(k)
            )
            return f"array({mins})"
        if fname == "APPROXIMATE_SIMILARITY":
            # Jaccard estimate from two equal-length minhash signatures
            # (the 2-arg scalar form over MINHASH results): fraction of
            # agreeing permutation slots
            a, b = args[0], args[1]
            return (
                f"(aggregate(zip_with({a}, {b}, (__x, __y) -> "
                f"CASE WHEN __x = __y THEN 1 ELSE 0 END), 0, "
                f"(__acc, __v) -> __acc + __v) / CAST(size({a}) AS DOUBLE))"
            )
        if fname in ("ST_MAKEPOINT", "ST_POINT"):
            # GEOGRAPHY is WKT text (SURVEY §1.3 / pkg/types/snowflake.go:71-72)
            return (f"concat('POINT(', CAST({args[0]} AS STRING), ' ', "
                    f"CAST({args[1]} AS STRING), ')')")
        if fname == "TO_GEOGRAPHY":
            return f"CAST({args[0]} AS STRING)"
        if fname in ("ST_X", "ST_Y"):
            idx = 1 if fname == "ST_X" else 2
            return (f"CAST(regexp_extract({args[0]}, "
                    f"'POINT\\\\(([-+0-9.eE]+) ([-+0-9.eE]+)\\\\)', {idx}) AS DOUBLE)")
        if fname == "ST_DISTANCE":
            # spherical-earth meters between two WKT points (Snowflake
            # computes geodesic WGS84 distance; spherical is the
            # documented approximation here, same formula as HAVERSINE)
            def _coord(g: str, idx: int) -> str:
                return (f"CAST(regexp_extract({g}, "
                        f"'POINT\\\\(([-+0-9.eE]+) ([-+0-9.eE]+)\\\\)', {idx}) AS DOUBLE)")
            lon1, lat1 = _coord(args[0], 1), _coord(args[0], 2)
            lon2, lat2 = _coord(args[1], 1), _coord(args[1], 2)
            return (
                f"(2 * 6371008.8 * asin(sqrt("
                f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
                f"cos(radians({lat1})) * cos(radians({lat2})) * "
                f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
            )
        if fname == "APPROX_PERCENTILE":
            return f"percentile_approx({', '.join(args)})"
        if fname == "HLL":
            # HyperLogLog distinct-count sketch
            return f"approx_count_distinct({', '.join(args)})"
        if fname == "HLL_ACCUMULATE":
            # mergeable HLL sketch state (Snowflake BINARY; Spark's
            # DataSketches binary image). The two-level pattern —
            # per-partition HLL_ACCUMULATE, then HLL_COMBINE +
            # HLL_ESTIMATE — is the scale path for distinct counts:
            # sketches merge associatively, so a 100 TB distinct-count
            # is one map-side sketch pass + a tiny merge.
            return f"hll_sketch_agg({', '.join(args)})"
        if fname == "HLL_COMBINE":
            return f"hll_union_agg({args[0]})"
        if fname == "HLL_ESTIMATE":
            return f"hll_sketch_estimate({args[0]})"
        if fname in ("HLL_EXPORT", "HLL_IMPORT"):
            raise NotImplementedError(
                f"{fname} is not supported: sketch states are Spark "
                "DataSketches binary images, not Snowflake's OBJECT "
                "export format (HLL_ACCUMULATE/COMBINE/ESTIMATE are)")
        if fname == "VECTOR_INNER_PRODUCT":
            return self._vector_dot(args[0], args[1])
        if fname == "VECTOR_L2_DISTANCE":
            a, b = args[0], args[1]
            return (
                f"sqrt(reduce(zip_with({a}, {b}, (_x, _y) -> "
                f"(CAST(_x AS DOUBLE) - _y) * (CAST(_x AS DOUBLE) - _y)), "
                f"0D, (_acc, _v) -> _acc + _v))")
        if fname == "VECTOR_COSINE_SIMILARITY":
            a, b = args[0], args[1]
            return (f"({self._vector_dot(a, b)} / "
                    f"(sqrt({self._vector_dot(a, a)}) * "
                    f"sqrt({self._vector_dot(b, b)})))")
        if fname == "ARRAY_REMOVE_AT":
            # drop the element at a 0-based position; negative counts
            # from the end; out-of-range returns the array unchanged
            # (filter never matches). Snowflake returns NULL for a NULL
            # position, so guard explicitly (a NULL inside the filter
            # lambda would otherwise drop every element).
            arr, pos = args[0], args[1]
            return (
                f"CASE WHEN ({pos}) IS NULL THEN NULL ELSE "
                f"filter({arr}, (_v, _ix) -> _ix != "
                f"(CASE WHEN ({pos}) < 0 THEN size({arr}) + ({pos}) "
                f"ELSE ({pos}) END)) END")
        if fname == "INITCAP":
            # Snowflake INITCAP treats EVERY non-alphanumeric char as a
            # word delimiter; Spark's initcap only splits on whitespace
            # ('4-not specified' -> Snowflake '4-Not Specified', Spark
            # '4-not Specified' — found by the r6 differential fuzz).
            # Per-char transform with index: uppercase a char at the
            # start or after a non-alphanumeric, lowercase the rest.
            x = args[0]
            if len(args) == 2:
                # r10: explicit delimiter set — only characters IN the
                # set start a new word; NULL delimiters = one word
                # (only the first character is capitalized), '' = same
                d = args[1]
                return (
                    f"CASE WHEN ({d}) IS NULL THEN "
                    f"concat(upper(substr({x}, 1, 1)), lower(substr({x}, 2))) "
                    f"ELSE array_join(transform(split(lower({x}), ''), "
                    f"(c, i) -> CASE WHEN i = 0 OR "
                    f"contains({d}, substr({x}, i, 1)) "
                    f"THEN upper(c) ELSE c END), '') END"
                )
            if len(args) != 1:
                raise NotImplementedError("INITCAP takes 1 or 2 arguments")
            return (
                f"array_join(transform(split(lower({x}), ''), (c, i) -> "
                f"CASE WHEN i = 0 OR substr(lower({x}), i, 1) "
                f"RLIKE '[^a-z0-9]' THEN upper(c) ELSE c END), '')"
            )
        if fname in ("TRUNC", "TRUNCATE"):
            # dual-mode: TRUNC(x, 'PART') truncates a date/timestamp;
            # TRUNC(x, n) truncates a number toward zero (floor rounds
            # toward -inf, so route through a BIGINT cast instead).
            # 1-arg TRUNC is ALWAYS numeric in Snowflake (the date
            # overload requires the part argument), truncating toward
            # zero — Spark's 1-arg trunc is date-only and would error
            # (found by the r6 differential fuzz harness).
            if len(args) == 2:
                p = args[1].strip()
                m = re.match(r"^'(\w+)'$", p)
                if m and normalize_date_part(m.group(1)) is not None:
                    return f"date_trunc('{m.group(1)}', {args[0]})"
                return (
                    f"(CAST(CAST(({args[0]}) * pow(10, {p}) AS BIGINT) AS DOUBLE)"
                    f" / pow(10, {p}))"
                )
            return f"CAST(CAST(({args[0]}) AS BIGINT) AS DOUBLE)"
        raise AssertionError(f"no emitter for {fname}")  # pragma: no cover

    @staticmethod
    def _vector_dot(a: str, b: str) -> str:
        """Element-wise dot product over array columns — stays in
        whole-stage codegen (zip_with + reduce), no Python boundary."""
        return (f"reduce(zip_with({a}, {b}, (_x, _y) -> "
                f"CAST(_x AS DOUBLE) * _y), 0D, (_acc, _v) -> _acc + _v)")

    def _emit_dateadd(self, args: list[str]) -> str:
        if len(args) != 3:
            return f"DATEADD({', '.join(args)})"  # graceful pass-through
        part = normalize_date_part(args[0])
        if part is None:
            return f"dateadd({', '.join(args)})"
        n, d = args[1].strip(), args[2].strip()
        return f"timestampadd({part}, {n}, {d})"

    def _emit_datediff(self, args: list[str]) -> str:
        """Boundary-crossing DATEDIFF (Snowflake semantics; matches
        DuckDB ``date_diff`` which the reference maps to,
        translator.go:86-93, 232-245)."""
        if len(args) != 3:
            return f"datediff({', '.join(args)})"  # Spark 2-arg datediff
        part = normalize_date_part(args[0])
        s, e = args[1].strip(), args[2].strip()
        if part is None:
            return f"datediff({args[0]}, {s}, {e})"
        if part == "YEAR":
            return f"(year({e}) - year({s}))"
        if part == "QUARTER":
            return f"((year({e}) - year({s})) * 4 + (quarter({e}) - quarter({s})))"
        if part == "MONTH":
            return f"((year({e}) - year({s})) * 12 + (month({e}) - month({s})))"
        if part == "WEEK":
            return f"(datediff(date_trunc('WEEK', {e}), date_trunc('WEEK', {s})) div 7)"
        if part == "DAY":
            return f"datediff(CAST({e} AS DATE), CAST({s} AS DATE))"
        secs = _SECONDS[part]
        return (
            f"((unix_timestamp(date_trunc('{part}', {e})) - "
            f"unix_timestamp(date_trunc('{part}', {s}))) div {secs})"
        )

    # -- :: cast rewriting -------------------------------------------------

    _DCOLON_RE = re.compile(
        r"::\s*([A-Za-z_]\w*(?:\s+PRECISION)?(?:\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
    )

    def _rewrite_double_colon_casts(self, s: str) -> str:
        """Rewrite ``expr::TYPE`` into ``CAST(expr AS <mapped type>)``.

        Snowflake's ``::`` cast is pervasive; Spark SQL has no ``::``
        operator. We find the cast target type, then walk left to find
        the operand (identifier / literal / parenthesized expression /
        function call)."""
        pos = 0
        while True:
            m = self._DCOLON_RE.search(s, pos)
            if m is None:
                return s
            # guard: a ::-looking sequence inside a string literal is
            # not a cast — SKIP it and keep scanning (bailing out here
            # used to abandon every later real cast in the statement)
            if s.count("'", 0, m.start()) % 2 == 1:
                pos = m.end()
                continue
            type_txt = m.group(1).strip()
            spark_type = snowflake_to_spark_ddl(type_txt).upper()
            start = self._operand_start(s, m.start())
            operand = s[start : m.start()]
            s = s[:start] + f"CAST({operand} AS {spark_type})" + s[m.end() :]
            pos = 0

    @staticmethod
    def _string_spans(s: str) -> list[tuple[int, int]]:
        """[start, end] index ranges of single-quoted literals,
        ''-escape aware, via ONE forward scan (backward quote scans
        misread escape pairs)."""
        spans, i, n = [], 0, len(s)
        while i < n:
            if s[i] == "'":
                j = i + 1
                while j < n:
                    if s[j] == "'":
                        if j + 1 < n and s[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                spans.append((i, min(j, n - 1)))
                i = j + 1
                continue
            i += 1
        return spans

    def _operand_start(self, s: str, colon_idx: int) -> int:
        # forward-computed string spans: the backward scans used to
        # (a) treat a '(' INSIDE a literal as the operand's paren and
        # (b) misread ''-escaped quotes, splicing CAST( into literals
        spans = self._string_spans(s)

        def span_at(pos: int):
            for a, b in spans:
                if a <= pos <= b:
                    return (a, b)
            return None

        i = colon_idx - 1
        while i >= 0 and s[i].isspace():
            i -= 1
        if i < 0:
            return 0
        sp = span_at(i)
        if sp is not None:
            return sp[0]          # operand is the whole string literal
        if s[i] == ")":
            depth = 0
            j = i
            while j >= 0:
                jsp = span_at(j)
                if jsp is not None:
                    j = jsp[0] - 1   # hop over the literal
                    continue
                if s[j] == ")":
                    depth += 1
                elif s[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            k = j - 1
            while k >= 0 and (s[k].isalnum() or s[k] == "_"):
                k -= 1
            return k + 1
        j = i
        while j >= 0 and (s[j].isalnum() or s[j] in "_.$"):
            j -= 1
        return j + 1


_REWRITABLE = {
    "CAST",
    "IFF",
    "INITCAP",
    "FLATTEN",
    "OBJECT_CONSTRUCT",
    "TO_VARIANT",
    "PARSE_JSON",
    "DATEADD",
    "DATEDIFF",
    "TIMESTAMPADD",
    "TIMEADD",
    "LISTAGG",
    "CHARINDEX",
    "LEN",
    "SQUARE",
    "TO_NUMBER",
    "TO_DOUBLE",
    "TO_VARCHAR",
    "TO_CHAR",
    "ZEROIFNULL",
    "DIV0",
    "NULLIFZERO",
    "EDITDISTANCE",
    "REGEXP_LIKE",
    "REGEXP_REPLACE",
    "RLIKE",
    "REGEXP_COUNT",
    "REGEXP_INSTR",
    "UNICODE",
    "UUID_STRING",
    "STRTOK_TO_ARRAY",
    "ARRAY_SIZE",
    "ARRAY_CONSTRUCT",
    "STARTSWITH",
    "ENDSWITH",
    "CONTAINS",
    "TRY_TO_NUMBER",
    "TRY_TO_DOUBLE",
    "DAYNAME",
    "MONTHNAME",
    "DATE_PART",
    "DATE_TRUNC",
    "REGEXP_SUBSTR",
    "TRY_CAST",
    "TO_DATE",
    "TO_TIMESTAMP",
    "TRY_TO_DATE",
    "SKEW",
    "KURTOSIS",
    "OBJECT_AGG",
    "TO_ARRAY",
    "ARRAY_SUM",
    "GET",
    "TRY_PARSE_JSON",
    "CHECK_JSON",
    "IS_NULL_VALUE",
    "OBJECT_DELETE",
    "OBJECT_PICK",
    "OBJECT_INSERT",
    "TRY_TO_TIMESTAMP",
    "TRY_TO_TIMESTAMP_NTZ",
    "TRY_TO_TIMESTAMP_LTZ",
    "TRY_TO_TIMESTAMP_TZ",
    "EXTRACT",
    "BOOLXOR_AGG",
    "EQUAL_NULL",
    "DECODE",
    "BOOLOR_AGG",
    "BOOLAND_AGG",
    "RTRIMMED_LENGTH",
    "TIME_SLICE",
    "ARRAY_CONTAINS",
    "ARRAY_POSITION",
    "ARRAY_CAT",
    "ARRAY_TO_STRING",
    "ARRAY_SLICE",
    "BASE64_ENCODE",
    "BASE64_DECODE_STRING",
    "HEX_ENCODE",
    "HEX_DECODE_STRING",
    "STRTOK",
    "INSERT",
    "BITAND",
    "BITOR",
    "BITXOR",
    "BITNOT",
    "BITSHIFTLEFT",
    "BITSHIFTRIGHT",
    "BOOLAND",
    "BOOLOR",
    "BOOLXOR",
    "BOOLNOT",
    "HAVERSINE",
    "BITAND_AGG",
    "BITOR_AGG",
    "BITXOR_AGG",
    "TO_BINARY",
    "TRY_TO_BINARY",
    "ARRAY_REVERSE",
    "TO_BOOLEAN",
    "TRY_TO_BOOLEAN",
    "TO_DECIMAL",
    "TO_NUMERIC",
    "TRY_TO_DECIMAL",
    "TRY_TO_NUMERIC",
    "TO_TIME",
    "TRY_TO_TIME",
    "ARRAY_UNIQUE_AGG",
    "ARRAY_UNION_AGG",
    "MAP_CAT",
    "REGEXP_SUBSTR_ALL",
    "MD5_NUMBER_LOWER64",
    "MD5_NUMBER_UPPER64",
    "MINHASH",
    "APPROXIMATE_SIMILARITY",
    "ST_MAKEPOINT",
    "ST_POINT",
    "TO_GEOGRAPHY",
    "ST_X",
    "ST_Y",
    "ST_DISTANCE",
    "DATE_FROM_PARTS",
    "TIMESTAMP_FROM_PARTS",
    "PREVIOUS_DAY",
    "DAYOFWEEKISO",
    "__SPLIT_RAW__",
    "SPLIT",
    "TRIM",
    "LTRIM",
    "RTRIM",
    "DAYOFWEEK",
    "WEEK",
    "WEEKOFYEAR",
    "WEEKISO",
    "LAST_DAY",
    "TO_TIMESTAMP_NTZ",
    "TO_TIMESTAMP_LTZ",
    "TO_TIMESTAMP_TZ",
    "CONVERT_TIMEZONE",
    "OBJECT_KEYS",
    "GET_PATH",
    "TYPEOF",
    "IS_INTEGER",
    "IS_DECIMAL",
    "IS_BOOLEAN",
    "IS_ARRAY",
    "IS_OBJECT",
    "IS_VARCHAR",
    "ARRAY_COMPACT",
    "ARRAY_EXCEPT",
    "ARRAY_INTERSECTION",
    "ARRAY_INSERT",
    "ARRAY_SORT",
    "ARRAY_GENERATE_RANGE",
    "ARRAY_FLATTEN",
    "ARRAYS_TO_OBJECT",
    "ARRAY_DISTINCT",
    "ARRAY_MAX",
    "ARRAY_MIN",
    "ARRAY_REMOVE",
    "ARRAY_REMOVE_AT",
    "ARRAY_APPEND",
    "ARRAY_PREPEND",
    "ARRAYS_OVERLAP",
    "GREATEST",
    "LEAST",
    "SYSDATE",
    "GETDATE",
    "SYSTIMESTAMP",
    "TRUNC",
    "TRUNCATE",
    "RANDOM",
    "UNIFORM",
    "RANDSTR",
    "NORMAL",
    "PARSE_URL",
    "APPROX_TOP_K",
    "COLLATE",
    "HLL_ACCUMULATE",
    "HLL_COMBINE",
    "HLL_ESTIMATE",
    "HLL_EXPORT",
    "HLL_IMPORT",
    "VECTOR_INNER_PRODUCT",
    "VECTOR_L2_DISTANCE",
    "VECTOR_COSINE_SIMILARITY",
    "ARRAY_REMOVE_AT",
    "APPROX_PERCENTILE",
    "HLL",
    "DIV0NULL",
    "YEAROFWEEK",
    "BASE64_DECODE_BINARY",
    "HEX_DECODE_BINARY",
    "TRY_BASE64_DECODE_STRING",
    "TRY_BASE64_DECODE_BINARY",
    "TRY_HEX_DECODE_STRING",
    "TRY_HEX_DECODE_BINARY",
    "SHA2",
    "SHA2_HEX",
    "SHA1_HEX",
    "SHA1_BINARY",
    "SHA2_BINARY",
    "MD5_HEX",
    "MD5_BINARY",
    "HASH",
    "HASH_AGG",
    "CORR",
    "REGR_SLOPE",
    "REGR_INTERCEPT",
    "REGR_R2",
}


def _spark_collation(spec_arg: str) -> str:
    """Map a Snowflake collation specification ('en-ci', 'utf8',
    'ci-ai', ...) onto a Spark 4 collation name (UTF8_BINARY,
    UTF8_LCASE, UNICODE_CI, en_CI, de_CI_AI, ...). Supported
    specifiers: a locale tag plus ci/cs (case) and ai/as (accent);
    the punctuation/first-letter/trim/case-conversion specifiers
    (pi/ps/fl/fu/trim/upper/lower) change comparison or value
    semantics Spark collations cannot express and raise cleanly."""
    spec = spec_arg.strip().strip("'\"").lower()
    if not spec or spec == "utf8":
        return "UTF8_BINARY"
    locale = None
    ci = ai = False
    for tok in spec.split("-"):
        if not tok or tok in ("cs", "as"):  # the defaults
            continue
        if tok == "ci":
            ci = True
        elif tok == "ai":
            ai = True
        elif tok == "utf8":
            pass
        elif re.fullmatch(r"[a-z]{2,3}(?:_[a-z]{2,4})*", tok) and locale is None:
            locale = tok
        else:
            raise ValueError(
                f"COLLATE specifier '{tok}' is not supported "
                "(supported: locale, ci/cs, ai/as)")
    if locale is None:
        if ci and ai:
            return "UNICODE_CI_AI"
        if ci:
            return "UTF8_LCASE"
        if ai:
            return "UNICODE_AI"
        return "UTF8_BINARY"
    name = locale
    if ci:
        name += "_CI"
    if ai:
        name += "_AI"
    return name


def _regex_charclass(delim_arg: str) -> str:
    """Turn a STRTOK delimiter-set literal into a safe regex character
    class (each char matches individually). Non-literal expressions fall
    back to a single-char class via regexp escaping at runtime — keep
    the literal path, which is the overwhelmingly common case."""
    m = re.match(r"^\s*'([^']*)'\s*$", delim_arg)
    if not m:
        return delim_arg
    chars = m.group(1)
    if "]" in chars or "\\" in chars or not chars:
        # backslash escapes do not survive Spark's SQL string lexer
        # (see _regex_literal) — pass through rather than emit a broken
        # class; plain split-on-literal still handles the 1-char case
        return delim_arg
    # inside a class almost everything is literal; '-' must be last and
    # '^' must not be first
    ordered = "".join(c for c in chars if c not in "-^")
    if "^" in chars:
        if not ordered and "-" not in chars:
            return delim_arg  # lone '^' cannot head a class; pass through
        ordered += "^"
    if "-" in chars:
        ordered += "-"
    return f"'[{ordered}]'"

def _regex_literal(arg: str) -> str:
    """Snowflake SPLIT_TO_TABLE delimiters are literal strings but
    Spark's split() takes a Java regex: when the delimiter is a plain
    string literal, escape regex metacharacters (character-class
    wrapping, which survives SQL string parsing unambiguously —
    backslash escapes would be re-interpreted by Spark's lexer).
    Non-literal expressions pass through unchanged."""
    m = re.match(r"^\s*'([^']*)'\s*$", arg)
    if not m:
        return arg
    # '[' and ']' cannot be class-wrapped (Java regex parses '[[]' as
    # a nested-class open and '[]]' as unclosed); emit a DOUBLED
    # backslash in the SQL text — Spark's string lexer folds it to one,
    # which is exactly the regex escape. Safe because WE generate this
    # literal (the docstring's lexer caveat is about user literals we
    # cannot rewrite).
    escaped = "".join(
        "\\\\" + c if c in "[]"
        else f"[{c}]" if c in ".|*+?^$(){}" else c for c in m.group(1))
    return f"'{escaped}'"


_DEFAULT = Translator()


def translate(sql: str) -> str:
    """Module-level convenience: translate one Snowflake SQL string."""
    return _DEFAULT.translate(sql)
