"""SQL-level MATCH_RECOGNIZE clause (r8 s2, beyond reference; grown
through r11): FROM t MATCH_RECOGNIZE (...) [alias] parses in the
executor and routes onto the applyInPandas operator
(operators/match_recognize.py). Surface: ONE/ALL ROWS PER MATCH,
overlapping DEFINEs, physical PRIOR/NEXT navigation, AFTER MATCH SKIP
PAST LAST ROW / TO NEXT ROW / TO [FIRST|LAST] <symbol>, PERMUTE,
anchors, {- -} exclusion, and MEASURES incl. FINAL/RUNNING,
COUNT(col) NULL-skipping and symbol-qualified FIRST/LAST/COUNT."""

import pytest

from snowflake_emulator_spark import errors


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


@pytest.fixture()
def clicks(engine):
    engine.execute("CREATE TABLE mr_clicks (user_id INTEGER, seq INTEGER, etype VARCHAR)")
    engine.execute("INSERT INTO mr_clicks VALUES "
                   "(1, 1, 'view'), (1, 2, 'cart'), (1, 3, 'cart'), (1, 4, 'buy'), "
                   "(1, 5, 'view'), (2, 1, 'view'), (2, 2, 'buy'), (3, 1, 'cart')")
    return engine


def test_full_clause(clicks):
    got = rows(clicks, """
        SELECT user_id, mn, n, first_seq, last_seq
        FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY seq
          MEASURES MATCH_NUMBER() AS mn, COUNT(*) AS n,
                   FIRST(seq) AS first_seq, LAST(seq) AS last_seq
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V C+ B)
          DEFINE V AS etype = 'view', C AS etype = 'cart', B AS etype = 'buy'
        ) mr
        ORDER BY user_id""")
    assert got == [(1, 1, 4, 1, 4)]


def test_minimal_clause_default_columns(clicks):
    got = rows(clicks, """
        SELECT * FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY seq
          PATTERN (V B)
          DEFINE V AS etype = 'view', B AS etype = 'buy'
        ) ORDER BY user_id""")
    assert got == [(2, 1, 2)]  # user_id, match_number, n_rows


def test_multiple_matches_per_partition(clicks):
    clicks.execute("INSERT INTO mr_clicks VALUES (2, 3, 'view'), (2, 4, 'buy')")
    got = rows(clicks, """
        SELECT user_id, mn FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY seq
          MEASURES MATCH_NUMBER() AS mn
          PATTERN (V B)
          DEFINE V AS etype = 'view', B AS etype = 'buy'
        ) ORDER BY user_id, mn""")
    assert got == [(2, 1), (2, 2)]


def test_where_on_output(clicks):
    got = rows(clicks, """
        SELECT user_id FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY seq
          MEASURES COUNT(*) AS n
          PATTERN (C+)
          DEFINE C AS etype = 'cart'
        ) WHERE n >= 2 ORDER BY user_id""")
    assert got == [(1,)]


def test_all_rows_per_match(clicks):
    got = rows(clicks, """
        SELECT user_id, seq, etype, match_number, classifier
        FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY seq
          ALL ROWS PER MATCH
          PATTERN (V C+ B)
          DEFINE V AS etype = 'view', C AS etype = 'cart', B AS etype = 'buy'
        ) ORDER BY user_id, seq""")
    assert got == [
        (1, 1, "view", 1, "V"), (1, 2, "cart", 1, "C"),
        (1, 3, "cart", 1, "C"), (1, 4, "buy", 1, "B")]


def test_all_rows_with_measures_works(clicks):
    """r10: MEASURES + ALL ROWS PER MATCH is now supported (was
    rejected through r9); running COUNT over a single-symbol match."""
    rows = clicks.execute("""
        SELECT user_id, n FROM mr_clicks MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY seq
          MEASURES COUNT(*) AS n
          ALL ROWS PER MATCH
          PATTERN (V) DEFINE V AS etype = 'view')""").rows
    assert rows and all(r[1] == 1 for r in rows)


def test_missing_define_rejected(clicks):
    with pytest.raises(errors.SnowflakeError):
        clicks.execute("""
            SELECT * FROM mr_clicks MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY seq PATTERN (V))""")


def test_unknown_measure_fn_rejected(clicks):
    with pytest.raises(errors.SnowflakeError):
        clicks.execute("""
            SELECT * FROM mr_clicks MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY seq
              MEASURES AVG(seq) AS a
              PATTERN (V) DEFINE V AS etype = 'view')""")


def test_match_recognize_permute_sql(engine):
    """r10: PERMUTE(...) expands to the lexicographic alternation of
    every ordering (SQL:2016); both A-then-B and B-then-A sequences
    match, classifier reflects the actual per-row symbols."""
    engine.execute("CREATE TABLE mr_perm (g INTEGER, seq INTEGER, k VARCHAR)")
    engine.execute("""INSERT INTO mr_perm VALUES
      (1, 1, 'a'), (1, 2, 'b'),
      (2, 1, 'b'), (2, 2, 'a'),
      (3, 1, 'a'), (3, 2, 'c')""")
    rows = engine.execute("""
      SELECT g, match_number, n FROM mr_perm MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (PERMUTE(A, B))
        DEFINE A AS k = 'a', B AS k = 'b'
      ) ORDER BY g""").rows
    assert [tuple(r) for r in rows] == [(1, 1, 2), (2, 1, 2)]


def test_match_recognize_prior_in_define(engine):
    """r10, semantics corrected r11: PRIOR navigation inside DEFINE.
    SQL:2016 PREV / Snowflake LAG-in-DEFINE navigate the partition
    PHYSICALLY — the value is the previous partition row even when that
    row precedes the match start, and NULL only at the partition's
    first row. So the canonical PATTERN (UP+) rising-run query matches
    starting on a PRIOR-using symbol."""
    engine.execute("CREATE TABLE mr_px (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_px VALUES
      (1, 1, 10.0), (1, 2, 12.0), (1, 3, 15.0), (1, 4, 9.0), (1, 5, 11.0),
      (2, 1, 5.0), (2, 2, 4.0), (2, 3, 3.0), (2, 4, 7.0)""")
    rows = engine.execute("""
      SELECT g, match_number, n, f, l FROM mr_px MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n, FIRST(price) AS f, LAST(price) AS l
        ONE ROW PER MATCH
        PATTERN (S UP+)
        DEFINE UP AS price > PRIOR price
      ) ORDER BY g, match_number""").rows
    assert [tuple(r) for r in rows] == [
        (1, 1, 3, 10.0, 15.0),   # 10 < 12 < 15
        (1, 2, 2, 9.0, 11.0),    # 9 < 11
        (2, 1, 2, 3.0, 7.0)]     # 3 < 7
    # a match CAN start on a PRIOR-using symbol: PRIOR sees the
    # partition row before the match start (physical navigation)
    rows = engine.execute("""
      SELECT g, match_number, n FROM mr_px MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MATCH_NUMBER() AS mno, COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (UP+)
        DEFINE UP AS price > PRIOR price
      ) ORDER BY g, match_number""").rows
    assert [tuple(r) for r in rows] == [
        (1, 1, 2),   # 12,15 (PRIOR of 12 = 10, before the match)
        (1, 2, 1),   # 11 (PRIOR = 9)
        (2, 1, 1)]   # 7 (PRIOR = 3)
    # partition row 0 is the ONLY place PRIOR is NULL: a run starting
    # at the partition head never includes row 0 itself
    rows = engine.execute("""
      SELECT g, f FROM mr_px MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(seq) AS f
        ONE ROW PER MATCH
        PATTERN (UP+)
        DEFINE UP AS price > PRIOR price
      ) WHERE g = 1 ORDER BY f""").rows
    assert [tuple(r)[1] for r in rows] == [2, 5]


def test_match_recognize_next_in_define(engine):
    """r11: NEXT navigation inside DEFINE — physical lead column, NULL
    only at the partition's LAST row (SQL:2016 NEXT default offset 1)."""
    engine.execute("CREATE TABLE mr_nx (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_nx VALUES
      (1, 1, 10.0), (1, 2, 12.0), (1, 3, 9.0), (1, 4, 11.0), (1, 5, 8.0)""")
    # PEAK: next price drops. Holds at seq 2 (12>9) and seq 4 (11>8);
    # NULL lead at seq 5 -> false.
    rows = engine.execute("""
      SELECT g, match_number, f FROM mr_nx MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(seq) AS f
        ONE ROW PER MATCH
        PATTERN (PEAK)
        DEFINE PEAK AS price > NEXT price
      ) ORDER BY match_number""").rows
    assert [tuple(r) for r in rows] == [(1, 1, 2), (1, 2, 4)]
    # combined PRIOR + NEXT in one DEFINE: local maximum
    rows = engine.execute("""
      SELECT g, f FROM mr_nx MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(seq) AS f
        ONE ROW PER MATCH
        PATTERN (TOP)
        DEFINE TOP AS price > NEXT price AND price > PRIOR price
      ) ORDER BY f""").rows
    assert [tuple(r)[1] for r in rows] == [2, 4]


def test_match_recognize_count_col_measure(engine):
    """r11: MEASURES COUNT(col) skips NULLs (Snowflake semantics),
    unlike COUNT(*) — both ONE ROW and ALL ROWS (running/final)."""
    engine.execute("CREATE TABLE mr_cc (g INTEGER, seq INTEGER, v DOUBLE)")
    engine.execute("""INSERT INTO mr_cc VALUES
      (1, 1, 10.0), (1, 2, NULL), (1, 3, 15.0), (1, 4, NULL)""")
    rows = engine.execute("""
      SELECT g, nstar, nv FROM mr_cc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS nstar, COUNT(v) AS nv
        ONE ROW PER MATCH
        PATTERN (A+)
        DEFINE A AS seq >= 1
      )""").rows
    assert [tuple(r) for r in rows] == [(1, 4, 2)]
    rows = engine.execute("""
      SELECT seq, rnv, fnv FROM mr_cc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(v) AS rnv, FINAL COUNT(v) AS fnv
        ALL ROWS PER MATCH
        PATTERN (A+)
        DEFINE A AS seq >= 1
      ) ORDER BY seq""").rows
    assert [tuple(r) for r in rows] == [
        (1, 1, 2), (2, 1, 2), (3, 2, 2), (4, 2, 2)]


def test_match_recognize_all_rows_measures(engine):
    """r10: MEASURES with ALL ROWS PER MATCH — RUNNING semantics by
    default (SQL:2016: COUNT/LAST see rows up to the current one),
    FINAL via the keyword; FIRST and MATCH_NUMBER are start/constant."""
    engine.execute("CREATE TABLE mr_arm (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_arm VALUES
      (1, 1, 10.0), (1, 2, 12.0), (1, 3, 15.0), (1, 4, 9.0), (1, 5, 11.0)""")
    rows = engine.execute("""
      SELECT seq, classifier, mno, rcount, fcount, rlast, flast, fprice
      FROM mr_arm MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MATCH_NUMBER() AS mno, COUNT(*) AS rcount,
                 FINAL COUNT(*) AS fcount, LAST(price) AS rlast,
                 FINAL LAST(price) AS flast, FIRST(price) AS fprice
        ALL ROWS PER MATCH
        PATTERN (S UP+)
        DEFINE UP AS price > PRIOR price
      ) ORDER BY mno, seq""").rows
    assert [tuple(r) for r in rows] == [
        (1, "S", 1, 1, 3, 10.0, 15.0, 10.0),
        (2, "UP", 1, 2, 3, 12.0, 15.0, 10.0),
        (3, "UP", 1, 3, 3, 15.0, 15.0, 10.0),
        (4, "S", 2, 1, 2, 9.0, 11.0, 9.0),
        (5, "UP", 2, 2, 2, 11.0, 11.0, 9.0)]


def test_match_recognize_anchors(engine):
    """r10: ^/$ anchors — ^ holds only at partition start, $ only at
    partition end (zero-width, SQL:2016)."""
    engine.execute("CREATE TABLE mr_anc (g INTEGER, seq INTEGER, k VARCHAR)")
    engine.execute("""INSERT INTO mr_anc VALUES
      (1, 1, 'a'), (1, 2, 'a'), (1, 3, 'b'),
      (2, 1, 'b'), (2, 2, 'a')""")
    # ^ A: only the partition-leading 'a' run start matches
    rows = engine.execute("""
      SELECT g, n FROM mr_anc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (^ A+)
        DEFINE A AS k = 'a'
      ) ORDER BY g""").rows
    assert [tuple(r) for r in rows] == [(1, 2)]   # g=2 starts with 'b'
    # B $: only a partition-ending 'b' matches
    rows = engine.execute("""
      SELECT g, n FROM mr_anc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (B $)
        DEFINE B AS k = 'b'
      ) ORDER BY g""").rows
    assert [tuple(r) for r in rows] == [(1, 1)]   # g=2 ends with 'a'


def test_match_recognize_exclusion_syntax(engine):
    """r10: {- pattern -} exclusion — excluded rows are matched
    (COUNT/measures see them) but dropped from ALL ROWS PER MATCH
    output; ONE ROW PER MATCH is unaffected."""
    engine.execute("CREATE TABLE mr_exc (g INTEGER, seq INTEGER, k VARCHAR)")
    engine.execute("""INSERT INTO mr_exc VALUES
      (1, 1, 'a'), (1, 2, 'b'), (1, 3, 'b'), (1, 4, 'c')""")
    rows = engine.execute("""
      SELECT seq, classifier, fn FROM mr_exc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FINAL COUNT(*) AS fn
        ALL ROWS PER MATCH
        PATTERN (A {- B+ -} C)
        DEFINE A AS k = 'a', B AS k = 'b', C AS k = 'c'
      ) ORDER BY seq""").rows
    # rows 2-3 (the B run) are excluded from output; FINAL COUNT still 4
    assert [tuple(r) for r in rows] == [(1, "A", 4), (4, "C", 4)]
    rows = engine.execute("""
      SELECT g, n FROM mr_exc MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (A {- B+ -} C)
        DEFINE A AS k = 'a', B AS k = 'b', C AS k = 'c'
      )""").rows
    assert [tuple(r) for r in rows] == [(1, 4)]


def test_match_recognize_skip_to_last_symbol(engine):
    """r11: AFTER MATCH SKIP TO LAST <symbol> — the classic ticker
    W-shape (STRT DOWN+ UP+): the scan resumes AT the peak row, which
    STRT re-binds, so adjacent V-shapes overlap on the peak."""
    engine.execute("CREATE TABLE mr_tk (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_tk VALUES
      (1, 1, 12.0), (1, 2, 8.0), (1, 3, 10.0), (1, 4, 5.0), (1, 5, 11.0)""")
    rows = engine.execute("""
      SELECT g, match_number, f, l, n FROM mr_tk MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(seq) AS f, LAST(seq) AS l, COUNT(*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO LAST UP
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      ) ORDER BY match_number""").rows
    assert [tuple(r) for r in rows] == [
        (1, 1, 1, 3, 3),   # 12 8 10
        (1, 2, 3, 5, 3)]   # 10 5 11 — starts at the prior peak
    # PAST LAST ROW finds only the first V
    rows = engine.execute("""
      SELECT g, match_number FROM mr_tk MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      )""").rows
    assert len(rows) == 1
    # bare SKIP TO <symbol> means SKIP TO LAST (SQL:2016)
    rows = engine.execute("""
      SELECT g, match_number FROM mr_tk MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO UP
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      )""").rows
    assert len(rows) == 2


def test_match_recognize_skip_to_errors(engine):
    """r11: SQL:2016 runtime errors — SKIP TO a symbol whose first/only
    binding is the match's first row (infinite loop), and SKIP TO a
    symbol not bound in the match."""
    engine.execute("CREATE TABLE mr_ske (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_ske VALUES
      (1, 1, 12.0), (1, 2, 8.0), (1, 3, 10.0)""")
    with pytest.raises(Exception, match="first row|not bound"):
        engine.execute("""
          SELECT g FROM mr_ske MATCH_RECOGNIZE (
            PARTITION BY g ORDER BY seq
            MEASURES COUNT(*) AS n
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO FIRST STRT
            PATTERN (STRT DOWN+ UP+)
            DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
          )""")
    with pytest.raises(Exception, match="not bound"):
        engine.execute("""
          SELECT g FROM mr_ske MATCH_RECOGNIZE (
            PARTITION BY g ORDER BY seq
            MEASURES COUNT(*) AS n
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO LAST Z
            PATTERN (STRT DOWN+ Z?)
            DEFINE DOWN AS price < PRIOR price, Z AS price > 1000
          )""")


def test_match_recognize_symbol_measures_one_row(engine):
    """r11: symbol-qualified MEASURES over the rows mapped to a symbol
    — FIRST(SYM.col) / LAST(SYM.col) / COUNT(SYM.*) / COUNT(SYM.col)."""
    engine.execute("CREATE TABLE mr_sm (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_sm VALUES
      (1, 1, 12.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 10.0), (1, 5, 11.0)""")
    rows = engine.execute("""
      SELECT g, fdown, ldown, fup, lup, ndown, nup
      FROM mr_sm MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES FIRST(DOWN.price) AS fdown, LAST(DOWN.price) AS ldown,
                 FIRST(UP.price) AS fup, LAST(UP.price) AS lup,
                 COUNT(DOWN.*) AS ndown, COUNT(UP.price) AS nup
        ONE ROW PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      )""").rows
    # match: 12 (STRT), 8 6 (DOWN), 10 11 (UP)
    assert [tuple(r) for r in rows] == [(1, 8.0, 6.0, 10.0, 11.0, 2, 2)]


def test_match_recognize_symbol_measures_all_rows(engine):
    """r11: symbol-qualified measures in ALL ROWS mode — RUNNING by
    default (NULL/0 before the symbol's first binding), FINAL keyword."""
    engine.execute("CREATE TABLE mr_sma (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_sma VALUES
      (1, 1, 12.0), (1, 2, 8.0), (1, 3, 10.0), (1, 4, 11.0)""")
    rows = engine.execute("""
      SELECT seq, classifier, rlup, flup, rnd
      FROM mr_sma MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES LAST(UP.price) AS rlup, FINAL LAST(UP.price) AS flup,
                 COUNT(DOWN.*) AS rnd
        ALL ROWS PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      ) ORDER BY seq""").rows
    assert [tuple(r) for r in rows] == [
        (1, "STRT", None, 11.0, 0),
        (2, "DOWN", None, 11.0, 1),
        (3, "UP", 10.0, 11.0, 1),
        (4, "UP", 11.0, 11.0, 1)]


def test_match_recognize_subset_one_row(engine):
    """r13: SQL:2016 SUBSET union symbols — a row maps to the subset
    when its CLASSIFIER is any member, so FIRST/LAST/COUNT over the
    subset skip non-member rows interleaved inside the match."""
    engine.execute("CREATE TABLE mr_sub (g INTEGER, seq INTEGER, price DOUBLE)")
    # chars: A D B D C C | B D C  (A=no prior, B=down, C=up, D=flat)
    engine.execute("""INSERT INTO mr_sub VALUES
      (1, 1, 10.0), (1, 2, 10.0), (1, 3, 8.0), (1, 4, 8.0), (1, 5, 9.0),
      (1, 6, 12.0), (1, 7, 11.0), (1, 8, 11.0), (1, 9, 13.0)""")
    rows = engine.execute("""
      SELECT g, mn, fmove, lmove, nmove, nstall
      FROM mr_sub MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MATCH_NUMBER() AS mn, FIRST(MOVE.price) AS fmove,
                 LAST(MOVE.price) AS lmove, COUNT(MOVE.*) AS nmove,
                 COUNT(STALL.*) AS nstall
        ONE ROW PER MATCH
        PATTERN (STRT (DOWN | FLAT)+ UP+)
        SUBSET MOVE = (DOWN, UP), STALL = (STRT, FLAT)
        DEFINE DOWN AS price < PRIOR price, FLAT AS price = PRIOR price,
               UP AS price > PRIOR price
      ) ORDER BY mn""").rows
    # match 1 = rows 1-6 (STRT FLAT DOWN FLAT UP UP): MOVE rows are
    # seq 3,5,6 (leading FLAT delays FIRST to the DOWN at 8.0);
    # match 2 = rows 7-9 (STRT FLAT UP): MOVE = just the UP at 13.0
    assert [tuple(r) for r in rows] == [
        (1, 1, 8.0, 12.0, 3, 3),
        (1, 2, 13.0, 13.0, 1, 2)]


def test_match_recognize_subset_all_rows_running(engine):
    """r13: subset-qualified measures honor RUNNING semantics in ALL
    ROWS mode — NULL/0 before the first member binding."""
    engine.execute("CREATE TABLE mr_suba (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_suba VALUES
      (1, 1, 10.0), (1, 2, 10.0), (1, 3, 8.0), (1, 4, 9.0)""")
    rows = engine.execute("""
      SELECT seq, classifier, rlm, fnm
      FROM mr_suba MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES LAST(MOVE.price) AS rlm, FINAL COUNT(MOVE.*) AS fnm
        ALL ROWS PER MATCH
        PATTERN (STRT (DOWN | FLAT)+ UP+)
        SUBSET MOVE = (DOWN, UP)
        DEFINE DOWN AS price < PRIOR price, FLAT AS price = PRIOR price,
               UP AS price > PRIOR price
      ) ORDER BY seq""").rows
    assert [tuple(r) for r in rows] == [
        (1, "STRT", None, 2),
        (2, "FLAT", None, 2),
        (3, "DOWN", 8.0, 2),
        (4, "UP", 9.0, 2)]


def test_match_recognize_subset_skip_to(engine):
    """r13: a SUBSET name is a valid AFTER MATCH SKIP TO target — the
    scan resumes at the first/last row mapped to ANY member symbol."""
    engine.execute("CREATE TABLE mr_subs (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_subs VALUES
      (1, 1, 10.0), (1, 2, 8.0), (1, 3, 9.0), (1, 4, 7.0), (1, 5, 9.0)""")
    subset_rows = engine.execute("""
      SELECT mn, f, l FROM mr_subs MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MATCH_NUMBER() AS mn, FIRST(seq) AS f, LAST(seq) AS l
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO LAST MOVE
        PATTERN (STRT DOWN+ UP+)
        SUBSET MOVE = (DOWN, UP)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      ) ORDER BY mn""").rows
    # LAST MOVE row == the last UP row, so the V-shapes overlap on the
    # peak exactly as SKIP TO LAST UP
    explicit = engine.execute("""
      SELECT mn, f, l FROM mr_subs MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MATCH_NUMBER() AS mn, FIRST(seq) AS f, LAST(seq) AS l
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO LAST UP
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      ) ORDER BY mn""").rows
    assert [tuple(r) for r in subset_rows] == [tuple(r) for r in explicit]
    assert [tuple(r) for r in subset_rows] == [(1, 1, 3), (2, 3, 5)]


def test_match_recognize_subset_errors(engine):
    """r13: SUBSET validation — undefined members and name collisions
    with pattern symbols are rejected."""
    engine.execute("CREATE TABLE mr_sube (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("INSERT INTO mr_sube VALUES (1, 1, 1.0), (1, 2, 0.5)")
    with pytest.raises(Exception, match="undefined symbol"):
        engine.execute("""
          SELECT g FROM mr_sube MATCH_RECOGNIZE (
            PARTITION BY g ORDER BY seq
            MEASURES COUNT(M.*) AS n
            PATTERN (D+) SUBSET M = (D, NOPE)
            DEFINE D AS price < PRIOR price)""")
    with pytest.raises(Exception, match="collides"):
        engine.execute("""
          SELECT g FROM mr_sube MATCH_RECOGNIZE (
            PARTITION BY g ORDER BY seq
            MEASURES COUNT(D.*) AS n
            PATTERN (D+) SUBSET D = (D)
            DEFINE D AS price < PRIOR price)""")


def test_match_recognize_subset_alias_not_clause(engine):
    """r14 (ADVICE): a measure aliased `AS subset` is a bare
    identifier, not the SUBSET clause — the clause search is anchored
    to the PATTERN→DEFINE slice, so this must parse and run (it was a
    spurious 'bad SUBSET entry' before the fix)."""
    engine.execute(
        "CREATE TABLE mr_alias (g INTEGER, seq INTEGER, price DOUBLE)")
    engine.execute("""INSERT INTO mr_alias VALUES
      (1, 1, 10.0), (1, 2, 8.0), (1, 3, 9.0)""")
    rows = engine.execute("""
      SELECT g, subset, l
      FROM mr_alias MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES COUNT(*) AS subset, LAST(price) AS l
        ONE ROW PER MATCH
        PATTERN (STRT DOWN+ UP+)
        DEFINE DOWN AS price < PRIOR price, UP AS price > PRIOR price
      )""").rows
    assert [tuple(r) for r in rows] == [(1, 3, 9.0)]


def test_match_recognize_group_straddles_arrow_batches(spark):
    """r16: the block-mapInPandas execution carries a group that an
    Arrow batch boundary cuts in half over to the next batch. Force
    pathological batching (maxRecordsPerBatch=7 against 9-row groups,
    so every boundary lands mid-group) and require bit-identical output
    to the default batching — ONE ROW and ALL ROWS, including measures
    that span the straddled rows."""
    from snowflake_emulator_spark.operators.match_recognize import (
        match_recognize)

    rows = []
    for g in range(10):
        # per group: view, 7x click, purchase -> one 9-row match
        rows.append((g, 0, "view", float(g)))
        rows.extend((g, i, "click", float(g + i)) for i in range(1, 8))
        rows.append((g, 8, "purchase", float(g + 8)))
    df = spark.createDataFrame(
        rows, "g INT, seq INT, etype STRING, price DOUBLE").coalesce(1)

    def run(all_rows):
        m = match_recognize(
            df, "g", ["seq"],
            define={"V": "etype = 'view'", "C": "etype = 'click'",
                    "P": "etype = 'purchase'"},
            pattern="V C+ P",
            measure_cols=None if all_rows else ["price"],
            count_cols=None if all_rows else ["price"],
            all_rows=all_rows,
            all_rows_measures=[("COUNT", "*", "rn", False),
                               ("LAST", "price", "lp", True)]
            if all_rows else None,
        )
        order = (["g", "seq"] if all_rows else ["g", "match_number"])
        return [tuple(r) for r in m.orderBy(*order).collect()]

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "10000")
        one_big, all_big = run(False), run(True)
        spark.conf.set(conf, "7")
        one_small, all_small = run(False), run(True)
    finally:
        spark.conf.set(conf, old)
    assert one_small == one_big
    assert all_small == all_big
    assert len(one_big) == 10 and all(t[2] == 9 for t in one_big)
    assert len(all_big) == 90
