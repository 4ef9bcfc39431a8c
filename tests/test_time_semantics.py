"""TIME type fidelity (r8, VERDICT r7 item 8 — decision: keep the
SURVEY §1.3 'HH:MM:SS' text representation and PIN its semantics).

Spark has no TIME type (the reference gets real DuckDB TIME,
/root/reference/README.md:287). The text form is chosen so the parts
that matter MATCH Snowflake exactly:

* ordering — zero-padded 'HH:MM:SS' sorts lexicographically ==
  chronologically, so ORDER BY / comparisons / BETWEEN agree;
* EXTRACT parts — HOUR()/MINUTE()/SECOND() agree (Spark casts the
  text); and
* TO_TIME / TRY_TO_TIME — unpadded fields, timestamp inputs, and
  garbage handling agree (r8 fix: unpadded '7:5:9' used to raise).

The one DOCUMENTED DIVERGENCE is interval arithmetic: DATEADD over a
TIME value returns a TIMESTAMP anchored at the current date instead
of a wrapped TIME — pinned below so a behavior change is caught.
"""

import pytest

from snowflake_emulator_spark.sessions import SessionContext


@pytest.fixture()
def time_table(engine):
    ctx = SessionContext()
    engine.execute("CREATE TABLE time_sem (id INTEGER, t TIME)", ctx)
    engine.execute(
        "INSERT INTO time_sem VALUES "
        "(1, '23:59:59'), (2, '07:05:09'), (3, '00:00:00'), (4, '12:30:00')",
        ctx)
    return ctx


def _rows(res):
    return [tuple(r) for r in res.rows]


def test_time_ordering_is_chronological(engine, time_table):
    res = engine.execute(
        "SELECT id FROM time_sem ORDER BY t", time_table)
    assert _rows(res) == [(3,), (2,), (4,), (1,)]
    res = engine.execute(
        "SELECT id FROM time_sem ORDER BY t DESC", time_table)
    assert _rows(res) == [(1,), (4,), (2,), (3,)]


def test_time_comparisons_match_snowflake(engine, time_table):
    res = engine.execute(
        "SELECT id FROM time_sem WHERE t < '12:00:00' ORDER BY id",
        time_table)
    assert _rows(res) == [(2,), (3,)]
    res = engine.execute(
        "SELECT id FROM time_sem WHERE t BETWEEN '07:00:00' AND '13:00:00' "
        "ORDER BY id", time_table)
    assert _rows(res) == [(2,), (4,)]


def test_time_extract_parts(engine, time_table):
    res = engine.execute(
        "SELECT HOUR(t), MINUTE(t), SECOND(t) FROM time_sem WHERE id = 2",
        time_table)
    assert _rows(res) == [(7, 5, 9)]


def test_to_time_accepts_unpadded_and_timestamps(engine, time_table):
    res = engine.execute(
        "SELECT TO_TIME('7:5:9') AS a, TO_TIME('07:45:30') AS b, "
        "TO_TIME('2024-01-15 13:45:12') AS c, TRY_TO_TIME('garbage') AS d",
        time_table)
    assert _rows(res) == [("07:05:09", "07:45:30", "13:45:12", None)]


def test_describe_reports_declared_time_type(engine, time_table):
    res = engine.execute("DESCRIBE TABLE time_sem", time_table)
    assert ("T", "TIME") in [tuple(r)[:2] for r in res.rows]


def test_time_arithmetic_divergence_pinned(engine, time_table):
    """DOCUMENTED DIVERGENCE: Snowflake's DATEADD(hour, 2,
    TO_TIME('07:05:09')) returns TIME '09:05:09' (wrapping mod 24h);
    here the TIME text coerces to a timestamp on the CURRENT date, so
    the result is a TIMESTAMP whose time part is 09:05:09. The time
    part is pinned; a change in either direction (a future real-TIME
    upgrade, or a coercion regression) must update this test."""
    res = engine.execute(
        "SELECT DATEADD(hour, 2, t) AS t2 FROM time_sem WHERE id = 2",
        time_table)
    (val,) = res.rows[0]
    assert (val.hour, val.minute, val.second) == (9, 5, 9)
