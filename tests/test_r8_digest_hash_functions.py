"""r8 session-2 scalar batch: digest aliases (SHA1/SHA2/MD5 _HEX and
_BINARY forms), binary codecs (BASE64/HEX _DECODE_BINARY + TRY_
variants), 64-bit HASH / HASH_AGG, and passthrough checks for the
string-splice / lambda / regression-aggregate families declared in the
inventory this round.

Behavior contracts are public Snowflake docs; the reference implements
none of these (beyond-reference additions to the translator surface,
/root/reference/pkg/query/translator.go is the scope being extended).
"""

import hashlib

import pytest


def rows(engine, sql):
    return [tuple(r) for r in engine.execute(sql).rows]


def one(engine, sql):
    return rows(engine, sql)[0]


# -- digest hex forms --------------------------------------------------------

def test_sha2_defaults_to_256(engine):
    expect = hashlib.sha256(b"abc").hexdigest()
    assert one(engine, "SELECT SHA2('abc') AS v, SHA2_HEX('abc') AS h") == (
        expect, expect)


def test_sha2_bit_lengths(engine):
    assert one(engine, "SELECT SHA2('abc', 512) AS v") == (
        hashlib.sha512(b"abc").hexdigest(),)


def test_sha1_and_md5_hex(engine):
    assert one(engine, "SELECT SHA1('abc') AS a, SHA1_HEX('abc') AS b") == (
        hashlib.sha1(b"abc").hexdigest(),) * 2
    assert one(engine, "SELECT MD5('abc') AS a, MD5_HEX('abc') AS b") == (
        hashlib.md5(b"abc").hexdigest(),) * 2


def test_binary_digest_forms(engine):
    got = one(engine,
              "SELECT HEX_ENCODE(SHA1_BINARY('abc')) AS s1, "
              "HEX_ENCODE(SHA2_BINARY('abc')) AS s2, "
              "HEX_ENCODE(MD5_BINARY('abc')) AS m5")
    assert got == (hashlib.sha1(b"abc").hexdigest().upper(),
                   hashlib.sha256(b"abc").hexdigest().upper(),
                   hashlib.md5(b"abc").hexdigest().upper())


# -- binary codecs -----------------------------------------------------------

def test_decode_binary_forms(engine):
    assert one(engine,
               "SELECT CAST(BASE64_DECODE_BINARY('YWJj') AS STRING) AS b, "
               "CAST(HEX_DECODE_BINARY('616263') AS STRING) AS h") == ("abc", "abc")


def test_try_decode_null_on_garbage(engine):
    assert one(engine,
               "SELECT TRY_BASE64_DECODE_STRING('!not base64!') AS a, "
               "TRY_HEX_DECODE_STRING('zz') AS b, "
               "TRY_BASE64_DECODE_BINARY('!!') AS c, "
               "TRY_HEX_DECODE_BINARY('0g_') AS d") == (None, None, None, None)


def test_try_decode_roundtrip(engine):
    assert one(engine,
               "SELECT TRY_BASE64_DECODE_STRING(BASE64_ENCODE('hello')) AS a, "
               "TRY_HEX_DECODE_STRING(HEX_ENCODE('hello')) AS b") == (
        "hello", "hello")


# -- HASH / HASH_AGG ---------------------------------------------------------

def test_hash_is_64bit_and_stable(engine):
    (a, b, multi) = one(engine,
                        "SELECT HASH('abc') AS a, HASH('abc') AS b, "
                        "HASH('abc', 1, 2.5) AS m")
    assert a == b
    assert multi != a
    # xxhash64 of 'abc' exceeds 32-bit range (Snowflake HASH is 64-bit)
    assert abs(a) > 2**31


def test_hash_agg_order_independent(engine):
    engine.execute("CREATE TABLE hagg (s VARCHAR)")
    engine.execute("INSERT INTO hagg VALUES ('a'), ('b'), ('a')")
    [(fwd,)] = rows(engine, "SELECT HASH_AGG(s) AS v FROM hagg")
    [(rev,)] = rows(engine, "SELECT HASH_AGG(s) AS v FROM "
                            "(SELECT s FROM hagg ORDER BY s DESC)")
    assert fwd == rev
    # multiset-sensitive: dropping a duplicate changes the aggregate
    [(dedup,)] = rows(engine, "SELECT HASH_AGG(s) AS v FROM "
                              "(SELECT DISTINCT s FROM hagg)")
    assert dedup != fwd


def test_hash_agg_grouped(engine):
    engine.execute("CREATE TABLE hagg2 (g INTEGER, s VARCHAR)")
    engine.execute("INSERT INTO hagg2 VALUES (1,'x'), (1,'y'), (2,'x')")
    got = rows(engine, "SELECT g, HASH_AGG(s) AS h FROM hagg2 "
                       "GROUP BY g ORDER BY g")
    assert len(got) == 2 and got[0][1] != got[1][1]


# -- passthrough families pinned (declared queries cover oracle parity) ------

def test_string_splice_position(engine):
    assert one(engine,
               "SELECT TRANSLATE('abcba','ab','xy') AS t, ASCII('A') AS a, "
               "CHR(66) AS c, INSERT('abcdef', 2, 3, 'ZZ') AS i, "
               "POSITION('lo' IN 'hello') AS p1, POSITION('lo', 'hello') AS p2, "
               "LENGTH(SPACE(3)) AS sp") == (
        "xycyx", 65, "B", "aZZef", 4, 4, 3)


def test_higher_order_lambdas(engine):
    assert one(engine,
               "SELECT ARRAY_TO_STRING(FILTER(ARRAY_CONSTRUCT(1,2,3), x -> x > 1), ',') AS f, "
               "ARRAY_TO_STRING(TRANSFORM(ARRAY_CONSTRUCT(1,2), x -> x * 10), ',') AS t, "
               "REDUCE(ARRAY_CONSTRUCT(1,2,3), 0, (acc, x) -> acc + x) AS r") == (
        "2,3", "10,20", 6)


def test_regression_aggregates(engine):
    engine.execute("CREATE TABLE regr_t (x DOUBLE, y DOUBLE)")
    engine.execute("INSERT INTO regr_t VALUES (1.0, 3.0), (2.0, 5.0), (3.0, 7.0)")
    got = one(engine,
              "SELECT ROUND(CORR(x, y), 6) AS c, REGR_SLOPE(y, x) AS m, "
              "REGR_INTERCEPT(y, x) AS b, REGR_COUNT(y, x) AS n, "
              "ROUND(REGR_R2(y, x), 6) AS r2 FROM regr_t")
    assert got == (1.0, 2.0, 1.0, 3, 1.0)


def test_corr_zero_variance_returns_null(engine):
    """Spark 4 ANSI corr() raises DIVIDE_BY_ZERO on zero-variance input;
    Snowflake returns NULL — the translator rebuilds corr from the
    pair-filtered regr_* sums with try_divide (r8 fuzz finding)."""
    engine.execute("CREATE TABLE corr_t (x DOUBLE, y DOUBLE)")
    engine.execute("INSERT INTO corr_t VALUES (1.0, 5.0), (1.0, 7.0), (1.0, 9.0)")
    assert one(engine, "SELECT CORR(x, y) AS c FROM corr_t") == (None,)
    assert one(engine, "SELECT CORR(y, x) AS c FROM corr_t") == (None,)
    # non-degenerate input still matches the closed form exactly
    engine.execute("INSERT INTO corr_t VALUES (2.0, 11.0)")
    [(c,)] = rows(engine, "SELECT ROUND(CORR(x, y), 6) AS c FROM corr_t")
    assert c is not None


def test_percentile_within_group(engine):
    engine.execute("CREATE TABLE pct_t (x DOUBLE)")
    engine.execute("INSERT INTO pct_t VALUES (1.0), (2.0), (10.0)")
    assert one(engine,
               "SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY x) AS pc, "
               "PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY x) AS pd "
               "FROM pct_t") == (2.0, 2.0)
