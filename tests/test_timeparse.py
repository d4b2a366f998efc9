"""Replay of libtenzir/test/time.cpp against functions/timeparse.py —
every duration vector (all unit spellings, negative, fractional,
compound), every ymdhms form with its timezone arithmetic, the unix
epoch parser, and the now/ago/in relative forms."""
from __future__ import annotations

import pytest

from tenzir_spark.functions.timeparse import (DAY, HOUR, MIN, MS, NS, SEC,
                                              US, WEEK, YEAR,
                                              parse_duration_ns,
                                              parse_time_ns)

# (input, expected ns) — the check_duration calls of time.cpp:36-99
_DURATION_VECTORS = [
    # nanoseconds
    ("42 nanoseconds", 42), ("42 nanosecond", 42), ("42 nsecs", 42),
    ("42nsec", 42), ("42ns", 42),
    # microseconds
    ("42 microseconds", 42 * US), ("42 microsecond", 42 * US),
    ("42 usecs", 42 * US), ("42usec", 42 * US), ("42us", 42 * US),
    # milliseconds
    ("42 milliseconds", 42 * MS), ("42 millisecond", 42 * MS),
    ("42 msecs", 42 * MS), ("42msec", 42 * MS), ("42ms", 42 * MS),
    # seconds
    ("42 seconds", 42 * SEC), ("42 second", 42 * SEC), ("42 secs", 42 * SEC),
    ("42sec", 42 * SEC), ("42s", 42 * SEC),
    # minutes
    ("42 minutes", 42 * MIN), ("42 minute", 42 * MIN), ("42 mins", 42 * MIN),
    ("42min", 42 * MIN), ("42m", 42 * MIN),
    # hours
    ("42 hours", 42 * HOUR), ("42hour", 42 * HOUR), ("42h", 42 * HOUR),
    # weeks (168h)
    ("1 weeks", WEEK), ("1week", WEEK), ("1w", WEEK),
    # years (8760h)
    ("1 years", YEAR), ("1year", YEAR), ("1y", YEAR),
    # negative
    ("-42ns", -42), ("-42h", -42 * HOUR),
    # fractional
    ("3.54s", 3540 * MS), ("-42.001ms", -42001 * US),
    # compound
    ("3m42s10ms", 3 * MIN + 42 * SEC + 10 * MS),
    ("3s42s10ms", 3 * SEC + 42 * SEC + 10 * MS),
    ("42s3m10ms", 3 * MIN + 42 * SEC + 10 * MS),
    ("-10m8ms1ns", -10 * MIN + 8 * MS + 1 * NS),
]


@pytest.mark.parametrize("text,expect", _DURATION_VECTORS)
def test_duration_vectors(text, expect):
    assert parse_duration_ns(text) == expect


def test_no_intermediate_signs():
    # time.cpp:96-98: `-10m-8ms1ns` must not parse to eoi
    with pytest.raises(ValueError):
        parse_duration_ns("-10m-8ms1ns")


def _hms(ns):
    """(days-floored hour, minute, second, microsecond) like the
    to_hours/to_minutes/... helpers of time.cpp:110-124."""
    t = ns % DAY
    return (t // HOUR, (t // MIN) % 60, (t // SEC) % 60,
            (t // US) % 1_000_000)


def _date(ns):
    import datetime

    dt = datetime.datetime.fromtimestamp(ns // SEC,
                                         tz=datetime.timezone.utc)
    return (dt.year, dt.month, dt.day)


def test_ymdhms_vectors():
    # time.cpp:126-211, each MESSAGE block
    ns = parse_time_ns("2012-08-12+23:55:04.001234-01")
    assert _date(ns) == (2012, 8, 13)
    assert _hms(ns) == (0, 55, 4, 1234)

    ns = parse_time_ns("2012-08-12+23:55:04.001234")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (23, 55, 4, 1234)

    ns = parse_time_ns("2012-08-12+23:55:04+00:30")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (23, 25, 4, 0)

    ns = parse_time_ns("2012-08-12+23:55:04")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (23, 55, 4, 0)

    # space divider (needed for Sysmon) and 'T'
    assert parse_time_ns("2012-08-12 23:55:04") == \
        parse_time_ns("2012-08-12+23:55:04") == \
        parse_time_ns("2012-08-12T23:55:04")

    ns = parse_time_ns("2012-08-12+23:55-0130")
    assert _date(ns) == (2012, 8, 13)
    assert _hms(ns) == (1, 25, 0, 0)

    ns = parse_time_ns("2012-08-12+23:55")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (23, 55, 0, 0)

    ns = parse_time_ns("2012-08-12+23")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (23, 0, 0, 0)

    ns = parse_time_ns("2012-08-12")
    assert _date(ns) == (2012, 8, 12)
    assert _hms(ns) == (0, 0, 0, 0)

    ns = parse_time_ns("2012-08")
    assert _date(ns) == (2012, 8, 1)
    assert _hms(ns) == (0, 0, 0, 0)


def test_unix_epoch_vectors():
    # time.cpp:213-219
    assert parse_time_ns("@1444040673") == 1444040673 * SEC
    assert parse_time_ns("@1398933902.686337") == \
        int(1398933902.686337 * 1e9)  # double_seconds cast, same rounding


def test_relative_vectors():
    # time.cpp:221-242 with a pinned `now`
    now = 1_700_000_000 * SEC
    assert parse_time_ns("now", now_ns=now) == now
    assert parse_time_ns("now - 1m", now_ns=now) == now - MIN
    assert parse_time_ns("now + 1m", now_ns=now) == now + MIN
    assert parse_time_ns("10 days ago", now_ns=now) == now - 10 * DAY
    assert parse_time_ns("in 1 year", now_ns=now) == now + YEAR


def test_expression_time_and_duration_literals(spark):
    """The expression surface accepts the full grammar: '+' divider and
    tz offset in time literals, compound + word-unit durations."""
    from pyspark.sql import Row

    from tenzir_spark.expr import compile_expression

    df = spark.createDataFrame(
        [Row(ts="2012-08-12 22:00:00", dur_ns=3 * MIN + 50 * SEC)]
    ).withColumn("ts", __import__("pyspark.sql.functions",
                                  fromlist=["to_timestamp"]).to_timestamp("ts"))
    # 23:55+01:30 == 22:25 UTC > 22:00
    assert df.filter(compile_expression("ts < 2012-08-12+23:55+01:30", df)
                     ).count() == 1
    assert df.filter(compile_expression("ts < 2012-08", df)).count() == 0
    assert df.filter(compile_expression("dur_ns < 3m50s10ms", df)).count() == 1
    assert df.filter(compile_expression("dur_ns > 229 seconds", df)).count() == 1


def test_plus_signed_components_rejected():
    # fast_float/std::from_chars semantics: no leading '+' on reals, so
    # '+'-signed durations are parse errors everywhere
    for bad in ("+42ms", "10m+8ms", "+1h"):
        with pytest.raises(ValueError):
            parse_duration_ns(bad)
