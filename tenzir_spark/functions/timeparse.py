"""The reference's duration and time literal grammar (reference:
libtenzir/include/tenzir/concept/parseable/tenzir/time.hpp, replayed
against libtenzir/test/time.cpp).

Durations are int64 nanoseconds, built from compound components
(``3m42s10ms``): each component is ``<real><spaces?><unit>`` with the
full word/abbreviation unit set; only the FIRST component may be
negative (time.hpp:99-110 guards trailing components positive, so
``-10m8ms1ns`` is -10min PLUS 8ms PLUS 1ns and ``-10m-8ms`` is a parse
error). Per-component scaling truncates toward zero exactly like
``duration_cast`` (the double product rounds to nearest first, so
``-42.001ms`` is -42001000ns, matching the reference).

Times accept the ymdhms forms (year >= 1900; '+', 'T' or ' ' as the
date/time divider; seconds as a real; zone 'Z' or ±HH[[:]MM]; every
tail optional down to ``YYYY-MM``), ``@<unix-epoch-real>``,
``now[±duration]``, ``in <duration>``, and ``<duration> ago``.
"""
from __future__ import annotations

import math
import re

NS = 1
US = 1_000
MS = 1_000_000
SEC = 1_000_000_000
MIN = 60 * SEC
HOUR = 3600 * SEC
DAY = 24 * HOUR
WEEK = 7 * DAY
YEAR = 365 * DAY

# longest-first within each unit family, exactly the alternatives of
# time.hpp:42-79
_UNIT_NS = [
    ("nanoseconds", NS), ("nanosecond", NS), ("nsecs", NS), ("nsec", NS),
    ("ns", NS),
    ("microseconds", US), ("microsecond", US), ("usecs", US), ("usec", US),
    ("us", US),
    ("milliseconds", MS), ("millisecond", MS), ("msecs", MS), ("msec", MS),
    ("ms", MS),
    ("seconds", SEC), ("second", SEC), ("secs", SEC), ("sec", SEC),
    ("s", SEC),
    ("minutes", MIN), ("minute", MIN), ("mins", MIN), ("min", MIN),
    ("m", MIN),
    ("hours", HOUR), ("hour", HOUR), ("hrs", HOUR), ("h", HOUR),
    ("days", DAY), ("day", DAY), ("d", DAY),
    ("weeks", WEEK), ("week", WEEK), ("w", WEEK),
    ("years", YEAR), ("year", YEAR), ("y", YEAR),
]

_UNIT_ALT = "|".join(u for u, _ in _UNIT_NS)
# fast_float/std::from_chars semantics (real.cpp:22): '-' allowed, a
# leading '+' is NOT — so '+42ms' and '10m+8ms' are parse errors
_REAL = r"-?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"
_COMPONENT = re.compile(rf"({_REAL})\s*({_UNIT_ALT})")

#: a regex fragment matching one-or-more duration components (no sign
#: on trailing components), for embedding in other tokenizers
DURATION_RX = (rf"(?:{_REAL})\s*(?:{_UNIT_ALT})"
               rf"(?:(?:\d+\.\d*|\.\d+|\d+)\s*(?:{_UNIT_ALT}))*\b")


def _component_ns(num: str, unit: str) -> int:
    # duration_cast semantics: scale in double, truncate toward zero
    return math.trunc(float(num) * float(dict(_UNIT_NS)[unit]))


def parse_duration_ns(text: str) -> int:
    """Parse a (possibly compound) duration literal to int64 ns."""
    s = text.strip()
    pos = 0
    total = 0
    first = True
    while pos < len(s):
        m = _COMPONENT.match(s, pos)
        if not m:
            break
        num, unit = m.group(1), m.group(2)
        ns = _component_ns(num, unit)
        if not first and ns <= 0:
            # trailing components must be positive (time.hpp:106)
            break
        total += ns
        pos = m.end()
        first = False
    if first or pos != len(s):
        raise ValueError(f"cannot parse duration {text!r}")
    return total


_YMDHMS = re.compile(
    r"(?P<y>\d{4})-(?P<mo>\d{2})"
    r"(?:-(?P<d>\d{2})"
    r"(?:[+T ](?P<h>\d{2})"
    r"(?::(?P<mi>\d{2})"
    r"(?::(?P<s>\d+(?:\.\d*)?|\.\d+))?"
    r"(?P<zone>Z|[+-]\d{2}(?::?\d{2})?)?"
    r")?)?)?$"
)


def _days_from_civil(y: int, m: int, d: int) -> int:
    # Howard Hinnant's days_from_civil, as the reference does
    # (time.hpp:138-154)
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m - 3 if m > 2 else m + 9) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def parse_time_ns(text: str, now_ns: int | None = None) -> int:
    """Parse a time literal to UTC epoch nanoseconds."""
    s = text.strip()
    m = _YMDHMS.match(s)
    if m:
        y, mo = int(m.group("y")), int(m.group("mo"))
        if y >= 1900 and 1 <= mo <= 12:
            d = int(m.group("d") or 1)
            h = int(m.group("h") or 0)
            mi = int(m.group("mi") or 0)
            sec = float(m.group("s") or 0.0)
            if 1 <= d <= 31 and h <= 23 and mi <= 59 and sec <= 60.0:
                zone = m.group("zone")
                zoff_ns = 0
                if zone and zone != "Z":
                    zsign = 1 if zone[0] == "+" else -1
                    rest = zone[1:].replace(":", "")
                    zh = int(rest[:2])
                    zm = int(rest[2:4]) if len(rest) >= 4 else 0
                    zoff_ns = zsign * (zh * HOUR + zm * MIN)
                base = _days_from_civil(y, mo, d) * DAY
                delta = h * HOUR + mi * MIN - zoff_ns
                return base + delta + math.trunc(sec * 1e9)
    if s.startswith("@"):
        return math.trunc(float(s[1:]) * 1e9)

    def _now() -> int:
        if now_ns is not None:
            return now_ns
        import time as _t

        return _t.time_ns()

    if s == "now":
        return _now()
    if s.startswith("now"):
        rest = s[3:].lstrip()
        if rest[:1] in "+-":
            d = parse_duration_ns(rest[1:].lstrip())
            return _now() + (d if rest[0] == "+" else -d)
    if s.startswith("in"):
        try:
            return _now() + parse_duration_ns(s[2:].lstrip())
        except ValueError:
            pass
    if s.endswith("ago"):
        return _now() - parse_duration_ns(s[:-3].rstrip())
    raise ValueError(f"cannot parse time {text!r}")
