"""Dual-dialect SQL text builders (round-8, judge item 6).

Oracle texts want to be a THREE-engine witness: the same string must
mean the same thing to DuckDB (the driver's oracle side), Spark SQL
(tools/sql_text_sweep.py), and the DataFrame plan it checks. The time
dialect was the second-largest classified gap (15 queries): DuckDB
spells epoch/gap arithmetic ``epoch()/epoch_us()/date_diff('unit',..)``
while Spark spells it ``unix_timestamp()/unix_micros()/datediff()`` —
no shared function names. These builders express the SAME quantities
through the genuinely common subset, verified value-identical on both
engines (tests/test_sql_text.py pins the results):

- ``extract(day|hour|minute|second FROM x)`` — identical fields;
- timestamp subtraction yields an interval whose ``extract(day ...)``
  is identical;
- ``CAST(ts AS STRING)`` renders identically (microseconds trimmed
  the same way), so sub-second precision is recoverable from text;
- ``date_trunc`` / interval literals / ``rpad`` / ``position(x IN y)``
  are common.

PRECONDITIONS (hold for all current uses; check before new ones):
``epoch_us`` assumes x >= TIMESTAMP '1970-01-01' (the sub-second term
is additive); ``intdiv`` inherits the registry's integer-division
rewrite preconditions (non-negative numerator, |x| < 2^53) — use
``intdiv_exact`` (DECIMAL(38,0) arithmetic) where the numerator can
exceed 2^53.
"""

from __future__ import annotations


def epoch_s(x: str) -> str:
    """Whole seconds since the epoch (truncating sub-seconds), as the
    explicit-extract form both engines evaluate identically — equal to
    DuckDB ``CAST(floor(epoch(x)) AS BIGINT)`` / Spark
    ``unix_timestamp(x)`` (UTC sessions)."""
    return (
        f"(CAST(extract(day from CAST(CAST({x} AS DATE) AS TIMESTAMP)"
        f" - TIMESTAMP '1970-01-01') AS BIGINT)*86400"
        f" + CAST(extract(hour from {x}) AS BIGINT)*3600"
        f" + CAST(extract(minute from {x}) AS BIGINT)*60"
        f" + CAST(extract(second from {x}) AS BIGINT))"
    )


def micros_frac(x: str) -> str:
    """Sub-second microseconds of a timestamp, recovered from the
    canonical string rendering (identical in both engines, fraction
    trimmed of trailing zeros): 0 when the rendering has no '.'.
    NULL input: position() is NULL, the WHEN doesn't match, and the
    ELSE's substring(NULL, ...) propagates the NULL."""
    s = f"CAST({x} AS STRING)"
    p = f"position('.' in CAST({x} AS STRING))"
    return (
        f"(CASE WHEN {p} = 0 THEN 0"
        f" ELSE CAST(rpad(substring({s}, {p} + 1), 6, '0') AS BIGINT) END)"
    )


def epoch_us(x: str) -> str:
    """Microseconds since the epoch — DuckDB ``epoch_us(x)`` / Spark
    ``unix_micros(x)`` in the common subset. NULL-propagating."""
    return f"({epoch_s(x)} * 1000000 + {micros_frac(x)})"


def days_between(d1: str, d2: str) -> str:
    """Day-boundary count from d1 to d2 (DuckDB
    ``date_diff('day', d1, d2)`` / Spark ``datediff(d2, d1)``):
    the day field of the timestamp difference of the date-truncated
    operands (operands below are dates already or are cast by the
    caller)."""
    return (
        f"CAST(extract(day from CAST({d2} AS TIMESTAMP)"
        f" - CAST({d1} AS TIMESTAMP)) AS BIGINT)"
    )


def intdiv(x: str, y: str) -> str:
    """The registry's ``//`` rewrite: truncating integer division for
    non-negative x with |x| < 2^53 (see registry docstring)."""
    return f"(({x}) - ({x}) % ({y})) / ({y})"


def intdiv_exact(x: str, y: str) -> str:
    """Exact integer division through DECIMAL(38,0) — for numerators
    that can exceed 2^53 (the double-division precision cliff). The
    subtraction makes the dividend an exact multiple, so the decimal
    quotient is integral and the outer CAST is lossless."""
    d = f"CAST({x} AS DECIMAL(38,0))"
    return f"CAST(({d} - {d} % ({y})) / ({y}) AS BIGINT)"
