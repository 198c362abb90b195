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


# ---------------------------------------------------------------------------
# Round-8 additions: the ARRAY-dialect gap class. DuckDB spells a
# token explode ``unnest(string_split(..))`` / ``list_*`` lambdas;
# Spark spells it ``explode(split(..))`` / LATERAL VIEW — no shared
# function names at all. But BOTH engines share ``split_part``
# (1-based, keeps empty fields, '' past the end), inline ``VALUES``
# relations, inequality joins, windows, and ``substring`` — enough to
# express an explode as "join a numbers relation, take the i-th
# field", and a regex-run tokenizer as "explode characters, group
# maximal alnum runs (gaps-and-islands), cut each run back out with
# substring". These builders verified value-identical to the original
# DuckDB-only texts on both engines (tests/test_sql_text.py).


def nums_rel(n: int, col: str = "i") -> str:
    """Inline numbers relation 1..``n`` as a parenthesized subquery —
    a cross join of two VALUES lists (16 x ceil(n/16)), filtered back
    to exactly n. Dialect-free replacement for DuckDB
    ``range``/``generate_series`` (absent in Spark SQL) and Spark
    ``explode(sequence(..))`` (absent in DuckDB). Both engines fold
    the tiny VALUES product at plan time / broadcast it, so joining
    this relation costs one nested-loop over <= n rows per input row.
    """
    w = min(n, 16)
    h = (n + w - 1) // w
    a = ",".join(f"({k})" for k in range(1, w + 1))
    b = ",".join(f"({k})" for k in range(h))
    guard = f" WHERE a.x + {w} * b.y <= {n}" if w * h != n else ""
    return (
        f"(SELECT a.x + {w} * b.y AS {col} "
        f"FROM (VALUES {a}) AS a(x) CROSS JOIN (VALUES {b}) AS b(y)"
        f"{guard})"
    )


# Max space-separated fields per document text across every fixture
# (driver sf0.001-0.1 and the replicated/perturbed .data profiles,
# which keep per-copy word counts): observed max 100. Pinned by
# tests/test_sql_text.py::test_shared_tokenizer_bounds — a split_part
# explode silently truncates past the numbers relation, so the bound
# is asserted, not assumed.
MAX_DOC_WORDS = 128
# Same, for characters (observed max 577).
MAX_DOC_CHARS = 640


def space_tokens(
    cols: str = "doc_id",
    table: str = "documents",
    text: str = "text",
    maxw: int = MAX_DOC_WORDS,
) -> str:
    """``({cols}, pos, token)`` relation: 1-based space-split explode,
    value-identical to DuckDB ``unnest(string_split({text}, ' '))``
    (empty fields between consecutive separators kept, as both sides
    of the dual text agree ``split_part`` does). ``pos`` is the field
    index, so bigrams are a self-equi-join away (pos, pos+1) — or,
    cheaper, a second split_part at pos+1 in the same scan.
    Field count = separator count + 1; NULL text joins away (same as
    unnest(NULL) producing no rows)."""
    return (
        f"(SELECT {cols}, n.i AS pos, split_part({text}, ' ', n.i) AS token "
        f"FROM {table} JOIN {nums_rel(maxw)} n "
        f"ON n.i <= length({text}) - length(replace({text}, ' ', '')) + 1)"
    )


def alnum_tokens(
    id_col: str = "doc_id",
    extra_cols: str = "",
    table: str = "documents",
    text: str = "text",
    maxc: int = MAX_DOC_CHARS,
    with_pos: bool = False,
) -> str:
    """``({id_col}[, extra], tok)`` relation: lowercase alnum-run
    tokenization, value-identical to DuckDB
    ``unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
    x -> x <> ''))`` — i.e. every MAXIMAL run of [a-z0-9] in the
    lowercased text, one row per occurrence, in document order.

    Shared-dialect plan: explode characters (numbers join +
    ``substring(lower(text), i, 1)``), keep alnum positions, group
    consecutive positions into runs by the gaps-and-islands key
    ``i - row_number() OVER (PARTITION BY doc ORDER BY i)``, then cut
    each run back out of the original text with one substring —
    re-deriving the token from (start, length) instead of needing the
    (unshared) ordered string_agg. The run grouping is a keyed window
    + keyed aggregate: everything shuffles on the document key, so
    the plan scales with corpus size like the list-lambda original."""
    # split on bare ',' and strip each name: a caller writing 'a,b' or
    # a stray trailing space must not silently produce 'g.a,b'
    extras = [c.strip() for c in extra_cols.split(",") if c.strip()]
    sel = ", ".join([id_col, *extras])
    gsel = ", ".join(f"g.{c}" for c in [id_col, *extras])
    pos = (
        f", ROW_NUMBER() OVER (PARTITION BY g.{id_col} ORDER BY g.s) AS pos "
        if with_pos
        else " "
    )
    return (
        f"(SELECT {gsel}, substring(lower(d.{text}), g.s, g.l) AS tok{pos}"
        f"FROM (SELECT {sel}, rid, MIN(i) AS s, COUNT(*) AS l "
        f"      FROM (SELECT {sel}, i, i - ROW_NUMBER() OVER "
        f"                 (PARTITION BY {id_col} ORDER BY i) AS rid "
        f"            FROM (SELECT {sel}, n.i AS i, "
        f"                         substring(lower({text}), n.i, 1) AS c "
        f"                  FROM {table} JOIN {nums_rel(maxc)} n "
        f"                  ON n.i <= length({text})) ch "
        f"            WHERE (c >= 'a' AND c <= 'z') "
        f"               OR (c >= '0' AND c <= '9')) al "
        f"      GROUP BY {sel}, rid) g "
        f"JOIN {table} d ON g.{id_col} = d.{id_col})"
    )


def dprod(x: str, y: str, wx: int = 19, wy: int = 19) -> str:
    """Exact BIGINT×BIGINT (or wider) product in the shared dialect —
    the replacement for DuckDB ``HUGEINT`` intermediates (Spark's
    widest integer is BIGINT). Both operands are CAST to explicit
    DECIMAL widths whose sum is <= 38: DuckDB rejects a decimal
    multiplication whose combined width exceeds 38 at the TYPE level,
    and Spark caps the result at DECIMAL(38,0) (exact for any value
    below 1e38, scale 0 preserved). Callers pick (wx, wy) from value
    bounds — e.g. a running sum that fits 30 digits times a count
    that fits 8 — and document the bound at the call site."""
    assert wx + wy <= 38, (wx, wy)
    return f"(CAST({x} AS DECIMAL({wx},0)) * CAST({y} AS DECIMAL({wy},0)))"


# Shared-dialect ASCII character-class predicates over a single-char
# column named c (and its predecessor p) — regex-free, so they dodge
# both the regexp_count gap (absent in DuckDB) and the
# regexp_replace-global flag gap. Used by the char-explode oracles.
IS_LETTER = "((c >= 'a' AND c <= 'z') OR (c >= 'A' AND c <= 'Z'))"
IS_DIGIT = "(c >= '0' AND c <= '9')"
IS_LETTER_P = "((p >= 'a' AND p <= 'z') OR (p >= 'A' AND p <= 'Z'))"
IS_DIGIT_P = "(p >= '0' AND p <= '9')"


def hex_int(expr: str, ndigits: int) -> str:
    """BIGINT value of ``ndigits`` lowercase hex digits — the shared
    replacement for DuckDB ``('0x' || h)::BIGINT`` (Spark CASTs hex
    strings to NULL; DuckDB lacks Spark's ``conv``). Positional
    decode: each digit's value is its 1-based position in the hex
    alphabet minus one, scaled by a precomputed BIGINT power-of-16
    literal (every term is CAST to BIGINT before the multiply, so
    nothing overflows 32-bit ANSI arithmetic). Exact for
    ndigits <= 15 (16^15 < 2^63)."""
    assert ndigits <= 15
    terms = " + ".join(
        f"CAST(position(substring({expr}, {j + 1}, 1) IN "
        f"'0123456789abcdef') - 1 AS BIGINT) * {16 ** (ndigits - 1 - j)}"
        for j in range(ndigits)
    )
    return f"({terms})"
