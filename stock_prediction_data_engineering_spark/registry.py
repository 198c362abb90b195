"""Declared-query registry.

Every operator from SURVEY.md §2 is exposed as a named query:
``QUERIES[name](spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle in ``ORACLES``.
The driver compares the two on row-count + schema + order-insensitive
value-hash, so registered queries follow the hash-stability
conventions (SURVEY.md §2 legend):

- every computed column is aliased identically on both sides;
- floating-point aggregates go through exact DECIMAL(18,4) partial
  sums (the testdata has <=2 decimal places, so the cast is lossless
  and the aggregate is bit-identical across engines) and/or
  ``round(x, 4)``;
- any LIMIT carries a total ORDER BY on a key prefix;
- no rand/approx functions in oracle-checked queries.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle`` is DuckDB SQL over the
    pre-registered testdata views, or None for rows-only checks."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every query module so the registry is fully populated."""
    from .queries import (  # noqa: F401
        aggregates,
        composite,
        joins,
        lake_q,
        llm_extras,
        llm_text,
        llm_vector,
        relational,
        scalar_functions,
        setops,
        streaming_batch,
        surface_extras,
        windows,
    )
