"""String-cleaning projections for dirty dimension feeds.

The reference's raw screener CSV carries ``$``-prefixed prices and
``%``-suffixed change columns (reference:
data_collection/company_data/company_symbols.csv:2, e.g. "$146.865",
"0.208%"); SURVEY.md §2.2 P6. These are single JVM-side expressions —
no UDF — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_money(col: str | Column) -> Column:
    """'$1,234.56' -> 1234.56 (double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[$,]", "").cast("double")


def clean_percent(col: str | Column) -> Column:
    """'0.208%' -> 0.208 (double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[%,]", "").cast("double")
