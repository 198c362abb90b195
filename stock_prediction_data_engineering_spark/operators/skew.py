"""Skew-mitigated joins (100 TB posture).

A shuffled join hash-partitions both sides on the key, so one hot key
lands its entire row set on a single task — the straggler that defines
job latency at scale. First-line defenses are AQE's skew-join split
(enabled in session.py) and broadcasting the small side; *salting* is
the remaining tool when the build side is too big to broadcast and the
probe side's hot keys overwhelm even AQE's split granularity.

Mechanics: the big side gets a deterministic salt in [0, n); the small
side is replicated n times, once per salt value; the join key becomes
(key, salt). Each hot key now spreads over n tasks. Row multiplicity
is unchanged — every big-side row still meets each matching small-side
row exactly once — so the result is identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    ``how`` supports inner/left (left = big side preserved). The salt
    is a deterministic hash of the big side's full row, so repeated
    runs produce identical partition placement — no RNG state.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side preserved)")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn(SALT_COL, salt.cast("int"))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_s.join(small_s, on + [SALT_COL], how).drop(SALT_COL)
