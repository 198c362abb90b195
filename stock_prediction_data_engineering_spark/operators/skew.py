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


def skew_split_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    hot_keys: list[tuple] | None = None,
    top_n: int = 16,
    sample_fraction: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Differentiated skew join: salt ONLY the hot keys, join the rest
    plain. ``salted_join`` replicates the whole small side ``num_salts``
    times — fine for a dimension table, prohibitive when the small side
    is merely smaller. Splitting bounds replication to the hot subset:

    - big rows with hot keys → salted join against the small side's
      hot-key rows (replicated num_salts times — a handful of rows);
    - every other big row → plain shuffle join, untouched.

    The two branches partition the big side exactly (null-safe: rows
    with null keys go cold, where join semantics already handle them),
    so ``union`` of the branches equals the unsalted join row-for-row.

    ``hot_keys`` is the detected hot set — tuples of key values, e.g.
    from `q_heavy_keys`' profile. When None it is measured here: a
    frequency count over ``big`` (optionally on a ``sample_fraction``
    sample — at 100 TB a 1% sample ranks hot keys reliably, hot is what
    hot does), taking the ``top_n`` keys. The list is driver-bounded by
    construction.
    """
    if how not in ("inner", "left"):
        raise ValueError("skew_split_join supports inner/left (big side preserved)")
    if hot_keys is None:
        src = (
            big.sample(fraction=sample_fraction, seed=7)
            if sample_fraction is not None
            else big
        )
        hot_keys = [
            tuple(r[c] for c in on)
            for r in src.groupBy(*on)
            .count()
            .orderBy(F.desc("count"), *on)
            .limit(top_n)
            .collect()
        ]

    def hot_cond():
        # built entirely from eqNullSafe, so the predicate is never
        # NULL: rows with null key components evaluate False here and
        # therefore route to the cold branch, where ordinary join
        # semantics handle them. (A plain `==` would make both `cond`
        # and `~cond` NULL for null keys and the row would vanish from
        # BOTH branches — do not weaken eqNullSafe.)
        cond = F.lit(False)
        for key in hot_keys:
            term = F.lit(True)
            for c, v in zip(on, key):
                term = term & F.col(c).eqNullSafe(F.lit(v))
            cond = cond | term
        return cond

    big_hot = big.filter(hot_cond())
    big_cold = big.filter(~hot_cond())
    small_hot = small.filter(hot_cond())

    hot_joined = salted_join(big_hot, small_hot, on, num_salts, how)
    cold_joined = big_cold.join(small, on, how)
    return hot_joined.unionByName(cold_joined)
