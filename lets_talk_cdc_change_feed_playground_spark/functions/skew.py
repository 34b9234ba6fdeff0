"""Skew-resilient aggregation: two-phase salted combine.

At 100 TB a handful of hot keys (one viral user, one default value) can pin
an entire ``groupBy`` stage on a single reducer. AQE's skew-join splitting
(enabled in :mod:`..session`) covers joins; for aggregations the classic fix
is salting: spray each key across ``n_salts`` sub-keys, partially aggregate,
then combine the partials — two small shuffles instead of one hot one.

Only works for algebraic aggregates (decomposable into partial + merge);
``salted_agg`` takes the partial and merge expression builders explicitly so
the caller states both halves. Deterministic: the salt comes from a hash of a
secondary column, not ``rand()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_col: str,
    partials: dict[str, Callable[[], Column]],
    merges: dict[str, Callable[[str], Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``groupBy(keys + salt)`` partials, then
    ``groupBy(keys)`` merge.

    ``partials``: output name -> partial aggregate expression (phase 1).
    ``merges``: output name -> merge expression over the partial column
    (phase 2); e.g. a count partial merges with ``F.sum``, a min with
    ``F.min``, an avg must be carried as (sum, count) partials.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[expr().alias(name) for name, expr in partials.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merges[name](name).alias(name) for name in partials]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: replicate the small side ``n_salts``× and
    spread the big side's hot keys across salts.

    A shuffle join on a skewed key sends every row of the hot key to ONE
    reducer; salting the big side by an unrelated column's hash and
    exploding the small side over all salts turns that reducer into
    ``n_salts`` evenly-loaded ones, at the cost of an ``n_salts``× blowup of
    the (much smaller) build side — the manual form of AQE's skew-join
    splitting, usable when the skew is known up front or AQE is off (e.g.
    inside a streaming micro-batch). Deterministic: the salt is a hash, not
    ``rand()``."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_r = small.withColumn("__salt", salts)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    )
    return big_s.join(
        small_r, (F.col(big_key) == F.col(small_key)) & (big_s["__salt"] == small_r["__salt"])
    ).drop("__salt")
