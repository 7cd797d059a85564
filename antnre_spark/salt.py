"""Explicit salting helpers (SURVEY.md §4.3.1; BASELINE.json:6 "explicit
salting" for long conversations and hub entities).

Two shapes:
- salted_agg: two-level aggregation — partial agg on (key, salt) spreads a
  hot key over S reducers, then a final de-salt agg combines partials. The
  result is provably identical to the unsalted aggregation for any
  decomposable aggregate (sum/count/min/max) — tested by the
  salt-invariance property (SURVEY.md §5.2.4).
- salted_join: replicate the small side S times with a salt column and salt
  the big side with pmod(xxhash64(key), S) so one hot key's rows land on S
  tasks instead of one. AQE's skew-join splitting covers most cases
  (enabled by default — SURVEY.md §4.1); this is the explicit fallback for
  deterministic planning at known-hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_col(key: Column, n_salts: int = DEFAULT_SALTS) -> Column:
    """Deterministic salt in [0, n_salts): pmod(xxhash64(key), S)."""
    return F.pmod(F.xxhash64(key), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-level salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Example::

        salted_agg(events, ["event_type"], {"n": ("*", "count"),
                                            "total": ("value", "sum")})
    """
    partial_fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    merge_fns = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", salt_col(F.concat_ws("", *keys), n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            partial_fns[fn](col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fns[fn](out).alias(out) for out, (_c, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-resistant equi join: salt the big side, replicate the small side
    across all salts, join on (keys + salt), drop the salt."""
    on = list(on)
    big_s = big.withColumn("_salt", salt_col(F.concat_ws("", *on), n_salts))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    small_s = small.select("*", salts)
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")
