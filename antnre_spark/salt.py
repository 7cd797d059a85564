"""Explicit salting helpers (SURVEY.md §4.3.1; BASELINE.json:6 "explicit
salting" for long conversations and hub entities).

The salt MUST vary WITHIN a key — a salt derived from the group/join key
itself is a constant per key value and spreads nothing (every row of a hot
key still lands on one reducer). So the salt here is derived from per-ROW
entropy: a caller-supplied row-unique column when one exists (mention_id,
event_id, ...) for a fully deterministic plan, else a hash of the row's
own column values — stable under task retry/stage recomputation, which
monotonically_increasing_id() is not (see salt_col). Any row->salt
assignment yields the identical final result (the salt only spreads rows;
the de-salt merge is exact for decomposable aggregates) — asserted by the
salt-invariance property (SURVEY.md §5.2.4) plus the spread test in
tests/test_salt.py, which plants a hot key and requires >1 partial-agg
group / >1 join task for it.

Two shapes:
- salted_agg: two-level aggregation — partial agg on (key, salt) spreads a
  hot key over S reducers, then a final de-salt agg combines partials.
- salted_join: replicate the small side S times with a salt column and
  per-row-salt the big side so one hot key's rows land on S tasks instead
  of one. AQE's skew-join splitting covers most cases (enabled by default —
  SURVEY.md §4.1); this is the explicit fallback for deterministic planning
  at known-hot keys (e.g. hubs recorded by materialize.hub_entities).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SALTS = 16


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _hashable_cols(df: DataFrame) -> list[str]:
    """Columns xxhash64 accepts: Spark forbids hashing MapType (at any
    nesting) — a map column anywhere in the row would fail analysis, so
    the content-hash salt projects it out. Empty result -> callers fall
    back to the mono-id salt (local/bench only)."""
    return [
        f.name for f in df.schema.fields if not _contains_map(f.dataType)
    ]


def salt_col(
    n_salts: int = DEFAULT_SALTS,
    row_key: Column | None = None,
    content_cols: Sequence[str] | None = None,
) -> Column:
    """Per-ROW salt in [0, n_salts).

    ``row_key``: a row-unique column (preferred when the table has a
    natural id — fully deterministic and maximally spreading).

    ``content_cols``: fall back to a hash of the row's OWN column values.
    This is the production default inside salted_agg/salted_join: unlike
    monotonically_increasing_id(), a content hash is stable under task
    retry / stage recomputation — on a real cluster a fetch failure
    recomputes map partitions, and a salt that depends on partition layout
    would let rows migrate between reducers mid-shuffle and be
    double-counted or lost (the hazard class Spark special-cases only for
    round-robin repartition, SPARK-23207). Exact-duplicate rows share a
    salt under a content hash, which only costs spread, never correctness.

    Bare ``salt_col(n)`` (neither arg) keeps the mono-id fallback for
    local experiments; do not feed it to a shuffle on a real cluster.
    """
    if row_key is not None:
        src = F.xxhash64(row_key)
    elif content_cols:
        src = F.xxhash64(*[F.col(c) for c in content_cols])
    else:
        src = F.xxhash64(F.monotonically_increasing_id())
    return F.pmod(src, F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
    row_key: Column | None = None,
) -> DataFrame:
    """Two-level salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Example::

        salted_agg(events, ["event_type"], {"n": ("*", "count"),
                                            "total": ("value", "sum")},
                   row_key=F.col("event_id"))
    """
    partial_fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    merge_fns = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "_salt", salt_col(n_salts, row_key, content_cols=_hashable_cols(df))
    )
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
    row_key: Column | None = None,
) -> DataFrame:
    """Skew-resistant equi join: per-row-salt the big side, replicate the
    small side across all salts, join on (keys + salt), drop the salt."""
    on = list(on)
    big_s = big.withColumn(
        "_salt", salt_col(n_salts, row_key, content_cols=_hashable_cols(big))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    small_s = small.select("*", salts)
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")
