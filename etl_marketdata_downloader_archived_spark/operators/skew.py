"""Skew mitigation helpers: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- aggregation on a hot key (AQE cannot split a hash-aggregate group):
  two-phase salted aggregation;
- joining a skewed fact key against a small-but-not-broadcastable
  dimension: replicate the dimension per salt.

Both are pure DataFrame rewrites - deterministic salts derived from
stable row attributes, never rand() (re-executions must agree;
SURVEY.md section 7 on non-replayable expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, from_cols: list[str]) -> DataFrame:
    """Deterministic salt in [0, salt_buckets): hash of stable row
    attributes (e.g. the row's natural key), NOT rand() - task retries
    and speculative execution must produce the same salt."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(salt_buckets))
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    salt_buckets: int,
    salt_from: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> partial, then
    groupBy(key) -> final. The hot key's rows spread over
    ``salt_buckets`` reducers in phase 1; phase 2 combines
    ``salt_buckets`` partial rows per key - tiny.

    ``partial_aggs`` aggregate raw rows; ``final_aggs`` combine the
    partial columns (e.g. partial sum('x') as px -> final sum('px')).
    """
    phase1 = (
        with_salt(df, salt_buckets, salt_from)
        .groupBy(*group_cols, "_salt")
        .agg(*partial_aggs)
    )
    return phase1.groupBy(*group_cols).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int,
    salt_from: list[str],
    how: str = "inner",
) -> DataFrame:
    """Skewed-fact x small-dim equi-join: salt the fact rows, replicate
    the dim once per salt value, join on (key, salt). The hot key's
    rows land on ``salt_buckets`` different reducers instead of one.

    Dim replication factor = salt_buckets; use only when the dim is too
    big to broadcast but small enough to replicate (the broadcast path
    is always better when it fits)."""
    f = with_salt(fact, salt_buckets, salt_from)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = f.join(d, [on, "_salt"], how)
    return out.drop("_salt")
