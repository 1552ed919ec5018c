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

from pyspark.sql import Column, DataFrame, Window
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


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    on: str,
    top: int = 15,
) -> DataFrame:
    """Pre-join skew diagnostic: the "which key melts the shuffle"
    report you run BEFORE committing a 100 TB join. Per join key:
    row count on each side, the key's output contribution
    ``out_rows = cnt_left * cnt_right`` (exactly what one reducer
    must materialize in a shuffle join), and its integer
    parts-per-million share of the TOTAL join output. The top keys
    by contribution are what AQE's skew splitter, `salted_join`, or
    a hot-key broadcast slice would target.

    Returns the ``top`` keys as
    (rank, key, cnt_left, cnt_right, out_rows, total_out, share_ppm)
    ordered by contribution (key tie-break).

    Scale: two partial-combined per-key aggregates + one equi-join on
    the key (inner: keys absent from either side contribute nothing),
    a broadcast 1-row total, and a distributed TakeOrderedAndProject
    top-k. The rank window runs AFTER the limit, over <= ``top``
    rows - never over key cardinality."""
    l_cnt = left.groupBy(F.col(on).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_left")
    )
    r_cnt = right.groupBy(F.col(on).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt_right")
    )
    per_key = l_cnt.join(r_cnt, "key").select(
        "key",
        "cnt_left",
        "cnt_right",
        (F.col("cnt_left") * F.col("cnt_right")).alias("out_rows"),
    )
    # the total accumulates in DECIMAL(38,0): a sum of per-key
    # products can pass bigint range even where each product fits
    total = per_key.agg(
        F.sum(F.col("out_rows").cast("decimal(38,0)")).alias("_total_dec")
    )
    head = (
        per_key.orderBy(F.col("out_rows").desc(), "key")
        .limit(int(top))
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("out_rows").desc(), "key")
    return head.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "key",
        "cnt_left",
        "cnt_right",
        "out_rows",
        F.col("_total_dec").cast("bigint").alias("total_out"),
        # ppm through DECIMAL(38,0): at the 100 TB scale this probe
        # targets, out_rows*1e6 overflows bigint (~3M-row hot key on
        # each side -> out_rows ~ 9e12, x1e6 > 9.22e18) and non-ANSI
        # Spark would wrap negative with no error
        F.expr(
            "CAST((CAST(out_rows AS DECIMAL(38,0)) * 1000000)"
            " DIV _total_dec AS BIGINT)"
        ).alias("share_ppm"),
    )
