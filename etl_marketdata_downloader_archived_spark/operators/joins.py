"""Join helpers Spark lacks as single primitives.

As-of join (nearest prior match) is the market-data staple the
reference's downstream consumers would run over the lake; Spark has no
native primitive (SURVEY.md section 2B "join_asof"), so it is composed
from a union + window - a single shuffle on (key, time), no O(n*m)
blow-up, which is the 100 TB-safe formulation (the naive range-join +
group-by alternative is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` within the same ``on`` key (inclusive,
    like DuckDB/pandas ``merge_asof`` with direction='backward').

    Ties on ``right_time`` resolve to the greatest ``tie_break`` value
    (deterministic). Unmatched left rows keep NULL right columns.

    Plan shape: union(left, right) -> single shuffle + sort on
    (key, time) -> running ``last(right_struct, ignorenulls)`` -> filter
    back to left rows. One shuffle, linear state, no skew amplification
    beyond the key's own cardinality.
    """
    payload = [c for c in right_cols]
    if tie_break and tie_break not in payload:
        payload = payload + [tie_break]

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema["s"].dataType
        ).alias("_rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("_rrow"),
    )

    order: list[Column] = [F.col("_t").asc(), F.col("_is_right").desc()]
    if tie_break:
        order.append(F.col("_rrow").getField(tie_break).asc_nulls_first())
    w = (
        W.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_is_right") == 0)
    )
    out_cols = [F.col("_lrow").getField(c).alias(c) for c in left.columns]
    out_cols += [F.col("_match").getField(c).alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join - join on an arbitrary boolean condition.

    Catalyst executes pure non-equi conditions as broadcast
    nested-loop; ALWAYS carry an equi-key in ``condition`` when one
    exists (Catalyst splits conjuncts: equi parts hash-partition, range
    parts become post-join filters), otherwise use
    ``banded_interval_join`` below to manufacture the equality
    component.
    """
    return left.join(right, condition, how)


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    band_seconds: int = 30 * 86400,
    extra_on: str | None = None,
) -> DataFrame:
    """Point-in-interval join (left.t in [right.start, right.end)) with
    a manufactured equi-key - the formulation that survives 100 TB.

    A pure non-equi condition forces Catalyst into broadcast
    nested-loop (O(|L|x|R|) compares; impossible when neither side
    broadcasts). Bucketizing the time axis into fixed bands gives the
    join an equality component: each right interval explodes to every
    band it overlaps, each left point carries its single band, and the
    join hash-partitions on (band [, extra_on]) with the exact interval
    predicate as a post-join filter. A matching pair meets in exactly
    one band (the left point's), so no dedup pass is needed. Cost is
    |R| * ceil(interval/band) exploded rows - pick ``band_seconds`` on
    the order of the typical interval length.
    """
    def to_band(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(band_seconds))

    lb = left.withColumn("_band", to_band(F.col(left_time)))
    rb = right.withColumn(
        "_band",
        F.explode(
            F.sequence(to_band(F.col(right_start)), to_band(F.col(right_end)))
        ),
    )
    on = ["_band"] + ([extra_on] if extra_on else [])
    exact = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) < F.col(right_end)
    )
    return lb.join(rb, on, "inner").filter(exact).drop("_band")
