"""Time-series bar aggregation and resampling.

The reference lands market data precisely so downstream consumers can
run time-bucketed analytics over it (SURVEY.md section 2B delegates the
relational surface to Athena; OHLC bars / VWAP / regular-grid
resampling are the market-data queries that surface exists for). Spark
has no bar-aggregation primitive, so these compose it from
``date_trunc`` + window ranking + hash aggregation.

Scale shape (100 TB): both operators shuffle ONCE on the (series key,
bar) pair. ``ohlc_bars`` ranks rows inside each bar with a window whose
partitioning equals the final groupBy key, so Catalyst reuses the
exchange - rank and aggregate ride the same shuffle. ``resample_ffill``
builds the time grid from dimension-sized inputs (distinct keys x bar
range), broadcast-joins the observed bars onto it, and forward-fills
with a running ``last(ignorenulls)`` window per key - linear state, no
per-gap self-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _bar(ts: str, width: str) -> Column:
    # date_trunc returns a TZ-aware timestamp; cast back so bar keys
    # stay NTZ like the lake's event timestamps (UTC session)
    return F.date_trunc(width, F.col(ts)).cast("timestamp_ntz")


def ohlc_bars(
    df: DataFrame,
    key: str,
    ts: str,
    price: str,
    qty: str | Column,
    width: str = "hour",
    tie_break: str | None = None,
    price_scale: int | None = None,
) -> DataFrame:
    """Tumbling OHLCV bars per series key: open/high/low/close of
    ``price``, trade count, total quantity, and quantity-weighted mean
    price (VWAP) per ``width`` bucket of ``ts``.

    Open/close are the price at the first/last row of the bar ordered
    by (ts, tie_break) - the tie-break keeps bars deterministic when
    two trades share a timestamp. Implemented as two row_number ranks
    inside a window partitioned by the same (key, bar) the final
    aggregation groups on: one shuffle total, rank + agg pipelined in
    the same stage (exchange reuse), no join back.

    ``price_scale``: when prices are fixed-point (e.g. 100 for 2dp
    money), the VWAP numerator accumulates EXACT integer price-units
    (round(price*scale) as bigint) instead of floats, so the ratio is
    one correctly-rounded IEEE division of identical operands on any
    engine / partitioning - float-sum order can never drift the result
    across a rounding boundary. Default (None) keeps plain float math.
    """
    qty_col = F.col(qty) if isinstance(qty, str) else qty
    order = [F.col("_ts")] + ([F.col(tie_break)] if tie_break else [])
    order_desc = [c.desc() for c in order]
    barred = df.select(
        F.col(key),
        _bar(ts, width).alias("bar_ts"),
        F.col(ts).alias("_ts"),
        F.col(price).alias("_px"),
        qty_col.alias("_qty"),
        *([F.col(tie_break)] if tie_break else []),
    )
    w = W.partitionBy(key, "bar_ts")
    ranked = barred.select(
        key,
        "bar_ts",
        "_px",
        "_qty",
        F.row_number().over(w.orderBy(*order)).alias("_rn_a"),
        F.row_number().over(w.orderBy(*order_desc)).alias("_rn_d"),
    )
    return ranked.groupBy(key, "bar_ts").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col("_px"))).alias("open"),
        F.max("_px").alias("high"),
        F.min("_px").alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_px"))).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("_qty").cast("bigint").alias("volume"),
        # nullif guard: an all-zero-quantity bar has no VWAP (ANSI mode
        # would raise on the bare division)
        (
            (
                F.sum(
                    F.round(F.col("_px") * price_scale).cast("bigint")
                    * F.col("_qty")
                ).cast("double")
                / price_scale
                if price_scale
                else F.sum(F.col("_px") * F.col("_qty"))
            )
            / F.nullif(F.sum("_qty"), F.lit(0))
        ).alias("vwap"),
    )


def time_grid(
    df: DataFrame, key: str, ts: str, width: str = "hour"
) -> DataFrame:
    """Dense (key, bar_ts) grid: every ``width`` step between the
    GLOBAL min and max of ``ts``, for every distinct key. Both inputs
    are dimension-sized (distinct keys x bar count), so the cross join
    is a broadcast nested loop over metadata-scale rows - the 100 TB
    fact table is scanned only for its min/max (partial agg)."""
    bounds = df.agg(
        F.min(F.col(ts)).alias("_t0"), F.max(F.col(ts)).alias("_t1")
    ).select(
        F.date_trunc(width, "_t0").cast("timestamp_ntz").alias("_t0"),
        F.date_trunc(width, "_t1").cast("timestamp_ntz").alias("_t1"),
    )
    steps = bounds.select(
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"INTERVAL 1 {width}"))
        ).alias("bar_ts")
    )
    keys = df.select(F.col(key)).distinct()
    return keys.crossJoin(F.broadcast(steps))


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    width: str = "hour",
    tie_break: str | None = None,
) -> DataFrame:
    """Resample to a regular ``width`` grid per key and forward-fill.

    Each grid cell carries the LAST observed ``value`` in its bucket
    (ordered by ts + tie-break); empty cells inherit the most recent
    prior cell's value via a running ``last(ignorenulls)`` window.
    Cells before a key's first observation stay NULL. ``is_gap`` marks
    filled-in cells. One shuffle for the per-bar last, one for the
    per-key ffill window; grid construction is dimension-sized
    (see time_grid)."""
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    barred = df.select(
        F.col(key),
        _bar(ts, width).alias("bar_ts"),
        *[F.col(c) for c in dict.fromkeys([ts, value] + ([tie_break] if tie_break else []))],
    )
    w_bar = W.partitionBy(key, "bar_ts").orderBy(*[c.desc() for c in order])
    last_in_bar = (
        barred.withColumn("_rn", F.row_number().over(w_bar))
        .filter(F.col("_rn") == 1)
        .select(key, "bar_ts", F.col(value).alias("_obs"))
    )
    grid = time_grid(df, key, ts, width)
    joined = grid.join(last_in_bar, [key, "bar_ts"], "left")
    w_fill = (
        W.partitionBy(key)
        .orderBy("bar_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        key,
        "bar_ts",
        F.last("_obs", ignorenulls=True).over(w_fill).alias(value),
        F.col("_obs").isNull().cast("int").alias("is_gap"),
    )
