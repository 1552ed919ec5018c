"""Market-data analytics over the landed events stream.

The reference exists to land market data for relational consumption
(SURVEY.md section 2B; wiki.md:139-141 delegates querying to Athena).
These are the queries that surface is FOR: time-bucketed OHLCV/VWAP
bars and regular-grid resampling with forward-fill - composed from
operators.timeseries and oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import timeseries as TS
from .registry import q


@q(
    "ohlc_bars",
    oracle="""
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS bar_ts, ts, event_id,
               value, CAST(json_extract(props, '$.k') AS BIGINT) AS qty
        FROM events
    ), r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, bar_ts,
           round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           round(max(value), 6)                             AS high,
           round(min(value), 6)                             AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(count(*) AS BIGINT)                         AS n_trades,
           CAST(sum(qty) AS BIGINT)                         AS volume,
           CAST(sum(CAST(round(value * 100) AS BIGINT) * qty) AS DOUBLE)
                 / 100 / nullif(sum(qty), 0)                AS vwap
    FROM r
    GROUP BY event_type, bar_ts
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLCV + VWAP bars per event_type (operators.timeseries.
    ohlc_bars): open/close via min_by/max_by over the (ts, event_id)
    struct - every aggregate term partial-aggregates map-side, one
    shuffle of bar-bounded state (plan-asserted in tests),
    quantity parsed from the props JSON. Open/high/low/close are single
    pass-through IEEE values (engine-exact); the VWAP ratio is made
    engine-exact by the integer-cents numerator (price_scale=100), so
    nothing needs a rounding tolerance."""
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("qty", F.get_json_object("props", "$.k").cast("bigint"))
    bars = TS.ohlc_bars(
        e,
        "event_type",
        "ts",
        "value",
        "qty",
        width="hour",
        tie_break="event_id",
        # 2dp money: exact integer-cents VWAP numerator, so the ratio
        # is identical on both engines regardless of float-sum order
        price_scale=100,
    )
    return bars.select(
        "event_type",
        "bar_ts",
        F.round("open", 6).alias("open"),
        F.round("high", 6).alias("high"),
        F.round("low", 6).alias("low"),
        F.round("close", 6).alias("close"),
        "n_trades",
        "volume",
        # NO rounding: the integer-cents numerator makes the ratio the
        # same IEEE double on both engines, and the engines' round()
        # builtins disagree on exact-half values (e.g. x.xxxxxx5) that
        # fixed-point prices regularly produce
        "vwap",
    )


@q(
    "resample_ffill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS t0,
               date_trunc('hour', max(ts)) AS t1
        FROM events
    ), grid AS (
        SELECT k.event_type, g.bar_ts
        FROM (SELECT DISTINCT event_type FROM events) k,
             (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bar_ts
              FROM bounds) g
    ), obs AS (
        SELECT event_type, bar_ts, value AS _obs
        FROM (
            SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
                   row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    )
    SELECT g.event_type, g.bar_ts,
           round(last_value(o._obs IGNORE NULLS)
                     OVER (PARTITION BY g.event_type ORDER BY g.bar_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS value,
           CAST(o._obs IS NULL AS INT) AS is_gap
    FROM grid g
    LEFT JOIN obs o ON g.event_type = o.event_type AND g.bar_ts = o.bar_ts
    """,
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of the last observed value per event_type with
    forward-fill across empty buckets (operators.timeseries.
    resample_ffill): dense dimension-sized grid, broadcast of the bar
    steps, running last(ignorenulls) per key. The filled value is a
    single untouched IEEE double (no cross-engine arithmetic drift);
    rounding is belt-and-braces only."""
    e = load_table(spark, sf_dir, "events")
    out = TS.resample_ffill(
        e, "event_type", "ts", "value", width="hour", tie_break="event_id"
    )
    return out.select(
        "event_type",
        "bar_ts",
        F.round("value", 6).alias("value"),
        "is_gap",
    )


@q(
    "recursive_series",
    oracle="""
    WITH RECURSIVE days(day_ts, t1) AS (
        SELECT CAST(date_trunc('day', min(ts)) AS DATE),
               CAST(date_trunc('day', max(ts)) AS DATE)
        FROM events
        UNION ALL
        SELECT CAST(day_ts + INTERVAL 1 DAY AS DATE), t1 FROM days
        WHERE day_ts < t1
    )
    SELECT d.day_ts,
           CAST(count(e.event_id) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM days d
    LEFT JOIN events e ON CAST(date_trunc('day', e.ts) AS DATE) = d.day_ts
    GROUP BY d.day_ts
    """,
)
def recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): daily activity scaffold
    built by recursion from the events min/max - every calendar day
    appears, empty days count zero. The anchor computes both bounds in
    ONE scan and the recursion CARRIES the upper bound as a column -
    a per-iteration scalar subquery would rescan the fact table every
    UnionLoop level (measured 6x this query's cost). The heavy lifting
    is a plain broadcast-able left join + hash agg over the fact
    table. MAX RECURSION LEVEL is pinned Spark-side (default 100 would
    cap the series at ~3 months of days)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE days(day_ts, t1) MAX RECURSION LEVEL 100000 AS (
            SELECT CAST(date_trunc('DAY', min(ts)) AS DATE),
                   CAST(date_trunc('DAY', max(ts)) AS DATE)
            FROM events
            UNION ALL
            SELECT CAST(day_ts + INTERVAL 1 DAY AS DATE), t1 FROM days
            WHERE day_ts < t1
        )
        SELECT d.day_ts,
               CAST(count(e.event_id) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM days d
        LEFT JOIN events e ON CAST(date_trunc('DAY', e.ts) AS DATE) = d.day_ts
        GROUP BY d.day_ts
        """
    )
