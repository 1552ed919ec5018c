"""Time-series bar aggregation and resampling.

The reference lands market data precisely so downstream consumers can
run time-bucketed analytics over it (SURVEY.md section 2B delegates the
relational surface to Athena; OHLC bars / VWAP / regular-grid
resampling are the market-data queries that surface exists for). Spark
has no bar-aggregation primitive, so these compose it from
``date_trunc`` buckets + ``min_by``/``max_by`` hash aggregation.

Scale shape (100 TB): bar aggregation is ONE hash aggregate on the
(series key, bar) pair whose every term - including open/close via
min_by/max_by over a (ts, tie) struct - has a partial (map-side
combine) form, so each input partition reduces to one row per touched
bar BEFORE the shuffle; what crosses the wire is bar-count-bounded, not
row-count-bounded. A window-rank formulation would instead shuffle
every trade. The same shape runs unchanged under Structured Streaming
(see streaming_ohlc_bars). ``resample_ffill`` builds its time grid from
dimension-sized inputs (distinct keys x bar range), broadcast-joins the
observed bars onto it, and forward-fills with a running
``last(ignorenulls)`` window per key - linear state, no per-gap
self-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _bar(ts: str, width: str) -> Column:
    # date_trunc returns a TZ-aware timestamp; cast back so bar keys
    # stay NTZ like the lake's event timestamps (UTC session)
    return F.date_trunc(width, F.col(ts)).cast("timestamp_ntz")


def _ohlc_aggs(
    ts: str, tie_break: str | None, price_scale: int | None
) -> list[Column]:
    """The OHLCV aggregate list over prepared columns _ts/_px/_qty.

    Every term is a declarative aggregate with a partial form -
    min_by/max_by carry one (ord-key, price) pair of state per group -
    so the whole bar reduces map-side and works identically in batch
    hash aggregation and streaming state stores.
    """
    ord_key = F.struct(
        F.col("_ts"), *([F.col(tie_break)] if tie_break else [])
    )
    return [
        F.min_by("_px", ord_key).alias("open"),
        F.max("_px").alias("high"),
        F.min("_px").alias("low"),
        F.max_by("_px", ord_key).alias("close"),
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
    ]


def _prepare(
    df: DataFrame,
    key: str,
    ts: str,
    price: str,
    qty: str | Column,
    tie_break: str | None,
) -> DataFrame:
    qty_col = F.col(qty) if isinstance(qty, str) else qty
    return df.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.col(price).alias("_px"),
        qty_col.alias("_qty"),
        *([F.col(tie_break)] if tie_break else []),
    )


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
    two trades share a timestamp - computed as ``min_by``/``max_by``
    over the (ts, tie) struct, so the whole query is one partially-
    aggregatable hash aggregate: each scan partition combines to one
    row per touched bar before the single shuffle.

    ``price_scale``: when prices are fixed-point (e.g. 100 for 2dp
    money), the VWAP numerator accumulates EXACT integer price-units
    (round(price*scale) as bigint) instead of floats, so the ratio is
    one correctly-rounded IEEE division of identical operands on any
    engine / partitioning - float-sum order can never drift the result
    across a rounding boundary. Default (None) keeps plain float math.
    """
    prepared = _prepare(df, key, ts, price, qty, tie_break).withColumn(
        "bar_ts", _bar("_ts", width)
    )
    return prepared.groupBy(key, "bar_ts").agg(
        *_ohlc_aggs(ts, tie_break, price_scale)
    )


def streaming_ohlc_bars(
    df: DataFrame,
    key: str,
    ts: str,
    price: str,
    qty: str | Column,
    window: str = "1 hour",
    watermark: str = "1 hour",
    tie_break: str | None = None,
    price_scale: int | None = None,
) -> DataFrame:
    """The streaming twin of ohlc_bars: identical aggregate terms over
    ``F.window(ts, window)`` with a watermark bounding bar state - a
    bar finalizes (and its state drops) once the watermark passes its
    close. Works on batch DataFrames too (unified semantics), which is
    how tests cross-check it against ohlc_bars. Emits bar_ts = window
    start to match the batch operator's date_trunc bucket keys."""
    prepared = _prepare(df, key, ts, price, qty, tie_break)
    windowed = prepared.withWatermark("_ts", watermark).groupBy(
        F.col(key), F.window("_ts", window).alias("_w")
    )
    out = windowed.agg(*_ohlc_aggs(ts, tie_break, price_scale))
    return out.select(
        key,
        F.col("_w.start").cast("timestamp_ntz").alias("bar_ts"),
        "open",
        "high",
        "low",
        "close",
        "n_trades",
        "volume",
        "vwap",
    )


def indicator_panel(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    zscore_rows: int = 20,
    tie_break: str | None = None,
) -> DataFrame:
    """Per-series indicator features in ONE window pass: log return vs
    the previous observation, rolling ``zscore_rows``-row z-score, and
    drawdown from the running maximum.

    All three frames share the same partitionBy(key).orderBy(ts, tie)
    spec, so Catalyst collapses them into a single Window operator -
    one shuffle + one sort produces the whole panel (asserted in
    tests). State per window is bounded (zscore_rows rows for the
    z-score, one running max/lag cell otherwise); skew is bounded by a
    single series' row count, the floor for any sequential feature.
    Division/log guards keep ANSI mode happy on constant or
    non-positive series."""
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    w = W.partitionBy(key).orderBy(*order)
    wz = w.rowsBetween(-(zscore_rows - 1), 0)
    wmax = w.rowsBetween(W.unboundedPreceding, 0)
    v = F.col(value)
    prev = F.lag(v).over(w)
    mu = F.avg(v).over(wz)
    sd = F.stddev_samp(v).over(wz)
    runmax = F.max(v).over(wmax)
    return df.select(
        key,
        *[c for c in ([ts] + ([tie_break] if tie_break else []))],
        value,
        F.when(
            (v > 0) & (prev > 0), F.log(v / prev)
        ).alias("log_return"),
        ((v - mu) / F.nullif(sd, F.lit(0.0))).alias("zscore"),
        (v / F.nullif(runmax, F.lit(0.0)) - 1).alias("drawdown"),
    )


def ewma(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    tie_break: str | None = None,
    adjust: bool = False,
) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per key in
    (ts, tie_break) order, appended as an ``ewma`` column.

    The recursion y_i = a*x_i + (1-a)*y_{i-1} is inherently sequential
    per series, so this is an Arrow-batched ``applyInPandas`` over
    groupBy(key) - pandas ``ewm`` vectorizes the scan within each
    series; Spark distributes across series. A group holds ONE series'
    history (the floor any sequential recursion needs); keys are the
    parallelism unit, the same bound the indicator windows have. The
    numerically-stable alternative for monster single series -
    segmented scan with (1-a)^len carry composition - is documented
    here as the swap, not needed below ~1e8 rows per series."""
    from pyspark.sql import types as T

    sort_cols = [ts] + ([tie_break] if tie_break else [])
    # fresh StructType: .add() would mutate the input frame's schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("ewma", T.DoubleType())]
    )

    def fn(pdf):
        pdf = pdf.sort_values(sort_cols)
        pdf["ewma"] = pdf[value].ewm(alpha=alpha, adjust=adjust).mean()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema=out_schema)


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


def _grid_with_last_obs(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    width: str,
    tie_break: str | None,
) -> DataFrame:
    """Shared staging for the resamplers: the dense (key, bar_ts)
    grid left-joined with each bucket's LAST observation (ordered by
    ts + tie-break via a map-side-combinable max_by). One place so
    resample_ffill and resample_interpolate cannot drift on per-bar
    selection or grid construction. Returns (key, bar_ts, _obs)."""
    ord_key = F.struct(
        F.col("_ts"), *([F.col(tie_break)] if tie_break else [])
    )
    barred = df.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.col(value).alias("_v"),
        *([F.col(tie_break)] if tie_break else []),
    ).withColumn("bar_ts", _bar("_ts", width))
    last_in_bar = barred.groupBy(key, "bar_ts").agg(
        F.max_by("_v", ord_key).alias("_obs")
    )
    grid = time_grid(df, key, ts, width)
    return grid.join(last_in_bar, [key, "bar_ts"], "left")


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
    (ordered by ts + tie-break, via a map-side-combinable ``max_by``);
    empty cells inherit the most recent prior cell's value through a
    running ``last(ignorenulls)`` window. Cells before a key's first
    observation stay NULL. ``is_gap`` marks filled-in cells. One
    shuffle for the per-bar last, one for the per-key ffill window;
    grid construction is dimension-sized (see time_grid)."""
    joined = _grid_with_last_obs(df, key, ts, value, width, tie_break)
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


def rollup_bars(
    bars: DataFrame,
    key: str,
    width: str = "day",
) -> DataFrame:
    """Roll finer bars up to a coarser ``width`` (hour -> day -> week)
    WITHOUT revisiting ticks: open = first bar's open, close = last
    bar's close (min_by/max_by on bar_ts), high/low = extrema,
    n_trades/volume = sums, VWAP re-derived from the re-accumulated
    (vwap x volume) notional. Exactly the ohlc_bars aggregate shape -
    every term partial-aggregates map-side - so bar hierarchies build
    each level from the previous one at bar-count cost. The identity
    rollup(ticks->hour) == ticks->day is pytest-pinned.

    VWAP caveat: the notional re-accumulates as (vwap * volume) per
    fine bar - float products - so the rolled VWAP can differ from the
    tick-level VWAP in the last ulps (not the integer-cents path);
    bars with NULL vwap (zero volume) contribute nothing."""
    coarse = _bar("bar_ts", width)
    return (
        bars.withColumn("_cb", coarse)
        .groupBy(key, "_cb")
        .agg(
            F.min_by("open", F.col("bar_ts")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("bar_ts")).alias("close"),
            F.sum("n_trades").cast("bigint").alias("n_trades"),
            F.sum("volume").cast("bigint").alias("volume"),
            (
                F.sum(F.col("vwap") * F.col("volume"))
                / F.nullif(
                    F.sum(F.when(F.col("vwap").isNotNull(), F.col("volume"))),
                    F.lit(0),
                )
            ).alias("vwap"),
        )
        .withColumnRenamed("_cb", "bar_ts")
    )


def find_gaps(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    step: str = "hour",
) -> DataFrame:
    """Missing-interval report: for each key, the runs of ``step``
    buckets between the key's first and last observation that contain
    NO rows. Output: key_cols + (gap_start, gap_end, n_missing) - one
    row per contiguous gap, both endpoints missing buckets inclusive.

    Plan: distinct (key, bucket) -> lag over each key's bucket order ->
    emit where consecutive buckets differ by more than one step. One
    shuffle + one window pass, both on the DISTINCT bucket set (bounded
    by keys x time range, not by row count); no calendar grid is ever
    materialized, so sparse series with year-long gaps cost one output
    row, not a year of join rows."""
    sec = {"hour": 3600, "day": 86400, "minute": 60}[step]
    b = df.select(
        *key_cols, _bar(ts_col, step).alias("_b")
    ).distinct()
    w = W.partitionBy(*key_cols).orderBy("_b")
    prev = F.lag("_b").over(w)
    # NTZ timestamps don't cast to long; subtracting them yields a
    # day-time interval whose long cast is whole seconds
    missing = (
        (F.col("_b") - prev).cast("long") / sec - 1
    ).cast("long")
    return (
        b.withColumn("_prev", prev)
        .withColumn("n_missing", missing)
        .filter(F.col("n_missing") > 0)
        .select(
            *key_cols,
            (F.col("_prev") + F.expr(f"INTERVAL {sec} SECONDS")).alias(
                "gap_start"
            ),
            (F.col("_b") - F.expr(f"INTERVAL {sec} SECONDS")).alias(
                "gap_end"
            ),
            "n_missing",
        )
    )


def returns_panel(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    zscore_rows: int = 24,
    scale: int = 100,
    tie_break: str | None = None,
) -> DataFrame:
    """Cross-engine-exact twin of ``indicator_panel``: simple return,
    drawdown from the running max, and a rolling ``zscore_rows``-row
    z-score, all from ONE shared window spec (one shuffle + one sort).

    Exactness recipe (what makes this oracle-certifiable where float
    window aggregates are not): the value is fixed-pointed to
    ``scale``-ths (integer cents), so every windowed SUM is a bigint -
    exact under ANY accumulation order or segment-tree association.
    The z-score is then a closed-form scalar over those integers,

        z = (n*v - s) / sqrt((n*sxx - s^2) * n / (n - 1))

    evaluated with the same fixed IEEE op sequence on any engine:
    identical exact inputs + correctly-rounded *,/,sqrt = bit-identical
    doubles. Return and drawdown are single divisions of pass-through
    values (v/prev, v/runmax) - exact by the same argument. Nothing
    here needs a rounding tolerance.

    Scale: identical to indicator_panel - one Window operator, state
    bounded by zscore_rows + two running cells; per-series row count
    is the only skew floor.
    """
    order = [F.col(ts)] + ([F.col(tie_break)] if tie_break else [])
    w = W.partitionBy(key).orderBy(*order)
    wz = w.rowsBetween(-(zscore_rows - 1), 0)
    wmax = w.rowsBetween(W.unboundedPreceding, 0)
    v = F.col(value)
    vc = F.round(v * scale).cast("bigint")
    n = F.count(F.lit(1)).over(wz)
    s = F.sum(vc).over(wz)
    sxx = F.sum(vc * vc).over(wz)
    prev = F.lag(v).over(w)
    runmax = F.max(v).over(wmax)
    num = (n * vc - s).cast("double")
    b = (n * sxx - s * s).cast("double")
    nd = n.cast("double")
    return df.select(
        key,
        ts,
        *([tie_break] if tie_break else []),
        value,
        F.when(prev != 0, v / prev - 1).alias("ret"),
        F.when(runmax != 0, v / runmax - 1).alias("drawdown"),
        F.when((n > 1) & (b > 0), num / F.sqrt(b * nd / (nd - 1))).alias(
            "zscore"
        ),
    )


def rolling_corr(
    df: DataFrame,
    ts: str,
    x: str,
    y: str,
    window_rows: int = 24,
    scale: int = 100,
    key: str | None = None,
) -> DataFrame:
    """Rolling Pearson correlation between two pre-aligned series
    columns over the trailing ``window_rows`` rows, exact across
    engines by the same fixed-point recipe as ``returns_panel``:
    every moment (n, sx, sy, sxy, sxx, syy) is a bigint window SUM of
    ``scale``-fixed values, and

        corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))

    is a fixed IEEE op sequence over those exact integers. One window
    spec -> one Window operator; NULL where either variance window is
    degenerate (n<2 or constant).
    """
    # key=None = one deliberately-global series over bar-grid-bounded
    # input; the single-partition WindowExec warning this logs is the
    # expected cost of a global rolling spec, not an accident
    base = W.partitionBy(key) if key else W.partitionBy()
    w = base.orderBy(ts).rowsBetween(-(window_rows - 1), 0)
    xc = F.round(F.col(x) * scale).cast("bigint")
    yc = F.round(F.col(y) * scale).cast("bigint")
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(xc).over(w)
    sy = F.sum(yc).over(w)
    sxy = F.sum(xc * yc).over(w)
    sxx = F.sum(xc * xc).over(w)
    syy = F.sum(yc * yc).over(w)
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    return df.select(
        *([key] if key else []),
        ts,
        x,
        y,
        F.when(
            (n > 1) & (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy))
        ).alias("corr"),
        n.alias("n_obs"),
    )


def twap(
    df: DataFrame,
    keys: list[str],
    ts_us_col: str,
    cents_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average price per group over the observed span -
    the execution-quality benchmark VWAP's sibling: each observation's
    value holds until the NEXT observation (piecewise-constant,
    left-closed), weighted by how long it held. The last observation
    of a group carries zero duration (the span ends at the last
    tick); a single-tick group has no span and reports NULL.

    Exactness: inputs are epoch-micros bigints and fix-pointed cents
    (callers convert - same discipline as ohlc_bars' int-cents VWAP),
    so duration*price accumulates as exact bigints and TWAP is ONE
    IEEE division. Equal timestamps get a total order from
    ``tiebreak_col``: the earlier-id tick holds for zero micros, so
    the tie contributes nothing regardless of engine - but the ORDER
    must still be pinned or lead() itself is nondeterministic.

    Scale shape: one shuffle on the group key, one lead() window pass
    (streaming frame), one partial-combined aggregate. Group by a
    bounded slice (symbol x day), not a global key - the window sorts
    per group.

    Returns keys + (n_ticks, span_us, twap_cents: double).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(ts_us_col, tiebreak_col)
    nxt = F.lead(ts_us_col).over(w)
    seg = df.select(
        *keys,
        F.col(cents_col).alias("_c"),
        (nxt - F.col(ts_us_col)).alias("_dur"),
    )
    g = seg.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("_dur").alias("span_us"),
        F.sum(F.col("_dur") * F.col("_c")).alias("_wsum"),
    )
    return g.select(
        *keys,
        "n_ticks",
        F.coalesce(F.col("span_us"), F.lit(0)).alias("span_us"),
        F.when(
            F.col("span_us") > 0,
            F.col("_wsum").cast("double") / F.col("span_us").cast("double"),
        ).alias("twap_cents"),
    )


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str,
    cents: str,
    width: str = "hour",
    tie_break: str | None = None,
) -> DataFrame:
    """Resample to a regular ``width`` grid per key with LINEAR
    interpolation across interior gaps - the smooth sibling of
    ``resample_ffill`` for measures where holding the last value
    misstates the path (prices between sparse ticks, sensor readings).

    ``cents`` is a fix-pointed integer measure (ohlc_bars discipline):
    an interior empty cell gets prev + (next - prev) * (dt / span)
    where prev/next are the neighboring observed cells' int values and
    dt/span are exact epoch-micros deltas - ONE fixed IEEE expression
    over exact integers, so a warehouse oracle replays every bit.
    Leading cells (before the key's first observation) stay NULL;
    trailing cells hold the last value (forward-fill - there is
    nothing to interpolate toward). ``kind`` says which:
    'obs' | 'interp' | 'ffill' | NULL.

    Scale shape: same as resample_ffill - one map-side-combinable
    per-bar last, a dimension-sized grid join, and two per-key
    RUNNING window passes over the calendar-bounded grid (ASC for
    the previous neighbor, DESC for the next - see the inline note
    on why a forward-looking UnboundedFollowing frame is banned).

    Returns (key, bar_ts, value_cents: double, kind).
    """
    joined = _grid_with_last_obs(df, key, ts, cents, width, tie_break)

    t_us = F.unix_micros(F.col("bar_ts").cast("timestamp"))
    obs_t = F.when(F.col("_obs").isNotNull(), t_us)
    # BOTH neighbor frames are running (unboundedPreceding ->
    # currentRow) frames: the forward neighbor comes from a DESC
    # ordering, NOT from a (currentRow -> unboundedFollowing) frame -
    # Spark evaluates UnboundedFollowing frames by re-scanning the
    # tail for EVERY row (quadratic per partition: measured 24x wall
    # at 10x data on this exact operator), while running frames are
    # incremental. Two sorts of the dimension-sized grid instead.
    wb = (
        W.partitionBy(key)
        .orderBy("bar_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wd = (
        W.partitionBy(key)
        .orderBy(F.col("bar_ts").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # stage the four neighbor columns ONCE: referencing the window
    # expressions inline in the CASE would expand each reference into
    # its own window function (13 copies in the physical plan)
    staged = joined.select(
        key,
        "bar_ts",
        "_obs",
        t_us.alias("_t"),
        F.last("_obs", ignorenulls=True).over(wb).alias("_pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("_pt"),
        F.last("_obs", ignorenulls=True).over(wd).alias("_nv"),
        F.last(obs_t, ignorenulls=True).over(wd).alias("_nt"),
    )
    pv, pt = F.col("_pv"), F.col("_pt")
    nv, nt = F.col("_nv"), F.col("_nt")
    interp = pv.cast("double") + (
        nv.cast("double") - pv.cast("double")
    ) * (
        (F.col("_t") - pt).cast("double") / (nt - pt).cast("double")
    )
    return staged.select(
        key,
        "bar_ts",
        F.when(F.col("_obs").isNotNull(), F.col("_obs").cast("double"))
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .when(pv.isNotNull(), pv.cast("double"))
        .alias("value_cents"),
        F.when(F.col("_obs").isNotNull(), F.lit("obs"))
        .when(pv.isNotNull() & nv.isNotNull(), F.lit("interp"))
        .when(pv.isNotNull(), F.lit("ffill"))
        .alias("kind"),
    )
