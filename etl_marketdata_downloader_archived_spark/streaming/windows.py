"""Windowed / stateful streaming transforms.

All four work identically on batch DataFrames (Spark's unified
semantics), which is how the oracle checks them; the streaming tests
drive them through a real ``readStream`` with ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: counts/aggregates per ``window(ts, width)``.

    With ``watermark`` set (streaming), state for windows older than
    the watermark is dropped and late rows are discarded - the bounded
    replacement for the reference's SQS visibility/redrive bookkeeping
    (SURVEY.md section 2B)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, width).alias("w")).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, width, slide).alias("w")).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    key_cols: list[str],
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into
    one session per key (user sessionization on the events stream)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("w"), *[F.col(c) for c in key_cols]
    ).agg(*aggs)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi+interval join: rows pair when their keys
    match AND ``right_ts`` falls in ``[left_ts - lower, left_ts +
    upper]``. Both sides carry the same watermark, which combined with
    the two-sided time bound lets Spark expire buffered state - the
    requirement for an unbounded stream-stream join to run with finite
    memory. Works identically on batch frames (unified semantics),
    which is how the differential oracle can check it.

    At scale: state per key is bounded by (watermark + interval) worth
    of rows on each side; the join hash-partitions both streams on the
    equi keys, so throughput scales with executors unless one key is
    hyper-hot (same salting remedy as any keyed join)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in key_cols:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else cond & eq
    band = F.col(f"r.{right_ts}").between(
        F.expr(f"l.{left_ts} - INTERVAL {lower}"),
        F.expr(f"l.{left_ts} + INTERVAL {upper}"),
    )
    cond = band if cond is None else cond & band
    return l.join(r, cond, how)


def watermarked_dedup(
    df: DataFrame, ts_col: str, key_cols: list[str], watermark: str
) -> DataFrame:
    """Cross-batch duplicate suppression with bounded state - the
    implemented version of the reference's four 'check repeat file'
    TODOs (data-downloader/data_downloader.py:106,131,169,194) for the
    streaming path: keys older than the watermark age out of state
    instead of accumulating forever."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def watermark_replay(
    df: DataFrame,
    ts_col: str,
    batch_col: str,
    delay_ms: int,
    width_ms: int,
) -> DataFrame:
    """Deterministic BATCH replay of an append-mode watermarked
    tumbling aggregation - the oracle-checkable twin of
    ``tumbling_agg(..., watermark=...)`` on a stream whose arrival
    order is recorded in ``batch_col`` (micro-batch index).

    Spark's semantics, pinned empirically (probe in
    tests/test_streaming.py::test_watermark_replay_matches_stream)
    and replayed here arithmetic-for-arithmetic:

    - the watermark in effect DURING batch b is the running max of
      per-batch max event time over batches STRICTLY BEFORE b, minus
      ``delay_ms`` (watermark updates at end-of-batch; first batch
      runs unwatermarked);
    - a row is late-dropped iff its tumbling window's END is <= that
      watermark (equality DROPS - the state for that window was
      already evicted);
    - a window reaches the append-mode output iff it has >= 1 kept
      row and its end is <= the FINAL watermark (max event time over
      the whole feed minus delay); later windows stay open in state.

    Returns the input rows plus ``w_start_ms`` / ``w_end_ms`` (epoch
    millis of the row's window), ``wm_ms`` (watermark in effect, null
    for the earliest batch), ``late_dropped`` and ``emitted`` flags.
    All arithmetic is bigint epoch-millis, so a SQL oracle replays it
    bit-for-bit.

    Scale shape: the watermark table is ONE ROW PER ARRIVAL BATCH
    (bounded by wall-clock trigger count, never event rows), so its
    running-max global window and the batch-keyed join back to the
    fact stay calendar-sized at any SF."""
    with_ms = df.withColumn(
        "_ts_ms", F.unix_millis(F.col(ts_col).cast("timestamp"))
    ).filter(F.col(ts_col).isNotNull())
    bm = with_ms.groupBy(batch_col).agg(F.max("_ts_ms").alias("_bmax"))
    run = Window.orderBy(batch_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = bm.select(
        batch_col,
        (F.max("_bmax").over(run) - F.lit(delay_ms)).alias("wm_ms"),
    )
    final_wm = bm.agg(
        (F.max("_bmax") - F.lit(delay_ms)).alias("_final_wm_ms")
    )
    flagged = (
        with_ms.join(wm, batch_col)  # wm is batch-count-sized; AQE decides
        .crossJoin(F.broadcast(final_wm))  # single-row global aggregate
        .withColumn(
            # FLOOR-aligned start (pmod is nonnegative), matching
            # F.window and SQL // - `div` truncates toward zero and
            # would misalign pre-epoch event times
            "w_start_ms",
            F.col("_ts_ms") - F.pmod(F.col("_ts_ms"), F.lit(width_ms)),
        )
        .withColumn("w_end_ms", F.col("w_start_ms") + F.lit(width_ms))
        .withColumn(
            "late_dropped",
            F.col("wm_ms").isNotNull()
            & (F.col("w_end_ms") <= F.col("wm_ms")),
        )
        .withColumn(
            "emitted",
            ~F.col("late_dropped")
            & (F.col("w_end_ms") <= F.col("_final_wm_ms")),
        )
    )
    return flagged.drop("_ts_ms", "_final_wm_ms")


def streaming_trailing_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    late_days: int = 1,
    window_days: int = 7,
) -> DataFrame:
    """Streaming twin of the rolling_active_users panel: trailing
    ``window_days``-day distinct keys per day over an unbounded
    stream - the composition of watermark-safe primitives rather
    than a custom stateful operator:

    1. each event's activity day explodes IN-ROW (stateless) to the
       ``window_days`` trailing window positions it covers (the same
       cover-day rewrite the batch query certifies against DuckDB -
       no sliding count-distinct state anywhere);
    2. ONE ``dropDuplicatesWithinWatermark`` collapses (key,
       cover_day) - same-day duplicates and overlapping covers from
       consecutive activity days land on the SAME row, and all
       duplicates of a pair carry the IDENTICAL cover timestamp, so
       the single dedup is overcount-safe: once a pair's state
       evicts, any late duplicate is itself below the watermark;
    3. a count per cover day emits the exact trailing distinct.

    The DECLARED watermark delay is ``late_days + window_days - 1``
    days ON THE COVER TIMESTAMP (see the late-data contract below
    for why the -1; the r11 two-dedup shape needed late+window on
    the raw event time for its second dedup's spread).

    State: FULLY watermark-bounded. The explode runs STATELESS on
    the raw stream and the watermark is declared on the cover
    position's own timestamp, so the dedup entries age out past the
    horizon AND the final per-day count state is an event-time
    window the watermark closes and EVICTS - the r11 shape grouped
    on a derived date column, which accumulated one state row per
    calendar day forever (ADVICE r11: unsuitable for the
    unbounded-uptime use the operator is named for). The trade:
    duplicate events explode ``window_days``-fold BEFORE the dedup
    collapses them (stateless row inflation, constant factor) -
    bought is bounded state at any uptime.

    Late-data contract: the watermark is declared on the COVER
    timestamp, which runs up to window_days - 1 days ahead of the
    event day, so the horizon is late_days + window_days - 1 days -
    an event arriving within ``late_days`` of the stream frontier is
    counted in FULL (every cover position still open); an event later
    than that may be PARTIALLY counted (its oldest cover positions
    are already finalized and stay dropped - revising a closed day
    is exactly what a watermark forbids) and beyond the horizon it
    drops entirely. The r11 shape dropped such an event atomically;
    partial counting is strictly closer to the batch answer.

    Update-mode counts revise upward as a window's days keep
    arriving; a day's count is FINAL once the watermark passes the
    end of its cover source. The stream==batch differential
    (tests/test_streaming.py) replays the same feed through the
    batch cover-day query."""
    horizon = f"{int(late_days) + int(window_days) - 1} days"
    cover = (
        df.select(F.col(key_col).alias("_k"), F.col(ts_col).alias("_ts"))
        .withColumn("_day", F.col("_ts").cast("date"))
        .select(
            "_k",
            F.explode(
                F.expr(
                    f"sequence(_day, date_add(_day,"
                    f" {int(window_days) - 1}), interval 1 day)"
                )
            ).alias("cover_day"),
        )
        .withColumn("_cover_ts", F.col("cover_day").cast("timestamp"))
        .withWatermark("_cover_ts", horizon)
    )
    # one dedup does both of r11's: same-day duplicates and
    # overlapping cover positions from consecutive activity days land
    # on the SAME (key, cover_day) row. Chained stateful ops (dedup
    # -> windowed agg) are safe because the aggregation windows on
    # the watermarked column itself, so every finalized day's state
    # row is evicted once the watermark passes its window end.
    deduped = cover.dropDuplicatesWithinWatermark(["_k", "cover_day"])
    # group by the event-time window AND the date column: the window
    # is what lets the watermark close and EVICT a finalized day's
    # state row, while cover_day itself is the emitted key - deriving
    # the date from _w.start would shift a day under any non-UTC
    # session timezone (F.window aligns to UTC-epoch midnights, the
    # cast to timestamp used the SESSION zone - review finding).
    # cover_day MUST stay in the group key: counts are correct
    # because the date column itself partitions them, NOT because a
    # window holds one date (a DST spring-forward puts two local
    # midnights 23 h apart inside one UTC-aligned window - dropping
    # cover_day from the key would merge those two days' counts).
    return (
        deduped.groupBy(
            F.window("_cover_ts", "1 day").alias("_w"), "cover_day"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_keys"))
        .select("cover_day", "active_keys")
    )
