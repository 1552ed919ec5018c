"""Known-answer tests for the time-series bar/resample operators
(operators.timeseries); parity.py's ohlc_bars / resample_ffill cover
the driver-table scale and the DuckDB differential."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.operators import timeseries as TS


def _ts(minute: int, hour: int = 9) -> dt.datetime:
    return dt.datetime(2024, 3, 1, hour, minute, 0)


# (key, ts, event_id, price, qty) — one series "A" with two trades in
# the 09:00 bar (same timestamp -> tie_break decides open/close), one
# trade in 11:00 (10:00 empty -> resample gap), plus a one-trade "B".
TRADES = [
    ("A", _ts(5), 1, 10.00, 2),
    ("A", _ts(5), 2, 11.00, 3),
    ("A", _ts(0, hour=11), 3, 9.50, 4),
    ("B", _ts(30), 4, 100.25, 1),
]


def _trades(spark):
    return spark.createDataFrame(
        TRADES, ["sym", "ts", "event_id", "price", "qty"]
    )


def test_ohlc_known_answer(spark) -> None:
    bars = TS.ohlc_bars(
        _trades(spark), "sym", "ts", "price", "qty",
        width="hour", tie_break="event_id", price_scale=100,
    )
    got = {(r.sym, r.bar_ts.hour): r for r in bars.collect()}
    assert set(got) == {("A", 9), ("A", 11), ("B", 9)}

    a9 = got[("A", 9)]
    # equal timestamps: event_id tie-break makes id=1 the open, id=2 the close
    assert (a9.open, a9.high, a9.low, a9.close) == (10.00, 11.00, 10.00, 11.00)
    assert (a9.n_trades, a9.volume) == (2, 5)
    # vwap = (1000*2 + 1100*3)/100/5 = 10.6, exact in integer cents
    assert a9.vwap == 10.6

    a11 = got[("A", 11)]
    assert (a11.open, a11.close, a11.n_trades, a11.volume) == (9.5, 9.5, 1, 4)
    assert got[("B", 9)].vwap == 100.25


def test_ohlc_zero_qty_bar_has_null_vwap(spark) -> None:
    df = spark.createDataFrame(
        [("A", _ts(1), 1, 5.0, 0), ("A", _ts(2), 2, 7.0, 0)],
        ["sym", "ts", "event_id", "price", "qty"],
    )
    row = TS.ohlc_bars(
        df, "sym", "ts", "price", "qty", tie_break="event_id", price_scale=100
    ).collect()[0]
    assert row.volume == 0 and row.vwap is None
    assert (row.open, row.close) == (5.0, 7.0)


def test_resample_ffill_gaps_and_leading_nulls(spark) -> None:
    out = TS.resample_ffill(
        _trades(spark), "sym", "ts", "price", width="hour", tie_break="event_id"
    )
    rows = {(r.sym, r.bar_ts.hour): r for r in out.collect()}
    # grid spans the GLOBAL 09:00..11:00 range for both keys
    assert len(rows) == 6

    # A: 09 observed (last-in-bar = event 2 -> 11.0), 10 gap inherits, 11 observed
    assert (rows[("A", 9)].price, rows[("A", 9)].is_gap) == (11.0, 0)
    assert (rows[("A", 10)].price, rows[("A", 10)].is_gap) == (11.0, 1)
    assert (rows[("A", 11)].price, rows[("A", 11)].is_gap) == (9.5, 0)

    # B: observed at 09, forward-filled through 10 and 11
    assert (rows[("B", 9)].price, rows[("B", 9)].is_gap) == (100.25, 0)
    assert (rows[("B", 10)].price, rows[("B", 10)].is_gap) == (100.25, 1)
    assert (rows[("B", 11)].price, rows[("B", 11)].is_gap) == (100.25, 1)


def test_streaming_ohlc_matches_batch(spark, tmp_path) -> None:
    """The streaming twin emits the same bars as the batch operator -
    driven through a real readStream + memory sink (unified semantics
    make the aggregate terms identical; this pins the window-start ==
    date_trunc bucket alignment and the watermark plumbing)."""
    import json as _json

    src = tmp_path / "trades_src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(
                {
                    "sym": s,
                    "ts": t.strftime("%Y-%m-%d %H:%M:%S"),
                    "event_id": e,
                    "price": p,
                    "qty": q,
                }
            )
            for s, t, e, p, q in TRADES
        )
    )
    schema = "sym STRING, ts TIMESTAMP, event_id LONG, price DOUBLE, qty LONG"
    stream = (
        spark.readStream.format("text")
        .load(str(src))
        .select(F.from_json("value", schema).alias("j"))
        .select("j.*")
    )
    bars = TS.streaming_ohlc_bars(
        stream, "sym", "ts", "price", "qty",
        window="1 hour", watermark="1 hour",
        tie_break="event_id", price_scale=100,
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("ohlc_stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.sym, r.bar_ts, r.open, r.high, r.low, r.close,
         r.n_trades, r.volume, r.vwap)
        for r in spark.sql("select * from ohlc_stream_out").collect()
    }
    batch = {
        (r.sym, r.bar_ts, r.open, r.high, r.low, r.close,
         r.n_trades, r.volume, r.vwap)
        for r in TS.ohlc_bars(
            _trades(spark), "sym", "ts", "price", "qty",
            width="hour", tie_break="event_id", price_scale=100,
        ).collect()
    }
    assert streamed == batch


def test_time_grid_is_dense_and_dimension_sized(spark) -> None:
    grid = TS.time_grid(_trades(spark), "sym", "ts", width="hour")
    assert grid.count() == 2 * 3  # 2 keys x (09,10,11)
    # single-stage dims: no scan of the fact table beyond min/max agg
    hours = sorted(
        r.bar_ts.hour for r in grid.filter(F.col("sym") == "A").collect()
    )
    assert hours == [9, 10, 11]
