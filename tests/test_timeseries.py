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


def test_ohlc_randomized_differential_vs_pandas(spark) -> None:
    """Seeded randomized differential: OHLCV bars vs an independent
    pure-pandas oracle on 400 random trades (duplicate timestamps,
    zero quantities, many series/bars). Exact equality - the
    price_scale path makes VWAP reproducible, open/close are
    pass-through values."""
    import random

    import pandas as pd

    rng = random.Random(20240813)
    trades = [
        (
            rng.choice(["A", "B", "C"]),
            dt.datetime(2024, 3, 1, rng.randrange(4), rng.randrange(60), rng.randrange(60)),
            i,
            round(rng.uniform(1, 500), 2),
            rng.randrange(0, 6),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(trades, ["sym", "ts", "event_id", "price", "qty"])
    got = {
        (r.sym, r.bar_ts): r
        for r in TS.ohlc_bars(
            df, "sym", "ts", "price", "qty",
            width="hour", tie_break="event_id", price_scale=100,
        ).collect()
    }

    pdf = pd.DataFrame(trades, columns=["sym", "ts", "event_id", "price", "qty"])
    pdf["bar_ts"] = pdf["ts"].dt.floor("h")
    pdf = pdf.sort_values(["ts", "event_id"])  # open/close ordering
    expected_groups = pdf.groupby(["sym", "bar_ts"])
    assert len(got) == expected_groups.ngroups
    for (sym, bar), g in expected_groups:
        r = got[(sym, bar)]
        assert r.open == g["price"].iloc[0] and r.close == g["price"].iloc[-1]
        assert r.high == g["price"].max() and r.low == g["price"].min()
        assert r.n_trades == len(g) and r.volume == int(g["qty"].sum())
        if g["qty"].sum() == 0:
            assert r.vwap is None
        else:
            cents = (g["price"] * 100).round().astype(int)
            expect_vwap = float(int((cents * g["qty"]).sum())) / 100 / float(
                int(g["qty"].sum())
            )
            assert r.vwap == expect_vwap


def test_resample_randomized_differential_vs_pandas(spark) -> None:
    """Seeded randomized differential for the grid + forward-fill:
    per-key hourly last-observation series must equal pandas
    resample('h').last().ffill() over the global hour range."""
    import random

    import pandas as pd

    rng = random.Random(77)
    trades = [
        (
            rng.choice(["A", "B"]),
            dt.datetime(2024, 3, 1, rng.randrange(12), rng.randrange(60), rng.randrange(60)),
            i,
            round(rng.uniform(1, 100), 2),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(trades, ["sym", "ts", "event_id", "price"])
    got = {
        (r.sym, r.bar_ts): (r.price, r.is_gap)
        for r in TS.resample_ffill(
            df, "sym", "ts", "price", width="hour", tie_break="event_id"
        ).collect()
    }

    pdf = pd.DataFrame(trades, columns=["sym", "ts", "event_id", "price"])
    pdf = pdf.sort_values(["ts", "event_id"])
    t0, t1 = pdf["ts"].min().floor("h"), pdf["ts"].max().floor("h")
    grid = pd.date_range(t0, t1, freq="h")
    for sym, g in pdf.groupby("sym"):
        last = g.set_index("ts")["price"].resample("h").last().reindex(grid)
        filled = last.ffill()
        for bar in grid:
            want = filled[bar]
            want = None if pd.isna(want) else float(want)
            price, is_gap = got[(sym, bar)]
            assert price == want
            assert is_gap == int(pd.isna(last[bar]))


def test_ohlc_plan_combines_before_shuffle(spark) -> None:
    """Scale-shape regression guard: the bar aggregation must run its
    partial (map-side combine) phase BEFORE the exchange, so only
    bar-count-bounded state crosses the wire - the property the min_by
    formulation was chosen for. A window-rank regression would drop
    the partial_min_by and shuffle every trade."""
    bars = TS.ohlc_bars(
        _trades(spark), "sym", "ts", "price", "qty",
        tie_break="event_id", price_scale=100,
    )
    plan = bars._jdf.queryExecution().executedPlan().toString()
    head = plan.split("Exchange", 1)[1]  # text below the first Exchange
    # Spark prints children under the exchange; the partial aggregate
    # must appear in the subtree feeding it
    assert "partial_min_by" in head and "partial_max_by" in head
    assert "Window" not in plan


def test_indicator_panel_vs_pandas(spark) -> None:
    """Randomized differential for the one-pass indicator panel:
    log return, rolling z-score, drawdown vs pandas shift/rolling/
    cummax on the same per-key ordered series."""
    import math
    import random

    import pandas as pd

    rng = random.Random(5)
    rows = [
        ("A" if i % 3 else "B", dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i), i,
         round(rng.uniform(10, 20), 2))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["sym", "ts", "event_id", "price"])
    out = TS.indicator_panel(
        df, "sym", "ts", "price", zscore_rows=5, tie_break="event_id"
    )
    got = {(r.sym, r.event_id): r for r in out.collect()}

    pdf = pd.DataFrame(rows, columns=["sym", "ts", "event_id", "price"])
    for sym, g in pdf.sort_values(["ts", "event_id"]).groupby("sym"):
        lr = (g["price"] / g["price"].shift()).apply(
            lambda x: math.log(x) if pd.notna(x) else None
        )
        mu = g["price"].rolling(5, min_periods=1).mean()
        sd = g["price"].rolling(5, min_periods=1).std()
        dd = g["price"] / g["price"].cummax() - 1
        for i, idx in enumerate(g.index):
            r = got[(sym, g.loc[idx, "event_id"])]
            want_lr = lr.loc[idx]
            if want_lr is None or pd.isna(want_lr):
                assert r.log_return is None
            else:
                assert abs(r.log_return - want_lr) < 1e-12
            want_z = (
                None
                if pd.isna(sd.loc[idx]) or sd.loc[idx] == 0
                else (g.loc[idx, "price"] - mu.loc[idx]) / sd.loc[idx]
            )
            if want_z is None:
                assert r.zscore is None
            else:
                assert abs(r.zscore - want_z) < 1e-9
            assert abs(r.drawdown - dd.loc[idx]) < 1e-12


def test_indicator_panel_is_single_window_pass(spark) -> None:
    """All three indicator frames share one window spec - the plan must
    contain exactly one Window operator (one shuffle + sort for the
    whole panel)."""
    out = TS.indicator_panel(
        _trades(spark), "sym", "ts", "price", tie_break="event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1


def test_ewma_matches_recursion(spark) -> None:
    """EWMA (adjust=False) equals the hand-rolled recursion
    y_i = a*x_i + (1-a)*y_{i-1} per key in timestamp order, including
    rows arriving unsorted."""
    rows = [
        ("A", _ts(3), 2, 12.0),
        ("A", _ts(1), 1, 10.0),
        ("A", _ts(7), 3, 11.0),
        ("B", _ts(2), 4, 100.0),
        ("B", _ts(9), 5, 102.0),
    ]
    df = spark.createDataFrame(rows, ["sym", "ts", "event_id", "price"])
    out = TS.ewma(df, "sym", "ts", "price", alpha=0.5, tie_break="event_id")
    got = {r.event_id: r.ewma for r in out.collect()}

    def rec(xs, a=0.5):
        y = [xs[0]]
        for x in xs[1:]:
            y.append(a * x + (1 - a) * y[-1])
        return y

    for key, ids, xs in (("A", [1, 2, 3], [10.0, 12.0, 11.0]),
                         ("B", [4, 5], [100.0, 102.0])):
        for i, want in zip(ids, rec(xs)):
            assert abs(got[i] - want) < 1e-12


def test_time_grid_is_dense_and_dimension_sized(spark) -> None:
    grid = TS.time_grid(_trades(spark), "sym", "ts", width="hour")
    assert grid.count() == 2 * 3  # 2 keys x (09,10,11)
    # single-stage dims: no scan of the fact table beyond min/max agg
    hours = sorted(
        r.bar_ts.hour for r in grid.filter(F.col("sym") == "A").collect()
    )
    assert hours == [9, 10, 11]


def test_feature_pipeline_end_to_end(spark, sf_dir) -> None:
    """events -> bars -> indicators -> forward label -> split, on the
    driver tables: label equals the manually-computed lead return,
    leaks nothing at series ends, split is exhaustive and stable."""
    import math

    from etl_marketdata_downloader_archived_spark.plans.feature_pipeline import (
        build_feature_table,
    )

    # window discipline FIRST, before .cache() makes every later build
    # resolve to an InMemoryRelation (whose stored string embeds the
    # executed AQE plan with duplicated initial/final sections): the
    # indicator panel collapses to one Window op, the label lead adds
    # one more.
    fresh = build_feature_table(spark, sf_dir)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    n_windows = sum(
        1 for line in plan.splitlines() if line.lstrip("+- ").startswith("Window ")
    )
    assert n_windows <= 2, plan

    out = build_feature_table(spark, sf_dir).cache()
    rows = out.collect()
    assert len(rows) > 0

    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    for series in by_series.values():
        series.sort(key=lambda r: r.bar_ts)
        for i, r in enumerate(series):
            if i + 1 < len(series):
                want = math.log(series[i + 1].close / r.close)
                assert abs(r.fwd_return - want) < 1e-12
            else:
                assert r.fwd_return is None  # no label leak at the end

    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.split is not None for r in rows)

    # determinism: a second build chooses identical splits and labels
    again = {
        (r.event_type, r.bar_ts): (r.split, r.fwd_return)
        for r in build_feature_table(spark, sf_dir).collect()
    }
    assert all(
        again[(r.event_type, r.bar_ts)] == (r.split, r.fwd_return) for r in rows
    )

    out.unpersist()


def test_rollup_bars_equals_direct_daily_bars(spark) -> None:
    """Bar-hierarchy identity: hour bars rolled to days must equal day
    bars built straight from ticks on every OHLCV field (VWAP to float
    tolerance - the rollup re-accumulates notional from per-bar
    floats)."""
    import random

    rng = random.Random(31)
    trades = [
        (
            rng.choice(["A", "B"]),
            dt.datetime(2024, 3, 1 + rng.randrange(3), rng.randrange(24), rng.randrange(60)),
            i,
            round(rng.uniform(5, 50), 2),
            rng.randrange(0, 5),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(trades, ["sym", "ts", "event_id", "price", "qty"])
    hourly = TS.ohlc_bars(
        df, "sym", "ts", "price", "qty",
        width="hour", tie_break="event_id", price_scale=100,
    )
    rolled = {
        (r.sym, r.bar_ts): r for r in TS.rollup_bars(hourly, "sym", "day").collect()
    }
    direct = {
        (r.sym, r.bar_ts): r
        for r in TS.ohlc_bars(
            df, "sym", "ts", "price", "qty",
            width="day", tie_break="event_id", price_scale=100,
        ).collect()
    }
    assert set(rolled) == set(direct)
    for k, d in direct.items():
        r = rolled[k]
        assert (r.open, r.high, r.low, r.close) == (d.open, d.high, d.low, d.close)
        assert (r.n_trades, r.volume) == (d.n_trades, d.volume)
        if d.vwap is None:
            assert r.vwap is None
        else:
            assert abs(r.vwap - d.vwap) < 1e-9


def test_find_gaps_known_answer(spark):
    from datetime import datetime

    from etl_marketdata_downloader_archived_spark.operators.timeseries import (
        find_gaps,
    )

    rows = [("a", datetime(2026, 1, 1, 10, 5)),
            ("a", datetime(2026, 1, 1, 10, 50)),   # same bucket: no gap
            ("a", datetime(2026, 1, 1, 13, 0)),    # 11:00+12:00 missing
            ("b", datetime(2026, 1, 1, 0, 0))]     # single point: no gap
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz")
    out = [(r.k, str(r.gap_start), str(r.gap_end), r.n_missing)
           for r in find_gaps(df, ["k"], "ts", "hour").collect()]
    assert out == [("a", "2026-01-01 11:00:00", "2026-01-01 12:00:00", 2)]


def test_twap_known_answer_and_brute(spark) -> None:
    """twap vs an independent python piecewise-constant integral,
    including same-instant ties (zero-duration holds) and
    single-tick groups (NULL twap, zero span)."""
    import random

    from etl_marketdata_downloader_archived_spark.operators.timeseries import (
        twap,
    )

    # known answer: 100c for 10us, 200c for 30us
    #   -> (100*10 + 200*30) / 40 = 175
    rows = [("k", 0, 100, 1), ("k", 10, 200, 2), ("k", 40, 999, 3)]
    # tie at t=10: id2 holds 0us, id3 holds 30us
    rows += [("t", 0, 100, 1), ("t", 10, 500, 2), ("t", 10, 200, 3),
             ("t", 40, 999, 4)]
    rows += [("single", 5, 123, 1)]
    rng = random.Random(17)
    for g in ("r1", "r2"):
        for i in range(rng.randint(2, 50)):
            rows.append((g, rng.randint(0, 100), rng.randint(1, 500), i))
    df = spark.createDataFrame(rows, "g string, us long, c long, id long")
    got = {
        r.g: (r.n_ticks, r.span_us, r.twap_cents)
        for r in twap(df, ["g"], "us", "c", "id").collect()
    }
    assert got["k"] == (3, 40, 175.0)
    assert got["t"] == (4, 40, (100 * 10 + 500 * 0 + 200 * 30) / 40)
    assert got["single"] == (1, 0, None)

    for g in ("r1", "r2"):
        ticks = sorted(
            [(us, i, c) for gg, us, c, i in rows if gg == g]
        )
        wsum = sum(
            (ticks[j + 1][0] - ticks[j][0]) * ticks[j][2]
            for j in range(len(ticks) - 1)
        )
        span = ticks[-1][0] - ticks[0][0]
        want = (len(ticks), span, wsum / span if span > 0 else None)
        assert got[g] == want


def test_resample_interpolate_vs_numpy(spark) -> None:
    """Linear interpolation vs numpy.interp on the observed cells,
    plus the edge semantics: leading NULL, trailing ffill, observed
    cells pass through untouched."""
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.timeseries import (
        resample_interpolate,
    )

    # key A observes hours 1, 4, 5 (of grid 0..6 set by key B)
    rows = [
        ("A", "2024-03-01 01:10:00", 1, 100),
        ("A", "2024-03-01 04:20:00", 2, 400),
        ("A", "2024-03-01 05:30:00", 3, 250),
        ("B", "2024-03-01 00:00:00", 4, 10),
        ("B", "2024-03-01 06:00:00", 5, 70),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, event_id long, c long"
    ).select(
        "k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "event_id", "c"
    )
    out = resample_interpolate(df, "k", "ts", "c", "hour", "event_id")
    got = {
        (r.k, r.bar_ts.hour): (r.value_cents, r.kind)
        for r in out.collect()
    }
    assert len(got) == 14  # 2 keys x 7 grid hours
    # leading cells NULL, observed pass through, trailing ffill
    assert got[("A", 0)] == (None, None)
    assert got[("A", 1)] == (100.0, "obs")
    assert got[("A", 4)] == (400.0, "obs")
    assert got[("A", 6)] == (250.0, "ffill")
    # interior gap hours 2,3 interpolate on the hour grid (bar
    # timestamps, not raw tick times): numpy.interp over bar hours
    xp, fp = [1, 4], [100.0, 400.0]
    for h in (2, 3):
        want = float(np.interp(h, xp, fp))
        assert got[("A", h)] == (want, "interp")
    # B: every interior hour interpolates the 10->70 line exactly
    for h in range(1, 6):
        want = float(np.interp(h, [0, 6], [10.0, 70.0]))
        assert got[("B", h)] == (want, "interp")
