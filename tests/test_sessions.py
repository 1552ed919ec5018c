"""operators.sessions: gap sessionization + path n-grams.

Cross-engine equivalence is parity-certified (tools/parity.py
sessionize_stats / path_topk); here: hand-checkable semantics.
"""

from __future__ import annotations

from datetime import datetime

from etl_marketdata_downloader_archived_spark.operators.sessions import (
    path_ngrams,
    sessionize,
)


def _ts(minute: int) -> datetime:
    return datetime(2026, 1, 1, 10, minute)


def test_sessionize_gap_rule(spark):
    rows = [
        (1, 1, _ts(0)),   # session 1
        (1, 2, _ts(10)),  # still session 1 (10 min gap)
        (1, 3, _ts(50)),  # 40 min gap -> session 2
        (1, 4, _ts(55)),  # session 2
        (2, 5, _ts(0)),   # other user -> own session 1
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz"
    )
    out = {r.event_id: r.session_seq for r in
           sessionize(df, "user_id", "ts", gap="30 minutes",
                      tiebreak_col="event_id").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_boundary_is_exclusive(spark):
    # gap EXACTLY 30 minutes does not start a new session (rule is >)
    rows = [(1, 1, _ts(0)), (1, 2, _ts(30))]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz"
    )
    out = {r.event_id: r.session_seq for r in
           sessionize(df, "user_id", "ts").collect()}
    assert out == {1: 1, 2: 1}


def test_path_ngrams_counts(spark):
    rows = [
        (1, 1, _ts(0), "a"), (1, 2, _ts(1), "b"), (1, 3, _ts(2), "c"),
        (1, 4, _ts(3), "a"),                      # user1: a>b>c, b>c>a
        (2, 5, _ts(0), "a"), (2, 6, _ts(1), "b"), (2, 7, _ts(2), "c"),
        (3, 8, _ts(0), "x"), (3, 9, _ts(1), "y"),  # too short: no trigram
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, et string"
    )
    out = {r.path: r.n_occurrences for r in
           path_ngrams(df, "user_id", "ts", "et", n=3,
                       tiebreak_col="event_id").collect()}
    assert out == {"a>b>c": 2, "b>c>a": 1}


def test_path_ngrams_order_by_time_not_insertion(spark):
    rows = [(1, 2, _ts(5), "late"), (1, 1, _ts(0), "early"),
            (1, 3, _ts(9), "end")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, et string"
    )
    out = [r.path for r in
           path_ngrams(df, "user_id", "ts", "et", n=3,
                       tiebreak_col="event_id").collect()]
    assert out == ["early>late>end"]


def test_max_concurrency_carry_and_zero_length(spark):
    from etl_marketdata_downloader_archived_spark.operators.sessions import (
        max_concurrency,
    )

    rows = [
        (_ts(0), _ts(50)),                              # 10:00-10:50
        (_ts(30), _ts(45)),                             # overlap -> 2
        (_ts(40), datetime(2026, 1, 2, 9, 0)),          # 3-way; spans midnight
        (datetime(2026, 1, 2, 8, 0), datetime(2026, 1, 2, 8, 0)),  # zero-len
    ]
    df = spark.createDataFrame(rows, "s timestamp_ntz, e timestamp_ntz")
    out = {str(r.bucket): r.max_concurrent
           for r in max_concurrency(df, "s", "e").collect()}
    # day1 peak = 3 (10:40-10:45); day2 = carried-over session + zero-len
    assert out == {"2026-01-01": 3, "2026-01-02": 2}
