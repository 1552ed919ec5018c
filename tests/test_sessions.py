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


def _py_sessionize(rows, gap_s):
    """Reference: rows = [(user, event_id, ts)] -> {event_id: seq}."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, e, t in rows:
        by_user[u].append((t, e))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for t, e in evs:
            if prev is None or (t - prev).total_seconds() > gap_s:
                seq += 1
            out[e] = seq
            prev = t
    return out


def test_sessionize_randomized_differential(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.randint(1, 6), i,
         datetime(2026, 1, 1) .replace(hour=0)
         + __import__("datetime").timedelta(minutes=rng.randint(0, 4000)))
        for i in range(300)
    ]
    # unique (user, ts) so the reference's (ts, event_id) sort matches
    seen, uniq = set(), []
    for u, e, t in rows:
        if (u, t) not in seen:
            seen.add((u, t))
            uniq.append((u, e, t))
    df = spark.createDataFrame(
        uniq, "user_id long, event_id long, ts timestamp_ntz"
    )
    from etl_marketdata_downloader_archived_spark.operators.sessions import (
        sessionize,
    )

    got = {r.event_id: r.session_seq for r in
           sessionize(df, "user_id", "ts", gap="30 minutes",
                      tiebreak_col="event_id").collect()}
    assert got == _py_sessionize(uniq, 1800)


def test_max_concurrency_randomized_differential(spark):
    import random
    from collections import defaultdict
    from datetime import timedelta

    from etl_marketdata_downloader_archived_spark.operators.sessions import (
        max_concurrency,
    )

    rng = random.Random(23)
    iv = []
    for _ in range(200):
        s = datetime(2026, 3, 1) + timedelta(minutes=rng.randint(0, 7000))
        iv.append((s, s + timedelta(minutes=rng.randint(0, 3000))))
    df = spark.createDataFrame(iv, "s timestamp_ntz, e timestamp_ntz")
    got = {str(r.bucket): r.max_concurrent
           for r in max_concurrency(df, "s", "e").collect()}
    # reference sweep: closed intervals, +1 before -1 at equal t
    events = [(s, 0) for s, _ in iv] + [(e, 1) for _, e in iv]
    events.sort()  # (t, 0=start first)
    run, peak = 0, defaultdict(lambda: -10**9)
    for t, kind in events:
        run += 1 if kind == 0 else -1
        d = str(t.date())
        # the operator's running sum includes the current row's delta
        peak[d] = max(peak[d], run)
    # only buckets holding endpoints appear in the operator's output
    assert got == {d: peak[d] for d in got}
    assert set(got) == set(peak)
