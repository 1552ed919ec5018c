"""HLL sketch rollups: estimate accuracy vs exact distinct counts,
merge associativity, and lake (parquet) round-trip of the binary
sketch column."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.operators import sketches as SK


def _events(spark, n=20000, n_users=3000, days=14, seed=3):
    rng = random.Random(seed)
    rows = [
        (
            dt.date(2024, 5, 1) + dt.timedelta(days=rng.randrange(days)),
            f"s{rng.randrange(3)}",
            rng.randrange(n_users),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, ["day", "source", "user_id"]), rows


def test_range_estimates_within_hll_error(spark) -> None:
    df, rows = _events(spark)
    daily = SK.build_distinct_sketches(df, "user_id", ["day"]).cache()

    for lo, hi in ((0, 14), (0, 7), (3, 10), (13, 14)):
        d0 = dt.date(2024, 5, 1) + dt.timedelta(days=lo)
        d1 = dt.date(2024, 5, 1) + dt.timedelta(days=hi)
        est = SK.estimate_distinct(
            daily.filter((F.col("day") >= d0) & (F.col("day") < d1))
        ).collect()[0].n_distinct_est
        exact = len({u for d, s, u in rows if d0 <= d < d1})
        # lg_k=14 -> rse ~0.8%; 4 sigma of slack
        assert abs(est - exact) <= max(4, 0.033 * exact), (lo, hi, est, exact)


def test_regrouping_without_rescan(spark) -> None:
    df, rows = _events(spark)
    per_day_source = SK.build_distinct_sketches(
        df, "user_id", ["day", "source"]
    )
    # regroup the finer sketches per source - no fact-table access
    per_source = {
        r.source: r.n_distinct_est
        for r in SK.estimate_distinct(per_day_source, ["source"]).collect()
    }
    for s in ("s0", "s1", "s2"):
        exact = len({u for d, src, u in rows if src == s})
        assert abs(per_source[s] - exact) <= max(4, 0.033 * exact)


def test_union_is_associative(spark) -> None:
    """Merging day sketches in any grouping yields identical registers,
    hence identical estimates - the property that makes hierarchical
    rollups (daily -> weekly -> total) safe."""
    df, _ = _events(spark)
    daily = SK.build_distinct_sketches(df, "user_id", ["day"]).cache()

    flat = SK.estimate_distinct(daily).collect()[0].n_distinct_est
    weekly = daily.withColumn(
        "week", F.weekofyear(F.col("day").cast("timestamp"))
    ).groupBy("week").agg(F.hll_union_agg("sketch").alias("sketch"))
    rolled = SK.estimate_distinct(weekly).collect()[0].n_distinct_est
    assert flat == rolled


def test_sketch_survives_parquet_roundtrip(spark, tmp_path) -> None:
    df, rows = _events(spark, n=3000, n_users=500)
    daily = SK.build_distinct_sketches(df, "user_id", ["day"])
    path = str(tmp_path / "sketches")
    daily.write.parquet(path)
    reread = spark.read.parquet(path)
    est = SK.estimate_distinct(reread).collect()[0].n_distinct_est
    exact = len({u for d, s, u in rows})
    assert abs(est - exact) <= max(4, 0.033 * exact)


def test_theta_retention_and_set_ops(spark) -> None:
    """Theta set algebra vs exact: per-day distincts, consecutive-day
    retained/churned users from the sketch table alone."""
    df, rows = _events(spark, n=12000, n_users=800, days=6)
    daily = SK.build_theta_sketches(df, "user_id", ["day"]).cache()

    got = {r.day: r for r in SK.retention(daily, "day").collect()}
    by_day = {}
    for d, s, u in rows:
        by_day.setdefault(d, set()).add(u)
    days = sorted(by_day)
    for i, d in enumerate(days):
        r = got[d]
        assert abs(r.n_distinct_est - len(by_day[d])) <= max(
            4, 0.04 * len(by_day[d])
        )
        if i == 0:
            assert r.retained_est is None and r.churned_est is None
        else:
            prev = by_day[days[i - 1]]
            retained = len(prev & by_day[d])
            churned = len(prev - by_day[d])
            assert abs(r.retained_est - retained) <= max(6, 0.06 * retained)
            assert abs(r.churned_est - churned) <= max(6, 0.06 * churned)


def test_theta_union_estimate_vs_exact(spark) -> None:
    df, rows = _events(spark, n=8000, n_users=1200, days=8)
    daily = SK.build_theta_sketches(df, "user_id", ["day"])
    est = SK.theta_estimate(daily).collect()[0].n_distinct_est
    exact = len({u for _, _, u in rows})
    assert abs(est - exact) <= max(4, 0.04 * exact)


def test_mergeable_topk_matches_exact_counts(spark) -> None:
    """approx_top_k accumulate/combine across buckets: with fewer
    distinct items than max_items_tracked the merged counts are EXACT,
    and the global top-k equals the true top-k."""
    import collections

    df, rows = _events(spark, n=10000, n_users=50, days=10)
    per_day = SK.build_topk_sketches(
        df.selectExpr("day", "cast(user_id as string) item"),
        "item",
        ["day"],
        max_items_tracked=200,
    )
    got = {
        r.item: r["count"] for r in SK.estimate_topk(per_day, k=10).collect()
    }
    true_counts = collections.Counter(str(u) for _, _, u in rows)
    want = dict(true_counts.most_common(10))
    # counts for the reported items must be exact
    for item, n in got.items():
        assert true_counts[item] == n
    # the k-th count boundary may tie; compare count multisets
    assert sorted(got.values(), reverse=True) == sorted(
        want.values(), reverse=True
    )


def test_streaming_window_sketches_merge_to_batch_distincts(spark, tmp_path) -> None:
    """Sketch rollups compose with streaming: per-window HLL sketches
    built by tumbling_agg on a real stream, then merged BATCH-side for
    an any-range distinct - the streaming ingest half of the
    sketch-table pattern. Small cardinalities -> estimates exact."""
    import json as _json

    from etl_marketdata_downloader_archived_spark.streaming import tumbling_agg

    rows = [
        {"ts": f"2024-06-01 09:{m:02d}:00", "user_id": u}
        for m, u in [(1, 1), (2, 2), (3, 1), (11, 2), (12, 3), (21, 4), (22, 1)]
    ]
    src = tmp_path / "ev"
    src.mkdir()
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = (
        spark.readStream.format("text")
        .load(str(src))
        .select(F.from_json("value", "ts TIMESTAMP, user_id LONG").alias("j"))
        .select("j.*")
    )
    sketched = tumbling_agg(
        stream, "ts", "10 minutes",
        F.hll_sketch_agg("user_id").alias("sketch"),
        watermark="1 hour",
    )
    q = (
        sketched.writeStream.format("memory")
        .queryName("sketch_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    windows = spark.sql("select w.start AS ws, sketch from sketch_windows")
    assert windows.count() == 3  # 09:00, 09:10, 09:20 buckets
    merged = SK.estimate_distinct(windows).collect()[0].n_distinct_est
    assert merged == 4  # users 1,2,3,4 across all windows
    first_two = SK.estimate_distinct(
        windows.filter(F.col("ws") < "2024-06-01 09:20:00")
    ).collect()[0].n_distinct_est
    assert first_two == 3  # users 1,2,3 before 09:20


# ---------------------------------------------------- quantile sketches


def _valued(spark, n=6000, days=6, seed=11):
    rng = random.Random(seed)
    rows = [
        (
            dt.date(2024, 5, 1) + dt.timedelta(days=rng.randrange(days)),
            f"s{rng.randrange(2)}",
            i,  # unique row id: the sampling coordinate
            rng.lognormvariate(3.0, 0.8),  # skewed, like latencies/prices
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["day", "source", "rid", "val"]), rows


def test_quantile_sketch_merge_is_exact(spark) -> None:
    """Coordinated bottom-k: merging per-bucket sketches yields the
    BIT-IDENTICAL sketch a direct build over the unioned data gives -
    merge carries zero additional error."""
    df, _ = _valued(spark)
    per_day = SK.build_quantile_sketches(
        df, "val", id_cols=["rid"], bucket_cols=["day", "source"], k=256
    )
    merged = {
        r.source: r.qsketch
        for r in SK.merge_quantile_sketches(
            per_day, group_cols=["source"], k=256
        ).collect()
    }
    direct = {
        r.source: r.qsketch
        for r in SK.build_quantile_sketches(
            df, "val", id_cols=["rid"], bucket_cols=["source"], k=256
        ).collect()
    }
    assert merged == direct


def test_quantile_estimates_within_rank_error(spark) -> None:
    """Nearest-rank estimates from the k-sample land within ~2/sqrt(k)
    of the requested rank on the exact distribution."""
    df, rows = _valued(spark)
    per_day = SK.build_quantile_sketches(
        df, "val", id_cols=["rid"], bucket_cols=["day"], k=512
    )
    est = SK.estimate_quantiles(per_day, probs=[0.5, 0.9], k=512).collect()[0]
    exact = sorted(v for *_, v in rows)
    n = len(exact)
    for p, got in ((0.5, est.q_0_5), (0.9, est.q_0_9)):
        # rank of the estimate in the exact sorted data, as a fraction
        import bisect

        rank = bisect.bisect_right(exact, got) / n
        assert abs(rank - p) < 2 / (512**0.5), (p, got, rank)


def test_quantile_sketch_regroup_and_roundtrip(spark, tmp_path) -> None:
    """Per-(day,source) sketches persisted to parquet answer per-source
    quantiles after a round-trip, without touching the raw data."""
    df, rows = _valued(spark)
    path = str(tmp_path / "qsk")
    SK.build_quantile_sketches(
        df, "val", id_cols=["rid"], bucket_cols=["day", "source"], k=512
    ).write.parquet(path)
    got = {
        r.source: r.q_0_5
        for r in SK.estimate_quantiles(
            spark.read.parquet(path), probs=[0.5], group_cols=["source"], k=512
        ).collect()
    }
    import bisect

    for src in ("s0", "s1"):
        exact = sorted(v for _, s, _, v in rows if s == src)
        rank = bisect.bisect_right(exact, got[src]) / len(exact)
        assert abs(rank - 0.5) < 2 / (512**0.5), (src, rank)


def test_quantile_sketch_merge_invariant_under_random_bucketing(spark) -> None:
    """For any random partition of the rows into buckets, merging the
    per-bucket sketches gives the identical global sketch - the
    coordinated-sampling guarantee that makes regrouping safe."""
    rng = random.Random(23)
    base = [(i, rng.lognormvariate(2.0, 1.1)) for i in range(3000)]
    reference = None
    for trial in range(3):
        rows = [(f"b{rng.randrange(2 + trial * 3)}", rid, v) for rid, v in base]
        per_bucket = SK.build_quantile_sketches(
            spark.createDataFrame(rows, ["bucket", "rid", "val"]),
            "val",
            id_cols=["rid"],
            bucket_cols=["bucket"],
            k=128,
        )
        merged = SK.merge_quantile_sketches(per_bucket, k=128).collect()[0].qsketch
        if reference is None:
            reference = merged
        assert merged == reference, f"trial {trial}"
