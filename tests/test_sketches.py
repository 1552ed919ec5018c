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
