"""Unit tests: as-of join edge cases, salted aggregation/join
equivalence, RP-LSH bucketing sanity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.operators import similarity as S
from etl_marketdata_downloader_archived_spark.operators.joins import asof_join
from etl_marketdata_downloader_archived_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def _t(h, m=0):
    return datetime(2024, 6, 1, h, m)


def test_asof_join_basic_and_edges(spark) -> None:
    left = spark.createDataFrame(
        [
            ("A", _t(10), 1),   # matches r1 (9:00)
            ("A", _t(12), 2),   # matches r2 (12:00) - inclusive
            ("A", _t(8), 3),    # before everything -> null
            ("B", _t(10), 4),   # key with no right rows -> null
        ],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("A", _t(9), 100), ("A", _t(12), 200)], ["k", "rts", "rv"]
    )
    out = asof_join(
        left, right, on="k", left_time="ts", right_time="rts", right_cols=["rts", "rv"]
    )
    got = {r.lid: (r.asof_rv, r.asof_rts) for r in out.collect()}
    assert got[1] == (100, _t(9))
    assert got[2] == (200, _t(12))  # at-or-before is inclusive
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert out.count() == 4  # every left row survives


def test_asof_join_tie_break(spark) -> None:
    left = spark.createDataFrame([("A", _t(10), 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame(
        [("A", _t(9), 5), ("A", _t(9), 9)], ["k", "rts", "rv"]
    )
    out = asof_join(
        left, right, on="k", left_time="ts", right_time="rts",
        right_cols=["rv"], tie_break="rv",
    )
    assert out.collect()[0].asof_rv == 9  # greatest tie-break wins


def test_salted_agg_matches_plain(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.n, float(r.s))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, float(r.s))
        for r in salted_agg(
            li,
            group_cols=["l_returnflag"],
            salt_buckets=8,
            salt_from=["l_orderkey", "l_linenumber"],
            partial_aggs=[F.count(F.lit(1)).alias("pn"), F.sum("l_quantity").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.io import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    plain = sorted(
        (r.c_custkey, r.n_name)
        for r in c.join(n, "c_nationkey").select("c_custkey", "n_name").collect()
    )
    salted = sorted(
        (r.c_custkey, r.n_name)
        for r in salted_join(
            c, n, on="c_nationkey", salt_buckets=4, salt_from=["c_custkey"]
        )
        .select("c_custkey", "n_name")
        .collect()
    )
    assert salted == plain


def test_rp_lsh_bucket_properties(spark) -> None:
    # identical vectors -> identical bucket; buckets within range
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [1.0, 2.0, 3.0]),
            (3, [-1.0, -2.0, -3.0]),  # antipodal -> complement bucket
        ],
        ["vec_id", "embedding"],
    )
    out = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", S.rp_lsh_bucket(F.col("embedding"), 6).alias("b")
        ).collect()
    }
    assert out[1] == out[2]
    assert 0 <= out[1] < 64
    assert out[3] == (~out[1]) & 0b111111  # every sign flips


def test_lsh_cosine_pairs_finds_identical(spark) -> None:
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.5]),
            (2, [1.0, 0.0, 0.5]),    # identical to 1
            (3, [2.0, 0.1, 1.0]),    # near 1
            (4, [-1.0, 5.0, -0.5]),  # far
        ],
        ["vec_id", "embedding"],
    )
    pairs = {(r.id_a, r.id_b) for r in S.lsh_cosine_pairs(df, 0.95, 6).collect()}
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs)
