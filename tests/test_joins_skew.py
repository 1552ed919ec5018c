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


def test_banded_interval_join_matches_naive(spark) -> None:
    """The banded (equi-keyed) interval join returns exactly the naive
    non-equi join's rows - including intervals spanning band
    boundaries - with no duplicates."""
    from etl_marketdata_downloader_archived_spark.operators.joins import (
        banded_interval_join,
    )

    points = spark.createDataFrame(
        [(i, datetime(2024, 6, 1 + i % 25, i % 24)) for i in range(60)], ["pid", "t"]
    )
    intervals = spark.createDataFrame(
        [
            (1, datetime(2024, 6, 2), datetime(2024, 6, 5)),
            (2, datetime(2024, 6, 4, 12), datetime(2024, 6, 12)),   # spans bands
            (3, datetime(2024, 6, 20), datetime(2024, 6, 20, 1)),   # narrow
            (4, datetime(2024, 7, 1), datetime(2024, 7, 2)),        # no points
        ],
        ["iid", "s", "e"],
    )
    banded = banded_interval_join(
        points, intervals, "t", "s", "e", band_seconds=3 * 86400
    )
    got = {(r.pid, r.iid) for r in banded.collect()}
    naive = points.join(
        intervals, (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
    )
    expected = {(r.pid, r.iid) for r in naive.collect()}
    assert got == expected and len(got) == len(banded.collect())


def test_kmeans_assign_separates_clusters(spark) -> None:
    """kmeans_assign (the IVF index build) puts well-separated vector
    groups in distinct clusters, deterministically under a fixed seed."""
    rows = [(i, [10.0 + (i % 5) / 10, 0.0]) for i in range(20)] + [
        (100 + i, [0.0, 10.0 + (i % 5) / 10]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.kmeans_assign(df, k=2, seed=7)
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id < 100)
    assert len(by_cluster) == 2
    assert all(len(sides) == 1 for sides in by_cluster.values())
    again = {r.vec_id: r.cluster for r in S.kmeans_assign(df, k=2, seed=7).collect()}
    first = {r.vec_id: r.cluster for r in out.collect()}
    assert again == first


def test_ivf_index_prunes_partitions_and_matches_brute_force(spark, tmp_path) -> None:
    """The materialized IVF index answers a probe from only the probed
    clusters' partitions (PartitionFilters in the scan) and agrees with
    brute force when the query's true neighbors share its cluster."""
    import random

    rng = random.Random(3)
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [v + rng.uniform(-0.5, 0.5) for v in c]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    S.ivf_build_index(df, idx, k=3, seed=7)

    q = [10.0, 0.2, -0.1]
    got = S.ivf_search_indexed(spark, idx, q, k=5, nprobe=1)
    brute = S.topk_cosine(df, q, k=5)
    assert [r.vec_id for r in got.collect()] == [r.vec_id for r in brute.collect()]

    # the probe scan must be partition-pruned to the probed cluster
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan


def test_asof_join_randomized_vs_pandas_merge_asof(spark) -> None:
    """Seeded randomized differential: the union+window as-of join must
    agree with pandas.merge_asof (direction='backward', inclusive) on
    every (key, time) draw - including duplicate left times, right-time
    ties (resolved to the greatest tie_break), and empty keys."""
    import random

    import pandas as pd

    rng = random.Random(11)
    left_rows = [
        (f"k{rng.randrange(5)}", datetime(2024, 6, 1 + rng.randrange(20), rng.randrange(24)), i)
        for i in range(120)
    ]
    right_rows = [
        (f"k{rng.randrange(6)}", datetime(2024, 6, 1 + rng.randrange(20), rng.randrange(24)), i)
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, ["k", "ts", "lid"])
    right = spark.createDataFrame(right_rows, ["k", "rts", "rid"])

    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_time="ts", right_time="rts",
            right_cols=["rid"], tie_break="rid",
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    # sort right by (rts, rid): merge_asof backward takes the LAST row
    # <= ts, which then equals our greatest-tie_break semantics
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values(
        ["rts", "rid"], kind="stable"
    )
    merged = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward",
        allow_exact_matches=True,
    )
    expected = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expected


def test_asof_join_directions_and_tolerance_vs_oracles(spark) -> None:
    """Randomized differential for the forward / nearest directions and
    tolerance: forward against pandas.merge_asof (right ties ordered so
    the greatest tie_break is taken first), nearest against a
    hand-rolled oracle with explicit tie->backward resolution,
    tolerance against pandas' Timedelta tolerance."""
    import random

    import pandas as pd

    rng = random.Random(23)
    left_rows = [
        (f"k{rng.randrange(4)}", datetime(2024, 6, 1 + rng.randrange(10), rng.randrange(24)), i)
        for i in range(100)
    ]
    right_rows = [
        (f"k{rng.randrange(5)}", datetime(2024, 6, 1 + rng.randrange(10), rng.randrange(24)), i)
        for i in range(70)
    ]
    left = spark.createDataFrame(left_rows, ["k", "ts", "lid"])
    right = spark.createDataFrame(right_rows, ["k", "rts", "rid"])

    def run(**kw):
        return {
            r.lid: r.asof_rid
            for r in asof_join(
                left, right, on="k", left_time="ts", right_time="rts",
                right_cols=["rid"], tie_break="rid", **kw,
            ).collect()
        }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")

    # forward: first row >= ts; pre-order ties rid-DESC so pandas takes
    # the greatest tie_break, matching the operator's tie rule
    rp_fwd = (
        pd.DataFrame(right_rows, columns=["k", "rts", "rid"])
        .sort_values("rid", ascending=False, kind="stable")
        .sort_values("rts", kind="stable")
    )
    merged_f = pd.merge_asof(
        lp, rp_fwd, left_on="ts", right_on="rts", by="k",
        direction="forward", allow_exact_matches=True,
    )
    expected_f = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged_f.itertuples()
    }
    assert run(direction="forward") == expected_f

    # nearest: hand-rolled oracle, exact-tie -> backward, right-time
    # ties -> greatest rid
    by_key: dict = {}
    for k, rts, rid in right_rows:
        by_key.setdefault(k, []).append((rts, rid))
    expected_n = {}
    for k, ts, lid in left_rows:
        cands = by_key.get(k, [])
        back = max(((t, r) for t, r in cands if t <= ts), default=None)
        fwd = min(
            ((t, -r) for t, r in cands if t >= ts), default=None
        )  # min over (t, -rid) -> earliest time, greatest rid
        if back is None and fwd is None:
            expected_n[lid] = None
        elif back is None:
            expected_n[lid] = -fwd[1]
        elif fwd is None:
            expected_n[lid] = back[1]
        else:
            db, df_ = ts - back[0], fwd[0] - ts
            expected_n[lid] = -fwd[1] if df_ < db else back[1]
    assert run(direction="nearest") == expected_n

    # tolerance: backward within 36 hours
    rp_back = pd.DataFrame(right_rows, columns=["k", "rts", "rid"]).sort_values(
        ["rts", "rid"], kind="stable"
    )
    merged_t = pd.merge_asof(
        lp, rp_back, left_on="ts", right_on="rts", by="k",
        direction="backward", allow_exact_matches=True,
        tolerance=pd.Timedelta(hours=36),
    )
    expected_t = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged_t.itertuples()
    }
    assert run(tolerance_seconds=36 * 3600) == expected_t


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir) -> None:
    """Semi-join reduction: a selectively-filtered dim side injects a
    bloom filter (built from dim join keys) into the fact-side scan, so
    pruned fact rows never reach the shuffle. Locally the 10 GB
    application-side threshold never fires, so the test lowers it to 0
    to assert the plan shape that production (100 TB fact scans) gets
    by default."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: bloom injection targets shuffle-side scans
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        dim = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = fact.join(dim, fact.l_orderkey == dim.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan  # built on the dim (creation) side
        assert "might_contain" in plan  # applied on the fact (application) side
        # and the filtered result is still correct
        keys = {
            r.o_orderkey
            for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
            .collect()
        }
        assert j.count() == fact.filter(F.col("l_orderkey").isin(keys)).count()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_join_skew_report_two_sided(spark) -> None:
    """Operator on two DIFFERENT frames: inner key semantics (keys on
    one side only contribute nothing), exact products, ppm floor."""
    from etl_marketdata_downloader_archived_spark.operators.skew import (
        join_skew_report,
    )

    left = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 1, ["k"]
    )
    right = spark.createDataFrame([("a",)] * 3 + [("b",)] * 5, ["k"])
    got = [
        tuple(r)
        for r in join_skew_report(left, right, on="k", top=2)
        .orderBy("rank")
        .collect()
    ]
    # a: 4*3=12, b: 2*5=10, c absent from right -> no row; total 22
    assert got == [
        (1, "a", 4, 3, 12, 22, (12 * 1_000_000) // 22),
        (2, "b", 2, 5, 10, 22, (10 * 1_000_000) // 22),
    ]


def test_join_skew_report_ppm_survives_bigint_overflow(spark) -> None:
    """Review regression: a hot key with ~3M rows per side puts
    out_rows*1e6 past bigint range - the ppm share must come through
    the decimal path, not wrap negative."""
    from etl_marketdata_downloader_archived_spark.operators.skew import (
        join_skew_report,
    )

    n = 3_000_000
    side = spark.range(n).select(F.lit("hot").alias("k"))
    r = join_skew_report(side, side, on="k", top=1).collect()[0]
    assert r.out_rows == n * n            # 9e12, fits bigint
    assert r.total_out == n * n
    assert r.share_ppm == 1_000_000       # NOT a negative wrap
