"""Round-4 analytics extensions: pandas/numpy differentials for the
exact-arithmetic risk panels, KS drift, inverted index, and the
md5-auditable split - the operator-level checks behind the
parity-verified queries in plans/analytics_ext.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from _helpers import half_up as _half_up  # noqa: E402


from etl_marketdata_downloader_archived_spark.operators import text as X
from etl_marketdata_downloader_archived_spark.operators import timeseries as TS
from etl_marketdata_downloader_archived_spark.operators.profile import ks_statistic
from etl_marketdata_downloader_archived_spark.operators.ranking import inverted_index


def _series_df(spark, seed=3, n=120, keys=("a", "b")):
    rng = np.random.default_rng(seed)
    rows = []
    for k in keys:
        v = 100.0
        for i in range(n):
            v = round(v * (1 + rng.normal(0, 0.01)), 2)
            rows.append((k, i, v))
    return spark.createDataFrame(rows, "sym string, t long, price double")


def test_returns_panel_vs_pandas(spark) -> None:
    df = _series_df(spark)
    out = TS.returns_panel(
        df, key="sym", ts="t", value="price", zscore_rows=20, scale=100
    ).toPandas()
    for sym, g in out.groupby("sym"):
        g = g.sort_values("t").reset_index(drop=True)
        p = g["price"]
        ret = p / p.shift(1) - 1
        dd = p / p.cummax() - 1
        mu = p.rolling(20, min_periods=1).mean()
        sd = p.rolling(20, min_periods=2).std()
        z = (p - mu) / sd
        assert np.allclose(
            g["ret"].to_numpy()[1:], ret.to_numpy()[1:], atol=1e-12
        )
        assert np.allclose(g["drawdown"].to_numpy(), dd.to_numpy(), atol=1e-12)
        mask = sd.notna() & (sd > 0)
        assert np.allclose(
            g["zscore"].to_numpy()[mask], z.to_numpy()[mask], atol=1e-9
        )
        # degenerate windows are NULL, not inf/nan
        assert g["zscore"].to_numpy()[0] != g["zscore"].to_numpy()[0]  # NaN


def test_returns_panel_single_window_pass(spark) -> None:
    df = _series_df(spark, n=30)
    out = TS.returns_panel(df, key="sym", ts="t", value="price")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1


def test_rolling_corr_vs_pandas(spark) -> None:
    rng = np.random.default_rng(11)
    rows = []
    x = y = 50.0
    for i in range(200):
        x = round(x * (1 + rng.normal(0, 0.01)), 2)
        y = round(0.5 * x + 25 * (1 + rng.normal(0, 0.02)), 2)
        rows.append((i, x, y))
    df = spark.createDataFrame(rows, "t long, x double, y double")
    out = (
        TS.rolling_corr(df, ts="t", x="x", y="y", window_rows=30, scale=100)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["t", "x", "y"])
    want = pdf["x"].rolling(30, min_periods=2).corr(pdf["y"])
    mask = want.notna()
    assert np.allclose(
        out["corr"].to_numpy()[mask], want.to_numpy()[mask], atol=1e-9
    )
    assert out["n_obs"].iloc[40] == 30


def test_ks_statistic_known_answer(spark) -> None:
    # a = {1,2,3,4}, b = {3,4,5,6}: ECDFs diverge most at x=2 -> 0.5
    rows = [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "v int, side string")
    got = ks_statistic(df, "v", "side").collect()[0]
    assert got.ks == pytest.approx(0.5)
    assert (got.n_a, got.n_b) == (4, 4)


def test_ks_statistic_identical_distributions(spark) -> None:
    rows = [(v, s) for v in range(10) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "v int, side string")
    assert ks_statistic(df, "v", "side").collect()[0].ks == pytest.approx(0.0)


def test_ks_statistic_vs_numpy_ecdf(spark) -> None:
    rng = np.random.default_rng(5)
    a = np.round(rng.normal(0, 1, 400), 3)
    b = np.round(rng.normal(0.4, 1.2, 300), 3)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, side string")
    got = ks_statistic(df, "v", "side").collect()[0].ks
    xs = np.unique(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    ecdf_b = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    assert got == pytest.approx(np.abs(ecdf_a - ecdf_b).max(), abs=1e-12)


def test_ks_statistic_binned_bounds_exact(spark) -> None:
    """Binned KS is a sup over a coarser grid: <= exact, and close
    for a reasonable bin count."""
    rng = np.random.default_rng(9)
    a = rng.normal(0, 1, 500)
    b = rng.normal(0.5, 1, 500)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, side string")
    exact = ks_statistic(df, "v", "side").collect()[0].ks
    binned = ks_statistic(df, "v", "side", bins=64).collect()[0].ks
    assert binned <= exact + 1e-12
    assert binned == pytest.approx(exact, abs=0.05)


def test_inverted_index_known_answer(spark) -> None:
    docs = [
        (1, "spark spark stream"),
        (2, "spark window"),
        (3, "stream stream stream spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.term: r for r in inverted_index(df, "doc_id", "text").collect()}
    assert got["spark"].df == 3
    assert got["spark"].total_tf == 4
    # tf desc (doc1 has 2), then doc_id asc among tf=1
    assert got["spark"].top_doc_ids == "1,2,3"
    assert got["stream"].top_doc_ids == "3,1"
    assert got["window"].df == 1 and got["window"].top_doc_ids == "2"


def test_inverted_index_caps_postings_but_counts_all(spark) -> None:
    docs = [(i, "common word") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.term: r
        for r in inverted_index(df, "doc_id", "text", top_docs=3).collect()
    }
    assert got["common"].df == 10  # counts every posting
    assert got["common"].top_doc_ids == "0,1,2"  # stores only the heads


def test_inverted_index_top_docs_zero_keeps_terms(spark) -> None:
    """top_docs=0 (stats-only index, skip posting heads) must keep
    every term with an empty posting string - the round-5 df/heads
    split made heads EMPTY at 0 and an inner join dropped all terms."""
    docs = [(1, "spark stream"), (2, "spark")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.term: r
        for r in inverted_index(df, "doc_id", "text", top_docs=0).collect()
    }
    assert set(got) == {"spark", "stream"}
    assert got["spark"].df == 2 and got["spark"].top_doc_ids == ""
    assert got["stream"].df == 1 and got["stream"].top_doc_ids == ""


def test_inverted_index_min_df(spark) -> None:
    docs = [(1, "rare common"), (2, "common")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = {
        r.term
        for r in inverted_index(df, "doc_id", "text", min_df=2).collect()
    }
    assert terms == {"common"}


def test_hash_split_md5_mode(spark) -> None:
    """md5 mode: deterministic, proportional, and reproducible from
    the documented formula (first 8 md5 hex chars mod 10000)."""
    import hashlib

    n = 4000
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {
        r.doc_id: r.split
        for r in df.select(
            "doc_id", X.hash_split("doc_id", fr, seed=42, algo="md5")
        ).collect()
    }
    counts = {"train": 0, "val": 0, "test": 0}
    for i in range(n):
        slot = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:8], 16) % 10000
        want = "train" if slot < 8000 else ("val" if slot < 9000 else "test")
        assert out[i] == want
        counts[want] += 1
    assert counts["train"] / n == pytest.approx(0.8, abs=0.03)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.02)


def test_hash_split_rejects_unknown_algo(spark) -> None:
    with pytest.raises(ValueError, match="unknown split algo"):
        X.hash_split("doc_id", {"a": 1.0}, algo="sha1")


def test_ols_trend_matches_numpy(spark, sf_dir) -> None:
    """Registered ols_trend query vs numpy.polyfit on the same
    cents-rounded series (the query regresses integer cents/100)."""
    from etl_marketdata_downloader_archived_spark.plans import registry

    out = {
        r.event_type: r
        for r in registry.all_queries()["ols_trend"](spark, sf_dir).collect()
    }
    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["x"] = (
        pdf["ts"].dt.floor("h") - pd.Timestamp("2024-01-01")
    ).dt.total_seconds() // 3600
    pdf["y"] = (pdf["value"] * 100).round() / 100
    for et, g in pdf.groupby("event_type"):
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        assert out[et].slope == pytest.approx(slope, rel=1e-9)
        assert out[et].intercept == pytest.approx(intercept, rel=1e-9)
        r = np.corrcoef(g["x"], g["y"])[0, 1]
        assert out[et].r2 == pytest.approx(r * r, rel=1e-9)


def test_mad_outliers_vs_numpy(spark) -> None:
    """mad_outliers vs a numpy median/MAD reference, including the
    even-n averaged median and an injected spike that the MEAN/STD
    gate would partially mask (masking check: robust flags the spikes,
    the contaminated std shrinks classic z below its own cutoff for
    some of them)."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        mad_outliers,
    )

    rng = np.random.default_rng(13)
    vals = list(np.round(rng.normal(100, 1, 200), 3))
    spikes = [200.0, 210.0, 190.0, 205.0, 195.0, 208.0, 202.0, 199.5]
    all_vals = vals + spikes
    rows = [(i, "a", float(v)) for i, v in enumerate(all_vals)]
    df = spark.createDataFrame(rows, "event_id long, grp string, v double")
    got = {
        r.event_id: r
        for r in mad_outliers(
            df, "v", by=["grp"], k=3.0, id_cols=["event_id"]
        ).collect()
    }

    a = np.array(all_vals)
    med = np.median(a)  # numpy averages the two middles for even n
    mad = np.median(np.abs(a - med))
    rz = np.abs(a - med) / (mad * 1.4826)
    want = {i for i in range(len(a)) if rz[i] > 3.0}
    assert set(got) == want
    for i in got:
        assert got[i].robust_z == pytest.approx(rz[i], rel=1e-12)
    # every spike is flagged
    assert {i for i in want if i >= 200} == set(range(200, 208))


def test_mad_outliers_constant_group_flags_nothing(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        mad_outliers,
    )

    rows = [(i, "c", 5.0) for i in range(10)] + [(99, "c", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, grp string, v double")
    # MAD == 0 (majority constant): gate declines rather than
    # dividing by zero; documented edge
    assert (
        mad_outliers(df, "v", by=["grp"], id_cols=["event_id"]).count() == 0
    )


def test_exact_panel_is_partitioning_invariant(spark) -> None:
    """The integer-moments claim, tested directly: the z-score panel
    must be BIT-IDENTICAL under different partitionings (different
    shuffle split = different float accumulation order in a naive
    formulation; exact bigint moments make the result independent of
    parallelism, which is why the alert gates cannot flicker on a
    cluster)."""
    df = _series_df(spark, seed=17, n=300, keys=("a", "b", "c"))
    outs = []
    for parts in (1, 7, 32):
        out = TS.returns_panel(
            df.repartition(parts), key="sym", ts="t", value="price",
            zscore_rows=24, scale=100,
        )
        rows = {
            (r.sym, r.t): (r.ret, r.drawdown, r.zscore)
            for r in out.collect()
        }
        outs.append(rows)
    assert outs[0] == outs[1] == outs[2]  # == on floats: bit-exact


def test_ks_is_partitioning_invariant(spark) -> None:
    rng = np.random.default_rng(23)
    rows = [
        (float(v), "a" if i % 2 else "b")
        for i, v in enumerate(rng.normal(0, 1, 2000))
    ]
    df = spark.createDataFrame(rows, "v double, side string")
    vals = {
        parts: ks_statistic(df.repartition(parts), "v", "side").collect()[0].ks
        for parts in (1, 11, 32)
    }
    assert len(set(vals.values())) == 1


def test_quantize_embeddings_roundtrip_and_recall(spark, sf_dir) -> None:
    """int8 quantization: reconstruction error bounded by scale/2 per
    component, and brute-force cosine top-10 recall vs the float
    corpus stays >= 0.9 on the driver embeddings table."""
    from etl_marketdata_downloader_archived_spark.operators.similarity import (
        dequantize_expr,
        quantize_embeddings,
        topk_cosine,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_embeddings(emb)

    # roundtrip error bound: |v - codes*scale| <= scale/2 + eps
    joined = emb.join(q, "vec_id").select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    dequantize_expr(F.col("codes"), F.col("scale")),
                    lambda a, b: F.abs(a - b) / F.col("scale"),
                ),
                F.lit(0.0),
                lambda a, b: F.greatest(a, b),
            )
        ).alias("worst_half_steps")
    ).collect()[0]
    assert joined.worst_half_steps <= 0.5 + 1e-6

    # recall of cosine top-10 under quantization
    query = emb.orderBy("vec_id").first().embedding
    want = {
        r.vec_id for r in topk_cosine(emb, query, k=10).collect()
    }
    deq = q.select(
        "vec_id", dequantize_expr(F.col("codes"), F.col("scale")).alias("embedding")
    )
    got = {
        r.vec_id for r in topk_cosine(deq, query, k=10).collect()
    }
    assert len(want & got) >= 9

    # schema actually shrinks: tinyint codes, float scale
    assert dict(q.dtypes)["codes"] == "array<tinyint>"
    assert dict(q.dtypes)["scale"] == "float"


def test_mann_whitney_vs_reference(spark) -> None:
    """mann_whitney vs a from-scratch numpy reference (tie-averaged
    ranks, tie-corrected variance) on a shifted sample with ties."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        mann_whitney,
    )

    rng = np.random.default_rng(41)
    a = np.round(rng.normal(0, 1, 300), 1)  # coarse rounding -> ties
    b = np.round(rng.normal(0.5, 1, 250), 1)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, side string")
    got = mann_whitney(df, "v", "side").collect()[0]

    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    # tie-averaged ranks
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2
        i = j
    ra = ranks[: len(a)].sum()
    na, nb = len(a), len(b)
    u = ra - na * (na + 1) / 2
    assert got.u_a == pytest.approx(u, abs=1e-9)
    assert got.effect == pytest.approx(u / (na * nb), rel=1e-12)
    n = na + nb
    _, t = np.unique(allv, return_counts=True)
    var = (na * nb / 12) * ((n + 1) - ((t**3 - t).sum()) / (n * (n - 1)))
    z = (u - na * nb / 2) / np.sqrt(var)
    assert got.z == pytest.approx(z, rel=1e-12)
    # b is shifted UP, so side a's rank sum is LOW: strong negative z
    assert got.z < -3


def test_mann_whitney_no_shift_small_z(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        mann_whitney,
    )

    rows = [(float(v % 17), s) for v in range(400) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, side string")
    got = mann_whitney(df, "v", "side").collect()[0]
    assert got.effect == pytest.approx(0.5, abs=1e-12)
    assert abs(got.z) < 1e-9


def test_spearman_query_matches_pandas(spark, sf_dir) -> None:
    """Registered spearman_corr vs pandas .corr(method='spearman') on
    the same aligned hourly-close pair - pins the true tie-averaged
    definition (a self-consistent wrong rank formula would pass
    parity on both engines but fail this)."""
    from etl_marketdata_downloader_archived_spark.plans import registry

    got = registry.all_queries()["spearman_corr"](spark, sf_dir).collect()[0]
    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["bar_ts"] = pdf["ts"].dt.floor("h")
    close = (
        pdf.sort_values(["ts", "event_id"])
        .groupby(["event_type", "bar_ts"])
        .last()["value"]
        .reset_index()
    )
    a = close[close.event_type == "view"].set_index("bar_ts")["value"]
    b = close[close.event_type == "click"].set_index("bar_ts")["value"]
    j = pd.concat([a.rename("x"), b.rename("y")], axis=1, join="inner")
    # spearman = pearson on tie-averaged ranks (pandas' spearman needs
    # scipy, absent here; rank(method='average') is the definition)
    want = j["x"].rank(method="average").corr(j["y"].rank(method="average"))
    assert got.n_obs == len(j)
    assert got.spearman == pytest.approx(want, rel=1e-12)


def test_weighted_median_vs_numpy(spark) -> None:
    """weighted_median's rank-from-counts selection vs an independent
    expansion-based computation: repeat each value by its integer
    weight, take the element at position ceil(W/2) (lower weighted
    median). Heavy tie mass + a group whose boundary lands exactly on
    a tie group."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        weighted_median,
    )

    rng = np.random.default_rng(19)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(200):
            rows.append(
                (g, float(rng.integers(0, 25)), int(rng.integers(1, 9)))
            )
    # exact-boundary group: weights 1,1 over values 1,2 -> cum(1)=1,
    # 2*1 >= 2 -> lower median is 1
    rows += [("edge", 1.0, 1), ("edge", 2.0, 1)]
    # weight filtering: zero/negative/NULL weights drop
    rows += [("edge", 0.5, 0), ("edge", 0.25, -3)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {
        r.g: (r.total_weight, r.median)
        for r in weighted_median(df, "v", "w", by=["g"]).collect()
    }

    want = {}
    for g in ("a", "b", "c", "edge"):
        expanded = sorted(
            v for gg, v, w in rows if gg == g and w > 0 for _ in range(w)
        )
        W = len(expanded)
        want[g] = (W, expanded[(W + 1) // 2 - 1])
    assert got == want


def test_weighted_median_global_no_groups(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [(10.0, 1), (20.0, 2), (30.0, 1)], "v double, w long"
    )
    row = weighted_median(df, "v", "w").collect()[0]
    # expanded: 10,20,20,30 -> lower median = element 2 = 20
    assert (row.total_weight, row.median) == (4, 20.0)


def test_weighted_median_binned_tiers(spark) -> None:
    """Binned weighted median: bit-equal to exact when quantization
    is injective on the observed values; within one bin width of the
    exact median on continuous values; explicit bounds reproduce auto
    bounds; out-of-range values clamp (nothing dropped)."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        weighted_median,
    )

    rng = np.random.default_rng(23)
    # injective case: 12 distinct values, 1000 bins
    rows = [
        ("g", float(v), int(w))
        for v, w in zip(rng.integers(0, 12, 300), rng.integers(1, 7, 300))
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    exact = weighted_median(df, "v", "w", by=["g"]).collect()[0]
    binned = weighted_median(df, "v", "w", by=["g"], bins=1000).collect()[0]
    assert (binned.total_weight, binned.median) == (
        exact.total_weight, exact.median,
    )

    # continuous case: error bounded by one bin width
    vals = rng.normal(0.0, 1.0, 2000)
    ws = rng.integers(1, 5, 2000)
    dfc = spark.createDataFrame(
        [("g", float(v), int(w)) for v, w in zip(vals, ws)],
        "g string, v double, w long",
    )
    exact = weighted_median(dfc, "v", "w", by=["g"]).collect()[0]
    b = 64
    binned = weighted_median(dfc, "v", "w", by=["g"], bins=b).collect()[0]
    width = (vals.max() - vals.min()) / b
    assert binned.total_weight == exact.total_weight
    assert abs(binned.median - exact.median) <= width + 1e-12
    # binned median is still an OBSERVED value
    assert binned.median in set(float(v) for v in vals)

    # pinned bounds == auto bounds at the data min/max; narrow bounds clamp
    lo, hi = float(vals.min()), float(vals.max())
    pinned = weighted_median(
        dfc, "v", "w", by=["g"], bins=b, bounds=(lo, hi)
    ).collect()[0]
    assert (pinned.total_weight, pinned.median) == (
        binned.total_weight, binned.median,
    )
    narrow = weighted_median(
        dfc, "v", "w", by=["g"], bins=b, bounds=(-0.1, 0.1)
    ).collect()[0]
    assert narrow.total_weight == exact.total_weight  # clamped, not dropped


def test_user_growth_vs_python(spark, sf_dir) -> None:
    """user_growth's day-level curve vs independent python set
    arithmetic over the same events fixture: conservation (every
    active is new or returning), cumulative = running union size."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r7 import (
        user_growth,
    )

    rows = user_growth(spark, sf_dir).orderBy("day").collect()
    from etl_marketdata_downloader_archived_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "user_id"
    ).collect()
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r.ts.date(), set()).add(r.user_id)
    seen: set = set()
    want = []
    for day in sorted(by_day):
        users = by_day[day]
        new = users - seen
        seen |= users
        want.append((day, len(users), len(new), len(users - new), len(seen)))
    got = [
        (r.day, r.n_active, r.n_new, r.n_returning, r.cum_users)
        for r in rows
    ]
    assert got == want


def test_basket_pairs_vs_python(spark, sf_dir) -> None:
    """Market-basket support/confidence/lift vs an independent python
    counter over the same fixture."""
    from itertools import combinations

    from etl_marketdata_downloader_archived_spark.io import load_table
    from etl_marketdata_downloader_archived_spark.plans.analytics_r7 import (
        basket_pairs,
    )

    rows = basket_pairs(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n = len(baskets)
    item: dict = {}
    pair: dict = {}
    for parts in baskets.values():
        for p in parts:
            item[p] = item.get(p, 0) + 1
        for a, b in combinations(
            sorted(parts, key=lambda p: (p is None, p)), 2
        ):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    ranked = sorted(
        ((ab, a, b) for (a, b), ab in pair.items() if ab >= 2),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:50]
    assert [(r.a, r.b, r.ab) for r in rows] == [
        (a, b, ab) for ab, a, b in ranked
    ]
    for r in rows:
        assert r.support == pair[(r.a, r.b)] / n
        assert r.confidence == pair[(r.a, r.b)] / item[r.a]
        assert r.lift == (n * pair[(r.a, r.b)]) / (item[r.a] * item[r.b])


def test_lorenz_curve_vs_python(spark, sf_dir) -> None:
    """Full independent value replay (parity cannot catch a formula
    mirrored wrong on both engines): expand per-user activity counts
    in python, walk users ascending, bucket by last cumulative
    position, and compare every share bit-for-bit - plus the curve
    invariants (monotone, under-diagonal, exact (1,1) endpoint).
    Ground truth keeps a NULL user as one contributor, matching the
    query's groupBy convention (countDistinct would drop it)."""
    import math

    from etl_marketdata_downloader_archived_spark.io import load_table
    from etl_marketdata_downloader_archived_spark.plans.analytics_r7 import (
        lorenz_curve,
    )

    rows = lorenz_curve(spark, sf_dir).collect()
    got: dict = {}
    for r in rows:
        got[(r.event_type, r.decile)] = (
            r.cum_users, r.user_share, r.activity_share
        )
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).collect()
    per_user: dict = {}
    for r in ev:
        per_user[(r.event_type, r.user_id)] = (
            per_user.get((r.event_type, r.user_id), 0) + 1
        )
    by_type: dict = {}
    for (ty, _u), n in per_user.items():
        by_type.setdefault(ty, []).append(n)
    want: dict = {}
    for ty, ns in by_type.items():
        ns.sort()
        tot_u, tot_a = len(ns), sum(ns)
        cum_u = cum_a = 0
        # collapse to tie groups exactly as the query does: the whole
        # group lands in the decile of its LAST cumulative position
        i = 0
        while i < len(ns):
            j = i
            while j < len(ns) and ns[j] == ns[i]:
                j += 1
            cum_u += j - i
            cum_a += ns[i] * (j - i)
            dec = math.ceil(cum_u * 10 / tot_u)
            want[(ty, dec)] = (cum_u, cum_u / tot_u, cum_a / tot_a)
            i = j
    assert got == want
    for ty, ns in by_type.items():
        pts = sorted(
            (d for (t, d) in got if t == ty),
        )
        last = got[(ty, pts[-1])]
        assert pts[-1] == 10 and last[1] == 1.0 and last[2] == 1.0
        shares = [got[(ty, d)] for d in pts]
        assert shares == sorted(shares)
        for _cu, us, ash in shares:
            assert ash <= us + 1e-12  # under the diagonal


def test_fulfillment_latency_vs_python(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.io import load_table
    from etl_marketdata_downloader_archived_spark.plans.analytics_r7 import (
        fulfillment_latency,
    )

    got = {
        r.priority: (r.n, r.mean_days, r.p50_days, r.p90_days)
        for r in fulfillment_latency(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).collect()
    omap = {r.o_orderkey: r for r in o}
    lat: dict = {}
    for r in li:
        oo = omap.get(r.l_orderkey)
        if oo is None or r.l_shipdate is None or oo.o_orderdate is None:
            continue
        d = (r.l_shipdate.date() - oo.o_orderdate.date()).days
        lat.setdefault(oo.o_orderpriority, []).append(d)
    for pr, ds in lat.items():
        ds.sort()
        n = len(ds)
        want = (
            n,
            sum(ds) / n,
            ds[-(-n * 50 // 100) - 1],  # ceil(n*p/100)-th element
            ds[-(-n * 90 // 100) - 1],
        )
        assert got[pr] == want


def test_ltv_quintiles_vs_python(spark, sf_dir) -> None:
    """Per-segment LTV quintiles vs a full python replay (ascending
    spend tie groups, quintile of last cumulative position), plus
    conservation: customers/orders/share sum to segment totals."""
    import math

    from etl_marketdata_downloader_archived_spark.io import load_table
    from etl_marketdata_downloader_archived_spark.plans.analytics_r7 import (
        ltv_quintiles,
    )

    rows = ltv_quintiles(spark, sf_dir).collect()
    got = {
        (r.segment, r.quintile): (
            r.n_customers, r.n_orders, r.spend_share, r.avg_spend
        )
        for r in rows
    }
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    seg = {r.c_custkey: r.c_mktsegment for r in c}
    per_cust: dict = {}
    for r in o:
        k = (seg[r.o_custkey], r.o_custkey)
        sp, n = per_cust.get(k, (0, 0))
        per_cust[k] = (sp + _half_up(r.o_totalprice * 100), n + 1)
    by_seg: dict = {}
    for (sg, _cu), (sp, n) in per_cust.items():
        by_seg.setdefault(sg, {}).setdefault(sp, [0, 0])
        by_seg[sg][sp][0] += 1
        by_seg[sg][sp][1] += n
    want: dict = {}
    for sg, groups in by_seg.items():
        tot_u = sum(t for t, _ in groups.values())
        tot_s = sum(sp * t for sp, (t, _) in groups.items())
        cum_u = 0
        acc: dict = {}
        for sp in sorted(groups):
            t, ords = groups[sp]
            cum_u += t
            q = math.ceil(cum_u * 5 / tot_u)
            a = acc.setdefault(q, [0, 0, 0])
            a[0] += t
            a[1] += ords
            a[2] += sp * t
        for q, (nc, no, ss) in acc.items():
            want[(sg, q)] = (nc, no, ss / tot_s, ss / nc / 100.0)
    assert got == want
    for sg, groups in by_seg.items():
        qs = [v for (s2, _q), v in got.items() if s2 == sg]
        assert sum(v[0] for v in qs) == sum(t for t, _ in groups.values())
        assert abs(sum(v[2] for v in qs) - 1.0) < 1e-9


def test_ltv_quintiles_binned_vs_python(spark, sf_dir) -> None:
    """The binned LTV tier vs a full python replay of the 64-bucket
    width_bucket grid (floor(bins*(v-lo)/(hi-lo)+1), hi -> bins+1)
    plus the quintile-of-last-cumulative-position sweep - bit-for-bit,
    and conservation: counts and shares still sum to segment totals
    (quantization moves BOUNDARIES, never drops customers)."""
    import math

    from etl_marketdata_downloader_archived_spark.io import load_table
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        ltv_quintiles_binned,
    )

    rows = ltv_quintiles_binned(spark, sf_dir).collect()
    got = {
        (r.segment, r.quintile): (
            r.n_customers, r.n_orders, r.spend_share, r.avg_spend
        )
        for r in rows
    }
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    seg = {r.c_custkey: r.c_mktsegment for r in c}
    per_cust: dict = {}
    for r in o:
        k = (seg[r.o_custkey], r.o_custkey)
        sp, n = per_cust.get(k, (0, 0))
        per_cust[k] = (sp + _half_up(r.o_totalprice * 100), n + 1)
    lo = float(min(sp for sp, _ in per_cust.values()))
    hi = float(max(sp for sp, _ in per_cust.values()))
    by_seg: dict = {}
    for (sg, _cu), (sp, n) in per_cust.items():
        if float(sp) >= hi:
            bkt = 65
        else:
            bkt = math.floor(64.0 * (float(sp) - lo) / (hi - lo) + 1)
        g = by_seg.setdefault(sg, {}).setdefault(bkt, [0, 0, 0])
        g[0] += 1
        g[1] += n
        g[2] += sp
    want: dict = {}
    for sg, groups in by_seg.items():
        tot_u = sum(t for t, _, _ in groups.values())
        tot_s = sum(s for _, _, s in groups.values())
        cum_u = 0
        acc: dict = {}
        for bkt in sorted(groups):
            t, ords, s = groups[bkt]
            cum_u += t
            q = math.ceil(cum_u * 5 / tot_u)
            a = acc.setdefault(q, [0, 0, 0])
            a[0] += t
            a[1] += ords
            a[2] += s
        for q, (nc, no, ss) in acc.items():
            want[(sg, q)] = (nc, no, ss / tot_s, ss / nc / 100.0)
    assert got == want
    for sg, groups in by_seg.items():
        qs = [v for (s2, _q), v in got.items() if s2 == sg]
        assert sum(v[0] for v in qs) == sum(t for t, _, _ in groups.values())
        assert abs(sum(v[2] for v in qs) - 1.0) < 1e-9
