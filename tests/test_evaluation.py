"""Model-evaluation operators: independent numpy/pandas differentials
(the oracle parity proves cross-engine exactness; these prove the
FORMULAS - a metric wrong the same way on both engines passes parity
but fails here), plus the degenerate edges a gate must not misreport.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_marketdata_downloader_archived_spark.operators.evaluation import (
    binary_auc,
    confusion_at_threshold,
    score_deciles,
)


def _numpy_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Tie-averaged rank AUC: U_pos / (n_pos * n_neg)."""
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=float)
    sorted_scores = scores[order]
    i = 0
    pos = 1
    while i < len(scores):
        j = i
        while j < len(scores) and sorted_scores[j] == sorted_scores[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
        pos += j - i
        i = j
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    u = ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


@pytest.mark.parametrize("seed", [0, 7])
def test_binary_auc_matches_numpy(spark, seed) -> None:
    rng = np.random.default_rng(seed)
    n = 400
    # integer-ish scores force heavy ties - the tie-averaged rank path
    scores = np.round(rng.normal(50, 10, n), 0)
    labels = rng.random(n) < 1 / (1 + np.exp(-(scores - 50) / 10))
    grp = rng.integers(0, 3, n)
    df = spark.createDataFrame(
        [(int(g), float(s), bool(l)) for g, s, l in zip(grp, scores, labels)],
        "g int, score double, label boolean",
    )
    got = {r.g: r for r in binary_auc(df, "score", "label", by=["g"]).collect()}
    for g in range(3):
        m = grp == g
        want = _numpy_auc(scores[m], labels[m])
        assert got[g].auc == pytest.approx(want, abs=1e-12)
        assert got[g].n_pos == int(labels[m].sum())
        assert got[g].n_neg == int((~labels[m]).sum())


def test_binary_auc_single_class_is_null(spark) -> None:
    df = spark.createDataFrame(
        [(1.0, True), (2.0, True), (3.0, True)], "score double, label boolean"
    )
    row = binary_auc(df, "score", "label").collect()[0]
    assert row.n_pos == 3 and row.n_neg == 0 and row.auc is None


def test_score_deciles_matches_pandas(spark) -> None:
    """Value-decile reference in pandas: collapse to distinct-score
    counts, descending cumulative positions, bucket = ceil(cum*10/n)
    for the whole tie group."""
    rng = np.random.default_rng(3)
    n = 1000
    scores = np.round(rng.uniform(0, 100, n), 1)
    labels = rng.random(n) < scores / 120.0
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    got = (
        score_deciles(df, "score", "label")
        .orderBy("decile")
        .toPandas()
        .set_index("decile")
    )

    pdf = pd.DataFrame({"s": scores, "p": labels.astype(int)})
    g = pdf.groupby("s", as_index=False).agg(t=("p", "size"), p=("p", "sum"))
    g = g.sort_values("s", ascending=False)
    g["cum"] = g["t"].cumsum()
    g["decile"] = np.ceil(g["cum"] * 10 / n).astype(int)
    per = g.groupby("decile").agg(n_rows=("t", "sum"), n_pos=("p", "sum"))
    base = labels.sum() / n
    assert list(got.index) == list(per.index)
    for d in per.index:
        assert got.loc[d, "n_rows"] == per.loc[d, "n_rows"]
        assert got.loc[d, "n_pos"] == per.loc[d, "n_pos"]
        want_lift = (per.loc[d, "n_pos"] / per.loc[d, "n_rows"]) / base
        assert got.loc[d, "lift"] == pytest.approx(want_lift, abs=1e-12)
    assert got["cum_rows"].iloc[-1] == n
    assert got["cum_gain"].iloc[-1] == pytest.approx(1.0, abs=0)


def test_score_deciles_tie_group_spanning_buckets(spark) -> None:
    """One score value holding 70% of the mass swallows the buckets it
    spans: the tie group lands wholly in its LAST bucket and the
    swallowed deciles are absent, not fabricated."""
    rows = [(5.0, False)] * 70 + [(float(9 + i), True) for i in range(30)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r.decile: r for r in score_deciles(df, "score", "label").collect()}
    # 30 distinct high scores fill deciles 1..3; the 70-row tie group's
    # last position is 100 -> decile 10
    assert set(got) == {1, 2, 3, 10}
    assert got[10].n_rows == 70 and got[10].n_pos == 0
    assert got[10].cum_rows == 100


def test_confusion_at_threshold_matches_numpy(spark) -> None:
    rng = np.random.default_rng(5)
    scores = rng.uniform(0, 1, 500)
    labels = rng.random(500) < scores
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    row = confusion_at_threshold(df, "score", "label", threshold=0.5).collect()[0]
    pred = scores >= 0.5
    tp = int((pred & labels).sum())
    fp = int((pred & ~labels).sum())
    fn = int((~pred & labels).sum())
    assert (row.tp, row.fp, row.tn, row.fn) == (
        tp, fp, int((~pred & ~labels).sum()), fn
    )
    assert row.precision == pytest.approx(tp / (tp + fp), abs=1e-15)
    assert row.recall == pytest.approx(tp / (tp + fn), abs=1e-15)
    assert row.f1 == pytest.approx(2 * tp / (2 * tp + fp + fn), abs=1e-15)


def test_confusion_degenerate_rates_are_null(spark) -> None:
    """No predicted positives -> precision NULL (not NaN/0); no actual
    positives -> recall NULL; alarm logic downstream must see NULL and
    decide, not inherit a NaN comparison."""
    df = spark.createDataFrame(
        [(0.1, False), (0.2, False)], "score double, label boolean"
    )
    row = confusion_at_threshold(df, "score", "label", threshold=0.9).collect()[0]
    assert row.tp == 0 and row.fp == 0 and row.fn == 0 and row.tn == 2
    assert row.precision is None and row.recall is None and row.f1 is None


# --- hypothesis invariants (one Spark job per example, small N) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SAMPLES = st.lists(
    st.tuples(st.integers(0, 15), st.booleans()),  # tiny range -> ties
    min_size=12,
    max_size=60,
).filter(lambda xs: any(l for _, l in xs) and any(not l for _, l in xs))


@given(xs=_SAMPLES)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_auc_label_flip_symmetry(spark, xs) -> None:
    """AUC(label) + AUC(~label) == 1 exactly (tie-averaged ranks make
    the two U statistics partition n_pos*n_neg) - a formula-level
    invariant independent of the numpy differential."""
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in xs], "score double, label boolean"
    )
    a = binary_auc(df, "score", "label").collect()[0]
    df2 = spark.createDataFrame(
        [(float(s), not l) for s, l in xs], "score double, label boolean"
    )
    b = binary_auc(df2, "score", "label").collect()[0]
    assert (a.n_pos, a.n_neg) == (b.n_neg, b.n_pos)
    assert a.auc + b.auc == pytest.approx(1.0, abs=1e-12)


@given(xs=_SAMPLES)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_score_deciles_invariants(spark, xs) -> None:
    """Structural invariants for any input: deciles within 1..10,
    cumulative counts monotone and totaling the input, final gain
    exactly 1, and the row-weighted mean lift exactly the base rate's
    inverse-normalization (== 1)."""
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in xs], "score double, label boolean"
    )
    rows = score_deciles(df, "score", "label").orderBy("decile").collect()
    n = len(xs)
    n_pos = sum(1 for _, l in xs if l)
    assert all(1 <= r.decile <= 10 for r in rows)
    assert [r.cum_rows for r in rows] == sorted(r.cum_rows for r in rows)
    assert rows[-1].cum_rows == n and rows[-1].cum_pos == n_pos
    assert sum(r.n_rows for r in rows) == n
    assert rows[-1].cum_gain == pytest.approx(1.0, abs=0)
    weighted = sum(r.n_rows * r.lift for r in rows if r.lift is not None)
    assert weighted / n == pytest.approx(1.0, rel=1e-12)


def test_null_labels_are_dropped_not_misclassed(spark) -> None:
    """A NULL label is unknown, not negative: it must not tilt AUC
    toward the negative class, shift a decile's base rate, or vanish
    from confusion cells leaving tp+fp+tn+fn < n."""
    rows = [(1.0, False), (2.0, True), (3.0, None), (4.0, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    a = binary_auc(df, "score", "label").collect()[0]
    assert (a.n_pos, a.n_neg) == (2, 1)  # the NULL row is gone
    c = confusion_at_threshold(df, "score", "label", threshold=2.5).collect()[0]
    assert c.tp + c.fp + c.tn + c.fn == 3
    d = score_deciles(df, "score", "label").collect()
    assert sum(r.n_rows for r in d) == 3


def test_uncastable_labels_are_dropped_too(spark) -> None:
    """A string label that casts to NULL boolean ('unknown') is as
    unknown as a raw NULL - it must be dropped by every operator, not
    classed negative (AUC) or vanished from the cells (confusion)."""
    rows = [(1.0, "false"), (2.0, "true"), (3.0, "unknown"), (4.0, "true")]
    df = spark.createDataFrame(rows, "score double, label string")
    a = binary_auc(df, "score", "label").collect()[0]
    assert (a.n_pos, a.n_neg) == (2, 1)
    c = confusion_at_threshold(df, "score", "label", threshold=2.5).collect()[0]
    assert c.tp + c.fp + c.tn + c.fn == 3
    d = score_deciles(df, "score", "label").collect()
    assert sum(r.n_rows for r in d) == 3


def test_binned_auc_error_bound_continuous(spark) -> None:
    """Binned AUC on continuous scores: within-bin pos/neg pairs are
    counted half, so |binned - exact| <= sum_i(p_i*q_i)/(2*P*N) - the
    theoretical bound, asserted from the actual bin masses, plus an
    empirical 256-bin ceiling for this distribution."""
    rng = np.random.default_rng(11)
    n = 2000
    scores = rng.normal(0.0, 1.0, n)  # continuous: all distinct
    labels = rng.random(n) < 1 / (1 + np.exp(-1.2 * scores))
    assert len(np.unique(scores)) == n
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    exact = _numpy_auc(scores, labels)
    bins = 256
    row = binary_auc(df, "score", "label", bins=bins).collect()[0]
    # replicate the width_bucket grid to get per-bin class masses
    lo, hi = scores.min(), scores.max()
    bucket = np.clip(
        np.floor((scores - lo) / (hi - lo) * bins).astype(int), 0, bins
    )
    p = np.bincount(bucket[labels], minlength=bins + 2)
    q = np.bincount(bucket[~labels], minlength=bins + 2)
    bound = float((p * q).sum()) / (2.0 * labels.sum() * (~labels).sum())
    assert abs(row.auc - exact) <= bound + 1e-12
    assert abs(row.auc - exact) < 0.01  # 256 bins on 2k normals
    assert row.n_pos == int(labels.sum())
    assert row.n_neg == int((~labels).sum())


def test_binned_auc_exact_when_quantization_injective(spark) -> None:
    """A discrete score domain that maps one value per bucket loses
    nothing: binned AUC == exact AUC bit-for-bit (the existing oracle
    fixtures are unaffected by opting into the tier)."""
    rng = np.random.default_rng(3)
    n = 300
    scores = rng.integers(0, 20, n).astype(float)  # 20 distinct values
    labels = rng.random(n) < (scores / 25.0)
    if labels.all() or not labels.any():
        labels[0] = not labels[0]
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    exact_row = binary_auc(df, "score", "label").collect()[0]
    binned_row = binary_auc(df, "score", "label", bins=1000).collect()[0]
    assert binned_row.auc == exact_row.auc  # bit-identical
    assert exact_row.auc == pytest.approx(_numpy_auc(scores, labels), abs=1e-12)


def test_binned_deciles_match_exact_when_injective(spark) -> None:
    """score_deciles(bins=large) on a discrete domain reproduces the
    exact value-decile table row-for-row (only the _s grouping key is
    remapped, monotonically)."""
    rng = np.random.default_rng(5)
    n = 500
    scores = rng.integers(0, 30, n).astype(float)
    labels = rng.random(n) < (scores / 40.0)
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    cols = ["decile", "n_rows", "n_pos", "cum_rows", "cum_pos", "lift", "cum_gain"]
    exact = sorted(
        tuple(getattr(r, c) for c in cols)
        for r in score_deciles(df, "score", "label").collect()
    )
    binned = sorted(
        tuple(getattr(r, c) for c in cols)
        for r in score_deciles(df, "score", "label", bins=3000).collect()
    )
    assert binned == exact


def test_binned_deciles_continuous_invariants(spark) -> None:
    """Continuous scores under the binned tier keep the table's
    conservation invariants: counts sum to the input, cumulative
    columns are monotone, final cum_gain is 1."""
    rng = np.random.default_rng(9)
    n = 1500
    scores = rng.normal(0, 1, n)
    labels = rng.random(n) < 0.3
    if not labels.any():
        labels[0] = True
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    rows = sorted(
        score_deciles(df, "score", "label", bins=64).collect(),
        key=lambda r: r.decile,
    )
    assert sum(r.n_rows for r in rows) == n
    assert sum(r.n_pos for r in rows) == int(labels.sum())
    assert rows[-1].cum_rows == n
    assert rows[-1].cum_gain == pytest.approx(1.0)
    cums = [r.cum_rows for r in rows]
    assert cums == sorted(cums)
    # at most `bins`+2 distinct grouping values feed the windows
    assert len(rows) <= 10


def test_explicit_bounds_match_auto_bounds(spark) -> None:
    """``bounds=(lo, hi)`` pinned to the data's actual min/max must
    reproduce the auto-bounds result bit-for-bit (same width_bucket
    grid, one fewer scan) - for both binned AUC and binned deciles."""
    rng = np.random.default_rng(29)
    n = 1500
    scores = rng.normal(0.0, 1.0, n)
    labels = rng.random(n) < 1 / (1 + np.exp(-scores))
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    lo, hi = float(scores.min()), float(scores.max())
    auto = binary_auc(df, "score", "label", bins=64).collect()[0]
    pinned = binary_auc(
        df, "score", "label", bins=64, bounds=(lo, hi)
    ).collect()[0]
    assert (pinned.auc, pinned.n_pos, pinned.n_neg) == (
        auto.auc, auto.n_pos, auto.n_neg,
    )
    d_auto = sorted(
        score_deciles(df, "score", "label", bins=64).collect(),
        key=lambda r: r.decile,
    )
    d_pin = sorted(
        score_deciles(df, "score", "label", bins=64, bounds=(lo, hi)).collect(),
        key=lambda r: r.decile,
    )
    assert [tuple(r) for r in d_pin] == [tuple(r) for r in d_auto]


def test_pinned_bounds_clamp_out_of_range(spark) -> None:
    """A pinned grid fed scores OUTSIDE its domain clamps them to the
    under/overflow buckets instead of erroring - and because
    width_bucket's clamp is monotone, the result equals running the
    same pinned grid on pre-clamped scores."""
    rng = np.random.default_rng(31)
    n = 800
    scores = rng.normal(0.0, 3.0, n)  # spills far past [-1, 1]
    labels = rng.random(n) < 1 / (1 + np.exp(-scores))
    if labels.all() or not labels.any():
        labels[0] = not labels[0]
    df = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(scores, labels)],
        "score double, label boolean",
    )
    row = binary_auc(df, "score", "label", bins=32, bounds=(-1.0, 1.0)).collect()[0]
    assert row.n_pos + row.n_neg == n  # nothing dropped
    assert row.auc is not None and 0.0 <= row.auc <= 1.0
    clamped = np.clip(scores, -1.0, 1.0)
    df2 = spark.createDataFrame(
        [(float(s), bool(l)) for s, l in zip(clamped, labels)],
        "score double, label boolean",
    )
    row2 = binary_auc(df2, "score", "label", bins=32, bounds=(-1.0, 1.0)).collect()[0]
    assert row.auc == row2.auc

    with pytest.raises(ValueError):
        binary_auc(df, "score", "label", bins=32, bounds=(1.0, 1.0)).collect()


def test_bounds_without_bins_raises(spark) -> None:
    """A dangling bounds= (no bins=) must raise, not silently run the
    exact row-scale tier the caller tried to avoid - across the whole
    grid family."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        ks_statistic,
        weighted_median,
    )
    from etl_marketdata_downloader_archived_spark.streaming import (
        start_auc_monitor,
    )

    df = spark.createDataFrame(
        [(0.5, True, 1, "a")], "score double, label boolean, w long, side string"
    )
    with pytest.raises(ValueError, match="requires bins"):
        binary_auc(df, "score", "label", bounds=(0.0, 1.0))
    with pytest.raises(ValueError, match="requires bins"):
        score_deciles(df, "score", "label", bounds=(0.0, 1.0))
    with pytest.raises(ValueError, match="requires bins"):
        ks_statistic(df, "score", "side", bounds=(0.0, 1.0))
    with pytest.raises(ValueError, match="requires bins"):
        weighted_median(df, "score", "w", bounds=(0.0, 1.0))
    with pytest.raises(ValueError, match="requires bins"):
        start_auc_monitor(
            df, "score", "label", checkpoint="/tmp/x",
            on_result=lambda *_: None, bounds=(0.0, 1.0),
        )


def test_weighted_median_fractional_weights_consistent(spark) -> None:
    """Fractional weights truncate to bigint BEFORE the positivity
    filter, so filter and sums agree: sub-1 weights drop with their
    rows, and an all-fractional group disappears instead of emitting
    total_weight=0 with a fabricated median."""
    from etl_marketdata_downloader_archived_spark.operators.profile import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [("frac", 1.0, 0.5), ("frac", 2.0, 0.9),
         ("mix", 1.0, 0.5), ("mix", 2.0, 2.9), ("mix", 3.0, 1.0)],
        "g string, v double, w double",
    )
    got = {
        r.g: (r.total_weight, r.median)
        for r in weighted_median(df, "v", "w", by=["g"]).collect()
    }
    # all-fractional group: every weight truncates to 0 -> absent
    assert "frac" not in got
    # 2.9 truncates to 2; 0.5 drops -> expanded [2,2,3], median 2
    assert got["mix"] == (3, 2.0)
