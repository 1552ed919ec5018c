"""Streaming drift monitor: per-micro-batch binned KS against a fixed
reference - stream-vs-batch twin equality, drift alarm firing, and the
clamped-edge-bin behavior for range-shifted feeds."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.operators.profile import ks_statistic
from etl_marketdata_downloader_archived_spark.streaming import (
    batch_ks,
    reference_counts,
    start_drift_monitor,
)


def _write_batch(dirpath, name, rows):
    lines = [json.dumps({"grp": g, "v": v}) for g, v in rows]
    (dirpath / name).write_text("\n".join(lines))


@pytest.fixture()
def ref_df(spark):
    rng = np.random.default_rng(2)
    rows = [("a", float(v)) for v in rng.normal(10, 2, 600)]
    rows += [("b", float(v)) for v in rng.normal(50, 5, 600)]
    return spark.createDataFrame(rows, "grp string, v double")


def test_batch_ks_matches_ks_statistic_binned(spark, ref_df) -> None:
    """batch_ks (cached-reference path) == ks_statistic(bins=...) fed
    the same two samples row-level, when the bin grid coincides -
    pin by using a batch inside the reference range."""
    rng = np.random.default_rng(7)
    batch = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(11, 2, 400)],
        "grp string, v double",
    )
    ref_a = ref_df.filter(F.col("grp") == "a")
    ref, lo, hi = reference_counts(ref_a, "v", ["grp"], bins=32)
    got = batch_ks(batch, ref, lo, hi, "v", ["grp"], bins=32).collect()[0]

    # row-level twin: same grid, same clamp, via ks_statistic on the
    # manually-bucketed union
    bucket = F.least(
        F.greatest(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(hi - lo) * 32), F.lit(0)
        ),
        F.lit(31),
    ).cast("int")
    u = ref_a.select("grp", bucket.alias("bv"), F.lit("a").alias("side")).unionByName(
        batch.select("grp", bucket.alias("bv"), F.lit("b").alias("side"))
    )
    want = ks_statistic(u, "bv", "side", by=["grp"]).collect()[0]
    assert got.ks == pytest.approx(want.ks, abs=1e-12)
    assert (got.n_a, got.n_b) == (want.n_a, want.n_b)
    ref.unpersist()


def test_monitor_stream_equals_batch_and_alarms(spark, ref_df, tmp_path) -> None:
    """Two micro-batches through a real file stream: batch 0 drawn
    from the reference distribution (no drift), batch 1 shifted (must
    alarm). Each streamed result must equal the same computation run
    in batch."""
    rng = np.random.default_rng(3)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    same = [("a", float(v)) for v in rng.normal(10, 2, 300)]
    same += [("b", float(v)) for v in rng.normal(50, 5, 300)]
    shifted = [("a", float(v)) for v in rng.normal(20, 2, 300)]
    shifted += [("b", float(v)) for v in rng.normal(50, 5, 300)]

    results: dict[int, dict] = {}

    def on_result(df, batch_id):
        rows = {r.grp: r for r in df.collect()}
        if rows:
            results[max(results, default=-1) + 1] = rows

    stream = (
        spark.readStream.schema("grp string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    # both files present before start; maxFilesPerTrigger=1 splits
    # them into two ordered micro-batches (mtimes pinned apart so the
    # order cannot tie under a loaded test run)
    _write_batch(in_dir, "b0.json", same)
    _write_batch(in_dir, "b1.json", shifted)
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(in_dir / "b0.json", (now - 10, now - 10))
    _os.utime(in_dir / "b1.json", (now, now))
    q = start_drift_monitor(
        stream,
        ref_df,
        "v",
        checkpoint=str(tmp_path / "ckpt"),
        on_result=on_result,
        by=["grp"],
        bins=64,
        threshold=0.2,
    )
    q.awaitTermination(120)

    assert len(results) == 2
    # batch 0: same distribution -> small ks, no alarm
    assert results[0]["a"].ks < 0.15 and not results[0]["a"].is_drift
    assert results[0]["b"].ks < 0.15 and not results[0]["b"].is_drift
    # batch 1: group a shifted by 5 sigma -> alarm; group b clean
    assert results[1]["a"].ks > 0.5 and results[1]["a"].is_drift
    assert not results[1]["b"].is_drift

    # stream-vs-batch twin: recompute batch 1's panel in batch
    ref, lo, hi = reference_counts(ref_df, "v", ["grp"], bins=64)
    bdf = spark.createDataFrame(shifted, "grp string, v double")
    want = {
        r.grp: r for r in batch_ks(bdf, ref, lo, hi, "v", ["grp"], 64).collect()
    }
    assert results[1]["a"].ks == pytest.approx(want["a"].ks, abs=1e-12)
    assert results[1]["b"].ks == pytest.approx(want["b"].ks, abs=1e-12)
    ref.unpersist()


def test_out_of_range_batch_clamps_to_edge_bin(spark, ref_df) -> None:
    """A feed whose values left the reference range entirely must max
    out the statistic (all mass in the clamped edge bin), not crash
    or silently bin off-grid."""
    batch = spark.createDataFrame(
        [("a", 1e6)] * 50, "grp string, v double"
    )
    ref, lo, hi = reference_counts(
        ref_df.filter(F.col("grp") == "a"), "v", ["grp"], bins=16
    )
    got = batch_ks(batch, ref, lo, hi, "v", ["grp"], 16).collect()[0]
    # sup gap = reference CDF just below the top bin (batch has zero
    # mass there); only the reference's own top-bin mass keeps it < 1
    assert got.ks > 0.9
    ref.unpersist()


def test_ks_empty_side_is_null_not_drift(spark) -> None:
    """A group present in only one sample must report NULL ks (NaN
    sorts above every double in Spark, so the unguarded 0/0 would
    read as max-severity drift)."""
    rows = [(v, "a") for v in range(5)]  # no 'b' rows at all
    df = spark.createDataFrame(rows, "v int, side string")
    got = ks_statistic(df, "v", "side").collect()[0]
    assert got.ks is None
    assert (got.n_a, got.n_b) == (5, 0)


def test_monitor_restart_resumes_from_checkpoint(spark, ref_df, tmp_path) -> None:
    """Kill-and-restart with the same checkpoint: the already-processed
    file is NOT re-emitted (offsets are the ack), the new file is."""
    rng = np.random.default_rng(4)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    seen = []

    def on_result(df, batch_id):
        seen.append({r.grp: r.n_b for r in df.collect()})

    def run_once():
        stream = (
            spark.readStream.schema("grp string, v double").json(str(in_dir))
        )
        q = start_drift_monitor(
            stream, ref_df, "v", checkpoint=ckpt,
            on_result=on_result, by=["grp"], bins=32,
        )
        q.awaitTermination(120)

    _write_batch(
        in_dir, "b0.json",
        [("a", float(v)) for v in rng.normal(10, 2, 100)],
    )
    run_once()
    assert len(seen) == 1 and seen[0]["a"] == 100

    _write_batch(
        in_dir, "b1.json",
        [("a", float(v)) for v in rng.normal(10, 2, 50)],
    )
    run_once()
    # exactly one new result, sized to the NEW file only
    assert len(seen) == 2 and seen[1]["a"] == 50


def test_one_sided_groups_alarm_explicitly(spark, ref_df, tmp_path) -> None:
    """The most severe feed failures are STRUCTURAL, not distributional:
    a group in the batch with no reference (new stratum) and a
    reference group the batch went silent on both produce a one-sided
    ECDF whose ks is NULL - the monitor must surface status != 'ok'
    and is_drift = true, never a NULL alarm."""
    rng = np.random.default_rng(11)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch: group a normal, group c brand new; group b absent
    rows = [("a", float(v)) for v in rng.normal(10, 2, 200)]
    rows += [("c", float(v)) for v in rng.normal(5, 1, 200)]
    _write_batch(in_dir, "b0.json", rows)

    results: dict[str, object] = {}

    def on_result(df, batch_id):
        for r in df.collect():
            results[r.grp] = r

    stream = (
        spark.readStream.schema("grp string, v double")
        .json(str(in_dir))
    )
    q = start_drift_monitor(
        stream,
        ref_df,
        "v",
        checkpoint=str(tmp_path / "ckpt"),
        on_result=on_result,
        by=["grp"],
        bins=32,
        threshold=0.2,
    )
    q.awaitTermination(120)

    assert set(results) == {"a", "b", "c"}
    assert results["a"].status == "ok" and not results["a"].is_drift
    # reference group went silent in the batch
    assert results["b"].status == "batch_silent"
    assert results["b"].is_drift is True and results["b"].n_b == 0
    # stratum with no reference distribution
    assert results["c"].status == "new_group"
    assert results["c"].is_drift is True and results["c"].n_a == 0


def test_reference_with_no_values_fails_fast(spark) -> None:
    """An all-NULL (or empty) reference is a configuration error: the
    monitor must refuse to start instead of emitting NULL ks rows."""
    empty = spark.createDataFrame(
        [("a", None)], "grp string, v double"
    )
    with pytest.raises(ValueError, match="no non-null"):
        reference_counts(empty, "v", ["grp"], bins=8)


def test_auc_monitor_stream_equals_batch_and_alarms(spark, tmp_path) -> None:
    """Streaming AUC monitor: batch 0 carries a well-ranking score
    (no alarm), batch 1 an inverted score (alarm); each streamed AUC
    equals binary_auc run in batch on the same rows, and a degenerate
    one-class group reports status instead of a NULL alarm."""
    import json as _json

    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.evaluation import (
        binary_auc,
    )
    from etl_marketdata_downloader_archived_spark.streaming import (
        start_auc_monitor,
    )

    rng = np.random.default_rng(17)
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def page(name, rows):
        lines = [
            _json.dumps({"g": g, "score": s, "label": l}) for g, s, l in rows
        ]
        (in_dir / name).write_text("\n".join(lines))

    def sample(invert):
        out = []
        for _ in range(200):
            s = float(np.round(rng.uniform(0, 10), 0))
            p = s / 12.0
            lab = bool(rng.random() < (1 - p if invert else p))
            out.append(("m", s, lab))
        return out

    good = sample(False) + [("only_pos", 1.0, True)] * 40
    bad = sample(True) + [("only_pos", 1.0, True)] * 40
    # a group whose label join went stale: rows arrive, labels NULL
    good += [("stale", float(i), None) for i in range(35)]
    bad += [("stale", float(i), None) for i in range(35)]
    page("b0.json", good)
    page("b1.json", bad)
    # the file source orders same-batch-limit discovery by mod time;
    # under a loaded test run both writes can land in one clock tick -
    # pin distinct mtimes so the two micro-batches keep their order
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(in_dir / "b0.json", (now - 10, now - 10))
    _os.utime(in_dir / "b1.json", (now, now))

    results: dict[int, dict] = {}

    def on_result(df, batch_id):
        rows = {r.g: r for r in df.collect()}
        if rows:
            results[max(results, default=-1) + 1] = rows

    stream = (
        spark.readStream.schema("g string, score double, label boolean")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = start_auc_monitor(
        stream,
        "score",
        "label",
        checkpoint=str(tmp_path / "ckpt"),
        on_result=on_result,
        by=["g"],
        min_auc=0.6,
        min_rows=30,
    )
    q.awaitTermination(120)

    assert len(results) == 2
    assert results[0]["m"].status == "ok" and not results[0]["m"].is_alarm
    assert results[0]["m"].auc > 0.7
    assert results[1]["m"].status == "ok" and results[1]["m"].is_alarm
    assert results[1]["m"].auc < 0.4
    # one-class group: status, never a NULL alarm
    assert results[0]["only_pos"].status == "one_class"
    assert results[0]["only_pos"].is_alarm is False
    # all-labels-dropped group: present with status, never absent
    assert results[0]["stale"].status == "no_labels"
    assert results[0]["stale"].n_rows == 35
    assert (results[0]["stale"].n_pos, results[0]["stale"].n_neg) == (0, 0)
    assert results[0]["stale"].is_alarm is False

    # stream == batch twin on batch 0's rows
    bdf = spark.createDataFrame(good, "g string, score double, label boolean")
    want = {r.g: r for r in binary_auc(bdf, "score", "label", by=["g"]).collect()}
    assert results[0]["m"].auc == want["m"].auc
    assert (results[0]["m"].n_pos, results[0]["m"].n_neg) == (
        want["m"].n_pos, want["m"].n_neg
    )


def test_auc_monitor_binned_pinned_grid(spark, tmp_path) -> None:
    """Binned streaming AUC monitor with a PINNED grid: continuous
    float scores (the distinct~rows case the bins= tier exists for),
    batch 0 in-domain, batch 1 deliberately out of the pinned bounds.
    Streamed binned AUC == binary_auc(bins=, bounds=) run in batch on
    the same rows (binned stream == binned batch), and the
    out-of-range batch clamps to the edge buckets instead of erroring
    or dropping rows."""
    import json as _json
    import os as _os
    import time as _time

    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.evaluation import (
        binary_auc,
    )
    from etl_marketdata_downloader_archived_spark.streaming import (
        start_auc_monitor,
    )

    rng = np.random.default_rng(23)
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def sample(scale):
        out = []
        for _ in range(150):
            s = float(rng.normal(0.0, scale))  # continuous: all distinct
            lab = bool(rng.random() < 1 / (1 + np.exp(-s)))
            out.append(("m", s, lab))
        return out

    b0 = sample(1.0)
    b1 = sample(5.0)  # spills far outside the pinned [-3, 3] domain
    for name, rows in (("b0.json", b0), ("b1.json", b1)):
        (in_dir / name).write_text(
            "\n".join(
                _json.dumps({"g": g, "score": s, "label": l})
                for g, s, l in rows
            )
        )
    now = _time.time()
    _os.utime(in_dir / "b0.json", (now - 10, now - 10))
    _os.utime(in_dir / "b1.json", (now, now))

    results: dict[int, dict] = {}

    def on_result(df, batch_id):
        rows = {r.g: r for r in df.collect()}
        if rows:
            results[max(results, default=-1) + 1] = rows

    stream = (
        spark.readStream.schema("g string, score double, label boolean")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = start_auc_monitor(
        stream,
        "score",
        "label",
        checkpoint=str(tmp_path / "ckpt"),
        on_result=on_result,
        by=["g"],
        min_rows=30,
        bins=64,
        bounds=(-3.0, 3.0),
    )
    q.awaitTermination(120)

    assert len(results) == 2
    for i, rows in ((0, b0), (1, b1)):
        got = results[i]["m"]
        assert got.status == "ok"
        bdf = spark.createDataFrame(
            rows, "g string, score double, label boolean"
        )
        want = binary_auc(
            bdf, "score", "label", by=["g"], bins=64, bounds=(-3.0, 3.0)
        ).collect()[0]
        assert got.auc == want.auc  # binned stream == binned batch
        assert (got.n_pos, got.n_neg) == (want.n_pos, want.n_neg)
    # out-of-range batch: every labeled row still counted (clamped,
    # not dropped), score still ranks outcomes
    assert results[1]["m"].n_pos + results[1]["m"].n_neg == 150
    assert results[1]["m"].auc > 0.6


def test_ks_explicit_bounds_match_auto(spark) -> None:
    """ks_statistic(bins=, bounds=) pinned at the data's min/max ==
    auto bounds bit-for-bit; a narrower pinned grid clamps instead of
    dropping mass (n_a/n_b unchanged)."""
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.profile import (
        ks_statistic,
    )

    rng = np.random.default_rng(41)
    rows = [
        ("a", float(v)) for v in rng.normal(0.0, 1.0, 400)
    ] + [("b", float(v)) for v in rng.normal(0.5, 1.0, 400)]
    df = spark.createDataFrame(rows, "side string, v double")
    vals = np.array([v for _, v in rows])
    lo, hi = float(vals.min()), float(vals.max())
    auto = ks_statistic(df, "v", "side", bins=64).collect()[0]
    pinned = ks_statistic(df, "v", "side", bins=64, bounds=(lo, hi)).collect()[0]
    assert (pinned.ks, pinned.n_a, pinned.n_b) == (auto.ks, auto.n_a, auto.n_b)
    narrow = ks_statistic(df, "v", "side", bins=64, bounds=(-0.5, 0.5)).collect()[0]
    assert (narrow.n_a, narrow.n_b) == (400, 400)
    assert 0.0 <= narrow.ks <= 1.0


def test_cusum_changepoint_vs_numpy(spark) -> None:
    """cusum_changepoint's scaled-integer argmax vs numpy's float
    CUSUM peak, on a series with a deliberate level shift and on
    random series (argmax location + scaled peak/n equality)."""
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.profile import (
        cusum_changepoint,
    )

    rng = np.random.default_rng(43)
    series = {
        "shift": np.concatenate(
            [rng.integers(90, 110, 12), rng.integers(190, 210, 12)]
        ),
        "flat": rng.integers(100, 101, 10),
        "rand": rng.integers(0, 1000, 25),
    }
    rows = [
        (g, i, int(x))
        for g, xs in series.items()
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, b long, x long")
    got = {
        r.g: (r.n_buckets, r.total, r.change_bucket, r.peak_dev)
        for r in cusum_changepoint(df, ["g"], "b", "x").collect()
    }
    for g, xs in series.items():
        n = len(xs)
        cum = np.cumsum(xs)
        dev = np.abs(n * cum - np.arange(1, n + 1) * cum[-1])
        k = int(np.argmax(dev))  # numpy argmax = first max = earliest
        assert got[g] == (n, int(cum[-1]), k, int(dev[k]))
    # the shift series must locate the boundary
    assert got["shift"][2] == 11


def test_percentile_monitor_stream_equals_batch(spark, tmp_path) -> None:
    """Streaming percentile monitor: each batch's panel == the batch
    exact_percentiles over the same rows (pinned binned grid), the
    alarm fires exactly when the watched percentile crosses the
    budget, and an all-NULL group reports 'no_values' instead of
    vanishing."""
    import json as _json
    import os as _os
    import time as _time

    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.profile import (
        exact_percentiles,
    )
    from etl_marketdata_downloader_archived_spark.streaming import (
        start_percentile_monitor,
    )

    rng = np.random.default_rng(47)
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def sample(scale):
        return [
            ("api", float(v))
            for v in rng.gamma(2.0, scale, 200)  # latency-shaped
        ]

    b0 = sample(20.0) + [("dead", None)] * 40
    b1 = sample(90.0) + [("dead", None)] * 40  # slow batch -> alarm
    for name, rows in (("b0.json", b0), ("b1.json", b1)):
        (in_dir / name).write_text(
            "\n".join(
                _json.dumps({"g": g, "ms": v}) for g, v in rows
            )
        )
    now = _time.time()
    _os.utime(in_dir / "b0.json", (now - 10, now - 10))
    _os.utime(in_dir / "b1.json", (now, now))

    results: dict[int, dict] = {}

    def on_result(df, batch_id):
        rows = {r.g: r for r in df.collect()}
        if rows:
            results[max(results, default=-1) + 1] = rows

    stream = (
        spark.readStream.schema("g string, ms double")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = start_percentile_monitor(
        stream,
        "ms",
        checkpoint=str(tmp_path / "ckpt"),
        on_result=on_result,
        by=["g"],
        percentiles=(50, 99),
        alarm=(99, 400.0),
        min_rows=30,
        bins=128,
        bounds=(0.0, 1000.0),
    )
    q.awaitTermination(120)

    assert len(results) == 2
    for i, rows in ((0, b0), (1, b1)):
        got = results[i]["api"]
        assert got.status == "ok"
        bdf = spark.createDataFrame(rows, "g string, ms double")
        want = exact_percentiles(
            bdf, "ms", by=["g"], percentiles=(50, 99),
            bins=128, bounds=(0.0, 1000.0),
        ).collect()
        want = {r.g: r for r in want}["api"]
        assert (got.n, got.p50, got.p99) == (want.n, want.p50, want.p99)
    assert results[0]["api"].is_alarm is False
    assert results[1]["api"].is_alarm is True  # slow batch crossed 400ms
    # all-NULL group: present with status, never absent
    assert results[0]["dead"].status == "no_values"
    assert results[0]["dead"].n_rows == 40
    assert results[0]["dead"].is_alarm is False


def test_exact_percentiles_vs_numpy(spark) -> None:
    """exact_percentiles (exact + binned tiers) vs numpy positional
    selection; binned == exact when injective, bin-width bound on
    continuous data, result always an observed value."""
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.profile import (
        exact_percentiles,
    )

    rng = np.random.default_rng(53)
    vals = rng.integers(0, 40, 500).astype(float)
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    row = exact_percentiles(df, "v", by=["g"], percentiles=(50, 90, 99)).collect()[0]
    s = np.sort(vals)
    for p, gotv in ((50, row.p50), (90, row.p90), (99, row.p99)):
        k = -(-len(s) * p // 100)  # ceil
        assert gotv == s[k - 1]
    binned = exact_percentiles(
        df, "v", by=["g"], percentiles=(50, 90, 99), bins=1000
    ).collect()[0]
    assert (binned.p50, binned.p90, binned.p99) == (row.p50, row.p90, row.p99)

    cont = rng.normal(0, 1, 2000)
    dfc = spark.createDataFrame(
        [("g", float(v)) for v in cont], "g string, v double"
    )
    ex = exact_percentiles(dfc, "v", by=["g"], percentiles=(90,)).collect()[0]
    bn = exact_percentiles(
        dfc, "v", by=["g"], percentiles=(90,), bins=64
    ).collect()[0]
    width = (cont.max() - cont.min()) / 64
    assert abs(bn.p90 - ex.p90) <= width + 1e-12
    assert bn.p90 in {float(v) for v in cont}  # observed value
