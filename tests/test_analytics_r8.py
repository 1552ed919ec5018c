"""Independent differentials for the round-8 battery - python/numpy
replays from the RAW parquet rows, so a formula that is wrong the
same way on both SQL engines still fails here (the parity harness
cannot catch those)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.io import load_table


from _helpers import half_up as _half_up  # noqa: E402


def test_markov_transitions_vs_python(spark, sf_dir) -> None:
    """Transition counts/probabilities vs a dict replay over
    (ts, event_id)-sorted per-user streams; per-from probabilities
    sum to exactly 1 (n_from comes from the pair table)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        markov_transitions,
    )

    got = {
        (r.from_event, r.to_event): (r.n_pair, r.n_from, r.p)
        for r in markov_transitions(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams: dict = defaultdict(list)
    for r in rows:
        streams[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs: Counter = Counter()
    for evs in streams.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    outs: Counter = Counter()
    for (a, _b), n in pairs.items():
        outs[a] += n
    want = {
        (a, b): (n, outs[a], n / outs[a]) for (a, b), n in pairs.items()
    }
    assert got == want
    by_from: dict = defaultdict(float)
    for (a, _b), (_n, _nf, p) in got.items():
        by_from[a] += p
    for a, s in by_from.items():
        assert abs(s - 1.0) < 1e-9


def test_seasonal_deviation_vs_python(spark, sf_dir) -> None:
    """Hour-grid day-back comparison vs a dict replay; rows exist
    exactly where the previous-day hour exists, and the integer
    anomaly flag matches 2*|d| >= prev."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        seasonal_deviation,
    )

    got = {
        (r.event_type, r.hour_ts): (r.n, r.n_prev, r.deviation, r.is_anomaly)
        for r in seasonal_deviation(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .collect()
    )
    grid: Counter = Counter((r.event_type, r.h) for r in rows)
    want = {}
    from datetime import timedelta

    day = timedelta(hours=24)
    for (et, h), n in grid.items():
        prev = grid.get((et, h - day))
        if prev is not None:
            want[(et, h)] = (
                n,
                prev,
                (n - prev) / prev,
                2 * abs(n - prev) >= prev,
            )
    assert got == want


def test_pareto_abc_vs_python(spark, sf_dir) -> None:
    """ABC classes vs a full python replay of the descending
    cumulative integer-threshold sweep; classes partition the brands
    and A-brands carry <= 80% cumulative revenue each."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        pareto_abc,
    )

    got = {
        r.brand: (r.revenue_c, r.cum_share, r.abc_class)
        for r in pareto_abc(spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .collect()
    )
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    ).collect()
    brand = {r.p_partkey: r.p_brand for r in pt}
    rev: Counter = Counter()
    for r in li:
        rev[brand[r.l_partkey]] += _half_up(
            r.l_extendedprice * (1 - r.l_discount) * 100
        )
    tot = sum(rev.values())
    cum = 0
    want = {}
    for b in sorted(rev, key=lambda b: (-rev[b], b)):
        cum += rev[b]
        cls = "A" if cum * 5 <= tot * 4 else ("B" if cum * 20 <= tot * 19 else "C")
        want[b] = (rev[b], cum / tot, cls)
    assert got == want


def test_order_reconciliation_vs_python(spark, sf_dir) -> None:
    """Reconciliation cells vs a python replay of the cent-exact
    order-vs-lines comparison, including the no-lines bucket."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        order_reconciliation,
    )

    got = {
        r.o_orderstatus: (
            r.n_orders,
            r.n_no_lines,
            r.n_mismatched,
            r.max_abs_diff_c,
            r.total_abs_diff_c,
        )
        for r in order_reconciliation(spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
        .collect()
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    )
    lines: dict = defaultdict(int)
    for r in li:
        lines[r.l_orderkey] += _half_up(
            r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax) * 100
        )
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in o:
        a = agg[r.o_orderstatus]
        a[0] += 1
        if r.o_orderkey not in lines:
            a[1] += 1
            continue
        d = abs(_half_up(r.o_totalprice * 100) - lines[r.o_orderkey])
        if d > 5:
            a[2] += 1
        a[3] = max(a[3], d)
        a[4] += d
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_boxplot_panel_vs_python(spark, sf_dir) -> None:
    """Quartiles and Tukey-fence outlier counts vs a sorted-list
    positional replay (ceil(p*n/100)-th element, integer fences)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        boxplot_panel,
    )

    got = {
        r.event_type: (
            r.n,
            r.p25_cents,
            r.p50_cents,
            r.p75_cents,
            r.iqr_cents,
            r.n_low_outliers,
            r.n_high_outliers,
        )
        for r in boxplot_panel(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    vals: dict = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(_half_up(r.value * 100))
    want = {}
    for et, vs in vals.items():
        vs.sort()
        n = len(vs)

        def pick(p):
            return vs[-(-n * p // 100) - 1]

        p25, p50, p75 = pick(25), pick(50), pick(75)
        iqr = p75 - p25
        lo = sum(1 for v in vs if 2 * v < 2 * p25 - 3 * iqr)
        hi = sum(1 for v in vs if 2 * v > 2 * p75 + 3 * iqr)
        want[et] = (n, p25, p50, p75, iqr, lo, hi)
    assert got == want


def test_abtest_conversion_vs_python(spark, sf_dir) -> None:
    """Arm assignment replayed through hashlib.md5 and the pooled
    two-proportion z recomputed from scratch - the full audit chain
    outside any SQL engine."""
    import hashlib

    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        abtest_conversion,
    )

    row = abtest_conversion(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .collect()
    )
    conv: dict = {}
    for r in rows:
        good = (
            r.event_type == "purchase"
            and r.value is not None
            and r.value >= 150
        )
        conv[r.user_id] = conv.get(r.user_id, False) or good
    n = {"A": 0, "B": 0}
    c = {"A": 0, "B": 0}
    for uid, did in conv.items():
        hx = hashlib.md5(f"42:{uid}".encode()).hexdigest()
        arm = "A" if int(hx[:8], 16) % 10_000 < 5000 else "B"
        n[arm] += 1
        c[arm] += int(did)
    assert (row.n_a, row.c_a, row.n_b, row.c_b) == (
        n["A"],
        c["A"],
        n["B"],
        c["B"],
    )
    assert row.rate_a == c["A"] / n["A"]
    assert row.rate_b == c["B"] / n["B"]
    p = (c["A"] + c["B"]) / (n["A"] + n["B"])
    z = (c["A"] / n["A"] - c["B"] / n["B"]) / math.sqrt(
        p * (1 - p) * (1.0 / n["A"] + 1.0 / n["B"])
    )
    assert abs(row.z - z) < 1e-12


def test_rfm_segments_vs_python(spark, sf_dir) -> None:
    """27-cell RFM grid vs a full python replay of all three tercile
    maps (incl. the width_bucket monetary grid); customer counts
    conserve."""
    from datetime import date

    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        rfm_segments,
    )

    got = {
        (r.r_score, r.f_score, r.m_score): (
            r.n_customers,
            r.spend_sum_c,
            r.avg_spend,
        )
        for r in rfm_segments(spark, sf_dir).collect()
    }
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    asof = date(2001, 12, 31)
    per: dict = {}
    for r in o:
        last, cnt, sp = per.get(r.o_custkey, (date(1900, 1, 1), 0, 0))
        d = r.o_orderdate.date()
        per[r.o_custkey] = (
            max(last, d),
            cnt + 1,
            sp + _half_up(r.o_totalprice * 100),
        )
    rec = {k: (asof - v[0]).days for k, v in per.items()}
    frq = {k: v[1] for k, v in per.items()}
    mon = {k: v[2] for k, v in per.items()}
    lo, hi = float(min(mon.values())), float(max(mon.values()))
    mbkt = {
        k: (65 if float(v) >= hi else math.floor(
            64.0 * (float(v) - lo) / (hi - lo) + 1))
        for k, v in mon.items()
    }

    def tercile(values: dict) -> dict:
        cnt = Counter(values.values())
        tot = sum(cnt.values())
        cum = 0
        score = {}
        for v in sorted(cnt):
            cum += cnt[v]
            score[v] = math.ceil(cum * 3 / tot)
        return {k: score[v] for k, v in values.items()}

    rs, fs, ms = tercile(rec), tercile(frq), tercile(mbkt)
    agg: dict = defaultdict(lambda: [0, 0])
    for k in per:
        a = agg[(rs[k], fs[k], ms[k])]
        a[0] += 1
        a[1] += mon[k]
    want = {
        k: (n, s, s / n / 100.0) for k, (n, s) in agg.items()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(per)


def test_tfidf_topk_vs_python(spark, sf_dir) -> None:
    """Per-doc top-3 TF-IDF terms vs a regex+Counter replay with the
    identical rounded score and (score desc, term) tie order."""
    import re

    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        tfidf_topk,
    )

    got = defaultdict(list)
    for r in tfidf_topk(spark, sf_dir).collect():
        got[r.doc_id].append((r.rn, r.term, r.tf, r.df, r.tfidf))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    tf: dict = {}
    df: Counter = Counter()
    for r in docs:
        toks = [t for t in re.split("[^a-z]+", r.text.lower()) if t]
        if not toks:
            continue
        tf[r.doc_id] = Counter(toks)
        for t in set(toks):
            df[t] += 1
    n_docs = len(tf)
    for doc_id, cnt in tf.items():
        scored = sorted(
            (
                (-round(c * math.log(n_docs / df[t]), 6), t, c)
                for t, c in cnt.items()
            )
        )[:3]
        want = [
            (i + 1, t, c, df[t], -s) for i, (s, t, c) in enumerate(scored)
        ]
        assert sorted(got[doc_id]) == want, doc_id


def test_conversion_latency_vs_python(spark, sf_dir) -> None:
    """Time-to-convert panel vs a pure-python replay: first signup,
    first at-or-after purchase, integer-DIV week/second buckets,
    positional p50/p90 - plus the zero-conversion-cohort row rule."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        conversion_latency,
    )

    got = {
        r.signup_week: (
            r.n_signups, r.n_converted, r.conv_rate, r.p50_s, r.p90_s
        )
        for r in conversion_latency(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    signup: dict = {}
    purchases: dict = defaultdict(list)
    for r in rows:
        if r.event_type == "signup":
            signup[r.user_id] = min(signup.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            purchases[r.user_id].append(r.us)
    cohorts: dict = defaultdict(lambda: [0, []])
    for uid, s_us in signup.items():
        wk = s_us // 604800000000
        cohorts[wk][0] += 1
        after = [p for p in purchases.get(uid, []) if p >= s_us]
        if after:
            cohorts[wk][1].append((min(after) - s_us) // 1000000)
    want = {}
    for wk, (n_s, lats) in cohorts.items():
        if not lats:
            want[wk] = (n_s, 0, 0.0, None, None)
            continue
        lats.sort()
        n = len(lats)

        def pick(p):
            return lats[-(-n * p // 100) - 1]

        want[wk] = (n_s, n, n / n_s, pick(50), pick(90))
    assert got == want


def test_cohort_ltv_triangle_vs_python(spark, sf_dir) -> None:
    """Development triangle vs a dict replay: first-order-week
    cohorts, integer-DIV week buckets, cumulative development along
    the age axis, per-customer LTV division - plus triangle
    invariants (age 0 exists for every cohort and carries >= 1
    active customer; cumulative is non-decreasing)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        cohort_ltv_triangle,
    )

    got = {
        (r.cohort_wk, r.age_wk): (
            r.n_active, r.revenue_c, r.cum_revenue_c,
            r.cum_ltv_per_customer,
        )
        for r in cohort_ltv_triangle(spark, sf_dir).collect()
    }
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp))"
                " DIV 604800000000"
            ).alias("wk"),
            "o_totalprice",
        )
        .collect()
    )
    first: dict = {}
    for r in o:
        first[r.o_custkey] = min(first.get(r.o_custkey, r.wk), r.wk)
    cohort_n: Counter = Counter(first.values())
    cells: dict = defaultdict(lambda: [set(), 0])
    for r in o:
        c = first[r.o_custkey]
        cell = cells[(c, r.wk - c)]
        cell[0].add(r.o_custkey)
        cell[1] += _half_up(r.o_totalprice * 100)
    want = {}
    for c in cohort_n:
        cum = 0
        for (cc, age) in sorted(k for k in cells if k[0] == c):
            users, rev = cells[(cc, age)]
            cum += rev
            want[(c, age)] = (
                len(users), rev, cum, cum / cohort_n[c] / 100.0
            )
    assert got == want
    for c, n in cohort_n.items():
        assert (c, 0) in got and got[(c, 0)][0] >= 1
        ages = sorted(a for (cc, a) in got if cc == c)
        cums = [got[(c, a)][2] for a in ages]
        assert cums == sorted(cums)


def test_share_shift_vs_python(spark, sf_dir) -> None:
    """Share-shift panel vs a dict replay; the integer
    cross-multiplied 'gained' flag must agree with exact Fraction
    share comparison (no float threshold), and deltas sum to ~0."""
    from fractions import Fraction

    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        share_shift,
    )

    got = {
        r.nation: (r.rev0_c, r.rev1_c, r.share0, r.share1, r.share_delta,
                   r.gained)
        for r in share_shift(spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    )
    o = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .collect()
    }
    from datetime import datetime

    cut = datetime(1998, 1, 1)
    rev: dict = defaultdict(lambda: [0, 0])
    for r in li:
        p = 0 if o[r.l_orderkey] < cut else 1
        rev[sup[r.l_suppkey]][p] += _half_up(
            r.l_extendedprice * (1 - r.l_discount) * 100
        )
    tot0 = sum(v[0] for v in rev.values())
    tot1 = sum(v[1] for v in rev.values())
    assert set(got) == set(rev)
    for n, (r0, r1) in rev.items():
        g = got[n]
        assert (g[0], g[1]) == (r0, r1)
        assert g[2] == r0 / tot0 and g[3] == r1 / tot1
        assert g[5] == (
            Fraction(r1, tot1) > Fraction(r0, tot0)
        )
    assert abs(sum(g[4] for g in got.values())) < 1e-9


def test_fd_violations_detects_and_clears(spark) -> None:
    """FD checker: a key with two dependent values (or a value + a
    NULL - two verdicts about the same fact) violates; single-valued
    keys - including all-NULL ones - do not; composite determinants
    work; empty result when the FD holds."""
    from etl_marketdata_downloader_archived_spark.operators.quality import (
        fd_violations,
    )

    rows = [
        (1, "a", "x"), (1, "a", "x"),          # clean key
        (2, "b", "x"), (2, "c", "x"),          # violation: b vs c
        (3, None, "x"), (3, None, "x"),        # all-NULL: single state
        (4, "d", "x"), (4, None, "x"),         # value + NULL: violation
    ]
    df = spark.createDataFrame(rows, ["k", "v", "z"])
    got = {r.k: (r.n_distinct, r.n_rows, r.witness_min, r.witness_max)
           for r in fd_violations(df, "k", "v").collect()}
    assert set(got) == {2, 4}
    assert got[2] == (2, 2, "b", "c")
    assert got[4] == (2, 2, "d", "d")  # NULL folded in via the flag
    # composite determinant: (k, z) -> v has the same violations
    assert {
        r.k for r in fd_violations(df, ["k", "z"], "v").collect()
    } == {2, 4}
    # an FD that holds -> empty
    assert fd_violations(df, "k", "z").count() == 0


def test_rising_parts_vs_python(spark, sf_dir) -> None:
    """Week-over-week risers vs a dict replay: integer-DIV weeks,
    zero-filled absentees, integer delta order with the partkey
    tie-break, riser-only filter."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r8 import (
        rising_parts,
    )

    got = [
        (r.l_partkey, r.n_cur, r.n_prev, r.delta)
        for r in rising_parts(spark, sf_dir).collect()
    ]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_orderkey")
        .collect()
    )
    o = {
        r.o_orderkey: r.wk
        for r in load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp))"
                " DIV 604800000000"
            ).alias("wk"),
        )
        .collect()
    }
    counts: Counter = Counter()
    for r in li:
        counts[(r.l_partkey, o[r.l_orderkey])] += 1
    last = max(wk for _p, wk in counts)
    parts = {p for p, _wk in counts}
    rows = []
    for p in parts:
        cur = counts.get((p, last), 0)
        prev = counts.get((p, last - 1), 0)
        if cur > prev:
            rows.append((p, cur, prev, cur - prev))
    rows.sort(key=lambda t: (-t[3], t[0]))
    assert got == rows[:20]
