"""Round-9 analytics: independent python differentials for the
parity-verified queries in plans/analytics_r9.py - parity proves
Spark==DuckDB, these replays prove the FORMULA is right (a wrong
formula expressed identically on both engines passes parity)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.io import load_table
from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
    above_average_orders,
    activity_heatmap,
    cohort_new_returning,
    flesch_readability,
    interarrival_hist,
    part_staleness,
    reconcile_worklist,
    return_rate_trend,
    same_day_orders,
    seasonality_index,
    xyz_classification,
)


from _helpers import half_up as _half_up  # noqa: E402


def test_reconcile_worklist_vs_python(spark, sf_dir) -> None:
    """Worklist rows vs a dict replay of the int-cents arithmetic:
    same per-line fix expression, same tolerance, same (diff desc
    nulls-last, orderkey) order."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    lines: dict = {}
    for r in li:
        c, n = lines.get(r.l_orderkey, (0, 0))
        lines[r.l_orderkey] = (
            c
            + _half_up(
                r.l_extendedprice
                * (1 - r.l_discount)
                * (1 + r.l_tax)
                * 100
            ),
            n + 1,
        )
    rows = []
    for r in o:
        oc = _half_up(r.o_totalprice * 100)
        if r.o_orderkey not in lines:
            rows.append(
                (r.o_orderkey, r.o_orderstatus, oc, None, 0, None,
                 "no_lines")
            )
        else:
            lc, n = lines[r.o_orderkey]
            d = abs(oc - lc)
            if d > 5:
                rows.append(
                    (r.o_orderkey, r.o_orderstatus, oc, lc, n, d,
                     "mismatch")
                )
    rows.sort(key=lambda t: (t[5] is None, -(t[5] or 0), t[0]))
    want = rows[:50]
    got = [
        (
            r.o_orderkey, r.o_orderstatus, r.order_c, r.line_c,
            r.n_lines, r.abs_diff_c, r.status,
        )
        for r in reconcile_worklist(spark, sf_dir).collect()
    ]
    assert got == want


def test_same_day_orders_vs_python(spark, sf_dir) -> None:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    g: dict = defaultdict(list)
    for r in o:
        g[(r.o_custkey, r.o_orderdate.date())].append(
            _half_up(r.o_totalprice * 100)
        )
    want = sorted(
        (
            (-len(v), -sum(v), k[0], k[1]),  # the query's full sort key
            (k[0], k[1], len(v), sum(v), min(v), max(v),
             min(v) == max(v)),
        )
        for k, v in g.items()
        if len(v) > 1
    )
    want = [w[1] for w in want][:100]
    got = [
        (
            r.o_custkey, r.order_day, r.n_orders, r.total_c, r.min_c,
            r.max_c, r.same_amount,
        )
        for r in same_day_orders(spark, sf_dir).collect()
    ]
    assert got == want


def test_seasonality_index_vs_python(spark, sf_dir) -> None:
    """Index = rev_c * n_months / yr_rev_c with the SAME float
    division; partial years divide by their own month count, and per
    year the index weighted by month revenue averages to 1."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    m: dict = defaultdict(lambda: [0, 0])
    for r in o:
        k = (r.o_orderdate.year, r.o_orderdate.month)
        m[k][0] += _half_up(r.o_totalprice * 100)
        m[k][1] += 1
    yr: dict = defaultdict(lambda: [0, 0])
    for (y, _mo), (rev, _n) in m.items():
        yr[y][0] += rev
        yr[y][1] += 1
    got = seasonality_index(spark, sf_dir).collect()
    assert len(got) == len(m)
    for r in got:
        rev, n = m[(r.yr, r.mo)]
        yrev, nm = yr[r.yr]
        assert (r.rev_c, r.n_orders, r.yr_rev_c, r.n_months) == (
            rev, n, yrev, nm,
        )
        assert r.seasonal_idx == float(rev * nm) / float(yrev)
    # weighted mean of the index over a year == 1 exactly in rationals
    for y, (yrev, nm) in yr.items():
        s = sum(
            m[(yy, mo)][0] * nm for (yy, mo) in m if yy == y
        )  # sum(rev_c * n_months) == yr_rev_c * n_months
        assert s == yrev * nm


def test_xyz_classification_vs_python(spark, sf_dir) -> None:
    """Class decisions replayed with exact integers over the yearly
    grid, zero-demand years included via the sparse-moment identity;
    class counts and quantity mass must match."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    per: dict = defaultdict(lambda: defaultdict(int))
    years = set()
    for r in li:
        y = r.l_shipdate.year
        years.add(y)
        per[r.l_partkey][y] += int(r.l_quantity)
    M = len(years)
    agg: dict = defaultdict(lambda: [0, 0, 0.0, 1.0])
    for pk, ys in per.items():
        s = sum(ys.values())
        ss = sum(q * q for q in ys.values())
        a = M * ss - s * s
        s2 = s * s
        k = "X" if 4 * a <= s2 else ("Y" if a <= s2 else "Z")
        cv2 = float(a) / float(s2)
        row = agg[k]
        row[0] += 1
        row[1] += s
        row[2] = max(row[2], cv2) if row[0] > 1 else cv2
        row[3] = min(row[3], cv2) if row[0] > 1 else cv2
    got = {r.klass: r for r in xyz_classification(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for k, (n, qty, mx, mn) in agg.items():
        assert (got[k].n_parts, got[k].total_qty) == (n, qty)
        assert got[k].max_cv2 == mx and got[k].min_cv2 == mn


def test_above_average_orders_vs_python(spark, sf_dir) -> None:
    """Verdicts replayed with integer cross-multiplication over each
    customer's (date, orderkey)-ordered history; segment counts and
    the one-division share must match."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    seg = {r.c_custkey: r.c_mktsegment for r in c}
    hist: dict = defaultdict(list)
    for r in o:
        hist[r.o_custkey].append(
            (r.o_orderdate, r.o_orderkey, _half_up(r.o_totalprice * 100))
        )
    counts: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for cust, rows in hist.items():
        rows.sort()
        s = seg[cust]
        run_sum = 0
        for i, (_d, _k, cents) in enumerate(rows):
            cell = counts[s]
            cell[0] += 1
            if i == 0:
                cell[1] += 1
            elif cents * i > run_sum:
                cell[2] += 1
            elif cents * i == run_sum:
                cell[3] += 1
            else:
                cell[4] += 1
            run_sum += cents
    got = {
        r.segment: r for r in above_average_orders(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for s, (n, nf, na, nat, nb) in counts.items():
        r = got[s]
        assert (r.n_orders, r.n_first, r.n_above, r.n_at, r.n_below) == (
            n, nf, na, nat, nb,
        )
        denom = n - nf
        if denom == 0:
            assert r.share_above is None
        else:
            assert r.share_above == float(na) / float(denom)


def test_interarrival_hist_vs_python(spark, sf_dir) -> None:
    """Bucket counts replayed from integer-second gaps over each
    (type, user)'s (ts, event_id)-sorted stream."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select("event_type", "user_id", "ts", "event_id").collect()
    per: dict = defaultdict(list)
    for r in e:
        per[(r.event_type, r.user_id)].append((r.ts, r.event_id))
    import datetime as _dt

    epoch = _dt.datetime(1970, 1, 1)

    def us(ts):
        return int((ts - epoch).total_seconds() * 1_000_000) if ts.microsecond == 0 else (
            int((ts.replace(microsecond=0) - epoch).total_seconds()) * 1_000_000
            + ts.microsecond
        )

    def bucket(g):
        for lim, lab in (
            (10, "0: <10s"), (60, "1: 10s-1m"), (600, "2: 1m-10m"),
            (3600, "3: 10m-1h"), (86400, "4: 1h-1d"),
        ):
            if g < lim:
                return lab
        return "5: >=1d"

    want: dict = defaultdict(int)
    for (et, _u), rows in per.items():
        rows.sort()
        for prev, cur in zip(rows, rows[1:]):
            gap = us(cur[0]) // 1_000_000 - us(prev[0]) // 1_000_000
            want[(et, bucket(gap))] += 1
    got = {
        (r.event_type, r.bucket): (r.n_gaps, r.share)
        for r in interarrival_hist(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    tot: dict = defaultdict(int)
    for (et, _b), n in want.items():
        tot[et] += n
    for k, n in want.items():
        assert got[k][0] == n
        assert got[k][1] == float(n) / float(tot[k[0]])


def test_part_staleness_vs_python(spark, sf_dir) -> None:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    last: dict = {}
    qty: dict = defaultdict(int)
    mx = None
    for r in li:
        d = r.l_shipdate.date()
        mx = d if mx is None or d > mx else mx
        if r.l_partkey not in last or d > last[r.l_partkey]:
            last[r.l_partkey] = d
        qty[r.l_partkey] += int(r.l_quantity)
    agg: dict = defaultdict(lambda: [0, 0, None, None])
    for pk, d in last.items():
        days = (mx - d).days
        b = (
            "0: fresh (<4w)" if days < 28
            else "1: aging (4-12w)" if days < 84
            else "2: stale (12-26w)" if days < 182
            else "3: dead (>=26w)"
        )
        row = agg[b]
        row[0] += 1
        row[1] += qty[pk]
        row[2] = days if row[2] is None else min(row[2], days)
        row[3] = days if row[3] is None else max(row[3], days)
    got = {r.bucket: r for r in part_staleness(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for b, (n, q, mn, mxd) in agg.items():
        r = got[b]
        assert (r.n_parts, r.lifetime_qty, r.min_days, r.max_days) == (
            n, q, mn, mxd,
        )


def test_activity_heatmap_vs_python(spark, sf_dir) -> None:
    """ISO weekday alignment pinned: Monday events land in dow=1."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select("ts", "user_id").collect()
    cells: dict = defaultdict(lambda: [0, set()])
    for r in e:
        k = (r.ts.isoweekday(), r.ts.hour)
        cells[k][0] += 1
        cells[k][1].add(r.user_id)
    total = sum(v[0] for v in cells.values())
    got = {
        (r.dow, r.hr): r for r in activity_heatmap(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for k, (n, users) in cells.items():
        r = got[k]
        assert (r.n_events, r.n_users) == (n, len(users))
        assert r.share == float(n) / float(total)


def test_cohort_new_returning_vs_python(spark, sf_dir) -> None:
    """Weekly identity: n_new + n_returning == n_active, the first
    active week of every user is 'new', and sum(n_new) over all weeks
    == the distinct user count."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("ts", "user_id").collect()
    import datetime as _dt

    epoch = _dt.datetime(1970, 1, 1)
    uw = {
        (r.user_id, int((r.ts - epoch).total_seconds() * 1_000_000)
         // 604_800_000_000)
        for r in e
    }
    first: dict = {}
    for u, w in uw:
        if u not in first or w < first[u]:
            first[u] = w
    want: dict = defaultdict(lambda: [0, 0, 0])
    for u, w in uw:
        row = want[w]
        row[0] += 1
        if w == first[u]:
            row[1] += 1
        else:
            row[2] += 1
    got = {
        r.wk: r for r in cohort_new_returning(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for w, (na, nn, nr) in want.items():
        r = got[w]
        assert (r.n_active, r.n_new, r.n_returning) == (na, nn, nr)
        assert r.n_new + r.n_returning == r.n_active
        assert r.returning_share == float(nr) / float(na)
    assert sum(r.n_new for r in got.values()) == len(first)


def test_return_rate_trend_vs_python(spark, sf_dir) -> None:
    """Direction flags replayed with integer cross-multiplication;
    the first month is NULL, every other row's flag matches the
    Fraction compare of consecutive exact rates."""
    from fractions import Fraction

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag"
    ).collect()
    m: dict = defaultdict(lambda: [0, 0])
    for r in li:
        k = (r.l_shipdate.year, r.l_shipdate.month)
        m[k][0] += 1
        if r.l_returnflag == "R":
            m[k][1] += 1
    keys = sorted(m)
    got = {(r.yr, r.mo): r for r in return_rate_trend(spark, sf_dir).collect()}
    assert set(got) == set(m)
    for i, k in enumerate(keys):
        n, ret = m[k]
        r = got[k]
        assert (r.n_lines, r.n_returned) == (n, ret)
        assert r.return_rate == float(ret) / float(n)
        if i == 0:
            assert r.rate_rose is None
        else:
            pn, pret = m[keys[i - 1]]
            assert r.rate_rose == (
                Fraction(ret, n) > Fraction(pret, pn)
            )


def test_flesch_readability_vs_python(spark, sf_dir) -> None:
    """Token counts replayed with python re over the same character
    classes; the score recomputed from pooled integers in the same
    expression order must match bit-for-bit."""
    import re

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select("lang", "text").collect()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for r in d:
        w = len(re.findall(r"[A-Za-z']+", r.text))
        s = max(len(re.findall(r"[.!?]+", r.text)), 1)
        y = len(re.findall(r"[aeiouyAEIOUY]+", r.text))
        row = agg[r.lang]
        row[0] += 1
        row[1] += w
        row[2] += s
        row[3] += y
    got = {r.lang: r for r in flesch_readability(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for lang, (n, w, s, y) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.words, r.sents, r.sylls) == (n, w, s, y)
        assert r.flesch == (
            206.835 - 1.015 * (float(w) / float(s))
            - 84.6 * (float(y) / float(w))
        )


def test_brand_cross_shopping_vs_python(spark, sf_dir) -> None:
    """Histogram replayed from the distinct (customer, brand) set;
    shares sum to 1 over the histogram."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    ).collect()
    cust = {r.o_orderkey: r.o_custkey for r in o}
    brand = {r.p_partkey: r.p_brand for r in p}
    cb = {(cust[r.l_orderkey], brand[r.l_partkey]) for r in li}
    per: dict = defaultdict(set)
    for c, b in cb:
        per[c].add(b)
    hist: dict = defaultdict(int)
    for c, bs in per.items():
        hist[len(bs)] += 1
    n_cust = len(per)
    got = {
        r.n_brands: r
        for r in __import__(
            "etl_marketdata_downloader_archived_spark.plans.analytics_r9",
            fromlist=["brand_cross_shopping"],
        ).brand_cross_shopping(spark, sf_dir).collect()
    }
    assert set(got) == set(hist)
    for nb, n in hist.items():
        assert got[nb].n_customers == n
        assert got[nb].customer_share == float(n) / float(n_cust)
    assert abs(sum(r.customer_share for r in got.values()) - 1.0) < 1e-9


def test_daily_consistency_vs_python(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        daily_consistency,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", "ts").collect()
    ud: dict = defaultdict(set)
    for r in e:
        ud[r.user_id].add(r.ts.date())
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for _u, days in ud.items():
        a = len(days)
        s = (max(days) - min(days)).days + 1
        if s == 1:
            k = "0: one-day"
        elif 20 * a >= 19 * s:
            k = "1: daily (>=95%)"
        elif 20 * a >= 17 * s:
            k = "2: near-daily (>=85%)"
        elif 4 * a >= 3 * s:
            k = "3: regular (>=75%)"
        else:
            k = "4: intermittent (<75%)"
        row = agg[k]
        row[0] += 1
        row[1] += a
        row[2] += s
    got = {r.consistency: r for r in daily_consistency(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for k, (n, a, s) in agg.items():
        r = got[k]
        assert (r.n_users, r.active_days, r.span_days) == (n, a, s)
        assert r.pooled_ratio == float(a) / float(s)


def test_supplier_load_balance_vs_python(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        supplier_load_balance,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).collect()
    ps: dict = defaultdict(int)
    for r in li:
        ps[(r.l_partkey, r.l_suppkey)] += int(r.l_quantity)
    per: dict = defaultdict(list)
    for (pk, _sk), q in ps.items():
        per[pk].append(q)
    agg: dict = defaultdict(lambda: [0, 0])
    all_q = 0
    for pk, qs in per.items():
        n, tot, mx = len(qs), sum(qs), max(qs)
        all_q += tot
        if n == 1:
            k = "0: sole-source"
        elif mx * n >= 3 * tot:
            k = "1: top >=3x fair share"
        elif mx * n >= 2 * tot:
            k = "2: top >=2x fair share"
        elif 2 * mx * n >= 3 * tot:
            k = "3: top >=1.5x fair share"
        else:
            k = "4: balanced"
        agg[k][0] += 1
        agg[k][1] += tot
    got = {
        r.sourcing: r for r in supplier_load_balance(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for k, (n, q) in agg.items():
        r = got[k]
        assert (r.n_parts, r.qty) == (n, q)
        assert r.qty_share == float(q) / float(all_q)


def test_join_skew_report_vs_python(spark, sf_dir) -> None:
    """Skew report vs a Counter replay: cnt^2 contributions, ppm by
    integer floor-division, (out_rows desc, key) top-15 cut."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        join_skew_report_partkey,
    )

    keys = [
        r.l_partkey
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    ]
    cnt = defaultdict(int)
    for k in keys:
        cnt[k] += 1
    per_key = {k: c * c for k, c in cnt.items()}
    total = sum(per_key.values())
    head = sorted(per_key.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    expect = [
        (i + 1, k, cnt[k], cnt[k], o, total, (o * 1_000_000) // total)
        for i, (k, o) in enumerate(head)
    ]
    got = [
        tuple(r)
        for r in join_skew_report_partkey(spark, sf_dir)
        .orderBy("rnk")
        .collect()
    ]
    assert got == expect


def test_join_salted_vs_python(spark, sf_dir) -> None:
    """Salted-join aggregate vs a plain dict join replay - result
    identity is the operator's whole contract."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        join_salted_supplier,
    )

    nat = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    agg: dict = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_quantity")
        .collect()
    ):
        if r.l_suppkey in nat:
            a = agg[nat[r.l_suppkey]]
            a[0] += 1
            a[1] += int(r.l_quantity)
    expect = sorted((k, n, q) for k, (n, q) in agg.items())
    got = [
        (r.nationkey, r.n_lines, r.qty)
        for r in join_salted_supplier(spark, sf_dir).collect()
    ]
    assert got == expect


def test_bfs_hops_vs_python(spark, sf_dir) -> None:
    """BFS query vs a collections.deque BFS over the same sparsified
    edge list - independent of both engines' recursion/joins."""
    from collections import deque

    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        bfs_hops_copurchase,
    )

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 11 == 0))
        .select("l_partkey", "l_suppkey")
        .collect()
    )
    adj: dict = defaultdict(set)
    deg: dict = defaultdict(int)
    edges = {(r.l_partkey, -r.l_suppkey) for r in rows}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for a, b in edges:
        deg[a] += 1  # out-degree in the symmetrized list = degree
        deg[b] += 1
    src = min((k for k in deg if k > 0), key=lambda k: (-deg[k], k))
    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if dist[u] >= 19:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = {r.node: r.hops for r in bfs_hops_copurchase(spark, sf_dir).collect()}
    assert got == dist


def test_fifo_allocation_vs_python(spark, sf_dir) -> None:
    """FIFO query vs an imperative two-pointer lot loop - the exact
    procedure the interval join replaces - plus the operator
    invariant matched == min(tot_in, tot_out) on every part."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        fifo_allocation,
    )

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey", "l_quantity", "l_returnflag",
            "l_shipdate", "l_orderkey", "l_linenumber",
        )
        .collect()
    )
    flows: dict = defaultdict(lambda: ([], []))
    for r in sorted(
        rows, key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber)
    ):
        ins, outs = flows[r.l_partkey]
        (outs if r.l_returnflag == "R" else ins).append(int(r.l_quantity))
    expect = {}
    for p, (ins, outs) in flows.items():
        if not ins or not outs:
            continue
        lots = list(ins)  # remaining units per lot, consumed in order
        i = 0
        n_matches = matched = 0
        for draw in outs:
            need = draw
            while need > 0 and i < len(lots):
                take = min(need, lots[i])
                if take > 0:
                    n_matches += 1
                    matched += take
                    lots[i] -= take
                    need -= take
                if lots[i] == 0:
                    i += 1
        expect[p] = (
            len(ins), len(outs), n_matches, matched, sum(outs) - matched
        )
        assert matched == min(sum(ins), sum(outs))  # operator invariant
    got = {
        r.part: (
            r.n_lots, r.n_rets, r.n_matches, r.matched_qty,
            r.unmatched_ret_qty,
        )
        for r in fifo_allocation(spark, sf_dir).collect()
    }
    assert got == expect


def test_survival_tenure_vs_python(spark, sf_dir) -> None:
    """Life table vs a Counter replay: per-customer span weeks,
    at-risk reverse accumulation, ppm hazard by floor division."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        survival_tenure,
    )

    spans: dict = {}
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect():
        lo, hi = spans.get(r.o_custkey, (r.o_orderdate, r.o_orderdate))
        spans[r.o_custkey] = (min(lo, r.o_orderdate), max(hi, r.o_orderdate))
    churned = defaultdict(int)
    for lo, hi in spans.values():
        wk = int((hi - lo).total_seconds() * 1_000_000) // 604_800_000_000
        churned[wk] += 1
    expect = {}
    at_risk = 0
    for wk in sorted(churned, reverse=True):
        at_risk += churned[wk]
        expect[wk] = (
            churned[wk], at_risk, (churned[wk] * 1_000_000) // at_risk
        )
    got = {
        r.tenure_wk: (r.n_churned, r.n_at_risk, r.hazard_ppm)
        for r in survival_tenure(spark, sf_dir).collect()
    }
    assert got == expect


def test_boilerplate_shingles_vs_python(spark, sf_dir) -> None:
    """Shingle shares vs a python re/set replay: per-doc distinct
    bigrams, integer cross-multiplied 20% threshold."""
    import re

    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        boilerplate_shingles,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    pergram: dict = defaultdict(set)
    ndocs = defaultdict(int)
    for r in docs:
        ndocs[r.source] += 1
        w = [t for t in re.split("[^a-z]+", r.text.lower()) if t]
        for i in range(len(w) - 1):
            pergram[(r.source, f"{w[i]} {w[i+1]}")].add(r.doc_id)
    expect = {
        (src, g): (len(ds), ndocs[src])
        for (src, g), ds in pergram.items()
        if len(ds) * 100 >= 20 * ndocs[src]
    }
    got = {
        (r.source, r.shingle): (r.n_docs, r.n_docs_src)
        for r in boilerplate_shingles(spark, sf_dir).collect()
    }
    assert got == expect


def test_win_distribution_vs_python(spark, sf_dir) -> None:
    """percent_rank/cume_dist/ntile vs an index replay over the
    sorted per-priority lists (SQL-standard definitions)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        win_distribution,
    )

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    groups: dict = defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(
            (_half_up(r.o_totalprice * 100), r.o_orderkey)
        )
    expect = {}
    for prio, lst in groups.items():
        lst.sort()
        n = len(lst)
        base, extra = divmod(n, 8)  # ntile: first `extra` buckets +1
        bounds = []
        acc = 0
        for b in range(8):
            acc += base + (1 if b < extra else 0)
            bounds.append(acc)
        for idx, (cents, key) in enumerate(lst):
            octile = next(b + 1 for b, hi in enumerate(bounds) if idx < hi)
            expect[key] = (
                prio,
                cents,
                idx / (n - 1) if n > 1 else 0.0,
                (idx + 1) / n,
                octile,
            )
    got = {
        r.o_orderkey: (r.o_orderpriority, r.cents, r.pct_rank, r.cume, r.octile)
        for r in win_distribution(spark, sf_dir).collect()
    }
    assert got == expect


def test_segment_migration_vs_python(spark, sf_dir) -> None:
    """Migration matrix vs a dict replay: per-period cent spends,
    positional tercile cuts over the sorted distinct-value list,
    full-outer 'absent' classes."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        segment_migration,
    )
    from datetime import datetime

    pivot = datetime(1998, 5, 1)
    spend: dict = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        period = 0 if r.o_orderdate < pivot else 1
        spend[(period, r.o_custkey)] += _half_up(r.o_totalprice * 100)
    cuts = {}
    for period in (0, 1):
        vals = sorted(v for (p, _), v in spend.items() if p == period)
        n = len(vals)
        cuts[period] = (vals[(n + 2) // 3 - 1], vals[(2 * n + 2) // 3 - 1])
    def seg(period, v):
        t1, t2 = cuts[period]
        return "1: low" if v <= t1 else ("2: mid" if v <= t2 else "3: high")
    custs = {c for (_, c) in spend}
    matrix = defaultdict(int)
    for c in custs:
        a = seg(0, spend[(0, c)]) if (0, c) in spend else "0: absent"
        b = seg(1, spend[(1, c)]) if (1, c) in spend else "0: absent"
        matrix[(a, b)] += 1
    got = {
        (r.seg_early, r.seg_late): r.n_customers
        for r in segment_migration(spark, sf_dir).collect()
    }
    assert got == dict(matrix)


def test_repeat_purchase_gap_vs_python(spark, sf_dir) -> None:
    """Gap buckets vs a sorted-list replay: whole-day floor division,
    first orders dropped, per-bucket distinct customers."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        repeat_purchase_gap,
    )

    per_cust: dict = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect():
        per_cust[r.o_custkey].append((r.o_orderdate, r.o_orderkey))
    n_gaps = defaultdict(int)
    custs = defaultdict(set)
    for c, lst in per_cust.items():
        lst.sort()
        for (d0, _), (d1, _) in zip(lst, lst[1:]):
            gap = int((d1 - d0).total_seconds() * 1_000_000) // 86_400_000_000
            b = ("1: <=1wk" if gap <= 7 else
                 "2: <=1mo" if gap <= 30 else
                 "3: <=3mo" if gap <= 90 else
                 "4: <=6mo" if gap <= 180 else "5: >6mo")
            n_gaps[b] += 1
            custs[b].add(c)
    got = {
        r.bucket: (r.n_gaps, r.n_customers)
        for r in repeat_purchase_gap(spark, sf_dir).collect()
    }
    assert got == {b: (n, len(custs[b])) for b, n in n_gaps.items()}


def test_degree_histogram_vs_python(spark, sf_dir) -> None:
    """Joint degree histogram vs a set/Counter replay over the same
    distinct nation edge list."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        degree_histogram,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    c = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    o_cust = {r.o_orderkey: r.o_custkey for r in o.collect()}
    edges = set()
    for r in li.collect():
        a, b = s[r.l_suppkey], c[o_cust[r.l_orderkey]]
        if a != b:
            edges.add((a, b))
    outd = defaultdict(int)
    ind = defaultdict(int)
    nodes = set()
    for a, b in edges:
        outd[a] += 1
        ind[b] += 1
        nodes.update((a, b))
    hist = defaultdict(int)
    for n in nodes:
        hist[(outd[n], ind[n])] += 1
    got = {
        (r.out_degree, r.in_degree): r.n_nodes
        for r in degree_histogram(spark, sf_dir).collect()
    }
    assert got == dict(hist)


def test_agg_salted_vs_python(spark, sf_dir) -> None:
    """Salted two-phase aggregate vs a plain dict accumulation -
    result identity across the salt regroup."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        agg_salted,
    )

    acc: dict = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    ).collect():
        a = acc[(r.l_returnflag, r.l_linestatus)]
        a[0] += 1
        a[1] += int(r.l_quantity)
        a[2] += _half_up(r.l_extendedprice * 100)
    got = [
        (r.l_returnflag, r.l_linestatus, r.n_lines, r.qty, r.ext_c)
        for r in agg_salted(spark, sf_dir).collect()
    ]
    assert got == [
        (rf, ls, n, q, e)
        for (rf, ls), (n, q, e) in sorted(acc.items())
    ]


def test_nation_trade_balance_vs_python(spark, sf_dir) -> None:
    """Trade balance vs a dict replay of the cross-border flow, plus
    the zero-sum invariant (every export is someone's import)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        nation_trade_balance,
    )

    s = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    c = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    ocust = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    names = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    exp = defaultdict(lambda: [0, 0])
    imp = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).collect():
        a, b = s[r.l_suppkey], c[ocust[r.l_orderkey]]
        if a == b:
            continue
        cents = _half_up(r.l_extendedprice * (1 - r.l_discount) * 100)
        exp[a][0] += cents
        exp[a][1] += 1
        imp[b][0] += cents
        imp[b][1] += 1
    got = {
        r.nation: (
            r.exports_c, r.imports_c, r.balance_c,
            r.n_export_lines, r.n_import_lines,
        )
        for r in nation_trade_balance(spark, sf_dir).collect()
    }
    assert got == {
        nm: (
            exp[nk][0], imp[nk][0], exp[nk][0] - imp[nk][0],
            exp[nk][1], imp[nk][1],
        )
        for nk, nm in names.items()
    }
    assert sum(v[2] for v in got.values()) == 0  # zero-sum world


def test_debounce_events_vs_python(spark, sf_dir) -> None:
    """Debounce census vs a python anchor-walk over the same
    (user, type) streams."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        debounce_events,
    )

    per_key: dict = defaultdict(list)
    raw = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    ).collect():
        if r.ts is None:
            continue
        per_key[(r.user_id, r.event_type)].append((r.ts, r.event_id))
        raw[r.event_type] += 1
    kept = defaultdict(int)
    for (u, et), lst in per_key.items():
        lst.sort()
        anchor = None
        for ts, _ in lst:
            us = int(ts.timestamp() * 1_000_000)
            if anchor is None or us - anchor > 86_400_000_000:
                kept[et] += 1
                anchor = us
    got = {
        r.event_type: (r.n_raw, r.n_kept)
        for r in debounce_events(spark, sf_dir).collect()
    }
    assert got == {et: (n, kept[et]) for et, n in raw.items()}


def test_pps_sample_docs_vs_python(spark, sf_dir) -> None:
    """PPS sample vs an integer number-line replay, plus the
    per-source sum(multiplicity) == k invariant."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r9 import (
        pps_sample_docs,
    )

    docs = defaultdict(list)
    for r in load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect():
        if r.n_chars > 0:
            docs[r.source].append((r.doc_id, int(r.n_chars)))
    expect = {}
    for src, lst in docs.items():
        lst.sort()
        total = sum(w for _, w in lst)
        step = total // 10
        if step < 1:
            continue
        cum = 0
        for did, w in lst:
            lo, cum = cum, cum + w
            m = min(cum // step, 10) - min(lo // step, 10)
            if m >= 1:
                expect[(src, did)] = (w, m)
        assert sum(m for (s, _), (_, m) in expect.items() if s == src) == 10
    got = {
        (r.source, r.doc_id): (r.weight, r.multiplicity)
        for r in pps_sample_docs(spark, sf_dir).collect()
    }
    assert got == expect
