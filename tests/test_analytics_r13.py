"""Round-13 analytics: independent python differentials for the
parity-verified queries in plans/analytics_r13.py - parity proves
Spark==DuckDB, these replays prove the FORMULA is right (a wrong
formula expressed identically on both engines passes parity)."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.io import load_table
from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
    agg_filter_clause,
    asof_native_sql,
    distinct_on_topn,
    dup_ngram_spans,
    gopher_rules,
    group_by_all,
    win_ignore_nulls,
)

from _helpers import half_up as _half_up  # noqa: E402


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z]+", text.lower()) if w]


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    ).collect()


def test_dup_ngram_spans_vs_python(spark, sf_dir) -> None:
    """Duplicated 5-gram panel vs a dict replay: distinct grams per
    doc, document frequency over the corpus, per-source sums and the
    exact bigint-division fraction."""
    rows = _docs(spark, sf_dir)
    grams = {}
    for r in rows:
        ws = _words(r.text)
        if len(ws) >= 5:
            grams[r.doc_id] = (
                r.source,
                {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)},
            )
    df: dict = defaultdict(int)
    for _src, gs in grams.values():
        for g in gs:
            df[g] += 1
    agg: dict = defaultdict(lambda: [0, 0, 0])  # docs, grams, dup
    for src, gs in grams.values():
        agg[src][0] += 1
        agg[src][1] += len(gs)
        agg[src][2] += sum(1 for g in gs if df[g] >= 2)
    got = {
        r.source: (r.n_docs, r.total_grams, r.dup_grams, r.dup_frac)
        for r in dup_ngram_spans(spark, sf_dir).collect()
    }
    want = {
        s: (d, t, u, float(u) / t) for s, (d, t, u) in agg.items()
    }
    assert got == want
    # the corpus genuinely contains cross-document duplicated spans
    assert sum(u for _, _, u, _ in got.values()) > 0


def test_gopher_rules_vs_python(spark, sf_dir) -> None:
    """Quality gates vs a replay using the SAME integer
    cross-multiplication (never a float mean)."""
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for r in _docs(spark, sf_dir):
        ws = _words(r.text)
        if not ws:
            continue
        n, sl, ml = len(ws), sum(map(len, ws)), max(map(len, ws))
        a = agg[r.lang]
        a[0] += 1
        if 50 <= n <= 100000 and 3 * n <= sl <= 10 * n and ml <= 20:
            a[1] += 1
        a[2] += n
        a[3] += sl
    got = {
        r.lang: [r.n_docs, r.n_pass, r.total_words, r.total_chars]
        for r in gopher_rules(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in agg.items()}
    assert any(v[1] < v[0] for v in got.values())  # gates actually cut


def test_group_by_all_vs_python(spark, sf_dir) -> None:
    agg: dict = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    ).collect():
        a = agg[(r.o_orderstatus, r.o_orderpriority)]
        a[0] += 1
        a[1] += _half_up(r.o_totalprice * 100)
    rows = group_by_all(spark, sf_dir).collect()
    got = {
        (r.o_orderstatus, r.o_orderpriority): [r.n_orders, r.cents]
        for r in rows
    }
    assert got == dict(agg)
    # ORDER BY ALL == the full select list ascending
    keys = [
        (r.o_orderstatus, r.o_orderpriority, r.n_orders, r.cents)
        for r in rows
    ]
    assert keys == sorted(keys)


def test_agg_filter_clause_vs_python(spark, sf_dir) -> None:
    """Three aggregates over three different row subsets in one pass
    vs a literal per-row replay of each FILTER predicate."""
    agg: dict = defaultdict(lambda: [0, 0, 0, set()])
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_discount", "l_tax", "l_quantity", "l_suppkey"
    ).collect():
        a = agg[r.l_returnflag]
        a[0] += 1
        if r.l_discount > 0.05:
            a[1] += 1
        if r.l_tax > 0.03:
            a[2] += int(r.l_quantity)
        if r.l_returnflag == "R":
            a[3].add(r.l_suppkey)
    got = {
        r.l_returnflag: [r.n_lines, r.n_discounted, r.taxed_qty, r.r_suppliers]
        for r in agg_filter_clause(spark, sf_dir).collect()
    }
    want = {k: [v[0], v[1], v[2], len(v[3])] for k, v in agg.items()}
    assert got == want
    assert got["R"][3] > 0 and all(
        v[3] == 0 for k, v in got.items() if k != "R"
    )


def _events_us(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        )
        .collect()
    )


def test_win_ignore_nulls_vs_python(spark, sf_dir) -> None:
    """Carried-forward / next-observation vs a per-user sequential
    replay with the same deterministic null rule."""
    by_user: dict = defaultdict(list)
    for r in _events_us(spark, sf_dir):
        v = None if r.event_id % 3 == 0 else _half_up(r.value * 100)
        by_user[r.user_id].append((r.us, r.event_id, v))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        carried = None
        car = []
        for us, eid, v in evs:
            if v is not None:
                carried = v
            car.append(carried)
        nxt = [None] * len(evs)
        pending = None
        for i in range(len(evs) - 1, -1, -1):
            nxt[i] = pending
            if evs[i][2] is not None:
                pending = evs[i][2]
        for (us, eid, v), c, n in zip(evs, car, nxt):
            want[(u, eid)] = (us, v, c, n)
    got = {
        (r.user_id, r.event_id): (r.us, r.v, r.carried, r.next_obs)
        for r in win_ignore_nulls(spark, sf_dir).collect()
    }
    assert got == want


def test_distinct_on_topn_vs_python(spark, sf_dir) -> None:
    best: dict = {}
    for r in _events_us(spark, sf_dir):
        c = _half_up(r.value * 100)
        k = (r.user_id, r.event_type)
        if k not in best or (-c, r.event_id) < (-best[k][1], best[k][0]):
            best[k] = (r.event_id, c)
    got = {
        (r.user_id, r.event_type): (r.event_id, r.cents)
        for r in distinct_on_topn(spark, sf_dir).collect()
    }
    assert got == best


def test_asof_native_sql_vs_python(spark, sf_dir) -> None:
    """Backward as-of vs a bisect replay: per purchase, the latest
    click at or before it (right side pre-deduped to max event_id per
    (user, ts) exactly as both engines do)."""
    import bisect

    clicks: dict = defaultdict(dict)
    purchases = []
    for r in _events_us(spark, sf_dir):
        if r.event_type == "click":
            prev = clicks[r.user_id].get(r.us)
            if prev is None or r.event_id > prev[0]:
                clicks[r.user_id][r.us] = (
                    r.event_id, _half_up(r.value * 100),
                )
        elif r.event_type == "purchase":
            purchases.append((r.user_id, r.event_id, r.us))
    sorted_clicks = {
        u: sorted((us, eid, c) for us, (eid, c) in d.items())
        for u, d in clicks.items()
    }
    want = {}
    for u, eid, us in purchases:
        cl = sorted_clicks.get(u, [])
        i = bisect.bisect_right([x[0] for x in cl], us)
        if i:
            cus, ceid, cc = cl[i - 1]
            want[(u, eid)] = (us, ceid, cc, cus)
        else:
            want[(u, eid)] = (us, None, None, None)
    got = {
        (r.user_id, r.event_id): (r.us, r.click_id, r.click_cents, r.click_us)
        for r in asof_native_sql(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[1] is None for v in want.values()) or len(want) > 0


def test_listagg_within_group_vs_python(spark, sf_dir) -> None:
    rows = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 800
    ).select("o_orderpriority", "o_orderkey").collect()
    want: dict = defaultdict(list)
    for r in rows:
        want[r.o_orderpriority].append(r.o_orderkey)
    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        listagg_within_group,
    )

    got = {
        r.o_orderpriority: (r.keys_csv, r.n)
        for r in listagg_within_group(spark, sf_dir).collect()
    }
    assert got == {
        k: (",".join(str(x) for x in sorted(v)), len(v))
        for k, v in want.items()
    }


def test_width_bucket_cert_vs_python(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        width_bucket_cert,
    )

    vals = [
        _half_up(r.value * 100)
        for r in load_table(spark, sf_dir, "events").select("value").collect()
    ]
    want: dict = defaultdict(int)
    for c in vals:
        b = 0 if c < 0 else (17 if c >= 40000 else c // 2500 + 1)
        want[b] += 1
    got = {r.bucket: r.n for r in width_bucket_cert(spark, sf_dir).collect()}
    assert got == dict(want)


def test_regexp_extract_all_lateral_vs_python(spark, sf_dir) -> None:
    rows = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text").collect()
    want = {}
    for r in rows:
        for i, w in enumerate(re.findall(r"[a-z]{6,}", r.text)):
            want[(r.doc_id, i)] = w
    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        regexp_extract_all_lateral,
    )

    got = {
        (r.doc_id, r.pos): r.word
        for r in regexp_extract_all_lateral(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_interval_arith_vs_python(spark, sf_dir) -> None:
    """Month addition with end-of-month clamping replayed via the
    stdlib calendar (the semantics, not another engine)."""
    import calendar
    import datetime as dt

    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        interval_arith,
    )

    def plus_month(d: dt.date) -> dt.date:
        y, m = (d.year + 1, 1) if d.month == 12 else (d.year, d.month + 1)
        return dt.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))

    anchor = dt.date(1995, 1, 1)
    # o_orderdate surfaces as a midnight timestamp through the nanos
    # parquet reader; the date functions' outputs are genuine dates
    got = {
        (r.d.date() if isinstance(r.d, dt.datetime) else r.d): r
        for r in interval_arith(spark, sf_dir).collect()
    }
    assert len(got) > 300
    clamped = 0
    for d, r in got.items():
        assert r.plus_month == plus_month(d), d
        assert r.plus_45d == d + dt.timedelta(days=45), d
        assert r.month_end == dt.date(
            d.year, d.month, calendar.monthrange(d.year, d.month)[1]
        ), d
        assert r.days_since_95 == (d - anchor).days, d
        clamped += r.plus_month.day != d.day
    assert clamped > 0  # the corpus genuinely exercises the clamp


def test_map_lambda_funcs_vs_python(spark, sf_dir) -> None:
    from collections import Counter

    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        map_lambda_funcs,
    )

    rows = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).select("doc_id", "text").collect()
    want = {}
    for r in rows:
        for w, c in Counter(_words(r.text)).items():
            if c >= 2:
                want[(r.doc_id, w)] = 2 * c
    got = {
        (r.doc_id, r.word): r.doubled
        for r in map_lambda_funcs(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_median_cert_vs_python(spark, sf_dir) -> None:
    import statistics

    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        median_cert,
    )

    groups: dict = defaultdict(lambda: ([], []))
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect():
        groups[r.l_returnflag][0].append(_half_up(r.l_extendedprice * 100))
        groups[r.l_returnflag][1].append(int(r.l_quantity))
    got = {
        r.l_returnflag: (r.med_cents, r.med_qty, r.n)
        for r in median_cert(spark, sf_dir).collect()
    }
    want = {
        k: (
            float(statistics.median(c)),
            float(statistics.median(q)),
            len(c),
        )
        for k, (c, q) in groups.items()
    }
    assert got == want


def test_bitmap_distinct_vs_python(spark, sf_dir) -> None:
    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        bitmap_distinct,
    )

    supp: dict = defaultdict(set)
    part: dict = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_suppkey", "l_partkey"
    ).collect():
        supp[r.l_returnflag].add(r.l_suppkey)
        part[r.l_returnflag].add(r.l_partkey)
    got = {
        r.l_returnflag: (r.nd_supp, r.nd_part)
        for r in bitmap_distinct(spark, sf_dir).collect()
    }
    assert got == {
        k: (len(supp[k]), len(part[k])) for k in supp
    }


def test_grouping_id_cert_vs_python(spark, sf_dir) -> None:
    """ROLLUP levels replayed: detail rows, per-status subtotals, the
    grand total - each with the documented grouping flags."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        grouping_id_cert,
    )

    detail: dict = defaultdict(int)
    for r in load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect():
        detail[(r.o_orderstatus, r.o_orderpriority)] += 1
    rows = grouping_id_cert(spark, sf_dir).collect()
    got_detail = {
        (r.o_orderstatus, r.o_orderpriority): r.n
        for r in rows
        if r.gid == 0
    }
    assert got_detail == dict(detail)
    for r in rows:
        assert r.gid == 2 * r.g_status + r.g_prio
        if r.gid == 1:  # priority rolled up
            assert r.o_orderpriority is None
            assert r.n == sum(
                v for (s, _p), v in detail.items()
                if s == r.o_orderstatus
            )
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].n == sum(detail.values())


def test_try_to_timestamp_cert_vs_python(spark, sf_dir) -> None:
    import datetime as dt

    from etl_marketdata_downloader_archived_spark.plans.analytics_r13 import (
        try_to_timestamp_cert,
    )

    rows = try_to_timestamp_cert(spark, sf_dir).collect()
    assert len(rows) > 100
    bad = good = 0
    epoch = dt.datetime(1970, 1, 1)
    for r in rows:
        if r.o_orderkey % 5 == 0:
            assert r.ts_str == "2024-02-30 10:00:00"
            assert r.parsed_us is None  # NULL, never a raise
            bad += 1
        else:
            want = dt.datetime.strptime(
                r.ts_str, "%Y-%m-%d %H:%M:%S"
            )
            assert r.parsed_us == int(
                (want - epoch).total_seconds() * 1_000_000
            )
            good += 1
    assert bad > 0 and good > 0
