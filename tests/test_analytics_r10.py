"""Round-10 analytics: independent python differentials for the
parity-verified queries in plans/analytics_r10.py - parity proves
Spark==DuckDB, these replays prove the FORMULA is right (a wrong
formula expressed identically on both engines passes parity)."""

from __future__ import annotations

from collections import defaultdict

from etl_marketdata_downloader_archived_spark.io import load_table
from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
    distinctive_tokens,
    inventory_balance,
    new_product_adoption,
    share_tree,
    snm_pairs,
    topn_with_other,
)

from _helpers import half_up as _half_up  # noqa: E402

WEEK_US = 604_800_000_000


def _line_cents(r) -> int:
    return _half_up(r.l_extendedprice * (1 - r.l_discount) * 100)


def test_topn_with_other_vs_python(spark, sf_dir) -> None:
    """Top-5 + OTHER vs a dict replay: same int-cents revenue, same
    (rev desc, brand) rank order, same fold of ranks > 5."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    rev: dict = defaultdict(int)
    for r in li:
        rev[parts[r.l_partkey]] += _line_cents(r)
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    want: dict = defaultdict(lambda: [0, 0])
    for i, (brand, c) in enumerate(ranked, 1):
        label = brand if i <= 5 else "OTHER"
        want[label][0] += c
        want[label][1] += 1
    got = {
        r.label: [r.rev_c, r.n_brands]
        for r in topn_with_other(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert got["OTHER"][1] == len(ranked) - 5


def test_share_tree_vs_python(spark, sf_dir) -> None:
    """Nation/region shares vs an integer replay: per-nation cents,
    region and grand totals, truncating ppm division; per-region
    nation shares sum to <= 1e6 and within 25 ppm of it (truncation
    loses < 1 ppm per nation)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nat = {
        r.n_nationkey: (r.n_name, r.n_regionkey)
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    reg = {
        r.r_regionkey: r.r_name
        for r in load_table(spark, sf_dir, "region").collect()
    }
    rev: dict = defaultdict(int)
    for r in o:
        name, rk = nat[cust[r.o_custkey]]
        rev[(reg[rk], name)] += _half_up(r.o_totalprice * 100)
    region_tot: dict = defaultdict(int)
    for (rg, _), c in rev.items():
        region_tot[rg] += c
    total = sum(rev.values())
    want = {
        (rg, n): (
            c,
            region_tot[rg],
            total,
            c * 1_000_000 // region_tot[rg],
            c * 1_000_000 // total,
        )
        for (rg, n), c in rev.items()
    }
    rows = share_tree(spark, sf_dir).collect()
    got = {
        (r.region, r.nation): (
            r.rev_c, r.region_c, r.total_c,
            r.share_region_ppm, r.share_total_ppm,
        )
        for r in rows
    }
    assert got == want
    per_region: dict = defaultdict(int)
    for r in rows:
        per_region[r.region] += r.share_region_ppm
    for rg, s in per_region.items():
        n_nations = sum(1 for k in got if k[0] == rg)
        assert 1_000_000 - n_nations < s <= 1_000_000, rg


def test_distinctive_tokens_vs_python(spark, sf_dir) -> None:
    """Smoothed rate-ratio score and per-source top-8 vs a pure
    python replay of the same counts and the same three IEEE ops."""
    import re

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).collect()
    c_st: dict = defaultdict(int)
    for r in docs:
        for t in re.split(r"[^a-z]+", r.text.lower()):
            if t:
                c_st[(r.source, t)] += 1
    c_t: dict = defaultdict(int)
    n_s: dict = defaultdict(int)
    for (s, t), c in c_st.items():
        c_t[t] += c
        n_s[s] += c
    v = len(c_t)
    n = sum(c_t.values())
    scored: dict = defaultdict(list)
    for (s, t), c in c_st.items():
        score = (float(c + 1) / float(n_s[s] + v)) * (
            float(n - n_s[s] + v) / float(c_t[t] - c + 1)
        )
        scored[s].append((t, c, c_t[t] - c, score))
    want = set()
    for s, rows in scored.items():
        rows.sort(key=lambda x: (-x[3], x[0]))
        for t, cs, crest, score in rows[:8]:
            want.add((s, t, cs, crest, score))
    got = {
        (r.source, r.token, r.c_s, r.c_rest, r.score)
        for r in distinctive_tokens(spark, sf_dir).collect()
    }
    assert got == want  # bit-equal scores: same bigints, same IEEE ops


def test_snm_pairs_vs_python(spark, sf_dir) -> None:
    """The registered SNM walk vs a python replay: same first-letter
    blocks, same (name, id) sort, same 4-neighbor window, same
    levenshtein cut."""
    parts = sorted(
        (r.p_name, r.p_partkey)
        for r in load_table(spark, sf_dir, "part").collect()
    )
    blocks: dict = defaultdict(list)
    for name, pid in parts:
        blocks[name.lower()[:1]].append((name, pid))

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = set()
    for rows in blocks.values():
        for i, (ka, ia) in enumerate(rows):
            for kb, ib in rows[i + 1 : i + 5]:
                d = lev(ka, kb)
                if d <= 3:
                    want.add((ia, ka, ib, kb, d))
    got = {
        (r.id_a, r.key_a, r.id_b, r.key_b, r.dist)
        for r in snm_pairs(spark, sf_dir).collect()
    }
    assert got == want


def test_new_product_adoption_vs_python(spark, sf_dir) -> None:
    """Launch-aligned weekly revenue vs a dict replay: same epoch-week
    integer division, same min-launch anchor, same 9-week cut."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    wk = lambda d: int(d.timestamp() * 1_000_000) // WEEK_US  # noqa: E731
    launch: dict = {}
    for r in li:
        w = wk(r.l_shipdate)
        launch[r.l_partkey] = min(launch.get(r.l_partkey, w), w)
    agg: dict = defaultdict(lambda: [0, set()])
    for r in li:
        off = wk(r.l_shipdate) - launch[r.l_partkey]
        if off <= 8:
            cell = agg[(parts[r.l_partkey], off)]
            cell[0] += _line_cents(r)
            cell[1].add(r.l_partkey)
    want = {
        k: (c, len(ps)) for k, (c, ps) in agg.items()
    }
    got = {
        (r.brand, r.week_offset): (r.rev_c, r.n_parts)
        for r in new_product_adoption(spark, sf_dir).collect()
    }
    assert got == want


def test_inventory_balance_vs_python(spark, sf_dir) -> None:
    """Running balance panel vs an ordered replay: returns negate
    quantity, the (shipdate, orderkey, linenumber) total order pins
    the path, min/max track the running sum, end equals the total."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_returnflag",
        "l_shipdate", "l_orderkey", "l_linenumber",
    ).collect()
    per_part: dict = defaultdict(list)
    for r in li:
        d = int(r.l_quantity)
        if r.l_returnflag == "R":
            d = -d
        per_part[r.l_partkey].append(
            (r.l_shipdate, r.l_orderkey, r.l_linenumber, d)
        )
    want = {}
    for pk, moves in per_part.items():
        moves.sort()
        bal = 0
        lo = hi = None
        for _, _, _, d in moves:
            bal += d
            lo = bal if lo is None else min(lo, bal)
            hi = bal if hi is None else max(hi, bal)
        want[pk] = (len(moves), lo, hi, bal)
    got = {
        r.part: (r.n_moves, r.min_bal, r.max_bal, r.end_bal)
        for r in inventory_balance(spark, sf_dir).collect()
    }
    assert got == want


def test_sorted_neighborhood_pairs_semantics(spark) -> None:
    """Operator unit semantics on a hand-built frame: in-window pairs
    only (rank distance <= window), no cross-block pairs, ordered
    (a before b in the sort), distance filter applied, and the
    window=1 adjacent-only edge."""
    import pytest as _pytest

    from etl_marketdata_downloader_archived_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "alpha"), (2, "alphb"), (3, "alzzz"), (4, "amkkk"),
        (5, "beta"),  # different block: never pairs with a*
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=2, block_len=1
        ).collect()
    }
    # sort order in block 'a': alpha(1), alphb(2), alzzz(3), amkkk(4)
    assert got == {
        (1, 2, 1), (1, 3, 3),
        (2, 3, 3), (2, 4, 4),
        (3, 4, 4),  # alzzz -> amkkk: 4 substitutions
    }
    # distance cut
    close = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=2, max_distance=3, block_len=1
        ).collect()
    }
    assert close == {(1, 2), (1, 3), (2, 3)}
    # window=1: adjacent only
    adj = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=1, block_len=1
        ).collect()
    }
    assert adj == {(1, 2), (2, 3), (3, 4)}
    with _pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "name", window=0)


def test_price_dispersion_vs_python(spark, sf_dir) -> None:
    """Integer-moment variance vs a pure python replay: same cents
    fix-point, same n*ss - s^2 numerator, same truncating division
    (python ints are arbitrary-precision - the replay is exact by
    construction, so any Spark/DuckDB overflow would surface here)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect()
    brand_of = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        price_dispersion,
    )

    mom: dict = defaultdict(lambda: [0, 0, 0])  # n, s, ss
    for r in li:
        c = _line_cents(r)
        m = mom[brand_of[r.l_partkey]]
        m[0] += 1
        m[1] += c
        m[2] += c * c
    want = {}
    for b, (n, s, ss) in mom.items():
        if n > 1:
            want[b] = (n, s // n, (n * ss - s * s) // (n * (n - 1)))
    got = {
        r.brand: (r.n, r.mean_c, r.var_c2)
        for r in price_dispersion(spark, sf_dir).collect()
    }
    assert got == want


def test_order_lines_histogram_vs_python(spark, sf_dir) -> None:
    """Histogram vs a Counter replay - including that lineless orders
    land in the zero bucket rather than vanishing."""
    from collections import Counter

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        order_lines_histogram,
    )

    per_order: dict = Counter()
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey"
    ).collect():
        per_order[r.l_orderkey] += 1
    orders = [
        r.o_orderkey
        for r in load_table(spark, sf_dir, "orders").collect()
    ]
    want = Counter(per_order.get(ok, 0) for ok in orders)
    got = {
        r.n_lines: r.n_orders
        for r in order_lines_histogram(spark, sf_dir).collect()
    }
    assert got == dict(want)
    # the panel covers every order exactly once
    assert sum(got.values()) == len(orders)


def test_weekly_active_overlap_vs_python(spark, sf_dir) -> None:
    """Retention panel vs a set replay: per-week active sets, their
    next-week cardinality, and the exact intersection count."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        weekly_active_overlap,
    )

    act: dict = defaultdict(set)
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).collect():
        act[
            int(r.o_orderdate.timestamp() * 1_000_000) // WEEK_US
        ].add(r.o_custkey)
    want = {
        wk: (
            len(s),
            len(act.get(wk + 1, ())),
            len(s & act.get(wk + 1, set())),
        )
        for wk, s in act.items()
    }
    got = {
        r.wk: (r.n_active, r.n_active_next, r.n_retained)
        for r in weekly_active_overlap(spark, sf_dir).collect()
    }
    assert got == want


def test_win_navigation_vs_python(spark, sf_dir) -> None:
    """first/last/nth window navigation vs an ordered replay: the
    running frame's first_value, the whole-partition frame's
    last_value and nth_value(2) (NULL for single-order customers)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        win_navigation,
    )

    per_cust: dict = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").collect():
        per_cust[r.o_custkey].append(
            (r.o_orderdate, r.o_orderkey, _half_up(r.o_totalprice * 100))
        )
    want = {}
    for ck, rows in per_cust.items():
        rows.sort()
        cents = [c for _, _, c in rows]
        for _, ok, c in rows:
            want[ok] = (
                ck,
                c,
                cents[0],
                cents[-1],
                cents[1] if len(cents) > 1 else None,
            )
    got = {
        r.o_orderkey: (r.o_custkey, r.cents, r.first_c, r.last_c, r.second_c)
        for r in win_navigation(spark, sf_dir).collect()
    }
    assert got == want


def test_skipgram_transitions_vs_python(spark, sf_dir) -> None:
    """Skip-gram pair counts vs an ordered replay at offsets 1..3."""
    from collections import Counter

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        skipgram_transitions,
    )

    # plan assert: the three leads must share ONE window sort (the
    # first cut's union referenced the frame three times and the plan
    # grew three Scan+Sort+Window branches)
    df = skipgram_transitions(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan
    per_user: dict = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect():
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    want: Counter = Counter()
    for rows in per_user.values():
        rows.sort()
        types = [t for _, _, t in rows]
        for i, src in enumerate(types):
            for gap in (1, 2, 3):
                if i + gap < len(types):
                    want[(src, types[i + gap], gap)] += 1
    got = {
        (r.src, r.dst, r.gap): r.n_pairs for r in df.collect()
    }
    assert got == dict(want)


def test_segment_brand_diversity_vs_python(spark, sf_dir) -> None:
    """Gini-Simpson ppb vs an arbitrary-precision integer replay
    (python ints cannot overflow, so a Spark/DuckDB wrap in the
    squared moments would surface here)."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        segment_brand_diversity,
    )

    seg_of = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    cust_of = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    brand_of = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    counts: dict = defaultdict(int)
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        seg = seg_of[cust_of[r.l_orderkey]]
        counts[(seg, brand_of[r.l_partkey])] += 1
    mom: dict = defaultdict(lambda: [0, 0, 0])
    for (seg, _), n in counts.items():
        m = mom[seg]
        m[0] += n
        m[1] += n * n
        m[2] += 1
    want = {
        seg: (t, nb, (t * t - ss) * 1_000_000_000 // (t * t))
        for seg, (t, ss, nb) in mom.items()
    }
    got = {
        r.segment: (r.total, r.n_brands, r.simpson_ppb)
        for r in segment_brand_diversity(spark, sf_dir).collect()
    }
    assert got == want


def test_backlog_aging_vs_python(spark, sf_dir) -> None:
    """Aging buckets vs a date replay: whole-day diffs against the
    corpus max order date, non-finalized orders only."""
    from collections import Counter

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        backlog_aging,
    )

    orders = load_table(spark, sf_dir, "orders").collect()
    now = max(r.o_orderdate for r in orders).date()
    want_n: Counter = Counter()
    want_c: Counter = Counter()
    for r in orders:
        # NULL status counts as OPEN, matching the query's isNull arm
        if r.o_orderstatus == "F":
            continue
        age = (now - r.o_orderdate.date()).days
        b = (
            "0-30" if age <= 30 else
            "31-90" if age <= 90 else
            "91-365" if age <= 365 else "365+"
        )
        want_n[(r.o_orderpriority, b)] += 1
        want_c[(r.o_orderpriority, b)] += _half_up(r.o_totalprice * 100)
    got = {
        (r.priority, r.age_bucket): (r.n_orders, r.value_c)
        for r in backlog_aging(spark, sf_dir).collect()
    }
    assert got == {k: (want_n[k], want_c[k]) for k in want_n}


def test_equidepth_histogram_vs_python(spark, sf_dir) -> None:
    """Equi-depth buckets vs a sorted replay: boundaries are the
    values whose cumulative count first reaches ceil(i*n/10), bucket
    membership is (lo, hi], and per-bucket counts sum to n."""
    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        equidepth_histogram,
    )

    vals = sorted(
        _half_up(r.o_totalprice * 100)
        for r in load_table(spark, sf_dir, "orders").collect()
    )
    n = len(vals)
    bounds = []
    for b in range(1, 11):
        k = (b * n + 9) // 10  # ceil(b*n/10)
        bounds.append(vals[k - 1])  # 1-indexed positional pick
    want = {}
    lo = None
    for b, hi in enumerate(bounds, 1):
        cnt = sum(
            1 for v in vals if v <= hi and (lo is None or v > lo)
        )
        want[b] = (lo, hi, cnt)
        lo = hi
    got = {
        r.bucket: (r.lo_c, r.hi_c, r.n_orders)
        for r in equidepth_histogram(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(c for _, _, c in got.values()) == n


def test_equidepth_histogram_collision_buckets(spark, tmp_path) -> None:
    """Boundary collisions must EMIT their buckets with n_orders = 0,
    not drop them (review catch): a fake orders table where one value
    spans several deciles (and n < 10) still yields all ten buckets,
    zero-count collision rows, and full coverage."""
    from pyspark.sql import functions as F

    rows = [(i, 1, "O", 7.00, "1995-01-0%d" % (i % 9 + 1), "1-URGENT")
            for i in range(6)]
    rows += [(10, 1, "O", 99.00, "1995-01-02", "1-URGENT")]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderpriority",
    )
    sf = tmp_path / "mini"
    sf.mkdir()
    df.write.parquet(str(sf / "orders.parquet"))

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        equidepth_histogram,
    )

    got = {
        r.bucket: (r.lo_c, r.hi_c, r.n_orders)
        for r in equidepth_histogram(spark, str(sf)).collect()
    }
    assert set(got) == set(range(1, 11))  # ALL buckets present
    # n = 7: boundary pick b has ceil(b*7/10) <= 6 for b <= 8, so the
    # six 700s own buckets 1..8 (2..8 collide at hi == 700 with zero
    # counts); bucket 9 picks 9900 and holds the one remaining row,
    # bucket 10 collides at 9900 - assert the FULL panel
    assert got == {
        1: (None, 700, 6),
        **{b: (700, 700, 0) for b in range(2, 9)},
        9: (700, 9900, 1),
        10: (9900, 9900, 0),
    }
    assert sum(c for _, _, c in got.values()) == 7


def test_join_null_safe_vs_python(spark, sf_dir) -> None:
    """Null-safe join vs a dict replay: the NULL group matches itself
    (a plain equi join would drop it)."""
    from collections import Counter

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        join_null_safe,
    )

    even: Counter = Counter()
    odd: Counter = Counter()
    for r in load_table(spark, sf_dir, "orders").collect():
        pr = None if r.o_orderpriority == "3-MEDIUM" else r.o_orderpriority
        (even if r.o_orderkey % 2 == 0 else odd)[pr] += 1
    want = {
        pr: (even[pr], odd[pr])
        for pr in set(even) & set(odd)
    }
    got = {
        r.pr: (r.n_even, r.n_odd)
        for r in join_null_safe(spark, sf_dir).collect()
    }
    assert got == want
    assert None in got  # the null-safe match the plain join drops


def test_lateral_posexplode_vs_python(spark, sf_dir) -> None:
    """Position-preserving expansion vs a python replay: 0-based
    positions follow ARRAY order, capped at 5 tokens, empty docs
    emit nothing."""
    import re

    from etl_marketdata_downloader_archived_spark.plans.analytics_r10 import (
        lateral_posexplode,
    )

    want = set()
    for r in load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect():
        toks = [t for t in re.split(r"[^a-z]+", r.text.lower()) if t][:5]
        for i, t in enumerate(toks):
            want.add((r.doc_id, i, t))
    got = {
        (r.doc_id, r.pos, r.token)
        for r in lateral_posexplode(spark, sf_dir).collect()
    }
    assert got == want
