"""Round-7 analytics extensions: interval-union coverage, activity
streaks, degree assortativity, weighted medians - registered past the
certified window (parity-verified locally by tools/parity.py, the
driver's identical check, no certificate).

Same cross-engine exactness discipline as plans/analytics_ext: every
corpus-sized reduction is an integer (epoch micros, day counts,
degree moments, bigint weights), selections instead of
interpolations, and any final float is ONE fixed IEEE expression over
those integers - so the DuckDB oracles replay each query bit-for-bit
with no rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.profile import percentile_pick as _pct_pick
from ..operators.profile import stepped_counts as _stepped_counts
from .registry import q


@q(
    "interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               GREATEST(epoch_us(ts)
                          + CAST(floor(value) AS BIGINT) * 60000000,
                        epoch_us(ts)) AS e
        FROM events
        WHERE value IS NOT NULL
    ),
    swept AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pe
        FROM iv
    ),
    blk AS (
        SELECT user_id, s, e,
               SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS b
        FROM swept
    ),
    pb AS (
        SELECT user_id, b, min(s) AS bs, max(e) AS be,
               CAST(count(*) AS BIGINT) AS n
        FROM blk GROUP BY user_id, b
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT)       AS n_intervals,
           CAST(count(*) AS BIGINT)     AS n_blocks,
           CAST(sum(be - bs) AS BIGINT) AS covered
    FROM pb GROUP BY user_id
    """,
)
def interval_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals time coverage per user: each event opens an
    interval of floor(value) minutes; overlaps merge, touching merges,
    and the per-user covered micros total is exact bigint arithmetic
    end to end (operators.sessions.interval_coverage - the
    uptime/time-on-site primitive). The oracle replays the identical
    running-max gaps-and-islands sweep; block assignment is provably
    insensitive to start-tie order (an interval's end >= its start),
    so no tie-break column is needed on either engine. NULL durations
    are filtered on BOTH engines (Spark's greatest skips NULLs while
    DuckDB's propagates them, so an unfiltered NULL value would
    diverge) and the operator's end<start clamp is mirrored in the
    oracle with GREATEST - a fixture refresh with NULL or negative
    values keeps parity instead of silently drifting."""
    from ..operators.sessions import interval_coverage

    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor("value").cast("bigint") * F.lit(60000000).cast("bigint")
        ).alias("e"),
    )
    return interval_coverage(iv, ["user_id"], "s", "e")


@q(
    "activity_streaks",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY d) AS INTEGER) AS isl
        FROM d
    ),
    st AS (
        SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len,
               max(d) AS e
        FROM isl GROUP BY user_id, isl
    ),
    agg AS (
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS n_active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak
        FROM st GROUP BY user_id
    )
    SELECT a.user_id, a.n_active_days, a.n_streaks, a.longest_streak,
           max(s.e) AS longest_streak_end
    FROM agg a
    JOIN st s ON s.user_id = a.user_id AND s.len = a.longest_streak
    GROUP BY a.user_id, a.n_active_days, a.n_streaks, a.longest_streak
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks per user (gaps-and-islands over
    DISTINCT days - operators.sessions.day_streaks): longest streak,
    streak count, active-day total, and the end date of the longest
    streak (ties -> latest, via max_by on the (len, end) struct; the
    oracle reproduces the same selection with a join + max). Windows
    run over day cardinality, never event rows."""
    from ..operators.sessions import day_streaks

    e = load_table(spark, sf_dir, "events")
    return day_streaks(e, ["user_id"], "ts")


@q(
    "graph_assortativity",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey % 11 = 0
    ),
    e0 AS (
        SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                        greatest(x.l_partkey, y.l_partkey) AS b
        FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
    ),
    deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e0
              UNION ALL SELECT b FROM e0)
        GROUP BY node
    ),
    ends AS (
        SELECT da.deg AS dx, db.deg AS dy
        FROM e0 JOIN deg da ON e0.a = da.node
                JOIN deg db ON e0.b = db.node
    ),
    sym AS (
        SELECT dx AS x, dy AS y FROM ends
        UNION ALL SELECT dy, dx FROM ends
    ),
    mm AS (
        SELECT CAST(count(*) AS BIGINT)   AS n,
               CAST(sum(x) AS BIGINT)     AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM sym
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           CAST(n // 2 AS BIGINT) AS n_edges,
           CASE WHEN n * sxx - sx * sx > 0
                THEN CAST(n * sxy - sx * sx AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS assortativity
    FROM mm
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-order graph (same 1-in-11
    sparsified edge set kcore_parts peels) - Newman's r as a RATIONAL
    function of bigint degree moments (the both-directions edge-end
    list makes the x/y marginals coincide, eliminating the sqrt), so
    the oracle replays the exact arithmetic. No iteration: one degree
    aggregate, two joins of the dim-sized degree table, one scalar
    aggregate."""
    from ..operators.graph import degree_assortativity

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 11 == 0
    )
    x = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    y = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return degree_assortativity(e)


@q(
    "weighted_median_price",
    oracle="""
    WITH g AS (
        SELECT l_returnflag AS grp, l_extendedprice AS v,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND CAST(floor(l_quantity) AS BIGINT) > 0
        GROUP BY l_returnflag, l_extendedprice
    ),
    stepped AS (
        SELECT grp, v,
               CAST(sum(w) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
                 AS cum,
               CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tot
        FROM g
    )
    SELECT grp AS l_returnflag,
           CAST(max(tot) AS BIGINT) AS total_weight,
           min(v) AS median
    FROM stepped WHERE 2 * cum >= tot GROUP BY grp
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted (lower) median extended price per return
    flag - operators.profile.weighted_median's rank-from-counts
    selection: collapse to per-(flag, distinct price) bigint weight
    sums, cumulative over the price order, pick the first value whose
    doubled cumulative weight reaches the total. Pure selection (the
    median is an observed price), so the result is engine-exact with
    no rounding; the window input is bounded by price cardinality.
    The oracle replays the operator's truncate-then-filter weight
    semantics with CAST(floor(qty)) (DuckDB's decimal->BIGINT cast
    ROUNDS while Spark's truncates; for the w>0 survivors value>=1 so
    floor == truncate-toward-zero and both engines agree even for
    fractional weights)."""
    from ..operators.profile import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(
        li, "l_extendedprice", "l_quantity", by=["l_returnflag"]
    )


@q(
    "weighted_median_binned",
    oracle="""
    WITH base AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(floor(l_quantity) AS BIGINT) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND CAST(floor(l_quantity) AS BIGINT) > 0
    ),
    b AS (
        SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
               CAST(max(l_extendedprice) AS DOUBLE) AS hi
        FROM base
    ),
    g AS (
        SELECT l_returnflag AS grp,
               CASE WHEN l_extendedprice >= b.hi THEN CAST(65 AS BIGINT)
                    ELSE CAST(floor(
                        64.0 * (CAST(l_extendedprice AS DOUBLE) - b.lo)
                        / (b.hi - b.lo) + 1) AS BIGINT)
               END AS v,
               CAST(sum(w) AS BIGINT) AS w,
               min(l_extendedprice) AS minv
        FROM base, b
        GROUP BY 1, 2
    ),
    stepped AS (
        SELECT grp, v, minv,
               CAST(sum(w) OVER (PARTITION BY grp ORDER BY v)
                    AS BIGINT) AS cum,
               CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tot
        FROM g
    )
    SELECT grp AS l_returnflag,
           CAST(max(tot) AS BIGINT) AS total_weight,
           arg_min(minv, v) AS median
    FROM stepped WHERE 2 * cum >= tot GROUP BY grp
    """,
)
def weighted_median_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``weighted_median_price`` under the binned scale tier
    (operators.profile.weighted_median with ``bins=64``): the fixture
    prices are near-fully distinct (583K of 600K rows at sf0.1), so
    the exact tier's per-flag cumulative window degenerates toward
    row scale - exactly the continuous-score case the family's
    ``bins=`` tier exists for. Quantized, the selection runs over at
    most 66 buckets per flag at ANY corpus size; the reported median
    is the smallest observed price in the median's bucket. The oracle
    replays the width_bucket grid arithmetic bit-for-bit
    (floor(bins*(v-lo)/(hi-lo)+1), hi -> bins+1) plus the identical
    doubled-cumulative-weight selection, certifying the quantized
    path end to end - the approximation is only binned-vs-exact
    median, bounded by one bin width (asserted in
    tests/test_analytics_ext.py)."""
    from ..operators.profile import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(
        li, "l_extendedprice", "l_quantity", by=["l_returnflag"], bins=64
    )


@q(
    "attribution_channels",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        FROM events
    ),
    conv AS (
        SELECT event_id, user_id, us FROM ev
        WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id, event_type, us FROM ev
        WHERE event_type IN ('click', 'view', 'signup')
    ),
    pairs AS (
        SELECT c.event_id, t.event_type AS ch, t.us AS tus,
               row_number() OVER (PARTITION BY c.event_id
                                  ORDER BY t.us DESC,
                                           t.event_id DESC) AS rn
        FROM conv c
        JOIN touch t ON t.user_id = c.user_id
                    AND t.us < c.us
                    AND t.us >= c.us - 604800000000
    ),
    best AS (SELECT event_id, ch, tus FROM pairs WHERE rn = 1)
    SELECT coalesce(b.ch, 'unattributed') AS channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(c.us - b.tus) AS BIGINT) AS total_latency_us
    FROM conv c LEFT JOIN best b ON b.event_id = c.event_id
    GROUP BY 1
    """,
)
def attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchases to click/view/signup
    touches within a 7-day lookback
    (operators.sessions.attribute_conversions - ONE per-user range
    window over epoch micros, no self-join), rolled up to channel
    totals with exact bigint latency sums. The oracle computes the
    same assignment by the O(conversions x touches) pair join +
    row_number - an independent FORMULATION, so a frame-boundary bug
    (strictly-before, lookback edge) on the window path cannot hide;
    ties at the same instant break on event id in both."""
    from ..operators.sessions import attribute_conversions

    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    attributed = attribute_conversions(
        ev,
        "user_id",
        "us",
        "event_type",
        "event_id",
        conversion_type="purchase",
        channel_types=["click", "view", "signup"],
        lookback_us=7 * 24 * 3600 * 1_000_000,
    )
    return attributed.groupBy(
        F.coalesce(F.col("channel"), F.lit("unattributed")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("latency_us").alias("total_latency_us"),
    )


@q(
    "twap_daily",
    oracle="""
    WITH t AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               epoch_us(ts) AS us, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    seg AS (
        SELECT event_type, day, c,
               lead(us) OVER (PARTITION BY event_type, day
                              ORDER BY us, event_id) - us AS dur
        FROM t
    ),
    g AS (
        SELECT event_type, day,
               CAST(count(*) AS BIGINT)    AS n_ticks,
               CAST(sum(dur) AS BIGINT)    AS span0,
               CAST(sum(dur * c) AS BIGINT) AS wsum
        FROM seg GROUP BY 1, 2
    )
    SELECT event_type, day, n_ticks,
           coalesce(span0, 0) AS span_us,
           CASE WHEN span0 > 0
                THEN CAST(wsum AS DOUBLE) / CAST(span0 AS DOUBLE)
           END AS twap_cents
    FROM g
    """,
)
def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily TWAP per event_type (operators.timeseries.twap): each
    tick's int-cents value held until the next tick of the same
    (type, day), duration-weighted over exact epoch-micros bigints,
    one IEEE division at the end - the ohlc_bars int-cents discipline
    applied to time weighting. Same-instant ticks are ordered by
    event_id on both engines; the earlier one holds for zero micros,
    so ties contribute nothing either way."""
    from ..operators.timeseries import twap

    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    t = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    return twap(t, ["event_type", "day"], "us", "c", "event_id")


@q(
    "user_growth",
    oracle="""
    WITH active AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    fs AS (
        SELECT user_id, min(day) AS first_day FROM active GROUP BY user_id
    ),
    per_day AS (
        SELECT a.day,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(count(*) FILTER (WHERE f.first_day = a.day)
                    AS BIGINT) AS n_new
        FROM active a JOIN fs f ON f.user_id = a.user_id
        GROUP BY a.day
    )
    SELECT day, n_active, n_new,
           n_active - n_new AS n_returning,
           CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT)
             AS cum_users
    FROM per_day
    """,
)
def user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-growth curve: actives, first-seen news, returning,
    and the cumulative distinct-user count - the product growth
    dashboard's backbone. Exact integers throughout: collapse to
    DISTINCT (day, user) once (the only event-scale shuffle), first
    seen via a per-user min, and the cumulative window runs over ONE
    ROW PER CALENDAR DAY (whitelisted global window - bounded by the
    corpus's day span, never events or users)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    active = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    fs = active.groupBy("user_id").agg(F.min("day").alias("first_day"))
    per_day = (
        active.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(
                F.when(F.col("first_day") == F.col("day"), 1)
            ).alias("n_new"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(w).alias("cum_users"),
    )


@q(
    "resample_interp",
    oracle="""
    WITH src AS (
        SELECT event_type, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS t0,
               date_trunc('hour', max(ts)) AS t1
        FROM src
    ),
    grid AS (
        SELECT k.event_type, g.bar_ts
        FROM (SELECT DISTINCT event_type FROM src) k,
             (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
                  AS bar_ts
              FROM bounds) g
    ),
    obs AS (
        SELECT event_type, bar_ts, c AS _obs
        FROM (
            SELECT event_type, date_trunc('hour', ts) AS bar_ts, c,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM src
        )
        WHERE rn = 1
    ),
    nb AS (
        SELECT g.event_type, g.bar_ts, o._obs,
               epoch_us(g.bar_ts) AS t,
               last_value(o._obs IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN o._obs IS NOT NULL
                               THEN epoch_us(g.bar_ts) END
                          IGNORE NULLS) OVER wb AS pt,
               first_value(o._obs IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN o._obs IS NOT NULL
                                THEN epoch_us(g.bar_ts) END
                           IGNORE NULLS) OVER wf AS nt
        FROM grid g
        LEFT JOIN obs o ON g.event_type = o.event_type
                       AND g.bar_ts = o.bar_ts
        WINDOW wb AS (PARTITION BY g.event_type ORDER BY g.bar_ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY g.event_type ORDER BY g.bar_ts
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bar_ts,
           CASE WHEN _obs IS NOT NULL THEN CAST(_obs AS DOUBLE)
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN CAST(pv AS DOUBLE)
                     + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                       * (CAST(t - pt AS DOUBLE)
                          / CAST(nt - pt AS DOUBLE))
                WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
           END AS value_cents,
           CASE WHEN _obs IS NOT NULL THEN 'obs'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                WHEN pv IS NOT NULL THEN 'ffill'
           END AS kind
    FROM nb
    """,
)
def resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly linear-interpolation resample of int-cents values per
    event_type (operators.timeseries.resample_interpolate): interior
    gaps get prev + (next - prev) * (dt/span) over exact
    bigint cents and epoch-micros deltas - one fixed IEEE expression
    the oracle replays bit-for-bit, NO rounding tolerance. Leading
    cells NULL, trailing cells forward-fill, kind column says which
    path produced each cell."""
    from ..operators.timeseries import resample_interpolate

    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    src = e.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    return resample_interpolate(
        src, "event_type", "ts", "c", width="hour", tie_break="event_id"
    )


@q(
    "percentiles_exact",
    oracle="""
    WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS t
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    stepped AS (
        SELECT event_type, v,
               CAST(sum(t) OVER (PARTITION BY event_type ORDER BY v)
                    AS BIGINT) AS cum,
               CAST(sum(t) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM g
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50_cents,
           min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90_cents,
           min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99_cents
    FROM stepped GROUP BY event_type
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of int-cents values per event_type by
    rank-from-counts POSITIONAL selection (lower percentile: the
    smallest value whose cumulative count reaches ceil(p*n/100)) -
    the latency-SLA panel, engine-exact because the answer is always
    an observed value chosen by integer comparisons (ceil via
    (n*p+99) DIV 100 - no float ever enters). The window runs over
    distinct-value cardinality; the three selections share one
    stepped table and collapse in a single aggregate. The mergeable
    alternative at unbounded cardinality is operators.sketches'
    quantile sketch (quantile_rollup) - this is the exact tier."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    g = e.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).alias("t"))
    stepped = _stepped_counts(g, ["event_type"], "v")
    return stepped.groupBy("event_type").agg(
        F.max("n").alias("n"),
        _pct_pick(50, "v", "p50_cents"),
        _pct_pick(90, "v", "p90_cents"),
        _pct_pick(99, "v", "p99_cents"),
    )


@q(
    "cusum_shift",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    stepped AS (
        SELECT event_type, day,
               CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS cum,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY day) AS BIGINT) AS i,
               CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM d
    ),
    dev AS (
        SELECT event_type, day, n, tot,
               abs(n * cum - i * tot) AS dv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(n * cum - i * tot) DESC,
                                           day ASC) AS rn
        FROM stepped
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_buckets,
           CAST(max(tot) AS BIGINT) AS total,
           min(CASE WHEN rn = 1 THEN day END) AS change_bucket,
           CAST(max(dv) AS BIGINT) AS peak_dev
    FROM dev GROUP BY event_type
    """,
)
def cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift locator per event_type over daily int-cents sums
    (operators.profile.cusum_changepoint): the day where the CUSUM
    chart |n*cum_i - i*total| peaks, every term a bigint so location
    AND peak replay exactly (the oracle takes the argmax via a
    DESC/day-ASC row_number - an independent selection formulation
    vs the operator's min_by struct). Windows run over per-type day
    cardinality, calendar-bounded."""
    from ..operators.profile import cusum_changepoint

    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("x")
    )
    return cusum_changepoint(d, ["event_type"], "day", "x")


@q(
    "fulfillment_latency",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    ),
    g AS (
        SELECT priority, d, CAST(count(*) AS BIGINT) AS t
        FROM lat GROUP BY 1, 2
    ),
    stepped AS (
        SELECT priority, d,
               CAST(sum(t) OVER (PARTITION BY priority ORDER BY d)
                    AS BIGINT) AS cum,
               CAST(sum(t) OVER (PARTITION BY priority) AS BIGINT) AS n,
               CAST(sum(d * t) OVER (PARTITION BY priority)
                    AS BIGINT) AS tot_d
        FROM g
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(tot_d) AS DOUBLE) / CAST(max(n) AS DOUBLE)
             AS mean_days,
           min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN d END) AS p50_days,
           min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN d END) AS p90_days
    FROM stepped GROUP BY priority
    """,
)
def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per order priority: exact integer day
    diffs from the orders-lineitem equi-join, mean as one IEEE
    division over bigint sums, p50/p90 by the rank-from-counts
    positional selection (ceil via integer DIV - same machinery as
    percentiles_exact). The join shuffles on the order key; the
    windows run over distinct-latency cardinality (bounded by the
    calendar), never line items."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate").isNotNull()
            & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("d"),
        )
    )
    g = lat.groupBy("priority", "d").agg(F.count(F.lit(1)).alias("t"))
    stepped = _stepped_counts(g, ["priority"], "d", with_value_total=True)
    return stepped.groupBy("priority").agg(
        F.max("n").alias("n"),
        (
            F.max("tot_v").cast("double") / F.max("n").cast("double")
        ).alias("mean_days"),
        _pct_pick(50, "d", "p50_days"),
        _pct_pick(90, "d", "p90_days"),
    )


@q(
    "basket_pairs",
    oracle="""
    WITH op0 AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    keep AS (
        SELECT l_orderkey FROM op0 GROUP BY 1 HAVING count(*) <= 32
    ),
    op AS (
        SELECT op0.l_orderkey, op0.l_partkey
        FROM op0 JOIN keep ON keep.l_orderkey = op0.l_orderkey
    ),
    norder AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
               FROM op),
    item AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        FROM op GROUP BY 1
    ),
    pair AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b,
               CAST(count(*) AS BIGINT) AS ab
        FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey
                           AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    )
    SELECT p.a, p.b, p.ab,
           CAST(p.ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
           CAST(p.ab AS DOUBLE) / CAST(ia.c AS DOUBLE) AS confidence,
           CAST(n.n * p.ab AS DOUBLE)
             / CAST(ia.c * ib.c AS DOUBLE) AS lift
    FROM pair p
    JOIN item ia ON ia.l_partkey = p.a
    JOIN item ib ON ib.l_partkey = p.b
    CROSS JOIN norder n
    ORDER BY p.ab DESC, p.a, p.b
    LIMIT 50
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over co-ordered parts
    (operators.ranking.mine_basket_pairs): support / confidence /
    lift for the top-50 pairs (min co-count 2) by co-occurrence,
    every metric an exact IEEE division over bigint counts (n*ab and
    c_a*c_b stay integral, so lift replays bit-for-bit). The pair
    join is the bucketed co-order self-join (same shape the graph
    family certifies - never all-pairs across orders), min-support
    prunes before the metric joins, item counts broadcast, and the
    top-50 runs as TakeOrderedAndProject (per-partition heaps, no
    global sort) under the deterministic (ab DESC, a, b) order.
    ``max_basket_size=32`` guards the quadratic per-basket pair mass
    (one 10k-part order would emit ~50M pairs from a single join
    key): inert on TPC-H orders (max ~7 distinct parts) and the
    oracle mirrors it with the kept-basket HAVING, so the cap
    semantics are themselves parity-checked."""
    from ..operators.ranking import mine_basket_pairs

    li = load_table(spark, sf_dir, "lineitem")
    out = mine_basket_pairs(
        li.select("l_orderkey", "l_partkey"),
        "l_orderkey",
        "l_partkey",
        min_support=2,
        max_basket_size=32,
    )
    return out.orderBy(F.col("ab").desc(), "a", "b").limit(50)


@q(
    "lorenz_curve",
    oracle="""
    WITH v AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, n, CAST(count(*) AS BIGINT) AS t
        FROM v GROUP BY 1, 2
    ),
    stepped AS (
        SELECT event_type, n, t,
               CAST(sum(t) OVER (PARTITION BY event_type ORDER BY n)
                    AS BIGINT) AS cum_u,
               CAST(sum(n * t) OVER (PARTITION BY event_type ORDER BY n)
                    AS BIGINT) AS cum_a,
               CAST(sum(t) OVER (PARTITION BY event_type) AS BIGINT)
                 AS tot_u,
               CAST(sum(n * t) OVER (PARTITION BY event_type) AS BIGINT)
                 AS tot_a
        FROM d
    ),
    bucketed AS (
        SELECT event_type,
               CAST(ceil(CAST(cum_u AS DOUBLE) * 10
                         / CAST(tot_u AS DOUBLE)) AS BIGINT) AS decile,
               max(cum_u) AS cum_users, max(cum_a) AS cum_activity,
               max(tot_u) AS tot_u, max(tot_a) AS tot_a
        FROM stepped GROUP BY 1, 2
    )
    SELECT event_type, decile,
           CAST(cum_users AS BIGINT) AS cum_users,
           CAST(cum_users AS DOUBLE) / CAST(tot_u AS DOUBLE)
             AS user_share,
           CAST(cum_activity AS DOUBLE) / CAST(tot_a AS DOUBLE)
             AS activity_share
    FROM bucketed
    """,
)
def lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points per event_type - the plottable companion
    of gini_activity: users ascending by activity collapse to
    per-(type, distinct count) tie groups (rank-from-counts, windows
    over count cardinality), each group lands in the decile of its
    LAST cumulative position (score_deciles' convention - exact
    ceil over one IEEE division), and the cumulative user/activity
    shares are single divisions over bigint sums."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    v = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    d = v.groupBy("event_type", "n").agg(F.count(F.lit(1)).alias("t"))
    wv = W.partitionBy("event_type").orderBy("n")
    wt = W.partitionBy("event_type")
    stepped = d.select(
        "event_type",
        F.sum("t").over(wv).alias("cum_u"),
        F.sum(F.col("n") * F.col("t")).over(wv).alias("cum_a"),
        F.sum("t").over(wt).alias("tot_u"),
        F.sum(F.col("n") * F.col("t")).over(wt).alias("tot_a"),
    )
    decile = F.ceil(
        F.col("cum_u").cast("double") * 10 / F.col("tot_u").cast("double")
    ).cast("bigint")
    b = stepped.groupBy("event_type", decile.alias("decile")).agg(
        F.max("cum_u").alias("cum_users"),
        F.max("cum_a").alias("cum_activity"),
        F.max("tot_u").alias("_tu"),
        F.max("tot_a").alias("_ta"),
    )
    return b.select(
        "event_type",
        "decile",
        "cum_users",
        (
            F.col("cum_users").cast("double") / F.col("_tu").cast("double")
        ).alias("user_share"),
        (
            F.col("cum_activity").cast("double") / F.col("_ta").cast("double")
        ).alias("activity_share"),
    )


@q(
    "ltv_quintiles",
    oracle="""
    WITH cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_c,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    d AS (
        SELECT segment, spend_c, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(n_orders) AS BIGINT) AS ords
        FROM cust GROUP BY 1, 2
    ),
    stepped AS (
        SELECT segment, spend_c, t, ords,
               CAST(sum(t) OVER (PARTITION BY segment ORDER BY spend_c)
                    AS BIGINT) AS cum_u,
               CAST(sum(t) OVER (PARTITION BY segment) AS BIGINT) AS tot_u,
               CAST(sum(spend_c * t) OVER (PARTITION BY segment)
                    AS BIGINT) AS tot_s
        FROM d
    ),
    b AS (
        SELECT segment,
               CAST(ceil(CAST(cum_u AS DOUBLE) * 5
                         / CAST(tot_u AS DOUBLE)) AS BIGINT) AS quintile,
               CAST(sum(t) AS BIGINT) AS n_customers,
               CAST(sum(ords) AS BIGINT) AS n_orders,
               CAST(sum(spend_c * t) AS BIGINT) AS spend_sum,
               max(tot_s) AS tot_s
        FROM stepped GROUP BY 1, 2
    )
    SELECT segment, quintile, n_customers, n_orders,
           CAST(spend_sum AS DOUBLE) / CAST(tot_s AS DOUBLE)
             AS spend_share,
           CAST(spend_sum AS DOUBLE) / CAST(n_customers AS DOUBLE) / 100.0
             AS avg_spend
    FROM b
    """,
)
def ltv_quintiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value quintiles per market segment: customers
    ascending by exact int-cents total spend collapse to per-(segment,
    distinct spend) tie groups (rank-from-counts - the Lorenz/decile
    machinery over the orders fact joined to the customer dim), each
    group landing in the quintile of its last cumulative position;
    per quintile the customer/order counts are bigints and the spend
    share / average are single IEEE divisions. The workhorse
    segmentation cut ("what revenue share does the top quintile
    carry, per segment"), engine-exact with no rounding tolerance;
    windows are partitioned by segment and bounded by distinct-spend
    cardinality, never raw orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("segment", "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("spend_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    d = cust.groupBy("segment", "spend_c").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("n_orders").alias("ords"),
    )
    wv = W.partitionBy("segment").orderBy("spend_c")
    wt = W.partitionBy("segment")
    stepped = d.select(
        "segment",
        "spend_c",
        "t",
        "ords",
        F.sum("t").over(wv).alias("cum_u"),
        F.sum("t").over(wt).alias("tot_u"),
        F.sum(F.col("spend_c") * F.col("t")).over(wt).alias("tot_s"),
    )
    quintile = F.ceil(
        F.col("cum_u").cast("double") * 5 / F.col("tot_u").cast("double")
    ).cast("bigint")
    b = stepped.groupBy("segment", quintile.alias("quintile")).agg(
        F.sum("t").alias("n_customers"),
        F.sum("ords").alias("n_orders"),
        F.sum(F.col("spend_c") * F.col("t")).alias("spend_sum"),
        F.max("tot_s").alias("_ts"),
    )
    return b.select(
        "segment",
        "quintile",
        "n_customers",
        "n_orders",
        (
            F.col("spend_sum").cast("double") / F.col("_ts").cast("double")
        ).alias("spend_share"),
        (
            F.col("spend_sum").cast("double")
            / F.col("n_customers").cast("double")
            / 100.0
        ).alias("avg_spend"),
    )
