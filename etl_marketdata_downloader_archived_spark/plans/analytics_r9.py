"""Round-9 analytics extensions - registered past the certified
window (parity-verified locally by tools/parity.py, the driver's
identical check, no certificate).

Same cross-engine exactness discipline as plans/analytics_ext,
analytics_r7, and analytics_r8: every corpus-sized reduction is an
integer (int-cents fix-point, bigint counts), selections instead of
interpolations, and any final float is ONE fixed IEEE expression over
those integers - so the DuckDB oracles replay each query bit-for-bit
with no rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q


@q(
    "reconcile_worklist",
    oracle="""
    WITH l AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS line_c,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    ),
    j AS (
        SELECT o.o_orderkey, o.o_orderstatus,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS order_c,
               l.line_c,
               CAST(coalesce(l.n_lines, 0) AS BIGINT) AS n_lines,
               CASE WHEN l.l_orderkey IS NULL THEN NULL
                    ELSE abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
                             - l.line_c) END AS abs_diff_c,
               CASE WHEN l.l_orderkey IS NULL THEN 'no_lines'
                    WHEN abs(CAST(round(o.o_totalprice * 100) AS BIGINT)
                             - l.line_c) > 5 THEN 'mismatch'
                    ELSE 'ok' END AS status
        FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderkey, o_orderstatus, order_c, line_c, n_lines,
           abs_diff_c, status
    FROM j WHERE status <> 'ok'
    ORDER BY abs_diff_c DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
)
def reconcile_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation WORKLIST: the 50 worst order-vs-lines money
    discrepancies as per-order rows - the drill-down companion of the
    ``order_reconciliation`` status panel (that one says HOW MUCH
    mismatch mass exists per status; this says WHICH orders to open
    first), and the batch anchor of the streaming twin
    (streaming.stateful.streaming_reconciliation emits these same
    per-order verdicts in-flight; its pytest asserts
    last-emission-per-order == this arithmetic). Both sides fix to
    int cents with the panel's exact rounded-IEEE expression, the
    compare and ordering are pure bigint, 'no_lines' orders carry
    NULL diffs and rank after every real discrepancy
    (desc_nulls_last on both engines, orderkey tiebreak), so the
    worklist replays bit-for-bit.

    Shape: one lineitem aggregate shuffled on the order key, one LEFT
    join from orders, then TakeOrderedAndProject(50) over the
    order-aggregated frame - never raw lines; no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l_agg = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        ).alias("line_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("order_c"),
        )
        .join(l_agg, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    )
    adiff = F.when(
        F.col("l_orderkey").isNotNull(),
        F.abs(F.col("order_c") - F.col("line_c")),
    )
    status = (
        F.when(F.col("l_orderkey").isNull(), F.lit("no_lines"))
        .when(adiff > 5, F.lit("mismatch"))
        .otherwise(F.lit("ok"))
    )
    return (
        j.select(
            "o_orderkey",
            "o_orderstatus",
            "order_c",
            "line_c",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            adiff.alias("abs_diff_c"),
            status.alias("status"),
        )
        .filter(F.col("status") != "ok")
        .orderBy(
            F.col("abs_diff_c").desc_nulls_last(), F.col("o_orderkey")
        )
        .limit(50)
    )


@q(
    "same_day_orders",
    oracle="""
    WITH g AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_c,
               CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS min_c,
               CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS max_c
        FROM orders GROUP BY 1, 2 HAVING count(*) > 1
    )
    SELECT o_custkey, order_day, n_orders, total_c, min_c, max_c,
           min_c = max_c AS same_amount
    FROM g
    ORDER BY n_orders DESC, total_c DESC, o_custkey
    LIMIT 100
    """,
)
def same_day_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-submission audit gate: customers who placed MORE THAN
    ONE order on the same calendar day, with the day's order count,
    total, and amount spread - same_amount=true (min==max cents) is
    the classic double-click/replayed-submission signature an
    accounts-payable audit opens first; distinct amounts are
    split-order behavior. The fraud-surface companion of
    reconcile_worklist (that one checks the money adds up; this one
    checks the ORDER STREAM looks organic). All cells are bigint
    cents / counts - bit-exact replay - and the worklist is
    deterministically ordered (count, total, custkey) and capped.

    Shape: one partial-combined aggregate on (custkey, day) with the
    HAVING filter applied at the aggregate (output is
    violation-sized), then TakeOrderedAndProject(100). No windows, no
    joins."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.groupBy(
            "o_custkey", F.to_date("o_orderdate").alias("order_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_c"),
            F.min(cents).alias("min_c"),
            F.max(cents).alias("max_c"),
        )
        .filter(F.col("n_orders") > 1)
        .select(
            "o_custkey", "order_day", "n_orders", "total_c",
            "min_c", "max_c",
            (F.col("min_c") == F.col("max_c")).alias("same_amount"),
        )
        .orderBy(
            F.col("n_orders").desc(), F.col("total_c").desc(), "o_custkey"
        )
        .limit(100)
    )


@q(
    "seasonality_index",
    oracle="""
    WITH m AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1, 2
    ),
    y AS (
        SELECT yr, CAST(sum(rev_c) AS BIGINT) AS yr_rev_c,
               CAST(count(*) AS BIGINT) AS n_months
        FROM m GROUP BY 1
    )
    SELECT m.yr, m.mo, m.rev_c, m.n_orders, y.yr_rev_c, y.n_months,
           CAST(m.rev_c * y.n_months AS DOUBLE)
             / CAST(y.yr_rev_c AS DOUBLE) AS seasonal_idx
    FROM m JOIN y ON y.yr = m.yr
    ORDER BY m.yr, m.mo
    """,
)
def seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue seasonality index: each (year, month)'s revenue
    relative to that year's monthly AVERAGE - index 1.0 = an average
    month, 1.3 = a 30%-hot month - the classical demand-planning
    normalization, computed per year so a growth trend does not
    masquerade as seasonality. Partial years divide by their OWN
    month count (n_months), not 12, so no month is compared against
    phantom zero months. Revenue fixes to bigint cents; the index is
    ONE IEEE division of two exactly-agreed integers
    (rev_c * n_months / yr_rev_c), so every cell replays bit-for-bit.

    Shape: one (year, month) aggregate - 84 rows on this corpus,
    calendar-bounded at any data scale - then a year-level
    re-aggregate of that 84-row frame and a broadcast join back.
    Window-free; nothing beyond the first aggregate ever touches fact
    rows."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("rev_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    y = m.groupBy("yr").agg(
        F.sum("rev_c").alias("yr_rev_c"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return (
        m.join(F.broadcast(y), "yr")
        .select(
            "yr", "mo", "rev_c", "n_orders", "yr_rev_c", "n_months",
            (
                (F.col("rev_c") * F.col("n_months")).cast("double")
                / F.col("yr_rev_c").cast("double")
            ).alias("seasonal_idx"),
        )
        .orderBy("yr", "mo")
    )


@q(
    "xyz_classification",
    oracle="""
    WITH md AS (
        SELECT l_partkey, date_trunc('year', l_shipdate) AS mo,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ),
    mm AS (
        SELECT CAST(count(DISTINCT mo) AS BIGINT) AS n_periods FROM md
    ),
    per_part AS (
        SELECT l_partkey,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS ss,
               CAST(count(*) AS BIGINT) AS n_active
        FROM md GROUP BY 1
    ),
    cls AS (
        SELECT p.l_partkey, p.s,
               CAST(mm.n_periods AS HUGEINT) * CAST(p.ss AS HUGEINT)
                 - CAST(p.s AS HUGEINT) * CAST(p.s AS HUGEINT) AS a,
               CAST(p.s AS HUGEINT) * CAST(p.s AS HUGEINT) AS s2
        FROM per_part p CROSS JOIN mm
    ),
    tagged AS (
        SELECT l_partkey, s,
               CASE WHEN 4 * a <= s2 THEN 'X'
                    WHEN a <= s2 THEN 'Y'
                    ELSE 'Z' END AS klass,
               CAST(a AS DOUBLE) / CAST(s2 AS DOUBLE) AS cv2
        FROM cls
    )
    SELECT klass,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(s) AS BIGINT) AS total_qty,
           min(cv2) AS min_cv2,
           max(cv2) AS max_cv2
    FROM tagged GROUP BY 1 ORDER BY klass
    """,
)
def xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification - the forecastability
    axis that pairs with ``pareto_abc``'s value axis (ABC says what a
    part is WORTH, XYZ says whether its demand can be FORECAST): per
    part, monthly shipped quantity over the corpus's global month
    grid, class X when the coefficient of variation <= 0.5, Y when
    <= 1, else Z - months with no shipments count as ZERO demand (the
    textbook definition; classifying only on active months would call
    an intermittent part steady). The zero months never materialize:
    with M grid months, mean = s/M and var = (M*ss - s^2)/M^2 over
    the SPARSE period sums, so cv^2 = (M*ss - s^2)/s^2 and the class
    thresholds are pure INTEGER cross-multiplications
    (4*(M*ss - s^2) <= s^2 for X) - no float ever decides a class.
    Products run as decimal(38,0) (Spark) / hugeint (DuckDB), the
    assortativity family's overflow guard; cv2 itself is ONE IEEE
    division of those exact integers. Output: 3 class rows with part
    counts, quantity mass, and the cv^2 range.

    Shape: one (part, year) aggregate, a part-level re-aggregate, a
    broadcast period-count scalar, a 3-row final aggregate - fact
    rows touched once, window-free."""
    li = load_table(spark, sf_dir, "lineitem")
    md = (
        li.groupBy(
            "l_partkey", F.date_trunc("year", "l_shipdate").alias("mo")
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    per_part = md.groupBy("l_partkey").agg(
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("ss"),
        F.count(F.lit(1)).alias("n_active"),
    )
    mm = md.agg(F.countDistinct("mo").alias("n_periods"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cls = (
        per_part.crossJoin(F.broadcast(mm))
        .select(
            "l_partkey",
            "s",
            (dec("n_periods") * dec("ss") - dec("s") * dec("s")).alias("a"),
            (dec("s") * dec("s")).alias("s2"),
        )
    )
    tagged = cls.select(
        "l_partkey",
        "s",
        F.when(F.lit(4) * F.col("a") <= F.col("s2"), F.lit("X"))
        .when(F.col("a") <= F.col("s2"), F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("klass"),
        (F.col("a").cast("double") / F.col("s2").cast("double")).alias(
            "cv2"
        ),
    )
    return (
        tagged.groupBy("klass")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("s").alias("total_qty"),
            F.min("cv2").alias("min_cv2"),
            F.max("cv2").alias("max_cv2"),
        )
        .orderBy("klass")
    )


@q(
    "above_average_orders",
    oracle="""
    WITH w AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS order_c,
               CAST(count(*) OVER prior AS BIGINT) AS n_prev,
               CAST(coalesce(sum(CAST(round(o_totalprice * 100)
                                      AS BIGINT)) OVER prior, 0)
                    AS BIGINT) AS sum_prev
        FROM orders
        WINDOW prior AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        )
    ),
    lab AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN w.n_prev = 0 THEN 'first'
                    WHEN w.order_c * w.n_prev > w.sum_prev THEN 'above'
                    WHEN w.order_c * w.n_prev = w.sum_prev THEN 'at'
                    ELSE 'below' END AS verdict
        FROM w JOIN customer c ON c.c_custkey = w.o_custkey
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN verdict = 'first' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_first,
           CAST(sum(CASE WHEN verdict = 'above' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN verdict = 'at' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_at,
           CAST(sum(CASE WHEN verdict = 'below' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN verdict = 'above' THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(nullif(count(*) - sum(CASE WHEN verdict = 'first'
                                               THEN 1 ELSE 0 END), 0)
                    AS DOUBLE) AS share_above
    FROM lab GROUP BY 1 ORDER BY segment
    """,
)
def above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-escalation panel: for every non-first order, is it above,
    at, or below that customer's PERSONAL running average so far?
    Aggregated per market segment - the behavioral drift signal
    behind upsell/churn models (a segment whose share_above sinks is
    trading down). The average never materializes as a float: the
    compare cross-multiplies (order_c * n_prev vs sum_prev, all
    bigint cents/counts), so every verdict is integer-decided;
    share_above is ONE IEEE division of two exact counts (NULL for a
    hypothetical all-first segment, never a divide-by-zero).

    Shape: one per-customer running window (count + sum over cents,
    ROWS UNBOUNDED PRECEDING..1 PRECEDING - partitioned by customer,
    never global), a broadcast join to the customer dimension for the
    segment, and a segment-level conditional aggregate. Ordering
    inside the window is (o_orderdate, o_orderkey) - fully
    deterministic under ties."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    prior = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w = o.select(
        "o_custkey",
        cents.alias("order_c"),
        F.count(F.lit(1)).over(prior).alias("n_prev"),
        F.coalesce(F.sum(cents).over(prior), F.lit(0)).alias("sum_prev"),
    )
    verdict = (
        F.when(F.col("n_prev") == 0, F.lit("first"))
        .when(
            F.col("order_c") * F.col("n_prev") > F.col("sum_prev"),
            F.lit("above"),
        )
        .when(
            F.col("order_c") * F.col("n_prev") == F.col("sum_prev"),
            F.lit("at"),
        )
        .otherwise(F.lit("below"))
    )
    lab = w.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), verdict.alias("verdict"))
    is_ = lambda v: F.sum(F.when(F.col("verdict") == v, 1).otherwise(0))  # noqa: E731
    return (
        lab.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            is_("first").alias("n_first"),
            is_("above").alias("n_above"),
            is_("at").alias("n_at"),
            is_("below").alias("n_below"),
        )
        .select(
            "segment", "n_orders", "n_first", "n_above", "n_at", "n_below",
            (
                F.col("n_above").cast("double")
                / F.nullif(
                    (F.col("n_orders") - F.col("n_first")).cast("double"),
                    F.lit(0.0),
                )
            ).alias("share_above"),
        )
        .orderBy("segment")
    )
