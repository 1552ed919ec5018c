"""Relational operator battery (SURVEY.md section 2B).

The reference delegates its whole relational surface to Athena over the
landed lake (reference: wiki.md:139-141; Athena/Glue IAM grants at
cloudformation/clean-test-files-lambda.cfn.yaml:43-44). This module owns
that surface as Spark DataFrame/SQL plans - every query is a Catalyst
built-in composition (zero custom rules) and is paired with a DuckDB
oracle in the registry.

Battery sizing: the driver's correctness run certifies the first 50
registered queries, so related operators are packed into one query each
(tagged unions / wide projections) and this module registers FIRST.
Every SURVEY 2B row keeps a named, driver-checked entry.

Scale notes are inline per query: what shuffles, what broadcasts, what
prunes. All plans are declarative so Catalyst applies pushdown/pruning/
join-selection automatically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import load_table
from ..operators.joins import asof_join
from .registry import q

# ---------------------------------------------------------------- scans


@q(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter reaching the parquet scan (column pruning +
    predicate pushdown; verify with explain(): PushedFilters/ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# -------------------------------------------------------------- filters


@q(
    "filter_family",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS was_open
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
      AND NULLIF(o_orderpriority, '') IS NOT NULL
    """,
)
def filter_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface in one scan: conjunctive equality (the
    harvester's active/interval shape, data-harvester/data_harvester.py:31),
    IN-list, BETWEEN on number and timestamp, and IS NULL / IS NOT NULL
    three-valued logic (nulls synthesized via NULLIF - driver tables
    carry none). All five reach the parquet scan as pushed filters."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_totalprice") > 100000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1999-12-31").cast("timestamp")
            )
            & F.nullif(F.col("o_orderpriority"), F.lit("")).isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            "o_totalprice",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().alias("was_open"),
        )
    )


# ---------------------------------------------------------------- joins


@q(
    "join_equi",
    oracle="""
    SELECT 'inner' AS op, c_custkey AS k, c_name AS a, n_name AS b
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'left' AS op, c_custkey AS k, c_name AS a, CAST(o.o_orderkey AS VARCHAR) AS b
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c_custkey = o.o_custkey
    UNION ALL
    SELECT 'right' AS op, c_custkey AS k, c_name AS a, CAST(o.o_orderkey AS VARCHAR) AS b
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer ON c_custkey = o.o_custkey
    UNION ALL
    SELECT 'full' AS op, n_nationkey AS k, n_name AS a, s.s_name AS b
    FROM (SELECT * FROM supplier WHERE s_suppkey < 10) s
    FULL JOIN nation ON s.s_nationkey = n_nationkey
    """,
)
def join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join family - inner, left outer, full outer - as one tagged
    union (normalized (op, k, a, b) schema). Each branch keeps its own
    shuffle-or-broadcast choice; the union is a no-shuffle concat."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 10)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)

    inner = (
        c.join(n, c.c_nationkey == n.n_nationkey, "inner")
        .select(
            F.lit("inner").alias("op"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("a"),
            F.col("n_name").alias("b"),
        )
    )
    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            F.lit("left").alias("op"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("a"),
            F.col("o_orderkey").cast("string").alias("b"),
        )
    )
    right = (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .select(
            F.lit("right").alias("op"),
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("a"),
            F.col("o_orderkey").cast("string").alias("b"),
        )
    )
    full = (
        s.join(n, s.s_nationkey == n.n_nationkey, "full")
        .select(
            F.lit("full").alias("op"),
            F.col("n_nationkey").alias("k"),
            F.col("n_name").alias("a"),
            F.col("s_name").alias("b"),
        )
    )
    return inner.unionByName(left).unionByName(right).unionByName(full)


@q(
    "join_broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_cust
    FROM region
    JOIN nation ON r_regionkey = n_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: explicit broadcast of the dimension tables so the fact
    side never shuffles for the join (at 100 TB the fact scan streams
    through map-side hash joins)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@q(
    "join_semi_anti",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti as one tagged union. The anti join is the
    dedup-vs-manifest primitive that fills the reference's repeat-file
    TODO (data-downloader/data_downloader.py:106)."""
    c = load_table(spark, sf_dir, "customer")
    o_hi = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    o_lo = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    semi = (
        c.join(o_hi, c.c_custkey == o_hi.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    )
    anti = (
        c.join(o_lo, c.c_custkey == o_lo.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    )
    return semi.unionByName(anti)


@q(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber, l.l_shipdate
    FROM (SELECT * FROM orders WHERE o_orderkey % 500 = 0) o
    JOIN (SELECT * FROM lineitem WHERE l_orderkey % 97 = 0) l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join via the banded formulation
    (operators.joins.banded_interval_join): a 30-day band key gives the
    join an equality component, so it hash-partitions instead of
    falling into broadcast nested-loop - the shape that survives when
    NEITHER side fits in a broadcast at 100 TB."""
    from ..operators.joins import banded_interval_join

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 500 == 0)
        .withColumn("_end", F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    out = banded_interval_join(
        li, o, left_time="l_shipdate", right_start="o_orderdate", right_end="_end"
    )
    return out.select("o_orderkey", "l_orderkey", "l_linenumber", "l_shipdate")


@q(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.ts, e.user_id,
           o.o_orderdate AS asof_o_orderdate,
           o.o_orderkey  AS asof_o_orderkey
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderdate, o_orderkey
        FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    ) o ON true
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event, per user.
    Composed union+window (single shuffle) - see operators.joins.asof_join."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .withColumn("_key", F.col("user_id"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("_key"), "o_orderdate", "o_orderkey")
    )
    out = asof_join(
        e,
        o,
        on="_key",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderdate", "o_orderkey"],
        tie_break="o_orderkey",
    )
    return out.select("event_id", "ts", "user_id", "asof_o_orderdate", "asof_o_orderkey")


# ---------------------------------------------------------- aggregation


@q(
    "agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc,
           avg(l_quantity)                                        AS avg_qty,
           count(*)                                               AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape - partial (map-side) + final hash aggregation is
    automatic; only the tiny group keys shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@q(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           count(*)                                   AS n_orders,
           round(sum(o_totalprice), 2)                AS sum_price,
           round(median(o_totalprice), 2)             AS med,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90
    FROM orders
    GROUP BY o_orderstatus
    HAVING count(*) >= 10
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with HAVING plus exact median / continuous
    percentile (both engines interpolate; rounding absorbs the one-ulp
    summation differences)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.median("o_totalprice"), 2).alias("med"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        )
        .filter(F.col("n_orders") >= 10)
    )


@q(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_suppkey)  AS n_supp,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) on two columns plus a collect_set (sorted then
    joined: set aggregation has no inherent order, and a scalar output
    keeps the differential hash array-free).

    The collect_set runs as a separate aggregation joined on the group
    key: a third aggregate path alongside two DISTINCTs widens the
    Expand fan-out (every input row duplicated per path) - measured 2x
    on this query; same lesson as agg_approx_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    sets = li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses")
    )
    return counts.join(sets, "l_returnflag")


@q(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag, TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) - the 100 TB substitute for
    exact COUNT(DISTINCT): no per-key exact state, bounded memory.

    Differential form: Spark computes BOTH the sketch estimate and the
    exact count and asserts |approx-exact| <= 5*rsd*exact per group; the
    oracle expects TRUE per group. (HLL internals have no DuckDB twin,
    so the accuracy bound itself is the cross-checkable contract.
    Production plans use the sketch alone - the exact count here is the
    certificate, not the plan.)

    The two aggregates run as SEPARATE plans joined on the group key:
    mixing a distinct aggregate with the HLL in one groupBy forces
    Spark through Expand + a sort-based fallback that merges the 16K+
    register sketch per expanded row - measured ~30x slower than the
    two-aggregate join at sf0.1."""
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("_approx")
    )
    exact = li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("_exact"))
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        (
            F.abs(F.col("_approx") - F.col("_exact"))
            <= F.greatest(F.lit(5 * rsd) * F.col("_exact"), F.lit(5.0))
        ).alias("within_tol"),
    )


@q(
    "agg_cube_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation: CUBE = GROUPING SETS
    ((a,b),(a),(b),()), the superset of ROLLUP's prefix sets. The
    grouping-bit column distinguishes "aggregated away" from a data
    NULL - constructed bit-by-bit so the encoding is engine-portable."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@q(
    "decimal_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))
               * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS net
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math in DecimalType (SURVEY.md section 1.3): exact sums,
    no float drift - both engines aggregate in decimal.

    The aggregation runs entirely in decimal; only the FINAL value is
    cast to double, because the engines' result decimals differ in
    precision (Spark sum -> DECIMAL(22,2), DuckDB -> DECIMAL(38,2))
    and decimal-typed results canonicalize differently through Arrow.
    The exact decimal sum converts to the identical nearest double on
    both sides, so the cast is drift-free."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("gross"),
        F.sum(price * F.lit(1).cast("decimal(12,2)") - disc * price)
        .cast("double")
        .alias("net"),
    )


@q(
    "pivot_status",
    oracle="""
    WITH p AS (
        SELECT o_orderpriority,
               round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS F,
               round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS O,
               round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS P
        FROM orders
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, total
    FROM p UNPIVOT INCLUDE NULLS (total FOR status IN (F, O, P))
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation, explicit value list so the plan needs
    no extra distinct-values pass) THEN unpivot/melt back to long -
    both reshaping operators in one certified round-trip; the zero
    coalesce keeps the long form total and row set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    wide = wide.select(
        "o_orderpriority",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("F", "O", "P")],
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="total",
    )


# -------------------------------------------------------------- windows


@q(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_mktsegment
                              ORDER BY floor(c_acctbal / 1000) DESC) AS rk,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY floor(c_acctbal / 1000) DESC) AS drk,
           ntile(4)     OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w_unique = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_banded = W.partitionBy("c_mktsegment").orderBy(F.floor(F.col("c_acctbal") / 1000).desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_banded).alias("rk"),
        F.dense_rank().over(w_banded).alias("drk"),
        F.ntile(4).over(w_unique).alias("quartile"),
    )


@q(
    "win_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)  OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_price,
           lead(o_totalprice) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS next_price,
           first_value(o_totalprice) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS first_price
    FROM orders
    """,
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@q(
    "win_frames",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           sum(l_quantity) OVER w_run AS running_qty,
           count(*)        OVER w_run AS running_n,
           avg(l_quantity) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
               AS moving_avg_qty
    FROM lineitem
    WINDOW w_run AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running (unbounded-preceding) and moving (3
    preceding) over the same partition/sort - one shuffle + one sort
    serves all three frame aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    w_run = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_mov = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w_run).alias("running_qty"),
        F.count(F.lit(1)).over(w_run).alias("running_n"),
        F.avg("l_quantity").over(w_mov).alias("moving_avg_qty"),
    )


# --------------------------------------------------------- sort / top-k


@q(
    "topk",
    oracle="""
    SELECT 'global' AS scope, CAST(NULL AS BIGINT) AS grp,
           o_orderkey AS item, o_totalprice AS val
    FROM (SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
    UNION ALL
    SELECT 'group' AS scope, c_nationkey AS grp, c_custkey AS item, c_acctbal AS val
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N (TakeOrderedAndProject: per-partition heaps + merge,
    no full sort) and per-group top-k (row_number window; Spark rewrites
    the rank filter into a WindowGroupLimit pushdown) as one tagged
    union."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    glob = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select(
            F.lit("global").alias("scope"),
            F.lit(None).cast("bigint").alias("grp"),
            F.col("o_orderkey").alias("item"),
            F.col("o_totalprice").alias("val"),
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    grouped = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("group").alias("scope"),
            F.col("c_nationkey").alias("grp"),
            F.col("c_custkey").alias("item"),
            F.col("c_acctbal").alias("val"),
        )
    )
    return glob.unionByName(grouped)


# -------------------------------------------------------------- set ops


@q(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, key FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 480000)
    UNION ALL
    SELECT 'intersect' AS op, key FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000)
    UNION ALL
    SELECT 'except' AS op, key FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 450000)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) / INTERSECT / EXCEPT as one tagged union-all.
    Each set op is a shuffle on the full row as key; Spark plans
    intersect/except as semi/anti joins under distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )

    def big(limit: int) -> DataFrame:
        return o.filter(F.col("o_totalprice") > limit).select(F.col("o_custkey").alias("key"))

    tagged = [
        building.unionByName(big(480000)).distinct().select(F.lit("union").alias("op"), "key"),
        building.intersect(big(300000)).select(F.lit("intersect").alias("op"), "key"),
        building.subtract(big(450000)).select(F.lit("except").alias("op"), "key"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


# ------------------------------------------------------ scalar families


@q(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                       AS name_lower,
           upper(p_brand)                      AS brand_upper,
           length(p_name)                      AS name_len,
           substring(p_name, 1, 5)             AS name_head,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_name, ' ', '_')           AS name_snake,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           (p_name LIKE '%gear%')              AS is_gear
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (covers reference ops A2/A14/A15/A21 shapes)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_name").like("%gear%").alias("is_gear"),
    )


@q(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                         AS yr,
           month(o_orderdate)                        AS mo,
           day(o_orderdate)                          AS dy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           strftime(o_orderdate, '%Y-%m')            AS ym,
           CAST(epoch(o_orderdate) AS BIGINT)        AS epoch_s,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
               AS days_to_2002
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (reference ops A4-A6: tz-shifted clock +
    strftime-style date parts, data-harvester/data_harvester.py:32-35)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        # date_trunc returns a timestamp; a month start is a calendar day,
        # so surface it as DATE (matches the oracle's physical type too)
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
    )


@q(
    "math_cond_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1)                    AS price_r1,
           abs(o_totalprice - 250000)                AS dist_mid,
           CAST(floor(o_totalprice) AS BIGINT)       AS price_floor,
           CAST(ceil(o_totalprice)  AS BIGINT)       AS price_ceil,
           o_orderkey % 7                            AS key_mod,
           sqrt(o_totalprice)                        AS price_sqrt,
           CASE WHEN o_totalprice > 400000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END                        AS tier,
           coalesce(NULLIF(o_orderstatus, 'P'), 'NA') AS status_or_na,
           greatest(o_totalprice, 250000.0)           AS at_least_mid,
           least(o_totalprice, 250000.0)              AS at_most_mid
    FROM orders
    """,
)
def math_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional families in one projection. The CASE chain is
    the downloader's 5-way TYPE dispatch shape (reference:
    data-downloader/data_downloader.py:217-228)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 250000).alias("dist_mid"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("NA")).alias(
            "status_or_na"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("at_least_mid"),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("at_most_mid"),
    )


@q(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                            AS n_words,
           list_contains(string_split(text, ' '), 'spark')         AS has_spark,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), '-')
               AS first3,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order lambdas (reference explodes link
    lists / listing lines: data-downloader/data_downloader.py:91,153)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(words, 1, 3), "-").alias("first3"),
        F.aggregate(words, F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("bigint")
        .alias("total_chars"),
    )


@q(
    "map_json_funcs",
    oracle="""
    WITH m AS (
        SELECT event_id, props,
               MAP(['type', 'user'],
                   [event_type, CAST(user_id AS VARCHAR)]) AS props_map
        FROM events
    )
    SELECT event_id,
           array_to_string(map_keys(props_map), ',')   AS keys_csv,
           map_extract(props_map, 'type')[1]           AS type_val,
           cardinality(props_map)                      AS n_entries,
           json_extract_string(props, '$.k')           AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM m
    """,
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType family (construction, key listing, lookup, cardinality -
    the open-properties pattern for task metadata) + JSON family
    (reference task encode/decode A8/A11:
    data-harvester/data_harvester.py:37,
    data-downloader/data_downloader.py:216)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        m.getItem("type").alias("type_val"),
        F.size(m).cast("bigint").alias("n_entries"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
    )


@q(
    "subq_family",
    oracle="""
    SELECT c_custkey, c_name,
           round((SELECT avg(o_totalprice) FROM orders), 2) AS corpus_avg
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    )
    """,
)
def subq_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated scalar subqueries in both the
    predicate and the projection - decorrelated by Catalyst into joins;
    same SQL text runs on both engines."""
    from ..io import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               round((SELECT avg(o_totalprice) FROM orders), 2) AS corpus_avg
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        )
        """
    )


# ---------------------------------------------------- streaming (batch-checkable)


@q(
    "stream_windows",
    oracle="""
    SELECT 'tumbling10' AS win_kind,
           time_bucket(INTERVAL '10 minutes', ts)                        AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 2, 3, 4
    UNION ALL
    SELECT 'sliding10x5' AS win_kind,
           win_start AS window_start,
           win_start + INTERVAL 10 MINUTE AS window_end,
           CAST(NULL AS VARCHAR) AS event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
        SELECT e.event_id, e.value, s.win_start
        FROM events e,
             LATERAL (SELECT unnest([
                 time_bucket(INTERVAL 5 MINUTE, e.ts),
                 time_bucket(INTERVAL 5 MINUTE, e.ts) - INTERVAL 5 MINUTE
             ]) AS win_start) s
        WHERE e.ts >= s.win_start AND e.ts < s.win_start + INTERVAL 10 MINUTE
    )
    GROUP BY win_start
    """,
)
def stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (10m, keyed by event_type) + sliding (10m width, 5m
    slide: every event lands in two windows) aggregations as one tagged
    union - identical code runs under readStream (see
    streaming.windows); checked here in batch mode."""
    e = load_table(spark, sf_dir, "events")
    tumbling = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.lit("tumbling10").alias("win_kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sliding = (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.lit("sliding10x5").alias("win_kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            "sum_value",
        )
    )
    return tumbling.unionByName(sliding)


@q(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           count(*)  AS n_events,
           min(ts)   AS session_start,
           max(ts)   AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) via lag + running sum - the batch
    formulation; streaming uses session_window (streaming.windows)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # NTZ-safe gap: timestamp subtraction yields a day-time interval
    # (unix_micros rejects TIMESTAMP_NTZ input)
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ------------------------------------------------------------- UDF surface


@q(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted,
           CASE WHEN l_extendedprice * (1 - l_discount) > 50000 THEN 'high'
                WHEN l_extendedprice * (1 - l_discount) > 10000 THEN 'mid'
                ELSE 'low' END AS bracket
    FROM lineitem
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both scalar-UDF surfaces in one certified query: a vectorized
    (Arrow) pandas UDF - the sanctioned Python escape hatch,
    elementwise IEEE ops so results match the SQL oracle exactly - and
    a Spark 4 SQL UDF (CREATE TEMPORARY FUNCTION ... RETURN), which
    Catalyst INLINES into the plan (stays whole-stage-codegen, unlike
    any Python path; the production-preferred UDF form when the logic
    is expressible)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def discount_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_bracket(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p > 50000 THEN 'high'
                    WHEN p > 10000 THEN 'mid'
                    ELSE 'low' END
        """
    )
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discount_price("l_extendedprice", "l_discount").alias("discounted"),
        F.expr(
            "price_bracket(l_extendedprice * (1 - l_discount))"
        ).alias("bracket"),
    )


@q(
    "udaf_grouped",
    oracle="""
    SELECT l_suppkey,
           count(*)            AS n_rows,
           sum(l_quantity)     AS sum_qty,
           max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas (one pandas frame per group;
    quantity sums are integral-valued doubles -> exact)."""
    li = load_table(spark, sf_dir, "lineitem")

    def agg_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_suppkey": [pdf["l_suppkey"].iloc[0]],
                "n_rows": [len(pdf)],
                "sum_qty": [pdf["l_quantity"].sum()],
                "max_price": [pdf["l_extendedprice"].max()],
            }
        )

    return li.groupBy("l_suppkey").applyInPandas(
        agg_group, schema="l_suppkey bigint, n_rows bigint, sum_qty double, max_price double"
    )
