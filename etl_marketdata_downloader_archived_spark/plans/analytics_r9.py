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
