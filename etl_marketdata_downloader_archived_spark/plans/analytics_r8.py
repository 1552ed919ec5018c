"""Round-8 analytics extensions - registered past the certified
window (parity-verified locally by tools/parity.py, the driver's
identical check, no certificate).

Same cross-engine exactness discipline as plans/analytics_ext and
analytics_r7: every corpus-sized reduction is an integer (int-cents
fix-point, bigint counts), selections instead of interpolations, and
any final float is ONE fixed IEEE expression over those integers - so
the DuckDB oracles replay each query bit-for-bit with no rounding
tolerance. Binned tiers replay the width_bucket grid arithmetic the
same way weighted_median_binned certifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q


@q(
    "ltv_quintiles_binned",
    oracle="""
    WITH cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS spend_c,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    bnd AS (
        SELECT CAST(min(spend_c) AS DOUBLE) AS lo,
               CAST(max(spend_c) AS DOUBLE) AS hi
        FROM cust
    ),
    d AS (
        SELECT segment,
               CASE WHEN CAST(spend_c AS DOUBLE) >= bnd.hi
                    THEN CAST(65 AS BIGINT)
                    ELSE CAST(floor(
                        64.0 * (CAST(spend_c AS DOUBLE) - bnd.lo)
                        / (bnd.hi - bnd.lo) + 1) AS BIGINT)
               END AS bkt,
               CAST(count(*) AS BIGINT) AS t,
               CAST(sum(n_orders) AS BIGINT) AS ords,
               CAST(sum(spend_c) AS BIGINT) AS s
        FROM cust, bnd
        GROUP BY 1, 2
    ),
    stepped AS (
        SELECT segment, bkt, t, ords, s,
               CAST(sum(t) OVER (PARTITION BY segment ORDER BY bkt)
                    AS BIGINT) AS cum_u,
               CAST(sum(t) OVER (PARTITION BY segment) AS BIGINT) AS tot_u,
               CAST(sum(s) OVER (PARTITION BY segment) AS BIGINT) AS tot_s
        FROM d
    ),
    b AS (
        SELECT segment,
               CAST(ceil(CAST(cum_u AS DOUBLE) * 5
                         / CAST(tot_u AS DOUBLE)) AS BIGINT) AS quintile,
               CAST(sum(t) AS BIGINT) AS n_customers,
               CAST(sum(ords) AS BIGINT) AS n_orders,
               CAST(sum(s) AS BIGINT) AS spend_sum,
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
def ltv_quintiles_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ltv_quintiles`` under the binned scale tier: int-cents
    lifetime spend is NEAR-UNIQUE (the continuous-value case), so the
    exact tier's per-segment cumulative window input is ~customer
    count on 5-way segment parallelism - the degenerate shape the
    family's ``bins=`` tier exists for. Spend quantizes onto the
    64-bucket ``width_bucket`` grid (``operators.profile.grid_bounds``
    resolves the bounds: one global min/max scalar here; pass pinned
    bounds to skip even that) BEFORE the tie-group collapse, so the
    quintile window runs over at most 66 rows per segment at ANY
    corpus size. Customer/order counts and spend sums stay EXACT
    bigints (quantization only coarsens the quintile BOUNDARY - each
    boundary lands on a bucket edge instead of an exact customer
    rank); shares and averages remain single IEEE divisions. The
    oracle replays the grid arithmetic bit-for-bit
    (floor(bins*(v-lo)/(hi-lo)+1), hi -> bins+1), the same replay
    weighted_median_binned certifies."""
    from ..operators.profile import grid_bounds

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("segment", "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("spend_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    lo, hi = grid_bounds(cust, F.col("spend_c"), 64, None)
    bkt = F.width_bucket(
        F.col("spend_c").cast("double"), F.lit(lo), F.lit(hi), F.lit(64)
    )
    d = cust.groupBy("segment", bkt.alias("bkt")).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("n_orders").alias("ords"),
        F.sum("spend_c").alias("s"),
    )
    wv = W.partitionBy("segment").orderBy("bkt")
    wt = W.partitionBy("segment")
    stepped = d.select(
        "segment",
        "bkt",
        "t",
        "ords",
        "s",
        F.sum("t").over(wv).alias("cum_u"),
        F.sum("t").over(wt).alias("tot_u"),
        F.sum("s").over(wt).alias("tot_s"),
    )
    quintile = F.ceil(
        F.col("cum_u").cast("double") * 5 / F.col("tot_u").cast("double")
    ).cast("bigint")
    b = stepped.groupBy("segment", quintile.alias("quintile")).agg(
        F.sum("t").alias("n_customers"),
        F.sum("ords").alias("n_orders"),
        F.sum("s").alias("spend_sum"),
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
