"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementation lives in ``etl_marketdata_downloader_archived_spark``;
this module is only the wiring.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from etl_marketdata_downloader_archived_spark.plans import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue-by-region-and-year star query - the Athena-over-the-lake
    shape the reference delegates (SURVEY.md section 2B). Lineitem
    pre-aggregates to ORDER grain before the join (aggregate-below-
    join): the join side shrinks to order count and n_orders is a
    plain count instead of a countDistinct Expand over the joined
    fact - the full-certificate twin is `flagship_star` in
    plans/tail.py.
    """
    from pyspark.sql import functions as F

    from etl_marketdata_downloader_archived_spark.io import load_tables

    t = load_tables(
        spark, SMOKE_SF_DIR, "lineitem", "orders", "customer", "nation", "region"
    )
    li, o, c, n, r = t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum("_rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "order_year")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for the genuinely
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return registry.all_oracles()
