"""SparkSession factory.

One place to encode the 100 TB posture: AQE on (runtime re-planning,
skew-join handling, partition coalescing), Arrow on (vectorized Python
boundary), UTC session timezone (oracle comparability + sane lake
semantics), shuffle partitions sized to the deploy target.

On a real cluster the shuffle-partition count is overridden per deploy
(rule of thumb: 2-3x total executor cores, or rely on AQE coalescing
from a high initial number); locally we default to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "etl-marketdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are local-mode friendly but every knob matters at cluster
    scale too: AQE re-plans joins/skew at runtime, broadcast threshold
    keeps dimension tables (region/nation/... analogs) out of shuffles.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # zstd over the snappy default: ~30-50% smaller lake files at
        # comparable decode speed - at 100 TB the scan is IO-bound, so
        # smaller files ARE faster reads (and cheaper storage/egress)
        .config("spark.sql.parquet.compression.codec", "zstd")
        # CBO consumes ANALYZE TABLE stats (io.analyze_table) for join
        # reordering + cardinality-aware broadcast choices; inert (and
        # harmless) for path-based reads without stats
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        # Runtime bloom-filter join pruning (semi-join reduction): when
        # a fact-dim join's dim side is selectively filtered, inject a
        # bloom filter built from the dim keys as a fact-side scan
        # filter, so pruned fact rows never reach the shuffle. Pinned
        # on explicitly; the default application-side threshold (10 GB
        # scan) means it only fires where it pays - exactly the 100 TB
        # fact-table case. Plan shape asserted in tests/test_joins_skew.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Some upstream parquet (e.g. the events table) carries
        # TIMESTAMP(NANOS) which the Spark reader rejects; read as long
        # and let io.load_table convert to micros (= DuckDB truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
