"""Mergeable distinct-count sketch rollups (HyperLogLog).

The 100 TB pattern behind every "distinct users over <any date range>"
dashboard: pre-aggregate one HLL sketch per (bucket) during ingest,
persist the binary sketches in the lake, and answer any later range /
regrouping by UNIONING sketches - never rescanning the fact table.
Spark ships the Apache DataSketches HLL as built-in aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
3.5+); this module is the thin, typed composition plus the estimate
contract tests rely on.

Scale shape: building is one hash aggregate (partial sketches combine
map-side - sketch union is commutative/associative, so AQE/partition
order cannot change the merged registers); answering touches only the
bucket-count-bounded sketch table. Error is the standard HLL bound
(~1.04/sqrt(2^lg_k), ~0.8% at the default lg_k=14); sketches at
different lg_k still union (DataSketches downsamples to the coarser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_distinct_sketches(
    df: DataFrame,
    value: str,
    bucket_cols: list[str],
    lg_k: int = 14,
) -> DataFrame:
    """One HLL sketch of distinct ``value`` per bucket: the ingest-time
    pre-aggregation. Output = bucket_cols + ``sketch`` (BinaryType,
    lake-persistable; parquet round-trip is tested)."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(value, F.lit(lg_k)).alias("sketch")
    )


def estimate_distinct(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches (optionally per regrouping key) and estimate the
    distinct count. Any filter applied to ``sketches`` first (a date
    range, a source subset) makes this an arbitrary-range distinct
    query over pre-aggregated state - the fact table is never touched."""
    est = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
        "n_distinct_est"
    )
    if group_cols:
        return sketches.groupBy(*group_cols).agg(est)
    return sketches.agg(est)
