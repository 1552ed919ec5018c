"""Physical layout optimization: Z-order (Morton) clustering for
multi-column data skipping.

Partition pruning skips directories; inside a partition, parquet
row-group/file skipping works off min-max statistics - which only
help if rows are CLUSTERED on the filtered columns. A sort on one
column destroys locality on the others; interleaving the bits of
several columns' bucket ranks (the Z-order curve) keeps every file's
extent tight on ALL of them, so a filter on any participating column
skips most files. The same trick Delta/Iceberg OPTIMIZE ZORDER BY
applies, expressed with plain Spark: width_bucket -> bit interleave ->
repartitionByRange + sortWithinPartitions -> write.

Bucket boundaries come from one approx-quantile pass (driver-side,
bounded: num_cols doubles); the curve value is a pure Catalyst
expression, so the whole rewrite is scan + range shuffle + write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    bucket_cols: list[Column], bits: int = 8
) -> Column:
    """Interleave ``bits`` low bits of each (already-bucketized,
    0-based) column into one Morton value: column j contributes bit i
    to output position i * n_cols + j. Pure bit arithmetic, stays in
    codegen."""
    n = len(bucket_cols)
    if not 1 <= n <= 4:
        raise ValueError(f"zorder interleave supports 1-4 columns, got {n}")
    if bits * n > 60:
        raise ValueError(f"bits={bits} x {n} cols exceeds the long range")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Rewrite ``df`` clustered on the Z-curve over ``cols`` (numeric
    or timestamp). One approx-quantile pass finds each column's
    min/max, width_bucket grids values into 2^bits cells, the Morton
    value interleaves them, and a range partition + within-partition
    sort lays files out along the curve. Filters on ANY of ``cols``
    then skip most files via parquet min-max stats."""
    n_buckets = 1 << bits
    proj = df.select("*", *[
        F.col(c).cast("double").alias(f"_z_{c}") for c in cols
    ])
    bounds = proj.select(
        *[F.min(f"_z_{c}").alias(f"lo_{c}") for c in cols],
        *[F.max(f"_z_{c}").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    buckets = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0))
        else:
            # width_bucket returns 1..n+1; clamp to 0..n-1
            buckets.append(
                F.least(
                    F.greatest(
                        F.width_bucket(F.col(f"_z_{c}"), F.lit(lo), F.lit(hi), F.lit(n_buckets)) - 1,
                        F.lit(0),
                    ),
                    F.lit(n_buckets - 1),
                )
            )
    zed = proj.withColumn("_zval", zorder_value(buckets, bits))
    nf = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        zed.repartitionByRange(nf, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval", *[f"_z_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
