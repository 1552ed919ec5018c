"""Column profiler: one-pass per-column stats in long form.

The exploration/data-quality surface: count, null count, distinct
count, numeric min/max/mean, string min/max for every requested
column, emitted as one row per column. Complements the rule-based
gates in operators.quality (which ENFORCE expectations; this
DISCOVERS what the data looks like) and the corpus-specific
`operators.text.corpus_report`.

Scale: a single wide aggregate over one scan. With ``exact=True`` the
multiple COUNT(DISTINCT col) aggregates make Catalyst Expand the scan
once per distinct aggregate (n_cols x the input rows through the first
partial aggregate - exactness has a real cost at 100 TB). The default
``exact=False`` uses approx_count_distinct (HLL, one pass, no Expand),
which is the right profile at scale; the registered `profile_events`
query runs exact so the DuckDB oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all numeric/string columns).

    Returns one row per column:
    (column, n, n_null, n_distinct, num_min, num_max, num_mean,
    str_min, str_max) - the num_* fields are NULL for string columns
    and vice versa; num_mean is rounded to 4 dp so profiles compare
    stably across engines/run orders."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            c for c, t in fields.items()
            if isinstance(t, _NUMERIC) or isinstance(t, T.StringType)
        ]
    dcount = F.countDistinct if exact else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = []
    for c in columns:
        num = isinstance(fields[c], _NUMERIC)
        col = F.col(c)
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(col.isNull(), 1)).alias("n_null"),
                dcount(col).alias("n_distinct"),
                (F.min(col).cast("double") if num
                 else F.lit(None).cast("double")).alias("num_min"),
                (F.max(col).cast("double") if num
                 else F.lit(None).cast("double")).alias("num_max"),
                (F.round(F.avg(col), 4) if num
                 else F.lit(None).cast("double")).alias("num_mean"),
                (F.min(col) if not num
                 else F.lit(None).cast("string")).alias("str_min"),
                (F.max(col) if not num
                 else F.lit(None).cast("string")).alias("str_max"),
            ).alias(f"_p_{c}")
        )
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(F.array(*[F.col(f"_p_{c}") for c in columns])).alias("p")
    ).select("p.*")
