"""Composed market-data feature pipeline: events -> training table.

The market-data twin of plans.corpus_pipeline: one pass from the raw
event stream to a model-ready feature table -

    OHLCV/VWAP bars (operators.timeseries.ohlc_bars)
      -> per-series indicator panel (log return, rolling z-score,
         drawdown - one collapsed window pass)
      -> forward-return label (lead over the SAME window spec, so
         Catalyst folds it into the panel's single Window operator)
      -> deterministic train/val/test split (operators.text.hash_split
         on the (series, bar) identity - stable as history grows)

Scale shape: one bar aggregation (map-side combinable) + ONE window
per series + a narrow split projection. No Python anywhere; the label
leaks nothing (it reads strictly later bars) and the split never
reshuffles rows between sets when new bars land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import load_table
from ..operators import timeseries as TS
from ..operators.text import hash_split


def build_feature_table(
    spark: SparkSession,
    sf_dir: str,
    width: str = "hour",
    zscore_rows: int = 24,
    horizon: int = 1,
    split_fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Model-ready (series, bar) feature rows from the events table.

    Columns: keys (event_type, bar_ts), market state (ohlcv + vwap),
    indicators (log_return, zscore, drawdown), the ``horizon``-bars-
    ahead forward log-return label ``fwd_return`` (NULL on the last
    ``horizon`` bars of each series - never imputed, so downstream
    filters decide), and the deterministic ``split`` label.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "qty", F.get_json_object("props", "$.k").cast("bigint")
    )
    bars = TS.ohlc_bars(
        e, "event_type", "ts", "value", "qty",
        width=width, tie_break="event_id", price_scale=100,
    )
    panel = TS.indicator_panel(
        bars, "event_type", "bar_ts", "close", zscore_rows=zscore_rows
    )
    feats = bars.join(panel.drop("close"), ["event_type", "bar_ts"])

    w = W.partitionBy("event_type").orderBy("bar_ts")
    fwd = F.lead("close", horizon).over(w)
    feats = feats.withColumn(
        "fwd_return",
        F.when((fwd > 0) & (F.col("close") > 0), F.log(fwd / F.col("close"))),
    )
    fractions = split_fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    split_id = F.xxhash64("event_type", "bar_ts")
    return feats.withColumn("split", hash_split(split_id, fractions))
