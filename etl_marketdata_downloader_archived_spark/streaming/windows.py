"""Windowed / stateful streaming transforms.

All four work identically on batch DataFrames (Spark's unified
semantics), which is how the oracle checks them; the streaming tests
drive them through a real ``readStream`` with ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: counts/aggregates per ``window(ts, width)``.

    With ``watermark`` set (streaming), state for windows older than
    the watermark is dropped and late rows are discarded - the bounded
    replacement for the reference's SQS visibility/redrive bookkeeping
    (SURVEY.md section 2B)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, width).alias("w")).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, width, slide).alias("w")).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    key_cols: list[str],
    *aggs: Column,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into
    one session per key (user sessionization on the events stream)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("w"), *[F.col(c) for c in key_cols]
    ).agg(*aggs)


def watermarked_dedup(
    df: DataFrame, ts_col: str, key_cols: list[str], watermark: str
) -> DataFrame:
    """Cross-batch duplicate suppression with bounded state - the
    implemented version of the reference's four 'check repeat file'
    TODOs (data-downloader/data_downloader.py:106,131,169,194) for the
    streaming path: keys older than the watermark age out of state
    instead of accumulating forever."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
