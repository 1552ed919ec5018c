"""Harvest pipeline: catalog -> due tasks (reference entry point 1).

Re-expresses ``data_harvester.handler`` (reference:
data-harvester/data_harvester.py:21-38) as one narrow batch plan - no
shuffle anywhere:

    read catalog -> filter(active=1 AND interval) -> tz-shifted clock
    -> template-expand url+pattern -> project {ID,URL,TYPE,PATTERN,UTC}
    -> to_json

The reference sends one SQS message per row (:38); here the task set
is a DataFrame the caller lands on the task table / queue sink, so
fan-out batches instead of one network call per row.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.templates import expand_template, shifted_clock
from ..sources.catalog import valid_rows


def harvest_tasks(
    catalog: DataFrame, interval: str, now: datetime | None = None
) -> DataFrame:
    """Produce the due-task DataFrame for one scheduler tick.

    ``now`` pins the clock for determinism/tests; None uses
    ``current_timestamp()`` (one value per query, Spark folds it).
    The reference's equivalents: filter at data_harvester.py:29-31,
    clock shift :32-33, template expansion :34-35, projection+encode :37.
    """
    # the wall-clock literal travels as a STRING parsed under the
    # session timezone: F.lit(datetime) would convert through the
    # PYTHON PROCESS timezone (TimestampType.toInternal uses mktime),
    # silently shifting the instant on any non-UTC host
    clock = (
        F.to_timestamp(F.lit(now.strftime("%Y-%m-%d %H:%M:%S")))
        if now is not None
        else F.current_timestamp()
    )
    due = valid_rows(catalog).filter(
        (F.col("active") == 1) & (F.col("interval") == F.lit(interval))
    )
    shifted = shifted_clock(clock, F.col("utc_offset"))
    task = due.select(
        F.col("id").alias("ID"),
        expand_template(F.col("url"), shifted).alias("URL"),
        F.col("type").alias("TYPE"),
        expand_template(F.col("pattern"), shifted).alias("PATTERN"),
        F.col("utc_offset").cast("string").alias("UTC"),
    )
    return task.withColumn(
        "task_json",
        F.to_json(F.struct("ID", "URL", "TYPE", "PATTERN", "UTC")),
    )
