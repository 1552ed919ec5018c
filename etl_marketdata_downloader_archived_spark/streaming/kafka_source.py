"""Kafka-shaped task stream: the reference's SQS queue re-expressed as
a Structured Streaming Kafka source (SURVEY.md section 1.1-B maps the
task queue onto "rate/file/Kafka").

The engine's streaming contract is a DataFrame with one string column
``task_json`` - ``file_source.file_task_stream`` produces it from
landed files, this module produces the identical shape from a Kafka
topic, and ``file_source.start_lake_sink`` consumes either without
change (the decode/route/fetch/ack pipeline is source-agnostic by
construction). Checkpointed Kafka offsets give the same
at-least-once + idempotent-replay semantics the SQS ack loop has
(data-downloader/data_downloader.py:58,112): offsets commit after the
batch's sink work, and the manifest anti-join absorbs replays.

Scale: Kafka partitions map 1:1 onto Spark input partitions, so task
fan-out across a 1000-executor cluster is the topic's partition count
- the knob the reference's 5-messages-per-poll lambda loop lacks.
``maxOffsetsPerTrigger`` is the micro-batch rate limit (the analogue
of the reference's poll batch size,
data-downloader/data_downloader.py:210-213).

This environment has no broker and no spark-sql-kafka connector jar,
so only the adapter's option wiring and its failure mode are testable
here; the task pipeline itself is exercised end-to-end through the
file source in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["kafka_task_stream"]


def kafka_task_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Unbounded task stream from a Kafka topic: one row per message,
    the message value decoded UTF-8 into ``task_json`` - a drop-in
    for ``file_task_stream`` in front of ``start_lake_sink``.

    Requires the ``spark-sql-kafka-0-10`` connector on the session's
    classpath (``spark.jars.packages``); raises a RuntimeError naming
    the missing package otherwise, instead of Spark's bare
    failed-to-find-data-source error."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (extra_options or {}).items():
        r = r.option(k, v)
    try:
        raw = r.load()
    except Exception as exc:  # AnalysisException without the connector
        msg = str(exc)
        # only rewrite the specific connector-missing failure; any
        # other error (bad options, auth) must surface unchanged
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
            raise RuntimeError(
                "Kafka data source not on the classpath - add the "
                "spark-sql-kafka-0-10 package matching your Spark/"
                "Scala build to spark.jars.packages"
            ) from exc
        raise
    return raw.select(F.col("value").cast("string").alias("task_json"))
