"""Structured Streaming surface: the reference's event-driven /
queue-driven semantics re-expressed with checkpointed micro-batches.

The reference's streaming machinery (SURVEY.md section 2A):
- file-arrival trigger: s3:ObjectCreated on prefix ``in/`` invokes the
  downloader (A29) -> ``readStream`` file source here
- at-least-once + ack (A26) -> checkpointed offsets
- redrive/DLQ (A28) -> quarantine table
- staging in/processing/done (A30) -> archive on completion
- cross-batch dedup TODO (A27) -> dropDuplicatesWithinWatermark
"""

from .windows import (
    interval_join,
    session_agg,
    sliding_agg,
    streaming_trailing_distinct,
    tumbling_agg,
    watermark_replay,
    watermarked_dedup,
)
from .file_source import file_task_stream, start_lake_sink
from .kafka_source import kafka_task_stream
from .stateful import streaming_ewma, track_attempts
from .drift import batch_ks, reference_counts, start_drift_monitor
from .quality_monitor import start_auc_monitor, start_percentile_monitor
from .schedule import start_scheduled_harvest
from .corpus_ingest import (
    benchmark_gram_index,
    gated_doc_stream,
    start_corpus_ingest,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "interval_join",
    "streaming_trailing_distinct",
    "watermark_replay",
    "watermarked_dedup",
    "file_task_stream",
    "kafka_task_stream",
    "streaming_ewma",
    "track_attempts",
    "start_lake_sink",
    "benchmark_gram_index",
    "gated_doc_stream",
    "start_corpus_ingest",
    "reference_counts",
    "batch_ks",
    "start_drift_monitor",
    "start_auc_monitor",
    "start_percentile_monitor",
    "start_scheduled_harvest",
]
