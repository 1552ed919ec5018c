"""Streaming materialized-view maintenance: a CDC/upsert stream keeps
a `io.build_join_view` materialization fresh, repairing only the
buckets each micro-batch touches.

The composition is the point: `foreachBatch` folds the batch into the
keyed left store (upserts win, tombstones delete), then hands the
SAME batch's keys to `io.refresh_join_view` as the delta - so view
maintenance cost per batch is O(batch keys + their bucket rows),
never O(view), and the view stays publish-consistent (each bucket
wholly old or wholly new) while the stream runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["start_join_view_maintenance"]


def start_join_view_maintenance(
    updates: DataFrame,
    *,
    left_path: str,
    right: DataFrame,
    on: str,
    view_path: str,
    checkpoint: str,
    n_buckets: int = 64,
    op_col: str = "op",
    delete_value: str = "delete",
    seq_col: str = "ts",
):
    """Maintain LEFT (a keyed store at ``left_path``) and the
    materialized LEFT⋈RIGHT view from a stream of change rows.

    ``updates`` carries the left table's columns plus ``op_col``
    ('upsert' or ``delete_value``) and ``seq_col`` (a change ordinal,
    unique per key - a CDC LSN or event time; NEVER derived from
    arrival position, which task retries reorder); within a batch the
    change with the highest seq per key wins. Each batch: fold the
    changes into the left store (atomic overwrite - the store is
    dimension-sized; a fact-sized left pairs the same refresh call
    with io.merge_partitioned instead), then repair the view for
    exactly the batch's keys via io.refresh_join_view.

    Replayed batches are idempotent: both the fold and the repair are
    deterministic functions of (store state, batch), and re-applying
    a batch that already applied reproduces the same store and view -
    the foreachBatch at-least-once contract. Returns the
    StreamingQuery."""
    from ..io import overwrite_small_table, refresh_join_view

    left_cols = [c for c in updates.columns if c not in (op_col, seq_col)]

    def fold(batch: DataFrame, _epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        from pyspark.sql import Window as W

        # highest change ordinal per key wins within the batch
        rn = F.row_number().over(
            W.partitionBy(on).orderBy(F.col(seq_col).desc())
        )
        latest = (
            batch.withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        latest = latest.localCheckpoint(eager=True)
        keys = latest.select(on).distinct()
        upserts = latest.filter(F.col(op_col) != delete_value).select(
            *left_cols
        )
        try:
            cur = spark.read.parquet(left_path)
            kept = cur.join(F.broadcast(keys), on, "left_anti")
            new_left = kept.unionByName(upserts)
        except Exception:
            new_left = upserts  # first batch: no store yet
        # materialize DRIVER-SIDE before the overwrite: the plan
        # reads left_path and the write replaces it - and a cached/
        # checkpointed plan would still key on the mutable path
        # (the engine-wide control-table rule)
        new_left = spark.createDataFrame(
            new_left.collect(), new_left.schema
        )
        overwrite_small_table(new_left, left_path)
        left_now = spark.read.parquet(left_path)
        refresh_join_view(
            spark, view_path, left_now, right, on, keys,
            n_buckets=n_buckets,
        )

    return (
        updates.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
