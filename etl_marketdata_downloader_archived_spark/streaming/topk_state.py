"""Streaming per-key top-k on the Spark 4 ``transformWithStateInPandas``
API - the arbitrary-stateful-processor surface that succeeds
``applyInPandasWithState`` (streaming/stateful.py holds the engine's
flatMapGroupsWithState-era operators; this module exercises the NEW
contract: named state variables on a ``StatefulProcessorHandle``,
explicit init/close lifecycle, RocksDB-backed state store).

The operator: a running LEADERBOARD - for every key, the k largest
values ever seen on the stream, emitted per micro-batch in Update
mode. The batch twin is a plain WindowGroupLimit top-k; the streaming
form cannot use a window (unbounded state) - instead the state IS the
answer: exactly k (id, value) pairs per key, merged with each batch's
arrivals and truncated. State is O(keys x k) FOREVER, by construction
- no watermark needed because the state never grows past k per key
(the bound a 100 TB deployment needs from any always-on monitor).

Values are BIGINT by contract (exact cents, counts, sizes): the
leaderboard's ordering must be exact, and summing/ranking doubles
across replays would not be. Ties break on the smaller id -
deterministic across batch splits and replays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

__all__ = ["streaming_topk_per_key"]


class _TopKProcessor(StatefulProcessor):
    """k best (value desc, id asc) pairs per key in ONE ValueState
    row of two parallel arrays - a fixed-size record per key, updated
    by merge-and-truncate. ListState would append-only grow; the
    value state rewrite is k-bounded, which is the whole point."""

    def __init__(self, k: int) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "topk", "ids array<bigint>, vals array<bigint>"
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = self._state.get()
        items = list(zip(cur[0], cur[1])) if cur is not None else []
        for pdf in rows:
            items.extend(
                zip(pdf["id"].astype("int64"), pdf["val"].astype("int64"))
            )
        # same id re-delivered (at-least-once replay): keep one copy
        best: dict = {}
        for i, v in items:
            i, v = int(i), int(v)
            if i not in best or v > best[i]:
                best[i] = v
        ranked = sorted(best.items(), key=lambda t: (-t[1], t[0]))[: self._k]
        self._state.update(
            ([i for i, _ in ranked], [v for _, v in ranked])
        )
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ranked),
                "rank": list(range(1, len(ranked) + 1)),
                "id": [i for i, _ in ranked],
                "val": [v for _, v in ranked],
            }
        )

    def close(self) -> None:
        pass


def streaming_topk_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-key running top-k over a stream (Update mode): each batch
    emits every touched key's CURRENT leaderboard - (key, rank, id,
    val), rank 1 = largest. ``value_col`` must be integral (cast to
    bigint; exact ordering is the contract). Requires the RocksDB
    state store provider (the transformWithState backend):

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_type = df.schema[key_col].dataType.simpleString()
    src = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(value_col).cast("bigint").alias("val"),
    )
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_TopKProcessor(k),
        outputStructType=(
            f"key {key_type}, rank int, id bigint, val bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )
