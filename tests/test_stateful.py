"""applyInPandasWithState: cross-batch retry counting with redrive
semantics (the reference's maxReceiveCount -> DLQ, restated)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.streaming.stateful import track_attempts


def test_attempt_counter_crosses_to_dlq(spark, tmp_path) -> None:
    src = tmp_path / "failures"
    src.mkdir()
    # batch 1: task A fails 3 times, task B once
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"ID": i}) for i in ["A", "A", "A", "B"])
    )
    time.sleep(1.1)
    # batch 2: A fails twice more (crosses 5), B once (stays alive)
    (src / "b2.json").write_text(
        "\n".join(json.dumps({"ID": i}) for i in ["A", "A", "B"])
    )

    raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(str(src))
    failures = raw.select(F.from_json("value", "ID STRING").alias("j")).select("j.*")
    tracked = track_attempts(failures, max_attempts=5)

    q = (
        tracked.writeStream.format("memory")
        .queryName("attempts_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from attempts_out").collect()
    by_key: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r.attempts):
        by_key.setdefault(r.ID, []).append((r.attempts, r.dead))

    # A: cumulative 3 then 5; the death notice fires exactly once,
    # on the crossing batch
    assert by_key["A"] == [(3, False), (5, True)]
    # B: never crosses
    assert by_key["B"] == [(1, False), (2, False)]
