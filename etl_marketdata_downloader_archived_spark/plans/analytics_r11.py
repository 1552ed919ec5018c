"""Round-11 analytics extensions - registered past the certified
window (parity-verified locally by tools/parity.py, the driver's
identical check, no certificate).

Same cross-engine exactness discipline as the earlier analytics
batteries: every corpus-sized reduction is an integer (int-cents
fix-point, bigint counts, epoch-millis timestamps), selections instead
of interpolations, and any final float is ONE fixed IEEE expression
over those integers, so the DuckDB oracles replay each query
bit-for-bit with no rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q


@q(
    "stream_late_drop",
    oracle="""
    WITH ev AS (
        SELECT event_id,
               epoch_ms(ts) AS ts_ms,
               CAST(round(value * 100) AS BIGINT) AS v_c
        FROM events WHERE ts IS NOT NULL
    ),
    arr AS (
        SELECT *,
               (ts_ms // 86400000)
               + CASE WHEN event_id % 17 = 0 THEN 3 ELSE 0 END
                 AS batch_id
        FROM ev
    ),
    bm AS (SELECT batch_id, max(ts_ms) AS bmax FROM arr GROUP BY 1),
    wm AS (
        SELECT batch_id,
               max(bmax) OVER (
                   ORDER BY batch_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - 3600000 AS wm_ms
        FROM bm
    ),
    fin AS (SELECT max(bmax) - 3600000 AS final_wm_ms FROM bm),
    flagged AS (
        SELECT a.v_c,
               (a.ts_ms // 21600000) * 21600000 AS w_start_ms,
               (a.ts_ms // 21600000) * 21600000 + 21600000 AS w_end_ms,
               CASE WHEN w.wm_ms IS NOT NULL
                         AND (a.ts_ms // 21600000) * 21600000 + 21600000
                             <= w.wm_ms
                    THEN 1 ELSE 0 END AS dropped
        FROM arr a JOIN wm w USING (batch_id)
    )
    SELECT make_timestamp(w_start_ms * 1000) AS w_start,
           CAST(sum(1 - dropped) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN dropped = 0 THEN v_c END) AS BIGINT)
               AS kept_cents,
           CAST(sum(dropped) AS BIGINT) AS n_dropped,
           (sum(1 - dropped) > 0
            AND max(w_end_ms) <= (SELECT final_wm_ms FROM fin))
               AS emitted
    FROM flagged
    GROUP BY w_start_ms
    """,
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data certification (VERDICT r10 item 6): the
    batch-replayable twin of an append-mode watermarked tumbling
    aggregation, so the exact drop/emit arithmetic that was
    pytest-only (SURVEY 2B's watermark row) gets a differential
    oracle. The feed is the events table arriving in day-indexed
    micro-batches with a deterministic straggler pattern (every 17th
    event_id lands 3 batches late); watermark delay 1 h, windows 6 h.
    streaming.windows.watermark_replay pins the semantics (probed
    against a real stream in tests/test_streaming.py): watermark =
    running max of PRIOR batches' max event time minus delay, a row
    drops iff its window END <= that watermark (equality drops), a
    window emits iff it has kept rows and closed under the final
    watermark.

    Output: one row per 6 h window touched by the feed - kept-row
    count, kept int-cents value, dropped-row count, emitted flag.

    Scale shape: the watermark table is one row per ARRIVAL BATCH
    (trigger-count-bounded - here one per calendar day), so its
    running-max global window and the join back to events stay
    calendar-sized at any SF; everything else is one partial-combined
    window aggregate over the fact."""
    from ..streaming.windows import watermark_replay

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        )
        .withColumn(
            "batch_id",
            F.expr("unix_millis(cast(ts as timestamp)) div 86400000")
            + F.when(F.col("event_id") % 17 == 0, F.lit(3)).otherwise(
                F.lit(0)
            ),
        )
    )
    flagged = watermark_replay(
        ev, "ts", "batch_id", delay_ms=3_600_000, width_ms=21_600_000
    )
    dropped = F.col("late_dropped").cast("int")
    # bool_or(emitted) == (any kept row) AND (window closed under the
    # final watermark): emitted is ~dropped & closed per row, and
    # closed is constant within a window.
    return (
        flagged.groupBy("w_start_ms")
        .agg(
            F.sum(F.lit(1) - dropped).cast("bigint").alias("n_kept"),
            F.sum(F.when(~F.col("late_dropped"), F.col("v_c")))
            .cast("bigint")
            .alias("kept_cents"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            F.bool_or("emitted").alias("emitted"),
        )
        .select(
            F.timestamp_millis(F.col("w_start_ms")).alias("w_start"),
            "n_kept",
            "kept_cents",
            "n_dropped",
            "emitted",
        )
    )


@q(
    "approx_percentile_cert",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
    FROM lineitem GROUP BY 1
    """,
)
def approx_percentile_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error certificate for the built-in percentile_approx
    (VERDICT r10 stretch item: the quantile function users reach for
    first had no oracle row - the battery certified only exact
    positional quantiles and mergeable KLL-style sketches).

    Differential form, the agg_approx_distinct pattern: Spark computes
    the sketch quantiles AND each returned value's exact rank interval
    (percentile_approx returns actual data points, so the value's
    ranks occupy (count_lt, count_le]), then asserts that interval
    intersects [(q - tol)*N - 2, (q + tol)*N + 2] with tol = 5x the
    documented relative rank error (1/accuracy, accuracy=1000). The
    oracle expects TRUE per group alongside the exact group size - the
    accuracy CONTRACT is the cross-checkable artifact (GK-summary
    internals have no DuckDB twin). Production plans use the sketch
    alone; the rank counts here are the certificate, not the plan.

    Scale shape: one partial-combined quantile aggregate over the fact
    (GK summaries merge map-side, bounded memory - that is WHY this
    function is the 100 TB substitute for exact quantiles), one 3-row
    enum-keyed join back (unhinted; AQE broadcasts), one conditional
    count aggregate. No sort, no global window."""
    eps = 1.0 / 1000
    tol = 5 * eps
    qs = [0.25, 0.50, 0.75]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice",
            F.array(*[F.lit(p) for p in qs]),
            F.lit(1000),
        ).alias("vs")
    )
    joined = li.join(ap, "l_returnflag")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(3):
        aggs.append(
            F.sum(
                (F.col("l_extendedprice") < F.col("vs")[i]).cast("long")
            ).alias(f"_lt{i}")
        )
        aggs.append(
            F.sum(
                (F.col("l_extendedprice") <= F.col("vs")[i]).cast("long")
            ).alias(f"_le{i}")
        )
    stats = joined.groupBy("l_returnflag").agg(*aggs)
    cols = [F.col("l_returnflag"), F.col("n").cast("bigint").alias("n")]
    for i, (p, name) in enumerate(zip(qs, ["q25_ok", "q50_ok", "q75_ok"])):
        lo = (F.lit(p - tol) * F.col("n")) - F.lit(2.0)
        hi = (F.lit(p + tol) * F.col("n")) + F.lit(2.0)
        cols.append(
            (
                (F.col(f"_lt{i}") + F.lit(1) <= hi)
                & (F.col(f"_le{i}") >= lo)
                # the returned quantile must be a member value
                & (F.col(f"_le{i}") > F.col(f"_lt{i}"))
            ).alias(name)
        )
    return stats.select(*cols)
