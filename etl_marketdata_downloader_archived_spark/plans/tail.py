"""Queries registered BEYOND the driver's 50-certified-slot window.

The driver's correctness run certifies the first 50 registered queries
(SURVEY.md section 2A battery-packing note). Anything here still runs
under ``tools/parity.py`` locally and keeps its pytest coverage - it
just holds no driver certificate. Queries land here either because
their driver signal would be weakest anyway (rows-only checks over
deterministic stubs / engine-seeded hashes) or because the certified
window is full (`scd2_history_events` is fully oracle-checked, just
locally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.multimodal import text_to_assets
from .registry import q


@q("multimodal_decode")  # stub decode (mapInPandas plumbing) -> rows-only
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage over binary assets (deterministic
    fake codec; real codec libs absent in this environment). Plumbing
    (schema, batching, partitioning) is real and pytest-verified in
    tests/test_operators.py; the certified multimodal evidence is
    multimodal_meta (oracle-checked)."""
    from ..operators.multimodal import decode_assets

    d = load_table(spark, sf_dir, "documents")
    return decode_assets(text_to_assets(d, "doc_id", "text"), fake=True)


@q(
    "scd2_history_events",
    oracle="""
    WITH chg AS (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_type
               ) AS prev
        FROM events
    ),
    v AS (
        SELECT user_id, event_type, ts AS valid_from
        FROM chg WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER w AS valid_to,
           CAST(row_number() OVER w AS INT) AS version,
           (lead(valid_from) OVER w IS NULL) AS is_current
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_type)
    """,
)
def scd2_history_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the events stream: each user's event_type as an
    observed state, collapsed to interval versions
    (operators.history.scd2_history) - differentially checked against
    a window-function restatement in the oracle. event_type is
    non-null, so the engine's null-safe change test reduces to `<>`;
    same-instant ties order by the attribute on both sides."""
    from ..operators.history import scd2_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    return scd2_history(ev, ["user_id"], "ts", ["event_type"])


@q("quantile_rollup")  # xxhash64 sampling coordinate -> rows-only
def quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches end-to-end: per-(event_type, day)
    bottom-k samples of `value`, REGROUPED to per-event_type p50/p90
    by sketch merge alone (operators.sketches) - the raw events are
    scanned once. No oracle: the sampling coordinate is Spark's
    xxhash64, which DuckDB cannot replicate; accuracy and exact
    mergeability are pytest-pinned (tests/test_sketches.py)."""
    from ..operators.sketches import build_quantile_sketches, estimate_quantiles

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    sk = build_quantile_sketches(
        ev, "value", id_cols=["event_id"], bucket_cols=["event_type", "day"],
        k=256,
    )
    return estimate_quantiles(
        sk, probs=[0.5, 0.9], group_cols=["event_type"], k=256
    )


@q(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM s3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view -> click -> purchase): a user counts
    for step N only with an event AFTER their step-N-1 entry time.
    Each stage is a filtered aggregate joined to the previous front -
    per-step shuffles on user_id only (type filters prune the scan);
    no per-user event collection, so unbounded per-user activity
    cannot blow memory."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )

    def front(prev, etype, tcol):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(tcol))
        prev_t = prev.columns[-1]
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    s1 = front(None, "view", "t1")
    s2 = front(s1, "click", "t2")
    s3 = front(s2, "purchase", "t3")
    rows = [
        (s1, 1, "view"),
        (s2, 2, "click"),
        (s3, 3, "purchase"),
    ]
    out = None
    for df, idx, name in rows:
        piece = df.agg(
            F.lit(idx).alias("step_idx"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


@q(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.week) / 7 AS INT)
               AS weeks_since,
           count(*) AS n_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cohort-retention matrix: users grouped by first-activity
    week, counted in every later week they return. Two shuffles (per-
    user first week; distinct activity weeks) + a key join; the exact
    twin of the theta-sketch retention (operators.sketches.retention),
    which answers the same question from pre-aggregated state without
    touching the fact table."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
