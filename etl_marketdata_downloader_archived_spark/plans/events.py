"""Event-history analytics battery (SURVEY.md section 2C rows
"Event funnels + cohort retention" and "SCD2 history").

Registered between the LLM-pipeline battery and the dataflow
composites so both queries hold certified driver slots (the driver
certifies the first 50 registered queries); the two signature-seeded
panels they displace live in plans/tail.py with the rest of the
rows-only overflow.

The reference keeps no history at all - its catalog is a mutable
CSV that point-updates rows in place (reference:
data-downloader/data_downloader.py:40-48) - so interval versioning,
funnels, and retention are capabilities the lake engine adds rather
than ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q


@q(
    "funnel_cohort",
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
    ),
    first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    )
    SELECT 'funnel' AS kind, CAST(NULL AS DATE) AS cohort_week,
           1 AS step_idx, 'view' AS step, count(*) AS n_users
    FROM s1
    UNION ALL
    SELECT 'funnel', CAST(NULL AS DATE), 2, 'click', count(*) FROM s2
    UNION ALL
    SELECT 'funnel', CAST(NULL AS DATE), 3, 'purchase', count(*) FROM s3
    UNION ALL
    SELECT 'cohort', f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.week) / 7 AS INT),
           CAST(NULL AS VARCHAR), count(*)
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2, 3, 4
    """,
)
def funnel_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel + exact cohort-retention matrix as ONE
    tagged union (registry packing, the join_equi pattern):

    - kind='funnel': view -> click -> purchase funnel; a user counts
      for step N only with an event strictly AFTER their step-N-1
      entry time. Each stage is a filtered aggregate joined to the
      previous front - per-step shuffles on user_id only (the type
      filter prunes the scan); no per-user event collection, so
      unbounded per-user activity cannot blow executor memory.
      step_idx = step number, step = step name, cohort_week = NULL.
    - kind='cohort': users grouped by first-activity week, counted in
      every later week they return. Two shuffles (per-user first
      week; distinct activity weeks) + a key join; the exact twin of
      the theta-sketch retention (operators.sketches.retention),
      which answers the same question from pre-aggregated state
      without rescanning facts. step_idx = weeks_since, step = NULL.
    """
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
    out = None
    for df, idx, name in [(s1, 1, "view"), (s2, 2, "click"), (s3, 3, "purchase")]:
        piece = df.agg(
            F.lit("funnel").alias("kind"),
            F.lit(None).cast("date").alias("cohort_week"),
            F.lit(idx).alias("step_idx"),
            F.lit(name).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = piece if out is None else out.unionByName(piece)

    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    cohort = (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("step_idx"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.lit("cohort").alias("kind"),
            "cohort_week",
            "step_idx",
            F.lit(None).cast("string").alias("step"),
            "n_users",
        )
    )
    return out.unionByName(cohort)


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
