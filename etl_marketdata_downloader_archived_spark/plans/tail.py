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
