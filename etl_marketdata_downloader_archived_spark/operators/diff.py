"""Snapshot diff (CDC-style table compare).

`table_diff` computes the row-level delta between two versions of a
keyed table: which keys were ADDED, REMOVED, or CHANGED (and which
columns changed). The audit half of the lake's mutation surface - what
`io.merge_partitioned` / `io.write_audit_publish` apply, this
verifies after the fact, and what an incremental downstream consumer
replays. The reference mutates its catalog blindly in place
(data-downloader/data_downloader.py:40-48, full-file rewrite) with no
way to answer "what changed"; SCD2 (operators.history) keeps the
time dimension, this keeps the version-to-version delta.

Scale: one key-partitioned full-outer join (sort-merge at scale, AQE
broadcasts a small side), column compares are in-row null-safe
equality, unchanged rows drop before anything downstream - the output
is delta-sized, never table-sized. No collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "apply_changes", "schema_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level delta NEW vs OLD keyed by ``key_cols``.

    Returns key_cols + ``change`` ('added'|'removed'|'changed', plus
    'unchanged' when ``include_unchanged``) + ``changed_cols`` (sorted
    array of differing column names; empty unless 'changed').
    ``compare_cols`` defaults to all shared non-key columns. Column
    compares are null-safe (NULL == NULL, NULL != value)."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(key_cols))
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *key_cols,
        change.alias("change"),
        F.when(change == "changed", F.array_sort(diffs))
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC change feed to a snapshot (the APPLY CHANGES INTO /
    MERGE-from-CDC pattern): ``changes`` carries one row per mutation
    with ``op_col`` in {'upsert', 'delete'} and a monotonically
    comparable ``seq_col`` (commit LSN, event time); for each key the
    LATEST change wins - an upsert replaces the base row, a delete
    removes it, stale intermediate changes are ignored entirely.

    Shape: one window pass over the CHANGE FEED ONLY (rank per key by
    seq desc - feed-sized, not table-sized), then one key join against
    the base: anti-join drops keys with any winning change, union
    appends the winning upserts. The base is never windowed; at 100 TB
    the cost is the change feed + one shuffle-or-broadcast join, and
    composed with io.merge_partitioned the rewrite touches only the
    partitions holding changed keys.

    Ties on (key, seq) break deterministically: delete beats upsert
    (the conservative read of simultaneous ops), pinned in tests.
    """
    from pyspark.sql import Window as W

    data_cols = [c for c in base.columns]
    w = W.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # on equal seq, delete wins: 'delete' < 'upsert' ascending
        F.col(op_col).asc(),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = base.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) == "upsert").select(*data_cols)
    return survivors.unionByName(upserts)


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Structural drift between two table versions - the SCHEMA half
    of the compare surface (table_diff answers "which rows changed";
    this answers "did the SHAPE change", which is what breaks
    downstream consumers silently when an upstream producer deploys).
    Returns a driver-side list of change records (schemas are
    metadata - no job runs):

    ``{"column", "change", "old", "new"}`` with change one of
    ``added`` / ``removed`` / ``type_changed`` / ``nullability_changed``
    (a column reported type_changed is not also reported for
    nullability - the type change subsumes it). Column order changes
    are NOT reported: columnar formats and the engine address columns
    by name, so order is presentation, not shape.

    Use it as a write-path gate (refuse or alert before publishing a
    frame whose shape drifted from the landed table) or a read-path
    preflight next to io.read_with_evolution, which MERGES compatible
    drift - this reports it."""
    old_f = {f.name: f for f in old.schema.fields}
    new_f = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in old_f:
        if name not in new_f:
            out.append(
                {
                    "column": name,
                    "change": "removed",
                    "old": old_f[name].dataType.simpleString(),
                    "new": None,
                }
            )
    for name, nf in new_f.items():
        of = old_f.get(name)
        if of is None:
            out.append(
                {
                    "column": name,
                    "change": "added",
                    "old": None,
                    "new": nf.dataType.simpleString(),
                }
            )
        elif of.dataType != nf.dataType:
            out.append(
                {
                    "column": name,
                    "change": "type_changed",
                    "old": of.dataType.simpleString(),
                    "new": nf.dataType.simpleString(),
                }
            )
        elif of.nullable != nf.nullable:
            out.append(
                {
                    "column": name,
                    "change": "nullability_changed",
                    "old": "nullable" if of.nullable else "required",
                    "new": "nullable" if nf.nullable else "required",
                }
            )
    return out
