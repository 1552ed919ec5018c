"""Declarative data-quality gates for ingest pipelines.

The reference trusts its inputs completely (naive ``split(',')``,
no validation anywhere - SURVEY.md section 1.3 schema system); the
engine's CSV reader already quarantines MALFORMED rows
(sources.catalog, PERMISSIVE + _corrupt_record). This module
generalizes that to SEMANTIC checks: each rule is a Catalyst boolean
over the row, every row is evaluated against every rule in ONE narrow
pass, and violating rows route to a quarantine side with the list of
failed rule names attached (never silently dropped - the
reference's error path, restated for data instead of tasks).

Scale shape: ``validate`` is a projection + filter pair over one
cached evaluation - no shuffle, no second scan. ``fk_violations`` is
the referential check: a left-anti join that ships only the key
column, broadcast when the parent side is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantined) by the named rules.

    Each rule is a boolean Column that is True for GOOD rows; a NULL
    verdict counts as a violation (the SQL three-valued-logic trap:
    ``col > 0`` on a NULL col is NULL, and a gate that lets NULL
    through is not a gate). Quarantined rows carry ``_violations``,
    the array of failed rule names, so one quarantine table serves
    every rule."""
    checks = F.array(
        *[
            F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name))
            for name, cond in rules.items()
        ]
    )
    flagged = df.withColumn(
        "_violations", F.filter(checks, lambda x: x.isNotNull())
    )
    clean = flagged.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = flagged.filter(F.size("_violations") > 0)
    return clean, quarantined


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Child rows whose key has no parent (referential integrity as an
    anti join). NULL child keys are excluded - they are ``validate``'s
    not-null rule's job, and an anti join would report every NULL as
    an orphan. Only the parent KEY column ships; dimension-sized
    parents broadcast."""
    pk = parent_key or child_key
    keys = parent.select(F.col(pk).alias(child_key)).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        F.broadcast(keys), child_key, "left_anti"
    )
