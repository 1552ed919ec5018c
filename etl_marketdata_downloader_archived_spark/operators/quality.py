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
    an orphan. Only the parent KEY column ships, unhinted: parent key
    domains scale with the corpus (orders/customer parents), so AQE
    picks the broadcast anti join while the key set is genuinely below
    the threshold and falls back to shuffle when it is not."""
    pk = parent_key or child_key
    keys = parent.select(F.col(pk).alias(child_key)).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )


def fd_violations(
    df: DataFrame,
    determinant: list[str] | str,
    dependent: str,
) -> DataFrame:
    """Functional-dependency checker: does ``determinant`` determine
    ``dependent``? Returns one row per VIOLATING determinant value -
    a key whose rows carry more than one distinct dependent value -
    with the distinct-value count, the row count, and the two
    extreme witnesses (min/max dependent), so the violation is
    immediately inspectable without a second query. Empty result ==
    the FD holds; the schema-level companion of fk_violations (keys
    exist) and validate (rows are well-formed): COLUMNS RELATE.

    The classic silent-corruption detectors: order_id -> order_date
    after a bad merge, user_id -> signup_country after a region
    split, sku -> unit_price inside one snapshot. NULL dependents
    count as a distinct state (a key mapping to both a value and
    NULL is two verdicts about the same fact, which IS a violation)
    - count(DISTINCT x) ignores NULLs, so the null state is folded
    in explicitly via a max-null flag.

    Scale shape: one partial-combined aggregate on the determinant
    key; output is violation-sized, never table-sized. No windows,
    no joins."""
    keys = [determinant] if isinstance(determinant, str) else list(determinant)
    has_null = F.max(
        F.when(F.col(dependent).isNull(), 1).otherwise(0)
    )
    agg = df.groupBy(*keys).agg(
        (F.countDistinct(dependent) + has_null).alias("n_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(dependent).alias("witness_min"),
        F.max(dependent).alias("witness_max"),
    )
    return agg.filter(F.col("n_distinct") > 1)
