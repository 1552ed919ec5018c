"""FIFO ledger allocation: match an outflow stream against an inflow
stream in arrival order, as relational algebra.

The classic inventory / cost-basis problem (which purchase lots does
each sale consume? which shipments does each return come out of?) is
usually written as a per-key imperative loop. Expressed over
cumulative-quantity intervals it is a plain join: give every inflow
row the half-open interval [cum_before, cum_after) on its key's
running-total number line, every outflow row likewise, and FIFO
allocation IS interval intersection - outflow units k..k' consume
exactly the inflow lots whose intervals cover [k, k'). No loop, no
UDF, no state: two per-key window cumsums + one key-equi join with a
range predicate.

Scale - TWO TIERS, selected by the largest per-key ledger:

- **interval-join tier** (the default regime): the window cumsums
  partition by key (never global) and the join is a per-key theta
  join. Spark evaluates n_in x n_out candidate pairs per key while
  the OUTPUT is provably <= n_in + n_out - 1 rows per key (two sorted
  disjoint interval chains can only interleave linearly) - fine while
  per-key ledgers are bounded (TPC-H part groups are ~30 rows at
  every SF; order books and SKU ledgers are similar).
- **grouped sort-merge tier**: a million-row single-key ledger makes
  the theta join quadratically melt one task (10^12 candidates), so
  past ``max_ledger_rows`` the operator switches to a per-key
  two-pointer merge inside cogrouped ``applyInPandas`` - O(n_in +
  n_out) per key, memory = one key's ledger per task. Few-big-group
  grouped Python is byte-bound, so the stage stays under AQE's
  size-based coalescing (the debounce rule pins width only for
  many-TINY-group stages).

Both tiers emit identical rows and an identical schema (the grouped
tier borrows the join tier's lazily-built schema); pytest forces each
tier over the same fixtures and asserts equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fifo_allocate"]


def _cum(
    df: DataFrame, key_cols: list[str], order_cols: list[str], qty_col: str,
    lo: str, hi: str,
) -> DataFrame:
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(qty_col)).over(w)
    return df.select(
        *key_cols,
        (running - F.col(qty_col)).alias(lo),
        running.alias(hi),
    )


def _join_tier(i: DataFrame, o: DataFrame, key_cols: list[str]) -> DataFrame:
    j = i.join(
        o,
        [
            *[i[k] == o[k] for k in key_cols],
            i["in_lo"] < o["out_hi"],
            o["out_lo"] < i["in_hi"],
        ],
    )
    return j.select(
        *[i[k] for k in key_cols],
        "in_lo",
        "in_hi",
        "out_lo",
        "out_hi",
        (
            F.least(F.col("in_hi"), F.col("out_hi"))
            - F.greatest(F.col("in_lo"), F.col("out_lo"))
        ).alias("alloc"),
        # zero-quantity ledger rows are zero-width intervals that can
        # sit strictly inside another interval and "overlap" with
        # alloc 0 - they allocate nothing, drop them
    ).filter(F.col("alloc") > 0)


def _grouped_tier(i: DataFrame, o: DataFrame, key_cols: list[str]) -> DataFrame:
    # identical output schema by construction: borrow it from the
    # (never-executed) join-tier plan
    schema = _join_tier(i, o, key_cols).schema

    def merge(left, right):
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({f.name: [] for f in schema.fields})
        left = left.sort_values("in_lo", kind="mergesort")
        right = right.sort_values("out_lo", kind="mergesort")
        ilo, ihi = left["in_lo"].tolist(), left["in_hi"].tolist()
        olo, ohi = right["out_lo"].tolist(), right["out_hi"].tolist()
        keys = [left.iloc[0][k] for k in key_cols]
        # two sorted disjoint interval chains: emit the overlap, then
        # advance the pointer whose interval ends first (both on a
        # tie) - classic interval-list intersection, O(n_in + n_out).
        # Zero-width rows (hi == lo) never overlap positively and
        # always advance, so the loop cannot stall.
        rows = []
        a = b = 0
        while a < len(ilo) and b < len(olo):
            alloc = min(ihi[a], ohi[b]) - max(ilo[a], olo[b])
            if alloc > 0:
                rows.append(keys + [ilo[a], ihi[a], olo[b], ohi[b], alloc])
            ia, ib = ihi[a], ohi[b]
            if ia <= ib:
                a += 1
            if ib <= ia:
                b += 1
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return (
        i.groupBy(*key_cols)
        .cogroup(o.groupBy(*key_cols))
        .applyInPandas(merge, schema)
    )


def fifo_allocate(
    inflows: DataFrame,
    outflows: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
    max_ledger_rows: int | None = 30_000,
) -> DataFrame:
    """Match ``outflows`` against ``inflows`` FIFO per key.

    Both frames need ``key_cols`` + ``order_cols`` + ``qty_col``;
    ``order_cols`` must be a deterministic total order within each key
    (include a unique tie-break). Quantities must be non-negative;
    integral types keep the result engine-exact.

    Returns one row per (inflow lot, outflow draw) pair with a
    positive allocation:
    key_cols + in_lo/in_hi + out_lo/out_hi (the cumulative-quantity
    intervals - unique lot/draw identifiers within the key) +
    ``alloc`` (units of this outflow filled from this lot).
    Unmatched tails (outflow demand beyond total inflow, or unsold
    inflow) simply produce no pair - per key,
    sum(alloc) == min(total_in, total_out).

    ``max_ledger_rows`` selects the physical shape (see module
    docstring): the operator measures the largest per-key side with
    one narrow count aggregate and takes the interval join while every
    ledger side is <= the bound, else the cogrouped sort-merge.
    Pass ``None`` to skip the measuring scan and force the join tier
    (caller asserts bounded ledgers), or ``0`` to force the grouped
    tier."""
    i = _cum(inflows, key_cols, order_cols, qty_col, "in_lo", "in_hi")
    o = _cum(outflows, key_cols, order_cols, qty_col, "out_lo", "out_hi")
    if max_ledger_rows is None:
        return _join_tier(i, o, key_cols)
    if max_ledger_rows <= 0:
        return _grouped_tier(i, o, key_cols)
    # one narrow count job over both sides (key cols only, sides kept
    # apart - the candidate mass is n_in x n_out per key, so the bound
    # is the largest single SIDE) - the same measured-bound discipline
    # as bfs_hops' edge count
    biggest = (
        inflows.select(*key_cols, F.lit(0).alias("_side"))
        .unionByName(outflows.select(*key_cols, F.lit(1).alias("_side")))
        .groupBy(*key_cols, "_side")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    if biggest is None or biggest <= max_ledger_rows:
        return _join_tier(i, o, key_cols)
    return _grouped_tier(i, o, key_cols)
