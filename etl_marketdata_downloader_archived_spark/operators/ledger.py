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

Scale: the window cumsums partition by key (never global). The join
is a per-key theta join - Spark evaluates n_in x n_out candidate
pairs per key, while the OUTPUT is provably <= n_in + n_out - 1 rows
per key (two sorted disjoint interval chains can only interleave
linearly). That candidate bound is the operator's scale assumption:
per-key ledger sizes must be bounded (TPC-H part groups are ~30
rows at every SF; order books and SKU ledgers are similar). For
million-row single-key ledgers the escape is a per-key
sort-merge inside applyInPandas - the same boundary basket_pairs
documents for its in-row pair shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fifo_allocate"]


def fifo_allocate(
    inflows: DataFrame,
    outflows: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    qty_col: str,
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
    sum(alloc) == min(total_in, total_out)."""

    def cum(df: DataFrame, lo: str, hi: str) -> DataFrame:
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

    i = cum(inflows, "in_lo", "in_hi")
    o = cum(outflows, "out_lo", "out_hi")
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
