"""Model/score evaluation: the metrics a training-data pipeline runs
against a scored table (ROC AUC, decile lift/gain, threshold
confusion) - the acceptance gates between "we trained on this corpus"
and "we ship the model", kept engine-exact so a gate cannot flicker
between the offline evaluation and the warehouse replay.

Exactness discipline (same as operators.profile's rank statistics):
every corpus-sized reduction is an integer count, ranks come from
cumulative sums over per-distinct-score count tables (never a
row-level sort), and each final metric is one fixed IEEE expression
over bigints - so a DuckDB/warehouse oracle reproduces every bit.

Scale shape: one partial-combined shuffle to per-(group, distinct
score) counts; every window below it runs over score cardinality,
never row count. No operator here sorts fact-scale input in a single
task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .profile import grid_bounds, mann_whitney

__all__ = ["binary_auc", "score_deciles", "confusion_at_threshold"]


def _quantized_score(
    df: DataFrame,
    score_col: str,
    bins: int | None,
    bounds: tuple[float, float] | None = None,
):
    """Score expression quantized onto a fixed ``width_bucket`` grid -
    the same scale tier as ``ks_statistic(bins=...)``. width_bucket is
    monotone, so any rank statistic computed over bucket indices is
    the statistic over scores with within-bin values tied; NULL scores
    map to NULL buckets (still dropped downstream).

    ``bounds=(lo, hi)`` pins the grid explicitly; without it the
    bounds come from the GLOBAL min/max (one scalar aggregate,
    driver-side pair). Explicit bounds matter twice at scale: they
    drop the extra full scan of the score column (at 100 TB the
    min/max job re-reads the fact table once before the real pass),
    and they make the grid STABLE across windows - a rolling monitor
    with auto bounds re-derives a different grid per batch, so its
    binned-AUC series is not comparable batch-to-batch. Out-of-range
    scores clamp to the under/overflow buckets (width_bucket's 0 and
    bins+1) - still monotone, so rank statistics stay well-defined
    when a batch exceeds the pinned domain (same contract as
    ``ks_statistic``)."""
    s = F.col(score_col).cast("double")
    grid = grid_bounds(df, s, bins, bounds)
    if grid is None:  # exact tier (bins=None); dangling bounds raised
        return F.col(score_col)
    lo, hi = grid
    return F.width_bucket(s, F.lit(lo), F.lit(hi), F.lit(bins))


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
    bins: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """ROC AUC of ``score_col`` against the boolean ``label_col`` per
    ``by`` group - the probability a random positive outscores a
    random negative, with ties counted half.

    AUC is exactly the Mann-Whitney U statistic of the positive class
    normalized by n_pos*n_neg, so this reuses
    ``operators.profile.mann_whitney``'s rank-from-counts machinery:
    doubled tie-averaged ranks (2*cum - t + 1) from cumulative counts
    over the distinct-score table, bigint rank sums, one fixed IEEE
    division. No row-level sort anywhere; NULL scores are dropped
    (they carry no rank). AUC is NULL when a group has only one class.

    Scale tier: rank-from-counts bounds the window's input by DISTINCT
    score cardinality - exact AND scale-free whenever the score domain
    is discrete (int-cents, quantized logits). For CONTINUOUS float
    scores distinct-count approaches row count and the per-group rank
    window degenerates back to a single-task row-scale sort; pass
    ``bins`` to quantize onto a fixed ``width_bucket`` grid first
    (exactly ``ks_statistic``'s binned tier) - the window input is
    then at most ``bins`` rows per group at any corpus size. Binned
    AUC counts within-bin positive/negative pairs as ties (half), the
    standard quantized-AUC approximation: the error is bounded by
    half the within-bin pair mass, sum_i(p_i*q_i)/(2*P*N) <= half the
    largest bin's smaller-class share; it is EXACT when quantization
    is injective on the observed scores. ``bounds=(lo, hi)`` pins the
    grid and skips the global min/max scan (see ``_quantized_score`` -
    one fewer pass over the fact table, and a stable grid across a
    monitor's windows); out-of-domain scores clamp to the edge
    buckets.

    Returns by + (n_pos, n_neg, auc).
    """
    keys = list(by or [])
    # an unknown label is not a negative: filter on the CAST value, so
    # both raw NULLs and values that cast to NULL boolean (e.g. a
    # string 'unknown') are dropped instead of when(NULL,'a')
    # .otherwise('b') silently classing them 'b' (score NULLs are
    # dropped inside mann_whitney)
    df = df.filter(F.col(label_col).try_cast("boolean").isNotNull())
    score = _quantized_score(df, score_col, bins, bounds)
    sided = df.select(
        *keys,
        score.alias("_s"),
        F.when(F.col(label_col).try_cast("boolean"), "a")
        .otherwise("b")
        .alias("_side"),
    )
    mw = mann_whitney(sided, "_s", "_side", by=keys)
    return mw.select(
        *keys,
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.col("effect").alias("auc"),
    )


def score_deciles(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
    n_buckets: int = 10,
    bins: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Decile lift/gain table: bucket rows by descending score into
    ``n_buckets`` value-deciles and report, per bucket, row/positive
    counts, cumulative counts, lift over the base rate, and cumulative
    gain - the "how deep do we have to dip into the ranked corpus"
    curve behind quality-threshold selection and campaign targeting.

    Bucket semantics are VALUE deciles: rows collapse to per-distinct-
    score counts first, and a whole tie group lands in the bucket of
    its last cumulative position (ceil(cum * B / n)). That keeps the
    assignment deterministic and engine-exact (a positional ntile
    splits ties arbitrarily AND needs a row-level global sort - the
    single-task bottleneck this formulation avoids); a bucket can be
    empty if one score value spans it, which is the honest answer for
    a discrete score. All counts are bigints; lift and gain are fixed
    IEEE expressions over them.

    Scale tier: as ``binary_auc``, the cumulative windows run over the
    distinct-score count table - pass ``bins`` for continuous float
    scores so the per-group window input is capped at ``bins`` rows
    regardless of corpus size (width_bucket is monotone, so bucket
    order IS score order; decile edges then land on grid edges, which
    can only coarsen the already-value-decile bucket boundaries).
    ``bounds=(lo, hi)`` pins the grid and skips the min/max scan, as
    in ``binary_auc``.

    Returns by + (decile, n_rows, n_pos, cum_rows, cum_pos, lift,
    cum_gain), decile 1 = highest scores.
    """
    keys = list(by or [])
    df = df.filter(
        F.col(score_col).isNotNull()
        & F.col(label_col).try_cast("boolean").isNotNull()
    )
    score = _quantized_score(df, score_col, bins, bounds)
    g = (
        df.groupBy(*keys, score.alias("_s"))
        .agg(
            F.count(F.lit(1)).alias("_t"),
            F.count(
                F.when(F.col(label_col).try_cast("boolean"), 1)
            ).alias("_p"),
        )
    )
    wv = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(
        F.col("_s").desc()
    )
    wt = W.partitionBy(*keys) if keys else W.partitionBy()
    stepped = g.select(
        *keys,
        "_t",
        "_p",
        F.sum("_t").over(wv).alias("_cum"),
        F.sum("_t").over(wt).alias("_n"),
    )
    bucket = F.ceil(
        F.col("_cum").cast("double")
        * n_buckets
        / F.col("_n").cast("double")
    ).cast("bigint")
    per = stepped.groupBy(*keys, bucket.alias("decile")).agg(
        F.sum("_t").alias("n_rows"),
        F.sum("_p").alias("n_pos"),
    )
    wb = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(
        "decile"
    )
    wtot = W.partitionBy(*keys) if keys else W.partitionBy()
    rows_d = F.col("n_rows").cast("double")
    pos_d = F.col("n_pos").cast("double")
    tot_rows = F.sum("n_rows").over(wtot)
    tot_pos = F.sum("n_pos").over(wtot)
    return per.select(
        *keys,
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(wb).alias("cum_rows"),
        F.sum("n_pos").over(wb).alias("cum_pos"),
        F.when(
            (F.col("n_rows") > 0) & (tot_pos > 0),
            (pos_d / rows_d)
            / (tot_pos.cast("double") / tot_rows.cast("double")),
        ).alias("lift"),
        F.when(
            tot_pos > 0,
            F.sum("n_pos").over(wb).cast("double") / tot_pos.cast("double"),
        ).alias("cum_gain"),
    )


def confusion_at_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Confusion counts + precision/recall/F1 at ``score >=
    threshold`` per group - the operating-point check that pairs with
    ``binary_auc`` (AUC says the ranking is good; this says the
    deployed cutoff is). One partial-combined aggregate; four bigint
    cells; every derived rate is a fixed IEEE expression (NULL when
    undefined, never NaN).

    Returns by + (tp, fp, tn, fn, precision, recall, f1).
    """
    keys = list(by or [])
    pred = F.col(score_col) >= F.lit(threshold)
    lab = F.col(label_col).try_cast("boolean")
    # labels that are NULL or CAST to NULL must not silently vanish
    # from the cells (pred & NULL counts nowhere, so tp+fp+tn+fn would
    # undercount the input)
    g = df.filter(
        F.col(score_col).isNotNull()
        & F.col(label_col).try_cast("boolean").isNotNull()
    ).groupBy(*keys).agg(
        F.count(F.when(pred & lab, 1)).alias("tp"),
        F.count(F.when(pred & ~lab, 1)).alias("fp"),
        F.count(F.when(~pred & ~lab, 1)).alias("tn"),
        F.count(F.when(~pred & lab, 1)).alias("fn"),
    )
    tp, fp, fn = (F.col(c).cast("double") for c in ("tp", "fp", "fn"))
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + fp))
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + fn))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2 * tp / (2 * tp + fp + fn),
    )
    return g.select(
        *keys,
        "tp",
        "fp",
        "tn",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
