"""Trainable document-quality classifier - the model-based filter
tier of the corpus pipeline (the CCNet / GPT-3 recipe: a linear
classifier over hashed bag-of-words features separates
reference-quality text from crawl junk, catching what rule gates
cannot), built on pyspark.ml so training AND inference are
distributed dataframe jobs.

Split of labor with the rule gates (operators.text.quality_score /
gopher-style gates): rules are cheap, interpretable, and
calibration-free - they run FIRST and remove the unambiguous junk;
the classifier learns the residual distinction from examples (a seed
of known-good documents vs a sample of the crawl, the standard
weak-supervision setup) and emits a PROBABILITY, so the corpus mixer
can threshold or importance-sample on it (the GPT-3 paper's
Pareto-sampling trick needs exactly this score).

Scale shape: featurization is HashingTF - a stateless in-row map to a
fixed 2^18-dim sparse vector (no vocabulary broadcast, no fit pass,
nothing to ship but the closure), so inference is one narrow
projection over the corpus: linear scan, no shuffle, embarrassingly
parallel at any corpus size. Training cost is bounded by the LABELED
set (thousands of docs, not the corpus); LBFGS iterations are
treeAggregate reductions over it. The model object is a handful of
2^18-dim dense coefficients (~2 MB) riding the task closure like any
broadcast dimension.

Reference anchor: the reference pipeline stores raw fetched text with
no quality notion at all (data-downloader/data_downloader.py:69-70);
this supplies the scoring stage its corpus consumers need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "score_documents",
    "train_quality_classifier",
]

_FEATURE_DIM = 1 << 18


def train_quality_classifier(
    good_docs: DataFrame,
    bad_docs: DataFrame,
    text_col: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the quality model: label the seed frames (good=1, bad=0),
    tokenize on the engine's standard [^a-z]+ word rule, hash to a
    fixed sparse space, fit binary logistic regression. Returns the
    fitted ``pyspark.ml.PipelineModel``.

    Determinism: HashingTF is a pure function of the tokens; LBFGS
    from a fixed zero start on a fixed dataset converges to the same
    optimum up to float reduction order - tests therefore assert
    SEPARATION floors (holdout accuracy, score ordering), never exact
    coefficient pins (the same contract the IVF/recall tests use).

    The regexTokenizer pattern matches operators.text's tokenizer so
    the features describe the same token stream the rule gates saw."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    labeled = good_docs.select(
        F.col(text_col).alias("text"), F.lit(1.0).alias("label")
    ).unionByName(
        bad_docs.select(
            F.col(text_col).alias("text"), F.lit(0.0).alias("label")
        )
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text",
                outputCol="_toks",
                pattern="[^a-z]+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="_toks",
                outputCol="_feat",
                numFeatures=_FEATURE_DIM,
                binary=True,
            ),
            LogisticRegression(
                featuresCol="_feat",
                labelCol="label",
                regParam=reg_param,
                maxIter=max_iter,
                standardization=False,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_documents(
    model, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach ``quality_prob`` (P(high quality), from the fitted
    model) to every document - the corpus mixer's threshold /
    importance-sampling input. One narrow pass: tokenize, hash,
    dot-product against the broadcast coefficients; no shuffle, no
    state, linear in the corpus. The caller's columns pass through
    untouched: when ``text_col`` is not literally "text", any
    pre-existing "text" column is set aside for the model's fixed
    input name and restored afterwards (review finding: the first
    cut overwrote it with ``text_col``'s values in the output)."""
    from pyspark.ml.functions import vector_to_array

    staged = docs
    had_text = "text" in docs.columns and text_col != "text"
    if had_text:
        staged = staged.withColumnRenamed("text", "__qm_orig_text")
    if text_col != "text":
        staged = staged.withColumn("text", F.col(text_col))
    scored = model.transform(staged)
    out = scored.withColumn(
        "quality_prob",
        F.element_at(vector_to_array("probability"), 2),
    ).drop("_toks", "_feat", "rawPrediction", "probability", "prediction")
    if text_col != "text":
        out = out.drop("text")
    if had_text:
        out = out.withColumnRenamed("__qm_orig_text", "text")
    return out
