"""Statistical text ranking: corpus-trained bigram-LM scoring and BM25.

Two classic training-data-pipeline operators the quality-filter stack
needs beyond surface heuristics (operators.text):

- **Bigram LM cross-entropy** (CCNet-style quality signal): train an
  add-one-smoothed bigram language model ON the corpus itself, then
  score every document by its per-bigram cross-entropy under that
  model. Boilerplate/gibberish scores high, fluent text low - the
  standard model-based quality filter, here with the "model" a pair of
  count tables built by plain aggregations so the whole thing stays
  JVM-side and oracle-checkable (no opaque model weights).
- **BM25 top-k retrieval**: Lucene-variant BM25 over the corpus for a
  constant query-term set - the keyword twin of the embedding
  retrieval in operators.similarity.

Scale posture (100 TB corpus):
- Tokenization and per-doc bigram construction are narrow in-row
  expressions (``split`` + ``slice`` + ``arrays_zip``) - no window, no
  shuffle, no Python.
- LM training is two aggregations: bigram counts shuffle once on the
  bigram key; context totals re-aggregate the COUNTS table (corpus-
  sized input never touched twice). Scoring joins exploded doc-bigrams
  to the counts on the bigram key - sort-merge at scale, AQE broadcasts
  when the vocabulary is small.
- BM25 never explodes the corpus at all: per-term tf is an in-row
  lambda over the token array, corpus stats (N, avgdl, df per term) are
  one single-row aggregate cross-joined (broadcast) back, and the top-k
  is TakeOrdered - zero wide shuffle.

Reference anchor: the reference has no ranking/scoring at all - its
only notion of relevance is a glob pattern over file listings
(data-downloader/data_downloader.py:155). These operators give the
lake the retrieval/quality surface its Athena delegation would need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "word_tokens",
    "doc_bigrams",
    "bigram_lm_counts",
    "lm_cross_entropy",
    "bm25_topk",
    "inverted_index",
    "pmi_pairs",
]


def word_tokens(text: Column | str) -> Column:
    """Lowercase alphabetic word tokenization (deterministic, locale-
    free): split on runs of non-[a-z], drop empties. Chosen because an
    independent engine can replay it exactly (DuckDB
    ``string_split_regex(lower(text), '[^a-z]+')``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), "[^a-z]+"), lambda x: x != F.lit(""))


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) - one row per consecutive token pair per document.

    Built in-row (slice + arrays_zip) then exploded: no window over a
    doc partition, so deriving bigrams never shuffles the corpus. The
    token array goes through its own projection step so the regex
    tokenizer evaluates ONCE per row - referencing the column from a
    prior select keeps CollapseProject from inlining the non-cheap
    expression into each of its four uses (verified in the executed
    plan: one `split(lower(...))` occurrence, not four)."""
    tok = df.select(F.col(id_col), word_tokens(text_col).alias("_t"))
    t = F.col("_t")
    pairs = F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
    )
    return tok.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_lm_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Train the add-one bigram LM: returns (w1, w2, c12, c1) where
    c12 = corpus count of the bigram and c1 = count of w1 as a bigram
    context (= sum of c12 over w2, so the model is properly
    normalized). One corpus-sized shuffle (bigram groupBy); the context
    totals are a WINDOW over the already-collapsed counts table - not a
    join against a separately-derived aggregate, which Catalyst would
    expand into a second corpus scan + shuffle (no common-subplan
    sharing across DataFrame reuse). The window touches only the
    vocab^2-bounded counts table."""
    from pyspark.sql import Window

    counts = (
        doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return counts.withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1"))
    )


def lm_cross_entropy(
    docs: DataFrame, id_col: str, text_col: str, counts: DataFrame | None = None
) -> DataFrame:
    """Per-document cross-entropy under the corpus bigram LM.

    For each in-doc bigram: logp = ln(c12 + 1) - ln(c1 + V) with V the
    corpus vocabulary size (add-one smoothing). Returns
    (id, n_bigrams, xent) with xent = -avg(logp) rounded to 4 dp (the
    rounding absorbs cross-engine libm/summation-order ulp drift so the
    DuckDB oracle compares exactly). Docs with < 2 tokens have no
    bigrams and drop out - they carry no LM evidence.

    ``counts`` defaults to a model trained on ``docs`` itself (the
    self-scoring quality-filter setup); pass a held-out model to score
    new data against a reference corpus."""
    if counts is None:
        counts = bigram_lm_counts(docs, id_col, text_col)
    vocab = docs.select(
        F.explode(word_tokens(text_col)).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    scored = (
        doc_bigrams(docs, id_col, text_col)
        .join(counts, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (F.log(F.col("c12") + 1) - F.log(F.col("c1") + F.col("v"))).alias(
                "logp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("logp"), 4).alias("xent"),
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Lucene idf variant) top-k documents for a fixed term set.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Plan shape: per-term tf is an in-row ``size(filter(tokens, =t))``
    (the corpus is never exploded), corpus stats (N, avgdl, per-term
    df) collapse to ONE row broadcast back via crossJoin, and the
    result is TakeOrdered(k) on (rounded score desc, id asc) - the
    rounded score is the sort key on BOTH engines so tie-selection
    under LIMIT is deterministic cross-engine."""
    # tokenize through a dedicated projection so the regex split runs
    # once per row; CollapseProject keeps multi-referenced non-cheap
    # expressions in their own step instead of inlining a copy into
    # dl + every tf (verified: one `split` in the executed plan)
    tok = docs.select(F.col(id_col), word_tokens(text_col).alias("_t"))

    def _tf(term: str) -> Column:
        # closure helper: a 2-arg lambda would be read by F.filter as
        # (element, index), so bind the term via an outer function
        return F.size(F.filter(F.col("_t"), lambda x: x == F.lit(term)))

    base = tok.select(
        F.col(id_col), F.size("_t").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df_t = F.col(f"df_{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        term = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    return (
        joined.select(
            id_col, F.round(score, 4).alias("score"), F.col("dl").alias("doc_len")
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    top_docs: int = 5,
) -> DataFrame:
    """Term-level inverted index over the corpus: one row per term with
    its document frequency, total term frequency, and the top
    ``top_docs`` posting heads (doc ids ordered by tf desc, id asc) as
    a comma-joined string - the build step behind BM25/keyword
    retrieval, materialized as a queryable table instead of recomputed
    per query.

    Plan: explode tokens -> hash-aggregate (term, doc) tf (the ONE
    corpus-sized shuffle, partial-combined map-side), then TWO
    bounded consumers of the tf table joined on term:
    - df/total_tf as a plain partial-combined aggregate (no window:
      a stopword-class term with 10^9 postings combines map-side
      instead of sorting in one task);
    - posting heads as a row_number filter applied DIRECTLY after the
      window, which lets Catalyst insert a partial WindowGroupLimit
      BEFORE the shuffle - each map task forwards at most
      ``top_docs`` rows per term, so the per-term sort task sees
      O(top_docs x map partitions) rows, never the full posting list.
    The previous single-window formulation computed df inside the same
    aggregate, which blocked the group-limit push and sent EVERY
    posting of a term through one task - correct, but a skew
    bottleneck at corpus scale. df/total_tf count ALL postings, not
    just the retained heads.
    """
    tf = (
        df.select(F.col(id_col).alias("_id"), word_tokens(text_col).alias("_t"))
        .select("_id", F.explode("_t").alias("term"))
        .groupBy("term", "_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w = W.partitionBy("term").orderBy(F.col("tf").desc(), F.col("_id").asc())
    heads = (
        tf.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_docs)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_rn"), F.col("_id")))
                    ),
                    lambda s: s["_id"].cast("string"),
                ),
                ",",
            ).alias("top_doc_ids")
        )
    )
    # LEFT join: with top_docs=0 (index terms, skip posting heads)
    # the heads frame is empty and an inner join would drop every
    # term; absent heads surface as an empty posting string instead.
    idx = agg.join(heads, "term", "left").withColumn(
        "top_doc_ids", F.coalesce(F.col("top_doc_ids"), F.lit(""))
    )
    if min_df > 1:
        idx = idx.filter(F.col("df") >= min_df)
    return idx


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information for adjacent word pairs across the
    corpus: PMI(x,y) = ln(c_xy * T / (c_x * c_y)) with T = total
    bigram tokens - the classic collocation detector ("new york"
    scores high, "of the" near zero). Returns (w1, w2, n_pair, pmi)
    for pairs with ``min_count`` occurrences.

    Shape: one (w1,w2) bigram-count shuffle (partial-combined);
    unigram totals re-aggregate the collapsed COUNTS table (never the
    corpus); the two unigram joins hit a vocabulary-sized side that
    AQE broadcasts. Same cost skeleton as the bigram LM trainer."""
    pairs = doc_bigrams(df, id_col, text_col)
    c_xy = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    c_x = c_xy.groupBy("w1").agg(F.sum("n_pair").alias("n_left"))
    c_y = c_xy.groupBy("w2").agg(F.sum("n_pair").alias("n_right"))
    total = c_xy.agg(F.sum("n_pair").alias("n_total"))
    return (
        c_xy.filter(F.col("n_pair") >= min_count)
        .join(c_x, "w1")
        .join(c_y, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.log(
                F.col("n_pair").cast("double")
                * F.col("n_total").cast("double")
                / (
                    F.col("n_left").cast("double")
                    * F.col("n_right").cast("double")
                )
            ).alias("pmi"),
        )
    )


def mine_basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Market-basket pair mining: support / confidence / lift for item
    pairs co-occurring in a basket (order, session, cart). Returns
    ``(a, b, ab, support, confidence, lift)`` with a < b; every metric
    is one exact IEEE division over bigint counts (n*ab and ca*cb stay
    integral, so lift replays bit-for-bit in a SQL oracle).

    Per-basket pair mass is QUADRATIC in basket size - one pathological
    10k-item basket emits ~50M pairs from a single key. ``max_basket_size``
    caps that class (the ``max_doc_freq`` analogue the dedup family
    uses for stop-shingles): oversized baskets are dropped UP FRONT,
    so every downstream count - basket total, item supports, pair
    co-counts - sees exactly the kept-basket input, as if the caller
    had pre-filtered. The metrics stay mutually consistent and the cap
    is one HAVING clause in an oracle replay. ``min_support`` prunes
    pair groups BEFORE the metric joins (the knob to raise on
    duplicate-heavy corpora where support mass grows with replication).

    Scale shape - TWO physical strategies, picked by the cap, because
    the quadratic mass concentrates differently in each:

    - WITH a cap: ONE basket-keyed shuffle, no self-join. Baskets
      collapse to sorted DISTINCT item arrays (collect_set dedups
      membership), the size guard is an in-row filter, and the a<b
      pairs explode IN-ROW from the sorted array (upper-triangle via
      indexed transform+slice - pure Catalyst). The cap bounds the
      per-row explosion at cap^2/2 structs, so no task ever holds a
      mega-basket's pair mass as one array value (measured: 2.2x
      faster than the self-join shape on TPC-H, flat under a 10k-item
      adversarial order).
    - WITHOUT a cap: the bucketed self-join on the basket key. In-row
      explosion would materialize an UNBOUNDED flattened pair array
      in a single task (measured 5x worse than the join on a 10k-item
      basket); the join streams the same mass through the shuffle
      machinery instead, which degrades gradually rather than OOMing.

    Pair counts shuffle once on the (a, b) key, item supports
    re-aggregate collapsed membership (never the raw feed), and the
    vocabulary-sized support tables broadcast back onto the
    min_support-pruned pair groups."""
    from pyspark import StorageLevel

    b = F.col(basket_col)
    i = F.col(item_col)
    if max_basket_size is not None:
        # persisted DISK_ONLY (the multi-consumer stage pattern, same
        # as the dedup shingle stage): the basket-array aggregate
        # feeds THREE consumers - the basket total, the item
        # supports, and the pair explosion - each of which would
        # otherwise re-run the fact-table aggregate
        baskets = (
            df.select(b.alias("_basket"), i.alias("_item"))
            .groupBy("_basket")
            .agg(F.sort_array(F.collect_set("_item")).alias("_items"))
            .filter(F.size("_items") <= int(max_basket_size))
            # lazy return -> no in-function release point; repeated
            # library calls release via spark.catalog.clearCache()
            .persist(StorageLevel.DISK_ONLY)
        )
        n_baskets = baskets.select(F.count(F.lit(1)).alias("n"))
        member = baskets.select(F.explode("_items").alias("_item"))
        item = member.groupBy("_item").agg(F.count(F.lit(1)).alias("c"))
        # upper-triangle pair structs from the sorted array: element
        # x at 0-based index ix pairs with every LATER element (slice
        # is 1-based, so start ix+2); sorted input makes a < b by
        # construction
        arr = F.col("_items")
        pair_structs = F.flatten(
            F.transform(
                arr,
                lambda x, ix: F.transform(
                    F.slice(arr, ix + F.lit(2), F.size(arr)),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        raw_pairs = baskets.select(
            F.explode(pair_structs).alias("_p")
        ).select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
    else:
        op = (
            df.select(b.alias("_basket"), i.alias("_item"))
            .distinct()
            # same release contract as the capped branch above
            .persist(StorageLevel.DISK_ONLY)
        )
        n_baskets = op.select(F.countDistinct("_basket").alias("n"))
        item = op.groupBy("_item").agg(F.count(F.lit(1)).alias("c"))
        x = op.select("_basket", F.col("_item").alias("a"))
        y = op.select("_basket", F.col("_item").alias("b"))
        raw_pairs = x.join(y, "_basket").filter(F.col("a") < F.col("b"))
    pair = (
        raw_pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("ab"))
        .filter(F.col("ab") >= int(min_support))
    )
    ia = item.select(F.col("_item").alias("a"), F.col("c").alias("ca"))
    ib = item.select(F.col("_item").alias("b"), F.col("c").alias("cb"))
    return (
        # per-item supports scale with the item domain (part keys) -
        # unhinted: AQE broadcasts while genuinely small, a hard hint
        # would crash at the 8 GB ceiling on a 100x catalog
        pair.join(ia, "a")
        .join(ib, "b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "a",
            "b",
            "ab",
            (F.col("ab").cast("double") / F.col("n").cast("double")).alias(
                "support"
            ),
            (F.col("ab").cast("double") / F.col("ca").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("n") * F.col("ab")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double")
            ).alias("lift"),
        )
    )
