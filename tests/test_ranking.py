"""Known-answer tests for operators.ranking (bigram LM + BM25).

The differential oracle (tools/parity.py lm_perplexity / bm25_topk)
checks engine-vs-DuckDB equivalence; these tests pin the SEMANTICS to
hand-computed numbers on a corpus small enough to verify on paper.
"""

from __future__ import annotations

import math

import pytest

from etl_marketdata_downloader_archived_spark.operators import ranking as R


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "dog runs fast dog runs"),
        (4, "x"),  # single token -> no bigrams -> drops out of LM
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_bigrams_counts(tiny):
    bg = R.doc_bigrams(tiny, "doc_id", "text").collect()
    # doc1: 5 bigrams, doc2: 2, doc3: 4, doc4: 0
    per = {}
    for r in bg:
        per[r.doc_id] = per.get(r.doc_id, 0) + 1
    assert per == {1: 5, 2: 2, 3: 4}
    assert (1, "the", "cat") in {(r.doc_id, r.w1, r.w2) for r in bg}


def test_lm_cross_entropy_hand_computed(tiny):
    # corpus bigram counts: (the,cat)=2 (cat,sat)=2 (sat,on)=1 (on,the)=1
    # (the,mat)=1 (dog,runs)=2 (runs,fast)=1 (fast,dog)=1
    # contexts: the=4? (the,cat)2+(the,mat)1 -> c1(the)=3; cat=2; sat=1;
    # on=1; dog=2; runs=1; fast=1.  V = 8 distinct tokens
    # (the,cat,sat,on,mat,dog,runs,fast,x) -> actually 9 with 'x'.
    out = {r.doc_id: (r.n_bigrams, r.xent) for r in
           R.lm_cross_entropy(tiny, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}  # doc4 has no bigrams
    v = 9
    # doc2: bigrams (the,cat): ln(3/(3+9)); (cat,sat): ln(3/(2+9))
    exp = -(math.log(3 / 12) + math.log(3 / 11)) / 2
    assert out[2] == (2, round(exp, 4))
    # repeated gibberish-free text scores lower than the rare-path doc
    assert out[3][1] != out[1][1]


def test_lm_heldout_model(tiny, spark):
    # score new docs against a model trained on `tiny`
    model = R.bigram_lm_counts(tiny, "doc_id", "text")
    new = spark.createDataFrame(
        [(10, "the cat sat")], "doc_id long, text string"
    )
    out = R.lm_cross_entropy(new, "doc_id", "text", counts=model).collect()
    # vocab comes from the SCORED frame per the function contract;
    # 3 distinct tokens here -> V=3
    exp = -(math.log(3 / (3 + 3)) + math.log(3 / (2 + 3))) / 2
    assert out[0].n_bigrams == 2 and out[0].xent == round(exp, 4)


def test_bm25_ranks_term_matches_first(spark):
    rows = [
        (1, "alpha beta alpha beta alpha"),  # heavy on alpha
        (2, "alpha gamma delta epsilon zeta eta theta"),  # one alpha, long
        (3, "beta beta beta"),  # no alpha
        (4, "iota kappa"),  # no query terms at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = R.bm25_topk(df, "doc_id", "text", ["alpha"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert 4 not in ids and 3 not in ids  # zero-score docs filtered
    assert ids[0] == 1  # higher tf, shorter doc -> ranks first
    assert out[0].score > out[1].score > 0


def test_bm25_multi_term_additivity(spark):
    rows = [(1, "p q"), (2, "p p"), (3, "q q"), (4, "r r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score for r in
           R.bm25_topk(df, "doc_id", "text", ["p", "q"], k=10).collect()}
    # doc1 matches both terms; with equal dl its score exceeds
    # single-term docs 2 and 3 (tf saturation: tf=2 < 2x tf=1 term hit)
    assert out[1] > out[2] == out[3]
    assert 4 not in out


def test_sentiment_score_hand_computed(spark):
    from pyspark.sql import functions as F

    from etl_marketdata_downloader_archived_spark.operators import text as X

    rows = [(1, "Great work love it"), (2, "terrible awful bug"),
            (3, "neutral words only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", F.round(X.sentiment_score("text"), 6).alias("s"),
    ).collect()}
    # (2 + 2) / 4 ; (-3 - 3 - 1) / 3 ; 0
    assert out == {1: 1.0, 2: round(-7 / 3, 6), 3: 0.0}


def test_mine_basket_pairs_hand_computed(spark):
    """Support/confidence/lift replay by hand on a 3-basket corpus,
    and min_support prunes singleton pairs."""
    from etl_marketdata_downloader_archived_spark.operators.ranking import (
        mine_basket_pairs,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (3, "a"),  # duplicate membership must not double-count
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["a"], r["b"]): r
        for r in mine_basket_pairs(
            df, "basket", "item", min_support=1
        ).collect()
    }
    # n=3 baskets; c(a)=3, c(b)=2, c(c)=2; ab(a,b)=2, ab(a,c)=2, ab(b,c)=1
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["ab"] == 2
    assert ab["support"] == 2 / 3
    assert ab["confidence"] == 2 / 3
    assert ab["lift"] == (3 * 2) / (3 * 2)
    bc = out[("b", "c")]
    assert bc["ab"] == 1 and bc["lift"] == (3 * 1) / (2 * 2)
    pruned = mine_basket_pairs(df, "basket", "item", min_support=2)
    assert {(r["a"], r["b"]) for r in pruned.collect()} == {
        ("a", "b"),
        ("a", "c"),
    }


def test_mine_basket_pairs_max_basket_size_accounting(spark):
    """The oversized-basket guard drops the mega-basket ENTIRELY: its
    pairs vanish and every denominator (basket total, item supports)
    matches running the operator on the pre-filtered input - the cap
    is equivalent to filtering, never a partial discount. A basket of
    exactly the cap size is kept."""
    from etl_marketdata_downloader_archived_spark.operators.ranking import (
        mine_basket_pairs,
    )

    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
             (3, "c")]
    mega = [(9, f"w{i}") for i in range(10)] + [(9, "a"), (9, "b")]
    df = spark.createDataFrame(small + mega, ["basket", "item"])

    capped = mine_basket_pairs(
        df, "basket", "item", min_support=1, max_basket_size=3
    )
    rows = {(r["a"], r["b"]): r for r in capped.collect()}
    # no pair touching the mega-basket's exclusive items survives
    assert not any(a.startswith("w") or b.startswith("w") for a, b in rows)
    # (a, b) counts only the 3 small baskets: n=3, c(a)=c(b)=3
    ab = rows[("a", "b")]
    assert ab["ab"] == 3 and ab["support"] == 1.0 and ab["lift"] == 3 / 3

    filtered = mine_basket_pairs(
        spark.createDataFrame(small, ["basket", "item"]),
        "basket",
        "item",
        min_support=1,
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, filtered.collect())
    )

    # boundary: size == cap is KEPT (basket 3 has exactly 3 items)
    kept3 = mine_basket_pairs(
        df, "basket", "item", min_support=1, max_basket_size=3
    ).filter("a = 'b' and b = 'c'")
    assert kept3.count() == 1


def test_mine_basket_pairs_randomized_vs_bruteforce(spark):
    """Seeded randomized differential: random small corpora (dup
    memberships, singleton/empty-ish baskets, caps that bite or
    don't, varying min_support) - operator output must equal a
    brute-force itertools replay in BOTH physical shapes (capped
    in-row explosion and uncapped self-join)."""
    import random
    from collections import Counter
    from itertools import combinations

    from etl_marketdata_downloader_archived_spark.operators.ranking import (
        mine_basket_pairs,
    )

    rng = random.Random(8)
    for trial in range(8):
        n_baskets = rng.randint(1, 12)
        rows = []
        contents: dict = {}
        for b in range(n_baskets):
            items = [
                f"i{rng.randint(0, 9)}" for _ in range(rng.randint(1, 8))
            ]
            contents[b] = sorted(set(items))
            for it in items:
                rows.append((b, it))
                if rng.random() < 0.3:
                    rows.append((b, it))  # duplicate membership rows
        cap = rng.choice([None, 2, 3, 5])
        sup = rng.randint(1, 3)

        kept = {
            b: its
            for b, its in contents.items()
            if cap is None or len(its) <= cap
        }
        pair_c: Counter = Counter()
        item_c: Counter = Counter()
        for its in kept.values():
            for it in its:
                item_c[it] += 1
            for a, bb in combinations(its, 2):
                pair_c[(a, bb)] += 1
        n = len(kept)
        want = {}
        for (a, bb), ab in pair_c.items():
            if ab < sup:
                continue
            want[(a, bb)] = (
                ab,
                ab / n,
                ab / item_c[a],
                (n * ab) / (item_c[a] * item_c[bb]),
            )

        got = {
            (r["a"], r["b"]): (
                r["ab"], r["support"], r["confidence"], r["lift"]
            )
            for r in mine_basket_pairs(
                spark.createDataFrame(rows, ["basket", "item"]),
                "basket",
                "item",
                min_support=sup,
                max_basket_size=cap,
            ).collect()
        }
        assert got == want, (trial, cap, sup)
