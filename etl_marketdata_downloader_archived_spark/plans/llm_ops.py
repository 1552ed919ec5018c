"""North-star LLM-data-pipeline operator battery (SURVEY.md section 2C).

Deduplication (exact / fingerprint / n-gram Jaccard / MinHash LSH /
SimHash), similarity search (brute-force cosine top-k, bucketed
near-dup pairs, IVF probe), text analysis (lang-id, quality, token
counts, fingerprinting), and binary/multimodal metadata - over the
driver ``documents`` and ``embeddings`` tables.

Oracle notes: DuckDB's list_cosine_similarity computes in float32, so
vector oracles spell out the double-cast comprehension; cosine outputs
round to 6 decimals on both sides, and ordering/threshold predicates
compare the ROUNDED value so top-k membership can't flip on sub-6dp
engine noise. Hash-seeded ops (MinHash, SimHash) have no cross-engine
twin -> rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import load_table
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as X
from ..operators.multimodal import text_to_assets
from .registry import q

# --------------------------------------------------------------- dedup


@q(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           sha256(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
               '\\s+', ' ', 'g')))                          AS fp,
           min(doc_id) OVER (PARTITION BY sha256(text))     AS keep_id,
           count(*)    OVER (PARTITION BY sha256(text))     AS n_dupes
    FROM documents
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup + normalized fingerprint in one pass: per-doc
    case/punct/whitespace-stable fingerprint (the rolling dedup key)
    plus the exact-hash group's representative (min id) and duplicate
    count via a window over sha256(text). At scale both hashes are
    computed in the scan projection; only (hash, id) shuffles."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.sha2(F.col("text"), 256))
    return d.select(
        "doc_id",
        X.fingerprint("text").alias("fp"),
        F.min("doc_id").over(w).alias("keep_id"),
        F.count(F.lit(1)).over(w).alias("n_dupes"),
    )


@q(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct([
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in generate_series(1, greatest(len(w) - 2, 0))
               ]) AS shingles
        FROM (SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS w
              FROM documents)
    )
    SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1),
                 6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1) > 0.01
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs within a source bucket."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", "source", n=3, threshold=0.01)
    return pairs.select("source", "id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# The two signature-seeded near-dup/ANN panels (dedup_near_panel,
# sim_ann_panel) register in plans/tail.py: they are rows-only by
# nature (seeded hash families have no cross-engine oracle), so they
# cede their certified slots to the oracle-checked event-analytics
# battery (plans/events.py).


# ---------------------------------------------------------- similarity

_DOT = """list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                    for i in generate_series(1, len({a}))])"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


_L2_SQL = """sqrt(list_sum([CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)
                            for i in generate_series(1, len({v}))]))"""


@q(
    "sim_topk",
    oracle=f"""
    WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           round({_cos_sql('embedding', 'q')}, 6) AS cos_sim,
           round({_L2_SQL.format(v='embedding')}, 6) AS l2
    FROM embeddings, qv
    WHERE vec_id <> 0
    ORDER BY round({_cos_sql('embedding', 'q')}, 6) DESC, vec_id
    LIMIT 10
    """,
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 query vector, plus the
    L2 norm of each hit (the vector-math primitive). Both engines order
    by the 6dp-ROUNDED cosine with a vec_id tie-break, so membership at
    the k-cutoff can't flip on sub-rounding float noise. Executes as
    scan -> narrow map -> TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    scored = e.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.round(S.cosine(F.col("embedding"), qlit), 6).alias("cos_sim"),
        F.round(S.l2_norm(F.col("embedding")), 6).alias("l2"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


@q(
    "sim_pairs_bucketed",
    oracle=f"""
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.3
    """,
)
def sim_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.3) within a label bucket -
    the LSH/IVF-bucketed scale path for embedding dedup. Runs on the
    matmul kernel (one BLAS V@V.T per bucket via applyInPandas, ~10x
    the per-pair expression-tree dot product); the threshold compares
    the 6dp-rounded cosine on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    # kernel prefilter sits just under the rounded cutoff so the exact
    # 6dp-rounded comparison below owns the boundary on both engines
    pairs = S.cosine_pairs_matmul(e, "label", 0.2999, id_col="vec_id")
    return (
        pairs.select(
            F.col("bucket").cast("int").alias("label"),
            "id_a",
            "id_b",
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


# -------------------------------------------------------- text analysis


@q(
    "text_analysis",
    oracle="""
    WITH m AS (
        SELECT doc_id, text,
               regexp_split_to_array(text, '\\s+') AS toks,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE) AS n_tok,
               CAST(list_sum([length(t) for t in regexp_split_to_array(text, '\\s+')]) AS DOUBLE)
                   / greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS mtl,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS pr
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT)  AS n_tokens,
           mtl                    AS mean_tok_len,
           pr                     AS punct_ratio,
           len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_bpe_ish,
           CASE WHEN contains(concat(' ', lower(text), ' '), ' the ') THEN 'en'
                WHEN contains(concat(' ', lower(text), ' '), ' der ') THEN 'de'
                WHEN contains(concat(' ', lower(text), ' '), ' le ')  THEN 'fr'
                WHEN contains(concat(' ', lower(text), ' '), ' el ')  THEN 'es'
                WHEN contains(concat(' ', lower(text), ' '), '的')    THEN 'zh'
                ELSE 'unknown' END AS lang_guess,
           round((least(n_tok / 64.0, 1.0)
                  + (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                  + (1.0 - least(pr * 4.0, 1.0))) / 3.0, 6) AS quality,
           round(CAST(len([t for t in regexp_split_to_array(lower(text), '\\s+')
                           if list_contains(['the','a','an','and','or','of','to','in','is','it'], t)])
                      AS DOUBLE)
                 / greatest(len(regexp_split_to_array(text, '\\s+')), 1), 6) AS sw_ratio,
           round(CAST(len(list_distinct(toks)) AS DOUBLE)
                 / greatest(len(toks), 1), 6) AS ttr,
           round(CAST(len([toks[i] || ' ' || toks[i+1]
                           for i in generate_series(1, len(toks) - 1)])
                      - len(list_distinct([toks[i] || ' ' || toks[i+1]
                                           for i in generate_series(1, len(toks) - 1)]))
                      AS DOUBLE)
                 / greatest(len(toks) - 1, 1), 6) AS dup_bigram_frac,
           round(CAST((SELECT max(c) FROM (SELECT count(*) AS c
                                           FROM unnest(m.toks) AS u(t) GROUP BY t))
                      AS DOUBLE)
                 / greatest(len(toks), 1), 6) AS top_token_frac
    FROM m
    """,
)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole per-document text-quality panel in ONE scan: token
    counts (whitespace + BPE-ish regex), mean token length, punctuation
    ratio, n-gram-heuristic language ID, composite quality score,
    stopword density, and the Gopher-style repetition/diversity trio
    (type-token ratio, duplicate-bigram fraction, most-common-token
    fraction). All pure Catalyst expressions - no Python in the path,
    one projection, zero shuffles; the repetition stats fold over the
    in-row token array instead of explode+groupBy, so they stay narrow
    at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE through a dedicated projection and pass the array
    # to every token-based signal: inlining tokens(text) into each
    # signal re-ran the regex split 26x per row (executed-plan count);
    # CollapseProject keeps the multi-referenced array in its own step
    t = F.col("_t")
    return d.select("doc_id", "text", X.tokens("text").alias("_t")).select(
        "doc_id",
        X.token_count_ws(toks=t).alias("n_tokens"),
        X.mean_token_len(toks=t).alias("mean_tok_len"),
        X.punct_ratio("text").alias("punct_ratio"),
        X.token_count_bpe_ish("text").alias("n_bpe_ish"),
        X.lang_id("text").alias("lang_guess"),
        F.round(X.quality_score("text", toks=t), 6).alias("quality"),
        F.round(X.stopword_ratio(toks=t), 6).alias("sw_ratio"),
        F.round(X.type_token_ratio(toks=t), 6).alias("ttr"),
        F.round(X.dup_ngram_frac(toks=t), 6).alias("dup_bigram_frac"),
        F.round(X.top_token_frac(toks=t), 6).alias("top_token_frac"),
    )


@q(
    "corpus_clean",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CASE WHEN contains(concat(' ', lower(text), ' '), ' the ') THEN 'en'
                    WHEN contains(concat(' ', lower(text), ' '), ' der ') THEN 'de'
                    WHEN contains(concat(' ', lower(text), ' '), ' le ')  THEN 'fr'
                    WHEN contains(concat(' ', lower(text), ' '), ' el ')  THEN 'es'
                    WHEN contains(concat(' ', lower(text), ' '), '的')    THEN 'zh'
                    ELSE 'unknown' END AS lang_guess,
               round((least(CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE) / 64.0, 1.0)
                      + (CASE WHEN CAST(list_sum([length(t) for t in regexp_split_to_array(text, '\\s+')]) AS DOUBLE)
                                   / greatest(len(regexp_split_to_array(text, '\\s+')), 1) >= 3.0
                               AND CAST(list_sum([length(t) for t in regexp_split_to_array(text, '\\s+')]) AS DOUBLE)
                                   / greatest(len(regexp_split_to_array(text, '\\s+')), 1) <= 10.0
                              THEN 1.0 ELSE 0.5 END)
                      + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                                     / greatest(length(text), 1) * 4.0, 1.0))) / 3.0, 6) AS quality,
               round(CAST(len([t for t in regexp_split_to_array(lower(text), '\\s+')
                               if list_contains(['the','a','an','and','or','of','to','in','is','it'], t)])
                          AS DOUBLE)
                     / greatest(len(regexp_split_to_array(text, '\\s+')), 1), 6) AS sw_ratio,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                   '\\s+', ' ', 'g'))) AS fp,
               list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]
                              for i in generate_series(1, len(toks) - 4)]) AS grams
        FROM (SELECT *, regexp_split_to_array(text, '\\s+') AS toks
              FROM documents WHERE source <> 'src0')
    ), bench AS (
        SELECT DISTINCT unnest(list_distinct(
            [toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]
             for i in generate_series(1, len(toks) - 4)])) AS bg
        FROM (SELECT regexp_split_to_array(text, '\\s+') AS toks
              FROM documents WHERE source = 'src0')
    ), gated AS (
        SELECT * FROM m
        WHERE lang_guess = 'en' AND quality >= 0.5 AND sw_ratio <= 0.9
    ), hits AS (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(grams) AS g FROM gated)
        WHERE g IN (SELECT bg FROM bench)
        GROUP BY doc_id
    ), dec AS (
        SELECT gated.*,
               round(CAST(coalesce(c, 0) AS DOUBLE)
                     / greatest(len(grams), 1), 6) AS bench_overlap
        FROM gated LEFT JOIN hits USING (doc_id)
    )
    SELECT doc_id, lang_guess, quality, sw_ratio, fp, bench_overlap
    FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep
          FROM dec WHERE bench_overlap < 0.5)
    WHERE doc_id = keep
    """,
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pre-filter (operators.text.clean_corpus):
    language gate + quality gate + stopword sanity + benchmark
    decontamination (5-gram overlap vs the held-out 'src0' eval source,
    broadcast-joined) + one representative per normalized fingerprint.
    Narrow maps plus two shuffles (decontam hit-count, per-fingerprint
    min). This is the pipeline a 100 TB corpus actually runs before
    tokenization; thresholds compare 6dp-rounded scores so the gates
    are engine-stable at boundaries."""
    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    bench = d.filter(F.col("source") == "src0")
    out = X.clean_corpus(
        train,
        min_quality=0.5,
        languages=("en",),
        max_stopword_ratio=0.9,
        benchmark=bench,
        max_benchmark_overlap=0.5,
    )
    return out.select(
        "doc_id",
        "lang_guess",
        F.round("quality", 6).alias("quality"),
        F.round("sw_ratio", 6).alias("sw_ratio"),
        "fp",
        F.round("bench_overlap", 6).alias("bench_overlap"),
    )


@q(
    "word_topk",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency top-k (vocabulary head)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# ----------------------------------------------------------- multimodal


@q(
    "multimodal_meta",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR)       AS asset_id,
           'blob'                        AS modality,
           octet_length(encode(text))    AS size_bytes,
           sha256(text)                  AS content_hash
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset wrapping: payload bytes + typed metadata (the
    multimodal column pattern; decode stage stubbed in
    operators.multimodal.decode_assets)."""
    d = load_table(spark, sf_dir, "documents")
    return text_to_assets(d, "doc_id", "text").select(
        "asset_id", "modality", "size_bytes", "content_hash"
    )


# multimodal_decode registers past the window (plans/tail.py): a real
# codec would have no oracle, so the stub decode keeps its overflow
# slot even now that its fake fields are DuckDB-recomputable.
