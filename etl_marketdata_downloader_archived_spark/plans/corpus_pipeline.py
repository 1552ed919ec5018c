"""The composed end-to-end training-corpus pipeline.

Chains every corpus-prep stage this engine provides, in the order a
real 100 TB run executes them (cheapest narrowing first, priciest
stages on the smallest surviving row set):

1. quality/language gates + benchmark decontamination + exact-dedup
   (operators.text.clean_corpus - narrow maps, broadcast decontam,
   one fingerprint shuffle)
2. near-duplicate removal: MinHash+LSH candidates -> exact Jaccard
   verify -> connected components -> min-id representative
   (operators.dedup - bucketed, never all-pairs)
3. source re-mixing toward a target composition
   (operators.text.mix_rates + weighted_stratum_sample - one
   stratum-cardinality collect, then a broadcast join)
4. deterministic train/val/test split (operators.text.hash_split)
5. sequence packing of the train split into fixed-token examples
   (operators.packing.pack_sequences - per-partition greedy)

Generalizes the reference's single-stage 'fetch and land' dataflow
(data-downloader/data_downloader.py) to the corpus-preparation chain
a downstream model-training consumer needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X
from ..operators.packing import pack_sequences


def prepare_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    benchmark: DataFrame | None = None,
    target_mix: dict[str, float] | None = None,
    split_fractions: dict[str, float] | None = None,
    max_tokens: int = 2048,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns the materializable artifacts:

    - ``corpus``: surviving documents with quality signals and a
      ``split`` column
    - ``packs``: fixed-token-budget training examples for the train
      split (join back to ``corpus`` texts via
      operators.packing.write_packed_shards to emit shards)

    Laziness note: stages 1-2 and 4-5 stay lazy; stage 3 (re-mixing)
    needs the per-source counts, which is ONE collect of
    stratum-cardinality rows - the same driver-side shape as the
    connected-components convergence probe.
    """
    split_fractions = split_fractions or {"train": 0.98, "val": 0.01, "test": 0.01}

    cleaned = X.clean_corpus(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        languages=languages,
        benchmark=benchmark,
    )

    pairs = D.minhash_dedup_pairs(
        cleaned, id_col, text_col, jaccard_threshold=jaccard_threshold
    )
    deduped = D.dedup_keep_representatives(cleaned, pairs, id_col)

    if target_mix is not None:
        counts = {
            r["s"]: r["n"]
            for r in deduped.groupBy(F.col(source_col).alias("s"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rates = X.mix_rates(counts, target_mix)
        deduped = X.weighted_stratum_sample(
            deduped, id_col, source_col, rates, seed=seed
        )

    corpus = deduped.withColumn(
        "split", X.hash_split(id_col, split_fractions, seed=seed)
    )
    train = corpus.filter(F.col("split") == "train")
    packs = pack_sequences(train, id_col, max_tokens=max_tokens, text_col=text_col)
    return {"corpus": corpus, "packs": packs}


def build_retrieval_index(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
    embed_dim: int = 64,
    ivf_k: int = 16,
    seed: int = 7,
) -> None:
    """The retrieval side of the corpus: overlapping context-window
    chunks -> feature-hash embeddings -> IVF index partitioned by
    cluster. A query then probes nprobe/k of the files
    (operators.similarity.ivf_search_indexed; PartitionFilters do the
    data skipping). Chunk ids pack (doc_id, chunk_idx) reversibly so a
    hit maps back to its source span: chunk_id = doc_id * 2^20 +
    chunk_idx (2^20 chunks/doc is ~270M tokens - beyond any document).
    """
    from ..operators.similarity import hash_embed, ivf_build_index
    from ..operators.text import chunk_text

    chunks = chunk_text(
        docs, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    ).select(
        (F.col(id_col) * (1 << 20) + F.col("chunk_idx")).alias("chunk_id"),
        "chunk",
    )
    emb = hash_embed(chunks, "chunk_id", "chunk", dim=embed_dim)
    ivf_build_index(emb, index_path, k=ivf_k, id_col="chunk_id", seed=seed)
