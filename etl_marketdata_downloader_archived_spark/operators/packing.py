"""Sequence packing: bin documents into fixed-token-budget training
examples (the step between corpus prep and tokenized shards).

Packing is inherently sequential, so the distributed formulation is
the one production pipelines use: pack GREEDILY WITHIN each partition
(first-fit over the partition's arrival order) and accept the bounded
per-partition tail waste - at most one underfull pack per partition,
which is noise when partitions hold thousands of documents. No global
coordination, no shuffle beyond whatever partitioning the caller
chose (e.g. repartition by a shuffle-salt for even pack sizes, or by
source to keep packs homogeneous).

The Python stage is an Arrow-batched ``mapInPandas`` that only sees
(id, n_tokens) - the text itself never enters Python; a downstream
join attaches payloads to packs when shards are written.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count_ws

PACK_SCHEMA = (
    "pack_id long, doc_ids array<long>, n_docs int, total_tokens long, overflow boolean"
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    max_tokens: int,
    text_col: str | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy first-fit packing of documents into packs of at most
    ``max_tokens`` tokens. Pass either ``text_col`` (tokens counted
    with the whitespace baseline, JVM-side) or ``tokens_col`` (a
    precomputed count, e.g. from a real tokenizer pass).

    Documents larger than ``max_tokens`` become single-doc packs with
    ``overflow=true`` (the caller decides whether to truncate or
    drop). Pack ids are globally unique and deterministic for a fixed
    partitioning: ``partition_id * 2^40 + local_index``.

    Invariants (tested): every doc lands in exactly one pack; pack
    totals never exceed max_tokens unless overflow; token mass is
    conserved.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if (text_col is None) == (tokens_col is None):
        raise ValueError("pass exactly one of text_col / tokens_col")
    counted = df.select(
        F.col(id_col).cast("long").alias("_id"),
        (
            F.col(tokens_col).cast("long")
            if tokens_col
            else token_count_ws(text_col).cast("long")
        ).alias("_n"),
    )

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        base = TaskContext.get().partitionId() << 40
        done = first_fit_pack(
            (
                (int(doc), int(n))
                for pdf in batches
                for doc, n in zip(pdf["_id"].to_numpy(), pdf["_n"].to_numpy())
            ),
            max_tokens,
        )
        if done:
            yield pd.DataFrame(
                {
                    "pack_id": [base + lb for lb, _, _, _ in done],
                    "doc_ids": [ids for _, ids, _, _ in done],
                    "n_docs": [len(ids) for _, ids, _, _ in done],
                    "total_tokens": [used for _, _, used, _ in done],
                    "overflow": [ov for _, _, _, ov in done],
                }
            )

    return counted.mapInPandas(_pack, schema=PACK_SCHEMA)


def first_fit_pack(
    items, max_tokens: int, max_open_bins: int = 64
) -> list[tuple[int, list[int], int, bool]]:
    """The driver-free packing core (property-tested without Spark):
    first-fit over arrival order with a bounded open-bin set - when
    more than ``max_open_bins`` bins are open the fullest closes, so
    memory stays O(max_open_bins) however long the partition is and
    behavior is deterministic for a fixed item order.

    Returns (local_pack_id, doc_ids, total_tokens, overflow) tuples;
    oversize docs become flagged singleton packs."""
    open_bins: list[tuple[int, list[int], int]] = []  # (pack_local, ids, used)
    done: list[tuple[int, list[int], int, bool]] = []
    next_local = 0

    def close(i: int) -> None:
        lb, ids, used = open_bins.pop(i)
        done.append((lb, ids, used, False))

    for doc, n in items:
        if n > max_tokens:
            done.append((next_local, [doc], n, True))
            next_local += 1
            continue
        for i, (lb, ids, used) in enumerate(open_bins):
            if used + n <= max_tokens:
                ids.append(doc)
                open_bins[i] = (lb, ids, used + n)
                break
        else:
            open_bins.append((next_local, [doc], n))
            next_local += 1
            if len(open_bins) > max_open_bins:
                fullest = max(range(len(open_bins)), key=lambda j: open_bins[j][2])
                close(fullest)
    while open_bins:
        close(0)
    return done


def write_packed_shards(
    df: DataFrame,
    packs: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    num_shards: int = 64,
) -> DataFrame:
    """Materialize packs as sharded training examples: explode pack
    membership, join the text payloads back by id (this is the ONLY
    point where text meets the packing pipeline - one shuffle keyed on
    doc id), reassemble each pack's texts in pack order, and write
    parquet partitioned by ``shard = pack_id % num_shards`` so a
    trainer can open one shard directory per data-loader worker.

    Returns the packed-example DataFrame as written (pack_id, shard,
    texts, n_docs, total_tokens)."""
    membership = packs.select(
        "pack_id",
        "total_tokens",
        F.posexplode("doc_ids").alias("_ord", "_doc"),
    )
    payloads = df.select(
        F.col(id_col).cast("long").alias("_doc"), F.col(text_col).alias("_text")
    )
    assembled = (
        membership.join(payloads, "_doc")
        .groupBy("pack_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_ord"), F.col("_text")))
                ),
                lambda s: s["_text"],
            ).alias("texts"),
            F.max("total_tokens").alias("total_tokens"),
        )
        .select(
            "pack_id",
            F.pmod("pack_id", F.lit(num_shards)).cast("int").alias("shard"),
            "texts",
            F.size("texts").alias("n_docs"),
            "total_tokens",
        )
    )
    assembled.write.mode("overwrite").partitionBy("shard").parquet(path)
    return assembled
