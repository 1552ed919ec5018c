"""Multimodal (binary) column operators.

Image/audio/video payloads are opaque ``BinaryType`` columns with a
typed metadata struct (schemas.ASSET). The Spark-side plumbing -
schema, partitioning, Arrow batch shape, UDF signatures - is real and
tested; the codec step is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode so the
pipeline shape can be exercised end-to-end.

Extends the reference's raw-bytes landing (reference:
data-downloader/data_downloader.py:69-70 stores fetched bytes with no
metadata at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id string, modality string, width int, height int, n_bytes long, checksum string"
)


def text_to_assets(df: DataFrame, id_col: str, text_col: str, modality: str = "blob") -> DataFrame:
    """Wrap a string column as a binary asset (utf-8 bytes) with hash +
    size metadata - the fixture path for exercising binary plumbing."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("content"),
        F.sha2(payload, 256).alias("content_hash"),
        F.octet_length(payload).cast("long").alias("size_bytes"),
    )


def decode_assets(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary assets to (dimensions, checksum) features via
    mapInPandas - Arrow-batched, one pandas frame per partition chunk.

    Real decode requires an image/audio codec library (not present in
    this environment) -> NotImplementedError. ``fake=True`` derives
    deterministic pseudo-dimensions so tests can validate the batch
    shape, schema, and partition behavior. The fake fields are chosen
    to be recomputable by an independent SQL engine from the same
    payload (byte length, two arithmetic functions of it, sha256 hex)
    so the whole decode pipeline is differentially checkable even
    though the codec is a stub (plans/tail.py multimodal_decode).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "binary codec libraries are not available in this environment; "
                    "pass fake=True for the deterministic stub decode"
                )
            # column-at-a-time over the Arrow batch (the shape a real
            # codec binding should keep: hand the whole batch to the
            # vectorized decoder, never per-row Python)
            payloads = pdf["content"].map(bytes)
            n_bytes = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "width": (n_bytes % 4096).astype("int32"),
                    "height": ((n_bytes * 2654435761) % 4096).astype("int32"),
                    "n_bytes": n_bytes,
                    "checksum": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explode per-asset frame indices
    (real decoder would emit frames; the stub emits indices). Shows the
    1->N explode shape with bounded memory per batch."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.least(F.col("size_bytes") / 100, F.lit(50)).cast("int"), F.lit(every_n))
        ).alias("frame_idx"),
    )
