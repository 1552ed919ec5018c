"""Queries registered BEYOND the driver's 50-certified-slot window.

The driver's correctness run certifies the first 50 registered queries
(SURVEY.md section 2A battery-packing note). Anything here still runs
under ``tools/parity.py`` locally and keeps its pytest coverage - it
just holds no driver certificate, which is why only the weakest driver
signals live here (rows-only checks over deterministic stubs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..operators.multimodal import text_to_assets
from .registry import q


@q("multimodal_decode")  # stub decode (mapInPandas plumbing) -> rows-only
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage over binary assets (deterministic
    fake codec; real codec libs absent in this environment). Plumbing
    (schema, batching, partitioning) is real and pytest-verified in
    tests/test_operators.py; the certified multimodal evidence is
    multimodal_meta (oracle-checked)."""
    from ..operators.multimodal import decode_assets

    d = load_table(spark, sf_dir, "documents")
    return decode_assets(text_to_assets(d, "doc_id", "text"), fake=True)
