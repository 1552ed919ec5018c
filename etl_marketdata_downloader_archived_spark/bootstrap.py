"""Engine bootstrap - the Spark restatement of reference entry point 3
(provisioning / event wiring; SURVEY.md section 3.3).

The reference's CFN custom resource creates the bucket, wires the
``s3:ObjectCreated`` trigger on prefix ``in/``, and creates the
``in/ processing/ done/`` staging folders
(market-data-downloader-create-bucket/market_data_downloader_create_bucket.py:54-107).
Here that becomes: create warehouse paths, register catalog views, and
(optionally) start the file-arrival stream on ``in/``.

Also carries the probe/teardown utilities of the three support lambdas:
existence probe (…create_bucket.py:12-31), staging-folder creation
(…create_folders.py:20-22), and prefix cleanup
(…clean_test_files.py:34-43).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .io import register_views

STAGING = ("in", "processing", "done")


def warehouse_exists(root: str) -> bool:
    """Existence probe (the reference classifies head_bucket 200/404;
    local FS has only the two states)."""
    return os.path.isdir(root)


def provision_warehouse(root: str) -> dict[str, str]:
    """Create the warehouse layout: staging dirs + lake/manifest/
    quarantine/checkpoint roots. Idempotent, like the reference's
    create-if-missing flow."""
    paths = {name: os.path.join(root, name) for name in STAGING}
    paths.update(
        {
            "lake": os.path.join(root, "lake"),
            "manifest": os.path.join(root, "manifest"),
            "quarantine": os.path.join(root, "quarantine"),
            "checkpoints": os.path.join(root, "checkpoints"),
        }
    )
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    return paths


def clean_staging(root: str) -> int:
    """Prefix scan + bulk delete of the staging areas - the
    clean-test-files lambda (…clean_test_files.py:34-43). Returns the
    number of entries removed."""
    n = 0
    for name in STAGING:
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        for entry in os.listdir(d):
            full = os.path.join(d, entry)
            if os.path.isdir(full):
                shutil.rmtree(full)
            else:
                os.remove(full)
            n += 1
    return n


def bootstrap(
    spark: SparkSession,
    root: str,
    sf_dir: str | None = None,
    start_stream: bool = False,
    allow_network: bool = False,
) -> dict[str, object]:
    """Bring the engine up: warehouse paths, registered views, and
    optionally the in/ file-arrival stream feeding the lake sink."""
    paths = provision_warehouse(root)
    if sf_dir is not None:
        register_views(spark, sf_dir)
    query: StreamingQuery | None = None
    if start_stream:
        from .streaming.file_source import file_task_stream, start_lake_sink

        stream = file_task_stream(spark, paths["in"])
        query = start_lake_sink(
            stream,
            paths["lake"],
            paths["manifest"],
            os.path.join(paths["checkpoints"], "downloader"),
            allow_network=allow_network,
        )
    return {"paths": paths, "query": query}
