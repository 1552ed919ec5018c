"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) for
directory/FTP listings.

SURVEY.md section 4.2 custom item 1: the reference consumes FTP LIST
output as text and re-parses it per task
(data-downloader/data_downloader.py:152-155); a listing *datasource*
makes the listing a first-class DataFrame instead:

    spark.dataSource.register(ListingDataSource)
    spark.read.format("dir_listing").load("/data/feeds")  \
         .filter(glob_match("name", "*.csv"))

One input partition per directory, so listing N directories fans out
across executors; rows carry (dir, name, size_bytes, modified_ts) with
an explicit schema - no string re-parsing downstream, and filters on
the typed columns prune normally.

Local filesystem paths back the implementation (the environment has no
FTP egress); the partition/reader structure is transport-agnostic -
an FTP transport drops into ``_list_dir`` unchanged.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

LISTING_SCHEMA = (
    "dir string, name string, size_bytes long, modified_ts timestamp"
)


def _list_dir(d: str):
    for name in sorted(os.listdir(d)):
        full = os.path.join(d, name)
        if os.path.isfile(full):
            st = os.stat(full)
            yield (
                d,
                name,
                st.st_size,
                datetime.fromtimestamp(st.st_mtime, tz=timezone.utc),
            )


class _DirPartition(InputPartition):
    def __init__(self, directory: str) -> None:
        self.directory = directory


class ListingReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        paths = options.get("path") or options.get("paths") or ""
        self._dirs = [p for p in paths.split(",") if p]

    def partitions(self):  # one partition per directory -> executor fan-out
        return [_DirPartition(d) for d in self._dirs]

    def read(self, partition: _DirPartition):
        yield from _list_dir(partition.directory)


class ListingDataSource(DataSource):
    """``spark.read.format("dir_listing").load(dir_or_csv_of_dirs)``."""

    @classmethod
    def name(cls) -> str:
        return "dir_listing"

    def schema(self) -> str:
        return LISTING_SCHEMA

    def reader(self, schema: StructType) -> ListingReader:
        return ListingReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ListingDataSource)
