"""Custom Python DataSource: directory listings as DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.functions.globs import glob_match
from etl_marketdata_downloader_archived_spark.sources.listing_datasource import register


def test_listing_datasource_reads_and_filters(spark, tmp_path) -> None:
    d1 = tmp_path / "feeds_a"
    d2 = tmp_path / "feeds_b"
    d1.mkdir()
    d2.mkdir()
    (d1 / "prices_202406.csv").write_text("x" * 10)
    (d1 / "readme.txt").write_text("y")
    (d2 / "rates_202406.csv").write_text("z" * 3)

    register(spark)
    df = spark.read.format("dir_listing").load(f"{d1},{d2}")
    assert df.count() == 3
    assert dict(df.dtypes)["modified_ts"] == "timestamp"

    matched = df.filter(glob_match("name", "*_202406.csv"))
    rows = {(r.name, r.size_bytes) for r in matched.collect()}
    assert rows == {("prices_202406.csv", 10), ("rates_202406.csv", 3)}

    # one input partition per directory (executor fan-out unit)
    assert df.rdd.getNumPartitions() == 2

    # typed projection prunes without string re-parsing
    big = df.filter(F.col("size_bytes") > 5).select("dir", "name").collect()
    assert [r.name for r in big] == ["prices_202406.csv"]
