"""Explicit StructType schemas.

The reference never declares a schema anywhere - its catalog CSV is
parsed positionally (reference: data-harvester/data_harvester.py:26-28)
and task JSON is keyed by convention (data_harvester.py:37). At 100 TB
schema inference is an extra full scan, so this engine declares every
schema explicitly and reads with PERMISSIVE mode + _corrupt_record for
quarantine routing.

Two groups:
- reference-derived control schemas (sources catalog, task stream,
  manifest, quarantine)  [FIXTURES.md section A]
- driver oracle tables   [FIXTURES.md section B]
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-derived -------------------------------------------------

# Source catalog (reference: data-harvester/data_harvester.py:30-37 and
# data-downloader/data_downloader.py:44-46; positional CSV, cols 3/5/6
# present but never read).
SOURCES = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),          # date-templated
        T.StructField("interval", T.StringType()),
        T.StructField("col3", T.StringType()),
        T.StructField("active", T.IntegerType()),      # 0|1|2 (2 = broken)
        T.StructField("col5", T.StringType()),
        T.StructField("col6", T.StringType()),
        T.StructField("type", T.StringType()),         # 5-way dispatch key
        T.StructField("pattern", T.StringType()),      # glob or out-name
        T.StructField("utc_offset", T.IntegerType()),
    ]
)

# Task message (reference: data-harvester/data_harvester.py:37 produces
# {ID,URL,TYPE,PATTERN,UTC}; decoded at data-downloader/data_downloader.py:216).
TASK = T.StructType(
    [
        T.StructField("ID", T.StringType()),
        T.StructField("URL", T.StringType()),
        T.StructField("TYPE", T.StringType()),
        T.StructField("PATTERN", T.StringType()),
        T.StructField("UTC", T.StringType()),
    ]
)

# Landed-file manifest - fills the reference's four
# "#To do: check repeat file!!!" dedup TODOs
# (data-downloader/data_downloader.py:106,131,169,194).
MANIFEST = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("source_type", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

# Quarantine / DLQ - replaces SNS error messages
# (data-downloader/data_downloader.py:52-56) and the SQS redrive policy
# maxReceiveCount:5 (cloudformation/lambda.cfn.yaml:34-36).
QUARANTINE = T.StructType(
    [
        T.StructField("ID", T.StringType()),
        T.StructField("URL", T.StringType()),
        T.StructField("REASON", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("failed_at", T.TimestampType()),
    ]
)

# Multimodal asset column group: opaque payload + typed metadata
# (north-star extension; extends the reference's raw-bytes landing at
# data-downloader/data_downloader.py:69-70).
ASSET = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("modality", T.StringType()),     # image|audio|video|blob
        T.StructField("content", T.BinaryType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# --- driver oracle tables (FIXTURES.md section B) -----------------------

DRIVER_TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),     # JSON string
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
