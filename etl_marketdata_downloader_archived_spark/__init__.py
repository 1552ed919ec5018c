"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline (SavvyPlus/etl-marketdata-downloader-Archived).

Everything here is built on the public Apache Spark / PySpark API.
The reference (read-only at /root/reference) is a serverless AWS ETL
pipeline whose relational query surface is delegated to Athena; this
engine internalizes both the dataflow operators (harvest -> download ->
land) and the relational SQL surface as Spark DataFrame / SQL / Structured
Streaming plans, and adds LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession builder (AQE on, Arrow on, UTC, sane shuffle)
- ``schemas``    explicit StructTypes - never schema inference on hot paths
- ``io``         table loaders / partitioned writers
- ``functions``  scalar helper library (glob->regex, templates, urls, text)
- ``operators``  composed operators (as-of join, dedup, similarity, text)
- ``plans``      end-to-end query plans (harvester, downloader, relational battery)
- ``sources``    catalog + pluggable fetch transports
- ``streaming``  structured-streaming pipelines (file-arrival, windows, dedup)
"""

__version__ = "0.1.0"
