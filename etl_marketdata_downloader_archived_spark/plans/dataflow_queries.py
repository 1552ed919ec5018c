"""Dataflow operator battery (SURVEY.md section 2A).

Each query re-expresses one STAGE of the reference's harvest / download
dataflow over the driver tables so it is DuckDB-oracle checkable; the
stages are packed the way the reference composes them (page -> links ->
resolve -> name; listing -> lines -> token -> glob), so one certified
query covers the whole chain it represents. The end-to-end pipelines
composing these operators live in ``plans.harvester`` /
``plans.downloader`` (exercised by pytest with synthetic catalogs;
side-effectful stages can't be oracle queries).

Reference citations are per-operator below; inputs are synthesized
deterministically from driver-table columns (the driver tables carry no
catalog/task data themselves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.globs import glob_match, glob_to_regex
from ..functions.templates import expand_template
from ..functions.urls import last_segment, last_ws_token, url_join
from ..io import load_table
from .registry import q

# A1 + A2 - catalog CSV scan + positional tokenize
# (data-harvester/data_harvester.py:26-28): serialize rows to CSV lines,
# parse them back BOTH ways the engine supports - schema'd from_csv and
# positional split - in one query. (The datasource-level CSV path is
# exercised in tests/test_sources.py against real files.)


@q(
    "scan_csv",
    oracle="""
    WITH lines AS (
        SELECT concat(n_nationkey, ',', n_name, ',', n_regionkey) AS line FROM nation
    )
    SELECT CAST(string_split(line, ',')[1] AS INTEGER) AS n_nationkey,
           string_split(line, ',')[2]                  AS n_name,
           CAST(string_split(line, ',')[3] AS INTEGER) AS n_regionkey,
           string_split(line, ',')[2]                  AS tok_name,
           CAST(string_split(line, ',')[3] AS INTEGER) AS tok_region
    FROM lines
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    line = F.concat_ws(",", "n_nationkey", "n_name", "n_regionkey")
    parsed = F.from_csv(line, "n_nationkey INT, n_name STRING, n_regionkey INT")
    toks = F.split(line, ",")
    return n.select(parsed.alias("r"), toks.alias("t")).select(
        "r.n_nationkey",
        "r.n_name",
        "r.n_regionkey",
        F.element_at("t", 2).alias("tok_name"),
        F.element_at("t", 3).cast("int").alias("tok_region"),
    )


# A4 + A5 + A6 - timezone-shifted clock -> strftime date parts ->
# template expansion, composed exactly as the harvester does
# (data-harvester/data_harvester.py:32-35; lastmonth via calendar
# arithmetic - the reference's lastmonth bug is NOT replicated).


@q(
    "clock_template",
    oracle="""
    WITH shifted AS (
        SELECT event_id, ts, ts + to_hours(user_id % 24) AS shifted_ts FROM events
    )
    SELECT event_id, ts, shifted_ts,
           strftime(shifted_ts, '%Y') AS part_year,
           strftime(shifted_ts, '%m') AS part_month,
           strftime(shifted_ts, '%d') AS part_day,
           strftime(shifted_ts, '%H') AS part_hour,
           strftime(shifted_ts, '%M') AS part_minute,
           replace(replace(replace(replace(replace(
               'http://feeds.example.com/{year}/{month}/{day}/data_{hour}{minute}_{lastmonth}.csv',
               '{year}',  strftime(shifted_ts, '%Y')),
               '{month}', strftime(shifted_ts, '%m')),
               '{day}',   strftime(shifted_ts, '%d')),
               '{hour}',  strftime(shifted_ts, '%H')),
               '{minute}', strftime(shifted_ts, '%M'))
           .replace('{lastmonth}', strftime(shifted_ts - INTERVAL 1 MONTH, '%m')) AS url
    FROM shifted
    """,
)
def clock_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    shifted = F.col("ts") + F.make_dt_interval(
        F.lit(0), (F.col("user_id") % 24).cast("int"), F.lit(0), F.lit(0)
    )
    tpl = F.lit("http://feeds.example.com/{year}/{month}/{day}/data_{hour}{minute}_{lastmonth}.csv")
    out = e.select("event_id", "ts", shifted.alias("shifted_ts"))
    return out.select(
        "event_id",
        "ts",
        "shifted_ts",
        F.date_format("shifted_ts", "yyyy").alias("part_year"),
        F.date_format("shifted_ts", "MM").alias("part_month"),
        F.date_format("shifted_ts", "dd").alias("part_day"),
        F.date_format("shifted_ts", "HH").alias("part_hour"),
        F.date_format("shifted_ts", "mm").alias("part_minute"),
        expand_template(tpl, F.col("shifted_ts")).alias("url"),
    )


# A7 + A8 + A11 + A12 + A17 + A24 - the task control loop: project to
# the task schema (data-harvester/data_harvester.py:37), JSON-encode
# (ibid), decode on the consumer side
# (data-downloader/data_downloader.py:216), 5-way TYPE dispatch
# (:217-228), overwrite-flag sink routing (:102-107), and the catalog
# point-update flag (:40-48, active=2 for broken sources).


@q(
    "task_codec",
    oracle="""
    WITH task AS (
        SELECT c_custkey,
               CAST(c_custkey AS VARCHAR)                  AS ID,
               concat('http://example.com/', c_mktsegment) AS URL,
               CASE c_custkey % 5 WHEN 0 THEN 'LINKS'
                                  WHEN 1 THEN 'LINKS_OVERWRITE'
                                  WHEN 2 THEN 'DIRECT'
                                  WHEN 3 THEN 'DIRECT_FTP'
                                  ELSE 'FTP_FILES' END     AS TYPE,
               '*.csv'                                     AS PATTERN,
               CAST(c_nationkey % 24 AS VARCHAR)           AS UTC
        FROM customer
    ), enc AS (
        SELECT c_custkey,
               CAST(to_json(struct_pack(
                   ID := ID, URL := URL, TYPE := TYPE,
                   PATTERN := PATTERN, UTC := UTC)) AS VARCHAR) AS task_json
        FROM task
    )
    SELECT c_custkey, task_json,
           json_extract_string(task_json, '$.ID')  AS ID,
           json_extract_string(task_json, '$.URL') AS URL,
           CASE json_extract_string(task_json, '$.TYPE')
                WHEN 'LINKS'           THEN 'link_files'
                WHEN 'LINKS_OVERWRITE' THEN 'link_files_overwrite'
                WHEN 'DIRECT'          THEN 'dlinks_files'
                WHEN 'DIRECT_FTP'      THEN 'dftp_files'
                WHEN 'FTP_FILES'       THEN 'ftp_files'
                ELSE 'error_unknown_type' END AS handler,
           CASE WHEN json_extract_string(task_json, '$.TYPE') = 'LINKS_OVERWRITE'
                THEN 'POC2/LINKS_OVER/' ELSE 'POC2/LINK/' END AS lake_prefix,
           CASE WHEN c_custkey IN (5, 7, 11) THEN 2 ELSE 1 END AS active
    FROM enc
    """,
)
def task_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    task = c.select(
        "c_custkey",
        F.struct(
            F.col("c_custkey").cast("string").alias("ID"),
            F.concat(F.lit("http://example.com/"), F.col("c_mktsegment")).alias("URL"),
            F.when(F.col("c_custkey") % 5 == 0, "LINKS")
            .when(F.col("c_custkey") % 5 == 1, "LINKS_OVERWRITE")
            .when(F.col("c_custkey") % 5 == 2, "DIRECT")
            .when(F.col("c_custkey") % 5 == 3, "DIRECT_FTP")
            .otherwise("FTP_FILES")
            .alias("TYPE"),
            F.lit("*.csv").alias("PATTERN"),
            (F.col("c_nationkey") % 24).cast("string").alias("UTC"),
        ).alias("body"),
    ).select("c_custkey", F.to_json("body").alias("task_json"))
    dec = F.from_json(
        "task_json", "ID STRING, URL STRING, TYPE STRING, PATTERN STRING, UTC STRING"
    )
    routed = task.withColumn("t", dec)
    return routed.select(
        "c_custkey",
        "task_json",
        F.col("t.ID").alias("ID"),
        F.col("t.URL").alias("URL"),
        F.when(F.col("t.TYPE") == "LINKS", "link_files")
        .when(F.col("t.TYPE") == "LINKS_OVERWRITE", "link_files_overwrite")
        .when(F.col("t.TYPE") == "DIRECT", "dlinks_files")
        .when(F.col("t.TYPE") == "DIRECT_FTP", "dftp_files")
        .when(F.col("t.TYPE") == "FTP_FILES", "ftp_files")
        .otherwise("error_unknown_type")
        .alias("handler"),
        F.when(F.col("t.TYPE") == "LINKS_OVERWRITE", "POC2/LINKS_OVER/")
        .otherwise("POC2/LINK/")
        .alias("lake_prefix"),
        F.when(F.col("c_custkey").isin(5, 7, 11), 2).otherwise(1).alias("active"),
    )


# A13 + A14 + A15 + A16 + A31 - the LINKS expansion chain: page -> link
# explode (data-downloader/data_downloader.py:83-91) -> urljoin (:92)
# -> filename = last path segment (:93) -> drop empties (:94), with the
# prefix-complement filter (clean-test-files lambda: delete WHERE
# prefix = keep the complement) as the pre-filter.


@q(
    "link_pipeline",
    oracle="""
    WITH pages AS (
        SELECT doc_id, text FROM documents
        WHERE NOT (source LIKE 'src1%') AND doc_id < 200
    ), links AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS link FROM pages
    ), hrefs AS (
        SELECT doc_id, link,
               'http://example.com/dir/index.html' AS base,
               CASE doc_id % 3
                    WHEN 0 THEN concat('http://abs.example.com/', link)
                    WHEN 1 THEN concat('/root-rel/', link)
                    ELSE link END AS href
        FROM links WHERE length(link) > 0
    )
    SELECT doc_id, link,
           CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
                WHEN href LIKE '/%' THEN concat(
                    regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1), href)
                ELSE concat(regexp_replace(base, '[^/]*$', ''), href)
           END AS resolved,
           string_split(CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
                WHEN href LIKE '/%' THEN concat(
                    regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1), href)
                ELSE concat(regexp_replace(base, '[^/]*$', ''), href)
           END, '/')[-1] AS file_name
    FROM hrefs
    """,
)
def link_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(~F.col("source").startswith("src1") & (F.col("doc_id") < 200))
    )
    links = d.select("doc_id", F.explode(F.split("text", " ")).alias("link")).filter(
        F.length("link") > 0
    )
    href = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("http://abs.example.com/"), "link"))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("/root-rel/"), "link"))
        .otherwise(F.col("link"))
    )
    base = F.lit("http://example.com/dir/index.html")
    resolved = links.select("doc_id", "link", url_join(base, href).alias("resolved"))
    return resolved.withColumn("file_name", last_segment("resolved"))


# A20 + A21 + A22 - the FTP_FILES listing chain: split CRLF + drop the
# trailing empty (data-downloader/data_downloader.py:152-153), last
# whitespace token of each ls -l line (:154), fnmatch glob filter
# (:155). The oracle embeds the same translated regex the engine
# produces.

_GLOB = "prices_*7*.zip"
_GLOB_RE = glob_to_regex(_GLOB)


@q(
    "listing_glob",
    oracle=f"""
    WITH listing AS (
        SELECT doc_id,
               concat('-rw-r--r--   1 ftp  ftp  ', n_chars,
                      ' Jan 01 10:00 prices_', doc_id, '.zip', chr(13), chr(10),
                      'drwxr-xr-x   2 ftp  ftp  4096 Jan 02 11:00 data_', doc_id,
                      '.csv', chr(13), chr(10)) AS body
        FROM documents
    ), lines AS (
        SELECT doc_id, body, string_split(body, chr(13) || chr(10)) AS ls
        FROM listing
    ), exploded AS (
        SELECT doc_id, unnest(list_slice(ls, 1, len(ls) - 1)) AS line FROM lines
    )
    SELECT doc_id, regexp_split_to_array(line, '\\s+')[-1] AS file_name
    FROM exploded
    WHERE regexp_matches(regexp_split_to_array(line, '\\s+')[-1], '{_GLOB_RE}')
    """,
)
def listing_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.lit("-rw-r--r--   1 ftp  ftp  "), F.col("n_chars").cast("string"),
        F.lit(" Jan 01 10:00 prices_"), F.col("doc_id").cast("string"),
        F.lit(".zip\r\n"),
        F.lit("drwxr-xr-x   2 ftp  ftp  4096 Jan 02 11:00 data_"),
        F.col("doc_id").cast("string"), F.lit(".csv\r\n"),
    )
    lines = F.split(body, "\r\n")
    sliced = F.slice(lines, F.lit(1), F.greatest(F.size(lines) - 1, F.lit(0)))
    exploded = d.select("doc_id", F.explode(sliced).alias("line"))
    named = exploded.withColumn("file_name", last_ws_token("line"))
    return named.filter(glob_match("file_name", _GLOB)).select("doc_id", "file_name")


# A27 - dedup vs landed-file manifest (the reference's four
# "check repeat file" TODOs): batch-dedup + anti-join.


@q(
    "dedup_anti",
    oracle="""
    SELECT DISTINCT l_orderkey FROM lineitem
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_orderkey = l_orderkey AND o_totalprice > 150000
    )
    """,
)
def dedup_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").dropDuplicates()
    manifest = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return li.join(manifest, li.l_orderkey == manifest.o_orderkey, "left_anti")


# A28 - retry bound -> DLQ (maxReceiveCount: 5,
# cloudformation/lambda.cfn.yaml:34-36).


@q(
    "dlq_filter",
    oracle="""
    SELECT event_id, CAST(event_id % 7 AS INTEGER) AS attempts
    FROM events
    WHERE event_id % 7 >= 5
    """,
)
def dlq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.withColumn("attempts", (F.col("event_id") % 7).cast("int")).filter(
        F.col("attempts") >= 5
    ).select("event_id", "attempts")


# A1-A9 composed: the whole harvest pipeline as ONE oracle-checked
# query - synthesize a catalog from customer rows, filter active+due,
# shift the clock per-source, template-expand the URL, project the
# task schema, and JSON-encode it. This is plans.harvester.harvest_tasks
# exercised relationally (the driver tables carry no catalog, so the
# catalog is derived deterministically, with events supplying a
# per-source clock instead of utcnow()).


@q(
    "harvest_pipeline",
    oracle="""
    WITH catalog AS (
        SELECT CAST(c_custkey AS VARCHAR) AS id,
               'http://feeds.example.com/{year}/{month}/f_{day}.csv' AS url,
               CASE WHEN c_custkey % 3 = 0 THEN 'hourly' ELSE 'daily' END AS interval,
               CAST(CASE WHEN c_custkey % 4 = 0 THEN 0 ELSE 1 END AS INTEGER) AS active,
               CASE WHEN c_custkey % 2 = 0 THEN 'LINKS' ELSE 'DIRECT' END AS type,
               'f_{day}.csv' AS pattern,
               CAST(c_nationkey % 24 AS INTEGER) AS utc_offset,
               TIMESTAMP '2024-06-15 22:30:00' AS now
        FROM customer
    ), due AS (
        SELECT *, now + to_hours(utc_offset) AS clock
        FROM catalog WHERE active = 1 AND interval = 'hourly'
    )
    SELECT id AS ID,
           replace(replace(replace(url,
               '{year}',  strftime(clock, '%Y')),
               '{month}', strftime(clock, '%m')),
               '{day}',   strftime(clock, '%d'))   AS URL,
           type AS TYPE,
           replace(pattern, '{day}', strftime(clock, '%d')) AS PATTERN,
           CAST(utc_offset AS VARCHAR) AS UTC,
           to_json(struct_pack(
               ID  := id,
               URL := replace(replace(replace(url,
                   '{year}',  strftime(clock, '%Y')),
                   '{month}', strftime(clock, '%m')),
                   '{day}',   strftime(clock, '%d')),
               TYPE := type,
               PATTERN := replace(pattern, '{day}', strftime(clock, '%d')),
               UTC := CAST(utc_offset AS VARCHAR)
           )) AS task_json
    FROM due
    """,
)
def harvest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from .harvester import harvest_tasks

    c = load_table(spark, sf_dir, "customer")
    catalog = c.select(
        F.col("c_custkey").cast("string").alias("id"),
        F.lit("http://feeds.example.com/{year}/{month}/f_{day}.csv").alias("url"),
        F.when(F.col("c_custkey") % 3 == 0, "hourly").otherwise("daily").alias("interval"),
        F.lit(None).cast("string").alias("col3"),
        F.when(F.col("c_custkey") % 4 == 0, 0).otherwise(1).cast("int").alias("active"),
        F.lit(None).cast("string").alias("col5"),
        F.lit(None).cast("string").alias("col6"),
        F.when(F.col("c_custkey") % 2 == 0, "LINKS").otherwise("DIRECT").alias("type"),
        F.lit("f_{day}.csv").alias("pattern"),
        (F.col("c_nationkey") % 24).cast("int").alias("utc_offset"),
    )
    return harvest_tasks(catalog, "hourly", datetime(2024, 6, 15, 22, 30))
