"""Dataflow operator battery (SURVEY.md section 2A).

Each query re-expresses one operator of the reference's harvest /
download dataflow over the driver tables so it is DuckDB-oracle
checkable. The end-to-end pipelines composing these operators live in
``plans.harvester`` / ``plans.downloader`` (exercised by pytest with
synthetic catalogs; side-effectful stages can't be oracle queries).

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

# A1 - catalog CSV scan (data-harvester/data_harvester.py:26-27):
# serialize rows to CSV lines and parse them back with an explicit
# schema (to_csv/from_csv - the datasource-level CSV path is exercised
# in tests/test_sources.py against real files).


@q(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    line = F.to_csv(F.struct("n_nationkey", "n_name", "n_regionkey"))
    parsed = F.from_csv(line, "n_nationkey INT, n_name STRING, n_regionkey INT")
    return n.select(parsed.alias("r")).select("r.n_nationkey", "r.n_name", "r.n_regionkey")


# A2 - positional tokenize (data-harvester/data_harvester.py:28):
# split a delimited line into fields.


@q(
    "split_parse",
    oracle="""
    WITH lines AS (
        SELECT concat(n_nationkey, ',', n_name, ',', n_regionkey) AS line FROM nation
    )
    SELECT CAST(string_split(line, ',')[1] AS INTEGER) AS nationkey,
           string_split(line, ',')[2]                  AS name,
           CAST(string_split(line, ',')[3] AS INTEGER) AS regionkey
    FROM lines
    """,
)
def split_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    line = F.concat_ws(",", "n_nationkey", "n_name", "n_regionkey")
    toks = F.split(line, ",")
    return n.select(
        F.element_at(toks, 1).cast("int").alias("nationkey"),
        F.element_at(toks, 2).alias("name"),
        F.element_at(toks, 3).cast("int").alias("regionkey"),
    )


# A4 - timezone-shifted clock (data-harvester/data_harvester.py:32-33).


@q(
    "tz_shift",
    oracle="""
    SELECT event_id, ts, ts + to_hours(user_id % 24) AS shifted_ts
    FROM events
    """,
)
def tz_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    shifted = F.col("ts") + F.make_dt_interval(
        F.lit(0), (F.col("user_id") % 24).cast("int"), F.lit(0), F.lit(0)
    )
    return e.select("event_id", "ts", shifted.alias("shifted_ts"))


# A5 - strftime-style date parts (data-harvester/data_harvester.py:34-35).


@q(
    "date_parts",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y') AS part_year,
           strftime(ts, '%m') AS part_month,
           strftime(ts, '%d') AS part_day,
           strftime(ts, '%H') AS part_hour,
           strftime(ts, '%M') AS part_minute
    FROM events
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy").alias("part_year"),
        F.date_format("ts", "MM").alias("part_month"),
        F.date_format("ts", "dd").alias("part_day"),
        F.date_format("ts", "HH").alias("part_hour"),
        F.date_format("ts", "mm").alias("part_minute"),
    )


# A6 - template expansion (data-harvester/data_harvester.py:34-35),
# lastmonth via calendar arithmetic (reference bug not replicated).


@q(
    "template_url",
    oracle="""
    SELECT event_id,
           replace(replace(replace(replace(replace(
               'http://feeds.example.com/{year}/{month}/{day}/data_{hour}{minute}_{lastmonth}.csv',
               '{year}',  strftime(ts, '%Y')),
               '{month}', strftime(ts, '%m')),
               '{day}',   strftime(ts, '%d')),
               '{hour}',  strftime(ts, '%H')),
               '{minute}', strftime(ts, '%M'))
           .replace('{lastmonth}', strftime(ts - INTERVAL 1 MONTH, '%m')) AS url
    FROM events
    """,
)
def template_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tpl = F.lit("http://feeds.example.com/{year}/{month}/{day}/data_{hour}{minute}_{lastmonth}.csv")
    return e.select("event_id", expand_template(tpl, F.col("ts")).alias("url"))


# A7 - projection/rename to the task schema (data-harvester/data_harvester.py:37).


@q(
    "project_task",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR)                          AS ID,
           concat('http://example.com/', c_mktsegment)         AS URL,
           CASE c_custkey % 5 WHEN 0 THEN 'LINKS'
                              WHEN 1 THEN 'LINKS_OVERWRITE'
                              WHEN 2 THEN 'DIRECT'
                              WHEN 3 THEN 'DIRECT_FTP'
                              ELSE 'FTP_FILES' END             AS TYPE,
           '*.csv'                                             AS PATTERN,
           CAST(c_nationkey % 24 AS VARCHAR)                   AS UTC
    FROM customer
    """,
)
def project_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
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
    )


# A8 - row -> JSON task encode (data-harvester/data_harvester.py:37).


@q(
    "to_json_task",
    oracle="""
    SELECT c_custkey,
           CAST(to_json(struct_pack(
               ID  := CAST(c_custkey AS VARCHAR),
               URL := concat('http://example.com/', c_mktsegment)
           )) AS VARCHAR) AS task_json
    FROM customer
    """,
)
def to_json_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    body = F.struct(
        F.col("c_custkey").cast("string").alias("ID"),
        F.concat(F.lit("http://example.com/"), F.col("c_mktsegment")).alias("URL"),
    )
    return c.select("c_custkey", F.to_json(body).alias("task_json"))


# A11 - JSON task decode (data-downloader/data_downloader.py:216).


@q(
    "from_json_task",
    oracle="""
    WITH msgs AS (
        SELECT concat('{"ID":"', c_custkey, '","URL":"http://example.com/',
                      c_mktsegment, '"}') AS body
        FROM customer
    )
    SELECT json_extract_string(body, '$.ID')  AS ID,
           json_extract_string(body, '$.URL') AS URL
    FROM msgs
    """,
)
def from_json_task(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    body = F.concat(
        F.lit('{"ID":"'),
        F.col("c_custkey").cast("string"),
        F.lit('","URL":"http://example.com/'),
        F.col("c_mktsegment"),
        F.lit('"}'),
    )
    parsed = F.from_json(body, "ID STRING, URL STRING")
    return c.select(parsed.alias("t")).select("t.ID", "t.URL")


# A12 - 5-way TYPE dispatch (data-downloader/data_downloader.py:217-228),
# including the unknown-type error branch.


@q(
    "route_type",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type WHEN 'click'    THEN 'link_files'
                           WHEN 'view'     THEN 'link_files_overwrite'
                           WHEN 'purchase' THEN 'dlinks_files'
                           WHEN 'signup'   THEN 'dftp_files'
                           ELSE 'error_unknown_type' END AS handler
    FROM events
    """,
)
def route_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", "link_files")
        .when(F.col("event_type") == "view", "link_files_overwrite")
        .when(F.col("event_type") == "purchase", "dlinks_files")
        .when(F.col("event_type") == "signup", "dftp_files")
        .otherwise("error_unknown_type")
        .alias("handler"),
    )


# A13 - link extraction explode: 1 page row -> N link rows
# (data-downloader/data_downloader.py:83-91).


@q(
    "explode_links",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS link
    FROM documents
    WHERE doc_id < 200
    """,
)
def explode_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("link"))


# A14 - URL resolution (urljoin; data-downloader/data_downloader.py:92).


@q(
    "url_join",
    oracle="""
    WITH hrefs AS (
        SELECT doc_id,
               'http://example.com/dir/index.html' AS base,
               CASE doc_id % 3
                    WHEN 0 THEN 'http://abs.example.com/f.csv'
                    WHEN 1 THEN '/root-rel/f.csv'
                    ELSE 'doc-rel/f.csv' END AS href
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
                WHEN href LIKE '/%' THEN concat(
                    regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1), href)
                ELSE concat(regexp_replace(base, '[^/]*$', ''), href)
           END AS resolved
    FROM hrefs
    """,
)
def url_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    href = (
        F.when(F.col("doc_id") % 3 == 0, "http://abs.example.com/f.csv")
        .when(F.col("doc_id") % 3 == 1, "/root-rel/f.csv")
        .otherwise("doc-rel/f.csv")
    )
    base = F.lit("http://example.com/dir/index.html")
    return d.select("doc_id", url_join(base, href).alias("resolved"))


# A15 - filename = last path segment (data-downloader/data_downloader.py:93).


@q(
    "last_segment",
    oracle="""
    SELECT doc_id,
           string_split(concat('http://example.com/', source, '/file_', doc_id, '.csv'),
                        '/')[-1] AS file_name
    FROM documents
    """,
)
def last_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://example.com/"), F.col("source"), F.lit("/file_"),
        F.col("doc_id").cast("string"), F.lit(".csv"),
    )
    return d.select("doc_id", last_segment(url).alias("file_name"))


# A16 - drop empty filenames (trailing-slash links;
# data-downloader/data_downloader.py:94).


@q(
    "filter_nonempty",
    oracle="""
    SELECT doc_id, link FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS link
        FROM documents WHERE doc_id < 200
    ) WHERE length(link) > 0
    """,
)
def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("link")).filter(
        F.length("link") > 0
    )


# A17 - overwrite-flag sink routing (data-downloader/data_downloader.py:102-107).


@q(
    "route_overwrite",
    oracle="""
    SELECT doc_id,
           concat(CASE WHEN doc_id % 2 = 0 THEN 'POC2/LINKS_OVER/' ELSE 'POC2/LINK/' END,
                  'file_', doc_id, '.csv') AS lake_key
    FROM documents
    """,
)
def route_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    prefix = F.when(F.col("doc_id") % 2 == 0, "POC2/LINKS_OVER/").otherwise("POC2/LINK/")
    return d.select(
        "doc_id",
        F.concat(prefix, F.lit("file_"), F.col("doc_id").cast("string"), F.lit(".csv")).alias(
            "lake_key"
        ),
    )


# A20 - listing split + drop trailing element
# (data-downloader/data_downloader.py:152-153: split('\\r\\n')[0:-1]).


@q(
    "split_lines",
    oracle="""
    WITH listing AS (
        SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS lines
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(list_slice(lines, 1, len(lines) - 1)) AS n_lines,
           list_slice(lines, 1, len(lines) - 1)[1]   AS first_line
    FROM listing
    """,
)
def split_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    lines = F.split(F.replace(F.col("text"), F.lit(" "), F.expr("char(10)")), "\n")
    sliced = F.slice(lines, F.lit(1), F.size(lines) - 1)
    return d.select(
        "doc_id",
        F.size(sliced).alias("n_lines"),
        F.element_at(sliced, 1).alias("first_line"),
    )


# A21 - last whitespace token of an ls -l listing line
# (data-downloader/data_downloader.py:154).


@q(
    "last_token",
    oracle="""
    WITH listing AS (
        SELECT doc_id,
               concat('-rw-r--r--   1 ftp  ftp  ', n_chars,
                      ' Jan 01 10:00 prices_', doc_id, '.zip') AS line
        FROM documents
    )
    SELECT doc_id, regexp_split_to_array(line, '\\s+')[-1] AS file_name
    FROM listing
    """,
)
def last_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    line = F.concat(
        F.lit("-rw-r--r--   1 ftp  ftp  "), F.col("n_chars").cast("string"),
        F.lit(" Jan 01 10:00 prices_"), F.col("doc_id").cast("string"), F.lit(".zip"),
    )
    return d.select("doc_id", last_ws_token(line).alias("file_name"))


# A22 - fnmatch glob filter (data-downloader/data_downloader.py:155).
# The oracle embeds the same translated regex the engine produces.

_GLOB = "*e?r*"
_GLOB_RE = glob_to_regex(_GLOB)


@q(
    "glob_filter",
    oracle=f"""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '{_GLOB_RE}')
    """,
)
def glob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(glob_match("p_name", _GLOB)).select("p_partkey", "p_name")


# A24 - catalog point update: flag broken sources active=2
# (data-downloader/data_downloader.py:40-48). The full read-modify-
# overwrite cycle is in sources.catalog; here the relational core.


@q(
    "flag_update",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey IN (5, 7, 11) THEN 2 ELSE 1 END AS active
    FROM customer
    """,
)
def flag_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_custkey").isin(5, 7, 11), 2).otherwise(1).alias("active"),
    )


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


# A31 - prefix scan + bulk delete (clean-test-files lambda):
# relationally, "delete WHERE prefix" = keep the complement.


@q(
    "prefix_delete",
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE NOT (source LIKE 'src1%')
    """,
)
def prefix_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.filter(~F.col("source").startswith("src1")).select("doc_id", "source")
