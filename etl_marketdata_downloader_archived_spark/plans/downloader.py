"""Download pipeline: tasks -> expanded file set -> dedup -> fetch ->
partitioned lake + manifest + quarantine (reference entry point 2).

Re-expresses ``data_downloader.handler`` (reference:
data-downloader/data_downloader.py:204-228 and the per-type handlers
:62-202) as a DataFrame pipeline:

    from_json(task) -> 5-way TYPE route -> per-branch expansion
      LINKS / LINKS_OVERWRITE : fetch page -> extract hrefs -> explode
                                -> urljoin -> last segment -> nonempty
                                (:83-107)
      DIRECT / DIRECT_FTP     : single file, name = PATTERN (:115-139,
                                :178-202; the reference's
                                download-the-ID bug at :132 is NOT
                                replicated - we fetch URL)
      FTP_FILES               : fetch listing -> split CRLF -> last
                                token -> glob match (:152-155)
    -> anti-join vs manifest (the four "check repeat file" TODOs at
       :106,131,169,194, actually implemented)
    -> fetch stage (mapInPandas; Arrow-batched, connection per
       partition) -> content + sha256
    -> lake write partitioned by route + manifest append; failures ->
       quarantine rows (replaces SNS at :52-56) + catalog flag=2

Scale notes: every network call lives in exactly two mapInPandas
stages (page/listing fetch, file fetch); everything else is Catalyst.
Fetch stages key their outputs by (route, file_name) so at-least-once
re-runs are idempotent after the manifest anti-join - the Structured
Streaming twin of this plan reuses the same stages per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import last_segment, last_ws_token, url_join
from ..io import latest_per_key
from ..schemas import MANIFEST, TASK
from ..sources.transport import TransportError, fetch_bytes, fetch_listing, fetch_text

# lake route prefixes, one per reference sink
# (data-downloader/data_downloader.py:104,107,132,170,195)
ROUTE_LINK = "LINK"
ROUTE_LINKS_OVER = "LINKS_OVER"
ROUTE_LINKS_DIRECT = "LINKS_DIRECT"
ROUTE_FTP_FILE = "FTP_FILE"
ROUTE_FTP_FILES = "FTP_FILES"

def decode_tasks(messages: DataFrame, body_col: str = "task_json") -> DataFrame:
    """JSON task decode (reference: data-downloader/data_downloader.py:216).

    Carries the raw body through as ``_task_body`` so a message that
    fails to parse (from_json -> all-NULL struct) can be quarantined
    with the offending payload named, instead of a NULL reason - the
    reference would throw inside the lambda and redrive the message
    blind; here the malformed message is evidence, not an exception."""
    parsed = F.from_json(F.col(body_col), TASK)
    return messages.select(
        parsed.alias("t"), F.col(body_col).alias("_task_body")
    ).select("t.*", "_task_body")


def route_tasks(tasks: DataFrame) -> DataFrame:
    """5-way TYPE dispatch + unknown-type error branch
    (reference: data-downloader/data_downloader.py:217-228)."""
    return tasks.withColumn(
        "handler",
        F.when(F.col("TYPE") == "LINKS", "link_files")
        .when(F.col("TYPE") == "LINKS_OVERWRITE", "link_files_overwrite")
        .when(F.col("TYPE") == "DIRECT", "dlinks_files")
        .when(F.col("TYPE") == "DIRECT_FTP", "dftp_files")
        .when(F.col("TYPE") == "FTP_FILES", "ftp_files")
        .otherwise("error_unknown_type"),
    )


# Anchor-href extraction at BeautifulSoup fidelity for well-formed-ish
# markup (reference soups the page, data_downloader.py:84-91): any
# attribute casing, whitespace around '=', double-quoted, single-quoted
# OR unquoted values (real pages carry href=x without quotes; round-1's
# quoted-only regex missed those). The attribute name must start at a
# token boundary - `(?:[^>]*?\s)?` requires either nothing or a chunk
# ENDING in whitespace before `href`, so `data-href=...` can never
# satisfy the match (the real href later in the tag still can). The
# quote strip happens in a second projection.
_HREF_SQL_RE = r"""(?i)<a\s(?:[^>]*?\s)?href\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)"""


def _strip_quotes(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, "^[\"']", ""), "[\"']$", "")


def _hrefs_stdlib(body: str) -> list[str]:
    """stdlib half of ``_hrefs_lenient``: ``html.parser.HTMLParser``,
    the exact tokenizer bs4's "html.parser" backend wraps, plus bs4's
    attribute-dict layer on top so the two branches of
    ``_hrefs_lenient`` agree byte-for-byte: a MINIMIZED attribute
    (bare ``href``, tokenizer value None) becomes ``''`` (bs4 does
    ``value or ''`` - and ``find_all(href=True)`` matches ``''``
    because its truthy-match tests ``is not None``), and a DUPLICATED
    attribute keeps the LAST value (bs4's default
    on_duplicate_attribute=REPLACE dict build). Split out so the
    bs4-agreement boundary is property-testable directly
    (tests/test_pipeline.py replays the committed expectation corpus
    here and drives live bs4 wherever it is importable)."""
    from html.parser import HTMLParser

    out: list[str] = []

    class _Anchors(HTMLParser):
        def handle_starttag(self, tag, attrs):  # noqa: ANN001
            if tag == "a":
                d: dict = {}
                for k, v in attrs:
                    d[k] = v or ""
                if "href" in d:
                    out.append(d["href"])

    p = _Anchors(convert_charrefs=True)
    p.feed(body)
    p.close()
    return out


def _hrefs_lenient(body: str) -> list[str]:
    """Anchor hrefs at real-HTML-parser fidelity - the reference soups
    the page (data-downloader/data_downloader.py:83-91), which IGNORES
    anchors inside comments/CDATA and recovers from unbalanced quotes;
    the JVM regex extracts from both. Prefers BeautifulSoup when the
    runtime has it; otherwise the stdlib tokenizer path
    (``_hrefs_stdlib``), so the two paths agree on comment/CDATA/
    quote handling."""
    try:
        from bs4 import BeautifulSoup  # optional dep - import-gated

        return [
            a["href"]
            for a in BeautifulSoup(body, "html.parser").find_all("a", href=True)
        ]
    except ImportError:
        return _hrefs_stdlib(body)


def _extract_links_lenient(ok: DataFrame) -> DataFrame:
    """Pandas-UDF branch of the href explode: one lenient HTML parse
    per page, Arrow-batched. Python-side and ~10x the regex cost per
    byte - reserve it for real-world pages where commented-out nav
    links and broken markup occur; the JVM regex stays the fast path
    for trusted/generated markup."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"ID": [], "TYPE": [], "page_url": [], "href": []}
            for r in pdf.itertuples(index=False):
                for href in _hrefs_lenient(r.body or ""):
                    rows["ID"].append(r.ID)
                    rows["TYPE"].append(r.TYPE)
                    rows["page_url"].append(r.URL)
                    rows["href"].append(href)
            yield pd.DataFrame(rows, columns=["ID", "TYPE", "page_url", "href"])

    return ok.select("ID", "TYPE", "URL", "body").mapInPandas(
        parse, schema="ID string, TYPE string, page_url string, href string"
    )


_PAGE_SCHEMA = "ID string, URL string, TYPE string, PATTERN string, body string, error string"


def _fetch_body_stage(tasks: DataFrame, listing: bool, allow_network: bool) -> DataFrame:
    """Shared page/listing fetch: one Python I/O stage, Arrow-batched.
    Errors become rows (never exceptions) so the quarantine split is a
    plain filter."""

    def fetch_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    body = (
                        fetch_listing(r.URL, allow_network)
                        if listing
                        else fetch_text(r.URL, allow_network)
                    )
                    err = None
                except TransportError as exc:
                    body, err = None, str(exc)
                out.append(
                    {
                        "ID": r.ID,
                        "URL": r.URL,
                        "TYPE": r.TYPE,
                        "PATTERN": r.PATTERN,
                        "body": body,
                        "error": err,
                    }
                )
            yield pd.DataFrame(out, columns=["ID", "URL", "TYPE", "PATTERN", "body", "error"])

    return tasks.select("ID", "URL", "TYPE", "PATTERN").mapInPandas(
        fetch_part, schema=_PAGE_SCHEMA
    )


def expand_link_tasks(
    tasks: DataFrame,
    allow_network: bool = False,
    cache_registry: list | None = None,
    html_parser: str = "regex",
) -> tuple[DataFrame, DataFrame]:
    """LINKS / LINKS_OVERWRITE branch: page -> hrefs -> one row per
    candidate file (reference: data-downloader/data_downloader.py:83-107).
    Returns (candidate files, failed page fetches). The persisted fetch
    stage is appended to ``cache_registry`` so the caller can release
    it (a streaming twin would otherwise accumulate one cache entry per
    micro-batch, unbounded).

    ``html_parser``: "regex" (default) extracts hrefs JVM-side - fast,
    codegen-friendly, but reads through comments/CDATA and can smear
    across unbalanced quotes; "lenient" runs a real HTML parser
    (bs4 when importable, else the stdlib tokenizer bs4 wraps) as an
    Arrow-batched pandas stage - reference-fidelity on malformed
    real-world pages (data-downloader/data_downloader.py:83-91)."""
    if html_parser not in ("regex", "lenient"):
        raise ValueError(f"expand_link_tasks: unknown html_parser {html_parser!r}")
    pages = _fetch_body_stage(
        tasks.filter(F.col("TYPE").isin("LINKS", "LINKS_OVERWRITE")),
        listing=False,
        allow_network=allow_network,
    ).persist(StorageLevel.DISK_ONLY)
    if cache_registry is not None:
        cache_registry.append(pages)
    # persisted because BOTH branches (ok links, failed fetches) derive
    # from it: without it the quarantine write re-runs the page fetch -
    # every URL fetched twice per batch, timeouts paid twice. DISK_ONLY:
    # page bodies are raw payload, not worth executor memory.
    ok = pages.filter(F.col("error").isNull())

    if html_parser == "lenient":
        links = _extract_links_lenient(ok)
    else:
        # href extraction stays JVM-side: regexp_extract_all + explode
        # (the reference soups the page, data_downloader.py:84-91; for
        # well-formed anchor lists a regex is equivalent and
        # codegen-friendly)
        links = ok.select(
            "ID",
            "TYPE",
            F.col("URL").alias("page_url"),
            F.explode(F.regexp_extract_all("body", F.lit(_HREF_SQL_RE), 1)).alias("raw_href"),
        ).withColumn("href", _strip_quotes(F.col("raw_href")))
    resolved = links.select(
        "ID",
        "TYPE",
        url_join(F.col("page_url"), F.col("href")).alias("file_url"),
    )
    named = resolved.withColumn("file_name", last_segment("file_url")).filter(
        F.length("file_name") > 0
    )
    return named.withColumn(
        "route",
        F.when(F.col("TYPE") == "LINKS_OVERWRITE", ROUTE_LINKS_OVER).otherwise(ROUTE_LINK),
    ).select("ID", "route", "file_url", "file_name"), pages.filter(
        F.col("error").isNotNull()
    )


def expand_listing_tasks(
    tasks: DataFrame,
    allow_network: bool = False,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """FTP_FILES branch: listing -> file names -> glob match
    (reference: data-downloader/data_downloader.py:152-170).
    Returns (candidate files, failed listing fetches).

    The glob pattern varies per task row, so the translation runs as a
    vectorized pandas UDF and the match is ``regexp_like`` with a
    per-row regex column."""
    listings = _fetch_body_stage(
        tasks.filter(F.col("TYPE") == "FTP_FILES"), listing=True, allow_network=allow_network
    ).persist(StorageLevel.DISK_ONLY)
    # persisted for the same ok/error double-consumption reason as the
    # page fetch in expand_link_tasks
    if cache_registry is not None:
        cache_registry.append(listings)
    ok = listings.filter(F.col("error").isNull())

    from ..functions.globs import glob_to_regex  # noqa: PLC0415

    @F.pandas_udf("string")
    def glob_regex(pats: pd.Series) -> pd.Series:
        return pats.map(glob_to_regex)

    lines = ok.select(
        "ID",
        F.col("URL").alias("base_url"),
        "PATTERN",
        # split('\r\n')[0:-1] - the reference drops the trailing empty
        F.explode(
            F.slice(
                F.split("body", "\r\n"),
                F.lit(1),
                F.greatest(F.size(F.split("body", "\r\n")) - 1, F.lit(0)),
            )
        ).alias("line"),
    )
    named = lines.withColumn("file_name", last_ws_token("line"))
    matched = named.withColumn("_re", glob_regex("PATTERN")).filter(
        F.expr("regexp_like(file_name, _re)")
    )
    return matched.select(
        "ID",
        F.lit(ROUTE_FTP_FILES).alias("route"),
        F.concat("base_url", "file_name").alias("file_url"),
        "file_name",
    ), listings.filter(F.col("error").isNotNull())


def expand_direct_tasks(tasks: DataFrame) -> DataFrame:
    """DIRECT / DIRECT_FTP branch: one file per task, output name =
    PATTERN (reference: data-downloader/data_downloader.py:115-139,
    :178-202). No fetch here - pure projection."""
    d = tasks.filter(F.col("TYPE").isin("DIRECT", "DIRECT_FTP"))
    return d.select(
        "ID",
        F.when(F.col("TYPE") == "DIRECT", ROUTE_LINKS_DIRECT)
        .otherwise(ROUTE_FTP_FILE)
        .alias("route"),
        F.col("URL").alias("file_url"),
        F.col("PATTERN").alias("file_name"),
    )


def dedup_against_manifest(candidates: DataFrame, manifest: DataFrame | None) -> DataFrame:
    """Cross-run dedup: drop candidates already landed, except on the
    overwrite route (reference semantics: LINKS_OVERWRITE always
    rewrites, data-downloader/data_downloader.py:102-104; the other
    four sinks carry the unimplemented dedup TODO)."""
    within = candidates.dropDuplicates(["route", "file_name"])
    if manifest is None:
        return within
    seen = manifest.select("route", "file_name").dropDuplicates()
    keep_over = within.filter(F.col("route") == ROUTE_LINKS_OVER)
    rest = within.filter(F.col("route") != ROUTE_LINKS_OVER)
    fresh = rest.join(seen, ["route", "file_name"], "left_anti")
    return fresh.unionByName(keep_over)


# manifest as persisted by run_downloader: MANIFEST + the lake route
_MANIFEST_ON_DISK = T.StructType(
    list(MANIFEST.fields) + [T.StructField("route", T.StringType())]
)

_FETCH_SCHEMA = (
    "ID string, route string, file_url string, file_name string, "
    "content binary, size_bytes long, error string"
)


def fetch_files(candidates: DataFrame, allow_network: bool = False) -> DataFrame:
    """The download_upload stage (reference:
    data-downloader/data_downloader.py:62-70) as mapInPandas: bytes in
    a BinaryType column instead of a blind S3 put, so hashing/metadata
    are one projection away."""

    def fetch_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    content = fetch_bytes(r.file_url, allow_network)
                    err = None
                except TransportError as exc:
                    content, err = None, str(exc)
                rows.append(
                    {
                        "ID": r.ID,
                        "route": r.route,
                        "file_url": r.file_url,
                        "file_name": r.file_name,
                        "content": content,
                        "size_bytes": len(content) if content is not None else None,
                        "error": err,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "ID", "route", "file_url", "file_name",
                    "content", "size_bytes", "error",
                ],
            )

    return candidates.mapInPandas(fetch_part, schema=_FETCH_SCHEMA)


def read_manifest_current(spark: SparkSession, manifest_dir: str) -> DataFrame | None:
    """The manifest as a current-state table (latest row per
    route/file_name), or None before the first write."""
    try:
        log = spark.read.schema(_MANIFEST_ON_DISK).parquet(manifest_dir)
        log.head(1)  # force existence check now
    except Exception:  # noqa: BLE001 - first run: no manifest yet
        return None
    return latest_per_key(log, ["route", "file_name"])


def read_lake_current(spark: SparkSession, lake_dir: str) -> DataFrame:
    """The lake as a current-state table: latest payload per
    (route, file_name) - re-fetches on the overwrite route logically
    REPLACE rather than duplicate (reference: each S3 put overwrites
    the object, data-downloader/data_downloader.py:102-104)."""
    return latest_per_key(spark.read.parquet(lake_dir), ["route", "file_name"])


_QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.StringType()),
        T.StructField("URL", T.StringType()),
        T.StructField("REASON", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("failed_at", T.TimestampType()),
    ]
)


def run_downloader(
    spark: SparkSession,
    messages: DataFrame,
    lake_dir: str,
    manifest_dir: str | None = None,
    quarantine_dir: str | None = None,
    catalog_path: str | None = None,
    allow_network: bool = False,
    body_col: str = "task_json",
    max_attempts: int = 5,
    html_parser: str = "regex",
) -> dict[str, DataFrame]:
    """One micro-batch of the download pipeline, end to end - INCLUDING
    the reference's composed error path (handle_error,
    data-downloader/data_downloader.py:26-58): failures land in
    quarantine with an attempt count ACCUMULATED across runs, units
    that exhausted ``max_attempts`` (lambda.cfn.yaml:34-36:
    maxReceiveCount 5) are dead-lettered instead of retried, and when
    ``catalog_path`` is given the failing sources are flagged active=2
    in the catalog - no caller composition required.

    Returns {'landed', 'manifest', 'quarantine', 'dead_letter',
    'catalog'} DataFrames; lake and manifest are also written out
    (parquet, lake partitioned by route). The caller owns scheduling;
    the streaming twin wraps this in foreachBatch with checkpointing as
    the ack (SURVEY.md section 3.2).
    """
    # one wall-clock per batch: lake rows and manifest rows of the same
    # batch must carry the SAME timestamp (two actions would evaluate
    # current_timestamp() twice), and latest_per_key orders by it.
    # Shipped as explicit epoch micros: F.lit(datetime) converts through
    # the Python PROCESS timezone, and a wall-clock STRING would parse
    # under the session timezone (host-dependent on a vanilla session,
    # and non-monotonic across a DST fold, which would make
    # latest_per_key prefer stale rows). An instant has neither problem.
    batch_ts = F.timestamp_micros(
        F.lit(int(datetime.now(timezone.utc).timestamp() * 1_000_000))
    )

    tasks = route_tasks(decode_tasks(messages, body_col))
    # retry-identity for keyless failures: a malformed-JSON (or
    # field-less) message decodes to NULL ID/URL, and every join in
    # the retry machinery - the attempts lookup, the DLQ gate - is
    # NULL-unsafe equality, so such a message would be re-quarantined
    # at attempts=1 FOREVER instead of dead-lettering after
    # max_attempts (review finding). A deterministic body-hash
    # sentinel gives the redelivered message a stable key the
    # maxReceiveCount semantics can count.
    _body_key = F.concat(
        F.lit("malformed:"),
        F.substring(
            F.sha2(F.coalesce(F.col("_task_body"), F.lit("")), 256), 1, 16
        ),
    )
    tasks = tasks.withColumn(
        "ID", F.coalesce(F.col("ID"), _body_key)
    ).withColumn("URL", F.coalesce(F.col("URL"), _body_key))

    # attempts so far per failing unit (task URL or file URL), from the
    # quarantine log - the cross-run retry memory
    attempts_prev = None
    if quarantine_dir is not None:
        try:
            prior = spark.read.schema(_QUARANTINE_SCHEMA).parquet(quarantine_dir)
            prior.head(1)
            # localCheckpoint SNAPSHOTS the log before this run appends
            # to it: the returned DataFrames re-evaluate lazily after
            # the write, and a plain parquet read would then see this
            # run's own rows (attempts double-counting, self-gating)
            attempts_prev = prior.groupBy("ID", "URL").agg(
                F.max("attempts").alias("prev_attempts")
            ).localCheckpoint()
        except Exception:  # noqa: BLE001 - first run: no quarantine yet
            attempts_prev = None

    # DLQ gate: a unit that failed max_attempts times stops being
    # retried (the SQS maxReceiveCount -> DLQ bound). Tasks are gated
    # on their task URL here; failing FILES are gated per file_url at
    # the candidate stage below.
    dead_letter = spark.createDataFrame([], _QUARANTINE_SCHEMA)
    if attempts_prev is not None:
        exhausted = attempts_prev.filter(F.col("prev_attempts") >= max_attempts)
        dead_letter = (
            spark.read.schema(_QUARANTINE_SCHEMA).parquet(quarantine_dir)
            .join(
                exhausted.select("ID", "URL"), ["ID", "URL"], "left_semi"
            )
        ).localCheckpoint()
        tasks = tasks.join(
            exhausted.select("ID", F.col("URL")), ["ID", "URL"], "left_anti"
        )
    tasks = tasks.cache()
    cached: list[DataFrame] = [tasks]

    link_files, link_errs = expand_link_tasks(
        tasks, allow_network, cache_registry=cached, html_parser=html_parser
    )
    ftp_files, ftp_errs = expand_listing_tasks(tasks, allow_network, cache_registry=cached)
    direct_files = expand_direct_tasks(tasks)
    unknown = tasks.filter(F.col("handler") == "error_unknown_type")

    candidates = link_files.unionByName(ftp_files).unionByName(direct_files)
    if attempts_prev is not None:
        candidates = candidates.join(
            attempts_prev.filter(F.col("prev_attempts") >= max_attempts)
            .select("ID", F.col("URL").alias("file_url")),
            ["ID", "file_url"],
            "left_anti",
        )

    manifest_prev = read_manifest_current(spark, manifest_dir) if manifest_dir else None

    fresh = dedup_against_manifest(candidates, manifest_prev)
    # DISK_ONLY, not memory: `content` is raw fetched payload (BinaryType);
    # pinning it in executor memory is an OOM at lake scale - spill it,
    # both consumers (landed split, failed split) stream it back once
    fetched = fetch_files(fresh, allow_network).persist(StorageLevel.DISK_ONLY)
    cached.append(fetched)
    landed = fetched.filter(F.col("error").isNull())
    failed = fetched.filter(F.col("error").isNotNull())

    # quarantine = page/listing errors + file errors + unknown types,
    # each carrying prior_attempts + 1
    def _q(df: DataFrame, url_col: str, reason_col) -> DataFrame:
        rows = df.select(
            F.col("ID"),
            F.col(url_col).alias("URL"),
            reason_col.alias("REASON"),
        )
        if attempts_prev is not None:
            rows = rows.join(attempts_prev, ["ID", "URL"], "left")
        else:
            rows = rows.withColumn("prev_attempts", F.lit(None).cast("int"))
        return rows.select(
            "ID",
            "URL",
            "REASON",
            (F.coalesce(F.col("prev_attempts"), F.lit(0)) + 1).cast("int").alias("attempts"),
            batch_ts.alias("failed_at"),
        )

    quarantine = (
        _q(link_errs, "URL", F.col("error"))
        .unionByName(_q(ftp_errs, "URL", F.col("error")))
        .unionByName(_q(failed, "file_url", F.col("error")))
        .unionByName(
            _q(
                unknown,
                "URL",
                # a parse failure leaves TYPE (and every field) NULL;
                # name the malformed payload instead of emitting a
                # NULL reason (concat with NULL TYPE was NULL)
                F.when(
                    F.col("TYPE").isNotNull(),
                    F.concat(F.lit("unknown TYPE: "), F.col("TYPE")),
                ).otherwise(
                    F.concat(
                        F.lit("malformed or TYPE-less task JSON: "),
                        F.substring(
                            F.coalesce(
                                F.col("_task_body"), F.lit("<null body>")
                            ),
                            1,
                            120,
                        ),
                    )
                ),
            )
        )
    )

    lake = landed.select(
        "route",
        "file_name",
        "content",
        F.sha2("content", 256).alias("content_hash"),
        "size_bytes",
        F.col("ID").alias("source_id"),
        F.col("file_url").alias("url"),
        batch_ts.alias("fetched_at"),
    )
    lake.write.mode("append").partitionBy("route").parquet(lake_dir)

    manifest_new = lake.select(
        "file_name", F.col("route").alias("source_type"), "source_id", "url",
        "content_hash", "fetched_at", "size_bytes", "route",
    )
    if manifest_dir is not None:
        manifest_new.write.mode("append").parquet(manifest_dir)
    if quarantine_dir is not None:
        quarantine.write.mode("append").parquet(quarantine_dir)

    # composed catalog error path: flag every failing source active=2
    # (reference handle_error writes the whole catalog back;
    # localCheckpoint breaks lineage so the overwrite of the path we
    # just read from is safe)
    catalog_out = None
    if catalog_path is not None:
        from ..sources.catalog import flag_broken, read_catalog, valid_rows, write_catalog

        broken = [r.ID for r in quarantine.select("ID").distinct().collect()]
        if broken:
            cat = valid_rows(read_catalog(spark, catalog_path, fmt="parquet"))
            catalog_out = flag_broken(cat, broken).localCheckpoint()
            write_catalog(catalog_out, catalog_path)

    # the persisted stages stay cached: the returned DataFrames are
    # views over them and an unpersist here would re-run the network
    # fetches on the caller's next action. The caller releases them via
    # the returned callable once done with the views - the streaming
    # twin calls it per micro-batch (an unreleased cache entry per
    # batch grows without bound on a long-running stream).
    def release() -> None:
        for df in cached:
            df.unpersist()

    return {
        "landed": lake,
        "manifest": manifest_new,
        "quarantine": quarantine,
        "dead_letter": dead_letter,
        "catalog": catalog_out,
        "release": release,
    }
