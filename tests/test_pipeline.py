"""End-to-end harvest -> download pipeline test (SURVEY.md section 5.2
item 4): synthetic catalog + local file:// "remote" fixtures -> run the
pipeline -> assert lake/manifest contents; error injection -> assert
quarantine row + catalog flag=2. Automates the reference's manual
upload-and-watch verification."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.plans.downloader import (
    run_downloader,
)
from etl_marketdata_downloader_archived_spark.plans.harvester import harvest_tasks
from etl_marketdata_downloader_archived_spark.sources.catalog import (
    flag_broken,
    read_catalog,
    valid_rows,
    write_catalog,
)

NOW = datetime(2024, 6, 15, 12, 30)


@pytest.fixture()
def remote(tmp_path):
    """A local 'remote': an HTML page with links, a listing dir with
    files, and a direct file - all reachable via file:// URLs."""
    root = tmp_path / "remote"
    (root / "files").mkdir(parents=True)
    (root / "files" / "prices_202406.csv").write_text("a,b\n1,2\n")
    (root / "files" / "rates_202406.csv").write_text("c,d\n3,4\n")
    (root / "files" / "readme.txt").write_text("ignore me")
    (root / "page.html").write_text(
        '<html><body>'
        '<a href="files/prices_202406.csv">prices</a>'
        '<a href="files/rates_202406.csv">rates</a>'
        '<a href="files/readme.txt">readme</a>'
        '<a href="">empty</a>'
        "</body></html>"
    )
    (root / "direct_2024.bin").write_bytes(b"\x00\x01payload")
    return root


@pytest.fixture()
def catalog_csv(tmp_path, remote):
    p = tmp_path / "catalog.csv"
    rows = [
        # id,url,interval,col3,active,col5,col6,type,pattern,utc_offset
        f"1,file://{remote}/page.html,hourly,x,1,y,z,LINKS,unused,0",
        f"2,file://{remote}/files/,hourly,x,1,y,z,FTP_FILES,*_{{year}}{{month}}.csv,0",
        f"3,file://{remote}/direct_{{year}}.bin,hourly,x,1,y,z,DIRECT,direct_{{year}}.bin,2",
        f"4,file://{remote}/missing.html,hourly,x,1,y,z,LINKS,unused,0",  # error path
        f"5,file://{remote}/page.html,daily,x,1,y,z,LINKS,unused,0",      # wrong interval
        f"6,file://{remote}/page.html,hourly,x,0,y,z,LINKS,unused,0",     # inactive
        "7,badrow-with-too-few-columns",                                   # corrupt
    ]
    p.write_text("\r\n".join(rows) + "\r\n")
    return str(p)


def test_catalog_read_permissive(spark, catalog_csv) -> None:
    cat = read_catalog(spark, catalog_csv)
    ok = valid_rows(cat)
    assert ok.count() == 6
    assert cat.filter(F.col("_corrupt_record").isNotNull()).count() == 1


def test_harvest_filters_and_templates(spark, catalog_csv) -> None:
    tasks = harvest_tasks(read_catalog(spark, catalog_csv), "hourly", NOW)
    got = {r.ID: r for r in tasks.collect()}
    # active=1 AND interval=hourly only: ids 1,2,3,4
    assert set(got) == {"1", "2", "3", "4"}
    assert got["2"].PATTERN == "*_202406.csv"
    # utc_offset=2 shifts the clock but not the date here
    assert got["3"].URL.endswith("direct_2024.bin")
    assert '"TYPE":"LINKS"' in got["1"].task_json


def test_downloader_end_to_end(spark, tmp_path, catalog_csv, remote) -> None:
    lake = str(tmp_path / "lake")
    manifest = str(tmp_path / "manifest")
    tasks = harvest_tasks(read_catalog(spark, catalog_csv), "hourly", NOW)

    out = run_downloader(spark, tasks, lake, manifest)

    landed = spark.read.parquet(lake)
    by_name = {r.file_name: r for r in landed.collect()}
    # LINKS page: 3 non-empty hrefs; FTP_FILES: 2 glob matches of 3
    # files; DIRECT: 1
    assert set(by_name) == {
        "prices_202406.csv",
        "rates_202406.csv",
        "readme.txt",
        "direct_2024.bin",
    }
    # FTP_FILES matched the glob, readme.txt excluded on that route
    routes = {(r.file_name, r.route) for r in landed.collect()}
    assert ("prices_202406.csv", "FTP_FILES") in routes
    assert ("readme.txt", "FTP_FILES") not in routes
    assert bytes(by_name["direct_2024.bin"].content) == b"\x00\x01payload"
    assert by_name["prices_202406.csv"].content_hash is not None

    # partition layout: one directory per route (pruning works)
    import os

    assert sorted(d for d in os.listdir(lake) if d.startswith("route=")) == [
        "route=FTP_FILES",
        "route=LINK",
        "route=LINKS_DIRECT",
    ]

    # error path: id 4's missing page -> quarantine row
    qrows = out["quarantine"].collect()
    assert any(r.ID == "4" and "missing.html" in r.URL for r in qrows)

    # catalog flag update: broken id -> active=2, persisted + re-readable
    broken = [r.ID for r in qrows]
    cat2 = flag_broken(valid_rows(read_catalog(spark, catalog_csv)), broken)
    cat_dir = str(tmp_path / "catalog_v2")
    write_catalog(cat2, cat_dir)
    re_read = read_catalog(spark, cat_dir, fmt="parquet")
    flags = {r.id: r.active for r in re_read.collect()}
    assert flags["4"] == 2 and flags["1"] == 1


def test_downloader_rerun_dedups_against_manifest(
    spark, tmp_path, catalog_csv
) -> None:
    lake = str(tmp_path / "lake")
    manifest = str(tmp_path / "manifest")
    tasks = harvest_tasks(read_catalog(spark, catalog_csv), "hourly", NOW)

    first = run_downloader(spark, tasks, lake, manifest)
    n_first = spark.read.parquet(lake).count()
    assert first["manifest"].count() == n_first

    # at-least-once redelivery: the same batch arrives again
    second = run_downloader(spark, tasks, lake, manifest)
    landed_again = second["landed"].count()
    assert landed_again == 0  # everything already in the manifest
    assert spark.read.parquet(lake).count() == n_first  # lake unchanged


def test_unknown_type_quarantined(spark, tmp_path) -> None:
    lake = str(tmp_path / "lake")
    msgs = spark.createDataFrame(
        [('{"ID":"9","URL":"file:///nope","TYPE":"WAT","PATTERN":"p","UTC":"0"}',)],
        ["task_json"],
    )
    out = run_downloader(spark, msgs, lake)
    q = out["quarantine"].collect()
    assert len(q) == 1 and q[0].REASON == "unknown TYPE: WAT"


def test_attempts_accumulate_then_dead_letter(spark, tmp_path) -> None:
    """The composed error path (reference handle_error +
    maxReceiveCount: failures retry with an accumulated attempt count,
    and stop retrying - dead-letter - at the bound)."""
    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "quarantine")
    msgs = spark.createDataFrame(
        [(f'{{"ID":"4","URL":"file://{tmp_path}/missing.html","TYPE":"LINKS",'
          '"PATTERN":"p","UTC":"0"}',)],
        ["task_json"],
    )

    out1 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    assert [r.attempts for r in out1["quarantine"].collect()] == [1]

    out2 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    assert [r.attempts for r in out2["quarantine"].collect()] == [2]

    # attempts exhausted: the task is gated, not retried - no new
    # quarantine row, and the unit surfaces on the dead-letter view
    out3 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    assert out3["quarantine"].count() == 0
    dlq = out3["dead_letter"].collect()
    assert dlq and all(r.ID == "4" for r in dlq)
    assert max(r.attempts for r in dlq) == 2


def test_catalog_flagging_is_composed(spark, tmp_path, catalog_csv) -> None:
    """run_downloader flags failing sources active=2 in the catalog
    itself (reference: data-downloader/data_downloader.py:26-58) - no
    caller composition."""
    cat_dir = str(tmp_path / "catalog_parquet")
    write_catalog(valid_rows(read_catalog(spark, catalog_csv)), cat_dir)
    tasks = harvest_tasks(read_catalog(spark, cat_dir, fmt="parquet"), "hourly", NOW)

    out = run_downloader(
        spark, tasks, str(tmp_path / "lake"), catalog_path=cat_dir
    )
    assert out["catalog"] is not None
    flags = {r.id: r.active for r in read_catalog(spark, cat_dir, fmt="parquet").collect()}
    assert flags["4"] == 2  # missing.html source flagged broken
    assert flags["1"] == 1  # healthy source untouched


def test_overwrite_route_replaces_not_duplicates(spark, tmp_path, remote) -> None:
    """LINKS_OVERWRITE re-fetches REPLACE the logical file (reference:
    each S3 put overwrites the object): the append log grows, but the
    current-state readers return exactly one row per (route, file)."""
    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        read_lake_current,
        read_manifest_current,
    )

    lake = str(tmp_path / "lake")
    manifest = str(tmp_path / "manifest")
    msgs = spark.createDataFrame(
        [(f'{{"ID":"8","URL":"file://{remote}/page.html","TYPE":"LINKS_OVERWRITE",'
          '"PATTERN":"p","UTC":"0"}',)],
        ["task_json"],
    )
    run_downloader(spark, msgs, lake, manifest)
    run_downloader(spark, msgs, lake, manifest)

    n_files = 3  # page.html carries 3 non-empty hrefs
    assert spark.read.parquet(lake).count() == 2 * n_files  # append log
    cur = read_lake_current(spark, lake)
    assert cur.count() == n_files  # logical view: one row per file
    assert read_manifest_current(spark, manifest).count() == n_files
    # the surviving row is the newest fetch
    ts = [r.fetched_at for r in spark.read.parquet(lake).collect()]
    assert {r.fetched_at for r in cur.collect()} == {max(ts)}


def test_href_extraction_bs4_fidelity(spark, tmp_path) -> None:
    """Unquoted values, single quotes, odd casing and whitespace around
    '=' all extract - what BeautifulSoup's find_all('a') returns for
    the same markup (reference: data-downloader/data_downloader.py:84-91)."""
    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        expand_link_tasks,
        route_tasks,
    )

    page = tmp_path / "messy.html"
    page.write_text(
        "<html><body>"
        '<a href="files/a.csv">double</a>'
        "<a href='files/b.csv'>single</a>"
        "<a href=files/c.csv>unquoted</a>"
        '<A HREF = "files/d.csv">case+space</A>'
        '<a class="x" href=files/e.csv rel=nofollow>attrs</a>'
        '<a data-href="/tracking" href="files/f.csv">decoy-attr</a>'
        '<a href="">empty</a>'
        "</body></html>"
    )
    tasks = route_tasks(
        spark.createDataFrame(
            [("1", f"file://{page}", "LINKS", "p", "0")],
            ["ID", "URL", "TYPE", "PATTERN", "UTC"],
        )
    )
    files, errs = expand_link_tasks(tasks)
    assert errs.count() == 0
    # f.csv, not /tracking: a data-href attribute must not satisfy the
    # href match (bs4 returns the real href for the same markup)
    assert sorted(r.file_name for r in files.collect()) == [
        "a.csv", "b.csv", "c.csv", "d.csv", "e.csv", "f.csv"
    ]


def test_href_extraction_lenient_ignores_commented_anchors(spark, tmp_path) -> None:
    """Differential fixture where the regex and a real HTML parser
    DISAGREE - anchors inside comments/CDATA, an unbalanced quote -
    and the lenient pipeline branch must match the parser (reference
    behavior: BeautifulSoup, data-downloader/data_downloader.py:83-91),
    not the regex."""
    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        _hrefs_lenient,
        expand_link_tasks,
        route_tasks,
    )

    page = tmp_path / "malformed.html"
    page.write_text(
        "<html><body>\n"
        '<!-- <a href="commented.csv">commented-out nav</a> -->\n'
        '<a href="real1.csv">one</a>\n'
        "<a href='real2.csv'>two</a>\n"
        "<A HREF=real3.csv>three</A>\n"
        '<![CDATA[ <a href="cdata.csv">x</a> ]]>\n'
        "</body></html>"
    )
    tasks = route_tasks(
        spark.createDataFrame(
            [("1", f"file://{page}", "LINKS", "p", "0")],
            ["ID", "URL", "TYPE", "PATTERN", "UTC"],
        )
    )

    # precondition: the fast path really does disagree on this page
    # (it reads through the comment and the CDATA block)
    regex_files, _ = expand_link_tasks(tasks)
    regex_names = sorted(r.file_name for r in regex_files.collect())
    assert "commented.csv" in regex_names and "cdata.csv" in regex_names

    lenient_files, errs = expand_link_tasks(tasks, html_parser="lenient")
    assert errs.count() == 0
    assert sorted(r.file_name for r in lenient_files.collect()) == [
        "real1.csv", "real2.csv", "real3.csv"
    ]
    # the pipeline branch and the parser primitive agree exactly
    assert _hrefs_lenient(page.read_text()) == [
        "real1.csv", "real2.csv", "real3.csv"
    ]

    import pytest

    with pytest.raises(ValueError, match="unknown html_parser"):
        expand_link_tasks(tasks, html_parser="soup")


def test_staging_lifecycle_in_processing_done(spark, tmp_path) -> None:
    """Poll-mode staging hop in/ -> processing/ -> done/ (reference:
    market_data_downloader_create_folders.py:20-22): claim moves the
    batch, success lands it in done/, a crash leaves it in processing/."""
    import os

    from etl_marketdata_downloader_archived_spark.streaming.staging import (
        process_staged,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "t1.json").write_text("{}")
    (in_dir / "t2.json").write_text("{}")

    seen = []
    claimed = process_staged(
        spark, str(in_dir), str(tmp_path / "processing"), str(tmp_path / "done"),
        lambda names: seen.extend(sorted(names)),
    )
    assert sorted(claimed) == seen == ["t1.json", "t2.json"]
    assert os.listdir(in_dir) == []
    assert os.listdir(tmp_path / "processing") == []
    assert sorted(os.listdir(tmp_path / "done")) == ["t1.json", "t2.json"]

    # crash mid-process: claimed files stay in processing/
    (in_dir / "t3.json").write_text("{}")

    def boom(names):
        raise RuntimeError("crash")

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        process_staged(
            spark, str(in_dir), str(tmp_path / "processing"), str(tmp_path / "done"),
            boom,
        )
    assert os.listdir(tmp_path / "processing") == ["t3.json"]

    # a later successful round must NOT sweep the crashed leftover into
    # done/ unprocessed - only its own claim moves
    (in_dir / "t4.json").write_text("{}")
    round2 = []
    process_staged(
        spark, str(in_dir), str(tmp_path / "processing"), str(tmp_path / "done"),
        lambda names: round2.extend(names),
    )
    assert round2 == ["t4.json"]
    assert os.listdir(tmp_path / "processing") == ["t3.json"]  # still held
    assert sorted(os.listdir(tmp_path / "done")) == ["t1.json", "t2.json", "t4.json"]


def test_compact_quarantine_preserves_attempt_accumulation(spark, tmp_path) -> None:
    """The generic log compactor works on the quarantine log too: after
    compaction the latest (= max-attempts) row survives, and the next
    failing run still increments from it."""
    from etl_marketdata_downloader_archived_spark.io import compact_lake

    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "quarantine")
    msgs = spark.createDataFrame(
        [(f'{{"ID":"4","URL":"file://{tmp_path}/missing.html","TYPE":"LINKS",'
          '"PATTERN":"p","UTC":"0"}',)],
        ["task_json"],
    )
    run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=9)
    run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=9)
    assert spark.read.parquet(qdir).count() == 2

    compact_lake(spark, qdir, keys=("ID", "URL"), ts_col="failed_at", partition_cols=())
    rows = spark.read.parquet(qdir).collect()
    assert len(rows) == 1 and rows[0].attempts == 2

    out3 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=9)
    assert [r.attempts for r in out3["quarantine"].collect()] == [3]


# --- property tests: parser agreement over generated malformed markup ---

try:
    import bs4  # noqa: F401

    _HAS_BS4 = True
except ImportError:
    _HAS_BS4 = False

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_URLS = st.text(alphabet="abcz0123456789/._-:", min_size=1, max_size=16)
_NOISE = st.text(alphabet="xy <>&\"'=", max_size=8)
# malformed-markup fragment grammar: the shapes where a naive regex
# and a real HTML tokenizer disagree (comments, CDATA, unclosed
# quotes, nested angles, decoy attributes, odd casing/whitespace)
_FRAGMENT = st.one_of(
    st.builds('<a href="{}">t</a>'.format, _URLS),
    st.builds("<a href='{}'>t</a>".format, _URLS),
    st.builds("<a href={}>t</a>".format, _URLS),
    st.builds('<A HREF = "{}">T</A>'.format, _URLS),
    st.builds('<a class="c" href={} rel=nofollow>t</a>'.format, _URLS),
    st.builds('<a data-href="{}">decoy</a>'.format, _URLS),
    st.builds('<!-- <a href="{}">hidden</a> -->'.format, _URLS),
    st.builds('<![CDATA[ <a href="{}">c</a> ]]>'.format, _URLS),
    st.builds('<a href="{}>unclosed quote</a>'.format, _URLS),
    st.builds("<div <span>> <a href={}>nested</a>".format, _URLS),
    st.builds("<p>{}</p>".format, _NOISE),
    st.just("<a>no href</a>"),
    # attribute-layer corners: minimized href (bs4 -> ''), duplicated
    # href (bs4 default REPLACE -> last wins)
    st.just("<a href>bare</a>"),
    st.builds('<a href="{}" href="{}">dup</a>'.format, _URLS, _URLS),
    st.builds("<a href href={}>bare-then-value</a>".format, _URLS),
)
_PAGE = st.lists(_FRAGMENT, max_size=10).map(
    lambda fs: "<html><body>" + "".join(fs) + "</body></html>"
)


@pytest.mark.skipif(not _HAS_BS4, reason="bs4 not installed here")
@given(page=_PAGE)
@settings(max_examples=250, deadline=None)
def test_stdlib_parser_matches_bs4_on_malformed_markup(page) -> None:
    """The lenient branch's stdlib fallback must agree with
    BeautifulSoup (the reference's parser,
    data-downloader/data_downloader.py:83-91) on every generated
    malformed page - unclosed quotes, commented/CDATA anchors, nested
    angles, decoy attributes. Runs wherever bs4 is importable; the
    fallback wraps the same tokenizer, so disagreement means the
    wrapper broke fidelity."""
    from bs4 import BeautifulSoup

    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        _hrefs_stdlib,
    )

    want = [
        a["href"]
        for a in BeautifulSoup(page, "html.parser").find_all("a", href=True)
    ]
    assert _hrefs_stdlib(page) == want


def test_stdlib_parser_matches_committed_bs4_corpus() -> None:
    """The bs4-agreement differential EXECUTES here (no skip): replay
    the committed expectation corpus (tests/fixtures/bs4_corpus.json,
    400 deterministic grammar pages + the DIRECTED corner classes)
    against the stdlib extraction.

    Provenance semantics, asserted below: ``oracle: bs4-<version>``
    means the expectations are real-BeautifulSoup ground truth (full
    fidelity coverage); ``oracle: semantics-model`` means they come
    from tools/gen_bs4_corpus.py's documented-semantics model - every
    rule cited to public html.parser/Beautiful Soup documentation,
    every directed entry carrying its per-rule rationale - which
    makes this a doc-auditable regression pin, NOT a certificate of
    bs4 agreement. Regenerate wherever real bs4 is importable (same
    seed, same pages) to upgrade the provenance; any diff from the
    committed expectations is then a genuine fidelity bug."""
    import json
    import os

    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        _hrefs_stdlib,
    )

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "bs4_corpus.json"
    )
    corpus = json.load(open(path))
    assert corpus["oracle"]  # provenance must be recorded
    bs4_stamped = corpus["oracle"].startswith("bs4-")
    assert bs4_stamped or corpus["oracle"] == "semantics-model"
    assert len(corpus["entries"]) >= 400
    # the directed corner classes must all be present, each with its
    # written doc-citation rationale (the audit trail that replaces
    # ground truth while the oracle is the model)
    directed = {
        e["class"]: e
        for e in corpus["entries"]
        if e["class"] != "random-grammar"
    }
    for cls in (
        "charref-attr-quoted",
        "charref-attr-numeric",
        "charref-attr-unquoted",
        "charref-attr-no-semicolon",
        "nested-anchor",
        "implicit-close-block",
        "uppercase-tag-attr",
        "uppercase-dup-attr",
        "minimized-href",
        "empty-href",
        "base-link-area-decoys",
        "script-style-rawtext",
        "self-closing-anchor",
        "comment-cdata-hidden",
        "data-href-decoy",
    ):
        assert cls in directed, f"missing directed corner: {cls}"
        assert bs4_stamped or directed[cls].get("rationale"), cls
    for entry in corpus["entries"]:
        assert _hrefs_stdlib(entry["page"]) == entry["hrefs"], entry["page"]


@given(data=st.data())
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lenient_pipeline_matches_local_parser_property(spark, data) -> None:
    """The Arrow-batched mapInPandas plumbing of the lenient branch
    must emit exactly what the local parser primitive emits, per page
    and in order, over generated malformed pages (5 examples x 50
    pages = 250 pages) - so batching, schema, and row fan-out cannot
    drop or reorder hrefs on adversarial input."""
    from etl_marketdata_downloader_archived_spark.plans.downloader import (
        _extract_links_lenient,
        _hrefs_lenient,
    )

    pages = data.draw(st.lists(_PAGE, min_size=50, max_size=50))
    rows = [
        (str(i), f"http://host/{i}", "LINKS", "p", page, None)
        for i, page in enumerate(pages)
    ]
    ok = spark.createDataFrame(
        rows,
        "ID string, URL string, TYPE string, PATTERN string, "
        "body string, error string",
    )
    got: dict[str, list[str]] = {str(i): [] for i in range(len(pages))}
    links = _extract_links_lenient(ok).collect()
    for r in links:
        got[r.ID].append(r.href)
    want = {str(i): _hrefs_lenient(p) for i, p in enumerate(pages)}
    assert got == want

def test_malformed_json_accumulates_and_dead_letters(spark, tmp_path) -> None:
    """Review finding: a malformed-JSON message decodes to NULL
    ID/URL, and the NULL-unsafe attempt/DLQ joins re-quarantined it
    at attempts=1 forever. The body-hash sentinel key gives the
    redelivered message a stable retry identity: attempts accumulate
    across runs and the message dead-letters at max_attempts exactly
    like a keyed failure."""
    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "quarantine")
    msgs = spark.createDataFrame([("{this is not json",)], ["task_json"])

    out1 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    q1 = out1["quarantine"].collect()
    assert [r.attempts for r in q1] == [1]
    assert q1[0].ID.startswith("malformed:")
    assert "malformed or TYPE-less task JSON" in q1[0].REASON

    out2 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    assert [r.attempts for r in out2["quarantine"].collect()] == [2]

    out3 = run_downloader(spark, msgs, lake, quarantine_dir=qdir, max_attempts=2)
    assert out3["quarantine"].count() == 0
    dlq = out3["dead_letter"].collect()
    assert dlq and all(r.ID.startswith("malformed:") for r in dlq)
    assert max(r.attempts for r in dlq) == 2
