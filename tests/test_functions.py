"""Unit + property tests for the scalar helper library.

Local oracles per SURVEY.md section 5.2: random globs vs ``fnmatch``,
template expansion vs ``str.format``, url resolution vs
``urllib.parse.urljoin``.
"""

from __future__ import annotations

import fnmatch
import re
from datetime import datetime, timedelta
from urllib.parse import urljoin

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_marketdata_downloader_archived_spark.functions.globs import (
    glob_match,
    glob_to_regex,
)
from etl_marketdata_downloader_archived_spark.functions.templates import (
    expand_template,
    shifted_clock,
)
from etl_marketdata_downloader_archived_spark.functions.urls import (
    last_segment,
    last_ws_token,
    url_join,
)

NAME_CHARS = st.text(
    alphabet="abcXYZ019._-", min_size=0, max_size=12
)
GLOB_CHARS = st.text(
    alphabet="abcXYZ019._-*?", min_size=0, max_size=10
)


# ------------------------------------------------------------ glob


@given(name=NAME_CHARS, pattern=GLOB_CHARS)
@settings(max_examples=300, deadline=None)
def test_glob_to_regex_matches_fnmatch(name: str, pattern: str) -> None:
    """Pure-python check: our portable regex == fnmatch semantics."""
    expected = fnmatch.fnmatchcase(name, pattern)
    # the regex is anchored (^...$); fullmatch keeps those as no-ops
    got = re.fullmatch(glob_to_regex(pattern), name) is not None
    assert got == expected, f"name={name!r} pattern={pattern!r} re={glob_to_regex(pattern)!r}"


@given(name=NAME_CHARS, inner=st.text(alphabet="abcXYZ019", min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_glob_charclass(name: str, inner: str) -> None:
    for pat in (f"[{inner}]*", f"[!{inner}]*"):
        expected = fnmatch.fnmatchcase(name, pat)
        got = re.fullmatch(glob_to_regex(pat), name) is not None
        assert got == expected, f"name={name!r} pat={pat!r}"


def test_glob_match_column(spark) -> None:
    df = spark.createDataFrame(
        [("report_2024.csv",), ("report.txt",), ("img.png",)], ["name"]
    )
    out = df.filter(glob_match("name", "report*.csv")).collect()
    assert [r.name for r in out] == ["report_2024.csv"]


def test_glob_unterminated_bracket_literal() -> None:
    # fnmatch treats an unterminated '[' literally
    assert fnmatch.fnmatchcase("a[b", "a[b")
    assert re.fullmatch(glob_to_regex("a[b"), "a[b")


# ------------------------------------------------------------ templates


def test_expand_template_matches_str_format(spark) -> None:
    tpl = "http://x.com/{year}/{month}/{day}/f_{hour}{minute}_{lastmonth}.csv"
    cases = [
        datetime(2024, 1, 15, 9, 5),
        datetime(2024, 11, 30, 23, 59),
        datetime(2023, 12, 1, 0, 0),
        datetime(2024, 3, 31, 12, 30),
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], ["i", "ts"])
    got = {
        r.i: r.url
        for r in df.select(
            "i", expand_template(F.lit(tpl), F.col("ts")).alias("url")
        ).collect()
    }
    for i, t in enumerate(cases):
        # calendar-correct lastmonth (intentional divergence from the
        # reference's string-math bug, SURVEY.md section 7)
        last = t.replace(day=1) - timedelta(days=1)
        expected = tpl.format(
            year=t.strftime("%Y"),
            month=t.strftime("%m"),
            day=t.strftime("%d"),
            hour=t.strftime("%H"),
            minute=t.strftime("%M"),
            lastmonth=last.strftime("%m"),
        )
        assert got[i] == expected, f"ts={t}"


def test_shifted_clock(spark) -> None:
    df = spark.createDataFrame(
        [(datetime(2024, 6, 1, 12, 0), 5), (datetime(2024, 6, 1, 12, 0), -3)],
        ["ts", "off"],
    )
    out = df.select(shifted_clock(F.col("ts"), F.col("off")).alias("s")).collect()
    assert out[0].s == datetime(2024, 6, 1, 17, 0)
    assert out[1].s == datetime(2024, 6, 1, 9, 0)


# ------------------------------------------------------------ urls


def test_url_join_matches_urljoin(spark) -> None:
    base = "http://example.com/dir/sub/index.html"
    hrefs = [
        "http://abs.example.org/f.csv",
        "ftp://host/f.bin",
        "/root-rel/f.csv",
        "doc-rel/f.csv",
        "f.csv",
    ]
    df = spark.createDataFrame([(h,) for h in hrefs], ["href"])
    got = [
        r.u
        for r in df.select(
            url_join(F.lit(base), F.col("href")).alias("u")
        ).collect()
    ]
    expected = [urljoin(base, h) for h in hrefs]
    assert got == expected


def test_last_segment_and_token(spark) -> None:
    df = spark.createDataFrame(
        [("http://h/a/b/file.csv", "-rw-r--r-- 1 u g 42 Jan 1 00:00 data.zip")],
        ["url", "line"],
    )
    row = df.select(
        last_segment("url").alias("seg"), last_ws_token("line").alias("tok")
    ).collect()[0]
    assert row.seg == "file.csv"
    assert row.tok == "data.zip"
