"""URL column helpers.

Re-express the reference's per-row ``urllib.parse.urljoin`` and
``url.split('/')[-1]`` (reference: data-downloader/data_downloader.py:92-93,
:163) as Catalyst expressions. ``url_join`` covers the cases the
reference actually encounters: absolute hrefs, root-relative hrefs, and
document-relative hrefs (full RFC 3986 resolution with ../ handling
would need a UDF; the downloader's inputs never produce those).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ABS = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
_HOST = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)"


def url_join(base: Column | str, href: Column | str) -> Column:
    """Resolve ``href`` against ``base`` (absolute | root-relative |
    document-relative)."""
    b = F.col(base) if isinstance(base, str) else base
    h = F.col(href) if isinstance(href, str) else href
    scheme_host = F.regexp_extract(b, _HOST, 1)
    base_dir = F.regexp_replace(b, "[^/]*$", "")  # strip trailing segment
    return (
        F.when(h.rlike(_ABS), h)
        .when(h.startswith("/"), F.concat(scheme_host, h))
        .otherwise(F.concat(base_dir, h))
    )


def last_segment(url: Column | str) -> Column:
    """Last path segment - the landed file name
    (``file_url.split('/')[-1]``)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.element_at(F.split(c, "/"), -1)


def last_ws_token(line: Column | str) -> Column:
    """Last whitespace-separated token - filename column of an
    ``ls -l``-style FTP listing line
    (reference: data-downloader/data_downloader.py:154)."""
    c = F.col(line) if isinstance(line, str) else line
    return F.element_at(F.split(c, r"\s+"), -1)
