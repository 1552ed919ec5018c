"""Pluggable fetch transport for the download pipeline's fetch stages.

The reference fetches with ``urllib.request.urlopen`` for HTTP pages,
direct links, and FTP listings/files (reference:
data-downloader/data_downloader.py:83, :132, :152, :195). This module
is the single place transport happens in the new engine; everything
above it is DataFrame logic.

Transports:
- ``file://`` - local filesystem, used by tests (SURVEY.md section 5.2:
  "local file:// transport for tests"). A URL ending in ``/`` is a
  directory and fetches an ``ls -l``-style listing, mirroring what an
  FTP LIST returns to the reference.
- ``http(s)://`` / ``ftp://`` - urllib, only when explicitly allowed
  (``allow_network=True``); this environment has no egress, and a
  100 TB engine wants fetch boundaries explicit anyway.

These helpers are called from ``mapInPandas`` partitions - plain
Python by design (I/O, not compute; Arrow batching amortizes the
Python boundary, and partition-level calls reuse connections).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse
from urllib.request import urlopen


class TransportError(RuntimeError):
    """Fetch failure - becomes a quarantine row, never a crashed task
    (the reference's error path: data-downloader/data_downloader.py:26-58)."""


def _file_path(url: str) -> str:
    p = urlparse(url)
    return p.path


def fetch_bytes(url: str, allow_network: bool = False, timeout: float = 30.0) -> bytes:
    """Fetch one URL's payload."""
    scheme = urlparse(url).scheme
    try:
        if scheme == "file":
            with open(_file_path(url), "rb") as f:
                return f.read()
        if scheme in ("http", "https", "ftp"):
            if not allow_network:
                raise TransportError(f"network transport disabled for {url}")
            with urlopen(url, timeout=timeout) as r:  # noqa: S310 - gated above
                return r.read()
        raise TransportError(f"unsupported scheme {scheme!r} in {url}")
    except TransportError:
        raise
    except Exception as exc:  # noqa: BLE001 - every IO failure is a task failure
        raise TransportError(f"fetch failed for {url}: {exc}") from exc


def fetch_text(url: str, allow_network: bool = False, encoding: str = "utf-8") -> str:
    return fetch_bytes(url, allow_network).decode(encoding)


def fetch_listing(url: str, allow_network: bool = False) -> str:
    """Fetch a directory listing as CRLF-joined ``ls -l``-style lines -
    the shape the reference's FTP branch parses
    (data-downloader/data_downloader.py:152-154: split('\\r\\n'),
    last whitespace token is the file name).
    """
    scheme = urlparse(url).scheme
    if scheme == "file":
        d = _file_path(url)
        try:
            names = sorted(os.listdir(d))
        except OSError as exc:
            raise TransportError(f"listing failed for {url}: {exc}") from exc
        lines = [
            f"-rw-r--r--   1 ftp      ftp      {os.path.getsize(os.path.join(d, n)):>10} "
            f"Jan 01 00:00 {n}"
            for n in names
            if os.path.isfile(os.path.join(d, n))
        ]
        # trailing CRLF: the reference drops the final empty element
        # with [0:-1]; we produce the same wire shape
        return "\r\n".join(lines) + "\r\n"
    return fetch_text(url, allow_network)
