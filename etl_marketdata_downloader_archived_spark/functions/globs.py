"""fnmatch-style glob matching as a Catalyst expression.

The reference filters FTP listings with ``fnmatch.filter(files, PATTERN)``
(reference: data-downloader/data_downloader.py:155). Re-expressed as a
glob->regex translation applied via ``rlike`` so the filter runs
JVM-side (and can even push down for prefix-only globs via LIKE).

Supported glob syntax (the fnmatch subset): ``*``, ``?``, ``[seq]``,
``[!seq]``. The produced regex is anchored and avoids lookarounds so it
is portable across Java regex and RE2 (DuckDB) - required for the
differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPECIAL = set(".^$+{}()|\\")


def glob_to_regex(pattern: str) -> str:
    """Translate a glob to an anchored regex string.

    Mirrors fnmatch.translate semantics for *, ?, [seq], [!seq] but
    emits a plain portable regex (fnmatch.translate embeds Python-only
    inline flags / \\Z, which DuckDB's RE2 rejects).
    """
    out: list[str] = ["^"]
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        i += 1
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = i
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append("\\[")  # unterminated '[' matches literally
            else:
                inner = pattern[i:j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                inner = inner.replace("\\", "\\\\")
                out.append(f"[{inner}]")
                i = j + 1
        elif ch in _SPECIAL:
            out.append("\\" + ch)
        else:
            out.append(ch)
    out.append("$")
    return "".join(out)


def glob_match(col: Column | str, pattern: str) -> Column:
    """Boolean column: does ``col`` match the glob ``pattern``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(glob_to_regex(pattern))
