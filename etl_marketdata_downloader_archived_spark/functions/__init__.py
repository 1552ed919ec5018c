"""Scalar helper function library.

Pure column-expression builders (JVM-side, codegen-friendly) for the
string/date/url/glob semantics the reference implements row-at-a-time
in Python. No Python UDFs here - everything compiles to Catalyst
expressions so it stays inside whole-stage codegen.
"""

from .globs import glob_match, glob_to_regex
from .templates import TEMPLATE_KEYS, expand_template
from .urls import last_segment, url_join

__all__ = [
    "glob_to_regex",
    "glob_match",
    "expand_template",
    "TEMPLATE_KEYS",
    "url_join",
    "last_segment",
]
