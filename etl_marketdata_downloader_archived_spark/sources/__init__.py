"""Sources: the mutable source catalog and the pluggable fetch
transport used by the download pipeline's fetch stages."""

from .catalog import flag_broken, read_catalog, write_catalog
from .transport import fetch_bytes, fetch_listing, fetch_text

__all__ = [
    "read_catalog",
    "write_catalog",
    "flag_broken",
    "fetch_bytes",
    "fetch_text",
    "fetch_listing",
]
