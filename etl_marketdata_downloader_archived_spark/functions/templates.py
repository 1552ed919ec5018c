"""Date-template expansion for URLs / patterns.

The reference substitutes ``{year}{month}{lastmonth}{day}{hour}{minute}``
into catalog URLs and patterns with ``str.format`` against a
timezone-shifted clock (reference: data-harvester/data_harvester.py:32-35).

Divergence from the reference (intentional, documented): the reference
computes ``lastmonth`` as ``'0' + str(int(month) - 1)`` which yields
'00' in January and '010'/'011' after October
(data-harvester/data_harvester.py:34); this engine uses calendar month
arithmetic (``add_months(ts, -1)``) - the evident intent.

All expansion is chained Catalyst ``replace`` expressions on a
timestamp column - deterministic given the clock column, vectorized,
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TEMPLATE_KEYS = ("year", "month", "lastmonth", "day", "hour", "minute")


def _parts(ts: Column) -> dict[str, Column]:
    return {
        "year": F.date_format(ts, "yyyy"),
        "month": F.date_format(ts, "MM"),
        "lastmonth": F.date_format(F.add_months(ts, -1), "MM"),
        "day": F.date_format(ts, "dd"),
        "hour": F.date_format(ts, "HH"),
        "minute": F.date_format(ts, "mm"),
    }


def expand_template(template: Column | str, ts: Column) -> Column:
    """Expand ``{year}/{month}/...`` placeholders in ``template``
    against the clock column ``ts``."""
    c = F.col(template) if isinstance(template, str) else template
    for key, val in _parts(ts).items():
        c = F.replace(c, F.lit("{" + key + "}"), val)
    return c


def shifted_clock(ts: Column, utc_offset_hours: Column) -> Column:
    """The reference's timezone-shifted wall clock:
    ``utcnow() + timedelta(hours=utc_offset)`` per row
    (data-harvester/data_harvester.py:32-33)."""
    return ts + F.make_dt_interval(F.lit(0), utc_offset_hours.cast("int"), F.lit(0), F.lit(0))
