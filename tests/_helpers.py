"""Shared test helpers."""

from __future__ import annotations

import math


def half_up(x: float) -> int:
    """Spark F.round(double) / DuckDB round: HALF_UP = ties away from
    ZERO - floor(x+0.5) alone gets -0.5 wrong (0, not -1), so the
    negative branch mirrors through ceil."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
