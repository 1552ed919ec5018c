"""operators.fuzzy: deletion-variant edit-distance join.

Completeness vs brute force is also parity-certified (tools/parity.py
fuzzy_join, brute-force DuckDB oracle); here: semantics + randomized
differential vs a stdlib DP oracle.
"""

from __future__ import annotations

import itertools
import random

import pytest

from etl_marketdata_downloader_archived_spark.operators.fuzzy import (
    edit_distance_join,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_known_pairs(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "kitte"),
            (5, "kitten"), (6, "xyz"), (7, "")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted((r.id_a, r.id_b, r.dist)
                 for r in edit_distance_join(df, "id", "s").collect())
    assert got == [(1, 2, 1), (1, 4, 1), (1, 5, 0), (2, 3, 1), (2, 5, 1),
                   (4, 5, 1)]


def test_randomized_differential(spark):
    rng = random.Random(7)
    alpha = "ab"  # tiny alphabet -> dense near-matches
    rows = [(i, "".join(rng.choice(alpha) for _ in range(rng.randint(0, 6))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted((r.id_a, r.id_b, r.dist)
                 for r in edit_distance_join(df, "id", "s").collect())
    want = sorted(
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 1
    )
    assert got == want  # complete AND exact, incl. empty strings


def test_rejects_unsupported_distance(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_join(df, "id", "s", max_dist=2)
