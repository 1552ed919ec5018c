"""Round-14 battery corners: built-in DataSketches HLL contract and
from_xml decode behavior (the parity rows hll_datasketches_cert /
from_xml_cert carry the cross-engine certification; these pin the
semantics the oracle can't reach)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hll_builtin_contract_known_cardinalities(spark) -> None:
    """Independent differential for the hll_datasketches_cert legs on
    KNOWN sets: small cardinalities estimate exactly (sparse mode),
    disjoint-set union estimates the true union, and re-merging the
    same sketch never moves a union's estimate."""
    a = spark.range(0, 500).select(F.col("id").alias("v"))
    b = spark.range(400, 900).select(F.col("id").alias("v"))  # |a u b| = 900

    est_a = a.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).collect()[0].e
    assert est_a == 500  # sparse mode: exact at small n

    ska = a.agg(F.hll_sketch_agg("v").alias("sk"))
    skb = b.agg(F.hll_sketch_agg("v").alias("sk"))
    est_u = (
        ska.unionByName(skb)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0].e
    )
    assert abs(est_u - 900) <= 0.1 * 900  # merged estimate ~ truth

    est_u3 = (
        ska.unionByName(skb)
        .unionByName(skb)  # re-append one side (at-least-once replay)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0].e
    )
    assert est_u3 == est_u  # register max-merge: replays are free


def test_from_xml_corners(spark) -> None:
    """from_xml decode corners the oracle row can't carry: attributes
    vs elements, repeated-element arrays (1 and many), malformed input
    and type mismatches degrade to NULL fields (PERMISSIVE), never an
    exception."""
    rows = [
        (1, '<o id="7" st="F"><p>12.50</p><t>a</t></o>'),        # 1 tag
        (2, '<o id="8" st="P"><p>1.00</p><t>a</t><t>b</t></o>'),  # 2 tags
        (3, '<o id="9" st="F"><p>oops</p><t>a</t></o>'),          # bad type
        (4, '<o id="10" st="F"><p>3.00</p><t>a</t>'),             # unclosed
        (5, "not xml at all"),                                     # garbage
    ]
    df = spark.createDataFrame(rows, ["k", "x"])
    parsed = df.select(
        "k",
        F.from_xml(
            "x", "_id BIGINT, _st STRING, p DECIMAL(12,2), t ARRAY<STRING>"
        ).alias("j"),
    ).select("k", "j.*")
    got = {r.k: r for r in parsed.collect()}

    assert got[1]._id == 7 and got[1]._st == "F"
    assert str(got[1].p) == "12.50" and list(got[1].t) == ["a"]
    assert list(got[2].t) == ["a", "b"]
    # type mismatch: only the offending field nulls, siblings survive
    assert got[3].p is None and got[3]._id == 9
    # malformed rows parse to null fields, never raise
    assert got[5].p is None and got[5]._id is None
    assert len(got) == 5
