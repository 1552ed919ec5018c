"""Randomized relational differential fuzzer.

The parity harness certifies a FIXED battery of hand-written queries;
this generates filter/join/aggregate specs, builds each one twice -
as a Spark DataFrame plan AND as the equivalent SQL text - and
compares Spark's result against DuckDB running the SQL over the same
parquet files (row count + canonical value multiset, tools/parity.py's
exact comparator). A DataFrame-API construct that silently diverges
from its SQL meaning (null ordering, cast, predicate translation,
aggregate typing) fails here on inputs nobody thought to hand-write.

Determinism guards baked into the grammar: no LIMIT without total
order, no float-sum aggregates except over integral-valued columns
(l_quantity is 1..50 integers in doubles; sums stay exact in IEEE for
any accumulation order at this scale), no NULL-bearing columns (TPC-H
base columns are NOT NULL by spec), group keys restricted to
low-cardinality columns so result sets stay small.
"""

from __future__ import annotations

import sys

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")
from parity import TABLES, row_multiset  # noqa: E402

SF = "/root/testdata/sf0.001"

# (table, column) -> sampled literal domain; numeric ops apply to
# numeric columns, equality to strings
_NUM_COLS = {
    "lineitem": {
        "l_orderkey": [1, 3000, 15000],
        "l_partkey": [50, 100, 180],
        "l_suppkey": [2, 5, 9],
        "l_linenumber": [1, 3, 6],
        "l_quantity": [10.0, 25.0, 45.0],
    },
    "orders": {
        "o_orderkey": [1, 3000, 15000],
        "o_custkey": [10, 75, 140],
        "o_totalprice": [50000.0, 150000.0],
    },
    "customer": {
        "c_custkey": [10, 75, 140],
        "c_nationkey": [3, 11, 22],
    },
}
_STR_COLS = {
    "lineitem": {
        "l_returnflag": ["A", "N", "R"],
        "l_linestatus": ["F", "O"],
    },
    "orders": {
        "o_orderstatus": ["F", "O", "P"],
        "o_orderpriority": ["1-URGENT", "3-MEDIUM", "5-LOW"],
    },
    "customer": {
        "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
    },
}
_GROUP_COLS = {
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_nationkey", "c_mktsegment"],
}
# exact-sum-safe numeric columns (integral values / integer types)
_SUM_COLS = {
    "lineitem": ["l_quantity", "l_suppkey"],
    "orders": ["o_custkey"],
    "customer": ["c_nationkey"],
}
_JOINS = {
    # base table -> (other table, left key, right key)
    "lineitem": ("orders", "l_orderkey", "o_orderkey"),
    "orders": ("customer", "o_custkey", "c_custkey"),
}
_NUM_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def _spec(draw):
    table = draw(st.sampled_from(["lineitem", "orders", "customer"]))
    joined = table in _JOINS and draw(st.booleans())
    tables = [table] + ([_JOINS[table][0]] if joined else [])
    preds = []
    for _ in range(draw(st.integers(0, 2))):
        t = draw(st.sampled_from(tables))
        if draw(st.booleans()):
            col = draw(st.sampled_from(sorted(_NUM_COLS[t])))
            op = draw(st.sampled_from(_NUM_OPS))
            val = draw(st.sampled_from(_NUM_COLS[t][col]))
        else:
            col = draw(st.sampled_from(sorted(_STR_COLS[t])))
            op = draw(st.sampled_from(["=", "<>"]))
            val = draw(st.sampled_from(_STR_COLS[t][col]))
        preds.append((col, op, val))
    group = None
    if draw(st.booleans()):
        gt = draw(st.sampled_from(tables))
        keys = draw(
            st.lists(
                st.sampled_from(_GROUP_COLS[gt]),
                min_size=1,
                max_size=2,
                unique=True,
            )
        )
        sum_t = draw(st.sampled_from(tables))
        sum_col = draw(st.sampled_from(_SUM_COLS[sum_t]))
        group = (keys, sum_col)
    else:
        # plain scan: project a bounded column set so multisets stay
        # comparable and small
        cols = sorted(_NUM_COLS[table])[:2] + sorted(_STR_COLS[table])[:1]
        group = None, cols
    return {"table": table, "joined": joined, "preds": preds, "group": group}


def _lit_sql(v):
    return f"'{v}'" if isinstance(v, str) else repr(v)


def _build(spark, spec):
    """Return (spark_df, sql_text) for one spec - the same logical
    query expressed through both front ends."""
    t = spec["table"]
    df = spark.read.parquet(f"{SF}/{t}.parquet")
    from_sql = t
    if spec["joined"]:
        other, lk, rk = _JOINS[t]
        odf = spark.read.parquet(f"{SF}/{other}.parquet")
        df = df.join(odf, F.col(lk) == F.col(rk))
        from_sql = f"{t} JOIN {other} ON {lk} = {rk}"
    where = []
    for col, op, val in spec["preds"]:
        sdf_op = {"=": "==", "<>": "!="}.get(op, op)
        df = df.filter(f"{col} {sdf_op} {_lit_sql(val)}")
        where.append(f"{col} {op} {_lit_sql(val)}")
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    g = spec["group"]
    if g is not None and g[0] is not None:
        keys, sum_col = g
        df = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(sum_col).alias("s"),
            F.min(sum_col).alias("mn"),
            F.max(sum_col).alias("mx"),
        )
        sql = (
            f"SELECT {', '.join(keys)}, count(*) AS cnt, "
            f"CAST(sum({sum_col}) AS "
            f"{'DOUBLE' if sum_col in ('l_quantity',) else 'BIGINT'}) AS s, "
            f"min({sum_col}) AS mn, max({sum_col}) AS mx "
            f"FROM {from_sql}{where_sql} GROUP BY {', '.join(keys)}"
        )
    else:
        cols = g[1]
        df = df.select(*cols)
        sql = f"SELECT {', '.join(cols)} FROM {from_sql}{where_sql}"
    return df, sql


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    yield con
    con.close()


@given(spec=_spec())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dataframe_plan_matches_sql_on_duckdb(spark, ddb, spec) -> None:
    df, sql = _build(spark, spec)
    s_rows = df.collect()
    s_cols = df.columns
    d = ddb.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    assert len(s_rows) == len(d_rows), (sql, len(s_rows), len(d_rows))
    assert sorted(s_cols) == sorted(d_cols), sql
    assert row_multiset(s_cols, s_rows) == row_multiset(d_cols, d_rows), sql


# --- window-function fuzzing: frames, ties, ordering semantics ---

_WIN = {
    "lineitem": {
        "part": ["l_returnflag", "l_linestatus"],
        "tie": ["l_orderkey", "l_linenumber"],  # unique per row
        "val": "l_quantity",
    },
    "orders": {
        "part": ["o_orderstatus", "o_orderpriority"],
        "tie": ["o_orderkey"],
        "val": "o_custkey",
    },
}


@st.composite
def _win_spec(draw):
    t = draw(st.sampled_from(sorted(_WIN)))
    cfg = _WIN[t]
    part = draw(
        st.lists(
            st.sampled_from(cfg["part"]), min_size=1, max_size=2, unique=True
        )
    )
    fn = draw(
        st.sampled_from(
            ["row_number", "rank", "dense_rank", "lag", "lead", "sum_frame"]
        )
    )
    frame = draw(st.integers(1, 5))
    desc = draw(st.booleans())
    return {"table": t, "part": part, "fn": fn, "frame": frame, "desc": desc}


def _win_build(spark, spec):
    from pyspark.sql import Window as W

    t = spec["table"]
    cfg = _WIN[t]
    part, fn, k = spec["part"], spec["fn"], spec["frame"]
    val, tie = cfg["val"], cfg["tie"]
    df = spark.read.parquet(f"{SF}/{t}.parquet")
    dirw = " DESC" if spec["desc"] else ""
    # total order inside each partition: value then unique key(s) -
    # every ranking/offset function below is deterministic
    order_sql = f"{val}{dirw}, " + ", ".join(tie)
    ocols = [F.col(val).desc() if spec["desc"] else F.col(val)] + [
        F.col(c) for c in tie
    ]
    w = W.partitionBy(*part).orderBy(*ocols)
    if fn in ("row_number", "rank", "dense_rank"):
        col = getattr(F, fn)().over(w)
        fn_sql = f"{fn}()"
    elif fn in ("lag", "lead"):
        col = getattr(F, fn)(val, 1).over(w)
        fn_sql = f"{fn}({val}, 1)"
    else:
        col = F.sum(val).over(w.rowsBetween(-k, 0))
        fn_sql = f"sum({val})"
    over = f"OVER (PARTITION BY {', '.join(part)} ORDER BY {order_sql}"
    over += (
        f" ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)"
        if fn == "sum_frame"
        else ")"
    )
    out_cols = list(dict.fromkeys(part + tie))
    sdf = df.select(*out_cols, col.alias("w"))
    sql = (
        f"SELECT {', '.join(out_cols)}, {fn_sql} {over} AS w FROM {t}"
    )
    return sdf, sql


@given(spec=_win_spec())
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_functions_match_sql_on_duckdb(spark, ddb, spec) -> None:
    df, sql = _win_build(spark, spec)
    s_rows = df.collect()
    d = ddb.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    assert len(s_rows) == len(d_rows), sql
    assert row_multiset(df.columns, s_rows) == row_multiset(d_cols, d_rows), sql


# --- ordered top-k fuzzing: ORDER BY + LIMIT under a total order ---

_TOPK = {
    "lineitem": {"val": "l_quantity", "tie": ["l_orderkey", "l_linenumber"]},
    "orders": {"val": "o_totalprice", "tie": ["o_orderkey"]},
    "customer": {"val": "c_acctbal", "tie": ["c_custkey"]},
}


@st.composite
def _topk_spec(draw):
    t = draw(st.sampled_from(sorted(_TOPK)))
    k = draw(st.integers(1, 25))
    desc = draw(st.booleans())
    # optional IN / BETWEEN predicate exercises list & range translation
    pred = None
    if t in _STR_COLS and draw(st.booleans()):
        col = draw(st.sampled_from(sorted(_STR_COLS[t])))
        vals = draw(
            st.lists(
                st.sampled_from(_STR_COLS[t][col]),
                min_size=1,
                max_size=2,
                unique=True,
            )
        )
        pred = ("in", col, vals)
    elif draw(st.booleans()):
        col = draw(st.sampled_from(sorted(_NUM_COLS[t])))
        dom = _NUM_COLS[t][col]
        # independent draws: narrow, single-point, and INVERTED
        # (lo > hi -> empty) ranges all get exercised
        lo = draw(st.sampled_from(dom))
        hi = draw(st.sampled_from(dom))
        pred = ("between", col, (lo, hi))
    return {"table": t, "k": k, "desc": desc, "pred": pred}


@given(spec=_topk_spec())
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ordered_topk_matches_sql_on_duckdb(spark, ddb, spec) -> None:
    """ORDER BY val, unique-tie LIMIT k is fully deterministic, so the
    comparison here is ORDERED row lists, not multisets - catching
    engines that disagree on sort stability, null placement, or
    LIMIT-with-ties behavior; IN-lists and BETWEEN ranges ride along
    to cover predicate translation."""
    t, k = spec["table"], spec["k"]
    cfg = _TOPK[t]
    val, tie = cfg["val"], cfg["tie"]
    df = spark.read.parquet(f"{SF}/{t}.parquet")
    where_sql = ""
    if spec["pred"]:
        kind, col, arg = spec["pred"]
        if kind == "in":
            df = df.filter(F.col(col).isin(arg))
            vals = ", ".join(f"'{v}'" for v in arg)
            where_sql = f" WHERE {col} IN ({vals})"
        else:
            lo, hi = arg
            df = df.filter(F.col(col).between(lo, hi))
            where_sql = f" WHERE {col} BETWEEN {lo!r} AND {hi!r}"
    ocols = [F.col(val).desc() if spec["desc"] else F.col(val)] + [
        F.col(c) for c in tie
    ]
    out_cols = [val] + tie
    sdf = df.select(*out_cols).orderBy(*ocols).limit(k)
    dirw = " DESC" if spec["desc"] else ""
    sql = (
        f"SELECT {', '.join(out_cols)} FROM {t}{where_sql} "
        f"ORDER BY {val}{dirw}, {', '.join(tie)} LIMIT {k}"
    )
    s_rows = [tuple(r) for r in sdf.collect()]
    d_rows = [tuple(r) for r in ddb.execute(sql).fetchall()]
    assert s_rows == d_rows, sql  # ORDERED equality
