"""Round-4 analytics extensions: exact-arithmetic risk panels,
distribution drift, retrieval-index build, auditable splits, and
graph authority - all past the certified window (the driver's 50
slots are full of oracle-green queries; these are parity-verified
locally by tools/parity.py, same check, no certificate).

The cross-engine float discipline here is the "integer moments"
recipe proven out by ohlc_bars' integer-cents VWAP: fix-point the
measure, let every windowed/grouped SUM be a bigint (exact under any
accumulation order or segment-tree association), then evaluate ONE
closed-form scalar expression over those integers with the same IEEE
op sequence on both engines - bit-identical doubles, no rounding
tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import timeseries as TS
from .registry import q

# Shared CTE: deterministic hourly close per event_type (last value
# in the hour, ties broken by event_id - same selection resample_ffill
# certifies).
_HOURLY_CLOSE = """
    SELECT event_type, bar_ts, value
    FROM (
        SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
"""


def _hourly_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy(
        "event_type", F.date_trunc("hour", "ts").cast("timestamp_ntz")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bar_ts"),
            "value",
        )
    )


@q(
    "returns_drawdown",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    c AS (
        SELECT event_type, bar_ts, value,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM obs
    ),
    m AS (
        SELECT event_type, bar_ts, value, vc,
               lag(value) OVER w AS prev,
               max(value) OVER (PARTITION BY event_type ORDER BY bar_ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS runmax,
               count(*)    OVER wz AS n,
               sum(vc)     OVER wz AS s,
               sum(vc*vc)  OVER wz AS sxx
        FROM c
        WINDOW w  AS (PARTITION BY event_type ORDER BY bar_ts),
               wz AS (PARTITION BY event_type ORDER BY bar_ts
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, bar_ts, value,
           CASE WHEN prev <> 0 THEN value / prev - 1 END AS ret,
           CASE WHEN runmax <> 0 THEN value / runmax - 1 END AS drawdown,
           CASE WHEN n > 1 AND CAST(n*sxx - s*s AS DOUBLE) > 0 THEN
             CAST(n*vc - s AS DOUBLE)
               / sqrt(CAST(n*sxx - s*s AS DOUBLE) * CAST(n AS DOUBLE)
                      / (CAST(n AS DOUBLE) - 1))
           END AS zscore
    FROM m
    """,
)
def returns_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series risk panel over the hourly close: simple return,
    drawdown from the running max, rolling 24-bar z-score - ONE window
    pass via operators.timeseries.returns_panel, certified exactly
    (no rounding) by the integer-moments recipe. The reference's
    surface delegates all analytics to Athena (wiki.md:139-141); this
    is the market-risk query that surface exists to serve."""
    return TS.returns_panel(
        _hourly_close(spark, sf_dir),
        key="event_type",
        ts="bar_ts",
        value="value",
        zscore_rows=24,
        scale=100,
    )


@q(
    "rolling_corr",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    a AS (SELECT bar_ts, value AS x FROM obs WHERE event_type = 'view'),
    b AS (SELECT bar_ts, value AS y FROM obs WHERE event_type = 'click'),
    j AS (
        SELECT a.bar_ts, x, y,
               CAST(round(x * 100) AS BIGINT) AS xc,
               CAST(round(y * 100) AS BIGINT) AS yc
        FROM a JOIN b ON a.bar_ts = b.bar_ts
    ),
    m AS (
        SELECT bar_ts, x, y,
               count(*)   OVER w AS n,
               sum(xc)    OVER w AS sx,
               sum(yc)    OVER w AS sy,
               sum(xc*yc) OVER w AS sxy,
               sum(xc*xc) OVER w AS sxx,
               sum(yc*yc) OVER w AS syy
        FROM j
        WINDOW w AS (ORDER BY bar_ts ROWS BETWEEN 23 PRECEDING
                     AND CURRENT ROW)
    )
    SELECT bar_ts, x, y,
           CASE WHEN n > 1 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0
                         AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
           END AS corr,
           n AS n_obs
    FROM m
    """,
)
def rolling_corr_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-bar correlation between the 'view' and 'click'
    hourly close series (operators.timeseries.rolling_corr), exact
    across engines via integer moments. The two series align on the
    hour key with an equi-join; the window is a single pass over the
    joined grid (bar-count-bounded, not event-count-bounded - at
    100 TB the window input is the bar grid, and a multi-pair panel
    would partition the same window by the pair key)."""
    obs = _hourly_close(spark, sf_dir)
    a = obs.filter(F.col("event_type") == "view").select(
        "bar_ts", F.col("value").alias("x")
    )
    b = obs.filter(F.col("event_type") == "click").select(
        "bar_ts", F.col("value").alias("y")
    )
    return TS.rolling_corr(
        a.join(b, "bar_ts"), ts="bar_ts", x="x", y="y", window_rows=24,
        scale=100,
    )


@q(
    "hash_split",
    oracle="""
    WITH h AS (
        SELECT doc_id, n_chars,
               md5(concat('42', ':', CAST(doc_id AS VARCHAR))) AS hx
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_chars,
               (  (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
                + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
                + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
                + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
                + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)
               ) % 10000 AS slot
        FROM h
    )
    SELECT CASE WHEN slot < 8000 THEN 'train'
                WHEN slot < 9000 THEN 'val'
                ELSE 'test' END          AS split,
           count(*)                      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS total_chars,
           min(doc_id)                   AS min_doc_id,
           max(doc_id)                   AS max_doc_id
    FROM s
    GROUP BY 1
    """,
)
def hash_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auditable deterministic 80/10/10 train/val/test split
    (operators.text.hash_split, algo='md5'): the slot is the first 8
    hex chars of md5('42:' || id) mod 10000, which the oracle replays
    digit-by-digit - certifying that split membership is a pure
    function of the id, reproducible by any engine, never dependent
    on partitioning or run order. Narrow map + one 3-group aggregate;
    the reference has no notion of reproducible splits at all."""
    from ..operators.text import hash_split

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "n_chars",
            hash_split(
                "doc_id",
                {"train": 0.8, "val": 0.1, "test": 0.1},
                seed=42,
                algo="md5",
            ).alias("split"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@q(
    "inverted_index",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf
        FROM toks GROUP BY term, doc_id
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY term
                                     ORDER BY tf DESC, doc_id) AS rn
        FROM tf
    )
    SELECT term,
           count(*) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
                      ',' ORDER BY rn) AS top_doc_ids
    FROM r
    GROUP BY term
    """,
)
def inverted_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build over the corpus
    (operators.ranking.inverted_index): per term, document frequency,
    total term frequency, and the top-5 posting heads ordered by
    (tf desc, doc_id). One corpus-sized shuffle on the (term, doc)
    key; posting heads are capped by a per-term row_number BEFORE any
    list is materialized, so no full posting list ever sits in one
    row."""
    from ..operators.ranking import inverted_index

    d = load_table(spark, sf_dir, "documents")
    return inverted_index(d, "doc_id", "text", top_docs=5)


@q(
    "anomaly_zscore",
    oracle="""
    WITH c AS (
        SELECT event_id, event_type, value,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    g AS (
        SELECT event_type,
               count(*)   AS n,
               sum(vc)    AS s,
               sum(vc*vc) AS sxx
        FROM c GROUP BY event_type
    ),
    z AS (
        SELECT event_id, c.event_type, value,
               (CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(sxx AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1)) AS z
        FROM c JOIN g ON c.event_type = g.event_type
        WHERE n > 1
          AND CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE) > 0
    )
    SELECT event_id, event_type, value, z
    FROM z
    WHERE abs(z) >= 2.5
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global z-score outlier detection per event_type: flag events
    more than 2.5 sample standard deviations from their group mean,
    with z certified EXACTLY (integer moments -> one fixed IEEE
    expression, so the 2.5 cutoff cannot disagree across engines by
    an ulp). Shape: one partial-combined aggregate to group-count
    rows, broadcast back over the fact scan - two narrow passes, no
    window over the full table."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    sxxd = F.col("sxx").cast("double")
    z = (F.col("vc").cast("double") - sd / nd) / F.sqrt(
        (sxxd - sd * sd / nd) / (nd - 1)
    )
    # variance > 0 guard on the broadcast side: a CONSTANT group would
    # make z = 0/0 = NaN, and NaN compares greater than every double
    # in Spark - without the guard every row of that group would flag
    stats = g.filter((F.col("n") > 1) & (sxxd - sd * sd / nd > 0))
    return (
        c.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2.5)
        .select("event_id", "event_type", "value", "z")
    )


@q(
    "ks_drift",
    oracle="""
    WITH g AS (
        SELECT event_type, value AS v,
               count(*) FILTER (WHERE ts <  TIMESTAMP '2024-01-15') AS ca,
               count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15') AS cb
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type, value
    ),
    s AS (
        SELECT event_type,
               sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS cum_a,
               sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS cum_b,
               sum(ca) OVER (PARTITION BY event_type) AS na,
               sum(cb) OVER (PARTITION BY event_type) AS nb
        FROM g
    )
    SELECT event_type,
           max(abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
                   - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE))) AS ks,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM s
    GROUP BY event_type
    """,
)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift gate (operators.profile.ks_statistic):
    two-sample KS distance of the value distribution before vs after
    2024-01-15, per event_type. ECDFs are built from integer
    cumulative counts over the DISTINCT-value set (the one corpus-
    sized shuffle is the distinct aggregate; the window input is
    value-cardinality-bounded), so the sup statistic is exact across
    engines - a drift alarm that cannot misfire by float noise."""
    from ..operators.profile import ks_statistic

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    flagged = e.select(
        "event_type",
        "value",
        F.when(F.col("ts") < cut, "a").otherwise("b").alias("side"),
    )
    out = ks_statistic(flagged, "value", "side", by=["event_type"])
    return out.select("event_type", "ks", "n_a", "n_b")


@q("pagerank_trade")  # iterative float fixpoint -> rows-only (pytest vs numpy)
def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph: one pass over
    lineitem->orders builds supplier-nation -> customer-nation edges
    (the corpus-sized work - partial-combined aggregate + two
    broadcast dimension joins), then operators.graph.pagerank iterates
    on the 25-node weighted graph. Rank sums float across a varying
    shuffle order, so this is pytest-differential (vs dense numpy
    power iteration), not oracle-checkable; ranks are rounded for
    display only."""
    from ..operators.graph import pagerank

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("lineitem", "orders", "supplier", "customer", "nation")
    }
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # supplier/customer scale with SF - unhinted (AQE broadcasts
        # while genuinely small; a hard hint crashes at ~100x data)
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
    )
    # fixed 8 rounds, no convergence probes: the trade graph is dense
    # (fast-mixing), and for a ranking display the ordering is stable
    # well before the 1e-6 L1 fixpoint. The graph is dangling-free,
    # so pagerank's conserved-mass update applies (contrib referenced
    # once -> the lazy plan grows LINEARLY per round; with the doubled
    # general update, 8 lazy rounds cost 2^8 plan copies - measured
    # 6x slower than the checkpoints they save) and all 8 rounds run
    # as one scheduled job over the single-partition 25-node graph
    ranks = pagerank(edges, max_iter=8, tol=None, check_every=8)
    n = t["nation"].select(
        F.col("n_nationkey").alias("node"), F.col("n_name").alias("nation")
    )
    return (
        ranks.join(F.broadcast(n), "node")
        .select("nation", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "nation")
    )


@q(
    "ols_trend",
    oracle="""
    WITH c AS (
        SELECT event_type,
               datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                        date_trunc('hour', ts)) AS x,
               CAST(round(value * 100) AS BIGINT) AS yc
        FROM events
    ),
    g AS (
        SELECT event_type,
               count(*)  AS n,
               sum(x)    AS sx,
               sum(yc)   AS sy,
               sum(x*yc) AS sxy,
               sum(x*x)  AS sxx,
               sum(yc*yc) AS syy
        FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE) / 100          AS slope,
           (CAST(sy AS DOUBLE)
            - (CAST(n*sxy - sx*sy AS DOUBLE)
               / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 100                      AS intercept,
           CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
             / (CAST(n*sxx - sx*sx AS DOUBLE)
                * CAST(n*syy - sy*sy AS DOUBLE))            AS r2
    FROM g
    WHERE n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
    """,
)
def ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS trend (slope / intercept / r-squared
    of price against hours-since-anchor): the drift detector for a
    landed series, certified EXACTLY - all five moments are bigint
    sums (x is a small hour index, y is integer cents), and the
    regression coefficients are one fixed IEEE expression over them.
    One partial-combined aggregate over the fact scan; nothing else."""
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00',"
            " date_trunc('hour', ts))"
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("yc"),
    )
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    slope_c = num / dx
    return (
        g.filter((n * sxx - sx * sx != 0) & (n * syy - sy * sy != 0))
        .select(
            "event_type",
            n.alias("n"),
            (slope_c / 100).alias("slope"),
            (
                (sy.cast("double") - slope_c * sx.cast("double"))
                / n.cast("double")
                / 100
            ).alias("intercept"),
            (num * num / (dx * dy)).alias("r2"),
        )
    )


@q(
    "value_histogram",
    oracle="""
    WITH b AS (
        SELECT min(value) AS lo, max(value) AS hi FROM events
    ),
    h AS (
        SELECT event_type,
               CASE WHEN value >= hi THEN 19
                    ELSE CAST(floor((value - lo) / (hi - lo) * 20) AS INT)
               END AS bucket
        FROM events, b
    )
    SELECT event_type, bucket, count(*) AS n
    FROM h
    GROUP BY event_type, bucket
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of value per event_type over the
    GLOBAL min/max: the profiling companion to operators.profile.
    Bucket assignment is one fixed IEEE expression over the same
    doubles on both engines (floor((v-lo)/(hi-lo)*20), top edge
    closed), so counts match exactly. Shape: one scalar aggregate for
    the bounds (broadcast back as a one-row crossJoin), one
    partial-combined aggregate for the counts - two scans, zero
    windows, the same plan at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.when(F.col("value") >= F.col("hi"), F.lit(19)).otherwise(
        F.floor(
            (F.col("value") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * 20
        ).cast("int")
    )
    return (
        e.crossJoin(F.broadcast(b))
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "winsorized_stats",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*)    OVER (PARTITION BY event_type)   AS n
        FROM events
    ),
    cuts AS (
        SELECT event_type,
               max(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
                        THEN value END) AS p01,
               max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                        THEN value END) AS p99
        FROM r GROUP BY event_type
    ),
    w AS (
        SELECT e.event_type,
               CASE WHEN value < p01 THEN 1 ELSE 0 END AS clip_lo,
               CASE WHEN value > p99 THEN 1 ELSE 0 END AS clip_hi,
               CAST(round(
                 CASE WHEN value < p01 THEN p01
                      WHEN value > p99 THEN p99
                      ELSE value END * 100) AS BIGINT) AS wc
        FROM events e JOIN cuts ON e.event_type = cuts.event_type
    )
    SELECT event_type,
           CAST(sum(clip_lo) AS BIGINT) AS n_clip_lo,
           CAST(sum(clip_hi) AS BIGINT) AS n_clip_hi,
           CAST(sum(wc) AS DOUBLE) / count(*) / 100 AS wmean
    FROM w
    GROUP BY event_type
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorization at [p01, p99] per event_type with the
    cut points defined POSITIONALLY (the value at row ceil(p*n) in
    (value, event_id) order) rather than by an engine's interpolating
    quantile - which is what makes the clip exact across engines
    where quantile_cont/percentile implementations would drift.
    Outputs clip counts and the winsorized mean (exact integer-cents
    ratio).

    Scale shape (rank-from-counts): the fact scan collapses FIRST to
    per-(type, distinct-value) counts - one partial-combined shuffle -
    and the ranking window runs over THAT table (input bounded by
    value cardinality, never row count; no per-event_type single-task
    sort of fact-scale input). The positional cut at rank k =
    ceil(p*n) is the unique distinct value whose cumulative count
    interval [cum-c+1, cum] contains k - identical to the row-level
    row_number() definition because the event_id tie-break never
    crosses a value boundary. Clip counts and the winsorized cents sum
    then fold onto the same counts table (sum of c-weighted per-value
    terms == the row-level sums, exactly, in bigint)."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    wv = W.partitionBy("event_type").orderBy("value")
    wt = W.partitionBy("event_type")
    stepped = g.select(
        "event_type",
        "value",
        "c",
        F.sum("c").over(wv).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )
    k01 = F.ceil(0.01 * F.col("n")).cast("bigint")
    k99 = F.ceil(0.99 * F.col("n")).cast("bigint")
    cuts = stepped.groupBy("event_type").agg(
        F.max(
            F.when(
                (F.col("cum") >= k01) & (F.col("cum") - F.col("c") < k01),
                F.col("value"),
            )
        ).alias("p01"),
        F.max(
            F.when(
                (F.col("cum") >= k99) & (F.col("cum") - F.col("c") < k99),
                F.col("value"),
            )
        ).alias("p99"),
    )
    clipped = (
        g.join(F.broadcast(cuts), "event_type")
        .select(
            "event_type",
            "c",
            F.when(F.col("value") < F.col("p01"), F.col("c"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("clip_lo"),
            F.when(F.col("value") > F.col("p99"), F.col("c"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("clip_hi"),
            (
                F.round(
                    F.when(F.col("value") < F.col("p01"), F.col("p01"))
                    .when(F.col("value") > F.col("p99"), F.col("p99"))
                    .otherwise(F.col("value"))
                    * 100
                ).cast("bigint")
                * F.col("c")
            ).alias("wc"),
        )
    )
    return clipped.groupBy("event_type").agg(
        F.sum("clip_lo").alias("n_clip_lo"),
        F.sum("clip_hi").alias("n_clip_hi"),
        (
            F.sum("wc").cast("double") / F.sum("c") / 100
        ).alias("wmean"),
    )


@q(
    "anomaly_mad",
    oracle="""
    WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*)    OVER (PARTITION BY event_type)   AS n
        FROM events
    ),
    m AS (
        SELECT event_type,
               (max(CASE WHEN rn = floor((n+1)/2.0) THEN value END)
                + max(CASE WHEN rn = ceil((n+1)/2.0) THEN value END)) / 2
                 AS med
        FROM r GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, event_id, value,
               abs(value - med) AS dev
        FROM events e JOIN m ON e.event_type = m.event_type
    ),
    rd AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY dev, event_id) AS rn,
               count(*)  OVER (PARTITION BY event_type) AS n
        FROM d
    ),
    md AS (
        SELECT event_type,
               (max(CASE WHEN rn = floor((n+1)/2.0) THEN dev END)
                + max(CASE WHEN rn = ceil((n+1)/2.0) THEN dev END)) / 2
                 AS mad
        FROM rd GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.dev,
           d.dev / (md.mad * 1.4826) AS robust_z
    FROM d JOIN md ON d.event_type = md.event_type
    WHERE md.mad > 0 AND d.dev / (md.mad * 1.4826) > 3.0
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD outlier gate per event_type
    (operators.profile.mad_outliers): the 50%-breakdown-point
    complement of anomaly_zscore - a burst of bad ticks cannot drag
    the center or inflate the spread enough to mask itself. Both
    medians are positional (lower/upper rank average), so the robust
    z and the k=3 cutoff are engine-exact with no interpolating
    percentile in sight."""
    from ..operators.profile import mad_outliers

    e = load_table(spark, sf_dir, "events")
    return mad_outliers(
        e.select("event_id", "event_type", "value"),
        "value",
        by=["event_type"],
        k=3.0,
        id_cols=["event_id"],
    )


@q(
    "graph_components",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT l_partkey AS a, - l_suppkey AS b
        FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 97 = 0
    ),
    ud AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM ud
        UNION
        SELECT b AS src, b AS dst FROM ud
        UNION
        SELECT r.src, ud.b AS dst FROM reach r JOIN ud ON r.dst = ud.a
    )
    SELECT src AS node, CAST(min(dst) AS BIGINT) AS component
    FROM reach
    GROUP BY src
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a sparse part-supplier co-purchase
    subgraph, certified against a DuckDB RECURSIVE transitive-closure
    oracle - the independent certificate for the SAME
    operators.dedup.connected_components that clusters near-dup pairs
    (where seeded hash families force rows-only checks). Component
    label = min reachable node id on both sides. The subgraph filter
    (first line of 1-in-97 orders) is a deterministic sparsifier, not
    semantics: the oracle's closure is quadratic in component size, so
    the fixture keeps components small while the Spark side runs the
    production operator unchanged (driver union-find fast path here;
    min-label propagation past 1M edges). Supplier nodes are encoded
    as NEGATED keys: part keys are positive, supplier keys negative,
    so the two id spaces cannot collide at ANY scale factor (an
    additive offset like 100000+s_suppkey overlaps partkey once
    SF >= 0.5 - TPC-H partkey ranges to 200000*SF)."""
    from ..operators.dedup import connected_components

    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 97 == 0))
        .select(
            F.col("l_partkey").alias("id_a"),
            (-F.col("l_suppkey")).alias("id_b"),
        )
        .distinct()
    )
    return connected_components(e).select(
        F.col("id").alias("node"), F.col("component")
    )


@q(
    "triangle_count",
    oracle="""
    WITH e AS (
        SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS a,
                        greatest(s.s_nationkey, c.c_nationkey) AS b
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        WHERE s.s_nationkey <> c.c_nationkey
    ),
    nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e)
    SELECT (SELECT count(*) FROM nodes)                    AS n_nodes,
           (SELECT count(*) FROM e)                        AS n_edges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
)
def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the undirected nation trade graph
    (operators.graph.triangle_count, degree-ordered orientation so the
    wedge join is sum-of-squares-of-OUT-degree bounded - the
    formulation that survives celebrity nodes at 10^9 edges). The
    oracle counts id-ordered triangles (a<b<c three-way join); both
    orientations count each triangle exactly once, so the exact
    integer triple (nodes, edges, triangles) must match."""
    from ..operators.graph import triangle_count

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("lineitem", "orders", "supplier", "customer")
    }
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # supplier/customer scale with SF - unhinted (AQE broadcasts
        # while genuinely small; a hard hint crashes at ~100x data)
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
    )
    return triangle_count(edges)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled k-core peeling in plain SQL: a recursive CTE cannot
    express peeling (each round's degree filter references the working
    edge set twice, and aggregates over it), so the oracle unrolls a
    FIXED number of peel rounds. Peeling is monotone-decreasing and
    idempotent at the fixpoint, so any unroll depth >= the true peel
    depth yields exactly the k-core; the fixture graph peels in 2
    rounds at sf0.01 (measured 1-2 across sf0.001-0.1) and the unroll
    leaves a 4x margin. Every CTE is MATERIALIZED: each round
    references its predecessor three times, and an inlining engine
    would otherwise expand e0 3^rounds times. Extra rounds are
    identity scans of a few-thousand-row table - cheap by
    construction."""
    cte = [
        """e0 AS MATERIALIZED (
        SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        WHERE x.l_partkey < y.l_partkey AND x.l_orderkey % 11 = 0
    )"""
    ]
    for i in range(1, rounds + 1):
        prev = f"r{i - 1}" if i > 1 else "e0"
        keep = (
            f"(SELECT node FROM (SELECT a AS node FROM {prev} "
            f"UNION ALL SELECT b AS node FROM {prev}) "
            f"GROUP BY node HAVING count(*) >= {k})"
        )
        cte.append(
            f"r{i} AS MATERIALIZED (SELECT a, b FROM {prev} "
            f"WHERE a IN {keep} AND b IN {keep})"
        )
    last = f"r{rounds}"
    return (
        "WITH " + ",\n    ".join(cte) + f"""
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM {last} UNION ALL SELECT b AS node FROM {last})
    GROUP BY node HAVING count(*) >= {k}
    """
    )


@q("kcore_parts", oracle=_kcore_oracle(k=3, rounds=8))
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-order graph (parts that appear together
    in 1-in-11 orders), run through the production
    operators.graph.k_core iterative peeler and certified against a
    DuckDB oracle that replays the peeling as 8 unrolled SQL rounds
    (4x margin over the measured 1-2-round peel depth; peeling is
    idempotent at the fixpoint, so extra rounds are no-ops) -
    the same differential treatment graph_components got, closing the
    last pytest-only gap in the graph family. The modulo filter is a
    deterministic sparsifier (keeps the fixture's peel depth and edge
    count oracle-friendly); the Spark side runs the unmodified
    operator, whose per-round cost is one degree aggregate plus two
    semi-joins regardless of graph size."""
    from ..operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 11 == 0
    )
    x = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    y = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    e = (
        x.join(y, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return k_core(e, 3).select("node", "degree")


@q(
    "risk_report",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    c AS (
        SELECT event_type, bar_ts, value,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM obs
    ),
    m AS (
        SELECT event_type, bar_ts, value, vc,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY bar_ts)       AS rn_a,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY bar_ts DESC)  AS rn_d,
               max(value) OVER (PARTITION BY event_type ORDER BY bar_ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS runmax,
               count(*)    OVER wz AS n,
               sum(vc)     OVER wz AS s,
               sum(vc*vc)  OVER wz AS sxx
        FROM c
        WINDOW wz AS (PARTITION BY event_type ORDER BY bar_ts
                      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    ),
    p AS (
        SELECT event_type, value, rn_a, rn_d,
               CASE WHEN runmax <> 0 THEN value / runmax - 1 END AS drawdown,
               CASE WHEN n > 1 AND CAST(n*sxx - s*s AS DOUBLE) > 0 THEN
                 CAST(n*vc - s AS DOUBLE)
                   / sqrt(CAST(n*sxx - s*s AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(n AS DOUBLE) - 1))
               END AS zscore
        FROM m
    )
    SELECT event_type,
           count(*)                                            AS n_bars,
           max(CASE WHEN rn_d = 1 THEN value END)
             / max(CASE WHEN rn_a = 1 THEN value END) - 1      AS total_return,
           min(drawdown)                                       AS max_drawdown,
           max(abs(zscore))                                    AS worst_z,
           CAST(count(CASE WHEN abs(zscore) > 3 THEN 1 END)
                AS BIGINT)                                     AS n_z_alerts
    FROM p
    GROUP BY event_type
    """,
)
def risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed per-series risk report: the returns_drawdown panel
    collapsed to one row per series (bar count, total return, max
    drawdown, worst rolling z, z>3 alert count) - the end-to-end
    certificate that the COMPOSITION of exact pieces stays exact
    (first/last selected positionally, every input double bit-equal
    by the integer-moments argument, aggregates of exact values
    exact). Shape: the panel's single window pass + one
    partial-combined aggregate."""
    panel = TS.returns_panel(
        _hourly_close(spark, sf_dir),
        key="event_type",
        ts="bar_ts",
        value="value",
        zscore_rows=24,
        scale=100,
    )
    w = W.partitionBy("event_type")
    first_v = F.min(F.struct("bar_ts", "value")).over(w)["value"]
    last_v = F.max(F.struct("bar_ts", "value")).over(w)["value"]
    return (
        panel.withColumn("_first", first_v)
        .withColumn("_last", last_v)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bars"),
            (F.max("_last") / F.max("_first") - 1).alias("total_return"),
            F.min("drawdown").alias("max_drawdown"),
            F.max(F.abs("zscore")).alias("worst_z"),
            F.count(F.when(F.abs("zscore") > 3, 1)).alias("n_z_alerts"),
        )
    )


_DOT_Q = """list_sum([{a}[i] * {b}[i] for i in generate_series(1, len({a}))])"""


def _cos_q(a: str, b: str) -> str:
    return (
        f"({_DOT_Q.format(a=a, b=b)} / "
        f"(sqrt({_DOT_Q.format(a=a, b=a)}) * sqrt({_DOT_Q.format(a=b, b=b)})))"
    )


@q(
    "sim_topk_quantized",
    oracle=f"""
    WITH z AS (
        SELECT vec_id,
               list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS amax,
               embedding
        FROM embeddings
    ),
    dq AS (
        SELECT vec_id,
               [round(CAST(x AS DOUBLE)
                      / (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END))
                * CAST(CAST(CASE WHEN amax > 0 THEN amax / 127.0
                            ELSE 1.0 END AS REAL) AS DOUBLE)
                for x in embedding] AS v
        FROM z
    ),
    qv AS (SELECT v AS q FROM dq WHERE vec_id = 0)
    SELECT vec_id,
           round({_cos_q('v', 'q')}, 6) AS cos_sim
    FROM dq, qv
    WHERE vec_id <> 0
    ORDER BY round({_cos_q('v', 'q')}, 6) DESC, vec_id
    LIMIT 10
    """,
)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 over the int8-QUANTIZED corpus
    (operators.similarity.quantize_embeddings -> dequantize_expr ->
    brute cosine): certifies the whole quantize/dequantize arithmetic
    against DuckDB replaying it step for step (double scale for the
    codes, float-cast scale for the reconstruction - the exact
    precision path the operator takes). Same 6dp-rounded ordering +
    id tie-break as sim_topk; in practice the quantized ranking
    reproduces the float ranking (recall pytest), which is the point:
    4-8x smaller vectors, same retrieval."""
    import math

    from ..operators.similarity import dequantize_expr, quantize_embeddings

    e = load_table(spark, sf_dir, "embeddings")
    dq = quantize_embeddings(e).select(
        "vec_id", dequantize_expr(F.col("codes"), F.col("scale")).alias("v")
    )
    qvec = dq.filter(F.col("vec_id") == 0).select("v").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    # |q| precomputed with the same left-to-right IEEE fold the oracle
    # uses (separate sums accumulate independently, so the combined
    # struct fold below is bit-equal to the oracle's separate folds)
    qn = 0.0
    for x in qvec:
        qn += float(x) * float(x)
    qnorm = math.sqrt(qn)
    # ONE fold computes dot(v,q) and |v|^2 together, and `v` is
    # referenced once - without this, CollapseProject inlines the
    # whole quantize->dequantize chain into each of the three cosine
    # folds (measured 4x transform / 7x aggregate in the plan)
    pairs = F.zip_with(
        F.col("v"), qlit, lambda a, b: F.struct(a.alias("x"), b.alias("y"))
    )
    acc = F.aggregate(
        pairs,
        F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("n")),
        lambda acc, p: F.struct(
            (acc["d"] + p["x"] * p["y"]).alias("d"),
            (acc["n"] + p["x"] * p["x"]).alias("n"),
        ),
    )
    scored = (
        dq.filter(F.col("vec_id") != 0)
        .select("vec_id", acc.alias("_acc"))
        .select(
            "vec_id",
            F.round(
                F.col("_acc")["d"] / (F.sqrt(F.col("_acc")["n"]) * F.lit(qnorm)),
                6,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


@q(
    "ohlc_rollup_week",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS bar_ts,
               ts, event_id,
               value, CAST(json_extract(props, '$.k') AS BIGINT) AS qty
        FROM events
    ), r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, bar_ts,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value)                             AS high,
           min(value)                             AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT)               AS n_trades,
           CAST(sum(qty) AS BIGINT)               AS volume
    FROM r
    GROUP BY event_type, bar_ts
    """,
)
def ohlc_rollup_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bar-hierarchy identity, certified on real data: weekly bars
    built by ROLLING UP the hourly bars (operators.timeseries.
    rollup_bars - bar-count cost, ticks never revisited) must equal
    weekly bars derived DIRECTLY from the tick stream, which is what
    the oracle computes. Covers the exact OHLC core (open/close
    positional, high/low extrema, count/volume sums - all exact);
    VWAP is excluded here because the rollup re-accumulates it as
    float notional (documented last-ulp caveat on rollup_bars), and
    this certificate is about the hierarchy identity, not float
    recombination."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "qty", F.get_json_object("props", "$.k").cast("bigint")
    )
    hourly = TS.ohlc_bars(
        e, "event_type", "ts", "value", "qty",
        width="hour", tie_break="event_id", price_scale=100,
    )
    weekly = TS.rollup_bars(hourly, "event_type", width="week")
    return weekly.select(
        "event_type", "bar_ts", "open", "high", "low", "close",
        "n_trades", "volume",
    )


@q(
    "pmi_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    bg AS (
        SELECT t[i] AS w1, t[i+1] AS w2
        FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
    ),
    c_xy AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2),
    c_x AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left FROM c_xy GROUP BY w1),
    c_y AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right FROM c_xy GROUP BY w2),
    t AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM c_xy)
    SELECT w1, w2, n_pair,
           round(ln(CAST(n_pair AS DOUBLE) * CAST(n_total AS DOUBLE)
                    / (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE))), 6)
             AS pmi
    FROM c_xy JOIN c_x USING (w1) JOIN c_y USING (w2) CROSS JOIN t
    WHERE n_pair >= 5
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations by pointwise mutual information
    (operators.ranking.pmi_pairs): counts are exact integers; the
    single ln() is rounded to 6dp on both sides (the one place the
    engines' libm may differ in the last ulp - same discipline as
    bm25/lm scores). One bigram shuffle; unigram margins re-aggregate
    the collapsed counts table, never the corpus."""
    from ..operators.ranking import pmi_pairs

    d = load_table(spark, sf_dir, "documents")
    out = pmi_pairs(d, "doc_id", "text", min_count=5)
    return out.select("w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi"))


@q(
    "cdc_apply",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS id, c_acctbal AS bal FROM customer
    ),
    feed AS (
        SELECT o_custkey AS id, o_totalprice AS bal,
               CASE WHEN o_orderstatus = 'F' THEN 'delete'
                    ELSE 'upsert' END AS op,
               o_orderkey AS seq
        FROM orders
    ),
    latest AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY id
                                         ORDER BY seq DESC, op ASC) AS rn
            FROM feed
        ) WHERE rn = 1
    )
    SELECT b.id, b.bal
    FROM base b LEFT JOIN latest l ON b.id = l.id
    WHERE l.id IS NULL
    UNION ALL
    SELECT id, bal FROM latest WHERE op = 'upsert'
    """,
)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC fold certified end-to-end: customer balances as the
    snapshot, orders replayed as an upsert/delete feed keyed by
    customer (finalized orders delete, others upsert the order total;
    seq = order key), operators.diff.apply_changes folds it, and the
    oracle replays the identical latest-change-wins semantics in SQL.
    Values pass through untouched, so the compare is exact."""
    from ..operators.diff import apply_changes

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal")
    )
    feed = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("id"),
        F.col("o_totalprice").alias("bal"),
        F.when(F.col("o_orderstatus") == "F", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.col("o_orderkey").alias("seq"),
    )
    return apply_changes(c, feed, ["id"])


@q(
    "fk_integrity",
    oracle="""
    SELECT 'orders->customer' AS relation,
           CAST(count(*) AS BIGINT) AS n_orphans,
           min(o_orderkey)          AS sample_key
    FROM orders o
    WHERE o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders',
           CAST(count(*) AS BIGINT),
           min(l_orderkey)
    FROM lineitem l
    WHERE l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part',
           CAST(count(*) AS BIGINT),
           min(l_orderkey)
    FROM lineitem l
    WHERE l_partkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    """,
)
def fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity panel over the star schema
    (operators.quality.fk_violations, the production gate): orphan
    counts for three child->parent relations as key-only broadcast
    anti joins - the lake-landing audit the reference's blind catalog
    mutation never runs. Each relation ships only the parent KEY
    column; counts are exact integers. (On healthy driver data all
    three rows report zero orphans - the certificate is that both
    engines agree on that, and on the sample key when they exist.)"""
    from ..operators.quality import fk_violations

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("orders", "customer", "lineitem", "part")
    }

    def panel(name, child, parent, ck, pk, sample):
        v = fk_violations(child, parent, ck, pk)
        return v.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_orphans"),
            F.min(sample).alias("sample_key"),
        )

    return (
        panel("orders->customer", t["orders"], t["customer"],
              "o_custkey", "c_custkey", "o_orderkey")
        .unionByName(
            panel("lineitem->orders", t["lineitem"], t["orders"],
                  "l_orderkey", "o_orderkey", "l_orderkey")
        )
        .unionByName(
            panel("lineitem->part", t["lineitem"], t["part"],
                  "l_partkey", "p_partkey", "l_orderkey")
        )
    )


@q(
    "benford_panel",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM events
        WHERE value > 0
    ),
    c AS (
        SELECT event_type, digit, count(*) AS n
        FROM d GROUP BY event_type, digit
    ),
    t AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        FROM c GROUP BY event_type
    )
    SELECT c.event_type, digit, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS observed,
           ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit) / ln(10.0)
             AS benford
    FROM c JOIN t ON c.event_type = t.event_type
    """,
)
def benford_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution per event_type vs the
    Benford expectation log10(1 + 1/d) - the classic fabricated-data
    / unit-mixing tripwire for landed numeric feeds. The digit comes
    from the integer-cents rendering (exact across engines); observed
    shares are exact integer ratios; the Benford column is the same
    two-ln expression on both sides. One partial-combined aggregate +
    a 9-rows-per-group join."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    d = e.select(
        "event_type",
        F.substring(
            F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit"),
    )
    c = d.groupBy("event_type", "digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("total"))
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "observed"
        ),
        (
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
        ).alias("benford"),
    )


@q(
    "acf_panel",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    c AS (
        SELECT event_type, bar_ts,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM obs
    ),
    lagged AS (
        SELECT event_type, lag_k, vc, pv
        FROM (
            SELECT event_type, vc,
                   unnest([1, 2, 3, 6, 12, 24]) AS lag_k,
                   unnest([lag(vc, 1)  OVER w, lag(vc, 2)  OVER w,
                           lag(vc, 3)  OVER w, lag(vc, 6)  OVER w,
                           lag(vc, 12) OVER w, lag(vc, 24) OVER w]) AS pv
            FROM c
            WINDOW w AS (PARTITION BY event_type ORDER BY bar_ts)
        )
        WHERE pv IS NOT NULL
    ),
    g AS (
        SELECT event_type, lag_k,
               count(*)  AS n,
               sum(vc)   AS sx,
               sum(pv)   AS sy,
               sum(vc*pv) AS sxy,
               sum(vc*vc) AS sxx,
               sum(pv*pv) AS syy
        FROM lagged GROUP BY event_type, lag_k
    )
    SELECT event_type, lag_k,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n > 1 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0
                         AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
           END AS acf
    FROM g
    """,
)
def acf_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly close at lags {1,2,3,6,12,24} per
    series - the memory/seasonality diagnostic behind every
    forecasting decision on landed market data. Exact across engines:
    each lag's correlation is Pearson over (value, lagged value) pairs
    computed from integer-cents moments. Shape: ONE window pass
    produces all six lag columns (the lags share the window spec, so
    Catalyst collapses them into a single Window operator), an in-row
    unnest melts them, and one partial-combined aggregate reduces to
    6 rows per series."""
    obs = _hourly_close(spark, sf_dir)
    lags = [1, 2, 3, 6, 12, 24]
    w = W.partitionBy("event_type").orderBy("bar_ts")
    vc = F.round(F.col("value") * 100).cast("bigint")
    c = obs.select("event_type", "bar_ts", vc.alias("vc"))
    # window lags materialize as top-level columns first: a window
    # expression can't sit inside the generator's argument
    with_lags = c.select(
        "event_type",
        "vc",
        *[F.lag("vc", k).over(w).alias(f"_l{k}") for k in lags],
    )
    melted = with_lags.select(
        "event_type",
        "vc",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(k) for k in lags]).alias("lag_k"),
                F.array(*[F.col(f"_l{k}") for k in lags]).alias("pv"),
            )
        ).alias("z"),
    ).select(
        "event_type",
        "vc",
        F.col("z.lag_k").alias("lag_k"),
        F.col("z.pv").alias("pv"),
    ).filter(F.col("pv").isNotNull())
    g = melted.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("sx"),
        F.sum("pv").alias("sy"),
        F.sum(F.col("vc") * F.col("pv")).alias("sxy"),
        F.sum(F.col("vc") * F.col("vc")).alias("sxx"),
        F.sum(F.col("pv") * F.col("pv")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    return g.select(
        "event_type",
        "lag_k",
        n.alias("n_pairs"),
        F.when((n > 1) & (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy))).alias(
            "acf"
        ),
    )


@q(
    "spearman_corr",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    a AS (SELECT bar_ts, value AS x FROM obs WHERE event_type = 'view'),
    b AS (SELECT bar_ts, value AS y FROM obs WHERE event_type = 'click'),
    j AS (SELECT a.bar_ts, x, y FROM a JOIN b ON a.bar_ts = b.bar_ts),
    r AS (
        SELECT bar_ts,
               -- average ranks doubled -> exact integers (rank pairs
               -- for ties average to half-integers)
               2 * CAST(rank() OVER (ORDER BY x) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY x) AS BIGINT) - 1 AS rx2,
               2 * CAST(rank() OVER (ORDER BY y) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS ry2
        FROM j
    ),
    g AS (
        SELECT count(*)    AS n,
               sum(rx2)    AS sx,
               sum(ry2)    AS sy,
               sum(rx2*ry2) AS sxy,
               sum(rx2*rx2) AS sxx,
               sum(ry2*ry2) AS syy
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS spearman
    FROM g
    WHERE n > 1 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
    """,
)
def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the two aligned hourly close
    series - the monotonic-association twin of rolling_corr's Pearson,
    robust to outliers and nonlinearity. Exact across engines by
    construction: tie-averaged ranks are DOUBLED so they are integers
    (2*rank + tie_count - 1 = twice the average rank), the moments are
    bigint sums, and the correlation is one fixed IEEE expression.
    Shape: two ranking windows over the bar grid + one scalar
    aggregate - bar-count-bounded, like every panel in this family."""
    obs = _hourly_close(spark, sf_dir)
    a = obs.filter(F.col("event_type") == "view").select(
        "bar_ts", F.col("value").alias("x")
    )
    b = obs.filter(F.col("event_type") == "click").select(
        "bar_ts", F.col("value").alias("y")
    )
    j = a.join(b, "bar_ts")
    # doubled tie-averaged ranks: 2*rank + tie_count - 1 (exact ints)
    # global-order ranks over the WHOLE aligned series by design; the
    # input is bar-grid-bounded (one row per bar), so the
    # single-partition WindowExec this plans is dimension-sized
    rx2 = (
        2 * F.rank().over(W.partitionBy().orderBy("x")).cast("bigint")
        + F.count(F.lit(1)).over(W.partitionBy("x")).cast("bigint")
        - 1
    )
    ry2 = (
        2 * F.rank().over(W.partitionBy().orderBy("y")).cast("bigint")
        + F.count(F.lit(1)).over(W.partitionBy("y")).cast("bigint")
        - 1
    )
    r = j.select(rx2.alias("rx2"), ry2.alias("ry2"))
    g = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    return g.filter(
        (n > 1) & (n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0)
    ).select(
        n.alias("n_obs"),
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("spearman"),
    )


@q(
    "chi2_cells",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS o
        FROM events GROUP BY event_type, hour(ts)
    ),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM c GROUP BY event_type),
    ct AS (SELECT hr, CAST(sum(o) AS BIGINT) AS col_n FROM c GROUP BY hr),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS total FROM c)
    SELECT c.event_type, c.hr,
           CAST(o AS BIGINT) AS observed,
           CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
             / CAST(total AS DOUBLE)                       AS expected,
           (CAST(o AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                                  / CAST(total AS DOUBLE))
           * (CAST(o AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                                    / CAST(total AS DOUBLE))
           / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(total AS DOUBLE))                   AS contrib
    FROM c JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN t
    """,
)
def chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for event_type x hour-of-day:
    observed counts, expected under independence (row x col / total),
    and each cell's chi-square contribution - the seasonality/
    dependence screen, emitted PER CELL so every number is a fixed
    IEEE expression over exact integer marginals (a single chi-square
    scalar would need a float sum whose order differs across engines;
    the per-cell form stays exact and the consumer sums it at
    whatever precision it wants). One count aggregate + two
    marginal re-aggregations of the collapsed cell table."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = c.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    ct = c.groupBy("hr").agg(F.sum("o").alias("col_n"))
    t = c.agg(F.sum("o").alias("total"))
    exp = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("total").cast("double")
    )
    od = F.col("o").cast("double")
    return (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hr")
        .crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "hr",
            F.col("o").alias("observed"),
            exp.alias("expected"),
            ((od - exp) * (od - exp) / exp).alias("contrib"),
        )
    )


@q(
    "concentration_hhi",
    oracle="""
    WITH v AS (
        SELECT event_type, user_id,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, user_id
    ),
    g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT)   AS n_users,
               CAST(sum(n) AS BIGINT)     AS total,
               CAST(sum(n*n) AS BIGINT)   AS sum_sq,
               CAST(max(n) AS BIGINT)     AS top_user_n
        FROM v GROUP BY event_type
    )
    SELECT event_type, n_users, total,
           CAST(sum_sq AS DOUBLE)
             / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS hhi,
           CAST(top_user_n AS DOUBLE) / CAST(total AS DOUBLE)  AS top_share
    FROM g
    """,
)
def concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of per-user activity within
    each event_type (sum of squared shares), plus the top-user share -
    the source-dominance screen a training-data pipeline runs before
    trusting a stratum (one crawler producing 80% of a source's docs).
    Exact: HHI = sum(n^2) / total^2 from two bigint aggregates - the
    squared-shares float sum never happens. Two partial-combined
    aggregates, second over the collapsed (type, user) table."""
    e = load_table(spark, sf_dir, "events")
    v = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.max("n").alias("top_user_n"),
    )
    td = F.col("total").cast("double")
    return g.select(
        "event_type",
        "n_users",
        "total",
        (F.col("sum_sq").cast("double") / (td * td)).alias("hhi"),
        (F.col("top_user_n").cast("double") / td).alias("top_share"),
    )


@q(
    "gini_activity",
    oracle="""
    WITH v AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, user_id
    ),
    r AS (
        SELECT event_type, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n, user_id) AS i,
               count(*)     OVER (PARTITION BY event_type) AS cnt
        FROM v
    ),
    g AS (
        SELECT event_type,
               CAST(max(cnt) AS BIGINT)  AS n_users,
               CAST(sum(n) AS BIGINT)    AS total,
               CAST(sum(i * n) AS BIGINT) AS wsum
        FROM r GROUP BY event_type
    )
    SELECT event_type, n_users, total,
           (2.0 * CAST(wsum AS DOUBLE))
             / (CAST(n_users AS DOUBLE) * CAST(total AS DOUBLE))
           - (CAST(n_users AS DOUBLE) + 1.0) / CAST(n_users AS DOUBLE)
             AS gini
    FROM g
    """,
)
def gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity within each event_type -
    the inequality twin of the HHI screen (0 = uniform contribution,
    ->1 = one user is the stratum). Exact via the rank formulation
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with x ascending: the
    rank-weighted sum is a bigint (ranks deterministic via the
    (n, user_id) tie-break), so the statistic is one fixed IEEE
    expression over exact integers.

    Scale shape (rank-from-counts): per-user rows collapse to
    per-(type, distinct activity count n) tie groups of size t, and
    the window runs over THAT table (input bounded by activity-count
    cardinality, never user count - no per-type single-task sort of
    10^9 user rows). Within a tie group all users share the same n,
    so the user_id tie-break is rank-sum-invariant: the group occupies
    positions [r, r+t-1] (r = cum-t+1 from a cumulative count) and
    contributes exactly n*(t*r + t*(t-1)/2) to sum(i*n) - integer
    arithmetic throughout (t*(t-1) is even, DIV is exact)."""
    e = load_table(spark, sf_dir, "events")
    v = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    d = v.groupBy("event_type", "n").agg(F.count(F.lit(1)).alias("t"))
    wv = W.partitionBy("event_type").orderBy("n")
    wt = W.partitionBy("event_type")
    stepped = d.select(
        "event_type",
        "n",
        "t",
        (F.sum("t").over(wv) - F.col("t") + 1).alias("r"),
        F.sum("t").over(wt).alias("cnt"),
    )
    g = stepped.groupBy("event_type").agg(
        F.max("cnt").alias("n_users"),
        F.sum(F.col("t") * F.col("n")).alias("total"),
        F.sum(F.expr("n * (t * r + (t * (t - 1)) DIV 2)")).alias("wsum"),
    )
    nu = F.col("n_users").cast("double")
    td = F.col("total").cast("double")
    return g.select(
        "event_type",
        "n_users",
        "total",
        (
            2.0 * F.col("wsum").cast("double") / (nu * td) - (nu + 1.0) / nu
        ).alias("gini"),
    )


@q(
    "mannwhitney_drift",
    oracle="""
    WITH s AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'a'
                    ELSE 'b' END AS side
        FROM events
        WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, value, side,
               2 * CAST(rank() OVER (PARTITION BY event_type
                                     ORDER BY value) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY event_type, value)
                        AS BIGINT) - 1 AS r2
        FROM s
    ),
    ties AS (
        SELECT event_type,
               CAST(sum(t*t*t - t) AS BIGINT) AS tie_term
        FROM (SELECT event_type, value, CAST(count(*) AS BIGINT) AS t
              FROM s GROUP BY event_type, value)
        GROUP BY event_type
    ),
    g AS (
        SELECT event_type,
               CAST(count(*) FILTER (WHERE side = 'a') AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE side = 'b') AS BIGINT) AS n_b,
               CAST(sum(r2)  FILTER (WHERE side = 'a') AS BIGINT) AS sr2a
        FROM r GROUP BY event_type
    )
    SELECT g.event_type, n_a, n_b,
           CAST(sr2a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_a,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             (CAST(sr2a - n_a * (n_a + 1) AS DOUBLE) / 2)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           END AS effect,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                     * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                        - CAST(tie_term AS DOUBLE)
                          / (CAST(n_a + n_b AS DOUBLE)
                             * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0
           THEN
             (CAST(sr2a - n_a * (n_a + 1) AS DOUBLE) / 2
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
             / sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                    * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                       - CAST(tie_term AS DOUBLE)
                         / (CAST(n_a + n_b AS DOUBLE)
                            * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
           END AS z
    FROM g JOIN ties ON g.event_type = ties.event_type
    """,
)
def mannwhitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney rank-sum drift test per event_type, before vs
    after 2024-01-15 (operators.profile.mann_whitney): the
    stochastic-dominance companion to ks_drift - KS asks "different
    anywhere", U asks "did the values move up or down". Exact across
    engines: doubled tie-averaged ranks, bigint tie term sum(t^3-t),
    and the tie-corrected z as one fixed IEEE expression."""
    from ..operators.profile import mann_whitney

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    flagged = e.select(
        "event_type",
        "value",
        F.when(F.col("ts") < cut, "a").otherwise("b").alias("side"),
    )
    return mann_whitney(flagged, "value", "side", by=["event_type"])


@q(
    "corr_matrix",
    oracle=f"""
    WITH obs AS ({_HOURLY_CLOSE}),
    c AS (
        SELECT event_type, bar_ts,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM obs
    ),
    p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.vc AS xa, b.vc AS xb
        FROM c a JOIN c b
          ON a.bar_ts = b.bar_ts AND a.event_type < b.event_type
    ),
    g AS (
        SELECT type_a, type_b,
               count(*)   AS n,
               sum(xa)    AS sx,
               sum(xb)    AS sy,
               sum(xa*xb) AS sxy,
               sum(xa*xa) AS sxx,
               sum(xb*xb) AS syy
        FROM p GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_obs,
           CASE WHEN n > 1 AND CAST(n*sxx - sx*sx AS DOUBLE) > 0
                         AND CAST(n*syy - sy*sy AS DOUBLE) > 0 THEN
             CAST(n*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
           END AS corr
    FROM g
    """,
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise correlation matrix across ALL series (upper
    triangle): the cross-asset panel behind portfolio/beta work,
    computed WITHOUT pivoting or collecting the series list - one
    self-equi-join of the hourly close grid on the bar key (type_a <
    type_b keeps each pair once) and one partial-combined aggregate
    over integer-cents moments; exact across engines. At 100 TB the
    join input is the bar grid (bars x series), and the pair fan-out
    is series-count-bounded per bar - the shuffle key is the hour."""
    obs = _hourly_close(spark, sf_dir)
    c = obs.select(
        "event_type",
        "bar_ts",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    a = c.select(
        F.col("event_type").alias("type_a"),
        "bar_ts",
        F.col("vc").alias("xa"),
    )
    b = c.select(
        F.col("event_type").alias("type_b"),
        "bar_ts",
        F.col("vc").alias("xb"),
    )
    p = a.join(b, "bar_ts").filter(F.col("type_a") < F.col("type_b"))
    g = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    dx = (n * sxx - sx * sx).cast("double")
    dy = (n * syy - sy * sy).cast("double")
    return g.select(
        "type_a",
        "type_b",
        n.alias("n_obs"),
        F.when((n > 1) & (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy))).alias(
            "corr"
        ),
    )


@q(
    "drift_monitor_batch",
    oracle="""
    WITH bounds AS (
        SELECT min(value) AS lo0, max(value) AS hi0
        FROM events
        WHERE ts < TIMESTAMP '2024-01-15' AND value IS NOT NULL
    ),
    b AS (
        SELECT lo0 AS lo,
               CASE WHEN hi0 = lo0 THEN lo0 + 1.0 ELSE hi0 END AS hi
        FROM bounds
    ),
    binned AS (
        SELECT event_type,
               CAST(least(greatest(
                   floor((value - lo) / (hi - lo) * 64), 0), 63) AS INT) AS v,
               CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END
                 AS is_ref
        FROM events, b
        WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, v,
               CAST(sum(is_ref) AS BIGINT)     AS ca,
               CAST(sum(1 - is_ref) AS BIGINT) AS cb
        FROM binned GROUP BY event_type, v
    ),
    s AS (
        SELECT event_type,
               sum(ca) OVER (PARTITION BY event_type ORDER BY v) AS cum_a,
               sum(cb) OVER (PARTITION BY event_type ORDER BY v) AS cum_b,
               sum(ca) OVER (PARTITION BY event_type) AS na,
               sum(cb) OVER (PARTITION BY event_type) AS nb
        FROM g
    )
    SELECT event_type,
           max(CASE WHEN na > 0 AND nb > 0 THEN
                 abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE))
               END) AS ks,
           CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b
    FROM s GROUP BY event_type
    """,
)
def drift_monitor_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift monitor's EXACT arithmetic, certified in
    batch: streaming.drift.reference_counts + batch_ks replayed over a
    static before/after split of events (reference = pre-2024-01-15,
    "micro-batch" = the rest), per event_type, 64 clamped fixed-grid
    bins over the reference's global [lo, hi]. The oracle recomputes
    the same floor-clamp bin edges and integer cumulative ECDFs in
    DuckDB - identical IEEE expression shapes, so the binned KS is
    bit-exact across engines. This closes the monitor's last
    pytest-only gap: the streamed path is already pinned equal to
    batch_ks by test_drift, and batch_ks itself is now oracle-PASS."""
    from ..streaming.drift import batch_ks, reference_counts

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    ref_df = e.filter(F.col("ts") < cut).select("event_type", "value")
    batch_df = e.filter(F.col("ts") >= cut).select("event_type", "value")
    # cache=False: the monitor caches the reference to amortize it
    # across micro-batches; a one-shot certificate evaluates it once
    ref, lo, hi = reference_counts(
        ref_df, "value", ["event_type"], bins=64, cache=False
    )
    return batch_ks(batch_df, ref, lo, hi, "value", ["event_type"], bins=64)


@q(
    "auc_daily",
    oracle="""
    WITH s AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS score_date,
               value,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN 'a' ELSE 'b' END AS side
        FROM events
        WHERE value IS NOT NULL
    ),
    r AS (
        SELECT score_date, value, side,
               2 * CAST(rank() OVER (PARTITION BY score_date
                                     ORDER BY value) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY score_date, value)
                        AS BIGINT) - 1 AS r2
        FROM s
    ),
    g AS (
        SELECT score_date,
               CAST(count(*) FILTER (WHERE side = 'a') AS BIGINT) AS n_pos,
               CAST(count(*) FILTER (WHERE side = 'b') AS BIGINT) AS n_neg,
               CAST(sum(r2)  FILTER (WHERE side = 'a') AS BIGINT) AS sr2a
        FROM r GROUP BY score_date
    )
    SELECT score_date, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             (CAST(sr2a - n_pos * (n_pos + 1) AS DOUBLE) / 2)
               / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END AS auc
    FROM g
    """,
)
def auc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ROC AUC of the event value as a conversion score
    (operators.evaluation.binary_auc): does value rank
    purchase/signup events above the rest, per day - the
    model-acceptance gate computed engine-exact. AUC == Mann-Whitney
    U / (n_pos*n_neg), so it inherits the rank-from-counts shape: the
    ranking window runs over per-(day, distinct-value) counts, never
    rows, and the oracle's row-level rank() formulation landing on the
    identical bits IS the certificate that the counts rewrite is
    exact."""
    from ..operators.evaluation import binary_auc

    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.to_date("ts").alias("score_date"),
        "value",
        F.col("event_type").isin("purchase", "signup").alias("is_conv"),
    )
    return binary_auc(scored, "value", "is_conv", by=["score_date"])


@q(
    "auc_daily_binned",
    oracle="""
    WITH b AS (
        SELECT CAST(min(value) AS DOUBLE) AS lo,
               CAST(max(value) AS DOUBLE) AS hi
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS score_date,
               CASE WHEN value >= b.hi THEN CAST(65 AS BIGINT)
                    ELSE CAST(floor(
                        64.0 * (CAST(value AS DOUBLE) - b.lo)
                        / (b.hi - b.lo) + 1) AS BIGINT)
               END AS v,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN 'a' ELSE 'b' END AS side
        FROM events, b
        WHERE value IS NOT NULL
    ),
    r AS (
        SELECT score_date, v, side,
               2 * CAST(rank() OVER (PARTITION BY score_date
                                     ORDER BY v) AS BIGINT)
                 + CAST(count(*) OVER (PARTITION BY score_date, v)
                        AS BIGINT) - 1 AS r2
        FROM s
    ),
    g AS (
        SELECT score_date,
               CAST(count(*) FILTER (WHERE side = 'a') AS BIGINT) AS n_pos,
               CAST(count(*) FILTER (WHERE side = 'b') AS BIGINT) AS n_neg,
               CAST(sum(r2)  FILTER (WHERE side = 'a') AS BIGINT) AS sr2a
        FROM r GROUP BY score_date
    )
    SELECT score_date, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             (CAST(sr2a - n_pos * (n_pos + 1) AS DOUBLE) / 2)
               / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
           END AS auc
    FROM g
    """,
)
def auc_daily_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``auc_daily`` under the binned scale tier
    (operators.evaluation.binary_auc with ``bins=64``): scores are
    quantized onto a global 64-bucket ``width_bucket`` grid BEFORE
    ranking, so the per-day rank window's input is capped at ~66 rows
    per group at any corpus size - the tier continuous float scores
    need (exact rank-from-counts degenerates to distinct~=row count
    there). The oracle replays the grid arithmetic bit-for-bit
    (floor(bins*(v-lo)/(hi-lo)+1), hi -> bins+1) and the identical
    rank machinery over bucket indices, certifying that quantization
    itself is engine-exact - the approximation is only
    binned-vs-exact AUC, bounded in tests/test_evaluation.py."""
    from ..operators.evaluation import binary_auc

    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.to_date("ts").alias("score_date"),
        "value",
        F.col("event_type").isin("purchase", "signup").alias("is_conv"),
    )
    return binary_auc(scored, "value", "is_conv", by=["score_date"], bins=64)


@q(
    "lift_deciles",
    oracle="""
    WITH s AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS score_date,
               value AS sc,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN 1 ELSE 0 END AS pos
        FROM events
        WHERE value IS NOT NULL
    ),
    g AS (
        SELECT score_date, sc,
               CAST(count(*) AS BIGINT) AS t,
               CAST(sum(pos) AS BIGINT) AS p
        FROM s GROUP BY score_date, sc
    ),
    st AS (
        SELECT score_date, t, p,
               sum(t) OVER (PARTITION BY score_date
                            ORDER BY sc DESC) AS cum,
               sum(t) OVER (PARTITION BY score_date) AS n
        FROM g
    ),
    per AS (
        SELECT score_date,
               CAST(ceil(CAST(cum AS DOUBLE) * 10
                         / CAST(n AS DOUBLE)) AS BIGINT) AS decile,
               CAST(sum(t) AS BIGINT) AS n_rows,
               CAST(sum(p) AS BIGINT) AS n_pos
        FROM st GROUP BY score_date, decile
    ),
    fin AS (
        SELECT score_date, decile, n_rows, n_pos,
               sum(n_rows) OVER (PARTITION BY score_date
                                 ORDER BY decile) AS cum_rows,
               sum(n_pos)  OVER (PARTITION BY score_date
                                 ORDER BY decile) AS cum_pos,
               sum(n_rows) OVER (PARTITION BY score_date) AS tot_rows,
               sum(n_pos)  OVER (PARTITION BY score_date) AS tot_pos
        FROM per
    )
    SELECT score_date, decile, n_rows, n_pos,
           CAST(cum_rows AS BIGINT) AS cum_rows,
           CAST(cum_pos  AS BIGINT) AS cum_pos,
           CASE WHEN n_rows > 0 AND tot_pos > 0 THEN
             (CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
               / (CAST(tot_pos AS DOUBLE) / CAST(tot_rows AS DOUBLE))
           END AS lift,
           CASE WHEN tot_pos > 0 THEN
             CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)
           END AS cum_gain
    FROM fin
    """,
)
def lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day decile lift/gain of the conversion score
    (operators.evaluation.score_deciles): bucket events by descending
    value into 10 value-deciles and report counts, lift over the base
    conversion rate, and cumulative gain. Tie groups land wholly in
    the bucket of their last cumulative position - deterministic,
    engine-exact, and computable from per-distinct-score counts (no
    positional ntile, no row-level global sort)."""
    from ..operators.evaluation import score_deciles

    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.to_date("ts").alias("score_date"),
        "value",
        F.col("event_type").isin("purchase", "signup").alias("is_conv"),
    )
    return score_deciles(scored, "value", "is_conv", by=["score_date"])


@q(
    "confusion_gate",
    oracle="""
    WITH s AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS score_date,
               value >= 250.0 AS pred,
               event_type IN ('purchase', 'signup') AS lab
        FROM events
        WHERE value IS NOT NULL
    ),
    g AS (
        SELECT score_date,
               CAST(count(*) FILTER (WHERE pred AND lab)         AS BIGINT) AS tp,
               CAST(count(*) FILTER (WHERE pred AND NOT lab)     AS BIGINT) AS fp,
               CAST(count(*) FILTER (WHERE NOT pred AND NOT lab) AS BIGINT) AS tn,
               CAST(count(*) FILTER (WHERE NOT pred AND lab)     AS BIGINT) AS fn
        FROM s GROUP BY score_date
    )
    SELECT score_date, tp, fp, tn, fn,
           CASE WHEN tp + fp > 0 THEN
             CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
           END AS precision,
           CASE WHEN tp + fn > 0 THEN
             CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
           END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             2 * CAST(tp AS DOUBLE)
               / (2 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
                  + CAST(fn AS DOUBLE))
           END AS f1
    FROM g
    """,
)
def confusion_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day confusion counts + precision/recall/F1 at the
    value >= 250 operating point
    (operators.evaluation.confusion_at_threshold) - the deployed-
    cutoff companion to auc_daily. Four bigint cells from one
    partial-combined aggregate; every rate is a fixed IEEE expression,
    NULL when undefined."""
    from ..operators.evaluation import confusion_at_threshold

    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.to_date("ts").alias("score_date"),
        "value",
        F.col("event_type").isin("purchase", "signup").alias("is_conv"),
    )
    return confusion_at_threshold(
        scored, "value", "is_conv", threshold=250.0, by=["score_date"]
    )


@q(
    "dedup_keep_set",
    oracle="""
    WITH RECURSIVE sh AS MATERIALIZED (
        SELECT doc_id, source,
               list_distinct([
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in generate_series(1, greatest(len(w) - 2, 0))
               ]) AS shingles
        FROM (SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS w
              FROM documents)
    ),
    p AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / greatest(len(list_distinct(list_concat(a.shingles,
                                                       b.shingles))), 1)
              > 0.01
    ),
    ud AS (SELECT id_a AS a, id_b AS b FROM p
           UNION SELECT id_b, id_a FROM p),
    reach(src, dst) AS (
        SELECT a AS src, a AS dst FROM ud
        UNION
        SELECT r.src, ud.b FROM reach r JOIN ud ON r.dst = ud.a
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (
        SELECT src FROM reach GROUP BY src HAVING min(dst) < src
    )
    """,
)
def dedup_keep_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END near-dup keep-set certificate: exact 3-gram Jaccard
    candidate pairs (operators.dedup.ngram_jaccard_pairs, bucketed by
    source - the already-certified pair stage) -> connected components
    -> drop every member except the min-id representative
    (operators.dedup.dedup_keep_representatives, the operator the
    corpus pipeline and streaming ingest both call, previously
    pytest-only). The oracle recomputes the pairs in SQL, closes them
    with WITH RECURSIVE, and keeps documents whose component
    representative is themselves - so pair generation, component
    labeling, and the anti-join survivor semantics are certified
    TOGETHER on real corpus data (170 of 500 docs drop at sf0.01).
    Spark side runs the production operators unchanged (driver
    union-find fast path at this pair count; min-label propagation
    past 1M edges)."""
    from ..operators.dedup import (
        dedup_keep_representatives,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", "source", n=3, threshold=0.01
    )
    return dedup_keep_representatives(d, pairs, "doc_id").select(
        "doc_id", "source"
    )
