"""Round-10 analytics extensions - registered past the certified
window (parity-verified locally by tools/parity.py, the driver's
identical check, no certificate).

Same cross-engine exactness discipline as the earlier analytics
batteries: every corpus-sized reduction is an integer (int-cents
fix-point, bigint counts), selections instead of interpolations, and
any final float is ONE fixed IEEE expression over those integers
(single divisions/multiplications of exactly-convertible bigints are
correctly rounded on both engines), so the DuckDB oracles replay each
query bit-for-bit with no rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q

_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


@q(
    "topn_with_other",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand AS brand,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT) AS rev_c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT brand, rev_c,
               row_number() OVER (ORDER BY rev_c DESC, brand) AS rn
        FROM rev
    )
    SELECT CASE WHEN rn <= 5 THEN brand ELSE 'OTHER' END AS label,
           CAST(sum(rev_c) AS BIGINT) AS rev_c,
           CAST(count(*) AS BIGINT) AS n_brands
    FROM ranked GROUP BY 1
    """,
)
def topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + OTHER rollup - the BI staple every revenue dashboard
    renders (top 5 brands named, the tail folded into one bucket so
    shares still sum to the whole). Exactness: integer-cents revenue,
    rank ties broken by brand (unique), so the N-boundary is
    deterministic on both engines.

    Scale shape: one partial-combined brand aggregate (25 rows at any
    SF - brand is an enum), ranked by a whitelisted global window
    over those 25 rows, then a 6-row regroup. part joins UNHINTED
    (it scales with SF; AQE broadcasts while small)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.expr(_CENTS)).alias("rev_c"))
    )
    rn = F.row_number().over(W.orderBy(F.col("rev_c").desc(), "brand"))
    ranked = rev.withColumn("rn", rn)
    return (
        ranked.select(
            F.when(F.col("rn") <= 5, F.col("brand"))
            .otherwise(F.lit("OTHER"))
            .alias("label"),
            "rev_c",
        )
        .groupBy("label")
        .agg(
            F.sum("rev_c").alias("rev_c"),
            F.count(F.lit(1)).alias("n_brands"),
        )
    )


@q(
    "share_tree",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation, r.r_name AS region,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ),
    reg AS (
        SELECT *,
               CAST(sum(rev_c) OVER (PARTITION BY region) AS BIGINT)
                   AS region_c
        FROM rev
    ),
    tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM rev)
    SELECT region, nation, rev_c, region_c, total_c,
           CAST((CAST(rev_c AS HUGEINT) * 1000000) // region_c
                AS BIGINT) AS share_region_ppm,
           CAST((CAST(rev_c AS HUGEINT) * 1000000) // total_c
                AS BIGINT) AS share_total_ppm
    FROM reg CROSS JOIN tot
    """,
)
def share_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent revenue tree (region -> nation):
    each nation's exact integer-ppm share of its region AND of the
    whole corpus - the drill-down share panel, with shares that sum
    to 1e6 per level up to truncation. Integer DIV ppm through
    DECIMAL(38,0)/HUGEINT (the engine-agreed pair: bigint*1e6 wraps
    silently at ~9e12 cents under non-ANSI Spark).

    Scale shape: one orders x customer join (customer UNHINTED - it
    scales; nation/region broadcast, bounded forever), one
    partial-combined 25-row nation aggregate; the region window and
    one-row total run over those 25 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
        ).alias("_c")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
        .agg(F.sum("_c").alias("rev_c"))
    )
    reg = rev.withColumn(
        "region_c", F.sum("rev_c").over(W.partitionBy("region"))
    )
    tot = rev.agg(F.sum("rev_c").alias("total_c"))
    return reg.crossJoin(F.broadcast(tot)).select(
        "region",
        "nation",
        "rev_c",
        "region_c",
        "total_c",
        F.expr(
            "CAST((CAST(rev_c AS DECIMAL(38,0)) * 1000000)"
            " DIV region_c AS BIGINT)"
        ).alias("share_region_ppm"),
        F.expr(
            "CAST((CAST(rev_c AS DECIMAL(38,0)) * 1000000)"
            " DIV total_c AS BIGINT)"
        ).alias("share_total_ppm"),
    )


@q(
    "distinctive_tokens",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> x <> '')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c_s
        FROM tok GROUP BY 1, 2
    ),
    tt AS (SELECT token, CAST(sum(c_s) AS BIGINT) AS c_t
           FROM st GROUP BY 1),
    ns AS (SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s
           FROM st GROUP BY 1),
    vn AS (SELECT CAST(count(*) AS BIGINT) AS v,
                  CAST(sum(c_t) AS BIGINT) AS n FROM tt),
    scored AS (
        SELECT st.source, st.token, st.c_s,
               CAST(tt.c_t - st.c_s AS BIGINT) AS c_rest,
               (CAST(st.c_s + 1 AS DOUBLE) / CAST(ns.n_s + vn.v AS DOUBLE))
               * (CAST(vn.n - ns.n_s + vn.v AS DOUBLE)
                  / CAST(tt.c_t - st.c_s + 1 AS DOUBLE)) AS score
        FROM st JOIN tt USING (token) JOIN ns USING (source)
        CROSS JOIN vn
    )
    SELECT source, token, c_s, c_rest, score
    FROM (SELECT *, row_number() OVER (
              PARTITION BY source ORDER BY score DESC, token) AS rn
          FROM scored)
    WHERE rn <= 8
    """,
)
def distinctive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary: the 8 tokens most
    over-represented in each source vs the rest of the corpus, by
    add-one-smoothed rate ratio

        score = ((c_s+1)/(N_s+V)) * ((N_rest+V)/(c_rest+1))

    - the log-odds-ratio diagnostic of corpus-mixing dashboards with
    the log dropped (monotone, so the ranking is identical and the
    score stays EXACT across engines: bigint counts feed three
    correctly-rounded IEEE ops, no transcendentals - the tfidf_topk
    1-ulp lesson applied at design time). Ties break by token.

    Scale shape: the explode is corpus-sized (the inverted-index
    posture) feeding one partial-combined (source, token) count;
    everything downstream is vocabulary-sized. The per-source top-8
    is a WindowGroupLimit partitioned by source; the one-row (V, N)
    frame broadcasts (global aggregate, auto-exempt)."""
    from ..operators.ranking import word_tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(word_tokens("text")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c_s")
    )
    tt = st.groupBy("token").agg(F.sum("c_s").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    vn = tt.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c_t").alias("n")
    )
    scored = (
        st.join(tt, "token")
        .join(ns, "source")
        .crossJoin(F.broadcast(vn))
        .select(
            "source",
            "token",
            "c_s",
            (F.col("c_t") - F.col("c_s")).alias("c_rest"),
            (
                (
                    (F.col("c_s") + 1).cast("double")
                    / (F.col("n_s") + F.col("v")).cast("double")
                )
                * (
                    (F.col("n") - F.col("n_s") + F.col("v")).cast("double")
                    / (F.col("c_t") - F.col("c_s") + 1).cast("double")
                )
            ).alias("score"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("score").desc(), "token")
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= 8)
        .drop("_rn")
    )


@q(
    "snm_pairs",
    oracle="""
    WITH ranked AS (
        SELECT p_partkey AS id, p_name AS key,
               substring(lower(p_name), 1, 1) AS blk,
               row_number() OVER (
                   PARTITION BY substring(lower(p_name), 1, 1)
                   ORDER BY p_name, p_partkey) AS rn
        FROM part
    )
    SELECT a.id AS id_a, a.key AS key_a, b.id AS id_b, b.key AS key_b,
           CAST(levenshtein(a.key, b.key) AS INT) AS dist
    FROM ranked a JOIN ranked b
      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4
    WHERE levenshtein(a.key, b.key) <= 3
    """,
)
def snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution over part names
    (operators.fuzzy.sorted_neighborhood_pairs): rank names inside
    first-letter blocks, compare each row to its next 4 neighbors,
    keep pairs within edit distance 3 - the OTHER classic blocking
    family next to the deletion-variant join (arbitrary distance,
    documented in-block recall trade). The oracle replays the exact
    rank-and-window walk with DuckDB's levenshtein.

    Scale shape: the neighbor set builds in-row (sequence explode)
    and joins back EQUI on (block, rank) - candidates are exactly
    n x window, never the n^2 of a rank-range self-join; the rank
    window partitions by block."""
    from ..operators.fuzzy import sorted_neighborhood_pairs

    p = load_table(spark, sf_dir, "part")
    return sorted_neighborhood_pairs(
        p, "p_partkey", "p_name", window=4, max_distance=3, block_len=1
    ).select(
        "id_a", "key_a", "id_b", "key_b", F.col("dist").cast("int").alias("dist")
    )


@q(
    "new_product_adoption",
    oracle="""
    WITH launch AS (
        SELECT l_partkey,
               CAST(min(epoch_us(l_shipdate) // 604800000000)
                    AS BIGINT) AS launch_wk
        FROM lineitem GROUP BY 1
    ),
    flows AS (
        SELECT p.p_brand AS brand,
               CAST(epoch_us(l.l_shipdate) // 604800000000
                    - la.launch_wk AS BIGINT) AS week_offset,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS cents,
               l.l_partkey
        FROM lineitem l
        JOIN launch la ON l.l_partkey = la.l_partkey
        JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT brand, week_offset,
           CAST(sum(cents) AS BIGINT) AS rev_c,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM flows WHERE week_offset <= 8
    GROUP BY 1, 2
    """,
)
def new_product_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-product adoption curve: per brand, revenue in each of the
    first 9 weeks after a part's FIRST sale (launch-aligned weekly
    revenue - the ramp shape a merchandiser reads before widening a
    catalog). Exact integer cents, epoch-week integer division on
    both engines.

    Scale shape: one partial-combined per-part launch-week aggregate,
    joined back to the fact (key-partitioned equi join) and to part
    for the brand (UNHINTED - part scales); output is brand x 9
    weeks, bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    wk = F.expr("unix_micros(cast(l_shipdate as timestamp)) DIV 604800000000")
    launch = li.groupBy("l_partkey").agg(F.min(wk).alias("launch_wk"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    flows = (
        li.join(launch, "l_partkey")
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            (wk - F.col("launch_wk")).alias("week_offset"),
            F.expr(_CENTS).alias("cents"),
            "l_partkey",
        )
        .filter(F.col("week_offset") <= 8)
    )
    return flows.groupBy("brand", "week_offset").agg(
        F.sum("cents").alias("rev_c"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@q(
    "inventory_balance",
    oracle="""
    WITH moves AS (
        SELECT l_partkey,
               CASE WHEN l_returnflag = 'R'
                    THEN -CAST(l_quantity AS BIGINT)
                    ELSE CAST(l_quantity AS BIGINT) END AS delta,
               l_shipdate, l_orderkey, l_linenumber
        FROM lineitem
    ),
    run AS (
        SELECT l_partkey, delta,
               CAST(sum(delta) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS bal
        FROM moves
    )
    SELECT l_partkey AS part,
           CAST(count(*) AS BIGINT) AS n_moves,
           CAST(min(bal) AS BIGINT) AS min_bal,
           CAST(max(bal) AS BIGINT) AS max_bal,
           CAST(sum(delta) AS BIGINT) AS end_bal
    FROM run GROUP BY 1
    """,
)
def inventory_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running inventory balance per part: shipments add stock,
    returns (l_returnflag = 'R') remove it; the panel reports each
    part's movement count, lowest and highest running balance, and
    final balance - the stock-out / overstock radar, all exact
    bigints over the integral l_quantity.

    Scale shape: ONE per-part running window (partitioned, ordered by
    the deterministic (shipdate, orderkey, linenumber) total order)
    feeding one partial-combined per-part aggregate; output is
    part-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    delta = F.when(
        F.col("l_returnflag") == "R",
        -F.col("l_quantity").cast("bigint"),
    ).otherwise(F.col("l_quantity").cast("bigint"))
    w = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = li.select(
        "l_partkey",
        delta.alias("delta"),
        F.sum(delta).over(w).alias("bal"),
    )
    return run.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.min("bal").alias("min_bal"),
        F.max("bal").alias("max_bal"),
        # the final balance IS the per-part delta total - no
        # last-row lookup needed
        F.sum("delta").alias("end_bal"),
    )


@q(
    "price_dispersion",
    oracle="""
    WITH x AS (
        SELECT p.p_brand AS brand,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS HUGEINT) AS c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n,
               sum(c) AS s, sum(c * c) AS ss
        FROM x GROUP BY 1
    )
    SELECT brand, n,
           CAST(s // n AS BIGINT) AS mean_c,
           CAST((n * ss - s * s) // (n * (n - 1)) AS BIGINT) AS var_c2
    FROM m WHERE n > 1
    """,
)
def price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price dispersion by EXACT integer moments: variance
    of the discounted line price in cents^2 as

        var = (n * sum(x^2) - sum(x)^2) / (n * (n - 1))

    with every term held in DECIMAL(38,0)/HUGEINT (sum(x^2) passes
    bigint range at ~1e19 on a 100 TB fact table; sum(x)^2 reaches
    ~1e26) and the final division integer-truncating - the second-
    moment extension of the engine's integer-moments recipe, zero
    float accumulation anywhere. Single-line brands drop (variance
    undefined at n=1).

    Scale shape: one partial-combined brand aggregate over the fact
    join (part UNHINTED); the moment algebra runs on 25 brand
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.expr(_CENTS).cast("decimal(38,0)").alias("c"),
    )
    m = x.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.expr("c * c")).alias("ss"),
    )
    return m.filter(F.col("n") > 1).select(
        "brand",
        "n",
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_c"),
        F.expr(
            "CAST((n * ss - s * s) DIV (CAST(n AS DECIMAL(38,0))"
            " * (n - 1)) AS BIGINT)"
        ).alias("var_c2"),
    )


@q(
    "order_lines_histogram",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_lines
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    )
    SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
    FROM per_order GROUP BY 1
    """,
)
def order_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order histogram INCLUDING the zero bucket: orders
    with no line rows count at n_lines = 0 (a left join + count of
    the nullable side - an inner-join histogram silently hides
    exactly the orders most worth investigating). Exact bigints.

    Scale shape: one key-partitioned left join + two partial-combined
    aggregates; output bounded by the max basket size."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_lines"))
    )
    return per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@q(
    "weekly_active_overlap",
    oracle="""
    WITH act AS (
        SELECT DISTINCT o_custkey,
               epoch_us(o_orderdate) // 604800000000 AS wk
        FROM orders
    ),
    per_wk AS (
        SELECT wk, CAST(count(*) AS BIGINT) AS n_active
        FROM act GROUP BY 1
    ),
    ret AS (
        SELECT a.wk, CAST(count(*) AS BIGINT) AS n_retained
        FROM act a JOIN act b
          ON a.o_custkey = b.o_custkey AND b.wk = a.wk + 1
        GROUP BY 1
    )
    SELECT p.wk, p.n_active,
           CAST(coalesce(nx.n_active, 0) AS BIGINT) AS n_active_next,
           CAST(coalesce(r.n_retained, 0) AS BIGINT) AS n_retained
    FROM per_wk p
    LEFT JOIN per_wk nx ON nx.wk = p.wk + 1
    LEFT JOIN ret r ON r.wk = p.wk
    """,
)
def weekly_active_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week active-customer retention: per week, the exact
    count of customers active that week, the next week, and in BOTH
    (the set intersection a sketch would approximate - theta sketches
    estimate this panel; this is its exact certificate). All bigint
    set cardinalities, epoch-week integer division.

    Scale shape: one distinct (customer, week) reduction, one
    key-partitioned self-join shifted by a week, calendar-bounded
    aggregates and output."""
    o = load_table(spark, sf_dir, "orders")
    wk = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) DIV 604800000000"
    )
    act = o.select("o_custkey", wk.alias("wk")).distinct()
    per_wk = act.groupBy("wk").agg(F.count(F.lit(1)).alias("n_active"))
    b = act.select(
        F.col("o_custkey"), (F.col("wk") - 1).alias("wk")
    )
    ret = (
        act.join(b, ["o_custkey", "wk"])
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    nx = per_wk.select(
        (F.col("wk") - 1).alias("wk"),
        F.col("n_active").alias("n_active_next"),
    )
    return (
        per_wk.join(nx, "wk", "left")
        .join(ret, "wk", "left")
        .select(
            "wk",
            "n_active",
            F.coalesce("n_active_next", F.lit(0)).alias("n_active_next"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
        )
    )


@q(
    "win_navigation",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderdate
        FROM orders
    )
    SELECT o_orderkey, o_custkey, cents,
           first_value(cents) OVER w AS first_c,
           last_value(cents) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS last_c,
           nth_value(cents, 2) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS second_c
    FROM o
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The navigation window functions certified as the LITERAL SQL
    functions (the same completion win_distribution gave the
    distribution family): per customer ordered by (orderdate,
    orderkey) - a unique total order - first_value on the default
    running frame, and last_value / nth_value(2) on an explicit
    whole-partition frame (the default frame's last_value is the
    CURRENT row, the classic SQL footgun; the whole-partition frame
    is computed once per partition, so the engine-wide quadratic
    forward-frame ban does not apply). All exact int-cents values.

    Scale shape: one partitioned window sort shared by all three
    functions; no global window, no forward running frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderdate",
    )
    running = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    whole = running.rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.first("cents").over(running).alias("first_c"),
        F.last("cents").over(whole).alias("last_c"),
        F.nth_value("cents", 2).over(whole).alias("second_c"),
    )


@q(
    "skipgram_transitions",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, ts, event_id
        FROM events
    ),
    nxt AS (
        SELECT user_id, event_type AS src,
               lead(event_type, 1) OVER w AS n1,
               lead(event_type, 2) OVER w AS n2,
               lead(event_type, 3) OVER w AS n3
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pairs AS (
        SELECT user_id, src, 1 AS gap, n1 AS dst FROM nxt WHERE n1 IS NOT NULL
        UNION ALL
        SELECT user_id, src, 2, n2 FROM nxt WHERE n2 IS NOT NULL
        UNION ALL
        SELECT user_id, src, 3, n3 FROM nxt WHERE n3 IS NOT NULL
    )
    SELECT src, dst, CAST(gap AS INT) AS gap,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1, 2, 3
    """,
)
def skipgram_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram event transitions: (src, dst) counts at forward
    offsets 1..3 within each user's timeline - the context-window
    generalization of markov_transitions' adjacent-only pairs (the
    co-occurrence statistic sequence-embedding pipelines train on,
    and a funnel diagnostic that sees A->...->B through one
    interleaved step). Deterministic (ts, event_id) order.

    Scale shape: the three leads share ONE window sort per user
    (three offsets of the same frame - the indicator_panel collapsed-
    window discipline); the pair fan-out is exactly 3x events, and
    the aggregate is partial-combined with a (types^2 x 3)-bounded
    output."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # STAGE the window columns in their own select (window exprs
    # cannot sit inside generators, and referencing nxt three times
    # in a union would duplicate the scan+sort subtree - the first
    # cut's plan showed THREE Window branches under a Union), then
    # explode an in-row (gap, dst) struct array: one scan, one
    # shuffle, one sort, one Generate.
    nxt = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
        F.lead("event_type", 3).over(w).alias("n3"),
    )
    pair = nxt.select(
        "src",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).cast("int").alias("gap"),
                        F.col(f"n{g}").alias("dst"),
                    )
                    for g in (1, 2, 3)
                ]
            )
        ).alias("p"),
    ).filter(F.col("p.dst").isNotNull())
    return pair.groupBy(
        "src", F.col("p.dst").alias("dst"), F.col("p.gap").alias("gap")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


@q(
    "segment_brand_diversity",
    oracle="""
    WITH b AS (
        SELECT c.c_mktsegment AS segment, p.p_brand AS brand,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT segment, CAST(sum(n) AS BIGINT) AS total,
               sum(CAST(n AS HUGEINT) * n) AS ss,
               CAST(count(*) AS BIGINT) AS n_brands
        FROM b GROUP BY 1
    )
    SELECT segment, total, n_brands,
           CAST(((CAST(total AS HUGEINT) * total - ss) * 1000000000)
                // (CAST(total AS HUGEINT) * total) AS BIGINT)
               AS simpson_ppb
    FROM m
    """,
)
def segment_brand_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-mix diversity per market segment by the Gini-Simpson
    index 1 - sum(p_b^2), reported as EXACT integer parts-per-billion:
    (total^2 - sum(n^2)) * 1e9 DIV total^2 with every term held in
    DECIMAL(38,0)/HUGEINT - at ~100x scale a per-(segment, brand)
    count reaches ~5e9 and its bigint square wraps silently under
    non-ANSI Spark (the price_dispersion overflow rule; the review
    caught this query squaring bigints). Transcendental-free by
    design (Shannon needs logs); complements concentration_hhi with
    the segment x brand purchase mix.

    Scale shape: fact join (dims UNHINTED where they scale), one
    partial-combined (segment, brand) count, 5-row moment algebra."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = b.groupBy("segment").agg(
        F.sum("n").alias("total"),
        F.sum(
            F.col("n").cast("decimal(38,0)") * F.col("n")
        ).alias("ss"),
        F.count(F.lit(1)).alias("n_brands"),
    )
    return m.select(
        "segment",
        "total",
        "n_brands",
        F.expr(
            "CAST(((CAST(total AS DECIMAL(38,0)) * total - ss)"
            " * 1000000000)"
            " DIV (CAST(total AS DECIMAL(38,0)) * total) AS BIGINT)"
        ).alias("simpson_ppb"),
    )


@q(
    "backlog_aging",
    oracle="""
    WITH mx AS (
        SELECT max(o_orderdate) AS now FROM orders
    ),
    open_orders AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(mx.now AS DATE)) AS BIGINT) AS age_d,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o CROSS JOIN mx
        WHERE o.o_orderstatus IS NULL OR o.o_orderstatus <> 'F'
    )
    SELECT priority,
           CASE WHEN age_d <= 30 THEN '0-30'
                WHEN age_d <= 90 THEN '31-90'
                WHEN age_d <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS value_c
    FROM open_orders GROUP BY 1, 2
    """,
)
def backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: non-finalized orders (o_orderstatus
    <> 'F', with NULL counting as open - unknown is not finalized, and
    the bare != would 3VL-drop it silently) bucketed by whole days
    outstanding at the corpus's latest
    order date, by priority - the operations AR-aging staple. Integer
    day diffs against a one-row anchor (broadcast global aggregate,
    auto-exempt), exact cents.

    Scale shape: one filter + one-row anchor crossJoin + one
    partial-combined aggregate; output is priority x 4 buckets."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("now"))
    age = F.datediff(
        F.col("now").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("bigint")
    bucket = (
        F.when(F.col("age_d") <= 30, "0-30")
        .when(F.col("age_d") <= 90, "31-90")
        .when(F.col("age_d") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        # NULL status counts as OPEN (unknown is not finalized) - the
        # explicit isNull arm the bare != would silently 3VL-drop
        o.filter(
            F.col("o_orderstatus").isNull()
            | (F.col("o_orderstatus") != "F")
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("o_orderpriority").alias("priority"),
            age.alias("age_d"),
            F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("priority", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("value_c"),
        )
    )


@q(
    "equidepth_histogram",
    oracle="""
    WITH vc AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
        FROM vc
    ),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vc),
    bounds AS (
        SELECT b.b AS bucket,
               min(cum.v) AS hi
        FROM cum CROSS JOIN n, range(1, 11) AS b(b)
        WHERE cum.cum >= (b.b * n.n + 9) // 10
        GROUP BY 1
    ),
    lohi AS (
        SELECT bucket, hi,
               lag(hi) OVER (ORDER BY bucket) AS lo
        FROM bounds
    ),
    counts AS (
        SELECT l.bucket, CAST(sum(cum.c) AS BIGINT) AS n_orders
        FROM lohi l JOIN cum
          ON cum.v <= l.hi AND (l.lo IS NULL OR cum.v > l.lo)
        GROUP BY 1
    )
    SELECT l.bucket, l.lo AS lo_c, l.hi AS hi_c,
           CAST(coalesce(k.n_orders, 0) AS BIGINT) AS n_orders
    FROM lohi l LEFT JOIN counts k ON l.bucket = k.bucket
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (equal-count) histogram of order value: ten buckets
    whose boundaries are EXACT positional picks - boundary i is the
    value whose cumulative count first reaches ceil(i*n/10) - with
    honest duplicate-straddle semantics (counts differ from n/10 only
    where duplicate values cross a boundary, vs an interpolating
    approx_percentile), and EVERY bucket emitted: a boundary
    collision (one value spanning a whole decile, or n < 10) yields
    its (lo == hi) bucket with n_orders = 0 rather than silently
    dropping the row. Complements value_histogram (equi-WIDTH).

    Scale shape - the cumulative count is a TWO-PHASE distributed
    prefix sum, because order-value CENTS are nearly distinct (the
    value-count table tracks order cardinality, so a single global
    cumulative window here would funnel the fact scale through one
    task - the r10 review catch): values hash into a fixed 1024-cell
    range grid, the only global window runs over the 1024 per-cell
    subtotals, and per-value cumulatives are cell-partitioned local
    windows plus the cell offset. Boundary pick, 10-row lag, and the
    bucket-count join-back are all <= 10-row frames."""
    o = load_table(spark, sf_dir, "orders")
    vc = o.groupBy(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    # phase 1: fixed range grid; per-cell subtotals; cumulative OVER
    # CELLS (1024-row bounded global window) gives each cell the
    # count of everything before it
    lohi_v = vc.agg(
        F.min("v").alias("vlo"), F.max("v").alias("vhi")
    )
    cells = 1024
    cell = F.least(
        F.greatest(
            F.width_bucket(
                F.col("v"), F.col("vlo"), F.col("vhi") + 1, F.lit(cells)
            )
            - 1,
            F.lit(0),
        ),
        F.lit(cells - 1),
    )
    vcell = vc.crossJoin(F.broadcast(lohi_v)).select(
        "v", "c", cell.alias("_cell")
    )
    per_cell = vcell.groupBy("_cell").agg(F.sum("c").alias("_cc"))
    w_cells = W.orderBy("_cell").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    offsets = per_cell.select(
        "_cell",
        (F.sum("_cc").over(w_cells) - F.col("_cc")).alias("_before"),
    )
    # phase 2: local per-cell cumsum + the cell offset = exact global
    # cumulative count per distinct value, with NO fact-scale window
    w_local = (
        W.partitionBy("_cell")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = vcell.join(offsets, "_cell").select(
        "v",
        "c",
        (F.sum("c").over(w_local) + F.col("_before")).alias("cum"),
    )
    n = vc.agg(F.sum("c").alias("n"))
    buckets = spark.range(1, 11).select(F.col("id").alias("bucket"))
    bounds = (
        cum.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(buckets))
        .filter(F.col("cum") >= F.expr("(bucket * n + 9) DIV 10"))
        .groupBy("bucket")
        .agg(F.min("v").alias("hi"))
    )
    lohi = bounds.withColumn(
        "lo", F.lag("hi").over(W.orderBy("bucket"))
    )
    counts = (
        cum.join(
            F.broadcast(lohi),
            (F.col("v") <= F.col("hi"))
            & (F.col("lo").isNull() | (F.col("v") > F.col("lo"))),
        )
        .groupBy("bucket")
        .agg(F.sum("c").alias("n_orders"))
    )
    # every bucket emits, collision buckets with 0 (both <= 10 rows)
    return lohi.join(counts, "bucket", "left").select(
        "bucket",
        F.col("lo").alias("lo_c"),
        F.col("hi").alias("hi_c"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@q(
    "join_null_safe",
    oracle="""
    WITH a AS (
        SELECT nullif(o_orderpriority, '3-MEDIUM') AS pr,
               CAST(count(*) AS BIGINT) AS n_even
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    ),
    b AS (
        SELECT nullif(o_orderpriority, '3-MEDIUM') AS pr,
               CAST(count(*) AS BIGINT) AS n_odd
        FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
    )
    SELECT a.pr, a.n_even, b.n_odd
    FROM a JOIN b ON a.pr IS NOT DISTINCT FROM b.pr
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join certified as the LITERAL operator (`<=>` /
    IS NOT DISTINCT FROM): a plain equi join silently drops the NULL
    group (NULL = NULL is NULL under 3VL), while the null-safe
    comparison matches the two NULL keys - the semantics every
    dimension join with an 'unknown' bucket needs, and a §2B corner
    previously certified only through the null_semantics expression
    family. The NULL key is DERIVED (nullif on an enum) so both
    engines build identical nullable inputs.

    Scale shape: two partial-combined 5-row priority aggregates, then
    a null-safe join of two bounded frames. Spark plans `<=>` as a
    regular hash-join key (null-safe equality is sort/hash-joinable -
    no fallback to nested loops)."""
    o = load_table(spark, sf_dir, "orders")
    key = F.expr("nullif(o_orderpriority, '3-MEDIUM')")
    a = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy(key.alias("pr"))
        .agg(F.count(F.lit(1)).alias("n_even"))
    )
    b = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .groupBy(key.alias("pr"))
        .agg(F.count(F.lit(1)).alias("n_odd"))
    )
    return a.join(b, a["pr"].eqNullSafe(b["pr"])).select(
        a["pr"].alias("pr"), "n_even", "n_odd"
    )


@q(
    "lateral_posexplode",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '')[1:5] AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
           unnest(toks) AS token
    FROM d
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode / LATERAL position-preserving array expansion
    certified as the literal generator: the first five tokens of each
    document with their 0-based positions - the ordinal contract
    every chunker and sequence-packing step relies on (position is
    ARRAY ORDER, not a row_number over an unordered explode, which
    task-level ordering would make nondeterministic). Empty token
    lists emit nothing on both engines.

    Scale shape: one narrow scan, an in-row slice bounding the
    generator at 5 structs per document, no shuffle at all."""
    from ..operators.ranking import word_tokens

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.slice(word_tokens("text"), 1, 5).alias("toks")
    )
    return d.select(
        "doc_id", F.posexplode("toks").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
