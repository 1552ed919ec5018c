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
