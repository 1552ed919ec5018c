"""Round-14 analytics extensions - registered past the certified
window (parity-verified locally by tools/parity.py, the driver's
identical check, no certificate).

Same cross-engine exactness discipline as the earlier analytics
batteries: every final column is either an exact integer/decimal
reduction or an explicitly tolerance-defined boolean whose CONTRACT is
the cross-checkable thing (the agg_approx_distinct pattern - sketch
internals have no DuckDB twin, so the accuracy bound is what both
engines can agree on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import q


@q(
    "hll_datasketches_cert",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
           TRUE AS direct_ok, TRUE AS union_ok, TRUE AS union_idempotent
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def hll_datasketches_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN Apache DataSketches HLL surface (Spark 3.5+:
    hll_sketch_agg / hll_sketch_estimate / hll_union_agg) - the
    production mergeable-distinct path at 100 TB (the hand-rolled
    sketch table in operators.sketches demonstrates mergeability; the
    built-ins are what a lake rollup should actually store, binary
    sketch columns compacted per partition and unioned at read).

    Three contract legs per group, each cross-checkable without a
    DuckDB sketch twin (the agg_approx_distinct lesson):

    - direct_ok: |estimate(sketch(all rows)) - exact| within the
      published HLL error (rsd ~= 1.04/sqrt(2^lgK), lgK=12 default;
      bound at 5*rsd like the HLL++ row, floor 5 for tiny groups).
    - union_ok: sub-sketches built per (returnflag, linestatus) and
      merged with hll_union_agg estimate the SAME set within the same
      bound - the mergeability property that makes sketch columns
      shardable. The union's estimate legitimately differs from a
      direct rebuild's: DataSketches HLL carries an HIP (historical
      inverse probability) estimator that a union cannot preserve, so
      merged sketches re-estimate from registers - even a SELF-union
      shifts the estimate ~0.5% (measured); only the BOUND is promised.
    - union_idempotent: within the union path, re-adding the same
      sketch changes nothing - estimate(union(sk, sk)) equals
      estimate(union(sk, sk, sk)) EXACTLY (registers are max-merged) -
      the property that makes at-least-once sketch re-appends safe.
      (Compared 2-copy vs 3-copy, not 1-vs-2: a single-sketch union
      can pass the input through with its HIP estimator intact, which
      the first real merge then drops - measured.)

    The exact countDistinct runs as its own aggregation joined on the
    group key (the measured Expand-fanout lesson from agg_distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 1.04 / (2 ** 12) ** 0.5
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("_sk")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("n_exact")
    )
    union = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.hll_sketch_agg("l_orderkey").alias("_subsk"))
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_subsk")).alias("_est_u"))
    )
    uni2 = (
        direct.unionByName(direct)
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est_u2"))
    )
    uni3 = (
        direct.unionByName(direct)
        .unionByName(direct)
        .groupBy("l_returnflag")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est_u3"))
    )
    tol = F.greatest(F.lit(5 * rsd) * F.col("n_exact"), F.lit(5.0))
    return (
        direct.select(
            "l_returnflag", F.hll_sketch_estimate("_sk").alias("_est_d")
        )
        .join(exact, "l_returnflag")
        .join(union, "l_returnflag")
        .join(uni2, "l_returnflag")
        .join(uni3, "l_returnflag")
        .select(
            "l_returnflag",
            "n_exact",
            (F.abs(F.col("_est_d") - F.col("n_exact")) <= tol).alias("direct_ok"),
            (F.abs(F.col("_est_u") - F.col("n_exact")) <= tol).alias("union_ok"),
            (F.col("_est_u3") == F.col("_est_u2")).alias("union_idempotent"),
        )
    )


@q(
    "from_xml_cert",
    oracle="""
    SELECT o_orderstatus AS st,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
               AS total,
           CAST(SUM(2 + CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS tag_count,
           CAST(SUM(o_orderkey) AS BIGINT) AS id_sum
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def from_xml_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml (Spark 4) - the one semi-structured decode surface the
    battery didn't yet certify (JSON, VARIANT, CSV all are). Real
    LINKS-family crawls carry XML sitemaps/RSS - the reference's
    listing pages are exactly this shape (reference:
    data-downloader/data_downloader.py:83-91, the FTP listing walk).

    DuckDB has no XML reader, so the oracle replays the VARIANT
    pattern: the XML is deterministically GENERATED from columns that
    also exist relationally, parsed back typed, and the aggregate of
    the PARSED fields must equal the aggregate of the source columns -
    any attribute/element/array/decimal decode error breaks some
    group's sum. Covers: attributes (_-prefixed), typed elements
    (DECIMAL survives the string round-trip exactly - prices are
    2-dec values, embedded via an explicit decimal cast), repeated
    elements -> array (cardinality data-dependent: a third <t> only on
    status F), and bigint attribute round-trip. Malformed-input
    PERMISSIVE-null behavior is pinned in pytest (not here: the oracle
    needs every row parseable)."""
    o = load_table(spark, sf_dir, "orders")
    xml = o.select(
        F.concat(
            F.lit('<o id="'),
            F.col("o_orderkey"),
            F.lit('" st="'),
            F.col("o_orderstatus"),
            F.lit('"><p>'),
            F.col("o_totalprice").cast("decimal(12,2)"),
            F.lit("</p><c>"),
            F.col("o_orderpriority"),
            F.lit("</c><t>a</t><t>b</t>"),
            F.when(F.col("o_orderstatus") == "F", F.lit("<t>f</t>")).otherwise(
                F.lit("")
            ),
            F.lit("</o>"),
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x",
            "_id BIGINT, _st STRING, p DECIMAL(12,2), c STRING, t ARRAY<STRING>",
        ).alias("j")
    ).select("j.*")
    return parsed.groupBy(F.col("_st").alias("st")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").cast("decimal(18,2)").alias("total"),
        F.sum(F.size("t")).alias("tag_count"),
        F.sum("_id").alias("id_sum"),
    )


_HEX8 = """(  (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
                + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
                + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
                + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
                + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)
               )"""

_WORDS14 = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"


@q(
    "dsir_bucket_stats",
    oracle=f"""
    WITH w AS (
        SELECT source, {_WORDS14} AS ws FROM documents
    ),
    uni AS (SELECT source, unnest(ws) AS g FROM w),
    bi AS (
        SELECT source,
               unnest(list_transform(
                   generate_series(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1]
               )) AS g
        FROM w WHERE len(ws) >= 2
    ),
    grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    b AS (
        SELECT source, {_HEX8} % 32 AS bucket
        FROM (SELECT source, md5(concat('42', ':', g)) AS hx FROM grams)
    )
    SELECT bucket,
           CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS c_target,
           CAST(count(*) FILTER (WHERE source <> 'src0') AS BIGINT) AS c_raw
    FROM b GROUP BY bucket
    """,
)
def dsir_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED layer of DSIR importance sampling
    (operators.dsir; Xie et al. 2023): hashed bag-of-(uni+bi)gram
    bucket counts for a target corpus (source src0 - the 'specify by
    example' corpus) vs the raw pool, under the auditable md5
    coordinate (first 8 hex chars of md5(seed:gram) mod m - the
    hash_split discipline) which the oracle replays digit by digit,
    n-gram generation and all. Integer-exact end to end.

    The weighting on top (add-one smoothed log-ratio fold, float ln)
    is deliberately NOT in the oracle row - a second
    probabilistic-by-construction replay is not worth it when the
    tfidf_topk exception already documents the ln caveat; the weight
    and selection tiers are covered by an independent plain-python
    replay in pytest (same split of labor as the IVF family: exact
    oracle for the distributed reduction, differential for the float
    policy layer)."""
    from ..operators.dsir import hashed_ngram_buckets

    d = load_table(spark, sf_dir, "documents")
    feats = lambda df: hashed_ngram_buckets(  # noqa: E731
        df, "doc_id", "text", m=32, seed=42, algo="md5"
    )
    tgt = (
        feats(d.filter(F.col("source") == "src0"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("c_target"))
    )
    raw = (
        feats(d.filter(F.col("source") != "src0"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("c_raw"))
    )
    return (
        tgt.join(raw, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0)).alias("c_target"),
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
        )
    )


@q(
    "ordered_set_agg_cert",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT o_orderstatus, o_orderpriority AS mode_priority,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY cnt DESC, o_orderpriority
               ) AS rn
        FROM c
    )
    SELECT o.o_orderstatus AS st,
           any_value(m.mode_priority) AS mode_priority,
           quantile_disc(o.o_totalprice, 0.25) AS p25,
           quantile_disc(o.o_totalprice, 0.50) AS p50,
           quantile_disc(o.o_totalprice, 0.91) AS p91
    FROM orders o
    JOIN m ON m.o_orderstatus = o.o_orderstatus AND m.rn = 1
    GROUP BY o.o_orderstatus
    """,
)
def ordered_set_agg_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered-set / inverse-distribution aggregate surface
    (SQL:2008 T621-adjacent): ``mode(expr, deterministic=true)``
    (Spark 3.4+ - ties break to the SMALLEST value, which the oracle
    replays as an explicit (count desc, value asc) rank because
    DuckDB's own mode() picks an arbitrary tie winner - measured) and
    ``percentile_disc(p) WITHIN GROUP (ORDER BY x)`` (Spark 3.4+),
    which SELECTS an actual member value (smallest whose cumulative
    fraction >= p) - no interpolation arithmetic, so the replay
    against DuckDB's quantile_disc is exact on doubles, unlike
    percentile_cont (median_cert covers that with integral values).
    p91 deliberately lands off a row boundary to pin the ceiling
    rule."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_r14_orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS st,
               mode(o_orderpriority, true) AS mode_priority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p50,
               percentile_disc(0.91) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p91
        FROM _r14_orders GROUP BY o_orderstatus
        """
    )


@q(
    "regexp_bool_agg_cert",
    oracle="""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[aeiou]{2}'))) AS BIGINT)
               AS double_vowels,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '[a-z]{7,}'))
               AS BIGINT) AS n_long_word,
           CAST(SUM(CASE WHEN regexp_matches(text, '[a-z]{7,}')
                         THEN strpos(text, regexp_extract(text, '[a-z]{7,}'))
                         ELSE 0 END) AS BIGINT) AS instr_sum,
           bool_and(lower(text) = text) AS all_lower,
           bool_or(len(text) > 500) AS any_long
    FROM documents GROUP BY source
    """,
)
def regexp_bool_agg_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.5 regexp_* scalar family + the boolean aggregates,
    certified per source over real text: regexp_count (DuckDB replays
    as len(regexp_extract_all)), regexp_substr-based match counting
    (NULL on no match <-> regexp_matches filter), regexp_instr
    (1-based first-match position; DuckDB has no instr, so the oracle
    replays it as strpos(text, first_match) - sound because the
    leftmost regex match cannot be preceded by an equal substring
    that would itself have matched), and every/any (bool_and /
    bool_or). All integer/boolean reductions - exact."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(F.expr("regexp_count(text, '[aeiou]{2}')")).alias(
            "double_vowels"
        ),
        F.count_if(
            F.expr("regexp_substr(text, '[a-z]{7,}')").isNotNull()
        ).alias("n_long_word"),
        F.sum(F.expr("regexp_instr(text, '[a-z]{7,}')")).alias("instr_sum"),
        F.every(F.lower(F.col("text")) == F.col("text")).alias("all_lower"),
        F.bool_or(F.length("text") > 500).alias("any_long"),
    )


@q(
    "session_window_batch_cert",
    oracle="""
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), t AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS seq
      FROM s
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 30 MINUTE     AS session_end,
           CAST(count(*) AS BIGINT)         AS n_events
    FROM t GROUP BY user_id, seq
    """,
)
def session_window_batch_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN ``session_window`` function on a BATCH frame - the
    battery certifies the streaming form (stream_session) and the
    hand-rolled batch sessionizer (sessionize_stats); this row pins
    the built-in's batch semantics against a gaps-and-islands replay,
    INCLUDING its boundary rule: events exactly ``gap`` apart start a
    NEW session (merge requires next_ts < prev_ts + gap), which is
    the opposite boundary from operators.sessions.sessionize's
    strictly-greater split - the subtle difference this row exists to
    pin (the oracle's island rule is >= where sessionize_stats' is >).
    Window start = first event, end = last event + gap, exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@q(
    "approx_topk_builtin_cert",
    oracle="""
    SELECT o_orderstatus AS st, o_orderpriority AS item,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1, 2
    """,
)
def approx_topk_builtin_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in DataSketches frequent-items surface (Spark 4
    ``approx_top_k``): per order status, the sketch's top-5 items
    EXPLODED to (st, item, cnt) rows. With maxItemsTracked (default
    10000) >= the distinct item count (5 priorities), the sketch
    tracks every item exactly, so the exploded output must equal the
    exact GROUP BY counts row for row - the same
    capacity-exceeds-cardinality exactness contract the hand-rolled
    topk sketches row (operators.sketches) pins, now for the
    production built-in. Set equality, no rank ordering in the output
    - tie ORDER between equal counts is the one thing the sketch does
    not promise."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_r14_orders_topk")
    return spark.sql(
        """
        SELECT o_orderstatus AS st, e.item AS item,
               e.count AS cnt
        FROM (
            SELECT o_orderstatus,
                   approx_top_k(o_orderpriority, 5) AS tk
            FROM _r14_orders_topk GROUP BY o_orderstatus
        ) LATERAL VIEW explode(tk) AS e
        """
    )


@q(
    "approx_topk_merge_cert",
    oracle="""
    SELECT o_orderstatus AS st, o_orderpriority AS item,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1, 2
    """,
)
def approx_topk_merge_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE half of the built-in frequent-items surface
    (Spark 4 ``approx_top_k_accumulate`` / ``_combine`` /
    ``_estimate``) - the lake-rollup path: one sketch state per
    sub-stratum at ingest, any regrouping by sketch combine, never
    rescanning the fact table (the operators.sketches top-k row's
    contract, for the production built-ins; the companion
    approx_topk_builtin_cert covers the one-shot aggregate). Sub-
    sketches accumulate per (status, priority), combine per status,
    and the estimate must equal the exact GROUP BY counts row for row
    - capacity (10000) >= distinct items per sketch, so tracking is
    exact and the combine is an exact count merge."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_r14_orders_topkm")
    return spark.sql(
        """
        WITH acc AS (
            SELECT o_orderstatus,
                   approx_top_k_accumulate(o_orderpriority) AS st
            FROM _r14_orders_topkm
            GROUP BY o_orderstatus, o_orderpriority
        ),
        merged AS (
            SELECT o_orderstatus,
                   approx_top_k_estimate(approx_top_k_combine(st), 5) AS tk
            FROM acc GROUP BY o_orderstatus
        )
        SELECT o_orderstatus AS st, e.item AS item, e.count AS cnt
        FROM merged LATERAL VIEW explode(tk) AS e
        """
    )
