"""Generate EXPLAIN.md: the executed physical plan for each headline
query, with a quick red-flag scan (cartesian products, row-at-a-time
Python, missing pushdown). This is the artifact of the "explain the
plan and iterate until it's the plan you'd want" loop.

Usage: python tools/explain_report.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "agg_basic",
    "join_broadcast",
    "join_asof",
    "win_frames",
    "topk",
    "stream_session",
    "agg_distinct",
    "subq_family",
    "udf_scalar",
    "scan_parquet",
    "dedup_ngram_jaccard",
    "dedup_near_panel",
    "sim_topk",
    "sim_ann_panel",
    "ohlc_bars",
    "resample_ffill",
    "recursive_series",
    "harvest_pipeline",
    "corpus_clean",
    "text_analysis",
    "funnel_cohort",
    "scd2_history_events",
    "quantile_rollup",
    "multimodal_decode",
    # round-4 families
    "returns_drawdown",
    "ks_drift",
    "anomaly_mad",
    "inverted_index",
    "triangle_count",
    "flagship_star",
    # round-5 families: rank-from-counts rewrites (the Window input
    # must visibly be the distinct-value count table) + evaluation
    "winsorized_stats",
    "mannwhitney_drift",
    "gini_activity",
    "auc_daily",
    "lift_deciles",
    "drift_monitor_batch",
]

# Round-over-round plan observations worth keeping next to the trees.
NOTES = """\
## Plan notes

- **subq_family** (r3 flagged a 0.46→0.95 s mean regression): the
  physical plan is UNCHANGED vs round 2 — diffing the executed plan
  under the round-2 session conf (CBO + runtime bloom filters off)
  against the current conf shows only expression-id renumbering; the
  skeleton (broadcast left-semi join + two scalar-subquery aggregates
  over orders) is identical. Min-of-3 wall time is ~0.4-0.5 s under
  both confs; the r3 number was single-run noise, which the bench's
  min-of-n reporting now filters. The scalar `avg(o_totalprice)`
  appears at three host operators (projection, filter, pushed scan
  filter) but is one logical subquery; AQE stage reuse dedupes the
  underlying scan+agg at runtime.

- **Round-5 rank-from-counts family** (`winsorized_stats`,
  `mannwhitney_drift`, `gini_activity`, `anomaly_mad`, `auc_daily`,
  `lift_deciles`): every Window operator in these trees now sits
  ABOVE a HashAggregate pair that collapses the fact scan to
  per-(group, distinct-value) counts - the window's Sort input is
  value-cardinality-bounded, and the single-partition WindowExec
  warning those plans used to log during parity runs is gone. The
  only remaining deliberately-global windows are spearman_corr's
  bar-grid-bounded ranks (one row per hourly bar by construction).

- **inverted_index** (round 5): the plan shows the partial/final
  `WindowGroupLimit ... row_number(), 5` pair BELOW the exchange -
  each map task forwards at most top_docs rows per term; df/total_tf
  come from a separate plain aggregate branch joined on term, so no
  full posting list ever passes through one task.

- **pagerank_trade** (round 5): probe-free closed-graph update - the
  iteration is one scheduled job of join+combine layers over the
  single-partition 25-node transition table; no per-round one-row
  aggregate/broadcast, no dangling term (conserved mass).
"""

RED_FLAGS = ["CartesianProduct", "BatchEvalPython"]  # row-at-a-time Python


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from etl_marketdata_downloader_archived_spark.plans import registry
    from etl_marketdata_downloader_archived_spark.session import get_spark

    spark = get_spark("explain")
    qs = registry.all_queries()

    out = [
        "# EXPLAIN — executed physical plans for the headline queries",
        "",
        f"Scale dir: `{sf_dir}`. Plans are the post-AQE final plans",
        "(queries are executed first). `*(n)` marks whole-stage-codegen",
        "spans. Red flags scanned per plan: " + ", ".join(RED_FLAGS) + ".",
        "EVERY registered query is red-flag scanned; the plan trees below",
        "are printed for the headline set only.",
        "",
    ]
    flagged = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = [f for f in RED_FLAGS if f in plan]
        if flags:
            flagged.append((name, flags))
        if name not in HEADLINE:
            continue
        out.append(f"## {name}" + (f"  — ⚠ {', '.join(flags)}" if flags else ""))
        out.append("")
        out.append("```")
        # formatted explain: keep the plan tree, drop the verbose
        # per-node details below the first blank separator
        tree = plan.split("\n\n")[0]
        out.append(tree.rstrip())
        out.append("```")
        out.append("")
    out.insert(
        8,  # after the header sentences and their trailing blank line
        f"All-query scan result: {len(qs)} queries, "
        + (f"red-flagged: {', '.join(n for n, _ in flagged)}" if flagged else "zero red flags.")
        + "\n",
    )
    out.append(NOTES)

    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md ({len(out)} lines); red-flagged: {flagged or 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
