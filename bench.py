"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to warm the JVM/code paths (plan compile,
codegen) then timed over the best of 2 runs — we measure engine
throughput, not first-call JIT.
"""

from __future__ import annotations

import json
import os
import re
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship aggregation, the heavy joins, a window, a
# top-k, and the LLM-pipeline operators once implemented.
HEADLINE = [
    "agg_pricing_summary",
    "join_revenue_by_segment",
    "join_star_schema",
    "window_running_sum",
    "topk_orders_per_segment",
    "agg_cube",
    "etl_chunked_scan_reassembly",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_quality_stats",
]


def main() -> None:
    from golang_etl_spark.registry import all_queries
    from golang_etl_spark.session import get_spark

    spark = get_spark(app_name="golang_etl_spark_bench")
    available = all_queries()
    names = [n for n in HEADLINE if n in available]

    timings: dict[str, float] = {}
    for name in names:
        fn = available[name].fn
        runs = []
        # run 1 warms (JIT/codegen); best of the rest. 4 runs because
        # this host shows multi-second scheduler jitter at local[32] —
        # min-of-3 timed runs filters the outliers.
        for _ in range(4):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            runs.append(time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(min(runs[1:]), 4)

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
