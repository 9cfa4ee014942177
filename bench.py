"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers every heavy plan shape: the fused MHW pipeline
(flagship), pooled climatology (explode+group), the detection chain
(two window passes + two aggregates), event metrics (explode-join+agg),
MinHash dedup (shingle explode + banded self-join), similarity top-k
(broadcast brute force), and a TPC-H-ish join+agg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mhw3d_detection_spark import queries as Q
from mhw3d_detection_spark.session import get_spark

HEADLINE = [
    "q_mhw_pipeline",
    "q_pooled_threshold_pctile",
    "q_gap_join_events",
    "q_event_metrics",
    "q_dedup_minhash_pairs",
    "q_similarity_topk",
    "q_join_hash_equi",
    "q_circular_smooth_31d",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    # Warm the JVM (codegen/JIT) on the tiny sf so per-query timings
    # measure plan execution, not first-compile; throughput at scale is
    # steady-state behavior.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            Q.REGISTRY[name].spark_fn(spark, warm_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):  # best-of-3: absorbs GC/JIT scheduling noise
            spark.catalog.clearCache()  # drop per-run persisted dims
            t0 = time.time()
            df = Q.REGISTRY[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
