"""Second-decade (sf1 -> sf10) scale probe for the heavy dedup family
(VERDICT r11 Next #8) — INCREMENTAL protocol: the sf10 side of this
family is pair-bound (the key-offset replication multiplies near-dup
clone clusters 10x, so candidate PAIRS grow ~100x per decade, not 10x
— the realistic crawl-duplication shape, and exactly what this probe
exists to measure), so runs are minutes each. Each query is timed
sf1 best-of-2 / sf10 best-of-1 and its row is written to the output
JSON IMMEDIATELY, so a killed run keeps everything finished so far.

Usage: python tools/sf10_decade_probe.py OUT.json query [query ...]
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402

SF1 = ".scratch/sf1"
SF10 = ".scratch/sf10"


def best_of(spark, name, sf_dir, runs):
    best = None
    for _ in range(runs):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        Q.REGISTRY[name].spark_fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("sf10-decade-probe")
    payload = {
        "protocol": (
            "sf1 best-of-2 / sf10 best-of-1 (pair-bound family — "
            "runs are minutes; incremental per-query writes), warm JVM, "
            "clearCache+gc per run, local[32]; dirs .scratch/sf1 -> "
            ".scratch/sf10; NOTE: the replication device grows clone "
            "clusters 10x per decade, so candidate pairs grow ~100x — "
            "exponents here price that declared workload"
        ),
        "rows": {},
    }
    for name in names:
        t1 = best_of(spark, name, SF1, 2)
        t10 = best_of(spark, name, SF10, 1)
        exp = math.log10(t10 / t1)
        payload["rows"][name] = {
            "sf1": round(t1, 3),
            "sf10": round(t10, 3),
            "exponent": round(exp, 2),
        }
        print(f"{name:28s} sf1={t1:8.3f}  sf10={t10:9.3f}  exp={exp:5.2f}")
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
