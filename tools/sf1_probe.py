"""sf1 scale probe: run named queries at sf0.1 and .scratch/sf1 (10x
key-offset replicas, built by tools/make_sf1.py), best-of-N min per SF
in one warm JVM, and report the wall-ratio exponent
log10(t_sf1 / t_sf0.1) per query.

Usage: python tools/sf1_probe.py OUT.json query [query ...]
       python tools/sf1_probe.py --dirs LO_DIR HI_DIR OUT.json query ...

``--dirs`` overrides the scale pair — e.g. ``.scratch/sf1
.scratch/sf10`` measures the SECOND decade (sf1→sf10, r12), checking
that the one-decade exponents extrapolate.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402

RUNS = 3
SF01 = "/root/testdata/sf0.1"
SF1 = ".scratch/sf1"


def best_of(spark, name, sf_dir, runs=RUNS):
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
    args = sys.argv[1:]
    lo_dir, hi_dir = SF01, SF1
    if args and args[0] == "--dirs":
        lo_dir, hi_dir = args[1], args[2]
        args = args[3:]
    out_path = args[0]
    names = args[1:]
    spark = get_spark("sf1-probe")
    import math

    rows = {}
    for name in names:
        t01 = best_of(spark, name, lo_dir)
        t1 = best_of(spark, name, hi_dir)
        exp = math.log10(t1 / t01)
        rows[name] = {
            "sf01": round(t01, 3),
            "sf1": round(t1, 3),
            "exponent": round(exp, 2),
        }
        print(f"{name:28s} sf0.1={t01:7.3f}  sf1={t1:8.3f}  exp={exp:5.2f}")
    payload = {
        "protocol": (
            f"best-of-{RUNS} min, warm JVM, clearCache+gc per run, "
            f"local[32]; dirs {lo_dir} -> {hi_dir}"
        ),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
