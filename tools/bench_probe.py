"""Single-JVM multi-trial bench attribution probe (the r8 device,
re-applied to the r10 driver-host headline regression — VERDICT r10
Next #2).

Question: the driver host recorded the headline suite at 7.951 s in
r10 vs 6.023 s in r9 (+32%), while the builder's same-code local runs
moved the OPPOSITE way (6.894 -> 6.409 s). Hypotheses:
  (a) host variance on the driver machine (the builder-local evidence),
  (b) the heavy suite's r10 co-residency in the same JVM perturbing
      headline timings, or
  (c) a real code regression.

Design: ONE JVM, one host, ``--trials`` (default 12) alternating
trials. Even trials run headline-then-heavy, odd trials run
heavy-then-headline — if heavy co-residency (JVM heap shape, code
cache, GC pressure) inflated headline walls, the headline times of
heavy-FIRST trials would be systematically higher than heavy-AFTER
trials; if within-JVM spread across 12 interleaved trials is small and
order-independent while round-to-round driver numbers swing 30%, the
regression attributes to host variance, not code. Each trial times ONE
execution per query (no best-of within a trial; the trial sequence IS
the repetition).

Usage::

    python tools/bench_probe.py [--trials N] [--json OUT]

Prints one JSON line with per-trial walls by order and the
min/median/max summary per (suite, order) cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEAVY  # noqa: E402
from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402


def _run_suite(spark, names, sf_dir: str) -> float:
    # plans rebuilt inside the timed region each trial — the EAGER
    # heavies (q_dedup_report) do most of their work at build time
    t0 = time.time()
    for name in names:
        spark.catalog.clearCache()
        Q.REGISTRY[name].spark_fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    trials = 12
    json_out = None
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-probe")

    # warm codegen/JIT on the tiny sf for BOTH suites so trial 0 isn't
    # a compile measurement
    warm = "/root/testdata/sf0.001"
    for name in HEADLINE + HEAVY:
        try:
            Q.REGISTRY[name].spark_fn(spark, warm).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    rows = []
    for t in range(trials):
        heavy_first = t % 2 == 1
        spark._jvm.System.gc()
        if heavy_first:
            hv = _run_suite(spark, HEAVY, sf_dir)
            hd = _run_suite(spark, HEADLINE, sf_dir)
        else:
            hd = _run_suite(spark, HEADLINE, sf_dir)
            hv = _run_suite(spark, HEAVY, sf_dir)
        rows.append(
            {
                "trial": t,
                "order": "heavy_first" if heavy_first else "headline_first",
                "headline_wall": round(hd, 3),
                "heavy_wall": round(hv, 3),
            }
        )
        print(f"trial {t:2d} {rows[-1]['order']:15s} "
              f"headline={hd:.3f}s heavy={hv:.3f}s", file=sys.stderr)

    def _cell(order, key):
        xs = sorted(r[key] for r in rows if r["order"] == order)
        if not xs:  # e.g. --trials 1 has no heavy_first rows
            return {"n": 0, "min": None, "median": None, "max": None}
        return {
            "n": len(xs),
            "min": xs[0],
            "median": xs[len(xs) // 2],
            "max": xs[-1],
        }

    out = {
        "metric": "bench_attribution_probe",
        "sf_dir": sf_dir,
        "trials": rows,
        "headline_when_first": _cell("headline_first", "headline_wall"),
        "headline_after_heavy": _cell("heavy_first", "headline_wall"),
        "heavy_when_first": _cell("heavy_first", "heavy_wall"),
        "heavy_after_headline": _cell("headline_first", "heavy_wall"),
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
