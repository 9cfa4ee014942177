"""r13 optimization-round probe: time named queries (noop sink, N reps,
best + median) and capture their .explain("formatted") trees into
plans/r13/<query>_<tag>.txt. Usage:

    python tools/opt_probe.py [--sf DIR] [--reps N] [--tag before|after]
                              [--rebuild] [--no-plans] query [query ...]

--rebuild times plan construction inside the timed region (the heavy
protocol — required for the eager rows like q_dedup_report whose
localCheckpoints run at build); default builds the plan once outside
the loop (the headline protocol). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402


def capture_plan(df, path: str) -> None:
    tree = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        f.write(tree)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps, tag, rebuild, plans = 5, None, False, True
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--rebuild":
            rebuild = True; i += 1
        elif a == "--no-plans":
            plans = False; i += 1
        else:
            names.extend(n for n in a.split(",") if n); i += 1
    spark = get_spark("opt_probe")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("OPT_PROBE_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = Q.REGISTRY[name].spark_fn
        # warm codegen/JIT on the tiny sf first
        try:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        df = None if rebuild else fn(spark, sf_dir)
        runs = []
        for r in range(reps):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.time()
            d = fn(spark, sf_dir) if rebuild else df
            d.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        results[name] = {
            "best": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
            "all": [round(x, 3) for x in runs],
        }
        if plans and tag:
            capture_plan(
                df if df is not None else fn(spark, sf_dir),
                os.path.join(out_dir, f"{name}_{tag}.txt"),
            )
        print(f"{name}: best={results[name]['best']} "
              f"median={results[name]['median']}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps,
                      "rebuild": rebuild, "results": results}))


if __name__ == "__main__":
    main()
