"""r13 optimization-round long-tail finder: time EVERY registered query
(noop sink, Spark side only — no oracle) once or twice at a given SF and
print a JSON ranking. One JVM, warmed per family by the first rep; the
second rep (default) is the recorded number so first-plan Janino compile
does not masquerade as plan cost. Usage:

    python tools/registry_sweep.py [--sf DIR] [--reps N] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhw3d_detection_spark import queries as Q  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir, reps, out = "/root/testdata/sf0.1", 2, None
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--out":
            out = args[i + 1]; i += 2
        else:
            i += 1
    spark = get_spark("registry_sweep")
    results: dict[str, dict] = {}
    names = sorted(Q.REGISTRY)
    for k, name in enumerate(names):
        fn = Q.REGISTRY[name].spark_fn
        runs = []
        err = None
        for r in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sweep:{name}:{r}")
            t0 = time.time()
            try:
                # rebuild inside the timed region: eager rows pay their
                # checkpoint jobs at build, and at 100 TB every nightly
                # run pays plan construction too
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:200]
                break
            runs.append(round(time.time() - t0, 3))
        results[name] = {"runs": runs, "best": min(runs) if runs else None,
                         "err": err}
        print(f"[{k + 1}/{len(names)}] {name}: "
              f"{results[name]['best']} {err or ''}", file=sys.stderr)
    ranked = sorted(
        ((v["best"], n) for n, v in results.items() if v["best"] is not None),
        reverse=True,
    )
    payload = {
        "sf_dir": sf_dir,
        "reps": reps,
        "results": results,
        "top25": [{"query": n, "best": b} for b, n in ranked[:25]],
        "total_best_sum": round(sum(b for b, _ in ranked), 1),
    }
    line = json.dumps(payload)
    if out:
        with open(out, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
