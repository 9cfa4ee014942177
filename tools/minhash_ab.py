"""r14 A/B probe for the LSH bucket self-join exchange strategy
(VERDICT r13 Next #1): interleaved same-JVM best-of-N of

  pin    — current: signatures.repartition(band_id, band_sig), both
           sides reuse the REPARTITION_BY_COL exchange (no AQE skew
           split possible on the join)
  bare   — no pin: planner broadcasts one side, banding computed twice
  merge  — no pin + a shuffle_merge join hint: EnsureRequirements adds
           ENSURE_REQUIREMENTS exchanges on both sides (canonically
           identical -> ReusedExchange, banding once) AND the join
           stays AQE-skew-splittable

Usage: python tools/minhash_ab.py [--sf DIR] [--reps N]
Prints one JSON line; captures plans to plans/r14/minhash_<v>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mhw3d_detection_spark.operators.textops import (  # noqa: E402
    minhash_bands_rowlocal,
)
from mhw3d_detection_spark.queries.base import load_table  # noqa: E402
from mhw3d_detection_spark.session import get_spark  # noqa: E402


def variant(sig, mode):
    keys = ["band_id", "band_sig"]
    sigs = sig.repartition(*keys) if mode == "pin" else sig
    a = sigs.select(F.col("doc_id").alias("doc_a"), *keys)
    b = sigs.select(F.col("doc_id").alias("doc_b"), *keys)
    if mode == "merge":
        b = b.hint("shuffle_merge")
    return (
        a.join(b, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .filter(F.col("doc_a") < 100)
    )


def main():
    args = sys.argv[1:]
    sf_dir, reps = "/root/testdata/sf0.1", 7
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            i += 1
    spark = get_spark("minhash_ab")
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    modes = ["pin", "bare", "merge"]
    dfs = {m: variant(sig, m) for m in modes}

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for m, df in dfs.items():
        tree = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"minhash_{m}.txt"), "w") as f:
            f.write(tree)

    # row-set equality check (pair semantics must be identical)
    counts = {m: dfs[m].count() for m in modes}
    diff_pb = (
        dfs["pin"].exceptAll(dfs["bare"]).count()
        + dfs["bare"].exceptAll(dfs["pin"]).count()
    )
    diff_pm = (
        dfs["pin"].exceptAll(dfs["merge"]).count()
        + dfs["merge"].exceptAll(dfs["pin"]).count()
    )

    # warm
    for m in modes:
        dfs[m].write.format("noop").mode("overwrite").save()
    results = {m: [] for m in modes}
    for r in range(reps):
        for m in modes:  # interleaved
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"minhash:{m}:rep{r}")
            t0 = time.time()
            dfs[m].write.format("noop").mode("overwrite").save()
            results[m].append(round(time.time() - t0, 3))
    summary = {
        m: {"best": min(v), "median": sorted(v)[len(v) // 2], "all": v}
        for m, v in results.items()
    }
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps, "counts": counts,
        "pair_diff_pin_vs_bare": diff_pb,
        "pair_diff_pin_vs_merge": diff_pm,
        "results": summary,
    }))


if __name__ == "__main__":
    main()
