"""Quickstart: the two flagship pipelines end to end on the bundled
test tables. Run from the repo root:

    python examples/quickstart.py [sf_dir]

1. Marine-heatwave detection (the reference workflow): daily series →
   pooled climatology + threshold → severity → events with the full
   Oliver metric set (``plans.pipeline.detect_mhw``).
2. LLM-corpus curation (the extension flagship): quality gate → exact
   dedup → MinHash-LSH near-dup → SemDeDup semantic dedup →
   train/val/test split, with per-doc lineage
   (``plans.curation.curate_corpus``).

Both run identically on a laptop and a cluster — the plans are pure
DataFrame compositions; only the SparkSession config changes.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from mhw3d_detection_spark import get_spark  # noqa: E402
from mhw3d_detection_spark.plans import curate_corpus, detect_mhw  # noqa: E402
from mhw3d_detection_spark.sources.tables import (  # noqa: E402
    events_timeseries,
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart", cpus=8)

    # -- 1. event detection -------------------------------------------
    # a) synthetic 20-year daily series with an injected +4C heatwave
    #    (guaranteed event, shows the full metric set) ...
    import datetime as dt
    import math
    import random

    rng = random.Random(7)
    rows = []
    d0 = dt.date(1990, 1, 1)
    for day in range(365 * 20):
        d = d0 + dt.timedelta(days=day)
        base = 15 + 3 * math.sin(2 * math.pi * d.timetuple().tm_yday / 365.25)
        bump = 4.0 if dt.date(2000, 6, 1) <= d < dt.date(2000, 7, 11) else 0.0
        rows.append((1, d, base + rng.gauss(0, 0.2) + bump))
    synth = spark.createDataFrame(rows, "cell_id int, time date, temp double")
    events = detect_mhw(synth, min_duration=5, max_gap=2)
    print(f"\n=== detect_mhw (synthetic, injected heatwave): "
          f"{events.count()} events ===")
    events.select(
        "cell_id", "date_start", "date_end", "duration",
        "intensity_max", "category", "rate_onset", "rate_decline",
    ).show(5, truncate=False)

    # b) ... and the same plan over the bundled sensor stream (sparse at
    #    sf0.001 — few or zero events is expected there)
    ts = events_timeseries(spark, sf_dir)
    daily = ts.groupBy("cell_id", F.to_date("time").alias("time")).agg(
        F.avg("temp").alias("temp")
    )
    n = detect_mhw(daily, min_duration=3, max_gap=2, smooth_width=None).count()
    print(f"=== detect_mhw (driver stream at {sf_dir}): {n} events ===")

    # -- 2. corpus curation on the bundled documents + embeddings -------
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    funnel = curate_corpus(docs, emb)
    print("=== curate_corpus: per-stage yield ===")
    funnel.groupBy("stage").count().orderBy("stage").show()
    print("=== kept corpus split sizes ===")
    funnel.filter(F.col("stage") == "kept").groupBy("split").count().orderBy(
        "split"
    ).show()


if __name__ == "__main__":
    main()
