"""End-to-end corpus audit walkthrough (r10 surfaces): the three
composed reports a curation run consults before and after deleting
anything, plus the artifacts it ships.

    PYTHONPATH=/root/repo python examples/curation_audit.py [sf_dir]

1. corpus_report  — distribution shape: Gini concentration, Zipf
   slope, Heaps saturation, corpus entropy (is more crawl still
   buying vocabulary?).
2. dedup_report   — duplication economics: cluster census, split
   leakage, cross-source matrix, keep-best yield per source.
3. Gate agreement — Cohen's kappa between the model gate and the
   Gopher rules (redundant? stackable? contradictory?), plus the
   quality-vs-length Spearman redundancy check.
4. Remedy + ship  — component-coherent split (leakage zero by
   construction) and the deterministic training manifest.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

import mhw3d_detection_spark as m
from mhw3d_detection_spark.plans import corpus_report, dedup_report
from mhw3d_detection_spark.queries.base import REGISTRY
import mhw3d_detection_spark.queries.extensions  # noqa: F401  (registry)
from mhw3d_detection_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = m.get_spark("curation-audit", cpus=8)
    docs = load_table(spark, sf_dir, "documents")

    print("== 1. corpus shape ==")
    corpus_report(docs).orderBy("section", "key").show(16, truncate=False)

    print("== 2. duplication audit ==")
    dedup_report(docs).orderBy("section", "key_a", "key_b").show(
        30, truncate=False
    )

    print("== 3. gate agreement (kappa) + quality~length (spearman) ==")
    REGISTRY["q_gate_agreement_kappa"].spark_fn(spark, sf_dir).show(
        truncate=False
    )
    REGISTRY["q_quality_length_spearman"].spark_fn(spark, sf_dir).show()

    print("== 4. remedy: component-coherent split (n_leaks must be 0) ==")
    REGISTRY["q_component_split"].spark_fn(spark, sf_dir).orderBy(
        "split"
    ).show()

    print("== 5. ship: training manifest (first shard of train) ==")
    REGISTRY["q_training_manifest"].spark_fn(spark, sf_dir).filter(
        (F.col("split") == "train") & (F.col("shard_id") == 0)
    ).orderBy("pos").show(10)


if __name__ == "__main__":
    main()
