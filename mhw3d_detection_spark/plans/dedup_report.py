"""The composed duplication-audit flagship: MinHash candidate pairs
and their connected components computed ONCE, then every operational
readout of the dedup family emitted from that shared intermediate —
cluster census, split-leakage audit, cross-source duplication matrix,
and the keep-best verdict summary — as ONE long-form report.

Why composed: the four component-family oracle rows
(``q_dedup_cluster_stats`` / ``q_split_leakage`` /
``q_source_dedup_matrix`` / ``q_dedup_keep_best``) each rebuild the
identical pairs+components intermediate (52–54 exchanges each) because
the driver protocol runs rows independently. A production corpus wants
the banding self-join and the min-label propagation paid ONCE — the
shared stages dominate the cost (VERDICT r9 next-round #3; measured
comparison in docs/PLANS.md r10).

Scale shape: one corpus pass builds band signatures (the only
corpus-sized shuffle); the pairs table and everything downstream is
pairs-sized. ``localCheckpoint`` truncates the pair/component lineage
so the four report branches reference materialized blocks instead of
re-embedding the banding plan four times (the ``curate_corpus``
device — 145 s of Catalyst analysis without truncation at sf0.01).

Output schema (one unified long form):
``(section, key_a, key_b, n, extra)``
- ``census``:   key_a = component size; n = #components of that size,
                extra = their duplicate mass Σ(size-1)
- ``leakage``:  key_a/key_b = endpoint splits (pair order);
                n = candidate pairs, extra = cross-split leaks
- ``sources``:  key_a/key_b = unordered endpoint sources;
                n = candidate pairs, extra = NULL
- ``keepbest``: key_a = source; n = docs kept, extra = docs dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_report(
    docs: DataFrame,
    *,
    cc_iters: int = 3,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Build the full duplication audit from ONE pairs+components
    computation. EAGER: localCheckpoints the pairs and components
    tables at call time (pass ``reliable_checkpoints=True`` on
    preemptible clusters — requires ``sc.setCheckpointDir``)."""
    from mhw3d_detection_spark.operators.textops import (
        connected_components_bounded,
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
        split_col,
        text_stats,
    )
    from mhw3d_detection_spark.queries.base import rq

    from mhw3d_detection_spark.plans.audit_hook import ckpt

    # ---- shared intermediate: the ONLY corpus-sized stage ----------
    # (r13: endpoint sources ride the banding as carry_cols, so the
    # source-matrix branch reads them off the checkpointed pair row
    # instead of joining the corpus twice)
    pairs = ckpt(
        minhash_candidate_pairs(
            minhash_bands_rowlocal(
                docs, n_hashes=8, band_size=2, carry_cols=("source",)
            ),
            carry_cols=("source",),
        ),
        "pairs",
        reliable=reliable_checkpoints,
    )
    comp = ckpt(
        connected_components_bounded(pairs, iters=cc_iters, truncate=True),
        "components",
        reliable=reliable_checkpoints,
    )

    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    # ---- census: component size histogram + dup mass ---------------
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    census = sizes.groupBy(
        F.col("sz").cast("int").cast("string").alias("key_a")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("sz") - 1).cast("long").alias("extra"),
    ).select(
        F.lit("census").alias("section"), "key_a",
        null_s.alias("key_b"), "n", "extra",
    )

    # ---- leakage: pairs bucketed by endpoint splits -----------------
    # (r13: split is a pure md5 function of doc_id — computed in place
    # on the pair table, no joins back to the doc projection)
    leak = (
        pairs.select(
            split_col(F.col("doc_a")).alias("split_a"),
            split_col(F.col("doc_b")).alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("split_a") != F.col("split_b")).cast("int"))
            .cast("long").alias("extra"),
        )
        .select(
            F.lit("leakage").alias("section"),
            F.col("split_a").alias("key_a"),
            F.col("split_b").alias("key_b"), "n", "extra",
        )
    )

    # ---- sources: unordered endpoint-source rollup ------------------
    # (r13: sources carried on the pair row — no corpus joins)
    src = docs.select("doc_id", "source")
    mat = (
        pairs.groupBy(
            F.least("source_a", "source_b").alias("key_a"),
            F.greatest("source_a", "source_b").alias("key_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.lit("sources").alias("section"), "key_a", "key_b",
            "n", null_l.alias("extra"),
        )
    )

    # ---- keepbest: verdict summary per source (shared components —
    # NOT dedup_keep_best(), which would rebuild them) ----------------
    q = text_stats(docs).select(
        "doc_id", rq("quality_score", 4).alias("quality")
    )
    member = comp.join(q, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    ranked = member.withColumn("__r", F.row_number().over(w)).select(
        "doc_id", (F.col("__r") == 1).cast("int").alias("__keep")
    )
    # verdict is pairs-VERTICES-sized — same regime as dedup_keep_best:
    # no broadcast hint; AQE picks from the measured size
    verdict = q.select("doc_id").join(ranked, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("__keep"), F.lit(1)).alias("kept")
    )
    keepbest = (
        verdict.join(src, "doc_id")
        .groupBy(F.col("source").alias("key_a"))
        .agg(
            F.sum("kept").cast("long").alias("n"),
            F.sum(F.lit(1) - F.col("kept")).cast("long").alias("extra"),
        )
        .select(
            F.lit("keepbest").alias("section"), "key_a",
            null_s.alias("key_b"), "n", "extra",
        )
    )

    return census.unionAll(leak).unionAll(mat).unionAll(keepbest)
