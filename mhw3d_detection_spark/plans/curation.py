"""The flagship LLM-data curation pipeline: quality gate → exact dedup
→ MinHash-LSH near-dup dedup → SemDeDup semantic dedup → deterministic
train/val/test split, as ONE composed plan — the data-pipeline analogue
of ``plans.pipeline.detect_mhw``.

Every stage is an already-verified operator (its own oracle-gated
query); the composition adds the sequencing contract a real curation
run needs: each stage sees only the SURVIVORS of the previous one, and
every document leaves with its first failing stage named — the lineage
a 100 TB pipeline must keep to debug its own yield.

Stage order (fixed; each prunes work for the next):
1. ``quality``      — the literal-weight logistic gate (pure
   projection; cheapest, so it runs first and shrinks everything
   downstream).
2. ``exact_dup``    — hash-groupBy on the text key; min doc_id kept.
3. ``near_dup``     — MinHash band signatures over survivors,
   LSH-bucket candidate pairs, bounded min-label propagation; min id
   per component kept.
4. ``semantic_dup`` — the SemDeDup stage: the k-means quantizer is
   trained on the FULL embedding corpus (a deliberate choice — the
   quantizer is corpus-level infrastructure, so its cells do not move
   when upstream filters change, and the trained centroids can be
   reused across pipeline runs); pair generation and component
   grouping run over survivors only.
5. ``kept``         — survivors, assigned their md5-uniform 80/10/10
   split.

Scale shape: stage 1 is a narrow map; stages 2-4 are the equi-keyed
shuffles their component operators were already plan-audited for (text
key, band buckets, cluster cells — never all-pairs); the split is a
pure key function. The only corpus-sized shuffles are the dedup
group-bys over already-filtered survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    emb: DataFrame,
    *,
    semantic_k: int = 8,
    semantic_iters: int = 3,
    semantic_threshold: float = 0.35,
    semantic_max_cluster_size: int | None = None,
    cc_iters: int = 3,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Run the full curation funnel. Returns one row per input doc:
    ``(doc_id, source, stage, split)`` — ``stage`` is the first stage
    that dropped the doc (``quality`` / ``exact_dup`` / ``near_dup`` /
    ``semantic_dup``) or ``kept``; ``split`` is the deterministic
    train/val/test assignment (computed for every doc — a pure key
    function, and keeping it unconditional means the split of a doc
    never changes when an upstream filter is tuned).

    EAGER: calling this runs the dedup stages as Spark jobs (like the
    IVF trainer) — the pair/drop tables must be checkpointed to keep
    the composed plan tree from re-embedding its upstream exponentially
    (145 s of Catalyst analysis at sf0.01 without truncation). Default
    ``localCheckpoint`` stores blocks executor-local: fast, but lost
    blocks are unrecoverable — on preemptible/spot clusters pass
    ``reliable_checkpoints=True`` (requires
    ``sc.setCheckpointDir(...)``) to write them to the checkpoint dir
    instead."""
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        bucket_near_dup_pairs,
        kmeans_ivf_centroids,
    )
    from mhw3d_detection_spark.operators.textops import (
        connected_components_bounded,
        minhash_signatures,
        quality_scores,
        split_assign,
    )

    # stage 1: quality gate (narrow projection over the full corpus)
    scored = quality_scores(docs).select("doc_id", "source", "text", "keep")
    s1 = scored.filter(F.col("keep") == 1)

    # stage 2: exact dedup on the text key — non-canonical copies drop
    canon = s1.groupBy("text").agg(F.min("doc_id").alias("__keep_id"))
    with_canon = s1.join(canon, "text")
    from mhw3d_detection_spark.plans.audit_hook import ckpt

    def _chk(df: DataFrame, stage: str) -> DataFrame:
        # lineage truncation point (see docstring); values unchanged
        return ckpt(df, stage, reliable=reliable_checkpoints)

    exact_drops = _chk(
        with_canon.filter(F.col("doc_id") != F.col("__keep_id")).select("doc_id"),
        "exact_drops",
    )
    s2 = with_canon.filter(F.col("doc_id") == F.col("__keep_id")).select(
        "doc_id", "source", "text"
    )

    # stage 3: MinHash-LSH near-dup over survivors only
    sig = minhash_signatures(s2)
    from mhw3d_detection_spark.operators.textops import (
        minhash_candidate_pairs,
    )

    # checkpoint the tiny choke points: without it, every min-label
    # propagation round and every downstream join RE-EMBEDS the full
    # upstream pipeline in its plan tree — Catalyst analysis alone went
    # minutes (measured 145 s at sf0.01); with truncation the whole
    # funnel builds and runs in seconds. Values unchanged.
    pairs = _chk(minhash_candidate_pairs(sig), "near_pairs")
    comp = connected_components_bounded(pairs, iters=cc_iters, truncate=True)
    near_drops = _chk(
        comp.filter(F.col("doc_id") != F.col("component")).select("doc_id"),
        "near_drops",
    )
    # no broadcast hint: drop-list size scales with the corpus's dup
    # fraction (30-80% on web crawls), so forcing a broadcast would
    # bypass autoBroadcastJoinThreshold and OOM the driver at scale —
    # AQE picks broadcast on its own whenever the list is actually small
    s3 = s2.join(near_drops, "doc_id", "left_anti")

    # stage 4: SemDeDup over survivors; quantizer trained on FULL emb
    cents = kmeans_ivf_centroids(
        emb, k=semantic_k, iters=semantic_iters
    )
    emb3 = emb.join(
        s3.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    tagged = assign_buckets(emb3, cents)
    # semantic_max_cluster_size: the skew backstop — size semantic_k
    # for ~1e4-row average cells (paper regime), and the cap salts any
    # cell the embedding skew still overfills (bucket_near_dup_pairs)
    spairs = _chk(
        bucket_near_dup_pairs(
            tagged,
            threshold=semantic_threshold,
            max_bucket_size=semantic_max_cluster_size,
        ),
        "sem_pairs",
    )
    comp2 = connected_components_bounded(spairs, iters=cc_iters, truncate=True)
    sem_drops = _chk(
        comp2.filter(F.col("doc_id") != F.col("component")).select("doc_id"),
        "sem_drops",
    )

    # lineage: first failing stage per doc; split for every doc
    stage = (
        F.when(F.col("__q") == 0, F.lit("quality"))
        .when(F.col("__ex").isNotNull(), F.lit("exact_dup"))
        .when(F.col("__nd").isNotNull(), F.lit("near_dup"))
        .when(F.col("__sd").isNotNull(), F.lit("semantic_dup"))
        .otherwise(F.lit("kept"))
    )
    return (
        scored.select("doc_id", "source", F.col("keep").alias("__q"))
        .join(
            exact_drops.select("doc_id", F.lit(1).alias("__ex")), "doc_id", "left"
        )
        .join(
            near_drops.select("doc_id", F.lit(1).alias("__nd")), "doc_id", "left"
        )
        .join(
            sem_drops.select("doc_id", F.lit(1).alias("__sd")), "doc_id", "left"
        )
        .join(split_assign(docs).select("doc_id", "split"), "doc_id")
        .select("doc_id", "source", stage.alias("stage"), "split")
    )
