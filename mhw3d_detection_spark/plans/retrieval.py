"""Composed retrieval flagship: train → index → dual-leg search →
rank fusion as ONE plan family (the serving-side twin of the curation
funnel — what a corpus is FOR once it is curated).

The pipeline composes operators that each have their own hash-checked
oracle row, and the COMPOSITION itself is hash-verified end-to-end by
``q_retrieval_pipeline`` (the same verification standard
``q_curate_corpus`` set for the ingest side):

1. **Lexical leg** — BM25 scoring of the query-term bag
   (`operators.textops.bm25_topk`: two doc-keyed hash aggregates,
   rq6-quantized per-term contributions so per-doc sums are
   order-free) ranked by the two-phase global row number.
2. **Dense leg** — IVF-PQ over the embedding column: a trained coarse
   quantizer (Lloyd's k-means, deterministic) prunes candidates to
   the probe's cell, PQ codes + per-probe LUT score each survivor
   with m lookups over the ~64×-smaller codes index
   (`operators.similarity.pq_adc_topk` with ``bucket_col``).
3. **Fusion** — Reciprocal Rank Fusion (Cormack et al. SIGIR'09):
   ``Σ 1/(k + rank)`` over integer ranks — exactly-rounded division,
   bit-identical cross-engine.

Scale shape: training is eager and driver-bounded (centroids only);
both legs are broadcast-probe scans (the lexical leg touches hit docs
only, the dense leg 1/n_cells of the codes); fusion is a doc-keyed
full-outer join of two rankings + TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def retrieval_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: tuple[str, ...],
    probe_vec_id: int,
    *,
    k_rrf: int = 60,
    ann_depth: int = 64,
    top_n: int = 20,
    coarse_k: int = 8,
    coarse_iters: int = 3,
    pq_m: int = 4,
    pq_ksub: int = 4,
    pq_iters: int = 2,
    text_col: str = "text",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the coarse quantizer and PQ codebooks, build the IVF-PQ
    dense ranking around ``probe_vec_id``, the BM25 lexical ranking of
    ``query_terms``, and fuse by RRF. Returns ``(doc_id, lex_rank,
    ann_rank, rrf)``, top ``top_n`` by (rrf desc, doc_id).

    Deployment note: the trained artifacts (centroids + codebooks, a
    few KB) and the encoded codes index are the persist-once outputs;
    per-query work is the two broadcast-probe scans + fusion only.
    """
    from mhw3d_detection_spark.operators.analysis import _global_row_number
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        kmeans_ivf_centroids,
        pq_adc_topk,
        pq_train_codebooks,
    )
    from mhw3d_detection_spark.operators.textops import bm25_topk

    lex = bm25_topk(docs, query_terms, text_col=text_col, top_n=None)
    lexr = _global_row_number(
        lex, [F.desc("score"), F.col("doc_id")], "lex_rank"
    ).select("doc_id", "lex_rank")

    coarse = kmeans_ivf_centroids(
        emb, k=coarse_k, iters=coarse_iters, id_col=id_col, vec_col=vec_col
    )
    tagged = assign_buckets(emb, coarse, id_col=id_col, vec_col=vec_col)
    books = pq_train_codebooks(
        emb, m=pq_m, ksub=pq_ksub, iters=pq_iters,
        id_col=id_col, vec_col=vec_col,
    )
    ann = pq_adc_topk(
        tagged,
        books,
        probe_pred=lambda c: c == probe_vec_id,
        k=ann_depth,
        id_col=id_col,
        vec_col=vec_col,
        bucket_col="bucket",
    ).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("ann_rank")
    )

    fused = (
        lexr.join(ann, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("lex_rank")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("ann_rank")),
                F.lit(0.0),
            ),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(top_n)
