"""Retrieval walkthrough: the serving-side flagship end to end on the
bundled test tables. Run from the repo root:

    python examples/retrieval.py [sf_dir]

1. Train the ANN index artifacts once — coarse IVF cells (Lloyd's
   k-means) and PQ subspace codebooks — both driver-sized.
2. Encode the corpus to PQ codes (the ~64×-smaller index a 100 TB
   deployment scans instead of the float vectors).
3. Run one hybrid query: BM25 lexical leg + IVF-PQ dense leg, fused
   by Reciprocal Rank Fusion (``plans.retrieval.retrieval_search``).
4. Price the approximation: recall@5 of the bucketed search vs the
   exact brute-force baseline, and the multi-probe (nprobe=2) lever
   that buys recall back.

Everything is a DataFrame composition — the same code runs on a
cluster against a parquet lake; only the SparkSession config changes.
"""

import sys

sys.path.insert(0, ".")

from mhw3d_detection_spark import get_spark  # noqa: E402
from mhw3d_detection_spark.operators.similarity import (  # noqa: E402
    assign_buckets,
    cosine_topk,
    cosine_topk_multiprobe,
    kmeans_ivf_centroids,
    pq_encode,
    pq_train_codebooks,
)
from mhw3d_detection_spark.plans import retrieval_search  # noqa: E402
from mhw3d_detection_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-example")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    print("== 1. train index artifacts (driver-sized) ==")
    coarse = kmeans_ivf_centroids(emb, k=8, iters=3)
    books = pq_train_codebooks(emb, m=4, ksub=4, iters=2)
    print(f"coarse cells: {len(coarse)}; PQ codebooks: "
          f"{len(books)} subspaces x {len(books[0])} codes")

    print("== 2. encode the corpus to PQ codes ==")
    pq_encode(emb, books).show(3)

    print("== 3. hybrid query: BM25 + IVF-PQ, RRF-fused ==")
    retrieval_search(
        docs, emb, ("merge", "query", "spark", "window"), probe_vec_id=0
    ).show(10)

    print("== 4. price the approximation: recall@5 vs brute force ==")
    probes = lambda c: c % 50 == 0  # noqa: E731
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    tagged = assign_buckets(emb, coarse).select(
        "vec_id", "embedding", "bucket"
    )
    one = {
        (r["probe_id"], r["vec_id"])
        for r in cosine_topk(
            tagged, probes, k=5, bucket_col="bucket"
        ).collect()
    }
    two = {
        (r["probe_id"], r["vec_id"])
        for r in cosine_topk_multiprobe(
            emb, coarse, probes, k=5, n_probe=2
        ).collect()
    }
    n = max(len(exact), 1)
    print(f"recall@5 single-cell: {len(one & exact) / n:.2f}   "
          f"multi-probe nprobe=2: {len(two & exact) / n:.2f}")


if __name__ == "__main__":
    main()
