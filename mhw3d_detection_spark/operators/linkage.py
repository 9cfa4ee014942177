"""Record linkage / entity resolution: blocked pairwise comparison with
edit-distance scoring (Fellegi & Sunter 1969 framing, the
blocking-key discipline of Christen's survey).

The training-data-pipeline reading: "are these two records the same
entity" is the structured-data twin of the dedup family's "are these
two documents the same text" — same candidate-generation-then-verify
shape, but candidates come from BLOCKING KEYS (cheap deterministic
attributes) instead of MinHash bands, and the verifier is an edit
distance on the identifying string instead of a Jaccard estimate.

Scale design (the 100 TB contract):
- candidate pairs are generated ONLY within a block: a self-join on
  the block key, so cost is sum_b s_b*(s_b-1)/2 — the block-key
  choice IS the cost model, exactly like an LSH band. The operator
  never compares across blocks; a production pipeline layers several
  block passes (here: one) and unions candidates.
- both join sides are the same child plan, so the shuffle on the
  block key is planned once (exchange reuse); at 100 TB a bucketed
  layout on the block key (sources/ingest.write_bucketed) removes the
  shuffle entirely.
- `levenshtein` is a JVM builtin (whole-stage codegen) on both
  engines with the identical unit-cost insert/delete/substitute
  definition — scores are exact integers, so every downstream
  aggregate is int64-exact and RAW-hash safe.
- outputs are block-sized (summary) or top-k-per-block (pairs under a
  TOTAL order) — the raw pair stream is an intermediate, never a
  result surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "blocked_link_pairs",
    "linkage_block_summary",
    "linkage_top_pairs",
]


def blocked_link_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_block_size: int | None = None,
) -> DataFrame:
    """Within-block candidate pairs (id_a < id_b) scored by exact edit
    distance on ``name_col``. Returns block cols + (id_a, id_b, dist).

    ``max_block_size`` is the HOT-BLOCK BACKSTOP (the E2q minhash-cap
    design ported to blocking): when a block's record count exceeds
    it, records salt into ``ceil(size / cap)`` deterministic xxhash64
    sub-buckets and pairs form only within a sub-bucket — per-block
    pair work drops from s²/2 to ~s·cap/2 (linear in s), at a recall
    cost that is uniform-random across pairs (two same-entity records
    land in the same sub-bucket with probability 1/n_sub). Measured
    motivation: the sf0.1→sf1 probe shows the uncapped pair stage at
    exponent 2.00 when the block-key cardinality does not grow with
    the data — the textbook record-linkage failure the cap bounds.
    Default None keeps the exact semantics every oracle row prices;
    production layers a FINER second blocking key first (the
    recall-free fix) and caps only what remains.
    """
    src = df.select(
        *block_cols,
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
    )
    join_cols = list(block_cols)
    if max_block_size is not None:
        if int(max_block_size) < 1:
            # 0/negative would silently degrade to n_sub=1 (no capping
            # at all — the exact explosion the cap exists to bound)
            raise ValueError(
                f"max_block_size must be >= 1, got {max_block_size}"
            )
        sizes = src.groupBy(*block_cols).agg(
            F.count("*").alias("_bs")
        )
        n_sub = F.greatest(
            F.lit(1),
            F.expr(f"div(_bs + {int(max_block_size)} - 1, "
                   f"{int(max_block_size)})"),
        )
        src = src.join(sizes, on=block_cols).withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("_id")), n_sub)
        ).drop("_bs")
        join_cols = join_cols + ["_salt"]
    a = src.select(
        *join_cols,
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
    )
    b = src.select(
        *join_cols,
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
    )
    return (
        a.join(b, on=join_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            *block_cols,
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )


def linkage_block_summary(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    match_dist: int = 1,
    possible_dist: int = 3,
    max_block_size: int | None = None,
) -> DataFrame:
    """Per-block linkage census: record count, compared-pair count, and
    the Fellegi-Sunter-style class tallies (exact / match / possible /
    non-match by integer distance bands), plus the closest distance
    seen. Blocks with a single record still appear (0 pairs)."""
    pairs = blocked_link_pairs(
        df, id_col, name_col, block_cols, max_block_size=max_block_size
    )
    per_pair = pairs.groupBy(*block_cols).agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("dist") == 0).cast("long")).alias("n_exact"),
        F.sum(
            ((F.col("dist") > 0) & (F.col("dist") <= match_dist)).cast(
                "long"
            )
        ).alias("n_match"),
        F.sum(
            (
                (F.col("dist") > match_dist)
                & (F.col("dist") <= possible_dist)
            ).cast("long")
        ).alias("n_possible"),
        F.sum((F.col("dist") > possible_dist).cast("long")).alias(
            "n_nonmatch"
        ),
        F.min("dist").alias("min_dist"),
    )
    recs = df.groupBy(*block_cols).agg(F.count("*").alias("n_records"))
    return recs.join(per_pair, on=block_cols, how="left").select(
        *block_cols,
        "n_records",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
        F.coalesce("n_match", F.lit(0)).alias("n_match"),
        F.coalesce("n_possible", F.lit(0)).alias("n_possible"),
        F.coalesce("n_nonmatch", F.lit(0)).alias("n_nonmatch"),
        "min_dist",
    )


def linkage_top_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    per_block: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """The ``per_block`` closest candidate pairs per block under the
    TOTAL order (dist, id_a, id_b) — deterministic cross-engine, the
    review-queue surface a linkage pipeline hands to humans. One
    window pass over the (block-key-partitioned) pair stream."""
    pairs = blocked_link_pairs(
        df, id_col, name_col, block_cols, max_block_size=max_block_size
    )
    w = Window.partitionBy(*block_cols).orderBy("dist", "id_a", "id_b")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_block)
        .select(*block_cols, "id_a", "id_b", "dist", "rk")
    )
