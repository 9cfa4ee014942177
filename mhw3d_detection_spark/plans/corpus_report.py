"""The composed corpus-shape report: ONE token-keyed aggregate feeds
every vocabulary-distribution diagnostic — Gini concentration, Zipf
fit, Heaps (vocab growth) deciles, corpus-level entropy/TTR — as one
long-form result. The analytics-family analogue of
``plans.dedup_report``: the standalone rows each rebuild the same
(token, count) table; a corpus health check wants that table paid for
ONCE.

Economics: the corpus is tokenized+exploded once for the frequency
table (which also carries each type's FIRST document — one aggregate
serves both the Zipf/Gini counts and the Heaps new-type curve); the
per-decile instance totals come from a token-COUNT projection (no
explode, no shuffle of token instances). The vocab-sized freq table is
localCheckpointed so the four report branches reference materialized
blocks (the dedup_report device).

Output schema: ``(section, key, n, m, x)``
- ``gini``:    key NULL; n = n_types, m = n_tokens, x = gini
- ``zipf``:    key 'slope' / 'intercept'; n = n_top, x = value
- ``heaps``:   key = decile; n = cum_types, m = cum_instances, x = ttr
- ``entropy``: key NULL; n = n_types, m = n_tokens, x = Shannon H
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_report(
    docs: DataFrame,
    *,
    text_col: str = "text",
    zipf_top_n: int = 100,
    reliable_checkpoints: bool = False,
) -> DataFrame:
    """Build the corpus-shape report from one materialized frequency
    table. EAGER (localCheckpoints the vocab-sized freq table).

    Empty-input contract (r11 adversarial review, JUSTIFIED loud): an
    empty corpus raises ``ValueError`` rather than emitting NULL rows.
    This deliberately differs from the drift/KS monitors (which emit
    NULL stats with counts visible): those observe SLICES that can
    legitimately be empty — a quiet window, a brand-new source — while
    this report profiles THE corpus; an empty input here means the
    upstream wiring is broken and a silent empty/NULL report row would
    read as "profiled fine, corpus is degenerate"."""
    from mhw3d_detection_spark.operators.textops import (
        gini_from_freq,
        tokens_col,
        zipf_from_freq,
    )
    from mhw3d_detection_spark.queries.base import rq

    from mhw3d_detection_spark.plans.audit_hook import ckpt

    def _chk(df: DataFrame, stage: str = "freq") -> DataFrame:
        return ckpt(df, stage, reliable=reliable_checkpoints)

    dt = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    # ONE corpus-sized token aggregate: counts for Gini/Zipf/entropy
    # AND first-doc for the Heaps new-type curve
    freq = _chk(
        dt.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("v"),
            F.min("doc_id").alias("first_doc"),
        )
    )

    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    gini = gini_from_freq(freq.select("token", "v")).select(
        F.lit("gini").alias("section"), null_s.alias("key"),
        F.col("n_types").alias("n"), F.col("n_tokens").alias("m"),
        F.col("gini").alias("x"),
    )

    z = zipf_from_freq(freq.select("token", "v"), top_n=zipf_top_n)
    zipf = z.select(
        F.lit("zipf").alias("section"), F.lit("slope").alias("key"),
        F.col("n_top").alias("n"), null_l.alias("m"),
        F.col("zipf_slope").alias("x"),
    ).unionAll(
        z.select(
            F.lit("zipf").alias("section"), F.lit("intercept").alias("key"),
            F.col("n_top").alias("n"), null_l.alias("m"),
            F.col("zipf_intercept").alias("x"),
        )
    )

    # Heaps deciles: new types per corpus-prefix decile from freq's
    # first_doc; instance totals from a token-COUNT projection (no
    # explode — the instances never shuffle)
    nd = docs.agg((F.max("doc_id") + 1).alias("__n")).collect()[0]["__n"]
    if nd is None:
        raise ValueError(
            "corpus_report: empty corpus (no doc_id rows) — nothing to "
            "profile"
        )
    dec = lambda c: (c * 10 / F.lit(int(nd))).cast("long")  # noqa: E731
    nt = freq.groupBy(dec(F.col("first_doc")).alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    inst = docs.select(
        dec(F.col("doc_id")).alias("decile"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("k"),
    ).groupBy("decile").agg(F.sum("k").alias("n_inst"))
    spine = docs.sparkSession.range(10).select(
        F.col("id").alias("decile")
    )
    j = (
        spine.join(nt, "decile", "left")
        .join(inst, "decile", "left")
        .select(
            "decile",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_inst", F.lit(0)).alias("n_inst"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    heaps = j.select(
        F.lit("heaps").alias("section"),
        F.col("decile").cast("int").cast("string").alias("key"),
        F.sum("n_new").over(w).cast("long").alias("n"),
        F.sum("n_inst").over(w).cast("long").alias("m"),
        # leading deciles can hold zero instances (doc ids clustered
        # high, or empty texts): TTR is undefined there — NULL, like
        # the oracle's NULL division, not an ANSI crash (code-review
        # r10 #2)
        F.when(
            F.sum("n_inst").over(w) > 0,
            F.sum("n_new").over(w).cast("double")
            / F.sum("n_inst").over(w),
        ).alias("x"),
    )

    # corpus-level Shannon entropy of the unigram distribution:
    # H = ln(T) - Σ v·ln(v) / T (the per-doc E4 row's closed form,
    # lifted to the corpus; ln display-only rq4)
    ent = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("v").cast("long").alias("n_tokens"),
        F.sum(F.col("v") * F.log(F.col("v").cast("double"))).alias("__clc"),
    ).select(
        F.lit("entropy").alias("section"), null_s.alias("key"),
        F.col("n_types").alias("n"), F.col("n_tokens").alias("m"),
        rq(
            F.log(F.col("n_tokens").cast("double"))
            - F.col("__clc") / F.col("n_tokens"),
            4,
        ).alias("x"),
    )

    return gini.unionAll(zipf).unionAll(heaps).unionAll(ent)
