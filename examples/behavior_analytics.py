"""The r13 wave-2 behavioral/catalog analytics in one run: market-basket
association rules, blocked record linkage, heavy hitters, click->purchase
attribution, revenue concentration, queue backlog and active-time
coverage — the classic warehouse/event-analytics shapes a user would
otherwise reach for a dozen different tools to get.

Each section prints a small, human-readable readout; every operator
shown here also has a registered DuckDB-differential oracle row
(tools/verify_queries.py) — this walkthrough is the narrative surface,
not the correctness gate.

Usage: PYTHONPATH=/root/repo python examples/behavior_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from mhw3d_detection_spark.session import get_spark
from mhw3d_detection_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("behavior-analytics")

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    print("== association rules: top brand pairs by lift (A17/A18) ==")
    from mhw3d_detection_spark.operators.market import (
        association_rules,
        baskets_from_lineitem,
    )

    rules = association_rules(baskets_from_lineitem(li, part), min_count=20)
    rules.orderBy(F.desc("lift")).show(5, truncate=False)

    print("== record linkage: closest candidate pairs per block (J15) ==")
    from mhw3d_detection_spark.operators.linkage import (
        linkage_block_summary,
        linkage_top_pairs,
    )

    summary = linkage_block_summary(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"]
    )
    summary.orderBy(F.desc("n_pairs")).show(4)
    linkage_top_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"]
    ).filter(F.col("rk") == 1).orderBy("dist").show(4)

    print("== heavy hitters: vocabulary screen at sketch cost (E7hh) ==")
    from mhw3d_detection_spark.operators.sketches import token_heavy_hitters

    token_heavy_hitters(docs, k=40).orderBy(F.desc("cnt")).show(5)

    print("== click -> purchase attribution within 6 h (SP8 batch twin) ==")
    from mhw3d_detection_spark.streaming import streaming_attribution_join

    attr = streaming_attribution_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )
    n_attr = attr.count()
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    print(f"attributed pairs: {n_attr} over {n_purch} purchases")

    print("== revenue concentration per segment (A19) ==")
    from mhw3d_detection_spark.operators.analysis import gini_concentration

    from mhw3d_detection_spark.queries.relational import _CENTS_NUDGE

    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(_CENTS_NUDGE)
    ).cast("long")
    rev = (
        orders.select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    seg = rev.join(
        cust.select("c_custkey", "c_mktsegment"),
        rev.o_custkey == F.col("c_custkey"),
    ).select("c_mktsegment", "o_custkey", "cents")
    gini_concentration(seg, "c_mktsegment", "o_custkey", "cents").orderBy(
        F.desc("gini")
    ).show()

    print("== rule significance (A18b): chi2 over the rule table ==")
    from mhw3d_detection_spark.operators.market import rules_with_chi2

    rules_with_chi2(rules).orderBy(F.desc("chi2")).select(
        "antecedent", "consequent", "n_ab", "lift", "chi2"
    ).show(3)

    print("== event study (A20) + difference-in-differences (A21) ==")
    from mhw3d_detection_spark.operators.analysis import (
        diff_in_diff,
        event_study,
    )

    evu = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    event_study(
        evu,
        treatment_pred=F.col("event_type") == "error",
        activity_pred=F.col("event_type") == "click",
    ).show()
    diff_in_diff(
        evu,
        treatment_agg=F.sum(
            (F.col("event_type") == "error").cast("int")
        ) >= F.lit(14),
        activity_pred=F.col("event_type") == "click",
    ).show()

    print("== HLL set algebra (E7gg): who clicked AND purchased ==")
    from mhw3d_detection_spark.operators.sketches import hll_set_algebra

    hll_set_algebra(
        ev,
        item=F.col("user_id").cast("string"),
        flag_a=F.col("event_type") == "click",
        flag_b=F.col("event_type") == "purchase",
    ).show()

    print("== queue backlog (W28) + active-time coverage (W29) ==")
    from mhw3d_detection_spark.operators.analysis import (
        interval_union,
        lindley_backlog,
    )

    deltas = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("delta"),
    )
    lindley_backlog(deltas, "user_id", ["us", "event_id"], "delta").orderBy(
        F.desc("max_backlog")
    ).show(3)
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1800000000)).alias("e"),
    )
    cov = interval_union(iv, "user_id", "s", "e")
    cov.agg(
        F.count("*").alias("users"),
        F.avg(F.col("covered") / F.lit(3.6e9)).alias("avg_active_hours"),
        F.avg("n_islands").alias("avg_sessions"),
    ).show()


if __name__ == "__main__":
    main()
