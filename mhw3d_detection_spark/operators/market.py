"""Market-basket analysis: pairwise co-occurrence support / confidence
/ lift over transaction baskets (Agrawal et al. SIGMOD'93 association
rules, restricted to the 2-itemset lattice level).

The training-data-pipeline reading: a "basket" is any grouping key and
an "item" any categorical attribute — orders x part brands here, but
the same operator answers "which sources co-occur in a user's reading
session" or "which tags co-occur on a document". Pairwise (not full
Apriori) is deliberate: 2-itemset rules are the level every
recommender/diagnostic actually consumes, and the pair stage is the
exact same bounded-fanout shape the dedup family's candidate joins use.

Scale design (the 100 TB contract):
- ONE shuffle of the basket table builds per-basket sorted item
  arrays; ordered pairs are generated ROW-LOCALLY by array slicing
  (flatten/transform — no self-join, no second shuffle of the facts).
  Per-basket fanout is s*(s-1)/2 with s = |distinct items in basket|,
  bounded by the basket size — the operator's cost model is explicit
  and a hot basket cannot go quadratic in the corpus.
- item marginals and the basket count are item-domain / scalar sized;
  they attach by BROADCAST joins (the item domain of a rules run is
  small by construction — brands, sources, tags), never a fact
  shuffle.
- all counts are exact int64; support/confidence are single int64
  IEEE divisions and lift is one division of two int64 products
  (n_ab*n_baskets < 2^63 up to ~3e9 baskets) — bit-exact
  cross-engine, RAW-hash safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "baskets_from_lineitem",
    "basket_arrays",
    "basket_pair_counts",
    "association_rules",
    "rules_with_chi2",
]


def baskets_from_lineitem(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """(basket, item) = distinct (order, part brand): the driver
    schema's natural transaction table. The part dim attaches by
    broadcast (dim-sized) before the one distinct shuffle."""
    return (
        lineitem.select("l_orderkey", "l_partkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("item"),
        )
        .distinct()
    )


def basket_arrays(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """(basket, sorted distinct item array) — the shared subplan every
    downstream basket statistic (pairs, item marginals, basket count)
    derives from.

    Plan reality, measured: Catalyst does NOT collapse the three
    consumers into one scan — column pruning specializes each branch
    to its minimal form (the basket-count branch drops collect_set for
    a plain distinct-count; the marginal branch prunes the sort), so
    the canonicalized exchanges diverge and reuse cannot fire. Each
    branch is individually optimal; the lazy plan pays up to 3 fact
    passes. At corpus scale the production path materializes the
    basket table ONCE (persist, or the SC7 bucketed sink keyed on
    ``basket_col`` — docs/PLANS.md prices that lever at −43% keyed-agg
    wall); the oracle rows keep the lazy form."""
    return baskets.groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("items")
    )


def _pairs_from_arrays(arrs: DataFrame) -> DataFrame:
    """Ordered item pairs (a < b), exploded row-locally from the
    per-basket array: element i pairs with every later element (slice
    start is 1-based so successors of 0-based i begin at i + 2). No
    self-join — the fact side is never joined to itself."""
    return arrs.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")


def basket_pair_counts(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """Co-occurrence counts n_ab for every ordered item pair (a < b).

    One groupBy shuffle builds the per-basket sorted distinct item
    array; pairs explode row-locally, then a pair-domain-sized hash
    aggregate. Bounded s*(s-1)/2 fanout per basket.
    """
    return _pairs_from_arrays(
        basket_arrays(baskets, basket_col, item_col)
    ).groupBy("item_a", "item_b").agg(F.count("*").alias("n_ab"))


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    min_count: int = 1,
) -> DataFrame:
    """2-itemset association rules: for every directed pair
    (antecedent -> consequent) with co-occurrence >= ``min_count``,
    exact support, confidence and lift.

    ``min_count`` is the integer support floor (an exact int64
    comparison — never a float threshold): at corpus scale it is the
    lever that keeps the rule table item-domain-sized.

    Returns ``(antecedent, consequent, n_ab, n_ant, n_cons, n_baskets,
    support, confidence, lift)``.
    """
    arrs = basket_arrays(baskets, basket_col, item_col)
    pc = (
        _pairs_from_arrays(arrs)
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(min_count))
    )
    # marginals and the basket count derive from the SAME arrs subplan
    # as the pairs — but Catalyst prunes each consumer branch to its
    # minimal form, so the lazy plan still pays up to 3 fact passes
    # (see basket_arrays' measured note); materialize baskets once at
    # corpus scale
    ic = (
        arrs.select(F.explode("items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").alias("n_i"))
    )
    nb = arrs.agg(F.count("*").alias("n_baskets"))
    directed = pc.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_ab",
    ).unionAll(
        pc.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_ab",
        )
    )
    ant = ic.select(
        F.col(item_col).alias("antecedent"), F.col("n_i").alias("n_ant")
    )
    cons = ic.select(
        F.col(item_col).alias("consequent"), F.col("n_i").alias("n_cons")
    )
    return (
        directed.join(F.broadcast(ant), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_ant",
            "n_cons",
            "n_baskets",
            (F.col("n_ab").cast("double") / F.col("n_baskets")).alias(
                "support"
            ),
            (F.col("n_ab").cast("double") / F.col("n_ant")).alias(
                "confidence"
            ),
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_ant") * F.col("n_cons")).cast("double")
            ).alias("lift"),
        )
    )


def rules_with_chi2(rules: DataFrame) -> DataFrame:
    """Append the 2x2 chi-squared independence statistic to an
    `association_rules` table — the significance screen that separates
    real co-purchase signal from small-count noise (a lift of 3 on
    n_ab = 2 means nothing; chi2 prices it).

    Contingency from the columns already present (no corpus re-scan):
    o11 = n_ab, o12 = n_ant − n_ab, o21 = n_cons − n_ab,
    o22 = n − n_ant − n_cons + n_ab, and the closed form
    chi2 = n·(o11·o22 − o12·o21)² / (n_ant·n_cons·(n−n_ant)·(n−n_cons)).

    Every count casts to DOUBLE before any product (the int64 form of
    the denominator wraps past ~55k baskets); the expression tree is
    written identically in the SQL oracle, so each IEEE op lands on
    the same bits cross-engine — RAW-hash safe without quantization.
    Degenerate margins (an item in every or no basket) yield NULL.
    """
    n = F.col("n_baskets").cast("double")
    a = F.col("n_ant").cast("double")
    b = F.col("n_cons").cast("double")
    ab = F.col("n_ab").cast("double")
    det = ab * (n - a - b + ab) - (a - ab) * (b - ab)
    denom = a * b * (n - a) * (n - b)
    return rules.withColumn(
        "chi2",
        F.when(denom > F.lit(0.0), n * det * det / denom),
    )
