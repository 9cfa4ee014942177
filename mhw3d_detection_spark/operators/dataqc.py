"""Data-quality expectation checks — the pre-training audit layer a
100 TB curation pipeline runs BEFORE spending compute on it (Great
Expectations / Deequ shape, re-expressed as plain Spark aggregates).

Beyond-reference, pipeline-infrastructure: the reference assumes its
inputs are clean (xarray drops nothing silently); a petabyte corpus
never is. Every check reduces to counts, so reports are mergeable
across partitions/batches by construction.

Design: all per-row predicates over ONE table share a SINGLE scan
(one hash-aggregate computing every conditional count at once, then
``stack`` pivots to one row per check); referential checks are
LEFT ANTI joins (null-safe, never materialize the match); duplicate-
key checks are one count vs count-distinct aggregate. Nothing here
shuffles more than once per table, and every output is an exact
integer — the DuckDB oracle matches bit-for-bit with no quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row per named check: ``(check_name, n_violations,
    n_checked)``. Each value of ``checks`` is a VIOLATION predicate
    (true = bad row). All predicates are evaluated in one scan / one
    aggregate; a NULL predicate result counts as a violation (an
    expectation you cannot evaluate is not satisfied)."""
    if not checks:
        raise ValueError("expectation_report needs at least one check")
    # surrogate aliases __c0..__cN: check names are DATA (stack string
    # literals, single quotes escaped), never SQL identifiers — a name
    # with spaces/quotes/reserved words cannot break or inject into the
    # generated expression, and nothing collides with __n
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = list(checks)
    for idx, name in enumerate(names):
        aggs.append(
            F.count(F.when(F.coalesce(checks[name], F.lit(True)), 1)).alias(
                f"__c{idx}"
            )
        )
    one = df.agg(*aggs)
    pairs = ", ".join(
        "'{}', __c{}".format(n.replace("'", "''"), i)
        for i, n in enumerate(names)
    )
    return one.select(
        F.expr(f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"),
        F.col("__n").alias("n_checked"),
    ).select("check_name", "n_violations", "n_checked")


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    check_name: str,
) -> DataFrame:
    """Referential-integrity check: rows of ``child`` whose ``fk`` has
    no match in ``parent.pk`` (NULL fks count as orphans — left anti
    join keeps them, matching the "cannot evaluate = violated"
    convention). One anti-join plus two single-row aggregates."""
    orphans = (
        child.select(F.col(fk))
        .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("n_checked"))
    return (
        orphans.crossJoin(F.broadcast(total))
        .select(
            F.lit(check_name).alias("check_name"),
            "n_violations",
            "n_checked",
        )
    )


def duplicate_keys(df: DataFrame, key: str, check_name: str) -> DataFrame:
    """Primary-key uniqueness: ``count(*) - count(distinct key)`` in
    one aggregate (the number of EXTRA rows beyond one per key)."""
    return df.agg(
        F.lit(check_name).alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct(key)).alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    ).select("check_name", "n_violations", "n_checked")
