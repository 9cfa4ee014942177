"""Run every TPC-H query shape (all 22, adapted to the driver schema)
and print a one-line summary per query — the 'a user of the reference
could run every query they run today' demonstration for the
relational surface.

Usage: PYTHONPATH=/root/repo python examples/tpch_tour.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from mhw3d_detection_spark import queries as Q
from mhw3d_detection_spark.session import get_spark

SHAPES = [
    ("Q1", "q_tpch_q1_shape", "pricing summary (wide aggregate scan)"),
    ("Q2", "q_tpch_q2_shape", "min-cost supplier (correlated scalar min)"),
    ("Q3", "q_tpch_q3_shape", "shipping priority (top-10 join)"),
    ("Q4", "q_tpch_q4_shape", "order priority (correlated EXISTS)"),
    ("Q5", "q_tpch_q5_shape", "local supplier volume (star join)"),
    ("Q6", "q_tpch_q6_shape", "forecast revenue (scan-bound filter)"),
    ("Q7", "q_tpch_q7_shape", "volume shipping (nation joined twice)"),
    ("Q8", "q_tpch_q8_shape", "national market share"),
    ("Q9", "q_tpch_q9_shape", "product profit (deep dim chain)"),
    ("Q10", "q_tpch_q10_shape", "returned items per customer"),
    ("Q11", "q_tpch_q11_shape", "important stock (HAVING > scalar)"),
    ("Q12", "q_tpch_q12_shape", "priority contingency"),
    ("Q13", "q_tpch_q13_shape", "order-count distribution (outer join)"),
    ("Q14", "q_tpch_q14_shape", "promo revenue share"),
    ("Q15", "q_tpch_q15_shape", "top supplier (argmax via max())"),
    ("Q16", "q_tpch_q16_shape", "supplier variety (NOT IN anti join)"),
    ("Q17", "q_tpch_q17_shape", "small-quantity revenue (corr. avg)"),
    ("Q18", "q_tpch_q18_shape", "large orders (IN over HAVING)"),
    ("Q19", "q_tpch_q19_shape", "disjunctive pushdown (OR-of-ANDs)"),
    ("Q20", "q_tpch_q20_shape", "dominant suppliers (nested IN+scalar)"),
    ("Q21", "q_tpch_q21_shape", "kept waiting (EXISTS + NOT EXISTS)"),
    ("Q22", "q_tpch_q22_shape", "dormant customers (scalar + anti)"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("tpch-tour")
    total = 0.0
    for tag, name, blurb in SHAPES:
        t0 = time.time()
        n = Q.REGISTRY[name].spark_fn(spark, sf_dir).count()
        w = time.time() - t0
        total += w
        print(f"{tag:>4}  {w:6.2f}s  {n:7d} rows  {blurb}")
    print(f"\nall 22 shapes in {total:.1f}s at {sf_dir}")


if __name__ == "__main__":
    main()
