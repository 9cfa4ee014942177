"""Build the sf1 scale-probe input: a 10x FK-consistent key-offset
replication of sf0.1 under `.scratch/sf1` (the r8 probe protocol,
docs/PLANS.md "r8 sf1 scale probe").

- Every key column is offset by `replica * stride` (stride = max+1 of
  the source key), so joins stay FK-consistent and key cardinalities
  scale 10x with zero collisions.
- region/nation are FK TARGET dims — copied once, unchanged.
- Replica documents carry a distinct leading token (`replicaNx `) so
  text dedup sees NEAR-dup clones (the realistic crawl shape), not
  byte-identical copies; replica 0 is the original corpus verbatim.
- Timestamps/values are left unchanged: the time and cell domains stay
  fixed (more samples per (cell, day), the dense-grid regime), which
  is exactly what makes the probe read ingest-side scaling rather than
  domain growth.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10

#: per-table (key column -> stride source) offsets; strides are
#: computed as max(key)+1 from the SOURCE table that owns the key
OFFSETS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
COPY_ONCE = ("region", "nation")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for table, keys in OFFSETS.items():
        for _, (st, sk) in keys.items():
            if (st, sk) not in strides:
                strides[(st, sk)] = con.execute(
                    f"SELECT max({sk}) + 1 FROM '{src}/{st}.parquet'"
                ).fetchone()[0]

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied once")

    for t, keys in OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(REPLICAS):
            parts = []
            for c in cols:
                if c in keys:
                    stride = strides[keys[c]]
                    parts.append(f"{c} + {r * stride} AS {c}")
                elif t == "documents" and c == "text" and r > 0:
                    parts.append(f"'replica{r}x ' || text AS text")
                else:
                    parts.append(c)
            selects.append(
                f"SELECT {', '.join(parts)} FROM '{src}/{t}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(t, "x10 ->", n, "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
