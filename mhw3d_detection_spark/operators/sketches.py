"""Mergeable cardinality sketches (HyperLogLog) as pure DataFrame ops.

The 100 TB question a curation pipeline asks constantly — "how many
distinct tokens / shingles / urls does each source contribute, and how
big is the union?" — does not need an exact distinct (a full shuffle of
every distinct key). A register sketch answers it with FIXED-SIZE
mergeable state: each item hashes to one of ``m = 2^p`` registers and
contributes only the leading-zero count of its remaining hash bits; the
per-source state is an ``m``-row table no matter how many items flowed
through, and the union of sources is a register-wise ``max`` — no
corpus re-scan, the same mergeability contract as the detection
partials (`operators/detection.py`) and the MinHash union signatures
(`operators/textops.py: source_overlap`).

Flajolet et al. 2007 (HyperLogLog), with the standard linear-counting
small-range correction from the original paper. Spark itself ships the
same idea as ``approx_count_distinct`` (HLL++), but its binary sketch
is opaque to a cross-engine differential; this implementation keeps
every intermediate a plain column so the DuckDB oracle replays it
BIT-EXACTLY:

- the item hash is the repo-standard 48-bit md5 prefix
  (``textops.minhash_base`` ≡ ``('0x'||substr(md5(x),1,12))::BIGINT``);
- the register word's bit-length is an unrolled integer CASE chain —
  no ``log2`` floats near power-of-two boundaries;
- each register contributes ``1.0 / (1::BIGINT << rho)`` — an exact
  power of two, and the register sum stays exact in ANY addition order
  because partial sums span at most 2^9 .. 2^-(WBITS+1), under the
  53-bit double mantissa. The raw estimate is therefore bit-identical
  across engines; only the linear-counting branch's ``ln`` is
  transcendental, and outputs are dyadically rounded (``queries/base.rq``)
  like every other float surface in the repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.textops import (
    MINHASH_A,
    minhash_base,
    minhash_member,
)

#: pass ``hash_fn=textops.xxhash_base`` for the non-oracle production
#: hash (~3x cheaper map side); every declared query keeps the default.

#: register-count exponent: m = 2^p registers, ~1.04/sqrt(m) ≈ 3.2%
#: relative standard error. State per group = m rows regardless of
#: input size — the whole point.
HLL_P = 10
HLL_M = 1 << HLL_P
#: bits left in the 48-bit base hash after the register index.
HLL_WBITS = 48 - HLL_P
#: bias constant for m >= 128 (Flajolet et al. 2007, Fig. 3).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def bitlen_col(w: Column, bits: int) -> Column:
    """Exact integer bit-length of ``w`` (0 for w == 0) as an unrolled
    comparison chain — integer compares only, so both engines agree on
    every input (a float ``log2`` is 1-ulp-ambiguous exactly at the
    power-of-two boundaries this function exists to resolve)."""
    e = F.when(w >= F.lit(1 << (bits - 1)), F.lit(bits))
    for k in range(bits - 1, 0, -1):
        e = e.when(w >= F.lit(1 << (k - 1)), F.lit(k))
    return e.otherwise(F.lit(0))


def bitlen_sql(expr: str, bits: int) -> str:
    """DuckDB mirror of :func:`bitlen_col` — the identical CASE chain."""
    whens = " ".join(
        f"WHEN ({expr}) >= {1 << (k - 1)} THEN {k}"
        for k in range(bits, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hll_reg_rho(item: Column, hash_fn=minhash_base) -> tuple[Column, Column]:
    """The ONE copy of the per-row HLL derivation (register index,
    leading-zero rank) — shared by the batch aggregate and the
    streaming windowed twin so the two sketch states cannot drift
    apart (cf. ``textops.shingle_array_sql`` for the same pattern)."""
    h = hash_fn(item)
    w = F.shiftright(h, HLL_P)
    rho = F.lit(HLL_WBITS + 1) - bitlen_col(w, HLL_WBITS)
    return (h % F.lit(HLL_M)), rho


def hll_registers(
    df: DataFrame, item: Column, group_cols: list[str], hash_fn=minhash_base
) -> DataFrame:
    """Per-group HLL register table: ``group_cols + (reg, rho)`` with
    ``rho = max`` over the group's items. One hash + one hash-aggregate
    (map-side combinable: ``max`` is mergeable); output is at most
    ``groups × m`` rows — the fixed-size sketch state."""
    reg, rho = hll_reg_rho(item, hash_fn)
    return (
        # NULL items carry no identity — drop them BEFORE hashing, or
        # they become a phantom (NULL reg, max rho) register that
        # perturbs every estimate (bitlen_col(NULL) falls through its
        # CASE to 0, so rho would read as the maximum rank)
        df.filter(item.isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from a register table:
    ``alpha * m^2 / sum_j 2^-M_j`` with absent registers contributing
    ``2^0``, linear counting ``m * ln(m / V)`` when the raw estimate is
    under ``2.5 m`` and empty registers remain. Registers-sized input,
    one tiny aggregate."""
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("__nreg"),
        # shiftleft by a COLUMN needs the SQL form (the Python helper
        # only takes a literal shift); 1L << rho is exact up to rho=39
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), rho)")
        ).alias("__s_present"),
    )
    s = F.col("__s_present") + (F.lit(HLL_M) - F.col("__nreg"))
    v = F.lit(HLL_M) - F.col("__nreg")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est_distinct"))


def token_cardinality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-token cardinality per source AND for the union of all
    sources, estimated from mergeable HLL registers, with the exact
    distinct count and relative error alongside (the exact column is
    affordable at test SF and IS the oracle; at 100 TB you would ship
    only the sketch columns and drop the exact branch).

    The union row (``source = '__ALL__'``) is computed by register-wise
    ``max`` over the per-source sketches — sketch-sized work, never a
    second corpus scan.

    Returns ``(source, est_distinct, exact_distinct, rel_err_pct)``.
    """
    from mhw3d_detection_spark.operators.textops import tokens_col

    tok = docs.select(
        "source", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    regs = hll_registers(tok, F.col("token"), ["source"])
    union_regs = regs.groupBy("reg").agg(F.max("rho").alias("rho")).select(
        F.lit("__ALL__").alias("source"), "reg", "rho"
    )
    est = hll_estimate(regs.unionByName(union_regs), ["source"])
    exact = tok.groupBy("source").agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    exact_all = tok.agg(F.countDistinct("token").alias("exact_distinct")).select(
        F.lit("__ALL__").alias("source"), "exact_distinct"
    )
    return (
        est.join(F.broadcast(exact.unionByName(exact_all)), "source")
        .select(
            "source",
            "est_distinct",
            "exact_distinct",
            (
                (F.col("est_distinct") / F.col("exact_distinct") - F.lit(1.0))
                * F.lit(100.0)
            ).alias("rel_err_pct"),
        )
    )


#: Count-Min dimensions: CM_D independent hash rows (reusing the
#: repo's MINHASH linear family over the 48-bit base hash) × CM_W
#: columns. State = CM_D * CM_W counters per group, mergeable by SUM —
#: the frequency-sketch dual of the HLL registers (Cormode &
#: Muthukrishnan 2005). Estimates only ever OVER-count (collisions add),
#: so min-over-rows is an upper bound with error ≤ 2N/CM_W at
#: probability 1 - 2^-CM_D.
CM_D = 4
CM_W = 64


def _cm_col(j: int, x: Column) -> Column:
    """Row-j column index: member j of the linear hash family over the
    48-bit item hash, folded to CM_W."""
    return minhash_member(j, x) % F.lit(CM_W)


def cm_buckets(item: Column, hash_fn=minhash_base) -> Column:
    """The ONE copy of the per-row Count-Min bucket derivation: an
    array of (j, col) structs, one per hash row — shared by the batch
    aggregate and the streaming windowed twin (explode + count on
    either side)."""
    x = hash_fn(item)
    return F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cm_col(j, x).alias("col"))
            for j in range(CM_D)
        ]
    )


def cm_sketch(
    df: DataFrame,
    item: Column,
    group_cols: list[str] | None = None,
    hash_fn=minhash_base,
) -> DataFrame:
    """Per-group Count-Min table ``group_cols + (j, col, cnt)``: each
    item occurrence increments one counter per hash row. One explode
    (×CM_D, a constant) + one map-side-combinable hash aggregate;
    output ≤ groups × CM_D × CM_W rows. Merging sketches of disjoint
    corpus parts = summing counters — the same contract as the HLL
    registers and the detection run-partials."""
    group_cols = group_cols or []
    return (
        # NULL items would explode into NULL-column counter rows
        df.filter(item.isNotNull())
        .select(*group_cols, F.explode(cm_buckets(item, hash_fn)).alias("b"))
        .select(*group_cols, F.col("b.j").alias("j"), F.col("b.col").alias("col"))
        .groupBy(*group_cols, "j", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item: Column,
    group_cols: list[str] | None = None,
    hash_fn=minhash_base,
) -> DataFrame:
    """Estimated occurrence count for each probe item: min over the
    CM_D rows of the probe's counter. Probes carry their own columns
    through; the sketch side is counters-sized, so the join
    broadcasts. Absent counters count 0 (probe never seen).

    ``hash_fn`` MUST be the hash the sketch was built with — the
    sketch is schema-identical either way, so a mismatch is
    undetectable and lands probes on unrelated counters, which can
    UNDERCOUNT (the one error Count-Min promises is impossible).

    A sketch built with group columns (or a streaming per-window
    store) must either be pre-merged — ``sum(cnt)`` per ``(j, col)`` —
    or have its grouping named in ``group_cols`` (output then carries
    one estimate per probe × group). Extra sketch columns that are
    neither are REJECTED: joining on (j, col) alone would min() across
    unrelated groups' counters and silently report garbage."""
    group_cols = group_cols or []
    extra = set(sketch.columns) - {"j", "col", "cnt"} - set(group_cols)
    if extra:
        raise ValueError(
            f"cm_estimate: sketch has grouping columns {sorted(extra)} — "
            "merge them first (sum cnt per (j, col)) or pass group_cols"
        )
    # __-prefixed internals (house style): a probe frame may already
    # carry columns named b/j/col — bare aliases would fail analysis
    # with a duplicate-column error
    lookup = probes.select(
        "*", F.explode(cm_buckets(item, hash_fn)).alias("__b")
    ).select(
        "*", F.col("__b.j").alias("__j"), F.col("__b.col").alias("__col")
    ).drop("__b")
    keep = [c for c in probes.columns]
    sk = sketch.select(
        *group_cols,
        F.col("j").alias("__j"),
        F.col("col").alias("__col"),
        F.col("cnt").alias("__cnt"),
    )
    if not group_cols:
        return (
            lookup.join(F.broadcast(sk), ["__j", "__col"], "left")
            .groupBy(*keep)
            .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("est_count"))
        )
    # per-group estimates: every probe is scored against EVERY group's
    # counters (inner join on (j,col) would drop probe x group combos
    # whose counters are absent — those must read 0, so cross the probe
    # positions with the group list first)
    groups = sketch.select(*group_cols).distinct()
    return (
        lookup.crossJoin(F.broadcast(groups))
        .join(F.broadcast(sk), [*group_cols, "__j", "__col"], "left")
        .groupBy(*keep, *group_cols)
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("est_count"))
    )


def token_frequency_sketch(docs: DataFrame, text_col: str = "text", top_n: int = 20) -> DataFrame:
    """Count-Min token-frequency estimates for the corpus's ``top_n``
    tokens (deterministic selection: exact count desc, token asc), with
    the exact count alongside as the error reference. The sketch is the
    100 TB artifact (fixed CM_D × CM_W counters, mergeable by sum);
    the exact branch is affordable at test SF and IS the oracle.

    Returns ``(token, est_count, exact_count, over_count)`` —
    ``over_count = est - exact >= 0`` (Count-Min never undercounts).
    """
    from mhw3d_detection_spark.operators.textops import tokens_col

    tok = docs.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
    sketch = cm_sketch(tok, F.col("token"))
    exact = tok.groupBy("token").agg(F.count("*").alias("exact_count"))
    # orderBy + limit plans as TakeOrderedAndProject (per-partition
    # top-n, merged on the driver) — NOT a row_number window, which
    # would funnel the whole distinct-token table through a single
    # partition. (token) breaks count ties, so the pick is total-order
    # deterministic either way.
    probes = exact.orderBy(F.col("exact_count").desc(), F.col("token")).limit(
        top_n
    )
    est = cm_estimate(sketch, probes, F.col("token"))
    return est.select(
        "token",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("over_count"),
    )


def hist_bin(value: Column, *, lo: float, hi: float, n_bins: int) -> Column:
    """The ONE copy of the per-row fixed-grid bin index (values outside
    [lo, hi) clamp to the edge bins) — shared by the batch aggregate
    and the streaming windowed twin."""
    width = (hi - lo) / n_bins
    b = F.floor((value - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))


def hist_sketch(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Per-group fixed-grid histogram ``group_cols + (bin, cnt)`` over
    ``[lo, hi)`` (values outside clamp to the edge bins). The
    distribution dual of the HLL/Count-Min sketches: n_bins counters
    per group, mergeable by SUM across corpus parts, one map-side-
    combinable hash aggregate. Unlike a t-digest the grid is FIXED, so
    merges are exact (not approximate re-compression) and the sketch
    replays bit-identically in any engine — integer bin indices from
    one IEEE subtract/divide/floor."""
    group_cols = group_cols or []
    return (
        df.select(*group_cols, hist_bin(value, lo=lo, hi=hi, n_bins=n_bins).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    edge_flags: tuple[bool, bool] = (True, True),
) -> DataFrame:
    """Interpolated quantile estimates from a histogram sketch: for
    each q, the first bin whose cumulative count reaches ``q * n``,
    linearly interpolated inside the bin (error ≤ one bin width).
    Histogram-sized work: a cumulative window over ≤ n_bins rows per
    group, a tiny literal explode for the probe list, one min-by pick.
    Returns ``group_cols + (q, est, clipped)``.

    ``edge_flags = (flag_lo, flag_hi)`` controls which edge bins raise
    ``clipped``: an edge bin holds everything CLAMPED past the grid, so
    a quantile landing there may exceed the one-bin-width bound — but
    only if values CAN fall outside on that side. When ``lo`` (or
    ``hi``) is a hard domain bound (lengths >= 0, ratios <= 1), pass
    False for that side to avoid false alarms on skewed-but-in-range
    groups."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
    )
    tot = hist.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    probes = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    cand = cum.join(tot, group_cols).select("*", probes).withColumn(
        "target", F.col("q") * F.col("n")
    )
    first_bin = (
        cand.filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        first_bin.join(cand, [*group_cols, "q", "bin"])
        .withColumn(
            "est",
            F.lit(lo)
            + F.col("bin") * F.lit(width)
            + F.lit(width) * (F.col("target") - F.col("prev")) / F.col("cnt"),
        )
        # surface possible saturation instead of silently misreporting
        # heavy-tailed groups (see docstring; flag per edge_flags)
        .withColumn(
            "clipped",
            (
                (F.lit(edge_flags[0]) & (F.col("bin") == 0))
                | (F.lit(edge_flags[1]) & (F.col("bin") == F.lit(n_bins - 1)))
            ).cast("int"),
        )
        .select(*group_cols, "q", "est", "clipped")
    )
    return est


def doc_length_quantiles(
    docs: DataFrame,
    *,
    lo: float = 0.0,
    hi: float = 2048.0,
    n_bins: int = 128,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-source document-length quantiles (p50/p90/p99 of n_chars)
    from the mergeable histogram sketch — the length-distribution
    profile a curation pipeline tracks per source at 100 TB without an
    exact percentile's full sort. Returns
    ``(source, q, est_chars, clipped)`` — ``clipped = 1`` marks a
    quantile landing in the TOP bin, where grid saturation voids the
    one-bin-width error bound (widen ``hi`` for that source). The
    bottom bin never flags: lengths are >= 0, so with ``lo = 0``
    nothing can clamp from below."""
    h = hist_sketch(
        docs, F.col("n_chars").cast("double"), ["source"],
        lo=lo, hi=hi, n_bins=n_bins,
    )
    out = hist_quantiles(
        h, ["source"], lo=lo, hi=hi, n_bins=n_bins, qs=qs,
        edge_flags=(False, True),
    )
    return out.select(
        "source", "q", F.col("est").alias("est_chars"), "clipped"
    )


#: shared grid for the doc-length quantile query and its oracle:
#: (lo, hi, n_bins, quantiles). 16-char bins over [0, 2048).
_DOCLEN_GRID = (0.0, 2048.0, 128, (0.5, 0.9, 0.99))


#: Default Bloom filter dimensions: BLOOM_K positions per item (the
#: MINHASH linear family again) over BLOOM_M bits. The sketch is the
#: DISTINCT set-bit table (≤ m rows), mergeable by UNION — membership
#: has no false negatives; false-positive rate ≈ (1 - e^{-kn/m})^k.
#: 4096 bits is the ORACLE/test size (``q_decontaminate_bloom``). Size
#: production filters for the key-set cardinality n and a target fpr p
#: with m ≈ -n·ln(p)/ln(2)² and k ≈ (m/n)·ln(2): a 10⁷-shingle eval
#: set at p = 1 % wants m ≈ 2²⁷ bits (~128 M rows of broadcast state,
#: ~1 GB — still executor-feasible); leaving m at 4096 there saturates
#: every bit and the pre-filter stops pruning (fpr → 1).
BLOOM_K = 4
BLOOM_M = 4096


def _bloom_positions(
    item: Column, m: int, k: int, fast_hash: bool = False
) -> Column:
    """The k bit positions of one item: disjoint 32-bit md5 segments
    mod m (ONE md5 per item, each segment's bits independent of the
    others') — NOT k affine transforms of a single 48-bit value, whose
    residues mod a power-of-two m all collapse to functions of
    ``x mod m`` (measured: fpr degenerates from the textbook
    (1-e^{-kn/m})^k to ~n/m, a 30× loss at n=50k, m=2^20). md5's 32
    nibbles supply at most 4 disjoint segments; for k > 4 use
    ``fast_hash=True`` (j-salted xxhash64, any k, no DuckDB oracle)."""
    if fast_hash:
        return F.array(
            *[F.pmod(F.xxhash64(item, F.lit(j)), F.lit(m)) for j in range(k)]
        )
    assert k <= 4, "md5 supplies 4 disjoint 32-bit segments; use fast_hash"
    md5 = F.md5(item.cast("binary"))
    return F.array(
        *[
            F.pmod(
                F.conv(F.substring(md5, 1 + 8 * j, 8), 16, 10).cast("long"),
                F.lit(m),
            )
            for j in range(k)
        ]
    )


def bloom_bits(
    df: DataFrame,
    item: Column,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    fast_hash: bool = False,
) -> DataFrame:
    """Build the Bloom sketch for a key set: the distinct bit positions
    set by any item — one explode (×k) + one distinct, output ≤ m
    single-column rows. Blooms of corpus parts merge by UNION +
    distinct; no re-scan of either part. See the module-level sizing
    rule for choosing ``m``/``k``."""
    pos = _bloom_positions(item, m, k, fast_hash)
    # NULL items set no bits (they have no identity to test later)
    return df.filter(item.isNotNull()).select(
        F.explode(pos).alias("bit")
    ).distinct()


def bloom_membership(
    bits: DataFrame,
    probes: DataFrame,
    item: Column,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    fast_hash: bool = False,
) -> DataFrame:
    """Tag each probe row with ``maybe_present``: 1 iff ALL of the
    item's k bit positions are set in the sketch (no false negatives;
    false positives at the documented rate). The sketch side is ≤ m
    rows — always a broadcast; the probe side streams.

    ``m``, ``k`` and ``fast_hash`` MUST match what :func:`bloom_bits`
    used — a mismatch probes unrelated bits and can return a FALSE
    NEGATIVE, the one error a Bloom filter promises is impossible."""
    pos = _bloom_positions(item, m, k, fast_hash)
    keep = list(probes.columns)
    # __bit, not bit: a probe frame carrying its own `bit` column must
    # not collide with the exploded lookup positions
    lookup = probes.select("*", F.explode(pos).alias("__bit"))
    marked = lookup.join(
        F.broadcast(
            bits.select(F.col("bit").alias("__bit"), F.lit(1).alias("__set"))
        ),
        "__bit",
        "left",
    )
    return marked.groupBy(*keep).agg(
        (F.sum(F.coalesce(F.col("__set"), F.lit(0))) == F.lit(k))
        .cast("int")
        .alias("maybe_present")
    )


def bloom_decontaminate(
    docs: DataFrame,
    probe_pred,
    text_col: str = "text",
    *,
    flag_frac: float = 0.5,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom pre-filter for eval decontamination: build the sketch from
    the PROBE docs' distinct shingles (the held-out eval set), then
    screen every corpus doc by the fraction of its shingles the Bloom
    may contain. No false negatives ⇒ a doc flagged clean here needs no
    exact check — the expensive shingle equi-join
    (`textops.contamination_screen`) runs only on the flagged fraction.
    Unlike that join, the corpus side never shuffles on the shingle
    key: the Bloom is a ≤ BLOOM_M-row broadcast no matter how large the
    eval set grows.

    Returns ``(doc_id, n_shingles, n_maybe_hits, hit_frac, flagged)``
    for every corpus (non-probe) doc with ≥ 1 shingle."""
    from mhw3d_detection_spark.operators.textops import shingles

    sh = shingles(docs, text_col=text_col).select("doc_id", "shingle").distinct()
    probe_sh = sh.filter(probe_pred(F.col("doc_id")))
    corpus_sh = sh.filter(~probe_pred(F.col("doc_id")))
    bloom = bloom_bits(probe_sh, F.col("shingle"), m=m, k=k)
    mem = bloom_membership(bloom, corpus_sh, F.col("shingle"), m=m, k=k)
    # (both sides share _bloom_positions defaults; fast_hash would need
    # threading through here if a caller ever wants k > 4)
    return (
        mem.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("maybe_present").alias("n_maybe_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_maybe_hits",
            (F.col("n_maybe_hits") / F.col("n_shingles")).alias("hit_frac"),
            (F.col("n_maybe_hits") / F.col("n_shingles") >= F.lit(flag_frac))
            .cast("int")
            .alias("flagged"),
        )
    )


# =========================================================================
# Heavy hitters: Misra-Gries candidate sketch + exact verify recount
# =========================================================================

#: default counter budget: any item with frequency > 1/k survives the
#: sketch pass (Misra-Gries guarantee), so the verified output is the
#: EXACT set {item : count * k > n} regardless of partitioning.
MG_K = 40


def misra_gries_candidates(
    items: DataFrame, item_col: str = "item", k: int = MG_K
) -> DataFrame:
    """Per-partition Misra-Gries summary (k counters) over an item
    stream; returns the union of surviving candidate items.

    Bounded-memory frequent-items pass (Misra & Gries 1982, in the
    mergeable-summaries form of Agarwal et al. PODS'12): each partition
    keeps at most ``k`` (item, count) counters; when a batch merge
    overflows the budget, the (k+1)-th largest count is subtracted from
    every counter and non-positive counters are dropped. Total
    subtraction per partition is <= n_p/(k+1), so any item with
    partition count > n_p/(k+1) survives, and by pigeonhole any item
    with GLOBAL count > n/(k+1) survives in at least one partition —
    the candidate union is a guaranteed superset of the true heavy
    hitters at threshold 1/k. State per task is O(k) no matter how many
    items stream through (the 100 TB property: the sketch pass is a
    narrow map with fixed memory; only ~k * n_partitions candidate rows
    ever leave the executors).

    The candidate SET depends on partition boundaries (like any MG
    run); callers must never expose it directly — `heavy_hitters`
    recounts candidates exactly, which makes the final output
    partitioning-invariant (pinned in tests/test_r13_wave2.py).
    """
    import pandas as pd

    def summarize(pdfs):
        counters: dict = {}
        for pdf in pdfs:
            vc = pdf[item_col].dropna().value_counts()
            for it, c in vc.items():
                counters[it] = counters.get(it, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                sub = vals[k]
                counters = {
                    it: c - sub for it, c in counters.items() if c > sub
                }
        if counters:
            yield pd.DataFrame({item_col: list(counters.keys())})

    # carry the item column's own type through the sketch (a hardcoded
    # string schema would silently mangle integer keys)
    item_type = dict(items.dtypes)[item_col]
    return items.select(item_col).mapInPandas(
        summarize, schema=f"{item_col} {item_type}"
    )


def heavy_hitters(
    items: DataFrame, item_col: str = "item", k: int = MG_K
) -> DataFrame:
    """Exact heavy hitters {item : count * k > n_total} at 100 TB cost:
    a fixed-memory sketch pass finds candidates, then an exact recount
    runs ONLY over the candidate set.

    Three passes over the stream, all cheap where exact top-frequency
    is not: the `misra_gries_candidates` sketch (narrow map, O(k)
    state, no shuffle of the item domain), a column-pruned scalar
    count(*) for n_total (narrow, no shuffle), and the recount, which
    inner-joins the stream to the BROADCAST candidate list (<= k *
    n_partitions rows) and hash-aggregates only matching items — the
    full-domain shuffle of a naive GROUP BY over every distinct item
    never happens, which is the cost that matters. The
    MG superset guarantee makes the result EXACT and independent of
    partition layout: no true heavy hitter can be missed, and false
    candidates are eliminated by the recount filter.

    Returns ``(item, cnt, n_total, freq)`` with exact int64 counts;
    ``freq`` is one int64/int64 IEEE division (bit-exact cross-engine,
    RAW-hash safe). The scalar ``n_total`` attaches via a 1-row
    broadcast cross join (the declared scalar-broadcast escape class).
    """
    src = items.select(item_col).filter(F.col(item_col).isNotNull())
    # distinct: the same item can survive MG in several partitions, and
    # a duplicated candidate row would multiply the recount join
    cands = misra_gries_candidates(src, item_col=item_col, k=k).distinct()
    total = src.agg(F.count("*").alias("n_total"))
    return (
        src.join(F.broadcast(cands), item_col, "inner")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("n_total"))
        .select(
            item_col,
            "cnt",
            "n_total",
            (F.col("cnt").cast("double") / F.col("n_total")).alias("freq"),
        )
    )


def token_heavy_hitters(
    docs: DataFrame, text_col: str = "text", k: int = MG_K
) -> DataFrame:
    """`heavy_hitters` over the corpus token stream — the vocabulary
    screen a tokenizer-training pipeline runs first (which strings
    deserve their own token id?). The driver corpus has a ~31-word
    vocabulary so most tokens clear the 1/k bar; the operator's value
    is the contract (bounded state, exact verified output) pinned by
    the skew property tests, not this demo's selectivity."""
    from mhw3d_detection_spark.operators.textops import tokens_col

    toks = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    return heavy_hitters(toks, item_col="token", k=k)


def hll_set_algebra(
    df: DataFrame,
    item: Column,
    flag_a: Column,
    flag_b: Column,
) -> DataFrame:
    """Sketch-side SET ALGEBRA: estimate |A|, |B|, |A∪B| and (by
    inclusion-exclusion) |A∩B| for two item sets defined by row
    predicates, from three fixed-size register tables — the "how many
    users did BOTH" question answered without ever shuffling the item
    domain twice. Union is a register-wise max (the HLL mergeability
    the family is built on); the intersection estimate
    ``est_a + est_b − est_union`` is the standard inclusion-exclusion
    reading and can go slightly negative for tiny overlaps — callers
    floor it if they need a count. Exact references ride along from
    one per-item flag aggregate (affordable at test SF; at 100 TB you
    ship only the sketches).

    Returns one row: ``(est_a, est_b, est_union, est_intersection,
    exact_a, exact_b, exact_intersection)``.
    """
    a_regs = hll_registers(df.filter(flag_a), item, [])
    b_regs = hll_registers(df.filter(flag_b), item, [])
    u_regs = (
        a_regs.unionAll(b_regs).groupBy("reg").agg(F.max("rho").alias("rho"))
    )
    ea = hll_estimate(a_regs, []).select(
        F.col("est_distinct").alias("est_a")
    )
    eb = hll_estimate(b_regs, []).select(
        F.col("est_distinct").alias("est_b")
    )
    eu = hll_estimate(u_regs, []).select(
        F.col("est_distinct").alias("est_union")
    )
    per_item = (
        df.select(
            item.alias("it"),
            flag_a.cast("int").alias("fa"),
            flag_b.cast("int").alias("fb"),
        )
        .filter(F.col("it").isNotNull())
        .groupBy("it")
        .agg(F.max("fa").alias("ha"), F.max("fb").alias("hb"))
    )
    exact = per_item.agg(
        F.sum("ha").alias("exact_a"),
        F.sum("hb").alias("exact_b"),
        F.sum(
            (F.col("ha") * F.col("hb"))
        ).alias("exact_intersection"),
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (
                F.col("est_a") + F.col("est_b") - F.col("est_union")
            ).alias("est_intersection"),
            "exact_a",
            "exact_b",
            "exact_intersection",
        )
    )
