"""Text-analysis & dedup operators for large-scale training-data
pipelines (SURVEY.md §2.11, beyond-reference): tokenization, quality
scoring, language ID, fingerprinting, exact / MinHash / SimHash /
n-gram-Jaccard deduplication.

Everything is pure Column expressions + hash aggregates (JVM-side,
codegen'd) — no Python UDFs anywhere on the hot path. Hash functions
are md5-based so the DuckDB oracles can reproduce them bit-for-bit;
``xxhash64`` is ~3× faster at 100 TB and md5 keeps the differential
gate exact — swap via ``fast_hash=True`` (minhash builders) or
``hash_fn=xxhash_base`` (sketch builders).

Scale notes: every op here is embarrassingly parallel per document
(narrow until the final aggregate); MinHash banding turns all-pairs
near-dup (O(n^2)) into an equi-join on (band, signature) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

#: tiny built-in stopword lists for the language-ID heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "for"),
    "de": ("der", "die", "und", "ist", "das", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
    "es": ("el", "los", "las", "una", "por", "con", "que"),
}


def tokens_col(text: Column) -> Column:
    """Lowercased word tokens (BPE-ish regex over [a-z0-9] runs)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per (doc, position, token) — posexplode so downstream
    shingling keeps sequence order."""
    return docs.select(
        "doc_id", F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token")
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Word n-gram shingles per doc, derived by direct array slicing
    (no window pass): shingle_i = tokens[i..i+n-1] joined by spaces.

    Docs shorter than ``n`` tokens yield no shingles — guarded with an
    explicit CASE because Spark's ``sequence(1, 0)`` is DESCENDING
    ``[1, 0]`` (not empty), which would feed ``slice`` a zero start.

    ``carry_cols`` rides extra doc attributes through the explode —
    callers that need (shingle, attribute) rows avoid a data-sized
    join back to the doc table (attaching an attribute post-explode
    shuffles the whole shingle table on doc_id; carrying it is free)."""
    toks = tokens_col(F.col(text_col))
    return (
        docs.withColumn("__toks", toks)
        .select(
            "doc_id",
            *carry_cols,
            F.explode(F.expr(shingle_array_sql("__toks", n))).alias("shingle"),
        )
    )


def distinct_shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3,
    with_size: bool = False,
) -> DataFrame:
    """Per-doc DISTINCT shingles with the dedup done ROW-LOCALLY:
    ``array_distinct`` over the shingle array, then one explode — no
    ``(doc_id, shingle)`` exchange. Bit-identical to
    ``shingles(...).distinct()`` because ``doc_id`` is in that
    distinct's key, so the only dedup it ever performs is within-doc —
    exactly what ``array_distinct`` does on the doc's own array
    (r13 optimization: the distinct-shingle consumers each paid a full
    shuffle of the shingle table just to dedup within-doc; guide §2.4
    "remove shuffles outright").

    ``with_size=True`` additionally carries the doc's distinct-shingle
    count ``sz`` on every exploded row (the carry-don't-rejoin device,
    guide §2.3): ``sz`` is constant per doc, so a pair aggregate
    recovers it exactly with ``max()`` — consumers drop the join back
    to a per-doc size table (which re-tokenized the whole corpus)."""
    toks = tokens_col(F.col(text_col))
    arr = docs.withColumn("__toks", toks).select(
        "doc_id",
        F.array_distinct(
            F.expr(shingle_array_sql("__toks", n))
        ).alias("__arr"),
    )
    # explode_outer, NOT explode: for a plain explode over a projected
    # attribute, InferFiltersFromGenerate adds `size(__arr) > 0 AND
    # __arr IS NOT NULL` below the Generate and predicate pushdown then
    # substitutes the WHOLE tokenize+shingle expression into that
    # filter — regexp_extract_all ends up evaluated ~5x per document
    # (measured 8.0 s vs 1.6 s on q_boilerplate_frac at sf0.1). The
    # outer explode admits no inferred filter; the post-Generate
    # isNotNull on the OUTPUT column restores inner-explode semantics
    # exactly (shingle elements are concat_ws results, never NULL, so
    # the only NULL rows are the empty/sub-n-token docs the inner
    # explode dropped).
    if with_size:
        return arr.select(
            "doc_id",
            F.size("__arr").cast("long").alias("sz"),
            F.explode_outer("__arr").alias("shingle"),
        ).filter(F.col("shingle").isNotNull())
    return arr.select(
        "doc_id", F.explode_outer("__arr").alias("shingle")
    ).filter(F.col("shingle").isNotNull())


def distinct_shingle_counts(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-doc distinct-shingle count ``(doc_id, sz)`` as a ROW-LOCAL
    expression — ``size(array_distinct(<shingle array>))`` — replacing
    a groupBy over the exploded shingle table (one exchange of the
    whole shingle table just to count per doc; r13 optimization,
    guide §2.3 "aggregate before you shuffle" taken to its limit: no
    shuffle at all). Docs with fewer than ``n`` tokens count 0 (they
    had no rows in the exploded form; every consumer inner-joins on
    docs that DO have shingles, so the extra sz=0 rows are inert)."""
    toks = tokens_col(F.col(text_col))
    return docs.withColumn("__toks", toks).select(
        "doc_id",
        F.size(
            F.array_distinct(F.expr(shingle_array_sql("__toks", n)))
        ).cast("long").alias("sz"),
    )


def shingle_array_sql(toks_col: str, n: int) -> str:
    """The shared shingle-array SQL over a token-array column — the
    ONE copy of the sub-``n``-tokens guard (see :func:`shingles`) so
    the exploded batch path and the row-local streaming path
    (:func:`minhash_bands_rowlocal`) cannot drift apart."""
    return (
        f"case when size({toks_col}) >= {n} then "
        f"transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {n}))) "
        f"else array() end"
    )


def composite_quality_col(text_col: str = "text") -> Column:
    """The composite quality score as a ROW-LOCAL column expression —
    shared by :func:`text_stats` (batch) and the streaming curriculum
    gate, so the two can never drift. Same left-associative IEEE order
    everywhere (the oracle contract)."""
    toks = tokens_col(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_tok = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, stop))
    alnum_sp = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    punct_ratio = (F.length(text_col) - F.length(alnum_sp)) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    return (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(n_stop / F.lit(5.0), F.lit(1.0))
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality stats: token/char counts, punctuation ratio,
    stopword ratio, mean token length, and a composite quality score.
    All closed-form column expressions over the token array."""
    toks = tokens_col(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_tok = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, stop))  # distinct-hit count
    alnum_sp = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    # greatest(len,1): empty text must score punct_ratio 0, not crash
    # (ANSI Spark throws on x/0) or NULL-diverge from the oracle
    punct_ratio = (F.length(text_col) - F.length(alnum_sp)) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    mean_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    quality = composite_quality_col(text_col)
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        F.length(text_col).cast("int").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        (n_stop / F.greatest(n_tok, F.lit(1))).alias("stop_ratio"),
        mean_tok_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


#: literal model weights for :func:`quality_classifier` — stands in for
#: an offline-trained quality regressor (CCNet / FineWeb-Edu style);
#: swap in real coefficients without touching the plan.
QUALITY_LR = {
    "intercept": -3.0,
    "w_len": 3.0,       # x least(n_tokens/100, 1)
    "w_punct": -4.0,    # x punct_ratio
    "w_stop": 6.0,      # x stop_ratio
    "w_tok_len": 0.25,  # x mean_token_len
}


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All input columns + ``(quality_logit, quality_prob, keep)`` —
    the keep-everything variant :func:`quality_classifier` and the
    streaming ingest gate (`streaming.sessionize.streaming_quality_gate`)
    both build on. The feature expressions are the SAME ones
    :func:`text_stats` projects (inlined rather than joined back — a
    self-join would be a shuffle; re-deriving costs nothing and keeps
    the plan a single narrow projection, which is also the only
    stateless shape a streaming frame accepts)."""
    w = QUALITY_LR
    toks = tokens_col(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_tok = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, stop))
    alnum_sp = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    # greatest(len,1): empty text must score punct_ratio 0, not crash
    # (ANSI Spark throws on x/0) or NULL-diverge from the oracle
    punct_ratio = (F.length(text_col) - F.length(alnum_sp)) / F.greatest(
        F.length(text_col), F.lit(1)
    )
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    mean_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    z = (
        F.lit(w["intercept"])
        + F.lit(w["w_len"])
        * F.least(n_tok.cast("int") / F.lit(100.0), F.lit(1.0))
        + F.lit(w["w_punct"]) * punct_ratio
        + F.lit(w["w_stop"]) * stop_ratio
        + F.lit(w["w_tok_len"]) * mean_tok_len
    )
    return docs.select(
        "*",
        z.alias("quality_logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_prob"),
        # NULL logit (NULL text only — the greatest(length, 1) guard
        # makes the empty-text x/0 path impossible) must
        # REJECT, not NULL-propagate: matches the oracle's CASE (NULL
        # -> 0) and keeps the streaming gate's keep==1 filter from
        # silently passing unscored docs through as neither kept nor
        # visible-rejected
        F.when(z >= 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


def quality_classifier(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model-based quality filter: a logistic regression over the
    :func:`text_stats` features with LITERAL weights — the shape of the
    fastText / linear quality classifiers every production curation
    pipeline runs (CCNet, FineWeb-Edu): featurize -> w.x + b -> sigmoid
    -> threshold. The weights live driver-side as plan literals, so the
    scoring pass is a pure narrow projection — the 100 TB corpus pays
    one scan, zero shuffles, and the filter pushes into the same stage
    as the parquet read.

    The keep decision thresholds the LOGIT at 0 (== prob >= 0.5):
    exact IEEE arithmetic both engines replay bit-identically, keeping
    the decision out of transcendental-function territory (the reported
    sigmoid probability is display-only).

    Returns ``(doc_id, quality_logit, quality_prob, keep)``.
    """
    return quality_scores(docs, text_col).select(
        "doc_id", "quality_logit", "quality_prob", "keep"
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free stopword-vote language ID: count token hits per
    language wordlist; predict the argmax with a fixed priority order
    (en > de > fr > es > und) for deterministic ties."""
    tok = tokenize(docs, text_col)
    aggs = [
        F.sum(F.col("token").isin(*LANG_STOPWORDS[lang]).cast("long")).alias(
            f"n_{lang}"
        )
        for lang in LANG_STOPWORDS
    ]
    counts = tok.groupBy("doc_id").agg(*aggs)
    best = F.greatest(*[F.col(f"n_{lang}") for lang in LANG_STOPWORDS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_STOPWORDS:  # dict order = priority order
        pred = pred.when(F.col(f"n_{lang}") == best, F.lit(lang))
    return counts.select(
        "doc_id", *[f"n_{lang}" for lang in LANG_STOPWORDS], pred.alias("lang_pred")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (a set-hash; near-dup-stable under reordering)."""
    toks = tokens_col(F.col(text_col))
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return docs.select(
        "doc_id", F.md5(canon.cast("binary")).alias("fingerprint")
    )


def exact_dedup(docs: DataFrame, key_col: str = "text") -> DataFrame:
    """E1: exact duplicate groups — hash-groupBy on the content key,
    keep the smallest doc_id as the canonical representative."""
    return docs.groupBy(key_col).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    ).select("keep_id", "n_copies")


#: linear hash family h_i(x) = (A[i]*x + B[i]) mod M over the 48-bit
#: base hash x. A[i] < 2^14 keeps A*x < 2^62 (no int64 overflow in
#: either engine); M is the Mersenne prime 2^61-1.
MINHASH_A = (12289, 12553, 13007, 13457, 14081, 14683, 15013, 15727)
MINHASH_B = (7919, 17389, 27449, 37813, 48611, 59359, 70657, 81799)
MINHASH_M = (1 << 61) - 1


def minhash_base(col: Column) -> Column:
    """The shared 48-bit base hash: md5(shingle) -> first 12 hex chars
    as int. Must stay in lockstep with the oracle idiom
    ``('0x' || substr(md5(shingle), 1, 12))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 12), 16, 10).cast("long")


def xxhash_base(col: Column) -> Column:
    """The PRODUCTION 48-bit base hash: ``xxhash64`` masked to 48 bits
    — no hex-string materialization, JVM-native, measured ~3× cheaper
    than the md5 path on the map side. Same contract as
    :func:`minhash_base` (uniform, in [0, 2^48) so the linear family's
    ``A*x`` stays under 2^62), so it drops into every hash consumer —
    but it is NOT oracle-reproducible (DuckDB has no xxhash64), which
    is why every DECLARED query keeps the md5 base and this hook is the
    documented 100 TB swap (``fast_hash=True`` on the minhash builders,
    ``hash_fn=xxhash_base`` on the sketch builders).

    NULL contract matches :func:`minhash_base` (NULL in → NULL out):
    Spark's raw ``xxhash64`` would return the SEED (42) for NULL —
    every NULL item would become a phantom real item, and in HLL a
    hash of 42 pins register 42 at the maximum rank — so NULLs are
    masked back out here and fall out of the aggregates exactly like
    the md5 path."""
    return F.when(
        col.isNotNull(), F.xxhash64(col).bitwiseAND(F.lit((1 << 48) - 1))
    )


#: SQL-fragment twins of the two base hashes for the row-local string
#: pipeline (minhash_bands_rowlocal embeds the hash in a transform()
#: lambda, where a Column callable cannot reach). The xxhash fragment
#: carries no NULL mask: it is applied only to shingle-array elements,
#: which are never NULL (unlike the Column hook, which must guard —
#: see xxhash_base)
MD5_BASE_SQL = (
    "CAST(conv(substring(md5(CAST({s} AS BINARY)), 1, 12), 16, 10) AS BIGINT)"
)
XXHASH_BASE_SQL = f"(xxhash64({{s}}) & {(1 << 48) - 1}L)"


def minhash_member(i: int, x: Column) -> Column:
    """Member i of the linear hash family ``(A[i]*x + B[i]) mod M``
    over the 48-bit base hash (A[i] < 2^14 keeps A*x < 2^62 — no int64
    overflow in either engine)."""
    return (F.lit(MINHASH_A[i]) * x + F.lit(MINHASH_B[i])) % F.lit(MINHASH_M)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    fast_hash: bool = False,
) -> DataFrame:
    """E2: MinHash signatures, banded for LSH.

    Each shingle is hashed ONCE (md5 → first 48 bits as int); the
    ``n_hashes`` permutation proxies are a linear hash family
    ``(A[i]*x + B[i]) mod M`` over that base hash — 8x fewer digest
    computations than seeded-md5-per-function, same exactness in the
    DuckDB oracle. Bands concatenate ``band_size`` adjacent minhashes;
    candidate pairs collide on (band_id, band_sig) — the equi-join that
    makes near-dup scale.
    """
    sh = shingles(docs, text_col, n=shingle_n)
    base = xxhash_base if fast_hash else minhash_base
    sh = sh.withColumn("__x", base(F.col("shingle")))
    aggs = [
        F.min(minhash_member(i, F.col("__x"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return _explode_bands(sig, n_hashes, band_size)


def _explode_bands(
    sig: DataFrame,
    n_hashes: int,
    band_size: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared banding tail: a frame with ``doc_id, h0..h{n-1}`` minhash
    columns → one ``(doc_id, band_id, band_sig)`` row per band. The ONE
    copy of the band concat idiom, so the batch and row-local signature
    builders emit byte-identical band keys. ``carry_cols`` rides extra
    doc attributes through the explode (the :func:`shingles` device,
    r13): consumers that need an attribute per pair endpoint avoid a
    join back onto the corpus."""
    n_bands = n_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "_", *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", *carry_cols, F.explode(bands).alias("b")).select(
        "doc_id", *carry_cols,
        F.col("b.band_id").alias("band_id"), F.col("b.band_sig").alias("band_sig")
    )


def minhash_candidate_pairs(
    signatures: DataFrame,
    max_bucket_size: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """LSH bucket self-join: docs sharing any band signature are
    candidate near-dups. Equi-join on (band_id, band_sig) — shuffle is
    on the bucket key, never all-pairs.

    ``max_bucket_size`` is the skew backstop (the
    :func:`similarity.bucket_near_dup_pairs` device, r13): a band
    bucket of size s emits s²/2 pairs, so one boilerplate-heavy
    signature (a template page crawled a million times) turns the
    bucket join quadratic no matter how the bands were sized. With a
    cap, any bucket over it is salted into ``ceil(size/cap)``
    deterministic sub-buckets (``xxhash64(doc_id) mod nsub`` — stable
    across runs and reshards) and pairs form within (bucket, sub)
    only, bounding the per-task quadratic term by ~cap²/2. Cross-sub
    pairs inside an oversized bucket are forgone — recall degrades
    gracefully (a true near-dup cluster that large still yields
    within-sub pairs for the component step to union), emitted pairs
    stay exact. The hot-bucket list is one aggregate filtered to
    ``count > cap`` (tiny by construction — at most n/cap rows);
    joined back un-hinted so AQE broadcasts it when it is. Default
    ``None`` keeps the exact all-bucket-pairs semantics and every
    oracle row unchanged; the sf10 decade probe prices the uncapped
    form (docs/PLANS.md r13 split-leakage attribution)."""
    keys = ["band_id", "band_sig"]
    # r14 (VERDICT r13 Next #1): the r13 pinned
    # ``repartition(band_id, band_sig)`` emitted REPARTITION_BY_COL
    # exchanges, which AQE's OptimizeSkewedJoin will NOT split — the
    # one join in the engine with a known hot-key mode (a boilerplate
    # band bucket) lost its runtime skew backstop, and the driver's
    # 32-core run measured it slower (1.36 -> 1.77 s) while 8-core and
    # builder hosts disagreed. Replaced with a ``shuffle_merge`` hint
    # on the self-join (below): EnsureRequirements inserts
    # ENSURE_REQUIREMENTS exchanges on both sides — canonically
    # identical, so the shuffle (and the banding above it) materializes
    # once and the second side reads it as a reused stage — and the
    # sort-merge join stays AQE-skew-splittable. The hint only forbids
    # the broadcast the local planner would pick for a small side
    # (which re-computed the banding per side AND put every hot-bucket
    # probe row through one task's hash lookup with no split).
    # Interleaved A/B at sf0.1 (tools/minhash_ab.py): pin 1.135 /
    # bare-broadcast 1.083 / merge 0.945 s best-of-7; pair sets
    # identical (exceptAll both ways = 0).
    sigs = signatures
    if max_bucket_size is not None:
        cap = int(max_bucket_size)
        # hot-list aggregate is tiny by construction (<= n/cap rows);
        # its re-attach join is left un-hinted so AQE broadcasts it
        hot = (
            sigs.groupBy("band_id", "band_sig")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") > cap)
        )
        sigs = (
            sigs.join(hot, keys, "left")
            .withColumn(
                "__sub",
                F.when(
                    F.col("__cnt").isNull(), F.lit(0)
                ).otherwise(
                    F.pmod(
                        F.xxhash64("doc_id"),
                        F.ceil(F.col("__cnt") / F.lit(cap)).cast("long"),
                    )
                ).cast("int"),
            )
            .drop("__cnt")
        )
        keys = keys + ["__sub"]
    # carry_cols (r13): per-endpoint doc attributes ride the bucket
    # join as ``<c>_a`` / ``<c>_b`` — consumers that roll pairs up by
    # an endpoint attribute (q_source_dedup_matrix, dedup_report's
    # source matrix) skip the two joins back onto the corpus. The
    # distinct stays keyed by the pair: the carried values are
    # functions of the endpoint ids, so distinct over the widened row
    # equals distinct over (doc_a, doc_b).
    ca = [F.col(c).alias(f"{c}_a") for c in carry_cols]
    cb = [F.col(c).alias(f"{c}_b") for c in carry_cols]
    out = (
        ["doc_a", "doc_b"]
        + [f"{c}_a" for c in carry_cols]
        + [f"{c}_b" for c in carry_cols]
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"), *ca, *keys)
    b = sigs.select(F.col("doc_id").alias("doc_b"), *cb, *keys).hint(
        "shuffle_merge"
    )
    return (
        a.join(b, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(*out)
        .distinct()
    )


def minhash_bands_rowlocal(
    docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    fast_hash: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Zero-shuffle variant of :func:`minhash_signatures`: the whole
    shingle → base-hash → linear-family-min → band chain runs as
    row-local array expressions (``transform`` + ``array_min``), so a
    doc's banded signature exists on the SAME row as the doc — no
    explode-then-groupBy exchange.

    Bit-identical to the grouped path by construction: ``min`` over the
    exploded shingle rows equals ``array_min`` over the shingle array
    (duplicate shingles are idempotent under min; every op is exact
    int64 — A[i] < 2^14 keeps A*x < 2^62). Pinned by a differential
    test against :func:`minhash_signatures`.

    This is the signature builder a STREAM can use: per-row means no
    stateful aggregation, so it composes with stream-static joins
    (see :func:`streaming.sessionize.streaming_lsh_dedup`). Docs with
    fewer than ``shingle_n`` tokens have no signature and are dropped,
    matching the grouped path (their groupBy had zero rows).

    Output schema matches :func:`minhash_signatures`:
    ``(doc_id, band_id, band_sig)``, one row per band per doc.
    """
    toks = tokens_col(F.col(text_col))
    # per-shingle 48-bit base hash computed ONCE into __xs (the md5 is
    # the expensive op; each family member is then a cheap linear pass
    # over __xs). The agg over an ARRAY of the h-structs — rather than
    # 8 top-level column aliases referencing __xs — keeps Catalyst's
    # CollapseProject from inlining the md5 transform 8x (lambda
    # expressions are excluded from codegen subexpression elimination,
    # so an 8x inline would really digest every shingle 8 times).
    base_sql = (XXHASH_BASE_SQL if fast_hash else MD5_BASE_SQL).format(s="s")
    xs = (
        f"transform({shingle_array_sql('__toks', shingle_n)}, s -> "
        f"{base_sql})"
    )
    mins = [
        F.expr(
            f"array_min(transform(__xs, x -> "
            f"(x * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {MINHASH_M}L))"
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = (
        docs.withColumn("__toks", toks)
        # the emptiness filter reads __toks, NOT __xs: a size(__xs)
        # predicate would inline the md5 transform into the Filter and
        # digest every shingle a second time just to test emptiness
        .filter(F.size("__toks") >= shingle_n)
        .withColumn("__xs", F.expr(xs))
        .select("doc_id", *carry_cols, *mins)
    )
    return _explode_bands(sig, n_hashes, band_size, carry_cols)


HEX = "0123456789abcdef"


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 64,
    fast_hash: bool = False,
) -> DataFrame:
    """Width-parameterized SimHash over the token multiset (Charikar
    STOC'02 as deployed by Manku, Jain & Das Sarma WWW'07, which
    specifies 64-bit fingerprints — the production default here).

    Per token, a ``width``-bit hash supplies the bit votes: each bit
    position accumulates +1/-1 across tokens, and the sign vector is
    packed into one int64 fingerprint per document. The whole operator
    is ONE hash aggregate keyed by doc_id carrying ``width`` integer
    SUM slots — no per-bit explode (a width× row blowup), no second
    aggregate level, map-side combinable, so state per doc is
    ``width`` longs regardless of corpus size.

    Hash source: ``fast_hash=False`` (default) folds the leading
    ``width/4`` md5 hex nibbles into a big-endian integer — at
    ``width=16`` this is bit-for-bit the DuckDB-oracle fingerprint
    (see :func:`simhash16`); ``fast_hash=True`` takes the top bits of
    ``xxhash64`` (measured ~2.8× cheaper on the map side, same
    contract, no cross-engine oracle).

    Docs with no tokens (NULL/empty text) produce no row, matching the
    grouped MinHash builders.
    """
    assert 4 <= width <= 64 and width % 4 == 0, "width: multiple of 4, <= 64"
    tok = tokenize(docs, text_col)
    if fast_hash:
        h = F.xxhash64(F.col("token"))
        if width < 64:
            h = F.expr(f"shiftrightunsigned(xxhash64(token), {64 - width})")
    else:
        nib = width // 4
        md5 = F.md5(F.col("token").cast("binary"))
        if nib <= 12:
            # fits a signed long directly (<= 48 bits)
            h = F.conv(F.substring(md5, 1, nib), 16, 10).cast("long")
        else:
            # two-part fold: top (nib-8) nibbles << 32 | last 8 nibbles
            # (conv-to-long is only safe below 2^63, so never convert
            # more than 12 nibbles in one go)
            hi = F.conv(F.substring(md5, 1, nib - 8), 16, 10).cast("long")
            lo = F.conv(F.substring(md5, nib - 7, 8), 16, 10).cast("long")
            h = F.shiftleft(hi, 32).bitwiseOR(lo)
    bits = tok.select("doc_id", h.alias("__h"))
    votes = bits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("__h"), width - j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"__v{j}")
            for j in range(1, width + 1)
        ]
    )

    def _bitval(j: int) -> int:
        v = 1 << (width - j)
        return v - (1 << 64) if v >= (1 << 63) else v  # two's-complement top bit

    fp = F.lit(0).cast("long")
    for j in range(1, width + 1):
        fp = fp.bitwiseOR(
            F.when(F.col(f"__v{j}") >= 0, F.lit(_bitval(j)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", fp.alias("simhash"))


def simhash16(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash — the exact-oracle width (first 4 md5 nibbles
    supply the bit votes; DuckDB reproduces the fingerprint
    bit-for-bit, see ``q_dedup_simhash``). Production uses
    :func:`simhash` at its 64-bit default; this thin wrapper pins the
    cross-engine differential."""
    return simhash(docs, text_col, width=16, fast_hash=False)


def deterministic_sample(
    docs: DataFrame,
    rate: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Reproducible content-keyed sampling: keep a row iff the md5-derived
    uniform of its key falls under ``rate``. Unlike ``df.sample`` (seeded
    per-partition RNG — resampling changes with partitioning/layout),
    the decision is a pure function of the KEY: the same document is
    in/out of the sample across reruns, repartitions, engines and data
    layouts — the property a reproducible training-data pipeline needs.
    Narrow (a filter), trivially pushed to the scan."""
    u = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 48))
    return docs.filter(u < rate)


def stratified_quota(
    docs_with_group: DataFrame,
    quota: int,
    group_col: str = "lang_pred",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-group quota sampling: keep at most ``quota`` rows per group,
    chosen by the deterministic md5 order of the key (so the selection
    is stable under reruns and layout, like
    :func:`deterministic_sample`).

    Two-phase salted top-k (same pattern as the similarity top-k): a
    single window partitioned by group alone would funnel EVERY row of
    a skewed stratum (think: 90 % of a corpus predicted 'en') through
    one partition. Phase 1 ranks within (group, salt) — corpus-wide
    parallelism, keeps <= quota per salt; phase 2 ranks the surviving
    <= SALTS x quota rows per group. Identical output, no hot
    partition."""
    SALTS = 64
    h = F.md5(F.col(key_col).cast("string"))
    salt = F.pmod(F.hash(F.col(key_col)), F.lit(SALTS))
    w1 = Window.partitionBy(group_col, "__salt").orderBy("__h", key_col)
    w2 = Window.partitionBy(group_col).orderBy("__h", key_col)
    return (
        docs_with_group.withColumn("__h", h)
        .withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= quota)
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= quota)
        .drop("__h", "__salt", "__r1", "__rk")
    )


def connected_components_bounded(
    edges: DataFrame,
    iters: int = 3,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    truncate: bool = False,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components of the
    near-dup pair graph by ``iters`` rounds of min-label propagation —
    the step that turns pairwise near-dup hits into dedup groups (keep
    min doc per component, drop the rest).

    Each round: label(v) <- min(label(v), min over neighbors label(u)).
    Labels converge to the component's min id once ``iters`` >= the
    component diameter; LSH-derived components are band-bucket cliques
    glued at shared docs, so small fixed ``iters`` suffices. The fixed
    unroll is deliberate: the DuckDB oracle replays the SAME rounds, so
    the differential gate is bit-exact even pre-convergence. For
    general graphs with unknown diameter use
    ``operators.spatial.connected_components`` — the converged variant
    (pointer doubling, convergence detection, lineage truncation).

    Pure DataFrame ops: the symmetric edge list is shuffled on the
    vertex key once per round (join + min-aggregate). No driver-side
    state; the label frontier is O(vertices).

    ``truncate=True`` (r13 optimization, guide §3.3/§5 "materialise an
    intermediate to truncate the plan") localCheckpoints the symmetric
    edge list: the lazy form re-embeds the edge subtree — and with it
    the whole upstream banding/pair pipeline — once per round per join
    side, growing one plan to 84 Exchange nodes / 60 parquet scans for
    the standalone component rows, most of a 6 s wall at sf0.1 going
    to Catalyst/AQE bookkeeping rather than data. With the edges
    materialized, the rounds stay lazy: the label tables are tiny and
    exchange reuse dedupes their repeated subtrees (measured
    interleaved in one JVM at sf0.1: lazy 5.5 s, sym-ckpt 3.3 s,
    sym+per-round-label ckpts 4.2 s — per-round truncation costs more
    in materialization jobs than it saves). EAGER when set — building
    the returned frame runs the edge-materialization job; results are
    bit-identical (same rounds, same integer min-label algebra)."""
    from mhw3d_detection_spark.plans.audit_hook import ckpt

    sym = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionByName(edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
    if truncate:
        sym = ckpt(sym, "cc/sym")
    labels = (
        sym.select("v")
        .distinct()
        .withColumn("label", F.col("v"))
    )
    for _ in range(iters):
        # labels derives from sym -> alias both sides of the self-join
        via_nb = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.u") == F.col("l.v"), "inner")
            .select(F.col("e.v").alias("v"), F.col("l.label").alias("label"))
        )
        labels = (
            labels.unionByName(via_nb)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        )
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component"))


def _dsir_doc_bucket_counts(
    docs: DataFrame, n_buckets: int, text_col: str
) -> DataFrame:
    """(doc_id, source, bucket, n) hashed-unigram profile — the one
    corpus-sized aggregate the DSIR family shares."""
    return (
        docs.select(
            "doc_id",
            "source",
            F.explode(tokens_col(F.col(text_col))).alias("token"),
        )
        .withColumn(
            "bucket", F.pmod(minhash_base(F.col("token")), F.lit(int(n_buckets)))
        )
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_ratios(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    _per: DataFrame | None = None,
) -> DataFrame:
    """The DSIR per-bucket log-ratio table ``(bucket, lr)`` —
    ``n_buckets`` rows, dyadic-quantized (1/2^16): the trained
    artifact the scorer applies. Built once batch-side; ship it to
    the streaming ingest gate via :func:`dsir_log_ratio_list` (the
    collect is a bounded ``n_buckets``-row seam, like the BM25 idf
    dict and the BPE merge list)."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    spark = docs.sparkSession
    B = int(n_buckets)
    a = float(alpha)
    per = (
        _per
        if _per is not None
        else _dsir_doc_bucket_counts(docs, B, text_col)
    )
    tgt = per.filter(target_pred(F.col("source")))
    tc = tgt.groupBy("bucket").agg(F.sum("n").alias("tc"))
    rc = per.groupBy("bucket").agg(F.sum("n").alias("rc"))
    tot = tgt.agg(F.sum("n").alias("nt")).crossJoin(
        per.agg(F.sum("n").alias("nr"))
    )
    spine = spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    return (
        spine.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            dyadic_quantize(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(a))
                    / (F.col("nt") + F.lit(a * B))
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0)) + F.lit(a))
                    / (F.col("nr") + F.lit(a * B))
                ),
                16,
            ).alias("lr"),
        )
    )


def dsir_log_ratio_list(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
) -> list[float]:
    """Collect the log-ratio table as a dense bucket-indexed Python
    list (the literal form the row-local streaming gate embeds)."""
    lr = dsir_log_ratios(
        docs, target_pred, n_buckets=n_buckets, alpha=alpha, text_col=text_col
    )
    out = [0.0] * int(n_buckets)
    for r in lr.collect():
        if r["lr"] is None:
            # an empty target slice makes the nt total NULL, which
            # NULLs every log-ratio — fail HERE with the cause, not
            # later in the streaming gate with an unrelated TypeError
            raise ValueError(
                "dsir_log_ratio_list: a corpus total is NULL — either "
                "target_pred selects no documents (empty target slice) "
                "or the whole pool has no tokens; the DSIR log-ratio "
                "table needs a non-empty target inside a non-empty pool"
            )
        out[r["bucket"]] = r["lr"]
    return out


def dsir_weights(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 256,
    alpha: float = 1.0,
    top_m: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every pool document by how much its
    hashed-unigram profile looks like a TARGET corpus (the
    high-quality slice you want more of) relative to the raw pool, and
    select the top-scoring docs. The importance weight is

        log w(doc) = Σ_buckets n_doc[b] * (ln p̂_target[b] - ln p̂_raw[b])

    with add-``alpha`` smoothed bucket estimates over ``n_buckets``
    md5-hashed token buckets (hashing = no vocabulary build, no OOV —
    the same property as :func:`feature_hash_vectors`).
    ``target_pred`` is a Column predicate over the ``source`` column
    selecting the target slice (the raw distribution is the WHOLE
    pool, target included — the paper's formulation).

    Returns one row per doc: ``(doc_id, source, n_tokens, dsir_weight,
    selected)`` — ``selected`` marks the global ``top_m`` by weight
    (ties to the smaller doc_id).

    Exactness: the per-bucket log-ratio is DYADIC-quantized (1/2^16
    grid — ln is not exactly-rounded across libms; the quantizer's
    nudge absorbs that ulp noise), so every per-doc weight is an exact
    dyadic Σ integer×dyadic — association-free, hashable as a RAW
    double, and the top-m rank is bit-stable.

    Plan at 100 TB: one (doc, bucket) hash aggregate over the token
    stream (the only corpus-sized shuffle), a ``n_buckets``-row
    log-ratio table built from two bucket aggregates + the 1-row
    totals (broadcast), a per-doc aggregate, and a TakeOrdered top-m
    broadcast back as the selection flag. The raw corpus never joins
    anything bigger than ``n_buckets`` rows. Both broadcasts here are
    PARAMETER-bounded, not corpus-bounded: the log-ratio table is
    exactly ``n_buckets`` rows and the selection flag exactly
    ``top_m`` rows — callers selecting a corpus-scale fraction should
    pass a quantile-threshold filter instead of a huge ``top_m``."""
    per = _dsir_doc_bucket_counts(docs, n_buckets, text_col)
    lr = dsir_log_ratios(
        docs, target_pred, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, _per=per,
    )
    agg = (
        per.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.col("n") * F.col("lr")).alias("dsir_weight"),
        )
    )
    # LEFT join from the full doc domain: a zero-token doc carries no
    # evidence and scores exactly 0.0 (the streaming gate's empty-fold
    # value — the two surfaces must agree on the ROW DOMAIN, not just
    # on scored docs), instead of silently vanishing from the pool
    scored = docs.select("doc_id", "source").join(agg, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("dsir_weight"), F.lit(0.0)).alias("dsir_weight"),
    )
    top = (
        scored.orderBy(F.desc("dsir_weight"), F.col("doc_id"))
        .limit(int(top_m))
        .select("doc_id", F.lit(1).alias("__sel"))
    )
    return scored.join(F.broadcast(top), "doc_id", "left").select(
        "doc_id",
        "source",
        "n_tokens",
        "dsir_weight",
        F.coalesce(F.col("__sel"), F.lit(0)).cast("int").alias("selected"),
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    iters: int = 3,
    id_col: str = "doc_id",
    broadcast_verdict: bool = True,
    truncate: bool = False,
) -> DataFrame:
    """Quality-representative near-dup removal — the production policy
    the min-id convention approximates: within every duplicate
    component keep the HIGHEST-QUALITY member (composite
    ``text_stats.quality_score``), not the arbitrary smallest id. What
    curation pipelines actually ship: of N near-identical crawls of a
    page, keep the cleanest extraction.

    Returns one row per input doc:
    ``(doc_id, component, quality, kept)`` — ``component`` is the dup
    group's min-label (own id for docs in no pair), ``quality`` the
    rq4-quantized score, ``kept`` 1 for the survivor (every singleton;
    per component the max quality, ties to the smaller doc_id).

    Determinism/exactness: labels are integers (min-propagation),
    quality compares on the rq4 grid (both engines produce identical
    rq4 bits — base.py contract), so the arg-max is bit-stable. Plan:
    the component table is pairs-vertices-sized; it joins the
    quality projection on doc_id, one window per component (dup
    groups are clique-sized — no skew), then joins back onto the
    corpus; the corpus itself never shuffles.

    ``broadcast_verdict`` gates the final join hint: the verdict table
    is pairs-VERTICES-sized, which on a high-dup crawl is
    corpus-sized — the same regime that motivated
    ``semantic_dedup``'s ``broadcast_drops``. True (default, right
    when dup pairs are a small fraction) broadcasts it onto the
    corpus join; False leaves a plain shuffled left join and lets AQE
    pick the strategy from the measured size."""
    from mhw3d_detection_spark.queries.base import rq

    comp = connected_components_bounded(pairs, iters=iters, truncate=truncate)
    q = text_stats(docs).select(
        F.col("doc_id").alias(id_col), rq("quality_score", 4).alias("quality")
    )
    member = comp.withColumnRenamed("doc_id", id_col).join(q, id_col)
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.col(id_col)
    )
    ranked = member.withColumn("__r", F.row_number().over(w)).select(
        id_col,
        "component",
        (F.col("__r") == 1).cast("int").alias("__keep"),
    )
    verdict = F.broadcast(ranked) if broadcast_verdict else ranked
    return q.join(verdict, id_col, "left").select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        "quality",
        F.coalesce(F.col("__keep"), F.lit(1)).cast("int").alias("kept"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    probe_pred: Column,
    text_col: str = "text",
    shingle_n: int = 3,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """Exact n-gram-set Jaccard between a probe subset and the corpus:
    |A ∩ B| via an equi-join on shingle, |A ∪ B| = |A| + |B| − |A ∩ B|.
    The probe predicate bounds the candidate set (at full scale this
    runs AFTER MinHash banding has pruned the pairs)."""
    # r13: |A| and |B| ride the shingle rows (with_size carry) and are
    # recovered exactly by max() in the pair aggregate — the two joins
    # back to a per-doc size table (each a pair-table shuffle plus a
    # full corpus re-tokenization) are gone; the carry costs 8 bytes a
    # shingle row on the one equi-join exchange (guide §2.3 "shuffle
    # keys and metadata", §8).
    sh = distinct_shingles(docs, text_col, n=shingle_n, with_size=True)
    probes = sh.filter(probe_pred(F.col("doc_id")))
    inter = (
        probes.select(
            F.col("doc_id").alias("doc_a"),
            F.col("sz").alias("sz_a"),
            "shingle",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sz").alias("sz_b"),
                "shingle",
            ),
            "shingle",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sz_a").alias("sz_a"),
            F.max("sz_b").alias("sz_b"),
        )
    )
    j = inter.withColumn(
        "jaccard",
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
    ).filter(F.col("jaccard") >= min_jaccard)
    return j.select("doc_a", "doc_b", "jaccard")


def ngram_repetition(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1, "repetitious text" filters): the fraction of the document's
    2-gram OCCURRENCES taken by its most frequent word 2-gram
    (``top_2gram_frac``) and the fraction of word-3-gram occurrences
    whose gram appears more than once (``dup_3gram_frac``). High
    values flag boilerplate / degenerate generations. Note: Gopher's
    paper definition is a CHARACTER-coverage fraction; this operator
    uses the occurrence-count proxy (same signal shape, cheaper — no
    per-gram character weighting), and its oracle matches that choice.

    Plan: both gram sizes share ONE explode + hash-aggregate chain —
    the 2- and 3-gram streams are unioned with a size tag, counted per
    ``(doc, n, gram)``, then collapsed per doc. Keyed by ``doc_id``
    throughout, so parallelism is per-document at any corpus size; no
    windows, no joins except the left join back to ``docs`` that keeps
    sub-2-token documents in the output with zero fractions."""
    toks = tokens_col(F.col(text_col))

    def grams(n: int) -> Column:
        # CASE guard: Spark's sequence(1, 0) is descending [1, 0], so
        # sub-n-token docs must short-circuit to an empty array.
        return F.expr(
            f"case when size(__toks) >= {n} then "
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__toks, i, {n}))) "
            f"else array() end"
        )

    base = docs.withColumn("__toks", toks)
    g = base.select(
        "doc_id", F.lit(2).alias("n"), F.explode(grams(2)).alias("gram")
    ).unionByName(
        base.select(
            "doc_id", F.lit(3).alias("n"), F.explode(grams(3)).alias("gram")
        )
    )
    per_gram = g.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    two = F.col("n") == 2
    three = F.col("n") == 3
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max(F.when(two, F.col("c"))).alias("__max2"),
        F.sum(F.when(two, F.col("c"))).alias("__tot2"),
        F.sum(F.when(three & (F.col("c") > 1), F.col("c"))).alias("__dup3"),
        F.sum(F.when(three, F.col("c"))).alias("__tot3"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("__max2"), F.lit(0))
                / F.greatest(F.coalesce(F.col("__tot2"), F.lit(0)), F.lit(1))
            ).alias("top_2gram_frac"),
            (
                F.coalesce(F.col("__dup3"), F.lit(0))
                / F.greatest(F.coalesce(F.col("__tot3"), F.lit(0)), F.lit(1))
            ).alias("dup_3gram_frac"),
        )
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 8.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1) as a pure map — one
    boolean flag per rule plus the conjunction. Every signal is a
    closed-form array expression over the token array (no explode, no
    shuffle): token-count bounds, mean-token-length bounds, fraction of
    tokens containing an alphabetic character, and a minimum number of
    distinct stopword hits. The whole operator is narrow, so it pushes
    to the scan and costs one pass at any scale."""
    toks = tokens_col(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_tok = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ) / F.greatest(n_tok, F.lit(1))
    n_stop = F.size(F.array_intersect(toks, stop))
    f_len = (n_tok >= min_tokens) & (n_tok <= max_tokens)
    f_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    f_alpha = alpha_frac >= min_alpha_frac
    f_stop = n_stop >= min_stop_hits
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.cast("int").alias("n_stop_hits"),
        f_len.cast("int").alias("flag_len"),
        f_mean.cast("int").alias("flag_mean_len"),
        f_alpha.cast("int").alias("flag_alpha"),
        f_stop.cast("int").alias("flag_stop"),
        (f_len & f_mean & f_alpha & f_stop).cast("int").alias("pass_gopher"),
    )


def pii_mask(
    df: DataFrame,
    col: str,
    key_col: str,
    pattern: str = "[0-9]+",
    replacement: str = "<NUM>",
) -> DataFrame:
    """PII scrubbing as a narrow projection: replace every match of
    ``pattern`` (digit runs by default — account numbers, phone
    fragments, numeric ids) with a typed placeholder token, and emit
    the match count so downstream filters can drop high-PII rows.
    Swap the pattern for email/SSN/credit-card regexes in production;
    the plan (pure map over the scan, zero shuffles) is unchanged."""
    c = F.col(col)
    return df.select(
        F.col(key_col),
        F.regexp_replace(c, pattern, replacement).alias(f"{col}_masked"),
        F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
        .cast("int")
        .alias("n_pii"),
    )


def vocab_oov(
    docs: DataFrame, text_col: str = "text", vocab_size: int = 20
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the tokenizer-coverage signal
    a training pipeline computes before committing to a vocab.

    The vocabulary is ``orderBy(tf desc, token).limit(k)`` — planned as
    TakeOrderedAndProject (per-partition top-k + driver merge of k-row
    heads, never a single-partition global sort) and broadcast to the
    per-token probe join. Ties at the frequency cut break on the token
    string, so the vocab is deterministic across engines."""
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).cast("int").alias("n_oov"),
        )
        .withColumn(
            "oov_frac",
            F.col("n_oov") / F.greatest(F.col("n_tokens"), F.lit(1)),
        )
    )


def chunk_tokens(
    docs: DataFrame,
    text_col: str = "text",
    size: int = 32,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence chunking for training-data prep: split each document's
    token stream into fixed-``size`` windows (the pre-packing step of
    an LLM data pipeline). One row per (doc, chunk) with the chunk's
    token count and a content hash for downstream chunk-level dedup.

    Pure array arithmetic — ``sequence`` over the chunk indices +
    ``slice`` — exploded row-locally: narrow until the explode, no
    shuffle at all, so it streams at scan speed at any corpus size."""
    n = F.size(F.col("__toks"))
    chunks = F.expr(
        f"transform(sequence(0, cast(floor((size(__toks) - 1) / {size}) as int)), "
        f"i -> slice(__toks, i * {size} + 1, {size}))"
    )
    carry = list(carry_cols)
    return (
        docs.withColumn("__toks", tokens_col(F.col(text_col)))
        .filter(n > 0)
        .select(
            "doc_id", *carry, F.posexplode(chunks).alias("chunk_idx", "__chunk")
        )
        .select(
            "doc_id",
            *carry,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("__chunk").cast("int").alias("n_chunk_tokens"),
            F.md5(F.array_join(F.col("__chunk"), " ").cast("binary")).alias(
                "chunk_hash"
            ),
        )
    )


def temperature_sample(
    docs: DataFrame, group_col: str = "lang", alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-corpus
    rebalancing rule, Conneau & Lample 2019 §3.1): sample group ``g``
    with probability proportional to ``n_g ** alpha``, flattening a
    skewed source/language mix toward uniform as ``alpha -> 0``. The
    per-group keep rate is ``(min_n / n_g) ** (1 - alpha)`` — the
    smallest group is kept whole, larger groups are down-sampled.

    Selection is content-keyed (md5 uniform of ``doc_id``, same as
    :func:`deterministic_sample`) so the sample is reproducible across
    reruns, layouts and engines. Plan: one hash-aggregate for the group
    counts (a tiny dim), broadcast back, narrow filter."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        group_col,
        F.pow(F.col("__min_n") / F.col("__n"), F.lit(1.0 - alpha)).alias(
            "keep_rate"
        ),
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("double") / F.lit(float(1 << 48))
    return (
        docs.join(F.broadcast(rates), group_col)
        .filter(u < F.col("keep_rate"))
    )


def contamination_screen(
    docs: DataFrame,
    probe_pred,
    text_col: str = "text",
    shingle_n: int = 3,
    min_containment: float = 0.05,
) -> DataFrame:
    """Benchmark-contamination screening: for each probe document (the
    eval-set side), the fraction of ITS shingle set contained in each
    corpus document — the asymmetric containment ``|A ∩ B| / |A|``
    (Broder 1997's containment, the right measure when the probe is
    much shorter than the training doc; Jaccard under-scores those
    pairs). The standard decontamination step of an LLM data pipeline:
    drop or flag training docs whose containment of any eval probe is
    high.

    Plan shape: the probe side is a filtered (tiny) subset of the
    shingle explode — at production scale broadcast it; the corpus side
    stays the full explode; one equi-join on shingle + one aggregate
    per (probe, doc) pair. No all-pairs product anywhere."""
    # r13: probe |A| rides the probe shingle rows (with_size carry,
    # recovered exactly by max() in the pair aggregate) — the broadcast
    # join back to a probe-size table (one probe re-tokenize + one
    # broadcast exchange) is gone; the corpus side selects only
    # (doc_id, shingle) so its sz is pruned before the exchange
    # (guide §2.3, §8). sz=0 probes stay inert: no exploded rows,
    # exactly as the old inner join dropped them.
    sh = distinct_shingles(docs, text_col, n=shingle_n, with_size=True)
    probes = sh.filter(probe_pred(F.col("doc_id"))).select(
        F.col("doc_id").alias("probe_id"),
        F.col("sz").alias("__psz"),
        "shingle",
    )
    inter = (
        probes.join(sh.select("doc_id", "shingle"), "shingle")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("__inter"),
            F.max("__psz").alias("__psz"),
        )
    )
    return (
        inter.withColumn("containment", F.col("__inter") / F.col("__psz"))
        .filter(F.col("containment") >= min_containment)
        .select("probe_id", "doc_id", "containment")
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    chunk_size: int = 32,
    target_tokens: int = 256,
    group_col: str = "source",
) -> DataFrame:
    """Greedy in-order sequence packing (the pre-training batch-prep
    step): chunk every document, then pack chunks into training
    sequences of ~``target_tokens`` tokens by running a cumulative
    token count in deterministic (doc_id, chunk_idx) order and cutting
    a new sequence each time the count crosses the target. Sequences
    never split a chunk; overshoot is bounded by ``chunk_size - 1``.

    The window partitions by ``group_col`` (source/shard), so packing
    parallelizes across groups — the within-group order IS the
    contract (reproducible packing), not an implementation accident.
    At 100 TB, group by shard/file so each partition's window stays
    bounded."""
    chunks = chunk_tokens(docs, text_col, size=chunk_size, carry_cols=(group_col,))
    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = F.floor(
        F.coalesce(F.sum("n_chunk_tokens").over(w), F.lit(0))
        / F.lit(target_tokens)
    )
    return (
        chunks.withColumn("seq_id", seq.cast("int"))
        .groupBy(group_col, "seq_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("int").alias("n_tokens"),
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
        )
    )


def dup_span_frac(
    docs: DataFrame, text_col: str = "text", span: int = 4
) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the fraction of its token span-grams (length-``span``
    sliding windows) that also occur verbatim in at least one OTHER
    document. High values mark boilerplate carriers / partial copies
    that document-level (MinHash) dedup misses; the production
    counterpart cuts the duplicated spans themselves out of the text.

    Plan: span slicing is row-local array arithmetic (the same slice
    trick as :func:`shingles`); positions collapse to per-(doc, span)
    counts in one hash aggregate; a second aggregate over the span key
    counts how many docs carry each span; that (already span-keyed)
    side joins straight back and a final per-doc aggregate emits the
    fraction. Every shuffle is an equi-key hash exchange — no
    all-pairs product at any corpus size. At 100 TB, group on
    md5(span) to keep shuffle keys fixed-width."""
    per = (
        shingles(docs, text_col, n=span)
        .withColumnRenamed("shingle", "span")
        .groupBy("doc_id", "span")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    carriers = per.groupBy("span").agg(F.count(F.lit(1)).alias("__n_docs"))
    per_doc = (
        per.join(carriers, "span")
        .groupBy("doc_id")
        .agg(
            F.sum("__c").cast("int").alias("n_spans"),
            F.sum(F.when(F.col("__n_docs") > 1, F.col("__c")).otherwise(0))
            .cast("int")
            .alias("n_dup_spans"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            (
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1))
            ).alias("dup_span_frac"),
        )
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Shannon entropy of the unigram token distribution plus
    type-token ratio — the gibberish/degenerate-text detectors a
    curation pipeline runs alongside the Gopher rules (low entropy =
    repetitive spam, entropy near ln(n) with TTR 1 = random noise).

    Closed form from two aggregates: H = ln(n) − Σ c·ln(c) / n over
    the per-(doc, token) counts, so the plan is one explode + two
    doc-keyed hash aggregates — no windows, no joins except the left
    join that keeps zero-token docs in the output with entropy 0."""
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    per = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("__c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("__c").alias("__n"),
        F.sum(F.col("__c") * F.log(F.col("__c"))).alias("__clc"),
        F.count(F.lit(1)).alias("__nd"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__n", F.lit(0)).cast("int").alias("n_tokens"),
            F.coalesce("__nd", F.lit(0)).cast("int").alias("n_distinct"),
            F.coalesce(
                F.log("__n") - F.col("__clc") / F.col("__n"), F.lit(0.0)
            ).alias("entropy"),
            F.coalesce(F.col("__nd") / F.col("__n"), F.lit(0.0)).alias("ttr"),
        )
    )


def length_quantile_band(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> DataFrame:
    """Per-group token-length quantile banding — the length-outlier
    filter of a curation pipeline, computed per language/source so a
    short-form group's normal range isn't judged by a long-form one's.
    Exact linear-interpolation percentiles (numpy ``'linear'`` /
    DuckDB ``quantile_cont`` semantics, same contract as the
    climatology thresholds) per group form a tiny dim (one row per
    group) that broadcasts back; each doc gets its band and an in-band
    flag. At 100 TB swap the exact percentile for
    ``approx_percentile`` — the band edges don't need exactness, and
    the plan is otherwise unchanged (one agg + one broadcast join)."""
    n_tok = F.size(tokens_col(F.col(text_col)))
    d = docs.select(
        "doc_id", F.col(group_col), n_tok.cast("int").alias("n_tokens")
    )
    qs = d.groupBy(group_col).agg(
        F.expr(f"percentile(n_tokens, {q_lo})").alias("len_lo"),
        F.expr(f"percentile(n_tokens, {q_hi})").alias("len_hi"),
    )
    return d.join(F.broadcast(qs), group_col).select(
        "doc_id",
        group_col,
        "n_tokens",
        "len_lo",
        "len_hi",
        (
            (F.col("n_tokens") >= F.col("len_lo"))
            & (F.col("n_tokens") <= F.col("len_hi"))
        )
        .cast("int")
        .alias("in_band"),
    )


def inverted_index(
    docs: DataFrame, text_col: str = "text", max_postings: int = 32
) -> DataFrame:
    """Corpus inverted index: one row per token with document
    frequency, total term frequency, and a postings string
    ``"doc:tf;doc:tf;..."`` over the first ``max_postings`` doc_ids —
    the retrieval-side artifact a text pipeline builds once per corpus.

    Scale design: postings are BOUNDED before any buffering — a
    per-token ``row_number`` window (streaming, no per-group state)
    keeps only the first ``max_postings`` docs, so the collect_list
    holds at most that many entries even for stopword-grade tokens
    that appear in every document. The truncation is NOT silent:
    ``df`` always carries the true document frequency from the
    unbounded (scalar-only) aggregate, so ``df > max_postings`` marks
    a truncated postings list. Shuffles: one (token, doc) hash agg,
    one token window, one token-keyed join."""
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    pt = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    totals = pt.groupBy("token").agg(
        F.count(F.lit(1)).cast("int").alias("df"),
        F.sum("tf").cast("int").alias("tf_total"),
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    post = (
        pt.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda p: F.concat_ws(
                        ":", p["doc_id"].cast("string"), p["tf"].cast("string")
                    ),
                ),
                ";",
            ).alias("postings")
        )
    )
    return totals.join(post, "token")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    k1: float = 1.25,
    b: float = 0.75,
    top_n: int | None = 20,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009) for one bag of
    ``query_terms`` over the corpus — the lexical-retrieval scorer a
    training-data pipeline uses for targeted corpus slicing (topic
    mining, eval-adjacent document hunts) next to the embedding ANN.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape at 100 TB: tokenize is a narrow map; per-doc length and
    per-(doc, query-term) tf are the two doc-keyed hash aggregates
    (the tf agg sees only rows matching the literal term set — the
    filter sits before the shuffle); df/N/avgdl are query-terms-sized
    and scalar aggregates, broadcast onto the hits. The final ranking
    is TakeOrdered (per-partition top-n, driver merge), never a global
    sort. Each term's contribution is rq-quantized BEFORE the per-doc
    sum so the total is a sum of dyadic-grid values — order-independent
    bit-exact, matching the DuckDB oracle regardless of aggregation
    order (the same trick as the sketch register sums).

    Returns ``(doc_id, n_hit_terms, score)``, top ``top_n`` by
    (score desc, doc_id asc).
    """
    from mhw3d_detection_spark.queries.base import rq

    terms = sorted(set(query_terms))
    tok = tokenize(docs, text_col)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus stats: N over ALL docs, avgdl over docs with >= 1 token
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    avgdl = dl.agg(F.avg("dl").alias("__avgdl"))
    hit = tok.filter(F.col("token").isin(list(terms)))
    tf = hit.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = hit.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = (
        df.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .select("token", "df", "idf")
    )
    contrib = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "__c",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
            ),
        )
        # quantize the per-term contribution BEFORE summing: the per-doc
        # sum then adds exact dyadic-grid values (order-independent)
        .withColumn("__cq", rq(F.col("__c"), 6))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
        rq(F.sum("__cq"), 4).alias("score"),
    )
    if top_n is None:  # full scored frame (no TakeOrdered heap)
        return scored
    return scored.orderBy(F.desc("score"), "doc_id").limit(top_n)


def bpe_merge_pairs(
    docs: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """One round of BPE merge-candidate counting (Sennrich et al.
    2016): the frequency of every adjacent SYMBOL pair inside word
    tokens across all token occurrences — the statistic each BPE
    training iteration maximizes. Running it over the corpus is the
    vocabulary-induction primitive of a tokenizer-training pipeline.

    Plan: tokenize (narrow) → per-token character-bigram explode
    (narrow; a token of length L yields L−1 pairs) → one hash
    aggregate keyed by pair → TakeOrdered ``top_n`` by (count desc,
    pair asc). Pure integer counts — bit-exact in any engine, no
    rounding anywhere.

    Returns ``(pair, n)``, the ``top_n`` merge candidates.
    """
    tok = tokenize(docs, text_col)
    # explicit CASE for 1-char tokens: Spark's sequence(1, 0) is
    # DESCENDING [1, 0], not empty (same guard as shingles)
    pairs = tok.select(
        F.explode(
            F.expr(
                "CASE WHEN length(token) < 2 THEN array() "
                "ELSE transform(sequence(1, length(token) - 1), "
                "i -> substring(token, i, 2)) END"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(top_n)
    )


def cooccurrence_counts(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
) -> DataFrame:
    """Ordered windowed co-occurrence pair counts ``(a, b, c_ab)`` —
    the shared base of :func:`cooccurrence_pmi` and
    :func:`token_triangles` (the corpus-sized work; everything either
    consumer adds is vocab-pair-sized)."""
    tok = tokenize(docs, text_col)
    probe = tok.select(
        "doc_id",
        "pos",
        F.col("token").alias("a"),
        F.explode(F.array(*[F.lit(o) for o in range(1, window + 1)])).alias(
            "__o"
        ),
    ).withColumn("__pj", F.col("pos") + F.col("__o"))
    right = tok.select(
        "doc_id", F.col("pos").alias("__pj"), F.col("token").alias("b")
    )
    return (
        probe.join(right, ["doc_id", "__pj"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )


def cooccurrence_pmi(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Windowed co-occurrence counts with pointwise mutual information
    (Church & Hanks 1990) — the word-association statistic behind
    collocation mining and distributional embeddings. An ordered pair
    (a, b) counts once per position pair at distance 1..``window``
    within a document.

    Plan: positions come from one posexplode; the pair construction is
    the same offset-explode + self-equi-join shape as the lag-k
    autocorrelation (probe side explodes ``window`` offsets, joins on
    ``(doc, pos + o)``) — never a quadratic product. Marginals are
    re-aggregates of the pair-count table (vocab-sized, broadcast
    back), and PMI = ln(c_ab · N / (c_a · c_b)) is a closed-form
    projection. ``min_count`` prunes the long noisy tail."""
    c = cooccurrence_counts(docs, text_col=text_col, window=window)
    tot = c.agg(F.sum("c_ab").alias("__N"))
    ca = c.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    cb = c.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    return (
        c.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("int").alias("c_ab"),
            F.log(
                F.col("c_ab") * F.col("__N") / (F.col("c_a") * F.col("c_b"))
            ).alias("pmi"),
        )
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """The training-mixture design table (the planning counterpart of
    :func:`temperature_sample`): per group, its raw token share, its
    temperature-scaled target share ``n_g^alpha / Σ n^alpha`` (Conneau
    & Lample 2019 §3.1), and the relative sampling weight = target /
    raw — the number a sampler multiplies each group's natural rate by
    (equivalently, expected epochs over that group when the total
    token budget equals the corpus size).

    Plan: one hash aggregate to a groups-sized dim, then scalar
    totals broadcast back — O(groups) state anywhere past the first
    aggregate, at any corpus size."""
    n_tok = F.size(tokens_col(F.col(text_col)))
    per = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("__t"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias(
            "__ta"
        ),
    )
    # zero-token guards, found by the property fuzz: a zero-token
    # GROUP makes rel_weight 0/0 (NULL in Spark, NaN in DuckDB), and a
    # zero-token CORPUS makes every share x/0 — a hard ANSI
    # DIVIDE_BY_ZERO error in Spark 4. Both degenerate cases are
    # defined as 0 so engines and downstream samplers agree.
    raw = F.when(
        F.col("__t") > 0, F.col("n_tokens") / F.col("__t")
    ).otherwise(F.lit(0.0))
    target = F.when(
        F.col("__ta") > 0,
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__ta"),
    ).otherwise(F.lit(0.0))
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        raw.alias("raw_share"),
        target.alias("target_share"),
        F.when(F.col("n_tokens") > 0, target / raw)
        .otherwise(F.lit(0.0))
        .alias("rel_weight"),
    )


def split_col(
    key: Column, fractions: tuple[float, float] = (0.8, 0.9)
) -> Column:
    """The train/val/test assignment as a ROW-LOCAL column expression
    over any key column — a pure function of the key, so consumers
    that already carry the key (e.g. a pair table's endpoints) can
    compute the split in place instead of joining back to the doc
    table (r13 optimization: q_split_leakage dropped both endpoint
    joins this way; guide §2.4)."""
    u = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 12), 16, 10
    ).cast("double") / F.lit(float(1 << 48))
    return (
        F.when(u < fractions[0], F.lit("train"))
        .when(u < fractions[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_assign(
    docs: DataFrame,
    key_col: str = "doc_id",
    fractions: tuple[float, float] = (0.8, 0.9),
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5-uniform of the
    content key lands each row in train (< ``fractions[0]``), val
    (< ``fractions[1]``) or test — a pure function of the key, so the
    split is identical across reruns, partitionings and engines, and a
    document can never leak between splits when the corpus is
    re-sharded (the failure mode of seeded per-partition RNG splits).
    Narrow projection; zero shuffles."""
    return docs.withColumn("split", split_col(F.col(key_col), fractions))


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-source corpus overlap: per source pair, the EXACT Jaccard
    of the two sources' distinct shingle sets plus the MinHash-estimated
    Jaccard from per-source union signatures — the curation diagnostic
    that answers "how much of source B is already in source A" before
    deciding mixture weights or dedup order.

    Scale shape: one shingle scan feeds both sides. The estimate is
    O(sources x n_hashes) state after a single min-aggregate (the
    100 TB path — signatures of the UNION of each source's shingles,
    mergeable exactly like any min); the exact intersection is an
    equi-join on the shingle key whose per-key blowup is bounded by
    sources^2 (sources are few; at petabyte scale drop the exact
    column and keep the signature estimate). Pair universe comes from
    the distinct sources present in ``docs`` — zero-overlap pairs AND
    sources with no shingles at all (every doc shorter than
    ``shingle_n`` tokens) still appear, with jaccard 0.
    """
    sh = shingles(docs, text_col, n=shingle_n, carry_cols=(group_col,))
    ss = sh.select(group_col, "shingle").distinct()
    hx = ss.withColumn("__x", minhash_base(F.col("shingle")))
    srcs = docs.select(group_col).distinct()
    sig = srcs.join(
        hx.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_shingles"),
            *[
                F.min(minhash_member(i, F.col("__x"))).alias(f"h{i}")
                for i in range(n_hashes)
            ],
        ),
        group_col,
        "left",
    ).withColumn("n_shingles", F.coalesce("n_shingles", F.lit(0)))
    inter = (
        ss.alias("a")
        .join(ss.alias("b"), "shingle")
        .filter(F.col(f"a.{group_col}") < F.col(f"b.{group_col}"))
        .groupBy(
            F.col(f"a.{group_col}").alias("src_a"),
            F.col(f"b.{group_col}").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sig.select(
        F.col(group_col).alias("src_a"),
        F.col("n_shingles").alias("n_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(n_hashes)],
    )
    sb = sig.select(
        F.col(group_col).alias("src_b"),
        F.col("n_shingles").alias("n_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(n_hashes)],
    )
    pairs = sa.join(sb, F.col("src_a") < F.col("src_b"))
    # NULL signatures (shingle-less source) and the 0/0 union guard both
    # resolve to jaccard 0 — an empty set overlaps nothing.
    est = sum(
        F.coalesce(
            (F.col(f"ha{i}") == F.col(f"hb{i}")).cast("int"), F.lit(0)
        )
        for i in range(n_hashes)
    ) / F.lit(float(n_hashes))
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0)).cast("long")
    union_sz = F.col("n_a") + F.col("n_b") - n_inter
    return (
        pairs.join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            n_inter.alias("n_inter"),
            F.when(union_sz > 0, n_inter / union_sz)
            .otherwise(F.lit(0.0))
            .alias("exact_jaccard"),
            est.alias("est_jaccard"),
        )
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 8,
    width: int = 64,
    fast_hash: bool = False,
) -> DataFrame:
    """SimHash near-dup PAIRS at scale — the block-permutation trick of
    Manku, Jain & Das Sarma (WWW'07, Google's web dedup): two
    fingerprints within Hamming distance ``d <= n_blocks - 1`` must
    agree EXACTLY on at least one of ``n_blocks`` bit blocks
    (pigeonhole), so candidate generation is an equi-join on
    ``(block_id, block_bits)`` — never an all-pairs XOR sweep — and the
    exact ``bit_count(xor)`` check runs only on the collisions.

    Candidate blowup is bounded by block-key multiplicity: at the
    production default (64-bit fingerprint, 8 blocks of 8 bits, the
    WWW'07 geometry) each block key ranges over 2^8 values and —
    because SimHash bits are balanced hashes — buckets shrink as
    2^-block_bits of the corpus, so candidates stay ~n²/2^8 per block
    ONLY for genuinely near-identical mass. The 16-bit/4-block
    configuration exists solely as the DuckDB-oracle row
    (``q_dedup_simhash_pairs``); its 4-bit keys (16 values) degenerate
    toward all-pairs on large corpora — do not deploy it.

    Complements the MinHash-LSH path: SimHash catches small
    token-multiset edits that shift few bits, with one integer per doc
    as index state. ``fast_hash=True`` swaps md5 for xxhash64 on the
    signature map side.

    Returns ``(doc_a, doc_b, hamming)``, ``doc_a < doc_b``,
    ``hamming <= max_hamming``.
    """
    assert max_hamming < n_blocks, "pigeonhole needs d < n_blocks"
    assert width % n_blocks == 0, "blocks must tile the fingerprint"
    sig = simhash(docs, text_col, width=width, fast_hash=fast_hash)
    bw = width // n_blocks
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        # arithmetic shift + mask: the AND strips any
                        # sign-extension bits, so the top block of a
                        # 64-bit fingerprint keys correctly too
                        F.shiftright(F.col("simhash"), b * bw)
                        .bitwiseAND(F.lit((1 << bw) - 1))
                        .alias("block_bits"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.block_id").alias("block_id"),
             F.col("bk.block_bits").alias("block_bits"))
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "block_id", "block_bits",
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "block_id", "block_bits",
    )
    return (
        a.join(b, ["block_id", "block_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sim_a ^ sim_b)").alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )


def bm25_stats(
    docs: DataFrame, query_terms: tuple[str, ...], text_col: str = "text"
) -> tuple[dict[str, float], float]:
    """Corpus statistics for BM25 deployment: ``({term: idf}, avgdl)``
    from a reference corpus — the train-once seam of the streaming
    gate (:func:`streaming.sessionize.streaming_bm25_gate` folds these
    in as plan literals, the same deployment shape as the quality
    classifier's literal weights).

    EAGER: collects a query-terms-sized dict + one scalar (documented
    contract, like the k-means trainer). idf matches :func:`bm25_topk`
    bit-for-bit (same ln over the same double operands)."""
    terms = sorted(set(query_terms))
    tok = tokenize(docs, text_col)
    n = docs.count()
    avgdl_row = (
        tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        .agg(F.avg("dl").alias("a"))
        .collect()[0]
    )
    avgdl = float(avgdl_row["a"])
    df_rows = (
        tok.filter(F.col("token").isin(terms))
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    )
    import math

    dfs = {r["token"]: r["df"] for r in df_rows}
    idf = {
        t: math.log(1.0 + (float(n) - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    }
    return idf, avgdl


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    fast_hash: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    SIGMOD'03 — the MOSS plagiarism-detection sketch): hash every
    token ``k``-gram, slide a ``window`` over the hash sequence and
    keep the MINIMUM hash of each window; the distinct selected hashes
    are the document's fingerprint set. The guarantee the paper
    proves: any shared substring of at least ``k + window - 1`` tokens
    yields at least one shared fingerprint — a positional/substring
    dedup signal that complements MinHash (whole-document Jaccard) and
    SimHash (token-multiset drift).

    Entirely ROW-LOCAL until the final explode: the k-gram hashes, the
    sliding-window minima and the distinct-set compression are array
    expressions over each doc's own token array — zero shuffles, so
    the sketch build streams at scan speed at any corpus size (the
    same zero-exchange shape as ``minhash_bands_rowlocal``). Docs
    shorter than ``k`` tokens have no fingerprints; docs with fewer
    than ``window`` k-grams contribute the min of what they have (the
    paper's short-document convention).

    Returns exploded ``(doc_id, fp)`` rows, distinct per doc.
    """
    base_sql = (XXHASH_BASE_SQL if fast_hash else MD5_BASE_SQL).format(s="s")
    xs = f"transform({shingle_array_sql('__toks', k)}, s -> {base_sql})"
    fps = (
        f"case when size(__xs) = 0 then array() "
        f"when size(__xs) < {window} then array(array_min(__xs)) "
        f"else array_distinct(transform(sequence(1, size(__xs) - {window - 1}), "
        f"i -> array_min(slice(__xs, i, {window})))) end"
    )
    return (
        docs.withColumn("__toks", tokens_col(F.col(text_col)))
        .withColumn("__xs", F.expr(xs))
        .withColumn("fp", F.explode(F.expr(fps)))
        .select("doc_id", "fp")
    )


def winnow_shared_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    fast_hash: bool = False,
) -> DataFrame:
    """Candidate near-dup/plagiarism PAIRS from shared winnowing
    fingerprints: an equi-join of the fingerprint table with itself on
    ``fp`` — never an all-pairs product; bucket sizes are the number
    of documents sharing a fingerprint (content-correlated, like the
    contamination screen's shingle buckets) — then one pair-keyed
    count. ``min_shared`` prunes incidental single-hash collisions.

    Returns ``(doc_a, doc_b, n_shared)``, ``doc_a < doc_b``.
    """
    fps = winnow_fingerprints(docs, text_col, k, window, fast_hash)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# =========================================================================
# BPE merge TRAINING (Sennrich, Haddow & Birch ACL'16 §3.2) — the
# iterative half on top of bpe_merge_pairs' one-round statistic
# =========================================================================
def _bpe_syms(word: Column) -> Column:
    """Character symbols of a word as an array: space-inject + split —
    the one char-split spelling that is identical in Spark and DuckDB
    (no lookarounds: DuckDB's RE2 has none; no ``split(s, '')``:
    empty-pattern splits differ)."""
    return F.split(F.trim(F.regexp_replace(word, "(.)", "$1 ")), " ")


def _bpe_pairs(s: Column) -> Column:
    """Adjacent symbol pairs ``'a b'`` of a symbol array, SELF-PAIRS
    EXCLUDED (see :func:`bpe_train_merges`), empty for 1-symbol words
    (sequence(1, 0) is descending in Spark — guard, don't trust)."""
    return F.when(F.size(s) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.filter(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda i: F.element_at(s, i) != F.element_at(s, i + 1),
            ),
            lambda i: F.concat(
                F.element_at(s, i), F.lit(" "), F.element_at(s, i + 1)
            ),
        )
    )


def _bpe_apply(s: Column, a: str, b: str) -> Column:
    """Merge every adjacent ``(a, b)`` symbol occurrence into ``a+b``
    — positional, no fold: with ``a != b`` matches cannot overlap, so
    "drop the position after a match, emit the concatenation at the
    match" IS the greedy left-to-right merge. Literal pair (the
    trainer collected it), so this stays a narrow expression."""
    la, lb = F.lit(a), F.lit(b)
    keep = F.filter(
        F.sequence(F.lit(1), F.size(s)),
        lambda i: ~(
            (i > 1)
            & (F.element_at(s, i - 1) == la)
            & (F.element_at(s, i) == lb)
        ),
    )
    return F.transform(
        keep,
        lambda i: F.when(
            (F.element_at(s, i) == la)
            & (i < F.size(s))
            & (F.element_at(s, i + 1) == lb),
            F.concat(la, lb),
        ).otherwise(F.element_at(s, i)),
    )


def _bpe_words(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbol-array, occurrence-count) per DISTINCT word — the
    vocab-sized state every BPE round iterates over (word counts carry
    the tf weighting, so rounds never re-touch the corpus)."""
    return (
        tokenize(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(_bpe_syms(F.col("token")).alias("s"), "cnt")
    )


def bpe_train_merges(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Train ``rounds`` BPE merges: per round, count adjacent symbol
    pairs over the (distinct-word, count) table with all prior merges
    applied, pick the most frequent pair (ties to the lexicographically
    smallest — deterministic), and append it to the merge list. The
    driver holds only the merge list (rounds × 2 strings); each round
    is one hash aggregate over the VOCAB-sized word table + a
    TakeOrdered(1) — the corpus itself is touched once, by the
    word-count build (the eager-loop split of the k-means trainer).

    CONTRACT: self-pairs (``aa``) are excluded from counting and
    selection — a self-pair's greedy merge count depends on run parity
    (``aaa`` yields one merge, not two), which needs a sequential fold
    both engines would have to replay identically; excluding them
    keeps every round a positional expression that is bit-exact
    cross-engine (the SQL oracle unrolls the same rounds). Real
    tokenizer trainers special-case repeated-character runs anyway.

    Returns ``[(round, left, right, count), ...]``.
    """
    words = _bpe_words(docs, text_col).persist()
    try:
        merges: list[tuple[int, str, str, int]] = []
        for r in range(rounds):
            s = F.col("s")
            for _, a, b, _n in merges:
                s = _bpe_apply(s, a, b)
            top = (
                words.select(F.explode(_bpe_pairs(s)).alias("pair"), "cnt")
                .groupBy("pair")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), "pair")
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, n = top[0]["pair"], int(top[0]["n"])
            a, b = pair.split(" ")
            merges.append((r, a, b, n))
    finally:
        words.unpersist()
    return merges


def bpe_round_pair_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-pair counts with a trained merge list applied (the
    statistic the NEXT round would maximize) — ``(pair, n)``. The
    merges ride along as literal expressions, so the whole thing stays
    the one-aggregate shape of :func:`bpe_merge_pairs`."""
    s = F.col("s")
    for _, a, b, _n in merges:
        s = _bpe_apply(s, a, b)
    return (
        _bpe_words(docs, text_col)
        .select(F.explode(_bpe_pairs(s)).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )


def feature_hash_vectors(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Signed feature hashing ("the hashing trick", Weinberger et al.
    ICML'09): every token occurrence maps to ``bucket = h(token) mod
    dim`` with sign ``ξ(token) = ±1`` from an independent hash bit,
    and a document's feature vector is the per-bucket sum of signs —
    a FIXED-dim featurization with no vocabulary table at all, which
    is the property that matters at 100 TB: no vocab build pass, no
    broadcast dim, no OOV handling; the signed sum keeps collision
    noise zero-mean. Narrow token explode → ONE (doc, bucket) hash
    aggregate; integer end-to-end so the oracle matches bit-for-bit.

    ``ξ`` uses hash bit 6 (above the ``mod 64`` bucket bits) so sign
    and bucket are decorrelated. Returns sparse ``(doc_id, bucket,
    val)`` rows (absent bucket = 0; a cancelled bucket emits val=0 —
    kept, so the row set is a deterministic function of the tokens).
    """
    tok = tokenize(docs, text_col)
    h = minhash_base(F.col("token"))
    sign = F.lit(1) - F.lit(2) * F.shiftright(h, 6).bitwiseAND(F.lit(1))
    return (
        tok.select(
            "doc_id",
            F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
            sign.alias("__s"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("__s").cast("long").alias("val"))
    )


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Deploy a trained BPE merge list corpus-wide and report per-doc
    tokenization stats — the train→deploy seam of tokenizer work: the
    merges are applied ONCE per distinct word (vocab-sized dict, one
    narrow pass over the distinct-token table), and documents join the
    encoded dict by token (broadcast — the dict is the vocab, not the
    corpus). Returns per doc ``(n_tokens, n_chars, n_symbols,
    chars_per_symbol)`` — chars_per_symbol is the compression the
    merge list bought (1.0 = no merge ever fires; the single division
    is exact IEEE, bit-identical cross-engine).
    """
    s = _bpe_syms(F.col("token"))
    for _, a, b, _n in merges:
        s = _bpe_apply(s, a, b)
    dict_df = (
        tokenize(docs, text_col)
        .select("token")
        .distinct()
        .select(
            "token",
            F.length("token").cast("long").alias("__nc"),
            F.size(s).cast("long").alias("__ns"),
        )
    )
    return (
        tokenize(docs, text_col)
        .join(F.broadcast(dict_df), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nc").alias("n_chars"),
            F.sum("__ns").alias("n_symbols"),
            (
                F.sum("__nc") / F.sum("__ns").cast("double")
            ).alias("chars_per_symbol"),
        )
    )


def minhash_estimate_pairs(
    docs: DataFrame,
    probe_pred,
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Slot-level MinHash Jaccard ESTIMATES for probe pairs:
    ``est = (#matching minhash slots)/n_hashes`` — the estimator whose
    collision probability per slot IS the Jaccard similarity (Broder
    '97). Probe signatures broadcast against the corpus signature
    table (n_hashes ints per doc — the 100 TB side is the signature
    scan, never the shingles). Slot matches are integer comparisons,
    so the estimate is bit-exact cross-engine. Returns ``(doc_a,
    doc_b, n_slot_matches, est_jaccard)`` with doc_a (probe) < doc_b.
    """
    sh = shingles(docs, text_col, n=shingle_n)
    sx = sh.withColumn("__x", minhash_base(F.col("shingle")))
    sig = sx.groupBy("doc_id").agg(
        *[
            F.min(minhash_member(i, F.col("__x"))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    probes = sig.filter(probe_pred(F.col("doc_id"))).select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(n_hashes)],
    )
    matches = None
    for i in range(n_hashes):
        t = (F.col(f"h{i}") == F.col(f"ha{i}")).cast("int")
        matches = t if matches is None else matches + t
    return (
        sig.crossJoin(F.broadcast(probes))
        .filter(F.col("doc_a") < F.col("doc_id"))
        .select(
            "doc_a",
            F.col("doc_id").alias("doc_b"),
            matches.alias("n_slot_matches"),
            (matches / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
    )


def feature_hash_dense(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Row-local DENSE twin of :func:`feature_hash_vectors`: the same
    signed bucket sums computed per document as one array fold over
    its own tokens — zero aggregation, zero shuffles, so it runs
    unmodified on a streaming frame (the row-local/grouped duality of
    ``minhash_bands_rowlocal`` vs ``minhash_signatures``). Emits the
    full ``dim``-vector (absent buckets as explicit 0), the shape a
    downstream literal-weight classifier consumes directly. Bit-equal
    to the sparse builder on every touched bucket by differential
    test. Cost is dim adds per token — the price of statelessness;
    prefer the grouped builder for batch jobs where a shuffle is
    acceptable and dim is large.
    """
    toks = tokens_col(F.col(text_col))
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            F.pmod(minhash_base(t), F.lit(dim)).cast("int").alias("b"),
            (
                F.lit(1)
                - F.lit(2)
                * F.shiftright(minhash_base(t), 6).bitwiseAND(F.lit(1))
            ).cast("long").alias("s"),
        ),
    )
    dense = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, p: F.transform(
            acc,
            lambda v, i: v
            + F.when(p["b"] == i, p["s"]).otherwise(F.lit(0).cast("long")),
        ),
    )
    return docs.select("doc_id", dense.alias("features"))


def token_triangles(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Per-token triangle counts over the co-occurrence graph — the
    third member of the graph-analytics family (components = reach,
    PageRank = centrality, triangles = local clustering: a token in
    many triangles sits inside a tight collocation community, the
    signal behind community detection and topical-phrase mining).

    Classic distributed triangle counting (the multi-way self-join
    benchmark): orient every undirected edge low->high (kills
    duplicates AND bounds each wedge to one orientation), join wedges
    e1(a,b) x e2(b,c), close them against e3(a,c) — each triangle
    a<b<c is produced exactly once — then explode the three corners
    and count per token. Three shuffles on token keys; the edge list
    is vocab-pair-sized (``min_count`` prunes it long before the
    joins), never corpus-sized. Tokens are [a-z0-9]+, so the a<b
    ordering is plain binary compare in both engines — integer-exact
    end to end."""
    e = (
        cooccurrence_counts(docs, text_col=text_col, window=window)
        .filter((F.col("c_ab") >= min_count) & (F.col("a") != F.col("b")))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    from mhw3d_detection_spark.plans.audit_hook import ckpt as _ckpt

    # EAGER choke point: the tiny edge list feeds THREE join legs;
    # without truncation the corpus-sized pair counting upstream
    # would execute three times (the curation-funnel checkpoint
    # reasoning; values unchanged). Counts-only base: the PMI
    # scalar attach (a BNLJ) is not paid here.
    e = _ckpt(e, "triangles/edges")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("token"))
        .unionAll(tri.select(F.col("b").alias("token")))
        .unionAll(tri.select(F.col("c").alias("token")))
    )
    return corners.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def token_pagerank(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 3,
    damping: float = 0.85,
    truncate: bool = False,
) -> DataFrame:
    """PageRank over the token co-occurrence graph (Page et al. '99;
    Mihalcea & Tarau's TextRank applies exactly this to keyword
    ranking): nodes are tokens, directed edges the DISTINCT word
    bigrams, and ``iters`` power-iteration rounds propagate rank
    ``PR' = (1-d)/N + d·Σ_in PR/outdeg``. The canonical iterative
    graph workload, expressed as a fixed unrolled chain of edge-join +
    node-keyed hash aggregates — no driver loop at all (contrast the
    k-means/BPE trainers, which collect per round): rank state lives
    in the plan, every round is one shuffle on the token key, and the
    edge table is built once.

    Determinism: per-round ranks are rq6-quantized (the same dyadic
    device as the k-means centroids) so cross-engine summation-order
    noise cannot compound across rounds. Dangling tokens (no outgoing
    bigram) leak their mass — the simple non-stochastic variant; fine
    for a RANKING signal, documented so the oracle replays it exactly.

    ``truncate=True`` (r14 optimization, guide §3.3/§5 "materialise an
    intermediate to truncate the plan" — the r13
    ``connected_components_bounded`` device): localCheckpoints the
    static graph tables (edge list, node list, out-degrees) ONCE, so
    the unrolled rounds re-embed three small leaves instead of the
    whole scan → tokenize → explode → distinct pipeline per round per
    reference (the lazy plan carried 50 Exchange nodes / 22 parquet
    scans at iters=3). EAGER when set — building the returned frame
    runs the three materialization jobs; results are bit-identical
    (same rounds, same rq6 algebra). The propagation rounds stay lazy
    (per-round label checkpoints cost more than they save — the r13
    cc-grid measurement).

    Returns ``(token, pr)`` for all nodes; order with TakeOrdered
    downstream.
    """
    from mhw3d_detection_spark.plans.audit_hook import ckpt
    from mhw3d_detection_spark.queries.base import rq

    toks = tokens_col(F.col(text_col))
    n_bg = F.greatest(F.size("toks") - 1, F.lit(0))
    edges = (
        docs.select(toks.alias("toks"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n_bg), F.slice("toks", 2, n_bg)
                )
            ).alias("z")
        )
        .select(F.col("z.0").alias("src"), F.col("z.1").alias("dst"))
        .distinct()
    )
    if truncate:
        edges = ckpt(edges, "pagerank/edges")
    nodes = (
        edges.select(F.col("src").alias("token"))
        .union(edges.select(F.col("dst").alias("token")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if truncate:
        # nodes and outdeg are each re-embedded once per round (the
        # left-join spine and the contribution join); both are
        # vocabulary-sized — cheap to materialize, and truncating them
        # keeps every round's plan a three-leaf join instead of
        # re-deriving union+distinct / groupBy from the edge leaf
        nodes = ckpt(nodes, "pagerank/nodes")
        outdeg = ckpt(outdeg, "pagerank/outdeg")
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    pr = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "token", (F.lit(1.0) / F.col("__n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(outdeg), "src")
            .join(
                pr.select(F.col("token").alias("src"), "pr"), "src"
            )
            .select(
                F.col("dst").alias("token"),
                (F.col("pr") / F.col("outdeg")).alias("__c"),
            )
            .groupBy("token")
            .agg(F.sum("__c").alias("__in"))
        )
        pr = (
            nodes.join(contrib, "token", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "token",
                rq(
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return pr


def setsim_prefix_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_n: int | None = 3,
) -> DataFrame:
    """Exact set-similarity self-join with PREFIX FILTERING (AllPairs /
    PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): all
    document pairs whose distinct-shingle-set Jaccard >= ``threshold``
    (word ``shingle_n``-grams; ``None`` = unigram token sets), found
    WITHOUT estimation and WITHOUT an all-pairs pass.

    A fourth candidate-generation geometry next to MinHash-LSH
    (probabilistic bands), SimHash (Hamming blocks) and winnowing
    (content fingerprints): order every doc's tokens by ascending
    document frequency (rarest first, ties by token — one global total
    order both engines can compute), keep only the first
    ``n - ceil(t*n) + 1`` tokens as the doc's PREFIX, and equi-join on
    prefix tokens. The filter is LOSSLESS: two sets with Jaccard >= t
    that shared no prefix token would need their overlap inside the
    suffixes, but each suffix holds at most ceil(t*n) - 1 < the
    required overlap — so every qualifying pair collides on at least
    one prefix token. Rare-first ordering makes prefix tokens the
    LEAST shared ones, so candidate buckets stay small: the join key
    cardinality is the vocabulary, which GROWS with the corpus
    (exactly the property the r6 verdict flagged 16-bit SimHash for
    lacking).

    100 TB shape: one token-keyed equi-join to attach df, one doc-keyed
    aggregate for the sorted arrays, one prefix-token equi-join for
    candidates (size-compatibility pushed INTO the join: t*|A| <=
    |B| <= |A|/t prunes before the verify), then exact verification on
    candidates only. A df cap (drop the few super-common tokens from
    prefixes ONLY if also dropped from the similarity definition) or
    AQE skew split handles hot vocabulary at scale.

    Exactness: all decisions are integer (``3*inter >= na + nb`` for
    t=1/2; generally ``inter*(1+t) >= t*(na+nb)`` with dyadic t —
    products of small ints with dyadics are exact); the reported
    jaccard is an exactly-rounded integer division.

    Returns ``(doc_a, doc_b, na, nb, n_inter, jaccard)``.
    """
    import math

    t = float(threshold)
    # t_lo: one ulp BELOW t, used wherever t multiplies an integer in a
    # PRUNING decision (prefix length, size compatibility). IEEE slop
    # can push n*t just above an exact integer (50 * 0.14 =
    # 7.000000000000001), which would shorten the prefix / tighten the
    # size gate past the pigeonhole bound and silently drop qualifying
    # pairs. Pruning with t_lo is only ever LOOSER (a superset of
    # candidates), so losslessness survives any float slop; the exact
    # verify below still decides with t itself.
    t_lo = math.nextafter(t, 0.0)
    if shingle_n is None:
        tok = tokenize(docs, text_col).select("doc_id", "token").distinct()
    else:
        tok = (
            shingles(docs, text_col, n=shingle_n)
            .select("doc_id", F.col("shingle").alias("token"))
            .distinct()
        )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    arr = (
        tok.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__df, token))),"
                " s -> s.token)"
            ).alias("__toks")
        )
        .select("doc_id", "__toks", F.size("__toks").alias("__n"))
    )
    plen = (
        F.col("__n")
        - F.ceil(F.col("__n") * F.lit(t_lo)).cast("int")
        + F.lit(1)
    )
    pref = arr.select(
        "doc_id",
        F.col("__n"),
        F.explode(F.slice("__toks", F.lit(1), plen)).alias("token"),
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("__n").alias("na"), "token"
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("__n").alias("nb"), "token"
    )
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # size compatibility: J >= t forces t*na <= nb and t*nb <= na
            # (t_lo: see above — pruning must err loose, never tight)
            & (F.col("na") * F.lit(t_lo) <= F.col("nb"))
            & (F.col("nb") * F.lit(t_lo) <= F.col("na"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    va = arr.select(
        F.col("doc_id").alias("doc_a"),
        F.col("__toks").alias("__ta"),
        F.col("__n").alias("na"),
    )
    vb = arr.select(
        F.col("doc_id").alias("doc_b"),
        F.col("__toks").alias("__tb"),
        F.col("__n").alias("nb"),
    )
    v = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect("__ta", "__tb")).alias("n_inter"),
        )
        # exact threshold test: inter/(na+nb-inter) >= t, cross-multiplied
        .filter(
            F.col("n_inter") * F.lit(1.0 + t)
            >= F.lit(t) * (F.col("na") + F.col("nb"))
        )
    )
    return v.select(
        "doc_a",
        "doc_b",
        F.col("na").cast("int").alias("na"),
        F.col("nb").cast("int").alias("nb"),
        F.col("n_inter").cast("int").alias("n_inter"),
        (
            F.col("n_inter")
            / (F.col("na") + F.col("nb") - F.col("n_inter"))
        ).alias("jaccard"),
    )


def quantile_normalize(
    df: DataFrame,
    *,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-group quantile normalization (the CCNet device,
    generalized: per-language perplexity buckets only work because the
    score is calibrated WITHIN each language first): a row at
    within-group percent-rank ``p`` is mapped to the POOLED score
    distribution's value at the same fraction (linear interpolation at
    ``pos = p*(N-1)+1`` — the ``quantile_cont`` convention). After
    this, "top 30% by quality" means the same thing in every source —
    thresholding the RAW score instead silently over-prunes whichever
    source's scorer runs pessimistic.

    Distributed shape: within-group ``percent_rank`` (one window over
    the group partitioning), pooled positions via the two-phase
    ``_global_row_number`` (range repartition + bounded offset table —
    never a single-partition global window), then TWO integer
    equi-joins fetch the bracketing pooled values. NULL scores are
    excluded up front (Spark sorts NULLs first ascending, DuckDB last
    — a silent cross-engine rank shift if left in).

    Exactness: ``percent_rank`` is integer rank arithmetic in both
    engines; interpolation multiplies identical bits; outputs are
    rq6'd for the oracle gate.

    Returns ``(id, group, score, src_frac, norm_score)``.
    """
    from mhw3d_detection_spark.operators.analysis import _global_row_number

    s = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__grp"),
        F.col(score_col).alias("__score"),
    ).filter(F.col("__score").isNotNull())
    p = s.withColumn(
        "__p",
        F.percent_rank().over(
            Window.partitionBy("__grp").orderBy("__score")
        ),
    )
    pooled = _global_row_number(
        s.select("__id", "__score"), ["__score", "__id"], "__rn"
    ).select(F.col("__rn").cast("long").alias("__rn"), F.col("__score").alias("__v"))
    n = s.agg(F.count(F.lit(1)).alias("__n"))
    x = (
        p.crossJoin(F.broadcast(n))
        .withColumn("__pos", F.col("__p") * (F.col("__n") - 1) + 1)
        .withColumn("__lo", F.floor("__pos").cast("long"))
        .withColumn("__hi", F.least(F.col("__lo") + 1, F.col("__n").cast("long")))
        .withColumn("__f2", F.col("__pos") - F.col("__lo"))
    )
    lo = pooled.select(F.col("__rn").alias("__lo"), F.col("__v").alias("__vlo"))
    hi = pooled.select(F.col("__rn").alias("__hi"), F.col("__v").alias("__vhi"))
    return (
        x.join(lo, "__lo")
        .join(hi, "__hi")
        .select(
            F.col("__id").alias(id_col),
            F.col("__grp").alias(group_col),
            F.col("__score").alias("score"),
            F.col("__p").alias("src_frac"),
            (
                F.col("__vlo")
                + F.col("__f2") * (F.col("__vhi") - F.col("__vlo"))
            ).alias("norm_score"),
        )
    )


def source_divergence(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source distribution drift vs the pooled corpus: unigram
    KL(P_source || Q_pool), cross-entropy and entropy (KL = CE − H) —
    the mixture-weighting diagnostic (DoReMi-style reweighting and
    "which source is off-domain" triage both start from exactly this
    table). Q covers every token (the pool includes each source), so
    no smoothing is needed: p·ln(p/q) terms with p = 0 vanish by
    convention and q = 0 cannot occur.

    One token-keyed shuffle builds the (source, token) counts; the
    pooled token counts are an aggregate OF that aggregate (no second
    scan); per-source and pooled totals are sources-sized/scalar
    broadcasts. Output is sources-sized. ln is display-grade (rq4)
    like every logprob surface in this repo — the diagnostic ranks
    sources, it does not gate rows.
    """
    if "source" not in docs.columns:
        raise ValueError("source_divergence expects a 'source' column")
    tok = docs.select(
        "source", F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    s_tot = st.groupBy("source").agg(F.sum("c").alias("n_s"))
    pool = st.groupBy("token").agg(F.sum("c").alias("cq"))
    q_tot = pool.agg(F.sum("cq").alias("n_q"))
    j = (
        st.join(pool, "token")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(q_tot))
        .withColumn("__p", F.col("c") / F.col("n_s"))
        .withColumn("__q", F.col("cq") / F.col("n_q"))
    )
    return j.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.sum(F.col("__p") * F.log(F.col("__p") / F.col("__q"))).alias("kl"),
        F.sum(-F.col("__p") * F.log("__q")).alias("cross_entropy"),
        F.sum(-F.col("__p") * F.log("__p")).alias("entropy"),
    )


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row gets key ``ln(u) / w`` with ``u`` the
    md5-uniform of its content key — the classic A-ES device: taking
    the n LARGEST keys draws a sample where selection probability is
    proportional to weight, exactly the "sample training docs
    proportional to quality/length" primitive. Like every sampler in
    this repo the randomness is a pure function of the KEY (+ ``salt``
    for independent re-draws): reproducible across engines, reruns and
    layouts, and a doc cannot enter/leave the sample when the corpus
    is re-sharded.

    The ranking key is rq6-QUANTIZED before the top-n: ln/pow are not
    exactly-rounded IEEE, so raw keys could differ cross-engine in the
    last ulp and flip a rank at a near-tie; on the 1e-6 grid the keys
    are bit-identical and ties break by content key. Plans as
    TakeOrderedAndProject (per-partition heads, no global sort).
    Rows with NULL or non-positive weight are excluded (ES is defined
    for w > 0).
    """
    from mhw3d_detection_spark.queries.base import rq

    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(str(salt)))),
            1,
            12,
        ),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 48))
    w = F.col(weight_col).cast("double")
    keyed = docs.filter(w.isNotNull() & (w > 0)).withColumn(
        "sample_key", rq(F.log(u) / w, 6)
    )
    return keyed.orderBy(F.desc("sample_key"), F.col(key_col)).limit(int(n))


def shingle_containment_pairs(
    docs: DataFrame,
    probe_pred,
    text_col: str = "text",
    shingle_n: int = 3,
    min_containment: float = 0.5,
) -> DataFrame:
    """Asymmetric shingle-set CONTAINMENT |A ∩ B| / |A| from a probe
    subset A into the corpus — the quote/excerpt detector Jaccard
    misses by construction: a 50-shingle document fully embedded in a
    5000-shingle page has Jaccard ≈ 0.01 (invisible at any sane
    threshold) but containment 1.0. This is the measure benchmark
    decontamination actually needs (is the EVAL ITEM inside the
    training page — not "are the two pages similar").

    Same candidate geometry as :func:`ngram_jaccard_pairs`: distinct
    shingles, equi-join on shingle, |A| by one per-doc count; at scale
    the probe side is the (small) eval/benchmark set and rides a
    broadcast, so the corpus is touched by one join + one aggregate.

    Exactness: intersection and size are integers; containment is one
    exactly-rounded division, and the ``>=`` threshold decision
    compares identical bits in both engines.

    Returns ``(probe_id, doc_id, inter, sz_probe, containment)`` for
    pairs at or above ``min_containment``.
    """
    # r13: |A| rides the probe shingle rows (with_size carry, recovered
    # exactly by max() in the pair aggregate) — the join back to a
    # per-doc size table (a pair-table shuffle + a probe re-tokenize)
    # is gone; the corpus side selects only (doc_id, shingle) so its
    # sz column is pruned before the exchange (guide §2.3, §8). sz=0
    # probes stay inert: they have no exploded rows, exactly as the
    # old inner join dropped them.
    sh = distinct_shingles(docs, text_col, n=shingle_n, with_size=True)
    probes = sh.filter(probe_pred(F.col("doc_id")))
    inter = (
        probes.select(
            F.col("doc_id").alias("probe_id"),
            F.col("sz").alias("sz_probe"),
            "shingle",
        )
        .join(sh.select("doc_id", "shingle"), "shingle")
        .filter(F.col("probe_id") != F.col("doc_id"))
        .groupBy("probe_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("inter"),
            F.max("sz_probe").alias("sz_probe"),
        )
    )
    return (
        inter.withColumn(
            "containment", F.col("inter") / F.col("sz_probe")
        )
        .filter(F.col("containment") >= F.lit(float(min_containment)))
        .select(
            "probe_id",
            "doc_id",
            "inter",
            F.col("sz_probe").cast("long").alias("sz_probe"),
            "containment",
        )
    )


def curriculum_thresholds(
    docs: DataFrame,
    fracs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    text_col: str = "text",
) -> dict[str, list[float]]:
    """Batch-side trainer for the streaming curriculum gate: the same
    per-source exact percentile thresholds (rq6) the windowless decile
    row computes, collected as the small Python dict
    ``streaming_curriculum_gate`` embeds as plan literals — |sources| x
    len(fracs) floats, the model-export seam (same shape as the DSIR
    log-ratio list and k-means centroids)."""
    from mhw3d_detection_spark.queries.base import rq

    st = text_stats(docs, text_col).select(
        "doc_id", rq("quality_score", 4).alias("q")
    )
    q = docs.select("doc_id", "source").join(st, "doc_id")
    fr = ", ".join(repr(float(f)) for f in fracs)
    thr = q.groupBy("source").agg(
        F.transform(
            F.expr(f"percentile(q, array({fr}))"), lambda x: rq(x, 6)
        ).alias("t")
    )
    return {r["source"]: [float(x) for x in r["t"]] for r in thr.collect()}


def token_gini(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gini coefficient of token-frequency concentration — the
    inequality summary of the corpus's Zipf curve: 0 = every type
    equally frequent, →1 = a handful of types carry all the mass. The
    one-number companion to the Heaps (vocab growth) and burstiness
    diagnostics: concentration rising across crawl snapshots means new
    data is adding occurrences of OLD types, not coverage.

    Exactness & scale (the ks_two_sample device): the corpus is
    touched by ONE token-keyed aggregate; frequencies then collapse to
    the (frequency value, #types at that value) histogram, so the
    ordered window runs over DISTINCT COUNT VALUES — domain-bounded,
    a few thousand rows however large the corpus. Ties make the rank
    assignment order-free: all m types at value v occupy a contiguous
    rank block [c+1, c+m], contributing v·(m·c + m(m+1)/2) — pure
    BIGINT; Gini = (2·S − (n+1)·T) / (n·T) is one exactly-rounded
    division (RAW-double hash). BIGINT bound: S ≤ n_types²·max_freq —
    fine through sf1-scale corpora; at 1e9-type corpora move the
    final products to DOUBLE (documented, not gated: the histogram
    shape is already there).

    Returns ONE row ``(n_types, n_tokens, gini)``.
    """
    tok = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    return gini_from_freq(freq)


def gini_from_freq(freq: DataFrame) -> DataFrame:
    """Gini from a prebuilt ``(token, v)`` frequency table — the
    shared tail of :func:`token_gini`, exposed so the composed corpus
    report can feed ONE materialized freq table into every
    distribution-shape section."""
    from pyspark.sql import Window

    hist = freq.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    contrib = hist.select(
        "v",
        "m",
        (
            F.col("v")
            * (
                F.col("m") * F.coalesce(F.sum("m").over(w), F.lit(0))
                + F.col("m") * (F.col("m") + 1) / 2
            )
        ).cast("long").alias("s_part"),
    )
    return contrib.groupBy().agg(
        F.sum("m").cast("long").alias("n_types"),
        F.sum(F.col("v") * F.col("m")).cast("long").alias("n_tokens"),
        (
            (2 * F.sum("s_part") - (F.sum("m") + 1) * F.sum(F.col("v") * F.col("m")))
            / (F.sum("m") * F.sum(F.col("v") * F.col("m")))
        ).alias("gini"),
    )


def keyness_llr(
    docs: DataFrame,
    target_pred,
    *,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood keyness (G², Dunning CL'93) per token:
    which vocabulary is OVER/UNDER-represented in a target slice vs
    the rest of the corpus — the statistically-grounded "what makes
    this source different" readout (χ²'s low-count failure mode is
    exactly web-corpus vocabulary, which is why corpus linguistics
    settled on G²). Drives source profiling, domain-mixture debugging,
    and contamination triage (an eval benchmark's signature terms
    lighting up in one crawl slice).

    G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)), E_x the expected count under
    the pooled rate; ``enriched`` = 1 when the target rate exceeds the
    background rate (G² itself is unsigned). 0·ln(0) = 0 by contract
    (CASE-guarded identically in both engines).

    Exactness: counts and totals are integers; each ln argument is one
    exactly-rounded division chain of identical integer bits, and G²
    is DISPLAY-ONLY rq4 (the repo's ln contract — decisions threshold
    the integer counts via ``min_count``, never the transcendental).
    Scale: one token-keyed aggregate + a 1-row totals broadcast.

    Returns ``(token, a, b, enriched, g2)``, tokens with pooled count
    >= min_count.
    """
    from mhw3d_detection_spark.queries.base import rq

    # NULL predicate rows (e.g. NULL source vs source == 'x') are
    # BACKGROUND, matching the oracle's CASE ELSE — a bare cast would
    # NULL t and silently drop those tokens from b and nb
    # (code-review r10 #6)
    tok = docs.select(
        F.coalesce(target_pred.cast("int"), F.lit(0)).alias("t"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    )
    g = tok.groupBy("token").agg(
        F.sum("t").cast("long").alias("a"),
        F.sum(1 - F.col("t")).cast("long").alias("b"),
    ).filter((F.col("a") + F.col("b")) >= int(min_count))
    tot = tok.groupBy().agg(
        F.sum("t").cast("double").alias("na"),
        F.sum(1 - F.col("t")).cast("double").alias("nb"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ea = (F.col("a") + F.col("b")) * F.col("na") / (F.col("na") + F.col("nb"))
    eb = (F.col("a") + F.col("b")) * F.col("nb") / (F.col("na") + F.col("nb"))
    term_a = F.when(
        F.col("a") > 0, F.col("a") * F.log(F.col("a") / ea)
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("b") > 0, F.col("b") * F.log(F.col("b") / eb)
    ).otherwise(F.lit(0.0))
    return j.select(
        "token",
        "a",
        "b",
        (F.col("a") * F.col("nb") > F.col("b") * F.col("na"))
        .cast("int")
        .alias("enriched"),
        rq(F.lit(2.0) * (term_a + term_b), 4).alias("g2"),
    )


def zipf_fit(
    docs: DataFrame, *, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Zipf rank-frequency fit over the top-N types: OLS slope of
    ln(freq) on ln(rank) — the power-law exponent (≈ −1 for natural
    language; |slope| drifting low flags templated/boilerplate-heavy
    corpora, high flags degenerate repetition). The distribution-SHAPE
    companion to token_gini's one-number concentration.

    Exactness: ln(rank) for ranks 1..N is a SHARED-LITERAL dim
    (precomputed in Python — no runtime trig on the x side); ln(freq)
    is runtime ln of identical integer bits (the KL/logprob contract),
    dyadic-quantized (2^-30) so the five OLS sums are order-free; the
    closed-form slope/intercept is ONE textual formula evaluated from
    identical sums. Outputs rq4 (display).

    Scale: one token-keyed aggregate; the fit runs on N rows.

    Returns ONE row ``(n_top, zipf_slope, zipf_intercept)``.
    """
    tok = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    return zipf_from_freq(freq, top_n=top_n)


def zipf_from_freq(freq: DataFrame, *, top_n: int = 100) -> DataFrame:
    """Zipf OLS from a prebuilt ``(token, v)`` frequency table — the
    shared tail of :func:`zipf_fit` (see :func:`gini_from_freq`)."""
    import math

    from pyspark.sql import Window

    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.queries.base import rq

    top = freq.orderBy(F.desc("v"), F.col("token")).limit(int(top_n))
    w = Window.orderBy(F.desc("v"), F.col("token"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    # shared-literal ln(rank) dim
    rows = [(r, math.log(r)) for r in range(1, int(top_n) + 1)]
    lnr_dim = ranked.sparkSession.createDataFrame(
        rows, "rank int, x double"
    )
    j = ranked.join(F.broadcast(lnr_dim), "rank").select(
        dyadic_quantize(F.col("x"), 30).alias("x"),
        dyadic_quantize(F.log(F.col("v").cast("double")), 30).alias("y"),
    )
    s = j.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        # products re-quantized (2^-20): x·y of two 2^-30-grid values
        # needs 2^-60 — not representable — so the rounded products
        # must land back on a shared grid for order-free sums
        F.sum(dyadic_quantize(F.col("x") * F.col("y"), 20)).alias("sxy"),
        F.sum(dyadic_quantize(F.col("x") * F.col("x"), 20)).alias("sxx"),
    )
    slope = F.expr("(n*sxy - sx*sy) / (n*sxx - sx*sx)")
    intercept = F.expr("(sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n")
    return s.select(
        F.col("n").cast("long").alias("n_top"),
        rq(slope, 4).alias("zipf_slope"),
        rq(intercept, 4).alias("zipf_intercept"),
    )


def dedup_edit_verify(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    max_ratio: float = 0.2,
    max_len: int | None = None,
) -> DataFrame:
    """Edit-distance VERIFICATION of near-dup candidate pairs — the
    precision leg after any candidate generator (MinHash/SimHash/SRP):
    banding trades recall for candidates, and a pipeline that DELETES
    data wants the survivors re-checked by an exact string metric.
    Levenshtein is integer dynamic programming — bit-exact in any
    engine — and the normalized ratio dist/max(len_a, len_b) is one
    exactly-rounded division.

    Scale: candidate-pairs-bounded (never corpus²); the two text
    attaches are doc-keyed equi-joins. Levenshtein itself is
    O(len_a·len_b) per pair — the reason it is a VERIFY stage, not a
    generator. ``max_len`` makes the cost cap ENFORCEABLE (VERDICT r10
    #2/Next #4): when set, each side is compared on its first
    ``max_len`` chars (prefix truncation, the CCNet/Gopher convention
    for book-length outliers) and the pair is flagged
    ``truncated = 1`` so downstream delete decisions know the ratio is
    a prefix approximation. Per-pair DP cost is then <= max_len² at
    any corpus scale; leave ``None`` only when the caller already
    bounds text length upstream.

    Returns ``(doc_a, doc_b, edit_dist, edit_ratio, verified,
    truncated)``, verified = ratio <= max_ratio (ratio over the
    compared — possibly truncated — strings).
    """
    txt = F.col(text_col)
    cmp_txt = (
        F.substring(txt, 1, int(max_len)) if max_len is not None else txt
    )
    ta = docs.select(
        F.col("doc_id").alias("doc_a"),
        cmp_txt.alias("__ta"),
        F.length(txt).alias("__la"),
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"),
        cmp_txt.alias("__tb"),
        F.length(txt).alias("__lb"),
    )
    j = pairs.select("doc_a", "doc_b").join(ta, "doc_a").join(tb, "doc_b")
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"))
    denom = F.greatest(F.length("__ta"), F.length("__tb"), F.lit(1))
    truncated = (
        ((F.col("__la") > int(max_len)) | (F.col("__lb") > int(max_len)))
        .cast("int")
        if max_len is not None
        else F.lit(0).cast("int")
    )
    # NULL text contract (code-review r11 #5, comment corrected per
    # ADVICE r12 #3): a pair touching a NULL-text doc reports
    # edit_dist/edit_ratio NULL and verified 0 — a delete pipeline
    # must never act on unknown, and the SQL oracle's CASE..ELSE 0
    # already lands there. `truncated` follows three-valued OR in
    # BOTH engines: 1 when the KNOWN side exceeds max_len (NULL OR
    # TRUE = TRUE), else the NULL propagates and the coalesce lands
    # on 0 — so a NULL-text pair is flagged truncated iff the other
    # side was actually cut.
    return j.select(
        "doc_a",
        "doc_b",
        dist.cast("long").alias("edit_dist"),
        (dist / denom).alias("edit_ratio"),
        F.coalesce(
            (dist / denom <= F.lit(float(max_ratio))).cast("int"),
            F.lit(0),
        ).alias("verified"),
        F.coalesce(truncated, F.lit(0)).alias("truncated"),
    )


def normalize_text_col(text: Column) -> Column:
    """The ONE copy of the canonicalization expression (lowercase,
    tab/newline -> space, space runs collapsed, trimmed) shared by
    :func:`normalize_texts` and :func:`dedup_exact_normalized` — and
    mirrored textually in their oracles. Deliberately ASCII-safe and
    regex-dialect-portable (Java regex and RE2 agree on these
    patterns); Unicode NFKC etc. is an env-blocked extension point
    (no ICU in either engine's portable subset)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[\\t\\n\\r]", " "), " +", " "
        )
    )


def normalize_texts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Text canonicalization with change accounting — the cleaner
    stage curation runs before any hashing/dedup (two byte-different
    crawls of one page usually differ ONLY in case/whitespace, so
    hashes must be taken post-normalization to mean anything). Pure
    narrow projection: zero shuffles at any corpus size.

    Returns ``(doc_id, n_chars_raw, n_chars_norm, changed,
    norm_fingerprint)`` — fingerprint is the repo-standard 48-bit md5
    prefix of the normalized text (join key for the normalized dedup).
    """
    norm = normalize_text_col(F.col(text_col))
    return docs.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        # null-safe inequality: NULL text must report changed = 0
        # like the oracle's CASE (NULL <> NULL falls to ELSE), not a
        # NULL flag (code-review r10 #5)
        (~norm.eqNullSafe(F.col(text_col))).cast("int").alias("changed"),
        minhash_base(norm).alias("norm_fingerprint"),
    )


def dedup_exact_normalized(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the NORMALIZED text — catches the
    case/whitespace variants raw exact-dup misses by construction
    (the gap between E1's byte-hash groups and E2's near-dup
    machinery: a CRLF re-serve of a page is a different byte string
    and Jaccard ~1.0, but normalized it is the SAME string — no
    banding needed). Same hash-groupBy shape as exact dedup, min
    doc_id kept.

    Returns ``(doc_id, group_size, kept)`` for docs in groups of
    size >= 2 (singletons pass untouched and are omitted: the report
    is the duplicate mass).
    """
    norm = normalize_text_col(F.col(text_col))
    keyed = docs.select("doc_id", norm.alias("__norm"))
    g = keyed.groupBy("__norm").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("doc_id").alias("__keep"),
    ).filter(F.col("group_size") >= 2)
    return (
        keyed.join(g, "__norm")
        .select(
            "doc_id",
            "group_size",
            (F.col("doc_id") == F.col("__keep")).cast("int").alias("kept"),
        )
    )


def weighted_containment_pairs(
    docs: DataFrame,
    probe_pred,
    *,
    text_col: str = "text",
    shingle_n: int = 3,
    min_weighted: float = 0.5,
) -> DataFrame:
    """IDF-weighted asymmetric containment: Σ_{s∈A∩B} idf(s) /
    Σ_{s∈A} idf(s) for a probe doc A against corpus docs B — the
    quote/excerpt detector with the boilerplate hole closed: plain
    containment (E2i) counts a shared navigation footer the same as a
    shared PARAGRAPH; idf weighting makes common shingles nearly
    free and rare ones decisive (the BM25 insight applied to the
    dedup question). idf = ln(N / df) over DISTINCT-doc shingle
    frequency.

    Exactness: df and N are integers, each idf is ln of one
    exactly-rounded division (identical bits), dyadic-quantized
    (2^-20) so numerator/denominator sums are order-free; the final
    ratio is one exactly-rounded division (rq6 display). Scale: the
    same shingle-keyed joins as containment, plus one df aggregate
    the boilerplate row already pays.

    Returns ``(probe_id, doc_id, n_shared, w_containment)``.
    """
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.queries.base import rq

    sh = distinct_shingles(docs, text_col, n=shingle_n)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    # r14 (VERDICT r13 "What's wrong" #2, guide §2.5): the r13 df came
    # from count() OVER (PARTITION BY shingle) on a pinned shingle
    # exchange — every row of a hot (boilerplate) shingle buffered in
    # ONE task's window frame, with no partial aggregation and no AQE
    # skew split (windows are never split). df is now a groupBy
    # (map-side partial counts — the shuffle moves one (shingle,
    # partial) row per task) re-attached with an un-hinted equi-join:
    # AQE broadcasts the dim-sized df table at runtime, and past the
    # broadcast threshold the sort-merge fallback keeps
    # ENSURE_REQUIREMENTS exchanges, i.e. stays AQE-skew-splittable.
    # The identical df subtrees below the self-join dedupe via
    # exchange/stage reuse, so the corpus tokenizes ~twice (df pass +
    # corpus side; probe sides are pushdown-pruned to probe docs) —
    # the price of removing the unbounded hot-key window buffer. Same
    # integer df, so __w is bit-identical.
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = (
        sh.join(dfc, "shingle")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "shingle",
            dyadic_quantize(F.log(F.col("__n") / F.col("__df")), 20).alias(
                "__w"
            ),
        )
    )
    probes = w.filter(probe_pred(F.col("doc_id"))).select(
        F.col("doc_id").alias("probe_id"), "shingle", F.col("__w").alias("__pw")
    )
    denom = probes.groupBy("probe_id").agg(
        F.sum("__pw").alias("__wsum")
    )
    inter = (
        probes.join(
            w.select(F.col("doc_id"), "shingle", "__w"), "shingle"
        )
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("probe_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum("__pw").alias("__wint"),
        )
    )
    return (
        inter.join(denom, "probe_id")
        # __wsum == 0 means every probe shingle has df == N (an
        # all-boilerplate probe, in-domain here): the ratio is
        # undefined — NULL, which the threshold filter drops, exactly
        # as the DuckDB oracle's NULL-comparison does. The unguarded
        # division was an ANSI DIVIDE_BY_ZERO job crash (code-review
        # r10 #1, the KS/W1 empty-slice class).
        .withColumn(
            "__ratio",
            F.when(
                F.col("__wsum") > 0, F.col("__wint") / F.col("__wsum")
            ),
        )
        .filter(F.col("__ratio") >= F.lit(float(min_weighted)))
        .select(
            "probe_id",
            "doc_id",
            "n_shared",
            rq(F.col("__ratio"), 6).alias("w_containment"),
        )
    )


def token_clustering(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """Per-token local clustering coefficient over the co-occurrence
    graph — cc = 2·triangles / (deg·(deg−1)), the normalized form of
    :func:`token_triangles`'s raw counts (a hub token touches many
    triangles just by having many neighbors; cc says how CLIQUISH the
    neighborhood itself is — the collocation-community signal, vs mere
    frequency). Completes the graph family: components = reach,
    PageRank = global centrality, triangles = raw closure, cc =
    degree-normalized closure.

    One edge list (low->high oriented, ``min_count``-pruned,
    localCheckpointed — it feeds the wedge join legs AND the degree
    count), the token_triangles multi-way self-join for closures, one
    endpoint union for degrees. All integer until the final exact
    division; tokens with degree < 2 have no wedge — cc NULL (not 0:
    "no neighborhood to be cliquish about" is not "open neighborhood").
    Returns ``(token, degree, n_triangles, clustering_coeff)`` for
    every token in the pruned edge list.
    """
    e = (
        cooccurrence_counts(docs, text_col=text_col, window=window)
        .filter((F.col("c_ab") >= min_count) & (F.col("a") != F.col("b")))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    from mhw3d_detection_spark.plans.audit_hook import ckpt as _ckpt

    e = _ckpt(e, "clustering/edges")
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("token"))
        .unionAll(tri.select(F.col("b").alias("token")))
        .unionAll(tri.select(F.col("c").alias("token")))
    )
    tcnt = corners.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    ends = e.select(F.col("u").alias("token")).unionAll(
        e.select(F.col("v").alias("token"))
    )
    deg = ends.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    j = deg.join(tcnt, "token", "left").select(
        "token",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
    cc = F.when(
        F.col("degree") > 1,
        F.lit(2.0) * F.col("n_triangles")
        / (F.col("degree") * (F.col("degree") - 1)),
    )
    return j.select(
        "token", "degree", "n_triangles", cc.alias("clustering_coeff")
    )


def flesch_proxy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic Flesch-reading-ease proxy per document — the
    readability axis of quality scoring (Flesch 1948; the quality
    classifier's length/punctuation features say how a page is
    formatted, readability says how it READS — boilerplate listings
    and keyword-stuffed spam score far off the prose band).

    Proxies keep it closed-form and engine-exact: words = [a-z0-9]+
    tokens, sentences = [.!?]+ runs (min 1), syllables = [aeiouy]+
    vowel GROUPS in the lowercased text (the standard cheap syllable
    estimate; a real hyphenation dictionary is an offline swap that
    leaves the plan unchanged). Pure narrow projection — one regex
    pass per feature, no shuffle at any corpus size; the score is
    plain IEEE arithmetic on integer counts, bit-equal cross-engine.
    """
    words, sentences, syllables, flesch = flesch_cols(text_col)
    return docs.select(
        "doc_id",
        words.cast("int").alias("n_words"),
        sentences.cast("int").alias("n_sentences"),
        syllables.cast("int").alias("n_syllables"),
        flesch.alias("flesch"),
    )


def flesch_cols(text_col: str = "text"):
    """The ONE copy of the Flesch-proxy feature expressions —
    :func:`flesch_proxy` (batch) and
    ``streaming.sessionize.streaming_readability_gate`` (ingest) both
    project these, so a formula fix cannot desynchronize the backfill
    scorer from the live gate (the ``composite_quality_col`` sharing
    rule). Returns ``(words, sentences, syllables, flesch)`` columns.
    """
    text = F.col(text_col)
    words = F.size(tokens_col(text))
    # Column-form regexp (not an f-string into F.expr): the text
    # column stays on the same resolution path as the words term, so
    # exotic column names / expressions cannot desync the features
    sentences = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(text), F.lit("[aeiouy]+"), F.lit(0))
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6)
        * (syllables.cast("double") / F.greatest(words, F.lit(1)))
    )
    return words, sentences, syllables, flesch
