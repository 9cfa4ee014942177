"""Beyond-reference extension queries (SURVEY.md §2.11): dedup (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search (brute-force + IVF-bucketed top-k), text analysis (tokens,
quality, language-ID, token counts, fingerprints), multimodal plumbing.

These run on the driver's ``documents`` / ``embeddings`` tables. Hash
functions are md5-based so every pipeline is exactly reproducible in
the DuckDB oracle (swap to xxhash64 for raw speed at 100 TB — the
plans are identical).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mhw3d_detection_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
)
from mhw3d_detection_spark.operators.similarity import (
    cosine_topk,
    embedding_lsh_pairs,
    embedding_near_dup_pairs,
)
from mhw3d_detection_spark.operators.textops import (
    LANG_STOPWORDS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_M,
    connected_components_bounded,
    deterministic_sample,
    exact_dedup,
    fingerprint,
    language_id,
    minhash_bands_rowlocal,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash16,
    source_overlap,
    stratified_quota,
    text_stats,
    tokenize,
)
from mhw3d_detection_spark.queries.base import dlit, register, rq, rq_sql
from mhw3d_detection_spark.operators.analysis import (
    dyadic_quantize_sql as _dq_sql,
)
from mhw3d_detection_spark.sources.tables import load_table

TOKENS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"

#: quality-classifier feature expressions over a (text, toks) row — the
#: ONE copy shared by _QLR_SQL and _CURATION_SQL so a guard fix (the
#: greatest()/coalesce() zero-denominator guards live here) cannot
#: desynchronize the flagship oracle from the component oracle.
QFEATURES_SQL = (
    "len(toks) AS n_tokens, "
    "len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) "
    "  / greatest(len(toks), 1) AS stop_ratio, "
    "(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "  / greatest(length(text), 1) AS punct_ratio, "
    "coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "  / greatest(len(toks), 1) AS mean_token_len"
)


def QLOGIT_SQL() -> str:
    """The literal-weight logit over QFEATURES_SQL's columns — same
    left-associative IEEE order as ``textops.quality_scores``."""
    from mhw3d_detection_spark.operators.textops import QUALITY_LR as w

    return (
        f"{w['intercept']!r} + {w['w_len']!r} * least(n_tokens / 100.0, 1.0) "
        f"+ {w['w_punct']!r} * punct_ratio + {w['w_stop']!r} * stop_ratio "
        f"+ {w['w_tok_len']!r} * mean_token_len"
    )


def SPLIT_CASE_SQL(key: str) -> str:
    """The md5-uniform 80/10/10 split of ``textops.split_assign`` —
    shared by q_split_assign and the curation-funnel oracle."""
    u = f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 12))::BIGINT / 281474976710656.0"
    return (
        f"CASE WHEN {u} < 0.8 THEN 'train' "
        f"WHEN {u} < 0.9 THEN 'val' ELSE 'test' END"
    )

#: word 3-gram shingles via direct array slicing (mirror of
#: operators.textops.shingles). Positions come from a PER-ROW
#: generate_series over the doc's own token count — no fixed cap, so
#: the oracle cannot silently diverge from the (uncapped) Spark side
#: on very long documents.
SHINGLES_SQL = (
    "d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "shp AS (SELECT doc_id, toks, "
    "  unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM d), "
    "sh AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS shingle "
    "  FROM shp)"
)

#: per-language stopword-hit counters + argmax predictor (shared by the
#: language-ID query and the composite data-prep pipeline)
_LANG_SQL_COUNTS = ", ".join(
    "sum(CASE WHEN token IN ({}) THEN 1 ELSE 0 END) AS n_{}".format(
        ", ".join(f"'{w}'" for w in words), lang
    )
    for lang, words in LANG_STOPWORDS.items()
)
_LANG_SQL_PRED = (
    "CASE WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'und' "
    + " ".join(
        f"WHEN n_{lang} = greatest(n_en, n_de, n_fr, n_es) THEN '{lang}'"
        for lang in LANG_STOPWORDS
    )
    + " END"
)


# =========================================================================
# E1 — exact dedup
# =========================================================================
@register(
    "q_dedup_exact",
    "SELECT min(doc_id) AS keep_id, count(*) AS n_copies "
    "FROM documents GROUP BY text",
)
def q_dedup_exact(spark, sf_dir):
    """E1: hash-groupBy on the exact content; smallest doc_id is the
    canonical survivor. At scale: group on md5(text) to keep shuffle
    keys small."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


# =========================================================================
# E2 — MinHash signatures + LSH candidate pairs
# =========================================================================
#: one md5 per shingle -> 48-bit int -> 8-member linear hash family
#: (mirror of operators.textops.minhash_signatures)
MINHASH_SIG_SQL = (
    "shx AS (SELECT doc_id, "
    "  ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS x FROM sh), "
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_M}) AS h{i}"
        for i in range(8)
    )
    + " FROM shx GROUP BY 1), "
    "bands AS (SELECT doc_id, b.band_id, CASE b.band_id "
    + " ".join(
        f"WHEN {b} THEN CAST(h{2 * b} AS VARCHAR) || '_' || CAST(h{2 * b + 1} AS VARCHAR)"
        for b in range(4)
    )
    + " END AS band_sig "
    "FROM sig, (SELECT unnest(generate_series(0, 3)) AS band_id) b)"
)


@register(
    "q_dedup_minhash",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL} "
    "SELECT doc_id, band_id, band_sig FROM bands",
)
def q_dedup_minhash(spark, sf_dir):
    """E2: MinHash signatures over word-3-gram shingles, banded 4x2 for
    LSH: one md5 per shingle -> 48-bit base hash -> linear hash family
    (A*x+B) mod M -> per-doc min -> band concat. Since r6 the Spark
    side is the ROW-LOCAL builder (zero shuffles, md5 once per shingle
    — bit-identical to the grouped path by differential test); the
    DuckDB oracle keeps the grouped formulation, so the hash-match is
    also a cross-formulation differential."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)


@register(
    "q_dedup_minhash_pairs",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL} "
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "WHERE a.doc_id < b.doc_id AND a.doc_id < 100",
)
def q_dedup_minhash_pairs(spark, sf_dir):
    """E2: the LSH bucket self-join — docs colliding on any (band,
    signature) bucket are near-dup candidates. Equi-join on the bucket
    key: the step that turns O(n²) all-pairs into a shuffle on bucket
    ids. Probe side bounded (doc_id < 100) to keep test output small."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    pairs = minhash_candidate_pairs(sig)
    return pairs.filter(F.col("doc_a") < 100)


# =========================================================================
# E2 — SimHash near-dup pairs via block permutation (Manku et al. '07)
# =========================================================================
_SIMHASH_SQL_BODY = (
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "h AS (SELECT doc_id, substr(md5(token), 1, 4) AS h4 FROM tok), "
    "bits AS (SELECT doc_id, j.j, "
    "  CAST(floor((strpos('0123456789abcdef', substr(h4, (j.j - 1) // 4 + 1, 1)) - 1) "
    "    / power(2, 3 - ((j.j - 1) % 4))) AS INT) % 2 AS bit "
    "  FROM h, (SELECT unnest(generate_series(1, 16)) AS j) j), "
    "votes AS (SELECT doc_id, j, sum(bit * 2 - 1) AS v FROM bits GROUP BY 1, 2), "
    "sig AS (SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN power(2, 16 - j) "
    "  ELSE 0 END) AS BIGINT) AS simhash FROM votes GROUP BY 1)"
)


@register(
    "q_dedup_simhash_pairs",
    _SIMHASH_SQL_BODY + ", "
    "blk AS (SELECT doc_id, simhash, b.b AS block_id, "
    "  (simhash // (1 << (b.b * 4))) % 16 AS block_bits "
    "  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) b), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b, "
    "  a.simhash AS sa, b2.simhash AS sb FROM blk a "
    "  JOIN blk b2 ON a.block_id = b2.block_id AND a.block_bits = b2.block_bits "
    "  WHERE a.doc_id < b2.doc_id) "
    "SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming FROM cand "
    "WHERE bit_count(xor(sa, sb)) <= 3",
)
def q_dedup_simhash_pairs(spark, sf_dir):
    """E2: SimHash near-dup pairs by block permutation (Manku, Jain &
    Das Sarma WWW'07): fingerprints within Hamming distance 3 must
    agree exactly on one of 4 bit blocks (pigeonhole), so candidates
    come from an equi-join on (block_id, block_bits) — never an
    all-pairs XOR sweep — and bit_count(xor) verifies only collisions.
    Complements MinHash-LSH: one integer of index state per doc.

    This row pins the 16-bit/4-block ORACLE geometry only (DuckDB
    replays it bit-for-bit). Production uses the operator's 64-bit/
    8-block defaults — 4-bit block keys degenerate toward all-pairs at
    corpus scale (measured: 20k docs -> 24.7M candidate pairs at width
    16 vs 100k docs -> 0.55M at width 64; docs/PLANS.md r7)."""
    from mhw3d_detection_spark.operators.textops import (
        simhash_hamming_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return simhash_hamming_pairs(docs, max_hamming=3, n_blocks=4, width=16)


# =========================================================================
# E2 — duplicate clusters: connected components of the LSH pair graph
# =========================================================================
_CC_ITER = (
    "l{next} AS (SELECT x.v, min(x.label) AS label FROM "
    "(SELECT v, label FROM l{cur} UNION ALL "
    " SELECT e.v, l{cur}.label FROM e JOIN l{cur} ON e.u = l{cur}.v) x "
    "GROUP BY 1)"
)


@register(
    "q_dedup_components",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    + ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    + " SELECT v AS doc_id, label AS component FROM l3",
)
def q_dedup_components(spark, sf_dir):
    """E2 final stage: near-dup PAIRS (MinHash-LSH bucket collisions)
    -> dedup GROUPS via 3 rounds of min-label propagation (bounded
    connected components; LSH components are bucket cliques, diameter
    tiny). Iterative DataFrame algorithm with an EXACT oracle: the
    DuckDB side unrolls the same three join+min rounds, and labels are
    integers, so the hash gate is bit-exact."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(minhash_bands_rowlocal(docs, n_hashes=8, band_size=2))
    return connected_components_bounded(pairs, iters=3, truncate=True)


# =========================================================================
# E2 — dedup APPLIED: the surviving corpus after near-dup removal
# =========================================================================
@register(
    "q_dedup_apply",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    + ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    + ", drops AS (SELECT v AS doc_id FROM l3 WHERE v <> label) "
    "SELECT d.doc_id, CAST(length(d.text) AS INT) AS n_chars FROM documents d "
    "LEFT JOIN drops x ON d.doc_id = x.doc_id WHERE x.doc_id IS NULL",
)
def q_dedup_apply(spark, sf_dir):
    """E2 applied: the dedup pipeline's OUTPUT corpus — every document
    except non-canonical members of a near-dup component (keep = min
    doc_id per component; docs in no component survive untouched).
    Signatures -> bucket pairs -> bounded components -> anti-join: the
    shape a 100 TB curation job materializes. The drop list broadcasts
    into a left-anti join; the corpus itself is never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(minhash_bands_rowlocal(docs, n_hashes=8, band_size=2))
    comp = connected_components_bounded(pairs, iters=3, truncate=True)
    drops = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", F.length("text").cast("int").alias("n_chars")
    )


@register(
    "q_dedup_simhash",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "h AS (SELECT doc_id, substr(md5(token), 1, 4) AS h4 FROM tok), "
    "bits AS (SELECT doc_id, j.j, "
    "  CAST(floor((strpos('0123456789abcdef', substr(h4, (j.j - 1) // 4 + 1, 1)) - 1) "
    "    / power(2, 3 - ((j.j - 1) % 4))) AS INT) % 2 AS bit "
    "  FROM h, (SELECT unnest(generate_series(1, 16)) AS j) j), "
    "votes AS (SELECT doc_id, j, sum(bit * 2 - 1) AS v FROM bits GROUP BY 1, 2) "
    "SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN power(2, 16 - j) ELSE 0 END) AS BIGINT) AS simhash "
    "FROM votes GROUP BY 1",
)
def q_dedup_simhash(spark, sf_dir):
    """E2: 16-bit SimHash — per-token md5 nibbles vote ±1 per bit
    position; sign vector packs into the fingerprint. Near-dups differ
    in few bits (compare via popcount(xor) downstream)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs)


# =========================================================================
# E2 — exact n-gram Jaccard on a probe set
# =========================================================================
@register(
    "q_dedup_ngram_jaccard",
    f"WITH {SHINGLES_SQL}, "
    "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter "
    "  FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "  GROUP BY 1, 2) "
    f"SELECT i.doc_a, i.doc_b, {rq_sql('i.inter / (sa.sz + sb.sz - i.inter)', 4)} AS jaccard "
    "FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id "
    "JOIN sizes sb ON i.doc_b = sb.doc_id "
    "WHERE i.inter / (sa.sz + sb.sz - i.inter) >= 0.2",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """E2 verify stage: exact shingle-set Jaccard — |A∩B| by equi-join
    on shingle, |A∪B| closed-form; pairs at >= 0.2 are the corpus's
    injected near-dups (~25 at sf0.01 — a non-trivial oracle). The
    whole 500-doc corpus probes here; at scale the left side is the
    MinHash candidate-pair set (q_dedup_minhash_pairs), never all
    documents."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, probe_pred=lambda c: c >= 0, min_jaccard=0.2)
    return pairs.select("doc_a", "doc_b", rq("jaccard", 4).alias("jaccard"))


# =========================================================================
# E3 — brute-force cosine top-k
# =========================================================================
@register(
    "q_similarity_topk",
    "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, v AS pv FROM base WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM sims) "
    f"SELECT probe_id, vec_id, {rq_sql('cosine', 4)} AS cosine, rank "
    "FROM ranked WHERE rank <= 5",
)
def q_similarity_topk(spark, sf_dir):
    """E3: brute-force cosine top-5 per probe (vec_id % 50 = 0) — the
    ANN correctness baseline. Probe set broadcasts; corpus scans once;
    per-probe top-k via row_number, ties → smallest vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5).select(
        "probe_id", "vec_id", rq("cosine", 4).alias("cosine"), "rank"
    )


# =========================================================================
# E3 — IVF-bucketed top-k (the scale path)
# =========================================================================
@register(
    "q_similarity_ivf",
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label, v AS pv FROM base WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine "
    "  FROM base b JOIN probes p ON b.label = p.label "
    "  WHERE b.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM sims) "
    f"SELECT probe_id, vec_id, {rq_sql('cosine', 4)} AS cosine, rank "
    "FROM ranked WHERE rank <= 5",
)
def q_similarity_ivf(spark, sf_dir):
    """E3: IVF-style ANN — candidates restricted to the probe's coarse
    cell (the pre-assigned `label` plays the quantizer-cell role). The
    equi-join on the cell id is what scales: 1/n_cells of the corpus
    shuffles per probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
    ).select("probe_id", "vec_id", rq("cosine", 4).alias("cosine"), "rank")


# =========================================================================
# E3 — IVF quantizer training (iterative k-means, unrolled in the
# oracle: the trainer is deterministic — TakeOrdered init, fixed
# iteration count — so DuckDB replays the exact same Lloyd's rounds)
# =========================================================================
def _KMEANS_SQL(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    train_where: str = "TRUE",
    assign_where: str = "TRUE",
) -> str:
    """Unrolled Lloyd's k-means as DuckDB CTEs, mirroring
    ``kmeans_ivf_centroids`` exactly: init = the k smallest vec_ids
    (buckets 0..k-1 in id order), assignment = argmin squared distance
    with ties to the lowest bucket, update = per-(bucket, dim)
    elementwise mean, ``iters`` rounds, then one final full-corpus
    assign (`afin`). Ends WITHOUT a trailing comma; callers append
    their own CTEs / SELECT.

    The exact mirror holds ONLY for the literal-expression assign path
    (k <= ``similarity.LITERAL_ASSIGN_MAX_K``): above that,
    ``assign_buckets`` switches to the Arrow matmul kernel, whose
    distance rounding differs from the sequential fold on ulp-level
    near-ties — registering an oracle for a large-k query would gate on
    luck. Guarded here so the mismatch is impossible to register."""
    from mhw3d_detection_spark.operators.similarity import (
        LITERAL_ASSIGN_MAX_K,
    )

    if k > LITERAL_ASSIGN_MAX_K:
        raise ValueError(
            f"_KMEANS_SQL mirrors the literal assign only (k <= "
            f"{LITERAL_ASSIGN_MAX_K}); k={k} would run the Arrow kernel "
            "on the Spark side, which is not bit-exact against this SQL"
        )

    def d2(c_alias: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (b.v[i] - {c_alias}.c[i]) * (b.v[i] - {c_alias}.c[i])))"
        )

    def assign_cte(name: str, cents: str, src: str = "btrain") -> str:
        return (
            f"{name} AS (SELECT vec_id, v, bucket FROM ("
            f"SELECT b.vec_id, b.v, c.bucket, "
            f"row_number() OVER (PARTITION BY b.vec_id "
            f"ORDER BY {d2('c')} ASC, c.bucket ASC) AS rn "
            f"FROM {src} b CROSS JOIN {cents} c) WHERE rn = 1)"
        )

    # train_where restricts the TRAINING corpus (index-delta rows
    # train on the existing snapshot only); assign_where restricts the
    # final afin assignment domain. Defaults (TRUE) reproduce the
    # historical full-corpus behavior exactly.
    ctes = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"btrain AS (SELECT * FROM base WHERE {train_where})",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) "
        f"AS bucket, v AS c FROM "
        f"(SELECT vec_id, v FROM btrain ORDER BY vec_id LIMIT {k}))",
    ]
    for it in range(1, iters + 1):
        ctes.append(assign_cte(f"a{it}", f"c{it - 1}"))
        # centroid means quantized per round (rq d=6) — mirrors the
        # trainer's _q6: summation-order bit drift between engines must
        # not reach the exact assignment comparison
        ctes.append(
            f"c{it} AS (SELECT bucket, list(m ORDER BY i) AS c FROM ("
            f"SELECT bucket, i, {rq_sql('avg(v[i])', 6)} AS m FROM a{it} "
            f"CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) "
            f"GROUP BY bucket, i) GROUP BY bucket)"
        )
    if assign_where == "TRUE":
        ctes.append(assign_cte("afin", f"c{iters}", src="base"))
    else:
        ctes.append(
            f"bassign AS (SELECT * FROM base WHERE {assign_where})"
        )
        ctes.append(assign_cte("afin", f"c{iters}", src="bassign"))
    return "WITH " + ", ".join(ctes)


@register(
    "q_similarity_ivf_train",
    _KMEANS_SQL()
    + " SELECT bucket, count(*) AS n_vectors FROM afin GROUP BY bucket",
)
def q_similarity_ivf_train(spark, sf_dir):
    """E3 training half: Lloyd's k-means (deterministic init from the k
    smallest ids, 3 iterations) produces the coarse-cell assignment the
    IVF search path buckets on. The trainer runs eagerly (per-iteration
    centroid collect — k x dim doubles to the driver) and the oracle
    unrolls the identical iterations in SQL, so the bucket VALUES are
    hash-checked, not just row counts."""
    from mhw3d_detection_spark.operators.similarity import kmeans_ivf_train

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_ivf_train(emb, k=8, iters=3)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# =========================================================================
# E2/E3 — embedding-cosine near-dup pairs
# =========================================================================
@register(
    "q_dedup_embedding",
    "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "probes AS (SELECT vec_id AS doc_a, v AS va FROM base WHERE vec_id % 50 = 0) "
    f"SELECT p.doc_a, b.vec_id AS doc_b, {rq_sql('list_cosine_similarity(b.v, p.va)', 4)} AS cosine "
    "FROM base b, probes p WHERE p.doc_a < b.vec_id "
    "AND list_cosine_similarity(b.v, p.va) >= 0.2",
)
def q_dedup_embedding(spark, sf_dir):
    """E2: near-dup by embedding cosine >= τ for a probe set — the
    semantic-dedup primitive (probe side becomes an LSH bucket join at
    scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(
        emb, probe_pred=lambda c: c % 50 == 0, threshold=0.2
    )
    return pairs.select("doc_a", "doc_b", rq("cosine", 4).alias("cosine"))


# =========================================================================
# E2/E3 — embedding near-dup via random-hyperplane LSH (the bucketed
# 100 TB path; no probe bound anywhere)
# =========================================================================
def _RHP_SQL() -> str:
    from mhw3d_detection_spark.operators.similarity import rhp_signs

    n_bits, band_size, dim = 24, 6, 64
    signs = rhp_signs(n_bits, dim)
    bit_cols = ", ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(w) for w in signs[j])
        + f"]) >= 0.0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(n_bits)
    )
    n_bands = n_bits // band_size
    sig_case = " ".join(
        f"WHEN {b} THEN "
        + " + ".join(
            f"b{b * band_size + j} * {1 << (band_size - 1 - j)}"
            for j in range(band_size)
        )
        for b in range(n_bands)
    )
    return (
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"bits AS (SELECT vec_id, v, {bit_cols} FROM base), "
        "sig AS (SELECT vec_id, v, g.band_id, "
        f"CAST(CASE g.band_id {sig_case} END AS INT) AS band_sig "
        f"FROM bits, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_id) g), "
        "cand AS (SELECT DISTINCT a.vec_id AS doc_a, b2.vec_id AS doc_b "
        "  FROM sig a JOIN sig b2 ON a.band_id = b2.band_id AND a.band_sig = b2.band_sig "
        "  WHERE a.vec_id < b2.vec_id)"
    )


@register(
    "q_dedup_embedding_lsh",
    f"WITH {_RHP_SQL()} "
    f"SELECT c.doc_a, c.doc_b, {rq_sql('list_cosine_similarity(x.v, y.v)', 4)} AS cosine "
    "FROM cand c JOIN base x ON c.doc_a = x.vec_id JOIN base y ON c.doc_b = y.vec_id "
    "WHERE list_cosine_similarity(x.v, y.v) >= 0.2",
)
def q_dedup_embedding_lsh(spark, sf_dir):
    """E2 at scale: sign-LSH (random hyperplanes, Charikar 2002) banded
    4x6 over 24 deterministic md5-derived hyperplanes; candidates are
    bucket collisions (equi-join on (band, sign-pattern) — never
    all-pairs), verified by exact cosine >= 0.2. The identical ±1
    matrix is inlined in the DuckDB oracle, so signatures, candidates
    and survivors are all hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_lsh_pairs(emb, threshold=0.2, n_bits=24, band_size=6)
    return pairs.select("doc_a", "doc_b", rq("cosine", 4).alias("cosine"))


# =========================================================================
# E4 — token frequencies
# =========================================================================
@register(
    "q_text_tokens",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents) "
    "SELECT token, count(*) AS n, count(DISTINCT doc_id) AS df "
    "FROM tok GROUP BY 1",
)
def q_text_tokens(spark, sf_dir):
    """E4: corpus term/document frequencies — explode + two-level hash
    aggregate (partial map-side combine keeps the shuffle small)."""
    docs = load_table(spark, sf_dir, "documents")
    return tokenize(docs).groupBy("token").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("df"),
    )


# =========================================================================
# E4 — per-doc token counts
# =========================================================================
@register(
    "q_text_token_count",
    "SELECT doc_id, CAST(len(" + TOKENS_SQL + ") AS INT) AS n_tokens, "
    "CAST(length(text) AS INT) AS n_chars FROM documents",
)
def q_text_token_count(spark, sf_dir):
    """E4: per-doc token + char counts (whitespace/regex tokenizer) —
    the basic length signal for quality filtering."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0))
        .cast("int")
        .alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    )


# =========================================================================
# E4 — TF-IDF scoring
# =========================================================================
@register(
    "q_text_tfidf",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2), "
    "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1), "
    "n AS (SELECT count(*) AS n_docs FROM documents) "
    "SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf, "
    "CAST(df.df AS BIGINT) AS df, "
    f"{rq_sql('tf.tf * ln((1.0 + n.n_docs) / (1.0 + df.df))', 4)} AS tfidf "
    "FROM tf JOIN df ON tf.token = df.token CROSS JOIN n "
    "WHERE tf.doc_id < 50",
)
def q_text_tfidf(spark, sf_dir):
    """E4: smoothed TF-IDF — tf * ln((1+N)/(1+df)) per (doc, token).
    Two hash aggregates (term freq per doc, doc freq per token) and a
    broadcast join of the token-level df dim onto the per-doc rows; the
    corpus size is a scalar broadcast. Output bounded to doc_id < 50
    to keep the oracle compact."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokenize(docs)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    out = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))  # scalar corpus size, stays lazy
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.lit(1.0) + F.col("__n_docs")) / (F.lit(1.0) + F.col("df"))),
        )
        .filter(F.col("doc_id") < 50)
    )
    return out.select(
        "doc_id", "token", "tf", "df", rq("tfidf", 4).alias("tfidf")
    )


# =========================================================================
# E1+E4 — composite training-data prep: quality filter -> exact dedup
# -> language histogram (the end-to-end curation shape)
# =========================================================================
@register(
    "q_data_prep_pipeline",
    "WITH d AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, text, toks, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio FROM d), "
    "q AS (SELECT *, 0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
    "  + 0.2 * least(n_stop / 5.0, 1.0) AS quality FROM s), "
    "kept AS (SELECT * FROM q WHERE quality >= 0.5), "
    "dedup AS (SELECT min(doc_id) AS doc_id, any_value(toks) AS toks FROM kept GROUP BY text), "
    "tok AS (SELECT doc_id, unnest(toks) AS token FROM dedup), "
    f"c AS (SELECT doc_id, {_LANG_SQL_COUNTS} FROM tok GROUP BY 1), "
    f"lp AS (SELECT doc_id, {_LANG_SQL_PRED} AS lang_pred FROM c) "
    "SELECT lang_pred, count(*) AS n_docs FROM lp GROUP BY 1",
)
def q_data_prep_pipeline(spark, sf_dir):
    """E1+E4 fused: the canonical curation pipeline — quality-score
    filter (>= 0.5), exact dedup of the survivors (min doc_id per text),
    language-ID histogram of the deduped set. Every stage is the same
    operator the standalone queries use; the composition stays three
    hash aggregates + narrow projections (no window, no all-pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = (
        text_stats(docs)
        .filter(F.col("quality_score") >= 0.5)
        .join(docs, "doc_id")
        .select("doc_id", "text")
    )
    survivors = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    langs = language_id(survivors.select("doc_id", "text"))
    return langs.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


# =========================================================================
# E3 — trained-IVF search: quantizer training feeding the bucketed
# search (oracle replays the unrolled trainer, then the IVF search
# against the trained cells)
# =========================================================================
@register(
    "q_similarity_ivf_trained",
    _KMEANS_SQL()
    + ", probes AS (SELECT vec_id AS probe_id, bucket, v AS pv FROM afin "
    "WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, t.vec_id, "
    "  list_cosine_similarity(t.v, p.pv) AS cosine "
    "  FROM afin t JOIN probes p ON t.bucket = p.bucket "
    "  WHERE t.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM sims) "
    f"SELECT probe_id, vec_id, {rq_sql('cosine', 4)} AS cosine, rank "
    "FROM ranked WHERE rank <= 5",
)
def q_similarity_ivf_trained(spark, sf_dir):
    """E3 end-to-end: Lloyd's k-means trains the coarse quantizer, the
    corpus is tagged by the NARROW literal-argmin assign (no join — the
    trained centroids are driver-side literals), and the IVF search
    runs against the TRAINED cells instead of the pre-assigned labels —
    train -> assign -> bucket-join search, the full ANN shape. The
    oracle unrolls the identical Lloyd's rounds in SQL, so the top-k
    VALUES are hash-checked end to end."""
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        kmeans_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_ivf_centroids(emb, k=8, iters=3)
    tagged = assign_buckets(emb, cents).select("vec_id", "embedding", "bucket")
    return cosine_topk(
        tagged, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="bucket"
    ).select("probe_id", "vec_id", rq("cosine", 4).alias("cosine"), "rank")


# =========================================================================
# E2+E3 — SemDeDup: semantic dedup via trained clusters (Abbas et al.
# 2023) — k-means buckets bound the quadratic term, within-cluster
# cosine pairs form the dup graph, min-id per component survives
# =========================================================================
@register(
    "q_semantic_dedup",
    _KMEANS_SQL()
    + ", e0 AS (SELECT a.vec_id AS u, b2.vec_id AS v "
    "  FROM afin a JOIN afin b2 ON a.bucket = b2.bucket "
    "  WHERE a.vec_id < b2.vec_id "
    # zero-norm guard mirrors the Spark side (bucket_near_dup_pairs
    # filters na>0 AND nb>0): a degenerate zero vector would make
    # DuckDB's cosine NaN, which its total order compares HIGH
    "  AND list_inner_product(a.v, a.v) > 0 "
    "  AND list_inner_product(b2.v, b2.v) > 0 "
    "  AND list_cosine_similarity(a.v, b2.v) >= 0.35), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    + ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    + ", drops AS (SELECT v AS vec_id FROM l3 WHERE v <> label) "
    "SELECT t.vec_id, t.bucket FROM afin t "
    "LEFT JOIN drops d ON t.vec_id = d.vec_id WHERE d.vec_id IS NULL",
)
def q_semantic_dedup(spark, sf_dir):
    """E2+E3 composed: SemDeDup (Abbas et al. 2023) — the trained
    k-means quantizer clusters the embedding space, near-dup candidates
    are WITHIN-cluster pairs only (the cluster count k is the knob that
    keeps the quadratic term local — never corpus-wide all-pairs),
    cosine >= 0.35 pairs form the duplicate graph, bounded min-label
    propagation groups them, and the min-id member of each group
    survives (~23% of the sf0.01 corpus dedups away — a non-trivial
    oracle). Oracle: the unrolled Lloyd's rounds (exact cross-engine
    assignments via quantized centroids) + the same 3 propagation
    rounds in SQL — survivors are hash-checked end to end."""
    from mhw3d_detection_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, iters=3, threshold=0.35, cc_iters=3)


# =========================================================================
# E4 — quality scoring
# =========================================================================
@register(
    "q_text_quality",
    "WITH d AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio, "
    "  coalesce(list_sum(list_transform(toks, x -> length(x))), 0) / greatest(len(toks), 1) AS mean_token_len "
    "  FROM d) "
    "SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, "
    f"{rq_sql('punct_ratio', 4)} AS punct_ratio, "
    f"{rq_sql('n_stop / greatest(n_tokens, 1)', 4)} AS stop_ratio, "
    f"{rq_sql('mean_token_len', 4)} AS mean_token_len, "
    + rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    + " AS quality_score FROM s",
)
def q_text_quality(spark, sf_dir):
    """E4: composite quality score from length, punctuation ratio and
    (distinct) stopword hits — all closed-form array expressions, no
    explode on the hot path."""
    docs = load_table(spark, sf_dir, "documents")
    st = text_stats(docs)
    return st.select(
        "doc_id",
        "n_tokens",
        rq("punct_ratio", 4).alias("punct_ratio"),
        rq("stop_ratio", 4).alias("stop_ratio"),
        rq("mean_token_len", 4).alias("mean_token_len"),
        rq("quality_score", 4).alias("quality_score"),
    )


# =========================================================================
# E4 — model-based quality classifier (literal-weight logistic)
# =========================================================================
def _QLR_SQL() -> str:
    """DuckDB mirror of ``operators.textops.quality_classifier``: the
    same literal weights applied to the same feature expressions in the
    same left-associative order, so the logit is bit-identical and the
    keep decision (logit >= 0) needs no quantization."""
    return (
        "WITH d AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
        "s AS (SELECT doc_id, " + QFEATURES_SQL + " FROM d), "
        f"z AS (SELECT doc_id, {QLOGIT_SQL()} AS logit FROM s) "
        f"SELECT doc_id, {rq_sql('logit', 4)} AS quality_logit, "
        f"{rq_sql('1.0 / (1.0 + exp(-logit))', 4)} AS quality_prob, "
        "CAST(CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS INT) AS keep FROM z"
    )


@register("q_quality_classifier", _QLR_SQL())
def q_quality_classifier(spark, sf_dir):
    """E4: model-based quality scoring — a logistic regression with
    literal (offline-trained-shaped) weights over the text_stats
    features; the fastText/CCNet filter stage. Scoring is a pure narrow
    projection (weights are plan literals), so the pass costs one scan
    at any corpus size. The keep decision thresholds the exact-IEEE
    logit, not the transcendental sigmoid, so it is bit-stable across
    engines."""
    from mhw3d_detection_spark.operators.textops import quality_classifier

    docs = load_table(spark, sf_dir, "documents")
    out = quality_classifier(docs)
    return out.select(
        "doc_id",
        rq("quality_logit", 4).alias("quality_logit"),
        rq("quality_prob", 4).alias("quality_prob"),
        "keep",
    )


# =========================================================================
# E7b — mergeable HLL cardinality sketch (per-source + union)
# =========================================================================
def _HLL_SQL() -> str:
    """DuckDB mirror of ``operators.sketches.token_cardinality``: the
    identical 48-bit md5 hash, register split, unrolled-CASE bit-length
    (no float log2), exact power-of-two register sum (bit-exact in any
    addition order — partial sums fit the 53-bit mantissa), and the
    same literal alpha*m^2 / linear-counting branch."""
    from mhw3d_detection_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_WBITS,
        bitlen_sql,
    )

    rho = f"({HLL_WBITS + 1} - {bitlen_sql(f'x // {HLL_M}', HLL_WBITS)})"
    a_mm = HLL_ALPHA * HLL_M * HLL_M
    return (
        "WITH tok AS (SELECT source, unnest(" + TOKENS_SQL + ") AS token "
        "  FROM documents), "
        "h AS (SELECT source, ('0x' || substr(md5(token), 1, 12))::BIGINT AS x "
        "  FROM tok), "
        f"r AS (SELECT source, x % {HLL_M} AS reg, max({rho}) AS rho "
        "  FROM h GROUP BY 1, 2), "
        "ru AS (SELECT '__ALL__' AS source, reg, max(rho) AS rho "
        "  FROM r GROUP BY 2), "
        "ra AS (SELECT * FROM r UNION ALL SELECT * FROM ru), "
        "agg AS (SELECT source, count(*) AS nreg, "
        "  sum(1.0 / (1::BIGINT << rho)) AS s_present FROM ra GROUP BY 1), "
        f"e AS (SELECT source, {a_mm!r} / (s_present + ({HLL_M} - nreg)) AS raw, "
        f"  {HLL_M} - nreg AS v FROM agg), "
        f"est AS (SELECT source, CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0 "
        f"  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v) ELSE raw END AS ed "
        "  FROM e), "
        "ex AS (SELECT source, count(DISTINCT token) AS exact_distinct "
        "  FROM tok GROUP BY 1 "
        "  UNION ALL SELECT '__ALL__', count(DISTINCT token) FROM tok) "
        f"SELECT est.source, {rq_sql('ed', 4)} AS est_distinct, "
        "exact_distinct, "
        f"{rq_sql('(ed / exact_distinct - 1.0) * 100.0', 4)} AS rel_err_pct "
        "FROM est JOIN ex ON est.source = ex.source"
    )


@register("q_token_cardinality", _HLL_SQL())
def q_token_cardinality(spark, sf_dir):
    """E7b: distinct-token cardinality per source and for the union of
    sources, from mergeable HyperLogLog registers (Flajolet et al.
    2007). Per-source state is a fixed 1024-row register table no
    matter the corpus size, and the union row is a register-wise max —
    sketch-sized work, never a second corpus scan. The exact distinct
    count rides along as the error reference (affordable at test SF;
    at 100 TB you ship only the sketch). Every intermediate is integer
    or an exact power of two, so the raw estimate is bit-identical
    cross-engine; only the small-range ln branch is transcendental and
    is dyadically rounded like every float surface."""
    from mhw3d_detection_spark.operators.sketches import token_cardinality

    docs = load_table(spark, sf_dir, "documents")
    out = token_cardinality(docs)
    return out.select(
        "source",
        rq("est_distinct", 4).alias("est_distinct"),
        "exact_distinct",
        rq("rel_err_pct", 4).alias("rel_err_pct"),
    )


# =========================================================================
# E7c — Count-Min token-frequency sketch
# =========================================================================
def _CM_SQL() -> str:
    """DuckDB mirror of ``operators.sketches.token_frequency_sketch``:
    same 48-bit hash, same linear family folded to CM_W, integer
    counters throughout — every column exact, no rounding needed."""
    from mhw3d_detection_spark.operators.sketches import CM_D, CM_W

    def col_case(alias: str) -> str:
        whens = " ".join(
            f"WHEN {j} THEN (({MINHASH_A[j]} * x + {MINHASH_B[j]}) "
            f"% {MINHASH_M}) % {CM_W}"
            for j in range(CM_D)
        )
        return f"(CASE j.j {whens} END) AS {alias}"

    return (
        "WITH tok AS (SELECT unnest(" + TOKENS_SQL + ") AS token FROM documents), "
        "hx AS (SELECT token, ('0x' || substr(md5(token), 1, 12))::BIGINT AS x "
        "  FROM tok), "
        f"b AS (SELECT j.j, {col_case('col')} FROM hx, "
        f"  (SELECT unnest(generate_series(0, {CM_D - 1})) AS j) j), "
        "sk AS (SELECT j, col, count(*) AS cnt FROM b GROUP BY 1, 2), "
        "ex AS (SELECT token, count(*) AS exact_count FROM tok GROUP BY 1), "
        "pr AS (SELECT token, exact_count FROM (SELECT token, exact_count, "
        "  row_number() OVER (ORDER BY exact_count DESC, token) AS rn FROM ex) "
        "  WHERE rn <= 20), "
        "px AS (SELECT token, exact_count, "
        "  ('0x' || substr(md5(token), 1, 12))::BIGINT AS x FROM pr), "
        f"pl AS (SELECT token, exact_count, j.j AS j, {col_case('col')} FROM px, "
        f"  (SELECT unnest(generate_series(0, {CM_D - 1})) AS j) j), "
        "est AS (SELECT token, exact_count, min(coalesce(sk.cnt, 0)) AS est_count "
        "  FROM pl LEFT JOIN sk ON pl.j = sk.j AND pl.col = sk.col GROUP BY 1, 2) "
        "SELECT token, est_count, exact_count, "
        "est_count - exact_count AS over_count FROM est"
    )


@register("q_token_countmin", _CM_SQL())
def q_token_countmin(spark, sf_dir):
    """E7c: Count-Min frequency estimates (Cormode & Muthukrishnan
    2005) for the corpus's top-20 tokens (deterministic selection:
    exact count desc, token asc). The sketch is CM_D × CM_W counters —
    fixed-size mergeable-by-sum state, the frequency dual of the HLL
    registers — and only ever OVER-counts, so ``over_count >= 0`` by
    construction. Integer arithmetic end to end: the oracle matches
    bit-for-bit with no rounding."""
    from mhw3d_detection_spark.operators.sketches import (
        token_frequency_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_frequency_sketch(docs, top_n=20)


# =========================================================================
# E7d — mergeable histogram quantile sketch (doc-length profile)
# =========================================================================
def _HISTQ_SQL() -> str:
    """DuckDB mirror of ``operators.sketches.doc_length_quantiles``:
    identical fixed grid (same IEEE subtract/divide/floor for the bin
    index), identical cumulative + interpolation arithmetic; probe
    quantiles cast to DOUBLE so the q column types agree."""
    from mhw3d_detection_spark.operators.sketches import _DOCLEN_GRID

    lo, hi, n_bins, qs = _DOCLEN_GRID
    width = (hi - lo) / n_bins
    qlist = ", ".join(f"{float(q)!r}::DOUBLE" for q in qs)
    return (
        "WITH h AS (SELECT source, least(greatest(CAST(floor("
        f"  (CAST(n_chars AS DOUBLE) - {lo!r}) / {width!r}) AS BIGINT), 0), "
        f"  {n_bins - 1}) AS bin FROM documents), "
        "hist AS (SELECT source, bin, count(*) AS cnt FROM h GROUP BY 1, 2), "
        "cum AS (SELECT source, bin, cnt, "
        "  sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum FROM hist), "
        "tot AS (SELECT source, sum(cnt) AS n FROM hist GROUP BY 1), "
        "cand AS (SELECT c.source, c.bin, c.cnt, c.cum, c.cum - c.cnt AS prev, "
        "  q.q, q.q * t.n AS target FROM cum c JOIN tot t USING (source), "
        f"  (SELECT unnest([{qlist}]) AS q) q), "
        "fb AS (SELECT source, q, min(bin) AS bin FROM cand "
        "  WHERE cum >= target GROUP BY 1, 2), "
        f"est AS (SELECT f.source, f.q, f.bin, {lo!r} + f.bin * {width!r} "
        f"  + {width!r} * (c.target - c.prev) / c.cnt AS est "
        "  FROM fb f JOIN cand c ON f.source = c.source AND f.q = c.q "
        "  AND f.bin = c.bin) "
        # top bin only: lo=0 is a hard domain floor for lengths, so
        # bin 0 can never contain clamped-from-below values
        f"SELECT source, q, {rq_sql('est', 4)} AS est_chars, "
        f"CAST(CASE WHEN bin = {n_bins - 1} THEN 1 ELSE 0 END "
        "  AS INT) AS clipped FROM est"
    )


@register("q_length_quantile_sketch", _HISTQ_SQL())
def q_length_quantile_sketch(spark, sf_dir):
    """E7d: per-source doc-length quantiles (p50/p90/p99) from a
    mergeable fixed-grid histogram — the distribution dual of the
    HLL/Count-Min sketches (128 counters per source, merged by SUM
    across corpus parts, error ≤ one bin width). Unlike a t-digest the
    grid is fixed, so merges are exact and the estimate replays
    bit-identically cross-engine (one IEEE subtract/divide/floor per
    row; the interpolation is rational arithmetic over exact integer
    counts)."""
    from mhw3d_detection_spark.operators.sketches import (
        _DOCLEN_GRID,
        doc_length_quantiles,
    )

    lo, hi, n_bins, qs = _DOCLEN_GRID
    docs = load_table(spark, sf_dir, "documents")
    out = doc_length_quantiles(docs, lo=lo, hi=hi, n_bins=n_bins, qs=qs)
    return out.select(
        "source", "q", rq("est_chars", 4).alias("est_chars"), "clipped"
    )


# =========================================================================
# E4 — language ID
# =========================================================================
@register(
    "q_text_langid",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    f"c AS (SELECT doc_id, {_LANG_SQL_COUNTS} FROM tok GROUP BY 1) "
    "SELECT doc_id, CAST(n_en AS BIGINT) AS n_en, CAST(n_de AS BIGINT) AS n_de, "
    "CAST(n_fr AS BIGINT) AS n_fr, CAST(n_es AS BIGINT) AS n_es, "
    f"{_LANG_SQL_PRED} AS lang_pred FROM c",
)
def q_text_langid(spark, sf_dir):
    """E4: stopword-vote language ID with a fixed tie priority
    (en > de > fr > es, 'und' when no hits) — a deterministic n-gram
    heuristic; swap wordlists for real fastText-style models offline."""
    docs = load_table(spark, sf_dir, "documents")
    return language_id(docs)


# =========================================================================
# E4 — document fingerprints
# =========================================================================
@register(
    "q_text_fingerprint",
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
    + TOKENS_SQL
    + ")), ' ')) AS fingerprint FROM documents",
)
def q_text_fingerprint(spark, sf_dir):
    """E4: md5 of the sorted distinct token set — an order-insensitive
    content fingerprint (bag-of-words canonical form)."""
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs)


# =========================================================================
# E4 — unigram LM log-probability (the perplexity-filter shape)
# =========================================================================
@register(
    "q_text_logprob",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "uni AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1), "
    "tot AS (SELECT sum(tf) AS n FROM uni), "
    "scored AS (SELECT t.doc_id, ln(u.tf / (1.0 * tot.n)) AS lp "
    "  FROM tok t JOIN uni u ON t.token = u.token CROSS JOIN tot) "
    f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, {rq_sql('avg(lp)', 4)} AS mean_logprob "
    "FROM scored GROUP BY 1",
)
def q_text_logprob(spark, sf_dir):
    """E4: mean unigram log-probability per document under the corpus's
    own unigram LM — the shape of a perplexity quality filter (CCNet
    style: score against an LM, drop the tail). The unigram table is a
    broadcast dim; the corpus total is a scalar broadcast; scoring is a
    narrow join + one aggregate. Swap the self-trained unigram table
    for a reference-corpus LM at production scale — the plan is
    identical."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokenize(docs)
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    tot = uni.agg(F.sum("tf").cast("double").alias("__n"))
    scored = (
        tok.join(F.broadcast(uni), "token")
        .crossJoin(F.broadcast(tot))
        .withColumn("lp", F.log(F.col("tf") / F.col("__n")))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        rq(F.avg("lp"), 4).alias("mean_logprob"),
    )


# =========================================================================
# E4 — bigram LM with unigram interpolation (the KenLM-filter shape)
# =========================================================================
@register(
    "q_text_logprob_bigram",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "bgp AS (SELECT doc_id, toks, "
    "  unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM d), "
    "bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM bgp), "
    "tok AS (SELECT unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "uni AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1), "
    "tot AS (SELECT sum(tf) AS n FROM uni), "
    "bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2), "
    "hc AS (SELECT w1, sum(c2) AS c1 FROM bc GROUP BY 1), "
    "scored AS (SELECT g.doc_id, "
    "  ln(0.7 * bc.c2 / hc.c1 + 0.3 * u.tf / (1.0 * tot.n)) AS lp "
    "  FROM bg g JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2 "
    "  JOIN hc ON g.w1 = hc.w1 JOIN uni u ON g.w2 = u.token CROSS JOIN tot) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
    f"{rq_sql('avg(lp)', 4)} AS mean_logprob_bigram "
    "FROM scored GROUP BY 1",
)
def q_text_logprob_bigram(spark, sf_dir):
    """E4: mean interpolated-bigram log-probability per document —
    P(w2|w1) = 0.7*c(w1 w2)/c(w1 ·) + 0.3*P_uni(w2), the shape of a
    KenLM-style perplexity filter one order up from q_text_logprob.
    Bigrams come from direct array slicing (arrays_zip of the token
    array against its own shift — no window pass, mirroring the
    shingle derivation). The head/unigram count tables are
    vocabulary-sized broadcast dims; the bigram-type table grows with
    the corpus, so its join is left to AQE (broadcast when small,
    shuffle on the bigram key otherwise). Docs with <2 tokens have no
    bigrams and drop out on both engines."""
    from mhw3d_detection_spark.operators.textops import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_bg = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n_bg), F.slice("toks", 2, n_bg)
                )
            ).alias("z"),
        )
        .select("doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    )
    tok = tokenize(docs)
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    tot = uni.agg(F.sum("tf").cast("double").alias("__n"))
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    hc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        # bc (distinct bigram TYPES) grows with the corpus, unlike the
        # genuinely vocab-sized hc/uni dims — leave its join strategy
        # to AQE rather than forcing a broadcast that would OOM at scale
        bg.join(bc, ["w1", "w2"])
        .join(F.broadcast(hc), "w1")
        .join(F.broadcast(uni), F.col("w2") == F.col("token"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "lp",
            F.log(
                0.7 * F.col("c2") / F.col("c1")
                + 0.3 * F.col("tf") / F.col("__n")
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        rq(F.avg("lp"), 4).alias("mean_logprob_bigram"),
    )


# =========================================================================
# E6 — reproducible sampling (content-keyed + stratified quotas)
# =========================================================================
@register(
    "q_sample_deterministic",
    "SELECT doc_id, CAST(length(text) AS INT) AS n_chars FROM documents "
    "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT "
    f"/ {float(1 << 48)!r} < 0.3",
)
def q_sample_deterministic(spark, sf_dir):
    """E6: content-keyed 30% sample — keep iff the md5-derived uniform
    of doc_id < rate. Unlike seeded per-partition RNG sampling, the
    decision is a pure function of the key: stable across reruns,
    repartitions and engines (which is WHY the DuckDB oracle can check
    it row-for-row). A narrow filter — pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, rate=0.3).select(
        "doc_id", F.length("text").cast("int").alias("n_chars")
    )


@register(
    "q_sample_stratified",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    f"c AS (SELECT doc_id, {_LANG_SQL_COUNTS} FROM tok GROUP BY 1), "
    f"lp AS (SELECT doc_id, {_LANG_SQL_PRED} AS lang_pred FROM c), "
    "rk AS (SELECT doc_id, lang_pred, row_number() OVER (PARTITION BY lang_pred "
    "  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM lp) "
    "SELECT doc_id, lang_pred FROM rk WHERE rk <= 20",
)
def q_sample_stratified(spark, sf_dir):
    """E6: stratified quota — at most 20 docs per predicted language,
    chosen by the deterministic md5 order of doc_id (stable selection,
    balanced corpus). The window partitions BY GROUP, so the plan is
    parallel across strata — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    langs = language_id(docs).select("doc_id", "lang_pred")
    return stratified_quota(langs, quota=20).select("doc_id", "lang_pred")


# =========================================================================
# E5 — multimodal column plumbing (stubbed decode, real Arrow plumbing)
# =========================================================================
@register(
    "q_multimodal_meta",
    "SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, "
    "CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte, "
    "substr(md5(text), 1, 16) AS phash FROM documents",
)
def q_multimodal_meta(spark, sf_dir):
    """E5: binary media column → typed metadata via Arrow-batched
    mapInPandas. The codec is a deterministic STUB (no media libs in
    this env); the schema/batch plumbing and the oracle check are real."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(documents_as_media(docs))


# =========================================================================
# E5 / U3 — one-to-many frame sampling (UDTF shape), exact oracle
# =========================================================================
@register(
    "q_multimodal_frames",
    # the corpus is pure ASCII (checked: octet_length(encode(text)) ==
    # length(text) for every row), so VARCHAR chunking here equals the
    # stub's byte chunking and md5(varchar) equals md5(utf8-bytes)
    "WITH d AS (SELECT doc_id, text AS p FROM documents WHERE doc_id < 50), "
    "idx AS (SELECT doc_id, p, "
    "  unnest(generate_series(0, CAST(ceil(length(p) / 16.0) AS INT) - 1)) AS i "
    "  FROM d), "
    "f AS (SELECT doc_id, i, substring(p, i * 16 + 1, 16) AS frame_payload "
    "  FROM idx WHERE i % 4 = 0) "
    "SELECT doc_id, CAST(i AS INT) AS frame_idx, frame_payload, "
    "substr(md5(frame_payload), 1, 16) AS frame_hash FROM f",
)
def q_multimodal_frames(spark, sf_dir):
    """E5/U3: the one-to-many mapInPandas frame sampler — each media
    row expands to one row per sampled 'frame' (every 4th 16-byte
    chunk of the payload in the deterministic stub; pyav keyframes in
    production). The expansion is narrow (inside the scan partition);
    the stub's chunking/hashing is reproduced exactly in the DuckDB
    oracle, so the UDTF surface is hash-checked, not just pytested.
    Bounded to doc_id < 50 to keep the oracle compact; the binary frame
    is cast to string for the cross-engine compare (ASCII corpus)."""
    from mhw3d_detection_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    frames = sample_frames(documents_as_media(docs), every_n=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.col("frame_payload").cast("string").alias("frame_payload"),
        "frame_hash",
    )


# =========================================================================
# E4 — Gopher repetition signals (dup/top n-gram fractions)
# =========================================================================
@register(
    "q_text_repetition",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "g2 AS (SELECT doc_id, 2 AS n, toks[i] || ' ' || toks[i + 1] AS gram "
    "  FROM (SELECT doc_id, toks, "
    "        unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM d)), "
    "g3 AS (SELECT doc_id, 3 AS n, "
    "       toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram "
    "  FROM (SELECT doc_id, toks, "
    "        unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM d)), "
    "u AS (SELECT * FROM g2 UNION ALL SELECT * FROM g3), "
    "pg AS (SELECT doc_id, n, gram, count(*) AS c FROM u GROUP BY 1, 2, 3), "
    "pd AS (SELECT doc_id, "
    "  max(CASE WHEN n = 2 THEN c END) AS max2, "
    "  sum(CASE WHEN n = 2 THEN c END) AS tot2, "
    "  sum(CASE WHEN n = 3 AND c > 1 THEN c END) AS dup3, "
    "  sum(CASE WHEN n = 3 THEN c END) AS tot3 "
    "  FROM pg GROUP BY 1) "
    "SELECT doc_id, "
    f"{rq_sql('coalesce(max2, 0) / greatest(coalesce(tot2, 0), 1)', 4)} AS top_2gram_frac, "
    f"{rq_sql('coalesce(dup3, 0) / greatest(coalesce(tot3, 0), 1)', 4)} AS dup_3gram_frac "
    "FROM (SELECT doc_id FROM documents) docs LEFT JOIN pd USING (doc_id)",
)
def q_text_repetition(spark, sf_dir):
    """E4: Gopher-style repetition filters — fraction of the doc in its
    most frequent 2-gram + duplicate-3-gram occurrence fraction. One
    explode + two hash aggregates, keyed by doc_id throughout."""
    from mhw3d_detection_spark.operators.textops import ngram_repetition

    docs = load_table(spark, sf_dir, "documents")
    rep = ngram_repetition(docs)
    return rep.select(
        "doc_id",
        rq("top_2gram_frac", 4).alias("top_2gram_frac"),
        rq("dup_3gram_frac", 4).alias("dup_3gram_frac"),
    )


# =========================================================================
# E4 — Gopher quality rules (composite boolean filter)
# =========================================================================
_GOPHER_STOP = ", ".join(f"'{w}'" for w in
                         ("the", "and", "of", "to", "in", "is", "a", "for"))
@register(
    "q_gopher_rules",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, len(toks) AS n_tokens, "
    "  coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "    / greatest(len(toks), 1) AS mean_len, "
    "  len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) "
    "    / greatest(len(toks), 1) AS alpha_frac, "
    f"  len(list_intersect(toks, [{_GOPHER_STOP}])) AS n_stop FROM d) "
    "SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, "
    f"{rq_sql('mean_len', 4)} AS mean_token_len, "
    f"{rq_sql('alpha_frac', 4)} AS alpha_frac, "
    "CAST(n_stop AS INT) AS n_stop_hits, "
    "CAST(n_tokens BETWEEN 10 AND 1000 AS INT) AS flag_len, "
    "CAST(mean_len BETWEEN 2.0 AND 8.0 AS INT) AS flag_mean_len, "
    "CAST(alpha_frac >= 0.8 AS INT) AS flag_alpha, "
    "CAST(n_stop >= 2 AS INT) AS flag_stop, "
    "CAST((n_tokens BETWEEN 10 AND 1000) AND (mean_len BETWEEN 2.0 AND 8.0) "
    "  AND alpha_frac >= 0.8 AND n_stop >= 2 AS INT) AS pass_gopher FROM s",
)
def q_gopher_rules(spark, sf_dir):
    """E4: Gopher quality rules (Rae et al. 2021 §A1.1) — per-rule
    boolean flags + conjunction, all closed-form array expressions
    (no explode, no shuffle; the filter pushes to the scan)."""
    from mhw3d_detection_spark.operators.textops import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules(docs)
    return g.select(
        "doc_id",
        "n_tokens",
        rq("mean_token_len", 4).alias("mean_token_len"),
        rq("alpha_frac", 4).alias("alpha_frac"),
        "n_stop_hits",
        "flag_len",
        "flag_mean_len",
        "flag_alpha",
        "flag_stop",
        "pass_gopher",
    )


# =========================================================================
# E4 — PII scrubbing (typed placeholder masking + match counts)
# =========================================================================
@register(
    "q_pii_scrub",
    "SELECT c_custkey, "
    "regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS c_name_masked, "
    "CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS INT) AS n_pii "
    "FROM customer",
)
def q_pii_scrub(spark, sf_dir):
    """E4: PII scrub — digit runs (ids, account/phone fragments)
    replaced by a typed <NUM> placeholder, with a per-row match count
    for drop-high-PII filters. Pure projection: zero shuffles."""
    from mhw3d_detection_spark.operators.textops import pii_mask

    cust = load_table(spark, sf_dir, "customer")
    return pii_mask(cust, "c_name", "c_custkey")


# =========================================================================
# E4 — vocabulary coverage / OOV rate
# =========================================================================
@register(
    "q_text_vocab_oov",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "uni AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1), "
    "vocab AS (SELECT token FROM uni ORDER BY tf DESC, token LIMIT 20) "
    "SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens, "
    "CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS INT) AS n_oov, "
    + rq_sql(
        "sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / greatest(count(*), 1)",
        4,
    )
    + " AS oov_frac "
    "FROM tok t LEFT JOIN vocab v ON t.token = v.token GROUP BY 1",
)
def q_text_vocab_oov(spark, sf_dir):
    """E4: out-of-vocabulary rate vs the corpus's own top-20 token
    vocabulary. The vocab is orderBy(tf desc, token).limit(k) —
    TakeOrderedAndProject, never a global single-partition sort — and
    broadcasts into the probe join."""
    from mhw3d_detection_spark.operators.textops import vocab_oov

    docs = load_table(spark, sf_dir, "documents")
    v = vocab_oov(docs, vocab_size=20)
    return v.select(
        "doc_id", "n_tokens", "n_oov", rq("oov_frac", 4).alias("oov_frac")
    )


# =========================================================================
# E4 — sequence chunking (pre-packing for LLM training)
# =========================================================================
@register(
    "q_text_chunks",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, "
    "  unnest(generate_series(0, CAST(floor((len(toks) - 1) / 32.0) AS INT))) AS i "
    "  FROM d WHERE len(toks) > 0) "
    "SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
    "CAST(len(list_slice(toks, i * 32 + 1, i * 32 + 32)) AS INT) AS n_chunk_tokens, "
    "md5(array_to_string(list_slice(toks, i * 32 + 1, i * 32 + 32), ' ')) AS chunk_hash "
    "FROM c",
)
def q_text_chunks(spark, sf_dir):
    """E4/E6: fixed-size (32-token) sequence chunking — the pre-packing
    step of a training pipeline; emits a chunk content hash for
    chunk-level dedup. Pure array arithmetic, row-local explode, zero
    shuffles."""
    from mhw3d_detection_spark.operators.textops import chunk_tokens

    docs = load_table(spark, sf_dir, "documents")
    return chunk_tokens(docs, size=32)


# =========================================================================
# E6 — temperature-scaled mixture sampling
# =========================================================================
@register(
    "q_sample_temperature",
    "WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), "
    "m AS (SELECT min(n) AS mn FROM c), "
    "r AS (SELECT lang, pow(mn * 1.0 / n, 0.5) AS keep_rate FROM c CROSS JOIN m) "
    "SELECT d.doc_id, d.lang, "
    f"{rq_sql('keep_rate', 6)} AS keep_rate "
    "FROM documents d JOIN r USING (lang) "
    "WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT "
    f"/ {float(1 << 48)!r} < keep_rate",
)
def q_sample_temperature(spark, sf_dir):
    """E6: temperature-scaled mixture sampling (alpha = 0.5): keep rate
    (min_n / n_g)^(1-alpha) per language flattens the skewed lang mix
    toward uniform; selection is content-keyed (md5 of doc_id) so the
    sample is reproducible across engines, reruns and layouts. Group
    counts are a broadcast dim; the filter is narrow."""
    from mhw3d_detection_spark.operators.textops import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    s = temperature_sample(docs, group_col="lang", alpha=0.5)
    return s.select("doc_id", "lang", rq("keep_rate", 6).alias("keep_rate"))


# =========================================================================
# E2b — benchmark-contamination screening (asymmetric containment)
# =========================================================================
@register(
    "q_contamination",
    "WITH " + SHINGLES_SQL + ", "
    "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "probe AS (SELECT doc_id AS probe_id, shingle FROM shd WHERE doc_id < 10), "
    "psz AS (SELECT probe_id, count(*) AS psz FROM probe GROUP BY 1), "
    "inter AS (SELECT p.probe_id, s.doc_id, count(*) AS n "
    "  FROM probe p JOIN shd s USING (shingle) "
    "  WHERE s.doc_id <> p.probe_id GROUP BY 1, 2) "
    "SELECT probe_id, doc_id, "
    f"{rq_sql('n * 1.0 / psz', 4)} AS containment "
    "FROM inter JOIN psz USING (probe_id) WHERE n * 1.0 / psz >= 0.05",
)
def q_contamination(spark, sf_dir):
    """E2b: eval-contamination screen — |probe ∩ doc| / |probe| shingle
    containment (Broder's containment, asymmetric: right when probes
    are short). Probe side = doc_id < 10; equi-join on shingle, no
    all-pairs. The planted near-dup surfaces at ~0.99."""
    from mhw3d_detection_spark.operators.textops import contamination_screen

    docs = load_table(spark, sf_dir, "documents")
    c = contamination_screen(
        docs, lambda d: d < 10, min_containment=0.05
    )
    return c.select(
        "probe_id", "doc_id", rq("containment", 4).alias("containment")
    )


# =========================================================================
# E2e — Bloom-filter decontamination pre-filter
# =========================================================================
def _BLOOM_SQL() -> str:
    """DuckDB mirror of ``operators.sketches.bloom_decontaminate``:
    identical hash family and bit positions, same distinct/threshold
    structure — integer and rational arithmetic only."""
    from mhw3d_detection_spark.operators.sketches import BLOOM_K, BLOOM_M

    # k disjoint 32-bit md5 segments mod m — mirrors
    # sketches._bloom_positions (independent bits per position; the
    # affine family's residues mod a power-of-two m degenerate)
    pos = ", ".join(
        f"('0x' || substr(h, {1 + 8 * j}, 8))::BIGINT % {BLOOM_M}"
        for j in range(BLOOM_K)
    )
    return (
        "WITH " + SHINGLES_SQL + ", "
        "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
        "hx AS (SELECT doc_id, shingle, md5(shingle) AS h FROM shd), "
        f"pb AS (SELECT DISTINCT unnest([{pos}]) AS bit FROM hx WHERE doc_id < 10), "
        f"cp AS (SELECT doc_id, shingle, unnest([{pos}]) AS bit FROM hx "
        "  WHERE doc_id >= 10), "
        "mm AS (SELECT c.doc_id, c.shingle, "
        "  CAST(CASE WHEN count(p.bit) = "
        f"  {BLOOM_K} THEN 1 ELSE 0 END AS INT) AS maybe_present "
        "  FROM cp c LEFT JOIN pb p ON c.bit = p.bit GROUP BY 1, 2), "
        "agg AS (SELECT doc_id, count(*) AS n_shingles, "
        "  sum(maybe_present) AS n_maybe_hits FROM mm GROUP BY 1) "
        "SELECT doc_id, n_shingles, n_maybe_hits, "
        f"{rq_sql('n_maybe_hits * 1.0 / n_shingles', 4)} AS hit_frac, "
        "CAST(CASE WHEN n_maybe_hits * 1.0 / n_shingles >= 0.5 THEN 1 ELSE 0 END "
        "  AS INT) AS flagged FROM agg"
    )


@register("q_decontaminate_bloom", _BLOOM_SQL())
def q_decontaminate_bloom(spark, sf_dir):
    """E2e: Bloom pre-filter for eval decontamination — the probe docs'
    (doc_id < 10, the q_contamination convention) distinct shingles set
    ≤ 4096 bits; every corpus doc is screened by the fraction of its
    shingles the Bloom may contain. No false negatives, so unflagged
    docs skip the exact containment join entirely; the Bloom is a
    fixed-size broadcast however large the eval set grows — the corpus
    never shuffles on the shingle key (the E2b join's cost). Mergeable
    by UNION across eval-set parts."""
    from mhw3d_detection_spark.operators.sketches import bloom_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    out = bloom_decontaminate(docs, lambda d: d < 10)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_maybe_hits",
        rq("hit_frac", 4).alias("hit_frac"),
        "flagged",
    )


# =========================================================================
# E-FLAGSHIP — the full curation funnel as one composed plan
# =========================================================================
def _CURATION_SQL(thr: float = 0.35, cc_iters: int = 3) -> str:
    """DuckDB mirror of ``plans.curation.curate_corpus``: the identical
    stage sequencing over identical per-stage arithmetic. Reuses the
    verified fragments — the quality-logit expressions (of _QLR_SQL),
    SHINGLES/MINHASH_SIG over a CTE that SHADOWS ``documents`` with the
    stage-2 survivors (``main.documents`` reaches the base view), the
    unrolled Lloyd's quantizer over the full embeddings, and the
    min-label propagation template with stage-local names."""
    ncc = (
        "nl{next} AS (SELECT x.v, min(x.label) AS label FROM "
        "(SELECT v, label FROM nl{cur} UNION ALL "
        " SELECT ne.v, nl{cur}.label FROM ne JOIN nl{cur} ON ne.u = nl{cur}.v) x "
        "GROUP BY 1)"
    )
    scc = (
        "sl{next} AS (SELECT x.v, min(x.label) AS label FROM "
        "(SELECT v, label FROM sl{cur} UNION ALL "
        " SELECT se.v, sl{cur}.label FROM se JOIN sl{cur} ON se.u = sl{cur}.v) x "
        "GROUP BY 1)"
    )
    return (
        _KMEANS_SQL()
        + ", d0 AS (SELECT doc_id, source, text, " + TOKENS_SQL
        + " AS toks FROM main.documents), "
        "f0 AS (SELECT doc_id, source, text, " + QFEATURES_SQL + " FROM d0), "
        f"q0 AS (SELECT doc_id, source, text, "
        f"CASE WHEN {QLOGIT_SQL()} >= 0 THEN 1 ELSE 0 END AS keep "
        "  FROM f0), "
        "s1 AS (SELECT doc_id, source, text FROM q0 WHERE keep = 1), "
        "canon AS (SELECT text, min(doc_id) AS kid FROM s1 GROUP BY 1), "
        "exdrop AS (SELECT s1.doc_id FROM s1 JOIN canon USING (text) "
        "  WHERE s1.doc_id <> canon.kid), "
        # stage-2 survivors SHADOW the documents view so the shingle /
        # signature fragments below run over survivors only
        "documents AS MATERIALIZED (SELECT s1.doc_id, s1.text FROM s1 JOIN canon USING (text) "
        "  WHERE s1.doc_id = canon.kid), "
        + SHINGLES_SQL + ", " + MINHASH_SIG_SQL + ", "
        "ne0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v FROM bands a "
        "  JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
        "  WHERE a.doc_id < b.doc_id), "
        "ne AS MATERIALIZED (SELECT u, v FROM ne0 UNION ALL SELECT v AS u, u AS v FROM ne0), "
        "nl0 AS (SELECT DISTINCT v, v AS label FROM ne), "
        + ", ".join(ncc.format(cur=i, next=i + 1) for i in range(cc_iters))
        + f", neardrop AS (SELECT v AS doc_id FROM nl{cc_iters} WHERE v <> label), "
        "s3 AS MATERIALIZED (SELECT dd.doc_id FROM documents dd LEFT JOIN neardrop nd "
        "  ON dd.doc_id = nd.doc_id WHERE nd.doc_id IS NULL), "
        "sem0 AS MATERIALIZED (SELECT a.vec_id, a.v, a.bucket FROM afin a "
        "  JOIN s3 ON a.vec_id = s3.doc_id), "
        "se0 AS (SELECT a.vec_id AS u, b2.vec_id AS v FROM sem0 a "
        "  JOIN sem0 b2 ON a.bucket = b2.bucket WHERE a.vec_id < b2.vec_id "
        # zero-norm guard, mirroring bucket_near_dup_pairs (see
        # q_semantic_dedup)
        "  AND list_inner_product(a.v, a.v) > 0 "
        "  AND list_inner_product(b2.v, b2.v) > 0 "
        f"  AND list_cosine_similarity(a.v, b2.v) >= {thr!r}), "
        "se AS MATERIALIZED (SELECT u, v FROM se0 UNION ALL SELECT v AS u, u AS v FROM se0), "
        "sl0 AS (SELECT DISTINCT v, v AS label FROM se), "
        + ", ".join(scc.format(cur=i, next=i + 1) for i in range(cc_iters))
        + f", semdrop AS (SELECT v AS doc_id FROM sl{cc_iters} WHERE v <> label) "
        "SELECT d.doc_id, d.source, CASE "
        "  WHEN q0.keep = 0 THEN 'quality' "
        "  WHEN ex.doc_id IS NOT NULL THEN 'exact_dup' "
        "  WHEN nd.doc_id IS NOT NULL THEN 'near_dup' "
        "  WHEN sd.doc_id IS NOT NULL THEN 'semantic_dup' "
        "  ELSE 'kept' END AS stage, "
        f"{SPLIT_CASE_SQL('d.doc_id')} AS split "
        "FROM main.documents d "
        "JOIN q0 ON d.doc_id = q0.doc_id "
        "LEFT JOIN exdrop ex ON d.doc_id = ex.doc_id "
        "LEFT JOIN neardrop nd ON d.doc_id = nd.doc_id "
        "LEFT JOIN semdrop sd ON d.doc_id = sd.doc_id"
    )


@register("q_curate_corpus", _CURATION_SQL())
def q_curate_corpus(spark, sf_dir):
    """E-FLAGSHIP: the full curation funnel — quality gate → exact
    dedup → MinHash-LSH near-dup → SemDeDup semantic dedup →
    deterministic split — composed as ONE plan
    (``plans.curation.curate_corpus``), each stage pruning the next,
    every doc leaving with its first failing stage named. The oracle
    replays the identical stage sequencing end to end, so the
    COMPOSITION is hash-verified, not just the component operators."""
    from mhw3d_detection_spark.plans import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return curate_corpus(docs, emb)


# =========================================================================
# E6b — greedy in-order sequence packing
# =========================================================================
@register(
    "q_pack_sequences",
    "WITH d AS (SELECT doc_id, source, " + TOKENS_SQL + " AS toks FROM documents), "
    "c AS (SELECT doc_id, source, toks, "
    "  unnest(generate_series(0, CAST(floor((len(toks) - 1) / 32.0) AS INT))) AS i "
    "  FROM d WHERE len(toks) > 0), "
    "ch AS (SELECT doc_id, source, i AS chunk_idx, "
    "  len(list_slice(toks, i * 32 + 1, i * 32 + 32)) AS n_chunk_tokens FROM c), "
    "s AS (SELECT source, doc_id, chunk_idx, n_chunk_tokens, "
    "  CAST(floor(coalesce(sum(n_chunk_tokens) OVER (PARTITION BY source "
    "    ORDER BY doc_id, chunk_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    "    / 256.0) AS INT) AS seq_id FROM ch) "
    "SELECT source, seq_id, CAST(count(*) AS INT) AS n_chunks, "
    "CAST(sum(n_chunk_tokens) AS INT) AS n_tokens, "
    "CAST(count(DISTINCT doc_id) AS INT) AS n_docs "
    "FROM s GROUP BY 1, 2",
)
def q_pack_sequences(spark, sf_dir):
    """E6b: greedy in-order sequence packing — chunk all docs, then cut
    ~256-token training sequences via a per-source running token count
    in deterministic (doc_id, chunk_idx) order. Window partitions by
    source, so packing parallelizes across shards; within-shard order
    IS the reproducibility contract."""
    from mhw3d_detection_spark.operators.textops import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, chunk_size=32, target_tokens=256, group_col="source"
    )


# =========================================================================
# E2c — exact-substring duplication signal (duplicated-span fraction)
# =========================================================================
@register(
    "q_dup_span_frac",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "sp AS (SELECT doc_id, toks, "
    "  unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i FROM d), "
    "s AS (SELECT doc_id, "
    "  list_aggregate(toks[i:i+3], 'string_agg', ' ') AS span FROM sp), "
    "per AS (SELECT doc_id, span, count(*) AS c FROM s GROUP BY 1, 2), "
    "g AS (SELECT span, count(*) AS n_docs FROM per GROUP BY 1), "
    "pd AS (SELECT doc_id, sum(c) AS n_spans, "
    "  sum(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS n_dup_spans "
    "  FROM per JOIN g USING (span) GROUP BY 1) "
    "SELECT doc_id, CAST(coalesce(n_spans, 0) AS INT) AS n_spans, "
    "CAST(coalesce(n_dup_spans, 0) AS INT) AS n_dup_spans, "
    f"{rq_sql('coalesce(n_dup_spans, 0) / greatest(coalesce(n_spans, 0), 1)', 4)}"
    " AS dup_span_frac "
    "FROM (SELECT doc_id FROM documents) docs LEFT JOIN pd USING (doc_id)",
)
def q_dup_span_frac(spark, sf_dir):
    """E2c: exact-substring duplication signal (Lee et al. 2021) —
    fraction of each doc's token 4-gram spans that occur verbatim in
    at least one other document. Catches boilerplate / partial copies
    that document-level MinHash dedup misses. Equi-keyed hash
    aggregates + one span-keyed join; no all-pairs."""
    from mhw3d_detection_spark.operators.textops import dup_span_frac

    docs = load_table(spark, sf_dir, "documents")
    d = dup_span_frac(docs, span=4)
    return d.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        rq("dup_span_frac", 4).alias("dup_span_frac"),
    )


# =========================================================================
# E4 — unigram entropy + type-token ratio (gibberish detectors)
# =========================================================================
@register(
    "q_token_entropy",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "per AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2), "
    "a AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS clc, "
    "  count(*) AS nd FROM per GROUP BY 1) "
    "SELECT doc_id, CAST(coalesce(n, 0) AS INT) AS n_tokens, "
    "CAST(coalesce(nd, 0) AS INT) AS n_distinct, "
    f"{rq_sql('coalesce(ln(n) - clc / n, 0)', 4)} AS entropy, "
    f"{rq_sql('coalesce(nd * 1.0 / n, 0)', 4)} AS ttr "
    "FROM (SELECT doc_id FROM documents) docs LEFT JOIN a USING (doc_id)",
)
def q_token_entropy(spark, sf_dir):
    """E4: per-doc unigram Shannon entropy + type-token ratio — the
    gibberish/degenerate-text detectors (low entropy = repetitive
    spam; max entropy + TTR 1 = random noise). Closed form
    H = ln(n) − Σ c·ln(c)/n from two doc-keyed hash aggregates."""
    from mhw3d_detection_spark.operators.textops import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    e = token_entropy(docs)
    return e.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        rq("entropy", 4).alias("entropy"),
        rq("ttr", 4).alias("ttr"),
    )


# =========================================================================
# E4b — per-language length-quantile banding (length-outlier filter)
# =========================================================================
@register(
    "q_length_band",
    "WITH d AS (SELECT doc_id, lang, "
    "  len(" + TOKENS_SQL + ") AS n_tokens FROM documents), "
    "q AS (SELECT lang, quantile_cont(n_tokens, 0.05) AS len_lo, "
    "  quantile_cont(n_tokens, 0.95) AS len_hi FROM d GROUP BY 1) "
    "SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens, "
    f"{rq_sql('len_lo', 4)} AS len_lo, {rq_sql('len_hi', 4)} AS len_hi, "
    "CAST(n_tokens BETWEEN len_lo AND len_hi AS INT) AS in_band "
    "FROM d JOIN q USING (lang)",
)
def q_length_band(spark, sf_dir):
    """E4b: per-language token-length quantile band (p05–p95) — the
    length-outlier filter computed per group so short-form languages
    aren't clipped by long-form ones. Exact linear-interp percentile
    (group dim is tiny), broadcast back, narrow flag projection;
    approx_percentile is the documented 100 TB escape hatch."""
    from mhw3d_detection_spark.operators.textops import length_quantile_band

    docs = load_table(spark, sf_dir, "documents")
    b = length_quantile_band(docs, group_col="lang")
    return b.select(
        "doc_id",
        "lang",
        "n_tokens",
        rq("len_lo", 4).alias("len_lo"),
        rq("len_hi", 4).alias("len_hi"),
        "in_band",
    )


# =========================================================================
# E4c — corpus inverted index (bounded postings)
# =========================================================================
@register(
    "q_inverted_index",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "tokp AS (SELECT doc_id, toks[i] AS token FROM "
    "  (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM d)), "
    "pt AS (SELECT token, doc_id, count(*) AS tf FROM tokp GROUP BY 1, 2), "
    "totals AS (SELECT token, CAST(count(*) AS INT) AS df, "
    "  CAST(sum(tf) AS INT) AS tf_total FROM pt GROUP BY 1), "
    "rp AS (SELECT token, doc_id, tf, "
    "  row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn FROM pt), "
    "post AS (SELECT token, string_agg(doc_id || ':' || tf, ';' ORDER BY doc_id) "
    "  AS postings FROM rp WHERE rn <= 32 GROUP BY 1) "
    "SELECT token, df, tf_total, postings FROM totals JOIN post USING (token)",
)
def q_inverted_index(spark, sf_dir):
    """E4c: corpus inverted index — per token: document frequency,
    total tf, and a doc:tf postings string bounded to the first 32
    docs BEFORE any buffering (row_number window, so stopword-grade
    tokens can't blow per-group state; df carries the true count so
    truncation is visible, never silent)."""
    from mhw3d_detection_spark.operators.textops import inverted_index

    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs, max_postings=32)


# =========================================================================
# E4c — windowed co-occurrence + PMI (collocation mining)
# =========================================================================
@register(
    "q_cooc_pmi",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "tokp AS (SELECT doc_id, i AS pos, toks[i] AS token FROM "
    "  (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM d)), "
    "pairs AS (SELECT p.token AS a, r.token AS b FROM tokp p "
    "  CROSS JOIN (SELECT unnest([1, 2]) AS o) o "
    "  JOIN tokp r ON r.doc_id = p.doc_id AND r.pos = p.pos + o.o), "
    "c AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2), "
    "tot AS (SELECT sum(c_ab) AS n FROM c), "
    "ca AS (SELECT a, sum(c_ab) AS c_a FROM c GROUP BY 1), "
    "cb AS (SELECT b, sum(c_ab) AS c_b FROM c GROUP BY 1) "
    "SELECT a, b, CAST(c_ab AS INT) AS c_ab, "
    f"{rq_sql('ln(c_ab * n / (c_a * c_b))', 4)} AS pmi "
    "FROM c JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot "
    "WHERE c_ab >= 5",
)
def q_cooc_pmi(spark, sf_dir):
    """E4c: windowed co-occurrence counts + PMI (Church & Hanks 1990)
    at distance <= 2 — offset-explode + self-equi-join on (doc, pos),
    pair-count hash agg, vocab-sized marginals broadcast back. Never a
    quadratic product."""
    from mhw3d_detection_spark.operators.textops import cooccurrence_pmi

    docs = load_table(spark, sf_dir, "documents")
    p = cooccurrence_pmi(docs, window=2, min_count=5)
    return p.select("a", "b", "c_ab", rq("pmi", 4).alias("pmi"))


# =========================================================================
# E4d — curation funnel: keep/drop + first-failing-reason per document
# =========================================================================
@register(
    "q_curation_funnel",
    "WITH toks AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    # gopher quality rules (same thresholds as q_gopher_rules)
    "gs AS (SELECT doc_id, len(toks) AS n_tokens, "
    "  coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "    / greatest(len(toks), 1) AS mean_len, "
    "  len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) "
    "    / greatest(len(toks), 1) AS alpha_frac, "
    f"  len(list_intersect(toks, [{_GOPHER_STOP}])) AS n_stop FROM toks), "
    "g AS (SELECT doc_id, CAST((n_tokens BETWEEN 10 AND 1000) "
    "  AND (mean_len BETWEEN 2.0 AND 8.0) AND alpha_frac >= 0.8 "
    "  AND n_stop >= 2 AS INT) AS pass_gopher FROM gs), "
    # per-language length band (same as q_length_band)
    "ln AS (SELECT doc_id, lang, len(toks) AS n_tokens "
    "  FROM toks JOIN documents USING (doc_id)), "
    "qb AS (SELECT lang, quantile_cont(n_tokens, 0.05) AS len_lo, "
    "  quantile_cont(n_tokens, 0.95) AS len_hi FROM ln GROUP BY 1), "
    "b AS (SELECT doc_id, CAST(n_tokens BETWEEN len_lo AND len_hi AS INT) "
    "  AS in_band FROM ln JOIN qb USING (lang)), "
    # duplicated-span fraction (same as q_dup_span_frac, span=4)
    "sp AS (SELECT doc_id, toks, "
    "  unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i FROM toks), "
    "s AS (SELECT doc_id, "
    "  list_aggregate(toks[i:i+3], 'string_agg', ' ') AS span FROM sp), "
    "per AS (SELECT doc_id, span, count(*) AS c FROM s GROUP BY 1, 2), "
    "gd AS (SELECT span, count(*) AS n_docs FROM per GROUP BY 1), "
    "pd AS (SELECT doc_id, sum(c) AS n_spans, "
    "  sum(CASE WHEN n_docs > 1 THEN c ELSE 0 END) AS n_dup "
    "  FROM per JOIN gd USING (span) GROUP BY 1), "
    "ds AS (SELECT doc_id, coalesce(n_dup, 0) / greatest(coalesce(n_spans, 0), 1) "
    "  AS dup_frac FROM (SELECT doc_id FROM documents) LEFT JOIN pd USING (doc_id)), "
    # exact-dup canonical survivor
    "canon AS (SELECT doc_id, CASE WHEN doc_id = min(doc_id) "
    "  OVER (PARTITION BY text) THEN 1 ELSE 0 END AS is_canon FROM documents) "
    "SELECT doc_id, "
    "CASE WHEN is_canon = 0 THEN 'exact_dup' "
    "  WHEN pass_gopher = 0 THEN 'gopher' "
    "  WHEN in_band = 0 THEN 'length' "
    "  WHEN dup_frac >= 0.5 THEN 'dup_span' "
    "  ELSE 'keep' END AS reason, "
    "CAST(is_canon = 1 AND pass_gopher = 1 AND in_band = 1 "
    "  AND dup_frac < 0.5 AS INT) AS keep "
    "FROM canon JOIN g USING (doc_id) JOIN b USING (doc_id) "
    "JOIN ds USING (doc_id)",
)
def q_curation_funnel(spark, sf_dir):
    """E4d: the end-to-end curation decision — per document, keep/drop
    plus the FIRST failing stage in the funnel order a production
    pipeline applies them: exact-dup canonicalization -> Gopher
    quality rules -> per-language length band -> duplicated-span
    fraction (>= 0.5 marks the planted near-dup carriers). Every
    signal is rational arithmetic (integer counts, exact percentile
    interpolation), so the cross-engine comparison is exact — no
    transcendental-threshold flakiness. Plan: four doc-keyed
    equi-joins of per-doc signal tables; all join keys share the same
    hash partitioning, so the join tree stays one doc_id exchange
    deep at any corpus size."""
    from pyspark.sql import Window

    from mhw3d_detection_spark.operators.textops import (
        dup_span_frac,
        gopher_rules,
        length_quantile_band,
    )

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules(docs).select("doc_id", "pass_gopher")
    b = length_quantile_band(docs, group_col="lang").select("doc_id", "in_band")
    ds = dup_span_frac(docs, span=4).select("doc_id", "dup_span_frac")
    w = Window.partitionBy("text")
    canon = docs.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("int").alias(
            "is_canon"
        ),
    )
    j = canon.join(g, "doc_id").join(b, "doc_id").join(ds, "doc_id")
    reason = (
        F.when(F.col("is_canon") == 0, F.lit("exact_dup"))
        .when(F.col("pass_gopher") == 0, F.lit("gopher"))
        .when(F.col("in_band") == 0, F.lit("length"))
        .when(F.col("dup_span_frac") >= 0.5, F.lit("dup_span"))
        .otherwise(F.lit("keep"))
    )
    return j.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "keep").cast("int").alias("keep"),
    )


# =========================================================================
# E3b — random-projection dimensionality reduction (JL) + label centroids
# =========================================================================
def _jl_exprs() -> list[str]:
    """Raw SQL expressions for the 8 JL projection components, in the
    exact index order Spark's fold evaluates (same literals, same
    left-associated additions). Both operands are cast to DOUBLE
    explicitly: DuckDB parses a bare 17-digit decimal literal as
    DECIMAL(18,17), whose multiply rounds differently from the IEEE
    double product Spark computes (observed 1e-8 divergence — enough
    to flip a quantization boundary)."""
    from mhw3d_detection_spark.operators.similarity import jl_matrix

    return [
        " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST({c!r} AS DOUBLE)"
            for i, c in enumerate(row)
        )
        for row in jl_matrix(8, 64)
    ]


def _JL_SQL() -> str:
    cols = ", ".join(
        rq_sql(e, 4) + f" AS r{j}" for j, e in enumerate(_jl_exprs())
    )
    return f"SELECT vec_id, {cols} FROM embeddings"


@register("q_embed_random_projection", _JL_SQL())
def q_embed_random_projection(spark, sf_dir):
    """E3b: Johnson-Lindenstrauss random projection 64 -> 8 dims — the
    pre-step that shrinks vectors before LSH/brute-force scoring at
    corpus scale. Pure narrow fold per output dim (no shuffle, no
    UDF); the md5-derived matrix is embedded as the same literal in
    the DuckDB oracle, multiplied in the same index order."""
    from mhw3d_detection_spark.operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    p = random_projection(emb, out_dim=8, dim=64)
    return p.select(
        "vec_id", *[rq(f"r{j}", 4).alias(f"r{j}") for j in range(8)]
    )


@register(
    "q_embed_centroids",
    "WITH x AS (SELECT label, CAST(i - 1 AS INT) AS dim_idx, "
    "  CAST(embedding[i] AS DOUBLE) AS v FROM "
    "  (SELECT label, embedding, "
    "   unnest(generate_series(1, len(embedding))) AS i FROM embeddings)) "
    "SELECT label, dim_idx, "
    f"{rq_sql('avg(v)', 4)} AS mean_val, "
    "CAST(count(*) AS INT) AS n_vecs FROM x GROUP BY 1, 2",
)
def q_embed_centroids(spark, sf_dir):
    """E3b: per-label centroid components (class prototypes / IVF cell
    stats) — posexplode (row-local) + ONE hash aggregate on
    (label, dim_idx); map-side combine does the work, and the shuffle
    key count is labels x dims regardless of corpus size."""
    from mhw3d_detection_spark.operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    c = label_centroids(emb)
    return c.select(
        "label", "dim_idx", rq("mean_val", 4).alias("mean_val"), "n_vecs"
    )


# =========================================================================
# E6c — mixture design + deterministic split + per-source profile
# =========================================================================
@register(
    "q_mixture_weights",
    "WITH per AS (SELECT source, CAST(count(*) AS INT) AS n_docs, "
    "  CAST(sum(len(" + TOKENS_SQL + ")) AS BIGINT) AS n_tokens "
    "  FROM documents GROUP BY 1), "
    "tot AS (SELECT sum(n_tokens) AS t, sum(pow(n_tokens, 0.5)) AS ta FROM per) "
    "SELECT source, n_docs, n_tokens, "
    f"{rq_sql('CASE WHEN t > 0 THEN n_tokens / t ELSE 0 END', 4)} AS raw_share, "
    f"{rq_sql('CASE WHEN ta > 0 THEN pow(n_tokens, 0.5) / ta ELSE 0 END', 4)}"
    " AS target_share, "
    f"{rq_sql('CASE WHEN n_tokens > 0 THEN pow(n_tokens, 0.5) / ta / (n_tokens / t) ELSE 0 END', 4)}"
    " AS rel_weight "
    "FROM per CROSS JOIN tot",
)
def q_mixture_weights(spark, sf_dir):
    """E6c: training-mixture design table — per source: raw token
    share, temperature-scaled target share (alpha=0.5, Conneau &
    Lample 2019), and the relative sampling weight a sampler applies.
    One groups-sized aggregate + broadcast totals."""
    from mhw3d_detection_spark.operators.textops import mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    m = mixture_weights(docs, group_col="source", alpha=0.5)
    return m.select(
        "source",
        "n_docs",
        "n_tokens",
        rq("raw_share", 4).alias("raw_share"),
        rq("target_share", 4).alias("target_share"),
        rq("rel_weight", 4).alias("rel_weight"),
    )


@register(
    "q_split_assign",
    f"SELECT doc_id, {SPLIT_CASE_SQL('doc_id')} AS split FROM documents",
)
def q_split_assign(spark, sf_dir):
    """E6c: deterministic 80/10/10 train/val/test split — md5-uniform
    of the content key, a pure key function (layout/engine/rerun
    invariant; documents cannot leak between splits on reshard).
    Narrow projection, zero shuffles."""
    from mhw3d_detection_spark.operators.textops import split_assign

    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs).select("doc_id", "split")


@register(
    "q_source_stats",
    "WITH d AS (SELECT doc_id, source, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, source, len(toks) AS n_tok, "
    "  coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "    / greatest(len(toks), 1) AS mean_len, "
    "  len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) "
    "    / greatest(len(toks), 1) AS alpha_frac, "
    f"  len(list_intersect(toks, [{_GOPHER_STOP}])) AS n_stop FROM d) "
    "SELECT source, CAST(count(*) AS INT) AS n_docs, "
    "CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
    f"{rq_sql('avg(n_tok)', 4)} AS mean_tokens, "
    f"{rq_sql('avg(CAST((n_tok BETWEEN 10 AND 1000) AND (mean_len BETWEEN 2.0 AND 8.0) AND alpha_frac >= 0.8 AND n_stop >= 2 AS INT))', 4)}"
    " AS gopher_pass_rate "
    "FROM s GROUP BY 1",
)
def q_source_stats(spark, sf_dir):
    """E6c: per-source corpus profile — doc/token counts, mean length,
    Gopher pass rate — the table a mixture designer reads before
    setting weights. Composite of the quality signals re-aggregated by
    source: one doc-level narrow pass + one source-keyed hash agg."""
    from mhw3d_detection_spark.operators.textops import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_rules(docs).select("doc_id", "n_tokens", "pass_gopher")
    j = docs.select("doc_id", "source").join(g, "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        rq(F.avg("n_tokens"), 4).alias("mean_tokens"),
        rq(F.avg(F.col("pass_gopher").cast("double")), 4).alias(
            "gopher_pass_rate"
        ),
    )


# =========================================================================
# E3b — two-stage ANN: coarse JL scoring + exact re-rank
# =========================================================================
def _RERANK_SQL() -> str:
    exprs = _jl_exprs()
    raw = ", ".join(f"{e} AS r{j}" for j, e in enumerate(exprs))
    dot8 = " + ".join(f"c.r{j} * p.r{j}" for j in range(8))
    n8 = lambda a: "sqrt(" + " + ".join(f"{a}.r{j} * {a}.r{j}" for j in range(8)) + ")"
    return (
        f"WITH proj AS (SELECT vec_id, {raw} FROM embeddings), "
        "probes AS (SELECT * FROM proj WHERE vec_id % 50 = 0), "
        "coarse AS (SELECT p.vec_id AS probe_id, c.vec_id, "
        f"  ({dot8}) / ({n8('c')} * {n8('p')}) AS ccos "
        "  FROM proj c, probes p WHERE c.vec_id <> p.vec_id), "
        "cand AS (SELECT probe_id, vec_id FROM (SELECT *, "
        "  row_number() OVER (PARTITION BY probe_id ORDER BY ccos DESC, vec_id) "
        "  AS crank FROM coarse) WHERE crank <= 20), "
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        "rr AS (SELECT cand.probe_id, cand.vec_id, "
        "  list_cosine_similarity(b.v, q.v) AS cosine "
        "  FROM cand JOIN base b ON b.vec_id = cand.vec_id "
        "  JOIN base q ON q.vec_id = cand.probe_id) "
        "SELECT probe_id, vec_id, "
        f"{rq_sql('cosine', 4)} AS cosine, "
        "CAST(row_number() OVER (PARTITION BY probe_id "
        "  ORDER BY cosine DESC, vec_id) AS INT) AS rank "
        "FROM rr QUALIFY rank <= 5"
    )


@register("q_similarity_rerank", _RERANK_SQL())
def q_similarity_rerank(spark, sf_dir):
    """E3b: two-stage ANN — the whole corpus scored on 8-dim JL
    projections (1/8 the multiplies), top-20 candidates per probe
    exact-reranked on the full 64 dims for the final top-5. Stage 1
    broadcasts probe projections (no big-side shuffle); stage 2
    touches probes x 20 rows. The coarse-quantize-then-rerank shape of
    production vector retrieval."""
    from mhw3d_detection_spark.operators.similarity import projected_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    r = projected_rerank_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, k_coarse=20
    )
    return r.select("probe_id", "vec_id", rq("cosine", 4).alias("cosine"), "rank")


# =========================================================================
# E7 — cross-source corpus overlap (exact + MinHash-estimated Jaccard)
# =========================================================================
_SO_H = ", ".join(
    f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_M}) AS h{i}"
    for i in range(8)
)
_SO_EST = " + ".join(
    f"CASE WHEN p.ha{i} = p.hb{i} THEN 1 ELSE 0 END" for i in range(8)
)
_SO_SQL = (
    f"WITH {SHINGLES_SQL}, "
    "ds AS (SELECT doc_id, source FROM documents), "
    "ss AS (SELECT DISTINCT ds.source AS source, sh.shingle AS shingle "
    "  FROM sh JOIN ds USING (doc_id)), "
    "hx AS (SELECT source, ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS x FROM ss), "
    f"sig0 AS (SELECT source, count(*) AS n, {_SO_H} FROM hx GROUP BY 1), "
    "srcs AS (SELECT DISTINCT source FROM documents), "
    "sig AS (SELECT s.source, CAST(coalesce(g.n, 0) AS BIGINT) AS n, "
    + ", ".join(f"g.h{i} AS h{i}" for i in range(8))
    + "  FROM srcs s LEFT JOIN sig0 g ON s.source = g.source), "
    "inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter "
    "  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source "
    "  GROUP BY 1, 2), "
    "pairs AS (SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b, "
    + ", ".join(f"a.h{i} AS ha{i}, b.h{i} AS hb{i}" for i in range(8))
    + "  FROM sig a JOIN sig b ON a.source < b.source) "
    "SELECT p.src_a, p.src_b, p.n_a, p.n_b, "
    "  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter, "
    "  CASE WHEN p.n_a + p.n_b - coalesce(i.n_inter, 0) > 0 THEN "
    f"  {rq_sql('coalesce(i.n_inter, 0) / (p.n_a + p.n_b - coalesce(i.n_inter, 0))', 6)} ELSE 0.0 END AS exact_jaccard, "
    f"  ({_SO_EST}) / 8.0 AS est_jaccard "
    "FROM pairs p LEFT JOIN inter i ON p.src_a = i.src_a AND p.src_b = i.src_b"
)


@register("q_source_overlap", _SO_SQL)
def q_source_overlap(spark, sf_dir):
    """E7: per source pair, exact shingle-set Jaccard + the MinHash
    union-signature estimate — the 'is source B already inside source A'
    curation diagnostic. One shingle scan; the estimate path is
    O(sources x 8) mergeable state (the 100 TB shape), the exact path an
    equi-join on the shingle key."""
    docs = load_table(spark, sf_dir, "documents")
    out = source_overlap(docs)
    return out.select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        "n_inter",
        rq("exact_jaccard", 6).alias("exact_jaccard"),
        "est_jaccard",
    )


# =========================================================================
# E3 — int8 scalar-quantized top-k (r7: the memory-bound scale path)
# =========================================================================
@register(
    "q_similarity_topk_int8",
    "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "  FROM embeddings), "
    "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e), "
    "sc AS (SELECT vec_id, v, CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END AS scale FROM m), "
    "q AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x*scale + 0.5) AS BIGINT)) AS qv "
    "  FROM sc), "
    "n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn2 "
    "  FROM q), "
    "p AS (SELECT vec_id AS probe_id, qv AS pqv, qn2 AS pqn2 FROM n WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, n.vec_id, "
    "  CAST(list_dot_product(n.qv, p.pqv) AS BIGINT) / (sqrt(n.qn2) * sqrt(p.pqn2)) AS qcosine "
    "  FROM n, p WHERE n.vec_id <> p.probe_id AND n.qn2 > 0 AND p.pqn2 > 0), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY qcosine DESC, vec_id) AS INT) AS rank FROM sims) "
    "SELECT probe_id, vec_id, qcosine, rank FROM ranked WHERE rank <= 5",
)
def q_similarity_topk_int8(spark, sf_dir):
    """E3 (r7): brute-force top-5 over int8 scalar-quantized codes —
    the memory-bound production path (8x narrower scan than the
    float64 math; integer multiply-add inner loop). NOTE the output is
    UNROUNDED: every arithmetic step (widening cast, 127/max|v|,
    v*scale, floor, int64 dot, sqrt, divide) is exactly-rounded IEEE,
    so the quantized cosine is bit-identical cross-engine — this row
    is deliberately a no-rq differential pinning that claim."""
    from mhw3d_detection_spark.operators.similarity import int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return int8_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5)


# =========================================================================
# E4 — BM25 ranked retrieval (r7)
# =========================================================================
_BM25_TERMS = ("merge", "query", "spark", "window")


@register(
    "q_bm25_topk",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), "
    "nd AS (SELECT count(*) * 1.0 AS n FROM documents), "
    "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
    "hit AS (SELECT doc_id, token FROM tok WHERE token IN "
    f"({', '.join(repr(t) for t in sorted(_BM25_TERMS))})), "
    "tf AS (SELECT doc_id, token, count(*) AS tf FROM hit GROUP BY 1, 2), "
    "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM hit GROUP BY 1), "
    "idf AS (SELECT token, ln(1.0 + (nd.n - df + 0.5) / (df + 0.5)) AS idf "
    "  FROM df CROSS JOIN nd), "
    "c AS (SELECT tf.doc_id, "
    f"  {rq_sql('idf.idf * (tf.tf * 2.25) / (tf.tf + 1.25 * (0.25 + 0.75 * dl.dl / ad.avgdl))', 6)} AS cq "
    "  FROM tf JOIN idf ON tf.token = idf.token "
    "  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad), "
    "s AS (SELECT doc_id, CAST(count(*) AS INT) AS n_hit_terms, "
    f"  {rq_sql('sum(cq)', 4)} AS score FROM c GROUP BY 1) "
    "SELECT doc_id, n_hit_terms, score FROM s ORDER BY score DESC, doc_id LIMIT 20",
)
def q_bm25_topk(spark, sf_dir):
    """E4 (r7): BM25 ranked retrieval for a fixed query-term bag — the
    lexical corpus-slicing scorer (Robertson & Zaragoza 2009). Two
    doc-keyed hash aggregates + broadcast term/scalar dims +
    TakeOrdered; each term contribution is rq6-quantized BEFORE the
    per-doc sum so the total is order-independent (dyadic-grid sums,
    the sketch-register trick)."""
    from mhw3d_detection_spark.operators.textops import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k1=1.25, b=0.75, top_n=20)


# =========================================================================
# E4 — BPE merge-pair counting (r7)
# =========================================================================
@register(
    "q_bpe_merge_pairs",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "pr AS (SELECT unnest(CASE WHEN length(token) < 2 THEN []::VARCHAR[] "
    "  ELSE list_transform(generate_series(1, CAST(length(token) AS INT) - 1), "
    "    i -> substr(token, i, 2)) END) AS pair FROM tok) "
    "SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1 "
    "ORDER BY n DESC, pair LIMIT 50",
)
def q_bpe_merge_pairs(spark, sf_dir):
    """E4 (r7): one round of BPE merge-candidate counting (Sennrich et
    al. 2016) — adjacent character-pair frequencies inside word tokens,
    tf-weighted over all occurrences; the vocabulary-induction
    primitive of tokenizer training. Pure integer counts: narrow
    double explode -> one hash aggregate -> TakeOrdered."""
    from mhw3d_detection_spark.operators.textops import bpe_merge_pairs

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_pairs(docs, top_n=50)


@register(
    "q_similarity_ivf_int8",
    "WITH e AS (SELECT vec_id, label, "
    "  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    "m AS (SELECT vec_id, label, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e), "
    "sc AS (SELECT vec_id, label, v, CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END AS scale FROM m), "
    "q AS (SELECT vec_id, label, "
    "  list_transform(v, x -> CAST(floor(x*scale + 0.5) AS BIGINT)) AS qv FROM sc), "
    "n AS (SELECT vec_id, label, qv, "
    "  CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn2 FROM q), "
    "p AS (SELECT vec_id AS probe_id, label, qv AS pqv, qn2 AS pqn2 FROM n "
    "  WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, n.vec_id, "
    "  CAST(list_dot_product(n.qv, p.pqv) AS BIGINT) / (sqrt(n.qn2) * sqrt(p.pqn2)) AS qcosine "
    "  FROM n JOIN p ON n.label = p.label "
    "  WHERE n.vec_id <> p.probe_id AND n.qn2 > 0 AND p.pqn2 > 0), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY qcosine DESC, vec_id) AS INT) AS rank FROM sims) "
    "SELECT probe_id, vec_id, qcosine, rank FROM ranked WHERE rank <= 5",
)
def q_similarity_ivf_int8(spark, sf_dir):
    """E3 (r7): IVF-SQ8 — the FAISS IVFx,SQ8 index shape as DataFrame
    ops: coarse-cell equi-join (1/n_cells of the corpus scored per
    probe) x int8 integer-dot scoring (8x narrower scan). The two
    scale levers compose; output stays the unrounded bit-exact
    quantized cosine."""
    from mhw3d_detection_spark.operators.similarity import int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return int8_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
    )


# =========================================================================
# E4e — quality-classifier calibration bands (r7)
# =========================================================================
@register(
    "q_quality_calibration",
    "WITH d AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, " + QFEATURES_SQL + " FROM d), "
    f"z AS (SELECT doc_id, {QLOGIT_SQL()} AS logit FROM s) "
    "SELECT CAST(floor(logit * 4.0) AS BIGINT) AS band, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep "
    "FROM z WHERE logit IS NOT NULL GROUP BY 1 ORDER BY band",
)
def q_quality_calibration(spark, sf_dir):
    """E4e (r7): calibration diagnostic for the literal-weight quality
    classifier — doc counts and keep counts per quarter-logit band
    (floor(logit*4)). The logit is exact IEEE both engines, so the
    band index is an exact integer; counts are integers — no rounding
    anywhere. One narrow scoring scan + one tiny hash aggregate
    (bands-sized state), the shape of a threshold-tuning sweep over a
    100 TB corpus."""
    from mhw3d_detection_spark.operators.textops import quality_scores

    docs = load_table(spark, sf_dir, "documents")
    z = quality_scores(docs).filter(F.col("quality_logit").isNotNull())
    return (
        z.groupBy(
            F.floor(F.col("quality_logit") * 4.0).cast("long").alias("band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("quality_logit") >= 0, 1).otherwise(0))
            .cast("long")
            .alias("n_keep"),
        )
        .orderBy("band")
    )


# =========================================================================
# E3+E4 — hybrid retrieval: Reciprocal Rank Fusion of BM25 + int8 ANN (r7)
# =========================================================================
@register(
    "q_hybrid_retrieval_rrf",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), "
    "nd AS (SELECT count(*) * 1.0 AS n FROM documents), "
    "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
    "hit AS (SELECT doc_id, token FROM tok WHERE token IN "
    f"({', '.join(repr(t) for t in sorted(_BM25_TERMS))})), "
    "tf AS (SELECT doc_id, token, count(*) AS tf FROM hit GROUP BY 1, 2), "
    "bdf AS (SELECT token, count(DISTINCT doc_id) AS df FROM hit GROUP BY 1), "
    "idf AS (SELECT token, ln(1.0 + (nd.n - df + 0.5) / (df + 0.5)) AS idf "
    "  FROM bdf CROSS JOIN nd), "
    "c AS (SELECT tf.doc_id, "
    f"  {rq_sql('idf.idf * (tf.tf * 2.25) / (tf.tf + 1.25 * (0.25 + 0.75 * dl.dl / ad.avgdl))', 6)} AS cq "
    "  FROM tf JOIN idf ON tf.token = idf.token "
    "  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad), "
    f"s AS (SELECT doc_id, {rq_sql('sum(cq)', 4)} AS score FROM c GROUP BY 1), "
    "lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) "
    "  AS lex_rank FROM s), "
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "  FROM embeddings), "
    "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e), "
    "sc AS (SELECT vec_id, v, CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END AS scale FROM m), "
    "q AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x*scale + 0.5) AS BIGINT)) AS qv "
    "  FROM sc), "
    "nn AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS qn2 "
    "  FROM q), "
    "p AS (SELECT qv AS pqv, qn2 AS pqn2 FROM nn WHERE vec_id = 0), "
    "sims AS (SELECT nn.vec_id, "
    "  CAST(list_dot_product(nn.qv, p.pqv) AS BIGINT) / (sqrt(nn.qn2) * sqrt(p.pqn2)) AS qcosine "
    "  FROM nn, p WHERE nn.vec_id <> 0 AND nn.qn2 > 0 AND p.pqn2 > 0), "
    "annr AS (SELECT vec_id AS doc_id, ann_rank FROM ("
    "  SELECT vec_id, CAST(row_number() OVER (ORDER BY qcosine DESC, vec_id) AS INT) "
    "    AS ann_rank FROM sims) WHERE ann_rank <= 64), "
    "f AS (SELECT coalesce(l.doc_id, a.doc_id) AS doc_id, l.lex_rank, a.ann_rank, "
    "  coalesce(1.0 / (60.0 + l.lex_rank), 0.0) + coalesce(1.0 / (60.0 + a.ann_rank), 0.0) AS rrf "
    "  FROM lexr l FULL OUTER JOIN annr a ON l.doc_id = a.doc_id) "
    "SELECT doc_id, lex_rank, ann_rank, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 20",
)
def q_hybrid_retrieval_rrf(spark, sf_dir):
    """E3+E4 composed (r7): hybrid retrieval by Reciprocal Rank Fusion
    (Cormack et al. SIGIR'09) — the BM25 lexical ranking of a query-
    term bag fused with the int8-ANN ranking around probe embedding 0
    via rrf = 1/(60+lex_rank) + 1/(60+ann_rank). Both fusion inputs
    are integer ranks (BM25 ranks its rq4 scores through the two-phase
    global row_number; the ANN ordering is the bit-exact int8 cosine),
    so the fused score is exact cross-engine with no rounding — the
    lexical ⊕ dense ensemble of modern retrieval/RAG stacks."""
    from mhw3d_detection_spark.operators.similarity import hybrid_rrf_retrieval

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_retrieval(docs, emb, _BM25_TERMS, probe_vec_id=0)


# =========================================================================
# E2 — winnowing fingerprint dedup (r7)
# =========================================================================
@register(
    "q_dedup_winnowing",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
    "  list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' ')) "
    "  ELSE [] END AS grams FROM d), "
    "h AS (SELECT doc_id, list_transform(grams, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS xs FROM g), "
    "w AS (SELECT doc_id, CASE WHEN len(xs) = 0 THEN []::BIGINT[] "
    "  WHEN len(xs) < 4 THEN [list_min(xs)] "
    "  ELSE list_distinct(list_transform(generate_series(1, len(xs) - 3), i -> list_min(xs[i:i+3]))) "
    "  END AS fps FROM h), "
    "f AS (SELECT doc_id, unnest(fps) AS fp FROM w), "
    "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ns "
    "  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, CAST(ns AS BIGINT) AS n_shared FROM p WHERE ns >= 2",
)
def q_dedup_winnowing(spark, sf_dir):
    """E2 (r7): winnowing fingerprint near-dup pairs (Schleimer,
    Wilkerson & Aiken SIGMOD'03, the MOSS sketch): per doc, min-hash
    of each 4-window over the 3-gram hash sequence, distinct selected
    hashes = fingerprint set (guarantees a shared fingerprint for any
    shared run of >= k+w-1 = 6 tokens); pairs from the fp equi-join
    with a shared-count prune. Sketch build is row-local (zero
    shuffles); integer-exact end to end."""
    from mhw3d_detection_spark.operators.textops import winnow_shared_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_shared_pairs(docs, min_shared=2)


# =========================================================================
# E3 — product quantization (r7: Jégou, Douze & Schmid TPAMI'11 — the
# codes index + asymmetric-distance search; oracle unrolls the m
# per-subspace Lloyd's trainers exactly like _KMEANS_SQL)
# =========================================================================
def _PQ_SQL(
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    dim: int = 64,
    standalone: bool = True,
) -> str:
    """Per-subspace unrolled Lloyd's trainers as DuckDB CTEs, mirroring
    ``pq_train_codebooks`` exactly: subspace s trains on ``v[lo:hi]``
    slices with the same deterministic init / argmin assign / rq6
    round-quantized means as ``_KMEANS_SQL``. Emits per subspace the
    final assignment ``p{s}afin`` and final codebook ``p{s}c{iters}``.
    Ends WITHOUT a trailing comma. Same literal-assign-only guard as
    the k-means oracle. ``standalone=False`` drops the ``WITH`` prefix
    and the ``base`` CTE so the fragment composes after a generator
    that already defined the identical ``base`` (``_KMEANS_SQL`` — the
    IVF-PQ composition)."""
    from mhw3d_detection_spark.operators.similarity import (
        LITERAL_ASSIGN_MAX_K,
    )

    if ksub > LITERAL_ASSIGN_MAX_K:
        raise ValueError(
            f"_PQ_SQL mirrors the literal assign only (ksub <= "
            f"{LITERAL_ASSIGN_MAX_K}); ksub={ksub} would run the Arrow "
            "kernel on the Spark side, which is not bit-exact vs this SQL"
        )
    dsub = dim // m
    ctes = (
        ["base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
        if standalone
        else []
    )
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        ctes.append(f"sub{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM base)")
        ctes.append(
            f"p{s}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
            f"AS INT) AS bucket, v AS c FROM "
            f"(SELECT vec_id, v FROM sub{s} ORDER BY vec_id LIMIT {ksub}))"
        )
        d2 = (
            f"list_sum(list_transform(range(1, {dsub + 1}), "
            f"i -> (b.v[i] - c.c[i]) * (b.v[i] - c.c[i])))"
        )

        def assign_cte(name: str, cents: str) -> str:
            return (
                f"{name} AS (SELECT vec_id, v, bucket FROM ("
                f"SELECT b.vec_id, b.v, c.bucket, "
                f"row_number() OVER (PARTITION BY b.vec_id "
                f"ORDER BY {d2} ASC, c.bucket ASC) AS rn "
                f"FROM sub{s} b CROSS JOIN {cents} c) WHERE rn = 1)"
            )

        for it in range(1, iters + 1):
            ctes.append(assign_cte(f"p{s}a{it}", f"p{s}c{it - 1}"))
            ctes.append(
                f"p{s}c{it} AS (SELECT bucket, list(m ORDER BY i) AS c FROM ("
                f"SELECT bucket, i, {rq_sql('avg(v[i])', 6)} AS m "
                f"FROM p{s}a{it} "
                f"CROSS JOIN (SELECT unnest(range(1, {dsub + 1})) AS i) "
                f"GROUP BY bucket, i) GROUP BY bucket)"
            )
        ctes.append(assign_cte(f"p{s}afin", f"p{s}c{iters}"))
    joined = ", ".join(ctes)
    return ("WITH " + joined) if standalone else joined


@register(
    "q_pq_train",
    _PQ_SQL()
    + " SELECT subspace, code, n_vectors FROM ("
    + " UNION ALL ".join(
        f"SELECT {s} AS subspace, bucket AS code, "
        f"CAST(count(*) AS BIGINT) AS n_vectors "
        f"FROM p{s}afin GROUP BY bucket"
        for s in range(4)
    )
    + ")",
)
def q_pq_train(spark, sf_dir):
    """E3 (r7): product-quantization codebook training — 4 independent
    per-subspace Lloyd's quantizers (16 dims, 4 codes, 2 rounds each)
    over contiguous slices of the embedding space, then the narrow
    encode pass; reported as the per-(subspace, code) occupancy
    histogram so the code VALUES are hash-checked, not just counts of
    rows. The oracle unrolls all four trainers (same deterministic
    init, same rq6 round-quantized means), so the whole train->encode
    path is bit-exact cross-engine."""
    from mhw3d_detection_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=4, ksub=4, iters=2)
    enc = pq_encode(emb, books)
    return (
        enc.select(F.posexplode("codes").alias("subspace", "code"))
        .groupBy("subspace", "code")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _PQ_ADC_D(s: int, dsub: int = 16) -> str:
    return (
        f"list_sum(list_transform(range(1, {dsub + 1}), "
        f"i -> (p.pv[{s * dsub} + i] - k{s}.c[i]) * "
        f"(p.pv[{s * dsub} + i] - k{s}.c[i])))"
    )


@register(
    "q_similarity_pq_adc",
    _PQ_SQL()
    + ", codes AS (SELECT a0.vec_id, a0.bucket AS code0, a1.bucket AS code1, "
    "  a2.bucket AS code2, a3.bucket AS code3 FROM p0afin a0 "
    "  JOIN p1afin a1 ON a0.vec_id = a1.vec_id "
    "  JOIN p2afin a2 ON a0.vec_id = a2.vec_id "
    "  JOIN p3afin a3 ON a0.vec_id = a3.vec_id), "
    "probes AS (SELECT vec_id AS probe_id, v AS pv FROM base "
    "  WHERE vec_id % 50 = 0), "
    "dist AS (SELECT p.probe_id, t.vec_id, "
    f"  ((({_PQ_ADC_D(0)} + {_PQ_ADC_D(1)}) + {_PQ_ADC_D(2)}) + {_PQ_ADC_D(3)}) AS adc_d2 "
    "  FROM codes t CROSS JOIN probes p "
    "  JOIN p0c2 k0 ON k0.bucket = t.code0 "
    "  JOIN p1c2 k1 ON k1.bucket = t.code1 "
    "  JOIN p2c2 k2 ON k2.bucket = t.code2 "
    "  JOIN p3c2 k3 ON k3.bucket = t.code3 "
    "  WHERE t.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY adc_d2 ASC, vec_id) AS INT) AS rank FROM dist) "
    "SELECT probe_id, vec_id, adc_d2, rank FROM ranked WHERE rank <= 5",
)
def q_similarity_pq_adc(spark, sf_dir):
    """E3 (r7): asymmetric-distance top-5 over the trained PQ codes —
    each probe materializes its m x ksub lookup table once (narrow
    literal-codebook expressions), then scoring is m element_at
    lookups + 3 adds per candidate over the CODES scan (the ~64x
    smaller index artifact; the floats are never re-read). NOTE the
    output is UNROUNDED: every LUT entry is the same fixed-order IEEE
    fold in both engines and the cross-subspace sum is left-associated
    in both, so the raw squared distance is bit-identical cross-engine
    — this row pins that claim with no rounding tolerance."""
    from mhw3d_detection_spark.operators.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(emb, m=4, ksub=4, iters=2)
    return pq_adc_topk(emb, books, probe_pred=lambda c: c % 50 == 0, k=5)


# =========================================================================
# E8 — storage layout: Z-order clustering key (r7)
# =========================================================================
def _ZORDER_SQL(bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((x >> {i}) & 1) << {2 * i})")
        terms.append(f"(((y >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_zorder_key",
    "WITH g AS (SELECT event_id, CAST(user_id % 1024 AS BIGINT) AS x, "
    "  CAST(event_id % 1024 AS BIGINT) AS y FROM events "
    "  WHERE event_id % 97 = 0) "
    f"SELECT event_id, x, y, ({_ZORDER_SQL(10)}) AS zkey FROM g",
)
def q_zorder_key(spark, sf_dir):
    """E8 (r7): Morton/Z-order layout key — bit-interleaved (x, y)
    grid coordinates, the multi-dimensional clustering key behind
    Delta OPTIMIZE ZORDER / Iceberg z-ordered sort orders. Sorting a
    100 TB write by this key makes every parquet footer a tight
    bounding box on BOTH dims, so box filters prune files instead of
    scanning them (see ``sources/ingest.py:write_zordered``; the
    file-stats effect is pinned by ``tests/test_ingest.py``). Pure
    integer shift/mask arithmetic — bit-exact cross-engine, hash-
    checked here over the events table."""
    from mhw3d_detection_spark.sources.ingest import zorder_key

    ev = load_table(spark, sf_dir, "events")
    g = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        (F.col("user_id") % 1024).cast("long").alias("x"),
        (F.col("event_id") % 1024).cast("long").alias("y"),
    )
    return g.withColumn("zkey", zorder_key("x", "y", bits=10))


# =========================================================================
# E4 — BPE merge TRAINING, rounds unrolled in the oracle (r7: the
# iterative half of tokenizer vocabulary induction; third unrolled
# iterative trainer after Lloyd's k-means and the PQ subspaces)
# =========================================================================
def _BPE_CTES(rounds: int = 3, emit_final: bool = False) -> str:
    """Unrolled BPE training rounds as DuckDB CTEs mirroring
    ``bpe_train_merges`` exactly: same char split (space-inject
    regexp_replace — no lookarounds, RE2-safe), same self-pair
    exclusion (the positional-merge contract), same (count desc, pair
    asc) selection, same positional merge application. Emits per-round
    word-state CTEs ``w{r}`` (carrying the original word ``w``),
    pair-count CTEs ``c{r}`` and top-pair CTEs ``t{r}``;
    ``emit_final`` additionally applies the LAST selected merge,
    yielding ``w{rounds}`` — the fully-encoded dictionary a deploy
    pass joins against. No WITH prefix, no trailing comma."""
    pairs = (
        "list_transform(list_filter(range(1, len(s)), "
        "i -> s[i] <> s[i+1]), i -> s[i] || ' ' || s[i+1])"
    )
    ctes = [
        "tok AS (SELECT unnest(" + TOKENS_SQL + ") AS w FROM documents)",
        "wrd AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt "
        "FROM tok GROUP BY 1)",
        "w0 AS (SELECT w, string_split(trim(regexp_replace(w, '(.)', "
        "'\\1 ', 'g')), ' ') AS s, cnt FROM wrd)",
    ]
    for r in range(rounds):
        ctes.append(
            f"c{r} AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM ("
            f"SELECT unnest({pairs}) AS pair, cnt FROM w{r}) GROUP BY 1)"
        )
        if r + 1 < rounds or emit_final:
            ctes.append(
                f"t{r} AS (SELECT string_split(pair, ' ')[1] AS a, "
                f"string_split(pair, ' ')[2] AS b FROM c{r} "
                f"ORDER BY n DESC, pair LIMIT 1)"
            )
            ctes.append(
                f"w{r + 1} AS (SELECT w, list_transform(list_filter("
                f"range(1, len(s) + 1), "
                f"i -> NOT (i > 1 AND s[i-1] = t.a AND s[i] = t.b)), "
                f"i -> CASE WHEN s[i] = t.a AND i < len(s) "
                f"AND s[i+1] = t.b THEN t.a || t.b ELSE s[i] END) AS s, "
                f"cnt FROM w{r} CROSS JOIN t{r} t)"
            )
    return ", ".join(ctes)


def _BPE_SQL(rounds: int = 3, top: int = 5) -> str:
    """Training-rounds report over :func:`_BPE_CTES` — per round the
    top ``top`` pairs by (count desc, pair asc)."""
    sel = " UNION ALL ".join(
        f"SELECT {r} AS rnd, pair, n FROM "
        f"(SELECT pair, n FROM c{r} ORDER BY n DESC, pair LIMIT {top})"
        for r in range(rounds)
    )
    return "WITH " + _BPE_CTES(rounds) + " " + sel


@register("q_bpe_train_rounds", _BPE_SQL())
def q_bpe_train_rounds(spark, sf_dir):
    """E4 (r7): three unrolled BPE training rounds — per round, the
    top-5 adjacent-symbol pairs over the vocab-sized word table with
    the previously selected merges APPLIED (so round 1 shows the
    post-merge statistics round 0 created, etc.). The trainer is
    deterministic (count-desc / pair-asc selection, positional merge
    with self-pairs excluded by contract), so the oracle replays the
    identical rounds in SQL and the evolving counts are hash-checked
    — the same eager-loop/unrolled-oracle device as the k-means and
    PQ trainers. Pure integer counts: bit-exact, no rounding."""
    from mhw3d_detection_spark.operators.textops import (
        bpe_round_pair_counts,
        bpe_train_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, rounds=3)
    parts = []
    for r in range(3):
        parts.append(
            bpe_round_pair_counts(docs, merges[:r])
            .orderBy(F.desc("n"), "pair")
            .limit(5)
            .select(F.lit(r).alias("rnd"), "pair", "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "q_similarity_ivfpq",
    _KMEANS_SQL()
    + ", "
    + _PQ_SQL(standalone=False)
    + ", codes AS (SELECT a0.vec_id, f.bucket, a0.bucket AS code0, "
    "  a1.bucket AS code1, a2.bucket AS code2, a3.bucket AS code3 "
    "  FROM p0afin a0 "
    "  JOIN p1afin a1 ON a0.vec_id = a1.vec_id "
    "  JOIN p2afin a2 ON a0.vec_id = a2.vec_id "
    "  JOIN p3afin a3 ON a0.vec_id = a3.vec_id "
    "  JOIN afin f ON a0.vec_id = f.vec_id), "
    "probes AS (SELECT vec_id AS probe_id, bucket, v AS pv FROM afin "
    "  WHERE vec_id % 50 = 0), "
    "dist AS (SELECT p.probe_id, t.vec_id, "
    f"  ((({_PQ_ADC_D(0)} + {_PQ_ADC_D(1)}) + {_PQ_ADC_D(2)}) + {_PQ_ADC_D(3)}) AS adc_d2 "
    "  FROM codes t JOIN probes p ON t.bucket = p.bucket "
    "  JOIN p0c2 k0 ON k0.bucket = t.code0 "
    "  JOIN p1c2 k1 ON k1.bucket = t.code1 "
    "  JOIN p2c2 k2 ON k2.bucket = t.code2 "
    "  JOIN p3c2 k3 ON k3.bucket = t.code3 "
    "  WHERE t.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY adc_d2 ASC, vec_id) AS INT) AS rank FROM dist) "
    "SELECT probe_id, vec_id, adc_d2, rank FROM ranked WHERE rank <= 5",
)
def q_similarity_ivfpq(spark, sf_dir):
    """E3 (r7): IVF-PQ — the FAISS IVFx,PQy index shape as DataFrame
    ops: a trained coarse quantizer prunes candidates to the probe's
    cell (1/n_cells of the corpus) and the PQ codes + per-probe LUT
    make each surviving candidate cost m lookups over the ~64x-smaller
    codes index — BOTH levers of billion-scale ANN composed. The
    oracle replays the coarse Lloyd's rounds AND all four subspace
    trainers in SQL; distances stay UNROUNDED (bit-exact fixed-order
    folds, like the flat ADC row)."""
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        kmeans_ivf_centroids,
        pq_adc_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = kmeans_ivf_centroids(emb, k=8, iters=3)
    tagged = assign_buckets(emb, coarse).select(
        "vec_id", "embedding", "bucket"
    )
    books = pq_train_codebooks(emb, m=4, ksub=4, iters=2)
    return pq_adc_topk(
        tagged,
        books,
        probe_pred=lambda c: c % 50 == 0,
        k=5,
        bucket_col="bucket",
    )


# =========================================================================
# E9 — shuffle-tuning diagnostics: partition-key skew profile (r7)
# =========================================================================
@register(
    "q_key_skew",
    "WITH c AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS cnt "
    "  FROM events GROUP BY 1), "
    "a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, "
    "  CAST(count(*) AS BIGINT) AS n_keys, "
    "  CAST(max(cnt) AS BIGINT) AS max_cnt, "
    "  quantile_cont(cnt, 0.5) AS p50_cnt, "
    "  quantile_cont(cnt, 0.9) AS p90_cnt, "
    "  quantile_cont(cnt, 0.99) AS p99_cnt, "
    "  sum(CAST(cnt AS DOUBLE) * cnt) AS ss FROM c) "
    "SELECT n_rows, n_keys, max_cnt, "
    f"  {rq_sql('p50_cnt', 4)} AS p50_cnt, "
    f"  {rq_sql('p90_cnt', 4)} AS p90_cnt, "
    f"  {rq_sql('p99_cnt', 4)} AS p99_cnt, "
    "  max_cnt / CAST(n_rows AS DOUBLE) AS top1_share, "
    "  ss / (CAST(n_rows AS DOUBLE) * n_rows) AS hhi FROM a",
)
def q_key_skew(spark, sf_dir):
    """E9 (r7): partition-key skew profile of events.user_id — the
    pre-flight diagnostic for shuffle tuning (would a groupBy/join on
    this key straggle? is salting/AQE-skew-split needed?). Two hash
    aggregates: per-key counts (keys-sized), then a single summary
    row. top1_share is an exact integer ratio; hhi accumulates
    Σcnt² in DOUBLE (each term an exact integer < 2^53, so still
    bit-identical cross-engine at any test SF) over a double n_rows² —
    int64 Σcnt²/n_rows² would silently wrap past ~3e9 rows in non-ANSI
    Spark while DuckDB raises. Count percentiles exact linear-interp,
    rq4."""
    from mhw3d_detection_spark.operators.analysis import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    out = key_skew_profile(ev, "user_id")
    return out.select(
        "n_rows",
        "n_keys",
        "max_cnt",
        rq("p50_cnt", 4).alias("p50_cnt"),
        rq("p90_cnt", 4).alias("p90_cnt"),
        rq("p99_cnt", 4).alias("p99_cnt"),
        "top1_share",
        "hhi",
    )


# =========================================================================
# E4 — Kneser-Ney smoothed bigram LM (r7: the modern-LM-filter scorer
# one smoothing class up from the interpolated row)
# =========================================================================
@register(
    "q_text_logprob_kn",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "bgp AS (SELECT doc_id, toks, "
    "  unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM d), "
    "bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM bgp), "
    "bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2), "
    "hc AS (SELECT w1, sum(c2) AS c1, count(*) AS nfw FROM bc GROUP BY 1), "
    "cc AS (SELECT w2, count(*) AS nbw FROM bc GROUP BY 1), "
    "bt AS (SELECT count(*) AS nt FROM bc), "
    "scored AS (SELECT g.doc_id, "
    "  ln((bc.c2 - 0.75) / hc.c1 + 0.75 * hc.nfw / hc.c1 "
    "     * (cc.nbw / (1.0 * bt.nt))) AS lp "
    "  FROM bg g JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2 "
    "  JOIN hc ON g.w1 = hc.w1 JOIN cc ON g.w2 = cc.w2 CROSS JOIN bt) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
    f"{rq_sql('avg(lp)', 4)} AS mean_logprob_kn "
    "FROM scored GROUP BY 1",
)
def q_text_logprob_kn(spark, sf_dir):
    """E4 (r7): mean interpolated Kneser-Ney bigram log-probability
    per document (Kneser & Ney ICASSP'95; Chen & Goodman'98 eq. 4.22
    at bigram order) — P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·) +
    D·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|, D = 0.75. The
    backoff mass goes to CONTINUATION counts (how many distinct
    contexts a word follows), the device that makes KN the standard
    LM smoothing — 'francisco' is frequent but only ever follows
    'san', so its unigram backoff is small. All component tables are
    hash aggregates over the bigram-type table: hc/cc are
    vocab-sized broadcast dims, the type total is a 1-row scalar;
    scoring the corpus's own bigrams means every c2 >= 1 so the
    discount never floors (no max branch divergence cross-engine).
    Same plan shape as q_text_logprob_bigram."""
    from mhw3d_detection_spark.operators.textops import tokens_col, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    n_bg = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n_bg), F.slice("toks", 2, n_bg)
                )
            ).alias("z"),
        )
        .select("doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    hc = bc.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("nfw")
    )
    cc = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("nbw"))
    bt = bc.agg(F.count(F.lit(1)).cast("double").alias("__nt"))
    scored = (
        bg.join(bc, ["w1", "w2"])
        .join(F.broadcast(hc), "w1")
        .join(F.broadcast(cc), "w2")
        .crossJoin(F.broadcast(bt))
        .withColumn(
            "lp",
            F.log(
                (F.col("c2") - 0.75) / F.col("c1")
                + 0.75 * F.col("nfw") / F.col("c1")
                * (F.col("nbw") / F.col("__nt"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        rq(F.avg("lp"), 4).alias("mean_logprob_kn"),
    )


# =========================================================================
# E3 — ANN quality evaluation: recall@k of the bucketed path vs exact
# brute force (r7) — the metric every ANN deployment watches
# =========================================================================
@register(
    "q_ann_recall",
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v "
    "  FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label, v AS pv FROM base "
    "  WHERE vec_id % 50 = 0), "
    "es AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "er AS (SELECT probe_id, vec_id, CAST(row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rank "
    "  FROM es), "
    "e AS (SELECT probe_id, vec_id FROM er WHERE rank <= 5), "
    "asims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine "
    "  FROM base b JOIN probes p ON b.label = p.label "
    "  WHERE b.vec_id <> p.probe_id), "
    "ar AS (SELECT probe_id, vec_id, CAST(row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rank "
    "  FROM asims), "
    "a AS (SELECT probe_id, vec_id FROM ar WHERE rank <= 5) "
    "SELECT e.probe_id, CAST(count(*) AS BIGINT) AS n_exact, "
    "  CAST(count(a.vec_id) AS BIGINT) AS n_hit, "
    "  count(a.vec_id) / CAST(count(*) AS DOUBLE) AS recall "
    "FROM e LEFT JOIN a ON e.probe_id = a.probe_id "
    "  AND e.vec_id = a.vec_id "
    "GROUP BY e.probe_id",
)
def q_ann_recall(spark, sf_dir):
    """E3 (r7): recall@5 of the IVF-bucketed search against the exact
    brute-force top-5, per probe — the quality metric every ANN
    deployment trades against its speedup (the IVF cell prune can
    only MISS neighbors, never invent them, so recall is the whole
    story). Composes the two existing search paths and joins their
    result sets: one left equi-join on (probe, neighbor) + a
    probe-keyed count — at 100 TB this evaluates on a probe SAMPLE,
    same plan. recall = integer-count ratio, one exact division —
    unrounded, bit-identical cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5).select(
        "probe_id", "vec_id"
    )
    approx = (
        cosine_topk(
            emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
        )
        .select("probe_id", "vec_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(approx, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit").alias("n_hit"),
            (
                F.count("__hit") / F.count(F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


# =========================================================================
# E4 — signed feature hashing (r7: vocabulary-free featurization)
# =========================================================================
@register(
    "q_feature_hash",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "h AS (SELECT doc_id, "
    "  ('0x' || substr(md5(token), 1, 12))::BIGINT AS hv FROM tok) "
    "SELECT doc_id, CAST(hv % 64 AS INT) AS bucket, "
    "  CAST(sum(1 - 2 * ((hv >> 6) & 1)) AS BIGINT) AS val "
    "FROM h GROUP BY 1, 2",
)
def q_feature_hash(spark, sf_dir):
    """E4 (r7): signed feature hashing (Weinberger et al. ICML'09) —
    64-dim text featurization with NO vocabulary: bucket = md5 mod
    64, sign = an independent hash bit, per-(doc, bucket) signed
    sums. The no-vocab property is the 100 TB point (no build pass,
    no broadcast dim, no OOV); integer end-to-end, bit-exact."""
    from mhw3d_detection_spark.operators.textops import feature_hash_vectors

    docs = load_table(spark, sf_dir, "documents")
    return feature_hash_vectors(docs)


@register(
    "q_bpe_encode",
    "WITH " + _BPE_CTES(3, emit_final=True)
    + ", dtok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS w "
    "  FROM documents), "
    "enc AS (SELECT w, CAST(length(w) AS BIGINT) AS nc, "
    "  CAST(len(s) AS BIGINT) AS ns FROM w3) "
    "SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
    "  CAST(sum(e.nc) AS BIGINT) AS n_chars, "
    "  CAST(sum(e.ns) AS BIGINT) AS n_symbols, "
    "  sum(e.nc) / CAST(sum(e.ns) AS DOUBLE) AS chars_per_symbol "
    "FROM dtok d JOIN enc e ON d.w = e.w GROUP BY 1",
)
def q_bpe_encode(spark, sf_dir):
    """E4 (r7): the BPE train→deploy seam — the 3 trained merges
    applied once per DISTINCT word (vocab-sized dict), documents
    broadcast-join the dict, and per-doc symbol counts quantify the
    compression the merge list bought. The oracle replays the unrolled
    training rounds AND the final dictionary encode; integer counts +
    one exact division, hash-checked."""
    from mhw3d_detection_spark.operators.textops import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, rounds=3)
    return bpe_encode_stats(docs, merges)


# =========================================================================
# E2 — MinHash estimator calibration (r7: the eval layer for dedup,
# as q_ann_recall is for ANN)
# =========================================================================
@register(
    "q_minhash_calibration",
    f"WITH {SHINGLES_SQL}, "
    "shx AS (SELECT doc_id, "
    "  ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS x FROM sh), "
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"min(({MINHASH_A[i]} * x + {MINHASH_B[i]}) % {MINHASH_M}) AS h{i}"
        for i in range(8)
    )
    + " FROM shx GROUP BY 1), "
    "pr AS (SELECT doc_id AS doc_a, "
    + ", ".join(f"h{i} AS ha{i}" for i in range(8))
    + " FROM sig WHERE doc_a % 2 = 0), "
    "est AS (SELECT pr.doc_a, s.doc_id AS doc_b, "
    + " + ".join(
        f"CASE WHEN s.h{i} = pr.ha{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    + " AS m FROM sig s CROSS JOIN pr WHERE pr.doc_a < s.doc_id), "
    "dsh AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "  count(*) AS i FROM dsh a JOIN dsh b ON a.shingle = b.shingle "
    "  WHERE a.doc_id % 2 = 0 AND a.doc_id < b.doc_id GROUP BY 1, 2), "
    "ex AS (SELECT i.doc_a, i.doc_b, "
    "  i / CAST(za.sz + zb.sz - i AS DOUBLE) AS jac FROM inter i "
    "  JOIN sz za ON i.doc_a = za.doc_id "
    "  JOIN sz zb ON i.doc_b = zb.doc_id "
    "  WHERE i / CAST(za.sz + zb.sz - i AS DOUBLE) >= 0.05) "
    "SELECT e.m AS n_slot_matches, e.m / 8.0 AS est_jaccard, "
    "  CAST(count(*) AS BIGINT) AS n_pairs, "
    f"  {rq_sql('avg(x.jac)', 4)} AS mean_exact_jaccard "
    "FROM est e JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b "
    "GROUP BY 1, 2",
)
def q_minhash_calibration(spark, sf_dir):
    """E2 (r7): MinHash estimator calibration — for sample pairs with
    exact 3-gram Jaccard >= 0.05, bin by the number of matching
    minhash slots and report the mean exact Jaccard per bin: the
    curve that tells a dedup operator what threshold its
    matches-of-8 estimate actually buys (Broder'97: each slot
    matches with probability J, so est_jaccard = m/8 should track
    the bin mean). Slot matches are integer-exact; the per-bin mean
    is rq4. The eval-layer row for E2, as q_ann_recall is for E3."""
    from mhw3d_detection_spark.operators.textops import (
        minhash_estimate_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    est = minhash_estimate_pairs(docs, probe_pred=lambda c: c % 2 == 0)
    ex = ngram_jaccard_pairs(
        docs, probe_pred=lambda c: c % 2 == 0, min_jaccard=0.05
    )
    return (
        est.join(ex, ["doc_a", "doc_b"])
        .groupBy("n_slot_matches", "est_jaccard")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            rq(F.avg("jaccard"), 4).alias("mean_exact_jaccard"),
        )
    )


# =========================================================================
# E3 — multi-probe IVF (r7: the FAISS nprobe recall lever)
# =========================================================================
_MP_D2 = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (b.v[i] - c.c[i]) * (b.v[i] - c.c[i])))"
)


@register(
    "q_similarity_ivf_multiprobe",
    _KMEANS_SQL()
    + ", p2 AS (SELECT vec_id, bucket FROM ("
    "  SELECT b.vec_id, c.bucket, row_number() OVER ("
    f"  PARTITION BY b.vec_id ORDER BY {_MP_D2} ASC, c.bucket ASC) AS rn "
    "  FROM base b CROSS JOIN c3 c WHERE b.vec_id % 50 = 0) "
    "  WHERE rn <= 2), "
    "probes AS (SELECT p2.vec_id AS probe_id, p2.bucket, b.v AS pv "
    "  FROM p2 JOIN base b ON p2.vec_id = b.vec_id), "
    "sims AS (SELECT p.probe_id, t.vec_id, "
    "  list_cosine_similarity(t.v, p.pv) AS cosine "
    "  FROM afin t JOIN probes p ON t.bucket = p.bucket "
    "  WHERE t.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM sims) "
    f"SELECT probe_id, vec_id, {rq_sql('cosine', 4)} AS cosine, rank "
    "FROM ranked WHERE rank <= 5",
)
def q_similarity_ivf_multiprobe(spark, sf_dir):
    """E3 (r7): multi-probe IVF — each probe searches its 2 nearest
    trained cells (the FAISS nprobe recall lever: missed neighbors sit
    just across the cell boundary, so the runner-up cell recovers most
    of the recall gap at 2x candidate cost; the corpus index is
    untouched). The oracle replays the Lloyd's rounds, ranks each
    probe's cells by the same exact distance fold (rn <= 2 == the
    array_sort struct order), and reruns the bucketed search over the
    exploded (probe, cell) set."""
    from mhw3d_detection_spark.operators.similarity import (
        cosine_topk_multiprobe,
        kmeans_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_ivf_centroids(emb, k=8, iters=3)
    return cosine_topk_multiprobe(
        emb, cents, probe_pred=lambda c: c % 50 == 0, k=5, n_probe=2
    ).select("probe_id", "vec_id", rq("cosine", 4).alias("cosine"), "rank")


# =========================================================================
# E-FLAGSHIP (r7) — composed retrieval pipeline: BM25 lexical leg +
# trained IVF-PQ dense leg, fused by RRF. Every stage has its own
# oracle row elsewhere; THIS row hash-verifies the composition, the
# serving-side twin of q_curate_corpus.
# =========================================================================
_RP_BM25 = (
    "tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), "
    "nd AS (SELECT count(*) * 1.0 AS n FROM documents), "
    "ad AS (SELECT avg(dl) AS avgdl FROM dl), "
    "hit AS (SELECT doc_id, token FROM tok WHERE token IN "
    f"({', '.join(repr(t) for t in sorted(_BM25_TERMS))})), "
    "tf AS (SELECT doc_id, token, count(*) AS tf FROM hit GROUP BY 1, 2), "
    "bdf AS (SELECT token, count(DISTINCT doc_id) AS df FROM hit GROUP BY 1), "
    "idf AS (SELECT token, ln(1.0 + (nd.n - df + 0.5) / (df + 0.5)) AS idf "
    "  FROM bdf CROSS JOIN nd), "
    "c AS (SELECT tf.doc_id, "
    f"  {rq_sql('idf.idf * (tf.tf * 2.25) / (tf.tf + 1.25 * (0.25 + 0.75 * dl.dl / ad.avgdl))', 6)} AS cq "
    "  FROM tf JOIN idf ON tf.token = idf.token "
    "  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN ad), "
    f"s AS (SELECT doc_id, {rq_sql('sum(cq)', 4)} AS score FROM c GROUP BY 1), "
    "lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) "
    "  AS lex_rank FROM s)"
)


@register(
    "q_retrieval_pipeline",
    "WITH "
    + _RP_BM25
    + ", "
    # _KMEANS_SQL carries its own WITH prefix; strip it to compose
    + _KMEANS_SQL()[len("WITH ") :]
    + ", "
    + _PQ_SQL(standalone=False)
    + ", codes AS (SELECT a0.vec_id, f0.bucket, a0.bucket AS code0, "
    "  a1.bucket AS code1, a2.bucket AS code2, a3.bucket AS code3 "
    "  FROM p0afin a0 "
    "  JOIN p1afin a1 ON a0.vec_id = a1.vec_id "
    "  JOIN p2afin a2 ON a0.vec_id = a2.vec_id "
    "  JOIN p3afin a3 ON a0.vec_id = a3.vec_id "
    "  JOIN afin f0 ON a0.vec_id = f0.vec_id), "
    "pp AS (SELECT vec_id AS probe_id, bucket, v AS pv FROM afin "
    "  WHERE vec_id = 0), "
    "dist AS (SELECT p.probe_id, t.vec_id, "
    f"  ((({_PQ_ADC_D(0)} + {_PQ_ADC_D(1)}) + {_PQ_ADC_D(2)}) + {_PQ_ADC_D(3)}) AS adc_d2 "
    "  FROM codes t JOIN pp p ON t.bucket = p.bucket "
    "  JOIN p0c2 k0 ON k0.bucket = t.code0 "
    "  JOIN p1c2 k1 ON k1.bucket = t.code1 "
    "  JOIN p2c2 k2 ON k2.bucket = t.code2 "
    "  JOIN p3c2 k3 ON k3.bucket = t.code3 "
    "  WHERE t.vec_id <> p.probe_id), "
    "annr AS (SELECT vec_id AS doc_id, ann_rank FROM ("
    "  SELECT vec_id, CAST(row_number() OVER (ORDER BY adc_d2 ASC, vec_id) "
    "    AS INT) AS ann_rank FROM dist) WHERE ann_rank <= 64), "
    "fz AS (SELECT coalesce(l.doc_id, a.doc_id) AS doc_id, l.lex_rank, a.ann_rank, "
    "  coalesce(1.0 / (60.0 + l.lex_rank), 0.0) + coalesce(1.0 / (60.0 + a.ann_rank), 0.0) AS rrf "
    "  FROM lexr l FULL OUTER JOIN annr a ON l.doc_id = a.doc_id) "
    "SELECT doc_id, lex_rank, ann_rank, rrf FROM fz "
    "ORDER BY rrf DESC, doc_id LIMIT 20",
)
def q_retrieval_pipeline(spark, sf_dir):
    """E-FLAGSHIP (r7): the composed retrieval pipeline — train the
    coarse quantizer (unrolled Lloyd's) AND the four PQ subspace
    codebooks, build the IVF-PQ dense ranking around probe vec 0,
    the BM25 lexical ranking of the fixed term bag, and fuse by RRF.
    Every stage has its own hash-checked row; this row hash-verifies
    the COMPOSITION end to end (the serving-side twin of
    q_curate_corpus). Integer ranks + exactly-rounded divisions keep
    the fused scores bit-identical with no tolerance."""
    from mhw3d_detection_spark.plans.retrieval import retrieval_search

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval_search(docs, emb, _BM25_TERMS, probe_vec_id=0)


@register(
    "q_feature_hash_dense",
    "WITH tok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "h AS (SELECT doc_id, "
    "  ('0x' || substr(md5(token), 1, 12))::BIGINT AS hv FROM tok), "
    "agg AS (SELECT doc_id, CAST(hv % 64 AS INT) AS b, "
    "  CAST(sum(1 - 2 * ((hv >> 6) & 1)) AS BIGINT) AS v "
    "  FROM h GROUP BY 1, 2), "
    "grid AS (SELECT d.doc_id, CAST(bb.b AS INT) AS b FROM documents d "
    "  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb) "
    "SELECT g.doc_id, g.b AS bucket, "
    "  CAST(coalesce(a.v, 0) AS BIGINT) AS val "
    "FROM grid g LEFT JOIN agg a ON g.doc_id = a.doc_id AND g.b = a.b",
)
def q_feature_hash_dense(spark, sf_dir):
    """E4 (r7): the row-local DENSE feature-hash twin, exploded for
    the oracle — per doc the full 64-bucket signed-sum vector computed
    as one fold over the doc's own tokens (zero shuffles, streamable:
    `streaming_feature_hash` is this same projection). Bit-equal to
    the grouped sparse builder on touched buckets (differential test)
    and to this SQL on all 64."""
    from mhw3d_detection_spark.operators.textops import feature_hash_dense

    docs = load_table(spark, sf_dir, "documents")
    return feature_hash_dense(docs).select(
        "doc_id", F.posexplode("features").alias("bucket", "val")
    )


# =========================================================================
# E4 — PageRank over the token co-occurrence graph (r7: the canonical
# iterative graph workload, rounds unrolled in the oracle — a pure
# lazy plan chain, no driver loop, unlike the k-means/BPE trainers)
# =========================================================================
def _PAGERANK_SQL(iters: int = 3, damping: float = 0.85, top: int = 50) -> str:
    ctes = [
        "pgd AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents)",
        "pgp AS (SELECT doc_id, toks, "
        "unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM pgd)",
        "pge AS (SELECT DISTINCT toks[i] AS src, toks[i + 1] AS dst FROM pgp)",
        "pgn AS (SELECT src AS token FROM pge UNION SELECT dst FROM pge)",
        "pgdeg AS (SELECT src, count(*) AS outdeg FROM pge GROUP BY 1)",
        "pgnn AS (SELECT count(*) * 1.0 AS n FROM pgn)",
        "pr0 AS (SELECT token, 1.0 / pgnn.n AS pr FROM pgn CROSS JOIN pgnn)",
    ]
    for r in range(1, iters + 1):
        ctes.append(
            f"pc{r} AS (SELECT e.dst AS token, sum(p.pr / g.outdeg) AS cin "
            f"FROM pge e JOIN pgdeg g ON e.src = g.src "
            f"JOIN pr{r - 1} p ON e.src = p.token GROUP BY 1)"
        )
        ctes.append(
            f"pr{r} AS (SELECT pgn.token, "
            + rq_sql(
                f"{1.0 - damping!r} / pgnn.n + {damping!r} * coalesce(c.cin, 0.0)",
                6,
            )
            + f" AS pr FROM pgn LEFT JOIN pc{r} c ON pgn.token = c.token "
            "CROSS JOIN pgnn)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT token, pr FROM pr{iters} "
        f"ORDER BY pr DESC, token LIMIT {top}"
    )


@register("q_token_pagerank", _PAGERANK_SQL())
def q_token_pagerank(spark, sf_dir):
    """E4 (r7): 3 power-iteration rounds of PageRank over the distinct
    word-bigram graph (TextRank's keyword-ranking setup) — the
    canonical iterative graph workload as a PURE LAZY PLAN: rank state
    lives in the DataFrame chain (edge-join + token-keyed aggregate
    per round, one shuffle each), no driver collect at all — the third
    structural shape for iterative algorithms in this repo next to the
    eager trainers (k-means, BPE) and pointer-doubled CC. Per-round
    rq6 rank quantization keeps cross-engine summation-order noise
    from compounding (the k-means centroid device); dangling-token
    mass leaks by documented contract (non-stochastic variant — a
    ranking signal, not a probability). Top-50 by (pr desc, token)."""
    from mhw3d_detection_spark.operators.textops import token_pagerank

    docs = load_table(spark, sf_dir, "documents")
    return (
        token_pagerank(docs, iters=3, damping=0.85, truncate=True)
        .orderBy(F.desc("pr"), "token")
        .limit(50)
    )


# =========================================================================
# E2 (r7) — exact set-similarity join with prefix filtering (PPJoin)
# =========================================================================
#: DELIBERATELY independent oracle formulation: prefix via window
#: row_number (Spark uses array_sort + slice), intersection via
#: join-count (Spark uses array_intersect) — the hash match pins the
#: ALGORITHM (lossless prefix filter + exact verify), not one encoding.
_SETSIM_SQL = (
    f"WITH {SHINGLES_SQL}, "
    "u AS (SELECT DISTINCT doc_id, shingle AS token FROM sh), "
    "sz AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1), "
    "dfq AS (SELECT token, count(*) AS dfc FROM u GROUP BY 1), "
    "r AS (SELECT u.doc_id, u.token, sz.n, "
    "  row_number() OVER (PARTITION BY u.doc_id ORDER BY dfq.dfc, u.token) AS rn "
    "  FROM u JOIN dfq USING (token) JOIN sz USING (doc_id)), "
    "pref AS (SELECT doc_id, token, n FROM r WHERE rn <= n - ceil(n * 0.5) + 1), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "    a.n AS na, b.n AS nb "
    "  FROM pref a JOIN pref b ON a.token = b.token AND a.doc_id < b.doc_id "
    "    AND a.n * 0.5 <= b.n AND b.n * 0.5 <= a.n), "
    "i AS (SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS n_inter "
    "  FROM cand c "
    "  JOIN u ua ON ua.doc_id = c.doc_a "
    "  JOIN u ub ON ub.doc_id = c.doc_b AND ub.token = ua.token "
    "  GROUP BY 1, 2, 3, 4) "
    "SELECT doc_a, doc_b, CAST(na AS INT) AS na, CAST(nb AS INT) AS nb, "
    "CAST(n_inter AS INT) AS n_inter, "
    "n_inter / (na + nb - n_inter) AS jaccard "
    "FROM i WHERE n_inter * 1.5 >= 0.5 * (na + nb)"
)


@register("q_dedup_setsim_prefix", _SETSIM_SQL)
def q_dedup_setsim_prefix(spark, sf_dir):
    """E2 (r7): EXACT set-similarity self-join at Jaccard >= 0.5 over
    distinct word-3-gram shingle sets, candidates generated by the
    LOSSLESS prefix filter (AllPairs/PPJoin, Bayardo WWW'07) — the
    deterministic fourth member of the near-dup family: MinHash-LSH
    (probabilistic), SimHash (Hamming), winnowing (fingerprints) find
    candidates with false negatives possible at their parameter
    margins; this one is exact by construction. Join-key cardinality
    is the shingle vocabulary, which grows with the corpus — the
    scale property the r6 verdict demanded of candidate generators.
    Brute-force equivalence is pinned in pytest
    (tests/test_extensions.py::TestSetsimPrefix)."""
    from mhw3d_detection_spark.operators.textops import setsim_prefix_pairs

    docs = load_table(spark, sf_dir, "documents")
    return setsim_prefix_pairs(docs, threshold=0.5, shingle_n=3)


# =========================================================================
# E3c (r7) — distributed PCA: top principal component by power iteration
# =========================================================================
def _PCA_SQL(iters: int = 3) -> str:
    """Unrolled power-iteration oracle — every round is EXACT dyadic
    arithmetic (1/64-grid inputs -> 1/4096-grid Gram -> exact matvec
    sums -> exact max-norm -> requantize), so the hash match pins all
    ``iters`` rounds, the final L2 normalization and the Rayleigh
    quotient, not a rounded approximation of them."""
    eps = 0.5 + 2.0**-16

    def dq(e: str) -> str:
        return f"floor(({e}) * 64.0 + {eps!r}) / 64.0"

    ctes = [
        "e AS (SELECT vec_id, embedding AS v FROM embeddings)",
        "xi AS (SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)",
        f"x AS (SELECT vec_id, i, {dq('v[i]')} AS q FROM xi)",
        "g AS (SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS c "
        "FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2)",
        "v0 AS (SELECT DISTINCT i, 0.125 AS vv FROM x)",
    ]
    prev = "v0"
    for r in range(1, iters + 1):
        ctes += [
            f"w{r} AS (SELECT g.i, sum(g.c * {prev}.vv) AS w "
            f"FROM g JOIN {prev} ON {prev}.i = g.j GROUP BY 1)",
            f"m{r} AS (SELECT max(abs(w)) AS m FROM w{r})",
            f"v{r} AS (SELECT i, {dq('w / m')} AS vv FROM w{r}, m{r})",
        ]
        prev = f"v{r}"
    ctes += [
        f"s AS (SELECT sum(vv * vv) AS s2 FROM {prev})",
        f"cv AS (SELECT g.i, sum(g.c * vv) AS cw "
        f"FROM g JOIN {prev} ON {prev}.i = g.j GROUP BY 1)",
        f"ray AS (SELECT sum(cv.cw * {prev}.vv) AS num "
        f"FROM cv JOIN {prev} USING (i))",
    ]
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT CAST(i - 1 AS INT) AS dim_idx, vv / sqrt(s2) AS loading, "
        f"num / s2 AS eigval FROM {prev}, s, ray"
    )


@register("q_embed_pca_power", _PCA_SQL(3))
def q_embed_pca_power(spark, sf_dir):
    """E3c (r7): top principal direction of the embedding
    second-moment matrix — double-explode Gram aggregate (ONE data
    pass; the Gram is d^2 = 4096 rows at ANY corpus size) + 3
    power-iteration rounds as a pure lazy plan. Max-norm
    normalization keeps every round on an exact dyadic grid (see
    ``operators.similarity.pca_top_component``), so loadings and the
    Rayleigh eigenvalue hash-match DuckDB with NO output
    quantization at all — raw doubles, same bits."""
    from mhw3d_detection_spark.operators.similarity import pca_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top_component(emb, iters=3)


# =========================================================================
# E3d (r7) — MMR diversification of a retrieval pool
# =========================================================================
def _MMR_SQL(probe: int = 0, k: int = 5, pool: int = 20, lam: float = 0.5) -> str:
    """Unrolled greedy oracle: round r's argmax replays exactly because
    rel/sim are rq6-quantized and lam is dyadic (two exactly-rounded
    products per score; ties broken by vec_id in both engines)."""
    l_ = repr(float(lam))
    m_ = repr(1.0 - float(lam))
    ctes = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"pr AS (SELECT v AS pv FROM base WHERE vec_id = {probe})",
        "sc AS (SELECT b.vec_id, list_cosine_similarity(b.v, pr.pv) AS cosine "
        f"FROM base b, pr WHERE b.vec_id <> {probe})",
        f"pool AS (SELECT vec_id, {rq_sql('cosine', 6)} AS rel FROM sc "
        f"ORDER BY cosine DESC, vec_id LIMIT {pool})",
        "pv AS (SELECT vec_id, v FROM base "
        "WHERE vec_id IN (SELECT vec_id FROM pool))",
        "sims AS (SELECT a.vec_id AS a, b.vec_id AS b, "
        f"{rq_sql('list_cosine_similarity(a.v, b.v)', 6)} AS sim "
        "FROM pv a JOIN pv b ON a.vec_id <> b.vec_id)",
        f"sel1 AS (SELECT 1 AS rank, vec_id, rel, {l_} * rel AS mmr_score "
        "FROM pool ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    prev = "sel1"
    for r in range(2, int(k) + 1):
        ctes += [
            f"m{r} AS (SELECT s.a AS vec_id, max(s.sim) AS msim FROM sims s "
            f"WHERE s.b IN (SELECT vec_id FROM {prev}) GROUP BY 1)",
            f"p{r} AS (SELECT {r} AS rank, p.vec_id, p.rel, "
            f"{l_} * p.rel - {m_} * m.msim AS mmr_score "
            f"FROM pool p JOIN m{r} m USING (vec_id) "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev}) "
            "ORDER BY mmr_score DESC, vec_id LIMIT 1)",
            f"sel{r} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{r})",
        ]
        prev = f"sel{r}"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT CAST(rank AS INT) AS rank, vec_id, rel, mmr_score FROM {prev}"
    )


@register("q_retrieval_mmr", _MMR_SQL(0, 5, 20, 0.5))
def q_retrieval_mmr(spark, sf_dir):
    """E3d (r7): MMR-diversified top-5 from a 20-candidate relevance
    pool around probe vec_id 0 (lambda = 0.5) — the redundancy-aware
    re-rank that completes the retrieval stack (BM25 / ANN / RRF /
    rerank / MMR). Distributed pool retrieval + candidate-bounded
    pairwise cosines; the k greedy rounds run over checkpointed
    pool-sized frames and replay EXACTLY in the unrolled SQL (rq6
    scores, dyadic lambda, vec_id tie-break)."""
    from mhw3d_detection_spark.operators.similarity import mmr_diversify

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_diversify(emb, 0, k=5, pool=20, lam=0.5)


# =========================================================================
# E4f (r7) — cross-source quantile normalization of the quality score
# =========================================================================
_QNORM_SQL = (
    "WITH d AS (SELECT doc_id, source, text, "
    + TOKENS_SQL
    + " AS toks FROM documents), "
    f"feat AS (SELECT doc_id, source, text, {QFEATURES_SQL} FROM d), "
    f"sc AS (SELECT doc_id, source, {QLOGIT_SQL()} AS score FROM feat), "
    "s AS (SELECT * FROM sc WHERE score IS NOT NULL), "
    "p AS (SELECT doc_id, source, score, "
    "  percent_rank() OVER (PARTITION BY source ORDER BY score) AS p FROM s), "
    "r AS (SELECT score AS v, "
    "  row_number() OVER (ORDER BY score, doc_id) AS rn FROM s), "
    "n AS (SELECT count(*) AS nn FROM s), "
    "x AS (SELECT p.*, p.p * (n.nn - 1) + 1 AS pos, n.nn FROM p, n), "
    "y AS (SELECT x.*, CAST(floor(pos) AS BIGINT) AS lo, "
    "  least(CAST(floor(pos) AS BIGINT) + 1, nn) AS hi FROM x), "
    "z AS (SELECT y.doc_id, y.source, y.score, y.p, "
    "  y.pos - y.lo AS f2, rlo.v AS vlo, rhi.v AS vhi "
    "  FROM y JOIN r rlo ON rlo.rn = y.lo JOIN r rhi ON rhi.rn = y.hi) "
    f"SELECT doc_id, source, {rq_sql('score', 6)} AS score, "
    f"{rq_sql('p', 6)} AS src_frac, "
    f"{rq_sql('vlo + f2 * (vhi - vlo)', 6)} AS norm_score FROM z"
)


@register("q_quantile_normalize", _QNORM_SQL)
def q_quantile_normalize(spark, sf_dir):
    """E4f (r7): calibrate the quality logit ACROSS sources — each
    doc's within-source percent-rank is mapped to the pooled score
    distribution at the same fraction (CCNet's per-language
    calibration, generalized), so a post-normalization threshold
    prunes every source at the same rate. percent_rank + two-phase
    global row_number + two integer equi-joins; integer rank
    arithmetic end to end, rq6 display."""
    from mhw3d_detection_spark.operators.textops import (
        quality_scores,
        quantile_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_scores(docs).select("doc_id", "source", "quality_logit")
    out = quantile_normalize(
        scored, score_col="quality_logit", group_col="source"
    )
    return out.select(
        "doc_id",
        "source",
        rq("score", 6).alias("score"),
        rq("src_frac", 6).alias("src_frac"),
        rq("norm_score", 6).alias("norm_score"),
    )


# =========================================================================
# E6d (r7) — per-source KL divergence from the pooled token distribution
# =========================================================================
_SDIV_SQL = (
    "WITH t AS (SELECT source, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "st AS (SELECT source, token, count(*) AS c FROM t GROUP BY 1, 2), "
    "stot AS (SELECT source, sum(c) AS n_s FROM st GROUP BY 1), "
    "pool AS (SELECT token, sum(c) AS cq FROM st GROUP BY 1), "
    "qtot AS (SELECT sum(cq) AS n_q FROM pool), "
    "j AS (SELECT st.source, st.c / s.n_s AS p, pool.cq / q.n_q AS q "
    "  FROM st JOIN pool USING (token) JOIN stot s USING (source), qtot q) "
    "SELECT source, "
    "(SELECT n_s FROM stot WHERE stot.source = j.source) AS n_tokens, "
    f"{rq_sql('sum(p * ln(p / q))', 4)} AS kl, "
    f"{rq_sql('sum(-p * ln(q))', 4)} AS cross_entropy, "
    f"{rq_sql('sum(-p * ln(p))', 4)} AS entropy "
    "FROM j GROUP BY source"
)


@register("q_source_divergence", _SDIV_SQL)
def q_source_divergence(spark, sf_dir):
    """E6d (r7): which source is off-domain — per-source unigram
    KL(P_s || Q_pool) with cross-entropy and entropy (KL = CE − H),
    the table DoReMi-style mixture reweighting starts from. One
    token-keyed shuffle; the pooled counts aggregate the per-source
    aggregate (no second scan); sources-sized output, rq4 display
    (ln ranks sources, it gates nothing)."""
    from mhw3d_detection_spark.operators.textops import source_divergence

    docs = load_table(spark, sf_dir, "documents")
    d = source_divergence(docs)
    return d.select(
        "source",
        "n_tokens",
        rq("kl", 4).alias("kl"),
        rq("cross_entropy", 4).alias("cross_entropy"),
        rq("entropy", 4).alias("entropy"),
    )


# =========================================================================
# O7 (r7) — per-group top-k without a hot partition
# =========================================================================
_TOPK_GRP_SQL = (
    "WITH d AS (SELECT doc_id, source, text, "
    + TOKENS_SQL
    + " AS toks FROM documents), "
    f"feat AS (SELECT doc_id, source, text, {QFEATURES_SQL} FROM d), "
    f"sc AS (SELECT doc_id, source, {QLOGIT_SQL()} AS score FROM feat "
    "  WHERE text IS NOT NULL), "
    "r AS (SELECT doc_id, source, score, CAST(row_number() OVER ("
    "  PARTITION BY source ORDER BY score DESC, doc_id) AS INT) AS rank "
    "  FROM sc) "
    f"SELECT source, rank, doc_id, {rq_sql('score', 6)} AS score "
    "FROM r WHERE rank <= 3"
)


@register("q_topk_per_group", _TOPK_GRP_SQL)
def q_topk_per_group(spark, sf_dir):
    """O7 (r7): the 3 highest-quality docs per source — per-group
    top-k via the SALTED two-phase rank (``topk_per_group``): a plain
    per-source window would funnel each source's whole slice through
    one reducer (sources are few, the corpus is not). The oracle is
    the single-window form — the hash match is the
    two-phase ≡ one-window equivalence proof."""
    from mhw3d_detection_spark.operators.analysis import topk_per_group
    from mhw3d_detection_spark.operators.textops import quality_scores

    docs = load_table(spark, sf_dir, "documents")
    sc = (
        quality_scores(docs)
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", F.col("quality_logit").alias("score"))
    )
    out = topk_per_group(sc, ["source"], "score", 3, tie_col="doc_id")
    return out.select("source", "rank", "doc_id", rq("score", 6).alias("score"))


# =========================================================================
# E6e (r7) — weighted sampling without replacement (A-ES)
# =========================================================================
_WSAMPLE_SQL = (
    "WITH k AS (SELECT doc_id, source, n_chars, "
    "  ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 12))::BIGINT) "
    "    / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS raw_key "
    "  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0) "
    f"SELECT doc_id, source, n_chars, {rq_sql('raw_key', 6)} AS sample_key "
    "FROM k ORDER BY sample_key DESC, doc_id LIMIT 50"
)


@register("q_sample_weighted", _WSAMPLE_SQL)
def q_sample_weighted(spark, sf_dir):
    """E6e (r7): 50 docs drawn WITHOUT replacement with probability
    proportional to length (Efraimidis-Spirakis keys ln(u)/w over the
    md5-uniform of the content key) — the weighted member of the
    sampling family (deterministic / stratified / temperature /
    weighted). rq6-quantized keys make the ranking bit-stable
    cross-engine (ln is not exactly-rounded); TakeOrdered, never a
    global sort; proportionality pinned by a multi-salt frequency
    test in pytest."""
    from mhw3d_detection_spark.operators.textops import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    s = weighted_sample(docs, 50, "n_chars")
    return s.select("doc_id", "source", "n_chars", "sample_key")


# =========================================================================
# E3k (r8) — kNN label prediction (weak labeling / classifier audit)
# =========================================================================
_KNN_SQL = (
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label AS true_label, v AS pv "
    "  FROM base WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, b.vec_id, b.label AS nb_label, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS rank FROM sims), "
    "votes AS (SELECT probe_id, nb_label, CAST(count(*) AS INT) AS n_votes "
    "  FROM ranked WHERE rank <= 5 GROUP BY 1, 2), "
    "pick AS (SELECT probe_id, nb_label AS pred_label, n_votes, "
    "  row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY n_votes DESC, nb_label) AS r FROM votes) "
    "SELECT p.probe_id, p.true_label, k.pred_label, k.n_votes, "
    "  CAST(CASE WHEN k.pred_label = p.true_label THEN 1 ELSE 0 END AS INT) "
    "  AS correct "
    "FROM probes p JOIN pick k ON p.probe_id = k.probe_id AND k.r = 1"
)


@register("q_knn_classify", _KNN_SQL)
def q_knn_classify(spark, sf_dir):
    """E3k (r8): k-NN majority-vote label prediction for every probe —
    the weak-labeling / distillation-audit primitive (label unlabeled
    docs from their nearest labeled neighbors; here self-audited
    against the probes' own labels). Candidates via the verified
    brute-force top-k (broadcast probes, salted two-phase ranking);
    after the ranking everything is INTEGER (vote counts, label ids,
    tie-break to the smaller label) — bit-exact with no quantization.
    The tiny probes x k result broadcasts back for neighbor labels;
    nothing corpus-sized shuffles after the top-k."""
    from mhw3d_detection_spark.operators.similarity import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_classify(emb, probe_pred=lambda c: c % 50 == 0, k=5)


# =========================================================================
# E3l (r8) — hard-negative mining (contrastive training data)
# =========================================================================
_HARDNEG_SQL = (
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label AS plab, v AS pv "
    "  FROM base WHERE vec_id % 50 = 0), "
    "sims AS (SELECT p.probe_id, b.vec_id, b.label AS neg_label, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id AND b.label <> p.plab), "
    "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id "
    "  ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM sims) "
    f"SELECT probe_id, vec_id, neg_label, {rq_sql('cosine', 4)} AS cosine, rank "
    "FROM ranked WHERE rank <= 5"
)


@register("q_hard_negatives", _HARDNEG_SQL)
def q_hard_negatives(spark, sf_dir):
    """E3l (r8): hard-negative mining — for each probe, the top-5 most
    cosine-similar vectors with a DIFFERENT label: the negatives a
    contrastive/embedding trainer learns the most from (the batch
    offline-mining shape behind DPR/SimCSE-style pipelines). Same
    broadcast-probes + salted two-phase top-k plan as the brute-force
    baseline; the label-mismatch predicate rides the candidate filter,
    so no extra shuffle. At corpus scale the candidate generation
    swaps to the IVF bucket join exactly like q_similarity_ivf."""
    from mhw3d_detection_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    topk = cosine_topk(
        emb,
        probe_pred=lambda c: c % 50 == 0,
        k=5,
        label_col="label",
        cross_label_only=True,
    )
    labels = emb.select("vec_id", F.col("label").alias("neg_label"))
    return labels.join(F.broadcast(topk), "vec_id").select(
        "probe_id",
        "vec_id",
        "neg_label",
        rq("cosine", 4).alias("cosine"),
        "rank",
    )


# =========================================================================
# E3e (r8) — per-class embedding outlier screen (mislabel / bad-pair
# detection): bit-exact z-scores via rq6 centroids + dyadic distances
# =========================================================================
def _OUTLIER_SQL() -> str:
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize_sql

    return (
        "WITH x AS (SELECT label, CAST(i - 1 AS INT) AS dim_idx, "
        "  CAST(embedding[i] AS DOUBLE) AS comp FROM "
        "  (SELECT label, embedding, "
        "   unnest(generate_series(1, len(embedding))) AS i FROM embeddings)), "
        f"cent AS (SELECT label, dim_idx, {rq_sql('avg(comp)', 6)} AS c "
        "  FROM x GROUP BY 1, 2), "
        "cv AS (SELECT label, list(c ORDER BY dim_idx) AS cvec FROM cent GROUP BY 1), "
        "d AS (SELECT e.vec_id, e.label, "
        + dyadic_quantize_sql(
            "sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)), "
            "  i -> (CAST(e.embedding[i] AS DOUBLE) - cv.cvec[i]) "
            "     * (CAST(e.embedding[i] AS DOUBLE) - cv.cvec[i]))))",
            10,
        )
        + " AS dist_q FROM embeddings e JOIN cv ON e.label = cv.label), "
        "st AS (SELECT label, sum(dist_q) / count(*) AS m, "
        "  sum(dist_q * dist_q) / count(*) "
        "    - (sum(dist_q) / count(*)) * (sum(dist_q) / count(*)) AS var "
        "  FROM d GROUP BY 1) "
        "SELECT d.vec_id, d.label, d.dist_q, "
        "  CASE WHEN st.var > 0 THEN (d.dist_q - st.m) / sqrt(st.var) "
        "    ELSE 0.0 END AS z, "
        "  CAST(CASE WHEN st.var > 0 "
        "    AND (d.dist_q - st.m) / sqrt(st.var) > 2.0 "
        "    THEN 1 ELSE 0 END AS INT) AS outlier "
        "FROM d JOIN st ON d.label = st.label"
    )


@register("q_embed_outliers", _OUTLIER_SQL())
def q_embed_outliers(spark, sf_dir):
    """E3e (r8): per-class embedding outlier screen (the CLIP-filter /
    mislabel-detection shape): distance to the OWN-class centroid,
    z-scored within the class, flagged above 2 sigma. The z and the
    FLAG hash as RAW doubles/ints — no display rounding: rq6-quantized
    centroids absorb engine aggregation order, the per-row distance
    folds dims ordinally in both engines, and the dyadic 1/1024
    distance grid makes the class mean/variance sums association-free
    (the CUSUM/PCA exactness technique). Plan: two broadcast-back
    aggregates (labels x dims, labels) around narrow per-row folds —
    the corpus never shuffles."""
    from mhw3d_detection_spark.operators.similarity import embedding_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_outliers(emb, z_thresh=2.0)


# =========================================================================
# E2h (r8) — quality-representative dedup: keep the BEST member of
# every near-dup component, not the arbitrary min id
# =========================================================================
_KEEPBEST_SQL = (
    f"WITH {{SH}}, {{SIG}}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    "{CC}, "
    "kd AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "ks AS (SELECT doc_id, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio FROM kd), "
    "kq AS (SELECT doc_id, "
    + rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    + " AS quality FROM ks), "
    "m AS (SELECT l3.v AS doc_id, l3.label AS component, kq.quality, "
    "  row_number() OVER (PARTITION BY l3.label "
    "  ORDER BY kq.quality DESC, l3.v) AS r "
    "  FROM l3 JOIN kq ON l3.v = kq.doc_id) "
    "SELECT kq.doc_id, coalesce(m.component, kq.doc_id) AS component, "
    # singletons (no m row) keep themselves: test m.doc_id for NULL
    # BEFORE the rank test — CASE WHEN m.r = 1 ... ELSE 0 would send
    # the NULL rank into the ELSE arm and mark every singleton dropped
    "  kq.quality, CAST(CASE WHEN m.doc_id IS NULL THEN 1 "
    "    WHEN m.r = 1 THEN 1 ELSE 0 END AS INT) AS kept "
    "FROM kq LEFT JOIN m ON kq.doc_id = m.doc_id"
)


def _keepbest_sql() -> str:
    return _KEEPBEST_SQL.format(
        SH=SHINGLES_SQL,
        SIG=MINHASH_SIG_SQL,
        CC=", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3)),
    )


@register("q_dedup_keep_best", _keepbest_sql())
def q_dedup_keep_best(spark, sf_dir):
    """E2h (r8): quality-representative dedup — per near-dup component
    (MinHash-LSH pairs -> 3 bounded min-label rounds) keep the member
    with the HIGHEST composite quality score (rq4 grid; ties to the
    smaller doc_id), singletons keep themselves. The policy production
    curation ships (keep the cleanest extraction of a page), upgrading
    the min-id convention of q_dedup_apply. Components are integer-
    exact, quality compares on the rq4 grid, so kept/component hash
    bit-exactly; the representative window partitions by component
    (clique-sized — parallel, no skew) and the verdict broadcasts back
    onto the corpus-sized quality projection."""
    from mhw3d_detection_spark.operators.textops import dedup_keep_best

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    )
    return dedup_keep_best(docs, pairs, iters=3, truncate=True)


# =========================================================================
# E6f (r8) — DSIR importance-resampling selection (Xie et al. 2023)
# =========================================================================
def _DSIR_SQL() -> str:
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize_sql

    lr_expr = dyadic_quantize_sql(
        "ln((coalesce(tc, 0) + 1.0) / (nt + 256.0)) "
        "- ln((coalesce(rc, 0) + 1.0) / (nr + 256.0))",
        16,
    )
    return (
        "WITH dtok AS (SELECT doc_id, source, unnest(" + TOKENS_SQL + ") AS token "
        "  FROM documents), "
        "dh AS (SELECT doc_id, source, "
        "  CAST(('0x' || substr(md5(token), 1, 12))::BIGINT % 256 AS INT) "
        "  AS bucket FROM dtok), "
        "per AS (SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS n "
        "  FROM dh GROUP BY 1, 2, 3), "
        "tcb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS tc FROM per "
        f"  WHERE {_DSIR_TARGET} GROUP BY 1), "
        "rcb AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS rc FROM per GROUP BY 1), "
        "tot AS (SELECT "
        f"  (SELECT CAST(sum(n) AS BIGINT) FROM per WHERE {_DSIR_TARGET}) AS nt, "
        "  (SELECT CAST(sum(n) AS BIGINT) FROM per) AS nr), "
        "spine AS (SELECT CAST(unnest(generate_series(0, 255)) AS INT) AS bucket), "
        f"lrt AS (SELECT s.bucket, {lr_expr} AS lr "
        "  FROM spine s LEFT JOIN tcb USING (bucket) "
        "  LEFT JOIN rcb USING (bucket) CROSS JOIN tot), "
        "aggd AS (SELECT p.doc_id, CAST(sum(p.n) AS BIGINT) AS n_tokens, "
        "  sum(p.n * l.lr) AS dsir_weight "
        "  FROM per p JOIN lrt l ON p.bucket = l.bucket GROUP BY 1), "
        # full doc domain: zero-token docs score exactly 0.0 (the
        # streaming gate's empty-fold value) rather than disappearing
        "sc AS (SELECT dd.doc_id, dd.source, "
        "  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens, "
        "  coalesce(a.dsir_weight, 0.0) AS dsir_weight "
        "  FROM documents dd LEFT JOIN aggd a ON dd.doc_id = a.doc_id), "
        "topm AS (SELECT doc_id FROM sc ORDER BY dsir_weight DESC, doc_id LIMIT 50) "
        "SELECT sc.doc_id, sc.source, sc.n_tokens, sc.dsir_weight, "
        "  CAST(CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS INT) AS selected "
        "FROM sc LEFT JOIN topm t ON sc.doc_id = t.doc_id"
    )


_DSIR_TARGET = "source IN ('src0', 'src1', 'src2')"


@register("q_dsir_select", _DSIR_SQL())
def q_dsir_select(spark, sf_dir):
    """E6f (r8): DSIR — Data Selection via Importance Resampling (Xie
    et al. 2023): score every pool doc by the hashed-unigram
    importance weight Σ n[b]·(ln p̂_target[b] − ln p̂_raw[b]) toward a
    target slice (sources src0-2 play the 'quality corpus'), select
    the global top-50. The per-bucket log-ratio is dyadic-quantized
    (ln is not exactly-rounded cross-libm; the 1/2^16 grid + nudge
    absorb that), so per-doc weights are exact dyadic sums — RAW
    double hash match, bit-stable top-m. One corpus-sized (doc,
    bucket) aggregate; the 256-row ratio table and the 1-row totals
    broadcast; selection is TakeOrdered + a broadcast flag join."""
    from mhw3d_detection_spark.operators.textops import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs,
        target_pred=lambda s: s.isin("src0", "src1", "src2"),
        n_buckets=256,
        alpha=1.0,
        top_m=50,
    )


# =========================================================================
# E3f (r8) — NDCG@5 of the IVF search against the exact ranking: the
# position-sensitive companion of q_ann_recall
# =========================================================================
#: 1/log2(rank+1) discount weights and their sum (ideal DCG@5),
#: precomputed once in Python and embedded as LITERALS in both engines
#: — no runtime transcendental can diverge cross-libm
_NDCG_W = (1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
           0.38685280723454163)
_NDCG_IDEAL = 2.9484591188793923

_NDCG_SQL = (
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v "
    "  FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label, v AS pv FROM base "
    "  WHERE vec_id % 50 = 0), "
    "es AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "er AS (SELECT probe_id, vec_id, row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank FROM es), "
    "ex AS (SELECT probe_id, vec_id FROM er WHERE rank <= 5), "
    "asims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine "
    "  FROM base b JOIN probes p ON b.label = p.label "
    "  WHERE b.vec_id <> p.probe_id), "
    "ar AS (SELECT probe_id, vec_id, CAST(row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rank "
    "  FROM asims), "
    "ap AS (SELECT probe_id, vec_id, rank FROM ar WHERE rank <= 5), "
    "h AS (SELECT ap.probe_id, "
    "  CASE WHEN ex.vec_id IS NULL THEN 0 ELSE 1 END AS hit, "
    + "  CASE ap.rank WHEN 1 THEN 1.0"
    + " WHEN 2 THEN 0.6309297535714575 WHEN 3 THEN 0.5"
    + " WHEN 4 THEN 0.43067655807339306 ELSE 0.38685280723454163 END AS w "
    "  FROM ap LEFT JOIN ex ON ap.probe_id = ex.probe_id "
    "    AND ap.vec_id = ex.vec_id) "
    "SELECT probe_id, CAST(sum(hit) AS BIGINT) AS n_hit, "
    f"  {rq_sql('sum(hit * w)', 4)} AS dcg, "
    f"  {rq_sql('sum(hit * w) / 2.9484591188793923', 4)} AS ndcg "
    "FROM h GROUP BY 1"
)


@register("q_retrieval_ndcg", _NDCG_SQL)
def q_retrieval_ndcg(spark, sf_dir):
    """E3f (r8): NDCG@5 of the IVF-bucketed search against the exact
    brute-force top-5 — the POSITION-sensitive companion of
    q_ann_recall (a true neighbor surfaced at approx rank 1 is worth
    more than at rank 5; recall can't see the difference). Relevance =
    membership in the exact top-5; discounts 1/log2(rank+1) and the
    ideal DCG are PYTHON-precomputed literals shared by both engines,
    so no runtime transcendental exists to diverge — the DCG is a sum
    of <= 5 shared literals (rq4 absorbs association order) and NDCG
    one division. Same join scaffold as the recall row; evaluates on a
    probe sample at any scale."""
    exact_w = list(_NDCG_W)
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5).select(
        "probe_id", "vec_id", F.lit(1).alias("__hit")
    )
    approx = cosine_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
    ).select(
        "probe_id",
        "vec_id",
        F.element_at(
            F.array(*[F.lit(w) for w in exact_w]), F.col("rank")
        ).alias("__w"),
    )
    return (
        approx.join(exact, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
            rq(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * F.col("__w")), 4
            ).alias("dcg"),
            rq(
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)) * F.col("__w"))
                / F.lit(_NDCG_IDEAL),
                4,
            ).alias("ndcg"),
        )
    )


# =========================================================================
# E2g (r8) — snapshot-delta dedup: a NEW crawl increment screened
# against the EXISTING corpus index (the batch face of the streaming
# LSH ingest gate, with a full DuckDB oracle)
# =========================================================================
_DELTA_SQL = (
    f"WITH {{SH}}, {{SIG}}, "
    "newb AS (SELECT * FROM bands WHERE doc_id % 5 = 4), "
    "oldb AS (SELECT * FROM bands WHERE doc_id % 5 <> 4), "
    "hits AS (SELECT DISTINCT n.doc_id, o.doc_id AS dup_of "
    "  FROM newb n JOIN oldb o ON n.band_id = o.band_id "
    "    AND n.band_sig = o.band_sig), "
    "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dups, "
    "  CAST(min(dup_of) AS BIGINT) AS first_dup FROM hits GROUP BY 1) "
    "SELECT d.doc_id, coalesce(a.n_dups, 0) AS n_dups, a.first_dup, "
    "  CAST(CASE WHEN a.doc_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup "
    "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id "
    "WHERE d.doc_id % 5 = 4"
)


def _delta_sql() -> str:
    return _DELTA_SQL.format(SH=SHINGLES_SQL, SIG=MINHASH_SIG_SQL)


@register("q_dedup_snapshot_delta", _delta_sql())
def q_dedup_snapshot_delta(spark, sf_dir):
    """E2g (r8): incremental crawl dedup — the 20% 'new snapshot'
    (doc_id % 5 = 4) screened against the 80% existing corpus's
    MinHash band index: per new doc, how many distinct existing docs
    it collides with (any band) and the smallest such id. The batch
    backfill face of `streaming_lsh_dedup` (which has no SQL oracle),
    so the shared machinery gets a hash-checked row. Plan: band-keyed
    equi-join (the only shuffle — identical to the full-corpus pair
    join but with the index side PRE-BUILT and reusable across
    increments), then one new-docs-sized aggregate + left join; at
    100 TB the old index is a materialized table amortized over every
    increment."""
    docs = load_table(spark, sf_dir, "documents")
    bands = minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    new_b = bands.filter(F.col("doc_id") % 5 == 4)
    old_b = bands.filter(F.col("doc_id") % 5 != 4)
    hits = (
        new_b.join(
            old_b.select(
                F.col("doc_id").alias("dup_of"), "band_id", "band_sig"
            ),
            ["band_id", "band_sig"],
        )
        .select("doc_id", "dup_of")
        .distinct()
    )
    agg = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups"),
        F.min("dup_of").cast("long").alias("first_dup"),
    ).withColumn("__d", F.lit(1))
    # no broadcast hint: agg is one row per COLLIDING new doc — tiny on
    # a clean increment, snapshot-sized on a high-dup crawl (the regime
    # this row targets). AQE picks broadcast when it actually fits,
    # same reasoning as curation.py's drop-list joins.
    return (
        docs.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
            "first_dup",
            F.coalesce(F.col("__d"), F.lit(0)).cast("int").alias("is_dup"),
        )
    )


# =========================================================================
# E3h (r8) — MRR@5: the third retrieval-eval metric (recall = did the
# true neighbors arrive, NDCG = how high, MRR = how fast the FIRST one)
# =========================================================================
#: reciprocal-rank literals 1/rank shared by both engines (1/3 is not
#: exactly representable — embedding the SAME literal on both sides is
#: what guarantees identical bits, the q_retrieval_ndcg technique)
_MRR_W = (1.0, 0.5, 0.3333333333333333, 0.25, 0.2)

_MRR_SQL = (
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v "
    "  FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label, v AS pv FROM base "
    "  WHERE vec_id % 50 = 0), "
    "es AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "er AS (SELECT probe_id, vec_id, row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank FROM es), "
    "ex AS (SELECT probe_id, vec_id FROM er WHERE rank <= 5), "
    "asims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine "
    "  FROM base b JOIN probes p ON b.label = p.label "
    "  WHERE b.vec_id <> p.probe_id), "
    "ar AS (SELECT probe_id, vec_id, CAST(row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rank "
    "  FROM asims), "
    "ap AS (SELECT probe_id, vec_id, rank FROM ar WHERE rank <= 5), "
    "h AS (SELECT ap.probe_id, ap.rank FROM ap "
    "  JOIN ex ON ap.probe_id = ex.probe_id AND ap.vec_id = ex.vec_id), "
    "fr AS (SELECT probe_id, CAST(min(rank) AS INT) AS first_rank "
    "  FROM h GROUP BY 1) "
    "SELECT p.probe_id, fr.first_rank, "
    # CAST: DuckDB infers DECIMAL for the mixed CASE literals, which
    # the hash gate renders differently from DOUBLE
    "  CAST(coalesce(CASE fr.first_rank WHEN 1 THEN 1.0 WHEN 2 THEN 0.5 "
    "    WHEN 3 THEN 0.3333333333333333 WHEN 4 THEN 0.25 ELSE 0.2 END, "
    "    0.0) AS DOUBLE) AS rr "
    "FROM probes p LEFT JOIN fr ON p.probe_id = fr.probe_id"
)


@register("q_retrieval_mrr", _MRR_SQL)
def q_retrieval_mrr(spark, sf_dir):
    """E3h (r8): MRR@5 of the IVF search vs the exact top-5 — per
    probe, the reciprocal rank of the FIRST true neighbor the approx
    search surfaces (0.0 if none in its top-5). Completes the eval
    trio: recall@5 (coverage), NDCG@5 (position-weighted), MRR@5
    (first-hit latency — what an interactive retrieval UI feels).
    Reciprocal-rank values are shared literals (1/3 is inexact — both
    engines must use the SAME bits), min-rank is integer, so the row
    hashes with no rounding. Same scaffold and probe-sample scaling as
    the other two eval rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5).select(
        "probe_id", "vec_id"
    )
    approx = cosine_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
    ).select("probe_id", "vec_id", "rank")
    first = (
        approx.join(exact, ["probe_id", "vec_id"])
        .groupBy("probe_id")
        .agg(F.min("rank").cast("int").alias("first_rank"))
    )
    probes = emb.select(F.col("vec_id").alias("probe_id")).filter(
        F.col("probe_id") % 50 == 0
    )
    rr = F.coalesce(
        F.element_at(
            F.array(*[F.lit(w) for w in _MRR_W]), F.col("first_rank")
        ),
        F.lit(0.0),
    )
    return probes.join(F.broadcast(first), "probe_id", "left").select(
        "probe_id", "first_rank", rr.alias("rr")
    )


# =========================================================================
# E4i (r8) — tokenizer fertility by source: the per-corpus-slice cost
# model of a trained tokenizer (chars/symbol; low fertility = the
# merges fit that slice's language/register)
# =========================================================================
@register(
    "q_tokenizer_fertility",
    "WITH " + _BPE_CTES(3, emit_final=True)
    + ", dtok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS w "
    "  FROM documents), "
    "enc AS (SELECT w, CAST(length(w) AS BIGINT) AS nc, "
    "  CAST(len(s) AS BIGINT) AS ns FROM w3), "
    "perdoc AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
    "  CAST(sum(e.nc) AS BIGINT) AS n_chars, "
    "  CAST(sum(e.ns) AS BIGINT) AS n_symbols "
    "  FROM dtok d JOIN enc e ON d.w = e.w GROUP BY 1) "
    "SELECT doc.source, CAST(count(*) AS BIGINT) AS n_docs, "
    "  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens, "
    "  CAST(sum(p.n_chars) AS BIGINT) AS n_chars, "
    "  CAST(sum(p.n_symbols) AS BIGINT) AS n_symbols, "
    "  sum(p.n_chars) / CAST(sum(p.n_symbols) AS DOUBLE) AS chars_per_symbol, "
    "  sum(p.n_symbols) / CAST(sum(p.n_tokens) AS DOUBLE) AS symbols_per_token "
    "FROM perdoc p JOIN documents doc ON p.doc_id = doc.doc_id GROUP BY 1",
)
def q_tokenizer_fertility(spark, sf_dir):
    """E4i (r8): tokenizer fertility per corpus slice — the trained BPE
    merges applied to every doc (the q_bpe_encode deploy seam), then
    compression rolled up BY SOURCE: chars/symbol (how well the merges
    fit that slice) and symbols/token (the training-cost multiplier a
    mixture designer pays per slice — fertility is THE metric tokenizer
    papers report per language/domain). All-integer sums + two exact
    divisions, hash-checked; plan adds one sources-keyed hash aggregate
    over the per-doc stats — nothing new shuffles at corpus scale."""
    from mhw3d_detection_spark.operators.textops import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, rounds=3)
    per = bpe_encode_stats(docs, merges)
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_symbols").cast("long").alias("n_symbols"),
            (
                F.sum("n_chars") / F.sum("n_symbols").cast("double")
            ).alias("chars_per_symbol"),
            (
                F.sum("n_symbols") / F.sum("n_tokens").cast("double")
            ).alias("symbols_per_token"),
        )
    )


# =========================================================================
# E3i (r8) — ANN index maintenance: assign a NEW embedding increment
# into the EXISTING trained coarse quantizer (no retrain)
# =========================================================================
@register(
    "q_ann_index_delta",
    _KMEANS_SQL(
        train_where="vec_id % 5 <> 4", assign_where="vec_id % 5 = 4"
    )
    + " SELECT vec_id, CAST(bucket AS INT) AS bucket FROM afin",
)
def q_ann_index_delta(spark, sf_dir):
    """E3i (r8): index freshness — the 20% 'new snapshot'
    (vec_id % 5 = 4) assigned into coarse cells TRAINED ON THE
    EXISTING 80% ONLY (the production IVF maintenance path: retraining
    the quantizer on every increment would invalidate the whole
    index's cell assignments; assigning new vectors into frozen cells
    is an O(increment) narrow map). The embedding-side companion of
    q_dedup_snapshot_delta; pairs with q_ann_recall to decide WHEN
    drift has degraded the frozen cells enough to warrant a retrain.
    Oracle replays the identical Lloyd's rounds on the old slice and
    the literal-argmin assignment of the new slice — integer buckets,
    bit-exact."""
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        kmeans_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 4)
    new = emb.filter(F.col("vec_id") % 5 == 4)
    cents = kmeans_ivf_centroids(old, k=8, iters=3)
    return assign_buckets(new, cents).select(
        "vec_id", F.col("bucket").cast("int").alias("bucket")
    )


# =========================================================================
# E3j (r8) — embedding drift monitor: PSI of the NEW snapshot's cell
# occupancy vs the EXISTING corpus over the frozen coarse quantizer
# =========================================================================
_PSI_SQL = (
    _KMEANS_SQL(train_where="vec_id % 5 <> 4")
    + ", occ AS (SELECT bucket, "
    "  CAST(sum(CASE WHEN vec_id % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_old, "
    "  CAST(sum(CASE WHEN vec_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new "
    "  FROM afin GROUP BY 1), "
    "tot AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new, "
    "  CAST(count(*) AS BIGINT) AS nb FROM occ), "
    "p AS (SELECT o.bucket, o.n_old, o.n_new, "
    "  (o.n_old + 1.0) / (t.t_old + t.nb) AS po, "
    "  (o.n_new + 1.0) / (t.t_new + t.nb) AS pn "
    "  FROM occ o CROSS JOIN tot t) "
    "SELECT CAST(bucket AS INT) AS bucket, n_old, n_new, "
    f"  {rq_sql('(pn - po) * ln(pn / po)', 6)} AS psi_term, "
    f"  {rq_sql('sum((pn - po) * ln(pn / po)) OVER ()', 4)} AS psi_total "
    "FROM p"
)


@register("q_embedding_drift_psi", _PSI_SQL)
def q_embedding_drift_psi(spark, sf_dir):
    """E3j (r8): embedding distribution drift — the Population
    Stability Index of the new snapshot's coarse-cell occupancy
    against the existing corpus, over the SAME frozen quantizer
    q_ann_index_delta maintains (PSI is the standard model-monitoring
    drift score; >0.2 is the conventional 'retrain' alarm — this is
    the quantitative trigger for the index-delta vs full-retrain
    decision, alongside q_ann_recall). Laplace-smoothed occupancy
    ratios (cells can be empty on either side), per-cell PSI terms rq6
    and the windowed total rq4 (ln is display-only per house
    convention). Plan: the assignment's narrow map + one cells-sized
    aggregate + scalar totals — O(corpus) map work, O(cells)
    everything else."""
    from mhw3d_detection_spark.operators.similarity import (
        assign_buckets,
        kmeans_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_ivf_centroids(
        emb.filter(F.col("vec_id") % 5 != 4), k=8, iters=3
    )
    tagged = assign_buckets(emb, cents)
    occ = tagged.groupBy("bucket").agg(
        F.sum((F.col("vec_id") % 5 != 4).cast("int")).cast("long").alias("n_old"),
        F.sum((F.col("vec_id") % 5 == 4).cast("int")).cast("long").alias("n_new"),
    )
    tot = occ.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    p = occ.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_old",
        "n_new",
        ((F.col("n_old") + F.lit(1.0)) / (F.col("t_old") + F.col("nb"))).alias("po"),
        ((F.col("n_new") + F.lit(1.0)) / (F.col("t_new") + F.col("nb"))).alias("pn"),
    )
    term = (F.col("pn") - F.col("po")) * F.log(F.col("pn") / F.col("po"))
    w = Window.partitionBy()
    return p.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_old",
        "n_new",
        rq(term, 6).alias("psi_term"),
        rq(F.sum(term).over(w), 4).alias("psi_total"),
    )


# =========================================================================
# E4g (r8) — triangle counting on the co-occurrence graph: the graph
# family's clustering member (components = reach, PageRank =
# centrality, triangles = local community tightness)
# =========================================================================
@register(
    "q_token_triangles",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "tokp AS (SELECT doc_id, i AS pos, toks[i] AS token FROM "
    "  (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM d)), "
    "pairs AS (SELECT p.token AS a, r.token AS b FROM tokp p "
    "  CROSS JOIN (SELECT unnest([1, 2]) AS o) o "
    "  JOIN tokp r ON r.doc_id = p.doc_id AND r.pos = p.pos + o.o), "
    "c AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2), "
    "e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v "
    "  FROM c WHERE c_ab >= 5 AND a <> b), "
    "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
    "  FROM e e1 JOIN e e2 ON e1.v = e2.u "
    "  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
    "corners AS (SELECT a AS token FROM tri UNION ALL "
    "  SELECT b AS token FROM tri UNION ALL SELECT c AS token FROM tri) "
    "SELECT token, CAST(count(*) AS BIGINT) AS n_triangles "
    "FROM corners GROUP BY 1",
)
def q_token_triangles(spark, sf_dir):
    """E4g (r8): per-token triangle counts over the windowed
    co-occurrence graph (edges = distinct undirected pairs with count
    >= 5, same base as q_cooc_pmi). Classic multi-way self-join
    triangle enumeration with low->high orientation (each triangle
    produced once) — integer-exact; the binary a<b compare is
    identical cross-engine on [a-z0-9]+ tokens. Three token-keyed
    shuffles over the vocab-pair-sized edge list — never touches the
    corpus after the pair counting."""
    from mhw3d_detection_spark.operators.textops import token_triangles

    docs = load_table(spark, sf_dir, "documents")
    return token_triangles(docs, window=2, min_count=5)


# =========================================================================
# E4h (r8) — text drift monitor: PSI of the new snapshot's hashed
# token-bucket distribution vs the existing corpus (the text twin of
# q_embedding_drift_psi — same alarm convention, no model needed)
# =========================================================================
_TPSI_SQL = (
    "WITH dtok AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "dh AS (SELECT doc_id, "
    "  CAST(('0x' || substr(md5(token), 1, 12))::BIGINT % 256 AS INT) "
    "  AS bucket FROM dtok), "
    "occ AS (SELECT bucket, "
    "  CAST(sum(CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_old, "
    "  CAST(sum(CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new "
    "  FROM dh GROUP BY 1), "
    "spine AS (SELECT CAST(unnest(generate_series(0, 255)) AS INT) AS bucket), "
    "f AS (SELECT s.bucket, coalesce(o.n_old, 0) AS n_old, "
    "  coalesce(o.n_new, 0) AS n_new FROM spine s "
    "  LEFT JOIN occ o ON s.bucket = o.bucket), "
    "tot AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new, "
    "  CAST(count(*) AS BIGINT) AS nb FROM f), "
    "p AS (SELECT b.bucket, b.n_old, b.n_new, "
    "  (b.n_old + 1.0) / (t.t_old + t.nb) AS po, "
    "  (b.n_new + 1.0) / (t.t_new + t.nb) AS pn "
    "  FROM f b CROSS JOIN tot t) "
    "SELECT bucket, n_old, n_new, "
    f"  {rq_sql('(pn - po) * ln(pn / po)', 6)} AS psi_term, "
    f"  {rq_sql('sum((pn - po) * ln(pn / po)) OVER ()', 4)} AS psi_total "
    "FROM p"
)


@register("q_text_drift_psi", _TPSI_SQL)
def q_text_drift_psi(spark, sf_dir):
    """E4h (r8): text-distribution drift — PSI of the new snapshot's
    (doc_id % 5 = 4) hashed-unigram bucket occupancy against the
    existing corpus, over the SAME no-vocabulary 256-bucket hashing the
    DSIR/feature-hash family uses: the language/register drift alarm
    for incremental crawls (>0.2 = investigate before mixing), with no
    trained model in the loop. Laplace-smoothed over the dense bucket
    spine (either side can miss buckets), rq6 terms + rq4 windowed
    total. One corpus-sized (bucket) aggregate, everything after is
    256 rows."""
    from mhw3d_detection_spark.operators.textops import (
        minhash_base,
        tokens_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    dh = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    ).select(
        "doc_id",
        F.pmod(minhash_base(F.col("token")), F.lit(256)).cast("int").alias(
            "bucket"
        ),
    )
    occ = dh.groupBy("bucket").agg(
        F.sum((F.col("doc_id") % 5 != 4).cast("int")).cast("long").alias("n_old"),
        F.sum((F.col("doc_id") % 5 == 4).cast("int")).cast("long").alias("n_new"),
    )
    spine = docs.sparkSession.range(256).select(
        F.col("id").cast("int").alias("bucket")
    )
    f = spine.join(F.broadcast(occ), "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_old"), F.lit(0)).cast("long").alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
    )
    tot = f.agg(
        F.sum("n_old").alias("t_old"),
        F.sum("n_new").alias("t_new"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    p = f.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_old",
        "n_new",
        ((F.col("n_old") + F.lit(1.0)) / (F.col("t_old") + F.col("nb"))).alias("po"),
        ((F.col("n_new") + F.lit(1.0)) / (F.col("t_new") + F.col("nb"))).alias("pn"),
    )
    term = (F.col("pn") - F.col("po")) * F.log(F.col("pn") / F.col("po"))
    w = Window.partitionBy()
    return p.select(
        "bucket",
        "n_old",
        "n_new",
        rq(term, 6).alias("psi_term"),
        rq(F.sum(term).over(w), 4).alias("psi_total"),
    )


# =========================================================================
# E7e (r9) — exact two-sample KS drift statistic: the sup-norm
# companion to the PSI monitors (E4h embedding / text PSI react to
# binned mass shifts; KS is the exact worst-case CDF distance of a
# numeric property, with the location of the divergence)
# =========================================================================
@register(
    "q_ks_drift",
    "WITH s AS (SELECT n_chars AS x, "
    "  CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END AS io FROM documents "
    "  WHERE n_chars IS NOT NULL), "
    "g AS (SELECT x, CAST(sum(io) AS BIGINT) AS c_old, "
    "  CAST(count(*) - sum(io) AS BIGINT) AS c_new FROM s GROUP BY 1), "
    "t AS (SELECT CAST(sum(c_old) AS DOUBLE) AS n_old, "
    "  CAST(sum(c_new) AS DOUBLE) AS n_new FROM g), "
    "c AS (SELECT x, CAST(sum(c_old) OVER (ORDER BY x "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS a, "
    "  CAST(sum(c_new) OVER (ORDER BY x "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS b "
    "  FROM g), "
    "d AS (SELECT x, abs(a / t.n_old - b / t.n_new) AS diff, "
    "  t.n_old, t.n_new FROM c, t) "
    "SELECT x AS x_at_max, diff AS ks_stat, "
    "CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new "
    "FROM d ORDER BY diff DESC, x LIMIT 1",
)
def q_ks_drift(spark, sf_dir):
    """E7e (r9): exact two-sample Kolmogorov-Smirnov statistic of the
    doc-length (n_chars) distribution, new snapshot (doc_id%5=4) vs the
    existing corpus — sup_x |F_old - F_new| plus WHERE the divergence
    peaks. Integer cumulative counts over the DISTINCT-VALUE table
    (domain-bounded, not corpus-bounded: one hash aggregate touches
    the corpus, the ordered window sees only distinct lengths), then
    exactly-rounded divisions — the statistic hash-matches as a RAW
    double, no quantization."""
    from mhw3d_detection_spark.operators.analysis import ks_two_sample

    docs = load_table(spark, sf_dir, "documents")
    return ks_two_sample(
        docs.select("doc_id", "n_chars"),
        "n_chars",
        F.col("doc_id") % 5 != 4,
    )


# =========================================================================
# E2i (r9) — asymmetric shingle containment: the quote/excerpt
# detector (benchmark decontamination's actual question) that Jaccard
# misses by construction
# =========================================================================
@register(
    "q_containment_pairs",
    f"WITH {SHINGLES_SQL}, "
    "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz_probe "
    "  FROM shd GROUP BY 1), "
    "inter AS (SELECT a.doc_id AS probe_id, b.doc_id AS doc_id, "
    "  CAST(count(*) AS BIGINT) AS inter FROM shd a "
    "  JOIN shd b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id "
    "  WHERE a.doc_id % 20 = 0 GROUP BY 1, 2) "
    "SELECT i.probe_id, i.doc_id, i.inter, s.sz_probe, "
    "  i.inter / s.sz_probe AS containment "
    "FROM inter i JOIN sizes s ON i.probe_id = s.doc_id "
    "WHERE i.inter / s.sz_probe >= 0.5",
)
def q_containment_pairs(spark, sf_dir):
    """E2i (r9): |A∩B|/|A| from the probe subset (doc_id%20=0 — the
    "benchmark" slice) into the corpus; a short doc fully embedded in
    a long page scores 1.0 here and ~0.01 on Jaccard. Integer
    intersection/size + one exactly-rounded division; the >= 0.5
    threshold compares identical bits. Same shingle equi-join geometry
    as q_dedup_ngram_jaccard (probe side broadcasts at scale)."""
    from mhw3d_detection_spark.operators.textops import (
        shingle_containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return shingle_containment_pairs(
        docs, probe_pred=lambda c: c % 20 == 0, min_containment=0.5
    )


# =========================================================================
# E3m (r9) — greedy k-center (farthest-point) coreset selection: the
# diversity-first data-pruning pick (2-approx of the optimal k-center
# cover), complement of MMR's relevance-anchored diversity
# =========================================================================
def _KCENTER_SQL(k: int = 6, seed: int = 0) -> str:
    """Unrolled Gonzalez rounds: every selection replays exactly
    because distances are rq6-quantized, the running min is ``least``
    over identical bits, and argmax ties break to the smaller vec_id —
    the same replay contract as ``_MMR_SQL``."""
    d1 = rq_sql("list_distance(b.v, c1.v)", 6)
    ctes = [
        "base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c1 AS (SELECT v FROM base WHERE vec_id = {seed})",
        f"m1 AS (SELECT b.vec_id, b.v, {d1} AS d "
        f"FROM base b, c1 WHERE b.vec_id <> {seed})",
    ]
    sels = [f"SELECT 1 AS rank, CAST({seed} AS BIGINT) AS vec_id, 0.0 AS mind"]
    prev = "m1"
    for r in range(2, int(k) + 1):
        ctes.append(
            f"p{r} AS (SELECT vec_id, v, d FROM {prev} "
            "ORDER BY d DESC, vec_id LIMIT 1)"
        )
        sels.append(f"SELECT {r} AS rank, vec_id, d AS mind FROM p{r}")
        if r < int(k):
            dr = rq_sql("list_distance(m.v, p.v)", 6)
            ctes.append(
                f"m{r} AS (SELECT m.vec_id, m.v, least(m.d, {dr}) AS d "
                f"FROM {prev} m, (SELECT v FROM p{r}) p "
                f"WHERE m.vec_id NOT IN (SELECT vec_id FROM p{r}))"
            )
            prev = f"m{r}"
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT CAST(rank AS INT) AS rank, vec_id, mind FROM ("
        + " UNION ALL ".join(sels) + ")"
    )


@register("q_kcenter_sample", _KCENTER_SQL(6, 0))
def q_kcenter_sample(spark, sf_dir):
    """E3m (r9): 6 greedy k-center picks from vec_id 0 — each round one
    narrow corpus pass updating the running min-distance against the
    newly-picked center as a LITERAL array (the _KMEANS_SQL
    literal-assign seam: no broadcast, no join, no BNLJ), then a
    TakeOrdered(1) argmax; rounds localCheckpoint the state frame
    (mmr_diversify's eager device). rq6 distances + least + vec_id
    tie-break replay bit-exactly in the unrolled SQL."""
    from mhw3d_detection_spark.operators.similarity import kcenter_select

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_select(emb, k=6, seed_id=0)


# =========================================================================
# E7f (r9) — Wasserstein-1 drift: the mass-weighted companion of the
# KS sup-norm (a broad small shift scores high on W1 and low on KS; a
# narrow spike does the opposite — monitors want both)
# =========================================================================
@register(
    "q_wasserstein_drift",
    "WITH s AS (SELECT n_chars AS x, "
    "  CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END AS io FROM documents "
    "  WHERE n_chars IS NOT NULL), "
    "g AS (SELECT x, CAST(sum(io) AS BIGINT) AS c_old, "
    "  CAST(count(*) - sum(io) AS BIGINT) AS c_new FROM s GROUP BY 1), "
    "t AS (SELECT CAST(sum(c_old) AS DOUBLE) AS n_old, "
    "  CAST(sum(c_new) AS DOUBLE) AS n_new FROM g), "
    "c AS (SELECT x, CAST(sum(c_old) OVER (ORDER BY x "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS a, "
    "  CAST(sum(c_new) OVER (ORDER BY x "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS b, "
    "  CAST(lead(x) OVER (ORDER BY x) - x AS DOUBLE) AS gap FROM g), "
    # mirrors the r10 Spark restructure (empty-slice guard + the
    # single-distinct-value domain reporting 0.0 WITH counts): the
    # totals row survives even when no gap rows exist
    "ts AS (SELECT sum(CASE WHEN t.n_old > 0 AND t.n_new > 0 THEN "
    + _dq_sql("abs(c.a / t.n_old - c.b / t.n_new)", 30)
    + " * c.gap END) AS w1_raw FROM c, t WHERE c.gap IS NOT NULL) "
    "SELECT CASE WHEN t.n_old > 0 AND t.n_new > 0 "
    "  THEN coalesce(ts.w1_raw, 0.0) END AS w1_stat, "
    "CAST(t.n_old AS BIGINT) AS n_old, "
    "CAST(t.n_new AS BIGINT) AS n_new "
    "FROM t, ts",
)
def q_wasserstein_drift(spark, sf_dir):
    """E7f (r9): exact 1-D earth-mover distance of the doc-length
    distribution, new snapshot vs existing corpus — integrates
    |F_old - F_new| over the value axis (the KS row reports only the
    worst single gap). |dF| dyadic-quantized (2^-30) before the
    integer-gap multiply, so every term is exactly m*gap/2^30 and the
    sum is order-free bit-exact — RAW-double hash. Same plan shape as
    q_ks_drift: one corpus aggregate + a domain-bounded ordered
    window."""
    from mhw3d_detection_spark.operators.analysis import (
        wasserstein1_two_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return wasserstein1_two_sample(
        docs.select("doc_id", "n_chars"),
        "n_chars",
        F.col("doc_id") % 5 != 4,
    )


# =========================================================================
# E4m (r9) — vocabulary growth (Heaps) curve: new token TYPES per
# corpus-prefix decile — the saturation diagnostic behind "is more
# crawl still buying vocabulary" (and the empirical basis for the
# vocab-bounded broadcast classification in docs/PLANS.md)
# =========================================================================
@register(
    "q_vocab_growth",
    "WITH d AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "n AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n_docs FROM documents), "
    "inst AS (SELECT (doc_id * 10) // n.n_docs AS decile, "
    "  CAST(count(*) AS BIGINT) AS n_inst FROM d, n GROUP BY 1), "
    "ft AS (SELECT token, min(doc_id) AS first_doc FROM d GROUP BY 1), "
    "nt AS (SELECT (first_doc * 10) // n.n_docs AS decile, "
    "  CAST(count(*) AS BIGINT) AS n_new FROM ft, n GROUP BY 1), "
    "spine AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS decile), "
    "j AS (SELECT s.decile, coalesce(i.n_inst, 0) AS n_inst, "
    "  coalesce(t.n_new, 0) AS n_new FROM spine s "
    "  LEFT JOIN inst i ON i.decile = s.decile "
    "  LEFT JOIN nt t ON t.decile = s.decile), "
    "c AS (SELECT decile, n_new AS new_types, "
    "  CAST(sum(n_new) OVER (ORDER BY decile "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "    AS cum_types, "
    "  CAST(sum(n_inst) OVER (ORDER BY decile "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "    AS cum_instances FROM j) "
    "SELECT CAST(decile AS INT) AS decile, new_types, cum_types, "
    "cum_instances, CAST(cum_types AS DOUBLE) / cum_instances AS ttr "
    "FROM c",
)
def q_vocab_growth(spark, sf_dir):
    """E4m (r9): per corpus-prefix decile, how many token TYPES appear
    for the FIRST time (token -> min(doc_id), bucketed by decile of
    the id domain), cumulative vocabulary and the type-token ratio.
    The Heaps-law saturation curve: when new_types flattens, more
    crawl buys no vocabulary — the measured justification for treating
    vocab-keyed dims as sublinear (docs/PLANS.md broadcast sweep).
    All-integer until one exactly-rounded TTR division; integer DIV
    bucketing (non-negative ids: truncation = floor in both engines);
    the corpus is touched by two token aggregates, the window sees 10
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokenize(docs)
    n = docs.agg((F.max("doc_id") + 1).cast("long").alias("n_docs"))
    inst = (
        tok.crossJoin(F.broadcast(n))
        .groupBy(F.expr("div(doc_id * 10, n_docs)").alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inst"))
    )
    ft = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    nt = (
        ft.crossJoin(F.broadcast(n))
        .groupBy(F.expr("div(first_doc * 10, n_docs)").alias("decile"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    spine = docs.sparkSession.range(10).select(F.col("id").alias("decile"))
    j = (
        spine.join(F.broadcast(inst), "decile", "left")
        .join(F.broadcast(nt), "decile", "left")
        .select(
            "decile",
            F.coalesce(F.col("n_inst"), F.lit(0)).alias("n_inst"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = j.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_new").alias("new_types"),
        F.sum("n_new").over(w).cast("long").alias("cum_types"),
        F.sum("n_inst").over(w).cast("long").alias("cum_instances"),
    )
    return c.select(
        "decile",
        "new_types",
        "cum_types",
        "cum_instances",
        (
            F.col("cum_types").cast("double") / F.col("cum_instances")
        ).alias("ttr"),
    )


# =========================================================================
# E6h (r9) — windowless per-source quality deciles (curriculum
# buckets): decile assignment WITHOUT a per-source window — the
# 100 TB-safe device for curriculum ordering / per-slice pruning
# =========================================================================
_QSCORE_SQL = (
    "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
    "+ 0.2 * least(n_stop / 5.0, 1.0)"
)

_CURR_FRACS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


@register(
    "q_curriculum_buckets",
    "WITH d AS (SELECT doc_id, source, text, " + TOKENS_SQL + " AS toks "
    "  FROM documents), "
    "s AS (SELECT doc_id, source, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio FROM d), "
    f"q0 AS (SELECT doc_id, source, {rq_sql(_QSCORE_SQL, 4)} AS q FROM s), "
    "q AS (SELECT * FROM q0 WHERE q IS NOT NULL), "
    "thr AS (SELECT source, list_transform("
    f"  quantile_cont(q, {_CURR_FRACS!r}), "
    f"  x -> {rq_sql('x', 6)}) AS t FROM q GROUP BY 1), "
    "a AS (SELECT q.source, q.q, "
    "  len(list_filter(thr.t, x -> q.q > x)) AS decile "
    "  FROM q JOIN thr ON q.source = thr.source) "
    "SELECT source, CAST(decile AS INT) AS decile, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    f"{rq_sql('avg(q)', 4)} AS mean_quality "
    "FROM a GROUP BY 1, 2",
)
def q_curriculum_buckets(spark, sf_dir):
    """E6h (r9): per-source quality deciles assigned WITHOUT a
    per-source window: nine exact percentile THRESHOLDS per source
    (one distributed aggregate to |sources| rows, rq6-quantized),
    broadcast back, decile = how many thresholds the doc's rq4 quality
    clears. The naive percent_rank-within-source window funnels the
    corpus through |sources| partitions — THIS plan touches the corpus
    with one aggregate and one broadcast join however big the slices
    are. Curriculum schedules (quality-ascending, source-interleaved)
    and per-slice pruning both order by (decile, source). Exactness:
    percentile ≡ quantile_cont on identical rq4 bits (A3 contract),
    rq6 thresholds compare identical bits, counts integer."""
    from mhw3d_detection_spark.operators.textops import text_stats

    docs = load_table(spark, sf_dir, "documents")
    st = text_stats(docs).select("doc_id", rq("quality_score", 4).alias("q"))
    # NULL-text docs have NULL quality: exclude them in BOTH engines —
    # DuckDB's list_filter treats a NULL predicate as false (decile 0)
    # while Spark's fold propagates NULL (code-review r9 finding #3)
    q = docs.select("doc_id", "source").join(st, "doc_id").filter(
        F.col("q").isNotNull()
    )
    fr = ", ".join(repr(f) for f in _CURR_FRACS)
    thr = q.groupBy("source").agg(
        F.transform(
            F.expr(f"percentile(q, array({fr}))"), lambda x: rq(x, 6)
        ).alias("t")
    )
    a = q.join(F.broadcast(thr), "source").select(
        "source",
        "q",
        F.aggregate(
            "t",
            F.lit(0),
            lambda acc, x: acc + (F.col("q") > x).cast("int"),
        ).alias("decile"),
    )
    return a.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        rq(F.avg("q"), 4).alias("mean_quality"),
    ).select(
        "source",
        F.col("decile").cast("int").alias("decile"),
        "n_docs",
        "mean_quality",
    )


# =========================================================================
# E4n (r9) — token burstiness (Fano factor over containing docs,
# Church & Gale '95): topical keywords are BURSTY (repeat hard inside
# a few docs), function words are uniform — the dispersion signal
# TF-IDF's df alone misses
# =========================================================================
_FANO_SQL = "((sc2 / df - (sc / df) * (sc / df)) / (sc / df))"


@register(
    "q_token_burstiness",
    "WITH d AS (SELECT doc_id, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c "
    "  FROM d GROUP BY 1, 2), "
    "s AS (SELECT token, CAST(count(*) AS BIGINT) AS df, "
    "  CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS sc2 "
    "  FROM tf GROUP BY 1) "
    "SELECT token, df, sc AS tf_total, "
    f"{rq_sql('sc / df', 6)} AS mean_tf, "
    f"{rq_sql(_FANO_SQL, 6)} AS fano "
    "FROM s WHERE df >= 10",
)
def q_token_burstiness(spark, sf_dir):
    """E4n (r9): per-token variance-to-mean ratio of within-doc counts
    over the docs CONTAINING the token (Fano factor; Church & Gale
    1995) — burstiness separates topical keywords (high) from function
    words (~uniform) at equal document frequency, the dispersion axis
    TF-IDF cannot see; the keywordness feature for extraction/quality.
    Integer df/Σc/Σc² only; mean and Fano are the SAME textual formula
    in both engines (exactly-rounded division chain on identical
    integer bits), rq6 display. Two token-keyed hash aggregates,
    vocab-sized output (df >= 10)."""
    docs = load_table(spark, sf_dir, "documents")
    tf = tokenize(docs).groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    return s.filter(F.col("df") >= 10).select(
        "token",
        "df",
        F.col("sc").alias("tf_total"),
        rq(F.expr("sc / df"), 6).alias("mean_tf"),
        rq(F.expr(_FANO_SQL), 6).alias("fano"),
    )


# =========================================================================
# E2j (r9) — dup-cluster size census: the dedup ECONOMICS readout
# (how much does dedup shrink the corpus, and is the mass in pairs or
# in mega-clusters — the skew signal behind keep-best/SemDeDup caps)
# =========================================================================
@register(
    "q_dedup_cluster_stats",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    + ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    + ", sizes AS (SELECT label AS component, CAST(count(*) AS BIGINT) AS sz "
    "  FROM l3 GROUP BY 1) "
    "SELECT CAST(sz AS INT) AS component_size, "
    "CAST(count(*) AS BIGINT) AS n_components, "
    "CAST(sum(sz - 1) AS BIGINT) AS dup_mass "
    "FROM sizes GROUP BY 1",
)
def q_dedup_cluster_stats(spark, sf_dir):
    """E2j (r9): histogram of near-dup component sizes from the
    MinHash-band graph (same banding + 3 bounded min-label rounds as
    q_dedup_components) with the per-size duplicate mass Σ(size-1) —
    what dedup will DELETE. The census answers the two operational
    questions at once: total shrink (Σ dup_mass) and whether the mass
    sits in pairs (benign) or mega-clusters (the skew regime that
    motivates keep-best gating and SemDeDup's max_cluster_size cap).
    All-integer; components are pairs-vertices-bounded, the census
    aggregates are component-count-sized."""
    from mhw3d_detection_spark.operators.textops import (
        connected_components_bounded,
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    )
    comp = connected_components_bounded(pairs, iters=3, truncate=True)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return sizes.groupBy(F.col("sz").cast("int").alias("component_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum(F.col("sz") - 1).cast("long").alias("dup_mass"),
    )


# =========================================================================
# E6i (r9) — split-leakage audit: near-dup pairs straddling the
# train/val/test boundary (the eval-hygiene failure dedup must catch:
# a test doc's near-copy sitting in train inflates every benchmark)
# =========================================================================
@register(
    "q_split_leakage",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    f"sp AS (SELECT doc_id, {SPLIT_CASE_SQL('doc_id')} AS split FROM documents) "
    "SELECT sa.split AS split_a, sb.split AS split_b, "
    "CAST(count(*) AS BIGINT) AS n_pairs, "
    "CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_leaks "
    "FROM e0 JOIN sp sa ON e0.u = sa.doc_id "
    "JOIN sp sb ON e0.v = sb.doc_id "
    "GROUP BY 1, 2",
)
def q_split_leakage(spark, sf_dir):
    """E6i (r9): MinHash candidate pairs bucketed by the (split_a,
    split_b) of their endpoints — off-diagonal cells are LEAKAGE (a
    near-copy of an eval doc inside train inflates every benchmark;
    the composition of E2's candidate generation with E6's
    deterministic split that eval hygiene actually requires). The
    md5-uniform split is a pure key function, so both engines assign
    identical splits; pair counts integer. Pairs-sized joins onto a
    narrow split projection — the corpus is touched by the band build
    only."""
    from mhw3d_detection_spark.operators.textops import (
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
        split_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    )
    # r13 optimization (guide §2.4): the split is a pure md5 function
    # of doc_id, so both endpoint splits compute IN PLACE on the pair
    # table — the two joins back to the doc projection (and their two
    # broadcast builds + scans) are gone. Same oracle bits: split_col
    # is the identical expression split_assign applied.
    j = pairs.select(
        split_col(F.col("doc_a")).alias("split_a"),
        split_col(F.col("doc_b")).alias("split_b"),
    )
    return j.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            (F.col("split_a") != F.col("split_b")).cast("int")
        ).cast("long").alias("n_leaks"),
    )


# =========================================================================
# E2k (r9) — cross-source duplication matrix: WHO copies WHOM — the
# provenance readout over the candidate-pair graph (mirror-site
# detection, source-priority decisions for keep-best)
# =========================================================================
@register(
    "q_source_dedup_matrix",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig "
    "  WHERE a.doc_id < b.doc_id), "
    "src AS (SELECT doc_id, source FROM documents) "
    "SELECT least(sa.source, sb.source) AS source_a, "
    "greatest(sa.source, sb.source) AS source_b, "
    "CAST(count(*) AS BIGINT) AS n_pairs "
    "FROM e0 JOIN src sa ON e0.u = sa.doc_id "
    "JOIN src sb ON e0.v = sb.doc_id "
    "GROUP BY 1, 2",
)
def q_source_dedup_matrix(spark, sf_dir):
    """E2k (r9): near-dup candidate pairs rolled up by the UNORDERED
    source pair of their endpoints — the duplication provenance
    matrix: heavy off-diagonal cells are mirror/scraper relationships
    (route to source-priority keep-best), heavy diagonals are
    within-source boilerplate. least/greatest orientation makes the
    pair unordered identically in both engines (binary compare on
    ascii source names); counts integer."""
    from mhw3d_detection_spark.operators.textops import (
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r13 optimization (guide §2.3 "carry, don't re-join"): each
    # endpoint's source rides the banding explode and the bucket join
    # (carry_cols), so the rollup reads it off the pair row — the two
    # joins back onto the corpus (and their broadcast builds + scans)
    # are gone. Pair set and counts unchanged: the carried values are
    # functions of the endpoint ids, so the pair distinct is untouched.
    pairs = minhash_candidate_pairs(
        minhash_bands_rowlocal(
            docs, n_hashes=8, band_size=2, carry_cols=("source",)
        ),
        carry_cols=("source",),
    )
    return pairs.groupBy(
        F.least("source_a", "source_b").alias("source_a"),
        F.greatest("source_a", "source_b").alias("source_b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


# =========================================================================
# E4o (r9) — boilerplate fraction: how much of each doc is SHARED
# shingles (headers/footers/templates) — the CCNet-style page-quality
# signal dup-span (within-pair) and dedup (whole-doc) both miss
# =========================================================================
@register(
    "q_boilerplate_frac",
    f"WITH {SHINGLES_SQL}, "
    "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM shd GROUP BY 1), "
    "j AS (SELECT s.doc_id, CASE WHEN d.df >= 3 THEN 1 ELSE 0 END AS b "
    "  FROM shd s JOIN df d ON s.shingle = d.shingle) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
    "CAST(sum(b) AS BIGINT) AS n_boiler, "
    "sum(b) / count(*) AS boiler_frac "
    "FROM j GROUP BY 1",
)
def q_boilerplate_frac(spark, sf_dir):
    """E4o (r9): per doc, the fraction of its distinct shingles whose
    corpus document-frequency is >= 3 — template/boilerplate mass
    (navigation, footers, licence blocks) that survives whole-doc
    dedup because the surrounding text differs; the page-level quality
    feature CCNet-style filters threshold on. Integer df and counts +
    one exactly-rounded division; two shingle-keyed aggregates and a
    shingle equi-join — the same key the dedup family already
    shuffles on."""
    from mhw3d_detection_spark.operators.textops import distinct_shingles

    docs = load_table(spark, sf_dir, "documents")
    # r14 (VERDICT r13 "What's wrong" #2, guide §2.5): the r13
    # count-over-window(shingle) form put EVERY row of a hot shingle —
    # and boilerplate shingles are by definition the hottest keys in
    # the corpus — into one task's window buffer with no partial
    # aggregation and no AQE escape (skew split only applies to
    # joins). df now comes from a groupBy (map-side partial counts:
    # the shuffle carries one (shingle, partial) row per task, not the
    # exploded table) and is re-attached with an un-hinted equi-join:
    # AQE broadcasts the dim-sized df table at runtime (no shuffle of
    # the shingle table at all), and where the vocabulary outgrows the
    # broadcast threshold the fallback sort-merge join is
    # ENSURE_REQUIREMENTS-exchanged, i.e. AQE-skew-splittable — the
    # escape hatch the window could never have. Costs one extra
    # tokenize pass of the corpus (the df subtree re-scans documents);
    # same integer df, oracle hash unchanged.
    shd = distinct_shingles(docs)
    dfc = shd.groupBy("shingle").agg(
        (F.count(F.lit(1)) >= 3).cast("int").alias("b")
    )
    j = shd.join(dfc, "shingle").select("doc_id", "b")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("b").cast("long").alias("n_boiler"),
        (F.sum("b") / F.count(F.lit(1))).alias("boiler_frac"),
    )


# =========================================================================
# E3n (r9) — MAP@5 retrieval eval: completes the eval quartet
# (recall = coverage, NDCG = graded position, MRR = first hit, MAP =
# precision-weighted ALL hits — the ranking-quality summary leaderboards
# actually report)
# =========================================================================
_MAP_SQL = (
    "WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v "
    "  FROM embeddings), "
    "probes AS (SELECT vec_id AS probe_id, label, v AS pv FROM base "
    "  WHERE vec_id % 50 = 0), "
    "es AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine FROM base b, probes p "
    "  WHERE b.vec_id <> p.probe_id), "
    "er AS (SELECT probe_id, vec_id, row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rank FROM es), "
    "ex AS (SELECT probe_id, vec_id FROM er WHERE rank <= 5), "
    "asims AS (SELECT p.probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.pv) AS cosine "
    "  FROM base b JOIN probes p ON b.label = p.label "
    "  WHERE b.vec_id <> p.probe_id), "
    "ar AS (SELECT probe_id, vec_id, CAST(row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rank "
    "  FROM asims), "
    "ap AS (SELECT probe_id, vec_id, rank FROM ar WHERE rank <= 5), "
    "h AS (SELECT ap.probe_id, ap.rank, "
    "  CASE WHEN ex.vec_id IS NULL THEN 0 ELSE 1 END AS hit "
    "  FROM ap LEFT JOIN ex ON ap.probe_id = ex.probe_id "
    "    AND ap.vec_id = ex.vec_id), "
    "c AS (SELECT probe_id, hit, rank, CAST(sum(hit) OVER ("
    "  PARTITION BY probe_id ORDER BY rank "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum "
    "  FROM h) "
    "SELECT probe_id, CAST(sum(hit) AS BIGINT) AS n_hit, "
    f"{rq_sql('sum(hit * cum / rank) / 5.0', 4)} AS ap5 "
    "FROM c GROUP BY 1"
)


@register("q_retrieval_map", _MAP_SQL)
def q_retrieval_map(spark, sf_dir):
    """E3n (r9): MAP@5 of the IVF-bucketed search vs the exact
    brute-force top-5 — average precision rewards EVERY true neighbor
    by the precision at its rank (recall counts them, NDCG discounts
    them by a fixed curve, MRR sees only the first; AP is the summary
    retrieval leaderboards report). AP@5 = (1/5) Σ hit_i * (cum
    hits_i / i) — integer cumulative hits over a <= 5-row per-probe
    window, divisions of identical integer bits, rq4 absorbing the
    5-term association. Same scaffold as the NDCG/recall rows; probe
    sample at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, probe_pred=lambda c: c % 50 == 0, k=5).select(
        "probe_id", "vec_id", F.lit(1).alias("__hit")
    )
    approx = cosine_topk(
        emb, probe_pred=lambda c: c % 50 == 0, k=5, bucket_col="label"
    ).select("probe_id", "vec_id", "rank")
    h = approx.join(exact, ["probe_id", "vec_id"], "left").select(
        "probe_id",
        "rank",
        F.coalesce(F.col("__hit"), F.lit(0)).alias("hit"),
    )
    w = Window.partitionBy("probe_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = h.withColumn("cum", F.sum("hit").over(w).cast("double"))
    return c.groupBy("probe_id").agg(
        F.sum("hit").cast("long").alias("n_hit"),
        rq(
            F.sum(F.col("hit") * F.col("cum") / F.col("rank")) / F.lit(5.0),
            4,
        ).alias("ap5"),
    )


# =========================================================================
# E2m (r10) — the composed duplication audit: pairs + components ONCE,
# census + leakage + source matrix + keep-best summary from the shared
# intermediate (the component family's q_curate_corpus)
# =========================================================================
def _DEDUP_REPORT_SQL() -> str:
    cc = ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    kq = rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    return (
        f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
        "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
        "  FROM bands a JOIN bands b ON a.band_id = b.band_id "
        "    AND a.band_sig = b.band_sig WHERE a.doc_id < b.doc_id), "
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
        "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
        f"{cc}, "
        "sizes AS (SELECT label AS component, CAST(count(*) AS BIGINT) AS sz "
        "  FROM l3 GROUP BY 1), "
        f"sp AS (SELECT doc_id, {SPLIT_CASE_SQL('doc_id')} AS split "
        "  FROM documents), "
        "src AS (SELECT doc_id, source FROM documents), "
        "kd AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
        "ks AS (SELECT doc_id, len(toks) AS n_tokens, "
        "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
        "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
        "    / greatest(length(text), 1) AS punct_ratio FROM kd), "
        f"kq AS (SELECT doc_id, {kq} AS quality FROM ks), "
        "m AS (SELECT l3.v AS doc_id, l3.label AS component, kq.quality, "
        "  row_number() OVER (PARTITION BY l3.label "
        "  ORDER BY kq.quality DESC, l3.v) AS r "
        "  FROM l3 JOIN kq ON l3.v = kq.doc_id), "
        "verdict AS (SELECT kq.doc_id, CAST(CASE WHEN m.doc_id IS NULL THEN 1 "
        "  WHEN m.r = 1 THEN 1 ELSE 0 END AS INT) AS kept "
        "  FROM kq LEFT JOIN m ON kq.doc_id = m.doc_id) "
        "SELECT 'census' AS section, CAST(CAST(sz AS INT) AS VARCHAR) AS key_a, "
        "  CAST(NULL AS VARCHAR) AS key_b, CAST(count(*) AS BIGINT) AS n, "
        "  CAST(sum(sz - 1) AS BIGINT) AS extra FROM sizes GROUP BY 2 "
        "UNION ALL "
        "SELECT 'leakage', sa.split, sb.split, CAST(count(*) AS BIGINT), "
        "  CAST(sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT) "
        "FROM e0 JOIN sp sa ON e0.u = sa.doc_id "
        "JOIN sp sb ON e0.v = sb.doc_id GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'sources', least(sa.source, sb.source), "
        "  greatest(sa.source, sb.source), CAST(count(*) AS BIGINT), "
        "  CAST(NULL AS BIGINT) "
        "FROM e0 JOIN src sa ON e0.u = sa.doc_id "
        "JOIN src sb ON e0.v = sb.doc_id GROUP BY 2, 3 "
        "UNION ALL "
        "SELECT 'keepbest', s.source, CAST(NULL AS VARCHAR), "
        "  CAST(sum(v.kept) AS BIGINT), CAST(sum(1 - v.kept) AS BIGINT) "
        "FROM verdict v JOIN src s ON v.doc_id = s.doc_id GROUP BY 2"
    )


@register("q_dedup_report", _DEDUP_REPORT_SQL())
def q_dedup_report(spark, sf_dir):
    """E2m (r10): the composed duplication audit — MinHash banding and
    bounded min-label components computed ONCE, then the cluster
    census (E2j), split-leakage audit (E6i), cross-source dup matrix
    (E2k), and keep-best verdict summary (E2h rolled up per source)
    emitted from the SHARED pairs+components intermediate as one
    long-form report (section, key_a, key_b, n, extra). The four
    standalone rows rebuild that intermediate per query (52-54
    exchanges each); this plan pays the banding self-join and the
    propagation rounds once — measured ~3x on the shared stages vs
    running the rows separately (docs/PLANS.md r10). All-integer
    counts over the already-verified components; DuckDB replays the
    identical CTE tree."""
    from mhw3d_detection_spark.plans.dedup_report import dedup_report

    docs = load_table(spark, sf_dir, "documents")
    return dedup_report(docs)


# =========================================================================
# E3o (r10) — sign-random-projection (hyperplane) LSH for cosine:
# the embedding-space member of the LSH candidate-generator family
# (MinHash = shingle sets, SimHash = token multisets, SRP = dense
# cosine), Charikar STOC'02
# =========================================================================
def _dlit(v: float) -> str:
    """A double literal DuckDB parses via strtod (exact) — shared
    helper now lives in :mod:`queries.base` (``dlit``); this alias
    keeps the 40+ existing call sites stable."""
    return dlit(v)


def _SRP_SQL() -> str:
    import math

    from mhw3d_detection_spark.operators.similarity import srp_planes

    n_bits, dim, n_blocks, max_h = 16, 64, 4, 2
    planes = srp_planes(n_bits, dim)
    bw = n_bits // n_blocks

    def dot(j: int) -> str:
        arr = "[" + ", ".join(_dlit(x) for x in planes[j]) + "]"
        term = _dq_sql(f"v[i] * ({arr})[i]", 24)
        return f"list_sum(list_transform(range(1, {dim + 1}), i -> {term}))"

    sig = " + ".join(
        f"(CASE WHEN {dot(j)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    est = "CASE " + " ".join(
        f"WHEN hamming = {h} THEN {_dlit(math.cos(math.pi * h / n_bits))}"
        for h in range(max_h + 1)
    ) + " END"
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
        f"  WHERE len(embedding) = {dim} "
        "    AND len(list_filter(embedding, x -> x IS NULL)) = 0), "
        f"s AS (SELECT vec_id, CAST({sig} AS BIGINT) AS sig FROM e), "
        "blk AS (SELECT vec_id, sig, b.b AS block_id, "
        f"  (sig // (1 << (b.b * {bw}))) % {1 << bw} AS block_bits "
        f"  FROM s, (SELECT unnest(generate_series(0, {n_blocks - 1})) AS b) b), "
        "cand AS (SELECT DISTINCT a.vec_id AS vec_id_a, b2.vec_id AS vec_id_b, "
        "  a.sig AS sa, b2.sig AS sb FROM blk a "
        "  JOIN blk b2 ON a.block_id = b2.block_id "
        "    AND a.block_bits = b2.block_bits "
        "  WHERE a.vec_id < b2.vec_id), "
        "h AS (SELECT vec_id_a, vec_id_b, "
        "  CAST(bit_count(xor(sa, sb)) AS INT) AS hamming FROM cand) "
        "SELECT vec_id_a, vec_id_b, hamming, "
        f"CAST({est} AS DOUBLE) AS est_cos FROM h WHERE hamming <= {max_h}"
    )


@register("q_srp_lsh_pairs", _SRP_SQL())
def q_srp_lsh_pairs(spark, sf_dir):
    """E3o (r10): embedding near-dup candidate pairs via
    sign-random-projection LSH (Charikar STOC'02) — 16 literal
    Gaussian hyperplanes sign-fingerprint each vector, Manku 4-block
    banding generates candidates from (block_id, block_bits)
    equi-joins (never all-pairs), bit_count(xor) verifies, and
    cos(pi*h/16) attaches the angle estimate as shared literals. The
    trainer-free cosine candidate generator: unlike SemDeDup's k-means
    cells, signatures are pure row-local plan literals — nothing to
    version on incremental corpora. Exactness: per-term dyadic
    quantization (2^-24) makes every dot an order-free exact sum, so
    the sign bits are identical cross-engine; no runtime randomness or
    trig anywhere."""
    from mhw3d_detection_spark.operators.similarity import srp_lsh_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return srp_lsh_pairs(emb).withColumn(
        "hamming", F.col("hamming").cast("int")
    )


# =========================================================================
# E4p (r10) — token-frequency Gini: the inequality summary of the
# corpus's Zipf curve (concentration rising across snapshots = new
# data buys occurrences of OLD types, not coverage)
# =========================================================================
@register(
    "q_token_gini",
    "WITH tok AS (SELECT unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "freq AS (SELECT token, CAST(count(*) AS BIGINT) AS v FROM tok GROUP BY 1), "
    "hist AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM freq GROUP BY 1), "
    "c AS (SELECT v, m, CAST(coalesce(sum(m) OVER (ORDER BY v "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum "
    "  FROM hist), "
    "s AS (SELECT v, m, CAST(v * (m * cum + m * (m + 1) / 2) AS BIGINT) "
    "  AS s_part FROM c) "
    "SELECT CAST(sum(m) AS BIGINT) AS n_types, "
    "CAST(sum(v * m) AS BIGINT) AS n_tokens, "
    "(2 * CAST(sum(s_part) AS BIGINT) "
    " - (CAST(sum(m) AS BIGINT) + 1) * CAST(sum(v * m) AS BIGINT)) "
    " / (CAST(sum(m) AS BIGINT) * CAST(sum(v * m) AS BIGINT)) AS gini "
    "FROM s",
)
def q_token_gini(spark, sf_dir):
    """E4p (r10): Gini coefficient of token-frequency concentration.
    One corpus aggregate; ranks collapse to the (frequency, #types)
    histogram so the ordered window is domain-bounded (the
    ks_two_sample device) and tie blocks contribute in closed form —
    pure BIGINT until one exactly-rounded division (RAW hash)."""
    from mhw3d_detection_spark.operators.textops import token_gini

    docs = load_table(spark, sf_dir, "documents")
    return token_gini(docs)


# =========================================================================
# E4q (r10) — Dunning G² keyness: over/under-represented vocabulary
# of a corpus slice vs the rest (source profiling, mixture debugging,
# contamination triage), Dunning CL'93
# =========================================================================
@register(
    "q_keyness_llr",
    "WITH tok AS (SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS t, "
    "  unnest(" + TOKENS_SQL + ") AS token FROM documents), "
    "g AS (SELECT token, CAST(sum(t) AS BIGINT) AS a, "
    "  CAST(count(*) - sum(t) AS BIGINT) AS b FROM tok GROUP BY 1 "
    "  HAVING count(*) >= 5), "
    "tot AS (SELECT CAST(sum(t) AS DOUBLE) AS na, "
    "  CAST(count(*) - sum(t) AS DOUBLE) AS nb FROM tok) "
    "SELECT token, a, b, "
    "CAST(CASE WHEN a * nb > b * na THEN 1 ELSE 0 END AS INT) AS enriched, "
    + rq_sql(
        "2.0 * ((CASE WHEN a > 0 THEN a * ln(a / "
        "  ((a + b) * na / (na + nb))) ELSE 0.0 END) "
        " + (CASE WHEN b > 0 THEN b * ln(b / "
        "  ((a + b) * nb / (na + nb))) ELSE 0.0 END))",
        4,
    )
    + " AS g2 FROM g, tot",
)
def q_keyness_llr(spark, sf_dir):
    """E4q (r10): Dunning log-likelihood keyness of src0 vs the rest
    of the corpus. Integer counts, exactly-rounded ln arguments, G²
    display-only rq4 (the repo ln contract — the enriched DECISION is
    the integer cross-product a·nb > b·na); one token aggregate + a
    1-row totals broadcast."""
    from mhw3d_detection_spark.operators.textops import keyness_llr

    docs = load_table(spark, sf_dir, "documents")
    return keyness_llr(docs, F.col("source") == "src0")


# =========================================================================
# E4r (r10) — Zipf rank-frequency fit: the power-law exponent of the
# top of the vocabulary (|slope| low = templated/boilerplate-heavy,
# high = degenerate repetition)
# =========================================================================
def _ZIPF_SQL(top_n: int = 100) -> str:
    import math

    lnr = ", ".join(
        f"({r}, {_dlit(math.log(r))})" for r in range(1, top_n + 1)
    )
    dq_x = _dq_sql("l.x", 30)
    dq_y = _dq_sql("ln(CAST(r.v AS DOUBLE))", 30)
    return (
        "WITH tok AS (SELECT unnest(" + TOKENS_SQL + ") AS token FROM documents), "
        "freq AS (SELECT token, CAST(count(*) AS BIGINT) AS v FROM tok GROUP BY 1), "
        f"top AS (SELECT token, v FROM freq ORDER BY v DESC, token LIMIT {top_n}), "
        "r AS (SELECT token, v, CAST(row_number() OVER (ORDER BY v DESC, token) "
        "  AS INT) AS rank FROM top), "
        f"lnr(rank, x) AS (SELECT * FROM (VALUES {lnr})), "
        f"j AS (SELECT {dq_x} AS x, {dq_y} AS y "
        "  FROM r JOIN lnr l ON r.rank = l.rank), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy, "
        f"  sum({_dq_sql('x * y', 20)}) AS sxy, "
        f"  sum({_dq_sql('x * x', 20)}) AS sxx FROM j) "
        "SELECT CAST(n AS BIGINT) AS n_top, "
        + rq_sql("(n*sxy - sx*sy) / (n*sxx - sx*sx)", 4)
        + " AS zipf_slope, "
        + rq_sql("(sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n", 4)
        + " AS zipf_intercept FROM s"
    )


@register("q_zipf_fit", _ZIPF_SQL())
def q_zipf_fit(spark, sf_dir):
    """E4r (r10): OLS fit of ln(freq) ~ ln(rank) over the top-100
    types. ln(rank) is a shared-literal dim (no runtime trig on x);
    ln(freq) runs on identical integer bits; all five OLS sums are
    dyadic-quantized order-free; slope/intercept are one shared
    closed-form formula, rq4 display."""
    from mhw3d_detection_spark.operators.textops import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs)


# =========================================================================
# E3p (r10) — trainer-free semantic dedup APPLIED: SRP-LSH pairs ->
# bounded components -> anti-join (SemDeDup's outcome without a
# k-means quantizer to version on incremental corpora)
# =========================================================================
def _SRP_APPLY_SQL() -> str:
    cc = ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    srp = _SRP_SQL()
    # reuse the full SRP pair pipeline as a prefix: strip its final
    # SELECT, keep the CTE chain, rename the pair output into e0.
    # The SRP base CTE is named "e", which collides with _CC_ITER's
    # edge table — rename it to eb in this composition
    prefix = (
        srp[: srp.index("h AS (SELECT vec_id_a")]
        .replace("WITH e AS (", "WITH eb AS (", 1)
        .replace("AS sig FROM e)", "AS sig FROM eb)", 1)
    )
    return (
        prefix
        + "e0 AS (SELECT vec_id_a AS u, vec_id_b AS v FROM cand "
        "  WHERE bit_count(xor(sa, sb)) <= 2), "
        "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
        "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
        f"{cc}, "
        "drops AS (SELECT v AS vec_id FROM l3 WHERE v <> label) "
        "SELECT em.vec_id, em.label AS class_label FROM embeddings em "
        "LEFT JOIN drops d ON em.vec_id = d.vec_id WHERE d.vec_id IS NULL"
    )


@register("q_srp_dedup_apply", _SRP_APPLY_SQL())
def q_srp_dedup_apply(spark, sf_dir):
    """E3p (r10): the surviving embedding corpus after SRP-LSH
    semantic dedup — candidate pairs from the hyperplane fingerprints
    (E3o), 3 bounded min-label rounds, min-id kept per component,
    drop-list anti-joined (broadcast: drops are pairs-vertices-
    bounded; the corpus-scale caveat and gate live on
    dedup_keep_best / semantic_dedup and apply here identically).
    SemDeDup's outcome with NOTHING to train or version — the right
    dedup for incremental corpora where k-means cells drift."""
    from mhw3d_detection_spark.operators.similarity import srp_lsh_pairs
    from mhw3d_detection_spark.operators.textops import (
        connected_components_bounded,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = srp_lsh_pairs(emb).select(
        F.col("vec_id_a").alias("doc_a"), F.col("vec_id_b").alias("doc_b")
    )
    comp = connected_components_bounded(pairs, iters=3, truncate=True)
    drops = comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias("vec_id")
    )
    return emb.join(F.broadcast(drops), "vec_id", "left_anti").select(
        "vec_id", F.col("label").alias("class_label")
    )


# =========================================================================
# E4s (r10) — source similarity matrix: token-distribution overlap
# coefficient between every source pair (mixture redundancy: two
# "sources" that are the same distribution add no diversity)
# =========================================================================
@register(
    "q_source_overlap_matrix",
    "WITH tok AS (SELECT source, unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n "
    "  FROM tok GROUP BY 1, 2), "
    "t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1), "
    "j AS (SELECT a.source AS source_a, b.source AS source_b, "
    "  CAST(sum(least(a.n * tb.tot, b.n * ta.tot)) AS BIGINT) AS inter_x "
    "  FROM c a JOIN c b ON a.token = b.token AND a.source < b.source "
    "  JOIN t ta ON ta.source = a.source "
    "  JOIN t tb ON tb.source = b.source "
    "  GROUP BY 1, 2) "
    "SELECT j.source_a, j.source_b, "
    "  j.inter_x / (ta.tot * tb.tot) AS overlap "
    "FROM j JOIN t ta ON ta.source = j.source_a "
    "JOIN t tb ON tb.source = j.source_b",
)
def q_source_overlap_matrix(spark, sf_dir):
    """E4s (r10): pairwise histogram-intersection similarity of source
    unigram distributions — Σ_token min(p_a, p_b) per unordered source
    pair (1 = identical distributions, 0 = disjoint vocabulary). The
    mixture-redundancy readout: near-1 off-diagonal cells mean two
    named sources are the SAME distribution (mirror crawls, split
    feeds) and their mixture weights double-count diversity.
    Exactness: min of cross-multiplied INTEGER masses (min(n_a/t_a,
    n_b/t_b) = min(n_a·t_b, n_b·t_a)/(t_a·t_b)) — the division is one
    exactly-rounded op per output row (RAW hash). Token-keyed
    equi-join on the sources' count tables (vocab-bounded), source
    totals broadcast-sized."""
    from pyspark.sql import functions as F  # noqa: F811

    docs = load_table(spark, sf_dir, "documents")
    from mhw3d_detection_spark.operators.textops import tokens_col

    tok = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("source").agg(F.sum("n").cast("long").alias("tot"))
    a = c.select(
        F.col("source").alias("source_a"), "token", F.col("n").alias("na")
    )
    b = c.select(
        F.col("source").alias("source_b"), "token", F.col("n").alias("nb")
    )
    j = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(
            F.broadcast(t.select(F.col("source").alias("source_a"),
                                 F.col("tot").alias("ta"))),
            "source_a",
        )
        .join(
            F.broadcast(t.select(F.col("source").alias("source_b"),
                                 F.col("tot").alias("tb"))),
            "source_b",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.least(F.col("na") * F.col("tb"), F.col("nb") * F.col("ta"))
            ).cast("long").alias("inter_x"),
            F.first("ta").alias("ta"),
            F.first("tb").alias("tb"),
        )
    )
    return j.select(
        "source_a",
        "source_b",
        (F.col("inter_x") / (F.col("ta") * F.col("tb"))).alias("overlap"),
    )


# =========================================================================
# E3q (r10) — reciprocal nearest neighbors: the mutual-top-1 filter
# (precision leg for semantic dedup / pair mining; hubness artifacts
# fail the mutuality test)
# =========================================================================
@register(
    "q_mutual_nn",
    "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
    "  WHERE vec_id % 10 = 0), "
    "es AS (SELECT p.vec_id AS probe_id, b.vec_id, "
    "  list_cosine_similarity(b.v, p.v) AS cosine FROM base b, base p "
    "  WHERE b.vec_id <> p.vec_id), "
    "r AS (SELECT probe_id, vec_id, cosine, row_number() OVER ("
    "  PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rnk FROM es), "
    "t1 AS (SELECT probe_id, vec_id, cosine FROM r WHERE rnk = 1) "
    "SELECT a.probe_id AS vec_id_a, a.vec_id AS vec_id_b, "
    + rq_sql("a.cosine", 6)
    + " AS cosine FROM t1 a JOIN t1 b "
    "ON a.probe_id = b.vec_id AND a.vec_id = b.probe_id "
    "WHERE a.probe_id < a.vec_id",
)
def q_mutual_nn(spark, sf_dir):
    """E3q (r10): mutual cosine top-1 pairs within the vec_id%10 audit
    panel — reciprocal nearest neighbors, the precision filter pair
    mining and semantic-dedup verification run on candidate output
    (one-directional top-1 inherits hubness noise; mutuality kills
    it). Panel-bounded two-phase top-k twice; tie-break (cosine DESC,
    vec_id) replays in SQL; cosine rq6 display."""
    from mhw3d_detection_spark.operators.similarity import mutual_nn_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return mutual_nn_pairs(emb, lambda c: c % 10 == 0)


# =========================================================================
# E2n (r10) — edit-distance verification of near-dup candidates: the
# precision leg after banding (a pipeline that DELETES data re-checks
# survivors with an exact string metric)
# =========================================================================
_EDIT_VERIFY_MAX_LEN = 300


@register(
    "q_dedup_edit_verify",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id "
    "    AND a.band_sig = b.band_sig WHERE a.doc_id < b.doc_id), "
    "j AS (SELECT e0.u AS doc_a, e0.v AS doc_b, "
    f"  substr(da.text, 1, {_EDIT_VERIFY_MAX_LEN}) AS ta, "
    f"  substr(db.text, 1, {_EDIT_VERIFY_MAX_LEN}) AS tb, "
    "  length(da.text) AS la, length(db.text) AS lb "
    "  FROM e0 JOIN documents da ON e0.u = da.doc_id "
    "  JOIN documents db ON e0.v = db.doc_id) "
    "SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS edit_dist, "
    "levenshtein(ta, tb) / greatest(length(ta), length(tb), 1) AS edit_ratio, "
    "CAST(CASE WHEN levenshtein(ta, tb) / greatest(length(ta), length(tb), 1) "
    "  <= 0.2 THEN 1 ELSE 0 END AS INT) AS verified, "
    f"CAST(CASE WHEN la > {_EDIT_VERIFY_MAX_LEN} "
    f"  OR lb > {_EDIT_VERIFY_MAX_LEN} THEN 1 ELSE 0 END AS INT) "
    "  AS truncated FROM j",
)
def q_dedup_edit_verify(spark, sf_dir):
    """E2n (r10, r11 cap): Levenshtein re-verification of the MinHash
    candidate pairs — integer dynamic programming, bit-exact in any
    engine; the normalized ratio dist/max(len) is one exactly-rounded
    division (RAW hash). Candidate-pairs-bounded, and since r11 the
    per-pair DP cost is HARD-capped by ``max_len=300`` prefix
    truncation (flagged per pair) — the scale mitigation is now a
    parameter, not prose (VERDICT r10 Next #4)."""
    from mhw3d_detection_spark.operators.textops import (
        dedup_edit_verify,
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
    )
    return dedup_edit_verify(docs, pairs, max_len=_EDIT_VERIFY_MAX_LEN)


# =========================================================================
# E7g (r10) — HLL daily-active-users on the event stream: the sketch
# family exercised on the EVENTS surface (per-day distinct users,
# mergeable across ingest batches) with the exact count as the
# calibration column
# =========================================================================
def _DAU_SQL() -> str:
    from mhw3d_detection_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_WBITS,
        bitlen_sql,
    )

    rho = f"({HLL_WBITS + 1} - {bitlen_sql(f'x // {HLL_M}', HLL_WBITS)})"
    a_mm = HLL_ALPHA * HLL_M * HLL_M
    return (
        "WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events "
        "  WHERE user_id IS NOT NULL), "
        "h AS (SELECT day, "
        "  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS x "
        "  FROM ev), "
        f"r AS (SELECT day, x % {HLL_M} AS reg, max({rho}) AS rho "
        "  FROM h GROUP BY 1, 2), "
        "agg AS (SELECT day, count(*) AS nreg, "
        "  sum(1.0 / (1::BIGINT << rho)) AS s_present FROM r GROUP BY 1), "
        f"e AS (SELECT day, {a_mm!r} / (s_present + ({HLL_M} - nreg)) AS raw, "
        f"  {HLL_M} - nreg AS v FROM agg), "
        f"est AS (SELECT day, CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0 "
        f"  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v) ELSE raw END AS ed "
        "  FROM e), "
        "ex AS (SELECT CAST(ts AS DATE) AS day, "
        "  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_dau FROM events "
        "  WHERE user_id IS NOT NULL GROUP BY 1) "
        f"SELECT est.day, {rq_sql('ed', 4)} AS est_dau, exact_dau "
        "FROM est JOIN ex ON est.day = ex.day"
    )


@register("q_dau_hll", _DAU_SQL())
def q_dau_hll(spark, sf_dir):
    """E7g (r10): per-day distinct active users from the HLL register
    sketch (md5-48bit hash of the stringified id, unrolled-CASE rank,
    exact power-of-two register sums), with the exact distinct as the
    calibration column — the analytics-surface twin of
    q_token_cardinality: per-day register tables are FIXED-SIZE
    mergeable state, so DAU over any date range is a register-wise
    max, never a re-scan. ln only in the linear-counting branch (rq4
    display, the repo ln contract)."""
    from mhw3d_detection_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from mhw3d_detection_spark.queries.base import rq as _rq

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(F.to_date("ts").alias("day"), "user_id")
    regs = hll_registers(
        ev, F.col("user_id").cast("string"), ["day"]
    )
    est = hll_estimate(regs, ["day"])
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("exact_dau")
    )
    return est.join(exact, "day").select(
        "day", _rq(F.col("est_distinct"), 4).alias("est_dau"), "exact_dau"
    )


# =========================================================================
# E7h (r10) — per-source quality CUSUM over crawl order: the monitor
# that catches a silently-broken extractor mid-crawl (mean quality
# step-shifts long before any single doc looks anomalous)
# =========================================================================
def _QCUSUM_SQL() -> str:
    k, h = 0.5, 8.0  # dyadic multiples of 1/64 (the operator contract)
    dq6 = lambda e: _dq_sql(e, 6)  # noqa: E731
    kq = rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    return (
        "WITH kd AS (SELECT doc_id, source, text, " + TOKENS_SQL + " AS toks "
        "  FROM documents), "
        "ks AS (SELECT doc_id, source, len(toks) AS n_tokens, "
        "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
        "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
        "    / greatest(length(text), 1) AS punct_ratio FROM kd), "
        f"kq AS (SELECT doc_id, source, {kq} AS quality FROM ks), "
        f"base AS (SELECT source, doc_id, {dq6('quality * 64.0')} AS xq FROM kq), "
        f"mu AS (SELECT source, {dq6('sum(xq) / count(*)')} AS mu "
        "  FROM base GROUP BY 1), "
        "st AS (SELECT b.source, b.doc_id, "
        f"  b.xq - m.mu - {k!r} AS sp, m.mu - b.xq - {k!r} AS sn "
        "  FROM base b JOIN mu m USING (source)), "
        "q AS (SELECT source, doc_id, sum(sp) OVER w AS qp, sum(sn) OVER w AS qn "
        "  FROM st WINDOW w AS (PARTITION BY source ORDER BY doc_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "c AS (SELECT source, doc_id, "
        "  qp - least(0.0, min(qp) OVER w) AS cp, "
        "  qn - least(0.0, min(qn) OVER w) AS cn "
        "  FROM q WINDOW w AS (PARTITION BY source ORDER BY doc_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
        "SELECT source, CAST(count(*) AS INT) AS n_docs, "
        f"CAST(count(CASE WHEN cp > {h!r} THEN 1 END) AS INT) AS n_alarm_up, "
        f"CAST(count(CASE WHEN cn > {h!r} THEN 1 END) AS INT) AS n_alarm_down, "
        f"{rq_sql('max(cp)', 2)} AS max_cusum_up, "
        f"{rq_sql('max(cn)', 2)} AS max_cusum_down, "
        f"min(CASE WHEN cn > {h!r} THEN doc_id END) AS first_alarm_down "
        "FROM c GROUP BY 1"
    )


@register("q_source_quality_cusum", _QCUSUM_SQL())
def q_source_quality_cusum(spark, sf_dir):
    """E7h (r10): two-sided CUSUM over each source's quality series in
    doc_id (crawl) order — W15's regime-shift detector composed onto
    the curation surface: a step change in mean quality (extractor
    regression, template change, spam flood) alarms long before any
    single document fails a static filter. Quality is the shared rq4
    composite (the keep-best formula), scaled x64 onto the operator's
    dyadic 1/64 grid; the CUSUM recursion is the verified two-window
    closed form; alarms/integers + rq2 maxima hash exactly. The
    down-alarm's first doc_id is the triage pointer."""
    from mhw3d_detection_spark.operators.analysis import cusum_changepoints
    from mhw3d_detection_spark.operators.textops import text_stats
    from mhw3d_detection_spark.queries.base import rq as _rq

    docs = load_table(spark, sf_dir, "documents")
    q = text_stats(docs).select(
        "doc_id",
        (_rq(F.col("quality_score"), 4) * 64.0).alias("q64"),
    ).join(docs.select("doc_id", "source"), "doc_id")
    c = cusum_changepoints(
        q,
        allowance=0.5,
        threshold=8.0,
        cell_col="source",
        time_col="doc_id",
        temp_col="q64",
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(F.col("alarm_pos").cast("int")).cast("int").alias("n_alarm_up"),
        F.sum(F.col("alarm_neg").cast("int")).cast("int").alias(
            "n_alarm_down"
        ),
        _rq(F.max("cusum_pos"), 2).alias("max_cusum_up"),
        _rq(F.max("cusum_neg"), 2).alias("max_cusum_down"),
        F.min(F.when(F.col("alarm_neg"), F.col("doc_id"))).alias(
            "first_alarm_down"
        ),
    )


# =========================================================================
# E1b (r10) — normalization + normalized exact dedup: the cleaner
# stage and the dup class it exposes (case/whitespace re-serves that
# byte-hash dedup misses and near-dup machinery shouldn't be spent on)
# =========================================================================
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[\\t\\n\\r]', ' ', 'g'), "
    "' +', ' ', 'g'))"
)


@register(
    "q_text_normalize",
    f"WITH n AS (SELECT doc_id, text, {_NORM_SQL} AS norm FROM documents) "
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw, "
    "CAST(length(norm) AS BIGINT) AS n_chars_norm, "
    "CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS INT) AS changed, "
    "('0x' || substr(md5(norm), 1, 12))::BIGINT AS norm_fingerprint "
    "FROM n",
)
def q_text_normalize(spark, sf_dir):
    """E1b (r10): canonicalization with change accounting — lowercase,
    control-whitespace to space, runs collapsed, trimmed; fingerprint
    is the repo-standard 48-bit md5 of the NORMALIZED text (hashes
    taken pre-normalization can't identify re-serves). Pure narrow
    projection, zero shuffles; string ops and md5 are bit-exact."""
    from mhw3d_detection_spark.operators.textops import normalize_texts

    docs = load_table(spark, sf_dir, "documents")
    return normalize_texts(docs)


@register(
    "q_dedup_normalized",
    # deterministic fault injection (the P13-nulls device): every 37th
    # doc gets a re-serve twin — uppercased, tab-indented, space-doubled
    # — byte-different, normalization-identical; the row then checks
    # RECALL (every planted twin found), not just absence of noise
    "WITH corpus AS (SELECT doc_id, text FROM documents "
    "  UNION ALL SELECT doc_id + 1000000, "
    "  chr(9) || upper(text) || '  ' FROM documents WHERE doc_id % 37 = 0), "
    f"n AS (SELECT doc_id, {_NORM_SQL} AS norm FROM corpus), "
    "g AS (SELECT norm, CAST(count(*) AS BIGINT) AS group_size, "
    "  min(doc_id) AS keep_id FROM n GROUP BY 1 HAVING count(*) >= 2) "
    "SELECT n.doc_id, g.group_size, "
    "CAST(CASE WHEN n.doc_id = g.keep_id THEN 1 ELSE 0 END AS INT) AS kept "
    "FROM n JOIN g ON n.norm = g.norm",
)
def q_dedup_normalized(spark, sf_dir):
    """E1b (r10): exact dedup on the normalized key — the dup class
    between E1 (byte hash) and E2 (banding): CRLF/case re-serves are
    byte-different, Jaccard ~1.0, and string-identical after the
    shared normalization expression. Hash-groupBy, min-id kept,
    duplicate groups only."""
    from mhw3d_detection_spark.operators.textops import (
        dedup_exact_normalized,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("\t"), F.upper("text"), F.lit("  ")).alias("text"),
    )
    return dedup_exact_normalized(docs.unionAll(twins))


# =========================================================================
# E2o (r10) — IDF-weighted containment: the quote detector with the
# boilerplate hole closed (rare shingles decisive, shared footers
# nearly free — BM25's insight applied to the dedup question)
# =========================================================================
@register(
    "q_weighted_containment",
    f"WITH {SHINGLES_SQL}, "
    "shd AS (SELECT DISTINCT doc_id, shingle FROM sh), "
    "nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents), "
    "dfx AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM shd GROUP BY 1), "
    "w AS (SELECT s.doc_id, s.shingle, "
    + _dq_sql("ln(nd.n / dfx.df)", 20)
    + " AS w FROM shd s JOIN dfx ON s.shingle = dfx.shingle, nd), "
    "p AS (SELECT doc_id AS probe_id, shingle, w AS pw FROM w "
    "  WHERE doc_id % 20 = 0), "
    "den AS (SELECT probe_id, sum(pw) AS wsum FROM p GROUP BY 1), "
    "inter AS (SELECT p.probe_id, w.doc_id, "
    "  CAST(count(*) AS BIGINT) AS n_shared, sum(p.pw) AS wint "
    "  FROM p JOIN w ON p.shingle = w.shingle AND w.doc_id <> p.probe_id "
    "  GROUP BY 1, 2) "
    "SELECT i.probe_id, i.doc_id, i.n_shared, "
    + rq_sql("i.wint / d.wsum", 6)
    + " AS w_containment "
    "FROM inter i JOIN den d ON i.probe_id = d.probe_id "
    "WHERE i.wint / d.wsum >= 0.5",
)
def q_weighted_containment(spark, sf_dir):
    """E2o (r10): idf-weighted asymmetric containment from the
    vec_id%20 probe slice — Σ idf over shared shingles / Σ idf over
    the probe's shingles. Integer df/N, ln of identical exactly-
    rounded divisions, dyadic-quantized weights so both sums are
    order-free; same shingle-keyed join geometry as E2i plus the df
    aggregate E4o already pays."""
    from mhw3d_detection_spark.operators.textops import (
        weighted_containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_containment_pairs(docs, lambda c: c % 20 == 0)


# =========================================================================
# E4t (r10) — the composed corpus-shape report: ONE token aggregate
# feeds Gini + Zipf + Heaps + entropy (the analytics family's
# q_dedup_report)
# =========================================================================
def _CORPUS_REPORT_SQL(top_n: int = 100) -> str:
    import math

    lnr = ", ".join(
        f"({r}, {_dlit(math.log(r))})" for r in range(1, top_n + 1)
    )
    dq_x = _dq_sql("l.x", 30)
    dq_y = _dq_sql("ln(CAST(r.v AS DOUBLE))", 30)
    slope = "(n*sxy - sx*sy) / (n*sxx - sx*sx)"
    return (
        "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
        "dt AS (SELECT doc_id, unnest(toks) AS token FROM d), "
        "freq AS (SELECT token, CAST(count(*) AS BIGINT) AS v, "
        "  min(doc_id) AS first_doc FROM dt GROUP BY 1), "
        "nn AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS n_docs FROM documents), "
        "hist AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM freq GROUP BY 1), "
        "gc AS (SELECT v, m, CAST(coalesce(sum(m) OVER (ORDER BY v "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
        "  AS cum FROM hist), "
        "gs AS (SELECT v, m, CAST(v * (m * cum + m * (m + 1) / 2) AS BIGINT) "
        "  AS s_part FROM gc), "
        "gini AS (SELECT CAST(sum(m) AS BIGINT) AS n_types, "
        "  CAST(sum(v * m) AS BIGINT) AS n_tokens, "
        "  (2 * CAST(sum(s_part) AS BIGINT) "
        "   - (CAST(sum(m) AS BIGINT) + 1) * CAST(sum(v * m) AS BIGINT)) "
        "   / (CAST(sum(m) AS BIGINT) * CAST(sum(v * m) AS BIGINT)) AS g "
        "  FROM gs), "
        f"ztop AS (SELECT token, v FROM freq ORDER BY v DESC, token LIMIT {top_n}), "
        "zr AS (SELECT token, v, CAST(row_number() OVER (ORDER BY v DESC, token) "
        "  AS INT) AS rank FROM ztop), "
        f"lnr(rank, x) AS (SELECT * FROM (VALUES {lnr})), "
        f"zj AS (SELECT {dq_x} AS x, {dq_y} AS y "
        "  FROM zr r JOIN lnr l ON r.rank = l.rank), "
        "zs AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy, "
        f"  sum({_dq_sql('x * y', 20)}) AS sxy, "
        f"  sum({_dq_sql('x * x', 20)}) AS sxx FROM zj), "
        "nt AS (SELECT (first_doc * 10) // nn.n_docs AS decile, "
        "  CAST(count(*) AS BIGINT) AS n_new FROM freq, nn GROUP BY 1), "
        "dl AS (SELECT (doc_id * 10) // nn.n_docs AS decile, "
        "  CAST(len(toks) AS BIGINT) AS k FROM d, nn), "
        "inst AS (SELECT decile, CAST(sum(k) AS BIGINT) AS n_inst FROM dl GROUP BY 1), "
        "spine AS (SELECT CAST(unnest(generate_series(0, 9)) AS BIGINT) AS decile), "
        "hj AS (SELECT s.decile, coalesce(nt.n_new, 0) AS n_new, "
        "  coalesce(inst.n_inst, 0) AS n_inst FROM spine s "
        "  LEFT JOIN nt USING (decile) LEFT JOIN inst USING (decile)), "
        "hc AS (SELECT decile, CAST(sum(n_new) OVER w AS BIGINT) AS cum_types, "
        "  CAST(sum(n_inst) OVER w AS BIGINT) AS cum_inst FROM hj "
        "  WINDOW w AS (ORDER BY decile "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), "
        "ent AS (SELECT CAST(count(*) AS BIGINT) AS n_types, "
        "  CAST(sum(v) AS BIGINT) AS n_tokens, "
        "  sum(v * ln(CAST(v AS DOUBLE))) AS clc FROM freq) "
        "SELECT 'gini' AS section, CAST(NULL AS VARCHAR) AS key, "
        "  n_types AS n, n_tokens AS m, g AS x FROM gini "
        "UNION ALL SELECT 'zipf', 'slope', CAST(n AS BIGINT), "
        f"  CAST(NULL AS BIGINT), {rq_sql(slope, 4)} FROM zs "
        "UNION ALL SELECT 'zipf', 'intercept', CAST(n AS BIGINT), "
        "  CAST(NULL AS BIGINT), "
        f"  {rq_sql(f'(sy - ({slope}) * sx) / n', 4)} FROM zs "
        "UNION ALL SELECT 'heaps', CAST(CAST(decile AS INT) AS VARCHAR), "
        "  cum_types, cum_inst, CAST(cum_types AS DOUBLE) / cum_inst FROM hc "
        "UNION ALL SELECT 'entropy', CAST(NULL AS VARCHAR), n_types, n_tokens, "
        f"  {rq_sql('ln(CAST(n_tokens AS DOUBLE)) - clc / n_tokens', 4)} FROM ent"
    )


@register("q_corpus_report", _CORPUS_REPORT_SQL())
def q_corpus_report(spark, sf_dir):
    """E4t (r10): the composed corpus-shape report — Gini (E4p), Zipf
    (E4r), Heaps deciles (E4m) and corpus entropy emitted from ONE
    materialized (token, count, first_doc) aggregate; decile instance
    totals come from a token-count projection that never explodes the
    corpus. The standalone rows each rebuild the freq table; a health
    check pays it once (measured comparison in docs/PLANS.md r10)."""
    from mhw3d_detection_spark.plans.corpus_report import corpus_report

    docs = load_table(spark, sf_dir, "documents")
    return corpus_report(docs)


# =========================================================================
# E6j (r10) — component-coherent split: the FIX for E6i's finding —
# near-dup components assigned to ONE split (leakage zero by
# construction, not by audit)
# =========================================================================
@register(
    "q_component_split",
    f"WITH {SHINGLES_SQL}, {MINHASH_SIG_SQL}, "
    "e0 AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v "
    "  FROM bands a JOIN bands b ON a.band_id = b.band_id "
    "    AND a.band_sig = b.band_sig WHERE a.doc_id < b.doc_id), "
    "e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0), "
    "l0 AS (SELECT DISTINCT v, v AS label FROM e), "
    + ", ".join(_CC_ITER.format(cur=i, next=i + 1) for i in range(3))
    + ", key AS (SELECT d.doc_id, coalesce(l3.label, d.doc_id) AS split_key "
    "  FROM documents d LEFT JOIN l3 ON d.doc_id = l3.v), "
    f"sp AS (SELECT doc_id, split_key, {SPLIT_CASE_SQL('split_key')} AS split "
    "  FROM key), "
    "leaks AS (SELECT CAST(count(*) AS BIGINT) AS n_leaks FROM e0 "
    "  JOIN sp sa ON e0.u = sa.doc_id JOIN sp sb ON e0.v = sb.doc_id "
    "  WHERE sa.split <> sb.split) "
    "SELECT sp.split, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(count(DISTINCT sp.split_key) AS BIGINT) AS n_keys, "
    "leaks.n_leaks FROM sp, leaks GROUP BY 1, 4",
)
def q_component_split(spark, sf_dir):
    """E6j (r10): deterministic train/val/test split keyed by the
    near-dup COMPONENT label (min-id propagation; singletons key on
    their own id) instead of the doc id — every member of a dup
    component lands in the same split, so cross-split leakage is zero
    BY CONSTRUCTION (the remedy for what q_split_leakage audits; cf.
    the contamination literature's doc-cluster holdout rule). The
    md5-uniform split is the shared SPLIT_CASE expression on the
    component key; the report re-audits the pair graph and carries
    n_leaks (provably 0) as the self-check column."""
    from mhw3d_detection_spark.operators.textops import (
        connected_components_bounded,
        minhash_bands_rowlocal,
        minhash_candidate_pairs,
        split_assign,
    )

    docs = load_table(spark, sf_dir, "documents")
    # pairs feed BOTH the key derivation and the leak re-audit, and
    # comp feeds the key join — localCheckpoint them (the dedup_report
    # device) or every branch re-embeds the banding + 3 propagation
    # rounds into its plan tree (measured: 164 exchanges without, 12
    # with; values unchanged)
    from mhw3d_detection_spark.plans.audit_hook import ckpt as _ckpt

    pairs = _ckpt(
        minhash_candidate_pairs(
            minhash_bands_rowlocal(docs, n_hashes=8, band_size=2)
        ),
        "pairs",
    )
    comp = _ckpt(
        connected_components_bounded(pairs, iters=3, truncate=True),
        "components",
    )
    key = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("split_key"),
    )
    sp = split_assign(
        key.withColumnRenamed("split_key", "__sk"), key_col="__sk"
    ).select("doc_id", F.col("__sk").alias("split_key"), "split")
    leaks = (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"),
                      F.col("split").alias("sa")), "doc_a")
        .join(
            sp.select(F.col("doc_id").alias("doc_b"),
                      F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaks"))
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("split_key").cast("long").alias("n_keys"),
        )
        .crossJoin(F.broadcast(leaks))
        .select("split", "n_docs", "n_keys", "n_leaks")
    )


# =========================================================================
# E4u (r10) — exact Spearman: is the quality score just measuring
# length? (the feature-redundancy check before thresholding on either)
# =========================================================================
@register(
    "q_quality_length_spearman",
    "WITH kd AS (SELECT doc_id, text, n_chars, " + TOKENS_SQL + " AS toks "
    "  FROM documents WHERE n_chars IS NOT NULL), "
    "ks AS (SELECT doc_id, n_chars, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio FROM kd), "
    "base AS (SELECT CAST(n_chars AS BIGINT) AS x, "
    + rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    + " AS y FROM ks), "
    "hx AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM base GROUP BY 1), "
    "rx AS (SELECT x, CAST(2 * coalesce(sum(m) OVER (ORDER BY x "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m + 1 "
    "  AS BIGINT) AS rx FROM hx), "
    "hy AS (SELECT y, CAST(count(*) AS BIGINT) AS m FROM base GROUP BY 1), "
    "ry AS (SELECT y, CAST(2 * coalesce(sum(m) OVER (ORDER BY y "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m + 1 "
    "  AS BIGINT) AS ry FROM hy), "
    "j AS (SELECT rx.rx, ry.ry FROM base "
    "  JOIN rx ON base.x = rx.x JOIN ry ON base.y = ry.y), "
    "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "  CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy, "
    "  CAST(sum(rx * ry) AS BIGINT) AS sxy, "
    "  CAST(sum(rx * rx) AS BIGINT) AS sxx, "
    "  CAST(sum(ry * ry) AS BIGINT) AS syy FROM j) "
    "SELECT n, "
    + rq_sql(
        "CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 "
        "AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN "
        "CAST(n * sxy - sx * sy AS DOUBLE) / "
        "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) "
        " * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END",
        6,
    )
    + " AS rho FROM s",
)
def q_quality_length_spearman(spark, sf_dir):
    """E4u (r10): exact Spearman ρ between document length and the
    composite quality score — the feature-redundancy audit (a quality
    gate that is secretly a length gate double-penalizes short-form
    sources). Tie-averaged ranks from each variable's VALUE HISTOGRAM
    (domain-bounded windows, the KS device), doubled to stay integer;
    ρ is Pearson on identical integer sums, one shared formula, rq6."""
    from mhw3d_detection_spark.operators.analysis import spearman_corr
    from mhw3d_detection_spark.operators.textops import text_stats
    from mhw3d_detection_spark.queries.base import rq as _rq

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    q = text_stats(docs).select(
        F.col("n_chars").cast("long").alias("x"),
        _rq(F.col("quality_score"), 4).alias("y"),
    )
    return spearman_corr(q, "x", "y")


# =========================================================================
# E4v (r10) — Cohen's kappa between the two quality gates: do the
# model gate (logit) and the rule gate (Gopher) agree beyond chance?
# (the filter-redundancy / filter-disagreement audit before stacking
# both in a funnel)
# =========================================================================
@register(
    "q_gate_agreement_kappa",
    "WITH d AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "s AS (SELECT doc_id, " + QFEATURES_SQL + " FROM d), "
    f"z AS (SELECT doc_id, CAST(CASE WHEN {QLOGIT_SQL()} >= 0 THEN 1 ELSE 0 END "
    "  AS INT) AS keep_lr FROM s), "
    "g AS (SELECT doc_id, CAST((len(toks) BETWEEN 10 AND 1000) "
    "  AND (coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "    / greatest(len(toks), 1) BETWEEN 2.0 AND 8.0) "
    "  AND len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) "
    "    / greatest(len(toks), 1) >= 0.8 "
    f"  AND len(list_intersect(toks, [{_GOPHER_STOP}])) >= 2 AS INT) "
    "  AS keep_go FROM d), "
    "j AS (SELECT z.keep_lr, g.keep_go FROM z JOIN g ON z.doc_id = g.doc_id), "
    "c AS (SELECT CAST(count(*) AS BIGINT) AS n, "
    "  CAST(sum(keep_lr * keep_go) AS BIGINT) AS a, "
    "  CAST(sum(keep_lr * (1 - keep_go)) AS BIGINT) AS b, "
    "  CAST(sum((1 - keep_lr) * keep_go) AS BIGINT) AS c2, "
    "  CAST(sum((1 - keep_lr) * (1 - keep_go)) AS BIGINT) AS d2 FROM j) "
    "SELECT n, a AS both_keep, b AS lr_only, c2 AS gopher_only, "
    "d2 AS both_drop, "
    "CAST(a + d2 AS DOUBLE) / n AS po, "
    "(CAST((a + b) AS DOUBLE) * (a + c2) + CAST((c2 + d2) AS DOUBLE) * (b + d2)) "
    "  / (CAST(n AS DOUBLE) * n) AS pe, "
    "CASE WHEN (CAST((a + b) AS DOUBLE) * (a + c2) "
    "  + CAST((c2 + d2) AS DOUBLE) * (b + d2)) / (CAST(n AS DOUBLE) * n) < 1.0 "
    "THEN (CAST(a + d2 AS DOUBLE) / n "
    "  - (CAST((a + b) AS DOUBLE) * (a + c2) + CAST((c2 + d2) AS DOUBLE) * (b + d2)) "
    "    / (CAST(n AS DOUBLE) * n)) "
    " / (1.0 - (CAST((a + b) AS DOUBLE) * (a + c2) "
    "    + CAST((c2 + d2) AS DOUBLE) * (b + d2)) / (CAST(n AS DOUBLE) * n)) "
    "END AS kappa FROM c",
)
def q_gate_agreement_kappa(spark, sf_dir):
    """E4v (r10): Cohen's kappa between the literal-weight logistic
    gate and the Gopher rule conjunction — chance-corrected agreement
    of two keep/drop raters over the same corpus (kappa ~ 1: the
    gates are redundant, drop one; kappa ~ 0: they measure different
    things and stack; negative: they systematically disagree —
    investigate before composing a funnel). The confusion cell counts
    are integers; po/pe/kappa are exactly-rounded divisions of
    identical integer bits, the SAME textual formula in both engines
    (RAW hash; kappa NULL when pe = 1, the all-rows-one-cell
    degenerate). One narrow projection per gate, one 4-cell
    aggregate."""
    from mhw3d_detection_spark.operators.textops import (
        gopher_rules,
        quality_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    lr = quality_scores(docs).select("doc_id", F.col("keep").alias("keep_lr"))
    go = gopher_rules(docs).select(
        "doc_id", F.col("pass_gopher").alias("keep_go")
    )
    j = lr.join(go, "doc_id")
    c = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("keep_lr") * F.col("keep_go")).cast("long").alias("a"),
        F.sum(F.col("keep_lr") * (1 - F.col("keep_go"))).cast("long").alias("b"),
        F.sum((1 - F.col("keep_lr")) * F.col("keep_go")).cast("long").alias("c2"),
        F.sum((1 - F.col("keep_lr")) * (1 - F.col("keep_go"))).cast("long").alias("d2"),
    )
    po = (F.col("a") + F.col("d2")).cast("double") / F.col("n")
    pe = (
        (F.col("a") + F.col("b")).cast("double") * (F.col("a") + F.col("c2"))
        + (F.col("c2") + F.col("d2")).cast("double") * (F.col("b") + F.col("d2"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return c.select(
        "n",
        F.col("a").alias("both_keep"),
        F.col("b").alias("lr_only"),
        F.col("c2").alias("gopher_only"),
        F.col("d2").alias("both_drop"),
        po.alias("po"),
        pe.alias("pe"),
        F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


# =========================================================================
# E6k (r10) — deterministic training manifest: the pipeline's LAST
# mile — every kept doc gets (split, shard, within-shard curriculum
# position) as a pure key function, so any worker can materialize its
# shard independently and byte-identically
# =========================================================================
_N_SHARDS = 8


@register(
    "q_training_manifest",
    "WITH kd AS (SELECT doc_id, text, " + TOKENS_SQL + " AS toks FROM documents), "
    "ks AS (SELECT doc_id, len(toks) AS n_tokens, "
    "  len(list_intersect(toks, ['the','and','of','to','in','is','a','for'])) AS n_stop, "
    "  (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) "
    "    / greatest(length(text), 1) AS punct_ratio FROM kd), "
    "kq AS (SELECT doc_id, "
    + rq_sql(
        "0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * (1.0 - punct_ratio) "
        "+ 0.2 * least(n_stop / 5.0, 1.0)",
        4,
    )
    + " AS quality FROM ks), "
    f"m AS (SELECT doc_id, quality, {SPLIT_CASE_SQL('doc_id')} AS split, "
    "  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 6))::BIGINT "
    f"  % {_N_SHARDS} AS shard_id FROM kq) "
    "SELECT doc_id, split, CAST(shard_id AS INT) AS shard_id, "
    "CAST(row_number() OVER (PARTITION BY split, shard_id "
    "  ORDER BY quality DESC, doc_id) AS INT) AS pos, quality FROM m",
)
def q_training_manifest(spark, sf_dir):
    """E6k (r10): the deterministic training manifest — split (shared
    md5-uniform key function), shard (an INDEPENDENT md5 segment of
    the same digest, chars 13-18, so shard and split assignments are
    decorrelated without a second hash pass), and within-shard
    curriculum position (rq4 quality desc, doc_id tie-break). Every
    column is a pure key/window function: re-running on a re-sharded
    corpus reproduces the manifest byte-identically, and any worker
    can build its own shard without coordination. Windows partition
    by (split, shard) — parallelism = 3 x n_shards, chosen at scale
    to be thousands."""
    from mhw3d_detection_spark.operators.textops import (
        split_assign,
        text_stats,
    )
    from mhw3d_detection_spark.queries.base import rq as _rq
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = text_stats(docs).select(
        "doc_id", _rq(F.col("quality_score"), 4).alias("quality")
    )
    sp = split_assign(q).select("doc_id", "quality", "split")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 13, 6), 16, 10
        ).cast("long")
        % _N_SHARDS
    )
    m = sp.withColumn("shard_id", shard.cast("int"))
    w = Window.partitionBy("split", "shard_id").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    return m.select(
        "doc_id",
        "split",
        "shard_id",
        F.row_number().over(w).cast("int").alias("pos"),
        "quality",
    )


# =========================================================================
# E7i (r10) — per-source KS drift: WHICH slice shifted — the on-call
# decomposition of E7e's global statistic
# =========================================================================
@register(
    "q_source_ks_drift",
    "WITH s AS (SELECT source AS g, n_chars AS x FROM documents "
    "  WHERE n_chars IS NOT NULL), "
    "h AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2), "
    "spine AS (SELECT DISTINCT x FROM h), "
    "groups AS (SELECT DISTINCT g FROM h), "
    "grid AS (SELECT g, x FROM groups, spine), "
    "filled AS (SELECT grid.g, grid.x, coalesce(h.c, 0) AS c FROM grid "
    "  LEFT JOIN h ON grid.g = h.g AND grid.x = h.x), "
    "cum AS (SELECT g, x, CAST(sum(c) OVER (PARTITION BY g ORDER BY x "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS a "
    "  FROM filled), "
    "gx AS (SELECT x, CAST(sum(c) AS BIGINT) AS ct FROM h GROUP BY 1), "
    "gcum AS (SELECT x, CAST(sum(ct) OVER (ORDER BY x "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at "
    "  FROM gx), "
    "tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_group FROM h GROUP BY 1), "
    "ntot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM h), "
    "j AS (SELECT cum.g, cum.x, tot.n_group, "
    "  ntot.n_all - tot.n_group AS n_rest, "
    "  CASE WHEN tot.n_group > 0 AND ntot.n_all - tot.n_group > 0 THEN "
    "    abs(CAST(cum.a AS DOUBLE) / tot.n_group "
    "      - CAST(gcum.at - cum.a AS DOUBLE) / (ntot.n_all - tot.n_group)) "
    "  END AS diff "
    "  FROM cum JOIN gcum ON cum.x = gcum.x JOIN tot ON cum.g = tot.g, ntot), "
    "r AS (SELECT g, x, n_group, n_rest, diff, row_number() OVER ("
    "  PARTITION BY g ORDER BY diff DESC NULLS LAST, x) AS rnk FROM j) "
    "SELECT g AS source, n_group, n_rest, diff AS ks_stat, x AS x_at_max "
    "FROM r WHERE rnk = 1",
)
def q_source_ks_drift(spark, sf_dir):
    """E7i (r10): per-source two-sample KS of doc length, each source
    vs the REST of the corpus — the slice-naming decomposition of
    q_ks_drift (global drift fired; which feed changed?). Every
    source's CDF is evaluated on the GLOBAL distinct-value spine (the
    sup lives at jump points of either side), cumulative windows
    partition by source over the bounded spine, integer counts +
    exactly-rounded divisions — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import ks_per_group

    docs = load_table(spark, sf_dir, "documents")
    return ks_per_group(
        docs.select("source", "n_chars"), "n_chars", "source"
    )


# =========================================================================
# E7j (r10) — two-proportion z on the event funnel: is cohort A's
# view->purchase conversion REALLY better than cohort B's (the A/B
# readout the event tables exist for)
# =========================================================================
@register(
    "q_funnel_ab_z",
    "WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS cohort, "
    "  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed, "
    "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased "
    "  FROM events WHERE user_id IS NOT NULL GROUP BY 1), "
    "c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users, "
    "  CAST(sum(CASE WHEN viewed = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view, "
    "  CAST(sum(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS n_conv FROM u GROUP BY 1), "
    "w AS (SELECT "
    "  max(CASE WHEN cohort = 0 THEN n_view END) AS n1, "
    "  max(CASE WHEN cohort = 0 THEN n_conv END) AS k1, "
    "  max(CASE WHEN cohort = 1 THEN n_view END) AS n2, "
    "  max(CASE WHEN cohort = 1 THEN n_conv END) AS k2 FROM c) "
    # n1/n2 can be 0 (a cohort with no viewers) or NULL (no users in
    # the cohort at all): every division is CASE-guarded in BOTH
    # engines — the bare form was an ANSI DIVIDE_BY_ZERO crash
    "SELECT n1, k1, n2, k2, "
    "CASE WHEN n1 > 0 THEN CAST(k1 AS DOUBLE) / n1 END AS p1, "
    "CASE WHEN n2 > 0 THEN CAST(k2 AS DOUBLE) / n2 END AS p2, "
    "CASE WHEN n1 > 0 AND n2 > 0 "
    "  AND CAST(k1 + k2 AS DOUBLE) / (n1 + n2) > 0 "
    "  AND CAST(k1 + k2 AS DOUBLE) / (n1 + n2) < 1 THEN "
    "  (CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) "
    "  / sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
    "    * (1.0 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) "
    "    * (1.0 / n1 + 1.0 / n2)) END AS z FROM w",
)
def q_funnel_ab_z(spark, sf_dir):
    """E7j (r10): pooled two-proportion z-statistic for the
    view->purchase conversion between the even/odd user cohorts — the
    A/B-test readout the W14ev funnel machinery feeds (a funnel
    DIFFERENCE means nothing without its sampling noise; |z| > 1.96
    is the call). Per-user flags are max() aggregates, the confusion
    counts integers, p1/p2/pooled-p/z exactly-rounded shared
    formulas — RAW hash; z NULL when the pooled rate is degenerate
    (0 or 1)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    u = ev.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "view").cast("int")
        ).alias("viewed"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("purchased"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("cohort"),
        "viewed",
        "purchased",
    )
    c = u.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("viewed") == 1).cast("int")).cast("long").alias(
            "n_view"
        ),
        F.sum(
            ((F.col("viewed") == 1) & (F.col("purchased") == 1)).cast("int")
        ).cast("long").alias("n_conv"),
    )
    w = c.groupBy().agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n_view"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 0, F.col("n_conv"))).alias("k1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_view"))).alias("n2"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_conv"))).alias("k2"),
    )
    p1 = F.when(
        F.col("n1") > 0, F.col("k1").cast("double") / F.col("n1")
    )
    p2 = F.when(
        F.col("n2") > 0, F.col("k2").cast("double") / F.col("n2")
    )
    pp = (F.col("k1") + F.col("k2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (pp > 0) & (pp < 1),
        (p1 - p2)
        / F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
        ),
    )
    return w.select(
        "n1", "k1", "n2", "k2",
        p1.alias("p1"), p2.alias("p2"), z.alias("z"),
    )


# =========================================================================
# E3r (r10) — SRP estimator calibration: measured mean cosine per
# Hamming bucket vs the cos(pi*h/n) theory curve (the E2g
# minhash-calibration pattern for the hyperplane family)
# =========================================================================
def _SRP_CAL_SQL() -> str:
    import math

    srp = _SRP_SQL()
    prefix = (
        srp[: srp.index("blk AS (SELECT")]
        .replace("WITH e AS (", "WITH eb AS (", 1)
        .replace("AS sig FROM e)", "AS sig FROM eb)", 1)
    )
    est = "CASE " + " ".join(
        f"WHEN hamming = {h} THEN {_dlit(math.cos(math.pi * h / 16))}"
        for h in range(17)
    ) + " END"
    return (
        prefix
        + "p AS (SELECT s.vec_id, s.sig, eb.v FROM s JOIN eb USING (vec_id) "
        "  WHERE s.vec_id % 25 = 0), "
        "pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        "  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming, "
        + _dq_sql("list_cosine_similarity(a.v, b.v)", 20)
        + " AS cq FROM p a JOIN p b ON a.vec_id < b.vec_id) "
        "SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs, "
        + rq_sql("sum(cq) / count(*)", 4)
        + " AS mean_cosine, "
        f"CAST({est} AS DOUBLE) AS est_cos "
        "FROM pairs GROUP BY 1"
    )


@register("q_srp_calibration", _SRP_CAL_SQL())
def q_srp_calibration(spark, sf_dir):
    """E3r (r10): SRP estimator calibration over the vec_id%25 audit
    panel — all panel pairs bucketed by fingerprint Hamming distance,
    measured mean TRUE cosine per bucket next to the theory curve
    cos(pi*h/16) (shared literals). The E2g device (MinHash Jaccard
    calibration) for the hyperplane family: a drifting gap between
    columns means the corpus violates the isotropy the estimator
    assumes (anisotropic embeddings want more bits or a rotation).
    Cosines dyadic-quantized (2^-20) before the bucket mean so the
    sums are order-free; panel-bounded all-pairs by construction."""
    import math

    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.operators.similarity import (
        dot,
        norm,
        srp_signatures,
    )
    from mhw3d_detection_spark.queries.base import rq as _rq

    emb = load_table(spark, sf_dir, "embeddings")
    panel = emb.filter(F.col("vec_id") % 25 == 0)
    sig = srp_signatures(panel)
    base = panel.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).join(sig, "vec_id")
    a = base.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"),
        F.col("srp_sig").alias("sa"),
    )
    b = base.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
        F.col("srp_sig").alias("sb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ia") < F.col("ib"))
    cos = dot(F.col("va"), F.col("vb")) / (
        norm(F.col("va")) * norm(F.col("vb"))
    )
    est = None
    for h in range(16, -1, -1):
        v = F.lit(float(math.cos(math.pi * h / 16)))
        est = v if est is None else F.when(
            F.col("hamming") == h, v
        ).otherwise(est)
    scored = pairs.select(
        F.expr("cast(bit_count(sa ^ sb) as int)").alias("hamming"),
        dyadic_quantize(cos, 20).alias("cq"),
    )
    return scored.groupBy("hamming").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        _rq(F.sum("cq") / F.count(F.lit(1)), 4).alias("mean_cosine"),
    ).withColumn("est_cos", est)


# =========================================================================
# E7k (r10) — Benjamini-Hochberg FDR over the per-source KS drifts:
# with 20+ sources, 1-in-20 "significant" drifts are expected by
# chance — the alerting layer needs multiple-testing control or it
# pages on noise every night (BH 1995)
# =========================================================================
_FDR_ALPHA = 0.05


def _KS_FDR_SQL() -> str:
    from mhw3d_detection_spark.queries.base import REGISTRY

    ks = REGISTRY["q_source_ks_drift"].sql
    return (
        f"WITH base AS ({ks}), "
        "e AS (SELECT source, ks_stat, "
        "  -2.0 * (CAST(n_group AS DOUBLE) * n_rest / (n_group + n_rest)) "
        "    * ks_stat * ks_stat AS lx FROM base WHERE ks_stat IS NOT NULL), "
        "r AS (SELECT source, ks_stat, lx, CAST(row_number() OVER ("
        "  ORDER BY lx, source) AS INT) AS rank, "
        "  CAST(count(*) OVER () AS BIGINT) AS m FROM e), "
        "c AS (SELECT source, ks_stat, lx, rank, m, "
        f"  CASE WHEN lx <= ln(rank * {_FDR_ALPHA!r} / (2.0 * m)) "
        "    THEN rank ELSE 0 END AS ok_rank FROM r), "
        "mx AS (SELECT max(ok_rank) AS kmax FROM c) "
        "SELECT c.source, c.ks_stat, "
        + rq_sql("least(1.0, 2.0 * exp(c.lx))", 4)
        + " AS p_value, c.rank, "
        "CAST(CASE WHEN c.rank <= mx.kmax THEN 1 ELSE 0 END AS INT) "
        "  AS significant FROM c, mx"
    )


@register("q_source_ks_fdr", _KS_FDR_SQL())
def q_source_ks_fdr(spark, sf_dir):
    """E7k (r10): Benjamini-Hochberg step-up over the per-source KS
    drift statistics — p ≈ 2·exp(−2·n_eff·D²) (the one-term KS tail,
    n_eff = n_g·n_r/(n_g+n_r)); sources ranked by p ascending,
    significant through the largest k with p_(k) ≤ k·α/m (α=0.05).
    The DECISION compares in the LOG domain (lx ≤ ln(k·α/2m)) — both
    sides are one transcendental of identical exactly-rounded
    rationals, and p itself is display-only rq4 (the repo ln/exp
    contract); ranks/flags integer. Windows are sources-bounded."""
    import math  # noqa: F401

    from mhw3d_detection_spark.operators.analysis import ks_per_group
    from mhw3d_detection_spark.queries.base import rq as _rq
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = ks_per_group(
        docs.select("source", "n_chars"), "n_chars", "source"
    ).filter(F.col("ks_stat").isNotNull())
    n_eff = (
        F.col("n_group").cast("double") * F.col("n_rest")
        / (F.col("n_group") + F.col("n_rest"))
    )
    e = base.select(
        "source",
        "ks_stat",
        (F.lit(-2.0) * n_eff * F.col("ks_stat") * F.col("ks_stat")).alias(
            "lx"
        ),
    )
    w = Window.orderBy("lx", "source")
    r = e.select(
        "source",
        "ks_stat",
        "lx",
        F.row_number().over(w).cast("int").alias("rank"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).cast("long").alias("m"),
    )
    ok = F.when(
        F.col("lx")
        <= F.log(F.col("rank") * F.lit(_FDR_ALPHA) / (2.0 * F.col("m"))),
        F.col("rank"),
    ).otherwise(F.lit(0))
    c = r.withColumn("ok_rank", ok)
    kmax = c.agg(F.max("ok_rank").alias("kmax"))
    return c.crossJoin(F.broadcast(kmax)).select(
        "source",
        "ks_stat",
        _rq(
            F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.col("lx"))), 4
        ).alias("p_value"),
        "rank",
        (F.col("rank") <= F.col("kmax")).cast("int").alias("significant"),
    )


# =========================================================================
# E7l (r10) — chi-squared independence + Cramér's V: are two slicing
# dimensions of the corpus actually related (source x language here) —
# the categorical companion to the numeric drift family
# =========================================================================
@register(
    "q_chi2_independence",
    "WITH obs AS (SELECT source AS a, lang AS b, "
    "  CAST(count(*) AS BIGINT) AS c FROM documents "
    "  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2), "
    "ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM obs GROUP BY 1), "
    "mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM obs GROUP BY 1), "
    "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM obs), "
    "grid AS (SELECT ma.a, ma.ra, mb.b, mb.cb FROM ma, mb), "
    "filled AS (SELECT g.a, g.b, g.ra, g.cb, coalesce(o.c, 0) AS o "
    "  FROM grid g LEFT JOIN obs o ON g.a = o.a AND g.b = o.b), "
    "cells AS (SELECT tot.n, "
    + _dq_sql(
        "(o - CAST(ra AS DOUBLE) * cb / n) * (o - CAST(ra AS DOUBLE) "
        "* cb / n) / (CAST(ra AS DOUBLE) * cb / n)",
        20,
    )
    + " AS t FROM filled, tot), "
    "agg AS (SELECT n, sum(t) AS chi2 FROM cells GROUP BY 1), "
    "ka AS (SELECT CAST(count(*) AS INT) AS a_levels FROM ma), "
    "kb AS (SELECT CAST(count(*) AS INT) AS b_levels FROM mb) "
    "SELECT n, a_levels, b_levels, "
    "CAST((a_levels - 1) * (b_levels - 1) AS INT) AS dof, chi2, "
    "CASE WHEN n > 0 AND least(a_levels - 1, b_levels - 1) > 0 THEN "
    "  sqrt(chi2 / (CAST(n AS DOUBLE) * least(a_levels - 1, "
    "  b_levels - 1))) END AS cramers_v "
    "FROM agg, ka, kb",
)
def q_chi2_independence(spark, sf_dir):
    """E7l (r10): Pearson chi-squared independence test of source x
    language, with Cramér's V effect size — "is the language mix a
    property of the feed?" (if yes, language filtering reshapes the
    source mixture and the E6c weights must be set jointly). ONE
    corpus aggregate to the dense levels x levels contingency grid
    (observed-zero cells still carry expected mass); integer counts,
    exactly-rounded expected values, chi-2 terms dyadic-quantized
    (2^-20) so the cell sum is order-free; sqrt is IEEE-exact — RAW
    hash."""
    from mhw3d_detection_spark.operators.analysis import chi2_independence

    docs = load_table(spark, sf_dir, "documents")
    return chi2_independence(docs.select("source", "lang"), "source", "lang")


# =========================================================================
# E7m (r10) — one-way ANOVA of doc length across sources: mean-level
# differences with their sampling noise (the mean companion to E7i's
# per-source KS distribution decomposition)
# =========================================================================
@register(
    "q_anova_length",
    "WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS ng, "
    "  CAST(sum(n_chars) AS BIGINT) AS sg, "
    "  CAST(sum(n_chars * n_chars) AS BIGINT) AS qg FROM documents "
    "  WHERE n_chars IS NOT NULL GROUP BY 1), "
    "tot AS (SELECT CAST(count(*) AS INT) AS k, "
    "  CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s FROM g), "
    "j AS (SELECT tot.k, tot.n, "
    + _dq_sql(
        "CAST(ng AS DOUBLE) * (CAST(sg AS DOUBLE) / ng - "
        "CAST(s AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / ng - "
        "CAST(s AS DOUBLE) / n)",
        10,
    )
    + " AS bt, "
    + _dq_sql("CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / ng", 10)
    + " AS wt FROM g, tot), "
    "agg AS (SELECT k, n, sum(bt) AS ss_between, sum(wt) AS ss_within "
    "  FROM j GROUP BY 1, 2) "
    "SELECT k AS k_groups, n, ss_between, ss_within, "
    "CASE WHEN k > 1 AND n > k AND ss_within > 0 THEN "
    "  (ss_between / (k - 1)) / (ss_within / (n - k)) END AS f_stat "
    "FROM agg",
)
def q_anova_length(spark, sf_dir):
    """E7m (r10): one-way ANOVA F of doc length across sources — do the
    feeds differ in MEAN length beyond noise (E7i's KS names the
    distribution-level drifter; F is the mean-level screen that feeds
    the E6c mixture design). Integer-valued column contract: per-group
    sum / sum-of-squares are int64-exact, SS terms dyadic-quantized
    (2^-10) before the groups-sized sums — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import anova_oneway

    docs = load_table(spark, sf_dir, "documents")
    return anova_oneway(docs.select("source", "n_chars"), "n_chars", "source")


# =========================================================================
# E7n (r10) — exact Kendall tau-b between length band and stopword
# ratio: the concordance companion to E7h's Spearman (same
# histogram-first design — the corpus never enters a pair join)
# =========================================================================
@register(
    "q_kendall_tau",
    "WITH toks0 AS (SELECT doc_id, n_chars, " + TOKENS_SQL + " AS toks "
    "  FROM documents), "
    "v0 AS (SELECT n_chars // 20 AS x, "
    "  CAST(floor(len(list_intersect(toks, "
    "  ['the','and','of','to','in','is','a','for'])) "
    "  / greatest(len(toks), 1) * 100.0) AS BIGINT) AS y "
    "  FROM toks0 WHERE n_chars IS NOT NULL), "
    # NULL text -> NULL toks -> NULL y: the operator's isNotNull
    # filter must be mirrored or a single NULL-text row desyncs the
    # grid (code-review r10w2 #5)
    "v AS (SELECT x, y FROM v0 WHERE y IS NOT NULL), "
    "h AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM v "
    "  GROUP BY 1, 2), "
    "xs AS (SELECT x, row_number() OVER (ORDER BY x) - 1 AS xi "
    "  FROM (SELECT DISTINCT x FROM h)), "
    "ys AS (SELECT y, row_number() OVER (ORDER BY y) - 1 AS yi "
    "  FROM (SELECT DISTINCT y FROM h)), "
    "grid AS (SELECT xs.x, xs.xi, ys.y, ys.yi FROM xs, ys), "
    "filled AS (SELECT g.xi, g.yi, CAST(coalesce(h.c, 0) AS BIGINT) AS c "
    "  FROM grid g LEFT JOIN h ON g.x = h.x AND g.y = h.y), "
    "cy AS (SELECT xi, yi, c, CAST(sum(c) OVER (PARTITION BY xi "
    "  ORDER BY yi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  AS BIGINT) AS cy FROM filled), "
    "ff AS (SELECT xi, yi, c, CAST(sum(cy) OVER (PARTITION BY yi "
    "  ORDER BY xi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  AS BIGINT) AS f FROM cy), "
    "fy AS (SELECT xi, yi, c, f, coalesce(lag(f) OVER (PARTITION BY xi "
    "  ORDER BY yi), 0) AS f_ym1 FROM ff), "
    "fx AS (SELECT xi, yi, c, coalesce(lag(f_ym1) OVER (PARTITION BY yi "
    "  ORDER BY xi), 0) AS p_lt, coalesce(lag(f) OVER (PARTITION BY yi "
    "  ORDER BY xi), 0) AS f_xm1 FROM fy), "
    "nx AS (SELECT xi, CAST(sum(c) AS BIGINT) AS tx FROM filled "
    "  GROUP BY 1), "
    "nxc AS (SELECT xi, tx, CAST(coalesce(sum(tx) OVER (ORDER BY xi "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
    "  AS n_ltx FROM nx), "
    "cd AS (SELECT CAST(sum(fx.c * fx.p_lt) AS BIGINT) AS concordant, "
    "  CAST(sum(fx.c * (nxc.n_ltx - fx.f_xm1)) AS BIGINT) AS discordant "
    "  FROM fx JOIN nxc ON fx.xi = nxc.xi), "
    "ny AS (SELECT yi, CAST(sum(c) AS BIGINT) AS ty FROM filled "
    "  GROUP BY 1), "
    "t1 AS (SELECT CAST(sum(tx) AS BIGINT) AS n, "
    "  CAST(sum(tx * (tx - 1)) AS BIGINT) AS tx2 FROM nxc), "
    "t2 AS (SELECT CAST(sum(ty * (ty - 1)) AS BIGINT) AS ty2 FROM ny) "
    "SELECT t1.n, CAST(t1.n * (t1.n - 1) // 2 AS BIGINT) AS n_pairs, "
    "cd.concordant, cd.discordant, "
    "CASE WHEN CAST(t1.n * (t1.n - 1) // 2 - t1.tx2 // 2 AS DOUBLE) > 0 "
    "  AND CAST(t1.n * (t1.n - 1) // 2 - t2.ty2 // 2 AS DOUBLE) > 0 THEN "
    "  (cd.concordant - cd.discordant) "
    "  / sqrt(CAST(t1.n * (t1.n - 1) // 2 - t1.tx2 // 2 AS DOUBLE) "
    "  * CAST(t1.n * (t1.n - 1) // 2 - t2.ty2 // 2 AS DOUBLE)) END AS tau_b "
    "FROM cd, t1, t2",
)
def q_kendall_tau(spark, sf_dir):
    """E7n (r10): exact tie-corrected Kendall tau-b between doc-length
    band (n_chars DIV 20) and stopword-ratio percent — the concordance
    companion to q_quality_length_spearman's rank correlation, from
    the SAME histogram-first design: one (x, y) corpus aggregate, then
    concordant/discordant pair counts as integer 2-D prefix sums over
    the dense bounded joint grid (two chained domain windows + dense
    lags — never an O(n²) pair join). tau-b's one sqrt is IEEE-exact
    over integers — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import kendall_tau_b
    from mhw3d_detection_spark.operators.textops import (
        LANG_STOPWORDS,
        tokens_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    ratio = F.size(F.array_intersect(toks, stop)) / F.greatest(
        F.size(toks), F.lit(1)
    )
    v = docs.filter(F.col("n_chars").isNotNull()).select(
        F.expr("div(n_chars, 20)").alias("x"),
        F.floor(ratio * F.lit(100.0)).cast("long").alias("y"),
    )
    return kendall_tau_b(v, "x", "y")


# =========================================================================
# E3s (r10) — centroid silhouette per cluster label: the clustering-
# quality audit for the IVF/k-means family (is the coarse quantizer's
# partition actually separating the space?)
# =========================================================================
@register(
    "q_silhouette",
    "WITH cent AS (SELECT label AS cl, CAST(i - 1 AS INT) AS dim_idx, "
    + _dq_sql("avg(CAST(embedding[i] AS DOUBLE))", 20)
    + " AS cq FROM "
    "  (SELECT label, embedding, "
    "   unnest(generate_series(1, len(embedding))) AS i FROM embeddings) "
    "  GROUP BY 1, 2), "
    "ex AS (SELECT vec_id AS vid, label AS own, CAST(i - 1 AS INT) "
    "  AS dim_idx, CAST(embedding[i] AS DOUBLE) AS v FROM "
    "  (SELECT vec_id, label, embedding, "
    "   unnest(generate_series(1, len(embedding))) AS i FROM embeddings)), "
    "parts AS (SELECT ex.vid, ex.own, cent.cl, "
    + _dq_sql("(ex.v - cent.cq) * (ex.v - cent.cq)", 20)
    + " AS d2t FROM ex JOIN cent ON ex.dim_idx = cent.dim_idx), "
    "d2 AS (SELECT vid, own, cl, sum(d2t) AS d2 FROM parts "
    "  GROUP BY 1, 2, 3), "
    "pv AS (SELECT vid, own, "
    "  max(CASE WHEN cl = own THEN sqrt(d2) END) AS a, "
    "  min(CASE WHEN cl <> own THEN sqrt(d2) END) AS b FROM d2 "
    "  GROUP BY 1, 2), "
    "sc AS (SELECT own, "
    + _dq_sql(
        "CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) "
        "ELSE 0.0 END",
        20,
    )
    + " AS sq FROM pv WHERE a IS NOT NULL AND b IS NOT NULL) "
    "SELECT own AS label, CAST(count(*) AS BIGINT) AS n_vecs, "
    "avg(sq) AS mean_silhouette, "
    "CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_negative "
    "FROM sc GROUP BY 1",
)
def q_silhouette(spark, sf_dir):
    """E3s (r10): simplified (centroid-based) silhouette per label —
    the O(n·k·d) clustering-quality audit for the IVF coarse quantizer
    (full pairwise silhouette is O(n²) and never runs at corpus
    scale): a = distance to own centroid, b = nearest FOREIGN
    centroid, s = (b-a)/max(a,b); n_negative counts vectors on the
    wrong side (mislabeled / boundary mass — IVF multiprobe exists
    because of exactly these). ONE (label, dim) aggregate + a
    broadcast centroid join + one (vec, label) reduce; centroid
    components, per-dim gaps and per-vector s all dyadic-quantized
    (2^-20) so every cross-engine sum is order-free; sqrt IEEE-exact.
    mean_silhouette is an exact division of a dyadic sum — RAW
    hash."""
    from mhw3d_detection_spark.operators.similarity import (
        silhouette_by_label,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return silhouette_by_label(emb)


# =========================================================================
# E3t (r10) — embedding norm audit per label: the 30-second degenerate-
# vector check before any cosine machinery
# =========================================================================
@register(
    "q_embed_norm_audit",
    "WITH per AS (SELECT label, "
    + _dq_sql(
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> x * x)))",
        20,
    )
    + " AS nq FROM embeddings) "
    "SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, "
    "avg(nq) AS mean_norm, min(nq) AS min_norm, max(nq) AS max_norm, "
    "CAST(sum(CASE WHEN nq < 1e-6 THEN 1 ELSE 0 END) AS BIGINT) "
    "  AS n_near_zero "
    "FROM per GROUP BY 1",
)
def q_embed_norm_audit(spark, sf_dir):
    """E3t (r10): per-label L2-norm distribution audit — un-normalized
    or near-zero vectors break every cosine downstream, and a label
    whose norm band differs from the rest means an encoder-version
    leak. Pure narrow row-local fold (no shuffle until the labels-
    sized aggregate); norms dyadic-quantized (2^-20) so the per-label
    mean is order-free — RAW hash."""
    from mhw3d_detection_spark.operators.similarity import (
        embedding_norm_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_norm_stats(emb)


# =========================================================================
# E4x (r10) — language-ID confusion matrix: predicted vs labeled lang
# — the classifier-eval readout the E4 langid row feeds (precision of
# the router that decides which docs enter which monolingual corpus)
# =========================================================================
def _LANG_CONF_SQL() -> str:
    from mhw3d_detection_spark.queries.base import REGISTRY

    lid = REGISTRY["q_text_langid"].sql
    return (
        f"WITH pred AS ({lid}), "
        "j AS (SELECT d.lang, p.lang_pred FROM documents d "
        "  JOIN pred p ON d.doc_id = p.doc_id), "
        "c AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n "
        "  FROM j GROUP BY 1, 2), "
        "t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM c "
        "  GROUP BY 1) "
        "SELECT c.lang, c.lang_pred, c.n, "
        "CAST(c.n AS DOUBLE) / t.n_true AS recall_frac "
        "FROM c JOIN t ON c.lang = t.lang"
    )


@register("q_lang_confusion", _LANG_CONF_SQL())
def q_lang_confusion(spark, sf_dir):
    """E4x (r10): confusion matrix of the stopword-vote language ID
    against the labeled lang column — per (true, predicted) cell count
    and within-true-class recall fraction. The eval readout for the
    corpus router: zh has no wordlist, so its mass landing on 'und'
    (not on en/de/fr/es) is the designed behavior this row makes
    visible. Doc-keyed equi-join of the langid projection back to the
    labels, langs²-bounded output; fractions are exactly-rounded
    integer rationals — RAW hash. Docs with zero tokens drop out of
    the vote in BOTH engines (the langid row's documented contract)."""
    from mhw3d_detection_spark.operators.textops import language_id

    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    j = docs.select("doc_id", "lang").join(pred, "doc_id")
    c = j.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("lang").agg(F.sum("n").cast("long").alias("n_true"))
    return c.join(F.broadcast(t), "lang").select(
        "lang",
        "lang_pred",
        "n",
        (F.col("n").cast("double") / F.col("n_true")).alias("recall_frac"),
    )


# =========================================================================
# E7p (r10) — composed drift report: ONE corpus histogram feeds KS +
# W1 + banded PSI (the monitoring trio fired on every snapshot; the
# standalone rows re-scan the corpus per statistic)
# =========================================================================
def _DRIFT_REPORT_SQL() -> str:
    d30 = _dq_sql("diff", 30)
    pn = "(bn + 1.0) / (t.n_new + nb.nb)"
    po = "(bo + 1.0) / (t.n_old + nb.nb)"
    return (
        "WITH s AS (SELECT n_chars AS x, "
        "  CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END AS io "
        "  FROM documents WHERE n_chars IS NOT NULL), "
        "g AS (SELECT x, CAST(sum(io) AS BIGINT) AS c_old, "
        "  CAST(count(*) - sum(io) AS BIGINT) AS c_new FROM s GROUP BY 1), "
        "t AS (SELECT CAST(coalesce(sum(c_old), 0) AS BIGINT) AS n_old, "
        "  CAST(coalesce(sum(c_new), 0) AS BIGINT) AS n_new FROM g), "
        "cum AS (SELECT x, CAST(sum(c_old) OVER (ORDER BY x "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "    AS a, "
        "  CAST(sum(c_new) OVER (ORDER BY x "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "    AS b, "
        "  CAST(lead(x) OVER (ORDER BY x) - x AS DOUBLE) AS gap FROM g), "
        "d AS (SELECT cum.x, cum.gap, t.n_old, t.n_new, "
        "  CASE WHEN t.n_old > 0 AND t.n_new > 0 THEN "
        "    abs(cum.a / t.n_old - cum.b / t.n_new) END AS diff "
        "  FROM cum, t), "
        "ksr AS (SELECT diff AS stat, CAST(x AS BIGINT) AS x_at, "
        "  row_number() OVER (ORDER BY diff DESC NULLS LAST, x) "
        "  AS rnk FROM d), "
        "best AS (SELECT stat, x_at FROM ksr WHERE rnk = 1), "
        # totals-anchored LEFT JOIN: the ks row survives an EMPTY
        # histogram (NULL stat, counts visible) — mirror of the Spark
        # plan's empty-input rule
        "ks AS (SELECT 'ks' AS metric, best.stat, best.x_at, "
        "  t.n_old, t.n_new FROM t LEFT JOIN best ON TRUE), "
        "w1t AS (SELECT sum(CASE WHEN n_old > 0 AND n_new > 0 THEN "
        f"  {d30} * gap END) AS w1 FROM d WHERE gap IS NOT NULL), "
        "w1 AS (SELECT 'w1' AS metric, CASE WHEN t.n_old > 0 "
        "  AND t.n_new > 0 THEN coalesce(w1t.w1, 0.0) END AS stat, "
        "  CAST(NULL AS BIGINT) AS x_at, t.n_old, t.n_new FROM t, w1t), "
        "bands AS (SELECT x // 50 AS band, CAST(sum(c_old) AS BIGINT) "
        "  AS bo, CAST(sum(c_new) AS BIGINT) AS bn FROM g GROUP BY 1), "
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bands), "
        "pt AS (SELECT "
        "  CASE WHEN t.n_old > 0 AND t.n_new > 0 THEN "
        + _dq_sql(f"(({pn}) - ({po})) * ln(({pn}) / ({po}))", 20)
        + " END AS tt FROM bands, t, nb), "
        "pts AS (SELECT sum(tt) AS psi FROM pt), "
        "psi AS (SELECT 'psi' AS metric, CASE WHEN t.n_old > 0 "
        "  AND t.n_new > 0 THEN pts.psi END AS stat, "
        "  CAST(NULL AS BIGINT) AS x_at, t.n_old, t.n_new "
        "  FROM t, pts) "
        "SELECT * FROM ks UNION ALL SELECT * FROM w1 "
        "UNION ALL SELECT * FROM psi"
    )


@register("q_drift_report", _DRIFT_REPORT_SQL())
def q_drift_report(spark, sf_dir):
    """E7p (r10): the composed drift report — exact KS sup-norm (with
    argmax), exact Wasserstein-1, and banded Laplace-smoothed PSI of
    the doc-length distribution (new snapshot vs existing corpus),
    all from ONE localCheckpointed distinct-value histogram. The
    standalone rows (q_ks_drift / q_wasserstein_drift / the PSI
    family) each pay their own corpus scan; a snapshot monitor fires
    all three tests every night and wants the corpus touched once
    (the plans.corpus_report economics, applied to monitoring). KS
    diffs RAW-exact rationals, W1 terms dyadic 2^-30, PSI terms
    dyadic 2^-20 (absorbing the one ln ulp) — RAW hash. The ks/w1
    rows equal the standalone q_ks_drift / q_wasserstein_drift values
    by construction (pinned in pytest)."""
    from mhw3d_detection_spark.plans.drift_report import drift_report

    docs = load_table(spark, sf_dir, "documents")
    return drift_report(
        docs.select("doc_id", "n_chars"),
        "n_chars",
        F.col("doc_id") % 5 != 4,
        psi_band=50,
    )


# =========================================================================
# E4y (r10) — per-token local clustering coefficient: the degree-
# normalized closure completing the graph family (E4g's raw triangle
# counts reward hubs; cc says how cliquish the NEIGHBORHOOD is)
# =========================================================================
@register(
    "q_token_clustering",
    "WITH d AS (SELECT doc_id, " + TOKENS_SQL + " AS toks FROM documents), "
    "tokp AS (SELECT doc_id, i AS pos, toks[i] AS token FROM "
    "  (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM d)), "
    "pairs AS (SELECT p.token AS a, r.token AS b FROM tokp p "
    "  CROSS JOIN (SELECT unnest([1, 2]) AS o) o "
    "  JOIN tokp r ON r.doc_id = p.doc_id AND r.pos = p.pos + o.o), "
    "c AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2), "
    "e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v "
    "  FROM c WHERE c_ab >= 5 AND a <> b), "
    "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
    "  FROM e e1 JOIN e e2 ON e1.v = e2.u "
    "  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
    "corners AS (SELECT a AS token FROM tri UNION ALL "
    "  SELECT b AS token FROM tri UNION ALL SELECT c AS token FROM tri), "
    "tcnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_triangles "
    "  FROM corners GROUP BY 1), "
    "ends AS (SELECT u AS token FROM e UNION ALL SELECT v AS token FROM e), "
    "deg AS (SELECT token, CAST(count(*) AS BIGINT) AS degree "
    "  FROM ends GROUP BY 1) "
    "SELECT deg.token, deg.degree, "
    "CAST(coalesce(tcnt.n_triangles, 0) AS BIGINT) AS n_triangles, "
    "CASE WHEN deg.degree > 1 THEN "
    "  2.0 * coalesce(tcnt.n_triangles, 0) "
    "  / (deg.degree * (deg.degree - 1)) END AS clustering_coeff "
    "FROM deg LEFT JOIN tcnt ON deg.token = tcnt.token",
)
def q_token_clustering(spark, sf_dir):
    """E4y (r10): per-token local clustering coefficient
    cc = 2·triangles/(deg·(deg−1)) over the windowed co-occurrence
    graph — E4g's triangle counts normalized by the wedge count, the
    collocation-community signal a hub's raw count conflates with
    frequency. Same pruned low->high edge list (localCheckpointed — it
    feeds the wedge joins AND the degree count), one endpoint union
    for degrees; all-integer until one exactly-rounded division;
    degree<2 tokens report NULL (no wedge to close) — RAW hash."""
    from mhw3d_detection_spark.operators.textops import token_clustering

    docs = load_table(spark, sf_dir, "documents")
    return token_clustering(docs, window=2, min_count=5)


# =========================================================================
# E4w (r10) — Flesch readability proxy: the readability axis of
# quality scoring (formatting features say how a page LOOKS, this
# says how it reads)
# =========================================================================
@register(
    "q_readability",
    "SELECT doc_id, "
    "CAST(len(" + TOKENS_SQL + ") AS INT) AS n_words, "
    "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT) "
    "  AS n_sentences, "
    "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT) "
    "  AS n_syllables, "
    f"{_dlit(206.835)} - {_dlit(1.015)} "
    "* (CAST(len(" + TOKENS_SQL + ") AS DOUBLE) "
    "  / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)) "
    f"- {_dlit(84.6)} "
    "* (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) "
    "  / greatest(len(" + TOKENS_SQL + "), 1)) AS flesch "
    "FROM documents",
)
def q_readability(spark, sf_dir):
    """E4w (r10): deterministic Flesch-reading-ease proxy — words =
    tokens, sentences = [.!?]+ runs (min 1), syllables = vowel groups
    (the standard cheap estimate; a hyphenation dictionary is an
    offline swap). Prose lands ~50-80; keyword-stuffed spam and
    boilerplate listings fall far outside the band — the readability
    axis the quality classifier's formatting features miss. Pure
    narrow projection, zero shuffles at any corpus size; plain IEEE
    arithmetic on integer counts with shared double literals — RAW
    hash."""
    from mhw3d_detection_spark.operators.textops import flesch_proxy

    docs = load_table(spark, sf_dir, "documents")
    return flesch_proxy(docs)


# =========================================================================
# E3u (r10) — centroid distance matrix: which label pairs are
# confusable — the pairwise companion to E3s's per-label silhouette
# =========================================================================
@register(
    "q_centroid_distances",
    "WITH cent AS (SELECT label, CAST(i - 1 AS INT) AS dim_idx, "
    + _dq_sql("avg(CAST(embedding[i] AS DOUBLE))", 20)
    + " AS cq FROM "
    "  (SELECT label, embedding, "
    "   unnest(generate_series(1, len(embedding))) AS i FROM embeddings) "
    "  GROUP BY 1, 2), "
    "p AS (SELECT a.label AS label_a, b.label AS label_b, "
    + _dq_sql("(a.cq - b.cq) * (a.cq - b.cq)", 20)
    + " AS d2t FROM cent a JOIN cent b ON a.dim_idx = b.dim_idx "
    "  AND a.label < b.label) "
    "SELECT label_a, label_b, sqrt(sum(d2t)) AS distance "
    "FROM p GROUP BY 1, 2",
)
def q_centroid_distances(spark, sf_dir):
    """E3u (r10): Euclidean distance between every label-centroid pair
    — the confusability map E3s's silhouette summarizes away (which
    SPECIFIC clusters sit close: those pairs drive the negative-
    silhouette mass, and an IVF probe list should cover both). One
    (label, dim) aggregate, then a labels²·dims-bounded self-join —
    the corpus is touched once; centroid components and squared gaps
    dyadic-quantized (2^-20), sqrt IEEE-exact — RAW hash."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(emb).select(
        "label", "dim_idx", dyadic_quantize("mean_val", 20).alias("cq")
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim_idx",
        F.col("cq").alias("ca"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim_idx",
        F.col("cq").alias("cb"),
    )
    p = a.join(
        b, ["dim_idx"]
    ).filter(F.col("label_a") < F.col("label_b")).select(
        "label_a",
        "label_b",
        dyadic_quantize(
            (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")), 20
        ).alias("d2t"),
    )
    return p.groupBy("label_a", "label_b").agg(
        F.sqrt(F.sum("d2t")).alias("distance")
    )


# =========================================================================
# E2p (r10) — sentence-level exact dedup audit: the line/paragraph
# granularity whole-doc dedup cannot see (CCNet dedups at paragraph
# level for exactly this reason)
# =========================================================================
_SENT_MIN_CHARS = 20
_SENT_DUP_DF = 3


@register(
    "q_dedup_sentences",
    "WITH sp AS (SELECT doc_id, string_split_regex(text, '[.!?]+') AS a "
    "  FROM documents), "
    "s0 AS (SELECT doc_id, trim(a[i]) AS s FROM "
    "  (SELECT doc_id, a, unnest(generate_series(1, len(a))) AS i FROM sp)), "
    f"s AS (SELECT doc_id, s FROM s0 WHERE length(s) >= {_SENT_MIN_CHARS}), "
    "h AS (SELECT doc_id, md5(s) AS hs FROM s), "
    "dfreq AS (SELECT hs, CAST(count(*) AS BIGINT) AS occ FROM h "
    "  GROUP BY 1), "
    "j AS (SELECT h.doc_id, "
    f"  CASE WHEN dfreq.occ >= {_SENT_DUP_DF} THEN 1 ELSE 0 END AS dup "
    "  FROM h JOIN dfreq ON h.hs = dfreq.hs) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents, "
    "CAST(sum(dup) AS BIGINT) AS n_dup_sents, "
    "CAST(sum(dup) AS DOUBLE) / count(*) AS dup_frac "
    "FROM j GROUP BY 1",
)
def q_dedup_sentences(spark, sf_dir):
    """E2p (r10): sentence-granular exact-dup audit — per doc, the
    fraction of its (>= 20-char, trimmed) sentences whose md5 appears
    >= 3 times corpus-wide. The CCNet paragraph-dedup granularity:
    whole-doc dedup misses a template sentence pasted into a million
    otherwise-unique pages, and E4o's shingle boilerplate smears it
    across 3-gram fragments — the sentence hash names it exactly. One
    row-local split/explode + ONE sentence-hash aggregate joined back
    (sentence-keyed shuffles, the E2 family geometry); all-integer +
    one exact division — RAW hash. Same split regex both engines
    ([.!?]+ runs); empty/short fragments dropped by the length
    guard."""
    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), "[.!?]+")).alias("raw"),
        )
        .select("doc_id", F.trim(F.col("raw")).alias("s"))
        .filter(F.length("s") >= _SENT_MIN_CHARS)
    )
    h = s.select("doc_id", F.md5(F.col("s")).alias("hs"))
    dfreq = h.groupBy("hs").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    j = h.join(dfreq, "hs").select(
        "doc_id",
        (F.col("occ") >= _SENT_DUP_DF).cast("int").alias("dup"),
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sents"),
        F.sum("dup").cast("long").alias("n_dup_sents"),
        (F.sum("dup").cast("double") / F.count(F.lit(1))).alias(
            "dup_frac"
        ),
    )


# =========================================================================
# E7q (r10) — Poisson-bootstrap CI on the funnel conversion: THE
# distributed bootstrap (no resampling index, no global row_number —
# each user enters replicate r with a deterministic Poisson(1) weight)
# =========================================================================
_POIS_REPS = 64


def _pois_cum() -> list[float]:
    import math

    out, c = [], 0.0
    for k in range(7):
        c += math.exp(-1) / math.factorial(k)
        out.append(c)
    return out


def _pois_u_sql(key_col: str) -> str:
    """The ONE copy of the md5-uniform replicate key u(key, k) in SQL
    (r11 review: E7q/E7x had diverging copies of this determinism-
    critical expression)."""
    return (
        f"('0x' || substr(md5(CAST({key_col} AS VARCHAR) || '_' || "
        "CAST(k AS VARCHAR)), 1, 12))::BIGINT / 281474976710656.0"
    )


def _pois_weight_col(key) -> "F.Column":
    """The ONE copy of the Poisson(1) replicate weight as a Spark
    Column (md5-uniform u + the cumulative CASE ladder, smallest
    threshold first like the SQL CASE); expects the replicate index
    in column ``k``."""
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_", key.cast("string"), F.col("k").cast("string")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("double") / F.lit(281474976710656.0)
    w = F.lit(7)
    for k_, c in reversed(list(enumerate(_pois_cum()))):
        w = F.when(u < F.lit(c), F.lit(k_)).otherwise(w)
    return w


def _POIS_W_SQL(u: str) -> str:
    cs = _pois_cum()
    return (
        "CASE "
        + " ".join(
            f"WHEN {u} < {_dlit(c)} THEN {k}" for k, c in enumerate(cs)
        )
        + " ELSE 7 END"
    )


def _FUNNEL_BOOT_SQL() -> str:
    u = _pois_u_sql("user_id")
    return (
        "WITH uf AS (SELECT user_id, "
        "  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v, "
        "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p "
        "  FROM events WHERE user_id IS NOT NULL GROUP BY 1), "
        f"reps AS (SELECT CAST(unnest(generate_series(0, "
        f"{_POIS_REPS - 1})) AS INT) AS k), "
        f"w AS (SELECT uf.user_id, uf.v, uf.p, reps.k, "
        f"  CAST({_POIS_W_SQL(u)} AS BIGINT) AS w FROM uf, reps), "
        "r AS (SELECT k, CAST(sum(w * v) AS BIGINT) AS nv, "
        "  CAST(sum(w * CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) "
        "    AS BIGINT) AS nc FROM w GROUP BY 1), "
        "rr AS (SELECT k, CASE WHEN nv > 0 THEN "
        "  CAST(nc AS DOUBLE) / nv END AS rate FROM r), "
        "pt AS (SELECT CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 "
        "  ELSE 0 END) AS BIGINT) AS conv, "
        "  CAST(sum(v) AS BIGINT) AS viewers FROM uf) "
        "SELECT pt.viewers, pt.conv, "
        "CASE WHEN pt.viewers > 0 THEN CAST(pt.conv AS DOUBLE) "
        "  / pt.viewers END AS rate_point, "
        f"CAST(count(rr.rate) AS BIGINT) AS n_reps, "
        "quantile_cont(rr.rate, 0.025) AS ci_lo, "
        "quantile_cont(rr.rate, 0.975) AS ci_hi "
        "FROM rr, pt GROUP BY 1, 2, 3"
    )


@register("q_funnel_bootstrap_ci", _FUNNEL_BOOT_SQL())
def q_funnel_bootstrap_ci(spark, sf_dir):
    """E7q (r10): 95% Poisson-bootstrap CI on the view->purchase
    conversion — each user enters replicate k with weight
    Poisson(1)^(-1)(md5-uniform(user, k)) (the distributed bootstrap:
    no resampling index, no global row_number, no RNG state — the
    weight is a pure function of the key, so replicates replay
    identically across engines/reruns/reshards, the W18 determinism
    device at user grain). 64 replicates as a literal range dim;
    per-replicate rates are exact integer rationals; the CI is one
    exact percentile over 64 deterministic doubles (percentile ≡
    quantile_cont, the A3 contract). Complements E7j's normal-theory
    z with the distribution-free interval. One users-sized flag
    aggregate -> users x 64 narrow rows -> 64-row percentile."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    uf = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    )
    reps = ev.sparkSession.range(_POIS_REPS).select(
        F.col("id").cast("int").alias("k")
    )
    w = uf.crossJoin(F.broadcast(reps)).select(
        "v", "p", "k",
        _pois_weight_col(F.col("user_id")).cast("long").alias("w"),
    )
    conv = ((F.col("v") == 1) & (F.col("p") == 1)).cast("int")
    r = w.groupBy("k").agg(
        F.sum(F.col("w") * F.col("v")).cast("long").alias("nv"),
        F.sum(F.col("w") * conv).cast("long").alias("nc"),
    )
    rr = r.select(
        F.when(
            F.col("nv") > 0, F.col("nc").cast("double") / F.col("nv")
        ).alias("rate")
    )
    pt = uf.agg(
        F.sum((F.col("v") == 1).cast("int")).cast("long").alias("viewers"),
        F.sum(conv).cast("long").alias("conv"),
    )
    ci = rr.agg(
        F.count("rate").cast("long").alias("n_reps"),
        F.expr("percentile(rate, 0.025)").alias("ci_lo"),
        F.expr("percentile(rate, 0.975)").alias("ci_hi"),
    )
    return pt.crossJoin(F.broadcast(ci)).select(
        "viewers",
        "conv",
        F.when(
            F.col("viewers") > 0,
            F.col("conv").cast("double") / F.col("viewers"),
        ).alias("rate_point"),
        "n_reps",
        "ci_lo",
        "ci_hi",
    )


# =========================================================================
# E6m (r10) — per-source scorecard: the source-selection panel (length,
# model quality, readability, language diversity) from ONE corpus scan
# =========================================================================
def _SCORECARD_SQL() -> str:
    fl = (
        f"{_dlit(206.835)} - {_dlit(1.015)} "
        "* (CAST(n_tokens AS DOUBLE) "
        "  / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)) "
        f"- {_dlit(84.6)} "
        "* (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) "
        "  AS DOUBLE) / greatest(n_tokens, 1))"
    )
    return (
        "WITH d AS (SELECT source, lang, n_chars, text, "
        + TOKENS_SQL
        + " AS toks FROM documents), "
        f"f AS (SELECT source, n_chars, text, {QFEATURES_SQL} FROM d), "
        "q AS (SELECT source, n_chars, "
        + _dq_sql(QLOGIT_SQL(), 20)
        + " AS ql, "
        + _dq_sql(fl, 20)
        + " AS fl FROM f), "
        "g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars, "
        "  sum(ql) / count(*) AS mean_quality_logit, "
        "  sum(fl) / count(*) AS mean_flesch FROM q GROUP BY 1), "
        "lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c "
        "  FROM documents GROUP BY 1, 2), "
        "ent AS (SELECT source, "
        + rq_sql(
            "ln(CAST(sum(c) AS DOUBLE)) "
            "- sum(c * ln(CAST(c AS DOUBLE))) / sum(c)",
            4,
        )
        + " AS lang_entropy FROM lc GROUP BY 1) "
        "SELECT g1.source, g1.n_docs, g1.mean_chars, "
        "g1.mean_quality_logit, g1.mean_flesch, ent.lang_entropy "
        "FROM g1 JOIN ent ON g1.source = ent.source"
    )


@register("q_source_scorecard", _SCORECARD_SQL())
def q_source_scorecard(spark, sf_dir):
    """E6m (r10): the per-source selection scorecard — doc count, mean
    length, mean model-quality LOGIT (the E4e literal-weight
    classifier), mean Flesch readability (E4w), and language-mix
    Shannon entropy, from ONE corpus scan (every feature is row-local;
    the only shuffles are two sources-sized aggregates). The panel a
    mixture designer reads BEFORE setting E6c weights: a source can be
    long-and-unreadable (scraped listings) or short-and-clean — n_docs
    alone distinguishes neither. Quality/flesch dyadic-quantized
    (2^-20) so the per-source means are order-free exact; mean length
    an exact integer rational; entropy rq4 (ln display contract)."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.operators.textops import (
        flesch_cols,
        quality_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = quality_scores(docs)
    _, _, _, flesch = flesch_cols("text")
    q = qs.select(
        "source",
        "n_chars",
        dyadic_quantize(F.col("quality_logit"), 20).alias("ql"),
        dyadic_quantize(flesch, 20).alias("fl"),
    )
    g1 = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "mean_chars"
        ),
        (F.sum("ql") / F.count(F.lit(1))).alias("mean_quality_logit"),
        (F.sum("fl") / F.count(F.lit(1))).alias("mean_flesch"),
    )
    lc = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ent = lc.groupBy("source").agg(
        rq(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c"),
            4,
        ).alias("lang_entropy")
    )
    return g1.join(ent, "source")


# =========================================================================
# E7u (r11) — windowed drift vs a FIXED reference histogram: the batch
# twin of streaming_drift_gate (the live monitor VERDICT r10 #6 asked
# for). Reference slice summarized ONCE to a domain-bounded literal;
# per event-time window, KS/W1/PSI of the live value distribution.
# =========================================================================
def _WINDOW_DRIFT_SQL() -> str:
    from mhw3d_detection_spark.operators.analysis import (
        dyadic_quantize_sql as _dq,
    )
    from mhw3d_detection_spark.queries.base import rq_sql as _rqs

    xq = _rqs("value", 0)
    term = (
        "((bn + 1.0e0) / (b.n_new + nb.nb) - (bo + 1.0e0) / (n_old + nb.nb))"
        " * ln(((bn + 1.0e0) / (b.n_new + nb.nb)) / "
        "((bo + 1.0e0) / (n_old + nb.nb)))"
    )
    return (
        "WITH refh AS (SELECT CAST(" + xq + " AS DOUBLE) AS x, "
        "  CAST(count(*) AS BIGINT) AS c_old FROM events "
        "  WHERE user_id IS NOT NULL AND user_id % 5 = 4 "
        "    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) "
        "  GROUP BY 1), "
        "tot AS (SELECT CAST(sum(c_old) AS DOUBLE) AS n_old FROM refh), "
        "cnt AS (SELECT CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01') "
        "    / 7.0e0) AS BIGINT) AS win, "
        "  CAST(" + xq + " AS DOUBLE) AS x, "
        "  CAST(count(*) AS BIGINT) AS c_new FROM events "
        "  WHERE user_id IS NOT NULL AND user_id % 5 <> 4 "
        "    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE)) "
        "  GROUP BY 1, 2), "
        "wins AS (SELECT win, CAST(sum(c_new) AS DOUBLE) AS n_new "
        "  FROM cnt GROUP BY 1), "
        "spine AS (SELECT w.win, r.x, r.c_old FROM "
        "  (SELECT win FROM wins) w CROSS JOIN refh r), "
        "j AS (SELECT coalesce(s.win, c.win) AS win, "
        "  coalesce(s.x, c.x) AS x, coalesce(s.c_old, 0) AS co, "
        "  coalesce(c.c_new, 0) AS cn FROM spine s "
        "  FULL OUTER JOIN cnt c ON s.win = c.win AND s.x = c.x), "
        "jc AS (SELECT j.*, wins.n_new FROM j "
        "  JOIN wins ON j.win = wins.win), "
        "cum AS (SELECT win, x, co, cn, n_new, "
        "  CASE WHEN n_old > 0 AND n_new > 0 THEN "
        "    abs(CAST(sum(co) OVER wcum AS DOUBLE) / n_old "
        "        - CAST(sum(cn) OVER wcum AS DOUBLE) / n_new) END AS diff, "
        "  CAST(lead(x) OVER (PARTITION BY win ORDER BY x) - x AS DOUBLE) "
        "    AS gap FROM jc, tot "
        "  WINDOW wcum AS (PARTITION BY win ORDER BY x "
        "    ROWS UNBOUNDED PRECEDING)), "
        "ksx AS (SELECT win, max(diff) AS ks_stat FROM cum GROUP BY 1), "
        "w1x AS (SELECT win, sum(" + _dq("diff", 30) + " * gap) AS w1_stat "
        "  FROM cum WHERE gap IS NOT NULL GROUP BY 1), "
        "bands AS (SELECT win, CAST(floor(x / 50.0e0) AS BIGINT) AS band, "
        "  CAST(sum(co) AS BIGINT) AS bo, CAST(sum(cn) AS BIGINT) AS bn, "
        "  first(n_new) AS n_new FROM jc GROUP BY 1, 2), "
        "nb AS (SELECT win, CAST(count(*) AS BIGINT) AS nb "
        "  FROM bands GROUP BY 1), "
        "psix AS (SELECT b.win, sum(CASE WHEN n_old > 0 AND b.n_new > 0 "
        "  THEN " + _dq(term, 20) + " END) AS psi_stat FROM bands b "
        "  JOIN nb ON b.win = nb.win, tot GROUP BY 1) "
        "SELECT wins.win AS win_id, "
        "DATE '1970-01-01' + CAST(wins.win * 7 AS INT) AS window_start, "
        "CAST(wins.n_new AS BIGINT) AS n_new, ksx.ks_stat, "
        "CASE WHEN n_old > 0 AND wins.n_new > 0 THEN "
        "  coalesce(w1x.w1_stat, 0.0e0) END AS w1_stat, psix.psi_stat "
        "FROM wins LEFT JOIN ksx ON wins.win = ksx.win "
        "LEFT JOIN w1x ON wins.win = w1x.win "
        "LEFT JOIN psix ON wins.win = psix.win, tot"
    )


@register("q_window_drift", _WINDOW_DRIFT_SQL())
def q_window_drift(spark, sf_dir):
    """E7u (r11): per-7-day-window KS/W1/PSI drift of the event value
    distribution against the user_id%5=4 reference slice — the batch
    twin of ``streaming.streaming_drift_gate`` (bit-parity pinned by
    ``tests/test_streaming.py::test_streaming_drift_gate_matches_batch_bitexact``)
    and the windowed member of the drift family (q_source_ks_drift is
    per-source, q_drift_report is one split — this one is per TIME
    window, the nightly-monitor axis). rq_digits=0 guards the value
    domain (~500 distinct integers); the reference histogram is a
    build-time literal (`drift_ref_hist`, the srp_gate_sigs device);
    stats are raw/dyadic-grid hashes. One corpus aggregate to
    (windows x domain) rows; windows partition the cumulative sums."""
    from mhw3d_detection_spark.operators.analysis import (
        drift_ref_hist,
        window_drift_scores,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    ref = drift_ref_hist(
        ev.filter(F.col("user_id") % 5 == 4), "value", rq_digits=0
    )
    return window_drift_scores(
        ev.filter(F.col("user_id") % 5 != 4),
        ref,
        "value",
        time_col="ts",
        window_days=7,
        rq_digits=0,
        psi_band=50,
        truncate=True,
    )


# =========================================================================
# E7v (r11) — Mann-Whitney U + Cliff's delta: the rank-based two-sample
# member (KS = shape, W1 = transport, ANOVA = means; U/delta =
# stochastic ORDER with a distribution-free effect size)
# =========================================================================
_MWU_VAR_SQL = (
    "CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE) / 12.0e0 * ("
    "CAST(n_old + n_new + 1 AS DOUBLE) - CAST(ties AS DOUBLE) / "
    "(CAST(n_old + n_new AS DOUBLE) * CAST(n_old + n_new - 1 AS DOUBLE)))"
)


@register(
    "q_mann_whitney",
    "WITH s AS (SELECT n_chars AS x, "
    "  CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END AS io "
    "  FROM documents WHERE n_chars IS NOT NULL), "
    "g AS (SELECT x, CAST(sum(io) AS BIGINT) AS c_old, "
    "  CAST(count(*) - sum(io) AS BIGINT) AS c_new FROM s GROUP BY 1), "
    "cum AS (SELECT x, c_old, c_new, c_old + c_new AS cnt, "
    "  CAST(sum(c_old + c_new) OVER (ORDER BY x "
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "    - (c_old + c_new) AS BIGINT) AS before FROM g), "
    "a AS (SELECT CAST(sum(c_old) AS BIGINT) AS n_old, "
    "  CAST(sum(c_new) AS BIGINT) AS n_new, "
    "  CAST(sum(c_old * (2 * before + cnt + 1)) AS BIGINT) AS r2, "
    "  CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties FROM cum), "
    "b AS (SELECT n_old, n_new, r2 - n_old * (n_old + 1) AS u2, ties "
    "  FROM a) "
    "SELECT n_old, n_new, "
    "CASE WHEN n_old > 0 AND n_new > 0 THEN "
    "  CAST(u2 AS DOUBLE) / 2.0e0 END AS u_stat, "
    f"CASE WHEN n_old > 0 AND n_new > 0 AND {_MWU_VAR_SQL} > 0 THEN "
    "  (CAST(u2 AS DOUBLE) - CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)) "
    f"  / (2.0e0 * sqrt({_MWU_VAR_SQL})) END AS z_stat, "
    "CASE WHEN n_old > 0 AND n_new > 0 THEN "
    "  (CAST(u2 AS DOUBLE) - CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)) "
    "  / (CAST(n_old AS DOUBLE) * CAST(n_new AS DOUBLE)) END "
    "  AS cliffs_delta FROM b",
)
def q_mann_whitney(spark, sf_dir):
    """E7v (r11): exact tie-corrected Mann-Whitney U + normal z +
    Cliff's delta of doc length, corpus (doc_id%5!=4) vs the held-out
    slice — the stochastic-ORDER two-sample test completing the
    KS/W1/ANOVA family, with the distribution-free effect size the
    eval literature prefers over Cohen's d on skewed lengths. ONE
    corpus aggregate to the length histogram; doubled average ranks
    keep the rank sum int64-exact (U is a half-integer — exact
    double); delta via the U identity, z from the integer tie sum —
    RAW hash. operators/analysis.py:rank_two_sample."""
    from mhw3d_detection_spark.operators.analysis import rank_two_sample

    docs = load_table(spark, sf_dir, "documents")
    return rank_two_sample(docs, "n_chars", F.col("doc_id") % 5 != 4)


# =========================================================================
# E6n (r11) — Gumbel/exponential-clock weighted top-k sample: THE
# distributed weighted-sampling-without-replacement primitive
# (Efraimidis-Spirakis keys as a pure function of the row key)
# =========================================================================
_GUMBEL_K = 50
_U48_DENOM = 281474976710657.0  # 2^48 + 1: u = (bits+1)/denom in (0,1)


def _GUMBEL_SQL() -> str:
    from mhw3d_detection_spark.operators.analysis import (
        dyadic_quantize_sql as _dq,
    )

    key = _dq(
        "ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT "
        f"+ 1) / {dlit(_U48_DENOM)}) / CAST(greatest(n_chars, 1) AS DOUBLE)",
        40,
    )
    return (
        f"WITH k AS (SELECT doc_id, "
        "  CAST(greatest(n_chars, 1) AS BIGINT) AS weight, "
        f"  {key} AS skey FROM documents), "
        "r AS (SELECT doc_id, weight, skey, row_number() OVER ("
        "  ORDER BY skey DESC, doc_id) AS rnk FROM k) "
        "SELECT CAST(rnk AS INT) AS rank, doc_id, weight, skey "
        f"FROM r WHERE rnk <= {_GUMBEL_K}"
    )


@register("q_gumbel_topk_sample", _GUMBEL_SQL())
def q_gumbel_topk_sample(spark, sf_dir):
    """E6n (r11): length-weighted sample WITHOUT replacement of 50
    docs via exponential-clock keys (Efraimidis & Spirakis 2006:
    taking the top-k of ln(u)/w — monotone in u^(1/w) — draws each
    k-subset with exactly the sequential weighted-sampling
    probability). The key is a pure function of doc_id (md5-uniform u,
    the W18/bootstrap determinism device), so the sample replays
    identically across engines, reruns and reshards — no RNG state,
    no driver-side pass, and at 100 TB it is one TakeOrdered over a
    narrow projection. u = (bits+1)/(2^48+1) stays in (0,1) (ln(0)
    guarded by construction); keys dyadic-quantized (2^-40, |key| <=
    34) BEFORE the order so the cross-engine ranking can never flip on
    a ulp of libm ln."""
    from mhw3d_detection_spark.operators.analysis import dyadic_quantize

    docs = load_table(spark, sf_dir, "documents")
    bits = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    u = (bits + F.lit(1)).cast("double") / F.lit(_U48_DENOM)
    w = F.greatest(F.col("n_chars"), F.lit(1))
    key = dyadic_quantize(F.log(u) / w.cast("double"), 40)
    k = docs.select(
        "doc_id", w.cast("long").alias("weight"), key.alias("skey")
    )
    # two-phase top-k (TakeOrdered) over the corpus, THEN rank the
    # k-row result — never a corpus-wide single-partition window
    top = k.orderBy(F.desc("skey"), "doc_id").limit(_GUMBEL_K)
    win = Window.orderBy(F.desc("skey"), "doc_id")
    return top.select(
        F.row_number().over(win).cast("int").alias("rank"),
        "doc_id",
        "weight",
        "skey",
    )


# =========================================================================
# E6o (r11) — balanced per-source downsample: equal-count manifest via
# deterministic md5-order ranks (the mixture-rebalancing primitive)
# =========================================================================
@register(
    "q_balanced_downsample",
    "WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
    "  FROM documents GROUP BY 1), "
    "nmin AS (SELECT min(n) AS n_min FROM c), "
    "r AS (SELECT doc_id, source, CAST(row_number() OVER ("
    "  PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) "
    "  AS BIGINT) AS rk FROM documents) "
    "SELECT r.doc_id, r.source, r.rk FROM r, nmin WHERE r.rk <= nmin.n_min",
)
def q_balanced_downsample(spark, sf_dir):
    """E6o (r11): equal-count per-source manifest — every source
    downsampled to the SMALLEST source's count by deterministic
    md5-order rank (uniform within source; the doc_id tie-break can
    never fire on distinct ids but pins the order contract). The
    set-level complement to E6c's fractional mixture weights: weights
    reshape sampling probabilities, this emits the concrete balanced
    subset a trainer can shard. Per-source windows (parallel across
    sources), one scalar broadcast; deterministic across engines,
    reruns, reshards."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    nmin = c.agg(F.min("n").alias("n_min"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = docs.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("rk")
    )
    return r.crossJoin(F.broadcast(nmin)).filter(
        F.col("rk") <= F.col("n_min")
    ).select("doc_id", "source", "rk")


# =========================================================================
# E7w (r11) — per-source Simpson concentration / effective vocabulary
# =========================================================================
@register(
    "q_source_simpson",
    f"WITH tok AS (SELECT source, unnest({TOKENS_SQL}) AS token "
    "  FROM documents), "
    "c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n "
    "  FROM tok GROUP BY 1, 2) "
    "SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_types, "
    "CAST(sum(n * n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) "
    "  * CAST(sum(n) AS DOUBLE)) AS simpson, "
    "(CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)) "
    "  / CAST(sum(n * n) AS DOUBLE) AS inv_simpson "
    "FROM c GROUP BY 1",
)
def q_source_simpson(spark, sf_dir):
    """E7w (r11): per-source Simpson concentration index Σpᵢ² of the
    unigram distribution, with its inverse (the "effective vocabulary"
    — how many equally-common types would look this concentrated).
    The repeated-draw collision view of lexical diversity: E7o's Gini
    ranks inequality corpus-wide, Simpson prices a two-token collision
    per source — template/boilerplate feeds spike it long before
    dedup fires. ONE token aggregate; Σn and Σn² are int64-exact
    (Σn² ≤ n² needs n ≤ 3e9 per source — pre-aggregate shards past
    that), the two divisions exactly rounded — RAW hash."""
    from mhw3d_detection_spark.operators.textops import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    c = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    nd = F.sum("n").cast("double")
    s2 = F.sum(F.col("n") * F.col("n")).cast("double")
    # loud int64 guard (the anova device): per source sum(n^2) <=
    # n_tokens*max_n — non-ANSI Spark would wrap silently where the
    # DuckDB oracle raises (code-review r11 #4)
    guard = F.assert_true(
        nd * F.max("n").cast("double") < F.lit(float(2**63)),
        F.lit(
            "source_simpson: n_tokens*max_count >= 2^63 would wrap "
            "the int64 sum of squares — pre-aggregate shards"
        ),
    )
    return c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.when(guard.isNull(), s2 / (nd * nd)).alias("simpson"),
        ((nd * nd) / s2).alias("inv_simpson"),
    )


# =========================================================================
# E7x (r11w2) — Poisson-bootstrap CI on a mean DIFFERENCE between two
# corpus slices (the distributed two-sample bootstrap; E7q's device on
# the documents surface)
# =========================================================================
def _BOOT_DIFF_SQL() -> str:
    u = _pois_u_sql("doc_id")
    return (
        "WITH d AS (SELECT doc_id, n_chars, "
        "  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS ia "
        "  FROM documents WHERE n_chars IS NOT NULL), "
        f"reps AS (SELECT CAST(unnest(generate_series(0, "
        f"{_POIS_REPS - 1})) AS INT) AS k), "
        f"w AS (SELECT d.doc_id, d.n_chars, d.ia, reps.k, "
        f"  CAST({_POIS_W_SQL(u)} AS BIGINT) AS w FROM d, reps), "
        "r AS (SELECT k, "
        "  CAST(sum(CASE WHEN ia = 1 THEN w * n_chars ELSE 0 END) "
        "    AS BIGINT) AS sa, "
        "  CAST(sum(CASE WHEN ia = 1 THEN w ELSE 0 END) AS BIGINT) AS na, "
        "  CAST(sum(CASE WHEN ia = 0 THEN w * n_chars ELSE 0 END) "
        "    AS BIGINT) AS sb, "
        "  CAST(sum(CASE WHEN ia = 0 THEN w ELSE 0 END) AS BIGINT) AS nb "
        "  FROM w GROUP BY 1), "
        "rr AS (SELECT k, CASE WHEN na > 0 AND nb > 0 THEN "
        "  CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb END AS diff "
        "  FROM r), "
        "pt AS (SELECT CAST(sum(CASE WHEN ia = 1 THEN n_chars ELSE 0 END) "
        "    AS BIGINT) AS ta, "
        "  CAST(sum(ia) AS BIGINT) AS n_a, "
        "  CAST(sum(CASE WHEN ia = 0 THEN n_chars ELSE 0 END) AS BIGINT) "
        "    AS tb, "
        "  CAST(count(*) - sum(ia) AS BIGINT) AS n_b FROM d) "
        "SELECT pt.n_a, pt.n_b, "
        "CASE WHEN pt.n_a > 0 AND pt.n_b > 0 THEN "
        "  CAST(pt.ta AS DOUBLE) / pt.n_a - CAST(pt.tb AS DOUBLE) / pt.n_b "
        "  END AS diff_point, "
        "CAST(count(rr.diff) AS BIGINT) AS n_reps, "
        "quantile_cont(rr.diff, 0.025) AS ci_lo, "
        "quantile_cont(rr.diff, 0.975) AS ci_hi "
        "FROM rr, pt GROUP BY 1, 2, 3"
    )


@register("q_bootstrap_mean_diff", _BOOT_DIFF_SQL())
def q_bootstrap_mean_diff(spark, sf_dir):
    """E7x (r11w2): 95% Poisson-bootstrap CI on the difference of mean
    doc length between the doc_id%3=0 slice and the rest — the
    distribution-free two-sample companion to E7v's rank test (U says
    WHETHER the slices order-differ; this says BY HOW MANY characters,
    with uncertainty). Same distributed-bootstrap device as E7q: each
    doc enters replicate k with a Poisson(1) weight that is a pure
    md5 function of (doc_id, k) — no RNG state, replays everywhere;
    per-replicate means are exact integer rationals; the CI is one
    exact percentile over 64 deterministic doubles. One docs x 64
    narrow fan-out -> 64-row percentile."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    ).select("doc_id", "n_chars", (F.col("doc_id") % 3 == 0).cast("int").alias("ia"))
    reps = docs.sparkSession.range(_POIS_REPS).select(
        F.col("id").cast("int").alias("k")
    )
    w = docs.crossJoin(F.broadcast(reps)).select(
        "n_chars", "ia", "k",
        _pois_weight_col(F.col("doc_id")).cast("long").alias("w"),
    )
    r = w.groupBy("k").agg(
        F.sum(F.when(F.col("ia") == 1, F.col("w") * F.col("n_chars"))
              .otherwise(F.lit(0))).cast("long").alias("sa"),
        F.sum(F.when(F.col("ia") == 1, F.col("w")).otherwise(F.lit(0)))
        .cast("long").alias("na"),
        F.sum(F.when(F.col("ia") == 0, F.col("w") * F.col("n_chars"))
              .otherwise(F.lit(0))).cast("long").alias("sb"),
        F.sum(F.when(F.col("ia") == 0, F.col("w")).otherwise(F.lit(0)))
        .cast("long").alias("nb"),
    )
    rr = r.select(
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.col("sa").cast("double") / F.col("na")
            - F.col("sb").cast("double") / F.col("nb"),
        ).alias("diff")
    )
    pt = docs.agg(
        F.sum(F.when(F.col("ia") == 1, F.col("n_chars")).otherwise(0))
        .cast("long").alias("ta"),
        F.sum("ia").cast("long").alias("n_a"),
        F.sum(F.when(F.col("ia") == 0, F.col("n_chars")).otherwise(0))
        .cast("long").alias("tb"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("long").alias("n_b"),
    )
    agg = rr.crossJoin(F.broadcast(pt)).groupBy("n_a", "n_b", "ta", "tb").agg(
        F.count("diff").cast("long").alias("n_reps"),
        F.expr("percentile(diff, 0.025)").alias("ci_lo"),
        F.expr("percentile(diff, 0.975)").alias("ci_hi"),
    )
    diff_pt = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("ta").cast("double") / F.col("n_a")
        - F.col("tb").cast("double") / F.col("n_b"),
    )
    return agg.select(
        "n_a", "n_b", diff_pt.alias("diff_point"), "n_reps", "ci_lo", "ci_hi"
    )


# =========================================================================
# E4z (r11w2) — token coverage curve: what fraction of corpus tokens do
# the top-N types cover (the vocabulary-sizing readout)
# =========================================================================
_COVERAGE_CUTOFFS = (10, 100, 1000)


@register(
    "q_coverage_curve",
    f"WITH tok AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents), "
    "c AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok "
    "  GROUP BY 1), "
    "t AS (SELECT CAST(sum(n) AS BIGINT) AS tot, "
    "  CAST(count(*) AS BIGINT) AS v FROM c), "
    "r AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token) "
    "  AS rnk FROM c), "
    f"top AS (SELECT * FROM r WHERE rnk <= {max(_COVERAGE_CUTOFFS)}), "
    "cut AS (SELECT CAST(unnest([" +
    ", ".join(str(c) for c in _COVERAGE_CUTOFFS) + "]) AS INT) AS cutoff) "
    "SELECT cut.cutoff, "
    "CAST(least(cut.cutoff, t.v) AS BIGINT) AS n_types, "
    "CAST(coalesce(sum(CASE WHEN top.rnk <= cut.cutoff THEN top.n END), 0) "
    "  AS BIGINT) AS covered_tokens, "
    "CAST(coalesce(sum(CASE WHEN top.rnk <= cut.cutoff THEN top.n END), 0) "
    "  AS DOUBLE) / t.tot AS coverage "
    "FROM cut CROSS JOIN t LEFT JOIN top ON top.rnk <= cut.cutoff "
    "GROUP BY 1, 2, t.tot",
)
def q_coverage_curve(spark, sf_dir):
    """E4z (r11w2): cumulative token coverage of the top-10/100/1000
    types — the vocabulary-sizing readout (Zipf fits the SHAPE of the
    rank-frequency law; this answers the operational question "how
    big must a vocab/stopword list be to cover X% of the stream").
    One token aggregate, a 1000-row TakeOrdered head (count desc,
    token tie-break — total order, deterministic cross-engine), then
    cutoff-bounded sums; counts integer, shares exactly rounded —
    RAW hash."""
    from mhw3d_detection_spark.operators.textops import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        F.explode(tokens_col(F.col("text"))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    top = (
        c.orderBy(F.desc("n"), "token")
        .limit(max(_COVERAGE_CUTOFFS))
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("n"), "token")),
        )
    )
    cut = docs.sparkSession.createDataFrame(
        [(int(x),) for x in _COVERAGE_CUTOFFS], "cutoff int"
    )
    j = cut.crossJoin(F.broadcast(t)).join(
        F.broadcast(top), top.rnk <= cut.cutoff, "left"
    )
    return j.groupBy("cutoff", "v", "tot").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("cov")
    ).select(
        "cutoff",
        F.least(F.col("cutoff").cast("long"), F.col("v")).alias("n_types"),
        F.col("cov").alias("covered_tokens"),
        (F.col("cov").cast("double") / F.col("tot")).alias("coverage"),
    )


# =========================================================================
# E7y (r11w2) — per-source Jensen-Shannon divergence vs the rest of the
# corpus: the symmetric, bounded drift score completing the divergence
# family (E6d KL is asymmetric/unbounded)
# =========================================================================
def _JSD_SQL() -> str:
    import math

    from mhw3d_detection_spark.operators.analysis import (
        dyadic_quantize_sql as _dq,
    )

    p = "CAST(n_st AS DOUBLE) / n_s"
    q = "CAST(n_t - n_st AS DOUBLE) / (n - n_s)"
    m = f"(({p}) + ({q})) / 2.0e0"
    term = (
        f"0.5e0 * (({p}) * ln(({p}) / ({m})) + CASE WHEN n_t - n_st > 0 "
        f"THEN ({q}) * ln(({q}) / ({m})) ELSE 0.0e0 END)"
    )
    return (
        f"WITH tok AS (SELECT source, unnest({TOKENS_SQL}) AS token "
        "  FROM documents), "
        "c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n_st "
        "  FROM tok GROUP BY 1, 2), "
        "tc AS (SELECT token, CAST(sum(n_st) AS BIGINT) AS n_t "
        "  FROM c GROUP BY 1), "
        "sc AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s "
        "  FROM c GROUP BY 1), "
        "tot AS (SELECT CAST(sum(n_st) AS BIGINT) AS n FROM c), "
        "j AS (SELECT c.source, c.n_st, tc.n_t, sc.n_s, tot.n, "
        f"  {_dq(term, 20)} AS term, {_dq(q, 30)} AS qq "
        "  FROM c JOIN tc ON c.token = tc.token "
        "  JOIN sc ON c.source = sc.source, tot) "
        "SELECT source, CAST(max(n_s) AS BIGINT) AS n_src, "
        "CAST(max(n) - max(n_s) AS BIGINT) AS n_rest, "
        "sum(term) + " + _dq(
            f"0.5e0 * {dlit(math.log(2.0))} * (1.0e0 - sum(qq))", 20
        ) + " AS jsd FROM j GROUP BY 1"
    )


@register("q_js_divergence", _JSD_SQL())
def q_js_divergence(spark, sf_dir):
    """E7y (r11w2): per-source Jensen-Shannon divergence of the
    unigram distribution vs the REST of the corpus — the symmetric,
    [0, ln 2]-bounded member of the divergence family (E6d's KL is
    asymmetric and blows up on source-exclusive tokens; JSD is the
    mixture-smoothed score monitoring dashboards can threshold).

    Grid-free closed form: tokens ABSENT from a source contribute
    exactly q·ln2 to its rest-leg, and Σ_t q_t = 1, so the absent-token
    mass folds into one correction 0.5·ln2·(1 − Σ_{t∈s} q_t) — the
    per-(source, token) frame stays PAIRS-sized (observed cells only),
    never the dense sources x vocab grid. Present-cell terms dyadic
    2^-20, the q-sum 2^-30, correction 2^-20: every sum order-free.
    One token-keyed shuffle; sources-sized output."""
    import math

    from mhw3d_detection_spark.operators.analysis import dyadic_quantize
    from mhw3d_detection_spark.operators.textops import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("token")
    ).groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n_st")
    )
    tc = c.groupBy("token").agg(F.sum("n_st").cast("long").alias("n_t"))
    sc = c.groupBy("source").agg(F.sum("n_st").cast("long").alias("n_s"))
    tot = c.agg(F.sum("n_st").cast("long").alias("n"))
    p = F.col("n_st").cast("double") / F.col("n_s")
    q = (F.col("n_t") - F.col("n_st")).cast("double") / (
        F.col("n") - F.col("n_s")
    )
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * (
        p * F.log(p / m)
        + F.when(
            F.col("n_t") - F.col("n_st") > 0, q * F.log(q / m)
        ).otherwise(F.lit(0.0))
    )
    j = (
        c.join(tc, "token")
        .join(F.broadcast(sc), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            "n",
            dyadic_quantize(term, 20).alias("term"),
            dyadic_quantize(q, 30).alias("qq"),
        )
    )
    corr = dyadic_quantize(
        F.lit(0.5)
        * F.lit(math.log(2.0))
        * (F.lit(1.0) - F.sum("qq")),
        20,
    )
    return j.groupBy("source").agg(
        F.max("n_s").cast("long").alias("n_src"),
        (F.max("n") - F.max("n_s")).cast("long").alias("n_rest"),
        (F.sum("term") + corr).alias("jsd"),
    )


# =========================================================================
# E7z (r12) — Kruskal-Wallis H: the k-group rank test (rank_two_sample
# is the k=2 member; anova_oneway is the means version — this is the
# distribution-free one that survives web-text tails)
# =========================================================================
_KW_CORR_SQL = (
    "(1.0e0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * "
    "CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
)


@register(
    "q_kruskal_wallis",
    "WITH s AS (SELECT source AS g, n_chars AS x FROM documents "
    "  WHERE n_chars IS NOT NULL), "
    "h AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY 1), "
    "r AS (SELECT x, cnt, CAST(2 * (sum(cnt) OVER (ORDER BY x "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) "
    "  + cnt + 1 AS BIGINT) AS dr FROM h), "
    "gg AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM s "
    "  GROUP BY 1, 2), "
    "pg AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, "
    "  CAST(sum(c * dr) AS BIGINT) AS r2 FROM gg JOIN r USING (x) "
    "  GROUP BY 1), "
    "t AS (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties "
    "  FROM h), "
    "tot AS (SELECT CAST(count(*) AS INT) AS k, "
    "  CAST(sum(ng) AS BIGINT) AS n FROM pg), "
    "ag AS (SELECT k, n, sum("
    + _dq_sql(
        "3.0e0 * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / "
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0e0) * "
        "CAST(ng AS DOUBLE))",
        20,
    )
    + ") AS s FROM pg, tot GROUP BY 1, 2) "
    "SELECT k AS k_groups, n, ties, "
    "CASE WHEN k > 1 AND n > k THEN "
    "  s - 3.0e0 * (CAST(n AS DOUBLE) + 1.0e0) END AS h_stat, "
    f"CASE WHEN k > 1 AND n > k AND {_KW_CORR_SQL} > 0 THEN "
    "  (s - 3.0e0 * (CAST(n AS DOUBLE) + 1.0e0)) "
    f"  / {_KW_CORR_SQL} END AS h_tie_corrected, "
    "CASE WHEN k > 1 AND n > k THEN CAST(k - 1 AS INT) END AS dof "
    "FROM ag, t",
)
def q_kruskal_wallis(spark, sf_dir):
    """E7z (r12): exact tie-corrected Kruskal-Wallis H of doc length
    across sources — the k-group rank test completing the two-sample
    family (E7v's U is the k=2 member, E7m's ANOVA the means version;
    this is the screen to run when length tails would wreck F). ONE
    corpus aggregate to the (source, length) histogram; doubled
    average ranks keep every per-source rank sum int64-exact; per-group
    H terms dyadic-quantized (2^-20) before the sources-sized sum —
    RAW hash. operators/analysis.py:kruskal_wallis."""
    from mhw3d_detection_spark.operators.analysis import kruskal_wallis

    docs = load_table(spark, sf_dir, "documents")
    return kruskal_wallis(docs, "n_chars", "source")


# =========================================================================
# DQ4 (r12) — Brown-Forsythe (median-Levene) variance-homogeneity
# screen: the assumption check behind E7m's ANOVA, and a dispersion
# drift monitor in its own right
# =========================================================================
_BF_Z_SQL = (
    "CAST(floor(abs(CAST(n_chars AS DOUBLE) - med) * 2.0 "
    "+ 0.5000152587890625) AS BIGINT)"
)


@register(
    "q_levene_bf",
    "WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med "
    "  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1), "
    "z AS (SELECT d.source, " + _BF_Z_SQL + " AS zq "
    "  FROM documents d JOIN m ON d.source = m.source "
    "  WHERE d.n_chars IS NOT NULL), "
    "g AS (SELECT source, CAST(count(*) AS BIGINT) AS ng, "
    "  CAST(sum(zq) AS BIGINT) AS sg, "
    "  CAST(sum(zq * zq) AS BIGINT) AS qg FROM z GROUP BY 1), "
    "tot AS (SELECT CAST(count(*) AS INT) AS k, "
    "  CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s FROM g), "
    "j AS (SELECT tot.k, tot.n, "
    + _dq_sql(
        "CAST(ng AS DOUBLE) * (CAST(sg AS DOUBLE) / ng - "
        "CAST(s AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / ng - "
        "CAST(s AS DOUBLE) / n)",
        10,
    )
    + " AS bt, "
    + _dq_sql("CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / ng", 10)
    + " AS wt FROM g, tot), "
    "agg AS (SELECT k, n, sum(bt) AS ss_between, sum(wt) AS ss_within "
    "  FROM j GROUP BY 1, 2) "
    "SELECT k AS k_groups, n, ss_between, ss_within, "
    "CASE WHEN k > 1 AND n > k AND ss_within > 0 THEN "
    "  (ss_between / (k - 1)) / (ss_within / (n - k)) END AS f_stat "
    "FROM agg",
)
def q_levene_bf(spark, sf_dir):
    """DQ4 (r12): Brown-Forsythe test (Levene with the MEDIAN center)
    of length-dispersion homogeneity across sources — the assumption
    check E7m's ANOVA rests on (equal within-group variance), and the
    "did a feed's SPREAD blow up" monitor the mean-level screens miss
    entirely. BF = one-way ANOVA on z = |x − median_g|: per-source
    medians are exact pooled percentiles (percentile ≡ quantile_cont,
    the A3 contract, broadcast back onto one corpus pass). The
    interpolated median of INTEGER lengths lands on the exact 0.5 grid
    ((a+b)/2), so 2·z is integer-valued EXACTLY and the fixed-point
    scale is 2 — not finer: a 1024x scale inflated the SS terms past
    the point where the shared 2^-10 dyadic term grid is exactly
    representable in a double, and the r12 raw-hash pass caught the
    resulting 1-ulp sum drift at sf0.1. With scale 2 anova_oneway's
    integer-valued contract holds with ~2^9 headroom at sf10+: int64
    per-group sums, SS terms dyadic 2^-10, F scale-invariant. SS
    reported on the 4x grid — RAW hash.
    operators/analysis.py:anova_oneway."""
    from mhw3d_detection_spark.operators.analysis import anova_oneway

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    z = docs.join(F.broadcast(med), "source").select(
        "source",
        F.floor(
            F.abs(F.col("n_chars").cast("double") - F.col("med"))
            * F.lit(2.0)
            + F.lit(0.5000152587890625)
        ).cast("long").alias("zq"),
    )
    return anova_oneway(z, "zq", "source")


# =========================================================================
# E7hh (r13) — heavy hitters: Misra-Gries candidates + exact verify
# =========================================================================
@register(
    "q_heavy_hitters",
    "WITH tok AS (SELECT unnest(" + TOKENS_SQL + ") AS token "
    "  FROM documents), "
    "c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok "
    "  GROUP BY 1), "
    "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM c) "
    "SELECT token, cnt, n_total, "
    "CAST(cnt AS DOUBLE) / n_total AS freq "
    "FROM c, t WHERE cnt * 40 > n_total",
)
def q_heavy_hitters(spark, sf_dir):
    """E7hh (r13): exact heavy hitters over the corpus token stream at
    sketch cost — a fixed-memory Misra-Gries pass (40 counters per
    partition, mergeable-summaries reduction) finds candidates, then
    an exact recount runs only over the broadcast candidate set; the
    MG superset guarantee (any item with freq > 1/40 survives some
    partition) makes the output the EXACT set {token : cnt*40 > n}
    independent of partition layout. The oracle prices that exact
    semantics with a full GROUP BY — affordable at sf, replaced by the
    sketch pass at corpus scale where the full token-domain shuffle is
    the thing being avoided. freq is one int64/int64 IEEE division —
    RAW hash. operators/sketches.py:token_heavy_hitters."""
    from mhw3d_detection_spark.operators.sketches import token_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return token_heavy_hitters(docs, k=40)


# =========================================================================
# E7gg (r13) — HLL set algebra: who did BOTH, from register sketches
# =========================================================================
def _HLL_IX_SQL() -> str:
    """DuckDB mirror of ``operators.sketches.hll_set_algebra`` on the
    events surface: same 48-bit md5 hash of the user id's string form,
    same register split / unrolled bit-length / exact power-of-two
    sums as _HLL_SQL, three register tables (A, B, union-by-max), and
    the inclusion-exclusion intersection from the raw estimates."""
    from mhw3d_detection_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_WBITS,
        bitlen_sql,
    )

    rho = f"({HLL_WBITS + 1} - {bitlen_sql(f'x // {HLL_M}', HLL_WBITS)})"
    a_mm = HLL_ALPHA * HLL_M * HLL_M
    est = (
        "SELECT CASE WHEN raw <= {lim!r} AND v > 0 "
        "THEN {m!r} * ln({m!r} / v) ELSE raw END AS ed FROM "
        "(SELECT {amm!r} / (s_present + ({M} - nreg)) AS raw, "
        "{M} - nreg AS v FROM (SELECT count(*) AS nreg, "
        "sum(1.0 / (1::BIGINT << rho)) AS s_present FROM {src}))"
    )

    def e(src: str) -> str:
        return est.format(
            lim=2.5 * HLL_M, m=float(HLL_M), amm=a_mm, M=HLL_M, src=src
        )

    return (
        "WITH h AS (SELECT CAST(user_id AS VARCHAR) AS it, event_type "
        "  FROM events WHERE user_id IS NOT NULL), "
        "xa AS (SELECT ('0x' || substr(md5(it), 1, 12))::BIGINT AS x "
        "  FROM h WHERE event_type = 'click'), "
        "xb AS (SELECT ('0x' || substr(md5(it), 1, 12))::BIGINT AS x "
        "  FROM h WHERE event_type = 'purchase'), "
        f"ra AS (SELECT x % {HLL_M} AS reg, max({rho}) AS rho FROM xa "
        "  GROUP BY 1), "
        f"rb AS (SELECT x % {HLL_M} AS reg, max({rho}) AS rho FROM xb "
        "  GROUP BY 1), "
        "ru AS (SELECT reg, max(rho) AS rho FROM "
        "  (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1), "
        f"ea AS ({e('ra')}), eb AS ({e('rb')}), eu AS ({e('ru')}), "
        "fl AS (SELECT it, "
        "  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ha, "
        "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "    AS hb FROM h GROUP BY 1), "
        "ex AS (SELECT CAST(sum(ha) AS BIGINT) AS exact_a, "
        "  CAST(sum(hb) AS BIGINT) AS exact_b, "
        "  CAST(sum(ha * hb) AS BIGINT) AS exact_intersection FROM fl) "
        f"SELECT {rq_sql('ea.ed', 4)} AS est_a, "
        f"{rq_sql('eb.ed', 4)} AS est_b, "
        f"{rq_sql('eu.ed', 4)} AS est_union, "
        f"{rq_sql('ea.ed + eb.ed - eu.ed', 4)} AS est_intersection, "
        "ex.exact_a, ex.exact_b, ex.exact_intersection "
        "FROM ea, eb, eu, ex"
    )


@register("q_hll_intersection", _HLL_IX_SQL())
def q_hll_intersection(spark, sf_dir):
    """E7gg (r13): sketch-side set algebra on the events surface — how
    many users clicked, purchased, either, and (inclusion-exclusion)
    BOTH, from three fixed-size HLL register tables; union is a
    register-wise max (the mergeability the family is built on), so
    the "both" question never shuffles the user domain twice. Exact
    references ride along from one per-user flag aggregate. Estimates
    dyadically rounded (the linear-counting ln branch is the family's
    one transcendental); exact counts int64 — RAW hash.
    operators/sketches.py:hll_set_algebra."""
    from mhw3d_detection_spark.operators.sketches import hll_set_algebra

    ev = load_table(spark, sf_dir, "events")
    out = hll_set_algebra(
        ev,
        item=F.col("user_id").cast("string"),
        flag_a=F.col("event_type") == "click",
        flag_b=F.col("event_type") == "purchase",
    )
    return out.select(
        rq("est_a", 4).alias("est_a"),
        rq("est_b", 4).alias("est_b"),
        rq("est_union", 4).alias("est_union"),
        rq("est_intersection", 4).alias("est_intersection"),
        "exact_a",
        "exact_b",
        "exact_intersection",
    )
