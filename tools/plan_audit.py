"""Full-registry physical-plan audit — the scale gate the targeted
plan-shape tests don't cover.

``tests/test_plan_shape.py`` pins 18 specific plans; this tool sweeps
EVERY registered query, builds its physical plan, and flags the
antipatterns that kill 100 TB runs. Plan builds are lazy for all but
two queries: the IVF trainer pair (``q_similarity_ivf_train`` /
``q_similarity_ivf_trained``) runs its eager driver-side Lloyd's loop
(a few small Spark jobs at the audited SF) while BUILDING the final
assign plan, and only that final plan is audited — the training
iterations' own plan shapes are pinned separately by
``tests/test_plan_shape.py::test_kmeans_assign_is_narrow`` and the
TakeOrdered-init test. Patterns flagged:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — an unkeyed join.
  O(n*m) compare work; at cluster scale this is the difference between
  minutes and weeks.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. Every
  row round-trips through pickle; the Arrow-batched kernels
  (``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas``)
  are the sanctioned Python hatches and are NOT flagged.
- ``SortMergeJoin`` where one side is a parquet scan under ~10 MB at
  the audited SF — a missed broadcast (informational: AQE usually
  rescues this at runtime, so it warns rather than fails).

Known-justified hits live in ``ALLOWLIST`` with the reason inline —
an empty entry would fail the paired pytest, so every exemption stays
argued in code review.

Usage::

    python tools/plan_audit.py [sf_dir] [--json OUT]

Exit 1 if any non-allowlisted fatal pattern appears. The paired test
(``tests/test_plan_shape.py::test_full_registry_plan_audit``) runs the
same sweep at sf0.001 on every pytest run.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> {pattern: reason}. Every entry must argue WHY the pattern
#: is safe at scale; the paired pytest fails on any new, un-argued hit.
_BCAST_SCALAR = (
    "crossJoin(broadcast(<1-row aggregate>)): attaching a scalar "
    "(corpus size / total count) to every row — the broadcast side is "
    "exactly one row, so the nested-loop join does |rows| x 1 work"
)
_BCAST_PROBES = (
    "crossJoin(broadcast(probes)): brute-force scoring against a "
    "broadcast probe subset — |corpus| x |probes| compare work is the "
    "DECLARED exact baseline these queries exist to provide; the "
    "IVF/sign-LSH variants (q_similarity_ivf*, q_dedup_embedding_lsh) "
    "are the 100 TB path and stay bucket-equi-joined"
)
ALLOWLIST: dict[str, dict[str, str]] = {
    "q_text_tfidf": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_text_logprob": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_text_logprob_bigram": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_text_logprob_kn": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # each PageRank round re-attaches the 1-row node-count scalar
    # (the (1-d)/N teleport term) — scalar broadcasts, rounds-bounded
    "q_token_pagerank": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # calibration scores the corpus signature scan (8 ints/doc)
    # against the broadcast sample-probe signatures — the estimator
    # eval runs on a probe sample by design
    "q_minhash_calibration": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    "q_cooc_pmi": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_mixture_weights": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_sample_temperature": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_similarity_topk": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    "q_similarity_topk_int8": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    "q_similarity_rerank": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # ADC scores the CODES scan against each probe's broadcast LUT —
    # same broadcast-probes shape, plus the corpus side reads 4-int
    # codes instead of the float vectors
    "q_similarity_pq_adc": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # the recall evaluation's EXACT leg is the brute-force baseline
    # (broadcast probes by construction); the approx leg equi-joins
    "q_ann_recall": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r8: NDCG shares the recall row's scaffold — exact brute leg
    # (broadcast probes), IVF-bucketed approx leg (equi-join)
    "q_retrieval_ndcg": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    "q_retrieval_mrr": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r9: MAP shares the recall/NDCG scaffold — exact brute leg
    "q_retrieval_map": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r8: PSI attaches the 1-row (t_old, t_new, n_cells) totals to the
    # cells-sized occupancy table — constant-size regardless of corpus
    "q_embedding_drift_psi": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_text_drift_psi": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_bm25_topk": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # the BM25 leg inside the RRF fusion carries the same scalar
    # N/avgdl broadcast attaches
    "q_hybrid_retrieval_rrf": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # the composed retrieval flagship carries the same BM25 scalar
    # attaches; its dense leg is the IVF-PQ equi-join (no BNLJ there)
    "q_retrieval_pipeline": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_dedup_embedding": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r8: kNN vote and hard-negative mining score against the broadcast
    # probe subset via the same brute-force baseline (cosine_topk);
    # their IVF swap is the same bucket equi-join as q_similarity_ivf
    "q_knn_classify": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    "q_hard_negatives": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r8: DSIR attaches the 1-row (N_target, N_raw) totals to the
    # 256-row bucket spine when building the log-ratio table — both
    # crosses are constant-size regardless of corpus
    "q_dsir_select": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # the sources x sources pair frame plans as CartesianProduct or
    # BroadcastNestedLoopJoin depending on estimated sizes — same join,
    # both sides are per-SOURCE aggregates (|sources| rows, ~tens), not
    # per-document; O(|sources|^2) pairs is the output itself
    "q_source_overlap": {
        "CartesianProduct": "sources x sources pair frame (see above)",
        "BroadcastNestedLoopJoin": "sources x sources pair frame (see above)",
    },
    # referential_orphans attaches the 1-row total count to the 1-row
    # orphan count (two single-row aggregates crossed — 1 x 1 work)
    "q_data_quality": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # each power round re-attaches the 1-row max-norm scalar, and the
    # final select crosses the 64-row vector with the two 1-row
    # normalization scalars (s2, Rayleigh numerator) — all
    # constant-size regardless of corpus; the only data-sized join is
    # the vec_id-keyed Gram self-join (equi)
    "q_embed_pca_power": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # attaches the 1-row pooled count N for the pos = p*(N-1)+1 math
    "q_quantile_normalize": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # attaches the 1-row pooled token total for q = c/N
    "q_source_divergence": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r9: KS attaches the 1-row (n_old, n_new) totals to the
    # distinct-value CDF table (domain-bounded, not corpus-bounded)
    "q_ks_drift": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r9: W1 drift — same scalar-totals attach as KS
    "q_wasserstein_drift": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r9: vocab growth attaches the 1-row id-domain size for the
    # decile DIV bucketing — scalar, corpus touched by two aggregates
    "q_vocab_growth": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10: keyness attaches the 1-row (na, nb) totals to the
    # vocab-sized count table — scalar
    "q_keyness_llr": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10: mutual-NN is cosine_topk on the audit PANEL twice — the
    # same broadcast-probes brute leg as q_similarity_topk
    "q_mutual_nn": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r10: weighted containment attaches the 1-row corpus-size scalar
    # for the idf; pair generation itself is the shingle equi-join
    "q_weighted_containment": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10: component split attaches the 1-row n_leaks self-check to
    # the 3-row split summary — scalar
    "q_component_split": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10: per-source KS crosses the group list with the DISTINCT-value
    # spine (domain-bounded, the ks_two_sample contract) and attaches
    # the 1-row corpus total — both constant-size vs ingested bytes
    "q_source_ks_drift": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10: calibration is all-pairs WITHIN the audit panel by
    # construction — the broadcast side is the bounded panel
    "q_srp_calibration": {"BroadcastNestedLoopJoin": _BCAST_PROBES},
    # r10: FDR inherits per-source KS's spine/total attaches plus its
    # own 1-row kmax — all scalar/domain-bounded
    "q_source_ks_fdr": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: chi2 crosses the two LEVELS-sized marginal tables
    # (dense contingency grid — categories, never keys) and attaches
    # the 1-row total + 1-row level counts — all levels/scalar-bounded
    "q_chi2_independence": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: ANOVA attaches the 1-row (k, n, s) grand totals to
    # the groups-sized table — scalar
    "q_anova_length": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r12: KW attaches the 1-row (k, N) totals + the 1-row tie sum to
    # the groups-sized frame; Levene-BF is anova_oneway (same scalar
    # attach); KM attaches the 1-row censoring cutoff to the users
    # frame — all constant-size regardless of corpus
    "q_kruskal_wallis": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_levene_bf": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_survival_km": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    "q_survival_km_cohort": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r12: the censoring-cutoff scalar attach, plus (logrank only) the
    # cohorts x durations dense spine — a types-sized distinct crossed
    # with the bounded pooled-duration spine (the q_source_overlap
    # bounded-product class), never a per-session frame
    "q_survival_logrank": {
        "BroadcastNestedLoopJoin": _BCAST_SCALAR,
        "CartesianProduct": (
            "cohorts x durations dense spine: types-sized x "
            "bounded-duration-domain product (the q_source_overlap "
            "class), required so every cohort has an at-risk count at "
            "every pooled event time"
        ),
    },
    # r13: the composed survival report inherits the trio's scalar
    # attaches (censoring cutoff on the shared frame; logrank's dense
    # spine lives post-checkpoint so only the BNLJ class surfaces) —
    # covers both the readout plan and the pre-checkpoint
    # session_frame stage row (stage rows fall back to the parent)
    "q_survival_report": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13: the point-in-time snapshot attaches the 1-row stream-midpoint
    # instant to the interval table (the documented scalar class)
    "q_scd2_snapshot": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: Kendall crosses the two DISTINCT-band spines (dense
    # bounded joint grid — the histogram-first design's whole point)
    # and attaches 1-row pair/tie totals — domain/scalar-bounded
    "q_kendall_tau": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: Benford attaches the 1-row digit total to the 9-row
    # spine — scalar
    "q_benford_digits": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: the drift report attaches the 1-row (n_old, n_new)
    # totals and 1-row band count to the domain-bounded histogram —
    # scalar (the q_ks_drift/q_text_drift_psi attaches, composed)
    "q_drift_report": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: the load profile attaches the 1-row event total to
    # the dense 168-cell spine — scalar
    "q_load_profile": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: the events report attaches the 1-row mix total and
    # 1-row max-week to cube-derived tables; the retention offsets dim
    # is a literal 4-row range — all scalar/parameter-bounded
    "q_events_report": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: Moran's I crosses the cells table with the LITERAL
    # 4-row rook-offset dim and attaches 1-row mean/total scalars; the
    # neighbor join itself is a hash equi-join on computed coordinates
    "q_spatial_moran": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 2: RFM attaches the 1-row 12-quintile threshold table
    # to the users-sized metric table — scalar
    "q_user_rfm": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 3: the bootstrap crosses per-user flags with the
    # LITERAL 64-row replicate dim and attaches the 1-row point
    # estimate + 1-row CI — parameter/scalar-bounded
    "q_funnel_bootstrap_ci": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r10 wave 4: the sliding-distinct MAU crosses (user, day) pairs
    # with the LITERAL 28-row offset dim — parameter-bounded
    "q_dau_mau_stickiness": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11: balanced downsample attaches the 1-row n_min scalar to the
    # ranked manifest — scalar
    "q_balanced_downsample": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11: windowed drift crosses the WINDOWS spine (time-bounded) with
    # the literal reference histogram (domain-bounded via the rq_digits
    # guard, built once by drift_ref_hist) — both sides bounded
    # regardless of corpus size; the corpus is touched by exactly one
    # hash aggregate
    "q_window_drift": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11w2: temporal split attaches the 1-row percentile-boundary pair
    "q_temporal_split": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11w2: bootstrap fans out over the LITERAL 64-row replicate dim
    # and attaches the 1-row point-estimate totals — parameter/scalar
    "q_bootstrap_mean_diff": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11w2: coverage joins the 3-row cutoff dim against the 1000-row
    # TakeOrdered head on a theta condition (rnk <= cutoff) plus the
    # 1-row totals — all parameter-bounded
    "q_coverage_curve": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r11w2: JSD attaches the 1-row corpus token total
    "q_js_divergence": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: heavy hitters attaches the 1-row stream total to the
    # candidate recount (the MapInPandas sketch pass is the DECLARED
    # Arrow op — fixed O(k) state, the operator's whole point)
    "q_heavy_hitters": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: basket pair support attaches the 1-row basket count
    "q_basket_pairs": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: same scalar attach on the events-surface basket instance
    "q_session_baskets": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: association rules attach the same 1-row basket count to
    # the rule table (marginals join by hash-equi broadcast)
    "q_assoc_rules": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: the chi2 screen is arithmetic over that same rule table
    "q_assoc_rules_chi2": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: HLL set algebra crosses four 1-row frames (three register
    # estimates + the exact reference) — all scalar
    "q_hll_intersection": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
    # r13w2: DiD attaches the 1-row stream-midpoint instant (the SCD2
    # scalar class)
    "q_diff_in_diff": {"BroadcastNestedLoopJoin": _BCAST_SCALAR},
}

#: plan substrings that fail the audit outright
FATAL = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_one(name: str, plan: str) -> dict:
    hits = [p for p in FATAL if p in plan]
    # stage rows (``q_x::stage``) fall back to the parent query's
    # allowlist: a stage plan is a PREFIX of plans already argued there
    allowed = ALLOWLIST.get(name) or ALLOWLIST.get(name.split("::")[0], {})
    fatal = [h for h in hits if h not in allowed]
    return {
        "fatal": fatal,
        "allowed": sorted(set(hits) & set(allowed)),
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "python_arrow_ops": len(
            re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan
            )
        ),
        # the checkpoint scar: lineage above an ExistingRDD scan is
        # truncated, so this plan's exchange count UNDERCOUNTS the work
        # the query pays — the pre-checkpoint stages appear as separate
        # ``<query>::<stage>`` rows (VERDICT r10 Next #3)
        "checkpointed": "ExistingRDD" in plan,
    }


def run_audit(spark, sf_dir: str, registry) -> dict[str, dict]:
    from mhw3d_detection_spark.plans import audit_hook

    out = {}
    for name, qd in registry.items():
        audit_hook.SINK = sink = []
        try:
            plan = executed_plan(qd.spark_fn(spark, sf_dir))
        except Exception as e:  # plan build itself failing is fatal too
            out[name] = {"fatal": [f"plan build error: {e}"[:200]]}
            continue
        finally:
            audit_hook.SINK = None
        out[name] = audit_one(name, plan)
        # pre-checkpoint stage plans offered by plans.audit_hook.ckpt;
        # a stage name recorded twice in one build (e.g. the curation
        # funnel's two connected-components passes) gets a #2/#3
        # suffix so no captured plan is silently overwritten
        # (code-review r11 #7)
        seen: dict[str, int] = {}
        for stage, sdf in sink:
            seen[stage] = seen.get(stage, 0) + 1
            suffix = f"#{seen[stage]}" if seen[stage] > 1 else ""
            sname = f"{name}::{stage}{suffix}"
            try:
                out[sname] = audit_one(sname, executed_plan(sdf))
            except Exception as e:
                out[sname] = {"fatal": [f"stage plan error: {e}"[:200]]}
            out[sname]["stage_of"] = name
    return out


def main() -> int:
    from mhw3d_detection_spark import queries as Q
    from mhw3d_detection_spark.session import get_spark

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    results = run_audit(spark, sf_dir, Q.REGISTRY)
    bad = {k: v for k, v in results.items() if v["fatal"]}
    for name, r in sorted(results.items()):
        status = "FAIL" if r["fatal"] else "pass"
        extra = f" FATAL={r['fatal']}" if r["fatal"] else ""
        print(
            f"{status}  {name:32s} exchanges={r.get('exchanges', '?')} "
            f"arrow_ops={r.get('python_arrow_ops', 0)}{extra}"
        )
    print(f"\n{len(results)} plans audited, {len(bad)} fatal")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
