"""Physical-plan audit for every declared query: catches the anti-patterns
that are invisible at sf0.01 but fatal at 100 TB.

Checks per query (at the given SF, default sf0.01 — plan shape, not timing):

- **single-partition window**: a WindowExec with an empty partition spec
  funnels all rows through one task (round-1 flag on the top-N queries);
- **nested-loop join**: BroadcastNestedLoopJoin / CartesianProduct means an
  inequality join degenerated — at scale this is O(n·m);
- **pushdown**: every parquet scan of a table the query filters by time must
  show a non-empty PushedFilters (the ns-twin trick exists for this);
- **python in the plan**: BatchEvalPython (row-at-a-time UDF) is always a
  bug; ArrowEvalPython/MapInPandas are allowed only for the two justified
  dynamic-schema/media paths;
- **scan width**: ReadSchema listing more columns than the query projects
  (column pruning failure).

Exit 1 if any query violates; allowlists document the accepted exceptions.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

#: queries allowed to contain Arrow-batched Python (documented mapInPandas
#: paths: dynamic JSON flatten, media decode, and the IVF centroid-argmin
#: matmul kernel — dense linear algebra that interpreted SQL higher-order
#: functions evaluate ~100× slower; see similarity._ivf_assign_expr).
ARROW_ALLOWED = {
    "flatten_amqp",
    "json_flatten",
    "multimodal_features",
    "frame_sample",
    # real-codec media paths (r9): WAV PCM16 encode/decode round-trip and
    # BMP/WAV container synthesis + header sniffing — genuine binary codec
    # work that SQL cannot express; all Arrow-batched, no row-at-a-time UDFs
    "audio_fingerprints",
    "audio_scale_match",
    "audio_neardup_pairs",
    "media_sniff_meta",
    "image_dhash_bmp",
    # same BMP decode path, run under on_error='null' over the planted
    # NULL/corrupt corpus (the fail-soft gate, r10)
    "image_dhash_nulls",
    "image_thumbnails",
    "video_frame_luma",
    "video_shot_cuts",
    # AVI synth + per-frame decode->dHash (r10 video near-dup) — the codec
    # stage; signature fold, banded join, and overlap verify are all JVM
    "video_neardup_pairs",
    # same AVI synth + decode stage feeding the online media sink's video
    # fingerprint callable (r11); probe/growth stay JVM
    "streaming_video_neardup_check",
    "semantic_dedup",
    "ann_cosine_ivf",
    "pq_recall",
    # holt_winters_forecast's coupled level/trend recurrence is the one
    # justified dense-recurrence Python path (operator docstring) — ONE
    # Arrow group per series over the calendar-bounded bucket grid
    "holt_forecast_check",
    # first-fit packing is a sequential fold with open-bin state (a window
    # cannot reset an accumulator per bin) — ONE Arrow stage per hash
    # group, group size bounded by corpus_items / n_groups (r11)
    "pack_sequences_check",
    # r11 optimization: byte_dhash_df/byte_ahash_df vectorized as ONE
    # mapInArrow numpy pass (cumsum over the batch's contiguous UTF-8
    # buffer -> all 66 segment sums as O(1) subtractions) — measured ~4x
    # faster than the 66 interpreted aggregate folds, bit-identical
    # (tests/test_round11_opt.py); still a narrow shuffle-free map over
    # the scan, only (id, text) crosses the boundary
    "dhash_docs",
    "dhash_variant_pairs",
    "dhash_dedup_clusters",
    "cross_modal_dups",
    "dhash_ahash_vote_pairs",
    "streaming_dhash_check",
}

#: queries where a broadcast nested-loop join is the intended plan; every
#: entry must state why the broadcast side is BOUNDED (that's what makes a
#: nested loop safe at scale).
NESTED_LOOP_ALLOWED: set[str] = {
    # scalar-subquery pattern: the broadcast side is the 1-row max-ts bound
    "relative_range",
    # by design: bounded query batch broadcast against the partitioned
    # corpus with a non-equi self-exclusion / label-mismatch predicate
    "ann_cosine_topk",
    "hard_negatives",
    # same shape: the semantic branch broadcasts the 1-row query vector
    # against the corpus before the rank fusion (r6 third batch)
    "hybrid_rrf_topk",
    # 1-row × 1-row crossJoin of two scalar count aggregates (the summary
    # shape the gate needs) — both sides are single-row by construction
    "dedup_resolve",
    "training_prep_summary",
    # 1-row scalar broadcasts: the corpus token total (unigram_nll) and the
    # mixture size bound S = min(n_d/w_d) (mixture_sample) — each a single
    # aggregate row crossJoined onto a |domains|- or vocab-sized side
    "unigram_nll",
    "mixture_sample",
    # 1-row scalar broadcast: corpus totals (N_all, N_tgt, vocab) crossJoined
    # onto the vocab-sized counts frame — keeps DSIR one job (r6)
    "dsir_topk",
    # 1-row × 1-row crossJoin: the point-estimate aggregate broadcast onto
    # the 1-row CI-endpoint aggregate (r6 session 4)
    "bootstrap_ci_mean",
    # 1-row scalar broadcast: the corpus-midpoint timestamp (the relative_
    # range pattern) crossJoined onto the scan before the per-user groupBy
    "cuped_adjust",
    # 1-row scalar broadcast: the positive-balance average crossJoined onto
    # customer before the anti join (Q22 shape)
    "idle_customers",
    # 1-row scalar broadcast: the corpus max-ts recency anchor crossJoined
    # onto the per-user RFM aggregate (r6)
    "rfm_segments",
    # 1-row × 1-row crossJoin of the two window-union theta sketches
    "user_retention",
    # 1-row scalar broadcast: the total-hit count crossJoined onto the
    # 20-row per-query recall frame (round-4/5 recall-encoded gates)
    "ann_cosine_ivf",
    "pq_recall",
    # 1-row scalar broadcast: the (total, Z=Σn^α) normalizer crossJoined
    # onto the |domains|-row count table (bounded dimension, round 4)
    "temperature_mix",
    # 1-row scalar broadcast: the basket-count frame crossJoined onto the
    # pair-count table for support/lift denominators (r6 third batch)
    "part_affinity",
    # 1-row scalar broadcast: the 9 decile boundaries crossJoined onto the
    # corpus scan (the alternative — a global NTILE window — is the real
    # scale anti-pattern this query avoids)
    "length_deciles",
    # 1-row scalar broadcast: the (total value, part count) aggregate
    # crossJoined onto the per-part aggregate (Q11's scalar subquery)
    "important_parts",
    # 1-row × 1-row crossJoin: merged-sketch quantiles/distincts against
    # the exact aggregates (round-4 merge-path gates)
    "merged_quantiles_check",
    "merged_distinct_check",
    # 1-row scalar broadcasts: corpus token/bigram totals (Nu, Nb)
    # crossJoined onto the distinct-bigram frame
    "bigram_pmi",
    # 1-row scalar broadcast: the global (tmin,tmax,vmin,vmax) span row
    # crossJoined onto the fact scan to derive shared bins
    "ks_drift",
    # 1-row scalar broadcast: (n_keys, total_rows, p50) context crossJoined
    # onto the ≤top-k heavy-hitter frame
    "key_skew_report",
    # 1-row scalar broadcasts: the octile-boundary array (value_heatmap)
    # and the corpus baseline error rate (error_burn_rate) crossJoined
    # onto the scan / hourly frame
    "value_heatmap",
    "error_burn_rate",
    # 1-row scalar broadcasts: the L1 normalizer totals (Ta, Th) crossJoined
    # onto the node-sized score frames, twice per HITS iteration (r6 fourth
    # batch; same bounded-scalar contract as the DSIR totals)
    "hits_trade",
    # bounded-grid crossJoin: |event_type|×|hour| = 5×24 category marginals
    # build the full contingency grid (zero cells must contribute their
    # expected mass), plus the 1-row totals broadcast (r6 fourth batch)
    "chi2_event_hour",
    # 1-row scalar broadcast: the (min,max) value span crossJoined onto the
    # per-customer revenue frame for range bucketing (r6 fourth batch)
    "revenue_gini",
    # 1-row scalar broadcast: the corpus-max timestamp (censoring anchor)
    # crossJoined onto the per-user lifetime aggregate (r6 fourth batch)
    "survival_km",
    # 1-row × 1-row crossJoins: the three quantized-term sums (MI, H(A),
    # H(B)) and the 1-row total — all single-row aggregates by construction
    # (r6 session 5; same bounded-scalar contract as chi2_event_hour)
    "mi_event_hour",
    # bounded-grid crossJoin: the 7-row lag frame fanned over the hourly
    # BUCKET grid (the fact already collapsed to bucket means) — ≤ 7×8 760
    # rows/year regardless of data size (r6 session 6)
    "lead_lag_corr",
    # 1-row scalar broadcast: the global (n, Σ) target totals crossJoined
    # onto the |categories|×folds grid (r6 session 6)
    "target_encode_oof",
    # bounded-grid crossJoin: |sources| × |length-buckets| grid (every
    # group must carry the buckets it LACKS — they contribute q·ln2
    # mass) plus the 1-row corpus total; the chi2_event_hour contract
    # (r6 session 7)
    "js_drift",
    # 1-row scalar broadcast: the corpus row total crossJoined onto the
    # (group, grid-value) cell frame (r6 session 8)
    "quantile_normalize_check",
    # 1-row scalar broadcast: the corpus-midpoint instant crossJoined
    # onto the interval-count-sized SCD2 frame (the cuped_adjust /
    # relative_range pattern) (r6 session 8)
    "scd2_snapshot",
    # 1-row scalar broadcast: the corpus-midpoint instant crossJoined
    # onto the melted scan before the combinable slice aggregate
    # (r6 session 9)
    "change_contribution",
    # 1-row × 1-row crossJoin: the (n, diag) totals against the Σ row·col
    # marginal product — both single-row aggregates by construction (r7)
    "lang_id_kappa",
    # bounded-grid crossJoins: the 1-row (min,max) span broadcast onto the
    # fact scan (the ks_drift pattern) and the |sources| × 50-bucket dense
    # grid (absent buckets must carry the corpus CDF — the js_drift
    # contract) (r7); t_closeness_events composes w1_drift with a QI key,
    # same shape (r8)
    "w1_chars_drift",
    "t_closeness_events",
    # 1-row scalar broadcast: the corpus-midpoint instant crossJoined onto
    # the scan (the cuped_adjust pattern) (r7)
    "did_launch_value",
    # 1-row scalar broadcast: the Σ n_h·s_h weight total crossJoined onto
    # the |strata|-sized frame (the temperature_mix contract) (r7)
    "neyman_value_alloc",
    # 1-row × 1-row crossJoin: the (n_subjects, Σn²) aggregate against the
    # Σ category-margin² aggregate — both single-row by construction, the
    # lang_id_kappa contract (r8)
    "event_fleiss_kappa",
    # 1-row scalar broadcast: the one-way random-effects fit scalars
    # (G, N, S, SSB, SSW, Σn²/N) crossJoined back onto the group frame —
    # the temperature_mix/neyman contract (r8)
    "eb_user_value",
    # 1-row × 1-row crossJoins: the intra-edge count, the Σdeg_c² reduce
    # and the node count — all single-row aggregates by construction (r8)
    "nation_modularity",
    # 1-row scalar broadcast: the (k, N, ΣS) action-frame totals
    # crossJoined back onto the |actions|-row frame (r8)
    "ips_event_value",
    # bounded-grid crossJoin: the |probs| (4-row) literal frame fanned
    # over the quantization-bounded value grid (r8)
    "qte_value",
    # 1-row scalar broadcast: the corpus-midpoint instant crossJoined
    # onto the scan (the cuped_adjust/did_launch_value pattern) (r8)
    "paired_t_value",
    # bounded-grid crossJoin: the |x-grid| × |y-grid| dense contingency
    # frame (the chi2_event_hour contract — zero cells must carry the
    # exclusive 2-D cumulatives) plus two 1-row tie-term broadcasts (r8)
    "kendall_tau_value_hour",
    # 1-row scalar broadcast: the corpus-max censoring anchor crossJoined
    # onto the per-user lifetime aggregate (the survival_km contract) (r8)
    "nelson_aalen_hazard",
    # survival_km censoring anchor + the 2×|day-grid| dense frame (zero
    # cells must carry the per-group cumulatives) + the 1-row subject-
    # count × 1-row test-statistic crossJoin (r8)
    "logrank_survival",
    # 1-row scalar broadcasts: the corpus-midpoint instant onto the scan
    # (cuped_adjust pattern), the unit total onto the score grid, and the
    # 9-boundary row onto the unit frame (the length_deciles contract) (r8)
    "value_decile_lift",
    # 1-row scalar broadcasts: the max-doc-id range-bucket bound onto the
    # scan, and the 1-row doc count onto the 1-row OLS reduce (r8)
    "heaps_law_fit",
    # 1-row scalar broadcast: the (n, P) totals crossJoined onto the
    # ≤(quant+1)-row forecast-group frame (the temperature_mix contract)
    # (r8)
    "brier_decomposition",
    # 1-row × 1-row crossJoin: the per-group reduce against the 1-row
    # tie-term aggregate (the mi_event_hour contract) (r8 late births)
    "kruskal_value_type",
    # 1-row scalar broadcasts: the corpus-midpoint instant onto the scan
    # (cuped_adjust pattern) and the 1-row base-gap aggregate onto the
    # |periods|-row frame (r8 late births)
    "event_study_weekly",
    # bounded-grid crossJoin: the |groups| × top-50 vocabulary dense
    # frame (absent terms must carry rate 0 — the js_drift contract)
    # (r8 late births)
    "burrows_delta",
    # 1-row scalar broadcast: the corpus token total crossJoined onto the
    # vocab frame for per-term surprisal (the unigram_nll contract)
    # (r8 late births)
    "doc_novelty",
    # k-row centroid broadcast crossJoined onto the vectors (k = label
    # count, bounded — the ann_cosine_topk query-batch contract)
    # (r8 late births)
    "label_silhouette",
    # 1-row scalar broadcast: the corpus token total crossJoined onto the
    # vocab cell frame for the Dirichlet prior (the unigram_nll contract)
    # (r8 late births)
    "fightin_words",
    # 1-row scalar broadcasts: the (total, n_units) reduce and the 1-row
    # boundary-cell pick crossJoined onto the value grid (r8 late births)
    "revenue_concentration",
    # 1-row scalar broadcast: the corpus-max censoring anchor crossJoined
    # onto the per-user lifetime aggregate (the survival_km contract)
    # (r8 late births)
    "rmst_lifetime",
}

#: queries whose windows legitimately run unpartitioned over BOUNDED input
#: (post-limit top-k rank assembly is ≤ k rows; 1-row aggregates).
GLOBAL_WINDOW_ALLOWED: set[str] = {
    # trailing-6h window over the HOURLY aggregate — one row per hour
    # (8 760/year), calendar-bounded like the gapfill bucket summaries;
    # the fact table never passes through the window
    "error_burn_rate",
    # deterministic re-rank of the exploded approx_top_k sketch — input is
    # ONE aggregate row exploded to ≤100 items
    "approx_top_terms",
    # cumulative-offset window over the n_buckets-sized (≤1024 row) bucket
    # count frame — the two-level distributed ranking's bounded metadata
    # pass; the per-row rank window partitions BY BUCKET (r6 fourth batch)
    "revenue_gini",
    # Kaplan–Meier at-risk/survival windows run over the LIFETIME-DAY grid
    # (≤ span/86400 rows — calendar-bounded like the gapfill summaries),
    # never the per-user rows (r6 fourth batch)
    "survival_km",
    # percentile-rank window over the REPLICATE-MEAN frame — exactly b
    # (=100) rows regardless of data size; the fact table only passes
    # through a combinable groupBy(replicate) (r6 session 4)
    "bootstrap_ci_mean",
    # cumulative-moment and running-min windows over the DAY grid (one
    # experiment = one timeline; ≤ 10⁴ rows for a 30-year test) — the
    # fact only passes through a combinable per-day aggregate
    # (r6 session 6)
    "msprt_monitor",
    # keyless cumulative window over the global VALUE-GRID frame
    # (value-cardinality-bounded, the winsorized_mean histogram
    # contract) — the fact only passes through a combinable
    # (group, grid) aggregate (r6 session 8)
    "quantile_normalize_check",
    # the batch-twin side's cumulative window over the DAY grid (the
    # msprt_monitor contract: one experiment = one timeline) — the fact
    # only passes through a combinable per-day aggregate (r6 session 8)
    "streaming_msprt_check",
    # rank window over the POST-LIMIT top-200 term frame (≤ top_n rows by
    # construction — the approx_top_terms contract); the fact only passes
    # through a combinable term-count aggregate (r7)
    "zipf_slope",
    # exclusive-cumulative window over the quantized SCORE GRID — size
    # bounded by (max−min)·quant + 1 (≤ ~56k at quant=100 for the events
    # value range), quantization-bounded, never data-sized (the
    # winsorized_mean / quantile_normalize value-grid contract) (r7)
    "auc_purchase_value",
    # keyless cumulative over the ≤n_buckets (50) corpus-bucket frame —
    # grid-bounded; the per-group CDF windows partition BY GROUP (r7);
    # t_closeness_events composes w1_drift with a QI key, same shape (r8)
    "w1_chars_drift",
    "t_closeness_events",
    # keyless exclusive cumulatives over the two quantization-bounded
    # value grids ((max−min)·quant+1 rows) — the auc_purchase_value
    # value-grid contract (r8)
    "spearman_value_hour",
    # keyless cumulatives over the bounded lifetime DAY grid (≤ corpus
    # span in days) — the survival_km contract (r8)
    "nelson_aalen_hazard",
    # keyless cumulative over the 32-row prefix-bucket frame (bounded by
    # the n_buckets constant, never data-sized) (r8)
    "heaps_law_fit",
    # keyless cumulative over the quantization-bounded score grid for
    # the exact-rank boundaries, plus two ≤10-row decile-frame windows
    # (r8)
    "value_decile_lift",
    # keyless exclusive cumulatives over the quantization-bounded
    # combined value grid (the spearman/auc midrank contract) (r8 late
    # births)
    "mann_whitney_value",
    "kruskal_value_type",
    # keyless DESC cumulative over the quantization-bounded per-unit
    # revenue grid (the winsorized_mean contract) (r8 late births)
    "revenue_concentration",
    # keyless cumulative/lag windows over the bounded lifetime DAY grid
    # (the survival_km contract) (r8 late births)
    "rmst_lifetime",
}


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups at the start of a plan node's argument
    list (stops at the first non-group token)."""
    depth = 0
    groups: list[str] = []
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        elif depth == 0 and ch not in ", ":
            break
        if depth >= 1:
            cur.append(ch)
    return groups


def _is_order_spec(group: str) -> bool:
    return " ASC" in group or " DESC" in group


def audit_plan(name: str, plan: str) -> list[str]:
    problems = []
    for line in plan.splitlines():
        # Window renders [exprs], [partitionSpec], [orderSpec] — with no
        # partition spec the order spec moves into slot 2 (ASC/DESC marks
        # it).  WindowGroupLimit renders [partitionSpec], [orderSpec], fn, k
        # — global form starts directly with the order spec.
        m = re.search(r"\bWindow (\[.*)$", line)
        if m:
            g = _bracket_groups(m.group(1))
            if len(g) == 2 and _is_order_spec(g[1]) and name not in GLOBAL_WINDOW_ALLOWED:
                problems.append("single-partition global Window")
                break
        m = re.search(r"\bWindowGroupLimit (\[.*)$", line)
        if m:
            g = _bracket_groups(m.group(1))
            if g and _is_order_spec(g[0]) and name not in GLOBAL_WINDOW_ALLOWED:
                problems.append("single-partition global WindowGroupLimit")
                break
    if (
        "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    ) and name not in NESTED_LOOP_ALLOWED:
        problems.append("nested-loop/cartesian join")
    if "BatchEvalPython" in plan:
        problems.append("row-at-a-time Python UDF (BatchEvalPython)")
    if (
        "ArrowEvalPython" in plan or "MapInPandas" in plan
        or "MapInArrow" in plan or "FlatMapGroupsInPandas" in plan
    ) and name not in ARROW_ALLOWED:
        problems.append("unexpected Python stage (Arrow)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from cerebro_spark.session import get_spark

    spark = get_spark("plan-audit", shuffle_partitions=16)
    qs = entry.queries()
    bad = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            bad[name] = [f"plan build error: {e}"]
            continue
        problems = audit_plan(name, plan)
        if problems:
            bad[name] = problems
            print(f"WEAK {name}: {problems}")
        else:
            print(f"ok   {name}")
    if bad:
        print(f"\n{len(bad)} weak plans: {sorted(bad)}")
        sys.exit(1)
    print("\nall plans clean")


if __name__ == "__main__":
    main()
