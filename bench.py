"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints, as the
FINAL stdout line, ONE constant-size JSON record:
{"metric": ..., "value": N, "unit": "sec", "sf": ..., "n_queries": N}.
Per-query timings and all raw runs are printed on earlier "detail" lines
(consumed by tools/bench_diff.py) — the driver tail-captures only the last
2000 chars, so the final line must never grow with the query count.

Execution is materialized JVM-side via the noop sink (no Python collect
overhead in the measurement) — the measured cost is scan + transform + shuffle,
i.e. what a cluster run would pay.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: queries included in the headline number (a representative slice: flagship
#: chain, window family, dedup, pivot, joins, agg, extensions).
HEADLINE = [
    # reference-parity chains
    "weather_chain",
    "rolling_value",
    "dedup_by_second",
    "pivot_event_type",
    "downsample_1h",
    "pricing_summary",
    "revenue_by_nation",
    "top_unshipped",
    "client_query",
    # TSDB verbs
    "derivative",
    "downsample_gapfill",
    "sessionize",
    "interpolate_linear",
    # LLM-pipeline extensions
    "dedup_exact",
    "ngram_jaccard",
    "minhash_signatures",
    "ann_cosine_topk",
    "text_profile",
    "multimodal_features",
    "tfidf_top_terms",
    "chunk_documents",
    "dedup_resolve",
    "repetition_profile",
    "unigram_nll",
    "pack_tokens",
    "semantic_dedup",
    "chunk_dedup",
    "dup_spans",
    "vocab_encode",
    "epoch_shuffle",
    # retrieval / record linkage / graph / data selection (round 6)
    "bm25_topk",
    "fuzzy_part_pairs",
    "pagerank_trade",
    "dsir_topk",
    "rfm_segments",
    "event_transitions",
    # volume + time-series joins
    "top_suppliers",
    "asof_join",
    "range_join",
    "market_share_by_year",
    "small_qty_revenue",
    "idle_customers",
    "user_retention",
    # round-4 additions
    "winnow_overlap",
    "profit_by_nation_year",
    "cohort_retention",
    # round-5 additions
    "ohlc_6h",
    "twa_6h",
    "mad_outliers",
    "ks_drift",
    "bigram_pmi",
    "cusum_alerts",
    "session_stats",
    "seasonal_decompose",
    # round-6 additions: >=1 query per remaining operator family, so a
    # perf regression in the newest operators can't hide outside the
    # headline (VERDICT r4 #6)
    "bpe_merge_candidates",   # BPE merge counting
    "packing_efficiency",     # sequence-packing diagnostics
    "temperature_mix",        # mixture temperature weights
    "rsi_14",                 # momentum indicators
    "bollinger_20",           # rolling bands
    "value_corr_matrix",      # pairwise correlation
    "value_heatmap",          # 2-D histogram
    "minhash_lsh_pairs",      # banded LSH candidate join
    "simhash_pairs",          # pigeonhole Hamming join
    "winnow_fingerprints",    # MOSS winnowing
    "approx_users_daily",     # HLL sketch rollup
    "asof_join_nearest",      # keyless as-of (two-level bucketed carry)
    # born round 6: stateful-streaming twin (full availableNow replay with
    # checkpoint + memory sink inside the query — measures the streaming
    # engine path, like streaming_ingest below)
    "streaming_ohlc_6h",
    # round-6 third batch: graph analytics + hybrid retrieval (warm
    # best-of-2 at sf0.1: 2-5 s each — the iterative/wedge costs are the
    # algorithms' real work, in line with dedup_resolve/simhash_pairs)
    "supplier_overlap",       # common-neighbor Jaccard link prediction
    "part_affinity",          # market-basket lift
    "kcore_trade",            # iterative peel to fixpoint
    "lpa_communities",        # label-propagation communities
    "hybrid_rrf_topk",        # BM25 + cosine reciprocal-rank fusion
    "textrank_keywords",      # PageRank over the word co-occurrence graph
    "order_snapshot_diff",    # keyed snapshot diff (one full-outer join)
    "k_anonymity_events",     # governance: quasi-identifier class sizes
    "ppr_trade_recs",         # personalized PageRank recommendations
    "incremental_rollup_check",  # mergeable-state maintenance identity
    # round-6 fourth batch
    "hits_trade",             # HITS hubs/authorities (exact-bigint)
    "reach_3hop",             # bounded-BFS frontier expansion
    "scd2_intervals",         # SCD2 dimension-history build
    "psi_drift",              # population-stability drift score
    "theil_sen_trend",        # robust pairwise-slope median trend
    "benford_profile",        # first-digit conformance audit
    "inverted_postings",      # posting-list build (retrieval structure)
    "window_funnel",          # ordered 3-step funnel (anchored greedy)
    "ewma_level",             # sorted-fold exponential smoothing
    "chi2_event_hour",        # chi-square independence (full grid)
    "revenue_gini",           # two-level distributed-rank Gini
    "funnel_latency",         # per-level time-to-advance
    "prefix_dup_pairs",       # AllPairs prefix-filtered exact Jaccard join
    "phrase_match",           # positional phrase search (top bigram)
    "purchase_attribution",   # last-touch attribution window
    "streaming_deadband_check",  # one-float-state filter vs recursive-CTE twin
    "moments_by_type",        # exact two-pass skewness/kurtosis
    "mann_kendall_trend",     # nonparametric trend significance
    "holt_forecast_check",    # double-exponential forecast vs recursive-CTE twin
    "ab_test_ztest",          # two-proportion experiment significance
    "survival_km",            # Kaplan-Meier over the lifetime grid
    # round-6 session 4: corpus prep / uncertainty / retrieval diversity
    "clean_text_roundtrip",   # regexp-chain text normalization
    "domain_cap_sample",      # per-key cap (window, <=k out per key)
    "bootstrap_ci_mean",      # Poisson-bootstrap CI (100 replicates)
    "cuped_adjust",           # CUPED variance-reduced A/B lift
    "session_incident_overlap",  # interval x interval overlap join
    "calibration_events",     # reliability bins (exact ECE numerators)
    "mmr_rerank",             # greedy diversified top-k re-rank
    "winsorized_value",       # value-grid exact winsorized mean
    "conformal_value",        # split-conformal intervals + coverage
    "embedding_drift",        # exact-numerator half-centroid drift
    "golden_user_record",     # MDM survivorship merge (max_by structs)
    "srm_check",              # sample-ratio-mismatch guardrail
    "streaming_enrich_check", # stream-stream metadata enrichment gate
    "interval_bucket_stats",  # pre-join skew histogram (interval family)
    "vocab_coverage",         # Good-Turing / Chao1 vocabulary saturation
    # round-6 sessions 5-10: every new operator family benches the round
    # it is born (same rule as the correctness gate)
    "mi_event_hour",          # mutual information / NMI effect size
    "audience_overlap",       # per-key set-explode pairwise intersections
    "bloom_semijoin",         # Bloom runtime filter build + zero-shuffle probe
    "sax_motifs",             # PAA + SAX rank-band motif discovery
    "esd_anomalies",          # generalized-ESD rounds, one scan + closed form
    "markov_attribution",     # absorbing-chain removal-effect attribution
    "changepoints_value",     # depth-2 binary-segmentation changepoints
    "lead_lag_corr",          # bucket-grid lead-lag Pearson sweep
    "adamic_adar_links",      # inverted-index AA link prediction
    "target_encode_oof",      # leakage-safe K-fold target encoding
    "jl_distortion",          # 64->16 JL sign projection + norm audit
    "msprt_monitor",          # always-valid sequential A/B p-values
    "spatial_pairs",          # grid-bucketed spatial radius join
    "top_paths",              # first-4-event journey discovery
    "l_diversity_events",     # entropy l-diversity governance audit
    "time_decay_attribution", # exponential-decay multi-touch credit
    "js_drift",               # Jensen-Shannon source-vs-corpus drift
    "info_gain_ranking",      # one-scan multi-feature MI shortlist
    "quantile_normalize_check",  # value-grid exact quantile mapping
    "streaming_msprt_check",  # stateful sequential-test twin gate
    "scd2_snapshot",          # SCD2 point-in-time reconstruction
    "ols_trend",              # one-agg per-key least-squares trend
    "table_fingerprint",      # order-independent reconciliation checksum
    "column_profile",         # one-scan completeness/cardinality audit
    "log_templates",          # exact Drain-style template mining
    "change_contribution",    # early-vs-late slice decomposition
    "trending_daily",         # per-bucket top-k with rank/share
    "weighted_pick_k",        # exact-k weighted sample (ES 2006)
    # round-7 births (born-benched rule)
    "haversine_pairs",        # great-circle radius join (modular lon grid)
    "url_canonical_dedup",    # URL canonicalization + keyed dedup
    "zipf_slope",             # corpus rank-frequency power-law fit
    "auc_purchase_value",     # exact midrank ROC-AUC (score-grid window)
    "lang_id_kappa",          # Cohen's kappa: heuristic vs recorded label
    "w1_chars_drift",         # Wasserstein-1 drift (integral CDF gap)
    "source_ndcg",            # nDCG@10 ranking evaluation
    "did_launch_value",       # difference-in-differences (4 exact cells)
    "neyman_value_alloc",     # Neyman-optimal stratified allocation
    # round-8 births
    "ranker_sign_test",       # paired nDCG sign test (ranker A/B readout)
    "domain_guarded_split",   # registered-domain leakage-guarded split
    "decontaminate_eval",     # train×eval near-dup decontamination join
    "source_mrr",             # MRR@10 known-item retrieval metric
    "event_fleiss_kappa",     # multi-rater chance-corrected agreement
    "mde_value",              # minimum-detectable-effect planning readout
    "bt_brand_strengths",     # Bradley-Terry preference strengths (MM)
    "cms_top_terms",          # count-min sketch vs exact heavy hitters
    "readability_by_source",  # Flesch reading-ease text quality
    "t_closeness_events",     # t-closeness privacy audit (EMD per QI class)
    "fk_integrity",           # referential-integrity orphan audit
    "streaming_cms_check",    # CMS operator streamed == batch == oracle
    "hill_value_tail",        # Hill heavy-tail index (top-k order stats)
    "clustering_parts",       # local clustering coefficient (LCC)
    "lang_fertility",         # tokenizer fertility per language
    "value_dispersion",       # variance-to-mean burstiness per type
    "mcnemar_langid",         # McNemar paired-classifier test
    "eb_user_value",          # empirical-Bayes shrunk per-user means
    "streaming_distinct_check",  # HLL windowed distinct: stream == batch
    "nation_modularity",      # Newman modularity of a metadata partition
    "parts_assortativity",    # degree assortativity (join-skew structure)
    "event_transition_entropy",  # H(next|prev) sequence predictability
    "spearman_value_hour",    # Spearman rank correlation (grid midranks)
    "ips_event_value",        # IPS off-policy value of uniform exploration
    "qte_value",              # quantile treatment effects per p
    "paired_t_value",         # within-user paired t across the launch
    # round-8 second-session births (born-benched rule)
    "kendall_tau_value_hour", # tau-b pair counting on the dense grid
    "anova_value_type",       # one-way ANOVA F + eta-squared
    "theil_index_type",       # Theil T inequality (entropy family)
    "hhi_supplier_share",     # Herfindahl concentration per nation
    "nelson_aalen_hazard",    # cumulative hazard over the day grid
    "logrank_survival",       # two-sample log-rank test
    "value_decile_lift",      # gains/lift table (exact-rank deciles)
    "ttr_by_source",          # type-token + hapax lexical diversity
    "heaps_law_fit",          # vocabulary-growth exponent (32 prefixes)
    "good_turing_unseen",     # unseen-mass corpus coverage
    "brier_decomposition",    # Brier reliability/resolution split
    "mutual_topk_pairs",      # reciprocal top-1 cosine (MNN pairs)
    # round-8 late births (staged below the gate cutoff; born-benched)
    "mann_whitney_value",     # rank-sum test (combined-grid midranks)
    "kruskal_value_type",     # k-group rank ANOVA
    "event_study_weekly",     # DiD parallel-trends readout
    "burrows_delta",          # stylometric source-pair distance
    "ols_value_hour_dow",     # two-regressor OLS
    "yuen_trimmed_value",     # trimmed-mean robust A/B t
    "doc_novelty",            # per-doc surprisal profile
    "label_silhouette",       # centroid silhouette cluster quality
    "fightin_words",          # Dirichlet-prior distinctive terms
    "hill_diversity",         # Hill-number diversity profile
    "purchase_hour_trend",    # Cochran-Armitage ordered trend
    "seasonality_strength",   # seasonal/trend strength readout
    "revenue_per_event_ztest",  # delta-method ratio-metric A/B
    "levene_value_type",      # equal-variance assumption gate
    "forecast_backtest",      # seasonal-naive MASE/sMAPE
    "trade_reciprocity",      # directed-edge reciprocity
    "vocab_jaccard",          # source vocabulary overlap matrix
    "langid_prf1",            # per-class language-ID P/R/F1
    "dedup_savings",          # exact-dup sizing
    "revenue_concentration",  # inverse-Lorenz top-k% readout
    "rmst_lifetime",          # restricted mean survival time
    # r9 multimodal births
    "dhash_docs",             # 60-bit byte-dHash fingerprints
    "dhash_variant_pairs",    # banded Hamming near-dup pairs
    "cross_modal_dups",       # image-dup x text-disjoint composition
    "audio_fingerprints",     # real WAV round-trip fingerprints
    "audio_scale_match",      # gain-invariant fp equi-join
    "media_sniff_meta",       # real BMP/WAV header write+parse
    "image_dhash_bmp",        # real BMP decode -> pixel dHash
    "video_frame_luma",       # real AVI round-trip luma sums
    "image_thumbnails",       # real decode -> exact area-mean resize
    "video_shot_cuts",        # shot-boundary detection
    "audio_neardup_pairs",    # banded near-match audio retrieval
    "dhash_dedup_clusters",   # perceptual dedup end-to-end
    "streaming_dhash_check",  # streamed fingerprints == batch
    # r10 births
    "streaming_media_neardup_check",  # online media dedup sink end-to-end
    "hamming_index_probe",    # persisted Hamming index online lookup
    "image_dhash_nulls",      # fail-soft NULL/corrupt payload pass
    "video_neardup_pairs",    # video dedup: signature -> band -> verify
    "bpe_train_merges",       # 6-round distributed BPE merge learning
    "bpe_fertility_by_lang",  # trained-vocabulary fertility readout
    "dhash_ahash_vote_pairs", # two-vote perceptual precision gate
    "video_dedup_clusters",   # video dedup end-to-end (verify -> CC)
    "wordpiece_train_merges", # WordPiece likelihood-argmax training
    # r11 births
    "bpe_encode_check",       # train + vocab + encode to subword ids
    "pack_sequences_check",   # first-fit sequence packing (Arrow fold)
    "streaming_video_neardup_check",  # video fp wired into the media sink
]


def main() -> None:
    import __spark_entry__ as entry
    from cerebro_spark.session import get_spark

    # shuffle partitions pinned explicitly: AQE still coalesces, but the
    # starting fan-out no longer depends on ambient config — keeps
    # round-over-round numbers comparable.
    spark = get_spark("cerebro-spark-bench", shuffle_partitions=32)
    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE and n in os.environ.get("BENCH_EXTRA", "")
    ]

    # warm up JVM JIT + parquet reader paths with a small representative job
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        qs[names[0]](spark, SF_DIR.replace("0.1", "0.001")).write.mode(
            "overwrite"
        ).format("noop").save()
    except Exception:
        pass

    # three passes, keep the per-query minimum: steady-state throughput (what
    # a long-running cluster job sees), not first-run JIT compilation.  All
    # runs are recorded so round-over-round diffs can tell regression from
    # local ±30% variance.
    runs: dict[str, list[float]] = {}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs.setdefault(name, []).append(
                round(time.perf_counter() - t0, 4)
            )
    timings: dict[str, float] = {n: min(r) for n, r in runs.items()}

    # streaming ingest throughput: replay the events table as canonical
    # points through the full enrich→partitioned-sink pipeline (availableNow)
    import shutil
    import tempfile

    from cerebro_spark.io import load_table
    from cerebro_spark.operators.pivot import unpivot_to_points
    from cerebro_spark.streaming.ingest import run_ingest

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        pts = unpivot_to_points(
            load_table(spark, "events", SF_DIR),
            measurement="events",
            time_col="ts",
            value_cols=["value", "user_id"],
            bucket="bench",
        )
        pts.write.mode("overwrite").parquet(f"{tmp}/in")
        t0 = time.perf_counter()
        q = run_ingest(
            spark,
            spark.readStream.schema(pts.schema).parquet(f"{tmp}/in"),
            sink_path=f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            instance_tags={"bench": "1"},
            available_now=True,
            query_name="bench-ingest",
        )
        q.awaitTermination(300)
        timings["streaming_ingest"] = round(time.perf_counter() - t0, 4)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # The driver tail-captures only the LAST stdout line and its buffer is
    # 2000 chars (BENCH_r03 recorded parsed:null from runs arrays; BENCH_r06
    # recorded parsed:null again when the per-query dict itself crossed 2 KB
    # at 142 headline queries).  The final line is now CONSTANT-SIZE — no
    # per-query content at all (tests/test_plan_shapes.py pins it <1800
    # chars even at 10x the query count); the per-run and per-query detail
    # both move to earlier lines for humans and tools/bench_diff.py.
    print(json.dumps({"detail": "all_runs", "runs": runs}))
    print(json.dumps(
        {
            "detail": "timings",
            "queries": {n: round(t, 3) for n, t in timings.items()},
            "sf": float(sf),
        },
        separators=(",", ":"),
    ))
    for line in timings_part_lines(timings):
        print(line)
    print(headline_line(timings, float(sf)))


def timings_part_lines(
    timings: "dict[str, float]", max_chars: int = 512
) -> "list[str]":
    """The per-query map again, in BOUNDED chunks (VERDICT r11 #3).

    The driver tail-captures only the last 2000 stdout chars; the single
    "timings" detail line outgrew that at ~140 queries, so the captured
    window cuts it MID-LINE and the driver's round-over-round comparator
    recovers nothing ("n_common: 0" in PERF_r11 despite two good runs).
    Re-emitting the same map as ``{"detail":"timings_part",...}`` lines of
    ≤ ``max_chars`` chars each means every line that falls fully inside
    the captured window parses cleanly — the window then yields ~60-70
    whole queries instead of regex-scraped fragments.  Additions-only:
    the headline line and both existing detail lines are byte-identical
    to round 11's format.  Query order matches the headline list so the
    window keeps showing the SAME tail queries round-over-round.
    """
    lines: list[str] = []
    part: dict[str, float] = {}

    def flush() -> None:
        if part:
            lines.append(json.dumps(
                {"detail": "timings_part", "q": dict(part)},
                separators=(",", ":"),
            ))
            part.clear()

    base = len('{"detail":"timings_part","q":{}}')
    used = base
    for n, t in timings.items():
        entry = len(json.dumps({n: round(t, 3)}, separators=(",", ":"))) - 1
        if part and used + entry > max_chars:
            flush()
            used = base
        part[n] = round(t, 3)
        used += entry
    flush()
    return lines


def headline_line(timings: "dict[str, float]", sf: float) -> str:
    """The ONE driver-parsed stdout line.  Constant-size by construction:
    carries only the total, never per-query content — the driver's tail
    buffer is 2000 chars and per-query dicts outgrew it twice (r03, r06).

    ``loadavg`` (1/5/15-min, captured AT EMIT TIME) rides inside the line so
    host-load attribution is machine-checkable from the recorded artifact
    itself: the r9 driver bench landed ~1.15x hot with loadavg 3.5-6.6
    recorded only in side notes — now the evidence is in-band.
    """
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg — keep the line parseable
        load = None
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
            "loadavg": load,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    main()
