"""Training-data prep, end to end: the pipeline a 100 TB corpus runs nightly.

    python examples/training_data_prep.py [sf_dir]

Stages (each one an oracle-checked operator — see QUERIES.md):
0. URL-keyed dedup   — `text.canonicalize_url` + `registered_domain`
   (round 7: collapse scheme/www/tracking-param variants to one canonical
   key, keep the first doc per key — the crawl pipeline's first pass)
1. quality gate      — `text.quality_score` columnar filter
2. near-dup pairs    — `dedup.minhash_lsh_pairs` (banded LSH)
3. cluster + resolve — `cluster.connected_components` → one canonical doc
4. decontamination   — `dedup.contamination_check` vs the held-out split
5. stratified rebalance — `sampling.stratified_sample`
6. split + chunk     — `sampling.train_val_test_split` / `chunk_documents`
7. profile           — `profile.data_profile` health row for the run log
8. overlap audit     — `dedup.winnow_overlap_pairs` (round 4: MOSS winnowing
   over the FINAL train split — catches substring-level overlap the
   doc-level LSH pass can't see, at ~2/(w+1) of the full shingle cost)
12. data selection   — `text.dsir_weights` (round 6: DSIR unigram
    importance toward a target domain, integer micro-nat weights)
13. retrieval probe  — `text.bm25_topk` (round 6: shuffle-free BM25)
14. hybrid retrieval — `similarity.rrf_fuse` (round 6: reciprocal-rank
    fusion of the BM25 and embedding-cosine rankings)
15. governance gate  — `profile.k_anonymity` (round 6: quasi-identifier
    class-size risk summary before release)
16. exact-dup sweep  — `dedup.prefix_jaccard_pairs` (round 6: AllPairs
    prefix-filtered EXACT Jaccard join over the train split — the
    no-false-negative audit behind the probabilistic LSH pass)
17. drift gate       — `tsdb.psi_drift` over the events feed (round 6:
    block the run when the upstream telemetry distribution shifted)
18. concentration    — `profile.gini_concentration` of tokens per source
    (round 6: is one source dominating the training mix?)
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.cluster import resolve_duplicates
from cerebro_spark.operators.dedup import (
    contamination_check,
    minhash_lsh_pairs,
    winnow_overlap_pairs,
)
from cerebro_spark.operators.profile import data_profile, key_skew_report
from cerebro_spark.operators.similarity import (
    cosine_topk_pq,
    pq_encode,
    train_pq_codebooks,
)
from cerebro_spark.operators.sampling import (
    chunk_documents,
    train_val_test_split,
)
from cerebro_spark.operators.text import quality_score
from cerebro_spark.operators.sampling import weighted_sample
from cerebro_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("training-data-prep")
    docs = load_table(spark, "documents", SF_DIR)
    n_raw = docs.count()

    # 0. URL-keyed dedup: canonicalize the crawl URL (synthetic here — the
    # test corpus carries none) and keep the FIRST doc per canonical key;
    # min_by avoids a window over the fact (the dedup_by_second shape)
    from cerebro_spark.operators.text import canonicalize_url

    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://www.")).otherwise(
            F.lit("http://")
        ),
        F.col("source"),
        F.lit(".example.com/doc/"),
        (F.col("doc_id") % 200).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=crawl")).otherwise(
            F.lit("")
        ),
    )
    keep = (
        docs.withColumn("__canon", canonicalize_url(url))
        .groupBy("__canon")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(keep, "doc_id")
    n_url = docs.count()

    # 1. quality gate (all three criteria)
    quality = docs.filter(quality_score(F.col("text")) >= 0.999)

    # 2-3. near-dup pairs → transitive clusters → keep one canonical per
    pairs = minhash_lsh_pairs(quality, n=3, num_hashes=8, bands=4, threshold=0.5)
    unique = resolve_duplicates(quality, pairs, id_col="doc_id")

    # 6. leakage-safe split (hash of doc_id — stable under reruns)
    split = train_val_test_split(unique, "doc_id", val_pct=10, test_pct=10)
    train = split.filter(F.col("split") == "train").drop("split")
    test = split.filter(F.col("split") == "test").drop("split")

    # 4. decontaminate: flag test docs whose 5-grams leak from train
    contam = contamination_check(train, test, n=5, threshold=0.5)
    clean_test = test.join(
        contam.filter(F.col("is_contaminated") == 1).select("doc_id"),
        "doc_id",
        "left_anti",
    )

    # 7. chunk the train split for the tokenizer
    chunks = chunk_documents(train, chunk_tokens=32, overlap=8)

    # health row for the run log
    profile = data_profile(
        train.select("doc_id", "text"), distinct_cols=["doc_id"]
    ).first()

    print(f"raw docs:          {n_raw}")
    print(f"after url dedup:   {n_url}")
    print(f"after quality:     {quality.count()}")
    print(f"after dedup:       {unique.count()}")
    print(f"train/test:        {train.count()} / {test.count()}")
    print(f"clean test:        {clean_test.count()}")
    print(f"train chunks:      {chunks.count()}")

    # 8. substring-overlap audit on the final train split (fast xxhash path)
    overlaps = winnow_overlap_pairs(
        train, k=4, w=4, min_shared=3, portable=False
    )
    print(f"winnow overlaps:   {overlaps.count()}")
    print(f"profile: n_rows={profile['n_rows']} text_nulls={profile['text_nulls']}")

    # 9. quality-weighted thinning of the train split (survival probability =
    # quality score, hash-decided — retry-stable, no RNG)
    # (over the RAW corpus — the train split already passed the hard quality
    # gate, so its weights are all 1.0; the soft gate is the alternative)
    weighted = weighted_sample(
        docs.withColumn("q", quality_score(F.col("text"))), "q", "doc_id"
    )
    print(f"quality-weighted:  {weighted.count()} of {n_raw} raw docs")

    # 10. skew check before any doc_id-keyed join downstream
    skew = key_skew_report(
        chunks.select("doc_id"), "doc_id", top=3
    ).collect()
    print(f"chunk skew top-3:  {[(r['key'], r['cnt']) for r in skew]}")

    # 11. compress the companion embeddings with product quantization and
    # verify the compressed corpus still answers top-k
    emb = load_table(spark, "embeddings", SF_DIR)
    books = train_pq_codebooks(emb, dim=64, m=8, k=64)
    codes = pq_encode(emb, books)
    topk = cosine_topk_pq(codes, emb.orderBy("vec_id").limit(5), books, k=3)
    print(f"pq codes:          {codes.count()} vectors -> packed int64")
    print(f"pq top-k sample:   {topk.count()} rows")

    # 12. DSIR data selection: rank the raw corpus by unigram importance
    # toward the English slice (integer micro-nat weights — exact sums)
    from cerebro_spark.operators.text import bm25_topk, dsir_weights

    selected = dsir_weights(docs, F.col("lang") == "en", k=20)
    print(f"dsir top-20:       {selected.count()} docs selected")

    # 13. retrieval sanity: BM25 top-5 for a probe query over the train split
    hits = bm25_topk(train, ("spark", "window", "merge"), k=5)
    print(f"bm25 probe hits:   {hits.count()} docs")

    # 14. hybrid retrieval: fuse the lexical probe with an embedding-cosine
    # ranking via reciprocal-rank fusion (rank-only — no score calibration)
    from cerebro_spark.operators.similarity import cosine_topk_bruteforce, rrf_fuse

    emb = load_table(spark, "embeddings", SF_DIR)
    lex = bm25_topk(docs, ("spark", "window", "merge"), k=50).select("doc_id", "rank")
    sem = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse({"lex": lex, "sem": sem})
    print(f"rrf fused pool:    {fused.count()} candidates")

    # 15. governance gate: k-anonymity of the released training metadata —
    # block the run if too many quasi-identifier classes are singletons
    from cerebro_spark.operators.profile import k_anonymity

    risk = k_anonymity(
        train, [F.col("lang"), F.col("source"), F.floor(F.col("n_chars") / 100)],
        k=5,
    ).first()
    print(
        f"k-anonymity:       {risk['n_risky_rows']}/{risk['n_rows']} rows in "
        f"sub-k classes (share {risk['risky_row_share']:.3f})"
    )

    # 16. exact-dup sweep: AllPairs prefix-filtered token-Jaccard over the
    # train split — exact (no false negatives), so anything LSH missed at
    # this threshold surfaces here
    from cerebro_spark.operators.dedup import prefix_jaccard_pairs

    exact_dups = prefix_jaccard_pairs(train, "text", "doc_id", threshold=0.95)
    print(f"exact-jaccard dups: {exact_dups.count()} pairs ≥0.95 in train")

    # 17. drift gate on the upstream telemetry feed: PSI between the early
    # and late half of each series — a shifted feed taints tomorrow's batch
    from cerebro_spark.operators.tsdb import psi_drift

    ev = load_table(spark, "events", SF_DIR)
    drift = psi_drift(ev, "value", "ts", keys=["event_type"]).collect()
    worst = max(drift, key=lambda r: r["psi"])
    print(f"psi drift:         worst {worst['event_type']}={worst['psi']:.4f} "
          f"({'OK' if worst['psi'] < 0.25 else 'SHIFTED — gate the run'})")

    # 18. mix concentration: Gini of per-source character mass — a skewed
    # training mix (one source dominating) shows as G → 1
    from cerebro_spark.operators.profile import gini_concentration

    src_mass = docs.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    gini = gini_concentration(src_mass, "chars", "source").first()
    print(f"source-mix gini:   {gini['gini']:.4f} over {gini['n']} sources")

    # 19. normalization pass FIRST in a real run (session 4): the cleaning
    # every crawl needs before quality/dedup — here audited on the raw corpus
    from cerebro_spark.operators.text import clean_text

    cleaned = clean_text(docs)
    n_dirty = cleaned.filter(F.col("was_dirty")).count()
    print(f"clean_text:        {n_dirty}/{n_raw} docs had removable chars")

    # 20. per-domain cap: no host may dominate the mix (deterministic md5
    # rank — retry-stable)
    from cerebro_spark.operators.sampling import cap_per_key

    capped = cap_per_key(train, "source", k=25)
    print(f"domain cap 25:     {train.count()} -> {capped.count()} train docs")

    # 21. diversified retrieval pool: MMR over the embedding candidates —
    # the near-dup-aware version of the rrf pool above
    from cerebro_spark.operators.similarity import mmr_rerank

    diverse = mmr_rerank(emb, emb.filter(F.col("vec_id") == 0),
                         k=5, n_candidates=25, lam=0.5)
    print(f"mmr pool:          {diverse.count()} diversified picks")

    # 22. uncertainty on the run's headline metric: Poisson-bootstrap CI of
    # mean doc length (would feed the run-log dashboard)
    from cerebro_spark.operators.profile import bootstrap_ci

    ci = bootstrap_ci(train, "n_chars", "doc_id", b=100).first()
    print(f"len CI (95%):      {ci['mean']:.1f} in "
          f"[{ci['ci_lo']:.1f}, {ci['ci_hi']:.1f}] over {ci['n']} docs")

    # 23. (round 8) domain-leakage-guarded split: the doc_id-hash split in
    # stage 6 keeps a KEY from leaking, but pages of one site still land on
    # both sides; keying by registered domain makes host-level leakage
    # structurally impossible — here audited against the synthetic URLs
    from cerebro_spark.operators.sampling import leakage_guarded_split

    guarded = leakage_guarded_split(docs.withColumn("url", url), "url")
    span = (
        guarded.groupBy("domain")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    print(f"domain split:      {span} domains spanning >1 split (must be 0)")

    # 24. (round 8) near-dup-aware decontamination: contamination_check
    # (stage 4) catches exact 5-gram leakage; the asymmetric prefix cross
    # join catches WHOLE-DOC near-dups of the test split hiding in train
    from cerebro_spark.operators.dedup import decontaminate

    neardup = decontaminate(train, test, "text", "doc_id", threshold=0.8)
    print(f"near-dup contam:   {neardup.count()} train docs within J>=0.8 "
          f"of a test doc")

    # 25. (round 8) t-closeness on the released metadata: k-anonymity
    # (stage 15) bounds class size; this bounds what a class REVEALS about
    # the sensitive length distribution
    from cerebro_spark.operators.profile import t_closeness

    tc = t_closeness(
        train.select("lang", "source", "n_chars"),
        ["lang", "source"], "n_chars", n_buckets=20, t=0.3,
    )
    n_violations = tc.filter(F.col("is_violation")).count()
    worst_tc = tc.first()
    print(f"t-closeness:       {n_violations} QI classes over t=0.3 "
          f"(worst {worst_tc['qi_class']}={worst_tc['t_distance']:.3f})")

    # 26. (round 8) readability profile of the final train split — the
    # text-quality feature the Gopher gate doesn't cover
    from cerebro_spark.operators.text import readability_scores

    rd = readability_scores(train, "text", "lang").collect()
    by_lang = {r["lang"]: r["flesch"] for r in rd}
    print(f"readability:       flesch by lang {by_lang}")

    # 27. (round 8, second session) vocabulary health: TTR + hapax per
    # source (boilerplate floods vs OCR noise), the Heaps growth exponent
    # (is more data still adding vocabulary?), and the Good–Turing unseen
    # mass (do we need another crawl?)
    from cerebro_spark.operators.text import (
        good_turing_unseen,
        heaps_law_fit,
        type_token_profile,
    )

    ttr = type_token_profile(train, "text", "source").collect()
    worst_src = min(ttr, key=lambda r: r["ttr"] or 1.0)
    print(f"lexical diversity: lowest TTR source {worst_src['group']} "
          f"(ttr={worst_src['ttr']:.4f}, hapax={worst_src['hapax_ratio']:.2f})")
    heaps = heaps_law_fit(train, "text", "doc_id").first()
    gt = good_turing_unseen(train, "text").first()
    print(f"vocab growth:      Heaps beta={heaps['heaps_beta']:.3f} "
          f"(r2={heaps['r2']:.3f}); Good-Turing unseen mass "
          f"p0={gt['p_unseen']:.4f} — "
          f"{'more data still pays' if gt['p_unseen'] > 0.01 else 'vocabulary saturated'}")

    # 28. (round 8, late) corpus-mixing panel: which sources are
    # redundant (vocab Jaccard), what distinguishes the rest (fightin'
    # words), and what an exact dedup would recover (savings sizing)
    from cerebro_spark.operators.dedup import dedup_savings
    from cerebro_spark.operators.text import fightin_words, vocab_jaccard_pairs

    vj = vocab_jaccard_pairs(train, "text", "source").collect()
    most = max(vj, key=lambda r: r["jaccard"] or 0) if vj else None
    if most:
        print(f"mixing panel:      most-redundant pair "
              f"{most['group_a']}~{most['group_b']} "
              f"(vocab J={most['jaccard']:.3f})")
    fw = fightin_words(train, "text", "source", top_k=1).collect()
    marks = {r["group"]: r["term"] for r in fw if r["rank"] == 1}
    print(f"                   signature terms {marks}")
    sv = dedup_savings(train, "text", "n_chars").first()
    print(f"dedup sizing:      exact dedup recovers {sv['n_dup_docs']} docs "
          f"/ {sv['bytes_dup']:,} chars ({sv['dup_ratio']:.1%}); "
          f"largest dup group {sv['max_group']}")

    # 29. (round 9) multimodal panel: perceptual image dedup + audio
    # fingerprint matching over REAL codec round-trips — the media twin
    # of the text dedup above.  Payloads are synthesized from text
    # (the corpus has no binary column); with real image/audio columns
    # the same operators run unchanged via image_dhash_df /
    # audio_fingerprint_df.
    from cerebro_spark.operators.cluster import connected_components
    from cerebro_spark.operators.multimodal import (
        byte_dhash_df,
        hamming_hash_pairs,
    )

    base = train.select("doc_id", "text")
    fp = byte_dhash_df(base)
    img_pairs = hamming_hash_pairs(fp, "dhash", "id", max_hamming=3)
    n_img_pairs = img_pairs.count()
    if n_img_pairs:
        comp = connected_components(img_pairs)
        n_clusters = comp.select("component").distinct().count()
        print(f"media dedup:       {n_img_pairs} perceptual near-dup pairs "
              f"-> {n_clusters} clusters (keep one payload per cluster)")
    else:
        print("media dedup:       0 perceptual near-dup pairs "
              "(corpus has no planted media twins)")

    # 30. (round 10) tokenizer panel: LEARN a BPE merge table from the
    # training split, then read out what the learned vocabulary costs per
    # language — the fertility number that sets multilingual mix weights.
    from cerebro_spark.operators.text import bpe_fertility, train_bpe

    merges = train_bpe(train, merges=6)
    top = ", ".join(f"{l}+{r}" for _, l, r, _ in merges[:4])
    fert = {
        r["lang"]: r["fertility"]
        for r in bpe_fertility(train, merges, group_col="lang").collect()
    }
    print(f"bpe trainer:       learned merges [{top}, ...]; "
          f"fertility by lang {fert}")

    # 31. (round 11) the last mile: ENCODE the training split to subword-id
    # sequences under the trained table, then PACK them into fixed-length
    # training sequences (boundary-preserving first-fit — no doc split
    # across sequences, no token lost, no sequence > L).
    from cerebro_spark.operators.sampling import pack_sequences
    from cerebro_spark.operators.text import bpe_encode

    enc = bpe_encode(train, merges).cache()
    n_docs, n_toks = enc.select(
        F.count("*"), F.sum("n_tokens")
    ).first()
    packed = pack_sequences(
        enc.select("doc_id", "n_tokens"), seq_len=256, n_groups=8
    )
    seqs = packed.groupBy("grp", "seq_id").agg(
        F.sum("n_tokens").alias("t")
    )
    n_seqs, fill = seqs.select(
        F.count("*"), F.sum("t") / (F.count("*") * 256.0)
    ).first()
    enc.unpersist()
    print(f"encode+pack:       {n_docs} docs / {n_toks} subword tokens -> "
          f"{n_seqs} sequences of 256 (fill {fill:.3f})")


if __name__ == "__main__":
    main()
