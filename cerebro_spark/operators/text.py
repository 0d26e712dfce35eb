"""Text analysis operators for training-data pipelines (driver-mandated).

All JVM-side column expressions (split / filter / aggregate / regexp) — the
tokenizer, quality scorer, language heuristic, and fingerprinter run inside
whole-stage codegen with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small English stopword profile for the quality score / language heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of alternating letter/digit/punct runs —
    ``regexp_count`` over a token-run pattern (a cheap, deterministic stand-in
    for a real BPE vocab; scale-path identical)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_ratio(col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(col)
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = _tokens(F.lower(col))
    sw = F.array(*[F.lit(s) for s in stopwords])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = _tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length band + stopword presence +
    low punctuation.  Deterministic, fully columnar."""
    n_tok = token_count(col).cast("double")
    length_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 1.0).otherwise(0.0)
    sw = stopword_ratio(col)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.0)
    return (length_ok + sw_ok + punct_ok) / F.lit(3.0)


def lang_id_heuristic(col: Column) -> Column:
    """Tiny character/stopword language heuristic: CJK chars → zh, accented
    latin → fr/es/de by marker letters, else stopword-density English check.
    A real system plugs an n-gram profile model here; the columnar shape
    (nested CASE over cheap regexp counts) is the scale path either way."""
    cjk = F.regexp_count(col, F.lit(r"[一-鿿]"))
    has_fr = F.regexp_count(F.lower(col), F.lit(r"[àâçéèêëîïôùûœ]"))
    has_es = F.regexp_count(F.lower(col), F.lit(r"[áéíóúñ¿¡]"))
    has_de = F.regexp_count(F.lower(col), F.lit(r"[äöüß]"))
    sw = stopword_ratio(col)
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(has_de > has_fr + has_es, F.lit("de"))
        .when(has_es > has_fr, F.lit("es"))
        .when(has_fr > 0, F.lit("fr"))
        .when(sw >= 0.05, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(col: Column, modulus: int = 2147483647, base: int = 31) -> Column:
    """Polynomial rolling-hash document fingerprint over characters:
    ``h = fold(h*base + ascii(c)) mod m`` — an ``aggregate`` over the split
    char array, JVM-side, identical result in any engine."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % modulus,
    )


def normalize_text(col: Column) -> Column:
    """C4/CCNet-style text normalization as one JVM regexp chain (the
    cleaning pass every corpus-prep pipeline runs before filtering/dedup;
    reference has no text layer — driver-mandated extension):

    1. strip control characters (C0 except ``\\t``/``\\n``/``\\r``, plus DEL),
    2. strip zero-width/format marks (ZWSP/ZWNJ/ZWJ/BOM),
    3. map exotic Unicode spaces (NBSP, en/em/thin/ideographic…) to ASCII
       space,
    4. collapse ``[ \\t\\n\\r]+`` runs to one space and trim.

    Unicode NFC/NFKC folding is deliberately NOT attempted — Spark has no
    built-in normalizer and a per-row Python stage is not worth it for the
    hot path; run it upstream at ingest if the corpus needs it.

    Every rule is a whole-stage-codegen ``regexp_replace``; the same
    hex/class escapes are valid RE2, so the DuckDB oracle mirrors the
    chain literally (cross-engine parity tested on control chars,
    zero-width marks, NBSP and empty strings).
    """
    c = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    c = F.regexp_replace(c, r"[\x{200B}-\x{200D}\x{FEFF}]", "")
    c = F.regexp_replace(c, r"[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]", " ")
    c = F.regexp_replace(c, r"[ \t\n\r]+", " ")
    return F.trim(c)


def clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply :func:`normalize_text` and surface per-document audit columns:
    the cleaned text, how many characters were removed, and whether the row
    changed at all — the downstream filter/monitoring hooks (e.g. "alert if
    >1% of a source's bytes are control characters").  Pure projection: no
    shuffle, no Python."""
    c = F.col(text_col)
    cleaned = normalize_text(c)
    return df.withColumn("__clean", cleaned).select(
        "*",
        (F.length(c) - F.length(F.col("__clean"))).alias("chars_removed"),
        (F.col("__clean") != c).alias("was_dirty"),
    ).withColumnRenamed("__clean", "clean_text")


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text metrics as added columns (the one-pass profiling operator)."""
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        mean_word_length(c).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        lang_id_heuristic(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = in-doc term count; idf = ln(N / df_t); rank by (tfidf desc, term asc)
    for determinism.  Two shuffles: (doc,term) counts and the doc-frequency
    aggregate (broadcast back — vocabulary is small relative to the corpus).
    """
    from pyspark.sql import Window

    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # dfreq is the corpus VOCABULARY — unbounded at 100 TB (web-scale junk
    # terms), so no forced broadcast; AQE broadcasts it while it fits
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "df", "tfidf", "rank")
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1
    quality rules, adapted to word granularity):

    - ``dup_word_frac``: 1 − distinct/total words (pure column expression);
    - ``top_word_frac``: occurrences of the most frequent word / n_words;
    - ``top_bigram_frac``: occurrences of the most frequent bigram / (n−1).

    High values mark boilerplate/spam for training-data filtering.  Shape:
    ONE scan — explode (unigram ∪ bigram) tagged by n, a combiner-friendly
    (doc, n, gram) count, then a per-doc rollup that recovers every metric
    from the counts themselves (n_words = Σc over n=1 rows, distinct words =
    the n=1 row count, tops = conditional max).  Two shuffles, state bounded
    by per-doc vocabulary, no join back to the base table.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = _tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    n = F.size(F.col("__t"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.array_join(F.slice(F.col("__t"), i + 1, 2), " "),
        ),
    ).otherwise(F.array())
    tagged = base.select(
        id_col,
        F.explode(
            F.concat(
                F.transform(
                    F.col("__t"),
                    lambda t: F.struct(F.lit(1).alias("n"), t.alias("gram")),
                ),
                F.transform(
                    bigrams,
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    is_word = F.col("n") == 1
    rolled = (
        tagged.groupBy(id_col, "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(is_word, F.col("c"))).alias("__nw"),
            F.count(F.when(is_word, F.lit(1))).alias("__nd"),
            F.max(F.when(is_word, F.col("c"))).alias("__topw"),
            F.max(F.when(F.col("n") == 2, F.col("c"))).alias("__topb"),
        )
    )
    return rolled.select(
        id_col,
        F.col("__nw").alias("n_words"),
        F.round(
            F.lit(1.0) - F.col("__nd").cast("double") / F.col("__nw"), 6
        ).alias("dup_word_frac"),
        F.round(F.col("__topw").cast("double") / F.col("__nw"), 6).alias(
            "top_word_frac"
        ),
        F.when(
            F.col("__nw") >= 2,
            F.round(
                F.col("__topb").cast("double") / (F.col("__nw") - 1), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def unigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model perplexity proxy (the CCNet/Wenzek et al. 2020
    quality signal, with the corpus itself as the LM): per-document mean
    negative log-likelihood under corpus unigram frequencies.  Low = fluent
    and typical; high = rare-token noise.

    Shape: one explode → vocabulary count (combiner-friendly), a 1-row total
    (broadcast scalar), an equi-join of tokens to the vocab (AQE broadcasts
    the vocab while it fits — no forced hint: web-scale vocabularies grow
    with the corpus), then a per-doc mean.  The mean is rounded to 4 dp on
    both engines: ``ln`` differs by ulps between libm and the JVM.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    terms = df.select(
        F.col(id_col),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("t"))
    scored = terms.join(vocab, "term").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.avg(-F.log(F.col("c").cast("double") / F.col("t"))), 4
        ).alias("avg_nll"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most frequent word n-grams (deterministic ties by ngram).

    Top-k via ``orderBy().limit()`` (TakeOrderedAndProject) + bounded rank —
    a global ``row_number`` window would pull every distinct n-gram (vocab^n
    worst case) through one task at scale.
    """
    from cerebro_spark.operators.util import ensure_parallelism, top_k_ranked

    df = ensure_parallelism(df)
    # non-distinct shingles: every occurrence counts
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array())
    counts = (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return top_k_ranked(
        counts, [("n_occurrences", "desc"), ("ngram", "asc")], k=k
    )


def dedup_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Corpus-level exact chunk dedup (the C4/RefinedWeb "duplicate line
    removal" step, over aligned ``chunk_tokens``-token windows since the
    synthetic corpus has no newlines).

    A chunk occurring in several places survives only at its FIRST occurrence
    (lowest ``(doc_id, chunk_idx)``); every other occurrence is dropped and
    the documents are reassembled from their surviving chunks.

    Scale shape: one shuffle by chunk text for a ``min(struct)`` aggregate —
    partial (map-side) aggregation bounds skew even when one boilerplate
    chunk occurs in millions of documents (a ``row_number`` window over the
    same key would funnel that key through one task) — then one shuffle by
    doc to reassemble.  Returns
    ``(doc_id, n_chunks, n_kept, text_kept)``; docs whose every chunk is a
    duplicate survive with ``n_kept = 0`` and an empty string.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    n_chunks = F.ceil(F.size("__t") / F.lit(chunk_tokens)).cast("long")
    idx = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    chunk_at = lambda i: F.array_join(  # noqa: E731
        F.slice("__t", i * chunk_tokens + 1, chunk_tokens), " "
    )
    chunks = base.select(
        "doc_id",
        F.posexplode(F.transform(idx, chunk_at)).alias("chunk_idx", "chunk_text"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    # first occurrence per distinct chunk — the agg IS the kept set, no join
    # back to the exploded chunks needed.
    kept = chunks.groupBy("chunk_text").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("k")
    )
    kept_per_doc = kept.groupBy(F.col("k.doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("k.chunk_idx"), F.col("chunk_text")))
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("text_kept"),
    )
    return (
        totals.join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
) -> DataFrame:
    """Frequency-ranked token vocabulary ``(token, token_id, n_occurrences)``,
    ``token_id`` 1..vocab_size by (count desc, token asc).

    Scale shape: one shuffle for the token counts (map-side combine), then
    ``top_k_ranked`` (TakeOrderedAndProject + array-sort rank over the ≤V
    survivors) — no global ``row_number`` window ever sees the full distinct
    vocabulary.
    """
    from cerebro_spark.operators.util import top_k_ranked

    counts = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    ranked = top_k_ranked(
        counts, [("n_occurrences", "desc"), ("token", "asc")], k=vocab_size
    )
    return ranked.select(
        "token", F.col("rank").alias("token_id"), "n_occurrences"
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Map each document's tokens to vocabulary ids (the tokenize-to-ids step
    of a training pipeline); out-of-vocabulary tokens become ``oov_id``.

    The vocabulary is a bounded constant-size dimension → broadcast join; the
    id sequence is re-assembled in token order and string-encoded
    (``ids_str``) so the row stays canonicalizer-safe.  One shuffle (by doc
    for the reassembly); the explode→join stays co-partitioned with the scan.
    """
    pos_tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "token"),
    )
    joined = pos_tok.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    ids = F.coalesce(F.col("token_id"), F.lit(oov_id))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), ids.alias("id")))),
                lambda s: s.id.cast("string"),
            ),
            " ",
        ).alias("ids_str"),
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style document quality rules as individual boolean flags plus
    the overall keep decision — the audit-friendly form of a quality gate
    (downstream can see WHICH rule dropped a doc, weight rules per domain,
    or loosen one without re-deriving the rest).

    Rules (thresholds follow the published Gopher heuristics, adapted to
    the synthetic corpus's scale): word count in [4, 10_000]; mean word
    length in [2, 12]; symbol ratio ≤ 0.1; stopword presence; top-word
    occupancy < 0.35.  All whole-stage-codegen column expressions over one
    tokenize; one extra shuffle for the top-word occupancy.
    """
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks)
    mwl = mean_word_length(F.col(text_col))
    sym = punct_ratio(F.col(text_col))
    sw = stopword_ratio(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(sym, 6).alias("symbol_ratio"),
        F.round(sw, 6).alias("stopword_ratio"),
        toks.alias("__t"),
    )
    top = (
        base.select("doc_id", "n_words", F.explode("__t").alias("w"))
        .groupBy("doc_id", "n_words", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.max("n_words"), 6).alias("top_word_frac")
        )
    )
    out = base.drop("__t").join(top, "doc_id")
    words_ok = (F.col("n_words") >= 4) & (F.col("n_words") <= 10000)
    mwl_ok = (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12)
    sym_ok = F.col("symbol_ratio") <= 0.1
    sw_ok = F.col("stopword_ratio") > 0
    top_ok = F.col("top_word_frac") < 0.35
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "stopword_ratio",
        "top_word_frac",
        words_ok.cast("int").alias("ok_word_count"),
        mwl_ok.cast("int").alias("ok_mean_word_len"),
        sym_ok.cast("int").alias("ok_symbol_ratio"),
        sw_ok.cast("int").alias("ok_stopwords"),
        top_ok.cast("int").alias("ok_top_word"),
        (words_ok & mwl_ok & sym_ok & sw_ok & top_ok)
        .cast("int")
        .alias("keep"),
    )


def bigram_pmi(
    df: DataFrame,
    min_count: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Corpus collocations by pointwise mutual information: for every
    adjacent token pair, PMI = ln(p(w1,w2) / (p(w1)·p(w2))), estimated from
    corpus-wide bigram/unigram counts.

    Plan shape: one explode+groupBy for unigram counts (vocab-sized), one
    for bigram counts; the bigram table joins the unigram table twice on the
    word key.  The vocab table broadcasts while it fits (AQE) and shuffles
    on the word key beyond that — no all-pairs stage anywhere, so the cost
    is bounded by distinct-bigram cardinality, not corpus size.  The
    ``min_count`` floor drops noise pairs BEFORE the joins (PMI is unstable
    below ~10 observations, and the filter shrinks the join probe side).

    All-double arithmetic is ordered identically to the DuckDB oracle so the
    driver hash reproduces: (cab·Nu·Nu) / (Nb·c1·c2), then ln, then round.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = _tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    # slice length clamps at 0 for single-token docs → empty zip, no
    # when/otherwise branch (whose array() literal would type-clash with
    # array<struct>)
    n_m1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, 1, n_m1).alias("w1"),
        F.slice(toks, 2, n_m1).alias("w2"),
    )
    big = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )
    nu = uni.agg(F.sum("cw").cast("double").alias("__nu"))
    nb_total = (
        df.select(
            F.greatest(F.size(toks) - 1, F.lit(0)).alias("__k")
        ).agg(F.sum("__k").cast("double").alias("__nb"))
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    joined = (
        big.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_total))
    )
    pmi = F.log(
        (F.col("n_pairs").cast("double") * F.col("__nu") * F.col("__nu"))
        / (F.col("__nb") * F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    return joined.select(
        "w1", "w2", "n_pairs", "c1", "c2", F.round(pmi, 6).alias("pmi")
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    min_cooccur: int = 3,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau, EMNLP 2004): PageRank over
    the adjacent-token co-occurrence graph — returns ``(word, score)``.

    Graph construction: lowercase whitespace tokens, unordered adjacent
    pairs (window 2) canonicalized with least/greatest, kept when they
    co-occur at least ``min_cooccur`` times corpus-wide (the support floor
    both denoises — TextRank's own authors drop rare links — and bounds the
    edge list by distinct-bigram cardinality, not corpus size).  The
    symmetrized halves are disjoint by construction (u < v vs v > u), so
    the PageRank runs with ``assume_distinct=True`` and skips the full-edge
    dedup shuffle.  Ranks are per-iteration 1e-9-quantized inside
    ``cluster.pagerank`` — the whole composition is engine-exact.

    A deliberate composition of two existing operators (bigram counting ⇄
    ``bigram_pmi``'s pair build, ranking ⇄ ``cluster.pagerank``): keyword
    extraction at 100 TB is a vocab-sized graph problem, not a per-document
    one, so it inherits PageRank's scale shape unchanged.

    Reference parity: no reference counterpart — text-analysis extension
    next to tfidf_top_terms / bigram_pmi.
    """
    from cerebro_spark.operators.cluster import pagerank
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    toks = _tokens(F.lower(F.col(text_col)))
    n_m1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(toks, 1, n_m1).alias("w1"),
        F.slice(toks, 2, n_m1).alias("w2"),
    )
    e = (
        df.select(F.explode(pairs).alias("p"))
        .select(
            F.least(F.col("p.w1"), F.col("p.w2")).alias("u"),
            F.greatest(F.col("p.w1"), F.col("p.w2")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_cooccur)
        .select("u", "v")
    )
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ranks = pagerank(
        edges,
        iterations=iterations,
        damping=damping,
        src="u",
        dst="v",
        assume_distinct=True,
    )
    return ranks.select(F.col("node").alias("word"), F.col("rank").alias("score"))


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """The counting step of BPE vocabulary induction (Sennrich et al. 2016)
    at corpus scale: the ``k`` most frequent adjacent character pairs,
    weighted by word frequency — i.e. the first merge candidates a
    tokenizer trainer would pick.

    Scale shape — the trick is to NEVER explode characters per document:
    (1) one map-side-combinable groupBy collapses the corpus to its
    distinct-word frequency table (vocabulary-sized, not corpus-sized);
    (2) character bigrams explode off the DISTINCT words only, weighted by
    their counts; (3) a second combinable groupBy sums pair counts;
    (4) ``top_k_ranked`` (TakeOrderedAndProject) picks the top k without a
    global window.  At 100 TB the word table is the only intermediate that
    grows with data — sublinearly (Heaps' law) — and both aggregations
    partial-combine map-side.
    """
    from cerebro_spark.operators.util import top_k_ranked

    words = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                # 512-pair cap per word bounds the fan-out of pathological
                # "words" (minified JS, base64 blobs); the DuckDB oracle
                # (_BPE_SQL) applies the same generate_series(1, 512) cap.
                F.sequence(F.lit(1), F.least(F.length("w") - 1, F.lit(512))),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        F.col("n"),
    ).groupBy("pair").agg(F.sum("n").alias("pair_count"))
    return top_k_ranked(
        pairs, [("pair_count", "desc"), ("pair", "asc")], k=k
    ).select("pair", "pair_count", "rank")


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` documents for a fixed term query
    (Robertson & Zaragoza 2009, the Lucene ``+1``-inside-the-log idf variant
    so idf is never negative).

    Scale shape — the query side is TINY (a handful of terms), so the whole
    operator is shuffle-free:
    (1) per-doc term frequencies come from |query| ``size(filter(tokens))``
        array expressions — one codegen'd projection, NO (doc, term) explode
        and NO groupBy shuffle (the wide form would shuffle docs × |query|
        rows for counts a row-local expression already knows);
    (2) corpus statistics (N, Σdl as exact BIGINT, per-term document
        frequencies) reduce in ONE combinable aggregation returning a single
        driver row — bounded metadata, like the k-means centroids;
    (3) scores are pure per-row JVM expressions folded in sorted term order
        from 0.0 (absent terms contribute exactly +0.0, which IEEE-754
        guarantees is the identity, so the fold equals the oracle's
        present-terms-only ordered fold bit-for-bit);
    (4) the global top-k is ``top_k_ranked`` (TakeOrderedAndProject), never a
        partitionless window.
    Total cost: two corpus scans (stats, scoring) and zero data shuffles
    (the only Exchange a small-input plan shows is ``ensure_parallelism``'s
    round-robin spread, which a large scan bypasses).

    The score is quantized to 1e-6 with ``floor(x*1e6 + 0.5)`` (identical
    semantics in Spark and DuckDB, unlike half-up vs half-even ``round``) so
    the cross-engine hash is stable at the last ulp of the term fold.

    Reference parity: the reference has no retrieval engine; this is part of
    the driver-mandated training-data extension surface (SURVEY §2 "text
    analysis" family, alongside tfidf_top_terms).
    """
    import math

    from cerebro_spark.operators.util import ensure_parallelism, top_k_ranked

    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = sorted(set(query_terms))

    df = ensure_parallelism(df)
    toks = _tokens(F.lower(F.col(text_col)))

    def _count_of(term: str):
        # closure factory: F.filter lambdas must be single-parameter
        return F.size(F.filter(toks, lambda w: w == F.lit(term)))

    counted = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        *[_count_of(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )

    # one combinable aggregation -> a single bounded driver row of stats
    stats = counted.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("dl_sum"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs = stats["n"]
    if n_docs == 0:
        # empty corpus -> empty top-k with the normal output schema (not a
        # None/ZeroDivision crash deep in a pipeline stage)
        return (
            counted.select(F.col("id").alias(id_col))
            .withColumn("score", F.lit(0.0))
            .withColumn("rank", F.lit(1).cast("int"))
            .limit(0)
        )
    avgdl = float(stats["dl_sum"]) / float(n_docs)

    # fold per-term contributions in sorted term order from 0.0; a tf of 0
    # adds exactly +0.0 (idf > 0 always, denominator > 0), preserving parity
    # with the oracle's present-terms-only ordered fold
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dft = float(stats[f"__df_{i}"])
        idf = F.lit(math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5)))
        tf = F.col(f"__tf_{i}")
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )

    # inclusion = "has at least one query term" (raw score > 0), decided
    # BEFORE quantization so a sub-quantum score still matches the oracle's
    # present-term membership
    scored = (
        counted.select("id", score.alias("__raw"))
        .filter(F.col("__raw") > 0.0)
        .select(
            "id",
            (F.floor(F.col("__raw") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("score"),
        )
    )
    return top_k_ranked(scored, [("score", "desc"), ("id", "asc")], k=k).select(
        F.col("id").alias(id_col), "score", "rank"
    )


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", public): score every
    document by its log-likelihood ratio under an add-1-smoothed unigram LM
    of the TARGET slice vs the full corpus, and return the top-``k`` —
    the hashed-n-gram data-selection recipe, at corpus scale, with n=1.

    Scale shape:
    (1) (doc, word) term frequencies — ONE combinable groupBy, the same
        vocabulary-bounded shuffle every other text operator pays;
    (2) corpus and target word counts derive from that tf frame (second
        combinable groupBy over vocab-sized input, not corpus-sized);
    (3) the per-word log-ratio is computed once per VOCAB word and
        **quantized to integer micro-nats** (floor(x*1e6 + 0.5) as BIGINT)
        — so the per-document weight is an exact INTEGER sum: no float
        summation-order hazard at any scale, on any engine, under any
        partitioning (same reasoning as the fixed-point revenue sums);
    (4) doc weights are one more combinable groupBy; top-k is
        TakeOrderedAndProject.

    ``target_filter`` marks the target-domain rows (e.g. ``lang == 'en'``).
    Smoothing: add-1 over the CORPUS vocabulary for both models, so words
    unseen in the target still score (negatively), and the weight of a doc
    is Σ_w tf_w · q_w with q_w = floor((ln p_target(w) − ln p_corpus(w)) ·
    1e6 + 0.5).  Output weight is in micro-nats (BIGINT).

    Reference parity: no reference counterpart — driver-mandated
    training-data extension surface (data-selection family next to
    unigram_nll and quality_score).
    """
    from cerebro_spark.operators.util import ensure_parallelism, top_k_ranked

    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        target_filter.cast("boolean").alias("__tgt"),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    tf = toks.groupBy("id", "__tgt", "w").agg(F.count(F.lit(1)).alias("tf"))
    counts = tf.groupBy("w").agg(
        F.sum("tf").alias("c_all"),
        F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(F.lit(0))).alias("c_tgt"),
    )
    # corpus totals as a 1-row scalar broadcast instead of a driver action:
    # keeps the whole operator ONE job, so Catalyst reuses the tf exchange
    # for both the vocab counts and the per-doc weights (a .first() here
    # would force an extra full corpus pass)
    totals = counts.agg(
        F.sum("c_all").cast("double").alias("n_all"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    # per-word log-ratio in integer micro-nats: ln((c_tgt+1)/(n_tgt+V)) -
    # ln((c_all+1)/(n_all+V)), quantized once per vocab word
    q = F.floor(
        (
            F.log((F.col("c_tgt") + F.lit(1.0)) / (F.col("n_tgt") + F.col("vocab")))
            - F.log((F.col("c_all") + F.lit(1.0)) / (F.col("n_all") + F.col("vocab")))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    ratios = counts.crossJoin(F.broadcast(totals)).select("w", q.alias("q"))
    # vocab-sized ratio table joins back onto tf — AQE broadcasts while it
    # fits (same policy as the tfidf dfreq join; vocabulary is unbounded at
    # web scale, so no forced broadcast)
    weights = (
        tf.join(ratios, "w")
        .groupBy("id")
        .agg(F.sum(F.col("tf") * F.col("q")).alias("weight"))
    )
    return top_k_ranked(weights, [("weight", "desc"), ("id", "asc")], k=k).select(
        F.col("id").alias(id_col), "weight", "rank"
    )


def vocab_coverage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary-saturation profile — one row: token count N,
    distinct vocabulary V, singleton/doubleton counts n1/n2, the
    Good–Turing unseen-mass estimate ``p_unseen = n1/N`` (the probability
    the NEXT token is a new word — the "will more data still add
    vocabulary" curation signal) and the Chao1 richness estimate
    ``V + n1²/(2·n2)`` (a lower bound on the true vocabulary size;
    NULL when n2 = 0, where Chao1 is undefined).

    Everything is an exact integer until the two final divisions, so any
    engine reproduces the row bit-for-bit.  Plan: one tokenize-explode
    projection, one combinable groupBy(word), one 1-row reduce — the same
    two-aggregate shape as build_vocab.
    """
    toks = df.select(
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy().agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n2"),
    ).select(
        "n_tokens", "vocab", "n1", "n2",
        (F.col("n1").cast("double") / F.col("n_tokens")).alias("p_unseen"),
        F.when(
            F.col("n2") > 0,
            F.col("vocab")
            + (F.col("n1") * F.col("n1")).cast("double")
            / (F.lit(2.0) * F.col("n2")),
        ).alias("chao1"),
    )


def log_templates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
    max_tokens: int = 200,
) -> DataFrame:
    """Log-template mining (the Drain idea, made exact and order-free):
    group messages by (token count, first token) — Drain's tree prefix —
    and within each group keep a position's token verbatim iff EVERY
    message agrees on it, else mask it ``<*>``; return the ``top_k``
    ``(template, n_messages)``.  The "what is this service actually
    logging" view that turns a terabyte of text into a hundred shapes —
    and the preprocessing step before counting, ratelimiting or
    anomaly-scoring by template.

    Deterministic by construction: the mask decision is a per-position
    DISTINCT count (no sampling, no similarity threshold, no insertion
    order — unlike online Drain, two engines always produce the same
    templates).  Messages longer than ``max_tokens`` are dropped (one
    pathological line would otherwise fan out its whole length).

    Scale shape: one posexplode of the fact (Σ tokens rows — the same
    mass a tokenizer already touches), one combinable (group, pos)
    aggregate, then everything runs on group×position rows; the
    per-group collect is bounded by ``max_tokens`` structs.

    Reference parity: no reference counterpart — log-analytics
    extension next to text_profile/top_paths (driver brief).
    """
    toks = F.split(F.col(text_col), " ")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            toks.alias("__t"),
            F.size(toks).alias("__n"),
        )
        .filter((F.col("__n") >= 1) & (F.col("__n") <= max_tokens))
        .withColumn("__first", F.col("__t").getItem(0))
    )
    pos = base.select(
        "__n", "__first", "__id", F.posexplode("__t").alias("__p", "__tok")
    )
    cell = pos.groupBy("__n", "__first", "__p").agg(
        F.countDistinct("__tok").alias("__d"),
        F.min("__tok").alias("__m"),
    )
    rendered = cell.withColumn(
        "__r", F.when(F.col("__d") == 1, F.col("__m")).otherwise(F.lit("<*>"))
    )
    tpl = rendered.groupBy("__n", "__first").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__r"))),
                lambda x: x["__r"],
            ),
            " ",
        ).alias("template")
    )
    counts = base.groupBy("__n", "__first").agg(
        F.count(F.lit(1)).cast("long").alias("n_messages")
    )
    return (
        tpl.join(counts, ["__n", "__first"])
        .select("template", "n_messages")
        .orderBy(F.col("n_messages").desc(), F.col("template").asc())
        .limit(top_k)
    )


#: query parameters that never change page identity — the tracking/session
#: junk every crawl pipeline strips before URL-keyed dedup (utm_* is the
#: Google Analytics family; the rest are the big ad/social click ids).
#: Bare ``ref`` is deliberately NOT here: it is a functional identity
#: parameter on common sites (GitHub's ``?ref=<branch>``), so stripping
#: it would collapse distinct pages onto one dedup key and silently drop
#: docs; only the Twitter-style ``ref_src`` tracking variant is stripped.
TRACKING_PARAM_RE = (
    "utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid|ref_src"
)

#: second-level labels under which 2-letter ccTLDs host registrations
#: (co.uk, com.au, ...) — the small-profile public-suffix heuristic.
_SECOND_LEVEL_RE = "co|com|net|org|gov|ac|edu"


def canonicalize_url(
    col: Column, tracking_params: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical URL as one JVM regexp chain — the normalization every
    crawl pipeline runs before URL-keyed dedup, so ``http://WWW.X.com/a/``
    and ``https://x.com:443/a?utm_source=feed`` collapse to one key:

    1. trim, drop the ``#fragment``,
    2. strip the scheme (``anything://``),
    3. lowercase the HOST only (path/query case is page identity),
    4. strip an explicit ``:port`` and a leading ``www.``,
    5. split at the FIRST ``?`` and, in the QUERY part only, drop
       tracking params (``tracking_params``, default
       :data:`TRACKING_PARAM_RE` — an alternation regex callers can
       tune per corpus) and repair the
       separator (a surviving first param regains its ``?``) — the split
       keeps a literal ``&`` in the PATH (a legal RFC 3986 sub-delim)
       untouched, so ``/a&b`` never collapses onto ``/a?b``,
    6. drop a trailing ``/`` on the path and a now-empty ``?``.

    Conservative by design: surviving param ORDER is preserved (sorting
    params can change identity on pathological sites), percent-encoding
    is untouched.  Every rule is a whole-stage-codegen ``regexp_replace``
    with RE2-safe syntax (no lookarounds), so a DuckDB oracle mirrors the
    chain literally with the ``'g'`` flag.

    Reference parity: no reference counterpart — corpus-prep extension
    next to normalize_text (driver brief).
    """
    big = F.lit(2147483647)
    u = F.trim(col)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.regexp_extract(u, r"^([^/?]+)", 1)
    u = F.concat(F.lower(host), F.substring(u, F.length(host) + 1, big))
    # anchored full match: ports must be followed by '/', '?', or end, and
    # ALL stacked ':digits' groups go in one pass — both properties are
    # what make the rule IDEMPOTENT (a partial strip like
    # 'a.co.uk:8080:0' → 'a.co.uk:0', or a mid-token strip gluing new
    # host:digits adjacencies, made canonicalize(canonicalize(u)) ≠
    # canonicalize(u); caught by the idempotence property test)
    u = F.regexp_replace(u, r"^([^/?:]+)(:[0-9]+)+([/?].*)?$", r"$1$3")
    u = F.regexp_replace(u, r"^www\.", "")
    # path/query split at the FIRST '?': query-only rules can never touch
    # a literal '&' or '?'-free tracking-lookalike in the path
    path = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.substring(u, F.length(path) + 1, big)  # '' or leading '?'
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_replace(
        query, r"[?&](" + tracking_params + r")=[^&]*", ""
    )
    query = F.regexp_replace(query, r"[?&]+$", "")
    query = F.regexp_replace(query, r"^&", "?")
    return F.concat(path, query)


def registered_domain(col: Column) -> Column:
    """Registered (pay-level) domain of a CANONICAL url/host — the key
    crawl pipelines group by for per-site caps and train/test splits
    (splitting by full host leaks ``en.wikipedia.org`` vs
    ``de.wikipedia.org``).  Small-profile public-suffix heuristic: last
    two labels, or last THREE when the middle label is a known
    second-level registrar under a 2-letter ccTLD (``example.co.uk``).
    Hosts with no dot (``localhost``) return themselves.  Alternation
    order (3-label form first) is leftmost-preferred in both Java regex
    and RE2, so the DuckDB oracle mirrors it."""
    host = F.regexp_extract(col, r"^([^/?:]+)", 1)
    dom = F.regexp_extract(
        host,
        r"([a-z0-9-]+\.(?:" + _SECOND_LEVEL_RE + r")\.[a-z][a-z]|[a-z0-9-]+\.[a-z0-9-]+)$",
        1,
    )
    return F.when(dom == "", host).otherwise(dom)


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """Rank-frequency power-law fit over the corpus vocabulary — ONE row
    ``(n_terms, zipf_slope, r2, top_term, top_count)`` from an OLS of
    ln(count) on ln(rank) over the ``top_n`` most frequent terms.  A
    natural corpus sits near slope −1 (Zipf's law); a much flatter slope
    flags template/boilerplate floods, a much steeper one a collapsed
    vocabulary — the one-number corpus-health diagnostic next to
    vocab_coverage's saturation view.

    Exactness: ranks are exact integers (ties broken by term, so the
    ranking is engine-independent); ln(rank)/ln(count) are e6-quantized
    BIGINTs; the five moment sums are exact DECIMAL(38,0); slope and R²
    are fixed IEEE chains over their exact-cast values, rounded to 6 dp
    (the ols_trend discipline).

    Scale shape: one combinable term-count aggregate over the corpus
    (the only fact-sized stage), then everything runs on the vocab frame:
    a global top-``top_n`` (orderBy+limit — Spark's TakeOrdered, no full
    sort), one row_number window over ≤``top_n`` rows (bounded, never
    data-sized), one final single-row aggregate.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term")
    ).filter(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("term").asc()).limit(top_n)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), F.col("term").asc())
        ),
    )
    qx = F.floor(
        F.log(F.col("rank").cast("double")) * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    qy = F.floor(
        F.log(F.col("c").cast("double")) * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    dec = "decimal(38,0)"
    agg = ranked.select(
        qx.alias("__x"), qy.alias("__y"), "term", "c", "rank"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum(F.col("__x").cast(dec) * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x").cast(dec) * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y").cast(dec) * F.col("__y")).alias("__syy"),
        F.min_by("term", "rank").alias("top_term"),
        F.max("c").cast("long").alias("top_count"),
    )
    n = F.col("__n").cast(dec)
    dxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dyy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    dxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    ok = (F.col("__n") >= 2) & (dxx > 0)
    slope = F.when(ok, F.round(dxy.cast("double") / dxx.cast("double"), 6))
    r2 = F.when(
        ok & (dyy > 0),
        F.round(
            (dxy.cast("double") * dxy.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
            6,
        ),
    )
    return agg.select(
        F.col("__n").cast("long").alias("n_terms"),
        slope.alias("zipf_slope"),
        r2.alias("r2"),
        "top_term",
        "top_count",
    )


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """nDCG@k of a per-group ranking against BINARY relevance labels —
    per group ``(n_docs, n_rel, ndcg_at_k)``.  The ranking-evaluation
    layer for the retrieval stack (bm25_topk / hybrid_rrf_topk produce
    rankings; this scores them): DCG@k = Σᵢ relᵢ/log₂(i+1) over the
    predicted top-k, normalized by the ideal DCG of min(k, n_rel)
    relevant docs ranked first.

    Exactness: the k position weights ``⌊10⁶/log₂(i+1)+½⌋`` and their
    prefix sums are PYTHON-computed integer literals (k of them), so
    DCG and IDCG are exact BIGINTs and nDCG is ONE IEEE division,
    rounded 6 dp.  The predicted order is (score desc, id asc) — a
    total order, so ranks are engine-independent.  Groups with no
    relevant doc yield NULL (nDCG undefined).

    Scale shape: one per-group top-k window (WindowGroupLimit prunes
    beyond rank k before the sort materializes) plus one combinable
    per-group aggregate for n/n_rel — no global window, no join against
    a weight table (the weights are inlined literals).

    Reference parity: no reference counterpart — retrieval-evaluation
    extension next to bm25_topk (driver brief).
    """
    import math

    from pyspark.sql import Window

    qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]
    cum = []
    s = 0
    for w_ in qw:
        s += w_
        cum.append(s)

    rel = F.col(rel_col).cast("int")
    base = df.filter(
        F.col(score_col).isNotNull() & rel.isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__i"),
        rel.alias("__r"),
    )
    wr = Window.partitionBy("__g").orderBy(
        F.col("__s").desc(), F.col("__i").asc()
    )
    topk = base.withColumn("__rn", F.row_number().over(wr)).filter(
        F.col("__rn") <= k
    )
    dcg = topk.groupBy("__g").agg(
        F.sum(
            F.col("__r").cast("long")
            * F.element_at(F.lit(qw), F.col("__rn").cast("int"))
        ).alias("__dcg2")
    )
    tot = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__r").cast("long").alias("n_rel"),
    )
    j = tot.join(dcg, "__g", "left")
    idcg2 = F.when(
        F.col("n_rel") > 0,
        F.element_at(
            F.lit(cum), F.least(F.col("n_rel"), F.lit(k)).cast("int")
        ),
    )
    return j.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "n_rel",
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.coalesce(F.col("__dcg2"), F.lit(0)).cast("double")
                / idcg2.cast("double"),
                6,
            ),
        ).alias(f"ndcg_at_{k}"),
    ).orderBy(F.col(group_col).asc())


def mrr_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """MRR@k — per group ``(n_docs, n_rel, first_rel_rank, rr_at_k)``:
    the rank of the FIRST relevant doc under (score desc, id asc) and
    its reciprocal, 0.0 when no relevant doc lands in the top k, NULL
    when the group has no relevant doc at all (undefined, same contract
    as :func:`ndcg_at_k`).  The navigational companion of nDCG: nDCG
    rewards the whole top-k ordering, MRR only the first hit — the
    metric for known-item retrieval and agent tool-lookup evals.

    Exactness: the rank is an exact integer from a total order;
    ``rr_at_k = 1/rank`` is ONE IEEE division (correctly rounded,
    engine-identical).  Scale shape: one per-group top-k window
    (WindowGroupLimit prunes beyond rank k before the full sort
    materializes) + one combinable per-group aggregate.

    Reference parity: no reference counterpart — retrieval-evaluation
    extension next to ndcg_at_k (driver brief).
    """
    from pyspark.sql import Window

    rel = F.col(rel_col).cast("int")
    base = df.filter(
        F.col(score_col).isNotNull() & rel.isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__i"),
        rel.alias("__r"),
    )
    wr = Window.partitionBy("__g").orderBy(
        F.col("__s").desc(), F.col("__i").asc()
    )
    topk = base.withColumn("__rn", F.row_number().over(wr)).filter(
        F.col("__rn") <= k
    )
    first = topk.filter(F.col("__r") == 1).groupBy("__g").agg(
        F.min("__rn").cast("long").alias("first_rel_rank")
    )
    tot = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__r").cast("long").alias("n_rel"),
    )
    j = tot.join(first, "__g", "left")
    return j.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "n_rel",
        F.when(F.col("n_rel") > 0, F.col("first_rel_rank")).alias(
            "first_rel_rank"
        ),
        F.when(
            F.col("n_rel") > 0,
            F.coalesce(
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
                F.lit(0.0),
            ),
        ).alias(f"rr_at_{k}"),
    ).orderBy(F.col(group_col).asc())


def paired_ndcg_sign_test(
    df: DataFrame,
    group_col: str,
    score_a_col: str,
    score_b_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Paired comparison of TWO rankers on the same queries — the A/B
    readout for retrieval (``ndcg_at_k`` scores one ranking; this decides
    whether ranker A beats ranker B): per query group, rank the same docs
    by ``score_a`` and by ``score_b``, compare their nDCG@k, and run a
    sign test over the per-query wins.  One row: ``(n_queries, a_wins,
    b_wins, ties, sum_dcg2_a, sum_dcg2_b, z)``.

    Exactness — the per-query verdict is an EXACT INTEGER comparison:
    both rankings share the group's relevance set, so IDCG cancels and
    ``sign(nDCG_a − nDCG_b) = sign(DCG2_a − DCG2_b)`` where DCG2 are the
    exact BIGINT dot products against the Python-literal position weights
    (same ``⌊10⁶/log₂(i+1)+½⌋`` table as :func:`ndcg_at_k`).  No IEEE op
    touches a win/tie decision.  The sign-test statistic
    ``z = (a_wins − b_wins)/√(a_wins + b_wins)`` (ties dropped, the
    standard continuity-free normal approximation, same convention as
    ``ab_test_ztest``'s z) is two correctly-rounded IEEE ops on exact
    integers — engine-reproducible bit-for-bit.  NULL when every query
    ties.  Groups with no relevant doc are excluded (nDCG undefined).

    Scale shape: one shuffle on the group key serving two window sorts
    (rank by A, rank by B — WindowGroupLimit prunes both beyond k), one
    combinable per-group aggregate, one 1-row reduce.  No join against a
    weight table (weights are inlined literals), no driver collect.

    Reference parity: no reference counterpart — retrieval-evaluation
    extension next to ndcg_at_k (driver brief).
    """
    import math

    from pyspark.sql import Window

    qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]

    rel = F.col(rel_col).cast("int")
    base = df.filter(
        F.col(score_a_col).isNotNull()
        & F.col(score_b_col).isNotNull()
        & rel.isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(score_a_col).alias("__sa"),
        F.col(score_b_col).alias("__sb"),
        F.col(id_col).alias("__i"),
        rel.alias("__r"),
    )
    wa = Window.partitionBy("__g").orderBy(
        F.col("__sa").desc(), F.col("__i").asc()
    )
    wb = Window.partitionBy("__g").orderBy(
        F.col("__sb").desc(), F.col("__i").asc()
    )
    ranked = base.select(
        "__g",
        "__r",
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wb).alias("__rb"),
    )
    w_at = lambda rn: F.when(  # noqa: E731 — weight lookup, 0 beyond k
        rn <= k, F.element_at(F.lit(qw), rn.cast("int"))
    ).otherwise(F.lit(0))
    per_q = ranked.groupBy("__g").agg(
        F.sum(F.col("__r").cast("long") * w_at(F.col("__ra"))).alias("__da"),
        F.sum(F.col("__r").cast("long") * w_at(F.col("__rb"))).alias("__db"),
        F.sum("__r").cast("long").alias("__nrel"),
    ).filter(F.col("__nrel") > 0)
    out = per_q.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum((F.col("__da") > F.col("__db")).cast("long")).alias("a_wins"),
        F.sum((F.col("__da") < F.col("__db")).cast("long")).alias("b_wins"),
        F.sum((F.col("__da") == F.col("__db")).cast("long")).alias("ties"),
        F.sum("__da").cast("long").alias("sum_dcg2_a"),
        F.sum("__db").cast("long").alias("sum_dcg2_b"),
    )
    m = F.col("a_wins") + F.col("b_wins")
    return out.select(
        "n_queries",
        "a_wins",
        "b_wins",
        "ties",
        "sum_dcg2_a",
        "sum_dcg2_b",
        F.when(
            m > 0,
            (F.col("a_wins") - F.col("b_wins")).cast("double")
            / F.sqrt(m.cast("double")),
        ).alias("z"),
    )


def readability_scores(
    df: DataFrame,
    content_col: str,
    group_col: str,
) -> DataFrame:
    """Flesch reading-ease per group — ``(n_docs, words, sentences,
    syllable_groups, flesch)`` with

        flesch = 206.835 − 1.015·(W/S) − 84.6·(Y/W)

    over the group's total word (W), sentence (S) and syllable-group (Y)
    counts.  The classic text-quality feature for corpus filtering:
    alongside the Gopher rules and stopword ratios, reading-ease
    separates boilerplate/navigation text (short fragments, few
    syllables) from prose.  Syllables use the standard vowel-group
    heuristic (one ``[aeiouy]+`` run ≈ one syllable); documents with no
    terminal punctuation count as ONE sentence (the convention — the
    ratio degrades to words-per-doc, it never divides by zero).

    Exactness: all three counts are JVM ``regexp_count``/``size`` exact
    integers summed per group; the score is a fixed IEEE chain on the
    three sums, rounded 6 dp — literal constants, no libm beyond ÷.

    Scale shape: pure per-row codegen regex counts + ONE combinable
    per-group aggregate.  No window, no join, no shuffle beyond the
    groupBy.

    Reference parity: no reference counterpart — text-quality extension
    next to text_profile/gopher rules (driver brief).
    """
    c = F.col(content_col)
    words = F.size(F.split(F.trim(c), r"\s+"))
    sentences = F.greatest(F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1))
    syll = F.regexp_count(c, F.lit(r"[aeiouyAEIOUY]+"))
    per = df.filter(c.isNotNull()).select(
        F.col(group_col).alias("__g"),
        words.cast("long").alias("__w"),
        sentences.cast("long").alias("__s"),
        syll.cast("long").alias("__y"),
    )
    agg = per.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("words"),
        F.sum("__s").cast("long").alias("sentences"),
        F.sum("__y").cast("long").alias("syllable_groups"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6)
        * (
            F.col("syllable_groups").cast("double")
            / F.col("words").cast("double")
        )
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "words",
        "sentences",
        "syllable_groups",
        F.when(F.col("words") > 0, F.round(flesch, 6)).alias("flesch"),
    ).orderBy(F.col(group_col).asc())


def tokenizer_fertility(
    df: DataFrame,
    content_col: str,
    group_col: str,
) -> DataFrame:
    """Tokenizer fertility per group — ``(n_docs, ws_tokens, subwords,
    fertility)`` where fertility = subword tokens per whitespace word
    (``bpe_ish_token_count`` / ``token_count``).  THE multilingual-
    corpus budgeting number: a language whose fertility is 2× pays 2×
    the context window and 2× the training compute per word — the mix
    designer needs this per language before setting sampling weights.

    Exactness: both counts are exact codegen-regex integers summed per
    group; fertility is ONE IEEE division, rounded 6 dp (NULL for a
    group with zero words).

    Scale shape: pure per-row regex counts + ONE combinable per-group
    aggregate — no window, no join.

    Reference parity: no reference counterpart — tokenization extension
    next to token_count/vocab_coverage (driver brief).
    """
    c = F.col(content_col)
    per = df.filter(c.isNotNull()).select(
        F.col(group_col).alias("__g"),
        token_count(c).cast("long").alias("__w"),
        bpe_ish_token_count(c).cast("long").alias("__s"),
    )
    agg = per.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__w").cast("long").alias("ws_tokens"),
        F.sum("__s").cast("long").alias("subwords"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_docs",
        "ws_tokens",
        "subwords",
        F.when(
            F.col("ws_tokens") > 0,
            F.round(
                F.col("subwords").cast("double")
                / F.col("ws_tokens").cast("double"),
                6,
            ),
        ).alias("fertility"),
    ).orderBy(F.col(group_col).asc())


def type_token_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Lexical-diversity profile per group — ``(group?, n_docs,
    n_tokens, n_types, ttr, hapax_ratio)``: type-token ratio (distinct
    terms / total terms) and the hapax share (terms seen exactly once /
    distinct terms).  The vocabulary-health companion of zipf_slope: a
    boilerplate-flooded source shows a collapsing TTR, an OCR/noise
    source an exploding hapax ratio — two numbers that catch both
    failure modes before training data ships.

    Tokenization: lowercased whitespace split (the zipf_slope /
    vocab_coverage convention) — the documented metric is whitespace-
    token TTR, identical in any engine.

    Exactness: every statistic is an exact integer count; ttr and
    hapax_ratio are single IEEE divisions, rounded 6 dp.

    Scale shape: one combinable (group, term) aggregate over the corpus
    (the only data-sized stage), one per-group reduce over the vocab
    frame, one |groups|-row doc-count join (AQE broadcasts it).  No
    window, no collect.

    Reference parity: no reference counterpart — corpus-analysis
    extension next to zipf_slope/vocab_coverage (driver brief).
    """
    gcols = [F.col(group_col).alias("group")] if group_col else []
    terms = df.filter(F.col(text_col).isNotNull()).select(
        *gcols,
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    keys = ["group"] if group_col else []
    counts = terms.groupBy(*keys, "term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    vocab = counts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("__c").cast("long").alias("n_tokens"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias("__hapax"),
    )
    docs = df.filter(F.col(text_col).isNotNull()).select(*gcols).groupBy(
        *keys
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    j = vocab.join(docs, keys) if keys else vocab.crossJoin(docs)
    return j.select(
        *keys,
        "n_docs",
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("ttr"),
        F.when(
            F.col("n_types") > 0,
            F.round(
                F.col("__hapax").cast("double")
                / F.col("n_types").cast("double"),
                6,
            ),
        ).alias("hapax_ratio"),
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit — ONE row ``(n_docs, n_tokens,
    n_types, heaps_beta, heaps_lnk, r2)``: OLS of ln V on ln N over
    ``n_buckets`` corpus PREFIXES, where V(N) is the distinct-type
    count after N tokens.  Natural text sits near β ≈ 0.5 (Heaps' law);
    β → 0 means the vocabulary has saturated (dedup/boilerplate), β →
    1 means near-random strings (OCR noise) — the GROWTH companion of
    zipf_slope's static rank view, and together the two-number corpus
    fingerprint.

    Prefixes WITHOUT a data-sized sort: docs are range-bucketed by
    ``id_col`` into ``n_buckets`` contiguous ranges (one 1-row max-id
    broadcast), each type contributes its FIRST bucket (min over a
    combinable groupBy term), and both V_g and N_g are cumulative sums
    over the ``n_buckets``-row frame — so "prefix" means "docs with id
    ≤ the bucket boundary", deterministic in any engine.

    Exactness: all counts are exact integers; ln N / ln V are
    e6-quantized BIGINTs and the OLS moments exact DECIMAL(38,0) (the
    zipf_slope discipline); slope/intercept/R² are fixed IEEE chains,
    rounded 6 dp.

    Scale shape: one combinable (term → first bucket) aggregate and one
    per-doc token-count aggregate over the corpus (the two data-sized
    stages), then everything runs on the ``n_buckets``-row frame: two
    bounded cumulative windows, one 1-row OLS reduce.

    Reference parity: no reference counterpart — corpus-analysis
    extension next to zipf_slope (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    )
    mx = base.agg(
        (F.max(F.col(id_col).cast("long")) + 1).alias("__mx"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    # clamp BOTH ends: the docstring's range-bucket contract assumes
    # non-negative ids, but a negative id (or an all-negative corpus,
    # where max(id)+1 <= 0) must degrade to bucket 0 / bucket n-1
    # deterministically instead of emitting negative or NULL buckets
    # silently (r8 advice).
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                F.col(id_col).cast("double")
                * F.lit(float(n_buckets))
                / F.greatest(F.col("__mx").cast("double"), F.lit(1.0))
            ).cast("int"),
        ),
    )
    docs = base.crossJoin(F.broadcast(mx)).select(
        bucket.alias("__b"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )
    terms = docs.select(
        "__b", F.explode("__toks").alias("term")
    ).filter(F.col("term") != "")
    # each type counts once, in its FIRST prefix bucket
    first = terms.groupBy("term").agg(F.min("__b").alias("__b"))
    v_per = first.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__v")
    )
    n_per = terms.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    grid = n_per.join(v_per, "__b", "left").select(
        "__b",
        F.col("__t"),
        F.coalesce(F.col("__v"), F.lit(0)).alias("__v"),
    )
    w_cum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded n_buckets-row cumulative frame
    pts = grid.select(
        F.sum("__t").over(w_cum).alias("__N"),
        F.sum("__v").over(w_cum).alias("__V"),
    ).filter((F.col("__N") > 0) & (F.col("__V") > 0))
    qx = F.floor(
        F.log(F.col("__N").cast("double")) * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    qy = F.floor(
        F.log(F.col("__V").cast("double")) * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    agg = pts.select(
        qx.alias("__x"), qy.alias("__y"), "__N", "__V"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum(F.col("__x").cast(dec) * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x").cast(dec) * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y").cast(dec) * F.col("__y")).alias("__syy"),
        F.max("__N").cast("long").alias("n_tokens"),
        F.max("__V").cast("long").alias("n_types"),
    )
    ndc = mx.select(F.col("n_docs"))
    n = F.col("__n").cast(dec)
    dxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dyy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    dxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    ok = (F.col("__n") >= 2) & (dxx > 0)
    beta = F.when(ok, F.round(dxy.cast("double") / dxx.cast("double"), 6))
    lnk = F.when(
        ok,
        F.round(
            (
                F.col("__sy").cast("double")
                - (dxy.cast("double") / dxx.cast("double"))
                * F.col("__sx").cast("double")
            )
            / F.col("__n").cast("double")
            / F.lit(1.0e6),
            6,
        ),
    )
    r2 = F.when(
        ok & (dyy > 0),
        F.round(
            (dxy.cast("double") * dxy.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
            6,
        ),
    )
    # 1-row × 1-row scalar crossJoin
    return agg.crossJoin(F.broadcast(ndc)).select(
        "n_docs",
        "n_tokens",
        "n_types",
        beta.alias("heaps_beta"),
        lnk.alias("heaps_lnk"),
        r2.alias("r2"),
    )


def good_turing_unseen(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Good–Turing unseen-mass estimate over the corpus vocabulary —
    ONE row ``(n_tokens, n_types, n_singletons, n_doubletons, p_unseen,
    gt_r1)``: the probability that the NEXT token is a type never seen
    before, p₀ = N₁/N (Good 1953), plus the smoothed expected count for
    once-seen types r₁* = 2·N₂/N₁.  The coverage-planning number for a
    training corpus: p₀ ≈ 0 means more data adds no new vocabulary;
    large p₀ means the corpus undersamples its domain — the decision
    input behind "do we need another crawl?".

    Tokenization: lowercased whitespace split (the zipf_slope
    convention).  Exactness: N, N₁, N₂ and the type count are exact
    integers; p_unseen and gt_r1 are single IEEE divisions, rounded
    6 dp (gt_r1 NULL when N₁ = 0).

    Scale shape: one combinable term-count aggregate over the corpus,
    one 1-row conditional reduce over the vocab frame.  No window, no
    join, no collect.

    Reference parity: no reference counterpart — corpus-analysis
    extension next to vocab_coverage (driver brief).
    """
    terms = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term")
    ).filter(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("__c") == 1).cast("long")).cast("long").alias(
            "n_singletons"
        ),
        F.sum((F.col("__c") == 2).cast("long")).cast("long").alias(
            "n_doubletons"
        ),
    )
    return agg.select(
        "n_tokens",
        "n_types",
        "n_singletons",
        "n_doubletons",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_singletons").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).alias("p_unseen"),
        F.when(
            F.col("n_singletons") > 0,
            F.round(
                F.lit(2.0)
                * F.col("n_doubletons").cast("double")
                / F.col("n_singletons").cast("double"),
                6,
            ),
        ).alias("gt_r1"),
    )


def burrows_delta(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_n: int = 50,
) -> DataFrame:
    """Burrows' Delta stylometric distance between groups — per group
    pair ``(group_a, group_b, delta, n_terms)``: the mean |z-score
    difference| of the ``top_n`` most frequent corpus terms' relative
    frequencies (Burrows 2002).  The corpus-forensics companion of
    js_drift: JS asks "do the sources draw different WORDS", Delta asks
    "do they use the SAME words differently" — the function-word
    signature that flags a machine-generated or style-shifted slice
    whose vocabulary looks normal.

    Exactness: per-group relative frequencies are exact integer floor
    divisions ``⌊c·10⁹/tokens_g⌋``; the per-term mean/std over the k
    groups are exact DECIMAL moments; z-scores are e6-floor-REquantized
    BIGINTs (one identical IEEE chain per (group, term) in any engine),
    so the cross-term |z_a − z_b| sums are ORDER-FREE integers and
    delta is one final division, rounded 6 dp.  Zero-variance terms
    (identical rate everywhere) drop from every pair identically.

    Scale shape: one combinable term-count aggregate over the corpus
    (the only data-sized stage), a global top-``top_n`` TakeOrdered, a
    broadcast of the ≤top_n vocabulary onto the (group, term) cells,
    per-term k-row moments, one bounded |groups|²·top_n pair join.  No
    collect.

    Reference parity: no reference counterpart — corpus-forensics
    extension next to js_drift/zipf_slope (driver brief).
    """
    dec = "decimal(38,0)"
    terms = df.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__grp"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    cells = terms.groupBy("__grp", "term").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    vocab = (
        cells.groupBy("term")
        .agg(F.sum("__c").cast("long").alias("__tot"))
        .orderBy(F.col("__tot").desc(), F.col("term").asc())
        .limit(top_n)
        .select("term")
    )
    gtot = cells.groupBy("__grp").agg(
        F.sum("__c").cast(dec).alias("__gt")
    )
    # dense |groups| × top_n frame: absent terms carry rate 0
    dense = (
        gtot.crossJoin(F.broadcast(vocab))
        .join(cells, ["__grp", "term"], "left")
        .select(
            "__grp",
            "term",
            F.coalesce(F.col("__c"), F.lit(0)).cast(dec).alias("__c"),
            "__gt",
        )
    )
    e9 = F.lit(1000000000).cast(dec)
    num = F.col("__c") * e9
    dense = dense.withColumn(
        "__f", ((num - F.pmod(num, F.col("__gt"))) / F.col("__gt")).cast(dec)
    )
    stats = dense.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum("__f").alias("__sf"),
        F.sum(F.col("__f") * F.col("__f")).alias("__sff"),
    )
    z = dense.join(F.broadcast(stats), "term")
    k = F.col("__k").cast(dec)
    var_num = k * F.col("__sff") - F.col("__sf") * F.col("__sf")
    # z·10⁶ as a BIGINT: one identical IEEE chain per (group, term), so
    # the cross-term sums below are order-free (the eb/ips discipline)
    # (k·f − sf)/√(k·sff − sf²) = (f − μ)/σ_pop exactly (both scaled by k)
    zq = F.floor(
        (
            (k * F.col("__f") - F.col("__sf")).cast("double")
            / F.sqrt(var_num.cast("double"))
        )
        * F.lit(1.0e6)
        + F.lit(0.5)
    ).cast("long")
    z = z.filter(var_num > 0).select("__grp", "term", zq.alias("__z"))
    other = z.select(
        F.col("__grp").alias("__grp2"),
        "term",
        F.col("__z").alias("__z2"),
    )
    pairs = (
        z.join(other, "term")
        .filter(F.col("__grp") < F.col("__grp2"))
        .groupBy("__grp", "__grp2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.abs(F.col("__z") - F.col("__z2")).cast(dec)).alias(
                "__sd"
            ),
        )
    )
    return pairs.select(
        F.col("__grp").alias("group_a"),
        F.col("__grp2").alias("group_b"),
        F.round(
            F.col("__sd").cast("double")
            / F.col("n_terms").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("delta"),
        "n_terms",
    )


def doc_novelty_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group profile of document NOVELTY — ``(group, n_docs,
    mean_novelty, min_novelty, max_novelty)`` where a document's novelty
    is its mean token surprisal ``(1/|d|)·Σ ln(N/c_t)`` in nats against
    the corpus unigram model.  The template-flood detector: a boilerplate
    page scores near the corpus floor (every token common), an
    OCR-garbage page near the ceiling (every token rare) — min/max bound
    the group's extremes, the mean ranks sources by information density.
    The PER-DOC companion of unigram_nll's corpus number.

    Exactness: per-term surprisal ``⌊ln(N/c_t)·10⁶ + ½⌋`` is computed
    ONCE per vocabulary entry (same libm double in any engine); a doc's
    sum is an exact integer, its mean an exact integer FLOOR division
    (the eb/ips discipline), so the cross-doc group sums are order-free;
    outputs are single IEEE divisions, rounded 6 dp.

    Scale shape: one combinable term-count aggregate (vocab build), one
    term-keyed equi-join of the exploded corpus onto the vocab frame
    (the tfidf shape), one per-doc reduce, one per-group reduce.  No
    window, no collect.

    Reference parity: no reference counterpart — corpus-analysis
    extension next to unigram_nll/zipf_slope (driver brief).
    """
    dec = "decimal(38,0)"
    # NOTE: __doc keys the per-doc reduce.  monotonically_increasing_id()
    # is consistent within this single lineage branch, but is NOT stable
    # across stage retries / speculative execution over non-deterministic
    # sources — callers with such inputs should supply a real doc key
    # column instead (r8 advice; same caveat as centroid_silhouette).
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.monotonically_increasing_id().alias("__doc"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )
    terms = base.select(
        "group", "__doc", F.explode("__toks").alias("term")
    ).filter(F.col("term") != "")
    vocab = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("__ct")
    )
    tot = vocab.agg(F.sum("__ct").cast("long").alias("__N"))
    voc = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(
            F.log(
                F.col("__N").cast("double") / F.col("__ct").cast("double")
            )
            * F.lit(1.0e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__surp"),
    )
    j = terms.join(voc, "term")
    per_doc = j.groupBy("group", "__doc").agg(
        F.sum(F.col("__surp").cast(dec)).alias("__s"),
        F.count(F.lit(1)).cast(dec).alias("__nt"),
    )
    # per-doc mean as an exact integer floor (order-free group sums)
    nov = ((F.col("__s") - F.pmod(F.col("__s"), F.col("__nt"))) / F.col("__nt")).cast(dec)
    per_doc = per_doc.withColumn("__nov", nov)
    out = per_doc.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nov").alias("__sum"),
        F.min("__nov").alias("__min"),
        F.max("__nov").alias("__max"),
    )
    return out.select(
        "group",
        "n_docs",
        F.round(
            F.col("__sum").cast("double")
            / F.col("n_docs").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("mean_novelty"),
        F.round(F.col("__min").cast("double") / F.lit(1.0e6), 6).alias(
            "min_novelty"
        ),
        F.round(F.col("__max").cast("double") / F.lit(1.0e6), 6).alias(
            "max_novelty"
        ),
    )


def fightin_words(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 10,
    alpha0: float = 200.0,
) -> DataFrame:
    """Monroe–Colaresi–Quinn "fightin' words" (2008): per group, the
    ``top_k`` terms whose usage rate most EXCEEDS the rest of the
    corpus, scored by the log-odds-ratio z with an informative
    Dirichlet prior — ``(group, term, count, z_logodds, rank)``.  The
    which-words companion of burrows_delta's one-number distance: Delta
    says two sources diverge, this names the terms responsible, and the
    corpus-proportional prior (αₜ = α₀·cₜ/N) keeps rare terms from
    dominating the way raw log-odds or TF-IDF contrasts do.

    Determinism: counts are exact integers; δ and its variance
    approximation 1/(c₉ₜ+αₜ) + 1/(cᵣₜ+αₜ) are fixed IEEE chains over
    exact integers and the two float constants (α₀, the prior), so z is
    the same double in any engine; it is e6-quantized before the
    per-group top-k (rank ties break by term), making the selection an
    exact integer sort.

    Scale shape: one combinable (group, term) aggregate over the corpus
    (the only data-sized stage), one 1-row total broadcast + one
    vocab-frame term-total join onto the cell frame, one per-group
    top-k window over the VOCAB-sized frame (WindowGroupLimit prunes to
    k per group before the final shuffle).  No collect.

    Reference parity: no reference counterpart — corpus-forensics
    extension next to burrows_delta/tfidf (driver brief).
    """
    from pyspark.sql import Window

    terms = df.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    cells = terms.groupBy("group", "term").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tterm = cells.groupBy("term").agg(F.sum("__c").cast("long").alias("__ct"))
    gtot = cells.groupBy("group").agg(F.sum("__c").cast("long").alias("__ng"))
    tot = tterm.agg(F.sum("__ct").cast("long").alias("__N"))
    j = (
        cells.join(tterm, "term")
        .join(F.broadcast(gtot), "group")
        .crossJoin(F.broadcast(tot))
    )
    a_t = (
        F.lit(alpha0)
        * F.col("__ct").cast("double")
        / F.col("__N").cast("double")
    )
    cg = F.col("__c").cast("double")
    cr = (F.col("__ct") - F.col("__c")).cast("double")
    ng = F.col("__ng").cast("double")
    nr = (F.col("__N") - F.col("__ng")).cast("double")
    a0 = F.lit(alpha0)
    delta = F.log((cg + a_t) / (ng + a0 - cg - a_t)) - F.log(
        (cr + a_t) / (nr + a0 - cr - a_t)
    )
    var = F.lit(1.0) / (cg + a_t) + F.lit(1.0) / (cr + a_t)
    zq = F.floor(delta / F.sqrt(var) * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    scored = j.select("group", "term", F.col("__c").alias("count"), zq.alias("__zq"))
    w = Window.partitionBy("group").orderBy(
        F.col("__zq").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "group",
            "term",
            "count",
            F.round(F.col("__zq").cast("double") / F.lit(1.0e6), 6).alias(
                "z_logodds"
            ),
            "rank",
        )
    )


def hill_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Hill-number diversity profile per group — ``(group, n_tokens,
    richness, hill_q1, hill_q2)``: the ecologist's three-point summary
    applied to vocabulary.  q=0 is raw type richness (rare-term
    dominated), q=1 = exp(Shannon H) is the "effective vocabulary" at
    proportional weighting, q=2 = 1/Simpson = N²/Σc² is dominated by the
    most common terms.  Reading the three TOGETHER diagnoses shape:
    richness ≫ q1 ≫ q2 means a long rare tail over a few dominating
    stopwords (natural text); all three close means templated output.

    Exactness: richness and the Simpson rational N²/Σc² are exact
    integers; Shannon uses the transition_entropy discipline (one
    e6-quantized log per DISTINCT count cell, order-free integer sum)
    and one final exp — the same libm double in any engine — rounded
    4 dp (q2 likewise).

    Scale shape: one combinable (group, term) aggregate, one per-group
    reduce.  No window, no join, no collect.

    Reference parity: no reference counterpart — corpus-analysis
    extension next to entropy_per_source/vocab_coverage (driver brief).
    """
    dec = "decimal(38,0)"
    terms = df.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    cells = terms.groupBy("group", "term").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    gtot = cells.groupBy("group").agg(F.sum("__c").cast("long").alias("__n"))
    j = cells.join(gtot, "group")
    # per-cell  c·⌊ln(n/c)·10⁶⌉ — H = Σ(c/n)ln(n/c) = (Σ terms)/(n·10⁶)
    lterm = F.col("__c").cast(dec) * F.floor(
        F.log(
            F.col("__n").cast("double") / F.col("__c").cast("double")
        )
        * F.lit(1.0e6)
        + F.lit(0.5)
    ).cast("long")
    agg = j.groupBy("group").agg(
        F.max("__n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("richness"),
        F.sum(lterm).alias("__h6"),
        F.sum(F.col("__c").cast(dec) * F.col("__c")).alias("__cc"),
    )
    h = F.col("__h6").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1.0e6)
    )
    q2 = (
        F.col("n_tokens").cast("double")
        * F.col("n_tokens").cast("double")
        / F.col("__cc").cast("double")
    )
    return agg.select(
        "group",
        "n_tokens",
        "richness",
        F.round(F.exp(h), 4).alias("hill_q1"),
        F.round(q2, 4).alias("hill_q2"),
    )


def vocab_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise vocabulary Jaccard between groups — ``(group_a, group_b,
    v_a, v_b, n_shared, jaccard)``: |V_a ∩ V_b| / |V_a ∪ V_b| over the
    distinct whitespace-token vocabularies.  The SET-overlap companion
    of burrows_delta (usage rates) and js_drift (distributions): two
    crawls of the same site show jaccard ≈ 1 (merge them), two domains
    ≈ 0 (keep both) — the redundancy matrix for corpus mixing.

    Exactness: every statistic is an exact integer count; jaccard is
    one division, rounded 6 dp.

    Scale shape: one distinct (group, term) aggregate over the corpus
    (the only data-sized stage), one term-keyed self-join of the vocab
    frame restricted to co-occurring terms (posting-list style — a term
    in k groups yields k(k−1)/2 pair rows, bounded by |groups|²), one
    per-pair reduce joined onto the |groups|-row richness frame twice.

    Reference parity: no reference counterpart — corpus-composition
    extension next to burrows_delta/audience_overlap (driver brief).
    """
    cells = (
        df.filter(F.col(text_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    rich = cells.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("__v"))
    other = cells.select(F.col("__g").alias("__g2"), "term")
    inter = (
        cells.join(other, "term")
        .filter(F.col("__g") < F.col("__g2"))
        .groupBy("__g", "__g2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    ra = rich.select(F.col("__g"), F.col("__v").alias("v_a"))
    rb = rich.select(F.col("__g").alias("__g2"), F.col("__v").alias("v_b"))
    j = inter.join(F.broadcast(ra), "__g").join(F.broadcast(rb), "__g2")
    union = F.col("v_a") + F.col("v_b") - F.col("n_shared")
    return j.select(
        F.col("__g").alias("group_a"),
        F.col("__g2").alias("group_b"),
        "v_a",
        "v_b",
        "n_shared",
        F.when(
            union > 0,
            F.round(F.col("n_shared").cast("double") / union.cast("double"), 6),
        ).alias("jaccard"),
    )


def langid_prf1(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Per-class precision / recall / F1 of the lang_id_heuristic
    against recorded labels — ``(lang, n_true, n_pred, tp, precision,
    recall, f1)``.  The per-class readout behind lang_confusion's raw
    matrix and lang_id_kappa's single agreement number: kappa says THE
    CLASSIFIER is decent, this names the language it fails on (the one
    whose data a multilingual corpus then under-collects).  Classes are
    the union of true and predicted labels; a class never predicted
    reports precision NULL, never true reports recall NULL.

    Exactness: all counts exact integers; P/R are single divisions and
    F1 = 2·tp/(n_true + n_pred) — the algebraic form that avoids the
    P·R/(P+R) float roundtrip — rounded 6 dp.

    Scale shape: one combinable (true, pred) confusion aggregate over
    the corpus, two class-sized marginal reduces, two broadcast joins
    on the |classes|-row frame.  No window, no collect.

    Reference parity: no reference counterpart — evaluation extension
    next to lang_confusion/cohens_kappa (driver brief).
    """
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("__true"),
        lang_id_heuristic(F.col(text_col)).alias("__pred"),
    )
    cells = base.groupBy("__true", "__pred").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    true_m = cells.groupBy("__true").agg(
        F.sum("__n").cast("long").alias("n_true")
    ).select(F.col("__true").alias("lang"), "n_true")
    pred_m = cells.groupBy("__pred").agg(
        F.sum("__n").cast("long").alias("n_pred")
    ).select(F.col("__pred").alias("lang"), "n_pred")
    tp = cells.filter(F.col("__true") == F.col("__pred")).select(
        F.col("__true").alias("lang"), F.col("__n").alias("tp")
    )
    classes = (
        true_m.select("lang")
        .unionByName(pred_m.select("lang"))
        .distinct()
    )
    j = (
        classes.join(F.broadcast(true_m), "lang", "left")
        .join(F.broadcast(pred_m), "lang", "left")
        .join(F.broadcast(tp), "lang", "left")
        .select(
            "lang",
            F.coalesce(F.col("n_true"), F.lit(0)).alias("n_true"),
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0,
        F.round(F.col("tp").cast("double") / F.col("n_pred").cast("double"), 6),
    )
    rec = F.when(
        F.col("n_true") > 0,
        F.round(F.col("tp").cast("double") / F.col("n_true").cast("double"), 6),
    )
    f1 = F.when(
        (F.col("n_true") + F.col("n_pred")) > 0,
        F.round(
            F.lit(2.0)
            * F.col("tp").cast("double")
            / (F.col("n_true") + F.col("n_pred")).cast("double"),
            6,
        ),
    )
    return j.select(
        "lang", "n_true", "n_pred", "tp",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


# ---------------------------------------------------------------------------
# distributed BPE merge training (r10): learn the merge table at corpus
# scale, then encode with it — the step beyond bpe_merge_candidates
# ---------------------------------------------------------------------------

#: symbol terminator for the BPE string representation — a char that never
#: appears inside a whitespace-split word of the corpora this trains on
#: (train_bpe drops the pathological word that does contain it, loudly in
#: its docstring).  chr(31) = ASCII unit separator.
BPE_SEP = "\x1f"


def _bpe_symbol_string(w) -> Column:
    """A word as a WRAPPED symbol string — every symbol carries BOTH its
    own boundaries: 'abc' -> '<SEP>a<SEP><SEP>b<SEP><SEP>c<SEP>'.  Merging
    pair (x, y) is then ONE substring replace of '<SEP>x<SEP><SEP>y<SEP>'
    with '<SEP>xy<SEP>'.

    Why both boundaries (the r10 representation carried only the trailing
    one): a trailing-only pattern 'a<SEP>b<SEP>' has no LEFT boundary, so
    it can consume the SUFFIX of a longer preceding symbol — on symbols
    ['xa','b'] ('xa<SEP>b<SEP>') the merge (a,b) wrongly fired, yielding
    'xab'.  With the wrapped form, 'a' in '<SEP>xa<SEP><SEP>b<SEP>' is
    preceded by 'x', never by <SEP>, so the pattern cannot match.

    Exactness: a match of '<SEP>l<SEP><SEP>r<SEP>' can only start at a
    symbol's left boundary (string start, or the 2nd <SEP> of a
    double — both fine) and spans exactly the adjacent pair (l, r); the
    replacement '<SEP>lr<SEP>' re-supplies the merged symbol's wrapper
    while the pattern consumed only the FIRST <SEP> of r's trailing
    double, so the NEXT symbol keeps its own left boundary and the
    non-overlapping left-to-right scan both engines implement resumes
    exactly at symbol i+2 — textbook greedy within-word merging:
    'a a a a a' -> 'aa aa a', 'a b a b' -> 'ab ab' (verified against a
    tuple-based reference trainer in tools/soak_r10.py, including a
    suffix-trigger corpus xa/ab/xab)."""
    return F.concat(
        F.lit(BPE_SEP),
        F.array_join(F.split(w, ""), BPE_SEP + BPE_SEP),
        F.lit(BPE_SEP),
    )


def _bpe_symbols(s: Column) -> Column:
    """The symbol array of a wrapped symbol string: split on <SEP> and
    drop the empty fragments the boundary pairs produce (symbols are
    never empty — they are concatenations of word characters)."""
    return F.filter(F.split(s, BPE_SEP), lambda x: x != "")


def _bpe_merge_pattern(l: str, r: str) -> "tuple[str, str]":
    """(pattern, replacement) for merging adjacent symbols (l, r) in the
    wrapped representation."""
    return (
        f"{BPE_SEP}{l}{BPE_SEP}{BPE_SEP}{r}{BPE_SEP}",
        f"{BPE_SEP}{l}{r}{BPE_SEP}",
    )


#: merge rounds between lineage materializations in the BPE/WordPiece
#: trainers and the batched merge-replay: round r otherwise recomputes an
#: r-deep chained ``replace`` over the cached word table (O(k²) total
#: string rewrites and a k-deep plan at k merges).  localCheckpoint every
#: CHECKPOINT_EVERY rounds keeps per-round cost flat — the pagerank
#: half-iteration-checkpoint discipline (cluster.py).
BPE_CHECKPOINT_EVERY = 32


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 6,
    max_word_len: int = 64,
) -> "list[tuple[int, str, str, int]]":
    """Distributed BPE merge-table training (Sennrich et al. 2016) —
    the LEARNING step ``bpe_merge_candidates`` only counts for: ``merges``
    rounds of (count adjacent symbol pairs weighted by word frequency ->
    merge the argmax pair everywhere), returning
    ``[(round, left, right, pair_count), ...]``.

    Deterministic: argmax tie-break is (count DESC, left ASC, right ASC) —
    binary string order in both engines — so the merge table is
    reproducible and oracle-checkable round for round.

    Scale shape (the pagerank/kcore bounded-iteration discipline):
    (1) ONE corpus-sized pass collapses to the distinct-word frequency
    table (vocabulary-sized, sublinear by Heaps' law), cached; every
    round after that touches ONLY the word table.  (2) Per round: explode
    adjacent symbol pairs off distinct words (map-side-combinable sum),
    TakeOrdered-style top-1 to the driver (ONE row — bounded metadata,
    the same discipline as kcore's scalar k), then one codegen'd
    ``replace`` rewrites every word's symbol string; the rewrite lineage
    is materialized every ``BPE_CHECKPOINT_EVERY`` rounds
    (localCheckpoint), so per-round cost stays flat at realistic merge
    depths (soaked at merges=256, tools/soak_r11.py) instead of round r
    re-running an r-deep replace chain.  (3) ``merges`` is a
    config constant, never data-sized.  Words are truncated to
    ``max_word_len`` chars, bounding per-row fan-out against base64/
    minified-JS "words" (the bpe_merge_candidates cap, moved to the word
    level so the rewrite stays one replace); a word containing the
    ``BPE_SEP`` terminator byte (impossible in the gated corpora) is
    dropped rather than corrupting the representation."""
    words = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & ~F.col("w").contains(BPE_SEP))
        .select(F.substring("w", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    seq = words.select(_bpe_symbol_string(F.col("w")).alias("s"), "n")
    learned: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, merges + 1):
            arr = _bpe_symbols(F.col("s"))
            top = (
                seq.select(
                    F.explode(
                        F.arrays_zip(
                            F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                            F.slice(arr, 2, F.size(arr) - 1).alias("r"),
                        )
                    ).alias("p"),
                    "n",
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("n").alias("c"))
                .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:  # every word fully merged — corpus exhausted
                break
            l, rr, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            learned.append((r, l, rr, c))
            pat, rep = _bpe_merge_pattern(l, rr)
            seq = seq.withColumn(
                "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
            )
            if r % BPE_CHECKPOINT_EVERY == 0:
                seq = seq.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    return learned


def apply_bpe_merges(
    df: DataFrame,
    learned: "list[tuple]",
    word_col: str = "w",
    out_col: str = "syms",
) -> DataFrame:
    """Replay a trained merge table (``train_bpe`` / ``train_wordpiece``
    output) over a WORD column, returning the surviving symbol ARRAY in
    ``out_col`` — the application step ``bpe_segment_count`` only counts
    for.  Works for any merge depth: the replace lineage is materialized
    every ``BPE_CHECKPOINT_EVERY`` merges (localCheckpoint), so a
    realistic 30k-merge table costs O(k) flat rewrites instead of a
    k-deep plan (the trainer's own discipline).

    Call it on the DISTINCT-word table (vocabulary-sized — sublinear in
    the corpus by Heaps' law) and join the result back to the corpus;
    ``bpe_encode`` wires exactly that."""
    out = df.withColumn("__s", _bpe_symbol_string(F.col(word_col)))
    for i, rec in enumerate(learned, 1):
        _r, l, rr = rec[0], rec[1], rec[2]
        pat, rep = _bpe_merge_pattern(l, rr)
        out = out.withColumn(
            "__s", F.replace(F.col("__s"), F.lit(pat), F.lit(rep))
        )
        if i % BPE_CHECKPOINT_EVERY == 0:
            out = out.localCheckpoint(eager=True)
    return out.withColumn(out_col, _bpe_symbols(F.col("__s"))).drop("__s")


def bpe_vocab(
    df: DataFrame,
    learned: "list[tuple]",
    text_col: str = "text",
    max_word_len: int = 64,
) -> "list[tuple[str, int]]":
    """The deterministic (token, token_id) vocabulary of a trained merge
    table over a corpus: base tokens are the corpus' distinct CHARACTERS
    in binary order (ids 0..C-1), then each merge's product string in
    round order (ids C, C+1, ...; a product string already in the
    vocabulary — e.g. rounds ('a','bc') and ('ab','c') both yielding
    'abc' — keeps its FIRST id).  Every symbol surviving a merge replay
    is covered: single-char symbols are base tokens, multi-char symbols
    are some round's product.

    Returned driver-side: the charset is BOUNDED metadata (≤ |corpus
    alphabet| ≤ |Unicode|, never data-sized — the same discipline as the
    trainer's top-1 collects), and the merge table already lives on the
    driver."""
    chars = sorted(
        r["c"]
        for r in (
            df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
            .filter((F.col("w") != "") & ~F.col("w").contains(BPE_SEP))
            .select(
                F.explode(
                    F.split(F.substring("w", 1, max_word_len), "")
                ).alias("c")
            )
            .filter(F.col("c") != "")
            .distinct()
            .collect()
        )
    )
    vocab: dict[str, int] = {c: i for i, c in enumerate(chars)}
    nxt = len(vocab)
    for rec in learned:
        tok = rec[1] + rec[2]
        if tok not in vocab:
            vocab[tok] = nxt
            nxt += 1
    return sorted(vocab.items(), key=lambda kv: kv[1])


def bpe_encode(
    df: DataFrame,
    learned: "list[tuple]",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 64,
) -> DataFrame:
    """Encode documents to subword-id SEQUENCES under a trained merge
    table — the step that turns ``train_bpe`` from a readout into a
    tokenizer: ``(id_col, n_tokens, token_ids: array<long>)`` with ids
    assigned by ``bpe_vocab`` and sequence order = word order × symbol
    order within each word.  Words are filtered/truncated exactly as the
    trainer filtered them (empty / ``BPE_SEP``-carrying words contribute
    no tokens); a document with no surviving words yields no row.

    Scale shape: the merge replay runs ONCE over the DISTINCT-word table
    (vocabulary-sized, ``apply_bpe_merges`` — checkpointed, so any merge
    depth keeps a flat plan), the vocabulary is a broadcast join (bounded:
    charset + merge table), and the corpus-sized work is one posexplode +
    one broadcast-joinable word lookup + one combinable per-doc
    reassembly.  No corpus-sized window, no driver loop over data."""
    words_pos = (
        df.select(
            F.col(id_col),
            F.posexplode(_tokens(F.col(text_col))).alias("__wpos", "__w"),
        )
        .filter((F.col("__w") != "") & ~F.col("__w").contains(BPE_SEP))
        .select(
            id_col,
            "__wpos",
            F.substring("__w", 1, max_word_len).alias("__w"),
        )
    )
    wv = apply_bpe_merges(
        words_pos.select(F.col("__w").alias("w")).distinct(),
        learned,
        word_col="w",
        out_col="syms",
    )
    spark = df.sparkSession
    from cerebro_spark.operators.util import small_df

    vocab_df = small_df(
        spark,
        bpe_vocab(df, learned, text_col=text_col, max_word_len=max_word_len),
        "tok string, tid long",
    )
    # per-word id arrays: explode symbols, broadcast-map to ids, reassemble
    # in symbol order (array_sort on (pos, id) structs — collect_list order
    # is not deterministic, the sort is)
    word_ids = (
        wv.select("w", F.posexplode("syms").alias("__spos", "__sym"))
        .join(F.broadcast(vocab_df), F.col("__sym") == F.col("tok"))
        .groupBy("w")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__spos", F.col("tid")))
                ),
                lambda s: s["tid"],
            ).alias("__ids")
        )
    )
    return (
        words_pos.join(word_ids, words_pos["__w"] == word_ids["w"])
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__wpos", F.col("__ids")))
                    ),
                    lambda s: s["__ids"],
                )
            ).alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("long").alias("n_tokens"),
            "token_ids",
        )
    )


def bpe_segment_count(
    col: Column, learned: "list[tuple[int, str, str, int]]"
) -> Column:
    """Subword-token count of a WORD column under a ``train_bpe`` merge
    table: symbol string -> the k merges replayed in training order (k
    chained codegen ``replace``s, all JVM) -> surviving symbol count.
    The fertility readout's per-word core.  A single Column expression —
    fine at readout-sized merge tables (≤ ~64); for realistic merge
    depths use ``apply_bpe_merges`` / ``bpe_encode``, which materialize
    the replay every ``BPE_CHECKPOINT_EVERY`` rounds."""
    s = _bpe_symbol_string(col)
    for _r, l, rr, *_rest in learned:
        pat, rep = _bpe_merge_pattern(l, rr)
        s = F.replace(s, F.lit(pat), F.lit(rep))
    return F.size(_bpe_symbols(s))


def bpe_fertility(
    df: DataFrame,
    learned: "list[tuple[int, str, str, int]]",
    text_col: str = "text",
    group_col: str = "lang",
    max_word_len: int = 64,
) -> DataFrame:
    """Fertility under a TRAINED merge table, per group — ``(group,
    n_docs, ws_tokens, bpe_tokens, fertility)`` where fertility =
    post-merge subword tokens per whitespace word.  The trained twin of
    ``tokenizer_fertility`` (whose subword proxy is a fixed regex): run
    ``train_bpe`` on the corpus, then THIS to read out what the learned
    vocabulary actually costs per language before setting mix weights.

    Scale shape: one corpus-sized explode into a map-side-combinable
    per-(group, word)... no — per-row ``bpe_segment_count`` is a chain of
    k codegen replaces, so the whole pass is explode -> project -> ONE
    combinable groupBy.  No join, no window."""
    words = df.select(
        F.col(group_col).alias("__g"),
        F.explode(_tokens(F.col(text_col))).alias("__w"),
    ).filter(
        (F.col("__w") != "") & ~F.col("__w").contains(BPE_SEP)
    ).select(
        "__g", F.substring("__w", 1, max_word_len).alias("__w")
    )
    per = words.select(
        "__g",
        bpe_segment_count(F.col("__w"), learned).cast("long").alias("__s"),
    )
    agg = per.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("ws_tokens"),
        F.sum("__s").cast("long").alias("bpe_tokens"),
    )
    ndocs = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return agg.join(ndocs, "__g").select(
        F.col("__g").alias(group_col),
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.when(
            F.col("ws_tokens") > 0,
            F.round(
                F.col("bpe_tokens").cast("double")
                / F.col("ws_tokens").cast("double"),
                6,
            ),
        ).alias("fertility"),
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 6,
    max_word_len: int = 64,
) -> "list[tuple[int, str, str, int, int, int]]":
    """Distributed WordPiece merge training — ``train_bpe``'s machinery
    with the LIKELIHOOD objective (Schuster & Nakajima 2012 / the BERT
    trainer): each round merges the pair maximizing
    ``count(pair) / (count(left) * count(right))`` instead of raw pair
    count, preferring pairs that co-occur more than their parts predict
    (so rare-but-exclusive morphemes merge before frequent-but-independent
    letter pairs).  Returns ``[(round, left, right, pair_count,
    left_count, right_count), ...]`` — all integers, so the merge table
    is hash-exact across engines; the score itself is one IEEE division
    of exactly-representable integers (identical in Spark and DuckDB),
    tie-broken (left, right) ascending.

    Same scale shape and caps as ``train_bpe`` (one corpus pass to the
    cached word table, per round one combinable pair count + one unigram
    count + a single-row argmax collect + one codegen replace)."""
    words = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .filter((F.col("w") != "") & ~F.col("w").contains(BPE_SEP))
        .select(F.substring("w", 1, max_word_len).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    seq = words.select(_bpe_symbol_string(F.col("w")).alias("s"), "n")
    learned: list[tuple[int, str, str, int, int, int]] = []
    try:
        for r in range(1, merges + 1):
            arr = _bpe_symbols(F.col("s"))
            uni = (
                seq.select(F.explode(arr).alias("sym"), "n")
                .groupBy("sym")
                .agg(F.sum("n").alias("uc"))
            )
            pairs = (
                seq.select(
                    F.explode(
                        F.arrays_zip(
                            F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                            F.slice(arr, 2, F.size(arr) - 1).alias("r"),
                        )
                    ).alias("p"),
                    "n",
                )
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("n").alias("c"))
            )
            top = (
                pairs.join(
                    uni.select(F.col("sym").alias("l"), F.col("uc").alias("lc")),
                    "l",
                )
                .join(
                    uni.select(F.col("sym").alias("r"), F.col("uc").alias("rc")),
                    "r",
                )
                .withColumn(
                    # each factor cast to double BEFORE multiplying: a
                    # 64-bit integer product lc*rc overflows at
                    # multi-billion-token scale while the oracle's HUGEINT
                    # stays exact; double*double is the same IEEE op in
                    # both engines at any scale
                    "__score",
                    F.col("c").cast("double")
                    / (F.col("lc").cast("double") * F.col("rc").cast("double")),
                )
                .orderBy(F.desc("__score"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            t = top[0]
            l, rr = t["l"], t["r"]
            learned.append(
                (r, l, rr, int(t["c"]), int(t["lc"]), int(t["rc"]))
            )
            pat, rep = _bpe_merge_pattern(l, rr)
            seq = seq.withColumn(
                "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
            )
            if r % BPE_CHECKPOINT_EVERY == 0:
                seq = seq.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    return learned
