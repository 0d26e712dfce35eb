"""Edge cases for the repetition / LM-score / semantic-dedup operators
(oracle queries cover the bulk behavior at sf0.01)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from cerebro_spark.operators.text import repetition_profile, unigram_nll


def test_repetition_profile_hand_computed(spark):
    rows = [
        Row(doc_id=1, text="a a a b"),       # top word a=3/4; bigram "a a"=2/3
        Row(doc_id=2, text="x y z"),         # all distinct
        Row(doc_id=3, text="solo"),          # single word: no bigram
    ]
    out = {r["doc_id"]: r for r in
           repetition_profile(spark.createDataFrame(rows)).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert abs(r1["dup_word_frac"] - 0.5) < 1e-9          # 2 distinct / 4
    assert abs(r1["top_word_frac"] - 0.75) < 1e-9
    assert abs(r1["top_bigram_frac"] - 2 / 3) < 1e-6
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0
    assert abs(r2["top_word_frac"] - 1 / 3) < 1e-6
    assert abs(r2["top_bigram_frac"] - 0.5) < 1e-9        # each bigram once /2
    r3 = out[3]
    assert r3["n_words"] == 1 and r3["top_bigram_frac"] == 0.0


def test_unigram_nll_hand_computed(spark):
    # corpus: "a a b" + "b" -> counts a=2, b=2, total=4; -ln(p)=ln(2) for all
    rows = [Row(doc_id=1, text="a a b"), Row(doc_id=2, text="b")]
    out = {r["doc_id"]: r for r in
           unigram_nll(spark.createDataFrame(rows)).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
    for d in (1, 2):
        assert abs(out[d]["avg_nll"] - round(math.log(2), 4)) < 1e-9
    # rare tokens score higher than common ones
    rows2 = [Row(doc_id=i, text="common word") for i in range(9)]
    rows2.append(Row(doc_id=99, text="zzzrare qqqrare"))
    out2 = {r["doc_id"]: r["avg_nll"] for r in
            unigram_nll(spark.createDataFrame(rows2)).collect()}
    assert out2[99] > out2[0]


def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    """The IVF-blocked dedup must find exactly the pairs global brute force
    finds when the only qualifying pairs are injected clones."""
    from cerebro_spark.io import load_table
    from cerebro_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    n_clones = clones.count()
    out = semantic_dedup(
        emb.unionByName(clones), dim=64, threshold=0.95, n_clusters=8
    ).collect()
    assert len(out) == n_clones
    for r in out:
        assert r["drop_id"] == r["keep_id"] + 10_000   # clone vs its original
        assert r["cosine"] > 0.999999
    # deterministic: hash-seeded k-means gives identical clusters on rerun
    again = semantic_dedup(
        emb.unionByName(clones), dim=64, threshold=0.95, n_clusters=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_dedup_chunks_first_occurrence_wins(spark):
    from cerebro_spark.operators.text import dedup_chunks

    # chunk size 2: doc1 = [a b][c d], doc2 = [a b][x y], doc3 = [a b]
    rows = [
        Row(doc_id=1, text="a b c d"),
        Row(doc_id=2, text="a b x y"),
        Row(doc_id=3, text="a b"),
    ]
    out = {r["doc_id"]: r for r in
           dedup_chunks(spark.createDataFrame(rows), chunk_tokens=2).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == "a b c d"
    # doc2 loses its copy of "a b" (doc1 owns the first occurrence)
    assert out[2]["n_kept"] == 1 and out[2]["text_kept"] == "x y"
    # doc3 is entirely duplicate → survives with empty text, not dropped
    assert out[3]["n_kept"] == 0 and out[3]["text_kept"] == ""


def test_dedup_chunks_ragged_tail_chunk(spark):
    from cerebro_spark.operators.text import dedup_chunks

    # 5 tokens at chunk 2 → chunks [a b][c d][e]; the short tail is its own
    # chunk, not merged or dropped
    rows = [Row(doc_id=1, text="a b c d e")]
    r = dedup_chunks(spark.createDataFrame(rows), chunk_tokens=2).collect()[0]
    assert r["n_chunks"] == 3 and r["n_kept"] == 3
    assert r["text_kept"] == "a b c d e"


def test_vocab_encode_roundtrip_and_oov(spark):
    from cerebro_spark.operators.text import build_vocab, encode_tokens

    rows = [
        Row(doc_id=1, text="b b a c"),
        Row(doc_id=2, text="a b zz"),
    ]
    docs = spark.createDataFrame(rows)
    vocab = build_vocab(docs, vocab_size=3)
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    # freq: b=3, a=2, c=1, zz=1 → rank by (count desc, token asc)
    assert v == {"b": 1, "a": 2, "c": 3}
    enc = {r["doc_id"]: r for r in encode_tokens(docs, vocab).collect()}
    assert enc[1]["ids_str"] == "1 1 2 3" and enc[1]["n_oov"] == 0
    # zz is out-of-vocabulary → id 0, counted
    assert enc[2]["ids_str"] == "2 1 0" and enc[2]["n_oov"] == 1
    assert enc[2]["n_tokens"] == 3


def test_duplicated_span_profile_catches_shifted_copy(spark):
    from cerebro_spark.operators.dedup import duplicated_span_profile

    uniq = [f"u{i}" for i in range(40)]
    shared = [f"s{i}" for i in range(20)]   # 20-token run, different offsets
    rows = [
        Row(doc_id=1, text=" ".join(uniq[:7] + shared + uniq[7:20])),
        Row(doc_id=2, text=" ".join(uniq[20:23] + shared + uniq[23:40])),
        Row(doc_id=3, text=" ".join(uniq[: 16])),  # no duplicated window
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_profile(
            spark.createDataFrame(rows), window_tokens=16
        ).collect()
    }
    # the shared run yields 5 duplicated windows (20 - 16 + 1) per doc even
    # though the aligned chunking of dedup_chunks would miss the shifted copy
    assert out[1]["n_dup_windows"] == 5 and out[2]["n_dup_windows"] == 5
    # covered tokens = the 20-token shared run
    assert abs(out[1]["dup_token_frac"] - 20 / 40) < 1e-9
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_token_frac"] == 0.0


def test_bigram_pmi_collocation_ranks_high(spark):
    from cerebro_spark.operators.text import bigram_pmi

    # "new york" always adjacent; "the of" never adjacent → PMI(new,york) high
    docs = spark.createDataFrame(
        [(i, "the new york of cats and the dogs of new york") for i in range(5)],
        ["doc_id", "text"],
    )
    out = {(r["w1"], r["w2"]): r["pmi"] for r in bigram_pmi(docs, min_count=5).collect()}
    assert ("new", "york") in out
    assert out[("new", "york")] > 0
    assert ("the", "of") not in out  # never adjacent → no pair row


def test_weighted_sample_extremes(spark):
    from pyspark.sql import functions as F

    from cerebro_spark.operators.sampling import weighted_sample

    df = spark.range(500).select(
        F.col("id"), F.lit(0.0).alias("w0"), F.lit(1.0).alias("w1")
    )
    assert weighted_sample(df, "w0", "id").count() == 0
    assert weighted_sample(df, "w1", "id").count() == 500
    half = weighted_sample(
        df.withColumn("wh", F.lit(0.5)), "wh", "id"
    ).count()
    assert 200 < half < 300  # hash-uniform ≈ 50%


def test_normalize_text_rules(spark):
    from cerebro_spark.operators.text import clean_text

    rows = [
        Row(doc_id=1, text="  hello   world  "),            # space inflation
        Row(doc_id=2, text="tabbed\ttext\r\nwith lines"),    # tab/CRLF -> space
        Row(doc_id=3, text="​zero‌width﻿m\x07b"),  # strips
        Row(doc_id=4, text="nbsp and em　ideo"),    # space map
        Row(doc_id=5, text="plain text"),                    # untouched
        Row(doc_id=6, text=""),                              # empty survives
        Row(doc_id=7, text="ctrl\x00\x01\x1fchars\x7fdel"),  # C0 + DEL strip
    ]
    out = {r["doc_id"]: r for r in
           clean_text(spark.createDataFrame(rows)).collect()}
    assert out[1]["clean_text"] == "hello world"
    assert out[2]["clean_text"] == "tabbed text with lines"
    assert out[3]["clean_text"] == "zerowidthmb"
    assert out[4]["clean_text"] == "nbsp and em ideo"
    assert out[5]["clean_text"] == "plain text" and not out[5]["was_dirty"]
    assert out[6]["clean_text"] == "" and not out[6]["was_dirty"]
    assert out[7]["clean_text"] == "ctrlcharsdel"
    # audit columns: removed count is the length delta, flag marks changes
    assert out[1]["chars_removed"] == len("  hello   world  ") - len("hello world")
    assert out[7]["chars_removed"] == 4 and out[7]["was_dirty"]


def test_vocab_coverage_hand_computed(spark):
    from cerebro_spark.operators.text import vocab_coverage

    # corpus: a appears 3x, b 2x, c 1x, d 1x -> N=7 V=4 n1=2 n2=1
    rows = [Row(doc_id=1, text="a a b c"), Row(doc_id=2, text="a b d")]
    out = vocab_coverage(spark.createDataFrame(rows)).collect()[0]
    assert out["n_tokens"] == 7 and out["vocab"] == 4
    assert out["n1"] == 2 and out["n2"] == 1
    assert abs(out["p_unseen"] - 2 / 7) < 1e-12
    # chao1 = V + n1^2/(2 n2) = 4 + 4/2 = 6
    assert abs(out["chao1"] - 6.0) < 1e-12
    # n2 = 0 -> chao1 undefined (NULL), never a crash
    solo = spark.createDataFrame([Row(doc_id=1, text="x y")])
    o2 = vocab_coverage(solo).collect()[0]
    assert o2["n2"] == 0 and o2["chao1"] is None
    assert o2["p_unseen"] == 1.0


# ---------------------------------------------------------------------------
# distributed BPE merge training (r10)
# ---------------------------------------------------------------------------

def test_train_bpe_matches_hand_computed_merges(spark):
    """The Sennrich toy corpus: merge order and counts hand-verified,
    including the (l,o) vs (o,w) count-5 tie broken by left symbol."""
    from cerebro_spark.operators.text import bpe_fertility, train_bpe

    df = spark.createDataFrame(
        [("low low lower", "en"), ("lowest low", "en")],
        "text string, lang string",
    )
    m = train_bpe(df, merges=4)
    assert [(r, l, rr) for r, l, rr, _ in m] == [
        (1, "l", "o"), (2, "lo", "w"), (3, "low", "e"), (4, "lowe", "r"),
    ]
    assert [c for _, _, _, c in m] == [5, 5, 2, 1]
    f = bpe_fertility(df, m).first()
    # low x3 and lower -> 1 token each; lowest -> 'lowe s t' = 3 tokens
    assert (f.n_docs, f.ws_tokens, f.bpe_tokens) == (2, 5, 7)
    assert f.fertility == 1.4


def test_train_bpe_greedy_within_round(spark):
    """' a a a a ' merges left-to-right non-overlapping: ONE round of (a, a)
    yields 'aa aa', never 'a aa a' — the replace-based rewrite's contract."""
    from cerebro_spark.operators.text import bpe_segment_count, train_bpe
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    m = train_bpe(df, merges=1)
    assert [(l, r) for _, l, r, _ in m] == [("a", "a")]
    got = (
        df.sparkSession.createDataFrame([("aaaa",), ("aaa",)], "w string")
        .select(bpe_segment_count(F.col("w"), m).alias("t"))
        .collect()
    )
    assert [r.t for r in got] == [2, 2]  # aa|aa and aa|a


def test_train_bpe_exhausts_small_corpus(spark):
    """Asking for more merges than the corpus supports stops at exhaustion
    instead of looping or erroring."""
    from cerebro_spark.operators.text import train_bpe

    df = spark.createDataFrame([("ab ab",)], "text string")
    m = train_bpe(df, merges=10)
    assert [(l, r) for _, l, r, _ in m] == [("a", "b")]


def test_train_wordpiece_likelihood_beats_raw_count(spark):
    """The likelihood argmax picks (a,b) — rare but exclusive (2/(2*2) =
    0.5) — over (x,z), which raw-count BPE would pick first (count 3 but
    score 3/(3*3) = 0.33)."""
    from cerebro_spark.operators.text import train_bpe, train_wordpiece

    df = spark.createDataFrame([("xz xz xz ab ab",)], "text string")
    wp = train_wordpiece(df, merges=2)
    assert [(r, l, rr, c, lc, rc) for r, l, rr, c, lc, rc in wp] == [
        (1, "a", "b", 2, 2, 2),
        (2, "x", "z", 3, 3, 3),
    ]
    bpe = train_bpe(df, merges=1)
    assert [(l, r) for _, l, r, _ in bpe] == [("x", "z")]  # the contrast


# ---------------------------------------------------------------------------
# BPE encoding (r11): apply_bpe_merges / bpe_vocab / bpe_encode
# ---------------------------------------------------------------------------

def test_bpe_encode_hand_verified_with_suffix_trigger(spark):
    """End-to-end encode on a corpus containing the r10 suffix-trigger shape
    (xab must encode as [x, ab], never the phantom symbol 'xab')."""
    from cerebro_spark.operators.text import bpe_encode, bpe_vocab, train_bpe

    df = spark.createDataFrame(
        [(1, "aaa ab aab"), (2, "ab ab ba"), (3, "xa ab xab")],
        "doc_id long, text string",
    )
    m = train_bpe(df, merges=3)
    assert [(l, r) for _, l, r, _ in m] == [("a", "b"), ("a", "a"), ("a", "ab")]
    # chars a,b,x -> 0,1,2; merge products ab,aa,aab -> 3,4,5
    assert bpe_vocab(df, m) == [
        ("a", 0), ("b", 1), ("x", 2), ("ab", 3), ("aa", 4), ("aab", 5),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], list(r["token_ids"]))
        for r in bpe_encode(df, m).collect()
    }
    # doc1: aaa->[aa,a]; ab->[ab]; aab->[aab]
    # doc3: xa->[x,a]; ab->[ab]; xab->[x,ab]  (suffix trigger)
    assert got == {
        1: (4, [4, 0, 3, 5]),
        2: (4, [3, 3, 1, 0]),
        3: (5, [2, 0, 3, 2, 3]),
    }


def test_apply_bpe_merges_symbol_arrays(spark):
    from pyspark.sql import functions as F

    from cerebro_spark.operators.text import apply_bpe_merges, train_bpe

    df = spark.createDataFrame([("low low lower lowest",)], "text string")
    m = train_bpe(df, merges=2)  # (l,o), (lo,w)
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("olo",)], "w string"
    )
    got = {
        r["w"]: list(r["syms"])
        for r in apply_bpe_merges(words, m).collect()
    }
    assert got == {
        "low": ["low"],
        "lowest": ["low", "e", "s", "t"],
        "olo": ["o", "lo"],
    }


def test_bpe_encode_drops_tokenless_docs_and_orders_by_word(spark):
    """A doc with no surviving words yields no row; sequence order is word
    order, not value order."""
    from cerebro_spark.operators.text import bpe_encode, train_bpe

    df = spark.createDataFrame(
        [(1, "ba ab"), (2, "   "), (3, "ab ba")],
        "doc_id long, text string",
    )
    m = train_bpe(df, merges=1)  # (a, b)
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode(df, m).collect()
    }
    # vocab: a->0, b->1, ab->2; ba = [b, a], ab = [ab]
    assert got == {1: [1, 0, 2], 3: [2, 1, 0]}
