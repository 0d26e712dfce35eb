"""Round-11 soak: BPE at REALISTIC merge depth, and the encode step.

1. **train_bpe at merges=256** — a vocabulary-rich synthetic corpus (~1.5k
   distinct words, Zipf-ish counts over a 26-letter alphabet) trained for
   256 rounds must produce the IDENTICAL merge table (pair, order, count)
   as the independent tuple-based reference trainer (soak_r10's), and the
   wall clock must stay flat per round (the BPE_CHECKPOINT_EVERY lineage
   materialization — without it round r replays an r-deep replace chain
   and the plan blows up long before the data matters).  First/second-half
   wall times are printed so the flatness claim is checkable.

2. **bpe_encode equivalence at merges=256** — every doc's subword-id
   sequence must equal the reference encoder's (reference merge replay on
   symbol tuples + the same deterministic vocabulary: chars in binary
   order, then merge products in round order, first occurrence keeps its
   id).  Exact list equality per doc — token identity AND order.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_r11.py [n_docs] [merges]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from soak_r10 import _reference_bpe  # noqa: E402  (tuple-based trainer)

from cerebro_spark.operators.text import (  # noqa: E402
    bpe_encode,
    bpe_vocab,
    train_bpe,
)
from cerebro_spark.session import get_spark  # noqa: E402


def _corpus(n_docs: int, n_words: int = 1500, seed: int = 11):
    """Zipf-ish draws from a generated vocabulary — rich enough to keep
    256 merges learnable (morphology-shaped: stems x suffixes)."""
    rng = np.random.RandomState(seed)
    stems = [
        "".join(chr(97 + c) for c in rng.randint(0, 26, int(rng.randint(3, 8))))
        for _ in range(n_words // 6)
    ]
    sufs = ["", "s", "ed", "ing", "er", "est", "ly", "ness", "able"]
    vocab = list({s + x for s in stems for x in sufs})
    rng.shuffle(vocab)
    ranks = np.arange(1, len(vocab) + 1, dtype=float)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    docs = []
    for d in range(n_docs):
        k = int(rng.randint(20, 60))
        ws = rng.choice(len(vocab), size=k, p=probs)
        docs.append((d, " ".join(vocab[i] for i in ws)))
    return docs


def _reference_vocab(word_counts: dict, learned: list) -> dict:
    chars = sorted({c for w in word_counts for c in w})
    vocab = {c: i for i, c in enumerate(chars)}
    for rec in learned:
        tok = rec[1] + rec[2]
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def soak_bpe_depth(spark, n_docs: int, merges: int) -> None:
    docs = _corpus(n_docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")

    wc: dict = {}
    for _, t in docs:
        for w in t.split():
            w = w[:64]
            wc[w] = wc.get(w, 0) + 1

    t0 = time.time()
    got_half = train_bpe(df, merges=merges // 2)
    t_half = time.time() - t0
    t0 = time.time()
    got = train_bpe(df, merges=merges)
    t_full = time.time() - t0

    want, final_seqs = _reference_bpe(wc, merges)
    assert got[: len(got_half)] == got_half, "trainer is not prefix-stable"
    assert got == want, (
        f"merge tables diverge at depth {merges}: first diff at round "
        f"{next(i + 1 for i, (a, b) in enumerate(zip(got, want)) if a != b)}"
    )
    print(
        f"1. train_bpe merges={merges}: table == tuple reference "
        f"({len(got)} merges learned); wall {t_full:.1f}s full vs "
        f"{t_half:.1f}s half-depth (flat-per-round ratio "
        f"{t_full / max(t_half, 1e-9):.2f}x, ~2.0 = flat)  "
        f"[corpus {n_docs} docs, {len(wc)} distinct words]"
    )

    # 2. encode equivalence under the full-depth table
    t0 = time.time()
    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode(df, got).collect()
    }
    t_enc = time.time() - t0
    rv = _reference_vocab(wc, want)
    assert dict(bpe_vocab(df, got)) == rv, "vocabulary assignment diverged"
    bad = 0
    for d, t in docs:
        want_ids = [
            rv[sym]
            for w in t.split()
            if w[:64] != ""
            for sym in final_seqs[w[:64]][0]
        ]
        if enc.get(d, []) != want_ids:
            bad += 1
    assert bad == 0, f"{bad}/{len(docs)} docs encode differently"
    print(
        f"2. bpe_encode merges={merges}: all {len(docs)} id sequences == "
        f"reference encoder (vocab {len(rv)} tokens)  [{t_enc:.1f}s]"
    )


def soak_packing_skew(spark, n_docs: int = 100_000, L: int = 2048) -> None:
    """3. pack_sequences at 100k docs with HEAVY length skew (Zipf-ish
    lengths, 1% giants up to 16xL forcing chunk splits, padding-bait tiny
    docs): invariants (no token lost, no sequence > L) over the whole run,
    exact FFD-reference equality on 3 spot-checked groups, and the fill
    ratio — the number a 100 TB packing job is judged by."""
    rng = np.random.RandomState(42)
    lens = np.minimum(
        (rng.pareto(1.2, n_docs) * 60).astype(np.int64) + 1, 16 * L
    )
    lens[rng.choice(n_docs, n_docs // 100, replace=False)] = rng.randint(
        L + 1, 16 * L, n_docs // 100
    )
    df = spark.createDataFrame(
        [(int(i), int(n)) for i, n in enumerate(lens)],
        "doc_id long, n_tokens long",
    )
    from pyspark.sql import functions as F

    from cerebro_spark.operators.sampling import (
        _portable_bucket,
        pack_sequences,
    )

    t0 = time.time()
    packed = pack_sequences(df, seq_len=L, n_groups=64).cache()
    agg = packed.groupBy("grp", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    stats = agg.select(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max("seq_tokens").alias("max_seq"),
        F.sum("seq_tokens").alias("total"),
    ).first()
    wall = time.time() - t0
    assert stats["max_seq"] <= L, f"sequence overflow: {stats['max_seq']}"
    assert stats["total"] == int(lens.sum()), "tokens lost or duplicated"
    fill = stats["total"] / (stats["n_seqs"] * L)

    # spot-check 3 groups against the brute-force reference fold
    grp_expr = _portable_bucket(F.col("doc_id"), 64)
    for g in (0, 17, 63):
        docs_g = {
            r["doc_id"]: int(lens[r["doc_id"]])
            for r in df.withColumn("g", grp_expr)
            .filter(F.col("g") == g)
            .collect()
        }
        items = []
        for d, n in docs_g.items():
            nc = -(-n // L)
            for c in range(nc):
                items.append((d, c, L if c < nc - 1 else n - (nc - 1) * L))
        bins: list[int] = []
        want = {}
        for doc, chunk, ln in sorted(items, key=lambda t: (-t[2], t[0], t[1])):
            for j in range(len(bins)):
                if L - bins[j] >= ln:
                    want[(doc, chunk)] = (j + 1, bins[j])
                    bins[j] += ln
                    break
            else:
                bins.append(ln)
                want[(doc, chunk)] = (len(bins), 0)
        mine = {
            (r["doc_id"], r["chunk_id"]): (r["seq_id"], r["offset"])
            for r in packed.filter(F.col("grp") == g).collect()
        }
        assert mine == want, f"group {g} diverges from reference FFD"
    packed.unpersist()
    print(
        f"3. pack_sequences skew soak: {n_docs} docs "
        f"({int(lens.sum())} tokens, max doc {int(lens.max())}) -> "
        f"{stats['n_seqs']} sequences of L={L}, fill {fill:.4f}, "
        f"max_seq {stats['max_seq']} <= L, tokens conserved; 3 groups == "
        f"reference FFD  [{wall:.1f}s]"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("soak-r11", shuffle_partitions=32)
    soak_bpe_depth(spark, n_docs, merges)
    soak_packing_skew(spark)
    print("SOAK R11 GREEN")


if __name__ == "__main__":
    main()
