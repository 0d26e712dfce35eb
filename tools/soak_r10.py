"""Round-10 soak: ground truth for the online media-dedup wire, the video
near-dup pipeline, and distributed BPE training at scale.

Three checks, each against an independent brute-force / reference-
implementation oracle:

1. **media_neardup_filter_sink sequential fold** — N random docs split into
   K batches, with planted cross-batch brightness twins and exact dups.
   The sink's survivor set (replayed batch N probes, per-batch index
   growth) must equal a numpy SEQUENTIAL FOLD: batch b survivor = no
   prior-batch survivor within Hamming <= 3 of its byte-dHash, after
   intra-batch exact dedup.  Asserted as set equality.  Then every batch
   is REPLAYED (same ids) and the store must be byte-identical.

2. **video signature recall** — V synthetic videos (random frame bytes),
   each with a +shift brightness twin (must land at signature Hamming 0)
   and E of them with a k-frame edit twin.  The banded candidate join over
   ``video_signature`` output must find every pair the O(V^2) numpy brute
   force over the same signatures finds (pigeonhole set equality), and
   every brightness twin must be among them.

3. **train_bpe vs reference implementation** — a synthetic multi-pattern
   corpus trained for 10 merges in Spark must produce the IDENTICAL merge
   table (pair, order, count) as an independent pure-Python BPE trainer
   (dict-of-tuples, no string replace — a genuinely different code path),
   and the fertility readout must match the reference's token counts.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_r10.py [n_docs] [n_videos]
"""

from __future__ import annotations

import hashlib
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cerebro_spark.operators.multimodal import (
    byte_dhash_df,
    encode_avi_gray,
    hamming_hash_pairs,
    video_frame_hash_df,
    video_signature,
)
from cerebro_spark.operators.text import train_bpe, bpe_fertility
from cerebro_spark.session import get_spark
from cerebro_spark.streaming.sinks import media_neardup_filter_sink


def _doc(seed: int, n: int = 180) -> str:
    h = hashlib.md5(f"doc:{seed}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    return "".join(chr(32 + v) for v in rng.randint(0, 90, n))


def _popcount_pairs(hs: np.ndarray, ids: np.ndarray, k: int) -> set:
    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    out = set()
    for i in range(len(hs)):
        x = np.bitwise_xor(hs[i], hs[i + 1 :])
        hb = pop[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        for j in np.nonzero(hb <= k)[0]:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            out.add((min(a, b), max(a, b), int(hb[j])))
    return out


def np_byte_dhash(data: bytes, rows: int = 6, cols: int = 11) -> int:
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n, S = len(b), rows * cols
    seg = (np.arange(n) * S) // n
    sums = np.bincount(seg, weights=b.astype(float), minlength=S).astype(np.int64)
    cnts = np.bincount(seg, minlength=S)
    gs, gc = sums.reshape(rows, cols), cnts.reshape(rows, cols)
    h = 0
    for r in range(rows):
        for c in range(cols - 1):
            if gs[r, c + 1] * gc[r, c] > gs[r, c] * gc[r, c + 1]:
                h |= 1 << (r * (cols - 1) + c)
    return h


# ---------------------------------------------------------------------------
# 1. sink sequential fold + replay idempotence
# ---------------------------------------------------------------------------

def soak_sink_fold(spark, n_docs: int, n_batches: int = 4) -> None:
    t0 = time.time()
    rng = np.random.RandomState(7)
    batches: list[list[tuple[int, str]]] = [[] for _ in range(n_batches)]
    next_id = 0
    texts: dict[int, str] = {}
    for s in range(n_docs):
        t = _doc(s)
        b = int(rng.randint(0, n_batches))
        texts[next_id] = t
        batches[b].append((next_id, t))
        next_id += 1
        r = rng.rand()
        if r < 0.15:  # planted brightness twin in a LATER batch
            tb = int(rng.randint(b, n_batches))
            tw = "".join(chr(ord(c) + 2) for c in t)
            texts[next_id] = tw
            batches[tb].append((next_id, tw))
            next_id += 1
        elif r < 0.25:  # planted exact dup, anywhere
            db = int(rng.randint(0, n_batches))
            texts[next_id] = t
            batches[db].append((next_id, t))
            next_id += 1

    # numpy sequential fold oracle
    fps = {i: np_byte_dhash(t.encode()) for i, t in texts.items()}
    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def ham(a: int, b: int) -> int:
        x = np.uint64(a ^ b)
        return int(pop[np.array([x], dtype=np.uint64).view(np.uint8)].sum())

    # two-phase per batch: intra-batch near-dups BOTH survive (the sink
    # contract — the index grows only after the whole batch is probed)
    kept_oracle: list[int] = []
    for b in range(n_batches):
        seen: dict[str, int] = {}
        intra = [i for i, t in sorted(batches[b]) if seen.setdefault(t, i) == i]
        survivors = [
            i
            for i in intra
            if all(ham(fps[i], fps[j]) > 3 for j in kept_oracle)
        ]
        kept_oracle.extend(survivors)

    tmp = tempfile.mkdtemp(prefix="soak_r10_sink_")
    try:
        sink = media_neardup_filter_sink(f"{tmp}/idx", f"{tmp}/out")
        for b in range(n_batches):
            df = spark.createDataFrame(batches[b], "doc_id long, text string")
            sink(df, b)
        got = sorted(
            r["doc_id"] for r in spark.read.parquet(f"{tmp}/out").collect()
        )
        assert got == sorted(kept_oracle), (
            f"sink fold mismatch: {len(got)} vs oracle {len(kept_oracle)}; "
            f"extra={set(got) - set(kept_oracle)} "
            f"missing={set(kept_oracle) - set(got)}"
        )
        # replay every batch: store must not change
        for b in range(n_batches):
            df = spark.createDataFrame(batches[b], "doc_id long, text string")
            sink(df, b)
        got2 = sorted(
            r["doc_id"] for r in spark.read.parquet(f"{tmp}/out").collect()
        )
        assert got2 == got, "replay changed the survivor set"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        f"1. sink fold: {len(texts)} docs / {n_batches} batches -> "
        f"{len(kept_oracle)} survivors == numpy sequential fold; full "
        f"replay byte-identical  [{time.time() - t0:.1f}s]"
    )


# ---------------------------------------------------------------------------
# 2. video signature recall vs brute force
# ---------------------------------------------------------------------------

def soak_video_recall(spark, n_videos: int) -> None:
    t0 = time.time()
    rng = np.random.RandomState(11)
    rows = []
    planted0 = []  # (orig_id, twin_id) brightness twins: MUST be hamming 0
    vid = 0
    for s in range(n_videos):
        nf = int(rng.randint(6, 40))
        frames = rng.randint(0, 200, size=(nf, 2, 8)).astype(np.uint8)
        rows.append((vid, bytearray(encode_avi_gray(list(frames), fps=2))))
        base_id = vid
        vid += 1
        r = rng.rand()
        if r < 0.3:  # brightness twin
            tw = np.clip(frames.astype(np.int64) + 17, 0, 255).astype(np.uint8)
            rows.append((vid, bytearray(encode_avi_gray(list(tw), fps=2))))
            planted0.append((base_id, vid))
            vid += 1
        elif r < 0.45:  # one-frame edit twin
            ed = frames.copy()
            ed[int(rng.randint(0, nf))] = rng.randint(0, 200, size=(2, 8))
            rows.append((vid, bytearray(encode_avi_gray(list(ed), fps=2))))
            vid += 1
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fh = video_frame_hash_df(df, every_ms=500).cache()
    sigs = video_signature(fh, bits=16, temporal_bands=3).collect()
    fh.unpersist()
    ids = np.array([r["id"] for r in sigs], dtype=np.int64)
    vfps = np.array([r["vfp"] for r in sigs], dtype=np.uint64)
    brute = _popcount_pairs(vfps, ids, 3)
    sig_df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in zip(ids, vfps.astype(np.int64))],
        "id long, vfp long",
    )
    banded = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.hamming)
        for r in hamming_hash_pairs(
            sig_df, "vfp", "id", max_hamming=3, bits=48, blocks=4
        ).collect()
    }
    assert banded == brute, (
        f"banded {len(banded)} != brute {len(brute)}; "
        f"missing={list(brute - banded)[:5]} extra={list(banded - brute)[:5]}"
    )
    by_pair = {(a, b): h for a, b, h in brute}
    for a, b in planted0:
        assert by_pair.get((a, b)) == 0, (
            f"brightness twin ({a},{b}) not at hamming 0: "
            f"{by_pair.get((a, b))}"
        )
    print(
        f"2. video recall: {len(rows)} videos, banded == brute force "
        f"({len(brute)} pairs), all {len(planted0)} brightness twins at "
        f"hamming 0  [{time.time() - t0:.1f}s]"
    )


# ---------------------------------------------------------------------------
# 3. train_bpe vs an independent reference trainer
# ---------------------------------------------------------------------------

def _reference_bpe(word_counts: dict, merges: int):
    """Pure-Python textbook BPE: words as symbol TUPLES (no string replace
    — a genuinely different code path from the engine's representation)."""
    seqs = {w: (tuple(w), n) for w, n in word_counts.items()}
    learned = []
    for r in range(1, merges + 1):
        counts: dict = {}
        for syms, n in seqs.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, rr), c = best
        learned.append((r, l, rr, c))
        out = {}
        for w, (syms, n) in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    merged.append(l + rr)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[w] = (tuple(merged), n)
        seqs = out
    return learned, seqs


def soak_bpe_suffix(spark) -> None:
    """The r10 boundary bug's trigger corpus (ADVICE r10): word counts
    {xa:10, ab:9, xab:1} make round 1 merge ('x','a') — so 'xab' becomes
    symbols ['xa','b'] — and a merge pattern with no LEFT boundary then
    wrongly fires ('a','b') INSIDE it, yielding 'xab' as one symbol and a
    2-merge table where the textbook trainer learns 3.  The wrapped
    representation must match the tuple-based reference exactly."""
    t0 = time.time()
    docs = [("xa",)] * 10 + [("ab",)] * 9 + [("xab",)]
    df = spark.createDataFrame(docs, "text string")
    got = train_bpe(df, merges=3)
    wc = {"xa": 10, "ab": 9, "xab": 1}
    want, _ = _reference_bpe(wc, 3)
    assert got == want, f"suffix corpus diverged:\n got={got}\nwant={want}"
    assert len(got) == 3, f"expected 3 learnable merges, got {len(got)}"
    print(
        f"3b. BPE suffix-trigger corpus (xa/ab/xab): "
        f"{[f'{l}+{r}' for _, l, r, _ in got]} == reference "
        f"[{time.time() - t0:.1f}s]"
    )


def soak_bpe(spark, n_docs: int = 400) -> None:
    t0 = time.time()
    rng = np.random.RandomState(3)
    # pattern-rich corpus: repeated stems + suffixes + self-runs + pair runs
    stems = ["low", "lower", "lowest", "newest", "wider", "abab", "aaaa", "banana"]
    docs = []
    for d in range(n_docs):
        k = int(rng.randint(3, 12))
        docs.append(
            (" ".join(stems[int(rng.randint(0, len(stems)))] for _ in range(k)),)
        )
    df = spark.createDataFrame(docs, "text string")
    got = train_bpe(df, merges=10)

    wc: dict = {}
    for (t,) in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want, final_seqs = _reference_bpe(wc, 10)
    assert got == want, f"merge tables differ:\n got={got}\nwant={want}"

    fert = bpe_fertility(
        df.selectExpr("text", "'x' AS lang"), got, group_col="lang"
    ).first()
    ws = sum(wc.values())
    bpe_toks = sum(len(final_seqs[w][0]) * n for w, n in wc.items())
    assert (fert.ws_tokens, fert.bpe_tokens) == (ws, bpe_toks), (
        fert, ws, bpe_toks
    )
    print(
        f"3. BPE: 10-round merge table == reference trainer "
        f"({[f'{l}+{r}' for _, l, r, _ in got]}); fertility "
        f"{fert.bpe_tokens}/{fert.ws_tokens} == reference  "
        f"[{time.time() - t0:.1f}s]"
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_videos = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark("soak-r10", shuffle_partitions=32)
    soak_sink_fold(spark, n_docs)
    soak_video_recall(spark, n_videos)
    soak_bpe(spark)
    soak_bpe_suffix(spark)
    print("SOAK R10 GREEN")


if __name__ == "__main__":
    main()
