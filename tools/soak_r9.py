"""Round-9 soak: ground truth for the new multimodal machinery at scale.

Three checks, each against an independent closed-form / brute-force oracle:

1. **hamming_hash_pairs exact recall** — N random 60-bit fingerprints plus
   P planted twins at Hamming <= 3 (random <=3-bit flips).  The pigeonhole
   guarantee (max_hamming < blocks) says the banded join must find EVERY
   pair the O(N^2) numpy brute force finds — asserted as set equality,
   hashes AND distances.

2. **byte_dhash_df vs numpy oracle** — K synthetic random-byte docs of
   uneven lengths (including n < 66, the empty-segment regime); every
   fingerprint must equal the vectorized reference implementation, and the
   +2-shift twin must hash identically (brightness invariance at scale).

3. **cap degradation** — an adversarial corpus where ``SKEW`` fingerprints
   share one 15-bit band segment (the boilerplate-template shape): with
   ``max_bucket_size`` set below the cluster size the join must drop the
   template mass but keep isolated planted pairs (the simhash-cap
   contract, transferred to the generic join).

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_r9.py [n_hashes] [n_docs]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cerebro_spark.operators.multimodal import byte_dhash_df, hamming_hash_pairs
from cerebro_spark.session import get_spark


def brute_pairs(hashes: np.ndarray, ids: np.ndarray, k: int) -> set:
    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    out = set()
    for i in range(len(hashes)):
        x = np.bitwise_xor(hashes[i], hashes[i + 1 :])
        hb = pop[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
        for j in np.nonzero(hb <= k)[0]:
            a, b = int(ids[i]), int(ids[i + 1 + j])
            out.add((min(a, b), max(a, b), int(hb[j])))
    return out


def np_byte_dhash(data: bytes, shift: int = 0, rows: int = 6, cols: int = 11) -> int:
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64) + shift
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


def main() -> int:
    n_hashes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    rng = np.random.RandomState(7)
    spark = get_spark("soak-r9", shuffle_partitions=32)

    # --- 1. exact recall of the banded join ---------------------------------
    base = rng.randint(0, 2**60, size=n_hashes, dtype=np.uint64)
    planted = base[: n_hashes // 40].copy()
    for i in range(len(planted)):
        for bit in rng.choice(60, size=rng.randint(0, 4), replace=False):
            planted[i] ^= np.uint64(1) << np.uint64(bit)
    hashes = np.concatenate([base, planted])
    ids = np.arange(len(hashes))
    t0 = time.perf_counter()
    truth = brute_pairs(hashes, ids, 3)
    t_brute = time.perf_counter() - t0
    df = spark.createDataFrame(
        [(int(i), int(np.int64(h))) for i, h in zip(ids, hashes)],
        "id long, dhash long",
    )
    t0 = time.perf_counter()
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_hash_pairs(df, max_hamming=3).collect()
    }
    t_join = time.perf_counter() - t0
    assert got == truth, (
        f"recall broken: {len(truth - got)} missed, {len(got - truth)} extra"
    )
    print(
        f"1. recall: {len(hashes)} hashes, {len(truth)} true pairs — banded "
        f"join EXACT (brute {t_brute:.1f}s, join {t_join:.1f}s)"
    )

    # --- 2. byte_dhash_df vs numpy, uneven lengths + shift invariance -------
    lens = rng.randint(20, 400, size=n_docs)  # includes n < 66
    docs = [bytes(rng.randint(32, 122, size=n, dtype=np.uint8)) for n in lens]
    sdf = spark.createDataFrame(
        [(i, d.decode("ascii")) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    got_h = {r.id: r.dhash for r in byte_dhash_df(sdf).collect()}
    t_spark = time.perf_counter() - t0
    bad = sum(1 for i, d in enumerate(docs) if got_h[i] != np_byte_dhash(d))
    assert bad == 0, f"{bad} fingerprints diverge from the numpy oracle"
    shifted = {r.id: r.dhash for r in byte_dhash_df(sdf, shift=2).collect()}
    drift = sum(1 for i in got_h if got_h[i] != shifted[i])
    assert drift == 0, f"{drift} fingerprints flipped under +2 shift"
    print(
        f"2. byte_dhash_df: {n_docs} docs (len 20-400, empty-segment regime "
        f"included) == numpy oracle; +2 shift flipped 0 bits ({t_spark:.1f}s)"
    )

    # --- 3. cap behavior under a template cluster ---------------------------
    skew = 2_000
    tmpl = np.uint64(rng.randint(0, 2**60, dtype=np.uint64))
    # cluster members share band 0 (low 15 bits) exactly; high bits random
    cluster = (
        (rng.randint(0, 2**45, size=skew, dtype=np.uint64) << np.uint64(15))
        | (tmpl & np.uint64(0x7FFF))
    )
    iso_a = np.uint64(rng.randint(0, 2**60, dtype=np.uint64))
    iso_b = iso_a ^ np.uint64(1 << 20)  # one isolated true pair, hamming 1
    all_h = np.concatenate([cluster, [iso_a, iso_b]])
    df3 = spark.createDataFrame(
        [(i, int(np.int64(h))) for i, h in enumerate(all_h)],
        "id long, dhash long",
    )
    capped = hamming_hash_pairs(df3, max_hamming=3, max_bucket_size=100).collect()
    pair_ids = {(r.id_a, r.id_b) for r in capped}
    assert (skew, skew + 1) in pair_ids, "cap destroyed the isolated pair"
    cluster_pairs = [p for p in pair_ids if p[0] < skew and p[1] < skew]
    print(
        f"3. cap: {skew}-member shared-band cluster capped at 100 — "
        f"{len(cluster_pairs)} cluster pairs kept (template mass removed), "
        f"isolated hamming-1 pair preserved"
    )
    print("SOAK R9 GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
