"""BM25 retrieval, blocked fuzzy join, and PageRank — the round-6 retrieval /
record-linkage / graph additions (no reference counterpart; driver-mandated
extension surface).  Cross-engine value checks live in the oracle gates
(``bm25_topk`` / ``fuzzy_part_pairs`` / ``pagerank_trade``); these tests pin
the SEMANTICS on hand-built inputs where the right answer is computable by
hand or a tiny numpy reference.
"""

import math

import pytest
from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import pagerank
from cerebro_spark.operators.joins import fuzzy_join_blocked
from cerebro_spark.operators.text import bm25_topk


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Textbook Okapi BM25 (Lucene +1-in-log idf) in pure Python."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for q in sorted(set(terms)):
            tf = tk.count(q)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(tk) / avgdl))
        if s > 0.0:
            out[i] = s
    return out


def test_bm25_matches_textbook_reference(spark):
    docs = [
        (1, "spark join merge window spark spark"),
        (2, "window window window hash table"),
        (3, "merge sort run length"),
        (4, "nothing relevant here at all"),
        (5, "spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ("spark", "window", "merge"), k=10).collect()
    }
    ref = _bm25_ref(docs, ("spark", "window", "merge"))
    assert set(got) == set(ref)  # doc 4 (no query term) absent
    for i, s in ref.items():
        assert got[i] == pytest.approx(s, abs=1e-6)  # 1e-6 quantization


def test_bm25_rank_order_and_k(spark):
    docs = [(i, "spark " * i + "pad") for i in range(1, 8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, ("spark",), k=3).orderBy("rank").collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]
    # more occurrences in a shorter doc => higher score; scores descend
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_requires_terms(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, ())


# ---------------------------------------------------------------------------
# blocked fuzzy join
# ---------------------------------------------------------------------------

def test_fuzzy_join_blocked_pairs_and_blocking(spark):
    rows = [
        (1, "acme corp", "A"),
        (2, "acme corp.", "A"),   # distance 1 to #1, same block
        (3, "acme corpse", "A"),  # distance 2 to #1
        (4, "acme corp", "B"),    # identical text, DIFFERENT block -> no pair
        (5, "zzzzzzzzzz", "A"),   # same block, far away -> filtered
    ]
    base = spark.createDataFrame(rows, "id long, name string, blk string")
    a = base.select(F.col("id").alias("key_a"), "name", "blk")
    b = base.select(F.col("id").alias("key_b"), "name", "blk")
    got = {
        (r["key_a"], r["key_b"]): r["distance"]
        for r in fuzzy_join_blocked(
            a, b, "name", ["blk"], max_distance=2,
            left_id="key_a", right_id="key_b", dedup_pairs=True,
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 3 - 1}  # (2,3) distance 2
    # the (1,4) identical-name pair is absent: blocking is an equi-key, a
    # recall/cost tradeoff the caller owns (docstring contract)


def test_fuzzy_join_length_prefilter_semantics(spark):
    # |len(a)-len(b)| > max_distance can never pass; prefilter must not
    # change results, only skip DP work — assert the boundary pair survives
    rows = [(1, "abcd", "X"), (2, "abcdef", "X")]  # len diff 2, distance 2
    base = spark.createDataFrame(rows, "id long, name string, blk string")
    a = base.select(F.col("id").alias("key_a"), "name", "blk")
    b = base.select(F.col("id").alias("key_b"), "name", "blk")
    out = fuzzy_join_blocked(
        a, b, "name", ["blk"], max_distance=2,
        left_id="key_a", right_id="key_b", dedup_pairs=True,
    ).collect()
    assert [(r["key_a"], r["key_b"], r["distance"]) for r in out] == [(1, 2, 2)]


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pr_ref(edges, iters=3, d=0.85, q=1e-9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for u, _ in set(edges):
        out[u] += 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        for u, v in sorted(set(edges)):
            s[v] += r[u] / out[u]
        r = {
            v: math.floor(((1.0 - d) / n + d * s[v]) / q + 0.5) * q
            for v in nodes
        }
    return r


def test_pagerank_matches_reference_on_small_graph(spark):
    # star: hub 1 pointed at by 2,3,4 (symmetrized like the gated query)
    e0 = [(2, 1), (3, 1), (4, 1), (2, 3)]
    edges = e0 + [(v, u) for u, v in e0]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    ref = _pr_ref(edges)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-9)
    # hub has the highest rank
    assert max(got, key=got.get) == 1


def test_pagerank_mass_conserved_without_dangling(spark):
    # symmetric graph => no dangling nodes => total rank stays ~1
    e0 = [(i, (i + 1) % 6) for i in range(6)]
    edges = e0 + [(v, u) for u, v in e0]
    df = spark.createDataFrame(edges, "src long, dst long")
    total = sum(
        r["rank"] for r in pagerank(df, iterations=5).collect()
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_weights_match_hand_computation(spark):
    from cerebro_spark.operators.text import dsir_weights

    docs = [
        (1, "alpha alpha beta", True),    # target-leaning vocabulary
        (2, "gamma gamma gamma", False),
        (3, "alpha beta beta", True),
        (4, "gamma beta", False),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, tgt boolean")
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(df, F.col("tgt"), k=10).collect()
    }

    # hand model: add-1 smoothed unigram LMs over corpus vocab (V=3)
    toks = {i: t.split() for i, t, _ in docs}
    tgt_ids = {i for i, _, f in docs if f}
    c_all, c_tgt = {}, {}
    for i, tk in toks.items():
        for w in tk:
            c_all[w] = c_all.get(w, 0) + 1
            if i in tgt_ids:
                c_tgt[w] = c_tgt.get(w, 0) + 1
    n_all, n_tgt, v = sum(c_all.values()), sum(c_tgt.values()), len(c_all)
    q = {
        w: math.floor(
            (
                math.log((c_tgt.get(w, 0) + 1.0) / (n_tgt + v))
                - math.log((c_all[w] + 1.0) / (n_all + v))
            )
            * 1e6
            + 0.5
        )
        for w in c_all
    }
    ref = {i: sum(q[w] for w in tk) for i, tk in toks.items()}
    assert got == ref
    # target-vocabulary docs outweigh source-only docs
    assert got[1] > got[2] and got[3] > got[2]


def test_dsir_weight_is_integer_micro_nats(spark):
    from cerebro_spark.operators.text import dsir_weights

    df = spark.createDataFrame(
        [(1, "x y", True), (2, "y z", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = dsir_weights(df, F.col("tgt"), k=10)
    assert dict(out.dtypes)["weight"] == "bigint"


# ---------------------------------------------------------------------------
# triangle participation
# ---------------------------------------------------------------------------

def test_triangle_participation_hand_graph(spark):
    from cerebro_spark.operators.cluster import triangle_participation

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) + pendant 5 + an
    # isolated edge (6,7); duplicate and reversed edges must not double-count
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    edges += [(4, 5), (6, 7), (1, 2)]  # reversed dups + pendant + isolated
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"]
        for r in triangle_participation(df).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_participation_no_triangles(spark):
    from cerebro_spark.operators.cluster import triangle_participation

    # a path graph has no triangles
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    assert triangle_participation(df).count() == 0


def test_fuzzy_join_cross_table_keeps_reversed_id_order(spark):
    # two-table linkage (default dedup_pairs=False): disjoint id ranges with
    # left ids ABOVE right ids must still match — the self-join (l < r)
    # filter would silently drop every pair here
    left = spark.createDataFrame(
        [(1001, "acme corp", "A")], "key_a long, name string, blk string"
    )
    right = spark.createDataFrame(
        [(7, "acme corp.", "A")], "key_b long, name string, blk string"
    )
    out = fuzzy_join_blocked(
        left, right, "name", ["blk"], max_distance=2,
        left_id="key_a", right_id="key_b",
    ).collect()
    assert [(r["key_a"], r["key_b"], r["distance"]) for r in out] == [(1001, 7, 1)]


def test_bm25_empty_corpus_returns_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(df, ("spark",), k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "rank"]


# ---------------------------------------------------------------------------
# neighbor Jaccard (link prediction) — round-6 third batch
# ---------------------------------------------------------------------------

def test_neighbor_jaccard_hand_graph(spark):
    from cerebro_spark.operators.cluster import neighbor_jaccard

    # N(a)={1,2,3}, N(b)={2,3,4}, N(c)={9} -> only (a,b) shares anything
    rows = [("a", n) for n in (1, 2, 3)] + [("b", n) for n in (2, 3, 4)] + [("c", 9)]
    df = spark.createDataFrame(rows, "entity string, neighbor long")
    out = neighbor_jaccard(df).collect()
    assert [(r["id_a"], r["id_b"], r["common"], r["jaccard"]) for r in out] == [
        ("a", "b", 2, 2 / (3 + 3 - 2))
    ]


def test_neighbor_jaccard_hub_cap_recounts_degrees(spark):
    from cerebro_spark.operators.cluster import neighbor_jaccard

    # hub neighbor 99 touches everyone; uncapped it creates an (a,c) pair
    # and inflates degrees — capped, degrees must be recomputed WITHOUT the
    # hub so numerator and denominator agree on the filtered graph
    rows = (
        [("a", n) for n in (1, 2, 3, 99)]
        + [("b", n) for n in (2, 3, 4, 99)]
        + [("c", 9), ("c", 99)]
    )
    df = spark.createDataFrame(rows, "entity string, neighbor long")
    unc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in neighbor_jaccard(df).collect()}
    assert ("a", "c") in unc and unc[("a", "b")] == 3 / (4 + 4 - 3)
    cap = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           neighbor_jaccard(df, max_neighbor_degree=2).collect()}
    assert ("a", "c") not in cap
    assert cap[("a", "b")] == 2 / (3 + 3 - 2)  # hub gone from BOTH sides


def test_neighbor_jaccard_topk_bounds_output(spark):
    from cerebro_spark.operators.cluster import neighbor_jaccard

    rows = [(f"e{i}", n) for i in range(6) for n in (1, 2)]
    df = spark.createDataFrame(rows, "entity string, neighbor long")
    out = neighbor_jaccard(df, top_k=3).collect()
    assert len(out) == 3
    assert all(r["jaccard"] == 1.0 for r in out)
    # deterministic tie-break: (id_a, id_b) ascending
    assert [(r["id_a"], r["id_b"]) for r in out] == [
        ("e0", "e1"), ("e0", "e2"), ("e0", "e3")
    ]


# ---------------------------------------------------------------------------
# co-occurrence lift (market basket) — round-6 third batch
# ---------------------------------------------------------------------------

def test_cooccurrence_lift_hand_baskets(spark):
    from cerebro_spark.operators.cluster import cooccurrence_lift

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["item_a"], r["item_b"]): (r["pair_count"], r["support"], r["lift"])
        for r in cooccurrence_lift(df, min_pair_count=1).collect()
    }
    # n=4 baskets, cnt x=3 y=3 z=1
    assert out[("x", "y")] == (2, 2 / 4, 2 * 4 / (3 * 3))
    assert out[("x", "z")] == (1, 1 / 4, 1 * 4 / (3 * 1))
    assert ("y", "z") not in out  # never co-occur


def test_cooccurrence_lift_min_pair_count_and_dedup(spark):
    from cerebro_spark.operators.cluster import cooccurrence_lift

    # duplicate (basket, item) rows must count once; min_pair_count prunes
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = cooccurrence_lift(df, min_pair_count=2).collect()
    assert [(r["item_a"], r["item_b"], r["pair_count"]) for r in out] == [("x", "y", 2)]


def test_cooccurrence_basket_cap_drops_giant_basket(spark):
    from cerebro_spark.operators.cluster import cooccurrence_lift

    rows = [(1, "x"), (1, "y")] + [(9, f"i{k}") for k in range(10)]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = cooccurrence_lift(df, min_pair_count=1, max_basket_size=5).collect()
    # only basket 1 survives: one pair, marginals recomputed on survivors
    assert [(r["item_a"], r["item_b"], r["pair_count"], r["support"], r["lift"])
            for r in out] == [("x", "y", 1, 1.0, 1.0)]


# ---------------------------------------------------------------------------
# k-core and label propagation — round-6 third batch
# ---------------------------------------------------------------------------

def test_kcore_peels_tail_and_keeps_clique(spark):
    from cerebro_spark.operators.cluster import kcore

    # K4 clique (nodes 1-4, degree 3) with a pendant chain 4-5-6; the chain
    # must cascade out of the 3-core over TWO rounds (6 first, then 5)
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    out = {r["node"]: r["degree"] for r in kcore(df, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_k_exceeds_graph(spark):
    from cerebro_spark.operators.cluster import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert kcore(df, k=5).count() == 0


def test_kcore_k1_keeps_everything(spark):
    from cerebro_spark.operators.cluster import kcore

    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    out = {r["node"]: r["degree"] for r in kcore(df, k=1).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def _lpa_ref(edges, iterations):
    """Pure-Python synchronous LPA with self-vote and min-label tie-break."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    lab = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n in adj:
            votes = Counter(lab[m] for m in adj[n])
            votes[lab[n]] += 1  # self-vote
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lab = new
    return lab


def test_label_propagation_matches_reference(spark):
    from cerebro_spark.operators.cluster import label_propagation

    # two triangles joined by one bridge edge — LPA should keep them as
    # two communities where plain connected components merges them
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _lpa_ref(edges, iters), f"iterations={iters}"


def test_label_propagation_two_communities_despite_bridge(spark):
    from cerebro_spark.operators.cluster import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=3).collect()
    }
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11], got[12]} == {10}


# ---------------------------------------------------------------------------
# reciprocal-rank fusion — round-6 third batch
# ---------------------------------------------------------------------------

def test_rrf_fuse_hand_rankings(spark):
    from cerebro_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    sem = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    out = {
        r["doc_id"]: (r["n_systems"], r["rrf"])
        for r in rrf_fuse({"lex": lex, "sem": sem}, k=60).collect()
    }
    q = lambda x: __import__("math").floor(x / 1e-9 + 0.5) * 1e-9  # noqa: E731
    assert out[2] == (2, q(1 / 62 + 1 / 61))  # in both systems
    assert out[1] == (1, q(1 / 61))
    assert out[3] == (1, q(1 / 63))
    assert out[4] == (1, q(1 / 62))


def test_rrf_fuse_order_prefers_consensus(spark):
    from cerebro_spark.operators.similarity import rrf_fuse

    # a doc ranked 3rd by BOTH systems must beat a doc ranked 1st by one
    lex = spark.createDataFrame([(1, 1), (9, 3)], "doc_id long, rank int")
    sem = spark.createDataFrame([(2, 1), (9, 3)], "doc_id long, rank int")
    fused = rrf_fuse({"lex": lex, "sem": sem}).collect()
    best = max(fused, key=lambda r: (r["rrf"], -r["doc_id"]))
    assert best["doc_id"] == 9


def test_rrf_fuse_requires_rankings(spark):
    from cerebro_spark.operators.similarity import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse({})


# ---------------------------------------------------------------------------
# TextRank, snapshot diff, k-anonymity — round-6 third batch
# ---------------------------------------------------------------------------

def test_textrank_matches_pagerank_on_hand_graph(spark):
    from cerebro_spark.operators.text import textrank_keywords

    # corpus engineered so the word graph is known: 'hub' is adjacent to
    # every other word, so it must get the top TextRank score
    docs = [
        (1, "hub alpha hub beta hub gamma"),
        (2, "hub alpha hub beta hub gamma"),
        (3, "hub alpha hub beta hub gamma"),
        (4, "alpha beta alpha beta alpha beta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["word"]: r["score"] for r in
           textrank_keywords(df, min_cooccur=3, iterations=3).collect()}
    # graph: hub-alpha, hub-beta, hub-gamma (>=3 co-occurrences each),
    # alpha-beta (5 in doc 4 + adjacents in docs 1-3? alpha/beta never
    # adjacent there) -> verify via the same pure-Python pagerank reference
    edges = [("hub", "alpha"), ("hub", "beta"), ("hub", "gamma"),
             ("alpha", "beta")]
    sym = edges + [(b, a) for a, b in edges]
    ref = _pr_ref(sym, iters=3)
    assert set(out) == set(ref)
    for w, s in ref.items():
        assert out[w] == pytest.approx(s, abs=1e-9), w
    assert max(out, key=out.get) == "hub"


def test_snapshot_diff_statuses_and_null_semantics(spark):
    from cerebro_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 31.0), (5, 50.0)], "k long, v double"
    )
    out = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent), 2 NULL==NULL unchanged (absent), 3 changed,
    # 4 removed, 5 added
    assert out == {3: "changed", 4: "removed", 5: "added"}


def test_snapshot_diff_null_to_value_is_changed(spark):
    from cerebro_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0)], "k long, v double")
    out = snapshot_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["status"]) for r in out] == [(1, "changed")]


def test_k_anonymity_hand_classes(spark):
    from cerebro_spark.operators.profile import k_anonymity

    # classes: ('a',) x6 safe, ('b',) x2 risky, ('c',) x1 risky
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "q string")
    r = k_anonymity(df, ["q"], k=5).collect()[0]
    assert (r["n_rows"], r["n_groups"], r["n_risky_groups"],
            r["n_risky_rows"]) == (9, 3, 2, 3)
    assert r["risky_row_share"] == pytest.approx(3 / 9)


# ---------------------------------------------------------------------------
# personalized PageRank + mergeable rollup state — round-6 third batch
# ---------------------------------------------------------------------------

def _ppr_ref(edges, seeds, iters=3, d=0.85, q=1e-9):
    """Pure-Python personalized PageRank mirroring the operator exactly."""
    import math
    from collections import defaultdict

    out = defaultdict(list)
    nodes = set()
    for u, v in edges:
        out[u].append(v)
        nodes.update((u, v))
    r = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(float)
        for u, vs in out.items():
            for v in vs:
                contrib[v] += r[u] / len(vs)
        r = {
            n: math.floor(
                (((1 - d) / len(seeds) if n in seeds else 0.0) + d * contrib[n])
                / q + 0.5
            ) * q
            for n in nodes
        }
    return r


def test_personalized_pagerank_concentrates_near_seed(spark):
    from cerebro_spark.operators.cluster import pagerank

    # path graph a-b-c-d-e symmetrized, seeded at 'a'.  Values must match
    # the reference exactly; structurally, mass OSCILLATES on a bipartite
    # path at finite iterations (odd iterations load the odd-distance
    # nodes), so assert the parity facts, not naive monotonic decay: the
    # direct neighbor dominates, and a node 4 hops out has received
    # nothing after 3 iterations.
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    sym = chain + [(y, x) for x, y in chain]
    df = spark.createDataFrame(sym, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=3, assume_distinct=True,
                          seeds=["a"]).collect()
    }
    ref = _ppr_ref(sym, {"a"})
    assert got == ref
    assert max(got, key=got.get) == "b"
    assert got["e"] == 0.0


def test_pagerank_unseeded_unchanged_by_new_param(spark):
    from cerebro_spark.operators.cluster import pagerank

    sym = [("a", "b"), ("b", "a")]
    df = spark.createDataFrame(sym, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=2).collect()}
    # symmetric 2-cycle: stationary uniform 0.5/0.5
    assert got == {"a": 0.5, "b": 0.5}


def test_rollup_state_merge_identity(spark):
    from cerebro_spark.operators.rollup import merge_rollup_states, rollup_state

    rows = [("x", 1.004), ("x", 2.006), ("y", -3.5), ("y", 0.0), ("x", 10.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    direct = {r["k"]: r for r in rollup_state(df, ["k"]).collect()}
    a = rollup_state(df.filter(F.col("value") < 1.5), ["k"])
    b = rollup_state(df.filter(F.col("value") >= 1.5), ["k"])
    merged = {r["k"]: r for r in merge_rollup_states([a, b], ["k"]).collect()}
    for k in direct:
        for c in ("n", "vmin", "vmax", "vsum_e2"):
            assert merged[k][c] == direct[k][c], (k, c)
    # e2 quantization is half-up floor: 1.004 -> 100, 2.006 -> 201
    assert direct["x"]["vsum_e2"] == 100 + 201 + 1000


def test_merge_rollup_states_requires_input(spark):
    from cerebro_spark.operators.rollup import merge_rollup_states

    with pytest.raises(ValueError):
        merge_rollup_states([], ["k"])


# --- SCD2 collapse -------------------------------------------------------


def _scd2_rows(spark, rows):
    from cerebro_spark.operators.profile import scd2_collapse

    df = spark.createDataFrame(rows, "k string, eid long, ts timestamp, a string")
    out = scd2_collapse(
        df, key_cols=["k"], attr_cols=["a"], ts_col="ts", tiebreak_cols=["eid"]
    )
    return sorted(out.collect(), key=lambda r: (r["k"], r["valid_from"]))


def test_scd2_collapses_runs_and_marks_current(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        ("u", 1, t(0), "A"), ("u", 2, t(10), "A"), ("u", 3, t(20), "B"),
        ("u", 4, t(30), "B"), ("u", 5, t(40), "A"),
    ]
    got = _scd2_rows(spark, rows)
    assert [(r["a"], r["n_events"], r["is_current"]) for r in got] == [
        ("A", 2, False), ("B", 2, False), ("A", 1, True),
    ]
    # valid_to chains exactly onto the next valid_from
    assert got[0]["valid_to"] == got[1]["valid_from"]
    assert got[1]["valid_to"] == got[2]["valid_from"]
    assert got[2]["valid_to"] is None


def test_scd2_same_ts_ties_break_on_tiebreaker(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # two rows at the SAME timestamp: eid order decides the run sequence
    rows = [("u", 2, t0, "B"), ("u", 1, t0, "A")]
    got = _scd2_rows(spark, rows)
    assert [r["a"] for r in got] == ["A", "B"]
    assert got[0]["is_current"] is False and got[1]["is_current"] is True


def test_scd2_null_attribute_runs_collapse(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    # NULL==NULL must be one run (eqNullSafe), and NULL->A a boundary
    rows = [("u", 1, t(0), None), ("u", 2, t(10), None), ("u", 3, t(20), "A")]
    got = _scd2_rows(spark, rows)
    assert [(r["a"], r["n_events"]) for r in got] == [(None, 2), ("A", 1)]


# --- chi-square independence ----------------------------------------------


def test_chi2_independence_zero_for_independent_grid(spark):
    from cerebro_spark.operators.profile import chi2_independence

    # perfectly independent 2x2: every cell = ra*cb/n exactly -> chi2 = 0
    rows = [("x", 0)] * 4 + [("x", 1)] * 4 + [("y", 0)] * 4 + [("y", 1)] * 4
    df = spark.createDataFrame(rows, "a string, b int")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert out["chi2"] == 0.0 and out["dof"] == 1 and out["n"] == 16
    assert out["cramers_v"] == 0.0


def test_chi2_independence_perfect_association(spark):
    from cerebro_spark.operators.profile import chi2_independence

    # perfect association: a determines b -> chi2 = n, V = 1
    rows = [("x", 0)] * 5 + [("y", 1)] * 5
    df = spark.createDataFrame(rows, "a string, b int")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert abs(out["chi2"] - 10.0) < 1e-9
    assert abs(out["cramers_v"] - 1.0) < 1e-9


def test_chi2_independence_zero_cells_contribute(spark):
    from cerebro_spark.operators.profile import chi2_independence

    # 2x2 with an EMPTY cell: dropping it would understate chi2.
    # counts: (x,0)=4 (x,1)=0 / (y,0)=2 (y,1)=2 -> e(x,1)=8*... hand value:
    # n=8, ra(x)=4, cb(1)=2 -> e(x,1)=1, term=(0-1)^2/1=1; full chi2 = 8/3.
    rows = [("x", 0)] * 4 + [("y", 0)] * 2 + [("y", 1)] * 2
    df = spark.createDataFrame(rows, "a string, b int")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert abs(out["chi2"] - 8.0 / 3.0) < 1e-5  # e6 quantization


# --- Gini concentration ----------------------------------------------------


def test_gini_zero_for_equal_values(spark):
    from cerebro_spark.operators.profile import gini_concentration

    df = spark.createDataFrame([(i, 100) for i in range(10)], "k long, v long")
    out = gini_concentration(df, "v", "k").collect()[0]
    assert abs(out["gini"]) < 1e-12
    assert out["n"] == 10 and out["total"] == 1000


def test_gini_extreme_concentration(spark):
    from cerebro_spark.operators.profile import gini_concentration

    # one key holds everything: G = (n-1)/n
    rows = [(i, 0) for i in range(9)] + [(9, 1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = gini_concentration(df, "v", "k").collect()[0]
    assert abs(out["gini"] - 0.9) < 1e-12


def test_gini_matches_hand_formula_and_single_bucket(spark):
    from cerebro_spark.operators.profile import gini_concentration

    vals = [1, 2, 3, 4, 10]
    df = spark.createDataFrame(list(enumerate(vals)), "k long, v long")
    # ranks ascending: sum(i*x) = 1*1+2*2+3*3+4*4+5*10 = 80
    expect = 2 * 80 / (5 * 20) - 6 / 5
    for nb in (1, 1024):  # degenerate single bucket must agree
        out = gini_concentration(df, "v", "k", n_buckets=nb).collect()[0]
        assert abs(out["gini"] - expect) < 1e-12, nb


def test_chi2_independence_excludes_null_categories(spark):
    from cerebro_spark.operators.profile import chi2_independence

    # NULL categories are excluded up front (complete-case chi2): without
    # the filter the grid equi-join reads NULL cells as o=0 while their
    # mass stays in n and the marginals, corrupting the statistic.
    base = [("x", 0)] * 4 + [("x", 1)] * 4 + [("y", 0)] * 4 + [("y", 1)] * 4
    with_nulls = base + [(None, 1)] * 4 + [("x", None)] * 3
    df = spark.createDataFrame(with_nulls, "a string, b int")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert out["n"] == 16 and out["chi2"] == 0.0 and out["dof"] == 1


def test_bootstrap_ci_brackets_mean(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.profile import bootstrap_ci

    # 500 values uniform-ish via hash, true mean well inside the CI
    rows = [Row(id=i, v=float((i * 2654435761) % 1000) / 10.0)
            for i in range(500)]
    out = bootstrap_ci(spark.createDataFrame(rows), "v", "id", b=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 500 and r["b"] == 100
    true_mean = sum(x["v"] for x in rows) / 500
    # the point estimate is the exact fixed-point mean
    assert abs(r["mean"] - true_mean) < 1e-3
    # percentile CI brackets the estimate and is non-degenerate
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    assert r["ci_hi"] - r["ci_lo"] > 0
    # ~ ±2·σ/√n wide: σ(U[0,100)) ≈ 28.9 → full width ≈ 5.2; sanity band
    width = r["ci_hi"] - r["ci_lo"]
    assert 2.0 < width < 12.0
    # hash-deterministic: identical on re-run
    again = bootstrap_ci(spark.createDataFrame(rows), "v", "id", b=100).collect()[0]
    assert (again["ci_lo"], again["ci_hi"]) == (r["ci_lo"], r["ci_hi"])


def test_poisson_bootstrap_weight_distribution(spark):
    from pyspark.sql import functions as F

    from cerebro_spark.operators.profile import poisson_bootstrap_weight

    df = spark.range(20000).select(
        poisson_bootstrap_weight(F.col("id"), F.lit(0)).alias("w")
    )
    stats = df.agg(F.avg("w").alias("m"),
                   F.avg(F.when(F.col("w") == 0, 1.0).otherwise(0.0)).alias("p0"),
                   F.max("w").alias("mx")).collect()[0]
    # Poisson(1): mean 1, P(0) = e^-1 ≈ 0.368, capped at 8
    assert abs(stats["m"] - 1.0) < 0.03
    assert abs(stats["p0"] - 0.3679) < 0.02
    assert stats["mx"] <= 8


def test_cuped_lift_hand_computed(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.profile import cuped_lift

    # y = 2x + variant with x ⟂ variant (both arms see the same x set):
    # cov(x,v)=0 so theta is exactly 2, the covariate explains ~all
    # variance, and the adjusted lift equals the true +1 effect
    rows = [Row(variant=v, x=x, y=2 * x + v)
            for v in (0, 1) for x in (10, 20, 30)]
    out = cuped_lift(spark.createDataFrame(rows)).collect()[0]
    assert out["n"] == 6 and out["n_a"] == 3 and out["n_b"] == 3
    assert abs(out["theta"] - 2.0) < 1e-12
    assert abs(out["diff_raw"] - 1.0) < 1e-9
    assert abs(out["diff_cuped"] - 1.0) < 1e-9
    assert out["var_reduction"] > 0.99
    # degenerate covariate: var(X)=0 -> NULL theta, no crash
    flat = [Row(variant=i % 2, x=5, y=i) for i in range(4)]
    out2 = cuped_lift(spark.createDataFrame(flat)).collect()[0]
    assert out2["theta"] is None and out2["diff_cuped"] is None
    assert out2["diff_raw"] is not None


def test_calibration_bins_and_ece(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.profile import (
        calibration_bins,
        expected_calibration_error,
    )

    # perfectly calibrated scorer: within each bin, positive rate == score
    rows = []
    for score, pos_in_10 in [(0.25, 2.5), (0.75, 7.5)]:
        for i in range(20):
            rows.append(Row(score=score, label=i < pos_in_10))
    cal = spark.createDataFrame(rows)
    bins = {r["bin"]: r for r in
            calibration_bins(cal, "score", "label").collect()}
    assert set(bins) == {2, 7}
    for b, s in ((2, 0.25), (7, 0.75)):
        assert bins[b]["n"] == 20
        assert abs(bins[b]["conf"] - s) < 1e-9
        # 0.25 -> 5/20 isn't integral for 2.5/10·20... use acc == rate
    assert abs(bins[2]["acc"] - 0.15) < 1e-9   # floor(2.5)=2 of 20? no: i<2.5 -> 3 of 20
    ece = expected_calibration_error(cal, "score", "label").collect()[0]
    assert ece["n"] == 40 and ece["bins"] == 10

    # maximally miscalibrated: score 0.95 with zero positives -> ECE ≈ 0.95
    bad = spark.createDataFrame([Row(score=0.95, label=False)] * 50)
    e = expected_calibration_error(bad, "score", "label").collect()[0]
    assert abs(e["ece"] - 0.95) < 1e-9
    b9 = calibration_bins(bad, "score", "label").collect()[0]
    assert b9["bin"] == 9 and abs(b9["gap"] + 0.95) < 1e-9

    # score exactly 1.0 clamps into the top bin, never bin==bins
    top = spark.createDataFrame([Row(score=1.0, label=True)] * 3)
    t = calibration_bins(top, "score", "label").collect()[0]
    assert t["bin"] == 9 and abs(t["gap"]) < 1e-9 + 0.0  # acc=1, conf=1


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------

def _mmr_ref(vecs, query_ids, k, nc, lam):
    """Greedy MMR in pure Python with the operator's exact arithmetic:
    sequential-fold dot/norm (IEEE order matches F.aggregate), id tiebreaks."""
    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        return math.sqrt(dot(a, a))

    def cos(a, b):
        return dot(a, b) / (norm(a) * norm(b))

    out = {}
    for q in query_ids:
        rel = sorted(
            ((cos(vecs[q], v), -i) for i, v in vecs.items() if i != q),
            reverse=True,
        )[:nc]
        cand = {-ni: c for c, ni in rel}
        first = max(cand.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        sel = [first]
        while len(sel) < min(k, len(cand)):
            best = None
            for i, c in cand.items():
                if i in sel:
                    continue
                pen = max(cos(vecs[i], vecs[s]) for s in sel)
                score = lam * c - (1.0 - lam) * pen
                key = (score, -i)
                if best is None or key > best[0]:
                    best = (key, i)
            sel.append(best[1])
        out[q] = [(i, r + 1) for r, i in enumerate(sel)]
    return out


def test_mmr_rerank_matches_greedy_reference(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.similarity import mmr_rerank

    # 8 deterministic 4-d vectors incl. a planted near-duplicate pair
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.99, 0.01, 0.0, 0.0],   # near-dup of 0
        2: [0.98, 0.02, 0.01, 0.0],  # near-dup of 0/1
        3: [0.5, 0.5, 0.5, 0.5],
        4: [0.0, 1.0, 0.0, 0.0],
        5: [0.0, 0.0, 1.0, 0.0],
        6: [0.3, 0.3, 0.9, 0.1],
        7: [0.7, 0.1, 0.1, 0.7],
    }
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    got = {}
    for r in mmr_rerank(df, df.filter(F.col("vec_id") == 0),
                        k=4, n_candidates=7, lam=0.5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["mmr_rank"])
        )
    ref = _mmr_ref(vecs, [0], k=4, nc=7, lam=0.5)
    assert sorted(got[0], key=lambda t: t[1]) == ref[0]
    # diversity really kicked in: pure relevance would rank the planted
    # near-dups 1-2; MMR demotes the second one below a diverse pick
    picked = [i for i, _ in sorted(got[0], key=lambda t: t[1])]
    assert not ({1, 2} <= set(picked[:2]))
    assert picked[1] not in (1, 2)


def test_mmr_rerank_k_exceeding_candidates(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.similarity import mmr_rerank

    vecs = {0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0]}
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )
    out = mmr_rerank(df, df.filter(F.col("vec_id") == 0),
                     k=10, n_candidates=5).collect()
    # only 2 candidates exist (self excluded): emits 2 rows, ranks 1..2
    assert sorted(r["mmr_rank"] for r in out) == [1, 2]


def test_winsorized_mean_hand_computed(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.profile import winsorized_mean

    # 20 values 1..19 plus one absurd outlier; 5/95 winsorization clamps
    # exactly one value at each end (ceil(0.05*20)=1, ceil(0.95*20)=19)
    vals = list(range(1, 20)) + [10_000]
    rows = [Row(k="a", v=float(x)) for x in vals]
    out = winsorized_mean(spark.createDataFrame(rows), "v", ["k"]).collect()[0]
    assert out["n"] == 20
    # p_lo = 1st smallest = 1; p_hi = 19th smallest = 19
    assert out["p_lo"] == 1.0 and out["p_hi"] == 19.0
    # clamp: 10000 -> 19; everything else unchanged
    want = (sum(range(1, 20)) + 19) / 20
    assert abs(out["win_mean"] - want) < 1e-9
    # the raw mean is destroyed by the outlier; winsorized is not
    assert out["raw_mean"] > 500 and out["win_mean"] < 20

    # keyless mode + all-equal values: p_lo == p_hi == mean
    flat = spark.createDataFrame([Row(k="x", v=7.0)] * 5)
    o = winsorized_mean(flat, "v").collect()[0]
    assert o["p_lo"] == o["p_hi"] == 7.0 and o["win_mean"] == 7.0


def test_conformal_interval_coverage_guarantee(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.profile import conformal_interval

    # hash-uniform noise around a per-group constant: split conformal must
    # deliver >= 1 - alpha coverage in expectation (check with slack)
    rows = []
    for i in range(4000):
        g = "a" if i % 2 == 0 else "b"
        center = 100.0 if g == "a" else 200.0
        noise = float((i * 2654435761) % 1000) / 100.0  # U[0, 10)
        rows.append(Row(id=i, g=g, v=center + noise))
    out = {r["g"]: r for r in conformal_interval(
        spark.createDataFrame(rows), "v", "g", "id"
    ).collect()}
    assert set(out) == {"a", "b"}
    for g, center in (("a", 100.0), ("b", 200.0)):
        r = out[g]
        # predictor recovers the group center + mean noise (~5)
        assert abs(r["pred"] - (center + 5.0)) < 0.3
        # calibration capped at 1000 per key
        assert 0 < r["n_calib"] <= 1000
        # distribution-free guarantee: coverage >= 0.9 (small-sample slack)
        assert r["coverage"] >= 0.85
        # and the interval is not vacuous (qhat < full noise span)
        assert 0 < r["qhat"] <= 10.0
    # degenerate: a constant group -> qhat 0, coverage 1
    const = spark.createDataFrame(
        [Row(id=i, g="c", v=5.0) for i in range(400)]
    )
    rc = conformal_interval(const, "v", "g", "id").collect()[0]
    assert rc["qhat"] == 0.0 and rc["coverage"] == 1.0


def test_embedding_half_drift_hand_computed(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.similarity import embedding_half_drift

    # label "m": even half centered at [0,0], odd half at [1, 0.5]
    rows = [
        Row(vec_id=0, label="m", embedding=[0.0, 0.0]),
        Row(vec_id=2, label="m", embedding=[0.0, 0.0]),
        Row(vec_id=1, label="m", embedding=[1.0, 0.5]),
        Row(vec_id=3, label="m", embedding=[1.0, 0.5]),
        # label "s": identical halves -> zero drift
        Row(vec_id=4, label="s", embedding=[0.25, 0.75]),
        Row(vec_id=5, label="s", embedding=[0.25, 0.75]),
        # label "e": only one half present -> NULL drift, never Inf
        Row(vec_id=6, label="e", embedding=[0.5, 0.5]),
    ]
    out = {r["label"]: r for r in
           embedding_half_drift(spark.createDataFrame(rows)).collect()}
    m = out["m"]
    assert m["n_even"] == 2 and m["n_odd"] == 2
    assert abs(m["l1_drift"] - 1.5) < 1e-9          # |1-0| + |0.5-0|
    assert m["max_dim"] == 0 and abs(m["max_dim_drift"] - 1.0) < 1e-9
    s = out["s"]
    assert s["l1_drift"] == 0.0 and s["max_dim_drift"] == 0.0
    e = out["e"]
    assert e["l1_drift"] is None and e["max_dim_drift"] is None


def test_srm_chi2_collapse_identity(spark):
    # the srm_check gate relies on the two-cell Pearson chi2 collapsing to
    # (n_a - n_b)^2 / n — verify the algebra against the textbook form
    for n_a, n_b in [(500, 500), (520, 480), (10, 0), (1, 2)]:
        n = n_a + n_b
        e = n / 2
        textbook = (n_a - e) ** 2 / e + (n_b - e) ** 2 / e
        collapsed = (n_a - n_b) ** 2 / n
        assert abs(textbook - collapsed) < 1e-12
