"""Round-8 operator batch: paired-ranker nDCG sign test, registered-domain
leakage-guarded split, and the train×eval near-dup decontamination join.

Cross-engine value checks live in the oracle gates (``ranker_sign_test``,
``domain_guarded_split``, ``decontaminate_eval``); these tests pin SEMANTICS
on hand-built inputs where the right answer is computable by hand or a tiny
pure-Python reference.
"""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# paired_ndcg_sign_test
# ---------------------------------------------------------------------------

def _sign_test(spark, rows, k=3):
    from cerebro_spark.operators.text import paired_ndcg_sign_test

    df = spark.createDataFrame(
        rows, "g string, sa double, sb double, i long, rel boolean"
    )
    return paired_ndcg_sign_test(df, "g", "sa", "sb", "rel", "i", k=k).collect()[0]


def test_paired_sign_test_hand_case(spark):
    # group g1: ranker A puts the relevant doc first, B puts it last →
    # A wins.  group g2: mirrored → B wins.  group g3: same ranking → tie.
    rows = []
    for i in range(3):  # g1: rel doc is i=0; A scores it highest
        rows.append(("g1", 3.0 - i, 1.0 + i, i, i == 0))
    for i in range(3):  # g2: rel doc is i=0; B scores it highest
        rows.append(("g2", 1.0 + i, 3.0 - i, i, i == 0))
    for i in range(3):  # g3: identical scores → identical ranking
        rows.append(("g3", 3.0 - i, 3.0 - i, i, i == 0))
    out = _sign_test(spark, rows)
    assert out["n_queries"] == 3
    assert out["a_wins"] == 1 and out["b_wins"] == 1 and out["ties"] == 1
    assert out["z"] == pytest.approx(0.0)


def test_paired_sign_test_excludes_groups_with_no_relevant(spark):
    rows = [("g1", 2.0, 1.0, 1, True), ("g1", 1.0, 2.0, 2, False),
            ("g0", 2.0, 1.0, 1, False), ("g0", 1.0, 2.0, 2, False)]
    out = _sign_test(spark, rows)
    assert out["n_queries"] == 1  # g0 dropped: nDCG undefined
    assert out["a_wins"] == 1 and out["b_wins"] == 0


def test_paired_sign_test_all_ties_gives_null_z(spark):
    rows = [("g1", 2.0, 2.0, 1, True), ("g1", 1.0, 1.0, 2, False)]
    out = _sign_test(spark, rows)
    assert out["ties"] == 1 and out["z"] is None


def test_paired_sign_test_matches_python_reference(spark):
    # deterministic pseudo-random corpus; reference computes per-group
    # integer DCGs with the same weight table
    k = 5
    qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]
    rows = []
    for g in range(8):
        for i in range(12):
            sa = float((g * 12 + i) * 37 % 101)
            sb = float((g * 12 + i) * 59 % 97)
            rel = (g + i) % 3 == 0
            rows.append((f"g{g}", sa, sb, i, rel))

    def dcg(group_rows, key):
        ranked = sorted(group_rows, key=lambda r: (-r[key], r[3]))
        return sum(
            qw[pos] for pos, r in enumerate(ranked[:k]) if r[4]
        )

    wins_a = wins_b = ties = 0
    sum_a = sum_b = 0
    for g in range(8):
        gr = [r for r in rows if r[0] == f"g{g}"]
        if not any(r[4] for r in gr):
            continue
        da, db = dcg(gr, 1), dcg(gr, 2)
        sum_a += da
        sum_b += db
        if da > db:
            wins_a += 1
        elif db > da:
            wins_b += 1
        else:
            ties += 1
    out = _sign_test(spark, rows, k=k)
    assert (out["a_wins"], out["b_wins"], out["ties"]) == (wins_a, wins_b, ties)
    assert (out["sum_dcg2_a"], out["sum_dcg2_b"]) == (sum_a, sum_b)
    m = wins_a + wins_b
    assert out["z"] == pytest.approx((wins_a - wins_b) / math.sqrt(m))


# ---------------------------------------------------------------------------
# leakage_guarded_split
# ---------------------------------------------------------------------------

def test_leakage_guarded_split_no_domain_spans_two_splits(spark):
    from cerebro_spark.operators.sampling import leakage_guarded_split

    urls = []
    for d in range(60):
        for sub in ["", "www.", "docs.", "api."]:
            urls.append((len(urls), f"https://{sub}site{d}.com/p/{len(urls)}"))
    df = spark.createDataFrame(urls, "doc_id long, url string")
    out = leakage_guarded_split(df, "url")
    spans = (
        out.groupBy("domain")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    # subdomains collapse onto the registered domain
    doms = {r["domain"] for r in out.select("domain").distinct().collect()}
    assert doms == {f"site{d}.com" for d in range(60)}
    # with 60 domains at 10/10/80 every split is almost surely non-empty
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}


def test_leakage_guarded_split_is_deterministic(spark):
    from cerebro_spark.operators.sampling import leakage_guarded_split

    df = spark.createDataFrame(
        [(i, f"https://s{i % 7}.co.uk/x") for i in range(50)],
        "doc_id long, url string",
    )
    a = {(r["doc_id"], r["split"]) for r in leakage_guarded_split(df, "url").collect()}
    b = {(r["doc_id"], r["split"]) for r in
         leakage_guarded_split(df.repartition(8), "url").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# cross_jaccard_pairs / decontaminate
# ---------------------------------------------------------------------------

def _brute_cross(train, eval_docs, t):
    out = {}
    for tid, ttext in train:
        for eid, etext in eval_docs:
            a, b = set(ttext.split()), set(etext.split())
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if j >= t:
                out.setdefault(tid, []).append((eid, j))
    return {
        tid: (len(v), max(j for _, j in v), min(e for e, _ in v))
        for tid, v in out.items()
    }


def _corpus():
    base = " ".join(f"w{i}" for i in range(20))
    train = [
        (1, base),                                    # exact dup of eval 100
        (2, base.replace("w19", "z19")),              # J = 19/21 ≈ 0.905
        (3, " ".join(f"w{i}" for i in range(10))),    # J = 10/20 = 0.5
        (4, "totally unrelated words only here"),
        (5, base + " extra1 extra2"),                 # J = 20/22 ≈ 0.909
    ]
    eval_docs = [(100, base), (101, "another benchmark prompt entirely")]
    return train, eval_docs


def test_cross_jaccard_matches_brute_force(spark):
    from cerebro_spark.operators.dedup import cross_jaccard_pairs

    train, eval_docs = _corpus()
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(eval_docs, "doc_id long, text string")
    got = {
        (r["id_l"], r["id_r"]): r["jaccard"]
        for r in cross_jaccard_pairs(tdf, edf, threshold=0.8).collect()
    }
    want = {}
    for tid, ttext in train:
        for eid, etext in eval_docs:
            a, b = set(ttext.split()), set(etext.split())
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if j >= 0.8:
                want[(tid, eid)] = j
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])
    # no train×train pair can ever appear (both ids on the left corpus)
    assert all(r in want for r in got)


def test_cross_jaccard_boundary_threshold_exact(spark):
    # J exactly = t must be KEPT (the 1e-9 epsilon guards the IEEE ceil):
    # 4 shared of 4+5 tokens → J = 4/5 = 0.8
    from cerebro_spark.operators.dedup import cross_jaccard_pairs

    tdf = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    edf = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    rows = cross_jaccard_pairs(tdf, edf, threshold=0.8).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == pytest.approx(0.8)


def test_decontaminate_exact_flags_and_summary(spark):
    from cerebro_spark.operators.dedup import decontaminate

    train, eval_docs = _corpus()
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(eval_docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_eval_matches"], r["max_jaccard"], r["first_eval_id"])
        for r in decontaminate(tdf, edf, threshold=0.8).collect()
    }
    want = _brute_cross(train, eval_docs, 0.8)
    assert set(got) == set(want)
    for k, (n, mj, fe) in want.items():
        assert got[k][0] == n and got[k][2] == fe
        assert got[k][1] == pytest.approx(mj)
    # the clean set via anti-join drops exactly the flagged docs
    flagged = spark.createDataFrame(
        [(d,) for d in got], "doc_id long"
    )
    clean = tdf.join(flagged, "doc_id", "left_anti")
    assert {r["doc_id"] for r in clean.collect()} == {3, 4}


def test_decontaminate_minhash_path_agrees_on_high_sim(spark):
    # at J ≥ 0.9 with 32 hashes / 8 bands the LSH miss probability is
    # ~1e-4 per pair and the pipeline is fully deterministic (fixed hash
    # coefficients), so the planted near-dups must all surface — and the
    # minhash path's EXACT verification keeps the same jaccard values
    from cerebro_spark.operators.dedup import decontaminate

    train, eval_docs = _corpus()
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    edf = spark.createDataFrame(eval_docs, "doc_id long, text string")
    exact = {
        r["doc_id"]: r["max_jaccard"]
        for r in decontaminate(tdf, edf, threshold=0.9).collect()
    }
    mh = {
        r["doc_id"]: r["max_jaccard"]
        for r in decontaminate(tdf, edf, threshold=0.9, method="minhash").collect()
    }
    assert set(mh) == set(exact)
    for k in exact:
        assert mh[k] == pytest.approx(exact[k])


def test_decontaminate_rejects_unknown_method(spark):
    from cerebro_spark.operators.dedup import decontaminate

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="method"):
        decontaminate(df, df, method="simhash")


# ---------------------------------------------------------------------------
# mrr_at_k
# ---------------------------------------------------------------------------

def test_mrr_hand_case(spark):
    from cerebro_spark.operators.text import mrr_at_k

    rows = [
        # g1: relevant doc ranked 2nd -> rr = 0.5
        ("g1", 9.0, 1, False), ("g1", 8.0, 2, True), ("g1", 7.0, 3, False),
        # g2: relevant exists but outside top-2 -> rr 0.0 at k=2
        ("g2", 9.0, 1, False), ("g2", 8.0, 2, False), ("g2", 7.0, 3, True),
        # g3: no relevant at all -> NULLs
        ("g3", 9.0, 1, False),
    ]
    df = spark.createDataFrame(rows, "g string, s double, i long, rel boolean")
    out = {r["g"]: r for r in mrr_at_k(df, "g", "s", "rel", "i", k=2).collect()}
    assert out["g1"]["first_rel_rank"] == 2
    assert out["g1"]["rr_at_2"] == pytest.approx(0.5)
    assert out["g2"]["first_rel_rank"] is None
    assert out["g2"]["rr_at_2"] == pytest.approx(0.0)
    assert out["g3"]["first_rel_rank"] is None and out["g3"]["rr_at_2"] is None
    assert out["g2"]["n_rel"] == 1 and out["g3"]["n_rel"] == 0


def test_mrr_tie_break_is_total_order(spark):
    # equal scores break by id asc, so the rank is engine-independent
    from cerebro_spark.operators.text import mrr_at_k

    rows = [("g", 5.0, 3, True), ("g", 5.0, 1, False), ("g", 5.0, 2, False)]
    df = spark.createDataFrame(rows, "g string, s double, i long, rel boolean")
    out = mrr_at_k(df, "g", "s", "rel", "i", k=10).collect()[0]
    assert out["first_rel_rank"] == 3


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------

def _fleiss_ref(tables):
    """Pure-python Fleiss from per-subject category-count dicts."""
    n = len(tables)
    m = sum(next(iter(tables)).values()) if n else 0
    cats = sorted({c for t in tables for c in t})
    a = sum(v * v for t in tables for v in t.values()) - n * m
    b = sum(sum(t.get(c, 0) for t in tables) ** 2 for c in cats)
    p_bar = a / (n * m * (m - 1))
    p_e = b / (n * m) ** 2
    return (p_bar - p_e) / (1 - p_e)


def test_fleiss_kappa_matches_python_reference(spark):
    from cerebro_spark.operators.profile import fleiss_kappa

    # 10 subjects x 4 raters over 3 categories, deterministic
    rows, tables = [], []
    for s in range(10):
        t = {}
        for r in range(4):
            c = f"c{(s * 7 + r * 3) % 3 if s % 4 else 0}"
            t[c] = t.get(c, 0) + 1
            rows.append((s, c))
        tables.append(t)
    df = spark.createDataFrame(rows, "subject long, category string")
    out = fleiss_kappa(df, "subject", "category", m=4).collect()[0]
    assert out["n_subjects"] == 10 and out["n_ratings"] == 40
    assert out["kappa"] == pytest.approx(round(_fleiss_ref(tables), 6), abs=1e-6)


def test_fleiss_kappa_perfect_and_random(spark):
    from cerebro_spark.operators.profile import fleiss_kappa

    # perfect agreement across two categories -> kappa 1
    rows = [(s, "a" if s % 2 else "b") for s in range(6) for _ in range(3)]
    df = spark.createDataFrame(rows, "subject long, category string")
    assert fleiss_kappa(df, "subject", "category", m=3).collect()[0][
        "kappa"
    ] == pytest.approx(1.0)
    # one shared category: p_e = 1 -> NULL
    rows = [(s, "only") for s in range(4) for _ in range(3)]
    df = spark.createDataFrame(rows, "subject long, category string")
    assert fleiss_kappa(df, "subject", "category", m=3).collect()[0]["kappa"] is None


def test_fleiss_kappa_drops_incomplete_subjects(spark):
    from cerebro_spark.operators.profile import fleiss_kappa

    rows = [(1, "a"), (1, "a"), (1, "b"),
            (2, "a"), (2, "a"),            # only 2 ratings -> dropped
            (3, "b"), (3, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "subject long, category string")
    out = fleiss_kappa(df, "subject", "category", m=3).collect()[0]
    assert out["n_subjects"] == 2 and out["n_ratings"] == 6
    with pytest.raises(ValueError, match="m >= 2"):
        fleiss_kappa(df, "subject", "category", m=1)


# ---------------------------------------------------------------------------
# mde_power
# ---------------------------------------------------------------------------

def test_mde_power_matches_closed_form(spark):
    import math

    from cerebro_spark.operators.profile import (
        Z_ALPHA_025,
        Z_POWER_080,
        mde_power,
    )

    vals = [float(v) for v in [10, 12, 9, 11, 10, 13, 8, 11]]
    df = spark.createDataFrame([("s", v) for v in vals], "h string, v double")
    out = mde_power(df, "v", "h").collect()[0]
    n = len(vals)
    q = [round(v * 1e6) for v in vals]
    var = (n * sum(x * x for x in q) - sum(q) ** 2) / (n * (n - 1))
    sd = math.sqrt(var) / 1e6
    mde = (Z_ALPHA_025 + Z_POWER_080) * math.sqrt(4.0 * sd * sd / n)
    assert out["n"] == n
    assert out["sd"] == pytest.approx(round(sd, 6), abs=1e-6)
    assert out["mde_abs"] == pytest.approx(round(mde, 6), abs=1e-6)
    assert out["mde_rel"] == pytest.approx(
        round(mde / (sum(vals) / n), 6), rel=1e-4
    )


def test_mde_power_single_row_stratum_is_null(spark):
    from cerebro_spark.operators.profile import mde_power

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 1.0), ("b", 2.0)], "h string, v double"
    )
    out = {r["h"]: r for r in mde_power(df, "v", "h").collect()}
    assert out["a"]["sd"] is None and out["a"]["mde_abs"] is None
    assert out["b"]["mde_abs"] is not None


# ---------------------------------------------------------------------------
# bradley_terry
# ---------------------------------------------------------------------------

def _bt_ref(match_list, iterations=20):
    """Pure-python twin of the integer MM recurrence."""
    S, S2 = 10**12, 10**18
    items = sorted({x for m in match_list for x in m})
    wins = {i: 0 for i in items}
    nij = {}
    for w, l in match_list:
        if w == l:
            continue
        wins[w] += 1
        key = (w, l) if w < l else (l, w)
        nij[key] = nij.get(key, 0) + 1
    opp = {i: [] for i in items}
    for (a, b), c in nij.items():
        opp[a].append((b, c))
        opp[b].append((a, c))
    s = {i: S for i in items}
    k = len(items)
    for _ in range(iterations):
        d = {i: sum(c * S2 // (s[i] + s[j]) for j, c in opp[i]) for i in items}
        r = {i: (wins[i] * S2 // d[i]) if d[i] > 0 else 0 for i in items}
        t = sum(r.values())
        if t == 0:
            return {i: 0 for i in items}
        s = {
            i: max(r[i] * k * S // t, 1) if wins[i] > 0 else r[i] * k * S // t
            for i in items
        }
    return s


def test_bradley_terry_recovers_known_ordering(spark):
    from cerebro_spark.operators.profile import bradley_terry

    # A beats B 9/10, B beats C 9/10, A beats C 9/10 -> s_A > s_B > s_C
    ms = []
    for i in range(10):
        ms.append(("A", "B") if i < 9 else ("B", "A"))
        ms.append(("B", "C") if i < 9 else ("C", "B"))
        ms.append(("A", "C") if i < 9 else ("C", "A"))
    df = spark.createDataFrame(ms, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry(df).collect()}
    assert out["A"]["strength"] > out["B"]["strength"] > out["C"]["strength"]
    assert out["A"]["n_wins"] == 18 and out["A"]["n_matches"] == 20
    # strengths equal the integer-recurrence reference exactly
    ref = _bt_ref(ms)
    for i in ("A", "B", "C"):
        assert out[i]["strength"] == ref[i] / 10**12
    # shares sum to ~1
    assert sum(r["share"] for r in out.values()) == pytest.approx(1.0, abs=1e-9)


def test_bradley_terry_symmetric_matches_give_equal_strength(spark):
    from cerebro_spark.operators.profile import bradley_terry

    ms = [("A", "B"), ("B", "A"), ("A", "B"), ("B", "A")]
    df = spark.createDataFrame(ms, "winner string, loser string")
    out = {r["item"]: r["strength"] for r in bradley_terry(df).collect()}
    assert out["A"] == pytest.approx(out["B"])


def test_bradley_terry_zero_win_item_collapses(spark):
    from cerebro_spark.operators.profile import bradley_terry

    ms = [("A", "B"), ("A", "B"), ("A", "C"), ("C", "B")]
    df = spark.createDataFrame(ms, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry(df).collect()}
    assert out["B"]["n_wins"] == 0
    assert out["B"]["strength"] == pytest.approx(0.0)
    assert out["A"]["strength"] > out["C"]["strength"]


def test_bradley_terry_drops_self_matches_and_empty(spark):
    from cerebro_spark.operators.profile import bradley_terry

    df = spark.createDataFrame(
        [("A", "A"), ("A", "A")], "winner string, loser string"
    )
    assert bradley_terry(df).count() == 0


# ---------------------------------------------------------------------------
# count_min_sketch / cms_heavy_hitters
# ---------------------------------------------------------------------------

def test_cms_overestimates_never_under(spark):
    from cerebro_spark.operators.profile import cms_heavy_hitters

    # zipf-ish corpus: word i appears 60 - i times
    rows = [(f"w{i}",) for i in range(30) for _ in range(60 - i)]
    df = spark.createDataFrame(rows, "w string")
    out = cms_heavy_hitters(df, "w", depth=4, width=64, k=10).collect()
    assert len(out) == 10
    exact = {f"w{i}": 60 - i for i in range(30)}
    for r in out:
        assert r["exact_n"] == exact[r["key"]]
        assert r["cms_n"] >= r["exact_n"]          # one-sided guarantee
        assert r["overcount"] == r["cms_n"] - r["exact_n"]
    # top-10 by count, ordered desc
    assert [r["key"] for r in out] == [f"w{i}" for i in range(10)]


def test_cms_sketch_is_mergeable(spark):
    # sum of two halves' sketches == the whole corpus's sketch, cell-wise
    from cerebro_spark.operators.profile import count_min_sketch

    rows = [(i, f"k{i % 17}") for i in range(400)]
    df = spark.createDataFrame(rows, "i long, w string")
    a = df.filter(F.col("i") < 200)
    b = df.filter(F.col("i") >= 200)
    whole = {
        (r["row"], r["bucket"]): r["c"]
        for r in count_min_sketch(df, "w", 4, 64).collect()
    }
    merged = {}
    for half in (a, b):
        for r in count_min_sketch(half, "w", 4, 64).collect():
            merged[(r["row"], r["bucket"])] = (
                merged.get((r["row"], r["bucket"]), 0) + r["c"]
            )
    assert merged == whole


def test_cms_wide_sketch_is_exact_for_distinct_keys(spark):
    # 5 keys in a 1024-wide sketch: collisions essentially impossible,
    # estimates equal exact counts
    from cerebro_spark.operators.profile import cms_heavy_hitters

    rows = [(k,) for k in "abcde" for _ in range(7)]
    df = spark.createDataFrame(rows, "w string")
    out = cms_heavy_hitters(df, "w", depth=4, width=1024, k=5).collect()
    assert all(r["overcount"] == 0 and r["exact_n"] == 7 for r in out)


# ---------------------------------------------------------------------------
# readability_scores
# ---------------------------------------------------------------------------

def test_readability_hand_counts(spark):
    from cerebro_spark.operators.text import readability_scores

    docs = [
        ("g", "The cat sat. The dog ran!"),   # 6 words, 2 sentences
        ("g", "hello world"),                  # 2 words, clamps to 1 sentence
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    out = readability_scores(df, "text", "src").collect()[0]
    assert out["n_docs"] == 2 and out["words"] == 8 and out["sentences"] == 3
    # vowel groups: The(1) cat(1) sat(1) The(1) dog(1) ran(1) = 6;
    # hello(2: e, o) world(1: o) = 3 -> 9
    assert out["syllable_groups"] == 9
    w, s, y = 8.0, 3.0, 9.0
    expect = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    assert out["flesch"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_readability_monotone_in_syllables(spark):
    # denser syllables -> lower reading ease
    from cerebro_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [("simple", "a b c d e."), ("dense", "aeiou aeiou aeiou aeiou aeiou.")],
        "src string, text string",
    )
    out = {r["src"]: r["flesch"] for r in
           readability_scores(df, "text", "src").collect()}
    assert out["dense"] < out["simple"]


# ---------------------------------------------------------------------------
# t_closeness
# ---------------------------------------------------------------------------

def test_t_closeness_flags_leaky_class(spark):
    from cerebro_spark.operators.profile import t_closeness

    # class A values mirror the global spread; class B is pinned to the top
    rows = [("A", "x", v) for v in range(100)]
    rows += [("B", "x", 99)] * 50
    df = spark.createDataFrame(rows, "qa string, qb string, v long")
    out = {r["qi_class"]: r for r in
           t_closeness(df, ["qa", "qb"], "v", n_buckets=10, t=0.2).collect()}
    assert out["B|x"]["t_distance"] > out["A|x"]["t_distance"]
    assert out["B|x"]["is_violation"] and not out["A|x"]["is_violation"]
    # identical-to-global class has near-zero distance
    assert out["A|x"]["t_distance"] < 0.2


def test_t_closeness_identical_class_distance_zero(spark):
    from cerebro_spark.operators.profile import t_closeness

    rows = [("A", v) for v in range(50)] + [("B", v) for v in range(50)]
    df = spark.createDataFrame(rows, "q string, v long")
    out = t_closeness(df, ["q"], "v", n_buckets=10, t=0.1).collect()
    assert all(r["t_distance"] == pytest.approx(0.0) for r in out)


# ---------------------------------------------------------------------------
# fk_orphan_audit
# ---------------------------------------------------------------------------

def test_fk_orphan_audit_counts(spark):
    from cerebro_spark.operators.profile import fk_orphan_audit

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = fk_orphan_audit(
        [("child.fk->parent", child, "fk", parent, "pk")]
    ).collect()[0]
    assert out["edge"] == "child.fk->parent"
    assert out["child_rows"] == 5
    assert out["null_fk"] == 1       # NULL fk is not an orphan
    assert out["orphan_fk"] == 1     # 99 has no parent
    assert out["orphan_rate"] == pytest.approx(0.2)


def test_fk_orphan_audit_multiple_edges_union(spark):
    from cerebro_spark.operators.profile import fk_orphan_audit

    c1 = spark.createDataFrame([(1,), (2,)], "fk long")
    p1 = spark.createDataFrame([(1,), (2,)], "pk long")
    c2 = spark.createDataFrame([(7,)], "fk long")
    p2 = spark.createDataFrame([(8,)], "pk long")
    out = {r["edge"]: r for r in fk_orphan_audit([
        ("clean", c1, "fk", p1, "pk"),
        ("broken", c2, "fk", p2, "pk"),
    ]).collect()}
    assert out["clean"]["orphan_fk"] == 0
    assert out["broken"]["orphan_fk"] == 1
    assert out["broken"]["orphan_rate"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------

def test_hill_matches_python_reference(spark):
    from cerebro_spark.operators.profile import hill_tail_index

    # exact pareto(alpha=2) quantile sample: x_q = (1-q)^(-1/2)
    vals = [(1 - (i + 0.5) / 500) ** -0.5 for i in range(500)]
    rows = [("g", float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = hill_tail_index(df, "v", "g", "i", k=100).collect()[0]

    top = sorted(vals, reverse=True)[:101]
    q = [math.floor(math.log(x) * 1e6 + 0.5) for x in top]
    num = sum(q) - len(q) * min(q)
    expect = round((len(q) - 1) * 1e6 / num, 6)
    assert out["k_used"] == 100 and out["n"] == 500
    assert out["alpha"] == pytest.approx(expect, abs=1e-6)
    # the estimate should sit near the true tail index 2
    assert 1.5 < out["alpha"] < 2.5


def test_hill_small_and_degenerate_groups(spark):
    from cerebro_spark.operators.profile import hill_tail_index

    rows = [("tiny", 5.0, 1), ("tiny", 3.0, 2),          # m=2 -> NULL
            ("flat", 7.0, 1), ("flat", 7.0, 2), ("flat", 7.0, 3),  # num=0
            ("neg", -1.0, 1), ("neg", 2.0, 2), ("neg", 4.0, 3), ("neg", 8.0, 4)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = {r["g"]: r for r in hill_tail_index(df, "v", "g", "i", k=100).collect()}
    assert out["tiny"]["alpha"] is None
    assert out["flat"]["alpha"] is None
    # negative value excluded: n counts positives only
    assert out["neg"]["n"] == 3 and out["neg"]["alpha"] is not None


def test_hill_heavier_tail_gives_smaller_alpha(spark):
    from cerebro_spark.operators.profile import hill_tail_index

    light = [(1 - (i + 0.5) / 400) ** (-1 / 3.0) for i in range(400)]  # a=3
    heavy = [(1 - (i + 0.5) / 400) ** (-1 / 1.2) for i in range(400)]  # a=1.2
    rows = [("light", float(v), i) for i, v in enumerate(light)]
    rows += [("heavy", float(v), i) for i, v in enumerate(heavy)]
    df = spark.createDataFrame(rows, "g string, v double, i long")
    out = {r["g"]: r["alpha"] for r in
           hill_tail_index(df, "v", "g", "i", k=50).collect()}
    assert out["heavy"] < out["light"]


# ---------------------------------------------------------------------------
# streaming count-min sketch twin
# ---------------------------------------------------------------------------

def test_streaming_cms_equals_batch(spark):
    """The CMS operator is streaming-native: the same count_min_sketch
    call over an availableNow replay must equal the batch sketch
    cell-for-cell (bounded depth x width counter state)."""
    from cerebro_spark.operators.profile import count_min_sketch
    from cerebro_spark.queries.streaming_q import _run_available_now

    rows = [(f"k{i % 13}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "w string, ts long")
    batch = {
        (r["row"], r["bucket"]): r["c"]
        for r in count_min_sketch(df, "w", 4, 64).collect()
    }
    streamed = _run_available_now(
        df, lambda s: count_min_sketch(s, "w", 4, 64)
    )
    got = {
        (r["row"], r["bucket"]): r["c"] for r in streamed.collect()
    }
    assert got == batch


# ---------------------------------------------------------------------------
# local_clustering_coefficient
# ---------------------------------------------------------------------------

def test_lcc_hand_graph(spark):
    from cerebro_spark.operators.cluster import local_clustering_coefficient

    # triangle 1-2-3 plus a pendant 4 attached to 1
    edges = [(1, 2), (2, 3), (1, 3), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in
           local_clustering_coefficient(df).collect()}
    # node 1: deg 3, 1 triangle -> lcc = 2/(3*2) = 1/3
    assert out[1]["degree"] == 3 and out[1]["triangles"] == 1
    assert out[1]["lcc"] == pytest.approx(round(1 / 3, 6))
    # nodes 2,3: deg 2, 1 triangle -> lcc 1.0
    assert out[2]["lcc"] == pytest.approx(1.0)
    assert out[3]["lcc"] == pytest.approx(1.0)
    # pendant node 4: degree 1 -> NULL (no neighbor pair exists)
    assert out[4]["degree"] == 1 and out[4]["lcc"] is None


def test_lcc_hollow_star_is_zero(spark):
    from cerebro_spark.operators.cluster import local_clustering_coefficient

    edges = [(0, i) for i in range(1, 6)]  # star: hub 0, no triangles
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in
           local_clustering_coefficient(df).collect()}
    assert out[0]["degree"] == 5 and out[0]["triangles"] == 0
    assert out[0]["lcc"] == pytest.approx(0.0)   # hollow, measured not NULL


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def test_fertility_hand_counts(spark):
    from cerebro_spark.operators.text import tokenizer_fertility

    docs = [
        ("en", "hello world"),          # 2 words, 2 subword runs
        ("en", "don't stop"),           # 2 words, runs: don,',t,stop = 4
        ("zh", "a1b2"),                 # 1 word, runs: a,1,b,2 = 4
    ]
    df = spark.createDataFrame(docs, "lang string, text string")
    out = {r["lang"]: r for r in
           tokenizer_fertility(df, "text", "lang").collect()}
    assert out["en"]["ws_tokens"] == 4 and out["en"]["subwords"] == 6
    assert out["en"]["fertility"] == pytest.approx(1.5)
    assert out["zh"]["ws_tokens"] == 1 and out["zh"]["subwords"] == 4
    assert out["zh"]["fertility"] == pytest.approx(4.0)


# ---------------------------------------------------------------------------
# dispersion_index
# ---------------------------------------------------------------------------

def test_dispersion_poisson_vs_bursty(spark):
    from cerebro_spark.operators.profile import dispersion_index

    rows = []
    # 'steady': exactly 5 events every day for 20 days -> variance 0
    for d in range(20):
        rows += [("steady", float(d * 86400 + i)) for i in range(5)]
    # 'bursty': 100 events on one day, none on the other 19 observed days
    rows += [("bursty", 0.0)] * 100
    rows += [("bursty", float(19 * 86400))]  # pin the span to 20 days
    df = spark.createDataFrame(rows, "k string, t double")
    out = {r["k"]: r for r in dispersion_index(df, "t", "k").collect()}
    assert out["steady"]["n_buckets"] == 20
    assert out["steady"]["vmr"] == pytest.approx(0.0)
    assert out["steady"]["overdispersed"] is False
    assert out["bursty"]["n_buckets"] == 20
    assert out["bursty"]["vmr"] > 10 and out["bursty"]["overdispersed"]
    # exact integers: m=20, S=101, SS=100^2+1
    m, s, ss = 20, 101, 100 * 100 + 1
    assert out["bursty"]["vmr"] == pytest.approx(
        round((m * ss - s * s) / ((m - 1) * s), 6)
    )


def test_dispersion_counts_silent_days_as_zero(spark):
    from cerebro_spark.operators.profile import dispersion_index

    # events on day 0 and day 9 only: 10 dense buckets, 8 of them zero
    rows = [("k", 0.0), ("k", 10.0), ("k", float(9 * 86400))]
    df = spark.createDataFrame(rows, "k string, t double")
    out = dispersion_index(df, "t", "k").collect()[0]
    assert out["n_buckets"] == 10 and out["total"] == 3


# ---------------------------------------------------------------------------
# mcnemar_test
# ---------------------------------------------------------------------------

def test_mcnemar_hand_cells(spark):
    from cerebro_spark.operators.profile import mcnemar_test

    # 4 both-right, 6 only-A, 2 only-B, 3 neither
    rows = ([(True, True)] * 4 + [(True, False)] * 6
            + [(False, True)] * 2 + [(False, False)] * 3)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    out = mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]
    assert (out["n"], out["n_both"], out["only_a"], out["only_b"],
            out["n_neither"]) == (15, 4, 6, 2, 3)
    assert out["chi2"] == pytest.approx(round((6 - 2) ** 2 / 8, 6))


def test_mcnemar_no_disagreement_is_null(spark):
    from cerebro_spark.operators.profile import mcnemar_test

    rows = [(True, True)] * 5 + [(False, False)] * 5
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    assert mcnemar_test(df, F.col("a"), F.col("b")).collect()[0]["chi2"] is None


# ---------------------------------------------------------------------------
# eb_shrunk_means
# ---------------------------------------------------------------------------

def test_eb_shrinks_small_groups_harder(spark):
    from cerebro_spark.operators.profile import eb_shrunk_means

    rows = []
    # 20 groups with 50 obs each around mean g (real between-group spread)
    for g in range(20):
        for i in range(50):
            rows.append((f"g{g}", float(g) + (i % 5 - 2) * 0.1))
    # one tiny outlier group: 2 obs at 100 — must shrink hard toward grand
    rows += [("tiny", 100.0), ("tiny", 100.2)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in eb_shrunk_means(df, "v", "g").collect()}
    grand = sum(v for _, v in rows) / len(rows)
    tiny = out["tiny"]
    assert tiny["mean"] == pytest.approx(100.1)
    # shrunk strictly toward grand, and NOT all the way
    assert grand < tiny["shrunk"] < tiny["mean"]
    # a big group barely moves
    big = out["g10"]
    assert abs(big["shrunk"] - big["mean"]) < abs(
        tiny["shrunk"] - tiny["mean"]
    )
    # every shrunk value sits between its mean and the grand mean
    for r in out.values():
        lo, hi = sorted((r["mean"], grand))
        assert lo - 1e-6 <= r["shrunk"] <= hi + 1e-6


def test_eb_degenerate_single_group_null(spark):
    from cerebro_spark.operators.profile import eb_shrunk_means

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0)], "g string, v double"
    )
    out = eb_shrunk_means(df, "v", "g").collect()[0]
    assert out["mean"] == pytest.approx(2.0) and out["shrunk"] is None


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

def test_modularity_two_cliques(spark):
    from cerebro_spark.operators.cluster import modularity

    # two 4-cliques joined by one bridge edge; the clique partition is
    # strongly modular, the random split is not
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 10))  # bridge
    e = spark.createDataFrame(edges, "src long, dst long")
    good = spark.createDataFrame(
        [(i, "a") for i in range(4)] + [(10 + i, "b") for i in range(4)],
        "node long, part string",
    )
    out = modularity(e, good).collect()[0]
    assert out["n_edges"] == 13 and out["n_parts"] == 2
    # exact: m=13, intra=12, deg_a=13, deg_b=13 -> (4*13*12 - 338)/(4*169)
    assert out["modularity"] == pytest.approx(
        round((4 * 13 * 12 - 2 * 13 * 13) / (4 * 13 * 13), 6)
    )
    # one community holding everything: Q = intra/m - 1 = 0 exactly
    allone = spark.createDataFrame(
        [(n, "x") for n in range(4)] + [(10 + n, "x") for n in range(4)],
        "node long, part string",
    )
    assert modularity(e, allone).collect()[0]["modularity"] == pytest.approx(0.0)


def test_modularity_unassigned_nodes_penalize(spark):
    from cerebro_spark.operators.cluster import modularity

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    part = spark.createDataFrame([(1, "a"), (2, "a")], "node long, part string")
    out = modularity(e, part).collect()[0]
    # node 3 unassigned -> singleton community; n_parts counts it
    assert out["n_parts"] == 2 and out["n_nodes"] == 3
    # intra = 1 (edge 1-2); deg: a holds deg 1+2=3, solo_3 holds 1
    assert out["modularity"] == pytest.approx(
        round((4 * 2 * 1 - (9 + 1)) / (4 * 4), 6)
    )


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------

def test_assortativity_star_is_negative_path_mixed(spark):
    from cerebro_spark.operators.cluster import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = degree_assortativity(star).collect()[0]
    assert out["n_edges"] == 5
    assert out["assortativity"] == pytest.approx(-1.0)  # perfect hub-spoke

    # 4-cycle: every node degree 2 -> zero variance -> NULL
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


def test_assortativity_matches_python_reference(spark):
    from cerebro_spark.operators.cluster import degree_assortativity

    edges = [(i, (i * 7 + 3) % 23) for i in range(40) if i != (i * 7 + 3) % 23]
    und = {tuple(sorted(p)) for p in edges}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    m2 = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = round((m2 * sxy - sx * sx) / (m2 * sxx - sx * sx), 6)
    df = spark.createDataFrame(list(und), "src long, dst long")
    out = degree_assortativity(df).collect()[0]
    assert out["assortativity"] == pytest.approx(want, abs=1e-6)


# ---------------------------------------------------------------------------
# transition_entropy
# ---------------------------------------------------------------------------

def test_transition_entropy_deterministic_is_zero(spark):
    from cerebro_spark.operators.profile import transition_entropy

    # every user: a -> b -> a -> b ... fully deterministic transitions
    rows = []
    for u in range(5):
        for i in range(10):
            rows.append((u, i, "a" if i % 2 == 0 else "b", i))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long"
    )
    out = transition_entropy(df).collect()[0]
    assert out["n_transitions"] == 45
    assert out["cond_entropy_nats"] == pytest.approx(0.0)


def test_transition_entropy_uniform_is_ln_k(spark):
    import math

    from cerebro_spark.operators.profile import transition_entropy

    # from every prev, next is uniform over 3 states (counts engineered)
    rows, i = [], 0
    seq = []
    for a in "abc":
        for b in "abc":
            seq += [a, b]
    # build one long alternating walk hitting each (prev,next) equally:
    # simpler: per user one transition each, 9 users per (prev,next) pair
    rows = []
    uid = 0
    for a in "abc":
        for b in "abc":
            for _ in range(4):
                rows.append((uid, 0, a, 0))
                rows.append((uid, 1, b, 1))
                uid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string, event_id long"
    )
    out = transition_entropy(df).collect()[0]
    assert out["n_transitions"] == 36 and out["n_states"] == 3
    assert out["cond_entropy_nats"] == pytest.approx(math.log(3), abs=1e-5)


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------

def test_spearman_monotone_curve_is_one(spark):
    from cerebro_spark.operators.profile import spearman_corr

    # y = x^3: monotone but nonlinear -> spearman 1.0 exactly
    rows = [(float(x), float(x) ** 3) for x in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = spearman_corr(df, "x", "y").collect()[0]
    assert out["n"] == 29 and out["spearman"] == pytest.approx(1.0)
    # reversed -> -1
    df2 = spark.createDataFrame(
        [(float(x), -float(x) ** 3) for x in range(1, 30)], "x double, y double"
    )
    assert spearman_corr(df2, "x", "y").collect()[0][
        "spearman"
    ] == pytest.approx(-1.0)


def test_spearman_matches_scipy_style_reference(spark):
    from cerebro_spark.operators.profile import spearman_corr

    xs = [((i * 37) % 101) / 7.0 for i in range(60)]
    ys = [((i * 59) % 97) / 3.0 for i in range(60)]

    def midranks(vals, quant=100):
        q = [math.floor(v * quant + 0.5) for v in vals]
        out = []
        for v in q:
            less = sum(1 for o in q if o < v)
            eq = sum(1 for o in q if o == v)
            out.append(less + (eq + 1) / 2)
        return out

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = spark_r = spearman_corr(df, "x", "y").collect()[0]
    assert out["spearman"] == pytest.approx(round(want, 6), abs=1e-5)


def test_spearman_constant_column_is_null(spark):
    from cerebro_spark.operators.profile import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    )
    assert spearman_corr(df, "x", "y").collect()[0]["spearman"] is None


# ---------------------------------------------------------------------------
# ips_uniform_value
# ---------------------------------------------------------------------------

def test_ips_uniform_is_balanced_mean(spark):
    from cerebro_spark.operators.profile import ips_uniform_value

    # action A logged 90x at reward 1, action B logged 10x at reward 9:
    # logged mean = (90 + 90)/100 = 1.8; uniform value = (1+9)/2 = 5
    rows = [("A", 1.0)] * 90 + [("B", 9.0)] * 10
    df = spark.createDataFrame(rows, "a string, r double")
    out = ips_uniform_value(df, "a", "r").collect()[0]
    assert out["n"] == 100 and out["k_actions"] == 2
    assert out["logged_mean"] == pytest.approx(1.8)
    assert out["ips_uniform"] == pytest.approx(5.0, abs=1e-5)
    # ESS = k^2 / (1/90 + 1/10) = 4 / (1/90 + 1/10) = 36
    assert out["ess"] == pytest.approx(36.0, abs=1e-3)


def test_ips_balanced_log_equals_logged_mean(spark):
    from cerebro_spark.operators.profile import ips_uniform_value

    rows = [("A", 2.0)] * 50 + [("B", 4.0)] * 50
    df = spark.createDataFrame(rows, "a string, r double")
    out = ips_uniform_value(df, "a", "r").collect()[0]
    assert out["ips_uniform"] == pytest.approx(out["logged_mean"], abs=1e-5)


# ---------------------------------------------------------------------------
# quantile_treatment_effect
# ---------------------------------------------------------------------------

def test_qte_hand_distributions(spark):
    from cerebro_spark.operators.profile import quantile_treatment_effect

    # control: 1..100; treatment: control + 10 everywhere -> QTE = 10 at
    # every p (pure location shift)
    rows = [(0, float(v)) for v in range(1, 101)]
    rows += [(1, float(v) + 10) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {r["p"]: r for r in
           quantile_treatment_effect(df, "v", F.col("t") == 1).collect()}
    assert set(out) == {0.25, 0.5, 0.75, 0.9}
    for p, r in out.items():
        assert r["qte"] == pytest.approx(10.0)
        # type-1 quantile: q_p = ceil(p*100)th smallest = ceil(100p)
        assert r["q_control"] == pytest.approx(math.ceil(p * 100))
    assert out[0.5]["n_control"] == 100 and out[0.5]["n_treat"] == 100


def test_qte_tail_only_effect(spark):
    from cerebro_spark.operators.profile import quantile_treatment_effect

    # treatment equals control except the top QUARTILE doubles: median
    # QTE 0, p90 QTE large (the mean difference would smear both)
    ctrl = [float(v) for v in range(1, 101)]
    treat = [v if v <= 75 else v * 2 for v in ctrl]
    rows = [(0, v) for v in ctrl] + [(1, v) for v in treat]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {r["p"]: r["qte"] for r in
           quantile_treatment_effect(df, "v", F.col("t") == 1).collect()}
    assert out[0.5] == pytest.approx(0.0)
    # q90(ctrl) = 90; q90(treat) = 15th doubled value = 2*(75+15) = 180
    assert out[0.9] == pytest.approx(90.0)


# ---------------------------------------------------------------------------
# paired_t_prepost
# ---------------------------------------------------------------------------

def test_paired_t_matches_python_reference(spark):
    from cerebro_spark.operators.profile import paired_t_prepost

    rows = []
    diffs = []
    for u in range(12):
        pre = [10.0 + u + (i % 3) for i in range(4)]
        post = [12.0 + u + (u % 5) * 0.7 + (i % 2) * 0.5 for i in range(3)]
        for v in pre:
            rows.append((u, 0, v))
        for v in post:
            rows.append((u, 1, v))
        dq = math.floor(
            (sum(round(v * 1e6) for v in post) / 3
             - sum(round(v * 1e6) for v in pre) / 4) + 0.5
        )
        diffs.append(dq)
    df = spark.createDataFrame(rows, "u long, p int, v double")
    out = paired_t_prepost(df, "v", "u", F.col("p") == 1).collect()[0]
    n = len(diffs)
    sd_, sdd = sum(diffs), sum(d * d for d in diffs)
    mean_d = sd_ / n / 1e6
    se = math.sqrt((n * sdd - sd_ * sd_) / (n * (n - 1))) / 1e6 / math.sqrt(n)
    assert out["n_units"] == 12
    assert out["mean_diff"] == pytest.approx(round(mean_d, 6), abs=1e-6)
    assert out["t"] == pytest.approx(round(mean_d / se, 6), abs=1e-4)


def test_paired_t_drops_unpaired_units(spark):
    from cerebro_spark.operators.profile import paired_t_prepost

    rows = [(1, 0, 5.0), (1, 1, 7.0),
            (2, 0, 4.0),              # pre only -> dropped
            (3, 1, 9.0)]              # post only -> dropped
    df = spark.createDataFrame(rows, "u long, p int, v double")
    out = paired_t_prepost(df, "v", "u", F.col("p") == 1).collect()[0]
    assert out["n_units"] == 1
    assert out["mean_diff"] == pytest.approx(2.0)
    assert out["t"] is None  # n < 2


def test_paired_t_zero_variance_null_t(spark):
    from cerebro_spark.operators.profile import paired_t_prepost

    rows = []
    for u in range(5):
        rows += [(u, 0, 10.0), (u, 1, 13.0)]  # identical +3 diff everywhere
    df = spark.createDataFrame(rows, "u long, p int, v double")
    out = paired_t_prepost(df, "v", "u", F.col("p") == 1).collect()[0]
    assert out["mean_diff"] == pytest.approx(3.0) and out["t"] is None
