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
