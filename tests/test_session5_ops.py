"""Round-6 session-5 operator batch: mutual information, exact audience
overlap, Bloom-filter semi-join pruning, SAX motif discovery, generalized-ESD
anomalies, Markov removal-effect attribution.

Cross-engine value checks live in the oracle gates (``mi_event_hour`` etc.);
these tests pin SEMANTICS on hand-built inputs where the right answer is
computable by hand or a tiny pure-Python reference.
"""

import math

import pytest
from pyspark.sql import functions as F

from cerebro_spark.operators.profile import mutual_info


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------

def test_mutual_info_independent_is_zero(spark):
    # product distribution: every (a, b) cell = ra*cb/n exactly -> MI = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(4)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_info(df, "a", "b").collect()[0]
    assert out["n"] == 16
    assert out["mi_nats"] == 0.0
    assert out["nmi"] == 0.0
    assert abs(out["h_a"] - math.log(2)) < 1e-5


def test_mutual_info_perfect_dependence(spark):
    # a determines b (and vice versa) -> MI = H(A) = H(B), NMI = 1
    rows = [("x", "u")] * 5 + [("y", "v")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_info(df, "a", "b").collect()[0]
    assert abs(out["mi_nats"] - math.log(2)) < 1e-5
    assert abs(out["nmi"] - 1.0) < 1e-5


def test_mutual_info_textbook_value(spark):
    # hand-computed asymmetric 2x2: cells (3,1),(1,3); n=8
    rows = (
        [("x", "u")] * 3 + [("x", "v")] * 1 + [("y", "u")] * 1 + [("y", "v")] * 3
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_info(df, "a", "b").collect()[0]
    expect = sum(
        (o / 8.0) * math.log((o * 8.0) / (4.0 * 4.0)) for o in (3, 1, 1, 3)
    )
    assert abs(out["mi_nats"] - expect) < 1e-5
    assert out["nmi"] is not None and 0.0 < out["nmi"] < 1.0


def test_mutual_info_null_rows_excluded(spark):
    rows = [("x", "u"), ("y", None), (None, "v"), ("x", "u")]
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_info(df, "a", "b").collect()[0]
    assert out["n"] == 2  # complete cases only


# ---------------------------------------------------------------------------
# audience overlap
# ---------------------------------------------------------------------------

def test_audience_overlap_hand_computed(spark):
    from cerebro_spark.operators.profile import audience_overlap

    # users 1,2 in both A and B; user 3 only A; user 4 only C; user 2 dup rows
    rows = [
        (1, "A"), (1, "B"), (2, "A"), (2, "B"), (2, "B"),
        (3, "A"), (4, "C"), (1, "C"),
    ]
    df = spark.createDataFrame(rows, "u long, c string")
    out = {
        (r["cat_a"], r["cat_b"]): r
        for r in audience_overlap(df, "u", "c").collect()
    }
    ab = out[("A", "B")]
    assert ab["overlap"] == 2 and ab["keys_a"] == 3 and ab["keys_b"] == 2
    assert abs(ab["jaccard"] - 2.0 / 3.0) < 1e-12
    ac = out[("A", "C")]
    assert ac["overlap"] == 1 and ac["keys_b"] == 2
    assert ("B", "C") in out and out[("B", "C")]["overlap"] == 1
    # ordered pairs only, no self-pairs
    assert all(a < b for a, b in out)


def test_audience_overlap_disjoint_absent(spark):
    from cerebro_spark.operators.profile import audience_overlap

    df = spark.createDataFrame([(1, "A"), (2, "B")], "u long, c string")
    assert audience_overlap(df, "u", "c").count() == 0


def test_audience_overlap_null_keys_excluded(spark):
    from cerebro_spark.operators.profile import audience_overlap

    df = spark.createDataFrame(
        [(None, "A"), (None, "B"), (1, "A"), (1, "B")], "u long, c string"
    )
    out = audience_overlap(df, "u", "c").collect()
    assert len(out) == 1 and out[0]["overlap"] == 1


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

def _bloom_ref_words(keys, num_words=1024, num_hashes=3):
    """Pure-Python twin of joins.bloom_build's md5-slice scheme."""
    import hashlib

    words = [0] * num_words
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        for i in range(num_hashes):
            p = int(h[8 * i : 8 * i + 8], 16) % (num_words * 62)
            words[p // 62] |= 1 << (p % 62)
    return words


def test_bloom_build_matches_python_reference(spark):
    from cerebro_spark.operators.joins import bloom_build, bloom_words_literal

    keys = list(range(50))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    words = bloom_words_literal(bloom_build(df, "k", 1024, 3), 1024)
    assert words == _bloom_ref_words(keys)


def test_bloom_probe_no_false_negatives(spark):
    from cerebro_spark.operators.joins import (
        bloom_build, bloom_probe, bloom_words_literal,
    )

    df = spark.createDataFrame([(k,) for k in range(1000)], "k long")
    words = bloom_words_literal(bloom_build(df, "k"), 1024)
    out = bloom_probe(df, "k", words).filter("NOT bloom_pass").count()
    assert out == 0  # every inserted key must pass — the Bloom guarantee


def test_bloom_probe_prunes_absent_keys(spark):
    from cerebro_spark.operators.joins import (
        bloom_build, bloom_probe, bloom_words_literal,
    )

    build = spark.createDataFrame([(k,) for k in range(1000)], "k long")
    probe = spark.createDataFrame(
        [(k,) for k in range(1_000_000, 1_002_000)], "k long"
    )
    words = bloom_words_literal(bloom_build(build, "k"), 1024)
    fp = bloom_probe(probe, "k", words).filter("bloom_pass").count()
    # theoretical fp ~ (1 - e^(-3*1000/63488))^3 ~ 1e-4; allow 1%
    assert fp <= 20


def test_bloom_num_hashes_over_four_rejected(spark):
    # 5 hashes would slice past the 32-char md5 digest: conv('') -> NULL
    # positions -> a NULL AND chain -> silent FALSE NEGATIVES.  All three
    # entry points must reject loudly instead (ADVICE r6).
    from cerebro_spark.operators.joins import (
        bloom_build, bloom_probe, bloom_probe_join, bloom_words_literal,
    )

    df = spark.createDataFrame([(k,) for k in range(10)], "k long")
    for bad in (0, 5):
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_build(df, "k", num_hashes=bad)
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_probe(df, "k", [0] * 64, num_hashes=bad)
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_probe_join(df, "k", df, 64, num_hashes=bad)
    # k=4 is the max: uses hex chars 1..32 exactly, still no false negatives
    words = bloom_words_literal(bloom_build(df, "k", 1024, 4), 1024)
    assert bloom_probe(df, "k", words, num_hashes=4).filter(
        "NOT bloom_pass"
    ).count() == 0


def test_bloom_probe_null_key_fails_closed(spark):
    from cerebro_spark.operators.joins import (
        bloom_build, bloom_probe, bloom_words_literal,
    )

    build = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    words = bloom_words_literal(bloom_build(build, "k"), 1024)
    rows = {r["k"]: r["bloom_pass"] for r in bloom_probe(probe, "k", words).collect()}
    assert rows[1] is True and rows[None] is False


# ---------------------------------------------------------------------------
# SAX motifs
# ---------------------------------------------------------------------------

def test_sax_motifs_planted_sawtooth(spark):
    from datetime import datetime, timedelta

    from cerebro_spark.operators.tsdb import sax_motifs

    # 40 hourly points cycling 10,20,30,40 -> ntile(4) bands are exactly
    # the 4 levels -> the dominant 4-word is "1234" (and rotations)
    t0 = datetime(2024, 1, 1)
    rows = [
        ("k", t0 + timedelta(hours=i), float(10 * (i % 4 + 1)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = sax_motifs(df, "ts", "value", ["key"], word_len=4, alphabet=4, top=1)
    top = out.collect()[0]
    assert top["motif"] == "1234" and top["rank"] == 1
    # 10 full cycles: positions 0,4,8,... start "1234" -> 10 occurrences
    assert top["n_occurrences"] == 10


def test_sax_motifs_word_count_arithmetic(spark):
    from datetime import datetime, timedelta

    from cerebro_spark.operators.tsdb import sax_motifs

    t0 = datetime(2024, 1, 1)
    rows = [("k", t0 + timedelta(hours=i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = sax_motifs(df, "ts", "value", ["key"], word_len=3, alphabet=2, top=99)
    # 10 buckets -> 8 complete 3-words total
    assert sum(r["n_occurrences"] for r in out.collect()) == 8


def test_sax_motifs_multi_key_isolation(spark):
    from datetime import datetime, timedelta

    from cerebro_spark.operators.tsdb import sax_motifs

    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(hours=i), float(i % 2)) for i in range(8)]
    rows += [("b", t0 + timedelta(hours=i), float(-(i % 2))) for i in range(8)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = sax_motifs(df, "ts", "value", ["key"], word_len=2, alphabet=2, top=1)
    got = {r["key"]: r["motif"] for r in out.collect()}
    # key a starts low (0,1,0,1,...): 4 of 7 words are "12"; key b starts
    # HIGH (0,-1,0,-1 — zero is its top band): 4 of 7 words are "21".
    # Keys symbolize independently — the mirror flips the dominant word.
    assert got["a"] == "12" and got["b"] == "21"


# ---------------------------------------------------------------------------
# generalized ESD
# ---------------------------------------------------------------------------

def _esd_ref(values, k=3):
    """Textbook sequential Rosner ESD on e3-quantized values."""
    import statistics

    qs = [round(v * 1000) for v in values]
    out = []
    for r in range(1, k + 1):
        if len(qs) < 3:
            break
        m = sum(qs) / len(qs)
        sd = statistics.stdev(qs)
        if sd == 0:
            break
        x = max(qs, key=lambda q: abs(q - m))
        # operator tie rule: equal deviation picks the high side
        hi, lo = max(qs), min(qs)
        x = hi if (hi - m) >= (m - lo) else lo
        out.append((r, x / 1000.0, round(abs(x - m) / sd, 6), len(qs)))
        qs.remove(x)
    return out


def test_esd_outliers_matches_textbook(spark):
    from cerebro_spark.operators.tsdb import esd_outliers

    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 100.0, -80.0, 10.3, 50.0]
    df = spark.createDataFrame([("k", v) for v in vals], "key string, value double")
    got = sorted(
        (r["round"], r["value"], r["r_stat"], r["n_before"])
        for r in esd_outliers(df, "value", ["key"], k=3).collect()
    )
    assert got == _esd_ref(vals)
    # the three planted extremes go, most-deviant first (-80 deviates
    # more from the ~14 mean than 100 does)
    assert [g[1] for g in got] == [-80.0, 100.0, 50.0]


def test_esd_outliers_constant_series_emits_nothing(spark):
    from cerebro_spark.operators.tsdb import esd_outliers

    df = spark.createDataFrame([("k", 5.0)] * 10, "key string, value double")
    assert esd_outliers(df, "value", ["key"], k=3).count() == 0


def test_esd_outliers_tiny_series_emits_nothing(spark):
    from cerebro_spark.operators.tsdb import esd_outliers

    df = spark.createDataFrame(
        [("k", 1.0), ("k", 99.0)], "key string, value double"
    )
    assert esd_outliers(df, "value", ["key"], k=3).count() == 0


def test_esd_outliers_alternating_sides(spark):
    from cerebro_spark.operators.tsdb import esd_outliers

    vals = [0.0] * 20 + [90.0, -100.0, 80.0]
    df = spark.createDataFrame([("k", v) for v in vals], "key string, value double")
    got = [
        r["value"]
        for r in esd_outliers(df, "value", ["key"], k=3)
        .orderBy("round").collect()
    ]
    assert got == [-100.0, 90.0, 80.0]


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

def _mk_events(spark, journeys):
    """journeys: list of event-type sequences, one per user."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, seq in enumerate(journeys):
        for j, ty in enumerate(seq):
            rows.append((eid, u, t0 + timedelta(minutes=j), ty))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_markov_transitions_truncate_and_terminal(spark):
    from cerebro_spark.operators.profile import markov_transitions

    df = _mk_events(spark, [
        ["click", "purchase", "view"],   # post-conversion view dropped
        ["view"],                        # no conversion -> view->null
    ])
    got = {
        (r["src"], r["dst"]): r["c"]
        for r in markov_transitions(df).collect()
    }
    assert got == {
        ("start", "click"): 1,
        ("click", "conv"): 1,
        ("start", "view"): 1,
        ("view", "null"): 1,
    }


def test_markov_attribution_single_channel_carries_all(spark):
    from cerebro_spark.operators.profile import markov_attribution

    # every conversion flows through click; removing click zeroes p_conv
    df = _mk_events(spark, [["click", "purchase"]] * 3 + [["view"]] * 2)
    out = {r["channel"]: r for r in markov_attribution(df).collect()}
    assert abs(out["click"]["p_conv"] - 0.6) < 1e-9   # 3 of 5 journeys
    assert out["click"]["p_conv_removed"] == 0.0
    assert abs(out["click"]["attribution_share"] - 1.0) < 1e-9
    assert out["view"]["removal_effect"] == 0.0


def test_markov_attribution_matches_linear_solve(spark):
    import numpy as np

    from cerebro_spark.operators.profile import markov_attribution

    # mixed journeys: compare the K=25 fixed-point against the exact
    # linear-system absorption probability a = (I - Q)^-1 r
    journeys = (
        [["click", "view", "purchase"]] * 4
        + [["view", "click"]] * 3
        + [["click", "purchase"]] * 2
        + [["view"]] * 1
    )
    df = _mk_events(spark, journeys)
    out = {r["channel"]: r for r in markov_attribution(df).collect()}

    # exact solve on the full chain: states [start, click, view]
    # transition counts from the journeys above:
    # start: click 6, view 4 / click: view 4, purchase 2, null 3
    # view: purchase 4, click 3, null 1
    Q = np.array([
        [0, 6 / 10, 4 / 10],      # start
        [0, 0, 4 / 9],            # click
        [0, 3 / 8, 0],            # view
    ])
    r = np.array([0, 2 / 9, 4 / 8])
    a = np.linalg.solve(np.eye(3) - Q, r)
    assert abs(out["click"]["p_conv"] - a[0]) < 1e-6


def test_markov_attribution_no_conversions(spark):
    from cerebro_spark.operators.profile import markov_attribution

    df = _mk_events(spark, [["click", "view"], ["view"]])
    out = markov_attribution(df).collect()
    assert all(r["p_conv"] == 0.0 for r in out)
    assert all(r["attribution_share"] is None for r in out)
