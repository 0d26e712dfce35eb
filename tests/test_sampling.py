"""Edge cases for the pipeline utilities (oracle queries cover the bulk)."""

from pyspark.sql import Row

from cerebro_spark.operators.sampling import (
    chunk_documents,
    deterministic_sample,
    redact_pii,
    train_val_test_split,
)


def test_chunking_edges(spark):
    rows = [
        Row(doc_id=1, text="one two"),                       # shorter than chunk
        Row(doc_id=2, text=" ".join(f"t{i}" for i in range(32))),   # exactly one
        Row(doc_id=3, text=" ".join(f"t{i}" for i in range(33))),   # one + tail
    ]
    out = chunk_documents(spark.createDataFrame(rows), chunk_tokens=32, overlap=8)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "one two"
    assert len(by_doc[2]) == 1
    chunks3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert len(chunks3) == 2
    # overlap: chunk 1 starts at token 24, so tokens 24-31 appear in both
    assert chunks3[1]["chunk_text"].startswith("t24")


def test_split_stability_and_disjointness(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = train_val_test_split(df, "k").groupBy("split").count().collect()
    b = train_val_test_split(df, "k").groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # sample ⊂ split-train consistency: same hash → same bucket
    s20 = deterministic_sample(df, 20, "k").count()
    assert 120 < s20 < 280  # ~20% of 1000, hash-uniform


def test_redact_pii_patterns(spark):
    rows = [
        Row(doc_id=1, text="mail me at a.b+c@x-mail.co.uk today"),
        Row(doc_id=2, text="ssn 123-45-6789 and phone 555.123.4567"),
        Row(doc_id=3, text="card 4111 1111 1111 1111 thanks"),
        Row(doc_id=4, text="clean text"),
    ]
    out = {r["doc_id"]: r["text"] for r in redact_pii(spark.createDataFrame(rows)).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert "<SSN>" in out[2] and "<PHONE>" in out[2]
    assert "<CARD>" in out[3] and "4111" not in out[3]
    assert out[4] == "clean text"


def test_stratified_sample_fractions(spark, sf_dir):
    from cerebro_spark.io import load_table
    from cerebro_spark.operators.sampling import stratified_sample

    ev = load_table(spark, "events", sf_dir)
    out = stratified_sample(
        ev, "event_type", {"view": 10, "click": 50}, key_col="event_id"
    )
    base = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    kept = {r["event_type"]: r["count"] for r in out.groupBy("event_type").count().collect()}
    # hash fractions are approximate at small n — generous bands
    assert kept["view"] / base["view"] < 0.25
    assert 0.3 < kept["click"] / base["click"] < 0.7
    assert kept["purchase"] == base["purchase"]  # default 100%
    # determinism: second run keeps the identical row set
    out2 = stratified_sample(
        ev, "event_type", {"view": 10, "click": 50}, key_col="event_id"
    )
    assert out.select("event_id").exceptAll(out2.select("event_id")).count() == 0


def test_quantize_embeddings_reconstruction(spark, sf_dir):
    from pyspark.sql import functions as F

    from cerebro_spark.io import load_table
    from cerebro_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, "embeddings", sf_dir)
    q = quantize_embeddings(emb)
    joined = q.join(emb, "vec_id").select(
        F.aggregate(
            F.zip_with(
                F.split("q", ",").cast("array<int>"),
                "embedding",
                lambda qi, v: F.abs(qi * F.col("scale") - v),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        F.col("scale"),
    )
    # |v - q*scale| <= scale/2 by construction, plus up to 127*5e-7 from the
    # 6-digit rounding of the emitted scale (~2% of scale)
    bad = joined.filter(F.col("max_err") > F.col("scale") * 0.55).count()
    assert bad == 0


def test_mixture_sample_hits_target_proportions(spark, sf_dir):
    from pyspark.sql import functions as F

    from cerebro_spark.io import load_table
    from cerebro_spark.operators.sampling import mixture_sample

    docs = load_table(spark, "documents", sf_dir)
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = mixture_sample(docs, weights, domain_col="source", key_col="doc_id")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # only the weighted domains survive
    assert set(counts) <= set(weights)
    total = sum(counts.values())
    # sf0.01: 25 docs per source -> S = 50, so composition should track the
    # target up to hash-bucket granularity (~buckets are coarse at n=25)
    for dom, w in weights.items():
        assert abs(counts.get(dom, 0) / total - w) < 0.15
    # deterministic under re-evaluation
    again = mixture_sample(docs, weights, domain_col="source", key_col="doc_id")
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_pack_tokens_concat_semantics(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.sampling import pack_tokens

    rows = [
        Row(doc_id=i, source="a", text=" ".join(["w"] * n))
        for i, n in enumerate([10, 10, 10, 10])  # 40 tokens, budget 16
    ] + [Row(doc_id=0, source="b", text=" ".join(["w"] * 5))]
    out = pack_tokens(
        spark.createDataFrame(rows), budget=16,
        partition_col="source", order_col="doc_id",
    )
    a = {r["doc_id"]: r for r in out.filter("source = 'a'").collect()}
    # cumulative starts: 0, 10, 20, 30 -> batches 0, 0, 1, 1
    assert [a[i]["batch_id"] for i in range(4)] == [0, 0, 1, 1]
    assert [a[i]["batch_offset"] for i in range(4)] == [0, 10, 4, 14]
    b = out.filter("source = 'b'").collect()[0]
    assert b["batch_id"] == 0 and b["batch_offset"] == 0


def test_epoch_shuffle_reshuffles_between_epochs(spark):
    from cerebro_spark.operators.sampling import epoch_shuffle

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    e0 = epoch_shuffle(docs, epoch=0, num_shards=4)
    e0b = epoch_shuffle(docs, epoch=0, num_shards=4)
    e1 = epoch_shuffle(docs, epoch=1, num_shards=4)
    k0 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in e0.collect()}
    k0b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in e0b.collect()}
    k1 = {(r["doc_id"]): (r["shard"], r["pos"]) for r in e1.collect()}
    assert k0 == k0b                      # same epoch → identical order
    assert k0 != k1                       # new epoch → reshuffled
    # (shard, pos) is a bijection onto contiguous per-shard positions
    for k in (k0, k1):
        by_shard: dict[int, list[int]] = {}
        for shard, pos in k.values():
            by_shard.setdefault(shard, []).append(pos)
        assert sum(len(v) for v in by_shard.values()) == 200
        for v in by_shard.values():
            assert sorted(v) == list(range(len(v)))


def test_cap_per_key(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.sampling import cap_per_key

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(30)]
    out = cap_per_key(spark.createDataFrame(rows), "source", k=4)
    got = out.collect()
    # every key capped at exactly k (each key has 10 candidates)
    per_key = {}
    for r in got:
        per_key.setdefault(r["source"], []).append(r)
    assert set(per_key) == {"s0", "s1", "s2"}
    assert all(len(v) == 4 for v in per_key.values())
    # ranks are 1..k and the kept set is hash-determined, not input-order
    for v in per_key.values():
        assert sorted(r["key_rank"] for r in v) == [1, 2, 3, 4]
    again = {r["doc_id"] for r in
             cap_per_key(spark.createDataFrame(rows[::-1]), "source", 4).collect()}
    assert again == {r["doc_id"] for r in got}
    # keys with fewer than k rows keep everything
    small = spark.createDataFrame([Row(doc_id=1, source="only")])
    assert cap_per_key(small, "source", 4).count() == 1


# ---------------------------------------------------------------------------
# boundary-preserving first-fit sequence packing (r11)
# ---------------------------------------------------------------------------

def _ffd_reference(items, L):
    """Brute-force FFD over (len DESC, doc, chunk): independent reference."""
    out = {}
    bins = []
    for doc, chunk, ln in sorted(items, key=lambda t: (-t[2], t[0], t[1])):
        for j in range(len(bins)):
            if L - bins[j] >= ln:
                out[(doc, chunk)] = (j + 1, bins[j])
                bins[j] += ln
                break
        else:
            bins.append(ln)
            out[(doc, chunk)] = (len(bins), 0)
    return out


def test_pack_sequences_invariants_and_reference_match(spark):
    """Skewed synthetic lengths: every sequence <= L, token multiset
    preserved through the chunk split, and the per-group assignment equals
    an independent brute-force FFD."""
    import numpy as np
    from pyspark.sql import functions as F

    from cerebro_spark.operators.sampling import pack_sequences, _portable_bucket

    rng = np.random.RandomState(7)
    # heavy skew: many tiny docs, some > L (chunk split), one exactly L
    lens = (
        list(rng.randint(1, 20, 60))
        + list(rng.randint(100, 400, 8))
        + [128, 0]
    )
    df = spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    )
    L = 128
    got = pack_sequences(df, seq_len=L, n_groups=3).collect()

    # invariant: no token lost (zero-token doc contributes nothing)
    assert sum(r["n_tokens"] for r in got) == sum(n for n in lens if n > 0)
    # invariant: no sequence exceeds L; offsets are consistent
    per_seq = {}
    for r in got:
        per_seq.setdefault((r["grp"], r["seq_id"]), []).append(r)
    for members in per_seq.values():
        assert sum(r["n_tokens"] for r in members) <= L
        assert sorted(r["offset"] for r in members)[0] == 0
    # exact match vs brute-force FFD per group
    grp_of = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", _portable_bucket(F.col("doc_id"), 3).alias("g")
        ).collect()
    }
    items_by_g = {}
    for i, n in enumerate(lens):
        if n <= 0:
            continue
        nc = -(-n // L)
        for c in range(nc):
            ln = L if c < nc - 1 else n - (nc - 1) * L
            items_by_g.setdefault(grp_of[i], []).append((i, c, ln))
    for g, items in items_by_g.items():
        want = _ffd_reference(items, L)
        mine = {
            (r["doc_id"], r["chunk_id"]): (r["seq_id"], r["offset"])
            for r in got
            if r["grp"] == g
        }
        assert mine == want, f"group {g} diverges from reference FFD"


def test_pack_sequences_deterministic_across_runs(spark):
    from cerebro_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, (i * 37) % 90 + 1) for i in range(50)],
        "doc_id long, n_tokens long",
    ).repartition(8)
    a = sorted(map(tuple, pack_sequences(df, seq_len=96).collect()))
    b = sorted(map(tuple, pack_sequences(df, seq_len=96).collect()))
    assert a == b
