"""Sinks (SURVEY §2.2): parquet/Delta point store, multi-sink fan-out, and the
InfluxDB writer (feature-flagged — no server or client lib in CI).

Exactly-once: the parquet sink + checkpoint gives idempotent replay — an
upgrade over the reference, which logs-and-drops on write error
(`/root/reference/cerebro/observer.py:126-130`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _read_marker(spark, path: str, *, absent_on_empty: bool = False):
    """Read a small marker parquet directory, returning ``None`` ONLY when
    it genuinely does not exist (``PATH_NOT_FOUND``) — every other failure
    (corrupt footer, permission, transient FS error) PROPAGATES so the
    micro-batch fails and foreachBatch retries it.

    The fail-soft alternative (bare ``except Exception`` → "first batch /
    no compaction yet") fail-OPENS on a transient read error: the batch
    would skip the near-dup probe entirely (dups stream into the survivor
    set) or re-probe a compaction-folded batch against its own folded
    fingerprints and drop its docs.  Retrying is always the safe move.

    ``absent_on_empty`` additionally maps ``UNABLE_TO_INFER_SCHEMA`` (the
    directory exists but holds no data files) to absent — correct ONLY for
    markers written LAST in their batch (a crash mid-first-batch leaves a
    torn params dir; the replay overwrites it), never for markers whose
    presence gates a destructive skip (``compacted_through``)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        get_cond = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        cls = (get_cond() if get_cond else None) or ""
        msg = str(e)
        if "PATH_NOT_FOUND" in cls or "PATH_NOT_FOUND" in msg:
            return None
        if absent_on_empty and (
            "UNABLE_TO_INFER_SCHEMA" in cls or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return None
        raise


def parquet_point_sink(batch_df: DataFrame, path: str) -> None:
    """Batch write of canonical points, partitioned by bucket/date — the
    queryable store behind `plans.client.CerebroClient`."""
    (
        batch_df.withColumn("date", F.to_date("time"))
        .write.mode("append")
        .partitionBy("bucket", "date")
        .parquet(path)
    )


def fan_out_sink(
    sinks: dict[str, Callable[[DataFrame, int], None]],
) -> Callable[[DataFrame, int], None]:
    """K4 — one ``foreachBatch`` function writing each micro-batch to every
    registered sink (the Rx Subject fan-out analog, reference
    `cerebro.py:245`; `observer.py:56-60`).  The batch is cached once so N
    sinks don't recompute the lineage N times."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink_fn in sinks.values():
                sink_fn(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return write


def points_to_line_protocol_dicts(rows) -> list[dict]:
    """Canonical point rows → influx write dicts (the contract shape the
    reference writes: measurement/tags/fields/time — `tools.py:394-399`).
    Pure function so the contract is testable without a server."""
    out = []
    for row in rows:
        fields: dict = {}
        for m in ("fields", "fields_str", "fields_bool"):
            v = row[m] if m in row.__fields__ else None
            if v:
                fields.update(v)
        point = {
            "measurement": row["measurement"],
            "tags": dict(row["tags"] or {}),
            "fields": fields,
        }
        if row["time"] is not None:
            point["time"] = row["time"]
        out.append(point)
    return out


def influxdb_writer(
    url: str,
    org: str,
    bucket_default: str,
    token_env: str = "INFLUXDB_V2_TOKEN",
    batch_points: int = 1000,
) -> Callable[[DataFrame, int], None]:
    """K2/K3 — foreachBatch sink writing points to InfluxDB v2.

    Mirrors the reference observer: token from env (`observer.py:101-105`),
    per-batch bucket routing with default (`observer.py:122-124`), batched
    writes of ``batch_points`` (`tools.py:354,402-411`).  Uses
    ``foreachPartition`` so executors write in parallel; the client import is
    inside the executor function and the sink degrades to a clear error when
    the optional dependency is missing (CI runs without it).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        def write_partition(rows) -> None:
            import os

            try:
                from influxdb_client import InfluxDBClient  # type: ignore
            except ImportError as exc:  # pragma: no cover - optional dep
                raise RuntimeError(
                    "influxdb-client not installed; influxdb_writer is "
                    "feature-flagged off in this environment"
                ) from exc

            token = os.environ.get(token_env, "")
            with InfluxDBClient(url=url, token=token, org=org) as client:
                api = client.write_api()
                buf: dict[str, list[dict]] = {}
                for row in rows:
                    bucket = row["bucket"] or bucket_default
                    buf.setdefault(bucket, []).append(row)
                    if len(buf[bucket]) >= batch_points:
                        api.write(
                            bucket=bucket,
                            record=points_to_line_protocol_dicts(buf.pop(bucket)),
                        )
                for bucket, rows_left in buf.items():
                    api.write(
                        bucket=bucket,
                        record=points_to_line_protocol_dicts(rows_left),
                    )

        batch_df.foreachPartition(write_partition)

    return write


def to_line_protocol(df: DataFrame, precision: str = "us") -> DataFrame:
    """Serialize canonical points to InfluxDB line protocol strings
    (``measurement,tag=v field=v ts`` — the text form of the reference's
    write payload).  Pure column expressions; escaping per the line-protocol
    spec (commas/spaces/equals in measurement/tags, quotes in string fields).

    Returns a single-column ``line`` DataFrame suitable for any text sink.
    """
    esc_m = lambda c: F.regexp_replace(F.regexp_replace(c, r"([,\s])", r"\\$1"), "", "")
    esc_kv = lambda c: F.regexp_replace(c, r"([,=\s])", r"\\$1")

    tag_part = F.concat_ws(
        ",",
        F.transform(
            F.map_entries(F.coalesce(F.col("tags"), F.create_map())),
            lambda e: F.concat(esc_kv(e.key), F.lit("="), esc_kv(e.value)),
        ),
    )
    num_fields = F.transform(
        F.map_entries(F.coalesce(F.col("fields"), F.create_map())),
        lambda e: F.concat(esc_kv(e.key), F.lit("="), e.value.cast("string")),
    )
    str_fields = F.transform(
        F.map_entries(F.coalesce(F.col("fields_str"), F.create_map())),
        lambda e: F.concat(
            esc_kv(e.key),
            F.lit('="'),
            F.regexp_replace(e.value, '"', '\\\\"'),
            F.lit('"'),
        ),
    )
    bool_fields = F.transform(
        F.map_entries(F.coalesce(F.col("fields_bool"), F.create_map())),
        lambda e: F.concat(
            esc_kv(e.key), F.lit("="), F.when(e.value, "true").otherwise("false")
        ),
    )
    field_part = F.concat_ws(
        ",", F.flatten(F.array(num_fields, str_fields, bool_fields))
    )
    assert precision in ("us", "ns")
    ts = F.unix_micros(F.col("time"))
    if precision == "ns":
        ts = ts * 1000
    line = F.concat(
        esc_m(F.col("measurement")),
        F.when(tag_part != "", F.concat(F.lit(","), tag_part)).otherwise(F.lit("")),
        F.lit(" "),
        field_part,
        F.when(
            F.col("time").isNotNull(), F.concat(F.lit(" "), ts.cast("string"))
        ).otherwise(F.lit("")),
    )
    return df.filter(field_part != "").select(line.alias("line"))


def idempotent_parquet_sink(path: str):
    """foreachBatch sink writing each micro-batch to ``path/batch_id=N`` with
    dynamic overwrite — a retried batch replaces its own output instead of
    appending duplicates.  checkpoint + idempotent writes = exactly-once
    (the upgrade over the reference's log-and-drop error handling,
    `observer.py:126-130`)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("date", F.to_date("time"))
            .write.mode("overwrite")
            .parquet(f"{path}/batch_id={batch_id}")
        )

    return write


def keyed_upsert_sink(
    path: str,
    key_cols: list[str],
    ts_col: str = "time",
    n_buckets: int = 64,
):
    """CDC-style merge into a keyed parquet store WITHOUT a transactional
    table format: rows are hash-bucketed by key into ``__bucket`` partitions;
    each micro-batch rewrites ONLY the buckets it touches (read-modify-write
    + dynamic partition overwrite), keeping the latest ``ts_col`` row per key
    (batch rows win ties — an upsert, not append).

    Scale shape: I/O per batch is proportional to the touched buckets, not
    the store (``n_buckets`` bounds rewrite amplification — a batch updating
    K keys rewrites ≤ min(K, n_buckets) partitions), and SHUFFLE per batch
    stays cheap: only rows whose key appears in the batch enter the
    latest-version window (broadcast semi/anti key split — no store-sized
    sort); rewritten rows take one sort-free hash repartition that doubles
    as inline per-bucket compaction (one file per bucket per merge).  On a real deployment
    with Delta/Iceberg available, MERGE INTO replaces this sink 1:1 — the
    bucketing column doubles as the table's cluster key.  Retried batches
    converge to the same store state (last-writer-ties-to-batch), so the
    sink composes with checkpointed exactly-once.

    Reference analog: the upgrade over the reference's append-only InfluxDB
    writes (`observer.py:95-130`), which delegate upsert semantics to the
    TSDB's (measurement, tags, time) last-write-wins.
    """
    import os

    from pyspark.sql import Window

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bucket = F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")
        incoming = batch_df.withColumn("__bucket", bucket)
        touched = [
            r["__bucket"]
            for r in incoming.select("__bucket").distinct().collect()
        ]
        if not touched:
            return
        # dedup the batch itself to its latest row per key (a window over
        # BATCH rows only — micro-batch-sized, not store-sized).  Same-key
        # same-ts rows (coarse-timestamp CDC emits these) break ties by a
        # hash of the whole row, NOT partition order: a checkpoint-recovery
        # replay may split files differently, and retry convergence demands
        # the same winner both times.
        row_tie = F.xxhash64(*[F.col(c) for c in batch_df.columns]).desc()
        wb = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc(), row_tie)
        b = (
            incoming.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("__from_batch", F.lit(1))
        )
        if os.path.isdir(path):
            existing = spark.read.parquet(path).filter(
                F.col("__bucket").isin(touched)
            )
            # Only rows whose key appears in the batch need the versus-batch
            # comparison; everything else in the touched buckets passes
            # through scan→write with NO shuffle.  The batch key set is
            # micro-batch-sized → broadcast semi/anti joins.
            keys = F.broadcast(b.select(*key_cols).distinct())
            e_rest = existing.join(keys, key_cols, "left_anti")
            e_hit = existing.join(keys, key_cols, "left_semi").withColumn(
                "__from_batch", F.lit(0)
            )
            wk = Window.partitionBy(*key_cols).orderBy(
                F.col(ts_col).desc(), F.col("__from_batch").desc(), row_tie
            )
            winner = (
                e_hit.unionByName(b)
                .withColumn("__rn", F.row_number().over(wk))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__from_batch")
            )
            latest = e_rest.unionByName(winner)
        else:
            latest = b.drop("__from_batch")
        # one file per touched bucket: without this, every merge leaves
        # task-count files per bucket and the store degrades into the
        # small-file regime (store_health's flag) — the repartition is a
        # shuffle of REWRITTEN rows only and doubles as inline compaction.
        latest = latest.repartition(len(touched), F.col("__bucket"))
        with_conf = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            latest.write.mode("overwrite").partitionBy("__bucket").parquet(path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", with_conf
            )

    return write


def neardup_filter_sink(
    index_path: str,
    out_path: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    grow_index: bool = True,
):
    """Online near-duplicate filter for a document ingest stream: each
    micro-batch is (1) exact-deduped within itself (content digest,
    min-id survivor), (2) probed against the persisted MinHash-LSH index
    (``dedup.build_lsh_index`` layout) and stripped of docs whose estimated
    Jaccard vs ANY indexed doc reaches ``threshold``, (3) appended to
    ``out_path``, and (4, ``grow_index``) its survivors' signatures and
    band buckets are appended to the index — so batch N+1 dedups against
    everything batches 1..N kept, with NO re-shingling of the corpus.

    Scale shape per batch: the batch side is broadcast into the bucket
    probe (the index fact side is read band-partition-pruned), signature
    verification joins only the collision set, and the index grows
    append-only (band-partitioned parquet — compaction is the store's
    normal small-file maintenance).  State lives entirely in the index
    directory, not executor memory, so the stream restarts cheaply and the
    filter's memory is O(batch), never O(corpus).

    The training-data twin of ``streaming_dedup`` (exact, watermark-bounded
    state): THIS filter is approximate, unbounded-horizon, and shares its
    index with batch pipelines (``query_lsh_index`` online lookups see the
    streamed docs immediately).

    Intra-batch semantics (CONTRACT, not an accident of the replay guard):
    within one micro-batch only EXACT duplicates (content digest) are
    collapsed; two near-duplicate docs arriving in the same batch BOTH
    survive and both enter the index.  The probe deliberately sees only
    prior batches — that is what makes at-least-once replay converge (a
    replayed batch can never be dropped by its own fingerprints) — so
    intra-batch near-dedup belongs to the batch pair operators
    (``dedup.minhash_lsh_pairs``), not this sink.  Pinned by
    ``test_neardup_filter_across_batches`` (doc 7).

    Replay contract: every write lands in a per-batch ``__batch=N``
    directory (output, signatures, band buckets) overwritten on replay, and
    the params marker is written LAST on the first batch — so at-least-once
    foreachBatch retries converge to the same store/index state.  The sink
    therefore OWNS its index layout (``buckets/__batch=N/band=M``): point it
    at a fresh directory, not at a ``build_lsh_index`` index (whose
    ``buckets/band=M`` layout has a different partition depth — mixing the
    two fails loudly at read time with conflicting directory structures).
    """
    from cerebro_spark.operators.dedup import (
        band_buckets,
        minhash_signatures,
        query_lsh_index,
    )

    rows = num_hashes // bands

    def write(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.sql import Window

        spark = batch_df.sparkSession
        # LOUD failure for a half-finished compaction swap: if the index
        # directory is gone but the pre-swap copy survives, starting fresh
        # here would silently lose dedup against the whole historical
        # corpus (the bare except below would read it as "first batch").
        if not os.path.exists(index_path) and os.path.exists(
            f"{index_path}.old"
        ):
            raise RuntimeError(
                f"{index_path} missing but {index_path}.old exists — a "
                "compact_neardup_index swap crashed mid-rename; restore "
                f"with: mv {index_path}.old {index_path}"
            )
        # (1) intra-batch exact dedup, deterministic min-id survivor
        w_digest = F.md5(F.col(content_col))
        batch = (
            batch_df.withColumn("__d", w_digest)
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__d").orderBy(id_col)
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__d", "__rn")
        )
        # fail-CLOSED marker read: only a genuinely absent params dir means
        # "first batch"; a transient read error propagates and the batch
        # retries instead of silently skipping the probe (fail-open)
        params_df = _read_marker(
            spark, f"{index_path}/params", absent_on_empty=True
        )
        have_index = params_df is not None and bool(params_df.head(1))
        if have_index:
            # (2) strip near-dups of already-kept docs
            matches = (
                query_lsh_index(
                    spark, index_path, batch,
                    content_col=content_col, id_col=id_col,
                    n=n, num_hashes=num_hashes, bands=bands,
                    threshold=threshold,
                )
                .select(F.col("probe_id").alias(id_col))
                .distinct()
            )
            kept = batch.join(matches, id_col, "left_anti")
        else:
            kept = batch
        kept = kept.persist()
        try:
            # (3) emit survivors into a per-batch directory: an
            # at-least-once foreachBatch REPLAY overwrites the same
            # directory instead of appending duplicates (the replayed docs
            # would NOT be caught by the probe — a doc is never a near-dup
            # of itself, query_lsh_index excludes id == probe_id).  Same
            # replay-idempotent layout as idempotent_parquet_sink / the
            # rollup store's trailing __batch partition.
            kept.write.mode("overwrite").parquet(
                f"{out_path}/__batch={batch_id}"
            )
            if not grow_index:
                return
            # (4) extend the index with the survivors — also per-batch
            # directories (replay = overwrite, never duplicate signatures).
            # A batch already folded into the compacted generation is
            # SKIPPED (replaying it would re-append signatures compaction
            # already absorbed into __batch=0).
            if have_index:
                # compacted_through gates a DESTRUCTIVE skip (the batch
                # writes nothing) — only true absence may read as "no
                # compaction yet"; a torn/corrupt marker propagates
                ct_df = _read_marker(spark, f"{index_path}/compacted_through")
                ct = -1 if ct_df is None else ct_df.collect()[0]["through_batch"]
                if batch_id <= ct:
                    return
            sig = minhash_signatures(
                kept, content_col, id_col, n, num_hashes
            ).persist()
            sig.write.mode("overwrite").parquet(
                f"{index_path}/signatures/__batch={batch_id}"
            )
            (
                band_buckets(sig, bands, rows)
                .repartition(bands, "band")
                .write.mode("overwrite")
                .partitionBy("band")
                .parquet(f"{index_path}/buckets/__batch={batch_id}")
            )
            # params marker LAST: its presence implies signatures + buckets
            # exist, so a crash mid-first-batch leaves have_index=False and
            # the replay rebuilds the same directories instead of wedging
            # query_lsh_index on a half-written index
            if not have_index:
                spark.createDataFrame(
                    [(n, num_hashes, bands)],
                    "n int, num_hashes int, bands int",
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{index_path}/params"
                )
            sig.unpersist()
        finally:
            kept.unpersist()

    return write


def compact_neardup_index(
    spark,
    index_path: str,
    out_path: str | None = None,
    target_files: int = 8,
):
    """Compact a ``neardup_filter_sink``-owned LSH index: thousands of
    per-batch ``__batch=N`` directories (one small file each) become one
    consolidated ``__batch=0`` generation — same read schema, same probe
    results, bounded file count.  The ops companion to ``io.compact_store``
    for the index layout.

    Writes a full new index tree and swaps it in with directory renames
    (``<path>.old`` is kept until the swap completes, then removed) — run
    it from the maintenance window, AFTER the ingest stream has stopped
    with its last batch checkpoint-committed; the swap is not atomic for
    a reader that opens mid-rename.  LOCAL filesystem paths only (POSIX
    renames) — on an object store pass ``out_path`` and flip your own
    pointer.  Crash safety: if the process dies between the two renames,
    the sink refuses to start and names the ``<path>.old`` restore; a
    replay of an already-folded batch after restart is skipped via the
    persisted ``compacted_through`` marker.  Signatures/buckets are
    deduplicated on fold, so a pre-compaction replay duplicate heals
    here.  ``target_files`` bounds the consolidated signature file count
    without funneling the whole set through one task."""
    import os as _os
    import re
    import shutil

    sig = (
        spark.read.parquet(f"{index_path}/signatures")
        .drop("__batch")
        .dropDuplicates(["id"])
    )
    buckets = (
        spark.read.parquet(f"{index_path}/buckets")
        .drop("__batch")
        .dropDuplicates(["id", "band", "bucket"])
    )
    params = spark.read.parquet(f"{index_path}/params")
    n_bands = int(params.collect()[0]["bands"])
    max_batch = max(
        (
            int(m.group(1))
            for d in _os.listdir(f"{index_path}/signatures")
            for m in [re.match(r"__batch=(\d+)$", d)]
            if m
        ),
        default=0,
    )

    target = out_path or f"{index_path}.compact-tmp"
    shutil.rmtree(target, ignore_errors=True)
    sig.repartition(target_files).write.mode("overwrite").parquet(
        f"{target}/signatures/__batch=0"
    )
    (
        buckets.repartition(n_bands, "band")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{target}/buckets/__batch=0")
    )
    params.coalesce(1).write.mode("overwrite").parquet(f"{target}/params")
    spark.createDataFrame(
        [(max_batch,)], "through_batch long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{target}/compacted_through"
    )
    if out_path is None:
        old = f"{index_path}.old"
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(index_path, old)
        shutil.move(target, index_path)
        shutil.rmtree(old)


def media_neardup_filter_sink(
    index_path: str,
    out_path: str,
    fingerprint: "Callable[[DataFrame], DataFrame] | None" = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    blocks: int = 4,
    max_hamming: int = 3,
    grow_index: bool = True,
):
    """Online PERCEPTUAL near-duplicate filter for a media ingest stream —
    the modality-agnostic twin of ``neardup_filter_sink`` (MinHash/text):
    each micro-batch is (1) exact-deduped within itself (payload digest,
    min-id survivor), (2) fingerprinted with the stateless ``fingerprint``
    stage (default ``byte_dhash_df``; pass ``image_dhash_df`` /
    ``audio_fingerprint_df``-shaped callables for binary payloads — the
    callable must return ``(id, dhash)``), (3) probed against the persisted
    pigeonhole Hamming index and stripped of docs within ``max_hamming`` of
    ANY prior survivor, (4) appended to ``out_path``, and (5, ``grow_index``)
    its survivors' fingerprints and band segments appended to the index —
    so batch N+1 dedups against everything batches 1..N kept, with NO
    re-fingerprinting of the corpus.

    Scale shape per batch: the batch side is broadcast into the band probe
    (the index fact side is read blk-partition-pruned and only colliding
    (blk, seg) buckets are touched), and the index grows append-only
    (band-partitioned parquet).  State lives in the index directory, not
    executor memory — O(batch) memory, O(colliding buckets) index I/O.

    Fail-soft composition: a row whose fingerprint is NULL (corrupt /
    undecodable media under the fingerprint stage's ``on_error='null'``)
    passes the filter UNINDEXED — it is kept (quarantine-and-count is the
    downstream's call), but can never absorb future near-dups.

    Intra-batch semantics (CONTRACT, not an accident of the replay guard):
    within one micro-batch only EXACT duplicates (payload digest) are
    collapsed; two PERCEPTUAL near-dup payloads arriving in the same batch
    BOTH survive and both enter the index.  The probe deliberately sees
    only ``__batch < N`` — that is what makes at-least-once replay converge
    (a replayed batch can never be dropped by its own fingerprints) — so
    intra-batch perceptual dedup belongs to the batch pair operators
    (``multimodal.hamming_hash_pairs``), not this sink.  Pinned by
    ``test_media_sink_replay_idempotent_with_intra_batch_neardups``.

    Replay contract (at-least-once foreachBatch): every write lands in a
    per-batch ``__batch=N`` directory overwritten on replay, the params
    marker is written LAST on the first batch, and — the part the layout
    exists for — the probe reads ONLY ``__batch < N`` index partitions, so
    a replayed batch probes the exact index state its first run saw (its
    own just-appended fingerprints can never drop its own docs on retry).
    The sink therefore OWNS its index layout (``bands/__batch=N/blk=M``);
    pointing it at a ``build_hamming_index`` store (``bands/blk=M``, no
    batch depth) fails loudly at read time, and vice versa.
    ``query_hamming_index`` CAN read this sink's index (the extra
    ``__batch`` partition column is ignored by the probe join), so batch
    pipelines see streamed survivors immediately."""
    from cerebro_spark.operators.multimodal import (
        _check_pigeonhole_recall,
        _hash_bands,
        byte_dhash_df,
    )

    _check_pigeonhole_recall(max_hamming, blocks, False)
    if fingerprint is None:
        def fingerprint(d: DataFrame) -> DataFrame:
            return byte_dhash_df(d, content_col=content_col, id_col=id_col)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.sql import Window

        spark = batch_df.sparkSession
        # half-finished compaction swap: refuse loudly with the restore
        # path rather than silently starting a fresh index (the
        # neardup_filter_sink lesson)
        if not os.path.exists(index_path) and os.path.exists(
            f"{index_path}.old"
        ):
            raise RuntimeError(
                f"{index_path} missing but {index_path}.old exists — a "
                "compact_media_index swap crashed mid-rename; restore "
                f"with: mv {index_path}.old {index_path}"
            )
        # a batch already folded into the compacted __batch=0 generation is
        # fully committed — a replay must be a NO-OP: re-probing would see
        # the batch's OWN folded fingerprints (0 < N) and wrongly drop its
        # docs, and re-appending bands would duplicate index facts.
        # Fail-CLOSED: only true absence reads as "no compaction yet"; a
        # transient read failure propagates so the batch retries rather
        # than re-probing a folded batch against its own fingerprints
        ct_df = _read_marker(spark, f"{index_path}/compacted_through")
        if ct_df is not None:
            ct = ct_df.collect()[0]["through_batch"]
            if batch_id <= ct:
                return
        # (1) intra-batch exact dedup, deterministic min-id survivor
        batch = (
            batch_df.withColumn("__d", F.md5(F.col(content_col)))
            .withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("__d").orderBy(id_col)),
            )
            .filter(F.col("__rn") == 1)
            .drop("__d", "__rn")
        )
        # (2) stateless fingerprints for the whole batch
        fps = fingerprint(batch).select("id", "dhash").persist()
        try:
            # fail-CLOSED params read: only a genuinely absent marker
            # means "first batch, no index yet" — a transient read error
            # propagates (the bare-except alternative would skip the
            # Hamming probe and stream near-dups into the survivor set)
            params_df = _read_marker(
                spark, f"{index_path}/params", absent_on_empty=True
            )
            have_index = params_df is not None
            if have_index:
                p = params_df.first()
                if (p["bits"], p["blocks"]) != (bits, blocks):
                    raise ValueError(
                        f"index at {index_path} was built with "
                        f"bits={p['bits']}, blocks={p['blocks']}; sink "
                        f"configured bits={bits}, blocks={blocks}"
                    )
            if have_index:
                # (3) probe ONLY prior batches' partitions: a replay of
                # batch N must see the index state its first run saw
                bands = spark.read.parquet(f"{index_path}/bands").filter(
                    F.col("__batch") < batch_id
                )
                pseg = _hash_bands(
                    fps.filter(F.col("dhash").isNotNull()),
                    "dhash", "id", bits, blocks,
                ).select(
                    F.col("id").alias("probe_id"), F.col("h").alias("ph"),
                    "blk", "seg",
                )
                matched = (
                    bands.join(F.broadcast(pseg), ["blk", "seg"])
                    .filter(F.bit_count(F.expr("h ^ ph")) <= max_hamming)
                    .select(F.col("probe_id").alias(id_col))
                    .distinct()
                )
                kept = batch.join(matched, id_col, "left_anti")
            else:
                kept = batch
            kept = kept.persist()
            try:
                # (4) per-batch survivor directory: replay overwrites
                kept.write.mode("overwrite").parquet(
                    f"{out_path}/__batch={batch_id}"
                )
                if not grow_index:
                    return
                # (5) survivors' fingerprints + band segments, per-batch
                kfps = fps.join(
                    kept.select(F.col(id_col).alias("id")), "id", "left_semi"
                ).filter(F.col("dhash").isNotNull())
                kfps.write.mode("overwrite").parquet(
                    f"{index_path}/fps/__batch={batch_id}"
                )
                (
                    _hash_bands(kfps, "dhash", "id", bits, blocks)
                    .repartition(blocks, "blk")
                    .write.mode("overwrite")
                    .partitionBy("blk")
                    .parquet(f"{index_path}/bands/__batch={batch_id}")
                )
                # params marker LAST: its presence implies bands exist, so
                # a crash mid-first-batch replays as "no index yet"
                if not have_index:
                    spark.createDataFrame(
                        [(bits, blocks)], "bits int, blocks int"
                    ).coalesce(1).write.mode("overwrite").parquet(
                        f"{index_path}/params"
                    )
            finally:
                kept.unpersist()
        finally:
            fps.unpersist()

    return write


def compact_media_index(
    spark,
    index_path: str,
    out_path: str | None = None,
    target_files: int = 8,
):
    """Compact a ``media_neardup_filter_sink``-owned Hamming index: many
    per-batch ``__batch=N`` directories (one small file each) collapse into
    one consolidated ``__batch=0`` generation — same probe results, bounded
    file count.  The media twin of ``compact_neardup_index``; the same
    swap/crash contract applies (run from the maintenance window after the
    stream stops; ``<path>.old`` names the restore if the rename pair is
    interrupted; POSIX-rename local paths only, pass ``out_path`` on an
    object store).

    One subtlety the text twin handles more loosely: the media sink's
    replay guard probes ``__batch < N``, and folding collapses history
    into batch id 0 — so a post-compaction replay of an already-folded
    batch N would see its OWN fingerprints (0 < N) and wrongly drop its
    docs.  The sink therefore honors the ``compacted_through`` marker
    written here as a FULL no-op (skip probe, output, and growth): a
    folded batch is by contract checkpoint-committed, so its output
    directory already holds the correct survivors."""
    import os as _os
    import re
    import shutil

    fps = (
        spark.read.parquet(f"{index_path}/fps")
        .drop("__batch")
        .dropDuplicates(["id"])
    )
    bands = (
        spark.read.parquet(f"{index_path}/bands")
        .drop("__batch")
        .dropDuplicates(["id", "blk", "seg"])
    )
    params = spark.read.parquet(f"{index_path}/params")
    n_blocks = int(params.collect()[0]["blocks"])
    max_batch = max(
        (
            int(m.group(1))
            for d in _os.listdir(f"{index_path}/bands")
            for m in [re.match(r"__batch=(\d+)$", d)]
            if m
        ),
        default=0,
    )

    target = out_path or f"{index_path}.compact-tmp"
    shutil.rmtree(target, ignore_errors=True)
    fps.repartition(target_files).write.mode("overwrite").parquet(
        f"{target}/fps/__batch=0"
    )
    (
        bands.repartition(n_blocks, "blk")
        .write.mode("overwrite")
        .partitionBy("blk")
        .parquet(f"{target}/bands/__batch=0")
    )
    params.coalesce(1).write.mode("overwrite").parquet(f"{target}/params")
    spark.createDataFrame(
        [(max_batch,)], "through_batch long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{target}/compacted_through"
    )
    if out_path is None:
        old = f"{index_path}.old"
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(index_path, old)
        shutil.move(target, index_path)
        shutil.rmtree(old)
