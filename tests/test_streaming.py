"""Streaming tests: every streaming operator must converge to its
(oracle-checked) batch equivalent on the same data."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.sources import read_table
from watsondedupe_spark import streaming as S


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """The sf events table re-written as 4 chronologically ordered parquet
    files (file source processes by mtime): micro-batches then arrive
    roughly in event-time order, as a real log would, so the watermark
    does not discard data the batch comparison still counts."""
    import time as _time

    out = str(tmp_path_factory.mktemp("events_stream"))
    df = read_table(spark, sf_dir, "events").cache()
    qs = df.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        (
            df.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
        _time.sleep(1.1)  # distinct mtimes => deterministic file order
    df.unpersist()
    return out


def _batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def _collect_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def _run(spark, sdf, name, mode="append"):
    for old in spark.streams.active:
        if old.name == name:
            old.stop()
    q = S.run_to_memory(sdf, name, mode)
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_tumbling_stream_matches_batch(spark, events_dir):
    sdf = S.tumbling_counts(S.stream_from_dir(spark, events_dir))
    got = _run(spark, sdf, "t_tumble", "complete")
    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _collect_set(got, cols) == _collect_set(batch, cols)


def test_session_stream_matches_batch(spark, events_dir):
    sdf = S.session_counts(S.stream_from_dir(spark, events_dir))
    got = _run(spark, sdf, "t_session", "complete")
    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _collect_set(got, cols) == _collect_set(batch, cols)


def test_dedupe_stream_unique_keys(spark, events_dir):
    n_keys = (
        _batch_events(spark, events_dir).select("user_id", "event_type").distinct().count()
    )
    n_rows = _batch_events(spark, events_dir).count()

    # exact (unbounded-state) dedup: exactly one row per key, ever
    exact = S.dedupe_stream(
        S.stream_from_dir(spark, events_dir), ["user_id", "event_type"], within_watermark=False
    )
    got = _run(spark, exact, "t_dedup_exact", "append")
    per_key = got.groupBy("user_id", "event_type").count()
    assert per_key.filter(F.col("count") > 1).count() == 0
    assert got.count() == n_keys

    # bounded-state dedup: unique within the watermark horizon, but a key
    # may legitimately re-emit after its state evicts (events span ~30
    # days vs a 2h watermark) — so between n_keys and all rows
    bounded = S.dedupe_stream(
        S.stream_from_dir(spark, events_dir), ["user_id", "event_type"], within_watermark=True
    )
    got_b = _run(spark, bounded, "t_dedup_bounded", "append")
    assert n_keys <= got_b.count() < n_rows


def test_stateful_user_totals(spark, events_dir):
    sdf = S.stateful_user_totals(S.stream_from_dir(spark, events_dir))
    got = _run(spark, sdf, "t_state", "update")
    # last emitted row per user must equal the batch totals
    latest = {}
    for r in got.collect():
        latest[r.user_id] = (r.n_events, r.total_value)
    batch = (
        _batch_events(spark, events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    assert len(latest) == len(batch)
    for r in batch:
        n, tv = latest[r.user_id]
        assert n == r.n
        assert tv == pytest.approx(r.tv, rel=1e-9)


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """An event older than the watermark arriving in a later file must not
    create/modify a window (append mode only finalizes closed windows)."""
    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)
    rows1 = [(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
             (2, "2024-01-01 06:00:00", 1, "click", 1.0, "{}")]  # advances watermark far
    # coalesce(1): both on-time events must land in ONE file (= one
    # micro-batch), else the file source may process the 06:00 file first
    # and the 00:10 click would itself arrive behind the watermark
    spark.createDataFrame(rows1, S.EVENTS_SCHEMA.replace("ts timestamp", "ts string")) \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .coalesce(1).write.mode("overwrite").parquet(src)

    sdf = S.tumbling_counts(S.stream_from_dir(spark, src), watermark="1 hour")
    for old in spark.streams.active:
        if old.name == "t_late":
            old.stop()
    q = S.run_to_memory(sdf, "t_late", "append")
    q.processAllAvailable()

    # late straggler: hours behind the watermark. Must get a strictly later
    # mtime than the first file — the file source orders by mtime and a
    # same-second tie could process the straggler first (not late yet).
    import time as _time

    _time.sleep(1.1)
    rows2 = [(3, "2024-01-01 00:20:00", 2, "view", 5.0, "{}")]
    spark.createDataFrame(rows2, S.EVENTS_SCHEMA.replace("ts timestamp", "ts string")) \
        .withColumn("ts", F.col("ts").cast("timestamp")) \
        .select("event_id", "ts", "user_id", "event_type", "value", "props") \
        .coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    finalized = spark.table("t_late").collect()
    # the 00:00 window closed with ONLY the on-time click; the late view
    # (user 2) must not appear anywhere
    assert all(r.event_type != "view" for r in finalized)
    w0 = [r for r in finalized if r.window_start.hour == 0]
    assert len(w0) == 1 and w0[0].n_events == 1


def test_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (views->clicks within 30 min) must
    produce exactly the batch inner join with the same predicates."""
    views_s = S.stream_from_dir(spark, events_dir).filter(F.col("event_type") == "view")
    clicks_s = S.stream_from_dir(spark, events_dir).filter(F.col("event_type") == "click")
    sdf = S.interval_join_views_to_clicks(views_s, clicks_s)
    got = _run(spark, sdf, "t_ivjoin", "append")

    ev = _batch_events(spark, events_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    batch = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")),
    ).select(F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts")

    cols = ["user_id", "view_id", "click_id", "view_ts", "click_ts"]
    assert batch.count() > 0  # the fixture must actually exercise the join
    assert _collect_set(got, cols) == _collect_set(batch, cols)


def test_ingest_stream_builds_index_incrementally(spark, tmp_path):
    """Streaming dedupe ingest: objects arriving across micro-batches
    land in the index with cross-batch chunk dedup; the final index
    equals what one batch write of everything would build."""
    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    src = str(tmp_path / "objsrc")
    os.makedirs(src, exist_ok=True)
    engine = DedupeEngine.create(
        spark, str(tmp_path / "sidx"), ChunkSettings(2048, 16384, 128, 2)
    )

    import random as _r

    shared = _r.Random(1).randbytes(40_000)  # same bytes in both waves
    wave1 = [("s/a", shared), ("s/b", _r.Random(2).randbytes(30_000))]
    wave2 = [("s/c", shared), ("s/d", _r.Random(3).randbytes(30_000))]

    def emit(rows):
        spark.createDataFrame(
            [(k, bytearray(v)) for k, v in rows], "object_key string, data binary"
        ).coalesce(1).write.mode("append").parquet(src)

    import time as _time

    emit(wave1)
    q = S.ingest_stream(engine, src, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    assert engine.exists("s/a") and engine.exists("s/b")

    _time.sleep(1.1)  # distinct mtime for the second wave's file
    emit(wave2)
    q.processAllAvailable()
    q.stop()

    # every object readable byte-for-byte
    for key, payload in wave1 + wave2:
        assert engine.get(key) == payload
    # cross-batch dedup: s/c's chunks are s/a's chunks, refcounted not re-stored
    stats = engine.stats()
    assert stats.object_count == 4
    assert stats.logical_bytes == 140_000
    assert stats.physical_bytes < stats.logical_bytes  # shared bytes stored once
    shared_chunks = engine.get_chunks("s/a").collect()
    assert all(c.ref_count == 2 for c in shared_chunks)


def test_near_dup_filter_stream_matches_sequential_semantics(spark, sf_dir, tmp_path):
    """The streaming LSH filter must keep exactly the docs a sequential
    scan would keep under the documented aggressive semantics: a doc is
    dropped iff one of its band keys was seen on any earlier doc
    (earlier batch, or lower id within the batch)."""
    import time as _time

    from watsondedupe_spark.operators.dedupe import minhash_signatures, word_shingles

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant near-dups across batches: clone some docs with a tweaked tail
    clones = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"),
                F.concat("text", F.lit(" tail")).alias("text"))
    )
    full = docs.union(clones)

    stream_in = str(tmp_path / "in")
    for lo, hi in [(0, 200), (200, 100000), (100000, 10**9)]:
        (
            full.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(stream_in)
        )
        _time.sleep(1.1)

    band = str(tmp_path / "bands")
    kept = str(tmp_path / "kept")
    q = S.near_dup_filter_stream(
        spark, stream_in, band, kept, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    kept_ids = {r.doc_id for r in spark.read.parquet(kept).select("doc_id").collect()}

    # oracle: sequential scan in (batch mtime order, id) over the same bands
    sig = minhash_signatures(word_shingles(full, "text", "doc_id"))
    bands_by_id = {
        r.id: [r[f"band{b}"] for b in range(4)] for r in sig.collect()
    }
    order = sorted(bands_by_id, key=lambda i: (0 if i < 200 else (1 if i < 100000 else 2), i))
    seen, want = set(), set()
    for i in order:
        if not any(b in seen for b in bands_by_id[i]):
            want.add(i)
        seen.update(bands_by_id[i])
    # docs with < 3 tokens have no shingles -> no bands -> always kept
    no_sig = {r.doc_id for r in full.select("doc_id").collect()} - set(bands_by_id)
    want |= no_sig

    assert kept_ids == want
    assert len(kept_ids) < full.count()  # the planted clones were filtered


def test_near_dup_filter_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A replayed micro-batch (same batch_id, state already written) must
    produce byte-identical kept/band stores — the crash-recovery contract
    of the batch-partitioned overwrite design."""
    from watsondedupe_spark.streaming import near_dup_filter_batch

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 150)
    b1 = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    band, kept = str(tmp_path / "bands"), str(tmp_path / "kept")

    near_dup_filter_batch(b0, 0, band, kept)
    near_dup_filter_batch(b1, 1, band, kept)
    kept_before = {r.doc_id for r in spark.read.parquet(kept).collect()}
    bands_before = {
        (r.batch, r.band_key) for r in spark.read.parquet(band).collect()
    }

    # replay both batches out of order (restart-after-crash shape)
    near_dup_filter_batch(b1, 1, band, kept)
    near_dup_filter_batch(b0, 0, band, kept)
    kept_after = {r.doc_id for r in spark.read.parquet(kept).collect()}
    bands_after = {
        (r.batch, r.band_key) for r in spark.read.parquet(band).collect()
    }
    assert kept_after == kept_before
    assert bands_after == bands_before


def test_stream_static_enrichment_equals_batch_join(spark, sf_dir, events_dir):
    """Stream-static broadcast enrichment converges to the batch left
    join, including events whose user has no dimension row (null cols)."""
    from watsondedupe_spark import streaming as S

    events = S.stream_from_dir(spark, events_dir)
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = S.enrich_with_dimension(events, dim)
    q = S.run_to_memory(out, "enriched")
    try:
        q.processAllAvailable()
        got_rows = spark.table("enriched").collect()
    finally:
        q.stop()
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").join(
        F.broadcast(
            dim.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
            )
        ),
        "user_id",
        "left",
    )
    want = {
        (r.event_id, r.c_mktsegment, r.c_nationkey) for r in batch.collect()
    }
    assert {
        (r.event_id, r.c_mktsegment, r.c_nationkey) for r in got_rows
    } == want


class _FakeValueState:
    """Minimal ValueState double mirroring the SPARK-46815 semantics the
    processor relies on: exists/get/update of one tuple per key."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def test_transform_with_state_logic_converges_to_batch_profile(spark, events_dir):
    """The second-gen stateful processor's final per-user emission must
    equal the batch aggregate over the same data. transformWithState's
    state-server WIRE protocol needs protobuf (absent in this container),
    so the state-transition contract is driven directly: one processor
    instance per key, fed the same rows split across multiple batches —
    exactly the sequence the runtime would deliver. A drop-in real
    decoder of the wire protocol exercises identical code, because
    stateful_user_profile_tws mixes this logic class unchanged into
    StatefulProcessor."""
    batch_df = _batch_events(spark, events_dir)
    pdf = batch_df.select("user_id", "event_type", "value").toPandas()
    final = {}
    for uid, g in pdf.groupby("user_id"):
        proc = S.UserProfileProcessor()
        proc.init(_FakeHandle())
        # split each user's rows into 3 arriving micro-batches; only the
        # LAST emission counts (update mode re-emits per batch)
        parts = [g.iloc[i::3] for i in range(3)]
        out = None
        for part in parts:
            if not len(part):
                continue
            out = list(proc.handleInputRows((uid,), iter([part]), None))[-1]
        proc.close()
        final[uid] = (
            int(out["n_events"][0]),
            float(out["total_value"][0]),
            int(out["n_types"][0]),
        )
    batch = {
        r.user_id: (r.n, float(r.total), r.t)
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.countDistinct("event_type").cast("int").alias("t"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, total, t) in final.items():
        bn, btotal, bt = batch[uid]
        assert n == bn and t == bt
        assert abs(total - btotal) < 1e-6


def test_transform_with_state_operator_wires_up(spark, events_dir):
    """The real transformWithStateInPandas operator must at least build
    its streaming plan (analysis catches schema/outputMode mistakes);
    execution needs the protobuf state server, covered by the logic
    contract above."""
    sdf = S.stateful_user_profile_tws(S.stream_from_dir(spark, events_dir))
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
        "n_types",
    ]

def test_streaming_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    """The streamed Count-Min sketch must be CELL-IDENTICAL to the
    one-shot batch sketch over the same corpus (cell counts are exact
    sums, so mergeability is an equality contract, not an approximation),
    and batch replay must not change a single cell."""
    import time as _time

    from watsondedupe_spark.functions.sketches import cm_sketch
    from watsondedupe_spark.streaming import cms_update_batch, read_cms

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream_in = str(tmp_path / "in")
    for lo, hi in [(0, 150), (150, 400), (400, 10**9)]:
        (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(stream_in)
        )
        _time.sleep(1.1)

    store = str(tmp_path / "cms")
    q = S.token_freq_cms_stream(spark, stream_in, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    merged = {(r.d, r.w): r.cnt for r in read_cms(spark, store).collect()}
    toks = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    expect = {
        (r.d, r.w): r.cnt for r in cm_sketch(toks, "token", depth=5, width=4096).collect()
    }
    assert merged == expect

    # replay one micro-batch (same batch_id) -> store unchanged
    cms_update_batch(docs.filter(F.col("doc_id") < 150), 0, store)
    after = {(r.d, r.w): r.cnt for r in read_cms(spark, store).collect()}
    assert after == expect

def test_incremental_mv_equals_batch_and_survives_compaction(spark, events_dir, tmp_path):
    """The ledger-of-partials materialized view must equal the one-shot
    batch aggregate after every file is processed, keep that equality
    across compaction (view-preserving fold), and stay idempotent under
    batch replay before compaction."""
    from watsondedupe_spark.streaming import (
        compact_keyed_agg,
        keyed_agg_update_batch,
        read_keyed_agg,
        user_totals_stream_mv,
    )

    store = str(tmp_path / "mv")
    q = user_totals_stream_mv(spark, events_dir, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    batch_events = spark.read.parquet(events_dir)
    expect = {
        (r.user_id, r.n, r.sum_cents)
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("sum_cents"),
        )
        .collect()
    }
    got = {(r.user_id, r.n, r.sum_cents) for r in read_keyed_agg(spark, store).collect()}
    assert got == expect

    # replay of an already-applied batch changes nothing (partition overwrite)
    import glob as _glob

    first_file = sorted(_glob.glob(f"{events_dir}/*.parquet"), key=os.path.getmtime)[0]
    keyed_agg_update_batch(spark.read.parquet(first_file), 0, store)
    assert {(r.user_id, r.n, r.sum_cents) for r in read_keyed_agg(spark, store).collect()} == expect

    # compaction folds the ledger to one partition, view unchanged
    n_parts_before = len([e for e in os.listdir(store) if e.startswith("batch=")])
    assert n_parts_before > 1
    compact_keyed_agg(spark, store)
    n_parts_after = len([e for e in os.listdir(store) if e.startswith("batch=")])
    assert n_parts_after == 1
    assert {(r.user_id, r.n, r.sum_cents) for r in read_keyed_agg(spark, store).collect()} == expect


def test_registered_streamed_tumbling_matches_batch_query(spark, sf_dir):
    """The GRADED streaming-replay query must equal the batch tumbling
    query row-for-row (same decimal-exact sums) — the registration-level
    pin on replay determinism."""
    from watsondedupe_spark.queries import all_queries

    specs = all_queries()
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in specs["events_tumbling_streamed"].spark(spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in specs["events_tumbling"].spark(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_user_totals_streamed_query_is_multibatch_and_exact(spark, sf_dir):
    """The graded update-mode replay must (a) actually split the corpus
    into multiple staged files (multi-batch replay), and (b) converge to
    the exact batch aggregate including decimal-exact sums."""
    import os

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.events import _stage_events_split_dir

    stage = _stage_events_split_dir(spark, sf_dir)
    parts = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    assert len(parts) >= 3
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in all_queries()["events_user_totals_streamed"].spark(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r.user_id: (r.n, float(r.t))
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("t"),
        )
        .collect()
    }
    assert got == want


def test_state_partitions_sets_and_restores(spark):
    """The state-sizing context must apply inside the block and restore
    the batch session's value on exit — including on error."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with S.state_partitions(spark, 5):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with pytest.raises(RuntimeError, match="boom"):
        with S.state_partitions(spark, 5):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_rocksdb_state_store_matches_batch(spark, events_dir):
    """The at-scale state store must EXECUTE here, not just be claimed:
    a multi-batch watermarked tumbling aggregation runs on the bundled
    RocksDB provider and must equal both the batch aggregate and the
    default-provider streamed result. RocksDB keeps state on local disk
    (bounded heap) — the configuration a 100 TB streaming pipeline
    actually runs — and results must be residence-independent."""
    with S.rocksdb_state_store(spark), S.state_partitions(spark, 4):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == S.ROCKSDB_PROVIDER
        )
        sdf = S.tumbling_counts(S.stream_from_dir(spark, events_dir))
        got = _run(spark, sdf, "t_tumble_rocks", "complete")
        rows = _collect_set(got, ["window_start", "event_type", "n_events", "total_value"])
    batch = (
        _batch_events(spark, events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    assert rows == _collect_set(
        batch, ["window_start", "event_type", "n_events", "total_value"]
    )
    # the provider setting must not leak into the batch session
    try:
        leaked = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    except Exception:
        leaked = None
    assert leaked != S.ROCKSDB_PROVIDER


def test_registered_streamed_sliding_matches_batch_query(spark, sf_dir):
    """The graded sliding-window replay must equal the batch sliding
    query row-for-row — the overlap expansion (each event in 2 window
    keys) happens inside the streaming engine and must not double- or
    drop-count across micro-batch state merges."""
    from watsondedupe_spark.queries import all_queries

    specs = all_queries()
    streamed = {
        r.window_start: (r.n_events, r.total_value)
        for r in specs["events_sliding_streamed"].spark(spark, sf_dir).collect()
    }
    batch = {
        r.window_start: (r.n_events, r.total_value)
        for r in specs["events_sliding"].spark(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_dedupe_streamed_cross_batch_suppression(spark, sf_dir):
    """The three event-id slices interleave keys across micro-batches,
    so every multi-batch key would emit twice if dedup state were not
    carried across commits — the sink must hold each key EXACTLY once
    and equal the batch DISTINCT."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["events_dedupe_streamed"].spark(spark, sf_dir).collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))  # exactly-once per key across batches
    want = {
        (r.user_id, r.event_type)
        for r in read_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert set(keys) == want


def test_interval_left_join_flushes_unmatched_on_sentinel(spark, sf_dir):
    """LEFT OUTER stream-stream join: the sentinel end-of-stream slice
    must force eviction of every unmatched view, so the streamed output
    equals the batch left join — null rows included."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    got = (
        all_queries()["events_interval_left_join_streamed"]
        .spark(spark, sf_dir)
        .collect()
    )
    ev = read_table(spark, sf_dir, "events")
    v = ev.filter((F.col("event_type") == "view") & (F.col("user_id") < 30)).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 30)).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    batch = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")),
        "leftOuter",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        "view_ts",
        F.coalesce("click_ts", F.lit("1970-01-01 00:00:00").cast("timestamp")).alias(
            "click_ts"
        ),
    ).collect()
    key = lambda r: (r.user_id, r.view_id, r.click_id, r.view_ts, r.click_ts)
    assert sorted(map(key, got)) == sorted(map(key, batch))
    # the fixture must exercise BOTH arms: matches and watermark-flushed nulls
    assert any(r.click_id == -1 for r in batch)
    assert any(r.click_id != -1 for r in batch)
