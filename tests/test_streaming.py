"""Structured Streaming parity: the availableNow-drained stream must agree
with the batch rollup on (hour, event_type) counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.events import hourly_rollup
from rel_db_to_graph_spark.sources.catalog import load_table
from rel_db_to_graph_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_available_now,
)
from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    stream = hourly_counts_stream(read_events_stream(spark, SF_SMOKE))
    run_available_now(stream, "hourly_stream_test")
    streamed = spark.table("hourly_stream_test")

    batch = hourly_rollup(load_table(spark, SF_SMOKE, "events")).select(
        "hour", "event_type", "n_events", "sum_value")

    assert streamed.count() == batch.count()
    diff = (streamed.select("hour", "event_type", "n_events", "sum_value")
            .exceptAll(batch))
    assert diff.count() == 0


def test_watermark_present(spark):
    stream = hourly_counts_stream(read_events_stream(spark, SF_SMOKE))
    assert stream.isStreaming


def _drain_append(stream_df, name: str) -> None:
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_stream_dedup_matches_batch_digests(spark):
    from rel_db_to_graph_spark.operators.text import fingerprint
    from rel_db_to_graph_spark.streaming.dedup import dedup_stream, read_docs_stream

    _drain_append(dedup_stream(read_docs_stream(spark, SF_SMOKE)),
                  "dedup_stream_test")
    streamed = spark.table("dedup_stream_test")

    batch = (load_table(spark, SF_SMOKE, "documents")
             .select(fingerprint(F.col("text")).alias("fingerprint")))
    n_distinct = batch.distinct().count()
    # one survivor per digest, digest sets identical to batch
    assert streamed.count() == n_distinct
    assert streamed.select("fingerprint").distinct().count() == n_distinct
    assert (streamed.select("fingerprint")
            .exceptAll(batch.distinct()).count() == 0)


def test_stream_dedup_watermarked_bounded_state(spark):
    from rel_db_to_graph_spark.streaming.dedup import (
        dedup_stream_watermarked,
        read_docs_stream,
    )

    docs = (read_docs_stream(spark, SF_SMOKE)
            .withColumn("event_time",
                        F.timestamp_micros((F.col("doc_id") + 86_400)
                                           * 1_000_000)))
    out = dedup_stream_watermarked(docs, "event_time", horizon="1 hour")
    assert out.isStreaming
    _drain_append(out, "dedup_wm_test")
    streamed = spark.table("dedup_wm_test")
    # all synthetic timestamps fall inside one horizon -> exact dedup
    from rel_db_to_graph_spark.operators.text import fingerprint
    n_distinct = (load_table(spark, SF_SMOKE, "documents")
                  .select(fingerprint(F.col("text"))).distinct().count())
    assert streamed.count() == n_distinct


def test_stream_static_enrichment_matches_batch(spark):
    """Stream-static join: per-(hour, nation) counts from the enriched
    stream equal the all-batch twin."""
    from rel_db_to_graph_spark.streaming.enrich import enriched_rates_stream

    # dimension: customer nation keyed by a synthetic user_id range
    # matching events.user_id (events user ids are small ints)
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nation"))

    stream = enriched_rates_stream(
        read_events_stream(spark, SF_SMOKE), cust, attr="nation")
    run_available_now(stream, "enrich_stream_test")
    streamed = spark.table("enrich_stream_test")

    batch = (load_table(spark, SF_SMOKE, "events")
             .join(F.broadcast(cust), "user_id", "left")
             .groupBy(F.date_format(F.date_trunc("hour", F.col("ts")),
                                    "yyyy-MM-dd HH:mm:ss").alias("hour"),
                      "nation")
             .agg(F.count("*").alias("n_events")))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_stream_sessions_match_batch_sessionize(spark):
    """Stream-vs-batch digest parity for sessionization (VERDICT r5 ask):
    the availableNow-drained `running_user_sessions` final state must
    equal the per-user reduction of the batch `sessionize` — same
    session count, event count, and last event time for every user."""
    from pyspark.sql import Window

    from rel_db_to_graph_spark.operators.events import sessionize, ts_micros
    from rel_db_to_graph_spark.streaming.stateful import running_user_sessions

    stream = running_user_sessions(
        read_events_stream(spark, SF_SMOKE).select("user_id", "ts"))
    q = (stream.writeStream.format("memory").queryName("sessions_state_test")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # update-mode memory sink appends every state update; the final state
    # per user is the row with the largest n_events (running totals are
    # monotone per key)
    streamed = (spark.table("sessions_state_test")
                .withColumn("_rn", F.row_number().over(
                    Window.partitionBy("user_id")
                    .orderBy(F.desc("n_events"), F.desc("last_ts"))))
                .filter("_rn = 1").drop("_rn"))

    ev = load_table(spark, SF_SMOKE, "events")
    batch = (sessionize(ev)
             .groupBy("user_id")
             .agg(F.sum("n_events").alias("n_events"),
                  F.max("session_id").alias("n_sessions")))
    last = (ev.select("user_id", ts_micros(ev).alias("ts_us"))
            .groupBy("user_id").agg(F.max("ts_us").alias("last_ts")))
    batch = batch.join(last, "user_id").select(
        "user_id", "n_events", "n_sessions", "last_ts")

    assert streamed.count() == batch.count()
    assert (streamed.select("user_id", "n_events", "n_sessions", "last_ts")
            .exceptAll(batch).count() == 0)


def test_custom_sessionize_matches_builtin_session_window(spark):
    """Cross-validation against the ENGINE's own sessionization: Spark's
    built-in session_window aggregate (gap-based, 30 min) must produce
    the same per-user session count and per-session event counts as the
    custom lag/cumsum sessionize — two independent implementations, one
    semantics. (Boundary note: at a gap of EXACTLY 30 min the two
    differ — sessionize splits on gap > threshold, session_window on
    gap >= threshold; with µs-resolution event times an exact-1800s gap
    has negligible probability in generated data, and the oracle-pinned
    `events_sessionize` defines the engine's contractual semantics.)"""
    from rel_db_to_graph_spark.operators.events import (
        sessionize,
        with_event_time,
    )

    ev = with_event_time(load_table(spark, SF_SMOKE, "events"))
    builtin = (ev.groupBy("user_id",
                          F.session_window("event_time", "30 minutes"))
               .agg(F.count("*").alias("n_events"))
               .select("user_id", "n_events"))
    custom = sessionize(load_table(spark, SF_SMOKE, "events")).select(
        "user_id", "n_events")
    assert builtin.count() == custom.count()
    assert builtin.exceptAll(custom).count() == 0
    assert custom.exceptAll(builtin).count() == 0


def test_streaming_quality_scoring_matches_batch(spark):
    """The pinned-weight quality classifier is a map-only codegen
    expression, so the SAME function applies unchanged to a stream —
    availableNow-drained scores must equal the batch scores exactly."""
    from rel_db_to_graph_spark.ml.quality import score_quality

    docs_schema = ("doc_id long, text string, lang string, "
                   "source string, n_chars long")
    sdocs = (spark.readStream.schema(docs_schema)
             .option("pathGlobFilter", "documents.parquet")
             .parquet(SF_SMOKE))
    _drain_append(score_quality(sdocs), "quality_stream_test")
    streamed = spark.table("quality_stream_test")

    batch = score_quality(load_table(spark, SF_SMOKE, "documents"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_streaming_cms_matches_batch_sketch(spark):
    """Streaming CMS: the drained update-mode cell table equals the
    batch cms_counters over the same documents — fixed depth*width
    state, interchangeable sketches."""
    from rel_db_to_graph_spark.operators.stats import cms_counters
    from rel_db_to_graph_spark.streaming.sketch import cms_cells_stream

    docs_schema = ("doc_id long, text string, lang string, "
                   "source string, n_chars long")
    sdocs = (spark.readStream.schema(docs_schema)
             .option("pathGlobFilter", "documents.parquet")
             .parquet(SF_SMOKE))
    q = (cms_cells_stream(sdocs, width=64, depth=4)
         .writeStream.format("memory").queryName("cms_stream_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = spark.table("cms_stream_test")

    batch = cms_counters(load_table(spark, SF_SMOKE, "documents"),
                         width=64, depth=4)
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert streamed.count() <= 64 * 4          # the fixed-state bound


def test_stream_stream_join_matches_batch_pairs(spark):
    """Stream-stream interval join (purchases x clicks, 10-min window)
    drained with availableNow must produce EXACTLY the batch join's pair
    set — count and rows. Also pins that the plan is a real
    stream-stream join with state eviction (watermark + interval bound),
    not an unbounded-history join."""
    from rel_db_to_graph_spark.streaming.join import attribution_pairs_stream

    stream = attribution_pairs_stream(read_events_stream(spark, SF_SMOKE))
    q = (stream.writeStream.format("memory").queryName("ss_join_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = spark.table("ss_join_test")

    e = load_table(spark, SF_SMOKE, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_time"))
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_time"))
    batch = (p.join(c, F.expr(
        "p_user = c_user AND c_time > p_time - interval 10 minutes "
        "AND c_time <= p_time"))
        .select("purchase_event_id", "click_event_id",
                F.col("p_user").alias("user_id"),
                (F.unix_micros("p_time") - F.unix_micros("c_time"))
                .alias("gap_us")))

    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_streaming_cdc_apply_matches_batch_merge(spark):
    """Stream-maintained snapshot (foreachBatch merge_upsert over CDC
    micro-batches) must equal both the one-shot batch apply AND the
    target snapshot the diff was derived from."""
    import shutil
    import tempfile

    from rel_db_to_graph_spark.operators.increment import (
        merge_upsert,
        snapshot_diff,
    )
    from rel_db_to_graph_spark.queries import _cdc_snapshots
    from rel_db_to_graph_spark.streaming.cdc import run_cdc_stream

    old, new = _cdc_snapshots(spark, SF_SMOKE)
    old = old.localCheckpoint(eager=True)
    new = new.localCheckpoint(eager=True)
    changes = (snapshot_diff(old, new, "o_orderkey")
               .join(new, "o_orderkey", "left"))

    src_dir = tempfile.mkdtemp(prefix="cdc_src_")
    try:
        # two files → at least one micro-batch each under availableNow
        changes.filter(F.col("o_orderkey") % 2 == 0) \
            .write.mode("overwrite").parquet(f"{src_dir}/b0")
        changes.filter(F.col("o_orderkey") % 2 != 0) \
            .write.mode("append").parquet(f"{src_dir}/b0")
        stream = (spark.readStream.schema(changes.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(f"{src_dir}/b0"))
        sink = run_cdc_stream(stream, old, "o_orderkey",
                              query_name="cdc_test")
        got = sink.current().select("o_orderkey", "o_custkey",
                                    "o_totalprice")
        want_batch = merge_upsert(old, changes, "o_orderkey") \
            .select("o_orderkey", "o_custkey", "o_totalprice")
        want_new = new.select("o_orderkey", "o_custkey", "o_totalprice")
        assert got.exceptAll(want_batch).count() == 0
        assert want_batch.exceptAll(got).count() == 0
        assert got.exceptAll(want_new).count() == 0
        assert want_new.exceptAll(got).count() == 0

        # ADVICE r6: a SECOND invocation with the same query_name must
        # reprocess from scratch (fresh default checkpoint per call),
        # not silently skip batches committed by the first run.
        stream2 = (spark.readStream.schema(changes.schema)
                   .option("maxFilesPerTrigger", 1)
                   .parquet(f"{src_dir}/b0"))
        sink2 = run_cdc_stream(stream2, old, "o_orderkey",
                               query_name="cdc_test")
        got2 = sink2.current().select("o_orderkey", "o_custkey",
                                      "o_totalprice")
        assert got2.exceptAll(want_new).count() == 0
        assert want_new.exceptAll(got2).count() == 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


def test_sessions_event_time_timeout_evicts_idle_keys(spark):
    """Round 10: the sessionizer's EventTimeTimeout variant (bounded
    state for unbounded key spaces). A 4-file mtime-ordered feed:
    user 1 is active only in batch 0; as the watermark advances past
    user 1's last event + timeout, the key TIMES OUT — its final row
    is emitted once more and the state removed — and when user 1
    reappears later it starts a FRESH count (the documented
    state/exactness trade-off). User 2 stays active and accumulates
    exactly as under NoTimeout."""
    import datetime
    import os
    import shutil
    import tempfile

    from rel_db_to_graph_spark.streaming.stateful import (
        running_user_sessions,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(hours=0, minutes=0):
        return t0 + datetime.timedelta(hours=hours, minutes=minutes)

    batches = [
        [(1, ts()), (1, ts(minutes=1)), (2, ts())],
        [(2, ts(hours=10))],
        [(2, ts(hours=20))],       # wm after b1 = t0+9h > u1 timeout
        [(1, ts(hours=21))],       # u1 returns AFTER eviction
    ]
    feed = tempfile.mkdtemp(prefix="sess_timeout_")
    try:
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "user_id long, ts timestamp")
            tmp = f"{feed}/_b{i}"
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = f"{feed}/ev_{i:02d}.parquet"
            shutil.move(os.path.join(tmp, src), dst)
            shutil.rmtree(tmp)
            os.utime(dst, (i * 1000, i * 1000))
        stream = (spark.readStream.schema("user_id long, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .option("pathGlobFilter", "ev_*.parquet")
                  .parquet(feed)
                  .withColumn("event_time", F.col("ts")))
        out = running_user_sessions(stream, idle_timeout_minutes=60,
                                    watermark="1 hour")
        q = (out.writeStream.format("memory").queryName("sess_timeout")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = sorted(
            spark.table("sess_timeout").collect(),
            key=lambda r: (r.user_id, r.last_ts, r.n_events))
        u1 = [r for r in rows if r.user_id == 1]
        u2 = [r for r in rows if r.user_id == 2]
        # u1: batch-0 update, the timeout emission (same totals), then
        # the FRESH post-eviction row — counts restarted
        assert [(r.n_events, r.n_sessions) for r in u1] == [
            (2, 1), (2, 1), (1, 1)]
        # u2 accumulates exactly like NoTimeout: 3 events, 3 sessions
        assert (u2[-1].n_events, u2[-1].n_sessions) == (3, 3)
    finally:
        shutil.rmtree(feed, ignore_errors=True)


def test_partitioned_snapshot_maintainer_matches_in_memory(spark):
    """Round 10: the bucket-partitioned CDC maintainer (rewrites ONLY
    touched directories per batch) must end bit-equal to the in-memory
    merge_upsert maintainer over the same batch sequence — including a
    batch that deletes EVERY row of one bucket, where dynamic partition
    overwrite cannot write an empty partition and the directory must be
    removed explicitly."""
    import os
    import shutil
    import tempfile

    from rel_db_to_graph_spark.streaming.cdc import (
        PartitionedSnapshotMaintainer,
        SnapshotMaintainer,
    )

    base = (load_table(spark, SF_SMOKE, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .localCheckpoint(eager=True))
    nb = 4
    bucket = F.pmod(F.xxhash64("o_orderkey"), F.lit(nb)).cast("int")
    path = tempfile.mkdtemp(prefix="cdc_part_") + "/snap"
    try:
        mem = SnapshotMaintainer(base, "o_orderkey")
        part = PartitionedSnapshotMaintainer(spark, base, path,
                                             "o_orderkey", n_buckets=nb)
        # batch 1: updates across buckets + two inserts
        b1 = (base.filter(F.col("o_orderkey") % 7 == 0)
              .withColumn("o_totalprice", F.col("o_totalprice") + 1)
              .withColumn("op", F.lit("U"))
              .unionByName(spark.createDataFrame(
                  [(10**9 + 1, 1, 42.0, "I"), (10**9 + 2, 2, 43.0, "I")],
                  base.schema.simpleString()[7:-1].replace(":", " ")
                  + ", op string"))
              .localCheckpoint(eager=True))
        mem.apply_batch(b1, 0)
        part.apply_batch(b1, 0)
        # batch 2: delete EVERY current key of bucket 0
        b2 = (mem.current().filter(bucket == 0)
              .withColumn("op", F.lit("D")).localCheckpoint(eager=True))
        assert b2.count() > 0          # the edge case is actually hit
        mem.apply_batch(b2, 1)
        part.apply_batch(b2, 1)

        got = part.current()
        want = mem.current()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert not os.path.exists(f"{path}/_pbucket=0")
        # untouched-bucket directories survived both batches
        assert os.path.exists(f"{path}/_pbucket=3")
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_partitioned_snapshot_maintainer_attaches_on_resume(spark):
    """ADVICE r10 (medium): re-constructing the maintainer over an
    EXISTING snapshot path must ATTACH (keep the applied updates), not
    reset the snapshot to base — the resume-after-failure pattern skips
    committed batches, so a reset would silently lose their updates.
    ``overwrite=True`` restores the old deliberate-rebuild behavior."""
    import shutil
    import tempfile

    from rel_db_to_graph_spark.streaming.cdc import (
        PartitionedSnapshotMaintainer,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double")
    path = tempfile.mkdtemp(prefix="cdc_attach_") + "/snap"
    try:
        m1 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4)
        b = spark.createDataFrame([(2, 99.0, "U"), (3, 30.0, "I")],
                                  "k long, v double, op string")
        m1.apply_batch(b, 0)
        # simulated restart: committed batch 0 will NOT be replayed
        m2 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4)
        got = {(r.k, r.v) for r in m2.current().collect()}
        assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}
        # explicit rebuild resets to base (pairs with a fresh checkpoint)
        m3 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4, overwrite=True)
        got = {(r.k, r.v) for r in m3.current().collect()}
        assert got == {(1, 10.0), (2, 20.0)}
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


def test_partitioned_snapshot_maintainer_attach_without_success(spark):
    """ADVICE r11 (medium): the attach signal must NOT depend on the
    Hadoop committer's _SUCCESS marker — object-store deployments
    commonly disable it (marksuccessfuljobs=false), and a resume that
    misreads "no _SUCCESS" as "no snapshot" silently resets a live
    snapshot to base while the persistent checkpoint skips committed
    batches. The maintainer now writes its own sentinel; legacy
    snapshots (pre-sentinel) attach via their _pbucket directories."""
    import os
    import shutil
    import tempfile

    from rel_db_to_graph_spark.streaming.cdc import (
        PartitionedSnapshotMaintainer,
    )

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double")
    path = tempfile.mkdtemp(prefix="cdc_nosucc_") + "/snap"
    try:
        m1 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4)
        b = spark.createDataFrame([(2, 99.0, "U"), (3, 30.0, "I")],
                                  "k long, v double, op string")
        m1.apply_batch(b, 0)
        # simulate disabled success markers: strip every _SUCCESS
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f == "_SUCCESS":
                    os.unlink(os.path.join(root, f))
        m2 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4)
        got = {(r.k, r.v) for r in m2.current().collect()}
        assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}
        # legacy snapshot (pre-sentinel, markers disabled): sentinel
        # gone too — the _pbucket=* directories are the last signal
        os.unlink(os.path.join(
            path, PartitionedSnapshotMaintainer._SENTINEL))
        m3 = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                           n_buckets=4)
        got = {(r.k, r.v) for r in m3.current().collect()}
        assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


def test_partitioned_snapshot_maintainer_rejects_null_pk(spark):
    """ADVICE r10: a NULL primary key in a CDC batch must raise a clear
    error instead of a TypeError on the NULL bucket (and never land in
    a stray __HIVE_DEFAULT_PARTITION__ directory)."""
    import shutil
    import tempfile

    import pytest

    from rel_db_to_graph_spark.streaming.cdc import (
        PartitionedSnapshotMaintainer,
    )

    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    path = tempfile.mkdtemp(prefix="cdc_nullpk_") + "/snap"
    try:
        m = PartitionedSnapshotMaintainer(spark, base, path, "k",
                                          n_buckets=4)
        bad = spark.createDataFrame([(None, 5.0, "I"), (2, 6.0, "I")],
                                    "k long, v double, op string")
        with pytest.raises(ValueError, match="NULL.*primary"):
            m.apply_batch(bad, 0)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


def test_session_windows_stream_matches_batch_twin(spark):
    """Round 11: the built-in F.session_window production sessionizer,
    drained over multiple real micro-batches, must equal an independent
    BATCH lag-gap sessionization of the same events — a new session
    starts on a STRICTLY-greater-than-30-min gap (session_window merges
    events exactly gap apart, the same boundary rule as the custom
    kernel; pinned here with u2's exact-30-min chain)."""
    import os
    import shutil
    import tempfile

    from rel_db_to_graph_spark.streaming.stateful import (
        session_windows_stream,
    )

    mins = [0, 10, 20, 80, 110, 200]          # u1: sessions at 0, 80, 200
    rows = [(1, m) for m in mins]
    for m in (5, 35, 65):                      # u2: exactly 30-min gaps —
        rows.append((2, m))                    # ONE merged session (>)
    feed = tempfile.mkdtemp(prefix="sessw_feed_")
    try:
        df = spark.createDataFrame(
            [(u, m) for u, m in rows], "user_id long, m long"
        ).select(
            "user_id",
            (F.timestamp_seconds(F.lit(1704100000) + F.col("m") * 60)
             ).alias("ts"))
        # three time-ordered single-file batches with increasing mtimes
        parts = [df.filter(F.col("ts") < F.timestamp_seconds(
                     F.lit(1704100000 + 40 * 60))),
                 df.filter((F.col("ts") >= F.timestamp_seconds(
                     F.lit(1704100000 + 40 * 60)))
                     & (F.col("ts") < F.timestamp_seconds(
                         F.lit(1704100000 + 120 * 60)))),
                 df.filter(F.col("ts") >= F.timestamp_seconds(
                     F.lit(1704100000 + 120 * 60)))]
        for i, p in enumerate(parts):
            tmp = f"{feed}/_b{i}"
            p.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            dst = f"{feed}/ev_{i:02d}.parquet"
            shutil.move(os.path.join(tmp, src), dst)
            shutil.rmtree(tmp)
            os.utime(dst, (i * 1000, i * 1000))
        stream = (spark.readStream.schema("user_id long, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .option("pathGlobFilter", "ev_*.parquet")
                  .parquet(feed)
                  .withColumn("event_time", F.col("ts")))
        out = session_windows_stream(stream, gap="30 minutes",
                                     watermark="10 minutes")
        q = (out.writeStream.format("memory").queryName("sessw")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.table("sessw").collect())

        # independent batch twin: lag-gap with the >= boundary
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy("ts")
        batch = (df.withColumn("_gap", F.col("ts").cast("long")
                               - F.lag(F.col("ts").cast("long")).over(w))
                 .withColumn("_new", ((F.col("_gap").isNull())
                                      | (F.col("_gap") > 1800))
                             .cast("int"))
                 .withColumn("_sid", F.sum("_new").over(
                     w.rowsBetween(Window.unboundedPreceding, 0)))
                 .groupBy("user_id", "_sid")
                 .agg(F.min("ts").alias("session_start"),
                      (F.timestamp_seconds(
                          F.max("ts").cast("long") + 1800)
                       ).alias("session_end"),
                      F.count("*").alias("n_events")))
        want = sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch.collect())
        # append mode emits a session iff the FINAL watermark passed
        # its end: watermark = max event time - 10 min delay, session
        # emitted iff session_end < watermark. Assert the exact rule in
        # BOTH directions (a wrongly-withheld session ending just
        # before max_ts now fails — ADVICE r11 tightened this from the
        # earlier could-still-be-open approximation).
        assert got, "no sessions emitted"
        assert set(got).issubset(set(want)), (got, want)
        import datetime
        max_ts = df.agg(F.max("ts")).first()[0]
        final_wm = max_ts - datetime.timedelta(minutes=10)
        for s in want:
            (_u, _st, end, _n) = s
            if end < final_wm:
                assert s in got, (
                    f"session {s} closed before the final watermark "
                    f"{final_wm} but was not emitted")
            else:
                assert s not in got, (
                    f"session {s} ends at/after the final watermark "
                    f"{final_wm} and must be withheld in append mode")
    finally:
        shutil.rmtree(feed, ignore_errors=True)
