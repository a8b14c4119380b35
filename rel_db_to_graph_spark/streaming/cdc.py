"""Streaming CDC apply — maintain a target snapshot from an unbounded
change feed with ``foreachBatch`` + the batch ``merge_upsert``.

The production shape for continuous table maintenance without a lakehouse
format's MERGE: each micro-batch of I/U/D rows is applied to the
maintained state with the SAME anti-join + union the batch operator uses
(operators/increment.py::merge_upsert), so stream-maintained state and a
one-shot batch apply of the identical change set are EQUAL — pinned by
tests/test_streaming.py. foreachBatch is the right primitive because the
apply needs the full snapshot on the sink side, which no built-in
streaming sink exposes; per micro-batch cost is batch-sized (anti-join
broadcasts the touched keys).

State here is an in-memory DataFrame handle for the test harness; at
scale the same closure rewrites a parquet/table snapshot per batch
(idempotent for a replayed batch — merge_upsert is)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.increment import merge_upsert


class SnapshotMaintainer:
    """foreachBatch sink: applies each CDC micro-batch to the held
    snapshot via merge_upsert; ``current()`` returns the maintained
    frame (localCheckpointed so lineage does not grow per batch)."""

    def __init__(self, base: DataFrame, pk: str, op_col: str = "op"):
        self._snap = base.localCheckpoint(eager=True)
        self._pk = pk
        self._op = op_col

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        self._snap = merge_upsert(self._snap, batch, self._pk,
                                  self._op).localCheckpoint(eager=True)

    def current(self) -> DataFrame:
        return self._snap


def drain_available_now(changes_stream: DataFrame, apply_batch,
                        query_name: str,
                        checkpoint_dir: str | None = None) -> None:
    """availableNow-drain ``changes_stream`` through a foreachBatch
    callable — the shared runner for every CDC sink flavor.

    ``checkpoint_dir`` defaults to a FRESH temp directory per call: a
    fixed reusable path would make a second invocation with the same
    ``query_name`` (new process, fresh base/stream) find committed
    offsets and silently skip every already-numbered batch (ADVICE r6).
    Pass an explicit directory only for genuine resume-after-failure,
    where skipping committed batches is exactly the contract (and the
    sink must then ATTACH to its existing state — see
    PartitionedSnapshotMaintainer)."""
    auto_ckpt = checkpoint_dir is None
    if auto_ckpt:
        import tempfile
        checkpoint_dir = tempfile.mkdtemp(
            prefix=f"spark_cdc_ckpt_{query_name}_")
    try:
        q = (changes_stream.writeStream
             .foreachBatch(apply_batch)
             .queryName(query_name)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    finally:
        if auto_ckpt:
            # the fresh-per-call dir exists only to defeat offset reuse —
            # drained means done, so don't leak it (ADVICE r7); a user-
            # supplied dir stays for genuine resume-after-failure
            import shutil
            shutil.rmtree(checkpoint_dir, ignore_errors=True)


def run_cdc_stream(changes_stream: DataFrame, base: DataFrame,
                   pk: str, query_name: str = "cdc_apply",
                   op_col: str = "op",
                   checkpoint_dir: str | None = None) -> SnapshotMaintainer:
    """Drain ``changes_stream`` (availableNow) into a SnapshotMaintainer
    and return it once every pending micro-batch is applied."""
    sink = SnapshotMaintainer(base, pk, op_col)
    drain_available_now(changes_stream, sink.apply_batch, query_name,
                        checkpoint_dir)
    return sink


class PartitionedSnapshotMaintainer:
    """foreachBatch sink maintaining the snapshot AS A PARQUET TABLE
    partitioned by a key-hash bucket, rewriting ONLY the buckets a
    batch touches — the lakehouse-free MERGE shape the in-memory
    maintainer's docstring argues for, implemented and measured
    (BASELINE.md round-10).

    Layout: ``path/_pbucket=<pmod(xxhash64(pk), n_buckets)>/...``.
    Per batch:
      1. the batch's touched buckets come from one distinct over the
         (bounded, batch-sized) change keys — a ≤ n_buckets driver list;
      2. ONLY those buckets are read back (directory pruning on the
         partition column), merge_upsert'd with the batch, and
         materialized (eager localCheckpoint — the write below
         overwrites the very files the read depends on);
      3. dynamic partition overwrite rewrites exactly the touched
         directories; a touched bucket whose rows were ALL deleted is
         removed explicitly (dynamic overwrite cannot write an empty
         partition).

    Per-batch cost is O(touched_buckets × snapshot/n_buckets + batch)
    instead of the in-memory maintainer's O(snapshot); a replayed batch
    is idempotent (merge_upsert is, and rewriting a bucket with the
    same content is a no-op semantically). Size ``n_buckets`` so one
    bucket's data fits an executor comfortably — at 100 TB with
    n_buckets=16k a bucket is ~6 GB and a batch touching 1% of keys
    rewrites ~1% of directories.

    Resume contract (ADVICE r10): construction ATTACHES to an existing
    snapshot at ``path`` instead of resetting it to ``base`` — a query
    resumed with a persistent ``checkpointLocation`` skips committed
    batches, so re-initializing the snapshot from base would silently
    lose every update those batches applied. The base write happens
    only when ``path`` holds no snapshot yet (or with an explicit
    ``overwrite=True`` for a deliberate rebuild, which must pair with a
    FRESH checkpoint directory). ``base`` still declares the read
    schema in both modes, so attach works even when the surviving
    snapshot is empty (zero data files)."""

    def __init__(self, spark, base: DataFrame, path: str, pk: str,
                 op_col: str = "op", n_buckets: int = 64,
                 overwrite: bool = False):
        from pyspark.sql.types import IntegerType, StructField, StructType

        self._spark = spark
        self._path = path
        self._pk = pk
        self._op = op_col
        self._nb = int(n_buckets)
        # the declared read schema (base columns + the partition
        # column) makes every read below inference-free: an EMPTY
        # snapshot — empty base at init, or a feed that deletes every
        # remaining row — leaves the path with no data files, and
        # schema inference would raise where an empty frame is the
        # correct answer (review r10)
        self._schema = StructType(
            list(base.schema.fields)
            + [StructField("_pbucket", IntegerType())])
        if overwrite or not self._snapshot_exists():
            (base.withColumn("_pbucket", self._bucket(F.col(pk)))
             .write.mode("overwrite").partitionBy("_pbucket")
             .parquet(path))
            self._write_sentinel()

    _SENTINEL = "_CDC_SNAPSHOT_READY"

    def _fs_path(self, suffix: str = ""):
        jvm = self._spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(
            f"{self._path}/{suffix}" if suffix else self._path)
        fs = p.getFileSystem(self._spark._jsc.hadoopConfiguration())
        return fs, p

    def _write_sentinel(self) -> None:
        # maintainer-owned attach marker, written AFTER the base write
        # commits — independent of the Hadoop committer's _SUCCESS
        # markers, which object-store deployments commonly disable
        # (mapreduce.fileoutputcommitter.marksuccessfuljobs=false).
        # Relying on _SUCCESS there would make _snapshot_exists()
        # return False on resume and silently reset a live snapshot
        # to base while the persistent checkpoint skips committed
        # batches (ADVICE r11).
        fs, p = self._fs_path(self._SENTINEL)
        out = fs.create(p, True)
        out.close()

    def _snapshot_exists(self) -> bool:
        # attach signals, in order: the maintainer-owned sentinel
        # (authoritative), then two legacy fallbacks for snapshots
        # written before the sentinel existed — committed _pbucket=*
        # partition directories, or the committer's _SUCCESS marker.
        # A bare directory with none of these (e.g. a half-finished
        # first write) is re-initialized from base.
        fs, root = self._fs_path()
        jvm = self._spark._jvm
        if fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{self._path}/{self._SENTINEL}")):
            return True
        if fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{self._path}/_SUCCESS")):
            return True
        if not fs.exists(root):
            return False
        for st in fs.listStatus(root):
            if (st.isDirectory()
                    and st.getPath().getName().startswith("_pbucket=")):
                return True
        return False

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self._nb)).cast("int")

    def _read(self) -> DataFrame:
        return self._spark.read.schema(self._schema).parquet(self._path)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        # the batch is consumed twice (bucket list + merge) — pin it
        batch = batch.localCheckpoint(eager=True)
        # one pass yields both the touched-bucket list AND a NULL-pk
        # flag: upsert/delete semantics on a NULL key are undefined
        # (merge_upsert's equi-anti-join never matches NULL, so a NULL
        # "update" would silently accumulate as duplicate rows) — fail
        # loudly up front (ADVICE r10). Note xxhash64(NULL) hashes to
        # the seed, so the NULL key would otherwise vanish into a
        # perfectly valid-looking bucket.
        agg = (batch.select(self._bucket(F.col(self._pk)).alias("_pb"),
                            F.col(self._pk).isNull().alias("_null"))
               .groupBy("_pb").agg(F.max("_null").alias("_null"))
               .collect())
        if any(r["_null"] for r in agg):
            raise ValueError(
                f"CDC batch {batch_id} contains NULL values in primary "
                f"key column {self._pk!r}; CDC rows must carry a "
                "non-null key")
        touched = [int(r["_pb"]) for r in agg]
        if not touched:
            return
        sub = (self._read().filter(F.col("_pbucket").isin(touched))
               .drop("_pbucket"))
        merged = (merge_upsert(sub, batch, self._pk, self._op)
                  .withColumn("_pbucket", self._bucket(F.col(self._pk)))
                  .localCheckpoint(eager=True))
        present = {int(r["_pbucket"]) for r in
                   merged.select("_pbucket").distinct().collect()}
        # writer-scoped option, NOT the session conf: a session-global
        # set/restore races with any concurrent partitioned overwrite
        # in the same session (review r10)
        (merged.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_pbucket").parquet(self._path))
        # fully-deleted buckets leave no rows to overwrite with —
        # drop their directories via the Hadoop FS API (works on any
        # supported storage, not just local paths)
        for b in set(touched) - present:
            jvm = self._spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(
                f"{self._path}/_pbucket={b}")
            fs = p.getFileSystem(
                self._spark._jsc.hadoopConfiguration())
            fs.delete(p, True)

    def current(self) -> DataFrame:
        return self._read().drop("_pbucket")
