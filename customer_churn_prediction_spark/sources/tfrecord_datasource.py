"""TFRecord as a REGISTERED Spark data source (Python Data Source API).

``sources/tfrecord.py`` gives the reference-parity codec and the
mapInPandas read/write helpers (S6/S8); this module exposes the same
dependency-free codec through Spark 4's Python Data Source V2 API, so
the format composes with the ordinary reader/writer surface a Spark
user expects::

    from customer_churn_prediction_spark.sources.tfrecord_datasource \
        import register_tfrecord_format
    register_tfrecord_format(spark)
    df = spark.read.format("tfrecord").load(path)      # S6
    df.write.format("tfrecord").mode(...).save(path)   # S8
    spark.readStream.format("tfrecord").load(path)     # drop folder
    df.writeStream.format("tfrecord").option("path", p)  # epoch sink

Semantics mirror the helpers exactly (same Example layout as the
reference, ``LR/TFRecord_process.py:30-33``): rows are
``(features array<float>, label float)``.

Scale shape: read parallelism is one input partition per ``.tfrecord``
file (the natural grain — records are length-framed, not splittable
without an index); the write lands one file per task into a temp name
and the COMMIT renames all of them (the V2 contract: executors return
commit messages, the driver publishes — a failed job leaves only
``.inprogress`` temps, never a half-visible file set). Filters/column
pruning are left to Spark above the source — a record format with no
column statistics has nothing to push into.

Path discipline: plain ``os``/``glob`` like the sibling helpers — the
driver's commit renames files the tasks wrote, which requires a
filesystem shared between them (local mode, NFS, FUSE-mounted object
store). A multi-node deployment on raw object storage would swap the
file ops for the Hadoop-FS API, as ``sources/layout.py`` does for the
maintenance tier; the record codec and the commit protocol carry over
unchanged.
"""

from __future__ import annotations

import glob
import os
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .tfrecord import (
    decode_example,
    encode_example,
    frame_record,
    unframe_records,
)

_SCHEMA = "features array<float>, label float"


class TFRecordDataSource(DataSource):
    """``format("tfrecord")`` — reference-layout Example records."""

    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> "TFRecordReader":
        return TFRecordReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "TFRecordWriter":
        return TFRecordWriter(self.options, overwrite)

    def streamReader(
        self, schema: StructType
    ) -> "TFRecordPartitionStreamReader":
        # Default: the partition-based reader (executor-side decode).
        # option("reader", "simple") opts into the driver-side simple
        # variant — raising the NotImplemented marker here is the
        # documented fallback signal (datasource_internal._streamReader).
        if self.options.get("reader", "").lower() == "simple":
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return TFRecordPartitionStreamReader(self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "TFRecordStreamReader":
        return TFRecordStreamReader(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "TFRecordStreamWriter":
        return TFRecordStreamWriter(self.options)


class TFRecordReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tfrecord source requires a path (load(path))")
        self._path = path

    def partitions(self) -> Sequence[InputPartition]:
        # One partition per file: the natural parallelism grain for a
        # length-framed record format. A missing/empty dir is an empty
        # scan, matching the file-source convention.
        pattern = (
            os.path.join(self._path, "*.tfrecord")
            if os.path.isdir(self._path)
            else self._path
        )
        return [InputPartition(p) for p in sorted(glob.glob(pattern))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # An empty partitions() list reaches read() as a single None
        # partition (plan_data_source_read substitutes [None]), so the
        # empty-scan promise above needs this guard, not just [].
        if partition is None:
            return iter(())
        return _file_rows(partition.value)


def _file_rows(path: str) -> Iterator[tuple]:
    """Decode one .tfrecord file into (features, label) rows."""
    import numpy as np

    with open(path, "rb") as f:
        blob = f.read()
    for rec in unframe_records(blob):
        ex = decode_example(rec)
        vec = np.frombuffer(ex["feature"], dtype=np.float32)
        yield (vec.tolist(), float(ex["label"][0]))


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    final_path: str
    n_records: int


def _write_records(path: str, iterator) -> int:
    """Frame every (features, label) row into ``path``; returns count."""
    import numpy as np

    n = 0
    with open(path, "wb") as f:
        for row in iterator:
            f.write(
                frame_record(
                    encode_example(
                        {
                            "feature": np.asarray(
                                row[0], dtype=np.float32
                            ).tobytes(),
                            "label": [float(row[1])],
                        }
                    )
                )
            )
            n += 1
    return n


class TFRecordWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tfrecord sink requires a path (save(path))")
        self._path = path
        self._overwrite = overwrite
        # One id per write job: temps from a failed previous job can
        # never be confused with (or published by) this one's commit.
        self._job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _Committed:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(self._path, exist_ok=True)
        # Job-qualified FINAL names: under mode("append") a plain
        # part-{pid} would collide with the previous job's files and
        # the commit's os.replace would silently clobber them.
        final = os.path.join(
            self._path, f"part-{self._job_id}-{pid:05d}.tfrecord"
        )
        tmp = f"{final}.inprogress-{ctx.taskAttemptId()}"
        n = _write_records(tmp, iterator)
        return _Committed(tmp_path=tmp, final_path=final, n_records=n)

    def commit(self, messages) -> None:
        # Driver-side publish: clear stale files (overwrite, plus any
        # shorter previous write's tail), then rename every task temp.
        if self._overwrite:
            for stale in glob.glob(os.path.join(self._path, "*.tfrecord")):
                os.remove(stale)
        for m in messages:
            if m is None:
                continue
            if m.n_records == 0:
                os.remove(m.tmp_path)
                continue
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class TFRecordStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("tfrecord")`` over a drop folder.

    Offsets are the set of processed file names, so replay of a
    committed epoch (``readBetweenOffsets``) re-reads exactly that
    epoch's files — which is deterministic because the folder's files
    are immutable once visible (the batch writer publishes via atomic
    rename; any producer must do the same).

    Scale honesty: the SIMPLE stream-reader variant runs on the
    DRIVER — every record of an epoch flows through it. That is the
    right trade for modest training-data drops (the API exists for
    exactly this class of source); a firehose belongs on the
    partition-based reader, which is the DEFAULT for this format
    (:class:`TFRecordPartitionStreamReader`) — this variant is
    selected with ``option("reader", "simple")``. The offset dict
    carries the full processed-file list (both variants), so a
    long-lived query over an unbounded folder should rotate/compact
    the drop directory.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tfrecord stream requires a path (load(path))")
        self._path = path

    def _current(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self._path, "*.tfrecord")))

    @staticmethod
    def _rows(files) -> Iterator[tuple]:
        for path in files:
            yield from _file_rows(path)

    def initialOffset(self) -> dict:
        return {"processed": []}

    def read(self, start: dict):
        done = set(start["processed"])
        new = [f for f in self._current() if f not in done]
        # iter(list), not a generator: the runtime's prefetch cache
        # copy.copy()s the iterator on reuse and next()s it on the
        # no-advance path — both need a materialized, copyable
        # iterator (driver-side reader: the records pass through the
        # driver either way).
        rows = list(self._rows(new))
        return iter(rows), {"processed": sorted(done | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        new = sorted(set(end["processed"]) - set(start["processed"]))
        return iter(list(self._rows(new)))

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing external to ack


class TFRecordPartitionStreamReader(DataSourceStreamReader):
    """The DEFAULT stream reader: partition-based, executor-side.

    Same drop-folder semantics and offset shape as the simple variant
    (offset = the processed-file set; files are immutable once visible
    because producers publish via atomic rename), but each epoch's
    files become one InputPartition EACH and decode on executors — the
    firehose shape: the driver handles only file names, never records,
    so epoch throughput scales with the cluster instead of the driver.
    ``option("reader", "simple")`` selects the driver-side variant
    instead (it exists because the runtime's prefetch-cache path is
    worth exercising, and for tiny drops it avoids task overhead).
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tfrecord stream requires a path (load(path))")
        self._path = path

    def _current(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self._path, "*.tfrecord")))

    def initialOffset(self) -> dict:
        return {"processed": []}

    def latestOffset(self) -> dict:
        return {"processed": self._current()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        new = sorted(set(end["processed"]) - set(start["processed"]))
        return [InputPartition(p) for p in new]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None:  # same [None] substitution as batch
            return iter(())
        return _file_rows(partition.value)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing external to ack


@dataclass
class _EpochPart(WriterCommitMessage):
    tmp_path: str
    partition_id: int
    n_records: int
    query_id: str


class TFRecordStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("tfrecord")`` — exactly-once epochs.

    Commit protocol: tasks write uuid-named ``.epoch-{queryId}-…
    .inprogress`` temps (task-attempt-qualified, so speculative/zombie
    attempts can't collide); the driver-side ``commit(messages,
    batchId)`` concatenates them (record framing is concatenable) and
    publishes ONE file per epoch with a single atomic rename to the
    DETERMINISTIC name ``part-{queryId}-b{batchId}.tfrecord``. That
    name choice carries the correctness load:

    * The query id (checkpoint-stable across restarts; from the
      ``sql.streaming.queryId`` task property) scopes every name to
      this query LINEAGE — a different query writing to the same
      folder, or this folder already holding a previous export, can
      never be clobbered by this query's epochs (the batch writer
      job-qualifies its part names for the same reason).
    * The single ``os.replace`` makes an epoch's visibility ATOMIC:
      a replayed epoch (crash after publish, before the engine logged
      the commit — the worst-case window) overwrites the same name
      with the same row set, so the folder never shows a half-epoch
      and a downstream drop-folder reader that already recorded the
      file keeps a consistent view. Earlier epochs' files are never
      touched — the folder accumulates one immutable file per epoch,
      which is the producer contract the tfrecord stream READER
      requires, so tfrecord → tfrecord relays are safe across crashes.
    * After publishing, commit sweeps this lineage's leftover
      ``.epoch-{queryId}-*`` temps (orphans from crashed attempts) —
      microbatch commits are serial, so every match is dead.

    Scale honesty: the driver copies each epoch's bytes once at
    commit (tasks still write in parallel). That is the right trade
    for drop-folder training-shard exports — one immutable shard per
    epoch, atomically visible; a firehose-scale continuous export
    belongs on ``foreachBatch`` + partitioned parquet (the
    ``managed_ingest`` discipline), where publish is a partition
    overwrite instead of a file concatenation.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tfrecord stream sink requires a path")
        self._path = path

    def write(self, iterator) -> _EpochPart:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        qid = (
            ctx.getLocalProperty("sql.streaming.queryId") or "noquery"
        )[:8]
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(
            self._path,
            f".epoch-{qid}-{uuid.uuid4().hex[:12]}-{pid:05d}"
            f".inprogress-{ctx.taskAttemptId()}",
        )
        n = _write_records(tmp, iterator)
        return _EpochPart(
            tmp_path=tmp, partition_id=pid, n_records=n, query_id=qid
        )

    def commit(self, messages, batchId: int) -> None:
        import shutil

        msgs = sorted(
            (m for m in messages if m is not None),
            key=lambda m: m.partition_id,
        )
        if not msgs:
            return
        qid = msgs[0].query_id
        final = os.path.join(
            self._path, f"part-{qid}-b{batchId:08d}.tfrecord"
        )
        staged = f"{final}.inprogress"
        n_total = sum(m.n_records for m in msgs)
        if n_total:
            with open(staged, "wb") as out:
                for m in msgs:
                    if m.n_records:
                        with open(m.tmp_path, "rb") as src:
                            shutil.copyfileobj(src, out)
            os.replace(staged, final)
        for m in msgs:
            if os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        # Orphan sweep: any remaining temp of THIS lineage is from a
        # crashed/aborted attempt (commits are serial) — dead weight.
        for stale in glob.glob(
            os.path.join(self._path, f".epoch-{qid}-*")
        ):
            os.remove(stale)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def register_tfrecord_format(spark) -> None:
    """Idempotent registration of the ``tfrecord`` format name."""
    spark.dataSource.register(TFRecordDataSource)
