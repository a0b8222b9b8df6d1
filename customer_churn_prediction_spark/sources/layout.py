"""At-rest data layout management: partitioned+sorted corpus layout and
small-file compaction.

Maintenance operators every 100 TB deployment needs around the
query tiers:

* **write_corpus_layout** — the at-rest shape for the documents table:
  hive-partitioned by ``lang`` (every per-language query becomes
  directory-level partition PRUNING — the scan never lists the other
  languages' files) and range-distributed + sorted by ``n_chars``
  within each language, so length predicates prune at parquet
  row-group granularity via min/max footer stats and files have
  bounded, even sizes (repartitionByRange splits a hot language across
  many files instead of one giant writer task).
* **compact_partitions** — streaming/incremental ingest produces many
  small files per partition (each micro-batch epoch appends its own);
  at scale the resulting file-listing and task-scheduling overhead
  dominates scans. Compaction rewrites only the partitions whose file
  count exceeds what their bytes justify, bin-packing to a target file
  size. The rewrite goes to a temp dir then swaps via rename — crash
  before the swap leaves the original intact; the swap itself is two
  renames, not atomic (a table format — Delta/Iceberg — is the real
  answer when readers race maintenance; their commit protocol replaces
  the rename pair, the bin-packing below is the same).

* **vacuum_epochs** — retention for the exactly-once epoch-partitioned
  sinks: drops epoch partitions below a caller-committed frontier
  (see its docstring for why the watermark is epoch-id-based).

``scan_metrics`` executes a plan and returns the scan's real executed
metrics (files read, rows output) — the evidence layer: layout claims
here are ASSERTED from executed plans in tests/test_layout.py, not
inferred from plan strings.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus_layout(
    df: DataFrame,
    path: str,
    partition_col: str = "lang",
    order_col: str = "n_chars",
    files_per_partition: int = 4,
) -> None:
    """Write the partitioned + range-sorted corpus layout.

    ``repartitionByRange(partition_col, order_col)`` both (a) routes
    each hive partition's rows to a bounded set of writer tasks — a hot
    language becomes several evenly-sized files, never one giant one —
    and (b) makes the per-file ``order_col`` ranges DISJOINT, so a
    range predicate selects a contiguous subset of files and parquet
    min/max stats skip whole row groups. ``sortWithinPartitions``
    tightens the per-row-group min/max inside each file.

    ``files_per_partition`` scales total range partitions; at 100 TB
    set it from table bytes / target file size (same arithmetic as
    ``compact_partitions``).
    """
    n_part = df.select(partition_col).distinct().count()
    (
        df.repartitionByRange(
            max(1, n_part * files_per_partition),
            F.col(partition_col),
            F.col(order_col),
        )
        .sortWithinPartitions(partition_col, order_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def scan_metrics(df: DataFrame) -> dict[str, int]:
    """Execute ``df``'s plan and return the (first) parquet scan's
    executed metrics — {numFiles, numOutputRows, filesSize, ...}.

    Runs the plan via ``executeCollect`` on the SAME QueryExecution the
    metrics hang off (a separate ``.count()`` action would plan its own
    execution and leave these metrics at zero)."""
    plan = df._jdf.queryExecution().executedPlan()
    plan.executeCollect()
    out: dict[str, int] = {}

    def walk(node) -> None:
        if "Scan" in node.nodeName() and not out:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
        # AdaptiveSparkPlanExec and QueryStageExec are LEAVES in
        # children() terms — their subtrees hang off executedPlan() /
        # plan(); without these hops any AQE-wrapped query
        # (join/aggregate above the scan) silently yields no scan.
        if "AdaptiveSparkPlan" in node.nodeName():
            walk(node.executedPlan())
        if "QueryStage" in node.nodeName():
            walk(node.plan())
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    if not out:
        raise ValueError(
            "no parquet scan found in executed plan (unexpected plan "
            "shape):\n" + plan.toString()
        )
    return out


def zorder_key(bucket_a, bucket_b, bits: int = 8):
    """Morton (Z-order) interleave of two pre-bucketed int columns —
    a pure expression (no UDF, no global sort): bit i of each bucket
    lands at output bits 2i+1 / 2i, so sorting by the key clusters
    BOTH dimensions at once.

    Buckets are clamped into [0, 2^bits) here (out-of-range values —
    e.g. a date before the binning base going negative — would
    sign-extend through shiftright and scramble the key); compute them
    with the house fixed-literal-edge binning (floor(col / width)),
    NOT ntile — ranked quantiles need the one global sort that cannot
    survive 1000 executors, and data-independent edges keep the key
    stable across ingest batches (a re-ranked ntile key would scatter
    yesterday's files). Give both dimensions comparable bucket
    resolution: if one spans 2^k buckets and the other 2^j with
    j << k, each Z-tile is a thin slab covering most of the coarse
    dimension and that dimension stops pruning."""
    top = (1 << bits) - 1
    a = F.greatest(F.lit(0), F.least(bucket_a.cast("long"), F.lit(top)))
    b = F.greatest(F.lit(0), F.least(bucket_b.cast("long"), F.lit(top)))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key


def write_zorder_layout(
    df: DataFrame,
    path: str,
    bucket_a,
    bucket_b,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` range-distributed and sorted by the Z-order key of
    two bucket expressions. Every file then spans a small Z-range —
    i.e. a small rectangle in BOTH dimensions — so parquet footer
    min/max stats prune files for predicates on EITHER column (a
    single-column sort only ever prunes its own column). This is the
    table-format ZORDER BY, expressed with stock Spark writes; the
    skip-ability is asserted from the real parquet footers in
    tests/test_layout.py, not assumed."""
    keyed = df.withColumn("_zkey", zorder_key(bucket_a, bucket_b, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    uri = jvm.java.net.URI.create(path)
    return jvm.org.apache.hadoop.fs.FileSystem.get(
        uri, spark._jsc.hadoopConfiguration()
    ), jvm


def _is_data_file(name: str) -> bool:
    return not (name.startswith("_") or name.startswith("."))


def _must(ok: bool, action: str, src, dst=None) -> None:
    """Hadoop FileSystem.rename/delete report failure by RETURNING
    FALSE (dst exists, src vanished, permission), not by raising — and
    rename-into-an-existing-dir silently nests src INSIDE dst. Treating
    a false return as success is how a compaction 'succeeds' while
    hiding staged data inside a live partition, so every swap step
    checks its return and aborts the partition loudly instead."""
    if not ok:
        where = f"{src} -> {dst}" if dst is not None else str(src)
        raise IOError(f"filesystem {action} failed (returned false): {where}")


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Bin-pack each hive partition's data files toward
    ``target_bytes`` per file; rewrite ONLY partitions whose current
    file count exceeds ``ceil(bytes / target)`` — already-compact
    partitions are untouched, which is what makes repeated runs
    idempotent no-ops.

    Returns a report DataFrame (partition, files_before, files_after,
    bytes) — the same shape a table-format OPTIMIZE emits. Uses the
    Hadoop FileSystem API (not os.listdir), so the code is
    object-store/HDFS-correct, and reads each partition directory
    directly (the partition column lives in the directory name, so the
    rewrite round-trips files byte-for-stats without touching it)."""
    fs, jvm = _fs_for(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    report = []
    # Recover/GC staging leftovers from a crashed earlier run FIRST.
    # A tmp dir is always pre-swap garbage. An old dir has two cases:
    # if the live partition dir EXISTS the swap completed and only the
    # final delete was lost (GC it); if the live dir is ABSENT the
    # crash hit between the two swap renames and the old dir holds the
    # ONLY copy of the partition — restore it, never delete it (a GC
    # here would be silent data loss; caught by review r6).
    for st in fs.listStatus(Path(path)):
        name = st.getPath().getName()
        if not name.startswith("."):
            continue
        if name.endswith("._compact_tmp"):
            _must(fs.delete(st.getPath(), True), "delete", st.getPath())
        elif name.endswith("._compact_old"):
            live = Path(path, name[1:-len("._compact_old")])
            if fs.exists(live):
                _must(fs.delete(st.getPath(), True), "delete", st.getPath())
            else:
                _must(
                    fs.rename(st.getPath(), live),
                    "rename", st.getPath(), live,
                )
    for st in fs.listStatus(Path(path)):
        if not st.isDirectory():
            continue
        pname = st.getPath().getName()
        if "=" not in pname or pname.startswith((".", "_")):
            continue
        files = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and _is_data_file(f.getPath().getName())
        ]
        total = sum(f.getLen() for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) <= want:
            report.append((pname, len(files), len(files), total))
            continue
        src = st.getPath().toString()
        # Staging dirs are DOT-PREFIXED siblings at the table root:
        # Spark/Hadoop listings ignore '.'-children, so a reader
        # scanning the table mid-rewrite cannot discover the staged
        # copy as a bogus partition and double-count (a plain
        # '<part>._compact_tmp' name contains '=' and WOULD be listed).
        tmp = Path(path, f".{pname}._compact_tmp")
        if fs.exists(tmp):
            _must(fs.delete(tmp, True), "delete", tmp)
        spark.read.parquet(src).coalesce(want).write.mode(
            "overwrite"
        ).parquet(tmp.toString())
        old = Path(path, f".{pname}._compact_old")
        if fs.exists(old):
            _must(fs.delete(old, True), "delete", old)
        # Swap: crash before the first rename leaves the original
        # serving; between the two renames the partition is briefly
        # absent (documented above — a table format fixes this class);
        # crash after the swap leaves only an invisible dot-dir that
        # the next run's GC removes. Every step checks the boolean
        # Hadoop return (_must): if the first rename fails the second
        # would otherwise move the staged dir INSIDE the still-live
        # partition dir and report success.
        _must(fs.rename(st.getPath(), old), "rename", st.getPath(), old)
        _must(fs.rename(tmp, st.getPath()), "rename", tmp, st.getPath())
        _must(fs.delete(old, True), "delete", old)
        after = [
            f
            for f in fs.listStatus(st.getPath())
            if f.isFile() and _is_data_file(f.getPath().getName())
        ]
        report.append((pname, len(files), len(after), total))
    return spark.createDataFrame(
        report, "partition string, files_before int, files_after int, bytes long"
    )


def vacuum_epochs(
    spark: SparkSession, path: str, retain_from_epoch: int
) -> DataFrame:
    """Drop epoch partitions older than ``retain_from_epoch`` from an
    epoch-partitioned sink directory (the exactly-once sinks —
    ``ml/serving.serve_scoring_stream``, ``streaming/ingest`` — write
    ``epoch=N`` partitions that accumulate forever; once downstream
    consumers have drained an epoch, retention is a POLICY decision
    this operator actuates). The watermark is epoch-id-based, not
    mtime-based, because epoch ids are the unit the replay guarantee
    is stated in: a crash-replayed epoch REWRITES its own partition,
    so vacuuming any epoch at or above the checkpoint's frontier could
    race a replay — callers pass a frontier their checkpoint has
    committed past.

    Hadoop-FS-correct and loud on failure like the sibling maintenance
    ops (a false delete means retained data was reported vacuumed).
    Returns the audit frame (epoch, action): 'deleted' per vacuumed
    epoch — idempotent: a second run reports nothing.

    If the sink carries a ``_LATEST`` pointer (the report sinks written
    through ``streaming/drift.publish_epoch_report``, including the
    append-only audit trails), the frontier is CAPPED at the pointed-to
    epoch: a frontier above it would delete the very directory
    ``read_report`` resolves, turning a retention-policy mistake into a
    broken reader. The cap is reported as a ``'pinned:_LATEST'`` row so
    the caller sees the policy was overridden rather than silently
    honored.
    """
    fs, jvm = _fs_for(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(path)
    report = []
    latest = Path(path, "_LATEST")
    if fs.exists(root) and fs.isFile(latest):
        stream = fs.open(latest)
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            pointed = (reader.readLine() or "").strip()
        finally:
            stream.close()
        if pointed.startswith("epoch="):
            try:
                pointed_epoch = int(pointed.split("=", 1)[1])
            except ValueError:
                pointed_epoch = None
            if pointed_epoch is not None and retain_from_epoch > pointed_epoch:
                retain_from_epoch = pointed_epoch
                report.append((pointed_epoch, "pinned:_LATEST"))
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("epoch=")):
                continue
            try:
                epoch = int(name.split("=", 1)[1])
            except ValueError:
                # not one of our integer epochs (e.g. a hive null
                # partition) — never delete what we can't order
                continue
            if epoch < retain_from_epoch:
                _must(fs.delete(st.getPath(), True), "delete", st.getPath())
                report.append((epoch, "deleted"))
    return spark.createDataFrame(report, "epoch long, action string")
