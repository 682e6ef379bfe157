"""Spark 4 Python DataSource API surface (SURVEY.md section 2.8 extension
family): a custom source implemented in pure Python and registered with
``spark.dataSource.register`` -- the modern way to plug a bespoke feed
(an internal service, a proprietary format, a generator) into the
DataFrame planner without JVM code.

``SyntheticCorpusDataSource`` generates a deterministic document corpus:
every value is an md5 derivation of (doc_id, position), so any engine can
replay the generation -- the registered query's DuckDB oracle rebuilds the
identical corpus from SQL and hash-compares it.

Scale shape: ``partitions()`` splits the id space into strided slices, so
a 1000-executor cluster generates 1000 independent shards with no driver
bottleneck and no shuffle; the reader holds no state beyond its options.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _h(*parts) -> int:
    """md5-derived 60-bit integer of '|'-joined parts (engine-portable:
    DuckDB replays it as ('0x' || substr(md5(...), 1, 15))::BIGINT)."""
    import hashlib

    return int(
        hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()[:15], 16
    )


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("partitions", 8))
        self.vocab = int(options.get("vocab", 1000))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        p = partition.value
        for i in range(p, self.n_docs, self.n_parts):
            yield _doc_row(i, self.vocab)


def _doc_row(i: int, vocab: int):
    """One deterministic corpus row -- shared by the batch and stream
    readers so both paths generate the identical corpus (and one DuckDB
    md5 replay covers either)."""
    n_tok = 5 + _h("len", i) % 20
    return (i, " ".join(f"t{_h('tok', i, j) % vocab}" for j in range(n_tok)))


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticCorpusStreamReader(DataSourceStreamReader):
    """STREAMING Python DataSource reader (Spark 4): offsets are positions
    in the deterministic doc-id sequence; each micro-batch covers
    [start, end) split into ``partitions`` contiguous slices read in
    parallel on executors.  ``advance`` caps how far ``latestOffset``
    moves per trigger (defaults to everything -- the AvailableNow
    catch-up shape; a small value yields genuine incremental
    micro-batches under a processing-time trigger, exercised by
    tests/test_pyds_stream.py).  The cursor is driver-reader state, the
    committed offset lives in the CHECKPOINT -- on restart the engine
    resumes from its committed offset via partitions(start, end), which
    is pure, so recovery replays exactly the uncommitted range."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("partitions", 8))
        self.vocab = int(options.get("vocab", 1000))
        self.advance = int(options.get("advance", self.n_docs))
        self._cursor = 0
        self.committed: list[int] = []

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        self._cursor = min(self._cursor + self.advance, self.n_docs)
        return {"i": self._cursor}

    def partitions(self, start, end):
        s, e = start["i"], end["i"]
        if e <= s:
            return [_IdRange(s, s)]
        n = min(self.n_parts, e - s)
        step = (e - s + n - 1) // n
        return [_IdRange(lo, min(lo + step, e)) for lo in range(s, e, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _doc_row(i, self.vocab)

    def commit(self, end):
        self.committed.append(end["i"])


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus")`` (batch) or
    ``spark.readStream.format("synthetic_corpus")`` (streaming) with
    options ``n_docs`` / ``partitions`` / ``vocab`` (+ ``advance`` for
    the stream's per-trigger offset cap)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema):
        return SyntheticCorpusReader(self.options)

    def streamReader(self, schema):
        return SyntheticCorpusStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register the repo's Python data sources on a session."""
    for src in (SyntheticCorpusDataSource, JsonlSinkDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:  # already registered on this session
            pass


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str):
        self.tmp_path = tmp_path



def _stage_jsonl_partition(path: str, iterator) -> "_JsonlCommit":
    """Executor-side staging shared by the batch and streaming jsonl
    sinks: stream the partition's rows into a uniquely-named ``.tmp``
    file under ``path`` and return its commit message.  Nothing becomes
    visible until a driver-side commit renames it."""
    import json
    import os
    import uuid

    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.tmp")
    with open(tmp, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict()) + "\n")
    return _JsonlCommit(tmp)


def _remove_staged(messages) -> None:
    """Abort-path cleanup shared by both sinks: a FAILED task contributes
    None instead of a commit message (DataSource writer contract) -- skip
    those, and never let one orphan's failure block the rest."""
    import os

    for m in messages:
        if m is None:
            continue
        try:
            os.remove(m.tmp_path)
        except OSError:
            pass


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side half of the Python sink: each partition streams its
    rows to a ``.tmp`` file and reports the path in its commit message;
    nothing becomes visible until the driver-side ``commit`` renames every
    temp file at once -- the standard two-phase commit that makes a custom
    sink exactly-once under task retries (a failed attempt's orphan .tmp is
    never renamed, so it is never read).

    DEPLOYMENT ASSUMPTION: ``commit`` runs on the DRIVER and renames files
    the EXECUTORS wrote, so exactly-once holds only when driver and
    executors share one filesystem namespace -- local mode, NFS, or a
    fuse-mounted object store.  On a shared-nothing cluster, point ``path``
    at shared storage or use a JVM FileCommitProtocol sink instead; a
    local-disk path would make commit() fail with FileNotFoundError.
    ``commit`` also sweeps stray ``*.tmp`` orphans (a task that succeeded
    after a retry leaves its failed attempt's temp file behind with no
    commit message to name it)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_jsonl_partition(self.path, iterator)

    def commit(self, messages):
        import glob
        import os

        committed = set()
        for m in messages:
            os.rename(m.tmp_path, m.tmp_path[: -len(".tmp")])
            committed.add(m.tmp_path)
        # best-effort sweep: a task that failed once and then succeeded on
        # retry leaves the failed attempt's .tmp orphan with no commit
        # message naming it -- remove leftovers so the directory ends clean
        for orphan in glob.glob(os.path.join(self.path, "*.jsonl.tmp")):
            if orphan not in committed:
                try:
                    os.remove(orphan)
                except OSError:
                    pass

    def abort(self, messages):
        _remove_staged(messages)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_pysink").option("path", dir)`` -- a custom
    pure-Python SINK through the Spark 4 DataSource write API, the
    outbound twin of SyntheticCorpusDataSource."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_pysink"

    def writer(self, schema, overwrite):
        if overwrite:
            # append-only sink: commit() renames new files and cannot see
            # (or atomically retract) a previous job's output -- refusing
            # loudly beats silently doubling the directory
            raise NotImplementedError("jsonl_pysink supports append mode only")
        return JsonlSinkWriter(self.options)

    def streamWriter(self, schema, overwrite):
        if overwrite:
            # complete/update output modes pass overwrite=True expecting a
            # per-batch TRUNCATE; commit() only replaces files of the SAME
            # batch id, so honoring those modes would snapshot-duplicate
            # rows across batches -- refuse loudly, like the batch writer
            raise NotImplementedError("jsonl_pysink streaming supports append mode only")
        return JsonlStreamSinkWriter(self.options)


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """STREAMING half of the Python sink (Spark 4
    ``DataSourceStreamWriter``): completes the Python-DataSource matrix
    (batch read, batch write, stream read, now stream write).  Each
    micro-batch is its own two-phase commit: executors stage partition
    files as ``.tmp`` (same as the batch writer), and the driver-side
    ``commit(messages, batchId)`` finalizes them under BATCH-PREFIXED
    names -- ``batch-{id:08d}-{part:05d}.jsonl`` -- after first deleting
    any files a previous attempt of the SAME batch left behind.  That
    delete-then-rename is what makes the sink exactly-once under
    restart: a crash BETWEEN sink commit and checkpoint commit replays
    the batch, and the replay overwrites instead of doubling (pinned by
    tests/test_pyds_stream.py).  Same shared-filesystem deployment
    assumption as :class:`JsonlSinkWriter`; micro-batches execute
    serially, so the orphan-``.tmp`` sweep cannot race a concurrent
    batch."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_jsonl_partition(self.path, iterator)

    def commit(self, messages, batchId):
        import glob
        import os

        # replay idempotence: a re-run of this batch replaces its output
        for stale in glob.glob(os.path.join(self.path, f"batch-{batchId:08d}-*.jsonl")):
            os.remove(stale)
        renamed = set()
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"batch-{batchId:08d}-{i:05d}.jsonl")
            os.rename(m.tmp_path, final)
            renamed.add(m.tmp_path)
        # sweep retry orphans (succeeded-after-retry tasks leave their
        # failed attempt's .tmp with no commit message naming it)
        for orphan in glob.glob(os.path.join(self.path, "*.jsonl.tmp")):
            if orphan not in renamed:
                try:
                    os.remove(orphan)
                except OSError:
                    pass

    def abort(self, messages, batchId):
        _remove_staged(messages)
