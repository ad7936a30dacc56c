"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator, batch + streaming.

Why the engine ships one: the reference's source surface is fixed
(Postgres JDBC, CSV in an object store — SURVEY.md §2.1); a Spark-4
engine's source surface is *extensible*, and this module is the
engine's worked example — the idioms a user copies to wrap any
in-house feed (an internal API, a message log, a proprietary format)
as a first-class ``spark.read.format(...)`` table:

* **partition planning** — ``partitions()`` splits the row space into
  contiguous ranges; each range generates independently on its
  executor (no driver data movement, scales with the cluster);
* **filter pushdown** (4.1 ``pushFilters``) — range predicates on
  ``event_id`` narrow the generated row space BEFORE partition
  planning, so a selective filter prunes whole partitions instead of
  generating-then-discarding;
* **Arrow batches** — ``read()`` yields ``pyarrow.RecordBatch``, the
  vectorized path (one Arrow buffer per ~64k rows crosses the
  Python→JVM boundary, never per-row pickled tuples);
* **replayable streaming** — the stream reader's offset is simply the
  row counter, so any (start, end] micro-batch regenerates bit-equal
  rows: exactly the contract Structured Streaming needs from a
  replayable source for end-to-end exactly-once.

Generation is splitmix64-style integer mixing (public-domain finalizer
constants), vectorized in numpy uint64 — deterministic across runs,
partitionings and machines, with no RNG state to share between
executors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # imported lazily in workers otherwise
    import pyarrow as pa

SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE"
)
#: cumulative per-mille thresholds for event types (view 40%, click
#: 30%, purchase 15%, error 10%, signup 5%).
_TYPE_CUM = ((400, "view"), (700, "click"), (850, "purchase"), (950, "error"), (1000, "signup"))
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def _mix(ids):
    """splitmix64 finalizer over a numpy uint64 array."""
    import numpy as np

    x = ids.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _generate(start: int, end: int, n_users: int, gap_us: int) -> "pa.RecordBatch":
    """Rows [start, end) as one Arrow RecordBatch."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(start, end, dtype=np.uint64)
    h1 = _mix(ids)
    h2 = _mix(ids + np.uint64(1) << np.uint64(33))
    h3 = _mix(ids + np.uint64(3) << np.uint64(34))
    h4 = _mix(ids + np.uint64(7) << np.uint64(35))
    user_id = (h1 % np.uint64(n_users)).astype(np.int64)
    type_idx = (h2 % np.uint64(1000)).astype(np.int64)
    event_type = np.empty(len(ids), dtype=object)
    lo = 0
    for cum, name in _TYPE_CUM:
        mask = (type_idx >= lo) & (type_idx < cum)
        event_type[mask] = name
        lo = cum
    value = (h3 % np.uint64(10000)).astype(np.float64) / 100.0
    jitter = (h4 % np.uint64(gap_us)).astype(np.int64)
    ts_us = _EPOCH_2024_US + ids.astype(np.int64) * gap_us + jitter
    return pa.record_batch(
        [
            pa.array(ids.astype(np.int64)),
            pa.array(ts_us, type=pa.timestamp("us")),
            pa.array(user_id),
            pa.array(event_type, type=pa.string()),
            pa.array(value),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _Options:
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.n_users = int(options.get("n_users", 50))
        self.gap_us = int(options.get("gap_us", 1_000_000))
        self.batch_rows = int(options.get("batch_rows", 65_536))


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.o = _Options(options)
        self.lo = 0
        self.hi = self.o.n_rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Claim range predicates on event_id (event_id IS the row
        index, so narrowing [lo, hi) applies them exactly); everything
        else is yielded back for Spark to evaluate post-scan."""
        for f in filters:
            col = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if col == ("event_id",) and isinstance(val, int):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, val + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, val)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, val)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, val + 1)
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, val)
                    self.hi = min(self.hi, val + 1)
                else:
                    yield f
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.o.n_partitions)
        span = hi - lo
        step = max(1, -(-span // n)) if span else 1
        parts = [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]
        # an empty (fully pruned) range still needs one no-op split
        return parts or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        if partition.end > partition.start:
            step = self.o.batch_rows
            for s in range(partition.start, partition.end, step):
                yield _generate(
                    s, min(s + step, partition.end), self.o.n_users, self.o.gap_us
                )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Replayable micro-batch source: the offset is the global row
    counter; (start, end] regenerates deterministically, so restart
    and replay produce bit-equal batches."""

    def __init__(self, options: dict):
        self.o = _Options(options)
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # bounded feed: advance one micro-batch per poll, up to n_rows —
        # an uncapped offset would make processAllAvailable() spin forever
        self._latest = min(self._latest + self.rows_per_batch, self.o.n_rows)
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["row"], end["row"]
        n = max(1, self.o.n_partitions)
        step = max(1, -(-(hi - lo) // n))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        if partition.end > partition.start:
            yield _generate(
                partition.start, partition.end, self.o.n_users, self.o.gap_us
            )

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — regeneration is the log


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Make ``spark.read.format("synthetic_events")`` and
    ``df.write.format("manifest_parquet")`` available."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(ManifestParquetSink)


# ---------------------------------------------------------------------------
# Custom Python SINK: manifest-committed parquet (batch + streaming).
# ---------------------------------------------------------------------------
@dataclass
class _ParquetCommit(WriterCommitMessage):
    staged: str
    rows: int


class _ManifestWriterBase:
    """Shared task-side write + driver-side commit mechanics.

    Protocol (the classic two-phase file commit, driver-arbitrated):

    1. each task writes its batches to ``<path>/_staging/<uuid>.parquet``
       — NEVER to the final name, so a failed/retried/zombie task can
       leave only garbage in ``_staging``, invisible to readers;
    2. the driver, once ALL tasks succeed, renames every staged file to
       a final ``part-*`` name and then writes the MANIFEST (the list
       of committed files) via write-temp-then-atomic-rename;
    3. readers list the manifest, not the directory — a crash between
       renames publishes nothing, because visibility is the manifest
       write, which is a single atomic rename.

    This is the same design as a table format's commit log (and what
    ``io/jdbc``'s delete+insert upsert does transactionally): on local
    or HDFS-like storage rename is atomic; on S3-like stores step 2
    becomes a conditional PUT of the manifest — the structure is
    unchanged, which is why the manifest (not directory listing) is
    the only read path."""

    def __init__(self, options: dict):
        self._path = options.get("path") or options.get("dsPath")
        if not self._path:
            raise ValueError("manifest_parquet sink requires a path option")

    # -- task side ---------------------------------------------------
    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staging = os.path.join(self._path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"{uuid.uuid4().hex}.parquet")
        batches = list(iterator)
        rows = sum(b.num_rows for b in batches)
        if batches:
            pq.write_table(pa.Table.from_batches(batches), fname)
            return _ParquetCommit(staged=fname, rows=rows)
        return _ParquetCommit(staged="", rows=0)

    # -- driver side helpers ----------------------------------------
    def _publish(
        self,
        messages,
        manifest_name: str,
        extra_files: tuple = (),
        extra_rows: int = 0,
    ) -> list:
        """Rename staged files into place, then atomically publish the
        manifest. ``extra_files``/``extra_rows`` carry a prior
        generation forward (append merges, never unlists). Returns the
        full committed file list."""
        import json
        import os

        final_files, total = list(extra_files), extra_rows
        for i, m in enumerate(m for m in messages if m and m.staged):
            final = os.path.join(
                self._path, f"part-{i:05d}-{os.path.basename(m.staged)}"
            )
            os.replace(m.staged, final)
            final_files.append(os.path.basename(final))
            total += m.rows
        tmp = os.path.join(self._path, f"._{manifest_name}.tmp")
        with open(tmp, "w") as f:
            json.dump({"files": sorted(final_files), "rows": total}, f)
        os.replace(tmp, os.path.join(self._path, manifest_name))
        return final_files

    def _clean_staged(self, messages) -> None:
        import os

        for m in messages:
            if m and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


class ManifestParquetWriter(_ManifestWriterBase, DataSourceArrowWriter):
    """Batch writer: one manifest (``_manifest.json``) per write.

    Append merges the prior generation's file list into the new
    manifest (the fixed manifest name is replaced atomically, so a
    second append never unlists — and a later vacuum never deletes —
    the first generation's data). Overwrite publishes the NEW manifest
    first (the atomic visibility flip), then deletes the files it
    unreferenced plus stale per-micro-batch streaming manifests; a
    crash mid-delete leaves only invisible, vacuumable orphans, never
    a live manifest pointing at deleted files."""

    def __init__(self, options: dict, overwrite: bool):
        super().__init__(options)
        self._overwrite = overwrite

    def commit(self, messages) -> None:
        import glob as _glob
        import json
        import os

        if not self._overwrite:
            prior_files, prior_rows = [], 0
            old = os.path.join(self._path, "_manifest.json")
            if os.path.exists(old):
                with open(old) as f:
                    d = json.load(f)
                prior_files, prior_rows = d["files"], d.get("rows", 0)
            self._publish(
                messages,
                "_manifest.json",
                extra_files=tuple(prior_files),
                extra_rows=prior_rows,
            )
            return

        # overwrite: snapshot the pre-overwrite view, flip visibility
        # atomically, THEN clean what the flip unreferenced
        old_manifests = _glob.glob(
            os.path.join(self._path, "_manifest*.json")
        )
        old_files: set = set()
        for mf in old_manifests:
            with open(mf) as f:
                old_files.update(json.load(f)["files"])
        new_files = self._publish(messages, "_manifest.json")
        for mf in old_manifests:
            if os.path.basename(mf) != "_manifest.json":
                os.remove(mf)  # stale streaming manifests
        for fn in old_files - set(new_files):
            p = os.path.join(self._path, fn)
            if os.path.exists(p):
                os.remove(p)

    def abort(self, messages) -> None:
        self._clean_staged(messages)


class ManifestParquetStreamWriter(_ManifestWriterBase, DataSourceStreamArrowWriter):
    """Streaming writer: one manifest per micro-batch
    (``_manifest-<batchId>.json``) — idempotent on batch replay, which
    upgrades Structured Streaming's at-least-once task execution to
    exactly-once FILE visibility: a replayed batch finds its manifest
    already present and publishes nothing twice."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import os

        manifest = f"_manifest-{batchId:08d}.json"
        if os.path.exists(os.path.join(self._path, manifest)):
            self._clean_staged(messages)  # replay of a committed batch
            return
        self._publish(messages, manifest)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        self._clean_staged(messages)


class ManifestParquetSink(DataSource):
    """``df.write.format("manifest_parquet").option("path", ...)`` —
    the write-side twin of ``SyntheticEventsDataSource`` (SURVEY.md
    §2.1 extensible-connector surface): Arrow record batches out of
    the JVM, two-phase manifest commit for atomic visibility."""

    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def schema(self):
        # read side: the committed data defines the schema — take it
        # from the first referenced file's parquet footer (no row reads)
        import glob as _glob
        import json
        import os

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path") or self.options.get("dsPath")
        for mf in sorted(_glob.glob(os.path.join(path or "", "_manifest*.json"))):
            with open(mf) as f:
                files = json.load(f)["files"]
            if files:
                arrow = pq.read_schema(os.path.join(path, files[0]))
                return from_arrow_schema(arrow)
        raise ValueError(
            "manifest_parquet: no committed manifest under "
            f"{path!r} to derive a schema from"
        )

    def writer(self, schema, overwrite: bool) -> ManifestParquetWriter:
        return ManifestParquetWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> ManifestParquetStreamWriter:
        return ManifestParquetStreamWriter(self.options)

    def streamReader(self, schema) -> "ManifestParquetStreamReader":
        return ManifestParquetStreamReader(self.options)


def read_manifest_parquet(spark, path: str, up_to_batch: int | None = None):
    """Read back ONLY the manifest-committed files of a sink directory
    (the sink's read contract — directory listings see staged garbage;
    the manifest never does). Batch manifests and per-micro-batch
    manifests union transparently.

    ``up_to_batch`` is streaming-sink TIME TRAVEL: include only
    micro-batch manifests with batchId ≤ the bound (each committed
    micro-batch is a retained generation, so any prefix of the stream
    is reconstructable for audits/backfills — and stays valid because
    ``vacuum_manifest_parquet`` deletes only UNreferenced files).
    Batch-mode writes keep a single merged ``_manifest.json`` (always
    included): batch append/overwrite intentionally retains no
    generations — that is what makes overwrite's post-flip cleanup and
    vacuum safe."""
    import glob as _glob
    import json
    import os
    import re

    files: list[str] = []
    for mf in sorted(
        _glob.glob(os.path.join(path, "_manifest*.json"))
    ):
        if up_to_batch is not None:
            m = re.match(r"_manifest-(\d+)\.json$", os.path.basename(mf))
            if m and int(m.group(1)) > up_to_batch:
                continue
        with open(mf) as f:
            files.extend(os.path.join(path, fn) for fn in json.load(f)["files"])
    if not files:
        # no committed file anywhere → no schema to derive; guessing a
        # schema would silently break schema-dependent callers on an
        # empty-but-valid sink of any other dataset
        raise ValueError(
            f"manifest_parquet: no committed data files under {path!r}; "
            "an empty sink has no derivable schema — write a batch "
            "first or read with an explicit schema via spark.read"
        )
    return spark.read.parquet(*files)


def vacuum_manifest_parquet(path: str) -> list[str]:
    """Delete every file under ``path`` that NO manifest references —
    leftover ``_staging`` garbage from failed/zombie tasks and data
    files orphaned by an overwrite that crashed mid-clean. Returns the
    deleted paths.

    The sink's visibility rule (readers list the manifest, never the
    directory) makes orphans harmless but not free — at 100 TB failed
    attempts accumulate real storage. Vacuum is safe BECAUSE of the
    commit protocol: anything unreferenced is by definition invisible,
    so deleting it cannot change any reader's view. (Production adds a
    grace period for in-flight writers — a staged file younger than
    the slowest plausible task might still get committed; the same
    rule every table format's vacuum applies.)"""
    import glob as _glob
    import json
    import os

    referenced: set[str] = set()
    for mf in _glob.glob(os.path.join(path, "_manifest*.json")):
        with open(mf) as f:
            referenced.update(json.load(f)["files"])
    deleted = []
    for fp in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        if os.path.basename(fp) not in referenced:
            os.remove(fp)
            deleted.append(fp)
    staging = os.path.join(path, "_staging")
    if os.path.isdir(staging) and not os.listdir(staging):
        os.rmdir(staging)
    return sorted(deleted)


class ManifestParquetStreamReader(DataSourceStreamReader):
    """Stream the sink's COMMITTED output, manifest by manifest: the
    offset is the count of manifests consumed (the manifest list is
    append-only for a streaming sink directory), each micro-batch
    reads exactly the files its new manifests reference, as Arrow
    batches in executors.

    This closes the connector lifecycle: a feed written through the
    manifest sink is immediately re-streamable — downstream jobs tail
    the directory with exactly-once semantics inherited from the
    manifest protocol (a half-written data file is invisible until its
    manifest lands; a manifest is a single atomic rename). Offsets are
    a manifest-NAME high-water mark, so a fixed (start, end] always
    names the same files regardless of later arrivals. Contract: new
    manifests must sort after consumed ones — true for the streaming
    sink's zero-padded ``_manifest-<batchId>`` names; a batch-mode
    ``_manifest.json`` is picked up only if present before the first
    poll (it sorts after every batch-numbered name).
    """

    def __init__(self, options: dict):
        self._path = options.get("path") or options.get("dsPath")
        if not self._path:
            raise ValueError("manifest_parquet stream requires a path option")

    def _manifests(self) -> list[str]:
        import glob as _glob
        import os

        return sorted(
            _glob.glob(os.path.join(self._path, "_manifest*.json"))
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        names = self._manifests()
        import os

        return {"last": os.path.basename(names[-1]) if names else ""}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        import json
        import os

        batch = [
            mf
            for mf in self._manifests()
            if start["last"] < os.path.basename(mf) <= end["last"]
        ]
        parts = []
        for mf in batch:
            with open(mf) as f:
                files = json.load(f)["files"]
            if files:
                parts.append(
                    _FileListPartition(
                        tuple(os.path.join(self._path, fn) for fn in files)
                    )
                )
        return parts or [_FileListPartition(())]

    def read(self, partition: "_FileListPartition"):
        import pyarrow.parquet as pq

        for fp in partition.files:
            yield from pq.ParquetFile(fp).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # manifests are the durable log; nothing to acknowledge


@dataclass
class _FileListPartition(InputPartition):
    files: tuple
