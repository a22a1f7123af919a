"""``lake_cdf`` — the table's change feed as a NATIVE Structured Streaming
source (Spark 4 Python Data Source API):

    from cdm_to_mods_spark.streaming.source import register_lake_cdf
    register_lake_cdf(spark)
    feed = (spark.readStream.format("lake_cdf")
                 .option("path", "/lake/transcripts").load())
    feed.writeStream.foreachBatch(...).option("checkpointLocation", ck).start()

This is the Delta ``readStream``-on-a-table analog for this engine: any
downstream Spark pipeline tails the table's committed change rows with
ordinary checkpointed exactly-once semantics — no polling loop, no custom
consumer (``plans/feed.py`` remains the non-streaming/driver-light path).

PartitionedTable paths stream too (detected by ``_spec.json``): offsets
become GLOBAL versions, each planned batch expands to the per-partition
sub-version spans its global cuts pin (same drop/recreate fail-loud
contract as the batch feed), ``_version`` carries the GLOBAL commit, and
each planned file set ships its partition's pinned schema/rename state so
months appearing mid-stream need no restart. Both ``cdf`` and
``row_changes`` modes work; ``initialSnapshot`` is flat-only (seed from
``PartitionedTable.read()`` instead).

Mechanics — offsets ARE ledger versions:

* ``initialOffset``/``latestOffset`` read the version-file ledger with
  plain file IO (the data source runtime runs in Python workers with NO
  SparkSession; everything here is json + pyarrow).
* ``partitions(start, end)`` lists each version's committed ``cdf`` file
  sets — one input partition per file set, so a micro-batch spanning many
  versions/buckets scans in parallel across executors.
* ``read(partition)`` yields Arrow RecordBatches straight from the parquet
  bytes (no per-row Python), cast per the file set's recorded ``schema_id``
  to the feed schema exactly like :meth:`LakeTable.changes` casts — through
  the rename log, add-columns null-filled — plus a ``_version`` column.

Semantics match ``changes()``: merge-on-read versions (or cow with
``cow_change_feed``) stream their resolved change rows including ``_seq``
and ``_deleted``; cow versions without change files fail the batch with
the same error ``changes()`` raises; expired versions raise with a
re-seed instruction. The feed schema is fixed at query start (head
canonical schema) — restart the stream to pick up later column adds, the
same contract Delta's CDF stream has.

Options: ``path`` (required); ``mode`` — ``"cdf"`` (default; the
replication feed above) or ``"row_changes"``: stream the TYPED row-level
changelog instead (the Delta CDF-stream ``_change_type`` shape — see
:meth:`LakeTable.row_changes`): canonical columns + ``_seq`` +
``_change_type`` (insert / update_preimage / update_postimage / delete)
+ ``_version``. Row-changes mode serves kind-marked changelog records
(including the derive fast paths — bootstrap/first-load inserts and
delete_where pre-images are read from the commit's own change files with
the constant type injected, never re-materialized); a state-changing
version committed WITHOUT ``changelog="lookup"`` (or any rollback) fails
the batch with a marked error (:func:`is_changelog_unavailable_failure`)
— the streaming face of ``ChangelogUnavailableError``, because silently
skipping it would desynchronize every retraction-maintained consumer.
``startingVersion`` — first UNCONSUMED
version floor: ``"earliest"`` (default; the whole retained feed) or a
version number N (consume strictly-after N, mirroring ``changes(N)``);
``initialSnapshot`` — snapshot-then-tail (the Delta
``readStream``-on-a-table initial-snapshot semantics): the FIRST
micro-batch delivers the table's RESOLVED live state at the version
pinned at query start (one partition per bucket, resolved executor-side
by the batch source's shared Arrow path — rows keep their stored
``_seq``, ``_deleted`` false, ``_version`` = the pinned version), later
batches tail changes strictly after it. This closes the retention gap:
a consumer bootstrapping a mirror of a long-lived table whose EARLY
feed history was expired cannot start from ``earliest`` (expired-range
error), but snapshot+tail needs only the current state plus the feed
from now on. The snapshot is ONE micro-batch regardless of
``maxVersionsPerTrigger`` (admission control resumes at the tail
phase); cdf mode only; whole-row engines only (lww/first_row — the
column-level engines bootstrap from ``LakeTable.read()``). Restart
replans the pinned version from the offset log, exactly-once as usual;
``maxVersionsPerTrigger`` — admission control, the Delta
``maxFilesPerTrigger`` / Iceberg ``streaming-max-files-per-micro-batch``
analog at this ledger's natural granularity (offsets are whole versions,
so a version is never split across batches). Without it a consumer
starting from ``earliest`` on a long-retained table gets the ENTIRE
backlog as one micro-batch — at 10^10 events that single batch is the
scale-killer; with it the backfill drains as bounded, checkpointed steps.

Rate-limit mechanics (the Python Data Source API has no
``SupportsAdmissionControl`` — ``latestOffset()`` takes no start/limit —
so the cap lives in reader state, in the python runner process): the
reader tracks ``floor`` = a MONOTONIC high-water mark of offsets Spark
has planned or committed, and ``latestOffset`` answers
``min(head, floor + N)``. Two call-order facts, established by tracing
the runner (see ``_trace``), shape where the floor syncs:

- ``latestOffset`` for trigger K+1 can arrive BEFORE ``commit`` of
  trigger K, and Spark adopts whatever ``latestOffset`` returns as the
  next offset-log entry even when it is BEHIND the last one — answering
  below an already-planned offset rewinds the log and re-delivers those
  versions. So the floor syncs in ``partitions(start, end)`` on ``end``
  (the offset Spark is committing to, available strictly before the
  next planning round), monotonically, never on ``start``.
- On a fresh start ``latestOffset`` fires BEFORE ``initialOffset``, so
  the first call of a reader's life adopts ``startingVersion`` as the
  floor (fresh offset log ⇒ that IS the exact consumed floor). On a
  checkpoint restart Spark re-plans the recovered batch —
  ``partitions(committed, committed)`` — before its first
  ``latestOffset``, so the floor is exact there too and the cap holds
  across restarts with no stall and no rewind.

``trigger(availableNow=True)`` caveat: the Python API predates
AvailableNow, so Spark falls back to SINGLE-batch execution — a capped
query processes ONE bounded batch per ``start()`` and terminates.
Draining a backlog that way takes repeated starts on the same
checkpoint; :func:`mirror_stream` does that loop itself when both
``available_now`` and ``max_versions_per_trigger`` are set.

Schema evolution mid-stream: the reader pins the source's schema and
rename log at query start; a version written under a LATER schema_id
cannot be resolved against that pinned state without silently dropping
the new column (or mis-applying a newer rename) from the feed, so
planning such a version FAILS the query with a marked error
(``is_schema_evolution_failure``) — Delta CDF's behavior on schema
change. Restarting re-pins the head schema and replans the failed batch
exactly-once; ``mirror_stream``'s bounded drain restarts itself, so a
mirrored replica adopts source evolutions automatically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..plans.lake import LakeTable, _stored_name
from ..schemas import DELETED_COL, SEQ_COL, schema_from_json

VERSION_COL = "_version"
CHANGE_TYPE_COL = "_change_type"
# optional (.option("includeCommitTs", "true")): each change row carries its
# version's commit timestamp in epoch-millis — the Debezium ts_ms analog,
# stamped from the manifest driver-side (no per-row work, no extra scan).
COMMIT_TS_COL = "_commit_ts"


def parse_offset_version(offset_str: str) -> int:
    """Extract the version from a progress-report offset string. Spark
    round-trips Python-source offsets through the JVM as the dict's
    ``str()`` (single quotes), so ``lastProgress['sources'][0]['endOffset']``
    is not always valid JSON — accept both spellings."""
    import ast
    import json

    try:
        d = json.loads(offset_str)
    except json.JSONDecodeError:
        d = ast.literal_eval(offset_str)
    return int(d["version"])


def _trace(msg: str) -> None:
    """Debug hook: append reader-lifecycle events to $LAKE_CDF_TRACE.
    The stream reader runs in a separate python runner process, so
    ordinary logging/monkeypatching from the driver can't observe it."""
    p = os.environ.get("LAKE_CDF_TRACE")
    if p:
        with open(p, "a") as fh:
            fh.write(f"pid={os.getpid()} {msg}\n")


# ---------------------------------------------------------- ledger file IO
def _ledger_versions(table_path: str) -> list[int]:
    led = os.path.join(table_path, "_ledger")
    if not os.path.isdir(led):
        raise FileNotFoundError(f"no lake table at {table_path}")
    return sorted(
        int(f[1:-5])
        for f in os.listdir(led)
        if f.startswith("v") and f.endswith(".json")
    )


def _load_version(table_path: str, v: int) -> dict:
    with open(os.path.join(table_path, "_ledger", f"v{v:08d}.json")) as fh:
        return json.load(fh)


def _cdf_entries(table_path: str, v: int, lo: int, hi: int) -> list[dict]:
    """Version ``v``'s change-file sets, with the SAME guard rails as
    LakeTable.changes (expired → re-seed error; feed-less cow → error)."""
    try:
        m = _load_version(table_path, v)
    except FileNotFoundError:
        raise RuntimeError(
            f"change feed for ({lo}, {hi}] needs version {v}, which was "
            "removed by expire_snapshots — re-seed the consumer from a "
            "snapshot read and restart the stream from a later "
            "startingVersion"
        ) from None
    # typed-changelog records (kind-marked) belong to row_changes, not the
    # replication feed this source streams
    plain = [e for e in m.get("cdf", []) if "kind" not in e]
    if (
        m.get("metrics", {}).get("mode") == "cow"
        and not plain
        and m.get("metrics", {}).get("n_buckets_touched", 1) > 0
    ) or m.get("metrics", {}).get("cow_without_cdf"):
        raise RuntimeError(
            f"version {v} was (or contains) a copy-on-write commit without "
            "change-data files; use merge-on-read or cow_change_feed=True"
        )
    return plain


_EVOLVED_MARKER = "lake_cdf: source schema evolved mid-stream"
_NO_CHANGELOG_MARKER = "lake_cdf: typed changelog unavailable"


def is_schema_evolution_failure(exc: BaseException) -> bool:
    """True when a streaming-query failure is the mid-stream evolution
    guard firing (the marker survives Spark's exception wrapping)."""
    return _EVOLVED_MARKER in str(exc)


def is_changelog_unavailable_failure(exc: BaseException) -> bool:
    """True when a row-changes stream failed because a version in the
    planned range changed table state without a typed changelog — the
    streaming face of :class:`ChangelogUnavailableError` (re-seed the
    consumer from a snapshot and restart past that version)."""
    return _NO_CHANGELOG_MARKER in str(exc)


def _changelog_entries(table_path: str, v: int, lo: int, hi: int) -> list[dict]:
    """Version ``v``'s kind-marked changelog file sets — the pure-file-IO
    mirror of :meth:`LakeTable.row_changes`' per-version guards (the
    reader runs in the python runner with no SparkSession)."""
    try:
        m = _load_version(table_path, v)
    except FileNotFoundError:
        raise RuntimeError(
            f"row-changes feed for ({lo}, {hi}] needs version {v}, which "
            "was removed by expire_snapshots — re-seed the consumer from a "
            "snapshot read and restart the stream from a later "
            "startingVersion"
        ) from None
    entries = [e for e in m.get("cdf", []) if "kind" in e]
    if not entries:
        # ONE owner for the state-changing classification (divergence from
        # the batch reader would desynchronize retraction consumers)
        if LakeTable.version_changed_state(m):
            raise RuntimeError(
                f"{_NO_CHANGELOG_MARKER}: version {v} changed table state "
                "but carries no typed changelog — it was committed without "
                "changelog='lookup' (or is a rollback); re-seed the "
                "consumer from a snapshot read"
            )
    return entries


class _SnapshotPartition(InputPartition):
    """One bucket of the initial snapshot (``initialSnapshot`` option):
    the bucket's whole base+delta chain at the pinned version, resolved
    executor-side to live rows via the batch source's shared Arrow
    resolution. ``file_sets`` is (abs dir, schema_id, unresolved)."""

    def __init__(
        self, bucket: int, file_sets: list, version: int, engine: str,
        key_cols: list, commit_ms: int | None,
    ) -> None:
        self.bucket = bucket
        self.file_sets = file_sets
        self.version = version
        self.engine = engine
        self.key_cols = key_cols
        self.commit_ms = commit_ms


class _CDFPartition(InputPartition):
    def __init__(
        self, path: str, schema_id: int, version: int,
        commit_ms: int | None = None, kind: str | None = None,
    ) -> None:
        self.path = path
        self.schema_id = schema_id
        self.version = version
        self.commit_ms = commit_ms
        # row-changes mode: the manifest entry's changelog kind
        # ("changelog" = materialized records with a stored _change_type;
        # "changelog_derive_insert"/"changelog_derive_delete" = the commit's
        # own change files re-labeled with a constant type)
        self.kind = kind


class _PartCDFPartition(_CDFPartition):
    """A change-file set of ONE sub-table of a PartitionedTable, planned
    against a GLOBAL version. Carries its partition's pinned schema/rename
    state INSIDE the partition (not on the reader): partitions appear
    mid-stream (a new month), and state pinned lazily on the driver after
    the reader was first pickled would be invisible executor-side."""

    def __init__(self, path, schema_id, version, commit_ms, kind,
                 schema_json: str, renames: list) -> None:
        super().__init__(path, schema_id, version, commit_ms, kind)
        # only the ONE schema this file set was written under rides along
        # (read() resolves just schemas[schema_id]): shipping the whole
        # append-only schema list duplicated O(schemas x file-sets)
        # JSON through partition serialization every trigger
        self.schema_json = schema_json
        self.renames = renames


def _g_versions(table_path: str) -> list[int]:
    """Main-namespace GLOBAL versions of a PartitionedTable ledger."""
    led = os.path.join(table_path, "_ledger")
    if not os.path.isdir(led):
        raise FileNotFoundError(f"no partitioned table at {table_path}")
    return sorted(
        int(f[1:-5])
        for f in os.listdir(led)
        if f.startswith("g") and f.endswith(".json") and f[1:-5].isdigit()
    )


def _g_load(table_path: str, g: int) -> dict:
    with open(os.path.join(table_path, "_ledger", f"g{g:08d}.json")) as fh:
        return json.load(fh)


def _is_partitioned(table_path: str) -> bool:
    return os.path.exists(os.path.join(table_path, "_spec.json"))


class _CDFStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table_path: str,
        spark_schema,
        starting: str,
        max_versions: int | None,
        include_commit_ts: bool = False,
        mode: str = "cdf",
        initial_snapshot: bool = False,
    ) -> None:
        self._path = table_path
        self._spark_schema = spark_schema
        self._include_commit_ts = include_commit_ts
        self._mode = mode
        # PartitionedTable: offsets are GLOBAL versions, each planned batch
        # expands to the per-partition sub-version spans its cuts pin
        self._partitioned = _is_partitioned(table_path)
        if self._partitioned:
            if initial_snapshot:
                raise ValueError(
                    "initialSnapshot is not supported on a partitioned "
                    "table — seed from PartitionedTable.read() and tail "
                    "from the head version"
                )
            versions = _g_versions(table_path)
            self._renames = None
            self._schemas = None
            # {part: {"schemas": [...], "renames": [...]}} — pinned lazily
            # per partition at first encounter (new months appear
            # mid-stream); shipped inside each planned partition object
            self._part_state: dict[str, dict] = {}
        else:
            versions = _ledger_versions(table_path)
            head = _load_version(table_path, versions[-1])
            # schema resolution state pinned at query start, like the schema
            self._renames = head.get("renames", [])
            self._schemas = head["schemas"]
        # snapshot-then-tail (Delta readStream-on-a-table semantics): the
        # FIRST micro-batch is the resolved table state at the version
        # pinned at query start, later batches tail changes strictly
        # after it — closes the retention gap (a mirror of a long-lived
        # table whose early feed history expired can still bootstrap).
        # Done state flips when the snapshot batch is planned/committed;
        # on restart the pinned version is recovered from the OFFSET LOG
        # (partitions() keys off the logged end offset), never from this
        # constructor, so a restart replans the same snapshot exactly.
        self._snap_done = not initial_snapshot
        if initial_snapshot:
            self._start = versions[-1]
        elif starting == "earliest":
            # everything the retained ledger can serve CONTIGUOUSLY from
            # the head. Retention pins tagged cuts and live-branch fork
            # points, so the ledger can hold ISLANDS below an expired gap
            # (e.g. {1, 4, 5} after a tag on 1) — starting at the raw
            # minimum would walk the gap on first planning and raise
            # SnapshotExpiredError on every fresh checkpoint, wedging the
            # default option even though the tail is fully serveable.
            # Flat: strictly after the floor below the earliest version
            # of the contiguous tail (each version's cdf entries are
            # self-contained). Partitioned: the earliest tail cut itself
            # is the baseline — its sub-span expansion needs the
            # PREVIOUS cut's parts, which retention removed — so the
            # stream starts strictly after it (a create-cut v0 pins no
            # parts, so nothing is skipped on a fresh table; after
            # expiry the skipped cut's changes belong to the expired
            # prefix).
            tail = versions[-1]
            for v in reversed(versions[:-1]):
                if v != tail - 1:
                    break
                tail = v
            self._start = tail if self._partitioned else tail - 1
        else:
            self._start = int(starting)
        if max_versions is not None and max_versions < 1:
            raise ValueError(
                f"maxVersionsPerTrigger must be >= 1, got {max_versions}"
            )
        self._max_versions = max_versions
        # admission-control state (module docstring, "Rate-limit mechanics"):
        # floor = monotonic high-water mark of every offset Spark has
        # planned (partitions' end) or committed — never rewinds, so
        # latestOffset can never answer behind an offset already in the log
        self._floor: int | None = None

    # offsets are plain dicts (JSON) — {"version": last consumed}; with
    # initialSnapshot the first pair also carries a "snap" phase marker
    # ("pending" start → "done" end = the snapshot batch)
    def initialOffset(self) -> dict:
        # Spark only asks for this on a FRESH start (empty offset log), so
        # startingVersion is the exact floor — but note latestOffset fires
        # first even then (module docstring), so this is usually a no-op.
        self._sync_floor(self._start)
        if not self._snap_done:
            _trace(f"initialOffset -> {self._start} (snapshot pending)")
            return {"version": self._start, "snap": "pending"}
        _trace(f"initialOffset -> {self._start}")
        return {"version": self._start}

    def latestOffset(self) -> dict:
        if not self._snap_done and self._floor is None:
            # fresh start in snapshot mode: the first batch IS the
            # snapshot at the pinned version, whatever the cap says
            # (admission control resumes at the tail phase)
            _trace(f"latestOffset -> {self._start} (snapshot batch)")
            return {"version": self._start, "snap": "done"}
        head = (
            _g_versions(self._path)
            if self._partitioned
            else _ledger_versions(self._path)
        )[-1]
        if self._max_versions is None:
            _trace(f"latestOffset -> {head} (uncapped)")
            return {"version": head}
        if self._floor is None:
            # first call of this reader's life: a fresh start (the offset
            # log is empty and initialOffset hasn't been consulted yet), so
            # startingVersion IS the consumed floor. On restart this branch
            # is unreachable — Spark re-plans the recovered batch first and
            # partitions() has already pinned the exact floor.
            self._floor = self._start
        out = min(head, self._floor + self._max_versions)
        _trace(f"latestOffset -> {out} (head={head} floor={self._floor})")
        return {"version": out}

    def _sync_floor(self, planned: int) -> None:
        if self._floor is None or planned > self._floor:
            self._floor = planned

    def partitions(self, start: dict, end: dict):
        if end.get("snap") == "done" and start.get("snap") == "pending":
            # the snapshot batch — keyed off the LOGGED end offset, so a
            # restart replans the exact same pinned version even though
            # this reader instance pinned a newer head at construction
            self._sync_floor(end["version"])
            self._snap_done = True
            _trace(f"partitions(snapshot @ {end['version']})")
            return self._snapshot_partitions(end["version"])
        self._snap_done = True  # tail planning ⇒ the snapshot is behind us
        lo, hi = start["version"], end["version"]
        _trace(f"partitions({lo}, {hi})")
        # `end` is now in Spark's offset log: it is the floor for every
        # later planning round (commit() may lag the next latestOffset)
        self._sync_floor(hi)
        if self._partitioned:
            return self._g_partitions(lo, hi)
        parts: list[_CDFPartition] = []
        for v in range(lo + 1, hi + 1):
            # per-version commit timestamp (ms) for COMMIT_TS_COL readers —
            # one tiny manifest read per version, never a data scan; only
            # paid when the option asked for the column
            commit_ms = (
                int(_load_version(self._path, v).get("commit_ts", 0.0) * 1000)
                if self._include_commit_ts
                else None
            )
            entries = (
                _changelog_entries(self._path, v, lo, hi)
                if self._mode == "row_changes"
                else _cdf_entries(self._path, v, lo, hi)
            )
            for fs in entries:
                if fs["schema_id"] >= len(self._schemas):
                    # the source evolved AFTER this reader pinned its
                    # schema/rename state: resolving the new file set
                    # against the pinned schema would silently DROP the
                    # added column (or mis-resolve a newer rename/widen)
                    # from the feed — fail loudly instead, exactly like
                    # Delta's CDF stream on schema change. A restart
                    # re-pins the head schema and REPLANS this batch, so
                    # nothing is lost (mirror_stream's bounded drain does
                    # that restart itself).
                    raise RuntimeError(
                        f"{_EVOLVED_MARKER}: version {v} was written under "
                        f"schema_id {fs['schema_id']} but this stream "
                        f"pinned {len(self._schemas)} schema(s) at start — "
                        "restart the stream to adopt the evolved schema"
                    )
                parts.append(
                    _CDFPartition(
                        os.path.join(self._path, fs["path"]),
                        fs["schema_id"],
                        v,
                        commit_ms,
                        kind=fs.get("kind"),
                    )
                )
        return parts

    def _pin_part(self, part: str, pdir: str) -> dict:
        """Pin one partition's schema/rename state at its CURRENT sub head
        (both lists are append-only, so a head pin resolves every older
        schema_id too). A partition whose canonical fields are not all in
        this stream's pinned query schema fails with the evolution marker
        — silently null-dropping its extra columns would desynchronize the
        consumer exactly like a flat mid-stream evolution."""
        state = self._part_state.get(part)
        if state is not None:
            return state
        try:
            head = _load_version(pdir, _ledger_versions(pdir)[-1])
        except FileNotFoundError:
            # the cut pins this partition but its directory is gone —
            # drop_partition ran inside (or after) the planned range
            raise RuntimeError(
                f"global feed needs partition {part!r}, whose directory "
                "was removed by drop_partition — re-seed the consumer "
                "past the drop and restart from a later startingVersion"
            ) from None
        except IndexError:
            # directory with a _ledger but no committed version: a
            # sub-table create that crashed before its v0 landed — a cut
            # can't pin it, so reaching here means out-of-band surgery
            raise RuntimeError(
                f"global feed needs partition {part!r}, whose ledger has "
                "no committed version (crashed create leftover) — run "
                "expire_snapshots to sweep it and re-seed the consumer"
            ) from None
        canon = schema_from_json(head["schemas"][-1])
        query_types = {f.name: f.dataType for f in self._spark_schema.fields}
        extra = [n for n in canon.fieldNames() if n not in query_types]
        if extra:
            raise RuntimeError(
                f"{_EVOLVED_MARKER}: partition {part!r} carries column(s) "
                f"{extra} this stream's schema (pinned at query start) "
                "does not — restart the stream to adopt the evolved shape"
            )
        # a type WIDENED after query start (this partition pins lazily at
        # its current head, possibly long after) would otherwise surface
        # as an unmarked ArrowInvalid narrowing cast in read() — fail with
        # the marker so bounded drains restart-adopt, like the flat guard.
        # A partition NARROWER than the query schema is fine (another
        # partition widened the union; the up-cast is lossless) —
        # "narrower" decided by the engine's own lattice
        # (schemas.widen_type), NOT a subset rank table: the pre-fix
        # table rejected legal short-under-long / date-under-timestamp
        # layouts, and a restart re-derived the same verdict — a
        # permanently wedged stream over a perfectly valid table.
        from ..schemas import SchemaEvolutionError, widen_type

        def _narrower_ok(part_t, query_t):
            try:
                return widen_type(part_t, query_t) == query_t
            except SchemaEvolutionError:
                return False

        mismatched = [
            f.name
            for f in canon.fields
            if f.dataType != query_types[f.name]
            and not _narrower_ok(f.dataType, query_types[f.name])
        ]
        if mismatched:
            raise RuntimeError(
                f"{_EVOLVED_MARKER}: partition {part!r} column(s) "
                f"{mismatched} evolved to a different type than this "
                "stream's schema (pinned at query start) — restart the "
                "stream to adopt"
            )
        state = {
            "schemas": head["schemas"],
            "renames": head.get("renames", []),
        }
        self._part_state[part] = state
        return state

    def _g_partitions(self, lo: int, hi: int) -> list:
        """Expand GLOBAL versions ``(lo, hi]`` of a PartitionedTable into
        per-partition change-file input partitions: walk the global cuts
        once (the same drop/recreate fail-loud contract as the batch
        feed), map each step to the sub-version spans it pins, and reuse
        the flat per-version entry discovery against each partition
        directory. ``_version`` is attributed to the GLOBAL commit."""
        # ONE owner for the range walk + drop/recreate fail-loud contract:
        # PartitionedTable._feed_bounds/_attributed_spans (pure manifest
        # file IO — no SparkSession needed), with its typed errors mapped
        # to the streaming re-seed guidance. Divergence between the batch
        # and streaming feeds' retention semantics would desynchronize
        # consumers that mix the two.
        from ..plans.lake import SnapshotExpiredError
        from ..plans.partitioned import (
            PartitionedTable,
            PartitionRetentionError,
        )

        pt = PartitionedTable(None, self._path)
        try:
            man_lo, _man_hi, _hi = pt._feed_bounds(lo, hi, "global feed")
        except (SnapshotExpiredError, FileNotFoundError) as e:
            raise RuntimeError(
                f"global feed for ({lo}, {hi}]: {e} — re-seed the "
                "consumer and restart from a later startingVersion"
            ) from None
        except PartitionRetentionError as e:
            raise RuntimeError(
                f"{e} — re-seed the consumer past the drop and restart "
                "from a later startingVersion"
            ) from None
        out: list[_CDFPartition] = []
        commit_ms_by_g: dict[int, int | None] = {}
        for g, p, v_lo, v_hi in pt._attributed_spans(man_lo, lo, hi):
            if g not in commit_ms_by_g:
                commit_ms_by_g[g] = (
                    int(_g_load(self._path, g).get("commit_ts", 0.0) * 1000)
                    if self._include_commit_ts
                    else None
                )
            pdir = os.path.join(self._path, f"part={p}")
            pinned = self._pin_part(p, pdir)
            for sv in range(v_lo + 1, v_hi + 1):
                entries = (
                    _changelog_entries(pdir, sv, v_lo, v_hi)
                    if self._mode == "row_changes"
                    else _cdf_entries(pdir, sv, v_lo, v_hi)
                )
                for fs in entries:
                    if fs["schema_id"] >= len(pinned["schemas"]):
                        raise RuntimeError(
                            f"{_EVOLVED_MARKER}: partition {p!r} "
                            f"version {sv} was written under schema_id "
                            f"{fs['schema_id']} but this stream pinned "
                            f"{len(pinned['schemas'])} schema(s) — "
                            "restart the stream to adopt"
                        )
                    out.append(
                        _PartCDFPartition(
                            os.path.join(pdir, fs["path"]),
                            fs["schema_id"],
                            g,
                            commit_ms_by_g[g],
                            fs.get("kind"),
                            pinned["schemas"][fs["schema_id"]],
                            pinned["renames"],
                        )
                    )
        return out

    def _snapshot_partitions(self, v0: int) -> list:
        """One partition per populated bucket of the manifest at ``v0`` —
        the resolution unit, scanned in parallel like the batch source."""
        handle = LakeTable(None, self._path)
        man = handle.manifest(v0)
        engine = man.get("merge_engine", "lww")
        if engine not in ("lww", "first_row"):
            raise ValueError(
                "initialSnapshot resolves merge_engine='lww'/'first_row' "
                f"only; this table uses {engine!r} — bootstrap the consumer "
                "from LakeTable.read() (which owns that engine's "
                "column-level resolution), then tail with startingVersion"
            )
        commit_ms = (
            int(man.get("commit_ts", 0.0) * 1000)
            if self._include_commit_ts
            else None
        )
        key_cols = list(man.get("key_cols", handle.key_cols))
        parts: list[_SnapshotPartition] = []
        for b in sorted(man["buckets"], key=int):
            fsets = []
            for fs in LakeTable._bucket_files(man["buckets"][b]):
                if fs["schema_id"] >= len(self._schemas):
                    raise RuntimeError(
                        f"{_EVOLVED_MARKER}: snapshot version {v0} has a "
                        f"file set under schema_id {fs['schema_id']} but "
                        f"this stream pinned {len(self._schemas)} schema(s) "
                        "at start — restart the stream to adopt it"
                    )
                p = fs["path"]
                fsets.append(
                    (
                        p if os.path.isabs(p) else os.path.join(self._path, p),
                        fs["schema_id"],
                        bool(fs.get("unresolved")),
                    )
                )
            if fsets:
                parts.append(
                    _SnapshotPartition(
                        int(b), fsets, v0, engine, key_cols, commit_ms
                    )
                )
        return parts

    def _read_snapshot(self, partition: _SnapshotPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_schema

        from ..sources.lake_batch import read_stored_resolved

        out_schema = to_arrow_schema(self._spark_schema)
        injected = {VERSION_COL} | (
            {COMMIT_TS_COL} if self._include_commit_ts else set()
        )
        canon = [
            f for f in out_schema
            if f.name not in injected and f.name not in (SEQ_COL, DELETED_COL)
        ]
        merged = read_stored_resolved(
            {
                "schemas": self._schemas,
                "renames": self._renames,
                "key_cols": partition.key_cols,
                "engine": partition.engine,
            },
            partition.file_sets,
            canon,
        )
        live = merged.filter(pc.invert(pc.field(DELETED_COL)))
        cols = {}
        for field in out_schema:
            if field.name == VERSION_COL:
                cols[field.name] = pa.nulls(len(live), type=field.type).fill_null(
                    partition.version
                )
            elif field.name == COMMIT_TS_COL and self._include_commit_ts:
                cols[field.name] = pa.nulls(len(live), type=field.type).fill_null(
                    partition.commit_ms
                )
            else:  # canonical payload + the rows' own _seq/_deleted
                cols[field.name] = live[field.name].cast(field.type)
        yield from pa.table(cols, schema=out_schema).to_batches(
            max_chunksize=65_536
        )

    def read(self, partition):
        if isinstance(partition, _SnapshotPartition):
            yield from self._read_snapshot(partition)
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        import pyarrow.compute as pc

        out_schema = to_arrow_schema(self._spark_schema)
        tbl = pq.read_table(partition.path)
        const_type: str | None = None
        if partition.kind == "changelog_derive_insert":
            # the commit's own change files, live rows = the inserts
            tbl = tbl.filter(pc.invert(pc.field(DELETED_COL)))
            const_type = "insert"
        elif partition.kind == "changelog_derive_delete":
            # delete_where's tombstones carry the pre-delete payload
            tbl = tbl.filter(pc.field(DELETED_COL))
            const_type = "delete"
        sid = partition.schema_id
        # partitioned plans carry their sub-table's pinned state inside
        # the partition object (see _PartCDFPartition): just the ONE
        # schema this file set was written under, plus the rename log
        sj = getattr(partition, "schema_json", None)
        if sj is None:
            sj = self._schemas[sid]
        renames = getattr(partition, "renames", None)
        if renames is None:
            renames = self._renames
        stored_fields = set(
            schema_from_json(sj).fieldNames()
        ) | {SEQ_COL, DELETED_COL, CHANGE_TYPE_COL}
        cols = {}
        for field in out_schema:
            if field.name == VERSION_COL:
                cols[field.name] = pa.nulls(len(tbl), type=field.type).fill_null(
                    partition.version
                )
                continue
            if field.name == COMMIT_TS_COL and self._include_commit_ts:
                # only the option-injected column — a user payload column
                # that happens to share the name resolves as stored data
                cols[field.name] = pa.nulls(len(tbl), type=field.type).fill_null(
                    partition.commit_ms
                )
                continue
            if field.name == CHANGE_TYPE_COL and const_type is not None:
                cols[field.name] = pa.nulls(len(tbl), type=field.type).fill_null(
                    const_type
                )
                continue
            stored = (
                field.name
                if field.name in (SEQ_COL, DELETED_COL, CHANGE_TYPE_COL)
                else _stored_name({"renames": renames}, sid, field.name)
            )
            if stored in stored_fields and stored in tbl.column_names:
                cols[field.name] = tbl[stored].cast(field.type)
            else:  # column added after this file set was written
                cols[field.name] = pa.nulls(len(tbl), type=field.type)
        yield from pa.table(cols, schema=out_schema).to_batches(
            max_chunksize=65_536
        )

    def commit(self, end: dict) -> None:
        # progress lives in the query checkpoint (nothing to GC here); the
        # committed end is the exact floor for the next trigger's cap
        _trace(f"commit({end['version']})")
        self._sync_floor(end["version"])


class LakeChangeFeedDataSource(DataSource):
    """``spark.readStream.format("lake_cdf")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self):
        from pyspark.sql import types as T

        path = self.options.get("path")
        if not path:
            raise ValueError("lake_cdf requires .option('path', <table dir>)")
        mode = self._mode()
        if _is_partitioned(path):
            # partitioned table: the query schema is the union of every
            # sub-table's canonical schema at the latest GLOBAL cut (spec
            # schema when no partition exists yet) — batch changes() gets
            # the same shape from unionByName(allowMissingColumns); a
            # field evolved in one partition only null-fills elsewhere,
            # and the last (widest) definition of a shared field wins.
            with open(os.path.join(path, "_spec.json")) as fh:
                spec = json.load(fh)
            # a name collision between partitions resolves to the WIDER
            # type under the engine's OWN widening lattice
            # (schemas.widen_type: short/int/long/float/double chains,
            # int|long→double, date→timestamp) — first-partition-wins
            # would pin a narrowed type and fail the Arrow cast on the
            # widened partition's data, and a hand-rolled subset of the
            # lattice (the pre-fix int/long/float/double rank table)
            # wedged streams over long→double or date→timestamp
            # evolutions permanently (restart re-derived the same
            # narrow union)
            from ..schemas import SchemaEvolutionError, widen_type

            def _wider(a, b):
                try:
                    w = widen_type(a.dataType, b.dataType)
                except SchemaEvolutionError:
                    raise ValueError(
                        f"column {a.name!r} has incompatible types "
                        f"across partitions ({a.dataType.simpleString()} "
                        f"vs {b.dataType.simpleString()}) — out-of-band "
                        "per-partition surgery; repair the table before "
                        "streaming it"
                    ) from None
                if w == a.dataType:
                    return a
                if w == b.dataType:
                    return b
                return T.StructField(a.name, w, True)

            fields_by_name: dict = {}
            order: list[str] = []
            for f in schema_from_json(spec["schema"]).fields:
                fields_by_name[f.name] = f
                order.append(f.name)
            g = _g_versions(path)[-1]
            for p in sorted(_g_load(path, g)["parts"]):
                pdir = os.path.join(path, f"part={p}")
                head = _load_version(pdir, _ledger_versions(pdir)[-1])
                for f in schema_from_json(head["schemas"][-1]).fields:
                    if f.name not in fields_by_name:
                        order.append(f.name)
                        fields_by_name[f.name] = f
                    else:
                        fields_by_name[f.name] = _wider(
                            fields_by_name[f.name], f
                        )
            canon = T.StructType([fields_by_name[n] for n in order])
        else:
            versions = _ledger_versions(path)
            canon = schema_from_json(
                _load_version(path, versions[-1])["schemas"][-1]
            )
        if mode == "row_changes":
            if CHANGE_TYPE_COL in canon.fieldNames():
                raise ValueError(
                    f"mode='row_changes' cannot inject {CHANGE_TYPE_COL!r}: "
                    "the table already has a payload column of that name"
                )
            fields = [
                *canon.fields,
                T.StructField(SEQ_COL, T.LongType(), True),
                T.StructField(CHANGE_TYPE_COL, T.StringType(), True),
                T.StructField(VERSION_COL, T.LongType(), True),
            ]
        else:
            fields = [
                *canon.fields,
                T.StructField(SEQ_COL, T.LongType(), True),
                T.StructField(DELETED_COL, T.BooleanType(), True),
                T.StructField(VERSION_COL, T.LongType(), True),
            ]
        if str(self.options.get("includeCommitTs", "false")).lower() == "true":
            if COMMIT_TS_COL in canon.fieldNames():
                raise ValueError(
                    f"includeCommitTs cannot inject {COMMIT_TS_COL!r}: the "
                    "table already has a payload column of that name"
                )
            fields.append(T.StructField(COMMIT_TS_COL, T.LongType(), True))
        return T.StructType(fields)

    def _mode(self) -> str:
        mode = str(self.options.get("mode", "cdf"))
        if mode not in ("cdf", "row_changes"):
            raise ValueError(
                f"lake_cdf mode must be 'cdf' or 'row_changes', got {mode!r}"
            )
        return mode

    def streamReader(self, schema) -> _CDFStreamReader:
        raw_max = self.options.get("maxVersionsPerTrigger")
        snap = str(
            self.options.get("initialSnapshot", "false")
        ).lower() == "true"
        if snap and self.options.get("startingVersion") is not None:
            raise ValueError(
                "initialSnapshot pins its own start (the head version at "
                "query start) — drop startingVersion"
            )
        if snap and self._mode() != "cdf":
            raise ValueError(
                "initialSnapshot is a cdf-mode surface; row_changes "
                "consumers seed from AdditiveStatsView's full build (or "
                "LakeTable.read()) and tail from there"
            )
        return _CDFStreamReader(
            self.options["path"],
            schema,
            self.options.get("startingVersion", "earliest"),
            int(raw_max) if raw_max is not None else None,
            include_commit_ts=(
                str(self.options.get("includeCommitTs", "false")).lower()
                == "true"
            ),
            mode=self._mode(),
            initial_snapshot=snap,
        )


def register_lake_cdf(spark) -> None:
    """Idempotent registration of the ``lake_cdf`` streaming format."""
    spark.dataSource.register(LakeChangeFeedDataSource)


def mirror_stream(
    spark,
    src_table_path: str,
    dst_table,
    checkpoint_dir: str,
    *,
    transform=None,
    available_now: bool = True,
    max_versions_per_trigger: int | None = None,
    initial_snapshot: bool = False,
):
    """Exactly-once table→table CDC mirror as ONE Structured Streaming
    job: ``lake_cdf`` tails the source's change feed, each micro-batch
    re-emits the change rows as ordinary events (``_deleted`` → 'D',
    else 'U' — upsert semantics cover inserts; ``_seq`` carries over so
    the destination's LWW keeps source ordering even across replays) and
    applies them with the micro-batch id as the exactly-once token. The
    streaming counterpart of :func:`plans.feed.replicate` (which polls).
    ``transform`` filters/cleanses the event frame for partial replicas.
    ``max_versions_per_trigger`` bounds each micro-batch (a cold-start
    mirror of a long-retained source backfills in steps instead of one
    giant batch). Returns the started query; ``awaitTermination`` it —
    except when BOTH ``available_now`` and ``max_versions_per_trigger``
    are set: the Python-source AvailableNow fallback executes a single
    batch per start, so one bounded batch would silently strand the rest
    of the backlog. In that mode this call BLOCKS, restarting the query
    on the same checkpoint (exactly-once holds) until the offset log
    reaches the source head as of entry, and returns the last,
    already-terminated query.

    PartitionedTable sources work (the global feed streams with GLOBAL
    ``_version`` attribution) with one identity caveat: under the
    DEFAULT partition rule the source's row identity is
    ``(partition, key)``, so a flat destination keyed on the key alone
    COLLAPSES same-key rows that live in different partitions — mirror a
    default-identity partitioned table into another partitioned table
    (same spec), and mirror ``cross_partition_upsert`` tables anywhere
    (key-only identity matches; moves arrive as same-seq D+U pairs whose
    in-batch U>D tie-break lands the insert)."""
    from pyspark.sql import functions as F

    register_lake_cdf(spark)

    def _on_batch(df, batch_id: int) -> None:
        if df.isEmpty():
            # versions with no change rows (e.g. table creation) still
            # advance the offset; skipping the apply keeps the replica's
            # ledger free of empty commits (and is replay-safe — a
            # redelivered empty batch is still empty)
            return
        events = df.select(
            F.when(F.col(DELETED_COL), "D").otherwise("U").alias("op"),
            F.col(SEQ_COL).alias("seq"),
            *[
                c
                for c in df.columns
                if c not in (SEQ_COL, DELETED_COL, VERSION_COL)
            ],
        )
        if transform is not None:
            events = transform(events)
        dst_table.apply_changes(
            events, batch_id=batch_id, source=f"mirror:{src_table_path}"
        )

    def _start():
        reader = spark.readStream.format("lake_cdf").option(
            "path", src_table_path
        )
        if initial_snapshot:
            # bootstrap from the source's CURRENT state + tail — the path
            # for sources whose early feed history is already expired
            # (snapshot rows arrive as U events with their stored _seq, so
            # the destination's LWW merge seeds the exact state)
            reader = reader.option("initialSnapshot", "true")
        if max_versions_per_trigger is not None:
            reader = reader.option(
                "maxVersionsPerTrigger", str(max_versions_per_trigger)
            )
        writer = (
            reader.load()
            .writeStream.foreachBatch(_on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    if not (available_now and max_versions_per_trigger is not None):
        return _start()
    return _drain_to_head(src_table_path, _start)


def maintain_view_stream(
    spark,
    view,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_versions_per_trigger: int | None = None,
):
    """Continuously maintain an :class:`AdditiveStatsView` from the typed
    changelog as ONE Structured Streaming job — the end-to-end Flink
    retract-stream topology in Spark: ``lake_cdf`` in ``row_changes``
    mode tails pre/post-images, each micro-batch folds additively into
    the view (O(changed rows) per trigger, the table is never re-read),
    and exactly-once is the composition of checkpoint redelivery with the
    view's version-marker idempotence (``apply_delta`` skips a replayed
    batch). Unseeded views get one full build first; the stream then
    starts strictly after the seeded version. Use ONE checkpoint per view
    for the view's lifetime — a fresh checkpoint over an existing view is
    safe (the marker skips the re-delivered prefix) but wastes a backlog
    re-read. ``available_now`` + ``max_versions_per_trigger`` drains in
    bounded restarts exactly like :func:`mirror_stream`; a version
    without a typed changelog fails the query with a marked error
    (:func:`is_changelog_unavailable_failure`) — re-seed with
    ``view.refresh()`` (which falls back to a full rebuild) and restart.
    """
    register_lake_cdf(spark)
    if view.applied_version() < 0:
        view.refresh()  # seed: one full build, marker at the source head
    src_path = view.source.path

    def _on_batch(df, batch_id: int) -> None:
        view.apply_delta(df)

    def _start():
        reader = (
            spark.readStream.format("lake_cdf")
            .option("path", src_path)
            .option("mode", "row_changes")
            .option("startingVersion", str(view.applied_version()))
        )
        if max_versions_per_trigger is not None:
            reader = reader.option(
                "maxVersionsPerTrigger", str(max_versions_per_trigger)
            )
        writer = (
            reader.load()
            .writeStream.foreachBatch(_on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    if not (available_now and max_versions_per_trigger is not None):
        return _start()
    return _drain_to_head(src_path, _start)


def publish_changelog_stream(
    spark,
    src_table_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
    available_now: bool = True,
    max_versions_per_trigger: int | None = None,
):
    """Publish the TYPED changelog as FULL Debezium envelopes — ``before``
    AND ``after`` images with true ``c``/``u``/``d`` ops — as one
    Structured Streaming job: ``lake_cdf`` in ``row_changes`` mode →
    per-micro-batch image pairing (``plans.feed.changelog_to_debezium``;
    safe batch-side because offsets are whole versions, so a key's
    pre/post rows can never split across micro-batches) → JSON lines under
    a DETERMINISTIC per-batch directory (``batch-<id>/``), so a replayed
    micro-batch overwrites its own output — the idempotent-sink
    foreachBatch pattern; exactly-once is checkpoint × that overwrite.
    The pairing aggregate needs foreachBatch (a stateless sink can't
    group), which is why this publisher trades ``publish_stream``'s
    ``_spark_metadata`` manifest for per-batch dirs; read the bus back
    with ``recursiveFileLookup`` (round-trip pinned in tests). Key
    columns come from the source's own ledger. ``available_now`` +
    ``max_versions_per_trigger`` drains in bounded restarts like
    :func:`mirror_stream`; versions without a typed changelog fail with
    :func:`is_changelog_unavailable_failure`."""
    from pyspark.sql import functions as F

    from ..plans.feed import changelog_to_debezium

    register_lake_cdf(spark)
    part_expr = None
    if _is_partitioned(src_table_path):
        spec = json.load(
            open(os.path.join(src_table_path, "_spec.json"))
        )
        key_cols = list(spec["key_cols"])
        if not spec.get("cross_partition_upsert", False):
            # DEFAULT identity is (partition, key): the same key live in
            # two partitions is two rows, so the envelope pairing must
            # group on the derived partition value too or one global
            # commit touching both would merge their images into one
            # corrupt envelope. cross_partition_upsert keeps key-only
            # pairing (identity is global; its mover delete+insert pair
            # renders as 'u' — see changelog_to_debezium).
            from ..plans.partitioned import PartitionedTable

            part_expr = PartitionedTable(
                spark, src_table_path
            )._part_expr()
    else:
        key_cols = list(
            _load_version(
                src_table_path, _ledger_versions(src_table_path)[-1]
            )["key_cols"]
        )

    def _on_batch(df, batch_id: int) -> None:
        if df.isEmpty():
            return
        identity_cols = None
        if part_expr is not None:
            df = df.withColumn("_ident_part", part_expr)
            identity_cols = ["_ident_part"]
        lines = changelog_to_debezium(
            df, key_cols, table_name=table_name, db=db,
            ts_ms=F.col(COMMIT_TS_COL),
            identity_cols=identity_cols,
        )
        lines.write.mode("overwrite").text(
            os.path.join(out_dir, f"batch-{batch_id:08d}")
        )

    def _start():
        reader = (
            spark.readStream.format("lake_cdf")
            .option("path", src_table_path)
            .option("mode", "row_changes")
            .option("includeCommitTs", "true")
        )
        if max_versions_per_trigger is not None:
            reader = reader.option(
                "maxVersionsPerTrigger", str(max_versions_per_trigger)
            )
        writer = (
            reader.load()
            .writeStream.foreachBatch(_on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    if not (available_now and max_versions_per_trigger is not None):
        return _start()
    return _drain_to_head(src_table_path, _start)


def _drain_to_head(src_table_path: str, start_fn):
    """Bounded drain: one capped batch per start (module docstring,
    AvailableNow caveat), stop when the offset log reaches the head
    observed at entry — the availableNow contract. Schema evolution
    mid-drain restarts the query (the failed batch committed nothing and
    the next ``start_fn()`` re-pins the head schema and replans it), so
    bounded consumers ADOPT evolution instead of dying; each adoption
    consumes one restart, so this converges."""
    head = (
        _g_versions(src_table_path)
        if _is_partitioned(src_table_path)
        else _ledger_versions(src_table_path)
    )[-1]
    consecutive_evo_fails = 0
    while True:
        q = start_fn()
        try:
            q.awaitTermination()
        except Exception as exc:
            if is_schema_evolution_failure(exc):
                # one restart cures a REAL mid-drain evolution (the next
                # start re-pins the evolved schema); a failure that
                # repeats with no committed progress is NOT evolution —
                # it is a non-convergent schema state, and retrying
                # forever would spin start/fail with no exit. Three
                # consecutive no-progress failures fail loud instead.
                consecutive_evo_fails += 1
                if consecutive_evo_fails >= 3:
                    raise RuntimeError(
                        "schema-evolution restart failed 3 times in a "
                        "row without committing a batch — the failure "
                        "is not cured by re-pinning the schema "
                        "(non-convergent schema state); inspect the "
                        "table's per-partition schemas"
                    ) from exc
                continue
            raise
        consecutive_evo_fails = 0
        prog = q.lastProgress
        if prog is None:  # no batch ran at all: already caught up
            return q
        end = parse_offset_version(prog["sources"][0]["endOffset"])
        if end >= head:
            return q


def publish_stream(
    spark,
    src_table_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
    available_now: bool = True,
    max_versions_per_trigger: int | None = None,
):
    """Exactly-once streaming publisher: tail a lake table's change feed
    and land it as Debezium-envelope JSON lines — the STREAMING outbound
    side of the CDC bus (Debezium's outbox / Delta→Kafka connector shape),
    batch counterpart :func:`plans.feed.feed_to_debezium`.

    One Structured Streaming job: ``lake_cdf`` (with per-version commit
    timestamps, ``includeCommitTs``) → pure-expression envelope render →
    Spark's **text file sink**. Exactly-once comes from the sink's
    ``_spark_metadata`` manifest: only files recorded by a committed batch
    are visible to manifest-honoring readers (Spark batch reads and file
    streams over the directory — e.g. ``read_events(fmt="debezium")`` or a
    downstream ``MultiTableReplay`` tailing ``out_dir``), so a replayed
    micro-batch's orphan files are never double-published. Restarting with
    the same checkpoint publishes only new versions.

    Envelope semantics match ``feed_to_debezium``: tombstones → ``op=d``
    with the pre-image in ``before``, everything else ``op=u`` (consumers
    upsert), ``_seq`` → ``source.lsn`` (total LWW order), ``ts_ms`` = the
    row's version commit timestamp. µs-precision timestamp format so a
    parse→apply mirror reproduces exact state.

    ``available_now`` + ``max_versions_per_trigger`` drains in bounded
    restarts exactly like :func:`mirror_stream` (Python-source AvailableNow
    caveat); a schema evolution mid-drain restarts and adopts — the
    re-built envelope picks up the new column.
    """
    from pyspark.sql import functions as F

    from ..plans.feed import _DZ_TS_FMT, change_envelope

    register_lake_cdf(spark)

    def _start():
        reader = (
            spark.readStream.format("lake_cdf")
            .option("path", src_table_path)
            .option("includeCommitTs", "true")
        )
        if max_versions_per_trigger is not None:
            reader = reader.option(
                "maxVersionsPerTrigger", str(max_versions_per_trigger)
            )
        df = reader.load()
        lines = df.select(
            F.to_json(
                change_envelope(
                    df.columns,
                    F.col(COMMIT_TS_COL),
                    table_name=table_name,
                    db=db,
                    exclude=(COMMIT_TS_COL,),
                ),
                _DZ_TS_FMT,
            ).alias("value")
        )
        writer = (
            lines.writeStream.format("text")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    if not (available_now and max_versions_per_trigger is not None):
        return _start()
    return _drain_to_head(src_table_path, _start)
