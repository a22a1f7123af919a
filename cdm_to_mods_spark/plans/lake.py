"""LakeTable — a snapshot-ledgered, bucketed lake table in pure PySpark.

No Iceberg/Delta jar ships in this environment, so the engine implements the
same contract from scratch on partitioned parquet + an atomic JSON ledger:

* **Snapshot isolation** — every commit writes data files under a new
  ``data/v{N}/`` directory, then atomically renames a manifest into
  ``_ledger/v{N}.json``. Readers resolve the highest committed manifest;
  a crash between data write and manifest rename leaves only unreferenced
  orphan files (never a torn table).
* **Bucketed layout** — rows are hash-bucketed by ``conv_id``
  (``pmod(murmur3(conv_id), num_buckets)`` — deliberately Spark's own
  ``HashPartitioning`` function, so one ``repartition(n, conv_id)`` both
  satisfies the dedup's clustering AND task-aligns the bucket write:
  the whole MERGE apply is ONE shuffle), the north star's "bucket by
  hash(conv_id) to co-partition change batches with target data files".
  A MERGE only reads and rewrites the buckets its change batch touches
  (bucket-granular copy-on-write); at 100 TB you raise ``num_buckets`` so
  rewrite amplification stays bounded — the manifest is O(num_buckets),
  not O(files-ever-written). The bucket function is versioned in the
  manifest (``bucket_fn``); round-1 tables keep their ``xxhash64`` layout
  and the two-shuffle path.
* **MERGE upsert with sequence guard** — insert/update/delete change rows
  merge via union + window-max over ``_seq``, which implements
  ``WHEN MATCHED AND source.seq > target._seq`` uniformly for I/U/D and is
  naturally idempotent under event replay. Deletes persist as tombstones
  (``_deleted``) so a late lower-seq update cannot resurrect a deleted key.
* **Exactly-once batches** — the manifest records ``last_batch_id``; an
  ``apply_changes`` for an already-committed ``batch_id`` is a no-op skip.
  This is the reference's count-reconciliation abort
  (post_cdm_cleanup.py:15-37) turned into a convergence guarantee.
* **Schema evolution** — unseen change-batch columns append as nullable;
  int→long / float→double widening is applied to BOTH sides before the
  merge (old bucket files are cast at read via their recorded schema_id).

The reference analog for the whole class: the per-pointer output directory
tree + IsCountsCorrect reconciliation (convert_cdm_to_mods.py:151-171,
post_cdm_cleanup.py:15-37), made transactional and incremental.

Ledger layout (the Iceberg manifest-LIST shape): each version file is
O(touched state) — it carries the commit's metadata (schemas, cdf,
metrics) plus ``bucket_ranges``, a list of {lo, hi, path} references to
immutable per-bucket-range manifest files holding that range's ``buckets``
file sets and ``lineage``. Range files are content-hash named, so a commit
writes ONLY the ranges it touched (identical ranges resolve to the same
file, which already exists) plus the small version file — O(touched
ranges), not O(num_buckets), per commit. ``manifest()`` reassembles the
full dict through an immutable-file cache; pre-range manifests with inline
``buckets`` remain readable.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from collections.abc import Callable
from contextlib import contextmanager
from uuid import uuid4

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F, types as T

from ..operators.dedup import (
    first_per_key,
    latest_per_key,
    resolve_aggregate,
    resolve_partial_update,
)
from ..schemas import (
    DELETED_COL,
    SEQ_COL,
    SchemaEvolutionError,
    evolve_schema,
    schema_from_json,
    widen_type,
)

_NON_PAYLOAD_EVENT_COLS = {"op", "seq", "ingest_ts"}

# Buckets per range-manifest file. A commit touching B buckets writes
# ceil(B/_RANGE_SIZE) range files (often fewer — only DIRTY ranges get new
# content hashes); the version file stays O(num_buckets/_RANGE_SIZE) refs.
# At 10^4+ buckets raise this so the ref list stays small.
_RANGE_SIZE = 16


class SnapshotExpiredError(LookupError):
    """A change-feed (or time-travel) range needs a manifest that
    ``expire_snapshots`` removed. Carries the retention floor in the message
    so an incremental consumer knows to re-seed from a snapshot read instead
    of retrying the feed."""


class BranchDivergedError(RuntimeError):
    """``publish_branch`` found commits on main past the branch's fork
    point. A fast-forward publish would silently discard them, so the
    publish is declined — re-stage the branch from the current main head
    (create a fresh branch, replay the audited batches, publish that)."""


class UnsupportedFormatVersionError(RuntimeError):
    """The table's manifest declares a ledger format newer than this
    engine understands (Iceberg's format-version fence). Reading anyway
    could silently misinterpret layout rules added later — refuse."""


class ChangelogUnavailableError(LookupError):
    """``row_changes`` needs a typed changelog for a version that has
    none — the commit was written without ``changelog="lookup"`` (or is a
    rollback, which rewinds state without a representable row diff). An
    additive consumer cannot bridge the gap incrementally: re-seed from a
    snapshot read at the feed's head and resume from there."""


# Ledger format this engine reads and writes. Bump ONLY on changes an
# older reader would misinterpret silently (new additive manifest keys
# with safe defaults do NOT bump it).
FORMAT_VERSION = 1

# staging-branch names: one path-safe token, no "-v" parsing ambiguity with
# the b-<name>-v<NNNNNNNN>.json version-file layout (enforced below).
_BRANCH_NAME_RE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.]*$")

# refcounted, race-safe scoping of session-global confs the apply path
# overrides: the first apply on a session saves the originals and sets the
# overrides, nested/concurrent applies just bump the depth, and the LAST one
# out restores the originals — interleaved applies can no longer strand the
# session with apply-tuned confs.
#
# - AQE off: the apply pipeline is statically shaped; per-stage re-planning
#   costs ~20% wall at micro-batch sizes (round-1 measurement).
# - Arrow batch 200k rows (default 10k): the pandas date cascade pays real
#   per-chunk fixed costs (Series allocation, regex engine setup), and
#   change-event rows are small (~200 B), so 200k-row batches are only tens
#   of MB per worker. Interleaved best-of A/B on the 2M-event MoR replay:
#   8.96 s vs 9.92 s (~10%), winning 4 of 5 pairings (tools/ab_arrow_batch*).
#   Scoped here rather than session-wide because wide-payload pandas UDFs
#   elsewhere (multimodal binary columns) would multiply per-batch memory.
_APPLY_CONFS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "200000",
}
_AQE_LOCK = threading.Lock()
_AQE_DEPTH: dict[int, list] = {}  # id(session) -> [depth, {conf: saved}]


@contextmanager
def _apply_conf_scope(spark: SparkSession):
    key = id(spark)
    with _AQE_LOCK:
        st = _AQE_DEPTH.get(key)
        if st is None:
            saved = {
                k: spark.conf.get(k, None) for k in _APPLY_CONFS
            }
            _AQE_DEPTH[key] = [1, saved]
            for k, v in _APPLY_CONFS.items():
                spark.conf.set(k, v)
        else:
            st[0] += 1
    try:
        yield
    finally:
        with _AQE_LOCK:
            st = _AQE_DEPTH[key]
            st[0] -= 1
            if st[0] == 0:
                for k, v in st[1].items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
                del _AQE_DEPTH[key]


def _observed(obs: Observation) -> dict | None:
    """Fail-safe ``Observation.get``: when the observed node never executed
    (zero-partition empty micro-batch, or the job was interrupted by a
    streaming stop) the JVM holds an empty row and ``toPyRow`` raises — in
    that case return None and let the caller fall back to an explicit
    aggregation."""
    try:
        return dict(obs.get)
    except Exception:
        return None


def _bucket_expr(key_col: str, num_buckets: int, fn: str = "hash32") -> F.Column:
    """Bucket id for a key. ``hash32`` (default for new tables) is
    ``pmod(murmur3, n)`` — EXACTLY Spark's ``HashPartitioning`` partition-id
    function, so ``repartition(n, key_col)`` lands each bucket's rows on
    its own task: the apply pipeline needs only ONE shuffle (dedup's
    clustering requirement is satisfied by the key-subset partitioning, and
    the bucket-partitioned write is already task-aligned — one file per
    bucket, no second exchange). ``xxhash64`` is the round-1 function, kept
    for tables whose manifests predate ``bucket_fn``; their layout cannot
    align with Spark's partitioner, so they keep the two-shuffle path."""
    if fn == "hash32":
        return F.pmod(F.hash(F.col(key_col)), F.lit(num_buckets)).cast("int")
    assert fn == "xxhash64", fn
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def _driver_bucket_ids(keys, key_type: T.DataType, num_buckets: int):
    """Bucket ids for a probe key list computed ON THE DRIVER via the
    numpy murmur3 port (functions/hash32 — differentially pinned against
    the JVM ``F.hash``), so a point lookup needs no Spark job before its
    pruned scan. Returns None — caller falls back to the Spark-cast path
    — when the probe values' natural Python type doesn't match the key
    column's family: the fallback's ``cast`` owns coercion semantics
    (e.g. a string probe against an int key), and re-implementing Spark
    casts here would risk silently pruning the wrong buckets."""
    import pyarrow as pa

    from ..functions.hash32 import bucket_ids_np

    keys = list(keys)
    try:
        if isinstance(key_type, T.StringType):
            if not all(isinstance(k, str) for k in keys):
                return None
            arr = pa.array(keys, type=pa.string())
        elif isinstance(key_type, T.LongType):
            if not all(
                isinstance(k, int) and not isinstance(k, bool) for k in keys
            ):
                return None
            arr = pa.array(keys, type=pa.int64())
        elif isinstance(key_type, (T.IntegerType, T.ShortType, T.ByteType)):
            if not all(
                isinstance(k, int) and not isinstance(k, bool) for k in keys
            ):
                return None
            arr = pa.array(keys, type=pa.int32())
        elif isinstance(key_type, T.BinaryType):
            if not all(isinstance(k, (bytes, bytearray)) for k in keys):
                return None
            arr = pa.array([bytes(k) for k in keys], type=pa.binary())
        else:
            return None
        return sorted({int(b) for b in bucket_ids_np(arr, num_buckets)})
    except (TypeError, ValueError, OverflowError, pa.ArrowInvalid):
        return None


def _lineage_entry(lineage: dict, b, max_seq, min_seq, n_changes,
                   snapshot, source) -> dict:
    """Build a bucket's lineage record with a MONOTONE max_seq: the stored
    high-water mark may never regress below what the bucket already
    reflects, or ``_next_seq`` under-allocates after a bootstrap-overlap
    replay (tail restarted at-or-before the snapshot point applies seqs
    below the snapshot's) or a conflict retry whose loser carried lower
    seqs — and an ``update_where`` at the under-allocated seq would lose
    the LWW merge while reporting success."""
    prev = (lineage.get(str(b)) or {}).get("max_seq")
    return {
        "max_seq": max_seq if prev is None or max_seq is None
        else max(prev, max_seq),
        "min_seq_in_batch": min_seq,
        "n_changes": n_changes,
        "snapshot": snapshot,
        "source": source,
    }


def _to_unix(ts) -> float:
    """Normalize a user-facing time bound (unix float/int, ``datetime``,
    ISO string) to unix seconds. Naive inputs are taken as UTC — the
    engine-wide session timezone."""
    import datetime as _dt

    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    raise TypeError(f"unsupported timestamp bound {ts!r}")


def _stat_scalar(v):
    """Normalize a parquet footer statistic to a JSON-storable, totally
    ordered scalar. Timestamps become epoch seconds (UTC) so zone-map
    comparisons don't depend on string formatting or tz-awareness.
    Returns ``None`` for values that can't serve as a zone bound (NaN is
    unordered; the caller must then poison the column's zone, not skip the
    value — a partial bound understates the range and causes FALSE skips)."""
    import datetime as _dt
    import decimal as _dec
    import math as _math

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.timestamp()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day,
                            tzinfo=_dt.timezone.utc).timestamp()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, _dec.Decimal):
        v = float(v)  # JSON-storable; ordering-compatible with bounds
    if isinstance(v, float) and not _math.isfinite(v):
        return None  # NaN/inf stats (parquet-mr writes max=NaN) — unusable
    return v


def _stored_name(man: dict, sid: int, name: str) -> str:
    """The physical column name a canonical field had when schema ``sid``
    was written. ``rename_column`` is metadata-only — old file sets keep
    their bytes, and every reader walks the manifest's append-only rename
    log (newest first) to map the canonical name back through renames that
    happened AFTER ``sid``. The Iceberg analog is field-ID resolution; a
    rename log is equivalent here because ``add_column``/``rename_column``
    refuse to re-use any historical name, so a name at a given schema_id
    is unambiguous."""
    for r in reversed(man.get("renames", [])):
        if r["at"] > sid and r["new"] == name:
            name = r["old"]
    return name


def _footer_stats(
    vdir: str, seq_col: str, stats_cols: tuple = ()
) -> dict[int, dict]:
    """Per-bucket (min/max ``seq_col``, row count) from parquet FOOTER
    metadata under ``vdir/_bucket=N/`` — driver-side, no Spark job. This is
    how lake formats (Iceberg manifests, Delta stats) track per-file
    lineage; on HDFS/S3 the same footers are range-read via the FileSystem
    API. ``stats_cols`` additionally collects per-bucket min/max zone maps
    (``{"stats": {col: [mn, mx]}}``) for manifest-level file skipping in
    ``read_range`` — columns absent from a file, or all-null (no row-group
    min/max), simply don't appear, which readers treat conservatively."""
    import pyarrow.parquet as pq

    out: dict[int, dict] = {}
    if not os.path.isdir(vdir):
        return out
    for d in os.listdir(vdir):
        if not d.startswith("_bucket="):
            continue
        b = int(d.split("=", 1)[1])
        mn = mx = None
        zone: dict[str, list] = {}
        # A column with ANY row group whose min/max is missing (stats
        # dropped for oversized binary values) or unusable (NaN) must have
        # NO zone at all: folding only the covered row groups would
        # understate the range and cause FALSE bucket skips. All-null row
        # groups are the one safe omission — nulls never match a range.
        poisoned: set[str] = set()
        n = 0
        for f in os.listdir(os.path.join(vdir, d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(vdir, d, f)).metadata
            n += md.num_rows
            name_to_idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            seq_idx = name_to_idx[seq_col]
            for rg in range(md.num_row_groups):
                rg_meta = md.row_group(rg)
                st = rg_meta.column(seq_idx).statistics
                if st is not None and st.has_min_max:
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
                for c in stats_cols:
                    ci = name_to_idx.get(c)
                    if ci is None or c in poisoned:
                        continue
                    cst = rg_meta.column(ci).statistics
                    if cst is None or not cst.has_min_max:
                        all_null = (
                            cst is not None
                            and cst.null_count is not None
                            and cst.null_count == rg_meta.num_rows
                        )
                        if not all_null:
                            poisoned.add(c)
                        continue
                    cmn, cmx = _stat_scalar(cst.min), _stat_scalar(cst.max)
                    if cmn is None or cmx is None:
                        poisoned.add(c)
                        continue
                    if c in zone:
                        zone[c] = [min(zone[c][0], cmn), max(zone[c][1], cmx)]
                    else:
                        zone[c] = [cmn, cmx]
        for c in poisoned:
            zone.pop(c, None)
        if n > 0:
            out[b] = {"max_seq": mx, "min_seq": mn, "n_changes": n}
            if zone:
                out[b]["stats"] = zone
    return out


class LakeTable:
    """A keyed lake table with snapshot ledger + idempotent MERGE."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_col: str = "conv_id",
        num_buckets: int = 32,
        merge_mode: str = "cow",
        compact_deltas: int = 8,
        cow_change_feed: bool = False,
        quarantine_path: str | None = None,
        bucket_fn: str = "hash32",
        branch: str = "main",
        stats_cols: tuple = ("ts",),
        schema_mode: str = "evolve",
        target_file_rows: int | None = None,
        bloom_cols: dict | tuple = (),
        merge_engine: str = "lww",
        agg_spec: dict | None = None,
        changelog: str = "none",
    ) -> None:
        """``merge_mode``:

        * ``"cow"`` (copy-on-write): each batch rewrites the buckets it
          touches — cheapest reads, but per-batch cost is O(affected
          buckets), i.e. O(table) once changes spray across all buckets.
        * ``"mor"`` (merge-on-read): each batch appends bucket-partitioned
          DELTA files — per-batch cost is O(batch) regardless of table
          size, the shape that survives 10^10-event replays. Readers merge
          base+deltas by max ``_seq``; a bucket whose delta chain reaches
          ``compact_deltas`` is folded inline, so read amplification stays
          bounded. Folds are tiered LSM-style: when the chain's row count
          (from manifest entry stats) is smaller than the base's, a MINOR
          fold resolves just the chain into one combined delta — O(churned
          keys), the base is never read — and only a chain that has grown
          to base scale (or an unknown/absent base) pays the MAJOR
          base-rewrite. At 10^10 events this keeps steady-state commit
          cost independent of table size instead of paying O(bucket)
          every ``compact_deltas`` commits.

        ``cow_change_feed``: merge-on-read gets the change feed for free
        (its delta files ARE the change rows); copy-on-write rewrites
        whole buckets, so with this flag each CoW commit also writes the
        resolved change rows as side files (the Delta-CDF pattern, one
        extra O(batch) write per commit), making ``changes()`` work under
        both modes.

        ``quarantine_path``: dead-letter routing — change rows whose key
        columns are null (unmergeable) are appended there per batch
        instead of poisoning the MERGE (a null key would hash into one
        bucket and collide under last-write-wins). The reference ABORTS
        the whole run on invalid records (post_cdm_cleanup.py:15-37); a
        10^10-event replay can't re-run for one bad row, so the engine
        quarantines and counts them (``metrics.n_quarantined``). The
        quarantine write materializes the batch cache the apply reads
        from, so routing costs ONE batch scan total, not two — enable
        where sources are untrusted.

        ``stats_cols``: columns whose per-bucket min/max ZONE MAPS are
        collected from parquet footers at write time and stored on each
        manifest file-set entry (Iceberg/Delta file-stats pattern).
        ``read_range`` uses them for manifest-level bucket skipping — at
        100 TB a time-bounded scan opens only the buckets whose stored
        rows can overlap the range, before any file is listed or any
        footer touched. Advisory: columns missing from a file (or
        all-null) record no stats and readers treat that as "may
        overlap". Default tracks ``ts``; pass ``()`` to disable.

        ``bloom_cols``: columns that get a parquet BLOOM FILTER in every
        bucket write (the Delta bloom-index role) — a tuple of names, or a
        dict name → expected NDV per file (sizes the filter; unset uses the
        writer's 1 MB cap). Zone maps prune RANGES on quasi-sorted columns;
        blooms prune point EQUALITY on high-cardinality columns that aren't
        the bucket key (request ids, hashes): Spark's parquet reader drops
        whole row groups on a bloom miss for pushed ``col = 'x'`` filters.
        Like ``stats_cols`` this is a writer-handle choice, not table
        state: files written without blooms simply don't prune.

        ``schema_mode``: ``"evolve"`` (default) merges batch schema drift
        into the table — new columns add as nullable, numeric types widen
        (int→long, float→double). ``"strict"`` is the enforcement mode:
        any drift raises ``SchemaEvolutionError`` before data lands, for
        tables whose schema is a contract (the Delta
        ``mergeSchema=false`` posture). Explicit DDL (``add_column`` etc.)
        still works under strict — it is the implicit path that is closed.

        ``target_file_rows``: cap rows per data FILE on every bucket write
        (Spark's ``maxRecordsPerFile``). One bucket = one directory = one
        write task, but at 100 TB / 4096 buckets a single 25 GB parquet
        file per bucket is wrong — footers balloon, row-group pruning
        coarsens, and any downstream re-read gets one giant split. A cap
        keeps files at the ~1 GB lake sweet spot while all manifest
        entries stay directory-granular (readers and footer stats already
        aggregate every file in a bucket dir). Advisory; None = no cap.

        ``merge_engine``: how multiple events for one key RESOLVE.

        * ``"lww"`` (default): whole-row last-write-wins — the highest
          ``(seq, op)``-ranked event is the row (binlog semantics; every
          U carries the full after-image, like a Debezium envelope).
        * ``"partial_update"``: column-level merge (the Paimon
          ``merge-engine=partial-update`` rule) — a NULL column in an I/U
          event means "leave it alone", so producers may send patches
          carrying only changed columns; each column independently keeps
          its last non-null write, a D tombstone kills everything at or
          below its rank, and a later upsert re-creates the row from
          scratch. Resolution stays ONE hash aggregate
          (``operators.dedup.resolve_partial_update``) at every site the
          LWW fold runs (read, compaction folds, the cow merge, in-batch
          collapse), so the single-shuffle apply plan is unchanged. The
          engine choice is table state (persisted in the manifest,
          adopted on reopen, like ``bucket_fn``): resolving the same
          stored rows under a different engine is a silent correctness
          fork. NOTE a ``changes()`` consumer of a partial table gets the
          PATCH rows — replicate/mirror into another *partial* table
          converges; an LWW destination would null untouched columns.
          Exactness horizon (in-batch + fold collapse) documented on
          ``resolve_partial_update``.
        * ``"aggregate"``: per-column rollup (the Paimon
          ``merge-engine=aggregation`` rule) — each payload column
          combines event values with its ``agg_spec`` function (``sum`` /
          ``max`` / ``min`` / ``bool_or`` / ``bool_and`` / ``last``
          (default) / ``first``), so the table IS the materialized
          aggregate (per-conversation token counters, latest-ts, flags)
          and every plane — folds, cow merge, in-batch collapse — rolls
          partial aggregates up associatively. Not retractable: ``D``
          events, ``delete_where``, ``update_where`` and ``merge_into``
          are refused (Paimon's rule — a stored sum cannot subtract).
          A ``changes()`` consumer gets per-batch PARTIAL aggregates;
          replaying them into another aggregate table converges.

        ``agg_spec``: column → function map for ``merge_engine=
        "aggregate"`` (unlisted columns default ``last``); persisted in
        the manifest and adopted on reopen, like the engine itself.

        ``branch``: open the table AT A STAGING BRANCH (write-audit-publish,
        the Iceberg/Netflix WAP pattern — the lake-scale analog of the
        reference's validate-before-package flow, post_cdm_cleanup.py's QC
        pass before zipping output). Commits land in the branch's own
        ledger namespace; main readers never see them until
        ``publish_branch``. Create with ``create_branch`` on a main-opened
        table first; opening an unknown branch raises ``LookupError``.
        """
        self.spark = spark
        # absolutize: the Python-side ledger IO resolves relative paths
        # against THIS process's cwd while Spark's JVM resolves data
        # reads/writes against its own working dir — a relative table path
        # would silently split the table across the two (ledger here, data
        # there). One normalization point keeps every consumer agreeing.
        self.path = os.path.abspath(path.rstrip("/"))
        self.key_cols = tuple(key_cols)
        self.bucket_col = bucket_col
        self.num_buckets = num_buckets
        assert merge_mode in ("cow", "mor"), merge_mode
        self.merge_mode = merge_mode
        self.compact_deltas = compact_deltas
        self.cow_change_feed = cow_change_feed
        self.quarantine_path = quarantine_path
        assert bucket_fn in ("hash32", "xxhash64"), bucket_fn
        self.bucket_fn = bucket_fn
        assert merge_engine in (
            "lww", "partial_update", "aggregate", "first_row"
        ), merge_engine
        self.merge_engine = merge_engine
        if agg_spec and merge_engine != "aggregate":
            raise ValueError("agg_spec requires merge_engine='aggregate'")
        from ..operators.dedup import AGG_FNS

        for c, fn in (agg_spec or {}).items():
            if fn not in AGG_FNS:
                raise ValueError(
                    f"unknown agg fn {fn!r} for column {c!r}; "
                    f"supported: {AGG_FNS}"
                )
            if c in key_cols:
                raise ValueError(f"agg_spec cannot target key column {c!r}")
        self.agg_spec = dict(agg_spec or {})
        # typed row-level changelog (Paimon changelog-producer=lookup /
        # Delta CDC analog): "lookup" makes every state-changing commit
        # also materialize insert / update_preimage / update_postimage /
        # delete rows (read back with row_changes()), paying one
        # bucket-pruned lookup join of old state per commit. Writer-handle
        # choice like quarantine_path — every writer of a table should
        # agree, and row_changes raises ChangelogUnavailableError over
        # version ranges written without it.
        assert changelog in ("none", "lookup"), changelog
        self.changelog = changelog
        self.stats_cols = tuple(stats_cols)
        assert schema_mode in ("evolve", "strict"), schema_mode
        self.schema_mode = schema_mode
        self.target_file_rows = target_file_rows
        self.bloom_cols = (
            dict(bloom_cols)
            if isinstance(bloom_cols, dict)
            else {c: None for c in bloom_cols}
        )
        # escape hatch (benchmarks/debug): False forces every inline fold
        # to the major tier, the pre-tiering behavior.
        self._minor_folds = True
        self._ledger = os.path.join(self.path, "_ledger")
        if not _BRANCH_NAME_RE.match(branch):
            raise ValueError(f"invalid branch name {branch!r}")
        self.branch = branch
        self._branches_dir = os.path.join(self._ledger, "branches")
        if branch != "main" and not os.path.exists(self._branch_file(branch)):
            raise LookupError(
                f"branch {branch!r} does not exist at {self.path} — "
                "create it with create_branch() on a main-opened table"
            )
        # immutable range-manifest files, keyed by ledger-relative path
        self._range_cache: dict[str, dict] = {}
        # For an EXISTING table the on-disk layout is authoritative:
        # opening with different constructor args must not silently hash
        # keys into the wrong buckets (mis-pruned reads, split keys on
        # merge). merge_mode/compact_deltas stay caller-chosen — they are
        # write strategies, not layout.
        if self.exists():
            man = self.manifest()
            # forward-compat fence (Iceberg's format-version check): a
            # manifest written by a NEWER engine may rely on layout rules
            # this code predates — reading it anyway risks silent wrong
            # results (mis-pruned buckets, unknown delta semantics), so
            # refuse loudly. Absent field = format 1 (pre-versioned ledgers).
            fmt_v = man.get("format_version", 1)
            if fmt_v > FORMAT_VERSION:
                raise UnsupportedFormatVersionError(
                    f"table at {self.path} has format_version {fmt_v}; this "
                    f"engine supports <= {FORMAT_VERSION} — upgrade the "
                    "engine before opening this table"
                )
            self.num_buckets = man.get("num_buckets", self.num_buckets)
            self.key_cols = tuple(man.get("key_cols", self.key_cols))
            self.bucket_col = man.get("bucket_col", self.bucket_col)
            # manifests predating bucket_fn used the round-1 xxhash64 layout
            self.bucket_fn = man.get("bucket_fn", "xxhash64")
            # resolution semantics are table state too: stored rows written
            # under partial-update carry patch columns whose NULLs mean
            # "untouched" — folding them whole-row LWW would erase data.
            self.merge_engine = man.get("merge_engine", "lww")
            if man.get("agg_spec"):
                self.agg_spec = dict(man["agg_spec"])

    # ------------------------------------------------------------- ledger
    def _vfile_name(self, v: int, branch: str | None = None) -> str:
        """Version-file name in the given branch's ledger namespace. Main
        keeps the bare ``v<NNNNNNNN>.json`` layout (pre-branch ledgers stay
        readable unchanged); a branch's commits live beside them as
        ``b-<branch>-v<NNNNNNNN>.json``."""
        b = self.branch if branch is None else branch
        return f"v{v:08d}.json" if b == "main" else f"b-{b}-v{v:08d}.json"

    @staticmethod
    def _branch_vfile_versions(names: list[str], branch: str) -> list[int]:
        pre = f"b-{branch}-v"
        out = []
        for f in names:
            if f.startswith(pre) and f.endswith(".json") and f[len(pre):-5].isdigit():
                out.append(int(f[len(pre):-5]))
        return out

    def _versions(self) -> list[int]:
        """Snapshot versions visible on THIS table handle's branch: for
        main, the bare version files; for a branch, the shared main prefix
        up to the fork point plus the branch's own commits (versions are
        dense across the fork, so feeds/time travel span it seamlessly)."""
        if not os.path.isdir(self._ledger):
            return []
        names = os.listdir(self._ledger)
        main = sorted(
            int(f[1:-5])
            for f in names
            if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
        )
        if self.branch == "main":
            return main
        fork = self._branch_meta(self.branch)["forked_at"]
        return sorted(
            [v for v in main if v <= fork]
            + self._branch_vfile_versions(names, self.branch)
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _load_version(self, v: int) -> dict:
        """The version file as committed — range refs NOT materialized.
        On a branch handle the branch's namespace wins; versions at or
        before the fork point fall through to the shared main files."""
        if self.branch != "main":
            p = os.path.join(self._ledger, self._vfile_name(v))
            if os.path.exists(p):
                with open(p) as fh:
                    return json.load(fh)
        with open(os.path.join(self._ledger, f"v{v:08d}.json")) as fh:
            return json.load(fh)

    def _load_range(self, rel_path: str) -> dict:
        """Load (and cache) one immutable range-manifest file:
        {"buckets": {...}, "lineage": {...}} for its bucket range."""
        cached = self._range_cache.get(rel_path)
        if cached is None:
            with open(os.path.join(self._ledger, rel_path)) as fh:
                cached = json.load(fh)
            self._range_cache[rel_path] = cached
        return cached

    def _materialize(self, man: dict) -> dict:
        """Resolve a raw version dict's range refs into inline
        ``buckets`` + ``lineage`` (deep-copied — callers mutate)."""
        if "bucket_ranges" in man:
            import copy

            buckets: dict = {}
            lineage: dict = {}
            for ref in man["bucket_ranges"]:
                # deep-copy out of the cache: callers (apply/compact) extend
                # bucket entries in place, and the cached range content must
                # stay exactly what the immutable file holds
                rng = copy.deepcopy(self._load_range(ref["path"]))
                buckets.update(rng["buckets"])
                lineage.update(rng.get("lineage", {}))
            man["buckets"] = buckets
            man["lineage"] = lineage
        return man

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        return self._materialize(self._load_version(v))

    def _write_ranges(self, manifest: dict) -> dict:
        """Split ``buckets``+``lineage`` into per-bucket-range manifest
        files (the Iceberg manifest-list shape) and return the version-file
        dict that references them.

        Range files are IMMUTABLE and content-hash named: a range whose
        state a commit didn't touch hashes to a file that already exists,
        so the commit writes O(touched ranges) files — never O(num_buckets)
        JSON — plus the small version file. This holds across rollbacks and
        concurrent retries for free (same content ⇒ same file)."""
        import hashlib

        buckets = manifest.pop("buckets", {})
        lineage = manifest.pop("lineage", {})
        manifest.pop("bucket_ranges", None)  # stale refs (e.g. rollback's {**man})
        by_range: dict[int, dict] = {}
        for k, e in buckets.items():
            by_range.setdefault(int(k) // _RANGE_SIZE, {"buckets": {}, "lineage": {}})[
                "buckets"
            ][k] = e
        for k, s in lineage.items():
            by_range.setdefault(int(k) // _RANGE_SIZE, {"buckets": {}, "lineage": {}})[
                "lineage"
            ][k] = s
        os.makedirs(os.path.join(self._ledger, "ranges"), exist_ok=True)
        refs = []
        for r in sorted(by_range):
            content = json.dumps(by_range[r], sort_keys=True)
            h = hashlib.md5(content.encode()).hexdigest()[:20]
            rel = f"ranges/r-{h}.json"
            final = os.path.join(self._ledger, rel)
            if not os.path.exists(final):
                tmp = os.path.join(
                    self._ledger, f"ranges/_tmp-{uuid4().hex[:8]}-{h}.json"
                )
                with open(tmp, "w") as fh:
                    fh.write(content)
                    fh.flush()
                    os.fsync(fh.fileno())
                os.rename(tmp, final)  # same-content race: rename is idempotent
                self._range_cache[rel] = by_range[r]
            refs.append(
                {"lo": r * _RANGE_SIZE, "hi": (r + 1) * _RANGE_SIZE, "path": rel}
            )
        manifest["bucket_ranges"] = refs
        return manifest

    def _commit(self, manifest: dict) -> None:
        """Atomic commit: range manifests first (immutable, content-named),
        then the version file via full write to a temp name, fsync, rename.

        On HDFS/S3 this maps to the same rename-or-conditional-put commit
        protocol Iceberg/Delta use for their version files; optimistic
        concurrency = the rename fails if the version already exists. A
        loser's already-written range files are content-addressed, so they
        either get referenced by its retry or GC'd by expire_snapshots."""
        os.makedirs(self._ledger, exist_ok=True)
        if self.branch != "main" and not os.path.exists(self._branch_file(self.branch)):
            raise RuntimeError(
                f"branch {self.branch!r} was dropped; refusing to commit"
            )
        v = manifest["version"]
        final = os.path.join(self._ledger, self._vfile_name(v))
        if os.path.exists(final):
            raise RuntimeError(f"concurrent commit conflict on version {v}")
        manifest = self._write_ranges(dict(manifest))
        tmp = os.path.join(self._ledger, f"_tmp-{uuid4().hex[:8]}-v{v:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # link(2) is atomic-EXCLUSIVE (rename would silently clobber a
            # concurrent winner in the check→publish window)
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit conflict on version {v}"
            ) from None
        finally:
            os.unlink(tmp)

    def exists(self) -> bool:
        return self.latest_version() is not None

    def version_as_of(self, ts: float) -> int:
        """Timestamp time travel: the highest version committed at or
        before unix-time ``ts`` (each manifest records its ``commit_ts``).
        Pair with ``read(version=...)`` — the Iceberg ``TIMESTAMP AS OF``
        contract."""
        best = None
        for v in self._versions():
            # raw version file — commit_ts lookup must not load range files
            m = self._load_version(v)
            cts = m.get("commit_ts")
            if cts is not None and cts <= ts:
                best = v
        if best is None:
            raise LookupError(f"no snapshot committed at or before {ts}")
        return best

    def history(self, limit: int | None = None) -> list[dict]:
        """Commit log, newest first — the ``DESCRIBE HISTORY`` surface
        (reference analog: the per-run log files every conversion run
        appends, utilities.py:93-108, turned into queryable table
        metadata). Driver-side and manifest-only: raw version files are
        read, range files are NOT materialized, so cost is O(versions),
        independent of table size.

        Each entry: ``version``, ``commit_ts``, ``operation`` (MERGE /
        bootstrap / compact / delete_where / rollback / ... / CREATE),
        ``batch_id``, and the commit's recorded ``metrics``. Versions
        dropped by ``expire_snapshots`` no longer appear — history is the
        retained ledger, not an external audit log.
        """
        out: list[dict] = []
        for v in sorted(self._versions(), reverse=True):
            if limit is not None and len(out) >= limit:
                break
            m = self._load_version(v)
            metrics = m.get("metrics") or {}
            if metrics.get("maintenance"):
                op = metrics["maintenance"]
            elif metrics.get("bootstrap_seq") is not None:
                op = "bootstrap"
            elif metrics.get("mode"):
                op = "MERGE"
            elif v == 0:
                op = "CREATE"
            else:
                op = "unknown"
            out.append(
                {
                    "version": v,
                    "commit_ts": m.get("commit_ts"),
                    "operation": op,
                    "batch_id": m.get("batch_id"),
                    "metrics": metrics,
                }
            )
        return out

    def changes_since_ts(self, ts, until_ts=None) -> DataFrame:
        """Timestamp-bounded change feed (Delta CDF's ``startingTimestamp``
        analog): change rows from commits strictly AFTER unix-time/``
        datetime``/ISO-string ``ts`` up to ``until_ts`` (inclusive; default
        head). Resolution is ledger-only (``version_as_of``), then the read
        is the ordinary :meth:`changes`. Naive datetimes/strings are taken
        as UTC — the session timezone everywhere in this engine. A ``ts``
        before the table's FIRST commit includes the whole feed; a ``ts``
        at or before the earliest RETAINED commit when older snapshots were
        expired raises ``SnapshotExpiredError`` — the expired versions'
        commit times are gone, so "which changes came after ts" cannot be
        answered completely and a silently truncated feed would desync the
        consumer (re-seed from a full read instead). ``until_ts`` before
        the first commit yields an empty feed."""
        lo, hi = _to_unix(ts), None if until_ts is None else _to_unix(until_ts)
        try:
            since_v = self.version_as_of(lo)
        except LookupError:
            vmin = min(self._versions())
            if vmin > 0:
                raise SnapshotExpiredError(
                    f"timestamp {lo} is at or before the earliest retained "
                    f"snapshot (v{vmin}); the change feed before it was "
                    "expired — re-seed the consumer from a full read"
                ) from None
            since_v = vmin - 1  # predates the CREATE commit: whole feed
        if hi is None:
            return self.changes(since_v)
        try:
            until_v = self.version_as_of(hi)
        except LookupError:
            until_v = since_v  # until predates everything: empty feed
        return self.changes(since_v, until_v)

    def describe_detail(self) -> dict:
        """``DESCRIBE DETAIL`` — one driver-side dict summarizing layout and
        health, no Spark job: identity (path/version/commit_ts/merge mode/
        bucket layout/schema), size (populated buckets, base/delta rows
        from the manifests' footer-derived ``rows`` — as-written counts,
        so a delta's superseded versions and tombstones are included; a
        live-row count needs the read path — bytes via file listing of
        referenced dirs), and the two skew signals an operator
        pages on — the longest delta chain (read amplification; compaction
        due) and the largest bucket's share of rows (hot-key imbalance;
        rebucket/salting due). Cost is O(referenced files) stat calls."""
        man = self.manifest()
        canon = self._canonical_schema(man)
        base_rows, delta_rows, chains, per_bucket = 0, 0, [], []
        n_files = 0
        size_bytes = 0
        seen_dirs: set[str] = set()
        for e in man["buckets"].values():
            entry = self._mor_entry(e)
            rows_b = (entry.get("base") or {}).get("rows") or 0
            rows_d = sum(d.get("rows") or 0 for d in entry["deltas"])
            base_rows += rows_b
            delta_rows += rows_d
            per_bucket.append(rows_b + rows_d)
            chains.append(len(entry["deltas"]))
            for fs in self._bucket_files(entry):
                d = os.path.join(self.path, fs["path"])
                if d in seen_dirs or not os.path.isdir(d):
                    continue
                seen_dirs.add(d)
                for f in os.listdir(d):
                    # data files only: local-mode Spark leaves .crc
                    # checksums and _SUCCESS markers beside them, which
                    # would double num_files and skew rows/file policy
                    if f.startswith((".", "_")):
                        continue
                    p = os.path.join(d, f)
                    if os.path.isfile(p):
                        n_files += 1
                        size_bytes += os.path.getsize(p)
        total = base_rows + delta_rows
        return {
            "path": self.path,
            "version": man["version"],
            "commit_ts": man.get("commit_ts"),
            "merge_mode": self.merge_mode,
            "merge_engine": self.merge_engine,
            "agg_spec": dict(self.agg_spec),
            "num_buckets": self.num_buckets,
            "bucket_fn": self.bucket_fn,
            "key_cols": list(self.key_cols),
            "stats_cols": list(self.stats_cols or []),
            "schema": {f.name: f.dataType.simpleString() for f in canon.fields},
            "properties": dict(man.get("properties") or {}),
            "constraints": {
                c["name"]: c["expr"] for c in man.get("constraints") or []
            },
            "populated_buckets": sum(1 for r in per_bucket if r),
            "num_files": n_files,
            "size_bytes": size_bytes,
            "base_rows": base_rows,
            "delta_rows": delta_rows,
            "max_delta_chain": max(chains, default=0),
            "max_bucket_row_share": (
                round(max(per_bucket) / total, 4) if total else 0.0
            ),
        }

    # ------------------------------------------------- branches (WAP)
    # Write-audit-publish staging (the Iceberg branch / Netflix WAP
    # pattern; lake-scale analog of the reference's validate-before-
    # package flow — post_cdm_cleanup.py runs its QC pass over converted
    # output BEFORE zipping it for ingest). A branch is a fork-point
    # pointer plus its own version-file namespace: replay lands change
    # batches on the branch, audits run against the branch handle, and
    # publish_branch atomically fast-forwards main — or drop_branch
    # abandons the staged work without main ever seeing a row.

    def _branch_file(self, name: str) -> str:
        return os.path.join(self._branches_dir, f"{name}.json")

    def _branch_meta(self, name: str) -> dict:
        try:
            with open(self._branch_file(name)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise LookupError(
                f"branch {name!r} does not exist at {self.path}"
            ) from None

    def branches(self) -> list[dict]:
        """Live staging branches: ``[{name, forked_at, created_ts}, ...]``."""
        if not os.path.isdir(self._branches_dir):
            return []
        return sorted(
            (
                self._branch_meta(f[:-5])
                for f in os.listdir(self._branches_dir)
                # skip in-flight _tmp- staging files (same rule as tags()):
                # a crash mid-create must not leave a phantom branch the
                # API can neither open nor drop, pinning GC forever
                if f.endswith(".json") and not f.startswith("_tmp-")
            ),
            key=lambda m: m["name"],
        )

    def create_branch(self, name: str) -> dict:
        """Fork a staging branch at the current main head. Creation is
        atomic-exclusive (link(2), like version publish) so two racing
        creators get exactly one branch. Returns the branch meta; open the
        branch with ``LakeTable(spark, path, branch=name, ...)``."""
        assert self.branch == "main", "create branches from a main-opened table"
        if not _BRANCH_NAME_RE.match(name) or name == "main":
            raise ValueError(f"invalid branch name {name!r}")
        head = self.latest_version()
        if head is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        meta = {"name": name, "forked_at": head, "created_ts": time.time()}
        os.makedirs(self._branches_dir, exist_ok=True)
        tmp = os.path.join(self._branches_dir, f"_tmp-{uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._branch_file(name))
        except FileExistsError:
            raise ValueError(f"branch {name!r} already exists") from None
        finally:
            os.unlink(tmp)
        return meta

    def publish_branch(self, name: str) -> dict:
        """Atomically fast-forward main to the branch head (squash): ONE
        new main version carries the branch head's buckets/lineage/schemas
        and ``last_batch_id`` (exactly-once replay state survives the
        publish) plus the UNION of the branch commits' change-feed entries
        in commit order, so ``changes(since=fork)`` on main replays the
        whole audited window. Declines with ``BranchDivergedError`` if main
        advanced past the fork point — a fast-forward would discard those
        commits; re-stage instead. The branch is dropped on success; a
        crash between the commit and the drop is recovered by simply
        re-running publish — it recognizes main's head as this branch's
        own squash and finishes the pointer drop instead of raising."""
        assert self.branch == "main", "publish from a main-opened table"
        meta = self._branch_meta(name)
        fork = meta["forked_at"]
        names = os.listdir(self._ledger)
        bvs = sorted(self._branch_vfile_versions(names, name))
        head = self.latest_version()
        if head != fork:
            if head == fork + 1:
                hm = self._load_version(head).get("metrics", {})
                if (
                    hm.get("maintenance") == "publish"
                    and hm.get("from_branch") == name
                    and (not bvs or hm.get("branch_head") == bvs[-1])
                ):
                    # crash-window recovery: the squash already committed
                    # as main's head and only the branch drop was lost —
                    # finish it idempotently.
                    self.drop_branch(name)
                    return {**hm, "published_version": head,
                            "recovered": True}
            raise BranchDivergedError(
                f"main is at version {head} but branch {name!r} forked at "
                f"{fork}; fast-forward publish would discard main commits — "
                "re-stage the branch from the current head"
            )
        if not bvs:  # nothing staged: publishing is just dropping the fork
            self.drop_branch(name)
            return {"published_version": None, "branch_versions": 0,
                    "from_branch": name}
        raws = []
        for bv in bvs:
            with open(os.path.join(self._ledger, self._vfile_name(bv, name))) as fh:
                raws.append(json.load(fh))
        union_cdf = [e for raw in raws for e in raw.get("cdf", [])]
        # a cow branch commit without change files poisons feeds across the
        # squash exactly as it would on main — mark the published version
        # so changes() keeps raising the documented ValueError.
        poisoned = any(
            raw.get("metrics", {}).get("mode") == "cow"
            and not self._plain_cdf(raw)
            and raw.get("metrics", {}).get("n_buckets_touched", 1) > 0
            for raw in raws
        )
        head_raw = self._materialize(dict(raws[-1]))
        new_version = fork + 1
        metrics = {
            "maintenance": "publish",
            "from_branch": name,
            "branch_versions": len(bvs),
            "branch_head": bvs[-1],
            "n_buckets_touched": sum(
                raw.get("metrics", {}).get("n_buckets_touched") or 0
                for raw in raws
            ),
        }
        if poisoned:
            # dedicated marker: the squash's union cdf can be NON-empty
            # (sibling mor commits), so changes()'s mode+empty-cdf check
            # alone would let the feed silently skip the cow commit's rows.
            metrics["cow_without_cdf"] = True
            metrics["mode"] = "cow"
        try:
            self._commit(
                {
                    "format_version": head_raw.get(
                        "format_version", FORMAT_VERSION
                    ),
                    "version": new_version,
                    "batch_id": None,
                    "last_batch_id": head_raw["last_batch_id"],
                    "schemas": head_raw["schemas"],
                    "buckets": head_raw["buckets"],
                    "num_buckets": head_raw["num_buckets"],
                    "key_cols": head_raw["key_cols"],
                    "bucket_col": head_raw["bucket_col"],
                    "bucket_fn": head_raw.get("bucket_fn", self.bucket_fn),
                    "merge_engine": head_raw.get(
                        "merge_engine", self.merge_engine
                    ),
                    "agg_spec": head_raw.get("agg_spec", self.agg_spec),
                    "cdf": union_cdf,
                    "lineage": head_raw.get("lineage", {}),
                    "renames": head_raw.get("renames", []),
                    "constraints": head_raw.get("constraints", []),
                    "properties": head_raw.get("properties", {}),
                    "metrics": metrics,
                    "commit_ts": time.time(),
                }
            )
        except RuntimeError as e:  # concurrent main winner took fork+1
            raise BranchDivergedError(
                f"main advanced concurrently while publishing {name!r}: {e}"
            ) from None
        self.drop_branch(name)
        return {**metrics, "published_version": new_version}

    # --------------------------------------------------- tags (refs)
    # Immutable named snapshot refs (Iceberg tags): pin the exact table
    # state a training run / export consumed — ``tag("dataset_v1")`` today,
    # ``read(version=tag_version("dataset_v1"))`` forever. Tagged versions
    # are excluded from ``expire_snapshots`` until the tag is deleted, so
    # the ref stays resolvable however far main advances.

    def _tags_dir(self) -> str:
        return os.path.join(self._ledger, "tags")

    def tag(self, name: str, version: int | None = None) -> dict:
        """Create an immutable tag at ``version`` (default: current head).
        Tags never move — delete and re-create to re-point."""
        # tag refs live in the MAIN version namespace: a branch handle's
        # current version indexes b-<name>-v*.json files, and storing that
        # bare integer would resolve to an unrelated main snapshot after
        # publish. Same rule as create/publish/drop_branch.
        assert self.branch == "main", "tag from a main-opened table"
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(f"invalid tag name {name!r}")
        v = self.latest_version() if version is None else version
        if v is None or v not in self._versions():
            raise LookupError(f"no snapshot version {v} to tag at {self.path}")
        meta = {"name": name, "version": v, "created_ts": time.time()}
        os.makedirs(self._tags_dir(), exist_ok=True)
        tmp = os.path.join(self._tags_dir(), f"_tmp-{uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(self._tags_dir(), f"{name}.json"))
        except FileExistsError:
            raise ValueError(f"tag {name!r} already exists") from None
        finally:
            os.unlink(tmp)
        return meta

    def tags(self) -> list[dict]:
        if not os.path.isdir(self._tags_dir()):
            return []
        out = []
        for f in sorted(os.listdir(self._tags_dir())):
            if f.endswith(".json") and not f.startswith("_tmp-"):
                with open(os.path.join(self._tags_dir(), f)) as fh:
                    out.append(json.load(fh))
        return out

    def tag_version(self, name: str) -> int:
        try:
            with open(os.path.join(self._tags_dir(), f"{name}.json")) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            raise LookupError(f"tag {name!r} does not exist at {self.path}") from None

    def read_tag(self, name: str) -> DataFrame:
        return self.read(version=self.tag_version(name))

    def delete_tag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self._tags_dir(), f"{name}.json"))
        except FileNotFoundError:
            raise LookupError(f"tag {name!r} does not exist at {self.path}") from None

    def drop_branch(self, name: str) -> dict:
        """Abandon a staging branch: pointer first (new branch commits are
        refused from that instant), then its version files. Data dirs the
        branch wrote stay on disk until ``expire_snapshots`` finds them
        unreferenced."""
        assert self.branch == "main", "drop branches from a main-opened table"
        self._branch_meta(name)  # typed error if it never existed
        os.unlink(self._branch_file(name))
        removed = 0
        for bv in self._branch_vfile_versions(os.listdir(self._ledger), name):
            os.remove(os.path.join(self._ledger, self._vfile_name(bv, name)))
            removed += 1
        return {"dropped": name, "removed_versions": removed}

    def rollback(self, version: int) -> dict:
        """Roll the table back to ``version`` by committing a NEW manifest
        that references that snapshot's file sets (nothing is rewritten or
        deleted — time travel forward remains possible until
        ``expire_snapshots``). ``last_batch_id`` reverts too, so replaying
        the undone batches converges the table exactly as the first time.
        """
        man = self.manifest(version)
        cur = self.manifest()
        new_version = cur["version"] + 1
        self._commit(
            {
                **man,
                "version": new_version,
                "batch_id": None,
                "cdf": [],
                # schemas lists are append-only across the whole ledger:
                # keep the CURRENT (longest) list, not the old snapshot's
                # prefix — changes() resolves every version's schema_id
                # against the latest manifest's schemas, so truncating here
                # would break feeds spanning pre-rollback schema evolutions
                # (the old snapshot's file refs index a prefix, so reads of
                # the rolled-back state are unaffected). One exception: if
                # a post-target RENAME/DROP removed a column the old
                # canonical schema still had, keeping the head canonical
                # would REFUSE replays of the undone span ('renamed to
                # ...; update the producer') — so re-append the old
                # canonical as a NEW entry, restoring the contract while
                # the list stays append-only. Purely additive evolution
                # (columns gained after the target) keeps the wider head
                # canonical: old-shape replays null-fill fine and the
                # change feed keeps resolving evolved spans.
                "schemas": (
                    [*cur["schemas"], man["schemas"][-1]]
                    if not (
                        set(schema_from_json(man["schemas"][-1]).fieldNames())
                        <= set(schema_from_json(cur["schemas"][-1]).fieldNames())
                    )
                    else cur["schemas"]
                ),
                # same append-only rule as schemas: the rename log indexes
                # into the full schema list, so the CURRENT log survives a
                # rollback (old snapshots' schema_ids resolve through it).
                "renames": cur.get("renames", []),
                "metrics": {"maintenance": "rollback", "to_version": version},
                "commit_ts": time.time(),
            }
        )
        # a rollback may cross a rebucket — re-adopt the restored layout
        self.num_buckets = man.get("num_buckets", self.num_buckets)
        return {"rolled_back_to": version, "version": new_version}

    def clone(self, dst_path: str, version: int | None = None) -> "LakeTable":
        """Zero-copy SHALLOW CLONE (the Delta ``CREATE TABLE ... SHALLOW
        CLONE`` / Iceberg snapshot-ref analog): commit a NEW table at
        ``dst_path`` whose v0 manifest references THIS table's data files
        by ABSOLUTE path — no bytes move, so forking a 100 TB table for a
        dev/backfill/what-if experiment is one metadata commit, and the
        reference repo's copy-the-collection-then-clean workflow
        (post_cdm_cleanup.py's staging copies) becomes free.

        The clone then diverges independently: its writes land under its
        own directory (every read site resolves file refs with
        ``os.path.join(self.path, ref)``, where an absolute source ref
        wins the join, so MoR chains may mix source-absolute bases with
        clone-local deltas), and ``compact()`` rewrites every referenced
        byte locally — a full detach. Carried over: schema history +
        rename log (old file sets still resolve), constraints, properties,
        layout (bucket col/count/fn), zone-map lineage, and the batch
        ledger (``last_batch_id`` — a forked ingest pipeline resumes its
        stream exactly-once instead of re-applying the head batch). NOT
        carried: version history and the change feed — the clone's ledger
        restarts at v0 (its v0 IS the source snapshot), so ``changes()``
        serves clone-era commits only, and time travel into pre-clone
        states belongs to the source.

        Caveat (same as Delta's shallow clone): ``expire_snapshots`` /
        ``rebucket`` on the SOURCE can remove files the clone still
        references — ``compact()`` the clone (or re-clone) before running
        destructive maintenance on the source. ``version`` clones a
        historical snapshot (time-travel fork); default = current head.
        """
        # branch states are staging: drop_branch/publish_branch may remove
        # the very data dirs a clone would reference — fork main only
        # (publish the branch first if its state is what you want to fork)
        assert self.branch == "main", "clone a main-opened table"
        man = self.manifest(version)

        def _abs(fs: dict) -> dict:
            # abspath, not join: a source opened via a RELATIVE path must
            # still yield refs that resolve from the clone's directory
            p = fs["path"]
            return {**fs, "path": p if os.path.isabs(p)
                    else os.path.abspath(os.path.join(self.path, p))}

        buckets: dict = {}
        for k, e in man["buckets"].items():
            if "path" in e:  # pre-MoR shape: base only
                buckets[k] = _abs(e)
                continue
            ne = dict(e)
            if ne.get("base"):
                ne["base"] = _abs(ne["base"])
            ne["deltas"] = [_abs(d) for d in ne.get("deltas", [])]
            buckets[k] = ne
        dst = LakeTable(
            self.spark,
            dst_path,
            key_cols=self.key_cols,
            bucket_col=self.bucket_col,
            num_buckets=man.get("num_buckets", self.num_buckets),
            merge_mode=self.merge_mode,
            compact_deltas=self.compact_deltas,
            cow_change_feed=self.cow_change_feed,
            bucket_fn=self.bucket_fn,
            stats_cols=self.stats_cols,
            schema_mode=self.schema_mode,
            target_file_rows=self.target_file_rows,
            bloom_cols=self.bloom_cols,
            # resolution semantics must ride the handle TOO: the commit
            # below persists them, but this handle is returned pre-reopen —
            # without these a partial_update clone would resolve whole-row
            # LWW (patch NULLs erasing columns) and fork the manifest's
            # engine on its first commit.
            merge_engine=self.merge_engine,
            agg_spec=self.agg_spec or None,
            changelog=self.changelog,
        )
        if dst.exists():
            raise RuntimeError(
                f"refusing to clone onto an existing lake table at {dst_path}"
            )
        dst._commit(
            {
                "format_version": man.get("format_version", FORMAT_VERSION),
                "version": 0,
                "batch_id": None,
                "last_batch_id": man.get("last_batch_id", -1),
                "schemas": list(man["schemas"]),
                "renames": man.get("renames", []),
                "buckets": buckets,
                "num_buckets": man.get("num_buckets", self.num_buckets),
                "key_cols": list(self.key_cols),
                "bucket_col": self.bucket_col,
                "bucket_fn": self.bucket_fn,
                "merge_engine": self.merge_engine,
                "agg_spec": self.agg_spec,
                "lineage": man.get("lineage", {}),
                "constraints": man.get("constraints", []),
                "properties": dict(man.get("properties", {})),
                "metrics": {
                    "maintenance": "clone",
                    "source": self.path,
                    "source_version": man["version"],
                },
                "commit_ts": time.time(),
            }
        )
        return dst

    def verify_integrity(self, version: int | None = None) -> dict:
        """fsck for the lake format: audit the structural invariants the
        engine's correctness rests on (manifest refs resolve, rows sit in
        the bucket their key hashes to, no key is live in two buckets,
        zone-map stats bound their data, CHECK constraints hold, ledger
        invariants hold across retained versions). Read-only; three
        distributed jobs regardless of table size. See
        :mod:`cdm_to_mods_spark.plans.fsck` for the full contract — the
        lake-scale analog of the reference's end-of-run verification pass
        (post_cdm_cleanup.py:15-37)."""
        from .fsck import verify_integrity

        return verify_integrity(self, version)

    # ------------------------------------------------- schema evolution
    # Metadata-only ALTER TABLE: add/drop/rename commit a new schema list
    # entry (append-only) and rewrite NO data — old file sets keep their
    # bytes and are resolved per recorded schema_id (add → null-fill,
    # drop → projected away, rename → rename-log name mapping in
    # ``_stored_name``). Implicit ADD also still happens when a change
    # batch arrives with extra columns (evolve_schema).

    def _alter_commit(self, man: dict, schema: T.StructType, metrics: dict,
                      renames: list | None = None) -> dict:
        new_version = man["version"] + 1
        self._commit(
            {
                **man,
                "version": new_version,
                "batch_id": None,
                "cdf": [],
                "schemas": [*man["schemas"], schema.json()],
                "renames": renames if renames is not None
                else man.get("renames", []),
                "metrics": metrics,
                "commit_ts": time.time(),
            }
        )
        return {**metrics, "version": new_version}

    def _assert_constraints_analyze(self, man: dict,
                                    schema: T.StructType) -> None:
        """DDL guard: every CHECK constraint must still analyze against the
        post-ALTER schema — otherwise the next apply_changes fails deep in
        its write job with an unresolved-column error and the table is
        bricked until someone guesses which constraint to drop. Refusing
        the ALTER up front names the offender instead."""
        probe = self._empty(schema, hidden=False)
        for c in man.get("constraints", []):
            try:
                probe.filter(F.expr(c["expr"])).schema
            except Exception as e:
                raise SchemaEvolutionError(
                    f"constraint {c['name']!r} CHECK ({c['expr']}) would no "
                    f"longer resolve after this ALTER; drop or recreate the "
                    f"constraint first ({e.__class__.__name__})"
                ) from None

    def _assert_fresh_name(self, man: dict, name: str) -> None:
        """Refuse any name that EVER existed: a historical file still
        carries that physical column, and name-based resolution would read
        the old bytes as the new field (the aliasing Iceberg prevents with
        field IDs). Re-using a retired name requires a full rewrite
        (``rebucket`` after the alter folds history to the head schema)."""
        if name in (SEQ_COL, DELETED_COL, "_bucket"):
            raise SchemaEvolutionError(f"{name!r} is a reserved column name")
        for s in man["schemas"]:
            if name in schema_from_json(s).fieldNames():
                raise SchemaEvolutionError(
                    f"column name {name!r} exists in table history; "
                    "historical file sets would alias it"
                )
        if any(r["new"] == name or r["old"] == name
               for r in man.get("renames", [])):
            raise SchemaEvolutionError(
                f"column name {name!r} appears in the rename log"
            )

    def add_column(self, name: str, dtype) -> dict:
        """ALTER TABLE ADD COLUMN (nullable; metadata-only). ``dtype`` is a
        DataType or DDL string. Existing rows read as null."""
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        man = self.manifest()
        self._assert_fresh_name(man, name)
        canon = self._canonical_schema(man)
        schema = T.StructType(
            [*canon.fields, T.StructField(name, dtype, True)]
        )
        return self._alter_commit(
            man, schema, {"maintenance": "add_column", "column": name,
                          "dtype": dtype.simpleString()}
        )

    def widen_column(self, name: str, dtype) -> dict:
        """ALTER TABLE ALTER COLUMN TYPE — widenings only (metadata-only;
        the Delta 3.x type-widening DDL). Same lattice as the implicit
        batch-driven widening (int→long, float→double, date→timestamp, …):
        the new type must BE the widened join of old and new, so narrowing
        and cross-family changes are refused up front. Historical files
        keep their narrow bytes and cast to the canonical type per recorded
        ``schema_id`` on read — identical to how an implicitly-widened
        batch already reads back. The bucket column is pinned: its hash
        layout depends on the stored type, so widening it would silently
        re-key every bucket (rebucket after a full rewrite instead)."""
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        if name == self.bucket_col:
            raise SchemaEvolutionError(
                f"{name!r} is the bucket column; its hash layout is typed — "
                "widening it requires a rebucket rewrite"
            )
        man = self.manifest()
        canon = self._canonical_schema(man)
        if name not in canon.fieldNames():
            raise SchemaEvolutionError(f"no column {name!r}")
        cur = canon[name].dataType
        if cur == dtype:
            raise SchemaEvolutionError(
                f"{name!r} is already {dtype.simpleString()}"
            )
        if widen_type(cur, dtype) != dtype:
            raise SchemaEvolutionError(
                f"{cur.simpleString()} -> {dtype.simpleString()} is not a "
                "widening"
            )
        schema = T.StructType(
            [
                T.StructField(name, dtype, f.nullable)
                if f.name == name
                else f
                for f in canon.fields
            ]
        )
        self._assert_constraints_analyze(man, schema)
        return self._alter_commit(
            man, schema, {"maintenance": "widen_column", "column": name,
                          "dtype": dtype.simpleString()}
        )

    def drop_column(self, name: str) -> dict:
        """ALTER TABLE DROP COLUMN (metadata-only): the field leaves the
        canonical schema; stored bytes remain until buckets are rewritten
        by later merges/compaction. Key and bucket columns are load-bearing
        and cannot be dropped. Time travel to pre-drop versions still shows
        the column."""
        if name in self.key_cols or name == self.bucket_col:
            raise SchemaEvolutionError(
                f"{name!r} is a key/bucket column; drop is not allowed"
            )
        man = self.manifest()
        canon = self._canonical_schema(man)
        if name not in canon.fieldNames():
            raise SchemaEvolutionError(f"no column {name!r}")
        schema = T.StructType([f for f in canon.fields if f.name != name])
        self._assert_constraints_analyze(man, schema)
        return self._alter_commit(
            man, schema, {"maintenance": "drop_column", "column": name}
        )

    def rename_column(self, old: str, new: str) -> dict:
        """ALTER TABLE RENAME COLUMN (metadata-only): appends a schema with
        the field renamed plus a rename-log entry; readers map the
        canonical name back through the log per file set's schema_id, so
        data written under ANY historical name resolves without rewrite.
        Key/bucket columns are pinned in the manifest and change-batch
        contract; renaming them is refused."""
        if old in self.key_cols or old == self.bucket_col:
            raise SchemaEvolutionError(
                f"{old!r} is a key/bucket column; rename is not allowed"
            )
        man = self.manifest()
        canon = self._canonical_schema(man)
        if old not in canon.fieldNames():
            raise SchemaEvolutionError(f"no column {old!r}")
        self._assert_fresh_name(man, new)
        schema = T.StructType(
            [
                T.StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in canon.fields
            ]
        )
        self._assert_constraints_analyze(man, schema)
        renames = [
            *man.get("renames", []),
            {"at": len(man["schemas"]), "old": old, "new": new},
        ]
        return self._alter_commit(
            man, schema,
            {"maintenance": "rename_column", "from": old, "to": new},
            renames=renames,
        )

    # ------------------------------------------------- table properties
    # Free-form TBLPROPERTIES on the manifest (owner, retention policy,
    # pipeline tags — the reference's per-collection alias config dict,
    # convert_cdm_to_mods.py:84-102, as committed table metadata). Pure
    # metadata commits; every ``{**man}`` maintenance path carries them.

    def properties(self) -> dict:
        """Current table properties (string → string)."""
        return dict(self.manifest().get("properties", {}))

    def set_property(self, key: str, value: str) -> dict:
        """SET TBLPROPERTIES (key = value) — one metadata commit."""
        man = self.manifest()
        props = {**man.get("properties", {}), str(key): str(value)}
        self._commit(
            {
                **man,
                "version": man["version"] + 1,
                "batch_id": None,
                "cdf": [],
                "properties": props,
                "metrics": {"maintenance": "set_property", "key": str(key)},
                "commit_ts": time.time(),
            }
        )
        return {"version": man["version"] + 1, "properties": props}

    def unset_property(self, key: str) -> dict:
        """UNSET TBLPROPERTIES (key) — missing keys are a no-op commit-free."""
        man = self.manifest()
        props = dict(man.get("properties", {}))
        if str(key) not in props:
            return {"version": man["version"], "properties": props}
        props.pop(str(key))
        self._commit(
            {
                **man,
                "version": man["version"] + 1,
                "batch_id": None,
                "cdf": [],
                "properties": props,
                "metrics": {"maintenance": "unset_property", "key": str(key)},
                "commit_ts": time.time(),
            }
        )
        return {"version": man["version"] + 1, "properties": props}

    # --------------------------------------------------- CHECK constraints
    # Table invariants, enforced on every write (the Delta CHECK-constraint
    # / invariant model; reference analog: the XSD validation gate every
    # converted record must pass before packaging,
    # convert_cdm_to_mods.py:376-385). A violating batch FAILS before its
    # commit publishes — nothing lands, the table is untouched, and the
    # batch can be re-applied after the producer or the constraint is
    # fixed. Enforcement is an inline guard on the merge's own projection
    # (``raise_error`` folded into the ``_seq`` column, which nothing can
    # prune), so a 10^10-event replay pays ZERO extra passes and zero extra
    # jobs for any number of constraints. Delete events are exempt — their
    # payload is nulled by construction. SQL semantics: a NULL predicate
    # result passes (CHECK fails only on FALSE).

    def constraints(self) -> list[dict]:
        """Active CHECK constraints: ``[{"name", "expr"}, ...]``."""
        return list(self.manifest().get("constraints", []))

    def add_constraint(self, name: str, expr: str, *,
                       validate: bool = True) -> dict:
        """ALTER TABLE ADD CONSTRAINT name CHECK (expr). ``expr`` is a SQL
        predicate over canonical columns. With ``validate`` (default), one
        scan proves EXISTING rows satisfy it first — refusing a constraint
        the table already violates (Delta's add-constraint behavior)."""
        man = self.manifest()
        cons = list(man.get("constraints", []))
        if any(c["name"] == name for c in cons):
            raise ValueError(f"constraint {name!r} already exists")
        # analyze the predicate against the canonical schema now — a typo
        # should fail here, not inside a later replay's write job
        probe = self._empty(self._canonical_schema(man), hidden=False)
        probe.filter(F.expr(expr)).schema
        if validate:
            n_bad = (
                self.read()
                .filter(~F.coalesce(F.expr(expr), F.lit(True)))
                .count()
            )
            if n_bad:
                raise ValueError(
                    f"cannot add constraint {name!r}: {n_bad} existing "
                    f"rows violate CHECK ({expr})"
                )
        self._commit(
            {
                **man,
                "version": man["version"] + 1,
                "batch_id": None,
                "cdf": [],
                "constraints": [*cons, {"name": name, "expr": expr}],
                "metrics": {"maintenance": "add_constraint", "name": name,
                            "expr": expr},
                "commit_ts": time.time(),
            }
        )
        return {"constraint": name, "version": man["version"] + 1}

    def drop_constraint(self, name: str) -> dict:
        """ALTER TABLE DROP CONSTRAINT (metadata-only)."""
        man = self.manifest()
        cons = list(man.get("constraints", []))
        if not any(c["name"] == name for c in cons):
            raise ValueError(f"no constraint {name!r}")
        self._commit(
            {
                **man,
                "version": man["version"] + 1,
                "batch_id": None,
                "cdf": [],
                "constraints": [c for c in cons if c["name"] != name],
                "metrics": {"maintenance": "drop_constraint", "name": name},
                "commit_ts": time.time(),
            }
        )
        return {"dropped": name, "version": man["version"] + 1}

    # ------------------------------------------------------------- create
    def create(self, schema: T.StructType) -> None:
        """Initialize an empty table at schema (snapshot v0, no data)."""
        # a typo'd agg_spec key would otherwise persist silently and the
        # real column would fall back to 'last' — wrong data, no error
        missing = [c for c in self.agg_spec if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"agg_spec column(s) {missing} not in the table schema "
                f"{schema.fieldNames()} — fix the spec (or the schema)"
            )
        self._commit(
            {
                "format_version": FORMAT_VERSION,
                "version": 0,
                "batch_id": None,
                "last_batch_id": -1,
                "schemas": [schema.json()],
                "buckets": {},
                "num_buckets": self.num_buckets,
                "key_cols": list(self.key_cols),
                "bucket_col": self.bucket_col,
                "bucket_fn": self.bucket_fn,
                "merge_engine": self.merge_engine,
                "agg_spec": self.agg_spec,
                "lineage": {},
                "constraints": [],
                "metrics": {},
                "commit_ts": time.time(),
            }
        )

    # --------------------------------------------------------------- read
    def _canonical_schema(self, man: dict) -> T.StructType:
        return schema_from_json(man["schemas"][-1])

    def _empty(self, schema: T.StructType, hidden: bool) -> DataFrame:
        full = T.StructType(
            schema.fields
            + (
                [
                    T.StructField(SEQ_COL, T.LongType(), False),
                    T.StructField(DELETED_COL, T.BooleanType(), False),
                ]
                if hidden
                else []
            )
        )
        return self.spark.createDataFrame([], full)

    def _capped(self, writer):
        """Shared physical write options for every bucket write site (merge
        deltas, cow rewrites, compaction, rebucket, bootstrap):
        ``target_file_rows`` (maxRecordsPerFile — manifest entries are
        directory-granular, so splitting a bucket's write into N files
        changes nothing for readers or footer stats) and per-column parquet
        BLOOM FILTERS for ``bloom_cols``."""
        if self.target_file_rows is not None:
            writer = writer.option(
                "maxRecordsPerFile", str(self.target_file_rows)
            )
        for c, ndv in self.bloom_cols.items():
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
            if ndv:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
                )
        return writer

    @staticmethod
    def _bucket_files(entry: dict) -> list[dict]:
        """Normalize a manifest bucket entry to a list of file-set dicts
        ``{"path", "schema_id"}`` (base first, then the delta chain)."""
        if "path" in entry:  # pre-MoR manifest shape: base only
            return [entry]
        out = [entry["base"]] if entry.get("base") else []
        out.extend(entry.get("deltas", []))
        return out

    @staticmethod
    def _mor_entry(entry: dict) -> dict:
        """Normalize a manifest bucket entry to the MoR ``{"base",
        "deltas"}`` shape (pre-MoR manifests stored the base file set
        directly). ONE owner: every site that rewrites bucket entries
        must normalize through here, or a future change to the entry
        shape (like the sink's ``unresolved`` mark) silently diverges."""
        return entry if "path" not in entry else {"base": entry, "deltas": []}

    def _mor_buckets(self, buckets: dict) -> dict:
        """`_mor_entry` over a manifest's whole ``buckets`` map."""
        return {k: self._mor_entry(e) for k, e in buckets.items()}

    def _needs_resolve(self, entries) -> bool:
        """True when a stored-row scan over ``entries`` (manifest bucket
        values) may contain more than one version of a key, so readers
        must run ``_resolve_lww`` before treating rows as live state.
        Two triggers: a chain of >1 file sets (base + deltas), or ANY
        file set marked ``unresolved`` — the native sink
        (sources/lake_sink.py) appends RAW event batches that can hold
        several versions of one key inside a single set, whereas apply
        collapses in-batch before writing."""
        return any(
            len(self._bucket_files(e)) > 1
            or any(fs.get("unresolved") for fs in self._bucket_files(e))
            for e in entries
        )

    def _read_raw(
        self,
        man: dict,
        buckets: list[int] | None = None,
        canon: T.StructType | None = None,
        file_meta: bool = False,
        skip_missing: bool = False,
    ) -> DataFrame:
        """Assemble stored rows (incl. tombstones + hidden cols, and — for
        buckets with delta chains — superseded row versions) at the
        canonical schema (``canon`` overrides — used mid-merge when the
        change batch just evolved it), casting old-schema file sets up and
        null-filling newly added columns. File sets are grouped by recorded
        schema_id so we build O(#schema-versions) DataFrames, not
        O(#buckets). ``file_meta`` appends ``_claimed_bucket`` (the bucket
        id from the file's ``_bucket=N`` dir) and ``_fileset_dir`` (that
        dir's absolute path) — the audit's provenance columns;
        ``skip_missing`` drops refs that don't resolve on disk instead of
        failing the whole scan (the audit reports them separately)."""
        if canon is None:
            canon = self._canonical_schema(man)
        entries = man["buckets"]
        if buckets is not None:
            entries = {str(b): entries[str(b)] for b in buckets if str(b) in entries}
        if not entries:
            return self._empty(canon, hidden=True)

        by_schema: dict[int, list[str]] = {}
        for e in entries.values():
            for fs in self._bucket_files(e):
                p = fs["path"]
                ap = p if os.path.isabs(p) else os.path.join(self.path, p)
                if skip_missing and not os.path.exists(ap):
                    continue
                by_schema.setdefault(fs["schema_id"], []).append(ap)
        return self._assemble_stored(man, by_schema, canon, file_meta=file_meta)

    def _assemble_stored(
        self,
        man: dict,
        by_schema: dict[int, list[str]],
        canon: T.StructType,
        file_meta: bool = False,
    ) -> DataFrame:
        """Shared assembly for every stored-row reader (`_read_raw`, the
        change feed): per recorded schema_id, read that group's paths,
        resolve each canonical field through the rename log
        (``_stored_name``), cast up / null-fill, keep the hidden columns,
        and union the groups — ONE place owns schema-evolution resolution
        for JVM-side reads (the streaming source's Arrow path mirrors it
        in pure pyarrow, where no SparkSession exists)."""
        if not by_schema:
            return self._empty(canon, hidden=True)
        parts: list[DataFrame] = []
        for sid, paths in by_schema.items():
            stored = set(schema_from_json(man["schemas"][sid]).fieldNames())
            df = self.spark.read.parquet(*paths)
            cols = []
            for f in canon.fields:
                sname = _stored_name(man, sid, f.name)
                if sname in stored:
                    cols.append(F.col(sname).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            cols += [F.col(SEQ_COL), F.col(DELETED_COL)]
            if file_meta:
                cols += [
                    F.regexp_extract(
                        F.col("_metadata.file_path"), r"_bucket=([0-9]+)/", 1
                    ).cast("int").alias("_claimed_bucket"),
                    F.regexp_extract(
                        F.col("_metadata.file_path"),
                        r"^(?:file:)?(.*_bucket=[0-9]+)/", 1,
                    ).alias("_fileset_dir"),
                ]
            parts.append(df.select(cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _resolve_live(
        self, raw: DataFrame, man: dict, buckets: list[int] | None = None
    ) -> DataFrame:
        """Shared reader tail for read/read_keys/read_range: merge delta
        chains (max ``_seq`` per key) when any selected bucket carries one
        — pure-base selections skip the resolution shuffle entirely — then
        drop tombstones and hidden columns."""
        sel = (
            list(man["buckets"].values())
            if buckets is None
            else [man["buckets"][str(b)] for b in buckets
                  if str(b) in man["buckets"]]
        )
        if self._needs_resolve(sel):
            # the SAME op-ranked tie-break as every fold (_resolve_lww):
            # equal _seq arises when delete_where/update_where spend an LSN
            # a source event also uses — a bare payload-struct tie-break
            # here could disagree with the fold, so compaction would CHANGE
            # the visible state of a tied key.
            raw = self._resolve_lww(raw)
        return raw.filter(~F.col(DELETED_COL)).drop(SEQ_COL, DELETED_COL)

    def read(self, version: int | None = None) -> DataFrame:
        """User-visible table state: live rows, canonical schema."""
        man = self.manifest(version)
        return self._resolve_live(self._read_raw(man), man)

    def read_keys(self, bucket_keys: list, version: int | None = None) -> DataFrame:
        """Bucket-pruned point read: rows whose ``bucket_col`` is in
        ``bucket_keys``, touching ONLY those keys' buckets (manifest-level
        file pruning — the lake-format analog of partition pruning, on top
        of the parquet predicate pushdown Catalyst already does). At 100 TB
        this turns a conversation lookup into an O(|keys|)-file-sets scan."""
        man = self.manifest(version)
        # probe at the table's native bucket-column type — hashing string
        # forms of a non-string key would select the wrong buckets.
        key_type = self._canonical_schema(man)[self.bucket_col].dataType
        if not bucket_keys:  # empty probe: no buckets, no schema inference
            return self._empty(self._canonical_schema(man), hidden=False)
        # hash32 layouts hash the probe DRIVER-SIDE via the numpy murmur3
        # port (parity-pinned numpy == scalar == JVM in test_lake_sink):
        # a point lookup then launches ZERO jobs before its pruned scan —
        # the Spark-job fallback below had cost one key-hash job PER
        # lookup (and one per partition on the router's fan-out probe).
        # Layout comes from the PINNED manifest, not the handle: a
        # time-travel read crossing a rebucket must hash under the
        # layout that wrote that snapshot's bucket ids, or the prune
        # would read the wrong buckets and silently drop the row.
        nb = man.get("num_buckets", self.num_buckets)
        fn = man.get("bucket_fn", self.bucket_fn)
        needed = (
            _driver_bucket_ids(bucket_keys, key_type, nb)
            if fn == "hash32"
            else None
        )
        if needed is None:
            keys_df = self.spark.createDataFrame(
                [(k,) for k in bucket_keys], [self.bucket_col]
            ).select(
                F.col(self.bucket_col).cast(key_type).alias(self.bucket_col)
            )
            needed = sorted(
                r["_b"]
                for r in keys_df.select(
                    _bucket_expr(self.bucket_col, nb, fn).alias("_b")
                )
                .distinct()
                .collect()
            )
        raw = self._read_raw(man, buckets=needed).filter(
            F.col(self.bucket_col).isin(bucket_keys)
        )
        return self._resolve_live(raw, man, needed)

    def _refuse_on_aggregate(self, op: str) -> None:
        """Aggregation is not retractable (a stored sum cannot subtract
        what a delete or a set-style update would undo) — Paimon's rule
        for non-retractable aggregate fields, enforced at every mutation
        entry point that re-emits or kills existing rows. First-row is
        immutable by construction (a stored first write cannot be
        re-emitted, killed or updated — mutations would silently lose to
        the stored row's lower rank), so the same surfaces refuse."""
        if self.merge_engine == "aggregate":
            raise ValueError(
                f"{op} is not supported on merge_engine='aggregate' "
                "tables: aggregates are not retractable — append "
                "corrective contribution events instead"
            )
        if self.merge_engine == "first_row":
            raise ValueError(
                f"{op} is not supported on merge_engine='first_row' "
                "tables: the first write per key is immutable — a "
                "mutation's higher-rank rows would silently lose to it"
            )

    def _resolve_lww(self, raw: DataFrame) -> DataFrame:
        """Per-key resolution over stored rows — the ONE owner every fold,
        the cow merge and the read path share (any divergence between
        those copies is a silent correctness fork). Stored rows re-derive
        ``op`` from the tombstone flag. Under the default ``lww`` engine:
        one row per key, max ``_seq``, ties op-ranked U>I>D. Under
        ``partial_update``: column-level last-non-null merge
        (``operators.dedup.resolve_partial_update``) — system columns
        (``_bucket`` etc.) resolve whole-row-style so tombstones keep
        their bucket assignment through folds."""
        with_op = raw.withColumn(
            "op", F.when(F.col(DELETED_COL), "D").otherwise("U")
        )
        if self.merge_engine == "aggregate":
            carry = [
                c
                for c in raw.columns
                if c.startswith("_") and c not in (SEQ_COL, DELETED_COL)
            ]
            out = resolve_aggregate(
                with_op.drop(DELETED_COL),
                self.key_cols,
                SEQ_COL,
                "op",
                spec=self.agg_spec,
                carry_cols=carry,
            )
            # no tombstones ever land on aggregate tables (D refused)
            return out.withColumn(
                DELETED_COL, F.lit(False)
            ).drop("op").select(*raw.columns)
        if self.merge_engine == "first_row":
            # no tombstones can exist (D refused at every entry point), so
            # whole-row min-rank is the complete rule.
            return first_per_key(with_op, self.key_cols, SEQ_COL).drop("op")
        if self.merge_engine == "partial_update":
            carry = [
                c
                for c in raw.columns
                if c.startswith("_") and c not in (SEQ_COL, DELETED_COL)
            ]
            out = resolve_partial_update(
                with_op.drop(DELETED_COL),
                self.key_cols,
                SEQ_COL,
                "op",
                carry_cols=carry,
                # stored state must keep each key's max delete rank as a
                # tombstone row beside a re-created live row — collapsing
                # it away would let pre-delete columns in OLDER file sets
                # resurrect at the next resolution.
                preserve_kill=True,
            )
            return out.withColumn(
                DELETED_COL, F.col("op") == "D"
            ).drop("op").select(*raw.columns)
        return latest_per_key(with_op, self.key_cols, SEQ_COL).drop("op")

    @staticmethod
    def _coerce_bound(v, dtype: T.DataType):
        """Coerce a user range bound to the stats column's Python-native
        type, so the pushed filter and the zone-map prune see the SAME
        effective bound. Lossy coercions (datetime → date) truncate HERE,
        identically for both consumers — a filter-side-only cast would
        widen the filter below the prune bound and silently drop rows."""
        import datetime as _dt

        if isinstance(dtype, T.TimestampType):
            if isinstance(v, str):
                return _dt.datetime.fromisoformat(v)
            if isinstance(v, _dt.datetime):
                return v
            if isinstance(v, _dt.date):
                return _dt.datetime(v.year, v.month, v.day)
        elif isinstance(dtype, T.DateType):
            if isinstance(v, str):
                return _dt.date.fromisoformat(v)
            if isinstance(v, _dt.datetime):
                return v.date()  # explicit truncation, used by BOTH sides
            if isinstance(v, _dt.date):
                return v
        elif isinstance(v, (int, float, str)):
            # numeric/string columns: pass through untyped — the filter
            # comparison lets Spark WIDEN the column (int col vs float
            # bound compares as double), matching Python's comparison of
            # the stored scalar against the bound; no truncating cast.
            return v
        raise TypeError(
            f"unsupported bound {v!r} for range column type {dtype.simpleString()}"
        )

    def _range_buckets(self, man: dict, col: str, lo, hi) -> list[int]:
        """Bucket ids whose stored rows MAY have ``col`` in [lo, hi], per
        the zone maps on the manifest's file-set entries. A bucket is
        skipped only when EVERY file set carries stats for ``col`` and
        every one is disjoint from the range — any file set without stats
        (legacy manifest, all-null column, untracked column) keeps its
        bucket in. Bucket granularity is the merge-on-read-safe skipping
        unit: a delta row outside the range can supersede an in-range base
        row, so individual file sets of a surviving bucket must all be
        read for last-write-wins resolution; but if NO stored row of a
        bucket is in range, no resolved row can be either."""
        lo, hi = _stat_scalar(lo), _stat_scalar(hi)
        if lo is None or hi is None:
            raise ValueError("range bounds must be finite and non-NaN")
        keep: list[int] = []
        for b, e in man["buckets"].items():
            for fs in self._bucket_files(e):
                st = (fs.get("stats") or {}).get(col)
                if st is None or not (st[1] < lo or st[0] > hi):
                    keep.append(int(b))
                    break
        return sorted(keep)

    def read_range(self, lo, hi, col: str = "ts", version: int | None = None) -> DataFrame:
        """Time/range-bounded read: live rows with ``col`` BETWEEN lo AND
        hi (inclusive; null ``col`` never matches), touching only the
        buckets whose zone maps overlap the range — manifest-level
        skipping, before any file listing or footer read.

        Where this wins at 100 TB (honest boundary): on a hash-bucketed
        table the prune is strongest for RECENT-window reads — a window
        touches O(events-in-window) buckets when ``num_buckets`` is large
        (a micro-batch's deltas land in few buckets, and an untouched
        bucket's base + delta stats all predate the window), so "state as
        of the last hour/day" scans recent activity, not the table. A
        mid-history window over long-compacted buckets prunes little,
        since each base file's min/max spans the bucket's full lifetime;
        the layout fix for that access pattern is a time-partitioned spec
        (months(ts) × bucket(key), Iceberg-style), not zone maps. Either
        way the surviving scan still gets parquet row-group min/max
        pruning from the pushed-down filter. Bounds may be ``datetime`` /
        ``date`` / ISO strings for time columns (mixing styles per bound
        is fine), or numbers/strings matching other column types — each
        bound is coerced ONCE (``_coerce_bound``) and the same coerced
        value feeds both the prune and the filter, so they can never
        disagree on the effective range."""
        man = self.manifest(version)
        lo, hi = self._coerce_range_bounds(man, col, lo, hi)
        keep = self._range_buckets(man, col, lo, hi)
        raw = self._read_raw(man, buckets=keep)
        return self._resolve_live(raw, man, keep).filter(
            F.col(col).between(F.lit(lo), F.lit(hi))
        )

    def _coerce_range_bounds(self, man: dict, col: str, lo, hi):
        """Shared bound normalization for range reads (this table's
        ``read_range`` and the partition router's fused variant): coerce
        each bound ONCE to the stats column's native type, and localize
        NAIVE timestamp bounds in the SESSION timezone, making them
        unambiguous instants BEFORE both consumers — ``F.lit(naive)``
        means session-tz wall time while the zone maps store UTC epochs
        (``_stat_scalar``); on a non-UTC session the prune and the filter
        would otherwise disagree by the UTC offset and silently skip
        buckets holding matching rows."""
        canon = self._canonical_schema(man)
        dtype = canon[col].dataType
        lo, hi = self._coerce_bound(lo, dtype), self._coerce_bound(hi, dtype)
        if isinstance(dtype, T.TimestampType):
            from zoneinfo import ZoneInfo

            tz = ZoneInfo(
                self.spark.conf.get("spark.sql.session.timeZone", "UTC")
            )
            if lo.tzinfo is None:
                lo = lo.replace(tzinfo=tz)
            if hi.tzinfo is None:
                hi = hi.replace(tzinfo=tz)
        return lo, hi

    def schema(self) -> T.StructType:
        return self._canonical_schema(self.manifest())

    def next_seq(self) -> int:
        """The next free event sequence number (1 + max applied ``_seq``)
        — the seq an external producer (e.g. the SQL INSERT router)
        should stamp on change events it synthesizes itself."""
        man = self.manifest()
        return self._next_seq(man, self._canonical_schema(man))

    # ------------------------------------------------------- change feed
    # ---------------------------------------------------- typed changelog
    @staticmethod
    def _plain_cdf(m: dict) -> list:
        """The version's replication change files — ``cdf`` entries minus
        typed-changelog records (which carry a ``kind`` marker so the two
        planes share one manifest list and one GC/publish/carry path)."""
        return [e for e in m.get("cdf", []) if "kind" not in e]

    @staticmethod
    def version_changed_state(m: dict) -> bool:
        """True when the (raw or materialized) manifest ``m`` records a
        commit that changed TABLE STATE — the classification the typed-
        changelog readers use to refuse silently skipping a version that
        carries no changelog records. ONE owner for the predicate: both
        :meth:`row_changes` and the streaming ``mode="row_changes"`` reader
        call it (a divergence would make the batch reader raise where the
        stream silently skips, desynchronizing retraction consumers).
        Pure dict logic — the streaming reader runs with no SparkSession."""
        metrics = m.get("metrics", {}) or {}
        return (
            any("kind" not in e for e in m.get("cdf", []))
            or (
                metrics.get("mode") == "cow"
                and metrics.get("n_buckets_touched", 0) > 0
            )
            or metrics.get("maintenance") in ("rollback", "delete_where")
        )

    def _emit_changelog(
        self,
        man: dict,
        canon: T.StructType,
        batch: DataFrame,
        affected: list,
        data_rel: str,
        schema_id: int,
        persisted: list | None = None,
        batch_rows: int | None = None,
    ) -> list:
        """Materialize the typed row changelog for one commit (the Paimon
        ``changelog-producer=lookup`` / Delta CDC ``_change_type`` role).

        ``batch`` is the commit's RESOLVED change set (canonical columns +
        ``_seq``/``_deleted``); ``man`` is the PRE-commit manifest. Old
        values come from one bucket-pruned read of the touched buckets
        semi-joined to the batch's keys — O(touched buckets), the same
        cost class as the cow merge, which is exactly the lookup
        producer's documented tax. New values are the engine's own
        resolution of old ∪ batch, so every merge engine (lww /
        partial_update / aggregate) yields its true post-images without
        re-stating its semantics here. Classification and no-op
        suppression happen in ONE projection + explode — no per-class
        scans, no driver round trips.

        Empty-table fast path (bootstrap / first load): every resolved row
        is an insert, and the commit just wrote those rows as its change
        files — record a ``changelog_derive_insert`` reference to them
        instead of writing the whole snapshot twice (the same derivation
        Delta CDC uses for insert-only commits).
        """
        keys = list(self.key_cols)
        if not man["buckets"]:
            return [
                {
                    "path": f"{data_rel}/_bucket={b}",
                    "schema_id": schema_id,
                    "kind": "changelog_derive_insert",
                }
                for b in affected
            ]
        batch = batch.select(
            *[F.col(f.name) for f in canon.fields],
            F.col(SEQ_COL), F.col(DELETED_COL),
        )
        old_raw = self._read_raw(man, buckets=affected, canon=canon)
        # broadcast the batch's key set explicitly: AQE is scoped OFF
        # inside the apply pipeline, so without the hint this semi-join
        # would shuffle the ENTIRE touched-bucket scan just to probe
        # O(batch) keys — map-side semi probe keeps the old side
        # shuffle-free. Guarded by the batch's row count (already known
        # driver-side from the write's footer/observation stats): a
        # wide-backfill batch with millions of keys must NOT be forced
        # through the driver as a broadcast — shuffle is the right plan
        # there, and both sides of that shuffle are O(batch).
        probe = batch.select(*keys).distinct()
        if batch_rows is not None and batch_rows <= 2_000_000:
            probe = F.broadcast(probe)
        old_res = self._resolve_lww(
            old_raw.join(probe, keys, "left_semi")
        )
        # old_res feeds BOTH join branches (pre-images directly, post-images
        # through the union resolution) — without a persist the physical
        # plan scans + resolves the touched buckets twice per commit. The
        # restricted frame is O(batch keys), cheap to cache.
        old_res = old_res.persist(StorageLevel.MEMORY_AND_DISK)
        if persisted is not None:
            persisted.append(old_res)
        new_res = self._resolve_lww(old_res.unionByName(batch))
        payload = [f.name for f in canon.fields if f.name not in keys]
        o = old_res.filter(~F.col(DELETED_COL)).select(
            *keys,
            F.struct(*payload).alias("_po"),
            F.col(SEQ_COL).alias("_so"),
            F.lit(True).alias("_ho"),
        )
        n = new_res.filter(~F.col(DELETED_COL)).select(
            *keys,
            F.struct(*payload).alias("_pn"),
            F.col(SEQ_COL).alias("_sn"),
            F.lit(True).alias("_hn"),
        )
        pre = F.struct(
            F.lit("update_preimage").alias("t"),
            F.col("_po").alias("p"), F.col("_so").alias("s"),
        )
        post = F.struct(
            F.lit("update_postimage").alias("t"),
            F.col("_pn").alias("p"), F.col("_sn").alias("s"),
        )
        ins = F.struct(
            F.lit("insert").alias("t"),
            F.col("_pn").alias("p"), F.col("_sn").alias("s"),
        )
        dele = F.struct(
            F.lit("delete").alias("t"),
            F.col("_po").alias("p"), F.col("_so").alias("s"),
        )
        same = F.lit(True)
        for c in payload:  # null-safe field-wise: struct = / <=> NULL rules
            same = same & F.col(f"_po.{c}").eqNullSafe(F.col(f"_pn.{c}"))
        arr = (
            F.when(F.col("_ho").isNull(), F.array(ins))
            .when(F.col("_hn").isNull(), F.array(dele))
            .when(~same, F.array(pre, post))
            # no-op update (late event lost to stored state, or equal
            # rewrite): emit nothing — type-preserving empty array
            .otherwise(F.filter(F.array(pre), lambda _: F.lit(False)))
        )
        rel = f"{data_rel}-changelog"
        (
            o.join(n, keys, "full_outer")
            .select(*keys, F.explode(arr).alias("_c"))
            .select(
                *keys, F.col("_c.p.*"),
                F.col("_c.s").alias(SEQ_COL),
                F.col("_c.t").alias("_change_type"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, rel))
        )
        return [{"path": rel, "schema_id": schema_id, "kind": "changelog"}]

    def row_changes(
        self, since_version: int, until_version: int | None = None
    ) -> DataFrame:
        """Typed row-level changelog for versions ``(since, until]`` —
        the Delta ``table_changes`` shape: canonical columns plus
        ``_change_type`` (``insert`` / ``update_preimage`` /
        ``update_postimage`` / ``delete``), ``_seq`` and ``_version``.
        Unlike :meth:`changes` (resolved batch rows — the replication
        feed), this stream is RETRACTABLE: an additive consumer maintains
        any sum/count aggregate by adding post-images and subtracting
        pre-images, never reading the table (see
        ``plans.incremental.AdditiveStatsView``).

        Only commits written by a ``changelog="lookup"`` handle carry it;
        a state-changing commit without one (including any rollback,
        whose rewind has no row representation) raises
        :class:`ChangelogUnavailableError`. State-preserving maintenance
        (compaction, re-layout, properties…) contributes nothing, like
        every feed."""
        man = self.manifest()
        hi = man["version"] if until_version is None else until_version
        canon = self._canonical_schema(man)
        parts: list[DataFrame] = []
        for v in range(since_version + 1, hi + 1):
            try:
                m = self._load_version(v)
            except FileNotFoundError:
                vs = self._versions()
                raise SnapshotExpiredError(
                    f"row_changes for ({since_version}, {hi}] needs version "
                    f"{v}, removed by expire_snapshots; retention floor is "
                    f"{vs[0] if vs else '<none>'} — re-seed from a snapshot"
                ) from None
            entries = [e for e in m.get("cdf", []) if "kind" in e]
            if not entries:
                if self.version_changed_state(m):
                    raise ChangelogUnavailableError(
                        f"version {v} changed table state but carries no "
                        "typed changelog — it was committed without "
                        "changelog='lookup' (or is a rollback); re-seed "
                        "the consumer from a snapshot read"
                    )
                continue
            for e in entries:
                derive = e["kind"] == "changelog_derive_insert"
                derive_del = e["kind"] == "changelog_derive_delete"
                sid = e["schema_id"]
                stored_struct = schema_from_json(man["schemas"][sid])
                stored = set(stored_struct.fieldNames())
                read_schema = T.StructType(
                    [f for f in stored_struct.fields]
                    + [T.StructField(SEQ_COL, T.LongType())]
                    + (
                        [T.StructField(DELETED_COL, T.BooleanType())]
                        if (derive or derive_del)
                        else [T.StructField("_change_type", T.StringType())]
                    )
                )
                df = self.spark.read.schema(read_schema).parquet(
                    os.path.join(self.path, e["path"])
                )
                cols = []
                for f in canon.fields:
                    sname = _stored_name(man, sid, f.name)
                    if sname in stored:
                        cols.append(F.col(sname).cast(f.dataType).alias(f.name))
                    else:
                        cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                cols.append(F.col(SEQ_COL))
                if derive:
                    df = df.filter(~F.col(DELETED_COL))
                    cols.append(F.lit("insert").alias("_change_type"))
                elif derive_del:
                    df = df.filter(F.col(DELETED_COL))
                    cols.append(F.lit("delete").alias("_change_type"))
                else:
                    cols.append(F.col("_change_type"))
                parts.append(
                    df.select(cols).withColumn(
                        "_version", F.lit(v).cast("long")
                    )
                )
        if not parts:
            return (
                self._empty(canon, hidden=False)
                .withColumn(SEQ_COL, F.lit(None).cast("long"))
                .withColumn("_change_type", F.lit(None).cast("string"))
                .withColumn("_version", F.lit(None).cast("long"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def changes(self, since_version: int, until_version: int | None = None,
                *, with_version: bool = False) -> DataFrame:
        """Change-data-feed read: the change rows committed in versions
        ``(since_version, until_version]`` — what a downstream incremental
        consumer tails instead of re-diffing snapshots. Available because
        merge-on-read commits materialize exactly the batch's resolved
        change rows as that version's delta files; copy-on-write versions
        rewrite whole buckets and are rejected. Output carries the hidden
        ``_seq`` (ordering) and ``_deleted`` (tombstone) columns.

        Discovery reads each version's ``cdf`` manifest list — recorded at
        commit time BEFORE inline compaction may fold the delta references
        into a ``-compact`` base — so the feed stays complete even when a
        bucket hit ``compact_deltas`` during that very commit. Files are
        grouped by their recorded ``schema_id`` and cast per-group to the
        canonical schema, so a schema evolution inside the requested range
        cannot drop mid-range columns to an arbitrary inferred schema.

        ``with_version=True`` adds a ``_version`` column (the commit
        version each row belongs to — Delta ``table_changes``'s
        ``_commit_version``, and the same column the ``lake_cdf``
        streaming source emits). Attribution needs one assembled frame
        per (version, schema) instead of per schema, so the plan grows
        with the range — fine for the bounded windows consumers poll,
        wasteful for a whole-retention scan you'd aggregate anyway."""
        man = self.manifest()
        hi = man["version"] if until_version is None else until_version
        canon = self._canonical_schema(man)
        per_version: dict[int, dict[int, list[str]]] = {}
        by_schema: dict[int, list[str]] = {}
        for v in range(since_version + 1, hi + 1):
            try:
                # raw version files: feed discovery reads cdf lists, never
                # bucket state — a long range must not materialize every
                # version's range manifests (pre-range manifests fall back
                # to inline "buckets" below and are unaffected)
                m = self._load_version(v)
            except FileNotFoundError:
                vs = self._versions()
                raise SnapshotExpiredError(
                    f"change feed for ({since_version}, {hi}] needs version "
                    f"{v}, which was removed by expire_snapshots; the feed's "
                    f"retention floor is version {vs[0] if vs else '<none>'} "
                    "— re-seed the consumer from a snapshot read"
                ) from None
            if (
                m.get("metrics", {}).get("mode") == "cow"
                and not self._plain_cdf(m)
                # a cow commit that touched zero buckets (empty/no-op batch)
                # contributed no changes — it cannot poison the feed.
                and m.get("metrics", {}).get("n_buckets_touched", 1) > 0
            ) or m.get("metrics", {}).get("cow_without_cdf"):
                # second arm: a published branch squash whose WINDOW held a
                # feed-less cow commit — the squash's union cdf may be
                # non-empty (sibling mor commits), so the bare mode+cdf
                # check cannot see the hole; publish_branch marks it.
                raise ValueError(
                    f"version {v} was (or contains) a copy-on-write commit "
                    "without change-data files; use merge-on-read or "
                    "cow_change_feed=True"
                )
            if "cdf" in m:
                # data commits (batch_id set or ad-hoc) recorded their
                # change files; maintenance commits carry cdf=[] and
                # naturally contribute nothing. Typed-changelog records
                # (kind-marked) belong to row_changes, not this feed.
                entries = self._plain_cdf(m)
            else:  # pre-cdf manifests: delta refs still under data/vN/
                if m.get("batch_id") is None:
                    continue
                rel = f"data/v{v:08d}"
                entries = [
                    fs
                    for e in m["buckets"].values()
                    for fs in self._bucket_files(e)
                    if fs["path"].startswith(rel + "/")
                ]
            for fs in entries:
                by_schema.setdefault(fs["schema_id"], []).append(
                    os.path.join(self.path, fs["path"])
                )
                per_version.setdefault(v, {}).setdefault(
                    fs["schema_id"], []
                ).append(os.path.join(self.path, fs["path"]))
        if not with_version:
            return self._assemble_stored(man, by_schema, canon)
        parts = [
            self._assemble_stored(man, vs, canon).withColumn(
                "_version", F.lit(v).cast("long")
            )
            for v, vs in sorted(per_version.items())
        ]
        if not parts:
            return self._empty(canon, hidden=True).withColumn(
                "_version", F.lit(None).cast("long")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------- maintenance
    def compact(self, version_note: str | None = None, *,
                cluster_by: list | tuple | str | None = None,
                layout: str = "linear",
                zorder_bits: int = 6,
                zorder_sample_fraction: float = 0.1,
                purge_tombstones_before_seq: int | None = None) -> dict:
        """Fold every delta chain back into per-bucket base files (one
        maintenance commit). Equivalent to the inline compaction that fires
        at ``compact_deltas``, but on demand — run it before read-heavy
        phases or after a replay finishes.

        ``cluster_by``: re-layout pass — rewrite EVERY populated bucket
        (deltas or not) with rows sorted by these columns inside each
        bucket instead of the key columns (the Delta ``OPTIMIZE … ZORDER``
        / Iceberg sort-order role, one dimension at a time). Sorting by
        ``ts`` makes every parquet row group's ts min/max a tight slice, so
        a time-ranged ``read_range`` prunes row groups inside the buckets
        the zone maps admit — at 100 TB that is the difference between
        scanning a bucket and scanning a morning. Trade-off: key-ordered
        row-group pruning for ``read_keys`` point reads degrades; pick the
        layout to match the read pattern.

        ``layout="zorder"``: multi-dimension clustering — instead of the
        lexicographic sort (tight row-group stats on the FIRST cluster
        column only), rows sort by a Morton z-value interleaving
        quantile-rank bins of every ``cluster_by`` column
        (``operators/zorder.py``; the Delta ``OPTIMIZE … ZORDER BY``
        role), so pushed filters on ANY clustered dimension prune row
        groups. Costs one extra bounded-state pass over the resolved
        bucket set for quantile boundaries (``zorder_sample_fraction``
        bounds it, like Delta's range-id sampling); ``zorder_bits`` sets
        bins-per-dimension (2^bits). Rank bins make the curve skew-proof
        — a Zipf-hot column still spreads across its bins.

        ``purge_tombstones_before_seq``: tombstone GC — drop tombstone rows
        whose ``_seq`` is below the floor while folding (rewrites EVERY
        populated bucket, like ``cluster_by``). Deleted keys otherwise keep
        a tombstone row forever (the anti-resurrection guard), which at
        10^10 events with key churn is unbounded dead weight — the
        Paimon/Iceberg delete-retention role. CONTRACT: dropping a
        tombstone at seq s removes the guard for that key below s, so the
        floor must be at or below the source's replay low-water mark — a
        seq the binlog can no longer emit under (its retention horizon).
        Time travel still shows pre-purge tombstone state; the change feed
        is untouched (a tombstone row is invisible to ``read()`` — this is
        physical, not logical, maintenance)."""
        man = self.manifest()
        canon = self._canonical_schema(man)
        if isinstance(cluster_by, str):
            cluster_by = [cluster_by]
        if cluster_by:
            missing = [c for c in cluster_by if c not in canon.fieldNames()]
            if missing:
                raise ValueError(f"cluster_by columns not in schema: {missing}")
        if layout not in ("linear", "zorder"):
            raise ValueError(f"unknown layout {layout!r} (linear|zorder)")
        if layout == "zorder" and not cluster_by:
            raise ValueError("layout='zorder' requires cluster_by columns")
        sort_cols = list(cluster_by) if cluster_by else list(self.key_cols)
        buckets = self._mor_buckets(man["buckets"])
        todo = sorted(
            int(b) for b, e in buckets.items()
            if (e["deltas"] or cluster_by
                or purge_tombstones_before_seq is not None)
            and self._bucket_files(e)
        )
        if not todo:
            return {"compacted": 0}
        new_version = man["version"] + 1
        cdir_rel = f"data/v{new_version:08d}-{uuid4().hex[:8]}-compact"
        tmp_man = {
            "schemas": man["schemas"],
            "buckets": {str(b): buckets[str(b)] for b in todo},
            # rename log must ride along: _read_raw maps canonical names
            # back to each file set's stored names through it
            "renames": man.get("renames", []),
        }
        folded = self._resolve_lww(self._read_raw(tmp_man, canon=canon))
        if purge_tombstones_before_seq is not None:
            folded = folded.filter(
                ~(
                    F.col(DELETED_COL)
                    & (F.col(SEQ_COL)
                       < F.lit(int(purge_tombstones_before_seq)))
                )
            )
        folded = folded.withColumn(
            "_bucket", _bucket_expr(self.bucket_col, self.num_buckets, self.bucket_fn)
        )
        if layout == "zorder":
            from ..operators.zorder import compute_boundaries, zvalue_expr

            # quantile boundaries cost one extra (sampled, bounded-state)
            # resolve of the bucket set — the Delta ZORDER sampling pass
            bounds = compute_boundaries(
                folded,
                list(cluster_by),
                bits=zorder_bits,
                sample_fraction=zorder_sample_fraction,
            )
            folded = folded.withColumn(
                "_z", zvalue_expr(bounds, folded.schema, bits=zorder_bits)
            )
            sort_key = ["_bucket", "_z"]
        else:
            sort_key = ["_bucket", *sort_cols]
        (
            # sort by key inside each bucket file: compaction is the read-
            # optimization pass, and sorted row groups give parquet min/max
            # pruning on conv_id for read_keys point lookups.
            self._capped(
                folded.repartition(max(len(todo), 1), "_bucket")
                .sortWithinPartitions(*sort_key)
                .drop("_z")
                .write.partitionBy("_bucket")
                .mode("overwrite")
            ).parquet(os.path.join(self.path, cdir_rel))
        )
        schema_id = len(man["schemas"]) - 1
        cstats = _footer_stats(
            os.path.join(self.path, cdir_rel), SEQ_COL, self.stats_cols
        )
        for b in todo:
            if b not in cstats:
                # every row in the bucket was a purged tombstone: the fold
                # wrote nothing — an empty entry (no file sets), the same
                # shape a never-written bucket has
                buckets[str(b)] = {"base": None, "deltas": []}
                continue
            base = {
                "path": f"{cdir_rel}/_bucket={b}",
                "schema_id": schema_id,
                "rows": cstats.get(b, {}).get("n_changes"),
            }
            if cstats.get(b, {}).get("stats"):
                base["stats"] = cstats[b]["stats"]
            buckets[str(b)] = {"base": base, "deltas": []}
        metrics = {"maintenance": "compact", "n_buckets": len(todo),
                   "cluster_by": cluster_by, "layout": layout,
                   "note": version_note}
        if purge_tombstones_before_seq is not None:
            metrics["purge_tombstones_before_seq"] = int(
                purge_tombstones_before_seq
            )
        self._commit(
            {
                **man,
                "version": new_version,
                "batch_id": None,
                "cdf": [],
                "buckets": buckets,
                "metrics": metrics,
                "commit_ts": time.time(),
            }
        )
        return {"compacted": len(todo), "version": new_version}

    def _next_seq(self, man: dict, canon: T.StructType) -> int:
        """1 + the table's max applied ``_seq`` — from per-bucket lineage
        when present (driver-side), else one max-only agg job."""
        seqs = [
            s.get("max_seq")
            for s in man.get("lineage", {}).values()
            if s.get("max_seq") is not None
        ]
        if seqs:
            return int(max(seqs)) + 1
        r = (
            self._read_raw(man, canon=canon)
            .agg(F.max(SEQ_COL).alias("m"))
            .first()
        )
        return int(r["m"] or 0) + 1

    def update_where(
        self,
        predicate,
        assignments: dict,
        *,
        update_seq: int | None = None,
        note: str | None = None,
    ) -> dict:
        """UPDATE ... SET ... WHERE as ordinary change events: matching
        live rows are re-emitted as 'U' events at ``update_seq`` (default
        ``max(applied _seq) + 1``) with ``assignments`` applied, and fed
        through :meth:`apply_changes` — so the update inherits the MERGE
        path wholesale: under merge-on-read it APPENDS O(matches) delta
        rows (no bucket rewrite at all — the scale shape you want for a
        wide backfill), under copy-on-write it rewrites only touched
        buckets; either way the rows ride the change feed and conflict
        retry like any other batch.

        ``assignments`` maps column → Column / SQL-expression string; every
        right-hand side sees the OLD row (standard SQL UPDATE semantics).
        Key/bucket columns cannot be assigned (that is a delete + insert).
        The seq-domain caveat on :meth:`delete_where` applies equally.
        """
        self._refuse_on_aggregate("update_where")
        man = self.manifest()
        canon = self._canonical_schema(man)
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        for c in assignments:
            if c in self.key_cols or c == self.bucket_col:
                raise ValueError(
                    f"cannot assign key/bucket column {c!r}; "
                    "delete + re-insert instead"
                )
            if c not in canon.fieldNames():
                raise SchemaEvolutionError(f"no column {c!r}")
        if update_seq is None:
            update_seq = self._next_seq(man, canon)
        exprs = {
            c: (F.expr(v) if isinstance(v, str) else v)
            for c, v in assignments.items()
        }
        matched = self.read().filter(pred)
        events = matched.select(
            F.lit("U").alias("op"),
            F.lit(update_seq).cast("long").alias("seq"),
            *[
                (exprs[f.name].cast(f.dataType) if f.name in exprs
                 else F.col(f.name)).alias(f.name)
                for f in canon.fields
            ],
        )
        metrics = self.apply_changes(
            events, batch_id=None, transform=None,
            source=f"update_where:{note or ''}",
            _metrics_extra={"maintenance": "update_where"},
        )
        return {**metrics, "update_seq": update_seq}

    def overwrite_where(
        self,
        df: DataFrame,
        predicate,
        *,
        overwrite_seq: int | None = None,
        batch_id: int | None = None,
        note: str | None = None,
    ) -> dict:
        """Predicate-scoped atomic overwrite — the Delta ``replaceWhere`` /
        Iceberg overwrite-by-filter analog, and the engine's form of the
        reference's re-export rule (convert_cdm_to_mods.py:142-148: a re-run
        deletes the collection's previous outputs and the latest export
        wins): in ONE commit, every live row matching ``predicate`` is
        replaced by the rows of ``df``.

        Composed as ordinary change events through :meth:`apply_changes`
        rather than file surgery — matched live keys become 'D' events and
        ``df`` rows 'U' events, all at ``overwrite_seq`` (default
        ``max(applied _seq) + 1``). A key both matched and re-inserted
        collapses to its 'U' in the in-batch dedup (the op-ranked
        U > I > D tie-break at equal seq — the same rule the bootstrap
        overlap path relies on), so the change feed reports it as an
        update, keys only in the matched set as deletes, and new keys as
        inserts. The whole MERGE surface rides along: under merge-on-read
        the commit APPENDS O(matches + len(df)) rows and rewrites nothing,
        CHECK constraints, the change feed / typed changelog, conflict
        retry and quarantine behave exactly as for a source batch.

        Contract (Delta's): every row of ``df`` must satisfy ``predicate``
        — violations refuse the whole op before anything lands, because a
        row written OUTSIDE the predicate region would silently survive the
        next overwrite of that region. ``df`` must carry the full logical
        schema (evolve the table first for new columns) and be unique on
        the key columns (a keyed table cannot order duplicate inserts at
        one seq deterministically). The seq-domain caveat on
        :meth:`delete_where` applies equally: the op spends one LSN from
        the source's sequence domain.
        """
        self._refuse_on_aggregate("overwrite_where")
        if self.merge_engine == "partial_update":
            raise ValueError(
                "overwrite_where is not supported on "
                "merge_engine='partial_update' tables: null columns in the "
                "replacement rows would KEEP the old values instead of "
                "overwriting them — use delete_where + apply_changes"
            )
        man = self.manifest()
        # exactly-once short-circuit (same contract as apply/merge): a
        # redelivered statement skips before validation jobs — and before
        # the max-live-seq check its OWN committed rows would now trip
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id,
                    "reason": "already committed"}
        canon = self._canonical_schema(man)
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        missing = [f.name for f in canon.fields if f.name not in df.columns]
        if missing:
            raise SchemaEvolutionError(
                f"overwrite_where replacement rows are missing table "
                f"columns {missing!r} — a replace writes whole rows; "
                "evolve or select explicitly"
            )
        extra = [c for c in df.columns if c not in canon.fieldNames()]
        if extra:
            raise SchemaEvolutionError(
                f"overwrite_where replacement rows carry unknown columns "
                f"{extra!r} — add_column/widen_column the table first"
            )
        if overwrite_seq is None:
            overwrite_seq = self._next_seq(man, canon)
        inserts = df.select(
            F.lit("U").alias("op"),
            F.lit(overwrite_seq).cast("long").alias("seq"),
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in canon.fields],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        raw = self._read_raw(man, canon=canon)
        if self._needs_resolve(man["buckets"].values()):
            raw = self._resolve_lww(raw)
        matched = (
            raw.filter(~F.col(DELETED_COL))
            .filter(pred)
            .select(
                F.lit("D").alias("op"),
                F.lit(overwrite_seq).cast("long").alias("seq"),
                F.col(SEQ_COL).alias("_live_seq"),
                *[F.col(k) for k in self.key_cols],
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            # one validation job over df: replaceWhere containment + key
            # uniqueness (countDistinct over the key struct, same pass)
            v = inserts.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
                ).alias("violations"),
                F.countDistinct(
                    F.struct(*[F.col(k) for k in self.key_cols])
                ).alias("n_keys"),
            ).first()
            if v["violations"]:
                raise ValueError(
                    f"overwrite_where refused: {v['violations']} of "
                    f"{v['n']} replacement rows do not satisfy the "
                    f"predicate — rows written outside the overwritten "
                    "region would survive its next overwrite"
                )
            if v["n_keys"] != v["n"]:
                raise ValueError(
                    f"overwrite_where refused: replacement rows are not "
                    f"unique on {list(self.key_cols)!r} "
                    f"({v['n']} rows, {v['n_keys']} distinct keys)"
                )
            g = matched.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("_live_seq").alias("max_live"),
            ).first()
            if not v["n"] and not g["n"]:
                return {"replaced_rows": 0, "inserted_rows": 0,
                        "version": man["version"], "skipped": True}
            if g["max_live"] is not None and g["max_live"] >= overwrite_seq:
                raise ValueError(
                    f"overwrite_seq {overwrite_seq} is not above the max "
                    f"_seq of matched live rows ({g['max_live']}) — the "
                    "overwrite events would lose the merge; pass a higher "
                    "seq (or omit it to use the table max + 1)"
                )
            events = matched.drop("_live_seq").unionByName(
                inserts, allowMissingColumns=True
            )
            res = self.apply_changes(
                events,
                batch_id=batch_id,
                source=f"overwrite_where:{note or ''}",
                _metrics_extra={
                    "maintenance": "overwrite_where",
                    "overwrite_seq": overwrite_seq,
                    "replaced_rows": g["n"],
                    "inserted_rows": v["n"],
                    "note": note,
                },
            )
        finally:
            inserts.unpersist()
            matched.unpersist()
        return {
            "replaced_rows": g["n"],
            "inserted_rows": v["n"],
            "overwrite_seq": overwrite_seq,
            "version": res["version"],
        }

    def merge_into(
        self,
        source: DataFrame,
        *,
        when_matched_update: dict | None = None,
        when_matched_delete=None,
        when_not_matched_insert: bool | dict = True,
        matched_condition=None,
        not_matched_condition=None,
        schema_evolution: bool = False,
        merge_seq: int | None = None,
        batch_id: int | None = None,
        note: str | None = None,
    ) -> dict:
        """Declarative MERGE INTO — the Delta/Iceberg-style upsert API over
        the engine's CDC apply path: ``source`` rows are classified against
        the table's CURRENT live state and turned into ordinary change
        events, then fed through :meth:`apply_changes` — so a merge inherits
        the whole MERGE machinery for free (single bucket shuffle, change
        feed, CHECK constraints, quarantine, exactly-once ``batch_id``,
        conflict retry, schema evolution of the event frame).

        Clause semantics (evaluated in Delta's order, first match wins):

        - ``when_matched_delete``: Column / SQL string over the joined row
          (``s.<col>`` = source, ``t.<col>`` = target); matching pairs emit
          a 'D' event. Pass ``True`` for an unconditional matched-delete.
        - ``when_matched_update``: dict column → Column / SQL string; RHS
          sees BOTH sides (``s.``/``t.``). Non-assigned columns keep the
          target value. Gated by ``matched_condition`` when given.
        - ``when_not_matched_insert``: ``True`` inserts the source row's
          canonical columns (absent ones null); a dict gives explicit
          per-column expressions over ``s.``; ``False`` drops unmatched
          source rows. ``not_matched_condition`` (Delta's ``WHEN NOT
          MATCHED AND <cond>``) gates the insert over ``s.`` — an unmatched
          source row failing it is dropped (e.g. a compacted-topic
          tombstone for a key the table never had).

        ``schema_evolution`` (Delta's ``autoMerge`` analog): source columns
        the table lacks become new nullable table columns (old rows null),
        defaulting to the source value on BOTH insert and update (override
        per clause dict); without it, extra source columns are dropped and
        clause dicts may not name unknown columns. A ``schema_mode=
        "strict"`` table still refuses the evolution at apply time.

        Key/bucket columns cannot be assigned (that is delete + insert).
        Duplicate keys in ``source`` are refused — two source rows matching
        one target row make the merge non-deterministic (same rule as
        Delta's ``MERGE`` cardinality check); pre-aggregate the source
        (e.g. ``latest_per_key``) first.

        All emitted events share one ``merge_seq`` (default: 1 + the
        table's max applied ``_seq``); the seq-domain caveat on
        :meth:`delete_where` applies equally.

        Scale shape: the classification reads ONLY the source keys'
        buckets (the same manifest-level pruning as ``read_keys`` — Delta
        MERGE's touched-file inner-join pruning, done here from the bucket
        layout with one bounded O(num_buckets)-int collect), so the join
        costs O(touched-bucket rows + source), never a scan or shuffle of
        the full table; the write side is then the ordinary O(affected
        buckets) apply. Broadcasting is NOT the lever here: the source is
        the preserved side of the outer join (unmatched rows become
        inserts), and Spark can only broadcast the non-preserved side —
        pruning is what keeps 100 TB out of the exchange.
        """
        if (
            self.merge_engine == "first_row"
            and not when_matched_update
            and when_matched_delete is None
        ):
            # insert-only merge: classification + 'I' events for unmatched
            # keys — exactly an apply_changes of inserts, which first_row
            # accepts (idempotent upsert-new-keys). Only the matched
            # clauses would silently lose to stored rows.
            pass
        else:
            self._refuse_on_aggregate("merge_into")
        if (
            not when_matched_update
            and when_matched_delete is None
            and when_not_matched_insert is False
        ):
            raise ValueError("merge_into needs at least one WHEN clause")
        man = self.manifest()
        # exactly-once short-circuit BEFORE any classification jobs run:
        # a redelivered micro-batch (lost checkpoint, crash replay) must
        # not pay the cardinality check / seq resolution / join.
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id,
                    "reason": "already committed"}
        canon = self._canonical_schema(man)
        key_set = set(self.key_cols)
        # evolvable columns: in the source but not (yet) in the table
        extra_cols = [
            c for c in source.columns if c not in canon.fieldNames()
        ] if schema_evolution else []
        bad = [
            c for c in extra_cols
            if c in _NON_PAYLOAD_EVENT_COLS or c.startswith("_")
        ]
        if bad:
            raise ValueError(
                f"source column(s) {bad} collide with event/bookkeeping "
                "names; rename them before merging with schema_evolution"
            )

        def _check_col(c):
            if c in canon.fieldNames() or c in extra_cols:
                return
            hint = (
                "; pass schema_evolution=True to add it"
                if c in source.columns
                else ""
            )
            raise SchemaEvolutionError(f"no column {c!r}{hint}")

        if when_matched_update:
            for c in when_matched_update:
                if c in key_set or c == self.bucket_col:
                    raise ValueError(
                        f"cannot assign key/bucket column {c!r}; "
                        "delete + re-insert instead"
                    )
                _check_col(c)
        missing = key_set - set(source.columns)
        if missing:
            raise ValueError(f"source is missing key column(s) {sorted(missing)}")
        dup = (
            source.groupBy(*self.key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter("n > 1")
            .take(1)
        )
        if dup:
            k = tuple(dup[0][c] for c in self.key_cols)
            raise ValueError(
                f"source has multiple rows for key {k}: a MERGE with "
                "duplicate source keys is non-deterministic — dedup the "
                "source first (e.g. operators.dedup.latest_per_key)"
            )
        if merge_seq is None:
            merge_seq = self._next_seq(man, canon)

        as_expr = lambda v: F.expr(v) if isinstance(v, str) else v  # noqa: E731
        s = source.alias("s")
        # bucket-prune the live-state read to the source keys' buckets —
        # probed at the table's native key type so the hash agrees with
        # the write layout (null keys hash consistently too).
        key_type = canon[self.bucket_col].dataType
        needed = sorted(
            r["_b"]
            for r in source.select(
                F.col(self.bucket_col).cast(key_type).alias(self.bucket_col)
            )
            .select(
                _bucket_expr(
                    self.bucket_col, self.num_buckets, self.bucket_fn
                ).alias("_b")
            )
            .distinct()
            .collect()
        )
        live = self._resolve_live(
            self._read_raw(man, buckets=needed), man, needed
        )
        # explicit never-null probe marker: a key-null test would
        # misclassify live NULL-keyed rows (storable when no
        # quarantine_path routes them away) as unmatched.
        t = live.withColumn("_probe", F.lit(True)).alias("t")
        joined = s.join(
            t, [s[k].eqNullSafe(t[k]) for k in self.key_cols], "left"
        )
        matched = F.col("t._probe").isNotNull()

        delete_cond = F.lit(False)
        if when_matched_delete is not None:
            delete_cond = (
                F.lit(True)
                if when_matched_delete is True
                else as_expr(when_matched_delete)
            )
        update_cond = F.lit(bool(when_matched_update))
        if when_matched_update and matched_condition is not None:
            update_cond = as_expr(matched_condition)
        insert_exprs = None
        if when_not_matched_insert is not False:
            if isinstance(when_not_matched_insert, dict):
                insert_exprs = {
                    c: as_expr(v) for c, v in when_not_matched_insert.items()
                }
            else:
                insert_exprs = {
                    f.name: F.col(f"s.{f.name}")
                    for f in canon.fields
                    if f.name in source.columns
                }
            for c in insert_exprs:
                _check_col(c)
        update_exprs = {
            c: as_expr(v) for c, v in (when_matched_update or {}).items()
        }

        insert_cond = F.lit(insert_exprs is not None)
        if insert_exprs is not None and not_matched_condition is not None:
            insert_cond = as_expr(not_matched_condition)
        op = (
            F.when(matched & delete_cond, "D")
            .when(matched & update_cond, "U")
            .when(~matched & insert_cond, "I")
        )

        def value_for(f):
            """per-op column value: I → insert expr (default s.<col>, null
            if the source lacks it), U → update expr (default: keep t.<col>),
            D → t.<col>; key columns always pass through (t for matched ops,
            the insert expr / s for inserts)."""
            if f.name in key_set:
                ins_key = (
                    insert_exprs.get(f.name, F.col(f"s.{f.name}"))
                    if insert_exprs is not None
                    else F.col(f"s.{f.name}")
                )
                v = F.when(F.col("_merge_op") == "I", ins_key).otherwise(
                    F.col(f"t.{f.name}")
                )
            else:
                ins = (
                    insert_exprs.get(f.name, F.lit(None))
                    if insert_exprs is not None
                    else F.lit(None)
                )
                v = (
                    F.when(F.col("_merge_op") == "I", ins)
                    .when(
                        F.col("_merge_op") == "U",
                        update_exprs.get(f.name, F.col(f"t.{f.name}")),
                    )
                    .otherwise(F.col(f"t.{f.name}"))
                )
            return v.cast(f.dataType).alias(f.name)

        src_types = {f.name: f.dataType for f in source.schema.fields}

        def extra_value(name):
            """evolving column: source value on I and U (clause dicts may
            override), null on D — the table gains it as nullable and old
            rows null-fill via the ordinary apply-side evolution."""
            ins = (
                insert_exprs.get(name, F.col(f"s.{name}"))
                if insert_exprs is not None
                else F.col(f"s.{name}")
            )
            return (
                F.when(F.col("_merge_op") == "I", ins)
                .when(
                    F.col("_merge_op") == "U",
                    update_exprs.get(name, F.col(f"s.{name}")),
                )
                .otherwise(F.lit(None).cast(src_types[name]))
                .alias(name)
            )

        events = (
            joined.withColumn("_merge_op", op)
            .filter(F.col("_merge_op").isNotNull())
            .select(
                F.col("_merge_op").alias("op"),
                F.lit(merge_seq).cast("long").alias("seq"),
                *[value_for(f) for f in canon.fields],
                *[extra_value(c) for c in extra_cols],
            )
        )
        metrics = self.apply_changes(
            events,
            batch_id=batch_id,
            transform=None,
            source=f"merge_into:{note or ''}",
            _metrics_extra={"maintenance": "merge_into"},
        )
        return {**metrics, "merge_seq": merge_seq}

    def delete_where(
        self,
        predicate,
        *,
        tombstone_seq: int | None = None,
        note: str | None = None,
        mode: str = "rewrite",
    ) -> dict:
        """Predicate delete — the compliance/right-to-be-forgotten
        maintenance op (reference analog: the restriction purge that drops
        records flagged in the restrictions report, post_cdm_cleanup.py's
        remove-on-mismatch loop, generalized to an arbitrary predicate over
        the logical schema).

        Two-phase, O(matching buckets) rewrite:

        1. one scan resolves live rows, applies ``predicate`` and
           aggregates per-bucket match counts — buckets with no match are
           never rewritten (their manifest refs are carried unchanged);
        2. each touched bucket's chain is folded (like ``compact``) and the
           matching live rows become TOMBSTONES at ``tombstone_seq``
           (default: 1 + the table's max applied ``_seq`` from lineage) —
           kept in the base so a late-arriving lower-seq event cannot
           resurrect a purged key, exactly the semantics of a 'D' change
           event; non-matching rows are carried byte-identical.

        The tombstone rows are also materialized as this version's
        change-data files, so a downstream ``changes()`` consumer sees the
        purge as ordinary 'D' rows (Delta-CDF pattern) under BOTH merge
        modes. Older snapshots still contain the data — run
        ``expire_snapshots`` afterwards to physically drop them (same
        two-step as Delta/Iceberg DELETE + VACUUM).

        Caveat (inherent to out-of-band deletes in any CDC system): the
        tombstone's seq is spent from the source's sequence domain — if the
        source later emits events at seq < ``tombstone_seq`` for a purged
        key, the seq guard rejects them; an event at EXACTLY
        ``tombstone_seq`` (the LSN this purge consumed) wins the tie under
        the merge's op-ranked tie-break (U > I > D — the ordering the
        bootstrap overlap path relies on), i.e. the next source change
        sharing the purge's LSN re-creates the key. Pass an explicit
        ``tombstone_seq`` if the source coordinates its own LSN space and
        must not share it.

        ``mode="tombstone"`` — the O(matches) logical delete (the Delta
        deletion-vector cost model, realized through this engine's own
        merge layer instead of positional bitmaps): matched live keys are
        routed as ordinary 'D' change events through ``apply_changes``, so
        under merge-on-read the commit APPENDS O(matches) tombstone rows
        (payload nulled by the merge projection — no purged bytes are
        re-written) and never folds or rewrites a bucket. At 100 TB this is
        the difference between a compliance delete that rewrites every
        touched bucket in one commit and one that lands in seconds; the
        same anti-resurrection seq guard holds (the tombstones ARE the
        guard). Trade-off, exactly Delta's DV + ``REORG … APPLY (PURGE)``
        two-step: the purged payload bytes remain physically present in the
        CURRENT snapshot's older files until the next ``compact()`` of
        those buckets folds them away (superseded versions drop at the
        fold), then ``expire_snapshots`` removes the files — run both for
        physical right-to-be-forgotten. Change feed, typed changelog
        (delete pre-images via the lookup producer), constraints exemption
        and conflict retry all ride the merge path unchanged. Under
        copy-on-write the merge rewrites touched buckets anyway, so
        ``mode="tombstone"`` there equals the rewrite cost class (but
        purges only at the next fold — prefer the default).
        """
        self._refuse_on_aggregate("delete_where")
        if mode not in ("rewrite", "tombstone"):
            raise ValueError(
                f"delete_where mode must be 'rewrite' or 'tombstone', got {mode!r}"
            )
        man = self.manifest()
        canon = self._canonical_schema(man)
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        if tombstone_seq is None:
            tombstone_seq = self._next_seq(man, canon)

        if mode == "tombstone":
            # matched LIVE keys as 'D' events — key columns only: the merge
            # projection nulls a D row's payload anyway, and shipping the
            # purged values through the shuffle would copy the very bytes
            # the delete exists to stop copying. Persisted so the whole op
            # scans the table ONCE: the guard aggregate below materializes
            # the matched set, and apply_changes replays it from cache.
            raw = self._read_raw(man, canon=canon)
            if self._needs_resolve(man["buckets"].values()):
                raw = self._resolve_lww(raw)
            matched = (
                raw.filter(~F.col(DELETED_COL))
                .filter(pred)
                .select(
                    F.lit("D").alias("op"),
                    F.lit(tombstone_seq).cast("long").alias("seq"),
                    F.col(SEQ_COL).alias("_live_seq"),
                    *[F.col(k) for k in self.key_cols],
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                g = matched.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.max("_live_seq").alias("max_live"),
                ).first()
                if not g["n"]:
                    return {"deleted_rows": 0, "version": man["version"],
                            "mode": "tombstone"}
                if g["max_live"] is not None and g["max_live"] >= tombstone_seq:
                    # a 'D' event at tombstone_seq would LOSE last-write-wins
                    # (and the U>I>D tie-break at equality) to such a row —
                    # the delete would silently no-op while reporting
                    # success. Only reachable with an explicit too-low
                    # tombstone_seq; rewrite mode flips rows unconditionally,
                    # so the modes would diverge. Refuse instead.
                    raise ValueError(
                        f"tombstone_seq {tombstone_seq} is not above the "
                        f"max _seq of matched live rows ({g['max_live']}) — "
                        "the delete events would lose the merge; pass a "
                        "higher seq (or omit it to use the table max + 1), "
                        "or use mode='rewrite'"
                    )
                res = self.apply_changes(
                    matched.drop("_live_seq"),
                    source=f"delete_where:{note or ''}",
                    _metrics_extra={
                        "maintenance": "delete_where",
                        "delete_mode": "tombstone",
                        "tombstone_seq": tombstone_seq,
                        "note": note,
                    },
                )
            finally:
                matched.unpersist()
            return {
                "deleted_rows": res["n_events"],
                "n_buckets_rewritten": 0,
                "tombstone_seq": tombstone_seq,
                "mode": "tombstone",
                "version": res["version"],
            }

        # phase 1 — find matching buckets (one scan; arbitrary predicates
        # cannot be zone-pruned, but the REWRITE below is O(matches)).
        raw_all = self._read_raw(man, canon=canon)
        if self._needs_resolve(man["buckets"].values()):
            raw_all = self._resolve_lww(raw_all)
        match_counts = {
            r["_b"]: r["n"]
            for r in raw_all.filter(~F.col(DELETED_COL))
            .filter(pred)
            .select(
                _bucket_expr(
                    self.bucket_col, self.num_buckets, self.bucket_fn
                ).alias("_b")
            )
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        todo = sorted(match_counts)
        n_deleted = sum(match_counts.values())
        if not todo:
            return {"deleted_rows": 0, "version": man["version"]}

        # phase 2 — fold + tombstone ONLY the matching buckets.
        new_version = man["version"] + 1
        data_rel = f"data/v{new_version:08d}-{uuid4().hex[:8]}-delete"
        vdir = os.path.join(self.path, data_rel)
        raw = self._read_raw(man, buckets=todo, canon=canon)
        if self._needs_resolve(man["buckets"][str(b)] for b in todo):
            raw = self._resolve_lww(raw)
        newly = ~F.col(DELETED_COL) & pred
        rewritten = (
            raw.withColumn(
                SEQ_COL,
                F.when(newly, F.lit(tombstone_seq).cast("long")).otherwise(
                    F.col(SEQ_COL)
                ),
            )
            # marks AFTER the seq swap: `newly` reads the original _deleted
            .withColumn(
                DELETED_COL, F.when(newly, F.lit(True)).otherwise(F.col(DELETED_COL))
            )
            .withColumn(
                "_bucket",
                _bucket_expr(self.bucket_col, self.num_buckets, self.bucket_fn),
            )
        )
        (
            self._capped(
                rewritten.repartition(max(len(todo), 1), "_bucket")
                .sortWithinPartitions("_bucket", *self.key_cols)
                .write.partitionBy("_bucket")
                .mode("overwrite")
            ).parquet(vdir)
        )
        schema_id = len(man["schemas"]) - 1
        dstats = _footer_stats(vdir, SEQ_COL, self.stats_cols)
        buckets = self._mor_buckets(man["buckets"])
        for b in todo:
            base = {
                "path": f"{data_rel}/_bucket={b}",
                "schema_id": schema_id,
                "rows": dstats.get(b, {}).get("n_changes"),
            }
            if dstats.get(b, {}).get("stats"):
                base["stats"] = dstats[b]["stats"]
            buckets[str(b)] = {"base": base, "deltas": []}
        # change-data files: the purge's tombstones, readable by changes()
        # consumers as ordinary 'D' rows. Derived from the rewritten base —
        # a footer-pruned scan of the touched buckets only (_seq pushdown).
        cdf_rel = f"{data_rel}-cdf"
        (
            self.spark.read.parquet(vdir)
            .filter(F.col(DELETED_COL) & (F.col(SEQ_COL) == tombstone_seq))
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, cdf_rel))
        )
        lineage = dict(man.get("lineage", {}))
        for b in todo:
            lineage[str(b)] = _lineage_entry(
                lineage, b, tombstone_seq, tombstone_seq,
                match_counts[b], new_version, f"delete_where:{note or ''}",
            )
        delete_cdf = [{"path": cdf_rel, "schema_id": schema_id}]
        if self.changelog != "none":
            # typed changelog for free: the purge's change files already
            # hold the tombstoned rows WITH their pre-delete payload (the
            # rewrite flips _deleted/_seq without nulling columns), so a
            # derive reference yields the 'delete' pre-images with no
            # extra write.
            delete_cdf.append(
                {
                    "path": cdf_rel,
                    "schema_id": schema_id,
                    "kind": "changelog_derive_delete",
                }
            )
        self._commit(
            {
                **man,
                "version": new_version,
                "batch_id": None,
                "cdf": delete_cdf,
                "buckets": buckets,
                "lineage": lineage,
                "metrics": {
                    "maintenance": "delete_where",
                    "deleted_rows": n_deleted,
                    "n_buckets": len(todo),
                    "tombstone_seq": tombstone_seq,
                    "note": note,
                },
                "commit_ts": time.time(),
            }
        )
        return {
            "deleted_rows": n_deleted,
            "n_buckets_rewritten": len(todo),
            "tombstone_seq": tombstone_seq,
            "version": new_version,
        }

    def rebucket(self, new_num_buckets: int) -> dict:
        """Partition-spec evolution: rewrite the table at a new bucket
        count (one maintenance commit — the Iceberg bucket-transform
        evolution). At 10^10 events you raise ``num_buckets`` as the table
        grows so per-bucket rewrite/merge amplification stays bounded;
        readers and merges adopt the new layout from the manifest (the
        constructor trusts the on-disk ``num_buckets``, so every future
        open sees the new spec)."""
        man = self.manifest()
        folded = self._resolve_lww(self._read_raw(man)).withColumn(
            "_bucket", _bucket_expr(self.bucket_col, new_num_buckets, self.bucket_fn)
        )
        new_version = man["version"] + 1
        rel = f"data/v{new_version:08d}-{uuid4().hex[:8]}-rebucket"
        (
            self._capped(
                folded.repartition(new_num_buckets, "_bucket")
                .sortWithinPartitions("_bucket", *self.key_cols)
                .write.partitionBy("_bucket")
                .mode("overwrite")
            ).parquet(os.path.join(self.path, rel))
        )
        schema_id = len(man["schemas"]) - 1
        stats = _footer_stats(
            os.path.join(self.path, rel), SEQ_COL, self.stats_cols
        )
        buckets = {}
        for b in sorted(stats):
            base = {
                "path": f"{rel}/_bucket={b}",
                "schema_id": schema_id,
                "rows": stats[b].get("n_changes"),
            }
            if stats[b].get("stats"):
                base["stats"] = stats[b]["stats"]
            buckets[str(b)] = {"base": base, "deltas": []}
        self._commit(
            {
                **man,
                "version": new_version,
                "batch_id": None,
                "cdf": [],
                "buckets": buckets,
                "num_buckets": new_num_buckets,
                "metrics": {"maintenance": "rebucket",
                            "from": self.num_buckets, "to": new_num_buckets},
                "commit_ts": time.time(),
            }
        )
        self.num_buckets = new_num_buckets
        return {"rebucketed_to": new_num_buckets, "version": new_version,
                "n_buckets_written": len(buckets)}

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop manifests older than the newest ``keep_last`` and delete
        data directories / range manifests no kept snapshot references
        (time travel shrinks to the kept window). The active snapshot's
        files are never touched — bases written under old versions stay as
        long as any kept manifest points at them.

        Maintenance-owner assumption (same as Iceberg's expire/vacuum): do
        not run concurrently with an IN-FLIGHT writer — a commit's freshly
        written data dir / range files are unreferenced until its version
        file publishes, and this GC would collect them. Completed commits
        are always safe."""
        import shutil

        assert self.branch == "main", "run maintenance on a main-opened table"
        referenced: set[str] = set()
        live_ranges: set[str] = set()

        def _collect(raw: dict) -> None:
            for ref in raw.get("bucket_ranges", []):
                live_ranges.add(ref["path"])
            m = self._materialize(dict(raw))
            for e in m.get("buckets", {}).values():
                for fs in self._bucket_files(e):
                    # reference at version-directory granularity
                    referenced.add(fs["path"].split("/_bucket=")[0])
            # kept manifests' change-feed files stay readable too
            for fs in m.get("cdf", []):
                referenced.add(fs["path"].split("/_bucket=")[0])

        versions = self._versions()
        keep = versions[-keep_last:]
        # tagged snapshots are pinned: a tag is a promise that the exact
        # version it names stays readable (training-run reproducibility),
        # so tagged versions — and everything they reference — survive GC
        # until the tag itself is deleted.
        for t in self.tags():
            if t["version"] in versions and t["version"] not in keep:
                keep.append(t["version"])
        # live staging branches: every branch version file stays fully
        # referenced (its reads must survive main maintenance), and the
        # branch's fork-point version file is pinned so the branch keeps a
        # resolvable base; orphan branch files (crashed publish/drop left
        # b-*.json without a pointer) are expired like old versions.
        ledger_names = os.listdir(self._ledger) if os.path.isdir(self._ledger) else []
        live_branch_files: set[str] = set()
        for bmeta in self.branches():
            if bmeta["forked_at"] in versions and bmeta["forked_at"] not in keep:
                keep.append(bmeta["forked_at"])
            for bv in self._branch_vfile_versions(ledger_names, bmeta["name"]):
                fname = self._vfile_name(bv, bmeta["name"])
                live_branch_files.add(fname)
                with open(os.path.join(self._ledger, fname)) as fh:
                    _collect(json.load(fh))
        drop = [v for v in versions if v not in keep]
        for v in keep:
            # raw version file: collects range refs before materialization
            _collect(self._load_version(v))
        orphan_branch_files = [
            f
            for f in ledger_names
            if f.startswith("b-") and f.endswith(".json")
            and f not in live_branch_files
        ]
        data_root = os.path.join(self.path, "data")
        removed_dirs = 0
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                if f"data/{d}" not in referenced:
                    shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                    removed_dirs += 1
        for v in drop:
            os.remove(os.path.join(self._ledger, f"v{v:08d}.json"))
        for f in orphan_branch_files:
            os.remove(os.path.join(self._ledger, f))
        # GC range manifests (content-shared, so only ones NO kept version
        # references) — plus any orphaned tmp files from crashed commits
        removed_ranges = 0
        ranges_dir = os.path.join(self._ledger, "ranges")
        if os.path.isdir(ranges_dir):
            for f in os.listdir(ranges_dir):
                rel = f"ranges/{f}"
                if rel not in live_ranges:
                    os.remove(os.path.join(ranges_dir, f))
                    self._range_cache.pop(rel, None)
                    removed_ranges += 1
        # sweep native-sink staging leftovers from CRASHED writer drivers
        # (a live run's commit/abort rmtrees its own subdir; age-gate so an
        # in-flight write several hours long is never swept from under it)
        swept_staging = 0
        tmp_root = os.path.join(self.path, "_sink_tmp")
        if os.path.isdir(tmp_root):
            cutoff = time.time() - 86_400
            for d in os.listdir(tmp_root):
                p = os.path.join(tmp_root, d)
                try:
                    if os.path.getmtime(p) < cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                        swept_staging += 1
                except OSError:
                    continue
        return {"expired_manifests": len(drop), "removed_data_dirs": removed_dirs,
                "removed_range_manifests": removed_ranges,
                "removed_orphan_branch_files": len(orphan_branch_files),
                "swept_sink_staging": swept_staging,
                "kept": sorted(keep)}

    # -------------------------------------------------------------- merge
    def apply_changes(
        self,
        events: DataFrame,
        batch_id: int | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        source: str | None = None,
        _metrics_extra: dict | None = None,
    ) -> dict:
        """MERGE a change batch (op/seq + payload columns) into the table.

        Pipeline per batch (the engine's core loop — SURVEY.md §4):
        scan events → in-batch dedup (window max-seq per key) → vectorized
        transform chain → schema-evolve → union with affected target buckets
        → cross-batch last-write-wins by ``_seq`` → rewrite affected buckets
        → atomic ledger commit (metrics + per-bucket lineage).

        Returns the metrics dict recorded in the manifest. Idempotent:
        re-applying a committed ``batch_id`` is a skip; re-applying the same
        *events* under a new batch_id converges to the same state because
        the merge is a pure max-seq resolution.
        """
        t0 = time.monotonic()
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id, "reason": "already committed"}
        # The apply pipeline is statically shaped (scan → hash agg → Arrow
        # transform → bucket repartition → write; no joins), so AQE's
        # per-stage driver re-planning buys nothing and costs ~20% wall at
        # micro-batch sizes; the Arrow transform also wants far larger
        # batches than the session default (see _APPLY_CONFS). Both are
        # scoped to this batch via a refcounted per-session toggle (lock +
        # depth), so interleaved applies on one SparkSession cannot race
        # the save/restore and strand the session with apply-tuned confs.
        with _apply_conf_scope(self.spark):
            return self._apply_changes_inner(
                events, man, batch_id, transform, source, t0,
                _metrics_extra=_metrics_extra,
            )

    def bootstrap(
        self,
        snapshot: DataFrame,
        snapshot_seq: int,
        *,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ) -> dict:
        """Seed an EMPTY table from a full-state snapshot, then hand off to
        the binlog tail — the CDC bulk-load + catch-up pattern (the
        reference's analog: the initial full-collection export run that
        later re-runs incrementally overwrite,
        convert_cdm_to_mods.py:142-148).

        ``snapshot`` carries table-shaped rows (no op/seq columns);
        ``snapshot_seq`` is the binlog position the snapshot is consistent
        WITH — the highest event ``seq`` already reflected in it. Every
        snapshot row is inserted at exactly that seq, so the handoff needs
        no exact binlog seek: replaying an overlapping range converges,
        because cross-batch last-write-wins by ``_seq`` makes any event at
        ``seq < snapshot_seq`` lose to the snapshot row and events at
        ``seq > snapshot_seq`` win as usual (seq == snapshot_seq describes
        the same state the snapshot captured, so either side is correct).
        Start the tail anywhere at-or-before the snapshot point and
        exactly-once still holds; pass ``min_seq=snapshot_seq`` to the
        event source to skip the already-reflected prefix at the parquet
        scan instead of in the merge — at 10^10 events that is the
        difference between reading footers and re-reading the log.

        Scale shape: the table is empty, so the merge's union-with-
        affected-buckets side is zero files — the load is ONE shuffle (the
        bucket repartition) plus the bucketed write, identical to a plain
        partitioned CTAS, while reusing the apply pipeline's dedup guard,
        schema evolution, metrics, and per-bucket lineage (recorded with
        ``source="bootstrap:seq=N"`` so the handoff point is auditable in
        the manifest). Refuses a non-empty table: bootstrapping over data
        would silently shadow rows — replay into it with ``apply_changes``.
        The emptiness check is read-then-write (not atomic with the
        commit): run bootstrap BEFORE starting any writer, which is the
        only ordering that makes operational sense anyway — the tail's
        min_seq floor comes out of the bootstrap.

        ``merge_engine="aggregate"`` caveat: the overlap tolerance above
        IS the max-seq resolution, which aggregation does not have — a
        replayed event below ``snapshot_seq`` re-adds a contribution the
        snapshot already reflects. Aggregate tables must start the tail
        strictly after the snapshot point (``min_seq=snapshot_seq``
        filters ``seq > N``, which is exactly that) and rely on the
        exactly-once batch ledger for redelivery, not on overlap.
        """
        man = self.manifest()
        if man["buckets"] or man["last_batch_id"] != -1:
            raise RuntimeError(
                "bootstrap requires an empty table (no data commits yet); "
                f"found version={man['version']} with {len(man['buckets'])} "
                "populated buckets — use apply_changes to merge into it"
            )
        events = snapshot.select(
            F.lit("I").alias("op"),
            F.lit(int(snapshot_seq)).cast("long").alias("seq"),
            *[F.col(c) for c in snapshot.columns],
        )
        return self.apply_changes(
            events,
            batch_id=None,
            transform=transform,
            source=f"bootstrap:seq={int(snapshot_seq)}",
            _metrics_extra={"bootstrap_seq": int(snapshot_seq)},
        )

    def reprocess_quarantine(
        self,
        fix: Callable[[DataFrame], DataFrame],
        *,
        batch_id: int | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
    ) -> dict:
        """Re-admit dead-letter rows after repair (the reference's manual
        fix-and-rerun loop for invalid records, post_cdm_cleanup.py:15-37,
        as a first-class op). Reads the quarantine parquet, hands the rows
        (minus the ``_quarantine_batch`` bookkeeping column) to ``fix``,
        and MERGEs the result like any other change batch — rows ``fix``
        leaves unmergeable (still-null keys) simply re-quarantine, so the
        loop is safe to iterate. The quarantine file set is NOT truncated:
        re-applying already-admitted rows converges by seq last-write-wins
        (same idempotence story as any replayed batch); prune the
        directory out-of-band once drained."""
        if self.quarantine_path is None:
            raise ValueError("table has no quarantine_path configured")
        if self.merge_engine == "aggregate" and batch_id is None:
            # the 'safe to iterate' contract above rests on seq
            # last-write-wins; aggregation sums every admitted event, so a
            # re-run without the exactly-once ledger would double-count
            raise ValueError(
                "reprocess_quarantine on merge_engine='aggregate' requires "
                "a batch_id: re-admission is only idempotent through the "
                "exactly-once ledger (aggregates re-sum replayed rows)"
            )
        if not os.path.isdir(self.quarantine_path):
            return {"skipped": True, "reason": "quarantine is empty"}
        q = self.spark.read.parquet(self.quarantine_path)
        fixed = fix(q.drop("_quarantine_batch"))
        return self.apply_changes(
            fixed,
            batch_id=batch_id,
            transform=transform,
            source="quarantine-replay",
            _metrics_extra={"maintenance": "quarantine_replay"},
        )

    def _apply_changes_inner(
        self,
        events: DataFrame,
        man: dict,
        batch_id: int | None,
        transform: Callable[[DataFrame], DataFrame] | None,
        source: str | None,
        t0: float,
        _metrics_extra: dict | None = None,
    ) -> dict:
        # every persist() in the body registers here so a failure anywhere
        # (schema refusal, CHECK raise_error inside a write job, declined
        # commit conflict) cannot leak cache entries — a long-lived replay
        # session retrying bad batches must not accumulate orphaned blocks.
        persisted: list[DataFrame] = []
        try:
            return self._apply_changes_body(
                events, man, batch_id, transform, source, t0,
                persisted, _metrics_extra,
            )
        finally:
            for df in persisted:
                df.unpersist(blocking=False)

    def _refuse_deletes_inline(self, events: DataFrame, reason: str) -> DataFrame:
        """Non-retractable engines refuse D events INLINE — the same
        zero-extra-pass ``raise_error`` trick as CHECK constraints: the
        guard rides the seq column into the collapse aggregate, so the
        first delete fails the job before any commit publishes (and the
        exactly-once ledger lets the fixed batch re-apply)."""
        return events.withColumn(
            "seq",
            F.when(
                F.col("op") == "D",
                F.raise_error(
                    F.concat(
                        F.lit(reason + "; key=("),
                        F.concat_ws(
                            ",",
                            *[F.col(k).cast("string") for k in self.key_cols],
                        ),
                        F.lit(")"),
                    )
                ).cast("long"),
            ).otherwise(F.col("seq")),
        )

    def _apply_changes_body(
        self,
        events: DataFrame,
        man: dict,
        batch_id: int | None,
        transform: Callable[[DataFrame], DataFrame] | None,
        source: str | None,
        t0: float,
        persisted: list,
        _metrics_extra: dict | None = None,
    ) -> dict:

        new_version = man["version"] + 1

        # -2. a batch missing a KEY column would be silently null-filled by
        # the step-4 projection, and null keys compare equal in the dedup
        # groupBy — an entire conversation would collapse into one
        # (conv_id, null) row. That is producer breakage, never data; fail
        # loudly before anything lands.
        missing_keys = [k for k in self.key_cols if k not in events.columns]
        if missing_keys:
            raise SchemaEvolutionError(
                f"change batch is missing key column(s) {missing_keys}; "
                f"the table key is {list(self.key_cols)} — fix the producer"
            )

        # -1. dead-letter routing (optional): null-key rows are unmergeable
        # — split them out to the quarantine sink before anything else.
        # The batch is cached first so routing costs ONE scan of the source,
        # not two: the quarantine write materializes the cache, and the main
        # merge reads the good rows back from memory/disk instead of
        # re-scanning (at 10^10 events a second source pass is real money).
        n_quarantined = 0
        cached_batch: DataFrame | None = None
        if self.quarantine_path is not None:
            cached_batch = events.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(cached_batch)
            bad_pred = None
            for k in self.key_cols:
                p = F.col(k).isNull()
                bad_pred = p if bad_pred is None else (bad_pred | p)
            bad = cached_batch.filter(bad_pred).withColumn(
                "_quarantine_batch", F.lit(batch_id).cast("long")
            )
            obs_bad = Observation()
            (
                bad.observe(obs_bad, F.count(F.lit(1)).alias("n"))
                .write.mode("append")
                .parquet(self.quarantine_path)
            )
            _b = _observed(obs_bad)
            n_quarantined = int(_b["n"]) if _b else 0
            events = cached_batch.filter(~bad_pred)

        # 0. observe op-mix metrics inline — no separate count job over the
        # raw events (at 10^10 events a metrics-only rescan is real money).
        obs_in = Observation()
        events = events.observe(
            obs_in,
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(F.col("op") == o, 1).otherwise(0)).alias(o)
                for o in ("I", "U", "D")
            ],
        )

        # 1. partition + dedup. With the hash32 bucket layout the WHOLE
        # apply needs one shuffle: repartition(n, bucket_col) is exactly
        # the bucket function, so (a) the dedup groupBy's clustering
        # requirement is satisfied (bucket_col ⊆ key_cols — no second
        # exchange), and (b) each task holds exactly one bucket, so the
        # partitionBy write is already aligned (one file per bucket, no
        # repartition before the write). Measured 442k → 514k ev/s at
        # local[32]/16M events vs the two-shuffle plan. Legacy xxhash64
        # tables cannot align with Spark's partitioner and keep the
        # two-shuffle path (dedup shuffle + bucket repartition).
        if self.bucket_fn == "hash32" and self.merge_mode == "mor":
            events = events.repartition(self.num_buckets, F.col(self.bucket_col))
        if self.merge_engine == "partial_update":
            # column-level in-batch collapse: the same single hash
            # aggregate shape as latest_per_key (partitioning on the
            # bucket col still satisfies the groupBy clustering — one
            # exchange), but a key's patches MERGE instead of the last
            # whole row winning, so earlier-in-batch columns survive.
            # preserve_kill: a D followed by a re-creating U in the SAME
            # batch still lands a tombstone row, so it kills columns
            # stored by earlier batches below the delete's rank.
            batch = resolve_partial_update(
                events, self.key_cols, "seq", "op", preserve_kill=True
            )
        elif self.merge_engine == "aggregate":
            guarded = self._refuse_deletes_inline(
                events,
                "merge_engine='aggregate' refuses delete events "
                "(aggregates are not retractable)",
            )
            batch = resolve_aggregate(
                guarded, self.key_cols, "seq", "op", spec=self.agg_spec
            )
        elif self.merge_engine == "first_row":
            guarded = self._refuse_deletes_inline(
                events,
                "merge_engine='first_row' refuses delete events "
                "(the first write per key is immutable)",
            )
            batch = first_per_key(guarded, self.key_cols, "seq")
        else:
            batch = latest_per_key(events, self.key_cols, "seq")
        # 2. vectorized transform chain (the XSLT-library analog).
        if transform is not None:
            batch = transform(batch)

        # 3. schema evolution — shared with the partition router's fused
        # apply (see _evolved_schemas for the three-way split rules).
        schemas, canon = self._evolved_schemas(man, batch.schema)
        schema_id = len(schemas) - 1
        # 4. change rows in target shape (+ bucket).
        is_del = F.col("op") == "D"
        proj = []
        for f in canon.fields:
            if f.name in batch.columns:
                c = F.col(f.name).cast(f.dataType)
                if f.name not in self.key_cols:
                    c = F.when(is_del, F.lit(None).cast(f.dataType)).otherwise(c)
                proj.append(c.alias(f.name))
            else:
                proj.append(F.lit(None).cast(f.dataType).alias(f.name))
        proj.append(F.col("seq").cast("long").alias(SEQ_COL))
        proj.append(is_del.alias(DELETED_COL))
        changes = batch.select(proj).withColumn(
            "_bucket", _bucket_expr(self.bucket_col, self.num_buckets, self.bucket_fn)
        )

        # 4b. CHECK constraints — inline guard, not a validation pass. The
        # predicates fold into the _bucket projection: _bucket feeds the
        # repartition exchange, so Catalyst can never prune the guard AND
        # it is evaluated exactly once per row on the map side (wrapping
        # _seq instead would re-evaluate inside the dedup aggregate's rank
        # and payload structs — measured ~10% on a 2M-row wide batch vs
        # ~0 here). The first violating row fails the job BEFORE any
        # commit publishes. Live rows only: delete events carry a nulled
        # payload by construction. NULL predicate results pass (SQL CHECK).
        cons = man.get("constraints", [])
        if cons:
            viol = [
                ~F.col(DELETED_COL)
                & ~F.coalesce(F.expr(c["expr"]), F.lit(True))
                for c in cons
            ]
            any_bad = viol[0]
            for v in viol[1:]:
                any_bad = any_bad | v
            named = F.concat_ws(
                ", ",
                *[F.when(v, F.lit(c["name"])) for v, c in zip(viol, cons)],
            )
            changes = changes.withColumn(
                "_bucket",
                F.when(
                    any_bad,
                    F.raise_error(
                        F.concat(
                            F.lit("CHECK constraint violated ["), named,
                            F.lit("] by row key=("),
                            F.concat_ws(
                                ",", *[F.col(k).cast("string")
                                       for k in self.key_cols]
                            ),
                            F.lit(")"),
                        )
                    ).cast("int"),
                ).otherwise(F.col("_bucket")),
            )

        # Unique per-commit data directory (version prefix is cosmetic/
        # debuggability): concurrent writers must never contend on a path —
        # an overwrite into a shared version-named dir would clobber the
        # loser's files. Manifests reference full relative paths, so the
        # name never matters to readers; this is why Iceberg data files are
        # uuid-named rather than version-keyed.
        data_rel = f"data/v{new_version:08d}-{uuid4().hex[:8]}"
        vdir = os.path.join(self.path, data_rel)
        buckets = self._mor_buckets(man["buckets"])
        n_written = 0
        n_compacted = 0
        n_minor = 0
        lineage_stats: dict[int, dict] = {}
        cdf: list[dict] = []

        if self.merge_mode == "mor":
            # 5/6-mor. ONE Spark job: dedup → transform → bucket-partitioned
            # DELTA write. The batch itself is the only data computed and
            # written — O(batch) per commit, table size irrelevant. Touched
            # buckets come from the written directory layout and per-bucket
            # lineage (min/max _seq, rows) from parquet footer statistics —
            # driver-side metadata reads, the same way Iceberg/Delta carry
            # per-file stats in manifests, so no second job and no cache.
            to_write = (
                changes  # already task-aligned by the single shuffle
                if self.bucket_fn == "hash32"
                else changes.repartition(self.num_buckets, "_bucket")
            )
            (
                self._capped(
                    to_write.write.partitionBy("_bucket").mode("overwrite")
                ).parquet(vdir)
            )
            post = self._mor_post_write(
                man, canon, schemas, data_rel, persisted
            )
            buckets = post["buckets"]
            lineage_stats = post["lineage_stats"]
            affected = post["affected"]
            n_written = post["n_written"]
            n_compacted = post["n_compacted"]
            n_minor = post["n_minor"]
            cdf = post["cdf"]
        else:
            # 5-cow. one job over the (cached) change set yields BOTH the
            # touched buckets (pruning) and per-bucket lineage; the cache is
            # then reused by the merge write so dedup+transform run exactly
            # once per batch.
            changes = changes.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(changes)
            lineage_rows = (
                changes.groupBy("_bucket")
                .agg(
                    F.max(SEQ_COL).alias("max_seq"),
                    F.min(SEQ_COL).alias("min_seq"),
                    F.count(F.lit(1)).alias("n_changes"),
                )
                .collect()
            )
            lineage_stats = {
                r["_bucket"]: {
                    "max_seq": r["max_seq"],
                    "min_seq": r["min_seq"],
                    "n_changes": r["n_changes"],
                }
                for r in lineage_rows
            }
            affected = sorted(lineage_stats)
            if affected:
                # 6-cow. cross-batch last-write-wins (the MERGE): union
                # affected target buckets with the change set, max _seq per
                # key (op-ranked U>I>D tie-break — latest_per_key), rewrite those buckets
                # under the new snapshot dir — one file per bucket,
                # hash-repartitioned on _bucket so writers are balanced.
                target = self._read_raw(
                    man, buckets=affected, canon=canon
                ).withColumn("_bucket", _bucket_expr(self.bucket_col, self.num_buckets, self.bucket_fn))
                u = target.unionByName(changes)
                if self.bucket_fn == "hash32":
                    # same single-shuffle alignment as mor, applied to the
                    # merge: one repartition on the bucket col satisfies the
                    # resolution agg's clustering AND task-aligns the
                    # bucket-partitioned rewrite — the cow merge+write is
                    # one shuffle, not two (agg exchange + write
                    # repartition).
                    u = u.repartition(self.num_buckets, F.col(self.bucket_col))
                merged = self._resolve_lww(u)
                obs_out = Observation()
                writer_df = merged.observe(obs_out, F.count(F.lit(1)).alias("rows"))
                if self.bucket_fn != "hash32":
                    writer_df = writer_df.repartition(
                        max(len(affected), 1), "_bucket"
                    )
                (
                    self._capped(
                        writer_df.write.partitionBy("_bucket").mode("overwrite")
                    ).parquet(vdir)
                )
                # row count observed during the write job — no read-back scan.
                _w = _observed(obs_out)
                n_written = (
                    int(_w["rows"]) if _w is not None
                    else self.spark.read.parquet(vdir).count()  # fallback
                )
                # zone maps for the rewritten buckets come from footers (the
                # lineage agg above saw only the change batch, not the
                # merged target rows) — driver-side metadata, no job.
                zstats = (
                    _footer_stats(vdir, SEQ_COL, self.stats_cols)
                    if self.stats_cols else {}
                )
                for b in affected:
                    base = {
                        "path": f"{data_rel}/_bucket={b}",
                        "schema_id": schema_id,
                    }
                    if zstats.get(b, {}).get("n_changes") is not None:
                        base["rows"] = zstats[b]["n_changes"]
                    if zstats.get(b, {}).get("stats"):
                        base["stats"] = zstats[b]["stats"]
                    buckets[str(b)] = {"base": base, "deltas": []}
                if self.cow_change_feed:
                    # Delta-CDF pattern: materialize the resolved change
                    # rows beside the rewritten buckets (reuses the cached
                    # change set — one extra O(batch) write).
                    cdf_rel = f"{data_rel}-cdf"
                    changes.write.mode("overwrite").parquet(
                        os.path.join(self.path, cdf_rel)
                    )
                    cdf = [{"path": cdf_rel, "schema_id": schema_id}]
                if self.changelog != "none":
                    cdf += self._emit_changelog(
                        man, canon, changes, affected, data_rel, schema_id,
                        persisted,
                        # the BATCH's resolved row count (lineage agg above),
                        # not n_written: cow's n_written counts the whole
                        # rewritten buckets, which would defeat the
                        # broadcast-probe guard exactly when a small batch
                        # merges into big buckets — the case the hint wins
                        batch_rows=sum(
                            s["n_changes"] for s in lineage_stats.values()
                        ),
                    )
            # unpersist happens in _apply_changes_inner's finally

        observed = _observed(obs_in)
        if observed is None:  # rare fallback path — one explicit agg job
            observed = (
                events.agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.when(F.col("op") == o, 1).otherwise(0)).alias(o)
                        for o in ("I", "U", "D")
                    ],
                )
                .first()
                .asDict()
            )
        n_events = int(observed["n"] or 0)
        op_counts = {
            o: int(observed[o]) for o in ("I", "U", "D") if observed[o]
        }
        return self._commit_apply_tail(
            man=man, new_version=new_version, schemas=schemas,
            buckets=buckets, cdf=cdf, lineage_stats=lineage_stats,
            affected=affected, n_compacted=n_compacted, n_minor=n_minor,
            n_written=n_written, n_quarantined=n_quarantined,
            n_events=n_events, op_counts=op_counts, batch_id=batch_id,
            source=source, t0=t0, data_rel=data_rel,
            _metrics_extra=_metrics_extra,
        )


    def _mor_post_write(
        self,
        man: dict,
        canon: T.StructType,
        schemas: list,
        data_rel: str,
        persisted: list,
    ) -> dict:
        """Everything a MoR batch does AFTER its delta files exist under
        ``self.path/data_rel`` (layout ``data_rel/_bucket=N/``): footer
        stats, feed + typed-changelog entries, delta append onto the
        bucket chains, and two-tier inline compaction. Shared by the
        normal apply (which just ran the write job) and
        ``commit_prewritten_mor_deltas`` (the partition router's fused
        batch write — ONE Spark job wrote many sub-tables' deltas; each
        sub commits its own slice driver-side from footer metadata).
        Returns the pieces the commit tail needs."""
        vdir = os.path.join(self.path, data_rel)
        schema_id = len(schemas) - 1
        buckets = self._mor_buckets(man["buckets"])
        n_compacted = 0
        n_minor = 0
        lineage_stats = _footer_stats(vdir, SEQ_COL, self.stats_cols)
        affected = sorted(lineage_stats)
        n_written = sum(s["n_changes"] for s in lineage_stats.values())
        # change-data-feed record: this version's delta files, pinned
        # BEFORE inline compaction may fold the bucket references away.
        cdf = [
            {"path": f"{data_rel}/_bucket={b}", "schema_id": schema_id}
            for b in affected
        ]
        if self.changelog != "none" and affected:
            # typed changelog BEFORE inline compaction (old state must
            # be the pre-commit chains); the batch rows come back off
            # the just-written deltas — local parquet, no recompute and
            # no cache of the change set.
            cdf += self._emit_changelog(
                man, canon, self.spark.read.parquet(vdir),
                affected, data_rel, schema_id, persisted,
                batch_rows=n_written,
            )
        for b in affected:
            e = buckets.setdefault(str(b), {"base": None, "deltas": []})
            delta = {
                "path": f"{data_rel}/_bucket={b}",
                "schema_id": schema_id,
                "rows": lineage_stats[b]["n_changes"],
            }
            if lineage_stats[b].get("stats"):
                delta["stats"] = lineage_stats[b]["stats"]
            e["deltas"].append(delta)
        # inline compaction: buckets whose delta chain hit the bound are
        # folded (bounded read amplification). Two tiers — the LSM
        # minor/major distinction: a MINOR fold resolves ONLY the delta
        # chain into one combined delta (O(churned keys); the base is
        # never read or rewritten), a MAJOR fold rewrites base + chain
        # into a fresh base. Tier choice by the row counts the manifest
        # entries carry: when the chain is at least as large as the
        # base (or sizes are unknown, or there is no base) a major
        # costs the same order anyway and fully resets the chain; a
        # big-base/small-churn bucket — the 10^10-event steady state,
        # where the base holds a table-lifetime of keys and a chain
        # holds a few micro-batches — folds minor, so per-commit write
        # amplification stays O(batch-scale) and NEVER O(bucket).
        # Correct because last-write-wins max-seq resolution is a
        # tournament over a per-key total order: resolving any subset
        # first cannot change the overall winner.
        due = sorted(
            int(b)
            for b, e in buckets.items()
            if len(e["deltas"]) >= self.compact_deltas
        )
        to_compact, to_minor = [], []
        for b in due:
            e = buckets[str(b)]
            base_rows = (e.get("base") or {}).get("rows")
            d_rows = [d.get("rows") for d in e["deltas"]]
            if (
                not self._minor_folds
                or base_rows is None
                or any(r is None for r in d_rows)
                or sum(d_rows) >= base_rows
            ):
                to_compact.append(b)
            else:
                to_minor.append(b)
        def _fold(bucket_ids: list, include_base: bool, suffix: str) -> dict:
            """Resolve LWW over each bucket's file sets and rewrite one
            sorted file set per bucket; returns {bucket: entry}. Major
            tier folds base+chain (include_base), minor folds the chain
            alone — same read/resolve/write/stats path either way."""
            tmp_man = {
                "schemas": schemas,
                "buckets": {
                    str(b): (
                        buckets[str(b)]
                        if include_base
                        else {"base": None,
                              "deltas": buckets[str(b)]["deltas"]}
                    )
                    for b in bucket_ids
                },
                "renames": man.get("renames", []),
            }
            folded = self._resolve_lww(
                self._read_raw(tmp_man, canon=canon)
            ).withColumn(
                "_bucket",
                _bucket_expr(self.bucket_col, self.num_buckets, self.bucket_fn),
            )
            rel = f"{data_rel}-{suffix}"
            (
                self._capped(
                    folded.repartition(max(len(bucket_ids), 1), "_bucket")
                    .sortWithinPartitions("_bucket", *self.key_cols)
                    .write.partitionBy("_bucket")
                    .mode("overwrite")
                ).parquet(os.path.join(self.path, rel))
            )
            fstats = _footer_stats(
                os.path.join(self.path, rel), SEQ_COL, self.stats_cols
            )
            out = {}
            for b in bucket_ids:
                entry = {
                    "path": f"{rel}/_bucket={b}",
                    "schema_id": schema_id,
                    "rows": fstats.get(b, {}).get("n_changes"),
                }
                if fstats.get(b, {}).get("stats"):
                    entry["stats"] = fstats[b]["stats"]
                out[b] = entry
            return out

        if to_compact:
            n_compacted = len(to_compact)
            for b, base in _fold(to_compact, True, "compact").items():
                buckets[str(b)] = {"base": base, "deltas": []}
        if to_minor:
            n_minor = len(to_minor)
            for b, combined in _fold(to_minor, False, "minor").items():
                buckets[str(b)] = {
                    "base": buckets[str(b)]["base"],
                    "deltas": [combined],
                }
        return {
            "buckets": buckets,
            "lineage_stats": lineage_stats,
            "affected": affected,
            "n_written": n_written,
            "n_compacted": n_compacted,
            "n_minor": n_minor,
            "cdf": cdf,
        }


    def _commit_apply_tail(
        self,
        *,
        man: dict,
        new_version: int,
        schemas: list,
        buckets: dict,
        cdf: list,
        lineage_stats: dict,
        affected: list,
        n_compacted: int,
        n_minor: int,
        n_written: int,
        n_quarantined: int,
        n_events: int,
        op_counts: dict,
        batch_id: int | None,
        source: str | None,
        t0: float,
        data_rel: str,
        _metrics_extra: dict | None,
    ) -> dict:
        """The apply commit tail shared by mor, cow and the prewritten-
        delta path: per-bucket lineage fold, metrics assembly, atomic
        ledger commit with the optimistic-concurrency retry."""
        # 8. lineage: source offsets (per-bucket max seq + rows) → snapshot.
        lineage = dict(man.get("lineage", {}))
        for b, s in lineage_stats.items():
            lineage[str(b)] = _lineage_entry(
                lineage, b, s["max_seq"], s["min_seq"],
                s["n_changes"], new_version, source,
            )

        elapsed = time.monotonic() - t0
        metrics = {
            "batch_id": batch_id,
            "mode": self.merge_mode,
            "n_events": n_events,
            "op_counts": op_counts,
            "n_buckets_touched": len(affected),
            "n_buckets_compacted": n_compacted,
            "n_buckets_minor_compacted": n_minor,
            "n_quarantined": n_quarantined,
            "rows_written": n_written,
            "elapsed_sec": round(elapsed, 3),
            "events_per_sec": round(n_events / elapsed, 1) if elapsed > 0 else None,
            **(_metrics_extra or {}),
        }

        try:
            self._commit(
                {
                    # carried field-by-field (not {**man}: apply rewrites the
                    # whole bucket map) — dropping a carried field here is the
                    # bucket_fn-regression class; keep this list in sync with
                    # create()/retry
                    "format_version": man.get("format_version", FORMAT_VERSION),
                    "version": new_version,
                    "batch_id": batch_id,
                    "last_batch_id": batch_id if batch_id is not None else man["last_batch_id"],
                    "schemas": schemas,
                    "buckets": buckets,
                    "num_buckets": self.num_buckets,
                    "key_cols": list(self.key_cols),
                    "bucket_col": self.bucket_col,
                    "bucket_fn": self.bucket_fn,
                    "merge_engine": self.merge_engine,
                    "agg_spec": self.agg_spec,
                    "cdf": cdf,
                    "lineage": lineage,
                    "renames": man.get("renames", []),
                    "constraints": man.get("constraints", []),
                    "properties": man.get("properties", {}),
                    "metrics": metrics,
                    "commit_ts": time.time(),
                }
            )
            # committed snapshot id, for per-batch source-offset → snapshot
            # lineage at the caller (manifest metrics stay version-free —
            # the manifest IS the version)
            return {**metrics, "version": new_version}
        except RuntimeError:
            # minor folds also rewrite shared chain state — decline retry
            return self._retry_commit_conflict(
                man, new_version, batch_id, schemas, lineage_stats,
                n_compacted + n_minor, source, metrics, data_rel,
            )


    def _evolved_schemas(
        self, man: dict, batch_schema: T.StructType
    ) -> tuple[list, T.StructType]:
        """Schema-evolution step shared by apply_changes and the partition
        router's fused batch path: payload schema vs canonical. Batch
        columns outside the canonical schema split three ways — an
        explicitly DROPPED column is ignored (CDC producers lag table DDL;
        drop means "stop storing this"), a rename-log OLD name is refused
        (silently ignoring it would drop data the producer thinks it is
        writing), and a genuinely fresh name is an implicit ADD
        (evolve_schema) with the same no-historical-name rule as
        add_column. Returns (possibly-extended schemas list, evolved
        canonical schema); raises under schema_mode='strict' on NAME/TYPE
        drift and on aggregate-spec columns leaving the schema."""
        canon = self._canonical_schema(man)
        renamed_away = {
            r["old"]: r["new"]
            for r in man.get("renames", [])
            if r["old"] not in canon.fieldNames()
        }
        historical = {
            n
            for s in man["schemas"]
            for n in schema_from_json(s).fieldNames()
            if n not in canon.fieldNames()
        }
        payload_fields = []
        for f in batch_schema.fields:
            if f.name in _NON_PAYLOAD_EVENT_COLS:
                continue
            if f.name not in canon.fieldNames():
                if f.name in renamed_away:
                    raise SchemaEvolutionError(
                        f"batch column {f.name!r} was renamed to "
                        f"{renamed_away[f.name]!r}; update the producer"
                    )
                if f.name in historical:
                    continue  # explicitly dropped — ignore
            payload_fields.append(f)
        evolved = evolve_schema(canon, T.StructType(payload_fields))
        schemas = list(man["schemas"])
        if evolved.json() != canon.json():
            if self.schema_mode == "strict":
                # enforcement mode: a producer drifting from the declared
                # contract is an error, not an implicit DDL (the reference's
                # strict XSD gate, convert_cdm_to_mods.py:376-385). Raised
                # BEFORE any data lands, so the batch can be re-applied
                # unchanged after the producer (or the table, via
                # add_column/ALTER) is fixed. Only NAME/TYPE drift counts:
                # nullability-only relaxation passes, because Spark loses
                # nullability on every createDataFrame/parquet round trip —
                # refusing it would make strict tables unusable.
                old = {f.name: f.dataType for f in canon.fields}
                drift = [
                    f"+{f.name}:{f.dataType.simpleString()}"
                    if f.name not in old
                    else f"{f.name}:{old[f.name].simpleString()}"
                         f"->{f.dataType.simpleString()}"
                    for f in evolved.fields
                    if f.name not in old or old[f.name] != f.dataType
                ]
                if drift:
                    raise SchemaEvolutionError(
                        "schema_mode='strict' refuses batch schema drift: "
                        + ", ".join(drift)
                    )
            schemas.append(evolved.json())
        canon = evolved
        if self.merge_engine == "aggregate":
            # a spec'd column absent from the canonical schema would
            # silently contribute nothing (resolve_aggregate only sees df
            # columns) — e.g. after drop_column, or a legacy table created
            # before the create()-time spec check
            gone = [c for c in self.agg_spec if c not in canon.fieldNames()]
            if gone:
                raise SchemaEvolutionError(
                    f"agg_spec column(s) {gone} absent from the table "
                    "schema — contributions would be silently dropped"
                )
        return schemas, canon


    def commit_prewritten_mor_deltas(
        self,
        data_rel: str,
        *,
        batch_id: int | None = None,
        source: str | None = None,
        schemas: list | None = None,
        n_events: int | None = None,
        op_counts: dict | None = None,
        t0: float | None = None,
        _metrics_extra: dict | None = None,
    ) -> dict:
        """Commit delta files ALREADY WRITTEN under ``self.path/data_rel``
        (layout ``data_rel/_bucket=N/*.parquet``, rows in canonical shape
        with ``_seq``/``_deleted``) as one MoR batch — the write job ran
        elsewhere. This is the partition router's fused-apply primitive:
        one global Spark job stages a multi-partition batch partitioned by
        (partition, bucket), each ``_part`` directory is moved into its
        sub-table, and the sub-table commits DRIVER-SIDE from parquet
        footer metadata — footer stats, feed/changelog entries, delta
        append, inline compaction, lineage, atomic commit with the
        fast-append conflict retry. The caller is responsible for having
        run in-batch collapse, transform, schema projection and CHECK
        constraints in the fused job (the router does, via the same code
        paths); ``schemas`` is the evolved schema list when the batch
        evolved the table (must extend this table's current list by at
        most one entry), default = current.

        Idempotent like apply_changes: a committed ``batch_id`` skips —
        but NOTE the skip happens after the files were moved in; the
        caller checks the ledger BEFORE staging (the router excludes
        already-committed partitions from the fused write)."""
        if self.merge_mode != "mor":
            raise ValueError(
                "commit_prewritten_mor_deltas is a merge-on-read primitive; "
                f"this table is merge_mode={self.merge_mode!r}"
            )
        t0 = time.monotonic() if t0 is None else t0
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id,
                    "reason": "already committed"}
        if schemas is None:
            schemas = list(man["schemas"])
        else:
            schemas = list(schemas)
            if (
                schemas[: len(man["schemas"])] != man["schemas"]
                or len(schemas) > len(man["schemas"]) + 1
            ):
                raise SchemaEvolutionError(
                    "prewritten-delta schemas list must extend the table's "
                    "current append-only list by at most one entry"
                )
        canon = schema_from_json(schemas[-1])
        persisted: list[DataFrame] = []
        try:
            post = self._mor_post_write(
                man, canon, schemas, data_rel, persisted
            )
            ls = post["lineage_stats"]
            ne = (
                n_events
                if n_events is not None
                else sum(s["n_changes"] for s in ls.values())
            )
            return self._commit_apply_tail(
                man=man, new_version=man["version"] + 1, schemas=schemas,
                buckets=post["buckets"], cdf=post["cdf"], lineage_stats=ls,
                affected=post["affected"], n_compacted=post["n_compacted"],
                n_minor=post["n_minor"], n_written=post["n_written"],
                n_quarantined=0, n_events=int(ne),
                op_counts=dict(op_counts or {}), batch_id=batch_id,
                source=source, t0=t0, data_rel=data_rel,
                _metrics_extra=_metrics_extra,
            )
        finally:
            for df in persisted:
                df.unpersist(blocking=False)

    def _retry_commit_conflict(
        self,
        man: dict,
        lost_version: int,
        batch_id: int | None,
        schemas: list,
        lineage_stats: dict,
        n_compacted: int,
        source: str | None,
        metrics: dict,
        data_rel: str,
    ) -> dict:
        """Optimistic-concurrency retry (the Iceberg fast-append pattern):
        another writer won version ``lost_version``. A merge-on-read batch
        only APPENDED immutable delta files under a unique per-commit
        directory, so the commit replays against the winner's manifest
        without touching data — re-append our delta references onto the
        latest bucket entries and commit the next version. Retry is
        declined (raise) when the batch rewrote shared state: copy-on-write
        rewrites whole buckets from a stale base, and an inline compaction
        folded deltas based on a stale chain — both need a re-merge, not a
        re-commit."""
        if self.merge_mode != "mor" or n_compacted > 0:
            raise RuntimeError(
                f"concurrent commit conflict on version {lost_version}; "
                f"{'copy-on-write' if self.merge_mode != 'mor' else 'inline-compaction'} "
                "batches cannot be replayed onto the winner's manifest — re-apply"
            )
        if self.changelog != "none":
            # the typed changelog's pre-images were looked up against the
            # LOSER's base state; the winner may have changed those very
            # rows, so re-appending would publish stale pre-images. The
            # re-apply recomputes the lookup against the winner's state.
            raise RuntimeError(
                f"concurrent commit conflict on version {lost_version}; "
                "changelog='lookup' batches cannot be replayed onto the "
                "winner's manifest (stale pre-images) — re-apply"
            )
        while True:
            latest = self.manifest()
            if batch_id is not None and batch_id <= latest["last_batch_id"]:
                return {"skipped": True, "batch_id": batch_id,
                        "reason": "committed by concurrent writer"}
            # layout reconciliation: our delta files were bucketed with
            # (bucket_fn, num_buckets); if the winner changed either (a
            # concurrent rebucket), re-appending them would reference a
            # layout the files weren't written under — decline, re-apply.
            if (
                latest.get("num_buckets") != self.num_buckets
                or latest.get("bucket_fn", "xxhash64") != self.bucket_fn
            ):
                raise RuntimeError(
                    "concurrent bucket-layout change during commit conflict; "
                    "re-apply"
                )
            # schema reconciliation: schema lists are append-only, so our
            # delta files' schema_id indexes any list sharing our prefix.
            we_evolved = len(schemas) > len(man["schemas"])
            if not we_evolved:
                schemas2 = latest["schemas"]  # theirs ⊇ ours (prefix)
            elif latest["schemas"] == man["schemas"] or schemas == latest["schemas"]:
                schemas2 = schemas  # they didn't evolve / evolved identically
            else:
                # divergent concurrent evolutions — needs a real re-apply
                raise RuntimeError(
                    "concurrent schema evolution during commit conflict; re-apply"
                )
            new_version = latest["version"] + 1
            schema_id = len(schemas) - 1
            buckets = self._mor_buckets(latest["buckets"])
            cdf = []
            for b in sorted(lineage_stats):
                entry = {
                    "path": f"{data_rel}/_bucket={b}",
                    "schema_id": schema_id,
                    "rows": lineage_stats[b]["n_changes"],
                }
                cdf.append({"path": entry["path"], "schema_id": schema_id})
                # zone maps ride the retried deltas too — without them a
                # batch winning via conflict retry is unprunable until
                # compaction
                if lineage_stats[b].get("stats"):
                    entry["stats"] = lineage_stats[b]["stats"]
                buckets.setdefault(str(b), {"base": None, "deltas": []})[
                    "deltas"
                ].append(entry)
            lineage = dict(latest.get("lineage", {}))
            for b, s in lineage_stats.items():
                lineage[str(b)] = _lineage_entry(
                    lineage, b, s["max_seq"], s["min_seq"],
                    s["n_changes"], new_version, source,
                )
            try:
                self._commit(
                    {
                        "format_version": latest.get(
                            "format_version", FORMAT_VERSION
                        ),
                        "version": new_version,
                        "batch_id": batch_id,
                        "last_batch_id": batch_id
                        if batch_id is not None
                        else latest["last_batch_id"],
                        "schemas": schemas2,
                        "buckets": buckets,
                        "num_buckets": self.num_buckets,
                        "key_cols": list(self.key_cols),
                        "bucket_col": self.bucket_col,
                        "bucket_fn": self.bucket_fn,
                        "merge_engine": self.merge_engine,
                        "agg_spec": self.agg_spec,
                        "cdf": cdf,
                        "lineage": lineage,
                        "renames": latest.get("renames", []),
                        "constraints": latest.get("constraints", []),
                        "properties": latest.get("properties", {}),
                        "metrics": {**metrics, "commit_retried": True},
                        "commit_ts": time.time(),
                    }
                )
                return {**metrics, "commit_retried": True, "version": new_version}
            except RuntimeError:
                continue  # lost again — rename forward and retry

    def commit_appended_deltas(
        self,
        entries: dict[int, dict],
        *,
        schema_id: int,
        batch_id: int | None = None,
        source: str | None = None,
        metrics_extra: dict | None = None,
    ) -> dict:
        """Commit ALREADY-WRITTEN bucket-partitioned delta files as one
        merge-on-read version — the Spark-free half of the native ``lake``
        WRITER (sources/lake_sink.py): data source write tasks land the
        parquet executor-side (pure Arrow), and this method publishes them
        with plain file IO, so the commit runs in the data source's Python
        runner where no SparkSession exists.

        ``entries`` maps bucket id → ``{"path": rel-dir-under-table,
        "rows", "max_seq", "min_seq", "stats"?}`` with every row already
        routed to its hash32 bucket (the caller's contract — parity-pinned
        via functions/hash32.py). The commit is the same Iceberg-style
        fast-append the conflict-retry path performs: reload latest,
        re-append the delta references, publish; loop on collision. Shares
        apply's exactly-once ledger (``batch_id``), per-bucket lineage
        high-water marks, and change-feed cdf records; inline compaction
        cannot run here (no Spark) — chains grow until ``maintain()`` or
        any library-side apply folds them, exactly the dedicated-compactor
        topology Paimon's append-only tables use.

        Declines (raise) when the table carries state this path cannot
        honour: CHECK constraints (inline guards ride the Spark apply
        plan), ``changelog='lookup'`` (pre-images need an old-state
        lookup), or a concurrent bucket-layout change (our files were
        routed under this handle's layout)."""
        if self.changelog != "none":
            raise ValueError(
                "commit_appended_deltas cannot produce changelog records "
                "(pre-image lookup needs Spark) — apply via apply_changes"
            )
        n_events = sum(e.get("rows") or 0 for e in entries.values())
        while True:
            latest = self.manifest()
            if batch_id is not None and batch_id <= latest["last_batch_id"]:
                return {"skipped": True, "batch_id": batch_id,
                        "reason": "already committed"}
            if (
                latest.get("num_buckets") != self.num_buckets
                or latest.get("bucket_fn", "xxhash64") != self.bucket_fn
            ):
                raise RuntimeError(
                    "bucket layout changed since the files were routed "
                    f"(table now {latest.get('bucket_fn')}/"
                    f"{latest.get('num_buckets')} buckets) — re-write the batch"
                )
            if latest.get("constraints"):
                raise RuntimeError(
                    "table now carries CHECK constraints; this append path "
                    "cannot validate rows — apply via apply_changes"
                )
            if schema_id >= len(latest["schemas"]):
                raise RuntimeError(
                    f"schema_id {schema_id} not in the ledger's append-only "
                    f"schema list (len {len(latest['schemas'])})"
                )
            new_version = latest["version"] + 1
            buckets = self._mor_buckets(latest["buckets"])
            cdf = []
            lineage = dict(latest.get("lineage", {}))
            for b in sorted(entries):
                s = entries[b]
                delta = {
                    "path": s["path"],
                    "schema_id": schema_id,
                    "rows": s.get("rows"),
                    # raw event batch: may hold several versions of one key
                    # (the apply path collapses in-batch; this path cannot)
                    # — readers must resolve even a single-set chain
                    "unresolved": True,
                }
                if s.get("stats"):
                    delta["stats"] = s["stats"]
                buckets.setdefault(str(b), {"base": None, "deltas": []})[
                    "deltas"
                ].append(delta)
                cdf.append({"path": s["path"], "schema_id": schema_id})
                lineage[str(b)] = _lineage_entry(
                    lineage, b, s.get("max_seq"), s.get("min_seq"),
                    s.get("rows"), new_version, source,
                )
            metrics = {
                "batch_id": batch_id,
                "mode": "mor",
                "n_events": n_events,
                "n_buckets_touched": len(entries),
                "n_buckets_compacted": 0,
                "rows_written": n_events,
                **(metrics_extra or {}),
            }
            try:
                self._commit(
                    {
                        # carried field-by-field — keep in sync with
                        # create()/apply/_retry_commit_conflict (dropping a
                        # carried field is the bucket_fn-regression class)
                        "format_version": latest.get(
                            "format_version", FORMAT_VERSION
                        ),
                        "version": new_version,
                        "batch_id": batch_id,
                        "last_batch_id": batch_id
                        if batch_id is not None
                        else latest["last_batch_id"],
                        "schemas": latest["schemas"],
                        "buckets": buckets,
                        "num_buckets": self.num_buckets,
                        "key_cols": list(self.key_cols),
                        "bucket_col": self.bucket_col,
                        "bucket_fn": self.bucket_fn,
                        "merge_engine": self.merge_engine,
                        "agg_spec": self.agg_spec,
                        "cdf": cdf,
                        "lineage": lineage,
                        "renames": latest.get("renames", []),
                        "constraints": latest.get("constraints", []),
                        "properties": latest.get("properties", {}),
                        "metrics": metrics,
                        "commit_ts": time.time(),
                    }
                )
                return {**metrics, "version": new_version}
            except RuntimeError as e:
                # only the version race retries; other RuntimeErrors from
                # _commit (e.g. dropped branch) must surface, not spin
                if "concurrent commit conflict" not in str(e):
                    raise
                continue  # lost the version race — fast-forward and retry
