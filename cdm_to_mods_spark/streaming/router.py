"""Multi-table WAL routing — one change stream, many lake tables.

The reference processes one collection per run (convert_cdm_to_mods.py's
single input alias); a real CDC bus carries every table of the upstream
database in one WAL. This router fans a single event stream with a
``table`` discriminator column (exactly what a multi-table Debezium feed
yields via ``parse_debezium(include_table=True)``) into per-table
``LakeTable.apply_changes`` MERGEs.

Exactly-once across tables WITHOUT a cross-table transaction: every table
keeps its own ``last_batch_id`` ledger, and the router applies one source
micro-batch to each table under the SAME batch_id. A crash between table
commits (A committed batch 7, B not yet) redelivers batch 7 on restart:
A's ledger skips, B applies — the composition converges per table, and no
reader ever sees a torn batch *within* one table. What this deliberately
does NOT provide is cross-table snapshot isolation for LIVE reads (a
reader joining A@7 with B@6 during the redelivery window sees the bus's
ordinary eventual consistency — same contract as Debezium topics consumed
independently). Readers who need a consistent cross-table view time-travel
instead: ``consistent_cut`` / ``read_consistent`` compute, per table, the
version reflecting exactly the bus prefix ``batch_id <= cut`` — possible
precisely because batches apply sequentially and in order, so only the
single newest batch can ever be torn.

Scale shape: the micro-batch is persisted once and each table's MERGE
filters from the cache, so k tables cost ONE source scan + k bucket-local
merges, not k scans. The per-table row counts come from a single tiny
groupBy over the cache (k rows to the driver — bounded by table count,
never by data).
"""

from __future__ import annotations

import json
import time
from collections import deque
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.storagelevel import StorageLevel

from ..functions.chain import apply_chain
from ..plans.lake import LakeTable
from ..schemas import EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from ..sources.events import read_events
from .tail import _record_batch_metrics

ROUTER_COL = "table"

# EVENT_SCHEMA plus the table discriminator — the multi-table binlog shape.
ROUTED_EVENT_SCHEMA = T.StructType(
    list(EVENT_SCHEMA.fields) + [T.StructField(ROUTER_COL, T.StringType(), False)]
)


class UnknownTableError(ValueError):
    """The batch routed events to a table the router was not configured
    with — refusing is the strict default (silently dropping a table's
    changes would diverge the replica forever)."""


def apply_multi(
    tables: dict[str, LakeTable],
    events: DataFrame,
    batch_id: int | None = None,
    *,
    router_col: str = ROUTER_COL,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    unknown_tables: str = "error",
    source: str | None = None,
) -> dict:
    """Apply one routed change batch to every destination table.

    ``unknown_tables``: ``"error"`` (default) raises ``UnknownTableError``
    listing the unconfigured names; ``"ignore"`` drops their events but
    reports them in the returned metrics (``unknown``) so the caller can
    alert. Tables are applied in sorted-name order (deterministic logs).
    Returns ``{"batch_id": .., "tables": {name: merge_metrics}, "unknown":
    {name: n_events}}``.
    """
    if unknown_tables not in ("error", "ignore"):
        raise ValueError("unknown_tables must be 'error' or 'ignore'")
    # one source scan: everything below filters from this cache
    events = events.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = {
            r[router_col]: r["n"]
            for r in events.groupBy(router_col).agg(F.count("*").alias("n")).collect()
        }
        unknown = {n: c for n, c in counts.items() if n not in tables}
        if unknown and unknown_tables == "error":
            # a NULL discriminator lands here too (the batch's declared
            # non-null column still reads null from JSON/CSV) — render it
            # explicitly instead of letting sorted() TypeError on
            # str-vs-None and mask the actionable error
            names = sorted(
                "<null>" if n is None else n for n in unknown
            )
            raise UnknownTableError(
                f"batch {batch_id} routes events to unconfigured tables "
                f"{names}; configured: {sorted(tables)} — pass "
                f"unknown_tables='ignore' to drop (reported in metrics)"
            )
        out: dict = {"batch_id": batch_id, "tables": {}, "unknown": unknown}
        for name in sorted(tables):
            if not counts.get(name):
                # no events for this table in this batch: nothing to merge,
                # and idempotence needs no ledger advance (an empty
                # redelivery merges nothing by definition)
                continue
            sub = events.filter(F.col(router_col) == name).drop(router_col)
            out["tables"][name] = tables[name].apply_changes(
                sub,
                batch_id=batch_id,
                transform=transform,
                source=source or f"router:{name}",
            )
        return out
    finally:
        events.unpersist()


# maintenance/DDL commits that do not change which stream batches are
# reflected in the live rows: a cut read may safely time-travel BELOW
# them (schema follows the returned version, as in any version read).
_STATE_PRESERVING = frozenset(
    {
        "compact",
        "rebucket",
        "add_column",
        "widen_column",
        "drop_column",
        "rename_column",
        "set_property",
        "unset_property",
        "add_constraint",
        "drop_constraint",
    }
)


def _version_at_batch(table: LakeTable, cut: int) -> int:
    """Newest retained version whose live rows reflect exactly the stream
    batches ``<= cut`` — newer stream commits are time-traveled below,
    state-preserving maintenance is skipped, and anything that mutated
    rows outside the stream (rollback, update_where/delete_where,
    quarantine replay, ad-hoc merge_into) disqualifies the table from cut
    reads: the cut's meaning is "the bus's prefix", which out-of-band
    writes break."""
    from ..plans.lake import SnapshotExpiredError

    squash_skipped = False
    for h in table.history():
        bid = h["batch_id"]
        op = h["operation"]
        if op in ("merge_into", "quarantine_replay", "overwrite_where"):
            # even WITH a batch_id (these surfaces accept one as their
            # own idempotence token): they are not the router's apply —
            # merge_into's ids live in a different numbering, and
            # quarantine replays / predicate overwrites mutate rows
            # outside the bus, so treating any of them as a bus commit
            # would mislabel the cut. The op check must run BEFORE the
            # bid early-return below for exactly that reason.
            raise ValueError(
                f"table {table.path} has an out-of-band state change "
                f"{op!r} at version {h['version']}; consistent cuts "
                "are defined only for stream-owned replicas"
            )
        if bid is not None:
            if bid <= cut:
                if squash_skipped and bid != cut:
                    # a publish/clone above folded batches (bid, cut]
                    # into one squash this walk skipped — the prefix
                    # <= cut exists ONLY inside that squash, so no
                    # retained version can serve the cut exactly
                    break
                return h["version"]
            continue  # newer than the cut: read below it
        if op in _STATE_PRESERVING:
            continue
        if op in ("CREATE", "bootstrap"):
            # contain no stream batches at all: the pre-stream state
            # serves every cut — UNLESS a skipped squash above folded
            # the very batches <= cut the cut read is asking for
            if squash_skipped and cut >= 0:
                break
            return h["version"]
        if op in ("publish", "clone"):
            # these squashes carry the exact bus prefix they folded in
            # last_batch_id: at or below the cut they ARE the cut state;
            # above it, look below (a publish folded past the cut still
            # has the pre-fork main history under it) — but remember the
            # skip: a cut STRICTLY INSIDE the folded window cannot be
            # served by anything below (pre-fix this silently returned
            # the pre-fork state, an empty read labeled as the cut)
            lb = table._load_version(h["version"]).get("last_batch_id", -1)
            if lb <= cut:
                return h["version"]
            squash_skipped = True
            continue
        raise ValueError(
            f"table {table.path} has an out-of-band state change "
            f"{op!r} at version {h['version']}; consistent cuts are "
            "defined only for stream-owned replicas"
        )
    raise SnapshotExpiredError(
        f"{table.path}'s retained ledger cannot serve cut batch_id={cut} — "
        "the versions a cut read needs were expired (or the table was "
        "cloned/published past the cut); re-seed from a current snapshot "
        "instead"
    )


def consistent_cut(
    tables: dict[str, LakeTable], *, assume_complete: bool = False
) -> dict:
    """Cross-table snapshot cut over one router's destination tables.

    The router commits each source micro-batch to its tables sequentially
    and in batch order, so a crash can tear AT MOST the single newest
    batch ``M = max(last_batch_id)`` across tables: every batch ``< M``
    provably completed on every table before ``M`` started. The returned
    cut is therefore ``M - 1`` — or ``M`` with ``assume_complete=True``,
    for when the caller KNOWS the stream drained cleanly (e.g. right
    after ``run_to_completion``). Reading each table AS OF its returned
    version yields a cross-table-consistent view: exactly the bus prefix
    ``batch_id <= cut`` everywhere — the snapshot-isolation piece the
    per-table ledgers deliberately do not give a live reader (module
    docstring).

    Driver-side over retained manifests (O(versions) tiny JSON reads per
    table, no Spark job). Returns ``{"batch_id", "versions": {name:
    version}, "last_batch_ids": {name: last}}``.
    """
    if not tables:
        raise ValueError("tables must name at least one destination")
    last = {n: t.manifest()["last_batch_id"] for n, t in tables.items()}
    m = max(last.values())
    # -1 already means "no batches": the empty prefix is trivially complete
    cut = m if assume_complete else max(m - 1, -1)
    return {
        "batch_id": cut,
        "last_batch_ids": last,
        "versions": {n: _version_at_batch(t, cut) for n, t in tables.items()},
    }


def read_consistent(
    tables: dict[str, LakeTable],
    *,
    batch_id: int | None = None,
    assume_complete: bool = False,
) -> dict[str, DataFrame]:
    """Per-table DataFrames at one consistent cross-table cut (see
    :func:`consistent_cut`). ``batch_id`` pins an explicit cut (e.g. for
    a reproducible cross-table join in a downstream job); default is the
    newest provably-complete one."""
    if batch_id is None:
        cut = consistent_cut(tables, assume_complete=assume_complete)
    else:
        cut = {
            "batch_id": batch_id,
            "versions": {n: _version_at_batch(t, batch_id) for n, t in tables.items()},
        }
    return {
        n: tables[n].read(version=cut["versions"][n]) for n in sorted(tables)
    }


class MultiTableReplay:
    """Tail one multi-table event stream into several LakeTables.

    ``table_paths`` maps discriminator values to lake-table paths; every
    table is created at ``TRANSCRIPT_SCHEMA`` if absent. The source is any
    ``read_events`` format carrying a ``table`` column (``debezium`` keeps
    ``source.table`` automatically; parquet/json/csv binlogs carry it as a
    plain column at ``ROUTED_EVENT_SCHEMA``).
    """

    def __init__(
        self,
        spark: SparkSession,
        events_dir: str,
        table_paths: dict[str, str],
        checkpoint_dir: str,
        *,
        num_buckets: int = 32,
        merge_mode: str = "cow",
        transform: Callable[[DataFrame], DataFrame] | None = apply_chain,
        source_format: str = "parquet",
        metrics_path: str | None = None,
        max_files_per_trigger: int | None = None,
        unknown_tables: str = "error",
        quarantine_path: str | None = None,
        compact_deltas: int = 8,
    ) -> None:
        if not table_paths:
            raise ValueError("table_paths must name at least one destination")
        self.spark = spark
        self.events_dir = events_dir
        self.checkpoint_dir = checkpoint_dir
        self.transform = transform
        self.source_format = source_format
        self.metrics_path = metrics_path
        self.max_files_per_trigger = max_files_per_trigger
        self.unknown_tables = unknown_tables
        self.tables: dict[str, LakeTable] = {}
        for name, path in table_paths.items():
            t = LakeTable(
                spark, path, num_buckets=num_buckets, merge_mode=merge_mode,
                compact_deltas=compact_deltas,
                quarantine_path=(
                    None if quarantine_path is None
                    else f"{quarantine_path}/{name}"
                ),
            )
            if not t.exists():
                t.create(TRANSCRIPT_SCHEMA)
            self.tables[name] = t
        self.batch_metrics: deque = deque(maxlen=10_000)

    # ------------------------------------------------------------------
    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        metrics = apply_multi(
            self.tables,
            batch_df,
            batch_id,
            transform=self.transform,
            unknown_tables=self.unknown_tables,
            source=f"stream:{self.events_dir}",
        )
        _record_batch_metrics(
            self.batch_metrics, self.metrics_path, metrics, t0
        )

    def _source(self) -> DataFrame:
        if self.source_format == "debezium":
            from ..sources.debezium import read_debezium

            return read_debezium(
                self.spark,
                self.events_dir,
                streaming=True,
                include_table=True,
                max_files_per_trigger=self.max_files_per_trigger,
            )
        return read_events(
            self.spark,
            self.events_dir,
            fmt=self.source_format,
            streaming=True,
            schema=ROUTED_EVENT_SCHEMA,
            max_files_per_trigger=self.max_files_per_trigger,
        )

    def start(self, *, available_now: bool = True):
        writer = (
            self._source()
            .writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName("cdc-replay-multi")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def consistent_read(
        self, *, batch_id: int | None = None, assume_complete: bool = False
    ) -> dict[str, DataFrame]:
        """Cross-table-consistent DataFrames over this router's tables —
        see :func:`read_consistent`."""
        return read_consistent(
            self.tables, batch_id=batch_id, assume_complete=assume_complete
        )

    def run_to_completion(self, timeout_sec: float = 600.0) -> dict[str, LakeTable]:
        """Drain the backlog; returns the converged tables by name.
        Same partial-replay contract as ``StreamingReplay``."""
        q = self.start(available_now=True)
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"multi-table replay did not drain within {timeout_sec}s; "
                f"progress is checkpointed at {self.checkpoint_dir} — "
                f"re-run to resume"
            )
        return self.tables
