"""Change-feed consumers: exactly-once downstream processing of a
LakeTable's CDF without Structured Streaming.

The streaming tail (streaming/tail.py) covers the binlog→table direction;
this module covers table→downstream: a consumer that polls the snapshot
ledger, hands each new version range's change rows to a callback, and
advances an atomic version checkpoint — the Delta ``readChangeFeed`` /
Iceberg incremental-read pattern (reference analog: the per-stage
materialized pipeline, convert_cdm_to_mods.py:352-373, where each stage
consumes exactly the previous stage's committed output).

Delivery contract: the checkpoint advances only AFTER the callback
returns, so a crash replays the same version range — at-least-once, with
the range ``(since, until]`` as the idempotence token (same shape as
foreachBatch's batchId). ``replicate`` composes this with the lake's
exactly-once batch ledger (``batch_id = until``), making table→table
mirroring exactly-once end to end.

Scale shape: one ``changes()`` read per poll — O(new change files), never
a snapshot diff; the checkpoint is one tiny JSON rename; the mirror apply
is the same single-shuffle MERGE as any other batch.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DELETED_COL, SEQ_COL
from .lake import LakeTable


class ChangeFeedConsumer:
    """Poll a LakeTable's change feed and process new versions exactly once
    (given an idempotent or ledger-guarded callback)."""

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable | str,
        checkpoint_path: str,
        *,
        start_version: int | None = None,
    ) -> None:
        self.spark = spark
        self.table = (
            table if isinstance(table, LakeTable) else LakeTable(spark, table)
        )
        self.checkpoint_path = checkpoint_path
        self._start = start_version

    # ------------------------------------------------------ checkpoint
    def last_consumed(self) -> int:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as fh:
                try:
                    return json.load(fh)["last_version"]
                except (json.JSONDecodeError, KeyError) as e:
                    # surface a repairable operator error instead of an
                    # opaque crash loop on every poll
                    raise RuntimeError(
                        f"corrupt consumer checkpoint {self.checkpoint_path}"
                        f" ({e}); restore it to {{\"last_version\": N}} or "
                        "delete it to restart from start_version"
                    ) from None
        if self._start is not None:
            return self._start
        return 0  # v0 is the empty create — consume everything after it

    def _advance(self, version: int) -> None:
        tmp = f"{self.checkpoint_path}.tmp"
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump({"last_version": version}, fh)
            fh.flush()
            os.fsync(fh.fileno())  # durable BEFORE the atomic rename —
            # a power loss after replace must not leave a truncated file
        os.replace(tmp, self.checkpoint_path)  # atomic on POSIX

    # --------------------------------------------------------- consume
    def pending(self) -> tuple[int, int]:
        """(last consumed version, current head). Equal → caught up."""
        head = self.table.latest_version()
        return self.last_consumed(), head if head is not None else 0

    def lag(self) -> dict:
        """Consumer-lag observability (the Kafka consumer-group lag
        analog, read straight off the ledger — no Spark job): versions
        behind, change rows behind (sum of the pending commits' recorded
        ``n_events`` metrics, None if any pending commit predates
        metrics), and seconds behind head (head ``commit_ts`` minus the
        last consumed version's)."""
        since, head = self.pending()
        behind = [
            v for v in self.table._versions() if since < v <= head
        ]
        rows: int | None = 0
        newest_ts = base_ts = None
        for v in behind:
            m = self.table._load_version(v)
            n = (m.get("metrics") or {}).get("n_events")
            rows = None if (rows is None or n is None) else rows + n
            if m.get("commit_ts"):
                newest_ts = max(newest_ts or 0, m["commit_ts"])
        if since in self.table._versions():
            base_ts = self.table._load_version(since).get("commit_ts")
        return {
            "versions_behind": len(behind),
            "rows_behind": rows if behind else 0,
            "seconds_behind": (
                round(newest_ts - base_ts, 3)
                if behind and newest_ts and base_ts
                else 0.0
            ),
            "last_consumed": since,
            "head": head,
        }

    def process_once(
        self, fn: Callable[[DataFrame, int, int], None]
    ) -> dict:
        """Feed the next pending range to ``fn(changes_df, since, until)``
        and advance the checkpoint afterwards. ``changes_df`` carries the
        canonical columns plus hidden ``_seq``/``_deleted``. Returns
        ``{"since": s, "until": u, "advanced": bool}``; a no-op when
        caught up. A crash inside ``fn`` leaves the checkpoint untouched,
        so the SAME range is redelivered — key any side effect on
        ``(since, until]`` (or use :func:`replicate`, whose lake ledger
        already dedupes)."""
        since, head = self.pending()
        if head <= since:
            return {"since": since, "until": since, "advanced": False}
        feed = self.table.changes(since, head)
        fn(feed, since, head)
        self._advance(head)
        return {"since": since, "until": head, "advanced": True}

    def run_to_head(
        self, fn: Callable[[DataFrame, int, int], None], max_rounds: int = 1000
    ) -> dict:
        """Drain until caught up (new commits may land between polls)."""
        rounds = 0
        last: dict = {"advanced": False}
        while rounds < max_rounds:
            res = self.process_once(fn)
            if not res["advanced"]:
                return {**last, "rounds": rounds}
            last, rounds = res, rounds + 1
        return {**last, "rounds": rounds}


def feed_to_events(feed: DataFrame) -> DataFrame:
    """Change-feed rows → the engine's change-event shape: tombstones
    become 'D' events, everything else 'U' (MERGE treats I/U alike), the
    hidden ``_seq`` becomes the ordering ``seq``."""
    payload = [c for c in feed.columns if c not in (SEQ_COL, DELETED_COL)]
    return feed.select(
        F.when(F.col(DELETED_COL), "D").otherwise("U").alias("op"),
        F.col(SEQ_COL).alias("seq"),
        *payload,
    )


# microsecond precision end to end: the default JSON timestamp format
# truncates to millis, which would silently break a parse→apply mirror's
# exact-state contract on µs-resolution ts values.
_DZ_TS_FMT = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def change_envelope(
    columns: list[str],
    ts_ms: F.Column,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
    exclude: tuple = (),
) -> F.Column:
    """Debezium envelope struct over a change-feed-shaped frame (payload
    columns + ``_seq``/``_deleted``; feed bookkeeping columns excluded).
    Shared by the batch publisher (:func:`feed_to_debezium`) and the
    streaming one (``streaming.source.publish_stream``) so both buses emit
    byte-identical envelopes for the same change rows. ``exclude`` names
    caller-injected helper columns (e.g. the stream's ``_commit_ts``) —
    only the caller knows whether such a column is bookkeeping or a real
    payload column that must ride in the image."""
    payload = [
        c
        for c in columns
        if c not in (SEQ_COL, DELETED_COL, "_version") and c not in exclude
    ]
    image = F.struct(*[F.col(c) for c in payload])
    return F.struct(
        F.when(F.col(DELETED_COL), image).alias("before"),
        F.when(~F.col(DELETED_COL), image).alias("after"),
        F.struct(
            F.col(SEQ_COL).alias("lsn"),
            F.lit(table_name).alias("table"),
            F.lit(db).alias("db"),
        ).alias("source"),
        F.when(F.col(DELETED_COL), F.lit("d")).otherwise(F.lit("u")).alias("op"),
        ts_ms.alias("ts_ms"),
    )


def feed_to_debezium(
    table: LakeTable,
    since_version: int,
    until_version: int | None = None,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
) -> DataFrame:
    """Publish a change-feed version range as Debezium envelope JSON lines
    (one ``value`` column) — the OUTBOUND side of the CDC bus: tombstones
    become ``d`` envelopes carrying the pre-image, everything else ``u``
    (consumers upsert; insert-vs-update needs their state, not ours), the
    hidden ``_seq`` becomes ``source.lsn`` so a downstream
    ``parse_debezium`` → ``apply_changes`` mirror preserves last-write-wins
    ordering, and ``ts_ms`` is the commit timestamp of each row's version
    (driver-side map over the bounded range — O(versions), same cost class
    as the feed's own discovery).

    Round trip: ``parse_debezium(out, payload_schema=<table schema>,
    json_options=feed.py:_DZ_TS_FMT)`` returns events whose apply to an
    empty table reproduces the source's live state (pinned in
    tests/test_feed.py).
    """
    man = table.manifest()
    hi = man["version"] if until_version is None else until_version
    feed = table.changes(since_version, hi, with_version=True)
    ts_pairs: list = []
    for v in range(since_version + 1, hi + 1):
        ts_pairs += [F.lit(v), F.lit(int(table._load_version(v)["commit_ts"] * 1000))]
    ts_ms = (
        F.create_map(*ts_pairs)[F.col("_version")]
        if ts_pairs
        else F.lit(None).cast("long")
    )
    envelope = change_envelope(feed.columns, ts_ms, table_name=table_name, db=db)
    return feed.select(F.to_json(envelope, _DZ_TS_FMT).alias("value"))


def changelog_to_debezium(
    rc: DataFrame,
    key_cols: list,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
    ts_ms: F.Column | None = None,
    identity_cols: list | None = None,
) -> DataFrame:
    """Render a TYPED-changelog frame (``row_changes`` shape: payload +
    ``_seq`` + ``_change_type`` + ``_version``) as FULL Debezium envelopes
    — ``before`` AND ``after`` images with true ``c``/``u``/``d`` ops,
    which the replication feed cannot provide (its rows are resolved
    current values; insert-vs-update and pre-images need old state — the
    lookup changelog is exactly where that was paid for). This is the
    Debezium wire shape a heterogeneous consumer (Kafka Connect sink, audit
    pipeline, cache invalidator keyed on changed columns) expects.

    One hash aggregate per (key, version) pairs each update's
    pre/post-image rows into a single envelope — the only shuffle, keyed
    the same as every merge, so at 10^10 events this is one bounded
    exchange over O(changed rows), never a table read. ``ts_ms``: optional
    per-row commit-timestamp column (the streaming source's
    ``includeCommitTs`` column, or feed_to_debezium's version map).

    Consumer contract: ``op`` is exact — ``c`` (insert: before null),
    ``u`` (update: both images), ``d`` (delete: after null).
    ``source.lsn`` is the COMMIT VERSION, not a source-domain ``_seq``:
    a changelog delete row carries the OLD row's ``_seq`` (pre-image
    semantics), so seq-as-lsn would make a replayed ``d`` LOSE the
    last-write-wins tie against the very row it deletes — the version is
    the token with a per-key total order (one outcome per key per
    commit), so ``parse_debezium`` → ``apply_changes`` mirrors converge.
    The image's source-domain ``_seq`` rides in ``source.seq`` for
    consumers that need it; don't mix this bus with ``feed_to_debezium``
    output (different lsn domains). Round-trip pinned in
    tests/test_changelog_publish.py.

    ``identity_cols``: EXTRA row-identity columns beyond ``key_cols``
    that the pairing aggregate must group on but the payload must not
    carry — a DEFAULT-identity partitioned source's derived partition
    value (row identity there is (partition, key): the same key live in
    two partitions is two rows, and pairing by key alone would merge two
    different rows' images into one corrupt envelope). A paired
    ``delete``+``insert`` in ONE version (the cross-partition MOVE's
    retract pair — impossible on flat tables, whose changelog has one
    outcome per key per commit) renders as ``u``: the net effect is the
    row live at the after image, and a bare ``d`` would make every
    consumer drop a row that still exists."""
    # late import: streaming.source imports plans.lake, not this module
    from ..streaming.source import COMMIT_TS_COL

    typ = F.col("_change_type")
    identity_cols = list(identity_cols or [])
    payload = [
        c for c in rc.columns
        if c not in (SEQ_COL, "_change_type", "_version", COMMIT_TS_COL,
                     *identity_cols)
    ]
    image = F.struct(*[F.col(c) for c in payload])
    is_pre = typ.isin("update_preimage", "delete")
    grouped = rc.groupBy(*key_cols, *identity_cols, "_version").agg(
        F.any_value(F.when(is_pre, image), ignoreNulls=True).alias("before"),
        F.any_value(F.when(~is_pre, image), ignoreNulls=True).alias("after"),
        F.max(F.when(typ == "insert", 1).otherwise(0)).alias("_ins"),
        F.max(F.when(typ == "delete", 1).otherwise(0)).alias("_del"),
        F.max(SEQ_COL).alias("_seq_info"),
        *(
            [F.any_value(ts_ms, ignoreNulls=True).alias("_ts_ms")]
            if ts_ms is not None
            else []
        ),
    )
    envelope = F.struct(
        F.col("before"),
        F.col("after"),
        F.struct(
            F.col("_version").alias("lsn"),
            F.col("_seq_info").alias("seq"),
            F.lit(table_name).alias("table"),
            F.lit(db).alias("db"),
        ).alias("source"),
        F.when(
            (F.col("_del") == 1) & (F.col("_ins") == 1), F.lit("u")
        )
        .when(F.col("_del") == 1, F.lit("d"))
        .when(F.col("_ins") == 1, F.lit("c"))
        .otherwise(F.lit("u"))
        .alias("op"),
        (
            F.col("_ts_ms") if ts_ms is not None else F.lit(None).cast("long")
        ).alias("ts_ms"),
    )
    return grouped.select(F.to_json(envelope, _DZ_TS_FMT).alias("value"))


def changelog_range_to_debezium(
    table: LakeTable,
    since_version: int,
    until_version: int | None = None,
    *,
    table_name: str = "transcripts",
    db: str = "cdm",
) -> DataFrame:
    """Batch counterpart of the streaming changelog publisher: render the
    typed changelog for ``(since, until]`` as full Debezium envelopes
    (commit timestamps mapped per version, same driver-side O(versions)
    walk as :func:`feed_to_debezium`). Raises
    ``ChangelogUnavailableError`` where ``row_changes`` does.

    A DEFAULT-identity PartitionedTable (row identity = (partition,
    key)) pairs images on the DERIVED partition value too — the same
    key live in two partitions is two rows, and one global commit
    touching both would otherwise merge their images into one corrupt
    envelope. ``cross_partition_upsert`` sources keep key-only pairing
    (identity is global); their mover retract pairs render as ``u``."""
    man = table.manifest()
    hi = man["version"] if until_version is None else until_version
    rc = table.row_changes(since_version, hi)
    identity_cols = None
    if (
        getattr(table, "partition_col", None) is not None
        and not getattr(table, "cross_partition_upsert", False)
    ):
        rc = rc.withColumn("_ident_part", table._part_expr())
        identity_cols = ["_ident_part"]
    ts_pairs: list = []
    for v in range(since_version + 1, hi + 1):
        # flat tables read the raw version file; routers (no
        # _load_version) read the global manifest, which records the
        # same commit_ts field
        raw = (
            table._load_version(v)
            if hasattr(table, "_load_version")
            else table.manifest(v)
        )
        ts_pairs += [F.lit(v), F.lit(int(raw["commit_ts"] * 1000))]
    ts_ms = (
        F.create_map(*ts_pairs)[F.col("_version")]
        if ts_pairs
        else F.lit(None).cast("long")
    )
    return changelog_to_debezium(
        rc, list(table.key_cols), table_name=table_name, db=db, ts_ms=ts_ms,
        identity_cols=identity_cols,
    )


def replicate(
    consumer: ChangeFeedConsumer, dst: LakeTable, *, transform=None
) -> dict:
    """Mirror the consumer's source table into ``dst`` exactly once: each
    pending version range is applied as one batch with
    ``batch_id = until``-version, so a redelivered range (crash between
    apply and checkpoint) is skipped by the destination's batch ledger —
    at-least-once delivery × idempotent apply = exactly-once replication.
    ``transform`` optionally rewrites the change rows in flight (a
    filtered/cleansed replica)."""
    out: dict = {}

    def _apply(feed: DataFrame, since: int, until: int) -> None:
        ev = feed_to_events(feed)
        if transform is not None:
            ev = transform(ev)
        m = dst.apply_changes(
            ev, batch_id=until, transform=None,
            source=f"replicate:{consumer.table.path}@({since},{until}]",
        )
        if m.get("skipped") and dst.manifest()["last_batch_id"] > until:
            # the ledger skipped us because SOMETHING ELSE wrote a higher
            # batch_id — the destination has another producer (a streaming
            # tail, a different replication source). Silently advancing
            # the checkpoint would drop this range forever; replication
            # requires an exclusive destination ledger.
            raise RuntimeError(
                f"replication destination {dst.path} has batch ledger at "
                f"{dst.manifest()['last_batch_id']} > feed version {until}"
                " — another producer writes this table; replicate needs an"
                " exclusive destination"
            )
        out["last_metrics"] = m

    res = consumer.run_to_head(_apply)
    return {**res, **out}
