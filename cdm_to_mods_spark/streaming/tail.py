"""Structured Streaming change-stream tail.

The reference's re-runnable batch export loop (wipe-and-redo,
convert_cdm_to_mods.py:142-148; per-stage materialized pipeline
:352-373) becomes a checkpointed micro-batch tail: a file source over
binlog segment directories feeds ``foreachBatch``, and every micro-batch
goes through the SAME ``LakeTable.apply_changes`` the batch replay uses —
one code path, two drivers.

Exactly-once: Spark's checkpoint gives at-least-once delivery of each
micro-batch to ``foreachBatch``; the lake's ``last_batch_id`` ledger makes
the apply idempotent, so the composition is exactly-once (the reference's
IsCountsCorrect reconciliation, post_cdm_cleanup.py:15-37, upgraded from
"abort on mismatch" to "cannot mismatch").

Resume-from-checkpoint: restart with the same ``checkpoint_dir`` and the
stream continues from the last committed source offsets; already-applied
batches are skipped by the ledger (tested in tests/test_streaming.py by
killing mid-replay and restarting).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions.chain import apply_chain
from ..plans.lake import LakeTable
from ..schemas import EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from ..sources.events import read_events


def _record_batch_metrics(sink, metrics_path, metrics: dict,
                          t0: float) -> None:
    """Shared per-micro-batch metrics tail of every streaming consumer
    (binlog tail, multi-table router, compacted-topic upsert): stamp
    ``wall_sec``, append to the bounded in-memory deque, and append one
    JSONL line to the durable sink when configured — ONE copy, so a
    change to the metrics contract cannot silently diverge the tails."""
    metrics["wall_sec"] = round(time.monotonic() - t0, 3)
    sink.append(metrics)
    if metrics_path:
        with open(metrics_path, "a") as fh:
            fh.write(json.dumps(metrics) + "\n")


def _ensure_branch_fork(main_t, branch: str) -> None:
    """WAP bootstrap shared by the flat and partitioned tails: create
    the main table (empty) and the staging branch on first use, so a
    branch tail is a one-liner; losing a concurrent create_branch race
    is fine — create_branch is atomic-exclusive, so losing means the
    branch now exists."""
    if not main_t.exists():
        main_t.create(TRANSCRIPT_SCHEMA)
    if branch not in {m["name"] for m in main_t.branches()}:
        try:
            main_t.create_branch(branch)
        except ValueError:
            pass  # lost a TOCTOU race: the branch now exists


def _make_sliding(spark, sliding_view_path):
    """Optional sliding ingest-metrics view, same spec on both tail
    paths: additive slice partials folded per micro-batch
    (operators/slicing.py), exactly-once by batch_id."""
    if sliding_view_path is None:
        return None
    from ..operators.slicing import SlidingWindowView

    return SlidingWindowView(
        spark, sliding_view_path, "ingest_ts", "2 hours", "1 hour",
        {"n_events": ("count", "*")},
    )


class StreamingReplay:
    """Tail a directory of event files into a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        events_dir: str,
        table_path: str,
        checkpoint_dir: str,
        *,
        num_buckets: int = 32,
        merge_mode: str = "cow",
        transform: Callable[[DataFrame], DataFrame] | None = apply_chain,
        metrics_path: str | None = None,
        max_files_per_trigger: int | None = None,
        source_format: str = "parquet",
        stats_view_path: str | None = None,
        sliding_view_path: str | None = None,
        branch: str = "main",
        min_seq: int | None = None,
        quarantine_path: str | None = None,
        compact_deltas: int = 8,
        partition_by: str | None = None,
        partition_col: str = "ts",
        maintain_every: int | None = None,
        maintain_policy: dict | None = None,
    ) -> None:
        self.spark = spark
        self.events_dir = events_dir
        self.checkpoint_dir = checkpoint_dir
        self.transform = transform
        self.metrics_path = metrics_path
        self.max_files_per_trigger = max_files_per_trigger
        self.source_format = source_format
        # snapshot-handoff floor (LakeTable.bootstrap): events at
        # seq <= min_seq are already reflected in the bootstrapped state —
        # skip them at the scan (parquet footer pushdown) instead of
        # re-resolving them in the merge.
        self.min_seq = min_seq
        # in-loop maintenance (the Paimon write-path-compaction / Delta
        # auto-OPTIMIZE role): every N SUCCESSFUL applies, run the
        # threshold-driven maintain() scheduler between micro-batches —
        # same thread as the writer, so the maintenance-owner assumption
        # (never concurrent with an in-flight commit) holds by
        # construction. Decisions are driver-side manifest/footer reads
        # (describe_detail cost class), so a no-op tick is cheap; actual
        # folds/bin-packs only run when the policy thresholds say due.
        if maintain_every is not None and maintain_every < 1:
            raise ValueError(f"maintain_every must be >= 1, got {maintain_every}")
        self.maintain_every = maintain_every
        self.maintain_policy = dict(maintain_policy or {})
        self._applies_since_maintain = 0
        if partition_by is not None:
            # time-partitioned ingest target: route the SAME tail into a
            # months(ts) x bucket(key) PartitionedTable (plans/partitioned)
            # — steady-state micro-batches land in 1-2 recent partitions,
            # retention becomes O(1) drop_partition, and mid-history range
            # reads prune whole partition directories. Exactly-once
            # composes: Spark's checkpoint redelivers, the router's global
            # ledger dedupes whole batches, and a crash mid-fan-out
            # converges through each sub-table's own batch ledger.
            if stats_view_path is not None:
                raise ValueError(
                    "partition_by does not compose with stats_view_path: "
                    "ConversationStatsView consumes a flat table's change "
                    "feed (attach views to per-partition handles instead)"
                )
            from ..plans.partitioned import PartitionedTable

            if branch != "main":
                if maintain_every is not None:
                    raise ValueError(
                        "maintain_every does not compose with a branch "
                        "tail on a partitioned table: the router's "
                        "maintenance surface is main-only (run maintain() "
                        "on a main handle after publish instead)"
                    )
                # global write-audit-publish tail, same one-liner contract
                # as the flat path: fork (and the empty table under it) is
                # created on first use; audit the branch router, then
                # ``publish_branch`` on a main handle fast-forwards.
                _ensure_branch_fork(
                    PartitionedTable(
                        spark, table_path, granularity=partition_by,
                        partition_col=partition_col,
                        num_buckets=num_buckets, merge_mode=merge_mode,
                        compact_deltas=compact_deltas,
                    ),
                    branch,
                )
            self.table = PartitionedTable(
                spark, table_path,
                granularity=partition_by,
                partition_col=partition_col,
                num_buckets=num_buckets, merge_mode=merge_mode,
                quarantine_path=quarantine_path,
                compact_deltas=compact_deltas,
                branch=branch,
            )
            if not self.table.exists():
                self.table.create(TRANSCRIPT_SCHEMA)
            self.view = None
            self.sliding = _make_sliding(spark, sliding_view_path)
            from collections import deque

            self.batch_metrics: deque = deque(maxlen=10_000)
            return
        if branch != "main":
            # write-audit-publish tail: stage the whole stream on a branch
            # main readers never see, audit the branch handle, then
            # ``table.publish_branch`` on a main handle fast-forwards (or
            # drop_branch abandons).
            _ensure_branch_fork(
                LakeTable(
                    spark, table_path, num_buckets=num_buckets,
                    merge_mode=merge_mode, compact_deltas=compact_deltas,
                ),
                branch,
            )
        self.table = LakeTable(
            spark, table_path, num_buckets=num_buckets, merge_mode=merge_mode,
            branch=branch, quarantine_path=quarantine_path,
            compact_deltas=compact_deltas,
        )
        if not self.table.exists():
            self.table.create(TRANSCRIPT_SCHEMA)
        # optional downstream consumer: the per-conversation materialized
        # view advances incrementally after each micro-batch commit (the
        # CDC pattern end-to-end: binlog tail → MERGE → change feed → view).
        self.view = None
        if stats_view_path is not None:
            from ..plans.incremental import ConversationStatsView

            # incremental refresh reads the change feed; under cow that
            # requires the Delta-CDF side files.
            if merge_mode == "cow":
                self.table.cow_change_feed = True
            self.view = ConversationStatsView(spark, self.table, stats_view_path)
        self.sliding = _make_sliding(spark, sliding_view_path)
        # bounded: continuous tails run indefinitely and metrics_path is
        # the durable sink — an unbounded list is a slow driver leak.
        from collections import deque

        self.batch_metrics: deque = deque(maxlen=10_000)

    # ------------------------------------------------------------------
    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        metrics = self.table.apply_changes(
            batch_df,
            batch_id=batch_id,
            transform=self.transform,
            source=f"stream:{self.events_dir}",
        )
        if self.view is not None:
            # runs ALSO for skipped (crash-redelivered) batches: the crash
            # may have been between the table commit and the view refresh,
            # leaving the view one version behind forever if redelivery
            # skipped it; refresh() is idempotent when already caught up.
            metrics["view"] = self.view.refresh()
        if self.sliding is not None:
            # runs even when the MERGE skipped (crash-redelivery): the
            # sliding ledger decides idempotence by its own last_batch_id
            metrics["sliding"] = self.sliding.update(batch_df, batch_id=batch_id)
        if self.maintain_every is not None and not metrics.get("skipped"):
            self._applies_since_maintain += 1
            if self._applies_since_maintain >= self.maintain_every:
                self._applies_since_maintain = 0
                metrics["maintain"] = self._run_maintain()
        _record_batch_metrics(
            self.batch_metrics, self.metrics_path, metrics, t0
        )

    def _run_maintain(self) -> dict:
        """One maintenance tick between micro-batches; returns a compact
        per-action summary (full results would bloat the metrics JSONL —
        run maintain(dry_run=True) by hand for the reasons/signals)."""
        if hasattr(self.table, "maintain"):  # PartitionedTable fan-out
            res = self.table.maintain(**self.maintain_policy)
            return {p: [a["action"] for a in r["actions"]]
                    for p, r in res.items()}
        from ..plans.maintenance import maintain as _maintain

        res = _maintain(self.table, **self.maintain_policy)
        return {"actions": [a["action"] for a in res["actions"]]}

    def start(self, *, available_now: bool = True):
        """Start the tail. ``available_now`` processes the current backlog
        then stops (the replay mode); False runs continuously."""
        events = read_events(
            self.spark,
            self.events_dir,
            fmt=self.source_format,
            streaming=True,
            schema=EVENT_SCHEMA,
            max_files_per_trigger=self.max_files_per_trigger,
            min_seq=self.min_seq,
        )

        writer = (
            events.writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName("cdc-replay")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, timeout_sec: float = 600.0):
        """Process the full backlog and return the converged table
        (a ``LakeTable``, or a ``PartitionedTable`` under ``partition_by``).

        Raises ``TimeoutError`` if the backlog did not finish inside
        ``timeout_sec`` — returning the table anyway would report a
        PARTIAL replay as converged (the checkpoint keeps the progress, so
        re-running resumes where the stopped query left off)."""
        q = self.start(available_now=True)
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            q.stop()
            raise TimeoutError(
                f"streaming replay did not drain the backlog within "
                f"{timeout_sec}s; progress is checkpointed at "
                f"{self.checkpoint_dir} — re-run to resume"
            )
        return self.table


def resume_offsets(checkpoint_dir: str) -> list[str]:
    """Debug helper: which offset files has the checkpoint committed?"""
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return []
    return sorted(f for f in os.listdir(commits) if not f.startswith("."))
