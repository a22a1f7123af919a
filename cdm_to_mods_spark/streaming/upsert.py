"""Structured Streaming upsert tail — snapshot-style sources without op/seq.

The binlog tail (``streaming/tail.py``) consumes explicit change events
(op + LSN). Real CDC estates also ship the OTHER feed shape: a compacted
topic / snapshot stream whose rows carry only the CURRENT value per key —
no operation column, no sequence number, deletes signalled by tombstone
rows (Kafka log compaction, Debezium snapshot-read phase, vendor "latest
state" exports; the reference analog is the wipe-and-redo export where
each re-run IS the new full state, convert_cdm_to_mods.py:142-148).

``StreamingUpsert`` turns that shape into lake commits by routing every
micro-batch through :meth:`LakeTable.merge_into`: rows are classified
against live state (matched tombstone → delete, matched row → update-all,
unmatched non-tombstone → insert, unmatched tombstone → dropped by the
``not_matched_condition`` gate) and the classified events ride the same
single-shuffle apply path as the binlog tail — change feed, constraints,
quarantine and optimistic retry included.

Exactly-once: Spark's checkpoint redelivers micro-batches at-least-once;
``merge_into(batch_id=...)`` inherits the ``last_batch_id`` ledger skip, so
the composition is exactly-once — identical to the binlog tail's argument.

Ordering: merge seqs are allocated monotonically per micro-batch, so later
batches win by the table's LWW rule, matching a compacted topic's
per-partition ordering contract. WITHIN a batch the feed may carry several
versions of one key (compaction is lazy); ``order_col`` names the column
that decides the in-batch winner (map-side ``max_by``, skew-tolerant).
Without it, duplicate in-batch keys are refused by ``merge_into``'s
cardinality check rather than resolved arbitrarily.

Scale shape: the per-batch classification is ONE left join with the small
change-batch broadcast onto the bucket-pruned table scan, then the ordinary
O(affected buckets) write — no full-table rewrite per micro-batch.
"""

from __future__ import annotations

import json
import time
from collections import deque
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import latest_per_key
from ..plans.lake import LakeTable
from ..schemas import TRANSCRIPT_SCHEMA
from ..sources.events import read_events
from .tail import _record_batch_metrics


class StreamingUpsert:
    """Tail a directory of snapshot-style row files into a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        table_path: str,
        checkpoint_dir: str,
        *,
        schema=TRANSCRIPT_SCHEMA,
        num_buckets: int = 32,
        merge_mode: str = "cow",
        order_col: str | None = None,
        delete_when: str | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        metrics_path: str | None = None,
        max_files_per_trigger: int | None = None,
        source_format: str = "parquet",
        quarantine_path: str | None = None,
        compact_deltas: int = 8,
    ) -> None:
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        if isinstance(schema, str):  # DDL string accepted like Spark does
            from pyspark.sql import types as T

            schema = T._parse_datatype_string(schema)
        self.schema = schema
        self.order_col = order_col
        self.delete_when = delete_when
        self.transform = transform
        self.metrics_path = metrics_path
        self.max_files_per_trigger = max_files_per_trigger
        self.source_format = source_format
        self.table = LakeTable(
            spark, table_path, num_buckets=num_buckets, merge_mode=merge_mode,
            quarantine_path=quarantine_path, compact_deltas=compact_deltas,
        )
        if not self.table.exists():
            # the feed's row shape IS the table shape in upsert mode
            self.table.create(schema)
        self.batch_metrics: deque = deque(maxlen=10_000)

    # ------------------------------------------------------------------
    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        src = batch_df
        if self.transform is not None:
            src = self.transform(src)
        if self.order_col is not None:
            # compaction-lazy feeds carry several versions of a key per
            # batch; keep the order_col winner (map-side max_by — a hot key
            # reduces to one candidate per task before the shuffle). Keys
            # come from the TABLE (a reopened handle restores them from the
            # manifest), never the global default.
            src = latest_per_key(
                src, self.table.key_cols, seq_col=self.order_col
            )
        delete_cond = (
            F.expr(self.delete_when) if self.delete_when is not None else None
        )
        # the public accessor is equally driver-side (read() here would
        # list/plan per batch)
        table_cols = self.table.schema().fieldNames()
        payload = [
            c for c in src.columns
            if c not in self.table.key_cols and c in table_cols
        ]
        metrics = self.table.merge_into(
            src,
            when_matched_delete=delete_cond,
            when_matched_update={c: F.col(f"s.{c}") for c in payload},
            when_not_matched_insert=True,
            # a tombstone for a key the table never had must NOT insert a
            # null row; coalesce(..., false) keeps NULL-predicate rows
            # insertable (NOT NULL would silently drop them).
            not_matched_condition=(
                ~F.coalesce(delete_cond, F.lit(False))
                if delete_cond is not None
                else None
            ),
            batch_id=batch_id,
            note=f"upsert:{self.source_dir}",
        )
        _record_batch_metrics(
            self.batch_metrics, self.metrics_path, metrics, t0
        )

    def start(self, *, available_now: bool = True):
        rows = read_events(
            self.spark,
            self.source_dir,
            fmt=self.source_format,
            streaming=True,
            schema=self.schema,
            max_files_per_trigger=self.max_files_per_trigger,
        )
        writer = (
            rows.writeStream.foreachBatch(self._on_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName("upsert-tail")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, timeout_sec: float = 600.0) -> LakeTable:
        """Drain the backlog; TimeoutError (progress checkpointed) if not."""
        q = self.start(available_now=True)
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            q.stop()
            raise TimeoutError(
                f"upsert tail did not drain the backlog within "
                f"{timeout_sec}s; progress is checkpointed at "
                f"{self.checkpoint_dir} — re-run to resume"
            )
        return self.table
