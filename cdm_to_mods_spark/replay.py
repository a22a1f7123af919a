"""Batch replay — change log → converged transcripts table.

The flagship pipeline (SURVEY.md §3.1's engine equivalent): read events,
dedup per key, run the vectorized transform chain, MERGE into the lake
table, audit. ``replay_once`` is the single-shot path; ``replay_in_batches``
replays the log as contiguous-seq micro-batches through the same
``apply_changes``, which is exactly what the streaming tail does per
micro-batch — batch and streaming share one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.chain import apply_chain
from .plans.lake import LakeTable
from .schemas import TRANSCRIPT_SCHEMA


def open_or_create(
    spark: SparkSession,
    table_path: str,
    num_buckets: int = 32,
    merge_mode: str = "cow",
    partition_by: str | None = None,
    cross_partition_upsert: bool = False,
):
    """Open (or create at TRANSCRIPT_SCHEMA) the replay target: a flat
    ``LakeTable``, or — with ``partition_by`` set to a time granularity
    (``month``/``day``/``year``) — the production ``granularity(ts) x
    bucket(conv_id)`` composite layout (``plans/partitioned.py``), the
    shape a 10^10-event table runs on. Reopen adopts the on-disk spec
    either way. ``cross_partition_upsert`` makes the KEY (not
    (partition, key)) row identity via the global routing index — required
    for a changelog whose per-event ts can move a key across partitions
    to converge to the flat table's state."""
    if partition_by is not None:
        from .plans.partitioned import PartitionedTable

        table = PartitionedTable(
            spark, table_path, num_buckets=num_buckets,
            merge_mode=merge_mode, granularity=partition_by,
            cross_partition_upsert=cross_partition_upsert,
        )
        if not table.exists():
            table.create(TRANSCRIPT_SCHEMA)
        return table
    table = LakeTable(spark, table_path, num_buckets=num_buckets, merge_mode=merge_mode)
    if not table.exists():
        table.create(TRANSCRIPT_SCHEMA)
    return table


def replay_once(
    spark: SparkSession,
    events: DataFrame,
    table_path: str,
    *,
    num_buckets: int = 32,
    merge_mode: str = "cow",
    batch_id: int | None = 0,
) -> LakeTable:
    table = open_or_create(spark, table_path, num_buckets, merge_mode)
    table.apply_changes(events, batch_id=batch_id, transform=apply_chain)
    return table


def replay_in_batches(
    spark: SparkSession,
    events: DataFrame,
    table_path: str,
    *,
    n_batches: int,
    max_seq: int,
    num_buckets: int = 32,
    merge_mode: str = "cow",
    partition_by: str | None = None,
    cross_partition_upsert: bool = False,
):
    """Replay as n contiguous-seq micro-batches (binlog segments).

    ``partition_by`` (``month``/``day``/``year``) replays into the
    time-partitioned composite layout instead of a flat table — the
    transform chain runs once at the router and derives the typed ``ts``
    the partition spec routes on; ``cross_partition_upsert`` adds the
    global key index (see ``open_or_create``)."""
    table = open_or_create(spark, table_path, num_buckets, merge_mode,
                           partition_by=partition_by,
                           cross_partition_upsert=cross_partition_upsert)
    per = (max_seq + n_batches) // n_batches
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per
        seg = events.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        table.apply_changes(seg, batch_id=b, transform=apply_chain, source=f"seq[{lo},{hi})")
    return table
