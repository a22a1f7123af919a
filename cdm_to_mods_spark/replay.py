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
) -> LakeTable:
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
) -> LakeTable:
    """Replay as n contiguous-seq micro-batches (binlog segments)."""
    table = open_or_create(spark, table_path, num_buckets, merge_mode)
    per = (max_seq + n_batches) // n_batches
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per
        seg = events.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        table.apply_changes(seg, batch_id=b, transform=apply_chain, source=f"seq[{lo},{hi})")
    return table
