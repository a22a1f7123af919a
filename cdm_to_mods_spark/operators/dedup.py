"""Per-key dedup — last-write-wins over the event sequence (A7).

The reference's implicit rule: re-runs delete previous outputs and the
latest export wins (convert_cdm_to_mods.py:142-148); duplicate pointers are
detected and flagged (convert_cdm_to_mods.py:136-138,
post_cdm_cleanup.py:126-128).

Scale note: the hot path uses ``max_by`` hash aggregation, not a
``row_number`` window. A window must shuffle EVERY event for a key to one
partition and sort it, so a hot conversation key straggles; hash aggregation
gets map-side partial combine for free, so 10^8 updates to one key reduce to
one candidate row per map task before the shuffle — skew-tolerant without
salting. ``latest_per_key_window`` keeps the window formulation for the
query-inventory surface (W-family) and as a differential-test oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Keep only the highest-``seq`` row per key via partial-aggregating
    ``max_by`` (ties broken by op desc — 'U' > 'I' > 'D' lexically — then by
    the full payload struct, so output is deterministic under any
    partitioning)."""
    payload = [c for c in df.columns if c not in keys]
    rank = F.struct(
        F.col(seq_col),
        F.col("op") if "op" in df.columns else F.lit(0),
        *[F.col(c) for c in payload if c not in (seq_col, "op")],
    )
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*payload), rank).alias("_latest"))
        .select(*keys, "_latest.*")
    )


def latest_per_key_window(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Window formulation of :func:`latest_per_key` (same result set,
    including the full deterministic tie-break: seq, then op, then the
    payload columns — equal (seq, op) pairs are REAL in this engine
    because delete_where/update_where spend an LSN a source event may
    also use, and a differential oracle that picked an arbitrary
    partition-order row on those ties would flakily disagree with the
    max_by operator it verifies)."""
    payload = [c for c in df.columns if c not in keys]
    order = [F.col(seq_col).desc()]
    if "op" in df.columns:
        order.append(F.col("op").desc())
    order += [
        F.col(c).desc_nulls_last()
        for c in payload
        if c not in (seq_col, "op")
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_keys(
    df: DataFrame, keys: Sequence[str] = ("conv_id", "turn_idx")
) -> DataFrame:
    """Audit: keys seen more than once (duplicate-pointer report,
    convert_cdm_to_mods.py:136-138). Partial aggregation (map-side combine)
    comes free from Catalyst's hash aggregate."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
