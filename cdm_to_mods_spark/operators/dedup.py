"""Per-key dedup — last-write-wins over the event sequence (A7).

The reference's implicit rule: re-runs delete previous outputs and the
latest export wins (convert_cdm_to_mods.py:142-148); duplicate pointers are
detected and flagged (convert_cdm_to_mods.py:136-138,
post_cdm_cleanup.py:126-128). The engine makes it explicit:
``row_number() over (partition by key order by seq desc) = 1``.

Scale note: this is the one required shuffle per micro-batch (hash by key).
Within a replay the same hash partitioning is reused by the merge that
follows, so Catalyst/AQE plans a single exchange for both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Keep only the highest-``seq`` event per key (ties broken by op desc
    then deterministic hash so output is stable under any partitioning)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.col("op").desc() if "op" in df.columns else F.xxhash64(*keys).asc(),
    )
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
