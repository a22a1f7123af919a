"""Custom stateful streaming operators (``applyInPandasWithState``).

The engine's exactly-once MERGE deliberately needs NO unbounded streaming
state (the ``_seq`` guard lives in the table — SURVEY.md §7 hard-part (e)).
What DOES warrant keyed state is the audit surface: the reference collects
duplicate/out-of-order pointers as it walks (convert_cdm_to_mods.py:136-138,
post_cdm_cleanup.py:126-128). ``out_of_order_audit`` is that audit as a
continuous stateful operator: per table key ``(conv_id, turn_idx)`` — the
same granularity as the MERGE's seq guard — it remembers the highest event
sequence seen across ALL micro-batches and emits one row per event that
arrives in a LATER micro-batch with a lower-or-equal sequence: the
cross-batch late arrivals whose payload the seq guard will discard.
(Events reordered WITHIN one micro-batch are not emitted — a micro-batch
is an unordered set by definition, and the merge's in-batch dedup absorbs
them without any arrival-order anomaly.) State is one (long, long) pair
per key, dropped after ``ttl_minutes`` of processing-time inactivity so
state size tracks the set of *active* keys, not table history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AUDIT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("seq", LongType()),
        StructField("max_seq_seen", LongType()),
        StructField("n_late_so_far", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("max_seq", LongType()), StructField("n_late", LongType())]
)


def _make_audit_group(ttl_ms: int):
    def _audit_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        max_seq, n_late = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            # late = seq not above the running maximum from PRIOR batches
            late = pdf["seq"].values <= max_seq
            if late.any():
                hit = pdf[late]
                n_late += int(late.sum())
                yield pd.DataFrame(
                    {
                        "conv_id": key[0],
                        "turn_idx": int(key[1]),
                        "seq": hit["seq"].astype("int64"),
                        "max_seq_seen": int(max(max_seq, int(pdf["seq"].max()))),
                        "n_late_so_far": n_late,
                    }
                )
            max_seq = max(max_seq, int(pdf["seq"].max()))
        state.update((int(max_seq), int(n_late)))
        state.setTimeoutDuration(ttl_ms)

    return _audit_group


def out_of_order_audit(events: DataFrame, ttl_minutes: int = 60) -> DataFrame:
    """Streaming events → one row per cross-batch late arrival: an event
    whose ``seq`` does not exceed its key's running max from PRIOR
    micro-batches — exactly what the MERGE's per-(conv_id, turn_idx) seq
    guard will discard.

    Works on a streaming DataFrame (file-source tail); state is per table
    key and expires after ``ttl_minutes`` of processing-time inactivity.
    Append output mode: each micro-batch appends that batch's late events."""
    return events.groupBy("conv_id", "turn_idx").applyInPandasWithState(
        _make_audit_group(ttl_minutes * 60 * 1000),
        outputStructType=AUDIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
