"""Watermarked stream-stream interval join over the change stream.

The reference has no streaming surface at all (SURVEY.md §2.8); its closest
analog is the batch reconcile join between the export and the audit report
(post_cdm_cleanup.py:15-37 — IsCountsCorrect matches produced records
against expected counts after the fact). At CDC scale the audit signal is
itself a stream: moderation / tool-result verdicts arrive on their own feed
seconds-to-minutes after the change events they judge. Joining two live
streams needs bounded state — Spark only allows it when BOTH sides carry a
watermark and the join condition pins an event-time interval, so the state
store can discard rows the other side can no longer match.

``enrich_with_verdicts`` is that join: change events ⋈ verdicts on the
conversation/turn key, constrained to verdicts landing within ``horizon``
AFTER the event. The same function works unchanged on batch DataFrames
(watermarks are a no-op in batch), which is what the batch-equivalence
test pins.

Scale shape: both sides shuffle-partition on the equality keys (conv_id,
turn_idx), so state for a key lives on exactly one executor; watermarks
bound its size to ``horizon + watermark`` of traffic per key. No
broadcast, no driver state — the canonical 1000-executor topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

#: Schema of the verdict side-feed (a moderation / tool-result stream).
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("verdict", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("verdict_ts", T.TimestampType(), False),
    ]
)


def enrich_with_verdicts(
    events: DataFrame,
    verdicts: DataFrame,
    *,
    horizon: str = "15 minutes",
    event_watermark: str = "10 minutes",
    verdict_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each change event to the verdicts issued for its (conv_id,
    turn_idx) within ``[ingest_ts, ingest_ts + horizon]``.

    ``how='inner'`` emits matches as soon as both rows arrive; state for a
    row is dropped once the other side's watermark passes its interval.
    ``how='left_outer'`` additionally emits unmatched events (null verdict
    columns) — but only after the verdict watermark passes
    ``ingest_ts + horizon``, when Spark can prove no match is coming.

    Multiple verdicts inside the horizon produce multiple output rows
    (plain join semantics — downstream pick-latest is a W3 first/last
    per group, already in the operator inventory).
    """
    assert how in ("inner", "left_outer"), how
    ev = events.withWatermark("ingest_ts", event_watermark)
    vd = verdicts.withWatermark("verdict_ts", verdict_watermark)
    # Equality keys first so the state store hash-partitions on them; the
    # interval bound is what licenses state eviction in stream-stream mode.
    cond = (
        (ev["conv_id"] == vd["conv_id"])
        & (ev["turn_idx"] == vd["turn_idx"])
        & (vd["verdict_ts"] >= ev["ingest_ts"])
        & (vd["verdict_ts"] <= ev["ingest_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    joined = ev.join(vd, cond, how)
    return joined.select(
        ev["conv_id"].alias("conv_id"),
        ev["turn_idx"].alias("turn_idx"),
        ev["op"],
        ev["seq"],
        ev["role"],
        ev["ingest_ts"],
        vd["verdict"],
        vd["score"],
        vd["verdict_ts"],
        (
            F.unix_timestamp(vd["verdict_ts"]) - F.unix_timestamp(ev["ingest_ts"])
        ).cast("long").alias("verdict_lag_s"),
    )
