"""Event-time windowed aggregation with watermarks over the change stream.

The reference has no event-time aggregation (SURVEY.md §2.8), but the
engine's metrics surface wants it: per-window ingest rates with bounded
state for late data. ``windowed_event_counts`` is the canonical shape —
tumbling window over ``ingest_ts`` with a watermark so state for closed
windows is dropped, and late events beyond the watermark are discarded
(they are still applied to the TABLE by the seq-guard MERGE; only the
metric drops them — metrics are approximate, the table is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """events (streaming or batch) → one row per (window, op) with event
    count and distinct-conversation estimate. On a stream, append mode
    emits a window once the watermark passes its end."""
    return (
        events.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "approx_convs",
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-conversation SESSION windows over the change stream — Spark's
    native ``session_window`` (dynamic-gap merge inside the state store),
    the streaming dual of the batch lag/cumsum sessionize (a8). A session
    absorbs every event within ``gap`` of its current end; append mode
    emits a session once the watermark passes ``last_event + gap``.

    Gap-boundary semantics: ``session_window`` starts a NEW session when
    the inter-event delta is ``>= gap`` (the window is half-open at
    ``last + gap``), while a8's lag test starts one when the delta is
    ``> threshold`` — so ``session_window(ts, gap=g)`` ≡ a8 with
    ``threshold = g - 1s``. Pinned by the batch-equivalence test."""
    return (
        events.withWatermark("ingest_ts", watermark)
        .groupBy(F.session_window("ingest_ts", gap).alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("seq").alias("last_seq"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id",
            "n_events",
            "last_seq",
        )
    )
