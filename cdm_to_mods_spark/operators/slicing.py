"""Sliding-window aggregation by stream slicing.

Spark's native sliding window (``F.window(ts, size, slide)``) REPLICATES
every event into all size/slide windows that contain it before the
aggregation — the shuffle and the partial-agg input are O(events × k),
k = overlap factor. The stream-slicing formulation (Traub et al.,
"Efficient Window Aggregation with General Stream Slicing", EDBT 2019 —
the Scotty/Cutty line of work; see PAPERS.md) cuts that to O(events):

1. aggregate once per non-overlapping SLICE (tumbling window of the
   slide width) — one partial row per event group, map-side combined;
2. explode each SLICE (not each event) into the k sliding windows it
   belongs to — O(slices × k), slices ≪ events;
3. compose the final windows from slice partials with a second, tiny
   aggregation (sum/count/min/max compose; avg = sum ⊘ count).

At 100 TB with a 1h-slide/24h-size dashboard window (k = 24) this is the
difference between shuffling the event stream once and shuffling it 24×.

Batch form here; in the streaming tail the same two-level shape runs as
slice partials inside ``foreachBatch`` (chained stateful aggregations are
not allowed in one streaming query) — the composition stays identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_COMPOSABLE = {"sum", "count", "min", "max"}


def sliced_sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    aggs: dict[str, tuple[str, str]],
    group_by: list[str] | None = None,
) -> DataFrame:
    """Sliding-window aggregate via slicing.

    ``size``/``slide`` are interval strings (e.g. ``"2 hours"``,
    ``"1 hour"``); size must be an integer multiple of slide.
    ``aggs`` maps output column → (fn, input col) with fn in
    sum/count/min/max. Returns one row per (group, window_start) for every
    window containing ≥1 event — the same surface as
    ``groupBy(F.window(ts, size, slide))``, with O(events) work."""

    def _secs(iv: str) -> int:
        n, unit = iv.split()
        mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
        return int(n) * mult

    size_s, slide_s = _secs(size), _secs(slide)
    if size_s % slide_s:
        raise ValueError(f"size {size!r} must be a multiple of slide {slide!r}")
    k = size_s // slide_s
    for fn, _ in aggs.values():
        if fn not in _COMPOSABLE:
            raise ValueError(f"{fn!r} does not compose from slices "
                             f"(supported: {sorted(_COMPOSABLE)})")
    keys = list(group_by or [])

    def _partial(fn: str, col: str, out: str) -> Column:
        if fn == "count":
            return F.count(F.lit(1) if col == "*" else F.col(col)).alias(out)
        return getattr(F, fn)(col).alias(out)

    # 1. one partial row per slice (tumbling → NO event replication)
    slices = df.groupBy(
        *keys, F.window(ts_col, slide).alias("_slice")
    ).agg(*[_partial(fn, col, out) for out, (fn, col) in aggs.items()])

    # 2. slice → the k window starts it falls into (explode of k, on the
    #    aggregated rows only)
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.timestamp_add("SECOND", i * (-slide_s), F.col("_slice.start")),
    )
    exploded = slices.select(
        *keys,
        F.explode(starts).alias("window_start"),
        *[F.col(out) for out in aggs],
    )

    # 3. compose windows from slice partials (count composes by SUM)
    compose = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return exploded.groupBy(*keys, "window_start").agg(
        *[compose[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
