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

_UNIT_SECS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_secs(iv: str) -> int:
    """Seconds in an interval string; accepts the compound forms
    ``F.window`` itself accepts (``"1 hour 30 minutes"``)."""
    toks = iv.split()
    if not toks or len(toks) % 2:
        raise ValueError(f"malformed interval {iv!r}")
    total = 0
    for n, unit in zip(toks[::2], toks[1::2]):
        if unit not in _UNIT_SECS:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {iv!r} "
                f"(supported: {sorted(set(_UNIT_SECS))})"
            )
        total += int(n) * _UNIT_SECS[unit]
    return total


def _partial_expr(fn: str, col: str, out: str) -> Column:
    """The per-slice partial for one aggregate (count counts rows/values;
    the rest apply directly — all compose across slices)."""
    if fn == "count":
        return F.count(F.lit(1) if col == "*" else F.col(col)).alias(out)
    return getattr(F, fn)(col).alias(out)


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

    size_s, slide_s = _interval_secs(size), _interval_secs(slide)
    if size_s % slide_s:
        raise ValueError(f"size {size!r} must be a multiple of slide {slide!r}")
    k = size_s // slide_s
    for fn, _ in aggs.values():
        if fn not in _COMPOSABLE:
            raise ValueError(f"{fn!r} does not compose from slices "
                             f"(supported: {sorted(_COMPOSABLE)})")
    keys = list(group_by or [])

    # 1. one partial row per slice (tumbling → NO event replication)
    slices = df.groupBy(
        *keys, F.window(ts_col, slide).alias("_slice")
    ).agg(*[_partial_expr(fn, col, out) for out, (fn, col) in aggs.items()])

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


class SlidingWindowView:
    """Incrementally-maintained sliding-window aggregates over an
    append-only event stream — the streaming completion of the slicing
    story (and of the reference's per-run report counts, made continuous).

    State is ONE tiny table of additive slice partials: each ``update``
    aggregates only the incoming batch to slice partials (O(batch)) and
    folds them into the store by slice key; ``read`` composes the final
    sliding windows from the partials at query time (O(slices × k)).
    Late events are handled for free — they land in their (old) slice and
    every window containing it re-composes correctly; nothing is ever
    recomputed over history. Only additive aggregates (sum/count) are
    maintained, the append-only-stream contract.

    The store commits with the same write-new + marker-rename protocol as
    plans/incremental.py, so a crashed update never corrupts state."""

    def __init__(
        self,
        spark,
        path: str,
        ts_col: str,
        size: str,
        slide: str,
        aggs: dict[str, tuple[str, str]],
        group_by: list[str] | None = None,
    ) -> None:
        import os

        for out, (fn, _) in aggs.items():
            if fn not in ("sum", "count"):
                raise ValueError(
                    f"{out}: only additive aggregates (sum/count) can be "
                    "incrementally maintained on an append-only stream"
                )
        # validate the window spec up front — the batch function raises on
        # the same inputs, and a silently floored size//slide would compose
        # windows of the wrong width on every read
        self._size_s, self._slide_s = _interval_secs(size), _interval_secs(slide)
        if self._size_s % self._slide_s:
            raise ValueError(
                f"size {size!r} must be a multiple of slide {slide!r}"
            )
        self.spark = spark
        self.path = path.rstrip("/")
        self.ts_col, self.size, self.slide = ts_col, size, slide
        self.aggs, self.keys = dict(aggs), list(group_by or [])
        os.makedirs(self.path, exist_ok=True)

    # ------------------------------------------------------------- state
    def _marker(self):
        import json
        import os

        p = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _slices(self) -> DataFrame | None:
        import os

        m = self._marker()
        if m is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, m["data"]))

    # ------------------------------------------------------------ update
    def update(self, batch: DataFrame, batch_id: int | None = None) -> dict:
        """Fold one micro-batch into the slice-partial store.

        Pass the streaming ``batch_id`` for exactly-once folding: a batch
        already folded is skipped, so foreachBatch redelivery after a
        crash (Spark replays the last uncommitted batch) cannot
        double-count — the same ledger idea as LakeTable.last_batch_id."""
        import json
        import os

        marker = self._marker()
        if (
            batch_id is not None
            and marker is not None
            and marker.get("last_batch_id", -1) >= batch_id
        ):
            return {"skipped": True, "batch_id": batch_id}

        fresh = batch.groupBy(
            *self.keys, F.window(self.ts_col, self.slide).alias("_slice")
        ).agg(*[_partial_expr(fn, c, out) for out, (fn, c) in self.aggs.items()])
        fresh = fresh.select(
            *self.keys, F.col("_slice.start").alias("slice_start"),
            *[F.col(o) for o in self.aggs],
        )
        cur = self._slices()
        if cur is not None:
            merged = (
                cur.unionByName(fresh)
                .groupBy(*self.keys, "slice_start")
                .agg(*[F.sum(o).alias(o) for o in self.aggs])
            )
        else:
            merged = fresh
        gen = 0 if marker is None else marker["gen"] + 1
        rel = f"slices-{gen:08d}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        last = batch_id if batch_id is not None else (
            marker.get("last_batch_id", -1) if marker else -1
        )
        with open(tmp, "w") as fh:
            json.dump({"data": rel, "gen": gen, "last_batch_id": last}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(self.path, "_CURRENT"))
        # prune superseded slice-store generations — keep new + the
        # just-replaced marker's target (in-flight readers), keyed by
        # marker rather than name order so a crashed update's orphan dir
        # can't occupy a keep slot (same policy as plans/incremental.py)
        import shutil

        keep = {rel} | ({marker["data"]} if marker else set())
        for d in os.listdir(self.path):
            if d.startswith("slices-") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return {"gen": gen, "last_batch_id": last}

    # -------------------------------------------------------------- read
    def read(self) -> DataFrame:
        """Compose the sliding windows from the stored slice partials.

        A store that has seen ≥1 update reads at the real output schema
        even when empty (the parquet partials carry the types). Before any
        update the key/aggregate types are unknowable, so read() raises
        instead of inventing a schema that couldn't union/select against
        later reads."""
        k = self._size_s // self._slide_s
        slide_s = self._slide_s
        cur = self._slices()
        if cur is None:
            raise LookupError(
                f"sliding view at {self.path} has no state yet — "
                "call update() with at least one batch first"
            )
        starts = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.timestamp_add("SECOND", i * (-slide_s),
                                      F.col("slice_start")),
        )
        return (
            cur.select(*self.keys, F.explode(starts).alias("window_start"),
                       *[F.col(o) for o in self.aggs])
            .groupBy(*self.keys, "window_start")
            .agg(*[F.sum(o).alias(o) for o in self.aggs])
        )
