"""Incrementally-maintained materialized view — the downstream CDC consumer.

The reference's post-run reporting recomputes collection-level summaries
from scratch every run (post_cdm_cleanup.py:81-95 counts; :186-217
report). A CDC engine makes those summaries INCREMENTAL: a view consumer
tails the table's change feed and refreshes only the conversations a batch
touched, instead of rescanning the table.

Refresh algorithm (the "recompute touched groups" pattern):

1. read ``changes(applied_version, latest)`` — the keys that moved;
2. distinct group keys from the feed (O(batch), not O(table));
3. ``read_keys`` those groups — a bucket-PRUNED point read of current
   state (manifest-level file pruning, so cost is O(touched buckets));
4. recompute aggregates for exactly those groups, replace their rows in
   the view, commit a new view version atomically (write-new + marker
   rename, same protocol as the lake ledger).

Groups whose every turn was tombstoned vanish from the view (their
recompute returns no rows). The refresh picks its strategy by the number
of touched groups (counted distributed, never collected first):

- ``<= point_read_threshold`` groups: collect the bounded key list and
  bucket-prune with ``read_keys`` — point-read cost O(touched buckets).
- above it (pathological batches touching ~all groups): NOTHING passes
  through the driver — recompute via a semi-join of the source snapshot
  against the feed's distinct keys and splice with an anti-join, so the
  plan carries two key joins instead of a million-entry ``In`` list.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lake import LakeTable


class ConversationStatsView:
    """Per-conversation aggregate view over a transcripts LakeTable:
    ``conv_id, n_turns, n_roles, last_ts``."""

    def __init__(
        self,
        spark: SparkSession,
        source: LakeTable,
        path: str,
        point_read_threshold: int = 10_000,
    ) -> None:
        self.spark = spark
        self.source = source
        self.path = path.rstrip("/")
        self.point_read_threshold = point_read_threshold
        os.makedirs(self.path, exist_ok=True)

    # ------------------------------------------------------------- state
    def _marker(self) -> dict | None:
        p = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def applied_version(self) -> int:
        m = self._marker()
        return -1 if m is None else m["source_version"]

    def read(self) -> DataFrame:
        m = self._marker()
        if m is None:
            return self.spark.createDataFrame(
                [], "conv_id string, n_turns long, n_roles long, last_ts timestamp"
            )
        return self.spark.read.parquet(os.path.join(self.path, m["data"]))

    # ----------------------------------------------------------- refresh
    @staticmethod
    def _agg(rows: DataFrame) -> DataFrame:
        return rows.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct("role").alias("n_roles"),
            F.max("ts").alias("last_ts"),
        )

    def refresh(self) -> dict:
        """Advance the view to the source's latest version incrementally."""
        t0 = time.monotonic()
        src_v = self.source.latest_version()
        applied = self.applied_version()
        if src_v is None or src_v <= applied:
            return {"refreshed": False, "source_version": src_v}

        if applied < 0:
            # first build: one full aggregation
            fresh = self._agg(self.source.read(src_v))
            out = fresh
            touched = None
        else:
            from .lake import SnapshotExpiredError

            try:
                feed = self.source.changes(applied, src_v)
                feed_keys = feed.select("conv_id").distinct()
                # ONE scan decides the strategy AND supplies the point-read
                # key list: take(threshold+1) bounds the driver transfer —
                # a separate count() + collect() would read the feed twice.
                # (Only the rare wide batch pays a second feed scan, inside
                # its distributed key_join.)
                probe = feed_keys.take(self.point_read_threshold + 1)
            except SnapshotExpiredError:
                # the view lagged past the source's snapshot retention —
                # the feed range is gone. SnapshotExpiredError's contract
                # is 're-seed from a snapshot read': fall back to the full
                # rebuild instead of wedging the refresh loop.
                fresh = self._agg(self.source.read(src_v))
                data_rel = f"data-v{src_v:08d}"
                fresh.write.mode("overwrite").parquet(
                    os.path.join(self.path, data_rel)
                )
                self._commit_marker(data_rel, src_v, -1, t0)
                return {"refreshed": True, "source_version": src_v,
                        "touched_groups": -1, "strategy": "reseed_full"}
            n_touched = len(probe)
            if n_touched == 0:
                self._commit_marker(self._marker()["data"], src_v, 0, t0)
                return {"refreshed": True, "source_version": src_v,
                        "touched_groups": 0, "strategy": "noop"}
            if n_touched <= self.point_read_threshold:
                # bounded key list → bucket-pruned point read (O(touched
                # buckets), the common case: a batch touches few groups)
                strategy = "point_read"
                touched = [r.conv_id for r in probe]
                fresh = self._agg(self.source.read_keys(touched, version=src_v))
                out = (
                    self.read()
                    .filter(~F.col("conv_id").isin(touched))
                    .unionByName(fresh)
                )
            else:
                # pathological wide batch: keep every key distributed —
                # semi-join recompute + anti-join splice, no driver list
                strategy = "key_join"
                fresh = self._agg(
                    self.source.read(src_v).join(feed_keys, "conv_id", "left_semi")
                )
                out = (
                    self.read()
                    .join(feed_keys, "conv_id", "left_anti")
                    .unionByName(fresh)
                )
                # true touched-group count for the metric (the probe was
                # capped at threshold+1); only this rare wide path pays it
                n_touched = feed_keys.count()
            touched = n_touched

        data_rel = f"data-v{src_v:08d}"
        out.write.mode("overwrite").parquet(os.path.join(self.path, data_rel))
        self._commit_marker(data_rel, src_v,
                            -1 if touched is None else touched, t0)
        return {"refreshed": True, "source_version": src_v,
                "touched_groups": -1 if touched is None else touched,
                "strategy": "full" if touched is None else strategy}

    def _commit_marker(self, data_rel: str, src_v: int, touched: int,
                       t0: float) -> None:
        prev = self._marker()
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {"data": data_rel, "source_version": src_v,
                 "touched_groups": touched,
                 "refresh_sec": round(time.monotonic() - t0, 3)}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(self.path, "_CURRENT"))
        # prune superseded view generations — keep the new one plus the
        # JUST-REPLACED marker's target (in-flight readers may hold it).
        # Keeping by marker, not by directory name: a crashed refresh
        # leaves an orphan data-v* dir that a name-sorted keep-last-2
        # would retain forever while deleting the predecessor readers are
        # actually on.
        import shutil

        keep = {data_rel} | ({prev["data"]} if prev else set())
        for d in os.listdir(self.path):
            if d.startswith("data-v") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)


class AdditiveStatsView(ConversationStatsView):
    """Retraction-maintained aggregate view over a ``changelog="lookup"``
    table — the consumer the typed changelog exists FOR.

    ``ConversationStatsView`` (above) refreshes by RECOMPUTING touched
    groups: feed keys → bucket-pruned point read / semi-join → re-aggregate
    — O(touched buckets) of table reads per refresh. This view never reads
    the table after its first build: ``row_changes()`` carries pre- and
    post-images, so any sum/count aggregate advances ADDITIVELY — add the
    post-image's contribution, subtract the pre-image's — exactly the
    retract-stream maintenance Flink performs over an upsert changelog. At
    100 TB the difference is a refresh that scans O(changed rows) of
    changelog parquet versus re-reading every touched bucket's base+chain.

    Aggregate shape: ``conv_id, n_turns (count), n_chars (sum of
    length(text))`` — deliberately additive-only (count/sum). Non-additive
    aggregates (countDistinct, max) need the recompute strategy; that is a
    property of the aggregate, not of this machinery.

    Falls back to a full rebuild when the changelog is unavailable
    (``ChangelogUnavailableError`` — e.g. a rollback or a non-changelog
    writer slipped into the range) or expired, mirroring the parent's
    re-seed contract.
    """

    _SCHEMA = "conv_id string, n_turns long, n_chars long"

    def read(self) -> DataFrame:
        m = self._marker()
        if m is None:
            return self.spark.createDataFrame([], self._SCHEMA)
        return self.spark.read.parquet(os.path.join(self.path, m["data"]))

    @staticmethod
    def _agg(rows: DataFrame) -> DataFrame:
        return rows.groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("n_chars"),
        )

    def _retract_fold(self, delta: DataFrame) -> DataFrame:
        """Fold a frame of typed changelog rows (``_change_type`` +
        canonical columns) into the current view state additively: add
        each post-image's contribution, subtract each pre-image's — the
        Flink retract-stream maintenance step, shared by the batch
        ``refresh`` and the streaming :meth:`apply_delta`."""
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        d = delta.groupBy("conv_id").agg(
            F.sum(sign).cast("long").alias("_d_turns"),
            F.sum(
                sign * F.length(F.coalesce(F.col("text"), F.lit("")))
            )
            .cast("long")
            .alias("_d_chars"),
        )
        return (
            self.read()
            .join(d, "conv_id", "full_outer")
            .select(
                "conv_id",
                (
                    F.coalesce(F.col("n_turns"), F.lit(0))
                    + F.coalesce(F.col("_d_turns"), F.lit(0))
                ).alias("n_turns"),
                (
                    F.coalesce(F.col("n_chars"), F.lit(0))
                    + F.coalesce(F.col("_d_chars"), F.lit(0))
                ).alias("n_chars"),
            )
            # a group whose every row was retracted vanishes
            .filter(F.col("n_turns") > 0)
        )

    def apply_delta(self, delta: DataFrame) -> dict:
        """Advance the view by one ALREADY-READ changelog frame — the
        streaming consumer's entry point (``maintain_view_stream`` hands
        each ``mode="row_changes"`` micro-batch here). ``delta`` must
        carry ``_version``; the marker lands on the frame's max version,
        so a redelivered micro-batch (checkpoint replay, foreachBatch
        retry) is a skip — exactly-once by the same
        marker-as-idempotence-token rule the batch refresh uses. The
        view must be SEEDED first (a full build ordered before the
        stream's startingVersion); folding into an empty view would
        silently drop pre-stream state, so that is refused."""
        t0 = time.monotonic()
        applied = self.applied_version()
        if applied < 0:
            raise ValueError(
                "apply_delta on an unseeded view — run refresh() (full "
                "build) first and start the stream from applied_version()"
            )
        head = delta.agg(
            F.max("_version").alias("v"), F.min("_version").alias("lo")
        ).collect()[0]
        if head["v"] is None:  # empty micro-batch: nothing to advance
            return {"refreshed": False, "reason": "empty batch"}
        src_v, lo_v = int(head["v"]), int(head["lo"])
        if src_v <= applied:
            return {"refreshed": False, "reason": "already applied",
                    "source_version": src_v}
        if lo_v <= applied:
            # partial overlap (marker advanced between retries): replaying
            # already-folded rows would double-count — keep only the new
            # suffix. Whole-batch redelivery is the src_v<=applied skip.
            delta = delta.filter(F.col("_version") > F.lit(applied))
        out = self._retract_fold(delta)
        data_rel = f"data-v{src_v:08d}"
        out.write.mode("overwrite").parquet(os.path.join(self.path, data_rel))
        self._commit_marker(data_rel, src_v, -1, t0)
        return {"refreshed": True, "source_version": src_v,
                "strategy": "retract_stream"}

    #: point-read cap for the changelog-free incremental path over sources
    #: that only expose key-based point reads (the partition router): a
    #: refresh range touching more conversations than this re-aggregates
    #: cheaper than it point-reads — reseed. Flat LakeTable sources use
    #: the BUCKET-FRACTION rule below instead (round 5): the cost driver
    #: is touched buckets, not key count — 100k keys concentrated in 2 of
    #: 64 buckets still point-read far cheaper than a full reseed.
    _LOOKUP_KEY_CAP = 4096
    #: reseed when the touched-bucket fraction exceeds this (each touched
    #: bucket resolves FULLY twice — pre + post — so past ~half the table
    #: the two point reads cost more than one full re-aggregate)...
    _LOOKUP_BUCKET_FRAC = 0.5
    #: ...but only when the table has enough buckets for the fraction to
    #: mean anything: below this, bucket granularity is so coarse (1 of 2
    #: touched = "half the table") that the fixed costs both strategies
    #: share dominate, and the incremental path's other properties win.
    _LOOKUP_MIN_BUCKETS = 8

    def _lookup_fold(self, applied: int, src_v: int):
        """Incremental refresh WITHOUT a stored changelog (round 4): the
        lookup-changelog producer's pre-image derivation, paid only at
        REFRESH time instead of on every commit. Discover the keys the
        plain change feed touched over ``(applied, src_v]``, then two
        bucket-pruned point reads — the key set's state AS OF ``applied``
        (pre-images to retract) and AS OF ``src_v`` (post-images to add)
        — synthesized into the same retract frame ``row_changes`` would
        have produced. Cost O(touched buckets), exactly what the
        changelog='lookup' producer pays per commit.

        Returns the folded view frame, ``"noop"`` for a maintenance-only
        range, or ``None`` when reseeding wins on cost. The reseed
        decision (round 5) is BUCKET-fraction-based for flat LakeTable
        sources — touched buckets vs populated buckets, the actual cost
        ratio of two bucket-pruned resolves against one full table
        re-aggregate — with the touched-bucket ids collected per VERSION
        under that version's recorded layout (a rebucket inside the
        refresh range derives each side's pruning from its own manifest),
        and no driver-side key list at all. Sources without bucket-level
        readers (the partition router) keep the ``_LOOKUP_KEY_CAP``
        key-count rule. Untouched turns of a touched conversation are
        excluded by the full-key semi-join: their pre/post contributions
        would cancel only up to float rounding, and an additive view must
        not accumulate residue."""
        from .lake import _bucket_expr

        src = self.source
        keys = list(src.key_cols)
        feed = src.changes(applied, src_v)
        # localCheckpoint: touched feeds three consumers (probe + two
        # semi-joins); eager materialization with session-managed cleanup
        touched = feed.select(*keys).distinct().localCheckpoint()
        if isinstance(src, LakeTable):
            man_head = src.manifest(src_v)

            def _buckets_at(man: dict) -> list[int]:
                nb = man.get("num_buckets", src.num_buckets)
                bf = man.get("bucket_fn", "xxhash64")
                bc = man.get("bucket_col", src.bucket_col)
                return sorted(
                    r["_b"]
                    for r in touched.select(
                        _bucket_expr(bc, nb, bf).alias("_b")
                    ).distinct().collect()
                )

            tb_head = _buckets_at(man_head)
            if not tb_head:
                return "noop"
            populated = max(1, len(man_head["buckets"]))
            if (
                populated >= self._LOOKUP_MIN_BUCKETS
                and len(tb_head) > self._LOOKUP_BUCKET_FRAC * populated
            ):
                return None  # reseed: point reads would resolve most of
                # the table twice

            def _at(version: int, tb: list[int]) -> DataFrame:
                man = src.manifest(version)
                return src._resolve_live(
                    src._read_raw(man, buckets=tb), man, buckets=tb
                )

            man_pre = src.manifest(applied)
            tb_pre = (
                tb_head
                if (
                    man_pre.get("num_buckets") == man_head.get("num_buckets")
                    and man_pre.get("bucket_fn") == man_head.get("bucket_fn")
                )
                else _buckets_at(man_pre)  # rebucket inside the range
            )
            pre = _at(applied, tb_pre).join(touched, keys, "left_semi")
            post = _at(src_v, tb_head).join(touched, keys, "left_semi")
        else:
            bucket_col = getattr(src, "bucket_col", None) or getattr(
                src, "_lake_kwargs", {}
            ).get("bucket_col", keys[0])
            probe = (
                touched.select(bucket_col).distinct()
                .limit(self._LOOKUP_KEY_CAP + 1).collect()
            )
            if not probe:
                return "noop"
            if len(probe) > self._LOOKUP_KEY_CAP:
                return None
            bucket_keys = sorted(r[0] for r in probe)
            pre = src.read_keys(bucket_keys, version=applied).join(
                touched, keys, "left_semi"
            )
            post = src.read_keys(bucket_keys, version=src_v).join(
                touched, keys, "left_semi"
            )
        delta = pre.withColumn(
            "_change_type", F.lit("update_preimage")
        ).unionByName(
            post.withColumn("_change_type", F.lit("update_postimage")),
            # a schema evolution INSIDE the refresh range makes the two
            # point reads differ in columns; missing sides null-fill,
            # which is exactly the right contribution (0) for rows that
            # predate the column
            allowMissingColumns=True,
        )
        return self._retract_fold(delta)

    def refresh(self) -> dict:
        from pyspark.errors import AnalysisException

        from .lake import ChangelogUnavailableError, SnapshotExpiredError

        t0 = time.monotonic()
        src_v = self.source.latest_version()
        applied = self.applied_version()
        if src_v is None or src_v <= applied:
            return {"refreshed": False, "source_version": src_v}

        strategy = "retract"
        if applied < 0:
            out = self._agg(self.source.read(src_v))
            strategy = "full"
        else:
            try:
                delta = self.source.row_changes(applied, src_v)
                if not delta.take(1):
                    # maintenance-only range: advance the marker without
                    # rewriting the view (the parent's 0-touched-groups
                    # rule — an O(view) rewrite would contradict the
                    # O(changed rows) claim)
                    self._commit_marker(self._marker()["data"], src_v, 0, t0)
                    return {"refreshed": True, "source_version": src_v,
                            "strategy": "noop"}
                out = self._retract_fold(delta)
            except (ChangelogUnavailableError, SnapshotExpiredError):
                # no stored changelog (or its range expired): try the
                # refresh-time pre-image lookup before paying a reseed —
                # ValueError covers sources with no usable change feed
                # (cow without cow_change_feed)
                out = None
                try:
                    out = self._lookup_fold(applied, src_v)
                except (ChangelogUnavailableError, SnapshotExpiredError,
                        ValueError, AnalysisException, FileNotFoundError):
                    # ValueError: sources with no usable change feed (cow
                    # without cow_change_feed); AnalysisException: residual
                    # cross-version shape mismatches; FileNotFoundError:
                    # the view's APPLIED snapshot itself was expired (flat
                    # manifests surface a deleted version file as
                    # FileNotFoundError, not SnapshotExpiredError) — all
                    # reseed below instead of wedging refresh()
                    out = None
                if out == "noop":
                    self._commit_marker(self._marker()["data"], src_v, 0, t0)
                    return {"refreshed": True, "source_version": src_v,
                            "strategy": "noop"}
                if out is not None:
                    strategy = "lookup_retract"
                else:
                    out = self._agg(self.source.read(src_v))
                    strategy = "reseed_full"

        data_rel = f"data-v{src_v:08d}"
        out.write.mode("overwrite").parquet(os.path.join(self.path, data_rel))
        self._commit_marker(data_rel, src_v, -1, t0)
        return {"refreshed": True, "source_version": src_v,
                "strategy": strategy}


class GenericAdditiveView(AdditiveStatsView):
    """User-defined incrementally-maintained aggregate view — the engine
    behind ``CREATE MATERIALIZED VIEW``: arbitrary group columns and any
    mix of ``count(*)`` / ``sum(<expr>)`` aggregates, maintained by the
    same retract-stream machinery as :class:`AdditiveStatsView` (add each
    post-image's contribution, subtract each pre-image's; O(changed rows)
    per refresh over a ``changelog="lookup"`` source, automatic
    reseed-full fallback on any other table).

    Additive-only by construction: count and sum advance under
    retraction; max/min/countDistinct do not (retracting the current
    max needs the runner-up, which the view no longer has) — those need
    the recompute strategy and are refused at definition time by the SQL
    router. ``avg`` is a consumer-side division of two additive columns.

    A hidden ``_rows`` count is always maintained so a group whose every
    row was retracted vanishes even when the user asked only for sums;
    ``read()`` drops it.
    """

    def __init__(self, spark, source, path: str, group_cols: list,
                 aggs: list) -> None:
        """``aggs``: list of ``(name, kind, expr)`` with kind ``"count"``
        (expr ignored) or ``"sum"`` (expr = SQL over the source row)."""
        super().__init__(spark, source, path)
        assert group_cols, "at least one GROUP BY column"
        for _, kind, _e in aggs:
            assert kind in ("count", "sum"), kind
        self.group_cols = list(group_cols)
        self.aggs = [tuple(a) for a in aggs]

    # contribution of one source row to each aggregate
    def _contrib(self, name: str, kind: str, expr: str):
        if kind == "count":
            return F.lit(1)
        # sum over a null expr contributes 0 (SQL SUM skips nulls; a
        # retractable contribution must be numeric either way)
        return F.coalesce(F.expr(expr).cast("double"), F.lit(0.0))

    def _agg(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.group_cols).agg(
            *[
                F.sum(self._contrib(n, k, e)).alias(n)
                for n, k, e in self.aggs
            ],
            F.count(F.lit(1)).cast("long").alias("_rows"),
        )

    def _retract_fold(self, delta: DataFrame) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        d = delta.groupBy(*self.group_cols).agg(
            *[
                F.sum(sign * self._contrib(n, k, e)).alias(f"_d_{n}")
                for n, k, e in self.aggs
            ],
            F.sum(sign).cast("long").alias("_d__rows"),
        ).alias("d")
        cur = self._stored().alias("cur")
        zero = F.lit(0)
        # null-SAFE group equality: unlike the parent's conv_id (a key,
        # never null), an arbitrary GROUP BY column can hold NULL — a
        # plain equi-join would never match the stored NULL group with
        # its delta, splitting it into duplicate rows on every refresh
        cond = None
        for g in self.group_cols:
            term = F.col(f"cur.{g}").eqNullSafe(F.col(f"d.{g}"))
            cond = term if cond is None else (cond & term)
        out = cur.join(d, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"cur.{g}"), F.col(f"d.{g}")).alias(g)
                for g in self.group_cols
            ],
            *[
                (F.coalesce(F.col(f"cur.{n}"), zero)
                 + F.coalesce(F.col(f"d._d_{n}"), zero)).alias(n)
                for n, _k, _e in self.aggs
            ],
            (F.coalesce(F.col("cur._rows"), zero)
             + F.coalesce(F.col("d._d__rows"), zero)).cast("long")
            .alias("_rows"),
        )
        return out.filter(F.col("_rows") > 0)

    def _stored(self) -> DataFrame:
        m = self._marker()
        if m is None:
            return self._agg(self.source.read().limit(0))
        return self.spark.read.parquet(os.path.join(self.path, m["data"]))

    def read(self) -> DataFrame:
        return self._stored().drop("_rows")

    def definition(self) -> dict:
        """Re-creatable description (persisted by the SQL catalog)."""
        return {"group_cols": list(self.group_cols),
                "aggs": [list(a) for a in self.aggs]}
