"""Time-partitioned composite spec: ``time(ts) x bucket(key)``.

``LakeTable`` hash-buckets by key alone, and ``read_range``'s zone maps
document their honest boundary (plans/lake.py — ``read_range``): a
MID-HISTORY time window over long-compacted buckets prunes little,
because every base file's min/max spans the bucket's full lifetime. The
layout fix named there is this module: an Iceberg-style composite
partition spec — a coarse TIME partition (``months(ts)``, Iceberg
partition-transform style) with the existing key-hash bucketing INSIDE
each partition — so a time-bounded scan prunes whole partitions at the
directory level before any manifest, footer, or file is touched, and a
retention drop of an old month is one metadata commit + one directory
remove instead of a ``delete_where`` table scan.

Reference analog: the reference organizes every run's output per
collection alias into its own directory tree and processes each
independently (convert_cdm_to_mods.py:142-148, post_cdm_cleanup.py's
per-alias passes); this is that layout generalized into a queryable
partition spec over event time.

Design: a PARTITION ROUTER over per-partition ``LakeTable``s, not a
rewrite of the merge engine. Each partition directory (``part=2025-01/``)
is a complete LakeTable — own buckets, delta chains, change feed,
optimistic concurrency — and the router adds a GLOBAL snapshot ledger
(``_ledger/g*.json``) whose every version pins one consistent
cross-partition cut ``{partition: sub_version}``. All the per-partition
machinery (single-shuffle MERGE, zone maps, blooms, compaction tiers,
exactly-once batch ledger) is inherited, not duplicated.

Semantics — the Paimon primary-key-table partition rule, adopted
verbatim and documented rather than papered over: the partition value is
PART OF ROW IDENTITY. Two events for the same ``(conv_id, turn_idx)``
whose ``ts`` falls in different partitions are DIFFERENT rows (the
effective key is ``(partition, key_cols...)``). Cross-partition
last-write-wins would need a global key→partition index (Paimon's
dynamic-bucket cross-partition upsert — a second, shuffled lookup per
batch); a table whose updates move keys across time partitions should
stay on the flat ``LakeTable`` spec. The right fit is the common CDC
shape where a row's event time is assigned once at insert (turns of a
transcript, immutable facts with mutable attributes).

Scale shape at 100 TB:

* ``apply_changes`` routes one batch to the partitions it actually
  touches — a steady-state CDC batch lands in 1-2 recent months, so the
  untouched history is never opened. A backfill spanning many partitions
  switches (``stage_threshold``) to ONE partitioned staging write +
  per-partition reads, so the source is scanned once, not once per
  partition.
* ``read_range`` on the partition column prunes partitions driver-side
  (string-ordered partition values — zero I/O), then each surviving
  partition's zone maps prune buckets as before: mid-history windows now
  open O(window) data instead of O(table).
* ``drop_partition`` is the retention path: O(1) metadata + directory
  remove (Iceberg ``DROP PARTITION`` / Hive retention analog) vs the
  flat table's scan-and-tombstone ``delete_where``.
* ``read_keys`` is the honest trade (same as Paimon): the partition
  column is not derivable from the key, so a point lookup probes every
  partition — each probe is still bucket-pruned and bloom-filtered, so
  cost is O(partitions) manifest reads + O(|keys|) file sets per
  partition, and the operator guidance is coarse partitions (months, not
  days) for key-lookup-heavy tables.

ALTER DDL fans out (``add_column`` / ``widen_column`` / ``drop_column``
/ ``rename_column``): existing partitions get the flat-table ALTER, the
spec schema is rewritten for future partitions, and the spec's retired-
name record lets the router enforce the stale-producer contract that a
brand-new partition (no rename log yet) couldn't. Not yet routed (use
per-partition handles): branches/tags and the typed row changelog — a
global surface needs a cross-partition version map like
``changes(with_version=True)`` builds.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import (
    DELETED_COL,
    SEQ_COL,
    SchemaEvolutionError,
    schema_from_json,
)
from .lake import LakeTable, SnapshotExpiredError

__all__ = ["PartitionedTable", "PartitionRetentionError", "NULL_PART"]

#: Hive/Paimon-style default partition for rows whose partition column is
#: null — keeps the apply pipeline total instead of poisoning a batch.
NULL_PART = "__null__"

_SPARK_FMT = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd"}
_PY_FMT = {"year": "%Y", "month": "%Y-%m", "day": "%Y-%m-%d"}


class PartitionRetentionError(LookupError):
    """A read needed a partition that ``drop_partition`` removed — the
    partition-level twin of ``SnapshotExpiredError``: retention is an
    explicit operator choice, and consumers of expired history get a
    typed, actionable error instead of a FileNotFoundError."""


class PartitionedTable:
    """Composite-spec table: coarse time partitions, key buckets inside.

    Constructor kwargs beyond the spec (``num_buckets``, ``merge_mode``,
    ``changelog``, ...) pass through to every per-partition ``LakeTable``
    handle; layout state still self-adopts from each sub-table's own
    manifest on reopen, exactly as for a flat table.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols=("conv_id", "turn_idx"),
        *,
        partition_col: str = "ts",
        granularity: str = "month",
        stage_threshold: int = 8,
        apply_concurrency: int = 4,
        **lake_kwargs,
    ) -> None:
        assert granularity in _SPARK_FMT, granularity
        assert apply_concurrency >= 1, apply_concurrency
        self.spark = spark
        # same absolutization as LakeTable: Python ledger IO vs JVM data IO
        self.path = os.path.abspath(path.rstrip("/"))
        self.key_cols = tuple(key_cols)
        self.partition_col = partition_col
        self.granularity = granularity
        self.stage_threshold = stage_threshold
        self.apply_concurrency = apply_concurrency
        self._lake_kwargs = dict(lake_kwargs)
        self._ledger = os.path.join(self.path, "_ledger")
        self._spec_path = os.path.join(self.path, "_spec.json")
        self._subs: dict[str, LakeTable] = {}
        spec = self._load_spec()
        if spec is not None:
            # reopen ADOPTS the on-disk spec (like LakeTable's bucket_fn /
            # merge_engine adoption): deriving partitions with different
            # args than the writer's is a silent layout fork.
            for mine, theirs, name in (
                (partition_col, spec["partition_col"], "partition_col"),
                (granularity, spec["granularity"], "granularity"),
            ):
                if mine != theirs and mine != type(self).__init__.__kwdefaults__[name]:
                    raise ValueError(
                        f"{name}={mine!r} conflicts with the table's "
                        f"on-disk spec {theirs!r} — reopen adopts the spec;"
                        " drop the argument"
                    )
            self.partition_col = spec["partition_col"]
            self.granularity = spec["granularity"]
            self.key_cols = tuple(spec["key_cols"])

    # ------------------------------------------------------------- ledger
    def _load_spec(self) -> dict | None:
        if not os.path.exists(self._spec_path):
            return None
        with open(self._spec_path) as fh:
            return json.load(fh)

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._ledger):
            return []
        return sorted(
            int(f[1:-5])  # width-proof, like LakeTable._versions
            for f in os.listdir(self._ledger)
            if f.startswith("g") and f.endswith(".json") and not f.startswith("g_")
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def exists(self) -> bool:
        return self.latest_version() is not None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        p = os.path.join(self._ledger, f"g{v:08d}.json")
        if not os.path.exists(p):
            # same typed error flat-table consumers already re-seed on
            raise SnapshotExpiredError(
                f"global version {v} was removed by expire_snapshots"
            )
        with open(p) as fh:
            return json.load(fh)

    def _commit_global(self, man: dict) -> None:
        """Same link(2)-exclusive protocol as ``LakeTable._commit`` — a
        concurrent router commit surfaces as a conflict, never a clobber."""
        os.makedirs(self._ledger, exist_ok=True)
        v = man["version"]
        final = os.path.join(self._ledger, f"g{v:08d}.json")
        tmp = os.path.join(self._ledger, f"g_tmp-{uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit conflict on global version {v}"
            ) from None
        finally:
            os.unlink(tmp)

    def _next_global(self, op: str, *, touched=(), batch_id=None,
                     metrics=None) -> dict:
        """Build the next global manifest pinning every referenced
        partition (the previous cut's partitions plus ``touched``) at its
        current latest sub-version — one consistent cross-partition cut
        per commit (the structural form of ``consistent_cut``). Based on
        the previous MANIFEST, not the directory listing, so a crashed
        ``drop_partition`` (committed, directory not yet removed) can
        never resurrect the dropped partition into the next cut."""
        prev = self.manifest()
        parts = {
            p: self._sub(p).latest_version()
            for p in sorted(set(prev["parts"]) | set(touched))
        }
        return {
            "format_version": 1,
            "version": prev["version"] + 1,
            "op": op,
            "batch_id": batch_id,
            "last_batch_id": (
                batch_id
                if batch_id is not None and batch_id > prev["last_batch_id"]
                else prev["last_batch_id"]
            ),
            "parts": parts,
            "metrics": metrics or {},
            "commit_ts": time.time(),
        }

    # --------------------------------------------------------- partitions
    def _part_dir(self, part: str) -> str:
        return os.path.join(self.path, f"part={part}")

    def _live_parts(self) -> list[str]:
        """Partitions with a directory on disk (authoritative for commit
        snapshots; the latest global manifest's view for readers)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self.path)
            if d.startswith("part=")
        )

    def partitions(self) -> list[str]:
        return sorted(self.manifest()["parts"])

    def part(self, value: str) -> LakeTable:
        """A per-partition LakeTable handle (for DDL, changelog, fsck —
        the surfaces the router doesn't fan out yet)."""
        return self._sub(value)

    def _sub(self, part: str, create: bool = False) -> LakeTable:
        sub = self._subs.get(part)
        if sub is not None:
            return sub
        sub = LakeTable(
            self.spark,
            self._part_dir(part),
            key_cols=self.key_cols,
            **self._lake_kwargs,
        )
        if not sub.exists():
            if not create:
                raise PartitionRetentionError(
                    f"partition {part!r} of {self.path} is gone (never "
                    "created, or removed by drop_partition); reads pinned "
                    "to global versions that referenced it cannot be served"
                )
            # new partitions start at the SPEC schema; batch-driven
            # evolution brings them to the batch's shape, so a partition
            # born after an implicit column add still converges. Explicit
            # DDL is per-partition for now (module docstring).
            sub.create(schema_from_json(self._load_spec()["schema"]))
        self._subs[part] = sub
        return sub

    def _part_expr(self) -> F.Column:
        c = F.col(self.partition_col)
        return F.when(c.isNull(), F.lit(NULL_PART)).otherwise(
            F.date_format(c, _SPARK_FMT[self.granularity])
        )

    def _part_of_bound(self, v) -> str:
        """Partition value a range bound falls in — driver-side, using the
        SAME session timezone ``date_format`` formats with, so the prune
        and the data can never disagree (the read_range tz rule)."""
        from zoneinfo import ZoneInfo

        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        elif isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)
        if not isinstance(v, _dt.datetime):
            raise TypeError(
                f"unsupported partition bound {v!r}; pass datetime/date/ISO"
            )
        tz = ZoneInfo(self.spark.conf.get("spark.sql.session.timeZone", "UTC"))
        if v.tzinfo is None:
            v = v.replace(tzinfo=tz)
        return v.astimezone(tz).strftime(_PY_FMT[self.granularity])

    # --------------------------------------------------------------- DDL
    def create(self, schema: T.StructType) -> None:
        if self.partition_col not in schema.fieldNames():
            raise ValueError(
                f"partition_col {self.partition_col!r} not in schema "
                f"{schema.fieldNames()}"
            )
        dtype = schema[self.partition_col].dataType
        if not isinstance(dtype, (T.TimestampType, T.DateType)):
            raise ValueError(
                f"partition_col must be timestamp/date, got "
                f"{dtype.simpleString()}"
            )
        os.makedirs(self.path, exist_ok=True)
        # spec-exists + g0-exists = a real table; spec-exists + NO global
        # version = a create() that crashed between the two writes — re-run
        # to recover (the rename below just re-publishes the spec, and the
        # link(2)-exclusive g0 commit still refuses a concurrent double
        # create)
        if os.path.exists(self._spec_path) and self.exists():
            raise RuntimeError(f"table already exists at {self.path}")
        tmp = self._spec_path + f".tmp-{uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "format_version": 1,
                    "partition_col": self.partition_col,
                    "granularity": self.granularity,
                    "key_cols": list(self.key_cols),
                    "schema": schema.json(),
                },
                fh,
                indent=1,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._spec_path)
        self._commit_global(
            {
                "format_version": 1,
                "version": 0,
                "op": "create",
                "batch_id": None,
                "last_batch_id": -1,
                "parts": {},
                "metrics": {},
                "commit_ts": time.time(),
            }
        )

    # --------------------------------------------------------- ALTER DDL
    # Fan-out DDL: each EXISTING partition gets the flat-table ALTER (its
    # own rename log / schema list keeps time travel per partition), and
    # the SPEC schema is rewritten so partitions created later are born
    # with the post-DDL shape. The spec also records every RETIRED name
    # (dropped, or the old side of a rename) — a brand-new partition has
    # no rename log to refuse stale producers with, so the ROUTER enforces
    # the flat-table contract at apply time: batches using a renamed-away
    # name are refused (error names the new name), batches still carrying
    # a dropped column get it ignored. Single-DDL-owner assumption, like
    # every maintenance op here.

    def _rewrite_spec(self, mutate) -> None:
        spec = self._load_spec()
        mutate(spec)
        tmp = self._spec_path + f".tmp-{uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._spec_path)

    def _retired(self) -> dict:
        return self._load_spec().get("retired", {})

    def _assert_fresh_spec_name(self, name: str) -> None:
        spec = self._load_spec()
        if name in self._retired() or name in schema_from_json(
            spec["schema"]
        ).fieldNames():
            raise SchemaEvolutionError(
                f"column name {name!r} exists or was retired by an earlier "
                "DDL; retired names cannot return"
            )

    def _alter_fanout(self, sub_call, mutate_spec, metrics: dict) -> dict:
        for p in sorted(self.manifest()["parts"]):
            sub_call(self._sub(p))
        self._rewrite_spec(mutate_spec)
        self._commit_global(self._next_global("alter", metrics=metrics))
        return metrics

    def add_column(self, name: str, dtype) -> dict:
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        self._assert_fresh_spec_name(name)

        def mutate(spec):
            schema = schema_from_json(spec["schema"])
            spec["schema"] = T.StructType(
                [*schema.fields, T.StructField(name, dtype, True)]
            ).json()

        return self._alter_fanout(
            lambda s: s.add_column(name, dtype), mutate,
            {"op": "add_column", "column": name,
             "dtype": dtype.simpleString()},
        )

    def widen_column(self, name: str, dtype) -> dict:
        if isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)

        def mutate(spec):
            schema = schema_from_json(spec["schema"])
            spec["schema"] = T.StructType(
                [T.StructField(name, dtype, f.nullable)
                 if f.name == name else f for f in schema.fields]
            ).json()

        return self._alter_fanout(
            lambda s: s.widen_column(name, dtype), mutate,
            {"op": "widen_column", "column": name,
             "dtype": dtype.simpleString()},
        )

    def drop_column(self, name: str) -> dict:
        if name in self.key_cols or name == self.partition_col:
            raise SchemaEvolutionError(
                f"{name!r} is a key/partition column; drop is not allowed"
            )

        def mutate(spec):
            schema = schema_from_json(spec["schema"])
            spec["schema"] = T.StructType(
                [f for f in schema.fields if f.name != name]
            ).json()
            spec.setdefault("retired", {})[name] = {"reason": "dropped"}

        return self._alter_fanout(
            lambda s: s.drop_column(name), mutate,
            {"op": "drop_column", "column": name},
        )

    def rename_column(self, old: str, new: str) -> dict:
        if old in self.key_cols or old == self.partition_col:
            raise SchemaEvolutionError(
                f"{old!r} is a key/partition column; rename is not allowed"
            )
        self._assert_fresh_spec_name(new)

        def mutate(spec):
            schema = schema_from_json(spec["schema"])
            spec["schema"] = T.StructType(
                [T.StructField(new, f.dataType, f.nullable)
                 if f.name == old else f for f in schema.fields]
            ).json()
            spec.setdefault("retired", {})[old] = {
                "reason": "renamed", "to": new,
            }

        return self._alter_fanout(
            lambda s: s.rename_column(old, new), mutate,
            {"op": "rename_column", "from": old, "to": new},
        )

    def _enforce_retired(self, ev: DataFrame) -> DataFrame:
        """Router-level stale-producer contract (see ALTER section note):
        renamed-away names refuse, dropped names are ignored."""
        retired = self._retired()
        hit = [c for c in ev.columns if c in retired]
        for c in hit:
            meta = retired[c]
            if meta["reason"] == "renamed":
                raise SchemaEvolutionError(
                    f"batch column {c!r} was renamed to {meta['to']!r}; "
                    "update the producer"
                )
            ev = ev.drop(c)
        return ev

    # -------------------------------------------------------------- write
    def apply_changes(
        self,
        events: DataFrame,
        batch_id: int | None = None,
        transform=None,
        source: str | None = None,
    ) -> dict:
        """Route one change batch to the partitions it touches, then
        commit one global version pinning the resulting cross-partition
        cut.

        The transform chain runs ONCE at the router (it may be what
        produces the typed partition column — ts canonicalization), so
        sub-applies receive finished rows. Exactly-once composes: the
        global ledger dedupes whole batches; on a crash mid-fan-out the
        replay's per-partition applies hit each sub-table's own batch
        ledger (already-committed partitions skip), and the global commit
        lands at the end — convergence without a cross-directory
        transaction, the same ledger-as-idempotence-token pattern as
        ``replicate``.

        Partition discovery is a ``distinct().collect()`` of the derived
        partition value — O(partitions touched by the batch), which is
        1-2 for a steady-state CDC window and bounded by the spec's
        coarseness for a backfill; past ``stage_threshold`` partitions the
        batch is staged ONCE as partitioned parquet and each sub-apply
        reads only its slice, so a months-spanning backfill scans the
        source once instead of once per partition."""
        t0 = time.monotonic()
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {
                "skipped": True,
                "batch_id": batch_id,
                "reason": "already committed",
            }
        ev = transform(events) if transform is not None else events
        if self.partition_col not in ev.columns:
            raise ValueError(
                f"batch lacks partition column {self.partition_col!r} "
                "(apply the transform chain that derives it)"
            )
        if "_part" in ev.columns:
            # withColumn would silently overwrite the producer's column
            raise ValueError(
                "batch carries a reserved '_part' column — rename it"
            )
        ev = self._enforce_retired(ev)
        ev = ev.withColumn("_part", self._part_expr())
        staged: str | None = None
        persisted = False
        try:
            ev.persist()
            persisted = True
            parts = sorted(
                r[0] for r in ev.select("_part").distinct().collect()
            )
            if len(parts) > self.stage_threshold:
                staged = os.path.join(
                    self.path, "_staging", f"batch-{uuid4().hex[:8]}"
                )
                ev.write.partitionBy("_part").parquet(staged)
                ev.unpersist()
                persisted = False
            src = source or (
                f"router:batch={batch_id}" if batch_id is not None else "router"
            )
            # handle creation (spec read + sub create() commit) stays
            # serial; the APPLIES fan out on threads — each sub-apply is a
            # pipeline of independent Spark jobs against its own directory
            # (no shared commits), and a multi-partition batch paying 12
            # sequential per-apply fixed costs would make the router tax
            # O(partitions) in wall when the cluster has idle headroom.
            # _apply_conf_scope is refcounted + lock-protected for exactly
            # this interleaving.
            subs = {p: self._sub(p, create=True) for p in parts}

            def _one(p: str):
                slice_df = (
                    self.spark.read.parquet(os.path.join(staged, f"_part={p}"))
                    if staged
                    else ev.filter(F.col("_part") == p).drop("_part")
                )
                return p, subs[p].apply_changes(
                    slice_df, batch_id=batch_id, source=src
                )

            if len(parts) <= 1 or self.apply_concurrency == 1:
                per_part = dict(_one(p) for p in parts)
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    min(self.apply_concurrency, len(parts))
                ) as ex:
                    per_part = dict(ex.map(_one, parts))
        finally:
            if persisted:
                ev.unpersist()
            if staged:
                shutil.rmtree(staged, ignore_errors=True)
                staging_root = os.path.join(self.path, "_staging")
                if os.path.isdir(staging_root) and not os.listdir(staging_root):
                    os.rmdir(staging_root)
        metrics = {
            "n_parts_touched": len(parts),
            "staged": staged is not None,
            "parts": {
                p: {
                    k: m.get(k)
                    for k in ("n_events", "skipped", "elapsed_sec")
                    if k in m
                }
                for p, m in per_part.items()
            },
            "wall_sec": round(time.monotonic() - t0, 3),
        }
        self._commit_global(
            self._next_global(
                "apply", touched=parts, batch_id=batch_id, metrics=metrics
            )
        )
        return metrics

    def bootstrap(
        self, snapshot: DataFrame, snapshot_seq: int, *, transform=None
    ) -> dict:
        """Seed an EMPTY partitioned table from a full-state snapshot —
        same overlap-tolerant handoff contract as ``LakeTable.bootstrap``
        (each partition's load is the empty-table single-shuffle CTAS)."""
        man = self.manifest()
        if man["parts"] or man["last_batch_id"] != -1:
            raise RuntimeError(
                "bootstrap requires an empty table; found global version "
                f"{man['version']} with {len(man['parts'])} partitions"
            )
        events = snapshot.select(
            F.lit("I").alias("op"),
            F.lit(int(snapshot_seq)).cast("long").alias("seq"),
            *[F.col(c) for c in snapshot.columns],
        )
        return self.apply_changes(
            events,
            batch_id=None,
            transform=transform,
            source=f"bootstrap:seq={int(snapshot_seq)}",
        )

    # --------------------------------------------------------------- read
    def _union(self, dfs: list[DataFrame], empty=None) -> DataFrame:
        if not dfs:
            # empty results must carry the SAME schema a non-empty result
            # would (evolved columns, the feed's hidden _seq/_deleted) —
            # an empty poll that loses columns crashes its consumer
            return empty() if empty is not None else self.spark.createDataFrame(
                [], schema_from_json(self._load_spec()["schema"])
            )
        out = dfs[0]
        for d in dfs[1:]:
            # per-partition schemas may have evolved independently
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _empty_cut(self, man: dict, *, hidden: bool = False,
                   with_version: bool = False) -> DataFrame:
        """Zero-row frame with the schema a non-empty read of this cut
        would produce: union of every pinned partition's canonical schema
        (falling back to the spec schema on a partitionless table), plus
        the hidden feed columns when asked."""
        dfs = []
        for p, v in sorted(man["parts"].items()):
            sub = self._sub(p)
            dfs.append(
                sub._empty(sub._canonical_schema(sub.manifest(v)),
                           hidden=hidden)
            )
        if dfs:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
        else:
            schema = schema_from_json(self._load_spec()["schema"])
            if hidden:
                schema = T.StructType(
                    schema.fields
                    + [T.StructField(SEQ_COL, T.LongType(), False),
                       T.StructField(DELETED_COL, T.BooleanType(), False)]
                )
            out = self.spark.createDataFrame([], schema)
        if with_version:
            out = out.withColumn("_version", F.lit(None).cast("long"))
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Table state at a global version: each partition read at the
        sub-version that global commit pinned — one consistent cut."""
        man = self.manifest(version)
        return self._union(
            [self._sub(p).read(version=v) for p, v in sorted(man["parts"].items())],
            empty=lambda: self._empty_cut(man),
        )

    def read_range(self, lo, hi, col: str | None = None,
                   version: int | None = None) -> DataFrame:
        """Range read with PARTITION pruning on the partition column
        (driver-side string compare of partition values — zero I/O), then
        per-partition zone-map bucket pruning as usual. Ranging on any
        other column skips the partition prune and fans out (each
        partition's zone maps still apply)."""
        col = col or self.partition_col
        man = self.manifest(version)
        items = sorted(man["parts"].items())
        if col == self.partition_col:
            lo_p, hi_p = self._part_of_bound(lo), self._part_of_bound(hi)
            items = [
                (p, v) for p, v in items
                if p != NULL_PART and lo_p <= p <= hi_p
            ]
        return self._union(
            [self._sub(p).read_range(lo, hi, col=col, version=v)
             for p, v in items],
            empty=lambda: self._empty_cut(man),
        )

    def read_keys(self, bucket_keys: list, version: int | None = None) -> DataFrame:
        """Point lookup. Honest trade of the composite spec (module
        docstring): the key does not determine the partition, so every
        partition is probed — each probe bucket-pruned and bloom-filtered."""
        man = self.manifest(version)
        return self._union(
            [self._sub(p).read_keys(bucket_keys, version=v)
             for p, v in sorted(man["parts"].items())],
            empty=lambda: self._empty_cut(man),
        )

    def changes(self, since_version: int, until_version: int | None = None,
                *, with_version: bool = False) -> DataFrame:
        """Global change feed: rows committed in GLOBAL versions
        ``(since, until]``, assembled from each partition's own change
        feed over the sub-version spans the global manifests pin.
        ``with_version=True`` attributes rows to GLOBAL versions (one
        sub-feed read per (global version, partition) — the same
        plan-growth caveat as the flat table's attribution)."""
        man_hi = self.manifest(until_version)
        man_lo = self.manifest(since_version)
        hi = man_hi["version"]
        if since_version > hi:
            raise ValueError(
                f"since_version {since_version} is above until {hi}"
            )
        # walk the range once (O(range) raw manifest reads, the same cost
        # class as flat-table feed discovery) to fail loud where a
        # partition's change history is incomplete: a partition present in
        # one cut and ABSENT from the next was drop_partition'd — its
        # committed rows are gone, and a later RE-CREATE under the same
        # value (fresh sub-ledger, possibly reaching the same version
        # numbers) would otherwise make a plain (lo, hi] sub-read skip the
        # pre-drop rows without a trace. Version regressions are caught
        # too (belt for out-of-band ledger surgery).
        prev_parts = man_lo["parts"]
        lost: set[str] = set()
        for g in range(since_version + 1, hi + 1):
            cur = self.manifest(g)["parts"]
            lost |= {p for p in prev_parts if p not in cur}
            lost |= {
                p for p, v in cur.items() if v < prev_parts.get(p, -1)
            }
            prev_parts = cur
        if lost:
            raise PartitionRetentionError(
                f"change feed ({since_version}, {hi}] crosses "
                f"drop_partition({sorted(lost)!r}); retention removed "
                "some of their rows"
            )
        dfs: list[DataFrame] = []
        empty = lambda: self._empty_cut(  # noqa: E731
            man_hi, hidden=True, with_version=with_version
        )
        if not with_version:
            for p, v_hi in sorted(man_hi["parts"].items()):
                v_lo = man_lo["parts"].get(p, 0)
                if v_hi > v_lo:
                    dfs.append(self._sub(p).changes(v_lo, v_hi))
            return self._union(dfs, empty=empty)
        prev = man_lo
        for g in range(since_version + 1, hi + 1):
            cur = self.manifest(g)
            for p, v_hi in sorted(cur["parts"].items()):
                v_lo = prev["parts"].get(p, 0)
                if v_hi > v_lo:
                    dfs.append(
                        self._sub(p)
                        .changes(v_lo, v_hi)
                        # long, matching the flat table's attribution column
                        .withColumn("_version", F.lit(g).cast("long"))
                    )
            prev = cur
        return self._union(dfs, empty=empty)

    def history(self, limit: int | None = None) -> list[dict]:
        out = [self.manifest(v) for v in reversed(self._versions())]
        return out[:limit] if limit else out

    def describe_detail(self) -> dict:
        """Layout summary across partitions, plus partition skew — the
        signal for a mis-chosen granularity (one month holding most rows
        means the partition is doing no pruning work)."""
        man = self.manifest()
        per_part = {}

        def _rows(d):  # stored rows (deltas count superseded versions —
            return (d["base_rows"] or 0) + (d["delta_rows"] or 0)  # a skew
            # signal, not an exact live count)

        total = 0
        for p, v in sorted(man["parts"].items()):
            d = self._sub(p).describe_detail()
            per_part[p] = d
            total += _rows(d)
        share = {
            p: round(_rows(d) / total, 4) for p, d in per_part.items()
        } if total else {}
        return {
            "version": man["version"],
            "n_partitions": len(per_part),
            "max_partition_row_share": max(share.values()) if share else 0.0,
            "partitions": per_part,
        }

    # -------------------------------------------------------- maintenance
    def compact(self, **kw) -> dict:
        """Fan ``compact`` out to every partition, then commit one global
        maintenance cut so readers and GC see the folded layout."""
        results = {
            p: self._sub(p).compact(**kw)
            for p in sorted(self.manifest()["parts"])
        }
        self._commit_global(
            self._next_global("maintenance", metrics={"compact": True})
        )
        return results

    def drop_partition(self, part: str) -> dict:
        """Retention: drop one partition — O(1) metadata commit + one
        directory remove, vs the flat table's scan-and-tombstone
        ``delete_where``. Commit-then-remove ordering: a crash between the
        two leaves an unreferenced directory a re-drop (idempotent) or the
        next ``expire_snapshots`` clears — never a latest version pointing
        at missing data. Reads pinned to OLDER global versions keep
        working only until the directory is gone; after that they raise
        ``PartitionRetentionError`` (retention is an operator choice, the
        ``SnapshotExpiredError`` contract at partition scope)."""
        man = self.manifest()
        dropped = part in man["parts"]
        if dropped:
            nxt = self._next_global("drop_partition",
                                    metrics={"dropped_partition": part})
            nxt["parts"].pop(part, None)
            self._commit_global(nxt)
        d = self._part_dir(part)
        removed = os.path.isdir(d)
        if removed:
            shutil.rmtree(d)
            self._subs.pop(part, None)
        if not dropped and not removed:
            raise LookupError(f"unknown partition {part!r}")
        return {"partition": part, "committed": dropped, "removed_dir": removed}

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Bound time travel: keep the newest ``keep_last`` GLOBAL
        versions, then shrink each partition's own ledger to the
        sub-versions those kept cuts still reference (sub-table expiry
        also GCs its unreferenced data dirs and the loser/crash leftovers
        under them)."""
        gvs = self._versions()
        if not gvs:
            # never created / no ledger — nothing is referenced, and the
            # unreferenced-dir sweep below must not fire on that state
            return {"expired_global": 0, "kept": [], "parts": {}}
        keep = gvs[-keep_last:]
        drop = [v for v in gvs if v not in keep]
        kept_mans = [self.manifest(v) for v in keep]
        for v in drop:
            os.remove(os.path.join(self._ledger, f"g{v:08d}.json"))
        per_part = {}
        for p in self._live_parts():
            referenced = {
                m["parts"][p] for m in kept_mans if p in m["parts"]
            }
            # referenced-check BEFORE instantiating the handle: a crash
            # leftover (directory with no committed sub version) must be
            # GC'd here, and _sub() on it would raise instead
            if not referenced:
                # no kept cut references this partition (created after the
                # last kept commit crashed, or drop committed without the
                # rmtree landing) — the directory is unreachable garbage
                shutil.rmtree(self._part_dir(p), ignore_errors=True)
                self._subs.pop(p, None)
                per_part[p] = {"removed_unreferenced_dir": True}
                continue
            sub = self._sub(p)
            floor = min(referenced)
            keep_n = len([sv for sv in sub._versions() if sv >= floor])
            per_part[p] = sub.expire_snapshots(keep_last=keep_n)
        return {"expired_global": len(drop), "kept": keep, "parts": per_part}

    def maintain(self, **policy) -> dict:
        """Policy-driven maintenance across partitions (the ``maintain()``
        scheduler fanned out), ending in one global maintenance cut."""
        from .maintenance import maintain as _maintain

        results = {
            p: _maintain(self._sub(p), **policy)
            for p in sorted(self.manifest()["parts"])
        }
        if not policy.get("dry_run"):
            self._commit_global(
                self._next_global("maintenance", metrics={"maintain": True})
            )
        return results
