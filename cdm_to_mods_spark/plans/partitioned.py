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

Semantics — the Paimon primary-key-table partition rule by default: the
partition value is PART OF ROW IDENTITY. Two events for the same
``(conv_id, turn_idx)`` whose ``ts`` falls in different partitions are
DIFFERENT rows (the effective key is ``(partition, key_cols...)``). The
right fit is the common CDC shape where a row's event time is assigned
once at insert (turns of a transcript, immutable facts with mutable
attributes).

``cross_partition_upsert=True`` switches to Paimon's OTHER documented
mode (``cross-partition-upsert`` with the dynamic-bucket global index):
the KEY ALONE is row identity. A global key→partition index — itself a
flat bucketed ``LakeTable`` at ``<path>/_index`` — is probed once per
batch (bucket-pruned, O(touched index buckets), never an index scan);
an update whose derived partition differs from the key's home MOVES the
key (synthesized ``D`` at the old home + upsert at the new — feed
consumers see retract+insert), and a ``D`` event routes to the home
partition regardless of its own ts. The per-batch tax is the documented
Paimon one: one index lookup join + one O(movers+inserts) index MERGE
(skipped entirely when a batch creates/moves/deletes no keys — the
steady state); in exchange ``read_keys`` drops from O(partitions)
probes to O(homes) — measured 4.6× at 12 monthly partitions and 15× at
36 (bench lane ``cdc.cross_partition``, conversation-shaped stream).

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
brand-new partition (no rename log yet) couldn't. The typed row
changelog IS routed (``row_changes`` — global-version attribution over
the per-partition lookup producers), and so is write-audit-publish:
``create_branch``/``publish_branch``/``drop_branch``/``tag`` namespace
the GLOBAL ledger (``gb-<name>-g*.json``) and ride each partition's own
flat branch, so staging isolation, squash publish, exactly-once survival
and crash recovery are inherited rather than re-implemented.
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
from ..operators.dedup import latest_per_key
from .lake import (
    _BRANCH_NAME_RE,
    BranchDivergedError,
    LakeTable,
    SnapshotExpiredError,
    _bucket_expr,
    _to_unix,
)

__all__ = ["PartitionedTable", "PartitionRetentionError", "NULL_PART"]

#: Hive/Paimon-style default partition for rows whose partition column is
#: null — keeps the apply pipeline total instead of poisoning a batch.
NULL_PART = "__null__"

#: Cross-partition route probe: when the key→partition index's total row
#: count (free from manifest stats) is at or below this, the probe reads
#: the WHOLE index instead of running a touched-bucket discovery job over
#: the batch — ~100 MB of parquet at the threshold, cheaper than an extra
#: full batch scan per micro-batch. See ``_route_cross_partition``.
_ROUTE_FULL_INDEX_ROWS = 2_000_000

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
        stage_threshold: int = 16,
        apply_concurrency: int = 4,
        cross_partition_upsert: bool = False,
        index_buckets: int = 16,
        branch: str = "main",
        **lake_kwargs,
    ) -> None:
        assert granularity in _SPARK_FMT, granularity
        assert apply_concurrency >= 1, apply_concurrency
        self.branch = branch
        self.spark = spark
        # same absolutization as LakeTable: Python ledger IO vs JVM data IO
        self.path = os.path.abspath(path.rstrip("/"))
        self.key_cols = tuple(key_cols)
        self.partition_col = partition_col
        self.granularity = granularity
        self.stage_threshold = stage_threshold
        self.apply_concurrency = apply_concurrency
        self.cross_partition_upsert = cross_partition_upsert
        self.index_buckets = index_buckets
        if cross_partition_upsert and lake_kwargs.get(
            "merge_engine", "lww"
        ) != "lww":
            # the router's winner collapse (latest_per_key) is only sound
            # under whole-row LWW: partial_update would drop column
            # patches, aggregate would drop contributions, first_row keeps
            # the wrong end — and the synthesized mover 'D' events are
            # refused outright by aggregate/first_row sub-tables
            raise ValueError(
                "cross_partition_upsert requires merge_engine='lww' "
                f"(got {lake_kwargs['merge_engine']!r}): the per-batch "
                "winner collapse and synthesized move-deletes assume "
                "whole-row last-write-wins"
            )
        self._lake_kwargs = dict(lake_kwargs)
        self._ledger = os.path.join(self.path, "_ledger")
        self._spec_path = os.path.join(self.path, "_spec.json")
        self._subs: dict[str, LakeTable] = {}
        self._idx: LakeTable | None = None
        spec = self._load_spec()
        if spec is not None:
            # reopen ADOPTS the on-disk spec (like LakeTable's bucket_fn /
            # merge_engine adoption): deriving partitions with different
            # args than the writer's is a silent layout fork.
            for mine, theirs, name in (
                (partition_col, spec["partition_col"], "partition_col"),
                (granularity, spec["granularity"], "granularity"),
                (cross_partition_upsert,
                 spec.get("cross_partition_upsert", False),
                 "cross_partition_upsert"),
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
            self.cross_partition_upsert = spec.get(
                "cross_partition_upsert", False
            )
            # the spec records the WRITE STRATEGY (at create since
            # round 4; rebucket re-records the layout): partitions born
            # later — through any handle, incl. library-less writers
            # like the native sink — come up at the owner's recorded
            # strategy, never a constructor default (a 'lww' manifest
            # stamped into a partial_update table's new month would be
            # adopted forever and erase patched columns)
            for k in ("num_buckets", "bucket_fn", "bucket_col",
                      "merge_engine"):
                if k in spec:
                    self._lake_kwargs[k] = spec[k]
            if spec.get("agg_spec"):
                self._lake_kwargs["agg_spec"] = spec["agg_spec"]

    # ------------------------------------------------------------- ledger
    def _load_spec(self) -> dict | None:
        if not os.path.exists(self._spec_path):
            return None
        with open(self._spec_path) as fh:
            return json.load(fh)

    def _gvfile_name(self, v: int, branch: str | None = None) -> str:
        """Global version-file name in the given branch's namespace. Main
        keeps the bare ``g<NNNNNNNN>.json`` layout; a branch's global cuts
        live beside them as ``gb-<branch>-g<NNNNNNNN>.json`` (same shape as
        the flat table's ``b-<name>-v*.json`` rule)."""
        b = self.branch if branch is None else branch
        return f"g{v:08d}.json" if b == "main" else f"gb-{b}-g{v:08d}.json"

    @staticmethod
    def _gbranch_vfile_versions(names: list[str], branch: str) -> list[int]:
        pre = f"gb-{branch}-g"
        return [
            int(f[len(pre):-5])
            for f in names
            if f.startswith(pre) and f.endswith(".json")
            and f[len(pre):-5].isdigit()
        ]

    def _versions(self) -> list[int]:
        """Global versions visible on THIS handle's branch: main sees the
        bare files; a branch sees the shared main prefix up to its fork
        plus its own commits (dense across the fork, like the flat
        table)."""
        if not os.path.isdir(self._ledger):
            return []
        names = os.listdir(self._ledger)
        main = sorted(
            int(f[1:-5])  # width-proof, like LakeTable._versions
            for f in names
            if f.startswith("g") and f.endswith(".json")
            and f[1:-5].isdigit()
        )
        if self.branch == "main":
            return main
        fork = self._gbranch_meta(self.branch)["forked_at"]
        return sorted(
            [v for v in main if v <= fork]
            + self._gbranch_vfile_versions(names, self.branch)
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
        if self.branch != "main":
            bp = os.path.join(self._ledger, self._gvfile_name(v))
            if os.path.exists(bp):
                with open(bp) as fh:
                    return json.load(fh)
            # at-or-before-fork versions fall through to the main files
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
        concurrent router commit surfaces as a conflict, never a clobber.
        Branch handles commit into their own namespace."""
        os.makedirs(self._ledger, exist_ok=True)
        v = man["version"]
        final = os.path.join(self._ledger, self._gvfile_name(v))
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
            # snapshot of the spec AT this cut (DDL mutates the spec file
            # first, so this is the post-statement state — the Iceberg
            # metadata-file model): historical clones and rollback restore
            # the table CONTRACT (schema/constraints/properties/retired),
            # not just the data, from it. Pre-snapshot manifests simply
            # lack the key and fall back to the live spec.
            "spec": self._load_spec(),
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
        main_sub = LakeTable(
            self.spark,
            self._part_dir(part),
            key_cols=self.key_cols,
            **self._sub_kwargs(),
        )
        if not main_sub.exists():
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
            spec = self._load_spec()
            won_create = True
            try:
                main_sub.create(schema_from_json(spec["schema"]))
            except RuntimeError:
                # a concurrent writer won this partition's v0 (same spec
                # schema + constraints by construction) — adopt theirs
                if not main_sub.exists():
                    raise
                won_create = False
            if won_create:
                # partitions born after ADD CONSTRAINT inherit every spec
                # CHECK at create, the same future-partition contract as
                # retired names. Installed OUTSIDE the create-race except
                # (a swallowed constraint-commit conflict would silently
                # strip the partition's CHECKs) with its own bounded
                # retry: the racer may land its first batch between our
                # create and this commit.
                for c in spec.get("constraints", []):
                    for attempt in range(8):
                        try:
                            main_sub.add_constraint(c["name"], c["expr"],
                                                    validate=False)
                            break
                        except RuntimeError:
                            if attempt == 7:
                                raise
        sub = main_sub
        if self.branch != "main":
            # a partition born INSIDE a branch apply gets its sub-branch
            # lazily (create_branch fanned out only to the partitions that
            # existed at fork time)
            if not any(
                b["name"] == self.branch for b in main_sub.branches()
            ):
                if not create:
                    raise LookupError(
                        f"partition {part!r} has no branch "
                        f"{self.branch!r} — was it created on main after "
                        "the fork?"
                    )
                main_sub.create_branch(self.branch)
            sub = LakeTable(
                self.spark,
                self._part_dir(part),
                key_cols=self.key_cols,
                branch=self.branch,
                **self._sub_kwargs(),
            )
        self._subs[part] = sub
        return sub

    def _sub_kwargs(self) -> dict:
        """Per-partition LakeTable kwargs. The ROUTER owns the dead-letter
        sink: null-key rows are split off once before routing (one writer,
        one scan), because threaded sub-applies append-writing one shared
        quarantine directory would race FileOutputCommitter staging —
        so subs never see a quarantine_path."""
        return {k: v for k, v in self._lake_kwargs.items()
                if k != "quarantine_path"}

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

    # ------------------------------------------- global branches / tags
    def _gbranches_dir(self) -> str:
        return os.path.join(self.path, "_gbranches")

    def _gtags_dir(self) -> str:
        return os.path.join(self.path, "_gtags")

    def _gbranch_file(self, name: str) -> str:
        return os.path.join(self._gbranches_dir(), f"{name}.json")

    def _gbranch_meta(self, name: str) -> dict:
        try:
            with open(self._gbranch_file(name)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise LookupError(
                f"global branch {name!r} does not exist at {self.path}"
            ) from None

    def branches(self) -> list[dict]:
        """Live GLOBAL staging branches: ``[{name, forked_at, ...}]``."""
        d = self._gbranches_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            (
                self._gbranch_meta(f[:-5])
                for f in os.listdir(d)
                if f.endswith(".json") and not f.startswith("_tmp-")
            ),
            key=lambda m: m["name"],
        )

    def _write_meta_exclusive(self, directory: str, name: str,
                              meta: dict, kind: str) -> None:
        os.makedirs(directory, exist_ok=True)
        tmp = os.path.join(directory, f"_tmp-{uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(directory, f"{name}.json"))
        except FileExistsError:
            raise ValueError(f"{kind} {name!r} already exists") from None
        finally:
            os.unlink(tmp)

    def create_branch(self, name: str) -> dict:
        """Fork a GLOBAL write-audit-publish branch at the current global
        head: every live partition (and the cross-partition index, when
        present) gets a flat-table branch, then the global pointer
        publishes atomically LAST — a usable global branch implies every
        sub-branch exists, and a crash mid-fan-out leaves no pointer (a
        re-run tolerates the sub-branches it already made). Open with
        ``PartitionedTable(spark, path, branch=name)``; stage applies;
        ``publish_branch``/``drop_branch`` from a main-opened router.
        Single-writer assumption, like every maintenance surface here."""
        assert self.branch == "main", "create branches from a main handle"
        if not _BRANCH_NAME_RE.match(name) or name == "main":
            # validated HERE, not via the sub fan-out: a zero-partition
            # table would otherwise never check at all ('main' would alias
            # the bare global namespace; a path-y name would escape
            # _gbranches via os.path.join)
            raise ValueError(f"invalid branch name {name!r}")
        if os.path.exists(self._gbranch_file(name)):
            # duplicate check BEFORE the sub fan-out: the drop/re-fork
            # below is for CRASH leftovers only — running it under a LIVE
            # global branch would destroy its staged sub versions and
            # leave the still-live gb- cuts pointing at nothing
            raise ValueError(f"global branch {name!r} already exists")
        head = self.latest_version()
        if head is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        man = self.manifest()
        handles = [self._sub(p) for p in sorted(man["parts"])]
        if self.cross_partition_upsert:
            idx = self._index(create=True)
            if idx.exists():
                handles.append(idx)
        for h in handles:
            if any(b["name"] == name for b in h.branches()):
                # leftover of a crashed global create (re-run, harmless —
                # nothing staged yet) OR of a crashed global drop (stale
                # staging from a previous incarnation): drop and re-fork
                # fresh so the new global branch can never resurrect it
                h.drop_branch(name)
            h.create_branch(name)
        meta = {"name": name, "forked_at": head, "created_ts": time.time()}
        self._write_meta_exclusive(
            self._gbranches_dir(), name, meta, "global branch"
        )
        return meta

    def publish_branch(self, name: str) -> dict:
        """Atomically fast-forward main to the branch's global head: each
        partition the branch cut pins publishes its own sub-branch (the
        flat squash — exactly-once state, feed union, crash recovery all
        inherited), then ONE global commit pins the published sub-versions
        as the new main cut, then the global pointer drops. Declines with
        ``BranchDivergedError`` if global main advanced past the fork.
        Crash anywhere re-runs to convergence: already-published
        sub-branches are recognized by their own recovery (or are simply
        gone and their main head is adopted), a lost global commit is
        recomputed, and a committed-but-undropped pointer is detected by
        the publish marker on main's head."""
        assert self.branch == "main", "publish from a main handle"
        meta = self._gbranch_meta(name)
        fork = meta["forked_at"]
        head = self.latest_version()
        names = os.listdir(self._ledger)
        bvs = sorted(self._gbranch_vfile_versions(names, name))
        if head != fork:
            if head == fork + 1:
                hm = self.manifest(head).get("metrics", {})
                if hm.get("from_branch") == name and (
                    not bvs or hm.get("branch_head") == bvs[-1]
                ):
                    # crash-window recovery: squash already on main, only
                    # the pointer drop was lost — finish idempotently
                    self.drop_branch(name)
                    return {**hm, "published_version": head,
                            "recovered": True}
            raise BranchDivergedError(
                f"global main is at {head} but branch {name!r} forked at "
                f"{fork}; fast-forward publish would discard main commits"
            )
        if not bvs:  # nothing staged: publishing is just dropping the fork
            self.drop_branch(name)
            return {"published_version": None, "branch_versions": 0,
                    "from_branch": name}
        with open(os.path.join(
            self._ledger, self._gvfile_name(bvs[-1], name)
        )) as fh:
            bman = json.load(fh)
        per_part = {}
        for p in sorted(bman["parts"]):
            sub = self._sub(p)  # main handle (router is main-opened)
            if any(b["name"] == name for b in sub.branches()):
                per_part[p] = sub.publish_branch(name)
            # else: already published by an earlier crashed run (its
            # recovery dropped the sub pointer) — adopt the main head
        if self.cross_partition_upsert:
            idx = self._index()
            if idx.exists() and any(
                b["name"] == name for b in idx.branches()
            ):
                idx.publish_branch(name)
        base = self.manifest()  # the fork cut (head == fork checked above)
        parts = {
            p: self._sub(p).latest_version()
            for p in sorted(set(base["parts"]) | set(bman["parts"]))
        }
        metrics = {
            "from_branch": name,
            "branch_head": bvs[-1],
            "published_parts": sorted(per_part),
        }
        try:
            self._commit_global({
                "format_version": 1,
                "version": fork + 1,
                "op": "publish",
                "batch_id": None,
                # exactly-once replay state survives the publish, like the
                # flat squash
                "last_batch_id": max(
                    bman["last_batch_id"], base["last_batch_id"]
                ),
                "parts": parts,
                "metrics": metrics,
                "commit_ts": time.time(),
            })
        except RuntimeError as e:
            # flat-table parity: a concurrent main commit taking fork+1 is
            # divergence, not an internal error. NOTE the sub squashes
            # above already fast-forwarded sub-table main heads — publish
            # is a maintenance op under the single-writer assumption, and
            # a racer here means that assumption was violated; the typed
            # error names the repair (rollback or re-publish after review)
            raise BranchDivergedError(
                f"global main advanced to version {fork + 1} during "
                f"publish of {name!r}; per-partition squashes already "
                "landed on sub-table mains — the single-writer assumption "
                "was violated; review the racer's commit, then roll the "
                "affected sub-tables back or re-stage"
            ) from e
        self.drop_branch(name)
        self._subs.clear()  # cached branch-era sub handles are stale
        return {**metrics, "published_version": fork + 1,
                "branch_versions": len(bvs)}

    def drop_branch(self, name: str) -> dict:
        """Abandon a global staging branch: global pointer first (new
        branch commits refused from that instant), then its global cut
        files, then each sub-table's branch (tolerating ones a crashed
        publish already dropped)."""
        assert self.branch == "main", "drop branches from a main handle"
        self._gbranch_meta(name)  # typed error if it never existed
        os.unlink(self._gbranch_file(name))
        removed = 0
        for bv in self._gbranch_vfile_versions(
            os.listdir(self._ledger), name
        ):
            os.remove(os.path.join(self._ledger, self._gvfile_name(bv, name)))
            removed += 1
        dropped_subs = []
        targets = []
        for p in self._live_parts():
            try:
                targets.append(self._sub(p))
            except PartitionRetentionError:
                # crash-leftover dir with no committed sub version (a
                # branch apply died inside create()) — nothing to drop;
                # expire_snapshots sweeps the dir
                continue
        if self.cross_partition_upsert:
            idx = self._index()
            if idx.exists():
                targets.append(idx)
        for sub in targets:
            try:
                sub.drop_branch(name)
                dropped_subs.append(os.path.basename(sub.path))
            except LookupError:
                pass
        return {"dropped": name, "removed_global_versions": removed,
                "dropped_sub_branches": dropped_subs}

    def tag(self, name: str, version: int | None = None) -> dict:
        """Immutable GLOBAL tag at ``version`` (default: head). Tagged
        cuts — and every sub-version they pin — survive
        ``expire_snapshots`` until the tag is deleted."""
        assert self.branch == "main", "tag from a main handle"
        if not _BRANCH_NAME_RE.match(name):
            raise ValueError(f"invalid tag name {name!r}")
        v = self.latest_version() if version is None else version
        if v is None or v not in self._versions():
            raise LookupError(f"no global version {v} to tag at {self.path}")
        meta = {"name": name, "version": v, "created_ts": time.time()}
        self._write_meta_exclusive(self._gtags_dir(), name, meta, "tag")
        return meta

    def tags(self) -> list[dict]:
        d = self._gtags_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for f in sorted(os.listdir(d)):
            if f.endswith(".json") and not f.startswith("_tmp-"):
                with open(os.path.join(d, f)) as fh:
                    out.append(json.load(fh))
        return out

    def tag_version(self, name: str) -> int:
        try:
            with open(os.path.join(self._gtags_dir(), f"{name}.json")) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            raise LookupError(
                f"tag {name!r} does not exist at {self.path}"
            ) from None

    def read_tag(self, name: str) -> DataFrame:
        return self.read(version=self.tag_version(name))

    def delete_tag(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self._gtags_dir(), f"{name}.json"))
        except FileNotFoundError:
            raise LookupError(
                f"tag {name!r} does not exist at {self.path}"
            ) from None

    # ------------------------------------ cross-partition upsert index
    def _index(self, create: bool = False) -> LakeTable:
        """The global key→partition index: itself a flat ``LakeTable`` at
        ``<path>/_index`` keyed by the table's key columns with one payload
        column ``part`` (the key's home partition). Flat-table machinery is
        reused wholesale: bucket-pruned probes, the single-shuffle MERGE for
        maintenance, the batch ledger for exactly-once, LWW-by-seq so
        cross-batch ordering needs no extra bookkeeping."""
        idx = self._idx
        if idx is not None:
            return idx
        kw = dict(
            key_cols=self.key_cols,
            bucket_col=self._lake_kwargs.get("bucket_col", "conv_id"),
            num_buckets=self.index_buckets,
            merge_mode="mor",
            stats_cols=(),
        )
        main_idx = LakeTable(
            self.spark, os.path.join(self.path, "_index"), **kw
        )
        if not main_idx.exists():
            if not create:
                # uncached non-existent probe handle: a later create call
                # must still run the full main-create + branch dance
                return main_idx
            spec_schema = schema_from_json(self._load_spec()["schema"])
            try:
                main_idx.create(
                    T.StructType(
                        [spec_schema[c] for c in self.key_cols]
                        + [T.StructField("part", T.StringType(), True)]
                    )
                )
            except RuntimeError:
                # a concurrent writer won the index's v0 — losing the
                # CREATE race is fine, the schema is deterministic; adopt
                if not main_idx.exists():
                    raise
        idx = main_idx
        if self.branch != "main":
            # the index rides the same branch namespace as the data:
            # branch-staged moves must not leak routing into main
            if not any(
                b["name"] == self.branch for b in main_idx.branches()
            ):
                main_idx.create_branch(self.branch)
            idx = LakeTable(
                self.spark, os.path.join(self.path, "_index"),
                branch=self.branch, **kw,
            )
        self._idx = idx
        return idx

    def _route_cross_partition(
        self, ev: DataFrame, valid_homes: set
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Re-route one change batch so the key — not ``(partition, key)``
        — is row identity (the Paimon ``cross-partition-upsert`` dynamic-
        bucket rule). Returns ``(routed events, index change events,
        persisted intermediate to unpersist after the index apply)``.

        Plan shape per batch: ONE hash aggregate collapses the batch to
        its per-key winner (same map-side ``max_by`` as in-batch dedup —
        sound because the engine's merge is LWW-by-seq, so non-winners
        can never affect final state in ANY partition), one bucket-pruned
        read of the touched index buckets (bounded by ``index_buckets``
        manifest entries — never an O(index) scan), one join on the key,
        then a single projection + explode classifies every key:

        * new key → upsert to its derived partition, index gains the entry;
        * home == derived → plain upsert, index untouched;
        * MOVER (home differs) → upsert to the derived partition PLUS a
          synthesized ``D`` at the old home carrying the winner's seq —
          downstream feed consumers see the move as delete+insert, the
          retract form replication already understands;
        * incoming ``D`` → routed to the HOME partition (its own ts may
          derive a partition the key never lived in), index entry killed.

        Homes pointing outside ``valid_homes`` (the latest global cut's
        partitions — entries staled by ``drop_partition``, or by the
        crash window where a sub-apply committed but the global cut did
        not) are treated as absent: the key re-routes like an insert, and
        a replayed batch converges because every sub-table's own batch
        ledger skips what already landed (a replay after the index commit
        may route a ``D`` winner to its derived partition instead of the
        already-deleted home — a no-op tombstone, never divergence)."""
        keys = list(self.key_cols)
        idx = self._index(create=True)
        # null-key rows are unroutable (no identity to look up) and must
        # reach the sub-apply UNCOLLAPSED so its quarantine counts them —
        # bypass straight through at their derived partition
        null_key = None
        for k in keys:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        bypass = ev.filter(null_key)
        win = latest_per_key(ev.filter(~null_key), keys, "seq")
        man_idx = idx.manifest()
        if man_idx["buckets"]:
            # bucket pruning is ADAPTIVE on the index's own size (round 5,
            # the steady-probe-tax cut): the manifest's per-bucket row
            # counts tell the driver — for free — how big a full index
            # read would be. Below the threshold, reading every bucket is
            # cheaper than the touched-bucket discovery job (a full
            # column-pruned scan + distinct over the BATCH, ~0.7 s on a
            # 125k-row steady micro-batch), so the probe costs zero extra
            # jobs; past it (a 10^10-key table's index), the discovery
            # job is noise next to an O(index) scan and pruning wins.
            idx_rows = 0
            for e in idx._mor_buckets(man_idx["buckets"]).values():
                for fs in idx._bucket_files(e):
                    r = fs.get("rows")
                    if r is None:  # unknown size → be conservative: prune
                        idx_rows = None
                        break
                    idx_rows += r
                if idx_rows is None:
                    break
            if idx_rows is not None and idx_rows <= _ROUTE_FULL_INDEX_ROWS:
                needed = None  # read the whole (small) index, no job
            else:
                # touched-bucket discovery over the RAW events, not the
                # winner collapse: winners' keys ⊆ batch keys and every
                # batch key has a winner, so the distinct bucket sets are
                # identical — while the raw-side plan is a column-pruned
                # scan + partial distinct with NO hash aggregate (the
                # collapse-side variant paid a max_by collapse before the
                # distinct, measured ~2x this job's cost)
                needed = sorted(
                    r["_b"]
                    for r in ev.filter(~null_key)
                    .select(
                        _bucket_expr(
                            idx.bucket_col, idx.num_buckets, idx.bucket_fn
                        ).alias("_b")
                    )
                    .distinct()
                    .collect()
                )
            stored = idx._resolve_lww(idx._read_raw(man_idx, buckets=needed))
            live_idx = stored.filter(~F.col(DELETED_COL)).select(
                *keys, F.col("part").alias("_home")
            )
            routed = win.join(live_idx, keys, "left")
        else:
            routed = win.withColumn("_home", F.lit(None).cast("string"))
        if valid_homes:
            routed = routed.withColumn(
                "_home",
                F.when(
                    F.col("_home").isin(*sorted(valid_homes)), F.col("_home")
                ),
            )
        else:
            routed = routed.withColumn("_home", F.lit(None).cast("string"))
        # both consumers (routed events + index events) read this frame;
        # O(batch keys), cheap to cache — without it the index probe join
        # runs twice per batch
        routed = routed.persist()
        is_d = F.col("op") == F.lit("D")
        mover = (
            (~is_d)
            & F.col("_home").isNotNull()
            & (F.col("_home") != F.col("_part"))
        )
        one = F.array(
            F.struct(
                F.when(is_d, F.coalesce("_home", "_part"))
                .otherwise(F.col("_part"))
                .alias("p"),
                F.col("op").alias("o"),
            )
        )
        two = F.array(
            F.struct(F.col("_part").alias("p"), F.col("op").alias("o")),
            F.struct(F.col("_home").alias("p"), F.lit("D").alias("o")),
        )
        carry = [c for c in ev.columns if c not in ("op", "_part")]
        routed_ev = (
            routed.withColumn("_r", F.when(mover, two).otherwise(one))
            .select(*carry, F.explode("_r").alias("_r"))
            .select(
                *carry,
                F.col("_r.o").alias("op"),
                F.col("_r.p").alias("_part"),
            )
            .unionByName(bypass.select(*carry, "op", "_part"))
        )
        idx_ev = routed.filter(
            (is_d & F.col("_home").isNotNull())
            | (
                (~is_d)
                & (F.col("_home").isNull() | (F.col("_home") != F.col("_part")))
            )
        ).select(
            F.when(is_d, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("seq"),
            *keys,
            F.col("_part").alias("part"),
        )
        return routed_ev, idx_ev, [routed]

    # --------------------------------------------------------------- DDL
    def create(self, schema: T.StructType) -> None:
        assert self.branch == "main", "create from a main handle"
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
                    "cross_partition_upsert": self.cross_partition_upsert,
                    "schema": schema.json(),
                    # write strategy recorded at CREATE (round 4):
                    # partitions born through library-less writers (the
                    # native lake sink) must come up at the owner's
                    # layout AND merge semantics, never a constructor
                    # default (a wrong merge_engine in a partition's
                    # manifest is adopted forever); rebucket() re-records
                    # the layout
                    "num_buckets": self._lake_kwargs.get("num_buckets", 32),
                    "bucket_fn": self._lake_kwargs.get(
                        "bucket_fn", "hash32"
                    ),
                    "bucket_col": self._lake_kwargs.get(
                        "bucket_col", "conv_id"
                    ),
                    "merge_engine": self._lake_kwargs.get(
                        "merge_engine", "lww"
                    ),
                    "agg_spec": self._lake_kwargs.get("agg_spec") or {},
                    # partition strings derive under the session tz; a
                    # library-less writer must format under the SAME zone
                    # or boundary events split across months
                    "session_tz": self.spark.conf.get(
                        "spark.sql.session.timeZone", "UTC"
                    ),
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
                "spec": self._load_spec(),
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
        # the spec file is SHARED across branches — a branch-scoped DDL
        # would silently alter main's contract for future partitions
        assert self.branch == "main", "run DDL on a main-opened table"
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

    # ---------------------------------------------------- fused apply
    @staticmethod
    def _sub_sig(s: LakeTable, m: dict):
        """Schema-signature of one sub-table: everything the fused
        collapse+write job's semantics depend on — canonical schema,
        rename log, historical (dropped) names, CHECK constraints, bucket
        layout, merge engine + agg spec (manifest-adopted per sub: a
        mixed-engine table must collapse each group with ITS engine,
        never another's). Subs agreeing share one job."""
        canon = s._canonical_schema(m)
        renamed = tuple(sorted(
            (r["old"], r["new"]) for r in m.get("renames", [])
            if r["old"] not in canon.fieldNames()
        ))
        historical = tuple(sorted({
            n
            for sj in m["schemas"]
            for n in schema_from_json(sj).fieldNames()
            if n not in canon.fieldNames()
        }))
        cons = tuple(
            (c["name"], c["expr"]) for c in m.get("constraints", [])
        )
        return (canon.json(), renamed, historical, cons,
                s.num_buckets, s.bucket_fn, s.bucket_col,
                s.merge_engine, json.dumps(s.agg_spec or {},
                                           sort_keys=True))

    def _stage_first_ctx(self, man: dict, batch_id: int | None):
        """Driver-side eligibility check for the STAGE-FIRST fused apply
        (round 5): when every existing partition is merge-on-read and
        shares ONE schema signature — the steady state of a production
        table, where partitions only diverge transiently around implicit
        evolution — the router can skip the partition-DISCOVERY job (a
        full column-pruned scan of the batch, measured ~15-20% of the
        routed wall at the 4M-row backfill shape) entirely: run the one
        collapse+write job over the whole batch and discover the touched
        partitions from the staged directory layout afterwards,
        driver-side.

        The check reads the GLOBAL manifest's partition list plus each
        existing partition's manifest — O(partitions) driver-side JSON
        reads (no Spark job), vs the O(batch-scan) discovery job it
        replaces; sub handles are cached on the router, so a replay loop
        pays only the manifest re-reads. Returns a ctx dict, or None →
        the caller falls back to the discovery-based path. Ineligible:
        branch handles (branch fan-out creates sub-branches lazily),
        empty tables (first batch pays one discovery on zero data),
        non-MoR strategy, divergent signatures, spec constraints that
        differ from the common signature's (a new partition born mid-
        batch would install different CHECKs than the staged job
        enforced), and replays where any sub-ledger already carries
        ``batch_id`` (staging data a commit will discard wastes the whole
        write; the legacy path excludes committed partitions before
        staging)."""
        if self.branch != "main":
            return None
        if self._lake_kwargs.get("merge_mode") != "mor":
            return None
        parts = sorted(man["parts"])
        spec = self._load_spec()
        if not parts:
            # EMPTY table (first batch / bootstrap): every partition the
            # batch touches is new-born at the spec schema, so the common
            # signature IS the spec's — collapse under a VIRTUAL sub
            # handle (never created on disk; only its config attributes
            # and schema methods are used) and a synthetic manifest. The
            # bootstrap benefits most: all partitions load in ONE job.
            g0 = LakeTable(
                self.spark,
                self._part_dir("__virtual__"),
                key_cols=self.key_cols,
                **self._sub_kwargs(),
            )
            man0 = {
                "schemas": [
                    schema_from_json(spec["schema"]).json()
                ],
                "renames": [],
                "constraints": list(spec.get("constraints", [])),
            }
            return {"subs": {}, "mans": {}, "g0": g0, "man0": man0,
                    "spec": spec, "sig": None}
        subs, mans = {}, {}
        for p in parts:
            sub = self._sub(p)
            if sub.merge_mode != "mor":
                return None
            m = sub.manifest()
            if batch_id is not None and batch_id <= m["last_batch_id"]:
                return None
            subs[p], mans[p] = sub, m
        sigs = {self._sub_sig(subs[p], mans[p]) for p in parts}
        if len(sigs) > 1:
            return None
        sig = next(iter(sigs))
        spec_cons = tuple(
            (c["name"], c["expr"]) for c in spec.get("constraints", [])
        )
        if spec_cons != sig[3]:
            return None
        p0 = parts[0]
        return {"subs": subs, "mans": mans, "g0": subs[p0],
                "man0": mans[p0], "spec": spec, "sig": sig}

    def _fused_eligible(self, parts: list, subs: dict) -> bool:
        """The fused batch path applies when every touched sub-table is
        merge-on-read: the batch's collapse/projection/write runs as ONE
        Spark job partitioned by (partition, bucket) and each sub-table
        commits its pre-written delta slice driver-side — amortizing the
        per-sub fixed costs (plan, shuffle, write job, Arrow spin-up) that
        made the routed replay ~2x the flat replay at 12 partitions.
        Copy-on-write subs need the union-with-base merge per table and
        keep the per-sub path; single-partition batches ARE the flat cost
        already."""
        if len(parts) <= 1:
            return False
        return all(subs[p].merge_mode == "mor" for p in parts)

    def _fused_changes(
        self,
        g_raw: DataFrame,
        g0: LakeTable,
        man0: dict,
        n_shuffle: int,
        skip_collapse: bool,
    ) -> tuple[DataFrame, T.StructType, bool]:
        """One signature group's collapse → evolve → project → CHECK-guard
        plan, shared by the discovery-based fused apply and the
        stage-first path: assign ``_bucket``, hash-repartition on the
        (``_part``, ``_bucket``) pair (THE one shuffle — the pair
        partitioning satisfies the collapse's clustering requirement AND
        task-aligns the partitioned write), collapse per key with the
        group's merge engine, project to the evolved canonical shape and
        fold the CHECK constraints into ``_bucket`` (same inline-guard
        trick as the flat apply's step 4b). Returns
        ``(changes, canon, evolved)`` — write-ready rows carrying
        (``_part``, ``_bucket``), the evolved canonical schema, and
        whether the batch extended the group's schema list."""
        from ..operators.dedup import (
            first_per_key,
            resolve_aggregate,
            resolve_partial_update,
        )

        g_b = g_raw.withColumn(
            "_bucket",
            _bucket_expr(g0.bucket_col, g0.num_buckets, g0.bucket_fn),
        ).repartition(n_shuffle, "_part", "_bucket")
        keys = ("_part", "_bucket", *self.key_cols)
        if skip_collapse:
            # the cross-partition router already collapsed the
            # batch to ONE winner per key and exploded movers
            # into distinct (part, key) rows — a second collapse
            # would aggregate singleton groups (measured ~half
            # the routed steady-state tax). Rare residual dupes
            # (null-key bypass rows with no quarantine sink)
            # resolve at read time like any delta chain.
            batch = g_b
        elif g0.merge_engine == "partial_update":
            batch = resolve_partial_update(
                g_b, keys, "seq", "op", preserve_kill=True
            )
        elif g0.merge_engine == "aggregate":
            batch = resolve_aggregate(
                g0._refuse_deletes_inline(
                    g_b,
                    "merge_engine='aggregate' refuses delete events"
                    " (aggregates are not retractable)",
                ),
                keys, "seq", "op", spec=g0.agg_spec,
            )
        elif g0.merge_engine == "first_row":
            batch = first_per_key(
                g0._refuse_deletes_inline(
                    g_b,
                    "merge_engine='first_row' refuses delete events"
                    " (the first write per key is immutable)",
                ),
                keys, "seq",
            )
        else:
            batch = latest_per_key(g_b, keys, "seq")
        payload_schema = T.StructType([
            f for f in batch.schema.fields
            if f.name not in ("_part", "_bucket")
        ])
        schemas0, canon = g0._evolved_schemas(man0, payload_schema)
        evolved = len(schemas0) > len(man0["schemas"])
        # target-shape projection + CHECK guard — the same
        # step-4/4b shape as the flat apply (lake.py), with _part
        # and _bucket carried through for the partitioned write
        is_del = F.col("op") == "D"
        proj = [F.col("_part"), F.col("_bucket")]
        for f in canon.fields:
            if f.name in batch.columns:
                c = F.col(f.name).cast(f.dataType)
                if f.name not in self.key_cols:
                    c = F.when(
                        is_del, F.lit(None).cast(f.dataType)
                    ).otherwise(c)
                proj.append(c.alias(f.name))
            else:
                proj.append(
                    F.lit(None).cast(f.dataType).alias(f.name)
                )
        proj.append(F.col("seq").cast("long").alias(SEQ_COL))
        proj.append(is_del.alias(DELETED_COL))
        changes = batch.select(proj)
        cons = man0.get("constraints", [])
        if cons:
            viol = [
                ~F.col(DELETED_COL)
                & ~F.coalesce(F.expr(c["expr"]), F.lit(True))
                for c in cons
            ]
            any_bad = viol[0]
            for v in viol[1:]:
                any_bad = any_bad | v
            named = F.concat_ws(
                ", ",
                *[F.when(v, F.lit(c["name"]))
                  for v, c in zip(viol, cons)],
            )
            changes = changes.withColumn(
                "_bucket",
                F.when(
                    any_bad,
                    F.raise_error(
                        F.concat(
                            F.lit("CHECK constraint violated ["),
                            named,
                            F.lit("] by row key=("),
                            F.concat_ws(
                                ",",
                                *[F.col(k).cast("string")
                                  for k in self.key_cols],
                            ),
                            F.lit(")"),
                        )
                    ).cast("int"),
                ).otherwise(F.col("_bucket")),
            )
        return changes, canon, evolved

    def _staged_write_commit(
        self, changes: DataFrame, g0: LakeTable, one,
        parts: list | None = None, phases: dict | None = None,
    ):
        """Shared staged-write tail of BOTH fused applies (legacy
        signature-group and stage-first): write the collapsed batch as
        ONE ``partitionBy(_part, _bucket)`` job into router staging,
        resolve the touched partition list (the caller's signature group,
        or — stage-first — discovered from the staged ``_part=X/``
        layout by a driver ``listdir``), fan the per-partition
        ``one(part, staged_dir)`` commits across threads, and always
        tear the staging dir down. The per-sub commits are driver-side
        IO (footer stats + manifest write + ledger link) with only the
        occasional compaction Spark job, so the fan-out runs wider than
        ``apply_concurrency`` (which sizes whole-apply Spark-job
        concurrency on the legacy per-sub path). Returns
        ``({part: commit_result}, parts)``."""
        from concurrent.futures import ThreadPoolExecutor

        staging_root = os.path.join(self.path, "_staging")
        staged = os.path.join(staging_root, f"fused-{uuid4().hex[:8]}")
        try:
            tw = time.monotonic()
            (
                g0._capped(
                    changes.write.partitionBy("_part", "_bucket")
                    .mode("overwrite")
                ).parquet(staged)
            )
            if phases is not None:
                phases["stage_write_sec"] = round(
                    phases.get("stage_write_sec", 0.0)
                    + (time.monotonic() - tw), 3
                )
            if parts is None:
                parts = sorted(
                    d.split("=", 1)[1]
                    for d in os.listdir(staged)
                    if d.startswith("_part=")
                )
            width = min(16, max(self.apply_concurrency, len(parts)))
            tc = time.monotonic()
            if len(parts) <= 1 or self.apply_concurrency == 1:
                out = dict(one(p, staged) for p in parts)
            else:
                with ThreadPoolExecutor(width) as ex:
                    out = dict(ex.map(lambda p: one(p, staged), parts))
            if phases is not None:
                phases["commit_fanout_sec"] = round(
                    phases.get("commit_fanout_sec", 0.0)
                    + (time.monotonic() - tc), 3
                )
            return out, parts
        finally:
            shutil.rmtree(staged, ignore_errors=True)
            try:  # concurrent writer may repopulate it (TOCTOU)
                os.rmdir(staging_root)
            except OSError:
                pass

    def _apply_fused(
        self,
        ev: DataFrame,
        parts: list,
        subs: dict,
        batch_id: int | None,
        src: str | None,
        t0: float,
        skip_collapse: bool = False,
        phases: dict | None = None,
    ) -> dict:
        """ONE-job, ONE-shuffle multi-partition MoR apply (the round-4
        routing-tax cut):

        assign ``_bucket`` up front, hash-repartition on the
        (``_part``, ``_bucket``) pair, collapse per key with the
        sub-tables' merge engine, project/constraint-guard, and write it
        all in a single ``partitionBy(_part, _bucket)`` job into router
        staging — then MOVE each ``_part`` directory into its sub-table
        and commit the deltas driver-side from parquet footer metadata
        (``LakeTable.commit_prewritten_mor_deltas``). Per-sub Spark work
        drops from P jobs (P plans + P shuffles + P writes) to one job
        plus O(P) threaded driver-side manifest commits; inline compaction
        and typed-changelog emission still run per-sub inside the commit
        when due.

        The single-shuffle trick is the flat apply's, lifted to the pair:
        ``_bucket`` is a pure function of the bucket key column, so adding
        it to the collapse's grouping keys changes NO groups while making
        the pre-collapse hash partitioning on (``_part``, ``_bucket``)
        satisfy the aggregate's clustering requirement — no second
        exchange — AND land every (partition, bucket) pair whole in one
        task, so the partitioned write emits exactly one file per
        directory without a write-side repartition.

        Exactly-once composes unchanged: parts whose sub-ledger already
        carries ``batch_id`` are excluded BEFORE staging, and a crash
        between sub-commits replays to convergence through the per-sub
        batch ledgers (identical to the threaded path's guarantee).

        Schema-signature groups: evolution must see each sub's canonical
        schema, rename log, historical (dropped) names, CHECK constraints
        and bucket layout — subs agreeing share one collapse+write job;
        divergent subs (possible after per-partition implicit evolution or
        a partial rebucket) get their own group: one job per GROUP, never
        per partition."""
        from collections import defaultdict

        from .lake import _apply_conf_scope

        # per-sub manifests (driver JSON): ledger skip + signature grouping
        mans = {p: subs[p].manifest() for p in parts}
        skipped = {
            p: {"skipped": True, "batch_id": batch_id,
                "reason": "already committed"}
            for p in parts
            if batch_id is not None and batch_id <= mans[p]["last_batch_id"]
        }
        live = [p for p in parts if p not in skipped]
        if not live:
            return skipped

        groups: dict = defaultdict(list)
        for p in live:
            groups[self._sub_sig(subs[p], mans[p])].append(p)

        per_part: dict = dict(skipped)
        if phases is not None:
            phases["n_groups"] = len(groups)
        with _apply_conf_scope(self.spark):
            for sig, group_parts in sorted(groups.items()):
                g0 = subs[group_parts[0]]
                man0 = mans[group_parts[0]]
                g_raw = (
                    ev
                    if len(groups) == 1 and not skipped
                    # replays with already-committed partitions must not
                    # stage (collapse + write) data they will discard
                    else ev.filter(F.col("_part").isin(group_parts))
                )
                # THE one shuffle: bucket assignment + pair repartition
                # BEFORE the collapse (see docstring)
                n_shuffle = min(
                    len(group_parts) * g0.num_buckets,
                    max(64, self.spark.sparkContext.defaultParallelism * 4),
                )
                changes, canon, evolved = self._fused_changes(
                    g_raw, g0, man0, n_shuffle, skip_collapse
                )
                def _one(p: str, staged: str):
                    sub, man_p = subs[p], mans[p]
                    part_dir = os.path.join(staged, f"_part={p}")
                    if not os.path.isdir(part_dir):
                        # collapse cannot drop a part that had rows;
                        # belt-and-braces: commit an empty batch so
                        # the sub-ledger still records batch_id
                        return p, sub.apply_changes(
                            ev.filter(F.col("_part") == p)
                            .drop("_part").limit(0),
                            batch_id=batch_id, source=src,
                        )
                    data_rel = (
                        f"data/v{man_p['version'] + 1:08d}"
                        f"-{uuid4().hex[:8]}"
                    )
                    dst = os.path.join(sub.path, data_rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(part_dir, dst)
                    schemas_p = list(man_p["schemas"]) + (
                        [canon.json()] if evolved else []
                    )
                    return p, sub.commit_prewritten_mor_deltas(
                        data_rel, batch_id=batch_id, source=src,
                        schemas=schemas_p, t0=t0,
                    )

                res, _ = self._staged_write_commit(
                    changes, g0, _one, parts=group_parts, phases=phases
                )
                per_part.update(res)
        return per_part

    def _apply_fused_stage_first(
        self,
        ev: DataFrame,
        ctx: dict,
        batch_id: int | None,
        src: str | None,
        t0: float,
        skip_collapse: bool = False,
        phases: dict | None = None,
    ):
        """STAGE-FIRST fused apply (round 5): the single-signature fast
        path that removes the partition-discovery job from the routed
        replay's critical path. ``_stage_first_ctx`` proved (driver-side,
        from manifests alone) that every existing partition is MoR with
        one common signature, so the whole batch can run through ONE
        collapse+write job under that signature WITHOUT first scanning
        for which partitions it touches — the touched set falls out of
        the staged directory layout (``_part=X/``) afterwards, a driver
        ``listdir``. vs the discovery path this saves one full
        column-pruned pass over the batch (~15-20% of the routed wall at
        the 4M-row backfill shape) and one Spark job's scheduling
        latency on every steady-state micro-batch.

        Partitions NEW to the table are created at the spec schema
        mid-fan-out and committed with the chain
        ``[spec(, canon)]`` — legal because the pre-write compat check
        below proved spec ⊆ canon with equal types (so the staged files,
        projected to ``canon``, are a valid one-step evolution of a
        spec-born partition). If that check fails (a spec column the
        batch's canonical shape lost), returns None BEFORE any write and
        the caller falls back to the discovery path.

        Exactly-once: the ctx proved no sub-ledger carries ``batch_id``
        at plan time; a CONCURRENT writer committing it between then and
        our per-sub commit is caught by ``commit_prewritten_mor_deltas``'s
        own ledger check (the moved files become unreferenced garbage for
        fsck, the same exposure the legacy path documents). A crash
        mid-fan-out replays through ``_stage_first_ctx``'s replay check →
        legacy path → per-sub ledgers dedupe, converging identically.

        Shuffle sizing: the touched-pair count is unknown pre-write, but
        ``existing partitions × num_buckets`` bounds it from above for
        any batch that stays inside the known layout, and slots beyond
        the possible pair count are pure scheduling waste — measured
        ~20% of the stage-write wall on a 125k-row batch over a
        12-month × 8-bucket table (128 vs 96 slots: 1.48 s vs 1.17 s).
        So the width is that bound clamped to [defaultParallelism,
        max(64, defaultParallelism*4)]. Partitions BORN this batch push
        the true pair count past the bound; colliding those extra pairs
        onto shared tasks is correctness-neutral (``partitionBy`` still
        writes one file per directory per task) and only matters for
        parallelism when a batch births many partitions at once — the
        empty-table bootstrap, which keeps the uncapped width because
        ``subs`` is empty there."""
        from .lake import _apply_conf_scope

        g0, man0, spec = ctx["g0"], ctx["man0"], ctx["spec"]
        subs, mans = dict(ctx["subs"]), ctx["mans"]
        dp = self.spark.sparkContext.defaultParallelism
        n_shuffle = max(64, dp * 4)
        if subs:
            n_shuffle = min(
                n_shuffle, max(dp, len(subs) * g0.num_buckets)
            )
        with _apply_conf_scope(self.spark):
            changes, canon, evolved = self._fused_changes(
                ev, g0, man0, n_shuffle, skip_collapse
            )
            # new-partition chain legality, BEFORE any write: a partition
            # born this batch starts at spec and jumps to canon in one
            # evolution step — only valid if canon kept every spec column
            # at its type
            canon_types = {f.name: f.dataType for f in canon.fields}
            spec_schema = schema_from_json(spec["schema"])
            if any(
                f.name not in canon_types
                or canon_types[f.name] != f.dataType
                for f in spec_schema.fields
            ):
                return None
            if phases is not None:
                phases["stage_first"] = True

            def _one(p: str, staged: str):
                part_dir = os.path.join(staged, f"_part={p}")
                sub = subs.get(p)
                if sub is None:
                    # partition born this batch: create at spec (the
                    # _sub machinery installs spec constraints), then
                    # commit the canon-shaped files as its first
                    # evolution step
                    sub = self._sub(p, create=True)
                    man_p = sub.manifest()
                else:
                    man_p = mans[p]
                data_rel = (
                    f"data/v{man_p['version'] + 1:08d}"
                    f"-{uuid4().hex[:8]}"
                )
                dst = os.path.join(sub.path, data_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(part_dir, dst)
                schemas_p = list(man_p["schemas"])
                if schemas_p[-1] != canon.json():
                    schemas_p = schemas_p + [canon.json()]
                return p, sub.commit_prewritten_mor_deltas(
                    data_rel, batch_id=batch_id, source=src,
                    schemas=schemas_p, t0=t0,
                )

            per_part, parts = self._staged_write_commit(
                changes, g0, _one, phases=phases
            )
        return per_part, parts

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
        source once instead of once per partition.

        The threshold trade is BYTES, proxied by partition count: below
        it, sub-applies filter the persisted batch — P cache scans, no
        extra write, measured ~2x faster than staging for a year-wide
        backfill that fits the executors' cache (250k x 13 partitions:
        5.3 s vs 10.5 s staged, flat parity). Past it, P full re-scans of
        a spilled multi-TB cache dominate and the one staged write + P
        slice reads win — the default (16) keeps steady-state CDC and
        year-scale backfills on the cache path and only multi-year
        backfills staging."""
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
        reserved = {"_part"} | (
            {"_home", "_r"} if self.cross_partition_upsert else set()
        )
        clash = sorted(reserved & set(ev.columns))
        if clash:
            # withColumn would silently overwrite the producer's column
            raise ValueError(
                f"batch carries reserved column(s) {clash} — rename"
            )
        ev = self._enforce_retired(ev)
        # dead-letter routing at ROUTER scope (see _sub_kwargs): split the
        # unmergeable null-key rows off once, before routing — the same
        # cache-then-filter single-scan shape as the flat path
        n_quarantined = 0
        q_cache = None
        qpath = self._lake_kwargs.get("quarantine_path")
        if qpath is not None:
            from pyspark.sql import Observation
            from pyspark.storagelevel import StorageLevel

            from .lake import _observed

            bad_pred = None
            for k in self.key_cols:
                p = F.col(k).isNull()
                bad_pred = p if bad_pred is None else (bad_pred | p)
            q_cache = ev.persist(StorageLevel.MEMORY_AND_DISK)
            bad = q_cache.filter(bad_pred).withColumn(
                "_quarantine_batch",
                F.lit(batch_id).cast("long"),
            )
            obs_bad = Observation()
            (
                bad.observe(obs_bad, F.count(F.lit(1)).alias("n"))
                .write.mode("append")
                .parquet(qpath)
            )
            got = _observed(obs_bad)
            n_quarantined = int(got["n"]) if got else 0
            ev = q_cache.filter(~bad_pred)
        ev = ev.withColumn("_part", self._part_expr())
        phases: dict = {}
        tp = time.monotonic()
        idx_ev = route_cache = None
        if self.cross_partition_upsert:
            if man["parts"] and not self._index().exists():
                # self-heal a missing index on a populated table (the
                # crash window between a historical clone's global commit
                # and its reindex): routing against an empty index would
                # treat every key as new and skip the mover deletes
                self.reindex()
            ev, idx_ev, route_cache = self._route_cross_partition(
                ev, set(man["parts"])
            )
            phases["route_sec"] = round(time.monotonic() - tp, 3)
        staged: str | None = None
        persisted = False
        try:
            src = source or (
                f"router:batch={batch_id}" if batch_id is not None else "router"
            )
            ta = time.monotonic()
            per_part = parts = None
            fused = False
            # stage-first fast path (round 5): when manifests alone prove
            # one common MoR signature, skip the discovery job — the one
            # fused write stages the batch and the touched partitions
            # fall out of the staged directory layout. The ctx is checked
            # BEFORE the transform-chain persist below: stage-first
            # consumes the batch exactly once, so caching it would cost a
            # pure extra materialization pass (the round-4 profiling
            # finding)
            sf_ctx = self._stage_first_ctx(man, batch_id)
            if sf_ctx is not None:
                res = self._apply_fused_stage_first(
                    ev, sf_ctx, batch_id, src, t0,
                    skip_collapse=idx_ev is not None,
                    phases=phases,
                )
                if res is not None:
                    per_part, parts = res
                    fused = True
            if per_part is None:
                # fallback (discovery) path — whether the ctx was never
                # eligible OR stage-first DECLINED late (spec-not-subset-
                # of-canon, a persistent state after dropping a spec
                # column): an expensive caller transform chain should run
                # once, not once for discovery + once per consumer.
                # Stage-first itself consumes the batch exactly once, so
                # the persist would be a pure extra materialization there
                # (the round-4 profiling finding).
                if transform is not None and q_cache is None:
                    ev.persist()
                    persisted = True
                td = time.monotonic()
                parts = sorted(
                    r[0] for r in ev.select("_part").distinct().collect()
                )
                phases["discovery_sec"] = round(time.monotonic() - td, 3)
                # handle creation (spec read + sub create() commit) stays
                # serial; the work fans out after — fused as ONE Spark job
                # for merge-on-read subs (see _apply_fused), else per-sub
                # applies on threads. _apply_conf_scope is refcounted +
                # lock-protected for exactly this interleaving.
                ts_ = time.monotonic()
                subs = {p: self._sub(p, create=True) for p in parts}
                phases["sub_handles_sec"] = round(time.monotonic() - ts_, 3)

                fused = self._fused_eligible(parts, subs)
            if per_part is None and fused:
                per_part = self._apply_fused(
                    ev, parts, subs, batch_id, src, t0,
                    skip_collapse=idx_ev is not None,
                    phases=phases,
                )
            elif per_part is None:
                if not persisted:
                    ev.persist()
                    persisted = True
                if len(parts) > self.stage_threshold:
                    staged = os.path.join(
                        self.path, "_staging", f"batch-{uuid4().hex[:8]}"
                    )
                    ev.write.partitionBy("_part").parquet(staged)
                    ev.unpersist()
                    persisted = False

                def _one(p: str):
                    slice_df = (
                        self.spark.read.parquet(
                            os.path.join(staged, f"_part={p}")
                        )
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
            # index commit comes LAST (after every sub-apply, before the
            # global cut): a crash before it replays with an unchanged
            # index → identical re-route, sub-ledgers dedupe; a crash
            # after it means every data commit already landed, so the
            # replay's (different) routing only reaches already-committed
            # sub-ledgers. Either order-crossing converges.
            phases["apply_sec"] = round(time.monotonic() - ta, 3)
            ti = time.monotonic()
            idx_metrics = None
            if idx_ev is not None:
                # steady-state cut (round 4): a batch that creates, moves
                # or deletes NO keys produces an empty index change set —
                # skip the whole index MERGE (plan + shuffle + commit)
                # instead of applying nothing. The emptiness probe is a
                # limit-1 job over the already-persisted route frame, and
                # exactly-once still converges: a replay re-routes against
                # the unchanged index and skips again.
                if idx_ev.isEmpty():
                    idx_metrics = {"skipped": True,
                                   "reason": "no index changes"}
                else:
                    idx_metrics = self._index().apply_changes(
                        idx_ev, batch_id=batch_id, source=f"{src}:index"
                    )
            if idx_ev is not None:
                phases["index_sec"] = round(time.monotonic() - ti, 3)
        finally:
            if route_cache is not None:
                for df in route_cache:
                    df.unpersist()
            if persisted:
                ev.unpersist()
            if q_cache is not None:
                q_cache.unpersist()
            if staged:
                shutil.rmtree(staged, ignore_errors=True)
                try:  # concurrent writer may repopulate it (TOCTOU)
                    os.rmdir(os.path.join(self.path, "_staging"))
                except OSError:
                    pass
        metrics = {
            "n_parts_touched": len(parts),
            "n_quarantined": n_quarantined,
            "staged": staged is not None,
            "fused": fused,
            "parts": {
                p: {
                    k: m.get(k)
                    for k in ("n_events", "skipped", "elapsed_sec")
                    if k in m
                }
                for p, m in per_part.items()
            },
            "wall_sec": round(time.monotonic() - t0, 3),
            "phases": {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in phases.items()
            },
        }
        if idx_metrics is not None:
            metrics["index"] = {
                k: idx_metrics.get(k)
                for k in ("n_events", "skipped", "elapsed_sec")
                if k in idx_metrics
            }
        # a concurrent router writer can win the global version between
        # _next_global's read and the link — the cut is pure metadata
        # (pin every partition at its CURRENT head), so rebuilding it
        # against the winner's manifest and re-linking is always safe:
        # the data commits already landed in the sub-ledgers. Bounded so
        # a pathological livelock surfaces instead of spinning.
        for attempt in range(32):
            try:
                self._commit_global(
                    self._next_global(
                        "apply", touched=parts, batch_id=batch_id,
                        metrics=metrics,
                    )
                )
                break
            except RuntimeError:
                if attempt == 31:
                    raise
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
        sub-version that global commit pinned — one consistent cut.

        Common case (round 5): ONE scan + ONE resolve for the whole
        table (``_fused_read``) instead of a union of per-partition
        plans — the per-sub shape paid P separate LWW aggregates and P
        union branches, measured 2.2-2.4x the equivalent flat table's
        read at 12 partitions (and growing with P: the cost that matters
        at a 120-month production table)."""
        man = self.manifest(version)
        fused = self._fused_read(man)
        if fused is not None:
            return fused
        return self._union(
            [self._sub(p).read(version=v) for p, v in sorted(man["parts"].items())],
            empty=lambda: self._empty_cut(man),
        )

    def _fused_read(
        self,
        man: dict,
        buckets: set | None = None,
        pre_filter=None,
        parts_subset: set | None = None,
        buckets_by_part: dict | None = None,
        mans: dict | None = None,
    ) -> DataFrame | None:
        """ONE-plan table read for the steady-state layout: every
        partition (at its pinned sub-version) stores a single-entry
        schema list with one common canonical schema, no renames, and
        the whole-row ``lww`` engine. All partitions' file sets go into
        ONE parquet scan; per-key resolution groups by
        (partition, key) — the composite identity — with the partition
        value taken from the FILE PATH (``part=<value>/``), never from
        row data: a tombstone's payload is nulled (including the
        partition column), so deriving the partition from ``ts`` would
        strand deletes in ``__null__`` and resurrect their keys.
        Returns None (→ the per-sub union path) for evolved / renamed /
        mixed-schema cuts and column-level merge engines, whose
        reconciliation is per-sub by construction."""
        def _norm(sj: str) -> str:
            # nullability-normalized schema identity: every first apply
            # legitimately relaxes the spec's non-nullable fields (Spark
            # loses nullability on createDataFrame/parquet round trips),
            # so a 2-entry chain differing ONLY in nullable flags is the
            # STEADY state, not an evolution — and all its files read
            # safely under the all-nullable shape
            s = schema_from_json(sj)
            return T.StructType(
                [T.StructField(f.name, f.dataType, True) for f in s.fields]
            ).json()

        parts = sorted(man["parts"].items())
        if parts_subset is not None:
            parts = [(p, v) for p, v in parts if p in parts_subset]
        if not parts:
            return None
        paths: list[str] = []
        canon_json = None
        needs_resolve = False
        for p, v in parts:
            sub = self._sub(p)
            if sub.merge_engine != "lww":
                return None
            # pruned callers (_fused_read_range/_fused_read_keys) already
            # materialized each pinned manifest for their driver-side
            # bucket selection — reuse instead of re-reading O(P) JSON
            m = (
                mans[p] if mans is not None and p in mans
                else sub.manifest(v)
            )
            if m.get("renames"):
                return None
            for sj in m["schemas"]:
                nj = _norm(sj)
                if canon_json is None:
                    canon_json = nj
                elif nj != canon_json:
                    return None
            per_p = (
                buckets_by_part.get(p, set())
                if buckets_by_part is not None
                else None
            )
            sel = {
                b: e for b, e in m["buckets"].items()
                if (buckets is None or int(b) in buckets)
                and (per_p is None or int(b) in per_p)
            }
            if sub._needs_resolve(list(sel.values())):
                needs_resolve = True
            for e in sub._mor_buckets(sel).values():
                for fs in sub._bucket_files(e):
                    fp = fs["path"]
                    paths.append(
                        fp if os.path.isabs(fp)
                        else os.path.join(sub.path, fp)
                    )
        if not paths:
            if (
                buckets is not None or buckets_by_part is not None
            ) and canon_json is not None:
                # bucket-pruned probe, signatures proven common, and the
                # probed buckets hold NO files anywhere: the answer is
                # the empty cut — a per-sub fallback would fan out P
                # probes to learn the same
                return self._empty_cut(man)
            return None
        canon = schema_from_json(canon_json)
        hidden = T.StructType(
            canon.fields
            + [
                T.StructField(SEQ_COL, T.LongType(), False),
                T.StructField(DELETED_COL, T.BooleanType(), False),
            ]
        )
        raw = self.spark.read.schema(hidden).parquet(*paths)
        if pre_filter is not None:
            # point-lookup probes filter BEFORE the resolve: only the
            # probed keys' rows reach the (partition, key) aggregate,
            # and the predicate pushes into the parquet scan (bloom /
            # row-group skipping)
            raw = raw.filter(pre_filter)
        if needs_resolve:
            # greedy leading .* anchors the match to the LAST part=
            # segment: the router's own sub directory. A first-match
            # pattern would let an ANCESTOR directory named part=*
            # (e.g. a warehouse rooted at /data/part=2024/) hijack every
            # row's partition value and collapse all partitions into one
            # resolve group — silently dropping same-key rows that
            # legitimately live in two partitions.
            raw = raw.withColumn(
                "_part",
                F.regexp_extract(
                    F.col("_metadata.file_path"), r"^.*/part=([^/]+)/", 1
                ),
            )
            with_op = raw.withColumn(
                "op", F.when(F.col(DELETED_COL), "D").otherwise("U")
            )
            raw = latest_per_key(
                with_op, ("_part", *self.key_cols), SEQ_COL
            ).drop("op", "_part")
        return (
            raw.filter(~F.col(DELETED_COL))
            .drop(SEQ_COL, DELETED_COL)
            .select(*canon.fieldNames())
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
        # surviving partitions scan in ONE fused plan (round 5): per-sub
        # zone-map bucket pruning stays driver-side per partition, then
        # one scan + one (partition, key) resolve + the range filter —
        # a year-wide range over a day-partitioned table had unioned
        # hundreds of per-sub plans
        fused = self._fused_read_range(man, items, lo, hi, col)
        if fused is not None:
            return fused
        return self._union(
            [self._sub(p).read_range(lo, hi, col=col, version=v)
             for p, v in items],
            empty=lambda: self._empty_cut(man),
        )

    def _fused_read_range(self, man: dict, items: list, lo, hi, col: str):
        """Fused single-signature range read over the partition-pruned
        ``items``: bounds coerced ONCE (session-tz rule shared with the
        flat table via ``_coerce_range_bounds``), each partition's zone
        maps select its buckets driver-side, and the survivors feed one
        scan/resolve with the range filter on top — semantics identical
        to the per-sub union (each sub filters after its own resolve).
        None → union fallback (mixed signatures, unknown column,
        non-lww engines)."""
        if not items:
            return None
        p0, v0 = items[0]
        sub0 = self._sub(p0)
        m0 = sub0.manifest(v0)
        if col not in sub0._canonical_schema(m0).fieldNames():
            return None
        try:
            lo_c, hi_c = sub0._coerce_range_bounds(m0, col, lo, hi)
        except (KeyError, TypeError, ValueError):
            return None
        buckets_by_part = {}
        mans = {}
        for p, v in items:
            sub = self._sub(p)
            m = mans[p] = m0 if p == p0 else sub.manifest(v)
            try:
                buckets_by_part[p] = {
                    int(b)
                    for b in sub._range_buckets(m, col, lo_c, hi_c)
                }
            except KeyError:
                return None
        df = self._fused_read(
            man,
            parts_subset={p for p, _ in items},
            buckets_by_part=buckets_by_part,
            mans=mans,
        )
        if df is None:
            return None
        return df.filter(F.col(col).between(F.lit(lo_c), F.lit(hi_c)))

    def read_keys(self, bucket_keys: list, version: int | None = None) -> DataFrame:
        """Point lookup. Without the global index this is the honest trade
        of the composite spec (module docstring): the key does not
        determine the partition, so every partition is probed — each probe
        bucket-pruned and bloom-filtered. With ``cross_partition_upsert``
        the index turns it into O(homes): one bucket-pruned index probe
        finds each key's home partition and only those partitions are
        opened. BUCKET KEYS the index surfaces nowhere fall back to the
        full fan-out (covers entries staled by ``drop_partition`` and
        conversations absent from the index wholesale) — steady state pays
        zero fallback. The fallback is bucket-key-granular: if ANY turn of
        a conversation is indexed, only the indexed homes are probed, so a
        live row whose own entry is missing (the corruption state
        ``verify_index`` reports as ``missing`` — unreachable through this
        writer, only via out-of-band sub-table writes or an index
        rollback) is not found until ``reindex`` repairs it.
        The index reflects LATEST state, so time-travel reads keep the
        fan-out. Narrow caveat (single-writer engines all share it): a
        reader racing a CRASHED, not-yet-replayed apply whose index commit
        landed ahead of the global cut may see a moved key at its new home
        only — the window closes when the replay converges."""
        man = self.manifest(version)
        parts = sorted(man["parts"].items())
        if (
            self.cross_partition_upsert
            and version is None
            and bucket_keys
            and self._index().exists()
        ):
            idx = self._index()
            pairs = (
                idx.read_keys(bucket_keys)
                .select(idx.bucket_col, "part")
                .distinct()
                .collect()
            )
            by_part: dict[str, set] = {}
            for r in pairs:
                if r["part"] in man["parts"]:
                    by_part.setdefault(r["part"], set()).add(r[idx.bucket_col])
            found = set().union(*by_part.values()) if by_part else set()
            missing = [k for k in bucket_keys if k not in found]
            # home probes ride ONE fused scan over just the home
            # partitions (round 5): correct to filter the whole found-key
            # set across homes because cross-partition identity keeps a
            # key live ONLY at its home (the mover's synthesized delete
            # tombstones the old copy, which the resolve drops)
            probes = []
            if by_part:
                fused_homes = self._fused_read_keys(
                    man, sorted(found), parts_subset=set(by_part)
                )
                if fused_homes is not None:
                    probes.append(fused_homes)
                else:
                    probes.extend(
                        self._sub(p).read_keys(
                            sorted(ks), version=man["parts"][p]
                        )
                        for p, ks in sorted(by_part.items())
                    )
            if missing:
                fused_missing = self._fused_read_keys(man, missing)
                if fused_missing is not None:
                    probes.append(fused_missing)
                else:
                    probes.extend(
                        self._sub(p).read_keys(missing, version=v)
                        for p, v in parts
                    )
            return self._union(probes, empty=lambda: self._empty_cut(man))
        # full fan-out (no index, or time travel): the FUSED probe reads
        # every partition's pruned buckets in ONE scan + ONE resolve
        # (round 5) — the per-sub union paid P key-hash jobs + P plans,
        # measured 15.8 s vs 1.1 s indexed at 36 partitions
        fused = self._fused_read_keys(man, bucket_keys)
        if fused is not None:
            return fused
        return self._union(
            [self._sub(p).read_keys(bucket_keys, version=v)
             for p, v in parts],
            empty=lambda: self._empty_cut(man),
        )

    def _fused_read_keys(
        self, man: dict, bucket_keys: list, parts_subset: set | None = None
    ):
        """One-plan probe: driver-side murmur3 bucket ids (zero Spark
        jobs) + the fused single-signature scan restricted to those
        buckets with the key predicate pushed below the resolve —
        over every partition (the no-index fan-out) or over
        ``parts_subset`` (the indexed path's home partitions). None →
        caller falls back to the per-sub union (non-hash32 layouts,
        mixed signatures, probe/key type mismatch)."""
        from .lake import _driver_bucket_ids

        parts = sorted(man["parts"].items())
        if parts_subset is not None:
            parts = [(p, v) for p, v in parts if p in parts_subset]
        if not parts or not bucket_keys:
            return None
        # Bucket ids are computed PER PARTITION under that partition's
        # PINNED manifest layout (round-5 review fix): a rebucketed sub
        # (``t.part(p).rebucket(...)``) or a time-travel read crossing a
        # rebucket makes layouts heterogeneous, and hashing every
        # partition's probe with the first partition's HEAD layout would
        # prune the key's real bucket away — a silent empty lookup. The
        # key's type comes from the same pinned manifest.
        buckets_by_part: dict[str, set] = {}
        mans: dict[str, dict] = {}
        pre_filter = None
        for p, v in parts:
            sub = self._sub(p)
            m = mans[p] = sub.manifest(v)
            if m.get("bucket_fn", sub.bucket_fn) != "hash32":
                return None
            try:
                key_type = sub._canonical_schema(m)[
                    sub.bucket_col
                ].dataType
            except KeyError:
                return None
            needed = _driver_bucket_ids(
                bucket_keys, key_type,
                m.get("num_buckets", sub.num_buckets),
            )
            if needed is None:
                return None
            buckets_by_part[p] = set(needed)
            if pre_filter is None:
                pre_filter = F.col(sub.bucket_col).isin(bucket_keys)
        return self._fused_read(
            man,
            pre_filter=pre_filter,
            parts_subset=parts_subset,
            buckets_by_part=buckets_by_part,
            mans=mans,
        )

    def _index_diff(self, man: dict) -> DataFrame:
        """Full-outer diff of live table state vs live index entries —
        the audit plane behind ``verify_index``/``reindex``. One scan of
        each side, one join on the key: an O(table) maintenance op, same
        cost class as ``fsck.verify_integrity``'s stored-row audit."""
        keys = list(self.key_cols)
        idx = self._index()
        actual_parts = []
        for p, v in sorted(man["parts"].items()):
            sub = self._sub(p)
            res = sub._resolve_lww(sub._read_raw(sub.manifest(v)))
            actual_parts.append(
                res.filter(~F.col(DELETED_COL)).select(
                    *keys,
                    F.lit(p).alias("actual_part"),
                    F.col(SEQ_COL).alias("actual_seq"),
                )
            )
        if actual_parts:
            actual = actual_parts[0]
            for d in actual_parts[1:]:
                actual = actual.unionByName(d)
        else:
            actual = self.spark.createDataFrame(
                [], self._index_diff_schema("actual")
            )
        if idx.exists() and idx.manifest()["buckets"]:
            claimed = (
                idx._resolve_lww(idx._read_raw(idx.manifest()))
                .filter(~F.col(DELETED_COL))
                .select(
                    *keys,
                    F.col("part").alias("claimed_part"),
                    F.col(SEQ_COL).alias("claimed_seq"),
                )
            )
        else:
            claimed = self.spark.createDataFrame(
                [], self._index_diff_schema("claimed")
            )
        live = set(man["parts"])
        j = actual.join(claimed, keys, "full_outer")
        kind = (
            F.when(
                F.col("actual_part").isNull(),
                F.when(
                    F.col("claimed_part").isin(*sorted(live))
                    if live
                    else F.lit(False),
                    F.lit("dangling"),
                ).otherwise(F.lit("stale_dropped")),
            )
            .when(F.col("claimed_part").isNull(), F.lit("missing"))
            .when(
                F.col("claimed_part") != F.col("actual_part"),
                F.lit("mismatched"),
            )
        )
        return j.withColumn("kind", kind).filter(F.col("kind").isNotNull())

    def _index_diff_schema(self, side: str) -> T.StructType:
        spec_schema = schema_from_json(self._load_spec()["schema"])
        return T.StructType(
            [spec_schema[c] for c in self.key_cols]
            + [
                T.StructField(f"{side}_part", T.StringType(), True),
                T.StructField(f"{side}_seq", T.LongType(), True),
            ]
        )

    def verify_index(self) -> dict:
        """Audit the global key→partition index against live table state
        (the index plane's fsck). Returns per-kind counts:

        * ``missing`` — a live row the index doesn't know (point lookups
          miss it whenever another turn of the same conversation IS
          indexed — see ``read_keys`` — and the router treats its next
          update as a fresh insert: duplicate-live-row risk);
        * ``mismatched`` — the index names the wrong home (next update
          synthesizes a delete at a partition the key doesn't live in and
          leaves the real old row behind);
        * ``dangling`` — a live entry for a key with no live row in a
          LIVE partition (harmless for reads, routes the key's next
          delete to an empty home);
        * ``stale_dropped`` — entries pointing at dropped partitions:
          EXPECTED debris of ``drop_partition`` (handled lazily at route
          time), reported for observability, not a failure.

        ``ok`` is true when the first three are all zero. Repair with
        :meth:`reindex`."""
        if not self.cross_partition_upsert:
            raise ValueError("table has no cross-partition index")
        counts = {
            r["kind"]: r["n"]
            for r in self._index_diff(self.manifest())
            .groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        bad = ("missing", "mismatched", "dangling")
        return {
            "ok": all(counts.get(k, 0) == 0 for k in bad),
            **{k: int(counts.get(k, 0))
               for k in (*bad, "stale_dropped")},
        }

    def reindex(self) -> dict:
        """Repair the key→partition index from live table state — one
        CORRECTIVE apply batch built from the same diff ``verify_index``
        reports (O(diff) index events, never an index rewrite), so the
        repair is crash-safe by the engine's own commit machinery and a
        re-run converges to an empty diff. Corrections spend one LSN
        above every applied seq on either plane (the ``delete_where``
        seq-domain caveat applies). Maintenance-owner assumption: do not
        run concurrently with a writer."""
        if not self.cross_partition_upsert:
            raise ValueError("table has no cross-partition index")
        assert self.branch == "main", "run maintenance on a main handle"
        man = self.manifest()
        idx = self._index(create=True)
        keys = list(self.key_cols)
        diff = self._index_diff(man).persist()
        try:
            fix_seq = max(
                [idx._next_seq(idx.manifest(), None)]
                + [
                    self._sub(p)._next_seq(self._sub(p).manifest(v), None)
                    for p, v in man["parts"].items()
                ]
            )
            counts = {
                r["kind"]: r["n"]
                for r in diff.groupBy("kind")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            fixes = diff.select(
                F.when(F.col("actual_part").isNull(), F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.lit(fix_seq).cast("long").alias("seq"),
                *keys,
                F.col("actual_part").alias("part"),
            )
            applied = idx.apply_changes(fixes, batch_id=None, source="reindex")
        finally:
            diff.unpersist()
        return {
            "corrections": int(applied.get("n_events", 0)),
            "fix_seq": int(fix_seq),
            **{k: int(counts.get(k, 0))
               for k in ("missing", "mismatched", "dangling", "stale_dropped")},
        }

    def changes(self, since_version: int, until_version: int | None = None,
                *, with_version: bool = False) -> DataFrame:
        """Global change feed: rows committed in GLOBAL versions
        ``(since, until]``, assembled from each partition's own change
        feed over the sub-version spans the global manifests pin.
        ``with_version=True`` attributes rows to GLOBAL versions (one
        sub-feed read per (global version, partition) — the same
        plan-growth caveat as the flat table's attribution)."""
        man_lo, man_hi, hi = self._feed_bounds(
            since_version, until_version, "change feed"
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
        for g, p, v_lo, v_hi in self._attributed_spans(
            man_lo, since_version, hi
        ):
            dfs.append(
                self._sub(p)
                .changes(v_lo, v_hi)
                # long, matching the flat table's attribution column
                .withColumn("_version", F.lit(g).cast("long"))
            )
        return self._union(dfs, empty=empty)

    def _feed_bounds(
        self, since_version: int, until_version: int | None, what: str
    ) -> tuple[dict, dict, int]:
        """Shared feed-range discovery for ``changes``/``row_changes``:
        resolve the bounding cuts, then walk the range once (O(range) raw
        manifest reads, the same cost class as flat-table feed discovery)
        to fail loud where a partition's change history is incomplete — a
        partition present in one cut and ABSENT from the next was
        drop_partition'd (its committed rows are gone, and a re-create
        under the same value would otherwise skip the pre-drop rows
        without a trace); sub-version regressions are caught too (belt
        for out-of-band ledger surgery)."""
        man_hi = self.manifest(until_version)
        man_lo = self.manifest(since_version)
        hi = man_hi["version"]
        if since_version > hi:
            raise ValueError(
                f"since_version {since_version} is above until {hi}"
            )
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
                f"{what} ({since_version}, {hi}] crosses "
                f"drop_partition({sorted(lost)!r}); retention removed "
                "some of their rows"
            )
        return man_lo, man_hi, hi

    def _attributed_spans(self, man_lo: dict, since_version: int, hi: int):
        """Per-(global version, partition) sub-version spans — the
        one-sub-read-per-pair attribution walk both typed feeds share
        (same plan-growth caveat as the flat table's attribution)."""
        prev = man_lo
        for g in range(since_version + 1, hi + 1):
            cur = self.manifest(g)
            for p, v_hi in sorted(cur["parts"].items()):
                v_lo = prev["parts"].get(p, 0)
                if v_hi > v_lo:
                    yield g, p, v_lo, v_hi
            prev = cur

    def row_changes(
        self, since_version: int, until_version: int | None = None
    ) -> DataFrame:
        """Global TYPED row changelog for GLOBAL versions ``(since, until]``
        — the Delta ``table_changes`` shape over the whole partitioned
        table, assembled from each partition's own lookup-producer
        changelog over the sub-version spans the global manifests pin,
        with ``_version`` re-attributed to the GLOBAL commit (a consumer
        keyed on sub-versions would see colliding numbers across
        partitions). Requires the table opened with ``changelog="lookup"``
        (the kwarg flows to every sub-table); a state-changing sub-commit
        without a changelog raises ``ChangelogUnavailableError`` exactly
        as on the flat table. Same drop/recreate fail-loud walk and the
        same one-sub-read-per-(version, partition) plan-growth caveat as
        ``changes(with_version=True)``.

        A cross-partition MOVE (``cross_partition_upsert``) surfaces as
        ``delete`` rows at the old home and ``insert`` rows at the new —
        the retract pair an additive consumer already folds correctly."""
        man_lo, man_hi, hi = self._feed_bounds(
            since_version, until_version, "row_changes"
        )
        dfs: list[DataFrame] = []
        for g, p, v_lo, v_hi in self._attributed_spans(
            man_lo, since_version, hi
        ):
            dfs.append(
                self._sub(p)
                .row_changes(v_lo, v_hi)
                .withColumn("_version", F.lit(g).cast("long"))
            )
        def _empty():
            return (
                self._empty_cut(man_hi)
                .withColumn(SEQ_COL, F.lit(None).cast("long"))
                .withColumn("_change_type", F.lit(None).cast("string"))
                .withColumn("_version", F.lit(None).cast("long"))
            )
        return self._union(dfs, empty=_empty)

    def rollback(self, version: int) -> dict:
        """Roll the whole partitioned table back to GLOBAL ``version``:
        each partition that cut pins rolls back to its pinned sub-version
        (the flat rollback — a NEW sub manifest referencing the old
        snapshot, nothing rewritten), then ONE new global cut pins the
        rolled-back sub heads with ``last_batch_id`` reverted, so
        replaying the undone batches converges exactly as the first time.
        Partitions created AFTER the target cut drop out of the new cut
        (their directories stay for time travel until ``expire_snapshots``
        finds them unreferenced; a replayed batch that touches them
        re-pins their existing heads — the sub batch ledger already
        reflects those events, so convergence holds). Idempotent per
        partition: a sub already at its pinned head is not re-rolled.

        ``cross_partition_upsert`` tables roll the global key index back
        too — to the latest index version whose ``last_batch_id`` does not
        exceed the target cut's (index commits are per-batch but not
        pinned in global cuts, so the batch-id floor is the correct join
        point): that restores the mapping AND the index's own batch
        ledger, so replayed batches re-apply their index events with
        their ORIGINAL seqs. If the floor version was expired
        (``expire_snapshots`` keeps only the index head), rollback falls
        back to :meth:`reindex` — corrections then outrank the replayed
        span's original seqs, so run ``verify_index``/``reindex`` again
        once the replay converges (reported in the result). Maintenance-
        owner assumption throughout."""
        assert self.branch == "main", "run maintenance on a main handle"
        man = self.manifest(version)
        cur = self.manifest()
        spec_at = man.get("spec")
        if spec_at is not None and spec_at != self._load_spec():
            # restore the table CONTRACT too: DDL after the target cut
            # (constraints, properties, renames/retired names, rebucket's
            # num_buckets) is undone with the data it described —
            # otherwise replays of the undone span would be refused by
            # retired-name records from a future the rollback erased
            def mutate(spec):
                spec.clear()
                spec.update(spec_at)

            self._rewrite_spec(mutate)
            if "num_buckets" in spec_at:
                self._lake_kwargs["num_buckets"] = spec_at["num_buckets"]
        for p, v_sub in sorted(man["parts"].items()):
            sub = self._sub(p)
            if sub.latest_version() != v_sub:
                sub.rollback(v_sub)
        parts = {
            p: self._sub(p).latest_version() for p in sorted(man["parts"])
        }
        new_version = cur["version"] + 1
        self._commit_global(
            {
                "format_version": 1,
                "version": new_version,
                "op": "rollback",
                "batch_id": None,
                "last_batch_id": man["last_batch_id"],
                "parts": parts,
                "spec": self._load_spec(),
                "metrics": {
                    "maintenance": "rollback", "to_version": version,
                },
                "commit_ts": time.time(),
            }
        )
        out = {"rolled_back_to": version, "version": new_version}
        if self.cross_partition_upsert and self._index().exists():
            idx = self._index()
            floor = man["last_batch_id"]
            target_iv = None
            for iv in idx._versions():
                if idx._load_version(iv).get("last_batch_id", -1) <= floor:
                    target_iv = iv
                else:
                    break  # last_batch_id is monotone over versions
            if target_iv is None:
                # every retained index version postdates the target
                # (expire_snapshots keeps only the head) — corrective
                # repair is the only option left
                out["index"] = {
                    "rolled_back_to": None,
                    "reindex": self.reindex(),
                    "note": "index history expired; reindex corrections "
                            "outrank replayed original seqs — re-run "
                            "reindex after the replay converges",
                }
            else:
                if target_iv != idx.latest_version():
                    idx.rollback(target_iv)
                out["index"] = {"rolled_back_to": target_iv}
        return out

    def version_as_of(self, ts: float) -> int:
        """Timestamp time travel at GLOBAL scope: the highest global cut
        committed at or before unix-time ``ts`` (the flat contract over
        the global ledger — O(versions) raw manifest reads)."""
        best = None
        for v in self._versions():
            cts = self.manifest(v).get("commit_ts")
            if cts is not None and cts <= ts:
                best = v
        if best is None:
            raise LookupError(f"no global cut committed at or before {ts}")
        return best

    def changes_since_ts(self, ts, until_ts=None) -> DataFrame:
        """Timestamp-bounded GLOBAL change feed — the flat
        ``changes_since_ts`` contract (Delta ``startingTimestamp``) over
        global cuts: resolution is ledger-only, the read is the ordinary
        :meth:`changes`, and a ``ts`` at or before the earliest retained
        cut fails loud instead of silently truncating the feed."""
        lo = _to_unix(ts)
        hi = None if until_ts is None else _to_unix(until_ts)
        try:
            since_v = self.version_as_of(lo)
        except LookupError:
            vmin = min(self._versions())
            if vmin > 0:
                raise SnapshotExpiredError(
                    f"timestamp {lo} is at or before the earliest retained "
                    f"global cut (g{vmin}); the feed before it was expired "
                    "— re-seed the consumer from a full read"
                ) from None
            # ts precedes the first commit: global v0 is the dataless
            # create cut, so the whole feed is everything after it
            since_v = vmin
        if hi is None:
            return self.changes(since_v)
        try:
            until_v = self.version_as_of(hi)
        except LookupError:
            until_v = since_v
        return self.changes(since_v, until_v)

    # ----------------------------------------- properties / constraints
    def schema(self) -> T.StructType:
        """The table-scope canonical schema (the spec copy — the one DDL
        fan-outs keep authoritative for future partitions)."""
        return schema_from_json(self._load_spec()["schema"])

    def next_seq(self) -> int:
        """One LSN above every applied seq in every partition — the
        fleet-coherent seq an external producer (e.g. the SQL INSERT
        router) should stamp on events it synthesizes itself."""
        return self._fleet_seq(self.manifest())

    def properties(self) -> dict:
        return dict(self._load_spec().get("properties", {}))

    def set_property(self, key: str, value: str) -> dict:
        """TBLPROPERTIES at table (spec) scope — one place, not one copy
        per partition."""
        assert self.branch == "main", "run DDL on a main-opened table"

        def mutate(spec):
            spec.setdefault("properties", {})[str(key)] = str(value)

        self._rewrite_spec(mutate)
        self._commit_global(self._next_global(
            "set_property", metrics={"key": str(key), "value": str(value)}
        ))
        return self.properties()

    def unset_property(self, key: str) -> dict:
        assert self.branch == "main", "run DDL on a main-opened table"

        def mutate(spec):
            spec.get("properties", {}).pop(str(key), None)

        self._rewrite_spec(mutate)
        self._commit_global(self._next_global(
            "unset_property", metrics={"key": str(key)}
        ))
        return self.properties()

    def constraints(self) -> list[dict]:
        return list(self._load_spec().get("constraints", []))

    def add_constraint(self, name: str, expr: str, *,
                       validate: bool = True) -> dict:
        """ADD CONSTRAINT fanned out: every existing partition gets the
        flat CHECK, and the SPEC records it so partitions born later
        inherit it at create — the same future-partition contract as
        retired names. Validation runs ONCE at table scope BEFORE the
        fan-out (one read-only job over the global state): a per-slice
        refusal after earlier partitions committed would strand the CHECK
        enforced on a prefix with no spec record and no router-level
        undo. The remaining fan is metadata-only and re-runnable (a
        crash-replay skips partitions that already carry it)."""
        assert self.branch == "main", "run DDL on a main-opened table"
        if any(c["name"] == name for c in self.constraints()):
            raise ValueError(f"constraint {name!r} already exists")
        if validate:
            # doubles as the typo gate: analyzing the filter against the
            # canonical schema fails here, not inside a later sub-apply
            n_bad = (
                self.read()
                .filter(~F.coalesce(F.expr(expr), F.lit(True)))
                .count()
            )
            if n_bad:
                raise ValueError(
                    f"cannot add constraint {name!r}: {n_bad} existing "
                    f"rows violate CHECK ({expr})"
                )
        for p in sorted(self.manifest()["parts"]):
            sub = self._sub(p)
            if not any(c["name"] == name for c in sub.constraints()):
                sub.add_constraint(name, expr, validate=False)

        def mutate(spec):
            spec.setdefault("constraints", []).append(
                {"name": name, "expr": expr}
            )

        self._rewrite_spec(mutate)
        self._commit_global(self._next_global(
            "add_constraint", metrics={"name": name, "expr": expr}
        ))
        return {"constraint": name}

    def drop_constraint(self, name: str) -> dict:
        assert self.branch == "main", "run DDL on a main-opened table"
        if not any(c["name"] == name for c in self.constraints()):
            raise ValueError(f"no constraint {name!r}")
        for p in sorted(self.manifest()["parts"]):
            try:
                self._sub(p).drop_constraint(name)
            except ValueError:
                pass  # added out-of-band per-partition asymmetry

        def mutate(spec):
            spec["constraints"] = [
                c for c in spec.get("constraints", [])
                if c["name"] != name
            ]

        self._rewrite_spec(mutate)
        self._commit_global(self._next_global(
            "drop_constraint", metrics={"name": name}
        ))
        return {"dropped": name}

    def clone(self, dst_path: str, version: int | None = None
              ) -> "PartitionedTable":
        """Zero-copy SHALLOW CLONE of the whole partitioned table at a
        GLOBAL cut: each pinned partition is flat-cloned at its pinned
        sub-version (absolute-path refs, no bytes move), the spec is
        copied, and ONE global v0 pins every clone at its v0 —
        ``last_batch_id`` carries over so a forked ingest pipeline
        resumes exactly-once. Like the flat clone, history and the
        change feed restart at the clone. ``cross_partition_upsert``
        clones include the index (head-state index for a head clone; a
        HISTORICAL clone's index is rebuilt with :meth:`reindex` since
        index versions aren't pinned in global cuts). The clone's
        CONTRACT comes from the manifest's at-cut spec snapshot (a
        historical clone of a since-renamed table keeps the old names so
        replaying its span isn't refused by future retired-name records);
        pre-snapshot manifests fall back to the live spec. Any failure
        mid-clone removes the partial destination, so a retry starts
        clean (the flat clone is one atomic commit; this one is N+3
        steps)."""
        assert self.branch == "main", "clone from a main-opened handle"
        man = self.manifest(version)
        spec_at = man.get("spec") or self._load_spec()
        dst = PartitionedTable(
            self.spark,
            dst_path,
            key_cols=self.key_cols,
            partition_col=self.partition_col,
            granularity=self.granularity,
            stage_threshold=self.stage_threshold,
            apply_concurrency=self.apply_concurrency,
            cross_partition_upsert=self.cross_partition_upsert,
            index_buckets=self.index_buckets,
            **self._lake_kwargs,
        )
        if dst.exists():
            raise RuntimeError(f"table already exists at {dst.path}")
        try:
            dst.create(schema_from_json(spec_at["schema"]))

            # carry the at-cut spec extras (constraints / properties /
            # retired names / rebucket record)
            def mutate(spec):
                for k in ("constraints", "properties", "retired",
                          "num_buckets", "bucket_fn", "bucket_col",
                          "merge_engine", "agg_spec", "session_tz"):
                    # the write-strategy record must travel: a clone's
                    # spec claiming default 'lww' over an 'aggregate'
                    # source would mislead library-less writers (the
                    # sink trusts the spec) and stamp wrong engines into
                    # clone-born partitions
                    if k in spec_at:
                        spec[k] = spec_at[k]

            dst._rewrite_spec(mutate)
            for p, v in sorted(man["parts"].items()):
                self._sub(p).clone(dst._part_dir(p), version=v)
            if (self.cross_partition_upsert and version is None
                    and self._index().exists()):
                # head clone: index travels BEFORE the global commit so a
                # published clone can never look complete while missing
                # its routing state
                self._index().clone(os.path.join(dst.path, "_index"))
            dst._commit_global({
                "format_version": 1,
                "version": 1,
                "op": "clone",
                "batch_id": None,
                "last_batch_id": man["last_batch_id"],
                "parts": {p: 0 for p in man["parts"]},
                "spec": dst._load_spec(),
                "metrics": {"cloned_from": self.path,
                            "at_global_version": man["version"]},
                "commit_ts": time.time(),
            })
            if (self.cross_partition_upsert and version is not None
                    and self._index().exists()):
                # historical clone: reindex needs the committed cut; the
                # crash window between commit and reindex is closed by
                # apply_changes' missing-index self-heal
                dst.reindex()
        except BaseException:
            shutil.rmtree(dst.path, ignore_errors=True)
            raise
        return dst

    def _fleet_seq(self, man: dict) -> int:
        """One LSN above every applied seq in every pinned partition —
        fan-out mutations spend a SINGLE coherent seq across partitions
        (per-sub defaults would hand out different seqs for one logical
        statement, making 'which write wins' depend on the partition)."""
        seqs = [1]
        for p, v in man["parts"].items():
            sub = self._sub(p)
            seqs.append(sub._next_seq(sub.manifest(v), None))
        return max(seqs)

    def delete_where(self, predicate, *, mode: str = "rewrite",
                     note: str | None = None) -> dict:
        """Predicate delete fanned across partitions (the flat
        ``delete_where`` per partition — rewrite or tombstone mode — at
        ONE fleet-wide tombstone seq), ending in one global cut. Each
        partition's own zone maps skip its untouched buckets; partitions
        with zero matches commit nothing. ``cross_partition_upsert``
        caveat: purged keys leave DANGLING index entries (benign —
        ``verify_index`` reports them, routing treats the empty home
        correctly); run ``reindex`` to tidy."""
        assert self.branch == "main", "run maintenance on a main handle"
        man = self.manifest()
        seq = self._fleet_seq(man)
        per = {
            p: self._sub(p).delete_where(
                predicate, tombstone_seq=seq, mode=mode, note=note
            )
            for p in sorted(man["parts"])
        }
        metrics = {
            "maintenance": "delete_where", "predicate": str(predicate),
            "mode": mode, "tombstone_seq": seq,
            "parts": {p: r.get("deleted_rows") for p, r in per.items()},
        }
        self._commit_global(
            self._next_global("delete_where", metrics=metrics)
        )
        # flat-table return parity: one total alongside the fan-out
        return {
            "tombstone_seq": seq,
            "deleted_rows": sum(
                r.get("deleted_rows") or 0 for r in per.values()
            ),
            "parts": per,
        }

    def update_where(self, predicate, assignments: dict, *,
                     note: str | None = None) -> dict:
        """UPDATE ... SET ... WHERE fanned across partitions at one
        fleet-wide update seq. Assignments may not touch the PARTITION
        column: a row's partition is its directory, so an in-place ts
        rewrite would silently break range pruning (default identity) or
        the key's home (``cross_partition_upsert``) — route such moves as
        ordinary change events through ``apply_changes`` instead."""
        assert self.branch == "main", "run maintenance on a main handle"
        if self.partition_col in assignments:
            raise ValueError(
                f"update_where cannot assign the partition column "
                f"{self.partition_col!r} — emit change events through "
                "apply_changes so the router re-partitions the rows"
            )
        man = self.manifest()
        seq = self._fleet_seq(man)
        per = {
            p: self._sub(p).update_where(
                predicate, assignments, update_seq=seq, note=note
            )
            for p in sorted(man["parts"])
        }
        metrics = {
            "maintenance": "update_where", "predicate": str(predicate),
            "update_seq": seq,
            "parts": {p: r.get("n_events") for p, r in per.items()},
        }
        self._commit_global(
            self._next_global("update_where", metrics=metrics)
        )
        return {"update_seq": seq, "parts": per}

    def reprocess_quarantine(self, fix, *, batch_id: int | None = None,
                             transform=None) -> dict:
        """Re-admit dead-letter rows through the ROUTER (the flat
        contract, plans/lake.py reprocess_quarantine): reads the shared
        quarantine parquet, hands the rows minus the bookkeeping column
        to ``fix``, and routes the result like any change batch — a fix
        that supplies the key sends the row to the partition its ts
        derives, which a per-partition re-admission could not do (the
        quarantining partition is not necessarily the fixed row's home).
        Rows ``fix`` leaves unmergeable simply re-quarantine; the file
        set is not truncated (idempotence by seq LWW, same as flat)."""
        qpath = self._lake_kwargs.get("quarantine_path")
        if qpath is None:
            raise ValueError("table has no quarantine_path configured")
        if not os.path.isdir(qpath):
            return {"skipped": True, "reason": "quarantine is empty"}
        q = self.spark.read.parquet(qpath)
        fixed = fix(q.drop("_quarantine_batch"))
        return self.apply_changes(
            fixed, batch_id=batch_id, transform=transform,
            source="quarantine-replay",
        )

    def rebucket(self, new_num_buckets: int) -> dict:
        """Partition-spec evolution at table scope: every partition is
        rewritten at the new bucket count (the flat Iceberg-style
        ``rebucket`` per sub-table), and the SPEC records it so partitions
        born LATER are created at the new count too — without the spec
        record a future partition would silently fork back to the
        constructor default. Existing subs keep self-adopting their
        on-disk layout, so a crash mid-fan-out is re-runnable (already-
        rebucketed partitions rewrite again at the same count — idempotent
        in state, wasteful only in IO)."""
        assert self.branch == "main", "run maintenance on a main handle"
        man = self.manifest()
        per = {
            p: self._sub(p).rebucket(new_num_buckets)
            for p in sorted(man["parts"])
        }

        def mutate(spec):
            spec["num_buckets"] = int(new_num_buckets)

        self._rewrite_spec(mutate)
        self._lake_kwargs["num_buckets"] = int(new_num_buckets)
        self._commit_global(self._next_global(
            "rebucket",
            metrics={"maintenance": "rebucket",
                     "num_buckets": int(new_num_buckets),
                     "parts": sorted(per)},
        ))
        return {"num_buckets": int(new_num_buckets), "parts": per}

    def overwrite_where(self, df: DataFrame, predicate, *,
                        batch_id: int | None = None,
                        note: str | None = None) -> dict:
        """Predicate-scoped atomic replace (Delta ``replaceWhere``) fanned
        across partitions at one fleet-wide seq: replacement rows route by
        their partition value; EVERY existing partition runs the flat
        :meth:`LakeTable.overwrite_where` on its slice (an empty slice is
        a pure delete of that partition's predicate region — the classic
        replace-a-partition call is ``overwrite_where(rows, "ts >= ... and
        ts < ...")``), and rows for a partition that doesn't exist yet
        create it. Each partition's zone maps bound the matched-scan cost;
        partitions with zero matches and zero rows commit nothing (the
        flat op's no-op skip). Refused on
        ``cross_partition_upsert`` tables for the same identity reason as
        :meth:`merge_into`."""
        if self.cross_partition_upsert:
            raise ValueError(
                "overwrite_where is partition-local; on a cross_partition_"
                "upsert table a key's home may differ from the replacement "
                "row's partition value — delete_where + apply_changes "
                "instead"
            )
        assert self.branch == "main", "run maintenance on a main handle"
        if self.partition_col not in df.columns:
            raise ValueError(
                f"replacement rows lack partition column "
                f"{self.partition_col!r}"
            )
        if "_part" in df.columns:
            raise ValueError("rows carry reserved column '_part'")
        rows = self._enforce_retired(df)
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id,
                    "reason": "already committed"}
        seq = self._fleet_seq(man)
        rows = rows.withColumn("_part", self._part_expr())
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        per: dict = {}
        try:
            rows.persist()
            # validate the WHOLE frame BEFORE any sub commits: slice-level
            # refusal after earlier partitions committed would leak a
            # partial statement into the next global cut (the flat checks
            # still run per slice, but never first-fail mid-fan-out)
            v = rows.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
                ).alias("violations"),
                F.countDistinct(F.struct(
                    *[F.col(k) for k in self.key_cols], F.col("_part")
                )).alias("n_keys"),
            ).first()
            if v["violations"]:
                raise ValueError(
                    f"overwrite_where refused: {v['violations']} of "
                    f"{v['n']} replacement rows do not satisfy the "
                    "predicate — rows written outside the overwritten "
                    "region would survive its next overwrite"
                )
            if v["n_keys"] != v["n"]:
                raise ValueError(
                    "overwrite_where refused: replacement rows are not "
                    f"unique on {list(self.key_cols)!r} within a partition"
                )
            row_parts = sorted(
                r[0] for r in rows.select("_part").distinct().collect()
            )
            for p in sorted(set(man["parts"]) | set(row_parts)):
                sub = self._sub(p, create=True)
                per[p] = sub.overwrite_where(
                    rows.filter(F.col("_part") == p).drop("_part"),
                    predicate, overwrite_seq=seq, batch_id=batch_id,
                    note=note,
                )
        finally:
            rows.unpersist()
        metrics = {
            "maintenance": "overwrite_where", "predicate": str(predicate),
            "overwrite_seq": seq,
            "parts": {p: {k: r.get(k)
                          for k in ("replaced_rows", "inserted_rows",
                                    "skipped")
                          if k in r}
                      for p, r in per.items()},
        }
        self._commit_global(self._next_global(
            "overwrite_where", touched=row_parts, batch_id=batch_id,
            metrics=metrics,
        ))
        return {"overwrite_seq": seq, "parts": per}

    def merge_into(self, source: DataFrame, *, batch_id: int | None = None,
                   merge_seq: int | None = None, note: str | None = None,
                   **clauses) -> dict:
        """Declarative MERGE INTO fanned across partitions: ``source``
        rows route by their partition value and each touched partition
        runs the flat :meth:`LakeTable.merge_into` on its slice — valid
        because under the spec's identity rule the partition value is
        part of row identity, so a source row can only match rows in its
        own partition (the same Paimon trade :meth:`read_keys`
        documents). All slices share ONE fleet-wide ``merge_seq`` and the
        statement ends in one global cut; exactly-once composes exactly
        like :meth:`apply_changes` (global ledger dedupes the statement,
        per-partition ledgers dedupe crash-replayed slices). Unmatched
        source rows may create brand-new partitions (born at the spec
        schema + constraints). Refused on ``cross_partition_upsert``
        tables — there a key's home partition, not the row's partition
        value, owns its identity, so route through ``apply_changes``
        (which consults the index) instead.

        Partial-failure contract (same as ``apply_changes``): if one
        slice fails mid-fan-out (e.g. an inherited CHECK), already-
        committed slices stand in their sub-ledgers and the global cut
        never lands — re-running the SAME statement converges (committed
        slices skip, the failing one re-runs). Re-using the ``batch_id``
        with an AMENDED source diverges on the skipped slices — amend
        under a NEW batch_id, or :meth:`rollback` first. Exactly-once
        assumes a batch's content is immutable per id, here as
        everywhere in the engine."""
        if self.cross_partition_upsert:
            raise ValueError(
                "merge_into is partition-local; on a cross_partition_"
                "upsert table a key's home may differ from the source "
                "row's partition value — emit change events through "
                "apply_changes instead"
            )
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id,
                    "reason": "already committed"}
        if self.partition_col not in source.columns:
            raise ValueError(
                f"merge source lacks partition column "
                f"{self.partition_col!r}"
            )
        if "_part" in source.columns:
            raise ValueError("source carries reserved column '_part'")
        # a row's partition is its directory: assigning the partition col
        # in place (or inserting a ts that differs from the routing value)
        # would desync data from layout — the same invariant update_where
        # enforces. Insert dicts get the routing value injected; anything
        # else is refused toward apply_changes (which re-partitions moves).
        wmu = clauses.get("when_matched_update")
        if wmu and self.partition_col in wmu:
            raise ValueError(
                f"merge_into cannot assign the partition column "
                f"{self.partition_col!r} — emit change events through "
                "apply_changes so the router re-partitions the rows"
            )
        wni = clauses.get("when_not_matched_insert")
        if isinstance(wni, dict):
            want = f"s.{self.partition_col}"
            got = wni.get(self.partition_col)
            if got is None:
                clauses = {**clauses, "when_not_matched_insert":
                           {**wni, self.partition_col: want}}
            elif not (isinstance(got, str)
                      and got.strip().lower() == want.lower()):
                raise ValueError(
                    f"insert clause must keep the partition column at the "
                    f"source value ({want!r}) — rows are routed by it"
                )
        src = self._enforce_retired(source)
        seq = self._fleet_seq(man) if merge_seq is None else merge_seq
        src = src.withColumn("_part", self._part_expr())
        t0 = time.monotonic()
        per_part: dict = {}
        try:
            src.persist()
            parts = sorted(
                r[0] for r in src.select("_part").distinct().collect()
            )
            subs = {p: self._sub(p, create=True) for p in parts}

            def _one(p: str):
                return p, subs[p].merge_into(
                    src.filter(F.col("_part") == p).drop("_part"),
                    merge_seq=seq, batch_id=batch_id, note=note, **clauses,
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
            src.unpersist()
        metrics = {
            "n_parts_touched": len(parts),
            "merge_seq": seq,
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
                "merge_into", touched=parts, batch_id=batch_id,
                metrics=metrics,
            )
        )
        return metrics

    def verify_integrity(self, version: int | None = None) -> dict:
        """fsck for the whole partitioned table: every partition the
        global cut pins is audited by the flat integrity audit at its
        pinned sub-version, the GLOBAL plane is checked (every pinned
        sub-version's manifest resolvable, spec readable, live branches'
        fork cuts retained), and ``cross_partition_upsert`` tables audit
        the index table plus the key→partition mapping
        (:meth:`verify_index` — latest cut only, since the index is not
        versioned against historical cuts). Read-only; returns
        ``{"ok", "version", "global": {...}, "parts": {...}}``."""
        assert self.branch == "main", "audit a main-opened table"
        from .fsck import verify_integrity as _fsck

        man = self.manifest(version)
        g: dict = {}
        unresolvable = []
        per_part: dict = {}
        for p, v in sorted(man["parts"].items()):
            try:
                sub = self._sub(p)
                sub.manifest(v)
            except (PartitionRetentionError, SnapshotExpiredError) as e:
                unresolvable.append({"partition": p, "error": str(e)})
                continue
            per_part[p] = _fsck(sub, version=v)
        g["pinned_subs"] = {"ok": not unresolvable,
                            "unresolvable": unresolvable}
        spec = self._load_spec()
        g["spec"] = {"ok": spec is not None}
        gvs = self._versions()
        stale_forks = [
            b["name"] for b in self.branches() if b["forked_at"] not in gvs
        ]
        g["branch_forks"] = {"ok": not stale_forks, "stale": stale_forks}
        ok = (
            all(c["ok"] for c in g.values())
            and all(r["ok"] for r in per_part.values())
        )
        out = {"ok": ok, "version": man["version"], "global": g,
               "parts": per_part}
        if (
            self.cross_partition_upsert
            and version is None
            and self._index().exists()
        ):
            out["index"] = _fsck(self._index())
            if ok and out["index"]["ok"]:
                out["index_mapping"] = self.verify_index()
                out["ok"] = out["index_mapping"]["ok"]
            else:
                # the mapping diff SCANS both planes — running it over a
                # table the audit just found damaged would crash on the
                # same missing refs it reported
                out["index_mapping"] = {"skipped": "data-plane audit failed"}
                out["ok"] = False
        return out

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
        # the directory remove is branch-blind — a branch-scoped drop
        # would delete data main still references
        assert self.branch == "main", "drop partitions from a main handle"
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
        under them). Tagged cuts and live branches' fork cuts are pinned;
        global branch version files of DROPPED branches (crash leftovers)
        are swept."""
        assert self.branch == "main", "run maintenance on a main handle"
        gvs = self._versions()
        if not gvs:
            # never created / no ledger — nothing is referenced, and the
            # unreferenced-dir sweep below must not fire on that state
            return {"expired_global": 0, "kept": [], "parts": {}}
        keep = gvs[-keep_last:]
        # pinned cuts: tags (training-run reproducibility) and every live
        # branch's fork point (branch manifests fall through to it)
        for t in self.tags():
            if t["version"] in gvs and t["version"] not in keep:
                keep.append(t["version"])
        ledger_names = os.listdir(self._ledger)
        live_branch_files: set[str] = set()
        branch_parts: set[str] = set()
        for bmeta in self.branches():
            if bmeta["forked_at"] in gvs and bmeta["forked_at"] not in keep:
                keep.append(bmeta["forked_at"])
            for bv in self._gbranch_vfile_versions(
                ledger_names, bmeta["name"]
            ):
                fname = self._gvfile_name(bv, bmeta["name"])
                live_branch_files.add(fname)
                with open(os.path.join(self._ledger, fname)) as fh:
                    branch_parts |= set(json.load(fh)["parts"])
        keep = sorted(keep)
        drop = [v for v in gvs if v not in keep]
        kept_mans = [self.manifest(v) for v in keep]
        for v in drop:
            os.remove(os.path.join(self._ledger, f"g{v:08d}.json"))
        # gb- files whose branch pointer is gone are crash leftovers of a
        # drop/publish — sweep them like the flat table's orphan b- files
        orphan_gb = [
            f for f in ledger_names
            if f.startswith("gb-") and f.endswith(".json")
            and f not in live_branch_files
        ]
        for f in orphan_gb:
            os.remove(os.path.join(self._ledger, f))
        per_part = {}
        for p in self._live_parts():
            referenced = {
                m["parts"][p] for m in kept_mans if p in m["parts"]
            }
            if not referenced and p in branch_parts:
                # only live-branch cuts reference this partition (born
                # inside a branch apply): its sub-table protects the
                # branch's own files, and the dir must survive the sweep
                per_part[p] = {"branch_only": True}
                continue
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
        out = {"expired_global": len(drop), "kept": keep, "parts": per_part,
               "removed_orphan_gb": len(orphan_gb)}
        if self.cross_partition_upsert and self._index().exists():
            # the index needs no time travel beyond crash safety — its
            # LATEST version is the only one any plane reads
            out["index"] = self._index().expire_snapshots(keep_last=1)
        return out

    def maintain(self, **policy) -> dict:
        """Policy-driven maintenance across partitions (the ``maintain()``
        scheduler fanned out), ending in one global maintenance cut.

        Fan-out runs on ``apply_concurrency`` threads, same rationale as
        ``apply_changes``: each partition's maintenance is a pipeline of
        independent Spark jobs against its own directory (no shared
        commits), and a steady-state table where only 1-2 recent
        partitions are ever DUE pays mostly no-op decision ticks
        (driver-side manifest reads) for the rest — at hundreds of
        partitions a serial walk would make the no-op ticks themselves
        the wall-clock bound while the cluster idles."""
        assert self.branch == "main", "run maintenance on a main handle"
        from .maintenance import maintain as _maintain

        parts = sorted(self.manifest()["parts"])

        def _one(p: str):
            return p, _maintain(self._sub(p), **policy)

        if len(parts) <= 1 or self.apply_concurrency == 1:
            results = dict(_one(p) for p in parts)
        else:
            from concurrent.futures import ThreadPoolExecutor

            # materialize the handles serially first: _sub mutates the
            # shared cache dict, which is not thread-safe to populate
            for p in parts:
                self._sub(p)
            with ThreadPoolExecutor(
                min(self.apply_concurrency, len(parts))
            ) as ex:
                results = dict(ex.map(_one, parts))
        if not policy.get("dry_run"):
            self._commit_global(
                self._next_global("maintenance", metrics={"maintain": True})
            )
        return results
