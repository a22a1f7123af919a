"""Multi-table atomic transactions — a TABLE GROUP with a group ledger
of consistent cuts and branch-staged two-phase commit.

The reference's pipeline mutates several outputs per run (converted MODS
dir, restriction report, reconciliation counts — `post_cdm_cleanup.py`)
and its integrity story is "abort the whole run if any piece fails". At
lake scale the same need is cross-TABLE atomicity: an ingest that lands
transcript rows AND a stats rollup AND an audit record must never be
half-visible. Filesystem tables have no shared catalog to make N
independent directory commits atomic, so the engine does what Iceberg's
REST-catalog multi-table transactions / Nessie do: introduce the catalog.

:class:`TableGroup` is that catalog — the heterogeneous-table
generalization of :class:`~cdm_to_mods_spark.plans.partitioned
.PartitionedTable`'s global ledger (same link(2)-exclusive cut commits,
same ledger-as-idempotence-token recovery), with members that are
ordinary external :class:`LakeTable` s instead of partitions:

- every group version pins one CONSISTENT CUT ``{name: sub_version}``;
- ``read(name)`` resolves through the latest cut, so a group reader can
  never observe table A's transaction output next to table B's
  pre-transaction state (cross-table snapshot isolation — the reason a
  plain ``LakeTable.read()`` of each member is not enough);
- a :class:`GroupTransaction` stages writes on per-table branches (the
  WAP machinery), then commits in two phases: a durable WAL record is
  the commit point, branch publishes + the cut commit are its redo log,
  and ``recover()`` completes or discards torn transactions.

Concurrency contract (same single-writer-per-table rule as every
maintenance op in this engine): member tables must not take DIRECT main
commits while a group transaction is committing — the pre-commit fork
check turns the common race into a clean
:class:`TransactionConflictError` abort, but a main commit that lands
inside the publish window surfaces later as a
``BranchDivergedError`` from ``recover()``. Direct (non-transactional)
writes between transactions are fine: ``sync()`` advances the cut to
the current heads as an ordinary group commit.
"""

from __future__ import annotations

import json
import os
import time
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession

from .lake import BranchDivergedError, LakeTable


# Write-strategy constructor args that reopen deliberately does NOT adopt
# from disk ("caller-chosen — write strategies, not layout", lake.py): a
# catalog/group reopening a member on the owner's behalf must replay the
# owner's choice, or a mor table's staged commits would silently run cow
# (different cost shape, and cow-without-CDF poisons the change feed).
_STRATEGY_KEYS = ("merge_mode", "compact_deltas", "cow_change_feed")
_MISSING = object()


def member_strategy(table) -> dict:
    """The write-strategy kwargs to persist for ``table`` so a later
    reopen writes the way the owner did."""
    if hasattr(table, "_lake_kwargs"):  # partitioned: strategy rides the
        src = table._lake_kwargs       # sub-table kwargs
        return {k: src[k] for k in _STRATEGY_KEYS if k in src}
    # best-effort on duck-typed handles: absent attributes simply are
    # not recorded (the reopen then uses constructor defaults)
    out = {}
    for k in _STRATEGY_KEYS:
        v = getattr(table, k, _MISSING)
        if v is not _MISSING:
            out[k] = v
    return out


def _open_member(spark: SparkSession, path: str, branch: str = "main",
                 strategy: dict | None = None):
    """Open a member by its on-disk kind: a ``_spec.json`` marks the
    time-partitioned composite table (its reopen adopts the spec), else a
    flat LakeTable (reopen adopts the manifest). Branch handles stage at
    the member's own scope — the router's global WAP for partitioned
    members, the flat branch namespace otherwise. ``strategy`` replays
    the owner's write-strategy kwargs (see ``member_strategy``)."""
    kw = dict(strategy or {})
    if os.path.exists(os.path.join(path, "_spec.json")):
        from .partitioned import PartitionedTable

        return PartitionedTable(spark, path, branch=branch, **kw)
    return LakeTable(spark, path, branch=branch, **kw)


class TransactionConflictError(RuntimeError):
    """A member table's main advanced past the transaction's fork point
    before the commit point — the transaction aborted cleanly (no table
    published); re-stage and retry."""


class TransactionTornError(RuntimeError):
    """A transaction passed its commit point (durable WAL) but could not
    complete — run :meth:`TableGroup.recover` to finish or inspect."""


def _fsync_dir(path: str) -> None:
    # the rename/link itself lives in the DIRECTORY: without fsyncing it,
    # a power loss can forget the entry even though the file bytes are
    # durable — fatal for a file that claims to be a commit point
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_write(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp-{uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)
    _fsync_dir(os.path.dirname(path))


class TableGroup:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path.rstrip("/"))
        self._ledger = os.path.join(self.path, "_ledger")
        self._txn_dir = os.path.join(self.path, "_txn")
        self._spec_path = os.path.join(self.path, "_group.json")
        self._handles: dict[str, LakeTable] = {}

    # ----------------------------------------------------------- members
    def _spec(self) -> dict:
        try:
            with open(self._spec_path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no table group at {self.path}; create() it first"
            ) from None

    def exists(self) -> bool:
        return os.path.exists(self._spec_path)

    def members(self) -> list[str]:
        return sorted(self._spec()["tables"])

    def table(self, name: str) -> LakeTable:
        """The member's RAW handle (main branch, current head) — reads
        through it see uncoordinated state; group-consistent reads go
        through :meth:`read`."""
        if name not in self._handles:
            spec = self._spec()
            if name not in spec["tables"]:
                raise LookupError(
                    f"no member {name!r} in group {self.path}; members: "
                    f"{sorted(spec['tables'])}"
                )
            self._handles[name] = _open_member(
                self.spark, spec["tables"][name],
                strategy=spec.get("strategy", {}).get(name),
            )
        return self._handles[name]

    def refresh_strategy(self, name: str, table) -> dict:
        """Re-record a member's write-strategy kwargs in the group spec
        from the owner's LIVE handle. The spec freezes the strategy at
        ``create()``; an owner who later deliberately changes a member's
        write mode calls this so transactions stop replaying the stale
        choice. The handle is required: write-strategy args are never
        adopted from disk, so a default reopen would record constructor
        DEFAULTS — silently erasing the recorded choice."""
        spec = self._spec()
        if name not in spec["tables"]:
            raise LookupError(f"no member {name!r} in group {self.path}")
        if table is None:
            raise TypeError(
                "refresh_strategy requires the owner's live handle; a "
                "default reopen would re-record constructor defaults"
            )
        spec.setdefault("strategy", {})[name] = member_strategy(table)
        _fsync_write(self._spec_path, spec)
        self._handles.pop(name, None)  # reopen picks up the new record
        return spec["strategy"][name]

    def create(self, tables: dict) -> None:
        """Register ``tables`` (existing flat or partitioned lake tables
        — the group stores their paths, external-table style) and commit
        the g0 cut at their current heads."""
        if self.exists() and self.latest_version() is not None:
            raise RuntimeError(f"group already exists at {self.path}")
        for name, t in tables.items():
            if t.latest_version() is None:
                raise FileNotFoundError(
                    f"member {name!r} has no snapshots at {t.path}; "
                    "create it before grouping"
                )
        os.makedirs(self.path, exist_ok=True)
        # g0 FIRST: the ledger commit is link(2)-exclusive, so a racing
        # create loses HERE — before any spec write. Spec-first (the
        # pre-fix order) let two creators clobber each other's
        # _group.json via rename while only one won g0, leaving the
        # committed cut and the spec describing DIFFERENT member sets
        # with no error on the surviving path.
        try:
            self._commit(
                {
                    "format_version": 1,
                    "version": 0,
                    "op": "create",
                    "tables": {
                        n: t.latest_version() for n, t in tables.items()
                    },
                    "txn_id": None,
                    "metrics": {},
                    "commit_ts": time.time(),
                }
            )
        except RuntimeError:
            # g0 already exists: a concurrent creator won, OR our own
            # earlier create crashed between g0 and the spec write —
            # resumable only when the member set matches that g0
            if self.exists() or set(self.manifest(0)["tables"]) != set(
                tables
            ):
                raise RuntimeError(
                    f"group already exists at {self.path} (lost a "
                    "concurrent create, or a crashed create left a "
                    "different member set)"
                ) from None
        _fsync_write(
            self._spec_path,
            {
                "format_version": 1,
                "tables": {n: t.path for n, t in sorted(tables.items())},
                "strategy": {
                    n: member_strategy(t) for n, t in sorted(tables.items())
                },
            },
        )

    # ------------------------------------------------------------ ledger
    def _gfile(self, v: int) -> str:
        return os.path.join(self._ledger, f"g{v:08d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._ledger):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._ledger)
            if f.startswith("g") and f.endswith(".json")
            and not f.startswith("g_tmp")
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None or not os.path.exists(self._gfile(v)):
            raise LookupError(f"no group version {version} at {self.path}")
        with open(self._gfile(v)) as fh:
            return json.load(fh)

    def _commit(self, man: dict) -> None:
        # link(2)-exclusive, like every ledger in this engine: a racing
        # group commit surfaces as a conflict, never a clobber
        os.makedirs(self._ledger, exist_ok=True)
        final = self._gfile(man["version"])
        tmp = os.path.join(self._ledger, f"g_tmp-{uuid4().hex[:8]}.json")
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent group commit conflict on version "
                f"{man['version']}"
            ) from None
        finally:
            os.unlink(tmp)
        _fsync_dir(self._ledger)

    def cut(self, version: int | None = None) -> dict:
        """The consistent cut ``{name: sub_version}`` at a group version
        (default: latest)."""
        return dict(self.manifest(version)["tables"])

    def read(self, name: str, group_version: int | None = None) -> DataFrame:
        """Member state AT the group cut — cross-table snapshot
        isolation (and group-level time travel via ``group_version``)."""
        c = self.cut(group_version)
        if name not in c:
            raise LookupError(f"no member {name!r} in group cut {c}")
        return self.table(name).read(version=c[name])

    def sync(self, note: str | None = None) -> dict:
        """Advance the cut to every member's current head — the
        non-transactional commit for direct writes made between
        transactions. NOT atomic across tables (the writes already
        happened); it just republishes a coherent observation point."""
        if self.pending_transactions():
            # a torn transaction's redo window holds half-published member
            # heads; snapshotting them now would commit exactly the
            # half-visible cut the group exists to prevent
            raise TransactionTornError(
                f"group {self.path} has torn transaction(s) "
                f"{self.pending_transactions()}; run recover() before sync"
            )
        man = self.manifest()
        tables = {n: self.table(n).latest_version() for n in man["tables"]}
        out = {
            "format_version": 1,
            "version": man["version"] + 1,
            "op": "sync",
            "tables": tables,
            "txn_id": None,
            "metrics": {"note": note} if note else {},
            "commit_ts": time.time(),
        }
        self._commit(out)
        return {"version": out["version"], "tables": tables}

    def expire(self, keep_last_cuts: int = 1) -> dict:
        """Group-aware retention: drop group versions older than the
        newest ``keep_last_cuts``, then expire each member's snapshots
        down to the OLDEST sub-version any KEPT cut still pins.

        This is the only safe way to expire a member of a group: a bare
        ``member.expire_snapshots(keep_last=1)`` keeps only the member's
        head, but a group cut may pin an OLDER sub-version (the member
        advanced via direct writes that no ``sync()`` has published yet)
        — expiring it would turn every ``group.read()`` at that cut into
        a ``SnapshotExpiredError``. Here each member keeps
        ``head - min(pinned by kept cuts) + 1`` newest versions, so all
        kept cuts stay readable; expired (dropped) cuts raise the usual
        typed error. Same maintenance-owner assumption as every expire:
        no in-flight writer or transaction."""
        if self.pending_transactions():
            raise TransactionTornError(
                f"group {self.path} has torn transaction(s) "
                f"{self.pending_transactions()}; run recover() before "
                "expire"
            )
        assert keep_last_cuts >= 1, keep_last_cuts
        vs = self._versions()
        keep = vs[-keep_last_cuts:]
        drop = [v for v in vs if v not in keep]
        for v in drop:
            os.unlink(self._gfile(v))
        min_pinned: dict[str, int] = {}
        for v in keep:
            for name, sub_v in self.manifest(v)["tables"].items():
                cur = min_pinned.get(name)
                min_pinned[name] = sub_v if cur is None else min(cur, sub_v)
        members = {}
        for name, floor in min_pinned.items():
            t = self.table(name)
            head = t.latest_version()
            members[name] = t.expire_snapshots(
                keep_last=head - floor + 1
            )
        return {
            "expired_cuts": len(drop),
            "kept_cuts": keep,
            "members": members,
        }

    def history(self, limit: int | None = None) -> list[dict]:
        vs = self._versions()[::-1]
        if limit is not None:
            vs = vs[:limit]
        return [self.manifest(v) for v in vs]

    # ------------------------------------------------------ transactions
    def transaction(self) -> "GroupTransaction":
        if self.pending_transactions():
            # a torn txn holds branch forks that any new commit's fork
            # check would trip over anyway — fail early with the cure
            raise TransactionTornError(
                f"group {self.path} has torn transaction(s) "
                f"{self.pending_transactions()}; run recover() first"
            )
        return GroupTransaction(self)

    def pending_transactions(self) -> list[str]:
        if not os.path.isdir(self._txn_dir):
            return []
        return sorted(
            f[:-5] for f in os.listdir(self._txn_dir)
            if f.endswith(".json") and not f.startswith("_tmp")
        )

    def _wal_path(self, txn_id: str) -> str:
        return os.path.join(self._txn_dir, f"{txn_id}.json")

    def abandoned_branches(self) -> dict:
        """``{member: [branch, ...]}`` of ``txn_*`` staging branches with
        no WAL — left by a process that crashed BEFORE its commit point.
        They hold no group state (the transaction never happened) but pin
        member snapshots; ``recover(drop_abandoned=True)`` clears them.
        Only call when no transaction is actively staging in another
        process — the group cannot tell a crash from a slow stager."""
        pending = set(self.pending_transactions())
        out = {}
        for name in self.members():
            orphans = [
                b["name"] for b in self.table(name).branches()
                if b["name"].startswith("txn_") and b["name"] not in pending
            ]
            if orphans:
                out[name] = orphans
        return out

    def recover(self, drop_abandoned: bool = False) -> dict:
        """Finish torn transactions: a WAL passed its commit point, so
        its remaining branch publishes are replayed (``publish_branch``
        is crash-idempotent) and the group cut committed if missing.
        Safe to run any time; no-op when nothing is pending."""
        done = []
        for txn_id in self.pending_transactions():
            with open(self._wal_path(txn_id)) as fh:
                wal = json.load(fh)
            # redo the publishes, then the cut
            for name, st in wal["tables"].items():
                t = self.table(name)
                try:
                    t.publish_branch(st["branch"])
                except LookupError:
                    pass  # this table's publish already completed
                except BranchDivergedError:
                    # a CONCURRENT recover() published this very branch
                    # between our existence check and our commit — if the
                    # branch is gone now, the racer finished the publish
                    # and the divergence is ours, not the data's
                    if any(b["name"] == st["branch"]
                           for b in t.branches()):
                        raise
            self._commit_cut(wal)
            try:
                os.unlink(self._wal_path(txn_id))
            except FileNotFoundError:
                pass  # a concurrent recover() finished this WAL first
            done.append(txn_id)
        dropped = {}
        if drop_abandoned:
            for name, branches in self.abandoned_branches().items():
                for b in branches:
                    self.table(name).drop_branch(b)
                dropped[name] = branches
        return {"recovered": done, "dropped_abandoned": dropped}

    def _commit_cut(self, wal: dict) -> None:
        # retry loop: a CONCURRENT recover() racing this one can win the
        # version link — re-read, and if the winner committed this very
        # txn's cut we are done (recover must be safe from any number of
        # operators/orchestrator retries at once)
        while True:
            man = self.manifest()
            if man.get("txn_id") == wal["txn_id"]:
                return  # cut landed (before the crash, or by the racer)
            # the head alone cannot prove the cut is MISSING: a different
            # txn may have committed after ours landed (two pending WALs
            # recovered out of order) — scan the retained cut history
            # before re-committing, or recovery would duplicate the cut
            if any(
                self.manifest(v).get("txn_id") == wal["txn_id"]
                for v in self._versions()
                if v != man["version"]
            ):
                return
            tables = dict(man["tables"])
            for name in wal["tables"]:
                tables[name] = self.table(name).latest_version()
            try:
                self._commit(
                    {
                        "format_version": 1,
                        "version": man["version"] + 1,
                        "op": "txn",
                        "tables": tables,
                        "txn_id": wal["txn_id"],
                        "metrics": {"staged_tables": sorted(wal["tables"])},
                        "commit_ts": time.time(),
                    }
                )
                return
            except RuntimeError:
                continue


class GroupTransaction:
    """Stage writes to any members on transaction branches, then commit
    all-or-nothing. Use as a context manager: an exception inside the
    block rolls every staged branch back; ``commit()`` publishes them
    and advances the group cut in one logical step.

    ::

        with group.transaction() as txn:
            txn.table("transcripts").apply_changes(ev, batch_id=7)
            txn.table("audit").apply_changes(audit_rows)
            txn.commit()

    Any branch-capable table API works on ``txn.table(name)`` handles
    (``apply_changes``, ``merge_into``, ``delete_where``, ...). Reads on
    the handle see the staged state (read-your-writes); group readers
    see nothing until the commit's cut lands.
    """

    def __init__(self, group: TableGroup):
        self.group = group
        self.txn_id = f"txn_{uuid4().hex[:12]}"
        self._staged: dict[str, dict] = {}  # name -> {branch, forked_at}
        self._branch_handles: dict[str, LakeTable] = {}
        self._state = "staging"

    # ------------------------------------------------------------ handles
    def table(self, name: str) -> LakeTable:
        if self._state != "staging":
            raise RuntimeError(f"transaction is {self._state}")
        if name not in self._branch_handles:
            raw = self.group.table(name)
            meta = raw.create_branch(self.txn_id)
            self._staged[name] = {
                "branch": self.txn_id,
                "forked_at": meta["forked_at"],
            }
            self._branch_handles[name] = _open_member(
                self.group.spark, raw.path, branch=self.txn_id,
                strategy=self.group._spec().get("strategy", {}).get(name),
            )
        return self._branch_handles[name]

    # ------------------------------------------------------------- commit
    def commit(self) -> dict:
        if self._state != "staging":
            raise RuntimeError(f"transaction is {self._state}")
        if not self._staged:
            self._state = "committed"
            return {"txn_id": self.txn_id, "staged_tables": [],
                    "version": self.group.latest_version()}
        # optimistic fork check BEFORE the commit point: the common
        # conflict (another writer advanced a member's main) aborts the
        # whole transaction cleanly — nothing published anywhere
        for name, st in self._staged.items():
            head = self.group.table(name).latest_version()
            if head != st["forked_at"]:
                self.rollback()
                raise TransactionConflictError(
                    f"member {name!r} advanced to version {head} past the "
                    f"transaction fork {st['forked_at']}; transaction "
                    "aborted — re-stage and retry"
                )
        # COMMIT POINT: once this WAL is durable the transaction MUST
        # complete; everything after is its redo log (recover() replays)
        os.makedirs(self.group._txn_dir, exist_ok=True)
        _fsync_write(
            self.group._wal_path(self.txn_id),
            {
                "txn_id": self.txn_id,
                "state": "committing",
                "tables": self._staged,
                "ts": time.time(),
            },
        )
        self._state = "committing"
        published = {}
        for name, st in self._staged.items():
            try:
                out = self.group.table(name).publish_branch(st["branch"])
            except BranchDivergedError as e:
                # contract violation (a direct main write landed inside
                # the publish window). The WAL stays: recover() will
                # retry once the violator's state is reconciled.
                raise TransactionTornError(
                    f"transaction {self.txn_id} torn at member {name!r}: "
                    f"{e}; already published: {sorted(published)}. Run "
                    "TableGroup.recover() after resolving the divergence"
                ) from e
            published[name] = out.get("published_version")
        self.group._commit_cut(
            {"txn_id": self.txn_id, "tables": self._staged}
        )
        try:
            os.unlink(self.group._wal_path(self.txn_id))
        except FileNotFoundError:
            # a concurrent recover() ("safe to run any time") picked up
            # the WAL, finished this txn and unlinked it first — the
            # transaction IS committed; raising here would make the
            # caller treat a committed txn as failed (possible duplicate
            # re-submission)
            pass
        self._state = "committed"
        return {
            "txn_id": self.txn_id,
            "staged_tables": sorted(self._staged),
            "published": published,
            "version": self.group.latest_version(),
        }

    def rollback(self) -> dict:
        if self._state in ("committed", "rolled_back"):
            return {"txn_id": self.txn_id, "state": self._state}
        if self._state == "committing":
            # past the commit point the staged branches ARE the redo log:
            # dropping them would let recover() mistake "publish missing"
            # for "publish completed" and half-commit the transaction.
            # Only recover() may touch this state.
            return {"txn_id": self.txn_id, "state": "committing",
                    "action": "none — run TableGroup.recover()"}
        for name, st in self._staged.items():
            try:
                self.group.table(name).drop_branch(st["branch"])
            except LookupError:
                pass
        self._staged.clear()
        self._branch_handles.clear()
        self._state = "rolled_back"
        return {"txn_id": self.txn_id, "state": "rolled_back"}

    # ----------------------------------------------------- context mgmt
    def __enter__(self) -> "GroupTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if self._state == "staging":
            # an un-committed exit (exception OR forgotten commit) must
            # not leave staging branches pinning the members. A txn torn
            # mid-commit ("committing") is deliberately NOT rolled back —
            # rollback() no-ops there; recover() owns that state.
            self.rollback()
        return False
