"""Multi-table atomic transactions (plans/txn.py): group cuts give
cross-table snapshot isolation, the WAL is the commit point, and crash
recovery converges to all-or-nothing."""

from __future__ import annotations

import json
import os

import pytest

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.txn import (
    TableGroup,
    TransactionConflictError,
    TransactionTornError,
)
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


@pytest.fixture()
def group(spark, tmp_path):
    tr = LakeTable(spark, str(tmp_path / "tr"), num_buckets=2,
                   merge_mode="mor")
    tr.create(TRANSCRIPT_SCHEMA)
    tr.apply_changes(
        _ev(spark, [("I", 1, "c1", 0, "user", "hello", None)]), batch_id=0
    )
    audit = LakeTable(spark, str(tmp_path / "audit"),
                      key_cols=("conv_id",), bucket_col="conv_id",
                      num_buckets=2, merge_mode="mor")
    import pyspark.sql.types as T

    audit.create(T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
    ]))
    g = TableGroup(spark, str(tmp_path / "grp"))
    g.create({"tr": tr, "audit": audit})
    return g


def test_create_pins_current_heads(group):
    assert group.members() == ["audit", "tr"]
    assert group.cut() == {"tr": 1, "audit": 0}
    assert group.read("tr").count() == 1
    assert group.read("audit").count() == 0


def test_commit_is_atomic_across_tables(spark, group):
    g0 = group.latest_version()
    with group.transaction() as txn:
        txn.table("tr").apply_changes(
            _ev(spark, [("I", 2, "c2", 0, "user", "second", None)]),
            batch_id=1,
        )
        txn.table("audit").apply_changes(spark.createDataFrame(
            [("I", 1, "c2", "ingested")],
            "op string, seq long, conv_id string, status string",
        ))
        # staged: the txn handle reads its own writes, the group doesn't
        assert txn.table("tr").read().count() == 2
        assert group.read("tr").count() == 1
        assert group.read("audit").count() == 0
        out = txn.commit()
    assert out["staged_tables"] == ["audit", "tr"]
    assert group.latest_version() == g0 + 1
    assert group.read("tr").count() == 2
    assert group.read("audit").count() == 1
    # group time travel still shows the pre-txn cut
    assert group.read("tr", group_version=g0).count() == 1
    # no branches or WALs left behind
    assert group.table("tr").branches() == []
    assert group.pending_transactions() == []


def test_exception_in_block_rolls_back_everything(spark, group):
    with pytest.raises(RuntimeError, match="boom"):
        with group.transaction() as txn:
            txn.table("tr").apply_changes(
                _ev(spark, [("I", 9, "c9", 0, "user", "never", None)]),
                batch_id=5,
            )
            raise RuntimeError("boom")
    assert group.read("tr").count() == 1
    assert group.table("tr").read().count() == 1  # main untouched
    assert group.table("tr").branches() == []
    # the aborted batch_id was never committed: replaying it converges
    with group.transaction() as txn:
        txn.table("tr").apply_changes(
            _ev(spark, [("I", 9, "c9", 0, "user", "now", None)]),
            batch_id=5,
        )
        txn.commit()
    assert group.read("tr").count() == 2


def test_forgotten_commit_rolls_back(spark, group):
    with group.transaction() as txn:
        txn.table("tr").apply_changes(
            _ev(spark, [("I", 3, "c3", 0, "user", "limbo", None)]),
        )
    assert group.table("tr").branches() == []
    assert group.read("tr").count() == 1


def test_conflict_aborts_cleanly_before_any_publish(spark, group):
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 4, "c4", 0, "user", "staged", None)]), batch_id=2
    )
    txn.table("audit").apply_changes(spark.createDataFrame(
        [("I", 2, "c4", "staged")],
        "op string, seq long, conv_id string, status string",
    ))
    # a direct main write to one member lands before the commit point
    group.table("audit").apply_changes(spark.createDataFrame(
        [("I", 3, "cX", "direct")],
        "op string, seq long, conv_id string, status string",
    ))
    with pytest.raises(TransactionConflictError, match="audit"):
        txn.commit()
    # nothing published anywhere, branches gone, no WAL
    assert group.table("tr").read().count() == 1
    assert group.table("tr").branches() == []
    assert group.table("audit").branches() == []
    assert group.pending_transactions() == []
    # the direct write is visible after a sync commit
    assert group.read("audit").count() == 0
    group.sync()
    assert group.read("audit").count() == 1


def test_crash_after_commit_point_recovers_to_committed(spark, group):
    """Simulate a crash between the WAL write and the publishes: write
    the WAL exactly as commit() would, then abandon the process state.
    recover() must publish both branches and land the cut."""
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 5, "c5", 0, "user", "crashy", None)]), batch_id=3
    )
    txn.table("audit").apply_changes(spark.createDataFrame(
        [("I", 4, "c5", "crashy")],
        "op string, seq long, conv_id string, status string",
    ))
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    # a new transaction refuses while the torn one is pending
    with pytest.raises(TransactionTornError, match="recover"):
        group.transaction()
    out = group.recover()
    assert out["recovered"] == [txn.txn_id]
    assert group.pending_transactions() == []
    assert group.read("tr").count() == 2
    assert group.read("audit").count() == 1
    assert group.table("tr").branches() == []


def test_crash_mid_publish_recovers_the_remainder(spark, group):
    """Crash AFTER one member published but before the other: recover()
    replays only the missing publish (the completed one raises
    LookupError internally and is skipped) and commits the cut once."""
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 6, "c6", 0, "user", "half", None)]), batch_id=4
    )
    txn.table("audit").apply_changes(spark.createDataFrame(
        [("I", 5, "c6", "half")],
        "op string, seq long, conv_id string, status string",
    ))
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    group.table("tr").publish_branch(txn.txn_id)  # first publish landed
    out = group.recover()
    assert out["recovered"] == [txn.txn_id]
    assert group.read("tr").count() == 2
    assert group.read("audit").count() == 1
    # recovery is idempotent
    assert group.recover()["recovered"] == []


def test_abandoned_staging_branches_are_discoverable(spark, group):
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 7, "c7", 0, "user", "orphan", None)]),
    )
    # process dies before commit(): no WAL, branch remains
    del txn
    orphans = group.abandoned_branches()
    assert list(orphans) == ["tr"] and len(orphans["tr"]) == 1
    out = group.recover(drop_abandoned=True)
    assert out["dropped_abandoned"] == orphans
    assert group.table("tr").branches() == []
    assert group.read("tr").count() == 1


def test_empty_transaction_commit_is_a_noop(group):
    v = group.latest_version()
    with group.transaction() as txn:
        out = txn.commit()
    assert out["staged_tables"] == []
    assert group.latest_version() == v


def test_group_reader_never_sees_half_state(spark, group):
    """The isolation property the group exists for: between the two
    member publishes, raw reads CAN be torn but group reads are not."""
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 8, "c8", 0, "user", "pair", None)]), batch_id=6
    )
    txn.table("audit").apply_changes(spark.createDataFrame(
        [("I", 6, "c8", "pair")],
        "op string, seq long, conv_id string, status string",
    ))
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    group.table("tr").publish_branch(txn.txn_id)
    # torn window: member main has the row, the cut does not...
    assert group.table("tr").read().count() == 2
    assert group.read("tr").count() == 1
    assert group.read("audit").count() == 0
    group.recover()
    # ...and after recovery both appear together
    assert group.read("tr").count() == 2
    assert group.read("audit").count() == 1

def test_torn_commit_is_not_rolled_back_and_sync_refuses(spark, group):
    """Review findings: (a) rollback()/__exit__ past the commit point
    must NOT drop the redo-log branches; (b) sync() during the redo
    window must refuse rather than commit a half-visible cut."""
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 20, "t20", 0, "user", "torn", None)]), batch_id=7
    )
    txn.table("audit").apply_changes(spark.createDataFrame(
        [("I", 7, "t20", "torn")],
        "op string, seq long, conv_id string, status string",
    ))
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    txn._state = "committing"
    group.table("tr").publish_branch(txn.txn_id)  # A published, B not
    # rollback refuses to touch a committing transaction's branches
    out = txn.rollback()
    assert out["state"] == "committing"
    assert [b["name"] for b in group.table("audit").branches()] == [
        txn.txn_id
    ]
    # sync refuses during the redo window
    with pytest.raises(TransactionTornError, match="recover"):
        group.sync()
    # recover completes BOTH members — audit's staged row must survive
    group.recover()
    assert group.read("tr").filter("conv_id = 't20'").count() == 1
    assert group.read("audit").filter("conv_id = 't20'").count() == 1


def test_exception_after_commit_point_keeps_redo_log(spark, group, monkeypatch):
    """A TransactionTornError raised INSIDE the with-block (publish
    failed mid-commit) must leave the branches for recover()."""
    txn_holder = {}
    with pytest.raises(TransactionTornError):
        with group.transaction() as txn:
            txn_holder["txn"] = txn
            txn.table("tr").apply_changes(
                _ev(spark, [("I", 21, "t21", 0, "user", "mid", None)]),
                batch_id=8,
            )
            txn.table("audit").apply_changes(spark.createDataFrame(
                [("I", 8, "t21", "mid")],
                "op string, seq long, conv_id string, status string",
            ))
            # force the second publish to diverge mid-commit
            real_publish = type(group.table("tr")).publish_branch

            def failing(self, name):
                if self.path.endswith("audit"):
                    from cdm_to_mods_spark.plans.lake import (
                        BranchDivergedError,
                    )
                    raise BranchDivergedError("injected")
                return real_publish(self, name)

            monkeypatch.setattr(type(group.table("tr")),
                                "publish_branch", failing)
            txn.commit()
    monkeypatch.undo()
    # the WAL and audit's branch survive the exception unwind
    assert group.pending_transactions() == [txn_holder["txn"].txn_id]
    assert [b["name"] for b in group.table("audit").branches()] == [
        txn_holder["txn"].txn_id
    ]
    group.recover()
    assert group.read("tr").filter("conv_id = 't21'").count() == 1
    assert group.read("audit").filter("conv_id = 't21'").count() == 1


def test_group_replays_member_write_strategy(spark, tmp_path):
    """A mor member staged through a transaction must commit mor (a
    default-cow branch handle would change the write shape and poison
    the change feed with cow-without-CDF commits)."""
    t = LakeTable(spark, str(tmp_path / "morred"), num_buckets=2,
                  merge_mode="mor", compact_deltas=5)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _ev(spark, [("I", 1, "c1", 0, "user", "seed", None)]), batch_id=0)
    g = TableGroup(spark, str(tmp_path / "gs"))
    g.create({"m": t})
    # fresh group object (no cached handles) — the spec must carry it
    g2 = TableGroup(spark, str(tmp_path / "gs"))
    assert g2.table("m").merge_mode == "mor"
    assert g2.table("m").compact_deltas == 5
    with g2.transaction() as txn:
        h = txn.table("m")
        assert h.merge_mode == "mor"
        h.apply_changes(
            _ev(spark, [("I", 2, "c2", 0, "user", "txn", None)]),
            batch_id=1)
        txn.commit()
    # the published commit ran merge-on-read and the feed serves it
    hist = g2.table("m").history(limit=1)[0]
    assert hist["metrics"].get("mode") != "cow"
    feed = g2.table("m").changes(1)
    assert [r.conv_id for r in feed.collect()] == ["c2"]


def test_group_aware_expire_keeps_pinned_member_versions(spark, group):
    """Member snapshot expiry must not destroy versions the kept group
    cuts pin — even when a member advanced past the cut via direct
    writes no sync() published."""
    # grow some history: two committed transactions
    for i, seq in enumerate([(10, "x1"), (11, "x2")]):
        with group.transaction() as txn:
            txn.table("tr").apply_changes(
                _ev(spark, [("I", seq[0], seq[1], 0, "user", "r", None)]),
                batch_id=10 + i)
            txn.commit()
    pinned = group.cut()["tr"]
    # the member advances TWICE past the latest cut (no sync)
    for j in range(2):
        group.table("tr").apply_changes(
            _ev(spark, [("I", 20 + j, f"d{j}", 0, "user", "direct", None)]),
            batch_id=20 + j)
    assert group.table("tr").latest_version() == pinned + 2
    out = group.expire(keep_last_cuts=2)
    assert out["expired_cuts"] >= 1
    # both kept cuts still read cleanly through the group
    for gv in out["kept_cuts"]:
        assert group.read("tr", group_version=gv).count() >= 1
    # the member kept the pinned version (head-floor+1 versions retained)
    assert pinned in group.table("tr")._versions()
    # dropped cuts raise the typed lookup error
    with pytest.raises(LookupError):
        group.read("tr", group_version=0)
    # a naive member-side expire would have removed `pinned`:
    assert group.table("tr").read(version=pinned).count() >= 1


def test_group_expire_refuses_during_torn_txn(spark, group):
    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 30, "t30", 0, "user", "torn", None)]),
        batch_id=30)
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    with pytest.raises(TransactionTornError, match="expire"):
        group.expire()
    group.recover()
    assert group.expire(keep_last_cuts=1)["kept_cuts"]


def test_refresh_strategy_updates_the_spec(spark, group, tmp_path):
    # simulate an owner's deliberate strategy change: re-record from a
    # handle opened with new write args
    new_handle = LakeTable(spark, group.table("tr").path,
                           merge_mode="mor", compact_deltas=3)
    rec = group.refresh_strategy("tr", new_handle)
    assert rec["compact_deltas"] == 3
    # fresh group object reopens with the refreshed record
    g2 = TableGroup(spark, group.path)
    assert g2.table("tr").compact_deltas == 3
    with pytest.raises(LookupError, match="no member"):
        group.refresh_strategy("nope", new_handle)
    # the handle is REQUIRED: a default reopen would silently re-record
    # constructor defaults over the owner's recorded choice
    with pytest.raises(TypeError, match="live handle"):
        group.refresh_strategy("tr", None)


def test_concurrent_recover_converges(spark, group):
    """Two operators run recover() at once on the same torn transaction
    (orchestrator retry racing a human): publish_branch is idempotent,
    the cut commit retries past the racer's version, and the WAL unlink
    tolerates the racer finishing first — one cut, no errors."""
    import threading

    txn = group.transaction()
    txn.table("tr").apply_changes(
        _ev(spark, [("I", 40, "t40", 0, "user", "torn row", None)]),
        batch_id=40)
    os.makedirs(group._txn_dir, exist_ok=True)
    with open(group._wal_path(txn.txn_id), "w") as fh:
        json.dump({"txn_id": txn.txn_id, "state": "committing",
                   "tables": txn._staged, "ts": 0}, fh)
    errs, outs = [], []

    def run():
        try:
            # fresh handle per thread — operators don't share objects
            outs.append(TableGroup(spark, group.path).recover())
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = [threading.Thread(target=run) for _ in range(2)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    # exactly ONE cut landed for the txn, and the staged row is visible
    cuts = [m for m in group.history() if m.get("txn_id") == txn.txn_id]
    assert len(cuts) == 1
    assert group.read("tr").filter("conv_id = 't40'").count() == 1
    assert group.pending_transactions() == []


def test_create_race_and_crash_resume(spark, tmp_path):
    """g0 commits BEFORE the spec write (link-exclusive), so a losing
    concurrent create errors cleanly instead of clobbering the winner's
    member spec; a create that crashed between g0 and the spec write is
    resumable with the same member set."""
    import os

    from cdm_to_mods_spark.plans.txn import TableGroup

    a = LakeTable(spark, str(tmp_path / "a"), num_buckets=2)
    a.create(TRANSCRIPT_SCHEMA)
    g = TableGroup(spark, str(tmp_path / "grp"))
    g.create({"a": a})
    # a second create (concurrent loser) fails cleanly, spec intact
    with pytest.raises(RuntimeError, match="already exists"):
        TableGroup(spark, str(tmp_path / "grp")).create({"a": a})
    assert TableGroup(spark, str(tmp_path / "grp")).read("a").count() >= 0
    # crashed create: g0 landed, spec missing -> same-member retry finishes
    g2path = str(tmp_path / "grp2")
    g2 = TableGroup(spark, g2path)
    g2.create({"a": a})
    os.unlink(os.path.join(g2path, "_group.json"))
    TableGroup(spark, g2path).create({"a": a})  # resumes, no error
    assert TableGroup(spark, g2path).read("a").count() >= 0
    # ...but a DIFFERENT member set does not silently adopt
    b = LakeTable(spark, str(tmp_path / "b"), num_buckets=2)
    b.create(TRANSCRIPT_SCHEMA)
    g3path = str(tmp_path / "grp3")
    TableGroup(spark, g3path).create({"a": a})
    os.unlink(os.path.join(g3path, "_group.json"))
    with pytest.raises(RuntimeError, match="different member set"):
        TableGroup(spark, g3path).create({"a": a, "b": b})


def test_recover_skips_cut_already_in_history(spark, tmp_path):
    """A pending WAL whose cut already landed BELOW head (another txn
    committed after it) must not re-commit a duplicate cut — the
    idempotence check scans retained history, not just the head."""
    import json as _json
    import os

    from cdm_to_mods_spark.plans.txn import TableGroup

    a = LakeTable(spark, str(tmp_path / "a"), num_buckets=2)
    a.create(TRANSCRIPT_SCHEMA)
    g = TableGroup(spark, str(tmp_path / "grp"))
    g.create({"a": a})
    with g.transaction() as txn:
        txn.table("a").apply_changes(spark.createDataFrame(
            [("I", 1, "c1", 0, "user", "x", None, None)],
            "op string, seq long, conv_id string, turn_idx int, "
            "role string, text string, tool string, ts timestamp",
        ), batch_id=0)
        txn.commit()
    committed_txn = g.manifest()["txn_id"]
    with g.transaction() as txn2:
        txn2.table("a").apply_changes(spark.createDataFrame(
            [("I", 2, "c2", 0, "user", "y", None, None)],
            "op string, seq long, conv_id string, turn_idx int, "
            "role string, text string, tool string, ts timestamp",
        ), batch_id=1)
        txn2.commit()
    v_head = g.latest_version()
    # resurrect txn1's WAL (crash-before-unlink with a later head); the
    # branch was already dropped by publish, so recover()'s publish redo
    # no-ops and only the cut idempotence check is exercised
    wal = {
        "txn_id": committed_txn,
        "tables": {"a": {"branch": committed_txn, "forked_at": 0}},
    }
    os.makedirs(os.path.join(str(tmp_path / "grp"), "_txn"), exist_ok=True)
    with open(g._wal_path(committed_txn), "w") as fh:
        _json.dump(wal, fh)
    g.recover()
    # no duplicate cut: head unchanged, WAL consumed
    assert g.latest_version() == v_head
    assert not os.path.exists(g._wal_path(committed_txn))
