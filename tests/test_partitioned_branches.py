"""Global write-audit-publish branches + tags on the partition router.

The flat LakeTable's WAP surface (create_branch / publish_branch /
drop_branch, tests/test_branches.py) composed across partitions: a
global branch namespaces the GLOBAL ledger (``gb-<name>-g*.json``) and
rides each partition's own flat branch, so staging isolation, squash
publish, exactly-once survival and crash recovery are inherited — the
router only adds the consistent-cut bookkeeping.

Reference analog: post_cdm_cleanup.py's QC pass before packaging — audit
the whole output set, then publish it atomically.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import BranchDivergedError
from cdm_to_mods_spark.plans.partitioned import (
    PartitionedTable,
    PartitionRetentionError,
)
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month):
    return dt.datetime(2025, month, 5, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _state(tbl):
    return sorted((r.conv_id, r.text) for r in tbl.read().collect())


@pytest.fixture()
def seeded(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "pt"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _ts(2)),
    ]), batch_id=0)
    return t


def _open_branch(spark, t, name):
    return PartitionedTable(spark, t.path, branch=name, num_buckets=4,
                            merge_mode="mor")


def test_stage_isolates_then_publish_fast_forwards(spark, seeded):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "jan-v2", None, _ts(1)),
        ("I", 4, "c9", 0, "user", "new-in-branch", None, _ts(6)),
    ]), batch_id=1)
    # staging is invisible on main; partition born in-branch too
    assert _state(t) == [("c1", "jan"), ("c2", "feb")]
    assert "2025-06" not in t.partitions()
    assert _state(b) == [("c1", "jan-v2"), ("c2", "feb"),
                         ("c9", "new-in-branch")]
    res = t.publish_branch("audit")
    assert res["published_version"] == t.latest_version()
    assert _state(t) == [("c1", "jan-v2"), ("c2", "feb"),
                         ("c9", "new-in-branch")]
    assert "2025-06" in t.partitions()
    assert t.branches() == []
    # exactly-once replay state survived the squash
    skip = t.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "x", None, _ts(1)),
    ]), batch_id=1)
    assert skip.get("skipped") is True


def test_branch_time_travel_spans_the_fork(spark, seeded):
    t = seeded
    v_fork = t.latest_version()
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "jan-v2", None, _ts(1)),
    ]), batch_id=1)
    # versions are dense across the fork: pre-fork cut readable on branch
    assert sorted((r.conv_id, r.text)
                  for r in b.read(version=v_fork).collect()) == [
        ("c1", "jan"), ("c2", "feb")]


def test_publish_declines_when_main_advanced(spark, seeded):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "staged", None, _ts(1)),
    ]), batch_id=1)
    t.apply_changes(_events(spark, [
        ("I", 4, "c3", 0, "user", "mar on main", None, _ts(3)),
    ]), batch_id=2)
    with pytest.raises(BranchDivergedError):
        t.publish_branch("audit")
    # the branch is still droppable; main keeps its own commits
    t.drop_branch("audit")
    assert ("c3", "mar on main") in _state(t)
    assert ("c1", "staged") not in _state(t)


def test_publish_crash_between_commit_and_drop_recovers(
    spark, seeded, monkeypatch
):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "staged", None, _ts(1)),
    ]), batch_id=1)
    orig = PartitionedTable.drop_branch
    calls = {"n": 0}

    def crash_once(self, name):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before pointer drop")
        return orig(self, name)

    monkeypatch.setattr(PartitionedTable, "drop_branch", crash_once)
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.publish_branch("audit")
    # squash landed on main but the pointer survived the crash
    assert ("c1", "staged") in _state(t)
    assert [m["name"] for m in t.branches()] == ["audit"]
    res = t.publish_branch("audit")  # re-run finishes idempotently
    assert res.get("recovered") is True
    assert t.branches() == []
    assert ("c1", "staged") in _state(t)


def test_empty_branch_publish_is_a_pointer_drop(spark, seeded):
    t = seeded
    t.create_branch("noop")
    res = t.publish_branch("noop")
    assert res["branch_versions"] == 0 and res["published_version"] is None
    assert t.branches() == []


def test_drop_branch_discards_staging_and_sub_branches(spark, seeded):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "staged", None, _ts(1)),
        ("I", 4, "c9", 0, "user", "branch-only part", None, _ts(6)),
    ]), batch_id=1)
    t.drop_branch("audit")
    assert _state(t) == [("c1", "jan"), ("c2", "feb")]
    assert t.part("2025-01").branches() == []
    with pytest.raises(LookupError):
        _open_branch(spark, t, "audit").read()
    # the branch-only partition dir is unreferenced garbage now — the
    # next expire sweeps it
    out = t.expire_snapshots(keep_last=1)
    assert out["parts"].get("2025-06", {}).get(
        "removed_unreferenced_dir") is True
    assert "2025-06" not in t.partitions()


def test_live_branch_protects_fork_and_branch_only_partition(spark, seeded):
    t = seeded
    v_fork = t.latest_version()
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("I", 3, "c9", 0, "user", "branch-only", None, _ts(6)),
    ]), batch_id=1)
    t.apply_changes(_events(spark, [
        ("I", 4, "c3", 0, "user", "mar", None, _ts(3)),
    ]), batch_id=2)
    out = t.expire_snapshots(keep_last=1)
    # fork cut pinned for the live branch; branch-only dir survives
    assert v_fork in out["kept"]
    assert out["parts"].get("2025-06") == {"branch_only": True}
    assert _state(b)[-1] == ("c9", "branch-only")


def test_global_tags_pin_cuts_through_expiry(spark, seeded):
    t = seeded
    t.tag("golden")
    v_tag = t.tag_version("golden")
    t.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "jan-v2", None, _ts(1)),
    ]), batch_id=1)
    out = t.expire_snapshots(keep_last=1)
    assert v_tag in out["kept"]
    assert sorted((r.conv_id, r.text)
                  for r in t.read_tag("golden").collect()) == [
        ("c1", "jan"), ("c2", "feb")]
    t.delete_tag("golden")
    with pytest.raises(LookupError):
        t.tag_version("golden")


def test_branch_rides_the_cross_partition_index(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "xpb"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True,
                         index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ]), batch_id=0)
    t.create_branch("audit")
    b = PartitionedTable(spark, t.path, branch="audit")
    # stage a MOVE: must not leak routing into main's index
    b.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "moved", None, _ts(3)),
    ]), batch_id=1)
    assert _state(t) == [("c1", "jan")]
    assert [r.text for r in t.read_keys(["c1"]).collect()] == ["jan"]
    assert _state(b) == [("c1", "moved")]
    assert [r.text for r in b.read_keys(["c1"]).collect()] == ["moved"]
    t.publish_branch("audit")
    assert _state(t) == [("c1", "moved")]
    # main's index now routes to the new home
    assert [r.text for r in t.read_keys(["c1"]).collect()] == ["moved"]
    assert t.verify_index()["ok"]


def test_recreate_after_crashed_drop_never_resurrects_staging(spark, seeded):
    """A drop_branch that crashed after removing the global pointer (but
    before the sub-branch fan-out) leaves stale sub-branches; a later
    create_branch under the same name must fork FRESH, not adopt them."""
    import os

    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "stale staged", None, _ts(1)),
    ]), batch_id=1)
    # simulate the crash window: global pointer + gb files gone, sub
    # branches left behind
    os.unlink(t._gbranch_file("audit"))
    for bv in t._gbranch_vfile_versions(os.listdir(t._ledger), "audit"):
        os.remove(os.path.join(t._ledger, t._gvfile_name(bv, "audit")))
    assert t.part("2025-01").branches()  # stale sub branch exists
    t.create_branch("audit")
    b2 = _open_branch(spark, t, "audit")
    assert _state(b2) == [("c1", "jan"), ("c2", "feb")]  # fresh fork
    t.publish_branch("audit")  # nothing staged → pointer drop
    assert _state(t) == [("c1", "jan"), ("c2", "feb")]


def test_streaming_tail_stages_on_a_global_branch(spark, tmp_path):
    """StreamingReplay(partition_by=..., branch=...) — the whole stream
    stages invisibly, then one publish fast-forwards main (the flat
    streaming-WAP contract composed through the router)."""
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.sources.synth import (
        synth_events,
        write_event_batches,
    )
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 800, 20, n_batches=2, seed=42)
    sr = StreamingReplay(
        spark, events_dir, str(tmp_path / "ptab"), str(tmp_path / "ckpt"),
        num_buckets=4, merge_mode="mor", partition_by="month",
        branch="audit",
    )
    staged = sr.run_to_completion()
    assert staged.branch == "audit"
    assert staged.read().count() > 0
    main = PartitionedTable(spark, str(tmp_path / "ptab"))
    assert main.read().count() == 0  # invisible until publish
    main.publish_branch("audit")
    # differential oracle: batch router fed the same events on main
    o = PartitionedTable(spark, str(tmp_path / "oracle"), num_buckets=4,
                         merge_mode="mor")
    o.create(TRANSCRIPT_SCHEMA)
    o.apply_changes(synth_events(spark, 800, 20, seed=42), batch_id=0,
                    transform=apply_chain)
    key = lambda df: {  # noqa: E731
        (r.conv_id, r.turn_idx, r.ts): (r.role, r.text)
        for r in df.collect()
    }
    assert key(main.read()) == key(o.read())


def test_create_branch_refuses_duplicate_without_touching_staging(
    spark, seeded
):
    """Re-creating a LIVE branch must fail BEFORE the sub fan-out — the
    drop/re-fork recovery is for crash leftovers only, and running it
    under a live global branch would destroy its staged sub versions."""
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "staged", None, _ts(1)),
    ]), batch_id=1)
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("audit")
    assert _state(b) == [("c1", "staged"), ("c2", "feb")]  # staging intact
    t.publish_branch("audit")
    assert ("c1", "staged") in _state(t)


def test_branch_and_tag_names_validated(spark, seeded):
    t = seeded
    for bad in ("main", "../escape", "has space", ""):
        with pytest.raises(ValueError, match="invalid branch name"):
            t.create_branch(bad)
    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../escape")


def test_publish_commit_conflict_raises_diverged(spark, seeded, monkeypatch):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    b.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "staged", None, _ts(1)),
    ]), batch_id=1)

    def conflict(self, man):
        raise RuntimeError("concurrent commit conflict on global version 2")

    monkeypatch.setattr(PartitionedTable, "_commit_global", conflict)
    with pytest.raises(BranchDivergedError, match="single-writer"):
        t.publish_branch("audit")


def test_drop_branch_tolerates_crash_leftover_partition_dir(spark, seeded):
    import os

    t = seeded
    t.create_branch("audit")
    # a branch apply that died inside create(): directory, no commits
    os.makedirs(os.path.join(t.path, "part=2025-09", "_ledger"),
                exist_ok=True)
    out = t.drop_branch("audit")
    assert out["dropped"] == "audit"


def test_cross_partition_refuses_non_lww_engines(spark, tmp_path):
    for engine in ("partial_update", "aggregate", "first_row"):
        with pytest.raises(ValueError, match="merge_engine='lww'"):
            PartitionedTable(spark, str(tmp_path / engine),
                             cross_partition_upsert=True,
                             merge_engine=engine)


def test_branch_tail_refuses_in_loop_maintenance(spark, tmp_path):
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    with pytest.raises(ValueError, match="maintain_every"):
        StreamingReplay(
            spark, str(tmp_path / "ev"), str(tmp_path / "pt"),
            str(tmp_path / "ck"), partition_by="month", branch="audit",
            maintain_every=2,
        )


def test_branch_refuses_maintenance_and_ddl(spark, seeded):
    t = seeded
    t.create_branch("audit")
    b = _open_branch(spark, t, "audit")
    with pytest.raises(AssertionError):
        b.drop_partition("2025-01")
    with pytest.raises(AssertionError):
        b.expire_snapshots()
    with pytest.raises(AssertionError):
        b.add_column("lang", "string")
    with pytest.raises(LookupError):  # unknown branch fails loud at read
        PartitionedTable(spark, t.path, branch="ghost").read()
