"""Write-audit-publish staging branches (the Iceberg branch / Netflix WAP
pattern — the lake-scale analog of the reference's validate-before-package
flow, ref post_cdm_cleanup.py:15-37 QC pass before zipping): stage change
batches on a branch main never sees, audit against the branch handle, then
atomically fast-forward publish or drop."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from cdm_to_mods_spark.plans.lake import BranchDivergedError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
EVENT_DDL = "conv_id string, turn_idx int, text string, op string, seq long"


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


@pytest.fixture()
def table(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(SCHEMA)
    t.apply_changes(_events(spark, [("c1", 0, "hello", "I", 1)]), batch_id=0)
    return t


def _state(t):
    return {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}


def test_branch_isolation_then_squash_publish(spark, table):
    fork = table.latest_version()
    table.create_branch("audit")
    bt = LakeTable(spark, table.path, merge_mode="mor", branch="audit")
    bt.apply_changes(_events(spark, [("c1", 1, "world", "I", 2)]), batch_id=1)
    bt.apply_changes(
        _events(spark, [("c2", 0, "x", "I", 3), ("c1", 1, "world!", "U", 4)]),
        batch_id=2,
    )
    # isolation: main is untouched while the branch sees the staged merge
    assert _state(table) == {("c1", 0): "hello"}
    assert _state(bt) == {
        ("c1", 0): "hello",
        ("c1", 1): "world!",
        ("c2", 0): "x",
    }
    res = table.publish_branch("audit")
    assert res["published_version"] == fork + 1
    assert res["branch_versions"] == 2
    # fast-forward: main now reads the audited state in ONE new version
    assert _state(table) == {
        ("c1", 0): "hello",
        ("c1", 1): "world!",
        ("c2", 0): "x",
    }
    assert table.latest_version() == fork + 1
    # exactly-once state carries: replaying a published batch_id is a skip
    skip = table.apply_changes(
        _events(spark, [("c9", 0, "dup", "I", 99)]), batch_id=2
    )
    assert skip.get("skipped") is True
    # the published version's feed is the UNION of the branch commits
    feed = table.changes(fork)
    assert feed.count() == 3
    assert table.branches() == []  # publish drops the branch


def test_publish_declines_when_main_diverged(spark, table):
    table.create_branch("audit")
    bt = LakeTable(spark, table.path, merge_mode="mor", branch="audit")
    bt.apply_changes(_events(spark, [("c2", 0, "x", "I", 2)]), batch_id=1)
    # main advances past the fork point → fast-forward must refuse
    table.apply_changes(_events(spark, [("c3", 0, "y", "I", 2)]), batch_id=1)
    with pytest.raises(BranchDivergedError):
        table.publish_branch("audit")
    # the staged work is still there to re-stage from
    assert ("c2", 0) in _state(bt)
    assert ("c2", 0) not in _state(table)


def test_dropped_branch_refuses_commits(spark, table):
    table.create_branch("tmp")
    bt = LakeTable(spark, table.path, merge_mode="mor", branch="tmp")
    bt.apply_changes(_events(spark, [("c2", 0, "x", "I", 2)]), batch_id=1)
    table.drop_branch("tmp")
    with pytest.raises((RuntimeError, LookupError)):
        bt.apply_changes(_events(spark, [("c3", 0, "y", "I", 3)]), batch_id=2)
    assert _state(table) == {("c1", 0): "hello"}


def test_expire_protects_live_branch_then_gcs_dropped(spark, table):
    table.create_branch("audit")
    bt = LakeTable(spark, table.path, merge_mode="mor", branch="audit")
    bt.apply_changes(_events(spark, [("c2", 0, "x", "I", 2)]), batch_id=1)
    # advance main so the branch's fork version falls outside keep_last
    table.apply_changes(_events(spark, [("c3", 0, "y", "I", 2)]), batch_id=1)
    table.apply_changes(_events(spark, [("c4", 0, "z", "I", 3)]), batch_id=2)
    exp = table.expire_snapshots(keep_last=1)
    # the fork version is pinned for the live branch and its data survives
    assert table.manifest(1)  # fork snapshot still resolvable
    assert _state(bt) == {("c1", 0): "hello", ("c2", 0): "x"}
    assert _state(table) == {
        ("c1", 0): "hello",
        ("c3", 0): "y",
        ("c4", 0): "z",
    }
    table.drop_branch("audit")
    exp2 = table.expire_snapshots(keep_last=1)
    # with the branch gone its delta dir and the fork pin are collectable
    assert exp2["removed_data_dirs"] >= 1
    assert _state(table) == {
        ("c1", 0): "hello",
        ("c3", 0): "y",
        ("c4", 0): "z",
    }


def test_orphan_branch_files_are_expired(spark, table):
    table.create_branch("crashy")
    bt = LakeTable(spark, table.path, merge_mode="mor", branch="crashy")
    bt.apply_changes(_events(spark, [("c2", 0, "x", "I", 2)]), batch_id=1)
    # simulate a crash between publish-commit and drop: pointer vanishes,
    # the branch version files stay behind
    os.unlink(table._branch_file("crashy"))
    ledger = table._ledger
    assert any(f.startswith("b-crashy-") for f in os.listdir(ledger))
    exp = table.expire_snapshots(keep_last=2)
    assert exp["removed_orphan_branch_files"] == 1
    assert not any(f.startswith("b-crashy-") for f in os.listdir(ledger))


def test_empty_branch_publish_is_noop_drop(spark, table):
    table.create_branch("empty")
    res = table.publish_branch("empty")
    assert res["published_version"] is None
    assert table.branches() == []
    assert _state(table) == {("c1", 0): "hello"}


def test_branch_name_and_duplicate_validation(spark, table):
    with pytest.raises(ValueError):
        table.create_branch("main")
    with pytest.raises(ValueError):
        table.create_branch("bad name")
    table.create_branch("a")
    with pytest.raises(ValueError):
        table.create_branch("a")
    with pytest.raises(LookupError):
        LakeTable(spark, table.path, branch="nope")


def test_cow_feed_poison_carries_across_publish(spark, tmp_table):
    """A cow branch commit without change files poisons feeds across the
    squash exactly as it would on main."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="cow")
    t.create(SCHEMA)
    t.apply_changes(_events(spark, [("c1", 0, "hello", "I", 1)]), batch_id=0)
    fork = t.latest_version()
    t.create_branch("audit")
    bt = LakeTable(spark, tmp_table, merge_mode="cow", branch="audit")
    bt.apply_changes(_events(spark, [("c2", 0, "x", "I", 2)]), batch_id=1)
    t.publish_branch("audit")
    with pytest.raises(ValueError, match="change-data"):
        t.changes(fork).count()


def test_streaming_tail_stages_on_branch_then_publishes(spark, tmp_path):
    """Streaming WAP end-to-end: tail the whole backlog onto a staging
    branch (main table stays empty), audit the branch state against the
    replay oracle, publish, and main reads the identical audited state."""
    import pandas as pd

    from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches
    from cdm_to_mods_spark.streaming.tail import StreamingReplay
    from tests.oracle import replay_oracle

    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 2000, 30, n_batches=4, seed=42)
    events_pdf = synth_events(spark, 2000, 30, seed=42).toPandas()

    sr = StreamingReplay(
        spark,
        events_dir,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        merge_mode="mor",
        branch="staging",
    )
    bt = sr.run_to_completion()
    main = LakeTable(spark, str(tmp_path / "table"), merge_mode="mor")
    assert main.read().count() == 0  # nothing published yet

    def _final(t):
        return (
            t.read()
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)[
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            ]
        )

    want = replay_oracle(events_pdf)
    pd.testing.assert_frame_equal(_final(bt), want, check_dtype=False)  # audit
    res = main.publish_branch("staging")
    assert res["branch_versions"] >= 1
    pd.testing.assert_frame_equal(_final(main), want, check_dtype=False)


def test_publish_crash_window_recovers_on_rerun(spark, tmp_table):
    """Crash between the squash commit and the branch drop: re-running
    publish must recognize main's head as this branch's own squash and
    finish the drop instead of raising BranchDivergedError."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(SCHEMA)
    t.create_branch("wap")
    bt = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                   branch="wap")
    bt.apply_changes(_events(spark, [("c1", 0, "staged", "I", 1)]), batch_id=0)

    real_drop = LakeTable.drop_branch
    calls = {"n": 0}

    def crashing_drop(self, name):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before branch drop")
        return real_drop(self, name)

    LakeTable.drop_branch = crashing_drop
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            t.publish_branch("wap")
        # squash landed, pointer still live — a naive re-run used to raise
        res = t.publish_branch("wap")
        assert res.get("recovered") is True
        assert res["published_version"] == t.latest_version()
    finally:
        LakeTable.drop_branch = real_drop
    assert _state(t) == {("c1", 0): "staged"}
    assert all(b["name"] != "wap" for b in t.branches())


def test_published_squash_with_feedless_cow_commit_poisons_feed(spark, tmp_table):
    """A branch window holding BOTH an mor commit (cdf recorded) and a
    feed-less cow commit must still poison changes() after the squash —
    the union cdf being non-empty cannot hide the cow commit's hole."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(SCHEMA)
    fork = t.manifest()["version"]
    t.create_branch("mixed")
    mor_h = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                      branch="mixed")
    mor_h.apply_changes(_events(spark, [("c1", 0, "a", "I", 1)]), batch_id=0)
    cow_h = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="cow",
                      branch="mixed")
    cow_h.apply_changes(_events(spark, [("c2", 0, "b", "I", 2)]), batch_id=1)
    t.publish_branch("mixed")
    assert _state(t) == {("c1", 0): "a", ("c2", 0): "b"}
    with pytest.raises(ValueError, match="copy-on-write"):
        t.changes(fork).collect()


def test_branches_listing_ignores_tmp_staging_files(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(SCHEMA)
    t.create_branch("real")
    os.makedirs(os.path.join(tmp_table, "_ledger", "branches"), exist_ok=True)
    with open(os.path.join(tmp_table, "_ledger", "branches",
                           "_tmp-deadbeef.json"), "w") as fh:
        fh.write('{"name": "phantom", "forked_at": 0}')
    assert [b["name"] for b in t.branches()] == ["real"]


def test_tag_requires_main_handle(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(SCHEMA)
    t.create_branch("b1")
    bt = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                   branch="b1")
    bt.apply_changes(_events(spark, [("c1", 0, "x", "I", 1)]), batch_id=0)
    with pytest.raises(AssertionError, match="main-opened"):
        bt.tag("release")
