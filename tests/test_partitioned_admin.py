"""Router/flat admin parity: timestamp time travel, timestamp-bounded
global change feed, TBLPROPERTIES, CHECK-constraint fan-out (including
inheritance by partitions born later), and whole-table shallow clone.

Each surface mirrors the flat LakeTable contract at GLOBAL scope; the
tests pin parity by exercising both scopes where the flat behavior is the
oracle (reference analog: collection-level admin in the reference is one
config dict per collection, convert_cdm_to_mods.py:84-102 — here it is
one spec + ledger per table, fanned to partitions).
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import SnapshotExpiredError
from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


BATCH0 = [
    ("I", 1, "c1", 0, "user", "jan hello", None, _ts(1)),
    ("I", 2, "c2", 0, "user", "feb hello", None, _ts(2)),
]
BATCH1 = [
    ("U", 3, "c1", 0, "user", "jan v2", None, _ts(1)),
    ("I", 4, "c3", 0, "user", "mar hello", None, _ts(3)),
]


@pytest.fixture
def ptab(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "padm"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _state(df):
    return {(r.conv_id, r.turn_idx): (r.role, r.text) for r in df.collect()}


# ------------------------------------------------- timestamp time travel
def test_version_as_of_and_changes_since_ts(spark, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    v1 = t.latest_version()
    time.sleep(0.05)
    mid = time.time()
    time.sleep(0.05)
    t.apply_changes(_events(spark, BATCH1), batch_id=1)

    assert t.version_as_of(mid) == v1
    assert t.version_as_of(time.time()) == t.latest_version()
    with pytest.raises(LookupError):
        t.version_as_of(mid - 3600)

    # feed strictly after mid == changes(v1): c1 update + c3 insert
    got = {(r.conv_id, r.turn_idx) for r in t.changes_since_ts(mid).collect()}
    assert got == {("c1", 0), ("c3", 0)}
    # ts before the first commit → the whole feed
    assert t.changes_since_ts(mid - 3600).count() == t.changes(0).count()
    # bounded: (before-first, mid] covers only batch 0
    early = {
        (r.conv_id, r.turn_idx)
        for r in t.changes_since_ts(mid - 3600, until_ts=mid).collect()
    }
    assert early == {("c1", 0), ("c2", 0)}


def test_changes_since_ts_fails_loud_past_retention(spark, ptab):
    t = ptab
    t0 = time.time()
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    t.apply_changes(_events(spark, BATCH1), batch_id=1)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError, match="re-seed"):
        t.changes_since_ts(t0)


# ----------------------------------------------------------- properties
def test_properties_live_on_the_spec_and_survive_reopen(spark, ptab):
    t = ptab
    assert t.properties() == {}
    t.set_property("owner", "ingest-team")
    t.set_property("retention.days", "30")
    t.unset_property("owner")
    fresh = PartitionedTable(spark, t.path, num_buckets=4, merge_mode="mor")
    assert fresh.properties() == {"retention.days": "30"}
    # each property DDL is a global commit (auditable in the ledger)
    assert t.latest_version() == 3


# ----------------------------------------------------------- constraints
def test_constraint_fans_out_to_existing_partitions(spark, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    assert [c["name"] for c in t.constraints()] == ["turn_nonneg"]
    v = t.latest_version()
    bad = _events(spark, [
        ("I", 5, "c9", -1, "user", "bad", None, _ts(1)),
    ])
    with pytest.raises(Exception, match="CHECK constraint violated"):
        t.apply_changes(bad, batch_id=1)
    assert t.latest_version() == v  # nothing landed, no global commit
    assert _state(t.read()) == {("c1", 0): ("user", "jan hello"),
                                ("c2", 0): ("user", "feb hello")}


def test_constraint_inherited_by_partition_born_later(spark, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    # violating row routed to a BRAND-NEW partition (2025-06) must still
    # fail — the new sub-table inherits the spec CHECK at create
    bad = _events(spark, [
        ("I", 6, "c6", -2, "user", "bad in new part", None, _ts(6)),
    ])
    with pytest.raises(Exception, match="CHECK constraint violated"):
        t.apply_changes(bad, batch_id=1)
    # a clean batch to the same new partition lands, and the born
    # partition carries the constraint itself
    ok = _events(spark, [
        ("I", 7, "c6", 0, "user", "jun hello", None, _ts(6)),
    ])
    t.apply_changes(ok, batch_id=2)
    assert [c["name"] for c in t.part("2025-06").constraints()] == [
        "turn_nonneg"
    ]


def test_add_constraint_validates_existing_rows(spark, ptab):
    t = ptab
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", -5, "user", "pre-existing violation", None, _ts(1)),
    ]), batch_id=0)
    with pytest.raises(ValueError, match="existing"):
        t.add_constraint("turn_nonneg", "turn_idx >= 0")
    assert t.constraints() == []


def test_drop_constraint_unblocks_everywhere(spark, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    t.add_constraint("role_known", "role in ('user','assistant')")
    t.drop_constraint("role_known")
    assert t.constraints() == []
    t.apply_changes(_events(spark, [
        ("I", 8, "c8", 0, "alien", "now fine", None, _ts(6)),
    ]), batch_id=1)
    assert ("c8", 0) in _state(t.read())
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("role_known")


# ----------------------------------------------------------------- clone
def test_clone_state_parity_and_ledger_carryover(spark, tmp_path, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    t.apply_changes(_events(spark, BATCH1), batch_id=1)
    t.set_property("owner", "a")
    t.add_constraint("turn_nonneg", "turn_idx >= 0")

    c = t.clone(str(tmp_path / "fork"))
    assert _state(c.read()) == _state(t.read())
    # exactly-once resumes: the already-applied batch is skipped
    assert c.apply_changes(_events(spark, BATCH1), batch_id=1)["skipped"]
    # spec extras travel with the clone
    assert c.properties() == {"owner": "a"}
    assert [x["name"] for x in c.constraints()] == ["turn_nonneg"]
    with pytest.raises(Exception, match="CHECK constraint violated"):
        c.apply_changes(_events(spark, [
            ("I", 9, "c9", -1, "user", "bad", None, _ts(2)),
        ]), batch_id=2)

    # divergence is independent in both directions
    c.apply_changes(_events(spark, [
        ("U", 10, "c1", 0, "user", "fork v3", None, _ts(1)),
    ]), batch_id=2)
    assert _state(t.read())[("c1", 0)] == ("user", "jan v2")
    assert _state(c.read())[("c1", 0)] == ("user", "fork v3")

    with pytest.raises(RuntimeError, match="already exists"):
        t.clone(str(tmp_path / "fork"))


def test_clone_at_historical_global_cut(spark, tmp_path, ptab):
    t = ptab
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    v1 = t.latest_version()
    t.apply_changes(_events(spark, BATCH1), batch_id=1)
    c = t.clone(str(tmp_path / "fork-v1"), version=v1)
    assert _state(c.read()) == {("c1", 0): ("user", "jan hello"),
                                ("c2", 0): ("user", "feb hello")}
    # ledger floor is the PINNED cut's: batch 0 skipped, batch 1 replays
    assert c.apply_changes(_events(spark, BATCH0), batch_id=0)["skipped"]
    c.apply_changes(_events(spark, BATCH1), batch_id=1)
    assert _state(c.read()) == _state(t.read())


def test_clone_carries_cross_partition_index(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "pidx"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    c = t.clone(str(tmp_path / "pidx-fork"))
    # a key-move upsert through the index works on the clone: c1 moves
    # from 2025-01 to 2025-05 and stays a single live row
    c.apply_changes(_events(spark, [
        ("U", 11, "c1", 0, "user", "moved", None, _ts(5)),
    ]), batch_id=1)
    rows = [r for r in c.read().collect() if r.conv_id == "c1"]
    assert len(rows) == 1 and rows[0].text == "moved"


# --------------------------------------------------------------- rebucket
def test_rebucket_fans_out_and_covers_future_partitions(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "prb"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, BATCH0), batch_id=0)
    before = _state(t.read())
    m = t.rebucket(8)
    assert m["num_buckets"] == 8
    assert _state(t.read()) == before  # state-transparent rewrite
    for p in t.partitions():
        assert t.part(p).num_buckets == 8
    # a partition born AFTER the rebucket — on a FRESH handle — is
    # created at the new count, not the constructor default
    fresh = PartitionedTable(spark, t.path, num_buckets=4,
                             merge_mode="mor")
    fresh.apply_changes(_events(spark, [
        ("I", 9, "c9", 0, "user", "sep", None, _ts(9)),
    ]), batch_id=1)
    assert fresh.part("2025-09").num_buckets == 8
    # point reads prune correctly through the new layout
    assert fresh.read_keys(["c1"]).count() == 1


def test_clone_carries_the_write_strategy_record(spark, tmp_path):
    """Round-4 review: the clone's spec must carry the source's recorded
    write strategy — a clone spec claiming default 'lww' over a
    partial_update source would mislead library-less writers and stamp
    wrong engines into clone-born partitions."""
    import json

    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    src = PartitionedTable(spark, str(tmp_path / "csrc"), num_buckets=2,
                           merge_mode="mor", merge_engine="partial_update")
    src.create(TRANSCRIPT_SCHEMA)
    src.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "x", None, _ts(1))], EVENT_DDL),
        batch_id=0)
    src.clone(str(tmp_path / "cdst"))
    with open(tmp_path / "cdst" / "_spec.json") as fh:
        spec = json.load(fh)
    assert spec["merge_engine"] == "partial_update"
    assert spec["bucket_col"] == "conv_id"
    # a plain reopen of the clone adopts it
    dst = PartitionedTable(spark, str(tmp_path / "cdst"))
    assert dst._lake_kwargs["merge_engine"] == "partial_update"


def test_read_keys_heterogeneous_bucket_layouts(spark, tmp_path):
    """A per-partition rebucket (the offered ``part().rebucket()``
    surface) makes bucket layouts heterogeneous across the cut once a
    later batch re-pins that partition. The fused point lookup must hash
    each partition's probe under ITS pinned layout — hashing everything
    with the first partition's layout prunes the key's real bucket away
    and silently returns an empty lookup (round-5 review fix)."""
    from cdm_to_mods_spark.plans.lake import _driver_bucket_ids
    from pyspark.sql import types as T

    t = PartitionedTable(spark, str(tmp_path / "het"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    # feb keys whose bucket id differs between 4- and 16-bucket layouts
    # (same-id keys would pass by accident pre-fix)
    moved = [
        k for k in (f"f{i}" for i in range(64))
        if _driver_bucket_ids([k], T.StringType(), 4)
        != _driver_bucket_ids([k], T.StringType(), 16)
    ]
    assert len(moved) >= 3, "fixture: no layout-divergent key in f0..f63"
    rows = [("I", 1, "c1", 0, "user", "jan hello", None, _ts(1))] + [
        ("I", 10 + i, k, 0, "user", f"feb {k}", None, _ts(2))
        for i, k in enumerate(moved[:3])
    ]
    t.apply_changes(_events(spark, rows), batch_id=0)
    t.part("2025-02").rebucket(16)
    # re-pin feb at a post-rebucket sub version (jan stays at 4 buckets)
    t.apply_changes(_events(spark, [
        ("I", 99, moved[0], 1, "assistant", "feb reply", None, _ts(2, 6)),
    ]), batch_id=1)
    for k in moved[:3]:
        got = t.read_keys([k]).collect()
        assert {r.turn_idx for r in got} >= {0}, f"lost {k}"
        assert all(r.conv_id == k for r in got)
    assert t.read_keys([moved[0]]).count() == 2
    # the untouched-layout partition still resolves
    assert t.read_keys(["c1"]).count() == 1
    # cross-layout probe in ONE call: both partitions' rows surface
    both = t.read_keys(["c1", moved[1]]).collect()
    assert {r.conv_id for r in both} == {"c1", moved[1]}
