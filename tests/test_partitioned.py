"""PartitionedTable: time(ts) x bucket(key) composite spec.

The differential oracle throughout is a FLAT LakeTable fed the same
events: under the spec's identity rule (partition value is part of row
identity) the two agree whenever no key's ts crosses partitions, and the
one test where a key DOES cross partitions pins the documented Paimon
divergence (two live rows) explicitly.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.partitioned import (
    NULL_PART,
    PartitionRetentionError,
    PartitionedTable,
)
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


THREE_MONTHS = [
    # january conversation
    ("I", 1, "c1", 0, "user", "jan hello", None, _ts(1)),
    ("I", 2, "c1", 1, "assistant", "jan reply", "search", _ts(1, 6)),
    # february conversation
    ("I", 3, "c2", 0, "user", "feb hello", None, _ts(2)),
    # march conversation + an update within march
    ("I", 4, "c3", 0, "user", "mar v1", None, _ts(3)),
    ("U", 5, "c3", 0, "user", "mar v2", None, _ts(3)),
]


@pytest.fixture(params=["cow", "mor"])
def ptable(spark, tmp_path, request):
    t = PartitionedTable(
        spark,
        str(tmp_path / "ptab"),
        num_buckets=4,
        merge_mode=request.param,
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _state(df):
    return {
        (r.conv_id, r.turn_idx, r.ts): (r.role, r.text, r.tool)
        for r in df.collect()
    }


def _flat_oracle(spark, tmp_path, events_batches, merge_mode):
    o = LakeTable(spark, str(tmp_path / "flat-oracle"), num_buckets=4,
                  merge_mode=merge_mode)
    o.create(TRANSCRIPT_SCHEMA)
    for i, ev in enumerate(events_batches):
        o.apply_changes(ev, batch_id=i)
    return o


def test_routing_matches_flat_oracle(spark, tmp_path, ptable):
    ev = _events(spark, THREE_MONTHS)
    m = ptable.apply_changes(ev, batch_id=0)
    assert m["n_parts_touched"] == 3 and not m["staged"]
    assert ptable.partitions() == ["2025-01", "2025-02", "2025-03"]
    for p in ptable.partitions():
        assert os.path.isdir(os.path.join(ptable.path, f"part={p}"))
    oracle = _flat_oracle(spark, tmp_path, [ev],
                          ptable._lake_kwargs["merge_mode"])
    assert _state(ptable.read()) == _state(oracle.read())


def test_exactly_once_and_crash_replay(spark, tmp_path, ptable):
    ev = _events(spark, THREE_MONTHS)
    ptable.apply_changes(ev, batch_id=0)
    assert ptable.apply_changes(ev, batch_id=0)["skipped"]

    # crash mid-fan-out: partition 2025-01's slice of batch 1 committed,
    # global commit never landed — the replay must converge
    b1 = _events(spark, [
        ("U", 6, "c1", 0, "user", "jan hello v2", None, _ts(1)),
        ("U", 7, "c2", 0, "user", "feb hello v2", None, _ts(2)),
    ])
    jan = ptable.part("2025-01")
    jan.apply_changes(b1.filter(F.month("ts") == 1), batch_id=1)
    m = ptable.apply_changes(b1, batch_id=1)
    assert m["parts"]["2025-01"].get("skipped") is True
    oracle = _flat_oracle(spark, tmp_path,
                          [_events(spark, THREE_MONTHS), b1],
                          ptable._lake_kwargs["merge_mode"])
    assert _state(ptable.read()) == _state(oracle.read())


def test_read_range_prunes_partitions(spark, ptable, monkeypatch):
    """Partition pruning is driver-side: a partition-column range reaches
    the scan layer with ONLY the overlapping months. Round 5: the scan
    layer is the fused single-plan read — the spy records the
    partition-pruned item list it receives (and the per-sub union
    fallback receives the same list, so the property is path-agnostic)."""
    ptable.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    seen = []
    orig = PartitionedTable._fused_read_range

    def spy(self, man, items, lo, hi, col):
        seen.append([p for p, _ in items])
        return orig(self, man, items, lo, hi, col)

    monkeypatch.setattr(PartitionedTable, "_fused_read_range", spy)
    got = ptable.read_range(_ts(2, 1), _ts(2, 28)).collect()
    assert {r.conv_id for r in got} == {"c2"}
    # only february survives the driver-side prune
    assert seen[-1] == ["2025-02"]

    # ranging on a NON-partition column fans out (no partition prune)
    ptable.read_range(0, 99, col="turn_idx").collect()
    assert seen[-1] == ["2025-01", "2025-02", "2025-03"]


def test_cross_partition_key_is_two_rows(spark, ptable):
    """The documented Paimon identity rule: same (conv_id, turn_idx) in two
    months = two rows; the flat table would LWW them into one."""
    ptable.apply_changes(_events(spark, [
        ("I", 1, "cx", 0, "user", "january row", None, _ts(1)),
        ("U", 2, "cx", 0, "user", "march row", None, _ts(3)),
    ]), batch_id=0)
    rows = ptable.read().filter(F.col("conv_id") == "cx").collect()
    assert len(rows) == 2
    assert {r.text for r in rows} == {"january row", "march row"}


def test_null_partition_routes_to_default(spark, ptable):
    ptable.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "dated", None, _ts(1)),
        ("I", 2, "c9", 0, "user", "undated", None, None),
    ]), batch_id=0)
    assert NULL_PART in ptable.partitions()
    assert ptable.read().count() == 2
    # a range read never matches null ts — the default partition is skipped
    got = ptable.read_range(_ts(1, 1), _ts(12, 28)).collect()
    assert {r.conv_id for r in got} == {"c1"}


def test_read_keys_probes_all_partitions(spark, ptable):
    ptable.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    got = ptable.read_keys(["c1", "c3"]).collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {
        ("c1", 0), ("c1", 1), ("c3", 0)
    }
    assert ptable.read_keys([]).count() == 0


def test_time_travel_consistent_cut(spark, ptable):
    ptable.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v1 = ptable.latest_version()
    ptable.apply_changes(_events(spark, [
        ("U", 6, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("I", 7, "c4", 0, "user", "april", None, _ts(4)),
    ]), batch_id=1)
    old = _state(ptable.read(version=v1))
    assert ("c4", 0, _ts(4)) not in old
    assert old[("c1", 0, _ts(1))][1] == "jan hello"
    now = _state(ptable.read())
    assert now[("c1", 0, _ts(1))][1] == "jan v2"
    assert ("c4", 0, _ts(4)) in now


@pytest.fixture()
def mor_ptable(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "pmor"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_global_change_feed(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v1 = t.latest_version()
    t.apply_changes(_events(spark, [
        ("U", 6, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("I", 7, "c4", 0, "user", "april", None, _ts(4)),
    ]), batch_id=1)
    all_rows = t.changes(0)
    # in-batch dedup collapses c3's I+U to one resolved row
    assert all_rows.count() == 6
    tail = t.changes(v1, with_version=True)
    assert {(r.conv_id, r["_version"]) for r in tail.collect()} == {
        ("c1", v1 + 1), ("c4", v1 + 1)
    }


def test_global_row_changes(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "prc"), num_buckets=4,
                         merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v1 = t.latest_version()
    t.apply_changes(_events(spark, [
        ("U", 6, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("I", 7, "c4", 0, "user", "april", None, _ts(4)),
    ]), batch_id=1)
    tail = t.row_changes(v1)
    got = sorted((r.conv_id, r["_change_type"], r["_version"])
                 for r in tail.collect())
    # _version is the GLOBAL commit, not the per-partition sub-version
    assert got == [
        ("c1", "update_postimage", v1 + 1),
        ("c1", "update_preimage", v1 + 1),
        ("c4", "insert", v1 + 1),
    ]
    # full-range read carries the seed inserts too
    assert t.row_changes(0).filter(
        F.col("_change_type") == "insert").count() >= 5
    # drop/recreate detection matches the resolved feed's contract
    t.drop_partition("2025-04")
    with pytest.raises(PartitionRetentionError):
        t.row_changes(v1).collect()


def test_row_changes_requires_lookup_producer(spark, mor_ptable):
    from cdm_to_mods_spark.plans.lake import ChangelogUnavailableError

    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    with pytest.raises(ChangelogUnavailableError):
        t.row_changes(0).collect()


def test_drop_partition_retention(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v1 = t.latest_version()
    res = t.drop_partition("2025-01")
    assert res["committed"] and res["removed_dir"]
    assert "2025-01" not in t.partitions()
    assert {r.conv_id for r in t.read().collect()} == {"c2", "c3"}
    # pinned read at the pre-drop cut now raises the typed retention error
    with pytest.raises(PartitionRetentionError):
        t.read(version=v1).collect()
    # change feed crossing the drop fails loud too
    with pytest.raises(PartitionRetentionError):
        t.changes(0)
    # re-drop of an unknown partition is refused; of a crashed one, idempotent
    with pytest.raises(LookupError):
        t.drop_partition("2025-09")


def test_expire_snapshots_bounds_time_travel(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.apply_changes(_events(spark, [
        ("U", 6, "c1", 0, "user", "jan v2", None, _ts(1)),
    ]), batch_id=1)
    t.apply_changes(_events(spark, [
        ("U", 7, "c2", 0, "user", "feb v2", None, _ts(2)),
    ]), batch_id=2)
    keep_from = t.latest_version() - 1
    out = t.expire_snapshots(keep_last=2)
    assert out["expired_global"] >= 1
    with pytest.raises(LookupError):
        t.manifest(0)
    state = _state(t.read(version=keep_from))  # kept cut still readable
    assert state[("c1", 0, _ts(1))][1] == "jan v2"
    assert _state(t.read())[("c2", 0, _ts(2))][1] == "feb v2"


def test_reopen_adopts_spec(spark, ptable):
    ptable.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    re = PartitionedTable(spark, ptable.path,
                          **{k: v for k, v in ptable._lake_kwargs.items()})
    assert re.partitions() == ["2025-01", "2025-02", "2025-03"]
    assert re.read().count() == 4  # c3's I+U collapse to one live row
    with pytest.raises(ValueError):
        PartitionedTable(spark, ptable.path, granularity="day")


def test_bootstrap_then_catchup(spark, tmp_path, ptable):
    snap = spark.createDataFrame(
        [("c1", 0, "user", "jan hello", None, _ts(1)),
         ("c2", 0, "user", "feb hello", None, _ts(2))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ptable.bootstrap(snap, snapshot_seq=10)
    with pytest.raises(RuntimeError):
        ptable.bootstrap(snap, snapshot_seq=10)
    # overlap-tolerant catch-up: seq 9 loses to the snapshot, 11 wins
    ptable.apply_changes(_events(spark, [
        ("U", 9, "c1", 0, "user", "stale", None, _ts(1)),
        ("U", 11, "c2", 0, "user", "feb v2", None, _ts(2)),
    ]), batch_id=0)
    st = _state(ptable.read())
    assert st[("c1", 0, _ts(1))][1] == "jan hello"
    assert st[("c2", 0, _ts(2))][1] == "feb v2"


def test_compact_and_maintain_fan_out(spark, mor_ptable):
    t = mor_ptable
    for i in range(3):
        t.apply_changes(_events(spark, [
            ("U", 10 + i, "c1", 0, "user", f"jan v{i}", None, _ts(1)),
            ("U", 20 + i, "c2", 0, "user", f"feb v{i}", None, _ts(2)),
        ]), batch_id=i)
    before = _state(t.read())
    res = t.compact()
    assert set(res) == {"2025-01", "2025-02"}
    assert _state(t.read()) == before
    out = t.maintain(dry_run=True)
    assert set(out) == {"2025-01", "2025-02"}


def test_backfill_stages_once(spark, tmp_path):
    """Multi-partition batches run ONE Spark job: fused for mor (the
    round-4 routing-tax cut), staged-once for cow past stage_threshold."""
    t = PartitionedTable(spark, str(tmp_path / "pstage"), num_buckets=2,
                         merge_mode="mor", stage_threshold=3)
    t.create(TRANSCRIPT_SCHEMA)
    rows = [
        ("I", m, f"c{m}", 0, "user", f"month {m}", None, _ts(m))
        for m in range(1, 7)
    ]
    m = t.apply_changes(_events(spark, rows), batch_id=0)
    assert m["fused"] and m["n_parts_touched"] == 6
    assert t.read().count() == 6
    assert not os.path.isdir(os.path.join(t.path, "_staging"))
    # copy-on-write subs keep the per-sub path with one staging write
    c = PartitionedTable(spark, str(tmp_path / "pstage-cow"), num_buckets=2,
                         merge_mode="cow", stage_threshold=3)
    c.create(TRANSCRIPT_SCHEMA)
    mc = c.apply_changes(_events(spark, rows), batch_id=0)
    assert mc["staged"] and not mc["fused"] and mc["n_parts_touched"] == 6
    assert c.read().count() == 6
    assert not os.path.isdir(os.path.join(c.path, "_staging"))


def test_schema_evolution_per_partition(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    evolved = spark.createDataFrame(
        [("I", 30, "c5", 0, "user", "with lang", None, _ts(5), "en")],
        EVENT_DDL + ", lang string",
    )
    t.apply_changes(evolved, batch_id=1)
    df = t.read()
    assert "lang" in df.columns
    got = {r.conv_id: r.lang for r in df.collect()}
    assert got["c5"] == "en" and got["c1"] is None


def test_crashed_create_is_recoverable(spark, tmp_path):
    """create() writes spec then g0; a crash between the two must not wedge
    the path — re-running create() recovers it."""
    t = PartitionedTable(spark, str(tmp_path / "pc"))
    t.create(TRANSCRIPT_SCHEMA)
    os.remove(os.path.join(t._ledger, "g00000000.json"))  # simulate crash
    t2 = PartitionedTable(spark, str(tmp_path / "pc"))
    assert not t2.exists()
    t2.create(TRANSCRIPT_SCHEMA)  # recovery, not "already exists"
    assert t2.exists()
    with pytest.raises(RuntimeError):
        t2.create(TRANSCRIPT_SCHEMA)  # real double-create still refused


def test_reserved_part_column_refused(spark, ptable):
    ev = _events(spark, THREE_MONTHS).withColumn("_part", F.lit("x"))
    with pytest.raises(ValueError, match="_part"):
        ptable.apply_changes(ev, batch_id=0)


def test_feed_detects_drop_and_recreate(spark, mor_ptable):
    """A partition dropped and RE-created under the same value inside a feed
    range restarts its sub-ledger at 0 — the feed must fail loud, not skip
    the pre-drop rows."""
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.drop_partition("2025-01")
    t.apply_changes(_events(spark, [
        ("I", 8, "c7", 0, "user", "jan reborn", None, _ts(1)),
    ]), batch_id=1)
    with pytest.raises(PartitionRetentionError):
        t.changes(0)
    # a range starting after the re-create is served fine
    assert t.changes(t.latest_version() - 1).count() == 1


def test_empty_results_keep_full_schema(spark, mor_ptable):
    """An empty poll / pruned-to-zero read must carry the SAME schema a
    non-empty one would — hidden feed columns and evolved columns included
    — or the consumer crashes exactly on the nothing-new case."""
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.apply_changes(spark.createDataFrame(
        [("I", 30, "c5", 0, "user", "x", None, _ts(5), "en")],
        EVENT_DDL + ", lang string"), batch_id=1)
    empty_feed = t.changes(t.latest_version())
    assert empty_feed.count() == 0
    assert {"_seq", "_deleted"} <= set(empty_feed.columns)
    assert "_version" in t.changes(t.latest_version(),
                                   with_version=True).columns
    pruned = t.read_range(_ts(11, 1), _ts(11, 28))
    assert pruned.count() == 0 and "lang" in pruned.columns
    assert "lang" in t.read_keys(["nope"]).columns


def test_expire_gcs_crash_leftover_partition_dir(spark, mor_ptable):
    """A partition directory whose sub-create never committed (crash inside
    the fan-out) must be GC'd by expire_snapshots, not wedge it."""
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    os.makedirs(os.path.join(t.path, "part=2025-09", "_ledger"))
    out = t.expire_snapshots(keep_last=1)
    assert out["parts"]["2025-09"] == {"removed_unreferenced_dir": True}
    assert not os.path.isdir(os.path.join(t.path, "part=2025-09"))
    assert t.read().count() == 4


def test_alter_fans_out_and_covers_new_partitions(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.add_column("lang", "string")
    assert "lang" in t.read().columns
    # a partition created AFTER the DDL is born with the column (spec)
    t.apply_changes(_events(spark, [
        ("I", 9, "c6", 0, "user", "sep", None, _ts(9)),
    ]), batch_id=1)
    assert "lang" in t.part("2025-09").read().columns


def test_rename_refuses_stale_producers_everywhere(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.rename_column("tool", "tool_name")
    assert "tool_name" in t.read().columns
    from cdm_to_mods_spark.schemas import SchemaEvolutionError
    # stale producer still writing 'tool' — refused even when the batch
    # targets a BRAND-NEW partition with no rename log of its own
    with pytest.raises(SchemaEvolutionError, match="tool_name"):
        t.apply_changes(_events(spark, [
            ("I", 9, "c6", 0, "user", "sep", "calc", _ts(9)),
        ]), batch_id=1)
    # retired names cannot return
    with pytest.raises(SchemaEvolutionError):
        t.add_column("tool", "string")


def test_drop_column_ignores_lagging_producers(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.drop_column("tool")
    assert "tool" not in t.read().columns
    # producers lag DDL: a batch still carrying the column applies, the
    # column is ignored — including into a new partition
    t.apply_changes(_events(spark, [
        ("I", 9, "c6", 0, "user", "sep", "calc", _ts(9)),
    ]), batch_id=1)
    df = t.read()
    assert "tool" not in df.columns
    assert df.filter(F.col("conv_id") == "c6").count() == 1
    assert "tool" not in t.part("2025-09").read().columns


def test_create_validates_partition_col(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "bad"), partition_col="nope")
    with pytest.raises(ValueError):
        t.create(TRANSCRIPT_SCHEMA)
    t2 = PartitionedTable(spark, str(tmp_path / "bad2"), partition_col="text")
    with pytest.raises(ValueError):
        t2.create(TRANSCRIPT_SCHEMA)


def test_global_rollback_restores_state_and_replays_converge(
    spark, mor_ptable
):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v1 = t.latest_version()
    before = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    # batch 1 updates january AND creates a new june partition
    b1 = _events(spark, [
        ("U", 6, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("I", 7, "c9", 0, "user", "june", None, _ts(6)),
    ])
    t.apply_changes(b1, batch_id=1)
    out = t.rollback(v1)
    assert out["rolled_back_to"] == v1
    assert {(r.conv_id, r.turn_idx): r.text
            for r in t.read().collect()} == before
    assert "2025-06" not in t.partitions()  # post-target partition dropped
    # undone batch replays to convergence (last_batch_id reverted)
    t.apply_changes(b1, batch_id=1)
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got[("c1", 0)] == "jan v2" and got[("c9", 0)] == "june"
    assert "2025-06" in t.partitions()


def test_global_rollback_repairs_cross_partition_index(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "xprb"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True,
                         index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ]), batch_id=0)
    v1 = t.latest_version()
    # move the key to march, then roll the move back
    t.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "mar", None, _ts(3)),
    ]), batch_id=1)
    out = t.rollback(v1)
    assert out["index"]["rolled_back_to"] is not None
    assert t.verify_index()["ok"]
    # the repaired index routes point reads AND the replayed move
    assert [r.text for r in t.read_keys(["c1"]).collect()] == ["jan"]
    t.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "mar", None, _ts(3)),
    ]), batch_id=1)
    assert [r.text for r in t.read_keys(["c1"]).collect()] == ["mar"]
    assert t.part("2025-01").read().count() == 0


def test_verify_integrity_composed(spark, tmp_path):
    import shutil

    t = PartitionedTable(spark, str(tmp_path / "pfsck"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True,
                         index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    rep = t.verify_integrity()
    assert rep["ok"]
    assert set(rep["parts"]) == {"2025-01", "2025-02", "2025-03"}
    assert rep["index"]["ok"] and rep["index_mapping"]["ok"]
    # damage one partition's data dir: the composed audit localizes it
    jan = t.part("2025-01")
    victim = next(
        os.path.join(jan.path, e2["path"])
        for e in jan.manifest()["buckets"].values()
        for e2 in jan._bucket_files(e)
    )
    shutil.rmtree(victim, ignore_errors=True)
    rep2 = t.verify_integrity()
    assert not rep2["ok"]
    assert not rep2["parts"]["2025-01"]["checks"]["manifest_refs"]["ok"]
    assert rep2["parts"]["2025-02"]["ok"]  # damage localized


def test_delete_where_fans_across_partitions(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    out = t.delete_where("role = 'user'")
    # one coherent fleet seq, matches in all three months
    assert out["tombstone_seq"] > 5
    assert {(r.conv_id, r.turn_idx) for r in t.read().collect()} == {
        ("c1", 1)  # the assistant row survives
    }
    # a late lower-seq event cannot resurrect a purged key
    t.apply_changes(_events(spark, [
        ("U", 3, "c2", 0, "user", "late echo", None, _ts(2)),
    ]), batch_id=1)
    assert t.read().filter(F.col("conv_id") == "c2").count() == 0


def test_update_where_fans_and_refuses_partition_col(spark, mor_ptable):
    t = mor_ptable
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    out = t.update_where("role = 'user'", {"text": "concat(text, '!')"})
    assert out["update_seq"] > 5
    got = {r.conv_id: r.text for r in
           t.read().filter(F.col("role") == "user").collect()}
    assert got == {"c1": "jan hello!", "c2": "feb hello!",
                   "c3": "mar v2!"}
    with pytest.raises(ValueError, match="partition column"):
        t.update_where("role = 'user'", {"ts": "ts + interval 1 day"})


# ------------------------------------------------- round-4 fused apply
def test_fused_partial_commit_replays_to_convergence(spark, tmp_path):
    """Crash between fused sub-commits: some partitions committed the
    batch, others not. A replay of the SAME batch must skip the committed
    partitions before staging and land the rest — the exactly-once
    composition the threaded path guaranteed."""
    t = PartitionedTable(spark, str(tmp_path / "pfc"), num_buckets=2,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    batch1 = [
        ("U", 10, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("U", 11, "c2", 0, "user", "feb v2", None, _ts(2)),
        ("I", 12, "c4", 0, "user", "mar new", None, _ts(3)),
    ]
    # simulate the torn state: commit batch 1 into ONE sub-table directly
    sub = t.part("2025-01")
    sub.apply_changes(_events(spark, [batch1[0]]), batch_id=1)
    assert sub.manifest()["last_batch_id"] == 1
    # full-batch replay: 2025-01 must skip, others must land
    m = t.apply_changes(_events(spark, batch1), batch_id=1)
    assert m["fused"]
    assert m["parts"]["2025-01"].get("skipped") is True
    assert not m["parts"]["2025-02"].get("skipped")
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got[("c1", 0)] == "jan v2" and got[("c2", 0)] == "feb v2"
    assert got[("c4", 0)] == "mar new"
    # idempotent re-apply: the global ledger short-circuits
    m2 = t.apply_changes(_events(spark, batch1), batch_id=1)
    assert m2.get("skipped") is True


def test_fused_divergent_schema_groups(spark, tmp_path):
    """Partitions whose canonical schemas diverged (per-partition DDL)
    fall into separate signature groups — each group gets its own
    projection/write, and evolution stays per-sub-faithful."""
    t = PartitionedTable(spark, str(tmp_path / "pdg"), num_buckets=2,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    # evolve ONE partition out-of-band
    t.part("2025-01").add_column("lang", "string")
    batch1 = [
        ("U", 20, "c1", 1, "assistant", "jan reply v2", None, _ts(1, 6)),
        ("U", 21, "c2", 0, "user", "feb v3", None, _ts(2)),
    ]
    m = t.apply_changes(_events(spark, batch1), batch_id=1)
    assert m["fused"]
    jan = t.part("2025-01").read()
    assert "lang" in jan.columns  # divergent column survived the apply
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got[("c1", 1)] == "jan reply v2"
    assert got[("c2", 0)] == "feb v3"


def test_fused_respects_check_constraints(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "pcc"), num_buckets=2,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    bad = [("I", 30, "cx", -1, "user", "bad", None, _ts(1)),
           ("I", 31, "cy", 0, "user", "ok", None, _ts(2))]
    with pytest.raises(Exception, match="CHECK constraint violated"):
        t.apply_changes(_events(spark, bad), batch_id=1)
    # the fixed batch re-applies under the same batch_id (nothing landed)
    fixed = [("I", 30, "cx", 1, "user", "good now", None, _ts(1)),
             ("I", 31, "cy", 0, "user", "ok", None, _ts(2))]
    m = t.apply_changes(_events(spark, fixed), batch_id=1)
    assert m["fused"]
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got["cx"] == "good now" and got["cy"] == "ok"


def test_fused_merge_engines_match_per_sub_path(spark, tmp_path):
    """partial_update through the fused path equals the same batches
    applied through single-partition (non-fused) applies."""
    rows0 = [
        ("I", 1, "c1", 0, "user", "jan t0", "tools", _ts(1)),
        ("I", 2, "c2", 0, "user", "feb t0", "tools", _ts(2)),
    ]
    patches = [  # NULL text means leave-alone under partial_update
        ("U", 3, "c1", 0, None, None, "patched", _ts(1)),
        ("U", 4, "c2", 0, None, "feb t1", None, _ts(2)),
    ]
    fused_t = PartitionedTable(spark, str(tmp_path / "pf"), num_buckets=2,
                               merge_mode="mor",
                               merge_engine="partial_update")
    fused_t.create(TRANSCRIPT_SCHEMA)
    fused_t.apply_changes(_events(spark, rows0), batch_id=0)
    m = fused_t.apply_changes(_events(spark, patches), batch_id=1)
    assert m["fused"]
    solo_t = PartitionedTable(spark, str(tmp_path / "ps"), num_buckets=2,
                              merge_mode="mor",
                              merge_engine="partial_update")
    solo_t.create(TRANSCRIPT_SCHEMA)
    for i, r in enumerate(rows0):
        solo_t.apply_changes(_events(spark, [r]), batch_id=i)
    for i, r in enumerate(patches):
        solo_t.apply_changes(_events(spark, [r]), batch_id=2 + i)
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    a = {tuple(r) for r in fused_t.read().select(cols).collect()}
    b = {tuple(r) for r in solo_t.read().select(cols).collect()}
    assert a == b
    assert a == {("c1", 0, "user", "jan t0", "patched"),
                 ("c2", 0, "user", "feb t1", "tools")}
