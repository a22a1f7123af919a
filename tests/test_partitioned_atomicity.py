"""Fan-out atomicity and contract-versioning regressions (review pass,
session 14): statements that refuse must refuse BEFORE any partition
commits; crashed statements must be re-runnable; the spec (table
contract) is snapshotted per global cut so historical clones and
rollback restore it with the data."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
ROW_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


SEED = [
    ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ("I", 2, "c2", 0, "user", "feb", None, _ts(2)),
    ("I", 3, "c3", 0, "user", "mar", None, _ts(3)),
]


@pytest.fixture
def ptab(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "pat"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(spark.createDataFrame(SEED, EVENT_DDL), batch_id=0)
    return t


def _sub_versions(t):
    return {p: t.part(p).latest_version() for p in t.partitions()}


def _state(df):
    return {(r.conv_id, r.turn_idx): r.text for r in df.collect()}


# ------------------------------------------ overwrite_where atomicity
def test_overwrite_outside_row_refuses_before_any_commit(spark, ptab):
    """An outside-predicate row must refuse the WHOLE statement before
    any partition commits — the pre-fix behavior committed rowless
    partitions' pure deletes first, and the next global cut published
    them despite the ValueError."""
    before = _sub_versions(ptab)
    rows = spark.createDataFrame(
        [  # feb row inside the predicate, june row outside it
            ("c2", 0, "user", "feb NEW", None, _ts(2)),
            ("c6", 0, "user", "june leak", None, _ts(6)),
        ], ROW_DDL)
    pred = "ts >= timestamp'2025-02-01' and ts < timestamp'2025-04-01'"
    with pytest.raises(ValueError, match="outside"):
        ptab.overwrite_where(rows, pred)
    # nothing landed anywhere: no sub commit (esp. not 2025-03's rowless
    # pure delete), no global commit, state intact
    assert _sub_versions(ptab) == before
    assert ("c3", 0) in _state(ptab.read())


def test_overwrite_duplicate_keys_in_one_partition_refused(spark, ptab):
    rows = spark.createDataFrame(
        [("c2", 0, "user", "a", None, _ts(2)),
         ("c2", 0, "user", "b", None, _ts(2, 6))], ROW_DDL)
    before = _sub_versions(ptab)
    with pytest.raises(ValueError, match="not unique"):
        ptab.overwrite_where(rows, "ts >= timestamp'2025-02-01'")
    assert _sub_versions(ptab) == before


def test_overwrite_batch_id_exactly_once_and_crash_replay(spark, ptab):
    rows = spark.createDataFrame(
        [("c2", 0, "user", "feb NEW", None, _ts(2))], ROW_DDL)
    pred = "ts >= timestamp'2025-02-01' and ts < timestamp'2025-04-01'"
    # crash mid-fan-out: 2025-02's slice committed (directly, as the
    # router would), global never landed — replaying the SAME statement
    # with the same batch_id must converge, not raise on the seq check
    seq = ptab._fleet_seq(ptab.manifest())
    ptab.part("2025-02").overwrite_where(
        rows, pred, overwrite_seq=seq, batch_id=1)
    m = ptab.overwrite_where(rows, pred, batch_id=1)
    assert m["parts"]["2025-02"].get("skipped") is True  # sub ledger
    assert _state(ptab.read())[("c2", 0)] == "feb NEW"
    assert ("c3", 0) not in _state(ptab.read())  # rowless region deleted
    # whole-statement redelivery skips on the global ledger
    assert ptab.overwrite_where(rows, pred, batch_id=1)["skipped"]


# ----------------------------------------------- merge partition guard
def test_merge_refuses_partition_col_assignment(spark, ptab):
    src = spark.createDataFrame(
        [("c1", 0, "user", "x", None, _ts(1))], ROW_DDL)
    with pytest.raises(ValueError, match="partition column"):
        ptab.merge_into(src,
                        when_matched_update={"ts": "t.ts + interval 40 days"},
                        when_not_matched_insert=False)
    # dict insert omitting the partition col gets it injected (routing
    # value preserved); an explicit different expression is refused
    ptab.merge_into(
        spark.createDataFrame([("c7", 0, "user", "jul", None, _ts(7))],
                              ROW_DDL),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert={"conv_id": "s.conv_id",
                                 "turn_idx": "s.turn_idx",
                                 "text": "s.text"},
    )
    row = ptab.part("2025-07").read().collect()[0]
    assert row.ts == _ts(7)  # injected, not NULL
    with pytest.raises(ValueError, match="routed"):
        ptab.merge_into(
            spark.createDataFrame([("c8", 0, "user", "x", None, _ts(8))],
                                  ROW_DDL),
            when_not_matched_insert={"conv_id": "s.conv_id",
                                     "turn_idx": "s.turn_idx",
                                     "ts": "current_timestamp()"},
        )


# -------------------------------------------- add_constraint atomicity
def test_add_constraint_validates_globally_before_fanning(spark, ptab):
    # violation lives in 2025-03; pre-fix, 2025-01/02 got the CHECK
    # committed before the refusal, stranding it with no spec record
    ptab.apply_changes(spark.createDataFrame(
        [("I", 9, "c3", -1, "user", "mar bad", None, _ts(3, 6))],
        EVENT_DDL), batch_id=1)
    with pytest.raises(ValueError, match="existing"):
        ptab.add_constraint("turn_nonneg", "turn_idx >= 0")
    for p in ptab.partitions():
        assert ptab.part(p).constraints() == []
    # a typo'd expression fails analysis up front, fanning nothing
    with pytest.raises(Exception):
        ptab.add_constraint("typo", "no_such_col > 0")
    for p in ptab.partitions():
        assert ptab.part(p).constraints() == []


# --------------------------------------------- spec snapshot / rollback
def test_rollback_restores_spec_contract(spark, ptab):
    g = ptab.latest_version()
    ptab.rename_column("tool", "tool_name")
    ptab.set_property("owner", "x")
    ptab.add_constraint("turn_nonneg", "turn_idx >= 0")
    ptab.rollback(g)
    # contract restored with the data: no retired record, no property,
    # no constraint — a replay of the undone span with the OLD column
    # name is accepted again
    assert ptab.properties() == {}
    assert ptab.constraints() == []
    ptab.apply_changes(spark.createDataFrame(
        [("U", 4, "c1", 0, "user", "jan v2", "search", _ts(1))],
        EVENT_DDL), batch_id=1)
    assert _state(ptab.read())[("c1", 0)] == "jan v2"


def test_historical_clone_uses_at_cut_spec(spark, tmp_path, ptab):
    g = ptab.latest_version()
    ptab.rename_column("tool", "tool_name")
    c = ptab.clone(str(tmp_path / "hc"), version=g)
    # the clone's contract is the at-G spec: old name intact, no retired
    # record — replaying the span with the old name works
    assert "tool" in [f.name for f in c.read().schema.fields]
    c.apply_changes(spark.createDataFrame(
        [("U", 4, "c1", 0, "user", "jan v2", "search", _ts(1))],
        EVENT_DDL), batch_id=1)
    assert _state(c.read())[("c1", 0)] == "jan v2"


def test_failed_clone_cleans_up_and_is_retryable(spark, tmp_path, ptab,
                                                 monkeypatch):
    dst = str(tmp_path / "fc")
    real = LakeTable.clone
    calls = {"n": 0}

    def boom(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("disk on fire")
        return real(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "clone", boom)
    with pytest.raises(RuntimeError, match="disk on fire"):
        ptab.clone(dst)
    assert not os.path.exists(dst)  # partial dst removed
    monkeypatch.setattr(LakeTable, "clone", real)
    c = ptab.clone(dst)  # retry starts clean
    assert _state(c.read()) == _state(ptab.read())


# ------------------------------------------------- index self-heal
def test_apply_self_heals_missing_index(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "ih"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(spark.createDataFrame(SEED, EVENT_DDL), batch_id=0)
    shutil.rmtree(os.path.join(t.path, "_index"))
    fresh = PartitionedTable(spark, t.path, num_buckets=4,
                             merge_mode="mor", cross_partition_upsert=True)
    # a key MOVE right after the loss: without the self-heal the router
    # would treat c1 as new and leave two live rows
    fresh.apply_changes(spark.createDataFrame(
        [("U", 9, "c1", 0, "user", "moved to may", None, _ts(5))],
        EVENT_DDL), batch_id=1)
    rows = [r for r in fresh.read().collect() if r.conv_id == "c1"]
    assert len(rows) == 1 and rows[0].text == "moved to may"


# ----------------------------------------- round-4 concurrent writers
def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def test_router_two_writer_threads_converge(spark, tmp_path):
    """Two writers apply disjoint batch streams to ONE PartitionedTable
    concurrently (real threads): the fused sub-commits retry through the
    LakeTable fast-append path and the global-cut commit retries against
    the winner's manifest — both streams land, the final cut pins every
    partition, and the state is the union."""
    import threading

    path = str(tmp_path / "conc")
    t0 = PartitionedTable(spark, path, num_buckets=2, merge_mode="mor")
    t0.create(TRANSCRIPT_SCHEMA)
    errs = []

    def writer(tag, seq_lo):
        try:
            t = PartitionedTable(spark, path, num_buckets=2,
                                 merge_mode="mor")
            for b in range(3):
                rows = [
                    ("I", seq_lo + b * 10 + i, f"{tag}-{b}-{i}", 0, "user",
                     f"{tag}{b}{i}", None, _ts(1 + (i % 3)))
                    for i in range(4)
                ]
                t.apply_changes(_events(spark, rows))
        except Exception as e:  # noqa: BLE001
            errs.append((tag, e))

    th = [threading.Thread(target=writer, args=("wa", 1000)),
          threading.Thread(target=writer, args=("wb", 2000))]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    fresh = PartitionedTable(spark, path, num_buckets=2, merge_mode="mor")
    state = {(r.conv_id, r.turn_idx): r.text for r in fresh.read().collect()}
    assert len(state) == 24  # 2 writers x 3 batches x 4 rows
    assert state[("wa-2-3", 0)] == "wa23"
    assert state[("wb-0-0", 0)] == "wb00"
    # the latest global cut pins every partition at a readable version
    man = fresh.manifest()
    assert set(man["parts"]) == set(fresh.partitions())
    for p, v in man["parts"].items():
        fresh._sub(p).read(version=v).count()


def test_router_concurrent_writers_with_index(spark, tmp_path):
    """Same two-thread convergence with cross_partition_upsert on: the
    index commit ordering (index after data, before the cut) must hold
    under interleaving and verify_index must come out clean."""
    import threading

    path = str(tmp_path / "conc-idx")
    t0 = PartitionedTable(spark, path, num_buckets=2, merge_mode="mor",
                          cross_partition_upsert=True)
    t0.create(TRANSCRIPT_SCHEMA)
    errs = []

    def writer(tag, seq_lo):
        try:
            t = PartitionedTable(spark, path, num_buckets=2,
                                 merge_mode="mor",
                                 cross_partition_upsert=True)
            for b in range(2):
                rows = [
                    ("I", seq_lo + b * 10 + i, f"{tag}-{b}-{i}", 0, "user",
                     f"{tag}{b}{i}", None, _ts(1 + (i % 2)))
                    for i in range(3)
                ]
                t.apply_changes(_events(spark, rows))
        except Exception as e:  # noqa: BLE001
            errs.append((tag, e))

    th = [threading.Thread(target=writer, args=("wa", 1000)),
          threading.Thread(target=writer, args=("wb", 2000))]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    fresh = PartitionedTable(spark, path, num_buckets=2, merge_mode="mor",
                             cross_partition_upsert=True)
    assert fresh.read().count() == 12
    audit = fresh.verify_index()
    assert audit["ok"], audit
