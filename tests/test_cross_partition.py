"""Cross-partition upsert: the global key→partition index mode.

With ``cross_partition_upsert=True`` the KEY ALONE is row identity (the
Paimon ``cross-partition-upsert`` dynamic-bucket rule): updates whose ts
derives a different partition MOVE the key, deletes route to the key's
home partition regardless of their own ts. The differential oracle is a
FLAT LakeTable fed the same events — under this mode the two must agree
on final state for EVERY event pattern, including the cross-partition
ones where the default identity rule diverges (that divergence is pinned
in test_partitioned.py).

Reference parity: the reference keys every record by its CONTENTdm
pointer alone and re-runs replace previous outputs wherever they were
written (convert_cdm_to_mods.py:142-148); the partition is storage
layout, never identity.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
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


def _state(tbl):
    return sorted(
        (r.conv_id, r.turn_idx, r.text, r.ts)
        for r in tbl.read().select("conv_id", "turn_idx", "text", "ts").collect()
    )


@pytest.fixture(params=["cow", "mor"])
def xptable(spark, tmp_path, request):
    t = PartitionedTable(
        spark,
        str(tmp_path / "xp"),
        num_buckets=4,
        merge_mode=request.param,
        cross_partition_upsert=True,
        index_buckets=4,
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


@pytest.fixture()
def flat_oracle(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "flat"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_update_moves_key_across_partitions(spark, xptable, flat_oracle):
    b1 = _events(spark, [
        ("I", 1, "c1", 0, "user", "jan v1", None, _ts(1)),
        ("I", 2, "c2", 0, "user", "jan other", None, _ts(1)),
    ])
    b2 = _events(spark, [
        ("U", 3, "c1", 0, "user", "mar v2", None, _ts(3)),
    ])
    for i, b in enumerate((b1, b2)):
        xptable.apply_changes(b, batch_id=i)
        flat_oracle.apply_changes(b, batch_id=i)
    assert _state(xptable) == _state(flat_oracle)
    # exactly ONE live row for the moved key, in its NEW partition
    jan = xptable.part("2025-01").read().filter(F.col("conv_id") == "c1")
    mar = xptable.part("2025-03").read().filter(F.col("conv_id") == "c1")
    assert jan.count() == 0 and mar.count() == 1


def test_delete_routes_to_home_partition(spark, xptable):
    xptable.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan v1", None, _ts(1)),
    ]), batch_id=0)
    # the D event's own ts derives 2025-06 — the key lives in 2025-01
    xptable.apply_changes(_events(spark, [
        ("D", 2, "c1", 0, None, None, None, _ts(6)),
    ]), batch_id=1)
    assert xptable.read().count() == 0
    # the D never opened (or created) the ts-derived partition
    assert "2025-06" not in xptable.partitions()


def test_in_batch_collapse_multiple_partitions(spark, xptable, flat_oracle):
    """One batch carrying several updates for one key across months:
    only the per-key winner lands, in the winner's partition."""
    b = _events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("U", 2, "c1", 0, "user", "feb", None, _ts(2)),
        ("U", 3, "c1", 0, "user", "apr", None, _ts(4)),
    ])
    xptable.apply_changes(b, batch_id=0)
    flat_oracle.apply_changes(b, batch_id=0)
    assert _state(xptable) == _state(flat_oracle)
    live = xptable.read().collect()
    assert len(live) == 1 and live[0].text == "apr"
    # the intermediate february version never created its partition
    assert "2025-02" not in xptable.partitions()


def test_read_keys_probes_only_home_partitions(spark, xptable, monkeypatch):
    for i, m in enumerate((1, 2, 3)):
        xptable.apply_changes(_events(spark, [
            ("I", i + 1, f"c{m}", 0, "user", f"m{m}", None, _ts(m)),
        ]), batch_id=i)
    probed: list[str] = []
    orig = PartitionedTable._sub

    def spy(self, part, create=False):
        probed.append(part)
        return orig(self, part, create)

    monkeypatch.setattr(PartitionedTable, "_sub", spy)
    got = sorted(r.conv_id for r in xptable.read_keys(["c2"]).collect())
    assert got == ["c2"]
    assert set(probed) == {"2025-02"}  # index pruned the other two


def test_read_keys_falls_back_for_unindexed_keys(spark, xptable):
    xptable.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ]), batch_id=0)
    got = xptable.read_keys(["c1", "ghost"]).collect()
    assert [r.conv_id for r in got] == ["c1"]


def test_stale_home_after_drop_partition(spark, xptable):
    """drop_partition leaves index entries pointing at the dropped month;
    the router must treat them as absent, not resurrect the partition."""
    xptable.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ]), batch_id=0)
    xptable.drop_partition("2025-01")
    # re-insert the same key with a march ts — stale home ignored
    xptable.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "mar", None, _ts(3)),
    ]), batch_id=1)
    assert _state(xptable)[0][2] == "mar"
    assert xptable.partitions() == ["2025-03"]
    # point lookup still finds it (fallback covers the stale entry until
    # the next index write for the key overwrites it)
    assert [r.text for r in xptable.read_keys(["c1"]).collect()] == ["mar"]


def test_replay_converges_and_index_is_exactly_once(spark, xptable):
    b = _events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("U", 2, "c1", 0, "user", "feb", None, _ts(2)),
    ])
    m1 = xptable.apply_changes(b, batch_id=7)
    assert m1["index"]["n_events"] >= 1
    before = _state(xptable)
    m2 = xptable.apply_changes(b, batch_id=7)
    assert m2.get("skipped") is True
    assert _state(xptable) == before


def test_partial_crash_replay_converges(spark, xptable):
    """Sub-applies committed, index + global commit lost: the replay must
    recompute the identical routing (index unchanged) and converge."""
    b1 = _events(spark, [("I", 1, "c1", 0, "user", "jan", None, _ts(1))])
    xptable.apply_changes(b1, batch_id=0)
    b2 = _events(spark, [("U", 2, "c1", 0, "user", "feb", None, _ts(2))])
    xptable.apply_changes(b2, batch_id=1)
    # simulate the crash window: roll the GLOBAL ledger and the INDEX
    # ledger back to their pre-batch state, keeping the sub commits
    gv = xptable.latest_version()
    os.remove(os.path.join(xptable._ledger, f"g{gv:08d}.json"))
    idx = xptable._index()
    iv = idx.latest_version()
    os.remove(os.path.join(idx._ledger, f"v{iv:08d}.json"))
    xptable._subs.clear()
    xptable._idx = None
    reopened = PartitionedTable(spark, xptable.path)
    assert reopened.cross_partition_upsert is True  # spec adoption
    reopened.apply_changes(b2, batch_id=1)  # replay
    assert _state(reopened) == [("c1", 0, "feb", _ts(2))]
    # exactly one live row — the jan tombstone landed despite the replay
    assert reopened.part("2025-01").read().count() == 0


def test_bootstrap_seeds_index(spark, xptable):
    snap = spark.createDataFrame(
        [("c1", 0, "user", "jan", None, _ts(1)),
         ("c2", 0, "user", "feb", None, _ts(2))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    xptable.bootstrap(snap, snapshot_seq=100)
    # post-bootstrap update moves c1 out of its seeded home
    xptable.apply_changes(_events(spark, [
        ("U", 101, "c1", 0, "user", "apr", None, _ts(4)),
    ]), batch_id=1)
    assert [r.text for r in xptable.read_keys(["c1"]).collect()] == ["apr"]
    assert xptable.part("2025-01").read().count() == 0


def test_random_event_log_matches_flat_oracle(spark, tmp_path):
    """120 deterministic pseudo-random events over 10 keys whose ts hop
    across 4 months, in 3 batches: final state must equal the flat
    table's (key-only identity) state exactly."""
    import random

    rng = random.Random(42)
    rows, seq = [], 0
    for _ in range(120):
        seq += 1
        k = rng.randrange(10)
        op = rng.choice(["I", "U", "U", "U", "D"])
        m = rng.randrange(1, 5)
        rows.append((op, seq, f"c{k}", 0, "user", f"v{seq}", None, _ts(m)))
    t = PartitionedTable(spark, str(tmp_path / "xp"), num_buckets=4,
                         merge_mode="mor", cross_partition_upsert=True,
                         index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    flat = LakeTable(spark, str(tmp_path / "flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    for i in range(3):
        b = spark.createDataFrame(rows[i * 40:(i + 1) * 40], EVENT_DDL)
        t.apply_changes(b, batch_id=i)
        flat.apply_changes(b, batch_id=i)
    assert _state(t) == _state(flat)
    # invariant: every live key exists in exactly one partition
    dup = (
        t.read().groupBy("conv_id", "turn_idx")
        .count().filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_verify_index_clean_and_after_drop(spark, xptable):
    for i, m in enumerate((1, 2)):
        xptable.apply_changes(_events(spark, [
            ("I", i + 1, f"c{m}", 0, "user", f"m{m}", None, _ts(m)),
        ]), batch_id=i)
    rep = xptable.verify_index()
    assert rep["ok"] and rep["stale_dropped"] == 0
    xptable.drop_partition("2025-01")
    rep = xptable.verify_index()
    # drop debris is expected and not a failure
    assert rep["ok"] and rep["stale_dropped"] == 1


def test_reindex_repairs_a_corrupted_index(spark, xptable):
    for i, m in enumerate((1, 2)):
        xptable.apply_changes(_events(spark, [
            ("I", i + 1, f"c{m}", 0, "user", f"m{m}", None, _ts(m)),
        ]), batch_id=i)
    # corrupt the index out-of-band: point c1's home at the wrong month
    # and add a dangling entry for a key that has no row
    idx = xptable._index()
    bad = spark.createDataFrame(
        [("U", 50, "c1", 0, "2025-02"), ("U", 51, "ghost", 0, "2025-02")],
        "op string, seq long, conv_id string, turn_idx int, part string",
    )
    idx.apply_changes(bad, batch_id=None, source="test-corruption")
    rep = xptable.verify_index()
    assert not rep["ok"]
    assert rep["mismatched"] == 1 and rep["dangling"] == 1
    fixed = xptable.reindex()
    assert fixed["corrections"] == 2
    rep2 = xptable.verify_index()
    assert rep2["ok"]
    # repaired routing: an update for c1 now reaches its true home
    xptable.apply_changes(_events(spark, [
        ("U", 99, "c1", 0, "user", "moved", None, _ts(3)),
    ]), batch_id=10)
    assert xptable.part("2025-01").read().filter(
        F.col("conv_id") == "c1").count() == 0
    assert [r.text for r in xptable.read_keys(["c1"]).collect()] == ["moved"]
    # reindex is idempotent: a second run has nothing to correct
    assert xptable.reindex()["corrections"] == 0


def test_move_surfaces_as_retract_pair_in_row_changes(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "xprc"), num_buckets=4,
                         merge_mode="mor", changelog="lookup",
                         cross_partition_upsert=True, index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
    ]), batch_id=0)
    v1 = t.latest_version()
    t.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "moved", None, _ts(3)),
    ]), batch_id=1)
    got = sorted((r["_change_type"], r.text, r["_version"])
                 for r in t.row_changes(v1).collect())
    # the move is a retraction pair: delete at the old home, insert at
    # the new — what an additive consumer folds correctly
    assert got == [("delete", "jan", v1 + 1), ("insert", "moved", v1 + 1)]


def test_reopen_adopts_flag(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "xp"),
                         cross_partition_upsert=True)
    t.create(TRANSCRIPT_SCHEMA)
    re = PartitionedTable(spark, str(tmp_path / "xp"))
    assert re.cross_partition_upsert is True
    plain = PartitionedTable(spark, str(tmp_path / "plain"))
    plain.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="cross_partition_upsert"):
        PartitionedTable(spark, str(tmp_path / "plain"),
                         cross_partition_upsert=True)
