"""Snapshot bootstrap + binlog handoff (the CDC bulk-load pattern).

A deployment rarely starts from an empty table AND seq 0: you bulk-load a
consistent full-state snapshot, then tail the binlog from at-or-before the
snapshot point. Convergence under overlap is the contract — events already
reflected in the snapshot must be no-ops (last-write-wins by seq), and the
``min_seq`` scan filter is the scale path that skips the reflected prefix
at the parquet footer instead of re-resolving it in the merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.events import read_events, write_events

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)

# One binlog, three epochs: the snapshot is consistent with seq <= 4,
# the tail replays an OVERLAPPING suffix (seq >= 3).
FULL_LOG = [
    ("I", 1, "c1", 0, "user", "hello", None, None, None),
    ("I", 2, "c1", 1, "assistant", "hi", None, None, None),
    ("I", 3, "c2", 0, "user", "question", None, None, None),
    ("U", 4, "c1", 0, "user", "hello edited", None, None, None),
    # -- snapshot taken here (snapshot_seq = 4) --
    ("U", 5, "c2", 0, "user", "question v2", None, None, None),
    ("D", 6, "c1", 1, None, None, None, None, None),
    ("I", 7, "c3", 0, "user", "new conv", None, None, None),
]


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _state(t, version=None):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read(version).collect()
    }


def _full_replay(spark, path, mode):
    t = LakeTable(spark, path, num_buckets=8, merge_mode=mode)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, FULL_LOG), batch_id=0)
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_bootstrap_then_overlapping_replay_converges(spark, tmp_path, mode):
    """snapshot@4 + replay of seq>=3 (overlap!) == full replay of seq 1-7."""
    oracle = _full_replay(spark, str(tmp_path / "oracle"), mode)

    # the snapshot: full state after the seq<=4 prefix
    pre = LakeTable(spark, str(tmp_path / "pre"), num_buckets=8, merge_mode=mode)
    pre.create(TRANSCRIPT_SCHEMA)
    pre.apply_changes(_events(spark, [r for r in FULL_LOG if r[1] <= 4]), batch_id=0)
    snapshot = pre.read()

    t = LakeTable(spark, str(tmp_path / "boot"), num_buckets=8, merge_mode=mode)
    t.create(TRANSCRIPT_SCHEMA)
    m = t.bootstrap(snapshot, snapshot_seq=4)
    assert m["bootstrap_seq"] == 4
    assert m["n_events"] == 3  # c1/0, c1/1, c2/0 live rows at seq 4
    assert _state(t) == _state(pre)

    # handoff: an overlapping window (seq 3-7) — 3 and 4 must be no-ops
    t.apply_changes(_events(spark, [r for r in FULL_LOG if r[1] >= 3]), batch_id=0)
    assert _state(t) == _state(oracle)


def test_bootstrap_overlap_event_loses_to_snapshot(spark, tmp_path):
    """An overlap event BELOW the snapshot point must not regress state:
    the snapshot row (seq=5) wins over a stale U at seq=2."""
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    snap = spark.createDataFrame(
        [("c1", 0, "user", "final text", None, None)], TRANSCRIPT_SCHEMA
    )
    t.bootstrap(snap, snapshot_seq=5)
    t.apply_changes(
        _events(spark, [("U", 2, "c1", 0, "user", "stale text", None, None, None)]),
        batch_id=0,
    )
    assert _state(t) == {("c1", 0): ("user", "final text", None)}


def test_bootstrap_refuses_non_empty_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [("I", 1, "c1", 0, "user", "x", None, None, None)]),
        batch_id=0,
    )
    with pytest.raises(RuntimeError, match="empty table"):
        t.bootstrap(
            spark.createDataFrame([("c2", 0, "u", "y", None, None)], TRANSCRIPT_SCHEMA),
            snapshot_seq=1,
        )


def test_bootstrap_records_handoff_in_lineage(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.bootstrap(
        spark.createDataFrame([("c1", 0, "u", "x", None, None)], TRANSCRIPT_SCHEMA),
        snapshot_seq=9,
    )
    lineage = t.manifest()["lineage"]
    assert lineage, "bootstrap must record per-bucket lineage"
    assert all(e["source"] == "bootstrap:seq=9" for e in lineage.values())
    assert all(e["max_seq"] == 9 for e in lineage.values())


def test_min_seq_is_pushed_to_the_parquet_scan(spark, tmp_path):
    """The handoff filter must reach the footer: PushedFilters carries
    GreaterThan(seq, N), so already-reflected segments are row-group-
    skipped, not read-and-dropped."""
    path = str(tmp_path / "ev")
    write_events(_events(spark, FULL_LOG), path)
    df = read_events(spark, path, min_seq=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(seq,4)" in plan, plan
    assert {r.seq for r in df.collect()} == {5, 6, 7}


def test_streaming_tail_with_min_seq_handoff(spark, tmp_path):
    """End-to-end: bootstrap, then the streaming tail with
    min_seq=snapshot_seq over the FULL binlog converges to the oracle —
    exactly-once plus scan-level prefix skipping."""
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    oracle = _full_replay(spark, str(tmp_path / "oracle"), "mor")

    ev_dir = str(tmp_path / "ev")
    write_events(_events(spark, FULL_LOG), ev_dir)

    table_path = str(tmp_path / "boot")
    t = LakeTable(spark, table_path, num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    pre = LakeTable(spark, str(tmp_path / "pre"), num_buckets=8, merge_mode="mor")
    pre.create(TRANSCRIPT_SCHEMA)
    pre.apply_changes(_events(spark, [r for r in FULL_LOG if r[1] <= 4]), batch_id=0)
    t.bootstrap(pre.read(), snapshot_seq=4)

    replay = StreamingReplay(
        spark, ev_dir, table_path, str(tmp_path / "ckpt"),
        num_buckets=8, merge_mode="mor", transform=None, min_seq=4,
    )
    out = replay.run_to_completion(timeout_sec=120)
    assert _state(out) == _state(oracle)
    # the tail's batches only ever saw the suffix
    applied = [m for m in replay.batch_metrics if not m.get("skipped")]
    assert sum(m["n_events"] for m in applied) == 3


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_overlap_replay_keeps_seq_highwater_monotone(spark, tmp_table, mode):
    """The documented handoff (tail restarts AT-OR-BEFORE the snapshot
    point) must not regress the lineage's max_seq high-water mark: after
    replaying an overlapping low-seq batch, update_where's default seq
    still lands ABOVE the snapshot seq, so the update actually wins the
    LWW merge (a regressed high-water mark would make it a silent no-op
    that reports success)."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode=mode)
    t.create(TRANSCRIPT_SCHEMA)
    snap = spark.createDataFrame(
        [("c1", 0, "user", "hello", None, None),
         ("c2", 0, "user", "question", None, None)],
        TRANSCRIPT_SCHEMA,
    )
    t.bootstrap(snap, snapshot_seq=1000)
    # overlap batch: seqs far below the snapshot point — pure no-ops
    t.apply_changes(
        _events(spark, [("U", 500, "c1", 0, "user", "stale", None, None, None),
                        ("U", 600, "c2", 0, "user", "stale", None, None, None)]),
        batch_id=0,
    )
    assert _state(t) == {("c1", 0): ("user", "hello", None),
                         ("c2", 0): ("user", "question", None)}
    res = t.update_where("turn_idx = 0", {"tool": "'audited'"})
    assert res["update_seq"] > 1000  # the regressed mark would give 601
    assert {r.tool for r in t.read().collect()} == {"audited"}
