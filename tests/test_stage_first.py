"""Stage-first fused apply (plans/partitioned.py::_apply_fused_stage_first).

The round-5 routing-tax cut: when every existing partition is MoR with one
common schema signature, the router skips the partition-discovery job and
derives the touched set from the staged directory layout. These tests pin
(a) that the fast path actually engages (metrics carry
``phases.stage_first``), (b) that it converges to the flat oracle / the
legacy discovery path byte-for-byte, and (c) every fallback and edge:
new-partition birth with implicit evolution, replay after a partial crash,
divergent signatures, CHECK enforcement inside the staged job, and the
cross-partition router composition.
"""

from __future__ import annotations

import datetime as dt

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


THREE_MONTHS = [
    ("I", 1, "c1", 0, "user", "jan hello", None, _ts(1)),
    ("I", 2, "c1", 1, "assistant", "jan reply", "search", _ts(1, 6)),
    ("I", 3, "c2", 0, "user", "feb hello", None, _ts(2)),
    ("I", 4, "c3", 0, "user", "mar v1", None, _ts(3)),
    ("U", 5, "c3", 0, "user", "mar v2", None, _ts(3)),
]

MORE = [
    ("U", 6, "c1", 0, "user", "jan hello v2", None, _ts(1)),
    ("I", 7, "c2", 1, "assistant", "feb reply", None, _ts(2, 7)),
    ("D", 8, "c3", 0, None, None, None, _ts(3)),
]


def _state(df):
    return {
        (r.conv_id, r.turn_idx, r.ts): (r.role, r.text, r.tool)
        for r in df.collect()
    }


def _mor_router(spark, tmp_path, name="ptab", **kw):
    t = PartitionedTable(
        spark, str(tmp_path / name), num_buckets=4, merge_mode="mor", **kw
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_stage_first_engages_and_matches_flat(spark, tmp_path):
    """Both the empty-table first batch AND the steady-state second batch
    take the stage-first path (no discovery job), and the final state
    matches a flat LakeTable fed the same events."""
    t = _mor_router(spark, tmp_path)
    m0 = t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    assert m0["fused"] is True
    assert m0["phases"].get("stage_first") is True
    assert "discovery_sec" not in m0["phases"]
    m1 = t.apply_changes(_events(spark, MORE), batch_id=1)
    assert m1["phases"].get("stage_first") is True
    assert sorted(t.partitions()) == ["2025-01", "2025-02", "2025-03"]

    flat = LakeTable(spark, str(tmp_path / "flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    flat.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    flat.apply_changes(_events(spark, MORE), batch_id=1)
    assert _state(t.read()) == _state(flat.read())


def test_stage_first_new_partition_with_evolution(spark, tmp_path):
    """A batch that both births a new partition AND implicitly adds a
    column: the new partition's schema chain is [spec, canon] (created at
    spec, one evolution step to the staged shape) and reads are whole."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    ev = _events(
        spark,
        [("I", 10, "c9", 0, "user", "april", None, _ts(4))],
    ).withColumn("lang", F.lit("en"))
    m = t.apply_changes(ev, batch_id=1)
    assert m["phases"].get("stage_first") is True
    assert "2025-04" in t.partitions()
    sub_man = t.part("2025-04").manifest()
    assert len(sub_man["schemas"]) == 2  # spec, then the evolved canon
    got = t.read().filter(F.col("conv_id") == "c9").collect()
    assert len(got) == 1 and got[0].lang == "en"
    # existing partitions evolved too (default-null backfill on read)
    jan = t.read().filter(F.col("conv_id") == "c1").collect()
    assert all(r.lang is None for r in jan)


def test_stage_first_replay_after_partial_commit_falls_back(spark, tmp_path):
    """Crash-replay convergence: one sub-table already committed batch 1
    (a crash between sub-commits), so the ctx must refuse stage-first —
    staging data a commit will discard — and the legacy path must skip
    the committed partition and converge."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    # simulate the partial crash: batch 1 landed on the jan sub only
    # (MORE[0] is MORE's only jan row, so the replay's sub-skip loses
    # nothing)
    t.part("2025-01").apply_changes(
        _events(spark, [MORE[0]]), batch_id=1
    )
    m = t.apply_changes(_events(spark, MORE), batch_id=1)
    assert "stage_first" not in m["phases"]  # refused → discovery path
    assert m["parts"]["2025-01"].get("skipped") is True
    flat = LakeTable(spark, str(tmp_path / "flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    flat.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    flat.apply_changes(_events(spark, MORE), batch_id=1)
    assert _state(t.read()) == _state(flat.read())


def test_stage_first_divergent_signatures_fall_back(spark, tmp_path):
    """Per-partition divergence (an explicit per-sub DDL) breaks the
    common signature — the router must fall back to the discovery path
    and still converge."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    # diverge one partition's schema directly (per-sub DDL surface)
    t.part("2025-02").add_column("note", "string")
    m = t.apply_changes(_events(spark, MORE), batch_id=1)
    assert "stage_first" not in m["phases"]
    assert m["fused"] is True  # legacy fused path, grouped by signature
    assert m["phases"]["n_groups"] == 2
    assert _state(t.read()) == {
        ("c1", 0, _ts(1)): ("user", "jan hello v2", None),
        ("c1", 1, _ts(1, 6)): ("assistant", "jan reply", "search"),
        ("c2", 0, _ts(2)): ("user", "feb hello", None),
        ("c2", 1, _ts(2, 7)): ("assistant", "feb reply", None),
    }


def test_stage_first_check_constraint_enforced(spark, tmp_path):
    """CHECK constraints ride the staged job's inline guard: a violating
    row fails the batch before any commit, on the stage-first path."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    bad = _events(
        spark, [("I", 20, "cX", -1, "user", "bad", None, _ts(2))]
    )
    with pytest.raises(Exception, match="CHECK constraint violated"):
        t.apply_changes(bad, batch_id=1)
    # table unchanged and a fixed batch applies (stage-first again)
    ok = _events(
        spark, [("I", 20, "cX", 3, "user", "good", None, _ts(2))]
    )
    m = t.apply_changes(ok, batch_id=1)
    assert m["phases"].get("stage_first") is True
    assert t.read().filter(F.col("conv_id") == "cX").count() == 1


def test_stage_first_cow_strategy_never_engages(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "cow"), num_buckets=4,
                         merge_mode="cow")
    t.create(TRANSCRIPT_SCHEMA)
    m = t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    assert "stage_first" not in m["phases"]
    assert m["fused"] is False


def test_stage_first_cross_partition_router_composes(spark, tmp_path):
    """cross_partition_upsert ON: the route step already collapsed the
    batch; stage-first must honor skip_collapse and movers must still
    land in their new partition with the old row deleted."""
    t = _mor_router(spark, tmp_path, name="xp", cross_partition_upsert=True)
    m0 = t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    assert m0["phases"].get("stage_first") is True
    # move c2 (feb) to june: an update whose ts crosses partitions
    mover = _events(
        spark,
        [("U", 30, "c2", 0, "user", "moved to june", None, _ts(6))],
    )
    m1 = t.apply_changes(mover, batch_id=1)
    assert m1["phases"].get("stage_first") is True
    rows = t.read().filter(F.col("conv_id") == "c2").collect()
    assert len(rows) == 1
    assert rows[0].text == "moved to june"
    assert rows[0].ts.month == 6
    assert "2025-06" in t.partitions()


def test_stage_first_bootstrap_single_job(spark, tmp_path):
    """bootstrap() on an empty router rides stage-first: all partitions
    load from ONE job and the handoff seq semantics hold."""
    t = _mor_router(spark, tmp_path, name="boot")
    snap = spark.createDataFrame(
        [
            ("c1", 0, "user", "jan", None, _ts(1)),
            ("c2", 0, "user", "feb", None, _ts(2)),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    m = t.bootstrap(snap, snapshot_seq=100)
    assert m["phases"].get("stage_first") is True
    assert sorted(t.partitions()) == ["2025-01", "2025-02"]
    # an event below the snapshot seq loses; above wins
    t.apply_changes(
        _events(
            spark,
            [
                ("U", 50, "c1", 0, "user", "stale", None, _ts(1)),
                ("U", 150, "c2", 0, "user", "fresh", None, _ts(2)),
            ],
        ),
        batch_id=0,
    )
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got == {"c1": "jan", "c2": "fresh"}


def test_fused_read_falls_back_on_divergent_schemas(spark, tmp_path):
    """A per-sub DDL divergence (type-real column add on one partition)
    must push read() onto the per-sub union path — same rows either way.
    The divergence only reaches the GLOBAL cut once a later apply pins
    the new sub version (direct per-sub DDL commits no global cut), so
    the fused read correctly still serves the pre-DDL cut until then."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    assert t._fused_read(t.manifest()) is not None  # engaged before
    t.part("2025-02").add_column("extra", "int")
    # pre-DDL global cut: fused read still serves it (and correctly so)
    assert t._fused_read(t.manifest()) is not None
    # the next apply pins the divergent sub version into a global cut
    t.apply_changes(_events(spark, MORE), batch_id=1)
    man = t.manifest()
    assert t._fused_read(man) is None  # declined after divergence
    got = _state(t.read().drop("extra"))
    flat = LakeTable(spark, str(tmp_path / "flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    flat.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    flat.apply_changes(_events(spark, MORE), batch_id=1)
    assert got == _state(flat.read())


def test_fused_read_handles_delete_tombstones(spark, tmp_path):
    """The delete case the path-derived partition exists for: a D event's
    payload (including ts) is nulled in the tombstone row, so partition
    identity MUST come from the file path — the deleted key stays dead
    under the fused read."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    t.apply_changes(_events(spark, [
        ("D", 50, "c1", 0, None, None, None, _ts(1)),
    ]), batch_id=1)
    assert t._fused_read(t.manifest()) is not None
    rows = t.read().filter(F.col("conv_id") == "c1").collect()
    assert [(r.turn_idx) for r in rows] == [1]  # turn 0 stays deleted


def test_fused_read_version_pinned_cut(spark, tmp_path):
    """read(version=G) through the fused path serves the pinned cut, not
    the head."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    v0 = t.manifest()["version"]
    t.apply_changes(_events(spark, MORE), batch_id=1)
    old = _state(t.read(version=v0))
    assert ("c1", 0, _ts(1)) in old
    assert old[("c1", 0, _ts(1))] == ("user", "jan hello", None)
    head = _state(t.read())
    assert head[("c1", 0, _ts(1))] == ("user", "jan hello v2", None)


def test_driver_bucket_ids_parity_and_fallback(spark):
    """read_keys' driver-side probe hashing (round 5): the numpy murmur3
    bucket ids must equal the JVM _bucket_expr's for string and long keys
    (incl. unicode + full-range longs), and type-mismatched probes fall
    back (None) so the Spark cast path owns coercion."""
    import random

    from pyspark.sql import types as T

    from cdm_to_mods_spark.plans.lake import _bucket_expr, _driver_bucket_ids

    rng = random.Random(7)
    longs = [rng.randrange(-2**62, 2**62) for _ in range(100)]
    drv = _driver_bucket_ids(longs, T.LongType(), 8)
    jvm = sorted({
        r["_b"]
        for r in spark.createDataFrame([(k,) for k in longs], "k long")
        .select(_bucket_expr("k", 8).alias("_b")).distinct().collect()
    })
    assert drv == jvm
    strs = [
        "".join(rng.choice("abcdefgh漢字🎉") for _ in range(rng.randrange(0, 40)))
        for _ in range(100)
    ]
    drv = _driver_bucket_ids(strs, T.StringType(), 16)
    jvm = sorted({
        r["_b"]
        for r in spark.createDataFrame([(s,) for s in strs], "k string")
        .select(_bucket_expr("k", 16).alias("_b")).distinct().collect()
    })
    assert drv == jvm
    assert _driver_bucket_ids(["5"], T.LongType(), 8) is None
    assert _driver_bucket_ids([5], T.StringType(), 8) is None


def test_fused_fanout_read_keys_parity(spark, tmp_path):
    """The no-index full fan-out probe rides ONE fused scan (round 5) and
    matches the per-sub union byte-for-byte, including absent keys."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS + [
        ("I", 9, "c1", 5, "user", "jan extra", None, _ts(1, 9)),
    ]), batch_id=0)
    man = t.manifest()
    probe = ["c1", "c3", "absent-key"]
    assert t._fused_read_keys(man, probe) is not None
    got = sorted(map(tuple, t.read_keys(probe)
                     .select("conv_id", "turn_idx", "text").collect()))
    union = t._union(
        [t._sub(p).read_keys(probe, version=v)
         for p, v in sorted(man["parts"].items())],
        empty=lambda: t._empty_cut(man),
    )
    want = sorted(map(tuple, union
                      .select("conv_id", "turn_idx", "text").collect()))
    assert got == want and len(got) == 4
    assert t.read_keys(["nobody"]).count() == 0


def test_fused_read_range_parity_multi_partition(spark, tmp_path):
    """A range spanning two months rides the fused single plan and equals
    the per-sub union byte-for-byte; a mid-month range filters within
    the partition; an out-of-range probe is empty."""
    t = _mor_router(spark, tmp_path)
    t.apply_changes(_events(spark, THREE_MONTHS), batch_id=0)
    man = t.manifest()
    lo, hi = _ts(1, 1), _ts(2, 28)
    fused = t._fused_read_range(
        man, sorted(man["parts"].items())[:2], lo, hi, "ts"
    )
    assert fused is not None
    got = _state(t.read_range(lo, hi))
    union = t._union(
        [t._sub(p).read_range(lo, hi, col="ts", version=v)
         for p, v in sorted(man["parts"].items())
         if p in ("2025-01", "2025-02")],
        empty=lambda: t._empty_cut(man),
    )
    assert got == _state(union)
    assert {k[0] for k in got} == {"c1", "c2"}
    # mid-month sub-range filters inside the partition
    assert {k[0] for k in _state(t.read_range(_ts(1, 6), _ts(1, 7)))} == {"c1"}
    # no-overlap probe
    assert t.read_range(_ts(11, 1), _ts(12, 1)).count() == 0
