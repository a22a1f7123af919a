"""Typed changelog → FULL Debezium envelopes (before AND after images,
true c/u/d ops) — the outbound bus shape the replication feed cannot
provide, batch (``changelog_range_to_debezium``) and streaming
(``publish_changelog_stream``).

Reference analog: the reference's per-run reports carry only final state;
a downstream auditor diffing runs needs the old value too — exactly the
before-image this publisher ships."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F, types as T

from cdm_to_mods_spark.plans.feed import (
    _DZ_TS_FMT,
    changelog_range_to_debezium,
)
from cdm_to_mods_spark.plans.lake import ChangelogUnavailableError, LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.debezium import parse_debezium
from cdm_to_mods_spark.streaming.source import publish_changelog_stream

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(op, seq, conv, turn, role="user", text="t", tool=None):
    return (op, seq, conv, turn, role, text, tool, None, None)


def _table(spark, path):
    t = LakeTable(spark, path, num_buckets=4, merge_mode="mor",
                  changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _apply(t, rows, batch_id):
    t.apply_changes(t.spark.createDataFrame(rows, EVENT_DDL), batch_id=batch_id)


def _seed(spark, path):
    t = _table(spark, path)
    _apply(t, [_ev("I", 1, "c1", 0, text="old"),
               _ev("I", 2, "c2", 0, text="bye")], 0)        # v1: inserts
    _apply(t, [_ev("U", 3, "c1", 0, text="new"),
               _ev("D", 4, "c2", 0, text=None, role=None),
               _ev("I", 5, "c3", 0, text="fresh")], 1)       # v2: u + d + c
    return t


def _envs(rows):
    return [json.loads(r.value) for r in rows]


def test_batch_envelopes_carry_both_images_and_true_ops(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "src"))
    envs = _envs(changelog_range_to_debezium(t, 0).collect())
    by = {(e["op"], (e.get("after") or e.get("before"))["conv_id"],
           e["source"]["lsn"]): e for e in envs}
    # v1: two inserts — before null (to_json omits nulls), after populated
    assert by[("c", "c1", 1)].get("before") is None
    assert by[("c", "c1", 1)]["after"]["text"] == "old"
    # v2: true update with BOTH images
    u = by[("u", "c1", 2)]
    assert (u["before"]["text"], u["after"]["text"]) == ("old", "new")
    # v2: delete — after null, before is the pre-image payload
    d = by[("d", "c2", 2)]
    assert d.get("after") is None and d["before"]["text"] == "bye"
    # v2: insert of a new key in a later version
    assert by[("c", "c3", 2)]["after"]["text"] == "fresh"
    # lsn = commit version (per-key ordering token); source-domain seq rides
    # in source.seq; commit ts present
    assert all(isinstance(e["ts_ms"], int) for e in envs)
    assert by[("u", "c1", 2)]["source"]["seq"] == 3
    assert len(envs) == 5


def _mirror(spark, lines_df, path):
    payload = T.StructType(
        [T.StructField(f.name, f.dataType, True)
         for f in TRANSCRIPT_SCHEMA.fields]
    )
    ev = parse_debezium(
        lines_df, payload_schema=payload, json_options=_DZ_TS_FMT
    ).drop("ingest_ts")
    dst = LakeTable(spark, path, num_buckets=4)
    if not dst.exists():
        dst.create(TRANSCRIPT_SCHEMA)
    dst.apply_changes(ev, batch_id=dst.manifest()["last_batch_id"] + 1)
    return dst


def _state(t):
    return {(r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
            for r in t.read().collect()}


def test_batch_round_trip_mirror_converges(spark, tmp_path):
    """Envelopes → parse_debezium → apply reproduces the live state,
    including a tombstone-mode delete_where's derive records."""
    t = _seed(spark, str(tmp_path / "src"))
    t.delete_where("conv_id = 'c3'", mode="tombstone")       # v3: derive d
    lines = changelog_range_to_debezium(t, 0)
    dst = _mirror(spark, lines, str(tmp_path / "dst"))
    assert _state(dst) == _state(t)
    assert ("c3", 0) not in _state(dst)


def test_batch_raises_where_row_changes_does(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "src"), num_buckets=4,
                  merge_mode="mor")  # no changelog
    t.create(TRANSCRIPT_SCHEMA)
    _apply(t, [_ev("I", 1, "c1", 0)], 0)
    with pytest.raises(ChangelogUnavailableError):
        changelog_range_to_debezium(t, 0).collect()


def _read_bus(spark, out):
    return spark.read.option("recursiveFileLookup", "true").text(out)


def test_streaming_publisher_round_trip_and_resume(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "src"))
    out, ck = str(tmp_path / "bus"), str(tmp_path / "ck")
    q = publish_changelog_stream(spark, t.path, out, ck)
    q.awaitTermination(120)
    dst = _mirror(spark, _read_bus(spark, out), str(tmp_path / "dst"))
    assert _state(dst) == _state(t)
    # stream and batch publishers emit the same change set (op, key, lsn)
    sk = {(e["op"], (e.get("after") or e.get("before"))["conv_id"],
           e["source"]["lsn"])
          for e in _envs(_read_bus(spark, out).collect())}
    bk = {(e["op"], (e.get("after") or e.get("before"))["conv_id"],
           e["source"]["lsn"])
          for e in _envs(changelog_range_to_debezium(t, 0).collect())}
    assert sk == bk
    # resume on the same checkpoint publishes only the new versions
    _apply(t, [_ev("U", 9, "c1", 0, text="newer")], 2)
    q = publish_changelog_stream(spark, t.path, out, ck)
    q.awaitTermination(120)
    dst2 = _mirror(spark, _read_bus(spark, out), str(tmp_path / "dst"))
    assert _state(dst2) == _state(t)
    # idle drain adds nothing
    n = _read_bus(spark, out).count()
    q = publish_changelog_stream(spark, t.path, out, ck)
    q.awaitTermination(120)
    assert _read_bus(spark, out).count() == n


def test_streaming_publisher_bounded_drain(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "src"))
    _apply(t, [_ev("U", 7, "c3", 0, text="fresher")], 2)
    out, ck = str(tmp_path / "bus"), str(tmp_path / "ck")
    q = publish_changelog_stream(
        spark, t.path, out, ck, max_versions_per_trigger=1
    )
    q.awaitTermination(120)
    dst = _mirror(spark, _read_bus(spark, out), str(tmp_path / "dst"))
    assert _state(dst) == _state(t)


# ---------------------------------------------------- partitioned sources
PART_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _mts(month):
    import datetime as dt

    return dt.datetime(2025, month, 5, 12, 0, 0)


def test_partitioned_default_identity_pairs_per_partition(spark, tmp_path):
    """DEFAULT-identity partitioned source: row identity is (partition,
    key), so the same key live in two months is TWO rows — one global
    commit updating both must emit TWO envelopes with each row's own
    before/after pair. The pre-fix key-only pairing merged both rows'
    images into one corrupt envelope (before from one month, after from
    the other)."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    t = PartitionedTable(spark, str(tmp_path / "pt"), num_buckets=4,
                         merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(spark.createDataFrame([
        ("I", 1, "c1", 0, "user", "jan-old", None, _mts(1)),
        ("I", 2, "c1", 0, "user", "feb-old", None, _mts(2)),
    ], PART_DDL), batch_id=0)
    t.apply_changes(spark.createDataFrame([
        ("U", 3, "c1", 0, "user", "jan-new", None, _mts(1)),
        ("U", 4, "c1", 0, "user", "feb-new", None, _mts(2)),
    ], PART_DDL), batch_id=1)
    envs = _envs(changelog_range_to_debezium(t, 0).collect())
    v2 = [e for e in envs if e["source"]["lsn"] == 2]
    assert len(v2) == 2 and all(e["op"] == "u" for e in v2)
    pairs = {(e["before"]["text"], e["after"]["text"]) for e in v2}
    assert pairs == {("jan-old", "jan-new"), ("feb-old", "feb-new")}
    # v1: two distinct inserts, not one
    v1 = [e for e in envs if e["source"]["lsn"] == 1]
    assert len(v1) == 2 and all(e["op"] == "c" for e in v1)


def test_cross_partition_move_envelope_is_update(spark, tmp_path):
    """cross_partition_upsert: a MOVE is a delete at the old home plus an
    insert at the new, in ONE global commit. Key identity is global, so
    the envelope is ONE 'u' with old before / new after — the pre-fix op
    precedence rendered 'd', telling every consumer to drop a row that
    still exists."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    t = PartitionedTable(spark, str(tmp_path / "xp"), num_buckets=4,
                         merge_mode="mor", changelog="lookup",
                         cross_partition_upsert=True, index_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(spark.createDataFrame([
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
    ], PART_DDL), batch_id=0)
    t.apply_changes(spark.createDataFrame([
        ("U", 2, "c1", 0, "user", "moved", None, _mts(3)),
    ], PART_DDL), batch_id=1)
    envs = _envs(changelog_range_to_debezium(t, 0).collect())
    move = [e for e in envs if e["source"]["lsn"] == 2]
    assert len(move) == 1
    (e,) = move
    assert e["op"] == "u"
    assert e["before"]["text"] == "jan" and e["after"]["text"] == "moved"
