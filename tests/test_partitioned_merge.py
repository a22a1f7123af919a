"""Router MERGE INTO: partition-local fan-out of the flat merge.

Oracle: a FLAT LakeTable given the same merge — the two agree whenever
no key's ts crosses partitions (the suite-wide identity convention from
test_partitioned.py).
"""

from __future__ import annotations

import datetime as dt

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
    ("I", 1, "c1", 0, "user", "jan hello", None, _ts(1)),
    ("I", 2, "c2", 0, "user", "feb hello", None, _ts(2)),
    ("I", 3, "c2", 1, "assistant", "feb reply", "zap", _ts(2, 6)),
]
MERGE_SRC = [
    # matched in 2025-01 → update
    ("c1", 0, "user", "jan v2", None, _ts(1)),
    # matched in 2025-02 with tool=zap → delete clause wins
    ("c2", 1, "assistant", "ignored", "zap", _ts(2, 6)),
    # unmatched in 2025-02 → insert
    ("c9", 0, "user", "feb new", None, _ts(2, 7)),
    # unmatched in a BRAND-NEW partition 2025-05 → insert creates it
    ("c5", 0, "user", "may new", None, _ts(5)),
]


@pytest.fixture
def seeded(spark, tmp_path):
    pt = PartitionedTable(spark, str(tmp_path / "pm"), num_buckets=4,
                          merge_mode="mor")
    pt.create(TRANSCRIPT_SCHEMA)
    ev = spark.createDataFrame(SEED, EVENT_DDL)
    pt.apply_changes(ev, batch_id=0)
    flat = LakeTable(spark, str(tmp_path / "pm-flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    flat.apply_changes(ev, batch_id=0)
    return pt, flat


def _state(df):
    return {(r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
            for r in df.collect()}


def _merge(tab, src, **kw):
    return tab.merge_into(
        src,
        when_matched_update={"text": "s.text"},
        when_matched_delete="s.tool = 'zap'",
        when_not_matched_insert=True,
        **kw,
    )


def test_merge_matches_flat_oracle_and_creates_partition(spark, seeded):
    pt, flat = seeded
    src = spark.createDataFrame(MERGE_SRC, ROW_DDL)
    m = _merge(pt, src, batch_id=1)
    _merge(flat, src, batch_id=1)
    assert _state(pt.read()) == _state(flat.read())
    assert m["n_parts_touched"] == 3
    assert "2025-05" in pt.partitions()
    # one fleet-wide merge seq for the whole statement
    assert m["merge_seq"] >= 4


def test_merge_exactly_once_and_crash_replay(spark, seeded):
    pt, flat = seeded
    src = spark.createDataFrame(MERGE_SRC, ROW_DDL)
    _merge(pt, src, batch_id=1)
    assert _merge(pt, src, batch_id=1)["skipped"]

    # crash mid-fan-out: one partition's slice merged, global commit never
    # landed — the statement replay must converge (sub-ledger skips it)
    src2 = spark.createDataFrame(
        [("c1", 0, "user", "jan v3", None, _ts(1)),
         ("c2", 0, "user", "feb v2", None, _ts(2))], ROW_DDL)
    pt.part("2025-01").merge_into(
        src2.filter("ts < timestamp'2025-02-01'"),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=True,
        merge_seq=99, batch_id=2,
    )
    m = pt.merge_into(src2, when_matched_update={"text": "s.text"},
                      when_not_matched_insert=True, merge_seq=99,
                      batch_id=2)
    assert m["parts"]["2025-01"].get("skipped") is True
    _merge(flat, src, batch_id=1)
    flat.merge_into(src2, when_matched_update={"text": "s.text"},
                    when_not_matched_insert=True, merge_seq=99, batch_id=2)
    assert _state(pt.read()) == _state(flat.read())


def test_merge_same_key_in_two_partitions_is_two_identities(spark, seeded):
    pt, _ = seeded
    # (c1, 0) exists in 2025-01; a source row for (c1, 0) in 2025-03 is a
    # DIFFERENT identity under the spec — it inserts, leaving both rows
    src = spark.createDataFrame(
        [("c1", 0, "user", "mar twin", None, _ts(3))], ROW_DDL)
    _merge(pt, src)
    rows = sorted((r.text) for r in pt.read()
                  .filter("conv_id = 'c1'").collect())
    assert rows == ["jan hello", "mar twin"]


def test_merge_requires_partition_col_and_refuses_index_mode(
    spark, tmp_path, seeded,
):
    pt, _ = seeded
    with pytest.raises(ValueError, match="partition column"):
        _merge(pt, spark.createDataFrame(
            [("c1", 0, "user", "x", None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string"))
    xp = PartitionedTable(spark, str(tmp_path / "pmx"), num_buckets=4,
                          merge_mode="mor", cross_partition_upsert=True)
    xp.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="apply_changes"):
        _merge(xp, spark.createDataFrame(MERGE_SRC, ROW_DDL))


def test_merge_respects_inherited_constraint_in_new_partition(spark, seeded):
    pt, _ = seeded
    pt.add_constraint("turn_nonneg", "turn_idx >= 0")
    src = spark.createDataFrame(
        [("c7", -1, "user", "bad new part", None, _ts(7))], ROW_DDL)
    with pytest.raises(Exception, match="CHECK constraint violated"):
        _merge(pt, src)
