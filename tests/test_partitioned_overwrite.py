"""Router replaceWhere: predicate-scoped atomic replace fanned across
partitions at one fleet seq. Oracle: the flat LakeTable given the same
op (identity convention of test_partitioned.py)."""

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
    ("I", 1, "c1", 0, "user", "jan a", None, _ts(1)),
    ("I", 2, "c1", 1, "user", "jan b", None, _ts(1, 6)),
    ("I", 3, "c2", 0, "user", "feb a", None, _ts(2)),
    ("I", 4, "c3", 0, "user", "mar a", None, _ts(3)),
]


@pytest.fixture
def pair(spark, tmp_path):
    pt = PartitionedTable(spark, str(tmp_path / "po"), num_buckets=4,
                          merge_mode="mor")
    pt.create(TRANSCRIPT_SCHEMA)
    flat = LakeTable(spark, str(tmp_path / "po-flat"), num_buckets=4,
                     merge_mode="mor")
    flat.create(TRANSCRIPT_SCHEMA)
    ev = spark.createDataFrame(SEED, EVENT_DDL)
    pt.apply_changes(ev, batch_id=0)
    flat.apply_changes(ev, batch_id=0)
    return pt, flat


def _state(df):
    return {(r.conv_id, r.turn_idx): (r.text,) for r in df.collect()}


def test_replace_partition_region_matches_flat(spark, pair):
    pt, flat = pair
    # replace all of January with one new row: c1/1 deleted, c1/0 updated
    rows = spark.createDataFrame(
        [("c1", 0, "user", "jan NEW", None, _ts(1))], ROW_DDL)
    pred = "ts >= timestamp'2025-01-01' and ts < timestamp'2025-02-01'"
    m = pt.overwrite_where(rows, pred)
    flat.overwrite_where(rows, pred)
    assert _state(pt.read()) == _state(flat.read())
    # untouched partitions committed nothing
    assert m["parts"]["2025-02"].get("skipped") is True
    assert m["parts"]["2025-03"].get("skipped") is True
    assert m["parts"]["2025-01"]["replaced_rows"] == 2
    assert m["parts"]["2025-01"]["inserted_rows"] == 1


def test_replace_deletes_in_rowless_partitions(spark, pair):
    pt, flat = pair
    # predicate spans feb+mar but replacement rows land only in feb:
    # mar's region must still be deleted (empty-slice pure delete)
    rows = spark.createDataFrame(
        [("c2", 0, "user", "feb NEW", None, _ts(2))], ROW_DDL)
    pred = "ts >= timestamp'2025-02-01'"
    pt.overwrite_where(rows, pred)
    flat.overwrite_where(rows, pred)
    assert _state(pt.read()) == _state(flat.read())
    assert ("c3", 0) not in _state(pt.read())


def test_replace_into_new_partition_and_outside_row_refused(spark, pair):
    pt, _ = pair
    pred = "ts >= timestamp'2025-05-01' and ts < timestamp'2025-06-01'"
    rows = spark.createDataFrame(
        [("c5", 0, "user", "may NEW", None, _ts(5))], ROW_DDL)
    m = pt.overwrite_where(rows, pred)
    assert "2025-05" in pt.partitions()
    assert m["parts"]["2025-05"]["inserted_rows"] == 1
    # a row outside the predicate refuses the whole statement (flat rule)
    bad = spark.createDataFrame(
        [("c6", 0, "user", "june leak", None, _ts(6))], ROW_DDL)
    v = pt.latest_version()
    with pytest.raises(ValueError, match="outside"):
        pt.overwrite_where(bad, pred)
    assert pt.latest_version() == v


def test_overwrite_refuses_index_mode(spark, tmp_path):
    xp = PartitionedTable(spark, str(tmp_path / "pox"), num_buckets=4,
                          merge_mode="mor", cross_partition_upsert=True)
    xp.create(TRANSCRIPT_SCHEMA)
    rows = xp.spark.createDataFrame(
        [("c1", 0, "user", "x", None, _ts(1))], ROW_DDL)
    with pytest.raises(ValueError, match="delete_where"):
        xp.overwrite_where(rows, "ts >= timestamp'2025-01-01'")
