"""Router-scope dead-letter quarantine: null-key rows split off ONCE at
the router (threaded sub-applies append-writing one shared quarantine
directory would race committer staging), re-admitted through the router
so fixed rows land in the partition their ts derives."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


@pytest.fixture
def qtab(spark, tmp_path):
    t = PartitionedTable(
        spark, str(tmp_path / "pq"), num_buckets=4, merge_mode="mor",
        quarantine_path=str(tmp_path / "pq-dead"),
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_null_key_rows_quarantine_at_router_scope(spark, qtab, tmp_path):
    t = qtab
    m = t.apply_changes(spark.createDataFrame([
        ("I", 1, "c1", 0, "user", "jan ok", None, _ts(1)),
        ("I", 2, None, 0, "user", "jan bad", None, _ts(1)),
        ("I", 3, "c2", None, "user", "feb bad", None, _ts(2)),
    ], EVENT_DDL), batch_id=0)
    assert m["n_quarantined"] == 2
    # only the good row landed; both bad rows are in the shared sink
    assert [r.conv_id for r in t.read().collect()] == ["c1"]
    dead = spark.read.parquet(str(tmp_path / "pq-dead"))
    assert dead.count() == 2
    assert set(dead.columns) >= {"conv_id", "_quarantine_batch"}
    # subs were built WITHOUT a quarantine path (no per-partition writers)
    assert t.part("2025-01").quarantine_path is None


def test_reprocess_routes_fixed_rows_to_their_partition(spark, qtab):
    t = qtab
    t.apply_changes(spark.createDataFrame([
        ("I", 1, "c1", 0, "user", "jan ok", None, _ts(1)),
        # fixable: key null, but its ts routes to 2025-03 — a partition
        # that does not even exist yet at quarantine time
        ("I", 2, None, 0, "user", "mar orphan", None, _ts(3)),
    ], EVENT_DDL), batch_id=0)

    def fix(df):
        return df.withColumn(
            "conv_id", F.coalesce("conv_id", F.lit("recovered")))

    m = t.reprocess_quarantine(fix, batch_id=1)
    assert m["n_quarantined"] == 0
    assert "2025-03" in t.partitions()
    got = {(r.conv_id, r.text) for r in t.read().collect()}
    assert ("recovered", "mar orphan") in got
    # re-running the SAME re-admission is exactly-once via the ledger
    assert t.reprocess_quarantine(fix, batch_id=1)["skipped"]


def test_unfixed_rows_requarantine(spark, qtab, tmp_path):
    t = qtab
    t.apply_changes(spark.createDataFrame([
        ("I", 2, None, 0, "user", "still bad", None, _ts(1)),
    ], EVENT_DDL), batch_id=0)
    m = t.reprocess_quarantine(lambda df: df, batch_id=1)
    assert m["n_quarantined"] == 1  # identity fix: row re-quarantines
    assert os.path.isdir(str(tmp_path / "pq-dead"))
    assert t.reprocess_quarantine(lambda df: df, batch_id=1)["skipped"]
