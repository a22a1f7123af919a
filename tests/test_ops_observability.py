"""Consumer lag + quarantine reprocessing — the day-2 operations surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.feed import ChangeFeedConsumer
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def test_consumer_lag_tracks_versions_rows_and_time(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    c = ChangeFeedConsumer(spark, t, str(tmp_path / "ckpt.json"))
    assert c.lag() == {
        "versions_behind": 0, "rows_behind": 0, "seconds_behind": 0.0,
        "last_consumed": 0, "head": 0,
    }
    t.apply_changes(
        _events(spark, [("I", 1, "c1", 0, "user", "a", None),
                        ("I", 2, "c2", 0, "user", "b", None)]),
        batch_id=0,
    )
    t.apply_changes(
        _events(spark, [("U", 3, "c1", 0, "user", "a2", None)]), batch_id=1
    )
    lag = c.lag()
    assert lag["versions_behind"] == 2
    assert lag["rows_behind"] == 3
    assert lag["seconds_behind"] >= 0.0
    c.run_to_head(lambda df, s, u: None)
    lag2 = c.lag()
    assert lag2["versions_behind"] == 0 and lag2["rows_behind"] == 0
    assert lag2["last_consumed"] == lag2["head"] == 2


def test_reprocess_quarantine_readmits_fixed_rows(spark, tmp_path):
    qdir = str(tmp_path / "q")
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4,
                  merge_mode="mor", quarantine_path=qdir)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [
            ("I", 1, "c1", 0, "user", "good", None),
            ("I", 2, None, 0, "user", "lost-key orphan", None),
        ]),
        batch_id=0,
    )
    assert {r.conv_id for r in t.read().collect()} == {"c1"}
    assert spark.read.parquet(qdir).count() == 1

    res = t.reprocess_quarantine(
        lambda q: q.withColumn(
            "conv_id", F.coalesce(F.col("conv_id"), F.lit("recovered"))
        ),
        batch_id=1,
    )
    assert res["n_events"] == 1 and res["n_quarantined"] == 0
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got == {"c1": "good", "recovered": "lost-key orphan"}
    assert any(
        h["operation"] == "quarantine_replay" for h in t.history()
    )
    # idempotent: re-admitting the same rows converges (seq LWW)
    t.reprocess_quarantine(
        lambda q: q.withColumn(
            "conv_id", F.coalesce(F.col("conv_id"), F.lit("recovered"))
        ),
        batch_id=2,
    )
    assert t.read().count() == 2


def test_reprocess_quarantine_without_fix_requarantines(spark, tmp_path):
    """An identity fix leaves keys null — rows loop back to quarantine
    instead of corrupting the merge."""
    qdir = str(tmp_path / "q")
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4,
                  merge_mode="mor", quarantine_path=qdir)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [("I", 1, None, 0, "user", "orphan", None)]),
        batch_id=0,
    )
    res = t.reprocess_quarantine(lambda q: q, batch_id=1)
    assert res["n_quarantined"] == 1 and res["n_events"] == 0
    assert t.read().count() == 0


def test_reprocess_quarantine_requires_configuration(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="quarantine_path"):
        t.reprocess_quarantine(lambda q: q)


def test_reprocess_empty_quarantine_is_a_noop(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4,
                  merge_mode="mor", quarantine_path=str(tmp_path / "q"))
    t.create(TRANSCRIPT_SCHEMA)
    assert t.reprocess_quarantine(lambda q: q)["skipped"] is True
