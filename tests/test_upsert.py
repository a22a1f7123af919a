"""StreamingUpsert: compacted-topic / snapshot-feed ingestion — no op/seq
columns, tombstone deletes, in-batch latest-wins, exactly-once redelivery."""

from __future__ import annotations

import datetime as dt

import pytest

from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.streaming.upsert import StreamingUpsert

TS1 = dt.datetime(2024, 1, 1, 10, 0, 0)
TS2 = dt.datetime(2024, 1, 2, 10, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read().collect()
    }


def _tail(spark, tmp_path, **kw):
    return StreamingUpsert(
        spark,
        str(tmp_path / "snap"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        order_col="ts",
        delete_when="s.text IS NULL",
        **kw,
    )


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_upsert_insert_update_delete(spark, tmp_path, merge_mode):
    _write(
        spark,
        str(tmp_path / "snap" / "b0"),
        [
            ("c1", 0, "user", "hello", "search", TS1),
            ("c1", 1, "assistant", "hi", None, TS1),
            ("c2", 0, "user", "bye", None, TS1),
        ],
    )
    up = _tail(spark, tmp_path, merge_mode=merge_mode)
    t = up.run_to_completion(120)
    assert _state(t) == {
        ("c1", 0): ("user", "hello", "search"),
        ("c1", 1): ("assistant", "hi", None),
        ("c2", 0): ("user", "bye", None),
    }
    v0 = t.latest_version()

    # second snapshot batch: update c1/0, tombstone c1/1, tombstone for a
    # key the table never had (must NOT insert a null row), insert c3/0
    _write(
        spark,
        str(tmp_path / "snap" / "b1"),
        [
            ("c1", 0, "user", "hello v2", "search", TS2),
            ("c1", 1, None, None, None, TS2),
            ("c9", 0, None, None, None, TS2),
            ("c3", 0, "system", "new", "calc", TS2),
        ],
    )
    t = _tail(spark, tmp_path, merge_mode=merge_mode).run_to_completion(120)
    assert _state(t) == {
        ("c1", 0): ("user", "hello v2", "search"),
        ("c2", 0): ("user", "bye", None),
        ("c3", 0): ("system", "new", "calc"),
    }
    if merge_mode == "mor":
        feed = {
            (r.conv_id, r.turn_idx): r._deleted
            for r in t.changes(v0).collect()
        }
        assert feed[("c1", 1)] is True      # tombstone rode the feed as D
        assert ("c9", 0) not in feed        # unmatched tombstone dropped
        assert feed[("c3", 0)] is False


def test_upsert_in_batch_latest_wins(spark, tmp_path):
    """compaction-lazy feed: two versions of one key in ONE batch — the
    order_col winner lands, regardless of file row order."""
    _write(
        spark,
        str(tmp_path / "snap" / "b0"),
        [
            ("c1", 0, "user", "late", None, TS2),
            ("c1", 0, "user", "early", None, TS1),
        ],
    )
    t = _tail(spark, tmp_path).run_to_completion(120)
    assert _state(t) == {("c1", 0): ("user", "late", None)}


def test_upsert_duplicate_keys_refused_without_order_col(spark, tmp_path):
    _write(
        spark,
        str(tmp_path / "snap" / "b0"),
        [
            ("c1", 0, "user", "a", None, TS1),
            ("c1", 0, "user", "b", None, TS1),
        ],
    )
    up = StreamingUpsert(
        spark,
        str(tmp_path / "snap"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
    )
    with pytest.raises(Exception, match="duplicate source keys"):
        up.run_to_completion(120)


def test_upsert_redelivery_is_exactly_once(spark, tmp_path):
    _write(
        spark,
        str(tmp_path / "snap" / "b0"),
        [("c1", 0, "user", "once", None, TS1)],
    )
    t = _tail(spark, tmp_path).run_to_completion(120)
    v = t.latest_version()
    # crash-lost checkpoint: a fresh tail redelivers the whole backlog as
    # micro-batch 0 — the table's batch ledger skips it, no new version.
    up2 = StreamingUpsert(
        spark,
        str(tmp_path / "snap"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt2"),
        num_buckets=8,
        order_col="ts",
        delete_when="s.text IS NULL",
    )
    t2 = up2.run_to_completion(120)
    assert t2.latest_version() == v
    assert any(m.get("skipped") for m in up2.batch_metrics)
    assert _state(t2) == {("c1", 0): ("user", "once", None)}


def test_upsert_custom_schema_creates_matching_table(spark, tmp_path):
    """the feed's row shape IS the table shape: a custom schema (extra
    column) must create the table with it, not the default transcript
    schema that would silently drop the column."""
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp, lang string")
    spark.createDataFrame(
        [("c1", 0, "user", "hi", None, TS1, "en")], ddl
    ).coalesce(1).write.parquet(str(tmp_path / "snap" / "b0"))
    up = StreamingUpsert(
        spark,
        str(tmp_path / "snap"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=4,
        schema=ddl,
        order_col="ts",
    )
    t = up.run_to_completion(120)
    assert "lang" in t.read().columns
    assert t.read().first().lang == "en"
