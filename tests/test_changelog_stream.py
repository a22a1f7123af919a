"""Streaming typed changelog — ``lake_cdf`` in ``mode="row_changes"``
(the Delta CDF *stream* with ``_change_type`` / Paimon changelog topic
analog) and the continuously-maintained ``AdditiveStatsView`` on top
(``maintain_view_stream`` — the Flink retract-stream topology end to end).

Reference analog: the reference recomputes its collection summaries after
every wipe-and-redo run (post_cdm_cleanup.py:81-95); the streaming
changelog is what lets a downstream aggregate advance per commit without
ever re-reading the table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.incremental import AdditiveStatsView
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.streaming.source import (
    is_changelog_unavailable_failure,
    maintain_view_stream,
    register_lake_cdf,
)

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(op, seq, conv, turn, role="user", text="t", tool=None):
    return (op, seq, conv, turn, role, text, tool, None, None)


def _table(spark, path, mode="mor", **kw):
    t = LakeTable(
        spark, path, num_buckets=4, merge_mode=mode,
        changelog="lookup", **kw,
    )
    if not t.exists():
        t.create(TRANSCRIPT_SCHEMA)
    return t


def _apply(t, rows, batch_id):
    t.apply_changes(t.spark.createDataFrame(rows, EVENT_DDL), batch_id=batch_id)


def _drain(spark, path, ck):
    register_lake_cdf(spark)
    got = []
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("mode", "row_changes")
        .load()
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def _key(r):
    return (r._version, r.conv_id, r.turn_idx, r._change_type, r._seq)


def _tup(r):
    return (r.conv_id, r.turn_idx, r.role, r.text, r.tool,
            r._seq, r._change_type, r._version)


def test_stream_matches_row_changes(spark, tmp_path):
    """The stream delivers exactly the batch row_changes records —
    materialized lookup records, first-load derive inserts, and
    delete_where derive pre-images alike."""
    t = _table(spark, str(tmp_path / "tab"))
    # v1: first load — derive-insert fast path (no materialized records)
    _apply(t, [_ev("I", 1, "c1", 0, text="a"),
               _ev("I", 2, "c2", 0, text="b")], 0)
    # v2: update + delete event — materialized changelog records
    _apply(t, [_ev("U", 3, "c1", 0, text="a2"),
               _ev("D", 4, "c2", 0, text=None, role=None)], 1)
    # v3: compliance purge — derive-delete fast path
    t.delete_where("conv_id = 'c1'")
    t.compact()  # maintenance version contributes nothing

    got = _drain(spark, t.path, str(tmp_path / "ck"))
    want = t.row_changes(0).collect()
    assert sorted(map(_tup, got), key=str) == sorted(map(_tup, want), key=str)
    # every change class crossed the stream
    assert {r._change_type for r in got} == {
        "insert", "update_preimage", "update_postimage", "delete",
    }


def test_stream_resumes_and_sees_only_new_versions(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(t, [_ev("I", 1, "c1", 0, text="a")], 0)
    ck = str(tmp_path / "ck")
    first = _drain(spark, t.path, ck)
    assert [(r._change_type, r.text) for r in first] == [("insert", "a")]
    _apply(t, [_ev("U", 2, "c1", 0, text="b")], 1)
    second = _drain(spark, t.path, ck)
    assert sorted((r._change_type, r.text) for r in second) == [
        ("update_postimage", "b"), ("update_preimage", "a"),
    ]
    assert _drain(spark, t.path, ck) == []


def test_stream_fails_typed_without_changelog(spark, tmp_path):
    """A state-changing version with no typed changelog fails the query
    with the matchable marker — the streaming ChangelogUnavailableError."""
    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4,
                  merge_mode="mor")  # changelog='none'
    t.create(TRANSCRIPT_SCHEMA)
    _apply(t, [_ev("I", 1, "c1", 0)], 0)
    with pytest.raises(Exception) as ei:
        _drain(spark, t.path, str(tmp_path / "ck"))
    assert is_changelog_unavailable_failure(ei.value)


def _recompute(t):
    return {
        (r.conv_id): (r.n_turns, r.n_chars)
        for r in AdditiveStatsView._agg(t.read()).collect()
    }


def _view_state(view):
    return {r.conv_id: (r.n_turns, r.n_chars) for r in view.read().collect()}


def test_view_stream_matches_recompute(spark, tmp_path):
    """maintain_view_stream seeds, then folds each micro-batch additively;
    across drains on one checkpoint the view equals a full recompute."""
    t = _table(spark, str(tmp_path / "tab"))
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    ck = str(tmp_path / "ck")
    _apply(t, [_ev("I", 1, "c1", 0, text="aaaa"),
               _ev("I", 2, "c2", 0, text="bb")], 0)
    maintain_view_stream(spark, view, ck).awaitTermination(120)
    assert _view_state(view) == _recompute(t)  # seed covers the backlog

    _apply(t, [_ev("U", 3, "c1", 0, text="a"),          # shrink c1
               _ev("I", 4, "c2", 1, text="cccc"),       # grow c2
               _ev("D", 5, "c2", 0, text=None)], 1)     # retract a turn
    t.delete_where("conv_id = 'c1'")                     # purge c1 entirely
    maintain_view_stream(spark, view, ck).awaitTermination(120)
    assert _view_state(view) == _recompute(t)
    assert "c1" not in _view_state(view)  # fully-retracted group vanished
    assert view.applied_version() == t.latest_version()


def test_view_stream_bounded_drain(spark, tmp_path):
    """A backlog drains in capped steps (one version per trigger) and
    still converges to the recompute."""
    t = _table(spark, str(tmp_path / "tab"))
    for i in range(4):
        _apply(t, [_ev("I", i + 1, f"c{i}", 0, text="x" * (i + 1))], i)
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    view.refresh()  # seed at head
    _apply(t, [_ev("U", 10, "c0", 0, text="yy")], 10)
    _apply(t, [_ev("I", 11, "c9", 0, text="zzz")], 11)
    _apply(t, [_ev("D", 12, "c1", 0, text=None)], 12)
    q = maintain_view_stream(
        spark, view, str(tmp_path / "ck"), max_versions_per_trigger=1
    )
    q.awaitTermination(120)
    assert _view_state(view) == _recompute(t)


def test_apply_delta_is_idempotent_and_suffix_safe(spark, tmp_path):
    """Redelivered frames are skips; a frame overlapping the marker folds
    only its unapplied suffix (no double counting)."""
    t = _table(spark, str(tmp_path / "tab"))
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    _apply(t, [_ev("I", 1, "c1", 0, text="aaaa")], 0)
    view.refresh()
    v1 = t.latest_version()
    _apply(t, [_ev("U", 2, "c1", 0, text="aaaaaaaa")], 1)
    delta = t.row_changes(v1)
    assert view.apply_delta(delta)["refreshed"] is True
    assert _view_state(view) == _recompute(t)
    # whole-frame redelivery: skip
    assert view.apply_delta(delta)["refreshed"] is False
    assert _view_state(view) == _recompute(t)
    # overlapping frame (applied prefix + new suffix): only suffix folds
    _apply(t, [_ev("I", 3, "c2", 0, text="bb")], 2)
    assert view.apply_delta(t.row_changes(v1))["refreshed"] is True
    assert _view_state(view) == _recompute(t)


def test_apply_delta_refuses_unseeded_view(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(t, [_ev("I", 1, "c1", 0)], 0)
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    with pytest.raises(ValueError, match="unseeded"):
        view.apply_delta(t.row_changes(0))


def test_row_changes_mode_rejects_bad_mode(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(t, [_ev("I", 1, "c1", 0)], 0)
    register_lake_cdf(spark)
    with pytest.raises(Exception, match="row_changes"):
        (
            spark.readStream.format("lake_cdf")
            .option("path", t.path)
            .option("mode", "bogus")
            .load()
        )
