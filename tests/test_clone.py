"""Shallow clone: zero-copy metadata fork of a lake table (Delta
CLONE / Iceberg snapshot-ref analog) — state parity without copying
bytes, independent divergence, batch-ledger carry-over, schema-history
resolution through the clone, compaction as full detach."""

from __future__ import annotations

import os

import pytest

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EV = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _table(spark, path, **kw):
    t = LakeTable(spark, path, num_buckets=4, merge_mode="mor", **kw)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _apply(spark, t, rows, bid):
    t.apply_changes(spark.createDataFrame(rows, EV), batch_id=bid)


def _state(t):
    """(conv_id, turn_idx) → full row dict (key cols excluded)."""
    return {
        (r.conv_id, r.turn_idx): {
            k: v for k, v in r.asDict().items()
            if k not in ("conv_id", "turn_idx")
        }
        for r in t.read().collect()
    }


def _texts(t):
    return {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}


def _parquet_bytes_under(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def test_clone_is_zero_copy_state_parity(spark, tmp_path):
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None),
                        ("I", 2, "c2", 0, "user", "b", "calc")], 0)
    _apply(spark, src, [("U", 3, "c1", 0, "user", "a2", None),
                        ("D", 4, "c2", 0, None, None, None)], 1)
    dst = src.clone(str(tmp_path / "dst"))
    # same live state, not one parquet byte written under the clone
    assert _state(dst) == _state(src)
    assert _texts(src) == {("c1", 0): "a2"}
    assert _parquet_bytes_under(str(tmp_path / "dst")) == 0
    # point reads prune through the cloned (absolute-path) manifest too
    got = dst.read_keys(["c1"]).collect()
    assert [(r.conv_id, r.text) for r in got] == [("c1", "a2")]
    # history labels the fork and the ledger restarts at v0
    h = dst.history()
    assert [e["operation"] for e in h] == ["clone"]
    assert h[0]["metrics"]["source"] == src.path


def test_clone_diverges_independently(spark, tmp_path):
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None)], 0)
    dst = src.clone(str(tmp_path / "dst"))
    # clone-side write: lands under the clone, source unchanged
    _apply(spark, dst, [("U", 2, "c1", 0, "user", "clone-edit", None)], 1)
    assert _texts(dst) == {("c1", 0): "clone-edit"}
    assert _texts(src) == {("c1", 0): "a"}
    assert _parquet_bytes_under(str(tmp_path / "dst")) > 0
    # source-side write after the fork: clone unchanged
    _apply(spark, src, [("I", 3, "c9", 0, "user", "post-fork", None)], 1)
    assert ("c9", 0) not in _texts(dst)
    # the clone's change feed serves CLONE-ERA commits only
    feed = dst.changes(0)
    assert {r.text for r in feed.collect()} == {"clone-edit"}


def test_clone_carries_batch_ledger(spark, tmp_path):
    """a forked pipeline resumes exactly-once: the source's last applied
    batch_id is already in the clone's ledger, so redelivery is a skip."""
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None)], 7)
    dst = src.clone(str(tmp_path / "dst"))
    _apply(spark, dst, [("U", 2, "c1", 0, "user", "dup", None)], 7)  # replay
    assert _texts(dst)[("c1", 0)] == "a"  # skipped, not re-applied
    _apply(spark, dst, [("U", 3, "c1", 0, "user", "next", None)], 8)
    assert _texts(dst)[("c1", 0)] == "next"


def test_clone_resolves_schema_history(spark, tmp_path):
    """files written under pre-rename schema_ids must read through the
    clone's carried rename log, and constraints survive the fork."""
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "pre", None)], 0)
    src.rename_column("text", "content")
    src.add_constraint("role_known", "role IN ('user','assistant','tool')")
    dst = src.clone(str(tmp_path / "dst"))
    assert [r.content for r in dst.read().collect()] == ["pre"]
    assert [c["name"] for c in dst.constraints()] == ["role_known"]
    with pytest.raises(Exception, match="role_known"):
        dst.apply_changes(
            spark.createDataFrame(
                [("I", 2, "c2", 0, "invader", "x", None)],
                EV.replace("text string", "content string"),
            ),
            batch_id=1,
        )


def test_clone_time_travel_fork_and_compact_detach(spark, tmp_path):
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "v1", None)], 0)
    _apply(spark, src, [("U", 2, "c1", 0, "user", "v2", None)], 1)
    # fork the HISTORICAL snapshot, not the head
    dst = src.clone(str(tmp_path / "dst"), version=1)
    assert _texts(dst)[("c1", 0)] == "v1"
    # compact() rewrites every referenced byte locally: full detach —
    # no absolute (source-owned) refs remain in the clone's manifest
    dst.compact()
    man = dst.manifest()
    refs = [
        fs["path"]
        for e in man["buckets"].values()
        for fs in LakeTable._bucket_files(e)
    ]
    assert refs and not any(os.path.isabs(p) for p in refs)
    # destructive maintenance on the source no longer affects the clone
    _apply(spark, src, [("U", 3, "c1", 0, "user", "v3", None)], 2)
    src.expire_snapshots(keep_last=1)
    assert _texts(dst)[("c1", 0)] == "v1"


def test_clone_from_relative_source_path(spark, tmp_path, monkeypatch):
    """a source opened via a RELATIVE path must still produce clone refs
    that resolve from the clone's own directory (abspath, not join)."""
    monkeypatch.chdir(tmp_path)
    src = _table(spark, "src-rel")
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None)], 0)
    dst = src.clone(str(tmp_path / "dst"))
    refs = [
        fs["path"]
        for e in dst.manifest()["buckets"].values()
        for fs in LakeTable._bucket_files(e)
    ]
    assert refs and all(os.path.isabs(p) for p in refs)
    assert _texts(dst) == {("c1", 0): "a"}


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None)], 0)
    other = _table(spark, str(tmp_path / "occupied"))
    with pytest.raises(RuntimeError, match="existing lake table"):
        src.clone(str(tmp_path / "occupied"))
    del other
