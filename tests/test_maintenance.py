"""maintain(): threshold policy — folds due delta chains, bin-packs small
files, expires on request, recommends (never auto-runs) rebucket on skew,
no-ops on a healthy table."""

from __future__ import annotations

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.maintenance import maintain
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


def _actions(res):
    return [a["action"] for a in res["actions"]]


def test_healthy_table_is_a_noop(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    t.compact()
    v = t.manifest()["version"]
    res = maintain(t, min_rows_per_file=1)
    assert res["actions"] == [] and res["recommendations"] == []
    assert t.manifest()["version"] == v  # nothing committed


def test_long_delta_chain_triggers_compaction(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    # every batch hits the same key: one bucket accumulates a chain
    for b in range(5):
        _apply(spark, t, [("U" if b else "I", b + 1, "c1", 0, "user", f"t{b}", None)], b)
    before = t.describe_detail()
    assert before["max_delta_chain"] >= 3
    # dry_run reports, doesn't touch
    dry = maintain(t, max_delta_chain=3, dry_run=True)
    assert _actions(dry) == ["compact"] and dry["actions"][0]["result"] is None
    assert t.describe_detail()["max_delta_chain"] == before["max_delta_chain"]

    res = maintain(t, max_delta_chain=3)
    assert _actions(res) == ["compact"]
    assert res["actions"][0]["result"]["compacted"] >= 1
    after = t.describe_detail()
    assert after["max_delta_chain"] == 0
    assert [r.text for r in t.read().collect()] == ["t4"]
    # healthy now: a second pass no-ops
    assert maintain(t, max_delta_chain=3)["actions"] == []


def test_small_files_trigger_binpack(spark, tmp_path):
    # many single-row files in one bucket via tiny batches
    t = _table(spark, str(tmp_path / "tab"))
    for b in range(4):
        _apply(spark, t, [("I", b + 1, "c1", b, "user", "x", None)], b)
    d = t.describe_detail()
    assert d["num_files"] > d["populated_buckets"]
    res = maintain(t, max_delta_chain=99, min_rows_per_file=10)
    assert _actions(res) == ["compact"]
    assert "rows/file" in res["actions"][0]["reason"]
    d2 = t.describe_detail()
    assert d2["num_files"] == d2["populated_buckets"] == 1
    assert t.read().count() == 4


def test_expiry_runs_only_when_asked(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    for b in range(3):
        _apply(spark, t, [("I", b + 1, f"c{b}", 0, "user", "x", None)], b)
    assert "expire_snapshots" not in _actions(maintain(t, min_rows_per_file=1))
    res = maintain(t, min_rows_per_file=1, expire_keep_last=1)
    assert "expire_snapshots" in _actions(res)
    assert len(t.history()) == 1


def test_skew_is_recommended_not_executed(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    rows = [("I", i + 1, "hot", i, "user", "x", None) for i in range(30)]
    rows += [("I", 100, "cold-a", 0, "user", "x", None),
             ("I", 101, "cold-b", 0, "user", "x", None)]
    _apply(spark, t, rows, 0)
    res = maintain(t, min_rows_per_file=1, skew_share_threshold=0.5)
    assert res["actions"] == []  # freshly-written single files: nothing due
    assert [r["recommendation"] for r in res["recommendations"]] == [
        "rebucket_or_salt"
    ]
    assert t.num_buckets == 4  # nothing rewritten


def test_deltaless_small_files_get_rewritten(spark, tmp_path):
    """Multi-file bases with NO deltas (plain compact would no-op) are
    bin-packed via the every-bucket rewrite; a second pass no-ops — no
    endless trigger loop. A table still capped by target_file_rows clamps
    the policy floor instead of rewriting forever."""
    t = LakeTable(
        spark, str(tmp_path / "tab"), num_buckets=4, merge_mode="mor",
        target_file_rows=2,
    )
    t.create(TRANSCRIPT_SCHEMA)
    _apply(spark, t, [("I", i + 1, "c1", i, "user", "x", None) for i in range(6)], 0)
    t.compact()  # base split into 3 files of 2 rows, zero deltas
    d = t.describe_detail()
    assert d["delta_rows"] == 0 and d["num_files"] == 3
    # same handle: floor clamps to target_file_rows=2, mean=2 → healthy
    assert maintain(t, min_rows_per_file=10_000)["actions"] == []
    # uncapped reopen: the small-file state is real and must be fixed
    t2 = LakeTable(spark, str(tmp_path / "tab"))
    res = maintain(t2, min_rows_per_file=10_000)
    assert [a["action"] for a in res["actions"]] == ["compact"]
    assert res["actions"][0]["result"]["compacted"] >= 1
    d2 = t2.describe_detail()
    assert d2["num_files"] == d2["populated_buckets"] == 1
    assert t2.read().count() == 6
    assert maintain(t2, min_rows_per_file=10_000)["actions"] == []


def test_ttl_policy_expires_old_rows_through_the_delete_path(spark, tmp_path):
    from datetime import datetime

    t = _table(spark, str(tmp_path / "ttl"))
    ev = spark.createDataFrame(
        [("I", 1, "old", 0, "user", "ancient", None, datetime(2020, 1, 1)),
         ("I", 2, "new", 0, "user", "recent", None, datetime(2025, 6, 1))],
        EV + ", ts timestamp",
    )
    t.apply_changes(ev, batch_id=0)
    v0 = t.latest_version()
    # dry run reports, touches nothing
    res = maintain(t, ttl_col="ts", ttl_older_than="2024-01-01",
                   dry_run=True, min_rows_per_file=1)
    ttl = next(a for a in res["actions"] if a["action"] == "ttl_delete")
    assert ttl["would_delete_rows"] == 1 and t.latest_version() == v0
    # real run deletes exactly the expired row and rides the change feed
    res = maintain(t, ttl_col="ts", ttl_older_than="2024-01-01",
                   min_rows_per_file=1)
    ttl = next(a for a in res["actions"] if a["action"] == "ttl_delete")
    assert ttl["result"]["deleted_rows"] == 1
    assert [r.conv_id for r in t.read().collect()] == ["new"]
    feed = t.changes(t.latest_version() - 1).collect()
    assert [(r.conv_id, r._deleted) for r in feed] == [("old", True)]
    # repeat is a no-op delete
    res = maintain(t, ttl_col="ts", ttl_older_than="2024-01-01",
                   min_rows_per_file=1)
    ttl = next(a for a in res["actions"] if a["action"] == "ttl_delete")
    assert ttl["result"]["deleted_rows"] == 0


def test_ttl_args_must_come_together(spark, tmp_path):
    import pytest

    t = _table(spark, str(tmp_path / "ttl2"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    with pytest.raises(ValueError, match="together"):
        maintain(t, ttl_col="ts")
    with pytest.raises(ValueError, match="together"):
        maintain(t, ttl_older_than="2024-01-01")


def test_ttl_unparsable_bound_fails_loud(spark, tmp_path):
    import pytest

    t = _table(spark, str(tmp_path / "ttl3"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    with pytest.raises(ValueError, match="does not parse"):
        maintain(t, ttl_col="ts", ttl_older_than="01/02/2024")


def test_capped_table_quiesces_on_non_multiple_rows(spark, tmp_path):
    """7 rows at target_file_rows=2 compact to 2,2,2,1 — mean 1.75 is
    BELOW the cap forever, so the pre-fix mean-based trigger scheduled a
    useless full rewrite on every maintain() run. The capped trigger now
    compares file COUNT against the tightest achievable layout: a
    genuinely fragmented table still compacts once, then quiesces."""
    t = LakeTable(
        spark, str(tmp_path / "cap7"), num_buckets=4, merge_mode="mor",
        target_file_rows=2,
    )
    t.create(TRANSCRIPT_SCHEMA)
    # 7 single-row applies: 7 delta files in one bucket — fragmented
    for i in range(7):
        _apply(spark, t, [("I", i + 1, "c1", i, "user", "x", None)], i)
    res = maintain(t, min_rows_per_file=10_000)
    assert "compact" in _actions(res)  # real fragmentation: compacts once
    d = t.describe_detail()
    assert d["num_files"] == 4  # ceil(7/2) — the tightest capped layout
    # and now it QUIESCES: the 4-file/1.75-mean layout is as good as the
    # cap allows (pre-fix: another full rewrite, forever)
    assert maintain(t, min_rows_per_file=10_000)["actions"] == []
    assert t.read().count() == 7
