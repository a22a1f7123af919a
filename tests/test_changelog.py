"""Typed row-level changelog (``changelog="lookup"``) — the Paimon
``changelog-producer=lookup`` / Delta CDC ``_change_type`` analog — and the
retraction-maintained ``AdditiveStatsView`` built on it.

Differential oracle: for every committed version, ``row_changes`` applied
as retract/add deltas must transform the previous snapshot's state into
the new snapshot's state (both read with time travel from the SAME table),
for every merge engine. That pins classification, pre/post-image values,
no-op suppression and derive paths at once.

Reference analog: the reference's re-run diffs (wipe-and-redo exports) are
whole-state replacements; a typed changelog is the incremental form a
downstream aggregate consumer needs (post_cdm_cleanup.py's recomputed
counts, made additive)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.incremental import AdditiveStatsView
from cdm_to_mods_spark.plans.lake import (
    ChangelogUnavailableError,
    LakeTable,
)
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

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


def _snap(t, v):
    """(key -> payload) state of version v."""
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read(v).collect()
    }


def _check_changelog_bridges(t, lo, hi):
    """Replaying row_changes over (lo, hi] as retract/add deltas must
    transform snapshot(lo) into snapshot(hi), with every retraction's
    pre-image matching the state it retracts — the exact contract an
    additive consumer relies on. Within one version a key carries at most
    one retraction and one addition."""
    state = dict(_snap(t, lo))
    rows = t.row_changes(lo, hi).collect()
    by_version: dict = {}
    for r in rows:
        by_version.setdefault(r._version, []).append(r)
    for v in sorted(by_version):
        removed, added = {}, {}
        for r in by_version[v]:
            k = (r.conv_id, r.turn_idx)
            img = (r.role, r.text, r.tool)
            if r._change_type in ("delete", "update_preimage"):
                assert k not in removed, f"double retraction for {k} in v{v}"
                removed[k] = (r._change_type, img)
            else:
                assert r._change_type in ("insert", "update_postimage")
                assert k not in added, f"double addition for {k} in v{v}"
                added[k] = (r._change_type, img)
        for k, (ct, img) in removed.items():
            assert state.get(k) == img, (k, ct, img, state.get(k))
            paired = k in added
            assert (ct == "update_preimage") == paired, (k, ct, paired)
            del state[k]
        for k, (ct, img) in added.items():
            assert (ct == "update_postimage") == (k in removed)
            state[k] = img
    assert state == _snap(t, hi), (state, _snap(t, hi))


BATCHES = [
    [_ev("I", 1, "c1", 0), _ev("I", 2, "c1", 1, text="hello"),
     _ev("I", 3, "c2", 0, text="x")],
    # update, delete, insert, and a no-op late event (seq 1 < stored 2)
    [_ev("U", 10, "c1", 1, text="edited"), _ev("D", 11, "c2", 0),
     _ev("I", 12, "c3", 0, text="new"), _ev("U", 1, "c1", 0)],
    # re-create deleted key; multi-update in one batch (last wins)
    [_ev("I", 20, "c2", 0, text="back"), _ev("U", 21, "c3", 0, text="a"),
     _ev("U", 22, "c3", 0, text="b")],
]


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_row_changes_is_the_state_diff(spark, tmp_table, mode):
    t = _table(spark, tmp_table, mode)
    for i, rows in enumerate(BATCHES):
        _apply(t, rows, batch_id=i)
    head = t.latest_version()
    # per-version bridges AND the whole range at once
    for v in range(1, head + 1):
        _check_changelog_bridges(t, v - 1, v)
    _check_changelog_bridges(t, 0, head)


def test_row_changes_bridges_randomized_op_mix(spark, tmp_table):
    """The bridge invariant under a RANDOMIZED interleaving of applies
    with delete_where / update_where / compact (session-19 fuzz find:
    none — this pins the walk the one-off fuzz ran, so the interleaved
    surfaces stay covered). Seeded, so the sequence is deterministic."""
    import random

    rng = random.Random(31)
    t = _table(spark, tmp_table)
    seq = 0
    bid = 0
    for step in range(4):
        rows = []
        for _ in range(12):
            seq += 1
            conv = f"c{rng.randint(0, 5)}"
            turn = rng.randint(0, 2)
            op = rng.choice(["I", "U", "U", "D"])
            rows.append(
                _ev(op, seq, conv, turn,
                    role=rng.choice(["user", "assistant"]),
                    text=f"t{seq}" if op != "D" else None,
                    tool=rng.choice([None, "search"]))
            )
        _apply(t, rows, batch_id=bid)
        bid += 1
        side = rng.choice(["none", "delete", "update", "compact"])
        if side == "delete":
            t.delete_where("tool = 'search'")
        elif side == "update":
            t.update_where("role = 'user'", {"text": "concat(text, '!')"})
        elif side == "compact":
            t.compact()
    head = t.latest_version()
    for v in range(1, head + 1):
        try:
            _check_changelog_bridges(t, v - 1, v)
        except ChangelogUnavailableError:
            continue  # maintenance-only version without changelog coverage
    _check_changelog_bridges(t, 0, head)


def test_noop_late_event_emits_nothing(spark, tmp_table):
    t = _table(spark, tmp_table)
    _apply(t, [_ev("I", 5, "c1", 0, text="v5")], 0)
    v1 = t.latest_version()
    _apply(t, [_ev("U", 2, "c1", 0, text="late-loser")], 1)
    assert t.row_changes(v1).count() == 0
    # equal-value rewrite is suppressed too
    _apply(t, [_ev("U", 9, "c1", 0, text="v5")], 2)
    assert t.row_changes(v1).count() == 0


def test_first_load_derives_inserts_without_extra_files(spark, tmp_table):
    t = _table(spark, tmp_table)
    _apply(t, BATCHES[0], 0)
    rows = t.row_changes(0).collect()
    assert {r._change_type for r in rows} == {"insert"}
    assert len(rows) == 3
    # derived from the commit's own change files — no -changelog dir
    data = os.path.join(t.path, "data")
    assert not any(d.endswith("-changelog") for d in os.listdir(data))


def test_bootstrap_derives_inserts(spark, tmp_table):
    t = _table(spark, tmp_table)
    snap = spark.createDataFrame(
        [("c1", 0, "user", "a", None, None), ("c2", 0, "user", "b", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    t.bootstrap(snap, snapshot_seq=100)
    rows = t.row_changes(0).collect()
    assert {r._change_type for r in rows} == {"insert"} and len(rows) == 2


def test_replication_feed_unaffected(spark, tmp_table, tmp_path):
    plain = LakeTable(spark, str(tmp_path / "plain"), num_buckets=4,
                      merge_mode="mor")
    plain.create(TRANSCRIPT_SCHEMA)
    t = _table(spark, tmp_table)
    for i, rows in enumerate(BATCHES):
        _apply(t, rows, i)
        plain.apply_changes(
            spark.createDataFrame(rows, EVENT_DDL), batch_id=i
        )
    a = {tuple(r) for r in t.changes(0).drop("_seq").collect()}
    b = {tuple(r) for r in plain.changes(0).drop("_seq").collect()}
    assert a == b


def test_delete_where_emits_delete_preimages(spark, tmp_table):
    t = _table(spark, tmp_table)
    _apply(t, BATCHES[0], 0)
    v = t.latest_version()
    t.delete_where("text = 'hello'")
    rows = t.row_changes(v).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r._change_type == "delete" and r.text == "hello"
    _check_changelog_bridges(t, v, t.latest_version())


def test_update_where_rides_the_lookup(spark, tmp_table):
    t = _table(spark, tmp_table)
    _apply(t, BATCHES[0], 0)
    v = t.latest_version()
    t.update_where("conv_id = 'c1'", {"text": "concat(text, '!')"})
    _check_changelog_bridges(t, v, t.latest_version())


def test_gap_version_raises_unavailable(spark, tmp_table):
    t0 = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t0.create(TRANSCRIPT_SCHEMA)
    _apply(t0, BATCHES[0], 0)  # committed WITHOUT changelog
    t = _table(spark, tmp_table)
    v1 = t.latest_version()
    _apply(t, BATCHES[1], 1)
    with pytest.raises(ChangelogUnavailableError):
        t.row_changes(0).collect()
    # the covered suffix still reads
    assert t.row_changes(v1).count() > 0


def test_maintenance_versions_contribute_nothing(spark, tmp_table):
    t = _table(spark, tmp_table)
    _apply(t, BATCHES[0], 0)
    v = t.latest_version()
    t.compact()
    t.set_property("owner", "x")
    assert t.row_changes(v).count() == 0
    _apply(t, BATCHES[1], 1)
    _check_changelog_bridges(t, v, t.latest_version())


def test_partial_update_postimages_are_merged_rows(spark, tmp_table):
    t = _table(spark, tmp_table, merge_engine="partial_update")
    _apply(t, [_ev("I", 1, "c1", 0, role="user", text="hello", tool="s")], 0)
    v = t.latest_version()
    # patch touches only `text`; post-image must keep role/tool
    _apply(t, [("U", 5, "c1", 0, None, "patched", None, None, None)], 1)
    rows = {r._change_type: r for r in t.row_changes(v).collect()}
    assert rows["update_preimage"].text == "hello"
    post = rows["update_postimage"]
    assert (post.role, post.text, post.tool) == ("user", "patched", "s")


def test_expire_keeps_retained_changelogs(spark, tmp_table):
    t = _table(spark, tmp_table)
    for i, rows in enumerate(BATCHES):
        _apply(t, rows, i)
    head = t.latest_version()
    t.expire_snapshots(keep_last=2)
    lo = t._versions()[0]
    _check_changelog_bridges(t, lo, head)
    with pytest.raises(Exception):
        t.row_changes(lo - 2, head).collect()


def test_additive_view_matches_recompute(spark, tmp_table, tmp_path):
    t = _table(spark, tmp_table)
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    for i, rows in enumerate(BATCHES):
        _apply(t, rows, i)
        r = view.refresh()
        assert r["refreshed"]
        if i > 0:
            assert r["strategy"] == "retract"
        got = {
            (x.conv_id): (x.n_turns, x.n_chars) for x in view.read().collect()
        }
        want = {
            r2.conv_id: (r2.n_turns, r2.n_chars)
            for r2 in AdditiveStatsView._agg(t.read()).collect()
        }
        assert got == want, (got, want)


def test_additive_view_reseeds_over_gap(spark, tmp_table, tmp_path):
    t0 = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t0.create(TRANSCRIPT_SCHEMA)
    t = _table(spark, tmp_table)
    view = AdditiveStatsView(spark, t, str(tmp_path / "view"))
    _apply(t, BATCHES[0], 0)
    view.refresh()
    _apply(t0, BATCHES[1], 1)  # non-changelog writer slips in
    r = view.refresh()
    # round 4: a changelog GAP no longer forces a full reseed — the
    # refresh-time pre-image lookup derives the retractions from the
    # plain change feed (strategy 'lookup_retract'); the state equality
    # below is the contract either way
    assert r["strategy"] == "lookup_retract"
    got = {x.conv_id: (x.n_turns, x.n_chars) for x in view.read().collect()}
    want = {
        r2.conv_id: (r2.n_turns, r2.n_chars)
        for r2 in AdditiveStatsView._agg(t.read()).collect()
    }
    assert got == want
