"""delete_where: predicate purge as tombstones — O(matching buckets)
rewrite, change-feed D-rows, resurrection guard, time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode=request.param)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(
            spark,
            [
                ("I", 1, "c1", 0, "user", "keep me", "search", None, None),
                ("I", 2, "c1", 1, "user", "PURGE ssn=1", "search", None, None),
                ("I", 3, "c2", 0, "user", "PURGE ssn=2", None, None, None),
                ("I", 4, "c3", 0, "user", "clean", None, None, None),
            ],
        ),
        batch_id=0,
    )
    t.apply_changes(
        _events(
            spark,
            [
                ("U", 5, "c3", 0, "user", "still clean", None, None, None),
                ("I", 6, "c4", 0, "user", "PURGE ssn=3", None, None, None),
            ],
        ),
        batch_id=1,
    )
    return t


def _keys(t, version=None):
    return {(r.conv_id, r.turn_idx) for r in t.read(version).collect()}


def test_delete_where_purges_and_keeps(spark, table):
    v0 = table.latest_version()
    res = table.delete_where("text LIKE '%PURGE%'", note="pii")
    assert res["deleted_rows"] == 3
    assert res["version"] == v0 + 1
    assert _keys(table) == {("c1", 0), ("c3", 0)}
    # surviving rows are byte-identical
    rows = {r.conv_id: r.text for r in table.read().collect()}
    assert rows == {"c1": "keep me", "c3": "still clean"}
    # time travel still sees the purged rows until snapshots expire
    assert ("c2", 0) in _keys(table, version=v0)
    table.expire_snapshots(keep_last=1)
    with pytest.raises(Exception):
        table.read(v0).collect()


def test_delete_where_column_predicate_and_no_match(spark, table):
    v0 = table.latest_version()
    res = table.delete_where(F.col("conv_id") == "zz-nope")
    assert res == {"deleted_rows": 0, "version": v0}
    assert table.latest_version() == v0  # no commit for a no-op
    res = table.delete_where(F.col("conv_id") == "c2")
    assert res["deleted_rows"] == 1
    assert _keys(table) == {("c1", 0), ("c1", 1), ("c3", 0), ("c4", 0)}


def test_delete_where_untouched_buckets_not_rewritten(spark, table):
    from cdm_to_mods_spark.plans.lake import _bucket_expr

    man_before = table.manifest()
    table.delete_where(F.col("conv_id") == "c2")
    man_after = table.manifest()
    moved = {
        b
        for b in man_before["buckets"]
        if man_before["buckets"][b] != man_after["buckets"][b]
    }
    c2_bucket = (
        spark.createDataFrame([("c2",)], "conv_id string")
        .select(_bucket_expr("conv_id", 8, table.bucket_fn).alias("b"))
        .first()["b"]
    )
    # EXACTLY the bucket holding c2 was rewritten — O(matches), not O(table)
    assert moved == {str(c2_bucket)}


def test_delete_where_tombstone_blocks_resurrection(spark, table):
    res = table.delete_where("text LIKE '%PURGE%'")
    ts = res["tombstone_seq"]
    # a late event at a seq below the tombstone must NOT resurrect the key
    table.apply_changes(
        _events(
            spark,
            [("U", ts - 1, "c2", 0, "user", "I am back", None, None, None)],
        ),
        batch_id=2,
    )
    assert ("c2", 0) not in _keys(table)
    # but the sequence domain moves on: a later seq inserts normally
    table.apply_changes(
        _events(
            spark,
            [("I", ts + 10, "c2", 0, "user", "legit new", None, None, None)],
        ),
        batch_id=3,
    )
    assert {r.text for r in table.read_keys(["c2"]).collect()} == {"legit new"}


def test_delete_where_emits_change_feed_tombstones(spark, tmp_table):
    t = LakeTable(
        spark, tmp_table, num_buckets=8, merge_mode="mor"
    )
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(
            spark,
            [
                ("I", 1, "c1", 0, "user", "PURGE", None, None, None),
                ("I", 2, "c2", 0, "user", "fine", None, None, None),
            ],
        ),
        batch_id=0,
    )
    v0 = t.latest_version()
    res = t.delete_where("text = 'PURGE'")
    feed = t.changes(v0).collect()
    assert len(feed) == 1
    (d,) = feed
    assert (d.conv_id, d.turn_idx, d._deleted, d._seq) == (
        "c1", 0, True, res["tombstone_seq"],
    )
    # a downstream replica replaying the feed converges to the purged state
    assert _keys(t) == {("c2", 0)}


def test_delete_where_declines_conflict_then_converges_on_rerun(spark, tmp_table):
    """Maintenance ops don't auto-retry: a concurrent writer winning the
    version makes delete_where raise (its rewrite is against a stale base),
    nothing is corrupted, and a plain re-run converges — delete_where is
    idempotent because already-purged rows no longer match."""
    t1 = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor")
    t1.create(TRANSCRIPT_SCHEMA)
    t1.apply_changes(
        _events(spark, [
            ("I", 1, "c1", 0, "user", "PURGE", None, None, None),
            ("I", 2, "c2", 0, "user", "fine", None, None, None),
        ]),
        batch_id=0,
    )
    t2 = LakeTable(spark, tmp_table)
    orig = t1._commit

    def racy(man):
        t1._commit = orig  # only race the first commit
        t2.apply_changes(
            _events(
                spark,
                [("I", 9, "c3", 0, "user", "winner", None, None, None)],
            ),
            batch_id=1,
        )
        return orig(man)

    t1._commit = racy
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t1.delete_where("text = 'PURGE'")
    # the failed attempt left no trace: reads see the winner's state
    fresh = LakeTable(spark, tmp_table)
    assert {r.conv_id for r in fresh.read().collect()} == {"c1", "c2", "c3"}
    res = fresh.delete_where("text = 'PURGE'")
    assert res["deleted_rows"] == 1
    assert {r.conv_id for r in fresh.read().collect()} == {"c2", "c3"}
    # re-run: nothing matches anymore → clean no-op, no new version
    assert fresh.delete_where("text = 'PURGE'")["deleted_rows"] == 0


def test_delete_where_explicit_tombstone_seq(spark, table):
    res = table.delete_where("conv_id = 'c4'", tombstone_seq=1_000)
    assert res["tombstone_seq"] == 1_000
    assert ("c4", 0) not in _keys(table)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_lsn_collision_resolves_identically_on_read_and_fold(
    spark, tmp_table, mode
):
    """delete_where spends an LSN from the source domain; a source event
    arriving at EXACTLY that seq wins the op-ranked tie (U>I>D — the
    documented caveat). The winner must be the same on the merge-on-read
    READ path, after compact(), and on a fresh reopen — a tie-break that
    differed between read and fold would let compaction change visible
    state."""
    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode=mode)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [
            ("I", 1, "c1", 0, "user", "original", None, None, None),
            ("I", 2, "c2", 0, "user", "other", None, None, None),
        ]),
        batch_id=0,
    )
    res = t.delete_where("conv_id = 'c1'")
    assert res["deleted_rows"] == 1
    ts = res["tombstone_seq"]
    # in-flight source event sharing the purge's LSN re-creates the key
    t.apply_changes(
        _events(spark, [
            ("I", ts, "c1", 0, "user", "resurrected", None, None, None),
        ]),
        batch_id=1,
    )
    def state(handle):
        return {(r.conv_id, r.turn_idx): r.text for r in handle.read().collect()}
    want = {("c1", 0): "resurrected", ("c2", 0): "other"}
    assert state(t) == want                      # read-path resolution
    t.compact()
    assert state(t) == want                      # fold resolution agrees
    assert state(LakeTable(spark, tmp_table)) == want  # reopen agrees


# ---------------------------------------------------------------- tombstone
# mode="tombstone": the O(matches) logical delete (Delta deletion-vector
# cost model through the merge layer) + deferred physical purge at compact
# + tombstone GC (purge_tombstones_before_seq).


def test_tombstone_delete_matches_rewrite_state(spark, table):
    res = table.delete_where("text LIKE '%PURGE%'", mode="tombstone")
    assert res["deleted_rows"] == 3
    assert res["mode"] == "tombstone"
    assert _keys(table) == {("c1", 0), ("c3", 0)}
    rows = {r.conv_id: r.text for r in table.read().collect()}
    assert rows == {"c1": "keep me", "c3": "still clean"}
    # no match: no commit
    v = table.latest_version()
    assert table.delete_where("text = 'nope'", mode="tombstone") == {
        "deleted_rows": 0, "version": v, "mode": "tombstone",
    }
    assert table.latest_version() == v


def test_tombstone_delete_appends_instead_of_rewriting(spark, tmp_table):
    """Under merge-on-read the commit is O(matches): every touched bucket
    keeps its base byte-identical and gains ONE delta; untouched buckets'
    entries are carried unchanged."""
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor",
                  compact_deltas=100)  # keep inline folds out of the way
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "PURGE", None, None, None),
        ("I", 2, "c2", 0, "user", "fine", None, None, None),
        ("I", 3, "c3", 0, "user", "fine too", None, None, None),
    ]), batch_id=0)
    before = t.manifest()["buckets"]
    t.delete_where("text = 'PURGE'", mode="tombstone")
    after = t.manifest()["buckets"]
    changed = {b for b in after
               if json_roundtrip(after[b]) != json_roundtrip(before.get(b))}
    assert len(changed) == 1  # only c1's bucket
    (b,) = changed
    assert after[b]["base"] == before[b]["base"]  # base untouched
    assert len(after[b]["deltas"]) == len(before[b]["deltas"]) + 1


def json_roundtrip(x):
    import json

    return json.dumps(x, sort_keys=True)


def test_tombstone_rows_carry_null_payload(spark, tmp_table):
    """The appended tombstones must not re-copy the purged bytes — the
    merge projection nulls a D row's payload."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "PURGE secret", None, None, None),
    ]), batch_id=0)
    res = t.delete_where("text LIKE '%PURGE%'", mode="tombstone")
    delta = t.manifest()["buckets"]
    import os

    new_files = [
        os.path.join(t.path, d["path"])
        for e in delta.values()
        for d in e.get("deltas", [])
    ]
    # the delta chain holds the original insert AND the appended tombstone;
    # the tombstone row itself must be payload-null
    stored = spark.read.parquet(*new_files).collect()
    stones = [r for r in stored if r._deleted]
    assert [(r.conv_id, r.text, r.role, r._seq) for r in stones] \
        == [("c1", None, None, res["tombstone_seq"])]


def test_tombstone_mode_blocks_resurrection_and_feeds_changes(spark, table):
    v0 = table.latest_version()
    res = table.delete_where("text LIKE '%PURGE%'", mode="tombstone")
    ts = res["tombstone_seq"]
    if table.merge_mode == "mor":
        # change feed carries the purge as ordinary D rows (cow without
        # cow_change_feed has no feed at all — changes() refuses, as ever)
        feed = table.changes(v0).collect()
        assert {(r.conv_id, r.turn_idx) for r in feed if r._deleted} == {
            ("c1", 1), ("c2", 0), ("c4", 0),
        }
    # late lower-seq event cannot resurrect
    table.apply_changes(_events(spark, [
        ("U", ts - 1, "c2", 0, "user", "I am back", None, None, None),
    ]), batch_id=2)
    assert ("c2", 0) not in _keys(table)


def _all_stored_texts(spark, t):
    """Every text value physically present in ANY parquet under the table
    (current or old snapshots) — the right-to-be-forgotten audit."""
    import glob

    files = glob.glob(f"{t.path}/data/**/*.parquet", recursive=True)
    import pyarrow.parquet as pq

    out = set()
    for f in files:
        tbl = pq.read_table(f)
        if "text" in tbl.column_names:
            out |= set(tbl["text"].to_pylist())
    return out - {None}


def test_tombstone_then_compact_then_expire_physically_purges(spark, tmp_table):
    """The Delta DV + REORG (PURGE) two-step: the logical delete leaves the
    bytes in older files; compact folds them away; expire drops the files."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "PURGE secret", None, None, None),
        ("I", 2, "c2", 0, "user", "innocent", None, None, None),
    ]), batch_id=0)
    t.delete_where("text LIKE '%PURGE%'", mode="tombstone")
    assert "PURGE secret" in _all_stored_texts(spark, t)  # still on disk
    t.compact()
    t.expire_snapshots(keep_last=1)
    assert _all_stored_texts(spark, t) == {"innocent"}
    assert _keys(t) == {("c2", 0)}


def test_purge_tombstones_gc(spark, tmp_table):
    """compact(purge_tombstones_before_seq=N) drops tombstones below the
    floor (and ONLY those); the guard below the floor is gone by contract."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "old", None, None, None),
        ("I", 2, "c2", 0, "user", "keep", None, None, None),
    ]), batch_id=0)
    t.delete_where("conv_id = 'c1'", mode="tombstone", tombstone_seq=5)
    t.apply_changes(_events(spark, [
        ("D", 50, "c2", 0, None, None, None, None, None),
        ("I", 51, "c3", 0, "user", "live", None, None, None),
    ]), batch_id=1)
    from cdm_to_mods_spark.schemas import DELETED_COL

    t.compact(purge_tombstones_before_seq=10)
    man = t.manifest()
    raw = t._read_raw(man)
    stones = {r.conv_id: r._seq
              for r in raw.filter(F.col(DELETED_COL)).collect()}
    assert stones == {"c2": 50}  # seq-5 tombstone purged, seq-50 kept
    assert _keys(t) == {("c3", 0)}
    # contract: below the floor the resurrection guard is GONE — a
    # lower-seq event for the purged key now lands (operator promised the
    # source can no longer emit under the floor)
    t.apply_changes(_events(spark, [
        ("I", 3, "c1", 0, "user", "returns", None, None, None),
    ]), batch_id=2)
    assert ("c1", 0) in _keys(t)
    # but c2's kept tombstone still guards
    t.apply_changes(_events(spark, [
        ("U", 49, "c2", 0, "user", "denied", None, None, None),
    ]), batch_id=3)
    assert ("c2", 0) not in _keys(t)


def test_purge_whole_table_leaves_readable_empty_buckets(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "a", None, None, None),
    ]), batch_id=0)
    t.delete_where("true", mode="tombstone")
    t.compact(purge_tombstones_before_seq=10_000)
    assert t.read().count() == 0
    assert t.read_keys(["c1"]).count() == 0
    assert t.verify_integrity()["ok"]


def test_maintain_passthrough_purges_tombstones(spark, tmp_table):
    from cdm_to_mods_spark.plans.maintenance import maintain
    from cdm_to_mods_spark.schemas import DELETED_COL

    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "bye", None, None, None),
        ("I", 2, "c2", 0, "user", "stay", None, None, None),
    ]), batch_id=0)
    t.delete_where("conv_id = 'c1'", mode="tombstone", tombstone_seq=3)
    out = maintain(t, purge_tombstones_before_seq=100)
    acts = [a for a in out["actions"] if a["action"] == "compact"]
    assert acts and "tombstone purge" in acts[0]["reason"]
    assert t._read_raw(t.manifest()).filter(F.col(DELETED_COL)).count() == 0


def test_tombstone_delete_emits_changelog_preimages(spark, tmp_table):
    """On a changelog='lookup' table the tombstone delete's typed changelog
    carries the full delete PRE-IMAGES (the lookup producer reads old
    state), even though the stored tombstones are payload-null."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                  changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "secret payload", None, None, None),
        ("I", 2, "c2", 0, "user", "kept", None, None, None),
    ]), batch_id=0)
    v0 = t.latest_version()
    t.delete_where("conv_id = 'c1'", mode="tombstone")
    rc = t.row_changes(v0).collect()
    assert [(r._change_type, r.conv_id, r.text) for r in rc] == [
        ("delete", "c1", "secret payload"),
    ]


def test_tombstone_mode_rejects_bad_mode(spark, table):
    with pytest.raises(ValueError, match="rewrite"):
        table.delete_where("true", mode="dv")


def test_tombstone_mode_refuses_too_low_seq(spark, table):
    """An explicit tombstone_seq at or below a matched live row's _seq would
    lose the merge and silently no-op — refused up front."""
    with pytest.raises(ValueError, match="not above the max"):
        table.delete_where(
            "text LIKE '%PURGE%'", mode="tombstone", tombstone_seq=2
        )
    # nothing landed
    assert ("c2", 0) in _keys(table)
