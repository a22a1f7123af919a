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
