"""overwrite_where: predicate-scoped atomic overwrite (Delta replaceWhere /
the reference's re-export rule — convert_cdm_to_mods.py:142-148: a re-run
replaces the collection's previous outputs) composed as one D+U change
batch through the MERGE path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import SchemaEvolutionError, TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
ROW_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode=request.param,
                  cow_change_feed=(request.param == "cow"))
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        spark.createDataFrame(
            [
                ("I", 1, "c1", 0, "user", "hello", "search", None),
                ("I", 2, "c1", 1, "assistant", "hi", None, None),
                ("I", 3, "c2", 0, "user", "bye", "search", None),
                ("I", 4, "c3", 0, "user", "keep", None, None),
            ],
            EVENT_DDL,
        ),
        batch_id=0,
    )
    return t


def _rows(spark, rows):
    return spark.createDataFrame(rows, ROW_DDL)


def test_overwrite_replaces_matched_region(spark, table):
    """Keys in the region but not in df vanish; shared keys update; new
    keys insert; rows outside the predicate are untouched."""
    v0 = table.latest_version()
    df = _rows(spark, [
        ("c1", 0, "user", "hello-v2", "search", None),   # shared key
        ("c1", 5, "assistant", "fresh", None, None),      # new key
    ])
    res = table.overwrite_where(df, "conv_id = 'c1'")
    assert res["replaced_rows"] == 2 and res["inserted_rows"] == 2
    assert res["overwrite_seq"] == 5
    got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert got == {
        ("c1", 0): "hello-v2",
        ("c1", 5): "fresh",
        ("c2", 0): "bye",
        ("c3", 0): "keep",
    }
    # the change feed reports the collapse correctly: shared key = one U
    # (the in-batch U>D tie-break), dropped key = D, new key = U
    feed = table.changes(v0).collect()
    by_key = {(r.conv_id, r.turn_idx): r._deleted for r in feed}
    assert by_key == {
        ("c1", 0): False,
        ("c1", 1): True,
        ("c1", 5): False,
    }
    assert all(r._seq == 5 for r in feed)


def test_overwrite_is_idempotent_replay(spark, table):
    """Re-running the same overwrite at the same seq converges (pure
    max-seq resolution) — the reference's deterministic re-export."""
    df = _rows(spark, [("c2", 0, "user", "bye-v2", "search", None)])
    r1 = table.overwrite_where(df, "conv_id = 'c2'")
    r2 = table.overwrite_where(df, "conv_id = 'c2'",
                               overwrite_seq=r1["overwrite_seq"] + 1)
    assert r2["replaced_rows"] == 1
    got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert got[("c2", 0)] == "bye-v2" and len(got) == 4


def test_overwrite_empty_df_acts_as_delete(spark, table):
    res = table.overwrite_where(
        _rows(spark, []), "conv_id = 'c1'"
    )
    assert res["replaced_rows"] == 2 and res["inserted_rows"] == 0
    assert {r.conv_id for r in table.read().collect()} == {"c2", "c3"}


def test_overwrite_noop_when_nothing_matches(spark, table):
    v0 = table.latest_version()
    res = table.overwrite_where(_rows(spark, []), "conv_id = 'zzz'")
    assert res.get("skipped") and res["version"] == v0
    assert table.latest_version() == v0


def test_overwrite_refuses_rows_outside_predicate(spark, table):
    df = _rows(spark, [
        ("c1", 0, "user", "in", None, None),
        ("c2", 0, "user", "OUT", None, None),
    ])
    with pytest.raises(ValueError, match="do not satisfy the predicate"):
        table.overwrite_where(df, "conv_id = 'c1'")
    # refused before anything landed
    assert {r.text for r in table.read().collect()} == {
        "hello", "hi", "bye", "keep"}


def test_overwrite_refuses_duplicate_keys(spark, table):
    df = _rows(spark, [
        ("c1", 0, "user", "a", None, None),
        ("c1", 0, "user", "b", None, None),
    ])
    with pytest.raises(ValueError, match="not unique"):
        table.overwrite_where(df, "conv_id = 'c1'")


def test_overwrite_refuses_schema_drift(spark, table):
    with pytest.raises(SchemaEvolutionError, match="missing table columns"):
        table.overwrite_where(
            spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int"),
            "conv_id = 'c1'",
        )
    with pytest.raises(SchemaEvolutionError, match="unknown columns"):
        table.overwrite_where(
            _rows(spark, []).withColumn("nope", F.lit(1)), "conv_id = 'c1'")


def test_overwrite_refuses_low_seq(spark, table):
    with pytest.raises(ValueError, match="not above the max"):
        table.overwrite_where(
            _rows(spark, [("c1", 0, "user", "x", None, None)]),
            "conv_id = 'c1'", overwrite_seq=1)


def test_overwrite_refuses_non_lww_engines(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4,
                  merge_engine="partial_update")
    t.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="partial_update"):
        t.overwrite_where(
            t.spark.createDataFrame([], ROW_DDL), "conv_id = 'c1'")


def test_overwrite_mor_appends_without_rewrite(spark, tmp_table):
    """Under merge-on-read the overwrite must not fold or rewrite the
    untouched buckets' bases — O(matches + inserts) delta append."""
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        spark.createDataFrame(
            [("I", i, f"c{i}", 0, "user", f"t{i}", None, None)
             for i in range(1, 9)],
            EVENT_DDL,
        ),
        batch_id=0,
    )
    def _base_path(e):
        if "base" in e:
            return (e["base"] or {}).get("path")
        return e["path"]

    man0 = t.manifest()
    bases0 = {b: _base_path(e) for b, e in man0["buckets"].items()}
    t.overwrite_where(
        spark.createDataFrame(
            [("c1", 0, "user", "t1-v2", None, None)], ROW_DDL),
        "conv_id = 'c1'",
    )
    man1 = t.manifest()
    for b, e in man1["buckets"].items():
        assert _base_path(e) == bases0[b], \
            "mor overwrite must not rewrite bases"
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got["c1"] == "t1-v2" and len(got) == 8
