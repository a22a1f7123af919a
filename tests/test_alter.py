"""Metadata-only ALTER TABLE: add/drop/rename columns with no data
rewrite — old file sets resolve per schema_id (null-fill / projection /
rename-log mapping), history-aliasing names are refused, and the rename
log survives every commit path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA, SchemaEvolutionError

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(spark, rows, ddl=EVENT_DDL):
    return spark.createDataFrame(rows, ddl)


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode=request.param)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _ev(spark, [
            ("I", 1, "c1", 0, "user", "hello", "search", None, None),
            ("I", 2, "c2", 0, "user", "bye", None, None, None),
        ]),
        batch_id=0,
    )
    return t


def test_add_column_null_fills_and_accepts_new_data(spark, table):
    res = table.add_column("lang", "string")
    assert res["maintenance"] == "add_column"
    assert {r.lang for r in table.read().collect()} == {None}
    # a later batch supplies the column; old rows stay null
    table.apply_changes(
        _ev(
            spark,
            [("I", 3, "c3", 0, "user", "hola", None, None, None, "es")],
            EVENT_DDL + ", lang string",
        ),
        batch_id=1,
    )
    got = {r.conv_id: r.lang for r in table.read().collect()}
    assert got == {"c1": None, "c2": None, "c3": "es"}
    # time travel: pre-alter snapshot has no such column
    assert "lang" not in table.read(version=1).columns


def test_drop_column_projects_away_without_rewrite(spark, table):
    man_before = table.manifest()
    table.drop_column("tool")
    assert "tool" not in table.read().columns
    # metadata-only: no bucket entry changed
    assert table.manifest()["buckets"] == man_before["buckets"]
    # time travel still shows it
    assert {r.tool for r in table.read(version=1).collect()} == {"search", None}
    # and a later merge folds it out physically without issues
    table.apply_changes(
        _ev(spark, [("U", 4, "c1", 0, "user", "hello2", None, None, None)]),
        batch_id=1,
    )
    rows = {r.conv_id: r.text for r in table.read().collect()}
    assert rows == {"c1": "hello2", "c2": "bye"}


def test_rename_column_resolves_all_eras(spark, table):
    man_before = table.manifest()
    res = table.rename_column("text", "content")
    assert res["maintenance"] == "rename_column"
    assert table.manifest()["buckets"] == man_before["buckets"]  # no rewrite
    # pre-rename bytes read under the new name
    got = {r.conv_id: r.content for r in table.read().collect()}
    assert got == {"c1": "hello", "c2": "bye"}
    # new batches use the new name and merge against old-era rows
    table.apply_changes(
        _ev(
            spark,
            [("U", 5, "c1", 0, "user", "renamed-era", None, None, None)],
            EVENT_DDL.replace("text string", "content string"),
        ),
        batch_id=1,
    )
    got = {r.conv_id: r.content for r in table.read().collect()}
    assert got == {"c1": "renamed-era", "c2": "bye"}
    # change feed spanning the rename maps old file sets too
    feed = {
        (r.conv_id, r.content) for r in table.changes(0).collect()
        if not r._deleted
    } if table.merge_mode == "mor" else None
    if feed is not None:
        assert ("c1", "hello") in feed and ("c1", "renamed-era") in feed
    # time travel to the pre-rename version shows the OLD name
    v1 = table.read(version=1)
    assert "text" in v1.columns and "content" not in v1.columns


def test_rename_chain_two_hops(spark, table):
    table.rename_column("text", "content")
    table.apply_changes(
        _ev(
            spark,
            [("I", 6, "c3", 0, "user", "mid-era", None, None, None)],
            EVENT_DDL.replace("text string", "content string"),
        ),
        batch_id=1,
    )
    table.rename_column("content", "body")
    got = {r.conv_id: r.body for r in table.read().collect()}
    # era 1 ('text'), era 2 ('content') and the head name all resolve
    assert got == {"c1": "hello", "c2": "bye", "c3": "mid-era"}


def test_alter_guards(spark, table):
    with pytest.raises(SchemaEvolutionError):
        table.drop_column("conv_id")  # key col
    with pytest.raises(SchemaEvolutionError):
        table.rename_column("conv_id", "cid")  # key col
    with pytest.raises(SchemaEvolutionError):
        table.add_column("_seq", "long")  # reserved
    table.drop_column("ts_raw")
    with pytest.raises(SchemaEvolutionError):
        table.add_column("ts_raw", "string")  # historical name aliases old files
    table.rename_column("text", "content")
    with pytest.raises(SchemaEvolutionError):
        table.add_column("text", "string")  # renamed-away name
    # implicit evolution refuses historical names too: a batch still using
    # the OLD 'text'/'ts_raw' columns would re-introduce them as new fields
    # aliasing the old file sets' bytes
    with pytest.raises(SchemaEvolutionError):
        table.apply_changes(
            _ev(spark, [("I", 9, "c9", 0, "user", "x", None, None, None)]),
            batch_id=7,
        )


def test_renames_survive_apply_compact_rollback(spark, table):
    table.rename_column("text", "content")
    v_renamed = table.latest_version()
    table.apply_changes(
        _ev(
            spark,
            [("U", 7, "c2", 0, "user", "updated", None, None, None)],
            EVENT_DDL.replace("text string", "content string"),
        ),
        batch_id=1,
    )
    assert table.manifest().get("renames"), "apply dropped the rename log"
    table.compact()
    assert table.manifest().get("renames"), "compact dropped the rename log"
    # compaction folds OLD-era ('text') file sets: values must survive the
    # rename-log mapping, not null-fill
    got = {r.conv_id: r.content for r in table.read().collect()}
    assert got == {"c1": "hello", "c2": "updated"}
    table.rollback(v_renamed)
    assert table.manifest().get("renames"), "rollback dropped the rename log"
    got = {r.conv_id: r.content for r in table.read().collect()}
    assert got == {"c1": "hello", "c2": "bye"}  # pre-update state, new name
    # reopening from disk keeps resolving
    fresh = LakeTable(spark, table.path)
    got = {r.conv_id: r.content for r in fresh.read().collect()}
    assert got == {"c1": "hello", "c2": "bye"}


# ---------------------------------------------------------- widen_column
def test_widen_column_metadata_only(spark, table):
    """explicit type widening: old narrow bytes cast on read, later
    batches may carry the wide type, history() records the DDL."""
    res = table.widen_column("turn_idx", "long")
    assert res["maintenance"] == "widen_column" and res["dtype"] == "bigint"
    assert dict(table.read().dtypes)["turn_idx"] == "bigint"
    assert {r.turn_idx for r in table.read().collect()} == {0}
    # a wide-typed batch now lands without implicit evolution
    table.apply_changes(
        _ev(
            spark,
            [("I", 9, "c3", 2_147_483_648, "user", "big", None, None, None)],
            EVENT_DDL.replace("turn_idx int", "turn_idx long"),
        ),
        batch_id=1,
    )
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert ("c3", 2147483648) in got and ("c1", 0) in got
    # reopen keeps the widened schema; time travel shows the old type
    fresh = LakeTable(spark, table.path)
    assert dict(fresh.read().dtypes)["turn_idx"] == "bigint"
    assert dict(fresh.read(version=1).dtypes)["turn_idx"] == "int"


def test_widen_column_refusals(spark, table):
    with pytest.raises(SchemaEvolutionError, match="not a widening"):
        table.widen_column("turn_idx", "short")       # narrowing
    with pytest.raises(SchemaEvolutionError, match="incompatible"):
        table.widen_column("text", "int")             # cross-family
    with pytest.raises(SchemaEvolutionError, match="already"):
        table.widen_column("text", "string")          # no-op
    with pytest.raises(SchemaEvolutionError, match="bucket column"):
        table.widen_column("conv_id", "string")       # bucket col pinned
    with pytest.raises(SchemaEvolutionError, match="no column"):
        table.widen_column("nope", "long")
    # a constraint referencing the column must keep resolving
    table.add_constraint("turn_nonneg", "turn_idx >= 0")
    table.widen_column("turn_idx", "long")            # still analyzes: ok
