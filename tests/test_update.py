"""update_where: predicate UPDATE as ordinary change events through the
MERGE path — O(matches) delta append under mor, change-feed U-rows,
old-row RHS semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import SchemaEvolutionError, TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


@pytest.fixture(params=["cow", "mor"])
def table(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode=request.param,
                  cow_change_feed=(request.param == "cow"))
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        spark.createDataFrame(
            [
                ("I", 1, "c1", 0, "user", "hello", "search", None, None),
                ("I", 2, "c1", 1, "assistant", "hi", None, None, None),
                ("I", 3, "c2", 0, "user", "bye", "search", None, None),
            ],
            EVENT_DDL,
        ),
        batch_id=0,
    )
    return t


def test_update_where_applies_assignments(spark, table):
    v0 = table.latest_version()
    res = table.update_where(
        "tool = 'search'",
        {"role": F.lit("searcher"), "text": "concat(text, '!')"},
    )
    assert res["n_events"] == 2 and res["update_seq"] == 4
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in table.read().collect()
    }
    # RHS saw the OLD row; unmatched row untouched; tool itself unchanged
    assert got == {
        ("c1", 0): ("searcher", "hello!", "search"),
        ("c1", 1): ("assistant", "hi", None),
        ("c2", 0): ("searcher", "bye!", "search"),
    }
    # the update rides the change feed as ordinary U rows
    feed = table.changes(v0).collect()
    assert {(r.conv_id, r.turn_idx) for r in feed} == {("c1", 0), ("c2", 0)}
    assert all(r._seq == 4 and not r._deleted for r in feed)


def test_update_where_mor_appends_no_rewrite(spark, table):
    if table.merge_mode != "mor":
        pytest.skip("mor-only shape assertion")
    def _shape(man):
        return {
            b: (e.get("base"), len(e.get("deltas", [])))
            for b, e in man["buckets"].items()
        }

    before = _shape(table.manifest())
    table.update_where("conv_id = 'c2'", {"text": F.lit("updated")})
    after = _shape(table.manifest())
    # no base was rewritten; exactly ONE bucket gained exactly ONE delta
    assert {b: s[0] for b, s in after.items()} == {
        b: s[0] for b, s in before.items()
    }
    grew = {b for b in after if after[b][1] != before.get(b, (None, 0))[1]}
    assert len(grew) == 1
    (b,) = grew
    assert after[b][1] == before.get(b, (None, 0))[1] + 1


def test_update_where_guards(spark, table):
    with pytest.raises(ValueError):
        table.update_where("1=1", {"conv_id": F.lit("x")})
    with pytest.raises(SchemaEvolutionError):
        table.update_where("1=1", {"nope": F.lit("x")})


def test_update_where_seq_guard_interplay(spark, table):
    res = table.update_where("conv_id = 'c1'", {"text": F.lit("bulk")})
    s = res["update_seq"]
    # a late source event BELOW the update seq loses to the update
    table.apply_changes(
        spark.createDataFrame(
            [("U", s - 1, "c1", 0, "user", "stale", None, None, None)],
            EVENT_DDL,
        ),
        batch_id=1,
    )
    got = {r.turn_idx: r.text for r in table.read_keys(["c1"]).collect()}
    assert got == {0: "bulk", 1: "bulk"}
