"""CHECK constraints: table invariants enforced inside the merge itself
(Delta invariant semantics — a violating batch fails BEFORE its commit
publishes; zero extra passes, the guard rides the _seq projection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


@pytest.fixture(params=["mor", "cow"])
def table(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode=request.param)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [("I", 1, "c1", 0, "user", "ok", None)]), batch_id=0
    )
    return t


def test_violating_batch_fails_and_nothing_lands(spark, table):
    table.add_constraint("turn_nonneg", "turn_idx >= 0")
    v = table.latest_version()
    bad = _events(spark, [
        ("I", 2, "c2", 0, "user", "fine", None),
        ("I", 3, "c2", -1, "user", "bad row", None),
    ])
    with pytest.raises(Exception, match="CHECK constraint violated"):
        table.apply_changes(bad, batch_id=1)
    # no commit published; ledger and data are untouched
    assert table.latest_version() == v
    assert {r.conv_id for r in table.read().collect()} == {"c1"}
    # fixed batch re-applies under the SAME batch_id (exactly-once intact)
    table.apply_changes(
        _events(spark, [("I", 2, "c2", 0, "user", "fine", None)]), batch_id=1
    )
    assert {r.conv_id for r in table.read().collect()} == {"c1", "c2"}


def test_error_names_constraint_and_key(spark, table):
    table.add_constraint("role_known", "role in ('user','assistant','system')")
    with pytest.raises(Exception, match=r"role_known.*key=\(c9,4\)"):
        table.apply_changes(
            _events(spark, [("I", 2, "c9", 4, "alien", "x", None)]),
            batch_id=1,
        )


def test_null_predicate_passes_and_deletes_exempt(spark, table):
    """SQL CHECK: NULL result is not a violation; D rows carry a nulled
    payload and must never trip a constraint."""
    table.add_constraint("text_len", "length(text) < 100")
    table.apply_changes(
        _events(spark, [
            ("I", 2, "c3", 0, "user", None, None),   # NULL text -> passes
            ("D", 3, "c1", 0, None, None, None),      # delete -> exempt
        ]),
        batch_id=1,
    )
    assert {r.conv_id for r in table.read().collect()} == {"c3"}


def test_add_constraint_validates_existing_rows(spark, table):
    with pytest.raises(ValueError, match="1 existing rows violate"):
        table.add_constraint("impossible", "text != 'ok'")
    assert table.constraints() == []
    table.add_constraint("impossible", "text != 'ok'", validate=False)
    assert [c["name"] for c in table.constraints()] == ["impossible"]


def test_add_constraint_rejects_bad_expr_and_dup_name(spark, table):
    with pytest.raises(Exception):
        table.add_constraint("typo", "no_such_column > 0")
    table.add_constraint("a", "turn_idx >= 0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("a", "turn_idx >= 0")


def test_drop_constraint_reopens_the_gate(spark, table):
    table.add_constraint("turn_cap", "turn_idx < 10")
    with pytest.raises(Exception, match="turn_cap"):
        table.apply_changes(
            _events(spark, [("I", 2, "c4", 99, "user", "x", None)]),
            batch_id=1,
        )
    table.drop_constraint("turn_cap")
    table.apply_changes(
        _events(spark, [("I", 2, "c4", 99, "user", "x", None)]), batch_id=1
    )
    assert table.read().filter("turn_idx = 99").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        table.drop_constraint("turn_cap")


def test_constraints_survive_reopen_and_history_records_ddl(spark, table):
    table.add_constraint("turn_nonneg", "turn_idx >= 0")
    fresh = LakeTable(spark, table.path)
    assert [c["name"] for c in fresh.constraints()] == ["turn_nonneg"]
    with pytest.raises(Exception, match="turn_nonneg"):
        fresh.apply_changes(
            _events(spark, [("I", 5, "c5", -2, "user", "x", None)]),
            batch_id=9,
        )
    ops = [h["operation"] for h in table.history()]
    assert "add_constraint" in ops


def test_update_where_is_gated_too(spark, table):
    table.add_constraint("no_shout", "text != upper(text) or text = ''")
    with pytest.raises(Exception, match="no_shout"):
        table.update_where("conv_id = 'c1'", {"text": "upper(text)"})
    assert table.read().filter("text = 'OK'").count() == 0


def test_ddl_refuses_to_break_a_constraint(spark, tmp_table):
    """drop/rename of a column a CHECK references is refused up front —
    not discovered by the next replay's write job."""
    from cdm_to_mods_spark.schemas import SchemaEvolutionError

    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.add_constraint("text_cap", "length(text) < 1000")
    with pytest.raises(SchemaEvolutionError, match="text_cap"):
        t.drop_column("text")
    with pytest.raises(SchemaEvolutionError, match="text_cap"):
        t.rename_column("text", "body")
    # unrelated DDL still works; after dropping the constraint so does the rename
    t.rename_column("tool", "tool2")
    t.drop_constraint("text_cap")
    t.rename_column("text", "body")
    assert "body" in t.schema().fieldNames()
