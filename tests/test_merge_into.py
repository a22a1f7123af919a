"""merge_into: declarative Delta-style MERGE over the CDC apply path —
clause classification (update/delete/insert), s./t. expression scope,
cardinality check, exactly-once batch_id, change-feed visibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import SchemaEvolutionError, TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)
SRC_DDL = "conv_id string, turn_idx int, role string, text string, tool string"


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


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read().collect()
    }


def test_merge_update_insert_delete(spark, table):
    """one merge carrying all three clause kinds, expressions over both
    sides, non-assigned columns kept from the target."""
    src = spark.createDataFrame(
        [
            ("c1", 0, "user", "HELLO", None),        # matched -> update
            ("c1", 1, None, "purge-me", "zap"),      # matched -> delete
            ("c3", 0, "system", "new row", "calc"),  # unmatched -> insert
        ],
        SRC_DDL,
    )
    v0 = table.latest_version()
    res = table.merge_into(
        src,
        when_matched_delete="s.tool = 'zap'",
        when_matched_update={
            "text": "concat(t.text, '+', s.text)",
            "role": F.col("s.role"),
        },
        when_not_matched_insert=True,
    )
    assert res["merge_seq"] == 4 and res["n_events"] == 3
    assert _state(table) == {
        ("c1", 0): ("user", "hello+HELLO", "search"),  # tool kept from target
        ("c2", 0): ("user", "bye", "search"),          # untouched by merge
        ("c3", 0): ("system", "new row", "calc"),
    }
    feed = {(r.conv_id, r.turn_idx): (r.op if hasattr(r, "op") else None,
                                      r._deleted)
            for r in table.changes(v0).collect()}
    assert feed[("c1", 1)][1] is True          # delete rode the feed as D
    assert feed[("c1", 0)][1] is False
    assert feed[("c3", 0)][1] is False


def test_merge_matched_condition_gates_update(spark, table):
    src = spark.createDataFrame(
        [("c1", 0, None, "upd", None), ("c2", 0, None, "upd", None)], SRC_DDL
    )
    table.merge_into(
        src,
        when_matched_update={"text": F.col("s.text")},
        matched_condition="t.turn_idx = 0 AND t.conv_id = 'c1'",
        when_not_matched_insert=False,
    )
    got = _state(table)
    assert got[("c1", 0)][1] == "upd"
    assert got[("c2", 0)][1] == "bye"  # matched but condition false -> no-op


def test_merge_insert_only_with_exprs(spark, table):
    src = spark.createDataFrame([("c9", 5, "user", "x", None)], SRC_DDL)
    table.merge_into(
        src,
        when_not_matched_insert={
            "conv_id": F.col("s.conv_id"),
            "turn_idx": F.col("s.turn_idx"),
            "text": "upper(s.text)",
            "role": F.lit("imported"),
        },
    )
    assert _state(table)[("c9", 5)] == ("imported", "X", None)


def test_merge_duplicate_source_keys_refused(spark, table):
    src = spark.createDataFrame(
        [("c1", 0, None, "a", None), ("c1", 0, None, "b", None)], SRC_DDL
    )
    with pytest.raises(ValueError, match="duplicate source keys"):
        table.merge_into(src, when_matched_update={"text": F.col("s.text")})


def test_merge_key_assignment_and_unknown_column_refused(spark, table):
    src = spark.createDataFrame([("c1", 0, None, "a", None)], SRC_DDL)
    with pytest.raises(ValueError, match="key/bucket"):
        table.merge_into(src, when_matched_update={"conv_id": F.lit("x")})
    with pytest.raises(SchemaEvolutionError):
        table.merge_into(src, when_matched_update={"nope": F.lit("x")})
    with pytest.raises(ValueError, match="key column"):
        table.merge_into(
            spark.createDataFrame([("r",)], "role string"),
            when_matched_update={"text": F.lit("x")},
        )
    with pytest.raises(ValueError, match="WHEN clause"):
        table.merge_into(src, when_not_matched_insert=False)


def test_merge_exactly_once_batch_id(spark, table):
    src = spark.createDataFrame([("c1", 0, None, "once", None)], SRC_DDL)
    r1 = table.merge_into(
        src, when_matched_update={"text": F.col("s.text")}, batch_id=7
    )
    assert not r1.get("skipped")
    r2 = table.merge_into(
        src, when_matched_update={"text": "concat(t.text, '!!')"}, batch_id=7
    )
    assert r2.get("skipped") is True
    assert _state(table)[("c1", 0)][1] == "once"


def test_merge_into_empty_table(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    src = spark.createDataFrame(
        [("a", 0, "user", "first", None), ("b", 1, "user", "second", None)],
        SRC_DDL,
    )
    t.merge_into(src)
    assert _state(t) == {
        ("a", 0): ("user", "first", None),
        ("b", 1): ("user", "second", None),
    }


def test_merge_unconditional_matched_delete(spark, table):
    src = spark.createDataFrame([("c2", 0, None, None, None)], SRC_DDL)
    table.merge_into(src, when_matched_delete=True,
                     when_not_matched_insert=False)
    assert ("c2", 0) not in _state(table)
    # purged key stays deleted against a lower-seq late event (seq guard)
    table.apply_changes(
        spark.createDataFrame(
            [("U", 2, "c2", 0, "user", "resurrect?", None, None, None)],
            EVENT_DDL,
        ),
        batch_id=1,
    )
    assert ("c2", 0) not in _state(table)


def test_merge_schema_evolution_adds_source_columns(spark, table):
    """schema_evolution=True: a source column the table lacks becomes a
    nullable table column — source value on I and U, null on untouched
    rows; clause dicts may reference it; off by default."""
    src = spark.createDataFrame(
        [("c1", 0, "user", "upd", None, "en"),
         ("c4", 0, "user", "new", None, "fr")],
        SRC_DDL + ", lang string",
    )
    # default: clause dict naming the unknown column is refused with a hint
    with pytest.raises(SchemaEvolutionError, match="schema_evolution=True"):
        table.merge_into(src, when_matched_update={"lang": "s.lang"})
    # default: extra source column silently dropped, no evolution
    table.merge_into(src.filter("conv_id = 'c4'"), batch_id=11)
    assert "lang" not in table.read().columns

    res = table.merge_into(
        src,
        when_matched_update={"text": "s.text"},
        schema_evolution=True,
        batch_id=12,
    )
    assert res["n_events"] == 2
    got = {
        (r.conv_id, r.turn_idx): (r.text, r.lang)
        for r in table.read().collect()
    }
    assert got[("c1", 0)] == ("upd", "en")      # U carries the new column
    assert got[("c4", 0)] == ("new", "fr")      # I carries it
    assert got[("c2", 0)] == ("bye", None)      # untouched rows null-fill
    assert got[("c1", 1)][1] is None


def test_merge_schema_evolution_reserved_names_refused(spark, table):
    src = spark.createDataFrame(
        [("c1", 0, 5)], "conv_id string, turn_idx int, seq int"
    )
    with pytest.raises(ValueError, match="collide"):
        table.merge_into(src, schema_evolution=True)


def test_merge_empty_update_dict_is_no_clause(spark, table):
    """{} must behave like None: alone it's a clauseless merge (refused);
    beside a delete clause it must NOT emit no-op U events for every
    matched row (which would burn commits and flood the change feed)."""
    src = spark.createDataFrame([("c1", 0, None, None, "zap")], SRC_DDL)
    with pytest.raises(ValueError, match="WHEN clause"):
        table.merge_into(src, when_matched_update={},
                         when_not_matched_insert=False)
    res = table.merge_into(
        src, when_matched_update={}, when_matched_delete="s.tool = 'zap'",
        when_not_matched_insert=False,
    )
    assert res["op_counts"] == {"D": 1}  # no spurious U rows


def test_merge_skips_committed_batch_before_any_work(spark, table):
    """redelivery short-circuits on the ledger BEFORE the cardinality
    check — even a source that would fail validation is skipped."""
    src = spark.createDataFrame([("c1", 0, None, "once", None)], SRC_DDL)
    table.merge_into(src, when_matched_update={"text": "s.text"}, batch_id=3)
    dup = spark.createDataFrame(
        [("c1", 0, None, "a", None), ("c1", 0, None, "b", None)], SRC_DDL
    )
    res = table.merge_into(
        dup, when_matched_update={"text": "s.text"}, batch_id=3
    )
    assert res.get("skipped") is True  # no duplicate-key error: never ran


def test_merge_matches_live_null_key_rows(spark, tmp_table):
    """without quarantine_path a NULL-keyed row stores live; the matched
    probe must classify it as matched (update), not re-insert it."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        spark.createDataFrame(
            [("I", 1, "c1", None, "user", "nullkey", "keepme", None, None)],
            EVENT_DDL,
        ),
        batch_id=0,
    )
    src = spark.createDataFrame([("c1", None, None, "updated", None)], SRC_DDL)
    res = t.merge_into(src, when_matched_update={"text": "s.text"})
    assert res["op_counts"] == {"U": 1}
    rows = t.read().collect()
    assert len(rows) == 1
    assert (rows[0].text, rows[0].tool) == ("updated", "keepme")


def test_merge_classification_reads_only_source_buckets(spark, tmp_table,
                                                        monkeypatch):
    """scale shape: the live-state read behind the classification join is
    bucket-pruned to the source keys' buckets (Delta MERGE's touched-file
    pruning), never a full-table read."""
    t = LakeTable(spark, tmp_table, num_buckets=16, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        spark.createDataFrame(
            [("I", i + 1, f"c{i}", 0, "user", "x", None, None, None)
             for i in range(40)],
            EVENT_DDL,
        ),
        batch_id=0,
    )
    populated = {int(b) for b in t.manifest()["buckets"]}
    assert len(populated) > 4  # the prune has something to skip
    seen = []
    orig = LakeTable._read_raw

    def spy(self, man, *a, **kw):
        if "buckets" in kw and kw["buckets"] is not None:
            seen.append(sorted(kw["buckets"]))
        return orig(self, man, *a, **kw)

    monkeypatch.setattr(LakeTable, "_read_raw", spy)
    src = spark.createDataFrame([("c1", 0, None, "upd", None)], SRC_DDL)
    t.merge_into(src, when_matched_update={"text": "s.text"})
    pruned = [b for b in seen if len(b) <= 1]
    assert pruned, f"classification read was not bucket-pruned: {seen}"
    assert t.read_keys(["c1"]).first().text == "upd"
