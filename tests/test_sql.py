"""SQL statement front-end (cdm_to_mods_spark/sql.py): the Delta/Iceberg
SQL-extension analog routed onto the engine's table APIs. Every DML
statement must produce the same state as the equivalent direct API call,
and SELECT delegation (incl. time travel) must read through live views.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sql import LakeCatalog, LakeSqlError, _split_top

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


@pytest.fixture()
def cat(spark):
    return LakeCatalog(spark)


@pytest.fixture()
def seeded(spark, cat, tmp_path):
    """A registered table `tr` with three live rows."""
    t = LakeTable(spark, str(tmp_path / "tr"), num_buckets=4,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        _events(spark, [
            ("I", 1, "c1", 0, "user", "hello", None),
            ("I", 2, "c1", 1, "assistant", "hi there", None),
            ("I", 3, "c2", 0, "user", "ping", "search"),
        ]),
        batch_id=0,
    )
    cat.register("tr", t)
    return t


# ------------------------------------------------------------- registry
def test_register_by_path_and_show_tables(spark, cat, tmp_path, seeded):
    cat.register("tr2", seeded.path)  # path form opens a handle
    names = [r.tableName for r in cat.sql("SHOW TABLES").collect()]
    assert names == ["tr", "tr2"]
    assert cat.sql("SELECT count(*) AS n FROM tr2").first().n == 3


def test_unknown_table_and_statement_fail_typed(cat):
    with pytest.raises(LakeSqlError, match="not registered"):
        cat.sql("DELETE FROM nope WHERE true")
    with pytest.raises(LakeSqlError, match="unsupported statement"):
        cat.sql("GRANT ALL ON x TO y")


# --------------------------------------------------------------- SELECT
def test_select_reads_current_head_not_a_stale_view(spark, cat, seeded):
    assert cat.sql("SELECT count(*) AS n FROM tr").first().n == 3
    seeded.apply_changes(
        _events(spark, [("I", 4, "c3", 0, "user", "new", None)]),
        batch_id=1,
    )
    # re-running the same statement must see the new commit
    assert cat.sql("SELECT count(*) AS n FROM tr").first().n == 4


def test_select_time_travel_version_and_timestamp(spark, cat, seeded):
    v1 = seeded.latest_version()
    ts1 = seeded.manifest()["commit_ts"]
    seeded.delete_where("conv_id = 'c2'")
    assert cat.sql("SELECT count(*) AS n FROM tr").first().n == 2
    assert (
        cat.sql(f"SELECT count(*) AS n FROM tr VERSION AS OF {v1}").first().n
        == 3
    )
    got = cat.sql(
        f"SELECT count(*) AS n FROM tr TIMESTAMP AS OF '{ts1}'"
    ).first().n
    assert got == 3


def test_select_join_across_two_lake_tables(spark, cat, tmp_path, seeded):
    dim = LakeTable(spark, str(tmp_path / "dim"), key_cols=("conv_id",),
                    num_buckets=2)
    dim.create(T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
    ]))
    dim.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", "alpha"), ("I", 2, "c2", "beta")],
        "op string, seq long, conv_id string, label string",
    ))
    cat.register("dim", dim)
    rows = cat.sql(
        "SELECT tr.conv_id, dim.label FROM tr JOIN dim USING (conv_id) "
        "WHERE tr.turn_idx = 0 ORDER BY tr.conv_id"
    ).collect()
    assert [(r.conv_id, r.label) for r in rows] == [
        ("c1", "alpha"), ("c2", "beta")
    ]


# ------------------------------------------------------------------ DDL
def test_create_table_options_and_tblproperties(spark, cat, tmp_path):
    loc = str(tmp_path / "made")
    out = cat.sql(
        f"""CREATE TABLE made (conv_id string, turn_idx int, text string)
        USING lake LOCATION '{loc}'
        OPTIONS (key_cols 'conv_id,turn_idx', num_buckets '2',
                 merge_mode 'mor')
        TBLPROPERTIES (owner 'ingest-team')"""
    ).first()
    assert out.created is True
    t = cat.table("made")
    assert t.num_buckets == 2 and t.merge_mode == "mor"
    assert t.properties()["owner"] == "ingest-team"
    assert t.schema().fieldNames() == ["conv_id", "turn_idx", "text"]
    # IF NOT EXISTS on a registered name is a no-op, bare CREATE refuses
    assert cat.sql(
        f"CREATE TABLE IF NOT EXISTS made (a string) USING lake "
        f"LOCATION '{loc}'"
    ).first().created is False
    with pytest.raises(LakeSqlError, match="already registered"):
        cat.sql(
            f"CREATE TABLE made (a string) USING lake LOCATION '{loc}'"
        )


def test_create_partitioned_table_via_options(spark, cat, tmp_path):
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    loc = str(tmp_path / "parted")
    cat.sql(
        f"""CREATE TABLE parted (conv_id string, turn_idx int,
        text string, ts timestamp) USING lake LOCATION '{loc}'
        OPTIONS (key_cols 'conv_id,turn_idx', partition_col 'ts',
                 granularity 'month', num_buckets '2')"""
    )
    t = cat.table("parted")
    assert isinstance(t, PartitionedTable)
    assert t.partition_col == "ts" and t.granularity == "month"
    cat.sql(
        "INSERT INTO parted VALUES "
        "('c1', 0, 'jan row', timestamp'2024-01-05 10:00:00'), "
        "('c2', 0, 'mar row', timestamp'2024-03-09 11:00:00')"
    )
    assert sorted(t.partitions()) == ["2024-01", "2024-03"]
    assert cat.sql("SELECT count(*) AS n FROM parted").first().n == 2


def test_drop_table_unbinds_but_keeps_data(spark, cat, seeded):
    path = seeded.path
    assert cat.sql("DROP TABLE tr").first().dropped is True
    # an unregistered name in a SELECT falls through to Spark's own
    # resolution error (the router cannot know which identifiers were
    # meant as lake tables); DML on it gets the typed catalog error
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        cat.sql("SELECT * FROM tr WHERE conv_id = 'c1'")
    with pytest.raises(LakeSqlError, match="not registered"):
        cat.sql("DELETE FROM tr WHERE true")
    # data untouched: a fresh handle still reads it
    assert LakeTable(cat.spark, path).read().count() == 3
    assert cat.sql("DROP TABLE IF EXISTS tr").first().dropped is False


def test_alter_table_column_ddl_roundtrip(spark, cat, seeded):
    cat.sql("ALTER TABLE tr ADD COLUMN lang string")
    assert "lang" in seeded.schema().fieldNames()
    cat.sql("ALTER TABLE tr RENAME COLUMN lang TO language")
    assert "language" in seeded.schema().fieldNames()
    cat.sql("ALTER TABLE tr DROP COLUMN language")
    assert "language" not in seeded.schema().fieldNames()
    cat.sql("ALTER TABLE tr SET TBLPROPERTIES (tier 'gold', pii 'false')")
    assert seeded.properties() == {"tier": "gold", "pii": "false"}
    cat.sql("ALTER TABLE tr UNSET TBLPROPERTIES (pii)")
    assert seeded.properties() == {"tier": "gold"}


def test_alter_constraint_and_widen(spark, cat, seeded):
    cat.sql("ALTER TABLE tr ADD CONSTRAINT role_known "
            "CHECK (role IN ('user','assistant','tool'))")
    assert [c["name"] for c in seeded.constraints()] == ["role_known"]
    with pytest.raises(Exception, match="CHECK constraint violated"):
        cat.sql("INSERT INTO tr (conv_id, turn_idx, role) "
                "VALUES ('c9', 0, 'robot')")
    cat.sql("ALTER TABLE tr DROP CONSTRAINT role_known")
    assert seeded.constraints() == []
    cat.sql("ALTER TABLE tr ALTER COLUMN turn_idx TYPE bigint")
    assert seeded.schema()["turn_idx"].dataType == T.LongType()


# ------------------------------------------------------------------ DML
def test_insert_values_and_keyed_upsert(spark, cat, seeded):
    out = cat.sql(
        "INSERT INTO tr VALUES "
        "('c3', 0, 'user', 'fresh', NULL, NULL), "
        "('c1', 0, 'user', 'rewritten', NULL, NULL)"
    ).first()
    assert out.n_events == 2
    rows = {
        (r.conv_id, r.turn_idx): r.text for r in seeded.read().collect()
    }
    assert rows[("c3", 0)] == "fresh"
    # keyed insert upserts the existing key instead of duplicating it
    assert rows[("c1", 0)] == "rewritten"
    assert len(rows) == 4


def test_insert_column_list_and_select_source(spark, cat, seeded):
    cat.sql("INSERT INTO tr (conv_id, turn_idx, text) "
            "SELECT conv_id, turn_idx + 100, upper(text) FROM tr "
            "WHERE conv_id = 'c2'")
    r = seeded.read().filter("turn_idx = 100").first()
    assert (r.conv_id, r.text, r.role) == ("c2", "PING", None)
    with pytest.raises(LakeSqlError, match="key column"):
        cat.sql("INSERT INTO tr (text) VALUES ('no key')")
    with pytest.raises(LakeSqlError, match="not in table schema"):
        cat.sql("INSERT INTO tr (conv_id, turn_idx, nope) "
                "VALUES ('x', 0, 'y')")


def test_update_delete_truncate(spark, cat, seeded):
    cat.sql("UPDATE tr SET text = concat(text, '!'), tool = 'edited' "
            "WHERE role = 'user'")
    texts = {r.conv_id: (r.text, r.tool)
             for r in seeded.read().filter("role = 'user'").collect()}
    assert texts == {"c1": ("hello!", "edited"), "c2": ("ping!", "edited")}
    out = cat.sql("DELETE FROM tr WHERE conv_id = 'c2'").first()
    assert out.deleted_rows == 1
    assert seeded.read().count() == 2
    cat.sql("TRUNCATE TABLE tr")
    assert seeded.read().count() == 0


def test_dml_rides_the_change_feed(spark, cat, seeded):
    v0 = seeded.latest_version()
    cat.sql("UPDATE tr SET tool = 'patched' WHERE conv_id = 'c1'")
    feed = seeded.changes(v0).collect()
    assert sorted((r.conv_id, r.turn_idx, r.tool, r._deleted)
                  for r in feed) == [
        ("c1", 0, "patched", False), ("c1", 1, "patched", False)
    ]


# ---------------------------------------------------------------- MERGE
def test_merge_into_full_three_clause(spark, cat, seeded):
    src = spark.createDataFrame(
        [("c1", 0, "patched"), ("c2", 0, "DROP"), ("c9", 0, "brand new")],
        "conv_id string, turn_idx int, text string",
    )
    src.createOrReplaceTempView("updates")
    out = cat.sql(
        """MERGE INTO tr AS t USING updates AS s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.text = 'DROP' THEN DELETE
        WHEN MATCHED THEN UPDATE SET text = s.text
        WHEN NOT MATCHED THEN INSERT *"""
    ).first()
    assert out.n_events == 3
    rows = {(r.conv_id, r.turn_idx): r.text
            for r in seeded.read().collect()}
    assert rows[("c1", 0)] == "patched"
    assert ("c2", 0) not in rows
    assert rows[("c9", 0)] == "brand new"
    assert rows[("c1", 1)] == "hi there"  # untouched


def test_merge_using_subquery_and_insert_columns(spark, cat, seeded):
    cat.sql(
        """MERGE INTO tr t
        USING (SELECT 'c7' AS conv_id, 0 AS turn_idx, 'seven' AS body) s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, text, role)
        VALUES (s.conv_id, s.turn_idx, upper(s.body), 'user')"""
    )
    r = seeded.read().filter("conv_id = 'c7'").first()
    assert (r.text, r.role) == ("SEVEN", "user")


def test_merge_refuses_non_key_on_clause(spark, cat, seeded):
    seeded.read().limit(1).createOrReplaceTempView("one_row")
    with pytest.raises(LakeSqlError, match="key"):
        cat.sql(
            """MERGE INTO tr t USING one_row s ON t.conv_id = s.conv_id
            WHEN MATCHED THEN DELETE"""
        )
    with pytest.raises(LakeSqlError, match="column equality"):
        cat.sql(
            """MERGE INTO tr t USING one_row s
            ON t.conv_id = s.conv_id AND t.turn_idx > s.turn_idx
            WHEN MATCHED THEN DELETE"""
        )


# ---------------------------------------------- maintenance / utilities
def test_describe_optimize_vacuum_restore(spark, cat, seeded):
    hist = cat.sql("DESCRIBE HISTORY tr").collect()
    assert [r.operation for r in hist] == ["MERGE", "CREATE"]
    assert cat.sql("DESCRIBE HISTORY tr LIMIT 1").count() == 1
    detail = cat.sql("DESCRIBE DETAIL tr").first()
    assert detail.num_buckets == 4
    v_before = seeded.latest_version()
    cat.sql("DELETE FROM tr WHERE conv_id = 'c1'")
    cat.sql(f"RESTORE TABLE tr TO VERSION AS OF {v_before}")
    assert seeded.read().count() == 3
    cat.sql("OPTIMIZE tr")
    out = cat.sql("VACUUM tr RETAIN 1 SNAPSHOTS").first()
    assert out.expired_manifests >= 0
    assert seeded.read().count() == 3


# ------------------------------------------------------------- plumbing
def test_split_top_respects_nesting_and_strings():
    assert _split_top("a = f(x, y), b = 'p,q', c = (1, 2)") == [
        "a = f(x, y)", "b = 'p,q'", "c = (1, 2)"
    ]
    assert _split_top("concat(a, ','), b") == ["concat(a, ',')", "b"]


# --------------------------------------------------- SQL transactions
@pytest.fixture()
def grouped_cat(spark, tmp_path, seeded):
    from cdm_to_mods_spark.plans.txn import TableGroup
    from cdm_to_mods_spark.sql import LakeCatalog

    audit = LakeTable(spark, str(tmp_path / "audit"),
                      key_cols=("conv_id",), num_buckets=2,
                      merge_mode="mor")
    audit.create(T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
    ]))
    g = TableGroup(spark, str(tmp_path / "grp"))
    g.create({"tr": seeded, "audit": audit})
    return LakeCatalog(spark, group=g), g


def test_sql_txn_commit_is_atomic(spark, grouped_cat):
    cat, g = grouped_cat
    assert cat.sql("SHOW TABLES").count() == 2
    cat.sql("BEGIN")
    cat.sql("INSERT INTO tr (conv_id, turn_idx, text) "
            "VALUES ('txn1', 0, 'staged row')")
    cat.sql("INSERT INTO audit (conv_id, status) VALUES ('txn1', 'ok')")
    # read-your-writes inside the transaction...
    assert cat.sql(
        "SELECT count(*) AS n FROM tr WHERE conv_id = 'txn1'"
    ).first().n == 1
    # ...but the group (and raw main) see nothing yet
    assert g.read("tr").filter("conv_id = 'txn1'").count() == 0
    assert g.table("tr").read().filter("conv_id = 'txn1'").count() == 0
    out = cat.sql("COMMIT").first()
    assert out.state == "committed"
    assert g.read("tr").filter("conv_id = 'txn1'").count() == 1
    assert g.read("audit").count() == 1


def test_sql_txn_rollback_discards(spark, grouped_cat):
    cat, g = grouped_cat
    cat.sql("BEGIN TRANSACTION")
    cat.sql("UPDATE tr SET text = 'gone' WHERE conv_id = 'c1'")
    cat.sql("ROLLBACK")
    assert g.table("tr").read().filter("text = 'gone'").count() == 0
    assert g.table("tr").branches() == []
    # catalog usable again after rollback
    assert cat.sql("SELECT count(*) AS n FROM tr").first().n == 3


def test_sql_txn_guards(spark, grouped_cat):
    cat, g = grouped_cat
    with pytest.raises(LakeSqlError, match="outside a transaction"):
        cat.sql("COMMIT")
    cat.sql("BEGIN")
    with pytest.raises(LakeSqlError, match="already open"):
        cat.sql("BEGIN")
    with pytest.raises(LakeSqlError, match="open transaction"):
        cat.sql("ALTER TABLE tr ADD COLUMN x string")
    with pytest.raises(LakeSqlError, match="open transaction"):
        cat.sql("OPTIMIZE tr")
    cat.sql("ROLLBACK")
    # non-group catalogs have no BEGIN
    from cdm_to_mods_spark.sql import LakeCatalog

    with pytest.raises(LakeSqlError, match="TableGroup"):
        LakeCatalog(spark).sql("BEGIN")


# ------------------------------------------------- review-pass fixes
def test_merge_refuses_update_before_delete_order(spark, cat, seeded):
    seeded.read().limit(1).createOrReplaceTempView("one")
    with pytest.raises(LakeSqlError, match="DELETE first"):
        cat.sql(
            """MERGE INTO tr t USING one s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND s.role = 'user' THEN UPDATE SET text = 'keep'
            WHEN MATCHED THEN DELETE"""
        )
    with pytest.raises(LakeSqlError, match="duplicate WHEN MATCHED"):
        cat.sql(
            """MERGE INTO tr t USING one s
            ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND s.role = 'x' THEN UPDATE SET text = 'a'
            WHEN MATCHED THEN UPDATE SET text = 'b'"""
        )


def test_merge_alias_collision_t_as_source(spark, cat, seeded):
    """Source aliased 't': target refs must not get rewritten twice."""
    spark.createDataFrame(
        [("c1", 0, " suffix")], "conv_id string, turn_idx int, text string"
    ).createOrReplaceTempView("patch")
    cat.sql(
        """MERGE INTO tr USING patch AS t
        ON tr.conv_id = t.conv_id AND tr.turn_idx = t.turn_idx
        WHEN MATCHED THEN UPDATE SET text = concat(tr.text, t.text)"""
    )
    r = seeded.read().filter("conv_id = 'c1' AND turn_idx = 0").first()
    assert r.text == "hello suffix"


def test_create_partitioned_flag_option(spark, cat, tmp_path):
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    loc = str(tmp_path / "flagged")
    cat.sql(
        f"""CREATE TABLE flagged (conv_id string, turn_idx int,
        ts timestamp) USING lake LOCATION '{loc}'
        OPTIONS (partitioned 'true', partition_col 'ts',
                 granularity 'day', num_buckets '2')"""
    )
    assert isinstance(cat.table("flagged"), PartitionedTable)
    assert cat.table("flagged").granularity == "day"


def test_insert_refuses_duplicate_keys_in_one_statement(spark, cat, seeded):
    with pytest.raises(LakeSqlError, match="duplicate key"):
        cat.sql(
            "INSERT INTO tr VALUES "
            "('dup', 0, 'user', 'first', NULL, NULL), "
            "('dup', 0, 'user', 'second', NULL, NULL)"
        )
    assert seeded.read().filter("conv_id = 'dup'").count() == 0


def test_backslash_escaped_quote_in_update(spark, cat, seeded):
    cat.sql("UPDATE tr SET text = 'it\\'s fine', tool = 'q' "
            "WHERE conv_id = 'c2'")
    r = seeded.read().filter("conv_id = 'c2'").first()
    assert (r.text, r.tool) == ("it's fine", "q")


def test_bare_describe_lists_schema(spark, cat, seeded):
    rows = cat.sql("DESCRIBE tr").collect()
    assert [r.col_name for r in rows] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    assert rows[0].data_type == "string"


# --------------------------- views / overwrite / partitions / persist
def test_create_view_and_view_over_view(spark, cat, seeded):
    cat.sql("CREATE VIEW user_turns AS "
            "SELECT conv_id, turn_idx, text FROM tr WHERE role = 'user'")
    assert cat.sql("SELECT count(*) AS n FROM user_turns").first().n == 2
    cat.sql("CREATE VIEW c1_user AS "
            "SELECT * FROM user_turns WHERE conv_id = 'c1'")
    assert cat.sql("SELECT text FROM c1_user").first().text == "hello"
    # views track table heads: a later write is visible through the view
    seeded.apply_changes(_events(
        spark, [("I", 50, "c9", 0, "user", "late", None)]), batch_id=9)
    assert cat.sql("SELECT count(*) AS n FROM user_turns").first().n == 3
    names = [r.viewName for r in cat.sql("SHOW VIEWS").collect()]
    assert names == ["c1_user", "user_turns"]
    with pytest.raises(LakeSqlError, match="already exists"):
        cat.sql("CREATE VIEW user_turns AS SELECT 1 AS one")
    cat.sql("CREATE OR REPLACE VIEW user_turns AS SELECT 1 AS one")
    assert cat.sql("SELECT one FROM user_turns").first().one == 1
    cat.sql("DROP VIEW c1_user")
    assert cat.sql("SHOW VIEWS").count() == 1
    # broken body fails at CREATE, not first use
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW broken AS SELECT nope FROM tr")
    assert "broken" not in [r.viewName
                            for r in cat.sql("SHOW VIEWS").collect()]


def test_insert_overwrite_replaces_whole_table(spark, cat, seeded):
    cat.sql("INSERT OVERWRITE tr "
            "SELECT conv_id, turn_idx, role, upper(text), tool, ts "
            "FROM tr WHERE conv_id = 'c1'")
    rows = {(r.conv_id, r.turn_idx): r.text
            for r in seeded.read().collect()}
    assert rows == {("c1", 0): "HELLO", ("c1", 1): "HI THERE"}
    # the replace is one commit and rides the feed as D+U rows
    feed = seeded.changes(seeded.latest_version() - 1)
    ops = sorted((r.conv_id, r.turn_idx, r._deleted)
                 for r in feed.collect())
    assert ("c2", 0, True) in ops


def test_show_partitions(spark, cat, tmp_path, seeded):
    loc = str(tmp_path / "p2")
    cat.sql(f"CREATE TABLE p2 (conv_id string, turn_idx int, "
            f"ts timestamp) USING lake LOCATION '{loc}' "
            f"OPTIONS (partition_col 'ts', granularity 'month', "
            f"num_buckets '2')")
    cat.sql("INSERT INTO p2 VALUES "
            "('a', 0, timestamp'2024-02-01 00:00:00'), "
            "('b', 0, timestamp'2024-05-01 00:00:00')")
    assert [r.partition for r in cat.sql("SHOW PARTITIONS p2").collect()] \
        == ["2024-02", "2024-05"]
    with pytest.raises(LakeSqlError, match="flat"):
        cat.sql("SHOW PARTITIONS tr")


def test_catalog_save_load_roundtrip(spark, cat, tmp_path, seeded):
    cat.sql("CREATE VIEW v1 AS SELECT conv_id FROM tr")
    p = str(tmp_path / "catalog.json")
    cat.save(p)
    cat2 = LakeCatalog.load(spark, p)
    assert cat2.tables() == ["tr"]
    assert cat2.sql("SELECT count(*) AS n FROM tr").first().n == 3
    assert cat2.sql("SELECT count(*) AS n FROM v1").first().n == 3


def test_txn_group_with_partitioned_member(spark, tmp_path):
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.plans.txn import TableGroup

    pt = PartitionedTable(spark, str(tmp_path / "pt"), num_buckets=2,
                          merge_mode="mor", granularity="month")
    pt.create(TRANSCRIPT_SCHEMA)
    flat = LakeTable(spark, str(tmp_path / "flat"),
                     key_cols=("conv_id",), num_buckets=2,
                     merge_mode="mor")
    flat.create(T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
    ]))
    g = TableGroup(spark, str(tmp_path / "g2"))
    g.create({"pt": pt, "flat": flat})
    assert isinstance(g.table("pt"), PartitionedTable)
    ev = spark.createDataFrame(
        [("I", 1, "x", 0, "user", "jan", None, "2024-01-03 10:00:00")],
        "op string, seq long, conv_id string, turn_idx int, role string,"
        " text string, tool string, ts_raw string",
    ).withColumn("ts", pytest.importorskip("pyspark.sql.functions")
                 .to_timestamp("ts_raw")).drop("ts_raw")
    with g.transaction() as txn:
        txn.table("pt").apply_changes(ev, batch_id=0)
        txn.table("flat").apply_changes(spark.createDataFrame(
            [("I", 1, "x", "ok")],
            "op string, seq long, conv_id string, status string"))
        txn.commit()
    assert g.read("pt").count() == 1
    assert g.read("flat").count() == 1
    assert g.table("pt").partitions() == ["2024-01"]


def test_explain_tag_travel_show_create(spark, cat, tmp_path, seeded):
    # EXPLAIN delegates with the same view registration
    plan = cat.sql("EXPLAIN SELECT count(*) FROM tr").first()[0]
    assert "Aggregate" in plan or "Scan" in plan
    # tag-based time travel (Iceberg VERSION AS OF 'tag')
    seeded.tag("v_first")
    seeded.delete_where("conv_id = 'c1'")
    assert cat.sql(
        "SELECT count(*) AS n FROM tr VERSION AS OF 'v_first'"
    ).first().n == 3
    assert cat.sql("SELECT count(*) AS n FROM tr").first().n == 1
    # SHOW CREATE TABLE round-trips through the router's own grammar
    ddl = cat.sql("SHOW CREATE TABLE tr").first().create_statement
    assert "USING lake" in ddl and "merge_mode 'mor'" in ddl
    ddl2 = ddl.replace("TABLE tr ", "TABLE tr_clone ", 1).replace(
        seeded.path, str(tmp_path / "c2"))
    cat.sql(ddl2)  # parses and creates
    assert cat.table("tr_clone").merge_mode == "mor"


# ------------------------------------------------- materialized views
@pytest.fixture()
def cl_table(spark, cat, tmp_path):
    """A changelog='lookup' table so mview refreshes are retract-fold
    incremental."""
    t = LakeTable(spark, str(tmp_path / "clt"), num_buckets=2,
                  merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "aaaa", None),
        ("I", 2, "c1", 1, "assistant", "bb", None),
        ("I", 3, "c2", 0, "user", "cccccc", None),
    ]), batch_id=0)
    cat.register("clt", t)
    return t


def test_materialized_view_lifecycle(spark, cat, tmp_path, cl_table):
    out = cat.sql(
        f"CREATE MATERIALIZED VIEW conv_stats LOCATION "
        f"'{tmp_path / 'mv'}' AS SELECT conv_id, count(*) AS n_turns, "
        f"sum(length(text)) AS n_chars FROM clt GROUP BY conv_id"
    ).first()
    assert out.created is True
    rows = {r.conv_id: (r.n_turns, r.n_chars) for r in
            cat.sql("SELECT * FROM conv_stats").collect()}
    assert rows == {"c1": (2, 6.0), "c2": (1, 6.0)}
    # source changes are not visible until REFRESH...
    cl_table.apply_changes(_events(spark, [
        ("U", 4, "c1", 0, "user", "a", None),      # 4 chars -> 1
        ("D", 5, "c2", 0, None, None, None),        # c2 vanishes
    ]), batch_id=1)
    rows = {r.conv_id: r.n_turns for r in
            cat.sql("SELECT * FROM conv_stats").collect()}
    assert rows == {"c1": 2, "c2": 1}
    ref = cat.sql("REFRESH MATERIALIZED VIEW conv_stats").first()
    assert ref.strategy == "retract"   # incremental, not a rebuild
    rows = {r.conv_id: (r.n_turns, r.n_chars) for r in
            cat.sql("SELECT * FROM conv_stats").collect()}
    assert rows == {"c1": (2, 3.0)}
    # non-additive aggregates are refused with the reason
    with pytest.raises(LakeSqlError, match="not additive"):
        cat.sql(f"CREATE MATERIALIZED VIEW bad LOCATION "
                f"'{tmp_path / 'bad'}' AS SELECT conv_id, max(ts) AS m "
                f"FROM clt GROUP BY conv_id")
    with pytest.raises(LakeSqlError, match="avg is not stored"):
        cat.sql(f"CREATE MATERIALIZED VIEW bad2 LOCATION "
                f"'{tmp_path / 'bad2'}' AS SELECT conv_id, "
                f"avg(length(text)) AS m FROM clt GROUP BY conv_id")
    cat.sql("DROP MATERIALIZED VIEW conv_stats")
    with pytest.raises(LakeSqlError, match="no materialized view"):
        cat.sql("REFRESH MATERIALIZED VIEW conv_stats")


def test_materialized_view_persistence(spark, cat, tmp_path, cl_table):
    cat.sql(
        f"CREATE MATERIALIZED VIEW mv2 LOCATION '{tmp_path / 'mv2'}' "
        f"AS SELECT role, count(*) AS n FROM clt GROUP BY role"
    )
    p = str(tmp_path / "cat.json")
    cat.save(p)
    cat2 = LakeCatalog.load(spark, p)
    rows = {r.role: r.n for r in
            cat2.sql("SELECT * FROM mv2").collect()}
    assert rows == {"user": 2, "assistant": 1}
    # the reloaded handle keeps refreshing incrementally
    cl_table.apply_changes(_events(
        spark, [("I", 9, "c3", 0, "tool", "t", None)]), batch_id=2)
    assert cat2.sql("REFRESH MATERIALIZED VIEW mv2").first().strategy \
        == "retract"
    rows = {r.role: r.n for r in cat2.sql("SELECT * FROM mv2").collect()}
    assert rows == {"user": 2, "assistant": 1, "tool": 1}


def test_table_changes_tvf_and_copy_into(spark, cat, tmp_path, seeded):
    v0 = seeded.latest_version()
    cat.sql("UPDATE tr SET tool = 'cdc' WHERE conv_id = 'c1'")
    rows = cat.sql(
        f"SELECT conv_id, turn_idx, tool FROM table_changes('tr', {v0}) "
        f"ORDER BY conv_id, turn_idx"
    ).collect()
    assert [(r.conv_id, r.turn_idx, r.tool) for r in rows] == [
        ("c1", 0, "cdc"), ("c1", 1, "cdc")
    ]
    # aggregating over the feed works like any relation
    assert cat.sql(
        f"SELECT count(*) AS n FROM table_changes('tr', {v0})"
    ).first().n == 2
    # COPY INTO loads an event dir through the MERGE path, exactly-once
    ev_dir = str(tmp_path / "ev")
    from cdm_to_mods_spark.sources.events import write_events
    from cdm_to_mods_spark.schemas import EVENT_SCHEMA

    events = spark.createDataFrame(
        [("I", 90, "cp1", 0, "user", "copied", None, None, None)],
        EVENT_SCHEMA,
    )
    write_events(events, ev_dir, fmt="json")
    out = cat.sql(
        f"COPY INTO tr FROM '{ev_dir}' FILEFORMAT = json BATCH_ID = 77"
    ).first()
    assert out.n_events == 1
    assert seeded.read().filter("conv_id = 'cp1'").count() == 1
    # re-running the same statement is a ledger skip
    again = cat.sql(
        f"COPY INTO tr FROM '{ev_dir}' FILEFORMAT = json BATCH_ID = 77"
    ).first()
    assert again.skipped is True


# --------------------------------------------- review-pass-2 fixes
def test_mview_null_group_key_folds_not_splits(spark, cat, tmp_path):
    t = LakeTable(spark, str(tmp_path / "ng"), num_buckets=2,
                  merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, None, "a", None),      # NULL role group
        ("I", 2, "c2", 0, None, "bb", None),
        ("I", 3, "c3", 0, "user", "ccc", None),
    ]), batch_id=0)
    cat.register("ng", t)
    cat.sql(f"CREATE MATERIALIZED VIEW ngmv LOCATION '{tmp_path/'ngmv'}'"
            f" AS SELECT role, count(*) AS n FROM ng GROUP BY role")
    t.apply_changes(_events(spark, [
        ("I", 4, "c4", 0, None, "d", None),       # another NULL-role row
    ]), batch_id=1)
    cat.sql("REFRESH MATERIALIZED VIEW ngmv")
    rows = [(r.role, r.n) for r in
            cat.sql("SELECT * FROM ngmv ORDER BY role NULLS FIRST")
            .collect()]
    # ONE null group with the folded count, never two split rows
    assert rows == [(None, 3), ("user", 1)]


def test_view_over_mview_binds_fresh_state(spark, cat, tmp_path, cl_table):
    cat.sql(f"CREATE MATERIALIZED VIEW m LOCATION '{tmp_path/'m'}' AS "
            f"SELECT conv_id, count(*) AS n FROM clt GROUP BY conv_id")
    # view over the mview created WITHOUT querying the mview first
    cat.sql("CREATE VIEW big AS SELECT * FROM m WHERE n >= 2")
    assert cat.sql("SELECT conv_id FROM big").first().conv_id == "c1"
    # refresh twice (pruning old data dirs) — the view must still bind
    cl_table.apply_changes(_events(
        spark, [("I", 7, "c1", 2, "user", "x", None)]), batch_id=1)
    cat.sql("REFRESH MATERIALIZED VIEW m")
    cl_table.apply_changes(_events(
        spark, [("I", 8, "c1", 3, "user", "y", None)]), batch_id=2)
    cat.sql("REFRESH MATERIALIZED VIEW m")
    assert cat.sql("SELECT n FROM big").first().n == 4


def test_self_referential_view_is_a_cycle(spark, cat, seeded):
    cat.sql("CREATE VIEW sv AS SELECT 1 AS n")
    cat.sql("SELECT * FROM sv").collect()  # registers the temp view
    with pytest.raises(LakeSqlError, match="references itself"):
        cat.sql("CREATE OR REPLACE VIEW sv AS SELECT n + 1 AS n FROM sv")
    # the original definition survived the refused replace
    assert cat.sql("SELECT n FROM sv").first().n == 1


def test_drop_table_refuses_while_mview_depends(spark, cat, tmp_path,
                                                cl_table):
    cat.sql(f"CREATE MATERIALIZED VIEW dep LOCATION '{tmp_path/'dep'}' "
            f"AS SELECT role, count(*) AS n FROM clt GROUP BY role")
    with pytest.raises(LakeSqlError, match="source of materialized"):
        cat.sql("DROP TABLE clt")
    cat.sql("DROP MATERIALIZED VIEW dep")
    assert cat.sql("DROP TABLE clt").first().dropped is True


def test_mview_refused_inside_transaction(spark, grouped_cat, tmp_path):
    cat, g = grouped_cat
    cat.sql("BEGIN")
    with pytest.raises(LakeSqlError, match="open transaction"):
        cat.sql(f"CREATE MATERIALIZED VIEW mtx LOCATION "
                f"'{tmp_path/'mtx'}' AS SELECT role, count(*) AS n "
                f"FROM tr GROUP BY role")
    cat.sql("ROLLBACK")


def test_name_collisions_are_refused(spark, cat, tmp_path, cl_table):
    cat.sql("CREATE VIEW vv AS SELECT 1 AS one")
    with pytest.raises(LakeSqlError, match="stored view"):
        cat.register("vv", cl_table)
    with pytest.raises(LakeSqlError, match="stored view"):
        cat.sql(f"CREATE TABLE vv (a string) USING lake "
                f"LOCATION '{tmp_path/'x'}'")
    cat.sql(f"CREATE MATERIALIZED VIEW mm LOCATION '{tmp_path/'mm'}' "
            f"AS SELECT role, count(*) AS n FROM clt GROUP BY role")
    with pytest.raises(LakeSqlError, match="materialized view"):
        cat.sql("CREATE VIEW mm AS SELECT 2 AS two")


def test_mview_alias_validation(spark, cat, tmp_path, cl_table):
    with pytest.raises(LakeSqlError, match="collide"):
        cat.sql(f"CREATE MATERIALIZED VIEW b1 LOCATION '{tmp_path/'b1'}'"
                f" AS SELECT role, count(*) AS _rows FROM clt "
                f"GROUP BY role")
    with pytest.raises(LakeSqlError, match="collide"):
        cat.sql(f"CREATE MATERIALIZED VIEW b2 LOCATION '{tmp_path/'b2'}'"
                f" AS SELECT role, sum(seq) AS role FROM clt "
                f"GROUP BY role")
    with pytest.raises(LakeSqlError, match="duplicate"):
        cat.sql(f"CREATE MATERIALIZED VIEW b3 LOCATION '{tmp_path/'b3'}'"
                f" AS SELECT role, count(*) AS n, sum(turn_idx) AS n "
                f"FROM clt GROUP BY role")


def test_show_create_carries_write_strategy(spark, cat, tmp_path):
    t = LakeTable(spark, str(tmp_path / "st"), num_buckets=2,
                  merge_mode="mor", compact_deltas=5, changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    cat.register("st", t)
    ddl = cat.sql("SHOW CREATE TABLE st").first().create_statement
    assert "compact_deltas '5'" in ddl and "changelog 'lookup'" in ddl


def test_copy_into_non_transcript_table(spark, cat, tmp_path):
    t = LakeTable(spark, str(tmp_path / "ord"), key_cols=("order_id",),
                  bucket_col="order_id", num_buckets=2, merge_mode="mor")
    t.create(T.StructType([
        T.StructField("order_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), True),
    ]))
    cat.register("ord", t)
    import json as _json
    ev_dir = tmp_path / "ordev"
    ev_dir.mkdir()
    (ev_dir / "part-0.json").write_text("\n".join(
        _json.dumps(e) for e in [
            {"op": "I", "seq": 1, "order_id": "o1", "amount": 9.5},
            {"op": "I", "seq": 2, "order_id": "o2", "amount": 1.25},
        ]))
    out = cat.sql(f"COPY INTO ord FROM '{ev_dir}' FILEFORMAT = json "
                  f"BATCH_ID = 1").first()
    assert out.n_events == 2
    rows = {r.order_id: r.amount for r in t.read().collect()}
    assert rows == {"o1": 9.5, "o2": 1.25}


def test_branch_and_tag_admin_sql(spark, cat, seeded):
    cat.sql("ALTER TABLE tr CREATE TAG snap1")
    assert [(r.tag, r.version) for r in
            cat.sql("SHOW TAGS tr").collect()] == [("snap1", 1)]
    cat.sql("ALTER TABLE tr CREATE BRANCH audit")
    assert [r.branch for r in
            cat.sql("SHOW BRANCHES tr").collect()] == ["audit"]
    # stage a commit on the branch through the library (SQL DML always
    # targets main), then publish it in SQL
    staged = LakeTable(spark, seeded.path, branch="audit",
                       merge_mode="mor")
    staged.apply_changes(_events(
        spark, [("I", 60, "br1", 0, "user", "staged row", None)]),
        batch_id=60)
    out = cat.sql("ALTER TABLE tr PUBLISH BRANCH audit").first()
    assert out.published_version == 2
    assert cat.sql("SELECT count(*) AS n FROM tr "
                   "WHERE conv_id = 'br1'").first().n == 1
    assert cat.sql("SHOW BRANCHES tr").count() == 0
    # tag still resolves the pre-publish snapshot
    assert cat.sql("SELECT count(*) AS n FROM tr VERSION AS OF 'snap1'"
                   ).first().n == 3
    cat.sql("ALTER TABLE tr CREATE BRANCH scrap")
    cat.sql("ALTER TABLE tr DROP BRANCH scrap")
    cat.sql("ALTER TABLE tr DROP TAG snap1")
    assert cat.sql("SHOW TAGS tr").count() == 0


def test_partitioned_table_full_sql_dml(spark, cat, tmp_path):
    loc = str(tmp_path / "pdml")
    cat.sql(f"CREATE TABLE pd (conv_id string, turn_idx int, "
            f"text string, ts timestamp) USING lake LOCATION '{loc}' "
            f"OPTIONS (partition_col 'ts', granularity 'month', "
            f"num_buckets '2', merge_mode 'mor')")
    cat.sql("INSERT INTO pd VALUES "
            "('a', 0, 'jan', timestamp'2024-01-05 10:00:00'), "
            "('b', 0, 'feb', timestamp'2024-02-05 10:00:00'), "
            "('c', 0, 'feb2', timestamp'2024-02-06 10:00:00')")
    cat.sql("UPDATE pd SET text = upper(text) WHERE conv_id = 'b'")
    assert cat.sql("SELECT text FROM pd WHERE conv_id = 'b'"
                   ).first().text == "FEB"
    assert cat.sql("DELETE FROM pd WHERE conv_id = 'c'"
                   ).first().deleted_rows == 1
    assert cat.sql("SELECT count(*) AS n FROM pd").first().n == 2
    # MERGE INTO fans out partition-locally
    spark.createDataFrame(
        [("a", 0, "patched jan", __import__("datetime").datetime(2024, 1, 5, 10))],
        "conv_id string, turn_idx int, text string, ts timestamp",
    ).createOrReplaceTempView("pd_src")
    cat.sql("""MERGE INTO pd t USING pd_src s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED THEN UPDATE SET text = s.text""")
    assert cat.sql("SELECT text FROM pd WHERE conv_id = 'a'"
                   ).first().text == "patched jan"
    hist = cat.sql("DESCRIBE HISTORY pd LIMIT 1").first()
    assert hist.operation is not None
    assert cat.sql("VACUUM pd RETAIN 2 SNAPSHOTS").columns


def test_mview_over_partitioned_table(spark, cat, tmp_path):
    """The CREATE MATERIALIZED VIEW engine rides the router's global
    row_changes when the source sub-tables produce a typed changelog."""
    loc = str(tmp_path / "pmv")
    cat.sql(f"CREATE TABLE pm (conv_id string, turn_idx int, "
            f"text string, ts timestamp) USING lake LOCATION '{loc}' "
            f"OPTIONS (partition_col 'ts', granularity 'month', "
            f"num_buckets '2', merge_mode 'mor', changelog 'lookup')")
    cat.sql("INSERT INTO pm VALUES "
            "('a', 0, 'xx', timestamp'2024-01-05 10:00:00'), "
            "('b', 0, 'yyy', timestamp'2024-02-05 10:00:00')")
    cat.sql(f"CREATE MATERIALIZED VIEW pstats LOCATION "
            f"'{tmp_path/'pstats'}' AS SELECT conv_id, count(*) AS n, "
            f"sum(length(text)) AS chars FROM pm GROUP BY conv_id")
    rows = {r.conv_id: (r.n, r.chars) for r in
            cat.sql("SELECT * FROM pstats").collect()}
    assert rows == {"a": (1, 2.0), "b": (1, 3.0)}
    cat.sql("INSERT INTO pm VALUES "
            "('a', 1, 'zzzz', timestamp'2024-03-01 00:00:00')")
    out = cat.sql("REFRESH MATERIALIZED VIEW pstats").first()
    rows = {r.conv_id: (r.n, r.chars) for r in
            cat.sql("SELECT * FROM pstats").collect()}
    assert rows == {"a": (2, 6.0), "b": (1, 3.0)}


# --------------------------------------------- review-pass-3 fixes
def test_view_named_like_a_column_is_not_a_false_cycle(spark, cat, seeded):
    """A view whose body mentions its own name as a COLUMN must not be
    refused as a cycle (token matching cannot tell the difference, so
    self-expansion is skipped and true self-reference is caught at
    CREATE instead)."""
    cat.sql("CREATE VIEW role AS SELECT role FROM tr WHERE role = 'user'")
    assert cat.sql("SELECT count(*) AS n FROM role").first().n == 2
    # true self-reference still refused, with a typed error
    with pytest.raises(LakeSqlError, match="references itself"):
        cat.sql("CREATE OR REPLACE VIEW role AS "
                "SELECT role FROM role WHERE role IS NOT NULL")
    # original definition intact
    assert cat.sql("SELECT count(*) AS n FROM role").first().n == 2


def test_copy_into_debezium_uses_target_schema(spark, cat, tmp_path):
    t = LakeTable(spark, str(tmp_path / "dz"), key_cols=("order_id",),
                  bucket_col="order_id", num_buckets=2, merge_mode="mor")
    t.create(T.StructType([
        T.StructField("order_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), True),
    ]))
    cat.register("dz", t)
    import json as _json
    d = tmp_path / "dzev"
    d.mkdir()
    env = {"op": "c", "before": None,
           "after": {"order_id": "o1", "amount": 3.5},
           "source": {"lsn": 1}, "ts_ms": 1}
    (d / "p0.json").write_text(_json.dumps(env))
    out = cat.sql(f"COPY INTO dz FROM '{d}' FILEFORMAT = debezium "
                  f"BATCH_ID = 1").first()
    assert out.n_events == 1
    r = t.read().first()
    assert (r.order_id, r.amount) == ("o1", 3.5)


def test_show_tblproperties_and_mview_refresh_hint(spark, cat, tmp_path,
                                                   seeded, cl_table):
    cat.sql("ALTER TABLE tr SET TBLPROPERTIES (team 'ingest', env 'ci')")
    rows = {r.key: r.value for r in
            cat.sql("SHOW TBLPROPERTIES tr").collect()}
    assert rows == {"team": "ingest", "env": "ci"}
    # creation names the maintenance mode the source supports
    hint = cat.sql(
        f"CREATE MATERIALIZED VIEW h1 LOCATION '{tmp_path/'h1'}' AS "
        f"SELECT role, count(*) AS n FROM clt GROUP BY role"
    ).first().refresh_mode
    assert hint.startswith("incremental")
    hint2 = cat.sql(
        f"CREATE MATERIALIZED VIEW h2 LOCATION '{tmp_path/'h2'}' AS "
        f"SELECT role, count(*) AS n FROM tr GROUP BY role"
    ).first().refresh_mode
    # round 4: plain-cdf sources refresh incrementally too (pre-image
    # lookup), with the full-recompute fallback named in the hint
    assert hint2.startswith("incremental") and "pre-image" in hint2


# --------------------------------------------- round-4 advice fixes
def test_vacuum_on_group_member_keeps_pinned_versions(spark, grouped_cat):
    """ADVICE r3: VACUUM through a grouped catalog must not expire
    sub-versions that surviving group cuts still pin — the repro was a
    committed txn plus direct member writes, then VACUUM RETAIN 1
    deleting the version the LATEST cut reads through."""
    cat, g = grouped_cat
    cat.sql("BEGIN")
    cat.sql("INSERT INTO tr (conv_id, turn_idx, text) "
            "VALUES ('pin', 0, 'pinned row')")
    cat.sql("COMMIT")
    # member advances via direct (unsynced) writes — cuts now pin OLDER
    # sub-versions than the member head
    t = g.table("tr")
    t.apply_changes(_events(spark, [
        ("I", 50, "d1", 0, "user", "direct one", None)]), batch_id=50)
    t.apply_changes(_events(spark, [
        ("I", 51, "d2", 0, "user", "direct two", None)]), batch_id=51)
    out = cat.sql("VACUUM tr RETAIN 1 SNAPSHOTS").first().asDict()
    assert out.get("keep_last_clamped_from") == 1
    # every cut is still readable — the isolation guarantee VACUUM broke
    for v in g._versions():
        assert g.read("tr", group_version=v).count() >= 0
    assert g.read("tr").filter("conv_id = 'pin'").count() == 1


def test_txn_refuses_write_to_non_member(spark, grouped_cat, tmp_path):
    cat, g = grouped_cat
    solo = LakeTable(spark, str(tmp_path / "solo"), num_buckets=2,
                     merge_mode="mor")
    solo.create(TRANSCRIPT_SCHEMA)
    cat.register("solo", solo)
    cat.sql("BEGIN")
    with pytest.raises(LakeSqlError, match="not a member"):
        cat.sql("INSERT INTO solo (conv_id, turn_idx, text) "
                "VALUES ('x', 0, 'leak')")
    # reads of non-members inside the txn stay fine
    assert cat.sql("SELECT count(*) AS n FROM solo").first().n == 0
    cat.sql("ROLLBACK")
    assert solo.read().count() == 0  # nothing leaked through
    cat.sql("INSERT INTO solo (conv_id, turn_idx, text) "
            "VALUES ('x', 0, 'ok now')")
    assert solo.read().count() == 1


def test_tblproperties_apostrophe_roundtrips_show_create(spark, cat,
                                                         tmp_path, seeded):
    cat.sql("ALTER TABLE tr SET TBLPROPERTIES (note 'it''s fine')")
    assert seeded.properties()["note"] == "it's fine"
    ddl = cat.sql("SHOW CREATE TABLE tr").first().create_statement
    assert "it''s fine" in ddl
    # the documented contract: emitted DDL re-parses through the router
    cat2 = LakeCatalog(spark)
    cat2.sql(ddl)
    assert cat2.table("tr").properties()["note"] == "it's fine"


def test_run_sql_comment_strip_carries_quote_state_across_lines():
    import importlib.util
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "run_sql", _os.path.join(_os.path.dirname(__file__),
                                 "..", "scripts", "run_sql.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    script = (
        "UPDATE tr SET text = 'line one\n"
        "-- not a comment, inside the literal\n"
        "line three' WHERE conv_id = 'c1';\n"
        "-- a real comment\n"
        "SELECT 1; -- trailing comment\n"
    )
    stripped = mod._strip_comments(script)
    assert "-- not a comment, inside the literal" in stripped
    assert "-- a real comment" not in stripped
    assert stripped.rstrip().endswith("SELECT 1;")


# ---------------------------------------------- round-4 router fuzzing
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_IDENTS = st.sampled_from(
    ["tr", "nope", "v1", "mv", "x", "audit", "Tr", "TR_2", "a.b"]
)
_PREDICATES = st.sampled_from([
    "conv_id = 'c1'", "turn_idx >= 0", "1 = 1", "text IS NULL",
    "length(text) > 1000000", "bogus_col = 3", "role = 'user'",
])
_JUNK = st.sampled_from([
    "", " ;", " EXTRA TOKENS", " WHERE", " ''", " (", " --x",
])


def _statements():
    ident, pred, junk = _IDENTS, _PREDICATES, _JUNK
    shapes = [
        st.tuples(st.just("SELECT count(*) AS n FROM {i}"), ident, junk),
        st.tuples(st.just("SELECT * FROM {i} VERSION AS OF 999"), ident,
                  st.just("")),
        st.tuples(st.just("DELETE FROM {i} WHERE {p}"), ident, junk),
        st.tuples(st.just("UPDATE {i} SET text = upper(text) WHERE {p}"),
                  ident, junk),
        st.tuples(st.just("INSERT INTO {i} (conv_id, turn_idx, text) "
                          "VALUES ('z', 0, 'v')"), ident, junk),
        st.tuples(st.just("TRUNCATE TABLE {i}"), ident, junk),
        st.tuples(st.just("DESCRIBE {i}"), ident, junk),
        st.tuples(st.just("DESCRIBE HISTORY {i} LIMIT 2"), ident, junk),
        st.tuples(st.just("OPTIMIZE {i}"), ident, junk),
        st.tuples(st.just("VACUUM {i} RETAIN 2 SNAPSHOTS"), ident, junk),
        st.tuples(st.just("RESTORE TABLE {i} TO VERSION AS OF 0"), ident,
                  junk),
        st.tuples(st.just("ALTER TABLE {i} ADD COLUMN zz9 string"), ident,
                  junk),
        st.tuples(st.just("ALTER TABLE {i} DROP CONSTRAINT nope"), ident,
                  junk),
        st.tuples(st.just("SHOW CREATE TABLE {i}"), ident, junk),
        st.tuples(st.just("SHOW PARTITIONS {i}"), ident, junk),
        st.tuples(st.just("SHOW BRANCHES {i}"), ident, junk),
        st.tuples(st.just("MERGE INTO {i} t USING one s ON "
                          "t.conv_id = s.conv_id WHEN MATCHED THEN "
                          "UPDATE SET text = s.text"), ident, junk),
        st.tuples(st.just("COPY INTO {i} FROM '/does/not/exist' "
                          "FILEFORMAT = json"), ident, junk),
        st.tuples(st.just("CREATE VIEW vv AS SELECT * FROM {i} "
                          "WHERE {p}"), ident, junk),
        st.tuples(st.just("GRANT ALL ON {i}"), ident, junk),
        st.tuples(st.just("{i}"), ident, junk),
    ]
    return st.one_of(shapes).map(
        lambda t: t[0].replace("{i}", t[1]).replace(
            "{p}", "conv_id = 'c1'") + t[2]
    )


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(stmt=_statements())
def test_router_fuzz_parse_or_typed_error(spark, tmp_path_factory, stmt):
    """Grammar fuzz over the documented statement surface (sql.py header):
    every generated statement — valid, misnamed, or junk-suffixed — must
    either execute or raise a TYPED error (LakeSqlError, the engine's
    LookupError family, or Spark's own captured analysis/parse errors).
    A Python-internal exception (TypeError/AttributeError/KeyError/...)
    means a statement was routed into a handler that did not match it —
    the silent-wrong-route bug class. Refused statements must also leave
    the table version untouched (refuse-before-commit)."""
    from pyspark.errors.exceptions.captured import CapturedException

    from cdm_to_mods_spark.schemas import SchemaEvolutionError

    base = tmp_path_factory.mktemp("fuzz")
    t = LakeTable(spark, str(base / "tr"), num_buckets=2, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "hello", None)]), batch_id=0)
    cat = LakeCatalog(spark)
    cat.register("tr", t)
    t.read().limit(1).createOrReplaceTempView("one")
    v0 = t.latest_version()
    try:
        cat.sql(stmt)
    except (LakeSqlError, LookupError, ValueError, SchemaEvolutionError,
            CapturedException):
        # typed refusal: nothing may have committed
        assert t.latest_version() == v0, stmt
    # any OTHER exception propagates and fails the test — that's the bug


# ------------------------------------------------- curation TVFs (round 5)


@pytest.fixture()
def docs_view(spark):
    """A (doc_id, text) relation as a temp view — the shape every
    curation TVF takes."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (3, "completely different text about spark engines and lakes"),
        (4, "completely different text about spark engines and lakes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("docs")
    return df


def test_tvf_dedup_exact(spark, cat, docs_view):
    got = cat.sql(
        "SELECT keeper_id, n_copies FROM dedup_exact('docs') "
        "WHERE n_copies > 1 ORDER BY keeper_id"
    ).collect()
    assert [(r.keeper_id, r.n_copies) for r in got] == [(0, 2), (3, 2)]


def test_tvf_dedup_minhash_pairs_and_clusters(spark, cat, docs_view):
    pairs = cat.sql(
        "SELECT doc_a, doc_b FROM dedup_minhash_pairs('docs') "
        "ORDER BY doc_a, doc_b"
    ).collect()
    got_pairs = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in got_pairs and (3, 4) in got_pairs
    clusters = cat.sql(
        "SELECT doc_id, cluster_id, is_canonical FROM dedup_clusters('docs')"
    ).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.is_canonical) for r in clusters}
    # 0,1 (and possibly 2) share a cluster rooted at 0; 3,4 at 3
    assert by_doc[0] == (0, True) and by_doc[1] == (0, False)
    assert by_doc[3] == (3, True) and by_doc[4] == (3, False)


def test_tvf_decontaminate_with_bench_relation(spark, cat, docs_view):
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    ).createOrReplaceTempView("bench")
    got = cat.sql(
        "SELECT doc_id, n_hits FROM decontaminate('docs', 'bench', 3) "
        "ORDER BY doc_id"
    ).collect()
    flagged = {r.doc_id for r in got}
    # docs 0,1 share every 3-gram with the bench doc; 2 shares most;
    # 3,4 share none
    assert {0, 1, 2} <= flagged
    assert 3 not in flagged and 4 not in flagged


def test_tvf_works_over_registered_lake_table(spark, cat, tmp_path):
    """The TVF argument binds a registered lake TABLE's head state too,
    and composes with ordinary SQL around it."""
    t = LakeTable(spark, str(tmp_path / "docs_t"), num_buckets=2,
                  merge_mode="mor", key_cols=("doc_id",),
                  bucket_col="doc_id")
    t.create(T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]))
    t.apply_changes(spark.createDataFrame(
        [("I", 1, 7, "alpha beta gamma"), ("I", 2, 8, "alpha beta gamma")],
        "op string, seq long, doc_id long, text string"), batch_id=0)
    cat.register("docs_t", t)
    got = cat.sql(
        "SELECT count(*) AS n FROM dedup_exact('docs_t') WHERE n_copies = 2"
    ).collect()
    assert got[0].n == 1


def test_tvf_unknown_relation_is_typed_error(spark, cat):
    with pytest.raises(LakeSqlError, match="unknown relation"):
        cat.sql("SELECT * FROM dedup_exact('no_such_rel')")


# ---------------------------------------------- round-5 review fixes
def test_timestamp_as_of_date_string(spark, cat, seeded):
    """Date-string TIMESTAMP AS OF literals must work — the pre-fix
    _coerce_ts returned a datetime that version_as_of compared against
    float commit_ts values (TypeError on every documented shape; only
    unix-epoch numeric strings worked)."""
    import datetime as dt

    seeded.delete_where("conv_id = 'c2'")
    tomorrow = (
        dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    ).strftime("%Y-%m-%d")
    got = cat.sql(
        f"SELECT count(*) AS n FROM tr TIMESTAMP AS OF '{tomorrow}'"
    ).first().n
    assert got == 2  # latest state is at-or-before tomorrow
    with pytest.raises(Exception, match="no snapshot"):
        cat.sql("SELECT * FROM tr TIMESTAMP AS OF '2001-01-01 00:00:00'")


def test_merge_using_stored_view_reads_fresh_state(spark, cat, tmp_path,
                                                   seeded):
    """MERGE INTO ... USING a stored view must re-bind the view's table
    references at execution — the pre-fix spark.table() fallback read a
    stale temp-view expansion (or raised raw AnalysisException when the
    view was never queried first)."""
    src = LakeTable(spark, str(tmp_path / "updates"), num_buckets=2,
                    merge_mode="mor")
    src.create(TRANSCRIPT_SCHEMA)
    src.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "stale", None),
    ]), batch_id=0)
    cat.register("updates", src)
    cat.sql("CREATE VIEW upd_v AS SELECT conv_id, turn_idx, text "
            "FROM updates")
    # mutate the base AFTER the view exists, WITHOUT querying it first:
    # the merge must see this write
    src.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, "user", "fresh", None),
    ]), batch_id=1)
    cat.sql(
        "MERGE INTO tr t USING upd_v s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED THEN UPDATE SET text = s.text"
    )
    got = cat.sql(
        "SELECT text FROM tr WHERE conv_id = 'c1' AND turn_idx = 0"
    ).first().text
    assert got == "fresh"


def test_update_where_inside_string_literal(spark, cat, seeded):
    """The structural WHERE must be found quote-aware — the pre-fix
    regex split at the ' where ' INSIDE the literal, garbling both the
    assignment and the predicate."""
    cat.sql("UPDATE tr SET text = 'no where here' WHERE conv_id = 'c2'")
    rows = {r.conv_id: r.text for r in cat.sql(
        "SELECT conv_id, text FROM tr WHERE turn_idx = 0").collect()}
    assert rows["c2"] == "no where here"
    assert rows["c1"] == "hello"  # untouched


def test_bare_explain_is_typed_error(cat):
    with pytest.raises(LakeSqlError, match="EXPLAIN takes"):
        cat.sql("EXPLAIN")


def test_alter_add_columns_multi(spark, cat, seeded):
    """The plural parenthesized form adds EVERY column — the pre-fix
    single-column regex shoved ', b string' into the type string and
    raised a raw ParseException."""
    cat.sql("ALTER TABLE tr ADD COLUMNS (lang string, score double)")
    cols = {f.name: f.dataType.simpleString()
            for f in seeded.schema().fields}
    assert cols["lang"] == "string" and cols["score"] == "double"
    with pytest.raises(LakeSqlError, match="cannot parse column"):
        cat.sql("ALTER TABLE tr ADD COLUMNS (x)")
