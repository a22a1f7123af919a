"""``spark.read.format("lake")`` — the batch data source.

Differential contract: for every table shape the engine can produce
(MoR delta chains, CoW, compaction, schema evolution, tombstone deletes,
time travel, branches, first_row, partitioned specs) the source must
return EXACTLY ``LakeTable.read()`` / ``PartitionedTable.read()``.
Pruning is verified at the reader level (which buckets/partitions were
admitted) AND end-to-end (filtered results still correct)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.lake import LakeTable, _bucket_expr
from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.lake_batch import (
    _LakeBatchReader,
    register_lake,
    spark_hash32_bucket,
    spark_murmur3,
)

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=lambda row: [(v is None, str(v)) for v in row],
    )


def _make_table(spark, path, merge_mode="mor", **kw) -> LakeTable:
    t = LakeTable(spark, path, num_buckets=4, merge_mode=merge_mode, **kw)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "hello", None, _ts(1)),
        ("I", 2, "c1", 1, "assistant", "hi", "search", _ts(1, 6)),
        ("I", 3, "c2", 0, "user", "feb start", None, _ts(2)),
        ("I", 4, "c3", 0, "user", "will die", None, _ts(3)),
    ]), batch_id=0)
    t.apply_changes(_events(spark, [
        ("U", 5, "c1", 0, "user", "hello v2", None, _ts(1, 7)),
        ("D", 6, "c3", 0, None, None, None, None),
        ("I", 7, "c4", 0, "user", "june row", None, _ts(6)),
    ]), batch_id=1)
    return t


# ---------------------------------------------------------------- hashing
def test_murmur3_parity_with_spark_hash(spark):
    rng = random.Random(7)
    strs = ["", "a", "conv-0001", "héllo wörld", "日本語", "x" * 37] + [
        "".join(chr(rng.randrange(32, 1000)) for _ in range(rng.randrange(0, 24)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    for r in df.select("s", F.hash("s").alias("h")).collect():
        assert spark_murmur3(r.s) == r.h, repr(r.s)
    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(20)
    ]
    df = spark.createDataFrame([(i,) for i in ints], "i int")
    for r in df.select("i", F.hash("i").alias("h")).collect():
        assert spark_murmur3(r.i) == r.h, r.i
    longs = [0, 7, -1, 2**63 - 1, -(2**63)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(20)
    ]
    df = spark.createDataFrame([(x,) for x in longs], "l long")
    for r in df.select("l", F.hash("l").alias("h")).collect():
        # long columns hash 8-byte even for small values
        got = spark_hash32_bucket(r.l, 1 << 30, key_is_long=True)
        assert got == ((r.h % (1 << 30)) + (1 << 30)) % (1 << 30), r.l


def test_bucket_parity_with_engine_expr(spark):
    keys = [f"conv-{i:04d}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "conv_id string")
    want = {
        r.conv_id: r.b
        for r in df.select(
            "conv_id", _bucket_expr("conv_id", 16, "hash32").alias("b")
        ).collect()
    }
    for k in keys:
        assert spark_hash32_bucket(k, 16) == want[k], k


# ------------------------------------------------------------- round trips
@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
def test_roundtrip_matches_table_read(spark, tmp_path, merge_mode):
    t = _make_table(spark, str(tmp_path / "t"), merge_mode=merge_mode)
    if merge_mode == "mor":  # delta chains actually present
        assert any(e.get("deltas") for e in t.manifest()["buckets"].values())
    register_lake(spark)
    got = spark.read.format("lake").load(t.path)
    assert _sorted_rows(got) == _sorted_rows(t.read())


def test_roundtrip_after_compaction_and_delete(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    t.delete_where(F.col("conv_id") == "c2")
    t.compact()
    register_lake(spark)
    got = spark.read.format("lake").load(t.path)
    assert _sorted_rows(got) == _sorted_rows(t.read())


def test_roundtrip_schema_evolution(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    t.add_column("lang", "string")
    t.rename_column("tool", "tool_name")
    t.apply_changes(
        spark.createDataFrame(
            [("U", 9, "c1", 0, "user", "v3", "calc", _ts(1, 8), "en")],
            EVENT_DDL.replace("tool string", "tool_name string")
            + ", lang string",
        ),
        batch_id=2,
    )
    register_lake(spark)
    got = spark.read.format("lake").load(t.path)
    assert set(got.columns) == set(t.read().columns)
    assert _sorted_rows(got) == _sorted_rows(t.read())


def test_time_travel_options(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    register_lake(spark)
    v1 = 1  # after the first apply
    got = (
        spark.read.format("lake").option("versionAsOf", v1).load(t.path)
    )
    assert _sorted_rows(got) == _sorted_rows(t.read(version=v1))
    ts1 = t.manifest(v1)["commit_ts"]
    got2 = (
        spark.read.format("lake").option("timestampAsOf", ts1).load(t.path)
    )
    assert _sorted_rows(got2) == _sorted_rows(t.read(version=v1))


def test_branch_option(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    t.create_branch("audit")
    tb = LakeTable(spark, t.path, branch="audit")
    tb.apply_changes(_events(spark, [
        ("I", 20, "c9", 0, "user", "branch only", None, _ts(4)),
    ]), batch_id=100)
    register_lake(spark)
    got = spark.read.format("lake").option("branch", "audit").load(t.path)
    assert _sorted_rows(got) == _sorted_rows(tb.read())
    # main unaffected
    main = spark.read.format("lake").load(t.path)
    assert _sorted_rows(main) == _sorted_rows(t.read())


def test_first_row_engine_resolves(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4,
                  merge_mode="mor", merge_engine="first_row")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 5, "c1", 0, "user", "later", None, _ts(2)),
        ("I", 9, "c2", 0, "user", "only", None, _ts(2)),
    ]), batch_id=0)
    t.apply_changes(_events(spark, [
        ("I", 2, "c1", 0, "user", "earliest wins", None, _ts(1)),
    ]), batch_id=1)
    register_lake(spark)
    got = spark.read.format("lake").load(t.path)
    assert _sorted_rows(got) == _sorted_rows(t.read())
    texts = {r.conv_id: r.text for r in got.collect()}
    assert texts["c1"] == "earliest wins"


def test_column_level_engines_refused(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4,
                  merge_mode="mor", merge_engine="partial_update")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "x", None, _ts(1)),
    ]), batch_id=0)
    register_lake(spark)
    with pytest.raises(Exception, match="merge_engine"):
        spark.read.format("lake").load(t.path).collect()


# ---------------------------------------------------------------- pruning
def test_key_equality_prunes_buckets(spark, tmp_path):
    t = _make_table(spark, str(tmp_path / "t"))
    from pyspark.sql.datasource import EqualTo, In

    reader = _LakeBatchReader({"path": t.path}, t.schema())
    all_parts = reader.partitions()
    reader.pushFilters([EqualTo(("conv_id",), "c1")])
    pruned = reader.partitions()
    want_bucket = spark_hash32_bucket("c1", t.num_buckets)
    assert {p.bucket for p in pruned} == {want_bucket}
    assert len(pruned) < len(all_parts)
    # IN-list admits the union of the keys' buckets
    reader.pushFilters([In(("conv_id",), ("c1", "c4"))])
    got = {p.bucket for p in reader.partitions()}
    assert got == {
        spark_hash32_bucket("c1", t.num_buckets),
        spark_hash32_bucket("c4", t.num_buckets),
    }
    # end-to-end: pruned scan still returns the right rows
    register_lake(spark)
    df = spark.read.format("lake").load(t.path)
    got_rows = _sorted_rows(df.where(F.col("conv_id") == "c1"))
    assert got_rows == _sorted_rows(t.read().where(F.col("conv_id") == "c1"))


def test_zone_map_bounds_prune_buckets(spark, tmp_path):
    # null-free ts everywhere: a file set whose ts is all null records no
    # stats and conservatively keeps its bucket (the read_range rule), so
    # the empty-prune assertion needs every file set zone-mapped.
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _ts(2)),
    ]), batch_id=0)
    t.apply_changes(_events(spark, [
        ("U", 3, "c1", 0, "user", "jan v2", None, _ts(1, 9)),
        ("I", 4, "c4", 0, "user", "june", None, _ts(6)),
    ]), batch_id=1)
    from pyspark.sql.datasource import GreaterThanOrEqual

    reader = _LakeBatchReader({"path": t.path}, t.schema())
    n_all = len(reader.partitions())
    # nothing after 2026 — every bucket's ts zone ends in 2025
    reader.pushFilters([GreaterThanOrEqual(("ts",), dt.datetime(2026, 1, 1))])
    assert reader.partitions() == []
    # a mid-range bound keeps only buckets whose zones reach June
    reader.pushFilters([GreaterThanOrEqual(("ts",), dt.datetime(2025, 6, 1))])
    kept = reader.partitions()
    assert 0 < len(kept) < n_all
    register_lake(spark)
    df = spark.read.format("lake").load(t.path)
    assert (
        df.where(F.col("ts") >= dt.datetime(2025, 6, 1)).count()
        == t.read().where(F.col("ts") >= dt.datetime(2025, 6, 1)).count()
    )
    # pruneStats=false disables pruning but not correctness
    reader2 = _LakeBatchReader(
        {"path": t.path, "pruneStats": "false"}, t.schema()
    )
    reader2.pushFilters(
        [GreaterThanOrEqual(("ts",), dt.datetime(2026, 1, 1))]
    )
    assert len(reader2.partitions()) == n_all


# ------------------------------------------------------------- partitioned
def _make_partitioned(spark, path) -> PartitionedTable:
    pt = PartitionedTable(spark, path, num_buckets=4, merge_mode="mor")
    pt.create(TRANSCRIPT_SCHEMA)
    pt.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _ts(2)),
        ("I", 3, "c3", 0, "user", "jun", None, _ts(6)),
    ]), batch_id=0)
    pt.apply_changes(_events(spark, [
        ("U", 4, "c1", 0, "user", "jan v2", None, _ts(1, 9)),
    ]), batch_id=1)
    return pt


def test_partitioned_roundtrip_and_prune(spark, tmp_path):
    pt = _make_partitioned(spark, str(tmp_path / "pt"))
    register_lake(spark)
    got = spark.read.format("lake").load(pt.path)
    assert _sorted_rows(got) == _sorted_rows(pt.read())

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    reader = _LakeBatchReader({"path": pt.path}, pt._union([pt.read()]).schema)
    reader.pushFilters([
        GreaterThanOrEqual(("ts",), dt.datetime(2025, 5, 1)),
        LessThanOrEqual(("ts",), dt.datetime(2025, 7, 1)),
    ])
    kept = reader.partitions()
    assert {p.ctx for p in kept} == {"2025-06"}
    # end-to-end filtered equality
    cond = (F.col("ts") >= dt.datetime(2025, 5, 1)) & (
        F.col("ts") <= dt.datetime(2025, 7, 1)
    )
    assert _sorted_rows(got.where(cond)) == _sorted_rows(
        pt.read().where(cond)
    )


def test_partitioned_version_as_of(spark, tmp_path):
    pt = _make_partitioned(spark, str(tmp_path / "pt"))
    register_lake(spark)
    got = (
        spark.read.format("lake").option("versionAsOf", 1).load(pt.path)
    )
    assert _sorted_rows(got) == _sorted_rows(pt.read(version=1))


def test_fully_pruned_and_empty_scans_return_zero_rows(spark, tmp_path):
    """partitions() returning [] (empty table, or a key prune that
    eliminates every bucket) makes Spark's Python worker call
    read(None) — the pre-fix reader crashed on partition.ctx instead of
    answering zero rows."""
    register_lake(spark)
    t = LakeTable(spark, str(tmp_path / "empty"), num_buckets=4,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    assert spark.read.format("lake").load(t.path).count() == 0
    t.apply_changes(_events(spark, [
        ("I", 1, "c1", 0, "user", "x", None, _ts(1)),
    ]), batch_id=0)
    df = spark.read.format("lake").load(t.path)
    # probe many absent keys: at 4 buckets with ONE populated, most
    # hash to absent buckets -> empty partitions list end-to-end
    assert all(
        df.where(df.conv_id == f"zz-absent-{i}").count() == 0
        for i in range(6)
    )
    assert df.where(df.conv_id == "c1").count() == 1
