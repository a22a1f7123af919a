"""Export sinks: bucket-partitioned snapshot export (+ per-partition zip,
the S10 analog) and the restriction-report projection (S11)."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sinks import export_snapshot, restriction_report

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


@pytest.fixture()
def small_table(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    rows = [("I", i, f"c{i % 7}", i // 7, "user", f"text-{i}", None, None, None)
            for i in range(40)]
    t.apply_changes(spark.createDataFrame(rows, EVENT_DDL), batch_id=0,
                    transform=apply_chain)
    return t


def test_export_snapshot_roundtrip(spark, small_table, tmp_path):
    out = str(tmp_path / "export")
    res = export_snapshot(small_table, out, fmt="json")
    assert res["bucket_dirs"] >= 1
    back = spark.read.json(out)
    assert back.count() == small_table.read().count()
    assert set(spark.read.json(out).select("conv_id").toPandas()["conv_id"]) == {
        r.conv_id for r in small_table.read().select("conv_id").distinct().collect()
    }


def test_export_snapshot_zip_archives(small_table, tmp_path):
    out = str(tmp_path / "export-zip")
    res = export_snapshot(small_table, out, fmt="csv", archive=True)
    assert res["archives"] == res["bucket_dirs"] >= 1
    zips = [f for f in os.listdir(out) if f.endswith(".zip")]
    assert len(zips) == res["archives"]
    with zipfile.ZipFile(os.path.join(out, zips[0])) as z:
        assert any(n.endswith(".csv") for n in z.namelist())


def test_export_unknown_format(small_table, tmp_path):
    with pytest.raises(ValueError, match="unsupported export format"):
        export_snapshot(small_table, str(tmp_path / "x"), fmt="xml")


def test_restriction_report(spark):
    df = spark.createDataFrame(
        [("a", "restricted", 1), ("b", "", 2), ("c", None, 3), ("d", "yes", 4)],
        "id string, dmaccess string, v int",
    )
    got = restriction_report(df, "dmaccess", "id", "dmaccess")
    assert {r.id for r in got.collect()} == {"a", "d"}
    assert got.columns == ["id", "dmaccess"]


def test_restriction_report_bool_and_int_flags(spark):
    """Flag-typed restriction columns: 0/false cast to non-empty strings
    ('0'/'false'), so the pre-fix null/empty-only filter listed every
    unrestricted record. String columns keep the reference's
    any-non-empty-value rule (a literal '0' is a value there)."""
    flags = spark.createDataFrame(
        [("a", True), ("b", False), ("c", None)],
        "id string, restricted boolean",
    )
    assert {r.id for r in restriction_report(flags, "restricted").collect()} \
        == {"a"}
    ints = spark.createDataFrame(
        [("a", 1), ("b", 0), ("c", None), ("d", 2)],
        "id string, restricted int",
    )
    assert {r.id for r in restriction_report(ints, "restricted").collect()} \
        == {"a", "d"}
    strings = spark.createDataFrame(
        [("a", "0"), ("b", ""), ("c", None)], "id string, restricted string",
    )
    # string "0" is a VALUE, not a falsy flag — stays restricted
    assert {r.id for r in restriction_report(strings, "restricted").collect()} \
        == {"a"}
