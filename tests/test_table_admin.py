"""history(), schema_mode='strict', and target_file_rows — the table-admin
surface: a queryable commit log, a schema-contract enforcement mode, and
file-size control for the 100 TB layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA, SchemaEvolutionError

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


# ---------------------------------------------------------------- history
def test_history_classifies_every_commit_kind(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    snap = spark.createDataFrame(
        [("c1", 0, "user", "hello", None, None)], TRANSCRIPT_SCHEMA
    )
    t.bootstrap(snap, snapshot_seq=10)
    t.apply_changes(
        _events(spark, [("U", 11, "c1", 0, "user", "hi", None),
                        ("I", 12, "c2", 0, "user", "DROPME", None)]),
        batch_id=0,
    )
    t.update_where("conv_id = 'c1'", {"text": "upper(text)"})
    t.delete_where("text = 'DROPME'")
    t.compact()
    h = t.history()
    assert [e["operation"] for e in h] == [
        "compact", "delete_where", "update_where", "MERGE", "bootstrap", "CREATE"
    ]
    assert [e["version"] for e in h] == [5, 4, 3, 2, 1, 0]
    merge = next(e for e in h if e["operation"] == "MERGE")
    assert merge["batch_id"] == 0 and merge["metrics"]["n_events"] == 2
    boot = next(e for e in h if e["operation"] == "bootstrap")
    assert boot["metrics"]["bootstrap_seq"] == 10
    assert all(e["commit_ts"] is not None for e in h)
    assert len(t.history(limit=2)) == 2


def test_history_is_the_retained_ledger(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    for i in range(3):
        t.apply_changes(
            _events(spark, [("I", i + 1, f"c{i}", 0, "user", "x", None)]),
            batch_id=i,
        )
    t.expire_snapshots(keep_last=1)
    assert [e["version"] for e in t.history()] == [3]


# ------------------------------------------------------------ strict mode
def test_strict_mode_refuses_new_column(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                  schema_mode="strict")
    t.create(TRANSCRIPT_SCHEMA)
    drifted = _events(spark, [("I", 1, "c1", 0, "user", "x", None)]).withColumn(
        "surprise", F.lit("boom")
    )
    with pytest.raises(SchemaEvolutionError, match=r"\+surprise:string"):
        t.apply_changes(drifted, batch_id=0)
    # nothing landed; the batch can be re-applied after the fix
    assert t.latest_version() == 0
    t.apply_changes(drifted.drop("surprise"), batch_id=0)
    assert t.read().count() == 1


def test_strict_mode_refuses_type_widening(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                  schema_mode="strict")
    t.create(TRANSCRIPT_SCHEMA)
    wide = _events(spark, [("I", 1, "c1", 0, "user", "x", None)]).withColumn(
        "turn_idx", F.col("turn_idx").cast("long")
    )
    with pytest.raises(SchemaEvolutionError, match="turn_idx:int->bigint"):
        t.apply_changes(wide, batch_id=0)


def test_strict_mode_allows_explicit_ddl(spark, tmp_table):
    """strict closes the implicit path only — add_column still evolves."""
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor",
                  schema_mode="strict")
    t.create(TRANSCRIPT_SCHEMA)
    t.add_column("lang", "string")
    ev = _events(spark, [("I", 1, "c1", 0, "user", "x", None)]).withColumn(
        "lang", F.lit("en")
    )
    t.apply_changes(ev, batch_id=0)
    assert t.read().select("lang").first()[0] == "en"


def test_evolve_mode_still_default(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    drifted = _events(spark, [("I", 1, "c1", 0, "user", "x", None)]).withColumn(
        "extra", F.lit(7)
    )
    t.apply_changes(drifted, batch_id=0)
    assert "extra" in t.read().columns


# ------------------------------------------------------- target_file_rows
def _bucket_file_counts(table_path):
    counts = {}
    data = os.path.join(table_path, "data")
    for vdir in os.listdir(data):
        for d in os.listdir(os.path.join(data, vdir)):
            if d.startswith("_bucket="):
                n = len([
                    f for f in os.listdir(os.path.join(data, vdir, d))
                    if f.endswith(".parquet")
                ])
                counts[d] = counts.get(d, 0) + n
    return counts


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_target_file_rows_splits_bucket_files(spark, tmp_table, mode):
    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode=mode,
                  target_file_rows=25)
    t.create(TRANSCRIPT_SCHEMA)
    rows = [("I", i, f"c{i % 40}", i // 40, "user", f"t{i}", None)
            for i in range(200)]
    t.apply_changes(_events(spark, rows), batch_id=0)
    counts = _bucket_file_counts(tmp_table)
    assert counts and all(n >= 2 for n in counts.values()), counts
    # readers, point reads, and footer lineage are file-count-agnostic
    assert t.read().count() == 200
    assert t.read_keys(["c7"]).count() == 5
    assert sum(
        e["n_changes"] for e in t.manifest()["lineage"].values()
    ) == 200


def test_target_file_rows_respected_by_compact(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode="mor",
                  compact_deltas=1000, target_file_rows=25)
    t.create(TRANSCRIPT_SCHEMA)
    for b in range(2):
        rows = [("I", b * 100 + i, f"c{i % 40}", b * 3 + i // 40, "user", "x", None)
                for i in range(100)]
        t.apply_changes(_events(spark, rows), batch_id=b)
    t.compact()
    data = os.path.join(tmp_table, "data")
    cdirs = [d for d in os.listdir(data) if d.endswith("-compact")]
    assert cdirs
    for d in os.listdir(os.path.join(data, cdirs[0])):
        if d.startswith("_bucket="):
            files = [f for f in os.listdir(os.path.join(data, cdirs[0], d))
                     if f.endswith(".parquet")]
            assert len(files) >= 2, (d, files)
    assert t.read().count() == 200


# ---------------------------------------------------------- cluster_by
def test_compact_cluster_by_lays_out_time_slices(spark, tmp_table):
    """compact(cluster_by='ts') rewrites every bucket ts-sorted, so with a
    file-row cap the files of one bucket carry non-overlapping ts spans —
    the layout a time-ranged scan prunes against."""
    import pyarrow.parquet as pq
    from pyspark.sql import Row
    import datetime as dt

    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode="mor",
                  target_file_rows=50)
    t.create(TRANSCRIPT_SCHEMA)
    base = dt.datetime(2020, 1, 1)
    rows = [
        Row(op="I", seq=i, conv_id=f"c{i % 20}", turn_idx=i // 20,
            role="user", text="x", tool=None,
            ts=base + dt.timedelta(hours=(i * 7919) % 400))  # shuffled ts
        for i in range(400)
    ]
    t.apply_changes(
        spark.createDataFrame(
            rows,
            "op string, seq long, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp",
        ),
        batch_id=0,
    )
    res = t.compact(cluster_by="ts")
    assert res["compacted"] == 2
    man = t.manifest()
    for e in man["buckets"].values():
        d = os.path.join(tmp_table, e["base"]["path"])
        spans = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min); maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        assert len(spans) >= 2, "file cap should split each bucket"
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, f"overlapping ts spans: {spans}"
    # correctness is untouched by the re-layout
    assert t.read().count() == 400
    assert t.read_range("2020-01-02", "2020-01-03").count() > 0


def test_compact_cluster_by_rejects_unknown_column(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError, match="cluster_by"):
        t.compact(cluster_by="nope")


# ------------------------------------------------------------ properties
def test_table_properties_roundtrip_and_survive_commits(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    assert t.properties() == {}
    t.set_property("owner", "data-eng")
    t.set_property("retention.days", "30")
    assert t.properties() == {"owner": "data-eng", "retention.days": "30"}
    # survive a data commit, a maintenance commit, and a reopen
    t.apply_changes(
        _events(spark, [("I", 1, "c1", 0, "user", "x", None)]), batch_id=0
    )
    t.compact()
    fresh = LakeTable(spark, tmp_table)
    assert fresh.properties()["owner"] == "data-eng"
    v = t.latest_version()
    assert t.unset_property("nope") == {"version": v, "properties": fresh.properties()}
    t.unset_property("owner")
    assert "owner" not in t.properties()
    ops = [h["operation"] for h in t.history()]
    assert ops.count("set_property") == 2 and ops.count("unset_property") == 1


# ------------------------------------------------- describe_detail
def test_describe_detail_reports_layout_and_skew(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.add_constraint("turn_nonneg", "turn_idx >= 0")
    t.set_property("owner", "pipeline")
    t.apply_changes(
        _events(spark, [("I", i + 1, f"c{i % 3}", i // 3, "user", "x" * 10, None)
                        for i in range(30)]),
        batch_id=0,
    )
    t.apply_changes(
        _events(spark, [("U", 100, "c0", 0, "user", "hot", None)]), batch_id=1
    )
    d = t.describe_detail()
    assert d["version"] == t.latest_version()
    assert d["merge_mode"] == "mor" and d["num_buckets"] == 4
    assert d["key_cols"] == ["conv_id", "turn_idx"]
    assert d["schema"]["turn_idx"] == "int" and d["schema"]["text"] == "string"
    assert d["properties"] == {"owner": "pipeline"}
    assert "turn_nonneg" in d["constraints"]
    # mor: both applies are delta appends (as-written rows, incl. the
    # superseding U); the longest chain signals compaction debt
    assert d["base_rows"] == 0 and d["delta_rows"] == 31
    assert d["max_delta_chain"] == 2
    assert d["populated_buckets"] >= 1
    assert d["num_files"] > 0 and d["size_bytes"] > 0
    assert 0 < d["max_bucket_row_share"] <= 1
    # driver-side only: a fresh reopen computes the same summary
    # (merge_mode is a handle choice, not table state — match it)
    assert LakeTable(spark, tmp_table, merge_mode="mor").describe_detail() == d
    # compaction folds the chains: rows land as live base rows
    t.compact()
    d2 = t.describe_detail()
    assert d2["base_rows"] == 30 and d2["delta_rows"] == 0
    assert d2["max_delta_chain"] == 0


# ------------------------------------------------- changes_since_ts
def test_changes_since_ts_bounds_by_commit_time(spark, tmp_table):
    import datetime as dt

    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    stamps = []
    for i in range(3):
        t.apply_changes(
            _events(spark, [("I", i + 1, f"c{i}", 0, "user", f"v{i}", None)]),
            batch_id=i,
        )
        stamps.append(t.manifest()["commit_ts"])
    # strictly-after semantics: bound at commit 1's ts → commits 2..3 only
    got = {r.conv_id for r in t.changes_since_ts(stamps[0]).collect()}
    assert got == {"c1", "c2"}
    # until_ts inclusive
    got = {
        r.conv_id
        for r in t.changes_since_ts(stamps[0], until_ts=stamps[1]).collect()
    }
    assert got == {"c1"}
    # predates the table → whole retained feed; datetime + ISO-string forms
    assert t.changes_since_ts(0.0).count() == 3
    # datetime + ISO-string forms (mid-gap bound: datetime carries only
    # microseconds, so an exact-commit-ts roundtrip can land a hair early)
    early = dt.datetime.fromtimestamp(stamps[0] + 1e-3, dt.timezone.utc)
    assert {r.conv_id for r in t.changes_since_ts(early).collect()} == {"c1", "c2"}
    assert t.changes_since_ts(early.isoformat()).count() == 2


# ---------------------------------------------------------- bloom_cols
def test_bloom_cols_writes_parquet_bloom_filters(spark, tmp_table):
    """bloom_cols adds parquet bloom filters at every bucket write: same
    data written with and without blooms differs by the filters' bytes
    (pyarrow doesn't expose bloom offsets, so the pin is the size delta +
    unchanged read/point-read results)."""
    rows = [("I", i, f"c{i}", 0, "user", f"text {i}", None)
            for i in range(20_000)]

    def build(path, **kw):
        t = LakeTable(spark, path, num_buckets=4, merge_mode="mor", **kw)
        t.create(TRANSCRIPT_SCHEMA)
        t.apply_changes(_events(spark, rows), batch_id=0)
        return t

    plain = build(tmp_table + "-plain")
    bloomy = build(tmp_table + "-bloom",
                   bloom_cols={"conv_id": 20_000, "text": 20_000})
    delta = (bloomy.describe_detail()["size_bytes"]
             - plain.describe_detail()["size_bytes"])
    assert delta > 50_000, delta  # 4 buckets x 2 cols of bloom bytes
    # read planes are unaffected
    assert bloomy.read().count() == plain.read().count() == 20_000
    assert bloomy.read_keys(["c7"]).first().text == "text 7"
    # maintenance rewrites keep writing blooms (compact goes through the
    # same shared write hook)
    before = bloomy.describe_detail()["size_bytes"]
    bloomy.compact()
    after = bloomy.describe_detail()["size_bytes"]
    assert after > 0.5 * before, (before, after)  # not silently bloomless


def test_changes_since_ts_expired_range_raises(spark, tmp_table):
    """a timestamp whose 'versions after it' can't be resolved completely
    (expired commit times) must raise, never silently truncate the feed."""
    from cdm_to_mods_spark.plans.lake import SnapshotExpiredError

    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    for i in range(3):
        t.apply_changes(
            _events(spark, [("I", i + 1, f"c{i}", 0, "user", "x", None)]),
            batch_id=i,
        )
    first_ts = t.history()[-1]["commit_ts"]
    t.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError, match="re-seed"):
        t.changes_since_ts(first_ts)
    # until_ts predating the first commit: empty feed, no error
    t2_path = tmp_table + "-fresh"
    t2 = LakeTable(spark, t2_path, num_buckets=4, merge_mode="mor")
    t2.create(TRANSCRIPT_SCHEMA)
    t2.apply_changes(
        _events(spark, [("I", 1, "c0", 0, "user", "x", None)]), batch_id=0
    )
    assert t2.changes_since_ts(0.0, until_ts=0.5).count() == 0


def test_format_version_fence(spark, tmp_table):
    """A manifest declaring a newer ledger format refuses to open; the
    current format (or a pre-versioned ledger with no field) opens fine."""
    import json
    import os

    from cdm_to_mods_spark.plans.lake import (
        FORMAT_VERSION,
        LakeTable,
        UnsupportedFormatVersionError,
    )
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable(spark, tmp_table, num_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    assert t.manifest()["format_version"] == FORMAT_VERSION
    # apply commits rebuild the manifest field-by-field — the version fence
    # must survive them (the bucket_fn-drop regression class)
    t.apply_changes(
        _events(spark, [("I", 1, "c1", 0, "user", "x", None)]),
        batch_id=0,
    )
    assert t.manifest()["format_version"] == FORMAT_VERSION
    LakeTable(spark, tmp_table)  # same version reopens

    ledger = os.path.join(tmp_table, "_ledger")
    vfile = os.path.join(
        ledger, sorted(f for f in os.listdir(ledger) if f.startswith("v"))[-1]
    )
    with open(vfile) as fh:
        man = json.load(fh)
    man["format_version"] = FORMAT_VERSION + 1
    with open(vfile, "w") as fh:
        json.dump(man, fh)
    with pytest.raises(UnsupportedFormatVersionError, match="upgrade the engine"):
        LakeTable(spark, tmp_table)

    # absent field = legacy format 1: opens
    del man["format_version"]
    with open(vfile, "w") as fh:
        json.dump(man, fh)
    assert LakeTable(spark, tmp_table).manifest().get("format_version") is None
