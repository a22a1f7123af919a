"""Streaming binlog tail into a time-partitioned table, plus the in-loop
maintain_every hook, plus the GLOBAL change-feed stream (lake_cdf over a
PartitionedTable: offsets are global versions, each batch expands to the
per-partition sub-spans its cuts pin, ``_version`` carries the GLOBAL
commit).

Differential oracle: the streaming tail over a PartitionedTable must
converge to the same state as the BATCH router applied the same events —
streaming is micro-batched delivery of the identical apply path, so any
divergence is a bug in the tail wiring (checkpointing, exactly-once
composition), never in partition semantics (tests/test_partitioned.py
owns those against the flat-table oracle)."""

from __future__ import annotations

import time as _t

import pytest

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches
from cdm_to_mods_spark.streaming.tail import StreamingReplay, resume_offsets

N_EVENTS, N_CONVS = 1500, 25


def _state(df):
    return {
        (r.conv_id, r.turn_idx, r.ts): (r.role, r.text, r.tool)
        for r in df.collect()
    }


def _batch_oracle(spark, tmp_path, merge_mode="mor"):
    """The same events through the batch router, one apply."""
    o = PartitionedTable(
        spark, str(tmp_path / "router-oracle"), num_buckets=8,
        merge_mode=merge_mode,
    )
    o.create(TRANSCRIPT_SCHEMA)
    o.apply_changes(
        synth_events(spark, N_EVENTS, N_CONVS, seed=42),
        batch_id=0,
        transform=apply_chain,
    )
    return o


def test_partitioned_tail_matches_batch_router(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, N_EVENTS, N_CONVS, n_batches=3,
                        seed=42)
    sr = StreamingReplay(
        spark, events_dir, str(tmp_path / "ptab"), str(tmp_path / "ckpt"),
        num_buckets=8, merge_mode="mor", partition_by="month",
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )
    table = sr.run_to_completion()
    assert isinstance(table, PartitionedTable)
    # multi-month synth timestamps actually exercised the router
    assert len(table.partitions()) > 1
    want = _state(_batch_oracle(spark, tmp_path).read())
    assert _state(table.read()) == want
    # per-micro-batch metrics flowed (router metrics shape)
    assert sr.batch_metrics
    assert all(
        "n_parts_touched" in m or m.get("skipped") for m in sr.batch_metrics
    )
    assert (tmp_path / "metrics.jsonl").exists()


def test_partitioned_tail_kill_and_resume(spark, tmp_path):
    """Exactly-once across restart: Spark redelivers the in-flight
    micro-batch, the router's GLOBAL ledger (plus each sub-table's batch
    ledger mid-fan-out) dedupes it."""
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table_path = str(tmp_path / "ptab")
    write_event_batches(spark, events_dir, N_EVENTS, N_CONVS, n_batches=4,
                        seed=42)

    sr1 = StreamingReplay(
        spark, events_dir, table_path, ckpt, num_buckets=8,
        merge_mode="mor", partition_by="month", max_files_per_trigger=1,
    )
    q = sr1.start(available_now=False)
    deadline = _t.monotonic() + 120
    while not resume_offsets(ckpt) and _t.monotonic() < deadline:
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    committed_before = len(resume_offsets(ckpt))
    assert committed_before >= 1
    assert sr1.table.read().count() > 0

    sr2 = StreamingReplay(
        spark, events_dir, table_path, ckpt, num_buckets=8,
        merge_mode="mor", partition_by="month",
    )
    table = sr2.run_to_completion()
    assert _state(table.read()) == _state(
        _batch_oracle(spark, tmp_path).read()
    )
    assert len(resume_offsets(ckpt)) > committed_before


def test_partitioned_tail_reopen_adopts_spec(spark, tmp_path):
    """A second tail on the same path must adopt the on-disk spec, not
    silently fork the layout with different constructor args."""
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 200, 5, n_batches=1, seed=1)
    StreamingReplay(
        spark, events_dir, str(tmp_path / "ptab"), str(tmp_path / "ck1"),
        partition_by="month",
    ).run_to_completion()
    with pytest.raises(ValueError, match="on-disk spec"):
        StreamingReplay(
            spark, events_dir, str(tmp_path / "ptab"), str(tmp_path / "ck2"),
            partition_by="day",
        )


def test_partition_by_refuses_stats_view(spark, tmp_path):
    # branch + partition_by COMPOSES now (global WAP tail — see
    # tests/test_partitioned_branches.py); only the flat-table-only
    # stats view remains refused
    with pytest.raises(ValueError, match="stats_view_path"):
        StreamingReplay(
            spark, str(tmp_path / "ev"), str(tmp_path / "t"),
            str(tmp_path / "ck"), partition_by="month",
            stats_view_path=str(tmp_path / "view"),
        )


def test_maintain_every_flat_folds_delta_chains(spark, tmp_path):
    """maintain_every runs the threshold scheduler between micro-batches:
    with inline compaction effectively off (compact_deltas high) and a
    max_delta_chain=1 policy, every tick folds the chains the batches
    just appended."""
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 600, 10, n_batches=3, seed=7)
    sr = StreamingReplay(
        spark, events_dir, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        num_buckets=4, merge_mode="mor", compact_deltas=100,
        max_files_per_trigger=1,
        maintain_every=1, maintain_policy={"max_delta_chain": 1},
    )
    table = sr.run_to_completion()
    ticked = [m["maintain"] for m in sr.batch_metrics if "maintain" in m]
    assert ticked and any(t["actions"] for t in ticked)
    man = table.manifest()
    assert all(len(e.get("deltas", [])) <= 1 for e in man["buckets"].values())


def test_maintain_every_partitioned_smoke(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 400, 8, n_batches=2, seed=3)
    sr = StreamingReplay(
        spark, events_dir, str(tmp_path / "ptab"), str(tmp_path / "ckpt"),
        num_buckets=4, merge_mode="mor", partition_by="month",
        compact_deltas=100, max_files_per_trigger=1,
        maintain_every=1, maintain_policy={"max_delta_chain": 1},
    )
    table = sr.run_to_completion()
    ticked = [m["maintain"] for m in sr.batch_metrics if "maintain" in m]
    # per-partition action lists; at least one partition folded
    assert ticked and any(any(acts) for t in ticked for acts in t.values())
    assert _state(table.read())  # table still reads fine post-maintenance


def test_maintain_every_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="maintain_every"):
        StreamingReplay(
            spark, str(tmp_path / "ev"), str(tmp_path / "t"),
            str(tmp_path / "ck"), maintain_every=0,
        )


# --------------------------- global change-feed stream (lake_cdf)


import datetime as dt  # noqa: E402

from cdm_to_mods_spark.plans.lake import LakeTable  # noqa: E402
from cdm_to_mods_spark.streaming.source import (  # noqa: E402
    mirror_stream,
    register_lake_cdf,
)

DDL = ("op string, seq long, conv_id string, turn_idx int, role string, "
       "text string, tool string, ts timestamp")


def _mts(month):
    return dt.datetime(2025, month, 5, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _drain(spark, path, ck, **opts):
    register_lake_cdf(spark)
    reader = spark.readStream.format("lake_cdf").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    rows: list = []
    q = (
        reader.load().writeStream
        .foreachBatch(lambda d, b: rows.extend(d.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return rows


def test_partitioned_cdf_stream_matches_batch_feed(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _mts(2)),
    ]), batch_id=0)
    t.apply_changes(_ev(spark, [
        ("U", 3, "c1", 0, "user", "jan2", None, _mts(1)),
        ("D", 4, "c2", 0, None, None, None, _mts(2)),
    ]), batch_id=1)
    got = {
        (r.conv_id, r.text, r._deleted, r._version)
        for r in _drain(spark, t.path, str(tmp_path / "ck"))
    }
    want = {
        (r.conv_id, r.text, r["_deleted"], r["_version"])
        for r in t.changes(0, with_version=True).collect()
    }
    assert got == want
    assert {v for (_, _, _, v) in got} == {1, 2}  # GLOBAL attribution


def test_partitioned_stream_sees_new_partition_mid_stream(spark, tmp_path):
    """A new month appearing between micro-batches is pinned lazily —
    no restart needed (the partition object ships its own schema state)."""
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
    ]), batch_id=0)
    ck = str(tmp_path / "ck")
    first = _drain(spark, t.path, ck)
    assert {r.conv_id for r in first} == {"c1"}
    t.apply_changes(_ev(spark, [
        ("I", 2, "c9", 0, "user", "june", None, _mts(6)),
    ]), batch_id=1)
    second = _drain(spark, t.path, ck)  # same checkpoint: tail only
    assert {(r.conv_id, r.text) for r in second} == {("c9", "june")}


def test_partitioned_mirror_converges_including_moves(spark, tmp_path):
    src = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                           merge_mode="mor", cross_partition_upsert=True,
                           index_buckets=4)
    src.create(TRANSCRIPT_SCHEMA)
    src.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _mts(2)),
    ]), batch_id=0)
    src.apply_changes(_ev(spark, [
        ("U", 3, "c1", 0, "user", "moved", None, _mts(3)),  # cross-part move
    ]), batch_id=1)
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4,
                    merge_mode="mor")
    dst.create(TRANSCRIPT_SCHEMA)
    q = mirror_stream(spark, src.path, dst, str(tmp_path / "mck"))
    q.awaitTermination(180)
    key = lambda df: sorted(  # noqa: E731
        (r.conv_id, r.turn_idx, r.text) for r in df.collect()
    )
    assert key(dst.read()) == key(src.read())


def test_partitioned_row_changes_stream(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
    ]), batch_id=0)
    t.apply_changes(_ev(spark, [
        ("U", 2, "c1", 0, "user", "jan2", None, _mts(1)),
    ]), batch_id=1)
    rows = _drain(spark, t.path, str(tmp_path / "ck"), mode="row_changes")
    got = sorted((r._change_type, r.text, r._version) for r in rows)
    assert got == [
        ("insert", "jan", 1),
        ("update_postimage", "jan2", 2),
        ("update_preimage", "jan", 2),
    ]


def test_partitioned_stream_refuses_initial_snapshot(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
    ]), batch_id=0)
    register_lake_cdf(spark)
    with pytest.raises(Exception, match="initialSnapshot"):
        (spark.readStream.format("lake_cdf")
         .option("path", t.path)
         .option("initialSnapshot", "true")
         .load()
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start()
         .awaitTermination(120))


def test_partitioned_stream_fails_loud_across_drop(spark, tmp_path):
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _mts(2)),
    ]), batch_id=0)
    t.drop_partition("2025-01")
    with pytest.raises(Exception, match="drop_partition"):
        _drain(spark, t.path, str(tmp_path / "ck"))


def test_partitioned_stream_earliest_after_expiry(spark, tmp_path):
    """Default startingVersion='earliest' must serve the retained feed
    after expire_snapshots: the earliest retained GLOBAL cut is the
    baseline and the stream starts strictly after it."""
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    for i in range(3):
        t.apply_changes(_ev(spark, [
            ("I", i + 1, f"c{i}", 0, "user", f"v{i}", None, _mts(1 + i)),
        ]), batch_id=i)
    t.expire_snapshots(keep_last=2)  # earliest retained cut = baseline
    rows = _drain(spark, t.path, str(tmp_path / "ck"))
    # only the changes AFTER the earliest retained cut stream
    assert {(r.conv_id, r.text) for r in rows} == {("c2", "v2")}


def test_partitioned_stream_schema_union_prefers_wider(spark, tmp_path):
    """One partition implicitly widened turn_idx to long; the stream's
    pinned union schema must be long even though a later-sorted partition
    still holds int (a narrowing pin would fail the Arrow cast)."""
    from pyspark.sql import functions as F, types as T

    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _mts(2)),
    ]), batch_id=0)
    widened = _ev(spark, [
        ("U", 3, "c1", 0, "user", "jan2", None, _mts(1)),
    ]).withColumn("turn_idx", F.col("turn_idx").cast("long"))
    t.apply_changes(widened, batch_id=1)  # widens 2025-01 only
    rows = _drain(spark, t.path, str(tmp_path / "ck"))
    assert {(r.conv_id, r.text) for r in rows} >= {("c1", "jan2"),
                                                   ("c2", "feb")}
    # the pinned union type is the wide one
    register_lake_cdf(spark)
    sch = (spark.readStream.format("lake_cdf")
           .option("path", t.path).load().schema)
    assert isinstance(sch["turn_idx"].dataType, T.LongType)


def test_partitioned_stream_unions_widened_type_across_partitions(
    spark, tmp_path
):
    """A column widened in ONE partition (long→double via per-sub DDL)
    must pin the WIDER type in the stream's union schema under the
    engine's own lattice (schemas.widen_type) — the pre-fix rank table
    treated long/double as equal rank, pinned whichever partition sorted
    first, and the widened partition then failed the evolution marker on
    EVERY restart (a permanently wedged stream)."""
    from pyspark.sql import functions as F

    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "jan", None, _mts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _mts(2)),
    ]), batch_id=0)
    t.add_column("n", "long")
    # diverge: feb's n widens to double; jan (sorts FIRST) stays long
    t.part("2025-02").widen_column("n", "double")
    t.apply_changes(
        _ev(spark, [
            ("U", 3, "c1", 0, "user", "jan2", None, _mts(1)),
            ("U", 4, "c2", 0, "user", "feb2", None, _mts(2)),
        ]).withColumn("n", F.lit(7).cast("long")),
        batch_id=1,
    )
    rows = _drain(spark, t.path, str(tmp_path / "ck"))
    assert {r.conv_id for r in rows} == {"c1", "c2"}
    feb = [r for r in rows if r.conv_id == "c2" and r.n is not None]
    assert feb and all(isinstance(r.n, float) for r in feb)
    jan = [r for r in rows if r.conv_id == "c1" and r.n is not None]
    assert jan and all(isinstance(r.n, float) for r in jan)  # up-cast


def test_partitioned_stream_earliest_skips_pinned_islands(spark, tmp_path):
    """Retention pins tagged cuts, so the ledger can hold an ISLAND below
    an expired gap ({1, 3, 4} after a tag on 1 and keep_last=2).
    startingVersion='earliest' (the default) must start at the CONTIGUOUS
    retained tail — the pre-fix raw minimum walked the gap on first
    planning and wedged every fresh checkpoint with the re-seed error."""
    t = PartitionedTable(spark, str(tmp_path / "src"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    for b, (conv, month) in enumerate(
        [("c1", 1), ("c2", 2), ("c3", 3), ("c4", 4)]
    ):
        t.apply_changes(_ev(spark, [
            ("I", b + 1, conv, 0, "user", f"m{month}", None, _mts(month)),
        ]), batch_id=b)
    t.tag("keep", 1)
    t.expire_snapshots(keep_last=2)
    from cdm_to_mods_spark.streaming.source import _g_versions

    kept = _g_versions(t.path)
    assert 1 in kept and kept[-2:] == [3, 4] and 2 not in kept  # island
    rows = _drain(spark, t.path, str(tmp_path / "ck"))
    # the contiguous tail {3,4} starts the stream at 3: exactly v4's rows
    assert {(r.conv_id, r._version) for r in rows} == {("c4", 4)}
