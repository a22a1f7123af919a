"""Capstone integration: the full CDC deployment lifecycle in one test —
snapshot bootstrap → constrained, quarantined streaming catch-up over an
overlapping binlog → incremental view → quarantine repair → sort-order
re-layout → snapshot expiry — converging exactly to a from-scratch replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.events import write_events
from cdm_to_mods_spark.sources.synth import synth_events
from cdm_to_mods_spark.streaming.tail import StreamingReplay

N, SNAP_AT, TAIL_FROM = 3000, 1800, 1500  # overlap: (1500, 1800]


def test_full_deployment_lifecycle(spark, tmp_path):
    events = synth_events(spark, N, 50, seed=21)

    # oracle: one clean from-scratch replay of the whole log
    oracle = LakeTable(spark, str(tmp_path / "oracle"), num_buckets=8,
                       merge_mode="mor")
    oracle.create(TRANSCRIPT_SCHEMA)
    oracle.apply_changes(events, batch_id=0, transform=apply_chain)

    # the binlog on disk: full log PLUS two poison null-key rows in the
    # tail window (a real feed carries garbage; the replay must not abort)
    poison = spark.createDataFrame(
        [("I", N + 1, None, 0, "user", "orphan-a", None, None, None),
         ("I", N + 2, None, 1, "user", "orphan-b", None, None, None)],
        "op string, seq long, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts_raw string, ingest_ts timestamp",
    )
    write_events(events.unionByName(poison), str(tmp_path / "binlog"))

    # day 0: bulk-load a snapshot consistent with seq <= SNAP_AT
    pre = LakeTable(spark, str(tmp_path / "pre"), num_buckets=8,
                    merge_mode="mor")
    pre.create(TRANSCRIPT_SCHEMA)
    pre.apply_changes(events.filter(f"seq <= {SNAP_AT}"), batch_id=0,
                      transform=apply_chain)
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.bootstrap(pre.read(), snapshot_seq=SNAP_AT)

    # contract: the transform chain only emits authorized roles
    t.add_constraint(
        "role_ok", "role is null or role in ('user','assistant','system','tool')"
    )

    # day 1+: tail the binlog from BEFORE the snapshot point (overlap is
    # safe), quarantining the poison rows, maintaining the stats view
    replay = StreamingReplay(
        spark, str(tmp_path / "binlog"), str(tmp_path / "t"),
        str(tmp_path / "ckpt"), num_buckets=8, merge_mode="mor",
        transform=apply_chain, min_seq=TAIL_FROM,
        quarantine_path=str(tmp_path / "dead"),
        stats_view_path=str(tmp_path / "view"),
    )
    out = replay.run_to_completion(timeout_sec=300)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert out.read().select(cols).exceptAll(
        oracle.read().select(cols)).count() == 0
    assert oracle.read().select(cols).exceptAll(
        out.read().select(cols)).count() == 0
    assert spark.read.parquet(str(tmp_path / "dead")).count() == 2
    # the view converged with the table
    view = replay.view.read()
    assert view.count() == out.read().select("conv_id").distinct().count()

    # day 2 ops: repair the dead letters, re-admit, re-layout, expire
    res = out.reprocess_quarantine(
        lambda q: q.withColumn(
            "conv_id",
            F.concat(F.lit("recovered-"), F.col("turn_idx").cast("string")),
        ),
        batch_id=10_000, transform=apply_chain,
    )
    assert res["n_events"] == 2 and res["n_quarantined"] == 0
    assert out.read().filter("conv_id like 'recovered-%'").count() == 2

    out.compact(cluster_by="ts")
    out.expire_snapshots(keep_last=1)
    assert out.read().count() == oracle.read().count() + 2

    ops = [h["operation"] for h in out.history()]
    assert ops == ["compact"]  # expiry kept only the re-layout head
    # ...but the retained head still carries the full live state
    assert out.read_range("1900-01-01", "2100-01-01").count() > 0
