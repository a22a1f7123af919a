"""Incremental materialized view: per-refresh state must equal a full
recompute from the table snapshot, across inserts, updates, deletes and a
whole-conversation tombstone."""

from __future__ import annotations

import pandas as pd

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.incremental import ConversationStatsView
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _full_recompute(table) -> pd.DataFrame:
    return (
        ConversationStatsView._agg(table.read())
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _view_state(view) -> pd.DataFrame:
    return view.read().toPandas().sort_values("conv_id").reset_index(drop=True)


def test_incremental_view_tracks_full_recompute(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    view = ConversationStatsView(spark, t, str(tmp_path / "view"))

    # batch 0: inserts across 3 conversations
    rows0 = [("I", i, f"c{i % 3}", i // 3, ["user", "assistant"][i % 2],
              f"t{i}", None, "2001-02-03", None) for i in range(12)]
    t.apply_changes(spark.createDataFrame(rows0, EVENT_DDL), batch_id=0,
                    transform=apply_chain)
    r0 = view.refresh()
    assert r0["refreshed"] and view.applied_version() == t.latest_version()
    pd.testing.assert_frame_equal(_view_state(view), _full_recompute(t),
                                  check_dtype=False)

    # batch 1: updates to c0, new conversation c9
    rows1 = [("U", 100, "c0", 0, "system", "upd", None, "2005-05-05", None),
             ("I", 101, "c9", 0, "user", "new", None, "2006-06-06", None)]
    t.apply_changes(spark.createDataFrame(rows1, EVENT_DDL), batch_id=1,
                    transform=apply_chain)
    r1 = view.refresh()
    assert r1["touched_groups"] == 2
    pd.testing.assert_frame_equal(_view_state(view), _full_recompute(t),
                                  check_dtype=False)

    # batch 2: tombstone ALL of c9 → it must vanish from the view
    rows2 = [("D", 200, "c9", 0, None, None, None, None, None)]
    t.apply_changes(spark.createDataFrame(rows2, EVENT_DDL), batch_id=2,
                    transform=apply_chain)
    view.refresh()
    got = _view_state(view)
    assert "c9" not in set(got["conv_id"])
    pd.testing.assert_frame_equal(got, _full_recompute(t), check_dtype=False)

    # no new source version → no-op
    assert view.refresh() == {"refreshed": False,
                              "source_version": t.latest_version()}


def test_streaming_tail_refreshes_view_per_batch(spark, tmp_path):
    """End-to-end CDC: binlog tail -> MERGE -> change feed -> materialized
    view, advanced inside each micro-batch; final view equals a full
    recompute of the converged table."""
    from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 1500, 25, n_batches=3, seed=42)
    sr = StreamingReplay(
        spark,
        events_dir,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        merge_mode="mor",
        stats_view_path=str(tmp_path / "view"),
    )
    table = sr.run_to_completion()
    assert sr.view.applied_version() == table.latest_version()
    got = _view_state(sr.view)
    want = _full_recompute(table)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert any("view" in m for m in sr.batch_metrics)


def test_wide_batch_uses_key_join_not_driver_list(spark, tmp_path):
    """A batch touching more groups than point_read_threshold must refresh
    via the distributed semi/anti key joins: correct state, strategy
    reported, and no driver-compiled In-list in the splice plan."""
    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    view = ConversationStatsView(spark, t, str(tmp_path / "view"),
                                 point_read_threshold=5)

    rows0 = [("I", i, f"c{i % 20}", i // 20, "user", f"t{i}", None,
              "2001-02-03", None) for i in range(60)]
    t.apply_changes(spark.createDataFrame(rows0, EVENT_DDL), batch_id=0,
                    transform=apply_chain)
    assert view.refresh()["strategy"] == "full"

    # touch 18 of 20 conversations (> threshold 5) + one new conversation
    rows1 = [("U", 1000 + i, f"c{i}", 0, "system", "upd", None,
              "2005-05-05", None) for i in range(18)]
    rows1.append(("I", 2000, "c99", 0, "user", "new", None, "2006-06-06", None))
    t.apply_changes(spark.createDataFrame(rows1, EVENT_DDL), batch_id=1,
                    transform=apply_chain)
    r = view.refresh()
    assert r["strategy"] == "key_join"
    assert r["touched_groups"] == 19
    pd.testing.assert_frame_equal(_view_state(view), _full_recompute(t),
                                  check_dtype=False)

    # small follow-up batch drops back to the bucket-pruned point read
    rows2 = [("U", 3000, "c0", 0, "tool", "again", None, "2007-07-07", None)]
    t.apply_changes(spark.createDataFrame(rows2, EVENT_DDL), batch_id=2,
                    transform=apply_chain)
    r2 = view.refresh()
    assert r2["strategy"] == "point_read" and r2["touched_groups"] == 1
    pd.testing.assert_frame_equal(_view_state(view), _full_recompute(t),
                                  check_dtype=False)


def test_view_reseeds_after_feed_retention_expired(spark, tmp_path):
    """A view lagging past the source's snapshot retention gets
    SnapshotExpiredError from changes(); refresh() must fall back to the
    full rebuild (the error's own 're-seed from a snapshot read' contract)
    instead of wedging every subsequent refresh."""
    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_ev(spark, [
        ("I", 1, "c1", 0, "user", "a", None, None, None),
        ("I", 2, "c2", 0, "user", "b", None, None, None),
    ]), batch_id=0)
    view = ConversationStatsView(spark, t, str(tmp_path / "view"))
    assert view.refresh()["refreshed"]
    # source advances twice, then retention drops the feed range
    t.apply_changes(_ev(spark, [
        ("U", 3, "c1", 0, "user", "a2", None, None, None),
    ]), batch_id=1)
    t.apply_changes(_ev(spark, [
        ("I", 4, "c3", 0, "user", "c", None, None, None),
    ]), batch_id=2)
    t.expire_snapshots(keep_last=1)
    res = view.refresh()
    assert res["strategy"] == "reseed_full" and res["refreshed"]
    pd.testing.assert_frame_equal(_view_state(view), _full_recompute(t))


def test_generic_view_streams_via_maintain_view_stream(spark, tmp_path):
    """GenericAdditiveView (the CREATE MATERIALIZED VIEW engine) rides
    the same streaming retract topology as the built-in stats view —
    apply_delta/applied_version are inherited, so maintain_view_stream
    folds each micro-batch additively."""
    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.streaming.source import maintain_view_stream

    t = LakeTable(spark, str(tmp_path / "gvs"), num_buckets=2,
                  merge_mode="mor", changelog="lookup")
    t.create(TRANSCRIPT_SCHEMA)
    ev = ("op string, seq long, conv_id string, turn_idx int, "
          "role string, text string, tool string")
    t.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "abc", None),
         ("I", 2, "c2", 0, "user", "d", None)], ev), batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "view"), ["role"],
        [("n", "count", None), ("chars", "sum", "length(text)")],
    )
    view.refresh()  # seed
    t.apply_changes(spark.createDataFrame(
        [("U", 3, "c2", 0, "user", "ddd", None),
         ("I", 4, "c3", 0, "tool", "zz", None)], ev), batch_id=1)
    q = maintain_view_stream(spark, view, str(tmp_path / "ck"))
    q.awaitTermination(120)
    rows = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows == {"user": (2, 6.0), "tool": (1, 2.0)}


def test_plain_cdf_view_refreshes_incrementally(spark, tmp_path):
    """Round 4: a materialized view over a PLAIN-cdf mor source (no
    changelog='lookup') refreshes incrementally via the refresh-time
    pre-image lookup — strategy 'lookup_retract' — instead of paying a
    full reseed, and its state still tracks the recompute exactly across
    update + insert + delete."""
    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable(spark, str(tmp_path / "plain"), num_buckets=2,
                  merge_mode="mor")  # NO changelog
    t.create(TRANSCRIPT_SCHEMA)
    ev = ("op string, seq long, conv_id string, turn_idx int, "
          "role string, text string, tool string")
    t.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "abc", None),
         ("I", 2, "c1", 1, "assistant", "wxyz", None),
         ("I", 3, "c2", 0, "user", "d", None)], ev), batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "view"), ["role"],
        [("n", "count", None), ("chars", "sum", "length(text)")],
    )
    assert view.refresh()["strategy"] == "full"
    t.apply_changes(spark.createDataFrame(
        [("U", 4, "c1", 0, "user", "abcde", None),      # update: 3→5 chars
         ("I", 5, "c3", 0, "tool", "zz", None),          # insert
         ("D", 6, "c1", 1, None, None, None)], ev),      # delete
        batch_id=1)
    res = view.refresh()
    assert res["strategy"] == "lookup_retract", res
    rows = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows == {"user": (2, 6.0), "tool": (1, 2.0)}
    # noop range: maintenance-only commit advances the marker cheaply
    t.compact()
    assert view.refresh()["strategy"] == "noop"
    # a touched-set past the cost threshold falls back to reseed (and
    # stays correct) — round 5: flat sources decide by BUCKET fraction,
    # so force the fraction rule to bite
    t.apply_changes(spark.createDataFrame(
        [("U", 7, "c2", 0, "user", "ddd", None)], ev), batch_id=2)
    view._LOOKUP_BUCKET_FRAC = -1.0
    view._LOOKUP_MIN_BUCKETS = 0
    res2 = view.refresh()
    assert res2["strategy"] == "reseed_full"
    rows2 = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows2 == {"user": (2, 8.0), "tool": (1, 2.0)}


def test_plain_cdf_lookup_survives_schema_evolution_in_range(spark,
                                                             tmp_path):
    """Review finding (round 4): a schema evolution INSIDE the refresh
    range makes the pre-image read (old version, old schema) and the
    post-image read differ in columns — the union must null-fill, not
    crash the refresh; sums over the new column count only post rows."""
    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable(spark, str(tmp_path / "pse"), num_buckets=2,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    ev = ("op string, seq long, conv_id string, turn_idx int, "
          "role string, text string, tool string")
    t.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "abc", None)], ev), batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "v"), ["role"],
        [("n", "count", None)],
    )
    view.refresh()
    # batch with a NEW column lands inside the refresh range
    t.apply_changes(spark.createDataFrame(
        [("U", 2, "c1", 0, "user", "abcd", None, 7),
         ("I", 3, "c2", 0, "tool", "zz", None, 9)],
        ev + ", score int"), batch_id=1)
    res = view.refresh()
    assert res["strategy"] == "lookup_retract", res
    rows = {r.role: r.n for r in view.read().collect()}
    assert rows == {"user": 1, "tool": 1}


def test_lookup_fold_many_keys_few_buckets_stays_incremental(spark, tmp_path):
    """Round 5 (cost-based reseed decision): a refresh range touching far
    MORE conversations than the old 4096-key cap — but concentrated in a
    small fraction of the table's buckets — must still take the
    'lookup_retract' path: the cost driver is touched buckets, not key
    count. The touched set here is ~5k conversations that all hash into
    <=13 of 64 buckets (selected by the engine's own bucket expression),
    against a 40k-conversation table."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.plans.lake import LakeTable, _bucket_expr
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable(spark, str(tmp_path / "big"), num_buckets=64,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    base = spark.range(40_000).select(
        F.lit("I").alias("op"),
        F.col("id").cast("long").alias("seq"),
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("abc").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t.apply_changes(base, batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "view"), ["role"],
        [("n", "count", None), ("chars", "sum", "length(text)")],
    )
    assert view.refresh()["strategy"] == "full"
    # updates to EVERY conversation in buckets 0..12 (~20% of 64): well
    # past the old key cap, well under the bucket-fraction threshold
    upd = base.filter(
        _bucket_expr("conv_id", 64, "hash32") < 13
    ).withColumn("op", F.lit("U")).withColumn(
        "seq", F.col("seq") + F.lit(100_000)
    ).withColumn("text", F.lit("abcdef"))
    n_touched = upd.count()
    assert n_touched > 4096, n_touched  # the shape the old cap reseeded
    t.apply_changes(upd, batch_id=1)
    res = view.refresh()
    assert res["strategy"] == "lookup_retract", res
    rows = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows == {"user": (40_000, 3.0 * (40_000 - n_touched) + 6.0 * n_touched)}


def test_lookup_fold_reseeds_past_bucket_fraction(spark, tmp_path):
    """The flip side: a range touching MOST buckets of a
    >=_LOOKUP_MIN_BUCKETS table reseeds (two full-table point reads would
    cost more than one re-aggregate), and the state stays exact."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    t = LakeTable(spark, str(tmp_path / "wide"), num_buckets=8,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    base = spark.range(2_000).select(
        F.lit("I").alias("op"),
        F.col("id").cast("long").alias("seq"),
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("ab").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    t.apply_changes(base, batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "view"), ["role"],
        [("n", "count", None), ("chars", "sum", "length(text)")],
    )
    assert view.refresh()["strategy"] == "full"
    t.apply_changes(  # touches every bucket
        base.withColumn("op", F.lit("U"))
        .withColumn("seq", F.col("seq") + F.lit(10_000))
        .withColumn("text", F.lit("abcd")),
        batch_id=1,
    )
    res = view.refresh()
    assert res["strategy"] == "reseed_full", res
    rows = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows == {"user": (2_000, 8_000.0)}


def test_lookup_fold_reseeds_when_applied_snapshot_expired(spark, tmp_path):
    """The view's APPLIED snapshot itself can be expired while the feed
    range (applied, head] stays fully retained: changes() succeeds but
    the lookup fold's pre-image reads open the deleted v{applied}
    manifest — FileNotFoundError, which must reseed like every other
    retention failure instead of wedging refresh() (pre-fix it
    propagated and every restart re-failed)."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.incremental import GenericAdditiveView
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

    ev = ("op string, seq long, conv_id string, turn_idx int, "
          "role string, text string, tool string")
    t = LakeTable(spark, str(tmp_path / "exp"), num_buckets=4,
                  merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "abc", None),
         ("I", 2, "c2", 0, "user", "d", None)], ev), batch_id=0)
    view = GenericAdditiveView(
        spark, t, str(tmp_path / "view"), ["role"],
        [("n", "count", None), ("chars", "sum", "length(text)")],
    )
    view.refresh()  # applied = v1
    t.apply_changes(spark.createDataFrame(
        [("U", 3, "c2", 0, "user", "dd", None)], ev), batch_id=1)
    t.apply_changes(spark.createDataFrame(
        [("I", 4, "c3", 0, "tool", "z", None)], ev), batch_id=2)
    t.expire_snapshots(keep_last=2)  # v1 (applied) gone; feed (1,3] kept
    res = view.refresh()
    assert res["refreshed"], res
    rows = {r.role: (r.n, r.chars) for r in view.read().collect()}
    assert rows == {"user": (2, 5.0), "tool": (1, 1.0)}
