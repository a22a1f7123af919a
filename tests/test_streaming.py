"""Streaming tail: backlog replay, kill-and-resume from checkpoint,
idempotence across restart, late-arriving segments."""

from __future__ import annotations

import pandas as pd

from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches
from cdm_to_mods_spark.streaming.tail import StreamingReplay, resume_offsets
from tests.oracle import replay_oracle

N_EVENTS, N_CONVS = 2000, 30


def _final(table) -> pd.DataFrame:
    return (
        table.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def test_stream_replay_matches_oracle(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, N_EVENTS, N_CONVS, n_batches=4, seed=42)
    events_pdf = synth_events(spark, N_EVENTS, N_CONVS, seed=42).toPandas()

    sr = StreamingReplay(
        spark,
        events_dir,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        metrics_path=str(tmp_path / "metrics.jsonl"),
    )
    table = sr.run_to_completion()
    want = replay_oracle(events_pdf)
    got = _final(table)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # per-micro-batch metrics were emitted
    assert sr.batch_metrics and all("events_per_sec" in m or m.get("skipped") for m in sr.batch_metrics)
    assert (tmp_path / "metrics.jsonl").exists()


def test_stream_replay_mor_matches_oracle(spark, tmp_path):
    """Merge-on-read under the streaming tail: same convergence, with
    compaction firing mid-stream (compact_deltas < n segments)."""
    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, N_EVENTS, N_CONVS, n_batches=6, seed=42)
    events_pdf = synth_events(spark, N_EVENTS, N_CONVS, seed=42).toPandas()

    sr = StreamingReplay(
        spark,
        events_dir,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        merge_mode="mor",
    )
    sr.table.compact_deltas = 3
    table = sr.run_to_completion()
    pd.testing.assert_frame_equal(
        _final(table), replay_oracle(events_pdf), check_dtype=False
    )
    man = table.manifest()
    assert all(len(e["deltas"]) < 3 for e in man["buckets"].values())


def test_kill_and_resume_from_checkpoint(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table_path = str(tmp_path / "table")
    write_event_batches(spark, events_dir, N_EVENTS, N_CONVS, n_batches=4, seed=42)

    # phase 1: process only part of the backlog (1 file per trigger, stop
    # after the first micro-batch commits) — the "kill" mid-replay.
    sr1 = StreamingReplay(
        spark, events_dir, table_path, ckpt, num_buckets=8, max_files_per_trigger=1
    )
    import time as _t

    q = sr1.start(available_now=False)
    # Poll the actual postcondition — a committed checkpoint offset file —
    # not batch_metrics: Spark writes commits/ AFTER foreachBatch returns,
    # so stopping on batch_metrics can race the commit write.
    deadline = _t.monotonic() + 120
    while not resume_offsets(ckpt) and _t.monotonic() < deadline:
        _t.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    committed_before = len(resume_offsets(ckpt))
    assert committed_before >= 1
    partial_rows = sr1.table.read().count()
    assert 0 < partial_rows

    # phase 2: restart with the same checkpoint — continues from committed
    # offsets, re-delivered batches are skipped by the ledger.
    sr2 = StreamingReplay(spark, events_dir, table_path, ckpt, num_buckets=8)
    table = sr2.run_to_completion()
    want = replay_oracle(synth_events(spark, N_EVENTS, N_CONVS, seed=42).toPandas())
    got = _final(table)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(resume_offsets(ckpt)) > committed_before


def test_late_segment_arrival(spark, tmp_path):
    """New binlog segments landing after a first replay are picked up by a
    second run over the same checkpoint (the continuous-tail contract)."""
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table_path = str(tmp_path / "table")

    all_events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    from pyspark.sql import functions as F

    all_events.filter(F.col("seq") < 1000).write.parquet(f"{events_dir}/seg-0")
    sr = StreamingReplay(spark, events_dir, table_path, ckpt, num_buckets=8)
    sr.run_to_completion()

    all_events.filter(F.col("seq") >= 1000).write.parquet(f"{events_dir}/seg-1")
    sr2 = StreamingReplay(spark, events_dir, table_path, ckpt, num_buckets=8)
    table = sr2.run_to_completion()

    want = replay_oracle(all_events.toPandas())
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_stateful_out_of_order_audit(spark, tmp_path):
    """applyInPandasWithState audit: events whose seq does not exceed the
    per-(conv_id, turn_idx) running max from PRIOR batches (i.e. what the
    MERGE seq-guard rejects) are emitted, with state carried across
    micro-batches; a different turn's interleaved seqs must NOT trigger a
    false positive."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.schemas import EVENT_SCHEMA
    from cdm_to_mods_spark.streaming.stateful import out_of_order_audit

    events_dir = str(tmp_path / "events")
    rows1 = [("I", s, "cA", 0, "user", f"t{s}", None, None, None) for s in (1, 5, 9)]
    rows1 += [("I", s, "cB", 0, "user", f"t{s}", None, None, None) for s in (2, 4)]
    rows2 = [("U", 3, "cA", 0, "user", "late", None, None, None),   # late: 3 <= 9
             ("U", 12, "cA", 0, "user", "ok", None, None, None),
             ("U", 4, "cB", 0, "user", "dup", None, None, None),    # late: 4 <= 4
             # turn 1 of cA at seq 6 < turn 0's max 9: the guard is
             # per-(conv, turn), so this must NOT be flagged
             ("I", 6, "cA", 1, "user", "new turn", None, None, None)]
    ddl = ("op string, seq long, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts_raw string, ingest_ts timestamp")
    spark.createDataFrame(rows1, ddl).coalesce(1).write.parquet(f"{events_dir}/seg-0")
    spark.createDataFrame(rows2, ddl).coalesce(1).write.parquet(f"{events_dir}/seg-1")

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    out_dir, ckpt = str(tmp_path / "audit"), str(tmp_path / "ckpt")
    q = (
        out_of_order_audit(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx, r.seq)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {("cA", 0, 3), ("cB", 0, 4)}


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Tumbling event-time windows with a watermark over the binlog tail:
    append mode emits a window once the watermark passes it; a too-late
    event (behind the watermark) is dropped from the metric stream."""
    from cdm_to_mods_spark.schemas import EVENT_SCHEMA
    from cdm_to_mods_spark.streaming.windows import windowed_event_counts

    events_dir = str(tmp_path / "events")
    ddl = ("op string, seq long, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts_raw string, ingest_ts timestamp")
    import datetime as dt
    t = lambda m, s=0: dt.datetime(2026, 1, 1, 10, m, s)  # noqa: E731
    import time as _time
    seg0 = [("I", 1, "cA", 0, None, None, None, None, t(0, 10)),
            ("I", 2, "cA", 1, None, None, None, None, t(0, 40)),
            ("U", 3, "cB", 0, None, None, None, None, t(1, 10))]
    seg1 = [("I", 4, "cC", 0, None, None, None, None, t(30))]  # advances watermark
    seg2 = [("I", 6, "cC", 1, None, None, None, None, t(31))]
    # the late-row filter uses the PREVIOUS batch's watermark, so the
    # too-late event must arrive two batches after the watermark advanced
    seg3 = [("U", 5, "cB", 1, None, None, None, None, t(0, 50))]  # dropped
    for i, seg in enumerate((seg0, seg1, seg2, seg3)):
        spark.createDataFrame(seg, ddl).coalesce(1).write.parquet(f"{events_dir}/seg-{i}")
        _time.sleep(1.1)  # distinct mtimes -> deterministic trigger order

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    out_dir, ckpt = str(tmp_path / "win"), str(tmp_path / "ckpt")
    q = (
        windowed_event_counts(stream, window="1 minute", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.minute, r.op): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    # windows 10:00 and 10:01 are closed by the 10:30/10:31 events;
    # the late seg-1 event for 10:00 was behind the watermark -> not counted.
    assert got[(0, "I")] == 2
    assert got[(1, "U")] == 1
    assert (0, "U") not in got


def test_streaming_tail_maintains_sliding_view(spark, tmp_path):
    """Tail with a sliding ingest-metrics view: per-batch additive slice
    folding (exactly-once by batch_id) composes to the same windows as a
    full recompute over the whole event log."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    events_dir = str(tmp_path / "events")
    write_event_batches(spark, events_dir, 1200, 20, n_batches=3, seed=11)
    sr = StreamingReplay(
        spark,
        events_dir,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        merge_mode="mor",
        sliding_view_path=str(tmp_path / "sw"),
    )
    sr.run_to_completion()
    got = {
        (r.window_start, r.n_events)
        for r in sr.sliding.read().collect()
    }
    all_ev = spark.read.parquet(events_dir + "/*")
    want = {
        (r.w.start, r.n)
        for r in all_ev.groupBy(
            F.window("ingest_ts", "2 hours", "1 hour").alias("w")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    # exactly-once: re-folding a committed batch is a no-op
    res = sr.sliding.update(all_ev.limit(5), batch_id=0)
    assert res.get("skipped") is True


def test_session_window_matches_batch_sessionize(spark):
    """The native session_window formulation must agree with a8's
    independent lag/gap sessionize: session_window(gap=g) starts a new
    session at delta >= g, a8 at delta > threshold, so g = threshold+1s
    makes them identical. Counted per user over the real events table."""
    from pyspark.sql import functions as F
    from cdm_to_mods_spark.queries import a8_sessionize

    sf_dir = "/root/testdata/sf0.001"
    want = {
        (r.user_id, r.n_sessions)
        for r in a8_sessionize(spark, sf_dir).collect()  # gap > 1800s
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.user_id, r.n_sessions)
        for r in (
            ev.groupBy("user_id", F.session_window("ts", "1801 seconds"))
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .collect()
        )
    }
    assert got == want


def test_session_event_counts_streaming(spark, tmp_path):
    """Streaming session windows: two close events merge into one session,
    a later event opens another; append mode emits a session only after
    the watermark passes last_event + gap."""
    import datetime as dt
    import time as _time

    from cdm_to_mods_spark.schemas import EVENT_SCHEMA
    from cdm_to_mods_spark.streaming.windows import session_event_counts

    events_dir = str(tmp_path / "events")
    ddl = ("op string, seq long, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts_raw string, ingest_ts timestamp")
    t = lambda h, m, s=0: dt.datetime(2026, 1, 1, h, m, s)  # noqa: E731
    # cA: two events 30s apart (one session, ends 10:00:40 + 30min gap)
    seg0 = [("I", 1, "cA", 0, None, None, None, None, t(10, 0, 10)),
            ("I", 2, "cA", 1, None, None, None, None, t(10, 0, 40))]
    # watermark advancers: 11:00 -> wm 10:50 > 10:30:40 closes cA's session
    seg1 = [("I", 3, "cB", 0, None, None, None, None, t(11, 0))]
    seg2 = [("I", 4, "cB", 1, None, None, None, None, t(12, 0))]
    for i, seg in enumerate((seg0, seg1, seg2)):
        spark.createDataFrame(seg, ddl).coalesce(1).write.parquet(
            f"{events_dir}/seg-{i}"
        )
        _time.sleep(1.1)  # distinct mtimes -> deterministic trigger order

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    out_dir, ckpt = str(tmp_path / "sess"), str(tmp_path / "ckpt")
    q = (
        session_event_counts(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.conv_id: (r.n_events, r.session_start, r.session_end, r.last_seq)
        for r in spark.read.parquet(out_dir).collect()
    }
    n, start, end, last_seq = got["cA"]
    assert (n, last_seq) == (2, 2)
    assert start == t(10, 0, 10) and end == t(10, 30, 40)  # last event + gap
    # cB's 12:00 session is still open (watermark 11:50 < 12:30) -> withheld;
    # its 11:00 session closed at 11:30 < 11:50 -> emitted.
    assert got.get("cB", (1,))[0] == 1
