"""ChangeFeedConsumer + replicate: exactly-once table→table mirroring off
the change feed, checkpoint crash-replay, filtered replicas."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdm_to_mods_spark.plans.feed import ChangeFeedConsumer, replicate
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read().collect()
    }


def _mk_src(spark, path):
    src = LakeTable(spark, path, num_buckets=8, merge_mode="mor")
    src.create(TRANSCRIPT_SCHEMA)
    src.apply_changes(
        _ev(spark, [
            ("I", 1, "c1", 0, "user", "hello", "search", None, None),
            ("I", 2, "c2", 0, "user", "bye", None, None, None),
        ]),
        batch_id=0,
    )
    src.apply_changes(
        _ev(spark, [
            ("U", 3, "c1", 0, "user", "hello v2", "search", None, None),
            ("I", 4, "c3", 0, "assistant", "hi", "calc", None, None),
        ]),
        batch_id=1,
    )
    return src


def test_replicate_converges_and_follows(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4, merge_mode="mor")
    dst.create(TRANSCRIPT_SCHEMA)
    c = ChangeFeedConsumer(spark, src, str(tmp_path / "ckpt.json"))
    res = replicate(c, dst)
    assert res["advanced"] and _state(dst) == _state(src)
    # follow-on commits, incl. maintenance-originated changes
    src.apply_changes(
        _ev(spark, [("D", 5, "c2", 0, None, None, None, None, None)]),
        batch_id=2,
    )
    src.update_where("conv_id = 'c3'", {"text": F.lit("hi v2")})
    src.delete_where("tool = 'search'")
    res = replicate(c, dst)
    assert res["advanced"]
    assert _state(dst) == _state(src) == {("c3", 0): ("assistant", "hi v2", "calc")}
    # caught up → no-op
    assert replicate(c, dst)["advanced"] is False


def test_replicate_crash_between_apply_and_checkpoint(spark, tmp_path):
    import json

    src = _mk_src(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4, merge_mode="mor")
    dst.create(TRANSCRIPT_SCHEMA)
    ckpt = str(tmp_path / "ckpt.json")
    c = ChangeFeedConsumer(spark, src, ckpt)
    replicate(c, dst)
    state = _state(dst)
    # simulate a crash AFTER the apply committed but BEFORE the checkpoint
    # advanced: rewind the checkpoint and redeliver the same range
    with open(ckpt, "w") as fh:
        json.dump({"last_version": 0}, fh)
    res = replicate(c, dst)
    assert res["advanced"]  # range was redelivered...
    assert res["last_metrics"].get("skipped"), "ledger must dedupe the redelivery"
    assert _state(dst) == state  # ...and the mirror did not double-apply


def test_replicate_with_transform_filters(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4, merge_mode="mor")
    dst.create(TRANSCRIPT_SCHEMA)
    c = ChangeFeedConsumer(spark, src, str(tmp_path / "ckpt.json"))
    replicate(c, dst, transform=lambda ev: ev.filter(F.col("conv_id") != "c2"))
    got = _state(dst)
    assert ("c2", 0) not in got and ("c1", 0) in got and ("c3", 0) in got


def test_process_once_range_accounting(spark, tmp_path):
    src = _mk_src(spark, str(tmp_path / "src"))
    c = ChangeFeedConsumer(spark, src, str(tmp_path / "ckpt.json"))
    seen = []
    res = c.process_once(lambda df, s, u: seen.append((s, u, df.count())))
    assert res == {"since": 0, "until": 2, "advanced": True}
    assert seen == [(0, 2, 4)]  # both batches' change rows in one range
    assert c.pending() == (2, 2)
    assert c.process_once(lambda df, s, u: seen.append("nope"))["advanced"] is False
    assert seen == [(0, 2, 4)]


def test_replicate_refuses_destination_with_foreign_producer(spark, tmp_path):
    """The replication ledger token is batch_id = until-version; a
    destination whose ledger is AHEAD of the feed (some other producer
    wrote it) would silently swallow every range via the exactly-once
    skip. replicate must refuse instead of advancing past dropped rows."""
    import pytest

    src = _mk_src(spark, str(tmp_path / "src"))
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=8,
                    merge_mode="mor")
    dst.create(TRANSCRIPT_SCHEMA)
    # foreign producer: a batch with a HIGH batch_id lands in dst first
    dst.apply_changes(
        _ev(spark, [("I", 1, "zz", 0, "user", "foreign", None, None, None)]),
        batch_id=999,
    )
    c = ChangeFeedConsumer(spark, src, str(tmp_path / "ckpt.json"))
    with pytest.raises(RuntimeError, match="another producer"):
        replicate(c, dst)
    # the checkpoint must NOT have advanced past the dropped range
    assert c.last_consumed() == 0


def test_feed_to_debezium_round_trip_mirror(spark, tmp_path):
    """Outbound envelopes → parse → apply reproduces the source's live
    state: the table→bus→table mirror (plans/feed.py feed_to_debezium)."""
    from pyspark.sql import types as T

    from cdm_to_mods_spark.plans.feed import _DZ_TS_FMT, feed_to_debezium
    from cdm_to_mods_spark.sources.debezium import parse_debezium

    src = _mk_src(spark, str(tmp_path / "src"))
    src.apply_changes(
        _ev(spark, [("D", 5, "c2", 0, None, None, None, None, None)]),
        batch_id=2,
    )
    lines = feed_to_debezium(src, 0, table_name="transcripts")
    rows = lines.collect()
    assert all(r.value.startswith("{") for r in rows)
    # tombstone rides as op=d with the pre-image in before
    import json

    envs = [json.loads(r.value) for r in rows]
    dels = [e for e in envs if e["op"] == "d"]
    assert dels and all(e.get("after") is None for e in dels)
    assert all(e["source"]["table"] == "transcripts" for e in envs)
    assert all(isinstance(e.get("ts_ms"), int) for e in envs)

    payload = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in src.schema().fields]
    )
    ev = parse_debezium(
        lines, payload_schema=payload, json_options=_DZ_TS_FMT
    ).drop("ingest_ts")
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4)
    dst.create(src.schema())
    dst.apply_changes(ev, batch_id=0, transform=None)
    assert _state(dst) == _state(src)
    # full-fidelity check including ts (µs format round-trips)
    a = {tuple(r) for r in src.read().collect()}
    b = {tuple(r) for r in dst.read().collect()}
    assert a == b
