"""Debezium-envelope source adapter: op mapping, image selection,
seq fallback, tombstones/corruption, and the full replay integration
(batch read_events + streaming tail) — sources/debezium.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.schemas import EVENT_SCHEMA
from cdm_to_mods_spark.sources.debezium import (
    parse_debezium,
    read_debezium,
    to_debezium,
)
from cdm_to_mods_spark.sources.events import read_events
from cdm_to_mods_spark.sources.synth import synth_events


def _env(op, conv="c1", turn=1, text="t", lsn=None, pos=None, ts_ms=1700000000000,
         before=None, after=None):
    """Hand-rolled envelope JSON line."""
    import json

    row = {"conv_id": conv, "turn_idx": turn, "role": "user", "text": text,
           "tool": None, "ts_raw": "2024-01-01"}
    if op == "d":
        b, a = row, None
    else:
        b, a = None, row
    if before is not None:
        b = before
    if after is not None:
        a = after
    src = {"table": "transcripts", "db": "cdm"}
    if lsn is not None:
        src["lsn"] = lsn
    if pos is not None:
        src["pos"] = pos
    return json.dumps(
        {"before": b, "after": a, "source": src, "op": op, "ts_ms": ts_ms}
    )


def _values(spark, lines):
    return spark.createDataFrame([(v,) for v in lines], "value string")


# --------------------------------------------------------------- unit


def test_round_trip_exact(spark):
    ev = synth_events(spark, 3000, 60, seed=42)
    back = parse_debezium(to_debezium(ev))
    assert back.columns == [f.name for f in EVENT_SCHEMA.fields]
    key = lambda r: r.seq  # seq is unique; None-valued payload cols break Row sort
    a = sorted(ev.select(*back.columns).collect(), key=key)
    b = sorted(back.collect(), key=key)
    assert a == b


def test_op_mapping_and_image_selection(spark):
    lines = [
        _env("c", conv="a", text="created", lsn=1),
        _env("r", conv="b", text="snapshot-read", lsn=2),
        _env("u", conv="c", text="updated", lsn=3),
        _env("d", conv="gone", text="pre-image", lsn=4),
    ]
    rows = {r.conv_id: r for r in parse_debezium(_values(spark, lines)).collect()}
    assert rows["a"].op == "I" and rows["a"].text == "created"
    assert rows["b"].op == "I"  # snapshot reads are inserts
    assert rows["c"].op == "U"
    # deletes take the pre-image (after is null in a Debezium delete)
    assert rows["gone"].op == "D" and rows["gone"].text == "pre-image"
    assert [rows[k].seq for k in ("a", "b", "c", "gone")] == [1, 2, 3, 4]


def test_seq_fallback_lsn_pos_tsms(spark):
    lines = [
        _env("c", conv="lsn", lsn=77, pos=5, ts_ms=111),
        _env("c", conv="pos", pos=66, ts_ms=222),
        _env("c", conv="tsms", ts_ms=333),
    ]
    rows = {r.conv_id: r.seq for r in parse_debezium(_values(spark, lines)).collect()}
    assert rows == {"lsn": 77, "pos": 66, "tsms": 333}


def test_custom_seq_expr(spark):
    lines = [_env("c", conv="x", lsn=7, ts_ms=999)]
    out = parse_debezium(
        _values(spark, lines), seq_expr=F.col("_env")["ts_ms"] * 10
    ).collect()
    assert out[0].seq == 9990


def test_tombstones_dropped_both_modes(spark):
    lines = [_env("d", conv="k", lsn=1), None]
    df = spark.createDataFrame([(v,) for v in lines], "value string")
    for mode in ("error", "drop"):
        out = parse_debezium(df, on_corrupt=mode).collect()
        assert [r.conv_id for r in out] == ["k"]


def test_corrupt_error_vs_drop(spark):
    df = _values(spark, [_env("c", conv="ok", lsn=1), "{not json"])
    with pytest.raises(Exception, match="corrupt Debezium envelope"):
        parse_debezium(df, on_corrupt="error").collect()
    out = parse_debezium(df, on_corrupt="drop").collect()
    assert [r.conv_id for r in out] == ["ok"]


def test_unknown_op_raises(spark):
    df = _values(spark, [_env("t", conv="x", lsn=1)])  # truncate op
    with pytest.raises(Exception, match="unknown Debezium op"):
        parse_debezium(df).collect()


def test_include_table_column(spark):
    import json

    line = json.loads(_env("c", conv="x", lsn=1))
    line["source"]["table"] = "other_table"
    df = _values(spark, [json.dumps(line)])
    out = parse_debezium(df, include_table=True).collect()
    assert out[0].table == "other_table"
    assert out[0].conv_id == "x"


# ------------------------------------------------------ replay integration


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read().collect()
    }


def test_batch_replay_via_read_events(spark, tmp_path):
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.functions.chain import apply_chain

    ev = synth_events(spark, 4000, 80, seed=7)
    dz_dir = str(tmp_path / "dz")
    to_debezium(ev).coalesce(2).write.mode("overwrite").text(dz_dir)

    got = read_events(spark, dz_dir, fmt="debezium")
    t = LakeTable(spark, str(tmp_path / "t_dz"), num_buckets=8)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(got, batch_id=0, transform=apply_chain)

    ref = LakeTable(spark, str(tmp_path / "t_ref"), num_buckets=8)
    ref.create(TRANSCRIPT_SCHEMA)
    ref.apply_changes(ev, batch_id=0, transform=apply_chain)
    assert _state(t) == _state(ref)


def test_min_seq_floor(spark, tmp_path):
    ev = synth_events(spark, 500, 20, seed=3)
    dz_dir = str(tmp_path / "dz")
    to_debezium(ev).coalesce(1).write.mode("overwrite").text(dz_dir)
    got = read_debezium(spark, dz_dir, min_seq=250)
    assert got.agg(F.min("seq")).collect()[0][0] == 251


def test_streaming_tail_debezium(spark, tmp_path):
    """The streaming tail consumes a Debezium feed through the SAME path."""
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    ev = synth_events(spark, 3000, 50, seed=11)
    dz_dir = str(tmp_path / "dz")
    to_debezium(ev).coalesce(3).write.mode("overwrite").text(dz_dir)

    tail = StreamingReplay(
        spark, dz_dir, str(tmp_path / "t_stream"), str(tmp_path / "ckpt"),
        num_buckets=8, source_format="debezium",
        max_files_per_trigger=1,
    )
    t = tail.run_to_completion(timeout_sec=300)
    assert len(tail.batch_metrics) >= 2  # really micro-batched

    ref = LakeTable(spark, str(tmp_path / "t_ref"), num_buckets=8)
    ref.create(TRANSCRIPT_SCHEMA)
    ref.apply_changes(ev, batch_id=0, transform=apply_chain)
    assert _state(t) == _state(ref)


def test_payload_schema_evolution_through_feed(spark, tmp_path):
    """A producer adds a column: declare it in payload_schema and the lake
    table evolves on apply (added column default-null for old rows)."""
    import json

    from pyspark.sql import types as T

    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.debezium import DEBEZIUM_PAYLOAD_SCHEMA

    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(
        parse_debezium(_values(spark, [_env("c", conv="old", lsn=1)])),
        batch_id=0,
        transform=None,
    )

    wide = T.StructType(
        list(DEBEZIUM_PAYLOAD_SCHEMA.fields)
        + [T.StructField("rating", T.IntegerType(), True)]
    )
    line = json.loads(_env("c", conv="new", lsn=2))
    line["after"]["rating"] = 5
    ev = parse_debezium(_values(spark, [json.dumps(line)]), payload_schema=wide)
    assert "rating" in ev.columns
    t.apply_changes(ev, batch_id=1, transform=None)

    rows = {r.conv_id: r for r in t.read().collect()}
    assert "rating" in t.read().columns
    assert rows["new"].rating == 5
    assert rows["old"].rating is None


def test_blank_lines_are_tombstones_not_corrupt(spark, tmp_path):
    """A text-format landing renders a null-value compaction marker (or
    a stray blank line) as '' — non-null, so the pre-fix tombstone
    filter missed it and on_corrupt='error' failed the whole read."""
    d = tmp_path / "bus"
    d.mkdir()
    (d / "a.txt").write_text(
        _env("c") + "\n\n   \n" + _env("u", text="v2", lsn=5) + "\n"
    )
    out = read_events(spark, str(d), fmt="debezium")
    assert out.count() == 2  # blank lines dropped, nothing corrupt


def test_to_debezium_update_carries_before_image(spark):
    """U envelopes ship before=after=image per the documented contract —
    the pre-fix before=null broke external consumers that key on the
    standard Debezium pre-image."""
    import json

    from cdm_to_mods_spark.sources.debezium import to_debezium

    rows = spark.createDataFrame(
        [("U", 7, "c1", 0, "user", "v2", None, None, None)],
        "op string, seq long, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts_raw string, ingest_ts timestamp",
    )
    env = json.loads(to_debezium(rows).first().value)
    assert env["op"] == "u"
    assert env["before"]["text"] == "v2" and env["after"]["text"] == "v2"
