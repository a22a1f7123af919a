"""Stream-stream interval join: batch equivalence + watermarked streaming
emission (inner matches immediately; left-outer nulls flush once the
watermark proves no match can arrive)."""

from __future__ import annotations

import datetime as dt
import time as _time

from cdm_to_mods_spark.schemas import EVENT_SCHEMA
from cdm_to_mods_spark.streaming.joins import VERDICT_SCHEMA, enrich_with_verdicts

EV_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)
VD_DDL = "conv_id string, turn_idx int, verdict string, score double, verdict_ts timestamp"


def _t(h, m, s=0):
    return dt.datetime(2026, 1, 1, h, m, s)


def _ev(seq, conv, ts):
    return ("I", seq, conv, 0, "user", None, None, None, ts)


# c1: verdict 5 min after the event AND a second one 10 min after -> 2 matches
# c2: verdict 30 min after -> outside the 15-min horizon, no match
# c4: verdict 1 min BEFORE the event -> no match (horizon is forward-only)
# c3: no verdict at all -> inner drops it, left_outer emits nulls
EVENTS = [
    _ev(1, "c1", _t(10, 0)),
    _ev(2, "c2", _t(10, 0)),
    _ev(3, "c3", _t(10, 0)),
    _ev(4, "c4", _t(10, 0)),
]
VERDICTS = [
    ("c1", 0, "ok", 0.9, _t(10, 5)),
    ("c1", 0, "flag", 0.2, _t(10, 10)),
    ("c2", 0, "ok", 0.8, _t(10, 30)),
    ("c4", 0, "ok", 0.7, _t(9, 59)),
]
# a matched pair far in the future on BOTH feeds: advances each side's
# watermark past 10:15 so c3's left-outer null row can flush.
SENTINEL_EV = _ev(99, "zz", _t(20, 0))
SENTINEL_VD = ("zz", 0, "ok", 1.0, _t(20, 1))

INNER_WANT = {
    ("c1", 1, "ok", 300),
    ("c1", 1, "flag", 600),
    ("zz", 99, "ok", 60),
}


def test_interval_join_batch_equivalence(spark):
    """The streaming join function, applied to BATCH frames (watermarks are
    a no-op), implements exactly 'verdict in [ingest_ts, ingest_ts+15m]'."""
    ev = spark.createDataFrame(EVENTS + [SENTINEL_EV], EV_DDL)
    vd = spark.createDataFrame(VERDICTS + [SENTINEL_VD], VD_DDL)

    inner = enrich_with_verdicts(ev, vd, horizon="15 minutes", how="inner")
    got = {(r.conv_id, r.seq, r.verdict, r.verdict_lag_s) for r in inner.collect()}
    assert got == INNER_WANT

    outer = enrich_with_verdicts(ev, vd, horizon="15 minutes", how="left_outer")
    rows = {r.conv_id: r for r in outer.collect() if r.verdict is None}
    # c2/c4's verdicts are out-of-interval, c3 has none: all three unmatched
    assert set(rows) == {"c2", "c3", "c4"}
    assert rows["c3"].verdict_lag_s is None


def test_interval_join_streaming(spark, tmp_path):
    """Two file-source streams through the watermarked join. Inner matches
    emit as soon as both sides arrive; the unmatched events' null rows
    emit only after the sentinel batch drags the watermark past
    ingest_ts + horizon."""
    ev_dir, vd_dir = str(tmp_path / "ev"), str(tmp_path / "vd")
    # batch 0: the data; batch 1: the sentinels (later mtime -> later trigger)
    spark.createDataFrame(EVENTS, EV_DDL).coalesce(1).write.parquet(f"{ev_dir}/seg-0")
    spark.createDataFrame(VERDICTS, VD_DDL).coalesce(1).write.parquet(f"{vd_dir}/seg-0")
    _time.sleep(1.1)
    spark.createDataFrame([SENTINEL_EV], EV_DDL).coalesce(1).write.parquet(f"{ev_dir}/seg-1")
    spark.createDataFrame([SENTINEL_VD], VD_DDL).coalesce(1).write.parquet(f"{vd_dir}/seg-1")

    def _stream(d, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )

    joined = enrich_with_verdicts(
        _stream(ev_dir, EVENT_SCHEMA),
        _stream(vd_dir, VERDICT_SCHEMA),
        horizon="15 minutes",
        event_watermark="5 minutes",
        verdict_watermark="5 minutes",
        how="left_outer",
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    res = spark.read.parquet(out_dir).collect()
    got_inner = {
        (r.conv_id, r.seq, r.verdict, r.verdict_lag_s)
        for r in res
        if r.verdict is not None
    }
    assert got_inner == INNER_WANT
    # watermark after the sentinel trigger: min(20:00, 20:01) - 5m = 19:55,
    # far past every 10:15 interval end -> all three null rows flushed.
    nulls = {r.conv_id for r in res if r.verdict is None}
    assert nulls == {"c2", "c3", "c4"}
