"""lake_cdf: the change feed as a native Structured Streaming source —
feed parity with changes(), checkpointed resume, startingVersion, rename
resolution across schema_ids, feed-less-cow refusal."""

from __future__ import annotations

import pytest

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.streaming.source import register_lake_cdf

EV = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)


def _table(spark, path, **kw):
    t = LakeTable(spark, path, num_buckets=4, merge_mode="mor", **kw)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _apply(spark, t, rows, bid):
    t.apply_changes(spark.createDataFrame(rows, EV), batch_id=bid)


def _drain(spark, path, ck, starting=None):
    register_lake_cdf(spark)
    reader = spark.readStream.format("lake_cdf").option("path", path)
    if starting is not None:
        reader = reader.option("startingVersion", str(starting))
    got = []
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_stream_matches_changes(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "hello", None),
                      ("I", 2, "c2", 0, "user", "bye", "calc")], 0)
    _apply(spark, t, [("U", 3, "c1", 0, "user", "hello v2", None),
                      ("D", 4, "c2", 0, None, None, None)], 1)
    t.compact()  # maintenance version inside the range contributes nothing
    got = _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck"))
    want = t.changes(0).collect()
    key = lambda r: r._seq  # noqa: E731
    assert [
        (r.conv_id, r.turn_idx, r.text, r.tool, r._seq, r._deleted)
        for r in sorted(got, key=key)
    ] == [
        (r.conv_id, r.turn_idx, r.text, r.tool, r._seq, r._deleted)
        for r in sorted(want, key=key)
    ]
    assert {r._version for r in got} == {1, 2}


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    ck = str(tmp_path / "ck")
    first = _drain(spark, str(tmp_path / "tab"), ck)
    assert [r.text for r in first] == ["a"]
    # new commits after the stream stopped: the SAME checkpoint resumes at
    # the committed ledger offset and sees only the new versions
    _apply(spark, t, [("U", 2, "c1", 0, "user", "b", None)], 1)
    second = _drain(spark, str(tmp_path / "tab"), ck)
    assert [(r.text, r._version) for r in second] == [("b", 2)]
    # nothing new: an idle drain delivers nothing
    assert _drain(spark, str(tmp_path / "tab"), ck) == []


def test_stream_starting_version(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "old", None)], 0)
    _apply(spark, t, [("I", 2, "c2", 0, "user", "new", None)], 1)
    got = _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck"),
                 starting=1)
    assert [(r.text, r._version) for r in got] == [("new", 2)]


def test_stream_resolves_renames_across_schema_ids(spark, tmp_path):
    """files written under the OLD column name must stream under the new
    canonical name (rename-log resolution, same as changes())."""
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "pre-rename", None)], 0)
    t.rename_column("text", "content")
    t.apply_changes(
        spark.createDataFrame(
            [("I", 2, "c2", 0, "user", "post-rename", None)],
            EV.replace("text string", "content string"),
        ),
        batch_id=1,
    )
    got = _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck"))
    by_v = {r._version: r for r in got}
    assert by_v[1].content == "pre-rename"   # old bytes, new name
    assert by_v[3].content == "post-rename"
    assert "text" not in got[0].asDict()


def test_stream_refuses_feedless_cow(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4,
                  merge_mode="cow")
    t.create(TRANSCRIPT_SCHEMA)
    _apply(spark, t, [("I", 1, "c1", 0, "user", "x", None)], 0)
    with pytest.raises(Exception, match="copy-on-write|cow"):
        _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck"))


def _drain_batches(spark, path, ck, *, max_versions):
    """Drain with maxVersionsPerTrigger, returning the per-micro-batch
    version sets actually delivered (empty planning rounds excluded).
    The Python-source AvailableNow fallback runs ONE batch per start, so
    a bounded drain is a restart loop on the same checkpoint — stop when
    the offset log reaches the ledger head (the same loop mirror_stream
    runs internally)."""
    from cdm_to_mods_spark.streaming.source import (
        _ledger_versions,
        parse_offset_version,
    )

    register_lake_cdf(spark)
    batches = []
    head = _ledger_versions(path)[-1]
    while True:
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", path)
            .option("maxVersionsPerTrigger", str(max_versions))
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: batches.append(
                    sorted({r._version for r in df.collect()})
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        prog = q.lastProgress
        if prog is None:
            break
        if parse_offset_version(prog["sources"][0]["endOffset"]) >= head:
            break
    return [b for b in batches if b]


def test_rate_limited_backlog_drains_in_bounded_batches(spark, tmp_path):
    """maxVersionsPerTrigger=1 over a 4-version backlog: availableNow
    drains as FOUR one-version micro-batches (not one giant batch), in
    ledger order, and the union equals the unbounded feed."""
    t = _table(spark, str(tmp_path / "tab"))
    for v in range(4):
        _apply(spark, t, [("I", v + 1, f"c{v}", 0, "user", f"t{v}", None)], v)
    batches = _drain_batches(
        spark, str(tmp_path / "tab"), str(tmp_path / "ck"), max_versions=1
    )
    assert batches == [[1], [2], [3], [4]]
    # parity with the unbounded drain
    flat = sorted(v for b in batches for v in b)
    un = _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck_un"))
    assert flat == sorted({r._version for r in un})


def test_rate_limit_restart_does_not_stall(spark, tmp_path):
    """checkpoint restart with a capped reader: the fresh reader's floor
    is stale (startingVersion, not the checkpointed offset) — the
    escalation guard must cross the committed offset and deliver the new
    versions instead of planning 'no new data' forever."""
    t = _table(spark, str(tmp_path / "tab"))
    for v in range(3):
        _apply(spark, t, [("I", v + 1, f"c{v}", 0, "user", f"a{v}", None)], v)
    ck = str(tmp_path / "ck")
    first = _drain_batches(spark, str(tmp_path / "tab"), ck, max_versions=1)
    assert first == [[1], [2], [3]]
    # three more commits while the stream is down, then resume on the SAME
    # checkpoint: no duplicates, no stall, still capped at one version each
    for v in range(3, 6):
        _apply(spark, t, [("I", v + 1, f"c{v}", 0, "user", f"a{v}", None)], v)
    second = _drain_batches(spark, str(tmp_path / "tab"), ck, max_versions=1)
    assert sorted(v for b in second for v in b) == [4, 5, 6]
    assert all(len(b) == 1 for b in second)


def test_rate_limit_rejects_nonpositive(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "x", None)], 0)
    with pytest.raises(Exception, match="maxVersionsPerTrigger"):
        _drain_batches(
            spark, str(tmp_path / "tab"), str(tmp_path / "ck"), max_versions=0
        )


def test_batch_with_version_matches_stream(spark, tmp_path):
    """changes(with_version=True) attributes every row to its commit
    version — identical to the _version the streaming source emits, and
    value-identical to the plain feed otherwise."""
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None),
                      ("I", 2, "c2", 0, "user", "b", None)], 0)
    _apply(spark, t, [("U", 3, "c1", 0, "user", "a2", None),
                      ("D", 4, "c2", 0, None, None, None)], 1)
    batch = t.changes(0, with_version=True)
    stream = _drain(spark, str(tmp_path / "tab"), str(tmp_path / "ck"))
    key = lambda r: (r._seq,)  # noqa: E731
    assert [
        (r.conv_id, r._seq, r._deleted, r._version)
        for r in sorted(batch.collect(), key=key)
    ] == [
        (r.conv_id, r._seq, r._deleted, r._version)
        for r in sorted(stream, key=key)
    ]
    plain = t.changes(0)
    assert sorted(
        (r.conv_id, r._seq) for r in batch.collect()
    ) == sorted((r.conv_id, r._seq) for r in plain.collect())


def test_mid_stream_evolution_fails_with_marker(spark, tmp_path):
    """a reader pinned BEFORE a schema evolution must refuse to plan the
    evolved version (silently dropping the new column from the feed is
    the failure mode), with the marked error a supervisor can match."""
    from pyspark.sql import types as T

    from cdm_to_mods_spark.streaming.source import (
        _CDFStreamReader,
        _ledger_versions,
        is_schema_evolution_failure,
    )

    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    reader = _CDFStreamReader(
        str(tmp_path / "tab"), T.StructType([]), "earliest", None
    )
    # source evolves AFTER the reader pinned its schema state
    t.apply_changes(
        spark.createDataFrame(
            [("I", 2, "c2", 0, "user", "b", None, "fr")],
            EV + ", lang string",
        ),
        batch_id=1,
    )
    head = _ledger_versions(str(tmp_path / "tab"))[-1]
    with pytest.raises(RuntimeError, match="schema evolved mid-stream") as ei:
        list(reader.partitions({"version": 0}, {"version": head}))
    assert is_schema_evolution_failure(ei.value)
    # pre-evolution versions still plan fine on the pinned reader
    assert list(reader.partitions({"version": 0}, {"version": head - 1}))


def test_mirror_adopts_source_evolution(spark, tmp_path):
    """the bounded drain re-pins the head schema on every restart, so a
    mirror replica picks up a column added mid-backlog — value present
    where the source has it, null before."""
    from cdm_to_mods_spark.streaming.source import mirror_stream

    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    t.apply_changes(
        spark.createDataFrame(
            [("I", 2, "c2", 0, "user", "b", None, "fr")],
            EV + ", lang string",
        ),
        batch_id=1,
    )
    m = LakeTable(spark, str(tmp_path / "mirror"), num_buckets=4,
                  merge_mode="mor")
    m.create(t.read().schema)
    mirror_stream(spark, str(tmp_path / "tab"), m, str(tmp_path / "ck"),
                  max_versions_per_trigger=1)
    got = {(r.conv_id): (r.text, r.lang) for r in m.read().collect()}
    assert got == {"c1": ("a", None), "c2": ("b", "fr")}


def test_mirror_stream_replicates_table(spark, tmp_path):
    """one Structured Streaming job = exactly-once CDC mirror: the replica
    converges to the source (deletes included), resumes from its own
    checkpoint for later commits, and a redelivered backlog is idempotent."""
    from cdm_to_mods_spark.streaming.source import mirror_stream

    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None),
                        ("I", 2, "c2", 0, "user", "b", "calc")], 0)
    _apply(spark, src, [("U", 3, "c1", 0, "user", "a2", None),
                        ("D", 4, "c2", 0, None, None, None)], 1)
    dst = _table(spark, str(tmp_path / "dst"))
    ck = str(tmp_path / "ck")
    mirror_stream(spark, str(tmp_path / "src"), dst, ck).awaitTermination(120)

    def state(t):
        return {
            (r.conv_id, r.turn_idx): (r.text, r.tool)
            for r in t.read().collect()
        }

    assert state(dst) == state(src) == {("c1", 0): ("a2", None)}
    # later source commits: the same checkpoint resumes incrementally
    _apply(spark, src, [("I", 5, "c3", 0, "user", "late", None)], 2)
    dst2 = LakeTable(spark, str(tmp_path / "dst"), merge_mode="mor")
    mirror_stream(spark, str(tmp_path / "src"), dst2, ck).awaitTermination(120)
    assert state(dst2) == state(src)
    applied = [h for h in dst2.history() if h["operation"] == "MERGE"]
    assert len(applied) == 2  # one mirror apply per drained micro-batch
    # lost checkpoint: full redelivery converges (batch ledger + seq LWW)
    mirror_stream(
        spark, str(tmp_path / "src"), dst2, str(tmp_path / "ck2")
    ).awaitTermination(120)
    assert state(dst2) == state(src)


def _publish(spark, path, out, ck, **kw):
    from cdm_to_mods_spark.streaming.source import publish_stream

    q = publish_stream(spark, path, out, ck, **kw)
    q.awaitTermination(120)


def _read_published(spark, out):
    # batch read of a file-sink directory honors _spark_metadata: only
    # files committed by the sink's manifest are visible (the exactly-once
    # contract publish_stream leans on)
    return spark.read.format("text").load(out)


def test_publish_stream_round_trip(spark, tmp_path):
    """table → publish_stream (Debezium lines on disk) → parse → apply
    reproduces the source's live state; ts_ms carries each row's version
    commit timestamp."""
    import json as _json

    from pyspark.sql import types as T

    from cdm_to_mods_spark.plans.feed import _DZ_TS_FMT
    from cdm_to_mods_spark.sources.debezium import parse_debezium

    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "hello", None),
                      ("I", 2, "c2", 0, "user", "bye", "calc")], 0)
    _apply(spark, t, [("U", 3, "c1", 0, "user", "hello v2", None),
                      ("D", 4, "c2", 0, None, None, None)], 1)
    out, ck = str(tmp_path / "bus"), str(tmp_path / "ck")
    _publish(spark, str(tmp_path / "tab"), out, ck)

    lines = _read_published(spark, out)
    envs = [_json.loads(r.value) for r in lines.collect()]
    assert len(envs) == t.changes(0).count()
    dels = [e for e in envs if e["op"] == "d"]
    assert dels and all(e.get("after") is None for e in dels)
    # ts_ms = the version's commit timestamp (stamped by includeCommitTs)
    want_ts = {
        v: int(t._load_version(v)["commit_ts"] * 1000)
        for v in (1, 2)
    }
    assert {e["ts_ms"] for e in envs} <= set(want_ts.values())

    payload = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in t.schema().fields]
    )
    ev = parse_debezium(
        lines, payload_schema=payload, json_options=_DZ_TS_FMT
    ).drop("ingest_ts")
    dst = LakeTable(spark, str(tmp_path / "dst"), num_buckets=4)
    dst.create(TRANSCRIPT_SCHEMA)
    dst.apply_changes(ev, batch_id=0, transform=None)
    a = {tuple(r) for r in t.read().collect()}
    b = {tuple(r) for r in dst.read().collect()}
    assert a == b


def test_publish_stream_exactly_once_resume(spark, tmp_path):
    """Re-running on the same checkpoint publishes ONLY new versions — no
    duplicate envelopes; an idle rerun publishes nothing."""
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    out, ck = str(tmp_path / "bus"), str(tmp_path / "ck")
    _publish(spark, str(tmp_path / "tab"), out, ck)
    assert _read_published(spark, out).count() == 1

    _apply(spark, t, [("U", 2, "c1", 0, "user", "b", None),
                      ("I", 3, "c2", 0, "user", "c", "calc")], 1)
    _publish(spark, str(tmp_path / "tab"), out, ck)
    rows = [r.value for r in _read_published(spark, out).collect()]
    assert len(rows) == 3 == len(set(rows))
    # idle rerun: nothing new
    _publish(spark, str(tmp_path / "tab"), out, ck)
    assert _read_published(spark, out).count() == 3


def test_publish_stream_bounded_drain(spark, tmp_path):
    """availableNow + maxVersionsPerTrigger drains the whole backlog in
    capped restarts (the Python-source AvailableNow caveat), still exactly
    once."""
    t = _table(spark, str(tmp_path / "tab"))
    for b in range(4):
        _apply(spark, t, [("I", b + 1, f"c{b}", 0, "user", f"t{b}", None)], b)
    out, ck = str(tmp_path / "bus"), str(tmp_path / "ck")
    _publish(
        spark, str(tmp_path / "tab"), out, ck, max_versions_per_trigger=2
    )
    rows = [r.value for r in _read_published(spark, out).collect()]
    assert len(rows) == 4 == len(set(rows))


def test_include_commit_ts_collision_and_isolation(spark, tmp_path):
    """includeCommitTs refuses a table whose payload already has
    _commit_ts; WITHOUT the option a payload column of that name reads
    its stored data (never the lake commit time)."""
    import pytest

    from pyspark.sql import functions as F, types as T

    from cdm_to_mods_spark.plans.lake import LakeTable

    t = LakeTable(spark, str(tmp_path / "tab"), num_buckets=4, merge_mode="mor")
    schema = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [T.StructField("_commit_ts", T.LongType(), True)]
    )
    t.create(schema)
    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "x", None, 777)],
        "op string, seq long, conv_id string, turn_idx int, role string, "
        "text string, tool string, _commit_ts long",
    )
    t.apply_changes(ev, batch_id=0)

    register_lake_cdf(spark)
    # without the option: stored data comes back untouched
    got = []
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", str(tmp_path / "tab"))
        .load()
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r["_commit_ts"] for r in got] == [777]

    # with the option: refused up front, not silently overwritten
    with pytest.raises(Exception, match="already has a payload column"):
        (
            spark.readStream.format("lake_cdf")
            .option("path", str(tmp_path / "tab"))
            .option("includeCommitTs", "true")
            .load()
            .writeStream.foreachBatch(lambda df, bid: None)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )


# ------------------------------------------------- initial snapshot + tail
def _drain_snapshot(spark, path, ck):
    register_lake_cdf(spark)
    got = []
    q = (
        spark.readStream.format("lake_cdf")
        .option("path", path)
        .option("initialSnapshot", "true")
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: got.extend((bid, r) for r in df.collect())
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_initial_snapshot_then_tail(spark, tmp_path):
    """Snapshot-then-tail over a table whose EARLY feed history is
    expired: batch 0 = the resolved live state at query start (rows keep
    their stored _seq), later drains deliver only post-snapshot changes —
    the retention-gap bootstrap 'earliest' cannot serve."""
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None),
                      ("I", 2, "c2", 0, "user", "b", "calc")], 0)
    _apply(spark, t, [("U", 3, "c1", 0, "user", "a2", None),
                      ("D", 4, "c2", 0, None, None, None),
                      ("I", 5, "c3", 1, "user", "c", None)], 1)
    t.compact()
    t.expire_snapshots(keep_last=1)  # early feed history is GONE
    with pytest.raises(Exception):
        t.changes(0)  # proves 'earliest' could not have served this

    ck = str(tmp_path / "ck")
    got = _drain_snapshot(spark, str(tmp_path / "tab"), ck)
    v0 = t.latest_version if callable(getattr(t, "latest_version", None)) else None
    assert [
        (r.conv_id, r.turn_idx, r.text, r._seq, r._deleted) for _, r in
        sorted(got, key=lambda br: br[1].conv_id)
    ] == [("c1", 0, "a2", 3, False), ("c3", 1, "c", 5, False)]
    assert {bid for bid, _ in got} == {0}
    snap_version = {r._version for _, r in got}
    assert snap_version == {t.manifest()["version"]}

    # tail phase: only the NEW change rows, exactly-once on the checkpoint
    _apply(spark, t, [("U", 6, "c3", 1, "user", "c2", None)], 99)
    got2 = _drain_snapshot(spark, str(tmp_path / "tab"), ck)
    assert [(r.conv_id, r.text, r._seq, r._deleted) for _, r in got2] == [
        ("c3", "c2", 6, False)
    ]
    assert _drain_snapshot(spark, str(tmp_path / "tab"), ck) == []


def test_initial_snapshot_resolves_sink_chains(spark, tmp_path):
    """The snapshot resolves RAW native-sink deltas (unresolved marks) and
    multi-set chains through the shared Arrow path."""
    from cdm_to_mods_spark.sources.lake_batch import register_lake

    register_lake(spark)
    t = _table(spark, str(tmp_path / "tab"))
    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "v1", None),
         ("U", 2, "c1", 0, "user", "v2", None)], EV
    )
    ev.write.format("lake").mode("append").save(t.path)
    got = _drain_snapshot(spark, str(tmp_path / "tab"), str(tmp_path / "ck"))
    assert [(r.conv_id, r.text, r._seq) for _, r in got] == [("c1", "v2", 2)]


def test_initial_snapshot_refusals(spark, tmp_path):
    t = _table(spark, str(tmp_path / "tab"))
    _apply(spark, t, [("I", 1, "c1", 0, "user", "a", None)], 0)
    register_lake_cdf(spark)

    def _start(**opts):
        reader = (
            spark.readStream.format("lake_cdf")
            .option("path", str(tmp_path / "tab"))
            .option("initialSnapshot", "true")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(lambda df, bid: None)
            .option(
                "checkpointLocation",
                str(tmp_path / f"ck-{len(opts)}-{sorted(opts)}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="drop startingVersion"):
        _start(startingVersion="0")
    with pytest.raises(Exception, match="cdf-mode surface"):
        _start(mode="row_changes")

    agg = LakeTable(
        spark, str(tmp_path / "agg"), num_buckets=2, merge_mode="mor",
        merge_engine="aggregate", agg_spec={"n": "sum"},
    )
    from pyspark.sql import types as T

    agg.create(
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("n", T.LongType(), True),
        ])
    )
    agg.apply_changes(
        spark.createDataFrame(
            [("I", 1, "c1", 3, 2)],
            "op string, seq long, conv_id string, turn_idx int, n long",
        ),
        batch_id=0,
    )
    with pytest.raises(Exception, match="initialSnapshot resolves"):
        got = []
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", str(tmp_path / "agg"))
            .option("initialSnapshot", "true")
            .load()
            .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck-agg"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        raise RuntimeError("unreachable: query should have failed")


def test_mirror_initial_snapshot_over_expired_history(spark, tmp_path):
    """mirror_stream(initial_snapshot=True): a replica of a table whose
    early feed is expired still converges — snapshot seeds the state,
    the tail keeps it current."""
    from cdm_to_mods_spark.streaming.source import mirror_stream

    src = _table(spark, str(tmp_path / "src"))
    _apply(spark, src, [("I", 1, "c1", 0, "user", "a", None),
                        ("I", 2, "c2", 0, "user", "b", None)], 0)
    _apply(spark, src, [("D", 3, "c2", 0, None, None, None)], 1)
    src.compact()
    src.expire_snapshots(keep_last=1)

    dst = _table(spark, str(tmp_path / "dst"))
    ck = str(tmp_path / "ck")
    q = mirror_stream(spark, str(tmp_path / "src"), dst, ck,
                      initial_snapshot=True)
    q.awaitTermination(120)
    assert sorted(
        (r.conv_id, r.turn_idx, r.text) for r in dst.read().collect()
    ) == [("c1", 0, "a")]
    # tail: a post-snapshot change flows through the same checkpoint
    _apply(spark, src, [("U", 4, "c1", 0, "user", "a2", None)], 7)
    q = mirror_stream(spark, str(tmp_path / "src"), dst, ck,
                      initial_snapshot=True)
    q.awaitTermination(120)
    assert [r.text for r in dst.read().collect()] == ["a2"]
