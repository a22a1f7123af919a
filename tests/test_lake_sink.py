"""``df.write.format("lake")`` / ``writeStream.format("lake")`` — the
native write sink (sources/lake_sink.py).

Differential contract: a change batch landed through the sink must leave
the table in EXACTLY the state ``apply_changes`` would (same events, same
seqs) — the sink is an alternate producer face, never an alternate
semantics. The vectorized bucket router is pinned numpy == scalar port ==
JVM ``F.hash`` so sink files land in the same buckets ``read_keys`` and
the apply path prune by."""

from __future__ import annotations

import datetime as dt
import os
import random

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.functions.hash32 import (
    bucket_ids_np,
    murmur3_bytes_np,
    murmur3_int32_np,
    murmur3_int64_np,
)
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.lake_batch import register_lake, spark_murmur3

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _ts(month, day=5):
    return dt.datetime(2025, month, day, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def _state(t: LakeTable):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in t.read().collect()
    )


def _np_bytes(vals: list[bytes]):
    data = np.frombuffer(b"".join(vals), dtype=np.uint8)
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return data, starts, lengths


# ---------------------------------------------------------------- hashing
def test_numpy_hash_matches_scalar_port():
    """Differential pin: the vectorized kernels equal the scalar port
    (itself JVM-pinned in test_lake_source.py) on random values — so the
    chain numpy == scalar == F.hash holds."""
    rng = random.Random(11)
    strs = ["", "a", "conv-0001", "héllo wörld", "日本語テキスト", "x" * 101] + [
        "".join(chr(rng.randrange(32, 2000)) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    raw = [s.encode("utf-8") for s in strs]
    got = murmur3_bytes_np(*_np_bytes(raw))
    want = [spark_murmur3(s) for s in strs]
    assert got.tolist() == want

    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(100)
    ]
    assert murmur3_int32_np(np.array(ints, dtype=np.int64)).tolist() == [
        spark_murmur3(i) for i in ints
    ]

    longs = [0, 1, -1, 2**31, -(2**31) - 1, 2**63 - 1, -(2**63)] + [
        rng.randrange(-(2**63), 2**63) for _ in range(100)
    ]
    # the scalar port picks the 4-byte path for small values; force the
    # 8-byte column semantics the same way spark_hash32_bucket does
    def _long(v):
        vv = v & ((1 << 64) - 1)
        from cdm_to_mods_spark.sources.lake_batch import (
            _fmix,
            _mix_h1,
            _mix_k1,
            _signed32,
            _M32,
        )

        h1 = _mix_h1(42 & _M32, _mix_k1(vv & _M32))
        h1 = _mix_h1(h1, _mix_k1((vv >> 32) & _M32))
        return _signed32(_fmix(h1, 8))

    assert murmur3_int64_np(np.array(longs, dtype=np.int64)).tolist() == [
        _long(v) for v in longs
    ]


def test_bucket_ids_match_jvm(spark):
    """End of the chain: bucket assignment over Arrow arrays equals the
    JVM's pmod(hash(col), n) — string AND long key columns, plus sliced
    and chunked Arrow inputs (offset handling)."""
    rng = random.Random(13)
    strs = [f"conv-{rng.randrange(10**6)}" for _ in range(300)] + ["", "日本語"]
    jvm = {
        r.s: r.b
        for r in spark.createDataFrame([(s,) for s in strs], "s string")
        .select("s", F.pmod(F.hash("s"), F.lit(7)).cast("int").alias("b"))
        .collect()
    }
    arr = pa.array(strs, type=pa.string())
    assert bucket_ids_np(arr, 7).tolist() == [jvm[s] for s in strs]
    # sliced array must honour the slice offset
    assert bucket_ids_np(arr.slice(5, 50), 7).tolist() == [
        jvm[s] for s in strs[5:55]
    ]
    chunked = pa.chunked_array([arr.slice(0, 10), arr.slice(10, 20)])
    assert bucket_ids_np(chunked, 7).tolist() == [jvm[s] for s in strs[:30]]

    longs = [rng.randrange(-(2**62), 2**62) for _ in range(100)]
    jvm_l = [
        r.b
        for r in spark.createDataFrame([(v,) for v in longs], "v long")
        .select(F.pmod(F.hash("v"), F.lit(7)).cast("int").alias("b"))
        .collect()
    ]
    assert bucket_ids_np(pa.array(longs, type=pa.int64()), 7).tolist() == jvm_l


def test_numpy_hash_long_outlier_key():
    """Active-set word rounds: one oversized key beside short ones (the
    adversarial shape that used to cost every row max_len/4 mask passes)
    still hashes to exact parity."""
    strs = ["conv-1", "z" * 50_001, "", "conv-2", "w" * 1_003]
    got = murmur3_bytes_np(*_np_bytes([s.encode() for s in strs]))
    assert got.tolist() == [spark_murmur3(s) for s in strs]


def test_bucket_ids_refuse_nulls_and_unsupported():
    with pytest.raises(ValueError, match="null bucket key"):
        bucket_ids_np(pa.array(["a", None]), 4)
    with pytest.raises(TypeError, match="unsupported bucket-key type"):
        bucket_ids_np(pa.array([1.5, 2.5]), 4)


# ------------------------------------------------------------ batch write
BATCH1 = [
    ("I", 1, "c1", 0, "user", "hello", None, _ts(1)),
    ("I", 2, "c1", 1, "assistant", "hi", "search", _ts(1, 6)),
    ("I", 3, "c2", 0, "user", "feb", None, _ts(2)),
    ("I", 4, "c3", 0, "user", "doomed", None, _ts(3)),
]
# multiple versions of ONE key inside one sink batch (raw, uncollapsed)
BATCH2 = [
    ("U", 5, "c1", 0, "user", "hello v2", None, _ts(1, 7)),
    ("U", 6, "c1", 0, "user", "hello v3", None, _ts(1, 8)),
    ("D", 7, "c3", 0, None, None, None, None),
    ("I", 8, "c4", 0, "user", "new row", "browse", _ts(6)),
]


def _mk(spark, path, **kw) -> LakeTable:
    t = LakeTable(spark, path, num_buckets=4, merge_mode="mor", **kw)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def test_sink_write_equals_apply_changes(spark, tmp_path):
    register_lake(spark)
    sink_t = _mk(spark, str(tmp_path / "sink"))
    sink_t.apply_changes(_events(spark, BATCH1), batch_id=0)
    _events(spark, BATCH2).write.format("lake").mode("append").save(
        sink_t.path
    )

    oracle = _mk(spark, str(tmp_path / "oracle"))
    oracle.apply_changes(_events(spark, BATCH1), batch_id=0)
    oracle.apply_changes(_events(spark, BATCH2), batch_id=1)

    fresh = LakeTable(spark, sink_t.path)
    assert _state(fresh) == _state(oracle)
    # the native datasource read resolves the raw (unresolved) chain too
    ds = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in spark.read.format("lake").load(sink_t.path).collect()
    )
    assert ds == _state(oracle)


def test_sink_marks_deltas_unresolved(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(spark, BATCH1).write.format("lake").mode("append").save(t.path)
    man = LakeTable(spark, t.path).manifest()
    deltas = [
        fs
        for e in man["buckets"].values()
        for fs in (e.get("deltas") if "path" not in e else [])
    ]
    assert deltas and all(fs.get("unresolved") for fs in deltas)
    # lineage high-water marks rode the commit
    assert max(
        v["max_seq"] for v in man["lineage"].values()
    ) == 4


def test_single_chain_raw_batch_resolves_everywhere(spark, tmp_path):
    """ONE sink commit holding two versions of a key: read, read_keys and
    delete_where must all LWW-resolve the single (unresolved) file set —
    skipping resolution would surface the stale version as a live row."""
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(
        spark,
        [
            ("I", 1, "c1", 0, "user", "MATCHME", None, _ts(1)),
            ("U", 2, "c1", 0, "user", "safe", None, _ts(1, 6)),
            ("I", 3, "c2", 0, "user", "other", None, _ts(2)),
        ],
    ).write.format("lake").mode("append").save(t.path)
    fresh = LakeTable(spark, t.path)
    assert _state(fresh) == [
        ("c1", 0, "user", "safe", None, _ts(1, 6)),
        ("c2", 0, "user", "other", None, _ts(2)),
    ]
    assert [(r.conv_id, r.text) for r in fresh.read_keys(["c1"]).collect()] == [
        ("c1", "safe")
    ]
    # the superseded version matches the predicate; the LIVE one doesn't —
    # an unresolved-blind delete would tombstone c1 (both modes)
    res = fresh.delete_where("text = 'MATCHME'", mode="tombstone")
    assert res.get("n_deleted", 0) == 0 or res.get("mode") == "tombstone"
    assert ("c1", 0, "user", "safe", None, _ts(1, 6)) in _state(fresh)
    res = fresh.delete_where("text = 'MATCHME'", mode="rewrite")
    assert ("c1", 0, "user", "safe", None, _ts(1, 6)) in _state(fresh)


def test_sink_then_compaction_folds_chain(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(spark, BATCH1).write.format("lake").mode("append").save(t.path)
    _events(spark, BATCH2).write.format("lake").mode("append").save(t.path)
    before = _state(LakeTable(spark, t.path))
    t2 = LakeTable(spark, t.path)
    t2.compact()
    man = t2.manifest()
    for e in man["buckets"].values():
        for fs in t2._bucket_files(e):
            assert not fs.get("unresolved")
    assert _state(t2) == before


def test_sink_multi_partition_input_consolidates(spark, tmp_path):
    """An upstream at P tasks writes up to P files per bucket; they must
    consolidate into ONE manifest delta entry per bucket per commit and
    still read back exactly."""
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    rows = [
        ("I", i, f"c{i % 17}", i // 17, "user", f"msg {i}", None, _ts(1 + i % 11))
        for i in range(1, 401)
    ]
    _events(spark, rows).repartition(8).write.format("lake").mode(
        "append"
    ).save(t.path)
    man = LakeTable(spark, t.path).manifest()
    for e in man["buckets"].values():
        assert len(e.get("deltas", [])) <= 1
    oracle = _mk(spark, str(tmp_path / "oracle"))
    oracle.apply_changes(_events(spark, rows), batch_id=0)
    assert _state(LakeTable(spark, t.path)) == _state(oracle)


def test_sink_zone_stats_prune_read_range(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(spark, BATCH1).write.format("lake").mode("append").save(t.path)
    fresh = LakeTable(spark, t.path)
    man = fresh.manifest()
    assert any(
        "ts" in (fs.get("stats") or {})
        for e in man["buckets"].values()
        for fs in fresh._bucket_files(e)
    )
    got = sorted(
        r.conv_id for r in fresh.read_range(_ts(2), _ts(4), col="ts").collect()
    )
    assert got == ["c2", "c3"]


def test_sink_batch_id_exactly_once(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    ev = _events(spark, BATCH1)
    ev.write.format("lake").mode("append").option("batchId", 0).save(t.path)
    v1 = LakeTable(spark, t.path).manifest()["version"]
    ev.write.format("lake").mode("append").option("batchId", 0).save(t.path)
    fresh = LakeTable(spark, t.path)
    assert fresh.manifest()["version"] == v1  # redelivery = no-op commit
    assert fresh.read().count() == 4
    # and no orphaned sink dirs piled up from the skipped redelivery
    data = os.path.join(t.path, "data")
    sink_dirs = [d for d in os.listdir(data) if d.startswith("sink-")]
    assert len(sink_dirs) == 1


def test_sink_without_batch_id_appends_convergently(spark, tmp_path):
    """No ledger token: re-running the write appends again, converging by
    seq LWW (same rows, higher version) — documented batch-face default."""
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    ev = _events(spark, BATCH1)
    ev.write.format("lake").mode("append").save(t.path)
    ev.write.format("lake").mode("append").save(t.path)
    fresh = LakeTable(spark, t.path)
    assert fresh.manifest()["version"] == 2
    assert fresh.read().count() == 4


def test_sink_change_feed_and_time_travel(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(spark, BATCH1).write.format("lake").mode("append").save(t.path)
    _events(spark, BATCH2).write.format("lake").mode("append").save(t.path)
    fresh = LakeTable(spark, t.path)
    ch = fresh.changes(1)  # just the second sink commit
    assert ch.count() == len(BATCH2)
    assert sorted(r["_seq"] for r in ch.select("_seq").collect()) == [5, 6, 7, 8]
    assert fresh.read(version=1).count() == 4  # time travel to first commit


# ---------------------------------------------------------------- refusal
def test_sink_refusals(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    ev = _events(spark, BATCH1)

    with pytest.raises(Exception, match="overwrite"):
        ev.write.format("lake").mode("overwrite").save(t.path)
    with pytest.raises(Exception, match="no lake table"):
        ev.write.format("lake").mode("append").save(str(tmp_path / "nope"))
    with pytest.raises(Exception, match="missing the 'op' column"):
        ev.drop("op").write.format("lake").mode("append").save(t.path)
    with pytest.raises(Exception, match="missing the 'seq' column"):
        ev.drop("seq").write.format("lake").mode("append").save(t.path)
    with pytest.raises(Exception, match="missing key column"):
        ev.drop("turn_idx").write.format("lake").mode("append").save(t.path)
    with pytest.raises(Exception, match="not in the table schema"):
        ev.withColumn("extra", F.lit(1)).write.format("lake").mode(
            "append"
        ).save(t.path)
    with pytest.raises(Exception, match="op column must be"):
        ev.withColumn("op", F.lit("X")).write.format("lake").mode(
            "append"
        ).save(t.path)
    with pytest.raises(Exception, match="null key column"):
        ev.withColumn(
            "conv_id", F.expr("if(seq = 2, null, conv_id)")
        ).write.format("lake").mode("append").save(t.path)

    guarded = LakeTable(spark, str(tmp_path / "g"), num_buckets=4, merge_mode="mor")
    guarded.create(TRANSCRIPT_SCHEMA)
    guarded.add_constraint("role_ok", "role in ('user','assistant','system')")
    with pytest.raises(Exception, match="CHECK constraints"):
        ev.write.format("lake").mode("append").save(guarded.path)

    legacy = LakeTable(
        spark, str(tmp_path / "x"), num_buckets=4, merge_mode="mor",
        bucket_fn="xxhash64",
    )
    legacy.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(Exception, match="xxhash64"):
        ev.write.format("lake").mode("append").save(legacy.path)

    fr = LakeTable(
        spark, str(tmp_path / "fr"), num_buckets=4, merge_mode="mor",
        merge_engine="first_row",
    )
    fr.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(Exception, match="refuses delete"):
        _events(spark, BATCH2).write.format("lake").mode("append").save(fr.path)
    # D-free batches are fine on first_row
    _events(spark, BATCH1).write.format("lake").mode("append").save(fr.path)
    assert LakeTable(spark, fr.path).read().count() == 4


# ------------------------------------------ round-4 partitioned sink
def test_sink_writes_partitioned_table_matches_router(spark, tmp_path):
    """The native sink on a _spec.json target routes rows to their
    (partition, bucket) executor-side and must leave the table in
    EXACTLY the state the router's apply_changes leaves for the same
    events — including creating partitions that did not exist."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    rows = [
        ("I", 1, "c1", 0, "user", "jan", None, _ts(1)),
        ("I", 2, "c2", 0, "user", "feb", None, _ts(2)),
        ("U", 3, "c1", 0, "user", "jan v2", None, _ts(1)),
        ("I", 4, "c9", 0, "user", "undated", None, None),  # NULL -> __null__
        ("D", 5, "c2", 0, None, None, None, _ts(2)),
    ]
    sink_t = PartitionedTable(spark, str(tmp_path / "psink"),
                              num_buckets=4, merge_mode="mor")
    sink_t.create(TRANSCRIPT_SCHEMA)
    lib_t = PartitionedTable(spark, str(tmp_path / "plib"),
                             num_buckets=4, merge_mode="mor")
    lib_t.create(TRANSCRIPT_SCHEMA)
    lib_t.apply_changes(_events(spark, rows), batch_id=0)
    (_events(spark, rows).write.format("lake").mode("append")
        .option("batchId", 0).save(sink_t.path))
    fresh = PartitionedTable(spark, str(tmp_path / "psink"))
    assert sorted(fresh.partitions()) == sorted(lib_t.partitions())
    got = sorted((r.conv_id, r.turn_idx, r.text)
                 for r in fresh.read().collect())
    want = sorted((r.conv_id, r.turn_idx, r.text)
                  for r in lib_t.read().collect())
    assert got == want
    # the global cut advanced (routed reads see the batch w/o sync)
    assert fresh.manifest()["last_batch_id"] == 0
    # exactly-once: the same batchId re-offered is a global-ledger skip
    (_events(spark, rows).write.format("lake").mode("append")
        .option("batchId", 0).save(sink_t.path))
    assert sorted((r.conv_id, r.turn_idx, r.text)
                  for r in fresh.read().collect()) == want


def test_sink_partitioned_refusals(spark, tmp_path):
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    x = PartitionedTable(spark, str(tmp_path / "px"), num_buckets=2,
                         merge_mode="mor", cross_partition_upsert=True)
    x.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(Exception, match="cross_partition_upsert"):
        (_events(spark, BATCH1).write.format("lake").mode("append")
            .save(x.path))
    c = PartitionedTable(spark, str(tmp_path / "pc"), num_buckets=2,
                         merge_mode="mor")
    c.create(TRANSCRIPT_SCHEMA)
    with pytest.raises(Exception, match="branch"):
        (_events(spark, BATCH1).write.format("lake").mode("append")
            .option("branch", "audit").save(c.path))
    # constraints land in the spec -> refused
    c.add_constraint("turn_nonneg", "turn_idx >= 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        (_events(spark, BATCH1).write.format("lake").mode("append")
            .save(c.path))


def test_sink_refuses_null_seq(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    ev = _events(spark, BATCH1).withColumn(
        "seq", F.expr("if(conv_id = 'c2', null, seq)")
    )
    with pytest.raises(Exception, match="null seq"):
        ev.write.format("lake").mode("append").save(t.path)


def test_sink_staging_cleaned_after_commit_and_abort(spark, tmp_path):
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    _events(spark, BATCH1).write.format("lake").mode("append").save(t.path)
    tmp_root = os.path.join(t.path, "_sink_tmp")
    assert not os.path.isdir(tmp_root) or os.listdir(tmp_root) == []
    # failed write (null key raises in a task) must also leave no staging
    bad = _events(spark, BATCH2).withColumn(
        "conv_id", F.expr("if(seq = 6, null, conv_id)")
    )
    with pytest.raises(Exception):
        bad.write.format("lake").mode("append").save(t.path)
    assert not os.path.isdir(tmp_root) or os.listdir(tmp_root) == []


def test_expire_snapshots_sweeps_stale_staging(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.apply_changes(_events(spark, BATCH1), batch_id=0)
    stale = os.path.join(t.path, "_sink_tmp", "deadbeef0001")
    os.makedirs(stale)
    (open(os.path.join(stale, "x.parquet"), "w")).close()
    two_days_ago = dt.datetime.now().timestamp() - 2 * 86_400
    os.utime(stale, (two_days_ago, two_days_ago))
    fresh = os.path.join(t.path, "_sink_tmp", "deadbeef0002")
    os.makedirs(fresh)
    res = t.expire_snapshots(keep_last=1)
    assert res["swept_sink_staging"] == 1
    assert not os.path.exists(stale) and os.path.exists(fresh)


# ----------------------------------------- writer internals (no Spark job)
def _unit_writer(cls, path, spark):
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA as TS
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
        + list(TS.fields)
    )
    return cls({"path": path}, schema, False), schema


def _arrow_batches(spark, rows):
    from pyspark.sql.pandas.types import to_arrow_type

    df = _events(spark, rows)
    tbl = pa.Table.from_pandas(
        df.toPandas(),
        schema=pa.schema(
            [(f.name, to_arrow_type(f.dataType)) for f in df.schema.fields]
        ),
        preserve_index=False,
    )
    return tbl.to_batches()


def test_sink_write_tolerates_empty_arrow_batch(spark, tmp_path):
    """A zero-row RecordBatch (a filtering transform can empty a chunk)
    must be skipped, not tripped over by the op validation (pc.all over
    an empty array is null)."""
    from cdm_to_mods_spark.sources.lake_sink import LakeSinkWriter

    t = _mk(spark, str(tmp_path / "t"))
    writer, schema = _unit_writer(LakeSinkWriter, t.path, spark)
    batches = _arrow_batches(spark, BATCH1)
    empty = batches[0].slice(0, 0)
    msg = writer.write(iter([empty] + batches))
    writer.commit([msg])
    assert LakeTable(spark, t.path).read().count() == 4
    # all-empty input commits nothing
    writer2, _ = _unit_writer(LakeSinkWriter, t.path, spark)
    v = LakeTable(spark, t.path).manifest()["version"]
    writer2.commit([writer2.write(iter([empty]))])
    assert LakeTable(spark, t.path).manifest()["version"] == v


def test_stream_sink_refuses_fresh_checkpoint_behind_ledger(spark, tmp_path):
    """A streaming micro-batch id STRICTLY below the ledger is a fresh
    checkpoint against an already-fed table — must fail loudly, not
    silently swallow batches; == stays the redelivery skip; ignoreLedger
    re-ingests as new data."""
    from cdm_to_mods_spark.sources.lake_sink import LakeStreamSinkWriter

    t = _mk(spark, str(tmp_path / "t"))
    t.apply_changes(_events(spark, BATCH1), batch_id=0)
    t.apply_changes(_events(spark, BATCH2), batch_id=1)  # ledger at 1

    writer, _ = _unit_writer(LakeStreamSinkWriter, t.path, spark)
    msg = writer.write(iter(_arrow_batches(spark, BATCH1)))
    with pytest.raises(RuntimeError, match="behind the table's ledger"):
        writer.commit([msg], 0)
    # == ledger head: the legitimate checkpoint-redelivery skip
    writer2, _ = _unit_writer(LakeStreamSinkWriter, t.path, spark)
    msg2 = writer2.write(iter(_arrow_batches(spark, BATCH1)))
    v = LakeTable(spark, t.path).manifest()["version"]
    writer2.commit([msg2], 1)
    assert LakeTable(spark, t.path).manifest()["version"] == v
    # deliberate takeover: ignoreLedger commits without batch ids
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA as TS
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
        + list(TS.fields)
    )
    writer3 = LakeStreamSinkWriter(
        {"path": t.path, "ignoreLedger": "true"}, schema, False
    )
    msg3 = writer3.write(iter(_arrow_batches(
        spark, [("I", 99, "c9", 0, "user", "takeover", None, _ts(7))]
    )))
    writer3.commit([msg3], 0)
    fresh = LakeTable(spark, t.path)
    assert fresh.manifest()["version"] == v + 1
    assert fresh.read_keys(["c9"]).count() == 1
    assert fresh.manifest()["last_batch_id"] == 1  # ledger untouched


# ------------------------------------------------------------- streaming
def test_stream_sink_exactly_once_across_restart(spark, tmp_path):
    """writeStream.format('lake'): micro-batch ids feed the table ledger;
    a restart from the same checkpoint redelivers nothing, new files land
    as new batches."""
    register_lake(spark)
    t = _mk(spark, str(tmp_path / "t"))
    feed = tmp_path / "feed"
    feed.mkdir()
    ck = str(tmp_path / "ck")

    _events(spark, BATCH1).coalesce(1).write.parquet(str(feed / "b1"))

    def run():
        q = (
            spark.readStream.schema(EVENT_DDL)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(str(feed))
            .writeStream.format("lake")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(t.path)
        )
        q.awaitTermination(120)
        q.stop()

    run()
    fresh = LakeTable(spark, t.path)
    assert fresh.read().count() == 4
    v1 = fresh.manifest()["version"]

    run()  # restart, nothing new: ledger + checkpoint deliver nothing
    assert LakeTable(spark, t.path).manifest()["version"] == v1

    _events(spark, BATCH2).coalesce(1).write.parquet(str(feed / "b2"))
    run()
    oracle = _mk(spark, str(tmp_path / "oracle"))
    oracle.apply_changes(_events(spark, BATCH1), batch_id=0)
    oracle.apply_changes(_events(spark, BATCH2), batch_id=1)
    assert _state(LakeTable(spark, t.path)) == _state(oracle)


def test_stream_sink_into_partitioned_table(spark, tmp_path):
    """writeStream.format('lake') straight into the months(ts) x bucket
    layout — the production ingest shape: micro-batch ids feed the
    GLOBAL ledger (restart redelivers nothing), partitions materialize
    as their months arrive, and the final state equals the router
    replay."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    t = PartitionedTable(spark, str(tmp_path / "pt"), num_buckets=4,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    feed = tmp_path / "feed"
    feed.mkdir()
    ck = str(tmp_path / "ck")
    _events(spark, BATCH1).coalesce(1).write.parquet(str(feed / "b1"))

    def run():
        q = (
            spark.readStream.schema(EVENT_DDL)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(str(feed))
            .writeStream.format("lake")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(t.path)
        )
        q.awaitTermination(120)
        q.stop()

    run()
    fresh = PartitionedTable(spark, str(tmp_path / "pt"))
    assert fresh.read().count() == 4
    assert sorted(fresh.partitions()) == ["2025-01", "2025-02", "2025-03"]
    g1 = fresh.latest_version()
    run()  # restart: checkpoint + global ledger deliver nothing
    assert PartitionedTable(
        spark, str(tmp_path / "pt")).latest_version() == g1
    _events(spark, BATCH2).coalesce(1).write.parquet(str(feed / "b2"))
    run()
    oracle = PartitionedTable(spark, str(tmp_path / "po"), num_buckets=4,
                              merge_mode="mor")
    oracle.create(TRANSCRIPT_SCHEMA)
    oracle.apply_changes(_events(spark, BATCH1), batch_id=0)
    oracle.apply_changes(_events(spark, BATCH2), batch_id=1)
    final = PartitionedTable(spark, str(tmp_path / "pt"))
    got = sorted((r.conv_id, r.turn_idx, r.text, r.tool)
                 for r in final.read().collect())
    want = sorted((r.conv_id, r.turn_idx, r.text, r.tool)
                  for r in oracle.read().collect())
    assert got == want


def test_sink_new_partition_inherits_spec_write_strategy(spark, tmp_path):
    """Review finding (round 4): a sink-born partition must carry the
    OWNER's merge engine, not constructor defaults — a wrong engine in
    the manifest is adopted by every later reopen (partial_update
    patches would erase columns under whole-row LWW)."""
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    t = PartitionedTable(spark, str(tmp_path / "pe"), num_buckets=2,
                         merge_mode="mor", merge_engine="partial_update")
    t.create(TRANSCRIPT_SCHEMA)
    (_events(spark, [
        ("I", 1, "c1", 0, "user", "jan t0", "tools", _ts(1)),
    ]).write.format("lake").mode("append").option("batchId", 0)
        .save(t.path))
    sub = LakeTable(spark, os.path.join(t.path, "part=2025-01"))
    assert sub.merge_engine == "partial_update"
    # the engine actually behaves: a NULL-column patch through a PLAIN
    # reopen (no constructor args — the spec's recorded strategy must
    # carry, or a new partition would be stamped 'lww') leaves the
    # stored value alone
    t2 = PartitionedTable(spark, str(tmp_path / "pe"))
    assert t2._lake_kwargs["merge_engine"] == "partial_update"
    t2.apply_changes(_events(spark, [
        ("U", 2, "c1", 0, None, None, "patched", _ts(1)),
    ]), batch_id=1)
    r = t2.read().first()
    assert (r.text, r.tool) == ("jan t0", "patched")


def test_partitioned_sink_chains_fold_via_maintain(spark, tmp_path):
    """The dedicated-compactor topology composes with the partitioned
    sink: raw sink deltas accumulate per partition, pt.maintain() folds
    them, and the state survives the fold."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    t = PartitionedTable(spark, str(tmp_path / "pm"), num_buckets=2,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    for b, rows in enumerate((BATCH1, BATCH2)):
        (_events(spark, rows).write.format("lake").mode("append")
            .option("batchId", b).save(t.path))
    fresh = PartitionedTable(spark, str(tmp_path / "pm"))
    before = sorted((r.conv_id, r.turn_idx, r.text)
                    for r in fresh.read().collect())
    out = fresh.maintain(max_delta_chain=1)
    # at least one partition's chain was folded by the compactor
    assert any(
        any(a.get("action") == "compact" for a in res.get("actions", []))
        for res in out.values()
    ), out
    after = sorted((r.conv_id, r.turn_idx, r.text)
                   for r in PartitionedTable(
                       spark, str(tmp_path / "pm")).read().collect())
    assert after == before


def test_partitioned_sink_batches_ride_the_global_feed(spark, tmp_path):
    """Downstream CDC consumers must see sink-landed batches: the global
    change feed (and therefore the lake_cdf streaming source over a
    _spec table) reads the sink's commits through the global cuts."""
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable

    register_lake(spark)
    t = PartitionedTable(spark, str(tmp_path / "pf"), num_buckets=2,
                         merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    g0 = t.latest_version()
    (_events(spark, BATCH1).write.format("lake").mode("append")
        .option("batchId", 0).save(t.path))
    fresh = PartitionedTable(spark, str(tmp_path / "pf"))
    feed = fresh.changes(g0)
    got = {(r.conv_id, r.turn_idx) for r in feed.collect()}
    assert got == {("c1", 0), ("c1", 1), ("c2", 0), ("c3", 0)}
