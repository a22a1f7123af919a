"""Multi-table WAL routing: per-table convergence, unknown-table policy,
crash-between-table-commits exactly-once, streaming fan-out, and the
Debezium multi-table end-to-end — streaming/router.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.synth import synth_events
from cdm_to_mods_spark.streaming.router import (
    MultiTableReplay,
    UnknownTableError,
    apply_multi,
)

NAMES = ("alpha", "beta")


def _routed(spark, n=3000, seed=5):
    """Deterministic two-table WAL: route by conversation hash."""
    ev = synth_events(spark, n, 60, seed=seed)
    return ev.withColumn(
        "table",
        F.when(F.crc32(F.col("conv_id")) % 2 == 0, F.lit("alpha")).otherwise(
            F.lit("beta")
        ),
    )


def _fresh(spark, tmp_path, name):
    t = LakeTable(spark, str(tmp_path / name), num_buckets=8)
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in t.read().collect()
    }


def _oracles(spark, tmp_path, routed):
    """Per-table reference state: filter the WAL per table, apply directly."""
    out = {}
    for name in NAMES:
        ref = _fresh(spark, tmp_path, f"ref_{name}")
        ref.apply_changes(
            routed.filter(F.col("table") == name).drop("table"),
            batch_id=0,
            transform=apply_chain,
        )
        out[name] = _state(ref)
    return out


def test_apply_multi_converges_per_table(spark, tmp_path):
    routed = _routed(spark)
    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    # two batches split by seq — exercises cross-batch LWW per table
    m1 = apply_multi(tables, routed.filter("seq < 1500"), 1, transform=apply_chain)
    m2 = apply_multi(tables, routed.filter("seq >= 1500"), 2, transform=apply_chain)
    assert set(m1["tables"]) == set(NAMES) and not m1["unknown"]
    assert m2["tables"]["alpha"]["version"] > m1["tables"]["alpha"]["version"]
    want = _oracles(spark, tmp_path, routed)
    for n in NAMES:
        assert _state(tables[n]) == want[n], n


def test_unknown_table_error_and_ignore(spark, tmp_path):
    routed = _routed(spark, n=400).withColumn(
        "table", F.when(F.col("seq") % 7 == 0, F.lit("ghost")).otherwise(F.col("table"))
    )
    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    with pytest.raises(UnknownTableError, match="ghost"):
        apply_multi(tables, routed, 1, transform=apply_chain)
    # error path must not half-apply: ledgers untouched
    assert all(t.manifest()["last_batch_id"] == -1 for t in tables.values())
    m = apply_multi(tables, routed, 1, transform=apply_chain, unknown_tables="ignore")
    assert m["unknown"] == {"ghost": routed.filter("table = 'ghost'").count()}
    want = _oracles(spark, tmp_path, routed.filter("table != 'ghost'"))
    for n in NAMES:
        assert _state(tables[n]) == want[n], n


def test_crash_between_table_commits_converges(spark, tmp_path):
    """Redelivery after a crash that committed alpha but not beta: alpha's
    ledger skips, beta applies — per-table exactly-once composition."""
    routed = _routed(spark)
    b1, b2 = routed.filter("seq < 1500"), routed.filter("seq >= 1500")
    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    apply_multi(tables, b1, 1, transform=apply_chain)
    # simulate the torn batch: only alpha got batch 2 before the crash
    tables["alpha"].apply_changes(
        b2.filter("table = 'alpha'").drop("table"), batch_id=2, transform=apply_chain
    )
    v_alpha = tables["alpha"].manifest()["version"]
    m = apply_multi(tables, b2, 2, transform=apply_chain)  # redelivery
    assert m["tables"]["alpha"].get("skipped") is True
    assert tables["alpha"].manifest()["version"] == v_alpha  # no double-apply
    assert "skipped" not in m["tables"]["beta"]
    want = _oracles(spark, tmp_path, routed)
    for n in NAMES:
        assert _state(tables[n]) == want[n], n


def test_empty_slice_skips_table(spark, tmp_path):
    routed = _routed(spark, n=300).filter("table = 'alpha'")
    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    m = apply_multi(tables, routed, 1, transform=apply_chain)
    assert "beta" not in m["tables"]  # nothing to merge, no empty commit
    assert tables["beta"].manifest()["version"] == 0


def test_streaming_multi_table(spark, tmp_path):
    routed = _routed(spark, n=2500, seed=9)
    wal_dir = str(tmp_path / "wal")
    routed.coalesce(3).write.mode("overwrite").parquet(wal_dir)
    replay = MultiTableReplay(
        spark, wal_dir, {n: str(tmp_path / n) for n in NAMES},
        str(tmp_path / "ckpt"), num_buckets=8, max_files_per_trigger=1,
    )
    tables = replay.run_to_completion(timeout_sec=300)
    assert len(replay.batch_metrics) >= 2
    want = _oracles(spark, tmp_path, routed)
    for n in NAMES:
        assert _state(tables[n]) == want[n], n
    # restart on the same checkpoint: backlog drained, nothing re-applies
    replay2 = MultiTableReplay(
        spark, wal_dir, {n: str(tmp_path / n) for n in NAMES},
        str(tmp_path / "ckpt"), num_buckets=8,
    )
    t2 = replay2.run_to_completion(timeout_sec=300)
    for n in NAMES:
        assert t2[n].manifest()["version"] == tables[n].manifest()["version"]


def test_debezium_multi_table_end_to_end(spark, tmp_path):
    """One Debezium bus carrying two tables → routed streaming replay."""
    from cdm_to_mods_spark.sources.debezium import to_debezium

    routed = _routed(spark, n=2000, seed=13)
    dz_dir = str(tmp_path / "bus")
    to_debezium(routed, table_col="table").coalesce(2).write.mode(
        "overwrite"
    ).text(dz_dir)
    replay = MultiTableReplay(
        spark, dz_dir, {n: str(tmp_path / n) for n in NAMES},
        str(tmp_path / "ckpt"), num_buckets=8, source_format="debezium",
    )
    tables = replay.run_to_completion(timeout_sec=300)
    want = _oracles(spark, tmp_path, routed)
    for n in NAMES:
        assert _state(tables[n]) == want[n], n


# ---------------------------------------------------------- consistent cut
def _ev_for(spark, table, rows):
    df = spark.createDataFrame(
        rows,
        "op string, seq long, conv_id string, turn_idx int, role string, "
        "text string, tool string",
    )
    return df.withColumn("table", F.lit(table))


def test_consistent_cut_hides_torn_batch(spark, tmp_path):
    """A crash window where alpha committed batch 2 but beta did not:
    live reads are torn, the cut read is not — beta's missing batch is
    hidden on ALPHA too by time-traveling alpha below it."""
    from cdm_to_mods_spark.streaming.router import (
        consistent_cut,
        read_consistent,
    )

    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    b0 = _ev_for(spark, "alpha", [("I", 1, "a1", 0, "user", "x", None)]).union(
        _ev_for(spark, "beta", [("I", 2, "b1", 0, "user", "y", None)])
    )
    b1 = _ev_for(spark, "alpha", [("U", 3, "a1", 0, "user", "x2", None)]).union(
        _ev_for(spark, "beta", [("U", 4, "b1", 0, "user", "y2", None)])
    )
    apply_multi(tables, b0, 0, transform=None)
    apply_multi(tables, b1, 1, transform=None)
    # torn batch 2: alpha commits, beta crashes before its turn
    tables["alpha"].apply_changes(
        _ev_for(spark, "alpha", [("U", 5, "a1", 0, "user", "x3", None)]).drop(
            "table"
        ),
        batch_id=2,
        transform=None,
    )
    assert [r.text for r in tables["alpha"].read().collect()] == ["x3"]  # live: torn

    cut = consistent_cut(tables)
    assert cut["batch_id"] == 1
    assert cut["last_batch_ids"] == {"alpha": 2, "beta": 1}
    views = read_consistent(tables)
    assert [r.text for r in views["alpha"].collect()] == ["x2"]  # batch 2 hidden
    assert [r.text for r in views["beta"].collect()] == ["y2"]

    # assume_complete includes the newest batch (post-drain knowledge)
    done = read_consistent(tables, assume_complete=True)
    assert [r.text for r in done["alpha"].collect()] == ["x3"]
    # explicit historical cut reproduces batch 0's world
    past = read_consistent(tables, batch_id=0)
    assert [r.text for r in past["alpha"].collect()] == ["x"]
    assert [r.text for r in past["beta"].collect()] == ["y"]
    # pre-stream cut: the empty CREATE state
    empty = read_consistent(tables, batch_id=-1)
    assert all(df.count() == 0 for df in empty.values())


def test_consistent_cut_skips_maintenance_rejects_out_of_band(spark, tmp_path):
    from cdm_to_mods_spark.streaming.router import consistent_cut

    tables = {n: _fresh(spark, tmp_path, n) for n in NAMES}
    apply_multi(
        tables,
        _ev_for(spark, "alpha", [("I", 1, "a1", 0, "user", "x", None)]).union(
            _ev_for(spark, "beta", [("I", 2, "b1", 0, "user", "y", None)])
        ),
        0,
        transform=None,
    )
    apply_multi(
        tables,
        _ev_for(spark, "alpha", [("U", 3, "a1", 0, "user", "x2", None)]),
        1,
        transform=None,
    )
    # compaction above the cut commit is skipped, not a disqualifier
    tables["alpha"].compact()
    cut = consistent_cut(tables, assume_complete=True)
    assert cut["batch_id"] == 1
    # beta had no rows in batch 1: its batch-0 version IS its cut-1 state
    assert cut["versions"]["beta"] == 1

    # out-of-band mutation disqualifies the table from cut reads
    tables["beta"].delete_where("conv_id = 'b1'")
    with pytest.raises(ValueError, match="out-of-band"):
        consistent_cut(tables, assume_complete=True)


def test_consistent_cut_expired_raises(spark, tmp_path):
    from cdm_to_mods_spark.plans.lake import SnapshotExpiredError
    from cdm_to_mods_spark.streaming.router import consistent_cut

    tables = {"alpha": _fresh(spark, tmp_path, "alpha")}
    for b in range(3):
        apply_multi(
            tables,
            _ev_for(spark, "alpha", [("I", b + 1, f"a{b}", 0, "user", "x", None)]),
            b,
            transform=None,
        )
    tables["alpha"].expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError, match="cannot serve"):
        consistent_cut(tables)  # cut 1 needs the expired batch-1 manifest
    # the head batch is still resolvable
    assert consistent_cut(tables, assume_complete=True)["versions"]["alpha"] == 3


def test_consistent_cut_resolves_publish_and_clone(spark, tmp_path):
    """A WAP publish squash and a shallow clone both carry the bus prefix
    they reflect (last_batch_id) — cut reads resolve TO them instead of
    time-traveling below into pre-fork emptiness; merge_into with a
    batch_id is still out-of-band."""
    from cdm_to_mods_spark.streaming.router import consistent_cut

    base = _fresh(spark, tmp_path, "alpha")
    # stage two router batches on a WAP branch, then publish
    base.create_branch("audit")
    staged = LakeTable(spark, str(tmp_path / "alpha"), branch="audit")
    for b in range(2):
        staged.apply_changes(
            _ev_for(spark, "alpha", [("I", b + 1, f"a{b}", 0, "user", "x", None)])
            .drop("table"),
            batch_id=b,
            transform=None,
        )
    base.publish_branch("audit")
    pub = LakeTable(spark, str(tmp_path / "alpha"))
    cut = consistent_cut({"alpha": pub}, assume_complete=True)
    assert cut["batch_id"] == 1
    from cdm_to_mods_spark.streaming.router import read_consistent

    views = read_consistent({"alpha": pub}, assume_complete=True)
    assert views["alpha"].count() == 2  # the publish squash IS the cut state

    # clone inherits the prefix: head cut resolves to the clone's v0
    cl = pub.clone(str(tmp_path / "alpha-clone"))
    ccut = consistent_cut({"alpha": cl}, assume_complete=True)
    assert ccut["batch_id"] == 1 and ccut["versions"]["alpha"] == 0
    # ...but a cut BELOW the clone's prefix is unservable (no history)
    from cdm_to_mods_spark.plans.lake import SnapshotExpiredError

    with pytest.raises(SnapshotExpiredError, match="cannot serve"):
        consistent_cut({"alpha": cl})  # cut 0 < clone's folded prefix 1

    # merge_into is out-of-band even with a batch_id (upsert numbering)
    pub.merge_into(
        _ev_for(spark, "alpha", [("I", 9, "zz", 0, "user", "m", None)])
        .drop("table", "op", "seq"),
        when_not_matched_insert=True,
        batch_id=7,
    )
    with pytest.raises(ValueError, match="merge_into"):
        consistent_cut({"alpha": pub}, assume_complete=True)


def test_consistent_cut_inside_publish_squash_raises(spark, tmp_path):
    """A cut STRICTLY INSIDE a publish's folded window (default
    assume_complete=False: cut = last_batch_id - 1) is unservable — the
    batches <= cut exist only inside the squash. Pre-fix the walk
    silently descended to the pre-fork CREATE state and returned an
    EMPTY read labeled as the cut."""
    from cdm_to_mods_spark.plans.lake import SnapshotExpiredError
    from cdm_to_mods_spark.streaming.router import consistent_cut

    base = _fresh(spark, tmp_path, "alpha")
    base.create_branch("audit")
    staged = LakeTable(spark, str(tmp_path / "alpha"), branch="audit")
    for b in range(2):
        staged.apply_changes(
            _ev_for(spark, "alpha",
                    [("I", b + 1, f"a{b}", 0, "user", "x", None)])
            .drop("table"),
            batch_id=b,
            transform=None,
        )
    base.publish_branch("audit")
    pub = LakeTable(spark, str(tmp_path / "alpha"))
    with pytest.raises(SnapshotExpiredError, match="cannot serve"):
        consistent_cut({"alpha": pub})  # cut 0 folded inside lb=1 squash


def test_consistent_cut_rejects_out_of_band_ops_with_batch_id(spark,
                                                              tmp_path):
    """overwrite_where / quarantine replays carry their own batch_id as
    an idempotence token — pre-fix the bid short-circuit mislabeled them
    as bus commits; they must disqualify like merge_into does."""
    from cdm_to_mods_spark.streaming.router import consistent_cut

    t = _fresh(spark, tmp_path, "alpha")
    apply_multi(
        {"alpha": t},
        _ev_for(spark, "alpha", [("I", 1, "a0", 0, "user", "x", None)]),
        0, transform=None,
    )
    t.overwrite_where(
        spark.createDataFrame(
            [("a0", 0, "user", "y", None, None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        ),
        "conv_id = 'a0'",
        batch_id=50,
    )
    with pytest.raises(ValueError, match="overwrite_where"):
        consistent_cut({"alpha": t}, assume_complete=True)


def test_unknown_table_error_renders_null_discriminator(spark, tmp_path):
    """A null table discriminator plus an unconfigured name must raise
    the actionable UnknownTableError — pre-fix sorted() crashed with
    TypeError on str-vs-None and masked it."""
    t = _fresh(spark, tmp_path, "alpha")
    ev = spark.createDataFrame(
        [("I", 1, "a0", 0, "user", "x", None, "typo"),
         ("I", 2, "a1", 0, "user", "y", None, None)],
        "op string, seq long, conv_id string, turn_idx int, role string, "
        "text string, tool string, table string",
    )
    with pytest.raises(UnknownTableError, match="<null>"):
        apply_multi({"alpha": t}, ev, 0, transform=None)
