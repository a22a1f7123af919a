"""merge_engine="partial_update": column-level merge (Paimon
partial-update semantics) through every engine plane — in-batch collapse,
MoR delta resolution, compaction folds, the CoW merge, reopen adoption,
and a pure-python full-history differential oracle on in-order feeds.

Reference analog: the per-field contentDM record assembly — the reference
builds each MODS record by layering field-level values (utilities.py's
field mapping loops), never by whole-record replacement; a partial-update
table is that rule at CDC scale (producers patch the columns they own).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.operators.dedup import resolve_partial_update
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)


def _ev(op, seq, conv, turn, role=None, text=None, tool=None):
    return (op, seq, conv, turn, role, text, tool, None, None)


def _state(table):
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in table.read().collect()
    }


def partial_oracle(events):
    """Full-history reference semantics: apply events in (seq, op-rank)
    order; I/U merges its NON-NULL payload columns, D kills the row (a
    later I/U re-creates it from scratch)."""
    oprank = {"D": 0, "I": 1, "U": 2}
    state: dict = {}
    for op, seq, conv, turn, role, text, tool, _, _ in sorted(
        events, key=lambda e: (e[1], oprank[e[0]])
    ):
        k = (conv, turn)
        if op == "D":
            state.pop(k, None)
            continue
        cur = state.get(k, (None, None, None))
        state[k] = (
            role if role is not None else cur[0],
            text if text is not None else cur[1],
            tool if tool is not None else cur[2],
        )
    return state


# ------------------------------------------------------------ operator
def test_resolver_merges_columns_and_applies_deletes(spark):
    df = spark.createDataFrame(
        [
            _ev("I", 1, "c1", 0, role="user", text="hello"),
            _ev("U", 5, "c1", 0, tool="search"),          # patch: tool only
            _ev("U", 3, "c1", 0, text="hello v2"),        # out of order, < 5
            _ev("I", 1, "c2", 0, role="user", text="x"),
            _ev("D", 4, "c2", 0),                          # dead
            _ev("I", 2, "c3", 0, text="pre"),
            _ev("D", 4, "c3", 0),
            _ev("U", 6, "c3", 0, role="fresh"),            # re-created
        ],
        EVENT_DDL,
    )
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.seq, r.role, r.text, r.tool)
        for r in resolve_partial_update(df, ("conv_id", "turn_idx")).collect()
    }
    assert got[("c1", 0)] == ("U", 5, "user", "hello v2", "search")
    # dead rows come back as tombstones with all-null payloads
    assert got[("c2", 0)] == ("D", 4, None, None, None)
    # pre-delete writes are dead even with no later write to the column
    assert got[("c3", 0)] == ("U", 6, "fresh", None, None)


def test_resolver_upsert_wins_shared_lsn_like_lww(spark):
    # same tie rule as latest_per_key: at an equal seq, 'U' > 'D'
    df = spark.createDataFrame(
        [_ev("U", 7, "c1", 0, text="kept"), _ev("D", 7, "c1", 0)], EVENT_DDL
    )
    row = resolve_partial_update(df, ("conv_id", "turn_idx")).collect()[0]
    assert (row.op, row.text) == ("U", "kept")


# ----------------------------------------------------------- lake table
@pytest.fixture(params=["mor", "cow"])
def ptable(spark, tmp_table, request):
    t = LakeTable(
        spark,
        tmp_table,
        num_buckets=4,
        merge_mode=request.param,
        merge_engine="partial_update",
        compact_deltas=3,
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def _apply(t, rows, batch_id):
    t.apply_changes(
        t.spark.createDataFrame(rows, EVENT_DDL), batch_id=batch_id
    )


def test_patches_merge_across_batches(spark, ptable):
    _apply(ptable, [_ev("I", 1, "c1", 0, role="user", text="hello")], 0)
    _apply(ptable, [_ev("U", 2, "c1", 0, tool="search")], 1)
    _apply(ptable, [_ev("U", 3, "c1", 0, text="edited")], 2)
    assert _state(ptable) == {("c1", 0): ("user", "edited", "search")}


def test_patches_merge_within_one_batch(spark, ptable):
    # in-batch collapse must keep EARLIER columns, not just the last row
    _apply(
        ptable,
        [
            _ev("I", 1, "c1", 0, role="user"),
            _ev("U", 2, "c1", 0, text="t"),
            _ev("U", 3, "c1", 0, tool="search"),
        ],
        0,
    )
    assert _state(ptable) == {("c1", 0): ("user", "t", "search")}


def test_delete_then_recreate_resets_columns(spark, ptable):
    _apply(ptable, [_ev("I", 1, "c1", 0, role="user", text="old")], 0)
    _apply(ptable, [_ev("D", 2, "c1", 0)], 1)
    assert _state(ptable) == {}
    _apply(ptable, [_ev("U", 3, "c1", 0, tool="fresh")], 2)
    # the old role/text stay dead: the delete reset the row
    assert _state(ptable) == {("c1", 0): (None, None, "fresh")}


def test_folds_preserve_partial_state(spark, ptable):
    # enough batches to trip compact_deltas=3 inline folding under mor
    _apply(ptable, [_ev("I", 1, "c1", 0, role="user")], 0)
    _apply(ptable, [_ev("U", 2, "c1", 0, text="t1")], 1)
    _apply(ptable, [_ev("U", 3, "c1", 0, tool="tl")], 2)
    _apply(ptable, [_ev("U", 4, "c1", 0, text="t2")], 3)
    _apply(ptable, [_ev("U", 5, "c1", 0, role="asst")], 4)
    ptable.compact()
    assert _state(ptable) == {("c1", 0): ("asst", "t2", "tl")}
    # and a post-compaction patch still merges against the folded base
    _apply(ptable, [_ev("U", 6, "c1", 0, tool="tl2")], 5)
    assert _state(ptable) == {("c1", 0): ("asst", "t2", "tl2")}


def test_reopen_adopts_engine_and_detail_reports_it(spark, ptable):
    _apply(ptable, [_ev("I", 1, "c1", 0, text="x")], 0)
    # reopen WITHOUT the arg: manifest is authoritative (bucket_fn rule)
    fresh = LakeTable(spark, ptable.path, merge_mode=ptable.merge_mode)
    assert fresh.merge_engine == "partial_update"
    assert fresh.describe_detail()["merge_engine"] == "partial_update"
    fresh.apply_changes(
        spark.createDataFrame([_ev("U", 2, "c1", 0, role="r")], EVENT_DDL),
        batch_id=1,
    )
    assert _state(fresh) == {("c1", 0): ("r", "x", None)}


def test_lww_tables_unaffected(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    _apply(t, [_ev("I", 1, "c1", 0, role="user", text="hello")], 0)
    _apply(t, [_ev("U", 2, "c1", 0, tool="search")], 1)
    # whole-row LWW: the patch's nulls REPLACE the old columns
    assert _state(t) == {("c1", 0): (None, None, "search")}
    assert t.merge_engine == "lww"
    # the engine choice is persisted and adopted on reopen
    assert LakeTable(spark, t.path).merge_engine == "lww"


def test_differential_vs_full_history_oracle(spark, ptable):
    """Deterministic torn in-order feed: per-key monotone seqs (the binlog
    contract) across interleaved batches; engine == full-history oracle."""
    import random

    rng = random.Random(7)
    events, seq = [], 0
    cols = ["role", "text", "tool"]
    for _ in range(300):
        seq += 1
        conv, turn = f"c{rng.randrange(12)}", rng.randrange(3)
        op = rng.choices(["I", "U", "D"], weights=[2, 6, 1])[0]
        kw = {}
        if op != "D":
            for c in rng.sample(cols, rng.randrange(1, 3)):
                kw[c] = f"{c}{seq}"
        events.append(_ev(op, seq, conv, turn, **kw))
    for i, lo in enumerate(range(0, len(events), 60)):
        _apply(ptable, events[lo : lo + 60], i)
    ptable.compact()
    assert _state(ptable) == partial_oracle(events)


def test_replication_between_partial_tables_converges(spark, ptable, tmp_path):
    """changes() emits the PATCH rows; replaying them into a second
    partial table reproduces the state (the mirror contract)."""
    if ptable.merge_mode == "cow":
        pytest.skip("feed replay check uses the mor delta feed")
    _apply(ptable, [_ev("I", 1, "c1", 0, role="user", text="t0")], 0)
    _apply(ptable, [_ev("U", 2, "c1", 0, tool="s")], 1)
    _apply(ptable, [_ev("U", 3, "c1", 0, text="t1"), _ev("D", 4, "c2", 0)], 2)
    dst = LakeTable(
        spark, str(tmp_path / "dst"), num_buckets=4, merge_mode="mor",
        merge_engine="partial_update",
    )
    dst.create(TRANSCRIPT_SCHEMA)
    feed = ptable.changes(0)
    ev = feed.select(
        F.when(F.col("_deleted"), "D").otherwise("U").alias("op"),
        F.col("_seq").alias("seq"),
        *[f.name for f in TRANSCRIPT_SCHEMA.fields],
    )
    dst.apply_changes(ev, batch_id=0)
    assert _state(dst) == _state(ptable)


# --------------------------------------------------------- aggregate
AGG_DDL = (
    "op string, seq long, conv_id string, turn_idx int, "
    "n_tokens long, max_ts long, flagged boolean, label string"
)
AGG_SCHEMA_DDL = (
    "conv_id string, turn_idx int, n_tokens long, max_ts long, "
    "flagged boolean, label string"
)
AGG_SPEC = {"n_tokens": "sum", "max_ts": "max", "flagged": "bool_or"}


def _aev(op, seq, conv, turn, n=None, ts=None, fl=None, label=None):
    return (op, seq, conv, turn, n, ts, fl, label)


@pytest.fixture(params=["mor", "cow"])
def atable(spark, tmp_table, request):
    from pyspark.sql import types as T

    t = LakeTable(
        spark,
        tmp_table,
        num_buckets=4,
        merge_mode=request.param,
        merge_engine="aggregate",
        agg_spec=AGG_SPEC,
        compact_deltas=2,
        stats_cols=(),
    )
    t.create(T._parse_datatype_string(AGG_SCHEMA_DDL))
    return t


def _astate(table):
    return {
        (r.conv_id, r.turn_idx): (r.n_tokens, r.max_ts, r.flagged, r.label)
        for r in table.read().collect()
    }


def _aapply(t, rows, batch_id):
    t.apply_changes(t.spark.createDataFrame(rows, AGG_DDL), batch_id=batch_id)


def test_aggregate_rolls_up_within_and_across_batches(spark, atable):
    _aapply(
        atable,
        [
            _aev("I", 1, "c1", 0, n=10, ts=100, fl=False, label="a"),
            _aev("U", 2, "c1", 0, n=5, ts=90, fl=False),
        ],
        0,
    )
    _aapply(atable, [_aev("U", 3, "c1", 0, n=7, ts=250, fl=True, label="b")], 1)
    # sum across all three, max ts, bool_or, last label by rank
    assert _astate(atable) == {("c1", 0): (22, 250, True, "b")}


def test_aggregate_folds_compose(spark, atable):
    # enough batches to trip compact_deltas=2 inline folds under mor,
    # then an explicit compact: a stored partial sum must re-enter the
    # rollup as a contribution, never double-count
    for i in range(6):
        _aapply(atable, [_aev("U", i + 1, "c1", 0, n=1, ts=i)], i)
    atable.compact()
    _aapply(atable, [_aev("U", 10, "c1", 0, n=1, ts=99)], 9)
    assert _astate(atable) == {("c1", 0): (7, 99, None, None)}


def test_aggregate_refuses_deletes_and_set_style_mutations(spark, atable):
    _aapply(atable, [_aev("I", 1, "c1", 0, n=1)], 0)
    with pytest.raises(Exception, match="not retractable|refuses delete"):
        _aapply(atable, [_aev("D", 2, "c1", 0)], 1)
    # the failed batch must not have committed: exactly-once replay works
    _aapply(atable, [_aev("U", 3, "c1", 0, n=2)], 1)
    assert _astate(atable)[("c1", 0)][0] == 3
    with pytest.raises(ValueError, match="not retractable"):
        atable.delete_where("turn_idx = 0")
    with pytest.raises(ValueError, match="not retractable"):
        atable.update_where("turn_idx = 0", {"label": "'x'"})
    with pytest.raises(ValueError, match="not retractable"):
        atable.merge_into(
            spark.createDataFrame([("c1", 0, None, None, None, None)],
                                  AGG_SCHEMA_DDL)
        )


def test_aggregate_reopen_adopts_spec(spark, atable):
    _aapply(atable, [_aev("I", 1, "c1", 0, n=4)], 0)
    fresh = LakeTable(spark, atable.path, merge_mode=atable.merge_mode,
                      stats_cols=())
    assert fresh.merge_engine == "aggregate"
    assert fresh.agg_spec == AGG_SPEC
    _aapply(fresh, [_aev("U", 2, "c1", 0, n=6)], 1)
    assert _astate(fresh)[("c1", 0)][0] == 10


def test_aggregate_feed_replays_partials_into_replica(spark, atable, tmp_path):
    from pyspark.sql import types as T

    if atable.merge_mode == "cow":
        pytest.skip("feed replay check uses the mor delta feed")
    _aapply(atable, [_aev("I", 1, "c1", 0, n=10, ts=5)], 0)
    _aapply(atable, [_aev("U", 2, "c1", 0, n=3, ts=9, fl=True)], 1)
    dst = LakeTable(
        spark, str(tmp_path / "dst"), num_buckets=4, merge_mode="mor",
        merge_engine="aggregate", agg_spec=AGG_SPEC, stats_cols=(),
    )
    dst.create(T._parse_datatype_string(AGG_SCHEMA_DDL))
    ev = atable.changes(0).select(
        F.lit("U").alias("op"),
        F.col("_seq").alias("seq"),
        "conv_id", "turn_idx", "n_tokens", "max_ts", "flagged", "label",
    )
    dst.apply_changes(ev, batch_id=0)
    assert _astate(dst) == _astate(atable)


def test_agg_spec_validation(spark, tmp_table):
    with pytest.raises(ValueError, match="unknown agg fn"):
        LakeTable(spark, tmp_table, merge_engine="aggregate",
                  agg_spec={"n": "count"})
    with pytest.raises(ValueError, match="requires merge_engine"):
        LakeTable(spark, tmp_table, agg_spec={"n": "sum"})
    with pytest.raises(ValueError, match="key column"):
        LakeTable(spark, tmp_table, merge_engine="aggregate",
                  agg_spec={"conv_id": "max"})


# ------------------------------------------------------------ first_row


@pytest.fixture(params=["mor", "cow"])
def ftable(spark, tmp_table, request):
    t = LakeTable(
        spark,
        tmp_table,
        num_buckets=4,
        merge_mode=request.param,
        merge_engine="first_row",
        compact_deltas=2,
        stats_cols=(),
    )
    t.create(TRANSCRIPT_SCHEMA)
    return t


def first_oracle(events):
    """Reference semantics: per key, the event with the lowest (seq,
    op-rank) wins forever."""
    oprank = {"I": 0, "U": 1}
    best: dict = {}
    for op, seq, conv, turn, role, text, tool, _, _ in events:
        k = (conv, turn)
        cand = (seq, oprank[op], role, text, tool)
        if k not in best or cand < best[k]:
            best[k] = cand
    return {k: v[2:] for k, v in best.items()}


def test_first_row_keeps_first_within_and_across_batches(spark, ftable):
    b0 = [
        _ev("I", 5, "c1", 0, role="u", text="first"),
        _ev("U", 9, "c1", 0, text="second-in-batch"),
        _ev("I", 7, "c2", 0, text="x"),
    ]
    # later batch: higher seq loses; LOWER seq (late arrival of the true
    # source-order first) wins — min-seq is the convergent rule
    b1 = [
        _ev("U", 50, "c1", 0, text="late-high"),
        _ev("U", 3, "c2", 0, text="early-low"),
        _ev("I", 11, "c3", 0, text="new"),
    ]
    _apply(ftable, b0, 0)
    _apply(ftable, b1, 1)
    assert _state(ftable) == first_oracle(b0 + b1)


def test_first_row_survives_folds_and_reopen(spark, ftable):
    rows = []
    for i in range(6):  # compact_deltas=2 → multiple inline folds
        rows.append([_ev("U", 100 - i, "c1", 0, text=f"v{100 - i}"),
                     _ev("I", 200 + i, f"c{i}", 1, text="k")])
        _apply(ftable, rows[-1], i)
    flat = [e for b in rows for e in b]
    assert _state(ftable) == first_oracle(flat)
    fresh = LakeTable(spark, ftable.path, merge_mode=ftable.merge_mode)
    assert fresh.merge_engine == "first_row"
    assert _state(fresh) == first_oracle(flat)


def test_first_row_refuses_deletes_and_mutations(spark, ftable):
    _apply(ftable, [_ev("I", 1, "c1", 0)], 0)
    with pytest.raises(Exception, match="refuses delete"):
        _apply(ftable, [_ev("D", 9, "c1", 0)], 1)
    # the refused batch must not have committed — exactly-once intact
    _apply(ftable, [_ev("I", 2, "c9", 0)], 1)
    with pytest.raises(ValueError, match="first_row"):
        ftable.delete_where("conv_id = 'c1'")
    with pytest.raises(ValueError, match="first_row"):
        ftable.update_where("conv_id = 'c1'", {"text": "'x'"})


def test_first_row_replication_converges(spark, ftable, tmp_path):
    if ftable.merge_mode == "cow":
        pytest.skip("changes() under cow needs cow_change_feed (covered in test_lake)")
    dst = LakeTable(
        spark, str(tmp_path / "dst"), num_buckets=4,
        merge_mode="mor", merge_engine="first_row",
    )
    dst.create(TRANSCRIPT_SCHEMA)
    _apply(ftable, [_ev("I", 5, "c1", 0, text="a"), _ev("I", 3, "c2", 0)], 0)
    _apply(ftable, [_ev("U", 2, "c1", 0, text="earlier")], 1)
    feed = ftable.changes(0).withColumnRenamed("_seq", "seq").withColumn(
        "op", F.lit("U")
    ).drop("_deleted")
    dst.apply_changes(feed, batch_id=0)
    assert _state(dst) == _state(ftable)


# ------------------------------------------------- review regressions


def test_clone_handle_adopts_engine(spark, ptable, tmp_path):
    _apply(ptable, [_ev("I", 1, "c1", 0, role="u", text="h", tool="s")], 0)
    dst = ptable.clone(str(tmp_path / "dst"))
    # the RETURNED handle (not just a reopen) must resolve with the
    # source's engine — its first commit would otherwise fork the manifest
    assert dst.merge_engine == "partial_update"
    _apply(dst, [("U", 5, "c1", 0, None, "patched", None, None, None)], 1)
    assert _state(dst) == {("c1", 0): ("u", "patched", "s")}


def test_agg_spec_typo_refused_at_create(spark, tmp_table):
    from pyspark.sql import types as T

    t = LakeTable(
        spark, tmp_table, num_buckets=4, merge_mode="mor",
        merge_engine="aggregate", agg_spec={"n_token": "sum"},  # typo
    )
    with pytest.raises(ValueError, match="n_token"):
        t.create(T._parse_datatype_string(AGG_SCHEMA_DDL))


def test_agg_spec_dropped_column_refused_at_apply(spark, atable):
    _aapply(atable, [_aev("I", 1, "c1", 0, n=10)], 0)
    atable.drop_column("n_tokens")
    from cdm_to_mods_spark.plans.lake import SchemaEvolutionError

    with pytest.raises(SchemaEvolutionError, match="n_tokens"):
        _aapply(atable, [_aev("I", 2, "c1", 1, n=5)], 1)


def test_aggregate_quarantine_replay_needs_batch_id(spark, tmp_path):
    from pyspark.sql import types as T

    t = LakeTable(
        spark, str(tmp_path / "t"), num_buckets=4, merge_mode="mor",
        merge_engine="aggregate", agg_spec=AGG_SPEC,
        quarantine_path=str(tmp_path / "q"),
    )
    t.create(T._parse_datatype_string(AGG_SCHEMA_DDL))
    with pytest.raises(ValueError, match="batch_id"):
        t.reprocess_quarantine(lambda df: df)


def test_first_row_insert_only_merge_into(spark, ftable):
    _apply(ftable, [_ev("I", 1, "c1", 0, text="keep")], 0)
    src = spark.createDataFrame(
        [("c1", 0, "u", "clobber", None, None),
         ("c9", 0, "u", "new", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ftable.merge_into(src, when_not_matched_insert=True, batch_id=1)
    st = _state(ftable)
    assert st[("c1", 0)][1] == "keep" and st[("c9", 0)][1] == "new"
    with pytest.raises(ValueError, match="first_row"):
        ftable.merge_into(
            src, when_matched_update={"text": "s.text"}, batch_id=2
        )
