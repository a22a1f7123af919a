"""Property-based CDC semantics: for ANY event log — arbitrary op mix,
out-of-order seq arrival, late cross-batch updates, whole-key tombstones,
messy text/role/tool/date shapes — replaying through the lake MERGE must
converge to the independent pandas oracle (tests/oracle.py), under both
merge modes, and re-applying a committed batch must be a no-op.

Deterministic: hypothesis derandomized (fixed example set per code
version), bounded examples since each one drives real Spark jobs."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from tests.oracle import replay_oracle

EVENT_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts_raw string, ingest_ts timestamp"
)

_TEXTS = [None, "x", "  a  b ", "t<br>u@@@v", "— dash; ", "plain.", ""]
_ROLES = [None, "user", "HUMAN", " Bot ", "model", "weird", "tool"]
_TOOLS = [None, "none", "", "calc", "WebSearch", "browser", "odd"]
_DATES = [None, "2001-02-03", "2001-02-03 04:05", "3/4/2005", "ca. 1920",
          "[1936]", "1999?", "2005-07", "199-", "between 1920 and 1930",
          "total junk"]


@st.composite
def event_logs(draw):
    n_convs = draw(st.integers(1, 4))
    n_events = draw(st.integers(1, 36))
    arrival = draw(st.permutations(range(1, n_events + 1)))
    events = []
    for i in range(n_events):
        events.append((
            draw(st.sampled_from(["I", "U", "D"])),
            arrival[i],  # unique seqs, arbitrary arrival order
            f"c{draw(st.integers(0, n_convs - 1))}",
            draw(st.integers(0, 2)),
            draw(st.sampled_from(_ROLES)),
            draw(st.sampled_from(_TEXTS)),
            draw(st.sampled_from(_TOOLS)),
            draw(st.sampled_from(_DATES)),
            None,
        ))
    n_batches = draw(st.integers(1, 3))
    return events, n_batches


def _splits(events, n_batches):
    size = max(1, len(events) // n_batches)
    return [events[i : i + size] for i in range(0, len(events), size)]


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs())
def test_any_log_converges_to_oracle(spark, merge_mode, log):
    events, n_batches = log
    want = replay_oracle(
        pd.DataFrame(
            events,
            columns=["op", "seq", "conv_id", "turn_idx", "role", "text",
                     "tool", "ts_raw", "ingest_ts"],
        )
    )
    root = tempfile.mkdtemp(prefix="prop-lake-")
    try:
        t = LakeTable(spark, root, num_buckets=4, merge_mode=merge_mode)
        t.create(TRANSCRIPT_SCHEMA)
        batches = _splits(events, n_batches)
        for bid, chunk in enumerate(batches):
            t.apply_changes(
                spark.createDataFrame(chunk, EVENT_DDL),
                batch_id=bid, transform=apply_chain,
            )
        got = (
            t.read().toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        # exactly-once: re-applying the last committed batch is a no-op
        res = t.apply_changes(
            spark.createDataFrame(batches[-1], EVENT_DDL),
            batch_id=len(batches) - 1, transform=apply_chain,
        )
        assert res.get("skipped") is True
        got2 = (
            t.read().toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        )
        pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def logs_with_handoff(draw):
    events, _ = draw(event_logs())
    n = len(events)
    snap_at = draw(st.integers(0, n))       # snapshot reflects seq <= snap_at
    overlap = draw(st.integers(0, snap_at))  # tail restarts at seq > overlap
    return events, snap_at, overlap


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=logs_with_handoff())
def test_bootstrap_handoff_converges_for_any_split(spark, merge_mode, case):
    """For ANY event log, ANY snapshot point S, ANY tail restart O <= S:
    bootstrap(state(seq<=S), S) + replay(seq>O) == replay(all). The overlap
    (O, S] must be pure no-ops; the independent pandas oracle supplies both
    the snapshot state and the expected final state."""
    events, snap_at, overlap = case
    cols = ["op", "seq", "conv_id", "turn_idx", "role", "text",
            "tool", "ts_raw", "ingest_ts"]
    full = pd.DataFrame(events, columns=cols)
    want = replay_oracle(full)
    snap_pdf = replay_oracle(full[full["seq"] <= snap_at])
    root = tempfile.mkdtemp(prefix="prop-boot-")
    try:
        t = LakeTable(spark, root, num_buckets=4, merge_mode=merge_mode)
        t.create(TRANSCRIPT_SCHEMA)
        if len(snap_pdf):
            snapshot = spark.createDataFrame(snap_pdf, TRANSCRIPT_SCHEMA)
            t.bootstrap(snapshot, snapshot_seq=snap_at)
        suffix = [e for e in events if e[1] > overlap]
        if suffix:
            t.apply_changes(
                spark.createDataFrame(suffix, EVENT_DDL),
                batch_id=0, transform=apply_chain,
            )
        got = (
            t.read().toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def maintenance_programs(draw):
    """An event log plus an arbitrary program interleaving data applies
    with maintenance ops. Applies consume the log in order; every other op
    must be read-transparent except `delete`, whose semantics the model
    mirrors as synthetic tombstones at 1 + max applied seq (exactly
    delete_where's default tombstone_seq)."""
    events, _ = draw(event_logs())
    ops = draw(
        st.lists(
            st.sampled_from(
                ["apply", "apply", "compact", "cluster", "rebucket",
                 "expire", "delete", "prop"]
            ),
            min_size=3,
            max_size=7,
        )
    )
    if "apply" not in ops:
        ops = ["apply"] + ops
    preds = draw(
        st.lists(
            st.sampled_from(
                ["turn_idx >= 2", "turn_idx = 0", "conv_id = 'c0'"]
            ),
            min_size=ops.count("delete"),
            max_size=max(ops.count("delete"), 1),
        )
    )
    new_buckets = draw(st.sampled_from([2, 8]))
    return events, ops, preds, new_buckets


_PRED_PANDAS = {
    "turn_idx >= 2": lambda df: df["turn_idx"] >= 2,
    "turn_idx = 0": lambda df: df["turn_idx"] == 0,
    "conv_id = 'c0'": lambda df: df["conv_id"] == "c0",
}


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=maintenance_programs())
def test_maintenance_interleavings_are_read_transparent(spark, merge_mode, case):
    """For ANY interleaving of change batches with maintenance ops
    (compact, cluster-by re-layout, rebucket, snapshot expiry, table
    properties) and predicate deletes: the final table equals the pandas
    model that replays the batches plus synthetic D-events for each
    delete's matches — i.e. maintenance NEVER changes what read() returns,
    and purges behave exactly like 'D' change events at the next seq.
    A fresh reopen (constructor adopting the on-disk layout) must agree."""
    events, ops, preds, new_buckets = case
    cols = ["op", "seq", "conv_id", "turn_idx", "role", "text",
            "tool", "ts_raw", "ingest_ts"]
    chunks = _splits(events, max(ops.count("apply"), 1))
    root = tempfile.mkdtemp(prefix="prop-maint-")
    try:
        t = LakeTable(spark, root, num_buckets=4, merge_mode=merge_mode)
        t.create(TRANSCRIPT_SCHEMA)
        model_events: list = []   # original tuples + synthetic tombstones
        applied = 0
        deletes = 0
        for op in ops:
            if op == "apply":
                if applied < len(chunks):
                    t.apply_changes(
                        spark.createDataFrame(chunks[applied], EVENT_DDL),
                        batch_id=applied, transform=apply_chain,
                    )
                    model_events.extend(chunks[applied])
                    applied += 1
            elif op == "compact":
                t.compact()
            elif op == "cluster":
                t.compact(cluster_by="ts")
            elif op == "rebucket":
                t.rebucket(new_buckets)
            elif op == "expire":
                t.expire_snapshots(keep_last=1)
            elif op == "prop":
                t.set_property("audit.owner", "prop-test")
            elif op == "delete":
                pred = preds[deletes % len(preds)]
                deletes += 1
                t.delete_where(pred)
                if model_events:
                    live = replay_oracle(pd.DataFrame(model_events, columns=cols))
                    hit = live[_PRED_PANDAS[pred](live)]
                    seq = max(e[1] for e in model_events) + 1
                    model_events.extend(
                        ("D", seq, r.conv_id, int(r.turn_idx),
                         None, None, None, None, None)
                        for r in hit.itertuples(index=False)
                    )
        want = replay_oracle(pd.DataFrame(model_events, columns=cols))
        for reader in (t, LakeTable(spark, root)):
            got = (
                reader.read().toPandas()
                .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
                [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
            )
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # and the structural invariants the audit checks must hold after
        # ANY maintenance interleaving — fsck is clean on healthy tables
        rep = t.verify_integrity()
        assert rep["ok"], rep["checks"]
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def rollback_programs(draw):
    """Programs interleaving change batches with rollbacks (targets drawn
    as indexes into the versions seen so far), compaction and predicate
    deletes. The model records its event list at every committed version,
    so a rollback just restores the recorded list — if the engine's
    rollback diverges from 'state exactly as of that version', the final
    oracle comparison fails."""
    events, _ = draw(event_logs())
    ops = draw(
        st.lists(
            st.sampled_from(
                ["apply", "apply", "rollback", "compact", "delete"]
            ),
            min_size=4,
            max_size=8,
        )
    )
    if "apply" not in ops:
        ops = ["apply"] + ops
    rb_picks = draw(
        st.lists(st.integers(0, 31),
                 min_size=ops.count("rollback"),
                 max_size=max(ops.count("rollback"), 1))
    )
    preds = draw(
        st.lists(st.sampled_from(sorted(_PRED_PANDAS)),
                 min_size=ops.count("delete"),
                 max_size=max(ops.count("delete"), 1))
    )
    return events, ops, rb_picks, preds


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=rollback_programs())
def test_rollback_interleavings_restore_exact_versions(spark, merge_mode, case):
    """For ANY program of batches / rollbacks / compactions / purges:
    rolling back to version v restores exactly the state the model
    recorded at v (including undone purges), batches applied AFTER a
    rollback land on the restored state, and the final table matches the
    pandas oracle of the surviving event list."""
    events, ops, rb_picks, preds = case
    cols = ["op", "seq", "conv_id", "turn_idx", "role", "text",
            "tool", "ts_raw", "ingest_ts"]
    chunks = _splits(events, max(ops.count("apply"), 1))
    root = tempfile.mkdtemp(prefix="prop-rb-")
    try:
        t = LakeTable(spark, root, num_buckets=4, merge_mode=merge_mode)
        t.create(TRANSCRIPT_SCHEMA)
        history = [(t.manifest()["version"], ())]
        model_events: list = []
        applied = rb_i = del_i = next_bid = 0
        for op in ops:
            if op == "apply":
                if applied < len(chunks):
                    t.apply_changes(
                        spark.createDataFrame(chunks[applied], EVENT_DDL),
                        batch_id=next_bid, transform=apply_chain,
                    )
                    model_events.extend(chunks[applied])
                    applied += 1
                    next_bid += 1
            elif op == "rollback":
                tgt_v, snap = history[rb_picks[rb_i] % len(history)]
                rb_i += 1
                t.rollback(tgt_v)
                model_events = list(snap)
            elif op == "compact":
                t.compact()
            elif op == "delete":
                pred = preds[del_i % len(preds)]
                del_i += 1
                t.delete_where(pred)
                if model_events:
                    live = replay_oracle(
                        pd.DataFrame(model_events, columns=cols)
                    )
                    hit = live[_PRED_PANDAS[pred](live)]
                    seq = max(e[1] for e in model_events) + 1
                    model_events.extend(
                        ("D", seq, r.conv_id, int(r.turn_idx),
                         None, None, None, None, None)
                        for r in hit.itertuples(index=False)
                    )
            history.append((t.manifest()["version"], tuple(model_events)))
        want = replay_oracle(pd.DataFrame(model_events, columns=cols))
        got = (
            t.read().toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------- merge_into
# Clause pools: (SQL-or-Column form fed to the engine, python mirror fed to
# the model). SQL three-valued logic matters: every python mirror must be
# falsy where the SQL condition is NULL.
_MERGE_DELETES = [
    (None, None),
    (True, lambda s, t: True),
    ("s.tool = 'zap'", lambda s, t: s["tool"] == "zap"),
]
_MERGE_UPDATES = [
    None,
    {"text": ("s.text", lambda s, t: s["text"])},
    {"text": (
        "concat(coalesce(t.text,''),'+',coalesce(s.text,''))",
        lambda s, t: (t["text"] or "") + "+" + (s["text"] or ""),
    )},
    {"role": ("upper(coalesce(s.role,'x'))",
              lambda s, t: (s["role"] or "x").upper()),
     "tool": ("t.tool", lambda s, t: t["tool"])},
]
_MERGE_MCONDS = [
    None,
    ("t.turn_idx = 0", lambda s, t: t["turn_idx"] == 0),
    ("s.text IS NOT NULL", lambda s, t: s["text"] is not None),
]
_MERGE_NMCONDS = [
    None,
    ("s.role IS NOT NULL", lambda s: s["role"] is not None),
]


@st.composite
def merge_cases(draw):
    n_base = draw(st.integers(0, 6))
    base = []
    for i in range(n_base):
        base.append((f"c{i % 4}", i // 4,
                     draw(st.sampled_from(_ROLES)),
                     draw(st.sampled_from(_TEXTS)),
                     draw(st.sampled_from(["zap", "calc", None]))))
    # unique source keys (engine refuses duplicates), mixing hits + misses
    key_pool = [(f"c{i % 4}", i // 4) for i in range(10)]
    src_keys = draw(st.permutations(key_pool))[: draw(st.integers(1, 8))]
    src = [(k[0], k[1],
            draw(st.sampled_from(_ROLES)),
            draw(st.sampled_from(_TEXTS)),
            draw(st.sampled_from(["zap", "calc", None])))
           for k in src_keys]
    di = draw(st.integers(0, len(_MERGE_DELETES) - 1))
    ui = draw(st.integers(0, len(_MERGE_UPDATES) - 1))
    mi = draw(st.integers(0, len(_MERGE_MCONDS) - 1))
    ins = draw(st.booleans())
    ni = draw(st.integers(0, len(_MERGE_NMCONDS) - 1))
    if di == 0 and ui == 0 and not ins:
        ins = True  # engine (rightly) refuses a clauseless merge
    return base, src, di, ui, mi, ins, ni


@pytest.mark.parametrize("merge_mode", ["mor", "cow"])
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=merge_cases())
def test_merge_into_matches_clause_model(spark, merge_mode, case):
    base, src, di, ui, mi, ins, ni = case
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    # pandas model: Delta clause order, first match wins per source row
    live = {(r[0], r[1]): dict(zip(cols, r)) for r in base}
    d_sql, d_py = _MERGE_DELETES[di]
    upd = _MERGE_UPDATES[ui]
    m_sql, m_py = _MERGE_MCONDS[mi] if _MERGE_MCONDS[mi] else (None, None)
    nm_sql, nm_py = _MERGE_NMCONDS[ni] if _MERGE_NMCONDS[ni] else (None, None)
    for r in src:
        s = dict(zip(cols, r))
        k = (s["conv_id"], s["turn_idx"])
        t_row = live.get(k)
        if t_row is not None:
            if d_py is not None and d_py(s, t_row):
                del live[k]
            elif upd is not None and (m_py is None or m_py(s, t_row)):
                new = dict(t_row)
                for c, (_, fn) in upd.items():
                    new[c] = fn(s, t_row)
                live[k] = new
        elif ins and (nm_py is None or nm_py(s)):
            live[k] = s

    root = tempfile.mkdtemp(prefix="prop-merge-")
    try:
        t = LakeTable(spark, root, num_buckets=4, merge_mode=merge_mode)
        t.create(TRANSCRIPT_SCHEMA)
        if base:
            t.apply_changes(
                spark.createDataFrame(
                    [("I", i + 1, *r, None, None) for i, r in enumerate(base)],
                    EVENT_DDL,
                ),
                batch_id=0,
            )
        t.merge_into(
            spark.createDataFrame(
                src,
                "conv_id string, turn_idx int, role string, text string, "
                "tool string",
            ),
            when_matched_delete=d_sql,
            when_matched_update=(
                {c: sql for c, (sql, _) in upd.items()} if upd else None
            ),
            matched_condition=m_sql,
            when_not_matched_insert=ins,
            not_matched_condition=nm_sql,
        )
        got = {
            (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
            for r in t.read().collect()
        }
        want = {
            k: (v["role"], v["text"], v["tool"]) for k, v in live.items()
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------- cross-table cuts
@st.composite
def routed_cut_programs(draw):
    """Multi-table bus: every event routed to one of n_tables, applied in
    batches; the FINAL batch is torn — committed to only the first k
    tables in apply order (k=0 models a crash before any commit), exactly
    the crash window the router leaves."""
    events, n_batches = draw(event_logs())
    n_tables = draw(st.integers(2, 3))
    routes = [draw(st.integers(0, n_tables - 1)) for _ in events]
    torn_k = draw(st.integers(0, n_tables - 1))
    compact_victim = draw(st.integers(-1, n_tables - 1))  # -1 = no compact
    return events, n_batches, n_tables, routes, torn_k, compact_victim


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=routed_cut_programs())
def test_consistent_cut_equals_oracle_prefix(spark, case):
    """For ANY routed log and ANY torn final batch, read_consistent at
    every explicit cut equals the pandas oracle replay of that table's
    events in batches <= cut — and the default cut is torn-batch-safe."""
    from cdm_to_mods_spark.streaming.router import (
        consistent_cut,
        read_consistent,
    )

    events, n_batches, n_tables, routes, torn_k, compact_victim = case
    names = [f"t{i}" for i in range(n_tables)]
    batches = _splits(events, n_batches)
    route_iter = iter(routes)
    per_batch_per_table: list[dict[str, list]] = []
    for chunk in batches:
        d = {n: [] for n in names}
        for ev in chunk:
            d[names[next(route_iter)]].append(ev)
        per_batch_per_table.append(d)

    root = tempfile.mkdtemp(prefix="prop-cut-")
    try:
        tables = {}
        for n in names:
            t = LakeTable(spark, f"{root}/{n}", num_buckets=4, merge_mode="mor")
            t.create(TRANSCRIPT_SCHEMA)
            tables[n] = t
        last_full = len(per_batch_per_table) - 1  # final batch index (torn)
        for bid, d in enumerate(per_batch_per_table):
            receivers = (
                sorted(names)[:torn_k] if bid == last_full else sorted(names)
            )
            for n in receivers:
                if d[n]:
                    tables[n].apply_changes(
                        spark.createDataFrame(d[n], EVENT_DDL),
                        batch_id=bid,
                        transform=apply_chain,
                    )
        if compact_victim >= 0:
            tables[names[compact_victim]].compact()

        def oracle_at(name, cut):
            evs = [
                ev
                for bid, d in enumerate(per_batch_per_table)
                if bid <= cut
                for ev in d[name]
            ]
            if not evs:
                return None
            return replay_oracle(
                pd.DataFrame(
                    evs,
                    columns=["op", "seq", "conv_id", "turn_idx", "role",
                             "text", "tool", "ts_raw", "ingest_ts"],
                )
            )

        def check_cut(cut, views):
            for n in names:
                want = oracle_at(n, cut)
                got = (
                    views[n].toPandas()
                    .sort_values(["conv_id", "turn_idx"])
                    .reset_index(drop=True)
                    [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
                )
                if want is None or len(want) == 0:
                    assert len(got) == 0
                else:
                    pd.testing.assert_frame_equal(got, want, check_dtype=False)

        # explicit cuts are meaningful up to the last FULLY applied batch
        # (an explicit cut is the caller's completeness assertion; the
        # torn final batch is exactly what it must not assert)
        for cut in range(-1, last_full):
            check_cut(cut, read_consistent(tables, batch_id=cut))

        # the default cut never exposes the torn batch — it is at most
        # max(last_batch_id)-1, which is provably complete — and its state
        # matches the oracle prefix at that cut
        c = consistent_cut(tables)
        assert c["batch_id"] <= max(max(c["last_batch_ids"].values()) - 1, -1)
        assert c["batch_id"] < last_full
        check_cut(c["batch_id"], read_consistent(tables))
    finally:
        shutil.rmtree(root, ignore_errors=True)
