"""Property-based transaction atomicity: for ANY sequence of multi-table
transactions over a two-member group and ANY crash point per transaction
— before the commit point (branches staged, no WAL), or after the WAL
with an ARBITRARY subset of member publishes landed — recovery converges
the group to exactly the oracle state of the transactions that passed
their commit point, applied atomically, and none of the ones that did
not.

This is the WAL-redo contract as a property, not an example: "pre"
crashes must leave no trace (their staged branches are dropped), "wal"
crashes must complete fully on recover() however many publishes already
landed, and group reads never mix the two.

Deterministic: hypothesis derandomized, few examples (each drives many
real Spark jobs)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.txn import TableGroup
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

import pyspark.sql.types as T

A_DDL = (
    "op string, seq long, conv_id string, turn_idx int, role string, "
    "text string, tool string"
)
B_DDL = "op string, seq long, conv_id string, status string"
B_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("status", T.StringType(), True),
])

_TEXTS = [None, "x", "a b", ""]


@st.composite
def txn_sequences(draw):
    n_txns = draw(st.integers(1, 4))
    seq = 0
    txns = []
    for _ in range(n_txns):
        n_a = draw(st.integers(0, 5))
        n_b = draw(st.integers(0, 3))
        if n_a + n_b == 0:
            n_a = 1
        a_events, b_events = [], []
        for _ in range(n_a):
            seq += 1
            a_events.append((
                draw(st.sampled_from(["I", "U", "D"])),
                seq,
                f"c{draw(st.integers(0, 2))}",
                draw(st.integers(0, 1)),
                "user",
                draw(st.sampled_from(_TEXTS)),
                None,
            ))
        for _ in range(n_b):
            seq += 1
            b_events.append((
                draw(st.sampled_from(["I", "U", "D"])),
                seq,
                f"c{draw(st.integers(0, 2))}",
                draw(st.sampled_from(["ok", "bad", None])),
            ))
        crash = draw(st.sampled_from(["clean", "pre", "wal"]))
        # for a 'wal' crash: which staged members published before dying
        published = draw(st.sets(st.sampled_from(["a", "b"])))
        txns.append((a_events, b_events, crash, sorted(published)))
    return txns


def _state(df):
    cols = [c for c in df.columns if not c.startswith("_")]
    return {tuple(r[c] for c in cols) for r in df.collect()}


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(txns=txn_sequences())
def test_any_crash_sequence_converges_atomically(spark, txns):
    root = tempfile.mkdtemp(prefix="prop-txn-")
    try:
        a = LakeTable(spark, f"{root}/a", num_buckets=2, merge_mode="mor")
        a.create(TRANSCRIPT_SCHEMA)
        b = LakeTable(spark, f"{root}/b", key_cols=("conv_id",),
                      num_buckets=2, merge_mode="mor")
        b.create(B_SCHEMA)
        g = TableGroup(spark, f"{root}/g")
        g.create({"a": a, "b": b})
        # oracle: plain tables receiving ONLY the committed transactions
        oa = LakeTable(spark, f"{root}/oa", num_buckets=2,
                       merge_mode="mor")
        oa.create(TRANSCRIPT_SCHEMA)
        ob = LakeTable(spark, f"{root}/ob", key_cols=("conv_id",),
                       num_buckets=2, merge_mode="mor")
        ob.create(B_SCHEMA)

        for a_events, b_events, crash, published in txns:
            txn = g.transaction()
            staged = []
            if a_events:
                txn.table("a").apply_changes(
                    spark.createDataFrame(a_events, A_DDL))
                staged.append("a")
            if b_events:
                txn.table("b").apply_changes(
                    spark.createDataFrame(b_events, B_DDL))
                staged.append("b")
            if crash == "clean":
                txn.commit()
            elif crash == "pre":
                # process dies before commit(): branches remain, no WAL
                pass
            else:  # 'wal' — passed the commit point, then crashed after
                # an arbitrary subset of member publishes
                os.makedirs(g._txn_dir, exist_ok=True)
                with open(g._wal_path(txn.txn_id), "w") as fh:
                    json.dump({"txn_id": txn.txn_id,
                               "state": "committing",
                               "tables": txn._staged, "ts": 0}, fh)
                for name in published:
                    if name in staged:
                        g.table(name).publish_branch(txn.txn_id)
            # operator runs recovery before the next transaction (the
            # group refuses new transactions while a WAL is pending)
            g.recover(drop_abandoned=True)
            if crash != "pre":
                # committed (clean or wal-redone) → apply to the oracle
                if a_events:
                    oa.apply_changes(
                        spark.createDataFrame(a_events, A_DDL))
                if b_events:
                    ob.apply_changes(
                        spark.createDataFrame(b_events, B_DDL))

        assert _state(g.read("a")) == _state(oa.read())
        assert _state(g.read("b")) == _state(ob.read())
        # nothing pending, no stray branches anywhere
        assert g.pending_transactions() == []
        assert g.abandoned_branches() == {}
    finally:
        shutil.rmtree(root, ignore_errors=True)
