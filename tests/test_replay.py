"""Replay convergence vs the pandas oracle — the engine's core invariant:
per-turn text equality under stable (conv_id, turn_idx) ordering."""

from __future__ import annotations

import pandas as pd

from cdm_to_mods_spark.replay import replay_in_batches, replay_once
from cdm_to_mods_spark.sources.synth import synth_events

N_EVENTS, N_CONVS = 4000, 50


def _final_state(table) -> pd.DataFrame:
    pdf = table.read().toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def _assert_matches_oracle(events_pdf, got):
    from tests.oracle import replay_oracle

    want = replay_oracle(events_pdf)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}),
        want.astype({"turn_idx": "int64"}),
        check_dtype=False,
    )


def test_replay_once_matches_oracle(spark, tmp_table):
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    events_pdf = events.toPandas()
    table = replay_once(spark, events, tmp_table)
    _assert_matches_oracle(events_pdf, _final_state(table))


def test_replay_in_batches_converges_to_same_state(spark, tmp_table):
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    events_pdf = events.toPandas()
    table = replay_in_batches(
        spark, events, tmp_table, n_batches=5, max_seq=N_EVENTS
    )
    _assert_matches_oracle(events_pdf, _final_state(table))
    # 5 micro-batches → 5 snapshots after create
    assert table.latest_version() == 5


def test_hot_key_skewed_replay_matches_oracle(spark, tmp_table):
    """Scale/skew invariant (SURVEY.md §5): a conversation holding ~30% of
    all events (the reference's 1000-page compound analog) must still
    converge exactly. Skew is absorbed by partial-agg dedup, not salting."""
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42, hot_frac=0.3)
    events_pdf = events.toPandas()
    table = replay_in_batches(
        spark, events, tmp_table, n_batches=4, max_seq=N_EVENTS, merge_mode="mor"
    )
    _assert_matches_oracle(events_pdf, _final_state(table))
    hot = events_pdf[events_pdf.conv_id == "conv-00000000"]
    assert len(hot) > 0.25 * N_EVENTS  # the skew actually exists


def test_replay_mor_matches_oracle(spark, tmp_table):
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    events_pdf = events.toPandas()
    table = replay_in_batches(
        spark, events, tmp_table, n_batches=6, max_seq=N_EVENTS, merge_mode="mor"
    )
    _assert_matches_oracle(events_pdf, _final_state(table))


def test_deterministic_synth(spark):
    a = synth_events(spark, 500, 10, seed=7).toPandas()
    b = synth_events(spark, 500, 10, seed=7).toPandas()
    pd.testing.assert_frame_equal(a, b)
    c = synth_events(spark, 500, 10, seed=8).toPandas()
    assert not a["text"].equals(c["text"])
