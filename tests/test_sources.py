"""S6 — second/third source-format connectors: the same replay pipeline
over parquet, JSON-lines, and CSV event exports must converge to the
identical final table state (the reference's contentDM-JSON vs XLSX dual
ingest, convert_xlsx_to_mods.py:24-60, re-expressed as reader configs)."""

from __future__ import annotations

import pandas as pd
import pytest

from cdm_to_mods_spark.replay import replay_once
from cdm_to_mods_spark.schemas import EVENT_SCHEMA
from cdm_to_mods_spark.sources.events import read_events, write_events
from cdm_to_mods_spark.sources.synth import synth_events
from cdm_to_mods_spark.streaming.tail import StreamingReplay
from tests.oracle import replay_oracle

N_EVENTS, N_CONVS = 1500, 25


def _final(table) -> pd.DataFrame:
    return (
        table.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_batch_replay_each_format_converges(spark, tmp_path, fmt):
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    want = replay_oracle(events.toPandas())
    src = str(tmp_path / f"events-{fmt}")
    write_events(events, src, fmt=fmt)

    back = read_events(spark, src, fmt=fmt)
    assert [f.name for f in back.schema.fields] == [
        f.name for f in EVENT_SCHEMA.fields
    ]
    table = replay_once(
        spark, back, str(tmp_path / f"table-{fmt}"), num_buckets=8, merge_mode="mor"
    )
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_streaming_tail_over_json_source(spark, tmp_path):
    """The streaming tail over a JSON-lines export — same checkpointed
    exactly-once path as parquet, different connector."""
    events = synth_events(spark, N_EVENTS, N_CONVS, seed=42)
    src = str(tmp_path / "events-json")
    write_events(events, src, fmt="json")

    sr = StreamingReplay(
        spark,
        src,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        num_buckets=8,
        merge_mode="mor",
        source_format="json",
    )
    table = sr.run_to_completion()
    want = replay_oracle(events.toPandas())
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported event format"):
        read_events(spark, str(tmp_path), fmt="xlsx")
