"""Golden-transform unit tests — one case table per XSLT family
(SURVEY.md §2.7), mirroring the reference stylesheets' documented cases."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, functions as F

from cdm_to_mods_spark.functions import text as TX
from cdm_to_mods_spark.functions.dates import (
    canonicalize_ts,
    canonicalize_ts_col,
    ts_qualifier,
    with_canonical_ts,
)
from cdm_to_mods_spark.functions.remap import remap_role, remap_tool


def _apply(spark, fn, values):
    df = spark.createDataFrame([Row(v=v) for v in values])
    return [r.out for r in df.select(fn(F.col("v")).alias("out")).collect()]


# ---------------------------------------------------------- text family
TEXT_CASES = [
    # (fn, input, expected)
    (TX.xml_escape, 'a & b "c" <d>', "a &amp; b &quot;c&quot; &lt;d&gt;"),
    (TX.xml_unescape, "a &amp; &lt;b&gt;", "a & <b>"),
    (TX.br_to_semicolon, "x<br>y<BR/>z", "x; y; z"),
    (TX.at_symbols_to_quote, "he said @@@hi@@@", 'he said "hi"'),
    (TX.emdash_to_double_hyphen, "a—b–c", "a--b--c"),
    (TX.normalize_whitespace, "  a \t b\n c  ", "a b c"),
    (TX.strip_trailing_punct, "value; ", "value"),
    (TX.strip_trailing_punct, "value...", "value"),
    (TX.alnum_squeeze, "First Name (nick)!", "FirstNamenick"),
    (TX.normalize_text, "  alpha<br>beta @@@g@@@ ;", 'alpha; beta "g"'),
]


@pytest.mark.parametrize("fn,inp,want", TEXT_CASES, ids=lambda x: str(x)[:30])
def test_text_functions(spark, fn, inp, want):
    assert _apply(spark, fn, [inp]) == [want]


def test_sentinel_scrub(spark):
    got = _apply(spark, TX.null_if_sentinel, ["ok", " Unknown ", "NA", "none", "", "  "])
    assert got == ["ok", None, None, None, None, None]


def test_split_multivalue(spark):
    got = _apply(spark, TX.split_multivalue, ["a; b ;; c ;"])
    assert got == [["a", "b", "c"]]


def test_split_hierarchical(spark):
    # xsl/subjectSplit.xsl: capitalize first letter, strip trailing period
    got = _apply(spark, TX.split_hierarchical, ["history--louisiana--new orleans."])
    assert got == [["History", "Louisiana", "New orleans"]]


def test_title_nonsort(spark):
    got = _apply(spark, TX.title_nonsort, ["The Great Flood", "An apple", "Plain title"])
    assert [(g.non_sort, g.title) for g in got] == [
        ("The", "Great Flood"),
        ("An", "apple"),
        ("", "Plain title"),
    ]


# ---------------------------------------------------------- remap family
def test_remap_role(spark):
    got = _apply(spark, remap_role, ["AI", " human", "Bot ", "user", "narrator", None])
    assert got == ["assistant", "user", "assistant", "user", "narrator", None]


def test_remap_tool(spark):
    got = _apply(spark, remap_tool, ["CALC", "Search ", "none", "", "widget"])
    assert got == ["calculator", "search", None, None, "widget"]


# ---------------------------------------------------------- date cascade
DATE_CASES = [
    ("2001-02-03", datetime.datetime(2001, 2, 3)),
    ("2001-02-03 04:05:06", datetime.datetime(2001, 2, 3, 4, 5, 6)),
    ("2001-02-03 04:05", datetime.datetime(2001, 2, 3, 4, 5)),
    ("7/4/1999", datetime.datetime(1999, 7, 4)),
    ("07/04/1999", datetime.datetime(1999, 7, 4)),
    ("12/31/2020 9:30", datetime.datetime(2020, 12, 31, 9, 30)),
    ("2001-02", datetime.datetime(2001, 2, 1)),
    ("[1936]", datetime.datetime(1936, 1, 1)),
    ("[1936-05]", datetime.datetime(1936, 5, 1)),
    ("ca. 1920", datetime.datetime(1920, 1, 1)),
    ("Circa 1920", datetime.datetime(1920, 1, 1)),
    ("1972?", datetime.datetime(1972, 1, 1)),
    ("1918-1920", datetime.datetime(1918, 1, 1)),
    ("between 1918 and 1920", datetime.datetime(1918, 1, 1)),
    ("1930s", datetime.datetime(1930, 1, 1)),
    ("193-", datetime.datetime(1930, 1, 1)),
    ("1999", datetime.datetime(1999, 1, 1)),
    ("not a date", None),
    (None, None),
]


def test_date_cascade(spark):
    inputs = [c[0] for c in DATE_CASES]
    got = _apply(spark, canonicalize_ts, inputs)
    for (inp, want), g in zip(DATE_CASES, got):
        assert g == want, f"{inp!r}: got {g}, want {want}"


def test_date_cascade_hybrid_parity(spark):
    """The JVM-fast-path + Arrow-residue hybrid (both the Column form and
    the DataFrame temp-column form) must agree with the pure pandas cascade
    on every case (including the strict-parse failures)."""
    extra = ["13/01/2020", "02/30/2020", "2020-13", "2020-02-30",
             "2001-02-03T04:05:06", "1:5", " 7/4/1999 ", "7/4/1999  9:30",
             # long-tail families now claimed JVM-side by the extended
             # dispatch — every spacing/case variant the pandas regexes
             # accept, plus near-misses that must stay NaT on both paths
             "ca.1930", "ca 1930", "CIRCA 1955", "circa  1944", "CA. 1920",
             "[1936-00]", "[1936-05-17]", "[1936-13-40]",
             "between 1918-1920", "1918 - 1920", "1918 and 1920",
             "beTween 1918 and 1920", "BETWEEN 1918 AND 1920",
             "1935s", "194-", "1944s", "2001-02-03  04:05:06",
             "ca. 193", "circa 19301", "[193]", "1918-192", "193"]
    inputs = [c[0] for c in DATE_CASES] + extra
    got_udf = _apply(spark, canonicalize_ts, inputs)
    got_hybrid = _apply(spark, canonicalize_ts_col, inputs)
    df = spark.createDataFrame([Row(v=v) for v in inputs])
    got_df = [
        r.out for r in with_canonical_ts(df, "v", "out", drop_src=False).collect()
    ]
    for inp, u, h, d in zip(inputs, got_udf, got_hybrid, got_df):
        assert u == h == d, f"{inp!r}: udf {u}, hybrid {h}, df-form {d}"


def test_date_cascade_arrow_parity(spark):
    """The arrow-compute cascade (the replay chain's UDF) must be
    value-equal to the pandas cascade on the case table, strict-parse
    failures (arrow strptime rollovers!), datetime64[ns]-range overflow
    years, and a deterministic structured fuzz corpus."""
    import random

    from cdm_to_mods_spark.functions.dates import canonicalize_ts_arrow

    extra = ["2001-02-30", "[2001-02-30]", "2/29/2000", "2/29/2001",
             "13/01/2020", "0/0/2000", "5708", "0910", "1677-09-21",
             "1677-09-22", "2262-04-11", "9999?", "ca. 5708",
             "2001-02-03T04:05:06", " 7/4/1999 ", "7/4/1999 25:00"]
    random.seed(101)
    fuzz = []
    for _ in range(300):
        y, m, d = random.randint(1000, 9999), random.randint(0, 19), random.randint(0, 39)
        fuzz.append(random.choice([
            f"{y}-{m:02d}-{d:02d}", f"{m}/{d}/{y}", f"[{y}-{m:02d}]",
            f"ca. {y}", f"{y}?", f"{y}-{y + 10}", f"{y // 10}0s", f"{y}",
            f"{y}-{m:02d}-{d:02d} {random.randint(0, 30):02d}:{random.randint(0, 70):02d}",
        ]))
    inputs = [c[0] for c in DATE_CASES] + extra + fuzz
    got_pandas = _apply(spark, canonicalize_ts, inputs)
    got_arrow = _apply(spark, canonicalize_ts_arrow, inputs)
    for inp, p, a in zip(inputs, got_pandas, got_arrow):
        assert p == a, f"{inp!r}: pandas {p}, arrow {a}"


def test_date_cascade_range_and_leap_second_parity(spark):
    """Two divergence classes found by differential fuzz (session 19),
    pinned across ALL FOUR cascade forms (pandas UDF, arrow UDF, hybrid
    Column form, hybrid DataFrame form):

    - out-of-datetime64[ns]-range years (6810, 1506, 2550-via-decade):
      the pandas UDF coerces them to NaT and a pandas UDF physically
      cannot return wider values over Arrow, so the JVM fast paths must
      clamp instead of returning year-6810 timestamps;
    - leap-second inputs (:60/:61): strptime's %S tolerates them and
      pandas ROLLED 07:19:61 over to 07:20:01 where the JVM/arrow paths
      null — the pandas cascade now restricts seconds to [0-5]\\d."""
    from cdm_to_mods_spark.functions.dates import canonicalize_ts_arrow

    cases = [
        # ns-range overflow: every family's fast path must null these
        "6810-01-02", "circa 6810", "ca. 5153", "[7179]", "1290s",
        "255-", " 1506-04-06 ", "04/13/7621 7:41", "between 5256 and 5261",
        "5225?", "3619 -3620", "9333-07-28 11:22:33", "1676-12-31",
        "2263-01-01", "1677-09-22", "2262-04-11",
        # leap seconds: rollover is not canonicalization
        "1950-11-13 07:19:61", "1950-11-13 07:19:60", "2000-06-30 23:59:60",
        "7/4/1999 9:30:61", "07/04/1999 9:30:60", "1950-11-13T07:19:61",
        # in-range neighbours stay parsed
        "1950-11-13 07:19:59", "7/4/1999 9:30:59",
    ]
    got_p = _apply(spark, canonicalize_ts, cases)
    got_a = _apply(spark, canonicalize_ts_arrow, cases)
    got_h = _apply(spark, canonicalize_ts_col, cases)
    df = spark.createDataFrame([Row(v=v) for v in cases])
    got_d = [
        r.out for r in with_canonical_ts(df, "v", "out", drop_src=False).collect()
    ]
    for inp, p, a, h, d in zip(cases, got_p, got_a, got_h, got_d):
        assert p == a == h == d, (
            f"{inp!r}: pandas {p}, arrow {a}, hybrid {h}, df-form {d}"
        )
    assert got_p[-2:] == [
        datetime.datetime(1950, 11, 13, 7, 19, 59),
        datetime.datetime(1999, 7, 4, 9, 30, 59),
    ]


def test_ts_qualifier(spark):
    got = _apply(spark, ts_qualifier, ["ca. 1920", "[1936]", "1972?", "1999"])
    assert got == ["approximate", "inferred", "questionable", None]


def test_sliced_sliding_agg_equals_native_window(spark):
    """Stream-slicing sliding aggregation must equal Spark's native
    F.window(size, slide) — including grouped form and min/max
    composition — while doing O(events) pre-shuffle work."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.operators.slicing import sliced_sliding_agg

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("ts", "event_type", F.col("value").cast("double").alias("v"))
    )
    got = {
        (r.event_type, r.window_start, r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in sliced_sliding_agg(
            ev, "ts", "3 hours", "1 hour",
            {"n": ("count", "*"), "total": ("sum", "v"),
             "vmin": ("min", "v"), "vmax": ("max", "v")},
            group_by=["event_type"],
        ).collect()
    }
    want = {
        (r.event_type, r.w.start, r.n, round(r.total, 6), r.vmin, r.vmax)
        for r in ev.groupBy(
            "event_type", F.window("ts", "3 hours", "1 hour").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
             F.min("v").alias("vmin"), F.max("v").alias("vmax"))
        .collect()
    }
    assert got == want


def test_sliced_sliding_agg_rejects_non_composable(spark):
    import pytest as _pytest

    from cdm_to_mods_spark.operators.slicing import sliced_sliding_agg

    ev = spark.range(1).select(F.current_timestamp().alias("ts"))
    with _pytest.raises(ValueError, match="compose"):
        sliced_sliding_agg(ev, "ts", "2 hours", "1 hour",
                           {"m": ("median", "ts")})
    with _pytest.raises(ValueError, match="multiple"):
        sliced_sliding_agg(ev, "ts", "3 hours", "2 hours", {"n": ("count", "*")})


def test_sliding_window_view_incremental_with_late_events(spark, tmp_path):
    """SlidingWindowView: batch-by-batch slice-partial maintenance (with a
    LATE event arriving two batches after its slice) must equal a full
    recompute over all events with the native sliding window."""
    from cdm_to_mods_spark.operators.slicing import SlidingWindowView

    view = SlidingWindowView(
        spark, str(tmp_path / "sw"), "ts", "2 hours", "1 hour",
        {"n": ("count", "*"), "total": ("sum", "v")},
    )
    b1 = [("2024-01-01 10:05:00", 1.0), ("2024-01-01 11:10:00", 2.0)]
    b2 = [("2024-01-01 12:20:00", 4.0)]
    b3 = [("2024-01-01 10:40:00", 8.0),  # LATE: lands in the 10:00 slice
          ("2024-01-01 13:01:00", 16.0)]
    all_rows = []
    for batch in (b1, b2, b3):
        all_rows += batch
        df = spark.createDataFrame(batch, "ts string, v double").select(
            F.col("ts").cast("timestamp").alias("ts"), "v")
        view.update(df)
    got = {(r.window_start, r.n, r.total) for r in view.read().collect()}
    full = spark.createDataFrame(all_rows, "ts string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "v")
    want = {
        (r.w.start, r.n, r.total)
        for r in full.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want
