"""Zone-map stats + range reads: per-bucket min/max column stats are
collected from parquet footers at write time, stored on manifest file-set
entries, and drive manifest-level bucket skipping in ``read_range``.

Reference parity note: the reference filters records by date strings
row-at-a-time (post_cdm_cleanup.py's per-record predicates); at lake scale
the same "give me the records in this window" becomes a manifest-pruned
range scan (Iceberg/Delta file-stats pattern).
"""

from __future__ import annotations

import datetime as dt

import pytest

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

from tests.test_lake import EVENT_DDL, _events

# deterministic murmur3 pmod-8 buckets: c02 -> 1, c03 -> 6, c04 -> 0
CONV_YEAR = {"c02": 1999, "c03": 2005, "c04": 2015}


def _year_events(spark, start_seq=1):
    rows, seq = [], start_seq
    for conv, year in CONV_YEAR.items():
        for i in range(3):
            rows.append(
                ("I", seq, conv, i, "user", f"t{seq}", None,
                 f"{year}-03-{10 + i:02d}", None)
            )
            seq += 1
    return _events(spark, rows)


@pytest.fixture(params=["cow", "mor"])
def ztable(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode=request.param)
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_year_events(spark), batch_id=0, transform=apply_chain)
    return t


def _range_rows(df):
    return sorted((r.conv_id, r.turn_idx, str(r.ts)) for r in df.collect())


def test_manifest_carries_zone_stats(ztable):
    man = ztable.manifest()
    seen = 0
    for e in man["buckets"].values():
        for fs in LakeTable._bucket_files(e):
            st = (fs.get("stats") or {}).get("ts")
            if st is not None:
                assert st[0] <= st[1]
                seen += 1
    assert seen >= 3  # one stats-bearing file set per written bucket


def test_read_range_prunes_to_overlapping_buckets(ztable):
    man = ztable.manifest()
    keep = ztable._range_buckets(
        man, "ts", dt.datetime(2005, 1, 1), dt.datetime(2005, 12, 31)
    )
    assert keep == [6]  # only c03's bucket survives the prune
    got = _range_rows(ztable.read_range("2005-01-01", "2005-12-31"))
    assert got == _range_rows(
        ztable.read().filter("ts between '2005-01-01' and '2005-12-31'")
    )
    assert {c for c, _, _ in got} == {"c03"}
    assert len(got) == 3


def test_read_range_matches_full_scan_filter(ztable):
    for lo, hi in [("1998-01-01", "2010-01-01"), ("2015-01-01", "2015-12-31"),
                   ("1900-01-01", "1901-01-01")]:
        assert _range_rows(ztable.read_range(lo, hi)) == _range_rows(
            ztable.read().filter(f"ts between '{lo}' and '{hi}'")
        )


def test_superseded_in_range_row_is_not_resurrected(spark, ztable):
    # move one c03 row's ts out of 2005: the old 2005 version keeps the
    # bucket in the pruned set (conservative), but last-write-wins must
    # resolve to the new row BEFORE the range filter — the superseded
    # 2005 version may not reappear.
    ztable.apply_changes(
        _events(spark, [("U", 100, "c03", 0, "user", "moved", None,
                         "2006-07-01", None)]),
        batch_id=1,
        transform=apply_chain,
    )
    in_2005 = _range_rows(ztable.read_range("2005-01-01", "2005-12-31"))
    assert ("c03", 0) not in {(c, i) for c, i, _ in in_2005}
    assert len(in_2005) == 2
    in_2006 = _range_rows(ztable.read_range("2006-01-01", "2006-12-31"))
    assert [(c, i) for c, i, _ in in_2006] == [("c03", 0)]


def test_deleted_rows_excluded_from_range(spark, ztable):
    ztable.apply_changes(
        _events(spark, [("D", 100, "c04", 1, None, None, None, None, None)]),
        batch_id=1,
        transform=apply_chain,
    )
    got = _range_rows(ztable.read_range("2015-01-01", "2015-12-31"))
    assert {(c, i) for c, i, _ in got} == {("c04", 0), ("c04", 2)}


def test_stats_survive_compaction(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_year_events(spark), batch_id=0, transform=apply_chain)
    t.apply_changes(_year_events(spark, start_seq=100), batch_id=1,
                    transform=apply_chain)
    t.compact()
    man = t.manifest()
    for e in man["buckets"].values():
        if e.get("base"):
            assert "ts" in (e["base"].get("stats") or {})
    keep = t._range_buckets(
        man, "ts", dt.datetime(2005, 1, 1), dt.datetime(2005, 12, 31)
    )
    assert keep == [6]
    got = _range_rows(t.read_range("2005-01-01", "2005-12-31"))
    assert {c for c, _, _ in got} == {"c03"}


def test_stats_survive_rebucket(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_year_events(spark), batch_id=0, transform=apply_chain)
    t.rebucket(16)
    man = t.manifest()
    keep = t._range_buckets(
        man, "ts", dt.datetime(2005, 1, 1), dt.datetime(2005, 12, 31)
    )
    assert len(keep) < len(man["buckets"])
    got = _range_rows(t.read_range("2005-01-01", "2005-12-31"))
    assert {c for c, _, _ in got} == {"c03"}


def test_recent_window_touches_only_recent_buckets(spark, tmp_table):
    """The scale shape read_range targets: with num_buckets large relative
    to a batch's key spread, a recent-window read prunes to the buckets the
    recent batches touched — O(events-in-window), not O(num_buckets)."""
    t = LakeTable(spark, tmp_table, num_buckets=64, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    old = [("I", i + 1, f"old-{i:03d}", 0, "user", "x", None,
            "2000-06-01", None) for i in range(40)]
    t.apply_changes(_events(spark, old), batch_id=0, transform=apply_chain)
    new = [("I", 100 + i, f"new-{i}", 0, "user", "y", None,
            "2024-02-01", None) for i in range(3)]
    t.apply_changes(_events(spark, new), batch_id=1, transform=apply_chain)
    man = t.manifest()
    assert len(man["buckets"]) > 20  # the old batch really spread out
    keep = t._range_buckets(
        man, "ts", dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 31)
    )
    assert len(keep) <= 3  # only the recent batch's buckets survive
    got = _range_rows(t.read_range("2024-01-01", "2024-12-31"))
    assert {c for c, _, _ in got} == {"new-0", "new-1", "new-2"}


def test_mixed_bound_types_and_coercion(ztable):
    """Bounds may mix datetime / date / ISO-string styles; each is coerced
    once and feeds BOTH the prune and the filter (review finding: a
    filter-side-only cast truncated below the prune bound)."""
    want = _range_rows(ztable.read_range("2005-01-01", "2005-12-31"))
    assert want  # c03's rows
    assert _range_rows(
        ztable.read_range(dt.datetime(2005, 1, 1), "2005-12-31")
    ) == want
    assert _range_rows(
        ztable.read_range("2005-01-01", dt.datetime(2005, 12, 31))
    ) == want
    assert _range_rows(
        ztable.read_range(dt.date(2005, 1, 1), dt.date(2005, 12, 31))
    ) == want
    # sub-day bounds are honored exactly (rows are at 2005-03-10..12)
    assert len(_range_rows(
        ztable.read_range("2005-03-10T00:00:00", "2005-03-11T23:59:59")
    )) == 2
    with pytest.raises(TypeError):
        ztable.read_range(12345, "2005-12-31")  # number for a ts column


def test_coerce_bound_truncates_identically_for_date_columns():
    import pyspark.sql.types as T

    assert LakeTable._coerce_bound(
        dt.datetime(2005, 1, 1, 12, 30), T.DateType()
    ) == dt.date(2005, 1, 1)
    assert LakeTable._coerce_bound("2005-01-01", T.DateType()) == dt.date(2005, 1, 1)
    assert LakeTable._coerce_bound(
        "2005-01-01T06:00", T.TimestampType()
    ) == dt.datetime(2005, 1, 1, 6)


def test_retry_commit_carries_zone_stats(spark, tmp_table):
    """A batch that wins via conflict retry must still record zone maps on
    its delta entries (review finding: the retry path re-appended bare
    {path, schema_id} entries, silently degrading pruning under
    concurrency)."""
    from tests.test_lake import _interleave

    t_a = LakeTable(spark, tmp_table, num_buckets=4, merge_mode="mor")
    t_a.create(TRANSCRIPT_SCHEMA)
    t_b = LakeTable(spark, tmp_table, merge_mode="mor")
    ev_a = _events(spark, [("I", 1, "cA", 0, "user", "a", None,
                            "2005-03-10", None)])
    ev_b = _events(spark, [("I", 2, "cB", 0, "user", "b", None,
                            "1999-01-01", None)])
    _interleave(t_a, lambda: t_b.apply_changes(ev_b, transform=apply_chain))
    m = t_a.apply_changes(ev_a, transform=apply_chain)
    assert m.get("commit_retried"), m
    man = t_a.manifest()
    deltas = [d for e in man["buckets"].values()
              for d in (e.get("deltas") or [])]
    assert deltas and all("ts" in (d.get("stats") or {}) for d in deltas)
    got = _range_rows(t_a.read_range("2005-01-01", "2005-12-31"))
    assert [(c, i) for c, i, _ in got] == [("cA", 0)]


def test_disabled_stats_fall_back_to_full_scan(spark, tmp_table):
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor",
                  stats_cols=())
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_year_events(spark), batch_id=0, transform=apply_chain)
    man = t.manifest()
    # no stats recorded -> every populated bucket stays in (conservative)
    keep = t._range_buckets(
        man, "ts", dt.datetime(2005, 1, 1), dt.datetime(2005, 12, 31)
    )
    assert keep == sorted(int(b) for b in man["buckets"])
    got = _range_rows(t.read_range("2005-01-01", "2005-12-31"))
    assert {c for c, _, _ in got} == {"c03"}


def test_read_range_correct_under_non_utc_session(spark, tmp_table):
    """Zone maps store UTC epochs while F.lit(naive datetime) means
    session-tz wall time: on a non-UTC session the prune and the filter
    used to disagree by the UTC offset and silently skip buckets. The
    bound is now localized in the session tz BEFORE both consumers, so
    read_range must equal the full-scan filter under any session tz."""
    t = LakeTable(spark, tmp_table, num_buckets=8, merge_mode="mor")
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_year_events(spark), batch_id=0, transform=apply_chain)
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = _range_rows(t.read_range("2005-03-10", "2005-03-11 23:59:59"))
        want = _range_rows(
            t.read().filter(
                "ts BETWEEN '2005-03-10' AND '2005-03-11 23:59:59'"
            )
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
