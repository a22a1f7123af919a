"""Z-order clustering: ``compact(cluster_by=[...], layout="zorder")``.

Checks the three things that make the layout real, not decorative:
state preservation (a re-layout must be invisible to every read plane),
multi-dimension tightness (consecutive row blocks span a small slice of
EVERY clustered column, where lexicographic leaves the trailing column
at full range), and skew-proof binning (quantile ranks, not value range).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.operators.zorder import (
    compute_boundaries,
    numeric_proxy,
    zvalue_expr,
)
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

from tests.test_lake import _events

N_CONV = 40
TURNS = 16  # N_CONV * TURNS rows, two independent dims: ts-day x turn_idx


def _grid_events(spark):
    """conv c00..c39 each with turns 0..15; ts day tracks conv index so
    (ts, turn_idx) form a uniform 40x16 grid of independent dims."""
    rows, seq = [], 1
    for ci in range(N_CONV):
        day = ci % 28 + 1
        for t in range(TURNS):
            rows.append(
                ("I", seq, f"c{ci:02d}", t, "user", f"txt-{ci}-{t}", None,
                 f"2024-03-{day:02d} {t:02d}:00:00", None)
            )
            seq += 1
    return _events(spark, rows)


def _state(t):
    return sorted(
        (r.conv_id, r.turn_idx, r.text, str(r.ts)) for r in t.read().collect()
    )


def _bucket_file_rows(table, cols):
    """Rows of every bucket's base file in PHYSICAL (file) order via
    pyarrow — Spark reads don't pin intra-file order, the layout test
    needs it."""
    import pyarrow.parquet as pq

    man = table.manifest()
    out = {}
    for b, e in man["buckets"].items():
        fsets = LakeTable._bucket_files(e)
        if not fsets:
            continue
        d = os.path.join(table.path, fsets[0]["path"])
        parts = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        rows = []
        for p in parts:
            tb = pq.read_table(p, columns=cols)
            rows.extend(zip(*[tb.column(c).to_pylist() for c in cols]))
        out[b] = rows
    return out


def _block_span_sum(rows, dim_idx, block=32):
    """Sum over consecutive blocks of the span (max-min) of one dimension
    — the proxy for row-group min/max tightness."""
    total = 0.0
    for i in range(0, len(rows), block):
        chunk = [r[dim_idx] for r in rows[i:i + block]]
        vals = [v for v in chunk if v is not None]
        if len(vals) > 1:
            lo, hi = min(vals), max(vals)
            total += (hi - lo) if not hasattr(hi, "timestamp") else (
                hi.timestamp() - lo.timestamp()
            )
    return total


@pytest.fixture(params=["cow", "mor"])
def ztab(spark, tmp_table, request):
    t = LakeTable(spark, tmp_table, num_buckets=2, merge_mode=request.param,
                  stats_cols=("ts",))
    t.create(TRANSCRIPT_SCHEMA)
    t.apply_changes(_grid_events(spark), batch_id=0, transform=apply_chain)
    return t


def test_zorder_preserves_state_and_feeds(ztab):
    before = _state(ztab)
    hist_len = len(ztab.history())
    res = ztab.compact(cluster_by=["ts", "turn_idx"], layout="zorder")
    assert res["compacted"] == 2
    assert _state(ztab) == before
    # reopen adopts the same state; maintenance commit carries layout
    fresh = LakeTable(ztab.spark, ztab.path)
    assert _state(fresh) == before
    assert ztab.manifest()["metrics"]["layout"] == "zorder"
    assert len(ztab.history()) == hist_len + 1


def _dense_grid_events(spark):
    """64 convs x 32 turns; ts depends ONLY on the conv (day + hour), so
    (ts, turn_idx) are fully independent dims — 64x32 cells, 1 row each."""
    rows, seq = [], 1
    for ci in range(64):
        day, hour = ci % 16 + 1, ci // 16
        for t in range(32):
            rows.append(
                ("I", seq, f"g{ci:02d}", t, "user", f"x{seq}", None,
                 f"2024-03-{day:02d} {hour:02d}:00:00", None)
            )
            seq += 1
    return _events(spark, rows)


def test_zorder_tightens_trailing_dim(spark, tmp_path):
    """Lexicographic (ts, turn_idx) leaves turn_idx at full span in every
    block (each distinct ts holds one conv's whole turn range); z-order
    bounds BOTH dims. Deterministic on the independent 64x32 grid."""
    spans = {}
    for layout in ("linear", "zorder"):
        t = LakeTable(spark, str(tmp_path / layout), num_buckets=1)
        t.create(TRANSCRIPT_SCHEMA)
        t.apply_changes(_dense_grid_events(spark), batch_id=0,
                        transform=apply_chain)
        t.compact(cluster_by=["ts", "turn_idx"], layout=layout,
                  zorder_sample_fraction=1.0)
        rows = _bucket_file_rows(t, ["ts", "turn_idx"])["0"]
        assert len(rows) == 64 * 32
        spans[layout] = _block_span_sum(rows, dim_idx=1, block=64)
    # z-order cuts the trailing-dim block span by at least half vs
    # lexicographic (in practice far more on the uniform grid)
    assert spans["zorder"] < 0.5 * spans["linear"], spans


def test_zorder_groups_equal_strings(spark, tmp_path):
    """String dims ride the byte-prefix proxy: equal role values cluster,
    so blocks hold few distinct roles."""
    rows, seq = [], 1
    roles = ["assistant", "system", "tool", "user"]
    for ci in range(N_CONV):
        for t in range(TURNS):
            rows.append(
                ("I", seq, f"c{ci:02d}", t, roles[(ci * TURNS + t) % 4],
                 f"x{seq}", None, f"2024-03-{ci % 28 + 1:02d} 00:00:00", None)
            )
            seq += 1
    avg = {}
    for layout in ("linear", "zorder"):
        t = LakeTable(spark, str(tmp_path / layout), num_buckets=1)
        t.create(TRANSCRIPT_SCHEMA)
        t.apply_changes(_events(spark, rows), batch_id=0,
                        transform=apply_chain)
        before = _state(t)
        # role TRAILING in the linear arm: ts-major order mixes all four
        # roles into every block; the z-curve co-locates equal roles
        cluster = ["ts", "role"] if layout == "linear" else ["role", "ts"]
        t.compact(cluster_by=cluster, layout=layout,
                  zorder_sample_fraction=1.0)
        assert _state(t) == before
        physical = _bucket_file_rows(t, ["role"])["0"]
        distinct_per_block = [
            len({r[0] for r in physical[i:i + 32]})
            for i in range(0, len(physical), 32)
        ]
        avg[layout] = sum(distinct_per_block) / len(distinct_per_block)
    assert avg["zorder"] < 0.8 * avg["linear"], avg


def test_boundaries_spread_skewed_values(spark):
    """A Zipf-hot numeric column still spreads across rank bins (equal-
    width binning would collapse the hot mass into one bin)."""
    vals = [(1.0,)] * 500 + [(2.0,)] * 300 + [(float(v),) for v in range(3, 103)]
    df = spark.createDataFrame(vals, "v double")
    bounds = compute_boundaries(df, ["v"], bits=5, sample_fraction=1.0)
    # rank binning must split the long tail off the hot values
    assert len(bounds["v"]) >= 3
    zdf = df.withColumn("z", zvalue_expr(bounds, df.schema, bits=5))
    assert zdf.select("z").distinct().count() >= 4


def test_string_proxy_orders_like_bytes(spark):
    df = spark.createDataFrame(
        [("a",), ("aa",), ("b",), ("ba",), ("",), (None,)], "s string"
    )
    got = [
        r.p
        for r in df.select(
            numeric_proxy("s", T.StringType()).alias("p")
        ).collect()
    ]
    a, aa, b, ba, empty, null = got
    assert null is None
    assert empty < a < aa < b < ba


def test_zorder_read_range_correct_after_relayout(ztab):
    ztab.compact(cluster_by=["ts", "turn_idx"], layout="zorder")
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in ztab.read_range(
            "2024-03-05", "2024-03-06 23:59:59", col="ts"
        ).collect()
    )
    exp = sorted(
        (f"c{ci:02d}", t)
        for ci in range(N_CONV)
        for t in range(TURNS)
        if ci % 28 + 1 in (5, 6)
    )
    assert got == exp


def test_zorder_refusals(ztab):
    with pytest.raises(ValueError, match="requires cluster_by"):
        ztab.compact(layout="zorder")
    with pytest.raises(ValueError, match="unknown layout"):
        ztab.compact(cluster_by=["ts"], layout="hilbert")
    with pytest.raises(ValueError, match="not in schema"):
        ztab.compact(cluster_by=["nope"], layout="zorder")


def test_zvalue_many_columns_fits_signed_long(spark):
    """bits*ncols past 63 must degrade bit DEPTH, not wrap: Java shifts
    are mod 64 and the interleave uses addition, so overflowing bit
    positions carried into neighbors (a scrambled key reporting
    success), while bit 63 flipped the sign (top bins sorting first)."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.operators.zorder import (
        compute_boundaries,
        zvalue_expr,
    )

    ncols = 11
    cols = [f"c{i}" for i in range(ncols)]
    df = spark.range(200).select(
        *[
            (F.col("id") * (i + 1) % 97).cast("double").alias(c)
            for i, c in enumerate(cols)
        ]
    )
    bounds = compute_boundaries(df, cols, bits=6, sample_fraction=1.0)
    z = df.select(
        zvalue_expr(bounds, df.schema, bits=6).alias("z"), *cols
    )
    rows = z.collect()
    assert all(r.z >= 0 for r in rows)  # sign bit never set
    # monotone sanity: the all-max row must not sort below the all-min row
    lo = min(rows, key=lambda r: sum(r[c] for c in cols))
    hi = max(rows, key=lambda r: sum(r[c] for c in cols))
    assert lo.z <= hi.z
