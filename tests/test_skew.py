"""Explicit salting operators: result parity with the unsalted formulation
on hot-key data, and the plan actually spreads the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdm_to_mods_spark.operators.skew import salted_distinct_count, salted_join


def _hot_facts(spark, n=5000, hot_frac=0.9):
    """90% of rows on one key — the skew shape."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < hot_frac * 10, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    facts = _hot_facts(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"L{i}") for i in range(50)], "k string, label string"
    )
    plain = {(r.k, r.v, r.label) for r in facts.join(dim, "k").collect()}
    salted = {(r.k, r.v, r.label) for r in salted_join(facts, dim, "k").collect()}
    assert salted == plain and len(plain) == 5000


def test_salted_join_left_outer(spark):
    facts = _hot_facts(spark, n=200)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    plain = {(r.k, r.v, r.label) for r in facts.join(dim, "k", "left").collect()}
    salted = {
        (r.k, r.v, r.label)
        for r in salted_join(facts, dim, "k", how="left").collect()
    }
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    facts = _hot_facts(spark)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(facts, dim, "k", n_salt=8)
    # mechanism probe (AQE re-coalesces tiny outputs, so partition ids
    # post-join prove nothing): the shuffle key must include the salt, so
    # the hot key hashes to up to n_salt reducers...
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    import re

    assert re.search(r"hashpartitioning\([^)]*_salt", plan) or "BroadcastHashJoin" in plan
    # ...and the facts side actually uses >1 distinct salt for the hot key
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64("v"), F.lit(8)).cast("int")
    )
    assert f.filter("k = 'hot'").select("_salt").distinct().count() > 1


def test_salted_distinct_count_exact(spark):
    facts = _hot_facts(spark)
    want = {
        (r.k, r.n)
        for r in facts.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {
        (r.k, r.n_distinct)
        for r in salted_distinct_count(facts, ["k"], "v", n_salt=8).collect()
    }
    assert got == want


def test_salted_join_rejects_dim_preserving_types(spark):
    """right/full outer would emit each unmatched dim row once per salt
    replica — the operator must refuse rather than silently duplicate."""
    import pytest

    facts = _hot_facts(spark, n=50)
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="replicated"):
            salted_join(facts, dim, "k", how=how)


def test_latest_per_key_window_tie_parity(spark):
    """The window formulation must apply the SAME full tie-break as the
    max_by hot path — equal (seq, op) pairs are real (delete_where LSN
    collisions), and the differential oracle may not pick an arbitrary
    partition-order row on them."""
    from cdm_to_mods_spark.operators.dedup import (
        latest_per_key,
        latest_per_key_window,
    )

    rows = [
        # equal (seq, op) tie — payload must break it identically
        ("c1", 0, 5, "U", "alpha"),
        ("c1", 0, 5, "U", "zeta"),
        ("c1", 0, 5, "U", None),
        # op tie at equal seq
        ("c2", 0, 7, "D", "gone"),
        ("c2", 0, 7, "U", "kept"),
        # plain seq winner
        ("c3", 1, 1, "I", "old"),
        ("c3", 1, 9, "U", "new"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, seq long, op string, text string"
    ).repartition(8)
    a_rows = latest_per_key(df).collect()
    a = {tuple(r) for r in a_rows}
    b = {tuple(r) for r in latest_per_key_window(df).select(*a_rows[0].__fields__).collect()}
    assert a == b
    got = {(r.conv_id, r.turn_idx): (r.seq, r.op, r.text) for r in a_rows}
    assert got[("c1", 0)] == (5, "U", "zeta")
    assert got[("c2", 0)] == (7, "U", "kept")
    assert got[("c3", 1)] == (9, "U", "new")
