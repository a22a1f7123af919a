"""Physical-plan audits — hard evidence that the optimizer properties the
engine relies on actually hold: parquet predicate/projection pushdown,
broadcast joins for small dims, and map-side partial aggregation in the
dedup hot path (the skew absorber). These pin the plan SHAPE, not timing,
so they are stable across hosts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.operators.dedup import latest_per_key
from cdm_to_mods_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_s1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(QUERIES["s1_scan_pushdown"](spark, SF_DIR))
    assert "PushedFilters" in plan
    # the equality predicate reaches the parquet reader
    assert "EqualTo(event_type,click)" in plan or "event_type" in plan.split(
        "PushedFilters"
    )[1][:200]
    # projection pruning: the scan schema must not include unused columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_j1_broadcasts_small_dimension(spark):
    plan = _plan(QUERIES["j1_broadcast_dim_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_uses_partial_aggregation(spark):
    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "x")],
        "op string, seq long, conv_id string, turn_idx int, text string",
    )
    plan = _plan(latest_per_key(ev, ("conv_id", "turn_idx"), "seq"))
    # map-side combine before the exchange — the hot-key skew absorber
    assert "partial_max_by" in plan
    assert plan.index("partial_max_by") > plan.index("Exchange") or (
        # partial agg is BELOW the exchange in the tree (printed after)
        "partial_max_by" in plan.split("Exchange")[1]
    )


def test_o6_topk_filters_after_single_window_pass(spark):
    plan = _plan(QUERIES["o6_topk_per_group"](spark, SF_DIR))
    # one shuffle for the window partitioning, no extra sort-merge joins
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_apply_pipeline_is_single_shuffle(spark):
    """The hash32 MERGE apply plan: repartition(n, bucket_col) is the ONLY
    exchange — the dedup groupBy's clustering is satisfied by the
    key-subset partitioning (bucket_col ⊆ key_cols), so no second exchange
    appears before the bucket-partitioned write."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.operators.dedup import latest_per_key

    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "x")],
        "op string, seq long, conv_id string, turn_idx int, text string",
    )
    df = latest_per_key(
        ev.repartition(8, F.col("conv_id")), ("conv_id", "turn_idx"), "seq"
    )
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(conv_id" in plan


@pytest.mark.parametrize("qname", ["p1_rename_project", "f1_xml_escape"])
def test_scalar_chains_have_no_python_nodes(spark, qname):
    """Scalar-function families stay JVM-side: no Python eval nodes."""
    plan = _plan(QUERIES[qname](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
