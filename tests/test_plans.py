"""Physical-plan audits — hard evidence that the optimizer properties the
engine relies on actually hold: parquet predicate/projection pushdown,
broadcast joins for small dims, and map-side partial aggregation in the
dedup hot path (the skew absorber). These pin the plan SHAPE, not timing,
so they are stable across hosts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.operators.dedup import latest_per_key
from cdm_to_mods_spark import queries as _Q
from cdm_to_mods_spark.queries import QUERIES


def _query(name):
    """Registry entry or unregistered building block (suite-grouped)."""
    from cdm_to_mods_spark import pipeline as _P  # registers the d/e/t/m families

    if name in QUERIES:
        return QUERIES[name]
    return getattr(_Q, name, None) or getattr(_P, name)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_s1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(_query("s1_scan_pushdown")(spark, SF_DIR))
    assert "PushedFilters" in plan
    # the equality predicate reaches the parquet reader
    assert "EqualTo(event_type,click)" in plan or "event_type" in plan.split(
        "PushedFilters"
    )[1][:200]
    # projection pruning: the scan schema must not include unused columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_j1_broadcasts_small_dimension(spark):
    plan = _plan(_query("j1_broadcast_dim_join")(spark, SF_DIR))
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
    plan = _plan(_query("o6_topk_per_group")(spark, SF_DIR))
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


def test_partial_update_collapse_is_single_shuffle(spark):
    """The partial-update in-batch collapse keeps the apply plan's shape:
    one hash aggregate whose clustering is satisfied by the same
    repartition(n, bucket_col), no second exchange, no window, no Python
    nodes — swapping the merge engine must not cost a shuffle."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.operators.dedup import resolve_partial_update

    ev = spark.createDataFrame(
        [("I", 1, "c1", 0, "x")],
        "op string, seq long, conv_id string, turn_idx int, text string",
    )
    df = resolve_partial_update(
        ev.repartition(8, F.col("conv_id")),
        ("conv_id", "turn_idx"),
        "seq",
        "op",
        preserve_kill=True,
    )
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(conv_id" in plan
    assert "Window" not in plan and "EvalPython" not in plan


@pytest.mark.parametrize("qname", ["p1_rename_project", "f1_xml_escape"])
def test_scalar_chains_have_no_python_nodes(spark, qname):
    """Scalar-function families stay JVM-side: no Python eval nodes."""
    fn = _query(qname)
    plan = _plan(fn(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_w1_global_order_has_no_single_partition_stage(spark):
    """w1_stable_order (global_row_number) must never funnel the table
    through one task: the plan carries a RANGE partitioning exchange and
    the offset join, but no Exchange SinglePartition — the round-2 weak
    item (bare ``row_number() OVER (ORDER BY ...)``) stays fixed."""
    df = _query("w1_stable_order")(spark, SF_DIR)
    plan = _plan(df)
    # (the range-partitioned sort itself sits behind the pinned
    # localCheckpoint, so the visible plan starts at Scan ExistingRDD —
    # what matters is that NOTHING downstream collapses to one partition)
    assert "Exchange SinglePartition" not in plan, plan
    # the window is per-partition (_pid), never global
    assert "windowspecdefinition(_pid" in plan, plan
    # the per-partition offsets arrive via broadcast, not another shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_global_row_number_matches_global_window(spark):
    """Value check at an awkward size (rows ≪ partitions, ties in the
    prefix of the order key): distributed two-phase rank == the
    single-partition window it replaces."""
    from pyspark.sql import Window as W

    from cdm_to_mods_spark.operators.order import global_row_number

    df = spark.range(0, 97).select(
        (F.col("id") % 7).alias("grp"), F.col("id").alias("id")
    )
    got = {
        (r.grp, r.id, r.rn)
        for r in global_row_number(df, ["grp", "id"], num_partitions=16).collect()
    }
    w = W.orderBy("grp", "id")
    want = {
        (r.grp, r.id, r.rn)
        for r in df.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_scan_suite_keeps_pushdown_per_branch(spark):
    """Suite-grouping must not cost the scans their pushdown: each branch
    of the union still pushes its predicate into its own parquet scan."""
    plan = _plan(_query("s1s2_scan_suite")(spark, SF_DIR))
    assert plan.count("PushedFilters: [") >= 2
    assert "GreaterThan(value,50.0)" in plan or "value" in plan
    assert "GreaterThanOrEqual(p_size,40)" in plan or "p_size" in plan


def test_text_suite_single_scan_no_python(spark):
    """t_text_suite: every text-analysis family in ONE scan of documents,
    JVM-only — no Python eval nodes; the ONLY exchange is t8's
    shard-partitioned packing window (hash partitioning, never
    SinglePartition — a global packing window would be the w1
    scale-killer)."""
    plan = _plan(_query("t_text_suite")(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Exchange hashpartitioning(t8_shard" in plan
    assert "Exchange SinglePartition" not in plan


def test_part_scalar_suite_single_scan_one_arrow_node(spark):
    """f_part_scalar_suite: one scan of part; the date-qualifier pandas
    UDF is the ONLY Python node in an otherwise codegen projection."""
    plan = _plan(_query("f_part_scalar_suite")(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
