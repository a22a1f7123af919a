"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship CDC replay — derive a deterministic change log from the
sf0.001 ``events`` table, replay it through the LakeTable MERGE engine, and
return the converged transcripts state.

``queries``/``oracle_sql``: the SURVEY.md §2 operator inventory plus the
training-data pipeline operators, each over /root/testdata parquet with a
DuckDB-portable oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdm_to_mods_spark import pipeline as _pipeline  # noqa: E402  (registers queries)
from cdm_to_mods_spark import queries as _queries  # noqa: E402
from cdm_to_mods_spark.functions.chain import apply_chain  # noqa: E402
from cdm_to_mods_spark.replay import replay_in_batches  # noqa: E402


def events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the testdata ``events`` table into the
    engine's change-event schema: event_id → seq, user_id → conversation,
    hash-derived turn/op, props → text payload."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    op = (
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 7, F.lit("I"))
        .when(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 9, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    return ev.select(
        op.alias("op"),
        F.col("event_id").cast("long").alias("seq"),
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(20)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.concat_ws(" ", "event_type", F.col("props")).alias("text"),
        F.lit("search").alias("tool"),
        F.date_format("ts", "MM/dd/yyyy HH:mm:ss").alias("ts_raw"),
        F.col("ts").alias("ingest_ts"),
    )


def _max_col_from_footers(path: str, col: str) -> int | None:
    """Max of ``col`` from parquet FOOTER statistics — driver-side metadata
    read, no Spark job (at 10^10 events a max-only pre-scan is a real job;
    lake formats keep these bounds in manifests for exactly this reason)."""
    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    )
    mx = None
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = next(
            (i for i in range(md.num_columns) if md.schema.column(i).name == col),
            None,
        )
        if idx is None:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                mx = st.max if mx is None else max(mx, st.max)
    return mx


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay of a 10k-event change log through the
    PRODUCTION layout — the ``months(ts) x bucket(conv_id)`` partition
    router (plans/partitioned.py, the compound pipeline being the primary
    path mirrors the reference's convert_cdm_to_mods.py:53-74) — plus the
    same log through a flat table, asserting the two converge to the
    identical final state before returning it. The driver's smoke check
    therefore exercises routing, the stage-first fused apply, per-sub
    ledgers, and the global cut end-to-end, not just the flat MERGE."""
    sf_dir = "/root/testdata/sf0.001"
    changelog = events_as_changelog(spark, sf_dir)
    # seq == event_id: bound the replay from footer metadata, not a scan.
    hi = _max_col_from_footers(f"{sf_dir}/events.parquet", "event_id")
    if hi is None:  # stats missing → one explicit agg job (fallback)
        hi = changelog.agg(F.max("seq")).collect()[0][0]
    max_seq = int(hi) + 1
    table_path = tempfile.mkdtemp(prefix="cdc-flagship-")
    routed = replay_in_batches(
        spark,
        changelog,
        os.path.join(table_path, "transcripts"),
        n_batches=4,
        max_seq=int(max_seq),
        num_buckets=16,
        merge_mode="mor",
        partition_by="month",
        cross_partition_upsert=True,
    )
    flat = replay_in_batches(
        spark,
        changelog,
        os.path.join(table_path, "transcripts-flat"),
        n_batches=4,
        max_seq=int(max_seq),
        num_buckets=16,
        merge_mode="mor",
    )
    # exact convergence gate: orderless full-row hash + count must agree
    # between the routed and flat replays (events_as_changelog derives a
    # per-key ts, so (partition, key) identity equals flat key identity)
    def _h(t):
        df = t.read()
        cols = sorted(df.columns)
        return df.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    hr, hf = _h(routed), _h(flat)
    if (hr.h, hr.n) != (hf.h, hf.n):
        raise AssertionError(
            f"flagship divergence: routed (hash={hr.h}, n={hr.n}) != "
            f"flat (hash={hf.h}, n={hf.n})"
        )
    return routed.read().orderBy("conv_id", "turn_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_queries.ORACLE)
