"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (runtime
re-plan + skew-join splitting), shuffle partitions sized to cores (not the
200 default), Arrow enabled for the pandas-UDF transform path, UTC session
timezone so results compare bit-exactly against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdm_to_mods_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster the caller passes nothing and spark-submit decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    # Parallelism-appropriate shuffle width: ~cores in local mode.
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(4, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's 64m default advisory size coalesces post-shuffle stages to a
        # handful of tasks for ~100-500MB micro-batches, capping the Arrow
        # transform stage's parallelism below the core count (measured 2.3×
        # loss at 32 cores). Post-shuffle stages here carry a per-row Python
        # (Arrow) cost, so smaller partitions = more usable parallelism;
        # still large enough that task overhead stays <1%.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # Same reasoning for the SCAN side: a CDC micro-batch segment is a
        # few hundred MB, and the default 128m split feeds the scan+partial-
        # dedup stage with only 2-3 tasks no matter how many cores exist.
        # 16m keeps micro-batch scans wide; large-table scans just get more
        # (cheap) tasks.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark's default INT96 timestamp encoding is a stats-less legacy
        # type: parquet footers carry NO min/max for INT96 columns, which
        # would blind both the lake's zone maps (plans/lake.py read_range)
        # and row-group pruning on ts predicates. TIMESTAMP_MICROS is the
        # parquet-standard encoding every modern reader (arrow, duckdb,
        # presto/trino, iceberg) expects.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
