"""Profile the fused partition-router apply at the wide-batch shape.

Replicates bench.py::run_wide_batch_partitioned (8M events / 2 batches,
12 monthly partitions x 8 buckets vs flat 64-bucket) but prints the
router's per-batch phase metrics (discovery, stage write, commit fan-out,
global commit) so the residual routing tax can be attributed.

Usage: python tools/profile_wide_router.py [n_events]
"""
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.plans.partitioned import PartitionedTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.session import get_spark
from cdm_to_mods_spark.sources.synth import synth_events


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "profile-wide-router",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{shm}/prof-spark-local"}
        if shm else None,
    )
    work = tempfile.mkdtemp(prefix="prof-widep-", dir=shm)
    try:
        ev = (
            synth_events(spark, n, max(1_000, n // 100), seed=42,
                         hot_frac=0.05)
            .drop("ts_raw")
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1735689600)
                    + F.pmod(
                        F.xxhash64(F.lit(7), "conv_id", "turn_idx"),
                        F.lit(365 * 86400),
                    )
                ),
            )
        )
        seg = os.path.join(work, "ev")
        ev.repartition(
            spark.sparkContext.defaultParallelism
        ).write.parquet(seg)
        half = n // 2

        flat = LakeTable(spark, os.path.join(work, "flat"),
                         num_buckets=64, merge_mode="mor")
        flat.create(TRANSCRIPT_SCHEMA)
        part = PartitionedTable(spark, os.path.join(work, "part"),
                                num_buckets=8, merge_mode="mor")
        part.create(TRANSCRIPT_SCHEMA)

        t0 = time.monotonic()
        for b, pred in enumerate((F.col("seq") < half, F.col("seq") >= half)):
            tb = time.monotonic()
            m = flat.apply_changes(
                spark.read.parquet(seg).filter(pred), batch_id=b
            )
            print(f"flat batch {b}: {time.monotonic()-tb:.3f}s "
                  f"elapsed_sec={m.get('elapsed_sec')}")
        flat.read().count()
        el_flat = time.monotonic() - t0
        print(f"FLAT total: {el_flat:.3f}s  ({n/el_flat:,.0f} ev/s)")

        t0 = time.monotonic()
        for b, pred in enumerate((F.col("seq") < half, F.col("seq") >= half)):
            tb = time.monotonic()
            m = part.apply_changes(
                spark.read.parquet(seg).filter(pred), batch_id=b
            )
            print(f"part batch {b}: {time.monotonic()-tb:.3f}s wall="
                  f"{m['wall_sec']} fused={m['fused']} "
                  f"phases={json.dumps(m.get('phases', {}))}")
        part.read().count()
        el_part = time.monotonic() - t0
        print(f"PART total: {el_part:.3f}s  ({n/el_part:,.0f} ev/s)")
        print(f"routing_tax: {el_part/el_flat:.2f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
