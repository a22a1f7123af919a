"""A/B the LSM fold tiering: big-base table (2M rows bootstrapped), then a
tail of small churn batches with compact_deltas=4. Old behavior = every
fold rewrites the bucket bases (major); new = minor folds of the chain.
Interleaved, best-of-2 per arm; measures the TAIL apply wall only."""
import os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from cdm_to_mods_spark.session import get_spark
from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.plans.lake import LakeTable
from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
from cdm_to_mods_spark.sources.synth import synth_events

spark = get_spark("ab-minor", master="local[32]",
                  extra_conf={"spark.local.dir": "/dev/shm/ab-minor-local"})
root = tempfile.mkdtemp(prefix="ab-minor-", dir="/dev/shm")
N_BASE = int(os.environ.get('AB_BASE', 2_000_000))
N_CONVS = 200_000
TAIL_BATCHES = int(os.environ.get('AB_TAIL', 12))
TAIL_EVENTS = 25_000   # per batch; churn over a 2.5k-conv hot set

try:
    # one snapshot + one shared tail event set, pre-materialized
    snap = (
        synth_events(spark, N_BASE, N_CONVS, seed=42)
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("seq"))))
        .filter("rn = 1 AND op <> 'D'")
        .select("conv_id", "turn_idx", "role",
                F.col("text"), F.col("tool"),
                F.to_timestamp(F.lit("2020-01-01 00:00:00")).alias("ts"))
    )
    snap_path = os.path.join(root, "snap")
    snap.write.parquet(snap_path)
    tail_paths = []
    for b in range(TAIL_BATCHES):
        ev = synth_events(spark, TAIL_EVENTS, 2_500, seed=100 + b).withColumn(
            "seq", F.col("seq") + (N_BASE + 1 + b * TAIL_EVENTS))
        p = os.path.join(root, f"tail-{b}")
        ev.write.parquet(p)
        tail_paths.append(p)

    def run(arm, rep):
        n_buckets = int(os.environ.get("AB_BUCKETS", 64))
        t = LakeTable(spark, os.path.join(root, f"tab-{arm}-{rep}"),
                      num_buckets=n_buckets, merge_mode="mor",
                      compact_deltas=4)
        t._minor_folds = (arm == "minor")
        t.create(TRANSCRIPT_SCHEMA)
        t.bootstrap(spark.read.parquet(snap_path), snapshot_seq=N_BASE)
        t.compact()  # seed real bases with recorded row counts
        t0 = time.monotonic()
        majors = minors = 0
        for b, p in enumerate(tail_paths):
            m = t.apply_changes(spark.read.parquet(p), batch_id=b,
                                transform=apply_chain, source=p)
            majors += m.get("n_buckets_compacted", 0)
            minors += m.get("n_buckets_minor_compacted", 0)
        n = t.read().count()
        dt = time.monotonic() - t0
        print(f"rep{rep} {arm}: tail {dt:.2f}s "
              f"({TAIL_BATCHES*TAIL_EVENTS/dt/1000:.0f}k ev/s) "
              f"majors={majors} minors={minors} rows={n}", flush=True)
        return dt

    # warm
    run("warm", 0)
    res = {"major": [], "minor": []}
    for rep in range(1, 3):
        for arm in ("major", "minor"):
            res[arm].append(run(arm, rep))
    for arm in ("major", "minor"):
        print(f"BEST {arm}: {min(res[arm]):.2f}s")
finally:
    shutil.rmtree(root, ignore_errors=True)
