"""Interleaved A/B: spark.sql.execution.arrow.maxRecordsPerBatch on the
2M-event MoR replay (steady-state, same process, best-of-2 per setting)."""
import os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from cdm_to_mods_spark.session import get_spark
from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.replay import open_or_create
from cdm_to_mods_spark.sources.synth import write_event_batches, synth_events
from cdm_to_mods_spark.replay import replay_in_batches

spark = get_spark("ab-arrow", master="local[32]",
                  extra_conf={"spark.local.dir": "/dev/shm/ab-spark-local"})
root = tempfile.mkdtemp(prefix="ab-arrow-", dir="/dev/shm")
try:
    segs = write_event_batches(spark, os.path.join(root, "ev"), 2_000_000,
                               20_000, n_batches=4, files_per_batch=32,
                               seed=42, hot_frac=0.05)
    # warmup (same shape)
    replay_in_batches(spark, synth_events(spark, 500_000, 5_000, seed=7),
                      os.path.join(root, "warm"), n_batches=1,
                      max_seq=500_000, num_buckets=64,
                      merge_mode="mor").read().count()
    settings = ["10000", "65536", "200000"]
    results = {s: [] for s in settings}
    for rep in range(2):
        for s in settings:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", s)
            t0 = time.monotonic()
            t = open_or_create(spark, os.path.join(root, f"tab-{s}-{rep}"), 64, "mor")
            for b, seg in enumerate(segs):
                t.apply_changes(spark.read.parquet(seg), batch_id=b,
                                transform=apply_chain, source=seg)
            t.read().count()
            dt = time.monotonic() - t0
            results[s].append(round(dt, 2))
            print(f"rep{rep} batch={s}: {dt:.2f}s ({2_000_000/dt/1000:.0f}k ev/s)", flush=True)
    for s in settings:
        best = min(results[s])
        print(f"BEST batch={s}: {best:.2f}s ({2_000_000/best/1000:.0f}k ev/s)")
finally:
    shutil.rmtree(root, ignore_errors=True)
