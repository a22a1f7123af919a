import os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from cdm_to_mods_spark.session import get_spark
from cdm_to_mods_spark.functions.chain import apply_chain
from cdm_to_mods_spark.replay import open_or_create, replay_in_batches
from cdm_to_mods_spark.sources.synth import write_event_batches, synth_events

spark = get_spark("ab-arrow2", master="local[32]",
                  extra_conf={"spark.local.dir": "/dev/shm/ab-spark-local2"})
root = tempfile.mkdtemp(prefix="ab-arrow2-", dir="/dev/shm")
try:
    segs = write_event_batches(spark, os.path.join(root, "ev"), 2_000_000,
                               20_000, n_batches=4, files_per_batch=32,
                               seed=42, hot_frac=0.05)
    replay_in_batches(spark, synth_events(spark, 500_000, 5_000, seed=7),
                      os.path.join(root, "warm"), n_batches=1,
                      max_seq=500_000, num_buckets=64,
                      merge_mode="mor").read().count()
    settings = ["10000", "200000"]
    results = {s: [] for s in settings}
    for rep in range(3):
        for s in settings:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", s)
            t0 = time.monotonic()
            t = open_or_create(spark, os.path.join(root, f"t-{s}-{rep}"), 64, "mor")
            for b, seg in enumerate(segs):
                t.apply_changes(spark.read.parquet(seg), batch_id=b,
                                transform=apply_chain, source=seg)
            t.read().count()
            dt = time.monotonic() - t0
            results[s].append(round(dt, 2))
            print(f"rep{rep} {s}: {dt:.2f}s", flush=True)
    for s in settings:
        print(f"BEST {s}: {min(results[s]):.2f}s  all={results[s]}")
finally:
    shutil.rmtree(root, ignore_errors=True)
