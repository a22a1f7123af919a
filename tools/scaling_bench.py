"""Two-cluster-size scaling evidence (north rule, BASELINE.json:14).

No real multi-executor cluster exists in this sandbox, so per the driver's
protocol we run the SAME CDC replay job on the SAME deterministic input at
two parallelism levels — ``local[8]`` (N) and ``local[32]`` (4N) — in fresh
JVMs, and report throughput at both plus scaling efficiency::

    efficiency = (events_per_sec @ 32 cores) / (4 * events_per_sec @ 8 cores)

Target: >= 0.8 (BASELINE.json:2). Results are appended to BASELINE.md.

Because both "cluster sizes" share ONE machine here, the measured ratio is
bounded by the box itself (shared memory bandwidth, virtualized cores), not
only by the engine. ``--control CPUS N`` measures that bound: a pure
whole-stage-codegen scan+aggregate (zero shuffle, zero Python, zero I/O) at
the given parallelism — the engine cannot scale better than this on this
host. Report engine efficiency alongside control efficiency.

``--fleet K CPUS N`` emulates executors faithfully: K independent
``local[CPUS]`` JVM processes, each replaying the hash(conv_id) 1/K-th of
the SAME input into its own table shard — exactly the work distribution of
a K-executor cluster running the bucketed MERGE (conversations never cross
executors, so there is no inter-executor traffic to emulate). Efficiency
N→KN = aggregate_events_per_sec(K procs) / (K × events_per_sec(1 proc)).
Spark executors ARE separate JVMs; a single big JVM under-reports cluster
scaling (GC, allocator and Python-pool contention that a real cluster
does not share).

Usage:
    python tools/scaling_bench.py [n_events] [lo hi] [n_batches]  # parent: both levels
    python tools/scaling_bench.py --router [n_events lo hi NB]  # parent:
        #   ROUTED pair (months(ts) x bucket partition router, fused apply)
    python tools/scaling_bench.py --child CPUS N [NB] # child: one engine level
    python tools/scaling_bench.py --router-child CPUS N [NB]  # routed level
    python tools/scaling_bench.py --control CPUS N    # child: one control level
    python tools/scaling_bench.py --control-shuffle CPUS N  # shuffle+write ceiling
    python tools/scaling_bench.py --fleet K CPUS N    # K-process executor fleet
    python tools/scaling_bench.py --fleet-router K CPUS N  # routed fleet
    python tools/scaling_bench.py --fleet-child CPUS EVDIR TABLEDIR [routed]  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, n_events: int, n_batches: int = 4) -> None:
    import shutil
    import tempfile
    import time

    from cdm_to_mods_spark.replay import replay_in_batches
    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sources.synth import synth_events

    # Shuffle and table I/O go to tmpfs: on a real cluster, storage and
    # shuffle bandwidth scale with executor count (each node brings its own
    # disks/NICs), but this sandbox has ONE virtual disk shared by all
    # threads — leaving I/O on it measures the disk, not the engine.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{shm}/spark-local-{cpus}"} if shm else None,
    )
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create
    from cdm_to_mods_spark.sources.synth import write_event_batches

    n_convs = max(1_000, n_events // 100)
    table_dir = tempfile.mkdtemp(prefix=f"scaling-{cpus}-", dir=shm)
    # Materialize the binlog segments OUTSIDE the timed region — the job
    # under measurement is the CDC apply (read segment → dedup → transform
    # → MERGE), not the synthetic generator. This is also the realistic
    # shape: binlog segments arrive from storage.
    # Segment file count is pinned to the HIGH level's core count at both
    # levels, so the two runs read byte-identical inputs (a level-dependent
    # layout would hand the wide level a map-parallelism advantage the
    # narrow level's input denies it — the comparison must vary cores only).
    seg_paths = write_event_batches(
        spark,
        os.path.join(table_dir, "events"),
        n_events,
        n_convs,
        n_batches=n_batches,
        files_per_batch=32,
        seed=42,
        hot_frac=0.05,
    )
    # JIT/Arrow warmup outside the timed region (same as bench.py): the
    # timed region must measure steady-state throughput at each level, not
    # first-job codegen compilation.
    replay_in_batches(
        spark,
        synth_events(spark, 5_000, 100, seed=7),
        os.path.join(table_dir, "warmup"),
        n_batches=1,
        max_seq=5_000,
        num_buckets=8,
        merge_mode="mor",
    ).read().count()
    try:
        t0 = time.monotonic()
        table = open_or_create(
            spark, os.path.join(table_dir, "transcripts"), 64, "mor"
        )
        for b, seg in enumerate(seg_paths):
            table.apply_changes(
                spark.read.parquet(seg),
                batch_id=b,
                transform=apply_chain,
                source=seg,
            )
        rows = table.read().count()
        elapsed = time.monotonic() - t0
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n_events,
                "final_rows": rows,
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n_events / elapsed, 1),
            }
        )
    )


def router_child(cpus: int, n_events: int, n_batches: int = 2) -> None:
    """One engine level of the ROUTER-SHAPED scaling pair (round 5): the
    same CDC apply replayed into the production ``months(ts) x
    bucket(conv_id)`` layout — 12 monthly partitions, 8 buckets each,
    merge-on-read, conversation-derived ts (every version of a key keeps
    its month, the transcripts workload's shape) — through the stage-first
    fused apply. Input layout is pinned to 32 files/segment at both levels
    (byte-identical inputs; see ``child``)."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        f"scaling-router-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{shm}/spark-local-r{cpus}"}
        if shm else None,
    )
    n_convs = max(1_000, n_events // 100)
    table_dir = tempfile.mkdtemp(prefix=f"scaling-r{cpus}-", dir=shm)
    try:
        ev = (
            synth_events(spark, n_events, n_convs, seed=42, hot_frac=0.05)
            .drop("ts_raw")
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1735689600)  # 2025-01-01 UTC
                    + F.pmod(
                        F.xxhash64(F.lit(7), "conv_id", "turn_idx"),
                        F.lit(365 * 86400),
                    )
                ),
            )
        )
        per = (n_events + n_batches) // n_batches
        segs = []
        for b in range(n_batches):
            seg = os.path.join(table_dir, f"events/batch-{b:05d}")
            (
                ev.filter(
                    (F.col("seq") >= b * per) & (F.col("seq") < (b + 1) * per)
                )
                .repartition(32)
                .write.parquet(seg)
            )
            segs.append(seg)
        # warmup: both plan shapes the timed region uses (fused routed
        # apply at the spec granularity), untimed
        warm = PartitionedTable(
            spark, os.path.join(table_dir, "warmup"),
            num_buckets=8, merge_mode="mor",
        )
        warm.create(TRANSCRIPT_SCHEMA)
        # two warmup applies: the first compiles the empty-table fused
        # shape, the second the steady-state (existing partitions) shape
        # the timed batches 1..n actually run — plus the read/resolve plan
        warm.apply_changes(spark.read.parquet(segs[0]).limit(50_000),
                           batch_id=0)
        warm.apply_changes(
            spark.read.parquet(segs[-1]).limit(50_000), batch_id=1
        )
        warm.read().count()

        t0 = time.monotonic()
        table = PartitionedTable(
            spark, os.path.join(table_dir, "transcripts"),
            num_buckets=8, merge_mode="mor",
        )
        table.create(TRANSCRIPT_SCHEMA)
        for b, seg in enumerate(segs):
            table.apply_changes(spark.read.parquet(seg), batch_id=b,
                                source=seg)
        rows = table.read().count()
        elapsed = time.monotonic() - t0
        n_parts = len(table.partitions())
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n_events,
                "final_rows": rows,
                "n_partitions": n_parts,
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n_events / elapsed, 1),
            }
        )
    )


def control(cpus: int, n_rows: int) -> None:
    """Pure-compute upper bound for this host at a given parallelism:
    deterministic row synthesis + hash/length aggregation, fully inside
    whole-stage codegen. No shuffle, no Python workers, no disk."""
    import time

    from pyspark.sql import functions as F

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sources.synth import synth_events

    spark = get_spark(f"control-{cpus}", master=f"local[{cpus}]")
    synth_events(spark, 2_000_000, 20_000, seed=1).agg(F.count("*")).collect()
    t0 = time.monotonic()
    ev = synth_events(spark, n_rows, n_rows // 100, seed=42, hot_frac=0.05)
    ev.agg(F.count("*").alias("n"), F.avg(F.length("text")).alias("s")).collect()
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {"cpus": cpus, "n_rows": n_rows, "elapsed_sec": round(dt, 3),
             "rows_per_sec": round(n_rows / dt, 1)}
        )
    )


def control_shuffle(cpus: int, n_rows: int) -> None:
    """Shuffle-bearing upper bound: synthesize rows, hash-repartition on
    the key (one exchange — the apply pipeline's plan shape), write
    parquet to tmpfs. Pure JVM: no Python workers, no merge logic. Any
    shuffle+write job — the minimum the CDC apply must do — scales no
    better than this on this host; it isolates how much of the engine's
    efficiency gap is the box's shuffle/write path vs the engine itself."""
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        f"ctl-shuf-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{shm}/ctl-shuf-{cpus}"} if shm else None,
    )
    out = tempfile.mkdtemp(prefix=f"ctl-shuf-{cpus}-", dir=shm)
    try:
        # warmup
        synth_events(spark, 500_000, 5_000, seed=7).repartition(
            64, "conv_id"
        ).write.mode("overwrite").parquet(f"{out}/warm")
        t0 = time.monotonic()
        (
            synth_events(spark, n_rows, n_rows // 100, seed=42, hot_frac=0.05)
            .repartition(64, "conv_id")
            .write.mode("overwrite")
            .parquet(f"{out}/data")
        )
        dt = time.monotonic() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {"cpus": cpus, "n_rows": n_rows, "elapsed_sec": round(dt, 3),
             "rows_per_sec": round(n_rows / dt, 1)}
        )
    )


def fleet_child(
    cpus: int, ev_dir: str, table_dir: str, routed: bool = False
) -> None:
    """One emulated executor: replay the pre-partitioned event shard in
    ``ev_dir`` (4 contiguous-seq segments) into a table shard — a flat
    64-bucket table, or (``routed``) the production ``months(ts) x
    8-bucket`` partition router (the shard's events carry a typed
    conversation-derived ``ts``, written by the routed prep)."""
    import time

    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create
    from cdm_to_mods_spark.sources.synth import synth_events
    from cdm_to_mods_spark.replay import replay_in_batches
    from cdm_to_mods_spark.session import get_spark

    spark = get_spark(
        f"fleet-{os.path.basename(table_dir)}",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{table_dir}-local"},
    )
    part_by = "month" if routed else None
    # warmup (untimed): the same table shape the timed region uses; the
    # routed warmup pays two applies so both the empty-table and the
    # steady-state fused plan shapes compile (see router_child)
    warm_ev = synth_events(spark, 5_000, 100, seed=7)
    if routed:
        from pyspark.sql import functions as F

        warm_ev = warm_ev.drop("ts_raw").withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1735689600)
                + F.pmod(F.xxhash64(F.lit(7), "conv_id", "turn_idx"),
                         F.lit(365 * 86400))
            ),
        )
    warm = replay_in_batches(
        spark, warm_ev, os.path.join(table_dir, "warmup"),
        n_batches=2 if routed else 1, max_seq=5_000,
        num_buckets=8, merge_mode="mor", partition_by=part_by,
    )
    warm.read().count()
    segs = sorted(
        os.path.join(ev_dir, d) for d in os.listdir(ev_dir) if d.startswith("batch-")
    )
    t0 = time.monotonic()
    table = open_or_create(
        spark, os.path.join(table_dir, "t"),
        8 if routed else 64, "mor", partition_by=part_by,
    )
    for b, seg in enumerate(segs):
        table.apply_changes(
            spark.read.parquet(seg), batch_id=b, transform=apply_chain, source=seg
        )
    rows = table.read().count()
    print(json.dumps({"elapsed_sec": round(time.monotonic() - t0, 3), "rows": rows}))


def fleet(k: int, cpus: int, n_events: int, routed: bool = False) -> None:
    """K emulated executors over hash(conv_id)-partitioned shards of the
    same input; compare against one executor on the full input.
    ``routed``: each executor replays its shard through the production
    ``months(ts) x bucket`` partition router instead of a flat table —
    ts derives from the conversation (the transcripts workload's shape),
    so sharding by conv_id keeps every conversation's partitions wholly
    on its owning executor, the work distribution of a real cluster's
    (partition, bucket)-hashed write tasks."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="fleet-", dir=shm)
    # Partition the input by hash(conv_id) % k (untimed prep): the shard a
    # conversation lands on is exactly the executor that owns its buckets.
    prep = get_spark("fleet-prep", master=f"local[{os.cpu_count()}]",
                     extra_conf={"spark.local.dir": f"{base}/prep-local"})
    events = synth_events(prep, n_events, max(1_000, n_events // 100),
                          seed=42, hot_frac=0.05)
    if routed:
        events = events.drop("ts_raw").withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1735689600)  # 2025-01-01 UTC
                + F.pmod(F.xxhash64(F.lit(7), "conv_id", "turn_idx"),
                         F.lit(365 * 86400))
            ),
        )
    per = (n_events + 3) // 4
    shard = F.pmod(F.xxhash64("conv_id"), F.lit(k))
    seg_id = F.floor(F.col("seq") / F.lit(per)).cast("int")
    (
        events.withColumn("_shard", shard)
        .withColumn("_seg", seg_id)
        .write.partitionBy("_shard", "_seg")
        .mode("overwrite")
        .parquet(f"{base}/ev")
    )
    for s in range(k):
        os.makedirs(f"{base}/shard-{s}", exist_ok=True)
        for b in range(4):
            src = f"{base}/ev/_shard={s}/_seg={b}"
            os.symlink(src, f"{base}/shard-{s}/batch-{b:05d}")
    prep.stop()

    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--fleet-child",
             str(cpus), f"{base}/shard-{s}", f"{base}/tab-{s}"]
            + (["routed"] if routed else []),
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
        )
        for s in range(k)
    ]
    outs = [json.loads(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
    wall = time.monotonic() - t0
    total_rows = sum(o["rows"] for o in outs)
    agg_eps = n_events / max(o["elapsed_sec"] for o in outs)
    print(
        json.dumps(
            {
                "k": k,
                "cpus_per_proc": cpus,
                "n_events": n_events,
                "wall_sec_incl_startup": round(wall, 2),
                "max_child_elapsed_sec": max(o["elapsed_sec"] for o in outs),
                "child_elapsed_sec": [o["elapsed_sec"] for o in outs],
                "total_rows": total_rows,
                "aggregate_events_per_sec": round(agg_eps, 1),
            }
        )
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def run_level(cpus: int, n_events: int, n_batches: int = 4,
              mode: str = "--child") -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), mode, str(cpus),
         str(n_events), str(n_batches)],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        child(
            int(sys.argv[2]),
            int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else 4,
        )
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--router-child":
        router_child(
            int(sys.argv[2]),
            int(sys.argv[3]),
            int(sys.argv[4]) if len(sys.argv) > 4 else 2,
        )
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--control":
        control(int(sys.argv[2]), int(sys.argv[3]))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--control-shuffle":
        control_shuffle(int(sys.argv[2]), int(sys.argv[3]))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--fleet":
        fleet(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--fleet-router":
        fleet(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              routed=True)
        return
    if len(sys.argv) >= 2 and sys.argv[1] == "--fleet-child":
        fleet_child(
            int(sys.argv[2]), sys.argv[3], sys.argv[4],
            routed=len(sys.argv) > 5 and sys.argv[5] == "routed",
        )
        return

    args = [a for a in sys.argv[1:] if a != "--router"]
    router = "--router" in sys.argv[1:]
    n_events = int(args[0]) if len(args) > 0 else 2_000_000
    lo_c = int(args[1]) if len(args) > 2 else 8
    hi_c = int(args[2]) if len(args) > 2 else 32
    n_batches = int(args[3]) if len(args) > 3 else (2 if router else 4)
    mode = "--router-child" if router else "--child"
    lo = run_level(lo_c, n_events, n_batches, mode=mode)
    hi = run_level(hi_c, n_events, n_batches, mode=mode)
    ratio = hi_c / lo_c
    eff = hi["events_per_sec"] / (ratio * lo["events_per_sec"])
    job = (
        f"ROUTED CDC replay (months(ts) x 8-bucket partition router, "
        f"conversation-derived ts, {n_batches} batches, merge-on-read, "
        "stage-first fused apply)"
        if router
        else f"CDC replay (synth binlog, hot_frac=0.05, {n_batches} "
             "micro-batches, 64 buckets, merge-on-read)"
    )
    result = {
        "job": job,
        "n_events": n_events,
        f"local{lo_c}": lo,
        f"local{hi_c}": hi,
        f"scaling_efficiency_{lo_c}_to_{hi_c}": round(eff, 3),
        "final_rows_match": lo["final_rows"] == hi["final_rows"],
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
