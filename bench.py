"""Round bench — headline CDC replay throughput + representative queries.

Runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "cdc": {"n_events": N, "events_per_sec": R, ...}}

The headline job is the engine's reason to exist (BASELINE.json:2): replay a
deterministic synthetic change log (insert/update/delete binlog over
multi-turn transcripts, hot-key skewed) through dedup → vectorized transform
chain → bucketed MERGE into the snapshot-ledgered lake table, as contiguous
micro-batches. Event count scales with sf so the per-round numbers are
comparable across rounds. The representative query set covers each SURVEY.md
§2 family (scan/join/agg/window/setop/scalar + training-data ops) at sf.

``--scaling`` mode (see tools/scaling_bench.py) re-runs the same replay at
two parallelism levels for the N→4N efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative per-family queries (full inventory runs in the driver's
# correctness harness; bench keeps one per family so the timing signal is
# readable round over round).
BENCH_QUERIES = [
    "s1_scan_pushdown",
    "j1_broadcast_dim_join",
    "j6_full_outer_reconcile",
    "j9_asof_join",
    "a6r_recursive_rollup",
    "a7_last_write_wins",
    "a8_sessionize",
    "w4_positional_index",
    "o6_topk_per_group",
    "f7_ts_canonicalize_roundtrip",
    "f8_dictionary_remap",
    "d1_exact_dedup",
    "d3_minhash_lsh_pairs",
    # d5 (exact all-pairs cosine) is deliberately NOT benched: it is the
    # O(n^2) correctness baseline; e3 is the scale path.
    "e1_knn_bruteforce",
    "e3_ann_ivf",
    "m2_media_metadata",
    "t2_quality_score",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_cdc_replay(spark, sf: float, n_batches: int = 4) -> dict:
    """Headline: synth event log scaled to sf, replayed through the engine.

    Timed region includes the final-state read (``table.read().count()``)
    so merge-on-read pays for its deferred merge inside the measurement.
    Both merge modes run; ``mor`` (O(batch) per commit) is the headline.
    """
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create, replay_in_batches
    from cdm_to_mods_spark.sources.synth import synth_events, write_event_batches

    n_events = max(100_000, int(20_000_000 * sf))  # sf0.1 → 2M events
    n_convs = max(1_000, n_events // 100)
    # tmpfs: the single virtual disk serializes shuffle/table I/O and adds
    # ±25% wall noise (same policy as tools/scaling_bench.py).
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table_dir = tempfile.mkdtemp(prefix="bench-cdc-", dir=shm)
    try:
        # Materialize binlog segments outside the timed region (the job
        # under measurement is the CDC apply, and segments arriving from
        # storage is the realistic shape). Segment file count = core count:
        # these single-row-group files are the scan's split granularity, so
        # fewer files than cores caps the apply's map stage below the
        # available parallelism (8-file segments measured ~1.5x slower
        # end-to-end at local[32]).
        seg_paths = write_event_batches(
            spark,
            os.path.join(table_dir, "events"),
            n_events,
            n_convs,
            n_batches=n_batches,
            files_per_batch=spark.sparkContext.defaultParallelism,
            seed=42,
            hot_frac=0.05,
        )
        # Warm the JVM (codegen JIT, Arrow runtime, shuffle services) on a
        # small throwaway replay so the timed region measures steady-state
        # throughput, not first-job initialization. The warmup runs the
        # SAME configuration as the measurement (64 buckets, both merge
        # modes, 2 batches) — a mismatched warmup leaves the measured
        # path's codegen cold (first 64-bucket batch measured ~1.7x its
        # steady state with the old 8-bucket single-batch warmup).
        for mode in ("mor", "cow"):
            replay_in_batches(
                spark,
                synth_events(spark, 500_000, 5_000, seed=7),
                os.path.join(table_dir, f"warmup-{mode}"),
                n_batches=1,
                max_seq=500_000,
                num_buckets=64,
                merge_mode=mode,
            ).read().count()

        out: dict = {"n_events": n_events, "n_batches": n_batches}
        finals = {}
        for mode in ("mor", "cow"):
            t0 = time.monotonic()
            table = open_or_create(
                spark,
                os.path.join(table_dir, f"transcripts-{mode}"),
                64,
                mode,
            )
            for b, seg in enumerate(seg_paths):
                table.apply_changes(
                    spark.read.parquet(seg),
                    batch_id=b,
                    transform=apply_chain,
                    source=seg,
                )
            finals[mode] = table.read().count()
            elapsed = time.monotonic() - t0
            out[mode] = {
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n_events / elapsed, 1),
            }
        out["final_rows"] = finals["mor"]
        out["modes_agree"] = finals["mor"] == finals["cow"]
        # Best-of-2 on the headline mode: host-phase contention on this
        # shared-bus VM whipsaws replay wall 2x between runs minutes apart
        # (load-average >20 with zero local processes — BASELINE.md
        # "Sandbox measurement rules"); min-of-two is the reproducible
        # engine number the round-over-round comparison needs.
        t0 = time.monotonic()
        table = open_or_create(
            spark, os.path.join(table_dir, "transcripts-mor2"), 64, "mor"
        )
        for b, seg in enumerate(seg_paths):
            table.apply_changes(
                spark.read.parquet(seg), batch_id=b,
                transform=apply_chain, source=seg,
            )
        table.read().count()
        elapsed = time.monotonic() - t0
        # both attempts recorded (best + spread): a single recorded number
        # made round-over-round drift unfalsifiable against the host's
        # documented ±25% variance
        out["mor_attempts_sec"] = sorted(
            [out["mor"]["elapsed_sec"], round(elapsed, 3)]
        )
        if elapsed < out["mor"]["elapsed_sec"]:
            out["mor"] = {
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n_events / elapsed, 1),
            }
        out["elapsed_sec"] = out["mor"]["elapsed_sec"]
        out["events_per_sec"] = out["mor"]["events_per_sec"]
        return out
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)


def run_debezium_ingest(spark, sf: float) -> dict:
    """Bus-ingest path: Debezium envelope JSON lines → parse_debezium →
    the same bucketed MERGE. Reported beside the parquet-binlog headline
    (NOT folded into the suite total) so the connector's parse tax —
    text-line scan + from_json + envelope field access — is a visible
    round-over-round number; at 100 TB the delta is the argument for
    landing the bus as parquet segments before deep replays
    (sources/debezium.py docstring)."""
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create
    from cdm_to_mods_spark.sources.debezium import read_debezium, to_debezium
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-dz-", dir=shm)
    try:
        n = max(50_000, int(5_000_000 * sf))  # sf0.1 → 500k envelopes
        bus = os.path.join(work, "bus")
        # materialize the landed bus outside the timed region (the job
        # under measurement is ingest, not fixture generation)
        to_debezium(
            synth_events(spark, n, max(500, n // 100), seed=11)
        ).write.mode("overwrite").text(bus)
        best, rows = None, None
        for attempt in range(2):  # best-of-2: same host-whipsaw policy
            t0 = time.monotonic()
            t = open_or_create(
                spark, os.path.join(work, f"transcripts-{attempt}"), 64, "mor"
            )
            t.apply_changes(
                read_debezium(spark, bus),
                batch_id=0,
                transform=apply_chain,
                source=bus,
            )
            rows = t.read().count()
            elapsed = time.monotonic() - t0
            best = elapsed if best is None else min(best, elapsed)
        return {
            "n_events": n,
            "final_rows": rows,
            "elapsed_sec": round(best, 3),
            "events_per_sec": round(n / best, 1),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_wide_batch(spark, sf: float) -> dict:
    """Wide-batch replay: same engine, 4x the events in half the batches
    (sf0.1 → 8M events, 2 batches of 4M). The micro-batch replay keeps the
    r1/r2-comparable shape; THIS is the backfill shape a 10^10-event
    replay actually runs in — per-batch fixed costs (job scheduling, Arrow
    worker spin-up, commit) amortize over 8x more rows per batch, which is
    where the engine's steady-state throughput lives (see BASELINE.md
    batch-size amortization table). Runs LAST in main(): an 8M-event
    replay's heap/GC churn measurably inflates queries timed after it
    (untouched suite queries ran 3-4x slower when this preceded them)."""
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create
    from cdm_to_mods_spark.sources.synth import write_event_batches

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table_dir = tempfile.mkdtemp(prefix="bench-wide-", dir=shm)
    try:
        wide_events = max(400_000, int(80_000_000 * sf))
        wide_segs = write_event_batches(
            spark,
            os.path.join(table_dir, "events-wide"),
            wide_events,
            max(1_000, wide_events // 100),
            n_batches=2,
            files_per_batch=spark.sparkContext.defaultParallelism,
            seed=42,
            hot_frac=0.05,
        )
        attempts, wide_rows = [], None
        for attempt in range(2):  # best-of-2: same host-whipsaw policy
            t0 = time.monotonic()
            wt = open_or_create(
                spark,
                os.path.join(table_dir, f"transcripts-wide{attempt}"),
                64,
                "mor",
            )
            for b, seg in enumerate(wide_segs):
                wt.apply_changes(
                    spark.read.parquet(seg), batch_id=b,
                    transform=apply_chain, source=seg,
                )
            wide_rows = wt.read().count()
            attempts.append(round(time.monotonic() - t0, 3))
        best = min(attempts)
        return {
            "n_events": wide_events,
            "n_batches": 2,
            "final_rows": wide_rows,
            "elapsed_sec": best,
            "attempts_sec": sorted(attempts),
            "events_per_sec": round(wide_events / best, 1),
        }
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)


def run_sink_ingest(spark, sf: float) -> dict:
    """Native datasource sink vs library apply, same input: the SAME
    pre-transformed change batches land once through
    ``df.write.format("lake")`` (executor-side Arrow bucket routing +
    metadata-only fast-append — the Paimon append/dedicated-compaction
    topology; raw chains resolve at read) and once through
    ``apply_changes`` without a transform (shuffle + in-batch collapse at
    write). Both arms are timed INCLUDING the final-state read, so the
    sink pays its deferred merge inside the measurement — the honest
    comparison of write-cheap/read-deferred vs write-resolved."""
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.replay import open_or_create
    from cdm_to_mods_spark.sources.lake_batch import register_lake
    from cdm_to_mods_spark.sources.synth import write_event_batches

    register_lake(spark)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-sink-", dir=shm)
    try:
        n = max(100_000, int(10_000_000 * sf))  # sf0.1 → 1M events
        raw_segs = write_event_batches(
            spark,
            os.path.join(work, "events"),
            n,
            max(1_000, n // 100),
            n_batches=2,
            files_per_batch=spark.sparkContext.defaultParallelism,
            seed=23,
            hot_frac=0.05,
        )
        # the sink takes CANONICAL change events (no transform hook — by
        # contract, sources/lake_sink.py); transform both arms' input once,
        # outside the timed region, so the arms measure the WRITE PATHS
        segs = []
        for i, seg in enumerate(raw_segs):
            dst = os.path.join(work, f"canon-{i}")
            apply_chain(spark.read.parquet(seg)).write.parquet(dst)
            segs.append(dst)

        out: dict = {"n_events": n, "n_batches": len(segs)}
        finals = {}
        # three arms: "sink" = unaligned upstream (each of P tasks writes a
        # file per bucket it sees — P×buckets small files per batch, the
        # worst shape); "sink_aligned" = upstream pre-partitioned on the
        # bucket key (Spark's HashPartitioning IS the table's hash32
        # layout, so tasks align to buckets — ONE file per bucket, the
        # shape the sink docstring prescribes); "apply" = library MERGE.
        for arm in ("sink", "sink_aligned", "apply"):
            best = None
            for attempt in range(2):  # best-of-2: host-whipsaw policy
                path = os.path.join(work, f"t-{arm}{attempt}")
                t0 = time.monotonic()
                table = open_or_create(spark, path, 64, "mor")
                # the chain adds provenance columns (ingest_ts); the sink
                # refuses implicit evolution by contract, so declare them
                # with DDL up front — same final schema on every arm
                canon = {f.name for f in table.read().schema.fields}
                for f in spark.read.parquet(segs[0]).schema.fields:
                    if f.name not in canon and f.name not in ("op", "seq"):
                        table.add_column(f.name, f.dataType)
                for b, seg in enumerate(segs):
                    df = spark.read.parquet(seg)
                    if arm == "apply":
                        table.apply_changes(df, batch_id=b, source=seg)
                        continue
                    if arm == "sink_aligned":
                        df = df.repartition(64, "conv_id")
                    df.write.format("lake").mode("append").option(
                        "batchId", b
                    ).save(path)
                finals[arm] = table.read().count()
                elapsed = time.monotonic() - t0
                best = elapsed if best is None else min(best, elapsed)
            out[arm] = {
                "elapsed_sec": round(best, 3),
                "events_per_sec": round(n / best, 1),
            }
        out["modes_agree"] = len(set(finals.values())) == 1
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_changelog_replay(spark, sf: float) -> dict:
    """Lookup-changelog tax: the identical replay with ``changelog="off"``
    vs ``changelog="lookup"`` (typed pre/post-image production — one
    bucket-pruned old-state join + one O(batch) changelog write per
    commit), interleaved best-of-2 per arm. Reported beside the headline
    (NOT in the suite wall) so the producer's documented cost is a
    visible round-over-round number — the judge of whether "pay in the
    writer, save every consumer a recompute" holds at this engine's
    constants. The on-arm also refreshes a retraction-maintained
    AdditiveStatsView per batch (the consumer the changelog exists for),
    reported separately."""
    from cdm_to_mods_spark.functions.chain import apply_chain
    from cdm_to_mods_spark.plans.incremental import AdditiveStatsView
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import write_event_batches

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-cl-", dir=shm)
    try:
        n = max(50_000, int(5_000_000 * sf))  # sf0.1 → 500k events
        segs = write_event_batches(
            spark, os.path.join(work, "ev"), n, max(500, n // 100),
            n_batches=2,
            files_per_batch=spark.sparkContext.defaultParallelism,
            seed=13, hot_frac=0.05,
        )
        walls = {"off": None, "lookup": None}
        seed_sec = None
        retract_sec = None
        for attempt in range(2):
            for mode in ("off", "lookup"):  # interleaved arms
                t0 = time.monotonic()
                t = LakeTable(
                    spark, os.path.join(work, f"t-{mode}{attempt}"),
                    num_buckets=64, merge_mode="mor",
                    changelog="none" if mode == "off" else "lookup",
                )
                t.create(TRANSCRIPT_SCHEMA)
                # the view rides ALONG the replay (created before the loop,
                # refreshed per batch) so the timed refreshes past the seed
                # exercise the RETRACT fold — a view created after the
                # replay would time one full build + one no-op instead
                view = (
                    AdditiveStatsView(
                        spark, t, os.path.join(work, f"v-{attempt}")
                    )
                    if mode == "lookup"
                    else None
                )
                vs_seed, vs_retract = 0.0, 0.0
                for b, seg in enumerate(segs):
                    t.apply_changes(
                        spark.read.parquet(seg), batch_id=b,
                        transform=apply_chain, source=seg,
                    )
                    if view is not None:
                        v0 = time.monotonic()
                        r = view.refresh()
                        dv = time.monotonic() - v0
                        if r.get("strategy") == "retract":
                            vs_retract += dv
                        else:
                            vs_seed += dv
                t.read().count()
                w = time.monotonic() - t0
                if view is not None:
                    w -= vs_seed + vs_retract  # arm wall stays replay-only
                    seed_sec = (
                        vs_seed if seed_sec is None else min(seed_sec, vs_seed)
                    )
                    retract_sec = (
                        vs_retract if retract_sec is None
                        else min(retract_sec, vs_retract)
                    )
                walls[mode] = w if walls[mode] is None else min(walls[mode], w)
        return {
            "n_events": n,
            "off_sec": round(walls["off"], 3),
            "lookup_sec": round(walls["lookup"], 3),
            "producer_overhead_pct": round(
                100 * (walls["lookup"] - walls["off"]) / walls["off"], 1
            ),
            "events_per_sec_lookup": round(n / walls["lookup"], 1),
            "view_seed_sec": round(seed_sec, 3),
            "view_retract_refresh_sec": round(retract_sec, 3),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_delete_modes(spark, sf: float) -> dict:
    """Compliance-delete cost, rewrite vs tombstone: the same ~per-mille
    predicate delete (matches spread across every bucket — the worst case
    for the rewrite, and the 100 TB-representative one: a uniform key hash
    puts any non-trivial match set in ALL buckets) timed in both modes on
    identically-built MoR tables, interleaved best-of-2. Only the
    ``delete_where`` call is timed; the build is shared shape. Reported
    beside the headline (not in the suite wall) — the number that says
    whether the O(matches) tombstone path actually beats the O(touched
    buckets) rewrite at this engine's constants."""
    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import write_event_batches

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-del-", dir=shm)
    try:
        n = max(50_000, int(5_000_000 * sf))  # sf0.1 → 500k events
        segs = write_event_batches(
            spark, os.path.join(work, "ev"), n, max(500, n // 100),
            n_batches=2,
            files_per_batch=spark.sparkContext.defaultParallelism,
            seed=29, hot_frac=0.05,
        )
        pred = "pmod(xxhash64(conv_id, turn_idx), 512) = 7"  # ~2 per mille
        walls = {"rewrite": None, "tombstone": None}
        deleted = None
        for attempt in range(2):
            for mode in ("rewrite", "tombstone"):
                t = LakeTable(
                    spark, os.path.join(work, f"t-{mode}{attempt}"),
                    num_buckets=64, merge_mode="mor",
                )
                t.create(TRANSCRIPT_SCHEMA)
                for b, seg in enumerate(segs):
                    t.apply_changes(
                        spark.read.parquet(seg), batch_id=b, source=seg
                    )
                t0 = time.monotonic()
                res = t.delete_where(pred, mode=mode)
                w = time.monotonic() - t0
                walls[mode] = w if walls[mode] is None else min(walls[mode], w)
                deleted = res["deleted_rows"]
        return {
            "n_events": n,
            "deleted_rows": deleted,
            "rewrite_sec": round(walls["rewrite"], 3),
            "tombstone_sec": round(walls["tombstone"], 3),
            "tombstone_speedup": round(
                walls["rewrite"] / walls["tombstone"], 2
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_partition_prune(spark, sf: float) -> dict:
    """Mid-history range-read cost, flat vs time-partitioned — the workload
    the composite spec exists for (plans/partitioned.py). Same event stream
    (uniform ts over 12 months) replayed into a flat 64-bucket MoR table and
    a month-partitioned table (8 buckets/partition), both compacted so every
    flat base spans the full year (the zone-map-defeating shape read_range's
    docstring documents); then ONE month mid-year is range-read from each,
    best-of-2 interleaved, forcing full row materialization (hash-sum of all
    columns — a bare count() would satisfy itself from metadata). Reports
    the replay walls too: the router's per-batch tax (partition discovery +
    per-partition applies) is the price of the prune."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-part-", dir=shm)
    try:
        n = max(50_000, int(2_500_000 * sf))  # sf0.1 → 250k events
        ev = (
            synth_events(spark, n, max(500, n // 100), seed=31)
            .drop("ts_raw")
            # ts derives from the KEY, not the event: every version of a
            # row keeps its month, so the router's (partition, key)
            # identity equals the flat table's and the two arms hold the
            # same live rows — a per-event random ts would fan one key's
            # updates across months and the scan comparison would read
            # different logical volumes
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
        seg = os.path.join(work, "ev")
        ev.repartition(spark.sparkContext.defaultParallelism).write.parquet(seg)
        half = n // 2

        # Warm BOTH plan shapes (flat single-shuffle apply AND the fused
        # multi-partition apply) on throwaway tables — same rationale as
        # run_cdc_replay's warmup: the first run of a plan shape pays the
        # whole-stage-codegen compile lottery, which would be attributed
        # to whichever arm runs first (the fused shape measured 1.57x in
        # a cold lane vs ~1.3x steady on identical inputs).
        warm = spark.read.parquet(seg).limit(25_000)
        for name, tbl in (
            ("wflat", LakeTable(spark, os.path.join(work, "wflat"),
                                num_buckets=64, merge_mode="mor")),
            ("wpart", PartitionedTable(spark, os.path.join(work, "wpart"),
                                       num_buckets=8, merge_mode="mor")),
        ):
            tbl.create(TRANSCRIPT_SCHEMA)
            tbl.apply_changes(warm, batch_id=0)

        # interleaved best-of-2 replays, fresh tables per attempt (round 5
        # — the single-shot tax whipsawed 1.29-1.57 across same-day runs);
        # the LAST attempt's tables serve the scan/state checks below
        attempt_walls = {"flat_replay": [], "part_replay": []}
        phase_attempts: list[dict] = []
        flat = part = None
        for attempt in range(2):
            flat = LakeTable(spark, os.path.join(work, f"flat{attempt}"),
                             num_buckets=64, merge_mode="mor")
            flat.create(TRANSCRIPT_SCHEMA)
            part = PartitionedTable(spark, os.path.join(work, f"part{attempt}"),
                                    num_buckets=8, merge_mode="mor")
            part.create(TRANSCRIPT_SCHEMA)
            fw = pw = 0.0
            part_phases: dict = {}
            for b, pred in enumerate(
                (F.col("seq") < half, F.col("seq") >= half)
            ):
                batch = spark.read.parquet(seg).filter(pred)
                t0 = time.monotonic()
                flat.apply_changes(batch, batch_id=b)
                fw += time.monotonic() - t0
                t0 = time.monotonic()
                m = part.apply_changes(batch, batch_id=b)
                pw += time.monotonic() - t0
                for k, v in (m.get("phases") or {}).items():
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        part_phases[k] = round(part_phases.get(k, 0.0) + v, 3)
            attempt_walls["flat_replay"].append(round(fw, 3))
            attempt_walls["part_replay"].append(round(pw, 3))
            phase_attempts.append(part_phases)
        walls = {k: min(v) for k, v in attempt_walls.items()}
        part_phases = phase_attempts[
            attempt_walls["part_replay"].index(walls["part_replay"])
        ]
        flat.compact()
        part.compact()
        # exact final-state cross-check (round 4): the routed replay is the
        # PRODUCTION layout for the flagship table — the two arms must
        # converge to identical live rows, not just comparable timings
        # (the key-derived ts makes (partition, key) identity equal flat
        # key identity, so an orderless full-row hash sum compares them)
        def _state_hash(tbl):
            df = tbl.read().select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts"
            )
            # decimal accumulate: exact + orderless (a double sum differs
            # across row orders by float non-associativity)
            return df.select(
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
                .alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).first()

        hf, hp = _state_hash(flat), _state_hash(part)
        state_match = (hf.h == hp.h) and (hf.n == hp.n)

        def _scan(tbl):
            df = tbl.read_range("2025-06-01", "2025-06-30 23:59:59")
            df.select(
                F.sum(F.xxhash64(*df.columns).cast("double"))
            ).collect()

        read = {"flat": None, "part": None}
        for _ in range(2):
            for name, tbl in (("flat", flat), ("part", part)):
                t0 = time.monotonic()
                _scan(tbl)
                w = time.monotonic() - t0
                read[name] = w if read[name] is None else min(read[name], w)
        return {
            "n_events": n,
            "final_rows": int(hp.n),
            "final_state_match": bool(state_match),
            "flat_range_sec": round(read["flat"], 3),
            "part_range_sec": round(read["part"], 3),
            "prune_speedup": round(read["flat"] / read["part"], 2),
            "flat_replay_sec": round(walls["flat_replay"], 3),
            "part_replay_sec": round(walls["part_replay"], 3),
            "flat_replay_attempts_sec": sorted(attempt_walls["flat_replay"]),
            "part_replay_attempts_sec": sorted(attempt_walls["part_replay"]),
            "part_phases": part_phases,
            "routing_tax": round(
                walls["part_replay"] / walls["flat_replay"], 2
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_cross_partition(spark, sf: float) -> dict:
    """Cross-partition-upsert tax and payoff on the time-partitioned spec
    (plans/partitioned.py): the identical month-partitioned replay with the
    global key→partition index OFF vs ON, interleaved best-of-2 with fresh
    tables per attempt. The event stream derives ts from the KEY (no
    movers), so the ON arm pays the index machinery's STEADY-STATE price —
    winner collapse + bucket-pruned index probe + one index MERGE per
    batch — with zero routing benefit, the honest worst case for the tax.
    The payoff side: a point lookup (read_keys over a handful of
    conversations) against a 12-month table, fan-out vs index-pruned,
    interleaved best-of-2. At 10^10 events the tax stays O(batch) per
    commit while the fan-out lookup grows O(partitions) — these constants
    say where the crossover sits. NOTE round 5: BOTH lookup arms now ride
    the FUSED single-scan probe (driver-side bucket ids; the indexed arm
    scans only the homes) — at this sf the fan-out WINS (one scan, zero
    prior jobs, vs the index's probe-collect job + home scan), so
    lookup_speedup < 1 is the HONEST recorded number here. The index's
    lookup edge is structural, not bench-scale: the fan-out opens
    O(partitions x probed buckets) file-set chains (~960 at a 120-month
    table) where the indexed path opens O(homes) (~8) plus a tiny index
    probe; its primary job — cross-partition key identity for movers —
    is priced by the replay arms above, not this lane."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-xp-", dir=shm)
    try:
        n = max(50_000, int(2_500_000 * sf))  # sf0.1 → 250k events
        ev = (
            synth_events(spark, n, max(500, n // 100), seed=47)
            .drop("ts_raw")
            # CONVERSATION-derived ts (round-4 fix): every turn of a
            # conversation lands in the same month — the transcripts
            # workload's shape (a conversation happens inside a bounded
            # window), and the shape under which a conv-keyed point
            # lookup has O(1) homes for the index to find. The previous
            # per-turn hash scattered one conversation across EVERY
            # month, making "homes" = all partitions and the index prune
            # nothing — an anti-shaped benchmark, not a finding. Still
            # key-derived (stable across versions): no movers, so the ON
            # arm prices the pure steady-state tax.
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1735689600)
                    + F.pmod(
                        F.xxhash64(F.lit(7), "conv_id"),
                        F.lit(365 * 86400),
                    )
                ),
            )
        )
        seg = os.path.join(work, "ev")
        ev.repartition(spark.sparkContext.defaultParallelism).write.parquet(seg)
        half = n // 2
        walls = {"off": None, "on": None}
        looks = {"off": None, "on": None}
        for attempt in range(2):
            tables = {}
            for mode in ("off", "on"):  # interleaved arms
                t = PartitionedTable(
                    spark, os.path.join(work, f"t-{mode}{attempt}"),
                    num_buckets=8, merge_mode="mor",
                    cross_partition_upsert=(mode == "on"),
                )
                t.create(TRANSCRIPT_SCHEMA)
                tables[mode] = t
                t0 = time.monotonic()
                for b, pred in enumerate(
                    (F.col("seq") < half, F.col("seq") >= half)
                ):
                    t.apply_changes(
                        spark.read.parquet(seg).filter(pred), batch_id=b
                    )
                t.read().count()
                w = time.monotonic() - t0
                walls[mode] = w if walls[mode] is None else min(walls[mode], w)
            if attempt == 0:
                # probe LIVE conversations: a point lookup of a deleted
                # key legitimately falls back to the full fan-out (the
                # index has no home for it), which is not the workload
                # this lane prices
                probe_keys = [
                    r["conv_id"]
                    for r in tables["off"].read()
                    .select("conv_id").distinct().limit(8).collect()
                ]
            for _ in range(2):
                for mode, t in tables.items():
                    t0 = time.monotonic()
                    t.read_keys(probe_keys).count()
                    w = time.monotonic() - t0
                    looks[mode] = (
                        w if looks[mode] is None else min(looks[mode], w)
                    )
        # steady-state batch (round 4): replay the first half again at
        # bumped seqs — pure updates of existing keys, so the ON arm's
        # index change set is EMPTY and the no-op index MERGE skip
        # (plans/partitioned.py) takes the whole index-commit cost off
        # the batch. This is the 10^10 steady state: key creation is the
        # exception, updates are the rule.
        steady = {}
        live = tables["off"].read().select("conv_id", "turn_idx")
        seg_upd = os.path.join(work, "ev-steady")
        (
            spark.read.parquet(seg)
            .filter(F.col("seq") < half)
            # only LIVE keys: re-upserting a deleted key re-creates it,
            # which IS an index change — steady state means updates of
            # existing rows. Materialized OUTSIDE the timed region so
            # both arms replay the same landed segment.
            .join(live, ["conv_id", "turn_idx"], "left_semi")
            .withColumn("seq", F.col("seq") + F.lit(n))
            .withColumn("op", F.lit("U"))
            .repartition(spark.sparkContext.defaultParallelism)
            .write.parquet(seg_upd)
        )
        upd = spark.read.parquet(seg_upd)
        for mode, t in tables.items():
            t0 = time.monotonic()
            m = t.apply_changes(upd, batch_id=2)
            steady[mode] = time.monotonic() - t0
            if mode == "on":
                idx_skipped = (m.get("index") or {}).get("skipped", False)

        # 36-partition lookup lane (round 4): the crossover region the
        # 12-month lane's docstring claimed — fan-out opens O(partitions)
        # sub-tables while the indexed probe reads the index plus ONLY the
        # key's home partitions. Fresh tables, 3-year ts span, same key
        # count; lookups interleaved best-of-2.
        ev36 = (
            synth_events(spark, n, max(500, n // 100), seed=53)
            .drop("ts_raw")
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1704067200)  # 2024-01-01 UTC
                    + F.pmod(
                        F.xxhash64(F.lit(11), "conv_id"),
                        F.lit(3 * 365 * 86400),
                    )
                ),
            )
        )
        seg36 = os.path.join(work, "ev36")
        ev36.repartition(
            spark.sparkContext.defaultParallelism
        ).write.parquet(seg36)
        t36, looks36 = {}, {"off": None, "on": None}
        for mode in ("off", "on"):
            t = PartitionedTable(
                spark, os.path.join(work, f"w36-{mode}"),
                num_buckets=8, merge_mode="mor",
                cross_partition_upsert=(mode == "on"),
            )
            t.create(TRANSCRIPT_SCHEMA)
            t.apply_changes(spark.read.parquet(seg36), batch_id=0)
            t.read().count()
            t36[mode] = t
        probe36 = [
            r["conv_id"]
            for r in t36["off"].read()
            .select("conv_id").distinct().limit(8).collect()
        ]
        for _ in range(2):
            for mode, t in t36.items():
                t0 = time.monotonic()
                t.read_keys(probe36).count()
                w = time.monotonic() - t0
                looks36[mode] = (
                    w if looks36[mode] is None else min(looks36[mode], w)
                )
        n_parts36 = len(t36["on"].partitions())
        # 120-partition lookup lane (round 5): with BOTH lookup arms on
        # the fused single-scan probe, 12/36 partitions sit BELOW the
        # index's crossover (the fan-out's one job beats probe+scan);
        # this 10-year span is where the fan-out's O(partitions x probed
        # buckets) chain count overtakes it — the measured crossover
        # point the module docstring's scale claim rests on.
        ev120 = (
            synth_events(spark, n, max(500, n // 100), seed=61)
            .drop("ts_raw")
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1577836800)  # 2020-01-01 UTC
                    + F.pmod(
                        F.xxhash64(F.lit(13), "conv_id"),
                        F.lit(10 * 365 * 86400),
                    )
                ),
            )
        )
        seg120 = os.path.join(work, "ev120")
        ev120.repartition(
            spark.sparkContext.defaultParallelism
        ).write.parquet(seg120)
        t120, looks120 = {}, {"off": None, "on": None}
        for mode in ("off", "on"):
            t = PartitionedTable(
                spark, os.path.join(work, f"w120-{mode}"),
                num_buckets=8, merge_mode="mor",
                cross_partition_upsert=(mode == "on"),
            )
            t.create(TRANSCRIPT_SCHEMA)
            t.apply_changes(spark.read.parquet(seg120), batch_id=0)
            t.read().count()
            t120[mode] = t
        probe120 = [
            r["conv_id"]
            for r in t120["off"].read()
            .select("conv_id").distinct().limit(8).collect()
        ]
        for _ in range(2):
            for mode, t in t120.items():
                t0 = time.monotonic()
                t.read_keys(probe120).count()
                w = time.monotonic() - t0
                looks120[mode] = (
                    w if looks120[mode] is None else min(looks120[mode], w)
                )
        n_parts120 = len(t120["on"].partitions())
        return {
            "n_events": n,
            "off_replay_sec": round(walls["off"], 3),
            "on_replay_sec": round(walls["on"], 3),
            "index_tax_pct": round(
                100 * (walls["on"] - walls["off"]) / walls["off"], 1
            ),
            "steady_off_sec": round(steady["off"], 3),
            "steady_on_sec": round(steady["on"], 3),
            "steady_tax_pct": round(
                100 * (steady["on"] - steady["off"]) / steady["off"], 1
            ),
            "steady_index_merge_skipped": bool(idx_skipped),
            "lookup_fanout_sec": round(looks["off"], 3),
            "lookup_indexed_sec": round(looks["on"], 3),
            "lookup_speedup": round(looks["off"] / looks["on"], 2),
            "n_partitions_wide": n_parts36,
            "lookup_fanout_sec_wide": round(looks36["off"], 3),
            "lookup_indexed_sec_wide": round(looks36["on"], 3),
            "lookup_speedup_wide": round(
                looks36["off"] / looks36["on"], 2
            ),
            "n_partitions_xl": n_parts120,
            "lookup_fanout_sec_xl": round(looks120["off"], 3),
            "lookup_indexed_sec_xl": round(looks120["on"], 3),
            "lookup_speedup_xl": round(
                looks120["off"] / looks120["on"], 2
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_zorder_prune(spark, sf: float) -> dict:
    """Multi-dimension data-skipping cost, lexicographic vs z-order
    (operators/zorder.py). One replayed table, zero-copy cloned, each arm
    compacted with the same cluster columns but a different layout; then
    TWO query shapes are measured, because that is the actual trade:

    - ``lead`` — a range on the leading sort column (one month of ts).
      Lexicographic is near-optimal here (tight ts stats); z-order gives
      some of that back by design.
    - ``trail`` — a predicate on the trailing column alone (two turn_idx
      values). Lexicographic admits ~every row group (turn_idx spans its
      full range in each); the z-curve keeps it bounded. This is the
      query z-ordering exists for.

    The deterministic signal is the footer-level row-group admission
    count per (layout, query); timings are best-of-2 interleaved. Row
    groups are kept small (parquet.block.size) so row-group pruning has
    granularity at bench scale — at 100 TB the default 128 MB groups over
    multi-GB buckets give the same groups-per-bucket ratio."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-zorder-", dir=shm)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    try:
        n = max(100_000, int(3_000_000 * sf))  # sf0.1 → 300k events
        ev = (
            synth_events(spark, n, max(500, n // 100), seed=47)
            .drop("ts_raw")
            # ts from the KEY so every version of a row keeps its slot
            # (same rationale as the partition_prune lane)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1735689600)
                    + F.pmod(
                        F.xxhash64(F.lit(9), "conv_id", "turn_idx"),
                        F.lit(365 * 86400),
                    )
                ),
            )
        )
        # 2 buckets + 64 KB groups: enough row groups PER BUCKET (~16 at
        # sf0.01) that the curve has granularity to work with — a z-layout
        # with 2 groups/bucket can only lose (each group spans half of
        # both dims). At 100 TB the same ratio comes free: a 1 GB bucket
        # file holds ~8 default-sized groups and real tables hold many
        # files per bucket.
        base = LakeTable(spark, os.path.join(work, "linear"), num_buckets=2,
                         merge_mode="mor")
        base.create(TRANSCRIPT_SCHEMA)
        base.apply_changes(ev, batch_id=0)
        zt = base.clone(os.path.join(work, "zorder"))
        hconf.set("parquet.block.size", str(64 * 1024))
        base.compact(cluster_by=["ts", "turn_idx"], layout="linear")
        # bits=5 measured best trail-prune here at both 100k and 300k
        # (vs bits=6: 24/73 vs 33/73 admitted at 300k): fewer bits →
        # longer contiguous z-runs for a fixed-bin predicate → fewer row
        # groups touched, at bench row-group granularity
        zt.compact(cluster_by=["ts", "turn_idx"], layout="zorder",
                   zorder_bits=5)

        lo, hi = "2025-06-01", "2025-06-30 23:59:59"
        t_lo = dt_parse(lo)
        t_hi = dt_parse(hi)

        def _rg_stats(tbl):
            """Yield (ts_stats, turn_stats) per row group from parquet
            footers — deterministic, no timing noise."""
            import pyarrow.parquet as pq

            man = tbl.manifest()
            for e in man["buckets"].values():
                for fs in LakeTable._bucket_files(e):
                    d = os.path.join(tbl.path, fs["path"])
                    if not os.path.isdir(d):
                        continue
                    for f in os.listdir(d):
                        if not f.endswith(".parquet"):
                            continue
                        md = pq.ParquetFile(os.path.join(d, f)).metadata
                        names = [md.schema.column(i).name
                                 for i in range(md.num_columns)]
                        i_ts, i_turn = names.index("ts"), names.index("turn_idx")
                        for rg in range(md.num_row_groups):
                            yield (md.row_group(rg).column(i_ts).statistics,
                                   md.row_group(rg).column(i_turn).statistics)

        def _admitted(tbl, query: str) -> tuple[int, int]:
            adm = tot = 0
            for s_ts, s_tn in _rg_stats(tbl):
                tot += 1
                if (s_ts is None or s_tn is None
                        or not s_ts.has_min_max or not s_tn.has_min_max):
                    adm += 1
                    continue
                ts_hit = (s_ts.max.replace(tzinfo=None) >= t_lo
                          and s_ts.min.replace(tzinfo=None) <= t_hi)
                tn_hit = s_tn.max >= 8 and s_tn.min <= 9
                if (ts_hit if query == "lead" else tn_hit):
                    adm += 1
            return adm, tot

        def _scan(tbl, query: str):
            if query == "lead":
                df = tbl.read_range(lo, hi)
            else:
                df = tbl.read().filter(F.col("turn_idx").between(8, 9))
            df.select(
                F.sum(F.xxhash64(*df.columns).cast("double"))
            ).collect()

        walls = {}
        for _ in range(2):
            for query in ("lead", "trail"):
                for name, tbl in (("linear", base), ("zorder", zt)):
                    t0 = time.monotonic()
                    _scan(tbl, query)
                    w = time.monotonic() - t0
                    k = f"{name}_{query}"
                    walls[k] = w if k not in walls else min(walls[k], w)
        out = {"n_events": n}
        ratios = {}
        for query in ("lead", "trail"):
            lin_adm, lin_tot = _admitted(base, query)
            z_adm, z_tot = _admitted(zt, query)
            out[f"linear_{query}_scan_sec"] = round(walls[f"linear_{query}"], 3)
            out[f"zorder_{query}_scan_sec"] = round(walls[f"zorder_{query}"], 3)
            out[f"linear_{query}_rowgroups"] = f"{lin_adm}/{lin_tot}"
            out[f"zorder_{query}_rowgroups"] = f"{z_adm}/{z_tot}"
            ratios[query] = (lin_adm / lin_tot) / max(z_adm / z_tot, 1e-9)
        # headline: trailing-dim prune factor (the query z-order exists
        # for); lead ratio shows what the curve gives back on ts ranges
        out["trail_prune_ratio"] = round(ratios["trail"], 2)
        out["lead_giveback_ratio"] = round(ratios["lead"], 2)
        return out
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)
        shutil.rmtree(work, ignore_errors=True)


def dt_parse(s: str):
    import datetime as _dt

    try:
        return _dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
    except ValueError:
        return _dt.datetime.strptime(s, "%Y-%m-%d")


def run_month_sequential(spark, sf: float) -> dict:
    """The production STEADY STATE the routing-tax discussion keeps
    appealing to, as a recorded number (round 5): events arrive roughly
    in timestamp order, so each micro-batch touches 1-2 monthly
    partitions, and the router's per-batch cost should collapse to the
    flat apply plus small fixed costs — unlike the uniform backfill
    lanes, where every batch touches all 12 partitions by construction.
    2M conversation-derived-ts events split into 12 contiguous-month
    batches (batch b = month b's events), replayed flat vs routed,
    interleaved best-of-2 with fresh tables; reports the per-batch
    touched-partition count actually observed plus the exact final-state
    match."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-seq-", dir=shm)
    try:
        n = max(120_000, int(20_000_000 * sf))  # sf0.1 → 2M events
        ev = (
            synth_events(spark, n, max(500, n // 100), seed=47,
                         hot_frac=0.05)
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
            .withColumn("_m", F.month("ts"))
        )
        seg = os.path.join(work, "ev")
        ev.write.partitionBy("_m").parquet(seg)
        months = sorted(
            int(d.split("=")[1]) for d in os.listdir(seg)
            if d.startswith("_m=")
        )
        # warm both plan shapes (same rationale as the other lanes)
        warm = spark.read.parquet(os.path.join(seg, f"_m={months[0]}"))
        for name, tbl in (
            ("wflat", LakeTable(spark, os.path.join(work, "wflat"),
                                num_buckets=64, merge_mode="mor")),
            ("wpart", PartitionedTable(spark, os.path.join(work, "wpart"),
                                       num_buckets=8, merge_mode="mor")),
        ):
            tbl.create(TRANSCRIPT_SCHEMA)
            tbl.apply_changes(warm.limit(20_000), batch_id=0)
        walls = {"flat": [], "part": []}
        touched: list[int] = []
        flat = part = None
        for attempt in range(2):
            flat = LakeTable(spark, os.path.join(work, f"flat{attempt}"),
                             num_buckets=64, merge_mode="mor")
            flat.create(TRANSCRIPT_SCHEMA)
            part = PartitionedTable(
                spark, os.path.join(work, f"part{attempt}"),
                num_buckets=8, merge_mode="mor",
            )
            part.create(TRANSCRIPT_SCHEMA)
            for name, tbl in (("flat", flat), ("part", part)):
                t0 = time.monotonic()
                for b, m in enumerate(months):
                    mm = tbl.apply_changes(
                        spark.read.parquet(os.path.join(seg, f"_m={m}")),
                        batch_id=b,
                    )
                    if name == "part" and attempt == 0:
                        touched.append(mm.get("n_parts_touched", 0))
                tbl.read().count()
                walls[name].append(round(time.monotonic() - t0, 3))
        out = {
            "n_events": n,
            "n_batches": len(months),
            "flat_sec": min(walls["flat"]),
            "part_sec": min(walls["part"]),
            "flat_attempts_sec": sorted(walls["flat"]),
            "part_attempts_sec": sorted(walls["part"]),
            "parts_touched_per_batch": touched,
            "steady_routing_tax": round(
                min(walls["part"]) / min(walls["flat"]), 2
            ),
        }

        def _h(tbl):
            df = tbl.read().select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts"
            )
            return df.select(
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
                .alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).first()

        hf, hp = _h(flat), _h(part)
        out["final_rows"] = int(hp.n)
        out["final_state_match"] = bool(hf.h == hp.h and hf.n == hp.n)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_wide_batch_partitioned(spark, sf: float) -> dict:
    """The fused router at the WIDE-batch shape (round 4): the same
    8M-event / 2-batch backfill profile as run_wide_batch, replayed into
    the production months(ts) x bucket layout vs a flat table — does the
    single-shuffle fused apply hold its ~1.0-1.3x tax when per-batch
    fixed costs amortize over 4M rows? ts derives from the KEY (12
    monthly partitions, every version of a row keeps its month) so both
    arms hold identical live rows and the lane can assert the exact
    final-state match. transform=None in both arms: the lane isolates
    the routing question; the Arrow date cascade is run_wide_batch's
    measurement."""
    from pyspark.sql import functions as F

    from cdm_to_mods_spark.plans.lake import LakeTable
    from cdm_to_mods_spark.plans.partitioned import PartitionedTable
    from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_to_mods_spark.sources.synth import synth_events

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench-widep-", dir=shm)
    try:
        n = max(400_000, int(80_000_000 * sf))
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
        out = {"n_events": n, "n_batches": 2}
        # Warm BOTH plan shapes on throwaway tables (same rationale as
        # run_partition_prune): without this, whichever arm runs first
        # eats the whole-stage-codegen compile lottery — the round-4
        # recorded 1.89x tax was mostly this ordering artifact (the same
        # lane measured 0.89-1.09 with flat-first-cold or warmed shapes).
        warm = spark.read.parquet(seg).limit(25_000)
        for name, tbl in (
            ("wflat", LakeTable(spark, os.path.join(work, "wflat"),
                                num_buckets=64, merge_mode="mor")),
            ("wpart", PartitionedTable(spark, os.path.join(work, "wpart"),
                                       num_buckets=8, merge_mode="mor")),
        ):
            tbl.create(TRANSCRIPT_SCHEMA)
            tbl.apply_changes(warm, batch_id=0)
        # interleaved best-of-2, fresh tables per attempt: flat, part,
        # flat, part — host-phase drift hits both arms equally
        walls = {"flat": [], "part": []}
        part_phases: list[dict] = []
        flat = part = None
        for attempt in range(2):
            flat = LakeTable(spark, os.path.join(work, f"flat{attempt}"),
                             num_buckets=64, merge_mode="mor")
            flat.create(TRANSCRIPT_SCHEMA)
            part = PartitionedTable(spark, os.path.join(work, f"part{attempt}"),
                                    num_buckets=8, merge_mode="mor")
            part.create(TRANSCRIPT_SCHEMA)
            for name, tbl in (("flat", flat), ("part", part)):
                t0 = time.monotonic()
                phases: dict = {}
                for b, pred in enumerate(
                    (F.col("seq") < half, F.col("seq") >= half)
                ):
                    m = tbl.apply_changes(
                        spark.read.parquet(seg).filter(pred), batch_id=b
                    )
                    for k, v in (m.get("phases") or {}).items():
                        if isinstance(v, (int, float)) and not isinstance(
                            v, bool
                        ):
                            phases[k] = round(phases.get(k, 0.0) + v, 3)
                tbl.read().count()
                walls[name].append(round(time.monotonic() - t0, 3))
                if name == "part":
                    part_phases.append(phases)
        for name in ("flat", "part"):
            el = min(walls[name])
            out[name] = {"elapsed_sec": el,
                         "attempts_sec": sorted(walls[name]),
                         "events_per_sec": round(n / el, 1)}
        # phase attribution for the BEST part attempt: makes an inflated
        # routed arm diagnosable (stage job vs driver-side fixed costs)
        out["part"]["phases"] = part_phases[
            walls["part"].index(out["part"]["elapsed_sec"])
        ]
        out["routing_tax"] = round(
            out["part"]["elapsed_sec"] / out["flat"]["elapsed_sec"], 2
        )

        def _h(tbl):
            df = tbl.read().select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts"
            )
            return df.select(
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
                .alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).first()

        hf, hp = _h(flat), _h(part)
        out["final_rows"] = int(hp.n)
        out["final_state_match"] = bool(hf.h == hp.h and hf.n == hp.n)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_from_dir(sf_dir)

    from cdm_to_mods_spark.session import get_spark

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": f"{shm}/bench-spark-local"} if shm else None,
    )

    import __spark_entry__ as entry

    qs = dict(entry.queries())
    # building blocks whose driver row is a grouped suite still get benched
    # individually (timing signal stays comparable round over round)
    from cdm_to_mods_spark import pipeline as _pipe
    from cdm_to_mods_spark import queries as _qmod

    for name in BENCH_QUERIES:
        if name not in qs:
            qs[name] = getattr(_pipe, name, None) or getattr(_qmod, name)
    timings: dict[str, float] = {}
    total = 0.0

    cdc = run_cdc_replay(spark, sf)
    timings["cdc_replay"] = cdc["elapsed_sec"]
    total += cdc["elapsed_sec"]
    # wide_batch is a NEW r3 workload (4x events in half the batches — the
    # backfill shape); it is reported under "cdc.wide_batch" and the
    # top-level throughput field below, NOT folded into the suite-wall
    # total, so `value`'s composition stays comparable round over round.

    # Untimed warm pass over the benched tables: the first touch of a
    # 100-200MB testdata file pays cold page-cache disk I/O (measured 8s
    # one-off on f7's lineitem scan), which would be attributed to whatever
    # query happens to read that table first. The suite measures compute.
    from pyspark.sql import functions as F

    for tbl in ("lineitem", "events", "documents", "embeddings", "part",
                "orders", "nation", "region"):
        # probe existence first — a read of a missing table would log a
        # task-failure stacktrace into the bench output even when caught
        if not os.path.exists(f"{sf_dir}/{tbl}.parquet"):
            continue
        df = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        # hash every column so the full file is actually read (a bare
        # count() can satisfy itself from footer metadata); sum as double —
        # a long sum of xxhash64 overflows under ANSI mode
        df.select(F.sum(F.xxhash64(*df.columns).cast("double"))).collect()

    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt
        _ = n

    # steady-state pass (round 4): the FIRST run of each query pays the
    # whole-stage-codegen compile lottery (measured 10.6s→1.65s on d3 in
    # round 3); a second same-process run records the steady number so
    # round-over-round comparisons stop conflating JIT with regressions.
    # `value`/`queries` keep the first-run composition for r1-r3
    # comparability; `steady` is the extra signal.
    steady: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        steady[name] = round(time.monotonic() - t0, 3)

    # after the timed suite — see run_wide_batch docstring; the debezium
    # ingest (also replay-class heap churn) runs back here with it
    cdc["debezium_ingest"] = run_debezium_ingest(spark, sf)
    cdc["changelog_replay"] = run_changelog_replay(spark, sf)
    cdc["sink_ingest"] = run_sink_ingest(spark, sf)
    cdc["delete_modes"] = run_delete_modes(spark, sf)
    cdc["partition_prune"] = run_partition_prune(spark, sf)
    cdc["steady_month_batches"] = run_month_sequential(spark, sf)
    cdc["cross_partition"] = run_cross_partition(spark, sf)
    cdc["zorder_prune"] = run_zorder_prune(spark, sf)
    cdc["wide_batch"] = run_wide_batch(spark, sf)
    cdc["wide_batch_partitioned"] = run_wide_batch_partitioned(spark, sf)

    print(
        json.dumps(
            {
                "metric": "cdc_replay_plus_query_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "steady": steady,
                "sf": sf,
                "cdc": cdc,
                "wide_batch_events_per_sec": cdc["wide_batch"]["events_per_sec"],
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
