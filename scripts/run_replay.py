"""Cluster entrypoint — replay a binlog directory into a transcripts table.

Usage (cluster):
    zip -r engine.zip cdm_to_mods_spark
    spark-submit --py-files engine.zip scripts/run_replay.py \
        --events /data/binlog --table /lake/transcripts \
        --checkpoint /lake/_ckpt/transcripts --buckets 4096 --mode mor

Usage (local smoke):
    python scripts/run_replay.py --synth 1000000 --events /tmp/ev \
        --table /tmp/tab --checkpoint /tmp/ck

Multi-table CDC bus (e.g. a landed Debezium topic-set):
    spark-submit --py-files engine.zip scripts/run_replay.py \
        --events /data/bus --format debezium --checkpoint /lake/_ckpt/bus \
        --route transcripts=/lake/transcripts --route tools=/lake/tools

On a real cluster no ``--master`` is passed — spark-submit decides; the
SparkSession factory only fills local-mode defaults when nothing is set.
The streaming tail is resumable: rerun with the same --checkpoint and it
continues from the committed source offsets, with already-applied batches
skipped by the table's exactly-once ledger. A deployment starting from an
existing dataset passes ``--bootstrap <snapshot_dir> --bootstrap-seq N``:
the snapshot bulk-loads first (one shuffle, empty-table CTAS shape) and
the tail then skips events at seq <= N at the parquet scan — overlap
between snapshot and binlog is safe either way (last-write-wins by seq). Per-micro-batch metrics
(events/sec, buckets touched, op mix) append to --metrics as JSON lines;
per-bucket lineage (source offset → snapshot) lives in the table manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True, help="binlog segment directory")
    ap.add_argument("--format",
                    choices=["parquet", "json", "csv", "xlsx", "debezium"],
                    default="parquet", help="event source format (S6 connector; "
                    "debezium = envelope JSON lines, the landed CDC-bus form)")
    ap.add_argument("--table", default=None, help="lake table path")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--metrics", default=None, help="JSONL metrics sink path")
    ap.add_argument("--continuous", action="store_true",
                    help="keep tailing instead of draining the backlog once")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--synth", type=int, default=None,
                    help="local smoke: generate N synthetic events into --events first")
    ap.add_argument("--bootstrap", default=None, metavar="SNAPSHOT_DIR",
                    help="bulk-load this full-state parquet snapshot into an "
                         "empty table before tailing (CDC snapshot+catch-up)")
    ap.add_argument("--bootstrap-seq", type=int, default=None,
                    help="binlog seq the snapshot is consistent with; the tail "
                         "skips events at seq <= this at the parquet scan")
    ap.add_argument("--branch", default="main",
                    help="stage the tail on a WAP branch (publish_branch "
                         "to fast-forward main after audit)")
    ap.add_argument("--compact-deltas", type=int, default=8,
                    help="delta-chain length that triggers an inline fold "
                         "(minor when the chain is smaller than the base)")
    ap.add_argument("--quarantine", default=None, metavar="DIR",
                    help="dead-letter null-key change rows to this parquet dir "
                         "instead of aborting the replay")
    ap.add_argument("--partition-by", choices=["year", "month", "day"],
                    default=None,
                    help="tail into a time-partitioned table "
                         "(granularity(ts) x bucket(key) composite spec) "
                         "instead of a flat LakeTable")
    ap.add_argument("--maintain-every", type=int, default=None, metavar="N",
                    help="run the threshold-driven maintain() scheduler "
                         "between micro-batches, every N successful applies")
    ap.add_argument("--upsert", action="store_true",
                    help="source rows are snapshot-style (current value per "
                         "key, no op/seq; deletes = tombstone rows) — tail "
                         "them through per-micro-batch MERGE INTO instead of "
                         "the binlog apply")
    ap.add_argument("--order-col", default=None,
                    help="upsert mode: column deciding the in-batch winner "
                         "when a key appears more than once per micro-batch")
    ap.add_argument("--delete-when", default=None, metavar="SQL",
                    help="upsert mode: predicate over s.<col> marking "
                         "tombstone rows, e.g. \"s.text IS NULL\"")
    ap.add_argument("--route", action="append", default=None,
                    metavar="NAME=PATH",
                    help="multi-table WAL fan-out: repeatable mapping from "
                         "the stream's table discriminator (debezium "
                         "source.table, or a 'table' column on "
                         "parquet/json/csv binlogs) to a lake-table path; "
                         "replaces --table")
    ap.add_argument("--route-unknown", choices=["error", "ignore"],
                    default="error",
                    help="events routed to an unconfigured table: fail the "
                         "batch (default) or drop-and-report in metrics")
    args = ap.parse_args()
    if (args.bootstrap is None) != (args.bootstrap_seq is None):
        ap.error("--bootstrap and --bootstrap-seq must be passed together")
    if args.upsert and (args.branch != "main" or args.bootstrap is not None
                        or args.format == "xlsx" or args.synth):
        ap.error("--upsert composes with the plain streaming tail only "
                 "(no --branch/--bootstrap/--synth, streamable formats)")
    if (args.route is None) == (args.table is None):
        ap.error("exactly one of --table or --route must be given")
    if args.route is not None and (
        args.upsert or args.bootstrap is not None or args.branch != "main"
        or args.format == "xlsx" or args.synth
    ):
        ap.error("--route composes with the plain streaming tail only "
                 "(no --upsert/--bootstrap/--branch/--synth, streamable "
                 "formats)")
    if args.partition_by is not None and (
        args.upsert or args.route is not None or args.branch != "main"
        or args.format == "xlsx"
    ):
        ap.error("--partition-by composes with the plain streaming tail "
                 "only (no --upsert/--route/--branch, streamable formats)")

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.streaming.tail import StreamingReplay

    spark = get_spark("cdc-replay")

    if args.synth:
        from cdm_to_mods_spark.sources.synth import write_event_batches

        write_event_batches(
            spark, args.events, args.synth, max(100, args.synth // 100),
            n_batches=4, seed=42,
        )

    if args.bootstrap is not None:
        from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA

        if args.partition_by is not None:
            from cdm_to_mods_spark.plans.partitioned import PartitionedTable

            t = PartitionedTable(
                spark, args.table, granularity=args.partition_by,
                num_buckets=args.buckets, merge_mode=args.mode,
            )
            if not t.exists():
                t.create(TRANSCRIPT_SCHEMA)
            m = t.bootstrap(
                spark.read.parquet(args.bootstrap), args.bootstrap_seq
            )
            print(json.dumps({"bootstrap": {
                "parts": m.get("n_parts_touched"), "seq": args.bootstrap_seq,
            }}), file=sys.stderr)
        else:
            from cdm_to_mods_spark.plans.lake import LakeTable

            t = LakeTable(
                spark, args.table, num_buckets=args.buckets,
                merge_mode=args.mode,
            )
            if not t.exists():
                t.create(TRANSCRIPT_SCHEMA)
            m = t.bootstrap(
                spark.read.parquet(args.bootstrap), args.bootstrap_seq
            )
            print(json.dumps({"bootstrap": {
                "rows": m.get("rows_written"), "seq": m["bootstrap_seq"],
            }}), file=sys.stderr)

    if args.format == "xlsx":
        # xlsx is a batch-only source (binaryFile has no streaming reader —
        # sources/events.py documents the edge-conversion recommendation),
        # so the entrypoint applies the whole workbook directory as ONE
        # batch through the same MERGE. A re-run gets a fresh batch_id and
        # re-applies, but converges to the identical state by seq
        # last-write-wins (pinned by test_replay_same_events_converges);
        # for checkpointed exactly-once, land workbooks as parquet/json/csv
        # and use the streaming tail.
        from cdm_to_mods_spark.functions.chain import apply_chain
        from cdm_to_mods_spark.plans.lake import LakeTable
        from cdm_to_mods_spark.schemas import TRANSCRIPT_SCHEMA
        from cdm_to_mods_spark.sources.events import read_events

        if args.branch != "main":  # WAP fork on first use, like the tail
            main_t = LakeTable(
                spark, args.table, num_buckets=args.buckets,
                merge_mode=args.mode, compact_deltas=args.compact_deltas,
            )
            if not main_t.exists():
                main_t.create(TRANSCRIPT_SCHEMA)
            if args.branch not in {m["name"] for m in main_t.branches()}:
                main_t.create_branch(args.branch)
        t = LakeTable(
            spark, args.table, num_buckets=args.buckets,
            merge_mode=args.mode, branch=args.branch,
            quarantine_path=args.quarantine,
            compact_deltas=args.compact_deltas,
        )
        if not t.exists():
            t.create(TRANSCRIPT_SCHEMA)
        events = read_events(
            spark, args.events, fmt="xlsx", min_seq=args.bootstrap_seq
        )
        m = t.apply_changes(
            events, batch_id=t.manifest()["last_batch_id"] + 1,
            transform=apply_chain, source=f"xlsx:{args.events}",
        )
        man = t.manifest()
        print(json.dumps({
            "snapshot": man["version"],
            "last_batch_id": man["last_batch_id"],
            "metrics": m,
            "rows": t.read().count(),
        }))
        return

    if args.route is not None:
        from cdm_to_mods_spark.streaming.router import MultiTableReplay

        table_paths = {}
        for spec in args.route:
            name, sep, path = spec.partition("=")
            if not sep or not name or not path:
                ap.error(f"--route expects NAME=PATH, got {spec!r}")
            table_paths[name] = path
        mr = MultiTableReplay(
            spark,
            args.events,
            table_paths,
            args.checkpoint,
            num_buckets=args.buckets,
            merge_mode=args.mode,
            metrics_path=args.metrics,
            max_files_per_trigger=args.max_files_per_trigger,
            source_format=args.format,
            unknown_tables=args.route_unknown,
            quarantine_path=args.quarantine,
            compact_deltas=args.compact_deltas,
        )
        if args.continuous:
            mr.start(available_now=False).awaitTermination()
        else:
            tables = mr.run_to_completion()
            print(json.dumps({
                name: {
                    "snapshot": t.manifest()["version"],
                    "last_batch_id": t.manifest()["last_batch_id"],
                    "rows": t.read().count(),
                }
                for name, t in sorted(tables.items())
            }))
        return

    if args.upsert:
        from cdm_to_mods_spark.streaming.upsert import StreamingUpsert

        sr = StreamingUpsert(
            spark,
            args.events,
            args.table,
            args.checkpoint,
            num_buckets=args.buckets,
            merge_mode=args.mode,
            order_col=args.order_col,
            delete_when=args.delete_when,
            metrics_path=args.metrics,
            max_files_per_trigger=args.max_files_per_trigger,
            source_format=args.format,
            quarantine_path=args.quarantine,
            compact_deltas=args.compact_deltas,
        )
    else:
        sr = StreamingReplay(
            spark,
            args.events,
            args.table,
            args.checkpoint,
            num_buckets=args.buckets,
            merge_mode=args.mode,
            metrics_path=args.metrics,
            max_files_per_trigger=args.max_files_per_trigger,
            source_format=args.format,
            min_seq=args.bootstrap_seq,
            quarantine_path=args.quarantine,
            branch=args.branch,
            compact_deltas=args.compact_deltas,
            partition_by=args.partition_by,
            maintain_every=args.maintain_every,
        )
    if args.continuous:
        q = sr.start(available_now=False)
        q.awaitTermination()
    else:
        table = sr.run_to_completion()
        man = table.manifest()
        print(json.dumps({
            "snapshot": man["version"],
            "last_batch_id": man["last_batch_id"],
            "metrics": man["metrics"],
            "rows": table.read().count(),
        }))


if __name__ == "__main__":
    main()
