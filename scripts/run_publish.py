"""Outbound CDC publisher entrypoint: lake table → Debezium-envelope bus.

Tails a LakeTable's change feed with the native ``lake_cdf`` streaming
source and lands it as Debezium JSON lines via Spark's exactly-once text
file sink (``_spark_metadata`` manifest) — the outbox/connector job a
downstream consumer (another cluster's ``run_replay.py --format debezium``,
a Kafka loader, …) reads.

Usage (local smoke):

    python scripts/run_publish.py --table /lake/transcripts \
        --out /data/bus/transcripts --checkpoint /lake/_ckpt/publish

On a real cluster::

    spark-submit --py-files engine.zip scripts/run_publish.py \
        --table /lake/transcripts --out /data/bus/transcripts \
        --checkpoint /lake/_ckpt/publish --continuous

Resumable: rerun with the same --checkpoint and only versions committed
since the last run are published (no duplicate envelopes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--table", required=True, help="source lake table path")
    ap.add_argument("--out", required=True, help="bus directory for envelope JSON lines")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--table-name", default="transcripts",
                    help="source.table value stamped on every envelope")
    ap.add_argument("--db", default="cdm",
                    help="source.db value stamped on every envelope")
    ap.add_argument("--max-versions-per-trigger", type=int, default=None,
                    help="cap ledger versions per micro-batch (bounded "
                         "backfill of a long-retained source)")
    ap.add_argument("--continuous", action="store_true",
                    help="keep tailing (default: drain to head and exit)")
    args = ap.parse_args()

    from cdm_to_mods_spark.session import get_spark
    from cdm_to_mods_spark.streaming.source import publish_stream

    spark = get_spark("cdc-publish")
    q = publish_stream(
        spark,
        args.table,
        args.out,
        args.checkpoint,
        table_name=args.table_name,
        db=args.db,
        available_now=not args.continuous,
        max_versions_per_trigger=args.max_versions_per_trigger,
    )
    if args.continuous:
        q.awaitTermination()
        return
    if not q.awaitTermination(600):
        # still publishing: a partial count reported as success would tell
        # the operator the bus is complete when it is not
        q.stop()
        print(
            json.dumps({"error": "publish did not drain within 600s; "
                        "progress is checkpointed — re-run to resume"}),
            file=sys.stderr,
        )
        sys.exit(1)
    n = spark.read.format("text").load(args.out).count()
    print(json.dumps({"published_envelopes_visible": n, "out": args.out}))


if __name__ == "__main__":
    main()
