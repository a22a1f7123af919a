"""Policy-driven table maintenance: one call that reads the table's
health signals and runs exactly the maintenance the thresholds say is
due — the Delta ``OPTIMIZE`` scheduler / Iceberg maintenance-procedures
analog (reference analog: post_cdm_cleanup.py's fixed post-run cleanup
pass, generalized into a threshold policy an operator can cron).

Decisions are driver-side over manifest/footer statistics (the same
O(referenced files) cost class as ``describe_detail`` — never a data
scan), so ``maintain()`` is cheap to call often:

* **delta-chain fold** — merge-on-read read amplification grows with the
  longest per-bucket delta chain; past ``max_delta_chain`` a ``compact()``
  folds every chained bucket back to one base.
* **small-file bin-packing** — streaming tails and tiny batches leave
  many sub-row-group files; when the mean rows/file of populated buckets
  drops below ``min_rows_per_file`` (and there is more than one file to
  merge), the same ``compact()`` rewrite bin-packs them.
* **snapshot expiry** — ``expire_keep_last`` bounds time travel and ledger
  size (off by default: expiry destroys change-feed history, so retention
  is an explicit operator choice — SnapshotExpiredError documents the
  consumer contract).
* **skew advice** — a hot bucket (``max_bucket_row_share`` above
  threshold) is REPORTED, never auto-fixed: ``rebucket()`` rewrites the
  whole table, which an operator schedules deliberately, and true hot-KEY
  skew needs salting at the query site, not a layout change.

Concurrency: same maintenance-owner assumption as ``expire_snapshots`` —
don't run against an in-flight writer. ``compact`` commits through the
normal optimistic path, so a racing append surfaces as the usual
conflict, never corruption.
"""

from __future__ import annotations

from .lake import LakeTable

__all__ = ["maintain"]


def maintain(
    table: LakeTable,
    *,
    max_delta_chain: int = 8,
    min_rows_per_file: int = 10_000,
    expire_keep_last: int | None = None,
    skew_share_threshold: float = 0.30,
    cluster_by=None,
    purge_tombstones_before_seq: int | None = None,
    ttl_col: str | None = None,
    ttl_older_than=None,
    ttl_mode: str = "rewrite",
    dry_run: bool = False,
) -> dict:
    """Run threshold-due maintenance on ``table``; return what ran and why.

    Returns ``{"detail": <pre-maintenance signals>, "actions": [..],
    "recommendations": [..]}`` — each action is ``{"action", "reason",
    "result"}``. ``dry_run=True`` reports what WOULD run without touching
    the table. ``cluster_by`` passes through to the compaction rewrite
    (sort-order maintenance piggybacks on the fold).

    ``ttl_col``/``ttl_older_than`` is the row-retention policy (the
    Paimon ``record-level.expire`` / Bigtable TTL role): rows whose
    ``ttl_col`` is strictly below the bound are deleted through the
    ordinary ``delete_where`` path — tombstones + change-feed D rows, so
    downstream consumers observe the expiry like any delete. Runs BEFORE
    the compaction decision so the fold reclaims the expired rows in the
    same pass. ``ttl_mode="tombstone"`` makes it O(matches) logical
    deletion (physical purge at the next compact); default ``"rewrite"``
    reclaims space immediately. On a flat hash-bucketed table every
    bucket holds all ages, so TTL costs O(matching buckets) — at
    retention scale prefer a PartitionedTable, where ``drop_partition``
    is the O(1) form of the same policy."""
    actions: list[dict] = []
    if (ttl_col is None) != (ttl_older_than is None):
        raise ValueError("ttl_col and ttl_older_than must be set together")
    if ttl_col is not None:
        from pyspark.sql import functions as F

        dtype = table.schema()[ttl_col].dataType
        bound = F.lit(ttl_older_than).cast(dtype)
        # an unparsable bound casts to NULL under non-ANSI Spark, which
        # would make the retention predicate never-true — a compliance
        # policy that silently stops expiring; under ANSI the same cast
        # throws mid-delete. Validate eagerly either way (one local row,
        # no table scan) and surface one typed error.
        try:
            probe = table.spark.range(1).select(bound.alias("b")).first()["b"]
        except Exception as exc:
            # under ANSI the unparsable cast throws — that IS the parse
            # failure this probe exists to catch. Anything else (stopped
            # session, Py4J failure) must propagate: swallowing it would
            # tell the operator their perfectly valid bound "does not
            # parse" and send them debugging the wrong thing.
            if "CAST" not in str(exc).upper():
                raise
            probe = None
        if probe is None:
            raise ValueError(
                f"ttl_older_than {ttl_older_than!r} does not parse as "
                f"{dtype.simpleString()} — fix the bound (the policy "
                "would otherwise expire nothing or fail mid-delete)"
            )
        pred = F.col(ttl_col) < bound
        reason = f"retention: {ttl_col} < {ttl_older_than!r}"
        if dry_run:
            n = table.read().filter(pred).count()
            actions.append({"action": "ttl_delete", "reason": reason,
                            "result": None, "would_delete_rows": n})
        else:
            actions.append({
                "action": "ttl_delete",
                "reason": reason,
                "result": table.delete_where(pred, mode=ttl_mode,
                                             note="maintain:ttl"),
            })
    d = table.describe_detail()
    recs: list[dict] = []

    chain_due = d["max_delta_chain"] >= max_delta_chain
    total_rows = d["base_rows"] + d["delta_rows"]
    floor = min_rows_per_file
    if table.target_file_rows is not None:
        # a capped table's files can never exceed target rows each, so a
        # mean-rows-per-file trigger against any floor >= target would
        # re-fire after every compact whenever a bucket's rows are not an
        # exact multiple of the cap (2,2,2,1 from 7 rows means mean 1.75
        # forever) — an endless full-table rewrite loop. Compare the file
        # COUNT against the tightest achievable capped layout instead:
        # at most one rounding file per populated bucket above the global
        # ceil(rows/target).
        import math

        min_achievable = d["populated_buckets"] + math.ceil(
            total_rows / table.target_file_rows
        )
        smallfile_due = (
            d["populated_buckets"] > 0 and d["num_files"] > min_achievable
        )
        smallfile_reason = (
            f"{d['num_files']} files > achievable "
            f"{min_achievable} at target_file_rows="
            f"{table.target_file_rows}"
        )
    else:
        # mean rows/file over populated buckets; guard num_files >
        # populated buckets so a naturally-small table (one tight file
        # per bucket) never triggers an endless rewrite loop
        smallfile_due = (
            d["num_files"] > d["populated_buckets"] > 0
            and total_rows / d["num_files"] < floor
        )
        smallfile_reason = (
            f"mean rows/file "
            f"{round(total_rows / d['num_files']) if d['num_files'] else 0} "
            f"< {floor} over {d['num_files']} files"
        )
    compact_reasons = []
    if chain_due:
        compact_reasons.append(
            f"max_delta_chain {d['max_delta_chain']} >= {max_delta_chain}"
        )
    if smallfile_due:
        compact_reasons.append(smallfile_reason)
    if purge_tombstones_before_seq is not None:
        # operator-supplied retention floor (a seq the source's binlog can
        # no longer emit under — never inferable from table state, so this
        # is a passthrough, not a threshold): fold it into the compaction
        # pass below rather than scheduling a second full rewrite
        compact_reasons.append(
            f"tombstone purge below seq {purge_tombstones_before_seq}"
        )
    if compact_reasons:
        # plain compact() folds only delta-bearing buckets — a small-file
        # state with NO deltas (multi-file bases) needs the every-bucket
        # rewrite, which compact only does under cluster_by; default to the
        # key order (same layout compact would have written)
        eff_cluster = cluster_by
        if smallfile_due and d["delta_rows"] == 0 and eff_cluster is None:
            eff_cluster = list(table.key_cols)
        actions.append(
            {
                "action": "compact",
                "reason": "; ".join(compact_reasons),
                "result": None
                if dry_run
                else table.compact(
                    version_note="maintain", cluster_by=eff_cluster,
                    purge_tombstones_before_seq=purge_tombstones_before_seq,
                ),
            }
        )

    if expire_keep_last is not None:
        actions.append(
            {
                "action": "expire_snapshots",
                "reason": f"retention keep_last={expire_keep_last}",
                "result": None
                if dry_run
                else table.expire_snapshots(keep_last=expire_keep_last),
            }
        )

    if d["max_bucket_row_share"] > skew_share_threshold and d["populated_buckets"] > 1:
        recs.append(
            {
                "recommendation": "rebucket_or_salt",
                "reason": (
                    f"largest bucket holds {d['max_bucket_row_share']:.0%} of rows "
                    f"(> {skew_share_threshold:.0%}) across "
                    f"{d['populated_buckets']} populated buckets — if one KEY "
                    "dominates, salt at the query site; if the key space "
                    f"outgrew {d['num_buckets']} buckets, schedule "
                    "table.rebucket(<larger n>)"
                ),
            }
        )

    return {"detail": d, "actions": actions, "recommendations": recs, "dry_run": dry_run}
