"""Table integrity audit (``fsck`` for the lake format).

The reference pipeline ends every run with a verification pass —
source-vs-output count reconciliation and schema validation
(post_cdm_cleanup.py:15-37, convert_cdm_to_mods.py:376-397). At lake
scale the things worth auditing are the STRUCTURAL invariants the engine
relies on for correctness, because each one failing is a *silent* wrong
answer, not an error:

- every manifest file ref resolves on disk AND holds the row count the
  manifest recorded for it (a lost file-set dir or a lost part-file
  inside one = silently missing rows on the next read);
- every stored row sits in the bucket its key hashes to (a mis-bucketed
  row is invisible to ``read_keys``/MERGE pruning — exactly the
  corruption class the round-2 ``bucket_fn``-dropping retry bug caused);
- no key is live in two buckets at once (the other symptom of a bucket
  split: duplicate rows out of a pure-base read);
- recorded zone-map stats actually bound their file set's data (a stats
  lie makes ``read_range`` skip a bucket that held matching rows);
- CHECK constraints hold over the live state (the inline apply gate can
  be bypassed by pre-constraint data or a buggy maintenance rewrite);
- the ledger's cross-version invariants hold (``schemas`` append-only
  and a prefix of the head's, ``last_batch_id`` non-decreasing except
  across a ``rollback`` commit, which reverts it by design — the
  exactly-once and schema-resolution planes both assume these).

Scale shape: THREE distributed jobs total, regardless of table size —
(1) one column-pruned scan of all stored rows aggregated per file-set
directory (row counts + bucket placement + zone-map bounds together),
(2) one scan + two hash aggregations for cross-bucket key uniqueness,
(3) one live read for all constraints at once — plus O(file sets +
retained versions) driver-side metadata IO. Nothing per-row crosses the
driver. The scan is ``LakeTable._read_raw`` itself (``file_meta=True``),
so schema evolution/rename resolution stays in ONE place and Catalyst
prunes the unused payload columns out of the parquet read.

Repair: a bucket-placement failure (wrong ``bucket_fn``/``num_buckets``
adopted at some point) is healed by ``rebucket(num_buckets)`` — it
rewrites every row under the manifest's CURRENT function, which also
collapses split keys through the ordinary last-write-wins resolution
(pinned in ``tests/test_fsck.py``). Lost files and stats lies have no
in-place repair — restore the file set from a snapshot/clone, or
``compact()`` to re-derive stats from surviving data.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import functions as F

from ..schemas import DELETED_COL, SEQ_COL
from .lake import _bucket_expr, _stat_scalar


def _current_name(man: dict, sid: int, name: str) -> str | None:
    """Map a column name as recorded at schema ``sid`` (e.g. a zone-map
    stats key) FORWARD through renames committed after ``sid`` to its
    canonical name today — the inverse walk of ``_stored_name``. Returns
    None when the column no longer exists (dropped): its recorded stats
    are unverifiable and the audit skips them, mirroring
    ``_range_buckets``'s leniency for unknown stats keys."""
    for r in man.get("renames", []):
        if r["at"] > sid and r["old"] == name:
            name = r["new"]
    return name


def _collected_scalar(v):
    """Like ``_stat_scalar`` but for values collected off a DataFrame:
    ``collect()`` materializes TimestampType as a NAIVE datetime in the
    DRIVER PROCESS's local timezone (``TimestampType.fromInternal`` —
    note: the driver tz, not ``spark.sql.session.timeZone``), while
    recorded zone-map stats are true UTC epochs. Attach the driver-local
    zone before comparing, or every bound is off by the UTC offset
    whenever the driver doesn't run in UTC (the same class of skew
    ``read_range`` defends against on the session-tz side)."""
    if isinstance(v, _dt.datetime) and v.tzinfo is None:
        v = v.astimezone()  # interpret as driver-local wall time
    return _stat_scalar(v)


def verify_integrity(table, version: int | None = None) -> dict:
    """Audit the snapshot at ``version`` (default head) and return
    ``{"ok": bool, "version": v, "checks": {...}}`` — each check carries
    its own ``ok`` plus enough detail to locate the damage. Read-only;
    run it from a main-opened handle."""
    assert table.branch == "main", "audit a main-opened table"
    man = table.manifest(version)
    # judge the snapshot against ITS OWN recorded layout — a historical
    # audit across a rebucket must not apply the head's bucket count
    nb = man.get("num_buckets", table.num_buckets)
    fn = man.get("bucket_fn", table.bucket_fn)
    checks: dict = {}

    # ---- 1. manifest refs resolve on disk (driver-side, O(file sets));
    # per-file-set dir info feeds the row-count and zone-map comparisons
    missing = []
    filesets = []  # (abs_dir, recorded_rows | None, {canonical_col: bounds})
    for e in man["buckets"].values():
        for fs in table._bucket_files(e):
            p = fs["path"]
            ap = p if os.path.isabs(p) else os.path.join(table.path, p)
            if not os.path.exists(ap):
                missing.append(p)
                continue
            stats = {}
            for col, bounds in (fs.get("stats") or {}).items():
                cur = _current_name(man, fs["schema_id"], col)
                canon = table._canonical_schema(man)
                if cur is not None and cur in canon.fieldNames():
                    stats[cur] = bounds
            filesets.append((ap.rstrip("/"), fs.get("rows"), stats))
    checks["manifest_refs"] = {
        "ok": not missing, "file_sets": len(filesets) + len(missing),
        "missing": missing,
    }

    stats_cols = sorted({c for _, _, st in filesets for c in st})
    scan = (
        table._read_raw(man, file_meta=True, skip_missing=True)
        if filesets else None
    )
    if scan is None:
        checks["row_counts"] = {"ok": True, "mismatches": []}
        checks["bucket_assignment"] = {"ok": True, "misplaced_rows": 0}
        checks["unique_live_keys"] = {"ok": True, "split_keys": 0}
        checks["zone_maps"] = {"ok": True, "violations": []}
    else:
        # ---- 1b+2+4. ONE scan, ONE aggregation per file-set dir: actual
        # row counts, bucket placement mismatches and stats-column bounds
        mismatch = (
            F.col("_claimed_bucket")
            != _bucket_expr(table.bucket_col, nb, fn)
        ).cast("long")
        aggs = [
            F.count(F.lit(1)).alias("_rows"),
            F.sum(mismatch).alias("_misplaced"),
        ]
        for c in stats_cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        per_dir = {
            r["_fileset_dir"]: r
            for r in scan.groupBy("_fileset_dir").agg(*aggs).collect()
        }
        cmis = []
        for ap, recorded, _st in filesets:
            if recorded is None:
                continue  # legacy entry without a count: unverifiable
            actual = per_dir[ap]["_rows"] if ap in per_dir else 0
            if actual != recorded:
                cmis.append({"path": os.path.relpath(ap, table.path),
                             "recorded": recorded, "actual": int(actual)})
        checks["row_counts"] = {"ok": not cmis, "mismatches": cmis}
        misplaced = sum(r["_misplaced"] or 0 for r in per_dir.values())
        checks["bucket_assignment"] = {
            "ok": misplaced == 0, "misplaced_rows": int(misplaced),
            "file_set_dirs": sorted(
                d for d, r in per_dir.items() if r["_misplaced"]
            ),
        }
        zviol = []
        for ap, _rows, st in filesets:
            row = per_dir.get(ap)
            for col, bounds in st.items():
                if row is None or bounds is None:
                    continue
                # recorded stats are already _stat_scalar-normalized
                # (timestamps = UTC epoch floats); bring the measured
                # bounds into the same space before comparing
                mn, mx = bounds
                amn = _collected_scalar(row[f"_mn_{col}"])
                amx = _collected_scalar(row[f"_mx_{col}"])
                if amn is None or amx is None:
                    continue  # all-null/NaN file set: bounds vacuously hold
                if (mn is not None and amn < mn) or (mx is not None and amx > mx):
                    zviol.append(
                        {"path": os.path.relpath(ap, table.path), "col": col,
                         "recorded": [str(mn), str(mx)],
                         "actual": [str(amn), str(amx)]}
                    )
        checks["zone_maps"] = {"ok": not zviol, "violations": zviol}

        # ---- 3. no key live in two buckets (second scan, two hash aggs):
        # resolve last-write-wins WITHIN each claimed bucket (the same
        # seq-then-op ranking as the read path), keep live winners, then
        # count buckets per key. A healthy table yields exactly one.
        keys = list(table.key_cols)
        rank = F.when(F.col(DELETED_COL), 0).otherwise(1)
        live = (
            scan.groupBy("_claimed_bucket", *keys)
            .agg(
                F.max_by(
                    F.col(DELETED_COL), F.struct(F.col(SEQ_COL), rank)
                ).alias("_del")
            )
            .filter(~F.col("_del"))
        )
        split = (
            live.groupBy(*keys)
            .agg(F.countDistinct("_claimed_bucket").alias("_nb"))
            .filter(F.col("_nb") > 1)
        )
        n_split = split.count()
        checks["unique_live_keys"] = {"ok": n_split == 0,
                                      "split_keys": int(n_split)}

    # ---- 5. CHECK constraints over the live state (one read, one pass)
    cons = man.get("constraints", [])
    cviol: dict[str, int] = {}
    if cons:
        live_df = table.read(version)
        aggs = [
            F.sum(
                (~F.coalesce(F.expr(c["expr"]).cast("boolean"), F.lit(True)))
                .cast("long")
            ).alias(c["name"])
            for c in cons
        ]
        row = live_df.agg(*aggs).collect()[0]
        cviol = {c["name"]: int(row[c["name"]] or 0) for c in cons}
    checks["constraints"] = {
        "ok": all(v == 0 for v in cviol.values()), "violations": cviol,
    }

    # ---- 6. ledger invariants across retained versions (driver-side).
    # Baselines come from the HEAD manifest — an audit pinned to an old
    # version must not flag evolution that happened after it. The same
    # pass audits the FEED plane: every retained version's cdf refs must
    # resolve, because compaction folds the BUCKET refs to those files
    # away while ``changes()`` discovery still reads the cdf lists — a
    # lost feed file is invisible to the head-manifest checks above but
    # breaks every exactly-once consumer tailing that range.
    issues = []
    feed_missing = []
    prev_bid = None
    prev_schemas: list | None = None
    head_schemas = table.manifest()["schemas"]
    for v in table._versions():
        raw = table._load_version(v)
        for fs in raw.get("cdf", []):
            p = fs["path"]
            ap = p if os.path.isabs(p) else os.path.join(table.path, p)
            if not os.path.exists(ap):
                feed_missing.append(f"v{v}: {p}")
        is_rollback = (raw.get("metrics") or {}).get("maintenance") == "rollback"
        bid = raw.get("last_batch_id", -1)
        if prev_bid is not None and bid < prev_bid and not is_rollback:
            # rollback REVERTS last_batch_id by design (so undone batches
            # can replay); any other decrease breaks exactly-once
            issues.append(f"v{v}: last_batch_id regressed {prev_bid}->{bid}")
        prev_bid = bid
        sch = raw.get("schemas", [])
        if prev_schemas is not None and len(sch) < len(prev_schemas):
            issues.append(f"v{v}: schemas list shrank")
        prev_schemas = sch
        if sch != head_schemas[: len(sch)]:
            issues.append(f"v{v}: schemas diverge from the head manifest's")
    checks["ledger"] = {"ok": not issues, "issues": issues}
    checks["change_feed"] = {"ok": not feed_missing, "missing": feed_missing}

    return {
        "ok": all(c["ok"] for c in checks.values()),
        "version": man["version"],
        "checks": checks,
    }
