"""Table integrity audit (``fsck`` for the lake format).

The reference pipeline ends every run with a verification pass —
source-vs-output count reconciliation and schema validation
(post_cdm_cleanup.py:15-37, convert_cdm_to_mods.py:376-397). At lake
scale the things worth auditing are the STRUCTURAL invariants the engine
relies on for correctness, because each one failing is a *silent* wrong
answer, not an error:

- every manifest file ref resolves on disk (a lost file = silently
  missing rows on the next read);
- every stored row sits in the bucket its key hashes to (a mis-bucketed
  row is invisible to ``read_keys``/MERGE pruning — exactly the
  corruption class the round-2 ``bucket_fn``-dropping retry bug caused);
- no key is live in two buckets at once (the other symptom of a bucket
  split: duplicate rows out of a pure-base read);
- recorded zone-map stats actually bound their file set's data (a stats
  lie makes ``read_range`` skip a bucket that held matching rows);
- CHECK constraints hold over the live state (the inline apply gate can
  be bypassed by pre-constraint data or a buggy maintenance rewrite);
- the ledger's cross-version invariants hold (``schemas`` append-only,
  ``last_batch_id`` non-decreasing — the exactly-once and
  schema-resolution planes both assume them).

Scale shape: THREE distributed jobs total, regardless of table size —
(1) one column-pruned scan of all stored rows aggregated per file-set
directory (bucket placement + zone-map bounds together), (2) one
scan + two hash aggregations for cross-bucket key uniqueness, (3) one
live read per constraint batch — plus O(file sets + retained versions)
driver-side metadata IO. Nothing per-row crosses the driver.

Repair: a bucket-placement failure (wrong ``bucket_fn``/``num_buckets``
adopted at some point) is healed by ``rebucket(num_buckets)`` — it
rewrites every row under the manifest's CURRENT function, which also
collapses split keys through the ordinary last-write-wins resolution
(pinned in ``tests/test_fsck.py``). Lost files and stats lies have no
in-place repair — restore the file set from a snapshot/clone, or
``compact()`` to re-derive stats from surviving data.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..schemas import DELETED_COL, SEQ_COL, schema_from_json
from .lake import _bucket_expr, _stat_scalar, _stored_name


def _scan_stored(table, man, stats_cols):
    """One DataFrame over every stored row of ``man``'s snapshot with:
    the key columns (canonical name/type), ``_seq``/``_deleted``, the
    stats columns (null where a schema version predates them), the
    claimed bucket id (from the file path — bucket dirs are
    ``_bucket=N``) and the file-set directory. Grouped by schema_id like
    ``LakeTable._read_raw`` so the plan holds O(#schema-versions) scans."""
    canon = table._canonical_schema(man)
    by_schema: dict[int, list[str]] = {}
    for e in man["buckets"].values():
        for fs in table._bucket_files(e):
            p = fs["path"]
            ap = p if os.path.isabs(p) else os.path.join(table.path, p)
            if os.path.exists(ap):  # lost refs are check 1's finding;
                by_schema.setdefault(fs["schema_id"], []).append(ap)
            # the scan audits what's actually readable
    if not by_schema:
        return None
    keyset = list(dict.fromkeys([table.bucket_col, *table.key_cols]))
    want = keyset + [c for c in stats_cols if c not in keyset]
    parts = []
    for sid, paths in by_schema.items():
        stored = set(schema_from_json(man["schemas"][sid]).fieldNames())
        cols = []
        for name in want:
            sname = _stored_name(man, sid, name)
            ftype = canon[name].dataType
            if sname in stored:
                cols.append(F.col(sname).cast(ftype).alias(name))
            else:
                cols.append(F.lit(None).cast(ftype).alias(name))
        cols += [
            F.col(SEQ_COL),
            F.col(DELETED_COL),
            F.regexp_extract(
                F.col("_metadata.file_path"), r"_bucket=([0-9]+)/", 1
            ).cast("int").alias("_claimed_bucket"),
            F.regexp_extract(
                F.col("_metadata.file_path"), r"^(?:file:)?(.*_bucket=[0-9]+)/", 1
            ).alias("_fileset_dir"),
        ]
        parts.append(table.spark.read.parquet(*paths).select(cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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

    # ---- 1. manifest refs resolve on disk (driver-side, O(file sets))
    missing = []
    filesets = []  # (abs_dir, stats_dict)
    for e in man["buckets"].values():
        for fs in table._bucket_files(e):
            p = fs["path"]
            ap = p if os.path.isabs(p) else os.path.join(table.path, p)
            if not os.path.exists(ap):
                missing.append(p)
            else:
                filesets.append((ap.rstrip("/"), fs.get("stats") or {}))
    checks["manifest_refs"] = {
        "ok": not missing, "file_sets": len(filesets) + len(missing),
        "missing": missing,
    }

    stats_cols = sorted({c for _, st in filesets for c in st})
    scan = _scan_stored(table, man, stats_cols) if filesets else None
    if scan is None:
        checks["bucket_assignment"] = {"ok": True, "misplaced_rows": 0}
        checks["unique_live_keys"] = {"ok": True, "split_keys": 0}
        checks["zone_maps"] = {"ok": True, "violations": []}
    else:
        # ---- 2+4. ONE scan, ONE aggregation per file-set dir: bucket
        # placement mismatches and actual stats-column bounds together
        mismatch = (
            F.col("_claimed_bucket")
            != _bucket_expr(table.bucket_col, nb, fn)
        ).cast("long")
        aggs = [F.sum(mismatch).alias("_misplaced")]
        for c in stats_cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        per_dir = {
            r["_fileset_dir"]: r
            for r in scan.groupBy("_fileset_dir").agg(*aggs).collect()
        }
        misplaced = sum(r["_misplaced"] or 0 for r in per_dir.values())
        checks["bucket_assignment"] = {
            "ok": misplaced == 0, "misplaced_rows": int(misplaced),
            "file_set_dirs": sorted(
                d for d, r in per_dir.items() if r["_misplaced"]
            ),
        }
        zviol = []
        for ap, st in filesets:
            row = per_dir.get(ap)
            for col, bounds in st.items():
                if row is None or bounds is None:
                    continue
                # recorded stats are already _stat_scalar-normalized
                # (timestamps = UTC epoch floats); bring the measured
                # bounds into the same space before comparing
                mn, mx = bounds
                amn = _stat_scalar(row[f"_mn_{col}"])
                amx = _stat_scalar(row[f"_mx_{col}"])
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

    # ---- 6. ledger invariants across retained versions (driver-side)
    issues = []
    prev_bid = None
    prev_schemas: list | None = None
    latest_schemas = man["schemas"]
    for v in table._versions():
        raw = table._load_version(v)
        bid = raw.get("last_batch_id", -1)
        if prev_bid is not None and bid < prev_bid:
            issues.append(f"v{v}: last_batch_id regressed {prev_bid}->{bid}")
        prev_bid = bid
        sch = raw.get("schemas", [])
        if prev_schemas is not None and sch[: len(prev_schemas)] != prev_schemas:
            issues.append(f"v{v}: schemas list is not append-only")
        prev_schemas = sch
        if sch != latest_schemas[: len(sch)]:
            issues.append(f"v{v}: schemas diverge from the latest manifest's")
    checks["ledger"] = {"ok": not issues, "issues": issues}

    return {
        "ok": all(c["ok"] for c in checks.values()),
        "version": man["version"],
        "checks": checks,
    }
