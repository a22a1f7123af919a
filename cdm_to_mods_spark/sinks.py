"""Terminal export sinks — the packaging stage (S9/S10/S11 analogs).

The reference ends a run by copying outputs into per-extension folders
(post_cdm_cleanup.py:239-253), zipping them per partition
(post_cdm_cleanup.py:256-273) and writing a restriction report
(post_cdm_cleanup.py:186-217). The engine analog: materialize a snapshot
of the lake table partitioned by bucket in a portable format, optionally
archive each partition directory, and emit a filtered report projection.

Archiving is driver-side ``shutil.make_archive`` per partition directory —
a deliberate mirror of the reference's packaging step: the DISTRIBUTED
work (read snapshot, repartition, encode) happens in Spark; the archive
step only walks the already-written O(num_buckets) directories. At 100 TB
you'd hand the written partition dirs to a fleet of packers instead; the
layout (one self-contained dir per bucket) is what makes that possible.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

from .plans.lake import LakeTable, _bucket_expr

EXPORT_FORMATS = ("parquet", "json", "csv")


def export_snapshot(
    table: LakeTable,
    out_dir: str,
    *,
    fmt: str = "parquet",
    archive: bool = False,
    version: int | None = None,
) -> dict:
    """Write the table's live snapshot to ``out_dir``, one directory per
    bucket (``_bucket=N/``), in a portable format; optionally zip each
    bucket directory (the reference's per-partition archive sink)."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"unsupported export format {fmt!r}; one of {EXPORT_FORMATS}")
    df = table.read(version).withColumn(
        "_bucket",
        _bucket_expr(
            table.bucket_col, table.num_buckets, getattr(table, "bucket_fn", "hash32")
        ),
    )
    writer = df.repartition(table.num_buckets, "_bucket").write.partitionBy(
        "_bucket"
    ).mode("overwrite")
    if fmt == "parquet":
        writer.parquet(out_dir)
    elif fmt == "json":
        writer.json(out_dir)
    else:
        writer.option("header", "true").csv(out_dir)

    archives = 0
    if archive:
        for d in sorted(os.listdir(out_dir)):
            full = os.path.join(out_dir, d)
            if d.startswith("_bucket=") and os.path.isdir(full):
                shutil.make_archive(full, "zip", full)
                archives += 1
    n_dirs = sum(
        1
        for d in os.listdir(out_dir)
        if d.startswith("_bucket=") and os.path.isdir(os.path.join(out_dir, d))
    )
    return {"out_dir": out_dir, "format": fmt, "bucket_dirs": n_dirs,
            "archives": archives}


def restriction_report(df: DataFrame, restricted_col: str, *cols: str) -> DataFrame:
    """Filtered projection of restricted records (the restriction-report
    sink, post_cdm_cleanup.py:186-217): rows whose ``restricted_col`` is
    non-empty, projected to the requested columns."""
    from pyspark.sql import types as T

    keep = list(cols) if cols else df.columns
    # compare as STRING: against a non-string column the literal '' would
    # cast to null and null-propagate the predicate false for every row —
    # an always-empty report with no error.
    as_str = F.col(restricted_col).cast("string")
    pred = as_str.isNotNull() & (as_str != "")
    if not isinstance(df.schema[restricted_col].dataType, T.StringType):
        # int/bool restriction FLAGS additionally need their falsy forms
        # excluded: 0 casts to '0' and false to 'false' — non-empty
        # strings, so the null/empty-only filter would list every
        # unrestricted record (the opposite failure). String columns
        # keep the reference's any-non-empty-value-restricts rule (a
        # literal "0" there is a value, not a flag).
        pred = pred & ~F.lower(as_str).isin("0", "false")
    return df.filter(pred).select(*keep)
