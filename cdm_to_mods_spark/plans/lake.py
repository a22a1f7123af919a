"""LakeTable — a snapshot-ledgered, bucketed lake table in pure PySpark.

No Iceberg/Delta jar ships in this environment, so the engine implements the
same contract from scratch on partitioned parquet + an atomic JSON ledger:

* **Snapshot isolation** — every commit writes data files under a new
  ``data/v{N}/`` directory, then atomically renames a manifest into
  ``_ledger/v{N}.json``. Readers resolve the highest committed manifest;
  a crash between data write and manifest rename leaves only unreferenced
  orphan files (never a torn table).
* **Bucketed layout** — rows are hash-bucketed by ``conv_id``
  (``pmod(xxhash64(conv_id), num_buckets)``), the north star's
  "bucket by hash(conv_id) to co-partition change batches with target data
  files". A MERGE only reads and rewrites the buckets its change batch
  touches (bucket-granular copy-on-write); at 100 TB you raise
  ``num_buckets`` so rewrite amplification stays bounded — the manifest is
  O(num_buckets), not O(files-ever-written).
* **MERGE upsert with sequence guard** — insert/update/delete change rows
  merge via union + window-max over ``_seq``, which implements
  ``WHEN MATCHED AND source.seq > target._seq`` uniformly for I/U/D and is
  naturally idempotent under event replay. Deletes persist as tombstones
  (``_deleted``) so a late lower-seq update cannot resurrect a deleted key.
* **Exactly-once batches** — the manifest records ``last_batch_id``; an
  ``apply_changes`` for an already-committed ``batch_id`` is a no-op skip.
  This is the reference's count-reconciliation abort
  (post_cdm_cleanup.py:15-37) turned into a convergence guarantee.
* **Schema evolution** — unseen change-batch columns append as nullable;
  int→long / float→double widening is applied to BOTH sides before the
  merge (old bucket files are cast at read via their recorded schema_id).

The reference analog for the whole class: the per-pointer output directory
tree + IsCountsCorrect reconciliation (convert_cdm_to_mods.py:151-171,
post_cdm_cleanup.py:15-37), made transactional and incremental.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F, types as T

from ..operators.dedup import latest_per_key
from ..schemas import (
    DELETED_COL,
    SEQ_COL,
    evolve_schema,
    schema_from_json,
)

_NON_PAYLOAD_EVENT_COLS = {"op", "seq", "ingest_ts"}


def _bucket_expr(key_col: str, num_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


class LakeTable:
    """A keyed lake table with snapshot ledger + idempotent MERGE."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_col: str = "conv_id",
        num_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_cols = tuple(key_cols)
        self.bucket_col = bucket_col
        self.num_buckets = num_buckets
        self._ledger = os.path.join(self.path, "_ledger")

    # ------------------------------------------------------------- ledger
    def _versions(self) -> list[int]:
        if not os.path.isdir(self._ledger):
            return []
        out = []
        for f in os.listdir(self._ledger):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        with open(os.path.join(self._ledger, f"v{v:08d}.json")) as fh:
            return json.load(fh)

    def _commit(self, manifest: dict) -> None:
        """Atomic commit: full write to a temp name, fsync, rename.

        On HDFS/S3 this maps to the same rename-or-conditional-put commit
        protocol Iceberg/Delta use for their version files; optimistic
        concurrency = the rename fails if the version already exists.
        """
        os.makedirs(self._ledger, exist_ok=True)
        v = manifest["version"]
        final = os.path.join(self._ledger, f"v{v:08d}.json")
        if os.path.exists(final):
            raise RuntimeError(f"concurrent commit conflict on version {v}")
        tmp = os.path.join(self._ledger, f"_tmp-v{v:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, final)

    def exists(self) -> bool:
        return self.latest_version() is not None

    # ------------------------------------------------------------- create
    def create(self, schema: T.StructType) -> None:
        """Initialize an empty table at schema (snapshot v0, no data)."""
        self._commit(
            {
                "version": 0,
                "batch_id": None,
                "last_batch_id": -1,
                "schemas": [schema.json()],
                "buckets": {},
                "num_buckets": self.num_buckets,
                "key_cols": list(self.key_cols),
                "bucket_col": self.bucket_col,
                "lineage": {},
                "metrics": {},
            }
        )

    # --------------------------------------------------------------- read
    def _canonical_schema(self, man: dict) -> T.StructType:
        return schema_from_json(man["schemas"][-1])

    def _empty(self, schema: T.StructType, hidden: bool) -> DataFrame:
        full = T.StructType(
            schema.fields
            + (
                [
                    T.StructField(SEQ_COL, T.LongType(), False),
                    T.StructField(DELETED_COL, T.BooleanType(), False),
                ]
                if hidden
                else []
            )
        )
        return self.spark.createDataFrame([], full)

    def _read_raw(
        self,
        man: dict,
        buckets: list[int] | None = None,
        canon: T.StructType | None = None,
    ) -> DataFrame:
        """Assemble stored rows (incl. tombstones + hidden cols) at the
        canonical schema (``canon`` overrides — used mid-merge when the
        change batch just evolved it), casting old-schema buckets up and
        null-filling newly added columns. Buckets are grouped by recorded
        schema_id so we build O(#schema-versions) DataFrames, not
        O(#buckets)."""
        if canon is None:
            canon = self._canonical_schema(man)
        entries = man["buckets"]
        if buckets is not None:
            entries = {str(b): entries[str(b)] for b in buckets if str(b) in entries}
        if not entries:
            return self._empty(canon, hidden=True)

        by_schema: dict[int, list[str]] = {}
        for e in entries.values():
            by_schema.setdefault(e["schema_id"], []).append(
                os.path.join(self.path, e["path"])
            )
        parts: list[DataFrame] = []
        for sid, paths in by_schema.items():
            stored = schema_from_json(man["schemas"][sid])
            df = self.spark.read.parquet(*paths)
            cols = []
            for f in canon.fields:
                if f.name in stored.fieldNames():
                    cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            cols += [F.col(SEQ_COL), F.col(DELETED_COL)]
            parts.append(df.select(cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """User-visible table state: live rows, canonical schema."""
        man = self.manifest(version)
        raw = self._read_raw(man)
        return raw.filter(~F.col(DELETED_COL)).drop(SEQ_COL, DELETED_COL)

    def schema(self) -> T.StructType:
        return self._canonical_schema(self.manifest())

    # -------------------------------------------------------------- merge
    def apply_changes(
        self,
        events: DataFrame,
        batch_id: int | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        source: str | None = None,
    ) -> dict:
        """MERGE a change batch (op/seq + payload columns) into the table.

        Pipeline per batch (the engine's core loop — SURVEY.md §4):
        scan events → in-batch dedup (window max-seq per key) → vectorized
        transform chain → schema-evolve → union with affected target buckets
        → cross-batch last-write-wins by ``_seq`` → rewrite affected buckets
        → atomic ledger commit (metrics + per-bucket lineage).

        Returns the metrics dict recorded in the manifest. Idempotent:
        re-applying a committed ``batch_id`` is a skip; re-applying the same
        *events* under a new batch_id converges to the same state because
        the merge is a pure max-seq resolution.
        """
        t0 = time.monotonic()
        man = self.manifest()
        if batch_id is not None and batch_id <= man["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id, "reason": "already committed"}

        new_version = man["version"] + 1

        # 0. observe op-mix metrics inline — no separate count job over the
        # raw events (at 10^10 events a metrics-only rescan is real money).
        obs_in = Observation()
        events = events.observe(
            obs_in,
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(F.col("op") == o, 1).otherwise(0)).alias(o)
                for o in ("I", "U", "D")
            ],
        )

        # 1. in-batch dedup: last event per key wins (partial-agg max_by —
        # map-side combine absorbs hot-key skew before the shuffle).
        batch = latest_per_key(events, self.key_cols, "seq")
        # 2. vectorized transform chain (the XSLT-library analog).
        if transform is not None:
            batch = transform(batch)

        # 3. schema evolution: payload schema vs canonical.
        payload_fields = [
            f for f in batch.schema.fields if f.name not in _NON_PAYLOAD_EVENT_COLS
        ]
        canon = self._canonical_schema(man)
        evolved = evolve_schema(canon, T.StructType(payload_fields))
        schemas = list(man["schemas"])
        if evolved.json() != canon.json():
            schemas.append(evolved.json())
        schema_id = len(schemas) - 1
        canon = evolved

        # 4. change rows in target shape (+ bucket).
        is_del = F.col("op") == "D"
        proj = []
        for f in canon.fields:
            if f.name in batch.columns:
                c = F.col(f.name).cast(f.dataType)
                if f.name not in self.key_cols:
                    c = F.when(is_del, F.lit(None).cast(f.dataType)).otherwise(c)
                proj.append(c.alias(f.name))
            else:
                proj.append(F.lit(None).cast(f.dataType).alias(f.name))
        proj.append(F.col("seq").cast("long").alias(SEQ_COL))
        proj.append(is_del.alias(DELETED_COL))
        changes = batch.select(proj).withColumn(
            "_bucket", _bucket_expr(self.bucket_col, self.num_buckets)
        )

        # 5. one job over the (cached) change set yields BOTH the touched
        # buckets (pruning) and per-bucket lineage; the cache is then reused
        # by the merge write so dedup+transform run exactly once per batch.
        changes = changes.persist(StorageLevel.MEMORY_AND_DISK)
        lineage_rows = (
            changes.groupBy("_bucket")
            .agg(
                F.max(SEQ_COL).alias("max_seq"),
                F.min(SEQ_COL).alias("min_seq"),
                F.count(F.lit(1)).alias("n_changes"),
            )
            .collect()
        )
        affected = sorted(r["_bucket"] for r in lineage_rows)
        target = self._read_raw(man, buckets=affected, canon=canon).withColumn(
            "_bucket", _bucket_expr(self.bucket_col, self.num_buckets)
        )

        # 6. cross-batch last-write-wins (the MERGE): max _seq per key,
        # tombstone-preferring tie-break for determinism.
        merged = (
            target.unionByName(changes)
            .transform(
                lambda d: latest_per_key(
                    d.withColumn("op", F.when(F.col(DELETED_COL), "D").otherwise("U")),
                    self.key_cols,
                    SEQ_COL,
                )
            )
            .drop("op")
        )

        # 7. rewrite affected buckets under the new snapshot dir. One file
        # per bucket per shuffle partition; hash-repartition on _bucket so
        # writers are balanced.
        data_rel = f"data/v{new_version:08d}"
        vdir = os.path.join(self.path, data_rel)
        n_written = 0
        if affected:
            obs_out = Observation()
            (
                merged.observe(obs_out, F.count(F.lit(1)).alias("rows"))
                .repartition(max(len(affected), 1), "_bucket")
                .write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(vdir)
            )
            # row count observed during the write job — no read-back scan.
            n_written = int(obs_out.get["rows"])

        # 8. lineage: source offsets (per-bucket max seq + rows) → snapshot.
        lineage = dict(man.get("lineage", {}))
        for r in lineage_rows:
            lineage[str(r["_bucket"])] = {
                "max_seq": r["max_seq"],
                "min_seq_in_batch": r["min_seq"],
                "n_changes": r["n_changes"],
                "snapshot": new_version,
                "source": source,
            }

        observed = obs_in.get
        n_events = int(observed["n"] or 0)
        op_counts = {
            o: int(observed[o]) for o in ("I", "U", "D") if observed[o]
        }
        changes.unpersist(blocking=False)
        elapsed = time.monotonic() - t0
        metrics = {
            "batch_id": batch_id,
            "n_events": n_events,
            "op_counts": op_counts,
            "n_buckets_touched": len(affected),
            "rows_in_touched_buckets": n_written,
            "elapsed_sec": round(elapsed, 3),
            "events_per_sec": round(n_events / elapsed, 1) if elapsed > 0 else None,
        }

        buckets = dict(man["buckets"])
        for b in affected:
            buckets[str(b)] = {"path": f"{data_rel}/_bucket={b}", "schema_id": schema_id}

        self._commit(
            {
                "version": new_version,
                "batch_id": batch_id,
                "last_batch_id": batch_id if batch_id is not None else man["last_batch_id"],
                "schemas": schemas,
                "buckets": buckets,
                "num_buckets": self.num_buckets,
                "key_cols": list(self.key_cols),
                "bucket_col": self.bucket_col,
                "lineage": lineage,
                "metrics": metrics,
            }
        )
        return metrics
