"""``lake`` — native WRITES to a lake table as a Spark data source
(Spark 4 Python Data Source API), batch and streaming:

    from cdm_to_mods_spark.sources.lake_batch import register_lake
    register_lake(spark)
    events.write.format("lake").mode("append").save("/lake/transcripts")
    (event_stream.writeStream.format("lake")
        .option("checkpointLocation", ck).start("/lake/transcripts"))

This is the ``writeStream.format("delta")`` analog: any plain-Spark
producer lands change events on the table WITHOUT importing the library
and WITHOUT ``foreachBatch`` — the sink half of the interoperability face
the batch reader (sources/lake_batch.py) opened. The library path
(``apply_changes`` / ``StreamingReplay``) stays the richer surface:
transform chains, quarantine, CHECK constraints, inline compaction,
changelog production, schema evolution. This sink is the fast append-only
MERGE-ON-READ producer (the Paimon append/dedicated-compaction topology):

* **Input contract** — rows are change events: ``op`` ('I'/'U'/'D'),
  ``seq`` (the source LSN; the engine's per-key last-write-wins token),
  every table key column, plus payload columns. Unknown columns are
  REFUSED (no implicit schema evolution through the sink — evolve with
  DDL or apply_changes); missing payload columns null-fill; types cast up
  to the canonical schema. D rows land as payload-null tombstones,
  exactly like the apply path.
* **Executor write tasks are pure Arrow** — no SparkSession, no per-row
  Python: rows route to their ``pmod(murmur3(key), n)`` bucket with the
  vectorized kernel (functions/hash32.py, parity-pinned against
  ``F.hash``), are sliced per bucket via one argsort, and land as
  bucket-partitioned parquet (TIMESTAMP_MICROS, same zone-map stats the
  apply path records) in a staging dir.
* **Commit is pure metadata** — the driver-side ``commit()`` hardlinks
  each task's staged files into one ``data/sink-*/_bucket=N`` directory
  per bucket and publishes them through
  ``LakeTable.commit_appended_deltas`` (the Iceberg fast-append the
  conflict-retry path already uses): O(batch) data + O(touched buckets)
  metadata per commit, never a table rewrite. Change feed (``changes()``
  / ``lake_cdf``), per-bucket lineage high-water marks, time travel and
  concurrent-writer retry all ride the ordinary manifest commit.
* **Exactly-once (streaming)** — the micro-batch id feeds the table's
  ``last_batch_id`` ledger, the same idempotence token ``StreamingReplay``
  uses: checkpoint redelivery after a crash re-offers the LAST batch and
  the ledger skips it (``batch_id == last_batch_id``). Same
  single-producer + stable-checkpoint contract as the library tail — a
  FRESH query (restarting batch ids at 0) against a table whose ledger is
  further ahead would be silently swallowed, so a streaming commit whose
  batch id is STRICTLY below the ledger fails loudly: resume the original
  checkpoint, or opt into at-least-once re-ingestion with
  ``.option("ignoreLedger", "true")`` (commits without batch ids — pure
  appends, convergent by seq LWW like any replayed change batch). The
  equality case cannot be distinguished from legitimate redelivery, which
  is exactly why the checkpoint must be stable. The batch face keeps the
  plain skip-on-seen semantics: an explicit ``batchId`` IS the caller's
  idempotence token, so re-offering an old one is a no-op by contract.

Task parallelism note: each task writes one file per bucket it SEES, so
an unpartitioned upstream at P tasks writes up to P files per bucket per
batch (they consolidate into ONE manifest delta entry per bucket, so
chain growth is per-batch, not per-file). Pre-partitioning the stream by
the bucket key (``df.repartition(num_buckets, "conv_id")`` — Spark's
HashPartitioning IS the table's hash32 layout) aligns tasks to buckets
and lands exactly one file per bucket.

REFUSED table states (typed errors naming the library path): copy-on-
write semantics don't apply (the sink always appends MoR deltas — read
paths resolve chains regardless of the owner's merge_mode); tables with
CHECK constraints (inline guards ride the Spark apply plan); legacy
``xxhash64`` layouts (no vectorized router); time-partitioned composite
tables (the router owns the global ledger); ``merge_engine`` 'first_row'
and 'aggregate' refuse D events (non-retractable), mirroring the apply
path's inline guards. Tables operated with ``changelog='lookup'`` must
not take sink writes: the sink cannot produce changelog records, so
``row_changes`` over such a range raises ``ChangelogUnavailableError``
(fail-loud, never silent divergence).

Compaction: the sink never folds chains (no Spark at commit). Run
``maintain()`` (plans/maintenance.py) or any library-side apply on a
schedule — the dedicated-compactor topology Paimon documents for
append-heavy producers; ``describe_detail()`` reports the chain debt.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

__all__ = ["LakeSinkWriter", "LakeStreamSinkWriter"]

_OPS = ("I", "U", "D")


@dataclass
class _SinkMessage(WriterCommitMessage):
    # one entry per (bucket, staged file): [bucket, abs_path, rows,
    # min_seq, max_seq, {col: [mn, mx]}]
    files: list = field(default_factory=list)
    op_counts: dict = field(default_factory=dict)


def _plan_ctx(options, input_schema) -> dict:
    """Plan-time validation (runs with file IO, no SparkSession) —
    resolves the target's layout + canonical schema and pins the input →
    stored column mapping. Everything returned is picklable plain data
    (plus pyarrow DataTypes, which pickle)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from ..plans.lake import LakeTable
    from ..schemas import schema_from_json

    path = options.get("path")
    if not path:
        raise ValueError("format('lake') writes require a table path")
    path = os.path.abspath(path.rstrip("/"))
    if os.path.exists(os.path.join(path, "_spec.json")):
        raise ValueError(
            "time-partitioned tables take writes through "
            "PartitionedTable.apply_changes (the router owns the global "
            "ledger); the sink targets flat tables"
        )
    branch = options.get("branch", "main")
    handle = LakeTable(None, path, branch=branch)
    if not handle.exists():
        raise ValueError(
            f"no lake table at {path} — create it first with "
            "LakeTable.create(schema)"
        )
    man = handle.manifest()
    if handle.bucket_fn != "hash32":
        raise ValueError(
            "legacy xxhash64 layout — the sink routes rows with the "
            "vectorized hash32 kernel; rebucket() the table or apply via "
            "apply_changes"
        )
    if man.get("constraints"):
        raise ValueError(
            "table carries CHECK constraints; the sink cannot evaluate "
            "them — apply via apply_changes (inline constraint guards)"
        )
    canon = schema_from_json(man["schemas"][-1])
    canon_names = canon.fieldNames()
    key_type = canon[handle.bucket_col].dataType.simpleString()
    if key_type not in ("string", "int", "bigint", "binary"):
        raise ValueError(
            f"bucket column type {key_type!r} unsupported by the "
            "vectorized router (string/int/bigint/binary)"
        )

    in_names = set(input_schema.fieldNames())
    missing = [k for k in handle.key_cols if k not in in_names]
    if missing:
        raise ValueError(
            f"input is missing key column(s) {missing}; the table key is "
            f"{list(handle.key_cols)}"
        )
    for req in ("op", "seq"):
        if req not in in_names:
            raise ValueError(
                f"input is missing the {req!r} column — the sink takes "
                "CHANGE EVENTS (op 'I'/'U'/'D' + seq LSN + payload); for "
                "op/seq-less snapshot feeds use streaming.upsert"
            )
    unknown = sorted(in_names - set(canon_names) - {"op", "seq"})
    if unknown:
        raise ValueError(
            f"input column(s) {unknown} not in the table schema — the "
            "sink does not evolve schemas; add them with "
            "add_column()/apply_changes first"
        )

    fields = []  # (name, pyarrow type, present_in_input)
    for f in canon.fields:
        fields.append((f.name, to_arrow_type(f.dataType), f.name in in_names))
    # plan-time cast feasibility probe: empty-array casts raise the same
    # incompatibility errors a full batch would, before any task runs
    in_types = {f.name: to_arrow_type(f.dataType) for f in input_schema.fields}
    for name, typ, present in fields:
        if present:
            pa.array([], type=in_types[name]).cast(typ)
    pa.array([], type=in_types["seq"]).cast(pa.int64())

    return {
        "path": path,
        "branch": branch,
        "key_cols": list(handle.key_cols),
        "bucket_col": handle.bucket_col,
        "num_buckets": handle.num_buckets,
        "bucket_fn": handle.bucket_fn,
        "merge_engine": handle.merge_engine,
        "schema_id": len(man["schemas"]) - 1,
        "fields": fields,
        "stats_cols": [c for c in handle.stats_cols if c in canon_names],
        # per-RUN staging subdir: commit/abort rmtree the whole run, so
        # files staged by failed/speculative tasks (which appear in no
        # commit message) can't leak; concurrent writers have their own
        # run dirs. Crashed-driver leftovers are swept age-based by
        # expire_snapshots.
        "staging": os.path.join(path, "_sink_tmp", uuid.uuid4().hex[:12]),
    }


class _LakeSinkBase:
    """Shared executor write + driver commit for the batch and streaming
    faces (they differ only in how the ledger batch id arrives)."""

    def __init__(self, options, input_schema, overwrite: bool) -> None:
        if overwrite:
            raise ValueError(
                "mode('overwrite') is not an append sink's contract — "
                "truncate/rewrite through the library (delete_where / "
                "bootstrap a fresh table)"
            )
        self._ctx = _plan_ctx(options, input_schema)

    # ----------------------------------------------------------- executor
    def write(self, iterator) -> _SinkMessage:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        ctx = self._ctx
        chunks: list = []
        bucket_chunks: list = []
        op_counts = {o: 0 for o in _OPS}
        for batch in iterator:
            if batch.num_rows == 0:
                # a zero-row batch is valid upstream output (a filtering
                # transform can empty a chunk); validating it would
                # misfire (pc.all over empty = null)
                continue
            tbl = pa.Table.from_batches([batch])
            stored, buckets = self._to_stored(tbl, op_counts)
            if len(stored):
                chunks.append(stored)
                bucket_chunks.append(buckets)
        if not chunks:
            return _SinkMessage(files=[], op_counts={})
        allt = pa.concat_tables(chunks)
        bk = np.concatenate(bucket_chunks)
        order = np.argsort(bk, kind="stable")
        allt = allt.take(pa.array(order))
        bk = bk[order]
        uniq, starts = np.unique(bk, return_index=True)
        bounds = list(starts) + [len(bk)]
        os.makedirs(ctx["staging"], exist_ok=True)
        task_id = uuid.uuid4().hex[:12]
        files = []
        for i, b in enumerate(uniq):
            part = allt.slice(bounds[i], bounds[i + 1] - bounds[i])
            fpath = os.path.join(
                ctx["staging"], f"{task_id}-b{int(b)}.parquet"
            )
            pq.write_table(part, fpath, version="2.6", compression="snappy")
            seq = part["_seq"]
            files.append(
                [
                    int(b),
                    fpath,
                    len(part),
                    pa.compute.min(seq).as_py(),
                    pa.compute.max(seq).as_py(),
                    self._zone(part),
                ]
            )
        return _SinkMessage(
            files=files, op_counts={o: n for o, n in op_counts.items() if n}
        )

    def _to_stored(self, tbl, op_counts: dict):
        """Validate one Arrow batch and project it to stored shape
        (canonical columns + ``_seq`` + ``_deleted``), mirroring the apply
        path's step-4 projection: casts up, null-fills absent payload,
        nulls the payload of delete rows. Returns (stored table, bucket
        ids)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.hash32 import bucket_ids_np

        ctx = self._ctx
        op = tbl["op"].cast(pa.string()).combine_chunks()
        valid = pc.is_in(op, value_set=pa.array(_OPS))
        if op.null_count or not pc.all(valid).as_py():
            raise ValueError(
                "op column must be 'I'/'U'/'D' with no nulls"
            )
        for o in _OPS:
            op_counts[o] += pc.sum(
                pc.equal(op, o)
            ).as_py() or 0
        is_del = pc.equal(op, "D")
        if ctx["merge_engine"] in ("first_row", "aggregate") and pc.any(
            is_del
        ).as_py():
            raise ValueError(
                f"merge_engine={ctx['merge_engine']!r} refuses delete "
                "events (non-retractable) — same rule as the apply path"
            )
        for k in ctx["key_cols"]:
            if tbl[k].null_count:
                raise ValueError(
                    f"null key column {k!r} — unmergeable rows; repair "
                    "upstream or route through apply_changes with a "
                    "quarantine_path"
                )
        if tbl["seq"].null_count:
            # a null LSN loses every LWW resolution (nulls rank first)
            # and would poison the bucket's lineage high-water mark
            raise ValueError(
                "null seq column — every change event needs its source LSN"
            )
        cols, names = [], []
        bucket_arr = None
        n = len(tbl)
        for name, typ, present in ctx["fields"]:
            if present:
                c = tbl[name].cast(typ).combine_chunks()
            else:
                c = pa.nulls(n, type=typ)
            if name == ctx["bucket_col"]:
                bucket_arr = bucket_ids_np(c, ctx["num_buckets"])
            if name not in ctx["key_cols"]:
                c = pc.if_else(is_del, pa.nulls(n, type=typ), c)
            cols.append(c)
            names.append(name)
        cols.append(tbl["seq"].cast(pa.int64()).combine_chunks())
        names.append("_seq")
        cols.append(is_del)
        names.append("_deleted")
        return pa.table(dict(zip(names, cols))), bucket_arr

    def _zone(self, part) -> dict:
        """Per-bucket zone-map stats for the manifest entry, same
        normalization as the apply path's footer stats (all-null or
        non-finite bounds → column omitted; readers treat absence as
        may-overlap)."""
        import pyarrow.compute as pc

        from ..plans.lake import _stat_scalar

        zone = {}
        for c in self._ctx["stats_cols"]:
            mm = pc.min_max(part[c])
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if mn is None or mx is None:
                continue
            mn, mx = _stat_scalar(mn), _stat_scalar(mx)
            if mn is None or mx is None:
                continue
            zone[c] = [mn, mx]
        return zone

    # ------------------------------------------------------------- driver
    def _commit_impl(
        self, messages, batch_id: int | None, streaming: bool = False
    ) -> None:
        import shutil

        from ..plans.lake import LakeTable

        ctx = self._ctx
        per_bucket: dict[int, dict] = {}
        for m in messages:
            if m is None:
                continue
            for b, fpath, rows, mn, mx, zone in m.files:
                e = per_bucket.setdefault(
                    b, {"rows": 0, "min_seq": None, "max_seq": None,
                        "files": [], "zone": {}, "zone_poisoned": set()}
                )
                e["rows"] += rows
                e["files"].append(fpath)
                e["min_seq"] = mn if e["min_seq"] is None else min(e["min_seq"], mn)
                e["max_seq"] = mx if e["max_seq"] is None else max(e["max_seq"], mx)
                # a column missing from ANY file's zone poisons the bucket's
                # zone for that column (folding partial bounds understates
                # the range → false skips)
                for c in list(e["zone"]):
                    if c not in zone:
                        e["zone_poisoned"].add(c)
                for c, (zmn, zmx) in zone.items():
                    if c in e["zone_poisoned"]:
                        continue
                    if len(e["files"]) > 1 and c not in e["zone"]:
                        e["zone_poisoned"].add(c)
                        continue
                    if c in e["zone"]:
                        e["zone"][c] = [min(e["zone"][c][0], zmn),
                                        max(e["zone"][c][1], zmx)]
                    else:
                        e["zone"][c] = [zmn, zmx]

        handle = LakeTable(None, ctx["path"], branch=ctx["branch"])
        # layout drift since PLAN time: the handle re-adopts the manifest,
        # so compare against the layout the rows were ROUTED under
        if (
            handle.num_buckets != ctx["num_buckets"]
            or handle.bucket_fn != ctx["bucket_fn"]
        ):
            self._cleanup()
            raise RuntimeError(
                "bucket layout changed while the batch was in flight — "
                "restart the writer (files were routed under "
                f"{ctx['bucket_fn']}/{ctx['num_buckets']} buckets)"
            )
        if not per_bucket:
            self._cleanup()
            return  # empty batch: nothing to publish, replay is a no-op
        last = handle.manifest()["last_batch_id"]
        if batch_id is not None and batch_id <= last:
            self._cleanup()
            if streaming and batch_id < last:
                # a redelivered checkpoint batch can only be the LAST one;
                # strictly-below means a FRESH query restarted its ids
                # against a ledger that is already ahead — skipping would
                # silently swallow every micro-batch until the counter
                # catches up (data loss with a healthy-looking query)
                raise RuntimeError(
                    f"micro-batch {batch_id} is behind the table's ledger "
                    f"(last_batch_id={last}) — this looks like a FRESH "
                    "checkpoint against a table another query already fed. "
                    "Resume the original checkpoint, or re-ingest "
                    "deliberately (at-least-once, seq-LWW convergent) with "
                    ".option('ignoreLedger', 'true')"
                )
            return  # redelivered batch — ledger already has it
        dest_rel = f"data/sink-{uuid.uuid4().hex[:8]}"
        dest = os.path.join(ctx["path"], dest_rel)
        entries = {}
        for b, e in per_bucket.items():
            bdir = os.path.join(dest, f"_bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            for f in e["files"]:
                dst = os.path.join(bdir, os.path.basename(f))
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
            for c in e["zone_poisoned"]:
                e["zone"].pop(c, None)
            entries[b] = {
                "path": f"{dest_rel}/_bucket={b}",
                "rows": e["rows"],
                "min_seq": e["min_seq"],
                "max_seq": e["max_seq"],
            }
            if e["zone"]:
                entries[b]["stats"] = e["zone"]
        op_counts: dict = {}
        for m in messages:
            for o, c in (m.op_counts if m else {}).items():
                op_counts[o] = op_counts.get(o, 0) + c
        res = handle.commit_appended_deltas(
            entries,
            schema_id=ctx["schema_id"],
            batch_id=batch_id,
            source="lake-sink",
            metrics_extra={"sink": "datasource", "op_counts": op_counts},
        )
        if res.get("skipped"):
            shutil.rmtree(dest, ignore_errors=True)  # lost the ledger race
        self._cleanup()

    def _cleanup(self) -> None:
        """Remove this run's whole staging subdir — covers files staged by
        failed/speculative tasks that no commit message ever named."""
        import shutil

        shutil.rmtree(self._ctx["staging"], ignore_errors=True)

    def _abort_impl(self, messages) -> None:
        self._cleanup()


class LakeSinkWriter(_LakeSinkBase, DataSourceArrowWriter):
    """Batch face: ``df.write.format("lake").mode("append")``. Optional
    ``.option("batchId", n)`` threads an exactly-once ledger token (the
    caller's idempotence key); without it the ledger is untouched and
    re-running the write appends again (converging by seq LWW on
    whole-row engines, like any replayed change batch)."""

    def __init__(self, options, input_schema, overwrite: bool) -> None:
        super().__init__(options, input_schema, overwrite)
        bid = options.get("batchId")
        self._batch_id = int(bid) if bid is not None else None

    def commit(self, messages) -> None:
        self._commit_impl(messages, self._batch_id)

    def abort(self, messages) -> None:
        self._abort_impl(messages)


class LakeStreamSinkWriter(_LakeSinkBase, DataSourceStreamArrowWriter):
    """Streaming face: ``writeStream.format("lake")`` — the micro-batch
    id IS the ledger token, so exactly-once = checkpoint redelivery × the
    same ``last_batch_id`` skip the library tail uses. A batch id
    STRICTLY below the ledger fails loudly (fresh-checkpoint guard — see
    the module docstring); ``.option("ignoreLedger", "true")`` opts into
    at-least-once re-ingestion by committing without batch ids."""

    def __init__(self, options, input_schema, overwrite: bool) -> None:
        super().__init__(options, input_schema, overwrite)
        self._ignore_ledger = str(
            options.get("ignoreLedger", "false")
        ).lower() == "true"

    def commit(self, messages, batchId: int) -> None:
        if self._ignore_ledger:
            self._commit_impl(messages, None)
        else:
            self._commit_impl(messages, batchId, streaming=True)

    def abort(self, messages, batchId: int) -> None:
        self._abort_impl(messages)
