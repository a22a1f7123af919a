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

TIME-PARTITIONED targets (round 4): a path carrying ``_spec.json``
routes each row to its partition executor-side (strftime of the
partition column in UTC — the engine's pinned session timezone, parity
with ``_part_expr``; NULL → the ``__null__`` default partition) and one
file lands per (partition, bucket) run; the driver commit publishes
each partition's deltas through its sub-table's fast-append, creates
missing partitions at the spec schema + recorded layout (Spark-free),
and commits ONE global cut so routed reads see the batch. Refused
partitioned states: ``cross_partition_upsert`` (index routing is a
Spark join), spec CHECK constraints, branch writes, partitions whose
schema history dropped the spec schema.

REFUSED table states (typed errors naming the library path): copy-on-
write semantics don't apply (the sink always appends MoR deltas — read
paths resolve chains regardless of the owner's merge_mode); tables with
CHECK constraints (inline guards ride the Spark apply plan); legacy
``xxhash64`` layouts (no vectorized router); ``merge_engine``
'first_row' and 'aggregate' refuse D events (non-retractable),
mirroring the apply path's inline guards. Tables operated with ``changelog='lookup'`` must
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
        return _plan_ctx_partitioned(options, input_schema, path)
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


_PY_FMT = {"year": "%Y", "month": "%Y-%m", "day": "%Y-%m-%d"}


def _plan_ctx_partitioned(options, input_schema, path: str) -> dict:
    """Plan-time context for a TIME-PARTITIONED composite target (round
    4 — previously refused): rows additionally route to their partition
    (strftime of the partition column, UTC — the engine's pinned session
    timezone, so the derivation matches ``_part_expr`` exactly; NULL →
    the ``__null__`` default partition), the driver commit lands each
    partition's deltas through its sub-table's fast-append and publishes
    ONE global cut. Refused states: ``cross_partition_upsert`` (routing
    needs the index lookup — a Spark join), spec-level CHECK constraints,
    branches (global WAP staging needs the router), legacy xxhash64
    layouts, and partitions whose schema history no longer contains the
    spec schema."""
    import json as _json

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from ..schemas import schema_from_json

    if options.get("branch", "main") != "main":
        raise ValueError(
            "branch writes on a partitioned table stage through the "
            "router's global WAP namespace — use "
            "PartitionedTable(branch=...) with apply_changes"
        )
    with open(os.path.join(path, "_spec.json")) as fh:
        spec = _json.load(fh)
    if spec.get("cross_partition_upsert"):
        raise ValueError(
            "cross_partition_upsert tables route through the global "
            "key→partition index (a Spark-side lookup join) — write via "
            "PartitionedTable.apply_changes"
        )
    if spec.get("constraints"):
        raise ValueError(
            "table spec carries CHECK constraints; the sink cannot "
            "evaluate them — apply via the router (inline guards)"
        )
    bucket_fn = spec.get("bucket_fn", "hash32")
    if bucket_fn != "hash32":
        raise ValueError(
            "legacy xxhash64 layout — the sink routes rows with the "
            "vectorized hash32 kernel; rebucket() the table"
        )
    canon = schema_from_json(spec["schema"])
    canon_names = canon.fieldNames()
    key_cols = list(spec["key_cols"])
    bucket_col = spec.get("bucket_col")
    part_col = spec["partition_col"]
    num_buckets = spec.get("num_buckets")
    merge_engine = spec.get("merge_engine")
    agg_spec = spec.get("agg_spec") or {}
    # pre-round-4 specs lack the strategy record: adopt it from any
    # existing partition (uniform by construction), else refuse — a
    # guessed default stamped into a NEW partition's manifest would be
    # adopted by every later reopen (the wrong-merge-engine corruption
    # class)
    parts_on_disk = sorted(
        d[len("part="):] for d in os.listdir(path)
        if d.startswith("part=")
        and os.path.isdir(os.path.join(path, d))
    )
    if parts_on_disk and (num_buckets is None or merge_engine is None
                          or bucket_col is None):
        from ..plans.lake import LakeTable

        sub0 = LakeTable(None, os.path.join(path, f"part={parts_on_disk[0]}"),
                         key_cols=tuple(key_cols))
        if sub0.exists():
            man0 = sub0.manifest()
            if num_buckets is None:
                num_buckets = man0["num_buckets"]
            if bucket_col is None:
                bucket_col = man0.get("bucket_col", key_cols[0])
            if man0.get("bucket_fn", "xxhash64") != "hash32":
                raise ValueError(
                    "legacy xxhash64 partition layout — rebucket() first"
                )
            if merge_engine is None:
                merge_engine = man0.get("merge_engine", "lww")
                agg_spec = man0.get("agg_spec") or {}
            if man0.get("constraints"):
                raise ValueError(
                    "partition carries CHECK constraints; apply via the "
                    "router (inline guards)"
                )
    if num_buckets is None or merge_engine is None or bucket_col is None:
        raise ValueError(
            "spec records no write strategy and the table has no "
            "partitions yet — seed one batch through "
            "PartitionedTable.apply_changes (or recreate the table) so "
            "the layout and merge engine are on disk"
        )
    key_type = canon[bucket_col].dataType.simpleString()
    if key_type not in ("string", "int", "bigint", "binary"):
        raise ValueError(
            f"bucket column type {key_type!r} unsupported by the "
            "vectorized router (string/int/bigint/binary)"
        )

    in_names = set(input_schema.fieldNames())
    missing = [k for k in key_cols if k not in in_names]
    if missing:
        raise ValueError(
            f"input is missing key column(s) {missing}; the table key is "
            f"{key_cols}"
        )
    if part_col not in in_names:
        raise ValueError(
            f"input is missing the partition column {part_col!r} — the "
            "router derives each row's partition from it"
        )
    for req in ("op", "seq"):
        if req not in in_names:
            raise ValueError(
                f"input is missing the {req!r} column — the sink takes "
                "CHANGE EVENTS (op 'I'/'U'/'D' + seq LSN + payload)"
            )
    unknown = sorted(in_names - set(canon_names) - {"op", "seq"})
    if unknown:
        raise ValueError(
            f"input column(s) {unknown} not in the table spec schema — "
            "the sink does not evolve schemas"
        )

    fields = []
    for f in canon.fields:
        fields.append((f.name, to_arrow_type(f.dataType), f.name in in_names))
    in_types = {f.name: to_arrow_type(f.dataType) for f in input_schema.fields}
    for name, typ, present in fields:
        if present:
            pa.array([], type=in_types[name]).cast(typ)
    pa.array([], type=in_types["seq"]).cast(pa.int64())

    return {
        "path": path,
        "branch": "main",
        "key_cols": key_cols,
        "bucket_col": bucket_col,
        "num_buckets": int(num_buckets),
        "bucket_fn": "hash32",
        "merge_engine": merge_engine,
        "agg_spec": agg_spec,
        "schema_json": canon.json(),
        "fields": fields,
        "stats_cols": ["ts"] if "ts" in canon_names else [],
        "partitioned": {
            "partition_col": part_col,
            "granularity": spec["granularity"],
            "fmt": _PY_FMT[spec["granularity"]],
            # the router formats partitions under the SESSION timezone,
            # which create() records in the spec (round 4); the sink
            # formats under that recorded zone, a writer option
            # overriding, UTC for pre-record specs. A mismatch would
            # route boundary events into different months than the
            # router.
            "tz": options.get("sessionTimeZone",
                              spec.get("session_tz", "UTC")),
        },
        "staging": os.path.join(path, "_sink_tmp", uuid.uuid4().hex[:12]),
    }


def _new_bucket_entry() -> dict:
    return {"rows": 0, "min_seq": None, "max_seq": None,
            "files": [], "zone": {}, "zone_poisoned": set()}


def _fold_file_entry(e: dict, fpath: str, rows: int, mn, mx,
                     zone: dict) -> None:
    """Fold one staged file's footer stats into a per-bucket commit
    entry — the ONE copy of the zone-poisoning rules both the flat and
    the partitioned driver commits share (the rules are subtle: a column
    missing from ANY file poisons the bucket's zone for that column,
    because folding partial bounds would understate the range → false
    skips; the ordering of the first-file vs later-file checks matters)."""
    e["rows"] += rows
    e["files"].append(fpath)
    e["min_seq"] = mn if e["min_seq"] is None else min(e["min_seq"], mn)
    e["max_seq"] = mx if e["max_seq"] is None else max(e["max_seq"], mx)
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
        part_chunks: list = []
        op_counts = {o: 0 for o in _OPS}
        for batch in iterator:
            if batch.num_rows == 0:
                # a zero-row batch is valid upstream output (a filtering
                # transform can empty a chunk); validating it would
                # misfire (pc.all over empty = null)
                continue
            tbl = pa.Table.from_batches([batch])
            stored, buckets, parts = self._to_stored(tbl, op_counts)
            if len(stored):
                chunks.append(stored)
                bucket_chunks.append(buckets)
                part_chunks.append(parts)
        if not chunks:
            return _SinkMessage(files=[], op_counts={})
        allt = pa.concat_tables(chunks)
        bk = np.concatenate(bucket_chunks)
        if part_chunks[0] is None:
            pk = np.zeros(len(bk), dtype=np.int64)
            part_names = [None]
        else:
            # factorize partition strings so the slicing sort key is
            # numeric either way; one file per (partition, bucket) run
            all_parts = np.concatenate(part_chunks)
            part_names, pk = np.unique(all_parts, return_inverse=True)
            part_names = list(part_names)
        order = np.lexsort((bk, pk))
        allt = allt.take(pa.array(order))
        bk, pk = bk[order], pk[order]
        combo = pk * (ctx["num_buckets"] + 1) + bk
        uniq, starts = np.unique(combo, return_index=True)
        bounds = list(starts) + [len(bk)]
        os.makedirs(ctx["staging"], exist_ok=True)
        task_id = uuid.uuid4().hex[:12]
        files = []
        for i, c in enumerate(uniq):
            part = allt.slice(bounds[i], bounds[i + 1] - bounds[i])
            b = int(c % (ctx["num_buckets"] + 1))
            pname = part_names[int(c // (ctx["num_buckets"] + 1))]
            fpath = os.path.join(
                ctx["staging"], f"{task_id}-{i}-b{b}.parquet"
            )
            pq.write_table(part, fpath, version="2.6", compression="snappy")
            seq = part["_seq"]
            files.append(
                [
                    pname,
                    b,
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
        stored = pa.table(dict(zip(names, cols)))
        part_arr = None
        pinfo = ctx.get("partitioned")
        if pinfo is not None:
            # partition derivation — strftime in the column's own UTC
            # zone, the engine's pinned session timezone, so the strings
            # match _part_expr's date_format exactly; NULL ts routes to
            # the __null__ default partition (same rule as the router).
            # Derived from the RAW input column, NOT the stored one: the
            # projection above nulls delete rows' payload, and a D must
            # land its tombstone in the partition its own ts derives —
            # exactly the router's order (_part before the projection)
            import numpy as np

            ptyp = next(t for n, t, _p in ctx["fields"]
                        if n == pinfo["partition_col"])
            raw = tbl[pinfo["partition_col"]].cast(ptyp).combine_chunks()
            if pa.types.is_timestamp(raw.type) and raw.type.tz is not None:
                # format under the DECLARED session timezone (strftime
                # renders in the column's zone; casting between tz-aware
                # types converts the instant)
                raw = raw.cast(pa.timestamp(raw.type.unit,
                                            tz=pinfo["tz"]))
            s = pc.strftime(raw, format=pinfo["fmt"])
            s = pc.fill_null(s, "__null__")
            part_arr = np.asarray(s.to_pylist(), dtype=object)
        return stored, bucket_arr, part_arr

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
        if ctx.get("partitioned") is not None:
            return self._commit_partitioned(messages, batch_id, streaming)
        per_bucket: dict[int, dict] = {}
        for m in messages:
            if m is None:
                continue
            for _pname, b, fpath, rows, mn, mx, zone in m.files:
                _fold_file_entry(
                    per_bucket.setdefault(b, _new_bucket_entry()),
                    fpath, rows, mn, mx, zone,
                )

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

    def _commit_partitioned(
        self, messages, batch_id: int | None, streaming: bool
    ) -> None:
        """Driver commit for a TIME-PARTITIONED target: per touched
        partition, hardlink that partition's staged bucket files into its
        sub-table and publish via the sub's fast-append
        (``commit_appended_deltas``); then commit ONE global cut so
        routed reads see the batch (direct sub writes alone would sit
        behind the cut, the TableGroup direct-write rule). New partitions
        are created at the spec schema + layout (Spark-free
        ``LakeTable.create``); a create race adopts the winner. Sub-files
        written under an OLDER schema than the partition's head commit at
        the spec schema's id in that partition's append-only list —
        readers cast up, the multi-schema machinery's normal job."""
        import json as _json
        import shutil

        from ..plans.lake import LakeTable
        from ..plans.partitioned import PartitionedTable
        from ..schemas import schema_from_json

        ctx = self._ctx
        pt = PartitionedTable(None, ctx["path"])
        gman = pt.manifest()
        last = gman["last_batch_id"]
        if batch_id is not None and batch_id <= last:
            self._cleanup()
            if streaming and batch_id < last:
                raise RuntimeError(
                    f"micro-batch {batch_id} is behind the table's global "
                    f"ledger (last_batch_id={last}) — this looks like a "
                    "FRESH checkpoint against a table another query "
                    "already fed. Resume the original checkpoint, or "
                    "re-ingest deliberately with "
                    ".option('ignoreLedger', 'true')"
                )
            return
        per_part: dict[str, dict[int, dict]] = {}
        op_counts: dict = {}
        for m in messages:
            if m is None:
                continue
            for o, c in (m.op_counts or {}).items():
                op_counts[o] = op_counts.get(o, 0) + c
            for pname, b, fpath, rows, mn, mx, zone in m.files:
                _fold_file_entry(
                    per_part.setdefault(pname, {}).setdefault(
                        b, _new_bucket_entry()
                    ),
                    fpath, rows, mn, mx, zone,
                )
        if not per_part:
            self._cleanup()
            return
        spec_struct = schema_from_json(ctx["schema_json"])
        canon_json_norm = _json.dumps(
            _json.loads(spec_struct.json()), sort_keys=True
        )
        touched = sorted(per_part)
        committed = {}
        for pname in touched:
            subpath = pt._part_dir(pname)
            sub = LakeTable(None, subpath, key_cols=tuple(ctx["key_cols"]),
                            bucket_col=ctx["bucket_col"],
                            num_buckets=ctx["num_buckets"],
                            bucket_fn="hash32",
                            merge_engine=ctx["merge_engine"],
                            agg_spec=ctx["agg_spec"] or None)
            if not sub.exists():
                try:
                    sub.create(spec_struct)
                except RuntimeError:
                    if not sub.exists():  # lost a create race? adopt
                        raise
                sub = LakeTable(None, subpath,
                                key_cols=tuple(ctx["key_cols"]))
            if (sub.num_buckets != ctx["num_buckets"]
                    or sub.bucket_fn != "hash32"
                    or sub.bucket_col != ctx["bucket_col"]):
                self._cleanup()
                raise RuntimeError(
                    f"partition {pname!r} layout ({sub.bucket_fn}/"
                    f"{sub.num_buckets} on {sub.bucket_col!r}) differs "
                    f"from the routed layout (hash32/"
                    f"{ctx['num_buckets']} on {ctx['bucket_col']!r}) — "
                    "restart the writer"
                )
            man_p = sub.manifest()
            if man_p.get("constraints"):
                # out-of-band per-partition CHECKs (pt.part(p)
                # .add_constraint) — the sink cannot evaluate them;
                # checked per TOUCHED partition at commit, not just via
                # the plan-time spec/first-partition probe
                self._cleanup()
                raise RuntimeError(
                    f"partition {pname!r} carries CHECK constraints; "
                    "apply via the router (inline guards)"
                )
            sid = None
            for i, sj in enumerate(man_p["schemas"]):
                if _json.dumps(_json.loads(sj), sort_keys=True) == \
                        canon_json_norm:
                    sid = i
                    break
            if sid is None:
                self._cleanup()
                raise RuntimeError(
                    f"partition {pname!r} schema history no longer "
                    "contains the spec schema (renamed/dropped columns?) "
                    "— write through PartitionedTable.apply_changes"
                )
            dest_rel = f"data/sink-{uuid.uuid4().hex[:8]}"
            dest = os.path.join(subpath, dest_rel)
            entries = {}
            for b, e in per_part[pname].items():
                bdir = os.path.join(dest, f"_bucket={b}")
                os.makedirs(bdir, exist_ok=True)
                for f in e["files"]:
                    dst = os.path.join(bdir, os.path.basename(f))
                    try:
                        os.link(f, dst)
                    except OSError:
                        shutil.copy2(f, dst)
                for c2 in e["zone_poisoned"]:
                    e["zone"].pop(c2, None)
                entries[b] = {
                    "path": f"{dest_rel}/_bucket={b}",
                    "rows": e["rows"],
                    "min_seq": e["min_seq"],
                    "max_seq": e["max_seq"],
                }
                if e["zone"]:
                    entries[b]["stats"] = e["zone"]
            res = sub.commit_appended_deltas(
                entries, schema_id=sid, batch_id=batch_id,
                source="lake-sink",
                metrics_extra={"sink": "datasource"},
            )
            if res.get("skipped"):
                shutil.rmtree(dest, ignore_errors=True)
            committed[pname] = {
                k: res.get(k) for k in ("n_events", "skipped", "version")
                if k in res
            }
        metrics = {
            "sink": "datasource",
            "n_parts_touched": len(touched),
            "op_counts": op_counts,
            "parts": committed,
        }
        # global-cut commit with the apply path's conflict retry: the cut
        # is pure metadata (pin every partition at its current head)
        for attempt in range(32):
            try:
                pt._commit_global(
                    pt._next_global("sink", touched=touched,
                                    batch_id=batch_id, metrics=metrics)
                )
                break
            except RuntimeError:
                if attempt == 31:
                    raise
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
