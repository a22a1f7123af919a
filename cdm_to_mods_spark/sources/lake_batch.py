"""``lake`` — BATCH reads (this module) and batch/streaming WRITES
(sources/lake_sink.py) of a lake table as a native Spark data source
(Spark 4 Python Data Source API), with manifest-level pruning driven by
Catalyst's pushed filters:

    from cdm_to_mods_spark.sources.lake_batch import register_lake
    register_lake(spark)
    df = spark.read.format("lake").load("/lake/transcripts")
    df.where("conv_id = 'conv-00000007'")          # bucket-pruned
    df.where("ts >= '2025-06-01'")                 # zone-map / partition-pruned

This is the ``spark.read.format("delta")`` analog for this engine: any
plain-SQL consumer reads the table's RESOLVED state without importing the
library — no polling of ``LakeTable.read()``, no shared driver. The
library path stays the richer surface (merge engines beyond lww/first_row,
change feeds, branches-as-writers); this source is the interoperability
face.

Mechanics — planning is pure metadata, reading is pure Arrow:

* ``schema()`` / ``partitions()`` resolve the snapshot ledger with plain
  file IO (the data source runtime runs in Python workers with NO
  SparkSession; the spark-less ``LakeTable(None, path)`` handle serves
  manifest materialization, format fences and layout adoption).
* ``pushFilters`` receives Catalyst's conjunctive filters. ALL filters are
  returned as unhandled — Spark re-applies them post-scan — and the source
  uses them purely to PRUNE:
  - ``bucket_col = v`` / ``bucket_col IN (...)`` → bucket pruning via a
    pure-Python port of Spark's Murmur3 hash (parity-pinned in tests
    against ``F.hash`` — the exact ``HashPartitioning`` function ``hash32``
    tables bucket by). Legacy ``xxhash64`` tables skip this prune.
  - range/equality bounds on zone-mapped columns (``stats_cols``) →
    manifest-level bucket skipping, same bucket-granularity rule as
    ``read_range`` (an out-of-range delta row can supersede an in-range
    base row, so surviving buckets still merge fully; but a bucket NONE of
    whose stored rows can match a conjunct produces no matching resolved
    row either — skipping it is sound).
  - on a PARTITIONED table (``plans/partitioned.py`` spec), bounds on the
    partition column prune whole partitions driver-side first (string
    compare of partition values — zero I/O), then each survivor prunes
    buckets as above.
* ``partitions()`` emits one input partition per surviving BUCKET — the
  resolution unit (a key lives in exactly one bucket), so last-write-wins
  merges never cross input partitions and a wide table scans fully
  parallel.
* ``read()`` yields Arrow RecordBatches straight off the parquet bytes,
  cast per each file set's recorded ``schema_id`` through the rename log
  (added columns null-filled, renamed columns resolved, widened types cast
  up) exactly like ``LakeTable.read`` casts; buckets with delta chains
  resolve last-write-wins in pandas per bucket (differentially pinned
  against ``LakeTable.read()`` — same max-(seq, live-rank, payload) rule,
  nulls-smallest).

Timestamp bounds assume the engine-wide UTC session timezone
(``session.get_spark`` pins it): a pushed timestamp literal arrives as a
session-tz-naive datetime, and the zone maps store UTC epochs — under a
non-UTC session disable pruning with ``.option("pruneStats", "false")``
rather than risk a false skip.

Options: ``path`` (or ``load(path)``); ``versionAsOf`` (snapshot version —
GLOBAL version on a partitioned table); ``timestampAsOf`` (unix seconds or
ISO string, resolved against commit timestamps); ``branch`` (flat tables
only); ``pruneStats`` (default true).

Merge engines: ``lww`` and ``first_row`` resolve here; ``partial_update``
and ``aggregate`` are REFUSED with a typed error naming ``LakeTable.read()``
— their column-level resolution rules live in one place
(``operators/dedup.py``) and a second implementation in this source would
be a silent correctness fork waiting to diverge.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from ..plans.lake import LakeTable, _stat_scalar, _to_unix
from ..schemas import DELETED_COL, SEQ_COL, schema_from_json

__all__ = ["LakeBatchDataSource", "register_lake", "spark_hash32_bucket"]

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _signed32(x: int) -> int:
    return x - (1 << 32) if x >= (1 << 31) else x


def spark_murmur3(value, seed: int = 42) -> int | None:
    """Pure-Python port of Spark's ``F.hash`` (Murmur3 x86-32, seed 42)
    for the key types tables bucket by — int (4-byte), long (8-byte, two
    words), str/bytes (word blocks, then Spark's byte-at-a-time signed
    tail, NOT the standard murmur3 tail). Parity is pinned in
    tests/test_lake_source.py against ``F.hash`` on random values.
    Returns None for unsupported types (caller skips pruning)."""
    if value is None:
        return None
    if isinstance(value, bool):  # bool hashes as int 0/1 in Spark
        value = int(value)
    if isinstance(value, int):
        if -(1 << 31) <= value < (1 << 31):
            return _signed32(_fmix(_mix_h1(seed & _M32, _mix_k1(value & _M32)), 4))
        v = value & ((1 << 64) - 1)
        h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
        h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
        return _signed32(_fmix(h1, 8))
    if isinstance(value, str):
        value = value.encode("utf-8")
    if isinstance(value, bytes):
        h1 = seed & _M32
        n = len(value)
        aligned = n - n % 4
        for i in range(0, aligned, 4):
            h1 = _mix_h1(h1, _mix_k1(int.from_bytes(value[i : i + 4], "little")))
        for i in range(aligned, n):
            b = value[i]
            if b >= 128:  # Java reads a SIGNED byte, sign-extended
                b -= 256
            h1 = _mix_h1(h1, _mix_k1(b & _M32))
        return _signed32(_fmix(h1, n))
    return None


def spark_hash32_bucket(value, num_buckets: int, key_is_long: bool = False):
    """Bucket id for a key under the ``hash32`` layout —
    ``pmod(murmur3(key), n)``, matching ``plans.lake._bucket_expr``.
    ``key_is_long`` forces the 8-byte hash for long-typed key columns
    whose Python value fits in 32 bits (Spark hashes by COLUMN type, not
    value magnitude)."""
    if key_is_long and isinstance(value, int) and not isinstance(value, bool):
        v = value & ((1 << 64) - 1)
        h1 = _mix_h1(42, _mix_k1(v & _M32))
        h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
        h = _signed32(_fmix(h1, 8))
    else:
        h = spark_murmur3(value)
    if h is None:
        return None
    return ((h % num_buckets) + num_buckets) % num_buckets


_PY_FMT = {"year": "%Y", "month": "%Y-%m", "day": "%Y-%m-%d"}


class _BucketPartition(InputPartition):
    """One admitted bucket: the resolution unit. ``file_sets`` is the
    bucket's base-then-deltas chain as (absolute dir path, schema_id,
    unresolved) — unresolved marks a native-sink raw event batch."""

    def __init__(self, ctx: str, bucket: int, file_sets: list) -> None:
        self.ctx = ctx
        self.bucket = bucket
        self.file_sets = file_sets


def _ts_option(v):
    """Data source options arrive as STRINGS — a unix-epoch number passed
    as ``timestampAsOf`` must not hit the ISO parser as text."""
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def _resolve_version(handle: LakeTable, version_opt, ts_opt):
    if version_opt is not None and ts_opt is not None:
        raise ValueError("pass versionAsOf OR timestampAsOf, not both")
    if version_opt is not None:
        return int(version_opt)
    if ts_opt is not None:
        return handle.version_as_of(_to_unix(_ts_option(ts_opt)))
    return None


class _LakeBatchReader(DataSourceReader):
    def __init__(self, options, spark_schema) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("format('lake') requires a table path")
        self._spark_schema = spark_schema
        self._prune_stats = (
            str(options.get("pruneStats", "true")).lower() != "false"
        )
        version_opt = options.get("versionAsOf")
        ts_opt = options.get("timestampAsOf")
        branch = options.get("branch", "main")
        self._filters: list = []
        # planning state, all driver/runner-side metadata:
        #   _ctx[key] = per-(sub)table resolution context for read()
        #   _tables   = [(ctx_key, manifest, part_value-or-None)]
        self._ctx: dict[str, dict] = {}
        self._tables: list[tuple[str, dict, str | None]] = []
        self._partition_col = None
        self._granularity = None
        spec_path = os.path.join(os.path.abspath(path.rstrip("/")), "_spec.json")
        if os.path.exists(spec_path):
            if branch != "main":
                raise ValueError(
                    "branch reads are a flat-table surface; partitioned "
                    "tables have no branch namespace"
                )
            from ..plans.partitioned import PartitionedTable

            pt = PartitionedTable(None, path)
            gv = None
            if version_opt is not None and ts_opt is not None:
                raise ValueError("pass versionAsOf OR timestampAsOf, not both")
            if version_opt is not None:
                gv = int(version_opt)
            elif ts_opt is not None:
                want = _to_unix(_ts_option(ts_opt))
                cands = [
                    v for v in pt._versions()
                    if pt.manifest(v).get("commit_ts", 0.0) <= want
                ]
                if not cands:
                    raise ValueError(
                        f"no global snapshot at or before {ts_opt!r}"
                    )
                gv = cands[-1]
            gman = pt.manifest(gv)
            self._partition_col = pt.partition_col
            self._granularity = pt.granularity
            for p, sv in sorted(gman["parts"].items()):
                sub = pt._sub(p)  # raises PartitionRetentionError if gone
                self._add_table(sub, sub.manifest(sv), part=p)
        else:
            handle = LakeTable(None, path, branch=branch)
            man = handle.manifest(
                _resolve_version(handle, version_opt, ts_opt)
            )
            self._add_table(handle, man, part=None)

    def _add_table(self, handle: LakeTable, man: dict, part: str | None) -> None:
        engine = man.get("merge_engine", handle.merge_engine)
        if engine not in ("lww", "first_row"):
            raise ValueError(
                f"format('lake') resolves merge_engine='lww'/'first_row' "
                f"only; this table uses {engine!r} — read it with "
                "LakeTable.read(), which owns that engine's column-level "
                "resolution (one implementation, no silent fork)"
            )
        key = part or ""
        self._ctx[key] = {
            "schemas": man["schemas"],
            "renames": man.get("renames", []),
            "key_cols": list(man.get("key_cols", handle.key_cols)),
            "engine": engine,
            "root": handle.path,
            "bucket_col": man.get("bucket_col", handle.bucket_col),
            "num_buckets": man.get("num_buckets", handle.num_buckets),
            "bucket_fn": man.get("bucket_fn", handle.bucket_fn),
        }
        self._tables.append((key, man, part))

    # ------------------------------------------------------------ filters
    def pushFilters(self, filters):
        """Record the conjunction for pruning; report EVERY filter as
        unhandled so Spark re-applies them post-scan — pruning is an
        optimization, never the correctness carrier."""
        self._filters = list(filters)
        return iter(self._filters)

    @staticmethod
    def _col(f):
        attr = getattr(f, "attribute", None)
        return attr[0] if attr and len(attr) == 1 else None

    def _prune_plan(self):
        """Fold the pushed conjunction into (key equality set | None,
        {col: [lo, hi]} stat bounds). Unknown/unsupported conjuncts are
        simply not used — they still filter post-scan."""
        key_vals: set | None = None
        bounds: dict[str, list] = {}

        def _and_bound(col, lo=None, hi=None):
            cur = bounds.setdefault(col, [None, None])
            if lo is not None:
                cur[0] = lo if cur[0] is None else max(cur[0], lo)
            if hi is not None:
                cur[1] = hi if cur[1] is None else min(cur[1], hi)

        for f in self._filters:
            col = self._col(f)
            if col is None:
                continue
            if isinstance(f, EqualTo):
                vals = {f.value}
            elif isinstance(f, In):
                vals = set(f.value)
            else:
                vals = None
            if vals is not None:
                # equality doubles as a stat bound when the col is zone-mapped
                svals = [_stat_scalar(self._coerce(v)) for v in vals]
                if svals and all(v is not None for v in svals):
                    _and_bound(col, lo=min(svals), hi=max(svals))
                if col in self._bucket_cols():
                    key_vals = vals if key_vals is None else key_vals & vals
                continue
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                v = _stat_scalar(self._coerce(f.value))
                if v is not None:
                    _and_bound(col, lo=v)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                v = _stat_scalar(self._coerce(f.value))
                if v is not None:
                    _and_bound(col, hi=v)
        return key_vals, bounds

    def _bucket_cols(self) -> set:
        return {c["bucket_col"] for c in self._ctx.values()}

    @staticmethod
    def _coerce(v):
        """Stat bounds compare as UTC epochs; a pushed timestamp literal
        arrives as a naive datetime in the session tz — engine sessions
        pin UTC, so naive-as-UTC is the documented contract (module
        docstring; a non-UTC session should disable pruneStats)."""
        if isinstance(v, _dt.datetime) and v.tzinfo is None:
            return v.replace(tzinfo=_dt.timezone.utc)
        return v

    @staticmethod
    def _zone_admits(entry_files: list, col: str, lo, hi) -> bool:
        """Bucket admitted unless EVERY file set has stats for ``col`` and
        every one is disjoint from [lo, hi] (the read_range rule)."""
        for fs in entry_files:
            st = (fs.get("stats") or {}).get(col)
            if st is None:
                return True
            if (hi is None or not st[0] > hi) and (lo is None or not st[1] < lo):
                return True
        return False

    def _part_of_bound(self, v) -> str | None:
        v = self._coerce(v)
        if isinstance(v, (int, float)):
            v = _dt.datetime.fromtimestamp(float(v), tz=_dt.timezone.utc)
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc)
        if not isinstance(v, _dt.datetime):
            return None
        return v.astimezone(_dt.timezone.utc).strftime(
            _PY_FMT[self._granularity]
        )

    # --------------------------------------------------------- partitions
    def partitions(self):
        key_vals, bounds = (None, {})
        if self._prune_stats:
            key_vals, bounds = self._prune_plan()
        # partition-level prune first (zero I/O): bounds on the partition
        # column map to partition-value strings; a range filter can never
        # match NULL ts, so the null partition drops too.
        tables = self._tables
        if self._partition_col is not None and self._partition_col in bounds:
            lo, hi = bounds[self._partition_col]
            lo_p = self._part_of_bound(lo) if lo is not None else None
            hi_p = self._part_of_bound(hi) if hi is not None else None
            if lo_p is not None or hi_p is not None:
                from ..plans.partitioned import NULL_PART

                tables = [
                    (k, m, p) for k, m, p in tables
                    if p != NULL_PART
                    and (lo_p is None or p >= lo_p)
                    and (hi_p is None or p <= hi_p)
                ]
        out: list[_BucketPartition] = []
        for key, man, _part in tables:
            ctx = self._ctx[key]
            admit: set[int] | None = None
            if key_vals is not None and ctx["bucket_fn"] == "hash32":
                bcol_type = schema_from_json(man["schemas"][-1])[
                    ctx["bucket_col"]
                ].dataType.simpleString()
                if bcol_type in ("string", "int", "bigint", "binary"):
                    admit = {
                        b
                        for b in (
                            spark_hash32_bucket(
                                v, ctx["num_buckets"],
                                key_is_long=(bcol_type == "bigint"),
                            )
                            for v in key_vals
                        )
                        if b is not None
                    }
            for b, entry in man["buckets"].items():
                if admit is not None and int(b) not in admit:
                    continue
                files = LakeTable._bucket_files(entry)
                skip = False
                for col, (lo, hi) in bounds.items():
                    if not self._zone_admits(files, col, lo, hi):
                        skip = True
                        break
                if skip:
                    continue
                out.append(
                    _BucketPartition(
                        key,
                        int(b),
                        [
                            (
                                fs["path"]
                                if os.path.isabs(fs["path"])
                                else os.path.join(ctx["root"], fs["path"]),
                                fs["schema_id"],
                                bool(fs.get("unresolved")),
                            )
                            for fs in files
                        ],
                    )
                )
        return out

    # --------------------------------------------------------------- read
    def read(self, partition: _BucketPartition):
        if partition is None:
            # partitions() returned [] (empty table, or a key/zone/
            # partition prune eliminated every bucket) — Spark's Python
            # data source worker substitutes [None] and still calls
            # read(None); the scan's answer is simply zero rows
            return
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_schema

        ctx = self._ctx[partition.ctx]
        out_schema = to_arrow_schema(self._spark_schema)
        merged = read_stored_resolved(ctx, partition.file_sets, out_schema)
        live = merged.filter(pc.invert(pc.field(DELETED_COL)))
        yield from live.select(out_schema.names).cast(out_schema).to_batches(
            max_chunksize=65_536
        )


def read_stored_resolved(ctx: dict, file_sets: list, canon_fields):
    """Read one bucket's base+delta chain to RESOLVED stored rows —
    Spark-free (pure Arrow/pandas), shared by the batch source and the
    ``lake_cdf`` initial-snapshot partitions. ``ctx`` needs ``schemas``,
    ``renames``, ``key_cols``, ``engine``; ``file_sets`` is the
    (abs path, schema_id, unresolved) chain; ``canon_fields`` the
    pyarrow fields of the canonical output columns. Each file set casts
    up per its recorded schema_id through the rename log; the chain then
    LWW-resolves when it can hold >1 version of a key (multi-set, or a
    native-sink RAW batch marked ``unresolved``). Returns resolved rows
    INCLUDING tombstones plus ``_seq``/``_deleted`` — callers filter
    live and project."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..plans.lake import _stored_name

    man_like = {"renames": ctx["renames"]}
    pieces = []
    any_unresolved = any(u for _, _, u in file_sets)
    for path, sid, _u in file_sets:
        tbl = pq.read_table(path)
        stored = set(
            schema_from_json(ctx["schemas"][sid]).fieldNames()
        ) | {SEQ_COL, DELETED_COL}
        cols = {}
        for field in canon_fields:
            sname = _stored_name(man_like, sid, field.name)
            if sname in stored and sname in tbl.column_names:
                cols[field.name] = tbl[sname].cast(field.type)
            else:  # column added after this file set was written
                cols[field.name] = pa.nulls(len(tbl), type=field.type)
        for hid, typ in ((SEQ_COL, pa.int64()), (DELETED_COL, pa.bool_())):
            cols[hid] = tbl[hid].cast(typ)
        pieces.append(pa.table(cols))
    merged = pa.concat_tables(pieces)
    # a single file set normally holds one version per key (apply
    # collapses in-batch); native-sink deltas are RAW event batches
    # (marked "unresolved"), so even a chain of one must resolve
    if len(pieces) > 1 or any_unresolved:
        merged = _resolve_stored(merged, ctx)
    return merged


def _resolve_stored(merged, ctx):
    """Per-key resolution over a bucket's base+delta rows — the pandas
    mirror of ``LakeTable._resolve_lww`` for the whole-row engines:
    winner = max (``_seq``, live-rank D<U, payload nulls-smallest) for
    lww, min for first_row. Differentially pinned against
    ``LakeTable.read()`` in tests/test_lake_source.py."""
    import pyarrow as pa

    pdf = merged.to_pandas(types_mapper=None)
    keys = ctx["key_cols"]
    payload = [
        c for c in pdf.columns
        if c not in keys and c not in (SEQ_COL, DELETED_COL)
    ]
    pdf["_rank"] = (~pdf[DELETED_COL].astype(bool)).astype("int8")
    first = ctx["engine"] == "first_row"
    try:
        pdf = pdf.sort_values(
            [SEQ_COL, "_rank", *payload],
            kind="stable",
            na_position="first",
        )
    except TypeError:
        # unorderable payload dtype (nested types): seq+rank ties with
        # differing payloads are the delete_where LSN-collision corner;
        # fall back to the engine's primary ordering only.
        pdf = pdf.sort_values(
            [SEQ_COL, "_rank"], kind="stable", na_position="first"
        )
    pdf = pdf.drop_duplicates(
        subset=keys, keep="first" if first else "last"
    ).drop(columns=["_rank"])
    return pa.Table.from_pandas(
        pdf, schema=merged.schema, preserve_index=False
    )


class LakeBatchDataSource(DataSource):
    """``spark.read.format("lake")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("format('lake') requires a table path")
        spec_path = os.path.join(
            os.path.abspath(path.rstrip("/")), "_spec.json"
        )
        if os.path.exists(spec_path):
            import json

            with open(spec_path) as fh:
                return schema_from_json(json.load(fh)["schema"])
        handle = LakeTable(None, path, branch=self.options.get("branch", "main"))
        man = handle.manifest(
            _resolve_version(
                handle,
                self.options.get("versionAsOf"),
                self.options.get("timestampAsOf"),
            )
        )
        return schema_from_json(man["schemas"][-1])

    def reader(self, schema) -> _LakeBatchReader:
        return _LakeBatchReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        from .lake_sink import LakeSinkWriter

        return LakeSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        from .lake_sink import LakeStreamSinkWriter

        return LakeStreamSinkWriter(self.options, schema, overwrite)


def register_lake(spark) -> None:
    """Idempotent registration of the ``lake`` batch format. Also enables
    Python-source filter pushdown (runtime conf, default-off in Spark 4.1)
    — without it Spark refuses a reader that implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeBatchDataSource)
