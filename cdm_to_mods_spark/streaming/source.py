"""``lake_cdf`` — the table's change feed as a NATIVE Structured Streaming
source (Spark 4 Python Data Source API):

    from cdm_to_mods_spark.streaming.source import register_lake_cdf
    register_lake_cdf(spark)
    feed = (spark.readStream.format("lake_cdf")
                 .option("path", "/lake/transcripts").load())
    feed.writeStream.foreachBatch(...).option("checkpointLocation", ck).start()

This is the Delta ``readStream``-on-a-table analog for this engine: any
downstream Spark pipeline tails the table's committed change rows with
ordinary checkpointed exactly-once semantics — no polling loop, no custom
consumer (``plans/feed.py`` remains the non-streaming/driver-light path).

Mechanics — offsets ARE ledger versions:

* ``initialOffset``/``latestOffset`` read the version-file ledger with
  plain file IO (the data source runtime runs in Python workers with NO
  SparkSession; everything here is json + pyarrow).
* ``partitions(start, end)`` lists each version's committed ``cdf`` file
  sets — one input partition per file set, so a micro-batch spanning many
  versions/buckets scans in parallel across executors.
* ``read(partition)`` yields Arrow RecordBatches straight from the parquet
  bytes (no per-row Python), cast per the file set's recorded ``schema_id``
  to the feed schema exactly like :meth:`LakeTable.changes` casts — through
  the rename log, add-columns null-filled — plus a ``_version`` column.

Semantics match ``changes()``: merge-on-read versions (or cow with
``cow_change_feed``) stream their resolved change rows including ``_seq``
and ``_deleted``; cow versions without change files fail the batch with
the same error ``changes()`` raises; expired versions raise with a
re-seed instruction. The feed schema is fixed at query start (head
canonical schema) — restart the stream to pick up later column adds, the
same contract Delta's CDF stream has.

Options: ``path`` (required); ``startingVersion`` — first UNCONSUMED
version floor: ``"earliest"`` (default; the whole retained feed) or a
version number N (consume strictly-after N, mirroring ``changes(N)``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..plans.lake import _stored_name
from ..schemas import DELETED_COL, SEQ_COL, schema_from_json

VERSION_COL = "_version"


# ---------------------------------------------------------- ledger file IO
def _ledger_versions(table_path: str) -> list[int]:
    led = os.path.join(table_path, "_ledger")
    if not os.path.isdir(led):
        raise FileNotFoundError(f"no lake table at {table_path}")
    return sorted(
        int(f[1:-5])
        for f in os.listdir(led)
        if f.startswith("v") and f.endswith(".json")
    )


def _load_version(table_path: str, v: int) -> dict:
    with open(os.path.join(table_path, "_ledger", f"v{v:08d}.json")) as fh:
        return json.load(fh)


def _cdf_entries(table_path: str, v: int, lo: int, hi: int) -> list[dict]:
    """Version ``v``'s change-file sets, with the SAME guard rails as
    LakeTable.changes (expired → re-seed error; feed-less cow → error)."""
    try:
        m = _load_version(table_path, v)
    except FileNotFoundError:
        raise RuntimeError(
            f"change feed for ({lo}, {hi}] needs version {v}, which was "
            "removed by expire_snapshots — re-seed the consumer from a "
            "snapshot read and restart the stream from a later "
            "startingVersion"
        ) from None
    if (
        m.get("metrics", {}).get("mode") == "cow"
        and not m.get("cdf")
        and m.get("metrics", {}).get("n_buckets_touched", 1) > 0
    ) or m.get("metrics", {}).get("cow_without_cdf"):
        raise RuntimeError(
            f"version {v} was (or contains) a copy-on-write commit without "
            "change-data files; use merge-on-read or cow_change_feed=True"
        )
    return list(m.get("cdf", []))


class _CDFPartition(InputPartition):
    def __init__(self, path: str, schema_id: int, version: int) -> None:
        self.path = path
        self.schema_id = schema_id
        self.version = version


class _CDFStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, spark_schema, starting: str) -> None:
        self._path = table_path
        self._spark_schema = spark_schema
        versions = _ledger_versions(table_path)
        head = _load_version(table_path, versions[-1])
        # schema resolution state is pinned at query start, like the schema
        self._renames = head.get("renames", [])
        self._schemas = head["schemas"]
        if starting == "earliest":
            # everything the retained ledger can serve: strictly after the
            # floor below the earliest retained version
            self._start = versions[0] - 1
        else:
            self._start = int(starting)

    # offsets are plain dicts (JSON) — {"version": last consumed}
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _ledger_versions(self._path)[-1]}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        parts: list[_CDFPartition] = []
        for v in range(lo + 1, hi + 1):
            for fs in _cdf_entries(self._path, v, lo, hi):
                parts.append(
                    _CDFPartition(
                        os.path.join(self._path, fs["path"]),
                        fs["schema_id"],
                        v,
                    )
                )
        return parts

    def read(self, partition: _CDFPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(self._spark_schema)
        tbl = pq.read_table(partition.path)
        sid = partition.schema_id
        stored_fields = set(
            schema_from_json(self._schemas[sid]).fieldNames()
        ) | {SEQ_COL, DELETED_COL}
        cols = {}
        for field in out_schema:
            if field.name == VERSION_COL:
                cols[field.name] = pa.nulls(len(tbl), type=field.type).fill_null(
                    partition.version
                )
                continue
            stored = (
                field.name
                if field.name in (SEQ_COL, DELETED_COL)
                else _stored_name({"renames": self._renames}, sid, field.name)
            )
            if stored in stored_fields and stored in tbl.column_names:
                cols[field.name] = tbl[stored].cast(field.type)
            else:  # column added after this file set was written
                cols[field.name] = pa.nulls(len(tbl), type=field.type)
        yield from pa.table(cols, schema=out_schema).to_batches(
            max_chunksize=65_536
        )

    def commit(self, end: dict) -> None:
        pass  # progress lives in the query checkpoint, nothing to GC


class LakeChangeFeedDataSource(DataSource):
    """``spark.readStream.format("lake_cdf")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self):
        from pyspark.sql import types as T

        path = self.options.get("path")
        if not path:
            raise ValueError("lake_cdf requires .option('path', <table dir>)")
        versions = _ledger_versions(path)
        canon = schema_from_json(_load_version(path, versions[-1])["schemas"][-1])
        return T.StructType(
            [
                *canon.fields,
                T.StructField(SEQ_COL, T.LongType(), True),
                T.StructField(DELETED_COL, T.BooleanType(), True),
                T.StructField(VERSION_COL, T.LongType(), True),
            ]
        )

    def streamReader(self, schema) -> _CDFStreamReader:
        return _CDFStreamReader(
            self.options["path"],
            schema,
            self.options.get("startingVersion", "earliest"),
        )


def register_lake_cdf(spark) -> None:
    """Idempotent registration of the ``lake_cdf`` streaming format."""
    spark.dataSource.register(LakeChangeFeedDataSource)


def mirror_stream(
    spark,
    src_table_path: str,
    dst_table,
    checkpoint_dir: str,
    *,
    transform=None,
    available_now: bool = True,
):
    """Exactly-once table→table CDC mirror as ONE Structured Streaming
    job: ``lake_cdf`` tails the source's change feed, each micro-batch
    re-emits the change rows as ordinary events (``_deleted`` → 'D',
    else 'U' — upsert semantics cover inserts; ``_seq`` carries over so
    the destination's LWW keeps source ordering even across replays) and
    applies them with the micro-batch id as the exactly-once token. The
    streaming counterpart of :func:`plans.feed.replicate` (which polls).
    ``transform`` filters/cleanses the event frame for partial replicas.
    Returns the started query; ``awaitTermination`` it."""
    from pyspark.sql import functions as F

    register_lake_cdf(spark)
    feed = (
        spark.readStream.format("lake_cdf")
        .option("path", src_table_path)
        .load()
    )

    def _on_batch(df, batch_id: int) -> None:
        events = df.select(
            F.when(F.col(DELETED_COL), "D").otherwise("U").alias("op"),
            F.col(SEQ_COL).alias("seq"),
            *[
                c
                for c in df.columns
                if c not in (SEQ_COL, DELETED_COL, VERSION_COL)
            ],
        )
        if transform is not None:
            events = transform(events)
        dst_table.apply_changes(
            events, batch_id=batch_id, source=f"mirror:{src_table_path}"
        )

    writer = feed.writeStream.foreachBatch(_on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
