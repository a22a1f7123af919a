"""Debezium-envelope CDC source adapter.

The reference ingests change batches as contentDM JSON exports (one JSON
object per record pointer, convert_cdm_to_mods.py:121-139). Real CDC
feeds overwhelmingly arrive as Debezium envelopes on a Kafka-like bus:

    {"before": {..row..} | null,
     "after":  {..row..} | null,
     "source": {"lsn": .., "pos": .., "ts_ms": .., "table": .., ..},
     "op": "c" | "r" | "u" | "d",
     "ts_ms": ..}

This module maps that envelope onto the engine's canonical
``EVENT_SCHEMA`` with pure Column expressions (``from_json`` + struct
field access — no Python in the row path, streaming-safe), so the SAME
replay / streaming-tail / MERGE machinery consumes a Debezium feed
unchanged: the connector is a parse step, never a second pipeline.

Semantics mapped:
* ``op``: ``c`` (create) and ``r`` (snapshot read) → ``I``; ``u`` → ``U``;
  ``d`` → ``D``. Anything else fails the job (strict, like the
  reference's XSD gate) — a CDC feed with unknown ops is corrupt.
* payload: ``after`` for I/U; ``before`` for D (Debezium deletes carry
  the pre-image; ``after`` is null).
* ``seq``: a total commit order for last-write-wins. Default
  ``coalesce(source.lsn, source.pos, envelope ts_ms)`` — Postgres LSN,
  MySQL binlog position, or the transaction timestamp, first present.
  Pass ``seq_expr`` for exotic connectors.
* ``ingest_ts``: envelope ``ts_ms`` (connector capture time).
* Kafka log-compaction tombstones (a *null value* following a ``d``
  envelope, emitted so compacted topics drop the key) are filtered out:
  they carry no payload and the ``d`` envelope already produced the
  delete event.
* A non-null value that does not parse as an envelope is corrupt input:
  ``on_corrupt="error"`` (default) fails the job with the offending
  line; ``"drop"`` skips it (counted nowhere — prefer the quarantine
  path on ``apply_changes`` if auditability matters).

Multi-table buses: one Debezium topic-set typically carries every table
of a database. ``include_table=True`` keeps ``source.table`` as a
``table`` discriminator column — exactly the shape
``streaming.router.MultiTableReplay`` fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import EVENT_SCHEMA

__all__ = [
    "DEBEZIUM_SOURCE_SCHEMA",
    "debezium_envelope_schema",
    "parse_debezium",
    "read_debezium",
    "to_debezium",
]

# Connector-metadata block. Only the fields the mapping uses are declared;
# from_json ignores extras and nulls absences, so one schema serves the
# Postgres (lsn), MySQL (pos), and generic (ts_ms only) connectors.
DEBEZIUM_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.LongType(), True),
    ]
)

# Row image carried in before/after: the transcripts payload — everything
# in EVENT_SCHEMA that is a table column, not envelope bookkeeping.
_ENVELOPE_COLS = {"op", "seq", "ingest_ts"}
_PAYLOAD_FIELDS = [f for f in EVENT_SCHEMA.fields if f.name not in _ENVELOPE_COLS]
DEBEZIUM_PAYLOAD_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in _PAYLOAD_FIELDS]
)


def debezium_envelope_schema(
    payload_schema: T.StructType = DEBEZIUM_PAYLOAD_SCHEMA,
) -> T.StructType:
    """Full envelope schema for ``from_json`` over a value column."""
    return T.StructType(
        [
            T.StructField("before", payload_schema, True),
            T.StructField("after", payload_schema, True),
            T.StructField("source", DEBEZIUM_SOURCE_SCHEMA, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    *,
    payload_schema: T.StructType = DEBEZIUM_PAYLOAD_SCHEMA,
    seq_expr: F.Column | None = None,
    include_table: bool = False,
    on_corrupt: str = "error",
    json_options: dict | None = None,
) -> DataFrame:
    """Parse a column of Debezium-envelope JSON strings to EVENT_SCHEMA.

    Works identically on batch and streaming frames (pure expressions).
    Column order and types match ``EVENT_SCHEMA`` exactly, plus a
    trailing ``table`` column when ``include_table=True``. A custom
    ``payload_schema`` reads feeds carrying more (or different) row
    columns — unknown-to-EVENT_SCHEMA columns ride along after the
    standard ones, where ``apply_changes`` schema evolution picks them
    up. ``json_options`` passes through to ``from_json`` (e.g. a
    ``timestampFormat`` matching the producer's).
    """
    if on_corrupt not in ("error", "drop"):
        raise ValueError(f"on_corrupt must be 'error' or 'drop', got {on_corrupt!r}")
    env_schema = debezium_envelope_schema(payload_schema)
    raw = F.col(value_col)
    env = F.from_json(raw, env_schema, json_options or {})
    # tombstone: null value (compaction marker, no payload) — always drop.
    # corrupt: non-null value that from_json could not parse. PERMISSIVE
    # parsing yields an all-null struct (not a null struct) for malformed
    # JSON, so "parsed to something with no op" is the corruption signal —
    # a real envelope always carries op (FAILFAST would also catch this,
    # but with a generic MALFORMED_RECORD error that loses the raw line).
    # empty/whitespace-only lines count as tombstones too: a text-format
    # landing of a Kafka topic renders a null-value compaction marker
    # (or a stray blank line) as '' — a NON-null empty string — which
    # would otherwise parse to an all-null struct and fail the whole
    # read as "corrupt" under on_corrupt='error'
    parsed = df.select(raw.alias("_raw"), env.alias("_env")).filter(
        F.col("_raw").isNotNull() & (F.trim(F.col("_raw")) != "")
    )
    corrupt = F.col("_env").isNull() | F.col("_env")["op"].isNull()
    if on_corrupt == "error":
        parsed = parsed.withColumn(
            "_env",
            F.when(
                corrupt,
                F.raise_error(
                    F.concat(F.lit("corrupt Debezium envelope: "), F.col("_raw"))
                ).cast(env_schema),
            ).otherwise(F.col("_env")),
        )
    else:
        parsed = parsed.filter(~corrupt)
    e = F.col("_env")
    op = F.when(e["op"].isin("c", "r"), F.lit("I")).when(
        e["op"] == "u", F.lit("U")
    ).when(e["op"] == "d", F.lit("D")).otherwise(
        F.raise_error(
            F.concat(F.lit("unknown Debezium op: "), F.coalesce(e["op"], F.lit("null")))
        )
    )
    if seq_expr is None:
        seq_expr = F.coalesce(e["source"]["lsn"], e["source"]["pos"], e["ts_ms"])
    image = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    cols = [
        op.alias("op"),
        seq_expr.cast("long").alias("seq"),
        *[
            image[f.name].cast(f.dataType).alias(f.name)
            for f in _payload_as_event_fields(payload_schema)
        ],
        F.timestamp_millis(e["ts_ms"]).alias("ingest_ts"),
    ]
    if include_table:
        cols.append(e["source"]["table"].alias("table"))
    return parsed.select(*cols)


def _payload_as_event_fields(payload_schema: T.StructType) -> list[T.StructField]:
    """EVENT_SCHEMA payload fields, in EVENT_SCHEMA order, restricted to the
    supplied payload schema (custom payloads may carry fewer/extra columns —
    extras keep their declared order after the standard ones)."""
    std = [f for f in _PAYLOAD_FIELDS if f.name in payload_schema.fieldNames()]
    extra = [f for f in payload_schema.fields if f.name not in EVENT_SCHEMA.fieldNames()]
    return std + extra


def read_debezium(
    spark: SparkSession,
    path: str,
    *,
    streaming: bool = False,
    max_files_per_trigger: int | None = None,
    payload_schema: T.StructType = DEBEZIUM_PAYLOAD_SCHEMA,
    seq_expr: F.Column | None = None,
    include_table: bool = False,
    on_corrupt: str = "error",
    min_seq: int | None = None,
) -> DataFrame:
    """Read a directory of Debezium-envelope JSON lines (the landed form
    of a Kafka topic) as EVENT_SCHEMA, batch or streaming.

    ``min_seq`` is the snapshot-handoff floor (see ``read_events``);
    envelopes are text lines so the filter runs after parse — landing the
    bus as parquet binlog segments is the scale path for deep replays.
    """
    reader = (spark.readStream if streaming else spark.read).format("text")
    if streaming and max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.option("recursiveFileLookup", "true").load(path)
    df = parse_debezium(
        raw,
        "value",
        payload_schema=payload_schema,
        seq_expr=seq_expr,
        include_table=include_table,
        on_corrupt=on_corrupt,
    )
    return df if min_seq is None else df.filter(F.col("seq") > min_seq)


def to_debezium(
    events: DataFrame,
    *,
    table: str = "transcripts",
    db: str = "cdm",
    table_col: str | None = None,
) -> DataFrame:
    """Render EVENT_SCHEMA rows as Debezium envelope JSON lines (column
    ``value``) — the fixture/export inverse of ``parse_debezium``.

    I → ``c`` with after; U → ``u`` with before=after=image (the engine's
    events carry one image; Debezium's pre-image adds nothing to LWW
    replay); D → ``d`` with before. ``seq`` → ``source.lsn``;
    ``ingest_ts`` → envelope ``ts_ms``. ``table_col`` names a column to
    use as ``source.table`` (multi-table fixtures); else the ``table``
    literal applies to every row.
    """
    payload_names = [f.name for f in _PAYLOAD_FIELDS if f.name in events.columns]
    image = F.struct(*[F.col(n) for n in payload_names])
    src_table = F.col(table_col) if table_col else F.lit(table)
    envelope = F.struct(
        # U carries before=after=image per the contract above — standard
        # Debezium u envelopes always ship a pre-image, and external
        # consumers key on it (before=null read as an incomplete feed)
        F.when(F.col("op") != "I", image).alias("before"),
        F.when(F.col("op") != "D", image).alias("after"),
        F.struct(
            F.col("seq").alias("lsn"),
            src_table.alias("table"),
            F.lit(db).alias("db"),
        ).alias("source"),
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
        .alias("op"),
        (F.unix_millis(F.col("ingest_ts"))).alias("ts_ms"),
    )
    return events.select(F.to_json(envelope).alias("value"))
