"""Event-source connectors — the second-source-format capability (S6).

The reference runs the same logical pipeline over two source shapes: the
contentDM JSON export (convert_cdm_to_mods.py:121-139) and a 3-sheet XLSX
workbook (convert_xlsx_to_mods.py:24-60, utilities.py:15-64). Here the
engine's analog is a format-pluggable event source: parquet binlog
segments (the fast path), JSON-lines exports, and CSV-with-header sheets
all land on the one canonical ``EVENT_SCHEMA`` and feed the SAME replay /
streaming-tail code path — the connector is a reader config, never a
second pipeline.

All three formats work in both batch (``spark.read``) and Structured
Streaming (``spark.readStream``) because the schema is supplied
explicitly — no inference pass over the data (at 10^10 events an
inference scan is a full extra read, and streaming sources require a
schema anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import EVENT_SCHEMA

FORMATS = ("parquet", "json", "csv", "xlsx", "debezium")


def read_events(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    streaming: bool = False,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
    min_seq: int | None = None,
) -> DataFrame:
    """Read a change-event directory in any supported format, batch or
    streaming, always at the explicit event schema.

    * ``parquet`` — binlog segments; columnar, footer stats, the scale path.
    * ``json`` — JSON-lines (one event object per line), the reference's
      one-JSON-per-pointer export shape.
    * ``csv`` — header row + typed columns, cast at read.
    ``min_seq`` drops events at ``seq <= min_seq`` — the snapshot-handoff
    filter for ``LakeTable.bootstrap``: on parquet binlogs it reaches the
    scan as a pushed footer predicate (whole already-reflected segments
    are skipped from their row-group stats, never read), on json/csv/xlsx
    it filters right after parse. The merge would converge without it
    (last-write-wins by seq); the filter is the scale path that avoids
    re-reading the log prefix.

    * ``xlsx`` — REAL workbook parsing (sources/xlsx.py: stdlib zip+XML,
      executor-side mapInPandas over the binaryFile source — the
      reference's 3-sheet connector, utilities.py:15-64), string cells
      cast to the event schema exactly like csv. Batch only: binaryFile
      has no streaming source; convert workbooks to a streamable format
      at the edge if they must feed the tail.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported event format {fmt!r}; one of {FORMATS}")
    if fmt == "debezium":
        # Debezium envelope JSON lines (sources/debezium.py) — the landed
        # form of a CDC bus topic; parses to EVENT_SCHEMA with pure
        # expressions, so it streams like any other format.
        from .debezium import read_debezium

        kw = {}
        if schema is not EVENT_SCHEMA:
            # caller supplied a target-shaped event schema (e.g. the SQL
            # COPY INTO router): the envelope payload is its non-op/seq
            # columns — without this the fixed transcript payload would
            # project the table's real columns away
            kw["payload_schema"] = T.StructType(
                [T.StructField(f.name, f.dataType, True)
                 for f in schema.fields if f.name not in ("op", "seq")]
            )
        return read_debezium(
            spark,
            path,
            streaming=streaming,
            max_files_per_trigger=max_files_per_trigger,
            min_seq=min_seq,
            **kw,
        )
    if fmt == "xlsx":
        if streaming:
            raise ValueError(
                "xlsx is a batch-only source (no binaryFile streaming); "
                "land workbooks as parquet/json/csv for the streaming tail"
            )
        from .xlsx import read_xlsx

        raw = read_xlsx(spark, path, columns=[f.name for f in schema.fields])
        df = raw.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        return df if min_seq is None else df.filter(F.col("seq") > min_seq)
    reader = (
        spark.readStream if streaming else spark.read
    ).schema(schema).option("recursiveFileLookup", "true")
    if streaming and max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "json":
        # optional-section pattern: parses write_events' full-microsecond
        # form AND fraction-less/offset-less third-party feeds
        df = reader.option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]"
        ).json(path)
    else:
        df = (
            reader.option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(path)
        )
    return df if min_seq is None else df.filter(F.col("seq") > min_seq)


def write_events(df: DataFrame, path: str, *, fmt: str = "parquet") -> None:
    """Write a change batch in any supported format (test/fixture helper;
    timestamps round-trip through ISO-8601 text for json/csv)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported event format {fmt!r}; one of {FORMATS}")
    if fmt == "xlsx":
        # driver-side fixture writer (one workbook) — the export SINKS
        # (sinks.py) are the distributed write path
        import os

        from .xlsx import write_xlsx

        os.makedirs(path, exist_ok=True)
        pdf = df.toPandas()
        for c in pdf.columns:
            pdf[c] = pdf[c].map(
                lambda v: None if v is None else str(v), na_action="ignore"
            )
        write_xlsx({"events": pdf}, os.path.join(path, "events.xlsx"))
        return
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        # microsecond format explicitly: Spark's default truncates to
        # milliseconds, silently breaking the documented round-trip
        w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)
    else:
        (
            w.option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(path)
        )
