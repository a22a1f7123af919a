"""Canonical schemas + schema-evolution rules.

The target table is the transcripts table mandated by the input hint
(``BASELINE.json``): ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)``. The change-event schema is the
binlog row shape: the reference's re-runnable one-JSON-per-pointer export
(``convert_cdm_to_mods.py:142-148`` wipe-and-redo) becomes an ordered
insert/update/delete event stream with a monotone sequence number (LSN).

Schema evolution re-founds the reference's dynamic per-collection field
dictionary (``convert_cdm_to_mods.py:84-102`` — unknown fields are simply
projected through a dict): unseen event columns are added to the target as
nullable, and numeric types widen (int→long, float→double) instead of
erroring.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical transcript row (the lake table's user-visible schema).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

KEY_COLS = ("conv_id", "turn_idx")

# Change-event (binlog) row. ``ts_raw`` is the messy source timestamp string
# — canonicalized by the transform chain (the dateCreatedSplit.xsl analog).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("seq", T.LongType(), False),  # event sequence / LSN
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts_raw", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)

# Hidden bookkeeping columns stored in the lake table but never shown to
# readers. ``_seq`` enables the cross-batch MERGE guard
# (apply change only when source.seq > target._seq); ``_deleted`` keeps
# tombstones so a late, lower-seq update cannot resurrect a deleted key.
SEQ_COL = "_seq"
DELETED_COL = "_deleted"
HIDDEN_COLS = (SEQ_COL, DELETED_COL)

# ---------------------------------------------------------------------------
# Type widening lattice (schema evolution). Only safe widenings allowed;
# anything else is a hard error, mirroring the reference's strict XSD gate
# (convert_cdm_to_mods.py:376-385).
_WIDENING: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("long", "integer"): T.LongType(),
    ("short", "integer"): T.IntegerType(),
    ("integer", "short"): T.IntegerType(),
    ("short", "long"): T.LongType(),
    ("long", "short"): T.LongType(),
    ("float", "double"): T.DoubleType(),
    ("double", "float"): T.DoubleType(),
    ("integer", "double"): T.DoubleType(),
    ("double", "integer"): T.DoubleType(),
    ("long", "double"): T.DoubleType(),
    ("double", "long"): T.DoubleType(),
    ("date", "timestamp"): T.TimestampType(),
    ("timestamp", "date"): T.TimestampType(),
}


class SchemaEvolutionError(ValueError):
    pass


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common widened type of two column types."""
    if a == b:
        return a
    widened = _WIDENING.get((a.typeName(), b.typeName()))
    if widened is None:
        raise SchemaEvolutionError(
            f"incompatible schema change: {a.simpleString()} vs {b.simpleString()}"
        )
    return widened


def evolve_schema(target: T.StructType, batch: T.StructType) -> T.StructType:
    """Merge a change-batch schema into the target schema.

    Target column order is preserved; brand-new batch columns append at the
    end as nullable (reference precedent: unmapped nicks are additive config,
    convert_cdm_to_mods.py:84-102). Common columns widen per ``widen_type``.
    """
    by_name = {f.name: f for f in batch.fields}
    out: list[T.StructField] = []
    for f in target.fields:
        bf = by_name.pop(f.name, None)
        if bf is None:
            out.append(f)
        else:
            out.append(T.StructField(f.name, widen_type(f.dataType, bf.dataType), f.nullable or bf.nullable))
    for name, bf in ((f.name, f) for f in batch.fields if f.name in by_name):
        out.append(T.StructField(name, bf.dataType, True))  # new cols: nullable
    return T.StructType(out)


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(s))
