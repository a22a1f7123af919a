"""cdm_to_mods_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-founding of the capabilities of ``lsulibraries/cDM_to_mods``
(a keyed-record ingest/transform/validate pipeline) as an idiomatic Spark
engine: a change log (insert/update/delete events keyed by
``(conv_id, turn_idx)``) is tailed with Structured Streaming, deduplicated per
key via a window-over-event-sequence max, run through a vectorized
(Arrow/pandas-UDF + native Column) transform chain — the analog of the
reference's per-field XSLT library — and committed as idempotent MERGE
upserts into a snapshot-ledgered lake table with schema evolution and
exactly-once replay semantics.

Reference parity map lives in SURVEY.md §2; every public function cites the
reference behavior (file:line) it re-founds.
"""

__version__ = "0.1.0"
