"""Per-key dedup — last-write-wins over the event sequence (A7).

The reference's implicit rule: re-runs delete previous outputs and the
latest export wins (convert_cdm_to_mods.py:142-148); duplicate pointers are
detected and flagged (convert_cdm_to_mods.py:136-138,
post_cdm_cleanup.py:126-128).

Scale note: the hot path uses ``max_by`` hash aggregation, not a
``row_number`` window. A window must shuffle EVERY event for a key to one
partition and sort it, so a hot conversation key straggles; hash aggregation
gets map-side partial combine for free, so 10^8 updates to one key reduce to
one candidate row per map task before the shuffle — skew-tolerant without
salting. ``latest_per_key_window`` keeps the window formulation for the
query-inventory surface (W-family) and as a differential-test oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Keep only the highest-``seq`` row per key via partial-aggregating
    ``max_by`` (ties broken by op desc — 'U' > 'I' > 'D' lexically — then by
    the full payload struct, so output is deterministic under any
    partitioning)."""
    payload = [c for c in df.columns if c not in keys]
    rank = F.struct(
        F.col(seq_col),
        F.col("op") if "op" in df.columns else F.lit(0),
        *[F.col(c) for c in payload if c not in (seq_col, "op")],
    )
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*payload), rank).alias("_latest"))
        .select(*keys, "_latest.*")
    )


def latest_per_key_window(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Window formulation of :func:`latest_per_key` (same result set,
    including the full deterministic tie-break: seq, then op, then the
    payload columns — equal (seq, op) pairs are REAL in this engine
    because delete_where/update_where spend an LSN a source event may
    also use, and a differential oracle that picked an arbitrary
    partition-order row on those ties would flakily disagree with the
    max_by operator it verifies)."""
    payload = [c for c in df.columns if c not in keys]
    order = [F.col(seq_col).desc()]
    if "op" in df.columns:
        order.append(F.col("op").desc())
    order += [
        F.col(c).desc_nulls_last()
        for c in payload
        if c not in (seq_col, "op")
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
) -> DataFrame:
    """Keep only the LOWEST-``seq``-ranked row per key — the Paimon
    ``merge-engine=first-row`` rule (dedup-keep-first over an append
    stream: event logs where the first observation is authoritative and
    re-sends must not clobber it). First is defined by the SOURCE order
    (min ``seq``), not arrival order: arrival-order "first" cannot
    converge under redelivery or batch reordering, min-seq replays to the
    same state from any batching. Ties op-ranked ascending ('I' < 'U')
    then by payload, so output is deterministic under any partitioning.

    Same single ``min_by`` hash-aggregate shape as :func:`latest_per_key`
    — map-side partial combine absorbs hot keys; folds compose because
    min is associative (a stored first row re-enters later resolutions
    and keeps winning). Not retractable: callers refuse ``D`` events and
    the row-mutation surfaces up front."""
    payload = [c for c in df.columns if c not in keys]
    rank = F.struct(
        F.col(seq_col),
        F.col("op") if "op" in df.columns else F.lit(0),
        *[F.col(c) for c in payload if c not in (seq_col, "op")],
    )
    return (
        df.groupBy(*keys)
        .agg(F.min_by(F.struct(*payload), rank).alias("_first"))
        .select(*keys, "_first.*")
    )


def duplicate_keys(
    df: DataFrame, keys: Sequence[str] = ("conv_id", "turn_idx")
) -> DataFrame:
    """Audit: keys seen more than once (duplicate-pointer report,
    convert_cdm_to_mods.py:136-138). Partial aggregation (map-side combine)
    comes free from Catalyst's hash aggregate."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def resolve_partial_update(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
    op_col: str = "op",
    carry_cols: Sequence[str] = (),
    preserve_kill: bool = False,
) -> DataFrame:
    """One merged row per key under PARTIAL-UPDATE semantics (the Paimon
    ``merge-engine=partial-update`` rule, with deletes): events apply in
    ``(seq, op)`` order and a NULL column in an I/U event means "leave the
    column alone", so a CDC producer may send patches carrying only the
    columns that changed. Resolution per key:

    * ``d`` = highest-ranked D event (if any). A row is LIVE iff some I/U
      event outranks ``d`` (a later upsert re-creates the row from
      scratch — column values at or below ``d`` stay dead).
    * each payload column = the value from the highest-ranked I/U event
      that (a) outranks ``d`` and (b) carries the column non-null; no
      such event → NULL.
    * output ``seq`` = the winning rank's seq, ``op`` = 'U' for live rows
      and 'D' for dead ones (dead rows keep all-null payloads — the
      tombstone shape the lake stores).

    Rank is ``struct(seq, op)`` with the same lexical 'U' > 'I' > 'D'
    op-tie-break as :func:`latest_per_key`, so at a shared LSN an upsert
    beats the delete — partial and LWW tables agree on liveness ties.
    Per-column ties at an equal rank resolve to the max value
    (deterministic under any partitioning).

    ``carry_cols``: system columns (e.g. ``_bucket``) resolved
    whole-row-style — value from the overall max-ranked event, no
    null-skipping, present on tombstones too.

    ONE hash aggregate (map-side partial combine, skew-tolerant like
    ``latest_per_key``) — per column it keeps a single ``max`` of a
    ``struct(rank, value)``, never a per-key sort, so a 10^8-event hot
    key still reduces to one candidate per map task before the shuffle.

    ``preserve_kill``: when True (how the lake calls this at every fold /
    in-batch collapse), a key whose live row outranks a D ALSO re-emits
    that D as a tombstone row at the delete's rank, beside the merged
    live row. Collapsing the delete away would be a correctness bug, not
    a detail: a batch carrying ``D@5`` then ``U@8{role}`` must still kill
    a ``text`` column stored by an EARLIER batch at seq 3 — the preserved
    tombstone is what outranks that older stored row at the next
    resolution. At most one tombstone per key survives any fold (older
    ones collapse into the max-rank one), so storage stays O(keys).

    Exactness horizon (document once, here): resolution is exact over
    whatever rows it is GIVEN, and with ``preserve_kill`` the collapsed
    state carries its delete rank, so per-key IN-ORDER feeds (the
    binlog/WAL contract) replay exactly at any batch/fold boundary. What
    a collapse does lose is per-COLUMN write ranks: a fold of
    ``U@3{text} U@10{role}`` stores one row ranked 10, so an
    out-of-order D@5 arriving AFTER that fold can no longer selectively
    kill the seq-3 text (the same horizon Paimon's compaction applies).
    """
    skip = set(keys) | {seq_col, op_col} | set(carry_cols)
    payload = [c for c in df.columns if c not in skip]
    rank = F.struct(F.col(seq_col).alias("s"), F.col(op_col).alias("o"))
    is_del = F.col(op_col) == "D"
    aggs = [
        F.max(F.when(is_del, rank)).alias("_d"),
        F.max(F.when(~is_del, rank)).alias("_l"),
    ]
    for c in payload:
        aggs.append(
            F.max(
                F.when(
                    ~is_del & F.col(c).isNotNull(),
                    F.struct(rank.alias("r"), F.col(c).alias("v")),
                )
            ).alias(f"_pu_{c}")
        )
    for c in carry_cols:
        aggs.append(
            F.max(F.struct(rank.alias("r"), F.col(c).alias("v"))).alias(f"_pu_{c}")
        )
    g = df.groupBy(*keys).agg(*aggs)
    live = F.col("_l").isNotNull() & (
        F.col("_d").isNull() | (F.col("_l") > F.col("_d"))
    )
    best = F.greatest(F.col("_l"), F.col("_d"))  # greatest skips NULLs

    def _value(c):
        pu = F.col(f"_pu_{c}")
        return F.when(
            live & (F.col("_d").isNull() | (pu.getField("r") > F.col("_d"))),
            pu.getField("v"),
        )

    def _carry(c):
        return F.col(f"_pu_{c}").getField("v")

    if not preserve_kill:
        out = [F.col(k) for k in keys]
        out.append(
            F.when(live, F.lit("U")).otherwise(F.lit("D")).alias(op_col)
        )
        out.append(best.getField("s").alias(seq_col))
        out += [_value(c).alias(c) for c in payload]
        out += [_carry(c).alias(c) for c in carry_cols]
        return g.select(*out)

    live_elem = F.when(
        live,
        F.struct(
            F.lit("U").alias(op_col),
            F.col("_l").getField("s").alias(seq_col),
            *[_value(c).alias(c) for c in payload],
            *[_carry(c).alias(c) for c in carry_cols],
        ),
    )
    tomb_elem = F.when(
        F.col("_d").isNotNull(),
        F.struct(
            F.lit("D").alias(op_col),
            F.col("_d").getField("s").alias(seq_col),
            # typed NULL payloads (when(false, typed) keeps the column type)
            *[F.when(F.lit(False), _value(c)).alias(c) for c in payload],
            *[_carry(c).alias(c) for c in carry_cols],
        ),
    )
    rows = F.array_compact(F.array(live_elem, tomb_elem))
    return g.select(*keys, F.explode(rows).alias("_r")).select(*keys, "_r.*")


AGG_FNS = ("sum", "max", "min", "bool_or", "bool_and", "last", "first")


def resolve_aggregate(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    seq_col: str = "seq",
    op_col: str = "op",
    spec: dict | None = None,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """One rolled-up row per key under AGGREGATION semantics (the Paimon
    ``merge-engine=aggregation`` rule): each payload column combines every
    event's non-null value with its ``spec`` function — ``sum`` / ``max``
    / ``min`` / ``bool_or`` / ``bool_and`` / ``last`` (default; last
    non-null by ``(seq, op)`` rank, the partial-update column rule) /
    ``first``. Columns missing from ``spec`` default to ``last``.

    No deletes: aggregation is not retractable (a stored sum cannot
    subtract what a tombstone would undo), so callers refuse ``D`` events
    up front — Paimon's rule for non-retractable aggregate fields.

    Folds compose because every supported function is associative over
    its own output: a stored row holds partial aggregates and re-enters
    later resolutions as an ordinary contribution (``sum`` of sums,
    ``max`` of maxes, rank-carried ``last``/``first``). ``count`` is
    deliberately NOT offered — count-of-counts double-counts; send 1s
    and ``sum`` them. ``sum`` outputs cast back to the input column type
    (Spark widens int sums to long); keep counters as longs.

    ONE hash aggregate, same shape and skew tolerance as
    :func:`latest_per_key` / :func:`resolve_partial_update`.
    """
    spec = dict(spec or {})
    skip = set(keys) | {seq_col, op_col} | set(carry_cols)
    payload = [c for c in df.columns if c not in skip]
    for c, fn in spec.items():
        assert fn in AGG_FNS, f"unknown agg fn {fn!r} for {c!r}"
    rank = F.struct(F.col(seq_col).alias("s"), F.col(op_col).alias("o"))
    aggs = [F.max(rank).alias("_r")]
    for c in payload:
        fn = spec.get(c, "last")
        if fn == "last":
            e = F.max(
                F.when(F.col(c).isNotNull(), F.struct(rank.alias("r"), F.col(c).alias("v")))
            ).getField("v")
        elif fn == "first":
            e = F.min(
                F.when(F.col(c).isNotNull(), F.struct(rank.alias("r"), F.col(c).alias("v")))
            ).getField("v")
        elif fn == "sum":
            e = F.sum(c).cast(df.schema[c].dataType)
        elif fn == "bool_or":
            e = F.bool_or(c)
        elif fn == "bool_and":
            e = F.bool_and(c)
        else:  # max / min
            e = getattr(F, fn)(c)
        aggs.append(e.alias(c))
    for c in carry_cols:
        aggs.append(
            F.max(F.struct(rank.alias("r"), F.col(c).alias("v")))
            .getField("v")
            .alias(c)
        )
    g = df.groupBy(*keys).agg(*aggs)
    out = [F.col(k) for k in keys]
    out.append(F.lit("U").alias(op_col))
    out.append(F.col("_r").getField("s").alias(seq_col))
    out += [F.col(c) for c in payload]
    out += [F.col(c) for c in carry_cols]
    return g.select(*out)
