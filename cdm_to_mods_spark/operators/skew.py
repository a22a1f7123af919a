"""Explicit skew-handling operators — salting, made first-class.

The engine's hot paths are skew-tolerant by construction: the dedup MERGE
is a partial-aggregating ``max_by`` (map-side combine collapses a hot
conversation's events before the shuffle, operators/dedup.py), and AQE
skew-join splitting covers runtime surprises. These helpers cover the
remaining cases where neither applies, as the north star's "explicit
salting of hot conversation keys" spelled out:

* a shuffle JOIN whose probe side concentrates on few keys and whose
  build side is too large to broadcast → :func:`salted_join`;
* an aggregation whose per-key STATE grows with group size (distinct
  sets, collect_list) so map-side combine cannot bound the hot key →
  :func:`salted_distinct_count`.

Salts are deterministic (hash of the row's other columns, never ``rand``)
so retries, speculative tasks and replays stay idempotent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _det_salt(df: DataFrame, exclude: Sequence[str], n_salt: int):
    """Deterministic per-row salt from the non-key columns (identical rows
    co-salt, which is fine — they still spread across n_salt buckets as a
    population). Falls back to the key columns when nothing else exists.

    Determinism is load-bearing: a task retry must re-derive the SAME
    salt or shuffled rows could duplicate/vanish — which rules out
    random or row-position salts. The trade: when the non-key columns
    are LOW-CARDINALITY (a constant or a boolean flag), the salt
    degenerates to few values and the hot key stays on few reducers
    while dim still pays n_salt replication; pre-derive a
    higher-cardinality column (e.g. a stable row id from the source)
    before salting such shapes."""
    cols = [c for c in df.columns if c not in exclude] or list(df.columns)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast("int")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    *,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a skewed ``facts`` side: facts scatter across
    ``n_salt`` sub-partitions per key via a deterministic salt, and each
    ``dim`` row is replicated once per salt value, so a hot key's rows
    land on ``n_salt`` reducers instead of one. Replication cost is
    O(|dim| × n_salt) — use when ``dim`` is too big to broadcast but far
    smaller than the fact side. Result is row-identical to the unsalted
    join (tested).

    Only fact-preserving join types are accepted: a join that emits
    UNMATCHED dim rows (right/full outer) would surface each unmatched
    dim row once PER SALT REPLICA — n_salt phantom null-extended rows —
    and even a matched dim key would emit its unmatched replicas. Those
    shapes need a different strategy (swap the sides, or AQE skew-join)."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti",
                   "semi", "anti"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: dim rows are "
            "replicated n_salt times, so join types emitting unmatched "
            "dim rows would duplicate them"
        )
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.withColumn("_salt", _det_salt(facts, keys, n_salt))
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_salt - 1).cast("int"))),
    )
    return f.join(d, keys + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    n_salt: int = 16,
    alias: str = "n_distinct",
) -> DataFrame:
    """Two-phase distinct count for hot groups: phase 1 dedups
    ``(keys, salt(value), value)`` — each hot key's distinct-set state is
    split across ``n_salt`` reducers — phase 2 sums the per-salt distinct
    counts. Exact (the salt partitions the VALUE space, so per-salt
    distinct sets are disjoint), unlike approx_count_distinct."""
    keys = list(keys)
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salt)).cast("int")
    phase1 = (
        df.select(*keys, F.col(value_col), salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(value_col).alias("_part"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_part").alias(alias))
