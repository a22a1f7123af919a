"""Transform-chain configuration — the ``alias_xslts`` analog.

The reference sequences per-collection transforms as an ordered list of
stylesheet names (alias_xslts/{alias}.txt, executed one directory-pass per
stylesheet, convert_cdm_to_mods.py:338-373). Here a chain is an ordered
list of ``(column, Column -> Column)`` steps composed into ONE select —
Catalyst fuses the whole chain into a single whole-stage-codegen pass (plus
one ArrowEvalPython node for the pandas-UDF date cascade), so nothing
materializes between stages.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from .dates import canonicalize_ts_arrow
from .remap import remap_role, remap_tool
from .text import normalize_text

Step = tuple[str, Callable[[Column], Column]]

# The default transcript chain (the 'collection config' for conversations):
# normalize text, remap role/tool to the authorized vocabulary, canonicalize
# the raw timestamp into the typed ``ts`` column.
DEFAULT_CHAIN: list[Step] = [
    ("text", normalize_text),
    ("role", remap_role),
    ("tool", remap_tool),
]


def apply_chain(df: DataFrame, chain: list[Step] | None = None, *, ts_from: str = "ts_raw") -> DataFrame:
    """Apply an ordered transform chain; derive ``ts`` from ``ts_from`` if
    present. All steps land in one projection."""
    chain = DEFAULT_CHAIN if chain is None else chain
    cols: dict[str, Column] = {}
    for name, fn in chain:
        if name in df.columns:
            src = cols.get(name, F.col(name))
            cols[name] = fn(src)
    out = df.withColumns(cols)
    if ts_from in df.columns:
        # The replay chain keeps the cascade fully Python-side in ONE UDF
        # node: the JVM-hybrid's extra work (mask + guarded parse on top of
        # the retained UDF node) measured ~18% apply-throughput LOSS on the
        # mixed messy stream at local[32] (473k -> 388k ev/s, 16M events);
        # dates.with_canonical_ts remains the right tool for regular-shaped
        # columns scanned at LOW parallelism (~3x on f7). Within the UDF,
        # the arrow-compute cascade replaced the pandas one: value-equal
        # (parity + divergence-zero pinned in tests), 2.7x faster
        # single-thread (254k vs 95k rows/s on the mixed corpus) — at
        # 32-wide saturation the wall is flat best-of but the freed Python
        # CPU lowers the mean, and the low-parallelism levels of the
        # scaling protocol keep the full 2.7x.
        out = out.withColumn(
            "ts", canonicalize_ts_arrow(F.col(ts_from))
        ).drop(ts_from)
    return out
