"""Z-order (Morton) clustering key for multi-dimension data skipping.

``compact(cluster_by=[a, b])`` sorts lexicographically: parquet row-group
min/max stats end up tight on ``a`` and useless on ``b`` (every row group
spans b's full range once a has enough distinct values). Z-ordering
interleaves the bits of per-column *rank bins*, so sorting by the single
z-value keeps row groups tight on EVERY clustered dimension at once — the
Delta ``OPTIMIZE … ZORDER BY`` / Iceberg ``sort-order z-order`` role. At
100 TB this is what turns "filter on ts AND user" from a full-bucket scan
into a handful of row groups per admitted bucket.

Reference parity: the reference has no layout optimization at all (its
output is one XML file per record, post_cdm_cleanup.py writes them in loop
order); z-order exists purely as engine-scale surface.

Design choices, each load-bearing at scale:

- **Rank bins, not value bins.** Each column is bucketed by quantile
  boundaries (computed once per compaction from a bounded sample), not by
  ``(v - min) / (max - min)`` equal-width slots — a single outlier or a
  Zipf key distribution would otherwise collapse every row into one bin
  and the z-value would degenerate to the other columns. This mirrors
  Delta's ``range_partition_id`` construction.
- **Order-preserving numeric proxies.** Numeric/timestamp/date/boolean
  columns cast to double; strings map through their first 6 UTF-8 bytes
  (hex, right-padded, base-16 → exact in a double's 53-bit mantissa), so
  the proxy compares like the leading bytes of the string. Equal strings
  share a bin, which is what equality pruning needs.
- **Pure Column expressions.** Binning is a fold over a literal boundary
  array (``F.aggregate``), interleaving is shift/mask arithmetic — the
  whole key is whole-stage-codegen JVM work; no Python touches rows.
- **Nulls first.** A null proxy bins to 0, clustering nulls together at
  the low corner of the curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

# 6 bytes = 48 bits: the widest string prefix whose base-16 value is still
# exact in a double (53-bit mantissa) — conv() returns a decimal string and
# the cast must not round, or two prefixes could swap order.
_STR_PREFIX_BYTES = 6


def numeric_proxy(name: str, dtype: T.DataType) -> Column:
    """Order-preserving double proxy for one column (see module doc)."""
    col = F.col(name)
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("double")  # epoch seconds, order-preserving
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dtype, T.StringType):
        # hex of the UTF-8 bytes, right-padded so short strings compare as
        # if zero-extended ("b" < "ba" byte order survives the pad), then
        # base-16 → decimal string → double (exact: 48 bits < 53).
        hx = F.rpad(F.hex(F.encode(col, "UTF-8")), _STR_PREFIX_BYTES * 2, "0")
        return F.conv(hx, 16, 10).cast("double")
    raise ValueError(
        f"z-order does not support column {name!r} of type {dtype.simpleString()}"
        " (orderable scalar types only)"
    )


def compute_boundaries(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 6,
    sample_fraction: float = 0.1,
    relative_error: float = 0.01,
    seed: int = 7,
) -> dict[str, list[float]]:
    """Quantile bin boundaries per column from ONE bounded-state pass.

    ``approxQuantile`` (Greenwald-Khanna) keeps O(1/relative_error) state
    per column regardless of input size; the optional row sample bounds
    how much of the upstream plan is computed to feed it. Constant columns
    collapse to an empty boundary list (every row bins to 0).
    """
    schema = dict(zip(df.schema.fieldNames(), [f.dataType for f in df.schema.fields]))
    proxies = df.select(
        *[numeric_proxy(c, schema[c]).alias(c) for c in cols]
    )
    if sample_fraction < 1.0:
        proxies = proxies.sample(fraction=sample_fraction, seed=seed)
    # SAME clamp as zvalue_expr (the two must agree, or bin indexes
    # overflow the interleave's per-column bit budget and scramble the
    # sort): the z-value must fit a signed long, so many cluster columns
    # trade bit depth per column
    if cols and bits * len(cols) > 63:
        bits = max(1, 63 // len(cols))
    bins = 1 << bits
    probs = [i / bins for i in range(1, bins)]
    quantiles = proxies.stat.approxQuantile(list(cols), probs, relative_error)
    out: dict[str, list[float]] = {}
    for c, qs in zip(cols, quantiles):
        # dedupe: repeated quantiles (skew / low cardinality / all-null
        # sample, where approxQuantile returns []) just mean fewer bins
        out[c] = sorted(set(qs))
    return out


def zvalue_expr(
    boundaries: dict[str, list[float]],
    schema: T.StructType,
    *,
    bits: int = 6,
) -> Column:
    """The interleaved z-value Column (long) for a row.

    Per column: bin = #boundaries ≤ proxy (a fold over the literal
    boundary array — O(2^bits) codegen comparisons per row, no shuffle,
    no Python). Then classic Morton interleave: bit i of column j lands
    at position ``i * ncols + j``.
    """
    cols = list(boundaries)
    # the interleave must fit a signed 64-bit long: bit positions reach
    # bits*ncols - 1, and position 63 is the SIGN (the top bins would
    # sort before the bottom ones), while >= 64 wraps (Java shift mod
    # 64) and, because interleaving uses addition, carries into
    # neighboring bits — an arithmetically scrambled key that reports
    # success while data skipping silently degrades. Degrade bit DEPTH
    # instead: fewer bins per column, still a correct Morton order.
    if cols and bits * len(cols) > 63:
        bits = max(1, 63 // len(cols))
    dtypes = {f.name: f.dataType for f in schema.fields}
    bin_exprs: list[Column] = []
    for c in cols:
        bnds = boundaries[c]
        if not bnds:
            bin_exprs.append(F.lit(0))
            continue
        proxy = numeric_proxy(c, dtypes[c])
        arr = F.array(*[F.lit(float(b)) for b in bnds])
        bin_exprs.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(proxy >= b, F.lit(1)).otherwise(F.lit(0)),
            )
        )
    ncols = len(cols)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bin_exprs):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long"),
                i * ncols + j,
            )
    return z
