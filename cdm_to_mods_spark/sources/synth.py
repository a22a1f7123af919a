"""Deterministic synthetic change-log generator.

Replaces the reference's contentDM export (one JSON per pointer,
``convert_cdm_to_mods.py:121-139``) with a reproducible binlog of
insert/update/delete events over multi-turn transcripts. Everything is
derived from ``xxhash64(seq, salt)`` column expressions over
``spark.range`` — no driver-side data, no RNG state — so the same
(n_events, n_convs, seed) triple produces the identical log at any
parallelism and any scale (the generator itself distributes; generating
10^10 events is just ``spark.range(10**10)``).

The generated values are deliberately messy in exactly the ways the
reference's XSLT library cleans up:

* ``role`` / ``tool`` carry unauthorized variants ("AI", "human", "Bot "),
  the typeOfResource/languageTerm authorized-vocabulary analog
  (xsl/typeOfResource.xsl:18-51, xsl/multiNamePart.xsl:18-88).
* ``text`` carries ``<br>`` breaks, ``@@@`` quote placeholders, ragged
  whitespace and trailing semicolons (xsl/brToSemicolon.xsl:19-24,
  xsl/replaceAtSymbolsGlobal.xsl:18-20, xsl/removeSemicolon.xsl:18-22).
* ``ts_raw`` cycles through the date-shape families of
  xsl/normalizeDate.xsl:21-79 and xsl/dateCreatedSplit.xsl:24-46
  (ISO, MM/DD/YYYY, bare year, "ca. YYYY", bracketed).

Hot-key skew (one conversation holding a large share of events — the
reference's 1000-page compound objects, convert_cdm_to_mods.py:111-118)
is injectable via ``hot_frac``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Messy vocabularies the transform chain must normalize.
ROLE_VARIANTS = ["user", "assistant", "AI", "human", "Bot ", "system", " USER"]
TOOL_VARIANTS = ["", "search", "Search ", "calc", "CALCULATOR", "browser", "none"]

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
]


def _h(*cols, salt: int) -> F.Column:
    """Stable 64-bit hash of (salt, *cols) — the determinism primitive."""
    return F.xxhash64(F.lit(salt), *cols)


def _pick(arr: list[str], key: F.Column) -> F.Column:
    """Deterministically pick an element of a literal array by hash."""
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(key, F.lit(len(arr))) + 1).cast("int"))


def synth_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    *,
    seed: int = 42,
    max_turns: int = 20,
    hot_frac: float = 0.0,
    update_frac: float = 0.30,
    delete_frac: float = 0.10,
) -> DataFrame:
    """Build the deterministic event log as a DataFrame (lazy, distributed).

    ``seq`` is the global LSN (= range id). Ops are hash-assigned: first
    ~(1-update-delete) fraction are inserts, then updates/deletes on the
    same key space, so replay exercises last-write-wins, tombstones and
    no-op deletes.
    """
    df = spark.range(n_events).withColumnRenamed("id", "seq")
    hseed = seed * 1_000_003

    # --- key assignment, with optional hot conversation (conv 0).
    conv_hash = _h(F.col("seq"), salt=hseed + 1)
    base_conv = F.pmod(conv_hash, F.lit(n_convs))
    if hot_frac > 0:
        hot_sel = F.pmod(_h(F.col("seq"), salt=hseed + 2), F.lit(1000)) < int(hot_frac * 1000)
        conv_num = F.when(hot_sel, F.lit(0)).otherwise(base_conv)
    else:
        conv_num = base_conv
    turn = F.pmod(_h(F.col("seq"), salt=hseed + 3), F.lit(max_turns)).cast("int")

    # --- op mix.
    op_roll = F.pmod(_h(F.col("seq"), salt=hseed + 4), F.lit(1000))
    u_cut = int((1.0 - update_frac - delete_frac) * 1000)
    d_cut = int((1.0 - delete_frac) * 1000)
    op = (
        F.when(op_roll < u_cut, F.lit("I"))
        .when(op_roll < d_cut, F.lit("U"))
        .otherwise(F.lit("D"))
    )

    # --- messy payload fields.
    role = _pick(ROLE_VARIANTS, _h(F.col("seq"), salt=hseed + 5))
    tool = _pick(TOOL_VARIANTS, _h(F.col("seq"), salt=hseed + 6))

    w1 = _pick(_WORDS, _h(F.col("seq"), salt=hseed + 7))
    w2 = _pick(_WORDS, _h(F.col("seq"), salt=hseed + 8))
    w3 = _pick(_WORDS, _h(F.col("seq"), salt=hseed + 9))
    noise = F.pmod(_h(F.col("seq"), salt=hseed + 10), F.lit(5))
    text = F.concat_ws(" ", w1, w2, w3, F.col("seq").cast("string"))
    text = (
        F.when(noise == 0, F.concat(w1, F.lit("<br>"), w2, F.lit(" @@@"), w3, F.lit("@@@")))
        .when(noise == 1, F.concat(F.lit("  "), text, F.lit(" ;")))
        .when(noise == 2, F.concat(text, F.lit("   "), w1, F.lit(".")))
        .otherwise(text)
    )

    # --- messy timestamp string: 5 shape families keyed by hash.
    day = F.pmod(_h(F.col("seq"), salt=hseed + 11), F.lit(28)) + 1
    month = F.pmod(_h(F.col("seq"), salt=hseed + 12), F.lit(12)) + 1
    year = F.pmod(_h(F.col("seq"), salt=hseed + 13), F.lit(30)) + 1995
    shape = F.pmod(_h(F.col("seq"), salt=hseed + 14), F.lit(5))
    iso = F.format_string("%04d-%02d-%02d", year, month, day)
    ts_raw = (
        F.when(shape == 0, iso)
        .when(shape == 1, F.format_string("%02d/%02d/%04d", month, day, year))
        .when(shape == 2, F.format_string("%04d-%02d-%02d 12:30:45", year, month, day))
        .when(shape == 3, F.format_string("ca. %04d", year))
        .otherwise(F.format_string("[%04d-%02d]", year, month))
    )

    ingest_ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=F.col("seq").cast("double") / F.lit(1000.0)
    )

    return df.select(
        op.alias("op"),
        F.col("seq"),
        F.concat(F.lit("conv-"), F.format_string("%08d", conv_num)).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts_raw.alias("ts_raw"),
        ingest_ts.alias("ingest_ts"),
    )


def write_event_batches(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_convs: int,
    n_batches: int,
    files_per_batch: int | None = None,
    **kwargs,
) -> list[str]:
    """Materialize the log as ``n_batches`` parquet sub-dirs (contiguous seq
    ranges) — the file-source shape the streaming tail consumes, standing in
    for binlog segments.

    ``files_per_batch`` controls the segment's file count, which IS the
    apply's map-stage parallelism: these files are small (single row-group),
    so a scan cannot split below file granularity, and a segment written
    with fewer files than the cluster has cores caps the scan/dedup/Arrow
    stage at that width no matter how wide the reduce side runs (measured
    on this box: 8-file segments held the whole apply's map stage at
    parallelism 8 under local[32], capping map-side scaling). Benchmarks
    pass the consumer's core count — a real binlog shipper likewise sizes
    segment files to the consumer's task width. ``None`` keeps the
    generator plan's own partitioning (small tests, and the streaming-tail
    tests whose micro-batch boundaries are file-count sensitive).
    """
    df = synth_events(spark, n_events, n_convs, **kwargs)
    per = (n_events + n_batches - 1) // n_batches
    paths = []
    for b in range(n_batches):
        lo, hi = b * per, min((b + 1) * per, n_events)
        p = f"{out_dir}/batch-{b:05d}"
        seg = df.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        if files_per_batch:
            seg = seg.repartition(files_per_batch)
        seg.write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths
