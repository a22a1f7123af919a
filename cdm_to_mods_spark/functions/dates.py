"""Timestamp canonicalization (F7) — the date-cascade analog.

The reference's biggest transform family is date normalization:
MM/DD/YYYY → ISO with zero-padding (xsl/normalizeDate.xsl:21-79) plus a
~20-case regex cascade for ranges / circa / decades / centuries / bracketed
inference (xsl/dateCreatedSplit.xsl:24-364), audited post-hoc by
``good_format_date`` (convert_cdm_to_mods.py:400-412).

Here the whole cascade is ONE vectorized pandas UDF (Arrow batches,
``pd.Series.str`` ops — no per-row Python, per the input hint): messy
string → canonical ``timestamp``. A parallel column of qualifiers
('approximate', 'inferred', 'questionable') mirrors the reference's MODS
``qualifier`` attributes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

_MONTH_PAD = r"0?(\d{1,2})"


def _canonical_date_str(s: pd.Series) -> pd.Series:
    """Vectorized regex cascade: messy date string → 'YYYY-MM-DD HH:MM:SS'
    (or NaN when unparseable). Mirrors the dateCreatedSplit case table.

    Each case's regex runs only on the rows every EARLIER case failed to
    match (``s`` is re-subset after each fill) — the cascade cost is the
    sum of shrinking remainders, not n_cases × n_rows."""
    s = s.astype("string").str.strip()
    out = pd.Series(pd.NA, index=s.index, dtype="string")
    # Drop nulls up front: pandas str.extract pays near-full regex cost on
    # <NA> rows, and the hybrid fast path feeds this cascade a mostly-null
    # residue — after this subset every extract below runs only on rows
    # that can still match (empty series when the JVM path handled all).
    s = s[s.notna()]
    if s.empty:
        return out

    def fill(mask: pd.Series, values: pd.Series) -> None:
        nonlocal s
        todo = mask.fillna(False)
        out[s.index[todo]] = values[todo]
        s = s[~todo]

    # 1. ISO datetime: YYYY-MM-DD[ HH:MM[:SS]] — seconds restricted to
    # [0-5]\d: strptime's %S tolerates leap-seconds (60/61) and ROLLS
    # them over (07:19:61 → 07:20:01) where the JVM and arrow paths null;
    # unclaimed here means NaT, matching them (differential-fuzz find)
    m = s.str.extract(r"^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::([0-5]\d))?$")
    fill(
        m[0].notna(),
        m[0] + "-" + m[1] + "-" + m[2] + " " + m[3] + ":" + m[4] + ":" + m[5].fillna("00"),
    )
    # 2. ISO date: YYYY-MM-DD
    m = s.str.extract(r"^(\d{4})-(\d{2})-(\d{2})$")
    fill(m[0].notna(), m[0] + "-" + m[1] + "-" + m[2] + " 00:00:00")
    # 3. US date, optionally 1-digit month/day: M/D/YYYY[ H:M[:S]]
    m = s.str.extract(
        rf"^{_MONTH_PAD}/{_MONTH_PAD}/(\d{{4}})(?:\s+(\d{{1,2}}):(\d{{2}})(?::([0-5]\d))?)?$"
    )
    fill(
        m[0].notna(),
        m[2]
        + "-" + m[0].str.zfill(2)
        + "-" + m[1].str.zfill(2)
        + " " + m[3].fillna("0").str.zfill(2)
        + ":" + m[4].fillna("00")
        + ":" + m[5].fillna("00"),
    )
    # 4. ISO year-month: YYYY-MM
    m = s.str.extract(r"^(\d{4})-(\d{2})$")
    fill(m[0].notna(), m[0] + "-" + m[1] + "-01 00:00:00")
    # 5. bracketed inference: [YYYY] / [YYYY-MM] / [YYYY-MM-DD]
    m = s.str.extract(r"^\[(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?\]$")
    fill(m[0].notna(), m[0] + "-" + m[1].fillna("01") + "-" + m[2].fillna("01") + " 00:00:00")
    # 6. circa: ca./Ca./circa YYYY
    m = s.str.extract(r"(?i)^(?:ca\.?|circa)\s*(\d{4})$")
    fill(m[0].notna(), m[0] + "-01-01 00:00:00")
    # 7. questionable: YYYY?
    m = s.str.extract(r"^(\d{4})\?$")
    fill(m[0].notna(), m[0] + "-01-01 00:00:00")
    # 8. range: YYYY-YYYY or 'between YYYY and YYYY' → start point
    m = s.str.extract(r"(?i)^(?:between\s+)?(\d{4})(?:\s*-\s*|\s+and\s+)(\d{4})$")
    fill(m[0].notna(), m[0] + "-01-01 00:00:00")
    # 9. decade: 1930s or 193-
    m = s.str.extract(r"^(\d{3})(?:0s|-)$")
    fill(m[0].notna(), m[0] + "0-01-01 00:00:00")
    # 10. bare year
    m = s.str.extract(r"^(\d{4})$")
    fill(m[0].notna(), m[0] + "-01-01 00:00:00")
    return out


@F.pandas_udf(T.TimestampType())
def canonicalize_ts(s: pd.Series) -> pd.Series:
    """Messy timestamp string → canonical timestamp (UTC-naive)."""
    canon = _canonical_date_str(s)
    return pd.to_datetime(canon, format="%Y-%m-%d %H:%M:%S", errors="coerce")


def _canonicalize_ts_arrow_array(arr):
    """The same 10-case cascade over a ``pyarrow`` array — RE2 regexes
    (``pc.extract_regex``) + native ``strptime``, no pandas object-dtype
    string ops. Every case's pattern is full-string-anchored and pairwise
    DISJOINT with the others (pinned by the parity test over the full case
    table), so order-independent ``coalesce`` over full-array matches is
    value-equal to the pandas cascade's shrinking-remainder subsets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.utf8_trim_whitespace(arr.cast(pa.string()))
    nulls = pa.nulls(len(s), pa.string())

    def g(m, name, default=None):
        f = pc.struct_field(m, name)
        if default is not None:
            f = pc.if_else(pc.equal(f, ""), pa.scalar(default), f)
        return f

    def case(pattern, compose):
        m = pc.extract_regex(s, pattern)
        return pc.if_else(pc.is_valid(m), compose(m), nulls)

    def join(*parts):
        return pc.binary_join_element_wise(*parts, "")

    z2 = lambda a: pc.utf8_lpad(a, 2, "0")  # noqa: E731

    cases = [
        # 1. ISO datetime
        case(
            r"^(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})[ T]"
            r"(?P<h>\d{2}):(?P<mi>\d{2})(?::(?P<s>\d{2}))?$",
            lambda m: join(g(m, "y"), "-", g(m, "m"), "-", g(m, "d"), " ",
                           g(m, "h"), ":", g(m, "mi"), ":", g(m, "s", "00")),
        ),
        # 2. ISO date
        case(
            r"^(?P<y>\d{4})-(?P<m>\d{2})-(?P<d>\d{2})$",
            lambda m: join(g(m, "y"), "-", g(m, "m"), "-", g(m, "d"),
                           " 00:00:00"),
        ),
        # 3. US M/D/YYYY [H:MM[:SS]]
        case(
            r"^0?(?P<m>\d{1,2})/0?(?P<d>\d{1,2})/(?P<y>\d{4})"
            r"(?:\s+(?P<h>\d{1,2}):(?P<mi>\d{2})(?::(?P<s>\d{2}))?)?$",
            lambda m: join(g(m, "y"), "-", z2(g(m, "m")), "-", z2(g(m, "d")),
                           " ", z2(g(m, "h", "0")), ":", g(m, "mi", "00"),
                           ":", g(m, "s", "00")),
        ),
        # 4. ISO year-month
        case(
            r"^(?P<y>\d{4})-(?P<m>\d{2})$",
            lambda m: join(g(m, "y"), "-", g(m, "m"), "-01 00:00:00"),
        ),
        # 5. bracketed inference
        case(
            r"^\[(?P<y>\d{4})(?:-(?P<m>\d{2}))?(?:-(?P<d>\d{2}))?\]$",
            lambda m: join(g(m, "y"), "-", g(m, "m", "01"), "-",
                           g(m, "d", "01"), " 00:00:00"),
        ),
        # 6. circa
        case(
            r"(?i)^(?:ca\.?|circa)\s*(?P<y>\d{4})$",
            lambda m: join(g(m, "y"), "-01-01 00:00:00"),
        ),
        # 7. questionable
        case(
            r"^(?P<y>\d{4})\?$",
            lambda m: join(g(m, "y"), "-01-01 00:00:00"),
        ),
        # 8. range → start point
        case(
            r"(?i)^(?:between\s+)?(?P<a>\d{4})(?:\s*-\s*|\s+and\s+)(?P<b>\d{4})$",
            lambda m: join(g(m, "a"), "-01-01 00:00:00"),
        ),
        # 9. decade
        case(
            r"^(?P<p>\d{3})(?:0s|-)$",
            lambda m: join(g(m, "p"), "0-01-01 00:00:00"),
        ),
        # 10. bare year
        case(
            r"^(?P<y>\d{4})$",
            lambda m: join(g(m, "y"), "-01-01 00:00:00"),
        ),
    ]
    out = cases[0]
    for c in cases[1:]:
        out = pc.coalesce(out, c)
    fmt = "%Y-%m-%d %H:%M:%S"
    ts = pc.strptime(out, format=fmt, unit="us", error_is_null=True)
    # Parity with pandas to_datetime(errors="coerce") needs two extra
    # guards: (a) arrow strptime ROLLS OVER impossible dates (2001-02-30 →
    # 2001-03-02) where pandas nulls — a strftime round-trip catches every
    # rollover; (b) pandas silently nulls anything outside the
    # datetime64[ns] range (±[1677-09-21, 2262-04-11]) — clamp to it, both
    # for parity and so to_pandas() can't overflow.
    # (strftime on a us-unit timestamp prints %S with subseconds — round-
    # trip at second precision; the cascade never composes subseconds)
    rt = pc.strftime(pc.cast(ts, pa.timestamp("s")), format=fmt)
    ts = pc.if_else(pc.equal(rt, out), ts, pa.nulls(len(s), ts.type))
    lo = pa.scalar(pd.Timestamp.min.ceil("us"), type=ts.type)
    hi = pa.scalar(pd.Timestamp.max.floor("us"), type=ts.type)
    in_range = pc.and_(pc.greater_equal(ts, lo), pc.less_equal(ts, hi))
    return pc.if_else(in_range, ts, pa.nulls(len(s), ts.type))


@F.pandas_udf(T.TimestampType())
def canonicalize_ts_arrow(s: pd.Series) -> pd.Series:
    """Arrow-compute formulation of :func:`canonicalize_ts` — value-equal
    (parity pinned in tests/test_transforms.py), faster on wide replay
    stages because the regex cascade runs in RE2 over arrow buffers
    instead of Python ``re`` over object-dtype pandas strings."""
    import pyarrow as pa

    return _canonicalize_ts_arrow_array(
        pa.Array.from_pandas(s)
    ).to_pandas()


def canonicalize_ts_col(c: Column) -> Column:
    """Hybrid date cascade: the regular shapes (ISO datetime/date, US
    M/d/yyyy with optional time, year-month, bare year — in practice ~all
    of a real change stream) parse JVM-side inside whole-stage codegen via
    rlike-guarded ``try_to_timestamp``; ONLY the residue (circa / brackets
    / ranges / decades) reaches the Arrow-batched pandas cascade, and the
    UDF's input is masked to null for fast-path rows so the Python worker
    does no regex work (and near-zero Arrow decode) on them.

    Semantics are identical to :func:`canonicalize_ts` on every shape both
    paths claim: the rlike guards mirror the cascade's case regexes, and a
    guard-matched string that fails strict parsing (e.g. month 13) yields
    null on both paths (``try_to_timestamp`` null == pandas coerce NaT).
    Parity is pinned in tests/test_transforms.py over the full case table.
    """
    s = F.trim(c.cast("string"))
    t_sep = F.translate(s, "T", " ")
    mask = F.translate(t_sep, "0123456789", "##########")
    handled, fast = _mask_dispatch(s, t_sep, mask)
    residue = F.when(handled, F.lit(None).cast("string")).otherwise(s)
    return _clamp_pandas_range(
        F.when(handled, fast).otherwise(canonicalize_ts(residue))
    )


def _clamp_pandas_range(ts: Column) -> Column:
    """Null timestamps outside pandas' ``datetime64[ns]`` range — the
    semantics ALL cascade forms share: the pandas UDF coerces
    out-of-range years to NaT (``pd.Timestamp.min``/``max`` bound the ns
    epoch), the Arrow cascade clamps to it explicitly for parity, and a
    pandas UDF physically cannot return a wider value over Arrow anyway
    (datetime64[ns] serialization). The JVM fast paths CAN parse
    year-6810 strings, so without this gate the hybrid forms diverge
    from the residue path on exactly the garbage years the clamp is the
    data-quality gate for (found by differential fuzz; pinned in
    tests/test_transforms.py)."""
    lo = F.lit("1677-09-21 00:12:43.145225").cast("timestamp")
    hi = F.lit("2262-04-11 23:47:16.854775").cast("timestamp")
    return F.when((ts >= lo) & (ts <= hi), ts)


def _mask_dispatch(s: Column, t_sep: Column, mask: Column):
    """(handled, fast) for the given prepared columns.

    Shape dispatch is fully regex-free: the digit→'#' translate mask makes
    every guard a plain string equality / small-set membership. Each
    claimed row then evaluates exactly ONE try_to_timestamp whose pattern
    is shape-compatible — a looser guard + coalesce of formats makes the
    JVM parser throw-and-swallow per non-matching format per row (measured
    ~3s/600k rows of pure exception overhead), and per-format rlike guards
    pay ~8 regex evals/row (~0.4s each/600k on this box).

    The US family enumerates exact single-space mask shapes (hash-set
    membership). Multi-space / exotic-whitespace variants simply stay
    UNCLAIMED and flow to the pandas cascade, which handles them — falling
    through is always safe; only claiming a row the cascade would value
    differently is not."""
    iso_dt_s = mask == "####-##-## ##:##:##"
    iso_dt_m = mask == "####-##-## ##:##"
    iso_d = mask == "####-##-##"
    iso_ym = mask == "####-##"
    year = mask == "####"
    _us_dates = [f"{m}/{d}/####" for m in ("#", "##") for d in ("#", "##")]
    us_d = mask.isin(_us_dates)
    us_m = mask.isin([f"{b} {h}:##" for b in _us_dates for h in ("#", "##")])
    us_s = mask.isin([f"{b} {h}:##:##" for b in _us_dates for h in ("#", "##")])
    fast = (
        F.when(iso_dt_s, F.try_to_timestamp(t_sep, F.lit("yyyy-MM-dd HH:mm:ss")))
        .when(iso_dt_m, F.try_to_timestamp(t_sep, F.lit("yyyy-MM-dd HH:mm")))
        .when(iso_d, F.try_to_timestamp(t_sep, F.lit("yyyy-MM-dd")))
        .when(iso_ym, F.try_to_timestamp(F.concat(t_sep, F.lit("-01")), F.lit("yyyy-MM-dd")))
        .when(year, F.try_to_timestamp(F.concat(t_sep, F.lit("-01-01")), F.lit("yyyy-MM-dd")))
        .when(us_s, F.try_to_timestamp(s, F.lit("M/d/yyyy H:mm:ss")))
        .when(us_m, F.try_to_timestamp(s, F.lit("M/d/yyyy H:mm")))
        .when(us_d, F.try_to_timestamp(s, F.lit("M/d/yyyy")))
    )
    handled = iso_dt_s | iso_dt_m | iso_d | iso_ym | year | us_s | us_m | us_d
    return handled, fast


def _mask_dispatch_ext(q: Column, mq: Column):
    """(handled, fast) for the cascade's long-tail families — circa,
    bracketed inference, questionable, ranges, decades — matched on the
    whitespace-squeezed, lowercased digit mask ``mq`` and extracted from
    the squeezed string ``q`` by POSITION (every claimed mask pins its
    year/month/day offsets), so the whole tail is regex-free string
    slicing + one shape-compatible try_to_timestamp per row.

    Parity contract (pinned over the full case table in
    tests/test_transforms.py): each claim is value-equal to the pandas
    cascade's case for that family; inputs neither claims (exotic
    spacing the squeeze can't canonicalize, 3-digit zero-padded US
    months, a capital T inside a word) stay unclaimed and flow to the
    pandas residue, which remains authoritative."""
    y4 = lambda col: F.try_to_timestamp(  # noqa: E731 — year → Jan 1
        F.concat(col, F.lit("-01-01")), F.lit("yyyy-MM-dd")
    )
    br_ymd = mq == "[####-##-##]"
    br_ym = mq == "[####-##]"
    br_y = mq == "[####]"
    circa = mq.isin(
        ["ca ####", "ca. ####", "ca.####", "ca####", "circa ####", "circa####"]
    )
    quest = mq == "####?"
    _dash = ["####-####", "#### -####", "####- ####", "#### - ####"]
    rng_plain = mq.isin(_dash + ["#### and ####"])
    rng_btw = mq.isin(["between " + m for m in _dash + ["#### and ####"]])
    dec = ((mq == "####s") & (F.substring(q, 4, 1) == "0")) | (mq == "###-")
    fast = (
        F.when(br_ymd, F.try_to_timestamp(F.substring(q, 2, 10), F.lit("yyyy-MM-dd")))
        .when(
            br_ym,
            F.try_to_timestamp(
                F.concat(F.substring(q, 2, 7), F.lit("-01")), F.lit("yyyy-MM-dd")
            ),
        )
        .when(br_y, y4(F.substring(q, 2, 4)))
        .when(circa, y4(F.substring(q, -4, 4)))
        .when(quest | rng_plain, y4(F.substring(q, 1, 4)))
        .when(rng_btw, y4(F.substring(q, 9, 4)))
        .when(dec, y4(F.concat(F.substring(q, 1, 3), F.lit("0"))))
    )
    handled = br_ymd | br_ym | br_y | circa | quest | rng_plain | rng_btw | dec
    return handled, fast


def with_canonical_ts(df, src_col: str, out_col: str = "ts", drop_src: bool = True):
    """DataFrame-level hybrid cascade: materializes the trimmed string,
    T-normalized form and digit mask as their own projection so each is
    computed ONCE per row. The single-Column form above repeats the mask
    inside every guard, and the repeats land in BOTH the ArrowEvalPython
    input projection and the output projection — codegen subexpression
    elimination does not span that node boundary (~20 extra translate
    evals/row in the replay chain, a measured ~10% apply-throughput loss).
    CollapseProject keeps the prep projection separate because the temp
    columns are referenced many times by non-cheap expressions."""
    d = (
        df.withColumn("__cts_s", F.trim(F.col(src_col).cast("string")))
        .withColumn("__cts_t", F.translate(F.col("__cts_s"), "T", " "))
        .withColumn(
            "__cts_m", F.translate(F.col("__cts_t"), "0123456789", "##########")
        )
    )
    s, t_sep, mask = F.col("__cts_s"), F.col("__cts_t"), F.col("__cts_m")
    handled, fast = _mask_dispatch(s, t_sep, mask)
    # squeezed forms for the long-tail families (circa/brackets/ranges/
    # decades), whose pandas cases are \s+/\s*-flexible and
    # case-insensitive: collapse whitespace runs, then lowercase the
    # digit mask. ISO shapes keep the UNsqueezed mask — their pandas
    # cases demand exactly one separator char, so claiming a squeezed
    # ISO form would parse strings the cascade rejects. Nulled for rows
    # the base dispatch already claimed: CaseWhen branches evaluate
    # lazily per row, so a regular-shaped column (the common case) never
    # pays the \s+ regexp — measured +1.6 s on the 600k-row f7 scan when
    # these were computed unconditionally.
    d = d.withColumn(
        "__cts_q",
        F.when(handled, F.lit(None).cast("string")).otherwise(
            F.regexp_replace(s, r"\s+", " ")
        ),
    ).withColumn(
        "__cts_mq",
        F.lower(F.translate(F.col("__cts_q"), "0123456789", "##########")),
    )
    handled_ext, fast_ext = _mask_dispatch_ext(F.col("__cts_q"), F.col("__cts_mq"))
    claimed = handled | handled_ext
    residue = F.when(claimed, F.lit(None).cast("string")).otherwise(s)
    out = _clamp_pandas_range(
        F.when(handled, fast)
        .when(handled_ext, fast_ext)
        .otherwise(canonicalize_ts(residue))
    )
    d = d.withColumn(out_col, out).drop(
        "__cts_s", "__cts_t", "__cts_m", "__cts_q", "__cts_mq"
    )
    return d.drop(src_col) if drop_src and src_col != out_col else d


@F.pandas_udf(T.StringType())
def ts_qualifier(s: pd.Series) -> pd.Series:
    """MODS date-qualifier analog: approximate / inferred / questionable."""
    s = s.astype("string").str.strip()
    out = pd.Series(pd.NA, index=s.index, dtype="string")
    out[s.str.match(r"(?i)^(?:ca\.?|circa)\s*\d{4}$").fillna(False)] = "approximate"
    out[s.str.match(r"^\[.*\]$").fillna(False)] = "inferred"
    out[s.str.match(r"^\d{4}\?$").fillna(False)] = "questionable"
    return out


def audit_canonical_ts(c: Column) -> Column:
    """The ``good_format_date`` audit (convert_cdm_to_mods.py:400-412) as a
    native predicate: does the canonical string form match
    YYYY[-MM[-DD]]-with-time? Applied to the *output* of canonicalize_ts."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").rlike(
        r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"
    )
