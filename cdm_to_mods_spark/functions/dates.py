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

    def fill(mask: pd.Series, values: pd.Series) -> None:
        nonlocal s
        todo = mask.fillna(False)
        out[s.index[todo]] = values[todo]
        s = s[~todo]

    # 1. ISO datetime: YYYY-MM-DD[ HH:MM[:SS]]
    m = s.str.extract(r"^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::(\d{2}))?$")
    fill(
        m[0].notna(),
        m[0] + "-" + m[1] + "-" + m[2] + " " + m[3] + ":" + m[4] + ":" + m[5].fillna("00"),
    )
    # 2. ISO date: YYYY-MM-DD
    m = s.str.extract(r"^(\d{4})-(\d{2})-(\d{2})$")
    fill(m[0].notna(), m[0] + "-" + m[1] + "-" + m[2] + " 00:00:00")
    # 3. US date, optionally 1-digit month/day: M/D/YYYY[ H:M[:S]]
    m = s.str.extract(
        rf"^{_MONTH_PAD}/{_MONTH_PAD}/(\d{{4}})(?:\s+(\d{{1,2}}):(\d{{2}})(?::(\d{{2}}))?)?$"
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
