"""Dictionary normalization (F8) — free text → authorized vocabulary.

Re-founds the reference's authorized-term lookups — typeOfResource
(xsl/typeOfResource.xsl:18-51, case-insensitive match), language codes
(xsl/languageTerm.xsl:18-29), role→MARC-relator pairs
(xsl/multiNamePart.xsl:18-88) — as a literal ``create_map`` lookup: the map
is a constant folded into the plan (the broadcast-dict idiom), the lookup is
whole-stage-codegen'd, unmatched values fall through to a cleaned original
(the XSLT ``otherwise`` branch).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

# Authorized role vocabulary for transcripts (role/tool remapping per the
# north star). Keys are lower/trimmed.
ROLE_MAP = {
    "user": "user",
    "human": "user",
    "customer": "user",
    "assistant": "assistant",
    "ai": "assistant",
    "bot": "assistant",
    "agent": "assistant",
    "model": "assistant",
    "system": "system",
    "tool": "tool",
    "function": "tool",
}

TOOL_MAP = {
    "search": "search",
    "websearch": "search",
    "browser": "browser",
    "web": "browser",
    "calc": "calculator",
    "calculator": "calculator",
    "none": None,
    "": None,
}


def _lit_map(d: dict[str, str | None]) -> Column:
    pairs = list(chain(*((k, v) for k, v in d.items() if v is not None)))
    return F.create_map(*[F.lit(x) for x in pairs])


def remap(c: Column, mapping: dict[str, str | None], *, keep_unmatched: bool = True) -> Column:
    """Case-insensitive vocabulary remap with fallthrough.

    Keys mapping to ``None`` normalize to NULL (sentinel scrub). Unmatched
    values keep their cleaned (trimmed, lowered) form when
    ``keep_unmatched``, else NULL — mirroring the XSLT choose/otherwise.
    """
    key = F.lower(F.trim(c))
    nulls = [k for k, v in mapping.items() if v is None]
    hit = _lit_map(mapping)[key]
    fallback = key if keep_unmatched else F.lit(None)
    out = F.coalesce(hit, fallback)
    if nulls:
        out = F.when(key.isin(*nulls) | key.isNull(), F.lit(None)).otherwise(out)
    return out


def remap_role(c: Column) -> Column:
    return remap(c, ROLE_MAP)


def remap_tool(c: Column) -> Column:
    return remap(c, TOOL_MAP)
