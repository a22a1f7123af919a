"""Text-normalization column functions — the reference's string-XSLT family
re-expressed as native (JVM-codegen'd) Column expressions.

Each function is ``Column -> Column`` so chains compose into ONE select
(Catalyst pipelines them; no per-stage materialization like the reference's
per-XSLT directory chain, convert_cdm_to_mods.py:352-373).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# F1 — XML-entity escape (convert_cdm_to_mods.py:204-208). Order matters:
# '&' first, exactly like the reference.
def xml_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def xml_unescape(c: Column) -> Column:
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


# F6 — global find/replace family.
def br_to_semicolon(c: Column) -> Column:
    """``<br>`` (any case, optional self-close) → '; '
    (xsl/brToSemicolon.xsl:19-24, xsl/noteRemoveBreak.xsl)."""
    return F.regexp_replace(c, r"(?i)<br\s*/?>", "; ")


def at_symbols_to_quote(c: Column) -> Column:
    """``@@@`` → '"' (xsl/replaceAtSymbolsGlobal.xsl:18-20)."""
    return F.replace(c, F.lit("@@@"), F.lit('"'))


def emdash_to_double_hyphen(c: Column) -> Column:
    """em/en dash → '--' (xsl/subjectDashReplace.xsl)."""
    return F.regexp_replace(c, "[—–]", "--")


# F5 — whitespace normalize (xsl/blankNodes.xsl:18-20 normalize-space).
def normalize_whitespace(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# F4 — trailing punctuation strip (xsl/removeSemicolon.xsl:18-22,
# xsl/namePartSemicolon.xsl).
def strip_trailing_punct(c: Column) -> Column:
    return F.regexp_replace(c, r"[;.\s]+$", "")


# P5/P6 — blank / sentinel scrub (xsl/blankNamePart.xsl:18,
# xsl/noteValueNoneDelete.xsl): blank or 'unknown'/'na'/'none' → NULL.
def null_if_sentinel(c: Column) -> Column:
    cleaned = F.trim(c)
    return F.when(
        cleaned.isNull()
        | (cleaned == "")
        | F.lower(cleaned).isin("unknown", "na", "none", "n/a"),
        F.lit(None),
    ).otherwise(c)


# F2 — careful split-and-clean on ';' (convert_cdm_to_mods.py:248-269,
# xsl/subjectSplit.xsl:47,71): split, trim, drop empties. Returns an array
# column; callers explode when one-row-per-piece is wanted.
def split_multivalue(c: Column, sep: str = ";") -> Column:
    return F.filter(
        F.transform(F.split(c, F.lit(sep)), lambda x: F.trim(x)),
        lambda x: x != "",
    )


# F3 — '--' hierarchical tokenizer with capitalize-first-letter +
# trailing-period strip (xsl/subjectSplit.xsl:35-40,59).
def split_hierarchical(c: Column) -> Column:
    def clean(x: Column) -> Column:
        x = F.trim(F.regexp_replace(x, r"\.\s*$", ""))
        return F.concat(F.upper(F.substring(x, 1, 1)), F.substring(x, 2, 2_000_000))

    return F.filter(F.transform(F.split(c, "--"), clean), lambda x: x != "")


# F10 — leading-article extraction (xsl/titleNonSort.xsl:18-66).
def title_nonsort(c: Column) -> Column:
    """title → struct(non_sort string, title string) per titleNonSort.xsl."""
    art = F.regexp_extract(c, r"(?i)^((?:the|an|a)\s+)", 1)
    rest = F.when(art == "", c).otherwise(F.substring(c, F.length(art) + 1, F.lit(2_000_000)))
    return F.struct(F.trim(art).alias("non_sort"), rest.alias("title"))


# F14 — alphanumeric squeeze (utilities.py:67-68 ``shorten``).
def alnum_squeeze(c: Column) -> Column:
    return F.regexp_replace(c, "[^A-Za-z0-9]", "")


def normalize_text(c: Column) -> Column:
    """The engine's default per-turn text normalization chain — the composed
    analog of a typical alias_xslts sequence (br → semicolon, @@@ → quote,
    dash fix, whitespace collapse, trailing-punct strip). One expression,
    fully whole-stage-codegen'd."""
    return strip_trailing_punct(
        normalize_whitespace(
            emdash_to_double_hyphen(at_symbols_to_quote(br_to_semicolon(c)))
        )
    )
