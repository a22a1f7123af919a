"""Independent pandas oracle for replay convergence.

Implements the same CDC semantics (last-write-wins by seq, delete
tombstones) and the same transform chain (text normalization, role/tool
remap, ts canonicalization) with plain python/re — deliberately NOT sharing
code with the engine so the pytest comparison is a real cross-check
(the IsCountsCorrect analog, post_cdm_cleanup.py:15-37).
"""

from __future__ import annotations

import re

import pandas as pd

ROLE_MAP = {
    "user": "user", "human": "user", "customer": "user",
    "assistant": "assistant", "ai": "assistant", "bot": "assistant",
    "agent": "assistant", "model": "assistant",
    "system": "system", "tool": "tool", "function": "tool",
}
TOOL_MAP = {
    "search": "search", "websearch": "search", "browser": "browser",
    "web": "browser", "calc": "calculator", "calculator": "calculator",
}
TOOL_NULLS = {"none", ""}


def norm_text(t):
    if t is None:
        return None
    t = re.sub(r"(?i)<br\s*/?>", "; ", t)
    t = t.replace("@@@", '"')
    t = re.sub("[—–]", "--", t)
    t = re.sub(r"\s+", " ", t).strip()
    t = re.sub(r"[;.\s]+$", "", t)
    return t


def remap_role(r):
    if r is None:
        return None
    k = r.strip().lower()
    return ROLE_MAP.get(k, k)


def remap_tool(t):
    if t is None:
        return None
    k = t.strip().lower()
    if k in TOOL_NULLS:
        return None
    return TOOL_MAP.get(k, k)


def canon_ts(raw):
    if raw is None:
        return pd.NaT
    s = raw.strip()
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})(?:[ T](\d{2}):(\d{2})(?::(\d{2}))?)?$", s)
    if m:
        h, mi, se = m.group(4) or "00", m.group(5) or "00", m.group(6) or "00"
        return pd.Timestamp(f"{m.group(1)}-{m.group(2)}-{m.group(3)} {h}:{mi}:{se}")
    m = re.match(r"^0?(\d{1,2})/0?(\d{1,2})/(\d{4})(?:\s+(\d{1,2}):(\d{2})(?::(\d{2}))?)?$", s)
    if m:
        h = (m.group(4) or "0").zfill(2)
        return pd.Timestamp(
            f"{m.group(3)}-{m.group(1).zfill(2)}-{m.group(2).zfill(2)} {h}:{m.group(5) or '00'}:{m.group(6) or '00'}"
        )
    m = re.match(r"^(\d{4})-(\d{2})$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-{m.group(2)}-01")
    m = re.match(r"^\[(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?\]$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-{m.group(2) or '01'}-{m.group(3) or '01'}")
    m = re.match(r"(?i)^(?:ca\.?|circa)\s*(\d{4})$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-01-01")
    m = re.match(r"^(\d{4})\?$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-01-01")
    m = re.match(r"(?i)^(?:between\s+)?(\d{4})(?:\s*-\s*|\s+and\s+)(\d{4})$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-01-01")
    m = re.match(r"^(\d{3})(?:0s|-)$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}0-01-01")
    m = re.match(r"^(\d{4})$", s)
    if m:
        return pd.Timestamp(f"{m.group(1)}-01-01")
    return pd.NaT


def replay_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Final table state: per (conv_id, turn_idx) keep max-seq event; drop
    keys whose winning op is D; transform the survivors."""
    # STABLE sort: at equal seq the later-listed event must win
    # deterministically (the default quicksort reorders ties arbitrarily —
    # equal seqs arise when delete_where/update_where spend an LSN a later
    # source event also uses, and the engine resolves that tie op-ranked
    # U>I>D, i.e. the source event beats the maintenance tombstone; callers
    # list maintenance rows before subsequent source events, so stable
    # keep-last mirrors it). Caught by the rollback interleaving property.
    ev = events_pdf.sort_values("seq", kind="stable")
    # row-wise last-write-wins: the max-seq EVENT replaces the record
    # entirely (groupby.last() would coalesce per COLUMN — last non-null —
    # which silently resurrects overwritten nulls; caught by
    # tests/test_property.py)
    last = ev.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    live = last[last["op"] != "D"].copy()
    live["text"] = live["text"].map(norm_text)
    live["role"] = live["role"].map(remap_role)
    live["tool"] = live["tool"].map(remap_tool)
    live["ts"] = live["ts_raw"].map(canon_ts)
    out = live[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
