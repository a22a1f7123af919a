"""Multimodal plumbing: Arrow decode batch shape, typed metadata, frame
fan-out, and the explicit real-decoder stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdm_to_mods_spark.functions.multimodal import (
    extract_media_meta,
    fake_decode_meta,
    real_decode_meta,
    sample_frames,
)


def _media_df(spark):
    rows = [(i, f"payload-{'x' * i}") for i in range(1, 9)]
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.length("text").alias("char_len"),
    )


def test_extract_media_meta_matches_python_reference(spark):
    got = {r.doc_id: r.asDict() for r in extract_media_meta(_media_df(spark)).collect()}
    for i in range(1, 9):
        payload = f"payload-{'x' * i}".encode()
        want = fake_decode_meta(payload, len(payload))
        row = got[i]
        for k, v in want.items():
            assert row[k] == v, (i, k)


def test_sample_frames_every_kth_from_zero(spark):
    meta = extract_media_meta(_media_df(spark))
    frames = sample_frames(meta, every=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    metas = {r.doc_id: r for r in meta.collect()}
    assert by_doc, "at least one video/mp4 payload expected"
    for doc, idxs in by_doc.items():
        assert metas[doc].mime == "video/mp4"
        assert sorted(idxs) == list(range(0, metas[doc].n_frames, 3))
    # non-video docs produce no frames
    for doc, m in metas.items():
        if m.mime != "video/mp4":
            assert doc not in by_doc


def test_real_decoder_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_meta(b"\xff\xd8\xff")
