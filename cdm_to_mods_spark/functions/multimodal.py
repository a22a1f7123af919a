"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container ships no imaging/audio libraries, so the DECODE step is a
deterministic stand-in (metadata derived arithmetically from the payload),
clearly marked; everything Spark-side is real and tested: the typed
metadata schema, Arrow `mapInPandas` batch shape, explode of per-frame
rows, and the partitioning guidance for large blobs.

Reference analog: the binary-file scan + exactly-one-binary-per-record
join of post_cdm_cleanup.py:98-168 (S7/J5 in SURVEY.md §2) — there binaries
ride alongside records as opaque files; here they ride as a `binary`
column with typed metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Typed metadata for an opaque media payload. On a real deployment the
# decoder fills this from the codec; here `fake_decode_meta` derives it
# deterministically so tests and oracles are exact.
MEDIA_META_SCHEMA = (
    "doc_id long, mime string, byte_len long, width int, height int, "
    "n_frames int, sample_rate int"
)

_MIMES = ["image/jpeg", "image/png", "audio/wav", "video/mp4"]


def fake_decode_meta(payload: bytes, char_len: int) -> dict:
    """Deterministic stand-in for a codec probe (PIL/librosa/ffmpeg are not
    in this container). Arithmetic on lengths only, so a SQL oracle can
    reproduce it exactly."""
    n = len(payload)
    return {
        "mime": _MIMES[n % 4],
        "byte_len": n,
        "width": 64 + (n % 961),
        "height": 64 + ((char_len * 7) % 961),
        "n_frames": 1 + (n % 30),
        "sample_rate": 8000 + ((n * 13) % 40000),
    }


def real_decode_meta(payload: bytes) -> dict:
    """Where the real decoder plugs in."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in this "
        "environment; use fake_decode_meta for plumbing tests"
    )


def extract_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload → typed metadata row, one Arrow-batched pass.

    Scale notes: blobs make partitions weight-skewed — upstream, size
    partitions by bytes (`repartitionByRange` on byte_len or a
    maxRecordsPerFile-style bound), not by row count. The decode is
    CPU-bound per row, so parallelism = partitions; no shuffle here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                fake_decode_meta(p, c)
                for p, c in zip(pdf[payload_col], pdf["char_len"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload_resized binary, out_width int, out_height int, "
    "out_bytes long"
)


def fit_box(width: int, height: int, box: int) -> tuple[int, int]:
    """Aspect-preserving fit into a ``box``×``box`` square (no upscale) —
    pure integer arithmetic so a SQL oracle reproduces it exactly."""
    m = max(width, height)
    if m <= box:
        return width, height
    return max(1, (width * box) // m), max(1, (height * box) // m)


def resize_media(
    df: DataFrame, box: int = 224, payload_col: str = "payload"
) -> DataFrame:
    """binary payload (+ width/height) → resized payload + new dims, one
    Arrow-batched pass — the thumbnail/encoder-input-prep operator of a
    multimodal training pipeline.

    The pixel resample is a deterministic stand-in (no imaging lib here):
    output dims are the real aspect-preserving fit (``fit_box``) and the
    stand-in "resampled" payload is the proportional byte prefix, so
    byte_len ratios track area ratios and a SQL oracle can value-check the
    WHOLE Arrow path (dims + md5 of the produced bytes). A real decoder
    swaps `_fake_resample` for decode→resize→encode; schema, batching and
    partitioning are unchanged. Same skew guidance as extract_media_meta:
    partition by bytes upstream, no shuffle here."""

    def _fake_resample(payload: bytes, w: int, h: int, ow: int, oh: int) -> bytes:
        n = len(payload)
        keep = max(1, (n * ow * oh) // max(1, w * h))
        return payload[:keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p, w, h in zip(
                pdf["doc_id"], pdf[payload_col], pdf["width"], pdf["height"]
            ):
                ow, oh = fit_box(int(w), int(h), box)
                rp = _fake_resample(bytes(p), int(w), int(h), ow, oh)
                rows.append((doc_id, rp, ow, oh, len(rp)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "payload_resized", "out_width", "out_height",
                    "out_bytes",
                ],
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(meta: DataFrame, every: int = 4) -> DataFrame:
    """video metadata → one row per sampled frame index (every k-th frame,
    frame 0 always included) — the frame-sampling fan-out a training
    pipeline feeds to a vision encoder. Pure generator expression
    (posexplode of a sequence), no Python in the fan-out."""
    from pyspark.sql import functions as F

    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
    return (
        meta.filter(F.col("mime") == "video/mp4")
        .select("doc_id", "n_frames", F.explode(idx).alias("frame_idx"))
    )
