"""Vectorized (numpy) port of Spark's ``F.hash`` — Murmur3 x86-32, seed
42 — over whole Arrow arrays at once: the executor-side bucket router for
the native ``lake`` WRITER (sources/lake_sink.py), which must assign each
row to ``pmod(hash(key), num_buckets)`` WITHOUT a SparkSession (data
source write tasks are plain Python workers) and without per-row Python
(BASELINE.json:15 mandates vectorized row paths).

The scalar reference port lives in ``sources/lake_batch.py``
(``spark_murmur3``), parity-pinned there against the JVM ``F.hash``; this
module is differentially pinned against THAT scalar port on random
strings/ints/bytes (tests/test_lake_sink.py), so the chain
numpy == scalar == JVM holds.

Shape of the string/binary kernel: Arrow string arrays already store
UTF-8 contiguously (offsets buffer + data buffer), so the ragged hash
loops over BYTE POSITIONS, not rows — vectorized word rounds over the
ACTIVE row set (rows with bytes left at that offset) plus ≤3 tail-byte
rounds. Total gather work is ``sum(len_i)/4``, so for conv-id-shaped
keys (~16 bytes) that is ~7 numpy passes per batch regardless of row
count, and one oversized outlier key costs only its own bytes instead
of dragging every row through ``max_len/4`` mask passes.

Spark semantics preserved exactly (they differ from textbook murmur3):
longs hash as TWO 4-byte words (even when the value fits in 32 bits —
hashing is by column type); the byte tail is processed one SIGNED byte
at a time through the full mix (standard murmur3 accumulates the tail
unmixed); ints/longs use the two's-complement bit pattern.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "murmur3_int32_np",
    "murmur3_int64_np",
    "murmur3_bytes_np",
    "bucket_ids_np",
]

_M32 = np.uint64(0xFFFFFFFF)
_SEED = np.uint64(42)


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 = (k1 * np.uint64(0xCC9E2D51)) & _M32
    k1 = ((k1 << np.uint64(15)) | (k1 >> np.uint64(17))) & _M32
    return (k1 * np.uint64(0x1B873593)) & _M32


def _mix_h1(h1: np.ndarray, k1: np.ndarray) -> np.ndarray:
    h1 = h1 ^ k1
    h1 = ((h1 << np.uint64(13)) | (h1 >> np.uint64(19))) & _M32
    return (h1 * np.uint64(5) + np.uint64(0xE6546B64)) & _M32


def _fmix(h1: np.ndarray, length) -> np.ndarray:
    h1 = h1 ^ length
    h1 ^= h1 >> np.uint64(16)
    h1 = (h1 * np.uint64(0x85EBCA6B)) & _M32
    h1 ^= h1 >> np.uint64(13)
    h1 = (h1 * np.uint64(0xC2B2AE35)) & _M32
    h1 ^= h1 >> np.uint64(16)
    return h1


def _signed32(h1: np.ndarray) -> np.ndarray:
    return h1.astype(np.uint32).view(np.int32).astype(np.int64)


def murmur3_int32_np(vals: np.ndarray) -> np.ndarray:
    """Hash an int/short/byte/boolean column (one 4-byte word)."""
    v = vals.astype(np.int32).view(np.uint32).astype(np.uint64)
    h1 = _mix_h1(np.full(len(v), _SEED, dtype=np.uint64), _mix_k1(v))
    return _signed32(_fmix(h1, np.uint64(4)))


def murmur3_int64_np(vals: np.ndarray) -> np.ndarray:
    """Hash a long column (two 4-byte words, low then high)."""
    v = vals.astype(np.int64).view(np.uint64)
    h1 = np.full(len(v), _SEED, dtype=np.uint64)
    h1 = _mix_h1(h1, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> np.uint64(32)) & _M32))
    return _signed32(_fmix(h1, np.uint64(8)))


def murmur3_bytes_np(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """Hash a ragged byte array: ``data`` is the flat uint8 buffer,
    ``starts``/``lengths`` (int64) delimit each row's slice."""
    n = len(starts)
    h1 = np.full(n, _SEED, dtype=np.uint64)
    if n == 0:
        return _signed32(h1)
    d64 = data.astype(np.uint64)
    aligned = lengths - (lengths % 4)
    # word rounds iterate over the ACTIVE row set (rows with bytes left at
    # this offset), not a full-batch mask: total work is sum(len_i)/4
    # gathers, so one oversized outlier key costs only its own bytes
    # instead of dragging every row through max_len/4 mask passes
    active = np.flatnonzero(aligned > 0)
    w = 0  # plain int: starts(int64) + uint64 would upcast to float64
    while active.size:
        idx = starts[active] + w
        k1 = (
            d64[idx]
            | (d64[idx + 1] << np.uint64(8))
            | (d64[idx + 2] << np.uint64(16))
            | (d64[idx + 3] << np.uint64(24))
        )
        h1[active] = _mix_h1(h1[active], _mix_k1(k1))
        w += 4
        active = active[aligned[active] > w]
    for t in range(3):
        m = (aligned + t) < lengths
        if not m.any():
            break
        b = d64[starts[m] + aligned[m] + t]
        # Java reads a SIGNED byte: b>=128 → b-256 (mod 2^32)
        b = np.where(b >= 128, (b + np.uint64(0xFFFFFF00)) & _M32, b)
        h1[m] = _mix_h1(h1[m], _mix_k1(b))
    return _signed32(_fmix(h1, lengths.astype(np.uint64)))


def _arrow_ragged(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint8 data, starts, lengths) for an Arrow string/binary
    array, honouring the array's slice offset."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_width = 8 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else 4
    buffers = arr.buffers()
    offsets = np.frombuffer(
        buffers[1], dtype=np.int64 if off_width == 8 else np.int32
    )[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    return data, starts, lengths


def bucket_ids_np(arr, num_buckets: int) -> np.ndarray:
    """``pmod(hash(col), num_buckets)`` for an Arrow array of the key
    types hash32 tables bucket by (string/binary/int/bigint) — must match
    ``plans.lake._bucket_expr``. Raises on nulls (null keys are
    unmergeable; callers quarantine or refuse BEFORE routing) and on
    unsupported types."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("null bucket key — unmergeable row reached the router")
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        h = murmur3_bytes_np(*_arrow_ragged(arr))
    elif pa.types.is_int64(t):
        h = murmur3_int64_np(arr.to_numpy(zero_copy_only=False))
    elif pa.types.is_integer(t) or pa.types.is_boolean(t):
        h = murmur3_int32_np(
            arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
        )
    else:
        raise TypeError(
            f"unsupported bucket-key type {t} — hash32 routing covers "
            "string/binary/int/bigint"
        )
    n = np.int64(num_buckets)
    return ((h % n) + n) % n
