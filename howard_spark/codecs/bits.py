"""Vectorized bit-packing primitives (numpy only — no per-row Python).

These are the building blocks for the lightweight codecs:
frame-of-reference + bit-pack for integers, packed validity bitmaps,
and binary payload framing.

Reference behavior being replaced: HOWARD's storage layer delegates
integer compression to Parquet/DuckDB (see SURVEY.md §7.0); here the
packing is explicit so a codec auto-selector can reason about it.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "width_for",
    "pack_uints",
    "unpack_uints",
    "pack_mask",
    "unpack_mask",
    "frame",
    "unframe",
]


def width_for(max_value: int) -> int:
    """Number of bits needed to represent ``max_value`` (>= 0)."""
    if max_value < 0:
        raise ValueError("width_for expects a non-negative value")
    return int(max_value).bit_length()


def pack_uints(arr: np.ndarray, width: int) -> bytes:
    """Bit-pack a uint64 array at ``width`` bits per value (MSB-first).

    Fully vectorized: builds an (n, width) bit matrix and packs it with
    ``np.packbits``. ``width == 0`` encodes the all-zero array as b"".
    """
    if width == 0 or arr.size == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_uints(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uints` → uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def pack_mask(mask: np.ndarray) -> bytes:
    """Pack a boolean validity mask, LSB-first (Arrow bitmap layout)."""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_mask(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)


def frame(*parts: bytes) -> bytes:
    """Concatenate binary parts with a length header so payloads nest."""
    header = struct.pack("<I", len(parts)) + b"".join(
        struct.pack("<Q", len(p)) for p in parts
    )
    return header + b"".join(parts)


def unframe(data: bytes) -> list[bytes]:
    (count,) = struct.unpack_from("<I", data, 0)
    off = 4 + 8 * count
    lens = struct.unpack_from(f"<{count}Q", data, 4)
    out = []
    for ln in lens:
        out.append(data[off : off + ln])
        off += ln
    return out
