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
    # byte-view path: take the top ceil(w/8) big-endian bytes of each
    # value, unpack to a bit matrix with C-speed unpackbits, drop the
    # pad bits. Same output bytes as the old (a[:,None] >> shifts) & 1
    # construction, but the intermediate is n*ceil(w/8) bytes instead
    # of an n*w uint64 matrix (~10 MB per 64Ki-row call at w=20).
    n = a.size
    wb = (width + 7) // 8
    be = a.astype(">u8").view(np.uint8).reshape(n, 8)[:, 8 - wb:]
    bits = np.unpackbits(be, axis=1)[:, wb * 8 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_uints(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uints` → uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width)
    # byte-view inverse of pack_uints: left-pad each row to whole
    # big-endian bytes, packbits to n*ceil(w/8) bytes, widen to 8-byte
    # big-endian words — all C loops, no n*w uint64 matrix
    wb = (width + 7) // 8
    padded = np.zeros((n, wb * 8), dtype=np.uint8)
    padded[:, wb * 8 - width:] = bits
    by = np.packbits(padded.ravel()).reshape(n, wb)
    words = np.zeros((n, 8), dtype=np.uint8)
    words[:, 8 - wb:] = by
    return words.reshape(-1).view(">u8").astype(np.uint64).reshape(n)


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
