"""Lightweight per-column-chunk codecs (dict, RLE, FSST, bit-pack, FoR)."""

from .core import (
    ChunkEncoding,
    decode_array,
    encode_array,
    logical_size,
    str_to_type,
    type_to_str,
)

__all__ = [
    "ChunkEncoding",
    "encode_array",
    "decode_array",
    "logical_size",
    "type_to_str",
    "str_to_type",
]
