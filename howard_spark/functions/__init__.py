"""Scalar-function layer: packed-INFO string algebra (reference parity)."""

from .info import (
    explode_info,
    info_drop,
    info_get,
    info_set,
    pack_info,
)

__all__ = ["info_get", "info_set", "info_drop", "explode_info", "pack_info"]
