"""Structured Streaming operators (event-stream side of the engine)."""

from .encode_stream import (
    decode_encoded_stream,
    encode_stream,
    read_encoded_stream,
    stream_manifest_summary,
)
from .windows import sessionize, windowed_event_counts

__all__ = [
    "windowed_event_counts",
    "sessionize",
    "encode_stream",
    "read_encoded_stream",
    "decode_encoded_stream",
    "stream_manifest_summary",
]
