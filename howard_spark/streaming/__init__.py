"""Structured Streaming operators (event-stream side of the engine)."""

from .windows import encode_stream, sessionize, windowed_event_counts

__all__ = ["windowed_event_counts", "sessionize", "encode_stream"]
