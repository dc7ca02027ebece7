"""Structured Streaming operators (event-stream side of the engine)."""

from .windows import sessionize, windowed_event_counts

__all__ = ["windowed_event_counts", "sessionize"]
