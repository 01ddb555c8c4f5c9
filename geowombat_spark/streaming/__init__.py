"""Structured Streaming: continuous ingest into the tiled corpus."""

from . import ingest  # noqa: F401
