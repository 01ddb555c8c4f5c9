"""Structured Streaming: continuous ingest into the tiled corpus."""

from . import dedup, ingest  # noqa: F401
