"""Planner-side machinery: checkpointed tiling sink, salting, resume,
bucketed storage layout."""

from . import bucketing, checkpoint, compact  # noqa: F401
