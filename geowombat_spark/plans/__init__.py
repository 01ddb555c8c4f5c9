"""Planner-side machinery: checkpointed tiling sink, salting, resume."""

from . import checkpoint  # noqa: F401
