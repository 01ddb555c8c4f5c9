"""Engine configuration context — the analogue of ``gw.config.update``.

The reference mutates a global config dict through a context manager
(``/root/reference/src/geowombat/config.py:50-91``) with precedence
config > open() kwarg > file metadata
(``src/geowombat/core/api.py:319-343``; pinned by
``tests/test_scaling.py:61-84`` and ``tests/test_nodata.py:51-90``).

Here the same tri-level precedence is resolved *at plan time* by
:func:`resolve`: planner functions consult the active config first, then
their explicit kwarg, then table metadata. No executor-side state — the
resolved scalars are baked into Column expressions / UDF closures.
"""

from __future__ import annotations

import contextlib
import threading
from dataclasses import dataclass, field
from typing import Any

_UNSET = object()


@dataclass
class EngineConfig:
    """Active reference-frame + scaling settings (subset the engine uses)."""

    ref_bounds: tuple[float, float, float, float] | None = None
    ref_res: tuple[float, float] | None = None
    ref_crs: str | None = None
    nodata: float | None = None
    scale_factor: float | None = None
    offset: float | None = None
    sensor: str | None = None
    extras: dict[str, Any] = field(default_factory=dict)


_state = threading.local()


def _stack() -> list[EngineConfig]:
    if not hasattr(_state, "stack"):
        _state.stack = [EngineConfig()]
    return _state.stack


def current() -> EngineConfig:
    return _stack()[-1]


@contextlib.contextmanager
def config(**kwargs):
    """Context manager: ``with config(nodata=0, scale_factor=1e-4): ...``"""
    base = current()
    new = EngineConfig(**{**base.__dict__, **{k: v for k, v in kwargs.items() if k != "extras"}})
    if "extras" in kwargs:
        new.extras = {**base.extras, **kwargs["extras"]}
    _stack().append(new)
    try:
        yield new
    finally:
        _stack().pop()


def resolve(key: str, kwarg_value=None, metadata_value=None, default=None):
    """Tri-level precedence: active config > explicit kwarg > table metadata.

    Matches the reference resolution order (``api.py:319-343``): a config
    value set via :func:`config` wins over a per-call kwarg, which wins over
    what the source table declares.
    """
    cfg_value = getattr(current(), key, None)
    if cfg_value is not None:
        return cfg_value
    if kwarg_value is not None:
        return kwarg_value
    if metadata_value is not None:
        return metadata_value
    return default
