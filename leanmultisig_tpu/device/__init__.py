"""Device (TPU) acceleration layer.

`enabled()` gates device kernels in the host pipeline: on when
LMS_DEVICE=1, or auto-on when the default JAX backend is a real TPU.
"""

from __future__ import annotations

import os

_FORCED = None


def set_enabled(value: bool) -> None:
    global _FORCED
    _FORCED = value


def enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("LMS_DEVICE")
    if env is not None:
        return env not in ("0", "", "false")
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
