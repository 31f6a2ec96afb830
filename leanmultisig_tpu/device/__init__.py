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
    # auto-detect ONLY if jax is already initialized: probing the backend
    # here would block a pure-host run on accelerator plugin init (the
    # tunneled-TPU handshake can take minutes or hang), and callers that
    # want the device path set LMS_DEVICE / LMS_DPROVE / set_enabled().
    import sys
    jax = sys.modules.get("jax")
    if jax is None:
        return False
    try:
        from jax._src import xla_bridge
        if not xla_bridge._backends:
            return False
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
