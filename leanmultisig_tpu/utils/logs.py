"""Hierarchical tracing spans: the reference's tracing-forest analog
(utils/src/logs.rs:4-13 + #[instrument] span trees).

Off by default; `init_tracing()` (or env LMS_TRACING=1 at first use)
turns it on. Spans nest via a context stack and print an indented tree
with wall times as they close:

    prove_execution ........ 9.81s
      trace_gen ............ 0.31s
      logup ................ 1.92s
      air_sumcheck ......... 3.10s
      whir_open ............ 2.65s
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_ENABLED: bool | None = None
_DEPTH = 0


def init_tracing(enabled: bool = True) -> None:
    global _ENABLED
    _ENABLED = enabled


def tracing_enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        _ENABLED = os.environ.get("LMS_TRACING", "") not in ("", "0")
    return _ENABLED


@contextmanager
def span(name: str, **fields):
    """Timed span; prints on close when tracing is enabled."""
    global _DEPTH
    if not tracing_enabled():
        yield
        return
    _DEPTH += 1
    depth = _DEPTH
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _DEPTH -= 1
        dt = time.perf_counter() - t0
        pad = "  " * (depth - 1)
        extra = "".join(f" {k}={v}" for k, v in fields.items())
        label = f"{pad}{name}{extra} "
        dots = "." * max(2, 40 - len(label))
        print(f"{label}{dots} {dt:.3f}s", file=sys.stderr, flush=True)


def instrument(name: str | None = None):
    """Decorator wrapping a function in a span (reference #[instrument])."""
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with span(name or fn.__name__):
                return fn(*args, **kwargs)
        return wrapped
    return deco
