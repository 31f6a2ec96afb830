"""Disk-backed AOT kernel cache: skip re-TRACING across processes.

The device prover dispatches several hundred small shape-specialized
kernels. XLA's persistent compile cache already skips recompilation, but
a fresh process still pays Python tracing (~60%) and jaxpr->MLIR lowering
(~25%) for every kernel — measured at ~7 min for a cold small-shape prove
on a 4-core host. This module wraps `jax.jit` with a disk cache of
`jax.export` artifacts (serialized StableHLO): the first process traces,
lowers, and serializes; every later process deserializes the module and
splices it via `exported.call` (C++-fast), paying neither tracing nor
lowering.

Bit-exactness: the deserialized module is the exact StableHLO the
original trace produced, so replayed kernels are numerically identical
(integer field ops; no autotuning-dependent results).

Cache key = sha1(jax version, backend platform, function qualname,
closure-constant content hash, input avals). The closure hash walks the
captured cells (ints, numpy/jax constant arrays, nested functions) so two
factory instantiations with identical shapes but different baked
constants (e.g. DFT twiddles for different layers) never collide. A cell
we cannot hash stably disables the cache for that function (plain jit).

Disabled under an active sharding mesh (exports pin shardings) and by
LMS_AOT_CACHE=0.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np

_CACHE_DIR = None


class _Unhashable(Exception):
    pass


def cache_dir() -> str:
    global _CACHE_DIR
    if _CACHE_DIR is None:
        base = os.environ.get(
            "LMS_AOT_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".lms_aot"))
        os.makedirs(base, exist_ok=True)
        _CACHE_DIR = base
    return _CACHE_DIR


def _hash_obj(upd, obj, depth: int = 0) -> None:
    """Stable content hash of a closure constant; raises _Unhashable."""
    if depth > 6:
        raise _Unhashable(type(obj))
    if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
        upd(repr(obj).encode())
    elif isinstance(obj, np.generic):
        upd(obj.dtype.str.encode())
        upd(repr(obj.item()).encode())
    elif isinstance(obj, np.ndarray):
        upd(obj.dtype.str.encode())
        upd(repr(obj.shape).encode())
        upd(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (tuple, list)):
        upd(f"{type(obj).__name__}{len(obj)}".encode())
        for it in obj:
            _hash_obj(upd, it, depth + 1)
    elif isinstance(obj, dict):
        upd(f"dict{len(obj)}".encode())
        for k in sorted(obj, key=repr):
            _hash_obj(upd, k, depth + 1)
            _hash_obj(upd, obj[k], depth + 1)
    else:
        import functools as _ft
        import types

        import jax
        if isinstance(obj, types.ModuleType):
            upd(f"module:{obj.__name__}".encode())
        elif isinstance(obj, np.dtype):
            upd(obj.str.encode())
        elif isinstance(obj, jax.Array):
            _hash_obj(upd, np.asarray(obj), depth + 1)
        elif isinstance(obj, _ft.partial):
            _hash_obj(upd, obj.func, depth + 1)
            _hash_obj(upd, obj.args, depth + 1)
            _hash_obj(upd, obj.keywords, depth + 1)
        elif isinstance(obj, AotJit):
            _hash_obj(upd, obj._fn, depth + 1)
        elif callable(obj) and hasattr(obj, "__qualname__"):
            upd(f"{getattr(obj, '__module__', '')}."
                f"{obj.__qualname__}".encode())
            code = getattr(obj, "__code__", None)
            if code is not None:  # source edits must invalidate artifacts
                _hash_code(upd, code, depth + 1)
            for cell in (getattr(obj, "__closure__", None) or ()):
                _hash_obj(upd, cell.cell_contents, depth + 1)
        else:
            raise _Unhashable(type(obj))


def _hash_code(upd, code, depth: int) -> None:
    upd(code.co_code)
    for c in code.co_consts:
        if hasattr(c, "co_code"):
            _hash_code(upd, c, depth + 1)
        else:
            upd(repr(c).encode())
    upd(repr(code.co_names).encode())


def _aval_entry(leaf):
    import jax
    if isinstance(leaf, (np.ndarray, np.generic, jax.Array)):
        weak = bool(getattr(leaf, "weak_type", False))
        return (tuple(np.shape(leaf)), np.asarray(leaf).dtype.str
                if isinstance(leaf, np.generic) else str(leaf.dtype), weak)
    # python scalar: jit treats as weak-typed
    return ("py", type(leaf).__name__, repr(leaf))


def _aval_key(args):
    import jax
    leaves, treedef = jax.tree.flatten(args)
    return (str(treedef), tuple(_aval_entry(x) for x in leaves))


class AotJit:
    """jax.jit with a cross-process disk cache of exported StableHLO."""

    def __init__(self, fn, **jit_kwargs):
        self._fn = fn
        self._jit_kwargs = jit_kwargs
        self._plain = None
        self._per_aval: dict = {}
        self._closure_hash: str | None = None
        self._broken = bool(jit_kwargs)  # exporting static_argnums etc:
        # not needed by any current kernel; fall back to plain jit.
        functools.update_wrapper(self, fn)

    # -- plain path ----------------------------------------------------
    def _plain_jit(self):
        if self._plain is None:
            import jax
            self._plain = jax.jit(self._fn, **self._jit_kwargs)
        return self._plain

    def lower(self, *args, **kw):  # passthrough for introspection uses
        return self._plain_jit().lower(*args, **kw)

    # -- cached path ---------------------------------------------------
    def _closure_digest(self) -> str:
        if self._closure_hash is None:
            h = hashlib.sha1()
            _hash_obj(h.update, self._fn)  # qualname + closure walk
            self._closure_hash = h.hexdigest()
        return self._closure_hash

    def _file_for(self, aval_key) -> str:
        import jax
        h = hashlib.sha1()
        h.update(jax.__version__.encode())
        h.update(jax.default_backend().encode())
        h.update(_sources_digest(self._fn))
        h.update(self._closure_digest().encode())
        h.update(repr(aval_key).encode())
        return os.path.join(cache_dir(), h.hexdigest() + ".jaxexp")

    def _load_or_build(self, args, aval_key):
        import jax
        try:
            path = self._file_for(aval_key)
        except _Unhashable:
            self._broken = True
            return self._plain_jit()
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    ex = jax.export.deserialize(bytearray(f.read()))
                return jax.jit(ex.call)
            except Exception:
                try:
                    os.unlink(path)
                except OSError:
                    pass
        jitted = self._plain_jit()
        try:
            ex = jax.export.export(jitted)(*args)
            blob = ex.serialize()
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        except Exception:
            return jitted  # unexportable (exotic primitive/platform)
        # Run through the REPLAY form even in the building process: its
        # compiled module is what later processes deserialize, so its
        # compile must be the one the persistent XLA cache stores (the
        # direct-jit HLO hashes differently and would never be reused).
        return jax.jit(ex.call)

    def __call__(self, *args):
        if self._broken or os.environ.get("LMS_AOT_CACHE", "1") != "1":
            return self._plain_jit()(*args)
        from ..dprover.dshard import current_mesh
        if current_mesh() is not None:
            return self._plain_jit()(*args)
        try:
            key = _aval_key(args)
        except Exception:
            self._broken = True
            return self._plain_jit()(*args)
        fn = self._per_aval.get(key)
        if fn is None:
            fn = self._load_or_build(args, key)
            self._per_aval[key] = fn
        return fn(*args)


_SRC_DIGESTS: dict = {}
# shared numeric helpers every kernel traces through: editing any of them
# must invalidate all artifacts (bytecode hashing only covers the kernel
# function itself, not helpers reached via module globals)
_COMMON_SOURCES = ("field/jnp_field.py", "poseidon/perm.py",
                   "dprover/dpoly.py", "device/air.py")


def _sources_digest(fn) -> bytes:
    """Hash of the kernel's defining source file + the shared numeric
    modules; memoized per module."""
    import sys
    mod = getattr(fn, "__module__", "")
    d = _SRC_DIGESTS.get(mod)
    if d is None:
        h = hashlib.sha1()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        files = [os.path.join(pkg, rel) for rel in _COMMON_SOURCES]
        mfile = getattr(sys.modules.get(mod), "__file__", None)
        if mfile:
            files.append(mfile)
        for f in files:
            try:
                with open(f, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                h.update(f.encode())
        d = h.digest()
        _SRC_DIGESTS[mod] = d
    return d


def aot_jit(fn=None, **jit_kwargs):
    """Drop-in replacement for jax.jit at kernel-factory sites."""
    if fn is None:
        return lambda f: AotJit(f, **jit_kwargs)
    return AotJit(fn, **jit_kwargs)
