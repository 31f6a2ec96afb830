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


class _CompiledCall:
    """Call a pre-warmed jax Compiled; fall back to plain jit if the
    AOT call rejects the concrete arguments (layout/committment)."""

    def __init__(self, compiled, plain_factory):
        self._compiled = compiled
        self._plain_factory = plain_factory
        self._fallback = None

    def __call__(self, *args):
        if self._fallback is not None:
            return self._fallback(*args)
        try:
            return self._compiled(*args)
        except Exception:
            STATS["precompiled_fallback"] += 1
            self._fallback = self._plain_factory()
            return self._fallback(*args)


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
            if os.environ.get("LMS_AOT_DEBUG") == "1":
                print(f"[aot] PLAIN {self._fn.__qualname__} "
                      f"broken={self._broken}", flush=True)
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
        base = os.path.basename(path)
        _USED.append(base)
        pre = _PRELOADED.get(base)
        if pre is not None:
            STATS["preloaded_hit"] += 1
            return _CompiledCall(pre, self._plain_jit)
        debug = os.environ.get("LMS_AOT_DEBUG") == "1"
        if os.path.exists(path):
            try:
                import time
                t0 = time.perf_counter()
                with open(path, "rb") as f:
                    ex = jax.export.deserialize(bytearray(f.read()))
                out = jax.jit(ex.call)
                STATS["disk_hit"] += 1
                STATS["disk_hit_s"] += time.perf_counter() - t0
                if debug:
                    print(f"[aot] HIT  {self._fn.__qualname__} "
                          f"{time.perf_counter() - t0:.2f}s", flush=True)
                return out
            except Exception as e:
                if debug:
                    print(f"[aot] LOADFAIL {self._fn.__qualname__} "
                          f"{type(e).__name__}", flush=True)
                try:
                    os.unlink(path)
                except OSError:
                    pass
        elif debug:
            print(f"[aot] MISS {self._fn.__qualname__}", flush=True)
        STATS["disk_miss"] += 1
        jitted = self._plain_jit()
        try:
            import time
            t0 = time.perf_counter()
            ex = jax.export.export(jitted)(*args)
            blob = ex.serialize()
            STATS["export_s"] += time.perf_counter() - t0
            if debug:
                print(f"[aot] EXPORT {self._fn.__qualname__} "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
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
        if os.environ.get("LMS_SYNC_DISPATCH") == "1":
            # debug/workaround knob: serialize the dispatch stream
            import time

            import jax
            debug = os.environ.get("LMS_AOT_DEBUG") == "1"
            t0 = time.perf_counter()
            if debug:
                print(f"[aot] CALL {self._fn.__qualname__}", flush=True)
            out = self._dispatch(*args)
            jax.block_until_ready(out)
            if debug:
                print(f"[aot] DONE {self._fn.__qualname__} "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
            return out
        return self._dispatch(*args)

    def _dispatch(self, *args):
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


# -- parallel pre-warm ------------------------------------------------------
# A prove dispatches its kernels serially; over a tunneled TPU the first
# call of each kernel pays ~0.5-1.5 s of executable load even with every
# cache warm, so ~350 kernels cost ~8 min of warmup. The artifact set a
# workload uses is recorded as a manifest; prewarm() then deserializes +
# compiles all of them on a thread pool (deserialize/compile release the
# GIL) and __call__ picks up the compiled executables directly.

_PRELOADED: dict = {}
_USED: list = []
# observability: where first-run time goes (printed by bench on stderr)
STATS: dict = {"preloaded_hit": 0, "precompiled_fallback": 0,
               "disk_hit": 0, "disk_miss": 0, "disk_hit_s": 0.0,
               "export_s": 0.0,
               "prewarm_deser_s": 0.0, "prewarm_compile_s": 0.0,
               "prewarm_exec_s": 0.0}


def record_manifest(tag: str) -> None:
    """Write the ordered artifact list this process used to
    manifest_<tag>.json (call after a full workload run)."""
    import json
    path = os.path.join(cache_dir(), f"manifest_{tag}.json")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(sorted(set(_USED)), f)
    os.replace(tmp, path)


def prewarm(tag: str, max_workers: int | None = None) -> int:
    """Deserialize + compile every artifact in manifest_<tag>.json in
    parallel; returns the number pre-warmed (0 if no manifest)."""
    import json
    from concurrent.futures import ThreadPoolExecutor

    import jax
    if max_workers is None:
        max_workers = int(os.environ.get("LMS_PREWARM_WORKERS", "16"))
    path = os.path.join(cache_dir(), f"manifest_{tag}.json")
    targeted = os.path.exists(path)
    if targeted:
        with open(path) as f:
            names = json.load(f)
    else:
        # No manifest for this workload yet: pre-warm every artifact on
        # disk instead, but WITHOUT the run-once execution (an untargeted
        # superset may include kernels from unrelated shape regimes —
        # executing them all with zero inputs risks OOM and wasted work;
        # see ADVICE r4). Artifacts exported for another backend are
        # skipped after deserialization in both paths.
        names = sorted(n for n in os.listdir(cache_dir())
                       if n.endswith(".jaxexp"))
        if not names:
            return 0

    run_once = (targeted
                and os.environ.get("LMS_PREWARM_EXEC", "1") == "1")
    backend = jax.default_backend()

    def load(name: str):
        import time
        fpath = os.path.join(cache_dir(), name)
        if not os.path.exists(fpath):
            return None
        try:
            t0 = time.perf_counter()
            with open(fpath, "rb") as fh:
                ex = jax.export.deserialize(bytearray(fh.read()))
            if backend not in {p.lower() for p in ex.platforms}:
                return None  # exported for a different backend
            args = jax.tree.unflatten(
                ex.in_tree,
                [jax.ShapeDtypeStruct(a.shape, a.dtype)
                 for a in ex.in_avals])
            t1 = time.perf_counter()
            compiled = jax.jit(ex.call).lower(*args[0], **args[1]).compile()
            t2 = time.perf_counter()
            out = None
            if run_once:  # force the device program load off the hot path
                import jax.numpy as jnp
                zeros = jax.tree.unflatten(
                    ex.in_tree,
                    [jnp.zeros(a.shape, a.dtype) for a in ex.in_avals])
                out = compiled(*zeros[0], **zeros[1])
                # block per-kernel so retained outputs don't accumulate
                jax.block_until_ready(out)
                out = None
            t3 = time.perf_counter()
            STATS["prewarm_deser_s"] += t1 - t0
            STATS["prewarm_compile_s"] += t2 - t1
            STATS["prewarm_exec_s"] += t3 - t2
            return name, compiled, out
        except Exception:
            return None

    n = 0
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for res in pool.map(load, names):
            if res is not None:
                _PRELOADED[res[0]] = res[1]
                n += 1
    return n


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
