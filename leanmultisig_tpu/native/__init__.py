"""Native (C) runtime components, built on first import and cached.

ctypes bindings (the environment has no pybind11); sources live next to
this file, objects cache in `build/` keyed by source mtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_BUILD = os.path.join(_DIR, "build")

_LIB = None
_UNAVAILABLE = False


def _write_constants_header() -> str:
    from ..poseidon import constants as C
    path = os.path.join(_BUILD, "poseidon16_constants.h")
    mds = [[C.MDS_COL[(i - j) % 16] for j in range(16)] for i in range(16)]
    lines = ["/* generated from poseidon/constants.py */",
             "static const uint32_t RC16[28][16] = {"]
    for row in C.ROUND_CONSTANTS:
        lines.append("  {" + ", ".join(f"{v}u" for v in row) + "},")
    lines.append("};")
    lines.append("static const uint32_t MDS16[16][16] = {")
    for row in mds:
        lines.append("  {" + ", ".join(f"{v}u" for v in row) + "},")
    lines.append("};")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def get_lib():
    """Build (if needed) and load the native library; None if no compiler."""
    global _LIB, _UNAVAILABLE
    if _LIB is not None or _UNAVAILABLE:
        return _LIB
    try:
        os.makedirs(_BUILD, exist_ok=True)
        src = os.path.join(_DIR, "poseidon16.c")
        so = os.path.join(_BUILD, "libposeidon16.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            _write_constants_header()
            subprocess.run(
                ["cc", "-O3", "-fopenmp", "-shared", "-fPIC", "-I", _BUILD,
                 src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.poseidon16_permute_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long]
        lib.poseidon16_compress_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_long]
        lib.poseidon16_grind.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_long,
            ctypes.c_long]
        lib.poseidon16_grind.restype = ctypes.c_long
        _LIB = lib
    except Exception:
        _UNAVAILABLE = True
        _LIB = None
    return _LIB


_FLIB = None
_FUNAVAILABLE = False


def get_fieldops_lib():
    global _FLIB, _FUNAVAILABLE
    if _FLIB is not None or _FUNAVAILABLE:
        return _FLIB
    try:
        os.makedirs(_BUILD, exist_ok=True)
        src = os.path.join(_DIR, "fieldops.c")
        so = os.path.join(_BUILD, "libfieldops.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["cc", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", so],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.dft_layer.argtypes = [u32p, u32p, ctypes.c_long, ctypes.c_long,
                                  ctypes.c_long]
        lib.fold_base.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.fold_ext.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.eval_eq.argtypes = [u32p, ctypes.c_long, u32p, u32p]
        lib.base_mul_batch.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.base_mul_scalar.argtypes = [u32p, ctypes.c_uint32, u32p,
                                        ctypes.c_long]
        lib.stack_z.argtypes = [u32p, ctypes.c_long, u32p, ctypes.c_long,
                                u32p]
        lib.gkr_round_evals.argtypes = [u32p, u32p, u32p, u32p, u32p, u32p,
                                        ctypes.c_long, u32p]
        lib.base_add_inplace.argtypes = [u32p, u32p, ctypes.c_long]
        lib.base_rowscale.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.reorder_repeat.argtypes = [u32p, ctypes.c_long, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_long,
                                       ctypes.c_long, u32p]
        lib.product_round_coeffs.argtypes = [u32p, ctypes.c_int, u32p,
                                             ctypes.c_long, u32p]
        lib.base_add_batch.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.base_sub_batch.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.eval_mle.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_long,
                                 u32p]
        lib.eq_outer_add.argtypes = [u32p, u32p, ctypes.c_long, u32p,
                                     ctypes.c_long]
        lib.gkr_layer_up.argtypes = [u32p, ctypes.c_int, u32p, u32p, u32p,
                                     ctypes.c_long]
        lib.gather_rows.argtypes = [u32p, ctypes.POINTER(ctypes.c_long),
                                    ctypes.c_long, ctypes.c_long, u32p]
        _FLIB = lib
    except Exception:
        _FUNAVAILABLE = True
        _FLIB = None
    return _FLIB


_QLIB = None
_QUNAVAILABLE = False


def get_quintic_lib():
    global _QLIB, _QUNAVAILABLE
    if _QLIB is not None or _QUNAVAILABLE:
        return _QLIB
    try:
        os.makedirs(_BUILD, exist_ok=True)
        src = os.path.join(_DIR, "quintic.c")
        so = os.path.join(_BUILD, "libquintic.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["cc", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", so],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.quintic_mul_batch.argtypes = [u32p, u32p, u32p, ctypes.c_long]
        lib.quintic_mul_scalar_batch.argtypes = [u32p, u32p, u32p,
                                                 ctypes.c_long]
        _QLIB = lib
    except Exception:
        _QUNAVAILABLE = True
        _QLIB = None
    return _QLIB
