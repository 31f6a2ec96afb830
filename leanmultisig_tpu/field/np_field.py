"""Host-side KoalaBear arithmetic on numpy arrays (canonical form, uint32/uint64).

Used for witness generation, the VM runner, test oracles, and anywhere
control-flow-heavy host code needs field math. Device-side (TPU) arithmetic
lives in `jnp_field.py` (Montgomery form on uint32 lanes).

Semantics mirror the reference field layer
(/root/reference/crates/backend/field, crates/backend/koala-bear) but the
implementation is numpy-vectorized rather than SIMD-intrinsic Rust.
"""

from __future__ import annotations

import numpy as np

from .constants import EXT_DEGREE, P, TWO_ADIC_GENERATORS, TWO_ADICITY

PNP = np.uint64(P)


def fa(x) -> np.ndarray:
    """Coerce to a canonical uint32 field array."""
    a = np.asarray(x)
    if a.dtype == np.uint32:
        return a
    return (a.astype(np.int64) % P).astype(np.uint32)


def _native_binop(name, a, b):
    """Route equal-shape contiguous large arrays to the C kernels
    (one fused pass instead of numpy temporaries)."""
    if (isinstance(a, np.ndarray) and isinstance(b, np.ndarray)
            and a.dtype == np.uint32 and b.dtype == np.uint32
            and a.shape == b.shape and a.size >= 8192):
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is not None and hasattr(lib, name):
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            ac = np.ascontiguousarray(a)
            bc = np.ascontiguousarray(b)
            out = np.empty_like(ac)
            getattr(lib, name)(ac.ctypes.data_as(u32p),
                               bc.ctypes.data_as(u32p),
                               out.ctypes.data_as(u32p), ac.size)
            return out
    return None


def add(a, b):
    r = _native_binop("base_add_batch", a, b)
    if r is not None:
        return r
    # a, b < P < 2^31: the uint32 sum cannot wrap; branchless reduce
    # (avoids np.where evaluating an underflowing dead branch on scalars)
    s = np.asarray(a, np.uint32) + np.asarray(b, np.uint32)
    return s - (s >= np.uint32(P)).astype(np.uint32) * np.uint32(P)


def sub(a, b):
    r = _native_binop("base_sub_batch", a, b)
    if r is not None:
        return r
    a = np.asarray(a, np.uint32)
    b = np.asarray(b, np.uint32)
    return np.where(a >= b, a - b, (a + np.uint32(P)) - b)


def neg(a):
    a = np.asarray(a, np.uint32)
    return np.where(a == 0, a, np.uint32(P) - a)


def mul(a, b):
    a = np.asarray(a, np.uint32)
    b = np.asarray(b, np.uint32)
    if a.size >= 4096 and (a.shape == b.shape or b.ndim == 0):
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is not None:
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            ac = np.ascontiguousarray(a)
            out = np.empty_like(ac)
            if b.ndim == 0:
                lib.base_mul_scalar(ac.ctypes.data_as(u32p),
                                    ctypes.c_uint32(int(b)),
                                    out.ctypes.data_as(u32p), ac.size)
            else:
                bc = np.ascontiguousarray(b)
                lib.base_mul_batch(ac.ctypes.data_as(u32p),
                                   bc.ctypes.data_as(u32p),
                                   out.ctypes.data_as(u32p), ac.size)
            return out
    return ((a.astype(np.uint64) * b.astype(np.uint64)) % PNP).astype(np.uint32)


def pow_scalar(a: int, e: int) -> int:
    return pow(int(a), int(e), P)


def inv(a):
    """Element-wise inverse via Fermat (vectorized square-and-multiply)."""
    a = np.asarray(a, np.uint32)
    e = P - 2
    result = np.ones_like(a)
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def batch_inv(a):
    """Montgomery batch inversion: one inversion for n elements."""
    a = np.asarray(a, np.uint32).ravel()
    n = a.size
    if n == 0:
        return a
    prefix = np.empty(n, np.uint32)
    acc = np.uint32(1)
    for i in range(n):  # small-n host helper; use inv() for big arrays
        prefix[i] = acc
        acc = np.uint32((int(acc) * int(a[i])) % P)
    total_inv = np.uint32(pow(int(acc), P - 2, P))
    out = np.empty(n, np.uint32)
    for i in range(n - 1, -1, -1):
        out[i] = np.uint32((int(total_inv) * int(prefix[i])) % P)
        total_inv = np.uint32((int(total_inv) * int(a[i])) % P)
    return out


def sum_mod(x, axis=0):
    """Modular sum along an axis (values < P, exact via uint64 then mod)."""
    x = np.asarray(x, np.uint64)
    n = x.shape[axis]
    # sums of < 2^33 terms of < 2^31 values fit uint64
    assert n < (1 << 33)
    return (x.sum(axis=axis, dtype=np.uint64) % PNP).astype(np.uint32)


def mul_mat(rows: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """(N, k) x (m, k) matrix: out[n, i] = sum_j rows[n, j] * mat[i, j] mod P.

    Split-radix matmul: mat = hi*2^16 + lo keeps every partial product
    under 2^47, so k <= 16 products accumulate exactly in uint64 with a
    single final reduction (no per-product modulo, no (N,m,k) temporary)."""
    rows64 = np.asarray(rows, np.uint64)
    mat64 = np.asarray(mat, np.uint64)
    assert mat64.shape[-1] <= 16
    lo = (mat64 & 0xFFFF).T  # (k, m); products < 2^47, sums < 2^51
    hi = (mat64 >> 16).T  # entries < 2^15; products < 2^46
    out = (rows64 @ lo) % PNP
    out += ((rows64 @ hi) % PNP) << 16
    return (out % PNP).astype(np.uint32)


def two_adic_generator(bits: int) -> int:
    assert 0 <= bits <= TWO_ADICITY
    return TWO_ADIC_GENERATORS[bits]


# ----------------------------------------------------------------------------
# Quintic extension: arrays with trailing axis of size 5.
# ----------------------------------------------------------------------------


def eadd(a, b):
    return add(a, b)


def esub(a, b):
    return sub(a, b)


def emul(a, b):
    """Extension mul over F[X]/(X^5 + X^2 - 1); trailing axis = 5 coeffs.

    Same reduction schedule as the reference quintic_mul
    (quintic_extension/extension.rs:529-549). Routes to the native C
    kernel when available (10x over the numpy convolution).
    """
    a = np.asarray(a, np.uint32)
    b = np.asarray(b, np.uint32)
    from ..native import get_quintic_lib
    lib = get_quintic_lib()
    if lib is not None:
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        if b.shape == (5,) and a.ndim >= 2:
            ac = np.ascontiguousarray(a)
            bc = np.ascontiguousarray(b)
            out = np.empty_like(ac)
            lib.quintic_mul_scalar_batch(ac.ctypes.data_as(u32p),
                                         bc.ctypes.data_as(u32p),
                                         out.ctypes.data_as(u32p),
                                         a.size // 5)
            return out
        if a.shape == (5,) and b.ndim >= 2:
            bc = np.ascontiguousarray(b)
            ac = np.ascontiguousarray(a)
            out = np.empty_like(bc)
            lib.quintic_mul_scalar_batch(bc.ctypes.data_as(u32p),
                                         ac.ctypes.data_as(u32p),
                                         out.ctypes.data_as(u32p),
                                         b.size // 5)
            return out
        if a.shape != b.shape:
            a, b = np.broadcast_arrays(a, b)
        ac = np.ascontiguousarray(a)
        bc = np.ascontiguousarray(b)
        out = np.empty_like(ac)
        lib.quintic_mul_batch(ac.ctypes.data_as(u32p),
                              bc.ctypes.data_as(u32p),
                              out.ctypes.data_as(u32p), ac.size // 5)
        return out
    a64 = a.astype(np.uint64)
    b64 = b.astype(np.uint64)
    # full convolution; products reduced mod P before accumulation
    # (5 raw 62-bit products can exceed 2^64 — sums of reduced values
    # stay < 9 * 2^31, exact in uint64)
    c = [np.zeros(np.broadcast_shapes(a.shape[:-1], b.shape[:-1]), np.uint64)
         for _ in range(9)]
    for i in range(5):
        for j in range(5):
            c[i + j] = c[i + j] + (a64[..., i] * b64[..., j]) % PNP
    for k in range(9):
        c[k] = c[k] % PNP
    # X^{5+k} = X^k - X^{2+k}
    for k in range(3, -1, -1):
        hi = c[5 + k]
        c[k] = (c[k] + hi) % PNP
        c[k + 2] = (c[k + 2] + PNP - hi) % PNP
    return np.stack([c[i].astype(np.uint32) for i in range(5)], axis=-1)


def escalar_mul(a, s):
    """Extension * base-field scalar (broadcast over trailing axis)."""
    a = np.asarray(a, np.uint32)
    s = np.asarray(s, np.uint32)
    if (a.ndim == s.ndim + 1 and a.shape[:-1] == s.shape
            and a.shape[-1] == EXT_DEGREE and a.size >= 4096):
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is not None:
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            ac = np.ascontiguousarray(a).reshape(-1, EXT_DEGREE)
            sc = np.ascontiguousarray(s).reshape(-1)
            out = np.empty_like(ac)
            lib.base_rowscale(ac.ctypes.data_as(u32p),
                              sc.ctypes.data_as(u32p),
                              out.ctypes.data_as(u32p), sc.size)
            return out.reshape(a.shape)
    return mul(a, s[..., None])


def efrom_base(x):
    x = np.asarray(x, np.uint32)
    out = np.zeros(x.shape + (EXT_DEGREE,), np.uint32)
    out[..., 0] = x
    return out


def _efrobenius(a, frob_rows):
    out = np.zeros_like(a)
    out[..., 0] = a[..., 0]
    for i in range(4):
        for j in range(5):
            out[..., j] = add(out[..., j], mul(a[..., i + 1], frob_rows[i][j]))
    return out


_FROB = None


def efrobenius(a, count: int = 1):
    from .constants import FROBENIUS_MATRIX

    global _FROB
    if _FROB is None:
        _FROB = [[np.uint32(v) for v in row] for row in FROBENIUS_MATRIX]
    a = np.asarray(a, np.uint32)
    for _ in range(count % 5):
        a = _efrobenius(a, _FROB)
    return a


def einv(a):
    """Extension inverse via norm map (extension.rs:585-606)."""
    a = np.asarray(a, np.uint32)
    a_q = efrobenius(a)
    a_q_qsq = efrobenius(emul(a, a_q))
    prod_conj = emul(a_q_qsq, efrobenius(a_q_qsq, 2))
    # norm = first coefficient of a * prod_conj (lands in base field)
    pc = prod_conj
    norm = mul(a[..., 0], pc[..., 0])
    norm = add(norm, mul(a[..., 1], pc[..., 4]))
    norm = add(norm, mul(a[..., 2], pc[..., 3]))
    norm = add(norm, mul(a[..., 3], pc[..., 2]))
    norm = add(norm, mul(a[..., 4], sub(pc[..., 1], pc[..., 4])))
    return escalar_mul(prod_conj, inv(norm))


def epow(a, e: int):
    a = np.asarray(a, np.uint32)
    result = efrom_base(np.ones(a.shape[:-1], np.uint32))
    base = a
    while e:
        if e & 1:
            result = emul(result, base)
        base = emul(base, base)
        e >>= 1
    return result
