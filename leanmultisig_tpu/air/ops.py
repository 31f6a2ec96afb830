"""Field-generic value ops for AIR constraint evaluation.

Values are numpy arrays: base = (M,) uint32, ext = (M, 5) uint32 (M = number
of rows evaluated simultaneously; M=1 for verifier point evaluation).
Python ints are base constants. Mirrors the role of the reference's
`Algebra` generic dispatch (air/src/lib.rs AB::F / AB::IF / AB::EF).
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..field.constants import P


def _sym(a):
    from .symbolic import Sym
    return isinstance(a, Sym)


def is_ext(a) -> bool:
    return isinstance(a, np.ndarray) and a.ndim == 2


def _coerce(a, b):
    """Broadcast int constants and base/ext mixes to a common kind."""
    ai = isinstance(a, int)
    bi = isinstance(b, int)
    if ai and bi:
        return np.uint32(a % P), np.uint32(b % P), False
    if ai:
        a = np.uint32(a % P)
        if is_ext(b):
            ae = np.zeros((1, 5), np.uint32)
            ae[0, 0] = a
            return ae, b, True
        return a, b, False
    if bi:
        b2, a2, e = _coerce(b, a)
        return a2, b2, e
    ae, be = is_ext(a), is_ext(b)
    if ae == be:
        return a, b, ae
    if ae:
        bx = np.zeros(b.shape + (5,), np.uint32)
        bx[..., 0] = b
        return a, bx, True
    ax = np.zeros(a.shape + (5,), np.uint32)
    ax[..., 0] = a
    return ax, b, True


def add(a, b):
    if _sym(a) or _sym(b):
        from .symbolic import sym_add
        return sym_add(a, b)
    a, b, _ = _coerce(a, b)
    return nf.add(a, b)


def sub(a, b):
    if _sym(a) or _sym(b):
        from .symbolic import sym_sub
        return sym_sub(a, b)
    a, b, _ = _coerce(a, b)
    return nf.sub(a, b)


def neg(a):
    if _sym(a):
        from .symbolic import sym_sub
        return sym_sub(0, a)
    if isinstance(a, int):
        return (P - a % P) % P
    return nf.neg(a)


def mul(a, b):
    if _sym(a) or _sym(b):
        from .symbolic import sym_mul
        return sym_mul(a, b)
    # base*ext keeps base broadcast over the coefficient axis (cheap path)
    if isinstance(a, int):
        a = np.uint32(a % P)
    if isinstance(b, int):
        b = np.uint32(b % P)
    a_ext, b_ext = is_ext(a), is_ext(b)
    if a_ext and b_ext:
        return nf.emul(a, b)
    if a_ext:
        return nf.mul(a, np.asarray(b, np.uint32)[..., None])
    if b_ext:
        return nf.mul(b, np.asarray(a, np.uint32)[..., None])
    return nf.mul(np.asarray(a, np.uint32), np.asarray(b, np.uint32))


def double(a):
    return add(a, a)


def halve(a):
    if _sym(a):
        from .symbolic import sym_mul
        return sym_mul(a, (P + 1) // 2)
    if isinstance(a, int):
        a = np.uint32(a % P)
    half_p1 = (P + 1) // 2  # 2^{-1} mod P
    return mul(a, half_p1)


def cube(a):
    return mul(mul(a, a), a)


def dot_const_row(values, consts) -> np.ndarray:
    """sum_j values[j] * consts[j] for base-field consts (MDS rows etc.)."""
    acc = None
    for v, c in zip(values, consts):
        c = int(c)
        if c == 0:
            continue
        term = mul(v, c) if c != 1 else v
        acc = term if acc is None else add(acc, term)
    if acc is None:
        return 0
    return acc
