"""Device-side KoalaBear arithmetic: Montgomery form on uint32 JAX arrays.

Design (TPU-first):
  * Field elements live as uint32 lanes in **Montgomery form** (R = 2^32),
    matching the reference representation
    (/root/reference/crates/backend/koala-bear/src/monty_31/monty_31.rs) so
    precomputed protocol constants carry over value-for-value.
  * A 31x31->62-bit modular multiply is emulated with 16-bit limb splits:
    7 uint32 multiplies per field multiply (the prime's limbs are
    P = 0x7f00_0001 -> P_hi = 0x7f00, P_lo = 1, so mulhi(t, P) costs only
    2 multiplies; MU = 0x8100_0001 similarly keeps t = lo*MU to 1 multiply).
  * Everything is shape-polymorphic elementwise math: XLA fuses these chains
    into single VPU loops; Pallas kernels reuse the same functions on Refs.

Extension field elements are arrays with a trailing axis of length 5 over
F[X]/(X^5 + X^2 - 1) (quintic_extension/extension.rs:26).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import FROBENIUS_MATRIX, MONTY_MU, P, R2_MOD_P, R_MOD_P

U32 = jnp.uint32
_P = np.uint32(P)
_MU = np.uint32(MONTY_MU)
_P_HI = np.uint32(P >> 16)  # 0x7f00
_MASK16 = np.uint32(0xFFFF)

# ----------------------------------------------------------------------------
# Montgomery mul core
# ----------------------------------------------------------------------------


def _mul_full(a, b):
    """Full 62-bit product of two uint32 < 2^31 as (hi, lo) uint32 pair."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    mid = (a0 * b1) + (ll >> 16)          # < 2^32 - 2^16: no overflow
    hl = a1 * b0
    mid2 = mid + hl
    carry = (mid2 < hl).astype(U32)       # unsigned wrap detection
    lo = (mid2 << 16) | (ll & _MASK16)
    hi = (a1 * b1) + (mid2 >> 16) + (carry << 16)
    return hi, lo


def _monty_reduce(hi, lo):
    """Montgomery reduction of hi*2^32 + lo (< P*2^32) -> value*R^{-1} mod P."""
    t = lo * _MU                          # wrapping low 32 bits
    # u_hi = mulhi(t, P); exploits P = 0x7f00*2^16 + 1.
    t0 = t & _MASK16
    t1 = t >> 16
    mid = t1 + t0 * _P_HI                 # t0*P_hi < 2^31, t1 < 2^16
    u_hi = t1 * _P_HI + (mid >> 16)
    # low 32 bits of t*P equal lo exactly, so (x - t*P) >> 32 == hi - u_hi.
    r = hi - u_hi
    return jnp.where(hi < u_hi, r + _P, r)


def mul(a, b):
    """Montgomery product: (a * b * R^{-1}) mod P. Both operands monty-form."""
    hi, lo = _mul_full(a, b)
    return _monty_reduce(hi, lo)


def add(a, b):
    s = a + b
    return jnp.where(s >= _P, s - _P, s)


def sub(a, b):
    return jnp.where(a >= b, a - b, a + (_P - b))


def neg(a):
    return jnp.where(a == 0, a, _P - a)


def double(a):
    return add(a, a)


def halve(a):
    """a/2 mod P: (a + P*(a odd)) >> 1."""
    odd = a & np.uint32(1)
    return jnp.where(odd != 0, (a >> 1) + np.uint32((P + 1) // 2), a >> 1)


def from_u32(x):
    """Canonical uint32 -> Montgomery form (on device)."""
    return mul(x.astype(U32), jnp.full(x.shape, np.uint32(R2_MOD_P), U32))


def to_u32(a):
    """Montgomery form -> canonical uint32 (monty_reduce(a))."""
    return _monty_reduce(jnp.zeros_like(a), a)


def to_monty_np(x) -> np.ndarray:
    """Host-side canonical -> monty conversion (numpy, exact)."""
    x = np.asarray(x, np.uint64)
    return ((x << 32) % np.uint64(P)).astype(np.uint32)


def from_monty_np(x) -> np.ndarray:
    """Host-side monty -> canonical conversion (numpy, exact)."""
    x = np.asarray(x, np.uint64)
    rinv = pow(1 << 32, P - 2, P)
    return ((x * np.uint64(rinv)) % np.uint64(P)).astype(np.uint32)


MONTY_ONE = np.uint32(R_MOD_P)
MONTY_TWO = np.uint32((2 << 32) % P)


def const_monty(v: int) -> np.uint32:
    """Montgomery form of a Python-int constant (host-side)."""
    return np.uint32((v << 32) % P)


def cube(a):
    return mul(mul(a, a), a)


def pow_const(a, e: int):
    """a^e for a static exponent (square-and-multiply, unrolled at trace)."""
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if result is None:
        return jnp.full(jnp.shape(a), MONTY_ONE, U32)
    return result


def inv(a):
    """a^{P-2}: element-wise field inverse (0 maps to 0)."""
    return pow_const(a, P - 2)


def sum_mod(x, axis: int = 0):
    """Modular sum along `axis` — uint32-safe (JAX runs without x64).

    Binary tree of modular adds: log2(N) fused elementwise passes.
    """
    n = x.shape[axis]
    x = jnp.moveaxis(x, axis, 0)
    # pad to a power of two with zeros
    pot = 1 if n == 0 else 1 << (n - 1).bit_length()
    if pot != n:
        pad = [(0, pot - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = add(x[:half], x[half:])
    return x[0]


# ----------------------------------------------------------------------------
# Quintic extension ops: trailing axis of length 5
# ----------------------------------------------------------------------------


def eadd(a, b):
    return add(a, b)


def esub(a, b):
    return sub(a, b)


def _dot5(a_cols, b_cols):
    acc_hi, acc_lo = _mul_full(a_cols[0], b_cols[0])
    acc = _monty_reduce(acc_hi, acc_lo)
    for i in range(1, 5):
        acc = add(acc, mul(a_cols[i], b_cols[i]))
    return acc


def emul(a, b):
    """Extension multiply; reduction schedule mirrors quintic_mul
    (quintic_extension/extension.rs:529-549).

    Evaluated COLUMN-WISE: each output coefficient is a 5-term
    multiply-accumulate over (...,)-shaped lanes, so every intermediate
    is the input's size and the whole product fuses into one elementwise
    pass. (An earlier (..., 5, 5)-tensor formulation materialized a
    25x-padded HLO temp — 5 GB for a 2^25-row GKR layer on TPU.)"""
    av = [a[..., i] for i in range(5)]
    bv = [b[..., i] for i in range(5)]
    b_0_m3 = sub(bv[0], bv[3])
    b_1_m4 = sub(bv[1], bv[4])
    b_4_m2 = sub(bv[4], bv[2])
    b_3_m14 = sub(bv[3], b_1_m4)
    # rows of the schedule matrix: c_k = sum_i a_i * B[i][k]
    B = (
        (bv[0], bv[1], bv[2], bv[3], bv[4]),
        (bv[4], bv[0], b_1_m4, bv[2], bv[3]),
        (bv[3], bv[4], b_0_m3, b_1_m4, bv[2]),
        (bv[2], bv[3], b_4_m2, b_0_m3, b_1_m4),
        (b_1_m4, bv[2], b_3_m14, b_4_m2, b_0_m3),
    )
    cols = []
    for k in range(5):
        acc = mul(av[0], B[0][k])
        for i in range(1, 5):
            acc = add(acc, mul(av[i], B[i][k]))
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def escalar_mul(a, s):
    """Extension element times base-field element (broadcasts trailing axis)."""
    return mul(a, s[..., None])


def efrom_base(x):
    zeros = jnp.zeros(jnp.shape(x) + (4,), U32)
    return jnp.concatenate([x[..., None], zeros], axis=-1)


_FROB_MONTY = None


def _frob_rows():
    global _FROB_MONTY
    if _FROB_MONTY is None:
        _FROB_MONTY = np.array(
            [[(v << 32) % P for v in row] for row in FROBENIUS_MATRIX],
            np.uint32,
        )
    return _FROB_MONTY


def efrobenius(a, count: int = 1):
    rows = jnp.asarray(_frob_rows())  # (4, 5)
    for _ in range(count % 5):
        prods = mul(a[..., 1:, None], rows)          # (..., 4, 5)
        s = add(add(prods[..., 0, :], prods[..., 1, :]),
                add(prods[..., 2, :], prods[..., 3, :]))
        a = jnp.concatenate(
            [add(s[..., :1], a[..., :1]), s[..., 1:]], axis=-1)
    return a


def einv(a):
    """Extension inverse via the norm map (extension.rs:585-606)."""
    a_q = efrobenius(a)
    a_q_qsq = efrobenius(emul(a, a_q))
    pc = emul(a_q_qsq, efrobenius(a_q_qsq, 2))
    norm = _dot5(
        [a[..., i] for i in range(5)],
        [pc[..., 0], pc[..., 4], pc[..., 3], pc[..., 2],
         sub(pc[..., 1], pc[..., 4])],
    )
    return escalar_mul(pc, inv(norm))
