"""Host-side (numpy) multilinear polynomial toolkit.

Conventions follow the reference poly layer (crates/backend/poly):
  * Evaluation tables are length 2^n with **big-endian** variable order:
    index i has binary decomposition (x_1..x_n), x_1 = MSB = point[0].
  * `fold` fixes the FIRST variable (MSB): out[i] = m[i] + a*(m[i+half]-m[i])
    (utils.rs:162-186); `fold_lsb` fixes the LAST variable
    (utils.rs:94-115).
  * `expand_from_univariate(y, n) = [y, y^2, y^4, ...]` (point.rs:51-60).

Base-field tables: uint32 (N,). Extension tables: uint32 (N, 5).
Extension scalars: uint32 (5,).
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..field.constants import EXT_DEGREE, P

EONE = np.array([1, 0, 0, 0, 0], np.uint32)
EZERO = np.zeros(5, np.uint32)


def is_ext(arr: np.ndarray) -> bool:
    return arr.ndim >= 1 and arr.shape[-1] == EXT_DEGREE and arr.ndim == 2


def efrom_base_table(evals: np.ndarray) -> np.ndarray:
    out = np.zeros(evals.shape + (EXT_DEGREE,), np.uint32)
    out[..., 0] = evals
    return out


# ----------------------------------------------------------------------------
# Evaluation
# ----------------------------------------------------------------------------


def eval_mle(evals: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Evaluate an MLE table at an extension point. Returns (5,) EF scalar.

    evals: (2^n,) base or (2^n, 5) extension; point: (n, 5).
    """
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DEGREE)
    n = len(point)
    assert evals.shape[0] == 1 << n
    if n >= 10 and evals.dtype == np.uint32:
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is not None:
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            ev = np.ascontiguousarray(evals)
            pc = np.ascontiguousarray(point)
            out = np.empty(EXT_DEGREE, np.uint32)
            lib.eval_mle(ev.ctypes.data_as(u32p),
                         1 if evals.ndim == 2 else 0,
                         pc.ctypes.data_as(u32p), n,
                         out.ctypes.data_as(u32p))
            return out
    cur = evals
    for k in range(n):
        half = cur.shape[0] // 2
        lo, hi = cur[:half], cur[half:]
        diff = nf.sub(hi, lo)
        x = point[k]
        if cur.ndim == 1:  # base-field table: scalar-mul into EF
            term = nf.escalar_mul(np.broadcast_to(x, (half, EXT_DEGREE)), diff)
            cur = nf.eadd(efrom_base_table(lo), term)
        else:
            term = nf.emul(diff, np.broadcast_to(x, (half, EXT_DEGREE)))
            cur = nf.eadd(lo, term)
    if cur.ndim == 1:
        return efrom_base_table(cur)[0]
    return cur[0]


def eval_mle_base_point(evals: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Evaluate with a base-field point: point (n,) uint32."""
    point = np.asarray(point, np.uint32).ravel()
    cur = np.asarray(evals)
    for x in point:
        half = cur.shape[0] // 2
        diff = nf.sub(cur[half:], cur[:half])
        cur = nf.add(cur[:half],
                     nf.mul(diff, np.broadcast_to(np.uint32(x), diff.shape)))
    return cur[0]


# ----------------------------------------------------------------------------
# Folds
# ----------------------------------------------------------------------------


def fold(m: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Fix the FIRST (most-significant) variable to alpha (EF scalar)."""
    half = m.shape[0] // 2
    alpha = np.asarray(alpha, np.uint32)
    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is not None and alpha.shape == (EXT_DEGREE,) and m.ndim <= 2:
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        mc = np.ascontiguousarray(m, np.uint32)
        ac = np.ascontiguousarray(alpha)
        out = np.empty((half, EXT_DEGREE), np.uint32)
        fn = lib.fold_base if m.ndim == 1 else lib.fold_ext
        fn(mc.ctypes.data_as(u32p), ac.ctypes.data_as(u32p),
           out.ctypes.data_as(u32p), half)
        return out
    lo, hi = m[:half], m[half:]
    diff = nf.sub(hi, lo)
    if m.ndim == 1:
        term = nf.escalar_mul(np.broadcast_to(alpha, (half, EXT_DEGREE)), diff)
        return nf.eadd(efrom_base_table(lo), term)
    return nf.eadd(lo, nf.emul(diff, np.broadcast_to(alpha, (half, EXT_DEGREE))))


def fold_lsb(m: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Fix the LAST (least-significant) variable to alpha (EF scalar)."""
    lo = m[0::2]
    hi = m[1::2]
    diff = nf.sub(hi, lo)
    alpha = np.asarray(alpha, np.uint32)
    half = lo.shape[0]
    if m.ndim == 1:
        term = nf.escalar_mul(np.broadcast_to(alpha, (half, EXT_DEGREE)), diff)
        return nf.eadd(efrom_base_table(lo), term)
    return nf.eadd(lo, nf.emul(diff, np.broadcast_to(alpha, (half, EXT_DEGREE))))


def fold_at_bit(m: np.ndarray, alpha: np.ndarray, bit: int) -> np.ndarray:
    """Fix the variable at `bit` positions from the LSB (utils.rs:117-160)."""
    if bit == 0:
        return fold_lsb(m, alpha)
    n = m.shape[0]
    shape_hi = n >> (bit + 1)
    view = m.reshape((shape_hi, 2, 1 << bit) + m.shape[1:])
    lo = view[:, 0].reshape((n // 2,) + m.shape[1:])
    hi = view[:, 1].reshape((n // 2,) + m.shape[1:])
    diff = nf.sub(hi, lo)
    alpha = np.asarray(alpha, np.uint32)
    half = lo.shape[0]
    if m.ndim == 1:
        term = nf.escalar_mul(np.broadcast_to(alpha, (half, EXT_DEGREE)), diff)
        return nf.eadd(efrom_base_table(lo), term)
    return nf.eadd(lo, nf.emul(diff, np.broadcast_to(alpha, (half, EXT_DEGREE))))


# ----------------------------------------------------------------------------
# eq tables
# ----------------------------------------------------------------------------


def eval_eq(point: np.ndarray, scalar: np.ndarray | None = None) -> np.ndarray:
    """eq-table (2^n, 5): out[x] = scalar * eq(x, point), big-endian x.

    (eq_mle.rs:16-26)"""
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DEGREE)
    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is not None:
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        s = np.ascontiguousarray(EONE if scalar is None
                                 else np.asarray(scalar, np.uint32))
        pc = np.ascontiguousarray(point)
        out = np.empty((1 << len(point), EXT_DEGREE), np.uint32)
        lib.eval_eq(pc.ctypes.data_as(u32p), len(point),
                    s.ctypes.data_as(u32p), out.ctypes.data_as(u32p))
        return out
    out = (EONE if scalar is None else np.asarray(scalar, np.uint32))[None, :]
    for alpha in point:
        a = np.broadcast_to(alpha, out.shape)
        hi = nf.emul(out, a)
        lo = nf.esub(out, hi)  # out*(1-alpha)
        out = np.stack([lo, hi], axis=1).reshape(-1, EXT_DEGREE)
    return out


def add_scaled_eq(dst: np.ndarray, point: np.ndarray,
                  scalar: np.ndarray) -> np.ndarray:
    """dst += scalar * eq(., point) over the full (2^n, 5) table.

    Splits the point into prefix/suffix halves and accumulates the
    tensor product eq_hi x eq_lo directly into dst (one quintic mul +
    add per cell, no 2^n temporary — the reference's SplitEq idea,
    whir/src/whir/split_eq.rs). dst must be C-contiguous uint32."""
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DEGREE)
    n = len(point)
    assert dst.shape == (1 << n, EXT_DEGREE)
    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is None or n < 4 or not dst.flags.c_contiguous:
        block = eval_eq(point, scalar)
        np.copyto(dst, nf.eadd(dst, block))
        return dst
    import ctypes
    u32p = ctypes.POINTER(ctypes.c_uint32)
    a = n // 2
    hi = eval_eq(point[:a], scalar)  # (2^a, 5), carries the scalar
    lo = eval_eq(point[a:])  # (2^(n-a), 5)
    lib.eq_outer_add(dst.ctypes.data_as(u32p), hi.ctypes.data_as(u32p),
                     len(hi), lo.ctypes.data_as(u32p), len(lo))
    return dst


def eq_poly_outside(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """eq(a, b) for two EF points (n,5) each (point.rs:77-91)."""
    a = np.asarray(a, np.uint32).reshape(-1, EXT_DEGREE)
    b = np.asarray(b, np.uint32).reshape(-1, EXT_DEGREE)
    acc = EONE.copy()
    for l, r in zip(a, b):
        lr = nf.emul(l, r)
        term = nf.esub(nf.eadd(EONE, nf.eadd(lr, lr)), nf.eadd(l, r))
        acc = nf.emul(acc, term)
    return acc


def expand_from_univariate(y: np.ndarray, n: int) -> np.ndarray:
    """[y, y^2, y^4, ...] (point.rs:51-60). y: (5,) -> (n, 5)."""
    out = []
    cur = np.asarray(y, np.uint32)
    for _ in range(n):
        out.append(cur)
        cur = nf.emul(cur, cur)
    return np.stack(out) if out else np.zeros((0, EXT_DEGREE), np.uint32)


# ----------------------------------------------------------------------------
# next / padding MLEs (verifier-side helpers)
# ----------------------------------------------------------------------------


def next_mle(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """MLE of the 'y = x + 1' relation with 2^n-1 wraparound fixed point
    (next_mle.rs:9-29)."""
    x = np.asarray(x, np.uint32).reshape(-1, EXT_DEGREE)
    y = np.asarray(y, np.uint32).reshape(-1, EXT_DEGREE)
    n = len(x)
    eq_prefix = [EONE.copy()]
    for i in range(n):
        xy = nf.emul(x[i], y[i])
        eq_i = nf.esub(nf.eadd(EONE, nf.eadd(xy, xy)), nf.eadd(x[i], y[i]))
        eq_prefix.append(nf.emul(eq_prefix[i], eq_i))
    low_suffix = [EONE.copy() for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        low_suffix[i] = nf.emul(low_suffix[i + 1],
                                nf.emul(x[i], nf.esub(EONE, y[i])))
    total = EZERO.copy()
    for k in range(n):
        carry = nf.emul(nf.esub(EONE, x[k]), y[k])
        total = nf.eadd(total, nf.emul(eq_prefix[k],
                                       nf.emul(carry, low_suffix[k + 1])))
    prod = EONE.copy()
    for v in list(x) + list(y):
        prod = nf.emul(prod, v)
    return nf.eadd(total, prod)


def matrix_next_mle_folded(outer: np.ndarray) -> np.ndarray:
    """Dense table next_mle(outer, y) over all y (next_mle.rs:35-53)."""
    outer = np.asarray(outer, np.uint32).reshape(-1, EXT_DEGREE)
    n = len(outer)
    res = np.zeros((1 << n, EXT_DEGREE), np.uint32)
    for k in range(n):
        prod = nf.esub(EONE, outer[n - k - 1])
        for v in outer[n - k:]:
            prod = nf.emul(prod, v)
        eq_tab = eval_eq(outer[:n - k - 1], prod)
        idx = (np.arange(len(eq_tab)) << (k + 1)) + (1 << k)
        res[idx] = nf.eadd(res[idx], eq_tab)
    prod = EONE.copy()
    for v in outer:
        prod = nf.emul(prod, v)
    res[-1] = nf.eadd(res[-1], prod)
    return res


def mle_of_zeros_then_ones(n_zeros: int, point: np.ndarray) -> np.ndarray:
    """MLE of [0]*n_zeros + [1]*(2^n - n_zeros) at `point` (mle_custom.rs:4-19)."""
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DEGREE)
    n_values = 1 << len(point)
    assert n_zeros <= n_values
    if n_zeros == 0:
        return EONE.copy()
    if n_zeros == n_values:
        return EZERO.copy()
    half = n_values // 2
    if n_zeros < half:
        rec = mle_of_zeros_then_ones(n_zeros, point[1:])
        return nf.eadd(nf.emul(nf.esub(EONE, point[0]), rec), point[0])
    return nf.emul(point[0], mle_of_zeros_then_ones(n_zeros - half, point[1:]))


# ----------------------------------------------------------------------------
# Univariate dense polynomials (verifier-side)
# ----------------------------------------------------------------------------


def horner_eval(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Evaluate coeff-form poly (k,5) at EF x (5,) via Horner."""
    coeffs = np.asarray(coeffs, np.uint32).reshape(-1, EXT_DEGREE)
    acc = EZERO.copy()
    for c in coeffs[::-1]:
        acc = nf.eadd(nf.emul(acc, x), c)
    return acc


_LAGRANGE_M: dict = {}


def _lagrange_matrix(xs: tuple) -> np.ndarray:
    """Inverse Vandermonde mod P for small integer point sets (cached):
    coeffs = M @ ys."""
    if xs in _LAGRANGE_M:
        return _LAGRANGE_M[xs]
    n = len(xs)
    aug = [[pow(int(x) % P, j, P) for j in range(n)]
           + [1 if c == i else 0 for c in range(n)]
           for i, x in enumerate(xs)]
    for col in range(n):
        piv = next(r for r in range(col, n) if aug[r][col] % P != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = pow(aug[col][col], P - 2, P)
        aug[col] = [(v * inv) % P for v in aug[col]]
        for r in range(n):
            if r != col and aug[r][col]:
                f = aug[r][col]
                aug[r] = [(a - f * b) % P for a, b in zip(aug[r], aug[col])]
    # rows of the inverse map VALUES -> coefficient j:  c = V^-1 ys
    vinv = np.array([[aug[r][n + c] for c in range(n)] for r in range(n)],
                    np.uint64)
    _LAGRANGE_M[xs] = vinv
    return vinv


def lagrange_interpolation(xs: list[int], ys: np.ndarray) -> np.ndarray:
    """Interpolate EF values at distinct base-field ints -> (k,5) coeffs.

    (dense_poly.rs:33-108 semantics; implemented as a cached
    inverse-Vandermonde matmul — the point sets {0,1,2,..,d} are fixed
    per degree, so no per-call field inversions.)"""
    ys = np.asarray(ys, np.uint32).reshape(-1, EXT_DEGREE)
    n = len(xs)
    assert len(set(xs)) == n
    if n <= 16:
        m = _lagrange_matrix(tuple(int(x) % P for x in xs))
        mh, ml = m >> 16, m & 0xFFFF
        y64 = ys.astype(np.uint64)
        acc = (((mh @ y64) % P) << 16) + (ml @ y64)
        return (acc % P).astype(np.uint32)
    result = np.zeros((0, EXT_DEGREE), np.uint32)
    basis = np.zeros((1, EXT_DEGREE), np.uint32)
    basis[0] = EONE
    for i in range(n):
        xi = np.uint32(xs[i] % P)
        # value of current result at xi
        cur = horner_eval(result, efrom_base_scalar(xi)) if len(result) else EZERO
        # basis(xi)
        bx = horner_eval(basis, efrom_base_scalar(xi))
        coeff = nf.emul(nf.esub(ys[i], cur), nf.einv(bx))
        # result += coeff * basis
        add_term = nf.emul(basis, np.broadcast_to(coeff, basis.shape))
        if len(result) < len(basis):
            result = np.concatenate(
                [result, np.zeros((len(basis) - len(result), EXT_DEGREE),
                                  np.uint32)])
        result = nf.eadd(result, add_term)
        # basis *= (x - xi)
        neg_xi = efrom_base_scalar(np.uint32((P - int(xi)) % P))
        shifted = np.concatenate([np.zeros((1, EXT_DEGREE), np.uint32), basis])
        scaled = np.concatenate(
            [nf.emul(basis, np.broadcast_to(neg_xi, basis.shape)),
             np.zeros((1, EXT_DEGREE), np.uint32)])
        basis = nf.eadd(shifted, scaled)
    return result


_BITREV_CACHE: dict = {}


def bit_reverse_permutation(data: np.ndarray) -> np.ndarray:
    """Reorder axis 0 by bit-reversed index (evals.rs:57-66)."""
    n = data.shape[0]
    rev = _BITREV_CACHE.get(n)
    if rev is None:
        log_n = n.bit_length() - 1
        idx = np.arange(n)
        rev = np.zeros(n, np.int64)
        for b in range(log_n):
            rev |= ((idx >> b) & 1) << (log_n - 1 - b)
        _BITREV_CACHE[n] = rev
    if data.dtype == np.uint32 and data.flags.c_contiguous:
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is not None:
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            i64p = ctypes.POINTER(ctypes.c_long)
            w = int(np.prod(data.shape[1:], dtype=np.int64))
            out = np.empty_like(data)
            lib.gather_rows(data.ctypes.data_as(u32p),
                            rev.ctypes.data_as(i64p), n, w,
                            out.ctypes.data_as(u32p))
            return out
    return data[rev]


def evals_to_coeffs(data: np.ndarray) -> np.ndarray:
    """Hypercube evals -> multilinear coefficient basis (evals.rs:44-55).

    coeff index MSB pairs with point[0] in eval_multilinear_coeffs."""
    data = np.asarray(data, np.uint32).copy()
    n = data.shape[0]
    half = 1
    while half < n:
        view = data.reshape((n // (2 * half), 2, half) + data.shape[1:])
        hi = nf.sub(view[:, 1], view[:, 0])
        data = np.concatenate([view[:, 0, None], hi[:, None]],
                              axis=1).reshape(data.shape)
        half <<= 1
    return bit_reverse_permutation(data)


def eval_multilinear_coeffs(coeffs: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Evaluate coefficient-basis multilinear at EF point (evals.rs:69-83)."""
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DEGREE)
    cur = np.asarray(coeffs, np.uint32)
    if cur.ndim == 1:
        cur = efrom_base_table(cur)
    for x in point:
        half = cur.shape[0] // 2
        c0, c1 = cur[:half], cur[half:]
        cur = nf.eadd(c0, nf.emul(c1, np.broadcast_to(x, c1.shape)))
    return cur[0]


def efrom_base_scalar(x) -> np.ndarray:
    out = EZERO.copy()
    out[0] = np.uint32(x)
    return out


def to_big_endian_in_field(value: int, n_bits: int) -> np.ndarray:
    """Big-endian bit decomposition as EF elements (n_bits, 5)."""
    out = np.zeros((n_bits, EXT_DEGREE), np.uint32)
    for i in range(n_bits):
        out[i, 0] = (value >> (n_bits - 1 - i)) & 1
    return out
