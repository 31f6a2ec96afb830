"""Device polynomial primitives (Montgomery-form jnp arrays).

Mirrors poly/np_poly.py semantics exactly (fold = fix MSB variable,
eval_eq big-endian, Lagrange via cached inverse Vandermonde); all inputs
and outputs are Montgomery-form uint32 device arrays unless noted.

Reference: crates/backend/poly (eq_mle.rs, utils.rs, evals.rs,
dense_poly.rs).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..field.constants import P

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def monty_const(v: int):
    """Host int -> monty uint32 scalar."""
    return np.uint32((int(v) << 32) % P)


MONTY_ONE = monty_const(1)


def eone_m():
    out = np.zeros(EXT, np.uint32)
    out[0] = MONTY_ONE
    return out


@functools.cache
def _fold_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def fold(cols, r):
        out = []
        for m in cols:
            half = m.shape[0] // 2
            lo, hi = m[:half], m[half:]
            diff = jf.sub(hi, lo)
            rb = jnp.broadcast_to(r, (half, EXT))
            if m.ndim == 1:
                out.append(jf.eadd(jf.efrom_base(lo),
                                   jf.escalar_mul(rb, diff)))
            else:
                out.append(jf.eadd(lo, jf.emul(diff, rb)))
        return out

    return fold


def dfold(cols: list, r):
    """Fix the MSB variable of each column to r ((5,) monty device)."""
    return _fold_fn()(list(cols), r)


@functools.cache
def _eval_mle_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    LOG_CHUNK = 20  # scan-chunk rows for huge polys (temps ~tens of MB)

    def fold_all(cur, point, k0):
        for k in range(k0, point.shape[0]):
            half = cur.shape[0] // 2
            lo, hi = cur[:half], cur[half:]
            diff = jf.sub(hi, lo)
            x = jnp.broadcast_to(point[k], (half, EXT))
            if cur.ndim == 1:
                cur = jf.eadd(jf.efrom_base(lo), jf.escalar_mul(x, diff))
            else:
                cur = jf.eadd(lo, jf.emul(diff, x))
        if cur.ndim == 1:
            return jf.efrom_base(cur)[0]
        return cur[0]

    @aot_jit
    def eval_mle(evals, point):
        n = point.shape[0]
        if n <= LOG_CHUNK + 2:
            return fold_all(evals, point, 0)
        # big poly: fold the top k_top variables as a weighted sum of
        # per-chunk MLE evaluations under lax.scan — peak temp memory is
        # one chunk's fold, not the whole polynomial in extension form
        k_top = n - LOG_CHUNK
        one = jnp.asarray(eone_m())
        eq = one[None, :]  # (1, 5)
        for v in range(k_top - 1, -1, -1):  # last processed = MSB = x_0
            hi = jf.emul(eq, jnp.broadcast_to(point[v], eq.shape))
            eq = jnp.concatenate([jf.esub(eq, hi), hi])
        chunks = evals.reshape((1 << k_top, 1 << LOG_CHUNK)
                               + evals.shape[1:])

        def body(acc, inp):
            chunk, w = inp
            return jf.eadd(acc, jf.emul(w, fold_all(chunk, point, k_top))), \
                None

        acc, _ = jax.lax.scan(body, jnp.zeros(EXT, jnp.uint32),
                              (chunks, eq))
        return acc

    return eval_mle


def deval_mle(evals, point):
    """MLE evaluation -> (5,) monty device scalar. point: (n, 5) monty."""
    return _eval_mle_fn()(evals, point)


@functools.cache
def _eval_mle_cols_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def eval_cols(cols, point):
        """cols: (C, 2^n) base monty; point (n,5) -> (C, 5)."""
        cur = cols
        n = point.shape[0]
        for k in range(n):
            half = cur.shape[1] // 2
            lo, hi = cur[:, :half], cur[:, half:]
            diff = jf.sub(hi, lo)
            x = jnp.broadcast_to(point[k][None, None, :],
                                 (cur.shape[0], half, EXT))
            if cur.ndim == 2:
                cur = jf.eadd(jf.efrom_base(lo), jf.escalar_mul(x, diff))
            else:
                cur = jf.eadd(lo, jf.emul(diff, x))
        return cur[:, 0]

    return eval_cols


def deval_mle_cols(cols, point):
    """Batched MLE eval of stacked base columns (C, 2^n) -> (C, 5)."""
    return _eval_mle_cols_fn()(cols, point)


@functools.cache
def _eval_eq_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def eval_eq(point, scalar):
        out = scalar[None, :]
        for i in range(n):
            a = jnp.broadcast_to(point[i][None, :], out.shape)
            hi = jf.emul(out, a)
            lo = jf.esub(out, hi)
            out = jnp.stack([lo, hi], axis=1).reshape(-1, EXT)
        return out

    return eval_eq


def deval_eq(point, scalar=None):
    """eq table (2^n, 5) monty; big-endian x (eq_mle.rs:16-26)."""
    _, jnp = _jax()
    n = point.shape[0]
    if scalar is None:
        scalar = jnp.asarray(eone_m())
    return _eval_eq_fn(n)(point, scalar)


@functools.cache
def _horner_fn(k: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def horner(coeffs, x):
        acc = coeffs[k - 1]
        for i in range(k - 2, -1, -1):
            acc = jf.eadd(jf.emul(acc, x), coeffs[i])
        return acc

    return horner


def dhorner(coeffs, x):
    """Evaluate coeffs (k, 5) at x (5,) -> (5,)."""
    return _horner_fn(coeffs.shape[0])(coeffs, x)


@functools.lru_cache(maxsize=32)
def _inv_vandermonde_monty(xs: tuple) -> np.ndarray:
    """(k, k) monty inverse Vandermonde over small int xs (host)."""
    k = len(xs)
    v = [[pow(int(x), j, P) for j in range(k)] for x in xs]
    # Gauss-Jordan inverse mod P
    m = [[v[i][j] for j in range(k)] + [int(i == j) for j in range(k)]
         for i in range(k)]
    for col in range(k):
        piv = next(r for r in range(col, k) if m[r][col] % P)
        m[col], m[piv] = m[piv], m[col]
        inv = pow(m[col][col], P - 2, P)
        m[col] = [x * inv % P for x in m[col]]
        for r in range(k):
            if r != col and m[r][col]:
                f = m[r][col]
                m[r] = [(a - f * b) % P for a, b in zip(m[r], m[col])]
    inv_v = np.array([[m[i][k + j] for j in range(k)] for i in range(k)],
                     np.uint64)
    return ((inv_v << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


@functools.cache
def _lagrange_fn(k: int, xs: tuple):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    # coeffs = V^{-1} @ ys; V maps coeffs->evals so coeffs_i = sum_j W[j][i]*y_j
    w = _inv_vandermonde_monty(xs)  # (k, k): w[i][j] coeff_i from y_j

    @aot_jit
    def lagrange(ys):
        rows = []
        for i in range(k):
            acc = None
            for j in range(k):
                term = jf.escalar_mul(ys[j], jnp.asarray(w[i][j]))
                acc = term if acc is None else jf.eadd(acc, term)
            rows.append(acc)
        return jnp.stack(rows)

    return lagrange


def dlagrange_interpolation(xs: list, ys):
    """Interpolate EF values ys (k,5) at small-int xs -> coeffs (k,5).
    Matches pp.lagrange_interpolation including NO leading-zero trim
    (callers pad to degree+1 anyway)."""
    return _lagrange_fn(len(xs), tuple(int(x) for x in xs))(ys)


@functools.cache
def _expand_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def expand(y):
        if n == 0:
            return jnp.zeros((0, EXT), jnp.uint32)

        # lax.scan, NOT an unrolled python loop: a pure-elementwise
        # repeated-squaring chain inside one fusion makes XLA recompute
        # the operand per use — exponential execution time (n=14 ran
        # 15 s on XLA:CPU; n=22 never finished — the round-2..4 bench
        # deadline killer). Scan iterations are fusion barriers.
        def body(cur, _):
            return jf.emul(cur, cur), cur

        _, out = jax.lax.scan(body, y, None, length=n)
        return out

    return expand


def dexpand_from_univariate(y, n: int):
    return _expand_fn(n)(y)


@functools.cache
def _eq_outside_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = eone_m()

    @aot_jit
    def eq_outside(a, b):
        acc = jnp.asarray(one)
        for i in range(n):
            lr = jf.emul(a[i], b[i])
            term = jf.esub(jf.eadd(jnp.asarray(one), jf.eadd(lr, lr)),
                           jf.eadd(a[i], b[i]))
            acc = jf.emul(acc, term)
        return acc

    return eq_outside


def deq_poly_outside(a, b):
    return _eq_outside_fn(a.shape[0])(a, b)


@functools.lru_cache(maxsize=32)
def _bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    out = np.zeros(n, np.uint32)
    for b in range(log_n):
        out |= ((idx >> b) & 1) << (log_n - 1 - b)
    return out


@functools.cache
def _gather_fn():
    jax, jnp = _jax()

    @aot_jit
    def gather(m, idx):
        return jnp.take(m, idx, axis=0)

    return gather


def dbit_reverse(m):
    """Bit-reverse permutation along axis 0 (device gather)."""
    _, jnp = _jax()
    log_n = m.shape[0].bit_length() - 1
    idx = jnp.asarray(_bitrev_indices(log_n))
    return _gather_fn()(m, idx)


@functools.cache
def _evals_to_coeffs_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def e2c(data):
        n = data.shape[0]
        cur = data
        half = 1
        while half < n:
            v = cur.reshape((n // (2 * half), 2, half) + cur.shape[1:])
            hi = jf.sub(v[:, 1], v[:, 0])
            cur = jnp.concatenate([v[:, 0, None], hi[:, None]],
                                  axis=1).reshape(cur.shape)
            half <<= 1
        return cur

    return e2c


def devals_to_coeffs(data):
    """Multilinear evals -> coefficients + final bit-reversal
    (mirrors pp.evals_to_coeffs, evals.rs:44-55)."""
    return dbit_reverse(_evals_to_coeffs_fn()(data))
