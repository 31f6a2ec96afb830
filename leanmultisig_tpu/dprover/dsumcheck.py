"""Device-resident generic sumcheck engine.

Mirrors sumcheck/np_sumcheck.py round-for-round (z-points {0,2,..,d},
h(1) deduced from the claimed sum, eq factor outside the bare polynomial
with missing_mul_factor bookkeeping — prove.rs:171-279) but every bulk
array is a Montgomery-form device array and no host sync ever happens:
round coefficients stay on device and feed the device challenger.

A `computation` provides:
  degree: int
  dev_eval(cols_at_z, extra) -> (M, 5) monty values, vectorized over rows
    (cols_at_z: list of (M,) base or (M, 5) ext monty device arrays).
"""

from __future__ import annotations

import functools

import numpy as np

from . import dpoly

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


class DevProductComputation:
    degree = 2


@functools.cache
def _product_round_fn(base_evals: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @jax.jit
    def round_(evals, weights, sum_):
        half = evals.shape[0] // 2
        x0, x1 = evals[:half], evals[half:]
        y0, y1 = weights[:half], weights[half:]
        if base_evals:
            c0 = jf.escalar_mul(y0, x0)
            c2 = jf.escalar_mul(jf.esub(y1, y0), jf.sub(x1, x0))
        else:
            c0 = jf.emul(y0, x0)
            c2 = jf.emul(jf.esub(y1, y0), jf.esub(x1, x0))
        c0 = jf.sum_mod(c0, 0)
        c2 = jf.sum_mod(c2, 0)
        c1 = jf.esub(jf.esub(sum_, jf.eadd(c0, c0)), c2)
        return jnp.stack([c0, c1, c2])

    return round_


@functools.cache
def _generic_round_fn(comp_key, n_z: int, with_missing: bool, shapes_key):
    """One fused round: z-stack, constraint eval, eq-weight, reduce."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    comp = _COMPUTATIONS[comp_key]

    @jax.jit
    def round_(cols, eq_table, missing, extra):
        half = cols[0].shape[0] // 2
        zs = [0] + list(range(2, n_z + 1))
        evals = []
        for z in zs:
            at_z = []
            for c in cols:
                lo, hi = c[:half], c[half:]
                if z == 0:
                    at_z.append(lo)
                elif z == 1:
                    at_z.append(hi)
                else:
                    d = jf.sub(hi, lo)
                    zm = jnp.asarray(dpoly.monty_const(z))
                    at_z.append(jf.add(lo, jf.mul(d, zm)))
            vals = comp(at_z, extra)  # (half, 5)
            vals = jf.emul(vals, eq_table[:half])
            total = jf.sum_mod(vals, 0)
            if with_missing:
                total = jf.emul(total, missing)
            evals.append(total)
        return jnp.stack(evals)

    return round_


# registry: computations must be hashable keys for the jit cache
_COMPUTATIONS: dict = {}


def register_computation(key, fn):
    _COMPUTATIONS[key] = fn


@functools.cache
def _h1_eq_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @jax.jit
    def h1(sum_, h0, a0):
        import jax.numpy as jnp
        onej = jnp.asarray(one)
        num = jf.esub(sum_, jf.emul(jf.esub(onej, a0), h0))
        return jf.emul(num, jf.einv(a0))

    return h1


@functools.cache
def _post_round_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @jax.jit
    def post(coeffs, r, a0, missing, nxt):
        """-> (new_sum, new_missing) after sampling r (np_sumcheck:192-201)."""
        import jax.numpy as jnp
        onej = jnp.asarray(one)
        # horner inline
        acc = coeffs[-1]
        for i in range(coeffs.shape[0] - 2, -1, -1):
            acc = jf.eadd(jf.emul(acc, r), coeffs[i])
        eq_eval = jf.eadd(jf.emul(jf.esub(onej, a0), jf.esub(onej, r)),
                          jf.emul(a0, r))
        new_sum = jf.emul(acc, eq_eval)
        denom = jf.esub(onej, nxt)
        new_missing = jf.emul(jf.emul(eq_eval, missing), jf.einv(denom))
        return new_sum, new_missing

    return post


def sumcheck_prove_dev(columns, comp_key, extra, eq_factor, prover_state,
                       sum_, n_rounds=None, pow_bits=0, missing=None,
                       degree=None):
    """Device mirror of np_sumcheck.sumcheck_prove.

    columns: list of monty device arrays; eq_factor: (n, 5) monty device
    or None; sum_: (5,) monty device. Returns (challenges (k,5) dev,
    folded columns, final sum dev)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    n_vars = columns[0].shape[0].bit_length() - 1
    if n_rounds is None:
        n_rounds = n_vars

    eq_point = None
    eq_table = None
    if eq_factor is not None:
        assert eq_factor.shape[0] == n_vars
        eq_point = eq_factor
        rest = eq_factor[1:]
        eq_table = dpoly.deval_eq(rest)  # (2^(n-1), 5)

    is_product = comp_key == "product" and eq_factor is None

    challenges = []
    round_idx = 0
    with_missing = missing is not None
    for _ in range(n_rounds):
        if is_product:
            base_evals = columns[0].ndim == 1
            coeffs = _product_round_fn(base_evals)(columns[0], columns[1],
                                                   sum_)
            prover_state.add_sumcheck_polynomial(coeffs)
            prover_state.pow_grinding(pow_bits)
            r = prover_state.sample()
            challenges.append(r)
            sum_ = dpoly.dhorner(coeffs, r)
            columns = dpoly.dfold(columns, r)
            continue

        shapes_key = tuple((tuple(c.shape), c.ndim) for c in columns)
        h_evals = _generic_round_fn(comp_key, degree, with_missing,
                                    shapes_key)(
            list(columns), eq_table,
            missing if with_missing else jnp.zeros(EXT, jnp.uint32), extra)

        a0 = eq_point[round_idx]
        h1 = _h1_eq_fn()(sum_, h_evals[0], a0)
        zs = [0, 1] + list(range(2, degree + 1))
        ys = jnp.concatenate([h_evals[:1], h1[None], h_evals[1:]])
        coeffs = dpoly.dlagrange_interpolation(zs, ys)

        prover_state.add_sumcheck_polynomial(coeffs, a0)
        prover_state.pow_grinding(pow_bits)
        r = prover_state.sample()
        challenges.append(r)

        nxt = (eq_point[round_idx + 1] if round_idx + 1 < n_vars
               else jnp.zeros(EXT, jnp.uint32))
        cur_missing = (missing if missing is not None
                       else jnp.asarray(dpoly.eone_m()))
        sum_, missing = _post_round_fn()(coeffs, r, a0, cur_missing, nxt)
        with_missing = True
        if eq_table is not None and eq_table.shape[0] > 1:
            eq_table = eq_table[:eq_table.shape[0] // 2]
        columns = dpoly.dfold(columns, r)
        round_idx += 1

    challenges = (jnp.stack(challenges) if challenges
                  else jnp.zeros((0, EXT), jnp.uint32))
    return challenges, columns, sum_
