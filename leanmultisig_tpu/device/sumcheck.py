"""Device-resident WHIR sumcheck: weights build + product rounds on TPU.

The committed polynomial and the combined weight MLE stay on device in
Montgomery form across all sumcheck rounds; only the 3 round coefficients
cross to the host per round (for the Fiat-Shamir transcript). Transcript
is bit-identical to the host path (same c0/c2/c1-from-sum coefficients as
sumcheck/prove.rs:171-203 & compute_product_sumcheck_polynomial).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..field import np_field as nf
from ..field.constants import P
from ..poly import np_poly as pp

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def to_monty_dev(arr: np.ndarray):
    from ..field import jnp_field as jf
    _, jnp = _jax()
    return jnp.asarray(jf.to_monty_np(arr))


def from_monty_host(dev) -> np.ndarray:
    from ..field import jnp_field as jf
    return jf.from_monty_np(np.asarray(dev))


# --- device EF helpers (monty form) ----------------------------------------


@functools.lru_cache(maxsize=64)
def _eval_eq_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def eval_eq(point_m, scalar_m):
        out = scalar_m[None, :]
        for i in range(n):
            a = jnp.broadcast_to(point_m[i][None, :], out.shape)
            hi = jf.emul(out, a)
            lo = jf.sub(out, hi)
            out = jnp.stack([lo, hi], axis=1).reshape(-1, EXT)
        return out

    return eval_eq


@functools.lru_cache(maxsize=64)
def _add_fn(shape_key: tuple):
    jax, _ = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def add(a, b):
        return jf.add(a, b)

    return add


@functools.lru_cache(maxsize=64)
def _scatter_add_fn(total: int, block: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def scatter_add(weights_m, eq_m, lo):
        lo = lo.astype(jnp.int32)
        zero = jnp.int32(0)
        cur = jax.lax.dynamic_slice(weights_m, (lo, zero), (block, EXT))
        return jax.lax.dynamic_update_slice(weights_m, jf.add(cur, eq_m),
                                            (lo, zero))

    return scatter_add


def weights_add_eq(weights_m, point: np.ndarray, scalar: np.ndarray,
                   selector: int = 0):
    """weights[sel<<n : sel+1<<n] += scalar * eq(point, .) — on device."""
    n = point.shape[0]
    eq = _eval_eq_fn(n)(to_monty_dev(point), to_monty_dev(scalar))
    if weights_m.shape[0] == (1 << n):
        assert selector == 0
        return _add_fn((weights_m.shape, "w"))(weights_m, eq)
    return _scatter_add_fn(weights_m.shape[0], 1 << n)(
        weights_m, eq, np.uint32(selector << n))


@functools.lru_cache(maxsize=128)
def _product_round_fn(log_n: int, base_evals: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def round_(evals_m, weights_m):
        half = evals_m.shape[0] // 2
        x0, x1 = evals_m[:half], evals_m[half:]
        y0, y1 = weights_m[:half], weights_m[half:]
        if base_evals:
            c0 = jf.escalar_mul(y0, x0)
            c2 = jf.escalar_mul(jf.esub(y1, y0), jf.sub(x1, x0))
        else:
            c0 = jf.emul(y0, x0)
            c2 = jf.emul(jf.esub(y1, y0), jf.esub(x1, x0))
        return jf.sum_mod(c0, 0), jf.sum_mod(c2, 0)

    return round_


@functools.lru_cache(maxsize=128)
def _product_fold_fn(log_n: int, base_evals: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def fold(evals_m, weights_m, r_m):
        half = evals_m.shape[0] // 2
        x0, x1 = evals_m[:half], evals_m[half:]
        y0, y1 = weights_m[:half], weights_m[half:]
        rb = jnp.broadcast_to(r_m[None, :], (half, EXT))
        if base_evals:
            diff = jf.sub(x1, x0)
            ev = jf.eadd(jf.efrom_base(x0), jf.escalar_mul(rb, diff))
        else:
            ev = jf.eadd(x0, jf.emul(jf.esub(x1, x0), rb))
        w = jf.eadd(y0, jf.emul(jf.esub(y1, y0), rb))
        return ev, w

    return fold


class DeviceProductSumcheck:
    """Mirrors whir _SumcheckSingle with device-resident state."""

    def __init__(self, evals: np.ndarray, weights_m, sum_: np.ndarray):
        self.base_evals = evals.ndim == 1
        self.evals_m = to_monty_dev(evals)
        self.weights_m = weights_m
        self.sum = np.asarray(sum_, np.uint32)
        self._evals_host_cache = None

    @property
    def n(self) -> int:
        return self.evals_m.shape[0]

    def evals_host(self) -> np.ndarray:
        if self._evals_host_cache is None:
            self._evals_host_cache = from_monty_host(self.evals_m)
        return self._evals_host_cache

    def run_sumcheck_many_rounds(self, prover_state, n_rounds: int,
                                 pow_bits: int) -> np.ndarray:
        challenges = []
        for _ in range(n_rounds):
            log_n = self.n.bit_length() - 1
            c0_m, c2_m = _product_round_fn(log_n, self.base_evals)(
                self.evals_m, self.weights_m)
            c0 = from_monty_host(c0_m)
            c2 = from_monty_host(c2_m)
            # c1 = sum - 2*c0 - c2 (prove.rs / product sumcheck)
            c1 = nf.esub(nf.esub(self.sum, nf.eadd(c0, c0)), c2)
            coeffs = np.stack([c0, c1, c2])
            prover_state.add_sumcheck_polynomial(coeffs)
            prover_state.pow_grinding(pow_bits)
            r = prover_state.sample()
            challenges.append(r)
            self.sum = pp.horner_eval(coeffs, r)
            self.evals_m, self.weights_m = _product_fold_fn(
                log_n, self.base_evals)(self.evals_m, self.weights_m,
                                        to_monty_dev(r))
            self.base_evals = False
            self._evals_host_cache = None
        return (np.stack(challenges) if challenges
                else np.zeros((0, EXT), np.uint32))

    def add_new_equality(self, points, evaluations,
                         combination_randomness) -> None:
        for point, ev, rand in zip(points, evaluations,
                                   combination_randomness):
            self.weights_m = weights_add_eq(self.weights_m, point, rand)
            self.sum = nf.eadd(self.sum, nf.emul(rand, ev))


def combine_statement_device(statements, gamma: np.ndarray):
    """Device build of the combined weight MLE (open.rs:518-584 semantics:
    same gamma-power order, same values). Small sparse blocks accumulate on
    host, dense eq tables build on device."""
    num_variables = statements[0].total_num_variables
    # gamma power bookkeeping follows original order (open.rs:518-584);
    # big eq blocks build on device, small ones accumulate on host.
    weights_host = np.zeros((1 << num_variables, EXT), np.uint32)
    combined_sum = pp.EZERO.copy()
    gamma_pow = pp.EONE.copy()
    device_adds = []  # (point, scalar, selector)
    for smt in statements:
        inner_n = smt.inner_num_variables()
        for v in smt.values:
            if not smt.is_next and inner_n >= 14:
                device_adds.append((smt.point, gamma_pow.copy(), v.selector))
            else:
                lo = v.selector << inner_n
                if smt.is_next:
                    block = nf.emul(pp.matrix_next_mle_folded(smt.point),
                                    np.broadcast_to(gamma_pow,
                                                    (1 << inner_n, EXT)))
                else:
                    block = pp.eval_eq(smt.point, gamma_pow)
                weights_host[lo:lo + (1 << inner_n)] = nf.eadd(
                    weights_host[lo:lo + (1 << inner_n)], block)
            combined_sum = nf.eadd(combined_sum, nf.emul(v.value, gamma_pow))
            gamma_pow = nf.emul(gamma_pow, gamma)

    weights_m = to_monty_dev(weights_host)
    for point, scalar, selector in device_adds:
        weights_m = weights_add_eq(weights_m, point, scalar, selector)
    return weights_m, combined_sum
