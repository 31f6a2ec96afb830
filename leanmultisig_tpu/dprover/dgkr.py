"""Device-resident projective quotient-sum GKR (mirrors protocols/gkr.py).

Layer chain, per-layer degree-3 sumchecks, and the beta-folds all run on
device; only the protocol structure (number of layers/rounds — static)
lives on host. Reference: sub_protocols/src/quotient_gkr/.
"""

from __future__ import annotations

import functools

import numpy as np

from . import dpoly
from .dsumcheck import register_computation, sumcheck_prove_dev

N_VARS_TO_SEND_GKR_COEFFS = 5
EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.cache
def _layer_up_fn(base: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @jax.jit
    def layer_up(nums, dens):
        nl, nr = nums[0::2], nums[1::2]
        dl, dr = dens[0::2], dens[1::2]
        if base:
            num_up = jf.eadd(jf.escalar_mul(dr, nl), jf.escalar_mul(dl, nr))
        else:
            num_up = jf.eadd(jf.emul(nl, dr), jf.emul(nr, dl))
        den_up = jf.emul(dl, dr)
        return num_up, den_up

    return layer_up


def _quotient_eval(cols, extra):
    """C(nl, nr, dl, dr) = nl*dr + nr*dl + alpha*dl*dr."""
    _, jnp = _jax()
    from ..field import jnp_field as jf
    nl, nr, dl, dr = cols
    alpha = extra
    if nl.ndim == 1:
        cross = jf.eadd(jf.escalar_mul(dr, nl), jf.escalar_mul(dl, nr))
    else:
        cross = jf.eadd(jf.emul(nl, dr), jf.emul(nr, dl))
    dd = jf.emul(dl, dr)
    return jf.eadd(cross, jf.emul(dd, jnp.broadcast_to(alpha, dd.shape)))


register_computation("gkr_quotient", _quotient_eval)


@functools.cache
def _beta_fold_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @jax.jit
    def beta_fold(inner_evals, beta):
        onej = jnp.asarray(one)
        nl_q, nr_q, dl_q, dr_q = inner_evals
        omb = jf.esub(onej, beta)
        nxt_num = jf.eadd(jf.emul(omb, nl_q), jf.emul(beta, nr_q))
        nxt_den = jf.eadd(jf.emul(omb, dl_q), jf.emul(beta, dr_q))
        return nxt_num, nxt_den

    return beta_fold


@functools.cache
def _expected_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return jax.jit(lambda n, a, d: jf.eadd(n, jf.emul(a, d)))


def prove_gkr_quotient_dev(prover_state, nums, dens):
    """nums: (N,) base monty dev; dens: (N, 5) monty dev.
    Returns (claim point (n,5) monty dev). The quotient==0 sanity assert
    is skipped on device (it is checked by the verifier)."""
    jax, jnp = _jax()
    n = nums.shape[0]
    total_n_vars = n.bit_length() - 1
    assert 1 << total_n_vars == n
    assert total_n_vars > N_VARS_TO_SEND_GKR_COEFFS

    layers = [(nums, dens)]
    cur_n, cur_d = nums, dens
    for i in range(total_n_vars - N_VARS_TO_SEND_GKR_COEFFS):
        cur_n, cur_d = _layer_up_fn(cur_n.ndim == 1)(cur_n, cur_d)
        layers.append((cur_n, cur_d))

    top_nums, top_dens = layers.pop()
    prover_state.add_extension_scalars(top_nums)
    prover_state.add_extension_scalars(top_dens)

    point = prover_state.sample_vec(N_VARS_TO_SEND_GKR_COEFFS)
    claim_num = dpoly.deval_mle(top_nums, point)
    claim_den = dpoly.deval_mle(top_dens, point)

    for layer_nums, layer_dens in reversed(layers):
        point, claim_num, claim_den = _prove_layer_dev(
            prover_state, layer_nums, layer_dens, point, claim_num,
            claim_den)
    return point


@functools.cache
def _stack_inner_fn(base0: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @jax.jit
    def stack(folds):
        rows = []
        for f in folds:
            rows.append(jf.efrom_base(f)[0] if f.ndim == 1 else f[0])
        return jnp.stack(rows)

    return stack


def _prove_layer_dev(prover_state, nums, dens, claim_point, claim_num,
                     claim_den):
    """(quotient_gkr/mod.rs:85-150; mirrors protocols/gkr._prove_layer)."""
    jax, jnp = _jax()
    prover_state.duplex()
    alpha = prover_state.sample()
    expected = _expected_fn()(claim_num, alpha, claim_den)

    nl, nr = nums[0::2], nums[1::2]
    dl, dr = dens[0::2], dens[1::2]
    cols = [dpoly.dbit_reverse(c) for c in (nl, nr, dl, dr)]
    eq_rev = claim_point[::-1]

    challenges, folds, _ = sumcheck_prove_dev(
        cols, "gkr_quotient", alpha, eq_rev, prover_state, expected,
        degree=2)

    inner_evals = _stack_inner_fn(folds[0].ndim == 1)(list(folds))
    prover_state.add_extension_scalars(inner_evals)
    beta = prover_state.sample()
    next_num, next_den = _beta_fold_fn()(inner_evals, beta)

    natural = challenges[::-1]
    next_point = jnp.concatenate([natural, beta[None]], axis=0)
    return next_point, next_num, next_den
