"""Device-resident projective quotient-sum GKR (mirrors protocols/gkr.py).

Layer chain, per-layer degree-3 sumchecks, and the beta-folds all run on
device; only the protocol structure (number of layers/rounds — static)
lives on host. Reference: sub_protocols/src/quotient_gkr/.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from . import dpoly
from .dsumcheck import register_computation

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

    @aot_jit
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


def prove_gkr_quotient_dev(prover_state, nums, dens):
    """nums: (N,) base monty dev; dens: (N, 5) monty dev.
    Returns (claim point (n,5) monty dev). The quotient==0 sanity assert
    is skipped on device (it is checked by the verifier)."""
    jax, jnp = _jax()
    n = nums.shape[0]
    total_n_vars = n.bit_length() - 1
    assert 1 << total_n_vars == n
    assert total_n_vars > N_VARS_TO_SEND_GKR_COEFFS

    from .dtail import begin_tail, below, end_tail, fetch, upload

    # device layer chain: stop once the next layer is sub-waterline
    layers = [(nums, dens)]
    cur_n, cur_d = nums, dens
    n_dev_ups = 0
    for i in range(total_n_vars - N_VARS_TO_SEND_GKR_COEFFS):
        if below(int(cur_n.shape[0]) // 2):
            break
        cur_n, cur_d = _layer_up_fn(cur_n.ndim == 1)(cur_n, cur_d)
        layers.append((cur_n, cur_d))
        n_dev_ups += 1

    n_host_ups = (total_n_vars - N_VARS_TO_SEND_GKR_COEFFS) - n_dev_ups
    if n_host_ups > 0:
        # host head: build + prove every sub-waterline layer (and the
        # top coeffs) through the host implementation, then hand the
        # claims back to the device big-layer loop
        from ..poly import np_poly as pp
        from ..protocols.gkr import _layer_up, _prove_layer
        from .dtail import fetch_many
        host_layers = []
        hn, hd = fetch_many([cur_n, cur_d])
        for _ in range(n_host_ups):
            hn, hd = _layer_up(hn, hd)
            host_layers.append((hn, hd))
        top_nums, top_dens = host_layers.pop()

        hp = begin_tail(prover_state)
        hp.add_extension_scalars(top_nums)
        hp.add_extension_scalars(top_dens)
        point_h = hp.sample_vec(N_VARS_TO_SEND_GKR_COEFFS)
        claim_num_h = pp.eval_mle(top_nums, point_h)
        claim_den_h = pp.eval_mle(top_dens, point_h)
        for layer_nums, layer_dens in reversed(host_layers):
            point_h, claim_num_h, claim_den_h = _prove_layer(
                hp, layer_nums, layer_dens, point_h, claim_num_h,
                claim_den_h)
        end_tail(prover_state, hp)
        point = upload(point_h)
        claim_num = upload(claim_num_h)
        claim_den = upload(claim_den_h)
    else:
        top_nums, top_dens = layers.pop()
        prover_state.add_extension_scalars(top_nums)
        prover_state.add_extension_scalars(top_dens)
        point = prover_state.sample_vec(N_VARS_TO_SEND_GKR_COEFFS)
        claim_num = dpoly.deval_mle(top_nums, point)
        claim_den = dpoly.deval_mle(top_dens, point)

    while layers:  # pop so a consumed layer's buffers free immediately
        layer_nums, layer_dens = layers.pop()
        point, claim_num, claim_den = _prove_layer_dev(
            prover_state, layer_nums, layer_dens, point, claim_num,
            claim_den)
        del layer_nums, layer_dens
    return point


@functools.cache
def _fused_layer_fn(k: int, base: bool):
    """One GKR layer — duplex, alpha, all k sumcheck rounds, inner evals,
    beta fold — as a SINGLE jitted dispatch with the Fiat-Shamir sponge
    threaded functionally through the trace. Dispatch-for-dispatch the
    sequence of sponge permutes/reads is identical to the unfused path
    (DevProverState add_sumcheck_polynomial / sample semantics), so the
    transcript is bit-identical; ~7 dispatches/round collapse to 1/layer
    (the tunnel per-dispatch overhead dominated the logup phase)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from .dfs import CAPACITY, RATE, _observe_chunks_fn, dexpand_bare_to_full

    def observe(state, flat):
        n = int(flat.shape[0])
        n_chunks = -(-n // RATE)
        if n_chunks * RATE > n:
            flat = jnp.concatenate(
                [flat, jnp.zeros(n_chunks * RATE - n, jnp.uint32)])
        return _observe_chunks_fn(n_chunks)(state, flat)

    def sample(state):
        return state[CAPACITY:CAPACITY + EXT]

    two_m = dpoly.monty_const(2)

    @aot_jit
    def run(state, nl, nr, dl, dr, claim_point, claim_num, claim_den):
        one = jnp.asarray(dpoly.eone_m())
        state = observe(state, jnp.zeros(RATE, jnp.uint32))  # duplex
        alpha = sample(state)
        sum_ = jf.eadd(claim_num, jf.emul(alpha, claim_den))

        cols = [nl, nr, dl, dr]
        eq_point = claim_point[::-1]
        eq_table = dpoly.deval_eq(eq_point[1:]) if k > 1 else \
            jnp.asarray(dpoly.eone_m())[None, :]
        missing = one
        with_missing = False
        tparts = []
        challenges = []
        for rnd in range(k):
            half = cols[0].shape[0] // 2
            evals = []
            for z in (0, 2):
                at_z = []
                for c in cols:
                    lo, hi = c[:half], c[half:]
                    if z == 0:
                        at_z.append(lo)
                    else:
                        d = jf.sub(hi, lo)
                        at_z.append(jf.add(lo, jf.mul(
                            d, jnp.asarray(two_m))))
                vals = jf.emul(_quotient_eval(at_z, alpha), eq_table[:half])
                tot = jf.sum_mod(vals, 0)
                if with_missing:
                    tot = jf.emul(tot, missing)
                evals.append(tot)
            a0 = eq_point[rnd]
            num = jf.esub(sum_, jf.emul(jf.esub(one, a0), evals[0]))
            h1 = jf.emul(num, jf.einv(a0))
            ys = jnp.stack([evals[0], h1, evals[1]])
            coeffs = dpoly.dlagrange_interpolation([0, 1, 2], ys)
            full = dexpand_bare_to_full(coeffs, a0)
            state = observe(state, full.reshape(-1))
            tparts.append(jf.to_u32(coeffs[1:].reshape(-1)))
            r = sample(state)
            challenges.append(r)
            # post-round bookkeeping (np_sumcheck:192-201)
            acc = coeffs[-1]
            for i in range(int(coeffs.shape[0]) - 2, -1, -1):
                acc = jf.eadd(jf.emul(acc, r), coeffs[i])
            eq_eval = jf.eadd(jf.emul(jf.esub(one, a0), jf.esub(one, r)),
                              jf.emul(a0, r))
            sum_ = jf.emul(acc, eq_eval)
            nxt = (eq_point[rnd + 1] if rnd + 1 < k
                   else jnp.zeros(EXT, jnp.uint32))
            missing = jf.emul(jf.emul(eq_eval, missing),
                              jf.einv(jf.esub(one, nxt)))
            with_missing = True
            if eq_table.shape[0] > 1:
                eq_table = eq_table[:eq_table.shape[0] // 2]
            cols = dpoly.dfold(cols, r)

        rows = [jf.efrom_base(f)[0] if f.ndim == 1 else f[0] for f in cols]
        inner = jnp.stack(rows)
        state = observe(state, inner.reshape(-1))
        tparts.append(jf.to_u32(inner.reshape(-1)))
        beta = sample(state)
        nl_q, nr_q, dl_q, dr_q = inner
        omb = jf.esub(one, beta)
        next_num = jf.eadd(jf.emul(omb, nl_q), jf.emul(beta, nr_q))
        next_den = jf.eadd(jf.emul(omb, dl_q), jf.emul(beta, dr_q))
        natural = jnp.stack(challenges)[::-1]
        next_point = jnp.concatenate([natural, beta[None]], axis=0)
        return (state, jnp.concatenate(tparts), next_point, next_num,
                next_den)

    return run


def _prove_layer_dev(prover_state, nums, dens, claim_point, claim_num,
                     claim_den):
    """(quotient_gkr/mod.rs:85-150; mirrors protocols/gkr._prove_layer)."""
    jax, jnp = _jax()
    from .dtail import begin_tail, below, end_tail, fetch_many, upload
    if below(int(nums.shape[0])):
        from ..protocols.gkr import _prove_layer
        nums_h, dens_h, pt_h, cn0_h, cd0_h = fetch_many(
            [nums, dens, claim_point, claim_num, claim_den])
        hp = begin_tail(prover_state)
        point_h, cn_h, cd_h = _prove_layer(hp, nums_h, dens_h, pt_h,
                                           cn0_h, cd0_h)
        end_tail(prover_state, hp)
        return upload(point_h), upload(cn_h), upload(cd_h)
    nl, nr = nums[0::2], nums[1::2]
    dl, dr = dens[0::2], dens[1::2]
    cols = [dpoly.dbit_reverse(c) for c in (nl, nr, dl, dr)]

    from .dshard import use_fused
    if not use_fused():
        # per-round dispatch path: required under a sharding mesh and
        # when LMS_NO_FUSE=1 (see dshard.use_fused for the compile-cost
        # rationale); transcript-identical to the fused kernel
        return _prove_layer_unfused(prover_state, cols, claim_point,
                                    claim_num, claim_den)

    k = int(cols[0].shape[0]).bit_length() - 1
    state, blob, next_point, next_num, next_den = _fused_layer_fn(
        k, nums.ndim == 1)(prover_state.challenger.state, *cols,
                           claim_point, claim_num, claim_den)
    prover_state.challenger.state = state
    prover_state.challenger.rate_fresh = False
    prover_state.transcript.append(blob)
    return next_point, next_num, next_den


def _prove_layer_unfused(prover_state, cols, claim_point, claim_num,
                         claim_den):
    """Round-at-a-time layer proof (transcript-identical to the fused
    kernel; used under a sharding mesh)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from .dsumcheck import sumcheck_prove_dev
    prover_state.duplex()
    alpha = prover_state.sample()
    expected = _expected_fn()(claim_num, alpha, claim_den)
    eq_rev = claim_point[::-1]

    challenges, folds, _ = sumcheck_prove_dev(
        cols, "gkr_quotient", alpha, eq_rev, prover_state, expected,
        degree=2)

    inner_evals = _stack_inner_fn()(list(folds))
    prover_state.add_extension_scalars(inner_evals)
    beta = prover_state.sample()
    next_num, next_den = _beta_fold_fn()(inner_evals, beta)
    natural = challenges[::-1]
    next_point = jnp.concatenate([natural, beta[None]], axis=0)
    return next_point, next_num, next_den


@functools.cache
def _stack_inner_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def stack(folds):
        rows = [jf.efrom_base(f)[0] if f.ndim == 1 else f[0] for f in folds]
        return jnp.stack(rows)

    return stack


@functools.cache
def _beta_fold_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
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
    return aot_jit(lambda n, a, d: jf.eadd(n, jf.emul(a, d)))
