"""Projective quotient-sum GKR: proves Σ nᵢ/dᵢ without divisions.

Protocol semantics mirror the reference (sub_protocols/src/quotient_gkr/):
layers halve by 2×2 quotient addition over the even/odd (LSB) split
  num_k(x) = nl·dr + nr·dl,  den_k(x) = dl·dr
with nl(x) = num_{k+1}(x, 0); top 2^5 values sent in the clear
(N_VARS_TO_SEND_GKR_COEFFS=5, lib.rs:14); each layer is one degree-3
sumcheck folding LSB-first with an eq factor, then a β-fold extends the
claim point at the LSB end (mod.rs:30-190).

The reference's chunk-bit-reversed packed storage (layers.rs) is a
CPU-SIMD layout; here arrays are natural-order and the LSB-first fold is
realized as an MSB-first fold over bit-reversed views (transcript
identical).
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..poly import np_poly as pp
from ..sumcheck.np_sumcheck import sumcheck_prove, sumcheck_verify

N_VARS_TO_SEND_GKR_COEFFS = 5
EXT_DIM = 5


class _QuotientLayerComputation:
    """C(nl, nr, dl, dr) = nl*dr + nr*dl + alpha*dl*dr  (degree 2)."""

    degree = 2

    def __init__(self, alpha: np.ndarray):
        self.alpha = alpha

    def eval(self, columns, extra):
        nl, nr, dl, dr = [pp.efrom_base_table(c) if c.ndim == 1 else c
                          for c in columns]
        cross = nf.eadd(nf.emul(nl, dr), nf.emul(nr, dl))
        dd = nf.emul(dl, dr)
        return nf.eadd(cross, nf.emul(dd, np.broadcast_to(self.alpha, dd.shape)))

    def native_round_evals(self, columns, eq_table):
        """Fused C round (h(0), h(2) sums) — np_sumcheck hook."""
        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        if lib is None or not hasattr(lib, "gkr_round_evals"):
            return None
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        m = columns[0].shape[0] // 2
        cols = [np.ascontiguousarray(
            pp.efrom_base_table(c) if c.ndim == 1 else c, np.uint32)
            for c in columns]
        eq = np.ascontiguousarray(eq_table[:m], np.uint32)
        al = np.ascontiguousarray(self.alpha, np.uint32)
        out = np.empty((2, 5), np.uint32)
        lib.gkr_round_evals(*[c.ctypes.data_as(u32p) for c in cols],
                            eq.ctypes.data_as(u32p),
                            al.ctypes.data_as(u32p), m,
                            out.ctypes.data_as(u32p))
        return out


def _bit_rev(a: np.ndarray) -> np.ndarray:
    return pp.bit_reverse_permutation(a)


def _layer_up(nums: np.ndarray, dens: np.ndarray):
    """One GKR reduction: arrays of 2^{k+1} -> 2^k via even/odd split."""
    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    m = nums.shape[0] // 2
    if lib is not None:
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        nc = np.ascontiguousarray(nums, np.uint32)
        dc = np.ascontiguousarray(dens, np.uint32)
        num_up = np.empty((m, 5), np.uint32)
        den_up = np.empty((m, 5), np.uint32)
        lib.gkr_layer_up(nc.ctypes.data_as(u32p),
                         1 if nums.ndim == 1 else 0,
                         dc.ctypes.data_as(u32p),
                         num_up.ctypes.data_as(u32p),
                         den_up.ctypes.data_as(u32p), m)
        return num_up, den_up
    nl, nr = nums[0::2], nums[1::2]
    dl, dr = dens[0::2], dens[1::2]
    if nl.ndim == 1:
        nl = pp.efrom_base_table(nl)
        nr = pp.efrom_base_table(nr)
    num_up = nf.eadd(nf.emul(nl, dr), nf.emul(nr, dl))
    den_up = nf.emul(dl, dr)
    return num_up, den_up


def prove_gkr_quotient(prover_state, nums: np.ndarray, dens: np.ndarray):
    """nums: (N,) base; dens: (N, 5) ext; N = 2^n power of two (padding
    materialized: nums 0 / dens 1). Returns (quotient, claim point (n,5))."""
    n = nums.shape[0]
    total_n_vars = n.bit_length() - 1
    assert 1 << total_n_vars == n
    assert total_n_vars > N_VARS_TO_SEND_GKR_COEFFS

    layers = [(nums, dens)]
    cur_n, cur_d = nums, dens
    for _ in range(total_n_vars - N_VARS_TO_SEND_GKR_COEFFS):
        cur_n, cur_d = _layer_up(cur_n, cur_d)
        layers.append((cur_n, cur_d))

    top_nums, top_dens = layers.pop()
    prover_state.add_extension_scalars(top_nums)
    prover_state.add_extension_scalars(top_dens)
    quotient = _compute_quotient(top_nums, top_dens)

    point = prover_state.sample_vec(N_VARS_TO_SEND_GKR_COEFFS)
    claim_num = pp.eval_mle(top_nums, point)
    claim_den = pp.eval_mle(top_dens, point)

    for layer_nums, layer_dens in reversed(layers):
        point, claim_num, claim_den = _prove_layer(
            prover_state, layer_nums, layer_dens, point, claim_num, claim_den)

    return quotient, point


def _prove_layer(prover_state, nums, dens, claim_point, claim_num, claim_den):
    """(mod.rs:85-150)"""
    prover_state.duplex()
    alpha = prover_state.sample()
    expected = nf.eadd(claim_num, nf.emul(alpha, claim_den))

    nl, nr = nums[0::2], nums[1::2]
    dl, dr = dens[0::2], dens[1::2]
    # LSB-first fold == MSB-first fold over bit-reversed views with the
    # eq point reversed
    cols = [_bit_rev(c) for c in (nl, nr, dl, dr)]
    eq_rev = claim_point[::-1].copy()

    challenges, folds, _ = sumcheck_prove(
        cols, _QuotientLayerComputation(alpha), None, list(eq_rev),
        prover_state, expected)

    inner_evals = np.stack([
        (pp.efrom_base_table(f)[0] if f.ndim == 1 else f[0]) for f in folds])
    prover_state.add_extension_scalars(inner_evals)
    beta = prover_state.sample()
    nl_q, nr_q, dl_q, dr_q = inner_evals
    one_m_beta = nf.esub(pp.EONE, beta)
    next_num = nf.eadd(nf.emul(one_m_beta, nl_q), nf.emul(beta, nr_q))
    next_den = nf.eadd(nf.emul(one_m_beta, dl_q), nf.emul(beta, dr_q))

    # challenges are in round order (x_LSB first); natural point = reversed
    natural = challenges[::-1].copy()
    next_point = np.concatenate([natural, beta[None]], axis=0)
    return next_point, next_num, next_den


def _compute_quotient(nums, dens):
    acc = pp.EZERO.copy()
    for nv, dv in zip(nums, dens):
        acc = nf.eadd(acc, nf.emul(nv, nf.einv(dv)))
    return acc


def verify_gkr_quotient(verifier_state, n_vars: int):
    """(mod.rs:147-190). -> (quotient, point, claim_num, claim_den)"""
    assert n_vars > N_VARS_TO_SEND_GKR_COEFFS
    send_len = 1 << N_VARS_TO_SEND_GKR_COEFFS
    last_nums = verifier_state.next_extension_scalars_vec(send_len)
    last_dens = verifier_state.next_extension_scalars_vec(send_len)
    quotient = _compute_quotient(last_nums, last_dens)
    point = verifier_state.sample_vec(N_VARS_TO_SEND_GKR_COEFFS)
    claim_num = pp.eval_mle(last_nums, point)
    claim_den = pp.eval_mle(last_dens, point)
    for k in range(N_VARS_TO_SEND_GKR_COEFFS, n_vars):
        point, claim_num, claim_den = _verify_layer(
            verifier_state, k, point, claim_num, claim_den)
    return quotient, point, claim_num, claim_den


def _verify_layer(verifier_state, n_vars, point, claim_num, claim_den):
    from ..fs.verifier import ProofError
    verifier_state.duplex()
    alpha = verifier_state.sample()
    expected = nf.eadd(claim_num, nf.emul(alpha, claim_den))
    eq_alphas_rev = point[::-1].copy()
    challenges, value = sumcheck_verify(verifier_state, n_vars, 3, expected,
                                        eq_alphas=list(eq_alphas_rev))
    postponed_point = challenges[::-1].copy()
    inner_evals = verifier_state.next_extension_scalars_vec(4)
    nl, nr, dl, dr = inner_evals
    constraints_eval = nf.eadd(
        nf.emul(alpha, nf.emul(dl, dr)),
        nf.eadd(nf.emul(nl, dr), nf.emul(nr, dl)))
    eq_out = pp.eq_poly_outside(point, postponed_point)
    if not np.array_equal(value, nf.emul(eq_out, constraints_eval)):
        raise ProofError("GKR layer check failed")
    beta = verifier_state.sample()
    one_m_beta = nf.esub(pp.EONE, beta)
    next_num = nf.eadd(nf.emul(one_m_beta, nl), nf.emul(beta, nr))
    next_den = nf.eadd(nf.emul(one_m_beta, dl), nf.emul(beta, dr))
    next_point = np.concatenate([postponed_point, beta[None]], axis=0)
    return next_point, next_num, next_den
