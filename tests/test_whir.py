"""WHIR PCS tests: DFT identities, config derivation, full roundtrip.

Mirrors the reference test strategy (whir/src/dft.rs:582-604 eval-DFT
identity, whir/tests/run_whir.rs prove+verify roundtrip).
"""

import numpy as np
import pytest

from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import ProofError, VerifierState
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.whir import (SparseStatement, WhirConfig,
                                   WhirConfigBuilder, commit, open_,
                                   parse_commitment, verify)
from leanmultisig_tpu.whir.config import FoldingFactor
from leanmultisig_tpu.whir.dft import dft_evals, reorder_and_dft

rng = np.random.default_rng(42)


def rand_base(n):
    return rng.integers(0, P, size=n, dtype=np.uint32)


def rand_ext(n):
    return rng.integers(0, P, size=(n, 5), dtype=np.uint32)


def test_dft_evals_identity():
    """fft[i] == P(g^i, g^2i, ...) — dft.rs:582-604."""
    for n_vars in [1, 3, 5, 8]:
        evals = rand_ext(1 << n_vars)
        out = dft_evals(evals)
        g = nf.two_adic_generator(n_vars)
        for i in [0, 1, (1 << n_vars) - 1, (1 << n_vars) // 3]:
            point = pp.expand_from_univariate(
                pp.efrom_base_scalar(pow(g, i, P)), n_vars)
            assert np.array_equal(out[i], pp.eval_mle(evals, point)), (n_vars, i)


def test_reorder_and_dft_matches_naive():
    """The repeated-matrix + skip-layer path equals running all layers."""
    n_vars, k, r = 6, 3, 2
    evals = rand_base(1 << n_vars)
    fast = reorder_and_dft(evals, k, r, 1 << k)
    # naive: explicit gather then full dft (utils.rs:128-150)
    n_blocks = 1 << k
    block_size = (1 << (n_vars + r)) >> k
    naive = np.zeros((block_size, n_blocks), np.uint32)
    for row in range(block_size):
        for j in range(n_blocks):
            naive[row, j] = evals[((j << (block_size.bit_length() - 1)) + row) >> r]
    naive = dft_evals(naive)
    assert np.array_equal(fast, naive)


def test_evals_to_coeffs_roundtrip():
    n_vars = 5
    evals = rand_ext(1 << n_vars)
    coeffs = pp.evals_to_coeffs(evals)
    # coeff layout is bit-reversed vs evals order: evaluate at the
    # REVERSED point (this is why verify.rs:199-201 reverses)
    point = rand_ext(n_vars)
    assert np.array_equal(
        pp.eval_multilinear_coeffs(coeffs, point[::-1].copy()),
        pp.eval_mle(evals, point))
    # univariate consistency: coeffs at expand(alpha) == sum c_i alpha^i
    alpha = rand_ext(1)[0]
    expanded = pp.expand_from_univariate(alpha, n_vars)
    assert np.array_equal(
        pp.eval_multilinear_coeffs(coeffs, expanded[::-1].copy()),
        pp.horner_eval(coeffs, alpha))


def test_config_headline_shape():
    """Default builder at rate 1/2, 2^30 vars: folding 7 then 5s."""
    from leanmultisig_tpu.whir.config import default_whir_config_builder
    cfg = WhirConfig(default_whir_config_builder(1), 30)
    assert cfg.folding_factor.at_round(0) == 7
    assert cfg.folding_factor.at_round(1) == 5
    assert cfg.num_variables == (cfg.folding_factor.total_number(cfg.n_rounds())
                                 + cfg.final_sumcheck_rounds)
    assert cfg.n_rounds() == 3  # (30-7-8)/5 = 3
    assert cfg.final_sumcheck_rounds == 8
    # rate evolution: 1 -> 1+7-5=3 -> 3+5-1=7 -> 11
    assert [r.log_inv_rate for r in cfg.round_parameters] == [1, 3, 7]
    assert cfg.final_log_inv_rate == 11
    assert cfg.commitment_ood_samples >= 1
    for r in cfg.round_parameters:
        assert r.num_queries > 0
        assert r.query_pow_bits <= 16 + 1


def _small_builder(rate=1):
    return WhirConfigBuilder(
        starting_log_inv_rate=rate,
        max_num_variables_to_send_coeffs=3,
        rs_domain_initial_reduction_factor=2,
        folding_factor=FoldingFactor(4, 3),
        soundness_type="johnson",
        security_level=60,
        pow_bits=10,
    )


def test_whir_roundtrip():
    # base-field committed poly only: the protocol always commits the
    # base-field stacked polynomial (verify.rs:241 hardwires round 0 = base)
    n_vars = 12
    cfg = WhirConfig(_small_builder(), n_vars)
    assert cfg.n_rounds() >= 1
    poly = rand_base(1 << n_vars)

    # a couple of statements: one dense eval claim + one sparse claim
    point = rand_ext(n_vars)
    value = pp.eval_mle(poly, point)
    st_dense = SparseStatement.dense(point, value)
    sub_point = rand_ext(n_vars - 2)
    sel = 3
    sub_value = pp.eval_mle(
        poly[sel << (n_vars - 2):(sel + 1) << (n_vars - 2)], sub_point)
    from leanmultisig_tpu.whir.statement import SparseValue
    st_sparse = SparseStatement(n_vars, sub_point, [SparseValue(sel, sub_value)])
    statements = [st_dense, st_sparse]

    ps = ProverState()
    witness = commit(cfg, ps, poly)
    final_point_p = open_(cfg, ps, statements, witness, poly)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    parsed = parse_commitment(vs, n_vars, cfg.commitment_ood_samples)
    final_point_v = verify(cfg, vs, parsed, statements)
    assert np.array_equal(final_point_p, final_point_v)

    # the returned point must satisfy: claims hold at the folded poly
    # (completeness of the folding randomness as an evaluation point)
    assert final_point_v.shape == (n_vars, 5)

    # tamper probe: flip one transcript element -> must fail
    bad = proof.transcript.copy()
    bad[len(bad) // 2] ^= 1
    from leanmultisig_tpu.fs.prover import Proof
    vs2 = VerifierState(Proof(bad, proof.merkle_paths))
    with pytest.raises((ProofError, AssertionError)):
        parsed2 = parse_commitment(vs2, n_vars, cfg.commitment_ood_samples)
        verify(cfg, vs2, parsed2, statements)


def test_whir_next_statement_roundtrip():
    """is_next (shifted-column) statements go through the same pipeline."""
    n_vars = 10
    cfg = WhirConfig(_small_builder(), n_vars)
    poly = rand_base(1 << n_vars)

    outer = rand_ext(n_vars)
    table = pp.matrix_next_mle_folded(outer)
    # claimed value = sum_y next_mle(outer, y) * poly[y]
    acc = pp.EZERO.copy()
    for y in range(1 << n_vars):
        acc = nf.eadd(acc, nf.escalar_mul(table[y], poly[y]))
    from leanmultisig_tpu.whir.statement import SparseValue
    st = SparseStatement(n_vars, outer, [SparseValue(0, acc)], is_next=True)

    ps = ProverState()
    witness = commit(cfg, ps, poly)
    open_(cfg, ps, [st], witness, poly)
    proof = ps.into_proof()

    vs = VerifierState(proof)
    parsed = parse_commitment(vs, n_vars, cfg.commitment_ood_samples)
    verify(cfg, vs, parsed, [st])
