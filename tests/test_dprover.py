"""Device-resident prover: bit-exactness vs the host path (CPU backend).

Every layer of dprover/ is asserted transcript- or value-identical to
the host numpy implementation — same Fiat-Shamir bytes, same grinding
witnesses, same merkle paths.
"""

import numpy as np
import pytest

from leanmultisig_tpu.field import jnp_field as jf
from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poly import np_poly as pp

RNG = np.random.default_rng(7)


def rand_base(n):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


def rand_ext(n):
    return RNG.integers(0, P, size=(n, 5), dtype=np.uint32)


def dev(x):
    from leanmultisig_tpu.dprover.dfs import to_dev_monty
    return to_dev_monty(x)


def host(x):
    return jf.from_monty_np(np.asarray(x))


def test_dev_challenger_matches_host():
    from leanmultisig_tpu.fs.challenger import Challenger
    from leanmultisig_tpu.dprover.dfs import DevChallenger

    h = Challenger()
    d = DevChallenger()
    for size in (3, 8, 17, 1, 40):
        data = rand_base(size)
        h.observe_many(data)
        d.observe_host(data)
    hs = h.sample_many(4)
    ds = d.sample_fes(4 * 8)
    assert np.array_equal(np.concatenate(hs), host(ds).ravel())
    h.duplex()
    d.duplex()
    assert np.array_equal(h.sample(), host(d.sample_fes(8)))


def test_dev_poly_primitives():
    from leanmultisig_tpu.dprover import dpoly

    evals = rand_base(1 << 8)
    point = rand_ext(8)
    assert np.array_equal(pp.eval_mle(evals, point),
                          host(dpoly.deval_mle(dev(evals), dev(point))))
    evals_e = rand_ext(1 << 8)
    assert np.array_equal(pp.eval_mle(evals_e, point),
                          host(dpoly.deval_mle(dev(evals_e), dev(point))))
    scalar = rand_ext(1)[0]
    assert np.array_equal(pp.eval_eq(point, scalar),
                          host(dpoly.deval_eq(dev(point), dev(scalar))))
    coeffs = rand_ext(4)
    x = rand_ext(1)[0]
    assert np.array_equal(pp.horner_eval(coeffs, x),
                          host(dpoly.dhorner(dev(coeffs), dev(x))))
    xs = [0, 1, 2, 3]
    ys = rand_ext(4)
    assert np.array_equal(pp.lagrange_interpolation(xs, ys),
                          host(dpoly.dlagrange_interpolation(xs, dev(ys))))
    y = rand_ext(1)[0]
    assert np.array_equal(pp.expand_from_univariate(y, 6),
                          host(dpoly.dexpand_from_univariate(dev(y), 6)))
    a, b = rand_ext(5), rand_ext(5)
    assert np.array_equal(pp.eq_poly_outside(a, b),
                          host(dpoly.deq_poly_outside(dev(a), dev(b))))
    m = rand_ext(1 << 6)
    assert np.array_equal(pp.bit_reverse_permutation(m),
                          host(dpoly.dbit_reverse(dev(m))))
    assert np.array_equal(pp.evals_to_coeffs(m),
                          host(dpoly.devals_to_coeffs(dev(m))))
    assert np.array_equal(pp.fold(m, x), host(dpoly.dfold([dev(m)],
                                                          dev(x))[0]))
    mb = rand_base(1 << 6)
    assert np.array_equal(pp.fold(mb, x), host(dpoly.dfold([dev(mb)],
                                                           dev(x))[0]))
    assert np.array_equal(
        pp.matrix_next_mle_folded(point[:5]),
        host(__import__("leanmultisig_tpu.dprover.dwhir",
                        fromlist=["x"])._next_mle_folded_fn(5)(
            dev(point[:5]))))


def test_dev_grind_matches_host():
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.dprover.dfs import DevProverState

    h = ProverState()
    d = DevProverState()
    data = rand_base(13)
    h.add_base_scalars(data)
    d.add_host_scalars(data)
    h.pow_grinding(8)
    d.pow_grinding(8)
    hp = h.into_proof()
    dp = d.finalize()
    assert np.array_equal(hp.transcript, dp.transcript)
    # challenger states agree post-grind
    assert np.array_equal(h.challenger.sample(),
                          host(d.challenger.sample_fes(8)))


def test_dev_gkr_transcript_matches_host():
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.dprover.dfs import DevProverState
    from leanmultisig_tpu.protocols.gkr import prove_gkr_quotient
    from leanmultisig_tpu.dprover.dgkr import prove_gkr_quotient_dev

    n = 1 << 8
    nums = rand_base(n)
    # fractions that sum to zero: pair up opposite numerators
    nums[n // 2:] = (P - nums[:n // 2].astype(np.uint64)) % P
    dens_half = rand_ext(n // 2)
    dens_half[np.all(dens_half == 0, axis=1)] = 1
    dens = np.concatenate([dens_half, dens_half])

    h = ProverState()
    quotient, point_h = prove_gkr_quotient(h, nums, dens)
    assert not quotient.any()

    d = DevProverState()
    point_d = prove_gkr_quotient_dev(d, dev(nums), dev(dens))

    hp = h.into_proof()
    dp = d.finalize()
    assert np.array_equal(hp.transcript, dp.transcript)
    assert np.array_equal(point_h, host(point_d))


def test_dev_p16_air_eval_matches_host():
    """Structured device poseidon16 constraint evaluator == host
    ConstraintFolder accumulator (base and ext batches)."""
    import jax.numpy as jnp
    from leanmultisig_tpu.air.builder import eval_air_at
    from leanmultisig_tpu.air.tables_air import (ExtraDataForBuses,
                                                 TABLE_AIRS,
                                                 max_air_constraints)
    from leanmultisig_tpu.dprover.dair import eval_p16_constraints_monty

    rng = np.random.default_rng(31)
    air = TABLE_AIRS["poseidon16"]
    alpha = rng.integers(0, P, size=5, dtype=np.uint32)
    apw = [pp.EONE.copy()]
    for _ in range(max_air_constraints()):
        apw.append(nf.emul(apw[-1], alpha))
    apw = np.stack(apw)
    extra = ExtraDataForBuses(
        rng.integers(0, P, size=(16, 5), dtype=np.uint32),
        rng.integers(0, P, size=5, dtype=np.uint32))
    apw_m = dev(apw)
    ae_m = dev(extra.logup_alphas_eq_poly)
    bb_m = dev(extra.bus_beta)

    for shape in ((8,), (8, 5)):
        flat = [rng.integers(0, P, size=shape, dtype=np.uint32)
                for _ in range(air.n_columns)]
        ref = eval_air_at(lambda b: air.eval_fn(b, extra), flat, [],
                          apw, extra)
        got_m = eval_p16_constraints_monty([dev(c) for c in flat],
                                           apw_m, ae_m, bb_m)
        assert np.array_equal(ref, host(got_m)), shape


def test_dev_full_prove_matches_host():
    """THE device-prover test: full prove_execution transcript equality
    (stacked commit -> logup GKR -> batched AIR sumcheck incl. the
    structured poseidon16 evaluator -> WHIR open -> merkle paths)."""
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.prover.prove import prove_execution
    from leanmultisig_tpu.dprover.dprove import prove_execution_dev
    from leanmultisig_tpu.vm import ExecutionWitness
    from leanmultisig_tpu.prover.verify import verify_execution

    bc = build_program()
    pub = [5, 6, 7]
    builder = _test_builder()
    hp, _ = prove_execution(bc, pub, ExecutionWitness(), builder)
    dp, _ = prove_execution_dev(bc, pub, ExecutionWitness(), builder)
    assert np.array_equal(hp.transcript, dp.transcript)
    from leanmultisig_tpu.fs.merkle_pruning import restore
    assert len(hp.merkle_paths) == len(dp.merkle_paths)
    for hg, dg in zip(hp.merkle_paths, dp.merkle_paths):
        hps, dps = restore(hg), restore(dg)
        for a, b in zip(hps, dps):
            assert a.leaf_index == b.leaf_index
            assert np.array_equal(a.leaf_data, b.leaf_data)
            assert np.array_equal(a.sibling_hashes, b.sibling_hashes)
    # and the device proof verifies under the host verifier
    verify_execution(bc, pub, dp, builder)


def test_dev_full_prove_low_waterline(monkeypatch):
    """Same transcript equality with the waterline forced LOW (2^10) so
    the device kernels — not the host tails — carry more of the rounds:
    covers the device sumcheck/GKR/AIR round kernels at fixture sizes
    that the default waterline hands to the host."""
    monkeypatch.setenv("LMS_WATERLINE", "10")
    from test_e2e import _test_builder
    from test_vm import build_program
    from leanmultisig_tpu.prover.prove import prove_execution
    from leanmultisig_tpu.dprover.dprove import prove_execution_dev
    from leanmultisig_tpu.vm import ExecutionWitness

    bc = build_program()
    pub = [5, 6, 7]
    builder = _test_builder()
    hp, _ = prove_execution(bc, pub, ExecutionWitness(), builder)
    dp, _ = prove_execution_dev(bc, pub, ExecutionWitness(), builder)
    assert np.array_equal(hp.transcript, dp.transcript)


def test_dev_whir_commit_open_matches_host(monkeypatch):
    # waterline at 2^8 so the 2^12 commit and the early opening rounds
    # exercise the DEVICE kernels (default waterline would host the lot)
    monkeypatch.setenv("LMS_WATERLINE", "8")
    from leanmultisig_tpu.fs.prover import ProverState
    from leanmultisig_tpu.dprover.dfs import DevProverState
    from leanmultisig_tpu.whir.config import WhirConfig
    from leanmultisig_tpu.whir.prover import commit as h_commit
    from leanmultisig_tpu.whir.prover import open_ as h_open
    from leanmultisig_tpu.whir.statement import SparseStatement, SparseValue
    from leanmultisig_tpu.dprover import dwhir
    from test_e2e import _test_builder

    n_vars = 12
    config = WhirConfig(_test_builder(), n_vars)
    poly = rand_base(1 << n_vars)
    point = rand_ext(n_vars)
    value = pp.eval_mle(poly, point)
    point2 = rand_ext(n_vars - 2)
    v20 = pp.eval_mle(poly[: 1 << (n_vars - 2)], point2)
    v21 = pp.eval_mle(poly[1 << (n_vars - 2): 2 << (n_vars - 2)], point2)

    h = ProverState()
    hw = h_commit(config, h, poly)
    h_statements = [
        SparseStatement.dense(point, value),
        SparseStatement(n_vars, point2,
                        [SparseValue(0, v20), SparseValue(1, v21)]),
    ]
    h_open(config, h, h_statements, hw, poly)
    hp = h.into_proof()

    d = DevProverState()
    dw = dwhir.commit_dev(config, d, dev(poly))
    d_statements = [
        dwhir.DStatement(n_vars, dev(point),
                         [dwhir.DStatementValue(0, dev(value))]),
        dwhir.DStatement(n_vars, dev(point2),
                         [dwhir.DStatementValue(0, dev(v20)),
                          dwhir.DStatementValue(1, dev(v21))]),
    ]
    dwhir.open_dev(config, d, d_statements, dw, dev(poly))
    dp = d.finalize()

    assert np.array_equal(hp.transcript, dp.transcript)
    assert len(hp.merkle_paths) == len(dp.merkle_paths)
    from leanmultisig_tpu.fs.merkle_pruning import restore
    for hg, dg in zip(hp.merkle_paths, dp.merkle_paths):
        hps, dps = restore(hg), restore(dg)
        assert hps is not None and dps is not None
        assert len(hps) == len(dps)
        for a, b in zip(hps, dps):
            assert a.leaf_index == b.leaf_index
            assert np.array_equal(a.leaf_data, b.leaf_data)
            assert np.array_equal(a.sibling_hashes, b.sibling_hashes)
