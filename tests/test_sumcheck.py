"""Sumcheck prove/verify roundtrips: product, custom computation, eq factor."""

import numpy as np
from dataclasses import dataclass

from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poly import np_poly as pp
from leanmultisig_tpu.fs.prover import ProverState
from leanmultisig_tpu.fs.verifier import VerifierState
from leanmultisig_tpu.sumcheck.np_sumcheck import (
    ProductComputation, sumcheck_prove, sumcheck_verify)

RNG = np.random.default_rng(4)


def rand_f(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint32)


def ef_sum(rows):
    return (rows.astype(np.uint64).sum(axis=0) % P).astype(np.uint32)


def test_product_sumcheck_roundtrip():
    n = 6
    a = rand_f((1 << n, 5))
    b = rand_f((1 << n, 5))
    claimed = ef_sum(nf.emul(a, b))

    prover = ProverState()
    challenges_p, folded, final_sum = sumcheck_prove(
        [a, b], ProductComputation(), None, None, prover, claimed)
    proof = prover.into_proof()

    v = VerifierState(proof)
    challenges_v, target = sumcheck_verify(v, n, 2, claimed)
    assert np.array_equal(challenges_p, challenges_v)
    # final check: target == a(r) * b(r)
    ar = pp.eval_mle(a, challenges_v)
    br = pp.eval_mle(b, challenges_v)
    assert np.array_equal(target, nf.emul(ar, br))
    # prover's folded columns match
    assert np.array_equal(folded[0][0], ar)
    assert np.array_equal(folded[1][0], br)
    assert np.array_equal(final_sum, target)


def test_product_sumcheck_base_field_column():
    n = 5
    a = rand_f(1 << n)  # base field
    b = rand_f((1 << n, 5))
    claimed = ef_sum(nf.emul(pp.efrom_base_table(a), b))

    prover = ProverState()
    ch_p, folded, _ = sumcheck_prove([a, b], ProductComputation(), None, None,
                                     prover, claimed)
    v = VerifierState(prover.into_proof())
    ch_v, target = sumcheck_verify(v, n, 2, claimed)
    assert np.array_equal(ch_p, ch_v)
    assert np.array_equal(
        target, nf.emul(pp.eval_mle(a, ch_v), pp.eval_mle(b, ch_v)))


@dataclass
class CubeComputation:
    """point[0]^3 + 2*point[1] — degree-3 test computation."""

    degree: int = 3

    def eval(self, columns, extra):
        a, b = columns
        if a.ndim == 1:
            a = pp.efrom_base_table(a)
        if b.ndim == 1:
            b = pp.efrom_base_table(b)
        return nf.eadd(nf.emul(nf.emul(a, a), a), nf.eadd(b, b))


def test_cubic_sumcheck_roundtrip():
    n = 5
    a, b = rand_f((1 << n, 5)), rand_f((1 << n, 5))
    vals = CubeComputation().eval([a, b], None)
    claimed = ef_sum(vals)

    prover = ProverState()
    ch_p, _, _ = sumcheck_prove([a, b], CubeComputation(), None, None, prover,
                                claimed)
    v = VerifierState(prover.into_proof())
    ch_v, target = sumcheck_verify(v, n, 3, claimed)
    assert np.array_equal(ch_p, ch_v)
    want = CubeComputation().eval([pp.eval_mle(a, ch_v)[None],
                                   pp.eval_mle(b, ch_v)[None]], None)[0]
    assert np.array_equal(target, want)


def test_sumcheck_with_eq_factor():
    # claim: sum_x eq(alpha, x) * a(x) * b(x) = v
    n = 5
    a, b = rand_f((1 << n, 5)), rand_f((1 << n, 5))
    alpha = rand_f((n, 5))
    eq_tab = pp.eval_eq(alpha)
    claimed = ef_sum(nf.emul(eq_tab, nf.emul(a, b)))

    prover = ProverState()
    ch_p, _, final_sum = sumcheck_prove([a, b], ProductComputation(), None,
                                        list(alpha), prover, claimed)
    v = VerifierState(prover.into_proof())
    # full degree = computation degree + 1 (eq linear factor)
    ch_v, target = sumcheck_verify(v, n, 3, claimed, eq_alphas=list(alpha))
    assert np.array_equal(ch_p, ch_v)
    want = nf.emul(pp.eq_poly_outside(alpha, ch_v),
                   nf.emul(pp.eval_mle(a, ch_v), pp.eval_mle(b, ch_v)))
    assert np.array_equal(target, want)
    assert np.array_equal(final_sum, target)


def test_sumcheck_rejects_wrong_sum():
    n = 4
    a, b = rand_f((1 << n, 5)), rand_f((1 << n, 5))
    claimed = ef_sum(nf.emul(a, b))
    bad = claimed.copy()
    bad[0] = (int(bad[0]) + 1) % P

    prover = ProverState()
    sumcheck_prove([a, b], ProductComputation(), None, None, prover, claimed)
    v = VerifierState(prover.into_proof())
    _, target = sumcheck_verify(v, n, 2, bad)
    # the final value won't match the true product evaluation
    ch = np.zeros((0, 5))  # unused
    # recompute verifier challenges by replay
    v2 = VerifierState(prover.into_proof())
    ch_v, target2 = sumcheck_verify(v2, n, 2, claimed)
    ar = pp.eval_mle(a, ch_v)
    br = pp.eval_mle(b, ch_v)
    assert not np.array_equal(target, nf.emul(ar, br))
