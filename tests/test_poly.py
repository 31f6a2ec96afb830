"""Polynomial layer: evaluation, folds, eq tables, next_mle, interpolation."""

import numpy as np

from leanmultisig_tpu.field import np_field as nf
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poly import np_poly as pp

RNG = np.random.default_rng(3)


def rand_f(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint32)


def test_eval_mle_on_hypercube():
    n = 4
    evals = rand_f((1 << n, 5))
    for i in [0, 3, 7, 15]:
        point = pp.to_big_endian_in_field(i, n)
        got = pp.eval_mle(evals, point)
        assert np.array_equal(got, evals[i])


def test_eval_mle_base_table():
    n = 3
    evals = rand_f(1 << n)
    for i in range(1 << n):
        point = pp.to_big_endian_in_field(i, n)
        got = pp.eval_mle(evals, point)
        assert got[0] == evals[i] and np.all(got[1:] == 0)


def test_fold_consistency():
    # folding MSB then evaluating == evaluating at [alpha, rest]
    n = 5
    evals = rand_f((1 << n, 5))
    point = rand_f((n, 5))
    direct = pp.eval_mle(evals, point)
    folded = pp.fold(evals, point[0])
    via_fold = pp.eval_mle(folded, point[1:])
    assert np.array_equal(direct, via_fold)


def test_fold_lsb_consistency():
    n = 5
    evals = rand_f((1 << n, 5))
    point = rand_f((n, 5))
    # folding LSB with point[-1], then eval at point[:-1]
    folded = pp.fold_lsb(evals, point[-1])
    via = pp.eval_mle(folded, point[:-1])
    assert np.array_equal(via, pp.eval_mle(evals, point))


def test_fold_at_bit():
    n = 5
    evals = rand_f((1 << n, 5))
    point = rand_f((n, 5))
    for bit in range(n):
        # folding variable at position `bit` from LSB = variable index n-1-bit
        folded = pp.fold_at_bit(evals, point[n - 1 - bit], bit)
        rest = np.delete(point, n - 1 - bit, axis=0)
        assert np.array_equal(pp.eval_mle(folded, rest),
                              pp.eval_mle(evals, point))


def test_eval_eq_table():
    n = 4
    point = rand_f((n, 5))
    table = pp.eval_eq(point)
    # sum over hypercube of eq(x, point) = 1
    total = table[0]
    for row in table[1:]:
        total = nf.eadd(total, row)
    assert np.array_equal(total, pp.EONE)
    # eval of table at point' == eq_poly_outside(point, point')
    q = rand_f((n, 5))
    assert np.array_equal(pp.eval_mle(table, q), pp.eq_poly_outside(point, q))
    # scaled
    s = rand_f(5)
    tab_s = pp.eval_eq(point, s)
    assert np.array_equal(tab_s[3], nf.emul(table[3], s))


def test_next_mle_on_booleans():
    n = 4
    for x in range(1 << n):
        xb = pp.to_big_endian_in_field(x, n)
        table = pp.matrix_next_mle_folded(xb)
        for y in range(1 << n):
            yb = pp.to_big_endian_in_field(y, n)
            want = 1 if (x + 1 == y or (x == (1 << n) - 1 and y == x)) else 0
            got = pp.next_mle(xb, yb)
            assert got[0] == want and np.all(got[1:] == 0), (x, y)
            assert np.array_equal(pp.eval_mle(table, yb), got)


def test_mle_of_zeros_then_ones():
    n = 4
    for n_zeros in range(0, (1 << n) + 1, 3):
        point = rand_f((n, 5))
        table = np.zeros((1 << n, 5), np.uint32)
        table[n_zeros:, 0] = 1
        assert np.array_equal(pp.mle_of_zeros_then_ones(n_zeros, point),
                              pp.eval_mle(table, point))


def test_expand_from_univariate():
    # expand(y, n) = [y, y^2, y^4, ...] (point.rs:51-60)
    y = rand_f(5)
    point = pp.expand_from_univariate(y, 4)
    assert np.array_equal(point[0], y)
    assert np.array_equal(point[1], nf.emul(y, y))
    assert np.array_equal(point[2], nf.emul(point[1], point[1]))
    assert np.array_equal(point[3], nf.emul(point[2], point[2]))
    # MLE eval at the power point is multiplicative over variable splits:
    # f(evals) at expand(y, n) == sum over the multilinear basis — sanity
    # via direct eval agreement between full table and its two halves.
    n = 3
    evals = rand_f((1 << n, 5))
    p3 = pp.expand_from_univariate(y, n)
    lo = pp.eval_mle(evals[:4], p3[1:])
    hi = pp.eval_mle(evals[4:], p3[1:])
    want = nf.eadd(lo, nf.emul(y, nf.esub(hi, lo)))
    assert np.array_equal(pp.eval_mle(evals, p3), want)


def test_lagrange_interpolation():
    xs = [0, 1, 2, 5, 7]
    ys = rand_f((5, 5))
    coeffs = pp.lagrange_interpolation(xs, ys)
    for x, yv in zip(xs, ys):
        got = pp.horner_eval(coeffs, pp.efrom_base_scalar(x))
        assert np.array_equal(got, yv)
