"""Sumcheck engine (host/numpy reference implementation).

Protocol semantics mirror the reference sumcheck crate
(crates/backend/sumcheck/src):
  * Round polynomial h evaluated at z in {0, 2, 3, ..., d}; h(1) deduced
    from the claimed sum (prove.rs:171-203).
  * An optional eq factor eq(alpha, .) is handled OUTSIDE the bare
    polynomial: the eq table is built over alpha[1:] once, truncated by
    half each round, with the scalar `missing_mul_factor` bookkeeping
    eq_eval / (1 - alpha_next) (prove.rs:246-279, split_eq.rs).
  * Transcript: bare coefficients with c0/h0 elision
    (fs.prover.add_sumcheck_polynomial).

A `computation` is an object with:
  degree: int
  eval(columns, extra) -> (M, 5) EF array, vectorized over rows, where
  columns is a list of (M,) base or (M, 5) EF arrays.

The device (JAX) engine in jnp_sumcheck.py reuses this module's round
orchestration with a device compute kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import np_field as nf
from ..poly import np_poly as pp

EXT_DIM = 5


@dataclass
class ProductComputation:
    """point[0] * point[1] (product_computation.rs)."""

    degree: int = 2

    def eval(self, columns, extra):
        a, b = columns
        if a.ndim == 1:
            a = pp.efrom_base_table(a)
        if b.ndim == 1:
            b = pp.efrom_base_table(b)
        return nf.emul(a, b)


def _ef_sum(rows: np.ndarray) -> np.ndarray:
    """Sum (M,5) EF rows -> (5,)."""
    return (rows.astype(np.uint64).sum(axis=0) % np.uint64(2130706433)).astype(np.uint32)


def _scalar_rows(x, m):
    return np.broadcast_to(np.asarray(x, np.uint32), (m, EXT_DIM))


def compute_round_evals(columns, computation, extra, eq_table, missing_mul_factor):
    """h(z) for z = 0, 2, ..., degree. Returns (degree, 5) EF values."""
    degree = computation.degree
    fold_size = columns[0].shape[0] // 2
    m = fold_size

    native = getattr(computation, "native_round_evals", None)
    if native is not None and eq_table is not None:
        h = native(columns, eq_table)
        if h is not None:
            if missing_mul_factor is not None:
                h = np.stack([nf.emul(x, missing_mul_factor) for x in h])
            return h

    lows = [c[:fold_size] for c in columns]
    highs = [c[fold_size:] for c in columns]
    diffs = [nf.sub(h, l) for h, l in zip(highs, lows)]

    # z-points: 0, then 2, 3, ..., degree (z=1 deduced from the sum)
    points = [lows]
    running = highs
    for _ in range(1, degree):
        running = [nf.add(r, d) for r, d in zip(running, diffs)]
        points.append(running)

    evals = []
    for pt in points:
        vals = computation.eval(pt, extra)  # (m, 5)
        if eq_table is not None:
            vals = nf.emul(vals, eq_table[:m])
        total = _ef_sum(vals)
        if missing_mul_factor is not None:
            total = nf.emul(total, missing_mul_factor)
        evals.append(total)
    return np.stack(evals)


def _product_round_coeffs(evals, weights, sum_):
    """Direct (c0, c1, c2) for the product sumcheck
    (sumcheck/src/product_computation.rs compute_product_sumcheck_polynomial):
    c0 = sum y0*x0, c2 = sum (y1-y0)(x1-x0), c1 = sum - 2c0 - c2."""
    half = evals.shape[0] // 2
    from ..native import get_fieldops_lib
    lib = get_fieldops_lib()
    if lib is not None and hasattr(lib, "product_round_coeffs"):
        import ctypes
        u32p = ctypes.POINTER(ctypes.c_uint32)
        xc = np.ascontiguousarray(evals, np.uint32)
        yc = np.ascontiguousarray(weights, np.uint32)
        out = np.empty((2, 5), np.uint32)
        lib.product_round_coeffs(xc.ctypes.data_as(u32p),
                                 int(evals.ndim == 2),
                                 yc.ctypes.data_as(u32p), half,
                                 out.ctypes.data_as(u32p))
        c0, c2 = out[0], out[1]
        c1 = nf.esub(nf.esub(np.asarray(sum_, np.uint32),
                             nf.eadd(c0, c0)), c2)
        return np.stack([c0, c1, c2])
    x0, x1 = evals[:half], evals[half:]
    y0, y1 = weights[:half], weights[half:]
    if evals.ndim == 1:
        c0 = _ef_sum(nf.escalar_mul(y0, x0))
        c2 = _ef_sum(nf.escalar_mul(nf.esub(y1, y0), nf.sub(x1, x0)))
    else:
        c0 = _ef_sum(nf.emul(y0, x0))
        c2 = _ef_sum(nf.emul(nf.esub(y1, y0), nf.esub(x1, x0)))
    c1 = nf.esub(nf.esub(sum_, nf.eadd(c0, c0)), c2)
    return np.stack([c0, c1, c2])


def sumcheck_prove(columns, computation, extra, eq_factor, prover_state, sum_,
                   n_rounds=None, pow_bits=0, missing_mul_factor=None,
                   eq_table=None):
    """Run the sumcheck prover.

    columns: list of (2^n,) base or (2^n, 5) EF tables.
    eq_factor: optional (n, 5) EF point alpha (claim includes eq(alpha, x)).
    eq_table: optional precomputed table for eq_factor[1:] — pass the
    SLICED table when resuming a sumcheck mid-protocol (the slicing
    convention folds (1-alpha) prefactors into the table, compensated by
    missing_mul_factor; a freshly built table would not match).
    Returns (challenges (k,5), folded_columns, final_sum).
    """
    n_vars = int(np.log2(columns[0].shape[0]))
    if n_rounds is None:
        n_rounds = n_vars
    sum_ = np.asarray(sum_, np.uint32)

    eq_point = None
    if eq_factor is not None:
        eq_point = [np.asarray(a, np.uint32) for a in eq_factor]
        assert len(eq_point) == n_vars
        if eq_table is None:
            rest = (np.stack(eq_point[1:]) if n_vars > 1
                    else np.zeros((0, EXT_DIM), np.uint32))
            eq_table = pp.eval_eq(rest)  # size 2^(n-1), truncated per round
    else:
        eq_table = None

    is_product = (isinstance(computation, ProductComputation)
                  and eq_factor is None and missing_mul_factor is None)

    challenges = []
    for _ in range(n_rounds):
        if is_product:
            coeffs = _product_round_coeffs(columns[0], columns[1], sum_)
            prover_state.add_sumcheck_polynomial(coeffs)
            prover_state.pow_grinding(pow_bits)
            r = prover_state.sample()
            challenges.append(r)
            sum_ = pp.horner_eval(coeffs, r)
            columns = [pp.fold(c, r) for c in columns]
            continue
        degree = computation.degree
        h_evals = compute_round_evals(columns, computation, extra, eq_table,
                                      missing_mul_factor)
        # deduce h(1)
        if eq_point is not None:
            a0 = eq_point[0]
            # h(1) = (sum - (1 - a0) * h(0)) / a0
            one_m = nf.esub(pp.EONE, a0)
            num = nf.esub(sum_, nf.emul(one_m, h_evals[0]))
            h1 = nf.emul(num, nf.einv(a0))
        else:
            h1 = nf.esub(sum_, h_evals[0])
        zs = [0, 1] + list(range(2, degree + 1))
        ys = np.concatenate([h_evals[:1], h1[None], h_evals[1:]])
        coeffs = pp.lagrange_interpolation(zs, ys)
        # pad to degree+1 coefficients (interpolation may drop leading zeros)
        if len(coeffs) < degree + 1:
            coeffs = np.concatenate(
                [coeffs, np.zeros((degree + 1 - len(coeffs), EXT_DIM), np.uint32)])

        eq_alpha = eq_point[0] if eq_point is not None else None
        prover_state.add_sumcheck_polynomial(coeffs, eq_alpha)
        prover_state.pow_grinding(pow_bits)
        r = prover_state.sample()
        challenges.append(r)

        # update claimed sum
        sum_ = pp.horner_eval(coeffs, r)
        if eq_point is not None:
            a0 = eq_point[0]
            eq_eval = nf.eadd(nf.emul(nf.esub(pp.EONE, a0), nf.esub(pp.EONE, r)),
                              nf.emul(a0, r))
            sum_ = nf.emul(sum_, eq_eval)
            prev = missing_mul_factor if missing_mul_factor is not None else pp.EONE
            nxt = eq_point[1] if len(eq_point) > 1 else pp.EZERO
            denom = nf.esub(pp.EONE, nxt)
            missing_mul_factor = nf.emul(nf.emul(eq_eval, prev), nf.einv(denom))
            eq_point = eq_point[1:]
            if eq_table is not None and eq_table.shape[0] > 1:
                eq_table = eq_table[:eq_table.shape[0] // 2]

        columns = [pp.fold(c, r) for c in columns]

    return (np.stack(challenges) if challenges else
            np.zeros((0, EXT_DIM), np.uint32)), columns, sum_


def sumcheck_verify(verifier_state, n_vars, degree, expected_sum,
                    eq_alphas=None):
    """Mirror of sumcheck_verify (verify.rs:5-27).

    Returns (challenges (n,5), final target value (5,)).
    """
    target = np.asarray(expected_sum, np.uint32)
    challenges = []
    for rnd in range(n_vars):
        eq_alpha = eq_alphas[rnd] if eq_alphas is not None else None
        coeffs = verifier_state.next_sumcheck_polynomial(degree + 1, target,
                                                         eq_alpha)
        r = verifier_state.sample()
        challenges.append(r)
        target = pp.horner_eval(coeffs, r)
    return np.stack(challenges), target
