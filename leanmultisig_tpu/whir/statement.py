"""Sparse statements over the stacked polynomial + weight combination.

Mirrors the reference SparseStatement (crates/whir/src/lib.rs:31-109),
combine_statement (open.rs:518-584), combine_constraints (verify.rs:209-227)
and eval_constraints_poly (verify.rs:346-384).

A statement claims eval(s) of slices of the committed MLE: `point` fixes
the SUFFIX variables, each (selector, value) pair picks a PREFIX index.
`is_next` swaps the eq weight for next_mle (shifted-column claims).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field import np_field as nf
from ..poly import np_poly as pp

EXT_DIM = 5


@dataclass
class SparseValue:
    selector: int
    value: np.ndarray  # (5,)


@dataclass
class SparseStatement:
    total_num_variables: int
    point: np.ndarray  # (m, 5) EF point over the suffix vars
    values: list[SparseValue]
    is_next: bool = False

    def __post_init__(self):
        self.point = np.asarray(self.point, np.uint32).reshape(-1, EXT_DIM)
        assert self.total_num_variables >= len(self.point)

    @classmethod
    def dense(cls, point: np.ndarray, value: np.ndarray) -> "SparseStatement":
        point = np.asarray(point, np.uint32).reshape(-1, EXT_DIM)
        return cls(len(point), point, [SparseValue(0, np.asarray(value, np.uint32))])

    @classmethod
    def unique_value(cls, total_num_variables: int, index: int,
                     value: np.ndarray) -> "SparseStatement":
        return cls(total_num_variables,
                   np.zeros((0, EXT_DIM), np.uint32),
                   [SparseValue(index, np.asarray(value, np.uint32))])

    @classmethod
    def new_next(cls, total_num_variables: int, point: np.ndarray,
                 values: list[SparseValue]) -> "SparseStatement":
        return cls(total_num_variables, point, values, is_next=True)

    def inner_num_variables(self) -> int:
        return len(self.point)

    def selector_num_variables(self) -> int:
        return self.total_num_variables - self.inner_num_variables()


def combine_statement(statements: list[SparseStatement],
                      gamma: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (weights (2^n, 5), combined_sum (5,)). (open.rs:518-584)

    gamma powers advance per (statement, value) in original order.
    """
    num_variables = statements[0].total_num_variables
    assert all(s.total_num_variables == num_variables for s in statements)
    weights = np.zeros((1 << num_variables, EXT_DIM), np.uint32)
    combined_sum = pp.EZERO.copy()
    gamma_pow = pp.EONE.copy()

    for smt in statements:
        selectors = [v.selector for v in smt.values]
        assert len(set(selectors)) == len(selectors), "duplicate selectors"
        assert all(v.selector < (1 << smt.selector_num_variables())
                   for v in smt.values)
        inner_n = smt.inner_num_variables()
        if smt.is_next:
            inner_poly = pp.matrix_next_mle_folded(smt.point)
        elif len(smt.values) > 1:
            # ONE eq table per statement; per-value blocks are scalar
            # multiples (the table is linear in its seed scalar)
            inner_poly = pp.eval_eq(smt.point)
        else:
            inner_poly = None  # single value: seed the scalar directly
        from ..native import get_fieldops_lib
        _lib = get_fieldops_lib()
        for v in smt.values:
            lo = v.selector << inner_n
            if inner_poly is None:
                # fused tensor-product accumulate, no 2^n temporary
                pp.add_scaled_eq(weights[lo:lo + (1 << inner_n)],
                                 smt.point, gamma_pow)
                combined_sum = nf.eadd(combined_sum,
                                       nf.emul(v.value, gamma_pow))
                gamma_pow = nf.emul(gamma_pow, gamma)
                continue
            block = nf.emul(inner_poly,
                            np.broadcast_to(gamma_pow, inner_poly.shape))
            if _lib is not None:
                import ctypes
                u32p = ctypes.POINTER(ctypes.c_uint32)
                seg = weights[lo:lo + (1 << inner_n)]
                bc = np.ascontiguousarray(block, np.uint32)
                _lib.base_add_inplace(seg.ctypes.data_as(u32p),
                                      bc.ctypes.data_as(u32p), seg.size)
            else:
                weights[lo:lo + (1 << inner_n)] = nf.eadd(
                    weights[lo:lo + (1 << inner_n)], block)
            combined_sum = nf.eadd(combined_sum, nf.emul(v.value, gamma_pow))
            gamma_pow = nf.emul(gamma_pow, gamma)

    return weights, combined_sum


def combine_constraints(verifier_state, claimed_sum: np.ndarray,
                        constraints: list[SparseStatement]
                        ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Verifier-side mirror (verify.rs:209-227).

    -> (new claimed_sum, combination randomness per value)."""
    gamma = verifier_state.sample()
    randomness = [pp.EONE.copy()]
    for smt in constraints:
        for v in smt.values:
            cur = randomness[-1]
            claimed_sum = nf.eadd(claimed_sum, nf.emul(cur, v.value))
            randomness.append(nf.emul(cur, gamma))
    randomness.pop()
    return claimed_sum, randomness


def eval_constraints_poly(folding_factor_at, round_constraints, point: np.ndarray
                          ) -> np.ndarray:
    """Evaluate the combined weight poly at `point` (verify.rs:346-384).

    round_constraints: list of (randomness list, constraints list) per round.
    folding_factor_at: round index -> folding factor.
    """
    value = pp.EZERO.copy()
    point = np.asarray(point, np.uint32).reshape(-1, EXT_DIM)
    for round_, (randomness, constraints) in enumerate(round_constraints):
        if round_ > 0:
            point = point[folding_factor_at(round_ - 1):]
        i = 0
        for smt in constraints:
            inner_point = point[len(point) - smt.inner_num_variables():]
            if smt.is_next:
                common_weight = pp.next_mle(smt.point, inner_point)
            else:
                common_weight = pp.eq_poly_outside(smt.point, inner_point)
            sel_n = smt.selector_num_variables()
            for v in smt.values:
                sel_weight = pp.EONE.copy()
                for j in range(sel_n):
                    if v.selector & (1 << (sel_n - 1 - j)) == 0:
                        sel_weight = nf.emul(sel_weight,
                                             nf.esub(pp.EONE, point[j]))
                    else:
                        sel_weight = nf.emul(sel_weight, point[j])
                contrib = nf.emul(nf.emul(sel_weight, common_weight),
                                  randomness[i])
                value = nf.eadd(value, contrib)
                i += 1
        assert i == len(randomness)
    return value
