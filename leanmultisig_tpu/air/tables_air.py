"""AIR constraint systems for the three tables.

Constraint order and algebra mirror the reference exactly (the alpha-power
weighting is order-sensitive):
  execution:    crates/lean_vm/src/tables/execution/air.rs:56-134
  extension_op: crates/lean_vm/src/tables/extension_op/air.rs:58-164
  poseidon16:   crates/lean_vm/src/tables/poseidon_16/mod.rs:316-548
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import np_field as nf
from ..poseidon.sparse import sparse_constants
from ..vm import tables as T
from ..vm.isa import (COL_AUX, COL_FLAG_A, COL_FLAG_AB_FP, COL_FLAG_B,
                      COL_FLAG_C, COL_FLAG_C_FP, COL_FP, COL_JUMP,
                      COL_MEM_ADDRESS_A, COL_MEM_ADDRESS_B, COL_MEM_ADDRESS_C,
                      COL_MEM_VALUE_A, COL_MEM_VALUE_B, COL_MEM_VALUE_C,
                      COL_MUL, COL_OPERAND_A, COL_OPERAND_B, COL_OPERAND_C,
                      COL_PC, COL_PRECOMPILE_DATA, DIMENSION,
                      EXT_OP_FLAG_ADD, EXT_OP_FLAG_IS_BE, EXT_OP_FLAG_MUL,
                      EXT_OP_FLAG_POLY_EQ, EXT_OP_LEN_MULTIPLIER,
                      LOGUP_PRECOMPILE_DOMAINSEP,
                      POSEIDON_HALF_OUTPUT_SHIFT,
                      POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT,
                      POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT,
                      POSEIDON_PERMUTE_SHIFT)
from . import ops


@dataclass
class ExtraDataForBuses:
    logup_alphas_eq_poly: np.ndarray  # (16, 5)
    bus_beta: np.ndarray  # (5,)


def eval_virtual_bus_column(extra: ExtraDataForBuses, flag, data):
    """(tables/utils.rs:5-23) -> ext value"""
    acc = None
    for alpha, d in zip(extra.logup_alphas_eq_poly, data):
        term = ops.mul(d, alpha[None, :])
        acc = term if acc is None else nf.eadd(acc, term)
    domsep = ops.mul(LOGUP_PRECOMPILE_DOMAINSEP,
                     extra.logup_alphas_eq_poly[-1][None, :])
    acc = nf.eadd(acc, np.broadcast_to(domsep, acc.shape))
    out = ops.mul(acc, extra.bus_beta[None, :])
    return ops.add(out, flag)


# ---------------------------------------------------------------------------
# Execution table
# ---------------------------------------------------------------------------

EXECUTION_DEGREE = 5
EXECUTION_N_SHIFT = 2


def eval_execution_air(b, extra: ExtraDataForBuses):
    flat = b.flat()
    shift = b.shift()
    pc_shift, fp_shift = shift[COL_PC], shift[COL_FP]
    operand_a, operand_b, operand_c = (flat[COL_OPERAND_A], flat[COL_OPERAND_B],
                                       flat[COL_OPERAND_C])
    flag_a, flag_b, flag_c = flat[COL_FLAG_A], flat[COL_FLAG_B], flat[COL_FLAG_C]
    flag_c_fp, flag_ab_fp = flat[COL_FLAG_C_FP], flat[COL_FLAG_AB_FP]
    mul_f, jump, aux = flat[COL_MUL], flat[COL_JUMP], flat[COL_AUX]
    precompile_data = flat[COL_PRECOMPILE_DATA]
    value_a, value_b, value_c = (flat[COL_MEM_VALUE_A], flat[COL_MEM_VALUE_B],
                                 flat[COL_MEM_VALUE_C])
    pc, fp = flat[COL_PC], flat[COL_FP]
    addr_a, addr_b, addr_c = (flat[COL_MEM_ADDRESS_A], flat[COL_MEM_ADDRESS_B],
                              flat[COL_MEM_ADDRESS_C])

    one_m_a = ops.neg(ops.sub(ops.add(flag_a, flag_ab_fp), 1))
    one_m_b = ops.neg(ops.sub(ops.add(flag_b, flag_ab_fp), 1))
    one_m_c = ops.neg(ops.sub(ops.add(flag_c, flag_c_fp), 1))

    nu_a = ops.add(ops.add(ops.mul(flag_a, operand_a), ops.mul(one_m_a, value_a)),
                   ops.mul(flag_ab_fp, ops.add(fp, operand_a)))
    nu_b = ops.add(ops.add(ops.mul(flag_b, operand_b), ops.mul(one_m_b, value_b)),
                   ops.mul(flag_ab_fp, ops.add(fp, operand_b)))
    nu_c = ops.add(ops.add(ops.mul(flag_c, operand_c), ops.mul(one_m_c, value_c)),
                   ops.mul(flag_c_fp, ops.add(fp, operand_c)))

    add_f = ops.sub(ops.mul(aux, 2), ops.mul(aux, aux))
    deref = ops.halve(ops.mul(aux, ops.sub(aux, 1)))
    is_precompile = ops.neg(
        ops.sub(ops.add(ops.add(add_f, mul_f), ops.add(deref, jump)), 1))

    if getattr(b, "bus", True):
        b.assert_zero_ef(eval_virtual_bus_column(
            extra, is_precompile, [precompile_data, nu_a, nu_b, nu_c]))
    else:
        b.declare_values([is_precompile])
        b.declare_values([precompile_data, nu_a, nu_b, nu_c])

    b.assert_zero(ops.mul(one_m_a, ops.sub(addr_a, ops.add(fp, operand_a))))
    b.assert_zero(ops.mul(one_m_b, ops.sub(addr_b, ops.add(fp, operand_b))))
    b.assert_zero(ops.mul(one_m_c, ops.sub(addr_c, ops.add(fp, operand_c))))

    b.assert_zero(ops.mul(add_f, ops.sub(nu_b, ops.add(nu_a, nu_c))))
    b.assert_zero(ops.mul(mul_f, ops.sub(nu_b, ops.mul(nu_a, nu_c))))

    b.assert_zero(ops.mul(deref, ops.sub(addr_b, ops.add(value_a, operand_b))))
    b.assert_zero(ops.mul(deref, ops.sub(value_b, nu_c)))

    jump_and_cond = ops.mul(jump, nu_a)
    b.assert_zero(ops.mul(jump_and_cond, ops.sub(nu_a, 1)))
    b.assert_zero(ops.mul(jump_and_cond, ops.sub(pc_shift, nu_b)))
    b.assert_zero(ops.mul(jump_and_cond, ops.sub(fp_shift, nu_c)))
    not_jc = ops.neg(ops.sub(jump_and_cond, 1))
    b.assert_zero(ops.mul(not_jc, ops.sub(pc_shift, ops.add(pc, 1))))
    b.assert_zero(ops.mul(not_jc, ops.sub(fp_shift, fp)))


# ---------------------------------------------------------------------------
# ExtensionOp table
# ---------------------------------------------------------------------------

EXTENSION_OP_DEGREE = 6
EXTENSION_OP_N_SHIFT = T.EXT_COL_COMP + 5  # 13


def _quintic_mul_generic(a, b):
    """quintic_mul over X^5 + X^2 - 1 on 5-vectors of generic values
    (quintic_extension/extension.rs:529-549 schedule)."""
    def dot5(x, y):
        acc = None
        for xi, yi in zip(x, y):
            t = ops.mul(xi, yi)
            acc = t if acc is None else ops.add(acc, t)
        return acc

    b0, b1, b2, b3, b4 = b
    b_0_m3 = ops.sub(b0, b3)
    b_1_m4 = ops.sub(b1, b4)
    b_4_m2 = ops.sub(b4, b2)
    c0 = dot5(a, [b0, b4, b3, b2, b_1_m4])
    c1 = dot5(a, [b1, b0, b4, b3, b2])
    c2 = dot5(a, [b2, b_1_m4, b_0_m3, b_4_m2, ops.sub(b3, b_1_m4)])
    c3 = dot5(a, [b3, b2, b_1_m4, b_0_m3, b_4_m2])
    c4 = dot5(a, [b4, b3, b2, b_1_m4, b_0_m3])
    return [c0, c1, c2, c3, c4]


def eval_extension_op_air(b, extra: ExtraDataForBuses):
    flat = b.flat()
    shift = b.shift()

    is_be = flat[T.EXT_COL_IS_BE]
    start = flat[T.EXT_COL_START]
    flag_add = flat[T.EXT_COL_FLAG_ADD]
    flag_mul = flat[T.EXT_COL_FLAG_MUL]
    flag_poly_eq = flat[T.EXT_COL_FLAG_POLY_EQ]
    length = flat[T.EXT_COL_LEN]
    idx_a = flat[T.EXT_COL_IDX_A]
    idx_b = flat[T.EXT_COL_IDX_B]
    va = [flat[T.EXT_COL_VA + k] for k in range(5)]
    vb = [flat[T.EXT_COL_VB + k] for k in range(5)]
    vres = [flat[T.EXT_COL_VRES + k] for k in range(5)]
    comp = [flat[T.EXT_COL_COMP + k] for k in range(5)]

    is_be_shift = shift[T.EXT_COL_IS_BE]
    start_shift = shift[T.EXT_COL_START]
    len_shift = shift[T.EXT_COL_LEN]
    flag_add_shift = shift[T.EXT_COL_FLAG_ADD]
    flag_mul_shift = shift[T.EXT_COL_FLAG_MUL]
    flag_poly_eq_shift = shift[T.EXT_COL_FLAG_POLY_EQ]
    idx_a_shift = shift[T.EXT_COL_IDX_A]
    idx_b_shift = shift[T.EXT_COL_IDX_B]
    comp_shift = [shift[T.EXT_COL_COMP + k] for k in range(5)]

    active = ops.add(ops.add(flag_add, flag_mul), flag_poly_eq)
    activation_flag = ops.mul(start, active)
    aux = ops.add(
        ops.add(ops.mul(is_be, EXT_OP_FLAG_IS_BE),
                ops.mul(flag_add, EXT_OP_FLAG_ADD)),
        ops.add(ops.add(ops.mul(flag_mul, EXT_OP_FLAG_MUL),
                        ops.mul(flag_poly_eq, EXT_OP_FLAG_POLY_EQ)),
                ops.mul(length, EXT_OP_LEN_MULTIPLIER)))
    idx_r = flat[T.EXT_COL_IDX_RES]

    if getattr(b, "bus", True):
        b.assert_zero_ef(eval_virtual_bus_column(
            extra, activation_flag, [aux, idx_a, idx_b, idx_r]))
    else:
        b.declare_values([activation_flag])
        b.declare_values([aux, idx_a, idx_b, idx_r])

    is_ee = ops.neg(ops.sub(is_be, 1))
    not_start_shift = ops.neg(ops.sub(start_shift, 1))
    va_f_or_ef = [va[0]] + [ops.mul(va[k], is_ee) for k in range(1, 5)]
    comp_tail = [ops.mul(cs, not_start_shift) for cs in comp_shift]

    b.assert_bool(is_be)
    b.assert_bool(start)
    b.assert_bool(flag_add)
    b.assert_bool(flag_mul)
    b.assert_bool(flag_poly_eq)

    for k in range(5):
        b.assert_zero(ops.mul(
            ops.sub(comp[k], ops.add(ops.add(va_f_or_ef[k], vb[k]),
                                     comp_tail[k])), flag_add))

    va_times_vb = _quintic_mul_generic(va_f_or_ef, vb)
    for k in range(5):
        b.assert_zero(ops.mul(
            ops.sub(comp[k], ops.add(va_times_vb[k], comp_tail[k])), flag_mul))

    poly_eq_val = []
    for k in range(5):
        base = ops.sub(ops.sub(ops.double(va_times_vb[k]), va_f_or_ef[k]), vb[k])
        poly_eq_val.append(ops.add(base, 1) if k == 0 else base)
    comp_shift_or_one = []
    for k in range(5):
        v = ops.mul(comp_shift[k], not_start_shift)
        comp_shift_or_one.append(ops.add(v, start_shift) if k == 0 else v)
    poly_eq_result = _quintic_mul_generic(poly_eq_val, comp_shift_or_one)
    for k in range(5):
        b.assert_zero(ops.mul(ops.sub(comp[k], poly_eq_result[k]), flag_poly_eq))

    for k in range(5):
        b.assert_zero(ops.mul(ops.sub(comp[k], vres[k]), start))

    b.assert_zero(ops.mul(not_start_shift,
                          ops.sub(ops.sub(length, len_shift), 1)))
    b.assert_zero(ops.mul(not_start_shift, ops.sub(is_be, is_be_shift)))
    b.assert_zero(ops.mul(not_start_shift, ops.sub(flag_add, flag_add_shift)))
    b.assert_zero(ops.mul(not_start_shift, ops.sub(flag_mul, flag_mul_shift)))
    b.assert_zero(ops.mul(not_start_shift,
                          ops.sub(flag_poly_eq, flag_poly_eq_shift)))
    a_increment = ops.add(is_be, ops.mul(is_ee, DIMENSION))
    b.assert_zero(ops.mul(not_start_shift,
                          ops.sub(ops.sub(idx_a_shift, idx_a), a_increment)))
    b.assert_zero(ops.mul(not_start_shift,
                          ops.sub(ops.sub(idx_b_shift, idx_b), DIMENSION)))
    b.assert_zero(ops.mul(start_shift, ops.sub(length, 1)))


# ---------------------------------------------------------------------------
# Poseidon16 table
# ---------------------------------------------------------------------------

POSEIDON16_DEGREE = 10
POSEIDON16_N_SHIFT = 0
POSEIDON16_LOW_DEGREE = (3, 20)


def _mds_vec(state):
    k = sparse_constants()
    mds = k["mds"]
    return [ops.dot_const_row(state, mds[i]) for i in range(16)]


def _full_2_rounds_air(b, state, post_cols, rc1, rc2):
    for i in range(16):
        state[i] = ops.cube(ops.add(state[i], int(rc1[i])))
    state = _mds_vec(state)
    for i in range(16):
        state[i] = ops.cube(ops.add(state[i], int(rc2[i])))
    state = _mds_vec(state)
    for i in range(16):
        b.assert_eq(state[i], post_cols[i])
        state[i] = post_cols[i]
    return state


def eval_poseidon16_air(b, extra: ExtraDataForBuses):
    flat = b.flat()
    k = sparse_constants()

    flag_active = flat[T.P16_COL_FLAG]
    index_b = flat[T.P16_COL_INDEX_INPUT_RIGHT]
    index_res = flat[T.P16_COL_INDEX_INPUT_RES]
    flag_half = flat[T.P16_COL_FLAG_HALF_OUTPUT]
    flag_hard = flat[T.P16_COL_FLAG_HARDCODED_LEFT]
    offset_hard = flat[T.P16_COL_OFFSET_LEFT_HARDCODED]
    eff_left_first = flat[T.P16_COL_EFFECTIVE_INDEX_LEFT_FIRST]
    eff_left_second = flat[T.P16_COL_EFFECTIVE_INDEX_LEFT_SECOND]
    flag_permute = flat[T.P16_COL_FLAG_PERMUTE]
    inputs = [flat[T.P16_COL_INPUT_START + i] for i in range(16)]
    beginning = [[flat[T.P16_COL_BEGINNING_FULL + 16 * r + i] for i in range(16)]
                 for r in range(T.P16_HALF_INITIAL_FULL)]
    partial = [flat[T.P16_COL_PARTIAL + r] for r in range(T.P16_PARTIAL)]
    ending = [[flat[T.P16_COL_ENDING_FULL + 16 * r + i] for i in range(16)]
              for r in range(T.P16_HALF_FINAL_FULL - 1)]
    outputs_left = [flat[T.P16_COL_OUTPUT_LEFT + i] for i in range(8)]
    outputs_right = [flat[T.P16_COL_OUTPUT_RIGHT + i] for i in range(8)]

    # Bus (mod.rs:326-349)
    pre_data = ops.add(
        ops.add(1, ops.mul(flag_half, POSEIDON_HALF_OUTPUT_SHIFT)),
        ops.add(
            ops.add(ops.mul(flag_hard, POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT),
                    ops.mul(ops.mul(flag_hard, offset_hard),
                            POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT)),
            ops.mul(flag_permute, POSEIDON_PERMUTE_SHIFT)))
    one_minus_hard = ops.neg(ops.sub(flag_hard, 1))
    index_a = ops.sub(eff_left_second,
                      ops.mul(one_minus_hard, T.HALF_DIGEST_LEN))
    if getattr(b, "bus", True):
        b.assert_zero_ef(eval_virtual_bus_column(
            extra, flag_active, [pre_data, index_a, index_b, index_res]))
    else:
        b.declare_values([flag_active])
        b.declare_values([pre_data, index_a, index_b, index_res])

    b.assert_bool(flag_active)
    b.assert_bool(flag_half)
    b.assert_bool(flag_hard)
    b.assert_bool(flag_permute)
    b.assert_zero(ops.mul(flag_permute, ops.add(flag_half, flag_hard)))
    b.assert_zero(ops.mul(flag_hard, ops.sub(offset_hard, eff_left_first)))
    b.assert_zero(ops.mul(one_minus_hard, ops.sub(index_a, eff_left_first)))

    # permutation constraints (mod.rs:385-449)
    init_c = k["initial_constants"]
    state = list(inputs)
    for r in range(T.P16_HALF_INITIAL_FULL):
        state = _full_2_rounds_air(b, state, beginning[r],
                                   init_c[2 * r], init_c[2 * r + 1])

    def low_block(bb, st):
        frc = k["first_round_constants"]
        for i in range(16):
            st[i] = ops.add(st[i], int(frc[i]))
        m_i = k["m_i"]
        new_state = [ops.dot_const_row(st, m_i[i]) for i in range(16)]
        for i in range(16):
            st[i] = new_state[i]
        first_rows = k["first_rows"]
        v_vecs = k["v"]
        scalar_rc = k["scalar_round_constants"]
        for r in range(T.P16_PARTIAL):
            st[0] = ops.cube(st[0])
            bb.assert_eq_low(st[0], partial[r])
            st[0] = partial[r]
            if r < T.P16_PARTIAL - 1:
                st[0] = ops.add(st[0], int(scalar_rc[r]))
            old_s0 = st[0]
            new_s0 = ops.dot_const_row(st, first_rows[r])
            for i in range(1, 16):
                st[i] = ops.add(st[i], ops.mul(old_s0, int(v_vecs[r][i - 1])))
            st[0] = new_s0

    b.low_degree_block(state, low_block)

    fin_c = k["final_constants"]
    for r in range(T.P16_HALF_FINAL_FULL - 1):
        state = _full_2_rounds_air(b, state, ending[r],
                                   fin_c[2 * r], fin_c[2 * r + 1])

    last = T.P16_HALF_FINAL_FULL - 1
    for i in range(16):
        state[i] = ops.cube(ops.add(state[i], int(fin_c[2 * last][i])))
    state = _mds_vec(state)
    for i in range(16):
        state[i] = ops.cube(ops.add(state[i], int(fin_c[2 * last + 1][i])))
    state = _mds_vec(state)

    not_permute = ops.neg(ops.sub(flag_permute, 1))
    compression_last4 = ops.sub(not_permute, flag_half)
    for i in range(8):
        gate = not_permute if i < T.HALF_DIGEST_LEN else compression_last4
        b.assert_zero(ops.mul(
            gate, ops.sub(ops.add(state[i], inputs[i]), outputs_left[i])))
        b.assert_zero(ops.mul(flag_permute,
                              ops.sub(state[i], outputs_left[i])))
        b.assert_zero(ops.mul(flag_permute,
                              ops.sub(state[i + 8], outputs_right[i])))


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TableAir:
    name: str
    eval_fn: object
    degree: int
    n_columns: int
    n_shift: int
    n_constraints: int


TABLE_AIRS = {
    T.EXECUTION: TableAir(T.EXECUTION, eval_execution_air, EXECUTION_DEGREE,
                          20, EXECUTION_N_SHIFT, 13),
    T.EXTENSION_OP: TableAir(T.EXTENSION_OP, eval_extension_op_air,
                             EXTENSION_OP_DEGREE, 29, EXTENSION_OP_N_SHIFT, 34),
    T.POSEIDON16: TableAir(T.POSEIDON16, eval_poseidon16_air, POSEIDON16_DEGREE,
                           109, POSEIDON16_N_SHIFT, 100),
}


def max_air_constraints() -> int:
    return max(a.n_constraints for a in TABLE_AIRS.values())


def eval_table_air(table: str, flat, shift, alpha_powers,
                   extra: ExtraDataForBuses) -> np.ndarray:
    # prover path (uniform base or ext row batches with >1 row): fused
    # generated-C kernels (base + quintic variants)
    def _rows(c, nd):
        return (isinstance(c, np.ndarray) and c.ndim == nd
                and c.dtype == np.uint32 and c.shape[0] > 1)
    for nd in (1, 2):
        if (flat and all(_rows(c, nd) for c in flat)
                and all(_rows(c, nd) for c in shift)):
            from .native_eval import get_native_evaluator
            ev = get_native_evaluator(table)
            if ev is not None:
                return ev(flat, shift, alpha_powers, extra)
    from .builder import eval_air_at
    air = TABLE_AIRS[table]
    return eval_air_at(lambda b: air.eval_fn(b, extra), flat, shift,
                       alpha_powers, extra)
