"""The three committed tables: execution, poseidon16, extension_op.

Column layouts, memory-lookup/bus metadata, precompile execution (trace row
emission during the VM run), padding rows and post-run trace backfill —
mirroring crates/lean_vm/src/tables/*.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import np_field as nf
from ..field.constants import P
from .isa import (COL_AUX, COL_EXEC_NU_A, COL_EXEC_NU_B, COL_FLAG_A,
                  COL_FLAG_B, COL_FLAG_C_FP, COL_JUMP, COL_MEM_ADDRESS_A,
                  COL_MEM_ADDRESS_B, COL_MEM_ADDRESS_C, COL_OPERAND_A,
                  COL_OPERAND_B, COL_PC, DIGEST_LEN, DIMENSION,
                  EXT_OP_LEN_MULTIPLIER, N_TEMPORARY_EXEC_COLUMNS,
                  N_TOTAL_EXECUTION_COLUMNS, ExtensionOpArgs, Poseidon16Args,
                  POSEIDON_PRECOMPILE_DATA)
from .memory import RunnerError
from .poseidon_host import (get_poseidon_16_of_zero, poseidon16_compress,
                            poseidon16_permute)

HALF_DIGEST_LEN = DIGEST_LEN // 2

# ---------------------------------------------------------------------------
# Poseidon16 table layout (tables/poseidon_16/mod.rs:99-113,364-383)
# ---------------------------------------------------------------------------
P16_COL_FLAG = 0
P16_COL_INDEX_INPUT_RIGHT = 1
P16_COL_INDEX_INPUT_RES = 2
P16_COL_FLAG_HALF_OUTPUT = 3
P16_COL_FLAG_HARDCODED_LEFT = 4
P16_COL_OFFSET_LEFT_HARDCODED = 5
P16_COL_EFFECTIVE_INDEX_LEFT_FIRST = 6
P16_COL_EFFECTIVE_INDEX_LEFT_SECOND = 7
P16_COL_FLAG_PERMUTE = 8
P16_COL_INPUT_START = 9
P16_N_HEADER = 9
P16_HALF_INITIAL_FULL = 2
P16_PARTIAL = 20
P16_HALF_FINAL_FULL = 2
P16_COL_BEGINNING_FULL = P16_COL_INPUT_START + 16  # 25: 2 blocks of 16
P16_COL_PARTIAL = P16_COL_BEGINNING_FULL + 16 * P16_HALF_INITIAL_FULL  # 57
P16_COL_ENDING_FULL = P16_COL_PARTIAL + P16_PARTIAL  # 77: 1 block of 16
P16_COL_OUTPUT_LEFT = P16_COL_ENDING_FULL + 16 * (P16_HALF_FINAL_FULL - 1)  # 93
P16_COL_OUTPUT_RIGHT = P16_COL_OUTPUT_LEFT + 8  # 101
N_COLS_P16 = P16_COL_OUTPUT_RIGHT + 8  # 109
P16_COL_INDEX_INPUT_LEFT = N_COLS_P16  # virtual
P16_COL_PRECOMPILE_DATA = N_COLS_P16 + 1  # virtual
N_COLS_TOTAL_P16 = N_COLS_P16 + 2

# ---------------------------------------------------------------------------
# ExtensionOp table layout (tables/extension_op/air.rs:9-31)
# ---------------------------------------------------------------------------
EXT_COL_IS_BE = 0
EXT_COL_START = 1
EXT_COL_LEN = 2
EXT_COL_FLAG_ADD = 3
EXT_COL_FLAG_MUL = 4
EXT_COL_FLAG_POLY_EQ = 5
EXT_COL_IDX_A = 6
EXT_COL_IDX_B = 7
EXT_COL_COMP = 8  # 5 columns
EXT_COL_IDX_RES = 13
EXT_COL_VA = 14  # 5 columns
EXT_COL_VB = 19  # 5 columns
EXT_COL_VRES = 24  # 5 columns
N_COLS_EXT = 29
EXT_COL_ACTIVATION_FLAG = 29  # virtual
EXT_COL_AUX = 30  # virtual
N_COLS_TOTAL_EXT = 31

EXECUTION, EXTENSION_OP, POSEIDON16 = "execution", "extension_op", "poseidon16"
ALL_TABLES = [EXECUTION, EXTENSION_OP, POSEIDON16]  # table_enum order = index

# Protocol bounds: max rows per table (core/constants.rs:4-39). Together
# with MAX_LOG_MEMORY_SIZE these cap the logup numerator mass and the
# stacked commitment surface (see tests/test_soundness_bounds.py).
MAX_LOG_N_ROWS = {EXECUTION: 24, EXTENSION_OP: 21, POSEIDON16: 21}


@dataclass
class LookupIntoMemory:
    index: int
    values: list[int]


@dataclass
class Bus:
    direction: str  # "pull" | "push"
    selector: int
    data: list  # int column index or ("const", value)


class TableTrace:
    def __init__(self, n_columns: int):
        self.columns: list[list[int]] = [[] for _ in range(n_columns)]
        self.non_padded_n_rows = 0
        self.log_n_rows = 0


def new_traces() -> dict[str, TableTrace]:
    return {
        EXECUTION: TableTrace(N_TOTAL_EXECUTION_COLUMNS + N_TEMPORARY_EXEC_COLUMNS),
        EXTENSION_OP: TableTrace(N_COLS_TOTAL_EXT),
        POSEIDON16: TableTrace(N_COLS_TOTAL_P16),
    }


def table_n_columns(table: str) -> int:
    """Committed (AIR) column count."""
    return {EXECUTION: N_TOTAL_EXECUTION_COLUMNS, EXTENSION_OP: N_COLS_EXT,
            POSEIDON16: N_COLS_P16}[table]


def table_lookups(table: str) -> list[LookupIntoMemory]:
    if table == EXECUTION:
        from .isa import (COL_MEM_VALUE_A, COL_MEM_VALUE_B, COL_MEM_VALUE_C)
        return [LookupIntoMemory(COL_MEM_ADDRESS_A, [COL_MEM_VALUE_A]),
                LookupIntoMemory(COL_MEM_ADDRESS_B, [COL_MEM_VALUE_B]),
                LookupIntoMemory(COL_MEM_ADDRESS_C, [COL_MEM_VALUE_C])]
    if table == EXTENSION_OP:
        return [LookupIntoMemory(EXT_COL_IDX_A,
                                 list(range(EXT_COL_VA, EXT_COL_VA + DIMENSION))),
                LookupIntoMemory(EXT_COL_IDX_B,
                                 list(range(EXT_COL_VB, EXT_COL_VB + DIMENSION))),
                LookupIntoMemory(EXT_COL_IDX_RES,
                                 list(range(EXT_COL_VRES, EXT_COL_VRES + DIMENSION)))]
    return [
        LookupIntoMemory(P16_COL_EFFECTIVE_INDEX_LEFT_FIRST,
                         list(range(P16_COL_INPUT_START,
                                    P16_COL_INPUT_START + HALF_DIGEST_LEN))),
        LookupIntoMemory(P16_COL_EFFECTIVE_INDEX_LEFT_SECOND,
                         list(range(P16_COL_INPUT_START + HALF_DIGEST_LEN,
                                    P16_COL_INPUT_START + DIGEST_LEN))),
        LookupIntoMemory(P16_COL_INDEX_INPUT_RIGHT,
                         list(range(P16_COL_INPUT_START + DIGEST_LEN,
                                    P16_COL_INPUT_START + 2 * DIGEST_LEN))),
        LookupIntoMemory(P16_COL_INDEX_INPUT_RES,
                         list(range(P16_COL_OUTPUT_LEFT,
                                    P16_COL_OUTPUT_LEFT + 2 * DIGEST_LEN))),
    ]


def table_bus(table: str) -> Bus:
    from .isa import COL_EXEC_NU_C, COL_IS_PRECOMPILE, COL_PRECOMPILE_DATA
    if table == EXECUTION:
        return Bus("push", COL_IS_PRECOMPILE,
                   [COL_PRECOMPILE_DATA, COL_EXEC_NU_A, COL_EXEC_NU_B,
                    COL_EXEC_NU_C])
    if table == EXTENSION_OP:
        return Bus("pull", EXT_COL_ACTIVATION_FLAG,
                   [EXT_COL_AUX, EXT_COL_IDX_A, EXT_COL_IDX_B, EXT_COL_IDX_RES])
    return Bus("pull", P16_COL_FLAG,
               [P16_COL_PRECOMPILE_DATA, P16_COL_INDEX_INPUT_LEFT,
                P16_COL_INDEX_INPUT_RIGHT, P16_COL_INDEX_INPUT_RES])


# ---------------------------------------------------------------------------
# Precompile execution (pushes trace rows during the VM run)
# ---------------------------------------------------------------------------


def execute_poseidon16(arg_a: int, arg_b: int, index_res: int,
                       args: Poseidon16Args, memory, trace: TableTrace) -> None:
    """(tables/poseidon_16/mod.rs:207-291)"""
    assert not (args.permute and (args.half_output
                                  or args.hardcoded_offset_left is not None))
    flag_hardcoded = args.hardcoded_offset_left is not None
    left_first = (args.hardcoded_offset_left if flag_hardcoded else arg_a)
    left_second = arg_a if flag_hardcoded else arg_a + HALF_DIGEST_LEN

    inp = (memory.get_slice(left_first, HALF_DIGEST_LEN)
           + memory.get_slice(left_second, HALF_DIGEST_LEN)
           + memory.get_slice(arg_b, DIGEST_LEN))
    inp_arr = np.array(inp, np.uint32)

    if args.permute:
        memory.set_slice(index_res, poseidon16_permute(inp_arr).tolist())
    else:
        out = poseidon16_compress(inp_arr).tolist()
        if args.half_output:
            memory.set_slice(index_res, out[:HALF_DIGEST_LEN])
        else:
            memory.set_slice(index_res, out)

    c = trace.columns
    c[P16_COL_FLAG].append(1)
    c[P16_COL_INDEX_INPUT_RIGHT].append(arg_b)
    c[P16_COL_INDEX_INPUT_RES].append(index_res)
    c[P16_COL_FLAG_HALF_OUTPUT].append(int(args.half_output))
    c[P16_COL_FLAG_HARDCODED_LEFT].append(int(flag_hardcoded))
    c[P16_COL_OFFSET_LEFT_HARDCODED].append(args.hardcoded_offset_left or 0)
    c[P16_COL_EFFECTIVE_INDEX_LEFT_FIRST].append(left_first)
    c[P16_COL_EFFECTIVE_INDEX_LEFT_SECOND].append(left_second)
    c[P16_COL_FLAG_PERMUTE].append(int(args.permute))
    for i, v in enumerate(inp):
        c[P16_COL_INPUT_START + i].append(v)
    c[P16_COL_INDEX_INPUT_LEFT].append(arg_a)
    c[P16_COL_PRECOMPILE_DATA].append(args.precompile_data())
    # remaining permutation columns backfilled in fill_trace_poseidon_16


def _ef_get(memory, addr):
    return np.array(memory.get_ef(addr), np.uint32)


def _compute_elem(v_a, v_b, op):
    if op == "add":
        return nf.eadd(v_a, v_b)
    if op == "mul":
        return nf.emul(v_a, v_b)
    # poly_eq: 2ab - a - b + 1
    ab = nf.emul(v_a, v_b)
    r = nf.esub(nf.esub(nf.eadd(ab, ab), v_a), v_b)
    r = r.copy()
    r[0] = (int(r[0]) + 1) % P
    return r


def execute_extension_op(ptr_a: int, ptr_b: int, ptr_res: int,
                         args: ExtensionOpArgs, memory,
                         trace: TableTrace) -> None:
    """(tables/extension_op/exec.rs:94-191)"""
    size, op, is_be = args.size, args.op, args.is_be
    assert size >= 1

    if size == 1 and op != "poly_eq":
        _solve_unknowns(ptr_a, ptr_b, ptr_res, is_be, op, memory)

    a_stride = 1 if is_be else DIMENSION
    elems, v_bs, idx_as, idx_bs = [], [], [], []
    for i in range(size):
        addr_a = ptr_a + i * a_stride
        addr_b = ptr_b + i * DIMENSION
        if is_be:
            v_a = np.zeros(DIMENSION, np.uint32)
            v_a[0] = memory.get(addr_a)
        else:
            v_a = _ef_get(memory, addr_a)
        v_b = _ef_get(memory, addr_b)
        elems.append(_compute_elem(v_a, v_b, op))
        v_bs.append(v_b)
        idx_as.append(addr_a)
        idx_bs.append(addr_b)

    computations = [None] * size
    computations[size - 1] = elems[size - 1]
    for i in range(size - 2, -1, -1):
        if op == "poly_eq":
            computations[i] = nf.emul(elems[i], computations[i + 1])
        else:
            computations[i] = nf.eadd(elems[i], computations[i + 1])

    result = computations[0]
    memory.set_ef(ptr_res, result.tolist())

    mode_bits = args.flag_encoding()
    c = trace.columns
    for i in range(size):
        is_start = int(i == 0)
        current_len = size - i
        c[EXT_COL_IS_BE].append(int(is_be))
        c[EXT_COL_START].append(is_start)
        c[EXT_COL_FLAG_ADD].append(int(op == "add"))
        c[EXT_COL_FLAG_MUL].append(int(op == "mul"))
        c[EXT_COL_FLAG_POLY_EQ].append(int(op == "poly_eq"))
        c[EXT_COL_LEN].append(current_len)
        c[EXT_COL_IDX_A].append(idx_as[i])
        c[EXT_COL_IDX_B].append(idx_bs[i])
        c[EXT_COL_IDX_RES].append(ptr_res)
        for k in range(DIMENSION):
            c[EXT_COL_VA + k].append(0)  # backfilled from final memory
        for k in range(DIMENSION):
            c[EXT_COL_VB + k].append(int(v_bs[i][k]))
        for k in range(DIMENSION):
            c[EXT_COL_VRES + k].append(int(result[k]))
        for k in range(DIMENSION):
            c[EXT_COL_COMP + k].append(int(computations[i][k]))
        c[EXT_COL_ACTIVATION_FLAG].append(is_start)
        c[EXT_COL_AUX].append(mode_bits + EXT_OP_LEN_MULTIPLIER * current_len)


def _solve_unknowns(ptr_a, ptr_b, ptr_res, is_be, op, memory):
    """Single-element add/mul with an unknown operand (exec.rs:29-91)."""
    if is_be:
        a_scalar = memory.try_get(ptr_a)
        a = None if a_scalar is None else np.array(
            [a_scalar, 0, 0, 0, 0], np.uint32)
    else:
        vals = [memory.try_get(ptr_a + i) for i in range(DIMENSION)]
        a = None if any(v is None for v in vals) else np.array(vals, np.uint32)
    b_vals = [memory.try_get(ptr_b + i) for i in range(DIMENSION)]
    b = None if any(v is None for v in b_vals) else np.array(b_vals, np.uint32)
    c_vals = [memory.try_get(ptr_res + i) for i in range(DIMENSION)]
    cc = None if any(v is None for v in c_vals) else np.array(c_vals, np.uint32)

    eone = np.array([1, 0, 0, 0, 0], np.uint32)
    if op == "mul" and not is_be:
        if b is not None and np.array_equal(b, eone):
            memory.make_slices_equal_and_defined(ptr_a, ptr_res, DIMENSION)
            return
        if a is not None and np.array_equal(a, eone):
            memory.make_slices_equal_and_defined(ptr_b, ptr_res, DIMENSION)
            return

    if a is not None and b is not None and cc is not None:
        if not np.array_equal(_compute_elem(a, b, op), cc):
            raise RunnerError("invalid extension op")
    elif a is not None and b is not None:
        pass  # result unknown: computed normally afterwards
    elif a is None and b is not None and cc is not None:
        av = (nf.esub(cc, b) if op == "add"
              else nf.emul(cc, nf.einv(b)))
        if is_be:
            assert all(int(v) == 0 for v in av[1:]), "solved A not in base field"
            memory.set(ptr_a, int(av[0]))
        else:
            memory.set_ef(ptr_a, av.tolist())
    elif b is None and a is not None and cc is not None:
        bv = (nf.esub(cc, a) if op == "add"
              else nf.emul(cc, nf.einv(a)))
        memory.set_ef(ptr_b, bv.tolist())
    else:
        raise RunnerError("invalid extension op (too many unknowns)")


# ---------------------------------------------------------------------------
# Padding rows (per-table)
# ---------------------------------------------------------------------------


def padding_row(table: str, zero_vec_ptr: int, null_hash_ptr: int,
                ending_pc: int) -> list[int]:
    if table == EXECUTION:
        row = [0] * (N_TOTAL_EXECUTION_COLUMNS + N_TEMPORARY_EXEC_COLUMNS)
        row[COL_PC] = ending_pc
        row[COL_JUMP] = 1
        row[COL_FLAG_A] = 1
        row[COL_OPERAND_A] = 1
        row[COL_FLAG_B] = 1
        row[COL_OPERAND_B] = ending_pc
        row[COL_FLAG_C_FP] = 1
        row[COL_EXEC_NU_A] = 1
        row[COL_EXEC_NU_B] = ending_pc
        row[COL_MEM_ADDRESS_A] = zero_vec_ptr
        row[COL_MEM_ADDRESS_B] = zero_vec_ptr
        row[COL_MEM_ADDRESS_C] = zero_vec_ptr
        return row
    if table == EXTENSION_OP:
        row = [0] * N_COLS_TOTAL_EXT
        row[EXT_COL_START] = 1
        row[EXT_COL_LEN] = 1
        row[EXT_COL_AUX] = EXT_OP_LEN_MULTIPLIER
        row[EXT_COL_IDX_A] = zero_vec_ptr
        row[EXT_COL_IDX_B] = zero_vec_ptr
        row[EXT_COL_IDX_RES] = zero_vec_ptr
        return row
    # poseidon16 (mod.rs:182-205): inactive row hashing zeros into null hash
    from ..poseidon.sparse import generate_trace_rows
    row = [0] * N_COLS_TOTAL_P16
    row[P16_COL_INDEX_INPUT_RIGHT] = zero_vec_ptr
    row[P16_COL_INDEX_INPUT_RES] = null_hash_ptr
    row[P16_COL_EFFECTIVE_INDEX_LEFT_FIRST] = zero_vec_ptr
    row[P16_COL_EFFECTIVE_INDEX_LEFT_SECOND] = zero_vec_ptr + HALF_DIGEST_LEN
    row[P16_COL_INDEX_INPUT_LEFT] = zero_vec_ptr
    row[P16_COL_PRECOMPILE_DATA] = POSEIDON_PRECOMPILE_DATA
    out = generate_trace_rows(np.zeros((1, 16), np.uint32),
                              np.zeros(1, np.uint32))
    _write_perm_outputs_to_row(row, out, 0)
    return row


def _write_perm_outputs_to_row(row: list[int], out: dict, i: int) -> None:
    for r in range(P16_HALF_INITIAL_FULL):
        for j in range(16):
            row[P16_COL_BEGINNING_FULL + 16 * r + j] = int(
                out["beginning_full_rounds"][r][i][j])
    for r in range(P16_PARTIAL):
        row[P16_COL_PARTIAL + r] = int(out["partial_rounds"][r][i])
    for r in range(P16_HALF_FINAL_FULL - 1):
        for j in range(16):
            row[P16_COL_ENDING_FULL + 16 * r + j] = int(
                out["ending_full_rounds"][r][i][j])
    for j in range(8):
        row[P16_COL_OUTPUT_LEFT + j] = int(out["outputs_left"][i][j])
        row[P16_COL_OUTPUT_RIGHT + j] = int(out["outputs_right"][i][j])


# ---------------------------------------------------------------------------
# Post-run trace backfill
# ---------------------------------------------------------------------------


def fill_trace_poseidon_16(trace: TableTrace) -> None:
    """Vectorized permutation replay (trace_gen.rs:10-42)."""
    from ..poseidon.sparse import generate_trace_rows
    n = max(len(col) for col in trace.columns)
    for col in trace.columns:
        if len(col) != n:
            col.extend([0] * (n - len(col)))
    if n == 0:
        return
    inputs = np.array([trace.columns[P16_COL_INPUT_START + j] for j in range(16)],
                      np.uint32).T
    flag_permute = np.array(trace.columns[P16_COL_FLAG_PERMUTE], np.uint32)
    out = generate_trace_rows(inputs, flag_permute)
    for r in range(P16_HALF_INITIAL_FULL):
        for j in range(16):
            trace.columns[P16_COL_BEGINNING_FULL + 16 * r + j] = \
                out["beginning_full_rounds"][r][:, j].tolist()
    for r in range(P16_PARTIAL):
        trace.columns[P16_COL_PARTIAL + r] = out["partial_rounds"][r].tolist()
    for r in range(P16_HALF_FINAL_FULL - 1):
        for j in range(16):
            trace.columns[P16_COL_ENDING_FULL + 16 * r + j] = \
                out["ending_full_rounds"][r][:, j].tolist()
    for j in range(8):
        trace.columns[P16_COL_OUTPUT_LEFT + j] = out["outputs_left"][:, j].tolist()
        trace.columns[P16_COL_OUTPUT_RIGHT + j] = out["outputs_right"][:, j].tolist()


def fill_trace_extension_op(trace: TableTrace, memory_padded: np.ndarray) -> None:
    """Backfill VA columns from final memory (exec.rs:195-203)."""
    idx_a = trace.columns[EXT_COL_IDX_A]
    for i, addr in enumerate(idx_a):
        for k in range(DIMENSION):
            trace.columns[EXT_COL_VA + k][i] = int(memory_padded[addr + k])
