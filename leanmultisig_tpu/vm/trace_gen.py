"""Execution result -> padded column-major traces + padded memory.

Mirrors crates/lean_prover/src/trace_gen.rs:14-193.
"""

from __future__ import annotations

import numpy as np

from ..field.constants import P
from .isa import (Bytecode, COL_AUX, COL_EXEC_NU_A, COL_EXEC_NU_B,
                  COL_EXEC_NU_C, COL_FLAG_A, COL_FLAG_AB_FP, COL_FLAG_B,
                  COL_FLAG_C, COL_FLAG_C_FP, COL_FP, COL_IS_PRECOMPILE,
                  COL_MEM_ADDRESS_A, COL_MEM_ADDRESS_B, COL_MEM_ADDRESS_C,
                  COL_MEM_VALUE_A, COL_MEM_VALUE_B, COL_MEM_VALUE_C,
                  COL_OPERAND_A, COL_OPERAND_B, COL_OPERAND_C, COL_PC,
                  MIN_LOG_N_ROWS_PER_TABLE, N_INSTRUCTION_COLUMNS,
                  N_RUNTIME_COLUMNS, Precompile, instr_idx)
from .poseidon_host import get_poseidon_16_of_zero
from .runner import ExecutionResult
from .tables import (ALL_TABLES, EXECUTION, EXTENSION_OP, HALF_DIGEST_LEN,
                     P16_COL_FLAG_HALF_OUTPUT, P16_COL_FLAG_PERMUTE,
                     P16_COL_INDEX_INPUT_RES, P16_COL_OUTPUT_LEFT, POSEIDON16,
                     TableTrace, fill_trace_extension_op,
                     fill_trace_poseidon_16, padding_row)


class ExecutionTrace:
    def __init__(self, traces, public_memory_size, memory, metadata):
        self.traces = traces  # dict[str, TableTrace]
        self.public_memory_size = public_memory_size
        self.memory = memory  # np.uint32 (power-of-two length)
        self.metadata = metadata


def get_execution_trace(bytecode: Bytecode,
                        result: ExecutionResult) -> ExecutionTrace:
    assert len(result.pcs) == len(result.fps)
    n_cycles = len(result.pcs)
    memory_cells = result.memory.cells

    def mem_at(addr: int) -> int:
        if 0 <= addr < len(memory_cells) and memory_cells[addr] is not None:
            return memory_cells[addr]
        return 0

    from .isa import N_TEMPORARY_EXEC_COLUMNS, N_TOTAL_EXECUTION_COLUMNS
    n_cols = N_TOTAL_EXECUTION_COLUMNS + N_TEMPORARY_EXEC_COLUMNS
    main = [[0] * n_cycles for _ in range(n_cols)]
    iml = bytecode.instructions_multilinear
    cols_pot = 16

    for row, (pc, fp) in enumerate(zip(result.pcs, result.fps)):
        fr = iml[pc * cols_pot:pc * cols_pot + N_INSTRUCTION_COLUMNS]
        flag_a = int(fr[instr_idx(COL_FLAG_A)])
        flag_b = int(fr[instr_idx(COL_FLAG_B)])
        flag_c = int(fr[instr_idx(COL_FLAG_C)])
        flag_c_fp = int(fr[instr_idx(COL_FLAG_C_FP)])
        flag_ab_fp = int(fr[instr_idx(COL_FLAG_AB_FP)])
        aux = int(fr[instr_idx(COL_AUX)])
        is_deref = aux == 2
        op_a = int(fr[instr_idx(COL_OPERAND_A)])
        op_b = int(fr[instr_idx(COL_OPERAND_B)])
        op_c = int(fr[instr_idx(COL_OPERAND_C)])

        addr_a = (fp + op_a) % P if (flag_a == 0 and flag_ab_fp == 0) else 0
        value_a = mem_at(addr_a)
        if flag_b == 0 and flag_ab_fp == 0:
            addr_b = (fp + op_b) % P
        elif is_deref:
            addr_b = (value_a + op_b) % P
        else:
            addr_b = 0
        value_b = mem_at(addr_b)
        addr_c = (fp + op_c) % P if (flag_c == 0 and flag_c_fp == 0) else 0
        value_c = mem_at(addr_c)

        for j in range(N_INSTRUCTION_COLUMNS):
            main[j + N_RUNTIME_COLUMNS][row] = int(fr[j])

        nu_a = (flag_a * op_a + (1 - flag_a - flag_ab_fp) * value_a
                + flag_ab_fp * (fp + op_a)) % P
        nu_b = (flag_b * op_b + (1 - flag_b - flag_ab_fp) * value_b
                + flag_ab_fp * (fp + op_b)) % P
        nu_c = (flag_c * op_c + (1 - flag_c - flag_c_fp) * value_c
                + flag_c_fp * (fp + op_c)) % P

        if isinstance(bytecode.code[pc].instruction, Precompile):
            main[COL_IS_PRECOMPILE][row] = 1
        main[COL_EXEC_NU_A][row] = nu_a
        main[COL_EXEC_NU_B][row] = nu_b
        main[COL_EXEC_NU_C][row] = nu_c
        main[COL_MEM_VALUE_A][row] = value_a
        main[COL_MEM_VALUE_B][row] = value_b
        main[COL_MEM_VALUE_C][row] = value_c
        main[COL_PC][row] = pc
        main[COL_FP][row] = fp
        main[COL_MEM_ADDRESS_A][row] = addr_a
        main[COL_MEM_ADDRESS_B][row] = addr_b
        main[COL_MEM_ADDRESS_C][row] = addr_c

    memory_padded = [v if v is not None else 0 for v in memory_cells]
    padding_zero_vec_ptr = len(memory_padded)
    memory_padded.extend([0] * 16)
    null_hash_ptr = len(memory_padded)
    memory_padded.extend(int(v) for v in get_poseidon_16_of_zero())

    target = max(len(memory_padded), n_cycles, 1 << MIN_LOG_N_ROWS_PER_TABLE)
    padded_len = 1 << (target - 1).bit_length()
    memory_padded.extend([0] * (padded_len - len(memory_padded)))
    memory_np = np.array(memory_padded, np.uint32)

    traces = result.traces
    fill_trace_poseidon_16(traces[POSEIDON16])

    # Override unconstrained poseidon output columns with memory values so
    # the res-lookup matches (lean_prover/src/trace_gen.rs:111-139).
    ptrace = traces[POSEIDON16]
    n_pose = len(ptrace.columns[0])
    for i in range(n_pose):
        if ptrace.columns[P16_COL_FLAG_PERMUTE][i] == 0:
            base = ptrace.columns[P16_COL_INDEX_INPUT_RES][i]
            if ptrace.columns[P16_COL_FLAG_HALF_OUTPUT][i] == 1:
                for j in range(HALF_DIGEST_LEN):
                    ptrace.columns[P16_COL_OUTPUT_LEFT + HALF_DIGEST_LEN + j][i] = \
                        int(memory_np[base + HALF_DIGEST_LEN + j])
            for j in range(8):
                ptrace.columns[P16_COL_OUTPUT_LEFT + 8 + j][i] = \
                    int(memory_np[base + 8 + j])

    fill_trace_extension_op(traces[EXTENSION_OP], memory_np)

    exec_trace = TableTrace(n_cols)
    exec_trace.columns = main
    exec_trace.non_padded_n_rows = n_cycles
    traces[EXECUTION] = exec_trace

    for table in ALL_TABLES:
        _pad_table(table, traces[table], padding_zero_vec_ptr, null_hash_ptr,
                   bytecode.ending_pc)

    return ExecutionTrace(traces, result.public_memory_size, memory_np,
                          result.metadata)


def _pad_table(table: str, trace: TableTrace, zero_vec_ptr: int,
               null_hash_ptr: int, ending_pc: int) -> None:
    """Pad each table to 2^ceil(log2(h+1)) rows, min 2^8
    (lean_prover/src/trace_gen.rs:170-193)."""
    h = len(trace.columns[0])
    for i, col in enumerate(trace.columns):
        assert len(col) == h, (table, i)
    trace.non_padded_n_rows = h
    trace.log_n_rows = max(h.bit_length(), MIN_LOG_N_ROWS_PER_TABLE)
    n_rows = 1 << trace.log_n_rows
    pad = padding_row(table, zero_vec_ptr, null_hash_ptr, ending_pc)
    for i, col in enumerate(trace.columns):
        col.extend([pad[i]] * (n_rows - len(col)))
