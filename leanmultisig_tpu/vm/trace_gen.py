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
from .memory import RunnerError
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
                        result: ExecutionResult,
                        force_log_rows: dict | None = None) -> ExecutionTrace:
    assert len(result.pcs) == len(result.fps)
    n_cycles = len(result.pcs)
    from .native_runner import NativeMemory
    native_mem = isinstance(result.memory, NativeMemory)

    from .isa import N_TEMPORARY_EXEC_COLUMNS, N_TOTAL_EXECUTION_COLUMNS
    n_cols = N_TOTAL_EXECUTION_COLUMNS + N_TEMPORARY_EXEC_COLUMNS
    iml = bytecode.instructions_multilinear
    cols_pot = 16

    # vectorized row expansion (trace_gen.rs:27 rayon loop analog)
    pcs = np.asarray(result.pcs, np.int64)
    fps = np.asarray(result.fps, np.int64)
    instr = iml.reshape(-1, cols_pot)[pcs].astype(np.int64)  # (n, 16)

    if native_mem:
        mem_np = result.memory.vals.astype(np.int64)
    else:
        mem_np = np.array(
            [v if v is not None else 0 for v in result.memory.cells],
            np.int64)
    mem_len = len(mem_np)

    def gather(addr):
        ok = addr < mem_len
        return np.where(ok, mem_np[np.minimum(addr, mem_len - 1)], 0)

    fa = instr[:, instr_idx(COL_FLAG_A)]
    fb = instr[:, instr_idx(COL_FLAG_B)]
    fc = instr[:, instr_idx(COL_FLAG_C)]
    fcfp = instr[:, instr_idx(COL_FLAG_C_FP)]
    fabfp = instr[:, instr_idx(COL_FLAG_AB_FP)]
    aux = instr[:, instr_idx(COL_AUX)]
    opa = instr[:, instr_idx(COL_OPERAND_A)]
    opb = instr[:, instr_idx(COL_OPERAND_B)]
    opc = instr[:, instr_idx(COL_OPERAND_C)]

    addr_a = np.where((fa == 0) & (fabfp == 0), (fps + opa) % P, 0)
    value_a = gather(addr_a)
    addr_b = np.where((fb == 0) & (fabfp == 0), (fps + opb) % P,
                      np.where(aux == 2, (value_a + opb) % P, 0))
    value_b = gather(addr_b)
    addr_c = np.where((fc == 0) & (fcfp == 0), (fps + opc) % P, 0)
    value_c = gather(addr_c)

    nu_a = (fa * opa + (1 - fa - fabfp) * value_a + fabfp * (fps + opa)) % P
    nu_b = (fb * opb + (1 - fb - fabfp) * value_b + fabfp * (fps + opb)) % P
    nu_c = (fc * opc + (1 - fc - fcfp) * value_c + fcfp * (fps + opc)) % P

    is_pre = np.zeros(len(bytecode.code), np.int64)
    for i, e in enumerate(bytecode.code):
        if isinstance(e.instruction, Precompile):
            is_pre[i] = 1

    main = [[0] * n_cycles for _ in range(n_cols)]
    for j in range(N_INSTRUCTION_COLUMNS):
        main[j + N_RUNTIME_COLUMNS] = instr[:, j].tolist()
    main[COL_IS_PRECOMPILE] = is_pre[pcs].tolist()
    main[COL_EXEC_NU_A] = nu_a.tolist()
    main[COL_EXEC_NU_B] = nu_b.tolist()
    main[COL_EXEC_NU_C] = nu_c.tolist()
    main[COL_MEM_VALUE_A] = value_a.tolist()
    main[COL_MEM_VALUE_B] = value_b.tolist()
    main[COL_MEM_VALUE_C] = value_c.tolist()
    main[COL_PC] = pcs.tolist()
    main[COL_FP] = fps.tolist()
    main[COL_MEM_ADDRESS_A] = addr_a.tolist()
    main[COL_MEM_ADDRESS_B] = addr_b.tolist()
    main[COL_MEM_ADDRESS_C] = addr_c.tolist()

    padding_zero_vec_ptr = mem_len
    null_hash_ptr = mem_len + 16
    base_len = mem_len + 16 + 8
    target = max(base_len, n_cycles, 1 << MIN_LOG_N_ROWS_PER_TABLE)
    padded_len = 1 << (target - 1).bit_length()
    memory_np = np.zeros(padded_len, np.uint32)
    memory_np[:mem_len] = mem_np
    memory_np[null_hash_ptr:null_hash_ptr + 8] = get_poseidon_16_of_zero()

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
                   bytecode.ending_pc,
                   (force_log_rows or {}).get(table))

    return ExecutionTrace(traces, result.public_memory_size, memory_np,
                          result.metadata)


def _pad_table(table: str, trace: TableTrace, zero_vec_ptr: int,
               null_hash_ptr: int, ending_pc: int,
               force_log_rows: int | None = None) -> None:
    """Pad each table to 2^ceil(log2(h+1)) rows, min 2^8
    (lean_prover/src/trace_gen.rs:170-193). `force_log_rows` pads
    further to a fixed height (uniform-shape recursion proofs)."""
    h = len(trace.columns[0])
    for i, col in enumerate(trace.columns):
        assert len(col) == h, (table, i)
    trace.non_padded_n_rows = h
    trace.log_n_rows = max(h.bit_length(), MIN_LOG_N_ROWS_PER_TABLE)
    if force_log_rows is not None:
        assert force_log_rows >= trace.log_n_rows,             (table, force_log_rows, trace.log_n_rows)
        trace.log_n_rows = force_log_rows
    from .tables import MAX_LOG_N_ROWS
    if trace.log_n_rows > MAX_LOG_N_ROWS[table]:
        raise RunnerError(
            f"{table} table overflow: 2^{trace.log_n_rows} rows exceeds "
            f"the protocol bound 2^{MAX_LOG_N_ROWS[table]} "
            f"(core/constants.rs:4-39)")
    n_rows = 1 << trace.log_n_rows
    pad = padding_row(table, zero_vec_ptr, null_hash_ptr, ending_pc)
    for i, col in enumerate(trace.columns):
        col.extend([pad[i]] * (n_rows - len(col)))
