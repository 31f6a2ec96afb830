"""Generic Logup: one fractional sum over all memory/bytecode/bus interactions.

Mirrors sub_protocols/src/logup.rs: sections [memory | bytecode(+pad) |
per-table: (bytecode-lookup for execution) bus, memory-lookups] each
alpha-fingerprinted with domain separation {0,1,2}; proven with the
quotient GKR; per-table column evaluations opened at the GKR point suffix.

Arrays are natural-order and fully materialized (the reference's
chunk-bit-reversal + symbolic padding are CPU-SIMD optimizations with
identical transcripts).
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from ..field.constants import P
from ..poly import np_poly as pp
from ..vm import tables as T
from ..vm.isa import (COL_PC, LOGUP_BYTECODE_DOMAINSEP, LOGUP_MEMORY_DOMAINSEP,
                      LOGUP_PRECOMPILE_DOMAINSEP, N_INSTRUCTION_COLUMNS,
                      N_RUNTIME_COLUMNS)
from .gkr import prove_gkr_quotient, verify_gkr_quotient

EXT_DIM = 5
BYTECODE_STRIDE = 16  # N_INSTRUCTION_COLUMNS.next_power_of_two()


def max_bus_width_including_domainsep() -> int:
    return 1 + max(4, N_INSTRUCTION_COLUMNS)  # 13 (tables/mod.rs:117-119)


def sort_tables_by_height(table_log_n_rows: dict) -> list:
    """Stable sort by height desc, ties in ALL_TABLES order."""
    return sorted(((t, table_log_n_rows[t]) for t in T.ALL_TABLES
                   if t in table_log_n_rows), key=lambda kv: -kv[1])


def finger_print_scalar(domainsep: int, data, alphas_eq: np.ndarray):
    """Σ alphas_eq[i]·data[i] + alphas_eq[-1]·domainsep (EF data)."""
    acc = pp.EZERO.copy()
    for i, d in enumerate(data):
        d = np.asarray(d, np.uint32)
        if d.ndim == 0:
            acc = nf.eadd(acc, nf.escalar_mul(alphas_eq[i], d))
        else:
            acc = nf.eadd(acc, nf.emul(alphas_eq[i], d))
    return nf.eadd(acc, nf.escalar_mul(alphas_eq[-1], np.uint32(domainsep)))


def _finger_print_rows(domainsep: int, base_cols: list, alphas_eq: np.ndarray
                       ) -> np.ndarray:
    """Vectorized fingerprint over rows: base_cols are (M,) uint32."""
    m = base_cols[0].shape[0]
    acc = np.zeros((m, EXT_DIM), np.uint32)
    for i, col in enumerate(base_cols):
        acc = nf.eadd(acc, nf.escalar_mul(
            np.broadcast_to(alphas_eq[i], (m, EXT_DIM)), col))
    domsep_term = nf.escalar_mul(alphas_eq[-1], np.uint32(domainsep))
    return nf.eadd(acc, np.broadcast_to(domsep_term, (m, EXT_DIM)))


def compute_total_active_len(log_memory: int, log_bytecode: int,
                             tables_sorted: list) -> int:
    """(logup.rs:500-518)"""
    max_table_height = 1 << tables_sorted[0][1]
    log_n_cycles = next(h for t, h in tables_sorted if t == T.EXECUTION)
    total = (1 << log_memory) + max(1 << log_bytecode, max_table_height) \
        + (1 << log_n_cycles)
    for table, log_n_rows in tables_sorted:
        num_cols = sum(len(lk.values) for lk in T.table_lookups(table)) + 1
        total += num_cols << log_n_rows
    return total


def prove_generic_logup(prover_state, c: np.ndarray, alphas_eq: np.ndarray,
                        memory: np.ndarray, memory_acc: np.ndarray,
                        bytecode_multilinear: np.ndarray,
                        bytecode_acc: np.ndarray, traces: dict) -> dict:
    """(logup.rs:27-323). traces: table -> TableTrace with numpy columns
    accessible via np.asarray."""
    n_mem = memory.shape[0]
    assert n_mem == memory_acc.shape[0]
    log_memory = n_mem.bit_length() - 1
    log_bytecode = (bytecode_multilinear.shape[0] // BYTECODE_STRIDE
                    ).bit_length() - 1
    table_log_n_rows = {t: traces[t].log_n_rows for t in traces}
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    max_table_height = 1 << tables_sorted[0][1]

    total_active = compute_total_active_len(log_memory, log_bytecode,
                                            tables_sorted)
    total_gkr_n_vars = (total_active - 1).bit_length()
    total_len = 1 << total_gkr_n_vars

    nums = np.zeros(total_len, np.uint32)
    dens = np.zeros((total_len, EXT_DIM), np.uint32)
    dens[:, 0] = 1  # padding denominators

    def c_minus(fp_rows):
        return nf.esub(np.broadcast_to(c, fp_rows.shape), fp_rows)

    def c_plus(fp_rows):
        return nf.eadd(np.broadcast_to(c, fp_rows.shape), fp_rows)

    offset = 0
    # --- memory section ---
    nums[offset:offset + n_mem] = nf.neg(memory_acc)
    idx = np.arange(n_mem, dtype=np.uint32)
    dens[offset:offset + n_mem] = c_minus(_finger_print_rows(
        LOGUP_MEMORY_DOMAINSEP, [memory, idx], alphas_eq))
    offset += n_mem

    # --- bytecode section ---
    n_bc = 1 << log_bytecode
    assert bytecode_acc.shape[0] == n_bc
    nums[offset:offset + n_bc] = nf.neg(bytecode_acc)
    bc_cols = [bytecode_multilinear[k::BYTECODE_STRIDE][:n_bc]
               for k in range(N_INSTRUCTION_COLUMNS)]
    bc_cols.append(np.arange(n_bc, dtype=np.uint32))
    dens[offset:offset + n_bc] = c_minus(_finger_print_rows(
        LOGUP_BYTECODE_DOMAINSEP, bc_cols, alphas_eq))
    offset += max(max_table_height, n_bc)

    # --- per-table sections ---
    for table, log_n_rows in tables_sorted:
        trace = traces[table]
        h = 1 << log_n_rows
        cols = [np.asarray(col, np.uint32) for col in trace.columns]

        if table == T.EXECUTION:
            nums[offset:offset + h] = 1
            data = [cols[N_RUNTIME_COLUMNS + k]
                    for k in range(N_INSTRUCTION_COLUMNS)] + [cols[COL_PC]]
            dens[offset:offset + h] = c_minus(_finger_print_rows(
                LOGUP_BYTECODE_DOMAINSEP, data, alphas_eq))
            offset += h

        bus = T.table_bus(table)
        selector = cols[bus.selector]
        nums[offset:offset + h] = (nf.neg(selector) if bus.direction == "pull"
                                   else selector)
        bus_data = [cols[j] for j in bus.data]
        dens[offset:offset + h] = c_plus(_finger_print_rows(
            LOGUP_PRECOMPILE_DOMAINSEP, bus_data, alphas_eq))
        offset += h

        for lookup in T.table_lookups(table):
            index_col = cols[lookup.index]
            for i, vcol_idx in enumerate(lookup.values):
                nums[offset:offset + h] = 1
                dens[offset:offset + h] = c_minus(_finger_print_rows(
                    LOGUP_MEMORY_DOMAINSEP,
                    [cols[vcol_idx], nf.add(index_col, np.uint32(i))],
                    alphas_eq))
                offset += h

    assert offset == total_active

    quotient, gkr_point = prove_gkr_quotient(prover_state, nums, dens)
    assert not quotient.any(), "logup sum must be zero"

    # --- openings at the GKR point suffixes (logup.rs:223-308) ---
    mem_point = gkr_point[-log_memory:]
    value_memory_acc = pp.eval_mle(memory_acc, mem_point)
    prover_state.add_extension_scalar(value_memory_acc)
    value_memory = pp.eval_mle(memory, mem_point)
    prover_state.add_extension_scalar(value_memory)

    bc_point = gkr_point[-log_bytecode:]
    value_bytecode_acc = pp.eval_mle(bytecode_acc, bc_point)
    prover_state.add_extension_scalar(value_bytecode_acc)

    bus_numerators_values = {}
    bus_denominators_values = {}
    columns_values = {}
    for table, log_n_rows in tables_sorted:
        trace = traces[table]
        cols = [np.asarray(col, np.uint32) for col in trace.columns]
        inner_point = gkr_point[-log_n_rows:]
        table_values = {}

        if table == T.EXECUTION:
            eval_pc = pp.eval_mle(cols[COL_PC], inner_point)
            prover_state.add_extension_scalar(eval_pc)
            table_values[COL_PC] = eval_pc
            instr_evals = [pp.eval_mle(cols[N_RUNTIME_COLUMNS + k], inner_point)
                           for k in range(N_INSTRUCTION_COLUMNS)]
            prover_state.add_extension_scalars(np.stack(instr_evals))
            for k, ev in enumerate(instr_evals):
                table_values[N_RUNTIME_COLUMNS + k] = ev

        bus = T.table_bus(table)
        sign = (P - 1) if bus.direction == "pull" else 1
        eval_sel = nf.escalar_mul(pp.eval_mle(cols[bus.selector], inner_point),
                                  np.uint32(sign))
        prover_state.add_extension_scalar(eval_sel)
        bus_data_evals = [pp.eval_mle(cols[j], inner_point) for j in bus.data]
        eval_data = nf.eadd(c, finger_print_scalar(
            LOGUP_PRECOMPILE_DOMAINSEP, bus_data_evals, alphas_eq))
        prover_state.add_extension_scalar(eval_data)
        bus_numerators_values[table] = eval_sel
        bus_denominators_values[table] = eval_data

        for lookup in T.table_lookups(table):
            index_eval = pp.eval_mle(cols[lookup.index], inner_point)
            prover_state.add_extension_scalar(index_eval)
            table_values[lookup.index] = index_eval
            for vcol_idx in lookup.values:
                value_eval = pp.eval_mle(cols[vcol_idx], inner_point)
                prover_state.add_extension_scalar(value_eval)
                table_values[vcol_idx] = value_eval

        columns_values[table] = table_values

    return {
        "memory_and_acc_point": mem_point,
        "value_memory": value_memory,
        "value_memory_acc": value_memory_acc,
        "bytecode_and_acc_point": bc_point,
        "value_bytecode_acc": value_bytecode_acc,
        "bus_numerators_values": bus_numerators_values,
        "bus_denominators_values": bus_denominators_values,
        "gkr_point": gkr_point,
        "columns_values": columns_values,
        "total_gkr_n_vars": total_gkr_n_vars,
        "bytecode_evaluation": None,
    }


def verify_generic_logup(verifier_state, c, alphas, alphas_eq, log_memory: int,
                         bytecode_multilinear: np.ndarray,
                         table_log_n_rows: dict) -> dict:
    """(logup.rs:326-493)"""
    from ..fs.verifier import ProofError

    tables_sorted = sort_tables_by_height(table_log_n_rows)
    log_bytecode = (bytecode_multilinear.shape[0] // BYTECODE_STRIDE
                    ).bit_length() - 1
    total_gkr_n_vars = (compute_total_active_len(
        log_memory, log_bytecode, tables_sorted) - 1).bit_length()

    quotient, point_gkr, numerators_value, denominators_value = \
        verify_gkr_quotient(verifier_state, total_gkr_n_vars)
    if quotient.any():
        raise ProofError("logup quotient != 0")

    retrieved_num = pp.EZERO.copy()
    retrieved_den = pp.EZERO.copy()

    def pref_at(offset: int, log_height: int):
        n_missing = total_gkr_n_vars - log_height
        bits = pp.to_big_endian_in_field(offset >> log_height, n_missing)
        return pp.eq_poly_outside(bits, point_gkr[:n_missing])

    mem_point = point_gkr[-log_memory:]
    pref = pref_at(0, log_memory)
    value_memory_acc = verifier_state.next_extension_scalar()
    retrieved_num = nf.esub(retrieved_num, nf.emul(pref, value_memory_acc))
    value_memory = verifier_state.next_extension_scalar()
    value_index = _mle_of_01234567_etc(mem_point)
    fp = finger_print_scalar(LOGUP_MEMORY_DOMAINSEP,
                             [value_memory, value_index], alphas_eq)
    retrieved_den = nf.eadd(retrieved_den, nf.emul(pref, nf.esub(c, fp)))
    offset = 1 << log_memory

    log_bytecode_padded = max(log_bytecode, tables_sorted[0][1])
    bc_point = point_gkr[-log_bytecode:]
    pref = pref_at(offset, log_bytecode)
    pref_padded = pref_at(offset, log_bytecode_padded)
    value_bytecode_acc = verifier_state.next_extension_scalar()
    retrieved_num = nf.esub(retrieved_num, nf.emul(pref, value_bytecode_acc))

    # bytecode denominator: direct MLE evaluation (logup.rs:383-397)
    bytecode_index_value = _mle_of_01234567_etc(bc_point)
    log_instr = (N_INSTRUCTION_COLUMNS - 1).bit_length()  # 4
    bytecode_point = np.concatenate([bc_point, alphas[-log_instr:]], axis=0)
    bytecode_value = pp.eval_mle(bytecode_multilinear, bytecode_point)
    corr = pp.EONE.copy()
    for a in alphas[:-log_instr]:
        corr = nf.emul(corr, nf.esub(pp.EONE, a))
    bytecode_value_corrected = nf.emul(bytecode_value, corr)
    den_val = nf.eadd(
        bytecode_value_corrected,
        nf.eadd(nf.emul(bytecode_index_value,
                        alphas_eq[N_INSTRUCTION_COLUMNS]),
                nf.escalar_mul(alphas_eq[-1],
                               np.uint32(LOGUP_BYTECODE_DOMAINSEP))))
    retrieved_den = nf.eadd(retrieved_den,
                            nf.emul(pref, nf.esub(c, den_val)))
    retrieved_den = nf.eadd(retrieved_den, nf.emul(
        pref_padded,
        pp.mle_of_zeros_then_ones(1 << log_bytecode,
                                  point_gkr[-log_bytecode_padded:])))
    offset += 1 << log_bytecode_padded

    bus_numerators_values = {}
    bus_denominators_values = {}
    columns_values = {}
    for table, log_n_rows in tables_sorted:
        table_values = {}
        if table == T.EXECUTION:
            eval_pc = verifier_state.next_extension_scalar()
            table_values[COL_PC] = eval_pc
            instr_evals = verifier_state.next_extension_scalars_vec(
                N_INSTRUCTION_COLUMNS)
            for k in range(N_INSTRUCTION_COLUMNS):
                table_values[N_RUNTIME_COLUMNS + k] = instr_evals[k]
            pref = pref_at(offset, log_n_rows)
            retrieved_num = nf.eadd(retrieved_num, pref)
            fp = finger_print_scalar(LOGUP_BYTECODE_DOMAINSEP,
                                     list(instr_evals) + [eval_pc], alphas_eq)
            retrieved_den = nf.eadd(retrieved_den,
                                    nf.emul(pref, nf.esub(c, fp)))
            offset += 1 << log_n_rows

        eval_sel = verifier_state.next_extension_scalar()
        pref = pref_at(offset, log_n_rows)
        retrieved_num = nf.eadd(retrieved_num, nf.emul(pref, eval_sel))
        eval_data = verifier_state.next_extension_scalar()
        retrieved_den = nf.eadd(retrieved_den, nf.emul(pref, eval_data))
        bus_numerators_values[table] = eval_sel
        bus_denominators_values[table] = eval_data
        offset += 1 << log_n_rows

        for lookup in T.table_lookups(table):
            index_eval = verifier_state.next_extension_scalar()
            table_values[lookup.index] = index_eval
            for i, vcol_idx in enumerate(lookup.values):
                value_eval = verifier_state.next_extension_scalar()
                table_values[vcol_idx] = value_eval
                pref = pref_at(offset, log_n_rows)
                retrieved_num = nf.eadd(retrieved_num, pref)
                fp = finger_print_scalar(
                    LOGUP_MEMORY_DOMAINSEP,
                    [value_eval, nf.eadd(index_eval,
                                         pp.efrom_base_scalar(i))],
                    alphas_eq)
                retrieved_den = nf.eadd(retrieved_den,
                                        nf.emul(pref, nf.esub(c, fp)))
                offset += 1 << log_n_rows

        columns_values[table] = table_values

    retrieved_den = nf.eadd(retrieved_den,
                            pp.mle_of_zeros_then_ones(offset, point_gkr))
    if not np.array_equal(retrieved_num, numerators_value):
        raise ProofError("logup numerators mismatch")
    if not np.array_equal(retrieved_den, denominators_value):
        raise ProofError("logup denominators mismatch")

    return {
        "memory_and_acc_point": mem_point,
        "value_memory": value_memory,
        "value_memory_acc": value_memory_acc,
        "bytecode_and_acc_point": bc_point,
        "value_bytecode_acc": value_bytecode_acc,
        "bus_numerators_values": bus_numerators_values,
        "bus_denominators_values": bus_denominators_values,
        "gkr_point": point_gkr,
        "columns_values": columns_values,
        "total_gkr_n_vars": total_gkr_n_vars,
        "bytecode_evaluation": (bytecode_point, bytecode_value),
        "numerators_value": numerators_value,
        "denominators_value": denominators_value,
    }


def _mle_of_01234567_etc(point: np.ndarray) -> np.ndarray:
    """MLE of the index function (utils/src/multilinear.rs:67-74)."""
    if len(point) == 0:
        return pp.EZERO.copy()
    e = _mle_of_01234567_etc(point[1:])
    hi = nf.eadd(e, pp.efrom_base_scalar((1 << (len(point) - 1)) % P))
    return nf.eadd(nf.emul(nf.esub(pp.EONE, point[0]), e),
                   nf.emul(point[0], hi))
