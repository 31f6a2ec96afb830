"""Stacked PCS: all committed data in ONE multilinear, committed via WHIR.

Layout (sub_protocols/src/stacked_pcs.rs:12-31):
  [memory | memory_acc | bytecode_acc (padded to max table height) |
   per table sorted by height desc: column 0, column 1, ...]
"""

from __future__ import annotations

import numpy as np

from ..poly import np_poly as pp
from ..vm import tables as T
from ..vm.isa import COL_PC, STARTING_PC
from ..whir import commit as whir_commit
from ..whir import parse_commitment as whir_parse_commitment
from ..whir.config import WhirConfig
from ..whir.statement import SparseStatement, SparseValue
from .logup import sort_tables_by_height


def compute_stacked_n_vars(log_memory: int, log_bytecode: int,
                           table_log_n_rows: dict) -> int:
    max_table = max(table_log_n_rows.values())
    total = (2 << log_memory) + (1 << max(log_bytecode, max_table))
    for table, log_n_rows in table_log_n_rows.items():
        total += T.table_n_columns(table) << log_n_rows
    return (total - 1).bit_length()


def stack_polynomials_and_commit(prover_state, whir_config_builder, memory,
                                 memory_acc, bytecode_acc, traces):
    """(stacked_pcs.rs:99-157) -> (stacked_n_vars, witness, global_poly)."""
    table_log_n_rows = {t: traces[t].log_n_rows for t in traces}
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    log_memory = memory.shape[0].bit_length() - 1
    assert log_memory >= table_log_n_rows[T.EXECUTION]
    assert table_log_n_rows[T.EXECUTION] >= tables_sorted[0][1]

    stacked_n_vars = compute_stacked_n_vars(
        log_memory, bytecode_acc.shape[0].bit_length() - 1, table_log_n_rows)
    global_poly = np.zeros(1 << stacked_n_vars, np.uint32)
    global_poly[:memory.shape[0]] = memory
    offset = memory.shape[0]
    global_poly[offset:offset + memory.shape[0]] = memory_acc
    offset += memory.shape[0]
    global_poly[offset:offset + bytecode_acc.shape[0]] = bytecode_acc
    largest_table = 1 << tables_sorted[0][1]
    offset += max(largest_table, bytecode_acc.shape[0])

    for table, log_n_rows in tables_sorted:
        n_rows = 1 << log_n_rows
        for col_index in range(T.table_n_columns(table)):
            col = np.asarray(traces[table].columns[col_index], np.uint32)
            global_poly[offset:offset + n_rows] = col[:n_rows]
            offset += n_rows
    assert (offset - 1).bit_length() == stacked_n_vars

    config = WhirConfig(whir_config_builder, stacked_n_vars)
    witness = whir_commit(config, prover_state, global_poly, offset)
    return stacked_n_vars, witness, global_poly


def stacked_pcs_parse_commitment(whir_config_builder, verifier_state,
                                 log_memory: int, log_bytecode: int,
                                 table_log_n_rows: dict):
    """(stacked_pcs.rs:159-181)"""
    from ..fs.verifier import ProofError
    from ..field.constants import TWO_ADICITY
    if (log_memory < table_log_n_rows[T.EXECUTION]
            or table_log_n_rows[T.EXECUTION] < max(table_log_n_rows.values())):
        raise ProofError("invalid table heights")
    stacked_n_vars = compute_stacked_n_vars(log_memory, log_bytecode,
                                            table_log_n_rows)
    if stacked_n_vars > (TWO_ADICITY
                         + whir_config_builder.folding_factor.at_round(0)
                         - whir_config_builder.starting_log_inv_rate):
        raise ProofError("stacked poly too large")
    config = WhirConfig(whir_config_builder, stacked_n_vars)
    return stacked_n_vars, whir_parse_commitment(
        verifier_state, stacked_n_vars, config.commitment_ood_samples)


def stacked_pcs_global_statements(stacked_n_vars: int, memory_n_vars: int,
                                  bytecode_n_vars: int, ending_pc: int,
                                  previous_statements: list,
                                  table_log_n_rows: dict,
                                  committed_statements: dict) -> list:
    """(stacked_pcs.rs:40-96). committed_statements: table -> list of
    (point, eq_values dict, next_values dict)."""
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    global_statements = list(previous_statements)
    offset = 2 << memory_n_vars
    max_table_n_vars = tables_sorted[0][1]
    offset += 1 << max(bytecode_n_vars, max_table_n_vars)

    for table, n_vars in tables_sorted:
        if table == T.EXECUTION:
            global_statements.append(SparseStatement.unique_value(
                stacked_n_vars, offset + (COL_PC << n_vars),
                pp.efrom_base_scalar(STARTING_PC)))
            global_statements.append(SparseStatement.unique_value(
                stacked_n_vars, offset + ((COL_PC + 1) << n_vars) - 1,
                pp.efrom_base_scalar(ending_pc)))
        for point, eq_values, next_values in committed_statements[table]:
            # BTreeMap iteration order = sorted by column index
            if next_values:
                global_statements.append(SparseStatement.new_next(
                    stacked_n_vars, point,
                    [SparseValue((offset >> n_vars) + ci, v)
                     for ci, v in sorted(next_values.items())]))
            global_statements.append(SparseStatement(
                stacked_n_vars, point,
                [SparseValue((offset >> n_vars) + ci, v)
                 for ci, v in sorted(eq_values.items())]))
        offset += T.table_n_columns(table) << n_vars
    return global_statements
