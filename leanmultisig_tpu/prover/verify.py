"""Master verifier (mirrors lean_prover/src/verify_execution.rs:14-234).

Separate code path from the prover, sharing only the transcript.
"""

from __future__ import annotations

import numpy as np

from ..air.tables_air import ExtraDataForBuses, TABLE_AIRS, max_air_constraints
from ..field import np_field as nf
from ..field.constants import P
from ..fs.verifier import ProofError, VerifierState
from ..poly import np_poly as pp
from ..protocols.air_sumcheck import (back_loaded_table_contribution,
                                      natural_ordering_point_for_session)
from ..protocols.logup import (max_bus_width_including_domainsep,
                               sort_tables_by_height, verify_generic_logup)
from ..protocols.stacked_pcs import (stacked_pcs_global_statements,
                                     stacked_pcs_parse_commitment)
from ..sumcheck.np_sumcheck import sumcheck_verify
from ..vm import tables as T
from ..vm.isa import (MAX_LOG_MEMORY_SIZE, MIN_BYTECODE_LOG_SIZE,
                      MIN_LOG_MEMORY_SIZE, MIN_LOG_N_ROWS_PER_TABLE)
from ..vm.poseidon_host import poseidon16_compress_pair
from ..whir import verify as whir_verify
from ..whir.config import WhirConfig
from ..whir.statement import SparseStatement, SparseValue
from .prove import BUS_SIGN, SNARK_DOMAIN_SEP


def verify_execution(bytecode, public_input, proof, whir_config_builder):
    """Returns (bytecode_evaluation, raw_proof)."""
    vs = VerifierState(proof)
    vs.observe_scalars(np.asarray(public_input, np.uint32))
    vs.observe_scalars(poseidon16_compress_pair(bytecode.hash,
                                                SNARK_DOMAIN_SEP))
    n_tables = len(T.ALL_TABLES)
    dims = [int(x) for x in vs.next_base_scalars_vec(3 + n_tables)]
    log_inv_rate, log_memory, public_input_len = dims[0], dims[1], dims[2]
    if public_input_len != len(public_input):
        raise ProofError("public input length mismatch")
    if log_inv_rate != whir_config_builder.starting_log_inv_rate:
        raise ProofError("rate mismatch")
    table_log_n_rows = {t: dims[3 + i] for i, t in enumerate(T.ALL_TABLES)}
    for t, log_n in table_log_n_rows.items():
        if log_n < MIN_LOG_N_ROWS_PER_TABLE:
            raise ProofError("table too small")
        # Protocol max heights (verify_execution.rs:38-48): the prover's
        # _pad_table bound alone is bypassable by an adversarial prover.
        if log_n > T.MAX_LOG_N_ROWS[t]:
            raise ProofError("table too large")
    if bytecode.log_size() < MIN_BYTECODE_LOG_SIZE:
        raise ProofError("bytecode too small")
    if log_memory < max(max(table_log_n_rows.values()), bytecode.log_size()):
        raise ProofError("memory too small")
    if not (MIN_LOG_MEMORY_SIZE <= log_memory <= MAX_LOG_MEMORY_SIZE):
        raise ProofError("invalid memory size")

    pm_len = len(public_input)
    pm_pot = 1 if pm_len <= 1 else 1 << (pm_len - 1).bit_length()
    public_memory = np.zeros(pm_pot, np.uint32)
    public_memory[:pm_len] = np.asarray(public_input, np.uint32)

    stacked_n_vars, parsed_commitment = stacked_pcs_parse_commitment(
        whir_config_builder, vs, log_memory, bytecode.log_size(),
        table_log_n_rows)

    logup_c = vs.sample()
    vs.duplex()
    n_alphas = (max_bus_width_including_domainsep() - 1).bit_length()
    logup_alphas = vs.sample_vec(n_alphas)
    logup_alphas_eq = pp.eval_eq(logup_alphas)

    logup = verify_generic_logup(vs, logup_c, logup_alphas, logup_alphas_eq,
                                 log_memory, bytecode.instructions_multilinear,
                                 table_log_n_rows)
    gkr_point = logup["gkr_point"]
    committed_statements = {
        t: [(gkr_point[-table_log_n_rows[t]:],
             logup["columns_values"][t], {})]
        for t in T.ALL_TABLES}

    bus_beta = vs.sample()
    vs.duplex()
    air_alpha = vs.sample()
    alpha_powers = [pp.EONE.copy()]
    for _ in range(max_air_constraints()):
        alpha_powers.append(nf.emul(alpha_powers[-1], air_alpha))
    alpha_powers = np.stack(alpha_powers)
    vs.duplex()
    eta = vs.sample()

    tables_sorted = sort_tables_by_height(table_log_n_rows)

    initial_sum = pp.EZERO.copy()
    eta_power = pp.EONE.copy()
    eta_powers = []
    for table, _ in tables_sorted:
        bus = T.table_bus(table)
        num_v = logup["bus_numerators_values"][table]
        den_v = logup["bus_denominators_values"][table]
        sign = np.uint32(P - 1) if bus.direction == "pull" else np.uint32(1)
        bus_final = nf.eadd(nf.escalar_mul(num_v, sign),
                            nf.emul(bus_beta, nf.esub(den_v, logup_c)))
        initial_sum = nf.eadd(initial_sum, nf.emul(eta_power, bus_final))
        eta_powers.append(eta_power)
        eta_power = nf.emul(eta_power, eta)

    max_full_degree = max(TABLE_AIRS[t].degree + 1 for t, _ in tables_sorted)
    n_max = tables_sorted[0][1]
    sumcheck_air_point, claimed_final = sumcheck_verify(
        vs, n_max, max_full_degree, initial_sum)

    extra = ExtraDataForBuses(logup_alphas_eq, bus_beta)
    my_final = pp.EZERO.copy()
    for idx, (table, log_n) in enumerate(tables_sorted):
        air = TABLE_AIRS[table]
        n_cols_total = air.n_columns + air.n_shift
        col_evals = vs.next_extension_scalars_vec(n_cols_total)
        flat = [col_evals[i][None, :] for i in range(air.n_columns)]
        shift = [col_evals[air.n_columns + i][None, :]
                 for i in range(air.n_shift)]
        from ..air.tables_air import eval_table_air
        constraint_eval = eval_table_air(table, flat, shift, alpha_powers,
                                         extra)[0]
        bus_point = gkr_point[-log_n:]
        nat_point = natural_ordering_point_for_session(sumcheck_air_point,
                                                       log_n)
        my_final = nf.eadd(my_final, back_loaded_table_contribution(
            bus_point, sumcheck_air_point, nat_point, constraint_eval,
            eta_powers[idx]))
        eq_values = {i: col_evals[i] for i in range(air.n_columns)}
        next_values = {i: col_evals[air.n_columns + i]
                       for i in range(air.n_shift)}
        committed_statements[table].append((nat_point, eq_values, next_values))

    if not np.array_equal(my_final, claimed_final):
        raise ProofError("AIR sumcheck final value mismatch")

    pm_point = vs.sample_vec(public_memory.shape[0].bit_length() - 1)
    public_memory_eval = pp.eval_mle(public_memory, pm_point)

    previous_statements = [
        SparseStatement(stacked_n_vars, logup["memory_and_acc_point"],
                        [SparseValue(0, logup["value_memory"]),
                         SparseValue(1, logup["value_memory_acc"])]),
        SparseStatement(stacked_n_vars, pm_point,
                        [SparseValue(0, public_memory_eval)]),
        SparseStatement(stacked_n_vars, logup["bytecode_and_acc_point"],
                        [SparseValue((2 << log_memory) >> bytecode.log_size(),
                                     logup["value_bytecode_acc"])]),
    ]

    global_statements = stacked_pcs_global_statements(
        stacked_n_vars, log_memory, bytecode.log_size(), bytecode.ending_pc,
        previous_statements, table_log_n_rows, committed_statements)

    config = WhirConfig(whir_config_builder, stacked_n_vars)
    whir_verify(config, vs, parsed_commitment, global_statements)

    return logup["bytecode_evaluation"], vs.into_raw_proof()
