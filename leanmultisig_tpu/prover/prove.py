"""Master prover pipeline (mirrors lean_prover/src/prove_execution.rs:20-276).

execute -> trace gen -> FS init -> lookup counts -> stacked commit ->
logup GKR -> batched AIR sumcheck -> stacked statements -> WHIR open.
"""

from __future__ import annotations

import numpy as np

from ..air.tables_air import ExtraDataForBuses, TABLE_AIRS, max_air_constraints
from ..field import np_field as nf
from ..fs.prover import ProverState
from ..poly import np_poly as pp
from ..protocols.air_sumcheck import (AirSumcheckSession,
                                      compute_shifted_columns,
                                      natural_ordering_point_for_session,
                                      prove_batched_air_sumcheck)
from ..protocols.logup import (max_bus_width_including_domainsep,
                               prove_generic_logup, sort_tables_by_height)
from ..protocols.stacked_pcs import (stack_polynomials_and_commit,
                                     stacked_pcs_global_statements)
from ..vm import tables as T
from ..vm.isa import COL_PC, MIN_LOG_MEMORY_SIZE, MIN_LOG_N_ROWS_PER_TABLE
from ..vm.poseidon_host import poseidon16_compress_pair
from ..vm.runner import ExecutionWitness, execute_bytecode
from ..vm.trace_gen import get_execution_trace
from ..whir import open_ as whir_open
from ..whir.config import WhirConfig
from ..whir.statement import SparseStatement, SparseValue

# Fiat-Shamir domain separator (lean_prover/src/lib.rs:30-32); kept
# value-identical to the reference for bit-exact transcripts.
SNARK_DOMAIN_SEP = np.array([
    130704175, 1303721200, 493664240, 1035493700, 2063844858, 1410214009,
    1938905908, 1696767928], np.uint32)

BUS_SIGN = {"pull": -1, "push": 1}


def prove_execution(bytecode, public_input, witness: ExecutionWitness,
                    whir_config_builder, force_shape=None):
    """force_shape: optional (log_memory, {table: log_rows}) padding the
    proof to a FIXED shape (uniform/self-referential recursion: every
    level must produce the same proof shape it verifies)."""
    import os
    if os.environ.get("LMS_DPROVE") == "1" and force_shape is None:
        # device-resident pipeline (transcript-identical; tests assert it)
        from ..dprover.dprove import prove_execution_dev
        return prove_execution_dev(bytecode, public_input, witness,
                                   whir_config_builder)
    from ..utils.logs import span
    with span("execute"):
        result = execute_bytecode(bytecode, public_input, witness)
    with span("trace_gen"):
        trace = get_execution_trace(
            bytecode, result,
            force_log_rows=force_shape[1] if force_shape else None)
    traces = trace.traces
    memory = trace.memory
    metadata = trace.metadata

    min_memory_size = max(1 << MIN_LOG_MEMORY_SIZE, 1 << bytecode.log_size())
    if force_shape is not None:
        assert (1 << force_shape[0]) >= memory.shape[0],             ("forced memory too small", force_shape[0],
             memory.shape[0].bit_length())
        min_memory_size = max(min_memory_size, 1 << force_shape[0])
    if memory.shape[0] < min_memory_size:
        memory = np.concatenate(
            [memory,
             np.zeros(min_memory_size - memory.shape[0], np.uint32)])

    prover_state = ProverState()
    prover_state.observe_scalars(np.asarray(public_input, np.uint32))
    prover_state.observe_scalars(
        poseidon16_compress_pair(bytecode.hash, SNARK_DOMAIN_SEP))
    dims = ([whir_config_builder.starting_log_inv_rate,
             memory.shape[0].bit_length() - 1, len(public_input)]
            + [traces[t].log_n_rows for t in T.ALL_TABLES])
    prover_state.add_base_scalars(np.array(dims, np.uint32))
    for t in T.ALL_TABLES:
        assert traces[t].log_n_rows >= MIN_LOG_N_ROWS_PER_TABLE

    # lookup multiplicities (prove_execution.rs:91-110)
    memory_acc = np.zeros(memory.shape[0], np.int64)
    for table in T.ALL_TABLES:
        tr = traces[table]
        for lookup in T.table_lookups(table):
            idx = np.asarray(tr.columns[lookup.index], np.int64)
            for j in range(len(lookup.values)):
                np.add.at(memory_acc, idx + j, 1)
    from ..field.constants import P
    memory_acc = (memory_acc % P).astype(np.uint32)

    bc_padded = 1 << bytecode.log_size()
    bytecode_acc = np.zeros(bc_padded, np.int64)
    np.add.at(bytecode_acc,
              np.asarray(traces[T.EXECUTION].columns[COL_PC], np.int64), 1)
    bytecode_acc = (bytecode_acc % P).astype(np.uint32)

    # 1st commitment
    from ..utils.logs import span as _span
    with _span("stack_and_commit"):
        stacked_n_vars, stacked_witness, global_poly = \
            stack_polynomials_and_commit(prover_state, whir_config_builder,
                                         memory, memory_acc, bytecode_acc,
                                         traces)

    # logup (GKR)
    logup_c = prover_state.sample()
    prover_state.duplex()
    n_alphas = (max_bus_width_including_domainsep() - 1).bit_length()
    logup_alphas = prover_state.sample_vec(n_alphas)
    logup_alphas_eq = pp.eval_eq(logup_alphas)

    with span("logup_gkr"):
        logup = prove_generic_logup(prover_state, logup_c, logup_alphas_eq,
                                memory, memory_acc,
                                bytecode.instructions_multilinear,
                                bytecode_acc, traces)
    gkr_point = logup["gkr_point"]
    committed_statements = {
        t: [(gkr_point[-traces[t].log_n_rows:],
             logup["columns_values"][t], {})]
        for t in T.ALL_TABLES}

    bus_beta = prover_state.sample()
    prover_state.duplex()
    air_alpha = prover_state.sample()
    alpha_powers = [pp.EONE.copy()]
    for _ in range(max_air_constraints()):
        alpha_powers.append(nf.emul(alpha_powers[-1], air_alpha))
    alpha_powers = np.stack(alpha_powers)
    prover_state.duplex()
    air_eta = prover_state.sample()

    table_log_n_rows = {t: traces[t].log_n_rows for t in T.ALL_TABLES}
    tables_sorted = sort_tables_by_height(table_log_n_rows)

    sessions = []
    for table, log_n_rows in tables_sorted:
        air = TABLE_AIRS[table]
        bus = T.table_bus(table)
        num_v = logup["bus_numerators_values"][table]
        den_v = logup["bus_denominators_values"][table]
        sign = np.uint32(P - 1) if bus.direction == "pull" else np.uint32(1)
        bus_final = nf.eadd(nf.escalar_mul(num_v, sign),
                            nf.emul(bus_beta, nf.esub(den_v, logup_c)))
        eq_suffix = gkr_point[-log_n_rows:]
        cols = [np.asarray(c, np.uint32)
                for c in traces[table].columns[:air.n_columns]]
        cols_all = cols + compute_shifted_columns(air.n_shift, cols)
        extra = ExtraDataForBuses(logup_alphas_eq, bus_beta)
        sessions.append(AirSumcheckSession(table, cols_all, eq_suffix,
                                           bus_final, alpha_powers, extra))

    with span("air_sumcheck"):
        sumcheck_air_point = prove_batched_air_sumcheck(prover_state, sessions,
                                                    air_eta)

    for idx, (table, _) in enumerate(tables_sorted):
        air = TABLE_AIRS[table]
        col_evals = sessions[idx].final_column_evals()
        prover_state.add_extension_scalars(col_evals)
        nat_point = natural_ordering_point_for_session(
            sumcheck_air_point, traces[table].log_n_rows)
        eq_values = {i: col_evals[i] for i in range(air.n_columns)}
        next_values = {i: col_evals[air.n_columns + i]
                       for i in range(air.n_shift)}
        committed_statements[table].append((nat_point, eq_values, next_values))

    public_memory_size = trace.public_memory_size
    pm_point = prover_state.sample_vec(public_memory_size.bit_length() - 1)
    public_memory_eval = pp.eval_mle(memory[:public_memory_size], pm_point)

    previous_statements = [
        SparseStatement(stacked_n_vars, logup["memory_and_acc_point"],
                        [SparseValue(0, logup["value_memory"]),
                         SparseValue(1, logup["value_memory_acc"])]),
        SparseStatement(stacked_n_vars, pm_point,
                        [SparseValue(0, public_memory_eval)]),
        SparseStatement(stacked_n_vars, logup["bytecode_and_acc_point"],
                        [SparseValue((2 * memory.shape[0]) >> bytecode.log_size(),
                                     logup["value_bytecode_acc"])]),
    ]

    global_statements = stacked_pcs_global_statements(
        stacked_n_vars, memory.shape[0].bit_length() - 1, bytecode.log_size(),
        bytecode.ending_pc, previous_statements, table_log_n_rows,
        committed_statements)

    config = WhirConfig(whir_config_builder, stacked_n_vars)
    with span("whir_open"):
        whir_open(config, prover_state, global_statements, stacked_witness,
              global_poly)

    proof = prover_state.into_proof()
    return proof, metadata
