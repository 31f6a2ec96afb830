"""Device-resident master prover pipeline.

Mirrors prover/prove.py (lean_prover/src/prove_execution.rs:20-276)
transcript-for-transcript: witness generation and trace building stay on
host (control-flow-heavy), everything from the stacked commitment through
the final WHIR round runs as an asynchronous device dispatch stream with
the Fiat-Shamir challenger resident on device. One fetch at the end.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..air.tables_air import max_air_constraints
from ..field.constants import P
from ..protocols.logup import (max_bus_width_including_domainsep,
                               sort_tables_by_height)
from ..protocols.stacked_pcs import compute_stacked_n_vars
from ..vm import tables as T
from ..vm.isa import (COL_PC, MIN_LOG_MEMORY_SIZE, MIN_LOG_N_ROWS_PER_TABLE,
                      N_INSTRUCTION_COLUMNS, STARTING_PC)
from ..vm.poseidon_host import poseidon16_compress_pair
from ..vm.runner import ExecutionWitness, execute_bytecode
from ..vm.trace_gen import get_execution_trace
from ..whir.config import WhirConfig
from . import dpoly
from .dair import DevAirSession, prove_batched_air_sumcheck_dev
from .dfs import DevProverState, to_dev_monty
from .dlogup import BYTECODE_STRIDE, prove_generic_logup_dev
from .dwhir import DStatement, DStatementValue, commit_dev, open_dev

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _dprof_sync(ps) -> None:
    """When LMS_DPROF=1, block on the challenger state at span close so
    the span wall time includes the device work queued by the phase
    (dispatch is otherwise fully async; all device time would land in
    finalize). Profiling only — syncing breaks pipelining."""
    import os
    if os.environ.get("LMS_DPROF"):
        jax, _ = _jax()
        jax.block_until_ready(ps.challenger.state)


@functools.cache
def _concat_fn(n_parts: int, total: int):
    jax, jnp = _jax()

    @aot_jit
    def cat(parts):
        out = jnp.concatenate(parts)
        pad = total - out.shape[0]
        if pad:
            out = jnp.concatenate([out, jnp.zeros(pad, jnp.uint32)])
        return out

    return cat


@functools.cache
def _alpha_powers_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def powers(alpha):
        # scan, not an unrolled chain: see dpoly._expand_fn — a fused
        # elementwise power chain is recomputed per use (exponential)
        def body(cur, _):
            return jf.emul(cur, alpha), cur

        _, out = jax.lax.scan(body, jnp.asarray(dpoly.eone_m()), None,
                              length=n + 1)
        return out

    return powers


@functools.cache
def _bus_final_fn(pull: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    sign = dpoly.monty_const(P - 1 if pull else 1)

    @aot_jit
    def bus_final(num_v, den_v, bus_beta, logup_c):
        return jf.eadd(jf.mul(num_v, jnp.asarray(sign)),
                       jf.emul(bus_beta, jf.esub(den_v, logup_c)))

    return bus_final


@functools.cache
def _shift_col_fn():
    jax, jnp = _jax()

    @aot_jit
    def shift(col):
        return jnp.concatenate([col[1:], col[-1:]])

    return shift


def prove_execution_dev(bytecode, public_input, witness: ExecutionWitness,
                        whir_config_builder):
    """Device prove_execution; returns (Proof, metadata) — transcript
    bit-identical to prover/prove.prove_execution."""
    jax, jnp = _jax()
    from ..utils.logs import span
    from ..prover.prove import SNARK_DOMAIN_SEP as SNARK_DOMAIN_SEP_HOST

    with span("execute"):
        result = execute_bytecode(bytecode, public_input, witness)
    with span("trace_gen"):
        trace = get_execution_trace(bytecode, result)
    traces = trace.traces
    memory = trace.memory
    metadata = trace.metadata

    min_memory_size = max(1 << MIN_LOG_MEMORY_SIZE, 1 << bytecode.log_size())
    if memory.shape[0] < min_memory_size:
        memory = np.concatenate(
            [memory, np.zeros(min_memory_size - memory.shape[0], np.uint32)])

    # lookup multiplicities (host: scatter-adds over irregular indices)
    memory_acc = np.zeros(memory.shape[0], np.int64)
    for table in T.ALL_TABLES:
        tr = traces[table]
        for lookup in T.table_lookups(table):
            idx = np.asarray(tr.columns[lookup.index], np.int64)
            for j in range(len(lookup.values)):
                np.add.at(memory_acc, idx + j, 1)
    memory_acc = (memory_acc % P).astype(np.uint32)

    bc_padded = 1 << bytecode.log_size()
    bytecode_acc = np.zeros(bc_padded, np.int64)
    np.add.at(bytecode_acc,
              np.asarray(traces[T.EXECUTION].columns[COL_PC], np.int64), 1)
    bytecode_acc = (bytecode_acc % P).astype(np.uint32)

    # ---- uploads (async) --------------------------------------------------
    with span("upload"):
        memory_d = to_dev_monty(memory)
        memory_acc_d = to_dev_monty(memory_acc)
        bytecode_acc_d = to_dev_monty(bytecode_acc)
        bc_cols_d = [to_dev_monty(
            bytecode.instructions_multilinear[k::BYTECODE_STRIDE][:bc_padded])
            for k in range(N_INSTRUCTION_COLUMNS)]
        trace_cols_d = {
            t: [to_dev_monty(np.asarray(c, np.uint32))
                for c in traces[t].columns]
            for t in T.ALL_TABLES}

    ps = DevProverState()
    ps.observe_host_scalars(np.asarray(public_input, np.uint32))
    ps.observe_host_scalars(
        poseidon16_compress_pair(bytecode.hash, SNARK_DOMAIN_SEP_HOST))
    dims = ([whir_config_builder.starting_log_inv_rate,
             memory.shape[0].bit_length() - 1, len(public_input)]
            + [traces[t].log_n_rows for t in T.ALL_TABLES])
    ps.add_host_scalars(np.array(dims, np.uint32))
    for t in T.ALL_TABLES:
        assert traces[t].log_n_rows >= MIN_LOG_N_ROWS_PER_TABLE

    table_log_n_rows = {t: traces[t].log_n_rows for t in T.ALL_TABLES}
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    log_memory = memory.shape[0].bit_length() - 1
    log_bytecode = bytecode.log_size()

    # ---- 1st commitment ---------------------------------------------------
    with span("stack_and_commit"):
        stacked_n_vars = compute_stacked_n_vars(log_memory, log_bytecode,
                                                table_log_n_rows)
        parts = [memory_d, memory_acc_d, bytecode_acc_d]
        largest_table = 1 << tables_sorted[0][1]
        pad_bc = max(largest_table, bc_padded) - bc_padded
        if pad_bc:
            parts.append(jnp.zeros(pad_bc, jnp.uint32))
        offset = 2 * memory.shape[0] + max(largest_table, bc_padded)
        for table, log_n_rows in tables_sorted:
            n_rows = 1 << log_n_rows
            for col_index in range(T.table_n_columns(table)):
                parts.append(trace_cols_d[table][col_index])
                offset += n_rows
        global_poly = _concat_fn(len(parts), 1 << stacked_n_vars)(parts)
        config = WhirConfig(whir_config_builder, stacked_n_vars)
        stacked_witness = commit_dev(config, ps, global_poly, offset)
        _dprof_sync(ps)

    # ---- logup (GKR) ------------------------------------------------------
    logup_c = ps.sample()
    ps.duplex()
    n_alphas = (max_bus_width_including_domainsep() - 1).bit_length()
    logup_alphas = ps.sample_vec(n_alphas)
    logup_alphas_eq = dpoly.deval_eq(logup_alphas)

    with span("logup_gkr"):
        logup = prove_generic_logup_dev(
            ps, logup_c, logup_alphas_eq, memory_d, memory_acc_d,
            bc_cols_d, bytecode_acc_d, trace_cols_d, table_log_n_rows,
            log_bytecode)
        _dprof_sync(ps)
    gkr_point = logup["gkr_point"]
    committed_statements = {
        t: [(gkr_point[-traces[t].log_n_rows:],
             logup["columns_values"][t], {})]
        for t in T.ALL_TABLES}

    bus_beta = ps.sample()
    ps.duplex()
    air_alpha = ps.sample()
    alpha_powers = _alpha_powers_fn(max_air_constraints())(air_alpha)
    ps.duplex()
    air_eta = ps.sample()

    sessions = []
    for table, log_n_rows in tables_sorted:
        from ..air.tables_air import TABLE_AIRS
        air = TABLE_AIRS[table]
        bus = T.table_bus(table)
        num_v = logup["bus_numerators_values"][table]
        den_v = logup["bus_denominators_values"][table]
        bus_final = _bus_final_fn(bus.direction == "pull")(
            num_v, den_v, bus_beta, logup_c)
        eq_suffix = gkr_point[-log_n_rows:]
        cols = trace_cols_d[table][:air.n_columns]
        cols_all = cols + [_shift_col_fn()(c) for c in cols[:air.n_shift]]
        sessions.append(DevAirSession(table, cols_all, eq_suffix, bus_final,
                                      alpha_powers, logup_alphas_eq,
                                      bus_beta))

    with span("air_sumcheck"):
        sumcheck_air_point, air_col_evals = prove_batched_air_sumcheck_dev(
            ps, sessions, air_eta)
        _dprof_sync(ps)

    for idx, (table, _) in enumerate(tables_sorted):
        from ..air.tables_air import TABLE_AIRS
        air = TABLE_AIRS[table]
        col_evals = air_col_evals[idx]
        log_n = traces[table].log_n_rows
        nat_point = sumcheck_air_point[-log_n:][::-1]
        eq_values = {i: col_evals[i] for i in range(air.n_columns)}
        next_values = {i: col_evals[air.n_columns + i]
                       for i in range(air.n_shift)}
        committed_statements[table].append((nat_point, eq_values,
                                            next_values))

    public_memory_size = trace.public_memory_size
    pm_point = ps.sample_vec(public_memory_size.bit_length() - 1)
    public_memory_eval = dpoly.deval_mle(memory_d[:public_memory_size],
                                         pm_point)

    previous_statements = [
        DStatement(stacked_n_vars, logup["memory_and_acc_point"],
                   [DStatementValue(0, logup["value_memory"]),
                    DStatementValue(1, logup["value_memory_acc"])]),
        DStatement(stacked_n_vars, pm_point,
                   [DStatementValue(0, public_memory_eval)]),
        DStatement(stacked_n_vars, logup["bytecode_and_acc_point"],
                   [DStatementValue((2 * memory.shape[0]) >> log_bytecode,
                                    logup["value_bytecode_acc"])]),
    ]

    global_statements = _global_statements_dev(
        stacked_n_vars, log_memory, log_bytecode, bytecode.ending_pc,
        previous_statements, table_log_n_rows, committed_statements)

    with span("whir_open"):
        open_dev(config, ps, global_statements, stacked_witness,
                 global_poly)
        _dprof_sync(ps)

    with span("finalize"):
        proof = ps.finalize()
    return proof, metadata


def _global_statements_dev(stacked_n_vars, memory_n_vars, bytecode_n_vars,
                           ending_pc, previous_statements, table_log_n_rows,
                           committed_statements):
    """Device mirror of stacked_pcs_global_statements
    (stacked_pcs.rs:40-96)."""
    _, jnp = _jax()
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    global_statements = list(previous_statements)
    offset = 2 << memory_n_vars
    max_table_n_vars = tables_sorted[0][1]
    offset += 1 << max(bytecode_n_vars, max_table_n_vars)

    def escalar(v: int):
        out = np.zeros(EXT, np.uint32)
        out[0] = dpoly.monty_const(v)
        return jnp.asarray(out)

    empty_point = jnp.zeros((0, EXT), jnp.uint32)
    for table, n_vars in tables_sorted:
        if table == T.EXECUTION:
            global_statements.append(DStatement(
                stacked_n_vars, empty_point,
                [DStatementValue(offset + (COL_PC << n_vars),
                                 escalar(STARTING_PC))]))
            global_statements.append(DStatement(
                stacked_n_vars, empty_point,
                [DStatementValue(offset + ((COL_PC + 1) << n_vars) - 1,
                                 escalar(ending_pc))]))
        for point, eq_values, next_values in committed_statements[table]:
            if next_values:
                global_statements.append(DStatement(
                    stacked_n_vars, point,
                    [DStatementValue((offset >> n_vars) + ci, v)
                     for ci, v in sorted(next_values.items())],
                    is_next=True))
            global_statements.append(DStatement(
                stacked_n_vars, point,
                [DStatementValue((offset >> n_vars) + ci, v)
                 for ci, v in sorted(eq_values.items())]))
        offset += T.table_n_columns(table) << n_vars
    return global_statements
