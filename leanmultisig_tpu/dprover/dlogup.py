"""Device-resident generic Logup (mirrors protocols/logup.py).

The whole fractional-sum fill — memory / bytecode / bus / lookup
sections, alpha-fingerprinted with domain separation — happens in one
jitted device pass; openings at the GKR point run as batched fold
chains over stacked columns. Reference: sub_protocols/src/logup.rs.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..protocols.logup import compute_total_active_len, sort_tables_by_height
from ..vm import tables as T
from ..vm.isa import (COL_PC, LOGUP_BYTECODE_DOMAINSEP,
                      LOGUP_MEMORY_DOMAINSEP, LOGUP_PRECOMPILE_DOMAINSEP,
                      N_INSTRUCTION_COLUMNS, N_RUNTIME_COLUMNS)
from . import dpoly
from .dgkr import prove_gkr_quotient_dev

EXT = 5
BYTECODE_STRIDE = 16


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=16)
def _arange_monty(n: int) -> np.ndarray:
    from ..field import jnp_field as jf
    return jf.to_monty_np(np.arange(n, dtype=np.uint32))


def _fp_rows(jf, jnp, domainsep, base_cols, alphas_eq):
    """Vectorized fingerprint over rows (logup.py:_finger_print_rows)."""
    m = base_cols[0].shape[0]
    acc = None
    for i, col in enumerate(base_cols):
        term = jf.escalar_mul(
            jnp.broadcast_to(alphas_eq[i], (m, EXT)), col)
        acc = term if acc is None else jf.eadd(acc, term)
    ds = jf.escalar_mul(alphas_eq[-1],
                        jnp.asarray(dpoly.monty_const(domainsep)))
    return jf.eadd(acc, jnp.broadcast_to(ds, (m, EXT)))


def dfinger_print_scalar(domainsep, data, alphas_eq):
    """Scalar fingerprint: data = list of (5,) ext monty device values."""
    return _fp_scalar_fn(len(data), domainsep)(list(data), alphas_eq)


@functools.cache
def _fp_scalar_fn(n: int, domainsep: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def fp(data, alphas_eq):
        acc = None
        for i in range(n):
            term = jf.emul(alphas_eq[i], data[i])
            acc = term if acc is None else jf.eadd(acc, term)
        ds = jf.escalar_mul(alphas_eq[-1],
                            jnp.asarray(dpoly.monty_const(domainsep)))
        return jf.eadd(acc, ds)

    return fp


@functools.cache
def _fill_fn(meta_key, shapes_key):
    """One jitted pass building (nums (2^T,), dens (2^T, 5))."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    (log_memory, log_bytecode, tables_sorted, total_active,
     total_n_vars) = meta_key
    total_len = 1 << total_n_vars
    n_mem = 1 << log_memory
    n_bc = 1 << log_bytecode
    max_table_height = 1 << tables_sorted[0][1]

    @aot_jit
    def fill(c, alphas_eq, memory, memory_acc, bc_cols, bytecode_acc,
             trace_cols):
        nums_parts = []
        dens_parts = []

        def c_minus(rows):
            return jf.esub(jnp.broadcast_to(c, rows.shape), rows)

        def c_plus(rows):
            return jf.eadd(jnp.broadcast_to(c, rows.shape), rows)

        # memory section
        nums_parts.append(jf.neg(memory_acc))
        idx = jnp.asarray(_arange_monty(n_mem))
        dens_parts.append(c_minus(_fp_rows(
            jf, jnp, LOGUP_MEMORY_DOMAINSEP, [memory, idx], alphas_eq)))

        # bytecode section (+ padding to max table height)
        nums_parts.append(jf.neg(bytecode_acc))
        bcl = list(bc_cols) + [jnp.asarray(_arange_monty(n_bc))]
        dens_parts.append(c_minus(_fp_rows(
            jf, jnp, LOGUP_BYTECODE_DOMAINSEP, bcl, alphas_eq)))
        pad = max(max_table_height, n_bc) - n_bc
        if pad:
            nums_parts.append(jnp.zeros(pad, jnp.uint32))
            one_col = jnp.zeros((pad, EXT), jnp.uint32).at[:, 0].set(
                jnp.full(pad, dpoly.MONTY_ONE, jnp.uint32))
            dens_parts.append(one_col)

        one_m = jnp.asarray(dpoly.MONTY_ONE)
        for table, log_n_rows in tables_sorted:
            cols = trace_cols[table]
            h = 1 << log_n_rows
            if table == T.EXECUTION:
                nums_parts.append(jnp.full(h, one_m, jnp.uint32))
                data = [cols[N_RUNTIME_COLUMNS + k2]
                        for k2 in range(N_INSTRUCTION_COLUMNS)] \
                    + [cols[COL_PC]]
                dens_parts.append(c_minus(_fp_rows(
                    jf, jnp, LOGUP_BYTECODE_DOMAINSEP, data, alphas_eq)))

            bus = T.table_bus(table)
            selector = cols[bus.selector]
            nums_parts.append(jf.neg(selector)
                              if bus.direction == "pull" else selector)
            bus_data = [cols[j] for j in bus.data]
            dens_parts.append(c_plus(_fp_rows(
                jf, jnp, LOGUP_PRECOMPILE_DOMAINSEP, bus_data, alphas_eq)))

            for lookup in T.table_lookups(table):
                index_col = cols[lookup.index]
                for i in range(len(lookup.values)):
                    vcol = cols[lookup.values[i]]
                    nums_parts.append(jnp.full(h, one_m, jnp.uint32))
                    shifted = jf.add(
                        index_col,
                        jnp.asarray(dpoly.monty_const(i))) if i else \
                        index_col
                    dens_parts.append(c_minus(_fp_rows(
                        jf, jnp, LOGUP_MEMORY_DOMAINSEP, [vcol, shifted],
                        alphas_eq)))

        nums = jnp.concatenate(nums_parts)
        dens = jnp.concatenate(dens_parts)
        assert nums.shape[0] == total_active
        tail = total_len - total_active
        if tail:
            nums = jnp.concatenate([nums, jnp.zeros(tail, jnp.uint32)])
            pad_den = jnp.zeros((tail, EXT), jnp.uint32).at[:, 0].set(
                jnp.full(tail, dpoly.MONTY_ONE, jnp.uint32))
            dens = jnp.concatenate([dens, pad_den])
        return nums, dens

    return fill


def prove_generic_logup_dev(prover_state, c, alphas_eq, memory, memory_acc,
                            bc_cols, bytecode_acc, trace_cols,
                            table_log_n_rows, log_bytecode) -> dict:
    """(logup.rs:27-323). All array args are monty device arrays;
    trace_cols: table -> list of (2^n,) base monty device columns."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    log_memory = memory.shape[0].bit_length() - 1
    tables_sorted = sort_tables_by_height(table_log_n_rows)
    total_active = compute_total_active_len(log_memory, log_bytecode,
                                            tables_sorted)
    total_n_vars = (total_active - 1).bit_length()

    meta_key = (log_memory, log_bytecode,
                tuple(tables_sorted), total_active, total_n_vars)
    shapes_key = tuple(sorted((t, len(cs)) for t, cs in trace_cols.items()))
    nums, dens = _fill_fn(meta_key, shapes_key)(
        c, alphas_eq, memory, memory_acc, list(bc_cols), bytecode_acc,
        {t: list(cs) for t, cs in trace_cols.items()})

    gkr_point = prove_gkr_quotient_dev(prover_state, nums, dens)

    # --- openings at the GKR point suffixes (logup.rs:223-308) ---
    mem_point = gkr_point[-log_memory:]
    mm = jnp.stack([memory_acc, memory])
    both = dpoly.deval_mle_cols(mm, mem_point)
    value_memory_acc, value_memory = both[0], both[1]
    prover_state.add_extension_scalar(value_memory_acc)
    prover_state.add_extension_scalar(value_memory)

    bc_point = gkr_point[-log_bytecode:]
    value_bytecode_acc = dpoly.deval_mle(bytecode_acc, bc_point)
    prover_state.add_extension_scalar(value_bytecode_acc)

    bus_numerators_values = {}
    bus_denominators_values = {}
    columns_values = {}
    for table, log_n_rows in tables_sorted:
        cols = trace_cols[table]
        inner_point = gkr_point[-log_n_rows:]
        stacked = jnp.stack(cols)  # (C, 2^n)
        evals = dpoly.deval_mle_cols(stacked, inner_point)  # (C, 5)
        table_values = {}

        if table == T.EXECUTION:
            eval_pc = evals[COL_PC]
            prover_state.add_extension_scalar(eval_pc)
            table_values[COL_PC] = eval_pc
            instr = evals[N_RUNTIME_COLUMNS:
                          N_RUNTIME_COLUMNS + N_INSTRUCTION_COLUMNS]
            prover_state.add_extension_scalars(instr)
            for k2 in range(N_INSTRUCTION_COLUMNS):
                table_values[N_RUNTIME_COLUMNS + k2] = instr[k2]

        bus = T.table_bus(table)
        sign = (P_MINUS_1 if bus.direction == "pull" else 1)
        eval_sel = _scale_scalar_fn()(evals[bus.selector],
                                      jnp.asarray(dpoly.monty_const(sign)))
        prover_state.add_extension_scalar(eval_sel)
        bus_data_evals = [evals[j] for j in bus.data]
        eval_data = _cplus_fn()(c, dfinger_print_scalar(
            LOGUP_PRECOMPILE_DOMAINSEP, bus_data_evals, alphas_eq))
        prover_state.add_extension_scalar(eval_data)
        bus_numerators_values[table] = eval_sel
        bus_denominators_values[table] = eval_data

        for lookup in T.table_lookups(table):
            index_eval = evals[lookup.index]
            prover_state.add_extension_scalar(index_eval)
            table_values[lookup.index] = index_eval
            for vcol_idx in lookup.values:
                value_eval = evals[vcol_idx]
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
        "total_gkr_n_vars": total_n_vars,
    }


P_MINUS_1 = (1 << 31) - (1 << 24)  # P - 1


@functools.cache
def _scale_scalar_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(lambda e, s: jf.mul(e, s))


@functools.cache
def _cplus_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.eadd)
