"""Device-resident AIR constraint evaluation (TPU path).

The symbolic constraint DAG (air/symbolic.py) is traced ONCE per table
into a jnp program over Montgomery-form columns — XLA fuses the whole
graph exactly the way the generated-C host kernel does
(air/native_eval.py), but onto VPU lanes. `air_round_evals` is the
fused z-stacked sumcheck round: stack z points, evaluate all
constraints, weight by the eq table and reduce — one jit, one device
round-trip per sumcheck round.

Reference analog: constraint_folder/normal.rs packed evaluation; TPU
mapping per SURVEY §2.17 (trace rows over lanes; later: rows sharded
over the mesh with psum-reduced partial sums).

Scope: execution + extension_op tables (small DAGs). The poseidon16 AIR
(~5.6k DAG ops -> ~400k HLO primitives) blows up XLA compile as a flat
graph; its device path needs the STRUCTURED per-round formulation (the
sparse partial-round schedule as lax.scan over rounds) — round-2 work.
The host generated-C kernel covers p16 meanwhile.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..air.symbolic import SymConst, SymOp, SymVar, symbolic_constraints
from ..vm.isa import LOGUP_PRECOMPILE_DOMAINSEP


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=8)
def _dag(table: str):
    constraints, declared, bus_idx = symbolic_constraints(
        table, with_bus_index=True)
    return constraints, declared, bus_idx


def eval_constraints_monty(table: str, flat, shift, alpha_powers,
                           alphas_eq, bus_beta):
    """All inputs monty-form jnp arrays. flat/shift: lists of (M,) base
    or (M, 5) ext columns; alpha_powers (K, 5); alphas_eq (16, 5);
    bus_beta (5,). Returns the (M, 5) alpha-batched accumulator.

    Call under jit — the DAG walk traces once and XLA fuses it."""
    from ..field import jnp_field as jf
    _, jnp = _jax()
    constraints, declared, bus_idx = _dag(table)

    cache: dict = {}

    def skey(e):
        if id(e) in cache:
            return cache[id(e)]
        if isinstance(e, SymConst):
            k = ("c", e.value)
        elif isinstance(e, SymVar):
            k = ("v", e.kind, e.col)
        else:
            k = (e.op, skey(e.a), skey(e.b))
        cache[id(e)] = k
        return k

    vals: dict = {}

    def ext(x):
        return x if x.ndim >= 1 and x.shape[-1] == 5 else jf.efrom_base(x)

    def emit(e):
        k = skey(e)
        if k in vals:
            return vals[k]
        if isinstance(e, SymConst):
            r = jnp.asarray(jf.const_monty(e.value))
        elif isinstance(e, SymVar):
            cols = flat if e.kind == "flat" else shift
            r = cols[e.col]
        else:
            a, b = emit(e.a), emit(e.b)
            a_ext = hasattr(a, "ndim") and a.ndim >= 1 and a.shape[-1] == 5
            b_ext = hasattr(b, "ndim") and b.ndim >= 1 and b.shape[-1] == 5
            if a_ext or b_ext:
                if e.op == "mul" and not b_ext:
                    r = jf.escalar_mul(a, b)
                elif e.op == "mul" and not a_ext:
                    r = jf.escalar_mul(b, a)
                else:
                    fn = {"add": jf.eadd, "sub": jf.esub,
                          "mul": jf.emul}[e.op]
                    r = fn(ext(a), ext(b))
            else:
                fn = {"add": jf.add, "sub": jf.sub, "mul": jf.mul}[e.op]
                r = fn(a, b)
        vals[k] = r
        return r

    cvals = [emit(c) for c in constraints]
    flag_v = emit(declared[0][0])
    data_vs = [emit(d) for d in declared[1]]

    # bus value (tables/utils.rs:5-23)
    fp5 = None
    for i, d in enumerate(data_vs):
        d_ext = hasattr(d, "ndim") and d.ndim >= 1 and d.shape[-1] == 5
        term = (jf.emul(d, jnp.broadcast_to(alphas_eq[i], d.shape))
                if d_ext else jf.escalar_mul(
                    jnp.broadcast_to(alphas_eq[i], d.shape + (5,)), d))
        fp5 = term if fp5 is None else jf.eadd(fp5, term)
    ds = jf.escalar_mul(alphas_eq[-1],
                        jnp.asarray(jf.const_monty(
                            LOGUP_PRECOMPILE_DOMAINSEP)))
    # NOTE: monty scalar product needs one monty mul, escalar handles it
    fp5 = jf.eadd(fp5, jnp.broadcast_to(ds, fp5.shape))
    bus5 = jf.emul(fp5, jnp.broadcast_to(bus_beta, fp5.shape))
    bus5 = jf.eadd(bus5, ext(flag_v) if not (
        hasattr(flag_v, "ndim") and flag_v.ndim >= 1
        and flag_v.shape[-1] == 5) else flag_v)

    acc = None
    ordered = (list(range(bus_idx)) + [None]
               + list(range(bus_idx, len(constraints))))
    for j, ci in enumerate(ordered):
        if ci is None:
            v = bus5
        else:
            v = cvals[ci]
        v_ext = hasattr(v, "ndim") and v.ndim >= 1 and v.shape[-1] == 5
        if v_ext:
            term = jf.emul(v, jnp.broadcast_to(alpha_powers[j], v.shape))
        else:
            term = jf.escalar_mul(
                jnp.broadcast_to(alpha_powers[j], v.shape + (5,)), v)
        acc = term if acc is None else jf.eadd(acc, term)
    return acc


@functools.lru_cache(maxsize=64)
def _round_fn(table: str, n_z: int, base: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    def rnd(cols, eq_table, alpha_powers, alphas_eq, bus_beta, zs_m):
        # z-stack each column: (n_z, half[, 5])
        stacked = []
        for c in cols:
            half = c.shape[0] // 2
            lo, hi = c[:half], c[half:]
            d = jf.sub(hi, lo)
            if c.ndim == 1:
                pts = jf.add(lo[None], jf.mul(d[None],
                                              zs_m[:, None]))
            else:
                pts = jf.add(lo[None], jf.mul(d[None], zs_m[:, None, None]))
            stacked.append(pts.reshape((-1,) + c.shape[1:]))
        from ..air.tables_air import TABLE_AIRS
        n_flat = TABLE_AIRS[table].n_columns
        acc = eval_constraints_monty(table, stacked[:n_flat],
                                     stacked[n_flat:], alpha_powers,
                                     alphas_eq, bus_beta)
        half = cols[0].shape[0] // 2
        acc = acc.reshape(n_z, half, 5)
        weighted = jf.emul(acc, eq_table[None, :half])
        return jf.sum_mod(weighted, axis=1)  # (n_z, 5)

    return aot_jit(rnd)


def air_round_evals(table: str, cols_m, eq_m, alpha_powers_m, alphas_eq_m,
                    bus_beta_m, zs: np.ndarray):
    """One fused device round: monty inputs, returns (n_z, 5) monty."""
    from ..field import jnp_field as jf
    _, jnp = _jax()
    zs_m = jnp.asarray(jf.to_monty_np(np.asarray(zs, np.uint32)))
    fn = _round_fn(table, len(zs), cols_m[0].ndim == 1)
    return fn(cols_m, eq_m, alpha_powers_m, alphas_eq_m, bus_beta_m, zs_m)
