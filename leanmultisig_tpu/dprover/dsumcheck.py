"""Device-resident generic sumcheck engine.

Mirrors sumcheck/np_sumcheck.py round-for-round (z-points {0,2,..,d},
h(1) deduced from the claimed sum, eq factor outside the bare polynomial
with missing_mul_factor bookkeeping — prove.rs:171-279) but every bulk
array is a Montgomery-form device array and no host sync ever happens:
round coefficients stay on device and feed the device challenger.

A `computation` provides:
  degree: int
  dev_eval(cols_at_z, extra) -> (M, 5) monty values, vectorized over rows
    (cols_at_z: list of (M,) base or (M, 5) ext monty device arrays).
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from . import dpoly

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


class DevProductComputation:
    degree = 2


@functools.cache
def _product_round_fn(base_evals: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def round_(evals, weights, sum_):
        half = evals.shape[0] // 2
        x0, x1 = evals[:half], evals[half:]
        y0, y1 = weights[:half], weights[half:]
        if base_evals:
            c0 = jf.escalar_mul(y0, x0)
            c2 = jf.escalar_mul(jf.esub(y1, y0), jf.sub(x1, x0))
        else:
            c0 = jf.emul(y0, x0)
            c2 = jf.emul(jf.esub(y1, y0), jf.esub(x1, x0))
        c0 = jf.sum_mod(c0, 0)
        c2 = jf.sum_mod(c2, 0)
        c1 = jf.esub(jf.esub(sum_, jf.eadd(c0, c0)), c2)
        return jnp.stack([c0, c1, c2])

    return round_


@functools.cache
def _generic_round_fn(comp_key, n_z: int, with_missing: bool, shapes_key):
    """One fused round: z-stack, constraint eval, eq-weight, reduce."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    comp = _COMPUTATIONS[comp_key]

    @aot_jit
    def round_(cols, eq_table, missing, extra):
        half = cols[0].shape[0] // 2
        zs = [0] + list(range(2, n_z + 1))
        evals = []
        for z in zs:
            at_z = []
            for c in cols:
                lo, hi = c[:half], c[half:]
                if z == 0:
                    at_z.append(lo)
                elif z == 1:
                    at_z.append(hi)
                else:
                    d = jf.sub(hi, lo)
                    zm = jnp.asarray(dpoly.monty_const(z))
                    at_z.append(jf.add(lo, jf.mul(d, zm)))
            vals = comp(at_z, extra)  # (half, 5)
            vals = jf.emul(vals, eq_table[:half])
            total = jf.sum_mod(vals, 0)
            if with_missing:
                total = jf.emul(total, missing)
            evals.append(total)
        return jnp.stack(evals)

    return round_


# registry: computations must be hashable keys for the jit cache
_COMPUTATIONS: dict = {}


def register_computation(key, fn):
    _COMPUTATIONS[key] = fn


@functools.cache
def _h1_eq_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
    def h1(sum_, h0, a0):
        import jax.numpy as jnp
        onej = jnp.asarray(one)
        num = jf.esub(sum_, jf.emul(jf.esub(onej, a0), h0))
        return jf.emul(num, jf.einv(a0))

    return h1


@functools.cache
def _post_round_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
    def post(coeffs, r, a0, missing, nxt):
        """-> (new_sum, new_missing) after sampling r (np_sumcheck:192-201)."""
        import jax.numpy as jnp
        onej = jnp.asarray(one)
        # horner inline
        acc = coeffs[-1]
        for i in range(coeffs.shape[0] - 2, -1, -1):
            acc = jf.eadd(jf.emul(acc, r), coeffs[i])
        eq_eval = jf.eadd(jf.emul(jf.esub(onej, a0), jf.esub(onej, r)),
                          jf.emul(a0, r))
        new_sum = jf.emul(acc, eq_eval)
        denom = jf.esub(onej, nxt)
        new_missing = jf.emul(jf.emul(eq_eval, missing), jf.einv(denom))
        return new_sum, new_missing

    return post


@functools.cache
def _fused_product_rounds_fn(k: int, pow_bits: int, base_evals: bool,
                             grind_batch: int):
    """k product-sumcheck rounds (+ optional pow grinding per round) as
    ONE jitted dispatch with the FS sponge threaded through the trace —
    the round/absorb/grind/sample/fold sequence is identical to the
    unfused path, so the transcript is bit-exact (see dgkr fused layer
    for the rationale: tunnel dispatch overhead)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from ..poseidon import perm
    from .dfs import CAPACITY, RATE, WIDTH, _observe_chunks_fn

    def observe(state, flat):
        n = int(flat.shape[0])
        n_chunks = -(-n // RATE)
        if n_chunks * RATE > n:
            flat = jnp.concatenate(
                [flat, jnp.zeros(n_chunks * RATE - n, jnp.uint32)])
        return _observe_chunks_fn(n_chunks)(state, flat)

    big = np.uint32(0xFFFFFFFF)
    mask = np.uint32((1 << pow_bits) - 1) if pow_bits else np.uint32(0)

    def grind(capacity_m):
        """(dfs._grind_fn body — deterministic min witness)."""
        def cond(carry):
            _, hit = carry
            return hit == big

        def body(carry):
            base, _ = carry
            idx = base + jnp.arange(grind_batch, dtype=jnp.uint32)
            states = jnp.zeros((grind_batch, WIDTH), jnp.uint32)
            states = states.at[:, :CAPACITY].set(capacity_m[None, :])
            states = states.at[:, CAPACITY].set(jf.from_u32(idx))
            out = jf.to_u32(perm.permute(states)[:, CAPACITY])
            ok = (out & mask) == 0
            cand = jnp.where(ok, idx, big)
            return base + np.uint32(grind_batch), jnp.min(cand)

        _, witness = jax.lax.while_loop(
            cond, body, (jnp.uint32(0), jnp.asarray(big)))
        return witness

    def product_round(evals, weights, sum_):
        half = evals.shape[0] // 2
        x0, x1 = evals[:half], evals[half:]
        y0, y1 = weights[:half], weights[half:]
        if evals.ndim == 1:
            c0 = jf.escalar_mul(y0, x0)
            c2 = jf.escalar_mul(jf.esub(y1, y0), jf.sub(x1, x0))
        else:
            c0 = jf.emul(y0, x0)
            c2 = jf.emul(jf.esub(y1, y0), jf.esub(x1, x0))
        c0 = jf.sum_mod(c0, 0)
        c2 = jf.sum_mod(c2, 0)
        c1 = jf.esub(jf.esub(sum_, jf.eadd(c0, c0)), c2)
        return jnp.stack([c0, c1, c2])

    @aot_jit
    def run(state, evals, weights, sum_):
        tparts = []
        challenges = []
        for _ in range(k):
            coeffs = product_round(evals, weights, sum_)
            state = observe(state, coeffs.reshape(-1))
            tparts.append(jf.to_u32(coeffs[1:].reshape(-1)))
            if pow_bits:
                witness = grind(state[:CAPACITY])
                state = observe(state, jf.from_u32(witness)[None])
                tparts.append(witness[None])
            r = state[CAPACITY:CAPACITY + EXT]
            challenges.append(r)
            acc = coeffs[-1]
            for i in range(int(coeffs.shape[0]) - 2, -1, -1):
                acc = jf.eadd(jf.emul(acc, r), coeffs[i])
            sum_ = acc
            evals, weights = dpoly.dfold([evals, weights], r)
        return (state, jnp.concatenate(tparts), jnp.stack(challenges),
                evals, weights, sum_)

    return run


def fused_product_rounds(prover_state, evals, weights, sum_, k: int,
                         pow_bits: int, grind_batch: int = 1 << 15):
    """Run k product-sumcheck rounds through the fused kernel, updating
    the DevProverState exactly as the unfused path would."""
    if k == 0:
        _, jnp = _jax()
        return (jnp.zeros((0, EXT), jnp.uint32), evals, weights, sum_)
    state, blob, challenges, evals, weights, sum_ = _fused_product_rounds_fn(
        k, pow_bits, evals.ndim == 1, grind_batch)(
        prover_state.challenger.state, evals, weights, sum_)
    prover_state.challenger.state = state
    prover_state.challenger.rate_fresh = False
    prover_state.transcript.append(blob)
    if pow_bits:
        prover_state.grind_bits_used.extend([pow_bits] * k)
    return challenges, evals, weights, sum_


def sumcheck_prove_dev(columns, comp_key, extra, eq_factor, prover_state,
                       sum_, n_rounds=None, pow_bits=0, missing=None,
                       degree=None):
    """Device mirror of np_sumcheck.sumcheck_prove.

    columns: list of monty device arrays; eq_factor: (n, 5) monty device
    or None; sum_: (5,) monty device. Returns (challenges (k,5) dev,
    folded columns, final sum dev)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    n_vars = columns[0].shape[0].bit_length() - 1
    if n_rounds is None:
        n_rounds = n_vars

    eq_point = None
    eq_table = None
    if eq_factor is not None:
        assert eq_factor.shape[0] == n_vars
        eq_point = eq_factor
        rest = eq_factor[1:]
        eq_table = dpoly.deval_eq(rest)  # (2^(n-1), 5)

    is_product = comp_key == "product" and eq_factor is None

    challenges = []
    round_idx = 0
    with_missing = missing is not None
    for round_no in range(n_rounds):
        # --- waterline: finish the remaining rounds on host -------------
        from .dtail import below
        if below(int(columns[0].shape[0])):
            return _finish_rounds_host(
                columns, comp_key, extra, eq_point, eq_table, prover_state,
                sum_, n_rounds - round_no, pow_bits, missing, degree,
                challenges, round_idx)
        if is_product:
            base_evals = columns[0].ndim == 1
            coeffs = _product_round_fn(base_evals)(columns[0], columns[1],
                                                   sum_)
            prover_state.add_sumcheck_polynomial(coeffs)
            prover_state.pow_grinding(pow_bits)
            r = prover_state.sample()
            challenges.append(r)
            sum_ = dpoly.dhorner(coeffs, r)
            columns = dpoly.dfold(columns, r)
            continue

        shapes_key = tuple((tuple(c.shape), c.ndim) for c in columns)
        h_evals = _generic_round_fn(comp_key, degree, with_missing,
                                    shapes_key)(
            list(columns), eq_table,
            missing if with_missing else jnp.zeros(EXT, jnp.uint32), extra)

        a0 = eq_point[round_idx]
        h1 = _h1_eq_fn()(sum_, h_evals[0], a0)
        zs = [0, 1] + list(range(2, degree + 1))
        ys = jnp.concatenate([h_evals[:1], h1[None], h_evals[1:]])
        coeffs = dpoly.dlagrange_interpolation(zs, ys)

        prover_state.add_sumcheck_polynomial(coeffs, a0)
        prover_state.pow_grinding(pow_bits)
        r = prover_state.sample()
        challenges.append(r)

        nxt = (eq_point[round_idx + 1] if round_idx + 1 < n_vars
               else jnp.zeros(EXT, jnp.uint32))
        cur_missing = (missing if missing is not None
                       else jnp.asarray(dpoly.eone_m()))
        sum_, missing = _post_round_fn()(coeffs, r, a0, cur_missing, nxt)
        with_missing = True
        if eq_table is not None and eq_table.shape[0] > 1:
            eq_table = eq_table[:eq_table.shape[0] // 2]
        columns = dpoly.dfold(columns, r)
        round_idx += 1

    challenges = (jnp.stack(challenges) if challenges
                  else jnp.zeros((0, EXT), jnp.uint32))
    return challenges, columns, sum_


def _host_computation(comp_key: str, extra_h):
    """Host np computation matching a device comp_key registration."""
    from ..sumcheck.np_sumcheck import ProductComputation
    if comp_key == "product":
        return ProductComputation(), None
    if comp_key == "gkr_quotient":
        from ..protocols.gkr import _QuotientLayerComputation
        return _QuotientLayerComputation(extra_h), None
    raise KeyError(comp_key)


def _finish_rounds_host(columns, comp_key, extra, eq_point, eq_table,
                        prover_state, sum_, remaining, pow_bits, missing,
                        degree, dev_challenges, round_idx):
    """Fetch the sub-waterline sumcheck state and run the remaining
    rounds through np_sumcheck (bit-exact; see dtail docstring). Results
    are re-uploaded so callers keep device semantics."""
    _, jnp = _jax()
    from ..sumcheck.np_sumcheck import sumcheck_prove
    from .dtail import begin_tail, end_tail, fetch_many, upload

    flat = list(columns) + [sum_]
    if extra is not None:
        flat.append(extra)
    if eq_point is not None:
        flat += [eq_point[round_idx:], eq_table]
    if missing is not None:
        flat.append(missing)
    vals = fetch_many(flat)
    cols_h = vals[:len(columns)]
    pos = len(columns)
    sum_h = vals[pos]
    pos += 1
    extra_h = None
    if extra is not None:
        extra_h = vals[pos]
        pos += 1
    comp_h, _ = _host_computation(comp_key, extra_h)
    eqf_h = None
    eqt_h = None
    if eq_point is not None:
        eqf_h = list(vals[pos])
        eqt_h = vals[pos + 1]
        pos += 2
    missing_h = vals[pos] if missing is not None else None

    hp = begin_tail(prover_state)
    ch_h, cols_out_h, sum_out_h = sumcheck_prove(
        cols_h, comp_h, extra_h, eqf_h, hp, sum_h, n_rounds=remaining,
        pow_bits=pow_bits, missing_mul_factor=missing_h, eq_table=eqt_h)
    end_tail(prover_state, hp)

    challenges = list(dev_challenges) + [upload(c) for c in ch_h]
    challenges = (jnp.stack(challenges) if challenges
                  else jnp.zeros((0, EXT), jnp.uint32))
    return challenges, [upload(c) for c in cols_out_h], upload(sum_out_h)
