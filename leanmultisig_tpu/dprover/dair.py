"""Device-resident batched AIR sumcheck.

Sessions mirror protocols/air_sumcheck.py (back-loaded batching,
LSB-first folds realized as MSB folds over bit-reversed columns) with
all columns resident on device.

The poseidon16 AIR (109 columns, degree 10, 100 constraints) is NOT
evaluated through the flat symbolic DAG (which blows up XLA compile —
device/air.py:15-19); it gets a STRUCTURED evaluator here: the state
flows as an (M, 16[,5]) tensor, full-round MDS applications are integer
matrix contractions (lazy 16-bit split, one Montgomery reduction per
element — MXU-friendly), and the 20 sparse partial rounds run as a
Python-unrolled recurrence with per-round constants
(tables/poseidon_16/mod.rs:385-449, air/tables_air.py:273-375).

Constraint order (and thus alpha-power weighting) is identical to the
host ConstraintFolder; tests assert bit-equality.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils.aot_cache import aot_jit

from ..air.tables_air import TABLE_AIRS
from ..field.constants import P
from ..poseidon.sparse import sparse_constants
from ..vm import tables as T
from ..vm.isa import LOGUP_PRECOMPILE_DOMAINSEP
from . import dpoly

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _monty_mat(m) -> np.ndarray:
    m = np.asarray(m, np.uint64)
    return ((m << np.uint64(32)) % np.uint64(P)).astype(np.uint32)


# ---------------------------------------------------------------------------
# Structured poseidon16 constraint evaluation
# ---------------------------------------------------------------------------


def _dot_int_small(state2, mat_int):
    """(M, 16) monty x integer matrix (entries small, row sums < 2^17):
    lazy 16-bit split, one reduction per output (poseidon/perm.py:_mds)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    matT = jnp.asarray(np.asarray(mat_int, np.uint32).T)  # y = x @ m^T
    lo = state2 & np.uint32(0xFFFF)
    hi = state2 >> 16
    s_lo = jax.lax.dot_general(lo, matT, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.uint32)
    s_hi = jax.lax.dot_general(hi, matT, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.uint32)
    c48 = jnp.asarray(np.uint32((1 << 48) % P))
    return jf.add(jf.mul(s_hi, c48), s_lo)


class _Alg:
    """Base/ext-generic monty algebra over (M,)/(M,5) jnp arrays."""

    def __init__(self):
        import jax.numpy as jnp
        from ..field import jnp_field as jf
        self.jnp = jnp
        self.jf = jf

    def is_e(self, x):
        return x.ndim >= 1 and x.shape[-1] == EXT and x.ndim > 1

    def lift(self, x):
        return x if self.is_e(x) else self.jf.efrom_base(x)

    def c(self, v: int):
        return self.jnp.asarray(dpoly.monty_const(v))

    def add(self, a, b):
        if self.is_e(a) != self.is_e(b):
            a, b = self.lift(a), self.lift(b)
        return self.jf.add(a, b)

    def sub(self, a, b):
        if self.is_e(a) != self.is_e(b):
            a, b = self.lift(a), self.lift(b)
        return self.jf.sub(a, b)

    def mul(self, a, b):
        ae, be = self.is_e(a), self.is_e(b)
        if ae and be:
            return self.jf.emul(a, b)
        if ae:
            return self.jf.escalar_mul(a, b)
        if be:
            return self.jf.escalar_mul(b, a)
        return self.jf.mul(a, b)

    def addc(self, a, v: int):
        """a + const (base-side constant)."""
        if self.is_e(a):
            out = a.at[..., 0].set(self.jf.add(a[..., 0], self.c(v)))
            return out
        return self.jf.add(a, self.c(v))

    def mulc(self, a, v: int):
        return self.jf.mul(a, self.c(v)) if not self.is_e(a) \
            else self.jf.escalar_mul(a, self.jnp.broadcast_to(
                self.c(v), a.shape[:-1]))

    def cube(self, a):
        return self.mul(self.mul(a, a), a)

    def neg(self, a):
        from ..field import jnp_field as jf
        return jf.neg(a)


def _state_mds(alg: _Alg, state, mat):
    """state: (M,16) base or (M,16,5) ext; integer matrix contraction."""
    jax, jnp = _jax()
    if state.ndim == 2:
        return _dot_int_small(state, mat)
    # ext: contract each coordinate independently
    s = jnp.moveaxis(state, 2, 1).reshape(state.shape[0] * EXT, 16)
    out = _dot_int_small(s, mat)
    return jnp.moveaxis(out.reshape(state.shape[0], EXT, 16), 1, 2)


def _row_dot(state, consts_row):
    """sum_j consts[j] * state[:, j] for arbitrary field constants.
    state: (M, W) base or (M, W, 5) ext; one batched multiply + tree sum."""
    _, jnp = _jax()
    from ..field import jnp_field as jf
    row_m = jnp.asarray(_monty_mat(consts_row))  # (W,)
    if state.ndim == 2:
        prods = jf.mul(state, row_m[None, :])
    else:
        prods = jf.mul(state, row_m[None, :, None])
    return jf.sum_mod(prods, 1)


def eval_p16_constraints_monty(flat, alpha_powers, alphas_eq, bus_beta):
    """All-constraint alpha-weighted accumulator for the poseidon16 AIR.

    flat: 109 monty device columns, each (M,) base or (M, 5) ext;
    returns (M, 5). Bit-identical to air/tables_air.eval_poseidon16_air
    through the host ConstraintFolder."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    alg = _Alg()
    k = sparse_constants()
    is_ext = flat[0].ndim == 2
    m_rows = flat[0].shape[0]

    acc_terms = []
    idx_counter = [0]

    def emit(x):
        """alpha_powers[i] * x (ext result)."""
        i = idx_counter[0]
        idx_counter[0] += 1
        a = alpha_powers[i]
        if alg.is_e(x):
            return jf.emul(x, jnp.broadcast_to(a, x.shape))
        return jf.escalar_mul(jnp.broadcast_to(a, x.shape + (EXT,)), x)

    flag_active = flat[T.P16_COL_FLAG]
    index_b = flat[T.P16_COL_INDEX_INPUT_RIGHT]
    index_res = flat[T.P16_COL_INDEX_INPUT_RES]
    flag_half = flat[T.P16_COL_FLAG_HALF_OUTPUT]
    flag_hard = flat[T.P16_COL_FLAG_HARDCODED_LEFT]
    offset_hard = flat[T.P16_COL_OFFSET_LEFT_HARDCODED]
    eff_left_first = flat[T.P16_COL_EFFECTIVE_INDEX_LEFT_FIRST]
    eff_left_second = flat[T.P16_COL_EFFECTIVE_INDEX_LEFT_SECOND]
    flag_permute = flat[T.P16_COL_FLAG_PERMUTE]

    def stack16(cols):
        return jnp.stack(cols, axis=1)  # (M, 16[,5])

    inputs = stack16([flat[T.P16_COL_INPUT_START + i] for i in range(16)])
    beginning = [stack16([flat[T.P16_COL_BEGINNING_FULL + 16 * r + i]
                          for i in range(16)])
                 for r in range(T.P16_HALF_INITIAL_FULL)]
    partial = [flat[T.P16_COL_PARTIAL + r] for r in range(T.P16_PARTIAL)]
    ending = [stack16([flat[T.P16_COL_ENDING_FULL + 16 * r + i]
                       for i in range(16)])
              for r in range(T.P16_HALF_FINAL_FULL - 1)]
    outputs_left = [flat[T.P16_COL_OUTPUT_LEFT + i] for i in range(8)]
    outputs_right = [flat[T.P16_COL_OUTPUT_RIGHT + i] for i in range(8)]

    # --- bus constraint (index 0) ------------------------------------------
    from ..vm.isa import (POSEIDON_HALF_OUTPUT_SHIFT,
                          POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT,
                          POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT,
                          POSEIDON_PERMUTE_SHIFT)
    pre_data = alg.addc(
        alg.add(alg.mulc(flag_half, POSEIDON_HALF_OUTPUT_SHIFT),
                alg.add(alg.add(
                    alg.mulc(flag_hard,
                             POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT),
                    alg.mulc(alg.mul(flag_hard, offset_hard),
                             POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT)),
                    alg.mulc(flag_permute, POSEIDON_PERMUTE_SHIFT))), 1)
    one_minus_hard = alg.neg(alg.addc(flag_hard, P - 1))
    index_a = alg.sub(eff_left_second,
                      alg.mulc(one_minus_hard, T.HALF_DIGEST_LEN))

    fp5 = None
    for i, d in enumerate([pre_data, index_a, index_b, index_res]):
        if alg.is_e(d):
            term = jf.emul(d, jnp.broadcast_to(alphas_eq[i], d.shape))
        else:
            term = jf.escalar_mul(
                jnp.broadcast_to(alphas_eq[i], d.shape + (EXT,)), d)
        fp5 = term if fp5 is None else jf.eadd(fp5, term)
    ds = jf.escalar_mul(alphas_eq[-1],
                        jnp.asarray(dpoly.monty_const(
                            LOGUP_PRECOMPILE_DOMAINSEP)))
    fp5 = jf.eadd(fp5, jnp.broadcast_to(ds, fp5.shape))
    bus5 = jf.emul(fp5, jnp.broadcast_to(bus_beta, fp5.shape))
    bus5 = jf.eadd(bus5, alg.lift(flag_active))
    acc_terms.append(emit(bus5))

    def assert_zero(x):
        acc_terms.append(emit(x))

    def assert_bool(x):
        assert_zero(alg.sub(alg.mul(x, x), x))

    assert_bool(flag_active)
    assert_bool(flag_half)
    assert_bool(flag_hard)
    assert_bool(flag_permute)
    assert_zero(alg.mul(flag_permute, alg.add(flag_half, flag_hard)))
    assert_zero(alg.mul(flag_hard, alg.sub(offset_hard, eff_left_first)))
    assert_zero(alg.mul(one_minus_hard, alg.sub(index_a, eff_left_first)))

    mds = k["mds"]

    def add_rc_m(state, rc_m):
        """rc_m: (16,) monty device/np array."""
        if state.ndim == 2:
            return jf.add(state, rc_m[None, :])
        return state.at[..., 0].set(jf.add(state[..., 0], rc_m[None, :]))

    def cube_state(state):
        return alg.mul(alg.mul(state, state), state) if state.ndim == 2 \
            else jf.emul(jf.emul(state, state), state)

    acc0 = jnp.zeros((m_rows, EXT), jnp.uint32)

    # --- sparse partial-round block as ONE lax.scan over 20 rounds -------
    # (runs first: its output feeds the ending full block below; every
    # full block continues from its WITNESSED post, so block inputs are
    # known without running earlier blocks.)
    state = add_rc_m(beginning[-1],
                     jnp.asarray(_monty_mat(k["first_round_constants"])))
    m_i = k["m_i"]
    st = jnp.stack([_row_dot(state, m_i[i]) for i in range(16)], axis=1)
    first_rows_m = _monty_mat(k["first_rows"])            # (20, 16)
    v_m = _monty_mat(np.asarray(k["v"])[:, :15])          # (20, 15)
    scalar_rc_m = _monty_mat(np.concatenate(
        [np.asarray(k["scalar_round_constants"], np.uint32),
         np.zeros(1, np.uint32)]))                        # (20,) last = +0
    partial_stack = jnp.stack(partial)                    # (20, M[,5])
    partial_alpha = alpha_powers[40:60]                   # (20, 5)

    def partial_round(carry, xs):
        st, acc = carry
        pcol, frow, vrow, src, apw_r = xs
        s0 = alg.cube(st[:, 0])
        diff = alg.sub(s0, pcol)
        if diff.ndim == 1:
            term = jf.escalar_mul(
                jnp.broadcast_to(apw_r, diff.shape + (EXT,)), diff)
        else:
            term = jf.emul(diff, jnp.broadcast_to(apw_r, diff.shape))
        acc = jf.eadd(acc, term)
        s0 = pcol
        if s0.ndim == 1 and st.ndim == 3:
            s0 = alg.lift(s0)
        if s0.ndim == 1:
            s0 = jf.add(s0, src)
        else:
            s0 = s0.at[..., 0].set(jf.add(s0[..., 0], src))
        rest = st[:, 1:]
        full = jnp.concatenate([s0[:, None], rest], axis=1)
        if full.ndim == 2:
            new_s0 = jf.sum_mod(jf.mul(full, frow[None, :]), 1)
            upd = jf.mul(jnp.broadcast_to(s0[:, None], rest.shape),
                         vrow[None, :])
        else:
            new_s0 = jf.sum_mod(jf.mul(full, frow[None, :, None]), 1)
            upd = jf.mul(jnp.broadcast_to(s0[:, None], rest.shape),
                         vrow[None, :, None])
        st = jnp.concatenate([new_s0[:, None], jf.add(rest, upd)], axis=1)
        return (st, acc), None

    (st, acc_partial), _ = jax.lax.scan(
        partial_round, (st, acc0),
        (partial_stack, jnp.asarray(first_rows_m), jnp.asarray(v_m),
         jnp.asarray(scalar_rc_m), partial_alpha),
        length=T.P16_PARTIAL)

    # --- the 3 posted full 2-round blocks as ONE lax.scan ----------------
    # inputs:  [committed inputs, beginning[0], sparse-chain output]
    # posts:   [beginning[0],     beginning[1], ending[0]]
    # alpha slices in the ORIGINAL emit order: 8..39 (beginning), 60..75
    # (ending); the sparse constraints above took 40..59.
    init_c = k["initial_constants"]
    fin_c = k["final_constants"]
    if st.ndim == 3 and inputs.ndim == 2:
        raise AssertionError("mixed base/ext state")  # cannot happen
    block_inputs = jnp.stack([inputs, beginning[0], st])
    block_posts = jnp.stack([beginning[0], beginning[1], ending[0]])
    rc1_all = np.stack([_monty_mat(init_c[0]), _monty_mat(init_c[2]),
                        _monty_mat(fin_c[0])])
    rc2_all = np.stack([_monty_mat(init_c[1]), _monty_mat(init_c[3]),
                        _monty_mat(fin_c[1])])
    full_alpha = jnp.stack([alpha_powers[8:24], alpha_powers[24:40],
                            alpha_powers[60:76]])  # (3, 16, 5)

    def full_block(acc, xs):
        state, post, rc1, rc2, apw_block = xs
        state = _state_mds(alg, cube_state(add_rc_m(state, rc1)), mds)
        state = _state_mds(alg, cube_state(add_rc_m(state, rc2)), mds)
        diff = jf.sub(state, post)  # (M, 16[,5])
        if diff.ndim == 2:
            terms = jf.escalar_mul(
                jnp.broadcast_to(apw_block[None], diff.shape + (EXT,)),
                diff)
        else:
            terms = jf.emul(diff, jnp.broadcast_to(apw_block[None],
                                                   diff.shape))
        return jf.eadd(acc, jf.sum_mod(terms, 1)), None

    acc_full, _ = jax.lax.scan(
        full_block, acc0,
        (block_inputs, block_posts, jnp.asarray(rc1_all),
         jnp.asarray(rc2_all), full_alpha), length=3)

    # --- final 2 full rounds (no posts) + output constraints -------------
    state = ending[0] if ending else block_posts[2]
    last = T.P16_HALF_FINAL_FULL - 1
    state = _state_mds(alg, cube_state(add_rc_m(
        state, jnp.asarray(_monty_mat(fin_c[2 * last])))), mds)
    state = _state_mds(alg, cube_state(add_rc_m(
        state, jnp.asarray(_monty_mat(fin_c[2 * last + 1])))), mds)

    # output constraints take alpha powers 76..99 (the scans above consumed
    # 8..39 beginning, 40..59 partial, 60..75 ending in the host's order)
    idx_counter[0] = 76
    acc_terms.append(acc_partial)
    acc_terms.append(acc_full)

    not_permute = alg.neg(alg.addc(flag_permute, P - 1))
    compression_last4 = alg.sub(not_permute, flag_half)
    for i in range(8):
        gate = not_permute if i < T.HALF_DIGEST_LEN else compression_last4
        assert_zero(alg.mul(
            gate, alg.sub(alg.add(state[:, i], inputs[:, i]),
                          outputs_left[i])))
        assert_zero(alg.mul(flag_permute,
                            alg.sub(state[:, i], outputs_left[i])))
        assert_zero(alg.mul(flag_permute,
                            alg.sub(state[:, i + 8], outputs_right[i])))

    assert idx_counter[0] == TABLE_AIRS[T.POSEIDON16].n_constraints, \
        idx_counter[0]
    total = acc_terms[0]
    for t in acc_terms[1:]:
        total = jf.eadd(total, t)
    return total


def eval_constraints_dispatch(table, flat, shift, alpha_powers, alphas_eq,
                              bus_beta):
    if table == T.POSEIDON16:
        return eval_p16_constraints_monty(flat, alpha_powers, alphas_eq,
                                          bus_beta)
    from ..device.air import eval_constraints_monty
    return eval_constraints_monty(table, flat, shift, alpha_powers,
                                  alphas_eq, bus_beta)


# ---------------------------------------------------------------------------
# Device AIR sumcheck sessions
# ---------------------------------------------------------------------------


@functools.cache
def _air_round_fn(table: str, n_z: int, half: int, base: bool):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    n_flat = TABLE_AIRS[table].n_columns
    zs = [0] + list(range(2, n_z + 1))
    xs = [0, 1] + list(range(2, n_z + 1))

    n_zs = len(zs)
    zs_m = np.array([dpoly.monty_const(z) for z in zs], np.uint32)

    @aot_jit
    def rnd(cols, eq_table, alpha_powers, alphas_eq, bus_beta, missing,
            sum_, eq_alpha):
        one = jnp.asarray(dpoly.eone_m())
        # z-stack along the row axis: ONE constraint pass over n_z*half
        # rows (host compute_bare_round_poly does the same)
        zc = jnp.asarray(zs_m)
        stacked = []
        for c in cols:
            lo, hi = c[:half], c[half:]
            d = jf.sub(hi, lo)
            if c.ndim == 1:
                pts = jf.add(lo[None], jf.mul(d[None], zc[:, None]))
            else:
                pts = jf.add(lo[None], jf.mul(d[None], zc[:, None, None]))
            stacked.append(pts.reshape((n_zs * half,) + c.shape[1:]))
        acc = eval_constraints_dispatch(table, stacked[:n_flat],
                                        stacked[n_flat:], alpha_powers,
                                        alphas_eq, bus_beta)
        acc = acc.reshape(n_zs, half, EXT)
        weighted = jf.emul(acc, eq_table[None, :half])
        sums = jf.sum_mod(weighted, 1)  # (n_z, 5)
        totals = [jf.emul(sums[i], missing) for i in range(n_zs)]

        num = jf.esub(sum_, jf.emul(jf.esub(one, eq_alpha), totals[0]))
        p_at_1 = jf.emul(num, jf.einv(eq_alpha))
        ys = jnp.stack([totals[0], p_at_1] + totals[1:])
        # lagrange over xs with the cached inverse Vandermonde
        w = dpoly._inv_vandermonde_monty(tuple(xs))
        rows = []
        for i in range(len(xs)):
            a = None
            for j in range(len(xs)):
                t = jf.escalar_mul(ys[j], jnp.asarray(w[i][j]))
                a = t if a is None else jf.eadd(a, t)
            rows.append(a)
        return jnp.stack(rows)

    return rnd


@functools.cache
def _process_challenge_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
    def process(bare_coeffs, r, eq_alpha, sum_, missing):
        onej = jnp.asarray(one)
        eq_eval = jf.eadd(
            jf.emul(jf.esub(onej, eq_alpha), jf.esub(onej, r)),
            jf.emul(eq_alpha, r))
        acc = bare_coeffs[-1]
        for i in range(bare_coeffs.shape[0] - 2, -1, -1):
            acc = jf.eadd(jf.emul(acc, r), bare_coeffs[i])
        return jf.emul(acc, eq_eval), jf.emul(missing, eq_eval)

    return process


class DevAirSession:
    def __init__(self, table: str, flat_and_shift_cols: list, eq_factor,
                 sum_, alpha_powers, alphas_eq, bus_beta):
        """flat_and_shift_cols: base monty device columns (natural order);
        eq_factor: (n, 5) monty device (GKR suffix, natural MSB-first)."""
        self.table = table
        self.air = TABLE_AIRS[table]
        self.n_vars = flat_and_shift_cols[0].shape[0].bit_length() - 1
        self.cols = [dpoly.dbit_reverse(c) for c in flat_and_shift_cols]
        self.eq_y = eq_factor[::-1]
        self.sum = sum_
        _, jnp = _jax()
        self.missing = jnp.asarray(dpoly.eone_m())
        self.alpha_powers = alpha_powers
        self.alphas_eq = alphas_eq
        self.bus_beta = bus_beta
        self.rounds_done = 0

    def initial_n_vars(self) -> int:
        return self.n_vars

    def eq_alpha(self):
        return self.eq_y[self.rounds_done]

    def compute_bare_round_poly(self):
        half = self.cols[0].shape[0] // 2
        rest = self.eq_y[self.rounds_done + 1:]
        eq_table = dpoly.deval_eq(rest)
        fn = _air_round_fn(self.table, self.air.degree, half,
                           self.cols[0].ndim == 1)
        return fn(list(self.cols), eq_table, self.alpha_powers,
                  self.alphas_eq, self.bus_beta, self.missing, self.sum,
                  self.eq_alpha())

    def process_challenge(self, challenge, bare_coeffs) -> None:
        self.sum, self.missing = _process_challenge_fn()(
            bare_coeffs, challenge, self.eq_alpha(), self.sum, self.missing)
        self.cols = dpoly.dfold(self.cols, challenge)
        self.rounds_done += 1

    def final_column_evals(self):
        _, jnp = _jax()
        from ..field import jnp_field as jf
        rows = []
        for c in self.cols:
            rows.append(jf.efrom_base(c)[0] if c.ndim == 1 else c[0])
        return jnp.stack(rows)


@functools.cache
def _combine_add_fn(k: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def comb(combined, full, scale):
        out = []
        for i in range(combined.shape[0]):
            if i < k:
                out.append(jf.eadd(combined[i], jf.emul(scale, full[i])))
            else:
                out.append(combined[i])
        return jnp.stack(out)

    return comb


@functools.cache
def _add_scaled_sum_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def f(combined, scale, s):
        return combined.at[1].set(jf.eadd(combined[1], jf.emul(scale, s)))

    return f


@functools.cache
def _emul2_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.emul)


@functools.cache
def _fused_air_phase_fn(n_rounds: int, max_full_degree: int,
                        sessions_meta: tuple, absorb_final: bool):
    """The WHOLE batched AIR sumcheck — every round of every session,
    the combined-poly absorption, sampling, folds, and (optionally) the
    final column-eval absorption — as ONE jitted dispatch with the FS
    sponge threaded through the trace (same rationale as dgkr's fused
    layer: per-dispatch tunnel overhead dominated the phase; the
    round/absorb/sample sequence is identical to the unfused path, so
    the transcript is bit-exact).

    sessions_meta: tuple of (table, n_vars, degree, n_cols_all)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from .dfs import (CAPACITY, RATE, _observe_chunks_fn,
                      dexpand_bare_to_full)

    def observe(state, flat):
        n = int(flat.shape[0])
        n_chunks = -(-n // RATE)
        if n_chunks * RATE > n:
            flat = jnp.concatenate(
                [flat, jnp.zeros(n_chunks * RATE - n, jnp.uint32)])
        return _observe_chunks_fn(n_chunks)(state, flat)

    tables_xs = {table: [0, 1] + list(range(2, degree + 1))
                 for table, _, degree, _ in sessions_meta}

    @aot_jit
    def run(state, eta, alpha_powers, alphas_eq, bus_beta, all_cols,
            eq_ys, sums):
        one = jnp.asarray(dpoly.eone_m())
        eta_powers = [one]
        for _ in range(1, len(sessions_meta)):
            eta_powers.append(jf.emul(eta_powers[-1], eta))

        cols = [list(cs) for cs in all_cols]
        sums = list(sums)
        missing = [one for _ in sessions_meta]
        k_mult = [one for _ in sessions_meta]
        tparts = []
        challenges = []

        for round_ in range(n_rounds):
            combined = jnp.zeros((max_full_degree + 1, EXT), jnp.uint32)
            bares = [None] * len(sessions_meta)
            for idx, (table, n_vars, degree, n_cols) in \
                    enumerate(sessions_meta):
                join_round = n_rounds - n_vars
                scale = jf.emul(eta_powers[idx], k_mult[idx])
                if round_ < join_round:
                    combined = combined.at[1].set(
                        jf.eadd(combined[1], jf.emul(scale, sums[idx])))
                    continue
                sr = round_ - join_round
                eq_alpha = eq_ys[idx][sr]
                rest = eq_ys[idx][sr + 1:]
                eq_table = (dpoly.deval_eq(rest) if rest.shape[0]
                            else one[None, :])
                half = cols[idx][0].shape[0] // 2
                zs = [0] + list(range(2, degree + 1))
                n_zs = len(zs)
                zs_m = jnp.asarray(np.array(
                    [dpoly.monty_const(z) for z in zs], np.uint32))
                stacked = []
                for c in cols[idx]:
                    lo, hi = c[:half], c[half:]
                    d = jf.sub(hi, lo)
                    if c.ndim == 1:
                        pts = jf.add(lo[None], jf.mul(d[None],
                                                      zs_m[:, None]))
                    else:
                        pts = jf.add(lo[None],
                                     jf.mul(d[None], zs_m[:, None, None]))
                    stacked.append(pts.reshape((n_zs * half,)
                                               + c.shape[1:]))
                n_flat = TABLE_AIRS[table].n_columns
                acc = eval_constraints_dispatch(
                    table, stacked[:n_flat], stacked[n_flat:],
                    alpha_powers, alphas_eq, bus_beta)
                acc = acc.reshape(n_zs, half, EXT)
                weighted = jf.emul(acc, eq_table[None, :half])
                sums_z = jf.sum_mod(weighted, 1)  # (n_zs, 5)
                totals = [jf.emul(sums_z[i], missing[idx])
                          for i in range(n_zs)]
                num = jf.esub(sums[idx],
                              jf.emul(jf.esub(one, eq_alpha), totals[0]))
                p_at_1 = jf.emul(num, jf.einv(eq_alpha))
                ys = jnp.stack([totals[0], p_at_1] + totals[1:])
                bare = dpoly.dlagrange_interpolation(tables_xs[table], ys)
                bares[idx] = bare
                full = dexpand_bare_to_full(bare, eq_alpha)
                kf = int(full.shape[0])
                combined = combined.at[:kf].set(
                    jf.eadd(combined[:kf],
                            jf.emul(jnp.broadcast_to(scale, full.shape),
                                    full)))

            state = observe(state, combined.reshape(-1))
            tparts.append(jf.to_u32(combined[1:].reshape(-1)))
            r = state[CAPACITY:CAPACITY + EXT]
            challenges.append(r)

            for idx, (table, n_vars, degree, n_cols) in \
                    enumerate(sessions_meta):
                join_round = n_rounds - n_vars
                if round_ < join_round:
                    k_mult[idx] = jf.emul(k_mult[idx], r)
                    continue
                sr = round_ - join_round
                eq_alpha = eq_ys[idx][sr]
                bare = bares[idx]
                acc = bare[-1]
                for i in range(int(bare.shape[0]) - 2, -1, -1):
                    acc = jf.eadd(jf.emul(acc, r), bare[i])
                eq_eval = jf.eadd(
                    jf.emul(jf.esub(one, eq_alpha), jf.esub(one, r)),
                    jf.emul(eq_alpha, r))
                sums[idx] = jf.emul(acc, eq_eval)
                missing[idx] = jf.emul(missing[idx], eq_eval)
                cols[idx] = dpoly.dfold(cols[idx], r)

        final_rows = []
        for idx in range(len(sessions_meta)):
            rows = jnp.stack(
                [jf.efrom_base(c)[0] if c.ndim == 1 else c[0]
                 for c in cols[idx]])
            final_rows.append(rows)
            if absorb_final:
                state = observe(state, rows.reshape(-1))
                tparts.append(jf.to_u32(rows.reshape(-1)))

        return (state, jnp.concatenate(tparts), jnp.stack(challenges),
                final_rows)

    return run


def prove_batched_air_sumcheck_dev(prover_state, sessions: list, eta):
    """(air_sumcheck.rs:636-681); mirrors the host combiner. Absorbs the
    final column evals per session (in session order) and returns
    (challenge stack (n_rounds, 5), [per-session (n_cols, 5) final
    column evals]) — all monty device."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    from .dfs import dexpand_bare_to_full
    n_rounds = max(s.initial_n_vars() for s in sessions)
    max_full_degree = max(s.air.degree + 1 for s in sessions)

    import os
    from .dshard import use_fused
    # Whole-phase fusion produces an XLA graph that takes >25 min to
    # compile (16 unrolled rounds x 3 inlined constraint evaluators) —
    # opt-in until reworked at per-round granularity.
    if use_fused() and os.environ.get("LMS_FUSE_AIR"):
        sessions_meta = tuple(
            (s.table, s.initial_n_vars(), s.air.degree, len(s.cols))
            for s in sessions)
        state, blob, challenge_stack, final_rows = _fused_air_phase_fn(
            n_rounds, max_full_degree, sessions_meta, True)(
            prover_state.challenger.state, eta,
            sessions[0].alpha_powers, sessions[0].alphas_eq,
            sessions[0].bus_beta,
            [s.cols for s in sessions],
            [s.eq_y for s in sessions],
            [s.sum for s in sessions])
        prover_state.challenger.state = state
        # the kernel's last FS op is an observe (combined poly, or the
        # final column evals when absorb_final) -> the rate is fresh
        prover_state.challenger.rate_fresh = True
        prover_state.transcript.append(blob)
        return challenge_stack, final_rows

    eta_powers = [jnp.asarray(dpoly.eone_m())]
    for _ in range(1, len(sessions)):
        eta_powers.append(_emul2_fn()(eta_powers[-1], eta))

    challenges = []
    k = [jnp.asarray(dpoly.eone_m()) for _ in sessions]

    for round_ in range(n_rounds):
        from .dtail import below
        if below(1 << (n_rounds - round_ - 1)):
            # every remaining round works on sub-waterline halves:
            # finish the whole phase on host (dtail docstring)
            return _finish_air_host(prover_state, sessions, eta_powers, k,
                                    challenges, round_, n_rounds,
                                    max_full_degree)
        combined = jnp.zeros((max_full_degree + 1, EXT), jnp.uint32)
        bare_polys = [None] * len(sessions)
        for idx, session in enumerate(sessions):
            join_round = n_rounds - session.initial_n_vars()
            scale = _emul2_fn()(eta_powers[idx], k[idx])
            if round_ < join_round:
                combined = _add_scaled_sum_fn()(combined, scale,
                                                session.sum)
            else:
                bare = session.compute_bare_round_poly()
                full = dexpand_bare_to_full(bare, session.eq_alpha())
                combined = _combine_add_fn(int(full.shape[0]))(
                    combined, full, scale)
                bare_polys[idx] = bare

        prover_state.add_sumcheck_polynomial(combined)
        challenge = prover_state.sample()
        challenges.append(challenge)

        for idx, session in enumerate(sessions):
            join_round = n_rounds - session.initial_n_vars()
            if round_ < join_round:
                k[idx] = _emul2_fn()(k[idx], challenge)
            else:
                session.process_challenge(challenge, bare_polys[idx])

    final_rows = []
    for session in sessions:
        rows = session.final_column_evals()
        prover_state.add_extension_scalars(rows)
        final_rows.append(rows)
    return jnp.stack(challenges), final_rows


def _finish_air_host(prover_state, sessions, eta_powers, k, dev_challenges,
                     start_round, n_rounds, max_full_degree):
    """Fetch every session's (small) state and run the remaining batched
    AIR rounds + final column-eval absorption through the host
    implementation (protocols/air_sumcheck). Bit-exact; results are
    re-uploaded so dprove keeps device semantics."""
    _, jnp = _jax()
    from ..air.tables_air import ExtraDataForBuses
    from ..field import np_field as nf
    from ..fs.prover import expand_bare_to_full
    from ..protocols.air_sumcheck import AirSumcheckSession
    from .dtail import begin_tail, end_tail, fetch_many, upload

    # one overlapped batch for EVERYTHING the host continuation needs
    flat = [sessions[0].alpha_powers, sessions[0].alphas_eq,
            sessions[0].bus_beta]
    for s in sessions:
        flat += list(s.cols) + [s.eq_y, s.sum, s.missing]
    flat += list(eta_powers) + list(k)
    vals = fetch_many(flat)
    alpha_powers_h, alphas_eq_h, bus_beta_h = vals[:3]
    pos = 3
    extra = ExtraDataForBuses(alphas_eq_h, bus_beta_h)

    host_sessions = []
    for s in sessions:
        hs = AirSumcheckSession.__new__(AirSumcheckSession)
        hs.table = s.table
        hs.air = s.air
        hs.n_vars = s.n_vars
        n_c = len(s.cols)
        hs.cols = vals[pos:pos + n_c]
        hs.eq_y = vals[pos + n_c]
        hs.sum = vals[pos + n_c + 1]
        hs.missing = vals[pos + n_c + 2]
        pos += n_c + 3
        hs.alpha_powers = alpha_powers_h
        hs.extra_data = extra
        hs.rounds_done = s.rounds_done
        host_sessions.append(hs)

    eta_powers_h = vals[pos:pos + len(eta_powers)]
    pos += len(eta_powers)
    k_h = vals[pos:pos + len(k)]

    hp = begin_tail(prover_state)
    challenges_h = []
    for round_ in range(start_round, n_rounds):
        combined = np.zeros((max_full_degree + 1, EXT), np.uint32)
        bare_polys = [None] * len(host_sessions)
        for idx, session in enumerate(host_sessions):
            join_round = n_rounds - session.initial_n_vars()
            scale = nf.emul(eta_powers_h[idx], k_h[idx])
            if round_ < join_round:
                combined[1] = nf.eadd(combined[1],
                                      nf.emul(scale, session.sum))
            else:
                bare = session.compute_bare_round_poly()
                full = expand_bare_to_full(bare, session.eq_alpha())
                for i in range(len(full)):
                    combined[i] = nf.eadd(combined[i],
                                          nf.emul(scale, full[i]))
                bare_polys[idx] = bare

        hp.add_sumcheck_polynomial(combined)
        challenge = hp.sample()
        challenges_h.append(challenge)

        for idx, session in enumerate(host_sessions):
            join_round = n_rounds - session.initial_n_vars()
            if round_ < join_round:
                k_h[idx] = nf.emul(k_h[idx], challenge)
            else:
                session.process_challenge(challenge, bare_polys[idx])

    final_rows = []
    for session in host_sessions:
        rows = session.final_column_evals()
        hp.add_extension_scalars(rows)
        final_rows.append(upload(rows))
    end_tail(prover_state, hp)

    all_challenges = list(dev_challenges) + [upload(c) for c in challenges_h]
    return jnp.stack(all_challenges), final_rows
