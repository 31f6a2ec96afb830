"""Device-resident WHIR PCS prover (commit + open).

Mirrors whir/prover.py (reference crates/whir/src/commit.rs:64-99,
open.rs:36-248) with every bulk object — the polynomial, combined weight
MLE, RS-encoded leaf matrices, Merkle digest layers — resident on device
in Montgomery form. STIR query indices are sampled, masked, and used for
opening gathers entirely on device; opened leaves/paths are stashed as
canonical device arrays for the single end-of-proof fetch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..utils.aot_cache import aot_jit

from ..field.constants import P
from ..whir.config import WhirConfig
from . import dpoly
from .ddft import reorder_and_dft_dev
from .dmerkle import DevMerkleTree
from .dsumcheck import fused_product_rounds

EXT = 5


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@dataclass
class DStatementValue:
    selector: int
    value: object  # (5,) monty device


@dataclass
class DStatement:
    """Device mirror of whir.statement.SparseStatement."""
    total_num_variables: int
    point: object  # (m, 5) monty device
    values: list
    is_next: bool = False

    def inner_num_variables(self) -> int:
        return int(self.point.shape[0])

    def selector_num_variables(self) -> int:
        return self.total_num_variables - self.inner_num_variables()


@dataclass
class DWitness:
    tree: DevMerkleTree
    ood_points: object  # (s, 5) monty device
    ood_answers: object  # (s, 5) monty device


def sample_ood_points_dev(prover_state, num_samples: int, num_variables: int,
                          poly):
    _, jnp = _jax()
    if num_samples == 0:
        z = jnp.zeros((0, EXT), jnp.uint32)
        return z, z
    ood_points = prover_state.sample_vec(num_samples)
    answers = []
    for i in range(num_samples):
        pt = dpoly.dexpand_from_univariate(ood_points[i], num_variables)
        answers.append(dpoly.deval_mle(poly, pt))
    ood_answers = jnp.stack(answers)
    prover_state.add_extension_scalars(ood_answers)
    return ood_points, ood_answers


def _whir_host(n_rows: int) -> bool:
    """Whole-round host threshold: a WHIR round at size n folds down
    through n >> k shapes — hand the round to the host a little above
    the element waterline so its internal folds don't generate
    sub-waterline device programs."""
    from .dtail import waterline
    wl = waterline()
    return wl > 0 and n_rows <= (1 << min(wl + 3, 31))


def commit_dev(config: WhirConfig, prover_state, polynomial,
               actual_data_len: int | None = None) -> DWitness:
    """(commit.rs:64-99). polynomial: (2^n,) base monty device."""
    if _whir_host(int(polynomial.shape[0])):
        # sub-waterline commitment: host tree + host FS (dtail)
        from ..whir.prover import commit as host_commit
        from .dtail import begin_tail, end_tail, fetch
        hp = begin_tail(prover_state)
        hw = host_commit(config, hp, fetch(polynomial), actual_data_len)
        end_tail(prover_state, hp)
        return hw  # whir.prover.Witness — open_dev detects and stays host

    n_blocks = 1 << config.folding_factor.at_round(0)
    evals_len = 1 << config.num_variables
    assert polynomial.shape[0] == evals_len
    if actual_data_len is None:
        actual_data_len = evals_len
    effective_n_cols = -(-actual_data_len // (evals_len // n_blocks))

    matrix = reorder_and_dft_dev(polynomial,
                                 config.folding_factor.at_round(0),
                                 config.starting_log_inv_rate,
                                 effective_n_cols)
    dim = EXT if polynomial.ndim == 2 else 1
    tree = DevMerkleTree(matrix, full_base_width=n_blocks * dim)
    prover_state.add_monty_scalars(tree.root_monty())

    ood_points, ood_answers = sample_ood_points_dev(
        prover_state, config.commitment_ood_samples, config.num_variables,
        polynomial)
    return DWitness(tree, ood_points, ood_answers)


# --- combined weight MLE ----------------------------------------------------


@functools.cache
def _accum_block_fn(total: int, block: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def accum(weights, block_vals, lo):
        lo = lo.astype(jnp.int32)
        seg = jax.lax.dynamic_slice(weights, (lo, jnp.int32(0)),
                                    (block, EXT))
        return jax.lax.dynamic_update_slice(
            weights, jf.eadd(seg, block_vals), (lo, jnp.int32(0)))

    return accum


@functools.cache
def _scale_fn():
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def scale(tab, s):
        return jf.emul(tab, jnp.broadcast_to(s, tab.shape))

    return scale


@functools.cache
def _next_mle_folded_fn(n: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.eone_m()

    @aot_jit
    def nm(outer):
        onej = jnp.asarray(one)
        res = jnp.zeros((1 << n, EXT), jnp.uint32)
        for k in range(n):
            prod = jf.esub(onej, outer[n - k - 1])
            for i in range(n - k, n):
                prod = jf.emul(prod, outer[i])
            eq_tab = dpoly._eval_eq_fn(n - k - 1)(outer[:n - k - 1], prod)
            idx = (jnp.arange(1 << (n - k - 1)) << (k + 1)) + (1 << k)
            res = res.at[idx].set(jf.eadd(res[idx], eq_tab))
        prod = onej
        for i in range(n):
            prod = jf.emul(prod, outer[i])
        res = res.at[-1].set(jf.eadd(res[-1], prod))
        return res

    return nm


@functools.cache
def _emul_s_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.emul)


@functools.cache
def _sum_update_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def upd(combined_sum, value, gamma_pow, gamma):
        new_sum = jf.eadd(combined_sum, jf.emul(value, gamma_pow))
        return new_sum, jf.emul(gamma_pow, gamma)

    return upd


def combine_statement_dev(statements: list, gamma):
    """Device build of (weights (2^n,5) monty, combined_sum (5,) monty);
    gamma-power order identical to whir.statement.combine_statement."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    num_variables = statements[0].total_num_variables
    weights = jnp.zeros((1 << num_variables, EXT), jnp.uint32)
    combined_sum = jnp.zeros(EXT, jnp.uint32)
    gamma_pow = jnp.asarray(dpoly.eone_m())

    for smt in statements:
        inner_n = smt.inner_num_variables()
        if smt.is_next:
            base_poly = _next_mle_folded_fn(inner_n)(smt.point)
        else:
            base_poly = None  # eq table built per value with the seed
        for v in smt.values:
            lo = v.selector << inner_n
            if base_poly is None:
                block = dpoly.deval_eq(smt.point, gamma_pow)
            else:
                block = _scale_fn()(base_poly, gamma_pow)
            if (1 << num_variables) == (1 << inner_n):
                assert v.selector == 0
                weights = _emul_add_full(weights, block)
            else:
                weights = _accum_block_fn(1 << num_variables, 1 << inner_n)(
                    weights, block, jnp.uint32(lo))
            combined_sum, gamma_pow = _sum_update_fn()(
                combined_sum, v.value, gamma_pow, gamma)

    return weights, combined_sum


@functools.cache
def _add_full_fn():
    jax, _ = _jax()
    from ..field import jnp_field as jf
    return aot_jit(jf.eadd)


@functools.cache
def _stir_equality_fn(n: int, q: int):
    """weights += sum_i gamma^i eq(expand(s_i), .); sum += gamma^i ev_i
    over all q STIR queries in one dispatch (lax.scan over queries; the
    gamma-scaled eq table of the base-scalar point [s, s^2, s^4, ...] is
    built by seeded doubling, identical to deval_eq's order)."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def run(weights, sum_, gen_vals, stir_evals, gamma, gamma_pow0):
        def step(carry, inp):
            w, s_, gpow = carry
            s, ev = inp
            out = gpow[None, :]
            sj = s
            for v in range(n):
                hi = jf.escalar_mul(out, jnp.broadcast_to(
                    sj, (out.shape[0],)))
                lo = jf.esub(out, hi)
                out = jnp.stack([lo, hi], axis=1).reshape(-1, EXT)
                if v + 1 < n:
                    sj = jf.mul(sj, sj)
            w = jf.eadd(w, out)
            s_ = jf.eadd(s_, jf.emul(ev, gpow))
            return (w, s_, jf.emul(gpow, gamma)), None

        (weights, sum_, _), _ = jax.lax.scan(
            step, (weights, sum_, gamma_pow0), (gen_vals, stir_evals))
        return weights, sum_

    return run


def _emul_add_full(weights, block):
    return _add_full_fn()(weights, block)


# --- STIR helpers -----------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _gen_pow2_monty(gen_log: int, bits: int) -> np.ndarray:
    """[g^(2^j) for j in 0..bits) in monty form, g = 2-adic gen of order
    2^gen_log."""
    from ..field.np_field import two_adic_generator
    g = two_adic_generator(gen_log)
    out = []
    cur = g % P
    for _ in range(bits):
        out.append((cur << 32) % P)
        cur = (cur * cur) % P
    return np.array(out, np.uint32)


@functools.cache
def _pow_from_bits_fn(bits: int):
    jax, jnp = _jax()
    from ..field import jnp_field as jf
    one = dpoly.MONTY_ONE

    @aot_jit
    def pow_(indices, gen_pows):
        acc = jnp.full(indices.shape, one, jnp.uint32)
        for j in range(bits):
            bit = (indices >> np.uint32(j)) & np.uint32(1)
            term = jnp.where(bit == 1, gen_pows[j], np.uint32(one))
            acc = jf.mul(acc, term)
        return acc

    return pow_


def domain_gen_powers_dev(indices, gen_log: int, bits: int):
    """g^indices as (q,) monty device values."""
    _, jnp = _jax()
    gen_pows = jnp.asarray(_gen_pow2_monty(gen_log, bits))
    return _pow_from_bits_fn(bits)(indices, gen_pows)


@functools.cache
def _batch_eval_leaf_fn(k: int, is_ext: bool):
    """Evaluate each opened leaf row at the folding randomness:
    rows (q, W) monty -> (q, 5) monty."""
    jax, jnp = _jax()
    from ..field import jnp_field as jf

    @aot_jit
    def ev(rows_m, point):
        q = rows_m.shape[0]
        cur = rows_m.reshape((q, 1 << k, EXT) if is_ext
                             else (q, 1 << k))
        for i in range(k):
            half = cur.shape[1] // 2
            lo, hi = cur[:, :half], cur[:, half:]
            diff = jf.sub(hi, lo)
            x = point[i]
            if cur.ndim == 2:
                xb = jnp.broadcast_to(x[None, None, :], (q, half, EXT))
                cur = jf.eadd(jf.efrom_base(lo), jf.escalar_mul(xb, diff))
            else:
                xb = jnp.broadcast_to(x[None, None, :], (q, half, EXT))
                cur = jf.eadd(lo, jf.emul(diff, xb))
        return cur[:, 0]

    return ev


@functools.cache
def _mask_fn(bits: int):
    jax, jnp = _jax()
    mask = np.uint32((1 << bits) - 1)
    return aot_jit(lambda fes: fes & mask)


# --- the opening argument ---------------------------------------------------


class _DevSumcheckState:
    def __init__(self, evals, weights, sum_):
        self.evals = evals
        self.weights = weights
        self.sum = sum_

    def run_rounds(self, prover_state, n_rounds: int, pow_bits: int):
        from .dshard import use_fused
        if not use_fused():
            # per-round path (see dshard.use_fused for the rationale)
            from .dsumcheck import sumcheck_prove_dev
            challenges, (self.evals, self.weights), self.sum = \
                sumcheck_prove_dev(
                    [self.evals, self.weights], "product", None, None,
                    prover_state, self.sum, n_rounds=n_rounds,
                    pow_bits=pow_bits)
            return challenges
        challenges, self.evals, self.weights, self.sum = \
            fused_product_rounds(prover_state, self.evals, self.weights,
                                 self.sum, n_rounds, pow_bits)
        return challenges

    def add_new_equality(self, points, evaluations, comb_gamma, n_comb):
        """points: list of (n,5) dev; evaluations: list of (5,) dev;
        randomness = successive powers of comb_gamma (1, g, g^2, ...).
        Returns the next gamma power (to continue the sequence)."""
        jax, jnp = _jax()
        from ..field import jnp_field as jf
        gamma_pow = jnp.asarray(dpoly.eone_m())
        for point, ev in zip(points, evaluations):
            block = dpoly.deval_eq(point, gamma_pow)
            self.weights = _add_full_fn()(self.weights, block)
            self.sum, gamma_pow = _sum_update_fn()(self.sum, ev, gamma_pow,
                                                   comb_gamma)
        return gamma_pow

    def add_stir_equalities(self, gen_vals, stir_evals, comb_gamma,
                            gamma_pow):
        """Batched STIR equality accumulation: the q query points are
        expand_from_univariate(g^idx) with BASE scalars, so all q
        gamma-scaled eq tables + the sum update run as ONE fused scan
        (the per-point loop was ~3 dispatches x ~100 queries per WHIR
        round — the dominant dispatch cost of the opening phase)."""
        jax, jnp = _jax()
        from .dshard import current_mesh
        if current_mesh() is not None:
            # sharded proving keeps the per-point path (see dgkr note);
            # off-mesh the scan kernel is always used (compile-cheap)
            from ..field import jnp_field as jf
            q = int(gen_vals.shape[0])
            n = int(self.weights.shape[0]).bit_length() - 1
            for i in range(q):
                base_scalar = jnp.concatenate(
                    [gen_vals[i][None], jnp.zeros(4, jnp.uint32)])
                point = dpoly.dexpand_from_univariate(base_scalar, n)
                block = dpoly.deval_eq(point, gamma_pow)
                self.weights = _add_full_fn()(self.weights, block)
                self.sum, gamma_pow = _sum_update_fn()(
                    self.sum, stir_evals[i], gamma_pow, comb_gamma)
            return
        n = int(self.weights.shape[0]).bit_length() - 1
        q = int(gen_vals.shape[0])
        self.weights, self.sum = _stir_equality_fn(n, q)(
            self.weights, self.sum, gen_vals, stir_evals, comb_gamma,
            gamma_pow)


def _statements_to_host(statements: list):
    from ..whir.statement import SparseStatement, SparseValue
    from .dtail import fetch_many
    flat = []
    for s in statements:
        flat.append(s.point)
        flat += [v.value for v in s.values]
    vals = fetch_many(flat)
    out = []
    pos = 0
    for s in statements:
        point = vals[pos]
        pos += 1
        svals = []
        for v in s.values:
            svals.append(SparseValue(v.selector, vals[pos]))
            pos += 1
        out.append(SparseStatement(s.total_num_variables, point, svals,
                                   is_next=s.is_next))
    return out


def open_dev(config: WhirConfig, prover_state, statements: list,
             witness, polynomial):
    """Device WHIR opening proof (open.rs:36-180); returns the final
    folding randomness (n, 5) monty device."""
    jax, jnp = _jax()
    assert config.num_variables == (
        config.folding_factor.total_number(config.n_rounds())
        + config.final_sumcheck_rounds)

    from ..whir.prover import Witness as HostWitness
    if isinstance(witness, HostWitness):
        # sub-waterline opening: the commitment was host-side, the whole
        # opening argument runs host-side too (dtail)
        from ..whir.prover import open_ as host_open
        from .dtail import begin_tail, end_tail, fetch, upload
        host_statements = _statements_to_host(statements)
        hp = begin_tail(prover_state)
        rand = host_open(config, hp, host_statements, witness,
                         fetch(polynomial))
        end_tail(prover_state, hp)
        return upload(rand)

    ood_statements = []
    for i in range(int(witness.ood_points.shape[0])):
        pt = dpoly.dexpand_from_univariate(witness.ood_points[i],
                                           config.num_variables)
        ood_statements.append(DStatement(
            config.num_variables, pt,
            [DStatementValue(0, witness.ood_answers[i])]))
    statements = ood_statements + list(statements)

    prover_state.duplex()
    gamma = prover_state.sample()

    weights, sum_ = combine_statement_dev(statements, gamma)
    state = _DevSumcheckState(polynomial, weights, sum_)
    challenges = state.run_rounds(prover_state,
                                  config.folding_factor.at_round(0),
                                  config.starting_folding_pow_bits)
    randomness_vec = [challenges[i] for i in range(challenges.shape[0])]

    domain_size = config.starting_domain_size()
    next_domain_gen_log = (domain_size.bit_length() - 1
                           - config.folding_factor.at_round(0))
    merkle_tree = witness.tree

    for round_index in range(config.n_rounds()):
        if _whir_host(int(state.evals.shape[0])):
            return _host_continue_open(
                config, prover_state, state, merkle_tree, randomness_vec,
                domain_size, next_domain_gen_log, round_index)
        round_params = config.round_parameters[round_index]
        num_variables = (config.num_variables
                         - config.folding_factor.total_number(round_index))
        folding_factor_next = config.folding_factor.at_round(round_index + 1)

        domain_reduction = 1 << config.rs_reduction_factor(round_index)
        new_domain_size = domain_size // domain_reduction
        inv_rate_log = (new_domain_size.bit_length() - 1) - num_variables
        matrix = reorder_and_dft_dev(state.evals, folding_factor_next,
                                     inv_rate_log, 1 << folding_factor_next)
        new_tree = DevMerkleTree(
            matrix, full_base_width=(1 << folding_factor_next) * EXT)
        prover_state.add_monty_scalars(new_tree.root_monty())

        ood_points, ood_answers = sample_ood_points_dev(
            prover_state, round_params.ood_samples, num_variables,
            state.evals)

        prover_state.pow_grinding(round_params.query_pow_bits)

        folded_domain_size = (domain_size
                              >> config.folding_factor.at_round(round_index))
        fd_bits = folded_domain_size.bit_length() - 1
        stir_fes = prover_state.sample_in_range_fes(round_params.num_queries)
        stir_indexes = _mask_fn(fd_bits)(stir_fes)  # (q,) canonical dev

        ood_challenges = [
            dpoly.dexpand_from_univariate(ood_points[i], num_variables)
            for i in range(int(ood_points.shape[0]))]
        gen_vals = domain_gen_powers_dev(stir_indexes, next_domain_gen_log,
                                         fd_bits)

        k_this = config.folding_factor.at_round(round_index)
        folding_randomness = jnp.stack(randomness_vec[-k_this:])

        # open previous tree at the queried leaves
        leaf_rows_c, sibs_c = merkle_tree.open_many(stir_indexes)
        prover_state.hint_merkle_group(leaf_rows_c, sibs_c, stir_indexes)
        rows_m = jnp.take(merkle_tree.base, stir_indexes, axis=0)
        stir_evals = _batch_eval_leaf_fn(k_this, merkle_tree.is_ext)(
            rows_m, folding_randomness)

        prover_state.duplex()
        comb_gamma = prover_state.sample()
        gamma_pow = state.add_new_equality(
            ood_challenges,
            [ood_answers[i] for i in range(int(ood_answers.shape[0]))],
            comb_gamma, len(ood_challenges))
        state.add_stir_equalities(gen_vals, stir_evals, comb_gamma,
                                  gamma_pow)

        next_challenges = state.run_rounds(prover_state, folding_factor_next,
                                           round_params.folding_pow_bits)
        randomness_vec.extend(
            [next_challenges[i] for i in range(next_challenges.shape[0])])

        domain_size = new_domain_size
        next_domain_gen_log = (new_domain_size.bit_length() - 1
                               - folding_factor_next)
        merkle_tree = new_tree

    if _whir_host(int(state.evals.shape[0])):
        return _host_continue_open(
            config, prover_state, state, merkle_tree, randomness_vec,
            domain_size, next_domain_gen_log, config.n_rounds())

    # final round (open.rs:182-248)
    coeffs = dpoly.devals_to_coeffs(state.evals)
    prover_state.add_extension_scalars(coeffs)
    prover_state.pow_grinding(config.final_query_pow_bits)

    k_last = config.folding_factor.at_round(config.n_rounds())
    final_folded_domain = domain_size >> k_last
    final_fes = prover_state.sample_in_range_fes(config.final_queries)
    final_indexes = _mask_fn(final_folded_domain.bit_length() - 1)(final_fes)
    leaf_rows_c, sibs_c = merkle_tree.open_many(final_indexes)
    prover_state.hint_merkle_group(leaf_rows_c, sibs_c, final_indexes)

    if config.final_sumcheck_rounds > 0:
        final_challenges = state.run_rounds(
            prover_state, config.final_sumcheck_rounds, 0)
        randomness_vec.extend(
            [final_challenges[i] for i in range(final_challenges.shape[0])])

    return jnp.stack(randomness_vec)


def _host_continue_open(config: WhirConfig, prover_state, state,
                        merkle_tree, randomness_vec, domain_size: int,
                        next_domain_gen_log: int, start_round: int):
    """Hand the remaining WHIR rounds to the host implementation once
    the fold state drops below the waterline (dtail docstring)."""
    import jax
    _, jnp = _jax()
    from ..whir.prover import _SumcheckSingle, open_rounds
    from .dtail import (DevTreeHostView, begin_tail, end_tail, fetch_many,
                        upload)

    flat = [state.evals, state.weights, state.sum]
    if randomness_vec:
        flat.append(jnp.stack(randomness_vec))
    vals = fetch_many(flat)
    state_h = _SumcheckSingle(vals[0], vals[1], vals[2])
    tree_h = (merkle_tree if not isinstance(merkle_tree, DevMerkleTree)
              else DevTreeHostView(merkle_tree))
    rand_h = list(vals[3]) if randomness_vec else []
    hp = begin_tail(prover_state)
    rand = open_rounds(config, hp, state_h, tree_h, rand_h, domain_size,
                       next_domain_gen_log, start_round)
    end_tail(prover_state, hp)
    return upload(rand)
