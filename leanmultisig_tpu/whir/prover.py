"""WHIR prover: commit + open (multi-round folding argument).

Protocol order mirrors the reference exactly (crates/whir/src/commit.rs:64-99,
open.rs:36-248): every absorb/sample/duplex/grind happens in the same
sequence, so transcripts are bit-compatible with the Rust verifier.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import np_field as nf
from ..poly import np_poly as pp
from ..sumcheck.np_sumcheck import ProductComputation, sumcheck_prove
from .config import WhirConfig
from .dft import reorder_and_dft as _host_reorder_and_dft


def reorder_and_dft(evals, folding_factor, log_inv_rate, dft_n_cols):
    """RS-encode on device when enabled (large sizes), else host numpy."""
    from ..device import enabled as device_enabled
    if device_enabled() and evals.shape[0] >= (1 << 12):
        from ..device.kernels import reorder_and_dft as device_rdft
        return device_rdft(evals, folding_factor, log_inv_rate, dft_n_cols)
    return _host_reorder_and_dft(evals, folding_factor, log_inv_rate,
                                 dft_n_cols)
from .merkle import WhirMerkleTree
from .statement import SparseStatement, combine_statement

EXT_DIM = 5


@dataclass
class Witness:
    prover_data: WhirMerkleTree
    ood_points: np.ndarray  # (s, 5)
    ood_answers: np.ndarray  # (s, 5)


def _evaluate(poly: np.ndarray, point: np.ndarray) -> np.ndarray:
    return pp.eval_mle(poly, point)


def sample_ood_points(prover_state, num_samples: int, num_variables: int,
                      poly: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(whir/src/utils.rs:30-57)"""
    if num_samples == 0:
        z = np.zeros((0, EXT_DIM), np.uint32)
        return z, z
    ood_points = prover_state.sample_vec(num_samples)
    ood_answers = np.stack([
        _evaluate(poly, pp.expand_from_univariate(pt, num_variables))
        for pt in ood_points])
    prover_state.add_extension_scalars(ood_answers)
    return ood_points, ood_answers


def commit(config: WhirConfig, prover_state, polynomial: np.ndarray,
           actual_data_len: int | None = None) -> Witness:
    """(commit.rs:64-99). polynomial: (2^n,) base or (2^n, 5) ext evals."""
    n_blocks = 1 << config.folding_factor.at_round(0)
    evals_len = 1 << config.num_variables
    assert polynomial.shape[0] == evals_len
    if actual_data_len is None:
        actual_data_len = evals_len
    effective_n_cols = -(-actual_data_len // (evals_len // n_blocks))

    matrix = reorder_and_dft(polynomial, config.folding_factor.at_round(0),
                             config.starting_log_inv_rate, effective_n_cols)
    dim = EXT_DIM if polynomial.ndim == 2 else 1
    tree = WhirMerkleTree(matrix, full_base_width=n_blocks * dim)
    prover_state.add_base_scalars(tree.root())

    ood_points, ood_answers = sample_ood_points(
        prover_state, config.commitment_ood_samples, config.num_variables,
        polynomial)
    return Witness(tree, ood_points, ood_answers)


class _SumcheckSingle:
    """(open.rs:322-446): p(X) evals + combined weight evals + running sum."""

    def __init__(self, evals: np.ndarray, weights: np.ndarray, sum_: np.ndarray):
        self.evals = evals
        self.weights = weights
        self.sum = sum_

    def evals_host(self) -> np.ndarray:
        return self.evals

    def add_new_equality(self, points, evaluations, combination_randomness):
        self.weights = np.ascontiguousarray(self.weights)
        for point, ev, rand in zip(points, evaluations, combination_randomness):
            pp.add_scaled_eq(self.weights, point, rand)
            self.sum = nf.eadd(self.sum, nf.emul(rand, ev))

    def run_sumcheck_many_rounds(self, prover_state, n_rounds: int,
                                 pow_bits: int) -> np.ndarray:
        challenges, folds, new_sum = sumcheck_prove(
            [self.evals, self.weights], ProductComputation(), None, None,
            prover_state, self.sum, n_rounds=n_rounds, pow_bits=pow_bits)
        self.evals, self.weights = folds
        self.sum = new_sum
        return challenges


def open_(config: WhirConfig, prover_state,
          statements: list[SparseStatement], witness: Witness,
          polynomial: np.ndarray) -> np.ndarray:
    """WHIR opening proof (open.rs:36-180). Returns the final folding
    randomness point (n, 5)."""
    assert config.num_variables == (
        config.folding_factor.total_number(config.n_rounds())
        + config.final_sumcheck_rounds)

    # OOD claims become dense statements, prepended (open.rs:467-487)
    ood_statements = [
        SparseStatement.dense(
            pp.expand_from_univariate(pt, config.num_variables), ans)
        for pt, ans in zip(witness.ood_points, witness.ood_answers)]
    statements = ood_statements + list(statements)

    prover_state.duplex()
    gamma = prover_state.sample()

    from ..device import enabled as device_enabled
    use_device = device_enabled() and config.num_variables >= 14
    if use_device:
        from ..device.sumcheck import (DeviceProductSumcheck,
                                       combine_statement_device)
        weights_m, sum_ = combine_statement_device(statements, gamma)
        state = DeviceProductSumcheck(polynomial, weights_m, sum_)
        challenges = state.run_sumcheck_many_rounds(
            prover_state, config.folding_factor.at_round(0),
            config.starting_folding_pow_bits)
    else:
        weights, sum_ = combine_statement(statements, gamma)
        challenges, (evals, weights), sum_ = sumcheck_prove(
            [polynomial, weights], ProductComputation(), None, None,
            prover_state, sum_, n_rounds=config.folding_factor.at_round(0),
            pow_bits=config.starting_folding_pow_bits)
        state = _SumcheckSingle(evals, weights, sum_)
    randomness_vec = list(challenges)

    domain_size = config.starting_domain_size()
    next_domain_gen_log = (domain_size.bit_length() - 1
                           - config.folding_factor.at_round(0))
    merkle_tree = witness.prover_data
    return open_rounds(config, prover_state, state, merkle_tree,
                       randomness_vec, domain_size, next_domain_gen_log, 0)


def open_rounds(config: WhirConfig, prover_state, state, merkle_tree,
                randomness_vec: list, domain_size: int,
                next_domain_gen_log: int, start_round: int) -> np.ndarray:
    """WHIR opening rounds from `start_round` through the final round.

    Factored out of open_ so the device prover can hand a mid-protocol
    state over to the host once it folds below the waterline
    (dprover/dtail.py); `merkle_tree` may be a host WhirMerkleTree or
    any object with an `open_batch(indexes)` method."""
    for round_index in range(start_round, config.n_rounds()):
        round_params = config.round_parameters[round_index]
        # total_number(r) = first + sub*r — the vars already folded away
        # entering round r (open.rs:65)
        num_variables = (config.num_variables
                         - config.folding_factor.total_number(round_index))
        folding_factor_next = config.folding_factor.at_round(round_index + 1)

        # fold + re-encode + commit (open.rs:77-93)
        domain_reduction = 1 << config.rs_reduction_factor(round_index)
        new_domain_size = domain_size // domain_reduction
        inv_rate_log = (new_domain_size.bit_length() - 1) - num_variables
        matrix = reorder_and_dft(state.evals_host(), folding_factor_next,
                                 inv_rate_log, 1 << folding_factor_next)
        new_tree = WhirMerkleTree(
            matrix, full_base_width=(1 << folding_factor_next) * EXT_DIM)
        prover_state.add_base_scalars(new_tree.root())

        ood_points, ood_answers = sample_ood_points(
            prover_state, round_params.ood_samples, num_variables,
            state.evals_host())

        prover_state.pow_grinding(round_params.query_pow_bits)

        # STIR queries over the folded current domain (open.rs:250-277)
        folded_domain_size = (domain_size
                              >> config.folding_factor.at_round(round_index))
        stir_indexes = prover_state.sample_in_range(
            folded_domain_size.bit_length() - 1, round_params.num_queries)

        from ..field.constants import P
        from ..field.np_field import two_adic_generator
        domain_gen = two_adic_generator(next_domain_gen_log)
        ood_challenges = [pp.expand_from_univariate(pt, num_variables)
                          for pt in ood_points]
        stir_challenges = [
            pp.expand_from_univariate(
                pp.efrom_base_scalar(pow(domain_gen, i, P)), num_variables)
            for i in stir_indexes]

        k_this = config.folding_factor.at_round(round_index)
        folding_randomness = np.stack(randomness_vec[-k_this:])

        # open previous tree at the queried leaves (open.rs:280-320)
        answers = _open_and_hint(merkle_tree, prover_state, stir_indexes)
        stir_evaluations = [pp.eval_mle(ans, folding_randomness)
                            for ans in answers]

        prover_state.duplex()
        comb_gamma = prover_state.sample()
        n_comb = len(ood_challenges) + len(stir_challenges)
        comb_powers = [pp.EONE.copy()]
        for _ in range(1, n_comb):
            comb_powers.append(nf.emul(comb_powers[-1], comb_gamma))
        state.add_new_equality(
            ood_challenges + stir_challenges,
            list(ood_answers) + stir_evaluations,
            comb_powers)

        next_challenges = state.run_sumcheck_many_rounds(
            prover_state, folding_factor_next, round_params.folding_pow_bits)
        randomness_vec.extend(list(next_challenges))

        domain_size = new_domain_size
        next_domain_gen_log = (new_domain_size.bit_length() - 1
                               - folding_factor_next)
        merkle_tree = new_tree

    # final round (open.rs:182-248)
    coeffs = pp.evals_to_coeffs(state.evals_host())
    prover_state.add_extension_scalars(coeffs)
    prover_state.pow_grinding(config.final_query_pow_bits)

    k_last = config.folding_factor.at_round(config.n_rounds())
    final_folded_domain = domain_size >> k_last
    final_indexes = prover_state.sample_in_range(
        final_folded_domain.bit_length() - 1, config.final_queries)
    _open_and_hint(merkle_tree, prover_state, final_indexes)

    if config.final_sumcheck_rounds > 0:
        final_challenges = state.run_sumcheck_many_rounds(
            prover_state, config.final_sumcheck_rounds, 0)
        randomness_vec.extend(list(final_challenges))

    return np.stack(randomness_vec)


def _open_and_hint(tree, prover_state,
                   indexes: list[int]) -> list[np.ndarray]:
    """Open leaves, hint the merkle paths, return leaf values as MLEs.
    `tree` is a WhirMerkleTree or a device-tree view exposing
    open_batch(indexes) (dprover/dtail.DevTreeHostView)."""
    from ..fs.prover import MerklePath
    paths = []
    answers = []
    if hasattr(tree, "open_batch"):
        opened = tree.open_batch(list(indexes))
    else:
        opened = [tree.open(idx) for idx in indexes]
    for (leaf_base, siblings), idx in zip(opened, indexes):
        paths.append(MerklePath(leaf_base, siblings, idx))
        if tree.is_ext:
            answers.append(leaf_base.reshape(-1, EXT_DIM))
        else:
            answers.append(leaf_base)
    prover_state.hint_merkle_paths(paths)
    return answers
