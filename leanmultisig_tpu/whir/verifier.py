"""WHIR verifier (crates/whir/src/verify.rs:11-435).

Separate code path from the prover, sharing only the transcript — every
integration test is therefore a completeness/soundness check.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import np_field as nf
from ..field.constants import P
from ..field.np_field import two_adic_generator
from ..fs.verifier import ProofError, VerifierState
from ..poly import np_poly as pp
from .config import RoundConfig, WhirConfig
from .merkle import whir_merkle_verify
from .statement import (SparseStatement, combine_constraints,
                        eval_constraints_poly)

EXT_DIM = 5


@dataclass
class ParsedCommitment:
    num_variables: int
    root: np.ndarray  # (8,)
    ood_points: np.ndarray  # (s, 5)
    ood_answers: np.ndarray  # (s, 5)

    def oods_constraints(self) -> list[SparseStatement]:
        return [SparseStatement.dense(
            pp.expand_from_univariate(pt, self.num_variables), ans)
            for pt, ans in zip(self.ood_points, self.ood_answers)]


def parse_commitment(verifier_state: VerifierState, num_variables: int,
                     ood_samples: int) -> ParsedCommitment:
    """(verify.rs:21-46)"""
    root = verifier_state.next_base_scalars_vec(8)
    if ood_samples > 0:
        ood_points = verifier_state.sample_vec(ood_samples)
        ood_answers = verifier_state.next_extension_scalars_vec(ood_samples)
    else:
        ood_points = np.zeros((0, EXT_DIM), np.uint32)
        ood_answers = np.zeros((0, EXT_DIM), np.uint32)
    return ParsedCommitment(num_variables, root, ood_points, ood_answers)


def verify_sumcheck_rounds(verifier_state: VerifierState,
                           claimed_sum: np.ndarray, rounds: int,
                           pow_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(verify.rs:405-435) -> (randomness (rounds,5), new claimed_sum)."""
    randomness = []
    for _ in range(rounds):
        coeffs = verifier_state.next_sumcheck_polynomial(3, claimed_sum)
        verifier_state.check_pow_grinding(pow_bits)
        rand = verifier_state.sample()
        claimed_sum = pp.horner_eval(coeffs, rand)
        randomness.append(rand)
    rnd = (np.stack(randomness) if randomness
           else np.zeros((0, EXT_DIM), np.uint32))
    return rnd, claimed_sum


def _verify_stir_challenges(config: WhirConfig, verifier_state: VerifierState,
                            params: RoundConfig,
                            commitment: ParsedCommitment,
                            folding_randomness: np.ndarray,
                            round_index: int) -> list[SparseStatement]:
    """(verify.rs:229-287)"""
    leafs_base_field = round_index == 0

    verifier_state.check_pow_grinding(params.query_pow_bits)

    folded_domain_size = params.domain_size >> params.folding_factor
    stir_indexes = verifier_state.sample_in_range(
        folded_domain_size.bit_length() - 1, params.num_queries)

    leaf_width = 1 << params.folding_factor
    dim = 1 if leafs_base_field else EXT_DIM
    full_base_width = leaf_width * dim
    height_log = folded_domain_size.bit_length() - 1

    answers = []
    for index in stir_indexes:
        opening = verifier_state.next_merkle_opening()
        if len(opening.leaf_data) != full_base_width:
            raise ProofError("bad leaf width")
        if not whir_merkle_verify(commitment.root, height_log, index,
                                  opening.leaf_data, opening.path):
            raise ProofError("invalid merkle opening")
        answers.append(opening.leaf_data if leafs_base_field
                       else opening.leaf_data.reshape(-1, EXT_DIM))

    folds = [pp.eval_mle(ans, folding_randomness) for ans in answers]

    stir_constraints = []
    for index, value in zip(stir_indexes, folds):
        point = pp.efrom_base_scalar(
            np.uint32(pow(int(params.folded_domain_gen), index, P)))
        stir_constraints.append(SparseStatement.dense(
            pp.expand_from_univariate(point, params.num_variables), value))
    return stir_constraints


def _verify_constraint_coeffs(constraint: SparseStatement,
                              coeffs: np.ndarray) -> bool:
    """(verify.rs:387-400)"""
    assert constraint.selector_num_variables() == 0
    alpha = constraint.point[0]
    for a, b in zip(constraint.point, constraint.point[1:]):
        assert np.array_equal(nf.emul(a, a), b)
    # univariate eval: sum coeffs[i] * alpha^i
    univariate = pp.horner_eval(coeffs, alpha)
    return all(np.array_equal(univariate, v.value) for v in constraint.values)


def verify(config: WhirConfig, verifier_state: VerifierState,
           parsed_commitment: ParsedCommitment,
           statements: list[SparseStatement]) -> np.ndarray:
    """(verify.rs:83-207). Returns the final folding randomness point."""
    for c in statements:
        assert c.total_num_variables == parsed_commitment.num_variables

    round_constraints = []
    round_folding_randomness = []
    claimed_sum = pp.EZERO.copy()
    prev_commitment = parsed_commitment

    verifier_state.duplex()
    constraints = prev_commitment.oods_constraints() + list(statements)
    claimed_sum, randomness = combine_constraints(verifier_state, claimed_sum,
                                                  constraints)
    round_constraints.append((randomness, constraints))

    folding_randomness, claimed_sum = verify_sumcheck_rounds(
        verifier_state, claimed_sum, config.folding_factor.at_round(0),
        config.starting_folding_pow_bits)
    round_folding_randomness.append(folding_randomness)

    for round_index in range(config.n_rounds()):
        round_params = config.round_parameters[round_index]
        new_commitment = parse_commitment(
            verifier_state, round_params.num_variables,
            round_params.ood_samples)
        stir_constraints = _verify_stir_challenges(
            config, verifier_state, round_params, prev_commitment,
            round_folding_randomness[-1], round_index)
        constraints = new_commitment.oods_constraints() + stir_constraints
        verifier_state.duplex()
        claimed_sum, randomness = combine_constraints(
            verifier_state, claimed_sum, constraints)
        round_constraints.append((randomness, constraints))
        folding_randomness, claimed_sum = verify_sumcheck_rounds(
            verifier_state, claimed_sum,
            config.folding_factor.at_round(round_index + 1),
            round_params.folding_pow_bits)
        round_folding_randomness.append(folding_randomness)
        prev_commitment = new_commitment

    n_final_coeffs = 1 << config.n_vars_of_final_polynomial()
    final_coefficients = verifier_state.next_extension_scalars_vec(
        n_final_coeffs)

    stir_constraints = _verify_stir_challenges(
        config, verifier_state, config.final_round_config(), prev_commitment,
        round_folding_randomness[-1], config.n_rounds())
    if not all(_verify_constraint_coeffs(c, final_coefficients)
               for c in stir_constraints):
        raise ProofError("final stir constraint mismatch")

    final_sumcheck_randomness, claimed_sum = verify_sumcheck_rounds(
        verifier_state, claimed_sum, config.final_sumcheck_rounds, 0)
    round_folding_randomness.append(final_sumcheck_randomness)

    folding_randomness = np.concatenate(round_folding_randomness)

    evaluation_of_weights = eval_constraints_poly(
        config.folding_factor.at_round, round_constraints, folding_randomness)

    reversed_point = final_sumcheck_randomness[::-1]
    final_value = pp.eval_multilinear_coeffs(final_coefficients, reversed_point)
    if not np.array_equal(claimed_sum,
                          nf.emul(evaluation_of_weights, final_value)):
        raise ProofError("final sumcheck value mismatch")

    return folding_randomness
