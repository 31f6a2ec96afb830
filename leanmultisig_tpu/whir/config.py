"""WHIR configuration derivation.

Ports the parameter-derivation math of the reference WhirConfig
(crates/whir/src/config.rs) value-for-value: per-round query counts,
OOD sample counts, pow bits, domain sizes, folded-domain generators, and
the optimal-proximity-parameter (log_c) search (config.rs:146-183).
These numbers are part of the protocol (they are baked into the recursive
guest program text — rec_aggregation/src/compilation.rs:106-191), so the
float math mirrors the Rust f64 operations exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..field.constants import P, TWO_ADICITY

EXT_DEGREE = 5
# EF::bits() = bit length of p^5 (field.rs:825-827)
EF_BITS = (P**EXT_DEGREE).bit_length()

# Protocol constants (lean_prover/src/lib.rs:22-28)
SECURITY_BITS = 124
GRINDING_BITS = 16
MAX_NUM_VARIABLES_TO_SEND_COEFFS = 8
WHIR_INITIAL_FOLDING_FACTOR = 7
WHIR_SUBSEQUENT_FOLDING_FACTOR = 5
RS_DOMAIN_INITIAL_REDUCTION_FACTOR = 5

JOHNSON_BOUND = "johnson"
CAPACITY_BOUND = "capacity"
UNIQUE_DECODING = "unique"


@dataclass(frozen=True)
class FoldingFactor:
    """(config.rs:8-79)"""

    first_round: int
    subsequent_round: int

    def at_round(self, round_: int) -> int:
        return self.first_round if round_ == 0 else self.subsequent_round

    def check_validity(self, num_variables: int) -> None:
        assert not (
            self.first_round > num_variables
            or self.subsequent_round > num_variables
            or self.subsequent_round == 0
            or self.first_round == 0
        )

    def compute_number_of_rounds(self, num_variables: int,
                                 max_nv_to_send: int) -> tuple[int, int]:
        nv_except_first = num_variables - self.first_round
        if nv_except_first < max_nv_to_send:
            return 0, nv_except_first
        num_rounds = -(-(nv_except_first - max_nv_to_send) // self.subsequent_round)
        final_sumcheck_rounds = nv_except_first - num_rounds * self.subsequent_round
        return num_rounds, final_sumcheck_rounds

    def total_number(self, n_rounds: int) -> int:
        return self.first_round + self.subsequent_round * n_rounds


class SecurityAssumption:
    """(config.rs:445-617)"""

    def __init__(self, kind: str):
        assert kind in (JOHNSON_BOUND, CAPACITY_BOUND, UNIQUE_DECODING)
        self.kind = kind

    def log_eta(self, log_inv_rate: int, log_c: float) -> float:
        if self.kind == JOHNSON_BOUND:
            return -(0.5 * log_inv_rate + log_c)
        if self.kind == CAPACITY_BOUND:
            return -(log_inv_rate + log_c)
        raise AssertionError

    def list_size_bits(self, log_degree: int, log_inv_rate: int,
                       log_c: float) -> float:
        if self.kind == UNIQUE_DECODING:
            return 0.0
        log_eta = self.log_eta(log_inv_rate, log_c)
        if self.kind == JOHNSON_BOUND:
            return log_inv_rate / 2.0 - (1.0 + log_eta)
        return float(log_degree + log_inv_rate) - log_eta

    def prox_gaps_error(self, log_degree: int, log_inv_rate: int,
                        field_size_bits: int, num_functions: int,
                        log_c: float) -> float:
        if self.kind == UNIQUE_DECODING:
            error = float(log_degree + log_inv_rate)
        elif self.kind == JOHNSON_BOUND:
            # Theorem 1.5 in BCSS25 (config.rs:513-525)
            log_eta = self.log_eta(log_inv_rate, log_c)
            eta = 2.0**log_eta
            rho = 1.0 / float(1 << log_inv_rate)
            rho_sqrt = math.sqrt(rho)
            gamma = 1.0 - rho_sqrt - eta
            n = float(1 << (log_degree + log_inv_rate))
            m = max(math.ceil(rho_sqrt / (2.0 * eta)), 3.0)
            num_1 = (2.0 * (m + 0.5)**5 + 3.0 * (m + 0.5) * gamma * rho) * n
            den_1 = 3.0 * rho * rho_sqrt
            num_2 = m + 0.5
            den_2 = rho_sqrt
            error = math.log2(num_1 / den_1 + num_2 / den_2)
        else:
            log_eta = self.log_eta(log_inv_rate, log_c)
            error = float(log_degree + 2 * log_inv_rate) - log_eta
        num_functions_1_log = math.log2(num_functions - 1.0)
        return field_size_bits - (error + num_functions_1_log)

    def log_1_delta(self, log_inv_rate: int, log_c: float) -> float:
        eta = 0.0 if self.kind == UNIQUE_DECODING else \
            2.0 ** self.log_eta(log_inv_rate, log_c)
        rate = 1.0 / float(1 << log_inv_rate)
        if self.kind == UNIQUE_DECODING:
            delta = 0.5 * (1.0 - rate)
        elif self.kind == JOHNSON_BOUND:
            delta = 1.0 - math.sqrt(rate) - eta
        else:
            delta = 1.0 - rate - eta
        return math.log2(1.0 - delta)

    def queries(self, protocol_security_level: int, log_inv_rate: int,
                log_c: float) -> int:
        return math.ceil(-protocol_security_level
                         / self.log_1_delta(log_inv_rate, log_c))

    def queries_error(self, log_inv_rate: int, num_queries: int,
                      log_c: float) -> float:
        return -num_queries * self.log_1_delta(log_inv_rate, log_c)

    def ood_error(self, log_degree: int, log_inv_rate: int,
                  field_size_bits: int, ood_samples: int, log_c: float) -> float:
        if self.kind == UNIQUE_DECODING:
            return 0.0
        list_size_bits = self.list_size_bits(log_degree, log_inv_rate, log_c)
        error = 2.0 * list_size_bits + float(log_degree * ood_samples)
        return float(ood_samples * field_size_bits) + 1.0 - error

    def determine_ood_samples(self, security_level: int, log_degree: int,
                              log_inv_rate: int, field_size_bits: int,
                              log_c: float) -> int:
        if self.kind == UNIQUE_DECODING:
            return 0
        for ood_samples in range(1, 64):
            if self.ood_error(log_degree, log_inv_rate, field_size_bits,
                              ood_samples, log_c) >= float(security_level):
                return ood_samples
        raise RuntimeError("could not find an appropriate number of OOD samples")


@dataclass(frozen=True)
class WhirConfigBuilder:
    """(config.rs:83-101; defaults: lean_prover/src/lib.rs:34-50)"""

    starting_log_inv_rate: int
    max_num_variables_to_send_coeffs: int = MAX_NUM_VARIABLES_TO_SEND_COEFFS
    rs_domain_initial_reduction_factor: int = RS_DOMAIN_INITIAL_REDUCTION_FACTOR
    folding_factor: FoldingFactor = field(
        default_factory=lambda: FoldingFactor(WHIR_INITIAL_FOLDING_FACTOR,
                                              WHIR_SUBSEQUENT_FOLDING_FACTOR))
    soundness_type: str = JOHNSON_BOUND
    security_level: int = SECURITY_BITS
    pow_bits: int = GRINDING_BITS


@dataclass
class RoundConfig:
    """(config.rs:104-114). folded_domain_gen: canonical uint32."""

    query_pow_bits: int
    folding_pow_bits: int
    num_queries: int
    ood_samples: int
    log_inv_rate: int
    num_variables: int
    folding_factor: int
    domain_size: int
    folded_domain_gen: int


def _folding_pow_bits(security_level: int, st: SecurityAssumption,
                      field_size_bits: int, num_variables: int,
                      log_inv_rate: int, log_c: float) -> float:
    prox_gaps_error = st.prox_gaps_error(num_variables, log_inv_rate,
                                         field_size_bits, 2, log_c)
    sumcheck_error = field_size_bits - (
        st.list_size_bits(num_variables, log_inv_rate, log_c) + 1.0)
    return max(0.0, security_level - min(prox_gaps_error, sumcheck_error))


def _rbr_soundness_queries_combination(st: SecurityAssumption,
                                       field_size_bits: int, num_variables: int,
                                       log_inv_rate: int, ood_samples: int,
                                       num_queries: int, log_c: float) -> float:
    list_size = st.list_size_bits(num_variables, log_inv_rate, log_c)
    log_combination = math.log2(float(ood_samples + num_queries))
    return field_size_bits - (log_combination + list_size + 1.0)


def _compute_optimal_log_c_for_rate(params: WhirConfigBuilder,
                                    st: SecurityAssumption,
                                    field_size_bits: int, num_variables: int,
                                    log_inv_rate: int) -> float:
    """(config.rs:146-183)"""
    if st.kind == UNIQUE_DECODING:
        return 0.0
    pow_budget = params.pow_bits
    query_security_level = max(0, params.security_level - pow_budget)
    best_m = 3
    best_queries = None
    for m in range(3, 101):
        log_c = math.log2(2.0 * m)
        folding_pow = _folding_pow_bits(params.security_level, st,
                                        field_size_bits, num_variables,
                                        log_inv_rate, log_c)
        if math.ceil(folding_pow) > pow_budget:
            break
        queries = st.queries(query_security_level, log_inv_rate, log_c)
        if best_queries is None or queries < best_queries:
            best_queries = queries
            best_m = m
    return math.log2(2.0 * best_m)


def _two_adic_generator(bits: int) -> int:
    from ..field.constants import TWO_ADIC_GENERATORS
    assert 0 <= bits <= TWO_ADICITY
    return TWO_ADIC_GENERATORS[bits]


class WhirConfig:
    """(config.rs:117-443)"""

    def __init__(self, params: WhirConfigBuilder, num_variables: int):
        params.folding_factor.check_validity(num_variables)
        assert (params.rs_domain_initial_reduction_factor
                <= params.folding_factor.at_round(0)), \
            "Increasing the code rate is not a good idea"

        st = SecurityAssumption(params.soundness_type)
        query_security_level = max(0, params.security_level - params.pow_bits)
        field_size_bits = EF_BITS
        log_inv_rate = params.starting_log_inv_rate

        log_domain_size = num_variables + log_inv_rate
        domain_size = 1 << log_domain_size
        log_folded_domain_size = log_domain_size - params.folding_factor.at_round(0)
        assert log_folded_domain_size <= TWO_ADICITY, "Increase folding_factor_0"

        num_rounds, final_sumcheck_rounds = \
            params.folding_factor.compute_number_of_rounds(
                num_variables, params.max_num_variables_to_send_coeffs)

        log_c_old = _compute_optimal_log_c_for_rate(
            params, st, field_size_bits, num_variables, log_inv_rate)

        self.commitment_ood_samples = st.determine_ood_samples(
            params.security_level, num_variables, log_inv_rate,
            field_size_bits, log_c_old)

        starting_folding_pow_bits = _folding_pow_bits(
            params.security_level, st, field_size_bits, num_variables,
            log_inv_rate, log_c_old)

        round_parameters: list[RoundConfig] = []
        num_variables_moving = num_variables - params.folding_factor.at_round(0)
        for round_ in range(num_rounds):
            rs_reduction_factor = (params.rs_domain_initial_reduction_factor
                                   if round_ == 0 else 1)
            next_rate = log_inv_rate + (params.folding_factor.at_round(round_)
                                        - rs_reduction_factor)
            log_c_new = _compute_optimal_log_c_for_rate(
                params, st, field_size_bits, num_variables_moving, next_rate)
            num_queries = st.queries(query_security_level, log_inv_rate,
                                     log_c_old)
            ood_samples = st.determine_ood_samples(
                params.security_level, num_variables_moving, next_rate,
                field_size_bits, log_c_new)
            query_error = st.queries_error(log_inv_rate, num_queries, log_c_old)
            combination_error = _rbr_soundness_queries_combination(
                st, field_size_bits, num_variables_moving, next_rate,
                ood_samples, num_queries, log_c_new)
            query_pow_bits = max(
                0.0, params.security_level - min(query_error, combination_error))
            folding_pow_bits = _folding_pow_bits(
                params.security_level, st, field_size_bits,
                num_variables_moving, next_rate, log_c_new)
            folding_factor = params.folding_factor.at_round(round_)
            next_folding_factor = params.folding_factor.at_round(round_ + 1)
            folded_domain_gen = _two_adic_generator(
                domain_size.bit_length() - 1 - folding_factor)

            round_parameters.append(RoundConfig(
                query_pow_bits=math.ceil(query_pow_bits),
                folding_pow_bits=math.ceil(folding_pow_bits),
                num_queries=num_queries,
                ood_samples=ood_samples,
                log_inv_rate=log_inv_rate,
                num_variables=num_variables_moving,
                folding_factor=folding_factor,
                domain_size=domain_size,
                folded_domain_gen=folded_domain_gen,
            ))

            num_variables_moving -= next_folding_factor
            log_inv_rate = next_rate
            domain_size >>= rs_reduction_factor
            log_c_old = log_c_new

        final_queries = st.queries(query_security_level, log_inv_rate, log_c_old)
        final_query_pow_bits = max(
            0.0, params.security_level
            - st.queries_error(log_inv_rate, final_queries, log_c_old))

        assert field_size_bits > params.security_level

        self.num_variables = num_variables
        self.starting_log_inv_rate = params.starting_log_inv_rate
        self.starting_folding_pow_bits = math.ceil(starting_folding_pow_bits)
        self.folding_factor = params.folding_factor
        self.rs_domain_initial_reduction_factor = \
            params.rs_domain_initial_reduction_factor
        self.round_parameters = round_parameters
        self.final_queries = final_queries
        self.final_query_pow_bits = math.ceil(final_query_pow_bits)
        self.final_sumcheck_rounds = final_sumcheck_rounds
        self.final_log_inv_rate = log_inv_rate
        self.soundness_type = params.soundness_type
        self.security_level = params.security_level
        self.pow_bits = params.pow_bits
        self.max_num_variables_to_send_coeffs = \
            params.max_num_variables_to_send_coeffs

    # --- helpers (config.rs:336-442) -------------------------------------
    def starting_domain_size(self) -> int:
        return 1 << (self.num_variables + self.starting_log_inv_rate)

    def n_rounds(self) -> int:
        return len(self.round_parameters)

    def rs_reduction_factor(self, round_: int) -> int:
        return (self.rs_domain_initial_reduction_factor if round_ == 0 else 1)

    def log_inv_rate_at(self, round_: int) -> int:
        res = self.starting_log_inv_rate
        for r in range(round_):
            res += self.folding_factor.at_round(r) - self.rs_reduction_factor(r)
        return res

    def merkle_tree_height(self, round_: int) -> int:
        return (self.log_inv_rate_at(round_) + self.num_variables
                - self.folding_factor.total_number(round_))

    def n_vars_of_final_polynomial(self) -> int:
        return (self.num_variables
                - self.folding_factor.total_number(self.n_rounds()))

    def max_folding_pow_bits(self) -> int:
        return max(r.folding_pow_bits for r in self.round_parameters)

    def final_round_config(self) -> RoundConfig:
        assert self.round_parameters
        rs_reduction_factor = self.rs_reduction_factor(self.n_rounds() - 1)
        folding_factor = self.folding_factor.at_round(self.n_rounds())
        last = self.round_parameters[-1]
        domain_size = last.domain_size >> rs_reduction_factor
        folded_domain_gen = _two_adic_generator(
            domain_size.bit_length() - 1 - folding_factor)
        return RoundConfig(
            num_variables=last.num_variables - folding_factor,
            folding_factor=folding_factor,
            num_queries=self.final_queries,
            query_pow_bits=self.final_query_pow_bits,
            domain_size=domain_size,
            folded_domain_gen=folded_domain_gen,
            ood_samples=last.ood_samples,
            folding_pow_bits=0,
            log_inv_rate=last.log_inv_rate,
        )


def default_whir_config_builder(starting_log_inv_rate: int,
                                conjectured: bool = False) -> WhirConfigBuilder:
    """(lean_prover/src/lib.rs:34-50)"""
    assert 0 < starting_log_inv_rate
    return WhirConfigBuilder(
        starting_log_inv_rate=starting_log_inv_rate,
        soundness_type=CAPACITY_BOUND if conjectured else JOHNSON_BOUND,
    )
