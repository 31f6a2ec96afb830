"""Batched multi-table AIR sumcheck with back-loaded batching.

Mirrors sub_protocols/src/air_sumcheck.rs: tables of different heights join
the shared challenge sequence late (scaled by k = Π earlier challenges);
variables fold right-to-left (LSB first). The reference's chunk-bit-reversed
3-phase SIMD storage is an internal layout — here the LSB-first fold is an
MSB-first fold over bit-reversed columns, and the eq table is rebuilt fresh
each round (as the reference does via SplitEq::new per round,
air_sumcheck.rs:226).
"""

from __future__ import annotations

import numpy as np

from ..air.tables_air import TABLE_AIRS, eval_table_air
from ..field import np_field as nf
from ..fs.prover import expand_bare_to_full
from ..poly import np_poly as pp

EXT_DIM = 5


class AirSumcheckSession:
    def __init__(self, table: str, flat_and_shift_cols: list,
                 eq_factor: np.ndarray, sum_: np.ndarray,
                 alpha_powers: np.ndarray, extra_data):
        """flat_and_shift_cols: base numpy columns, natural order, len 2^n.
        eq_factor: (n, 5) natural MSB-first point (the GKR suffix)."""
        self.table = table
        self.air = TABLE_AIRS[table]
        self.n_vars = flat_and_shift_cols[0].shape[0].bit_length() - 1
        assert eq_factor.shape[0] == self.n_vars
        # y-space: fold LSB-first == MSB-first over bit-reversed columns
        self.cols = [pp.bit_reverse_permutation(np.asarray(c, np.uint32))
                     for c in flat_and_shift_cols]
        self.eq_y = eq_factor[::-1].copy()  # eq_y[r] pairs with round r
        self.sum = np.asarray(sum_, np.uint32)
        self.missing = pp.EONE.copy()
        self.alpha_powers = alpha_powers
        self.extra_data = extra_data
        self.rounds_done = 0

    def initial_n_vars(self) -> int:
        return self.n_vars

    def bare_degree(self) -> int:
        return self.air.degree

    def eq_alpha(self) -> np.ndarray:
        return self.eq_y[self.rounds_done]

    def _eval_constraints(self, flat, shift) -> np.ndarray:
        return eval_table_air(self.table, flat, shift, self.alpha_powers,
                              self.extra_data)

    def compute_bare_round_poly(self) -> np.ndarray:
        """-> bare coefficients (degree+1, 5).

        All z-points {0, 2, ..., degree} are evaluated in ONE constraint
        pass by stacking z along the row axis (kills per-op numpy overhead
        at the small row counts the later rounds reach)."""
        degree = self.air.degree
        n_flat = self.air.n_columns
        half = self.cols[0].shape[0] // 2
        zs = np.array([0] + list(range(2, degree + 1)), np.uint32)
        n_z = len(zs)

        from ..native import get_fieldops_lib
        lib = get_fieldops_lib()
        stacked = []
        if lib is not None:
            import ctypes
            u32p = ctypes.POINTER(ctypes.c_uint32)
            zsc = np.ascontiguousarray(zs)
            zp = zsc.ctypes.data_as(u32p)
            for c in self.cols:
                cc = np.ascontiguousarray(c)
                cells = half * (1 if c.ndim == 1 else 5)
                out = np.empty((n_z * half,) if c.ndim == 1
                               else (n_z * half, 5), np.uint32)
                lib.stack_z(cc.ctypes.data_as(u32p), cells, zp, n_z,
                            out.ctypes.data_as(u32p))
                stacked.append(out)
        else:
            for c in self.cols:
                lo, hi = c[:half], c[half:]
                diff = nf.sub(hi, lo)
                if c.ndim == 1:
                    pts = nf.add(lo[None, :],
                                 nf.mul(diff[None, :], zs[:, None]))
                    stacked.append(pts.reshape(n_z * half))
                else:
                    pts = nf.add(lo[None, :, :],
                                 nf.mul(diff[None, :, :],
                                        zs[:, None, None]))
                    stacked.append(pts.reshape(n_z * half, 5))

        rest = self.eq_y[self.rounds_done + 1:]
        eq_table = pp.eval_eq(rest)  # (half, 5)

        acc = self._eval_constraints(stacked[:n_flat], stacked[n_flat:])
        acc = acc.reshape(n_z, half, 5)
        weighted = nf.emul(acc, eq_table[None, :, :])
        totals = nf.sum_mod(weighted, axis=1)  # (n_z, 5)
        p_evals = [nf.emul(totals[i], self.missing) for i in range(n_z)]

        alpha = self.eq_alpha()
        one_m = nf.esub(pp.EONE, alpha)
        num = nf.esub(self.sum, nf.emul(one_m, p_evals[0]))
        p_at_1 = nf.emul(num, nf.einv(alpha))
        zs = [0, 1] + list(range(2, degree + 1))
        ys = np.stack([p_evals[0], p_at_1] + p_evals[1:])
        coeffs = pp.lagrange_interpolation(zs, ys)
        if len(coeffs) < degree + 1:
            coeffs = np.concatenate(
                [coeffs, np.zeros((degree + 1 - len(coeffs), EXT_DIM),
                                  np.uint32)])
        return coeffs

    def process_challenge(self, challenge: np.ndarray,
                          bare_coeffs: np.ndarray) -> None:
        alpha = self.eq_alpha()
        eq_eval = nf.eadd(
            nf.emul(nf.esub(pp.EONE, alpha), nf.esub(pp.EONE, challenge)),
            nf.emul(alpha, challenge))
        self.sum = nf.emul(pp.horner_eval(bare_coeffs, challenge), eq_eval)
        self.missing = nf.emul(self.missing, eq_eval)
        self.cols = [pp.fold(c, challenge) for c in self.cols]
        self.rounds_done += 1

    def final_column_evals(self) -> np.ndarray:
        out = []
        for c in self.cols:
            if c.ndim == 1:
                out.append(pp.efrom_base_scalar(c[0]))
            else:
                out.append(c[0])
        return np.stack(out)


def prove_batched_air_sumcheck(prover_state, sessions: list,
                               eta: np.ndarray) -> np.ndarray:
    """(air_sumcheck.rs:636-681). Returns challenges in round order."""
    n_rounds = max(s.initial_n_vars() for s in sessions)
    max_full_degree = max(s.bare_degree() + 1 for s in sessions)
    eta_powers = [pp.EONE.copy()]
    for _ in range(1, len(sessions)):
        eta_powers.append(nf.emul(eta_powers[-1], eta))

    challenges = []
    k = [pp.EONE.copy() for _ in sessions]

    for round_ in range(n_rounds):
        combined = np.zeros((max_full_degree + 1, EXT_DIM), np.uint32)
        bare_polys = [None] * len(sessions)
        for idx, session in enumerate(sessions):
            join_round = n_rounds - session.initial_n_vars()
            scale = nf.emul(eta_powers[idx], k[idx])
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

        prover_state.add_sumcheck_polynomial(combined)
        challenge = prover_state.sample()
        challenges.append(challenge)

        for idx, session in enumerate(sessions):
            join_round = n_rounds - session.initial_n_vars()
            if round_ < join_round:
                k[idx] = nf.emul(k[idx], challenge)
            else:
                session.process_challenge(challenge, bare_polys[idx])

    return np.stack(challenges)


def compute_shifted_columns(n_shift: int, columns: list) -> list:
    """(air_sumcheck.rs:683-694)"""
    out = []
    for col in columns[:n_shift]:
        col = np.asarray(col, np.uint32)
        shifted = np.concatenate([col[1:], col[-1:]])
        out.append(shifted)
    return out


def natural_ordering_point_for_session(sumcheck_air_point: np.ndarray,
                                       log_n_rows: int) -> np.ndarray:
    return sumcheck_air_point[-log_n_rows:][::-1].copy()


def back_loaded_table_contribution(bus_point, sumcheck_air_point,
                                   natural_ordering_point, constraint_eval,
                                   eta_power) -> np.ndarray:
    """(verify_execution.rs:236-251)"""
    n_t = len(bus_point)
    suffix_start = len(sumcheck_air_point) - n_t
    eq_val = pp.eq_poly_outside(bus_point, natural_ordering_point)
    k_t = pp.EONE.copy()
    for v in sumcheck_air_point[:suffix_start]:
        k_t = nf.emul(k_t, v)
    return nf.emul(nf.emul(eta_power, k_t), nf.emul(eq_val, constraint_eval))
