"""AIR builder: alpha-weighted constraint folding.

Mirrors the reference ConstraintFolder (air/src/constraint_folder/normal.rs):
each assert_zero adds alpha^i * x into an extension accumulator. Values are
vectorized numpy arrays (see ops.py), so one `eval` call evaluates all rows
(or a single verifier point) at once.
"""

from __future__ import annotations

import numpy as np

from ..field import np_field as nf
from . import ops


class ConstraintFolder:
    """flat/shift: lists of column values (base (M,) or ext (M,5) arrays)."""

    def __init__(self, flat, shift, alpha_powers, extra_data):
        self.flat_cols = flat
        self.shift_cols = shift
        self.alpha_powers = alpha_powers  # (K, 5) ext array
        self.extra_data = extra_data
        self.accumulator = None  # ext (M, 5)
        self.constraint_index = 0

    def flat(self):
        return self.flat_cols

    def shift(self):
        return self.shift_cols

    def _accumulate(self, x_ext):
        alpha = self.alpha_powers[self.constraint_index]
        term = ops.mul(x_ext, np.broadcast_to(alpha, (1, 5)))
        if term.ndim == 1:
            term = term[None, :]
        self.accumulator = (term if self.accumulator is None
                            else nf.eadd(self.accumulator, term))
        self.constraint_index += 1

    def assert_zero(self, x):
        if not ops.is_ext(x):
            x = np.asarray(x, np.uint32)
            ext = np.zeros(x.shape + (5,), np.uint32)
            ext[..., 0] = x
            x = ext
        self._accumulate(x)

    def assert_zero_ef(self, x):
        self._accumulate(x)

    def assert_eq(self, x, y):
        self.assert_zero(ops.sub(x, y))

    def assert_eq_low(self, x, y):
        self.assert_eq(x, y)

    def assert_bool(self, x):
        self.assert_zero(ops.sub(ops.mul(x, x), x))

    def low_degree_block(self, state, block):
        block(self, state)

    def declare_values(self, values):
        pass


def eval_air_at(table_eval, flat, shift, alpha_powers, extra_data) -> np.ndarray:
    """Run `table_eval(builder)` and return the (M, 5) accumulator."""
    folder = ConstraintFolder(flat, shift, alpha_powers, extra_data)
    table_eval(folder)
    acc = folder.accumulator
    assert acc is not None
    return acc
