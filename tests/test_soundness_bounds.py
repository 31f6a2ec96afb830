"""Protocol-bound soundness guards (core/constants.rs:47-82 analog).

These are compile-time invariants of the protocol constants, checked
against the REAL table definitions: if anyone widens a table, adds a
lookup, or raises a max size, these tests recompute the worst case and
fail before the field can overflow.
"""

from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.vm import tables as T
from leanmultisig_tpu.vm.isa import (MAX_LOG_MEMORY_SIZE,
                                     MIN_LOG_MEMORY_SIZE)


def test_logup_numerator_mass_below_p():
    """The logup fractional sum's numerators are lookup counts; their
    total must stay < p so counts cannot wrap (constants.rs:47-63).

    Worst case: every table at its max height, every row doing all of
    its memory lookups, one bytecode lookup per execution row, and one
    bus interaction per precompile-table row (push side counted too)."""
    total = 0
    for table in T.ALL_TABLES:
        rows = 1 << T.MAX_LOG_N_ROWS[table]
        n_lookups = len(T.table_lookups(table))
        n_bus = 1  # each table has exactly one bus (pull or push)
        total += rows * (n_lookups + n_bus)
    total += (1 << T.MAX_LOG_N_ROWS[T.EXECUTION])  # bytecode pull per row
    total += 1 << MAX_LOG_MEMORY_SIZE  # acc-count numerators, one per cell
    assert total < P, (total, P)


def test_commitment_surface_within_2_30():
    """memory + memory_acc + bytecode_acc + all committed table columns
    at max heights must fit the 2^30-point stacked polynomial
    (constants.rs:64-82)."""
    surface = 2 * (1 << MAX_LOG_MEMORY_SIZE)  # memory + acc counts
    surface += 1 << 16  # bytecode acc (max bytecode 2^16 rows)
    for table in T.ALL_TABLES:
        surface += T.table_n_columns(table) << T.MAX_LOG_N_ROWS[table]
    assert surface <= 1 << 30, surface


def test_debug_assert_range_precondition():
    """assert a < b is only sound for b >= 2^MIN_LOG_MEMORY_SIZE... i.e.
    the runner must REJECT upper bounds >= 2^16 (hint.rs:52,328-336):
    the range check pins a into [0, 2^16), so larger bounds would let
    a wrap. MIN_LOG_MEMORY_SIZE is the knob both sides share."""
    assert MIN_LOG_MEMORY_SIZE == 16
    assert MAX_LOG_MEMORY_SIZE == 26


def test_table_overflow_rejected():
    """_pad_table raises on a trace exceeding the protocol max rows."""
    import pytest
    from leanmultisig_tpu.vm.memory import RunnerError
    from leanmultisig_tpu.vm.trace_gen import _pad_table

    trace = T.TableTrace(T.table_n_columns(T.POSEIDON16) + 2)
    trace.log_n_rows = 0
    for col in trace.columns:
        col.extend([0] * ((1 << T.MAX_LOG_N_ROWS[T.POSEIDON16]) + 1))
    with pytest.raises(RunnerError, match="overflow"):
        _pad_table(T.POSEIDON16, trace, 0, 0, 0)
