"""AIR constraint tests: all non-bus constraints vanish on real traces
(random-alpha batched check), and break under trace corruption."""

import numpy as np

from leanmultisig_tpu.air import ops
from leanmultisig_tpu.air.builder import ConstraintFolder
from leanmultisig_tpu.air.tables_air import (TABLE_AIRS, ExtraDataForBuses,
                                             eval_table_air)
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.vm import tables as T

rng = np.random.default_rng(3)


def _trace_fixture():
    from test_vm import build_program
    from leanmultisig_tpu.vm import (ExecutionWitness, execute_bytecode,
                                     get_execution_trace)
    bytecode = build_program()
    res = execute_bytecode(bytecode, [5, 6, 7], ExecutionWitness())
    return get_execution_trace(bytecode, res)


def _shifted(col):
    return col[1:] + [col[-1]]


def _eval_non_bus(table, columns_np, shift_np):
    air = TABLE_AIRS[table]
    # alpha_powers[0] = 0 kills the bus constraint; rest random
    alphas = rng.integers(0, P, size=(air.n_constraints + 4, 5), dtype=np.uint32)
    alphas[0] = 0
    extra = ExtraDataForBuses(
        rng.integers(0, P, size=(16, 5), dtype=np.uint32),
        rng.integers(0, P, size=5, dtype=np.uint32))
    return eval_table_air(table, columns_np, shift_np, alphas, extra)


def test_air_constraints_vanish_on_real_traces():
    trace = _trace_fixture()
    for table in T.ALL_TABLES:
        air = TABLE_AIRS[table]
        t = trace.traces[table]
        cols = [np.array(c, np.uint32) for c in t.columns[:air.n_columns]]
        shift = [np.array(_shifted(t.columns[i]), np.uint32)
                 for i in range(air.n_shift)]
        acc = _eval_non_bus(table, cols, shift)
        assert not acc.any(), f"{table}: non-vanishing AIR constraints"


def test_air_constraints_catch_corruption():
    trace = _trace_fixture()
    for table in T.ALL_TABLES:
        air = TABLE_AIRS[table]
        t = trace.traces[table]
        cols = [np.array(c, np.uint32) for c in t.columns[:air.n_columns]]
        # corrupt one value in a meaningful column
        from leanmultisig_tpu.vm.isa import COL_AUX
        corrupt_col = {T.EXECUTION: COL_AUX, T.EXTENSION_OP: T.EXT_COL_COMP,
                       T.POSEIDON16: T.P16_COL_OUTPUT_LEFT}[table]
        cols[corrupt_col] = cols[corrupt_col].copy()
        cols[corrupt_col][0] = (cols[corrupt_col][0] + 1) % P
        shift = [np.array(_shifted(t.columns[i]), np.uint32)
                 for i in range(air.n_shift)]
        acc = _eval_non_bus(table, cols, shift)
        assert acc.any(), f"{table}: corruption not caught"


def test_constraint_count_matches_registry():
    """Walk each AIR once and count assert calls."""
    trace = _trace_fixture()

    class CountingFolder(ConstraintFolder):
        pass

    for table in T.ALL_TABLES:
        air = TABLE_AIRS[table]
        t = trace.traces[table]
        cols = [np.array(c[:4], np.uint32) for c in t.columns[:air.n_columns]]
        shift = [np.array(_shifted(t.columns[i])[:4], np.uint32)
                 for i in range(air.n_shift)]
        alphas = np.zeros((air.n_constraints + 8, 5), np.uint32)
        extra = ExtraDataForBuses(np.zeros((16, 5), np.uint32),
                                  np.zeros(5, np.uint32))
        folder = CountingFolder(cols, shift, alphas, extra)
        air.eval_fn(folder, extra)
        assert folder.constraint_index == air.n_constraints, \
            (table, folder.constraint_index, air.n_constraints)


def test_symbolic_constraint_dag():
    """Symbolic DAG: counts/degrees match the registry; DAG evaluation
    matches the vectorized folder on real trace rows."""
    from leanmultisig_tpu.air.symbolic import (degree, eval_sym,
                                               symbolic_constraints)
    trace = _trace_fixture()
    for table in T.ALL_TABLES:
        air = TABLE_AIRS[table]
        constraints, declared = symbolic_constraints(table)
        # registry counts the bus constraint too (+1)
        assert len(constraints) == air.n_constraints - 1, table
        assert len(declared) == 2  # [selector], [bus data]
        max_deg = max(degree(c) for c in constraints)
        assert max_deg <= air.degree, (table, max_deg)
        if table == T.POSEIDON16:
            assert max_deg == 10
        # numeric spot-check on row 0 of the real trace
        t = trace.traces[table]
        flat = [t.columns[i][0] for i in range(air.n_columns)]
        shift = [t.columns[i][1] for i in range(air.n_shift)]
        for c in constraints:
            assert eval_sym(c, flat, shift) == 0, table
