"""Symbolic AIR constraint DAG.

Analog of the reference SymbolicExpression machinery (air/src/symbolic.rs):
running each table's `eval` with symbolic values yields the constraint DAG
used for (a) structural validation (constraint count, per-constraint
degree) and (b) generating the in-VM verifier's constraint-evaluation
code (rec_aggregation/src/compilation.rs:405-507) in the recursion build.

Like the Rust `BUS=false` variant, symbolic extraction skips the bus
fingerprint and instead records the bus selector/data expressions via
`declare_values`.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field.constants import P


class Sym:
    __slots__ = ()


@dataclass(frozen=True)
class SymConst(Sym):
    value: int


@dataclass(frozen=True)
class SymVar(Sym):
    kind: str  # "flat" | "shift"
    col: int


@dataclass(frozen=True)
class SymOp(Sym):
    op: str  # "add" | "sub" | "mul"
    a: Sym
    b: Sym


def sym_const(v: int) -> Sym:
    return SymConst(v % P)


def _coerce(x) -> Sym:
    if isinstance(x, Sym):
        return x
    assert isinstance(x, int)
    return sym_const(x)


def sym_add(a, b) -> Sym:
    return SymOp("add", _coerce(a), _coerce(b))


def sym_sub(a, b) -> Sym:
    return SymOp("sub", _coerce(a), _coerce(b))


def sym_mul(a, b) -> Sym:
    return SymOp("mul", _coerce(a), _coerce(b))


def degree(expr: Sym, cache=None) -> int:
    if cache is None:
        cache = {}
    if id(expr) in cache:
        return cache[id(expr)]
    if isinstance(expr, SymConst):
        d = 0
    elif isinstance(expr, SymVar):
        d = 1
    else:
        da, db = degree(expr.a, cache), degree(expr.b, cache)
        d = da + db if expr.op == "mul" else max(da, db)
    cache[id(expr)] = d
    return d


def n_nodes(expr: Sym, seen=None) -> int:
    if seen is None:
        seen = set()
    if id(expr) in seen:
        return 0
    seen.add(id(expr))
    if isinstance(expr, SymOp):
        return 1 + n_nodes(expr.a, seen) + n_nodes(expr.b, seen)
    return 1


def eval_sym(expr: Sym, flat, shift, cache=None) -> int:
    """Evaluate a DAG numerically (base field ints) — test oracle."""
    if cache is None:
        cache = {}
    if id(expr) in cache:
        return cache[id(expr)]
    if isinstance(expr, SymConst):
        v = expr.value
    elif isinstance(expr, SymVar):
        v = int((flat if expr.kind == "flat" else shift)[expr.col])
    else:
        a = eval_sym(expr.a, flat, shift, cache)
        b = eval_sym(expr.b, flat, shift, cache)
        v = {"add": (a + b) % P, "sub": (a - b) % P,
             "mul": (a * b) % P}[expr.op]
    cache[id(expr)] = v
    return v


class SymbolicFolder:
    """AirBuilder collecting the constraint DAG (bus skipped via
    declare_values, mirroring the Rust BUS=false path)."""

    bus = False

    def __init__(self, n_flat: int, n_shift: int):
        self.flat_cols = [SymVar("flat", i) for i in range(n_flat)]
        self.shift_cols = [SymVar("shift", i) for i in range(n_shift)]
        self.constraints: list[Sym] = []
        self.declared: list[list[Sym]] = []
        # position the bus constraint occupies in the BUS=true folder's
        # constraint order (assert_zero_ef site == first declare_values)
        self.bus_constraint_index: int | None = None

    def flat(self):
        return self.flat_cols

    def shift(self):
        return self.shift_cols

    def assert_zero(self, x):
        self.constraints.append(_coerce(x))

    def assert_zero_ef(self, x):
        raise AssertionError("bus must use declare_values in symbolic mode")

    def assert_eq(self, x, y):
        self.assert_zero(sym_sub(x, y))

    def assert_eq_low(self, x, y):
        self.assert_eq(x, y)

    def assert_bool(self, x):
        self.assert_zero(sym_sub(sym_mul(x, x), x))

    def low_degree_block(self, state, block):
        block(self, state)

    def declare_values(self, values):
        if self.bus_constraint_index is None:
            self.bus_constraint_index = len(self.constraints)
        self.declared.append([_coerce(v) for v in values])


def symbolic_constraints(table: str, with_bus_index: bool = False):
    """-> (constraints DAG list, declared bus values[, bus index])."""
    from .tables_air import TABLE_AIRS
    air = TABLE_AIRS[table]
    folder = SymbolicFolder(air.n_columns, air.n_shift)
    air.eval_fn(folder, None)
    if with_bus_index:
        return folder.constraints, folder.declared, folder.bus_constraint_index
    return folder.constraints, folder.declared
