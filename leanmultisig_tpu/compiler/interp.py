"""Direct AST interpreter for the zkDSL — the differential-testing
reference for the compiler.

The reference project runs guest programs under CPython against a
`snark_lib` shim (zkDSL.md:17-24, lean_compiler/tests). This dialect's
ints-as-pointers (`pub = 0; pub[7]`) cannot run under plain Python, so
the analog here is an interpreter that executes the SAME source the
compiler consumes, sharing every semantic kernel with the VM — the
write-once `Memory`, the named-hint streams, `execute_custom_hint`,
`execute_poseidon16`, `execute_extension_op` (including unknown-operand
solving) — while replacing the compiled control flow (branch lowering,
loop->recursion, dynamic_unroll desugaring, match jump tables, call
frames) with direct evaluation. A program must succeed/fail identically
under `execute_bytecode` and `interpret_program`; divergence indicates
a code-generation bug (tests/test_interp.py).
"""

from __future__ import annotations

import ast

from ..field.constants import P
from ..vm.hints import CustomHintCall, execute_custom_hint
from ..vm.isa import Constant, ExtensionOpArgs, Poseidon16Args
from ..vm.memory import Memory, RunnerError
from ..vm.runner import ExecutionWitness, _RunnerState
from ..vm.tables import execute_extension_op, execute_poseidon16, new_traces
from .codegen import CT_BUILTINS, CUSTOM_HINTS, EXT_OPS, _ct_builtin
from .codegen import parse_module

class InterpError(RunnerError):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class GuestInterpreter:
    def __init__(self, module, public_input, witness: ExecutionWitness):
        self.module = module
        pub = [int(x) % P for x in public_input]
        # the runner pads the public region to a power of two
        # (vm/runner.py:113-115); preamble addresses assume it
        pub_padded = (1 if len(pub) <= 1
                      else 1 << (len(pub) - 1).bit_length())
        self.mem = Memory(pub + [0] * (pub_padded - len(pub)))
        self.ap = pub_padded + witness.preamble_memory_len
        self.state = _RunnerState(witness)
        self.traces = new_traces()
        self.ops = 0

    # --- helpers -----------------------------------------------------------
    def alloc(self, n: int) -> int:
        ptr = self.ap
        self.ap += int(n)
        return ptr

    def run_main(self) -> None:
        self.call_function("main", [])
        for name, (entries, cursor) in self.state.named_hints.items():
            if cursor[0] != len(entries):
                raise InterpError(
                    f"named hint '{name}' not fully consumed "
                    f"({cursor[0]}/{len(entries)})")

    def call_function(self, name: str, args: list):
        fdef = self.module.functions.get(name)
        if fdef is None:
            raise InterpError(f"unknown function {name}")
        env = dict(self.module.constants)
        assert len(fdef.params) == len(args), (name, fdef.params, args)
        for (pname, _kind), v in zip(fdef.params, args):
            env[pname] = v
        try:
            self.exec_block(fdef.body, env)
        except _Return as r:
            return r.value
        return None

    # --- statements ---------------------------------------------------------
    def exec_block(self, stmts, env) -> None:
        for stmt in stmts:
            self.exec_stmt(stmt, env)

    def exec_stmt(self, stmt, env) -> None:
        self.ops += 1
        if isinstance(stmt, ast.Expr):
            if isinstance(stmt.value, ast.Constant):
                return  # docstring
            self.eval(stmt.value, env)
        elif isinstance(stmt, ast.Assign):
            value = self.eval(stmt.value, env)
            assert len(stmt.targets) == 1
            self.assign(stmt.targets[0], value, env)
        elif isinstance(stmt, ast.AnnAssign):  # x: Mut = v
            if stmt.value is not None:
                self.assign(stmt.target, self.eval(stmt.value, env), env)
        elif isinstance(stmt, ast.AugAssign):
            cur = self.eval(ast.Name(id=stmt.target.id, ctx=ast.Load()),
                            env) if isinstance(stmt.target, ast.Name) \
                else self.eval(stmt.target, env)
            new = self.binop(type(stmt.op), cur, self.eval(stmt.value, env))
            self.assign(stmt.target, new, env)
        elif isinstance(stmt, ast.Assert):
            if not self.truth(stmt.test, env):
                raise InterpError(
                    f"guest assert failed: {ast.unparse(stmt.test)}")
        elif isinstance(stmt, ast.If):
            if self.truth(stmt.test, env):
                self.exec_block(stmt.body, env)
            else:
                self.exec_block(stmt.orelse, env)
        elif isinstance(stmt, ast.For):
            self.exec_for(stmt, env)
        elif isinstance(stmt, ast.Return):
            raise _Return(None if stmt.value is None
                          else self.eval(stmt.value, env))
        elif isinstance(stmt, ast.Pass):
            pass
        else:
            raise InterpError(f"unsupported statement {type(stmt)}")

    def exec_for(self, stmt, env) -> None:
        assert isinstance(stmt.iter, ast.Call)
        kind = stmt.iter.func.id
        var = stmt.target.id
        args = [self.eval(a, env) for a in stmt.iter.args]
        if kind in ("unroll", "range", "parallel_range"):
            lo, hi = int(args[0]), int(args[1])
        elif kind == "dynamic_unroll":
            lo, hi, n_bits = int(args[0]), int(args[1]), int(args[2])
            if not 0 <= hi - lo < (1 << n_bits):
                raise InterpError(
                    f"dynamic_unroll trip count {hi - lo} needs more "
                    f"than {n_bits} bits")
        else:
            raise InterpError(f"unsupported loop kind {kind}")
        for i in range(lo, hi):
            env[var] = i
            self.exec_block(stmt.body, env)

    def assign(self, target, value, env) -> None:
        if isinstance(target, ast.Name):
            env[target.id] = value
        elif isinstance(target, ast.Subscript):
            base = self.eval(target.value, env)
            idx = self.eval(target.slice, env)
            self.mem.set(int(base) + int(idx), int(value) % P)
        elif isinstance(target, ast.Tuple):
            assert isinstance(value, tuple) and len(value) == \
                len(target.elts)
            for t, v in zip(target.elts, value):
                self.assign(t, v, env)
        else:
            raise InterpError(f"unsupported assign target {type(target)}")

    # --- expressions ---------------------------------------------------------
    def truth(self, node, env) -> bool:
        assert isinstance(node, ast.Compare) and len(node.ops) == 1
        left = int(self.eval(node.left, env))
        right = int(self.eval(node.comparators[0], env))
        op = type(node.ops[0])
        if op is ast.Eq:
            return left % P == right % P
        if op is ast.NotEq:
            return left % P != right % P
        if op is ast.Lt:
            return left < right
        if op is ast.LtE:
            return left <= right
        raise InterpError(f"unsupported comparison {op}")

    def binop(self, op, a, b):
        a, b = int(a), int(b)
        if op is ast.Add:
            return (a + b) % P
        if op is ast.Sub:
            return (a - b) % P
        if op is ast.Mult:
            return (a * b) % P
        if op is ast.Div:
            # field division (the compiler lowers runtime `/` to a
            # multiply against an inverse; exact small-integer division
            # coincides)
            if b % P == 0:
                raise InterpError("division by zero")
            return (a * pow(b % P, P - 2, P)) % P
        if op is ast.Mod:
            return a % b
        if op is ast.Pow:
            return pow(a, b, P)
        raise InterpError(f"unsupported binop {op}")

    def eval(self, node, env):
        if isinstance(node, ast.Constant):
            if isinstance(node.value, str):
                return node.value  # hint names
            assert isinstance(node.value, int), node.value
            return node.value % P
        if isinstance(node, ast.Name):
            if node.id in env:
                return env[node.id]
            raise InterpError(f"unknown name {node.id}")
        if isinstance(node, ast.BinOp):
            return self.binop(type(node.op),
                              self.eval(node.left, env),
                              self.eval(node.right, env))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return (-self.eval(node.operand, env)) % P
        if isinstance(node, ast.Subscript):
            base = self.eval(node.value, env)
            idx = self.eval(node.slice, env)
            return self.mem.get(int(base) + int(idx))
        if isinstance(node, ast.Tuple):
            return tuple(self.eval(e, env) for e in node.elts)
        if isinstance(node, ast.Call):
            return self.eval_call(node, env)
        raise InterpError(f"unsupported expression {type(node)}")

    def eval_call(self, node, env):
        if not isinstance(node.func, ast.Name):
            raise InterpError("unsupported call target")
        fn = node.func.id

        if fn == "match_range":
            return self.eval_match_range(node, env)
        if fn == "debug_assert":
            if not self.truth(node.args[0], env):
                raise InterpError(
                    f"debug_assert failed: {ast.unparse(node.args[0])}")
            return None
        args = [self.eval(a, env) for a in node.args]

        if fn == "Array":
            return self.alloc(int(args[0]))
        if fn == "hint_witness":
            name = str(args[0])
            ptr = int(args[1])
            data = self.state.consume_named_hint(name)
            self.mem.set_slice(ptr, data)
            return None
        if fn in CUSTOM_HINTS:
            execute_custom_hint(
                CustomHintCall(fn, tuple(Constant(int(a)) for a in args)),
                self.mem, 0)
            return None
        if fn in EXT_OPS:
            op, is_be = EXT_OPS[fn]
            size = int(args[3]) if len(args) > 3 else 1
            execute_extension_op(int(args[0]), int(args[1]), int(args[2]),
                                 ExtensionOpArgs(size, op, is_be),
                                 self.mem, self.traces["extension_op"])
            return None
        if fn.startswith("poseidon16_"):
            half = "half" in fn
            permute = fn == "poseidon16_permute"
            if "hardcoded_left" in fn:
                data = Poseidon16Args(half_output=half,
                                      hardcoded_offset_left=int(args[3]))
            else:
                data = Poseidon16Args(half_output=half, permute=permute)
            execute_poseidon16(int(args[0]), int(args[1]), int(args[2]),
                               data, self.mem, self.traces["poseidon16"])
            return None
        if fn in CT_BUILTINS:
            return _ct_builtin(fn, [int(a) for a in args])
        if fn == "print":
            self.state.stdout.append(", ".join(str(int(a)) for a in args))
            return None
        if fn == "range":
            raise InterpError("bare range() outside a loop")
        return self.call_function(fn, args)

    def eval_match_range(self, node, env):
        value = int(self.eval(node.args[0], env))
        i = 1
        while i < len(node.args):
            rng, lam = node.args[i], node.args[i + 1]
            a = int(self.eval(rng.args[0], env))
            b = int(self.eval(rng.args[1], env))
            if a <= value < b:
                assert isinstance(lam, ast.Lambda)
                sub = dict(env)
                assert len(lam.args.args) == 1
                sub[lam.args.args[0].arg] = value
                return self.eval(lam.body, sub)
            i += 2
        raise InterpError(f"match_range: {value} outside all ranges")


def interpret_program(source: str, public_input, witness: ExecutionWitness,
                      import_resolver=None) -> dict:
    """Interpret a zkDSL program directly from source. Raises
    InterpError/RunnerError on any guest failure; returns metadata."""
    module = parse_module(source, import_resolver)
    interp = GuestInterpreter(module, public_input, witness)
    interp.run_main()
    return {"stdout": "\n".join(interp.state.stdout),
            "ops": interp.ops,
            "memory": len(interp.mem.cells)}
