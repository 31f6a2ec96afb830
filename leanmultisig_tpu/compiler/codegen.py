"""zkDSL compiler: Python-AST front end -> 3-instruction ISA bytecode.

The zkDSL is Python-syntax-compatible (reference: lean_compiler/zkDSL.md),
so the front end is `ast.parse`; the code generator interleaves
compile-time evaluation (consts, unroll, DynArray, const-fn
specialization) with instruction emission. The semantics mirror the
reference compiler pipeline (a_simplify_lang -> b_compile_intermediate ->
c_compile_final): same calling convention
([ret_pc, saved_fp, args.., rets.., locals]),
the same if-lowering (inverse-hint booleanization,
b_compile_intermediate.rs:350-426), the same match jump tables, the same
range-check protocol (Deref-based, b_compile_intermediate.rs:673-698),
and the same mutable-in-loop buffering + loop->recursion transform
(zkDSL.md "From high level syntactic sugar to minimal ISA").
"""

from __future__ import annotations

import ast
import copy
from dataclasses import dataclass, field

from ..field.constants import P
from ..vm.hints import (CustomHintCall, DebugAssert, DerefHint, HintWitness,
                        Inverse, Panic, ParallelBatchStart, Print,
                        RequestMemory)
from ..vm.isa import (Bytecode, CodeEntry, Computation, Constant, Deref,
                      ExtensionOpArgs, FpRel, Jump, MemAfterFp,
                      Poseidon16Args, Precompile)
from .values import CompileError, CTArray, CTDynArray, Slot

# ---------------------------------------------------------------------------
# Symbolic link-time operands
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LabelRef:
    name: str


@dataclass(frozen=True)
class FrameSizeRef:
    label: str


EXT_OPS = {
    "add_ee": ("add", False), "add_be": ("add", True),
    "dot_product_ee": ("mul", False), "dot_product_be": ("mul", True),
    "poly_eq_ee": ("poly_eq", False), "poly_eq_be": ("poly_eq", True),
}

CUSTOM_HINTS = {"hint_decompose_bits_xmss": 4, "hint_decompose_bits_merkle_whir": 3,
                "hint_decompose_bits": 3, "hint_less_than": 3,
                "hint_log2_ceil": 2}

CT_BUILTINS = {"log2_ceil", "next_multiple_of", "div_ceil", "div_floor",
               "saturating_sub", "len"}


@dataclass
class FunctionDef:
    name: str
    params: list  # (name, kind) kind in {plain, const, mut}
    body: list
    inline: bool = False
    n_rets: int | None = None


@dataclass
class Module:
    constants: dict
    functions: dict  # name -> FunctionDef


@dataclass
class FnInstance:
    label: str
    fdef: FunctionDef
    const_bindings: dict
    n_runtime_args: int
    n_rets: int = 0
    code: list = field(default_factory=list)  # label markers + CodeEntry
    frame_size: int = 0
    compiled: bool = False


# ---------------------------------------------------------------------------
# Front end
# ---------------------------------------------------------------------------


def parse_module(source: str, import_resolver=None) -> Module:
    tree = ast.parse(source)
    constants: dict = {}
    functions: dict = {}

    for node in tree.body:
        if isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if mod == "snark_lib":
                continue
            assert import_resolver is not None, f"cannot import {mod}"
            sub = parse_module(import_resolver(mod), import_resolver)
            constants.update(sub.constants)
            functions.update(sub.functions)
        elif isinstance(node, ast.Assign):
            assert len(node.targets) == 1 and isinstance(node.targets[0], ast.Name)
            constants[node.targets[0].id] = _const_literal(node.value, constants)
        elif isinstance(node, ast.FunctionDef):
            functions[node.name] = _parse_function(node)
        elif isinstance(node, (ast.Expr,)):
            continue  # docstrings
        else:
            raise CompileError(f"unsupported top-level node {type(node)}")
    return Module(constants, functions)


def _const_literal(node, consts):
    if isinstance(node, ast.List):
        return CTArray([_const_literal(e, consts) for e in node.elts])
    return _const_eval(node, consts)


def _const_eval(node, env):
    """Compile-time expression evaluator (ints + const arrays)."""
    if isinstance(node, ast.Constant):
        if isinstance(node.value, bool):
            return int(node.value)
        assert isinstance(node.value, int), node.value
        return node.value
    if isinstance(node, ast.Name):
        v = env[node.id]
        return v
    if isinstance(node, ast.BinOp):
        a = _const_eval(node.left, env)
        b = _const_eval(node.right, env)
        return _ct_binop(node.op, a, b)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return (-_const_eval(node.operand, env)) % P
    if isinstance(node, ast.Subscript):
        arr = _const_eval(node.value, env)
        idx = _const_eval(node.slice, env)
        return arr[idx]
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        fn = node.func.id
        args = [_const_eval(a, env) for a in node.args]
        return _ct_builtin(fn, args)
    raise CompileError(f"not a compile-time expression: {ast.dump(node)}")


def _ct_binop(op, a, b):
    if isinstance(op, ast.Add):
        return (a + b) % P
    if isinstance(op, ast.Sub):
        return (a - b) % P
    if isinstance(op, ast.Mult):
        return (a * b) % P
    if isinstance(op, ast.Div):
        return (a * pow(b, P - 2, P)) % P
    if isinstance(op, ast.Mod):
        return a % b
    if isinstance(op, ast.Pow):
        return pow(a, b, P)
    if isinstance(op, ast.FloorDiv):
        return a // b
    if isinstance(op, ast.LShift):
        return a << b
    if isinstance(op, ast.RShift):
        return a >> b
    raise CompileError(f"unsupported const binop {op}")


def _ct_builtin(fn, args):
    if fn == "log2_ceil":
        n = args[0]
        return 0 if n <= 1 else (n - 1).bit_length()
    if fn == "next_multiple_of":
        x, n = args
        return -(-x // n) * n
    if fn == "div_ceil":
        return -(-args[0] // args[1])
    if fn == "div_floor":
        return args[0] // args[1]
    if fn == "saturating_sub":
        return max(0, args[0] - args[1])
    if fn == "len":
        return len(args[0])
    raise CompileError(f"unknown compile-time builtin {fn}")


def _parse_function(node: ast.FunctionDef) -> FunctionDef:
    inline = any(isinstance(d, ast.Name) and d.id == "inline"
                 for d in node.decorator_list)
    params = []
    for a in node.args.args:
        kind = "plain"
        if a.annotation is not None:
            ann = a.annotation
            assert isinstance(ann, ast.Name)
            kind = {"Const": "const", "Mut": "mut", "Imu": "plain"}[ann.id]
        params.append((a.arg, kind))
    return FunctionDef(node.name, params, node.body, inline)


def _infer_n_rets(body) -> int:
    """All returns in a function share one arity (zkDSL.md Functions)."""
    arity = None
    for node in ast.walk(ast.Module(body=body, type_ignores=[])):
        if isinstance(node, ast.Return):
            if node.value is None:
                a = 0
            elif isinstance(node.value, ast.Tuple):
                a = len(node.value.elts)
            else:
                a = 1
            if arity is None:
                arity = a
            elif arity != a and a != 0 and arity != 0:
                raise CompileError("inconsistent return arity")
            else:
                arity = max(arity, a)
    return arity or 0


# ---------------------------------------------------------------------------
# Code generator
# ---------------------------------------------------------------------------


class Codegen:
    def __init__(self, module: Module):
        self.module = module
        self.instances: dict = {}
        self.order: list = []
        self.label_counter = 0
        self.synthetic_counter = 0

    def fresh_label(self, prefix: str) -> str:
        self.label_counter += 1
        return f"{prefix}_{self.label_counter}"

    def get_instance(self, name: str, const_bindings: dict,
                     n_runtime_args: int, fdef=None) -> FnInstance:
        key = (name, tuple(sorted((k, _ct_key(v))
                                  for k, v in const_bindings.items())))
        if key in self.instances:
            return self.instances[key]
        fdef = fdef or self.module.functions[name]
        label = f"fn_{name}_{len(self.instances)}"
        inst = FnInstance(label, fdef, const_bindings, n_runtime_args)
        inst.n_rets = _infer_n_rets(fdef.body)
        self.instances[key] = inst
        self.order.append(inst)
        FnCompiler(self, inst).compile()
        return inst

    def compile_program(self) -> Bytecode:
        main = self.module.functions.get("main")
        if main is None:
            raise CompileError("missing main function")
        assert all(k == "const" or True for _, k in main.params)
        main_inst = self.get_instance("main", {}, 0)

        # link: lay out instances (main first), resolve labels + frame sizes
        code: list[CodeEntry] = []
        label_pc: dict = {}
        for inst in self.order:
            for item in inst.code:
                if isinstance(item, str):
                    label_pc[item] = len(code)
                else:
                    code.append(item)
        # pad with panics to >= 2^MIN_BYTECODE_LOG_SIZE instructions, ending
        # self-loop at the last slot (c_compile_final.rs:102-109)
        from ..vm.isa import pad_with_panics, padded_bytecode_size
        ending_pc = padded_bytecode_size(len(code)) - 1
        label_pc["__end__"] = ending_pc
        pad_with_panics(code, ending_pc)

        frame_sizes = {inst.label: inst.frame_size for inst in self.order}

        def resolve_val(v):
            if isinstance(v, LabelRef):
                return label_pc[v.name]
            if isinstance(v, FrameSizeRef):
                return frame_sizes[v.label]
            return v

        def resolve_operand(op):
            if isinstance(op, Constant) and isinstance(op.value, (LabelRef,
                                                                  FrameSizeRef)):
                return Constant(resolve_val(op.value))
            return op

        final_code = []
        for entry in code:
            instr = entry.instruction
            if isinstance(instr, Computation):
                instr = Computation(instr.operation,
                                    resolve_operand(instr.arg_a),
                                    resolve_operand(instr.arg_c),
                                    resolve_operand(instr.res))
            elif isinstance(instr, Deref):
                instr = Deref(instr.shift_0, instr.shift_1,
                              resolve_operand(instr.res))
            elif isinstance(instr, Jump):
                instr = Jump(resolve_operand(instr.condition),
                             resolve_operand(instr.dest),
                             resolve_operand(instr.updated_fp), instr.label)
            hints = tuple(_resolve_hint(h, resolve_val) for h in entry.hints)
            final_code.append(CodeEntry(instr, hints))

        bc = Bytecode(final_code,
                      starting_frame_memory=main_inst.frame_size,
                      ending_pc=ending_pc)
        # pc -> source-function map for the guest profiler (metadata only;
        # not part of the committed instruction multilinear)
        bc.function_spans = sorted(
            (label_pc[inst.label], inst.fdef.name) for inst in self.order)
        return bc


def _ct_key(v):
    if isinstance(v, CTArray):
        return ("arr", tuple(_ct_key(x) for x in v.items))
    return v


def _resolve_hint(h, resolve_val):
    if isinstance(h, RequestMemory) and isinstance(h.size, Constant) \
            and isinstance(h.size.value, (LabelRef, FrameSizeRef)):
        return RequestMemory(h.offset, Constant(resolve_val(h.size.value)))
    return h


class FnCompiler:
    """Compiles one function instance."""

    def __init__(self, cg: Codegen, inst: FnInstance, synthetic_body=None,
                 synthetic_params=None):
        self.cg = cg
        self.inst = inst
        self.module = cg.module
        self.env: dict = dict(cg.module.constants)
        self.mutable: set = set()
        self.pinned: dict = {}  # name -> slot offset (writes go to the slot)
        self.pending_hints: list = []
        self.code = inst.code
        self.is_main = inst.fdef.name == "main" and synthetic_body is None
        self.synthetic_body = synthetic_body
        self.synthetic_params = synthetic_params

        # frame layout: [0 ret_pc, 1 saved_fp, args..., rets..., locals]
        params = (synthetic_params if synthetic_params is not None
                  else [p for p in inst.fdef.params])
        off = 2
        self.runtime_params = []
        for pname, kind in params:
            if pname in inst.const_bindings:
                self.env[pname] = inst.const_bindings[pname]
                if kind == "mut":
                    self.mutable.add(pname)
                continue
            self.env[pname] = Slot(off)
            if kind == "mut":
                self.mutable.add(pname)
            self.runtime_params.append(pname)
            off += 1
        assert len(self.runtime_params) == inst.n_runtime_args, \
            (inst.fdef.name, self.runtime_params, inst.n_runtime_args)
        self.ret_base = off
        off += inst.n_rets
        self.stack_pos = off
        inst.frame_size = max(inst.frame_size, off)

    # --- emission helpers -------------------------------------------------
    def emit(self, instr) -> None:
        self.code.append(CodeEntry(instr, tuple(self.pending_hints)))
        self.pending_hints = []

    def hint(self, h) -> None:
        self.pending_hints.append(h)

    def mark(self, label: str) -> None:
        self.code.append(label)

    def alloc(self, n: int = 1) -> int:
        off = self.stack_pos
        self.stack_pos += n
        self.inst.frame_size = max(self.inst.frame_size, self.stack_pos)
        return off

    def operand(self, v):
        """value -> MemOrConstant"""
        if isinstance(v, int):
            return Constant(v % P)
        if isinstance(v, Slot):
            return MemAfterFp(v.offset)
        raise CompileError(f"not a runtime value: {v}")

    def materialize(self, v) -> Slot:
        """Ensure the value lives in a frame slot (consts cached per fn)."""
        if isinstance(v, Slot):
            return v
        if not hasattr(self, "_const_slots"):
            self._const_slots = {}
            self._branch_depth = 0
        key = int(v) % P
        if key in self._const_slots:
            return self._const_slots[key]
        s = Slot(self.alloc())
        self.emit(Computation("add", self.operand(v), Constant(0),
                              MemAfterFp(s.offset)))
        # only dominator-position (non-branch) definitions are reusable
        if self._branch_depth == 0:
            self._const_slots[key] = s
        return s

    def _enter_branch(self):
        if not hasattr(self, "_const_slots"):
            self._const_slots = {}
            self._branch_depth = 0
        self._branch_depth += 1

    def _exit_branch(self):
        self._branch_depth -= 1

    # --- entry ------------------------------------------------------------
    def compile(self) -> None:
        self.mark(self.inst.label)
        body = (self.synthetic_body if self.synthetic_body is not None
                else self.inst.fdef.body)
        self.compile_block(body)
        # implicit return for functions that fall off the end
        if not (body and isinstance(body[-1], ast.Return)):
            assert self.inst.n_rets == 0, \
                f"{self.inst.fdef.name}: missing return of values"
            self.compile_return(ast.Return(value=None))

    def compile_block(self, stmts) -> None:
        for stmt in stmts:
            self.compile_stmt(stmt)

    # --- statements -------------------------------------------------------
    def compile_stmt(self, stmt) -> None:
        if isinstance(stmt, ast.Expr):
            if isinstance(stmt.value, ast.Constant):
                return  # docstring
            self.eval_expr(stmt.value, as_stmt=True)
        elif isinstance(stmt, ast.Assign):
            self.compile_assign(stmt)
        elif isinstance(stmt, ast.AnnAssign):
            self.compile_annassign(stmt)
        elif isinstance(stmt, ast.AugAssign):
            target = stmt.target
            assert isinstance(target, ast.Name)
            new = ast.Assign(
                targets=[target],
                value=ast.BinOp(left=ast.Name(id=target.id, ctx=ast.Load()),
                                op=stmt.op, right=stmt.value))
            self.compile_assign(new)
        elif isinstance(stmt, ast.Assert):
            self.compile_assert(stmt)
        elif isinstance(stmt, ast.If):
            self.compile_if(stmt)
        elif isinstance(stmt, ast.Match):
            self.compile_match(stmt)
        elif isinstance(stmt, ast.For):
            self.compile_for(stmt)
        elif isinstance(stmt, ast.Return):
            self.compile_return(stmt)
        elif isinstance(stmt, ast.Pass):
            pass
        else:
            raise CompileError(f"unsupported statement {type(stmt)}")

    def compile_assign(self, stmt: ast.Assign) -> None:
        assert len(stmt.targets) == 1
        target = stmt.targets[0]
        if isinstance(target, ast.Subscript):
            self.compile_store(target, stmt.value)
            return
        if isinstance(target, ast.Tuple):
            values = self.eval_expr(stmt.value)
            assert isinstance(values, tuple) and len(values) == len(target.elts)
            for t, v in zip(target.elts, values):
                assert isinstance(t, ast.Name)
                self.bind(t.id, v)
            return
        assert isinstance(target, ast.Name)
        value = self.eval_expr(stmt.value)
        self.bind(target.id, value)

    def bind(self, name: str, value) -> None:
        if name in self.pinned:
            # write into the pinned slot (declared var / branch phi)
            slot = self.pinned[name]
            if isinstance(value, Slot) and value.offset == slot:
                return
            self.emit(Computation("add", self.operand(value), Constant(0),
                                  MemAfterFp(slot)))
            self.env[name] = Slot(slot)
            return
        self.env[name] = value

    def compile_annassign(self, stmt: ast.AnnAssign) -> None:
        assert isinstance(stmt.target, ast.Name)
        name = stmt.target.id
        ann = stmt.annotation
        assert isinstance(ann, ast.Name) and ann.id in ("Mut", "Imu", "Const")
        if ann.id == "Mut":
            self.mutable.add(name)
        if stmt.value is None:
            # forward declaration: pin a slot
            slot = self.alloc()
            self.pinned[name] = slot
            self.env[name] = Slot(slot)
        else:
            self.bind(name, self.eval_expr(stmt.value))

    def compile_store(self, target: ast.Subscript, value_node) -> None:
        """ptr[i] = value  ->  m[ptr + i] = value (write-once)."""
        base = self.eval_expr(target.value)
        if isinstance(base, CTDynArray):
            raise CompileError("cannot assign into DynArray elements")
        idx = self.eval_expr(target.slice)
        value = self.eval_expr(value_node)
        ptr_slot, shift = self.pointer_shift(base, idx)
        res = (self.operand(value) if isinstance(value, int)
               else MemAfterFp(value.offset))
        self.emit(Deref(ptr_slot.offset, shift, res))

    def pointer_shift(self, base, idx):
        """-> (slot holding the pointer, const shift)."""
        base_slot = self.materialize(base)
        if isinstance(idx, int):
            return base_slot, idx
        # runtime index: ptr2 = ptr + idx
        ptr2 = self.binop_runtime("add", base_slot, idx)
        return ptr2, 0

    def compile_assert(self, stmt: ast.Assert) -> None:
        test = stmt.test
        if isinstance(test, ast.Constant) and test.value is False:
            msg = None
            if stmt.msg is not None and isinstance(stmt.msg, ast.Constant):
                msg = str(stmt.msg.value)
            self.hint(Panic(msg))
            self.emit(Computation("add", Constant(0), Constant(0), Constant(1)))
            return
        assert isinstance(test, ast.Compare) and len(test.ops) == 1
        left = self.eval_expr(test.left)
        right = self.eval_expr(test.comparators[0])
        op = test.ops[0]
        if isinstance(op, ast.Eq):
            if isinstance(left, int) and isinstance(right, int):
                if left % P != right % P:
                    raise CompileError(f"assert {left} == {right} fails")
                return
            self.emit(Computation("add", self.operand(left), Constant(0),
                                  self.operand(right)))
        elif isinstance(op, ast.NotEq):
            # z = a - b; w = 1/z (hint); constrain z*w == 1
            z = self.binop_runtime("sub", left, right)
            w = Slot(self.alloc())
            self.hint(Inverse(self.operand(z), w.offset))
            self.emit(Computation("mul", self.operand(z),
                                  MemAfterFp(w.offset), Constant(1)))
        elif isinstance(op, (ast.Lt, ast.LtE)):
            # range check (a_simplify_lang/mod.rs:2623-2664,
            #              b_compile_intermediate.rs:673-698)
            if isinstance(op, ast.Lt):
                bound = self.binop_runtime("sub", right, 1)
            else:
                bound = right
            self.hint(DebugAssert(self.operand(left), self.operand(bound),
                                  "<=", preceds_runtime_inequality=True))
            self.range_check(left, bound)
        else:
            raise CompileError(f"unsupported assert comparison {op}")

    def range_check(self, val, bound) -> None:
        """Prove val <= bound (< 2^16) via memory-bound derefs."""
        val_slot = self.materialize(val)
        aux1 = self.alloc()
        self.hint(DerefHint(val_slot.offset, aux1))
        self.emit(Deref(val_slot.offset, 0, MemAfterFp(aux1)))
        # complement: val + comp = bound
        comp = Slot(self.alloc())
        self.emit(Computation("add", self.operand(val_slot),
                              MemAfterFp(comp.offset), self.operand(bound)))
        aux3 = self.alloc()
        self.hint(DerefHint(comp.offset, aux3))
        self.emit(Deref(comp.offset, 0, MemAfterFp(aux3)))

    # --- if / match -------------------------------------------------------
    def _collect_assigned(self, stmts) -> set:
        names = set()
        for node in ast.walk(ast.Module(body=list(stmts), type_ignores=[])):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names.add(t.id)
                    elif isinstance(t, ast.Tuple):
                        names.update(e.id for e in t.elts
                                     if isinstance(e, ast.Name))
            elif isinstance(node, ast.AugAssign) and isinstance(node.target,
                                                                ast.Name):
                names.add(node.target.id)
        return names

    def _setup_branch_pins(self, branches) -> list:
        """Pin slots for outer vars assigned inside branches.

        Pins CREATED by this construct (4th tuple field) are released by
        _release_branch_pins when it closes — a later sibling branch must
        allocate a fresh slot (write-once memory); only pins inherited
        from an enclosing in-flight construct persist."""
        assigned = set()
        for b in branches:
            assigned |= self._collect_assigned(b)
        pins = []
        for name in sorted(assigned):
            if name in self.pinned:
                # forward-declared slot doubles as the phi slot
                pins.append((name, self.pinned[name], name in self.env
                             and self.env.get(name) is not None, False))
                continue
            had = (name in self.env
                   and isinstance(self.env.get(name), (Slot, int)))
            # phi slot is NOT registered in self.pinned: arm assignments
            # rebind env freely; _close_branch writes the final value once
            # per path (so re-assignment within an arm stays write-once)
            pins.append((name, self.alloc(), had, True))
        return pins

    def _release_branch_pins(self, pins) -> None:
        for name, slot, _had, _created in pins:
            self.env[name] = Slot(slot)

    def _close_branch(self, pins, env_before, assigned_here) -> None:
        """Write each pin's final value for this path: the branch's last
        binding if it assigned, else the pre-branch value (phi)."""
        for name, slot, had_value, _created in pins:
            if name in assigned_here:
                cur = self.env.get(name)
                if cur is None or (isinstance(cur, Slot)
                                   and cur.offset == slot):
                    continue
                self.emit(Computation("add", self.operand(cur), Constant(0),
                                      MemAfterFp(slot)))
            elif had_value:
                old = env_before.get(name)
                if old is None:
                    continue
                if isinstance(old, Slot) and old.offset == slot:
                    continue
                self.emit(Computation("add", self.operand(old), Constant(0),
                                      MemAfterFp(slot)))

    def booleanize(self, cond_value) -> Slot:
        """(b_compile_intermediate.rs:365-414): b = c * inv(c), with the
        constraint (1 - b) * c == 0."""
        c_op = self.operand(cond_value)
        inv_off = self.alloc()
        self.hint(Inverse(c_op, inv_off))
        prod = Slot(self.alloc())
        self.emit(Computation("mul", c_op, MemAfterFp(inv_off),
                              MemAfterFp(prod.offset)))
        one_minus = self.binop_runtime("sub", 1, prod)
        self.emit(Computation("mul", self.operand(one_minus),
                              self.operand_mfc(cond_value), Constant(0)))
        return prod

    def operand_mfc(self, v):
        if isinstance(v, int):
            return Constant(v % P)
        return MemAfterFp(v.offset)

    def compile_if(self, stmt: ast.If) -> None:
        test = stmt.test
        assert isinstance(test, ast.Compare) and len(test.ops) == 1
        op = test.ops[0]
        assert isinstance(op, (ast.Eq, ast.NotEq)), "if supports ==/!= only"
        left = self.eval_expr(test.left)
        right = self.eval_expr(test.comparators[0])
        then_branch, else_branch = stmt.body, stmt.orelse
        if isinstance(op, ast.Eq):
            then_branch, else_branch = else_branch, then_branch
        # now: if (left != right) then_branch else else_branch
        if isinstance(left, int) and isinstance(right, int):
            taken = then_branch if (left - right) % P != 0 else else_branch
            self.compile_block(taken)
            return

        diff = self.binop_runtime("sub", left, right)
        b = self.booleanize(diff)

        then_label = self.cg.fresh_label("if")
        end_label = self.cg.fresh_label("endif")
        pins = self._setup_branch_pins([then_branch, else_branch])
        env_before = dict(self.env)

        self.emit(Jump(MemAfterFp(b.offset), Constant(LabelRef(then_label)),
                       FpRel(0)))
        self._enter_branch()
        # else branch (fallthrough)
        assigned_else = self._collect_assigned(else_branch)
        self.compile_block(else_branch)
        self._close_branch(pins, env_before, assigned_else)
        self.emit(Jump(Constant(1), Constant(LabelRef(end_label)), FpRel(0)))
        # then branch
        self.mark(then_label)
        self.env.update({k: env_before[k] for k in env_before})
        assigned_then = self._collect_assigned(then_branch)
        self.compile_block(then_branch)
        self._close_branch(pins, env_before, assigned_then)
        self.emit(Jump(Constant(1), Constant(LabelRef(end_label)), FpRel(0)))
        self._exit_branch()
        self.mark(end_label)
        self._release_branch_pins(pins)

    def compile_match(self, stmt: ast.Match) -> None:
        value = self.eval_expr(stmt.subject)
        arms = []
        for case in stmt.cases:
            pat = case.pattern
            assert isinstance(pat, ast.MatchValue)
            arms.append((_const_eval(pat.value, self.env), case.body))
        arms.sort(key=lambda a: a[0])
        lo = arms[0][0]
        assert [a[0] for a in arms] == list(range(lo, lo + len(arms))), \
            "match patterns must be consecutive integers"
        if isinstance(value, int):
            for cv, body in arms:
                if cv == value:
                    self.compile_block(body)
                    return
            raise CompileError("no matching case for constant")
        self._emit_match(value, lo, [b for _, b in arms])

    def _emit_match(self, value: Slot, lo: int, bodies: list) -> None:
        """Jump table: dest = first_block + (value - lo) * block_size
        (b_compile_intermediate.rs:271-318)."""
        end_label = self.cg.fresh_label("endmatch")
        arm_labels = [self.cg.fresh_label("arm") for _ in bodies]
        pins = self._setup_branch_pins(bodies)
        env_before = dict(self.env)

        match_id = self.cg.fresh_label("match")
        block_size_ref = LabelRef(f"__match_block_{match_id}")
        # offset_from_lo = value - lo
        rel = self.binop_runtime("sub", value, lo) if lo != 0 else value
        # dest = first_arm + rel * block_size  (block size resolved later:
        # emit arms first with padding to equal length)
        # two-step: scaled = rel * block_size; Jump dest = scaled + first_arm
        scaled = Slot(self.alloc())
        dest = Slot(self.alloc())
        # We cannot know block size before compiling arms; compile arms into
        # temp buffers, pad, then emit. Simplest: compile arms into temp lists.
        saved_code = self.code
        arm_codes = []
        self._enter_branch()
        for body, label in zip(bodies, arm_labels):
            self.code = []
            env_snapshot = dict(self.env)
            assigned = self._collect_assigned(body)
            self.compile_block(body)
            self._close_branch(pins, env_before, assigned)
            self.emit(Jump(Constant(1), Constant(LabelRef(end_label)), FpRel(0)))
            arm_codes.append(self.code)
            self.env = env_snapshot
        self._exit_branch()
        self.code = saved_code

        block_size = max(sum(1 for it in ac if not isinstance(it, str))
                         for ac in arm_codes)
        self.emit(Computation("mul", self.operand(rel), Constant(block_size),
                              MemAfterFp(scaled.offset)))
        self.emit(Computation("add", MemAfterFp(scaled.offset),
                              Constant(LabelRef(arm_labels[0])),
                              MemAfterFp(dest.offset)))
        self.emit(Jump(Constant(1), MemAfterFp(dest.offset), FpRel(0)))
        for label, ac in zip(arm_labels, arm_codes):
            self.mark(label)
            n_instr = sum(1 for it in ac if not isinstance(it, str))
            self.code.extend(ac)
            for _ in range(block_size - n_instr):  # padding (never executed)
                self.emit(Computation("add", Constant(0), Constant(0),
                                      Constant(0)))
        self.mark(end_label)
        self._release_branch_pins(pins)

    # --- loops ------------------------------------------------------------
    def compile_for(self, stmt: ast.For) -> None:
        assert isinstance(stmt.iter, ast.Call) and \
            isinstance(stmt.iter.func, ast.Name)
        kind = stmt.iter.func.id
        assert isinstance(stmt.target, ast.Name)
        var = stmt.target.id
        if kind == "unroll":
            start = self.ct(stmt.iter.args[0])
            end = self.ct(stmt.iter.args[1])
            outer = self.env.get(var, None)
            had = var in self.env
            for i in range(start, end):
                self.env[var] = i
                self.compile_block(stmt.body)
            if had:
                self.env[var] = outer
            elif var in self.env:
                del self.env[var]
            return
        if kind in ("range", "parallel_range"):
            self._compile_runtime_loop(stmt, var, kind == "parallel_range")
            return
        if kind == "dynamic_unroll":
            self._compile_dynamic_unroll(stmt, var)
            return
        raise CompileError(f"unsupported loop kind {kind}")

    def _compile_dynamic_unroll(self, stmt, var: str) -> None:
        """dynamic_unroll(start, a, n_bits): iterate i in [start, a) with
        a - start < 2^n_bits, fully unrolled (zkDSL.md:354): the compiler
        emits the bit decomposition of a - start with boolean + recompose
        constraints, then per bit (MSB first) a conditional block of 2^j
        unrolled body copies advancing a runtime cursor."""
        start = self.ct(stmt.iter.args[0])
        a_src = ast.unparse(stmt.iter.args[1])
        n_bits = self.ct(stmt.iter.args[2])
        du = f"__du_{self.cg.fresh_label('d')}"

        class _SubVar(ast.NodeTransformer):
            def __init__(self, repl_src: str):
                self.repl_src = repl_src

            def visit_Name(self, node):
                if node.id == var and isinstance(node.ctx, ast.Load):
                    return ast.parse(self.repl_src, mode="eval").body
                return node

        lines = [f"{du}_d = ({a_src}) - {start}",
                 f"{du}_bits = Array({n_bits})",
                 f"hint_decompose_bits({du}_d, {du}_bits, {n_bits})",
                 f"{du}_sum: Mut = 0"]
        # pre-seed body-local names: every gated chunk is an if-arm, and
        # a skipped first chunk would otherwise phi-copy an UNDEFINED
        # prior value of a name first assigned inside the body
        for name in sorted(self._collect_assigned(stmt.body)):
            if name != var and name not in self.env:
                lines.append(f"{name} = 0")
        for jj in range(n_bits):
            w = 1 << (n_bits - 1 - jj)
            lines.append(f"{du}_b{jj} = {du}_bits[{jj}]")
            lines.append(f"assert {du}_b{jj} * {du}_b{jj} == {du}_b{jj}")
            lines.append(f"{du}_sum = {du}_sum + {du}_b{jj} * {w}")
        lines.append(f"assert {du}_sum == {du}_d")
        lines.append(f"{du}_c: Mut = {start}")
        for jj in range(n_bits):  # MSB first: bits[0] has weight 2^(n-1)
            chunk = 1 << (n_bits - 1 - jj)
            lines.append(f"if {du}_b{jj} == 1:")
            for k in range(chunk):
                sub = _SubVar(f"({du}_c + {k})")
                for s in stmt.body:
                    new = sub.visit(copy.deepcopy(s))
                    ast.fix_missing_locations(new)
                    for ln in ast.unparse(new).splitlines():
                        lines.append("    " + ln)
            lines.append(f"    {du}_c = {du}_c + {chunk}")
        src = "\n".join(lines)
        self.compile_block(ast.parse(src).body)

    def _loop_free_vars(self, body, loop_var: str) -> tuple[list, list]:
        """(runtime reads from outer env, outer Muts assigned in body)."""
        assigned = self._collect_assigned(body)
        loaded = set()
        for node in ast.walk(ast.Module(body=list(body), type_ignores=[])):
            if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
                loaded.add(node.id)
        mut_vars = sorted(n for n in assigned
                          if n in self.mutable and n in self.env
                          and n != loop_var)
        reads = sorted(n for n in loaded
                       if n != loop_var and n not in mut_vars
                       and isinstance(self.env.get(n), Slot))
        return reads, mut_vars

    def _compile_runtime_loop(self, stmt, var: str, parallel: bool) -> None:
        """range loop -> buffered Muts + recursive function
        (zkDSL.md 'From high level syntactic sugar to minimal ISA')."""
        start = self.eval_expr(stmt.iter.args[0])
        end = self.eval_expr(stmt.iter.args[1])
        reads, mut_vars = self._loop_free_vars(stmt.body, var)

        # size = end - start (runtime ok); buffers of size+1
        size = (end - start if isinstance(end, int) and isinstance(start, int)
                else self.binop_runtime("sub", end, start))
        size_p1 = (size + 1 if isinstance(size, int)
                   else self.binop_runtime("add", size, 1))
        buffers = {}
        for m in mut_vars:
            buf = Slot(self.alloc())
            self.hint(RequestMemory(buf.offset, self.operand(size_p1)))
            # touch the hint: attach to the write below
            cur = self.env[m]
            self.emit(Deref(buf.offset, 0, self.operand_mfc(cur)))
            buffers[m] = buf

        # synthetic loop function: params (i, end, reads..., bufs...)
        self.cg.synthetic_counter += 1
        fn_name = f"__loop_{self.cg.synthetic_counter}"
        params = [(var, "plain"), ("__end", "plain")]
        params += [(r, "plain") for r in reads]
        params += [(f"__buf_{m}", "plain") for m in mut_vars]
        const_bindings = {}

        fdef = FunctionDef(fn_name, params, None, False)
        label = f"fn_{fn_name}"
        inst = FnInstance(label, fdef, const_bindings, len(params))
        inst.n_rets = 0
        self.cg.instances[(fn_name, ())] = inst
        self.cg.order.append(inst)
        lc = FnCompiler(self.cg, inst, synthetic_body=[],
                        synthetic_params=params)
        # compile-time values from the enclosing scope stay visible
        for k, v in self.env.items():
            if not isinstance(v, Slot) and k not in lc.env:
                lc.env[k] = v
        lc.mutable |= set(mut_vars)
        lc.mark(inst.label)
        if parallel:
            end_op = lc.operand(lc.env["__end"])
            lc.hint(ParallelBatchStart(len(params), end_op))
        lc._compile_loop_body(stmt.body, var, mut_vars, start, fn_name)
        inst.compiled = True

        # call site: loop(start, end, reads..., bufs...)
        args = [start, end] + [self.env[r] for r in reads] \
            + [buffers[m] for m in mut_vars]
        self.emit_call(inst, args, n_rets=0)

        # after the loop: m = buf[size]
        for m in mut_vars:
            out = Slot(self.alloc())
            ptr_slot, shift = self.pointer_shift(buffers[m], size)
            self.emit(Deref(ptr_slot.offset, shift, MemAfterFp(out.offset)))
            self.env[m] = out

    def _compile_loop_body(self, body, var: str, mut_vars: list, start,
                           fn_name: str) -> None:
        """Body of the synthetic recursive loop function:
        if i == end: return; else: body; recurse(i+1)."""
        i_slot = self.env[var]
        end_slot = self.env["__end"]
        diff = self.binop_runtime("sub", i_slot, end_slot)
        b = self.booleanize(diff)
        body_label = self.cg.fresh_label("loopbody")
        # b != 0 -> continue looping
        self.emit(Jump(MemAfterFp(b.offset), Constant(LabelRef(body_label)),
                       FpRel(0)))
        # i == end: return
        self.emit(Jump(Constant(1), MemAfterFp(0), MemAfterFp(1), "ret"))
        self.mark(body_label)

        # idx = i - start; muts read from buffers
        idx = self.binop_runtime("sub", i_slot, start)
        for m in mut_vars:
            buf = self.env[f"__buf_{m}"]
            ptr_slot, shift = self.pointer_shift(buf, idx)
            v = Slot(self.alloc())
            self.emit(Deref(ptr_slot.offset, shift, MemAfterFp(v.offset)))
            self.env[m] = v
            self.mutable.add(m)
        self.compile_block(body)
        # write updated muts to buf[idx+1]
        idx_p1 = self.binop_runtime("add", idx, 1)
        for m in mut_vars:
            buf = self.env[f"__buf_{m}"]
            ptr_slot, shift = self.pointer_shift(buf, idx_p1)
            self.emit(Deref(ptr_slot.offset, shift,
                            self.operand_mfc(self.env[m])))
        # recurse(i+1, end, reads..., bufs...) in the original param order
        i_next = self.binop_runtime("add", i_slot, 1)
        args = [i_next, end_slot]
        for pname, _ in self.synthetic_params[2:]:
            args.append(self.env[pname])
        self.emit_call(self.inst, args, n_rets=0)
        self.emit(Jump(Constant(1), MemAfterFp(0), MemAfterFp(1), "ret"))

    # --- return -----------------------------------------------------------
    def compile_return(self, stmt: ast.Return) -> None:
        values = []
        if stmt.value is not None:
            v = self.eval_expr(stmt.value)
            values = list(v) if isinstance(v, tuple) else [v]
        if self.is_main:
            # main-return convention: fp := 0 (b_compile_intermediate.rs:568)
            zero = Slot(self.alloc())
            self.emit(Computation("add", Constant(0), Constant(0),
                                  MemAfterFp(zero.offset)))
            self.emit(Jump(Constant(1), Constant(LabelRef("__end__")),
                           MemAfterFp(zero.offset)))
            return
        assert len(values) == self.inst.n_rets, \
            (self.inst.fdef.name, len(values), self.inst.n_rets)
        for i, v in enumerate(values):
            self.emit(Computation("add", self.operand(v), Constant(0),
                                  MemAfterFp(self.ret_base + i)))
        self.emit(Jump(Constant(1), MemAfterFp(0), MemAfterFp(1), "ret"))

    # --- calls ------------------------------------------------------------
    def emit_call(self, inst: FnInstance, runtime_args: list, n_rets: int):
        """(b_compile_intermediate.rs:834-876)"""
        new_fp = self.alloc()
        self.hint(RequestMemory(new_fp, Constant(FrameSizeRef(inst.label))))
        ret_label = self.cg.fresh_label("ret")
        self.emit(Deref(new_fp, 0, Constant(LabelRef(ret_label))))
        self.emit(Deref(new_fp, 1, FpRel(0)))
        for i, arg in enumerate(runtime_args):
            self.emit(Deref(new_fp, 2 + i, self.operand_mfc(arg)))
        self.emit(Jump(Constant(1), Constant(LabelRef(inst.label)),
                       MemAfterFp(new_fp)))
        self.mark(ret_label)
        rets = []
        for i in range(n_rets):
            out = Slot(self.alloc())
            self.emit(Deref(new_fp, 2 + len(runtime_args) + i,
                            MemAfterFp(out.offset)))
            rets.append(out)
        if n_rets == 0:
            return None
        if n_rets == 1:
            return rets[0]
        return tuple(rets)

    # --- expressions ------------------------------------------------------
    def ct(self, node) -> int:
        v = self.eval_expr(node)
        if not isinstance(v, int):
            raise CompileError(f"expected compile-time value, got {v}")
        return v

    def binop_runtime(self, op: str, a, b):
        """a op b with folding; op in {add, sub, mul, div}.

        Pure slot(op)const / slot(op)slot results are CSE-cached at
        branch depth 0 (slots are write-once, so a computed expression
        never changes within a frame activation) — this collapses the
        pervasive `ptr + offset` operand arithmetic of generated guests
        to one Computation row per distinct expression."""
        if isinstance(a, int) and isinstance(b, int):
            if op == "add":
                return (a + b) % P
            if op == "sub":
                return (a - b) % P
            if op == "mul":
                return (a * b) % P
            return (a * pow(b, P - 2, P)) % P
        if not hasattr(self, "_expr_slots"):
            self._expr_slots = {}
        key = (op,
               a.offset if isinstance(a, Slot) else ("c", int(a) % P),
               b.offset if isinstance(b, Slot) else ("c", int(b) % P))
        cached = self._expr_slots.get(key)
        if cached is not None:
            return cached
        res = Slot(self.alloc())
        if op == "add":
            self.emit(Computation("add", self.operand(a), self.operand_mfc(b),
                                  MemAfterFp(res.offset)))
        elif op == "mul":
            self.emit(Computation("mul", self.operand(a), self.operand_mfc(b),
                                  MemAfterFp(res.offset)))
        elif op == "sub":
            # res = a - b  <=>  a = res + b
            self.emit(Computation("add", MemAfterFp(res.offset),
                                  self.operand_mfc(b), self.operand(a)))
        elif op == "div":
            # res = a / b  <=>  a = res * b
            self.emit(Computation("mul", MemAfterFp(res.offset),
                                  self.operand_mfc(b), self.operand(a)))
        if getattr(self, "_branch_depth", 0) == 0:
            self._expr_slots[key] = res
        return res

    def eval_expr(self, node, as_stmt: bool = False):
        if isinstance(node, ast.Constant):
            if isinstance(node.value, bool):
                return int(node.value)
            if node.value is None:
                return None
            assert isinstance(node.value, int)
            return node.value % P
        if isinstance(node, ast.Name):
            if node.id not in self.env:
                raise CompileError(f"unknown name {node.id}")
            return self.env[node.id]
        if isinstance(node, ast.List):
            return CTArray([self.eval_expr(e) for e in node.elts])
        if isinstance(node, ast.Tuple):
            return tuple(self.eval_expr(e) for e in node.elts)
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = self.eval_expr(node.operand)
            if isinstance(v, int):
                return (-v) % P
            return self.binop_runtime("sub", 0, v)
        if isinstance(node, ast.BinOp):
            a = self.eval_expr(node.left)
            b = self.eval_expr(node.right)
            if isinstance(a, int) and isinstance(b, int):
                return _ct_binop(node.op, a, b)
            if isinstance(node.op, ast.Add):
                return self.binop_runtime("add", a, b)
            if isinstance(node.op, ast.Sub):
                return self.binop_runtime("sub", a, b)
            if isinstance(node.op, ast.Mult):
                return self.binop_runtime("mul", a, b)
            if isinstance(node.op, ast.Div):
                return self.binop_runtime("div", a, b)
            raise CompileError(f"runtime binop {node.op} unsupported")
        if isinstance(node, ast.Subscript):
            base = self.eval_expr(node.value)
            idx = self.eval_expr(node.slice)
            if isinstance(base, (CTArray, CTDynArray)):
                assert isinstance(idx, int), "DynArray index must be const"
                return base[idx]
            ptr_slot, shift = self.pointer_shift(base, idx)
            out = Slot(self.alloc())
            self.emit(Deref(ptr_slot.offset, shift, MemAfterFp(out.offset)))
            return out
        if isinstance(node, ast.Call):
            return self.eval_call(node, as_stmt)
        if isinstance(node, ast.Attribute):
            raise CompileError(f"unsupported attribute {node.attr}")
        raise CompileError(f"unsupported expression {type(node)}")

    # --- calls dispatch ---------------------------------------------------
    def eval_call(self, node: ast.Call, as_stmt: bool):
        if isinstance(node.func, ast.Attribute):
            # DynArray methods
            base = self.eval_expr(node.func.value)
            assert isinstance(base, CTDynArray)
            if node.func.attr == "push":
                base.push(self.eval_expr(node.args[0]))
                return None
            if node.func.attr == "pop":
                base.pop()
                return None
            raise CompileError(f"unknown method {node.func.attr}")
        assert isinstance(node.func, ast.Name)
        fn = node.func.id

        if fn == "Array":
            size = self.eval_expr(node.args[0])
            ptr = Slot(self.alloc())
            self.hint(RequestMemory(ptr.offset, self.operand(size)))
            # RequestMemory writes m[fp+offset]; attach hint to next instr:
            # emit a no-op anchor only if no instruction will follow soon —
            # instead anchor now with a copy-to-self-free add.
            self._anchor_hints()
            return ptr
        if fn == "DynArray":
            arg = self.eval_expr(node.args[0]) if node.args else CTArray([])
            items = arg.items if isinstance(arg, (CTArray, CTDynArray)) else []
            return CTDynArray(list(items))
        if fn == "len":
            v = self.eval_expr(node.args[0])
            return len(v)
        if fn in CT_BUILTINS:
            args = [self.ct(a) for a in node.args]
            return _ct_builtin(fn, args)
        if fn == "print":
            ops = [self.operand(self.eval_expr(a)) for a in node.args]
            self.hint(Print("print", tuple(ops)))
            self._anchor_hints()
            return None
        if fn == "debug_assert":
            cmp = node.args[0]
            assert isinstance(cmp, ast.Compare)
            left = self.operand(self.eval_expr(cmp.left))
            right = self.operand(self.eval_expr(cmp.comparators[0]))
            kind = {ast.Eq: "==", ast.NotEq: "!=", ast.Lt: "<",
                    ast.LtE: "<="}[type(cmp.ops[0])]
            self.hint(DebugAssert(left, right, kind))
            self._anchor_hints()
            return None
        if fn == "hint_witness":
            name = node.args[0]
            assert isinstance(name, ast.Constant)
            ptr = self.materialize(self.eval_expr(node.args[1]))
            self.hint(HintWitness(str(name.value), ptr_offset=ptr.offset))
            self._anchor_hints()
            return None
        if fn in CUSTOM_HINTS:
            ops = [self.operand_mfc(self.eval_expr(a)) for a in node.args]
            self.hint(CustomHintCall(fn, tuple(ops)))
            self._anchor_hints()
            return None
        if fn == "match_range":
            return self.eval_match_range(node)
        if fn in EXT_OPS:
            op, is_be = EXT_OPS[fn]
            a = self.operand_mfc(self.eval_expr(node.args[0]))
            b = self.operand_mfc(self.eval_expr(node.args[1]))
            res = self.operand_mfc(self.eval_expr(node.args[2]))
            size = self.ct(node.args[3]) if len(node.args) > 3 else 1
            self.emit(Precompile(a, b, res, ExtensionOpArgs(size, op, is_be)))
            return None
        if fn.startswith("poseidon16_"):
            return self.eval_poseidon(fn, node)

        # user function
        fdef = self.module.functions.get(fn)
        if fdef is None:
            raise CompileError(f"unknown function {fn}")
        return self.call_user_function(fdef, node.args)

    def _anchor_hints(self):
        """Hints attach to the next emitted instruction; ensure timely
        execution by anchoring with a no-op when needed."""
        # We defer: hints stay pending and attach to the next real
        # instruction, which preserves execution order within this block.
        # A trailing anchor is emitted at function end if hints remain.
        pass

    def eval_poseidon(self, fn: str, node: ast.Call):
        half = "half" in fn
        permute = fn == "poseidon16_permute"
        hardcoded = "hardcoded_left" in fn
        args = [self.eval_expr(a) for a in node.args]
        if hardcoded:
            offset = args[3] if len(args) > 3 else None
            assert isinstance(offset, int)
            a0, a1, res = args[0], args[1], args[2]
            data = Poseidon16Args(half_output=half,
                                  hardcoded_offset_left=offset)
        else:
            a0, a1, res = args[0], args[1], args[2]
            data = Poseidon16Args(half_output=half, permute=permute)
        self.emit(Precompile(self.operand_mfc(a0), self.operand_mfc(a1),
                             self.operand_mfc(res), data))
        return None

    def eval_match_range(self, node: ast.Call):
        """match_range(v, range(a,b), lambda i: f(i), [range, lambda]...)"""
        value = self.eval_expr(node.args[0])
        pieces = []
        i = 1
        while i < len(node.args):
            rng = node.args[i]
            lam = node.args[i + 1]
            assert isinstance(rng, ast.Call) and rng.func.id == "range"
            a, b = self.ct(rng.args[0]), self.ct(rng.args[1])
            assert isinstance(lam, ast.Lambda)
            pieces.append((a, b, lam))
            i += 2
        if isinstance(value, int):
            for a, b, lam in pieces:
                if a <= value < b:
                    return self._apply_lambda(lam, value)
            raise CompileError("match_range constant out of range")

        # runtime: expand to a match over consecutive cases
        lo = pieces[0][0]
        bodies = []
        cases = []
        for a, b, lam in pieces:
            for v in range(a, b):
                cases.append((v, lam))
        # determine ret arity by compiling... assume lambda body is a call;
        # use a synthetic match emission capturing returned values via pins
        n_rets = self._lambda_arity(cases[0][1])
        ret_slots = [self.alloc() for _ in range(n_rets)]
        saved_pinned = dict(self.pinned)
        bodies_ast = []
        for v, lam in cases:
            bodies_ast.append((v, lam))

        # emit jump-table manually (mirrors _emit_match)
        end_label = self.cg.fresh_label("endmr")
        arm_labels = [self.cg.fresh_label("mrarm") for _ in cases]
        rel = self.binop_runtime("sub", value, lo) if lo != 0 else value
        scaled = Slot(self.alloc())
        dest = Slot(self.alloc())
        saved_code = self.code
        arm_codes = []
        self._enter_branch()
        for (v, lam), label in zip(cases, arm_labels):
            self.code = []
            rv = self._apply_lambda(lam, v)
            rvs = (list(rv) if isinstance(rv, tuple)
                   else ([] if rv is None else [rv]))
            assert len(rvs) == n_rets
            for s, r in zip(ret_slots, rvs):
                self.emit(Computation("add", self.operand(r), Constant(0),
                                      MemAfterFp(s)))
            self.emit(Jump(Constant(1), Constant(LabelRef(end_label)),
                           FpRel(0)))
            arm_codes.append(self.code)
        self._exit_branch()
        self.code = saved_code
        self.pinned = saved_pinned

        block_size = max(sum(1 for it in ac if not isinstance(it, str))
                         for ac in arm_codes)
        self.emit(Computation("mul", self.operand(rel), Constant(block_size),
                              MemAfterFp(scaled.offset)))
        self.emit(Computation("add", MemAfterFp(scaled.offset),
                              Constant(LabelRef(arm_labels[0])),
                              MemAfterFp(dest.offset)))
        self.emit(Jump(Constant(1), MemAfterFp(dest.offset), FpRel(0)))
        for label, ac in zip(arm_labels, arm_codes):
            self.mark(label)
            n_instr = sum(1 for it in ac if not isinstance(it, str))
            self.code.extend(ac)
            for _ in range(block_size - n_instr):
                self.emit(Computation("add", Constant(0), Constant(0),
                                      Constant(0)))
        self.mark(end_label)
        if n_rets == 0:
            return None
        if n_rets == 1:
            return Slot(ret_slots[0])
        return tuple(Slot(s) for s in ret_slots)

    def _lambda_arity(self, lam: ast.Lambda) -> int:
        body = lam.body
        if isinstance(body, ast.Tuple):
            return len(body.elts)
        if isinstance(body, ast.Call) and isinstance(body.func, ast.Name):
            name = body.func.id
            if name in self.module.functions:
                return _infer_n_rets(self.module.functions[name].body)
            return 0  # precompile / hint
        return 1

    def _apply_lambda(self, lam: ast.Lambda, value: int):
        assert len(lam.args.args) == 1
        pname = lam.args.args[0].arg
        saved = self.env.get(pname, "__missing__")
        self.env[pname] = value
        try:
            return self.eval_expr(lam.body)
        finally:
            if saved == "__missing__":
                self.env.pop(pname, None)
            else:
                self.env[pname] = saved

    def call_user_function(self, fdef: FunctionDef, arg_nodes: list):
        args = [self.eval_expr(a) for a in arg_nodes]
        assert len(args) == len(fdef.params), \
            (fdef.name, len(args), len(fdef.params))

        if fdef.inline:
            return self._inline_call(fdef, args)

        const_bindings = {}
        runtime_args = []
        for (pname, kind), v in zip(fdef.params, args):
            if kind == "const" or isinstance(v, (CTArray, CTDynArray)):
                const_bindings[pname] = v
            else:
                runtime_args.append((pname, v))
        n_rets = _infer_n_rets(fdef.body)
        inst = self.cg.get_instance(fdef.name, const_bindings,
                                    len(runtime_args), fdef)
        return self.emit_call(inst, [v for _, v in runtime_args], n_rets)

    def _inline_call(self, fdef: FunctionDef, args: list):
        """Inline expansion: bind args, compile body in the current frame."""
        saved_env = dict(self.env)
        saved_mut = set(self.mutable)
        for (pname, kind), v in zip(fdef.params, args):
            self.env[pname] = v
            if kind == "mut":
                self.mutable.add(pname)
        result = None
        for stmt in fdef.body:
            if isinstance(stmt, ast.Return):
                if stmt.value is not None:
                    result = self.eval_expr(stmt.value)
                break
            self.compile_stmt(stmt)
        self.env = saved_env
        self.mutable = saved_mut
        return result


def compile_program(source: str, import_resolver=None) -> Bytecode:
    module = parse_module(source, import_resolver)
    return Codegen(module).compile_program()
