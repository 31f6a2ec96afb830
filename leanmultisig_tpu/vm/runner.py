"""VM execution runner (mirrors crates/lean_vm/src/execution/runner.rs).

Sequential execution: the reference's `parallel_range` rayon dispatch is a
host-side performance optimization with identical semantics; here every
iteration runs in order (ParallelBatchStart is a no-op), producing the same
memory, traces, and hint-consumption order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field.constants import P
from .hints import execute_hint
from .isa import (Bytecode, Computation, Deref, DIMENSION, ExtensionOpArgs,
                  Jump, Poseidon16Args, Precompile, STARTING_PC, Constant,
                  MemAfterFp, FpRel, read_operand, operand_address)
from .memory import Memory, RunnerError, UndefinedMemory
from .tables import (EXECUTION, EXTENSION_OP, POSEIDON16, execute_extension_op,
                     execute_poseidon16, new_traces)


@dataclass
class ExecutionWitness:
    preamble_memory_len: int = 0
    hints: dict[str, list[list[int]]] = field(default_factory=dict)


@dataclass
class ExecutionResult:
    memory: Memory
    public_memory_size: int
    pcs: list[int]
    fps: list[int]
    traces: dict
    metadata: dict


class _RunnerState:
    def __init__(self, witness: ExecutionWitness):
        self.ap = 0
        self.stdout: list[str] = []
        self.pending_deref_hints: list[tuple[int, int]] = []
        self.named_hints = {name: (entries, [0])
                            for name, entries in witness.hints.items()}

    def consume_named_hint(self, name: str) -> list[int]:
        entries, cursor = self.named_hints[name]
        idx = cursor[0]
        assert idx < len(entries), f"hint '{name}' exhausted"
        cursor[0] += 1
        return entries[idx]


def _op_str(op):
    return op


def _guest_stack_trace(bytecode, pcs, fps, fail_pc) -> str:
    """Function names on the live frame stack at the failing pc."""
    spans = getattr(bytecode, "function_spans", None)
    if not spans:
        return f"pc {fail_pc}"
    import bisect
    starts = [p for p, _ in spans]
    names = [n for _, n in spans]

    def fn_at(p):
        return names[max(bisect.bisect_right(starts, p) - 1, 0)]

    stack = []
    for p, f in zip(pcs, fps):
        while stack and f < stack[-1][0]:
            stack.pop()
        if not stack or f > stack[-1][0]:
            stack.append((f, fn_at(p)))
        elif fn_at(p) != stack[-1][1]:
            stack[-1] = (f, fn_at(p))
    chain = " -> ".join(n for _, n in stack) or "main"
    return f"{chain} (pc {fail_pc})"


def _compute(operation: str, a: int, b: int) -> int:
    return (a + b) % P if operation == "add" else (a * b) % P


def _inverse_compute(operation: str, res: int, known: int) -> int:
    if operation == "add":
        return (res - known) % P
    if known == 0:
        raise RunnerError("division by zero")
    return (res * pow(known, P - 2, P)) % P


def execute_bytecode(bytecode: Bytecode, public_input, witness: ExecutionWitness
                     ) -> ExecutionResult:
    """(runner.rs:236-349)"""
    import os
    if os.environ.get("LMS_NATIVE_VM", "1") != "0":
        from .native_runner import execute_bytecode_native
        result = execute_bytecode_native(bytecode, public_input, witness)
        if result is not None:
            return result
    return _execute_bytecode_py(bytecode, public_input, witness)


def _execute_bytecode_py(bytecode: Bytecode, public_input,
                         witness: ExecutionWitness) -> ExecutionResult:
    """Python interpreter: reference semantics + pretty diagnostics."""
    public_memory = list(int(v) for v in public_input)
    pot = 1 if len(public_memory) <= 1 else 1 << (len(public_memory) - 1).bit_length()
    public_memory += [0] * (pot - len(public_memory))
    public_memory_size = len(public_memory)

    memory = Memory(public_memory)
    fp = public_memory_size + witness.preamble_memory_len
    fp = -(-fp // DIMENSION) * DIMENSION
    state = _RunnerState(witness)
    initial_ap = fp + bytecode.starting_frame_memory
    state.ap = initial_ap
    pc = STARTING_PC

    traces = new_traces()
    pcs: list[int] = []
    fps: list[int] = []

    try:
        while True:
            if pc == bytecode.ending_pc:
                break
            if pc >= len(bytecode.code):
                raise RunnerError("PC out of bounds")
            pcs.append(pc)
            fps.append(fp)
            entry = bytecode.code[pc]

            for hint in entry.hints:
                execute_hint(hint, memory, fp, state)

            instr = entry.instruction
            if isinstance(instr, Computation):
                pc = _exec_computation(instr, memory, fp, pc)
            elif isinstance(instr, Deref):
                pc = _exec_deref(instr, memory, fp, pc)
            elif isinstance(instr, Jump):
                pc, fp = _exec_jump(instr, memory, fp, pc)
            else:
                assert isinstance(instr, Precompile)
                a0 = read_operand(instr.arg_0, memory, fp)
                a1 = read_operand(instr.arg_1, memory, fp)
                res = read_operand(instr.res, memory, fp)
                if a0 is None or a1 is None or res is None:
                    raise UndefinedMemory((pc, "precompile operand"))
                if isinstance(instr.data, Poseidon16Args):
                    execute_poseidon16(a0, a1, res, instr.data, memory,
                                       traces[POSEIDON16])
                else:
                    execute_extension_op(a0, a1, res, instr.data, memory,
                                         traces[EXTENSION_OP])
                pc += 1
    except (RunnerError, UndefinedMemory) as e:
        # pretty guest stack trace (runner.rs:42-54 analog)
        trace = _guest_stack_trace(bytecode, pcs, fps, pc)
        raise type(e)(f"{e.args[0] if e.args else e}\nguest stack "
                      f"(most recent call last): {trace}") from None

    _resolve_deref_hints(memory, state.pending_deref_hints)
    for name, (entries, cursor) in state.named_hints.items():
        assert cursor[0] == len(entries), \
            f"named hint '{name}' not fully consumed ({cursor[0]}/{len(entries)})"
    pcs.append(pc)
    fps.append(fp)

    import resource
    metadata = {
        "cycles": len(pcs),
        "memory": len(memory.cells),
        "n_poseidons": len(traces[POSEIDON16].columns[0]),
        "n_extension_ops": len(traces[EXTENSION_OP].columns[0]),
        "bytecode_size": len(bytecode.code),
        "public_input_size": len(public_input),
        "runtime_memory": state.ap - initial_ap,
        "memory_usage_percent": round(
            100.0 * len(memory.cells) / (1 << 26), 2),
        # peak-RSS observability (system-info/src/lib.rs:5-12; KiB on linux)
        "peak_rss_kib": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss,
        "stdout": "\n".join(state.stdout),
    }
    return ExecutionResult(memory, public_memory_size, pcs, fps, traces,
                           metadata)


def _exec_computation(instr, memory, fp, pc) -> int:
    """(instruction.rs:148-193): solve whichever operand is unknown."""
    res_v = read_operand(instr.res, memory, fp)
    a_v = read_operand(instr.arg_a, memory, fp)
    c_v = read_operand(instr.arg_c, memory, fp)
    if res_v is None:
        if a_v is None or c_v is None:
            raise UndefinedMemory((pc, "computation"))
        memory.set(operand_address(instr.res, fp),
                   _compute(instr.operation, a_v, c_v))
    elif a_v is None:
        if c_v is None:
            raise UndefinedMemory((pc, "computation"))
        memory.set(operand_address(instr.arg_a, fp),
                   _inverse_compute(instr.operation, res_v, c_v))
    elif c_v is None:
        memory.set(operand_address(instr.arg_c, fp),
                   _inverse_compute(instr.operation, res_v, a_v))
    else:
        if res_v != _compute(instr.operation, a_v, c_v):
            raise RunnerError(
                f"pc {pc}: computation mismatch {res_v} != "
                f"{_compute(instr.operation, a_v, c_v)}")
    return pc + 1


def _exec_deref(instr, memory, fp, pc) -> int:
    """res = m[m[fp + shift_0] + shift_1] (instruction.rs:194-212)."""
    res_v = read_operand(instr.res, memory, fp)
    if res_v is None:
        ptr = memory.get(fp + instr.shift_0)
        value = memory.try_get(ptr + instr.shift_1)
        if value is not None:
            memory.set(operand_address(instr.res, fp), value)
        # else: probably a range check, resolved later
    else:
        ptr = memory.get(fp + instr.shift_0)
        memory.set(ptr + instr.shift_1, res_v)
    return pc + 1


def _exec_jump(instr, memory, fp, pc):
    cond = read_operand(instr.condition, memory, fp)
    if cond is None:
        raise UndefinedMemory((pc, "jump condition"))
    assert cond in (0, 1)
    if cond == 0:
        return pc + 1, fp
    dest = read_operand(instr.dest, memory, fp)
    new_fp = read_operand(instr.updated_fp, memory, fp)
    if dest is None or new_fp is None:
        raise UndefinedMemory((pc, "jump"))
    return dest, new_fp


def _resolve_deref_hints(memory: Memory, pending) -> None:
    """(runner.rs:207-233)"""
    resolved = set()
    while True:
        progress = False
        for target_addr, src_addr in pending:
            if target_addr in resolved:
                continue
            addr = memory.cells[src_addr]
            assert addr is not None
            value = memory.try_get(addr)
            if value is None:
                continue
            memory.set(target_addr, value)
            resolved.add(target_addr)
            progress = True
        if not progress:
            break
    for target_addr, _ in pending:
        if target_addr not in resolved:
            memory.set(target_addr, 0)
