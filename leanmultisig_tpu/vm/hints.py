"""VM hints: execution guidance not part of the verified bytecode.

Mirrors crates/lean_vm/src/isa/hint.rs. Hints run before their attached
instruction; they may write to memory but produce no trace rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field.constants import P
from .isa import MIN_LOG_MEMORY_SIZE, Constant, MemAfterFp, read_operand
from .memory import RunnerError


@dataclass(frozen=True)
class Inverse:
    arg: object  # MemOrConstant
    res_offset: int


@dataclass(frozen=True)
class RequestMemory:
    offset: int
    size: object  # MemOrConstant


@dataclass(frozen=True)
class Print:
    line_info: str
    content: tuple


@dataclass(frozen=True)
class DebugAssert:
    left: object
    right: object
    kind: str  # "==", "!=", "<", "<="
    preceds_runtime_inequality: bool = False


@dataclass(frozen=True)
class DerefHint:
    offset_src: int
    offset_target: int


@dataclass(frozen=True)
class Panic:
    message: str | None = None


@dataclass(frozen=True)
class ParallelBatchStart:
    n_args: int
    end_value: object  # MemOrConstant


@dataclass(frozen=True)
class HintWitness:
    name: str
    offset: int | None = None  # inline destination
    ptr_offset: int | None = None  # indirect destination


@dataclass(frozen=True)
class CustomHintCall:
    name: str  # one of CUSTOM_HINT names
    args: tuple  # MemOrFpOrConstant


def _read(op, memory, fp):
    v = read_operand(op, memory, fp)
    if v is None:
        raise RunnerError(f"hint read of undefined operand {op}")
    return v


def execute_custom_hint(hint: CustomHintCall, memory, fp: int) -> None:
    """(hint.rs:145-203)"""
    name = hint.name
    args = hint.args
    if name == "hint_decompose_bits_xmss":
        decomposed_ptr = _read(args[0], memory, fp)
        to_decompose_ptr = _read(args[1], memory, fp)
        num = _read(args[2], memory, fp)
        chunk = _read(args[3], memory, fp)
        assert 24 % chunk == 0
        idx = decomposed_ptr
        for i in range(num):
            value = memory.get(to_decompose_ptr + i)
            for j in range(24 // chunk):
                memory.set(idx, (value >> (chunk * j)) & ((1 << chunk) - 1))
                idx += 1
    elif name == "hint_decompose_bits_merkle_whir":
        decomposed_ptr = _read(args[0], memory, fp)
        value = _read(args[1], memory, fp)
        chunk = _read(args[2], memory, fp)
        assert 24 % chunk == 0
        for j in range(24 // chunk):
            memory.set(decomposed_ptr + j,
                       (value >> (chunk * j)) & ((1 << chunk) - 1))
    elif name == "hint_decompose_bits":
        to_decompose = _read(args[0], memory, fp)
        memory_index = _read(args[1], memory, fp)
        num_bits = _read(args[2], memory, fp)
        assert num_bits <= 31
        for j in range(num_bits):  # big-endian
            memory.set(memory_index + j,
                       (to_decompose >> (num_bits - 1 - j)) & 1)
    elif name == "hint_less_than":
        a = _read(args[0], memory, fp)
        b = _read(args[1], memory, fp)
        assert isinstance(args[2], MemAfterFp)
        memory.set(fp + args[2].offset, int(a < b))
    elif name == "hint_log2_ceil":
        n = _read(args[0], memory, fp)
        assert isinstance(args[1], MemAfterFp)
        v = 0 if n <= 1 else (n - 1).bit_length()
        memory.set(fp + args[1].offset, v)
    else:
        raise RunnerError(f"unknown custom hint {name}")


def execute_hint(hint, memory, fp: int, runner_state) -> None:
    """runner_state carries ap / named hint cursors / deferred derefs /
    stdout (hint.rs:262-378)."""
    if isinstance(hint, RequestMemory):
        size = _read(hint.size, memory, fp)
        memory.set(fp + hint.offset, runner_state.ap)
        runner_state.ap += size
    elif isinstance(hint, CustomHintCall):
        execute_custom_hint(hint, memory, fp)
    elif isinstance(hint, Inverse):
        value = _read(hint.arg, memory, fp)
        memory.set(fp + hint.res_offset,
                   pow(value, P - 2, P) if value else 0)
    elif isinstance(hint, Print):
        values = [str(_read(c, memory, fp)) for c in hint.content]
        runner_state.stdout.append(
            f'"{hint.line_info}" -> {", ".join(values)}')
    elif isinstance(hint, DebugAssert):
        left = _read(hint.left, memory, fp)
        right = _read(hint.right, memory, fp)
        if hint.preceds_runtime_inequality:
            assert hint.kind == "<="
            if right >= 1 << MIN_LOG_MEMORY_SIZE:
                raise RunnerError(
                    f"range check with too big range: {right}")
        ok = {"==": left == right, "!=": left != right,
              "<": left < right, "<=": left <= right}[hint.kind]
        if not ok:
            raise RunnerError(f"debug assert failed: {left} {hint.kind} {right}")
    elif isinstance(hint, DerefHint):
        runner_state.pending_deref_hints.append(
            (fp + hint.offset_target, fp + hint.offset_src))
    elif isinstance(hint, Panic):
        if hint.message:
            runner_state.stdout.append(f"[PANIC] {hint.message}")
    elif isinstance(hint, ParallelBatchStart):
        pass  # parallel dispatch is a perf concern; sequential here
    elif isinstance(hint, HintWitness):
        data = runner_state.consume_named_hint(hint.name)
        if hint.offset is not None:
            dest = fp + hint.offset
        else:
            dest = memory.get(fp + hint.ptr_offset)
        memory.set_slice(dest, data)
    else:
        raise RunnerError(f"unknown hint {hint}")
