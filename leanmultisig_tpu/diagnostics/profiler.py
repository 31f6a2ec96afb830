"""Guest-side profiler: per-function exclusive/inclusive cycle report.

Analog of the reference's LocationReport-based profiler
(lean_vm/src/diagnostics/profiler.rs:8-94), driven from the executed pc
trace + the compiler's function-span map instead of in-bytecode hints
(the spans are metadata on Bytecode, outside the committed instruction
multilinear, so profiling never changes the proof).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass


@dataclass
class FunctionProfile:
    name: str
    calls: int
    exclusive_cycles: int
    inclusive_cycles: int


def profile_execution(bytecode, result) -> list[FunctionProfile]:
    """result: ExecutionResult (pcs + fps). Returns rows sorted by
    exclusive cycles descending.

    Calls/returns are inferred from the frame pointer: frames are bump-
    allocated, so fp strictly grows on call and returns restore a
    previous fp (vm/runner.py frame convention)."""
    spans = getattr(bytecode, "function_spans", None)
    if not spans:
        raise ValueError("bytecode has no function_spans "
                         "(compile with the bundled compiler)")
    starts = [pc for pc, _ in spans]
    names = [name for _, name in spans]

    def fn_at(pc: int) -> str:
        i = bisect.bisect_right(starts, pc) - 1
        return names[max(i, 0)]

    excl: dict[str, int] = {}
    incl: dict[str, int] = {}
    calls: dict[str, int] = {}
    stack: list[tuple[int, str]] = []  # (fp, fn)

    prev_fn = None
    for pc, fp in zip(result.pcs, result.fps):
        fn = fn_at(pc)
        if not stack:
            stack.append((fp, fn))
            calls[fn] = calls.get(fn, 0) + 1
        else:
            while len(stack) > 1 and fp < stack[-1][0]:
                stack.pop()
            if fp > stack[-1][0]:
                stack.append((fp, fn))
                calls[fn] = calls.get(fn, 0) + 1
            elif fn != stack[-1][1]:
                # same-frame transfer (inlined/branch label): reattribute
                stack[-1] = (fp, fn)
        excl[fn] = excl.get(fn, 0) + 1
        seen = set()
        for _, sfn in stack:
            if sfn not in seen:
                incl[sfn] = incl.get(sfn, 0) + 1
                seen.add(sfn)
        prev_fn = fn

    rows = [FunctionProfile(name, calls.get(name, 0), excl.get(name, 0),
                            incl.get(name, 0))
            for name in excl]
    rows.sort(key=lambda r: -r.exclusive_cycles)
    return rows


def format_profile(rows: list[FunctionProfile], top: int = 20) -> str:
    total = sum(r.exclusive_cycles for r in rows) or 1
    lines = [f"{'function':<32}{'calls':>8}{'excl':>10}{'%':>7}{'incl':>10}"]
    for r in rows[:top]:
        lines.append(f"{r.name:<32}{r.calls:>8}{r.exclusive_cycles:>10}"
                     f"{100 * r.exclusive_cycles / total:>6.1f}%"
                     f"{r.inclusive_cycles:>10}")
    return "\n".join(lines)
