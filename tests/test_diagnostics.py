"""Guest profiler: per-function cycle attribution from the executed
trace (diagnostics/profiler.rs analog)."""

from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.diagnostics import format_profile, profile_execution
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode


def test_profile_counts_calls_and_cycles():
    src = '''
def helper(x):
    y: Mut = 0
    for i in unroll(0, 10):
        y = y + x * i
    return y

def main():
    acc: Mut = 0
    for i in unroll(0, 5):
        acc = acc + helper(i)
    assert acc == 450
    m = 0
    m[16] = 0
    return
'''
    bc = compile_program(src)
    res = execute_bytecode(bc, [0] * 16, ExecutionWitness())
    rows = profile_execution(bc, res)
    by_name = {r.name: r for r in rows}
    assert by_name["helper"].calls == 5
    assert by_name["main"].calls == 1
    assert by_name["helper"].exclusive_cycles > 50
    # main's inclusive time covers (almost) the whole run
    total = sum(r.exclusive_cycles for r in rows)
    assert by_name["main"].inclusive_cycles >= total - 2
    text = format_profile(rows)
    assert "helper" in text and "%" in text
