"""zkDSL compiler tests: compile -> execute -> check semantics.

Model: lean_compiler/tests/test_compiler.rs (inline programs).
"""

import numpy as np
import pytest

from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError


def run(src, public_input=(), hints=None):
    bytecode = compile_program(src)
    witness = ExecutionWitness(hints=hints or {})
    return execute_bytecode(bytecode, list(public_input), witness)


def test_arithmetic_and_assert():
    run("""
def main():
    x = 3 + 4 * 5
    y = x - 3
    z = y / 2
    assert z == 10
    assert x != 5
    return
""")


def test_function_calls():
    run("""
def main():
    a, b = swap(1, 2)
    assert a == 2
    assert b == 1
    s = add3(a, b, 10)
    assert s == 13
    return

def swap(a, b):
    return b, a

def add3(a, b, c):
    return a + b + c
""")


def test_const_specialization_and_unroll():
    run("""
def main():
    s = sum_squares(5)
    assert s == 30
    t = sum_squares(3)
    assert t == 5
    return

def sum_squares(n: Const):
    acc: Mut = 0
    for i in unroll(0, n):
        acc = acc + i * i
    return acc
""")


def test_if_else():
    run("""
def main():
    x = choose(0)
    assert x == 100
    y = choose(7)
    assert y == 200
    return

def choose(c):
    r: Imu
    if c == 0:
        r = 100
    else:
        r = 200
    return r
""")


def test_runtime_loop_with_mut():
    run("""
def main():
    sum: Mut = 0
    for i in range(1, 11):
        sum += i
    assert sum == 55
    return
""")


def test_loop_from_spec():
    """The worked example from zkDSL.md."""
    run("""
def main():
    x: Mut = 0
    y: Mut = 3
    x += y
    y += x
    for i in range(4, 6):
        x += i
        x += y
        y = i
        y += x
    assert x == 35
    assert y == 40
    return
""")


def test_arrays_and_pointers():
    run("""
SIZE = 8

def main():
    arr = Array(SIZE)
    for i in unroll(0, SIZE):
        arr[i] = i * i
    s = compute_sum(arr, SIZE)
    assert s == 140
    ptr2 = arr + 5
    assert ptr2[0] == 25
    return

def compute_sum(ptr, n: Const):
    acc: Mut = 0
    for i in unroll(0, n):
        acc = acc + ptr[i]
    return acc
""")


def test_match():
    run("""
def main():
    assert dispatch(5) == 500
    assert dispatch(6) == 600
    assert dispatch(7) == 700
    return

def dispatch(v):
    r: Imu
    match v:
        case 5:
            r = 500
        case 6:
            r = 600
        case 7:
            r = 700
    return r
""")


def test_match_range():
    run("""
def main():
    assert compute(3) == 9
    n = 4
    r = match_range(n, range(1, 8), lambda i: square_const(i))
    assert r == 16
    return

def compute(value):
    result = match_range(value, range(0, 10), lambda i: square_const(i))
    return result

def square_const(n: Const):
    return n * n
""")


def test_inline():
    run("""
def main():
    x = square(7)
    assert x == 49
    return

@inline
def square(x):
    return x * x
""")


def test_dyn_array():
    run("""
def main():
    v = DynArray([1, 2, 3])
    v.push(4)
    total: Mut = 0
    for i in unroll(0, len(v)):
        total = total + v[i]
    assert total == 10
    v.pop()
    assert len(v) == 3
    return
""")


def test_const_arrays():
    run("""
MATRIX = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]

def main():
    total: Mut = 0
    for row in unroll(0, len(MATRIX)):
        for col in unroll(0, len(MATRIX[row])):
            total = total + MATRIX[row][col]
    assert total == 45
    return
""")


def test_precompiles():
    """poseidon + extension op through the compiled path."""
    res = run("""
def main():
    left = Array(8)
    right = Array(8)
    out = Array(8)
    for i in unroll(0, 8):
        left[i] = i
        right[i] = i + 8
    poseidon16_compress(left, right, out)

    a = Array(10)
    b = Array(10)
    r = Array(5)
    for i in unroll(0, 10):
        a[i] = i + 1
        b[i] = 2 * i + 1
    dot_product_ee(a, b, r, 2)
    return
""")
    assert res.metadata["n_poseidons"] == 1
    assert res.metadata["n_extension_ops"] == 2


def test_hints_and_range_check():
    run("""
def main():
    buf = Array(4)
    hint_witness("w", buf)
    assert buf[0] == 11
    a = buf[1]
    assert a < 100
    b = Array(8)
    hint_decompose_bits(6, b, 3)
    assert b[0] == 1
    assert b[1] == 1
    assert b[2] == 0
    return
""", hints={"w": [[11, 22, 33, 44]]})


def test_public_input():
    # public input lives at absolute address 0 (zkDSL memory layout;
    # guest idiom: `pub_mem = 0` then pub_mem[i], zkdsl_implem/main.py:36)
    run("""
def main():
    pub_mem = 0
    x = pub_mem[0]
    y = pub_mem[1]
    assert x + y == 11
    return
""", public_input=[5, 6])


def test_fibonacci():
    run("""
def main():
    a: Mut = 0
    b: Mut = 1
    for i in range(0, 10):
        t = a + b
        a = b
        b = t
    assert a == 55
    return
""")


def test_compile_prove_verify():
    """The definitive drive: zkDSL source -> bytecode -> proof -> verify."""
    from test_e2e import _test_builder
    from leanmultisig_tpu.prover.prove import prove_execution
    from leanmultisig_tpu.prover.verify import verify_execution

    src = """
def main():
    pub_mem = 0
    left = Array(8)
    right = Array(8)
    out = Array(8)
    for i in unroll(0, 8):
        left[i] = pub_mem[0] + i
        right[i] = i * i
    poseidon16_compress(left, right, out)

    acc: Mut = 0
    for i in range(0, 10):
        acc += out[0] * i
    assert acc != 0

    a = Array(10)
    b = Array(10)
    r = Array(5)
    for i in unroll(0, 10):
        a[i] = i + 1
        b[i] = 2 * i + 3
    dot_product_ee(a, b, r, 2)
    return
"""
    bytecode = compile_program(src)
    public_input = [7, 0, 0]
    proof, metadata = prove_execution(bytecode, public_input,
                                      ExecutionWitness(), _test_builder())
    verify_execution(bytecode, public_input, proof, _test_builder())


def test_dynamic_unroll():
    """dynamic_unroll(start, a, n_bits): runtime-bounded unrolled loop
    with bit-decomposition gating (zkDSL.md:354)."""
    src = '''
def main():
    pub = 0
    n = pub[0]
    total: Mut = 0
    for i in dynamic_unroll(2, n, 3):
        total = total + i * i
    assert total == pub[1]
    return
'''
    bc = compile_program(src)
    for n in range(2, 10):
        expected = sum(i * i for i in range(2, n)) % P
        execute_bytecode(bc, [n, expected, 0, 0], ExecutionWitness())
    with pytest.raises((RunnerError, AssertionError)):
        execute_bytecode(bc, [5, 999, 0, 0], ExecutionWitness())


def test_sequential_and_multiassign_ifs():
    """Branch phi slots: one write per executed path, fresh pin per
    construct (sequential ifs + re-assignment within an arm)."""
    src = '''
def main():
    pub = 0
    a: Mut = 1
    if pub[0] == 1:
        a = a + 1
        a = a * 3
    if pub[1] == 1:
        a = a + 10
    assert a == pub[2]
    return
'''
    bc = compile_program(src)
    for args in ([1, 1, 16], [0, 1, 11], [0, 0, 1], [1, 0, 6]):
        execute_bytecode(bc, args, ExecutionWitness())
