"""Differential testing: compiled-bytecode execution vs direct AST
interpretation of the same zkDSL source (the reference's CPython guest
cross-checks, zkDSL.md:17-24, realized at the interpreter level —
compiler/interp.py docstring)."""

import numpy as np
import pytest

from leanmultisig_tpu.compiler import compile_program
from leanmultisig_tpu.compiler.interp import InterpError, interpret_program
from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.vm import ExecutionWitness, execute_bytecode
from leanmultisig_tpu.vm.memory import RunnerError


def both(src, pub, witness_fn, import_resolver=None):
    """Run (compiled, interpreted); -> (ok_compiled, ok_interp)."""
    bc = compile_program(src, import_resolver=import_resolver)
    try:
        execute_bytecode(bc, pub, witness_fn())
        ok_c = True
    except (RunnerError, AssertionError, Exception):
        ok_c = False
    try:
        interpret_program(src, pub, witness_fn(),
                          import_resolver=import_resolver)
        ok_i = True
    except Exception:
        ok_i = False
    return ok_c, ok_i


CONSTRUCTS = '''
def main():
    pub = 0
    x = Array(4)
    hint_witness("vals", x)
    total: Mut = 0
    for i in range(0, 4):
        total = total + x[i]
    assert total == pub[0]

    # dynamic_unroll with a body-local temp
    acc: Mut = 0
    for j in dynamic_unroll(0, x[0], 3):
        t = x[1] * 2
        acc = acc + t
    assert acc == pub[1]

    # match_range dispatch with compile-time specialization
    s = match_range(x[2], range(0, 4), lambda n: pick(x, n))
    assert s == pub[2]

    # branches with Mut reassignment (phi lowering)
    y: Mut = 1
    if x[3] == 7:
        y = 100
    else:
        y = x[3] + 1
    assert y == pub[3]
    return

@inline
def pick(x, n: Const):
    return x[n] + n * 10
'''


def _pub_for(vals):
    total = sum(vals) % P
    acc = (vals[0] * (vals[1] * 2)) % P
    s = (vals[vals[2]] + vals[2] * 10) % P
    y = 100 if vals[3] == 7 else (vals[3] + 1) % P
    return [total, acc, s, y]


@pytest.mark.parametrize("vals", [[3, 5, 2, 7], [1, 9, 0, 4], [0, 2, 3, 7]])
def test_constructs_agree(vals):
    pub = _pub_for(vals)

    def witness():
        return ExecutionWitness(hints={"vals": [list(vals)]})

    ok_c, ok_i = both(CONSTRUCTS, pub, witness)
    assert ok_c and ok_i

    # tamper each public value: both reject identically
    for k in range(4):
        bad = list(pub)
        bad[k] = (bad[k] + 1) % P
        ok_c, ok_i = both(CONSTRUCTS, bad, witness)
        assert ok_c == ok_i == False  # noqa: E712


def test_xmss_guest_differential():
    """The production XMSS aggregation guest: compiled and interpreted
    executions agree on accept AND on reject (tampered chain tip)."""
    from leanmultisig_tpu.aggregation.driver import (build_public_input,
                                                     build_witness,
                                                     make_signers, sign_all)
    from leanmultisig_tpu.aggregation.guest import generate_guest

    signers = make_signers(2)
    rng = np.random.default_rng(5)
    message = rng.integers(0, P, size=8, dtype=np.uint32)
    sigs = sign_all(signers, message)
    pub_keys = [pk for _, pk in signers]
    src = generate_guest(2)
    pub = build_public_input(message, pub_keys)

    def witness():
        return build_witness(message, pub_keys, sigs)[1]

    ok_c, ok_i = both(src, pub, witness)
    assert ok_c and ok_i

    def bad_witness():
        w = build_witness(message, pub_keys, sigs)[1]
        w.hints["wots_sig"][0][10] = (w.hints["wots_sig"][0][10] + 1) % P
        return w

    ok_c, ok_i = both(src, pub, bad_witness)
    assert ok_c == ok_i == False  # noqa: E712


def test_interp_rejects_unconsumed_hints():
    src = "def main():\n    x = Array(2)\n    return\n"
    with pytest.raises((InterpError, RunnerError)):
        interpret_program(src, [0] * 8,
                          ExecutionWitness(hints={"vals": [[1, 2]]}))
