"""VM execution tests: hand-assembled bytecode exercising every instruction
kind, hints, and both precompile tables (model: lean_vm execution/tests.rs +
lean_prover test_zkvm.rs at reduced scope)."""

import numpy as np

from leanmultisig_tpu.field.constants import P
from leanmultisig_tpu.poseidon import np_poseidon as npp
from leanmultisig_tpu.vm import (Bytecode, CodeEntry, Computation, Constant,
                                 Deref, ExtensionOpArgs, FpRel, Jump,
                                 MemAfterFp, Poseidon16Args, Precompile,
                                 ExecutionWitness, execute_bytecode,
                                 get_execution_trace)
from leanmultisig_tpu.vm.hints import (DebugAssert, HintWitness, Inverse,
                                       RequestMemory)
from leanmultisig_tpu.vm import tables as T
from leanmultisig_tpu.field import np_field as nf


def build_program():
    """Straight-line program:
      frame: 0=ptr_in, 1=ptr_in+8, 2=ptr_out, 3=one, 4=inv7, 5=ptr_ef
    """
    code = []

    def instr(i, hints=()):
        code.append(CodeEntry(i, tuple(hints)))

    # alloc 16 input cells + set one=1 (hint attached to first instruction)
    instr(Computation("add", Constant(1), Constant(0), MemAfterFp(3)),
          hints=[RequestMemory(0, Constant(16)),
                 RequestMemory(2, Constant(16)),
                 RequestMemory(5, Constant(25)),
                 Inverse(Constant(7), 4)])
    # write 0..16 into the input block: m[m[fp+0]+i] = i*i+1
    for i in range(16):
        instr(Deref(0, i, Constant((i * i + 1) % P)))
    # m[fp+1] = ptr_in + 8
    instr(Computation("add", MemAfterFp(0), Constant(8), MemAfterFp(1)))
    # poseidon16 compress: m[ptr_out..+8] = compress(m[ptr_in..+16])
    instr(Precompile(MemAfterFp(0), MemAfterFp(1), MemAfterFp(2),
                     Poseidon16Args()))
    # fill EF operands: a = 2 EF elements, b = 2 EF elements at ptr_ef
    for i in range(20):
        instr(Deref(5, i, Constant((3 * i + 2) % P)))
    # m[fp+6] = ptr_ef + 10 (b), m[fp+7] = ptr_ef + 20 (res)
    instr(Computation("add", MemAfterFp(5), Constant(10), MemAfterFp(6)))
    instr(Computation("add", MemAfterFp(5), Constant(20), MemAfterFp(7)))
    # dot_product_ee of length 2
    instr(Precompile(MemAfterFp(5), MemAfterFp(6), MemAfterFp(7),
                     ExtensionOpArgs(2, "mul", False)),
          hints=[DebugAssert(Constant(3), Constant(7), "<")])
    # conditional jump over a "bad" instruction
    jump_target = len(code) + 2
    instr(Jump(MemAfterFp(3), Constant(jump_target), FpRel(0)))
    instr(Computation("add", Constant(0), Constant(0), Constant(1)))  # skipped
    # mul: m[fp+8] = 7 * inv7 (must equal one)
    instr(Computation("mul", Constant(7), MemAfterFp(4), MemAfterFp(8)))
    # asserts m[fp+8] + 0 == 1 (all operands known -> equality check)
    instr(Computation("add", MemAfterFp(8), Constant(0), Constant(1)))
    # main-return convention (b_compile_intermediate.rs:568-583):
    # fp := 0 on the jump to ending_pc so padding rows chain cleanly
    instr(Computation("add", Constant(0), Constant(0), MemAfterFp(9)))
    from leanmultisig_tpu.vm.isa import pad_with_panics, padded_bytecode_size
    ending_pc = padded_bytecode_size(len(code) + 1) - 1
    instr(Jump(Constant(1), Constant(ending_pc), MemAfterFp(9)))
    pad_with_panics(code, ending_pc)

    return Bytecode(code, starting_frame_memory=16, ending_pc=ending_pc)


def test_vm_execute_and_trace():
    bytecode = build_program()
    public_input = [5, 6, 7]
    res = execute_bytecode(bytecode, public_input, ExecutionWitness())

    # poseidon result correct in memory
    mem = res.memory
    fp0 = res.fps[0]
    ptr_in = mem.get(fp0 + 0)
    ptr_out = mem.get(fp0 + 2)
    inputs = np.array(mem.get_slice(ptr_in, 16), np.uint32)
    expected = npp.compress(inputs)[:8]
    got = np.array(mem.get_slice(ptr_out, 8), np.uint32)
    assert np.array_equal(got, expected)

    # extension op result: dot product of 2 EF pairs
    ptr_ef = mem.get(fp0 + 5)
    a0 = np.array(mem.get_slice(ptr_ef, 5), np.uint32)
    a1 = np.array(mem.get_slice(ptr_ef + 5, 5), np.uint32)
    b0 = np.array(mem.get_slice(ptr_ef + 10, 5), np.uint32)
    b1 = np.array(mem.get_slice(ptr_ef + 15, 5), np.uint32)
    want = nf.eadd(nf.emul(a0, b0), nf.emul(a1, b1))
    got_ef = np.array(mem.get_slice(ptr_ef + 20, 5), np.uint32)
    assert np.array_equal(got_ef, want)

    # inverse hint: 7 * inv(7) == 1 checked in-program (add m[8]+0 == 1)
    assert mem.get(fp0 + 8) == 1

    # trace generation: all tables padded to power-of-two, poseidon replay ok
    trace = get_execution_trace(bytecode, res)
    for name, t in trace.traces.items():
        n = len(t.columns[0])
        assert n == 1 << t.log_n_rows
        assert all(len(c) == n for c in t.columns), name
        assert n >= 256

    pt = trace.traces[T.POSEIDON16]
    # first (real) row outputs must equal the compress of its inputs
    row_in = np.array([pt.columns[T.P16_COL_INPUT_START + j][0]
                       for j in range(16)], np.uint32)
    out_l = np.array([pt.columns[T.P16_COL_OUTPUT_LEFT + j][0]
                      for j in range(8)], np.uint32)
    assert np.array_equal(out_l, npp.compress(row_in)[:8])

    # padding row of poseidon hashes zeros
    out_pad = np.array([pt.columns[T.P16_COL_OUTPUT_LEFT + j][-1]
                        for j in range(8)], np.uint32)
    assert np.array_equal(out_pad, npp.compress(np.zeros(16, np.uint32))[:8])

    # extension op table: VA backfilled from memory
    et = trace.traces[T.EXTENSION_OP]
    assert et.columns[T.EXT_COL_VA][0] == int(a0[0])
    assert et.columns[T.EXT_COL_START][:2] == [1, 0]
    assert et.columns[T.EXT_COL_LEN][:2] == [2, 1]

    # execution trace: pc column starts at 0, ends (pre-padding) at ending_pc
    ex = trace.traces[T.EXECUTION]
    assert ex.columns[0][0] == 0
    assert ex.columns[0][ex.non_padded_n_rows - 1] == bytecode.ending_pc


def test_vm_named_hints_and_solving():
    """HintWitness streams + non-deterministic operand solving (division)."""
    code = [
        # m[fp+0..3] <- witness stream "w"
        CodeEntry(Computation("add", Constant(2), Constant(0), MemAfterFp(5)),
                  (HintWitness("w", offset=0),)),
        # division by constraint: m[fp+1] * 3 = m[fp+0]  (solves m[fp+1]... )
        # here: res known (m[fp+0]), arg_a unknown -> arg_a = res - arg_c
        CodeEntry(Computation("add", MemAfterFp(6), MemAfterFp(0),
                              MemAfterFp(1))),
        CodeEntry(Computation("mul", MemAfterFp(7), Constant(4),
                              MemAfterFp(2))),
        CodeEntry(Computation("add", Constant(0), Constant(0), MemAfterFp(9))),
        CodeEntry(Jump(Constant(1), Constant(5), MemAfterFp(9))),
        CodeEntry(Jump(Constant(1), Constant(5), FpRel(0))),
    ]
    bytecode = Bytecode(code, starting_frame_memory=10, ending_pc=5)
    witness = ExecutionWitness(hints={"w": [[11, 22, 33]]})
    res = execute_bytecode(bytecode, [1], witness)
    fp0 = res.fps[0]
    m = res.memory
    assert m.get_slice(fp0, 3) == [11, 22, 33]
    # m[6] solved: m[6] = m[1] - m[0] = 22 - 11
    assert m.get(fp0 + 6) == 11
    # m[7] solved: m[7] = m[2] / 4 = 33 * inv(4)
    assert (m.get(fp0 + 7) * 4) % P == 33
