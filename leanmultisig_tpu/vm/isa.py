"""zkVM ISA: operands, instructions, bytecode, field encoding.

Mirrors the reference ISA semantics (crates/lean_vm/src/isa/instruction.rs,
operands/*.rs, bytecode.rs) and the instruction field encoding
(crates/lean_compiler/src/instruction_encoder.rs:4-130). All field values
are canonical Python ints < P.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field.constants import P

DIMENSION = 5
DIGEST_LEN = 8

# Execution-table column indices (tables/execution/air.rs:8-36)
N_RUNTIME_COLUMNS = 8
N_INSTRUCTION_COLUMNS = 12
N_TOTAL_EXECUTION_COLUMNS = 20
COL_PC, COL_FP = 0, 1
COL_MEM_ADDRESS_A, COL_MEM_ADDRESS_B, COL_MEM_ADDRESS_C = 2, 3, 4
COL_MEM_VALUE_A, COL_MEM_VALUE_B, COL_MEM_VALUE_C = 5, 6, 7
COL_OPERAND_A, COL_OPERAND_B, COL_OPERAND_C = 8, 9, 10
COL_FLAG_A, COL_FLAG_B, COL_FLAG_C = 11, 12, 13
COL_FLAG_C_FP, COL_FLAG_AB_FP = 14, 15
COL_MUL, COL_JUMP, COL_AUX, COL_PRECOMPILE_DATA = 16, 17, 18, 19
N_TEMPORARY_EXEC_COLUMNS = 4
COL_IS_PRECOMPILE, COL_EXEC_NU_A, COL_EXEC_NU_B, COL_EXEC_NU_C = 20, 21, 22, 23


def instr_idx(col: int) -> int:
    return col - N_RUNTIME_COLUMNS


# Precompile data encodings (tables/poseidon_16/mod.rs:92-97,
# tables/extension_op/mod.rs:9-14)
POSEIDON_PRECOMPILE_DATA = 1
POSEIDON_PERMUTE_SHIFT = 1 << 1
POSEIDON_HALF_OUTPUT_SHIFT = 1 << 2
POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT = 1 << 3
POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT = 1 << 4
EXT_OP_FLAG_IS_BE = 4
EXT_OP_FLAG_ADD = 8
EXT_OP_FLAG_MUL = 16
EXT_OP_FLAG_POLY_EQ = 32
EXT_OP_LEN_MULTIPLIER = 64

STARTING_PC = 0
MIN_LOG_MEMORY_SIZE = 16
MAX_LOG_MEMORY_SIZE = 26
MIN_LOG_N_ROWS_PER_TABLE = 8
MIN_BYTECODE_LOG_SIZE = 8
LOGUP_MEMORY_DOMAINSEP = 0
LOGUP_PRECOMPILE_DOMAINSEP = 1
LOGUP_BYTECODE_DOMAINSEP = 2


# ----------------------------------------------------------------------------
# Operands
# ----------------------------------------------------------------------------


@dataclass(frozen=True)
class Constant:
    value: int


@dataclass(frozen=True)
class MemAfterFp:
    offset: int


@dataclass(frozen=True)
class FpRel:
    offset: int


MemOrConstant = Constant | MemAfterFp
MemOrFpOrConstant = Constant | MemAfterFp | FpRel


def read_operand(op, memory, fp: int) -> int | None:
    """Returns the value, or None when unknown (undefined memory)."""
    if isinstance(op, Constant):
        return op.value
    if isinstance(op, FpRel):
        return (fp + op.offset) % P
    return memory.try_get(fp + op.offset)


def operand_address(op, fp: int) -> int:
    assert isinstance(op, MemAfterFp), "not a pointer"
    return fp + op.offset


# ----------------------------------------------------------------------------
# Instructions
# ----------------------------------------------------------------------------


@dataclass(frozen=True)
class Computation:
    operation: str  # "add" | "mul"
    arg_a: MemOrConstant
    arg_c: MemOrFpOrConstant
    res: MemOrConstant


@dataclass(frozen=True)
class Deref:
    shift_0: int
    shift_1: int
    res: MemOrFpOrConstant


@dataclass(frozen=True)
class Jump:
    condition: MemOrConstant
    dest: MemOrConstant
    updated_fp: MemOrFpOrConstant
    label: str = ""


@dataclass(frozen=True)
class Poseidon16Args:
    half_output: bool = False
    hardcoded_offset_left: int | None = None
    permute: bool = False

    def precompile_data(self) -> int:
        flag_left = self.hardcoded_offset_left is not None
        off = self.hardcoded_offset_left or 0
        return (POSEIDON_PRECOMPILE_DATA
                + POSEIDON_PERMUTE_SHIFT * int(self.permute)
                + POSEIDON_HALF_OUTPUT_SHIFT * int(self.half_output)
                + POSEIDON_HARDCODED_LEFT_4_FLAG_SHIFT * int(flag_left)
                + POSEIDON_HARDCODED_LEFT_4_OFFSET_SHIFT * off)


@dataclass(frozen=True)
class ExtensionOpArgs:
    size: int
    op: str  # "add" | "mul" | "poly_eq"
    is_be: bool

    def flag_encoding(self) -> int:
        flag = {"add": EXT_OP_FLAG_ADD, "mul": EXT_OP_FLAG_MUL,
                "poly_eq": EXT_OP_FLAG_POLY_EQ}[self.op]
        return flag + int(self.is_be) * EXT_OP_FLAG_IS_BE

    def precompile_data(self) -> int:
        assert self.size >= 1
        return self.flag_encoding() + EXT_OP_LEN_MULTIPLIER * self.size


@dataclass(frozen=True)
class Precompile:
    arg_0: MemOrFpOrConstant
    arg_1: MemOrFpOrConstant
    res: MemOrFpOrConstant
    data: Poseidon16Args | ExtensionOpArgs


Instruction = Computation | Deref | Jump | Precompile


# ----------------------------------------------------------------------------
# Field encoding (instruction_encoder.rs:4-130)
# ----------------------------------------------------------------------------


def _set_nu_a(fields, a):
    if isinstance(a, Constant):
        fields[instr_idx(COL_FLAG_A)] = 1
        fields[instr_idx(COL_OPERAND_A)] = a.value % P
    else:
        fields[instr_idx(COL_OPERAND_A)] = a.offset


def _set_nu_b(fields, b):
    if isinstance(b, Constant):
        fields[instr_idx(COL_FLAG_B)] = 1
        fields[instr_idx(COL_OPERAND_B)] = b.value % P
    else:
        fields[instr_idx(COL_OPERAND_B)] = b.offset


def _set_nu_c(fields, c):
    if isinstance(c, FpRel):
        fields[instr_idx(COL_FLAG_C_FP)] = 1
        fields[instr_idx(COL_OPERAND_C)] = c.offset
    elif isinstance(c, MemAfterFp):
        fields[instr_idx(COL_OPERAND_C)] = c.offset
    else:
        fields[instr_idx(COL_FLAG_C)] = 1
        fields[instr_idx(COL_OPERAND_C)] = c.value % P


def field_representation(instr: Instruction) -> list[int]:
    fields = [0] * N_INSTRUCTION_COLUMNS
    if isinstance(instr, Computation):
        if instr.operation == "add":
            fields[instr_idx(COL_AUX)] = 1
        else:
            fields[instr_idx(COL_MUL)] = 1
        _set_nu_a(fields, instr.arg_a)
        _set_nu_b(fields, instr.res)
        _set_nu_c(fields, instr.arg_c)
    elif isinstance(instr, Deref):
        fields[instr_idx(COL_AUX)] = 2
        fields[instr_idx(COL_FLAG_A)] = 0
        fields[instr_idx(COL_OPERAND_A)] = instr.shift_0
        fields[instr_idx(COL_FLAG_B)] = 1
        fields[instr_idx(COL_OPERAND_B)] = instr.shift_1
        _set_nu_c(fields, instr.res)
    elif isinstance(instr, Jump):
        fields[instr_idx(COL_JUMP)] = 1
        _set_nu_a(fields, instr.condition)
        _set_nu_b(fields, instr.dest)
        _set_nu_c(fields, instr.updated_fp)
    else:
        assert isinstance(instr, Precompile)
        fields[instr_idx(COL_PRECOMPILE_DATA)] = instr.data.precompile_data()
        if isinstance(instr.arg_0, FpRel) and isinstance(instr.arg_1, FpRel):
            fields[instr_idx(COL_FLAG_AB_FP)] = 1
            fields[instr_idx(COL_OPERAND_A)] = instr.arg_0.offset
            fields[instr_idx(COL_OPERAND_B)] = instr.arg_1.offset
        else:
            assert not isinstance(instr.arg_0, FpRel)
            assert not isinstance(instr.arg_1, FpRel)
            _set_nu_a(fields, instr.arg_0)
            _set_nu_b(fields, instr.arg_1)
        _set_nu_c(fields, instr.res)
    return fields


# ----------------------------------------------------------------------------
# Bytecode
# ----------------------------------------------------------------------------


@dataclass
class CodeEntry:
    instruction: Instruction
    hints: tuple = ()


@dataclass
class Bytecode:
    """(isa/bytecode.rs:17-66)"""

    code: list[CodeEntry]
    starting_frame_memory: int
    ending_pc: int
    instructions_multilinear: np.ndarray = field(default=None)
    hash: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.instructions_multilinear is None:
            self.instructions_multilinear = build_instructions_multilinear(
                [e.instruction for e in self.code])
        if self.hash is None:
            from .poseidon_host import poseidon_compress_slice
            self.hash = poseidon_compress_slice(
                self.instructions_multilinear, use_iv=True)

    def size(self) -> int:
        return len(self.code)

    def log_size(self) -> int:
        return max((self.size() - 1).bit_length(), 0) if self.size() > 1 else 0


def panic_instruction():
    """0 * fp == 1 is unsatisfiable -> reaching this pc fails the proof
    (c_compile_final.rs:269-276)."""
    return Computation("mul", Constant(0), FpRel(0), Constant(1))


def padded_bytecode_size(n_real: int) -> int:
    """Instruction count including the ending self-loop slot: padded to at
    least 2^MIN_BYTECODE_LOG_SIZE and a power of two
    (c_compile_final.rs:102-105). `n_real` excludes the ending self-loop."""
    n = max(n_real + 1, 1 << MIN_BYTECODE_LOG_SIZE)
    return 1 << (n - 1).bit_length()


def pad_with_panics(code: list, ending_pc: int) -> None:
    """Fill pcs len(code)..ending_pc-1 with panic instructions, then place
    the ending self-loop at `ending_pc` (c_compile_final.rs:106-109)."""
    assert len(code) <= ending_pc
    while len(code) < ending_pc:
        code.append(CodeEntry(panic_instruction(), ()))
    code.append(CodeEntry(Jump(Constant(1), Constant(ending_pc), FpRel(0)),
                          ()))


def build_instructions_multilinear(instructions) -> np.ndarray:
    """Each instruction padded to 16 field columns; total padded to a power
    of two (c_compile_final.rs:133-139)."""
    cols_pot = 16  # N_INSTRUCTION_COLUMNS.next_power_of_two()
    out = []
    for instr in instructions:
        fields = field_representation(instr)
        out.extend(fields + [0] * (cols_pot - N_INSTRUCTION_COLUMNS))
    n = len(out)
    pot = 1 if n <= 1 else 1 << (n - 1).bit_length()
    out.extend([0] * (pot - n))
    return np.array(out, np.uint32)
