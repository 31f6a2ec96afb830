"""Native (C) VM execution: bytecode pre-encoding + ctypes driver.

The hot fetch/exec loop (runner.rs:119-349) runs in native/vmrunner.c at
>10^7 cycles/s (the Python interpreter does ~10^5). Produces bit-identical
memory, execution trace, and precompile trace rows — asserted by
tests/test_native_runner.py. On any runtime error the caller re-runs
under the Python interpreter for exact diagnostics (errors are cold
paths; witness generation is the hot one).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..field.constants import P
from . import hints as H
from .isa import (Bytecode, Computation, Constant, Deref, DIMENSION,
                  ExtensionOpArgs, FpRel, Jump, MemAfterFp, Poseidon16Args,
                  Precompile, STARTING_PC)
from .memory import RunnerError
from .tables import (EXECUTION, EXTENSION_OP, POSEIDON16, N_COLS_TOTAL_EXT,
                     N_COLS_TOTAL_P16, TableTrace, new_traces)

# instruction record stride and kind codes (vmrunner.c)
_STRIDE = 10
_IK = {"add": 0, "mul": 1}
_OPK_CONST, _OPK_MEMFP, _OPK_FPREL = 0, 1, 2

# hint opcodes
(_HK_REQMEM, _HK_INV, _HK_PRINT, _HK_DBG, _HK_DEREF, _HK_PANIC, _HK_PAR,
 _HK_WIT, _HK_DX, _HK_DMW, _HK_DB, _HK_LT, _HK_L2C) = range(13)

_CMP = {"==": 0, "!=": 1, "<": 2, "<=": 3}

_CUSTOM = {"hint_decompose_bits_xmss": _HK_DX,
           "hint_decompose_bits_merkle_whir": _HK_DMW,
           "hint_decompose_bits": _HK_DB,
           "hint_less_than": _HK_LT,
           "hint_log2_ceil": _HK_L2C}

# p16 trace row layout produced by C (27 words) -> column indices
_P16_ROW_COLS = 27
_EXT_ROW_COLS = 26


def _op_enc(op) -> tuple[int, int]:
    if isinstance(op, Constant):
        return _OPK_CONST, int(op.value) % P
    if isinstance(op, FpRel):
        return _OPK_FPREL, int(op.offset)
    assert isinstance(op, MemAfterFp), op
    return _OPK_MEMFP, int(op.offset)


class EncodedProgram:
    """Flat int64 encoding of a Bytecode (cached on the object)."""

    def __init__(self, bytecode: Bytecode):
        n = len(bytecode.code)
        instr = np.zeros((n, _STRIDE), np.int64)
        hint_stream: list[int] = []
        hint_off = np.zeros(n + 1, np.int64)
        stream_names: list[str] = []
        name_to_id: dict[str, int] = {}
        print_lines: list[str] = []
        panic_msgs: list[str] = []

        for pc, entry in enumerate(bytecode.code):
            hint_off[pc] = len(hint_stream)
            for h in entry.hints:
                rec = self._encode_hint(h, name_to_id, stream_names,
                                        print_lines, panic_msgs)
                hint_stream.extend(rec)
            ins = entry.instruction
            row = instr[pc]
            if isinstance(ins, Computation):
                row[0] = _IK[ins.operation]
                row[1], row[2] = _op_enc(ins.arg_a)
                row[3], row[4] = _op_enc(ins.res)
                row[5], row[6] = _op_enc(ins.arg_c)
            elif isinstance(ins, Deref):
                row[0] = 2
                row[2] = ins.shift_0
                row[4] = ins.shift_1
                row[5], row[6] = _op_enc(ins.res)
            elif isinstance(ins, Jump):
                row[0] = 3
                row[1], row[2] = _op_enc(ins.condition)
                row[3], row[4] = _op_enc(ins.dest)
                row[5], row[6] = _op_enc(ins.updated_fp)
            else:
                assert isinstance(ins, Precompile)
                row[1], row[2] = _op_enc(ins.arg_0)
                row[3], row[4] = _op_enc(ins.arg_1)
                row[5], row[6] = _op_enc(ins.res)
                if isinstance(ins.data, Poseidon16Args):
                    row[0] = 4
                    d = ins.data
                    row[7] = (int(d.permute) | (int(d.half_output) << 1)
                              | (int(d.hardcoded_offset_left is not None)
                                 << 2))
                    row[8] = d.hardcoded_offset_left or 0
                    row[9] = d.precompile_data()
                else:
                    row[0] = 5
                    d = ins.data
                    row[7] = d.size
                    row[8] = {"add": 0, "mul": 1, "poly_eq": 2}[d.op]
                    row[9] = int(d.is_be)
        hint_off[n] = len(hint_stream)

        self.instr = np.ascontiguousarray(instr)
        self.hint_stream = np.asarray(hint_stream or [0], np.int64)
        self.hint_off = hint_off
        self.stream_names = stream_names
        self.print_lines = print_lines
        self.panic_msgs = panic_msgs
        self.ending_pc = bytecode.ending_pc

    @staticmethod
    def _encode_hint(h, name_to_id, stream_names, print_lines,
                     panic_msgs) -> list[int]:
        def rec(op, payload):
            return [op, len(payload)] + payload

        if isinstance(h, H.RequestMemory):
            k, v = _op_enc(h.size)
            return rec(_HK_REQMEM, [h.offset, k, v])
        if isinstance(h, H.Inverse):
            k, v = _op_enc(h.arg)
            return rec(_HK_INV, [k, v, h.res_offset])
        if isinstance(h, H.Print):
            line_idx = len(print_lines)
            print_lines.append(h.line_info)
            payload = [line_idx, len(h.content)]
            for c in h.content:
                k, v = _op_enc(c)
                payload += [k, v]
            return rec(_HK_PRINT, payload)
        if isinstance(h, H.DebugAssert):
            lk, lv = _op_enc(h.left)
            rk, rv = _op_enc(h.right)
            return rec(_HK_DBG, [lk, lv, rk, rv, _CMP[h.kind],
                                 int(h.preceds_runtime_inequality)])
        if isinstance(h, H.DerefHint):
            return rec(_HK_DEREF, [h.offset_src, h.offset_target])
        if isinstance(h, H.Panic):
            idx = len(panic_msgs)
            panic_msgs.append(h.message or "")
            return rec(_HK_PANIC, [idx])
        if isinstance(h, H.ParallelBatchStart):
            return rec(_HK_PAR, [])
        if isinstance(h, H.HintWitness):
            if h.name not in name_to_id:
                name_to_id[h.name] = len(stream_names)
                stream_names.append(h.name)
            sid = name_to_id[h.name]
            if h.offset is not None:
                return rec(_HK_WIT, [sid, 0, h.offset])
            return rec(_HK_WIT, [sid, 1, h.ptr_offset])
        assert isinstance(h, H.CustomHintCall), h
        op = _CUSTOM[h.name]
        payload = []
        for a in h.args:
            k, v = _op_enc(a)
            payload += [k, v]
        return rec(op, payload)


_ENC_CACHE: dict[int, EncodedProgram] = {}


def _encoded(bytecode: Bytecode) -> EncodedProgram:
    key = id(bytecode)
    enc = _ENC_CACHE.get(key)
    if enc is None or enc.ending_pc != bytecode.ending_pc:
        enc = EncodedProgram(bytecode)
        _ENC_CACHE[key] = enc
    return enc


# ---------------------------------------------------------------------------
# library build/load (pattern of native/__init__.py)
# ---------------------------------------------------------------------------

_LIB = None
_UNAVAILABLE = False


class _RunOut(ctypes.Structure):
    _fields_ = [
        ("err", ctypes.c_int),
        ("err_pc", ctypes.c_long),
        ("cycles", ctypes.c_long),
        ("ap", ctypes.c_long),
        ("final_fp", ctypes.c_long),
        ("mem_len", ctypes.c_long),
        ("mem_cap", ctypes.c_long),
        ("mem_vals", ctypes.POINTER(ctypes.c_uint32)),
        ("mem_def", ctypes.POINTER(ctypes.c_uint8)),
        ("pcs", ctypes.POINTER(ctypes.c_uint32)),
        ("fps", ctypes.POINTER(ctypes.c_uint32)),
        ("p16_rows", ctypes.POINTER(ctypes.c_uint32)),
        ("n_p16", ctypes.c_long),
        ("ext_rows", ctypes.POINTER(ctypes.c_uint32)),
        ("n_ext", ctypes.c_long),
        ("prints", ctypes.POINTER(ctypes.c_int64)),
        ("n_print_words", ctypes.c_long),
        ("wit_cursor", ctypes.POINTER(ctypes.c_int64)),
    ]


def get_vmrunner_lib():
    global _LIB, _UNAVAILABLE
    if _LIB is not None or _UNAVAILABLE:
        return _LIB
    try:
        from ..native import _BUILD, _write_constants_header
        os.makedirs(_BUILD, exist_ok=True)
        src = os.path.join(os.path.dirname(_BUILD), "vmrunner.c")
        so = os.path.join(_BUILD, "libvmrunner.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            _write_constants_header()
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-I", _BUILD, src,
                 "-o", so], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.vm_run.restype = ctypes.POINTER(_RunOut)
        lib.vm_run.argtypes = [
            i64p, ctypes.c_long, i64p, i64p, ctypes.c_long,
            u32p, ctypes.c_long,
            u32p, i64p, i64p, i64p, i64p, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long]
        lib.vm_free.argtypes = [ctypes.POINTER(_RunOut)]
        _LIB = lib
    except Exception:
        _UNAVAILABLE = True
        _LIB = None
    return _LIB


class NativeMemory:
    """Adapter exposing the C memory as the Python Memory interface used
    downstream (trace_gen / aggregation drivers)."""

    __slots__ = ("vals", "defined")

    def __init__(self, vals: np.ndarray, defined: np.ndarray):
        self.vals = vals
        self.defined = defined

    @property
    def cells(self):  # pragma: no cover - compat shim for len()/iteration
        return _CellsView(self)

    def try_get(self, index: int):
        if 0 <= index < self.vals.shape[0] and self.defined[index]:
            return int(self.vals[index])
        return None

    def get(self, index: int) -> int:
        v = self.try_get(index)
        if v is None:
            raise RunnerError(f"undefined memory at {index}")
        return v

    def get_slice(self, start: int, n: int):
        return [self.get(start + i) for i in range(n)]


class _CellsView:
    __slots__ = ("m",)

    def __init__(self, m: NativeMemory):
        self.m = m

    def __len__(self):
        return int(self.m.vals.shape[0])

    def __getitem__(self, i):
        if not 0 <= i < len(self):
            raise IndexError(i)
        return self.m.try_get(i)


def execute_bytecode_native(bytecode: Bytecode, public_input, witness):
    """Run the C interpreter. Returns ExecutionResult (same contract as
    runner.execute_bytecode) or None when the library is unavailable.
    Raises RunnerError via a Python re-run on execution failure."""
    lib = get_vmrunner_lib()
    if lib is None:
        return None
    from .runner import ExecutionResult, _execute_bytecode_py

    enc = _encoded(bytecode)

    public_memory = [int(v) for v in public_input]
    pot = (1 if len(public_memory) <= 1
           else 1 << (len(public_memory) - 1).bit_length())
    public_memory += [0] * (pot - len(public_memory))
    public_memory_size = len(public_memory)
    fp = public_memory_size + witness.preamble_memory_len
    fp = -(-fp // DIMENSION) * DIMENSION
    start_ap = fp + bytecode.starting_frame_memory

    # witness streams in the encoder's id order
    values_parts, entry_off, entry_len = [], [], []
    stream_start, stream_count = [], []
    total = 0
    n_entries = 0
    for name in enc.stream_names:
        entries = witness.hints.get(name, [])
        stream_start.append(n_entries)
        stream_count.append(len(entries))
        for e in entries:
            arr = np.asarray(e, np.uint32).ravel()
            values_parts.append(arr)
            entry_off.append(total)
            entry_len.append(arr.size)
            total += arr.size
            n_entries += 1
    wit_values = (np.concatenate(values_parts) if values_parts
                  else np.zeros(1, np.uint32))
    wit_entry_off = np.asarray(entry_off or [0], np.int64)
    wit_entry_len = np.asarray(entry_len or [0], np.int64)
    wit_stream_start = np.asarray(stream_start or [0], np.int64)
    wit_stream_count = np.asarray(stream_count or [0], np.int64)

    pub_np = np.asarray(public_memory, np.uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)

    out_p = lib.vm_run(
        enc.instr.ctypes.data_as(i64p), enc.instr.shape[0],
        enc.hint_stream.ctypes.data_as(i64p),
        enc.hint_off.ctypes.data_as(i64p), enc.ending_pc,
        pub_np.ctypes.data_as(u32p), pub_np.size,
        wit_values.ctypes.data_as(u32p),
        wit_entry_off.ctypes.data_as(i64p),
        wit_entry_len.ctypes.data_as(i64p),
        wit_stream_start.ctypes.data_as(i64p),
        wit_stream_count.ctypes.data_as(i64p), len(enc.stream_names),
        fp, start_ap, 1 << 40)
    out = out_p.contents

    try:
        if out.err != 0:
            # exact diagnostics (incl. guest stack trace) via Python re-run
            _execute_bytecode_py(bytecode, public_input, witness)
            raise RunnerError(
                f"native runner failed (code {out.err} at pc {out.err_pc}) "
                "but the Python runner succeeded — native/Python divergence")

        # named-hint exhaustion asserts (runner.rs:305-313)
        for sid, name in enumerate(enc.stream_names):
            want = int(wit_stream_count[sid])
            got = int(out.wit_cursor[sid])
            assert got == want, \
                f"named hint '{name}' not fully consumed ({got}/{want})"

        n_cycles = out.cycles
        pcs = np.ctypeslib.as_array(out.pcs, (n_cycles,)).astype(np.int64)
        fps = np.ctypeslib.as_array(out.fps, (n_cycles,)).astype(np.int64)
        n_mem = out.mem_len
        mem_vals = np.ctypeslib.as_array(out.mem_vals, (n_mem,)).copy()
        mem_def = np.ctypeslib.as_array(out.mem_def, (n_mem,)).copy()
        memory = NativeMemory(mem_vals, mem_def)

        traces = new_traces()
        if out.n_p16:
            rows = np.ctypeslib.as_array(
                out.p16_rows, (out.n_p16 * _P16_ROW_COLS,)).reshape(
                    out.n_p16, _P16_ROW_COLS)
            _decode_p16_rows(rows, traces[POSEIDON16])
        if out.n_ext:
            rows = np.ctypeslib.as_array(
                out.ext_rows, (out.n_ext * _EXT_ROW_COLS,)).reshape(
                    out.n_ext, _EXT_ROW_COLS)
            _decode_ext_rows(rows, traces[EXTENSION_OP])

        stdout_lines = _decode_prints(out, enc)

        import resource
        metadata = {
            "cycles": int(n_cycles) + 1,
            "memory": n_mem,
            "n_poseidons": int(out.n_p16),
            "n_extension_ops": int(out.n_ext),
            "bytecode_size": len(bytecode.code),
            "public_input_size": len(public_input),
            "runtime_memory": int(out.ap) - start_ap,
            "memory_usage_percent": round(100.0 * n_mem / (1 << 26), 2),
            "peak_rss_kib": resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss,
            "stdout": "\n".join(stdout_lines),
        }
        pcs_all = np.concatenate([pcs, [bytecode.ending_pc]])
        fps_all = np.concatenate([fps, [int(out.final_fp)]])
        return ExecutionResult(memory, public_memory_size, pcs_all,
                               fps_all, traces, metadata)
    finally:
        lib.vm_free(out_p)


def _decode_p16_rows(rows: np.ndarray, trace: TableTrace) -> None:
    from .tables import (P16_COL_EFFECTIVE_INDEX_LEFT_FIRST,
                         P16_COL_EFFECTIVE_INDEX_LEFT_SECOND, P16_COL_FLAG,
                         P16_COL_FLAG_HALF_OUTPUT,
                         P16_COL_FLAG_HARDCODED_LEFT, P16_COL_FLAG_PERMUTE,
                         P16_COL_INDEX_INPUT_LEFT, P16_COL_INDEX_INPUT_RES,
                         P16_COL_INDEX_INPUT_RIGHT, P16_COL_INPUT_START,
                         P16_COL_OFFSET_LEFT_HARDCODED,
                         P16_COL_PRECOMPILE_DATA)
    order = ([P16_COL_FLAG, P16_COL_INDEX_INPUT_RIGHT, P16_COL_INDEX_INPUT_RES,
              P16_COL_FLAG_HALF_OUTPUT, P16_COL_FLAG_HARDCODED_LEFT,
              P16_COL_OFFSET_LEFT_HARDCODED,
              P16_COL_EFFECTIVE_INDEX_LEFT_FIRST,
              P16_COL_EFFECTIVE_INDEX_LEFT_SECOND, P16_COL_FLAG_PERMUTE]
             + [P16_COL_INPUT_START + i for i in range(16)]
             + [P16_COL_INDEX_INPUT_LEFT, P16_COL_PRECOMPILE_DATA])
    for j, col in enumerate(order):
        trace.columns[col] = rows[:, j].tolist()


def _decode_ext_rows(rows: np.ndarray, trace: TableTrace) -> None:
    from .tables import (EXT_COL_ACTIVATION_FLAG, EXT_COL_AUX, EXT_COL_COMP,
                         EXT_COL_FLAG_ADD, EXT_COL_FLAG_MUL,
                         EXT_COL_FLAG_POLY_EQ, EXT_COL_IDX_A, EXT_COL_IDX_B,
                         EXT_COL_IDX_RES, EXT_COL_IS_BE, EXT_COL_LEN,
                         EXT_COL_START, EXT_COL_VA, EXT_COL_VB, EXT_COL_VRES)
    order = ([EXT_COL_IS_BE, EXT_COL_START, EXT_COL_LEN, EXT_COL_FLAG_ADD,
              EXT_COL_FLAG_MUL, EXT_COL_FLAG_POLY_EQ, EXT_COL_IDX_A,
              EXT_COL_IDX_B, EXT_COL_IDX_RES]
             + [EXT_COL_VB + k for k in range(DIMENSION)]
             + [EXT_COL_VRES + k for k in range(DIMENSION)]
             + [EXT_COL_COMP + k for k in range(DIMENSION)]
             + [EXT_COL_ACTIVATION_FLAG, EXT_COL_AUX])
    for j, col in enumerate(order):
        trace.columns[col] = rows[:, j].tolist()
    n = rows.shape[0]
    trace.columns[EXT_COL_VA] = [0] * n  # backfilled from final memory
    for k in range(1, DIMENSION):
        trace.columns[EXT_COL_VA + k] = [0] * n


def _decode_prints(out: _RunOut, enc: EncodedProgram) -> list[str]:
    lines = []
    if out.n_print_words:
        buf = np.ctypeslib.as_array(out.prints, (out.n_print_words,))
        i = 0
        while i < len(buf):
            idx, n = int(buf[i]), int(buf[i + 1])
            i += 2
            if n == -1:  # panic marker
                msg = enc.panic_msgs[idx]
                if msg:
                    lines.append(f"[PANIC] {msg}")
                continue
            vals = ", ".join(str(int(v)) for v in buf[i:i + n])
            i += n
            lines.append(f'"{enc.print_lines[idx]}" -> {vals}')
    return lines
