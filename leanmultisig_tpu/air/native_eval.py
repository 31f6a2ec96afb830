"""Native AIR constraint evaluator: runtime-generated C kernels.

The prover's hottest loop evaluates each table's alpha-batched
constraint polynomial over all (z-stacked) rows. Instead of walking the
AIR per numpy op (dozens of full-array passes), the symbolic constraint
DAG (air/symbolic.py) is compiled ONCE per table into a fused C kernel
(global structural CSE, OpenMP over rows) — the host analog of letting
XLA fuse the constraint graph on TPU. Reference analog: the
ConstraintFolder's packed SIMD evaluation (constraint_folder/normal.rs).

Falls back silently (returns None) when no C compiler is available;
eval_table_air then uses the numpy path. Verifier-side single-point
evaluation always stays numpy (EF inputs).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from ..vm.isa import LOGUP_PRECOMPILE_DOMAINSEP
from .symbolic import SymConst, SymOp, SymVar, symbolic_constraints

_CACHE: dict = {}
_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")

_PRELUDE = r"""
#include <stdint.h>
#define P 2130706433u
static inline uint32_t addm(uint32_t a, uint32_t b) {
    uint32_t s = a + b; return s >= P ? s - P : s;
}
static inline uint32_t subm(uint32_t a, uint32_t b) {
    return a >= b ? a - b : a + (P - b);
}
static inline uint32_t mulm(uint32_t a, uint32_t b) {
    return (uint32_t)(((uint64_t)a * b) % P);
}
/* acc (ef5) += ef * base-scalar */
static inline void ef_addscaled(uint32_t *acc, const uint32_t *ef,
                                uint32_t s) {
    for (int k = 0; k < 5; k++) acc[k] = addm(acc[k], mulm(ef[k], s));
}
static inline void ef_add5(const uint32_t *x, const uint32_t *y,
                           uint32_t *o) {
    for (int k = 0; k < 5; k++) o[k] = addm(x[k], y[k]);
}
static inline void ef_sub5(const uint32_t *x, const uint32_t *y,
                           uint32_t *o) {
    for (int k = 0; k < 5; k++) o[k] = subm(x[k], y[k]);
}
static inline void ef_scale5(const uint32_t *x, uint32_t s, uint32_t *o) {
    for (int k = 0; k < 5; k++) o[k] = mulm(x[k], s);
}
/* out = a * b over F[X]/(X^5 + X^2 - 1) */
static inline void ef_mul5(const uint32_t *x, const uint32_t *y,
                           uint32_t *o) {
    uint64_t c[9];
    for (int k = 0; k < 9; k++) {
        unsigned __int128 acc = 0;
        int lo = k - 4 > 0 ? k - 4 : 0;
        int hi = k < 4 ? k : 4;
        for (int i = lo; i <= hi; i++)
            acc += (uint64_t)x[i] * y[k - i];
        c[k] = (uint64_t)(acc % P);
    }
    for (int k = 3; k >= 0; k--) {
        uint64_t h = c[5 + k];
        c[k] = (c[k] + h) % P;
        c[k + 2] = (c[k + 2] + P - h) % P;
    }
    for (int k = 0; k < 5; k++) o[k] = (uint32_t)c[k];
}
"""


def _gen_table_source(table: str) -> str:
    """C source for one table's row-wise batched constraint eval."""
    constraints, declared, bus_idx = symbolic_constraints(
        table, with_bus_index=True)

    skey_memo: dict = {}

    def skey(e):
        if id(e) in skey_memo:
            return skey_memo[id(e)]
        if isinstance(e, SymConst):
            k = ("c", e.value)
        elif isinstance(e, SymVar):
            k = ("v", e.kind, e.col)
        else:
            k = (e.op, skey(e.a), skey(e.b))
        skey_memo[id(e)] = k
        return k

    lines: list[str] = []
    emitted: dict = {}
    counter = [0]

    def emit_node(e) -> str:
        k = skey(e)
        if k in emitted:
            return emitted[k]
        if isinstance(e, SymConst):
            r = f"{e.value}u"
        elif isinstance(e, SymVar):
            arr = "flat" if e.kind == "flat" else "shift"
            r = f"v{counter[0]}"
            counter[0] += 1
            lines.append(f"        uint32_t {r} = {arr}[{e.col}][r];")
        else:
            a = emit_node(e.a)
            b = emit_node(e.b)
            fn = {"add": "addm", "sub": "subm", "mul": "mulm"}[e.op]
            r = f"v{counter[0]}"
            counter[0] += 1
            lines.append(f"        uint32_t {r} = {fn}({a}, {b});")
        emitted[k] = r
        return r

    # bus value: (sum alphas_eq[i]*d_i + alphas_eq[15]*domsep) * bus_beta
    #            + flag  — all EF except the base data/flag
    cvals = [emit_node(c) for c in constraints]
    flag_v = emit_node(declared[0][0])
    data_vs = [emit_node(d) for d in declared[1]]

    body = "\n".join(lines)
    bus_lines = ["        uint32_t fp5[5] = {0, 0, 0, 0, 0};"]
    for i, d in enumerate(data_vs):
        bus_lines.append(f"        ef_addscaled(fp5, alphas_eq + {i * 5}, "
                         f"{d});")
    bus_lines.append(f"        ef_addscaled(fp5, alphas_eq + 75, "
                     f"{LOGUP_PRECOMPILE_DOMAINSEP}u);")
    bus_lines.append("        uint32_t bus5[5];")
    bus_lines.append("        ef_mul5(fp5, bus_beta, bus5);")
    bus_lines.append(f"        bus5[0] = addm(bus5[0], {flag_v});")
    bus_src = "\n".join(bus_lines)

    acc_lines = []
    ordered = (list(range(bus_idx)) + [None]
               + list(range(bus_idx, len(constraints))))
    for j, ci in enumerate(ordered):
        if ci is None:
            acc_lines.append("        { uint32_t t5[5]; "
                             f"ef_mul5(bus5, alpha_powers + {j * 5}, t5); "
                             "for (int k = 0; k < 5; k++) "
                             "acc[k] = addm(acc[k], t5[k]); }")
        else:
            acc_lines.append(f"        ef_addscaled(acc, "
                             f"alpha_powers + {j * 5}, {cvals[ci]});")
    acc_src = "\n".join(acc_lines)

    base_fn = f"""
void eval_rows(const uint32_t **flat, const uint32_t **shift,
               const uint32_t *alpha_powers, const uint32_t *alphas_eq,
               const uint32_t *bus_beta, long n_rows, uint32_t *out) {{
    #pragma omp parallel for schedule(static) if (n_rows > 1024)
    for (long r = 0; r < n_rows; r++) {{
{body}
{bus_src}
        uint32_t *acc = out + 5 * r;
        for (int k = 0; k < 5; k++) acc[k] = 0;
{acc_src}
    }}
}}
"""
    ext_fn = _gen_ext_fn(constraints, declared, bus_idx, skey)
    return _PRELUDE + base_fn + ext_fn


def _gen_ext_fn(constraints, declared, bus_idx, skey) -> str:
    """EF-column variant: the later sumcheck rounds fold the columns into
    the quintic extension; every var is an ef5, constants stay base, ops
    are typed (base x base -> base, anything ext -> ext)."""
    lines: list[str] = []
    emitted: dict = {}
    counter = [0]

    def fresh() -> str:
        counter[0] += 1
        return f"w{counter[0]}"

    def emit_node(e):
        """-> (expr, is_ext)"""
        k = skey(e)
        if k in emitted:
            return emitted[k]
        if isinstance(e, SymConst):
            r = (f"{e.value}u", False)
        elif isinstance(e, SymVar):
            arr = "flat" if e.kind == "flat" else "shift"
            v = fresh()
            lines.append(f"        const uint32_t *{v} = "
                         f"{arr}[{e.col}] + 5 * r;")
            r = (v, True)
        else:
            (a, ae) = emit_node(e.a)
            (b, be) = emit_node(e.b)
            v = fresh()
            if not ae and not be:
                fn = {"add": "addm", "sub": "subm", "mul": "mulm"}[e.op]
                lines.append(f"        uint32_t {v} = {fn}({a}, {b});")
                r = (v, False)
            else:
                lines.append(f"        uint32_t {v}[5];")
                if e.op == "mul":
                    if ae and be:
                        lines.append(f"        ef_mul5({a}, {b}, {v});")
                    elif ae:
                        lines.append(f"        ef_scale5({a}, {b}, {v});")
                    else:
                        lines.append(f"        ef_scale5({b}, {a}, {v});")
                elif e.op == "add":
                    if ae and be:
                        lines.append(f"        ef_add5({a}, {b}, {v});")
                    else:
                        ext, base = (a, b) if ae else (b, a)
                        lines.append(
                            f"        for (int k = 0; k < 5; k++) "
                            f"{v}[k] = {ext}[k];")
                        lines.append(f"        {v}[0] = addm({v}[0], "
                                     f"{base});")
                else:  # sub
                    if ae and be:
                        lines.append(f"        ef_sub5({a}, {b}, {v});")
                    elif ae:
                        lines.append(
                            f"        for (int k = 0; k < 5; k++) "
                            f"{v}[k] = {a}[k];")
                        lines.append(f"        {v}[0] = subm({v}[0], {b});")
                    else:  # base - ext
                        lines.append(
                            f"        for (int k = 0; k < 5; k++) "
                            f"{v}[k] = subm(0u, {b}[k]);")
                        lines.append(f"        {v}[0] = addm({v}[0], {a});")
                r = (v, True)
        emitted[k] = r
        return r

    def as_ext(val) -> str:
        expr, is_ext = val
        if is_ext:
            return expr
        v = fresh()
        lines.append(f"        uint32_t {v}[5] = {{{expr}, 0, 0, 0, 0}};")
        return v

    cvals = [emit_node(c) for c in constraints]
    flag_v = as_ext(emit_node(declared[0][0]))
    data_vs = [as_ext(emit_node(d)) for d in declared[1]]

    bus_lines = ["        uint32_t fp5[5] = {0, 0, 0, 0, 0};",
                 "        uint32_t t5[5];"]
    for i, d in enumerate(data_vs):
        bus_lines.append(f"        ef_mul5(alphas_eq + {i * 5}, {d}, t5);")
        bus_lines.append("        ef_add5(fp5, t5, fp5);")
    bus_lines.append(f"        ef_addscaled(fp5, alphas_eq + 75, "
                     f"{LOGUP_PRECOMPILE_DOMAINSEP}u);")
    bus_lines.append("        uint32_t bus5[5];")
    bus_lines.append("        ef_mul5(fp5, bus_beta, bus5);")
    bus_lines.append(f"        ef_add5(bus5, {flag_v}, bus5);")

    acc_lines = ["        uint32_t *acc = out + 5 * r;",
                 "        for (int k = 0; k < 5; k++) acc[k] = 0;"]
    ordered = (list(range(bus_idx)) + [None]
               + list(range(bus_idx, len(constraints))))
    for j, ci in enumerate(ordered):
        if ci is None:
            src_v = "bus5"
        else:
            expr, is_ext = cvals[ci]
            if not is_ext:
                acc_lines.append(f"        ef_addscaled(acc, "
                                 f"alpha_powers + {j * 5}, {expr});")
                continue
            src_v = expr
        acc_lines.append(f"        ef_mul5({src_v}, alpha_powers + "
                         f"{j * 5}, t5);")
        acc_lines.append("        ef_add5(acc, t5, acc);")

    body = "\n".join(lines + bus_lines + acc_lines)
    return f"""
void eval_rows_ext(const uint32_t **flat, const uint32_t **shift,
                   const uint32_t *alpha_powers, const uint32_t *alphas_eq,
                   const uint32_t *bus_beta, long n_rows, uint32_t *out) {{
    #pragma omp parallel for schedule(static) if (n_rows > 512)
    for (long r = 0; r < n_rows; r++) {{
{body}
    }}
}}
"""


def get_native_evaluator(table: str):
    """-> callable(flat_cols, shift_cols, alpha_powers, extra) -> (n, 5)
    or None when unavailable. Columns must be 1-D base uint32."""
    if table in _CACHE:
        return _CACHE[table]
    try:
        # disk-cache key: hash of the MODULE SOURCES defining the AIR, so
        # a warm process loads the .so without re-generating the C (the
        # p16 DAG costs seconds to emit and ~100s to cc)
        h = hashlib.sha256()
        for mod in ("tables_air.py", "symbolic.py", "native_eval.py"):
            with open(os.path.join(os.path.dirname(__file__), mod),
                      "rb") as f:
                h.update(f.read())
        digest = h.hexdigest()[:16]
        os.makedirs(_DIR, exist_ok=True)
        cpath = os.path.join(_DIR, f"air_{table}_{digest}.c")
        so = os.path.join(_DIR, f"libair_{table}_{digest}.so")
        if not os.path.exists(so):
            src = _gen_table_source(table)
            with open(cpath, "w") as f:
                f.write(src)
            subprocess.run(["cc", "-O2", "-fopenmp", "-shared", "-fPIC",
                            cpath, "-o", so], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u32pp = ctypes.POINTER(u32p)
        for fn in (lib.eval_rows, lib.eval_rows_ext):
            fn.argtypes = [u32pp, u32pp, u32p, u32p, u32p, ctypes.c_long,
                           u32p]

        def evaluate(flat, shift, alpha_powers, extra):
            n = flat[0].shape[0]
            is_ext = flat[0].ndim == 2
            fc = [np.ascontiguousarray(c, np.uint32) for c in flat]
            sc = [np.ascontiguousarray(c, np.uint32) for c in shift]
            fp = (u32p * len(fc))(*[c.ctypes.data_as(u32p) for c in fc])
            sp = (u32p * max(len(sc), 1))(
                *([c.ctypes.data_as(u32p) for c in sc] or [fc[0].ctypes
                                                           .data_as(u32p)]))
            ap = np.ascontiguousarray(alpha_powers, np.uint32)
            ae = np.ascontiguousarray(extra.logup_alphas_eq_poly, np.uint32)
            bb = np.ascontiguousarray(extra.bus_beta, np.uint32)
            out = np.empty((n, 5), np.uint32)
            fn = lib.eval_rows_ext if is_ext else lib.eval_rows
            fn(fp, sp, ap.ctypes.data_as(u32p), ae.ctypes.data_as(u32p),
               bb.ctypes.data_as(u32p), n, out.ctypes.data_as(u32p))
            return out

        _CACHE[table] = evaluate
    except Exception:
        _CACHE[table] = None
    return _CACHE[table]
