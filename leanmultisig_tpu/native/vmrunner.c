/* Native zkVM execution loop (witness generation).
 *
 * Replaces the Python interpreter in vm/runner.py for the hot fetch/exec
 * loop (reference: crates/lean_vm/src/execution/runner.rs:119-349). The
 * bytecode is pre-encoded host-side into flat instruction + hint streams
 * (vm/native_runner.py); this loop produces the exact same memory,
 * execution trace (pcs/fps), and precompile trace rows as the Python
 * runner (equivalence-tested). Errors return a code + pc; the caller
 * re-runs under the Python interpreter for pretty diagnostics.
 *
 * Build: cc -O3 -shared -fPIC -I build vmrunner.c -o build/libvmrunner.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "poseidon16_constants.h"

#define P 2130706433u
#define DIM 5

/* ---------------- base field ---------------- */

static inline uint32_t addm(uint32_t a, uint32_t b) {
    uint32_t s = a + b;
    return s >= P ? s - P : s;
}
static inline uint32_t subm(uint32_t a, uint32_t b) {
    return a >= b ? a - b : a + P - b;
}
static inline uint32_t mulm(uint32_t a, uint32_t b) {
    return (uint32_t)(((uint64_t)a * b) % P);
}
static inline uint32_t cubem(uint32_t a) { return mulm(mulm(a, a), a); }

static uint32_t powm(uint32_t a, uint64_t e) {
    uint32_t r = 1;
    while (e) {
        if (e & 1) r = mulm(r, a);
        a = mulm(a, a);
        e >>= 1;
    }
    return r;
}
static inline uint32_t invm(uint32_t a) { return powm(a, P - 2); }

/* ---------------- quintic extension (X^5 + X^2 - 1) ---------------- */

/* schedule mirrors quintic_extension/extension.rs:529-549 (same as
 * field/np_field.py emul) */
static void emul5(const uint32_t *a, const uint32_t *b, uint32_t *out) {
    uint32_t b_0_m3 = subm(b[0], b[3]);
    uint32_t b_1_m4 = subm(b[1], b[4]);
    uint32_t b_4_m2 = subm(b[4], b[2]);
    uint32_t b_3_m14 = subm(b[3], b_1_m4);
    const uint32_t cols[5][5] = {
        {b[0], b[4], b[3], b[2], b_1_m4},
        {b[1], b[0], b[4], b[3], b[2]},
        {b[2], b_1_m4, b_0_m3, b_4_m2, b_3_m14},
        {b[3], b[2], b_1_m4, b_0_m3, b_4_m2},
        {b[4], b[3], b[2], b_1_m4, b_0_m3},
    };
    uint32_t res[5];
    for (int k = 0; k < 5; k++) {
        uint64_t acc = 0;
        for (int i = 0; i < 5; i++) acc += (uint64_t)a[i] * cols[k][i];
        res[k] = (uint32_t)(acc % P);
    }
    memcpy(out, res, sizeof(res));
}

static void eadd5(const uint32_t *a, const uint32_t *b, uint32_t *out) {
    for (int i = 0; i < 5; i++) out[i] = addm(a[i], b[i]);
}
static void esub5(const uint32_t *a, const uint32_t *b, uint32_t *out) {
    for (int i = 0; i < 5; i++) out[i] = subm(a[i], b[i]);
}

/* a^(P^5-2): unique inverse, any algorithm gives the bit-identical value */
static void einv5(const uint32_t *a, uint32_t *out) {
    static const uint64_t E[3] = {0x760a00027affffffULL,
                                  0xcc877606388ef602ULL,
                                  0x0000000007b13d82ULL};
    uint32_t result[5] = {1, 0, 0, 0, 0};
    uint32_t base[5];
    memcpy(base, a, sizeof(base));
    for (int limb = 0; limb < 3; limb++) {
        uint64_t e = E[limb];
        int bits = limb == 2 ? 27 : 64;
        for (int i = 0; i < bits; i++) {
            if (e & 1) emul5(result, base, result);
            emul5(base, base, base);
            e >>= 1;
        }
    }
    memcpy(out, result, 5 * sizeof(uint32_t));
}

/* ---------------- poseidon16 permutation ---------------- */

static void mds16_(uint32_t *s) {
    uint32_t out[16];
    for (int i = 0; i < 16; i++) {
        uint64_t acc = 0;
        for (int j = 0; j < 16; j++) acc += (uint64_t)MDS16[i][j] * s[j];
        out[i] = (uint32_t)(acc % P);
    }
    memcpy(s, out, sizeof(out));
}

static void p16_permute(uint32_t *s) {
    int r = 0;
    for (int k = 0; k < 4; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = cubem(addm(s[i], RC16[r][i]));
        mds16_(s);
    }
    for (int k = 0; k < 20; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = addm(s[i], RC16[r][i]);
        s[0] = cubem(s[0]);
        mds16_(s);
    }
    for (int k = 0; k < 4; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = cubem(addm(s[i], RC16[r][i]));
        mds16_(s);
    }
}

/* ---------------- memory (write-once) ---------------- */

#define MAX_MEM (1L << 26)

typedef struct {
    uint32_t *vals;
    uint8_t *def;
    long cap;
    long max_set; /* highest defined index (-1 if none) */
} Mem;

/* error codes */
enum {
    OK = 0,
    ERR_UNDEF = 1,
    ERR_WRITE_TWICE = 2,
    ERR_OOM = 3,
    ERR_MISMATCH = 4,
    ERR_DIV_ZERO = 5,
    ERR_PC_OOB = 6,
    ERR_BAD_COND = 7,
    ERR_DEBUG_ASSERT = 8,
    ERR_RANGE_TOO_BIG = 9,
    ERR_HINT_EXHAUSTED = 10,
    ERR_CYCLE_LIMIT = 11,
    ERR_TRACE_ALLOC = 12,
    ERR_SOLVED_A_NOT_BASE = 13,
    ERR_BAD_EXT_OP = 14,
};

static int mem_grow(Mem *m, long idx) {
    if (idx >= MAX_MEM) return ERR_OOM;
    long cap = m->cap;
    while (cap <= idx) cap <<= 1;
    if (cap > MAX_MEM) cap = MAX_MEM;
    m->vals = realloc(m->vals, cap * sizeof(uint32_t));
    m->def = realloc(m->def, cap);
    if (!m->vals || !m->def) return ERR_OOM;
    memset(m->vals + m->cap, 0, (cap - m->cap) * sizeof(uint32_t));
    memset(m->def + m->cap, 0, cap - m->cap);
    m->cap = cap;
    return OK;
}

static inline int mem_tryget(Mem *m, long idx, uint32_t *out) {
    if (idx < 0 || idx >= m->cap || !m->def[idx]) return 0;
    *out = m->vals[idx];
    return 1;
}

static inline int mem_set(Mem *m, long idx, uint32_t v) {
    if (idx < 0) return ERR_OOM;
    if (idx >= m->cap) {
        int rc = mem_grow(m, idx);
        if (rc) return rc;
    }
    v %= P;
    if (m->def[idx]) {
        if (m->vals[idx] == v) return OK;
        if (getenv("LMS_VM_DEBUG"))
            fprintf(stderr, "[vmrunner] WRITE_TWICE idx=%ld old=%u new=%u\n",
                    idx, m->vals[idx], v);
        return ERR_WRITE_TWICE;
    }
    m->vals[idx] = v;
    m->def[idx] = 1;
    if (idx > m->max_set) m->max_set = idx;
    return OK;
}

/* make_slices_equal_and_defined (memory.rs:40-62) */
static int mem_equalize(Mem *m, long p0, long p1, int n) {
    for (int i = 0; i < n; i++) {
        uint32_t v0, v1;
        int d0 = mem_tryget(m, p0 + i, &v0);
        int d1 = mem_tryget(m, p1 + i, &v1);
        int rc = OK;
        if (d0 && d1) {
            if (v0 != v1) return ERR_MISMATCH;
        } else if (d0) {
            rc = mem_set(m, p1 + i, v0);
        } else if (d1) {
            rc = mem_set(m, p0 + i, v1);
        } else {
            rc = mem_set(m, p0 + i, 0);
            if (!rc) rc = mem_set(m, p1 + i, 0);
        }
        if (rc) return rc;
    }
    return OK;
}

/* ---------------- growable buffers ---------------- */

typedef struct {
    uint32_t *data;
    long len, cap;
} BufU32;

typedef struct {
    int64_t *data;
    long len, cap;
} BufI64;

static int bufu_push(BufU32 *b, uint32_t v) {
    if (b->len == b->cap) {
        b->cap = b->cap ? b->cap * 2 : 1024;
        b->data = realloc(b->data, b->cap * sizeof(uint32_t));
        if (!b->data) return ERR_TRACE_ALLOC;
    }
    b->data[b->len++] = v;
    return OK;
}
static int bufi_push(BufI64 *b, int64_t v) {
    if (b->len == b->cap) {
        b->cap = b->cap ? b->cap * 2 : 1024;
        b->data = realloc(b->data, b->cap * sizeof(int64_t));
        if (!b->data) return ERR_TRACE_ALLOC;
    }
    b->data[b->len++] = v;
    return OK;
}

/* ---------------- instruction / hint encodings ---------------- */

/* operand kinds */
#define OPK_CONST 0
#define OPK_MEMFP 1
#define OPK_FPREL 2

/* instruction kinds (record stride 10 int64) */
#define IK_ADD 0
#define IK_MUL 1
#define IK_DEREF 2
#define IK_JUMP 3
#define IK_P16 4
#define IK_EXTOP 5

/* hint opcodes (variable-length records: [op, nwords, payload...]) */
#define HK_REQUEST_MEMORY 0
#define HK_INVERSE 1
#define HK_PRINT 2
#define HK_DEBUG_ASSERT 3
#define HK_DEREF_HINT 4
#define HK_PANIC 5
#define HK_PARALLEL 6
#define HK_WITNESS 7
#define HK_DECOMPOSE_XMSS 8
#define HK_DECOMPOSE_MERKLE_WHIR 9
#define HK_DECOMPOSE_BITS 10
#define HK_LESS_THAN 11
#define HK_LOG2_CEIL 12

typedef struct {
    const int64_t *instr;  /* (n_code, 10) */
    long n_code;
    const int64_t *hint_stream;
    const int64_t *hint_off; /* (n_code+1,) offsets into hint_stream */
    long ending_pc;
    /* named witness streams */
    const uint32_t *wit_values;
    const int64_t *wit_entry_off; /* per entry: offset into wit_values */
    const int64_t *wit_entry_len;
    const int64_t *wit_stream_start; /* per stream: first entry idx */
    const int64_t *wit_stream_count;
    long n_streams;
} Program;

typedef struct {
    Mem mem;
    long fp, pc, ap;
    long cycles;
    BufU32 pcs, fps;
    BufU32 p16_rows;   /* 27 u32 per row */
    BufU32 ext_rows;   /* 26 u32 per row */
    BufI64 prints;     /* [line_idx, n, values...] */
    BufI64 derefs;     /* (target_addr, src_addr) pairs */
    int64_t *wit_cursor;
    int err;
    long err_pc;
} State;

/* read operand; returns 0 if undefined (only possible for MEMFP) */
static inline int rd_op(State *st, int64_t kind, int64_t val, uint32_t *out) {
    switch (kind) {
    case OPK_CONST:
        *out = (uint32_t)(((val % P) + P) % P);
        return 1;
    case OPK_FPREL: {
        long t = (st->fp + val) % (long)P;
        if (t < 0) t += P;
        *out = (uint32_t)t;
        return 1;
    }
    default:
        return mem_tryget(&st->mem, st->fp + val, out);
    }
}

/* ---------------- precompile execution ---------------- */

/* p16 trace row layout (vm/native_runner.py decodes):
 * [flag(=1), idx_right, idx_res, flag_half, flag_hard, offset_hard,
 *  eff_left_first, eff_left_second, flag_permute, input[16], idx_left,
 *  precompile_data] = 27 */
static int exec_p16(State *st, uint32_t arg_a, uint32_t arg_b, uint32_t res,
                    int64_t flags, int64_t hard_off, int64_t pre_data) {
    int permute = flags & 1, half = (flags >> 1) & 1, hard = (flags >> 2) & 1;
    long left_first = hard ? hard_off : (long)arg_a;
    long left_second = hard ? (long)arg_a : (long)arg_a + 4;
    uint32_t inp[16];
    for (int i = 0; i < 4; i++)
        if (!mem_tryget(&st->mem, left_first + i, &inp[i])) return ERR_UNDEF;
    for (int i = 0; i < 4; i++)
        if (!mem_tryget(&st->mem, left_second + i, &inp[4 + i]))
            return ERR_UNDEF;
    for (int i = 0; i < 8; i++)
        if (!mem_tryget(&st->mem, (long)arg_b + i, &inp[8 + i]))
            return ERR_UNDEF;

    uint32_t out[16];
    memcpy(out, inp, sizeof(inp));
    p16_permute(out);
    int n_out = 16;
    if (!permute) {
        for (int i = 0; i < 16; i++) out[i] = addm(out[i], inp[i]);
        n_out = half ? 4 : 8;
    }
    for (int i = 0; i < n_out; i++) {
        int rc = mem_set(&st->mem, (long)res + i, out[i]);
        if (rc) return rc;
    }

    BufU32 *t = &st->p16_rows;
    int rc = 0;
    rc |= bufu_push(t, 1);
    rc |= bufu_push(t, arg_b);
    rc |= bufu_push(t, res);
    rc |= bufu_push(t, (uint32_t)half);
    rc |= bufu_push(t, (uint32_t)hard);
    rc |= bufu_push(t, (uint32_t)(hard ? hard_off : 0));
    rc |= bufu_push(t, (uint32_t)left_first);
    rc |= bufu_push(t, (uint32_t)left_second);
    rc |= bufu_push(t, (uint32_t)permute);
    for (int i = 0; i < 16; i++) rc |= bufu_push(t, inp[i]);
    rc |= bufu_push(t, arg_a);
    rc |= bufu_push(t, (uint32_t)pre_data);
    return rc ? ERR_TRACE_ALLOC : OK;
}

/* 2ab - a - b + 1 per coefficient pair */
static void polyeq5(const uint32_t *a, const uint32_t *b, uint32_t *out) {
    uint32_t ab[5];
    emul5(a, b, ab);
    for (int i = 0; i < 5; i++)
        out[i] = subm(subm(addm(ab[i], ab[i]), a[i]), b[i]);
    out[0] = addm(out[0], 1);
}

static int get_ef(State *st, long addr, uint32_t *out) {
    for (int i = 0; i < DIM; i++)
        if (!mem_tryget(&st->mem, addr + i, &out[i])) return 0;
    return 1;
}

/* single-element add/mul with unknown operand (exec.rs:29-91) */
static int solve_unknowns(State *st, long pa, long pb, long pr, int is_be,
                          int op /*0 add 1 mul*/) {
    uint32_t a[5], b[5], c[5];
    int da, db, dc;
    if (is_be) {
        uint32_t s;
        da = mem_tryget(&st->mem, pa, &s);
        if (da) { a[0] = s; a[1] = a[2] = a[3] = a[4] = 0; }
    } else {
        da = get_ef(st, pa, a);
    }
    db = get_ef(st, pb, b);
    dc = get_ef(st, pr, c);

    if (op == 1 && !is_be) {
        static const uint32_t EONE[5] = {1, 0, 0, 0, 0};
        if (db && !memcmp(b, EONE, sizeof(EONE)))
            return mem_equalize(&st->mem, pa, pr, DIM);
        if (da && !memcmp(a, EONE, sizeof(EONE)))
            return mem_equalize(&st->mem, pb, pr, DIM);
    }

    if (da && db && dc) {
        uint32_t t[5];
        if (op == 0) eadd5(a, b, t); else emul5(a, b, t);
        return memcmp(t, c, sizeof(t)) ? ERR_BAD_EXT_OP : OK;
    }
    if (da && db) return OK; /* result computed by the main path */
    if (!da && db && dc) {
        uint32_t av[5];
        if (op == 0) esub5(c, b, av);
        else { uint32_t bi[5]; einv5(b, bi); emul5(c, bi, av); }
        if (is_be) {
            for (int i = 1; i < 5; i++)
                if (av[i]) return ERR_SOLVED_A_NOT_BASE;
            return mem_set(&st->mem, pa, av[0]);
        }
        for (int i = 0; i < 5; i++) {
            int rc = mem_set(&st->mem, pa + i, av[i]);
            if (rc) return rc;
        }
        return OK;
    }
    if (!db && da && dc) {
        uint32_t bv[5];
        if (op == 0) esub5(c, a, bv);
        else { uint32_t ai[5]; einv5(a, ai); emul5(c, ai, bv); }
        for (int i = 0; i < 5; i++) {
            int rc = mem_set(&st->mem, pb + i, bv[i]);
            if (rc) return rc;
        }
        return OK;
    }
    return ERR_BAD_EXT_OP;
}

#define MAX_EXT_SIZE 8192

/* ext trace row: [is_be, start, len, f_add, f_mul, f_polyeq, idx_a, idx_b,
 * idx_res, vb[5], vres[5], comp[5], activation, aux] = 26 */
static int exec_extop(State *st, uint32_t pa_, uint32_t pb_, uint32_t pr_,
                      int64_t size, int64_t opc, int64_t is_be) {
    long pa = pa_, pb = pb_, pr = pr_;
    if (size < 1 || size > MAX_EXT_SIZE) return ERR_BAD_EXT_OP;
    if (size == 1 && opc != 2) {
        int rc = solve_unknowns(st, pa, pb, pr, (int)is_be, (int)opc);
        if (rc) return rc;
    }
    long a_stride = is_be ? 1 : DIM;
    static uint32_t elems[MAX_EXT_SIZE][5], vbs[MAX_EXT_SIZE][5],
        comps[MAX_EXT_SIZE][5];
    long idx_as[MAX_EXT_SIZE], idx_bs[MAX_EXT_SIZE];
    for (long i = 0; i < size; i++) {
        long aa = pa + i * a_stride, ab = pb + i * DIM;
        uint32_t va[5] = {0, 0, 0, 0, 0}, vb[5];
        if (is_be) {
            if (!mem_tryget(&st->mem, aa, &va[0])) return ERR_UNDEF;
        } else if (!get_ef(st, aa, va)) {
            return ERR_UNDEF;
        }
        if (!get_ef(st, ab, vb)) return ERR_UNDEF;
        if (opc == 0) eadd5(va, vb, elems[i]);
        else if (opc == 1) emul5(va, vb, elems[i]);
        else polyeq5(va, vb, elems[i]);
        memcpy(vbs[i], vb, sizeof(vb));
        idx_as[i] = aa;
        idx_bs[i] = ab;
    }
    memcpy(comps[size - 1], elems[size - 1], 5 * sizeof(uint32_t));
    for (long i = size - 2; i >= 0; i--) {
        if (opc == 2) emul5(elems[i], comps[i + 1], comps[i]);
        else eadd5(elems[i], comps[i + 1], comps[i]);
    }
    for (int i = 0; i < DIM; i++) {
        int rc = mem_set(&st->mem, pr + i, comps[0][i]);
        if (rc) return rc;
    }
    /* mode bits: is_be*4 + add8/mul16/polyeq32 (isa.py flag_encoding) */
    uint32_t mode = (uint32_t)(is_be ? 4 : 0)
        + (opc == 0 ? 8u : opc == 1 ? 16u : 32u);
    BufU32 *t = &st->ext_rows;
    int rc = 0;
    for (long i = 0; i < size; i++) {
        long cur_len = size - i;
        rc |= bufu_push(t, (uint32_t)(is_be ? 1 : 0));
        rc |= bufu_push(t, i == 0);
        rc |= bufu_push(t, (uint32_t)cur_len);
        rc |= bufu_push(t, opc == 0);
        rc |= bufu_push(t, opc == 1);
        rc |= bufu_push(t, opc == 2);
        rc |= bufu_push(t, (uint32_t)idx_as[i]);
        rc |= bufu_push(t, (uint32_t)idx_bs[i]);
        rc |= bufu_push(t, (uint32_t)pr);
        for (int k = 0; k < 5; k++) rc |= bufu_push(t, vbs[i][k]);
        for (int k = 0; k < 5; k++) rc |= bufu_push(t, comps[0][k]);
        for (int k = 0; k < 5; k++) rc |= bufu_push(t, comps[i][k]);
        rc |= bufu_push(t, i == 0);
        rc |= bufu_push(t, mode + 64u * (uint32_t)cur_len);
    }
    return rc ? ERR_TRACE_ALLOC : OK;
}

/* ---------------- hints ---------------- */

static int run_hint(State *st, const Program *pg, const int64_t *h,
                    long nwords) {
    (void)nwords;
    int64_t op = h[0];
    uint32_t v, a, b;
    int rc;
    switch (op) {
    case HK_REQUEST_MEMORY: /* [op, n, offset, size_kind, size_val] */
        if (!rd_op(st, h[3], h[4], &v)) return ERR_UNDEF;
        rc = mem_set(&st->mem, st->fp + h[2], (uint32_t)(st->ap % P));
        if (rc) return rc;
        st->ap += v;
        return OK;
    case HK_INVERSE: /* [op, n, arg_kind, arg_val, res_offset] */
        if (!rd_op(st, h[2], h[3], &v)) return ERR_UNDEF;
        return mem_set(&st->mem, st->fp + h[4], v ? invm(v) : 0);
    case HK_PRINT: { /* [op, n, line_idx, n_content, (kind,val)*] */
        rc = bufi_push(&st->prints, h[2]);
        rc |= bufi_push(&st->prints, h[3]);
        for (long i = 0; i < h[3]; i++) {
            if (!rd_op(st, h[4 + 2 * i], h[5 + 2 * i], &v)) return ERR_UNDEF;
            rc |= bufi_push(&st->prints, v);
        }
        return rc ? ERR_TRACE_ALLOC : OK;
    }
    case HK_DEBUG_ASSERT: {
        /* [op, n, lk, lv, rk, rv, cmp(0:== 1:!= 2:< 3:<=), preceds] */
        if (!rd_op(st, h[2], h[3], &a)) return ERR_UNDEF;
        if (!rd_op(st, h[4], h[5], &b)) return ERR_UNDEF;
        if (h[7] && b >= (1u << 16)) return ERR_RANGE_TOO_BIG;
        int ok;
        switch (h[6]) {
        case 0: ok = a == b; break;
        case 1: ok = a != b; break;
        case 2: ok = a < b; break;
        default: ok = a <= b; break;
        }
        return ok ? OK : ERR_DEBUG_ASSERT;
    }
    case HK_DEREF_HINT: /* [op, n, offset_src, offset_target] */
        rc = bufi_push(&st->derefs, st->fp + h[3]);
        rc |= bufi_push(&st->derefs, st->fp + h[2]);
        return rc ? ERR_TRACE_ALLOC : OK;
    case HK_PANIC: /* [op, n, msg_idx]: record as print with n=-1 marker */
        rc = bufi_push(&st->prints, h[2]);
        rc |= bufi_push(&st->prints, -1);
        return rc ? ERR_TRACE_ALLOC : OK;
    case HK_PARALLEL:
        return OK;
    case HK_WITNESS: { /* [op, n, stream_id, mode(0 inline/1 ptr), offset] */
        int64_t sid = h[2];
        int64_t cur = st->wit_cursor[sid];
        if (cur >= pg->wit_stream_count[sid]) return ERR_HINT_EXHAUSTED;
        int64_t entry = pg->wit_stream_start[sid] + cur;
        st->wit_cursor[sid] = cur + 1;
        long dest;
        if (h[3] == 0) {
            dest = st->fp + h[4];
        } else {
            if (!mem_tryget(&st->mem, st->fp + h[4], &v)) return ERR_UNDEF;
            dest = v;
        }
        const uint32_t *src = pg->wit_values + pg->wit_entry_off[entry];
        for (long i = 0; i < pg->wit_entry_len[entry]; i++) {
            rc = mem_set(&st->mem, dest + i, src[i]);
            if (rc) return rc;
        }
        return OK;
    }
    case HK_DECOMPOSE_XMSS: { /* [op,n, 4x(kind,val)] ptrs+num+chunk */
        uint32_t dptr, sptr, num, chunk;
        if (!rd_op(st, h[2], h[3], &dptr)) return ERR_UNDEF;
        if (!rd_op(st, h[4], h[5], &sptr)) return ERR_UNDEF;
        if (!rd_op(st, h[6], h[7], &num)) return ERR_UNDEF;
        if (!rd_op(st, h[8], h[9], &chunk)) return ERR_UNDEF;
        if (chunk == 0 || 24 % chunk) return ERR_BAD_EXT_OP;
        long idx = dptr;
        for (uint32_t i = 0; i < num; i++) {
            if (!mem_tryget(&st->mem, (long)sptr + i, &v)) return ERR_UNDEF;
            for (uint32_t j = 0; j < 24 / chunk; j++) {
                rc = mem_set(&st->mem, idx++,
                             (v >> (chunk * j)) & ((1u << chunk) - 1));
                if (rc) return rc;
            }
        }
        return OK;
    }
    case HK_DECOMPOSE_MERKLE_WHIR: { /* [op,n, 3x(kind,val)] */
        uint32_t dptr, chunk;
        if (!rd_op(st, h[2], h[3], &dptr)) return ERR_UNDEF;
        if (!rd_op(st, h[4], h[5], &v)) return ERR_UNDEF;
        if (!rd_op(st, h[6], h[7], &chunk)) return ERR_UNDEF;
        if (chunk == 0 || 24 % chunk) return ERR_BAD_EXT_OP;
        for (uint32_t j = 0; j < 24 / chunk; j++) {
            rc = mem_set(&st->mem, (long)dptr + j,
                         (v >> (chunk * j)) & ((1u << chunk) - 1));
            if (rc) return rc;
        }
        return OK;
    }
    case HK_DECOMPOSE_BITS: { /* [op,n, 3x(kind,val)] big-endian bits */
        uint32_t val, mi, nb;
        if (!rd_op(st, h[2], h[3], &val)) return ERR_UNDEF;
        if (!rd_op(st, h[4], h[5], &mi)) return ERR_UNDEF;
        if (!rd_op(st, h[6], h[7], &nb)) return ERR_UNDEF;
        if (nb > 31) return ERR_BAD_EXT_OP;
        for (uint32_t j = 0; j < nb; j++) {
            rc = mem_set(&st->mem, (long)mi + j, (val >> (nb - 1 - j)) & 1);
            if (rc) return rc;
        }
        return OK;
    }
    case HK_LESS_THAN: /* [op,n, ak,av, bk,bv, res_offset] */
        if (!rd_op(st, h[2], h[3], &a)) return ERR_UNDEF;
        if (!rd_op(st, h[4], h[5], &b)) return ERR_UNDEF;
        return mem_set(&st->mem, st->fp + h[6], a < b);
    case HK_LOG2_CEIL: { /* [op,n, ak,av, res_offset] */
        if (!rd_op(st, h[2], h[3], &a)) return ERR_UNDEF;
        uint32_t r = 0;
        if (a > 1) {
            uint32_t x = a - 1;
            while (x) { r++; x >>= 1; }
        }
        return mem_set(&st->mem, st->fp + h[4], r);
    }
    default:
        return ERR_BAD_EXT_OP;
    }
}

/* ---------------- the main loop ---------------- */

typedef struct {
    int err;
    long err_pc;
    long cycles;
    long ap;
    long final_fp;
    long mem_len; /* max defined index + 1 */
    long mem_cap;
    uint32_t *mem_vals;
    uint8_t *mem_def;
    uint32_t *pcs;
    uint32_t *fps;
    uint32_t *p16_rows;
    long n_p16;
    uint32_t *ext_rows;
    long n_ext;
    int64_t *prints;
    long n_print_words;
    int64_t *wit_cursor;
} RunOut;

void vm_free(RunOut *out) {
    free(out->mem_vals);
    free(out->mem_def);
    free(out->pcs);
    free(out->fps);
    free(out->p16_rows);
    free(out->ext_rows);
    free(out->prints);
    free(out->wit_cursor);
    free(out);
}

RunOut *vm_run(const int64_t *instr, long n_code, const int64_t *hint_stream,
               const int64_t *hint_off, long ending_pc,
               const uint32_t *public_mem, long public_len,
               const uint32_t *wit_values, const int64_t *wit_entry_off,
               const int64_t *wit_entry_len, const int64_t *wit_stream_start,
               const int64_t *wit_stream_count, long n_streams,
               long start_fp, long start_ap, long max_cycles) {
    Program pg = {instr, n_code, hint_stream, hint_off, ending_pc,
                  wit_values, wit_entry_off, wit_entry_len, wit_stream_start,
                  wit_stream_count, n_streams};
    State st;
    memset(&st, 0, sizeof(st));
    st.mem.cap = 1L << 16;
    while (st.mem.cap < public_len) st.mem.cap <<= 1;
    st.mem.vals = calloc(st.mem.cap, sizeof(uint32_t));
    st.mem.def = calloc(st.mem.cap, 1);
    memcpy(st.mem.vals, public_mem, public_len * sizeof(uint32_t));
    memset(st.mem.def, 1, public_len);
    st.mem.max_set = public_len - 1;
    st.fp = start_fp;
    st.ap = start_ap;
    st.pc = 0; /* STARTING_PC */
    st.wit_cursor = calloc(n_streams > 0 ? n_streams : 1, sizeof(int64_t));

    int rc = OK;
    while (st.cycles < max_cycles) {
        if (st.pc == ending_pc) break;
        if (st.pc < 0 || st.pc >= n_code) { rc = ERR_PC_OOB; break; }
        bufu_push(&st.pcs, (uint32_t)st.pc);
        bufu_push(&st.fps, (uint32_t)st.fp);
        st.cycles++;

        /* hints attached to this pc */
        for (long hp = hint_off[st.pc]; hp < hint_off[st.pc + 1];) {
            const int64_t *h = hint_stream + hp;
            rc = run_hint(&st, &pg, h, h[1]);
            if (rc) goto done;
            hp += 2 + h[1];
        }

        const int64_t *I = instr + st.pc * 10;
        int64_t kind = I[0];
        uint32_t va, vb, vc;
        int da, db, dc;
        switch (kind) {
        case IK_ADD:
        case IK_MUL: {
            /* a=arg_a, b=res, c=arg_c */
            da = rd_op(&st, I[1], I[2], &va);
            db = rd_op(&st, I[3], I[4], &vb);
            dc = rd_op(&st, I[5], I[6], &vc);
            int is_add = kind == IK_ADD;
            if (db && da && dc) {
                uint32_t expect = is_add ? addm(va, vc) : mulm(va, vc);
                if (vb != expect) { rc = ERR_MISMATCH; goto done; }
            } else if (!db) {
                if (!da || !dc) { rc = ERR_UNDEF; goto done; }
                rc = mem_set(&st.mem, st.fp + I[4],
                             is_add ? addm(va, vc) : mulm(va, vc));
                if (rc) goto done;
            } else if (!da) {
                if (!dc) { rc = ERR_UNDEF; goto done; }
                uint32_t solved;
                if (is_add) solved = subm(vb, vc);
                else {
                    if (!vc) { rc = ERR_DIV_ZERO; goto done; }
                    solved = mulm(vb, invm(vc));
                }
                rc = mem_set(&st.mem, st.fp + I[2], solved);
                if (rc) goto done;
            } else {
                uint32_t solved;
                if (is_add) solved = subm(vb, va);
                else {
                    if (!va) { rc = ERR_DIV_ZERO; goto done; }
                    solved = mulm(vb, invm(va));
                }
                rc = mem_set(&st.mem, st.fp + I[6], solved);
                if (rc) goto done;
            }
            st.pc++;
            break;
        }
        case IK_DEREF: {
            /* shift_0 = I[2], shift_1 = I[4], res = (I[5], I[6]) */
            dc = rd_op(&st, I[5], I[6], &vc);
            if (!mem_tryget(&st.mem, st.fp + I[2], &va)) {
                rc = ERR_UNDEF;
                goto done;
            }
            long ptr = (long)va + I[4];
            if (!dc) {
                if (mem_tryget(&st.mem, ptr, &vb)) {
                    rc = mem_set(&st.mem, st.fp + I[6], vb);
                    if (rc) goto done;
                } /* else deferred (range check) */
            } else {
                rc = mem_set(&st.mem, ptr, vc);
                if (rc) goto done;
            }
            st.pc++;
            break;
        }
        case IK_JUMP: {
            if (!rd_op(&st, I[1], I[2], &va)) { rc = ERR_UNDEF; goto done; }
            if (va > 1) { rc = ERR_BAD_COND; goto done; }
            if (va == 0) {
                st.pc++;
                break;
            }
            if (!rd_op(&st, I[3], I[4], &vb)) { rc = ERR_UNDEF; goto done; }
            if (!rd_op(&st, I[5], I[6], &vc)) { rc = ERR_UNDEF; goto done; }
            st.pc = vb;
            st.fp = vc;
            break;
        }
        case IK_P16: {
            if (!rd_op(&st, I[1], I[2], &va) || !rd_op(&st, I[3], I[4], &vb)
                || !rd_op(&st, I[5], I[6], &vc)) {
                rc = ERR_UNDEF;
                goto done;
            }
            rc = exec_p16(&st, va, vb, vc, I[7], I[8], I[9]);
            if (rc) goto done;
            st.pc++;
            break;
        }
        default: { /* IK_EXTOP */
            if (!rd_op(&st, I[1], I[2], &va) || !rd_op(&st, I[3], I[4], &vb)
                || !rd_op(&st, I[5], I[6], &vc)) {
                rc = ERR_UNDEF;
                goto done;
            }
            rc = exec_extop(&st, va, vb, vc, I[7], I[8], I[9]);
            if (rc) goto done;
            st.pc++;
            break;
        }
        }
    }
    if (rc == OK && st.cycles >= max_cycles) rc = ERR_CYCLE_LIMIT;

    if (rc == OK) {
        /* deref-hint fixpoint (runner.rs:207-233) */
        long n = st.derefs.len / 2;
        uint8_t *resolved = calloc(n > 0 ? n : 1, 1);
        int progress = 1;
        while (progress) {
            progress = 0;
            for (long i = 0; i < n; i++) {
                if (resolved[i]) continue;
                int64_t target = st.derefs.data[2 * i];
                int64_t src = st.derefs.data[2 * i + 1];
                uint32_t addr, v;
                if (!mem_tryget(&st.mem, src, &addr)) { rc = ERR_UNDEF; break; }
                if (!mem_tryget(&st.mem, addr, &v)) continue;
                rc = mem_set(&st.mem, target, v);
                if (rc) break;
                resolved[i] = 1;
                progress = 1;
            }
            if (rc) break;
        }
        if (rc == OK) {
            for (long i = 0; i < n; i++) {
                if (!resolved[i]) {
                    rc = mem_set(&st.mem, st.derefs.data[2 * i], 0);
                    if (rc) break;
                }
            }
        }
        free(resolved);
    }

done:;
    RunOut *out = calloc(1, sizeof(RunOut));
    out->err = rc;
    out->err_pc = st.pc;
    out->cycles = st.cycles;
    out->ap = st.ap;
    out->final_fp = st.fp;
    out->mem_len = st.mem.max_set + 1;
    out->mem_cap = st.mem.cap;
    out->mem_vals = st.mem.vals;
    out->mem_def = st.mem.def;
    out->pcs = st.pcs.data;
    out->fps = st.fps.data;
    out->p16_rows = st.p16_rows.data;
    out->n_p16 = st.p16_rows.len / 27;
    out->ext_rows = st.ext_rows.data;
    out->n_ext = st.ext_rows.len / 26;
    out->prints = st.prints.data;
    out->n_print_words = st.prints.len;
    out->wit_cursor = st.wit_cursor;
    free(st.derefs.data);
    return out;
}
