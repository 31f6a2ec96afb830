/* Native field-array kernels: DFT butterfly layers, MLE folds, eq tables.
 *
 * Canonical uint32 arrays; layouts match whir/dft.py and poly/np_poly.py.
 * Build: cc -O3 -shared -fPIC fieldops.c -o libfieldops.so
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define P 2130706433ull

static inline uint32_t addm(uint32_t a, uint32_t b) {
    uint32_t s = a + b;
    return s >= P ? s - (uint32_t)P : s;
}

static inline uint32_t subm(uint32_t a, uint32_t b) {
    return a >= b ? a - b : a + (uint32_t)P - b;
}

static inline uint32_t mulm(uint32_t a, uint32_t b) {
    return (uint32_t)(((uint64_t)a * b) % P);
}

/* One evals-basis butterfly layer over axis 0.
 * x: (n, tail) row-major; layer s: blocks of 2L rows, pair distance L;
 * (u, v) -> (u + (v-u) t_j, u - (v-u) t_j), j = index within block.
 * (whir/src/dft.rs:181-196 semantics) */
void dft_layer(uint32_t *x, const uint32_t *twiddles, long n, long L,
               long tail) {
    long block = 2 * L * tail;
    long n_blocks = (n * tail) / block;
    #pragma omp parallel for schedule(static) if (n * tail > (1 << 16))
    for (long bi = 0; bi < n_blocks; bi++) {
        long b0 = bi * block;
        for (long j = 0; j < L; j++) {
            uint32_t t = twiddles[j];
            uint32_t *u = x + b0 + j * tail;
            uint32_t *v = u + L * tail;
            for (long k = 0; k < tail; k++) {
                uint32_t w = mulm(subm(v[k], u[k]), t);
                uint32_t uu = u[k];
                u[k] = addm(uu, w);
                v[k] = subm(uu, w);
            }
        }
    }
}

/* MSB-first fold of a BASE table with an EF scalar:
 * out[i] = lo[i] + r*(hi[i]-lo[i])  (out ext, trailing axis 5). */
void fold_base(const uint32_t *m, const uint32_t *r, uint32_t *out, long half) {
    #pragma omp parallel for schedule(static) if (half > 8192)
    for (long i = 0; i < half; i++) {
        uint32_t d = subm(m[half + i], m[i]);
        for (int k = 0; k < 5; k++) {
            uint32_t t = mulm(r[k], d);
            out[5 * i + k] = k == 0 ? addm(m[i], t) : t;
        }
    }
}

/* MSB-first fold of an EXT table with an EF scalar. */
void fold_ext(const uint32_t *m, const uint32_t *r, uint32_t *out, long half) {
    #pragma omp parallel for schedule(static) if (half > 4096)
    for (long i = 0; i < half; i++) {
        const uint32_t *lo = m + 5 * i;
        const uint32_t *hi = m + 5 * (half + i);
        uint32_t d[5];
        for (int k = 0; k < 5; k++) d[k] = subm(hi[k], lo[k]);
        /* (d * r) via quintic convolution */
        uint64_t c[9];
        for (int k = 0; k < 9; k++) {
            __uint128_t acc = 0;
            int s = k - 4 > 0 ? k - 4 : 0;
            int e = k < 4 ? k : 4;
            for (int i2 = s; i2 <= e; i2++)
                acc += (uint64_t)d[i2] * r[k - i2];
            c[k] = (uint64_t)(acc % P);
        }
        for (int k = 3; k >= 0; k--) {
            uint64_t h = c[5 + k];
            c[k] = (c[k] + h) % P;
            c[k + 2] = (c[k + 2] + P - h) % P;
        }
        uint32_t *o = out + 5 * i;
        for (int k = 0; k < 5; k++) o[k] = addm(lo[k], (uint32_t)c[k]);
    }
}

/* eq table: out (2^n, 5) = scalar * eq(point, .), big-endian x.
 * point: (n, 5). (poly/eq_mle.rs:16-26 semantics) */
void eval_eq(const uint32_t *point, long n, const uint32_t *scalar,
             uint32_t *out) {
    out[0] = scalar[0];
    out[1] = scalar[1];
    out[2] = scalar[2];
    out[3] = scalar[3];
    out[4] = scalar[4];
    long size = 1;
    long v = 0;
    /* sequential in-place (back-to-front) for small levels */
    while (v < n && (size < 4096 || ((n - v) % 2) == 1)) {
        const uint32_t *a = point + 5 * v;
        for (long i = size - 1; i >= 0; i--) {
            const uint32_t *cur = out + 5 * i;
            uint32_t hi[5];
            uint64_t c[9];
            for (int k = 0; k < 9; k++) {
                __uint128_t acc = 0;
                int s = k - 4 > 0 ? k - 4 : 0;
                int e = k < 4 ? k : 4;
                for (int i2 = s; i2 <= e; i2++)
                    acc += (uint64_t)cur[i2] * a[k - i2];
                c[k] = (uint64_t)(acc % P);
            }
            for (int k = 3; k >= 0; k--) {
                uint64_t h = c[5 + k];
                c[k] = (c[k] + h) % P;
                c[k + 2] = (c[k + 2] + P - h) % P;
            }
            for (int k = 0; k < 5; k++) hi[k] = (uint32_t)c[k];
            uint32_t *dst_lo = out + 5 * (2 * i);
            uint32_t *dst_hi = out + 5 * (2 * i + 1);
            for (int k = 0; k < 5; k++) {
                uint32_t lo = subm(cur[k], hi[k]);
                dst_lo[k] = lo;
                dst_hi[k] = hi[k];
            }
        }
        size *= 2;
        v++;
    }
    if (v == n) return;
    /* remaining levels (even count): parallel ping-pong out->scratch->out,
     * no per-level snapshot copies */
    long final_size = size << (n - v);
    uint32_t *scratch = (uint32_t *)malloc((final_size / 2) * 5
                                           * sizeof(uint32_t));
    uint32_t *src_t = out;
    uint32_t *dst_t = scratch;
    for (; v < n; v++) {
        const uint32_t *a = point + 5 * v;
        #pragma omp parallel for schedule(static)
        for (long i = 0; i < size; i++) {
            const uint32_t *cur = src_t + 5 * i;
            uint32_t hi[5];
            uint64_t c[9];
            for (int k = 0; k < 9; k++) {
                __uint128_t acc = 0;
                int s = k - 4 > 0 ? k - 4 : 0;
                int e = k < 4 ? k : 4;
                for (int i2 = s; i2 <= e; i2++)
                    acc += (uint64_t)cur[i2] * a[k - i2];
                c[k] = (uint64_t)(acc % P);
            }
            for (int k = 3; k >= 0; k--) {
                uint64_t h = c[5 + k];
                c[k] = (c[k] + h) % P;
                c[k + 2] = (c[k + 2] + P - h) % P;
            }
            for (int k = 0; k < 5; k++) hi[k] = (uint32_t)c[k];
            uint32_t *dst_lo = dst_t + 5 * (2 * i);
            uint32_t *dst_hi = dst_t + 5 * (2 * i + 1);
            for (int k = 0; k < 5; k++) {
                dst_lo[k] = subm(cur[k], hi[k]);
                dst_hi[k] = hi[k];
            }
        }
        size *= 2;
        uint32_t *tmp = src_t;
        src_t = dst_t;
        dst_t = tmp;
    }
    /* even number of ping-pong levels => result back in out */
    free(scratch);
}

/* elementwise base-field ops over equal-length arrays */
void base_mul_batch(const uint32_t *a, const uint32_t *b, uint32_t *out,
                    long n) {
    #pragma omp parallel for schedule(static) if (n > (1 << 15))
    for (long i = 0; i < n; i++)
        out[i] = (uint32_t)(((uint64_t)a[i] * b[i]) % P);
}

void base_mul_scalar(const uint32_t *a, uint32_t s, uint32_t *out, long n) {
    #pragma omp parallel for schedule(static) if (n > (1 << 15))
    for (long i = 0; i < n; i++)
        out[i] = (uint32_t)(((uint64_t)a[i] * s) % P);
}

/* z-stacked sumcheck points for one column:
 * out[z*half + j] = lo[j] + zs[z] * (hi[j] - lo[j])
 * (cells = half base cells, or half*5 for an EF column: the formula is
 * coefficient-wise, so the flat layout works for both). */
void stack_z(const uint32_t *col, long half_cells, const uint32_t *zs,
             long n_z, uint32_t *out) {
    #pragma omp parallel for schedule(static) if (half_cells * n_z > (1 << 14))
    for (long z = 0; z < n_z; z++) {
        uint32_t zz = zs[z];
        const uint32_t *lo = col;
        const uint32_t *hi = col + half_cells;
        uint32_t *o = out + z * half_cells;
        if (zz == 0) {
            for (long j = 0; j < half_cells; j++) o[j] = lo[j];
        } else {
            for (long j = 0; j < half_cells; j++) {
                uint32_t d = subm(hi[j], lo[j]);
                o[j] = addm(lo[j], mulm(zz, d));
            }
        }
    }
}

/* quintic helpers for fused round kernels */
static void ef5_mul(const uint32_t *x, const uint32_t *y, uint32_t *o) {
    uint64_t c[9];
    for (int k = 0; k < 9; k++) {
        unsigned __int128 acc = 0;
        int lo = k - 4 > 0 ? k - 4 : 0;
        int hi = k < 4 ? k : 4;
        for (int i = lo; i <= hi; i++) acc += (uint64_t)x[i] * y[k - i];
        c[k] = (uint64_t)(acc % P);
    }
    for (int k = 3; k >= 0; k--) {
        uint64_t h = c[5 + k];
        c[k] = (c[k] + h) % P;
        c[k + 2] = (c[k + 2] + P - h) % P;
    }
    for (int k = 0; k < 5; k++) o[k] = (uint32_t)c[k];
}

/* One GKR quotient-layer sumcheck round (degree 2, z in {0,2}):
 * h(z) = sum_i eq[i] * (nl*dr + nr*dl + alpha*dl*dr)(z) over the halves.
 * Inputs are (2m, 5) EF tables; out = [h0(5) | h2(5)].
 * (quotient_gkr/mod.rs prover inner loop, fused.) */
void gkr_round_evals(const uint32_t *nl, const uint32_t *nr,
                     const uint32_t *dl, const uint32_t *dr,
                     const uint32_t *eq, const uint32_t *alpha,
                     long m, uint32_t *out) {
    uint32_t tot[10] = {0};
    #pragma omp parallel if (m > 1024)
    {
        uint32_t local[10] = {0};
        #pragma omp for schedule(static) nowait
        for (long i = 0; i < m; i++) {
            const uint32_t *cols[4] = {nl + 5 * i, nr + 5 * i,
                                       dl + 5 * i, dr + 5 * i};
            uint32_t v0[4][5], v2[4][5];
            for (int c = 0; c < 4; c++) {
                const uint32_t *lo = cols[c];
                const uint32_t *hi = cols[c] + 5 * m;
                for (int k = 0; k < 5; k++) {
                    uint32_t d = subm(hi[k], lo[k]);
                    v0[c][k] = lo[k];
                    v2[c][k] = addm(hi[k], d);
                }
            }
            const uint32_t *eqi = eq + 5 * i;
            for (int z = 0; z < 2; z++) {
                uint32_t (*v)[5] = z == 0 ? v0 : v2;
                uint32_t t1[5], t2[5], t3[5], c5[5];
                ef5_mul(v[0], v[3], t1);          /* nl*dr */
                ef5_mul(v[1], v[2], t2);          /* nr*dl */
                ef5_mul(v[2], v[3], t3);          /* dl*dr */
                ef5_mul(t3, alpha, c5);
                for (int k = 0; k < 5; k++)
                    c5[k] = addm(c5[k], addm(t1[k], t2[k]));
                ef5_mul(c5, eqi, t1);
                for (int k = 0; k < 5; k++)
                    local[5 * z + k] = addm(local[5 * z + k], t1[k]);
            }
        }
        #pragma omp critical
        for (int k = 0; k < 10; k++) tot[k] = addm(tot[k], local[k]);
    }
    for (int k = 0; k < 10; k++) out[k] = tot[k];
}


/* out[i] += a[i] (mod P), elementwise over n values */
void base_add_inplace(uint32_t *out, const uint32_t *a, long n) {
    #pragma omp parallel for schedule(static) if (n > (1 << 15))
    for (long i = 0; i < n; i++) out[i] = addm(out[i], a[i]);
}

/* out[i*5+k] = a[i*5+k] * s[i]  (EF rows scaled by per-row base scalars) */
void base_rowscale(const uint32_t *a, const uint32_t *s, uint32_t *out,
                   long n_rows) {
    #pragma omp parallel for schedule(static) if (n_rows > (1 << 14))
    for (long i = 0; i < n_rows; i++) {
        uint64_t sv = s[i];
        for (int k = 0; k < 5; k++)
            out[5 * i + k] = (uint32_t)((a[5 * i + k] * sv) % P);
    }
}

/* RS-encode reorder (whir/src/utils.rs:128-150 semantics):
 * mat[row, j] = evals[j * (n >> k) + (row >> r)] for j < dft_n_cols,
 * row < (n << r) >> k; evals cells = 1 (base) or 5 (ext coeffs). */
void reorder_repeat(const uint32_t *evals, long n, int k, int r,
                    long dft_n_cols, long cells, uint32_t *out) {
    long block_size = (n << r) >> k;
    long stride = n >> k;
    #pragma omp parallel for schedule(static) if (block_size > 1024)
    for (long row = 0; row < block_size; row++) {
        long src_row = row >> r;
        uint32_t *o = out + row * dft_n_cols * cells;
        for (long j = 0; j < dft_n_cols; j++) {
            const uint32_t *s = evals + (j * stride + src_row) * cells;
            for (long c = 0; c < cells; c++) o[j * cells + c] = s[c];
        }
    }
}

/* Product-sumcheck round coefficients (product_computation.rs):
 * c0 = sum y0*x0, c2 = sum (y1-y0)(x1-x0) over the halves, fused in one
 * pass. x: base (cells=1) or ext (cells=5); y: ext. out = [c0|c2]. */
void product_round_coeffs(const uint32_t *x, int x_ext, const uint32_t *y,
                          long half, uint32_t *out) {
    uint32_t tot[10] = {0};
    #pragma omp parallel if (half > 2048)
    {
        uint32_t local[10] = {0};
        #pragma omp for schedule(static) nowait
        for (long i = 0; i < half; i++) {
            const uint32_t *y0 = y + 5 * i;
            const uint32_t *y1 = y + 5 * (half + i);
            uint32_t dy[5], t[5];
            for (int k = 0; k < 5; k++) dy[k] = subm(y1[k], y0[k]);
            if (x_ext) {
                const uint32_t *x0 = x + 5 * i;
                const uint32_t *x1 = x + 5 * (half + i);
                uint32_t dx[5];
                for (int k = 0; k < 5; k++) dx[k] = subm(x1[k], x0[k]);
                ef5_mul(y0, x0, t);
                for (int k = 0; k < 5; k++)
                    local[k] = addm(local[k], t[k]);
                ef5_mul(dy, dx, t);
                for (int k = 0; k < 5; k++)
                    local[5 + k] = addm(local[5 + k], t[k]);
            } else {
                uint64_t x0 = x[i];
                uint64_t dx = subm(x[half + i], x[i]);
                for (int k = 0; k < 5; k++) {
                    local[k] = addm(local[k],
                                    (uint32_t)((y0[k] * x0) % P));
                    local[5 + k] = addm(local[5 + k],
                                        (uint32_t)((dy[k] * dx) % P));
                }
            }
        }
        #pragma omp critical
        for (int k = 0; k < 10; k++) tot[k] = addm(tot[k], local[k]);
    }
    for (int k = 0; k < 10; k++) out[k] = tot[k];
}

void base_add_batch(const uint32_t *a, const uint32_t *b, uint32_t *out,
                    long n) {
    #pragma omp parallel for schedule(static) if (n > (1 << 16))
    for (long i = 0; i < n; i++) out[i] = addm(a[i], b[i]);
}

void base_sub_batch(const uint32_t *a, const uint32_t *b, uint32_t *out,
                    long n) {
    #pragma omp parallel for schedule(static) if (n > (1 << 16))
    for (long i = 0; i < n; i++) out[i] = subm(a[i], b[i]);
}

/* Full MLE evaluation: MSB-first fold chain (np_poly.eval_mle semantics).
 * m: (2^n,) base table (is_ext=0) or (2^n, 5) ext table (is_ext=1);
 * point: (n, 5); out: (5,). One scratch allocation, folds in place. */
void eval_mle(const uint32_t *m, int is_ext, const uint32_t *point, long n,
              uint32_t *out) {
    if (n == 0) {
        for (int k = 0; k < 5; k++) out[k] = is_ext ? m[k] : (k ? 0 : m[0]);
        return;
    }
    long half = 1L << (n - 1);
    uint32_t *buf = (uint32_t *)malloc(half * 5 * sizeof(uint32_t));
    long v = 0;
    if (!is_ext) {
        fold_base(m, point, buf, half);
        v = 1;
    } else {
        /* first ext fold reads from m, writes into buf */
        #pragma omp parallel for schedule(static) if (half > 4096)
        for (long i = 0; i < half; i++) {
            const uint32_t *lo = m + 5 * i;
            const uint32_t *hi = m + 5 * (half + i);
            uint32_t d[5];
            for (int k = 0; k < 5; k++) d[k] = subm(hi[k], lo[k]);
            uint64_t c[9];
            for (int k = 0; k < 9; k++) {
                __uint128_t acc = 0;
                int s = k - 4 > 0 ? k - 4 : 0;
                int e = k < 4 ? k : 4;
                for (int i2 = s; i2 <= e; i2++)
                    acc += (uint64_t)d[i2] * point[k - i2];
                c[k] = (uint64_t)(acc % P);
            }
            for (int k = 3; k >= 0; k--) {
                uint64_t h = c[5 + k];
                c[k] = (c[k] + h) % P;
                c[k + 2] = (c[k + 2] + P - h) % P;
            }
            uint32_t *o = buf + 5 * i;
            for (int k = 0; k < 5; k++) o[k] = addm(lo[k], (uint32_t)c[k]);
        }
        v = 1;
    }
    while (v < n) {
        half >>= 1;
        fold_ext(buf, point + 5 * v, buf, half);
        v++;
    }
    for (int k = 0; k < 5; k++) out[k] = buf[k];
    free(buf);
}

/* Fused tensor-product accumulate:
 *   weights[(i << b) + j] += hi[i] * lo[j]   (quintic mul, ext += )
 * hi: (2^a, 5) already scaled by the statement scalar; lo: (2^b, 5).
 * One mul + one add per cell, no 2^n temporary (SplitEq analog,
 * whir split_eq.rs semantics). */
void eq_outer_add(uint32_t *weights, const uint32_t *hi, long na,
                  const uint32_t *lo, long nb) {
    #pragma omp parallel for schedule(static) if (na * nb > 8192)
    for (long i = 0; i < na; i++) {
        const uint32_t *h = hi + 5 * i;
        uint32_t *dst = weights + 5 * i * nb;
        for (long j = 0; j < nb; j++) {
            const uint32_t *l = lo + 5 * j;
            uint64_t c[9];
            for (int k = 0; k < 9; k++) {
                __uint128_t acc = 0;
                int s = k - 4 > 0 ? k - 4 : 0;
                int e = k < 4 ? k : 4;
                for (int i2 = s; i2 <= e; i2++)
                    acc += (uint64_t)h[i2] * l[k - i2];
                c[k] = (uint64_t)(acc % P);
            }
            for (int k = 3; k >= 0; k--) {
                uint64_t hh = c[5 + k];
                c[k] = (c[k] + hh) % P;
                c[k + 2] = (c[k + 2] + P - hh) % P;
            }
            uint32_t *o = dst + 5 * j;
            for (int k = 0; k < 5; k++)
                o[k] = addm(o[k], (uint32_t)c[k]);
        }
    }
}

/* One GKR quotient reduction layer (quotient_gkr/mod.rs semantics):
 *   num_up[i] = n[2i]*d[2i+1] + n[2i+1]*d[2i],  den_up[i] = d[2i]*d[2i+1]
 * nums: base (is_base=1, (2m,)) or ext ((2m,5)); dens: (2m, 5).
 * Fused single pass over stride-2 pairs, contiguous ext outputs. */
static inline void qmul(const uint32_t *x, const uint32_t *y, uint32_t *o) {
    uint64_t c[9];
    for (int k = 0; k < 9; k++) {
        __uint128_t acc = 0;
        int s = k - 4 > 0 ? k - 4 : 0;
        int e = k < 4 ? k : 4;
        for (int i2 = s; i2 <= e; i2++)
            acc += (uint64_t)x[i2] * y[k - i2];
        c[k] = (uint64_t)(acc % P);
    }
    for (int k = 3; k >= 0; k--) {
        uint64_t h = c[5 + k];
        c[k] = (c[k] + h) % P;
        c[k + 2] = (c[k + 2] + P - h) % P;
    }
    for (int k = 0; k < 5; k++) o[k] = (uint32_t)c[k];
}

void gkr_layer_up(const uint32_t *nums, int is_base, const uint32_t *dens,
                  uint32_t *num_up, uint32_t *den_up, long m) {
    #pragma omp parallel for schedule(static) if (m > 2048)
    for (long i = 0; i < m; i++) {
        const uint32_t *dl = dens + 10 * i;
        const uint32_t *dr = dl + 5;
        uint32_t a[5], b[5];
        if (is_base) {
            uint32_t nl = nums[2 * i], nr = nums[2 * i + 1];
            for (int k = 0; k < 5; k++) {
                a[k] = mulm(nl, dr[k]);
                b[k] = mulm(nr, dl[k]);
            }
        } else {
            qmul(nums + 10 * i, dr, a);
            qmul(nums + 10 * i + 5, dl, b);
        }
        uint32_t *no = num_up + 5 * i;
        for (int k = 0; k < 5; k++) no[k] = addm(a[k], b[k]);
        qmul(dl, dr, den_up + 5 * i);
    }
}

/* Parallel row gather: out[i] = data[idx[i]] over rows of `w` uint32s. */
void gather_rows(const uint32_t *data, const long *idx, long n, long w,
                 uint32_t *out) {
    #pragma omp parallel for schedule(static) if (n * w > (1 << 16))
    for (long i = 0; i < n; i++) {
        const uint32_t *src = data + idx[i] * w;
        uint32_t *dst = out + i * w;
        for (long k = 0; k < w; k++) dst[k] = src[k];
    }
}
