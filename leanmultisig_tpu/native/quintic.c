/* Batched quintic-extension multiplication over KoalaBear.
 *
 * F[X]/(X^5 + X^2 - 1), canonical uint32 coefficients, trailing-axis-5
 * layout (matches field/np_field.py emul). Full 5x5 convolution with
 * __uint128_t accumulation (5 products of < 2^62 each), one reduction per
 * convolution coefficient, then the X^{5+k} = X^k - X^{2+k} reduction
 * (quintic_extension/extension.rs:529-549 semantics).
 *
 * Build: cc -O3 -shared -fPIC quintic.c -o libquintic.so
 */

#include <stdint.h>

#define P 2130706433ull

/* out = a * b elementwise over n extension elements (may alias inputs) */
void quintic_mul_batch(const uint32_t *a, const uint32_t *b, uint32_t *out,
                       long n) {
    #pragma omp parallel for schedule(static) if (n > 2048)
    for (long e = 0; e < n; e++) {
        const uint32_t *x = a + 5 * e;
        const uint32_t *y = b + 5 * e;
        uint64_t c[9];
        for (int k = 0; k < 9; k++) {
            __uint128_t acc = 0;
            int lo = k - 4 > 0 ? k - 4 : 0;
            int hi = k < 4 ? k : 4;
            for (int i = lo; i <= hi; i++) {
                acc += (uint64_t)x[i] * y[k - i];
            }
            c[k] = (uint64_t)(acc % P);
        }
        for (int k = 3; k >= 0; k--) {
            uint64_t h = c[5 + k];
            c[k] = (c[k] + h) % P;
            c[k + 2] = (c[k + 2] + P - h) % P;
        }
        uint32_t *o = out + 5 * e;
        for (int k = 0; k < 5; k++) o[k] = (uint32_t)c[k];
    }
}

/* out = a * s where s is ONE extension scalar broadcast over n elements */
void quintic_mul_scalar_batch(const uint32_t *a, const uint32_t *s,
                              uint32_t *out, long n) {
    #pragma omp parallel for schedule(static) if (n > 2048)
    for (long e = 0; e < n; e++) {
        const uint32_t *x = a + 5 * e;
        uint64_t c[9];
        for (int k = 0; k < 9; k++) {
            __uint128_t acc = 0;
            int lo = k - 4 > 0 ? k - 4 : 0;
            int hi = k < 4 ? k : 4;
            for (int i = lo; i <= hi; i++) {
                acc += (uint64_t)x[i] * s[k - i];
            }
            c[k] = (uint64_t)(acc % P);
        }
        for (int k = 3; k >= 0; k--) {
            uint64_t h = c[5 + k];
            c[k] = (c[k] + h) % P;
            c[k + 2] = (c[k + 2] + P - h) % P;
        }
        uint32_t *o = out + 5 * e;
        for (int k = 0; k < 5; k++) o[k] = (uint32_t)c[k];
    }
}
