/* Scalar Poseidon-16 permutation over KoalaBear (canonical form).
 *
 * Native hot path for the sequential Fiat-Shamir duplex sponge: the
 * transcript absorbs one 8-element chunk at a time, so these permutations
 * cannot batch; a C loop beats numpy's per-call overhead by ~30x.
 * Constants are injected via poseidon16_constants.h (generated from
 * poseidon/constants.py, which mirrors poseidon1_koalabear_16.rs:11-35).
 *
 * Build: gcc -O3 -shared -fPIC poseidon16.c -o libposeidon16.so
 */

#include <stdint.h>

#include "poseidon16_constants.h"

#define P 2130706433u

static inline uint32_t addm(uint32_t a, uint32_t b) {
    uint32_t s = a + b; /* a,b < P < 2^31: no overflow */
    return s >= P ? s - P : s;
}

static inline uint32_t mulm(uint32_t a, uint32_t b) {
    return (uint32_t)(((uint64_t)a * b) % P);
}

static inline uint32_t cubem(uint32_t a) {
    return mulm(mulm(a, a), a);
}

static void mds16(uint32_t *s) {
    uint32_t out[16];
    for (int i = 0; i < 16; i++) {
        uint64_t acc = 0;
        /* circulant row entries <= 101: 16 products of < 2^38 fit u64 */
        for (int j = 0; j < 16; j++) {
            acc += (uint64_t)MDS16[i][j] * s[j];
        }
        out[i] = (uint32_t)(acc % P);
    }
    for (int i = 0; i < 16; i++) s[i] = out[i];
}

void poseidon16_permute(uint32_t *s) {
    int r = 0;
    for (int k = 0; k < 4; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = cubem(addm(s[i], RC16[r][i]));
        mds16(s);
    }
    for (int k = 0; k < 20; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = addm(s[i], RC16[r][i]);
        s[0] = cubem(s[0]);
        mds16(s);
    }
    for (int k = 0; k < 4; k++, r++) {
        for (int i = 0; i < 16; i++) s[i] = cubem(addm(s[i], RC16[r][i]));
        mds16(s);
    }
}

void poseidon16_permute_batch(uint32_t *states, long n) {
    #pragma omp parallel for schedule(static) if (n > 256)
    for (long i = 0; i < n; i++) poseidon16_permute(states + 16 * i);
}

/* PoW grinding: SMALLEST witness in [start, end), parallel min-reduction
 * (deterministic: matches the sequential scan-from-zero semantics, so
 * host/device transcripts stay bit-identical). Returns -1 if none. */
long poseidon16_grind(const uint32_t *capacity, int bits, long start,
                      long end) {
    uint32_t mask = (1u << bits) - 1u;
    long found = 0x7fffffffffffffffL;
    #pragma omp parallel for schedule(static, 4096) reduction(min:found)
    for (long w = start; w < end; w++) {
        uint32_t s[16];
        for (int j = 0; j < 8; j++) s[j] = capacity[j];
        s[8] = (uint32_t)w;
        for (int j = 9; j < 16; j++) s[j] = 0;
        poseidon16_permute(s);
        if ((s[8] & mask) == 0 && w < found) found = w;
    }
    return found == 0x7fffffffffffffffL ? -1 : found;
}

void poseidon16_compress_batch(uint32_t *states, long n) {
    #pragma omp parallel for schedule(static) if (n > 256)
    for (long i = 0; i < n; i++) {
        uint32_t *s = states + 16 * i;
        uint32_t in[16];
        for (int j = 0; j < 16; j++) in[j] = s[j];
        poseidon16_permute(s);
        for (int j = 0; j < 16; j++) s[j] = addm(s[j], in[j]);
    }
}
