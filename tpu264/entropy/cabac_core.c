/* CABAC arithmetic-coder record replay (spec 9.3.4) — native core.
 *
 * The binarization layer (cabac_binarize.py) produces vectorized
 * (kind, a, b) record streams; this engine replays them through the
 * range coder at native speed.  It is the host twin of the lane-serial
 * Pallas per-slice kernel and the oracle-speed path for the CPU backend.
 * Mirrors entropy/cabac_engine.py:CabacEncoder bit-for-bit.
 *
 * Built at import time by entropy/cabac_native.py (gcc -O2 -shared).
 */
#include <stdint.h>

#define K_CTX 0
#define K_BYP 1
#define K_TERM 2

typedef struct {
    uint32_t low, range;
    long bouts;          /* bits outstanding */
    int first;
    uint8_t byte;
    int nbits;
    uint8_t *out;
    long pos, cap;
    int overflow;
} Enc;

static inline void write_bit(Enc *e, int b) {
    e->byte = (uint8_t)((e->byte << 1) | b);
    if (++e->nbits == 8) {
        if (e->pos >= e->cap) { e->overflow = 1; e->pos = 0; }
        e->out[e->pos++] = e->byte;
        e->byte = 0;
        e->nbits = 0;
    }
}

static inline void put_bit(Enc *e, int b) {
    if (e->first) e->first = 0; else write_bit(e, b);
    while (e->bouts > 0) { write_bit(e, 1 - b); e->bouts--; }
}

static inline void renorm(Enc *e) {
    while (e->range < 256) {
        if (e->low >= 512) { e->low -= 512; put_bit(e, 1); }
        else if (e->low < 256) put_bit(e, 0);
        else { e->low -= 256; e->bouts++; }
        e->range <<= 1;
        e->low <<= 1;
    }
}

long cabac_encode_records(
    const int8_t *kind, const int32_t *a, const int32_t *b, long nrec,
    const uint8_t *range_lps,        /* [64][4] */
    const uint8_t *trans_mps,        /* [64] */
    const uint8_t *trans_lps,        /* [64] */
    uint8_t *state, uint8_t *mps,    /* [n_ctx], initialized by caller */
    uint8_t *out, long out_cap)
{
    Enc e = {0, 510, 0, 1, 0, 0, out, 0, out_cap, 0};
    for (long r = 0; r < nrec; r++) {
        int k = kind[r];
        if (k == K_CTX) {
            int ctx = a[r];
            int binv = b[r] & 1;
            int cnt = b[r] >> 1;
            for (int i = 0; i < cnt; i++) {
                int s = state[ctx];
                uint32_t rlps = range_lps[(s << 2) | ((e.range >> 6) & 3)];
                e.range -= rlps;
                if (binv != mps[ctx]) {
                    e.low += e.range;
                    e.range = rlps;
                    if (s == 0) mps[ctx] ^= 1;
                    state[ctx] = trans_lps[s];
                } else {
                    state[ctx] = trans_mps[s];
                }
                renorm(&e);
            }
        } else if (k == K_BYP) {
            int nb = b[r];
            uint32_t v = (uint32_t)a[r];
            for (int i = nb - 1; i >= 0; i--) {
                e.low <<= 1;
                if ((v >> i) & 1) e.low += e.range;
                if (e.low >= 1024) { put_bit(&e, 1); e.low -= 1024; }
                else if (e.low < 512) put_bit(&e, 0);
                else { e.low -= 512; e.bouts++; }
            }
        } else {                      /* K_TERM */
            e.range -= 2;
            if (a[r]) {
                e.low += e.range;
                /* flush */
                e.range = 2;
                renorm(&e);
                put_bit(&e, (e.low >> 9) & 1);
                write_bit(&e, (e.low >> 8) & 1);
                write_bit(&e, 1);
            } else {
                renorm(&e);
            }
        }
        if (e.overflow) return -1;
    }
    while (e.nbits) write_bit(&e, 0);     /* alignment zero bits */
    return e.overflow ? -1 : e.pos;
}
