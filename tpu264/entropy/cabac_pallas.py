"""Lane-serialized per-slice CABAC range coder as a Pallas TPU kernel.

BASELINE.json north star: "CABAC range-coder as a lane-serialized
per-slice loop".  The binarization layer produces (kind, a, b) record
streams per slice (cabac_binarize / its jnp twin); this kernel replays
them through the arithmetic coder (spec 9.3.4) entirely on device, so in
CABAC mode only packed slice payloads cross the device->host link.
Slices are the parallel axis (grid dimension; across chips each tile's
slices encode on their own core).

Engine state (low/range/outstanding/bit-accumulator) lives in the
fori_loop carry; the 460 context states live in SMEM scratch.  Mirrors
`cabac_core.c` / `cabac_engine.CabacEncoder` bit-for-bit (tests).

Record format (see cabac_binarize):
  kind 0: a = ctxIdx, b = bin | (count << 1)   — count bins, same ctx
  kind 1: a = bypass value (MSB first), b = nbits <= 16
  kind 2: a = terminate bin
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cabac_tables as tbl

# flattened engine tables (SMEM-resident int32)
_RANGE_LPS = np.asarray(tbl.RANGE_TAB_LPS, np.int32).reshape(-1)  # [256]
_TRANS_MPS = np.asarray(tbl.TRANS_IDX_MPS, np.int32)              # [64]
_TRANS_LPS = np.asarray(tbl.TRANS_IDX_LPS, np.int32)              # [64]

N_CTX = 460


_BLK = 256            # output block: words buffered in VMEM, stored aligned


def _engine_kernel(count_ref, rec_ref, init_ref, rlps_ref, tmps_ref,
                   tlps_ref, out_ref, nbytes_ref, ctx_ref, carry_ref,
                   buf_ref, *, chunk: int, n_chunks: int):
    """Grid step = (slice, record-chunk).  rec_ref [1, chunk] PACKED
    int32 records in VMEM (kind<<30 | a<<14 | b — records stream
    chunk-by-chunk from HBM, so slices larger than VMEM encode fine);
    out_ref [OUT_CAP] int32 (big-endian bytes packed 4/word).

    Engine state (low/range/outstanding/first/acc/accbits/outpos) and
    the 460 context states live in SMEM scratch, persisting across the
    chunk steps of one slice.  Output words accumulate in a 256-word
    VMEM block via masked lane inserts (TPU has no scalar VMEM stores)
    and flush as aligned vector stores when the block fills."""
    c = pl.program_id(1)
    nrec = count_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _BLK), 1)

    @pl.when(c == 0)
    def _():
        # per-slice context init (state | mps<<8 packed) + engine reset
        def init_body(i, _):
            ctx_ref[i] = init_ref[i]
            return 0

        jax.lax.fori_loop(0, N_CTX, init_body, 0)
        out_ref[:] = jnp.zeros_like(out_ref)
        buf_ref[:, :] = jnp.zeros_like(buf_ref)
        for i, v0 in enumerate((0, 510, 0, 1, 0, 0, 0)):
            carry_ref[i] = v0

    # carry: low, range, bouts, first, acc, accbits, outpos
    def emit(carry, bit, pred):
        """Append one bit to the accumulator when `pred` (branchless)."""
        low, rng, bouts, first, acc, nb, pos = carry
        acc = jnp.where(pred, (acc << 1) | bit, acc)
        nb = jnp.where(pred, nb + 1, nb)
        full = pred & (nb == 32)
        idx = pos & (_BLK - 1)
        buf_ref[:, :] = jnp.where(full & (lane == idx), acc,
                                  buf_ref[:, :])

        @pl.when(full & (idx == _BLK - 1))
        def _():
            # start expressed as (pos >> 8) * _BLK so Mosaic can prove
            # the 128-lane alignment of the dynamic store
            out_ref[0, pl.ds((pos >> 8) * _BLK, _BLK)] = buf_ref[0, :]
            buf_ref[:, :] = jnp.zeros_like(buf_ref)

        pos = jnp.where(full, pos + 1, pos)
        acc = jnp.where(full, 0, acc)
        nb = jnp.where(full, 0, nb)
        return (low, rng, bouts, first, acc, nb, pos)

    def put_bit(carry, bit, pred):
        """bit + outstanding drain when `pred`; swallows the first bit."""
        carry = emit(carry, bit, pred & (carry[3] == 0))
        first = jnp.where(pred, 0, carry[3])
        carry = carry[:3] + (first,) + carry[4:]

        def drain(cc):
            cc = emit(cc, 1 - bit, True)
            return cc[:2] + (cc[2] - 1,) + cc[3:]

        return jax.lax.while_loop(lambda cc: pred & (cc[2] > 0), drain,
                                  carry)

    def renorm(carry):
        def body(cc):
            low = cc[0]
            is_hi = low >= 512
            is_mid = (low >= 256) & ~is_hi
            low = low - jnp.where(is_hi, 512, jnp.where(is_mid, 256, 0))
            cc = (low,) + cc[1:]
            cc = put_bit(cc, jnp.where(is_hi, 1, 0), ~is_mid)
            cc = cc[:2] + (cc[2] + is_mid.astype(jnp.int32),) + cc[3:]
            return (cc[0] << 1, cc[1] << 1) + cc[2:]

        return jax.lax.while_loop(lambda cc: cc[1] < 256, body, carry)

    def do_ctx(carry, a, b):
        ctx = a
        binv = b & 1
        cnt = b >> 1

        def bin_body(_, cc):
            packed = ctx_ref[ctx]
            st = packed & 0xFF
            mps = packed >> 8
            rlps = rlps_ref[(st << 2) | ((cc[1] >> 6) & 3)]
            rng = cc[1] - rlps
            is_lps = binv != mps
            nmps = jnp.where(st == 0, 1 - mps, mps)
            ctx_ref[ctx] = jnp.where(is_lps,
                                     tlps_ref[st] | (nmps << 8),
                                     tmps_ref[st] | (mps << 8))
            cc = (jnp.where(is_lps, cc[0] + rng, cc[0]),
                  jnp.where(is_lps, rlps, rng)) + cc[2:]
            return renorm(cc)

        return jax.lax.fori_loop(0, cnt, bin_body, carry)

    def do_bypass(carry, a, b):
        def bit_body(i, cc):
            bit = (a >> (b - 1 - i)) & 1
            low = (cc[0] << 1) + bit * cc[1]
            is_hi = low >= 1024
            is_mid = (low >= 512) & ~is_hi
            low = low - jnp.where(is_hi, 1024,
                                  jnp.where(is_mid, 512, 0))
            cc = (low,) + cc[1:]
            cc = put_bit(cc, jnp.where(is_hi, 1, 0), ~is_mid)
            return cc[:2] + (cc[2] + is_mid.astype(jnp.int32),) + cc[3:]

        return jax.lax.fori_loop(0, b, bit_body, carry)

    def do_term(carry, a, b):
        fin = a != 0
        rng = carry[1] - 2
        carry = (jnp.where(fin, carry[0] + rng, carry[0]),
                 jnp.where(fin, 2, rng)) + carry[2:]
        carry = renorm(carry)
        carry = put_bit(carry, (carry[0] >> 9) & 1, fin)
        carry = emit(carry, (carry[0] >> 8) & 1, fin)
        return emit(carry, 1, fin)

    def rec_body(i, carry):
        p = rec_ref[0, i]
        kind = (p >> 30) & 3
        a = (p >> 14) & 0xFFFF
        b = p & 0x3FFF
        return jax.lax.switch(
            jnp.clip(kind, 0, 2),
            [functools.partial(do_ctx, a=a, b=b),
             functools.partial(do_bypass, a=a, b=b),
             functools.partial(do_term, a=a, b=b)],
            carry)

    carry = tuple(carry_ref[i] for i in range(7))
    lo = c * chunk
    todo = jnp.clip(nrec - lo, 0, chunk)
    carry = jax.lax.fori_loop(0, todo, rec_body, carry)
    for i in range(7):
        carry_ref[i] = carry[i]

    @pl.when(c == n_chunks - 1)
    def _():
        # pad the final partial word with zero bits (alignment zeros)
        # and flush the partial output block
        pos = carry_ref[6]
        nb = carry_ref[5]
        nbits_total = pos * 32 + nb
        acc = jnp.where(nb > 0, carry_ref[4] << (32 - nb), 0)
        idx = pos & (_BLK - 1)
        buf_ref[:, :] = jnp.where((nb > 0) & (lane == idx), acc,
                                  buf_ref[:, :])
        out_ref[0, pl.ds((pos >> 8) * _BLK, _BLK)] = buf_ref[0, :]
        nbytes_ref[0, 0] = (nbits_total + 7) // 8


def make_slice_encoder(cap: int, out_cap_words: int,
                       interpret: bool | None = None,
                       chunk: int | None = None):
    """Build fn(records [S, cap] packed int32, counts [S], init [460])
    -> (words [S, out_cap] int32 big-endian, nbytes [S]).

    `chunk`: records stream VMEM-resident `chunk` at a time (engine
    state persists in SMEM across chunks) — required when cap * 4 bytes
    exceeds VMEM (720p/1080p whole-frame slices).  Default: one chunk.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    if chunk is None:
        chunk = cap
    assert cap % chunk == 0, (cap, chunk)
    n_chunks = cap // chunk
    out_cap_words = -(-out_cap_words // _BLK) * _BLK + _BLK
    rlps = jnp.asarray(_RANGE_LPS)
    tmps = jnp.asarray(_TRANS_MPS)
    tlps = jnp.asarray(_TRANS_LPS)
    kernel = functools.partial(_engine_kernel, chunk=chunk,
                               n_chunks=n_chunks)

    def run(records, counts, init_packed):
        n_slices = records.shape[0]
        grid = (n_slices, n_chunks)
        out, nbytes = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n_slices, out_cap_words), jnp.int32),
                jax.ShapeDtypeStruct((n_slices, 1), jnp.int32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda s, c: (s,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, chunk), lambda s, c: (s, c),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, out_cap_words), lambda s, c: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda s, c: (s, 0),
                             memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.SMEM((N_CTX,), jnp.int32),
                            pltpu.SMEM((8,), jnp.int32),
                            pltpu.VMEM((1, _BLK), jnp.int32)],
            interpret=interpret,
        )(counts.astype(jnp.int32), records.astype(jnp.int32),
          init_packed.astype(jnp.int32), rlps, tmps, tlps)
        return out, nbytes[:, 0]

    return run


_COMPILED_OK: bool | None = None


def engine_compiles() -> bool:
    """Probe whether the engine kernel lowers on the current backend
    (compiled mode).  Callers fall back to the native C replay over the
    device-built records when it doesn't."""
    global _COMPILED_OK
    if _COMPILED_OK is None:
        try:
            run = make_slice_encoder(8, 16, chunk=8)
            rec = np.zeros((1, 8), np.int32)
            # terminate(1): kind 2 << 30 wraps the int32 sign bit
            rec[0, 0] = np.int64((2 << 30) | (1 << 14)).astype(np.int32)
            w, nb = run(jnp.asarray(rec),
                        jnp.asarray(np.array([1], np.int32)),
                        jnp.asarray(init_packed_states(0, 30)))
            np.asarray(w)
            _COMPILED_OK = int(np.asarray(nb)[0]) > 0
        except Exception:
            _COMPILED_OK = False
    return _COMPILED_OK


def init_packed_states(table: int, slice_qp: int) -> np.ndarray:
    state, mps = tbl.init_states(table, slice_qp)
    return (state.astype(np.int32) | (mps.astype(np.int32) << 8))


def init_packed_states_j(table: int, slice_qp):
    """Traced-QP twin of init_packed_states (spec 9.3.1.1) — lets the
    per-slice context init live inside a jitted step (rate control
    varies QP per frame without recompiling)."""
    m = jnp.asarray(tbl.INIT_TABLES[table, :, 0], jnp.int32)
    n = jnp.asarray(tbl.INIT_TABLES[table, :, 1], jnp.int32)
    pre = jnp.clip(((m * jnp.clip(slice_qp, 0, 51)) >> 4) + n, 1, 126)
    mps = (pre > 63).astype(jnp.int32)
    state = jnp.where(pre <= 63, 63 - pre, pre - 64)
    return state | (mps << 8)
