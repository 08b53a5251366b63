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


def _engine_kernel(count_ref, rec_ref, init_ref, rlps_ref, tmps_ref,
                   tlps_ref, out_ref, nbytes_ref, ctx_ref):
    """One grid step = one slice.  rec_ref [CAP, 3] int32 in VMEM,
    out_ref [OUT_CAP] int32 (big-endian bytes packed 4/word)."""
    nrec = count_ref[0]

    # per-slice context init (state | mps<<8 packed)
    def init_body(i, _):
        ctx_ref[i] = init_ref[i]
        return 0

    jax.lax.fori_loop(0, N_CTX, init_body, 0)
    out_ref[:] = jnp.zeros_like(out_ref)

    # carry: low, range, bouts, first, acc, accbits, outpos
    def emit(carry, bit):
        low, rng, bouts, first, acc, nb, pos = carry
        acc = (acc << 1) | bit      # int32 wraparound is fine
        nb = nb + 1

        def flush(args):
            acc, nb, pos = args
            out_ref[0, pos] = acc
            return 0, 0, pos + 1

        acc, nb, pos = jax.lax.cond(
            nb == 32, flush, lambda a: a, (acc, nb, pos))
        return (low, rng, bouts, first, acc, nb, pos)

    def put_bit(carry, bit):
        low, rng, bouts, first, acc, nb, pos = carry

        def not_first(c):
            return emit(c, bit)

        def is_first(c):
            return (c[0], c[1], c[2], 0, c[4], c[5], c[6])

        carry = jax.lax.cond(first == 1, is_first, not_first, carry)

        def drain(c):
            c = emit(c, 1 - bit)
            return (c[0], c[1], c[2] - 1, c[3], c[4], c[5], c[6])

        carry = jax.lax.while_loop(lambda c: c[2] > 0, drain, carry)
        return carry

    def renorm(carry):
        def body(c):
            low, rng = c[0], c[1]

            def hi(cc):
                return put_bit((cc[0] - 512,) + cc[1:], 1)

            def midlo(cc):
                def lo(c3):
                    return put_bit(c3, 0)

                def mid(c3):
                    return (c3[0] - 256, c3[1], c3[2] + 1) + c3[3:]

                return jax.lax.cond(cc[0] < 256, lo, mid, cc)

            c = jax.lax.cond(low >= 512, hi, midlo, c)
            return (c[0] << 1, c[1] << 1) + c[2:]

        return jax.lax.while_loop(lambda c: c[1] < 256, body, carry)

    def do_ctx(carry, a, b):
        ctx = a
        binv = b & 1
        cnt = b >> 1

        def bin_body(_, c):
            packed = ctx_ref[ctx]
            st = packed & 0xFF
            mps = packed >> 8
            rlps = rlps_ref[(st << 2) | ((c[1] >> 6) & 3)]
            rng = c[1] - rlps

            def lps(cc):
                nmps = jnp.where(st == 0, 1 - mps, mps)
                ctx_ref[ctx] = tlps_ref[st] | (nmps << 8)
                return (cc[0] + rng, rlps) + cc[2:]

            def mps_f(cc):
                ctx_ref[ctx] = tmps_ref[st] | (mps << 8)
                return (cc[0], rng) + cc[2:]

            c = jax.lax.cond(binv != mps, lps, mps_f, c)
            return renorm(c)

        return jax.lax.fori_loop(0, cnt, bin_body, carry)

    def do_bypass(carry, a, b):
        def bit_body(i, c):
            bit = (a >> (b - 1 - i)) & 1
            low = (c[0] << 1) + bit * c[1]

            def hi(cc):
                cc = put_bit(cc, 1)
                return (cc[0] - 1024,) + cc[1:]

            def midlo(cc):
                def lo(c3):
                    return put_bit(c3, 0)

                def mid(c3):
                    return (c3[0] - 512, c3[1], c3[2] + 1) + c3[3:]

                return jax.lax.cond(cc[0] < 512, lo, mid, cc)

            c = (low,) + c[1:]
            return jax.lax.cond(low >= 1024, hi, midlo, c)

        return jax.lax.fori_loop(0, b, bit_body, carry)

    def do_term(carry, a, b):
        rng = carry[1] - 2

        def fin(c):
            c = (c[0] + rng, 2) + c[2:]
            c = renorm(c)
            c = put_bit(c, (c[0] >> 9) & 1)
            c = emit(c, (c[0] >> 8) & 1)
            return emit(c, 1)

        def cont(c):
            return renorm((c[0], rng) + c[2:])

        return jax.lax.cond(a != 0, fin, cont, carry)

    def rec_body(i, carry):
        kind = rec_ref[0, i, 0]
        a = rec_ref[0, i, 1]
        b = rec_ref[0, i, 2]
        return jax.lax.switch(
            jnp.clip(kind, 0, 2),
            [functools.partial(do_ctx, a=a, b=b),
             functools.partial(do_bypass, a=a, b=b),
             functools.partial(do_term, a=a, b=b)],
            carry)

    carry = (jnp.int32(0), jnp.int32(510), jnp.int32(0), jnp.int32(1),
             jnp.int32(0), jnp.int32(0), jnp.int32(0))
    carry = jax.lax.fori_loop(0, nrec, rec_body, carry)
    # pad the final partial word with zero bits (alignment zeros)
    low, rng, bouts, first, acc, nb, pos = carry
    nbits_total = pos * 32 + nb
    acc = jnp.where(nb > 0, acc << (32 - nb), acc)

    @pl.when(nb > 0)
    def _():
        out_ref[0, pos] = acc

    nbytes_ref[0, 0] = (nbits_total + 7) // 8


def make_slice_encoder(cap: int, out_cap_words: int,
                       interpret: bool | None = None):
    """Build fn(records [S, cap, 3], counts [S], init [460]) ->
    (words [S, out_cap] int32 big-endian, nbytes [S])."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    rlps = jnp.asarray(_RANGE_LPS)
    tmps = jnp.asarray(_TRANS_MPS)
    tlps = jnp.asarray(_TRANS_LPS)

    def run(records, counts, init_packed):
        n_slices = records.shape[0]
        grid = (n_slices,)
        out, nbytes = pl.pallas_call(
            _engine_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n_slices, out_cap_words), jnp.int32),
                jax.ShapeDtypeStruct((n_slices, 1), jnp.int32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, cap, 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, out_cap_words), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.SMEM((N_CTX,), jnp.int32)],
            interpret=interpret,
        )(counts.astype(jnp.int32), records.astype(jnp.int32),
          init_packed.astype(jnp.int32), rlps, tmps, tlps)
        return out, nbytes[:, 0]

    return run


def init_packed_states(table: int, slice_qp: int) -> np.ndarray:
    state, mps = tbl.init_states(table, slice_qp)
    return (state.astype(np.int32) | (mps.astype(np.int32) << 8))
