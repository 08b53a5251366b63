"""CABAC slice-syntax parser (decoder side of `entropy.cabac_slice`).

Parses one CABAC slice's macroblock layer into plain per-MB value dicts
(spec 7.3.5/9.3.3; JM `mb_read.c` CABAC branches — SURVEY.md §3.2), using
the same paired element coders and `CabacFrameState` as the encoder so
context derivation cannot diverge between the two.
"""

from __future__ import annotations

import numpy as np

from tpu264.coding.wavefront import BLK_ORDER
from tpu264.entropy import cabac_ctx as cs
from tpu264.entropy.cabac_engine import CabacDecoder


class CabacSliceParser:
    def __init__(self, rbsp: bytes, bit_offset: int, table: int, qp: int,
                 state: cs.CabacFrameState, sid: int):
        # slice data starts byte-aligned after cabac_alignment_one_bit
        start = (bit_offset + 7) // 8 * 8
        self.eng = CabacDecoder(table, qp, rbsp, bitpos=start)
        self.st = state
        self.sid = sid
        self.st.prev_qp_delta_nz = 0

    # ------------------------------------------------------------ MB level
    def mb_skip(self, mr, mc, b_slice: bool = False) -> bool:
        self.st.start_mb(mr, mc, self.sid)
        skip = self.eng.decode(
            self.st.ctx_mb_skip(mr, mc, self.sid, b_slice))
        return bool(skip)

    def end_of_slice(self) -> bool:
        return bool(self.eng.decode_terminate())

    def note_skip(self, mr, mc):
        self.st.set_skip(mr, mc)

    def parse_mb(self, mr, mc, p_slice: bool, intra_cb,
                 b_slice: bool = False):
        """Parse one (non-skip) macroblock → value dict.

        intra_cb.mpm(gr4, gc4) returns the most-probable intra 4x4 mode for
        a global 4x4 block position; intra_cb.set(gr4, gc4, mode) records a
        just-parsed mode (later blocks of the same MB predict from it).
        """
        eng, st, sid = self.eng, self.st, self.sid
        use0 = use1 = False
        direct = False
        if b_slice:
            mbt = cs.decode_mb_type_b(eng, st.ctx_mb_type_b(mr, mc, sid))
            if mbt == 0:               # B_Direct_16x16
                direct = True
                inter = True
            else:
                inter = mbt < 23
            if inter and not direct:
                if mbt not in (1, 2, 3):
                    raise NotImplementedError(f"B mb_type {mbt}")
                use0 = mbt in (1, 3)
                use1 = mbt in (2, 3)
            elif not inter:
                mbt -= 23
        elif not p_slice:
            st.start_mb(mr, mc, sid)
            mbt = cs.decode_mb_type_intra(
                eng, st.ctx_mb_type_i(mr, mc, sid), cs.I_REST)
            inter = False
        else:
            mbt = cs.decode_mb_type_p(eng)
            inter = mbt < 5
            if not inter:
                mbt -= 5
        out = {"mb_type": mbt, "inter": inter,
               "use0": use0, "use1": use1, "direct": direct}
        if not inter and mbt == 25:
            raise NotImplementedError("I_PCM")

        if direct:
            kind = cs.K_DIRECT
        elif inter:
            if not b_slice and mbt != 0:
                raise NotImplementedError(f"P mb_type {mbt} (partitions)")
            kind = cs.K_INTER
        elif mbt == 0:
            kind = cs.K_I4
        else:
            kind = cs.K_I16
        st.kind[mr, mc] = kind
        intra = not inter

        if kind == cs.K_I4:
            modes = np.zeros(16, dtype=np.int64)
            for idx, (by, bx) in enumerate(BLK_ORDER):
                gr, gc = mr * 4 + by, mc * 4 + bx
                m = cs.decode_i4_mode(eng, intra_cb.mpm(gr, gc))
                intra_cb.set(gr, gc, m)
                modes[idx] = m
            out["modes"] = modes
        if intra:
            cpm = cs.decode_cpm(eng, st.ctx_cpm(mr, mc, sid))
            st.cpm[mr, mc] = cpm
            out["cmode"] = cpm
        if kind == cs.K_DIRECT:
            # no ref idx / mvd syntax; neighbors see |mvd| 0
            st.absmvd[mr, mc] = 0
            st.absmvd1[mr, mc] = 0
        if kind == cs.K_INTER:
            if b_slice:
                st.absmvd[mr, mc] = 0
                st.absmvd1[mr, mc] = 0
                for lx, use in ((0, use0), (1, use1)):
                    if not use:
                        continue
                    mvd_x = cs.decode_mvd(eng, st, mr, mc, sid, 1, lx)
                    mvd_y = cs.decode_mvd(eng, st, mr, mc, sid, 0, lx)
                    amvd = st.absmvd if lx == 0 else st.absmvd1
                    amvd[mr, mc, 0] = abs(mvd_y)
                    amvd[mr, mc, 1] = abs(mvd_x)
                    out[f"mvd{lx}"] = (mvd_y, mvd_x)
            else:
                mvd_x = cs.decode_mvd(eng, st, mr, mc, sid, 1)
                mvd_y = cs.decode_mvd(eng, st, mr, mc, sid, 0)
                st.absmvd[mr, mc, 0] = abs(mvd_y)
                st.absmvd[mr, mc, 1] = abs(mvd_x)
                out["mvd"] = (mvd_y, mvd_x)

        if kind == cs.K_I16:
            t = mbt - 1
            out["i16mode"] = t % 4
            cbp_c = (t // 4) % 3
            cbp_l = 15 if t >= 12 else 0
        else:
            cbp = cs.decode_cbp(eng, st, mr, mc, sid)
            cbp_l, cbp_c = cbp & 15, cbp >> 4
        st.cbp_luma[mr, mc] = cbp_l
        st.cbp_chroma[mr, mc] = cbp_c
        out["cbp_luma"], out["cbp_chroma"] = cbp_l, cbp_c

        out["qp_delta"] = 0
        if cbp_l or cbp_c or kind == cs.K_I16:
            out["qp_delta"] = cs.decode_qp_delta(eng, st)

        # residuals
        if kind == cs.K_I16:
            dc, cbf = cs.decode_residual(
                eng, 16, 0, st.ctx_cbf_luma_dc(mr, mc, sid, intra))
            st.cbf_ldc[mr, mc] = cbf
            out["luma_dc"] = dc
            acs = np.zeros((16, 15), dtype=np.int64)
            if cbp_l:
                for idx, (by, bx) in enumerate(BLK_ORDER):
                    g4r, g4c = mr * 4 + by, mc * 4 + bx
                    acs[idx], cbf = cs.decode_residual(
                        eng, 15, 1,
                        st.ctx_cbf_luma4(g4r, g4c, sid, intra, 1))
                    st.cbf_l4[g4r, g4c] = cbf
            out["luma_ac15"] = acs
        else:
            blocks = np.zeros((16, 16), dtype=np.int64)
            for idx, (by, bx) in enumerate(BLK_ORDER):
                if (cbp_l >> (idx // 4)) & 1:
                    g4r, g4c = mr * 4 + by, mc * 4 + bx
                    blocks[idx], cbf = cs.decode_residual(
                        eng, 16, 2,
                        st.ctx_cbf_luma4(g4r, g4c, sid, intra, 2))
                    st.cbf_l4[g4r, g4c] = cbf
            out["luma4"] = blocks

        cdc = np.zeros((2, 4), dtype=np.int64)
        if cbp_c >= 1:
            for comp in range(2):
                cdc[comp], cbf = cs.decode_residual(
                    eng, 4, 3,
                    st.ctx_cbf_chroma_dc(mr, mc, sid, intra, comp))
                st.cbf_cdc[comp, mr, mc] = cbf
        out["chroma_dc"] = cdc
        cac = np.zeros((2, 4, 15), dtype=np.int64)
        if cbp_c == 2:
            for comp in range(2):
                for idx in range(4):
                    by, bx = idx // 2, idx % 2
                    g2r, g2c = mr * 2 + by, mc * 2 + bx
                    cac[comp, idx], cbf = cs.decode_residual(
                        eng, 15, 4,
                        st.ctx_cbf_chroma_ac(g2r, g2c, sid, intra, comp))
                    st.cbf_cac[comp, g2r, g2c] = cbf
        out["chroma_ac"] = cac
        return out
