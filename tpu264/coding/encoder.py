"""Sequence-level encoder orchestration (JM `lencod` main loop parity —
SURVEY.md §3.1): parameter-set emission, per-frame device encode, host
entropy serialization, Annex-B assembly, per-frame stats logging.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from tpu264.bits import nal
from tpu264.bits.bitwriter import BitSink
from tpu264.bits.params import PPS, SPS
from tpu264.bits.slicehdr import SLICE_I, SLICE_P, SliceHeader
from tpu264.config import EncoderConfig
from tpu264.entropy import slice_writer
from .inter_frame import make_inter_encoder
from .intra_frame import make_intra_encoder, reorder_wave_outputs
from .wavefront import build_schedule


@dataclasses.dataclass
class FrameStats:
    frame: int
    slice_type: str
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    seconds: float


def psnr(orig: np.ndarray, recon: np.ndarray) -> float:
    mse = np.mean((orig.astype(np.float64) - recon.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.99
    return 10 * np.log10(255.0 ** 2 / mse)


class Encoder:
    """CAVLC encoder: all-intra or IPPP GOPs (BASELINE.json configs 1-2).

    `gop_mode`: "intra" = every frame IDR; "ippp" = first frame IDR, rest
    P (JM IntraPeriod semantics: cfg.intra_period > 0 inserts periodic
    IDR frames).  B slices, CABAC and deblocking are later stages
    (SURVEY.md §7 build plan).
    """

    def __init__(self, cfg: EncoderConfig, gop_mode: str | None = None):
        cfg.validate()
        self.cfg = cfg
        if gop_mode is None:
            gop_mode = "intra" if cfg.intra_period == 1 else "ippp"
        self.gop_mode = gop_mode
        self.sched = build_schedule(cfg.width_mbs, cfg.height_mbs,
                                    cfg.slices_per_frame)
        self.sps = SPS(
            profile_idc=cfg.profile_idc,
            constraint_flags=0xC0 if cfg.profile_idc == 66 else 0,
            level_idc=cfg.level_idc,
            pic_order_cnt_type=2,
            max_num_ref_frames=max(1, cfg.num_ref_frames),
            pic_width_in_mbs=cfg.width_mbs,
            pic_height_in_map_units=cfg.height_mbs,
        )
        self.cabac = cfg.symbol_mode.upper() == "CABAC"
        if self.cabac and self.sps.profile_idc == 66:
            # CABAC requires Main/High (spec A.2.1); JM errors out — we
            # upgrade the signalled profile instead
            self.sps.profile_idc = 77
            self.sps.constraint_flags = 0
        self.pps = PPS(
            entropy_coding_mode_flag=1 if self.cabac else 0,
            pic_init_qp=26,
            deblocking_filter_control_present_flag=1,
        )
        self._encode_frame = make_intra_encoder(self.sched, cfg.qp)
        self._encode_p = None
        if gop_mode == "ippp":
            self._encode_p = make_inter_encoder(
                self.sched, cfg.qp_inter, search_range=cfg.search_range)
        # in-loop deblocking: idc 0 (on) single-slice, idc 2 (slice-local)
        # multi-slice, idc 1 (off) when disabled
        self.deblock_idc = (1 if not cfg.deblock
                            else (0 if cfg.slices_per_frame == 1 else 2))
        self._deblock = {}
        if cfg.deblock:
            from tpu264.kernels.deblock import make_deblocker
            from tpu264.ref.transform import chroma_qp
            for q in {cfg.qp, cfg.qp_inter}:
                self._deblock[q] = make_deblocker(
                    self.sched, q, chroma_qp(q),
                    filter_across_slices=(self.deblock_idc == 0))
        self.stats: list[FrameStats] = []

    def _apply_deblock(self, dev_out, mb, qp: int, is_inter=None, mv=None):
        """Filter the reconstructed picture for output/DPB (intra
        prediction already consumed the unfiltered samples)."""
        import jax.numpy as jnp
        from tpu264.coding import mvpred
        from tpu264.entropy import mb_syntax
        cfg = self.cfg
        n = cfg.width_mbs * cfg.height_mbs
        sel16 = mb["sel16"].astype(bool)
        if is_inter is None:
            is_inter = np.zeros(n, dtype=bool)
        cbp_luma, _, _ = mb_syntax.compute_cbp(
            sel16, mb["luma_ac"].astype(np.int64), mb["chroma_dc"],
            mb["chroma_ac"])
        tc = mb_syntax.luma_tc_grid(sel16, cbp_luma,
                                    mb["luma_ac"].astype(np.int64),
                                    cfg.width_mbs, cfg.height_mbs)
        intra_mb = (~is_inter).reshape(cfg.height_mbs, cfg.width_mbs)
        if mv is None:
            mv = np.zeros((n, 2), dtype=np.int64)
        mv_grid = np.where(is_inter[:, None], mv, 0).reshape(
            cfg.height_mbs, cfg.width_mbs, 2)
        ref_grid = np.where(is_inter, 0, mvpred.INTRA).reshape(
            cfg.height_mbs, cfg.width_mbs)
        fy, fu, fv = self._deblock[qp](
            dev_out["recon_y"], dev_out["recon_u"], dev_out["recon_v"],
            jnp.asarray(intra_mb), jnp.asarray(tc), jnp.asarray(mv_grid),
            jnp.asarray(ref_grid))
        return (np.asarray(fy, dtype=np.uint8),
                np.asarray(fu, dtype=np.uint8),
                np.asarray(fv, dtype=np.uint8))

    def encode_sequence(self, frames) -> bytes:
        """frames: iterable of (y, u, v) uint8 planes. Returns Annex-B."""
        out = [nal.make_nalu(3, nal.NAL_SPS, self.sps.write_rbsp()),
               nal.make_nalu(3, nal.NAL_PPS, self.pps.write_rbsp())]
        self.recons = []
        frame_num = 0
        idr_count = 0
        for i, (y, u, v) in enumerate(frames):
            t0 = time.monotonic()
            period = self.cfg.intra_period
            is_idr = (self.gop_mode == "intra" or i == 0
                      or (period > 1 and i % period == 0))
            if is_idr:
                nalus, recon = self.encode_intra_frame(
                    y, u, v, frame_num=0, idr_pic_id=idr_count % 2)
                idr_count += 1
                frame_num = 1
            else:
                nalus, recon = self.encode_p_frame(
                    y, u, v, self.recons[-1], frame_num=frame_num)
                frame_num = (frame_num + 1) % (1 << self.sps.log2_max_frame_num)
            dt = time.monotonic() - t0
            out.extend(nalus)
            self.recons.append(recon)
            bits = sum(8 * len(b) for b in nalus)
            self.stats.append(FrameStats(
                i, "IDR" if is_idr else "P", bits,
                psnr(y, recon[0]), psnr(u, recon[1]), psnr(v, recon[2]), dt))
        return b"".join(out)

    def encode_intra_frame(self, y, u, v, frame_num: int = 0,
                           idr_pic_id: int = 0):
        """Encode one IDR frame → ([nalu bytes...], (recY, recU, recV))."""
        cfg = self.cfg
        dev_out, ys = self._encode_frame(np.asarray(y), np.asarray(u),
                                         np.asarray(v))
        mb = reorder_wave_outputs(self.sched, jax_to_np(ys))
        slice_rows = self.sched.slice_starts.tolist()
        if self.cabac:
            from tpu264.entropy.cabac_slice import encode_frame_cabac
            payloads, _ = encode_frame_cabac(
                mb, cfg.width_mbs, cfg.height_mbs, slice_rows, cfg.qp)
        else:
            values, lengths = slice_writer.serialize_frame_mbs(
                mb, cfg.width_mbs, cfg.height_mbs, slice_rows)
        nalus = []
        rows_per_slice = cfg.height_mbs // cfg.slices_per_frame
        for s in range(cfg.slices_per_frame):
            first_mb = s * rows_per_slice * cfg.width_mbs
            last_mb = first_mb + rows_per_slice * cfg.width_mbs
            hdr = SliceHeader(
                first_mb_in_slice=first_mb,
                slice_type=SLICE_I,
                frame_num=frame_num,
                idr_pic_id=idr_pic_id,
                slice_qp=cfg.qp,
                disable_deblocking_filter_idc=self.deblock_idc,
                is_idr=True,
            )
            sink = hdr.write_rbsp_head(self.sps, self.pps)
            if self.cabac:
                sink.cabac_align()
                rbsp = sink.to_bytes() + payloads[s]
            else:
                rbsp = slice_writer.pack_slice(
                    values[first_mb:last_mb], lengths[first_mb:last_mb],
                    sink)
            nalus.append(nal.make_nalu(3, nal.NAL_IDR, rbsp))
        if cfg.deblock:
            recon = self._apply_deblock(dev_out, mb, cfg.qp)
        else:
            recon = (np.asarray(dev_out["recon_y"], dtype=np.uint8),
                     np.asarray(dev_out["recon_u"], dtype=np.uint8),
                     np.asarray(dev_out["recon_v"], dtype=np.uint8))
        return nalus, recon

    def encode_p_frame(self, y, u, v, ref, frame_num: int):
        """Encode one P frame against `ref` = (y, u, v) recon planes."""
        cfg = self.cfg
        dev_out, ys = self._encode_p(np.asarray(y), np.asarray(u),
                                     np.asarray(v), np.asarray(ref[0]),
                                     np.asarray(ref[1]), np.asarray(ref[2]))
        mb = reorder_wave_outputs(self.sched, jax_to_np(ys))
        slice_rows = self.sched.slice_starts.tolist()
        if self.cabac:
            from tpu264.entropy.cabac_slice import encode_frame_cabac
            payloads, skipped = encode_frame_cabac(
                mb, cfg.width_mbs, cfg.height_mbs, slice_rows,
                cfg.qp_inter, p_slice=True)
        else:
            values, lengths, skipped = slice_writer.serialize_frame_mbs_p(
                mb, cfg.width_mbs, cfg.height_mbs, slice_rows)
        nalus = []
        rows_per_slice = cfg.height_mbs // cfg.slices_per_frame
        for s in range(cfg.slices_per_frame):
            first_mb = s * rows_per_slice * cfg.width_mbs
            last_mb = first_mb + rows_per_slice * cfg.width_mbs
            hdr = SliceHeader(
                first_mb_in_slice=first_mb,
                slice_type=SLICE_P,
                frame_num=frame_num,
                slice_qp=cfg.qp_inter,
                disable_deblocking_filter_idc=self.deblock_idc,
                is_idr=False,
                nal_ref_idc=2,
            )
            sink = hdr.write_rbsp_head(self.sps, self.pps)
            if self.cabac:
                sink.cabac_align()
                rbsp = sink.to_bytes() + payloads[s]
            else:
                tail = slice_writer.trailing_skip_run(skipped, first_mb,
                                                      last_mb)
                rbsp = slice_writer.pack_slice(
                    values[first_mb:last_mb], lengths[first_mb:last_mb],
                    sink, final_skip_run=tail)
            nalus.append(nal.make_nalu(2, nal.NAL_SLICE, rbsp))
        if cfg.deblock:
            recon = self._apply_deblock(dev_out, mb, cfg.qp_inter,
                                        is_inter=mb["is_inter"].astype(bool),
                                        mv=mb["mv"].astype(np.int64))
        else:
            recon = (np.asarray(dev_out["recon_y"], dtype=np.uint8),
                     np.asarray(dev_out["recon_u"], dtype=np.uint8),
                     np.asarray(dev_out["recon_v"], dtype=np.uint8))
        return nalus, recon


def jax_to_np(tree):
    return {k: np.asarray(val) for k, val in tree.items()}
