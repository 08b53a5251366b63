"""Encoder configuration.

JM drives `lencod` from `encoder.cfg` `Key = Value # comment` files plus
`-p Key=Value` CLI overrides (upstream `lencod/src/configfile.c` — SURVEY.md
§5 config/flag system).  We keep the same file syntax and the JM key names
for the subset we support, parsed into a frozen dataclass whose static
fields feed `jax.jit` as compile-time constants.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

PROFILE_BASELINE = 66
PROFILE_MAIN = 77
PROFILE_HIGH = 100


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    # source
    input_file: Optional[str] = None
    width: int = 176
    height: int = 144
    frames: int = 1
    frame_rate: float = 30.0

    # profile / tools
    profile_idc: int = PROFILE_BASELINE
    level_idc: int = 30
    symbol_mode: str = "CAVLC"          # CAVLC | CABAC (JM `SymbolMode`)
    qp: int = 28                         # QPISlice
    qp_p: Optional[int] = None           # QPPSlice (defaults to qp)
    qp_b: Optional[int] = None           # QPBSlice (defaults to qp_p + 2)
    intra_period: int = 1                # JM IntraPeriod: 1 = all-intra, 0 = first frame only, N = periodic IDR
    num_b_frames: int = 0                # JM NumberBFrames
    num_ref_frames: int = 1
    search_range: int = 16               # JM SearchRange (full-pel)
    me_subpel: bool = True               # half+quarter pel refinement
    # 16x8/8x16 + P_8x8 inter partitions (JM InterSearch16x8/8x16/8x8);
    # None = auto (on for IPPP and B-GOP anchors, both entropy coders)
    inter_partitions: "Optional[bool]" = None
    # High-profile 8x8 transform (JM Transform8x8Mode); None = auto
    # (on for IPPP and B GOPs, both entropy coders)
    transform_8x8: "Optional[bool]" = None
    # SEI emission (JM SEIMessages): user_data_unregistered encoder tag
    # + recovery_point after the parameter sets
    sei_messages: bool = False
    # explicit P weighted prediction (JM WeightedPrediction); opt-in:
    # per-frame luma gain/offset estimation for fades (single-device
    # IPPP encoder; the tiled path does not emit WP)
    weighted_pred: bool = False
    deblock: bool = True                 # in-loop filter enable
    rate_control: bool = False           # JM RateControlEnable
    bitrate: int = 0                     # target bps when rate_control
    slices_per_frame: int = 1            # tile/slice rows (also the TP axis)
    # runtime
    use_pallas: Optional[bool] = None    # None → auto: on iff backend is TPU
    output_file: str = "out.264"
    recon_file: Optional[str] = None

    @property
    def qp_inter(self) -> int:
        return self.qp if self.qp_p is None else self.qp_p

    @property
    def qp_bslice(self) -> int:
        """Layer-1 B QP (JM QPBSlice); deeper pyramid layers add +1."""
        return min(self.qp_inter + 2, 51) if self.qp_b is None else self.qp_b

    @property
    def width_mbs(self) -> int:
        return (self.width + 15) // 16

    @property
    def height_mbs(self) -> int:
        return (self.height + 15) // 16

    def validate(self) -> None:
        if self.width % 16 or self.height % 16:
            raise ValueError("frame dims must be multiples of 16 (no cropping yet)")
        if self.symbol_mode not in ("CAVLC", "CABAC"):
            raise ValueError(f"bad SymbolMode {self.symbol_mode}")
        if not 0 <= self.qp <= 51:
            raise ValueError("QP out of range")
        if self.height_mbs % self.slices_per_frame:
            raise ValueError("slices_per_frame must divide MB rows")


# JM config key → dataclass field (+ parser)
_JM_KEYS = {
    "InputFile": ("input_file", str),
    "SourceWidth": ("width", int),
    "SourceHeight": ("height", int),
    "FramesToBeEncoded": ("frames", int),
    "FrameRate": ("frame_rate", float),
    "ProfileIDC": ("profile_idc", int),
    "LevelIDC": ("level_idc", int),
    "SymbolMode": ("symbol_mode", lambda s: "CABAC" if s.strip() in ("1", "CABAC") else "CAVLC"),
    "QPISlice": ("qp", int),
    "QPPSlice": ("qp_p", int),
    "QPBSlice": ("qp_b", int),
    "IntraPeriod": ("intra_period", int),
    "NumberBFrames": ("num_b_frames", int),
    "NumberReferenceFrames": ("num_ref_frames", int),
    "SearchRange": ("search_range", int),
    "InterPartitions": ("inter_partitions", lambda s: bool(int(s))),
    "SEIMessages": ("sei_messages", lambda s: bool(int(s))),
    "Transform8x8Mode": ("transform_8x8", lambda s: bool(int(s))),
    "WeightedPrediction": ("weighted_pred", lambda s: bool(int(s))),
    "RateControlEnable": ("rate_control", lambda s: bool(int(s))),
    "Bitrate": ("bitrate", int),
    "OutputFile": ("output_file", str),
    "ReconFile": ("recon_file", str),
    "SlicesPerFrame": ("slices_per_frame", int),
    "LoopFilterDisable": ("deblock", lambda s: not bool(int(s))),
}


def parse_cfg_text(text: str, base: Optional[EncoderConfig] = None) -> EncoderConfig:
    """Parse JM-style `Key = Value # comment` text into a config."""
    updates = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        key, val = (p.strip() for p in line.split("=", 1))
        if key in _JM_KEYS:
            field, conv = _JM_KEYS[key]
            updates[field] = conv(val)
    cfg = dataclasses.replace(base or EncoderConfig(), **updates)
    cfg.validate()
    return cfg


def load_cfg(path: str, overrides: Optional[dict] = None) -> EncoderConfig:
    with open(path) as f:
        cfg = parse_cfg_text(f.read())
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
        cfg.validate()
    return cfg
