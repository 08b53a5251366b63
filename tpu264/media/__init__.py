from .synth import synth_frame, synth_sequence
from .yuv_io import read_yuv420, write_yuv420
