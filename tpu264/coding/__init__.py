"""Frame/slice/macroblock coding: wavefront scheduling and mode decision.

The JM per-MB raster loop (`encode_one_macroblock`, SURVEY.md §3.1)
becomes: a `lax.scan` over anti-diagonal waves of macroblocks, each wave
processing all its MBs (and all candidate modes) as batch dimensions.
"""
