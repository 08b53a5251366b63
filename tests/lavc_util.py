"""libavcodec H.264 *decoder* via ctypes: exact YUV planes as the external
bit-exactness oracle (SURVEY.md §4.2).  Companion to `x264_util` (encoder).

Unlike the OpenCV path in `ffmpeg_util`, this surfaces all three planes
exactly and reports whether the decoder logged any errors.
"""

import ctypes
import numpy as np

from x264_util import AVFrame, AVPacket, _lavc, _lavu

_lavc.avcodec_find_decoder_by_name.restype = ctypes.c_void_p
_lavc.avcodec_find_decoder_by_name.argtypes = [ctypes.c_char_p]
_lavc.avcodec_send_packet.restype = ctypes.c_int
_lavc.avcodec_send_packet.argtypes = [ctypes.c_void_p, ctypes.POINTER(AVPacket)]
_lavc.avcodec_receive_frame.restype = ctypes.c_int
_lavc.avcodec_receive_frame.argtypes = [ctypes.c_void_p, ctypes.POINTER(AVFrame)]
_lavc.av_packet_free.restype = None
_lavc.av_packet_free.argtypes = [ctypes.POINTER(ctypes.POINTER(AVPacket))]
_lavu.av_frame_free.restype = None
_lavu.av_frame_free.argtypes = [ctypes.POINTER(ctypes.POINTER(AVFrame))]
_lavu.av_log_set_callback.restype = None
_lavu.av_log_set_callback.argtypes = [ctypes.c_void_p]
_lavc.av_parser_init.restype = ctypes.c_void_p
_lavc.av_parser_init.argtypes = [ctypes.c_int]
_lavc.av_parser_parse2.restype = ctypes.c_int
_lavc.av_parser_parse2.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int),
    ctypes.c_void_p, ctypes.c_int,
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
_lavc.av_parser_close.restype = None
_lavc.av_parser_close.argtypes = [ctypes.c_void_p]

AV_CODEC_ID_H264 = 27

_LOG_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int,
                           ctypes.c_char_p, ctypes.c_void_p)

_log_lines = []
_AV_LOG_WARNING = 24


@_LOG_CB
def _log_hook(ptr, level, fmt, vargs):
    if level <= _AV_LOG_WARNING:
        try:
            _log_lines.append(fmt.decode("utf-8", "replace"))
        except Exception:
            pass


def lavc_decode(stream: bytes, width: int = 0, height: int = 0):
    """Decode an Annex-B H.264 stream → (frames, errors).

    frames: list of (y, u, v) uint8 plane arrays (exact decoder output).
    errors: list of libavcodec warning/error format strings logged while
    decoding (empty for a clean conforming stream).
    width/height accepted for API symmetry; actual sizes come from the SPS.
    """
    codec = _lavc.avcodec_find_decoder_by_name(b"h264")
    assert codec, "h264 decoder not found"
    ctx = _lavc.avcodec_alloc_context3(codec)
    assert ctx
    r = _lavc.avcodec_open2(ctx, codec, None)
    assert r == 0, f"avcodec_open2 -> {r}"

    del _log_lines[:]
    _lavu.av_log_set_callback(_log_hook)

    pkt = _lavc.av_packet_alloc()
    frame = _lavu.av_frame_alloc()
    parser = _lavc.av_parser_init(AV_CODEC_ID_H264)
    assert parser

    frames = []

    def drain():
        while True:
            r = _lavc.avcodec_receive_frame(ctx, frame)
            if r != 0:
                return
            f = frame.contents
            w, h = f.width, f.height
            planes = []
            for p, (ph, pw) in enumerate(((h, w), (h // 2, w // 2),
                                          (h // 2, w // 2))):
                ls = f.linesize[p]
                raw = (ctypes.c_uint8 * (ls * ph)).from_address(f.data[p])
                arr = np.frombuffer(raw, dtype=np.uint8).reshape(ph, ls)
                planes.append(arr[:, :pw].copy())
            frames.append(tuple(planes))

    buf = ctypes.create_string_buffer(bytes(stream),
                                      len(stream) + 64)  # lavc padding
    pos, remaining = 0, len(stream)
    out_data = ctypes.c_void_p()
    out_size = ctypes.c_int()
    while remaining > 0 or pos == 0:
        n = _lavc.av_parser_parse2(
            parser, ctx, ctypes.byref(out_data), ctypes.byref(out_size),
            ctypes.cast(ctypes.addressof(buf) + pos, ctypes.c_void_p),
            remaining, 0, 0, -1)
        if n < 0:
            _log_lines.append(f"av_parser_parse2 -> {n}")
            break
        pos += n
        remaining -= n
        if out_size.value > 0:
            pkt.contents.data = ctypes.cast(out_data,
                                            ctypes.POINTER(ctypes.c_uint8))
            pkt.contents.size = out_size.value
            r = _lavc.avcodec_send_packet(ctx, pkt)
            if r != 0:
                _log_lines.append(f"send_packet -> {r}")
            drain()
        if remaining == 0:
            # one final parse call with size 0 flushes the parser
            n = _lavc.av_parser_parse2(
                parser, ctx, ctypes.byref(out_data), ctypes.byref(out_size),
                None, 0, 0, 0, -1)
            if out_size.value > 0:
                pkt.contents.data = ctypes.cast(
                    out_data, ctypes.POINTER(ctypes.c_uint8))
                pkt.contents.size = out_size.value
                r = _lavc.avcodec_send_packet(ctx, pkt)
                if r != 0:
                    _log_lines.append(f"send_packet -> {r}")
                drain()
            break
    _lavc.avcodec_send_packet(ctx, None)   # decoder flush
    drain()
    _lavc.av_parser_close(parser)

    errors = list(_log_lines)
    _lavu.av_log_set_callback(None)
    _lavc.avcodec_free_context(ctypes.byref(ctypes.c_void_p(ctx)))
    return frames, errors
