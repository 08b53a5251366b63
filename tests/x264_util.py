"""Golden-stream generator: drive the system libavcodec's libx264 encoder
via ctypes to produce conforming H.264 (CABAC/CAVLC) Annex-B streams.

These independently-produced streams are the decoder-conformance oracle
(SURVEY.md §4.2): our decoder must reconstruct them bit-exactly to the
libavcodec decoder's output.
"""

import ctypes
import numpy as np

_lavc = ctypes.CDLL("libavcodec.so.59")
_lavu = ctypes.CDLL("libavutil.so.57")

AV_OPT_SEARCH_CHILDREN = 1


class AVFrame(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p * 8),
        ("linesize", ctypes.c_int * 8),
        ("extended_data", ctypes.c_void_p),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("nb_samples", ctypes.c_int),
        ("format", ctypes.c_int),
    ]


class AVPacket(ctypes.Structure):
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("pts", ctypes.c_int64),
        ("dts", ctypes.c_int64),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_int),
    ]


_lavc.avcodec_find_encoder_by_name.restype = ctypes.c_void_p
_lavc.avcodec_find_encoder_by_name.argtypes = [ctypes.c_char_p]
_lavc.avcodec_alloc_context3.restype = ctypes.c_void_p
_lavc.avcodec_alloc_context3.argtypes = [ctypes.c_void_p]
_lavc.avcodec_open2.restype = ctypes.c_int
_lavc.avcodec_open2.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
_lavc.avcodec_send_frame.restype = ctypes.c_int
_lavc.avcodec_send_frame.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(AVFrame)]
_lavc.avcodec_receive_packet.restype = ctypes.c_int
_lavc.avcodec_receive_packet.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(AVPacket)]
_lavc.av_packet_alloc.restype = ctypes.POINTER(AVPacket)
_lavc.av_packet_alloc.argtypes = []
_lavc.av_packet_unref.restype = None
_lavc.av_packet_unref.argtypes = [ctypes.POINTER(AVPacket)]
_lavc.avcodec_free_context.restype = None
_lavc.avcodec_free_context.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
_lavu.av_frame_alloc.restype = ctypes.POINTER(AVFrame)
_lavu.av_frame_alloc.argtypes = []
_lavu.av_frame_get_buffer.restype = ctypes.c_int
_lavu.av_frame_get_buffer.argtypes = [ctypes.POINTER(AVFrame), ctypes.c_int]
_lavu.av_frame_make_writable.restype = ctypes.c_int
_lavu.av_frame_make_writable.argtypes = [ctypes.POINTER(AVFrame)]
_lavu.av_opt_set.restype = ctypes.c_int
_lavu.av_opt_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.c_char_p, ctypes.c_int]


def x264_encode(frames, qp=28, params="", preset="medium"):
    """Encode (y, u, v) uint8 plane tuples → Annex-B bytes.

    `params` appended to the x264-params option string.
    """
    h, w = frames[0][0].shape
    codec = _lavc.avcodec_find_encoder_by_name(b"libx264")
    assert codec, "libx264 encoder not found"
    ctx = _lavc.avcodec_alloc_context3(codec)
    assert ctx

    def opt(k, v):
        r = _lavu.av_opt_set(ctx, k.encode(), str(v).encode(),
                             AV_OPT_SEARCH_CHILDREN)
        assert r == 0, f"av_opt_set {k}={v} -> {r}"

    opt("video_size", f"{w}x{h}")
    opt("pixel_format", "yuv420p")
    opt("time_base", "1/25")
    opt("preset", preset)
    opt("threads", 1)
    x264p = f"qp={qp}:threads=1:sliced-threads=0"
    if params:
        x264p += ":" + params
    opt("x264-params", x264p)
    r = _lavc.avcodec_open2(ctx, codec, None)
    assert r == 0, f"avcodec_open2 -> {r}"

    frame = _lavu.av_frame_alloc()
    frame.contents.width = w
    frame.contents.height = h
    frame.contents.format = 0          # AV_PIX_FMT_YUV420P
    r = _lavu.av_frame_get_buffer(frame, 32)
    assert r == 0
    pkt = _lavc.av_packet_alloc()

    out = bytearray()

    def drain():
        while True:
            r = _lavc.avcodec_receive_packet(ctx, pkt)
            if r != 0:
                return r
            out.extend(ctypes.string_at(pkt.contents.data,
                                        pkt.contents.size))
            _lavc.av_packet_unref(pkt)

    for i, (y, u, v) in enumerate(frames):
        r = _lavu.av_frame_make_writable(frame)
        assert r == 0
        f = frame.contents
        planes = (np.ascontiguousarray(y), np.ascontiguousarray(u),
                  np.ascontiguousarray(v))
        for p in range(3):
            src = planes[p]
            ph, pw = src.shape
            ls = f.linesize[p]
            buf = (ctypes.c_uint8 * (ls * ph)).from_address(f.data[p])
            arr = np.frombuffer(buf, dtype=np.uint8).reshape(ph, ls)
            arr[:, :pw] = src
        f.nb_samples = 0
        _set_pts(frame, i)
        r = _lavc.avcodec_send_frame(ctx, frame)
        assert r == 0, f"send_frame -> {r}"
        drain()
    _lavc.avcodec_send_frame(ctx, None)      # flush
    drain()
    _lavc.avcodec_free_context(ctypes.byref(ctypes.c_void_p(ctx)))
    return bytes(out)


def _set_pts(frame, pts):
    # AVFrame.pts follows the fixed head defined above plus
    # sample_aspect_ratio (AVRational: 2 ints); offsets are stable within
    # lavu 57's ABI: data(64) linesize(32) extended_data(8) w/h/nb/format(16)
    # key_frame(4) pict_type(4) sar(8) -> pts at 136
    addr = ctypes.addressof(frame.contents) + 136
    ctypes.c_int64.from_address(addr).value = pts
