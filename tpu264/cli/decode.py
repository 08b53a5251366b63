"""Decoder CLI (JM `ldecod` parity).

Usage: python -m tpu264.cli.decode in.264 out.yuv [--md5]
"""

from __future__ import annotations

import argparse
import hashlib
import sys

from tpu264.decode import decode_annexb
from tpu264.media.yuv_io import write_yuv420


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu264-decode")
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--md5", action="store_true",
                    help="print MD5 of the decoded YUV (conformance check)")
    ap.add_argument("--conceal", action="store_true",
                    help="conceal lost/corrupt slices (JM erc parity) "
                         "instead of aborting")
    ap.add_argument("--trace", help="write a per-slice/per-MB syntax "
                                    "trace here (JM TRACE parity)")
    args = ap.parse_args(argv)

    with open(args.input, "rb") as f:
        stream = f.read()
    if args.trace:
        from tpu264.decode.decoder import Decoder
        with open(args.trace, "w") as tf:
            frames = Decoder(conceal=args.conceal,
                             trace=tf).decode(stream)
    else:
        frames = decode_annexb(stream, conceal=args.conceal)
    if args.output:
        write_yuv420(args.output, frames)
    if args.md5:
        h = hashlib.md5()
        for y, u, v in frames:
            h.update(y.tobytes()); h.update(u.tobytes()); h.update(v.tobytes())
        print(h.hexdigest())
    print(f"decoded {len(frames)} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
