"""Python launcher for the native remote-viewer client.

`gsjax/cpp/sibr_client.cpp` is the headless stand-in for the reference's
SIBR_viewers C++ application: it speaks the same remote wire protocol
against a running `train.py --ip --port` server and dumps orbit frames as
PPMs. This module builds it on demand and execs it.

    python -m gsjax.viewer.client <host> <port> [--width 960] ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys

from gsjax.cpp.build import build_exe


def client_path() -> str | None:
    return build_exe("sibr_client", ["sibr_client.cpp"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("host")
    ap.add_argument("port", type=int)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out_prefix", default="frame")
    ap.add_argument("--scaling_modifier", type=float, default=1.0)
    ap.add_argument("--radius", type=float, default=3.5)
    args = ap.parse_args(argv)
    exe = client_path()
    if exe is None:
        sys.exit("no C++ toolchain available to build sibr_client")
    return subprocess.call([
        exe, args.host, str(args.port), str(args.width), str(args.height),
        str(args.frames), args.out_prefix, str(args.scaling_modifier),
        str(args.radius)])


if __name__ == "__main__":
    sys.exit(main())
