"""Build the native host runtime: `python -m gme_tpu.native.build`."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _libav_flags():
    """Enable the FFmpeg/libav codec-decode path when dev headers exist."""
    for inc in ("/usr/include", "/usr/include/x86_64-linux-gnu"):
        if os.path.exists(os.path.join(inc, "libavformat", "avformat.h")):
            return [
                "-I" + inc, "-DGME_WITH_LIBAV",
                "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
            ]
    return []


def build(verbose: bool = True) -> str:
    src = os.path.join(HERE, "gme_native.cpp")
    out = os.path.join(HERE, "libgme_native.so")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        src, "-o", out, "-lz", "-pthread",
    ] + _libav_flags()
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
    from gme_tpu.native import loader

    print("built", path, "loadable:", loader.available())
