"""Builds the native C++ fast-path library (libwebptpu.so)."""

import os
import subprocess
import sys

SRC = ["src/vp8_enc.cc", "src/vp8_enc_loop.cc", "src/vp8_dec.cc", "src/yuv_import.cc",
       "src/upsample.cc", "src/vp8l_enc.cc", "src/vp8l_predictor.cc", "src/vp8l_dec.cc"]
HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    out = os.path.join(HERE, "libwebptpu.so")
    srcs = [os.path.join(HERE, s) for s in SRC if os.path.exists(os.path.join(HERE, s))]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", out] + srcs
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
