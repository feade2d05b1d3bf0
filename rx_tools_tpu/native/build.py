"""Build librx_native.so: ``python -m rx_tools_tpu.native.build``.

Uses cmake+ninja if present, else falls back to direct g++.
"""

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    out = os.path.join(HERE, "librx_native.so")
    if shutil.which("cmake"):
        bdir = os.path.join(HERE, "build")
        gen = ["-G", "Ninja"] if shutil.which("ninja") else []
        subprocess.check_call(["cmake", "-S", HERE, "-B", bdir, *gen],
                              stdout=subprocess.DEVNULL)
        subprocess.check_call(["cmake", "--build", bdir],
                              stdout=subprocess.DEVNULL)
    else:
        subprocess.check_call([
            "g++", "-O3", "-march=native", "-fno-math-errno", "-std=c++17",
            "-shared", "-fPIC",
            os.path.join(HERE, "src", "iqcodec.cpp"),
            os.path.join(HERE, "src", "ringbuf.cpp"),
            "-lpthread", "-o", out])
    if not os.path.exists(out):
        raise RuntimeError("build produced no librx_native.so")
    return out


if __name__ == "__main__":
    print(build(), file=sys.stderr)
